"""Custom stateful operator tests — the applyInPandasWithState layer
(SURVEY §2.9 keyed state/timers, §2.5 streaming TopN, §2.3 temporal
join, count windows, CEP).

Pattern mirrors the reference's harness tests
(GroupAggregateHarnessTest, OverWindowHarnessTest, flink-cep tests):
drive deterministic fixtures through the streaming operator across
several micro-batches, compare with the batch-computed expectation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_1_11_2_with_comments_spark.catalog import load_table
from flink_1_11_2_with_comments_spark.sources.replay import (
    replay_as_stream, write_stream_to_memory)
from flink_1_11_2_with_comments_spark.streaming.cep import (
    Step, match_recognize_batch, match_recognize_stream)
from flink_1_11_2_with_comments_spark.streaming.count_window import (
    count_tumbling_window)
from flink_1_11_2_with_comments_spark.streaming.state import keyed_process
from flink_1_11_2_with_comments_spark.streaming.topn import streaming_topn

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").cache()


def test_streaming_topn(spark, events):
    """Final emitted top-k per key == batch top-k (AppendOnlyTopNFunction:
    every micro-batch refreshes the key's top-k; the last emission per
    key must equal the batch answer)."""
    stream = replay_as_stream(events, n_batches=3, order_by="ts")
    out = streaming_topn(stream, ["event_type"], "value", k=3,
                         payload_cols=["value"])
    got = write_stream_to_memory(out, "topn_out", output_mode="update")
    # latest emission per (key, rank): the memory sink appends each
    # update; take the max value per key+rank — values only grow as
    # better candidates arrive
    latest = (got.groupBy("event_type", "rank")
              .agg(F.max("value").alias("value")))

    w = W.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    expected = (events.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= 3)
                .select("event_type", "rank", "value"))
    assert (sorted(map(tuple, latest.collect()))
            == sorted(map(tuple, expected.collect())))


def test_count_tumbling_window(spark, events):
    """Count windows fill across micro-batch boundaries; with a
    time-ordered replay the arrival order equals event-time order, so
    the result must equal the batch analogue."""
    ordered = events.orderBy("ts", "event_id")
    stream = replay_as_stream(ordered, n_batches=3, order_by="ts")
    # one partition per key arrives time-ordered only if replay is
    # time-split; within a micro-batch pandas preserves file order
    out = count_tumbling_window(stream, ["user_id"], size=5,
                                value_col="value")
    got = write_stream_to_memory(out, "cw_out", output_mode="append")

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    expected = (events.withColumn("rn", F.row_number().over(w) - 1)
                .withColumn("window_seq", (F.col("rn") / 5).cast("bigint"))
                .groupBy("user_id", "window_seq")
                .agg(F.count("*").alias("n"))
                .where(F.col("n") == 5))
    # compare window counts per key (totals depend on intra-batch order,
    # which time-ordered replay makes deterministic too)
    assert (sorted(map(tuple, got.select("user_id", "window_seq", "n").collect()))
            == sorted(map(tuple, expected.collect())))
    # and sums must match when order is deterministic
    got_totals = got.agg(F.round(F.sum("total"), 6).alias("s")).collect()[0].s
    exp_totals = (events.withColumn("rn", F.row_number().over(w) - 1)
                  .withColumn("ws", (F.col("rn") / 5).cast("bigint"))
                  .groupBy("user_id", "ws")
                  .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
                  .where(F.col("n") == 5)
                  .agg(F.round(F.sum("total"), 6).alias("s")).collect()[0].s)
    assert abs(got_totals - exp_totals) < 1e-6


def test_keyed_process_running_count(spark, events):
    """KeyedProcessFunction analogue: per-key running count kept in
    ValueState across micro-batches (GroupAggFunction.java:43 shape)."""
    import pandas as pd

    def fn(key, rows, state):
        if rows is None:
            return None
        n = state.get("n", 0) + len(rows)
        state.put("n", n)
        return pd.DataFrame([{"user_id": key[0], "n": n}])

    stream = replay_as_stream(events, n_batches=3, order_by="ts")
    out = keyed_process(stream, ["user_id"], fn, "user_id bigint, n bigint",
                        output_mode="update")
    got = write_stream_to_memory(out, "kp_out", output_mode="update")
    final = got.groupBy("user_id").agg(F.max("n").alias("n"))
    expected = events.groupBy("user_id").agg(F.count("*").alias("n"))
    assert (sorted(map(tuple, final.collect()))
            == sorted(map(tuple, expected.collect())))


def test_cep_stream_matches_batch(spark, events):
    """Streaming NFA (watermark-gated) finds the same matches as the
    batch NFA, modulo patterns still open at end-of-stream."""
    steps = [
        Step("view", lambda ev: ev["event_type"] == "view"),
        Step("click", lambda ev: ev["event_type"] == "click"),
    ]
    sub = events.where(F.col("event_type").isin("view", "click"))

    batch = match_recognize_batch(sub, ["user_id"], "ts", steps,
                                  within="30 minutes")
    batch_rows = set(map(tuple, batch.select("view_id", "click_id").collect()))

    stream = replay_as_stream(sub, n_batches=3, order_by="ts") \
        .withWatermark("ts", "1 minute")
    out = match_recognize_stream(stream, ["user_id"], "ts", steps,
                                 within="30 minutes")
    got = write_stream_to_memory(out, "cep_out", output_mode="append")
    got_rows = set(map(tuple, got.select("view_id", "click_id").collect()))

    # streaming emits only watermark-complete matches: subset, and at
    # least the matches fully inside the watermarked prefix
    assert got_rows.issubset(batch_rows)
    assert len(batch_rows) == 0 or len(got_rows) >= len(batch_rows) - 5
    assert len(got_rows) > 0 or len(batch_rows) == 0


def test_temporal_join_proctime(spark, events):
    """Proc-time temporal join: probe rows join the latest build version
    seen so far (TemporalProcessTimeJoinOperator.java:40)."""
    import pandas as pd
    from flink_1_11_2_with_comments_spark.streaming.asof import (
        temporal_join_proctime)

    ordered = events.orderBy("ts", "event_id")
    stream = replay_as_stream(ordered, n_batches=3, order_by="ts")
    probe = (stream.where(F.col("event_type") == "click")
             .select("user_id", F.lit("p").alias("__side"), "ts",
                     F.col("event_id").cast("double").alias("probe_id"),
                     F.lit(None).cast("double").alias("build_value")))
    build = (stream.where(F.col("event_type") == "purchase")
             .select("user_id", F.lit("b").alias("__side"), "ts",
                     F.lit(None).cast("double").alias("probe_id"),
                     F.col("value").alias("build_value")))
    out = temporal_join_proctime(probe, build, ["user_id"],
                                 ["probe_id"], ["build_value"],
                                 order_col="ts")
    got = write_stream_to_memory(out, "tj_out", output_mode="append")

    # time-ordered replay → proc-time order == event-time order, so the
    # expected result is the event-time as-of join (inner)
    from flink_1_11_2_with_comments_spark.streaming.asof import asof_join
    clicks = (events.where(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("c_ts"),
                      F.col("event_id").cast("double").alias("probe_id")))
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select("user_id", F.col("ts").alias("p_ts"),
                         F.col("value").alias("build_value")))
    expected = asof_join(clicks, purchases, ["user_id"], "c_ts", "p_ts",
                         ["build_value"], how="inner") \
        .select("probe_id", "build_value")
    assert (sorted(map(tuple, got.select("probe_id", "build_value").collect()))
            == sorted(map(tuple, expected.collect())))


def test_streaming_over_agg_rows_bounded(spark, events):
    """Streaming ROWS BETWEEN 2 PRECEDING running sum == the batch
    window result for every emitted row (watermark-gated emission;
    the unemittable tail past the final watermark is the only
    permitted difference) — RowTimeRowsBoundedPrecedingFunction."""
    from flink_1_11_2_with_comments_spark.streaming.over_agg import (
        rows_bounded_preceding_sum)

    stream = replay_as_stream(events, n_batches=6, order_by="ts") \
        .withWatermark("ts", "1 minute")
    out = rows_bounded_preceding_sum(
        stream, ["user_id"], "ts", "event_id", "value", n_rows=3)
    got = write_stream_to_memory(out, "over_out", output_mode="append")

    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, 0))
    expected = events.select(
        "user_id", "event_id", "ts",
        F.round(F.sum("value").over(w), 6).alias("running_sum"))

    got_rows = {(r.user_id, r.event_id): r.running_sum for r in got.collect()}
    exp_rows = {(r.user_id, r.event_id): r.running_sum
                for r in expected.collect()}
    assert len(got_rows) > 0
    # every emitted row must carry the exact batch-window value
    mismatches = {k: (v, exp_rows.get(k)) for k, v in got_rows.items()
                  if abs(v - exp_rows.get(k, float("nan"))) > 1e-6}
    assert not mismatches, list(mismatches.items())[:5]
    # emission must cover most rows (only the final-watermark tail may lag)
    assert len(got_rows) >= len(exp_rows) * 0.8


def test_broadcast_state_pattern(spark, events):
    """Broadcast state / control-stream pattern (DataStream.connect +
    BroadcastState): a small control table joined into every
    micro-batch — Spark shape: stream-static broadcast join."""
    control = spark.createDataFrame(
        [("click", 2.0), ("purchase", 10.0), ("view", 1.0),
         ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double")
    stream = replay_as_stream(events, n_batches=3, order_by="ts")
    scored = (stream.join(F.broadcast(control), "event_type")
              .select("event_id", "event_type",
                      (F.col("value") * F.col("weight")).alias("scored")))
    got = write_stream_to_memory(scored, "bcast_out", output_mode="append")
    assert got.count() == events.count()
    z = got.where(F.col("event_type") == "error") \
        .agg(F.sum("scored")).collect()[0][0]
    assert z == 0.0


def test_evictor_stream_matches_batch(spark, events):
    """Streaming CountEvictor window agg (evict-before-apply at
    watermark fire) equals the batch evictor on watermark-complete
    windows — WindowOperator + CountEvictor contract."""
    from flink_1_11_2_with_comments_spark.streaming.evictors import (
        count_evictor_agg, evicted_window_agg_stream)

    batch = count_evictor_agg(events, ["user_id"], "ts", "value",
                              "1 hour", 3)
    batch_rows = {(r.user_id, r.window_start, r.n_kept, r.total)
                  for r in batch.collect()}

    stream = replay_as_stream(events, n_batches=3, order_by="ts") \
        .withWatermark("ts", "1 minute")
    out = evicted_window_agg_stream(stream, ["user_id"], "ts", "value",
                                    3600, "count", 3)
    got = write_stream_to_memory(out, "evict_out", output_mode="append")
    got_rows = {(r.user_id, r.window_start, r.n_kept, r.total)
                for r in got.collect()}

    assert got_rows.issubset(batch_rows)
    # the watermark lags one micro-batch (computed from the previous
    # batch's max event time) and no trigger fires after the last
    # file, so with 3 time-split batches roughly the last third of
    # windows stays buffered — everything watermark-complete must
    # have fired with exactly the batch values (subset above)
    assert len(got_rows) >= len(batch_rows) // 2
    assert len(got_rows) > 0


def test_quantified_cep_greedy_backtracking(spark):
    """QStep NFA: greedy oneOrMore with strict contiguity matches the
    maximal run and backtracks when the follow-up step fails."""
    import datetime as dt
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, match_pattern_batch)
    base = dt.datetime(2024, 1, 1)
    rows = [
        # key 1: A B B B C -> one match, 3 Bs
        (1, 1, base, "A"), (1, 2, base + dt.timedelta(minutes=1), "B"),
        (1, 3, base + dt.timedelta(minutes=2), "B"),
        (1, 4, base + dt.timedelta(minutes=3), "B"),
        (1, 5, base + dt.timedelta(minutes=4), "C"),
        # key 2: A B B X C -> strict contiguity broken, no match
        (2, 6, base, "A"), (2, 7, base + dt.timedelta(minutes=1), "B"),
        (2, 8, base + dt.timedelta(minutes=2), "B"),
        (2, 9, base + dt.timedelta(minutes=3), "X"),
        (2, 10, base + dt.timedelta(minutes=4), "C"),
        # key 3: two disjoint matches; skip_past_last keeps both
        (3, 11, base, "A"), (3, 12, base + dt.timedelta(minutes=1), "B"),
        (3, 13, base + dt.timedelta(minutes=2), "C"),
        (3, 14, base + dt.timedelta(minutes=3), "A"),
        (3, 15, base + dt.timedelta(minutes=4), "B"),
        (3, 16, base + dt.timedelta(minutes=5), "C"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string")
    steps = [
        QStep("a", lambda ev: ev["event_type"] == "A"),
        QStep("b", lambda ev: ev["event_type"] == "B",
              min_times=1, max_times=None, contiguity="strict"),
        QStep("c", lambda ev: ev["event_type"] == "C",
              contiguity="strict"),
    ]
    out = match_pattern_batch(df, ["user_id"], "ts", steps,
                              after_match="skip_past_last")
    got = sorted((r.user_id, r.a_first_id, r.b_first_id, r.b_last_id,
                  r.b_n, r.c_first_id) for r in out.collect())
    assert got == [(1, 1, 2, 4, 3, 5),
                   (3, 11, 12, 12, 1, 13), (3, 14, 15, 15, 1, 16)]


def test_cep_skip_to_next_row_vs_no_skip(spark):
    """AFTER MATCH SKIP TO NEXT ROW = ONE preferred (greedy) match per
    start row, resuming one past the match's START — distinct from
    NO_SKIP ('all'), which emits every greedy-length/anchor candidate
    (AfterMatchSkipStrategy.skipToNext vs noSkip). Flink 1.11.2
    rt/match after-match pruning."""
    import datetime as dt
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, match_pattern_batch)
    base = dt.datetime(2024, 1, 1)
    rows = [(1, i + 1, base + dt.timedelta(minutes=i), et)
            for i, et in enumerate(["A", "B", "B", "C"])]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string")
    steps = [
        QStep("a", lambda ev: ev["event_type"] == "A"),
        QStep("b", lambda ev: ev["event_type"] == "B",
              min_times=1, max_times=None),
        QStep("c", lambda ev: ev["event_type"] == "C"),
    ]
    def run(mode):
        out = match_pattern_batch(df, ["user_id"], "ts", steps,
                                  after_match=mode)
        return sorted((r.a_first_id, r.b_first_id, r.b_last_id, r.b_n,
                       r.c_first_id) for r in out.collect())
    # preferred match from the only start row: greedy B run 2-3
    assert run("skip_to_next_row") == [(1, 2, 3, 2, 4)]
    # NO_SKIP keeps every candidate: both B anchors and both run lengths
    assert run("all") == [(1, 2, 2, 1, 4), (1, 2, 3, 2, 4),
                          (1, 3, 3, 1, 4)]


def test_pattern_api_until_bounds_catchall_loop(spark):
    """Pattern.until (Pattern.java:331): a catch-all oneOrMore loop is
    truncated at the first until-event; without until the greedy loop
    swallows the rest of the stream."""
    import datetime as dt
    from flink_1_11_2_with_comments_spark.streaming.pattern import Pattern
    base = dt.datetime(2024, 1, 1)
    rows = [(1, i + 1, base + dt.timedelta(minutes=i), et)
            for i, et in enumerate(["A", "X", "Y", "C", "Z"])]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, "
              "event_type string")

    with_until = (Pattern.begin("a")
                  .where(lambda e: e["event_type"] == "A")
                  .next("b").one_or_more()
                  .until(lambda e: e["event_type"] == "C"))
    got = with_until.match(df, ["user_id"], "ts").collect()
    assert [(r.b_first_id, r.b_last_id, r.b_n) for r in got] == [(2, 3, 2)]

    without = (Pattern.begin("a")
               .where(lambda e: e["event_type"] == "A")
               .next("b").one_or_more())
    got2 = without.match(df, ["user_id"], "ts").collect()
    assert [(r.b_first_id, r.b_last_id, r.b_n) for r in got2] == [(2, 5, 4)]


def test_pattern_api_allow_combinations(spark):
    """allowCombinations (Pattern.java:370): non-consecutive loop
    repetitions qualify; consecutive() (the default) rejects a broken
    run."""
    import datetime as dt
    from flink_1_11_2_with_comments_spark.streaming.pattern import Pattern
    base = dt.datetime(2024, 1, 1)
    rows = [(1, i + 1, base + dt.timedelta(minutes=i), et)
            for i, et in enumerate(["A", "B", "X", "B", "C"])]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, "
              "event_type string")

    def build(combos):
        p = (Pattern.begin("a").where(lambda e: e["event_type"] == "A")
             .followed_by("b").where(lambda e: e["event_type"] == "B")
             .times(2))
        if combos:
            p = p.allow_combinations()
        return (p.followed_by("c")
                .where(lambda e: e["event_type"] == "C"))

    got = build(True).match(df, ["user_id"], "ts",
                            after_match="all").collect()
    assert [(r.b_first_id, r.b_last_id, r.b_n, r.c_first_id)
            for r in got] == [(2, 4, 2, 5)]
    assert build(False).match(df, ["user_id"], "ts",
                              after_match="all").count() == 0


def test_pattern_api_subtype_or_within(spark):
    """subtype narrows by the type-tag column (the row-world analogue
    of the Java-class filter); or_ composes disjunctive conditions;
    within bounds the first-to-last span."""
    import datetime as dt
    from flink_1_11_2_with_comments_spark.streaming.pattern import Pattern
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base, "view", 5.0),
        (1, 2, base + dt.timedelta(minutes=5), "click", 50.0),
        (1, 3, base + dt.timedelta(minutes=10), "purchase", 5.0),
        # key 2: the pair is 2 hours apart -> within kills it
        (2, 4, base, "view", 5.0),
        (2, 5, base + dt.timedelta(hours=2), "purchase", 99.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, "
              "event_type string, value double")
    pat = (Pattern.begin("a").subtype("event_type", "view")
           .followed_by("b")
           .where(lambda e: e["value"] > 40)
           .or_(lambda e: e["event_type"] == "purchase")
           .within("30 minutes"))
    got = sorted((r.user_id, r.a_first_id, r.b_first_id)
                 for r in pat.match(df, ["user_id"], "ts").collect())
    # key 1: view then click(value 50) matches the or_; key 2 out of window
    assert got == [(1, 1, 2)]


def test_cep_flag_exprs_match_python_predicates(spark, events):
    """JVM-side flag projection (flag_exprs) must produce byte-identical
    matches to Python predicate evaluation — it is the same NFA over
    precomputed booleans, with predicate evaluation moved into
    whole-stage codegen."""
    import pyspark.sql.functions as F
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, match_pattern_batch)
    e = events.select("user_id", "event_id", "ts", "event_type")
    steps = [
        QStep("a", lambda ev: ev["event_type"] == "view"),
        QStep("b", lambda ev: ev["event_type"] == "click",
              min_times=1, max_times=None, contiguity="strict"),
        QStep("c", lambda ev: ev["event_type"] == "purchase",
              contiguity="strict"),
    ]
    flags = [F.col("event_type") == v
             for v in ("view", "click", "purchase")]
    plain = match_pattern_batch(e, ["user_id"], "ts", steps,
                                after_match="skip_past_last")
    flagged = match_pattern_batch(e, ["user_id"], "ts", steps,
                                  after_match="skip_past_last",
                                  flag_exprs=flags)
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, flagged.collect()))


def test_streaming_over_agg_range_bounded(spark, events):
    """Streaming RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND
    CURRENT ROW running sum == the batch window result (peer-inclusive
    frames; watermark-gated emission) —
    RowTimeRangeBoundedPrecedingFunction."""
    from flink_1_11_2_with_comments_spark.streaming.over_agg import (
        range_bounded_preceding_sum)

    stream = replay_as_stream(events, n_batches=6, order_by="ts") \
        .withWatermark("ts", "1 minute")
    out = range_bounded_preceding_sum(
        stream, ["user_id"], "ts", "event_id", "value", preceding_sec=600)
    got = write_stream_to_memory(out, "over_range_out",
                                 output_mode="append")

    events.createOrReplaceTempView("ev_range")
    expected = spark.sql("""
        SELECT user_id, event_id, ts,
               ROUND(SUM(value) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                           AND CURRENT ROW), 6) AS running_sum
        FROM ev_range""")

    got_rows = {(r.user_id, r.event_id): r.running_sum for r in got.collect()}
    exp_rows = {(r.user_id, r.event_id): r.running_sum
                for r in expected.collect()}
    assert len(got_rows) > 0
    mismatches = {k: (v, exp_rows.get(k)) for k, v in got_rows.items()
                  if abs(v - exp_rows.get(k, float("nan"))) > 1e-6}
    assert not mismatches, list(mismatches.items())[:5]
    assert len(got_rows) >= len(exp_rows) * 0.8


def test_changelog_stream_matches_batch(spark, events):
    """Streaming changelog (+I/-U/+U, watermark-gated) emits exactly
    the batch changelog rows for every key whose history is final —
    RowKind / retraction semantics (SURVEY §1.1)."""
    from flink_1_11_2_with_comments_spark.streaming.changelog import (
        to_changelog_batch, to_changelog_stream)

    small = events.where(F.col("user_id") <= 20)
    stream = replay_as_stream(small, n_batches=5, order_by="ts") \
        .withWatermark("ts", "1 minute")
    out = to_changelog_stream(stream, ["user_id"], "ts", "event_id",
                              "value")
    got = write_stream_to_memory(out, "chlog_out", output_mode="append")

    exp = to_changelog_batch(small, ["user_id"], "ts", "event_id",
                             "value")
    got_set = {(r.user_id, r.event_id, r.rowkind, round(r.value, 6))
               for r in got.collect()}
    exp_set = {(r.user_id, r.event_id, r.rowkind, round(r.value, 6))
               for r in exp.collect()}
    assert len(got_set) > 0
    # everything emitted must be a real changelog row
    assert got_set <= exp_set, list(got_set - exp_set)[:5]
    # and emission covers most rows (the final-watermark tail may lag,
    # and each unemittable source row costs TWO changelog rows here)
    assert len(got_set) >= len(exp_set) * 0.75


def test_cep_skip_past_last_equals_regex_semantics():
    """Property: for a contiguous pattern (A B+ C strict), the NFA
    under SKIP_PAST_LAST + greedy must agree exactly with Python's
    regex engine (leftmost, greedy-with-backtracking, non-overlapping
    continuation = the same after-match strategy). The reference has
    no property-based tests (SURVEY §5.5); this goes beyond, fuzzing
    the NFA against an independent matcher."""
    import re
    from hypothesis import given, settings, strategies as st
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, _all_q_matches)

    steps = [
        QStep("a", lambda e: e["t"] == "v"),
        QStep("b", lambda e: e["t"] == "c", min_times=1, max_times=None,
              contiguity="strict"),
        QStep("c", lambda e: e["t"] == "p", contiguity="strict"),
    ]

    @given(st.text(alphabet="vcpx", max_size=40))
    @settings(max_examples=300, deadline=None)
    def check(seq):
        events = [{"t": ch, "ts": i, "id": i} for i, ch in enumerate(seq)]
        got = [(m[0][1][0]["id"], m[-1][1][-1]["id"])
               for m in _all_q_matches(events, steps, "ts", None,
                                       "skip_past_last", "id")]
        exp = [(mo.start(), mo.end() - 1)
               for mo in re.finditer("vc+p", seq)]
        assert got == exp, (seq, got, exp)

    check()


def test_cep_permute_equals_regex_alternation():
    """Property: PERMUTE alternation under SKIP_PAST_LAST equals the
    regex engine on the expanded alternation `vc|cv` — same leftmost
    preference, same alternative order at a tied start, same
    non-overlapping continuation."""
    import re
    from hypothesis import given, settings, strategies as st
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, _all_alt_matches, _permute_alts)

    steps = [
        QStep("a", lambda e: e["t"] == "v"),
        QStep("b", lambda e: e["t"] == "c", contiguity="strict"),
    ]
    alts = _permute_alts(steps)

    @given(st.text(alphabet="vcpx", max_size=40))
    @settings(max_examples=300, deadline=None)
    def check(seq):
        events = [{"t": ch, "ts": i, "id": i} for i, ch in enumerate(seq)]
        got = [(m[0][1][0]["id"], m[-1][1][-1]["id"])
               for m in _all_alt_matches(events, alts, "ts", None,
                                         "skip_past_last", "id")]
        exp = [(mo.start(), mo.end() - 1)
               for mo in re.finditer("vc|cv", seq)]
        assert got == exp, (seq, got, exp)

    check()


def test_cep_star_equals_regex():
    """Property: native min-0 handling under SKIP_PAST_LAST equals the
    regex engine on `vc*p` — leftmost preference, greedy star,
    non-overlapping continuation (zero-repetition options explored in
    per-step preference order, the regex backtracking model)."""
    import re
    from hypothesis import given, settings, strategies as st
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, _all_q_matches)

    steps = [
        QStep("a", lambda e: e["t"] == "v"),
        QStep("b", lambda e: e["t"] == "c", min_times=0, max_times=None,
              contiguity="strict"),
        QStep("c", lambda e: e["t"] == "p", contiguity="strict"),
    ]

    @given(st.text(alphabet="vcpx", max_size=40))
    @settings(max_examples=300, deadline=None)
    def check(seq):
        events = [{"t": ch, "ts": i, "id": i} for i, ch in enumerate(seq)]
        got = [(m[0][1][0]["id"], m[-1][1][-1]["id"])
               for m in _all_q_matches(events, steps, "ts", None,
                                       "skip_past_last", "id")]
        exp = [(mo.start(), mo.end() - 1)
               for mo in re.finditer("vc*p", seq)]
        assert got == exp, (seq, got, exp)

    check()


def test_cep_quantifier_regex_equivalence_fuzz():
    """Property: the NFA's quantifier semantics (greedy/reluctant,
    min-0, bounds, SKIP PAST LAST continuation) equal Python's regex
    engine on random patterns x random event strings — the strongest
    available oracle for backtracking preference order. Group-
    quantifier patterns are excluded: group unrolling ranks the
    presence choice above EARLIER quantifiers\' backtracking, a
    documented deviation (plans/match_recognize._expand_groups)."""
    import random
    import re as regex
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        _parse_pattern)
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, _all_q_matches)

    def nfa_spans(pattern, s):
        braw = _parse_pattern(pattern)[0][0]
        steps = [QStep(name, (lambda ev, ch=name: ev["c"] == ch),
                       min_times=mn, max_times=mx,
                       contiguity="relaxed" if i == 0 else "strict",
                       greedy=greedy)
                 for i, (name, mn, mx, greedy) in enumerate(braw)]
        if not any(st.min_times > 0 for st in steps):
            return None
        events = [{"ts": i, "id": i, "c": ch} for i, ch in enumerate(s)]
        ms = _all_q_matches(events, steps, "ts", None,
                            "skip_past_last", "id")
        return [([e for _s, r in m for e in r][0]["id"],
                 [e for _s, r in m for e in r][-1]["id"] + 1)
                for m in ms]

    def regex_spans(rx, s):
        out, pos = [], 0
        while pos <= len(s):
            m = regex.compile(rx).search(s, pos)
            if not m:
                break
            if m.end() > m.start():
                out.append((m.start(), m.end()))
            pos = m.end() if m.end() > m.start() else m.start() + 1
        return out

    quants = ["", "+", "*", "?", "{2}", "{1,2}", "{2,}",
              "+?", "*?", "??", "{1,2}?", "{2,}?"]
    rng = random.Random(20260814)
    checked = 0
    for _ in range(400):
        toks = [rng.choice("ABC") + rng.choice(quants)
                for _ in range(rng.randint(1, 5))]
        pat, rx = "(" + " ".join(toks) + ")", "".join(toks)
        s = "".join(rng.choice("ABC")
                    for _ in range(rng.randint(5, 30)))
        got = nfa_spans(pat, s)
        if got is None:
            continue
        checked += 1
        assert got == regex_spans(rx, s), (pat, s, got, regex_spans(rx, s))
    assert checked > 300


def test_cep_pattern_boundaries():
    """Pattern subset boundaries raise loudly at validation: patterns
    that can match zero rows, notFollowedBy before a min-0 step, and
    min-0 inside PERMUTE."""
    import pytest
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, _permute_alts, _prepare_branches)
    t = lambda e: True

    def prep(steps):
        return _prepare_branches(None, [], "ts", "id", steps, None,
                                 None, False, None)

    with pytest.raises(NotImplementedError, match="zero rows"):
        prep([QStep("a", t, min_times=0, max_times=None)])
    with pytest.raises(ValueError, match="notFollowedBy"):
        prep([QStep("a", t),
              QStep("n", t, negated=True),
              QStep("b", t, min_times=0, max_times=None,
                    contiguity="strict")])
    with pytest.raises(NotImplementedError, match="PERMUTE"):
        _permute_alts([QStep("a", t),
                       QStep("b", t, min_times=0, max_times=1)])
    # a min-0 step passes validation and stays in the single branch
    _df, union, run_steps, alts = prep([
        QStep("a", t), QStep("b", t, min_times=0, max_times=1,
                             contiguity="strict"),
        QStep("c", t, contiguity="strict")])
    assert alts is None and [s.name for s in run_steps] == ["a", "b", "c"]


def test_simhash_banding_pigeonhole_recall():
    """Property: the pigeonhole band split (threshold+1 bands) never
    misses a qualifying pair — any two signatures within Hamming
    threshold share at least one bit-identical band, for arbitrary
    signature widths and thresholds. This is the recall guarantee
    dedup_simhash_pairs' banded equi-join rests on."""
    from hypothesis import given, settings, strategies as st
    from flink_1_11_2_with_comments_spark.pipeline.dedup import (
        _band_widths)

    @given(st.integers(min_value=1, max_value=12),
           st.data())
    @settings(max_examples=300, deadline=None)
    def check(threshold, data):
        bits = data.draw(st.integers(min_value=threshold + 1,
                                     max_value=64))
        sig_a = data.draw(st.integers(min_value=0,
                                      max_value=(1 << bits) - 1))
        # flip at most `threshold` distinct bits
        n_flips = data.draw(st.integers(min_value=0,
                                        max_value=threshold))
        positions = data.draw(st.lists(
            st.integers(min_value=0, max_value=bits - 1),
            min_size=n_flips, max_size=n_flips, unique=True))
        sig_b = sig_a
        for p in positions:
            sig_b ^= (1 << p)
        assert bin(sig_a ^ sig_b).count("1") <= threshold

        widths = _band_widths(bits, threshold + 1)
        assert sum(widths) == bits and all(w >= 1 for w in widths)
        offsets = [sum(widths[:i]) for i in range(len(widths))]
        shares_a_band = any(
            (sig_a >> off) & ((1 << w) - 1)
            == (sig_b >> off) & ((1 << w) - 1)
            for off, w in zip(offsets, widths))
        assert shares_a_band, (bits, threshold, positions)

    check()


def test_cep_negation_equals_bruteforce():
    """Property: notFollowedBy under NO_SKIP equals the brute-force
    pair enumeration (every v..p pair with no x strictly between)."""
    from hypothesis import given, settings, strategies as st
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, _all_q_matches)

    steps = [
        QStep("a", lambda e: e["t"] == "v"),
        QStep("x", lambda e: e["t"] == "x", negated=True),
        QStep("c", lambda e: e["t"] == "p"),
    ]

    @given(st.text(alphabet="vcpx", max_size=25))
    @settings(max_examples=300, deadline=None)
    def check(seq):
        events = [{"t": ch, "ts": i, "id": i} for i, ch in enumerate(seq)]
        got = sorted((m[0][1][0]["id"], m[-1][1][-1]["id"])
                     for m in _all_q_matches(events, steps, "ts", None,
                                             "all", "id"))
        exp = sorted((i, j)
                     for i, a in enumerate(seq) if a == "v"
                     for j in range(i + 1, len(seq)) if seq[j] == "p"
                     and "x" not in seq[i + 1:j])
        assert got == exp, (seq, got, exp)

    check()


def test_count_sliding_window(spark, events):
    """Sliding count window countWindow(10, 5): with time-ordered
    replay, streamed firings equal the batch OVER-frame formulation
    (CountSlidingWindowAssigner + ElementTriggers.count)."""
    from flink_1_11_2_with_comments_spark.streaming.count_window import (
        count_sliding_window)

    ordered = events.orderBy("ts", "event_id")
    stream = replay_as_stream(ordered, n_batches=3, order_by="ts")
    out = count_sliding_window(stream, ["user_id"], size=10, slide=5,
                               value_col="value")
    got = write_stream_to_memory(out, "csw_out", output_mode="append")

    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w_ord.rowsBetween(-9, 0)
    expected = (events.withColumn("rn", F.row_number().over(w_ord))
                .withColumn("n", F.count("*").over(frame))
                .withColumn("total",
                            F.round(F.sum("value").over(frame), 6))
                .where(F.col("rn") % 5 == 0)
                .select("user_id",
                        (F.col("rn") / 5).cast("bigint").alias("fire_seq"),
                        "n", "total"))
    got_m = {(r.user_id, r.fire_seq): (r.n, r.total) for r in got.collect()}
    exp_m = {(r.user_id, r.fire_seq): (r.n, r.total)
             for r in expected.collect()}
    assert set(got_m) == set(exp_m) and len(got_m) > 0
    for k, (n, tot) in exp_m.items():
        assert got_m[k][0] == n, k
        assert abs(got_m[k][1] - tot) < 1e-5, k


def test_streaming_over_agg_proctime_unbounded(spark, events):
    """Proc-time ROWS UNBOUNDED PRECEDING running sum: with
    time-ordered replay, arrival order == event order, so the stream
    equals the batch cumulative sum for EVERY row (no watermark
    gating — proc time is complete by construction) —
    ProcTimeUnboundedPrecedingFunction."""
    from flink_1_11_2_with_comments_spark.streaming.over_agg import (
        proctime_unbounded_preceding_sum)

    ordered = events.orderBy("ts", "event_id")
    stream = replay_as_stream(ordered, n_batches=4, order_by="ts")
    out = proctime_unbounded_preceding_sum(
        stream, ["user_id"], "event_id", "value")
    got = write_stream_to_memory(out, "pt_over_out",
                                 output_mode="append")

    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    expected = events.select(
        "user_id", "event_id",
        F.round(F.sum("value").over(w), 6).alias("running_sum"))
    got_m = {(r.user_id, r.event_id): r.running_sum for r in got.collect()}
    exp_m = {(r.user_id, r.event_id): r.running_sum
             for r in expected.collect()}
    assert set(got_m) == set(exp_m) and len(got_m) > 0
    bad = {k: (v, exp_m[k]) for k, v in got_m.items()
           if abs(v - exp_m[k]) > 1e-5}
    assert not bad, list(bad.items())[:5]


def test_quantified_cep_stream_matches_batch(spark, events):
    """Streaming quantified CEP (skip-past-last, consumption-based)
    emits exactly batch matches for the watermark-complete region —
    every emission is a true batch match; coverage lags only at the
    final-watermark tail and open greedy runs."""
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, match_pattern_batch, match_pattern_stream)

    steps = [
        QStep("a", lambda ev: ev["event_type"] == "view"),
        QStep("b", lambda ev: ev["event_type"] == "click",
              min_times=1, max_times=None, contiguity="strict"),
        QStep("c", lambda ev: ev["event_type"] == "purchase",
              contiguity="strict"),
    ]
    sub = events.select("user_id", "event_id", "ts", "event_type")

    batch = match_pattern_batch(sub, ["user_id"], "ts", steps,
                                after_match="skip_past_last")
    exp = {(r.user_id, r.a_first_id, r.b_first_id, r.b_last_id,
            r.c_first_id) for r in batch.collect()}

    stream = replay_as_stream(sub, n_batches=10, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    out = match_pattern_stream(stream, ["user_id"], "ts", steps)
    got_df = write_stream_to_memory(out, "qcep_out", output_mode="append")
    got = {(r.user_id, r.a_first_id, r.b_first_id, r.b_last_id,
            r.c_first_id) for r in got_df.collect()}

    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    # tail past the final watermark stays open (small fixture:
    # a handful of matches live entirely in the last batches)
    assert len(got) >= len(exp) * 0.6, (len(got), len(exp))


def test_delta_trigger_window(spark, events):
    """GlobalWindow + PurgingTrigger(DeltaTrigger(25)): firing
    sequence equals a sequential offline simulation exactly
    (windowing/triggers/DeltaTrigger.java + PurgingTrigger.java)."""
    from flink_1_11_2_with_comments_spark.streaming.triggers import (
        delta_trigger_agg)

    sub = events.where(F.col("user_id") <= 20)
    ordered = sub.orderBy("ts", "event_id")
    stream = replay_as_stream(ordered, n_batches=3, order_by="ts")
    out = delta_trigger_agg(stream, ["user_id"], "value", threshold=25.0)
    got = {(r.user_id, r.fire_id): (r.n, round(r.total, 5))
           for r in write_stream_to_memory(
               out, "dt_out", output_mode="append").collect()}

    exp = {}
    import collections
    st = collections.defaultdict(lambda: [0, 0.0, None])  # n, sum, ref
    for r in sub.orderBy("ts", "event_id").collect():
        s = st[r.user_id]
        s[0] += 1
        s[1] += r.value
        if s[2] is None:
            s[2] = r.value
            continue
        if abs(r.value - s[2]) >= 25.0:
            exp[(r.user_id, r.event_id)] = (s[0], round(s[1], 5))
            st[r.user_id] = [0, 0.0, r.value]
    assert len(got) > 0
    assert got == exp, (len(got), len(exp))


def test_punctuated_watermark_window(spark, events):
    """Punctuated watermark: signup events are the markers that
    advance per-key event time; window emission follows the
    punctuated clock exactly (offline simulation), independent of
    Spark's global bounded-delay watermark."""
    from flink_1_11_2_with_comments_spark.streaming.triggers import (
        punctuated_window_agg)

    sub = (events.where(F.col("user_id") <= 20)
           .withColumn("is_marker", F.col("event_type") == "signup"))
    ordered = sub.orderBy("ts", "event_id")
    stream = replay_as_stream(ordered, n_batches=3, order_by="ts")
    out = punctuated_window_agg(stream, ["user_id"], 3600, "value",
                                "is_marker")
    got = {(r.user_id, r.window_start): (r.n, round(r.total, 5))
           for r in write_stream_to_memory(
               out, "pw_out", output_mode="append").collect()}

    import collections, datetime as dt
    wm = {}
    wins = collections.defaultdict(dict)
    exp = {}
    for r in sub.orderBy("ts", "event_id").collect():
        if r.is_marker:
            if r.user_id not in wm or r.ts > wm[r.user_id]:
                wm[r.user_id] = r.ts
                for ws in sorted(wins[r.user_id]):
                    if dt.datetime.fromtimestamp(ws + 3600) <= r.ts:
                        n, s = wins[r.user_id].pop(ws)
                        exp[(r.user_id,
                             dt.datetime.fromtimestamp(ws))] = (
                            n, round(s, 5))
            continue
        if r.user_id in wm and r.ts <= wm[r.user_id]:
            continue
        ws = int(r.ts.timestamp()) // 3600 * 3600
        n, s = wins[r.user_id].get(ws, (0, 0.0))
        wins[r.user_id][ws] = (n + 1, s + r.value)
    assert len(got) > 0
    assert got == exp, (len(got), len(exp))


def test_match_recognize_sql_streaming(spark, events):
    """SQL MATCH_RECOGNIZE over a STREAMING input: the parser routes
    to the streaming NFA; every emission is a true batch-MR match."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(A.event_id) AS view_id,
                   COUNT(B.*) AS n_clicks,
                   C.event_id AS purchase_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+ C)
          DEFINE A AS A.event_type = 'view',
                 B AS B.event_type = 'click',
                 C AS C.event_type = 'purchase'
        )"""
    events.createOrReplaceTempView("events")
    exp = {(r.user_id, r.view_id, r.n_clicks, r.purchase_id)
           for r in match_recognize(spark, sql).collect()}

    stream = replay_as_stream(events, n_batches=6, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    out = match_recognize(spark, sql, df=stream)
    got = {(r.user_id, r.view_id, r.n_clicks, r.purchase_id)
           for r in write_stream_to_memory(
               out, "mrs_out", output_mode="append").collect()}
    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.6


def test_match_recognize_permute_streaming(spark, events):
    """PERMUTE through the STREAMING NFA: every streamed emission is a
    batch-PERMUTE match (the alternation scan runs on the
    watermark-complete prefix)."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES A.event_id AS click_id,
                   B.event_id AS view_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (PERMUTE(A, B))
          DEFINE A AS A.event_type = 'click',
                 B AS B.event_type = 'view'
        )"""
    events.createOrReplaceTempView("events")
    exp = {(r.user_id, r.click_id, r.view_id)
           for r in match_recognize(spark, sql).collect()}

    stream = replay_as_stream(events, n_batches=5, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.click_id, r.view_id)
           for r in write_stream_to_memory(
               match_recognize(spark, sql, df=stream),
               "mrp_out", output_mode="append").collect()}
    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.6


def test_cep_until_stream_matches_batch(spark, events):
    """Pattern.until through the STREAMING NFA: until flags are
    computed at ingestion (the state buffer carries only booleans),
    and every streamed emission is a batch match."""
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, match_pattern_batch, match_pattern_stream)

    def steps():
        return [
            QStep("a", lambda ev: ev["event_type"] == "view"),
            QStep("b", lambda ev: True, min_times=1, max_times=None,
                  contiguity="strict",
                  until=lambda ev: ev["event_type"] == "purchase"),
            QStep("c", lambda ev: ev["event_type"] == "purchase",
                  contiguity="strict"),
        ]

    sub = events.where(F.col("user_id") <= 40) \
        .select("user_id", "event_id", "ts", "event_type")
    exp = {(r.user_id, r.a_first_id, r.b_n, r.c_first_id)
           for r in match_pattern_batch(
               sub, ["user_id"], "ts", steps(),
               after_match="skip_past_last").collect()}

    stream = replay_as_stream(sub, n_batches=4, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.a_first_id, r.b_n, r.c_first_id)
           for r in write_stream_to_memory(
               match_pattern_stream(stream, ["user_id"], "ts", steps()),
               "until_out", output_mode="append").collect()}
    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.5


def test_match_recognize_all_rows_streaming(spark, events):
    """Streaming ALL ROWS PER MATCH (MATCH_NUMBER/CLASSIFIER
    measures): every streamed per-event row is a batch all-rows row,
    with the same match numbering for the emitted prefix."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES MATCH_NUMBER() AS mno,
                   CLASSIFIER() AS var
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+)
          DEFINE A AS A.event_type = 'view',
                 B AS B.event_type = 'click'
        )"""
    events.createOrReplaceTempView("events")
    exp = {(r.user_id, r.event_id, r.mno, r.var)
           for r in match_recognize(spark, sql).collect()}

    stream = replay_as_stream(events, n_batches=5, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.event_id, r.mno, r.var)
           for r in write_stream_to_memory(
               match_recognize(spark, sql, df=stream),
               "mrar_out", output_mode="append").collect()}
    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.6


def test_quantified_cep_stream_within_timeout_emits_quiet_key(spark):
    """A deferred open-ended greedy match must still be emitted when
    its key goes quiet and the watermark passes first_ts + within —
    the reference's NFA emits on the within timeout
    (CepOperator.onEventTime); before the timer-based force-emit the
    within-cutoff eviction silently destroyed the match's events."""
    import datetime as dt

    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, match_pattern_stream)

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # user 1: view, click, click — then quiet forever
        (1, 1, t0, "view"),
        (1, 2, t0 + dt.timedelta(seconds=10), "click"),
        (1, 3, t0 + dt.timedelta(seconds=20), "click"),
        # user 2: filler traffic that advances the global watermark
        *[(2, 10 + i, t0 + dt.timedelta(minutes=5 + i), "other")
          for i in range(6)],
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, "
              "event_type string")
    steps = [
        QStep("a", lambda ev: ev["event_type"] == "view"),
        QStep("b", lambda ev: ev["event_type"] == "click",
              min_times=1, max_times=None, contiguity="strict",
              greedy=True),
    ]
    stream = replay_as_stream(df, n_batches=4, order_by="ts") \
        .withWatermark("ts", "5 seconds")
    out = match_pattern_stream(stream, ["user_id"], "ts", steps,
                               within="1 minute")
    got = write_stream_to_memory(out, "cep_within_out",
                                 output_mode="append").collect()
    assert len(got) == 1, got
    r = got[0]
    assert (r.user_id, r.a_first_id, r.b_first_id, r.b_last_id,
            r.b_n) == (1, 1, 2, 3, 2)


def test_group_quantifier_unrolling():
    """(A B){m,n} / (A B)? unroll to greedy-ordered branches; unbounded
    group repetition and nesting raise (documented subset)."""
    import pytest
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        _expand_groups, _parse_pattern)
    assert _expand_groups("A (B C){1,2} D") == ["A B C B C D", "A B C D"]
    assert _expand_groups("(B C){2}") == ["B C B C"]
    assert _expand_groups("A (B C)?") == ["A B C", "A"]
    # two groups: outer product, greedy-first within each
    assert _expand_groups("(A B)? (C D){1,2}") == [
        "A B C D C D", "A B C D", "C D C D", "C D"]
    for bad in ("A (B C)+", "A (B C)*", "A (B C){1,}"):
        with pytest.raises(NotImplementedError):
            _expand_groups(bad)
    # nesting works by innermost-first unrolling
    assert _expand_groups("A ((B C){2}){2}") == ["A B C B C B C B C"]
    # a lone optional group may match zero rows -> documented raise
    with pytest.raises(NotImplementedError):
        _parse_pattern("((B C)?)")
    # dup-name branches parse and keep per-position quantifiers
    branches, _, _ = _parse_pattern("(A (B+ C){2})")
    assert [(n, mn, mx) for n, mn, mx, _g in branches[0]] == [
        ("A", 1, 1), ("B", 1, None), ("C", 1, 1),
        ("B", 1, None), ("C", 1, 1)]
    # reluctant markers parse into the greedy flag
    branches, _, _ = _parse_pattern("(A B+? C*? D?? E{1,3}?)")
    assert [(n, mn, mx, g) for n, mn, mx, g in branches[0][:1]] == [
        ("A", 1, 1, True)]
    assert all(not g for _n, _mn, _mx, g in branches[0][1:])


def test_group_quantifier_measures(spark):
    """A branch binding a variable twice accumulates COUNT(V.*) and
    keeps earliest-FIRST / latest-LAST across the bindings; greedy
    prefers the longer unrolling at the same start row."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [(1, i, base + dt.timedelta(minutes=i), typ) for i, typ in
            enumerate(["view", "click", "error", "click", "error",
                       "view", "click", "error", "signup"])]
    events = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, "
              "event_type string")
    out = match_recognize(spark, """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES A.event_id AS view_id, COUNT(B.*) AS nb,
                   FIRST(B.event_id) AS b_first, LAST(B.event_id) AS b_last
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A (B C){2})
          DEFINE A AS A.event_type = 'view',
                 B AS B.event_type = 'click',
                 C AS C.event_type = 'error'
        )""", df=events).collect()
    assert all(r.nb == 2 for r in out)
    assert all(r.b_first < r.b_last for r in out)
    assert len(out) > 0


def test_pattern_optional_step(spark):
    """Pattern.optional (Pattern.java:317): a min-0 step binds zero or
    more events; greedy prefers binding. Streaming raises (batch-only
    boundary)."""
    import datetime as dt
    import pytest
    from flink_1_11_2_with_comments_spark.streaming.pattern import Pattern
    base = dt.datetime(2024, 1, 1)
    rows = [(1, i, base + dt.timedelta(minutes=i), typ) for i, typ in
            enumerate(["view", "click", "purchase",    # with click
                       "view", "purchase",             # direct
                       "view", "click"])]              # no purchase
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, "
              "event_type string")
    pat = (Pattern.begin("v")
           .where(lambda e: e["event_type"] == "view")
           .next("c").where(lambda e: e["event_type"] == "click")
           .optional()
           .next("p").where(lambda e: e["event_type"] == "purchase"))
    got = sorted((r.v_first_id, r.c_n, r.p_first_id)
                 for r in pat.match(df, ["user_id"], "ts").collect())
    assert got == [(0, 1, 2), (3, 0, 4)]
    # MID-pattern optional runs streaming (zero binding immutable
    # inside the watermark prefix) and matches batch
    stream = replay_as_stream(df, n_batches=2, order_by="ts") \
        .withWatermark("ts", "1 minute")
    out = write_stream_to_memory(
        pat.match(stream, ["user_id"], "ts"), "opt_out",
        output_mode="append")
    got_s = sorted((r.v_first_id, r.c_n, r.p_first_id)
                   for r in out.collect())
    # watermark lags one batch: tail matches stay open at end-of-
    # stream (same convention as test_cep_stream_matches_batch);
    # everything emitted must be a batch match, and the optional-
    # bound match inside the watermarked prefix must be there
    assert set(got_s) <= set(got)
    assert (0, 1, 2) in got_s
    # trailing optional STREAMS too now: a boundary-ending match is
    # deferred until a watermark-final successor fails to extend it,
    # so emitted matches equal batch matches inside the prefix
    pat2 = (Pattern.begin("v")
            .where(lambda e: e["event_type"] == "view")
            .next("c").where(lambda e: e["event_type"] == "click")
            .optional())
    got2 = sorted((r.v_first_id, r.c_n)
                  for r in pat2.match(df, ["user_id"], "ts").collect())
    assert got2 == [(0, 1), (3, 0), (5, 1)]
    stream2 = replay_as_stream(df, n_batches=2, order_by="ts") \
        .withWatermark("ts", "1 minute")
    out2 = write_stream_to_memory(
        pat2.match(stream2, ["user_id"], "ts"), "opt_trail_out",
        output_mode="append")
    got2_s = sorted((r.v_first_id, r.c_n) for r in out2.collect())
    assert set(got2_s) <= set(got2)
    assert (0, 1) in got2_s  # consuming-c match emitted in-stream


def test_match_recognize_star_streaming(spark, events):
    """Mid-pattern `B*` over a STREAMING input: zero bindings between
    consumed events are immutable inside the watermark prefix, so the
    streaming NFA emits true batch-MR matches — including COUNT(B.*)=0
    direct conversions. (Edge min-0 variables stream too —
    test_match_recognize_min0_edge_streaming.)"""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(A.event_id) AS view_id,
                   COUNT(B.*) AS n_clicks,
                   C.event_id AS purchase_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B* C)
          DEFINE A AS A.event_type = 'view',
                 B AS B.event_type = 'click',
                 C AS C.event_type = 'purchase'
        )"""
    events.createOrReplaceTempView("events")
    exp = {(r.user_id, r.view_id, r.n_clicks, r.purchase_id)
           for r in match_recognize(spark, sql).collect()}

    stream = replay_as_stream(events, n_batches=6, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.view_id, r.n_clicks, r.purchase_id)
           for r in write_stream_to_memory(
               match_recognize(spark, sql, df=stream),
               "mrstar_out", output_mode="append").collect()}
    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.6
    assert any(n == 0 for _u, _v, n, _p in got)  # zero-B matches too


def test_group_reluctant_and_streaming_boundaries():
    """Reluctant group quantifiers unroll ascending (fewer reps
    preferred) and the stray `?` never leaks onto the last unrolled
    variable; streaming rejects notFollowedBy-before-optional like
    batch; Pattern.times(m>1).optional() raises (TIMES+OPTIONAL is a
    non-contiguous set)."""
    import pytest
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        _expand_groups, _parse_pattern)
    assert _expand_groups("A (B C){1,2}?") == ["A B C", "A B C B C"]
    assert _expand_groups("A (B C)??") == ["A", "A B C"]
    b, _, _ = _parse_pattern("(A (B C){1,2}?)")
    assert all(mn == 1 and mx == 1 for _n, mn, mx, _g in b[0])

    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, match_pattern_stream)
    from flink_1_11_2_with_comments_spark.streaming.pattern import Pattern
    t = lambda e: True
    with pytest.raises(ValueError, match="notFollowedBy"):
        match_pattern_stream(
            None, ["k"], "ts",
            [QStep("a", t), QStep("n", t, negated=True),
             QStep("b", t, min_times=0, max_times=1,
                   contiguity="strict"),
             QStep("c", t, contiguity="strict")])
    with pytest.raises(NotImplementedError, match="TIMES"):
        Pattern.begin("a").where(t).times(3).optional()


def test_cep_alternation_regex_equivalence_fuzz():
    """Property: alternation `A B | C D` under both SKIP PAST LAST and
    SKIP TO NEXT ROW equals the regex engine's `|` (leftmost-arm
    preference at the same start row) on random patterns — extends the
    single-branch fuzz to the branch matcher (_all_alt_matches)."""
    import random
    import re as regex
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        _parse_pattern)
    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, _all_alt_matches, _all_q_matches)

    def build(pattern):
        branches_raw, _, _ = _parse_pattern(pattern)
        branches = []
        for braw in branches_raw:
            steps = [QStep(name, (lambda ev, ch=name: ev["c"] == ch),
                           min_times=mn, max_times=mx,
                           contiguity="relaxed" if i == 0 else "strict",
                           greedy=greedy)
                     for i, (name, mn, mx, greedy) in enumerate(braw)]
            if not any(st.min_times > 0 for st in steps):
                return None
            branches.append(steps)
        return branches

    def nfa_spans(branches, s, am):
        events = [{"ts": i, "id": i, "c": ch} for i, ch in enumerate(s)]
        ms = (_all_q_matches(events, branches[0], "ts", None, am, "id")
              if len(branches) == 1 else
              _all_alt_matches(events, branches, "ts", None, am, "id"))
        return [([e for _s, r in m for e in r][0]["id"],
                 [e for _s, r in m for e in r][-1]["id"] + 1)
                for m in ms]

    def regex_spans(rx, s, am):
        pat = regex.compile(rx)
        out = []
        if am == "skip_to_next_row":
            for pos in range(len(s)):
                m = pat.match(s, pos)
                if m and m.end() > m.start():
                    out.append((m.start(), m.end()))
            return out
        pos = 0
        while pos <= len(s):
            m = pat.search(s, pos)
            if not m:
                break
            if m.end() > m.start():
                out.append((m.start(), m.end()))
            pos = m.end() if m.end() > m.start() else m.start() + 1
        return out

    quants = ["", "+", "*", "?", "{2}", "{1,2}", "+?", "*?", "??",
              "{1,2}?"]
    rng = random.Random(99)
    checked = 0
    for _ in range(400):
        def arm():
            return [rng.choice("ABC") + rng.choice(quants)
                    for _ in range(rng.randint(1, 3))]
        arms = [arm() for _ in range(rng.randint(1, 3))]
        pat = "(" + " | ".join(" ".join(a) for a in arms) + ")"
        rx = "|".join("".join(a) for a in arms)
        am = rng.choice(["skip_past_last", "skip_to_next_row"])
        s = "".join(rng.choice("ABC") for _ in range(rng.randint(5, 25)))
        try:
            branches = build(pat)
        except NotImplementedError:
            continue
        if branches is None:
            continue
        checked += 1
        assert nfa_spans(branches, s, am) == regex_spans(rx, s, am), \
            (am, pat, s)
    assert checked > 200


def test_match_recognize_alternation_streaming(spark, events):
    """Alternation `(A B | C D)` through the STREAMING NFA: flags are
    computed once over the branch union, the anchored scan takes the
    first matching branch per position (SQL alternation preference
    within the watermark-complete prefix), and every streamed
    emission is a batch-alternation match."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES A.event_id AS a_id, B.event_id AS b_id,
                   C.event_id AS c_id, D.event_id AS d_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B | C D)
          DEFINE A AS A.event_type = 'view',
                 B AS B.event_type = 'click',
                 C AS C.event_type = 'click',
                 D AS D.event_type = 'purchase'
        )"""
    events.createOrReplaceTempView("events")
    exp = {(r.user_id, r.a_id, r.b_id, r.c_id, r.d_id)
           for r in match_recognize(spark, sql).collect()}

    stream = replay_as_stream(events, n_batches=5, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.a_id, r.b_id, r.c_id, r.d_id)
           for r in write_stream_to_memory(
               match_recognize(spark, sql, df=stream),
               "mralt_out", output_mode="append").collect()}
    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.6


def test_match_recognize_skip_to_first_streaming(spark, events):
    """AFTER MATCH SKIP TO FIRST(B) through the STREAMING NFA:
    overlapping matches are allowed — eviction keeps everything from
    the resume point on — and every streamed emission is a batch
    match under the same strategy."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(A.event_id) AS a_id,
                   FIRST(B.event_id) AS b_first,
                   LAST(B.event_id) AS b_last
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO FIRST B
          PATTERN (A B+)
          DEFINE A AS A.event_type = 'view',
                 B AS B.event_type = 'click'
        )"""
    events.createOrReplaceTempView("events")
    exp = {(r.user_id, r.a_id, r.b_first, r.b_last)
           for r in match_recognize(spark, sql).collect()}

    stream = replay_as_stream(events, n_batches=5, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.a_id, r.b_first, r.b_last)
           for r in write_stream_to_memory(
               match_recognize(spark, sql, df=stream),
               "mrskipf_out", output_mode="append").collect()}
    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.6


def test_match_recognize_all_rows_aggregates_streaming(spark, events):
    """Streaming ALL ROWS PER MATCH with AGGREGATE measures
    (RUNNING COUNT(B.*), FIRST/LAST ids, FINAL COUNT(*)): the NFA
    evaluates the same frames the batch twin computes as window
    functions — at emission, since matches emit atomically. Every
    streamed row must equal its batch-twin row."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES MATCH_NUMBER() AS mno,
                   CLASSIFIER() AS var,
                   FIRST(A.event_id) AS a_id,
                   COUNT(B.*) AS n_clicks,
                   FINAL COUNT(*) AS match_len,
                   LAST(B.event_id) AS b_last
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+)
          DEFINE A AS A.event_type = 'view',
                 B AS B.event_type = 'click'
        )"""
    events.createOrReplaceTempView("events")
    exp = {(r.user_id, r.event_id, r.mno, r.var, r.a_id, r.n_clicks,
            r.match_len, r.b_last)
           for r in match_recognize(spark, sql).collect()}

    stream = replay_as_stream(events, n_batches=5, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.event_id, r.mno, r.var, r.a_id, r.n_clicks,
            r.match_len, r.b_last)
           for r in write_stream_to_memory(
               match_recognize(spark, sql, df=stream),
               "mraragg_out", output_mode="append").collect()}
    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.6


def test_match_recognize_group_times_streaming(spark, events):
    """Group quantifier `(A B){1,2}` through the STREAMING NFA: the
    unrolled branches run as an alternation with union flags; every
    streamed emission is a batch match."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(A.event_id) AS a_first,
                   COUNT(A.*) AS n_a, COUNT(B.*) AS n_b
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN ((A B){1,2})
          DEFINE A AS A.event_type = 'view',
                 B AS B.event_type = 'click'
        )"""
    events.createOrReplaceTempView("events")
    exp = {(r.user_id, r.a_first, r.n_a, r.n_b)
           for r in match_recognize(spark, sql).collect()}

    stream = replay_as_stream(events, n_batches=5, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.a_first, r.n_a, r.n_b)
           for r in write_stream_to_memory(
               match_recognize(spark, sql, df=stream),
               "mrgrp_out", output_mode="append").collect()}
    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.5


def test_match_recognize_prev_next_streaming(spark, events):
    """Iterative DEFINE conditions (PREV/NEXT navigation) through the
    STREAMING NFA: the buffer carries the nav-referenced columns, nav
    flags freeze once the event's neighbors are watermark-final, and
    evicted predecessors persist as bounded ghosts. Every streamed
    emission must be a batch-twin match."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(A.event_id) AS a_first,
                   LAST(A.event_id) AS a_last,
                   COUNT(A.*) AS n_rising
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A{2,})
          DEFINE A AS A.value > PREV(A.value)
        )"""
    events.createOrReplaceTempView("events")
    exp = {(r.user_id, r.a_first, r.a_last, r.n_rising)
           for r in match_recognize(spark, sql).collect()}

    stream = replay_as_stream(events, n_batches=5, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.a_first, r.a_last, r.n_rising)
           for r in write_stream_to_memory(
               match_recognize(spark, sql, df=stream),
               "mrprev_out", output_mode="append").collect()}
    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.5

    sql_next = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(B.event_id) AS b_first, COUNT(B.*) AS n_b
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (B{2,})
          DEFINE B AS B.value < NEXT(B.value)
        )"""
    exp2 = {(r.user_id, r.b_first, r.n_b)
            for r in match_recognize(spark, sql_next).collect()}
    stream2 = replay_as_stream(events, n_batches=5, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got2 = {(r.user_id, r.b_first, r.n_b)
            for r in write_stream_to_memory(
                match_recognize(spark, sql_next, df=stream2),
                "mrnext_out", output_mode="append").collect()}
    assert len(got2) > 0
    assert got2 <= exp2, list(got2 - exp2)[:5]
    assert len(got2) >= len(exp2) * 0.5


def test_match_recognize_skip_to_next_row_streaming(spark, events):
    """AFTER MATCH SKIP TO NEXT ROW through the STREAMING NFA: the
    anchored scan emits the preferred match per start row and resumes
    one past the match's start — overlapping matches stream, and
    every streamed emission is a batch-twin match."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    sql = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(A.event_id) AS a_id,
                   COUNT(B.*) AS n_b,
                   LAST(B.event_id) AS b_last
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A B+)
          DEFINE A AS A.event_type = 'view',
                 B AS B.event_type = 'click'
        )"""
    events.createOrReplaceTempView("events")
    exp = {(r.user_id, r.a_id, r.n_b, r.b_last)
           for r in match_recognize(spark, sql).collect()}

    stream = replay_as_stream(events, n_batches=5, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.a_id, r.n_b, r.b_last)
           for r in write_stream_to_memory(
               match_recognize(spark, sql, df=stream),
               "mrskipn_out", output_mode="append").collect()}
    assert len(got) > 0
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.6


def test_match_recognize_min0_edge_streaming(spark, events):
    """min-0 quantifiers on the FIRST and LAST pattern variables now
    stream (previously batch-only). Leading `A?` routes through the
    anchored per-position scan so leftmost preference survives a zero
    leading binding; trailing `B*` rides the greedy boundary deferral
    (a match ending at the watermark edge is held until a final
    successor fails to extend it). Streamed matches must be a subset
    of the batch matches, cover most of them (tail matches may still
    be deferred when the stream ends), and include zero-bound-edge
    matches on both sides."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    events.createOrReplaceTempView("events")

    leading = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES COUNT(A.*) AS n_views,
                   B.event_id AS purchase_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A? B)
          DEFINE A AS A.event_type = 'view',
                 B AS B.event_type = 'purchase'
        )"""
    exp = {(r.user_id, r.n_views, r.purchase_id)
           for r in match_recognize(spark, leading).collect()}
    stream = replay_as_stream(events, n_batches=6, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.n_views, r.purchase_id)
           for r in write_stream_to_memory(
               match_recognize(spark, leading, df=stream),
               "mr_min0_lead", output_mode="append").collect()}
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.6
    assert any(n == 0 for _u, n, _p in got)   # zero-A matches stream
    assert any(n == 1 for _u, n, _p in got)   # consuming-A too

    trailing = """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES A.event_id AS purchase_id,
                   COUNT(B.*) AS n_clicks
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B*)
          DEFINE A AS A.event_type = 'purchase',
                 B AS B.event_type = 'click'
        )"""
    exp = {(r.user_id, r.purchase_id, r.n_clicks)
           for r in match_recognize(spark, trailing).collect()}
    stream = replay_as_stream(events, n_batches=6, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {(r.user_id, r.purchase_id, r.n_clicks)
           for r in write_stream_to_memory(
               match_recognize(spark, trailing, df=stream),
               "mr_min0_trail", output_mode="append").collect()}
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.5
    assert any(n == 0 for _u, _p, n in got)   # zero-B matches stream


@pytest.mark.parametrize("pattern,defines", [
    # greedy star leading: zero-or-more views then a purchase
    ("A* B", {"A": "view", "B": "purchase"}),
    # both edges optional around a required core
    ("A? B A?", {"A": "click", "B": "purchase"}),
    # reluctant trailing min-0: prefer the bare purchase
    ("B C??", {"B": "purchase", "C": "click"}),
])
def test_min0_edge_streaming_more_shapes(spark, events, pattern,
                                         defines):
    """Further min-0 edge coverage on STREAMS: leading `*`, optional
    on both edges (same variable), and a reluctant trailing `??`.
    Streamed matches must be a subset of batch matches with majority
    coverage."""
    from flink_1_11_2_with_comments_spark.plans.match_recognize import (
        match_recognize)

    events.createOrReplaceTempView("events")
    define_sql = ",\n".join(
        f"{v} AS {v}.event_type = '{t}'" for v, t in defines.items())
    measure_vars = sorted(defines)
    measures = ",\n".join(
        f"COUNT({v}.*) AS n_{v.lower()}" for v in measure_vars)
    sql = f"""
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(B.event_id) AS anchor_id, {measures}
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN ({pattern})
          DEFINE {define_sql}
        )"""
    cols = ["user_id", "anchor_id"] + [f"n_{v.lower()}"
                                       for v in measure_vars]
    exp = {tuple(getattr(r, c) for c in cols)
           for r in match_recognize(spark, sql).collect()}
    stream = replay_as_stream(events, n_batches=5, order_by="ts") \
        .withWatermark("ts", "30 seconds")
    got = {tuple(getattr(r, c) for c in cols)
           for r in write_stream_to_memory(
               match_recognize(spark, sql, df=stream),
               f"mr_min0_more_{abs(hash(pattern))}",
               output_mode="append").collect()}
    assert got <= exp, list(got - exp)[:5]
    assert len(got) >= len(exp) * 0.5


def test_misra_gries_streaming_heavy_hitters(spark, events):
    """Streaming Misra-Gries summary vs exact batch counts: after the
    stream drains, for every partition key (1) every item with true
    frequency > n/k appears in the final summary (the MG no-false-
    negative guarantee), and (2) every reported count is an
    UNDER-estimate within n/k of the truth."""
    from flink_1_11_2_with_comments_spark.streaming.misra_gries import (
        misra_gries_stream)

    K = 4
    src = events.select((F.col("user_id") % 3).alias("g"),
                        "event_type", "ts", "event_id")
    stream = replay_as_stream(src, n_batches=5, order_by="ts")
    out = write_stream_to_memory(
        misra_gries_stream(stream, ["g"], "event_type", k=K),
        "mg_out", output_mode="update")
    # latest summary per (g, item)
    latest = (out.withColumn(
        "rk", F.row_number().over(
            W.partitionBy("g", "item").orderBy(F.desc("n_processed"))))
        .where(F.col("rk") == 1))
    summary = {(r.g, r.item): (r.est_count, r.n_processed)
               for r in latest.collect()}
    exact = {(str(r.g), r.event_type): r.n
             for r in src.groupBy("g", "event_type")
             .agg(F.count("*").alias("n")).collect()}
    n_per_g = {}
    for (g, _it), n in exact.items():
        n_per_g[g] = n_per_g.get(g, 0) + n
    assert summary, "no summary emitted"
    for (g, item), true_n in exact.items():
        thresh = n_per_g[g] / K
        if true_n > thresh:
            assert (g, item) in summary, (g, item, true_n, thresh)
    for (g, item), (est, _np) in summary.items():
        true_n = exact.get((g, item), 0)
        assert est <= true_n, (g, item, est, true_n)
        assert true_n - est <= n_per_g[g] / K, (g, item, est, true_n)


def test_streaming_running_moments_parity(spark):
    """Incremental per-dimension moments in keyed state (the streaming
    variant of embedding_standardize's stats pass) converge to
    BIT-EQUAL statistics vs the batch DECIMAL(18,10) aggregate, at
    two different micro-batchings — the GroupAggFunction accumulator
    contract (per-key ValueState, update stream downstream)."""
    from flink_1_11_2_with_comments_spark.streaming.moments import (
        running_moments)

    e = load_table(spark, SF, "embeddings")
    z = (e.select(F.posexplode("embedding").alias("pos", "xf"))
         .select("pos", F.col("xf").cast("double").alias("x")))

    DEC = "decimal(18,10)"
    batch = {r.pos: (r.n, r.mu, r.m2) for r in (
        z.groupBy("pos")
        .agg(F.count("*").alias("n"),
             (F.sum(F.col("x").cast(DEC)).cast("double")
              / F.count("*")).alias("mu"),
             (F.sum((F.col("x") * F.col("x")).cast(DEC))
              .cast("double") / F.count("*")).alias("m2"))
        .collect())}

    for n_batches, name in ((3, "mom3"), (7, "mom7")):
        stream = replay_as_stream(z, n_batches=n_batches)
        got = write_stream_to_memory(
            running_moments(stream, key="pos", value="x"), name)
        # update semantics: the row with the highest n per key is the
        # final statistic
        final = {}
        for r in got.collect():
            if r.pos not in final or r.n > final[r.pos][0]:
                final[r.pos] = (r.n, r.mu, r.m2, r.sigma)
        assert set(final) == set(batch)
        for pos, (n, mu, m2) in batch.items():
            fn_, fmu, fm2, fsig = final[pos]
            assert (fn_, fmu, fm2) == (n, mu, m2), pos
            import math as _m
            assert fsig == _m.sqrt(fm2 - fmu * fmu)


def test_streaming_gk_quantiles_bound(spark, events):
    """Streaming Greenwald-Khanna quantile sketch vs exact sorted
    ranks: after the stream drains, for every partition key and every
    queried phi, the TRUE rank of the reported value lies within
    eps*n of phi*n (the GK guarantee), and the summary stays at
    O((1/eps)*log(eps*n)) tuples — bounded state on unbounded input."""
    import bisect

    from flink_1_11_2_with_comments_spark.streaming.gk_quantiles import (
        PHIS, gk_quantiles_stream)

    EPS = 0.05
    src = events.select((F.col("user_id") % 3).alias("g"),
                        "value", "ts", "event_id")
    stream = replay_as_stream(src, n_batches=5, order_by="ts")
    out = write_stream_to_memory(
        gk_quantiles_stream(stream, ["g"], "value", eps=EPS),
        "gk_out", output_mode="update")
    latest = (out.withColumn(
        "rk", F.row_number().over(
            W.partitionBy("g", "phi").orderBy(F.desc("n_processed"))))
        .where(F.col("rk") == 1))
    got = {(r.g, r.phi): (r.est, r.n_processed, r.n_tuples)
           for r in latest.collect()}
    exact = {}
    for r in src.collect():
        exact.setdefault(str(r.g % 3), []).append(r.value)
    for vals in exact.values():
        vals.sort()
    assert got, "no quantiles emitted"
    for (g, phi), (est, n_proc, n_tuples) in got.items():
        vals = exact[g]
        n = len(vals)
        assert n_proc == n, (g, n_proc, n)
        # the final summary must stay tiny vs the exact multiset
        assert n_tuples <= 60, (g, n_tuples)
        lo = bisect.bisect_left(vals, est) + 1
        hi = bisect.bisect_right(vals, est)
        target = phi * n
        err = 0 if lo <= target <= hi else min(
            abs(lo - target), abs(hi - target))
        assert err <= EPS * n, (g, phi, est, err, EPS * n)
    assert {phi for (_g, phi) in got} == set(PHIS)


def test_gk_sketch_bound_fuzz():
    """Property: on arbitrary float streams (any length, any order,
    heavy duplicates included), the pure-Python GK core maintains the
    rank-error-within-eps*n guarantee for every queried phi, and the
    summary size stays far below n. Fuzzes the sketch independently
    of the streaming harness (which test_streaming_gk_quantiles_bound
    covers)."""
    import bisect
    from hypothesis import given, settings, strategies as st

    from flink_1_11_2_with_comments_spark.streaming.gk_quantiles import (
        PHIS, gk_compress, gk_insert, gk_query)

    EPS = 0.1
    period = max(int(1 / (2 * EPS)), 1)

    @given(st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=400))
    @settings(max_examples=200, deadline=None)
    def check(data):
        tuples, n = [], 0
        for v in data:
            gk_insert(tuples, v, n, EPS)
            n += 1
            if n % period == 0:
                gk_compress(tuples, n, EPS)
        srt = sorted(data)
        for phi in PHIS:
            est = gk_query(tuples, phi, n, EPS)
            lo = bisect.bisect_left(srt, est) + 1
            hi = bisect.bisect_right(srt, est)
            target = phi * n
            err = 0 if lo <= target <= hi else min(
                abs(lo - target), abs(hi - target))
            assert err <= EPS * n + 1, (data, phi, est, err)

    check()


def test_streaming_cosine_dedup_parity(spark):
    """Online keep-first near-dup filter vs the exact offline
    simulation: buckets from the SAME md5 hyperplanes, per-bucket
    greedy admission in vec_id order with the same rounded-numpy
    cosine — decisions (is_dup, dup_of) must match EXACTLY at two
    different micro-batchings, and cross-batch state must carry
    (a survivor admitted in batch 1 must suppress its near-dups in
    batch 4)."""
    import numpy as np
    from flink_1_11_2_with_comments_spark.pipeline.similarity import (
        lsh_buckets)
    from flink_1_11_2_with_comments_spark.streaming.neardup import (
        streaming_cosine_dedup)

    TH, PLANES = 0.8, 4
    base = load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    # inject guaranteed near-dups: 2x-scaled copies have bit-identical
    # unit vectors (power-of-two scaling is exact), hence the same
    # bucket and cosine 1.0 against their originals
    e = base.unionAll(base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0))
        .alias("embedding")))
    rows = (e.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("v"))
            .join(lsh_buckets(e, "vec_id", "embedding", n_planes=PLANES),
                  "vec_id")
            .orderBy("vec_id").collect())

    expect, state = {}, {}
    for r in rows:
        v = np.asarray(r.v, dtype=np.float64)
        nrm = float(np.sqrt(v @ v))
        ids, vecs = state.setdefault(r.bucket, ([], []))
        best, bid = None, None
        if nrm > 0.0 and vecs:
            cos = np.round(np.array(vecs, dtype=np.float64) @ (v / nrm), 9)
            k = int(np.argmax(cos))
            best, bid = float(cos[k]), ids[k]
        dup = best is not None and best >= TH
        expect[r.vec_id] = (r.bucket, dup, bid if dup else None)
        if not dup and nrm > 0.0:
            ids.append(r.vec_id)
            vecs.append((v / nrm).tolist())
    assert any(d for (_b, d, _o) in expect.values()), \
        "threshold found no dups; test would be vacuous"

    for n_batches, name in ((1, "nd1"), (4, "nd4")):
        stream = replay_as_stream(e, n_batches=n_batches,
                                  order_by="vec_id")
        got = write_stream_to_memory(
            streaming_cosine_dedup(stream, "vec_id", "embedding",
                                   "vec_id", threshold=TH,
                                   n_planes=PLANES), name)
        gm = {r.id: (r.bucket, r.is_dup, r.dup_of)
              for r in got.collect()}
        assert gm == expect, {
            k: (gm.get(k), expect[k])
            for k in set(gm) | set(expect) if gm.get(k) != expect[k]}


def test_streaming_scd2_parity(spark, events):
    """Stream-maintained SCD2 state equals the batch build at several
    micro-batchings — the reference's temporal-table maintenance
    contract (TemporalRowTimeJoinOperator.java:72: right-side keyed
    state holds the version history; the batch build materializes the
    same history with windows). Each key's final emission (max
    n_seen) must be row-identical to scd2_dimension_build: same
    version chain, same [valid_from, valid_to) intervals, same
    is_current flags — no-change updates collapsed identically."""
    from flink_1_11_2_with_comments_spark.queries import all_specs
    from flink_1_11_2_with_comments_spark.streaming.scd2 import (
        scd2_maintain)

    batch = all_specs()["scd2_dimension_build"].fn(spark, SF)
    exp = sorted(
        (r.user_id, r.status, r.valid_from, r.valid_to, r.version,
         r.is_current) for r in batch.collect())

    for n_batches in (1, 4, 9):
        stream = replay_as_stream(events, n_batches=n_batches,
                                  order_by="ts")
        got = write_stream_to_memory(
            scd2_maintain(stream), f"scd2_{n_batches}",
            output_mode="update")
        latest = (got.withColumn(
            "mx", F.max("n_seen").over(W.partitionBy("user_id")))
            .where(F.col("n_seen") == F.col("mx")))
        rows = sorted(
            (r.user_id, r.status, r.valid_from, r.valid_to, r.version,
             r.is_current) for r in latest.collect())
        assert rows == exp, f"n_batches={n_batches}"


def test_scd2_bootstrap_stream_parity(spark, events):
    """State Processor API analog (reference: flink-libraries/
    flink-state-processing-api — bootstrap keyed state from a DataSet,
    then start the streaming job from the savepoint): the SCD2
    dimension built in BATCH over pre-cutoff history is converted to
    seed transitions (scd2_bootstrap_events), and the streaming
    maintainer consumes seed ∪ post-cutoff events WITHOUT ever seeing
    pre-cutoff raw history. Its final snapshot must be row-identical
    to the batch build over ALL events — version numbers, interval
    bounds, is_current — at several micro-batchings, including seeds
    and live rows sharing one batch (n_batches=1)."""
    from flink_1_11_2_with_comments_spark.streaming.scd2 import (
        scd2_bootstrap_events, scd2_build_batch, scd2_maintain)

    e = events.select("user_id", "event_type", "ts", "event_id")
    cutoff = F.lit("2024-01-16 00:00:00").cast(e.schema["ts"].dataType)
    seeds = scd2_bootstrap_events(
        scd2_build_batch(e.where(F.col("ts") < cutoff)))
    late = e.where(F.col("ts") >= cutoff)
    assert seeds.count() > 0 and late.count() > 0

    exp = sorted(
        (r.user_id, r.status, r.valid_from, r.valid_to, r.version,
         r.is_current) for r in scd2_build_batch(e).collect())

    replayed = seeds.unionByName(late.select(seeds.columns))
    for n_batches in (1, 3):
        stream = replay_as_stream(replayed, n_batches=n_batches,
                                  order_by="ts")
        got = write_stream_to_memory(
            scd2_maintain(stream), f"scd2_boot_{n_batches}",
            output_mode="update")
        latest = (got.withColumn(
            "mx", F.max("n_seen").over(W.partitionBy("user_id")))
            .where(F.col("n_seen") == F.col("mx")))
        rows = sorted(
            (r.user_id, r.status, r.valid_from, r.valid_to, r.version,
             r.is_current) for r in latest.collect())
        assert rows == exp, f"n_batches={n_batches}"


def test_scd2_savepoint_read_and_resume(spark, events):
    """The CLOSED State Processor loop: run the streaming SCD2
    maintainer over pre-cutoff history with a persistent checkpoint,
    READ its keyed state back relationally (scd2_read_savepoint over
    the statestore source — ExistingSavepoint.readKeyedState's role),
    verify the read state IS the batch-built dimension, then
    bootstrap a NEW job from the read snapshot and stream only
    post-cutoff events: the resumed job's final table must equal the
    batch build over all events. No private savepoint format — the
    checkpoint is read with a standard data source and re-entered
    through the operator's own input schema."""
    import tempfile

    from flink_1_11_2_with_comments_spark.catalog import naive_timestamps
    from flink_1_11_2_with_comments_spark.streaming.scd2 import (
        scd2_bootstrap_events, scd2_build_batch, scd2_maintain,
        scd2_read_savepoint)

    e = events.select("user_id", "event_type", "ts", "event_id")
    cutoff = F.lit("2024-01-16 00:00:00").cast(e.schema["ts"].dataType)
    early = e.where(F.col("ts") < cutoff)
    late = e.where(F.col("ts") >= cutoff)

    # 1. first job: maintain over early history, checkpoint kept
    ckpt = tempfile.mkdtemp(prefix="scd2_savepoint_")
    write_stream_to_memory(
        scd2_maintain(replay_as_stream(early, n_batches=2,
                                       order_by="ts")),
        "scd2_sp_job1", output_mode="update", checkpoint_dir=ckpt)

    # 2. read the savepoint; must equal the batch build over early
    dim_read = naive_timestamps(scd2_read_savepoint(spark, ckpt))
    got = sorted(
        (r.user_id, r.status, r.valid_from, r.valid_to, r.version,
         r.is_current) for r in dim_read.collect())
    exp_early = sorted(
        (r.user_id, r.status, r.valid_from, r.valid_to, r.version,
         r.is_current) for r in scd2_build_batch(early).collect())
    assert got == exp_early

    # 3. resume: bootstrap a fresh job from the READ state + late rows
    seeds = scd2_bootstrap_events(dim_read)
    resumed = write_stream_to_memory(
        scd2_maintain(replay_as_stream(
            seeds.unionByName(late.select(seeds.columns)),
            n_batches=2, order_by="ts")),
        "scd2_sp_job2", output_mode="update")
    latest = (resumed.withColumn(
        "mx", F.max("n_seen").over(W.partitionBy("user_id")))
        .where(F.col("n_seen") == F.col("mx")))
    rows = sorted(
        (r.user_id, r.status, r.valid_from, r.valid_to, r.version,
         r.is_current) for r in latest.collect())
    exp_full = sorted(
        (r.user_id, r.status, r.valid_from, r.valid_to, r.version,
         r.is_current) for r in scd2_build_batch(e).collect())
    assert rows == exp_full


def test_transform_with_state_env_gate():
    """Documents why the keyed-state layer is applyInPandasWithState
    (streaming/state.py keyed_process) rather than Spark 4's
    transformWithStateInPandas with its native initialState relation:
    the TWS state-server protocol requires google.protobuf, which is
    absent in this container — the API crashes at plan time
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE in
    validateAndMaybeEvolveStateSchema). Same honest-gate contract as
    the Kafka/ES jars. If the environment gains protobuf, this test
    flips to a skip and TWS initial-state becomes the preferred
    bootstrap path (today's path: scd2_bootstrap_events replays the
    relational state snapshot through the same operator)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        # the documented container boundary: the exact module the TWS
        # state-server client imports first must fail the same way
        with pytest.raises(ImportError):
            import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401
    else:
        pytest.skip("protobuf present: transformWithState is viable "
                    "here; bootstrap via initialState when migrating")


def test_cdc_to_scd2_composition(spark, events):
    """The temporal-table topology end-to-end: Debezium envelopes
    (the CDC changelog) streamed through parse_debezium_json into
    scd2_maintain — the stream-maintained version history must equal
    the batch SCD2 build over the same upsert rows. This is the
    reference's full story: changelog source -> versioned table
    (DebeziumJsonDeserializationSchema feeding the temporal table
    that TemporalRowTimeJoinOperator probes)."""
    from flink_1_11_2_with_comments_spark.sources.cdc import (
        parse_debezium_json)
    from flink_1_11_2_with_comments_spark.streaming.scd2 import (
        scd2_maintain)

    src = events.select("user_id", "event_type", "ts", "event_id")
    env = src.select(
        "ts", "event_id",
        F.to_json(F.struct(
            F.lit(None).cast("struct<user_id bigint, event_type string,"
                             " ts_ns bigint, event_id bigint>")
            .alias("before"),
            F.struct("user_id", "event_type",
                     F.unix_micros(F.col("ts").cast("timestamp"))
                     .alias("ts_ns"), "event_id").alias("after"),
            F.lit("u").alias("op"),
            (F.unix_micros(F.col("ts").cast("timestamp")) / 1000)
            .cast("bigint").alias("ts_ms"))).alias("payload"))

    stream = replay_as_stream(env, n_batches=4, order_by="ts")
    parsed = parse_debezium_json(
        stream, "payload",
        "user_id bigint, event_type string, ts_ns bigint, "
        "event_id bigint", keep_cols=("ts",))
    upserts = parsed.where(F.col("rowkind").isin("+I", "+U"))
    got = write_stream_to_memory(
        scd2_maintain(upserts), "cdc_scd2", output_mode="update")
    latest = (got.withColumn(
        "mx", F.max("n_seen").over(W.partitionBy("user_id")))
        .where(F.col("n_seen") == F.col("mx")))
    rows = sorted(
        (r.user_id, r.status, r.valid_from, r.valid_to, r.version)
        for r in latest.collect())

    wk = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (src.withColumn("prev", F.lag("event_type").over(wk))
               .where(F.col("prev").isNull()
                      | (F.col("prev") != F.col("event_type"))))
    exp = sorted(
        (r.user_id, r.event_type, r.ts, r.valid_to, r.version)
        for r in changes.select(
            "user_id", "event_type", "ts",
            F.lead("ts").over(wk).alias("valid_to"),
            F.row_number().over(wk).cast("int").alias("version"))
        .collect())
    assert rows == exp


def test_streaming_dsir_parity(spark):
    """Streaming DSIR scoring (broadcast-state pattern: the 64-bucket
    log-ratio table fitted offline, documents scored map-only) is
    BIT-EQUAL to the batch corpus_dsir_weights query per document, at
    two micro-batchings — the BroadcastProcessFunction contract: the
    control table rides along, the data stream never shuffles."""
    from flink_1_11_2_with_comments_spark.queries import all_specs
    from flink_1_11_2_with_comments_spark.streaming.dsir import (
        dsir_fit, dsir_score_stream)

    docs = load_table(spark, SF, "documents")
    batch = all_specs()["corpus_dsir_weights"].fn(spark, SF)
    exp = sorted((r.doc_id, r.n_tokens, r.dsir_logw)
                 for r in batch.collect())

    ratios = dsir_fit(docs)
    assert len(ratios) == 64
    for n_batches in (2, 5):
        stream = replay_as_stream(docs.select("doc_id", "text"),
                                  n_batches=n_batches)
        got = write_stream_to_memory(
            dsir_score_stream(stream, ratios), f"dsir{n_batches}",
            output_mode="append")
        rows = sorted(map(tuple, got.collect()))
        assert rows == exp, f"n_batches={n_batches}"


def test_streaming_hll_parity(spark, events):
    """Streaming HLL registers in keyed state drain to BIT-EQUAL
    (n_zero, s_scaled, estimate) vs the batch events_hll_distinct
    query, at two micro-batchings AND under out-of-order replay —
    register merge is MAX, order-independent and idempotent, the
    mergeability HLL exists for."""
    from flink_1_11_2_with_comments_spark.queries import all_specs
    from flink_1_11_2_with_comments_spark.streaming.hll import (
        hll_distinct_stream)

    batch = all_specs()["events_hll_distinct"].fn(spark, SF)
    exp = sorted((r.event_type, r.n_zero, r.s_scaled, r.est_distinct)
                 for r in batch.collect())

    # n_batches=3 time-split; n_batches=5 round-robin (out-of-order)
    for n_batches, order in ((3, "ts"), (5, None)):
        stream = replay_as_stream(
            events.select("event_type", "event_id", "ts"),
            n_batches=n_batches, order_by=order)
        out = hll_distinct_stream(
            stream.select("event_type",
                          F.col("event_id").cast("string")
                          .alias("v")),
            ["event_type"], "v")
        got = write_stream_to_memory(out, f"hll{n_batches}",
                                     output_mode="update")
        latest = (got.withColumn(
            "mx", F.max("n_seen").over(W.partitionBy("event_type")))
            .where(F.col("n_seen") == F.col("mx")))
        rows = sorted((r.event_type, r.n_zero, r.s_scaled,
                       r.est_distinct) for r in latest.collect())
        assert rows == exp, f"n_batches={n_batches}"


def test_streaming_vocab_parity(spark):
    """Streaming vocabulary-coverage scoring (broadcast-state: top-K
    vocab fitted offline, documents scored map-only) is BIT-EQUAL to
    the batch corpus_vocab_coverage query per document at two
    micro-batchings — the second broadcast-state twin alongside
    DSIR."""
    from flink_1_11_2_with_comments_spark.queries import all_specs
    from flink_1_11_2_with_comments_spark.streaming.vocab import (
        vocab_fit, vocab_score_stream)

    docs = load_table(spark, SF, "documents")
    batch = all_specs()["corpus_vocab_coverage"].fn(spark, SF)
    exp = sorted((r.doc_id, r.n_tokens, r.n_oov, r.oov_rate)
                 for r in batch.collect())

    vocab = vocab_fit(docs)
    assert len(vocab) == 10
    for n_batches in (2, 6):
        stream = replay_as_stream(docs.select("doc_id", "text"),
                                  n_batches=n_batches)
        got = write_stream_to_memory(
            vocab_score_stream(stream, vocab), f"vocab{n_batches}",
            output_mode="append")
        rows = sorted(map(tuple, got.collect()))
        assert rows == exp, f"n_batches={n_batches}"


def test_streaming_scd2_asof_probe(spark, events):
    """The COMPLETE temporal-table story: the stream-maintained SCD2
    table (keyed-state version history) probed by the event-time
    as-of join must answer version lookups identically to the batch
    SCD2 build — TemporalRowTimeJoinOperator's contract: for any
    probe (user_id, ts), the version with the newest valid_from <=
    ts. Probes land mid-interval and exactly ON version boundaries
    (valid_from itself must match, `<=` semantics)."""
    from flink_1_11_2_with_comments_spark.queries import all_specs
    from flink_1_11_2_with_comments_spark.streaming.asof import (
        asof_join)
    from flink_1_11_2_with_comments_spark.streaming.scd2 import (
        scd2_maintain)

    stream = replay_as_stream(events, n_batches=4, order_by="ts")
    got = write_stream_to_memory(
        scd2_maintain(stream), "scd2_probe", output_mode="update")
    maintained = (got.withColumn(
        "mx", F.max("n_seen").over(W.partitionBy("user_id")))
        .where(F.col("n_seen") == F.col("mx"))
        .select("user_id", "status", "valid_from"))

    batch = (all_specs()["scd2_dimension_build"].fn(spark, SF)
             .select("user_id", "status",
                     F.col("valid_from").alias("bf_valid_from")))

    # probes: every event's own (user_id, ts) — boundary-exact —
    # plus a shifted copy landing mid-interval
    probes = (events.select("user_id", "event_id", "ts")
              .unionAll(events.select(
                  "user_id", (F.col("event_id") + 10**9)
                  .alias("event_id"),
                  (F.col("ts") + F.expr("INTERVAL 1 SECOND"))
                  .alias("ts"))))

    via_stream = asof_join(
        probes, maintained, on=["user_id"], left_ts="ts",
        right_ts="valid_from", right_payload=["status"])
    via_batch = asof_join(
        probes, batch.withColumnRenamed("bf_valid_from",
                                        "valid_from"),
        on=["user_id"], left_ts="ts", right_ts="valid_from",
        right_payload=["status"])
    a = sorted((r.user_id, r.event_id, r.status)
               for r in via_stream.collect())
    b = sorted((r.user_id, r.event_id, r.status)
               for r in via_batch.collect())
    assert a == b and len(a) > 0


def test_streaming_cms_parity(spark, events):
    """Streaming count-min counters (additive keyed state, one key
    per sketch cell) drain EXACTLY to the batch groupBy counts at
    two micro-batchings — counter addition is order-independent —
    and point estimates over the drained sketch match the batch
    events_countmin_point rows for the probe cohort."""
    from flink_1_11_2_with_comments_spark.pipeline.dedup import (
        md5_int_expr)
    from flink_1_11_2_with_comments_spark.queries import all_specs
    from flink_1_11_2_with_comments_spark.streaming.cms import (
        cms_query, cms_stream)

    batch_cells = {(r.i, r.bucket): r.c for r in (
        events.select(
            F.explode(F.array(*[F.lit(i) for i in range(4)]))
            .alias("i"),
            F.col("user_id").cast("string").alias("v"))
        .withColumn("bucket", md5_int_expr(
            F.col("v"), salt=F.concat(F.col("i").cast("string"),
                                      F.lit("|"))) % 64)
        .groupBy("i", "bucket").agg(F.count("*").alias("c"))
        .collect())}

    probes = {r.user_id: r.cms_count
              for r in all_specs()["events_countmin_point"]
              .fn(spark, SF).collect()}

    for n_batches in (2, 5):
        stream = replay_as_stream(events.select("user_id", "ts"),
                                  n_batches=n_batches)
        got = write_stream_to_memory(
            cms_stream(stream, "user_id"), f"cms{n_batches}",
            output_mode="update")
        latest = (got.withColumn(
            "mx", F.max("n_seen").over(W.partitionBy("i", "bucket")))
            .where(F.col("n_seen") == F.col("mx")))
        counters = {(r.i, r.bucket): r.c for r in latest.collect()}
        assert counters == batch_cells, f"n_batches={n_batches}"
        for uid, exp_est in probes.items():
            assert cms_query(counters, str(uid)) == exp_est, uid


def test_streaming_kmv_parity(spark, events):
    """Streaming min-k keyed-state sketches drain BIT-EQUAL to the
    batch events_kmv_distinct_union rows at two micro-batchings —
    including out-of-order replay (min-k is order-independent and
    idempotent) — and the 'ALL' union row equals the min-k MERGE of
    the drained per-type sketches, the theta-sketch union."""
    from flink_1_11_2_with_comments_spark.queries import all_specs
    from flink_1_11_2_with_comments_spark.streaming.kmv import (
        kmv_distinct_stream, kmv_estimate)

    batch = {r.event_type: (r.n_hashes, r.est_distinct)
             for r in all_specs()["events_kmv_distinct_union"]
             .fn(spark, SF).collect()}

    for n_batches, order in ((3, "ts"), (6, None)):
        stream = replay_as_stream(
            events.select("event_type", "user_id", "ts"),
            n_batches=n_batches, order_by=order)
        out = kmv_distinct_stream(
            stream.select("event_type",
                          F.col("user_id").cast("string").alias("v")),
            ["event_type"], "v")
        got = write_stream_to_memory(out, f"kmv{n_batches}_{order}",
                                     output_mode="update")
        latest = (got.withColumn(
            "mx", F.max("n_seen").over(W.partitionBy("event_type")))
            .where(F.col("n_seen") == F.col("mx")))
        ests = {r.event_type: r.est_distinct for r in latest.collect()}
        for et, (_, exp_est) in batch.items():
            if et == "ALL":
                continue
            assert ests[et] == exp_est, (et, n_batches)

    # union: merge the drained per-type sketches (min-k of the union)
    import hashlib
    per_type_hashes = {}
    for r in events.select("event_type", "user_id").distinct() \
            .collect():
        hv = int(hashlib.md5(str(r.user_id).encode())
                 .hexdigest()[:15], 16)
        per_type_hashes.setdefault(r.event_type, set()).add(hv)
    sketches = [sorted(v)[:16] for v in per_type_hashes.values()]
    merged = sorted(set().union(*[set(s) for s in sketches]))[:16]
    assert kmv_estimate(merged) == batch["ALL"][1]


def test_scd2_out_of_order_arrival_raises(spark):
    """scd2_maintain is order-sensitive (unlike the mergeable
    HLL/KMV/CMS twins): a micro-batch whose first (ts, seq) is not
    after the key's last applied one must raise loudly instead of
    silently appending an inconsistent [valid_from, valid_to) chain
    (round-9 advisor fix). Staged so batch order REVERSES event
    time: batch 1 carries the late events, batch 2 the early ones."""
    import datetime

    from flink_1_11_2_with_comments_spark.sources.replay import (
        replay_as_stream, write_stream_to_memory)
    from flink_1_11_2_with_comments_spark.streaming.scd2 import (
        scd2_maintain)

    rows = [(1, "view", datetime.datetime(2024, 1, 1, 10), 4),
            (1, "click", datetime.datetime(2024, 1, 1, 11), 3),
            (1, "view", datetime.datetime(2024, 1, 1, 8), 2),
            (1, "buy", datetime.datetime(2024, 1, 1, 9), 1)]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp_ntz, "
              "event_id bigint")
    # stage_order reverses event_id, so batch 1 carries the two
    # LATE timestamps (10:00/11:00) and batch 2 the early ones —
    # a cross-batch regression the guard must reject
    df = df.withColumn("stage_order", F.lit(100) - F.col("event_id"))
    stream = replay_as_stream(df, n_batches=2, order_by="stage_order")
    stream = stream.drop("stage_order")
    with pytest.raises(Exception, match="out-of-order arrival"):
        write_stream_to_memory(scd2_maintain(stream), "scd2_ooo",
                               output_mode="update")


def test_scd2_in_order_still_green_with_guard(spark):
    """The order guard must not fire on legal in-order replay."""
    import datetime

    from flink_1_11_2_with_comments_spark.sources.replay import (
        replay_as_stream, write_stream_to_memory)
    from flink_1_11_2_with_comments_spark.streaming.scd2 import (
        scd2_maintain)

    rows = [(1, "view", datetime.datetime(2024, 1, 1, 8), 1),
            (1, "buy", datetime.datetime(2024, 1, 1, 9), 2),
            (1, "view", datetime.datetime(2024, 1, 1, 10), 3),
            (1, "view", datetime.datetime(2024, 1, 1, 11), 4)]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp_ntz, "
              "event_id bigint")
    stream = replay_as_stream(df, n_batches=2, order_by="event_id")
    got = write_stream_to_memory(scd2_maintain(stream), "scd2_inord",
                                 output_mode="update")
    latest = (got.withColumn(
        "mx", F.max("n_seen").over(W.partitionBy("user_id")))
        .where(F.col("n_seen") == F.col("mx")))
    chain = sorted((r.version, r.status, r.is_current)
                   for r in latest.collect())
    assert chain == [(1, "view", False), (2, "buy", False),
                     (3, "view", True)]


def test_dsir_fit_empty_corpus_raises(spark):
    """dsir_fit on a corpus yielding zero tokens must fail at fit
    time with a clear message, not return an empty ratio table that
    KeyErrors later in dsir_score_stream (round-9 advisor fix)."""
    from flink_1_11_2_with_comments_spark.streaming.dsir import dsir_fit

    empty = spark.createDataFrame(
        [], "doc_id bigint, text string, lang string")
    with pytest.raises(ValueError, match="no tokens"):
        dsir_fit(empty)


def test_streaming_quality_scorer_parity(spark):
    """The learned quality classifier's broadcast scorer
    (pipeline/quality_clf.quality_score_stream) is BIT-EQUAL to the
    oracle-backed batch application per document at two
    micro-batchings — the BroadcastProcessFunction contract: the
    33-row weight table rides along as control state, the document
    stream never shuffles."""
    from flink_1_11_2_with_comments_spark.pipeline.quality_clf import (
        quality_fit, quality_score_stream)
    from flink_1_11_2_with_comments_spark.queries import all_specs

    docs = load_table(spark, SF, "documents")
    batch = all_specs()["corpus_quality_score_broadcast"].fn(spark, SF)
    exp = sorted((r.doc_id, r.n_tokens, r.score, r.prob, r.pred)
                 for r in batch.collect())

    weights = quality_fit(docs)
    assert len(weights) == 33
    for n_batches in (2, 5):
        stream = replay_as_stream(docs.select("doc_id", "text"),
                                  n_batches=n_batches)
        got = write_stream_to_memory(
            quality_score_stream(stream, weights), f"qclf{n_batches}",
            output_mode="append")
        rows = sorted((r.doc_id, r.n_tokens, r.score, r.prob, r.pred)
                      for r in got.collect())
        assert rows == exp, f"n_batches={n_batches}"


def _stage_explicit_batches(spark, batches, schema):
    """Stage EXPLICIT micro-batch contents (unlike replay_as_stream's
    ntile split) so redelivery scenarios — the same row appearing in
    two batches — can be constructed deterministically."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    import time as _time

    from flink_1_11_2_with_comments_spark.catalog import (
        instant_timestamps)

    base = _tempfile.mkdtemp(prefix="redeliv_")
    data_dir = _os.path.join(base, "data")
    _os.makedirs(data_dir, exist_ok=True)
    now = _time.time() - len(batches) - 1
    out_schema = None
    for i, rows in enumerate(batches, 1):
        df = instant_timestamps(spark.createDataFrame(rows, schema))
        out_schema = df.schema
        tmp = _os.path.join(base, f"stage_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = _glob.glob(_os.path.join(tmp, "part-*.parquet"))[0]
        dst = _os.path.join(data_dir, f"batch_{i:04d}.parquet")
        _shutil.move(src, dst)
        _os.utime(dst, (now + i, now + i))
        _shutil.rmtree(tmp, ignore_errors=True)
    return (spark.readStream.schema(out_schema)
            .option("maxFilesPerTrigger", 1).parquet(data_dir))


_SCD2_SCHEMA = ("user_id bigint, event_type string, ts timestamp, "
                "event_id bigint")


def _scd2_rows(name, stream_df):
    got = write_stream_to_memory(stream_df, name, output_mode="update")
    latest = (got.withColumn(
        "mx", F.max("n_seen").over(W.partitionBy("user_id")))
        .where(F.col("n_seen") == F.col("mx")))
    return sorted((r.user_id, r.status, r.version, r.is_current,
                   r.n_seen) for r in latest.collect())


def test_scd2_exact_duplicate_redelivery_is_idempotent(spark):
    """r9-ADVICE fix: an at-least-once source redelivering the
    EXACTLY-last-applied event (same ts, same seq) must be skipped
    idempotently even under the default on_redelivery='error' — only
    a row STRICTLY before the cursor is a genuine order regression.
    n_seen counts applied rows only (3, not 4)."""
    from datetime import datetime as dt

    from flink_1_11_2_with_comments_spark.streaming.scd2 import (
        scd2_maintain)
    t = lambda s: dt(2024, 1, 1, 0, 0, s)  # noqa: E731
    b1 = [(1, "view", t(1), 10), (1, "click", t(2), 11)]
    b2 = [(1, "click", t(2), 11),  # exact duplicate of the cursor row
          (1, "purchase", t(3), 12)]
    stream = _stage_explicit_batches(spark, [b1, b2], _SCD2_SCHEMA)
    rows = _scd2_rows("scd2_dup_redeliv", scd2_maintain(stream))
    assert rows == [(1, "view", 1, False, 3),
                    (1, "click", 2, False, 3),
                    (1, "purchase", 3, True, 3)] or rows == sorted(
        [(1, "view", 1, False, 3), (1, "click", 2, False, 3),
         (1, "purchase", 3, True, 3)])


def test_scd2_strict_regression_raises_by_default(spark):
    """A row strictly BEFORE the applied cursor is a genuine order
    regression: under the default policy the query must fail loudly
    (order-sensitive state, round-9 advisor guard) rather than append
    an inconsistent version chain."""
    from datetime import datetime as dt

    from flink_1_11_2_with_comments_spark.streaming.scd2 import (
        scd2_maintain)
    t = lambda s: dt(2024, 1, 1, 0, 0, s)  # noqa: E731
    b1 = [(1, "view", t(1), 10), (1, "click", t(2), 11)]
    b2 = [(1, "signup", t(1), 9)]  # strictly before the cursor
    stream = _stage_explicit_batches(spark, [b1, b2], _SCD2_SCHEMA)
    with pytest.raises(Exception, match="out-of-order"):
        _scd2_rows("scd2_regression", scd2_maintain(stream))


def test_scd2_drop_mode_replays_suffix_idempotently(spark):
    """on_redelivery='drop': a full batch-1 replay (the at-least-once
    suffix-replay shape, several rows at-or-before the cursor) is
    dropped with the counter and processing continues — the final
    chain equals the exactly-once build and n_seen never double
    counts."""
    from datetime import datetime as dt

    from flink_1_11_2_with_comments_spark.streaming.scd2 import (
        scd2_maintain)
    t = lambda s: dt(2024, 1, 1, 0, 0, s)  # noqa: E731
    b1 = [(1, "view", t(1), 10), (1, "click", t(2), 11)]
    b2 = list(b1) + [(1, "purchase", t(3), 12)]  # replayed suffix + new
    stream = _stage_explicit_batches(spark, [b1, b2], _SCD2_SCHEMA)
    rows = _scd2_rows("scd2_drop_mode",
                      scd2_maintain(stream, on_redelivery="drop"))
    assert rows == sorted([(1, "view", 1, False, 3),
                           (1, "click", 2, False, 3),
                           (1, "purchase", 3, True, 3)])


@pytest.mark.parametrize("mode", ["error", "drop"])
def test_scd2_within_batch_duplicate_is_idempotent(spark, mode):
    """r10-ADVICE fix: a duplicate (ts, seq) delivered twice WITHIN
    one micro-batch must be applied once — the idempotent rule is
    per-event, not per-cursor-crossing. Before the fix, 'drop' mode
    deduped only against the cross-batch cursor, so same-batch
    redelivery double-counted n_seen. Both policies must drop it (an
    exact duplicate is never an order regression)."""
    from datetime import datetime as dt

    from flink_1_11_2_with_comments_spark.streaming.scd2 import (
        scd2_maintain)
    t = lambda s: dt(2024, 1, 1, 0, 0, s)  # noqa: E731
    b1 = [(1, "view", t(1), 10),
          (1, "click", t(2), 11), (1, "click", t(2), 11)]  # same batch
    b2 = [(1, "purchase", t(3), 12)]
    stream = _stage_explicit_batches(spark, [b1, b2], _SCD2_SCHEMA)
    rows = _scd2_rows(f"scd2_within_dup_{mode}",
                      scd2_maintain(stream, on_redelivery=mode))
    assert rows == sorted([(1, "view", 1, False, 3),
                           (1, "click", 2, False, 3),
                           (1, "purchase", 3, True, 3)])


def test_cep_key_prefilter_semantics(spark):
    """The key prefilter drops exactly the keys that can never match.
    Key 1 has view+click+purchase (matches); key 2 lacks purchase
    (prefiltered, no match — and no crash); for the NEGATED pattern,
    key 3 lacking the negated 'error' type must NOT be prefiltered
    (negated steps are never required)."""
    from datetime import datetime as dt

    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, match_pattern_batch)
    t = lambda s: dt(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [(1, 10, t(1), "view"), (1, 11, t(2), "click"),
            (1, 12, t(3), "purchase"),
            (2, 20, t(1), "view"), (2, 21, t(2), "click"),
            (3, 30, t(1), "view"), (3, 31, t(2), "purchase")]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, "
              "event_type string")
    flags = [F.col("event_type") == v
             for v in ("view", "click", "purchase")]
    steps = [QStep("a", lambda e: e["event_type"] == "view"),
             QStep("b", lambda e: e["event_type"] == "click"),
             QStep("c", lambda e: e["event_type"] == "purchase")]
    got = {r.user_id for r in match_pattern_batch(
        df, ["user_id"], "ts", steps, flag_exprs=flags).collect()}
    assert got == {1}
    neg = [QStep("a", lambda e: e["event_type"] == "view"),
           QStep("x", lambda e: e["event_type"] == "error",
                 negated=True),
           QStep("c", lambda e: e["event_type"] == "purchase")]
    nflags = [F.col("event_type") == v
              for v in ("view", "error", "purchase")]
    got = {r.user_id for r in match_pattern_batch(
        df, ["user_id"], "ts", neg, flag_exprs=nflags).collect()}
    assert got == {1, 3}  # key 3 has no 'error' and must survive


def test_cep_count_aware_prefilter_semantics(spark):
    """r11: the prefilter is COUNT-aware — a key that HAS the required
    event type but too few occurrences to satisfy a {m,} quantifier
    is dropped before Arrow, and the kept keys' matches are identical
    to the unfiltered NFA result. Key 1 has 3 clicks (matches
    click{3} purchase), key 2 has 2 clicks (type present, count
    insufficient — prefiltered, no match), key 3 has 3 clicks but no
    purchase (existing flag-coverage rule)."""
    from datetime import datetime as dt

    from flink_1_11_2_with_comments_spark.streaming.cep import (
        QStep, match_pattern_batch)
    t = lambda s: dt(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = []
    for uid, n_clicks, purchase in ((1, 3, True), (2, 2, True),
                                    (3, 3, False)):
        rows += [(uid, uid * 100 + i, t(i), "click")
                 for i in range(n_clicks)]
        if purchase:
            rows.append((uid, uid * 100 + 50, t(50), "purchase"))
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, "
              "event_type string")
    flags = [F.col("event_type") == "click",
             F.col("event_type") == "purchase"]
    steps = [QStep("a", lambda e: e["event_type"] == "click",
                   min_times=3, max_times=3),
             QStep("b", lambda e: e["event_type"] == "purchase")]
    with_flags = {r.user_id for r in match_pattern_batch(
        df, ["user_id"], "ts", steps, flag_exprs=flags).collect()}
    without = {r.user_id for r in match_pattern_batch(
        df, ["user_id"], "ts", steps).collect()}
    assert with_flags == without == {1}


def test_streaming_bloom_parity(spark):
    """The streamed Bloom position set drains BIT-EQUAL to the batch
    pipeline/bloom.bloom_build filter at two micro-batchings,
    including out-of-order replay (set-union is order-independent and
    idempotent) — the incremental-maintenance contract that lets a
    100 TB ingest keep its dedup prefilter current without
    rebuilding from history. Per-source sharded filters, the
    deployment shape."""
    from flink_1_11_2_with_comments_spark.catalog import load_table
    from flink_1_11_2_with_comments_spark.pipeline.bloom import (
        bloom_build, bloom_positions)
    from flink_1_11_2_with_comments_spark.streaming.bloom_state import (
        bloom_build_stream, positions_digest)

    docs = load_table(spark, SF, "documents")
    digest = F.md5(F.substring(
        F.regexp_replace(F.lower(F.col("text")), r"\s+", " "), 1, 40))
    hist = docs.where(F.col("doc_id") % 2 == 0) \
        .select("source", digest.alias("h"), "doc_id")

    # batch filters, per source shard (bloom_build is per-corpus; the
    # sharded form groups the exploded positions by the shard key)
    exp = {}
    for src in [r.source for r in hist.select("source").distinct()
                .collect()]:
        pos = {r.pos for r in bloom_build(
            hist.where(F.col("source") == src), F.col("h")).collect()}
        exp[src] = (len(pos), positions_digest(pos))

    for n_batches, order in ((3, "doc_id"), (5, None)):
        stream = replay_as_stream(hist, n_batches=n_batches,
                                  order_by=order)
        out = bloom_build_stream(stream, ["source"], "h")
        got = write_stream_to_memory(
            out, f"bloom{n_batches}_{order}", output_mode="update")
        latest = (got.withColumn(
            "mx", F.max("n_seen").over(W.partitionBy("source")))
            .where(F.col("n_seen") == F.col("mx")))
        drained = {r.source: (r.n_positions, r.positions_md5)
                   for r in latest.collect()}
        assert drained == exp, (n_batches, order)

    # the Python position mirror must equal the JVM column expression
    jvm = hist.select("h", *bloom_positions(F.col("h"), 2048, 2)) \
        .limit(20).collect()
    from flink_1_11_2_with_comments_spark.streaming.bloom_state import (
        bloom_positions_py)
    for r in jvm:
        assert bloom_positions_py(r.h, 2048, 2) == [r.p0, r.p1]
