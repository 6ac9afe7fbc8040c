"""Every registry query with an oracle must match DuckDB exactly at
sf0.01 — the same check the driver runs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from flink_1_11_2_with_comments_spark import queries as q

from .parity import assert_exact, duckdb_conn

SPECS = q.all_specs()
WITH_ORACLE = sorted(k for k, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(k for k, s in SPECS.items() if s.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, con, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert_exact(df, con, spec.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_results_invariant_to_partitioning(spark):
    """Parallel-safety of the decimal-accumulation discipline: the
    same query at different shuffle-partition counts (different
    aggregation orders, different partial-agg groupings) returns
    BIT-IDENTICAL values. This is the property that makes results
    reproducible on a 1000-executor cluster vs local[32]."""
    sf = "/root/testdata/sf0.01"
    specs = q.all_specs()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for parts in ("7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            rows = specs["tpch_q1"].fn(spark, sf).collect()
            results.append(sorted(tuple(r) for r in rows))
        assert results[0] == results[1]
        results = []
        for parts in ("7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            rows = specs["graph_pagerank"].fn(spark, sf).collect()
            results.append(sorted(tuple(r) for r in rows))
        assert results[0] == results[1]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_oracle_dtypes_never_int_vs_float(spark, sf_dir, con):
    """Driver-hash guard: for every oracle, no column may be INTEGER
    on the Spark side but FLOAT on the DuckDB side (or vice versa) —
    '3' vs '3.0' fails the representation-level value hash even when
    values are equal (how fn_math went red in round 3, and what
    DuckDB's SUM(int)→HUGEINT→float64 silently causes). Benign
    asymmetries (int32 vs int64 widths, datetime ns vs us resolution)
    are allowed — the driver's hash renders those identically.
    DESCRIBE per oracle keeps this a pure schema check: declared
    column types, no data pass — and unlike a LIMIT-1 fetchdf probe
    it cannot flake when a nullable int column happens to surface a
    NULL first row (pandas would widen it to float64)."""
    bad = []
    for name in WITH_ORACLE:
        spec = SPECS[name]
        desc = con.execute(
            f"DESCRIBE SELECT * FROM ({spec.oracle})").fetchall()
        sp_types = {f.name: f.dataType.simpleString()
                    for f in spec.fn(spark, sf_dir).schema.fields}
        for col, dtype, *_rest in desc:
            d = dtype.upper()
            s = sp_types.get(col, "?")
            int_s = s in ("tinyint", "smallint", "int", "bigint")
            # DECIMAL and HUGEINT count as float-like: fetchdf renders
            # both with a decimal point (pandas has no int128, so
            # HUGEINT — what DuckDB returns for SUM(BIGINT) — widens to
            # float64), which hash-mismatches an integer column even
            # when every value is equal (events_hourly_to_daily_rollup
            # was red for two rounds on exactly this).
            float_d = (d in ("FLOAT", "DOUBLE", "REAL", "HUGEINT")
                       or d.startswith("DECIMAL"))
            int_d = d in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                          "UTINYINT", "USMALLINT",
                          "UINTEGER", "UBIGINT")
            if int_s and float_d:
                bad.append((name, col, s, d))
            if s == "double" and int_d:
                bad.append((name, col, s, d))
    assert not bad, bad


def test_k_core_oracle_converged_within_unrolled_rounds(con):
    """r9-ADVICE pin: the graph_k_core oracle unrolls a FIXED 8 peel
    rounds while operators/graph.k_core iterates to fixpoint
    (max_iter=30). If the verification data's peeling depth ever
    exceeded 8, the oracle would return an unconverged SUPERSET and
    red-flag a correct result. Pin convergence with margin at the
    verification scale: one extra unrolled round must be a no-op —
    rounds=9 returns the identical core (peeling is monotone, so
    equality here proves every round past the fixpoint is idle)."""
    from flink_1_11_2_with_comments_spark.queries.graph_ops import (
        _k_core_oracle)
    r8 = sorted(con.execute(_k_core_oracle(k=80, rounds=8)).fetchall())
    r9 = sorted(con.execute(_k_core_oracle(k=80, rounds=9)).fetchall())
    assert r8 == r9 and len(r8) > 0


def test_no_oracle_is_vacuously_empty(con):
    """r11 audit, made standing: a 0-row result passes the driver's
    hash no matter how the operator is implemented (how
    setop_except_all shipped an exceptAll that was never exercised,
    and join_left_anti/tpch_q20/tpch_q22/tpcds_fraction_of_max were
    green on empty sets for ten rounds). Every oracle must return at
    least one row at the verification scale — except the entries
    whose EMPTINESS is the semantic point."""
    intentionally_empty = {
        "null_not_in",  # NULL-in-subquery three-valued logic: the
                        # empty result IS the NULL-semantics pin
    }
    vacuous = []
    for name in WITH_ORACLE:
        if name in intentionally_empty:
            continue
        n = con.execute(
            f"SELECT COUNT(*) FROM ({SPECS[name].oracle})").fetchone()[0]
        if n == 0:
            vacuous.append(name)
    assert not vacuous, f"0-row oracles (vacuous checks): {vacuous}"


def test_assert_exact_rejects_int_vs_float_skew(spark, con):
    """r10-judge soundness pin: the driver's value hash compares cell
    REPRESENTATIONS, where 73 != 73.0 — but Python's 73 == 73.0 is
    True, which let events_hourly_to_daily_rollup stay red for two
    rounds while the local harness passed. assert_exact must fail on
    a column whose values match but whose numeric TYPE differs (the
    DuckDB SUM(BIGINT)→HUGEINT→float64 shape), and still pass when
    the oracle casts back to BIGINT."""
    df = spark.createDataFrame([(73,), (12,)], "n_events bigint")
    with pytest.raises(AssertionError, match="exact diffs"):
        assert_exact(df, con,
                     "SELECT 73.0 AS n_events UNION ALL "
                     "SELECT 12.0 AS n_events", "intfloat")
    assert_exact(df, con,
                 "SELECT CAST(73 AS BIGINT) AS n_events UNION ALL "
                 "SELECT CAST(12 AS BIGINT) AS n_events", "intint")


def test_bpe_oracle_every_round_has_a_winner(con):
    """r10-ADVICE pin: _bpe_oracle_ctes unrolls 8 merge rounds; if the
    corpus exhausted mergeable pairs before round 8, an empty t{r}
    would CROSS-JOIN-empty every later round and the oracle would
    silently lose the whole vocabulary instead of carrying it
    forward. Pin that the verification corpus feeds all 8 rounds —
    each t{r} must hold exactly its one winning pair (and, same
    contract for the encode face, v8 must be non-empty)."""
    from flink_1_11_2_with_comments_spark.queries.pipeline_ops import (
        _bpe_oracle_ctes)
    counts = con.execute(
        _bpe_oracle_ctes(8) + "\n    "
        + "\n    UNION ALL ".join(
            f"SELECT {r} AS r, COUNT(*) AS n FROM t{r}"
            for r in range(1, 9))
        + "\n    UNION ALL SELECT 9 AS r, COUNT(*) AS n FROM v8"
    ).fetchall()
    got = dict(counts)
    assert all(got[r] == 1 for r in range(1, 9)), got
    assert got[9] > 0


def test_rotation_window_shape():
    """The driver checks exactly the first 50 registry entries, so the
    rotation list must be 50 unique registered names and all_specs()
    must serve them first, in order — a silent size drift would let a
    new query shadow a canary out of the gate window unnoticed."""
    from flink_1_11_2_with_comments_spark.queries import _PRIORITY
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    assert list(SPECS)[:50] == list(_PRIORITY)
