"""Scalar function coverage — SURVEY §2.8.

One query per function family, exercising the Flink built-in surface
(BuiltInFunctionDefinitions.java / FlinkSqlOperatorTable.java) through
Spark equivalents + the gap-fillers in functions/scalar.py. DuckDB
oracles re-express the same semantics independently (different
function names where the engines diverge — noted inline).

Transcendental results are rounded to 9-10 digits: Java's StrictMath
and C libm may differ in the final ulp; everything else is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .. import functions as _fns  # noqa: F401  (package import for docs)
from ..functions.scalar import (from_base64, is_alpha, is_decimal, is_digit,
                                split_index, temporal_overlaps, to_base64)
from ._util import t


@register(
    "fn_string_basics",
    """
    SELECT c_custkey,
           length(c_name) AS name_len,
           upper(c_name) AS uname, lower(c_name) AS lname,
           substring(c_name, 1, 8) AS name8,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           repeat('ab', 3) AS rep,
           reverse(c_mktsegment) AS rseg,
           left(c_mktsegment, 4) AS seg_l, right(c_mktsegment, 4) AS seg_r,
           replace(c_name, 'Customer', 'Cust') AS repl,
           concat_ws('|', c_name, c_mktsegment) AS joined,
           strpos(c_name, '#') AS hash_pos,
           ascii(c_mktsegment) AS first_code,
           chr(65 + CAST(c_custkey % 26 AS INT)) AS letter,
           concat(upper(substring(lower(c_mktsegment),1,1)), substring(lower(c_mktsegment),2)) AS icap
    FROM customer WHERE c_custkey <= 200
    """,
    doc="String family: CHAR_LENGTH UPPER LOWER SUBSTRING TRIM LPAD REPEAT "
        "REVERSE LEFT RIGHT REPLACE CONCAT_WS POSITION ASCII CHR INIT_CAP — "
        "BuiltInFunctionDefinitions string block; SqlFunctionUtils.java:64.",
)
def fn_string_basics(spark, sf_dir):
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.length("c_name").cast("bigint").alias("name_len"),
        F.upper("c_name").alias("uname"),
        F.lower("c_name").alias("lname"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.reverse("c_mktsegment").alias("rseg"),
        F.substring("c_mktsegment", 1, 4).alias("seg_l"),
        F.expr("right(c_mktsegment, 4)").alias("seg_r"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("repl"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.locate("#", F.col("c_name")).cast("bigint").alias("hash_pos"),
        F.ascii("c_mktsegment").cast("int").alias("first_code"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26).cast("int")).alias("letter"),
        F.initcap(F.lower("c_mktsegment")).alias("icap"))


@register(
    "fn_string_regex_split",
    """
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_replace(text, '\\s+', '_', 'g') AS no_space,
           regexp_matches(text, 'spark') AS has_spark,
           list_extract(string_split(text, ' '), 3) AS third_token,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents WHERE doc_id < 50
    """,
    doc="REGEXP_EXTRACT / REGEXP_REPLACE / REGEXP (rlike) / SPLIT_INDEX "
        "(functions.scalar.split_index, 0-based) — SqlFunctionUtils regexp "
        "block. DuckDB list_extract is 1-based; split_index(.., 2) = 3rd.",
)
def fn_string_regex_split(spark, sf_dir):
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", r"\s+", "_").alias("no_space"),
        F.col("text").rlike("spark").alias("has_spark"),
        split_index("text", " ", 2).alias("third_token"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"))


@register(
    "fn_string_predicates_base64",
    """
    SELECT v,
           CASE WHEN regexp_matches(v, '^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)([eE][+-]?[0-9]+)?$')
                THEN true ELSE false END AS is_dec,
           CASE WHEN regexp_matches(v, '^[0-9]+$') THEN true ELSE false END AS is_dig,
           CASE WHEN regexp_matches(v, '^[A-Za-z]+$') THEN true ELSE false END AS is_alp,
           base64(encode(v)) AS b64,
           CAST(from_base64(base64(encode(v))) AS VARCHAR) AS roundtrip
    FROM (VALUES ('123'), ('12.5e3'), ('abc'), ('a1b2'), ('-0.5'), ('')) s(v)
    """,
    doc="IS_DECIMAL / IS_DIGIT / IS_ALPHA / TO_BASE64 / FROM_BASE64 — "
        "FlinkSqlOperatorTable custom block; functions/scalar.py gap-fillers.",
)
def fn_string_predicates_base64(spark, sf_dir):
    rows = [("123",), ("12.5e3",), ("abc",), ("a1b2",), ("-0.5",), ("",)]
    df = spark.createDataFrame(rows, "v string")
    return df.select(
        "v",
        is_decimal("v").alias("is_dec"),
        is_digit("v").alias("is_dig"),
        is_alpha("v").alias("is_alp"),
        to_base64("v").alias("b64"),
        from_base64(to_base64("v")).alias("roundtrip"))


@register(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25.0) AS a,
           CAST(ceil(l_discount * 100) AS BIGINT) AS c,
           CAST(floor(l_tax * 100) AS BIGINT) AS f,
           round(l_extendedprice / 1000, 2) AS r,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sg,
           mod(CAST(l_quantity AS BIGINT), 7) AS m,
           round(power(l_quantity, 2), 6) AS p2,
           round(sqrt(l_extendedprice), 9) AS sq,
           round(exp(l_discount), 10) AS ex,
           round(ln(l_extendedprice), 10) AS lg,
           round(log10(l_extendedprice), 10) AS l10,
           round(log2(l_quantity), 10) AS l2,
           round(sin(l_discount), 10) AS sn,
           round(cos(l_discount), 10) AS cs,
           round(atan2(l_quantity, 10.0), 10) AS at2,
           round(degrees(l_discount), 10) AS dg,
           round(radians(l_quantity), 10) AS rd,
           round(pi(), 10) AS pie,
           floor(l_extendedprice * 0.001 * 10) / 10 AS tr
    FROM lineitem WHERE l_orderkey <= 300
    """,
    doc="Math family: ABS CEIL FLOOR ROUND SIGN MOD POWER SQRT EXP LN LOG10 "
        "LOG2 SIN COS ATAN2 DEGREES RADIANS PI TRUNCATE — "
        "BuiltInFunctionDefinitions.java:~380-560. ceil/floor/sign output "
        "TYPES differ across engines (Spark ceil→LONG, DuckDB ceil on "
        "DOUBLE→DOUBLE; Spark signum→DOUBLE, DuckDB sign→int); both sides "
        "are cast to a common type so the value-hash compares like for like.",
)
def fn_math(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 300)
    q, d, ep, tx = (F.col("l_quantity"), F.col("l_discount"),
                    F.col("l_extendedprice"), F.col("l_tax"))
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(q - 25.0).alias("a"),
        F.ceil(d * 100).cast("bigint").alias("c"),
        F.floor(tx * 100).cast("bigint").alias("f"),
        F.round(ep / 1000, 2).alias("r"),
        F.signum(q - 25.0).cast("double").alias("sg"),
        (q.cast("bigint") % 7).alias("m"),
        F.round(F.pow(q, 2), 6).alias("p2"),
        F.round(F.sqrt(ep), 9).alias("sq"),
        F.round(F.exp(d), 10).alias("ex"),
        F.round(F.log(ep), 10).alias("lg"),
        F.round(F.log10(ep), 10).alias("l10"),
        F.round(F.log2(q), 10).alias("l2"),
        F.round(F.sin(d), 10).alias("sn"),
        F.round(F.cos(d), 10).alias("cs"),
        F.round(F.atan2(q, F.lit(10.0)), 10).alias("at2"),
        F.round(F.degrees(d), 10).alias("dg"),
        F.round(F.radians(q), 10).alias("rd"),
        F.round(F.lit(3.141592653589793), 10).alias("pie"),
        (F.floor(ep * 0.001 * 10) / 10).alias("tr"))


@register(
    "fn_temporal",
    """
    SELECT event_id,
           CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS mo,
           CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
           CAST(minute(ts) AS INT) AS mi,
           CAST(floor(second(ts)) AS INT) AS s,
           CAST(quarter(ts) AS INT) AS q,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(weekofyear(ts) AS INT) AS woy,
           date_trunc('month', ts) AS ts_month,
           date_trunc('hour', ts) AS ts_hour,
           strftime(ts, '%Y-%m-%d %H:%M') AS formatted,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS unix_s,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS just_date,
           ts + INTERVAL 90 MINUTE AS plus90m,
           CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS days_since
    FROM events WHERE event_id < 200
    """,
    doc="Temporal family: EXTRACT/YEAR/…/SECOND QUARTER DAYOFYEAR DAYOFWEEK "
        "WEEK FLOOR(ts TO unit)=date_trunc DATE_FORMAT UNIX_TIMESTAMP TO_DATE "
        "TIMESTAMPADD TIMESTAMPDIFF — SqlDateTimeUtils.java:66. DuckDB "
        "dayofweek is 0-based (Sunday=0), Spark 1-based → +1 in oracle.",
)
def fn_temporal(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.year("ts").alias("y"), F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"), F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"), F.second("ts").alias("s"),
        F.quarter("ts").alias("q"),
        F.dayofyear("ts").alias("doy"),
        F.dayofweek("ts").alias("dow"),
        F.weekofyear("ts").alias("woy"),
        F.date_trunc("month", "ts").alias("ts_month"),
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("formatted"),
        F.unix_timestamp("ts").alias("unix_s"),
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("just_date"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("plus90m"),
        F.expr("timestampdiff(DAY, timestamp'2024-01-01', ts)")
        .cast("bigint").alias("days_since"))


@register(
    "fn_hash",
    """
    SELECT c_custkey,
           md5(c_name) AS h_md5,
           sha256(c_name) AS h_sha256
    FROM customer WHERE c_custkey <= 100
    """,
    doc="Hash family: MD5 SHA256 (SHA1/SHA384/SHA512/SHA2 available in Spark "
        "via sha1/sha2; DuckDB lacks them, so the oracle covers md5+sha256) — "
        "BuiltInFunctionDefinitions.java:~700-760.",
)
def fn_hash(spark, sf_dir):
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2("c_name", 256).alias("h_sha256"))


@register(
    "fn_json",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CASE WHEN json_extract_string(props, '$.missing') IS NULL
                THEN 'absent' ELSE 'present' END AS missing_check
    FROM events WHERE event_id < 100
    """,
    doc="JSON access: get_json_object ≈ Flink's JSON_VALUE/STR_TO_MAP usage "
        "over the events.props column.",
)
def fn_json(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("event_id") < 100)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
        F.when(F.get_json_object("props", "$.missing").isNull(), "absent")
        .otherwise("present").alias("missing_check"))


@register(
    "fn_collections",
    """
    SELECT id,
           array_to_string([id, id * 2, id * 3], ',') AS arr,
           len([id, id * 2, id * 3]) AS card,
           list_extract([id, id * 2, id * 3], 2) AS second_elem,
           list_contains([id, id * 2, id * 3], 6) AS has6,
           array_to_string(list_sort([id * 3, id, id * 2]), ',') AS sorted_arr,
           array_to_string([id, id * 2, id * 3][2:3], ',') AS sliced,
           map_extract(MAP(['a','b'], [id, id*10]), 'b')[1] AS mval,
           array_to_string(
             CAST(list_sort(map_keys(MAP(['a','b'], [id, id*10]))) AS VARCHAR[]),
             ',') AS mkeys,
           struct_extract({'x': id, 'y': 'v'}, 'x') AS sx
    FROM (VALUES (1), (2), (3)) v(id)
    """,
    doc="Collection constructors & access: ARRAY MAP ROW CARDINALITY "
        "ELEMENT/AT FLATTEN GET — BuiltInFunctionDefinitions.java:~640-700. "
        "Spark element_at/slice/map; DuckDB list_* equivalents in oracle. "
        "Array-typed outputs are joined to canonical strings so the driver's "
        "canonicalizer can hash the cells (list cells are unhashable).",
)
def fn_collections(spark, sf_dir):
    df = spark.createDataFrame([(1,), (2,), (3,)], "id int")
    arr = F.array(F.col("id"), F.col("id") * 2, F.col("id") * 3)
    m = F.create_map(F.lit("a"), F.col("id"), F.lit("b"), F.col("id") * 10)
    return df.select(
        "id",
        F.array_join(arr.cast("array<string>"), ",").alias("arr"),
        F.size(arr).cast("bigint").alias("card"),
        F.element_at(arr, 2).alias("second_elem"),
        F.array_contains(arr, 6).alias("has6"),
        F.array_join(
            F.sort_array(F.array(F.col("id") * 3, F.col("id"),
                                 F.col("id") * 2)).cast("array<string>"),
            ",").alias("sorted_arr"),
        F.array_join(F.slice(arr, 2, 2).cast("array<string>"), ",")
        .alias("sliced"),
        F.element_at(m, "b").alias("mval"),
        F.array_join(F.sort_array(F.map_keys(m)).cast("array<string>"), ",")
        .alias("mkeys"),
        F.struct(F.col("id").alias("x"), F.lit("v").alias("y"))["x"].alias("sx"))


@register(
    "fn_conditional",
    """
    SELECT o_orderkey,
           IF(o_totalprice > 30000.0, 'big', 'small') AS sz,
           NULLIF(o_orderstatus, 'P') AS st,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'fallback') AS co,
           IFNULL(NULLIF(o_orderstatus, 'F'), 'was_f') AS inu,
           GREATEST(o_totalprice, 20000.0) AS hi,
           LEAST(o_totalprice, 20000.0) AS lo,
           TRY_CAST(o_orderpriority AS DOUBLE) AS bad_cast,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num
    FROM orders WHERE o_orderkey <= 500
    """,
    doc="Conditional/type family: IF CASE COALESCE NULLIF IFNULL GREATEST "
        "LEAST + TRY_CAST-style null-on-failure casting (Flink CAST throws; "
        "TRY_CAST documents the gap) — BuiltInFunctionDefinitions logic block.",
)
def fn_conditional(spark, sf_dir):
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 30000.0, "big").otherwise("small").alias("sz"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("st"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")),
                   F.lit("fallback")).alias("co"),
        F.ifnull(F.nullif(F.col("o_orderstatus"), F.lit("F")),
                 F.lit("was_f")).alias("inu"),
        F.greatest(F.col("o_totalprice"), F.lit(20000.0)).alias("hi"),
        F.least(F.col("o_totalprice"), F.lit(20000.0)).alias("lo"),
        F.expr("try_cast(o_orderpriority AS DOUBLE)").alias("bad_cast"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias("prio_num"))


@register(
    "fn_temporal_overlaps",
    """
    SELECT a.event_id AS a_id, b.event_id AS b_id
    FROM (SELECT event_id, ts, ts + INTERVAL 30 MINUTE AS te
          FROM events WHERE user_id = 1) a
    JOIN (SELECT event_id, ts, ts + INTERVAL 30 MINUTE AS te
          FROM events WHERE user_id = 2) b
      ON a.ts <= b.te AND b.ts <= a.te AND a.event_id <> b.event_id
    """,
    doc="TEMPORAL_OVERLAPS: interval-overlap predicate join "
        "(functions.scalar.temporal_overlaps) — the batch shape of the "
        "interval join (SURVEY §2.3).",
)
def fn_temporal_overlaps(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    a = (e.where(F.col("user_id") == 1)
         .select(F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"),
                 (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("a_te")))
    b = (e.where(F.col("user_id") == 2)
         .select(F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts"),
                 (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("b_te")))
    return (a.join(b, temporal_overlaps(F.col("a_ts"), F.col("a_te"),
                                        F.col("b_ts"), F.col("b_te"))
                   & (F.col("a_id") != F.col("b_id")))
            .select("a_id", "b_id"))


@register(
    "fn_sql_udf_surface",
    """
    SELECT v,
           list_extract(string_split(v, '-'), 2) AS second_part,
           CASE WHEN regexp_matches(v, '^[0-9]+$') THEN true ELSE false END
             AS all_digits
    FROM (VALUES ('a-b-c'), ('1-2'), ('42')) s(v)
    """,
    doc="Flink SQL surface via SQL UDFs: SPLIT_INDEX/IS_DIGIT registered with "
        "CREATE TEMPORARY FUNCTION (functions.scalar.register_sql_functions) "
        "and called from spark.sql — Catalyst inlines them (no UDF overhead).",
)
def fn_sql_udf_surface(spark, sf_dir):
    from ..functions.scalar import register_sql_functions
    register_sql_functions(spark)
    df = spark.createDataFrame([("a-b-c",), ("1-2",), ("42",)], "v string")
    df.createOrReplaceTempView("_sql_udf_vals")
    return spark.sql("""
        SELECT v, SPLIT_INDEX(v, '-', 1) AS second_part,
               IS_DIGIT(v) AS all_digits
        FROM _sql_udf_vals
    """)


@register(
    "fn_string_extras",
    """
    SELECT v,
           bin(CAST(n AS BIGINT)) AS as_bin,
           hex(CAST(n AS BIGINT)) AS as_hex,
           substring(v, 1, 2) || 'XY' || substring(v, 5) AS overlaid,
           regexp_extract(url, '://([^/:?#]+)', 1) AS url_host,
           regexp_extract(url, '[?]([^#]*)', 1) AS url_query,
           array_to_string(
             list_sort(list_transform(string_split(kv, ','),
               p -> string_split(p, '=')[1] || ':' || string_split(p, '=')[2])),
             '|') AS map_entries
    FROM (VALUES ('abcdef', 5, 'http://h.com:8080/p?q=1#f', 'a=1,b=2'),
                 ('zzzzzz', 255, 'https://x.org/a/b?k=v&m=n#top', 'x=9,y=8,z=7'))
      s(v, n, url, kv)
    """,
    doc="Remaining string built-ins: BIN HEX OVERLAY PARSE_URL STR_TO_MAP — "
        "FlinkSqlOperatorTable custom block / SqlFunctionUtils.java. "
        "STR_TO_MAP compared as sorted entries (map ordering is undefined "
        "in both engines); PARSE_URL replayed via regex in the oracle.",
)
def fn_string_extras(spark, sf_dir):
    rows = [("abcdef", 5, "http://h.com:8080/p?q=1#f", "a=1,b=2"),
            ("zzzzzz", 255, "https://x.org/a/b?k=v&m=n#top", "x=9,y=8,z=7")]
    df = spark.createDataFrame(rows, "v string, n int, url string, kv string")
    m = F.str_to_map("kv", F.lit(","), F.lit("="))
    entries = F.transform(
        F.sort_array(F.map_keys(m)),
        lambda k: F.concat_ws(":", k, F.element_at(m, k)))
    return df.select(
        "v",
        F.bin(F.col("n").cast("bigint")).alias("as_bin"),
        F.hex(F.col("n").cast("bigint")).alias("as_hex"),
        F.expr("overlay(v PLACING 'XY' FROM 3 FOR 2)").alias("overlaid"),
        F.parse_url("url", F.lit("HOST")).alias("url_host"),
        F.parse_url("url", F.lit("QUERY")).alias("url_query"),
        F.array_join(entries, "|").alias("map_entries"))


@register(
    "fn_cast_semantics",
    """
    SELECT doc_id,
           TRY_CAST(substr(text, 1, 2) AS INTEGER) AS try_int,
           TRY_CAST(CAST(doc_id AS VARCHAR) AS INTEGER) AS ok_int,
           CAST(CAST(doc_id AS DOUBLE) AS BIGINT) AS narrow_back,
           CAST(doc_id % 2 = 0 AS VARCHAR) AS bool_str
    FROM documents WHERE doc_id <= 500
    """,
    doc="CAST semantics matrix: TRY_CAST null-on-failure (Flink 1.11 "
        "CAST throws — SURVEY §2.8 'Type' note; Spark try_cast is the "
        "documented match for the lenient path), round-trip numeric "
        "narrowing, boolean→string. ANSI throw-on-bad-cast is the "
        "session default on both engines.",
)
def fn_cast_semantics(spark, sf_dir):
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") <= 500)
    return d.select(
        "doc_id",
        F.expr("try_cast(substring(text, 1, 2) AS int)").alias("try_int"),
        F.expr("try_cast(CAST(doc_id AS string) AS int)").alias("ok_int"),
        F.col("doc_id").cast("double").cast("bigint").alias("narrow_back"),
        (F.col("doc_id") % 2 == 0).cast("string").alias("bool_str"))


@register(
    "fn_time_type",
    """
    SELECT event_id,
           (EXTRACT(hour FROM ts) * 3600000
            + EXTRACT(minute FROM ts) * 60000
            + CAST(floor(EXTRACT(second FROM ts)) AS BIGINT) * 1000
            + CAST(EXTRACT(millisecond FROM ts) AS BIGINT) % 1000)
             AS time_of_day_ms,
           EXTRACT(hour FROM ts) AS h,
           EXTRACT(minute FROM ts) AS m
    FROM events WHERE event_id <= 500
    """,
    doc="TIME type mapping (SURVEY §1.2: Flink TIME(p) has no Spark "
        "type → millis-of-day BIGINT): extract the time-of-day from a "
        "timestamp as the canonical encoding, plus HOUR/MINUTE "
        "accessors (SqlDateTimeUtils.java:66 internalToTime analogue).",
)
def fn_time_type(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    return e.select(
        "event_id",
        (F.hour("ts").cast("bigint") * 3600000
         + F.minute("ts").cast("bigint") * 60000
         + F.second("ts").cast("bigint") * 1000
         # unix_micros rejects TIMESTAMP_NTZ; cast through TIMESTAMP
         # (session TZ is UTC, so the instant is unchanged)
         + (F.unix_micros(F.col("ts").cast("timestamp")) / 1000 % 1000)
         .cast("bigint"))
        .alias("time_of_day_ms"),
        F.hour("ts").cast("bigint").alias("h"),
        F.minute("ts").cast("bigint").alias("m"))


@register(
    "fn_percentiles",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_cont,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_cont,
           quantile_disc(o_totalprice, 0.25) AS q1_disc,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact percentiles: PERCENTILE_CONT (linear interpolation) and "
        "PERCENTILE_DISC — Calcite std aggregates available through "
        "FlinkSqlOperatorTable. Rounded to 4 digits: the two engines "
        "interpolate with differently-associated fp expressions.",
)
def fn_percentiles(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.round(F.expr("percentile(o_totalprice, 0.5)"), 4)
                 .alias("median_cont"),
                 F.round(F.expr("percentile(o_totalprice, 0.9)"), 4)
                 .alias("p90_cont"),
                 F.expr("percentile_disc(0.25) WITHIN GROUP "
                        "(ORDER BY o_totalprice)").alias("q1_disc"),
                 F.count("*").alias("n")))


@register(
    "fn_higher_order",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      WHERE doc_id <= 300
    )
    SELECT doc_id,
           list_transform(ts, t -> upper(t))[1] AS first_upper,
           len(list_filter(ts, t -> length(t) > 3)) AS n_long,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(ts, t -> CAST(length(t) AS BIGINT))),
                       (a, x) -> a + x) AS total_chars,
           CASE WHEN len(list_filter(ts, t -> t = 'the')) > 0
                THEN true ELSE false END AS has_the,
           CASE WHEN len(list_filter(ts, t -> length(t) = 0)) = 0
                THEN true ELSE false END AS all_nonempty
    FROM toks
    """,
    doc="Higher-order collection functions over ARRAY values: "
        "TRANSFORM / FILTER / AGGREGATE(fold) / EXISTS / FORALL — the "
        "collection-function block (BuiltInFunctionDefinitions "
        "collection section; Flink exposes these via the Table "
        "expression DSL). All JVM-side lambdas, zero Python.",
)
def fn_higher_order(spark, sf_dir):
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") <= 300)
    ts = F.split("text", " ")
    return d.select(
        "doc_id",
        F.transform(ts, lambda x: F.upper(x))[0].alias("first_upper"),
        F.size(F.filter(ts, lambda x: F.length(x) > 3)).cast("bigint")
        .alias("n_long"),
        F.aggregate(ts, F.lit(0).cast("bigint"),
                    lambda a, x: a + F.length(x)).alias("total_chars"),
        F.exists(ts, lambda x: x == F.lit("the")).alias("has_the"),
        F.forall(ts, lambda x: F.length(x) > 0).alias("all_nonempty"))


@register(
    "fn_string_position",
    """
    SELECT c_custkey,
           strpos(c_name, '0') AS instr_pos,
           strpos(substring(c_name, 4), '0') AS locate_from,
           CASE WHEN regexp_matches(c_mktsegment, '^(BUILD|AUTO).*')
                THEN true ELSE false END AS similar_m,
           CASE WHEN c_mktsegment LIKE 'B%' THEN true ELSE false END
             AS like_m
    FROM customer WHERE c_custkey <= 300
    """,
    doc="INSTR / LOCATE(substr, str, from) / SIMILAR TO (→ rlike) / "
        "LIKE — the position-and-pattern block "
        "(FlinkSqlOperatorTable std + custom; SqlFunctionUtils).",
)
def fn_string_position(spark, sf_dir):
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.instr("c_name", "0").cast("bigint").alias("instr_pos"),
        F.locate("0", F.substring("c_name", 4, 100000)).cast("bigint")
        .alias("locate_from"),
        F.col("c_mktsegment").rlike("^(BUILD|AUTO).*").alias("similar_m"),
        F.col("c_mktsegment").like("B%").alias("like_m"))


@register(
    "fn_stats_bivariate",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_discount), 6) AS corr_qd,
           ROUND(covar_pop(l_quantity, l_discount), 6) AS covp_qd,
           ROUND(covar_samp(l_quantity, l_discount), 6) AS covs_qd,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Bivariate statistical aggregates CORR / COVAR_POP / "
        "COVAR_SAMP — the co-moment half of the Calcite std aggregate "
        "family (the univariate half is agg_stats' STDDEV/VAR block). "
        "Computed over (l_quantity, l_discount): both are small-"
        "magnitude, so the single-pass co-moment accumulation that "
        "differs in partial order between engines agrees far past the "
        "6dp rounding (price-scale pairs would need the DECIMAL "
        "co-moment formula instead — documented tradeoff).",
)
def fn_stats_bivariate(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.corr("l_quantity", "l_discount"), 6)
                 .alias("corr_qd"),
                 F.round(F.covar_pop("l_quantity", "l_discount"), 6)
                 .alias("covp_qd"),
                 F.round(F.covar_samp("l_quantity", "l_discount"), 6)
                 .alias("covs_qd"),
                 F.count("*").alias("n")))
