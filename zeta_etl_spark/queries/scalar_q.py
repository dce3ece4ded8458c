"""Scalar-function coverage queries (SURVEY.md §2.8): date/time, string,
math, JSON extraction, array/posexplode families — each query exercises one
function family end-to-end with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zeta_etl_spark.queries.registry import T, query

# --- date_functions ---------------------------------------------------------
# date_trunc/to_date/hour/unix_timestamp/interval arithmetic/date_sub
# (§2.8 date family; zetadex-transactions-helius-pipeline.py:235,356-357,
# 846,1903, zetadex-mm-uptime-pipeline-v3.sql:13,23).

_DATE_ORACLE = """
SELECT o_orderkey,
  CAST(o_orderdate AS DATE) AS order_date,
  strftime(o_orderdate, '%Y-%m') AS order_ym,
  CAST(date_part('year', o_orderdate) AS BIGINT) AS order_year,
  CAST(date_part('month', o_orderdate) AS BIGINT) AS order_month,
  CAST(date_part('dow', o_orderdate) AS BIGINT) AS order_dow_sun0,
  date_trunc('week', o_orderdate) AS week_start,
  o_orderdate + INTERVAL 30 DAY AS ship_by,
  o_orderdate - INTERVAL 90 DAY AS cutoff,
  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
    AS epoch_seconds,
  date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
    AS days_since_1995
FROM orders
WHERE o_orderkey < 500
"""


@query("date_functions", oracle=_DATE_ORACLE, tags=("scalar", "date"))
def date_functions(spark, sf_dir):
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        # Spark dayofweek: Sunday=1; DuckDB dow: Sunday=0
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("order_dow_sun0"),
        F.date_trunc("week", F.col("o_orderdate")).alias("week_start"),
        (F.col("o_orderdate") + F.expr("interval 30 days")).alias("ship_by"),
        (F.col("o_orderdate") - F.expr("interval 90 days")).alias("cutoff"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
        .cast("bigint")
        .alias("epoch_seconds"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
        )
        .cast("bigint")
        .alias("days_since_1995"),
    )


# --- string_functions -------------------------------------------------------
# upper/lower/split/concat_ws/substring/lpad/replace/like/length/regexp
# (§2.8 string family).

_STRING_ORACLE = r"""
SELECT c_custkey,
  upper(c_name) AS name_upper,
  lower(c_mktsegment) AS segment_lower,
  string_split(c_name, '#')[1] AS name_prefix,
  concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
  substr(c_name, 1, 8) AS name_head,
  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
  replace(c_mktsegment, 'A', '@') AS seg_replaced,
  CAST(length(c_name) AS BIGINT) AS name_len,
  CAST(CASE WHEN c_mktsegment LIKE '%ING%' THEN 1 ELSE 0 END AS BIGINT)
    AS is_ing_segment,
  CAST(CASE WHEN regexp_matches(c_name, '[0-9]+$') THEN 1 ELSE 0 END AS BIGINT)
    AS ends_numeric,
  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
  printf('%s-%d', c_mktsegment, c_custkey) AS formatted
FROM customer
"""


@query("string_functions", oracle=_STRING_ORACLE, tags=("scalar", "string", "P7"))
def string_functions(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.substring("c_name", 1, 8).alias("name_head"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_replace("c_mktsegment", "A", "@").alias("seg_replaced"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.when(F.col("c_mktsegment").like("%ING%"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_ing_segment"),
        F.when(F.col("c_name").rlike("[0-9]+$"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("ends_numeric"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.format_string("%s-%d", F.col("c_mktsegment"), F.col("c_custkey")).alias(
            "formatted"
        ),
    )


# --- math_functions ---------------------------------------------------------
# abs/power/sqrt/least/greatest/floor/ceil/sign/pmod (§2.8 math family).

_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
  abs(l_discount - l_tax) AS abs_diff,
  power(1.0 + l_discount, 2) AS disc_sq,
  sqrt(l_quantity) AS qty_sqrt,
  least(l_discount, l_tax) AS min_rate,
  greatest(l_discount, l_tax) AS max_rate,
  CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_bucket,
  CAST(ceil(l_quantity / 10.0) AS BIGINT) AS qty_decile,
  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
  CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
FROM lineitem
WHERE l_orderkey < 1000
"""


@query("math_functions", oracle=_MATH_ORACLE, tags=("scalar", "math"))
def math_functions(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("abs_diff"),
        F.pow(F.lit(1.0) + F.col("l_discount"), 2).alias("disc_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.floor(F.col("l_extendedprice") / 1000.0).cast("bigint").alias(
            "price_bucket"
        ),
        F.ceil(F.col("l_quantity") / 10.0).cast("bigint").alias("qty_decile"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
    )


# --- json_extract_props: schema-directed JSON scalar access -----------------
# The reference parses JSON at the scan (S1/S2) into map<string,string> and
# casts at use-site (§1.2); events.props mirrors that: a JSON payload whose
# values get implicit numeric casts.

_JSON_ORACLE = """
SELECT event_id, event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
  CAST(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
       THEN 1 ELSE 0 END AS BIGINT) AS k_even,
  CAST(json_extract_string(props, '$.k') AS DOUBLE) / 100.0 AS k_scaled
FROM events
WHERE event_id < 2000
"""


@query("json_extract_props", oracle=_JSON_ORACLE, tags=("scalar", "json", "map"))
def json_extract_props(spark, sf_dir):
    ev = T(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        "event_type",
        k.cast("bigint").alias("k_value"),
        F.when(k.cast("bigint") % 2 == 0, 1).otherwise(0).cast("bigint").alias(
            "k_even"
        ),
        (k.cast("double") / 100.0).alias("k_scaled"),
    )


# --- posexplode_tokens: array explode with position (§2.8 array family) -----

_POSEXPLODE_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE doc_id < 20)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[CAST(i AS INT)] AS token
FROM t CROSS JOIN range(1, 10000) r(i)
WHERE i <= len(toks)
"""


@query("posexplode_tokens", oracle=_POSEXPLODE_ORACLE, tags=("scalar", "array"))
def posexplode_tokens(spark, sf_dir):
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")


# --- map_payload_access: map construction + subscript + implicit cast -------
# map<string,string> payload semantics (§1.2): build the map from JSON, read
# a key with a use-site numeric cast exactly like `event.event.fee/PRICE_FACTOR`
# (zetadex-transactions-helius-pipeline.py:705).

_MAP_ORACLE = """
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS DOUBLE) / 1000000.0 AS fee_scaled,
  CAST(CASE WHEN json_extract_string(props, '$.k') <> '0'
       THEN 1 ELSE 0 END AS BIGINT) AS nonzero_flag
FROM events WHERE event_id < 1000
"""


@query("map_payload_access", oracle=_MAP_ORACLE, tags=("scalar", "map", "cast"))
def map_payload_access(spark, sf_dir):
    ev = T(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    payload = F.from_json("props", "map<string,string>")
    # string map value, cast at use-site (Spark's implicit-cast semantics made
    # explicit so the oracle matches bit-for-bit)
    return ev.select(
        "event_id",
        (payload["k"].cast("double") / 1000000.0).alias("fee_scaled"),
        F.when(payload["k"] != "0", 1).otherwise(0).cast("bigint").alias(
            "nonzero_flag"
        ),
    )


# --- array_hof_functions: array + higher-order-function family sweep --------
# The engine leans on HOFs instead of Python UDFs (§2.10); this query pins
# the full family cross-engine: transform, filter, exists, aggregate,
# zip_with, slice, sort, position, flatten, distinct.

_ARRAY_HOF_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE doc_id < 200
)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_toks,
  array_to_string(list_transform(toks[1:3], x -> upper(x)), ',')
    AS first3_upper,
  CAST(len(list_filter(toks, x -> len(x) > 5)) AS BIGINT) AS n_long,
  CAST(CASE WHEN len(list_filter(toks, x -> x = 'the')) > 0
       THEN 1 ELSE 0 END AS BIGINT) AS has_the,
  CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS total_chars,
  CAST(NULLIF(list_position(toks, 'the'), 0) AS BIGINT) AS first_the_pos,
  array_to_string(list_sort(list_distinct(toks[1:5])), ',')
    AS first5_sorted_distinct
FROM t
"""


@query(
    "array_hof_functions",
    oracle=_ARRAY_HOF_ORACLE,
    tags=("scalar", "array", "hof", "F4"),
)
def array_hof_functions(spark, sf_dir):
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_toks"),
        F.expr(
            "concat_ws(',', transform(slice(split(text, ' '), 1, 3), "
            "x -> upper(x)))"
        ).alias("first3_upper"),
        F.expr("size(filter(split(text, ' '), x -> length(x) > 5))")
        .cast("bigint")
        .alias("n_long"),
        F.expr("case when exists(split(text, ' '), x -> x = 'the') then 1 else 0 end")
        .cast("bigint")
        .alias("has_the"),
        F.expr(
            "aggregate(split(text, ' '), 0L, (acc, x) -> acc + length(x))"
        ).alias("total_chars"),
        # array_position: 0 when absent in Spark; DuckDB list_position gives
        # NULL — normalize with nullif/coalesce to the same convention
        F.expr("nullif(array_position(split(text, ' '), 'the'), 0)")
        .cast("bigint")
        .alias("first_the_pos"),
        F.expr(
            "concat_ws(',', array_sort(array_distinct("
            "slice(split(text, ' '), 1, 5))))"
        ).alias("first5_sorted_distinct"),
    )
