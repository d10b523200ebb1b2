"""Scalar-function battery: string / date / math / conditional surface.

REF-derived scope: the reference's only scalar work is pgtype text
decode (producer.go:176-181) and JSON encode/decode (utils.go:74,98) —
mapped to casts + to_json/from_json/get_json_object. The rest is the
[EXT] function surface oracle queries need. All JVM-side built-ins —
no Python UDFs anywhere (whole-stage codegen keeps these in Tungsten).

Cross-engine notes: only functions with identical semantics in Spark
and DuckDB are used in hash-checked outputs (e.g. instr==strpos both
1-based/0-absent; round() is half-away-from-zero on doubles in both;
transcendentals like exp/ln are libm-dependent and excluded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table


def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_type").cast("long").alias("type_len"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace(F.col("p_name"), "a", "@").alias("name_subst"),
        F.instr(F.col("p_name"), "o").cast("long").alias("first_o_pos"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.lpad(F.col("p_brand"), 12, "_").alias("brand_padded"),
        F.trim(F.col("p_name")).alias("name_trimmed"),
        F.split(F.col("p_name"), " ").getItem(0).alias("name_first_word"),
        F.regexp_extract(F.col("p_type"), "([a-zA-Z]+)", 1).alias("type_first_token"),
        F.size(F.regexp_extract_all(F.col("p_name"), F.lit("[aeiou]+"), 0))
         .cast("long").alias("n_vowel_runs"),
    )


SCALAR_STRING_SQL = """
SELECT p_partkey AS partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       LENGTH(p_type) AS type_len,
       SUBSTR(p_name, 1, 10) AS name_prefix,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       REGEXP_REPLACE(p_name, 'a', '@', 'g') AS name_subst,
       STRPOS(p_name, 'o') AS first_o_pos,
       REVERSE(p_brand) AS brand_rev,
       LPAD(p_brand, 12, '_') AS brand_padded,
       TRIM(p_name) AS name_trimmed,
       STRING_SPLIT(p_name, ' ')[1] AS name_first_word,
       REGEXP_EXTRACT(p_type, '([a-zA-Z]+)', 1) AS type_first_token,
       len(regexp_extract_all(p_name, '[aeiou]+')) AS n_vowel_runs
FROM part
"""


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year(d).cast("long").alias("o_year"),
        F.month(d).cast("long").alias("o_month"),
        F.dayofmonth(d).cast("long").alias("o_day"),
        F.quarter(d).cast("long").alias("o_quarter"),
        F.dayofyear(d).cast("long").alias("o_doy"),
        F.date_trunc("month", d).alias("month_start"),
        (d + F.expr("INTERVAL 1 MONTH")).alias("next_month"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).cast("long").alias("days_to_y2k"),
        # string, not DATE: pandas/Arrow widen DATE to datetime64
        # differently per engine, which breaks value comparison.
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
    )


SCALAR_DATE_SQL = """
SELECT o_orderkey AS orderkey,
       year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       day(o_orderdate) AS o_day,
       quarter(o_orderdate) AS o_quarter,
       dayofyear(o_orderdate) AS o_doy,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 1 MONTH AS next_month,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM orders
"""


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    b = F.col("c_acctbal")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.abs(b).alias("bal_abs"),
        F.ceil(b).alias("bal_ceil"),
        F.floor(b).alias("bal_floor"),
        F.round(b, 1).alias("bal_round1"),
        F.sqrt(F.abs(b)).alias("bal_sqrt"),
        (b * b).alias("bal_sq"),
        F.signum(b).cast("int").alias("bal_sign"),
        (F.col("c_custkey") % 7).alias("key_mod7"),
        F.greatest(b, F.lit(0.0)).alias("bal_clamped"),
        F.least(b, F.lit(1000.0)).alias("bal_capped"),
    )


SCALAR_MATH_SQL = """
SELECT c_custkey AS custkey,
       ABS(c_acctbal) AS bal_abs,
       CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
       CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
       ROUND(c_acctbal, 1) AS bal_round1,
       SQRT(ABS(c_acctbal)) AS bal_sqrt,
       c_acctbal * c_acctbal AS bal_sq,
       CAST(SIGN(c_acctbal) AS INT) AS bal_sign,
       c_custkey % 7 AS key_mod7,
       GREATEST(c_acctbal, 0.0) AS bal_clamped,
       LEAST(c_acctbal, 1000.0) AS bal_capped
FROM customer
"""


def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function surface with scalar outputs (arrays
    themselves aren't hash-compared: engines render them differently).
    Covers construct/size/contains/position/transform/filter/sort/
    distinct/aggregate — the primitives the dedup+similarity operators
    compose."""
    c = table(spark, sf_dir, "customer")
    arr = F.sequence(F.lit(1), (F.col("c_nationkey") % 4 + 2).cast("int"))
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.size(arr).cast("long").alias("arr_len"),
        F.aggregate(arr, F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("arr_sum"),
        F.array_max(arr).cast("long").alias("arr_max"),
        F.array_contains(arr, 3).alias("has_3"),
        F.array_position(arr, 2).cast("long").alias("pos_of_2"),
        F.element_at(F.reverse(F.array_sort(arr)), 1).cast("long").alias("desc_first"),
        F.size(F.array_distinct(F.concat(arr, arr))).cast("long").alias("distinct_len"),
        F.size(F.filter(arr, lambda x: x % 2 == 0)).cast("long").alias("n_even"),
        F.aggregate(F.transform(arr, lambda x: x * x),
                    F.lit(0).cast("long"), lambda a, x: a + x).alias("sum_squares"),
    )


SCALAR_ARRAY_SQL = """
WITH t AS (
  SELECT c_custkey, generate_series(1, c_nationkey % 4 + 2) AS arr
  FROM customer
)
SELECT c_custkey AS custkey,
       len(arr) AS arr_len,
       CAST(list_sum(arr) AS BIGINT) AS arr_sum,
       CAST(list_max(arr) AS BIGINT) AS arr_max,
       list_contains(arr, 3) AS has_3,
       CAST(list_position(arr, 2) AS BIGINT) AS pos_of_2,
       CAST(list_reverse_sort(arr)[1] AS BIGINT) AS desc_first,
       len(list_distinct(list_concat(arr, arr))) AS distinct_len,
       len(list_filter(arr, x -> x % 2 = 0)) AS n_even,
       CAST(list_sum(list_transform(arr, x -> x * x)) AS BIGINT) AS sum_squares
FROM t
"""


def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface with scalar outputs (DuckDB map access
    yields single-element lists, scalarized with [1] in the oracle)."""
    c = table(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("seg"), F.col("c_mktsegment"),
        F.lit("nation"), F.col("c_nationkey").cast("string"))
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.size(m).cast("long").alias("m_size"),
        F.element_at(m, "seg").alias("seg_val"),
        F.element_at(m, "nation").cast("long").alias("nation_val"),
        F.array_contains(F.map_keys(m), "seg").alias("has_seg"),
        F.element_at(F.array_sort(F.map_keys(m)), 1).alias("first_key"),
    )


SCALAR_MAP_SQL = """
WITH t AS (
  SELECT c_custkey,
         map(['seg','nation'], [c_mktsegment, CAST(c_nationkey AS VARCHAR)]) AS m
  FROM customer
)
SELECT c_custkey AS custkey,
       CAST(cardinality(m) AS BIGINT) AS m_size,
       m['seg'][1] AS seg_val,
       CAST(m['nation'][1] AS BIGINT) AS nation_val,
       list_contains(map_keys(m), 'seg') AS has_seg,
       list_sort(map_keys(m))[1] AS first_key
FROM t
"""


def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif — the expression forms the CDC partial
    merge is built from (per-column coalesce; SURVEY.md §4.2)."""
    c = table(spark, sf_dir, "customer")
    b = F.col("c_acctbal")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.when(b < 0, "overdrawn").when(b < 1000, "low")
         .when(b < 5000, "mid").otherwise("high").alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
                   F.lit("(redacted)")).alias("segment_masked"),
        F.when(F.col("c_nationkey") % 2 == 0, b).alias("even_nation_bal"),
    )


SCALAR_COND_SQL = """
SELECT c_custkey AS custkey,
       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
            WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_band,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(redacted)') AS segment_masked,
       CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal END AS even_nation_bal
FROM customer
"""


def scalar_map_transform_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions (transform_keys / transform_values /
    map_zip_with / map_filter / map_from_entries), scalarized so the
    oracle can state each output value directly — DuckDB 1.0 lacks map
    lambdas, and the parity contract is about VALUES, not syntax.

    All lambdas run inside Catalyst (HigherOrderFunction expressions,
    JVM-side) — this is the fast path for per-row map reshaping at scale,
    not a Python UDF.
    """
    c = table(spark, sf_dir, "customer")
    nk = F.col("c_nationkey").cast("long")
    m1 = F.create_map(F.lit("a"), nk, F.lit("b"), nk * 2)
    m2 = F.create_map(F.lit("a"), F.lit(10).cast("long"),
                      F.lit("b"), F.lit(20).cast("long"))
    tk = F.transform_keys(m1, lambda k, v: F.upper(k))
    tv = F.transform_values(m1, lambda k, v: v * 2)
    mz = F.map_zip_with(m1, m2, lambda k, x, y: x + y)
    mf = F.map_filter(m1, lambda k, v: v % 2 == 0)
    me = F.map_from_entries(F.array(
        F.struct(F.lit("seg").alias("k"), F.col("c_mktsegment").alias("v"))))
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.element_at(tk, "A").alias("upper_key_a"),
        F.element_at(tv, "b").alias("doubled_b"),
        F.element_at(mz, "a").alias("zipped_a"),
        F.size(mf).cast("long").alias("n_even_vals"),
        F.element_at(me, "seg").alias("entry_seg"),
    )


SCALAR_MAP_TRANSFORM_SQL = """
SELECT c_custkey AS custkey,
       CAST(c_nationkey AS BIGINT) AS upper_key_a,
       CAST(c_nationkey * 4 AS BIGINT) AS doubled_b,
       CAST(c_nationkey + 10 AS BIGINT) AS zipped_a,
       CAST(CASE WHEN c_nationkey % 2 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_even_vals,
       c_mktsegment AS entry_seg
FROM customer
"""
