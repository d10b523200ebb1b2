"""Product/customer-analytics battery ([EXT] — SURVEY.md §2 Table B
aggregation/window rows): mode aggregates, RFM segmentation, and
statistical outlier detection. All integer-exact or IEEE-deterministic
(sqrt and division are correctly-rounded IEEE ops, so an identical op
sequence yields identical doubles in every engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.operators.common import events_table


def agg_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) of order priority per market segment —
    deterministic tie-break by value asc, so no engine-specific MODE()
    builtin is trusted. Two partial-aggregable passes: count per
    (group, value), then argmax via one window on the counted (tiny)
    intermediate — the shuffle carries one row per distinct pair, never
    raw orders."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderpriority")
    counts = (j.groupBy("c_mktsegment", "o_orderpriority")
               .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("n"), F.asc("o_orderpriority"))
    return (counts.withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") == 1)
                  .select("c_mktsegment",
                          F.col("o_orderpriority").alias("mode_priority"),
                          F.col("n").alias("mode_count")))


AGG_MODE_SQL = """
WITH counts AS (
  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_orderpriority
)
SELECT c_mktsegment, o_orderpriority AS mode_priority, n AS mode_count
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY n DESC, o_orderpriority ASC) AS rk
      FROM counts)
WHERE rk = 1
"""


def customers_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the standard marketing-analytics cut. Each customer scores 1-4 on
    every axis via ntile over the per-customer aggregate; the segment
    id is the 3-digit composite. Monetary is decimal-exact; recency is
    integer days; ties inside ntile break on c_custkey for cross-engine
    determinism.

    Scale: one partial-agg shuffle by customer compacts orders to one
    row each; the ntiles are GLOBAL rankings, so they sort that
    compacted aggregate (fine: |customers| << |orders|; at extreme
    scale you'd swap ntile for approx-percentile bucket edges).
    """
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.min(F.datediff(F.lit("1998-12-01").cast("date"),
                         F.col("o_orderdate").cast("date")))
         .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
         .cast("double").alias("monetary"))
    w_r = Window.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
    w_f = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    w_m = Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))
    scored = per_cust.select(
        F.col("o_custkey").alias("custkey"),
        "recency_days", "frequency", "monetary",
        F.ntile(4).over(w_r).cast("long").alias("r_score"),
        F.ntile(4).over(w_f).cast("long").alias("f_score"),
        F.ntile(4).over(w_m).cast("long").alias("m_score"))
    return scored.withColumn(
        "rfm_segment",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("long"))


CUSTOMERS_RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         MIN(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01'))
           AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey AS custkey, recency_days, frequency, monetary,
       NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_score,
       NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
       NTILE(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_score,
       NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) * 100
       + NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) * 10
       + NTILE(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS rfm_segment
FROM per_cust
"""


def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outlier detection over event values: flag
    events more than 2 sample standard deviations from the user's mean.

    Exactness: mean and variance come from integer sufficient
    statistics (values quantized to 1e-4 fixed point — q^2 sums stay
    far inside int64 for ~1e5 events/user at this value range — exactly
    summed; DuckDB's HUGEINT sum is cast back to BIGINT);
    every subsequent op (int->double conversion of magnitudes < 2^53,
    subtraction, multiplication, division, sqrt) is a correctly-rounded
    IEEE-754 operation, so the SAME op sequence in the oracle yields
    bit-identical z — the emitted z_q6 = floor(z*1e6+0.5) is exact.
    Users with fewer than 3 events or zero variance are skipped.

    Scale: one partial-agg shuffle for the per-user moments (3 counters
    per user), broadcast-join back onto the stream — the event side
    never re-shuffles.
    """
    e = events_table(spark, sf_dir)
    q = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    ev = e.select("event_id", "user_id", "value", q.alias("q"))
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"))
    stats = stats.filter(F.col("n") >= 3)
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    var = ((F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
              / F.col("n").cast("double"))
           / (F.col("n").cast("double") - F.lit(1.0)))
    stats = (stats.select("user_id", mean.alias("mean_q"),
                          F.sqrt(var).alias("std_q"))
                  .filter(F.col("std_q") > 0))
    z = (F.col("q").cast("double") - F.col("mean_q")) / F.col("std_q")
    return (ev.join(F.broadcast(stats), "user_id")
              .withColumn("z_q6",
                          F.floor(z * 1000000 + F.lit(0.5)).cast("long"))
              .filter(F.abs(F.col("z_q6")) > 2000000)
              .select("event_id", "user_id", "value", "z_q6"))


EVENTS_ZSCORE_SQL = """
WITH ev AS (
  SELECT event_id, user_id, value,
         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS q
  FROM events
), stats AS (
  SELECT user_id, COUNT(*) AS n,
         CAST(SUM(q) AS BIGINT) AS s1,
         CAST(SUM(q*q) AS BIGINT) AS s2
  FROM ev GROUP BY user_id
  HAVING COUNT(*) >= 3
), moments AS (
  SELECT user_id,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q,
         sqrt((CAST(s2 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1.0)) AS std_q
  FROM stats
)
SELECT event_id, user_id, value,
       CAST(floor((CAST(q AS DOUBLE) - mean_q) / std_q * 1000000 + 0.5)
            AS BIGINT) AS z_q6
FROM ev JOIN moments USING (user_id)
WHERE moments.std_q > 0
  AND abs(CAST(floor((CAST(q AS DOUBLE) - mean_q) / std_q * 1000000 + 0.5)
               AS BIGINT)) > 2000000
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by the week of their first
    event (cohort), counted as active per (cohort_week, week_offset) —
    the standard product-analytics retention triangle.

    Week index is exact integer math on epoch-micros (ts_us div one
    week), so cohort boundaries can't drift between engines. Scale
    shape: one shuffle by user_id for the min-week window, then one
    map-side-combinable groupBy on (cohort, offset) — no joins, no
    per-user collect."""
    us_week = 7 * 24 * 3600 * 1_000_000
    e = events_table(spark, sf_dir)
    week = F.expr(f"ts_us div {us_week}")
    w = Window.partitionBy("user_id")
    t = e.select("user_id", week.alias("week"),
                 F.min(week).over(w).alias("cohort_week"))
    return (t.groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
             .agg(F.countDistinct("user_id").alias("n_active"),
                  F.count("*").alias("n_events")))


EVENTS_COHORT_SQL = """
WITH t AS (
  SELECT user_id,
         epoch_us(ts) // 604800000000 AS week,
         MIN(epoch_us(ts) // 604800000000) OVER (PARTITION BY user_id) AS cohort_week
  FROM events
)
SELECT cohort_week, week - cohort_week AS week_offset,
       COUNT(DISTINCT user_id) AS n_active,
       COUNT(*) AS n_events
FROM t
GROUP BY 1, 2
"""


def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov counts):
    for every consecutive event pair in a user's timeline, count
    (prev_type -> event_type) and the conditional probability
    P(next | prev) — the session-flow summary product analytics builds
    dashboards from (the streaming twin is a lag over the keyed stream).

    Exactness: ordering is (ts_us, event_id) — a total order, so lag is
    deterministic; the probability is ONE double division of exact
    counts. Scale: one shuffle by user_id for the lag window, then a
    map-side-combinable groupBy on the tiny (prev, next) key space; the
    share window runs on the aggregated frame (|types|^2 rows).
    """
    e = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    t = (e.select("user_id", "event_type", "ts_us", "event_id")
          .withColumn("prev_type", F.lag("event_type").over(w))
          .filter(F.col("prev_type").isNotNull()))
    agg = t.groupBy("prev_type", "event_type").agg(F.count(F.lit(1)).alias("n"))
    wp = Window.partitionBy("prev_type")
    return agg.select(
        "prev_type", "event_type", "n",
        (F.col("n").cast("double")
         / F.sum("n").over(wp).cast("double")).alias("p_next"))


EVENTS_TRANSITIONS_SQL = """
WITH t AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
),
agg AS (
  SELECT prev_type, event_type, COUNT(*) AS n
  FROM t WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, event_type, n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p_next
FROM agg
"""


def events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day weekly active users, and the
    DAU/WAU stickiness ratio — THE product-engagement dashboard metric.

    Sliding COUNT(DISTINCT) is not partial-aggregable with a plain
    window, so WAU uses the standard explode trick: each (user, day)
    activity contributes to the 7 window-ends day..day+6, then one
    distinct aggregate per window end. Exactly 7x row amplification of
    the already-deduplicated (user, day) frame — the scalable shape —
    and every count is exact; the ratio is ONE double division.
    """
    e = events_table(spark, sf_dir)
    us_day = 24 * 3600 * 1_000_000
    ud = (e.select("user_id", F.expr(f"ts_us div {us_day}").alias("day"))
           .distinct())
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    cover = (ud.select("user_id", F.explode(
                 F.sequence(F.col("day"), F.col("day") + 6)).alias("wday"))
               .distinct()
               .groupBy(F.col("wday").alias("day"))
               .agg(F.countDistinct("user_id").alias("wau")))
    return (dau.join(cover, "day")
               .select("day", "dau", "wau",
                       (F.col("dau").cast("double")
                        / F.col("wau").cast("double")).alias("stickiness")))


EVENTS_DAU_STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day),
cover AS (
  SELECT wday AS day, COUNT(DISTINCT user_id) AS wau
  FROM (SELECT user_id, unnest(generate_series(day, day + 6)) AS wday
        FROM ud)
  GROUP BY wday
)
SELECT d.day, d.dau, c.wau,
       CAST(d.dau AS DOUBLE) / CAST(c.wau AS DOUBLE) AS stickiness
FROM dau d JOIN cover c USING (day)
"""


def orders_interpurchase_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer inter-purchase gap statistics (days between
    consecutive orders): repeat-purchase cadence, the lifetime-value
    input next to RFM. Customers with a single order have no gaps and
    are excluded.

    Ordering is (o_orderdate, o_orderkey) — total, so lag is
    deterministic; gaps are exact integer days and the mean is one
    double division. One shuffle by customer for the lag window, then
    a map-side-combinable rollup.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (o.withColumn("prev_date", F.lag("o_orderdate").over(w))
          .filter(F.col("prev_date").isNotNull())
          .select("o_custkey",
                  F.datediff("o_orderdate", "prev_date").cast("long")
                  .alias("gap_days")))
    return (g.groupBy(F.col("o_custkey").alias("custkey"))
             .agg(F.count(F.lit(1)).alias("n_gaps"),
                  F.sum("gap_days").alias("total_gap_days"),
                  F.max("gap_days").alias("max_gap_days"))
             .withColumn("avg_gap_days",
                         F.col("total_gap_days").cast("double")
                         / F.col("n_gaps").cast("double")))


ORDERS_INTERPURCHASE_SQL = """
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   LAG(o_orderdate) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
)
SELECT o_custkey AS custkey,
       COUNT(*) AS n_gaps,
       CAST(SUM(gap_days) AS BIGINT) AS total_gap_days,
       CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
       CAST(SUM(gap_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_gap_days
FROM g
WHERE gap_days IS NOT NULL
GROUP BY o_custkey
"""


def supplier_lead_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier fulfillment lead time (order date -> line ship
    date): the vendor-SLA profile a supply dashboard ranks suppliers
    by — line volume, mean and max lead days, and the share shipped
    within 30 days. One fact-fact equi-join on orderkey (both sides
    huge: the shuffle join is correct here), then a map-side-
    combinable rollup per supplier and a broadcast join to the
    supplier dimension. Lead days are exact integers; mean and share
    are ONE double division each.
    """
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    lead = (l.join(o, l.l_orderkey == o.o_orderkey)
             .select("l_suppkey",
                     F.datediff("l_shipdate", "o_orderdate").cast("long")
                     .alias("lead_days")))
    agg = (lead.groupBy("l_suppkey")
               .agg(F.count(F.lit(1)).alias("n_lines"),
                    F.sum("lead_days").alias("total_lead_days"),
                    F.max("lead_days").alias("max_lead_days"),
                    F.sum((F.col("lead_days") <= 30).cast("long"))
                     .alias("n_fast")))
    return (agg.join(F.broadcast(s), agg.l_suppkey == s.s_suppkey)
               .select(F.col("l_suppkey").alias("suppkey"),
                       F.col("s_nationkey").alias("nationkey"),
                       "n_lines", "max_lead_days",
                       (F.col("total_lead_days").cast("double")
                        / F.col("n_lines").cast("double"))
                       .alias("avg_lead_days"),
                       (F.col("n_fast").cast("double")
                        / F.col("n_lines").cast("double"))
                       .alias("share_within_30d")))


SUPPLIER_LEAD_TIME_SQL = """
WITH lead AS (
  SELECT l_suppkey,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) AS lead_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
agg AS (
  SELECT l_suppkey,
         COUNT(*) AS n_lines,
         CAST(SUM(lead_days) AS BIGINT) AS total_lead_days,
         CAST(MAX(lead_days) AS BIGINT) AS max_lead_days,
         CAST(SUM(CASE WHEN lead_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_fast
  FROM lead GROUP BY l_suppkey
)
SELECT a.l_suppkey AS suppkey, s.s_nationkey AS nationkey,
       a.n_lines, a.max_lead_days,
       CAST(a.total_lead_days AS DOUBLE) / CAST(a.n_lines AS DOUBLE)
         AS avg_lead_days,
       CAST(a.n_fast AS DOUBLE) / CAST(a.n_lines AS DOUBLE)
         AS share_within_30d
FROM agg a JOIN supplier s ON s.s_suppkey = a.l_suppkey
"""


def orders_segment_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately skewed-key join: the whole orders fact table keyed
    by market segment (5 distinct keys, so each key carries ~20% of all
    rows) joined to a 5-row per-segment dim. At test scale Catalyst
    rightly broadcasts the dim; at 100 TB with a too-big-to-broadcast
    dim this exact shape is the classic skew case, and AQE's
    OptimizeSkewedJoin splits the oversized partitions — proven with a
    forced sort-merge plan in tests/test_plans.py::
    test_aqe_splits_skewed_segment_join. All money stays in exact
    integer cents (raw-2dp doubles, dsum rationale in operators/
    common.py)."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment",
                                                "c_acctbal")
    o = table(spark, sf_dir, "orders")
    # The dim is materialized (5 rows) before the join: with the
    # aggregate inlined, the join's dim child is Sort(HashAgg(shuffle))
    # and OptimizeSkewedJoin's pattern — Sort over a plain shuffle stage
    # on BOTH sides — cannot match, so the skewed fact partitions would
    # never split. Materializing is also what a real pipeline does with
    # a dim table (it is read, not recomputed per query).
    seg = (c.groupBy("c_mktsegment")
            .agg(F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
                  .alias("segment_bal_cents"))
            .localCheckpoint(eager=False))
    fact = o.join(c.select("c_custkey", "c_mktsegment"),
                  o.o_custkey == c.c_custkey)
    return (fact.join(seg, "c_mktsegment")
                .groupBy("c_mktsegment", "o_orderpriority",
                         "segment_bal_cents")
                .agg(F.count(F.lit(1)).alias("n_orders"),
                     F.sum(F.round(F.col("o_totalprice") * 100, 0)
                            .cast("long")).alias("revenue_cents"))
                .select(F.col("c_mktsegment").alias("segment"),
                        F.col("o_orderpriority").alias("priority"),
                        "n_orders", "revenue_cents", "segment_bal_cents"))


ORDERS_SEGMENT_SKEW_SQL = """
WITH seg AS (
  SELECT c_mktsegment,
         CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)
           AS segment_bal_cents
  FROM customer GROUP BY c_mktsegment
),
fact AS (
  SELECT o.o_orderpriority, o.o_totalprice, c.c_mktsegment
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT f.c_mktsegment AS segment, f.o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(f.o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       s.segment_bal_cents
FROM fact f JOIN seg s ON f.c_mktsegment = s.c_mktsegment
GROUP BY f.c_mktsegment, f.o_orderpriority, s.segment_bal_cents
"""


def orders_pareto_revenue_share(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """Pareto concentration report: how many customers cover 50/80/90%
    of total revenue (the 80/20 chart of every revenue dashboard).

    Revenue stays exact integer cents; the cumulative sum runs over the
    PER-CUSTOMER rollup (|customers| rows, corpus-size independent), so
    the single-partition ordered window — unavoidable for a global
    cumulative rank — never touches raw orders; the heavy input pass is
    one partial-aggregable groupBy. Share thresholds use the cumsum
    STRICTLY BEFORE each customer (< t), so the count includes exactly
    the customers needed to first reach the threshold — deterministic
    ties by (revenue desc, custkey asc)."""
    o = table(spark, sf_dir, "orders")
    per_cust = (o.groupBy("o_custkey")
                 .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0)
                             .cast("long")).alias("cents")))
    w = (Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
               .rowsBetween(Window.unboundedPreceding, -1))
    total = per_cust.agg(F.sum("cents").alias("total_cents"),
                         F.count(F.lit(1)).alias("n_customers"))
    ranked = per_cust.withColumn(
        "before", F.coalesce(F.sum("cents").over(w), F.lit(0)))
    counts = ranked.crossJoin(F.broadcast(total)).agg(
        *[F.sum((F.col("before") * 100 < F.col("total_cents") * pct)
                .cast("long")).alias(f"n_top_{pct}pct")
          for pct in (50, 80, 90)])
    return (total.crossJoin(F.broadcast(counts))
                 .select("n_customers", "total_cents",
                         "n_top_50pct", "n_top_80pct", "n_top_90pct"))


ORDERS_PARETO_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
t AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS total_cents,
         COUNT(*) AS n_customers
  FROM per_cust
),
ranked AS (
  SELECT cents,
         CAST(COALESCE(SUM(cents) OVER (
             ORDER BY cents DESC, o_custkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS before
  FROM per_cust
)
SELECT t.n_customers, t.total_cents,
       CAST(SUM(CASE WHEN before*100 < total_cents*50 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_top_50pct,
       CAST(SUM(CASE WHEN before*100 < total_cents*80 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_top_80pct,
       CAST(SUM(CASE WHEN before*100 < total_cents*90 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_top_90pct
FROM ranked CROSS JOIN t
GROUP BY t.n_customers, t.total_cents
"""


def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic seasonality profile: event count and distinct-user count
    per (day-of-week, hour-of-day) — the load-shape table behind
    capacity planning and anomaly baselines.

    Day/hour are derived from epoch microseconds with pure integer
    arithmetic (1970-01-01 was a Thursday, hence the +4 offset) — no
    timezone, calendar, or libm surface to diverge across engines; the
    whole query is one partial-aggregable pass with a 168-row output."""
    e = events_table(spark, sf_dir)
    return (e.select(
                F.expr("CAST(((ts_us div 86400000000) + 4) % 7 AS INT)")
                 .alias("dow"),
                F.expr("CAST((ts_us div 3600000000) % 24 AS INT)")
                 .alias("hour"),
                "user_id")
             .groupBy("dow", "hour")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.countDistinct("user_id").alias("n_users")))


EVENTS_SEASONALITY_SQL = """
SELECT CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS INT) AS dow,
       CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS hour,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def orders_monthly_revenue_yoy(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Monthly revenue with year-over-year deltas — the canonical
    finance dashboard query. Revenue stays exact integer cents; the YoY
    comparison is a self-join on (year-1, month) rather than lag(12) so
    missing months cannot silently misalign the comparison.

    Scale: one partial-aggregable rollup compacts orders to ~84 month
    rows; everything after (join + arithmetic) is constant-size."""
    o = table(spark, sf_dir, "orders")
    monthly = (o.select(
                  F.year(F.col("o_orderdate").cast("date")).alias("year"),
                  F.month(F.col("o_orderdate").cast("date")).alias("month"),
                  F.round(F.col("o_totalprice") * 100, 0).cast("long")
                   .alias("cents"))
                .groupBy("year", "month")
                .agg(F.sum("cents").alias("revenue_cents"),
                     F.count(F.lit(1)).alias("n_orders")))
    prev = monthly.select((F.col("year") + 1).alias("year"), "month",
                          F.col("revenue_cents").alias("prev_year_cents"))
    return (monthly.join(prev, ["year", "month"], "left")
                   .select("year", "month", "n_orders", "revenue_cents",
                           "prev_year_cents",
                           (F.col("revenue_cents")
                            - F.col("prev_year_cents"))
                           .alias("yoy_delta_cents")))


ORDERS_MONTHLY_YOY_SQL = """
WITH monthly AS (
  SELECT CAST(date_part('year', CAST(o_orderdate AS DATE)) AS INT) AS year,
         CAST(date_part('month', CAST(o_orderdate AS DATE)) AS INT) AS month,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT m.year, m.month, m.n_orders, m.revenue_cents,
       p.revenue_cents AS prev_year_cents,
       m.revenue_cents - p.revenue_cents AS yoy_delta_cents
FROM monthly m
LEFT JOIN monthly p ON p.year = m.year - 1 AND p.month = m.month
"""


def lineitem_monthly_returnflag_share(spark: SparkSession, sf_dir: str
                                      ) -> DataFrame:
    """Shipment-month mix report: revenue per (ship month, returnflag)
    with each flag's share of its month — the ratio-to-report pattern
    over a calendar rollup (the operational twin of
    nation_share_of_segment). Revenue is exact cents; shares are one
    double division against the month total window.

    Scale: one partial-aggregable rollup compacts lineitem to
    months×flags rows; the share window runs on that tiny frame."""
    l = table(spark, sf_dir, "lineitem")
    monthly = (l.select(
                  F.year(F.col("l_shipdate").cast("date")).alias("year"),
                  F.month(F.col("l_shipdate").cast("date")).alias("month"),
                  "l_returnflag",
                  F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                   .alias("cents"))
                .groupBy("year", "month", "l_returnflag")
                .agg(F.sum("cents").alias("revenue_cents"),
                     F.count(F.lit(1)).alias("n_lines")))
    wm = Window.partitionBy("year", "month")
    return monthly.select(
        "year", "month", F.col("l_returnflag").alias("returnflag"),
        "n_lines", "revenue_cents",
        (F.col("revenue_cents").cast("double")
         / F.sum("revenue_cents").over(wm).cast("double"))
        .alias("month_share"))


LINEITEM_MONTHLY_FLAG_SQL = """
WITH monthly AS (
  SELECT CAST(date_part('year', CAST(l_shipdate AS DATE)) AS INT) AS year,
         CAST(date_part('month', CAST(l_shipdate AS DATE)) AS INT) AS month,
         l_returnflag,
         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
         COUNT(*) AS n_lines
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT year, month, l_returnflag AS returnflag, n_lines, revenue_cents,
       CAST(revenue_cents AS DOUBLE)
         / CAST(SUM(revenue_cents) OVER (PARTITION BY year, month)
                AS DOUBLE) AS month_share
FROM monthly
"""


def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type decile bands of the value column (ntile(10) with
    event_id tie-break): the exact band edges a monitoring system pins
    alert thresholds to. Each band reports its row count and min/max
    value — deterministic, no interpolation semantics to diverge
    between engines (unlike percentile_cont edge cases).

    Scale: ntile sorts within each event_type partition — a handful of
    partitions each sort-bounded; at extreme volume swap for
    approx-percentile edges (agg_approx_percentile is that query)."""
    e = events_table(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id"))
    return (e.select("event_type", "value", "event_id")
             .withColumn("decile", F.ntile(10).over(w))
             .groupBy("event_type", "decile")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.min("value").alias("min_value"),
                  F.max("value").alias("max_value")))


EVENTS_VALUE_DECILES_SQL = """
SELECT event_type, decile, COUNT(*) AS n_events,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM (SELECT event_type, value, event_id,
             NTILE(10) OVER (PARTITION BY event_type
                             ORDER BY value ASC, event_id ASC) AS decile
      FROM events)
GROUP BY event_type, decile
"""


def events_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user temporal burstiness: inter-event gap count, mean, max,
    and the Goh-Barabási burstiness coefficient B = (σ−μ)/(σ+μ) over
    gap seconds — the traffic-shape statistic that separates bots
    (B→−1, metronomic) from humans (B>0, bursty).

    Exactness: gaps are integer microseconds; μ and σ come from exact
    integer sufficient statistics (Σg, Σg² in DECIMAL(38,0) — gap² can
    exceed int64) with the same fixed IEEE op sequence both engines
    (the events_zscore_outliers discipline). Users with < 3 events are
    skipped. One lag window per user partition + one partial agg."""
    e = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = (e.select("user_id", "ts_us", "event_id")
             .withColumn("gap", F.col("ts_us") - F.lag("ts_us").over(w))
             .filter(F.col("gap").isNotNull()))
    g = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap").alias("s1"),
        F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap"))
         .alias("s2"),
        F.max("gap").alias("max_gap_us"))
    g = g.filter(F.col("n_gaps") >= 2)
    mean = F.col("s1").cast("double") / F.col("n_gaps").cast("double")
    var = ((F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
              / F.col("n_gaps").cast("double"))
           / (F.col("n_gaps").cast("double") - F.lit(1.0)))
    std = F.sqrt(var)
    return g.select(
        "user_id", "n_gaps",
        (mean / F.lit(1.0e6)).alias("mean_gap_s"),
        (F.col("max_gap_us").cast("double") / F.lit(1.0e6))
         .alias("max_gap_s"),
        ((std - mean) / (std + mean)).alias("burstiness"))


EVENTS_BURSTINESS_SQL = """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
  FROM events
),
g AS (
  SELECT user_id, COUNT(*) AS n_gaps,
         CAST(SUM(gap) AS BIGINT) AS s1,
         SUM(CAST(gap AS HUGEINT) * gap) AS s2,
         CAST(MAX(gap) AS BIGINT) AS max_gap_us
  FROM gaps WHERE gap IS NOT NULL
  GROUP BY user_id
  HAVING COUNT(*) >= 2
)
SELECT user_id, n_gaps,
       (CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE)) / 1.0E6 AS mean_gap_s,
       CAST(max_gap_us AS DOUBLE) / 1.0E6 AS max_gap_s,
       (sqrt((CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n_gaps AS DOUBLE))
             / (CAST(n_gaps AS DOUBLE) - 1.0))
        - CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
       / (sqrt((CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  / CAST(n_gaps AS DOUBLE))
               / (CAST(n_gaps AS DOUBLE) - 1.0))
          + CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE)) AS burstiness
FROM g
"""


def lineitem_discount_band_revenue(spark: SparkSession, sf_dir: str
                                   ) -> DataFrame:
    """Revenue and volume by discount band (1-percentage-point buckets)
    — the pricing-analytics rollup behind discount-effectiveness
    dashboards. The band is an exact integer (round(discount·100));
    revenue and the discount give-up are exact cents; one
    partial-aggregable pass."""
    l = table(spark, sf_dir, "lineitem")
    band = F.round(F.col("l_discount") * 100, 0).cast("int")
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    give_c = F.round(F.col("l_extendedprice") * F.col("l_discount") * 100,
                     0).cast("long")
    return (l.select(band.alias("discount_pct"), price_c.alias("pc"),
                     give_c.alias("gc"), "l_quantity")
             .groupBy("discount_pct")
             .agg(F.count(F.lit(1)).alias("n_lines"),
                  F.sum("l_quantity").cast("long").alias("total_qty"),
                  F.sum("pc").alias("gross_cents"),
                  F.sum("gc").alias("discount_given_cents")))


LINEITEM_DISCOUNT_BAND_SQL = """
SELECT CAST(round(l_discount*100) AS INT) AS discount_pct,
       COUNT(*) AS n_lines,
       CAST(SUM(l_quantity) AS BIGINT) AS total_qty,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
         AS gross_cents,
       CAST(SUM(CAST(round(l_extendedprice*l_discount*100) AS BIGINT))
            AS BIGINT) AS discount_given_cents
FROM lineitem
GROUP BY 1
"""


def part_type_price_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog pricing summary by part category (first word of p_type)
    and size band (sizes 1-50 in bands of 10): item count, exact
    min/max/total retail cents — the merchandising rollup over the part
    dimension. Pure partial-aggregable pass; output is categories ×
    bands (~30 rows)."""
    p = table(spark, sf_dir, "part")
    cat = F.split(F.col("p_type"), " ").getItem(0)
    band = (F.floor((F.col("p_size") - 1) / 10) * 10 + 1).cast("int")
    cents = F.round(F.col("p_retailprice") * 100, 0).cast("long")
    return (p.select(cat.alias("category"), band.alias("size_band"),
                     cents.alias("c"))
             .groupBy("category", "size_band")
             .agg(F.count(F.lit(1)).alias("n_parts"),
                  F.min("c").alias("min_cents"),
                  F.max("c").alias("max_cents"),
                  F.sum("c").alias("total_cents")))


PART_TYPE_PRICE_SQL = """
SELECT string_split(p_type, ' ')[1] AS category,
       CAST(floor((p_size - 1) / 10) * 10 + 1 AS INT) AS size_band,
       COUNT(*) AS n_parts,
       CAST(MIN(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(MAX(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT)
         AS max_cents,
       CAST(SUM(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM part
GROUP BY 1, 2
"""


BASKET_MIN_SUPPORT = 3
BASKET_TOP = 25
# Giant-basket guard: one degenerate hub order with 10^6 distinct parts
# would emit 5·10^11 pairs into a single l_orderkey group. Baskets keep
# only their first BASKET_CAP distinct parts (deterministic: lowest
# l_partkey, row_number in the same per-order shuffle — dedup.py's
# _cap_buckets pattern) BEFORE the pair self-join, so the worst-case
# per-order fan-out is bounded at cap·(cap-1)/2. TPC-H baskets are <=7
# lines, so at driver scale the cap never binds and capped == uncapped;
# orders_basket_overflow_report proves it with zeros (no silent caps).
BASKET_CAP = 500


def _capped_baskets(spark: SparkSession, sf_dir: str,
                    cap: int = BASKET_CAP) -> DataFrame:
    """Distinct (l_orderkey, l_partkey) basket lines, row_number-capped
    at ``cap`` parts per order (lowest l_partkey first). The window runs
    in the same hash partitioning the pair join needs next, and
    WindowExec spills — bounded memory even on a degenerate order."""
    from postgres_es_cdc_spark.llm.dedup import _cap_buckets
    li = (table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    return _cap_buckets(li, ["l_orderkey"], "l_partkey", cap)


def orders_basket_affinity(spark: SparkSession, sf_dir: str,
                           min_support: int = BASKET_MIN_SUPPORT,
                           top: int = BASKET_TOP,
                           cap: int = BASKET_CAP) -> DataFrame:
    """Market-basket affinity: the part pairs most often bought in the
    same order, with support (co-order count) and each side's order
    frequency — the count layer under association-rule mining (lift =
    support·N / (fa·fb) is a derived double left to consumers).

    Scale shape: pairs are generated per order by a self-join on
    l_orderkey. The group key bounds the blow-up only for well-behaved
    baskets (m lines emit m(m-1)/2 pairs; TPC-H baskets are <=7 lines),
    so a degenerate giant order IS capped: _capped_baskets keeps the
    first ``cap`` parts per order (dedup's PAIR_BUCKET_CAP row_number
    pattern) before the self-join, and orders_basket_overflow_report is
    the no-silent-caps side channel. Part frequencies stay uncapped
    (linear, no blow-up); the oracle applies the identical row_number
    rule, so capped results stay bit-exact even when the cap binds.
    Support filtering happens in the partial-aggregable pair count; the
    final top-k is a bounded TakeOrdered, never a vocabulary-sized
    window. Ties: (part_a, part_b) asc."""
    li = (table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    lic = _capped_baskets(spark, sf_dir, cap)
    a = lic.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = lic.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (a.join(b, "l_orderkey")
              .filter(F.col("part_a") < F.col("part_b"))
              .groupBy("part_a", "part_b")
              .agg(F.count(F.lit(1)).alias("support"))
              .filter(F.col("support") >= min_support))
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
    fa = freq.select(F.col("l_partkey").alias("part_a"),
                     F.col("f").alias("freq_a"))
    fb = freq.select(F.col("l_partkey").alias("part_b"),
                     F.col("f").alias("freq_b"))
    topk = (pairs.join(fa, "part_a").join(fb, "part_b")
                 .orderBy(F.desc("support"), F.asc("part_a"),
                          F.asc("part_b"))
                 .limit(top))
    w = Window.orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b"))
    return (topk.withColumn("rank", F.row_number().over(w))
                .select("rank", "part_a", "part_b", "support",
                        "freq_a", "freq_b"))


ORDERS_BASKET_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
lic AS (
  SELECT l_orderkey, l_partkey
  FROM (SELECT l_orderkey, l_partkey,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_partkey) AS rn
        FROM li)
  WHERE rn <= {BASKET_CAP}
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS support
  FROM lic a JOIN lic b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
),
freq AS (SELECT l_partkey, COUNT(*) AS f FROM li GROUP BY 1)
SELECT ROW_NUMBER() OVER (ORDER BY support DESC, part_a ASC, part_b ASC)
         AS rank,
       part_a, part_b, support, fa.f AS freq_a, fb.f AS freq_b
FROM pairs
JOIN freq fa ON fa.l_partkey = part_a
JOIN freq fb ON fb.l_partkey = part_b
ORDER BY support DESC, part_a ASC, part_b ASC
LIMIT {BASKET_TOP}
"""


def orders_basket_overflow_report(spark: SparkSession, sf_dir: str,
                                  cap: int = BASKET_CAP) -> DataFrame:
    """No-silent-caps side channel for orders_basket_affinity's
    BASKET_CAP guard (the basket twin of dedup_bucket_overflow_report):
    one row with the order count, the largest basket, how many baskets
    exceed the cap, and how many basket lines the cap drops. At TPC-H
    shapes every over/dropped count is 0 — the proof that the capped
    affinity query equals its uncapped form — while n_buckets/max_bucket
    are real basket statistics a pipeline operator watches for hub-order
    explosions.

    Scale shape: one partial-aggregable count per order, then a one-row
    rollup."""
    li = (table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    over = F.col("c") > cap
    return (sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("c").alias("max_bucket"),
        F.sum(over.cast("long")).alias("n_over_cap"),
        F.sum(F.when(over, F.col("c") - cap).otherwise(F.lit(0)))
         .alias("n_dropped_members"))
        .select(F.lit("basket_orders").alias("path"), "n_buckets",
                "max_bucket", "n_over_cap", "n_dropped_members"))


ORDERS_BASKET_OVERFLOW_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sizes AS (SELECT l_orderkey, COUNT(*) AS c FROM li GROUP BY 1)
SELECT 'basket_orders' AS path, COUNT(*) AS n_buckets,
       CAST(MAX(c) AS BIGINT) AS max_bucket,
       CAST(SUM(CASE WHEN c > {BASKET_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_cap,
       CAST(SUM(CASE WHEN c > {BASKET_CAP} THEN c - {BASKET_CAP} ELSE 0 END)
            AS BIGINT) AS n_dropped_members
FROM sizes
"""


PATH_LEN_TOP = 15


def events_path_mining(spark: SparkSession, sf_dir: str,
                       top: int = PATH_LEN_TOP) -> DataFrame:
    """Top 3-step behavioral paths: the most frequent consecutive
    (e1 -> e2 -> e3) event-type sequences across all user timelines —
    the k=3 extension of events_type_transitions and the table behind
    "what do users do next" funnel exploration.

    Exactness: ordering is the total order (ts_us, event_id); counting
    and ranking are exact. Scale: one user-keyed shuffle for the two
    lead windows (same Exchange — both windows share the partition/
    order spec), then a map-side-combinable count on the |types|³ key
    space and a TakeOrdered top-k."""
    e = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    t = (e.select("user_id", "event_type", "ts_us", "event_id")
          .withColumn("e2", F.lead("event_type", 1).over(w))
          .withColumn("e3", F.lead("event_type", 2).over(w))
          .filter(F.col("e3").isNotNull()))
    paths = (t.groupBy(F.col("event_type").alias("e1"), "e2", "e3")
              .agg(F.count(F.lit(1)).alias("n")))
    topk = paths.orderBy(F.desc("n"), F.asc("e1"), F.asc("e2"),
                         F.asc("e3")).limit(top)
    wr = Window.orderBy(F.desc("n"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
    return (topk.withColumn("rank", F.row_number().over(wr))
                .select("rank", "e1", "e2", "e3", "n"))


EVENTS_PATH_MINING_SQL = f"""
WITH t AS (
  SELECT event_type AS e1,
         LEAD(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS e2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS e3
  FROM events
),
paths AS (
  SELECT e1, e2, e3, COUNT(*) AS n FROM t
  WHERE e3 IS NOT NULL GROUP BY 1, 2, 3
)
SELECT ROW_NUMBER() OVER (ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC) AS rank,
       e1, e2, e3, n
FROM paths
ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC
LIMIT {PATH_LEN_TOP}
"""


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly traffic anomaly scores: each (date, hour) bucket's event
    count z-scored against the per-(day-of-week, hour) seasonal
    baseline — the standard ops-dashboard anomaly pass layered on the
    events_hourly_seasonality profile.

    Exactness: counts and their sums of squares are exact integers; the
    baseline mean/variance and the z-score are a FIXED sequence of
    IEEE double ops (two divisions, one sqrt) identical in both
    engines. Scale: one partial-aggregable hourly rollup, a 168-row
    baseline aggregate broadcast back, arithmetic in codegen."""
    e = events_table(spark, sf_dir)
    hourly = (e.select(
                  F.expr("CAST(ts_us div 86400000000 AS INT)").alias("day"),
                  F.expr("CAST((ts_us div 3600000000) % 24 AS INT)")
                   .alias("hour"))
               .groupBy("day", "hour")
               .agg(F.count(F.lit(1)).alias("c")))
    hourly = hourly.withColumn(
        "dow", F.expr("CAST((day + 4) % 7 AS INT)"))
    base = (hourly.groupBy("dow", "hour")
                  .agg(F.count(F.lit(1)).alias("nb"),
                       F.sum("c").alias("sc"),
                       F.sum(F.col("c") * F.col("c")).alias("scc")))
    mu = F.col("sc").cast("double") / F.col("nb").cast("double")
    var = ((F.col("nb") * F.col("scc") - F.col("sc") * F.col("sc"))
           .cast("double")
           / (F.col("nb") * F.col("nb")).cast("double"))
    sd = F.sqrt(var)
    z = (F.col("c").cast("double") - mu) / sd
    return (hourly.join(F.broadcast(base), ["dow", "hour"])
                  .filter(F.col("nb") >= 2)
                  .select("day", "dow", "hour", "c",
                          mu.alias("baseline_mean"), sd.alias("baseline_sd"),
                          F.when(sd > 0, z).alias("zscore")))


EVENTS_ANOMALY_SQL = """
WITH hourly AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day,
         CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS hour,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
h2 AS (SELECT day, hour, c, CAST((day + 4) % 7 AS INT) AS dow FROM hourly),
base AS (
  SELECT dow, hour, COUNT(*) AS nb,
         CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(c * c) AS BIGINT) AS scc
  FROM h2 GROUP BY 1, 2
)
SELECT h2.day, h2.dow, h2.hour, h2.c,
       CAST(sc AS DOUBLE) / CAST(nb AS DOUBLE) AS baseline_mean,
       SQRT(CAST(nb * scc - sc * sc AS DOUBLE)
            / CAST(nb * nb AS DOUBLE)) AS baseline_sd,
       CASE WHEN SQRT(CAST(nb * scc - sc * sc AS DOUBLE)
                      / CAST(nb * nb AS DOUBLE)) > 0
            THEN (CAST(h2.c AS DOUBLE)
                  - CAST(sc AS DOUBLE) / CAST(nb AS DOUBLE))
                 / SQRT(CAST(nb * scc - sc * sc AS DOUBLE)
                        / CAST(nb * nb AS DOUBLE))
            END AS zscore
FROM h2 JOIN base ON h2.dow = base.dow AND h2.hour = base.hour
WHERE nb >= 2
"""


def part_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per part: the Herfindahl-Hirschman index
    of supplier revenue shares (HHI = Σ share² × 10000, the antitrust
    statistic) plus supplier count and total revenue — the
    supply-chain-risk rollup that flags single-sourced parts.

    Exactness: revenue stays integer cents; HHI is computed as
    (Σ rev_s²) / (Σ rev_s)² — ONE double division of two exact decimal
    aggregates, so no order-dependent float summation anywhere.
    Scale: two partial-aggregable rollups (lineitem -> (part, supplier)
    -> part); no windows, no joins."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                0).cast("long").alias("cents"))
    ps = (li.groupBy("l_partkey", "l_suppkey")
            .agg(F.sum("cents").alias("rev")))
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return (ps.groupBy("l_partkey")
              .agg(F.count(F.lit(1)).alias("n_suppliers"),
                   F.sum("rev").alias("total_cents"),
                   F.sum(d38(F.col("rev")) * F.col("rev")).alias("ss"))
              .select("l_partkey", "n_suppliers",
                      F.col("total_cents").cast("long").alias("total_cents"),
                      (F.col("ss").cast("double")
                       / (d38(F.col("total_cents"))
                          * F.col("total_cents")).cast("double")
                       * F.lit(10000.0)).alias("hhi")))


PART_SUPPLIER_HHI_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1, 2
)
SELECT l_partkey, COUNT(*) AS n_suppliers,
       CAST(SUM(rev) AS BIGINT) AS total_cents,
       CAST(SUM(CAST(rev AS HUGEINT) * rev) AS DOUBLE)
         / CAST(CAST(SUM(rev) AS HUGEINT) * CAST(SUM(rev) AS BIGINT)
                AS DOUBLE)
         * 10000.0 AS hhi
FROM ps GROUP BY l_partkey
"""


MARKOV_SCALE = 10 ** 12
MARKOV_ITERS = 3


def events_markov_stationary(spark: SparkSession, sf_dir: str,
                             iters: int = MARKOV_ITERS) -> DataFrame:
    """Stationary distribution of the event-type Markov chain — power
    iteration over the transition matrix events_type_transitions
    counts, answering "where does user behavior settle": the long-run
    share of each event type, the summary behind engagement-mix
    forecasting and anomaly baselines.

    Exactness (the pagerank discipline, operators/graph.py): mass lives
    in ×1e12 fixed-point integers; each step computes Σ_i (v_i · n_ij)
    div n_i — every term an exact integer with a FIXED op order, so
    both engines produce bit-identical vectors and the oracle unrolls
    the same ``iters`` steps as CTEs. (Double-valued iteration would
    diverge: per-destination sums are order-dependent in floats.)
    States with no outgoing transitions shed their mass — documented
    absorbing behavior, deterministic in both engines.

    Scale shape: ONE user-keyed shuffle builds the |types|² count
    matrix (map-side-combinable); the iteration then runs on that tiny
    frame — a |types|-row vector joined to a |types|²-row matrix,
    broadcast-sized regardless of corpus size."""
    e = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    t = (e.select("user_id", "event_type", "ts_us", "event_id")
          .withColumn("prev_type", F.lag("event_type").over(w))
          .filter(F.col("prev_type").isNotNull()))
    trans = (t.groupBy(F.col("prev_type").alias("src"),
                       F.col("event_type").alias("dst"))
              .agg(F.count(F.lit(1)).alias("n")))
    tot = trans.groupBy("src").agg(F.sum("n").alias("tot"))
    tm = trans.join(tot, "src").localCheckpoint(eager=False)

    states = e.select("event_type").distinct() \
               .withColumnRenamed("event_type", "state")
    n_states = states.agg(F.count(F.lit(1)).alias("k"))
    v = (states.crossJoin(F.broadcast(n_states))
               .select("state", F.expr(f"{MARKOV_SCALE} div k").alias("m")))
    for _ in range(iters):
        stepped = (v.join(tm, v.state == tm.src)
                    .select(F.col("dst").alias("state"),
                            F.expr("(m * n) div tot").alias("c"))
                    .groupBy("state").agg(F.sum("c").alias("s")))
        v = (states.join(stepped, "state", "left")
                   .select("state",
                           F.coalesce("s", F.lit(0)).cast("long")
                            .alias("m")))
    return v.select(F.col("state").alias("event_type"),
                    F.col("m").alias("stationary_q"),
                    (F.col("m").cast("double") / MARKOV_SCALE)
                     .alias("stationary"))


def _markov_iter_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT s.state,
         CAST(COALESCE(c.s, 0) AS BIGINT) AS m
  FROM states s LEFT JOIN (
    SELECT tm.dst AS state, CAST(SUM((v.m * tm.n) // tm.tot) AS BIGINT) AS s
    FROM {prev} v JOIN tm ON v.state = tm.src
    GROUP BY tm.dst
  ) c ON s.state = c.state
)"""


EVENTS_MARKOV_SQL = f"""
WITH t AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type AS src, event_type AS dst, COUNT(*) AS n
  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
tm AS (
  SELECT trans.src, trans.dst, trans.n, tt.tot
  FROM trans JOIN (SELECT src, CAST(SUM(n) AS BIGINT) AS tot
                   FROM trans GROUP BY src) tt ON trans.src = tt.src
),
states AS (SELECT DISTINCT event_type AS state FROM events),
v0 AS (
  SELECT state,
         CAST({MARKOV_SCALE} // (SELECT COUNT(*) FROM states) AS BIGINT)
           AS m
  FROM states
),
{",".join(_markov_iter_sql(f"v{i}", f"v{i + 1}")
          for i in range(MARKOV_ITERS))}
SELECT state AS event_type, m AS stationary_q,
       CAST(m AS DOUBLE) / {MARKOV_SCALE} AS stationary
FROM v{MARKOV_ITERS}
"""


WEEK_US = 7 * 86_400_000_000


def events_type_share_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly event-type MIX with week-over-week drift — the
    distribution-shift monitor an event pipeline alarms on (a type's
    share jumping signals instrumentation breakage or behavior change;
    the categorical twin of events_anomaly_zscore's volume baseline).

    Exactness: share is ONE double division of exact counts; drift is
    abs(share - lag(share)), fixed IEEE ops over a deterministic
    (type, week) order. Scale: one map-side-combinable count per
    (week, type) — the drift windows run on that |weeks·types|-row
    rollup, never on events."""
    e = events_table(spark, sf_dir)
    wk = (F.col("ts_us") - F.col("ts_us") % WEEK_US) / F.lit(WEEK_US)
    counts = (e.select(wk.cast("long").alias("week"), "event_type")
               .groupBy("week", "event_type")
               .agg(F.count(F.lit(1)).alias("n")))
    tot = Window.partitionBy("week")
    share = F.col("n").cast("double") / F.sum("n").over(tot).cast("double")
    w = Window.partitionBy("event_type").orderBy("week")
    withs = counts.withColumn("share", share)
    return withs.select(
        "week", "event_type", "n", "share",
        F.abs(F.col("share") - F.lag("share").over(w)).alias("share_drift"))


EVENTS_TYPE_DRIFT_SQL = f"""
WITH counts AS (
  SELECT (epoch_us(ts) - epoch_us(ts) % {WEEK_US}) // {WEEK_US} AS week,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
shares AS (
  SELECT week, event_type, n,
         CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY week) AS DOUBLE) AS share
  FROM counts
)
SELECT week, event_type, n, share,
       ABS(share - LAG(share) OVER (PARTITION BY event_type
                                    ORDER BY week)) AS share_drift
FROM shares
"""


# Portable HyperLogLog: m=256 buckets from a 60-bit md5-prefix hash;
# rho = trailing-zero count of the bucket-stripped hash (geometric(1/2)
# under a uniform hash — the same law as leading zeros, via JVM/DuckDB
# bit_count, no floats). rho capped at 40 so Σ 2^(40−rho) stays an
# EXACT dyadic sum: terms span 2^0..2^40 over 256 buckets < 2^49 — the
# register sum is a plain BIGINT and every engine agrees bit-for-bit.
HLL_M = 256
HLL_RHO_CAP = 40
_HLL_ALPHA = 0.7213475  # alpha_256 ~ 0.7213/(1+1.079/m), fixed literal

# Linear-counting log table: lc(V) = ln(m/V) for V = 1..m, precomputed
# ONCE here and embedded as the same shortest-repr literals in both the
# Spark plan and the DuckDB SQL — both engines parse repr(x) back to
# the identical double, so the low-range correction needs NO runtime
# libm call (whose last-ulp behavior differs across platforms).
import math as _math

_HLL_LC_TABLE = tuple(_math.log(HLL_M / v) for v in range(1, HLL_M + 1))


def events_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user sketch per event type via a from-scratch portable
    HyperLogLog — the mergeable-sketch member of the approx family
    (agg_approx_distinct uses Spark's built-in HLL++, whose registers
    are opaque and engine-specific; THIS one's registers are plain
    integers any engine reproduces, so the sketch itself — not just the
    estimate — is verifiable and portable across systems, the property
    that matters when sketches are stored and merged across pipelines).

    Distributed-merge story: registers are a max-semilattice keyed by
    (type, bucket), so Spark's map-side partial_max IS the sketch
    merge — every partition builds a local sketch and the exchange
    carries 256 registers per type, never user ids. The exact
    COUNT(DISTINCT) is computed alongside as the error statement.

    Cross-engine exactness: hash = 60-bit md5 prefix of the DECIMAL
    STRING of user_id; bucket/suffix via %/shift (all positive);
    rho = bit_count((w & -w) - 1) + 1 capped at 40; the register sum is
    an exact BIGINT; the raw estimate is alpha·m²·2^40/S evaluated in
    the identical IEEE op order; the standard low-range linear-counting
    correction (V zero buckets > 0 and raw ≤ 2.5m ⇒ m·ln(m/V)) uses a
    PRECOMPUTED 256-entry log table embedded as identical literals in
    both plans — no runtime libm anywhere, so no platform divergence."""
    e = table(spark, sf_dir, "events")
    s = hll_sketch(e, "event_type", "user_id")
    x = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    return s.join(x, "event_type").select(
        "event_type", "n_exact", "n_zero_buckets", "sum_q",
        "raw_estimate", "hll_estimate")


def hll_registers(df: DataFrame, group_col: str,
                  key_col: str) -> DataFrame:
    """The sketch itself: sparse (group, bucket, m) register rows —
    a max-semilattice, so any partition/batch of the input folds to the
    same registers via groupBy-max (what HLLSink and Spark's map-side
    partial_max both exploit)."""
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
               16, 10).cast("long")
    b = df.select(group_col, h.alias("h")).select(
        group_col,
        (F.col("h") % HLL_M).alias("bucket"),
        F.shiftright("h", 8).alias("w"))
    rho = F.when(F.col("w") == 0, F.lit(HLL_RHO_CAP)).otherwise(
        F.least(F.bit_count((F.col("w").bitwiseAND(-F.col("w"))) - 1) + 1,
                F.lit(HLL_RHO_CAP)))
    return (b.select(group_col, "bucket", rho.alias("rho"))
             .groupBy(group_col, "bucket")
             .agg(F.max("rho").alias("m")))


def hll_estimate_from_registers(regs: DataFrame,
                                group_col: str) -> DataFrame:
    """Sparse registers → per-group estimate columns (n_zero_buckets,
    sum_q, raw_estimate, hll_estimate). Missing buckets count as m=0."""
    spark = regs.sparkSession
    allb = (regs.select(group_col).distinct()
                .crossJoin(spark.range(HLL_M).select(
                    F.col("id").alias("bucket")))
                .join(regs, [group_col, "bucket"], "left")
                .withColumn("m", F.coalesce(F.col("m"), F.lit(0))))
    s = allb.groupBy(group_col).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                     f"CAST({HLL_RHO_CAP} - m AS INT))")).alias("sum_q"),
        F.sum((F.col("m") == 0).cast("long")).alias("n_zero_buckets"))
    raw = (F.lit(_HLL_ALPHA) * F.lit(float(HLL_M * HLL_M))
           * F.lit(float(1 << HLL_RHO_CAP))
           / F.col("sum_q").cast("double"))
    lut = F.array(*[F.lit(v) for v in _HLL_LC_TABLE])
    lc = F.lit(float(HLL_M)) * F.element_at(
        lut, F.col("n_zero_buckets").cast("int"))
    est = F.when((F.col("n_zero_buckets") > 0)
                 & (F.col("raw_estimate") <= F.lit(2.5 * HLL_M)), lc) \
           .otherwise(F.col("raw_estimate"))
    return (s.withColumn("raw_estimate", raw)
             .withColumn("hll_estimate", est))


def hll_sketch(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Portable-HLL distinct estimate of ``key_col`` per ``group_col``
    (see events_hll_distinct_users for the design). Returns one row per
    group: (group_col, n_zero_buckets, sum_q, raw_estimate,
    hll_estimate)."""
    return hll_estimate_from_registers(
        hll_registers(df, group_col, key_col), group_col)


# Shared DuckDB CTE chain: events -> registers -> per-type
# (n_zero_buckets, sum_q, raw_estimate) in `est`. Both the batch query
# (with its exact companion) and the IVM sink row (registers folded
# through batches) finish from the same `est`.
_HLL_CORE_SQL = f"""b AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM events
),
r AS (
  SELECT event_type, h % {HLL_M} AS bucket,
         MAX(CASE WHEN (h >> 8) = 0 THEN {HLL_RHO_CAP}
                  ELSE LEAST(bit_count(((h >> 8) & -(h >> 8)) - 1) + 1,
                             {HLL_RHO_CAP}) END) AS m
  FROM b GROUP BY 1, 2
),
allb AS (
  SELECT t.event_type, g.bucket, COALESCE(r.m, 0) AS m
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(0, {HLL_M} - 1)) AS bucket) g
  LEFT JOIN r ON r.event_type = t.event_type AND r.bucket = g.bucket
),
s AS (
  SELECT event_type,
         CAST(SUM(CAST(1 AS BIGINT) << ({HLL_RHO_CAP} - m)) AS BIGINT)
           AS sum_q,
         CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_buckets
  FROM allb GROUP BY 1
),
est AS (
  SELECT s.event_type, s.n_zero_buckets, s.sum_q,
         CAST({_HLL_ALPHA} AS DOUBLE) * CAST({HLL_M * HLL_M} AS DOUBLE)
           * CAST({1 << HLL_RHO_CAP} AS DOUBLE) / CAST(s.sum_q AS DOUBLE)
           AS raw_estimate
  FROM s
)"""

_HLL_EST_CASE_SQL = f"""CASE WHEN n_zero_buckets > 0
            AND raw_estimate <= {2.5 * HLL_M}
            THEN CAST({HLL_M} AS DOUBLE) * list_extract(
                   [{", ".join(repr(v) for v in _HLL_LC_TABLE)}],
                   CAST(n_zero_buckets AS INT))
            ELSE raw_estimate END AS hll_estimate"""

EVENTS_HLL_SQL = f"""
WITH {_HLL_CORE_SQL},
x AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1)
SELECT est.event_type, x.n_exact, est.n_zero_buckets, est.sum_q,
       est.raw_estimate,
       {_HLL_EST_CASE_SQL}
FROM est JOIN x ON x.event_type = est.event_type
"""

IVM_HLL_SQL = f"""
WITH {_HLL_CORE_SQL}
SELECT event_type, n_zero_buckets, sum_q, raw_estimate,
       {_HLL_EST_CASE_SQL}
FROM est
"""


# ---------------------------------------------------------------------------
# Portable mergeable QUANTILE sketch (log2 histogram, DDSketch-style)
# ---------------------------------------------------------------------------

QSK_SUB_BITS = 4                 # sub-buckets per octave = 16
QSK_SUB = 1 << QSK_SUB_BITS
QSK_PCTS = (50, 90, 99)


def qsketch_registers(df: DataFrame, group_col: str,
                      value_col: str) -> DataFrame:
    """The quantile sketch itself: (group, bucket, cnt) histogram
    registers over log2 buckets with 16 linear sub-buckets per octave
    (the DDSketch recipe with a power-of-two gamma, so the bucket
    index is PURE INTEGER BIT ARITHMETIC — floor-log2 via length(bin),
    sub-bucket via a shift — identical on any engine, zero libm).

    Values 0..15 get exact unit buckets (id = value); v >= 16 maps to
    id = 16·e + sub where e = floor(log2 v) and sub = the 4 mantissa
    bits below the leading 1 — so every bucket spans [lo, lo + 2^(e-4))
    and the relative width is <= 1/16 (6.25%), the sketch's rank-query
    error envelope.

    Registers are a SUM-semilattice: any partition/batch of the input
    folds to the same registers via groupBy-sum — Spark's map-side
    partial_sum IS the sketch merge; the exchange carries O(groups ×
    ~64·16) count rows, never the values. Negative inputs must be
    filtered by the caller (rank sketch over magnitudes)."""
    return (df.select(group_col, qsketch_bucket(value_col).alias("bucket"))
              .groupBy(group_col, "bucket")
              .agg(F.count(F.lit(1)).alias("cnt")))


def qsketch_bucket(value_col: str):
    """Register id of a non-negative integer value (qsketch_registers'
    bucket map as a reusable Column — pure integer bit arithmetic)."""
    return F.expr(
        f"CASE WHEN {value_col} < {QSK_SUB} THEN CAST({value_col} AS BIGINT)"
        f" ELSE (length(bin({value_col})) - 1) * {QSK_SUB}"
        f" + CAST({value_col} AS BIGINT)"
        f"   div shiftleft(CAST(1 AS BIGINT),"
        f"         CAST(length(bin({value_col})) - 1 - {QSK_SUB_BITS}"
        f"              AS INT))"
        f" - {QSK_SUB} END")


def qsketch_bounds(bucket) -> tuple:
    """(lo, hi) integer value bounds of a register id — the interval
    the sketch guarantees contains every value it counted there."""
    sub = bucket % QSK_SUB
    width = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                   f"CAST(bucket div {QSK_SUB} - {QSK_SUB_BITS} AS INT))")
    lo = F.when(bucket < QSK_SUB, bucket.cast("long")) \
          .otherwise((QSK_SUB + sub) * width)
    hi = F.when(bucket < QSK_SUB, bucket.cast("long") + 1) \
          .otherwise((QSK_SUB + sub) * width + width)
    return lo, hi


def events_quantile_gap_sketch(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Per-event-type latency percentiles (p50/p90/p99 of per-user
    inter-event gaps, microseconds) answered from the portable quantile
    sketch — the second mergeable sketch next to the HLL, same
    discipline: integer-only registers both engines reproduce
    bit-for-bit, map-side partial merge, exact companion as the error
    statement. Unlike KLL's randomized compaction this sketch is
    deterministic by construction (fixed log2 bucket map), so the
    REGISTERS — not just the estimates — are portable and
    hash-verifiable, the property that matters when sketches are
    stored and merged across pipelines.

    Rank query: rank = ceil(p·n/100) in integer arithmetic; the answer
    is the register interval [q_lo, q_hi) containing the rank-th
    smallest gap — counts are exact, so the interval provably contains
    the true percentile (within_bucket is the tested tautology, like
    the HLL accuracy booleans) and its relative width is <= 1/16.

    Scale shape: one user-keyed shuffle for the lag window, then the
    register fold (map-side combined); the quantile walk runs on the
    register table (~#types × 1000 rows). The exact companion is
    REGISTER-GUIDED (round 9): the hit bucket's exact counts locate the
    rank (global order = (bucket, within-bucket order) because buckets
    are disjoint value-monotone intervals), so only the hit bucket's
    rows — n/(16·octaves)-ish, never the corpus — are sorted, and only
    within (type, percentile) groups. The pre-guided form sorted every
    gap per type in ONE window task per type (sf10 measured 63.5s; a
    ~2M-row single-task sort at 100× — exactly the non-plan you'd get
    sorting 100 TB in #types tasks); guided it's a broadcast semi-join
    + tiny sorts."""
    e = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = (e.select("user_id", "event_type", "ts_us", "event_id")
             .withColumn("gap", F.col("ts_us") - F.lag("ts_us").over(w))
             .filter(F.col("gap").isNotNull())
             .select("event_type", "gap")
             .localCheckpoint(eager=True))
    regs = qsketch_registers(gaps, "event_type", "gap")

    n = gaps.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_gaps"))
    pcts = spark.createDataFrame([(p,) for p in QSK_PCTS], "p long")
    tgt = (n.crossJoin(F.broadcast(pcts))
            .select("event_type", "p", "n_gaps",
                    F.expr("(n_gaps * p + 99) div 100").alias("q_rank")))

    cum = regs.withColumn(
        "cum", F.sum("cnt").over(Window.partitionBy("event_type")
                                 .orderBy("bucket")
                                 .rowsBetween(Window.unboundedPreceding,
                                              0)))
    hit = (tgt.join(cum, "event_type")
              .filter(F.col("cum") >= F.col("q_rank"))
              .withColumn("_rn", F.row_number().over(
                  Window.partitionBy("event_type", "p")
                        .orderBy("bucket")))
              .filter(F.col("_rn") == 1)
              .withColumn("cum_before", F.col("cum") - F.col("cnt")))
    lo, hi = qsketch_bounds(F.col("bucket"))

    # register-guided exact rank select (docstring, Scale shape): the
    # q_rank-th smallest gap is the (q_rank - cum_before)-th smallest
    # WITHIN the hit bucket — exact because register counts are exact
    # and buckets are disjoint value-monotone intervals. Ties within
    # the bucket order arbitrarily, same as a full sort: the selected
    # VALUE is identical either way.
    sel = hit.select("event_type", "p", "bucket", "q_rank", "cum_before")
    cand = (gaps.withColumn("bucket", qsketch_bucket("gap"))
                .join(F.broadcast(sel), ["event_type", "bucket"]))
    exact = (cand.withColumn("_rn", F.row_number().over(
                 Window.partitionBy("event_type", "p").orderBy("gap")))
                 .filter(F.col("_rn")
                         == F.col("q_rank") - F.col("cum_before"))
                 .select("event_type", "p",
                         F.col("gap").alias("exact_gap_us")))
    return (hit.select("event_type", "p", "n_gaps", "q_rank",
                       lo.alias("q_lo"), hi.alias("q_hi"))
               .join(exact, ["event_type", "p"])
               .select("event_type", "p", "n_gaps", "q_rank", "q_lo",
                       "q_hi", "exact_gap_us",
                       ((F.col("q_lo") <= F.col("exact_gap_us"))
                        & (F.col("exact_gap_us") < F.col("q_hi")))
                       .alias("within_bucket")))


_QSK_GAPS_SQL = """gaps AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           AS gap
  FROM events
  QUALIFY gap IS NOT NULL
)"""

_QSK_BUCKET_SQL = f"""CASE WHEN gap < {QSK_SUB} THEN gap
         ELSE (length(bin(gap)) - 1) * {QSK_SUB}
              + gap // (CAST(1 AS BIGINT)
                        << CAST(length(bin(gap)) - 1 - {QSK_SUB_BITS}
                                AS INT))
              - {QSK_SUB} END"""

EVENTS_QSKETCH_SQL = f"""
WITH {_QSK_GAPS_SQL},
regs AS (
  SELECT event_type, {_QSK_BUCKET_SQL} AS bucket, COUNT(*) AS cnt
  FROM gaps GROUP BY 1, 2
),
n AS (SELECT event_type, COUNT(*) AS n_gaps FROM gaps GROUP BY 1),
tgt AS (
  SELECT n.event_type, p.p, n.n_gaps,
         (n.n_gaps * p.p + 99) // 100 AS q_rank
  FROM n, (SELECT unnest([{", ".join(str(p) for p in QSK_PCTS)}]) AS p) p
),
cum AS (
  SELECT event_type, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM regs
),
hit AS (
  SELECT event_type, p, n_gaps, q_rank, bucket
  FROM (SELECT t.event_type, t.p, t.n_gaps, t.q_rank, c.bucket,
               ROW_NUMBER() OVER (PARTITION BY t.event_type, t.p
                                  ORDER BY c.bucket) AS rn
        FROM tgt t JOIN cum c ON t.event_type = c.event_type
        WHERE c.cum >= t.q_rank)
  WHERE rn = 1
),
bounds AS (
  SELECT event_type, p, n_gaps, q_rank,
         CASE WHEN bucket < {QSK_SUB} THEN bucket
              ELSE ({QSK_SUB} + bucket % {QSK_SUB})
                   * (CAST(1 AS BIGINT)
                      << CAST(bucket // {QSK_SUB} - {QSK_SUB_BITS}
                              AS INT)) END AS q_lo,
         CASE WHEN bucket < {QSK_SUB} THEN bucket + 1
              ELSE ({QSK_SUB} + bucket % {QSK_SUB} + 1)
                   * (CAST(1 AS BIGINT)
                      << CAST(bucket // {QSK_SUB} - {QSK_SUB_BITS}
                              AS INT)) END AS q_hi
  FROM hit
),
exact AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap)
           AS q_rank,
         gap AS exact_gap_us
  FROM gaps
)
SELECT b.event_type, b.p, CAST(b.n_gaps AS BIGINT) AS n_gaps,
       CAST(b.q_rank AS BIGINT) AS q_rank,
       CAST(b.q_lo AS BIGINT) AS q_lo, CAST(b.q_hi AS BIGINT) AS q_hi,
       CAST(e.exact_gap_us AS BIGINT) AS exact_gap_us,
       b.q_lo <= e.exact_gap_us AND e.exact_gap_us < b.q_hi
         AS within_bucket
FROM bounds b JOIN exact e
  ON b.event_type = e.event_type AND b.q_rank = e.q_rank
"""


IVM_QSKETCH_SQL = f"""
WITH vals AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS gap
  FROM events
)
SELECT event_type, {_QSK_BUCKET_SQL} AS bucket,
       COUNT(*) AS cnt
FROM vals GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Portable mergeable COUNT-MIN sketch (heavy-hitter frequency estimates)
# ---------------------------------------------------------------------------

CMS_W = 1024   # counters per hash row
CMS_D = 4      # independent hash rows (md5 salts)
CMS_TOPK = 10


def cms_registers(df: DataFrame, key_col: str) -> DataFrame:
    """The Count-Min sketch itself: (r, col, cnt) counter rows, r <
    CMS_D hash rows of CMS_W columns; col = 60-bit md5 prefix of
    (salt r || key) mod W. Deterministic (salted md5, no seeds) and a
    SUM-semilattice — any partition/batch of the input folds to the
    same counters via groupBy-sum, so the sketch merges across
    pipelines/engines like the HLL registers and quantile buckets.

    The classic guarantee holds per data set: for every key,
    min_r counter[r][h_r(key)] >= true count (only overestimates),
    and the overshoot is bounded by the colliding mass."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(CMS_D)])).alias("r")
    e = df.select(F.col(key_col).cast("string").alias("k")).select(
        "k", rows)
    col = (F.conv(F.substring(
        F.md5(F.concat(F.col("r").cast("string"), F.lit("_"),
                       F.col("k"))), 1, 15), 16, 10).cast("long")
        % CMS_W)
    return (e.select("r", col.alias("col"))
             .groupBy("r", "col")
             .agg(F.count(F.lit(1)).alias("cnt")))


CMS_COL_SQL = ("('0x' || substr(md5(CAST(r AS VARCHAR) || '_' || k), "
               f"1, 15))::BIGINT % {CMS_W}")


def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str,
                             topk: int = CMS_TOPK) -> DataFrame:
    """Heavy-hitter user frequencies answered from a portable Count-Min
    sketch — the third mergeable sketch next to the HLL (distincts) and
    the quantile histogram (ranks): CMS_D salted md5 hash rows of CMS_W
    integer counters, point estimate = MIN over the rows' counters.
    Registers are plain integers identical on any engine; counter
    merge is map-side partial SUM.

    Output: the exact top-k users by event count (fully tie-broken),
    each with its exact count, the sketch estimate, and the
    one-sided-error tautology cms_ge_exact (CMS only ever
    overestimates) — the exact side is the error statement and is the
    part a 100 TB deployment drops (candidates would come from a
    per-partition pre-top instead).

    Scale shape: the sketch build is one map-side-combined count into
    CMS_D·CMS_W rows regardless of key cardinality; the point lookup
    joins the bounded candidate set against the register table."""
    e = table(spark, sf_dir, "events")
    regs = cms_registers(e, "user_id")
    exact = (e.groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n_exact"))
              .orderBy(F.desc("n_exact"), F.asc("user_id"))
              .limit(topk))
    cand = exact.select(F.col("user_id").cast("string").alias("k"),
                        "user_id", "n_exact")
    rows = F.explode(F.array(*[F.lit(r) for r in range(CMS_D)])).alias("r")
    probe = cand.select("user_id", "n_exact", "k", rows)
    col = (F.conv(F.substring(
        F.md5(F.concat(F.col("r").cast("string"), F.lit("_"),
                       F.col("k"))), 1, 15), 16, 10).cast("long")
        % CMS_W)
    est = (probe.select("user_id", "n_exact", "r", col.alias("col"))
                .join(regs, ["r", "col"])
                .groupBy("user_id", "n_exact")
                .agg(F.min("cnt").alias("cms_estimate")))
    return (est.select("user_id", "n_exact", "cms_estimate",
                       (F.col("cms_estimate") >= F.col("n_exact"))
                       .alias("cms_ge_exact"))
               .orderBy(F.desc("n_exact"), F.asc("user_id")))


EVENTS_CMS_SQL = f"""
WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
regs AS (
  SELECT r, {CMS_COL_SQL} AS col, COUNT(*) AS cnt
  FROM keys, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS r) d
  GROUP BY 1, 2
),
exact AS (
  SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY 1
  ORDER BY n_exact DESC, user_id ASC LIMIT {CMS_TOPK}
),
probe AS (
  SELECT e.user_id, e.n_exact, d.r,
         CAST(e.user_id AS VARCHAR) AS k
  FROM exact e, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS r) d
),
est AS (
  SELECT p.user_id, p.n_exact, MIN(g.cnt) AS cms_estimate
  FROM (SELECT user_id, n_exact, r, {CMS_COL_SQL} AS col FROM probe) p
  JOIN regs g ON g.r = p.r AND g.col = p.col
  GROUP BY 1, 2
)
SELECT user_id, n_exact, CAST(cms_estimate AS BIGINT) AS cms_estimate,
       cms_estimate >= n_exact AS cms_ge_exact
FROM est
ORDER BY n_exact DESC, user_id ASC
"""


def events_hll_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET ALGEBRA over stored sketches: for every pair of event
    types, the distinct-user UNION estimate from the max-merge of the
    two types' register tables — the operation you run on WAREHOUSED
    sketches without touching raw keys — and the INTERSECTION estimate
    by inclusion-exclusion ((est_a + est_b) − est_union, fixed op
    order). Exact companions state the error; the union estimate
    inherits the single-sketch envelope (max-merge of registers IS the
    sketch of the union — provable, and the reason HLL registers are
    worth storing), while inclusion-exclusion error compounds — the
    known caveat, stated by the exact columns every round.

    Scale shape: registers build once per type (map-side partial max),
    the pair stage merges |pairs|·256 register rows — raw user ids
    never re-enter; exact companions are one distinct-pair aggregation
    (the part a 100 TB deployment drops)."""
    e = table(spark, sf_dir, "events")
    regs = hll_registers(e, "event_type", "user_id")
    types = regs.select("event_type").distinct()
    pairs = (types.select(F.col("event_type").alias("ta"))
             .join(types.select(F.col("event_type").alias("tb")),
                   F.col("ta") < F.col("tb")))
    pk = F.concat_ws("|", "ta", "tb").alias("pair")

    tagged = (pairs.join(regs, regs.event_type == pairs.ta)
              .select(pk, "bucket", "m")
              .unionByName(
                  pairs.join(regs, regs.event_type == pairs.tb)
                       .select(pk, "bucket", "m")))
    ureg = tagged.groupBy("pair", "bucket").agg(F.max("m").alias("m"))
    uest = (hll_estimate_from_registers(ureg, "pair")
            .select("pair", F.col("hll_estimate").alias("hll_union")))
    sest = (hll_estimate_from_registers(regs, "event_type")
            .select("event_type", "hll_estimate"))

    eu = e.select("event_type", "user_id")
    ex = (pairs.join(eu, (eu.event_type == pairs.ta)
                     | (eu.event_type == pairs.tb))
          .groupBy("ta", "tb")
          .agg(F.countDistinct("user_id").alias("n_exact_union")))
    ea = eu.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("nd"))
    inter = (pairs
             .join(eu.alias("x"), F.col("x.event_type") == F.col("ta"))
             .select("ta", "tb", F.col("x.user_id").alias("u"))
             .join(eu.alias("y"),
                   (F.col("y.event_type") == F.col("tb"))
                   & (F.col("y.user_id") == F.col("u")), "left_semi")
             .groupBy("ta", "tb")
             .agg(F.countDistinct("u").alias("n_exact_inter")))

    out = (pairs.select("ta", "tb", pk)
           .join(uest, "pair")
           .join(sest.select(F.col("event_type").alias("ta"),
                             F.col("hll_estimate").alias("est_a")), "ta")
           .join(sest.select(F.col("event_type").alias("tb"),
                             F.col("hll_estimate").alias("est_b")), "tb")
           .join(ex, ["ta", "tb"])
           .join(inter, ["ta", "tb"]))
    return (out.select(
        F.col("ta").alias("type_a"), F.col("tb").alias("type_b"),
        "n_exact_union", "n_exact_inter",
        F.col("hll_union").alias("hll_union_estimate"),
        ((F.col("est_a") + F.col("est_b")) - F.col("hll_union"))
        .alias("hll_inter_estimate"))
        .orderBy("type_a", "type_b"))


EVENTS_HLL_OVERLAP_SQL = f"""
WITH b AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM events
),
r AS (
  SELECT event_type, h % {HLL_M} AS bucket,
         MAX(CASE WHEN (h >> 8) = 0 THEN {HLL_RHO_CAP}
                  ELSE LEAST(bit_count(((h >> 8) & -(h >> 8)) - 1) + 1,
                             {HLL_RHO_CAP}) END) AS m
  FROM b GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM events),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a JOIN types b ON a.event_type < b.event_type
),
ureg AS (
  SELECT p.ta, p.tb, r.bucket, MAX(r.m) AS m
  FROM pairs p JOIN r ON r.event_type IN (p.ta, p.tb)
  GROUP BY 1, 2, 3
),
allu AS (
  SELECT p.ta, p.tb, g.bucket, COALESCE(u.m, 0) AS m
  FROM pairs p
  CROSS JOIN (SELECT unnest(generate_series(0, {HLL_M} - 1)) AS bucket) g
  LEFT JOIN ureg u ON u.ta = p.ta AND u.tb = p.tb AND u.bucket = g.bucket
),
us AS (
  SELECT ta, tb,
         CAST(SUM(CAST(1 AS BIGINT) << ({HLL_RHO_CAP} - m)) AS BIGINT)
           AS sum_q,
         CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_buckets
  FROM allu GROUP BY 1, 2
),
uest AS (
  SELECT ta, tb, n_zero_buckets, sum_q,
         CAST({_HLL_ALPHA} AS DOUBLE) * CAST({HLL_M * HLL_M} AS DOUBLE)
           * CAST({1 << HLL_RHO_CAP} AS DOUBLE) / CAST(sum_q AS DOUBLE)
           AS raw_estimate
  FROM us
),
ufin AS (
  SELECT ta, tb, {_HLL_EST_CASE_SQL.replace("hll_estimate",
                                            "hll_union")}
  FROM uest
),
allb AS (
  SELECT t.event_type, g.bucket, COALESCE(r.m, 0) AS m
  FROM types t
  CROSS JOIN (SELECT unnest(generate_series(0, {HLL_M} - 1)) AS bucket) g
  LEFT JOIN r ON r.event_type = t.event_type AND r.bucket = g.bucket
),
ss AS (
  SELECT event_type,
         CAST(SUM(CAST(1 AS BIGINT) << ({HLL_RHO_CAP} - m)) AS BIGINT)
           AS sum_q,
         CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_buckets
  FROM allb GROUP BY 1
),
sest0 AS (
  SELECT event_type, n_zero_buckets, sum_q,
         CAST({_HLL_ALPHA} AS DOUBLE) * CAST({HLL_M * HLL_M} AS DOUBLE)
           * CAST({1 << HLL_RHO_CAP} AS DOUBLE) / CAST(sum_q AS DOUBLE)
           AS raw_estimate
  FROM ss
),
sest AS (SELECT event_type, {_HLL_EST_CASE_SQL} FROM sest0),
exu AS (
  SELECT p.ta, p.tb, COUNT(DISTINCT e.user_id) AS n_exact_union
  FROM pairs p JOIN events e ON e.event_type IN (p.ta, p.tb)
  GROUP BY 1, 2
),
exi AS (
  SELECT p.ta, p.tb, COUNT(DISTINCT x.user_id) AS n_exact_inter
  FROM pairs p
  JOIN events x ON x.event_type = p.ta
  WHERE EXISTS (SELECT 1 FROM events y
                WHERE y.event_type = p.tb AND y.user_id = x.user_id)
  GROUP BY 1, 2
)
SELECT u.ta AS type_a, u.tb AS type_b,
       exu.n_exact_union, exi.n_exact_inter,
       u.hll_union AS hll_union_estimate,
       (sa.hll_estimate + sb.hll_estimate) - u.hll_union
         AS hll_inter_estimate
FROM ufin u
JOIN sest sa ON sa.event_type = u.ta
JOIN sest sb ON sb.event_type = u.tb
JOIN exu ON exu.ta = u.ta AND exu.tb = u.tb
JOIN exi ON exi.ta = u.ta AND exi.tb = u.tb
ORDER BY type_a, type_b
"""
