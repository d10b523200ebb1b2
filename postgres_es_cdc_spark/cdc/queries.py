"""CDC query-surface wrappers: the reference's consumer semantics
(es.go:47-144, utils.go:92-117) as oracle-checkable queries over the
deterministic synthesized event stream (cdc/generate.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.cdc.apply import (
    apply_changes, apply_changes_evolving, apply_changes_typed,
    latest_events)
from postgres_es_cdc_spark.cdc.envelope import dead_letters, is_valid
from postgres_es_cdc_spark.cdc.generate import (
    ORDERS_CDC_EXPECTED_SQL,
    orders_cdc_events,
    orders_cdc_events_typed,
    orders_cdc_value_schema,
)

# The synthesized event stream re-expressed as DuckDB SQL (keys + ops only;
# corrupt events carry no parseable key and are excluded, utils.go:99-102).
EVENTS_SYNTH_SQL = """
  SELECT o_orderkey*10 AS ev_offset, 'INSERT' AS op, o_orderkey AS id FROM orders
  UNION ALL SELECT o_orderkey*10+3, 'UPDATE', o_orderkey FROM orders WHERE o_orderkey%5=0
  UNION ALL SELECT o_orderkey*10+4, 'UPDATE', o_orderkey FROM orders WHERE o_orderkey%7=0
  UNION ALL SELECT o_orderkey*10+5, 'DELETE', o_orderkey FROM orders WHERE o_orderkey%9=0
  UNION ALL SELECT o_orderkey*10+7, 'INSERT', o_orderkey FROM orders WHERE o_orderkey%9=0 AND o_orderkey%2=1
  UNION ALL SELECT o_orderkey*10+8, 'UPDATE', -o_orderkey FROM orders WHERE o_orderkey%17=0
"""


def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: fold the full I/U/D event stream (sparse updates,
    explicit nulls, deletes, reinserts, corrupt rows, orphan updates)
    into final per-key state. Oracle computes the expected state
    independently as a CASE projection — not by refolding."""
    ev = orders_cdc_events(spark, sf_dir)
    return apply_changes(ev, orders_cdc_value_schema())


CDC_APPLY_SQL = ORDERS_CDC_EXPECTED_SQL


def cdc_apply_changes_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship fold over the zero-serde typed event feed
    (apply_changes_typed) — same event plan, same expected-state oracle,
    no JSON anywhere in the hot path."""
    ev = orders_cdc_events_typed(spark, sf_dir)
    return apply_changes_typed(ev, orders_cdc_value_schema())


CDC_APPLY_TYPED_SQL = ORDERS_CDC_EXPECTED_SQL


def cdc_snapshot_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial-snapshot ∪ change-stream bootstrap (the reference starts
    replication at the current WAL position with NO snapshot,
    producer.go:50,60 — rows existing before startup never reach ES;
    this is the fix: snapshot rows enter the fold as INSERTs below every
    stream offset, then the change stream applies on top)."""
    from postgres_es_cdc_spark.catalog import table

    snap = table(spark, sf_dir, "orders").select(
        F.lit(-1).cast("long").alias("offset"),
        F.lit("INSERT").alias("operationType"),
        F.lit("orders").alias("tableName"),
        F.to_json(F.struct(
            F.col("o_orderkey").alias("id"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_orderpriority").alias("priority")),
            {"ignoreNullFields": "false"}).alias("payload"),
    )
    # Stream = everything EXCEPT the base inserts (they live in the
    # snapshot now): updates, deletes, reinserts, corruption, orphans.
    stream = orders_cdc_events(spark, sf_dir).filter(F.col("offset") % 10 != 0)
    return apply_changes(snap.unionByName(stream), orders_cdc_value_schema())


def cdc_snapshot_then_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-source frontend (sources/snapshot.py): the initial state
    the reference never captures (producer.go:50,60 starts replication at
    the current WAL position, snapshot-less), read through the
    DataSource-option surface (parquet here; the same class carries the
    parallel-JDBC options in production) and folded below the change
    stream. Oracle: the independent expected-state projection — i.e. the
    sequential snapshot-then-each-change fold."""
    from postgres_es_cdc_spark.sources.snapshot import (
        SnapshotSource, snapshot_then_stream)

    source = SnapshotSource(
        fmt="parquet",
        options={"path": f"{sf_dir}/orders.parquet"},
        column_map={"o_orderkey": "id", "o_custkey": "custkey",
                    "o_orderstatus": "status", "o_totalprice": "totalprice",
                    "o_orderpriority": "priority"},
    )
    # Change stream: everything except the base INSERTs (those rows are
    # the snapshot now): updates, deletes, reinserts, corruption, orphans.
    stream = orders_cdc_events(spark, sf_dir).filter(F.col("offset") % 10 != 0)
    return snapshot_then_stream(spark, source, stream,
                                orders_cdc_value_schema())


CDC_SNAPSHOT_THEN_STREAM_SQL = ORDERS_CDC_EXPECTED_SQL


def cdc_txn_committed_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction bracketing (cdc/txn.py): each order key's events form
    one transaction (txn_id = offset div 10); keys with k%23==0 never
    receive a COMMIT marker — their whole transaction (insert included)
    must be invisible in the folded state, exactly the Begin/Commit
    atomicity the reference throws away (producer.go:163-164)."""
    from postgres_es_cdc_spark.catalog import table
    from postgres_es_cdc_spark.cdc.txn import apply_changes_transactional

    ev = orders_cdc_events(spark, sf_dir).withColumn(
        "txn_id", F.expr("offset div 10"))
    k = F.col("o_orderkey")
    commits = (table(spark, sf_dir, "orders")
               .filter(k % 23 != 0)
               .select((k * 10 + 9).cast("long").alias("offset"),
                       F.lit("COMMIT").alias("operationType"),
                       F.lit("orders").alias("tableName"),
                       F.lit(None).cast("string").alias("payload"),
                       k.cast("long").alias("txn_id")))
    return apply_changes_transactional(ev.unionByName(commits),
                                       orders_cdc_value_schema())


CDC_TXN_COMMITTED_SQL = f"""
WITH expected AS ({ORDERS_CDC_EXPECTED_SQL})
SELECT * FROM expected WHERE id % 23 != 0
"""


def cdc_replay_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay tolerance: the whole stream delivered twice (the reference
    consumer replays from OffsetOldest on every restart, utils.go:49, and
    duplicates documents, es.go:95-98 — our keyed fold is idempotent)."""
    ev = orders_cdc_events(spark, sf_dir)
    return apply_changes(ev.unionByName(ev), orders_cdc_value_schema())


def cdc_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key latest event metadata (row_number-over-offset dedup)."""
    ev = orders_cdc_events(spark, sf_dir).filter(is_valid(F.col("payload")))
    latest = latest_events(ev)
    return latest.select(
        F.col("_key").cast("long").alias("id"),
        F.col("operationType").alias("last_op"),
        F.col("offset").alias("last_offset"),
    )


CDC_LATEST_EVENT_SQL = f"""
WITH ev AS ({EVENTS_SYNTH_SQL})
SELECT id, op AS last_op, ev_offset AS last_offset
FROM (SELECT id, op, ev_offset,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY ev_offset DESC) AS rn
      FROM ev)
WHERE rn = 1
"""


def cdc_dead_letters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poison-message isolation: corrupt payloads are quarantined, not
    fatal (the reference skips with a log, utils.go:99-102; its ES errors
    kill the process, es.go:84,107,142 — ours never do)."""
    dl = dead_letters(orders_cdc_events(spark, sf_dir))
    return dl.agg(
        F.count("*").alias("n_dead"),
        F.min("offset").alias("min_offset"),
        F.max("offset").alias("max_offset"),
    )


CDC_DEAD_LETTERS_SQL = """
SELECT COUNT(*) AS n_dead,
       MIN(o_orderkey*10+6) AS min_offset,
       MAX(o_orderkey*10+6) AS max_offset
FROM orders WHERE o_orderkey % 13 = 0
"""


def cdc_multi_table_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tableName routing (one ES index per table, utils.go:105-107):
    a second table's stream interleaved with the first; each fold only
    sees its own rows."""
    from postgres_es_cdc_spark.cdc.apply import apply_all

    ev = orders_cdc_events(spark, sf_dir)
    # Second table: INSERT-only stream of even keys, routed as orders_v2.
    ev2 = (
        ev.filter((F.col("operationType") == "INSERT") & is_valid(F.col("payload")))
          .withColumn("tableName", F.lit("orders_v2"))
          .filter(F.get_json_object("payload", "$.id").cast("long") % 2 == 0)
    )
    schema = orders_cdc_value_schema()
    folded = apply_all(ev.unionByName(ev2),
                       {"orders": schema, "orders_v2": schema})
    per_table = [
        # quantized sum (see operators/common.qsum): folded prices are
        # *1.1 products — fractional-scale decimal casts of computed
        # doubles round differently across engines; integer quantization
        # at 1e4 (products have <=3 true decimals) is exact in both.
        df.agg(F.count("*").alias("n_rows"),
               (F.sum(F.round(F.col("totalprice") * 10000, 0)
                       .cast("decimal(38,0)")).cast("double") / 10000.0)
                .alias("total_price"))
          .select(F.lit(name).alias("table_name"), "n_rows", "total_price")
        for name, df in sorted(folded.items())
    ]
    out = per_table[0]
    for df in per_table[1:]:
        out = out.unionByName(df)
    return out


CDC_MULTI_TABLE_SQL = f"""
WITH expected AS ({ORDERS_CDC_EXPECTED_SQL})
SELECT 'orders' AS table_name, COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(totalprice*10000) AS HUGEINT)) AS DOUBLE)/10000.0 AS total_price
FROM expected
UNION ALL
SELECT 'orders_v2' AS table_name, COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(totalprice*10000) AS HUGEINT)) AS DOUBLE)/10000.0 AS total_price
FROM (
  -- INSERT-only stream for even keys: last INSERT wins per key.
  SELECT o_orderkey AS id,
         CASE WHEN o_orderkey % 9 = 0 AND o_orderkey % 2 = 1
              THEN o_totalprice + 1000.0 ELSE o_totalprice END AS totalprice
  FROM orders WHERE o_orderkey % 2 = 0
)
"""


def cdc_apply_changes_evolving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution under the fold: the standard stream plus late
    UPDATEs carrying a column (`vip_note`) no declared schema knows,
    applied with ``apply_changes_evolving`` — the reference gets this
    behavior from dynamic ES mappings (es.go:28-45); a fixed schema
    would silently drop the column."""
    from postgres_es_cdc_spark.catalog import table

    ev = orders_cdc_events(spark, sf_dir)
    k = F.col("o_orderkey")
    late = (table(spark, sf_dir, "orders")
            .filter(k % 11 == 0)
            .select((k * 10 + 9).cast("long").alias("offset"),
                    F.lit("UPDATE").alias("operationType"),
                    F.lit("orders").alias("tableName"),
                    F.to_json(F.struct(
                        k.cast("long").alias("id"),
                        F.lit("vip").alias("vip_note"))).alias("payload")))
    return apply_changes_evolving(ev.unionByName(late),
                                  orders_cdc_value_schema())


CDC_APPLY_EVOLVING_SQL = f"""
WITH expected AS ({ORDERS_CDC_EXPECTED_SQL})
SELECT expected.*,
       CASE WHEN id % 11 = 0 THEN 'vip' END AS vip_note
FROM expected
"""


def cdc_changelog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog observability report: per (table, operation) — event
    count, parse-failure count, distinct touched keys, and offset span.
    This is the monitoring query a CDC operator runs to spot a producer
    emitting malformed payloads or an op-mix shift (mass deletes), the
    aggregate twin of the reference's per-event logging (utils.go:99-113).

    One partial-aggregable pass over the stream: the shuffle carries a
    handful of counters per (table, op), never events. The oracle
    re-synthesizes the same closed-form stream in SQL (corrupt events
    ride the INSERT op with a NULL key, as decoded)."""
    ev = orders_cdc_events(spark, sf_dir)
    key = F.get_json_object("payload", "$.id").cast("long")
    return (
        ev.groupBy(F.col("tableName"), F.col("operationType"))
          .agg(F.count(F.lit(1)).alias("n_events"),
               F.count(F.when(~is_valid(F.col("payload")), F.lit(1)))
                .alias("n_corrupt"),
               F.countDistinct(key).alias("n_distinct_keys"),
               F.min("offset").alias("min_offset"),
               F.max("offset").alias("max_offset"))
    )


CDC_CHANGELOG_STATS_SQL = """
WITH ev AS (
  SELECT o_orderkey*10 AS ev_offset, 'INSERT' AS op, o_orderkey AS id,
         FALSE AS corrupt FROM orders
  UNION ALL SELECT o_orderkey*10+3, 'UPDATE', o_orderkey, FALSE
    FROM orders WHERE o_orderkey%5=0
  UNION ALL SELECT o_orderkey*10+4, 'UPDATE', o_orderkey, FALSE
    FROM orders WHERE o_orderkey%7=0
  UNION ALL SELECT o_orderkey*10+5, 'DELETE', o_orderkey, FALSE
    FROM orders WHERE o_orderkey%9=0
  UNION ALL SELECT o_orderkey*10+6, 'INSERT', NULL, TRUE
    FROM orders WHERE o_orderkey%13=0
  UNION ALL SELECT o_orderkey*10+7, 'INSERT', o_orderkey, FALSE
    FROM orders WHERE o_orderkey%9=0 AND o_orderkey%2=1
  UNION ALL SELECT o_orderkey*10+8, 'UPDATE', -o_orderkey, FALSE
    FROM orders WHERE o_orderkey%17=0
)
SELECT 'orders' AS tableName, op AS operationType,
       COUNT(*) AS n_events,
       COUNT(CASE WHEN corrupt THEN 1 END) AS n_corrupt,
       COUNT(DISTINCT id) AS n_distinct_keys,
       MIN(ev_offset) AS min_offset,
       MAX(ev_offset) AS max_offset
FROM ev
GROUP BY op
"""


def cdc_txn_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC observability: distribution of events-per-transaction over
    the synthesized stream (txn = offset div 10, i.e. one transaction
    per order key) — the monitoring table a pipeline watches for
    oversized transactions that would stall a transaction-atomic sink.

    The oracle is NOT a re-fold: it derives each key's event count
    directly from the closed-form event plan (generate.py module doc),
    so any drift between the generator and its documented plan breaks
    the hash. Scale: one partial-aggregable count per txn key, then a
    histogram over the tiny size domain."""
    ev = orders_cdc_events(spark, sf_dir)
    per_txn = (ev.withColumn("txn", F.expr("offset div 10"))
                 .groupBy("txn").agg(F.count(F.lit(1)).alias("n")))
    return (per_txn.groupBy(F.col("n").alias("txn_size"))
                   .agg(F.count(F.lit(1)).alias("n_txns"))
                   .orderBy("txn_size"))


CDC_TXN_SIZE_HIST_SQL = """
WITH sz AS (
  SELECT 1
       + CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END
       + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END
       + CASE WHEN o_orderkey % 9 = 0 THEN 1 ELSE 0 END
       + CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END
       + CASE WHEN o_orderkey % 9 = 0 AND o_orderkey % 2 = 1
              THEN 1 ELSE 0 END
       + CASE WHEN o_orderkey % 17 = 0 THEN 1 ELSE 0 END AS n
  FROM orders
)
SELECT n AS txn_size, COUNT(*) AS n_txns FROM sz GROUP BY 1
"""


# Closed-form expected state of cdc_schema_evolution_fold: every order
# INSERTed under relation v1 (3 columns), priority added by relation v2
# and set only for id % 3 == 0 — never-updated rows surface NULL (the
# putAll key-absent contract under DDL drift).
CDC_SCHEMA_EVOLUTION_SQL = """
SELECT o_orderkey AS id,
       o_custkey AS custkey,
       o_orderstatus AS status,
       CASE WHEN o_orderkey % 3 = 0 THEN 'P-' || o_orderpriority END
         AS priority
FROM orders
"""


def cdc_truncate_restart_fold(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """TRUNCATE honored mid-stream — the reference silently drops
    TruncateMessage (producer.go:162-166), so truncating the source
    table leaves its sink permanently desynchronized; here the fold
    discards every event below the truncate offset (A11, one broadcast
    scalar into the scan filter). Plan: INSERT every order, TRUNCATE,
    then re-INSERT only o_orderkey % 4 == 0 with a new status — the
    final state must contain exactly the re-inserted quarter, no
    survivors from before the wipe."""
    from pyspark.sql.types import _parse_datatype_string

    from postgres_es_cdc_spark.catalog import table
    from postgres_es_cdc_spark.cdc.apply import apply_changes_with_truncate

    schema = _parse_datatype_string("id long, custkey long, status string")
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    pay = lambda status: F.to_json(F.struct(  # noqa: E731
        k.cast("long").alias("id"),
        F.col("o_custkey").cast("long").alias("custkey"),
        status.alias("status")), {"ignoreNullFields": "false"})
    ins1 = o.select((k * 10).cast("long").alias("offset"),
                    F.lit("INSERT").alias("operationType"),
                    pay(F.col("o_orderstatus")).alias("payload"))
    trunc = spark.createDataFrame(
        [(10 ** 9, "TRUNCATE", None)],
        "offset long, operationType string, payload string")
    ins2 = (o.filter(k % 4 == 0)
             .select((F.lit(10 ** 9 + 1) + k).cast("long").alias("offset"),
                     F.lit("INSERT").alias("operationType"),
                     pay(F.lit("R2")).alias("payload")))
    events = ins1.unionByName(trunc).unionByName(ins2)
    return apply_changes_with_truncate(events, schema)


CDC_TRUNCATE_SQL = """
SELECT o_orderkey AS id, o_custkey AS custkey, 'R2' AS status
FROM orders WHERE o_orderkey % 4 = 0
"""
