"""Deterministic CDC event synthesis from the ``orders`` test table.

The driver provides no CDC event stream, so we derive one — in pure
DataFrame expressions, fully deterministic in ``o_orderkey`` — that
exercises every behavior of the reference consumer (FIXTURES.md §B):
full-row INSERTs (producer.go:129-133), sparse partial UPDATEs
(producer.go:143 + es.go:56 putAll), explicit-null updates
(producer.go:186-187), PK-only DELETEs (producer.go:155, es.go:117),
delete-then-reinsert ordering, updates to nonexistent keys
(update_by_query no-op), and corrupt payloads (utils.go:99-102).

Because the derivation is closed-form, the *expected final state* is
expressible as a plain CASE projection over ``orders`` — giving the
DuckDB oracle an independent computation of what ``apply_changes`` must
produce (a stronger check than folding the same events twice).

Event plan per order key k (offsets keep every event globally ordered):
  k*10+0  INSERT  full row {id,custkey,status,totalprice,priority}
  k*10+3  UPDATE  {id, totalprice: totalprice*1.1}        if k%5==0
  k*10+4  UPDATE  {id, priority: null}   (explicit null)  if k%7==0
  k*10+5  DELETE  {id}                                    if k%9==0
  k*10+6  corrupt payload '{oops'                         if k%13==0
  k*10+7  INSERT  reinsert, status='R', totalprice+1000   if k%9==0 and k odd
  k*10+8  UPDATE  {id: -k, ...} (key never inserted)      if k%17==0
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from postgres_es_cdc_spark.catalog import scan_parallel, table

# Target-table value schema for the synthesized stream (generic CDC target).
ORDERS_CDC_SCHEMA = (
    "id long, custkey long, status string, totalprice double, priority string"
)

# Keep explicit nulls in payloads: JSON null means "set to null"
# (producer.go:186-187); an *absent* key means "unchanged" (es.go:56).
_J = {"ignoreNullFields": "false"}


def _base_orders(spark, sf_dir: str) -> DataFrame:
    """The orders scan fanned out for event synthesis. The sf tables are
    single small parquet files (one scan partition), which would leave
    the ~10x explode + payload encode serial on one core; real CDC
    sources arrive pre-partitioned, so this repartition is generator-only
    — the fold itself never repartitions. Projection happens BEFORE the
    exchange so only the five payload columns cross the wire."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    return scan_parallel(spark, o)


def orders_cdc_events(spark, sf_dir: str) -> DataFrame:
    """Synthesize the ordered event stream for table 'orders'."""
    o = _base_orders(spark, sf_dir).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_orderpriority").alias("priority"),
    )

    k = F.col("k")

    def ev(cond, offset, op, payload):
        """One conditional event as a nullable struct element."""
        e = F.struct(offset.cast("long").alias("offset"),
                     F.lit(op).alias("operationType"),
                     payload.alias("payload"))
        return e if cond is None else F.when(cond, e)

    # Single parquet scan: each order row emits its whole event subset as
    # an array (nulls filtered), exploded — no 7-way union of re-scans.
    events = F.array(
        ev(None, k * 10, "INSERT",
           F.to_json(F.struct(
               k.alias("id"), F.col("custkey"), F.col("status"),
               F.col("totalprice"), F.col("priority")), _J)),
        ev(k % 5 == 0, k * 10 + 3, "UPDATE",
           F.to_json(F.struct(
               k.alias("id"),
               (F.col("totalprice") * F.lit(1.1)).alias("totalprice")), _J)),
        ev(k % 7 == 0, k * 10 + 4, "UPDATE",
           F.to_json(F.struct(
               k.alias("id"),
               F.lit(None).cast("string").alias("priority")), _J)),
        ev(k % 9 == 0, k * 10 + 5, "DELETE",
           F.to_json(F.struct(k.alias("id")), _J)),
        ev(k % 13 == 0, k * 10 + 6, "INSERT", F.lit("{oops")),
        ev((k % 9 == 0) & (k % 2 == 1), k * 10 + 7, "INSERT",
           F.to_json(F.struct(
               k.alias("id"), F.col("custkey"), F.lit("R").alias("status"),
               (F.col("totalprice") + F.lit(1000.0)).alias("totalprice"),
               F.col("priority")), _J)),
        ev(k % 17 == 0, k * 10 + 8, "UPDATE",
           F.to_json(F.struct((-k).alias("id"),
                              F.lit("ORPHAN").alias("status")), _J)),
    )
    return (
        o.select(F.explode(F.filter(events, lambda e: e.isNotNull())).alias("e"))
         .select(F.col("e.offset").alias("offset"),
                 F.col("e.operationType").alias("operationType"),
                 F.lit("orders").alias("tableName"),
                 F.col("e.payload").alias("payload"))
    )


def orders_cdc_events_typed(spark, sf_dir: str) -> DataFrame:
    """The SAME event plan as ``orders_cdc_events`` but with a native
    typed payload struct + presence array (the zero-serde path consumed
    by ``apply_changes_typed``). Corrupt-JSON events are unrepresentable
    here (a typed feed has no parse failures), and they never contribute
    to final state, so the expected-state oracle is unchanged."""
    o = _base_orders(spark, sf_dir).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_orderpriority").alias("priority"),
    )
    k = F.col("k")
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("long")

    def payload(id_col, custkey, status, totalprice, priority, fields):
        return F.struct(
            F.struct(id_col.cast("long").alias("id"),
                     custkey.cast("long").alias("custkey"),
                     status.alias("status"),
                     totalprice.alias("totalprice"),
                     priority.alias("priority")).alias("p"),
            F.array(*[F.lit(f) for f in fields]).alias("f"))

    def ev(cond, offset, op, pay):
        e = F.struct(offset.cast("long").alias("offset"),
                     F.lit(op).alias("operationType"),
                     pay.alias("pf"))
        return e if cond is None else F.when(cond, e)

    events = F.array(
        ev(None, k * 10, "INSERT",
           payload(k, F.col("custkey"), F.col("status"), F.col("totalprice"),
                   F.col("priority"),
                   ["id", "custkey", "status", "totalprice", "priority"])),
        ev(k % 5 == 0, k * 10 + 3, "UPDATE",
           payload(k, null_l, null_s, F.col("totalprice") * F.lit(1.1),
                   null_s, ["id", "totalprice"])),
        ev(k % 7 == 0, k * 10 + 4, "UPDATE",
           payload(k, null_l, null_s, null_d, null_s, ["id", "priority"])),
        ev(k % 9 == 0, k * 10 + 5, "DELETE",
           payload(k, null_l, null_s, null_d, null_s, ["id"])),
        ev((k % 9 == 0) & (k % 2 == 1), k * 10 + 7, "INSERT",
           payload(k, F.col("custkey"), F.lit("R"),
                   F.col("totalprice") + F.lit(1000.0), F.col("priority"),
                   ["id", "custkey", "status", "totalprice", "priority"])),
        ev(k % 17 == 0, k * 10 + 8, "UPDATE",
           payload(-k, null_l, F.lit("ORPHAN"), null_d, null_s,
                   ["id", "status"])),
    )
    return (
        o.select(F.explode(F.filter(events, lambda e: e.isNotNull())).alias("e"))
         .select(F.col("e.offset").alias("offset"),
                 F.col("e.operationType").alias("operationType"),
                 F.lit("orders").alias("tableName"),
                 F.col("e.pf.p").alias("payload"),
                 F.col("e.pf.f").alias("payload_fields"))
    )


# DuckDB SQL computing the expected final state of the stream above,
# independently of apply_changes (CASE projection over orders).
ORDERS_CDC_EXPECTED_SQL = """
SELECT o_orderkey AS id,
       o_custkey AS custkey,
       CASE WHEN o_orderkey % 9 = 0 THEN 'R' ELSE o_orderstatus END AS status,
       CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice + 1000.0
            WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
            ELSE o_totalprice END AS totalprice,
       CASE WHEN o_orderkey % 9 = 0 THEN o_orderpriority
            WHEN o_orderkey % 7 = 0 THEN NULL
            ELSE o_orderpriority END AS priority
FROM orders
WHERE NOT (o_orderkey % 9 = 0 AND o_orderkey % 2 = 0)
"""


def orders_cdc_value_schema() -> StructType:
    from pyspark.sql.types import _parse_datatype_string
    return _parse_datatype_string(ORDERS_CDC_SCHEMA)
