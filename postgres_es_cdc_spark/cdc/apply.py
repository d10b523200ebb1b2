"""``apply_changes`` — the engine's flagship operator.

The reference's whole consumer is a streaming upsert-materializer: fold
the ordered event log into latest-state-per-id per table, where
  INSERT  -> index a document                        (es.go:88-110)
  UPDATE  -> ``ctx._source.putAll(params.data)`` — a *partial merge*:
             keys present in the payload overwrite (including explicit
             nulls), absent keys are untouched      (es.go:47-86, :56)
  DELETE  -> delete_by_query on id                  (es.go:112-144)
applied one HTTP call per event in arrival order (utils.go:92-117).

Spark-first formulation (batch; the streaming frontend reuses it via
``foreachBatch``): one hash-shuffle by key, then pure column expressions —
no UDFs, no per-event loop, no driver-side state.

  1. reset point  = max offset of any non-UPDATE event per key
                    (INSERT replaces the document wholesale under keyed
                    upsert semantics — fixing the reference's
                    duplicate-on-replay bug es.go:95-98; DELETE empties it).
  2. live events  = events at/after the reset point (updates that arrived
                    before the last INSERT/DELETE can never affect final
                    state; updates after a DELETE match nothing, exactly
                    like update_by_query on a deleted id).
  3. final value per column = value from the latest live event whose
                    payload *contains* that key (presence map — see
                    envelope.py), via ``max_by`` over a struct ordering.
  4. key survives iff the reset event is an INSERT.

Scale notes: the window (partitionBy key, no orderBy => single shuffle)
and the following groupBy share the same hash partitioning, so Catalyst
plans exactly one Exchange. Skewed keys are handled by AQE skew-join
settings; there is no driver-side collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from postgres_es_cdc_spark.cdc.envelope import OP_INSERT, OP_UPDATE


def latest_events(events: DataFrame, key: str = "id",
                  order_col: str = "offset") -> DataFrame:
    """Per (tableName, key): the single latest event (row_number = 1).

    The reference gets this ordering implicitly from single-partition
    Kafka (utils.go:49); we recover it per-key with a window — per-key
    order is all the fold needs, and per-key is what scales.
    """
    keyc = F.get_json_object("payload", f"$.{key}").alias("_key")
    w = Window.partitionBy("tableName", "_key").orderBy(F.desc(order_col))
    return (
        events.withColumn("_key", keyc)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changes(events: DataFrame, value_schema: StructType,
                  key: str = "id", order_col: str = "offset",
                  version_col: str | None = None) -> DataFrame:
    """Fold a single table's event stream into its final state.

    ``events``: flat envelope rows (offset, operationType, payload[, ...]).
    Returns one row per surviving key with the columns of ``value_schema``;
    if ``version_col`` is given, adds the max contributing offset per row
    (the row's materialized version — what an incremental sink stores so
    the next micro-batch folds against correctly-ordered prior state).
    """
    value_cols = [f.name for f in value_schema.fields]
    if key not in value_cols:
        raise ValueError(f"key column {key!r} missing from value schema")
    types = {f.name: f.dataType.simpleString() for f in value_schema.fields}

    # Single JSON parse: the presence map doubles as the value source —
    # typed values are casts of the map entries (payload rows are flat,
    # producer.go:129-133, so string->type casts are lossless). This
    # halves the JSON decode cost vs a second from_json to the struct.
    ev = events.withColumn("_present", F.from_json("payload", "map<string,string>"))
    # Corrupt payloads: skip (utils.go:99-102) — dead_letters() exposes them.
    ev = ev.filter(F.col("_present").isNotNull())
    ev = ev.select(
        F.col(order_col).cast("long").alias("_off"),
        F.col("operationType").alias("_op"),
        F.col("_present")[key].cast(types[key]).alias(key),
        "_present",
    ).filter(F.col(key).isNotNull())

    # Reset point per key: the one required shuffle.
    w = Window.partitionBy(key)
    ev = ev.withColumn(
        "_reset", F.max(F.when(F.col("_op") != OP_UPDATE, F.col("_off"))).over(w)
    )
    # Keys that only ever saw UPDATEs have _reset null -> filtered, matching
    # update_by_query against a nonexistent doc (a no-op).
    live = ev.filter(F.col("_off") >= F.col("_reset"))

    per_col = [
        F.max(
            F.when(F.map_contains_key("_present", c),
                   F.struct(F.col("_off"),
                            F.col("_present")[c].cast(types[c]).alias("v")))
        )["v"].alias(c)
        for c in value_cols if c != key
    ]
    # Only non-UPDATE events can define the reset op: an UPDATE sharing
    # the reset offset (e.g. a replayed event tying the stored state
    # version in an incremental sink) must not shadow the INSERT.
    base_op = F.max(
        F.when((F.col("_off") == F.col("_reset")) & (F.col("_op") != OP_UPDATE),
               F.col("_op"))
    ).alias("_base_op")

    aggs = [base_op, *per_col]
    out_cols = list(value_cols)
    if version_col is not None:
        aggs.append(F.max("_off").alias(version_col))
        out_cols.append(version_col)
    state = live.groupBy(key).agg(*aggs)
    return state.filter(F.col("_base_op") == OP_INSERT).drop("_base_op").select(*out_cols)


def apply_all(events: DataFrame, schemas: dict[str, StructType],
              key: str = "id", order_col: str = "offset") -> dict[str, DataFrame]:
    """Route a mixed-table event stream (utils.go:105-112: one ES index per
    tableName) and fold each table independently."""
    return {
        name: apply_changes(
            events.filter(F.col("tableName") == name), schema, key, order_col
        )
        for name, schema in schemas.items()
    }
