"""Initial-snapshot source frontend for the CDC pipeline.

The reference starts logical replication at the CURRENT WAL position
with no initial snapshot (producer.go:50,60: ``CREATE_REPLICATION_SLOT
... TEMPORARY`` + ``START_REPLICATION``), so rows that existed before
the producer started never reach the sink. This module closes that loop
the Spark way: a one-shot batch read of the source table (Spark's JDBC
reader against Postgres in production; parquet in this sandbox), turned
into synthetic full-row INSERT events at an offset BELOW every stream
offset, so the existing ``apply_changes`` fold layers the change stream
on top of the snapshot with no special cases — stream events for a key
override its snapshot row per the ordinary per-column rules.

The JDBC path uses only the public Spark DataSource option surface
(format "jdbc" with url/dbtable/partitionColumn/numPartitions — the
standard parallel-snapshot recipe); nothing here depends on a live
database, and tests exercise the parquet format end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from postgres_es_cdc_spark.cdc.apply import apply_changes

# Snapshot rows sort below every stream offset (Kafka offsets are >= 0).
SNAPSHOT_OFFSET = -1


@dataclass
class SnapshotSource:
    """A batch snapshot described by a Spark DataSource format + options.

    ``fmt='jdbc'`` with ``{"url": "jdbc:postgresql://...", "dbtable":
    "public.orders", "partitionColumn": "o_orderkey", "lowerBound": ...,
    "upperBound": ..., "numPartitions": "32"}`` is the production,
    parallel-read shape (each executor reads one key range — the scan
    scales with the cluster, not the driver). ``fmt='parquet'`` with
    ``{"path": ...}`` is the sandbox/test shape. ``column_map`` renames
    source columns into the CDC payload's column names.
    """

    fmt: str
    options: dict[str, str] = field(default_factory=dict)
    column_map: dict[str, str] = field(default_factory=dict)

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format(self.fmt)
        opts = dict(self.options)
        path = opts.pop("path", None)
        for k, v in opts.items():
            reader = reader.option(k, v)
        df = reader.load(path) if path is not None else reader.load()
        if self.column_map:
            df = df.select(*[F.col(src).alias(dst)
                             for src, dst in self.column_map.items()])
        return df


def snapshot_as_events(snapshot: DataFrame, table_name: str,
                       offset: int = SNAPSHOT_OFFSET) -> DataFrame:
    """Full-row INSERT envelope events from a snapshot DataFrame.

    Explicit nulls are kept in the JSON (``ignoreNullFields=false``) so a
    null snapshot cell means "set null", matching the wire semantics
    (producer.go:186-187)."""
    return snapshot.select(
        F.lit(offset).cast("long").alias("offset"),
        F.lit("INSERT").alias("operationType"),
        F.lit(table_name).alias("tableName"),
        F.to_json(F.struct(*[F.col(c) for c in snapshot.columns]),
                  {"ignoreNullFields": "false"}).alias("payload"),
    )


def snapshot_then_stream(spark: SparkSession, source: SnapshotSource,
                         stream_events: DataFrame, value_schema: StructType,
                         table_name: str = "orders",
                         key: str = "id") -> DataFrame:
    """Bootstrap fold: snapshot INSERTs at offset -1 unioned below the
    change stream, one ``apply_changes`` pass over both. Equivalent to
    sequentially applying the snapshot then each change in order, but as
    a single partial-agg fold — no ordering pass, no driver loop."""
    snap = snapshot_as_events(source.load(spark), table_name)
    return apply_changes(snap.unionByName(stream_events), value_schema,
                         key=key)
