"""The CDC change-event envelope.

Mirrors the reference's one first-class data structure
(``DatabaseEvent{operationType, tableName, payload}``, utils.go:22-26,
JSON-marshalled at utils.go:74 onto Kafka topic "CDC" partition 0,
utils.go:31/49). The single-partition Kafka offset / WAL LSN
(producer.go:171) becomes an explicit ``offset`` long column — the total
order key.

Spark-first decode: ``from_json`` twice —
  * once with the target table's StructType for typed values, and
  * once as ``map<string,string>`` for *key presence*, because the
    reference distinguishes "column absent from payload" (unchanged —
    the pgoutput 'u' TOAST marker is skipped, producer.go:185-194, and
    ES ``putAll`` leaves absent fields alone, es.go:56) from "column
    explicitly null" (set to null, producer.go:186-187). ``from_json`` to
    a struct collapses both to null; the map keeps the key.

Corrupt payloads (unmarshal failure is skipped in the reference,
utils.go:99-102) decode to a null map and are routed to a dead-letter
DataFrame instead of killing the stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

# Wire envelope: utils.go:22-26 + the Kafka offset as order key (utils.go:49).
EVENT_SCHEMA = StructType([
    StructField("offset", LongType(), False),
    StructField("operationType", StringType(), False),
    StructField("tableName", StringType(), False),
    StructField("payload", StringType(), True),
])

OP_INSERT = "INSERT"   # utils.go:34
OP_UPDATE = "UPDATE"   # utils.go:35
OP_DELETE = "DELETE"   # utils.go:36


def parse_envelope(raw: DataFrame, value_col: str = "value",
                   offset_col: str = "offset") -> DataFrame:
    """Kafka-shaped (binary value + offset) -> flat envelope columns."""
    env = F.from_json(F.col(value_col).cast("string"),
                      "operationType string, tableName string, payload string")
    return raw.select(
        F.col(offset_col).cast("long").alias("offset"),
        env["operationType"].alias("operationType"),
        env["tableName"].alias("tableName"),
        env["payload"].alias("payload"),
    )


def decode_events(events: DataFrame, value_schema: StructType) -> DataFrame:
    """Attach typed values + presence map to a flat envelope DataFrame.

    Adds ``_v`` (struct of ``value_schema``) and ``_present``
    (map<string,string>; key present <=> key present in the JSON payload,
    even when its value is JSON null).
    """
    return events.withColumn(
        "_v", F.from_json("payload", value_schema)
    ).withColumn(
        "_present", F.from_json("payload", "map<string,string>")
    )


def dead_letters(events: DataFrame) -> DataFrame:
    """Events whose payload failed to parse (reference: skipped with a log,
    utils.go:99-102). Kept queryable instead of dropped."""
    parsed = events.withColumn("_present", F.from_json("payload", "map<string,string>"))
    return parsed.filter(F.col("_present").isNull()).drop("_present")


def is_valid(col_payload: Column) -> Column:
    return F.from_json(col_payload, "map<string,string>").isNotNull()
