"""Engine facade: the reference's process model as one entry point.

The reference dispatches on MODE into producer/consumer processes
(main.go:5-13) configured from .env (utils.go:119-165: PG_CONNECTION_URL,
KAFKA_URL, ES_URL/ES_USERNAME/ES_PASSWORD, MODE). Here both halves are
Spark jobs over the same SparkSession:

  * ``run("produce")``  — source CDC events and publish to the Kafka topic
    (the reference's producer half; in Spark the WAL-decode work is done
    by whatever CDC connector feeds the topic — e.g. Debezium — so
    "produce" forwards an event DataFrame to Kafka with checkpointing,
    fixing the reference's fire-and-forget loss window utils.go:84-89).
  * ``run("consume")`` — read the topic and fold into materialized state
    (the consumer half: utils.go:92-117 + es.go as one foreachBatch).

Config comes from the environment with the same variable names the
reference uses, so a reference deployment's .env maps 1:1.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from postgres_es_cdc_spark.streaming.pipeline import (
    UpsertSink, kafka_event_stream, run_cdc_pipeline)

MODE_PRODUCER = "PRODUCER"   # utils.go MODE values
MODE_CONSUMER = "CONSUMER"


@dataclass
class AppConfig:
    """utils.go:119-165 analog. Missing required keys raise (the
    reference panics; we raise ValueError with the key name)."""

    mode: str = ""
    kafka_url: str = ""
    kafka_topic: str = "CDC"          # utils.go:31
    pg_connection_url: str = ""       # producer-side (source connector)
    es_url: str = ""                  # consumer-side ES sink (optional)
    es_username: str = ""
    es_password: str = ""
    state_dir: str = "/tmp/cdc_state"
    checkpoint_dir: str = "/tmp/cdc_checkpoint"
    extras: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "AppConfig":
        e = dict(os.environ) if env is None else env
        cfg = cls(
            mode=e.get("MODE", ""),
            kafka_url=e.get("KAFKA_URL", ""),
            kafka_topic=e.get("KAFKA_TOPIC", "CDC"),
            pg_connection_url=e.get("PG_CONNECTION_URL", ""),
            es_url=e.get("ES_URL", ""),
            es_username=e.get("ES_USERNAME", ""),
            es_password=e.get("ES_PASSWORD", ""),
            state_dir=e.get("CDC_STATE_DIR", "/tmp/cdc_state"),
            checkpoint_dir=e.get("CDC_CHECKPOINT_DIR", "/tmp/cdc_checkpoint"),
        )
        if not cfg.mode:
            raise ValueError("MODE is required (PRODUCER | CONSUMER)")  # utils.go:127-129
        if not cfg.kafka_url:
            raise ValueError("KAFKA_URL is required")                   # utils.go:131-134
        if cfg.mode == MODE_PRODUCER and not cfg.pg_connection_url:
            raise ValueError("PG_CONNECTION_URL is required in PRODUCER mode")
        return cfg


def publish_events(events: DataFrame, cfg: AppConfig,
                   checkpoint_dir: str | None = None):
    """Producer half: envelope rows -> JSON -> Kafka topic, checkpointed
    and acked (fixes A14's swallowed send errors, utils.go:84-89)."""
    from pyspark.sql import functions as F

    payload = F.to_json(F.struct(
        F.col("operationType"), F.col("tableName"), F.col("payload")),
        {"ignoreNullFields": "false"})
    out = events.select(payload.alias("value"))
    writer = (
        out.writeStream.format("kafka")
           .option("kafka.bootstrap.servers", cfg.kafka_url)
           .option("topic", cfg.kafka_topic)
           .option("checkpointLocation", checkpoint_dir or cfg.checkpoint_dir)
    )
    return writer.start()


def run(spark: SparkSession, cfg: AppConfig,
        schemas: dict[str, StructType],
        events: DataFrame | None = None):
    """main.go:5-13 analog: dispatch on mode.

    PRODUCER forwards ``events`` (from a CDC source connector) to Kafka;
    CONSUMER folds the Kafka topic into materialized per-table state.
    """
    if cfg.mode == MODE_PRODUCER:
        if events is None:
            raise ValueError("PRODUCER mode needs an event DataFrame "
                             "(a CDC source connector's output)")
        return publish_events(events, cfg)
    if cfg.mode == MODE_CONSUMER:
        stream = kafka_event_stream(spark, cfg.kafka_url, cfg.kafka_topic)
        sink = UpsertSink(cfg.state_dir, schemas)
        return run_cdc_pipeline(stream, sink, cfg.checkpoint_dir,
                                trigger_once=False)
    raise ValueError(f"unknown MODE {cfg.mode!r}")  # main.go default: no-op
