"""postgres_es_cdc_spark — a PySpark-native analytics/CDC engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference CDC pipeline ``nitin-kumar-verma/postgres-es-cdc`` (Postgres
logical replication -> Kafka -> Elasticsearch; see /root/reference,
``producer.go``/``consumer.go``/``utils.go``/``es.go``), extended with the
relational query surface and LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) that a 100 TB
training-data platform needs.

Design stance (SURVEY.md §7): everything is declarative DataFrame/SQL so
Catalyst/Tungsten/AQE do the physical planning; the only bespoke operator
logic is the CDC ``apply_changes`` fold (window + keyed merge), which the
reference implements as per-event Elasticsearch HTTP calls
(``es.go:47-144``) and we implement as one shuffle-by-key DataFrame
program.
"""

__version__ = "0.1.0"

from postgres_es_cdc_spark.session import get_spark  # noqa: F401
