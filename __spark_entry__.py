"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``postgres_es_cdc_spark`` engine: a PySpark-native
re-expression of the reference CDC pipeline
(nitin-kumar-verma/postgres-es-cdc) plus the [EXT] relational and
LLM-data-pipeline surface. See SURVEY.md §2 for the inventory and
postgres_es_cdc_spark/queries.py for the registry behind these hooks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Ensure the engine package resolves even if this module is imported by
# file path rather than from the repo root.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: the CDC apply_changes fold — the
    reference consumer's whole semantics (es.go:47-144) as one
    shuffle-by-key DataFrame program."""
    from postgres_es_cdc_spark.cdc.queries import cdc_apply_changes

    return cdc_apply_changes(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from postgres_es_cdc_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from postgres_es_cdc_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
