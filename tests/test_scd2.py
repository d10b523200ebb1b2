"""Unit tests for SCD2 history (cdc/scd2.py) — version-row semantics
pinned against hand-computed histories (reference fold semantics:
es.go:56 putAll merge, es.go:52 orphan no-op, es.go:95-98 reinsert)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql.types import _parse_datatype_string

from postgres_es_cdc_spark.cdc.scd2 import scd2_history

SCHEMA = "id long, name string, qty long"


def _history(spark, rows):
    """rows: (offset, op, payload-dict). Presence = the dict's keys."""
    data = [Row(offset=o, operationType=op,
                payload=Row(id=p.get("id"), name=p.get("name"),
                            qty=p.get("qty")),
                payload_fields=sorted(p.keys()))
            for o, op, p in rows]
    schema = _parse_datatype_string(
        "offset long, operationType string, "
        "payload struct<id:long,name:string,qty:long>, "
        "payload_fields array<string>")
    df = scd2_history(spark.createDataFrame(data, schema),
                      _parse_datatype_string(SCHEMA))
    return [(r.id, r.name, r.qty, r.valid_from, r.valid_to, r.is_current,
             r.version_op)
            for r in df.orderBy("id", "valid_from").collect()]


def test_insert_update_chain_versions(spark):
    h = _history(spark, [
        (1, "INSERT", {"id": 1, "name": "a", "qty": 2}),
        (2, "UPDATE", {"id": 1, "qty": 7}),
        (3, "UPDATE", {"id": 1, "name": None}),  # explicit null
    ])
    assert h == [
        (1, "a", 2, 1, 2, False, "INSERT"),
        (1, "a", 7, 2, 3, False, "UPDATE"),   # absent name unchanged
        (1, None, 7, 3, None, True, "UPDATE"),  # null SET, qty carried
    ]


def test_delete_closes_validity_without_version(spark):
    h = _history(spark, [
        (1, "INSERT", {"id": 1, "name": "a", "qty": 2}),
        (2, "DELETE", {"id": 1}),
    ])
    assert h == [(1, "a", 2, 1, 2, False, "INSERT")]


def test_delete_then_reinsert_resets_merge_state(spark):
    h = _history(spark, [
        (1, "INSERT", {"id": 1, "name": "a", "qty": 2}),
        (2, "UPDATE", {"id": 1, "qty": 9}),
        (3, "DELETE", {"id": 1}),
        (4, "INSERT", {"id": 1, "name": "b"}),  # sparse reinsert
    ])
    assert h == [
        (1, "a", 2, 1, 2, False, "INSERT"),
        (1, "a", 9, 2, 3, False, "UPDATE"),
        # qty resets to NULL: new document, not a merge (es.go:95-98)
        (1, "b", None, 4, None, True, "INSERT"),
    ]


def test_orphan_updates_emit_nothing(spark):
    h = _history(spark, [
        (1, "UPDATE", {"id": 5, "qty": 1}),        # before any insert
        (2, "INSERT", {"id": 1, "name": "a", "qty": 2}),
        (3, "DELETE", {"id": 1}),
        (4, "UPDATE", {"id": 1, "qty": 8}),        # after delete
    ])
    assert h == [(1, "a", 2, 2, 3, False, "INSERT")]


def test_reinsert_without_delete_resets_like_new_doc(spark):
    h = _history(spark, [
        (1, "INSERT", {"id": 1, "name": "a", "qty": 2}),
        (2, "INSERT", {"id": 1, "name": "b"}),
    ])
    assert h == [
        (1, "a", 2, 1, 2, False, "INSERT"),
        (1, "b", None, 2, None, True, "INSERT"),
    ]


def test_single_shuffle_plan(spark):
    """The whole history fold must reuse ONE hash partitioning on the
    key: exactly one Exchange in the physical plan (the windows chain)."""
    rows = [(i, "INSERT", {"id": i % 4, "name": "x", "qty": i})
            for i in range(1, 9)]
    data = [Row(offset=o, operationType=op,
                payload=Row(id=p["id"], name=p["name"], qty=p["qty"]),
                payload_fields=["id", "name", "qty"])
            for o, op, p in rows]
    schema = _parse_datatype_string(
        "offset long, operationType string, "
        "payload struct<id:long,name:string,qty:long>, "
        "payload_fields array<string>")
    df = scd2_history(spark.createDataFrame(data, schema),
                      _parse_datatype_string(SCHEMA))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
