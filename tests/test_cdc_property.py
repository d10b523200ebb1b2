"""Property test: apply_changes == a sequential one-event-at-a-time fold.

The reference's implicit contract is observational: after consuming the
ordered event log, the store holds exactly what applying each event in
sequence would produce (utils.go:92-117 + es.go:47-144). We pin that
against a direct Python simulation of the ES-side semantics over many
pseudo-random event sequences (deterministic seed), all folded in ONE
Spark job (keys partition the scenarios).
"""

from __future__ import annotations

import json
import random

from pyspark.sql import Row

from postgres_es_cdc_spark.cdc.apply import apply_changes
from postgres_es_cdc_spark.cdc.envelope import EVENT_SCHEMA

COLS = ("name", "qty", "price")


def _reference_fold(events):
    """The ES consumer, simulated: dict of id -> doc (es.go semantics)."""
    store: dict[int, dict] = {}
    for _off, op, payload in sorted(events):
        doc = json.loads(payload)
        key = doc["id"]
        if op == "INSERT":
            # keyed upsert: fresh document with exactly the payload fields
            store[key] = {c: doc.get(c) for c in COLS}
        elif op == "UPDATE":
            if key in store:  # update_by_query on missing id: no-op
                for c in COLS:
                    if c in doc:  # absent = unchanged; null = set null
                        store[key][c] = doc[c]
        elif op == "DELETE":
            store.pop(key, None)
    return store


def _gen_events(rng: random.Random, key: int, n: int):
    events = []
    offsets = rng.sample(range(1, 1000), n)
    for off in offsets:
        op = rng.choice(["INSERT", "INSERT", "UPDATE", "UPDATE", "UPDATE", "DELETE"])
        if op == "INSERT":
            doc = {"id": key, "name": rng.choice(["a", "b", None]),
                   "qty": rng.randrange(100), "price": rng.randrange(100) / 4.0}
            # sometimes sparse inserts
            if rng.random() < 0.3:
                doc.pop(rng.choice(COLS))
        elif op == "UPDATE":
            doc = {"id": key}
            for c in COLS:
                if rng.random() < 0.5:
                    doc[c] = None if rng.random() < 0.2 else (
                        rng.choice(["x", "y"]) if c == "name"
                        else rng.randrange(100) if c == "qty"
                        else rng.randrange(100) / 4.0)
        else:
            doc = {"id": key}
        events.append((off, op, json.dumps(doc)))
    return events


def test_apply_changes_matches_sequential_fold(spark):
    rng = random.Random(42)
    all_events = []
    expected: dict[int, dict] = {}
    for key in range(1, 151):  # 150 independent scenarios
        evs = _gen_events(rng, key, rng.randrange(1, 12))
        all_events.extend(evs)
        expected.update(_reference_fold(evs))

    rng.shuffle(all_events)  # arrival order != offset order
    df = spark.createDataFrame(
        [Row(offset=o, operationType=op, tableName="t", payload=p)
         for o, op, p in all_events], EVENT_SCHEMA)
    from pyspark.sql.types import _parse_datatype_string

    folded = apply_changes(
        df, _parse_datatype_string("id long, name string, qty long, price double"))
    got = {r.id: {"name": r.name, "qty": r.qty, "price": r.price}
           for r in folded.collect()}
    assert got == expected
