"""rotate_by_correctness invariants — this silently controls which 50
queries the driver evaluates; a regression here wastes an entire round."""

from __future__ import annotations

import json

from postgres_es_cdc_spark.queries import (
    QuerySpec, query_fingerprint, rotate_by_correctness)


def _spec(tag: str) -> QuerySpec:
    return QuerySpec(lambda spark, sf_dir: None, f"SELECT '{tag}'")


def _registry(*names: str) -> dict[str, QuerySpec]:
    return {n: _spec(n) for n in names}


def _write_artifact(tmp_path, rnd: int, rows: dict[str, bool]) -> None:
    data = {n: {"rows_match": ok, "schema_match": ok, "hash_match": ok,
                "err": None}
            for n, ok in rows.items()}
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(data))


def _write_ledger(tmp_path, registry, names) -> None:
    ledger = {n: query_fingerprint(registry[n]) for n in names}
    (tmp_path / "QUERY_FINGERPRINTS.json").write_text(json.dumps(ledger))


def test_identity_with_no_artifacts(tmp_path):
    reg = _registry("a", "b", "c")
    assert list(rotate_by_correctness(reg, str(tmp_path))) == ["a", "b", "c"]


def test_fronts_exactly_the_non_green_set(tmp_path):
    reg = _registry("a", "b", "c", "d", "e")
    _write_artifact(tmp_path, 1, {"b": True, "d": True, "x_gone": True})
    _write_ledger(tmp_path, reg, ["b", "d"])
    rotated = list(rotate_by_correctness(reg, str(tmp_path)))
    assert rotated == ["a", "c", "e", "b", "d"]


def test_failed_rows_do_not_count_as_green(tmp_path):
    reg = _registry("a", "b")
    _write_artifact(tmp_path, 1, {"a": False, "b": True})
    _write_ledger(tmp_path, reg, ["a", "b"])
    assert list(rotate_by_correctness(reg, str(tmp_path))) == ["a", "b"]


def test_stable_order_within_both_groups(tmp_path):
    reg = _registry("q1", "q2", "q3", "q4", "q5", "q6")
    _write_artifact(tmp_path, 1, {"q2": True, "q5": True})
    _write_artifact(tmp_path, 2, {"q1": True})
    _write_ledger(tmp_path, reg, ["q1", "q2", "q5"])
    rotated = list(rotate_by_correctness(reg, str(tmp_path)))
    assert rotated == ["q3", "q4", "q6", "q1", "q2", "q5"]


def test_union_across_artifacts(tmp_path):
    reg = _registry("a", "b", "c")
    _write_artifact(tmp_path, 1, {"a": True})
    _write_artifact(tmp_path, 2, {"c": True})
    _write_ledger(tmp_path, reg, ["a", "c"])
    assert list(rotate_by_correctness(reg, str(tmp_path))) == ["b", "a", "c"]


def test_corrupt_artifact_is_ignored(tmp_path):
    reg = _registry("a", "b")
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    assert list(rotate_by_correctness(reg, str(tmp_path))) == ["a", "b"]


def test_rewritten_query_rotates_back_in(tmp_path):
    """A green query whose implementation fingerprint no longer matches
    the recorded one loses its green status (ADVICE r2: rewritten
    queries must not keep stale green rows)."""
    reg = _registry("a", "b", "c")
    _write_artifact(tmp_path, 1, {"a": True, "b": True})
    _write_ledger(tmp_path, reg, ["a", "b"])
    # rewrite b: new oracle text -> new fingerprint
    reg["b"] = QuerySpec(reg["b"].fn, "SELECT 'rewritten'")
    rotated = list(rotate_by_correctness(reg, str(tmp_path)))
    assert rotated == ["b", "c", "a"]


def test_green_without_ledger_entry_is_not_trusted(tmp_path):
    """Dropping a query's ledger entry forces driver re-validation even
    though an old green row exists (helper-edit escape hatch)."""
    reg = _registry("a", "b")
    _write_artifact(tmp_path, 1, {"a": True, "b": True})
    _write_ledger(tmp_path, reg, ["a"])
    assert list(rotate_by_correctness(reg, str(tmp_path))) == ["b", "a"]


def test_no_ledger_file_trusts_artifacts(tmp_path):
    """Without QUERY_FINGERPRINTS.json the artifact rows stand alone
    (pre-ledger behavior, keeps old checkouts working)."""
    reg = _registry("a", "b")
    _write_artifact(tmp_path, 1, {"a": True})
    assert list(rotate_by_correctness(reg, str(tmp_path))) == ["b", "a"]
