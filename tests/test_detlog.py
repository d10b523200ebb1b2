"""Cross-engine determinism of functions/detlog.py: the staged
ln(a/b) must be BIT-IDENTICAL between Spark and DuckDB (that is the
whole point — libm logs are not), and accurate enough for ranking."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from postgres_es_cdc_spark.functions.detlog import (
    apply_stages_spark, ln_ratio_stages, stages_cte_sql)


@pytest.fixture(scope="module")
def pairs():
    rng = random.Random(20260813)
    out = [(1, 1), (2, 1), (3, 2), (2**50 + 12345, 3),
           (10**15, 10**15 - 1), (999, 998)]
    for _ in range(300):
        b = rng.randrange(1, 2**40)
        a = b + rng.randrange(0, 2**40)
        out.append((a, b))
    return out


def test_ln_ratio_bit_identical_and_accurate(spark, pairs):
    stages = ln_ratio_stages("a", "b")
    df = spark.createDataFrame(pairs, "a long, b long")
    got_spark = {(r.a, r.b): r.ln_ab
                 for r in apply_stages_spark(df, stages).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE r(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO r VALUES (?, ?)", pairs)
    cte, last = stages_cte_sql("r", stages, "s")
    got_duck = {(a, b): v for a, b, v in con.execute(
        f"WITH {cte} SELECT a, b, ln_ab FROM {last}").fetchall()}

    for p in pairs:
        s, d = got_spark[p], got_duck[p]
        assert s.hex() == d.hex(), f"bit mismatch at {p}: {s!r} vs {d!r}"
        exact = math.log(p[0]) - math.log(p[1])
        assert abs(s - exact) <= 1e-8 * max(1.0, abs(exact)) + 1e-9, \
            f"inaccurate at {p}: {s} vs {exact}"
