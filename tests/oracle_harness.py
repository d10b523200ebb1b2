"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column set + exact values
(columns sorted by name, rows sorted by a canonical key — the same
order-insensitive shape the driver hashes).

Exactness policy: we engineered every query for bit-identical doubles
(decimal-exact aggregation, IEEE-deterministic row arithmetic), so the
comparison is EXACT — no tolerance. A float mismatch is a real bug.
"""

from __future__ import annotations

import datetime
import decimal
import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from postgres_es_cdc_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(v) -> str:
    """Canonical string for sorting/comparing any non-float cell."""
    if v is None:
        return "\x00null"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00nan"
        return repr(v)  # shortest round-trip repr: exact for doubles
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _to_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    import numpy as np

    cols = sorted(df.columns)
    out = []
    for rec in df[cols].itertuples(index=False, name=None):
        row = []
        for v in rec:
            if isinstance(v, np.ndarray):
                v = v.tolist()
            if isinstance(v, (list, tuple)):
                row.append(str(list(v)))
            else:
                row.append(_canon(v if not pd.isna(v) else None))
        out.append(tuple(row))
    return sorted(out)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    spark_cols: list[str] = field(default_factory=list)
    oracle_cols: list[str] = field(default_factory=list)
    first_diffs: list[tuple] = field(default_factory=list)

    def message(self) -> str:
        if self.ok:
            return f"PASS {self.name} ({self.spark_rows} rows)"
        msg = [f"FAIL {self.name}: spark={self.spark_rows} oracle={self.oracle_rows} rows"]
        if set(self.spark_cols) != set(self.oracle_cols):
            msg.append(f"  cols spark={self.spark_cols} oracle={self.oracle_cols}")
        for d in self.first_diffs[:3]:
            msg.append(f"  diff: {d}")
        return "\n".join(msg)


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection,
            sql: str) -> CompareResult:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    res = CompareResult(name=name, ok=False,
                        spark_rows=len(sp), oracle_rows=len(du),
                        spark_cols=sorted(sp.columns), oracle_cols=sorted(du.columns))
    if set(sp.columns) != set(du.columns) or len(sp) != len(du):
        return res
    rs, rd = _to_rows(sp), _to_rows(du)
    diffs = [(a, b) for a, b in zip(rs, rd) if a != b]
    res.first_diffs = diffs
    res.ok = not diffs
    return res
