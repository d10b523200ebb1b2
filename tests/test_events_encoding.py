"""events_table must yield identical ts_us for every physical encoding of
events.ts the harness can produce: timestamp[us] (the driver's testdata,
read by Spark as TIMESTAMP_NTZ) and TIMESTAMP(NANOS) (read as a long via
spark.sql.legacy.parquet.nanosAsLong). Regression for the r1 bug where
`ts div 1000` assumed the nanos-long encoding and threw AnalysisException
on the driver's parquet.
"""
from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from postgres_es_cdc_spark.operators.common import events_table


def _write_events(tmpdir: str, ts_array: pa.Array) -> str:
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": ts_array,
        "user_id": pa.array([10, 10, 20], pa.int64()),
        "event_type": pa.array(["view", "click", "view"]),
        "value": pa.array([1.5, 2.25, 3.0], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"]),
    })
    os.makedirs(os.path.join(tmpdir, "x"), exist_ok=True)
    pq.write_table(tbl, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


US = [1704067798778549, 1704067799000000, 1706657176220708]


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_table_encoding(spark, tmp_path, unit):
    if unit == "us":
        ts = pa.array(US, pa.timestamp("us"))
    else:
        ts = pa.array([u * 1000 for u in US], pa.timestamp("ns"))
    d = _write_events(str(tmp_path / unit), ts)
    got = sorted(
        r.ts_us for r in events_table(spark, d).select("ts_us").collect()
    )
    assert got == US


def test_events_table_us_under_non_utc_session_tz(spark, tmp_path):
    # ts_us must be the naive wall-clock epoch (DuckDB epoch_us), not
    # shifted by spark.sql.session.timeZone.
    d = _write_events(str(tmp_path), pa.array(US, pa.timestamp("us")))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = sorted(
            r.ts_us for r in events_table(spark, d).select("ts_us").collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == US
