"""Shared helpers for oracle-parity query determinism.

Cross-engine floating-point discipline: double SUM/AVG is
order-dependent, and Spark and DuckDB will aggregate in different
orders — so any aggregate the DuckDB oracle must reproduce bit-for-bit
is computed with exact decimal arithmetic (order-independent) and cast
back to double at the end. Per-row double arithmetic (x*y, x/(y+z),
sqrt) is IEEE-deterministic and needs no such treatment.

Timestamps: all event-time math happens in exact integer
epoch-microseconds (``ts_us``; DuckDB side: ``epoch_us(ts)``).
``events_table`` derives ``ts_us`` from whatever encoding the parquet
actually uses — timestamp[us] (the driver's testdata, read by Spark as
TIMESTAMP_NTZ), tz-adjusted TIMESTAMP, or TIMESTAMP(NANOS) read as a
long via ``spark.sql.legacy.parquet.nanosAsLong`` — so the queries are
encoding- and session-timezone-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table


# Quantized integers are split at 10^6 into (hi, lo) long partial sums so
# the aggregation stays in whole-stage-codegen long arithmetic instead of
# interpreted Decimal128 (2.2x faster on TPC-H q1). Overflow headroom:
# |lo| < 2*10^6 and |hi| <= |q|/10^6 + 1 per row, so both long sums stay
# inside int64 past 10^12 rows at TPC-H value magnitudes; the exact
# decimal combine happens once per group.
_SPLIT = 1_000_000


def _split_long_sum(q: Column, descale: float) -> Column:
    # Identity q = hi*_SPLIT + lo holds even if the double division
    # inside floor() rounds (lo is derived from hi), so the combined sum
    # is exact regardless; only the overflow bounds rely on the split.
    hi = F.floor(q / _SPLIT)
    lo = q - hi * _SPLIT
    return ((F.sum(hi).cast("decimal(38,0)") * _SPLIT
             + F.sum(lo).cast("decimal(38,0)"))
            .cast("double") / descale)


def dsum(col: Column, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent SUM of a raw exact-`scale`-dp double column, as
    double. ONLY for columns whose abstract values have <= `scale`
    decimal places (raw TPC-H amounts): there round(x*10^s) recovers the
    exact unscaled integer in both engines. Computed doubles must use
    qsum (see there for the tie-point argument).

    DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE).
    """
    k = 10 ** scale
    return _split_long_sum(F.round(col * k, 0).cast("long"), float(k))


def davg(col: Column, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, as double.

    DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)/COUNT(x).
    """
    return dsum(col, precision, scale) / F.count(col)


def qsum(expr: Column, dec: int) -> Column:
    """Exact, order-independent SUM of a computed double expression via
    fixed-point quantization: round(expr * 10^dec) -> integer -> exact
    split-long sum -> descale.

    Why not CAST(expr AS DECIMAL(p,s))? Spark rounds the double's
    SHORTEST REPR while DuckDB rounds the exact binary value, and the
    tie points of a fractional decimal scale (odd multiples of
    5*10^-(s+1)) are not representable doubles — so the two roundings
    can disagree (observed at sf0.1 on q1). After scaling to an integer
    boundary the ties (N.5) ARE representable doubles, so shortest-repr
    rounding and exact-binary rounding provably agree; and for products
    of exact-2dp inputs, dec >= the product's true decimal places means
    the quantization recovers the exact abstract value.

    Requires |expr| * 10^dec < 2^52. DuckDB twin:
    CAST(SUM(CAST(round((expr)*10^dec) AS HUGEINT)) AS DOUBLE)/10^dec.
    """
    k = 10 ** dec
    return _split_long_sum(F.round(expr * k, 0).cast("long"), float(k))


def qsum_sql(expr: str, dec: int) -> str:
    """DuckDB twin of qsum (see there)."""
    k = 10 ** dec
    return f"CAST(SUM(CAST(round(({expr})*{k}) AS HUGEINT)) AS DOUBLE)/{k}.0"


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events stream table with ``ts_us`` (bigint epoch microseconds).

    DuckDB oracle equivalent for ts_us: ``epoch_us(ts)``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = table(spark, sf_dir, "events")
    ts_type = dict(e.dtypes)["ts"]
    if ts_type == "bigint":
        # TIMESTAMP(NANOS) surfaced as a long by nanosAsLong. Integer
        # division: nanos are ~1.7e18, beyond double's 2^53 exact range,
        # so float division here would corrupt microseconds.
        ts_us = F.expr("ts div 1000")
    elif ts_type == "timestamp_ntz":
        # Naive wall-clock (parquet timestamp[us], isAdjustedToUTC=false).
        # DuckDB's epoch_us treats the naive value as UTC; timestampdiff
        # on two NTZ values is pure wall-clock arithmetic, independent of
        # spark.sql.session.timeZone (unlike cast(ts as timestamp)).
        ts_us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    else:  # tz-adjusted TIMESTAMP: internal value is already epoch micros
        ts_us = F.expr("unix_micros(ts)")
    return e.select(
        "event_id",
        ts_us.alias("ts_us"),
        "user_id", "event_type", "value", "props",
    )
