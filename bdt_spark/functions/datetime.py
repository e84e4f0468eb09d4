"""Datetime function shims (SURVEY §2 B8: `date_bin` has no direct Spark
builtin — DataFusion 35 exposes it; this is the declared conformance shim).

`date_bin(width, ts, origin)` buckets timestamps into fixed-width bins
anchored at `origin` — pure arithmetic on microseconds, so it stays inside
whole-stage codegen (no UDF)."""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_UNITS_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
    "week": 7 * 86_400 * 1_000_000,
}


def parse_width_us(width: str) -> int:
    """'37 minutes' -> microseconds. Singular/plural unit accepted."""
    m = re.fullmatch(r"\s*(\d+)\s+([a-z]+?)s?\s*", width.lower())
    if not m or m.group(2) not in _UNITS_US:
        raise ValueError(f"unsupported date_bin width: {width!r}")
    return int(m.group(1)) * _UNITS_US[m.group(2)]


def date_bin(
    width: str,
    ts_expr: str,
    origin: str = "2000-01-03 00:00:00",
) -> Column:
    """Fixed-width event-time binning anchored at `origin`.

    `ts_expr` is a column name or SQL expression. Defaults to the
    2000-01-03 (Monday) anchor that DuckDB/TimescaleDB `time_bucket` uses,
    so week buckets start on Mondays. DataFusion's date_bin defaults to the
    1970 epoch; pass origin='1970-01-01 00:00:00' for that behavior.
    """
    return F.expr(date_bin_sql(width, ts_expr, origin))


def date_bin_sql(width: str, ts_expr: str, origin: str = "2000-01-03 00:00:00") -> str:
    """SQL-text form of date_bin for use inside query strings."""
    w = parse_width_us(width)
    o = f"unix_micros(TIMESTAMP '{origin}')"
    return (
        f"timestamp_micros(CAST({o} + FLOOR((unix_micros({ts_expr}) - {o})"
        f" / {w}) * {w} AS BIGINT))"
    )

