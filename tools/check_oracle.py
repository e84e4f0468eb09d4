"""Local replica of the driver's t2 correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` on DuckDB at a
given SF dir, then compares row count, schema shape, and an order-insensitive
value hash (columns sorted by name, rows sorted by their stringified tuple).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from bdt_spark.session import get_spark  # noqa: E402
from bdt_spark.sources.io import FIXTURE_TABLES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def canon_value(v):
    if v is None:
        return "NULL"
    try:
        import pandas as pd

        if not isinstance(v, (list, tuple, dict)) and pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        # 15 significant digits — double's guaranteed precision. Full repr
        # (17 digits) distinguishes ADJACENT doubles, which turns engine
        # conversion quirks into false mismatches: DuckDB's
        # DECIMAL(30,8)->DOUBLE cast is observably 1 ulp off correctly-
        # rounded at >= 1e10 magnitudes (e.g. 24836464858.90 ->
        # ...58.899998 while Java BigDecimal.doubleValue() rounds
        # correctly). Values that agree to 15 significant digits are the
        # same number at double precision.
        return f"{v:.15g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canonicalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = []
    for _, row in df_pandas[cols].iterrows():
        rows.append("|".join(canon_value(v) for v in row))
    rows.sort()
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_skip = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            n_skip += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        scols, srows = canonicalize(sdf)
        ocols, orows = canonicalize(odf)
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} != {ocols}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            n_fail += 1
        elif srows != orows:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
            )
            print(f"FAIL {name}: first diff row {diff[0]}:\n  spark: {diff[1][:250]}\n  duck : {diff[2][:250]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
