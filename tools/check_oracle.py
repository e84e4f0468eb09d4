"""Local replica of the driver's t2 correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` on DuckDB at a
given SF dir, then compares row count, schema shape, and an order-insensitive
value hash (columns sorted by name, rows sorted by their stringified tuple).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from bdt_spark.session import get_spark  # noqa: E402
from bdt_spark.sources.io import FIXTURE_TABLES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

# The sequence-packing queries' DuckDB recursive-CTE oracles are O(n^2)
# in docs per group — fine at sf<=0.1 (<=5k docs), infeasible past ~10k
# (SCALE.md; at sf10 DuckDB spins indefinitely). Above the threshold the
# sweep substitutes the independent single-process pandas reference from
# tools/verify_packing.py (same packer, inspectable by eye) so large-SF
# sweeps read PASS with a real value check instead of a seeded SKIP
# (VERDICT r10 #3). At-or-below the threshold the DuckDB oracle still
# runs, keeping this script a faithful replica of the driver's t2 gate.
_PACKING_SQL_MAX_DOCS = 10_000


def _pandas_packing_oracles():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import verify_packing as vp

    def mk(ref_fn):
        return lambda sf_dir: ref_fn(vp._tokens(sf_dir))

    return {
        "tokens_sequence_packing": mk(vp.ref_sequence_packing),
        "tokens_sequence_packing_sharded": mk(vp.ref_sequence_packing_sharded),
        "tokens_packing_efficiency": mk(vp.ref_packing_efficiency),
    }


def _docs_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows


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
        # 14 significant digits (relative tolerance ~1e-13). Full repr
        # distinguishes ADJACENT doubles, which turns engine conversion
        # quirks into false mismatches: DuckDB's DECIMAL->DOUBLE cast is
        # observably 1 ulp off correctly-rounded at >= 1e10 magnitudes
        # (verified: identical DECIMAL(38,8) sums in both engines,
        # 25397445585.15765000, cast to 25397445585.15765 by Spark/Java
        # and ...157654 by DuckDB). 15 digits still amplifies that ulp
        # when the value sits at a half-digit boundary (.15765 ->
        # .1576/.1577); 14 digits gives a 10x wider margin while staying
        # far below any real computational divergence.
        return f"{v:.14g}"
    if isinstance(v, bool):
        return str(v)
    # tz-aware UTC timestamps stringify with '+00:00' (DuckDB TIMESTAMPTZ
    # columns) while Spark's toPandas yields naive UTC — same instant,
    # different repr. Normalize to naive UTC.
    tzinfo = getattr(v, "tzinfo", None)
    if tzinfo is not None:
        try:
            import datetime as _dt

            return str(v.astimezone(_dt.timezone.utc).replace(tzinfo=None))
        except (TypeError, ValueError, OverflowError):
            pass
    return str(v)


def canonicalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = []
    for _, row in df_pandas[cols].iterrows():
        rows.append("|".join(canon_value(v) for v in row))
    rows.sort()
    return cols, rows


def main():
    # --resume STATE.json: append per-query results to a state file and
    # skip queries already recorded — lets a long sweep run as repeated
    # bounded invocations (environments that cap per-process wall time).
    args = sys.argv[1:]
    state_path = None
    if "--resume" in args:
        i = args.index("--resume")
        state_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    state: dict = {}
    if state_path and os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)

    def record(name, verdict):
        if state_path:
            state[name] = verdict
            with open(state_path, "w") as f:
                json.dump(state, f)

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    pandas_oracles = (
        _pandas_packing_oracles()
        if _docs_rows(sf_dir) > _PACKING_SQL_MAX_DOCS
        else {}
    )
    n_pass = n_fail = n_skip = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        if name in state:
            if state[name] == "PASS":
                n_pass += 1
            elif state[name] == "SKIP":
                n_skip += 1
            else:
                n_fail += 1
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            record(name, "FAIL")
            continue
        oracle_tag = ""
        if name in pandas_oracles:
            oracle_tag = " [pandas-oracle]"
            try:
                odf = pandas_oracles[name](sf_dir)
            except Exception as e:
                print(
                    f"FAIL {name}: pandas oracle error: "
                    f"{type(e).__name__}: {str(e)[:300]}"
                )
                n_fail += 1
                record(name, "FAIL")
                continue
        elif name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            n_skip += 1
            record(name, "SKIP")
            continue
        else:
            try:
                odf = con.sql(oracles[name]).df()
            except Exception as e:
                print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
                n_fail += 1
                record(name, "FAIL")
                continue
        scols, srows = canonicalize(sdf)
        ocols, orows = canonicalize(odf)
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} != {ocols}")
            n_fail += 1
            record(name, "FAIL")
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            n_fail += 1
            record(name, "FAIL")
        elif srows != orows:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
            )
            print(f"FAIL {name}: first diff row {diff[0]}:\n  spark: {diff[1][:250]}\n  duck : {diff[2][:250]}")
            n_fail += 1
            record(name, "FAIL")
        else:
            print(
                f"PASS {name} ({len(srows)} rows)"
                f"{oracle_tag} [{time.time()-t0:.1f}s]"
            )
            n_pass += 1
            record(name, "PASS")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
