"""Attribute the driver-vs-artifact sf1 gap (VERDICT r14 #4 / next #5).

r14 ended with two sf1 numbers that disagree by ~20%: the driver's
in-process bench read sf1_total 63.3 s (the sf1 block runs AFTER the
full sf0.1 suite in the same JVM), while the fresh-process artifact
(tools/bench_sf1_subset.py, bench_results/bench_sf1_r14.json) read
52.6 s. This probe measures the ordering effect directly, inside ONE
process:

  block A: SF1_SUBSET, 3 reps/query, fresh session (= artifact shape)
  filler:  the full sf0.1 headline suite once (= what the driver's
           bench runs before its sf1 block)
  block B: SF1_SUBSET again, 3 reps/query (= driver shape)

B/A > 1 within one process isolates accumulated-session state (codegen
cache pressure, broadcast/shuffle block residue, JVM heap shape) from
host-epoch noise, because everything shares one process and one hour.

Usage: python tools/probe_sf1_order.py [sf1_dir] [sf01_dir]
Prints one JSON line; record the outcome in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import bdt_spark.plans as plans  # noqa: E402
from bdt_spark.session import get_spark  # noqa: E402
from bdt_spark.sources.io import load_fixture_tables  # noqa: E402


def _block(spark, sf_dir: str, reps: int = 3) -> dict[str, float]:
    out: dict[str, float] = {}
    names = set(plans.all_queries())
    load_fixture_tables(spark, sf_dir, force=True)
    for name in bench.SF1_SUBSET:
        if name not in names:
            continue
        runs = [bench.run_query(spark, name, sf_dir) for _ in range(reps)]
        out[name] = round(median(runs), 3)
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
    return out


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sf01_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("bdt_probe_sf1_order")
    # same warmup bench.main() pays before any timed metric
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    first = _block(spark, sf1_dir)

    # filler: one pass over the sf0.1 suite, untimed — the state the
    # driver's bench accumulates before its sf1 block
    names = set(plans.all_queries())
    load_fixture_tables(spark, sf01_dir, force=True)
    for name in bench.HEADLINE + [q for q in bench.PIPELINE if q in names]:
        try:
            bench.run_query(spark, name, sf01_dir)
        except Exception as e:
            print(f"filler error {name}: {e}", file=sys.stderr)

    last = _block(spark, sf1_dir)

    ft, lt = round(sum(first.values()), 3), round(sum(last.values()), 3)
    print(
        json.dumps(
            {
                "metric": "sf1_order_effect",
                "sf1_first_total": ft,
                "sf1_last_total": lt,
                "last_over_first": round(lt / ft, 3) if ft else None,
                "queries_first": first,
                "queries_last": last,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
