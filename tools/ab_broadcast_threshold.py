"""A/B spark.sql.autoBroadcastJoinThreshold 64MB (the repo default since
round 1, never revisited) vs Spark's stock 10MB.

Why: the r13 midpoint probe traced the q18/q21 static-broadcast deaths
to this knob — at 64MB, a col-pruned zstd scan estimate admits builds
whose IN-MEMORY hash relation is 10-100x the compressed bytes (the
synthetic fixtures compress to ~1 B/row in places: sf30 customer is
4.5M rows in 5.2 MB). The audit (tools/audit_bigscan_broadcast.py)
found 22 queries broadcasting map-only fact scans at sf30. Lowering the
threshold would remove the failure class structurally; this tool
measures what that costs at probe scale.

Protocol: for every registered query, build the plan under both
thresholds (driver-side only) and keep the ones whose executedPlan
differs; then time ONLY those, interleaved rep-by-rep so host drift
cannot masquerade as a threshold effect.

Usage: python tools/ab_broadcast_threshold.py [sf_dir] [reps]
"""

from __future__ import annotations

import difflib
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY = "spark.sql.autoBroadcastJoinThreshold"
ARMS = {"64MB": "64MB", "10MB": "10MB"}


def skel(s: str) -> str:
    """Normalize build-to-build renumbering (expr ids, plan ids, cached
    subquery/exchange/cte ids) out of a rendered plan so only real
    threshold-driven differences survive. Module-scope (r13 ADVICE: was
    re-defined per loop iteration) so the regexes are compiled once and
    the A/B's membership logic is importable/testable."""
    s = re.sub(r"#\d+L?", "#x", s)
    s = re.sub(r"plan_id=\d+", "plan_id=x", s)
    s = re.sub(r"\[id=#?x?\d*\]", "[id=x]", s)
    s = re.sub(r"subquery#x, \[id=x\]", "subquery", s)
    s = re.sub(r"(Subquery|ReusedExchange|cteId=|statefulOperatorId=)\d+", r"\1x", s)
    return s


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import bdt_spark.plans as plans
    from bdt_spark.session import get_spark
    from bdt_spark.sources.io import load_fixture_tables

    spark = get_spark("bcast_ab", shuffle_partitions=32)
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    load_fixture_tables(spark, sf_dir, force=True)

    def plan_of(name: str) -> str:
        df = plans.get_query(name).fn(spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()

    differing = []
    for name in sorted(plans.all_queries()):
        try:
            spark.conf.set(KEY, ARMS["64MB"])
            p64 = plan_of(name)
            spark.conf.set(KEY, ARMS["10MB"])
            p10 = plan_of(name)
        except Exception as e:
            print(f"skip {name}: {type(e).__name__}", flush=True)
            continue
        # ignore build-to-build renumbering: compare opcode skeletons
        s64, s10 = skel(p64), skel(p10)
        if s64 != s10:
            differing.append(name)
            # surface the skeleton diff so a spurious entry (a
            # renumbering pattern skel() misses) is visible instead of
            # silently inflating the timed set (r13 ADVICE)
            diff = list(difflib.unified_diff(
                s64.splitlines(), s10.splitlines(),
                "64MB", "10MB", lineterm="", n=0))
            print(f"-- {name} plan diff ({len(diff)} lines):", flush=True)
            for line in diff[:40]:
                print(f"   {line}")
    print(f"{len(differing)} queries plan differently: {differing}", flush=True)

    runs: dict[str, dict[str, list[float]]] = {
        n: {a: [] for a in ARMS} for n in differing
    }
    for name in differing:  # warm both arms once
        for arm in ARMS.values():
            spark.conf.set(KEY, arm)
            plans.get_query(name).fn(spark, sf_dir).collect()
    for rep in range(reps):
        for name in differing:
            for label, arm in ARMS.items():
                spark.conf.set(KEY, arm)
                t0 = time.time()
                plans.get_query(name).fn(spark, sf_dir).collect()
                runs[name][label].append(round(time.time() - t0, 3))
        print(f"rep {rep + 1} done", flush=True)
    spark.conf.set(KEY, ARMS["64MB"])

    print(f"\n{'query':<40}{'64MB':>8}{'10MB':>8}{'10/64':>7}")
    tot64 = tot10 = 0.0
    for name in differing:
        m64 = statistics.median(runs[name]["64MB"])
        m10 = statistics.median(runs[name]["10MB"])
        tot64 += m64
        tot10 += m10
        print(f"{name:<40}{m64:>8.2f}{m10:>8.2f}{m10 / m64 if m64 else 0:>7.2f}")
    print(f"{'TOTAL':<40}{tot64:>8.2f}{tot10:>8.2f}"
          f"{tot10 / tot64 if tot64 else 0:>7.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
