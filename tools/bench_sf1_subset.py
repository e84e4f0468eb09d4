"""sf1 re-baseline (VERDICT r13 #2/#3): run ONLY the driver bench's
SF1_SUBSET at /tmp/sf1, one fresh process per invocation, so the
43.2 -> 55.9 s r12->r13 sf1_total jump can be attributed against a clean
median-of-3 artifact on the current host epoch (the
tools/aggregate_rebaseline.py pattern, scoped to the sf1 block).

Usage:
  python tools/bench_sf1_subset.py [run_tag]       # one process, one run
  python tools/bench_sf1_subset.py --aggregate     # merge runs -> artifact

Single-run mode writes bench_results/r14_runs/sf1_run<tag>.json; the
aggregate pass computes per-query medians + max spread and writes
bench_results/bench_sf1_r14.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS_DIR = "bench_results/r14_runs"
OUT = "bench_results/bench_sf1_r14.json"

HOST_EPOCH_NOTE = (
    "host epoch r14: sequential fresh processes on the post-reboot host "
    "(same epoch as bench_sf01_r13/bench_sf10_r13); attributes the "
    "BENCH_r12 43.2 s -> BENCH_r13 55.9 s sf1_total jump — compare "
    "sf1 deltas against THESE numbers"
)


def one_run(tag: str) -> None:
    from bench import SF1_SUBSET, run_query, timed_reps
    from bdt_spark.session import get_spark
    from bdt_spark.sources.io import load_fixture_tables

    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("bench_sf1_subset")
    # same python-worker warm-up the main bench does
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    load_fixture_tables(spark, sf1_dir, force=True)
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in SF1_SUBSET:
        try:
            timings[name], runs[name] = timed_reps(
                lambda: run_query(spark, name, sf1_dir), reps,
                name=f"sf1:{name}",
            )
        except Exception as e:
            print(f"error {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(v for v in timings.values() if v > 0), 3)
    os.makedirs(RUNS_DIR, exist_ok=True)
    out = {
        "sf1_queries": timings,
        "sf1_total": total,
        "sf1_runs": runs,
        "loadavg": list(os.getloadavg()),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    path = os.path.join(RUNS_DIR, f"sf1_run{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"sf1_total={total} -> {path}")
    spark.stop()


def aggregate() -> None:
    runs = []
    for fn in sorted(os.listdir(RUNS_DIR)):
        if fn.startswith("sf1_run") and fn.endswith(".json"):
            with open(os.path.join(RUNS_DIR, fn)) as f:
                runs.append(json.load(f))
    if len(runs) < 3:
        sys.exit(f"need >=3 runs in {RUNS_DIR}, found {len(runs)}")
    names = sorted(runs[0]["sf1_queries"])
    queries, spreads = {}, {}
    for n in names:
        vals = [r["sf1_queries"].get(n, -1.0) for r in runs]
        vals = [v for v in vals if v > 0]
        m = statistics.median(vals)
        queries[n] = round(m, 3)
        spreads[n] = round((max(vals) - min(vals)) / m, 3) if m else 0.0
    totals = [r["sf1_total"] for r in runs]
    med_total = round(statistics.median(totals), 3)
    artifact = {
        "sf1_total": med_total,
        "sf1_total_runs": totals,
        "sf1_total_spread": round(
            (max(totals) - min(totals)) / med_total, 3
        ),
        "sf1_queries": queries,
        "per_query_spread": spreads,
        "n_processes": len(runs),
        "reps_per_process": 3,
        "note": HOST_EPOCH_NOTE,
        "loadavgs": [r["loadavg"] for r in runs],
    }
    with open(OUT, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--aggregate":
        aggregate()
    else:
        one_run(sys.argv[1] if len(sys.argv) > 1 else "1")
