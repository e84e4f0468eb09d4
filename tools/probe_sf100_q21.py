"""sf100 q21 at PRODUCT-DEFAULT geometry (VERDICT r13 #1/#2 closure).

One fresh process per invocation: default session (env-default 32
shuffle partitions, master local[N,4] — session.py r14), fixture load,
then tpch_q21_waiting_supplier against the sf100 relational shard. The
big-fact gate must (a) select the rewrite arm and (b) raise shuffle
partitions via ensure_heavy_arm_geometry (6.0 GB lineitem -> 512); the
run records wall time, the partition count the hook actually set, and
the failed/retried task count from Spark's own status store (doctrine
bar: completes with 0-2 retried tasks).

Usage:
  python tools/probe_sf100_q21.py [sf_dir] [run_tag]
  python tools/probe_sf100_q21.py --aggregate      # merge -> SCALE row
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS_DIR = "bench_results/r14_runs"
OUT = "bench_results/probe_sf100_q21_r14.json"


def one_run(sf_dir: str, tag: str) -> None:
    import bdt_spark.plans as plans
    from bdt_spark.session import get_spark
    from bdt_spark.sources.io import load_fixture_tables

    spark = get_spark(
        "probe_sf100_q21", extra_conf={"spark.ui.enabled": "true"}
    )
    master = spark.sparkContext.master
    load_fixture_tables(spark, sf_dir, force=True)
    t0 = time.time()
    df = plans.get_query("tpch_q21_waiting_supplier").fn(spark, sf_dir)
    parts = spark.conf.get("spark.sql.shuffle.partitions")
    rows = df.collect()
    wall = round(time.time() - t0, 1)

    # retried-task accounting via the UI REST API (stageList's py4j
    # signature needs the full Scala default-arg list — not callable)
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages"
    ) as r:
        failed_tasks = sum(s.get("numFailedTasks", 0) for s in _json.load(r))
    out = {
        "wall_s": wall,
        "rows": len(rows),
        "shuffle_partitions_in_effect": parts,
        "master": master,
        "failed_or_retried_tasks": failed_tasks,
        "loadavg": list(os.getloadavg()),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    os.makedirs(RUNS_DIR, exist_ok=True)
    path = os.path.join(RUNS_DIR, f"sf100_q21_run{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


def aggregate() -> None:
    runs = []
    for fn in sorted(os.listdir(RUNS_DIR)):
        if fn.startswith("sf100_q21_run") and fn.endswith(".json"):
            with open(os.path.join(RUNS_DIR, fn)) as f:
                runs.append(json.load(f))
    if len(runs) < 3:
        sys.exit(f"need >=3 runs, found {len(runs)}")
    walls = [r["wall_s"] for r in runs]
    med = round(statistics.median(walls), 1)
    artifact = {
        "wall_s_median": med,
        "wall_s_runs": walls,
        "spread": round((max(walls) - min(walls)) / med, 3),
        "rows": runs[0]["rows"],
        "shuffle_partitions_in_effect": runs[0][
            "shuffle_partitions_in_effect"
        ],
        "master": runs[0]["master"],
        "failed_or_retried_tasks": [
            r["failed_or_retried_tasks"] for r in runs
        ],
        "note": (
            "product-default geometry: env-default initial partitions, "
            "heavy-arm hook derives the count from scan bytes "
            "(ensure_heavy_arm_geometry), session master local[N,4] "
            "task-retry budget — VERDICT r13 #1 encoded, #2 measured"
        ),
        "loadavgs": [r["loadavg"] for r in runs],
    }
    with open(OUT, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--aggregate":
        aggregate()
    else:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100rel"
        tag = sys.argv[2] if len(sys.argv) > 2 else "1"
        one_run(sf_dir, tag)
