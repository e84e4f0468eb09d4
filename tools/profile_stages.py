"""Per-stage attribution for the sf10 heavy hitters (VERDICT r13 #5):
is text_winnowing_fingerprints / dedup_minhash_lsh_k64 wall time a CPU
floor or a shuffle bottleneck?

Runs the named queries once (warm session), then reads Spark's own
AppStatusStore — per stage: task count, executor run/CPU time, input
bytes, shuffle read/write bytes, spill — and prints stages sorted by
executor run time. Attribution rule of thumb: CPU-bound when
executorCpuTime/executorRunTime is high and shuffle bytes are small
relative to input; shuffle-bound when read/write bytes dominate or
spill is non-zero.

Usage: python tools/profile_stages.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = ("text_winnowing_fingerprints", "dedup_minhash_lsh_k64")


def stage_rows(spark):
    """Stage metrics via the UI REST API (the profiling session runs with
    spark.ui.enabled=true): /api/v1/applications/<id>/stages."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        data = _json.load(r)
    out = []
    for s in data:
        if s.get("status") not in ("COMPLETE", "FAILED"):
            continue
        out.append(
            {
                "stage": s["stageId"],
                "name": s.get("name", "").split("\n")[0][:70],
                "tasks": s.get("numCompleteTasks", 0),
                "run_s": round(s.get("executorRunTime", 0) / 1e3, 1),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "sh_read_mb": round(
                    s.get("shuffleReadBytes", 0) / 1e6, 1
                ),
                "sh_write_mb": round(
                    s.get("shuffleWriteBytes", 0) / 1e6, 1
                ),
                "spill_mb": round(
                    (
                        s.get("memoryBytesSpilled", 0)
                        + s.get("diskBytesSpilled", 0)
                    )
                    / 1e6,
                    1,
                ),
            }
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    names = sys.argv[2:] or list(DEFAULT_QUERIES)

    import bdt_spark.plans as plans
    from bdt_spark.session import get_spark
    from bdt_spark.sources.io import load_fixture_tables

    spark = get_spark(
        "profile_stages",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
        },
    )
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    load_fixture_tables(spark, sf_dir, force=True)

    for name in names:
        before = {r["stage"] for r in stage_rows(spark)}
        t0 = time.time()
        plans.get_query(name).fn(spark, sf_dir).collect()
        wall = round(time.time() - t0, 1)
        rows = [r for r in stage_rows(spark) if r["stage"] not in before]
        rows.sort(key=lambda r: -r["run_s"])
        tot_run = sum(r["run_s"] for r in rows)
        print(f"\n=== {name}: wall {wall}s, {len(rows)} stages, "
              f"executor-run total {round(tot_run,1)}s ===")
        hdr = ("stage", "tasks", "run_s", "cpu_s", "input_mb",
               "sh_read_mb", "sh_write_mb", "spill_mb", "name")
        print(("{:>6}{:>7}{:>9}{:>9}{:>10}{:>12}{:>13}{:>10}  {}"
               ).format(*hdr))
        for r in rows:
            print(("{stage:>6}{tasks:>7}{run_s:>9}{cpu_s:>9}{input_mb:>10}"
                   "{sh_read_mb:>12}{sh_write_mb:>13}{spill_mb:>10}  {name}"
                   ).format(**r))
    spark.stop()


if __name__ == "__main__":
    main()
