"""A/B the q18/q21 size-gated plan arms at a mid-decade fact size
(VERDICT r12 #7).

The shared 1 GB `_BIG_FACT_MIN_BYTES` gate (plans/tpch.py) was
calibrated from sf10 (0.64 GB on-disk lineitem — small arm wins) and
sf100 (6.4 GB — big arm mandatory, static broadcast dies) with nothing
between. This probe generates a ~K=300 shard (≈2 GB lineitem, just
above the gate) and interleaves both arms rep-by-rep so host drift
cannot masquerade as a crossover, verifying the arms row-identical
first.

Usage: python tools/ab_bigfact_midpoint.py [shard_dir] [reps]
Generate the shard first:
  python tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf30 300 \
      lineitem orders customer supplier nation region
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    shard = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf30"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from bdt_spark.plans import tpch
    from bdt_spark.session import get_spark
    from bdt_spark.sources.io import fixture_scan_bytes, load_fixture_tables

    spark = get_spark("bigfact_ab", shuffle_partitions=256)
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    load_fixture_tables(spark, shard, force=True)
    li_bytes = fixture_scan_bytes(spark, "lineitem")
    print(
        f"lineitem {li_bytes / 1e9:.2f} GB on disk; gate "
        f"{tpch._BIG_FACT_MIN_BYTES / 1e9:.2f} GB -> "
        f"{'BIG' if li_bytes >= tpch._BIG_FACT_MIN_BYTES else 'SMALL'} arm "
        f"selected at this size",
        flush=True,
    )

    arms = {
        # r16: the Spark side is the single-agg rewrite (_Q18_SPARK);
        # the arms differ only in the MERGE hints the big gate adds
        "q18_small": tpch._Q18_SPARK.format(hints=""),
        "q18_big": tpch._Q18_SPARK.format(
            hints="/*+ MERGE(q), MERGE(customer) */ "
        ),
        "q21_small": tpch._Q21_ORACLE,
        "q21_big": tpch._Q21_SPARK,
    }

    # q21's small arm (Spark's own decorrelation) picks BROADCAST
    # semi/anti builds from static estimates at mid-decade sizes; at
    # K=300 (1.9 GB lineitem) the true build blows the 8g heap
    # ("Not enough memory to build and broadcast" — first observed
    # r13, the exact failure class the gate routes around). Run the
    # small arm with auto-broadcast off: that is its best VIABLE plan
    # at this size, so the A/B compares the gate's big arm against the
    # strongest small-arm survivor rather than a dead job.
    _BCAST = "spark.sql.autoBroadcastJoinThreshold"

    def run_arm(k: str):
        if k == "q21_small":
            prev = spark.conf.get(_BCAST)
            spark.conf.set(_BCAST, "-1")
            try:
                return spark.sql(arms[k]).collect()
            finally:
                spark.conf.set(_BCAST, prev)
        return spark.sql(arms[k]).collect()

    # row-identity first (each arm once, also warms codegen)
    for q in ("q18", "q21"):
        a = [tuple(r) for r in run_arm(f"{q}_small")]
        b = [tuple(r) for r in run_arm(f"{q}_big")]
        assert a == b, f"{q} arms diverge at {shard}: {a[:2]} vs {b[:2]}"
        print(f"{q}: arms row-identical ({len(a)} rows)", flush=True)

    runs: dict[str, list[float]] = {k: [] for k in arms}
    for rep in range(reps):
        for k in arms:  # interleaved: small,big,small,big per rep
            t0 = time.time()
            run_arm(k)
            runs[k].append(round(time.time() - t0, 2))
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
        print(f"rep {rep + 1}: " + ", ".join(f"{k}={runs[k][-1]}" for k in arms),
              flush=True)

    for k, ts in runs.items():
        print(f"{k}: median {sorted(ts)[len(ts) // 2]}  runs {ts}")
    spark.stop()


if __name__ == "__main__":
    main()
