"""A/B: Arrow batch size for the multimodal mapInPandas decode family.

VERDICT r15 #6: the decode family (~5.2 s combined locally) has been
untouched for three rounds; bmp's 0.49 core-scaling ratio hints the cost
is per-task/per-batch fixed overhead, not decode CPU. This measures
`spark.sql.execution.arrow.maxRecordsPerBatch` (default 10000) across the
family at a given sf, same median-of-reps protocol as bench.py, one
SparkSession per setting (the conf is read at plan time, and a fresh
session also resets Python workers so a setting cannot inherit the
previous arm's warm workers).

Adopt-only-on->=1.2x rule per the verdict; otherwise this records the
negative.

Usage: python tools/ab_multimodal_batch.py <sf_dir> <out_json> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_decode_bmp",
    "multimodal_decode_png",
    "multimodal_decode_jpeg",
    "multimodal_decode_wav",
    "multimodal_dedup_phash",
]

BATCH_SIZES = [10000, 1024, 65536]  # default first = the control arm


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from bdt_spark import plans
    from bdt_spark.operators.cacheutil import release
    from bdt_spark.session import get_spark
    from bdt_spark.sources.io import load_fixture_tables

    res: dict = {"sf_dir": sf_dir, "reps": reps, "arms": {}}
    for bs in BATCH_SIZES:
        spark = get_spark(
            f"ab_multimodal_bs{bs}",
            extra_conf={
                "spark.sql.execution.arrow.maxRecordsPerBatch": str(bs)
            },
        )
        load_fixture_tables(spark, sf_dir, force=True)
        arm: dict = {}
        for name in QUERIES:
            spec = plans.get_query(name)
            spark.sparkContext.setJobDescription(f"ab bs={bs} {name}")
            # one untimed warmup (JIT/codegen + page cache), then reps
            df = spec.fn(spark, sf_dir)
            df.count()
            release(df)
            runs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                df.count()
                runs.append(round(time.perf_counter() - t0, 3))
                release(df)
            arm[name] = {"median": median(runs), "runs": runs}
        arm["total_median"] = round(
            sum(v["median"] for v in arm.values() if isinstance(v, dict)), 3
        )
        res["arms"][str(bs)] = arm
        spark.stop()

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    ctrl = res["arms"][str(BATCH_SIZES[0])]["total_median"]
    for bs in BATCH_SIZES:
        t = res["arms"][str(bs)]["total_median"]
        print(f"bs={bs}: total_median={t} (x{ctrl / t:.2f} vs default)")


if __name__ == "__main__":
    main()
