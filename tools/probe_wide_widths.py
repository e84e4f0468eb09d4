"""Exercise the derived exchange widths ABOVE the 32 floor (VERDICT r15 #1).

Round 15 replaced the literal `REPARTITION(32)` hints on the incremental
dedup / similarity projections with widths derived from exact scan bytes
(io.exchange_width_for_bytes: 16 MiB/partition, pow-2 from the 32 floor).
At every locally shipped sf the derivation evaluates to the floor, so the
code path that matters at 100 TB — width 64/128/… — had executed only in
unit tests on the arithmetic. This probe runs the real queries on a shard
whose scan exceeds 512 MiB (tools/gen_scale.py K=4000 documents /
K=7000 embeddings), so the derived width is ≥64, and records everything
the claim needs:

- the EXECUTED plan (explain after the run, AQE final) — committed to
  plans/r16/<name>_wide.txt by the caller;
- row identity: the same SQL/operator run with the width FORCED to the
  32 floor vs the derived width — count + order-insensitive hash-sum
  must match exactly;
- task-time quantiles of the widened exchange stage (REST taskSummary),
  the no-straggler evidence (guide §2.5).

Usage: python tools/probe_wide_widths.py <mode> <sf_dir> <out_json>
  mode ∈ {incmh, incemb, pairs, pca}
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bdt_spark.session import get_spark  # noqa: E402
from bdt_spark.sources.io import (  # noqa: E402
    exchange_width_for_bytes,
    fixture_scan_bytes,
    load_fixture_tables,
)


def _hash_sum(df) -> tuple[int, int]:
    r = df.selectExpr(
        "count(*) AS c", "sum(cast(hash(*) AS BIGINT)) AS h"
    ).collect()[0]
    return int(r.c), int(r.h or 0)


def _stage_rows(spark):
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages"
    ) as r:
        return json.load(r), ui, app


def _task_quantiles(spark, min_tasks: int):
    """Duration quantiles of completed stages with >= min_tasks tasks —
    the widened-exchange stages. Returns per-stage summaries."""
    import urllib.request

    stages, ui, app = _stage_rows(spark)
    out = []
    for s in stages:
        if s.get("status") != "COMPLETE":
            continue
        if s.get("numCompleteTasks", 0) < min_tasks:
            continue
        sid, att = s["stageId"], s["attemptId"]
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}/"
                "taskSummary?quantiles=0.0,0.25,0.5,0.75,1.0"
            ) as r:
                ts = json.load(r)
            q = [round(x / 1e3, 2) for x in ts["executorRunTime"]]
        except Exception:
            q = None
        out.append(
            {
                "stage": sid,
                "name": s.get("name", "").split("\n")[0][:80],
                "tasks": s.get("numCompleteTasks"),
                "run_s_quantiles_min_q1_med_q3_max": q,
                "shuffle_write_mb": round(
                    s.get("shuffleWriteBytes", 0) / 1e6, 1
                ),
                "shuffle_read_mb": round(
                    s.get("shuffleReadBytes", 0) / 1e6, 1
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


def _executed_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    mode, sf_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    # UI on: the task-quantile evidence reads the status REST API
    spark = get_spark(
        f"probe_wide_{mode}", extra_conf={"spark.ui.enabled": "true"}
    )
    load_fixture_tables(spark, sf_dir, force=True)
    res: dict = {"mode": mode, "sf_dir": sf_dir}

    if mode == "incmh":
        from bdt_spark.plans.pipeline_dedup import _incremental_minhash_sql

        b = fixture_scan_bytes(spark, "documents")
        w = exchange_width_for_bytes(b)
        res["scan_bytes"] = b
        res["derived_width"] = w
        assert w > 32, f"width {w} not above floor — shard too small"
        mk = lambda width: spark.sql(  # noqa: E731
            _incremental_minhash_sql("spark", width=width)
        )
    elif mode == "incemb":
        from bdt_spark.plans.pipeline_dedup import (
            _incremental_embedding_sql,
        )

        b = fixture_scan_bytes(spark, "embeddings")
        w = exchange_width_for_bytes(b)
        res["scan_bytes"] = b
        res["derived_width"] = w
        assert w > 32, f"width {w} not above floor — shard too small"
        mk = lambda width: spark.sql(  # noqa: E731
            _incremental_embedding_sql("spark", exchange=True, width=width)
        )
    elif mode == "pairs":
        from bdt_spark.operators.dedup import minhash_pairs

        b = fixture_scan_bytes(spark, "documents")
        w = exchange_width_for_bytes(b)
        res["scan_bytes"] = b
        res["derived_width"] = w
        assert w > 32, f"width {w} not above floor — shard too small"
        docs = spark.table("documents")
        # wide arm passes None = the operator's OWN derivation (from its
        # Catalyst input-size estimate), so the executed plan shows the
        # real default path; floor arm pins the literal 32
        mk = lambda width: minhash_pairs(  # noqa: E731
            docs, n_partitions=(None if width != 32 else 32)
        )
    elif mode == "pca":
        from bdt_spark.plans.pipeline_similarity import _pca_power_sql

        b = fixture_scan_bytes(spark, "embeddings")
        w = exchange_width_for_bytes(b * 64)
        res["scan_bytes"] = b
        res["derived_width"] = w
        assert w > 32, f"width {w} not above floor — shard too small"
        mk = lambda width: spark.sql(  # noqa: E731
            _pca_power_sql("spark", width=width)
        )
    else:
        raise SystemExit(f"unknown mode {mode}")

    # WIDE (derived) run first — the plan/quantile evidence
    spark.sparkContext.setJobDescription(f"probe_wide_{mode}: wide w={w}")
    t0 = time.perf_counter()
    wide_df = mk(w)
    wide = _hash_sum(wide_df)
    res["wide_wall_s"] = round(time.perf_counter() - t0, 1)
    res["wide_count"], res["wide_hash_sum"] = wide
    res["wide_plan"] = _executed_plan(wide_df)
    res["wide_stage_quantiles"] = _task_quantiles(spark, min_tasks=max(48, w))
    from bdt_spark.operators.cacheutil import release

    release(wide_df)
    # checkpoint the wide-arm evidence before the floor arm: the control
    # run can die where the wide run survived (observed: minhash_pairs
    # floor w=32 OOMs the default 8g heap on the 576 MB shard — 2x the
    # rows per persisted partition — while the derived w=64 completes)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)

    # FLOOR (literal 32) run — row-identity control
    spark.sparkContext.setJobDescription(f"probe_wide_{mode}: floor w=32")
    t0 = time.perf_counter()
    floor_df = mk(32)
    floor = _hash_sum(floor_df)
    res["floor_wall_s"] = round(time.perf_counter() - t0, 1)
    res["floor_count"], res["floor_hash_sum"] = floor
    release(floor_df)

    res["rows_identical"] = wide == floor
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(
        json.dumps(
            {
                k: v
                for k, v in res.items()
                if k not in ("wide_plan", "wide_stage_quantiles")
            }
        )
    )
    print("rows_identical:", res["rows_identical"])
    spark.stop()


if __name__ == "__main__":
    main()
