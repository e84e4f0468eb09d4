"""Merge the r13 re-baseline runs (VERDICT r12 #1) into per-round
artifacts: median-of-3-fresh-processes per metric, plus the max spread
((max-min)/median) so the <=25% spread bar is checkable in the file.

Usage: python tools/aggregate_rebaseline.py
Reads  bench_results/r13_runs/sf01_run{1..3}.json and sf10_run{1..3}.json
Writes bench_results/bench_sf01_r13.json and bench_sf10_r13.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys

RUNS_DIR = "bench_results/r13_runs"

HOST_EPOCH_NOTE = (
    "host epoch r13: all six processes ran sequentially on the post-reboot "
    "host (the r12 artifacts interleaved pre- and post-reboot runs — "
    "SCALE.md r12 documents 1.3-2x in-bench vs isolated deltas with "
    "explain-equal plans); round-13+ deltas compute against THESE numbers"
)


def merge(prefix: str, out_name: str) -> dict | None:
    runs = []
    for i in (1, 2, 3):
        # prefer the sidecar (full detail incl. the sf1 block, which the
        # stdout envelope sheds when the line would exceed ~1900 bytes)
        p = os.path.join(RUNS_DIR, f"{prefix}_full_run{i}.json")
        if not os.path.exists(p):
            p = os.path.join(RUNS_DIR, f"{prefix}_run{i}.json")
        if not os.path.exists(p) or os.path.getsize(p) == 0:
            print(f"missing {p}", file=sys.stderr)
            continue
        with open(p) as f:
            runs.append(json.load(f))
    if not runs:
        return None

    def med_spread(vals: list[float]) -> tuple[float, float]:
        vals = [v for v in vals if v > 0]
        if not vals:
            return -1.0, 0.0
        m = statistics.median(vals)
        return round(m, 3), round((max(vals) - min(vals)) / m, 3) if m else 0.0

    names = set()
    for r in runs:
        names.update(r.get("queries", {}))
    queries, spreads = {}, {}
    for n in sorted(names):
        m, s = med_spread([r.get("queries", {}).get(n, -1) for r in runs])
        queries[n] = m
        spreads[n] = s
    out = {
        "metric": runs[0]["metric"],
        "value": round(sum(v for v in queries.values() if v > 0), 3),
        "unit": "sec",
        "stable_set_total": round(
            statistics.median([r.get("stable_set_total", -1) for r in runs]), 3
        ),
        "queries": queries,
        "per_query_spread": spreads,
        "max_spread": max(spreads.values()),
        "sf": runs[0]["sf"],
        "protocol": "median over 3 fresh processes x (in-process "
        + runs[0].get("protocol", "median"),
        "n_processes": len(runs),
        "host_epoch": HOST_EPOCH_NOTE,
    }
    if any("sf1_queries" in r for r in runs):
        sf1_names = set()
        for r in runs:
            sf1_names.update(r.get("sf1_queries", {}))
        sf1 = {}
        for n in sorted(sf1_names):
            m, _ = med_spread([r.get("sf1_queries", {}).get(n, -1) for r in runs])
            sf1[n] = m
        out["sf1_queries"] = sf1
        out["sf1_total"] = round(sum(v for v in sf1.values() if v > 0), 3)
    with open(os.path.join("bench_results", out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"{out_name}: value={out['value']} stable={out['stable_set_total']} "
        f"max_spread={out['max_spread']} sf1_total={out.get('sf1_total')}"
    )
    return out


if __name__ == "__main__":
    merge("sf01", "bench_sf01_r13.json")
    merge("sf10", "bench_sf10_r13.json")
