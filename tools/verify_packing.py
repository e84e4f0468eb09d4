"""Independent single-process verifier for the sequence-packing queries.

The packing queries' DuckDB recursive-CTE oracles are O(n^2) in docs per
group and infeasible beyond ~10k docs (SCALE.md), so large-SF sweeps skip
them. This tool closes that gap: it recomputes first-fit / best-fit-
decreasing packing in plain pandas from the parquet fixture (no Spark, no
DuckDB) and compares the Spark results pack-by-pack. What it actually
verifies is the distributed machinery — that groupBy().applyInPandas
delivers every group complete and exactly once, that the per-group Arrow
batches arrive in a state the packer can canonically order, and that the
downstream aggregation is right — against a single-process reference
whose correctness is inspectable by eye.

Usage: python tools/verify_packing.py [sf_dir]      (default sf0.1)
Exit code 0 = all three queries match exactly.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdt_spark.plans.pipeline import N_PACK_SHARDS, PACK_BUDGET  # noqa: E402


def _tokens(sf_dir: str) -> pd.DataFrame:
    docs = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    # mirror Spark's size(split(text, ' ')): literal single-space split,
    # consecutive spaces yield empty tokens, "" -> [""] -> 1
    docs["tokens"] = docs["text"].map(lambda t: len(t.split(" ")))
    return docs[["lang", "doc_id", "tokens"]]


def _first_fit(sizes: list[int]) -> list[int]:
    """Stream-order first-fit; returns the pack id per doc."""
    ids, fill, pid = [], 0, 0
    for tk in sizes:
        if fill > 0 and fill + tk > PACK_BUDGET:
            pid, fill = pid + 1, tk
        else:
            fill += tk
        ids.append(pid)
    return ids


def ref_sequence_packing(toks: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for lang, g in toks.sort_values(["lang", "doc_id"]).groupby("lang", sort=True):
        g = g.reset_index(drop=True)
        g["pack_id"] = _first_fit([int(x) for x in g["tokens"]])
        agg = g.groupby("pack_id").agg(
            n_docs=("doc_id", "size"),
            pack_tokens=("tokens", "sum"),
            first_doc=("doc_id", "min"),
            last_doc=("doc_id", "max"),
        )
        for pid, r in agg.iterrows():
            rows.append((lang, pid, *[int(v) for v in r]))
    return pd.DataFrame(
        rows,
        columns=["lang", "pack_id", "n_docs", "pack_tokens", "first_doc", "last_doc"],
    )


def ref_sequence_packing_sharded(toks: pd.DataFrame) -> pd.DataFrame:
    t = toks.copy()
    t["shard"] = (t["doc_id"] % N_PACK_SHARDS).astype(int)
    rows = []
    for (lang, shard), g in t.sort_values(["lang", "shard", "doc_id"]).groupby(
        ["lang", "shard"], sort=True
    ):
        g = g.reset_index(drop=True)
        g["pack_id"] = _first_fit([int(x) for x in g["tokens"]])
        agg = g.groupby("pack_id").agg(
            n_docs=("doc_id", "size"), pack_tokens=("tokens", "sum")
        )
        for pid, r in agg.iterrows():
            rows.append((lang, shard, pid, int(r["n_docs"]), int(r["pack_tokens"])))
    return pd.DataFrame(
        rows, columns=["lang", "shard", "pack_id", "n_docs", "pack_tokens"]
    )


def ref_packing_efficiency(toks: pd.DataFrame) -> pd.DataFrame:
    import bisect

    rows = []
    for lang, g in toks.sort_values(["lang", "doc_id"]).groupby("lang", sort=True):
        sizes = [int(x) for x in g["tokens"]]
        fills = []
        for tk in sizes:
            if fills and fills[-1] + tk <= PACK_BUDGET:
                fills[-1] += tk
            else:
                fills.append(tk)
        bfd = []
        for tk in sorted(sizes, reverse=True):
            i = bisect.bisect_right(bfd, PACK_BUDGET - tk) - 1
            if i >= 0:
                bisect.insort(bfd, bfd.pop(i) + tk)
            else:
                bisect.insort(bfd, tk)
        cap = sum(max(PACK_BUDGET, f) for f in fills)
        total = sum(sizes)
        rows.append(
            (
                lang,
                len(fills),
                total,
                round(1.0 - total / float(cap), 6),
                len(bfd) <= len(fills),
                len(bfd) >= -(-total // PACK_BUDGET),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "lang",
            "greedy_bins",
            "total_tokens",
            "greedy_waste_pct",
            "bfd_no_worse",
            "bfd_lower_bound_ok",
        ],
    )


def _compare(name: str, spark_df, ref: pd.DataFrame, keys: list[str]) -> bool:
    got = spark_df.toPandas()
    got = got.sort_values(keys).reset_index(drop=True)
    ref = ref.sort_values(keys).reset_index(drop=True)
    if list(got.columns) != list(ref.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(ref.columns)}")
        return False
    if len(got) != len(ref):
        print(f"FAIL {name}: {len(got)} rows vs reference {len(ref)}")
        return False
    for c in got.columns:
        a, b = got[c], ref[c].astype(got[c].dtype)
        neq = a != b
        if neq.any():
            i = int(neq.idxmax())
            print(
                f"FAIL {name}: column {c} row {i}: spark={a[i]!r} ref={b[i]!r}"
            )
            return False
    print(f"PASS {name} ({len(got)} packs/groups)")
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    toks = _tokens(sf_dir)

    from bdt_spark.session import get_spark
    import bdt_spark.plans as plans

    spark = get_spark("verify_packing")
    ok = True
    ok &= _compare(
        "tokens_sequence_packing",
        plans.get_query("tokens_sequence_packing").fn(spark, sf_dir),
        ref_sequence_packing(toks),
        ["lang", "pack_id"],
    )
    ok &= _compare(
        "tokens_sequence_packing_sharded",
        plans.get_query("tokens_sequence_packing_sharded").fn(spark, sf_dir),
        ref_sequence_packing_sharded(toks),
        ["lang", "shard", "pack_id"],
    )
    ok &= _compare(
        "tokens_packing_efficiency",
        plans.get_query("tokens_packing_efficiency").fn(spark, sf_dir),
        ref_packing_efficiency(toks),
        ["lang"],
    )
    print("all match" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
