"""Probe a directory-of-part-files table layout (VERDICT r12 #5).

Every shipped fixture is a single parquet file, so directory-backed
tables (reference `utils.rs:53-87`, `README.md:115` — DataFusion
listing-table behavior; Spark reads a directory natively) were
pytest-covered but no bench or scale point ever read one — and the
fan-out gate's "production no-op" claim (a many-part table has >= cores
scan splits, so the under-split condition is false and fanout_rewrite
adds nothing — sources/io.py:load_fixture_tables) was asserted, not
measured. This probe:

1. splits `<src>/documents.parquet` into N part files under
   `<dst>/documents.parquet/` (a DIRECTORY with the table-file name, so
   the extension-dispatch registration path is unchanged), symlinking
   every other fixture table as-is;
2. registers the parts dir via load_fixture_tables and asserts the
   fan-out gate recorded NOTHING under-split (the no-op claim, measured);
3. runs a text-family subset against the single-file dir (fanned plan)
   and the parts dir (native splits), reporting per-query medians —
   the claim holds if the parts-dir timings match the fanned
   single-file plan.

Usage: python tools/probe_dir_parts.py [src_dir] [dst_dir] [n_parts] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = (
    "text_quality_scores",
    "text_naive_bayes_langid",
    "text_idf_rarity_score",
    "dedup_exact_text",
    "text_pmi_cooccurrence",
)


def split_documents(src_dir: str, dst_dir: str, n_parts: int) -> None:
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    parts_dir = os.path.join(dst_dir, "documents.parquet")
    if os.path.isdir(parts_dir) and len(os.listdir(parts_dir)) == n_parts:
        return
    os.makedirs(parts_dir, exist_ok=True)
    tbl = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    n = tbl.num_rows
    step = (n + n_parts - 1) // n_parts
    for i in range(n_parts):
        chunk = tbl.slice(i * step, step)
        if chunk.num_rows == 0:
            break
        pq.write_table(
            chunk,
            os.path.join(parts_dir, f"part-{i:05d}.parquet"),
            compression="zstd",
        )
    for f in os.listdir(src_dir):
        if f == "documents.parquet" or not f.endswith(".parquet"):
            continue
        link = os.path.join(dst_dir, f)
        if not os.path.exists(link):
            os.symlink(os.path.join(src_dir, f), link)


def time_subset(spark, sf_dir: str, reps: int) -> dict[str, float]:
    import bdt_spark.plans as plans
    from bdt_spark.sources.io import load_fixture_tables

    out: dict[str, float] = {}
    for name in SUBSET:
        fn = plans.get_query(name).fn
        fn(spark, sf_dir).collect()  # warm
        runs = []
        for _ in range(reps):
            load_fixture_tables(spark, sf_dir, force=True)
            t0 = time.time()
            fn(spark, sf_dir).collect()
            runs.append(time.time() - t0)
        out[name] = round(statistics.median(runs), 2)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_parts"
    n_parts = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    t0 = time.time()
    split_documents(src, dst, n_parts)
    print(f"split into {n_parts} parts: {time.time() - t0:.1f}s", flush=True)

    from bdt_spark.session import get_spark
    from bdt_spark.sources import io as bio

    spark = get_spark("dir_parts_probe", shuffle_partitions=32)
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    key = id(spark._jsparkSession)
    bio.load_fixture_tables(spark, dst, force=True)
    under = bio._UNDERSPLIT.get(key, {})
    print(f"parts dir under-split record: {under} (claim: empty)")
    assert under == {}, "fan-out gate recorded a multi-part dir as under-split"
    bio.load_fixture_tables(spark, src, force=True)
    under_single = bio._UNDERSPLIT.get(key, {})
    print(f"single-file under-split record: {under_single}")

    single = time_subset(spark, src, reps)
    parts = time_subset(spark, dst, reps)
    print(f"{'query':<32}{'single(fanned)':>15}{'parts(native)':>15}{'ratio':>8}")
    for q in SUBSET:
        r = parts[q] / single[q] if single[q] else float("nan")
        print(f"{q:<32}{single[q]:>15}{parts[q]:>15}{r:>8.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
