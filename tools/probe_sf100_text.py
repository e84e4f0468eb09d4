"""sf100 text-family probe (VERDICT r11 #6): push winnowing, NB-langid,
and TF-IDF to a documents-only sf100 shard (5M docs — gen_scale.py
K=1000 from sf0.1) and confirm the per-gram cost stays flat, i.e. no
stage goes superlinear past the largest previously-measured point.

Protocol: ONE process, trivial warm-up first, then for each query one
timed run at sf10 followed by one at sf100 — cross-sf ratios are taken
within the same process/JIT regime (the r11 lesson: fresh-process
timings run 2-3x in-bench numbers). Gram volume (8-char grams =
sum(len(text)-7)) is measured per sf so the winnowing wall divides into
us/gram, comparable with the SCALE.md r11 profile (1.90 us/gram sf0.1,
1.99 sf1).

The sf100 shard has 41 row groups (>= 32 cores), so the under-split
fan-out gate correctly does NOT fire there — this probe also exercises
the production-layout path of the r12 per-query opt-in.

Usage: python tools/probe_sf100_text.py [sf10_dir] [sf100_dir]
PROBE_QUERIES=name,name overrides the query list (e.g. the r12 dedup
probe runs dedup_minhash_lsh,dedup_simhash over the same shards).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    q
    for q in os.environ.get(
        "PROBE_QUERIES",
        "text_winnowing_fingerprints,text_naive_bayes_langid,"
        "text_tfidf_topk_similar",
    ).split(",")
    if q
]


def main() -> None:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    sf100 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100docs"

    from bdt_spark.session import get_spark
    from bdt_spark import plans
    from bdt_spark.operators.cacheutil import release
    from bdt_spark.sources.io import load_fixture_tables

    # 2.5B grams over the default 32 shuffle partitions is ~78M rows per
    # sort partition — the per-doc MIN window's sort buffers blow the 8g
    # local heap (GCLocker alloc failures). The production lever is the
    # same one a 1000-executor job uses: INITIAL shuffle partitions scale
    # with data volume and AQE coalesces down, never up. 256 partitions
    # keeps each sort under ~10M grams; both sfs run at the same setting
    # so the growth ratios stay like-for-like.
    spark = get_spark(
        "probe_sf100",
        shuffle_partitions=int(os.environ.get("PROBE_SHUFFLE", "256")),
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    def gram_stats(sf_dir):
        load_fixture_tables(spark, sf_dir, force=True)
        if not spark.catalog.tableExists("documents"):
            # non-text shard (e.g. the embeddings-only sf100 probe):
            # report corpus row count of whatever tables are present
            return None
        [r] = spark.sql(
            "SELECT COUNT(*) AS n_docs, "
            "SUM(GREATEST(LENGTH(text) - 7, 0)) AS grams, "
            "AVG(LENGTH(text)) AS avg_len FROM documents"
        ).collect()
        return r.n_docs, r.grams, r.avg_len

    def run(name, sf_dir):
        load_fixture_tables(spark, sf_dir, force=True)
        spec = plans.get_query(name)
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        release(df)
        return dt, n

    d10 = gram_stats(sf10)
    d100 = gram_stats(sf100)
    if d10 and d100:
        print(f"sf10:  docs={d10[0]:,} grams={d10[1]:,} avg_len={d10[2]:.0f}")
        print(f"sf100: docs={d100[0]:,} grams={d100[1]:,} avg_len={d100[2]:.0f}")
        print(
            f"gram growth: {d100[1] / d10[1]:.2f}x for "
            f"{d100[0] / d10[0]:.0f}x docs"
        )

    for name in QUERIES:
        t10, n10 = run(name, sf10)
        t100, n100 = run(name, sf100)
        line = (
            f"{name}: sf10 {t10:.1f}s ({n10} rows) -> sf100 {t100:.1f}s "
            f"({n100} rows), wall ratio {t100 / t10:.1f}x"
        )
        if name == "text_winnowing_fingerprints":
            line += (
                f"; us/gram {t10 * 1e6 / d10[1]:.2f} -> "
                f"{t100 * 1e6 / d100[1]:.2f}"
            )
        print(line, flush=True)


if __name__ == "__main__":
    main()
