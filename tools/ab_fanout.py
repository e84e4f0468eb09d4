"""Same-process on/off A/B of the documents scan fan-out, per query.

Decides FANOUT_DOCS_QUERIES membership (plans/registry.py) by
measurement instead of guessing: for each candidate query, alternate
fan-out ON and OFF runs in ONE Spark process (interleaved OFF,ON pairs
x REPS so JIT/codegen warm-up and host drift hit both arms equally —
the r11 lesson that fresh-process timings are 2-3x in-bench numbers),
then print the per-arm medians and the speedup.

ON  = registry.FANOUT_DOCS_QUERIES contains the query (hint rewrite
      fires iff the fixture is under-split, which it is at every test sf)
OFF = membership removed -> plain scan (r10 behavior)

Usage: python tools/ab_fanout.py /tmp/sf1 [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 3

# Every sql_query that scans documents and is not already a confirmed
# winner — including the "surely cheap" ones, so the decision table in
# SCALE.md shows the negatives too.
DEFAULT_CANDIDATES = [
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    "text_substring_contamination",
    "text_duplicate_span_ratio",
    "text_pmi_cooccurrence",
    "text_inverted_index",
    "text_idf_rarity_score",
    "text_unigram_logprob_score",
    "text_topk_terms_per_lang",
    "text_repetition_filter",
    "text_outlier_clipping",
    "text_langid_heuristic",
    "text_fingerprint",
    "text_token_counts",
    "text_quality_scores",
    "text_pii_redaction",
    "text_feature_auc_mann_whitney",
    "tokens_bpe_merge_candidates",
    "dedup_exact_text",
    "dedup_exact_normalized",
    "dedup_incremental_snapshot",
    # confirmed winners, re-verified under the hint mechanism:
    "text_winnowing_fingerprints",
    "text_tfidf_topk_similar",
    "text_naive_bayes_langid",
    "text_benchmark_decontamination",
    "dedup_prefix_filter_jaccard",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    names = sys.argv[2:] or DEFAULT_CANDIDATES

    from bdt_spark.session import get_spark
    from bdt_spark import plans
    from bdt_spark.plans import registry
    from bdt_spark.operators.cacheutil import release
    from bdt_spark.sources import io

    spark = get_spark("ab_fanout")
    # warm-up: codegen + pandas worker pool
    spark.range(1000).selectExpr("sum(id)").collect()

    io.load_fixture_tables(spark, sf_dir)
    key = id(spark._jsparkSession)
    assert io._UNDERSPLIT.get(key), (
        "fixture not under-split at this sf — A/B is meaningless"
    )

    def run(name: str) -> float:
        spec = plans.get_query(name)
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.count()
        dt = time.perf_counter() - t0
        release(df)
        return dt

    base_membership = registry.FANOUT_DOCS_QUERIES
    print(f"# sf_dir={sf_dir} reps={REPS} (interleaved off/on)")
    print(f"{'query':36s} {'off':>8s} {'on':>8s}  on/off")
    for name in names:
        offs, ons = [], []
        try:
            run(name)  # per-query warm-up, outside both arms
            for _ in range(REPS):
                registry.FANOUT_DOCS_QUERIES = base_membership - {name}
                offs.append(run(name))
                registry.FANOUT_DOCS_QUERIES = base_membership | {name}
                ons.append(run(name))
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"{name:36s} ERROR {e}")
            continue
        finally:
            registry.FANOUT_DOCS_QUERIES = base_membership
        off_m, on_m = median(offs), median(ons)
        print(
            f"{name:36s} {off_m:8.3f} {on_m:8.3f}  {on_m / off_m:5.2f}x"
            f"   offs={[round(x, 2) for x in offs]}"
            f" ons={[round(x, 2) for x in ons]}"
        )
        try:
            spark._jvm.System.gc()
        except Exception:
            pass


if __name__ == "__main__":
    main()
