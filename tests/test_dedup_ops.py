"""Library dedup operators (bdt_spark.operators.dedup): NULL-safe exact
key, shingle-cache release."""

from pyspark.sql import functions as F

from bdt_spark.operators.dedup import exact_dup_groups, minhash_pairs


def test_exact_dup_null_positions_distinct(spark):
    """('a', NULL) vs (NULL, 'a') and ('a', NULL, 'b') vs ('a', 'b', NULL)
    must NOT be duplicates (regression: concat_ws drops NULLs)."""
    df = spark.createDataFrame(
        [
            (1, "a", None, "b"),
            (2, "a", "b", None),
            (3, None, "a", "b"),
            (4, "a", None, "b"),   # true duplicate of row 1
        ],
        "id int, c1 string, c2 string, c3 string",
    )
    groups = exact_dup_groups(df, ["c1", "c2", "c3"], "id").collect()
    assert len(groups) == 1
    assert groups[0].n_copies == 2 and groups[0].keep_id == 1


def test_exact_dup_length_prefix_blocks_boundary_collisions(spark):
    """('ab','c') vs ('a','bc') share the same concatenation — the
    length-prefixed key must keep them apart."""
    df = spark.createDataFrame(
        [(1, "ab", "c"), (2, "a", "bc")], "id int, x string, y string"
    )
    assert exact_dup_groups(df, ["x", "y"], "id").count() == 0


def test_minhash_hot_bucket_cap_bounds_pairs(spark):
    """One boilerplate template shared by many docs puts them all in the
    same band buckets: without a cap the candidate join emits C(n,2) pairs
    for that bucket alone. With the cap the hot buckets are dropped, the
    pair count is bounded, and the unrelated small near-dup cluster still
    comes through."""
    template = "shared license header boilerplate text repeated across corpus"
    rows = [(i, template) for i in range(40)]
    rows += [
        (100, "the quick brown fox jumps over the lazy dog today"),
        (101, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    stats: dict = {}
    capped = minhash_pairs(docs, threshold=0.3, hot_bucket_cap=10, stats=stats)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # the 40-doc template cluster (C(40,2)=780 pairs) is gone; the small
    # cluster survives; every bucket respects the cap: <= C(10,2) per bucket
    assert (100, 101) in got
    assert not any(a < 100 for a, _ in got)
    assert stats["hot_buckets_dropped"] >= 1

    # default cap is far above fixture bucket sizes -> inactive
    uncapped = minhash_pairs(docs, threshold=0.3)
    assert uncapped.count() == 40 * 39 // 2 + 1


def test_minhash_pairs_releases_shingle_cache(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different text with no shared shingles here"),
        ],
        "doc_id int, text string",
    )
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    out = minhash_pairs(docs, threshold=0.3)
    assert out.count() >= 1
    after = spark.sparkContext._jsc.getPersistentRDDs()
    # no *new* MEMORY_AND_DISK shingle cache left behind (localCheckpoint
    # blocks of the small result are not storage-level caches we track here)
    leaked = [
        rid for rid in set(after.keySet()) - before
        if "MEMORY_AND_DISK" in str(
            after.get(rid).getStorageLevel().description()
        )
    ]
    assert leaked == []
