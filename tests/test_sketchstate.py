"""Incremental HLL sketch state: batch folds, merge-on-read estimates,
replay idempotency, compaction invariance."""

import pyspark.sql.functions as F

from bdt_spark.operators.sketchstate import (
    compact_sketch_state,
    estimate_distinct,
    update_sketch_state,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_two_batches_estimate_matches_exact_union(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    state = str(tmp_path / "state")
    b1 = docs.filter("doc_id % 2 = 0")
    b2 = docs.filter("doc_id % 2 = 1")
    update_sketch_state(spark, state, b1, "doc_id", batch_id="b1")
    update_sketch_state(spark, state, b2, "doc_id", batch_id="b2")
    est = estimate_distinct(spark, state).collect()[0]
    exact = docs.select("doc_id").distinct().count()
    # at fixture cardinality the HLL sparse mode is exact; assert the
    # mergeable-state contract tightly, with a 2% property fallback bound
    assert abs(est["est_distinct"] - exact) / exact < 0.02
    assert est["n_rows"] == docs.count()
    assert est["n_batches"] == 2


def test_replay_is_idempotent(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    state = str(tmp_path / "state")
    b1 = docs.filter("doc_id % 2 = 0")
    update_sketch_state(spark, state, b1, "doc_id", batch_id="b1")
    first = estimate_distinct(spark, state).collect()[0]
    # at-least-once upstream delivery: the same batch arrives again
    update_sketch_state(spark, state, b1, "doc_id", batch_id="b1")
    again = estimate_distinct(spark, state).collect()[0]
    assert again["est_distinct"] == first["est_distinct"]
    assert again["n_rows"] == first["n_rows"]
    assert again["n_batches"] == 1


def test_grouped_estimates_per_lang(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    state = str(tmp_path / "state")
    update_sketch_state(
        spark, state, docs.filter("doc_id % 2 = 0"), "doc_id",
        group_cols=("lang",), batch_id="b1",
    )
    update_sketch_state(
        spark, state, docs.filter("doc_id % 2 = 1"), "doc_id",
        group_cols=("lang",), batch_id="b2",
    )
    est = {
        r["lang"]: r["est_distinct"]
        for r in estimate_distinct(spark, state, group_cols=("lang",)).collect()
    }
    exact = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang")
        .agg(F.count_distinct("doc_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for lang, n in exact.items():
        assert abs(est[lang] - n) / n < 0.02


def test_overlapping_batches_count_keys_once(spark, sf_dir, tmp_path):
    # distinct-ness across batches is the whole point: two batches sharing
    # half their keys must NOT double count
    docs = _docs(spark, sf_dir)
    state = str(tmp_path / "state")
    update_sketch_state(spark, state, docs.filter("doc_id < 300"), "doc_id",
                        batch_id="b1")
    update_sketch_state(spark, state, docs.filter("doc_id >= 150"), "doc_id",
                        batch_id="b2")
    est = estimate_distinct(spark, state).collect()[0]
    exact = docs.select("doc_id").distinct().count()
    assert abs(est["est_distinct"] - exact) / exact < 0.02


def test_compaction_preserves_estimates(spark, sf_dir, tmp_path):
    import os

    docs = _docs(spark, sf_dir)
    state = str(tmp_path / "state")
    for i in range(4):
        update_sketch_state(
            spark, state, docs.filter(f"doc_id % 4 = {i}"), "doc_id",
            group_cols=("lang",), batch_id=f"b{i}",
        )
    before = {
        r["lang"]: r["est_distinct"]
        for r in estimate_distinct(spark, state, group_cols=("lang",)).collect()
    }
    compact_sketch_state(spark, state, group_cols=("lang",))
    after_rows = estimate_distinct(spark, state, group_cols=("lang",)).collect()
    after = {r["lang"]: r["est_distinct"] for r in after_rows}
    assert after == before
    # state folded to one partition; n_rows carried through
    parts = [d for d in os.listdir(state) if d.startswith("batch=")]
    assert len(parts) == 1
    assert {r["n_batches"] for r in after_rows} == {1}
    assert sum(r["n_rows"] for r in after_rows) == docs.count()
