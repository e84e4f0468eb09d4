"""Persistent IVF index: build determinism, probe recall vs brute force."""

import pytest

from pyspark.sql import functions as F

from bdt_spark.operators.ann import build_ivf_index, ivf_probe
from bdt_spark.sources.io import read_file


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    emb = read_file(spark, f"{sf_dir}/embeddings.parquet")
    build_ivf_index(spark, emb, path, k=10, n_iters=3)
    return path


def test_index_layout(spark, index_path):
    cen = spark.read.parquet(f"{index_path}/centroids")
    asg = spark.read.parquet(f"{index_path}/assignments")
    assert cen.count() <= 10
    assert asg.select("vec_id").distinct().count() == asg.count()
    # every vector got exactly one cluster; norms materialized at build
    assert set(asg.columns) == {"vec_id", "cluster_id", "embedding", "nrm"}
    assert asg.filter("nrm IS NULL OR nrm < 0").count() == 0


def test_probe_full_nprobe_equals_bruteforce(spark, sf_dir, index_path):
    # with nprobe = k (no pruning) the index is EXACT: it must reproduce
    # brute-force top-5 bit-for-bit — the data-independent correctness
    # property of IVF
    emb = read_file(spark, f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    got = ivf_probe(spark, index_path, queries, topk=5, nprobe=10).collect()

    from bdt_spark.operators.ann import _cos_sim_pre, _norm
    from pyspark.sql import Window

    sim = F.expr(_cos_sim_pre("q_vec", "embedding", "q_nrm", "v_nrm"))
    w = Window.partitionBy("q_id").orderBy(
        F.round(sim, 9).desc(), F.col("vec_id").asc()
    )
    truth = (
        queries.select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec"))
        .withColumn("q_nrm", F.expr(_norm("q_vec")))
        .crossJoin(emb.select("vec_id", "embedding"))
        .withColumn("v_nrm", F.expr(_norm("embedding")))
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("q_id", "vec_id", "rk")
        .collect()
    )
    assert {(r.q_id, r.vec_id, r.rk) for r in got} == {
        (r.q_id, r.vec_id, r.rk) for r in truth
    }

    # pruned probe: recall is bounded by the data (fixture embeddings'
    # cosine neighborhoods are label-independent, so ~nprobe/k is the
    # ceiling); assert the candidate pruning beats its own fraction
    pruned = ivf_probe(spark, index_path, queries, topk=5, nprobe=4).collect()
    truth_sets, got_sets = {}, {}
    for r in truth:
        truth_sets.setdefault(r.q_id, set()).add(r.vec_id)
    for r in pruned:
        got_sets.setdefault(r.q_id, set()).add(r.vec_id)
    recall = sum(
        len(got_sets[q] & truth_sets[q]) / 5 for q in truth_sets
    ) / len(truth_sets)
    assert recall >= 4 / 10, f"recall {recall} below pruning fraction"


def test_build_is_deterministic(spark, sf_dir, index_path, tmp_path):
    emb = read_file(spark, f"{sf_dir}/embeddings.parquet")
    path2 = str(tmp_path / "idx2")
    build_ivf_index(spark, emb, path2, k=10, n_iters=3)
    a1 = {
        (r.vec_id, r.cluster_id)
        for r in spark.read.parquet(f"{index_path}/assignments")
        .select("vec_id", "cluster_id").collect()
    }
    a2 = {
        (r.vec_id, r.cluster_id)
        for r in spark.read.parquet(f"{path2}/assignments")
        .select("vec_id", "cluster_id").collect()
    }
    assert a1 == a2


def test_probe_zero_norm_vectors_dropped(spark, tmp_path):
    """All-zero embeddings (no cosine direction) must be filtered out of
    probe results, not NaN-misranked (regression: unguarded 0/0)."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 0.0]),  # zero vector in the index
            (3, [0.0, 1.0]),
        ],
        "vec_id int, embedding array<double>",
    )
    path = str(tmp_path / "zidx")
    build_ivf_index(spark, emb, path, k=2, n_iters=2)
    out = ivf_probe(
        spark, path, emb.filter(F.col("vec_id") == 0), topk=3, nprobe=2
    ).collect()
    ids = [r.vec_id for r in out]
    assert 2 not in ids                      # zero vector never ranked
    assert all(r.cos_sim is not None for r in out)
    # zero-vector QUERY yields no rows rather than NaN ranks
    qz = ivf_probe(
        spark, path, emb.filter(F.col("vec_id") == 2), topk=3, nprobe=2
    ).collect()
    assert qz == []


def _scan_metrics(q, *metric_names):
    """Executed-plan leaf scan metrics for the (single) parquet scan in q."""
    q.collect()
    leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
    got = {}
    for i in range(leaves.size()):
        metrics = leaves.apply(i).metrics()
        it = metrics.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() in metric_names:
                got[kv._1()] = kv._2().value()
    missing = set(metric_names) - set(got)
    assert not missing, f"scan metrics absent: {missing}"
    return got


def test_assignments_layout_is_hive_partitioned(index_path):
    import os

    dirs = [
        d
        for d in os.listdir(f"{index_path}/assignments")
        if d.startswith("cluster_id=")
    ]
    assert len(dirs) >= 2, f"expected cluster_id=N dirs, got {dirs}"


def test_probe_isin_prunes_files(spark, index_path):
    """The probe's cluster_id isin pushdown must prune at FILE level on
    the hive layout: scanning one probed cluster opens only that
    cluster's file(s) and produces only its rows (executed-scan metrics,
    same proof style as tests/test_layout.py bloom skipping)."""
    import os

    asg = f"{index_path}/assignments"
    dirs = sorted(
        d for d in os.listdir(asg) if d.startswith("cluster_id=")
    )
    total_files = sum(
        len([f for f in os.listdir(f"{asg}/{d}") if f.endswith(".parquet")])
        for d in dirs
    )
    c0 = int(dirs[0].split("=")[1])
    c0_files = len(
        [f for f in os.listdir(f"{asg}/{dirs[0]}") if f.endswith(".parquet")]
    )
    c0_rows = spark.read.parquet(asg).filter(
        F.col("cluster_id") == c0
    ).count()
    all_rows = spark.read.parquet(asg).count()
    assert 0 < c0_rows < all_rows

    pruned = _scan_metrics(
        spark.read.parquet(asg).filter(F.col("cluster_id").isin([c0])),
        "numFiles",
        "numOutputRows",
    )
    control = _scan_metrics(
        spark.read.parquet(asg), "numFiles", "numOutputRows"
    )
    assert pruned["numFiles"] == c0_files, pruned
    assert pruned["numOutputRows"] == c0_rows, pruned
    assert control["numFiles"] == total_files
    assert control["numOutputRows"] == all_rows


def test_probe_plan_carries_partition_filter(spark, sf_dir, index_path):
    """End-to-end: the ivf_probe plan's ASSIGNMENTS scan carries a
    PartitionFilters entry on cluster_id (driver-collected partition
    filter), and a probe of a single cluster returns the same rows as
    before the layout change (exactness is pinned by the nprobe=k test
    above). The probes subtree keeps its own (unpartitioned) centroid
    scan in the plan, so match every scan's filter list, not the first."""
    from bdt_spark.operators.cacheutil import release

    emb = read_file(spark, f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") == 0)
    out = ivf_probe(spark, index_path, queries, topk=3, nprobe=1)
    rows = out.collect()
    assert len(rows) == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    release(out)
    import re

    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert filters, plan
    assert any("cluster_id" in f for f in filters), filters


def test_ivf_probe_release_leaves_no_residue(spark, sf_dir, index_path):
    """ivf_probe persists its probe table internally (lineage-intact
    MEMORY_AND_DISK, annotated caller-owned); cacheutil.release must
    drop it — and because the cache is a plain persist, an action AFTER
    release still works by recomputing through the lineage."""
    from bdt_spark.operators.cacheutil import release

    emb = read_file(spark, f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    out = ivf_probe(spark, index_path, queries, topk=3, nprobe=2)
    first = [(r.q_id, r.vec_id) for r in out.collect()]
    release(out)
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert after - before == set(), sorted(after - before)
    # recompute-after-release: same answer, no missing-block failure
    assert [(r.q_id, r.vec_id) for r in out.collect()] == first
