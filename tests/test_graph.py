"""connected_components: correctness on known graphs and bounded lineage
across iterations (periodic localCheckpoint)."""

import pytest

from bdt_spark.operators.graph import connected_components


def test_path_graph_single_cluster(spark):
    # an 8-node path needs ~7 propagation rounds — crosses a checkpoint
    # boundary (checkpoint_every=5) on the way to the fixpoint
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "a int, b int"
    )
    got = {
        (r.cluster_id, r.node)
        for r in connected_components(pairs, "a", "b").collect()
    }
    assert got == {(0, i) for i in range(8)}


def test_two_components_and_dup_edges(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (10, 11), (11, 10)], "a int, b int"
    )
    got = {
        (r.cluster_id, r.node)
        for r in connected_components(pairs, "a", "b").collect()
    }
    assert got == {(1, 1), (1, 2), (1, 3), (10, 10), (10, 11)}


@pytest.mark.slow
def test_lineage_is_truncated(spark):
    """After N iterations the result plan must hang off a checkpointed RDD
    scan with a strictly shorter join chain than the uncheckpointed loop.

    Kept to 4 iterations deliberately: the UNcheckpointed plan string
    nests InMemoryRelations ~2^iters — at 11 iterations merely rendering
    it for AQE OOMs the driver (observed), which is exactly the failure
    mode the periodic checkpoint bounds. (r13: shrunk from a diameter-6 /
    7-iteration pair — the property needs only >=1 checkpoint boundary
    plus >=1 surviving post-checkpoint iteration, and the 2^iters plan
    rendering made the larger instance the suite's 2nd-slowest test.)"""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "a int, b int"
    )
    # path diameter is 4; convergence DETECTION needs one further
    # no-change round, so 5 iterations (4 would now raise non-converged)
    plan_ck = (
        connected_components(pairs, "a", "b", max_iters=5, checkpoint_every=3)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    plan_no = (
        connected_components(pairs, "a", "b", max_iters=5, checkpoint_every=100)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the surviving join chain above the truncation point is strictly
    # shorter than the full-lineage loop's, and absolutely shallow (only
    # the 2 post-checkpoint iterations survive in the plan)
    assert plan_ck.count("Join") < plan_no.count("Join")
    assert plan_ck.count("Join") <= 10


def test_nonpositive_max_iters_rejected(spark):
    import pytest

    from bdt_spark.operators.graph import connected_components

    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="max_iters"):
        connected_components(pairs, "a", "b", max_iters=0)


def _persistent_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())


def test_release_drops_label_cache_and_checkpoints(spark):
    """cacheutil ownership contract on the CC loop: after release() the
    final label cache AND every localCheckpoint block are gone — a long
    chain with checkpoint_every=2 exercises the superseded-checkpoint
    drop (iteration k's checkpoint is freed when iteration k+2's lands)
    as well as the end-of-life drop of the last live checkpoint."""
    from bdt_spark.operators.cacheutil import release

    before = _persistent_ids(spark)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a int, b int"
    )
    out = connected_components(
        pairs, "a", "b", max_iters=20, checkpoint_every=2
    )
    got = {(r.cluster_id, r.node) for r in out.collect()}
    assert got == {(0, i) for i in range(13)}
    release(out)
    leaked = _persistent_ids(spark) - before
    assert leaked == set(), f"CC left persisted RDDs: {sorted(leaked)}"


def test_release_without_checkpoints_leaves_no_residue(spark):
    """Short graphs converge before the first checkpoint boundary: the
    only owned resource is the persisted label table."""
    from bdt_spark.operators.cacheutil import release

    before = _persistent_ids(spark)
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "a int, b int")
    out = connected_components(pairs, "a", "b")
    assert out.count() == 4
    release(out)
    assert _persistent_ids(spark) - before == set()


def test_nonconvergence_cleanup_leaves_no_residue(spark):
    """The loud non-convergence raise must not leak edges/labels/
    checkpoint blocks either."""
    import pytest

    from bdt_spark.operators.cacheutil import release  # noqa: F401

    before = _persistent_ids(spark)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "a int, b int"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, "a", "b", max_iters=3, checkpoint_every=2)
    leaked = _persistent_ids(spark) - before
    assert leaked == set(), f"non-convergence leaked: {sorted(leaked)}"
