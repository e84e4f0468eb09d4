"""Iterative label propagation (connected components) over an edge set.

The dedup pipeline runs this on the MinHash-LSH near-dup pair graph to
turn PAIRS into CLUSTERS (one survivor per duplicate group). The loop is
min-label propagation: every node starts labeled with itself; each
iteration sends labels across edges and keeps the per-node minimum;
fixpoint when no label changes. Iterations are bounded by the graph
diameter (dup clusters are tiny — 2-4 hops in practice).

Scale design:
- The edge set is the LSH-bounded candidate graph, NOT all pairs — its
  size is O(candidates), never O(n^2) in the corpus.
- Each iteration is one equi join + one partial-agg min — two narrow
  shuffles on the node key; AQE plans each one independently.
- Lineage is TRUNCATED every `checkpoint_every` iterations via an eager
  localCheckpoint: without it the logical plan doubles per iteration,
  planning time grows superlinearly, and an executor loss late in the
  loop recomputes the whole chain. localCheckpoint (non-replicated
  executor blocks) is the right tradeoff here because every iteration is
  already recomputable from the persisted edge set; a lost block costs
  one re-iteration, not correctness. (A reliable `checkpoint()` to a
  checkpoint dir is the belt-and-braces variant for multi-hour jobs.)
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    max_iters: int = 20,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Min-label connected components over an undirected pair list.

    Returns (cluster_id, node) — cluster_id is the minimum node id
    reachable from `node`. Input pairs are undirected (each row connects
    both ways); self-loops and duplicates are tolerated.
    """
    from bdt_spark.operators.cacheutil import (
        drop_checkpoint_blocks,
        transfer_ownership,
    )

    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels.count()
    live_ckpt = None  # the newest checkpoint still reachable from lineage
    for i in range(max_iters):
        msgs = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        is_ckpt_iter = (i + 1) % checkpoint_every == 0
        if is_ckpt_iter:
            # truncate lineage: the plan above this point is discarded, so
            # planning cost and failure-recompute depth stay bounded
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if is_ckpt_iter:
            # ONLY NOW is the previous checkpoint unreachable: the old
            # per-iteration labels (whose recompute lineage rooted at it)
            # were consumed by the `changed` count above and unpersisted;
            # every live frame (edges root at `pairs`, labels at the new
            # checkpoint) no longer references it. Dropping it any
            # earlier would turn an executor loss during the count into
            # a CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND job failure instead of
            # a recompute.
            if live_ckpt is not None:
                drop_checkpoint_blocks(live_ckpt)
            live_ckpt = new_labels
        if changed == 0:
            break
    else:
        # exhausted max_iters while labels were still moving: returning
        # the current labels would silently split one component into
        # several (a long dup chain surviving dedup as "distinct" docs).
        # Min-label propagation converges in <= graph diameter rounds, so
        # this means the diameter exceeds max_iters — fail loudly.
        edges.unpersist()
        labels.unpersist()
        if live_ckpt is not None:
            drop_checkpoint_blocks(live_ckpt)
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"iterations ({changed} labels still changing); the graph "
            f"diameter exceeds max_iters — raise max_iters"
        )
    edges.unpersist()
    out = labels.select(
        F.col("label").alias("cluster_id"), F.col("node").alias("node")
    )
    # caller-owned resources: the final label cache, plus the last live
    # checkpoint (still in the final labels' recompute lineage, so it
    # must outlive the result). cacheutil.release(result) frees both —
    # END OF LIFE for the result, see cacheutil's module docstring.
    resources = [labels]
    if live_ckpt is not None:
        ckpt = live_ckpt  # bind now: the loop variable is long gone later
        resources.append(lambda: drop_checkpoint_blocks(ckpt))
    return transfer_ownership(out, *resources)
