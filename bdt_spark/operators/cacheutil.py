"""Caller-owned cache bookkeeping for operator results.

Several operators return a DataFrame whose plan references internally
persisted intermediates (ivf_probe's probe table), or that is itself
persisted (minhash_pairs / embedding_neardup_pairs on the eager path,
connected_components' label table), or whose lineage is rooted in a
localCheckpoint (the CC loop's periodic lineage truncation). The
ownership contract, standardized repo-wide:

- the CALLEE annotates the result with everything the caller now owns,
  via `transfer_ownership(result, *resources)` — a resource is either a
  persisted DataFrame (released recursively, so annotations compose
  across operator layers) or a zero-arg callable (e.g. a checkpoint-
  block drop);
- the CALLER calls `release(result)` exactly once, after it has fully
  consumed the result.

For plain persisted frames release is non-destructive: lineage stays
intact and a later action just recomputes. For checkpoint-backed frames
it is END OF LIFE — localCheckpoint blocks have no lineage behind them
by design, so an action issued after release fails loudly with Spark's
CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND rather than silently recomputing.
Callers that need the rows afterwards must collect/write them first.

`release` is a no-op on frames that were never persisted/annotated, so
callers can apply it unconditionally; the oracled query wrappers and
tests do exactly that, keeping `getPersistentRDDs` empty between
queries (asserted in tests/test_queries.py's residue check).
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import DataFrame

_ATTR = "_bdt_owned_caches"

Resource = Union[DataFrame, Callable[[], None]]


def transfer_ownership(result: DataFrame, *resources: Resource) -> DataFrame:
    """Annotate `result` with resources the caller now owns: persisted
    DataFrames (released recursively) and/or zero-arg cleanup callables."""
    deps = list(getattr(result, _ATTR, ())) + list(resources)
    setattr(result, _ATTR, deps)
    return result


def release(result: DataFrame) -> None:
    """Unpersist `result` and release every annotated resource.

    Safe and idempotent on plain persisted frames (unpersist is a no-op
    when nothing is cached; lineage stays intact so later actions just
    recompute). Checkpoint-backed resources are destroyed — see the
    module docstring for the end-of-life semantics."""
    for dep in getattr(result, _ATTR, ()):
        if callable(dep):
            dep()
        else:
            release(dep)
    setattr(result, _ATTR, [])
    result.unpersist(blocking=True)


def drop_checkpoint_blocks(df: DataFrame) -> None:
    """Free the executor blocks held by a localCheckpoint-backed frame.

    DataFrame.unpersist() cannot reach them (they are RDD-level blocks,
    not CacheManager entries), so this walks the plan's LogicalRDD
    leaves and unpersists any that still hold storage. DESTRUCTIVE:
    LocalCheckpointRDD partitions cannot be recomputed, so only call
    this when the frame (and everything whose lineage passes through
    it) is fully consumed."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                rdd = leaf.rdd()
                if rdd.getStorageLevel().isValid():
                    rdd.unpersist(True)
    except Exception:
        # best-effort: a plan shape we cannot walk just leaves blocks to
        # Spark's ContextCleaner (the pre-standardization behavior)
        pass
