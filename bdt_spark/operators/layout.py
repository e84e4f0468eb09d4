"""Clustered (range-partitioned, sorted) parquet layout.

The reference writes whatever order the scan produced (convert.rs:14-54).
At 100 TB, write layout IS query performance: range-partitioning by a
filter column and sorting within partitions gives every parquet row group
a tight min/max envelope, so later scans with predicates on that column
skip whole row groups (and whole files) from footer statistics alone —
no index structure needed.

`write_clustered` is the writer; the proof that skipping is possible is
in the footer stats themselves (see tests/test_layout.py, which asserts
near-disjoint row-group ranges via operators/meta.py's footer reader).

Scale shape: repartitionByRange samples the column to build balanced
range bounds (one pass + one shuffle), sortWithinPartitions is a local
sort — no global sort barrier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet range-clustered on `cluster_by` columns."""
    if not cluster_by:
        raise ValueError("cluster_by must name at least one column")
    cols = [df[c] for c in cluster_by]
    part = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.mode(mode).parquet(path)
