"""Clustered (range-partitioned, sorted) parquet layout.

The reference writes whatever order the scan produced (convert.rs:14-54).
At 100 TB, write layout IS query performance: range-partitioning by a
filter column and sorting within partitions gives every parquet row group
a tight min/max envelope, so later scans with predicates on that column
skip whole row groups (and whole files) from footer statistics alone —
no index structure needed.

For point lookups on OTHER columns — high-cardinality ids scattered
across the cluster order, where every row group's min/max spans the whole
domain — `bloom_filter_cols` writes a parquet bloom filter per row group.
parquet-mr's row-group filter then proves absence without reading data
pages: measured in tests/test_layout.py, an absent-key equality scan
reads 0 rows with blooms vs the full file without. That is the shape of
a 100 TB id-lookup: most row groups don't contain the key, and the bloom
says so from the footer.

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
    bloom_filter_cols: list[str] | None = None,
    bloom_expected_ndv: int | None = None,
) -> None:
    """Write `df` as parquet range-clustered on `cluster_by` columns.

    `bloom_filter_cols` enables a per-row-group bloom filter on each named
    column (`parquet.bloom.filter.enabled#col`) for point-lookup pruning
    that min/max stats can't give on scattered high-cardinality values.
    `bloom_expected_ndv` sizes the filters (per row group); leave None for
    parquet-mr's default sizing."""
    if not cluster_by:
        raise ValueError("cluster_by must name at least one column")
    if num_partitions is not None and num_partitions < 1:
        raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
    missing = [
        c for c in (bloom_filter_cols or []) if c not in df.columns
    ]
    if missing:
        raise ValueError(f"bloom_filter_cols not in DataFrame: {missing}")
    cols = [df[c] for c in cluster_by]
    part = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions is not None
        else df.repartitionByRange(*cols)
    )
    writer = part.sortWithinPartitions(*cols).write.mode(mode)
    for c in bloom_filter_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        if bloom_expected_ndv:
            writer = writer.option(
                f"parquet.bloom.filter.expected.ndv#{c}",
                str(bloom_expected_ndv),
            )
    writer.parquet(path)
