"""write_clustered: range-partitioned sorted parquet must yield row groups
whose min/max envelopes on the cluster column barely overlap — the footer-
stats property that lets scans skip row groups wholesale."""

import glob

from bdt_spark.operators.layout import write_clustered
from bdt_spark.operators.meta import read_parquet_meta
from bdt_spark.sources.io import read_file


def _shipdate_ranges(path):
    ranges = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        meta = read_parquet_meta(f)
        for rg in meta.row_groups:
            col = next(c for c in rg.columns if c.column == "l_shipdate")
            ranges.append((col.min, col.max))
    return ranges


def test_clustered_write_has_disjoint_rowgroup_ranges(spark, sf_dir, tmp_path):
    li = read_file(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    out = str(tmp_path / "li_clustered")
    write_clustered(li, out, ["l_shipdate"], num_partitions=8)

    ranges = [r for r in _shipdate_ranges(out) if r[0] is not None]
    assert len(ranges) >= 8
    ranges.sort()
    # each row group's envelope must not span the whole column domain:
    # overlap only at boundaries (range partitioner cut points)
    overlapping = sum(
        1 for (a_min, a_max), (b_min, b_max) in zip(ranges, ranges[1:])
        if a_max > b_min
    )
    assert overlapping == 0, f"row-group ranges overlap: {ranges}"

    # result content unchanged
    assert (
        spark.read.parquet(out).count() == li.count()
    )


def _scan_output_rows(spark, path, pred):
    """Rows the parquet scan actually produced (post row-group pruning) —
    the executed leaf scan node's numOutputRows metric."""
    q = spark.read.parquet(path).filter(pred)
    q.collect()
    leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
    metrics = leaves.apply(0).metrics()
    it = metrics.iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() == "numOutputRows":
            return kv._2().value()
    raise AssertionError("no numOutputRows metric on scan node")


def test_bloom_filter_prunes_scattered_id_lookup(spark, tmp_path):
    """Equality lookup on a high-cardinality column scattered across the
    cluster order: every row group's min/max spans the full domain, so
    stats alone prune NOTHING — only the bloom filter proves absence.
    Assert the bloom-enabled layout reads 0 rows for an absent key while
    the bloom-less control reads the entire file."""
    from pyspark.sql import functions as F

    df = spark.range(100_000).select(
        (F.col("id") % 100).alias("bucket"),          # cluster column
        F.xxhash64(F.col("id")).alias("doc_id"),      # scattered id
    )
    with_bloom = str(tmp_path / "with_bloom")
    without = str(tmp_path / "without")
    write_clustered(
        df,
        with_bloom,
        ["bucket"],
        num_partitions=4,
        bloom_filter_cols=["doc_id"],
        bloom_expected_ndv=50_000,
    )
    write_clustered(df, without, ["bucket"], num_partitions=4)

    absent = 123  # not a value xxhash64 produced for this domain
    assert spark.read.parquet(with_bloom).filter(
        F.col("doc_id") == absent
    ).count() == 0
    pruned = _scan_output_rows(spark, with_bloom, F.col("doc_id") == absent)
    control = _scan_output_rows(spark, without, F.col("doc_id") == absent)
    assert pruned == 0, f"bloom scan read {pruned} rows"
    assert control == 100_000  # stats can't prune scattered ids

    # present key still found through the bloom path
    some_id = df.first()["doc_id"]
    got = (
        spark.read.parquet(with_bloom)
        .filter(F.col("doc_id") == some_id)
        .count()
    )
    assert got == 1


def test_unclustered_write_overlaps(spark, sf_dir, tmp_path):
    # control: the same data written with default layout has wide,
    # overlapping envelopes (every row group spans ~the full domain)
    li = read_file(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    out = str(tmp_path / "li_default")
    li.repartition(8).write.mode("overwrite").parquet(out)
    ranges = [r for r in _shipdate_ranges(out) if r[0] is not None]
    ranges.sort()
    overlapping = sum(
        1 for (a_min, a_max), (b_min, b_max) in zip(ranges, ranges[1:])
        if a_max > b_min
    )
    assert overlapping > 0
