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
