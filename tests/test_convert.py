"""Convert round-trips validated with the compare engine — the reference's
own test idea (SURVEY §5: convert round-trips checked with compare)."""

import os

import pytest

from bdt_spark.operators.compare import compare_files
from bdt_spark.operators.convert import UnsupportedOutputError, convert


def test_parquet_to_csv_single_file(spark, sf_dir, tmp_path):
    out = str(tmp_path / "region.csv")
    convert(spark, f"{sf_dir}/region.parquet", out, single_file=True)
    assert os.path.isfile(out)
    df = spark.read.option("header", "true").csv(out)
    assert df.count() == spark.read.parquet(f"{sf_dir}/region.parquet").count()


def test_roundtrip_parquet_csv_parquet(spark, sf_dir, tmp_path):
    csv_out = str(tmp_path / "nation.csv")
    pq_out = str(tmp_path / "nation2.parquet")
    convert(spark, f"{sf_dir}/nation.parquet", csv_out, single_file=True)
    convert(spark, csv_out, pq_out, single_file=True)
    res = compare_files(None, f"{sf_dir}/nation.parquet", pq_out)
    assert res.ok, res.message


def test_parquet_to_json(spark, sf_dir, tmp_path):
    out = str(tmp_path / "region.json")
    convert(spark, f"{sf_dir}/region.parquet", out, single_file=True)
    df = spark.read.json(out)
    assert df.count() == 5


def test_zstd_parquet(spark, sf_dir, tmp_path):
    out = str(tmp_path / "region_z.parquet")
    convert(spark, f"{sf_dir}/region.parquet", out, single_file=True, zstd=True)
    import pyarrow.parquet as pq

    md = pq.ParquetFile(out).metadata
    assert md.row_group(0).column(0).compression == "ZSTD"


def test_avro_output_rejected(spark, sf_dir, tmp_path):
    # parity with convert.rs:37-39
    with pytest.raises(UnsupportedOutputError):
        convert(spark, f"{sf_dir}/region.parquet", str(tmp_path / "x.avro"))
