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


def test_partitioned_parquet_write(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_part.parquet")
    convert(spark, f"{sf_dir}/orders.parquet", out,
            partition_by=["o_orderstatus"])
    import os

    subdirs = [d for d in os.listdir(out) if d.startswith("o_orderstatus=")]
    assert len(subdirs) >= 2
    # partition pruning: reading one status scans only its directory
    df = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    total = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderstatus = 'F'"
    )
    assert df.count() == total.count()


def test_partition_by_single_file_conflict(spark, sf_dir, tmp_path):
    with pytest.raises(ValueError):
        convert(spark, f"{sf_dir}/orders.parquet",
                str(tmp_path / "x.parquet"),
                single_file=True, partition_by=["o_orderstatus"])


@pytest.mark.slow
def test_nested_struct_roundtrip(spark, tmp_path):
    # nested struct/array columns must survive parquet round-trips (the
    # reference's compare todo!()s on nested; we support them end-to-end)
    from pyspark.sql import functions as F

    from bdt_spark.operators.compare import compare_files

    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "x"}, [1, 2]), (2, {"a": 2, "b": "y"}, [3])],
        "id int, s struct<a:int,b:string>, arr array<int>",
    )
    p1 = str(tmp_path / "n1.parquet")
    p2 = str(tmp_path / "n2.parquet")
    df.coalesce(1).orderBy("id").write.parquet(p1)
    spark.read.parquet(p1).coalesce(1).orderBy("id").write.parquet(p2)
    got = spark.read.parquet(p2).orderBy("id").collect()
    assert got[0].s.b == "x" and got[1].arr == [3]
    # distributed hash compare handles nested columns
    assert compare_files(spark, p1, p2, method="hash").ok


def test_convert_avro_to_parquet(spark, tmp_path):
    """The reference's avro flow is read-avro -> query/write other formats
    (utils.rs:62-64; avro OUT is rejected, convert.rs:37-39). Prove the
    same: an .avro input converts to parquet losslessly."""
    from bdt_spark.operators.convert import convert
    from bdt_spark.sources.avro import spark_schema_to_avro, write_avro

    src = spark.range(10).selectExpr(
        "id", "CAST(id * 1.5 AS DOUBLE) AS x", "CAST(id AS STRING) AS s"
    )
    avro_path = tmp_path / "in.avro"
    avro_path.write_bytes(
        write_avro(
            [r.asDict() for r in src.collect()],
            spark_schema_to_avro(src.schema),
        )
    )
    out = str(tmp_path / "out.parquet")
    convert(spark, str(avro_path), out)
    back = spark.read.parquet(out)
    assert back.count() == 10
    assert {r.id: (r.x, r.s) for r in back.collect()} == {
        r.id: (r.x, r.s) for r in src.collect()
    }


def test_arrow_write_roundtrip_under_compare(spark, sf_dir, tmp_path):
    """Round 7: Arrow IPC as a WRITE target (the reference panics on
    Arrow both directions). parquet -> arrow -> parquet, the end result
    verified identical to the source by the compare operator."""
    from bdt_spark.operators.compare import compare_files
    from bdt_spark.operators.convert import convert

    src = f"{sf_dir}/orders.parquet"
    arrow_dir = str(tmp_path / "orders.arrow")
    back = str(tmp_path / "orders_back.parquet")
    convert(spark, src, arrow_dir)
    import glob as _glob

    parts = _glob.glob(arrow_dir + "/part-*.arrow")
    assert parts, "expected per-partition .arrow files"
    convert(spark, arrow_dir, back)
    res = compare_files(spark, src, back)
    assert res.ok, res


def test_arrow_write_single_file_and_zstd(spark, sf_dir, tmp_path):
    """single_file produces ONE .arrow file at the exact path; zstd
    compresses IPC buffers (file stays readable and smaller than the
    uncompressed single file on this column-repetitive table)."""
    import os as _os

    from bdt_spark.operators.convert import convert
    from bdt_spark.sources.io import read_file

    plain = str(tmp_path / "nation_plain.arrow")
    comp = str(tmp_path / "nation_zstd.arrow")
    convert(spark, f"{sf_dir}/orders.parquet", plain, single_file=True)
    convert(spark, f"{sf_dir}/orders.parquet", comp, single_file=True, zstd=True)
    assert _os.path.isfile(plain) and _os.path.isfile(comp)
    n_src = read_file(spark, f"{sf_dir}/orders.parquet").count()
    assert read_file(spark, plain).count() == n_src
    assert read_file(spark, comp).count() == n_src
    assert _os.path.getsize(comp) < _os.path.getsize(plain)


def test_arrow_write_empty_input_schema_only(spark, tmp_path):
    """Empty source -> schema-only IPC file, still readable with the
    right schema and zero rows."""
    from bdt_spark.operators.convert import convert
    from bdt_spark.sources.io import read_file

    src = str(tmp_path / "empty.parquet")
    spark.range(0).selectExpr("id", "CAST(id AS STRING) AS s").write.parquet(src)
    out = str(tmp_path / "empty.arrow")
    convert(spark, src, out, single_file=True)
    back = read_file(spark, out)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["id", "s"]


def test_arrow_dir_write_commits_with_success_marker(spark, sf_dir, tmp_path):
    """Directory Arrow output carries a _SUCCESS marker and no attempt
    temp files — the commit contract Spark's built-in sinks give."""
    import glob as _glob
    import os

    from bdt_spark.operators.convert import convert

    out = str(tmp_path / "nation_dir.arrow")
    convert(spark, f"{sf_dir}/nation.parquet", out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert _glob.glob(os.path.join(out, "*.tmp")) == []
    assert _glob.glob(os.path.join(out, "part-*.arrow"))


def test_arrow_write_failed_job_leaves_no_marker_or_partials(spark, tmp_path):
    """A task that dies mid-stream must not commit its part file, and the
    failed job must leave NO _SUCCESS marker — partial output stays
    distinguishable from complete output. (Each attempt streams into its
    own .tmp and only a clean close renames it into place.)"""
    import glob as _glob
    import os

    import pytest
    from pyspark.sql import functions as F

    from bdt_spark.operators.convert import _write_arrow

    # one partition poisoned: assert_true raises mid-batch executor-side
    df = (
        spark.range(0, 100, 1, 4)
        .withColumn("ok", F.expr("assert_true(id != 57, 'boom')"))
    )
    out = str(tmp_path / "poisoned.arrow")
    with pytest.raises(Exception, match="boom"):
        _write_arrow(df, out, single_file=False, zstd=False)
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    # the poisoned partition committed nothing (its temp was discarded);
    # at most the healthy partitions' complete files exist
    assert _glob.glob(os.path.join(out, "*.tmp")) == []
    assert len(_glob.glob(os.path.join(out, "part-*.arrow"))) < 4


def test_arrow_zstd_unavailable_fails_driver_side(spark, sf_dir, tmp_path, monkeypatch):
    """zstd support is validated on the driver BEFORE any job launches:
    simulate a pyarrow build without zstd and expect one clear error,
    not per-task executor stack traces."""
    import pyarrow as pa
    import pytest

    from bdt_spark.operators.convert import convert

    real = pa.Codec

    class FakeCodec:
        @staticmethod
        def is_available(name):
            return False if name == "zstd" else real.is_available(name)

    # pyarrow.lib.Codec is an immutable C type: swap the module attribute
    # instead (the writer resolves it via `pa.Codec` at call time)
    monkeypatch.setattr(pa, "Codec", FakeCodec)
    with pytest.raises(RuntimeError, match="zstd"):
        convert(
            spark,
            f"{sf_dir}/nation.parquet",
            str(tmp_path / "z.arrow"),
            zstd=True,
        )


def test_orc_write_roundtrip_under_compare(spark, sf_dir, tmp_path):
    # ORC out (EXTENSION — the reference's FileFormat enum has no ORC arm,
    # utils.rs:12-23): parquet -> orc -> compare equal to the source, and
    # the .orc extension dispatches through register/read like any format
    out = str(tmp_path / "nation.orc")
    convert(spark, f"{sf_dir}/nation.parquet", out)
    res = compare_files(None, f"{sf_dir}/nation.parquet", out)
    assert res.ok, res.message
    from bdt_spark.sources.io import file_format, read_file

    assert file_format(out) == "orc"
    df = read_file(spark, out)
    assert df.count() == spark.read.parquet(f"{sf_dir}/nation.parquet").count()


def test_orc_zstd_single_file(spark, sf_dir, tmp_path):
    out = str(tmp_path / "region_z.orc")
    convert(spark, f"{sf_dir}/region.parquet", out, single_file=True, zstd=True)
    assert os.path.isfile(out)
    import pyarrow.orc as po

    f = po.ORCFile(out)
    assert f.compression.upper() == "ZSTD"
    assert f.nrows == 5
