"""CLI smoke tests — each subcommand against sf0.001 fixtures
(SURVEY §5 item 4), asserting exit codes (main.rs:104-107)."""

import pytest

from bdt_spark.cli import main
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _warm_session(spark):
    # get_spark() in the CLI reuses the test session via getOrCreate()
    yield


def test_view(capsys):
    assert main(["view", f"{SF_DIR}/region.parquet", "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "r_name" in out


def test_schema(capsys):
    assert main(["schema", f"{SF_DIR}/region.parquet"]) == 0
    out = capsys.readouterr().out
    assert "r_regionkey" in out and "string" in out


def test_count(capsys):
    assert main(["count", "--table", f"{SF_DIR}/region.parquet"]) == 0
    assert capsys.readouterr().out.strip() == "5"


def test_query(capsys):
    assert (
        main(
            [
                "query",
                "--table",
                f"{SF_DIR}/nation.parquet",
                "--sql",
                "SELECT COUNT(*) AS n FROM nation",
            ]
        )
        == 0
    )
    assert "25" in capsys.readouterr().out


def test_query_tables_dir_and_output(tmp_path, capsys):
    out = str(tmp_path / "o.csv")
    assert (
        main(
            [
                "query",
                "--tables",
                SF_DIR,
                "--sql",
                "SELECT r_name FROM region ORDER BY r_name",
                "--output",
                out,
            ]
        )
        == 0
    )
    with open(out) as f:
        assert f.readline().strip() == "r_name"


def test_convert_cmd(tmp_path):
    out = str(tmp_path / "r.csv")
    assert main(["convert", f"{SF_DIR}/region.parquet", out, "-s"]) == 0


def test_view_parquet_meta(capsys):
    assert main(["view-parquet-meta", f"{SF_DIR}/region.parquet"]) == 0
    assert "rows: 5" in capsys.readouterr().out


def test_compare_cmd(capsys):
    assert (
        main(["compare", f"{SF_DIR}/region.parquet", f"{SF_DIR}/region.parquet"])
        == 0
    )
    assert "match" in capsys.readouterr().out


def test_compare_mismatch_exit_code():
    with pytest.raises(SystemExit):
        main(["compare", f"{SF_DIR}/region.parquet", f"{SF_DIR}/nation.parquet"])


def test_error_surface(capsys):
    # unknown extension -> error + exit 1 (main.rs:102-108)
    assert main(["count", "--table", "/nope/file.xlsx"]) == 1
    assert "Error" in capsys.readouterr().err


def test_cli_dedup_exact(tmp_path, capsys):
    from bdt_spark.cli import main

    rc = main([
        "dedup", "--table", f"{SF_DIR}/documents.parquet",
        "--method", "exact", "--id-col", "doc_id", "--columns", "text",
        "--output", str(tmp_path / "dups.parquet"),
    ])
    assert rc == 0
    assert "wrote" in capsys.readouterr().out


def test_cli_dedup_minhash(capsys):
    from bdt_spark.cli import main

    rc = main([
        "dedup", "--table", f"{SF_DIR}/documents.parquet",
        "--method", "minhash", "--id-col", "doc_id", "--text-col", "text",
    ])
    assert rc == 0


def test_cli_cluster_write_and_ann(tmp_path, capsys):
    from bdt_spark.cli import main

    out = str(tmp_path / "clustered")
    rc = main([
        "cluster-write", f"{SF_DIR}/orders.parquet", out,
        "--by", "o_orderdate", "--partitions", "4",
    ])
    assert rc == 0

    idx = str(tmp_path / "idx")
    rc = main([
        "ann-build", f"{SF_DIR}/embeddings.parquet", idx, "-k", "5",
    ])
    assert rc == 0
    rc = main([
        "ann-probe", idx, f"{SF_DIR}/embeddings.parquet",
        "--topk", "3", "--nprobe", "2",
        "--output", str(tmp_path / "nn.parquet"),
    ])
    assert rc == 0
