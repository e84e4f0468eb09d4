"""view-parquet-meta tests (reference parquet.rs:9-141)."""

from bdt_spark.operators.meta import format_parquet_meta, read_parquet_meta


def test_meta_fields(sf_dir):
    m = read_parquet_meta(f"{sf_dir}/region.parquet")
    assert m.num_rows == 5
    assert m.num_row_groups >= 1
    g = m.row_groups[0]
    assert g.num_rows == 5
    names = [c.column for c in g.columns]
    assert "r_regionkey" in names and "r_name" in names
    key = next(c for c in g.columns if c.column == "r_regionkey")
    assert key.num_values == 5
    # min/max stats present and typed
    assert key.min == 0 and key.max == 4
    # string stats decoded as UTF-8 (parquet.rs:105-118)
    name = next(c for c in g.columns if c.column == "r_name")
    assert isinstance(name.min, str)


def test_meta_formatting(sf_dir):
    text = format_parquet_meta(read_parquet_meta(f"{sf_dir}/region.parquet"))
    assert "rows: 5" in text
    assert "row group 0" in text
    assert "r_name" in text
