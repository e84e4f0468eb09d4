"""merge_upsert: delta replaces matching keys, appends new keys, swaps
atomically, rejects schema drift."""

import pytest

from pyspark.sql import functions as F

from bdt_spark.operators.upsert import merge_upsert


@pytest.fixture()
def base(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, f"v{i}", 1) for i in range(1, 11)], "k int, v string, gen int"
    ).write.parquet(path)
    return path


def test_upsert_updates_and_inserts(spark, base):
    delta = spark.createDataFrame(
        [(5, "v5-new", 2), (11, "v11", 2)], "k int, v string, gen int"
    )
    n = merge_upsert(spark, base, delta, ["k"])
    assert n == 11
    got = {r.k: (r.v, r.gen) for r in spark.read.parquet(base).collect()}
    assert got[5] == ("v5-new", 2)       # updated
    assert got[11] == ("v11", 2)         # inserted
    assert got[4] == ("v4", 1)           # untouched


def test_upsert_composite_key(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0)], "k int, sub string, x double"
    ).write.parquet(path)
    delta = spark.createDataFrame([(1, "b", 99.0)], "k int, sub string, x double")
    assert merge_upsert(spark, path, delta, ["k", "sub"]) == 2
    got = {(r.k, r.sub): r.x for r in spark.read.parquet(path).collect()}
    assert got[(1, "b")] == 99.0 and got[(1, "a")] == 10.0


def test_upsert_rejects_schema_drift(spark, base):
    bad = spark.createDataFrame([(1, "x")], "k int, v string")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(spark, base, bad, ["k"])


def test_upsert_idempotent_replay(spark, base):
    delta = spark.createDataFrame([(3, "v3x", 2)], "k int, v string, gen int")
    merge_upsert(spark, base, delta, ["k"])
    n2 = merge_upsert(spark, base, delta, ["k"])  # replay same delta
    assert n2 == 10
    assert spark.read.parquet(base).filter(F.col("k") == 3).count() == 1


def test_upsert_accepts_file_uri(spark, base):
    """file:// URIs are normalized to POSIX paths for the os-level swap."""
    delta = spark.createDataFrame(
        [(5, "v5-uri", 2), (12, "v12", 2)], "k int, v string, gen int"
    )
    n = merge_upsert(spark, "file://" + base, delta, ["k"])
    assert n == 11
    got = {r.k: r.v for r in spark.read.parquet(base).collect()}
    assert got[5] == "v5-uri" and got[12] == "v12"
    import os as _os

    assert not _os.path.exists(base + "._staged")  # no leaked staging dir


def test_upsert_rejects_remote_uri(spark, tmp_path):
    delta = spark.createDataFrame([(1, "x", 1)], "k int, v string, gen int")
    with pytest.raises(ValueError, match="local filesystem"):
        merge_upsert(spark, "s3://bucket/tbl", delta, ["k"])


def test_upsert_restores_base_if_swap_fails(spark, base, monkeypatch):
    """If the staged->base rename fails, the original table is restored."""
    import os as _os

    real_rename = _os.rename
    calls = {"n": 0}

    def flaky(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # second rename = staged -> base
            raise OSError("simulated rename failure")
        real_rename(src, dst)

    monkeypatch.setattr("bdt_spark.operators.upsert.os.rename", flaky)
    delta = spark.createDataFrame([(1, "boom", 2)], "k int, v string, gen int")
    with pytest.raises(OSError, match="simulated"):
        merge_upsert(spark, base, delta, ["k"])
    # base is whole and unchanged
    got = {r.k: r.v for r in spark.read.parquet(base).collect()}
    assert got[1] == "v1" and len(got) == 10


def test_upsert_rejects_type_drift(spark, base, tmp_path):
    """Same column NAMES with different TYPES passed the old name-set
    check, and unionByName would permanently widen the table's column
    (e.g. CSV-inferred string over bigint)."""
    delta = spark.createDataFrame(
        [("9", "z", 1)], "k string, v string, gen int"
    )
    with pytest.raises(ValueError, match="type mismatch"):
        merge_upsert(spark, base, delta, ["k"])


def test_upsert_rejects_duplicate_delta_keys(spark, base):
    """Two delta rows for one key would BOTH survive the merge (anti-join
    removes the base row, both appends land) — no defined winner, so
    reject."""
    delta = spark.createDataFrame(
        [(5, "x", 2), (5, "y", 2)], "k int, v string, gen int"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(spark, base, delta, ["k"])


def test_nested_nullability_is_not_type_drift(spark, tmp_path):
    """A base read back from parquet (fully nullable nested types) vs an
    in-memory delta with non-nullable array elements is the SAME logical
    type — must merge, not raise 'schema type mismatch'."""
    import pyspark.sql.types as T

    base_path = str(tmp_path / "nested")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType(), containsNull=False)),
            T.StructField(
                "meta",
                T.StructType([T.StructField("v", T.IntegerType(), False)]),
                False,
            ),
        ]
    )
    rows = [(1, ["a"], (7,)), (2, ["b"], (8,))]
    spark.createDataFrame(rows, schema).write.parquet(base_path)
    delta = spark.createDataFrame([(2, ["c"], (9,))], schema)  # non-null nested
    n = merge_upsert(spark, base_path, delta, ["id"])
    assert n == 2
    got = {r.id: r.meta.v for r in spark.read.parquet(base_path).collect()}
    assert got == {1: 7, 2: 9}


def test_validate_unique_keys_direct(spark):
    from bdt_spark.operators.upsert import validate_unique_keys

    import pytest

    df = spark.createDataFrame([(1, "a"), (1, "b")], "id int, v string")
    with pytest.raises(ValueError, match="duplicate keys"):
        validate_unique_keys(df, ["id"])
    validate_unique_keys(df, ["id", "v"])  # composite key unique -> ok
