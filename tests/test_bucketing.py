"""Bucketed co-located join and salted skew join: assert both the result
AND the physical plan property each technique exists for."""

import pytest

from pyspark.sql import functions as F

from bdt_spark.operators.bucketing import bucketed_join, salted_join, write_bucketed
from bdt_spark.sources.io import read_file


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = read_file(spark, f"{sf_dir}/orders.parquet")
    lineitem = read_file(spark, f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        ["o_orderkey"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, ["o_orderkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: no shuffle exchange on either side of the join
    assert "Exchange hashpartitioning" not in plan
    orders = read_file(spark, f"{sf_dir}/orders.parquet")
    lineitem = read_file(spark, f"{sf_dir}/lineitem.parquet")
    expected = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert joined.count() == expected


def test_salted_join_matches_plain(spark, sf_dir):
    lineitem = read_file(spark, f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    orders = read_file(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    salted = salted_join(lineitem, orders, "o_orderkey", n_salts=4)
    got = (
        salted.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
        .collect()
    )
    plain = (
        lineitem.join(orders, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
        .collect()
    )
    assert got == plain


def test_salted_join_rejects_outer(spark, sf_dir):
    # replicated dim side would duplicate unmatched rows n_salts times
    df = read_file(spark, f"{sf_dir}/nation.parquet")
    with pytest.raises(ValueError, match="inner"):
        salted_join(df, df, "n_nationkey", how="full")
