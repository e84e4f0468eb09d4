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


def test_aqe_skew_join_split_engages(spark):
    """SCALE.md claims AQE splits skewed partitions at runtime; prove it.

    A 9:1 hot key against a uniform dim, sort-merge forced (no broadcast),
    AQE skew thresholds scaled down to fixture size. The executed plan must
    show the SortMergeJoin marked skew=true — i.e. OptimizeSkewedJoin
    actually split the hot partition instead of single-tasking it.
    """
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        # pin shuffle partitions: the skew sizes below are tuned for 8,
        # and ANY in-process get_spark() call (e.g. a CLI test running
        # earlier) resets the shared session to the env default 32 —
        # getOrCreate applies runtime builder confs to existing sessions
        conf.set("spark.sql.shuffle.partitions", "8")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        fact = spark.range(0, 200_000).selectExpr(
            "IF(id % 10 < 9, 1, 1 + id % 1000) AS k",
            "repeat('x', 32) AS payload",
        )
        dim = spark.range(0, 1001).selectExpr("id AS k", "id * 2 AS v")
        joined = fact.join(dim, "k").groupBy().agg(F.sum("v").alias("s"))
        [row] = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        # correctness of the split join: sum matches the unskewed formula
        # hot rows (k=1): 180000 * 2; tail rows: each id maps to k=1+id%1000
        expected = 180_000 * 2 + sum(
            2 * (1 + i % 1000) for i in range(200_000) if i % 10 == 9
        )
        assert row.s == expected
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
