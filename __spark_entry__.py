"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query (TPC-H q1, the reference's demo query,
reference README.md:119-135) on sf0.001.
queries()/oracle_sql(): the full declared inventory from
bdt_spark.plans — each Spark callable paired with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import bdt_spark.plans as plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = plans.get_query("tpch_q1_pricing_summary")
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in plans.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in plans.all_queries().items()
        if spec.oracle is not None
    }
