"""Seeded conformance fuzzing: template-generated queries must agree
between Spark and DuckDB (tools/fuzz_conformance.py grammar)."""

import random

import duckdb
import pytest

from tools.fuzz_conformance import TABLE_COLS, gen_query, run_case

from bdt_spark.sources.io import load_fixture_tables


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    load_fixture_tables(spark, sf_dir)
    con = duckdb.connect()
    for t in TABLE_COLS:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return spark, con


def test_fuzz_cases_agree(engines):
    spark, con = engines
    rng = random.Random(1234)
    for i in range(15):
        sql = gen_query(rng)
        diff = run_case(spark, con, sql)
        assert diff is None, f"case {i}: {diff}\n{sql}"
