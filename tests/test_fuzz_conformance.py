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


@pytest.mark.slow
def test_fuzz_cases_agree(engines):
    """N >= 200 in-CI cases (VERDICT r11 #8): enough draws that every
    production — including the r12 struct/map/lateral dialect corners,
    each at ~6% of the mix — is exercised multiple times per run."""
    spark, con = engines
    rng = random.Random(1234)
    for i in range(200):
        sql = gen_query(rng)
        diff = run_case(spark, con, sql)
        assert diff is None, f"case {i}: {diff}\n{sql}"


def test_fuzz_new_productions_direct(engines):
    """The three r12 productions individually (the mixed run draws them
    probabilistically; this pins each one with a fixed seed sweep)."""
    from tools.fuzz_conformance import (
        gen_map_query,
        gen_posexplode_query,
        gen_struct_query,
    )

    spark, con = engines
    for gen in (gen_struct_query, gen_map_query, gen_posexplode_query):
        rng = random.Random(7)
        for i in range(5):
            sql = gen(rng)
            diff = run_case(spark, con, sql)
            assert diff is None, f"{gen.__name__} case {i}: {diff}\n{sql}"
