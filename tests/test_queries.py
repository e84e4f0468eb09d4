"""Registry smoke: every declared query runs at sf0.001 and returns a
DataFrame with a stable schema. Value-level correctness is the DuckDB
oracle gate (tools/check_oracle.py / driver t2)."""

import pytest

import bdt_spark.plans as plans

ALL = sorted(plans.all_queries())


def test_inventory_size():
    assert len(ALL) >= 80


@pytest.mark.parametrize("name", ALL)
def test_query_runs(spark, sf_dir, name):
    spec = plans.get_query(name)
    df = spec.fn(spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_oracle_coverage():
    specs = plans.all_queries()
    no_oracle = [n for n, s in specs.items() if s.oracle is None]
    # only genuinely non-SQL-expressible ops may omit the oracle
    assert set(no_oracle) <= {"agg_approx_count_distinct"}
