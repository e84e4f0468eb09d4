"""Physical-plan property regression tests: the scale guarantees the
README claims must survive refactors — broadcast dims, pushed filters,
pruned scans."""

import io
from contextlib import redirect_stdout

import bdt_spark.plans as plans


def _plan(spark, sf_dir, name, mode="formatted"):
    df = plans.get_query(name).fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q5_broadcasts_all_dims(spark, sf_dir):
    text = _plan(spark, sf_dir, "tpch_q5_local_supplier_volume")
    # customer/supplier/nation/region (+ orders under the local-mode
    # threshold) all ride broadcast joins; no sort-merge needed
    assert text.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in text


def test_q1_scan_is_pruned_and_pushed(spark, sf_dir):
    text = _plan(spark, sf_dir, "tpch_q1_pricing_summary")
    # only the 7 needed lineitem columns reach the scan
    assert "ReadSchema" in text
    read_schema = [l for l in text.splitlines() if "ReadSchema" in l][0]
    assert "l_shipdate" in read_schema and "l_orderkey" not in read_schema
    assert "PushedFilters: [IsNotNull(l_shipdate)" in text


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    text = _plan(spark, sf_dir, "tpch_q6_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in text  # pushed range predicate
    assert "LessThan(l_quantity" in text


def test_broadcast_hint_respected(spark, sf_dir):
    text = _plan(spark, sf_dir, "join_broadcast_hint")
    assert "BroadcastHashJoin" in text


def test_topk_uses_take_ordered(spark, sf_dir):
    text = _plan(spark, sf_dir, "sort_limit_offset", mode="simple")
    assert "TakeOrderedAndProject" in text
