"""The pandas packing reference (tools/verify_packing.py) became the
large-SF oracle in tools/check_oracle.py (it substitutes for the DuckDB
recursive-CTE oracles past _PACKING_SQL_MAX_DOCS docs, where the CTE is
O(n^2)-infeasible). An oracle substitute is only as good as its agreement
with the original: this cross-validates the two oracles against each
other at sf0.001, where BOTH are feasible — no Spark involved, so a
failure isolates to the oracles themselves.
"""

import os
import sys

import duckdb
import pytest

from tests.conftest import SF_DIR

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))


@pytest.mark.parametrize(
    "name, ref_name, keys",
    [
        ("tokens_sequence_packing", "ref_sequence_packing", ["lang", "pack_id"]),
        (
            "tokens_sequence_packing_sharded",
            "ref_sequence_packing_sharded",
            ["lang", "shard", "pack_id"],
        ),
        ("tokens_packing_efficiency", "ref_packing_efficiency", ["lang"]),
    ],
)
def test_pandas_packing_oracle_matches_duckdb(name, ref_name, keys):
    import verify_packing as vp

    import bdt_spark.plans as plans

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    odf = (
        con.sql(plans.get_query(name).oracle)
        .df()
        .sort_values(keys)
        .reset_index(drop=True)
    )
    ref = (
        getattr(vp, ref_name)(vp._tokens(SF_DIR))
        .sort_values(keys)
        .reset_index(drop=True)
    )
    assert list(odf.columns) == list(ref.columns)
    assert len(odf) == len(ref)
    for c in odf.columns:
        a, b = odf[c], ref[c].astype(odf[c].dtype)
        neq = a != b
        assert not neq.any(), f"{name}.{c}: {a[neq].head()} != {b[neq].head()}"
