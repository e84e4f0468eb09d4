"""asof_join edge cases: no-match null extension, exact-timestamp tie
(ts >= semantics), multiple right rows carried correctly."""

import datetime as dt

from bdt_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_and_ties(spark):
    T = dt.datetime
    left = _df(
        spark,
        [
            (1, T(2024, 1, 1, 10), "p1"),
            (1, T(2024, 1, 1, 11), "p2"),
            (1, T(2024, 1, 1, 9), "p0"),
            (2, T(2024, 1, 1, 10), "q1"),
        ],
        "uid int, ts timestamp, name string",
    )
    right = _df(
        spark,
        [
            (1, T(2024, 1, 1, 10), 100.0),  # exact tie with p1 -> matches
            (1, T(2024, 1, 1, 10, 30), 200.0),
        ],
        "uid int, ts timestamp, v double",
    )
    out = {
        r.name: (r.ts_r, r.v_r)
        for r in asof_join(left, right, on="uid", suffix="_r").collect()
    }
    assert out["p0"] == (None, None)  # before any right row
    assert out["p1"] == (T(2024, 1, 1, 10), 100.0)  # ts >= ts: tie matches
    assert out["p2"] == (T(2024, 1, 1, 10, 30), 200.0)  # latest carried
    assert out["q1"] == (None, None)  # key with no right rows at all


def test_asof_null_payload_taken_atomically(spark):
    """A matched right row with a NULL payload value must yield that NULL —
    not a stale value from an earlier right row (per-column carry bug)."""
    T = dt.datetime
    left = _df(
        spark,
        [(1, T(2024, 1, 1, 12), "x")],
        "uid int, ts timestamp, name string",
    )
    right = _df(
        spark,
        [
            (1, T(2024, 1, 1, 10), 100.0, "a"),
            (1, T(2024, 1, 1, 11), None, "b"),  # latest match; v is NULL
        ],
        "uid int, ts timestamp, v double, tag string",
    )
    [row] = asof_join(left, right, on="uid", suffix="_r").collect()
    assert row.ts_r == T(2024, 1, 1, 11)
    assert row.v_r is None  # NOT 100.0 — whole row taken atomically
    assert row.tag_r == "b"


def test_asof_right_columns_needing_backquotes(spark):
    """Right payload columns with spaces/dots/hyphens must survive the
    struct carry (regression: DDL-string cast broke on such names)."""
    T = dt.datetime
    left = _df(
        spark,
        [(1, T(2024, 1, 1, 12), "x")],
        "uid int, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10), 7.0, "ok")],
        "uid int, ts timestamp, v double, t string",
    ).withColumnRenamed("v", "my value").withColumnRenamed("t", "a.b-c")
    [row] = asof_join(left, right, on="uid", suffix="_r").collect()
    assert row["my value_r"] == 7.0
    assert row["a.b-c_r"] == "ok"
    assert row["ts_r"] == T(2024, 1, 1, 10)


def test_asof_right_tie_deterministic(spark):
    """Several RIGHT rows sharing (key, ts): the matched payload must be
    the same on every run — the window tiebreaks on the payload struct,
    so the greatest payload wins deterministically (documented choice)."""
    import datetime as dt

    T = dt.datetime
    left = _df(spark, [(1, T(2024, 1, 1, 11))], "uid int, ts timestamp")
    right = _df(
        spark,
        [
            (1, T(2024, 1, 1, 10), 100.0),
            (1, T(2024, 1, 1, 10), 300.0),
            (1, T(2024, 1, 1, 10), 200.0),
        ],
        "uid int, ts timestamp, v double",
    )
    for _ in range(3):
        [row] = asof_join(
            left.repartition(8), right.repartition(8), on="uid", suffix="_r"
        ).collect()
        assert row.v_r == 300.0


def test_asof_null_right_ts_never_matches(spark):
    """A right row with NULL ts must match nothing (ASOF's t_r <= t_l is
    NULL-falsy, as in the DuckDB oracle); Spark's NULLS FIRST sort would
    otherwise carry it into every left row."""
    import datetime as dt

    T = dt.datetime
    left = _df(spark, [(1, T(2024, 1, 1, 10))], "uid int, ts timestamp")
    right = _df(
        spark, [(1, None, 5.0)], "uid int, ts timestamp, v double"
    )
    [row] = asof_join(left, right, on="uid", suffix="_r").collect()
    assert row.v_r is None and row.ts_r is None
