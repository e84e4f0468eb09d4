"""Compare-engine tests mirroring the reference's diff-reporting paths
(SURVEY §5 item 3: count mismatch compare.rs:66, row diff compare.rs:47,
epsilon pass/fail compare.rs:31-45)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bdt_spark.operators.compare import compare_files


@pytest.fixture()
def files(tmp_path):
    def write(name, data):
        p = str(tmp_path / name)
        pq.write_table(pa.table(data), p)
        return p

    return write


def test_equal_files(files):
    a = files("a.parquet", {"x": [1, 2, 3], "y": [1.0, 2.0, 3.0]})
    b = files("b.parquet", {"x": [1, 2, 3], "y": [1.0, 2.0, 3.0]})
    assert compare_files(None, a, b).ok


def test_count_mismatch(files):
    a = files("a.parquet", {"x": [1, 2, 3]})
    b = files("b.parquet", {"x": [1, 2]})
    res = compare_files(None, a, b)
    assert not res.ok and "3 != 2" in res.message


def test_value_diff_first_wins(files):
    a = files("a.parquet", {"x": [1, 2, 3], "y": ["a", "b", "c"]})
    b = files("b.parquet", {"x": [1, 9, 8], "y": ["a", "b", "z"]})
    res = compare_files(None, a, b)
    assert not res.ok
    assert "Row 1" in res.message and "position 0" in res.message


def test_epsilon_absolute(files):
    # the reference's signed-epsilon bug (compare.rs:36) would pass l-r=-5;
    # ours must fail it (SURVEY compare semantics note).
    a = files("a.parquet", {"y": [1.0, 5.0]})
    b = files("b.parquet", {"y": [1.0005, 10.0]})
    assert compare_files(None, a, b, epsilon=0.01).ok is False
    assert compare_files(None, a, b, epsilon=0.01).message.startswith("Row 1")
    c = files("c.parquet", {"y": [1.0005, 5.001]})
    assert compare_files(None, a, c, epsilon=0.01).ok


def test_nulls_and_timestamps(files):
    # types the reference's RowIter todo!()s on (utils.rs:193-196)
    import datetime as dt

    ts = [dt.datetime(2024, 1, 1), None]
    a = files("a.parquet", {"t": ts, "n": [None, 2]})
    b = files("b.parquet", {"t": ts, "n": [None, 2]})
    assert compare_files(None, a, b).ok
    c = files("c.parquet", {"t": ts, "n": [1, 2]})
    res = compare_files(None, a, c)
    assert not res.ok and "Row 0" in res.message


def test_hash_mode_distributed(spark, files):
    a = files("a.parquet", {"x": [3, 1, 2], "y": [1.0, 2.0, 3.0]})
    b = files("b.parquet", {"x": [1, 2, 3], "y": [2.0, 3.0, 1.0]})
    # same multiset of rows in different order -> hash mode passes
    assert compare_files(spark, a, b, method="hash").ok
    c = files("c.parquet", {"x": [1, 2, 4], "y": [2.0, 3.0, 1.0]})
    assert not compare_files(spark, a, c, method="hash").ok


def test_csv_compare(files, tmp_path):
    p1 = str(tmp_path / "x.csv")
    p2 = str(tmp_path / "y.csv")
    for p in (p1, p2):
        with open(p, "w") as f:
            f.write("a,b\n1,foo\n2,bar\n")
    assert compare_files(None, p1, p2).ok


def test_first_diff_is_row_major(files):
    # earlier row in a LATER column must win over a later row in an
    # earlier column (reference zips rows, compare.rs:27)
    a = files("rm_a.parquet", {"x": [1, 2, 3], "y": ["a", "b", "c"]})
    b = files("rm_b.parquet", {"x": [1, 2, 9], "y": ["a", "Z", "c"]})
    res = compare_files(None, a, b)
    assert not res.ok
    assert "Row 1" in res.message and "position 1" in res.message


@pytest.mark.slow
def test_hash_mode_epsilon(spark, files):
    a = files("ha.parquet", {"k": [1, 2], "y": [1.00004, 2.0]})
    b = files("hb.parquet", {"k": [1, 2], "y": [1.00001, 2.0]})
    assert compare_files(spark, a, b, epsilon=0.001, method="hash").ok
    res = compare_files(spark, a, b, epsilon=1e-7, method="hash")
    assert not res.ok


def test_hash_mode_epsilon_boundary_pairs_exact(spark, files):
    """Pairs straddling a rounding boundary with |diff| << eps must PASS:
    the old round-to-ceil(-log10(eps))-digits scheme bucketed 0.0014999
    and 0.0015001 differently at eps=1e-3 (rounds to 0.001 vs 0.002) and
    false-mismatched. The sort-zip mode compares |l-r| < eps exactly."""
    a = files("bp_a.parquet", {"k": [1, 2], "y": [0.0014999, 7.0]})
    b = files("bp_b.parquet", {"k": [1, 2], "y": [0.0015001, 7.0]})
    # positional mode accepts (the semantics baseline)
    assert compare_files(None, a, b, epsilon=1e-3).ok
    # distributed mode must agree now
    assert compare_files(spark, a, b, epsilon=1e-3, method="hash").ok


@pytest.mark.slow
def test_hash_mode_epsilon_null_vs_value_differ(spark, files):
    """A NULL float against a value is a MISMATCH. Regression: the
    three-valued |l-r|<eps predicate evaluated to NULL for such a pair,
    and a NULL verdict was skipped by the SUM and dropped by the filter
    — i.e. silently counted as a match ('Files match' on differing
    files)."""
    a = files("en_a.parquet", {"k": [1, 2], "y": [1.0, 2.0]})
    b = files("en_b.parquet", {"k": [1, 2], "y": [1.0, None]})
    res = compare_files(spark, a, b, epsilon=0.001, method="hash")
    assert not res.ok
    # symmetric direction too (NULL on the left)
    assert not compare_files(spark, b, a, epsilon=0.001, method="hash").ok
    # both NULL stays a match
    c = files("en_c.parquet", {"k": [1, 2], "y": [1.0, None]})
    assert compare_files(spark, b, c, epsilon=0.001, method="hash").ok


@pytest.mark.slow
def test_hash_mode_epsilon_with_map_column(spark, tmp_path):
    """Epsilon mode must not apply eqNullSafe to map columns (Spark
    defines no map ordering and rejects the comparison); maps compare by
    canonical entry arrays, as in the exact hash mode."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "k": [1, 2],
            "y": [1.0, 2.0],
            "m": pa.array(
                [{"a": 1, "b": 2}, {"c": 3}],
                type=pa.map_(pa.string(), pa.int64()),
            ),
        }
    )
    a, b = str(tmp_path / "ma.parquet"), str(tmp_path / "mb.parquet")
    pq.write_table(t, a)
    pq.write_table(t, b)
    assert compare_files(spark, a, b, epsilon=0.001, method="hash").ok
    # differing map -> mismatch
    t2 = pa.table(
        {
            "k": [1, 2],
            "y": [1.0, 2.0],
            "m": pa.array(
                [{"a": 1, "b": 2}, {"c": 4}],
                type=pa.map_(pa.string(), pa.int64()),
            ),
        }
    )
    c = str(tmp_path / "mc.parquet")
    pq.write_table(t2, c)
    assert not compare_files(spark, a, c, epsilon=0.001, method="hash").ok


@pytest.mark.slow
def test_hash_mode_epsilon_order_insensitive(spark, files):
    """Epsilon mode keys the zip on the canonical sort, not file order:
    same rows shuffled with eps-noise still match; a beyond-eps value
    still fails with a counted diff."""
    a = files("eo_a.parquet", {"k": [3, 1, 2], "y": [30.0, 10.0, 20.0]})
    b = files("eo_b.parquet", {"k": [1, 2, 3], "y": [10.00004, 20.0, 29.99996]})
    assert compare_files(spark, a, b, epsilon=1e-3, method="hash").ok
    c = files("eo_c.parquet", {"k": [1, 2, 3], "y": [10.0, 20.5, 30.0]})
    res = compare_files(spark, a, c, epsilon=1e-3, method="hash")
    assert not res.ok and "1 of 3 rows differ" in res.message


def test_epsilon_index_plan_is_distributed_jvm_only(spark):
    """The global index must come from range partitions + per-partition
    row_number — no single-task global window, no RDD/Python round-trip
    (rdd.zipWithIndex pipes every row through Python)."""
    from bdt_spark.operators.compare import _zip_global_index

    df = spark.range(10_000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) / 7 AS y"
    )
    indexed, cached, total = _zip_global_index(spark, df)
    try:
        assert total == 10_000  # offsets job doubles as the side's count
        plan = indexed._jdf.queryExecution().executedPlan().toString()
        # the DATA path must not round-trip through an RDD (the tiny
        # driver-built offsets table is a legitimate ExistingRDD on the
        # broadcast side) and no Python evaluation may appear anywhere
        assert "Scan ExistingRDD[k" not in plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
        assert "Exchange SinglePartition" not in plan  # no 1-task window
        # dense, unique, 0-based
        stats = indexed.selectExpr(
            "COUNT(*) AS n",
            "COUNT(DISTINCT __idx) AS d",
            "MIN(__idx) AS mn",
            "MAX(__idx) AS mx",
        ).first()
        assert (stats.n, stats.d, stats.mn, stats.mx) == (
            10_000, 10_000, 0, 9_999
        )
    finally:
        cached.unpersist()


def test_hash_mode_count_mismatch_message(spark, files):
    a = files("cm_a.parquet", {"x": [1, 2, 3]})
    b = files("cm_b.parquet", {"x": [1, 2]})
    res = compare_files(spark, a, b, method="hash")
    assert not res.ok and "Row counts do not match: 3 != 2" in res.message


def test_hash_mode_null_vs_value_differ(spark, files):
    a = files("nz_a.parquet", {"x": [1, None], "y": ["a", "b"]})
    b = files("nz_b.parquet", {"x": [1, 2], "y": ["a", "b"]})
    assert not compare_files(spark, a, b, method="hash").ok
    c = files("nz_c.parquet", {"x": [None, 1], "y": ["b", "a"]})
    assert compare_files(spark, a, c, method="hash").ok


def test_hash_mode_single_pass_plan(spark, files):
    """The hash diff must be ONE pass: md5-count aggregation per side +
    full-outer join on the hash — no ExceptAll, and the join adds no
    exchange beyond the two per-side aggregation shuffles (+1 single-
    partition exchange for the final scalar aggregate)."""
    from bdt_spark.operators.compare import _hash_diff_stats

    a = files("sp_a.parquet", {"x": [1, 2, 3], "y": [1.0, 2.0, 3.0]})
    df = spark.read.parquet(a)
    plan = _hash_diff_stats(df, df)._jdf.queryExecution().executedPlan().toString()
    assert "Except" not in plan
    n_exchanges = plan.count("Exchange")
    # 2 per-side hash-aggregate shuffles + 1 SinglePartition for the
    # final one-row aggregate; a 4th would mean the join re-shuffled
    assert n_exchanges <= 3, plan


def test_hash_mode_negative_zero_equal(spark, files):
    a = files("z_a.parquet", {"k": [1, 2], "y": [-0.0, 1.5]})
    b = files("z_b.parquet", {"k": [1, 2], "y": [0.0, 1.5]})
    assert compare_files(spark, a, b, method="hash").ok


def test_hash_mode_map_entry_order_equal(spark, tmp_path):
    """Equal maps hash equal regardless of physical entry order."""
    from pyspark.sql import functions as F

    a = str(tmp_path / "m_a.parquet")
    b = str(tmp_path / "m_b.parquet")
    spark.range(1).select(
        F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)).alias("m")
    ).write.parquet(a)
    spark.range(1).select(
        F.create_map(F.lit("b"), F.lit(2), F.lit("a"), F.lit(1)).alias("m")
    ).write.parquet(b)
    assert compare_files(spark, a, b, method="hash").ok
    # and genuinely different maps still differ
    c = str(tmp_path / "m_c.parquet")
    spark.range(1).select(
        F.create_map(F.lit("a"), F.lit(9), F.lit("b"), F.lit(2)).alias("m")
    ).write.parquet(c)
    assert not compare_files(spark, a, c, method="hash").ok


@pytest.mark.slow
def test_hash_mode_epsilon_nonfloat_sort_prevents_cross_zip(spark, files):
    """The adversarial bipartite construction from the in-code caveat:
    eps-close float values whose order REVERSES across rows with
    different non-float keys. A float-first canonical sort would zip
    k='a' against k='b' (false reject); sorting the exact columns first
    pins the pairing, so only genuinely float-tied rows can ever
    cross-zip."""
    a = files("cz_a.parquet", {"k": ["a", "b"], "y": [1.0000, 1.0001]})
    b = files("cz_b.parquet", {"k": ["a", "b"], "y": [1.0001, 1.0000]})
    # true match: per-key |diff| = 1e-4 < eps
    assert compare_files(spark, a, b, epsilon=0.01, method="hash").ok
    # negative control: same shape, per-key diff beyond eps must fail
    c = files("cz_c.parquet", {"k": ["a", "b"], "y": [1.5, 1.0000]})
    assert not compare_files(spark, a, c, epsilon=0.01, method="hash").ok


@pytest.mark.slow
def test_hash_mode_epsilon_float_tied_rows_rematch(spark, files):
    """The former residual (VERDICT r9 #6): rows IDENTICAL on all
    non-float columns with two anti-correlated float columns. A perfect
    bipartite matching exists (r1<->s1, r2<->s2) but any sort-based zip
    pairs r1 with s2 — the second-chance per-group matching must now
    resolve it EXACTLY in both directions, and still reject when the
    matching genuinely does not exist."""
    a = files(
        "ft_a.parquet",
        {"k": [1, 1], "x": [0.00, 0.05], "y": [0.0, 1.0]},
    )
    b = files(
        "ft_b.parquet",
        {"k": [1, 1], "x": [0.05, 0.00], "y": [0.0, 1.0]},
    )
    assert compare_files(spark, a, b, epsilon=0.08, method="hash").ok
    assert compare_files(spark, b, a, epsilon=0.08, method="hash").ok
    # negative control: same shape but one float beyond eps — the group
    # has NO perfect matching and must still reject (both directions)
    c = files(
        "ft_c.parquet",
        {"k": [1, 1], "x": [0.05, 0.20], "y": [0.0, 1.0]},
    )
    assert not compare_files(spark, a, c, epsilon=0.08, method="hash").ok
    assert not compare_files(spark, c, a, epsilon=0.08, method="hash").ok


@pytest.mark.slow
def test_hash_mode_epsilon_rematch_duplicate_exact_prefixes(spark, files):
    """VERDICT r9 #6 'done' condition: duplicate exact-column prefixes +
    epsilon floats passing both directions. Three rows share k='dup';
    the float columns are a cyclic eps-perturbation whose sorted orders
    differ across sides; a fourth row with a different key pins that
    cross-group pairs stay impossible."""
    a = files(
        "dp_a.parquet",
        {
            "k": ["dup", "dup", "dup", "other"],
            "x": [0.00, 0.05, 0.10, 9.0],
            "y": [1.0, 0.0, 0.5, 9.0],
        },
    )
    # true pairing: (0.00,1.0)<->(0.06,1.0), (0.05,0.0)<->(0.02,0.0),
    # (0.10,0.5)<->(0.12,0.5) — all |dx| <= 0.06 < eps. Sorted-by-x zip
    # instead pairs (0.00,1.0) with (0.02,0.0): y off by 1.0 -> the zip
    # flags it bad and ONLY the rematch can accept.
    b = files(
        "dp_b.parquet",
        {
            "k": ["dup", "dup", "dup", "other"],
            "x": [0.02, 0.06, 0.12, 9.0],
            "y": [0.0, 1.0, 0.5, 9.0],
        },
    )
    assert compare_files(spark, a, b, epsilon=0.08, method="hash").ok
    assert compare_files(spark, b, a, epsilon=0.08, method="hash").ok
    # group-size mismatch inside the tied key must reject: move one
    # 'dup' row to 'other'
    c = files(
        "dp_c.parquet",
        {
            "k": ["dup", "dup", "other", "other"],
            "x": [0.02, 0.06, 0.12, 9.0],
            "y": [0.0, 1.0, 0.5, 9.0],
        },
    )
    assert not compare_files(spark, a, c, epsilon=0.08, method="hash").ok


@pytest.mark.slow
def test_hash_mode_epsilon_rematch_big_group_small_components_certifies(
    spark, files
):
    """VERDICT r11 #7: a float-tied GROUP far past _REMATCH_CAP whose
    eps-connected components are tiny must CERTIFY, not refuse — the r11
    cap refused any oversized group outright, which made a legitimate
    100 TB compare with one hot float-tied key uncertifiable. 1100 tiles
    of the anti-correlated cross-zip pair (each forces the rematch; each
    is x-separated from its neighbors by 10 >> eps) form a 2200-row
    group that decomposes into 2-row blocks and matches exactly."""
    from bdt_spark.operators import compare as cmp_mod

    tiles = (cmp_mod._REMATCH_CAP // 2) + 100  # group size = 2200 > cap
    xs_a, ys_a, xs_b, ys_b = [], [], [], []
    for t in range(tiles):
        base = 10.0 * t
        xs_a += [base + 0.00, base + 0.05]
        ys_a += [0.0, 1.0]
        xs_b += [base + 0.05, base + 0.00]
        ys_b += [0.0, 1.0]
    a = files(
        "bigcomp_a.parquet", {"k": [1] * len(xs_a), "x": xs_a, "y": ys_a}
    )
    b = files(
        "bigcomp_b.parquet", {"k": [1] * len(xs_b), "x": xs_b, "y": ys_b}
    )
    assert compare_files(spark, a, b, epsilon=0.08, method="hash").ok
    # negative control at the same size: push one tile's y beyond eps so
    # exactly one 2-row component has no perfect matching -> files differ
    # (a reject, NOT a refuse)
    ys_c = list(ys_b)
    ys_c[-1] = 1.2
    c = files(
        "bigcomp_c.parquet", {"k": [1] * len(xs_b), "x": xs_b, "y": ys_c}
    )
    res = compare_files(spark, a, c, epsilon=0.08, method="hash")
    assert not res.ok


@pytest.mark.slow
def test_hash_mode_epsilon_rematch_component_cap_raises(spark, files):
    """A single DENSE eps-connected component past _REMATCH_CAP is the
    one remaining non-exact corner: every float column is an unbroken
    eps-chain, so no per-column split can break it and the O(V*E)
    matching is refused with a loud ValueError naming the cap — never a
    silent accept, and never a silent reject either (the construction
    may well match within epsilon).

    x steps by eps/2 (one unbroken chain); y cycles {0.0, 0.05, 0.10} —
    pairwise gaps 0.05 < eps keep the y-chain connected, while the b
    side's shifted cycle makes some zipped pairs differ by 0.10 >= eps,
    forcing the rematch path."""
    from bdt_spark.operators import compare as cmp_mod

    n = cmp_mod._REMATCH_CAP + 1
    cyc = [0.0, 0.05, 0.10]
    a = files(
        "densecap_a.parquet",
        {
            "k": [1] * n,
            "x": [i * 0.04 for i in range(n)],
            "y": [cyc[i % 3] for i in range(n)],
        },
    )
    b = files(
        "densecap_b.parquet",
        {
            "k": [1] * n,
            "x": [i * 0.04 for i in range(n)],
            "y": [cyc[(i + 1) % 3] for i in range(n)],
        },
    )
    with pytest.raises(ValueError, match="_REMATCH_CAP"):
        compare_files(spark, a, b, epsilon=0.08, method="hash")


@pytest.mark.slow
def test_hash_mode_epsilon_rematch_null_vs_nan_not_merged(spark, files):
    """Arrow folds float64 NULL into NaN on the pandas side; the rematch
    tracks nullness in explicit flags, so a NULL float must still match
    only NULL and a NaN only NaN — never each other — even inside a
    float-tied group that goes through the matching pass."""
    # the anti-correlated (x, y) pair forces a bad zip, so the whole
    # group — including the null-x row — goes through the matching pass
    a = files(
        "nn_a.parquet",
        {"k": [1, 1, 1], "x": [0.00, 0.05, None], "y": [1.0, 0.0, 5.0]},
    )
    b = files(
        "nn_b.parquet",
        {"k": [1, 1, 1], "x": [0.04, 0.01, None], "y": [1.0, 0.0, 5.0]},
    )
    assert compare_files(spark, a, b, epsilon=0.08, method="hash").ok
    # same shape but the null becomes a REAL NaN: a's null row has no
    # partner, so the group has no perfect matching -> reject. A rematch
    # that let Arrow's null->NaN folding merge the two would
    # false-accept here.
    c = files(
        "nn_c.parquet",
        {
            "k": [1, 1, 1],
            "x": [0.04, 0.01, float("nan")],
            "y": [1.0, 0.0, 5.0],
        },
    )
    assert not compare_files(spark, a, c, epsilon=0.08, method="hash").ok
    assert not compare_files(spark, c, a, epsilon=0.08, method="hash").ok
    # and NaN itself must still round-trip: NaN matches NaN
    d = files(
        "nn_d.parquet",
        {
            "k": [1, 1, 1],
            "x": [0.00, 0.05, float("nan")],
            "y": [1.0, 0.0, 5.0],
        },
    )
    assert compare_files(spark, c, d, epsilon=0.08, method="hash").ok


def _map_table(x, y, entries, value_type=pa.int64()):
    return pa.table(
        {
            "x": pa.array(x, type=pa.float64()),
            "y": pa.array(y, type=pa.float64()),
            "m": pa.array(entries, type=pa.map_(pa.string(), value_type)),
        }
    )


@pytest.mark.slow
def test_hash_mode_epsilon_rematch_map_entry_order(spark, files, tmp_path):
    """Maps inside a float-tied group fold into the rematch group key as
    canonical sorted entries (r10 advice item): equal maps stored with
    different physical entry order must match, and genuinely different
    maps must still reject. The anti-correlated (x, y) pair forces every
    row through the matching pass."""
    cross_x, cross_y = [0.00, 0.05], [1.0, 0.0]

    def write(name, entries):
        p = str(tmp_path / name)
        pq.write_table(_map_table(cross_x, cross_y, entries), p)
        return p

    a = write("mo_a.parquet", [[("a", 1), ("b", 2)], [("a", 1), ("b", 2)]])
    # same maps, reversed entry order; floats eps-swapped to force rematch
    b = str(tmp_path / "mo_b.parquet")
    pq.write_table(
        _map_table(
            [0.04, 0.01],
            [1.0, 0.0],
            [[("b", 2), ("a", 1)], [("b", 2), ("a", 1)]],
        ),
        b,
    )
    assert compare_files(spark, a, b, epsilon=0.08, method="hash").ok
    # genuinely different map values must still reject
    c = str(tmp_path / "mo_c.parquet")
    pq.write_table(
        _map_table(
            [0.04, 0.01],
            [1.0, 0.0],
            [[("b", 9), ("a", 1)], [("b", 2), ("a", 1)]],
        ),
        c,
    )
    assert not compare_files(spark, a, c, epsilon=0.08, method="hash").ok


@pytest.mark.slow
def test_hash_mode_epsilon_rematch_nan_map_entries(spark, files, tmp_path):
    """NaN-valued map entries were a documented fail-closed corner of the
    r10 rematch (pandas object equality: NaN != NaN). With maps in the
    Spark group key, NaN map values follow Spark's grouping equality
    (NaN == NaN), matching the zip predicate's eqNullSafe on sorted
    entries — so equal-up-to-NaN maps now certify instead of
    false-rejecting, and a NaN-vs-number difference still rejects."""
    nan = float("nan")

    def write(name, x, y, entries):
        p = str(tmp_path / name)
        pq.write_table(_map_table(x, y, entries, pa.float64()), p)
        return p

    a = write(
        "nm_a.parquet",
        [0.00, 0.05],
        [1.0, 0.0],
        [[("a", nan), ("b", 2.0)], [("a", nan), ("b", 2.0)]],
    )
    b = write(
        "nm_b.parquet",
        [0.04, 0.01],
        [1.0, 0.0],
        [[("b", 2.0), ("a", nan)], [("b", 2.0), ("a", nan)]],
    )
    assert compare_files(spark, a, b, epsilon=0.08, method="hash").ok
    c = write(
        "nm_c.parquet",
        [0.04, 0.01],
        [1.0, 0.0],
        [[("b", 2.0), ("a", 3.0)], [("b", 2.0), ("a", nan)]],
    )
    assert not compare_files(spark, a, c, epsilon=0.08, method="hash").ok


def test_auto_mode_size_gate(files, spark, monkeypatch, capsys):
    """VERDICT r13 #3: the default mode is size-gated — positional below
    _POSITIONAL_MAX_BYTES combined on-disk bytes (byte-exact reference
    semantics, no note), distributed hash above (with a stderr note on
    the switch). Both modes pinned equal-VERDICT on the same fixture
    pairs, mirroring the minhash/pmi gate-test pattern; explicit
    method= always wins over the gate."""
    import bdt_spark.operators.compare as cmp

    a = files("a.parquet", {"x": [1, 2, 3], "y": [1.0, 2.0, 3.0]})
    b = files("b.parquet", {"x": [1, 2, 3], "y": [1.0, 2.0, 3.0]})
    c = files("c.parquet", {"x": [1, 2, 9], "y": [1.0, 2.0, 3.0]})

    # below the gate: positional, no switch note; the mode that ran is
    # stamped on the result for programmatic callers (ADVICE r14)
    res = compare_files(spark, a, b)
    assert res.ok and res.method == "positional"
    assert "hash mode" not in capsys.readouterr().err

    # force the gate: tiny threshold -> auto picks hash, notes the switch
    monkeypatch.setattr(cmp, "_POSITIONAL_MAX_BYTES", 1)
    res = compare_files(spark, a, b)
    assert res.ok and res.method == "hash"
    assert "hash mode" in capsys.readouterr().err

    # equal VERDICT across the gate on a differing pair
    assert not compare_files(spark, a, c).ok          # hash (gated)
    monkeypatch.setattr(cmp, "_POSITIONAL_MAX_BYTES", 1 << 40)
    assert not compare_files(spark, a, c).ok          # positional (gated)

    # explicit method always wins over the gate
    monkeypatch.setattr(cmp, "_POSITIONAL_MAX_BYTES", 1)
    res = compare_files(spark, a, c, method="positional")
    assert not res.ok and "Row 2" in res.message      # positional detail
    assert compare_files(spark, a, b, method="positional").ok
