"""Property-based tests (hypothesis) for the pure native pieces."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from bdt_spark.functions.datetime import parse_width_us
from bdt_spark.sources.io import sanitize_table_name


@given(st.text(max_size=60))
@settings(max_examples=200)
def test_sanitize_only_emits_word_chars(s):
    out = sanitize_table_name(s)
    assert re.fullmatch(r"[A-Za-z0-9_]*", out)
    assert len(out) == len(s)  # 1:1 replacement, like utils.rs:41-51


@given(
    st.integers(min_value=1, max_value=10_000),
    st.sampled_from(
        ["second", "seconds", "minute", "minutes", "hour", "hours", "day", "days"]
    ),
)
def test_parse_width_roundtrip(n, unit):
    us = parse_width_us(f"{n} {unit}")
    per = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[
        unit.rstrip("s")
    ]
    assert us == n * per * 1_000_000


@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          width=32), min_size=1, max_size=20))
def test_compare_file_equals_itself(tmp_path_factory, xs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bdt_spark.operators.compare import compare_files

    p = str(tmp_path_factory.mktemp("prop") / "x.parquet")
    pq.write_table(pa.table({"x": pa.array(xs, type=pa.float32())}), p)
    assert compare_files(None, p, p).ok
