"""gcd/lcm SQL shims: int64 worst cases (ADVICE r1 — Fibonacci pairs need
~90 Euclid steps; lcm must stay in exact BIGINT arithmetic)."""

import math

from bdt_spark.functions.math import gcd_sql, lcm_sql


def test_gcd_fibonacci_worst_case(spark):
    # consecutive Fibonacci numbers are Euclid's worst case; F(86), F(87)
    # are ~6.6e17 — near the int64 ceiling.
    a, b = 420196140727489673, 679891637638612258
    [row] = spark.sql(f"SELECT {gcd_sql(str(a), str(b))} AS g").collect()
    assert row.g == math.gcd(a, b) == 1


def test_gcd_lcm_values(spark):
    cases = [(12, 18), (0, 5), (7, 13), (100, 10)]
    for a, b in cases:
        [row] = spark.sql(
            f"SELECT {gcd_sql(str(a), str(b))} AS g,"
            f" {lcm_sql(str(a), str(b))} AS l"
        ).collect()
        assert row.g == math.gcd(a, b)
        assert row.l == math.lcm(a, b)


def test_lcm_exact_past_2_53(spark):
    # double division would lose precision here; BIGINT div must not
    a, b = 2**31, 3 * 2**31
    [row] = spark.sql(f"SELECT {lcm_sql(str(a), str(b))} AS l").collect()
    assert row.l == math.lcm(a, b) == 3 * 2**31
