"""Math function shims (SURVEY §2 B8): functions DataFusion exposes
that Spark lacks, expressed as codegen-friendly SQL (no UDFs)."""

from __future__ import annotations


# --- number-theory shims (SURVEY §2 B8: DataFusion has gcd/lcm; Spark
# lacks them — expressed as a bounded Euclid fold, still codegen-friendly).

def gcd_sql(a: str, b: str) -> str:
    """GCD via 96 unrolled Euclid steps inside a fold.

    96 covers the int64 worst case (consecutive-Fibonacci pairs need ~90
    iterations); the IF short-circuit keeps already-converged cases cheap.
    """
    return (
        f"aggregate(sequence(1, 96),"
        f" named_struct('a', ABS(CAST({a} AS BIGINT)),"
        f"              'b', ABS(CAST({b} AS BIGINT))),"
        f" (acc, i) -> IF(acc.b = 0, acc,"
        f"   named_struct('a', acc.b, 'b', acc.a % acc.b))).a"
    )


def lcm_sql(a: str, b: str) -> str:
    # `div` keeps the arithmetic in exact BIGINT ('/' is DOUBLE division in
    # Spark SQL and loses precision past 2^53).
    g = gcd_sql(a, b)
    return (
        f"IF({a} = 0 OR {b} = 0, 0,"
        f" ABS(CAST({a} AS BIGINT) div ({g}) * CAST({b} AS BIGINT)))"
    )
