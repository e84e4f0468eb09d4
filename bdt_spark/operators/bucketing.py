"""Bucketing and skew-salting — the two shuffle-elimination levers the
README's scale rules call for.

- `write_bucketed`: persist a table bucketed (and sorted) by join key.
  Two tables bucketed the same way join with ZERO exchange — at 100 TB
  this turns every fact-to-fact join on the bucket key into a local merge
  per bucket. (The reference has no table persistence at all; this is a
  Spark-native extension.)
- `salted_join`: equi-join where one side's keys are heavily skewed.
  The fact side gets a deterministic salt in [0, n); the dim side is
  replicated n times; joining on (key, salt) splits each hot key's rows
  across n reducers. AQE's skew-join handles moderate skew automatically;
  explicit salting is for the pathological keys AQE can't split (e.g. one
  key = 30% of the table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; Catalyst plans it exchange-free."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side, replicate the dim side.

    Salt: `monotonically_increasing_id() % n_salts` — a per-ROW value
    independent of content. A content hash here would be wrong twice: the
    common skew shape is a hot key whose rows are exact DUPLICATES (repeated
    log/default rows), which all hash identically and land on one reducer
    anyway; and hashing all columns throws on map-typed columns. The salt
    only affects row DISTRIBUTION, never the join result, so it does not
    need to be stable across runs — and within one job a retried task
    recomputes the same ids.

    Only `inner` and `left` (fact-preserving) joins are supported: the dim
    side is replicated n_salts times, so right/full outer joins would emit
    each unmatched dim row n_salts times. Use AQE skew-join for outer joins.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only (got {how!r}): "
            "the replicated dim side would duplicate unmatched rows in "
            "right/full outer joins"
        )
    fact_salted = fact.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    dim_replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = fact_salted.join(dim_replicated, [key, "__salt"], how)
    return joined.drop("__salt")
