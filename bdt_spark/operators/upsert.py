"""Keyed merge (upsert) into a parquet table — incremental-pipeline
writeback without a table format.

The reference has no DML at all; production pipelines need at least
"apply this delta of new/updated rows to the keyed table". Without a
transactional table format the portable pattern is rewrite-and-swap:

    result = delta  UNION  (base ANTI JOIN delta ON keys)

written to a staging directory and atomically swapped in. The anti join
broadcasts when the delta is small (the common case: daily increment
vs full history); with co-partitioned/bucketed layouts it is
exchange-free on the base side. At real scale the same merge routes
through partition overwrite (`spark.sql.sources.partitionOverwriteMode=
dynamic`) so only partitions containing delta keys rewrite.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


def merge_upsert(
    spark: SparkSession,
    base_path: str,
    delta: DataFrame,
    key_cols: list[str],
    broadcast_delta: bool = True,
) -> int:
    """Upsert `delta` into the parquet table at `base_path` by `key_cols`.

    Returns the resulting row count. Delta rows replace base rows with
    the same key; new keys are appended.
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    base = spark.read.parquet(base_path)
    if set(base.columns) != set(delta.columns):
        raise ValueError(
            f"schema mismatch: base {sorted(base.columns)} "
            f"vs delta {sorted(delta.columns)}"
        )
    keys = delta.select(*key_cols).distinct()
    if broadcast_delta:
        keys = F.broadcast(keys)
    survivors = base.join(keys, key_cols, "left_anti")
    merged = survivors.unionByName(delta)

    staged = base_path.rstrip("/") + "._staged"
    merged.write.mode("overwrite").parquet(staged)
    n = spark.read.parquet(staged).count()
    # swap: the staged result is complete before the base is replaced
    backup = base_path.rstrip("/") + "._old"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(base_path, backup)
    os.rename(staged, base_path)
    shutil.rmtree(backup, ignore_errors=True)
    return n
