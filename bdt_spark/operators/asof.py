"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY/task list it as a required custom operator; DuckDB has ASOF JOIN,
which serves as the oracle).

Semantics (direction='backward', the classic): for each left row, attach
the single right row with the same key whose timestamp is the greatest one
<= the left timestamp; null-extended if none exists (LEFT variant).

Implementation is a union + carry-forward window — the sort-merge shape:
one shuffle of both inputs on the key, one sort per partition, no
broadcast, no range explosion. At 100 TB this is exactly how kdb-style
point-in-time joins are done on Spark: cost ≈ one sort-merge join, state
is a single carried row per key.

Composition:
1. Tag right rows side=0, left rows side=1; union with a shared schema
   (left payload nulled on right rows and vice versa).
2. Window per key ordered by (ts, side): the right payload is carried as
   ONE struct of all right columns with a single
   `last(struct, ignoreNulls)` over ROWS UNBOUNDED PRECEDING..CURRENT
   ROW, then expanded — so the whole matched right row is taken
   atomically even when some of its payload values are NULL (carrying
   each column independently would mix columns from different right
   rows). side=0 sorts before side=1 at equal ts, so a right row at
   exactly the left timestamp matches (ts >= semantics).
3. Keep only left rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T


def _c(name: str):
    """Column reference by literal name — backquoted so dots/hyphens/spaces
    aren't parsed as nested-field access or operators."""
    return F.col("`" + name.replace("`", "``") + "`")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of LEFT join of `left` to `right` on key `on`."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    payload_src = [right_ts] + right_cols
    payload_out = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in right_cols]

    # The right payload travels as ONE struct (non-null only on right-tagged
    # rows): a single last(ignorenulls) then takes the matched right row
    # atomically, so NULLs inside the payload never mix rows. Built as a
    # StructType (not a DDL string) so column names needing backquoting
    # (spaces, hyphens, dots) survive the cast.
    payload_type = T.StructType(
        [
            T.StructField(c, right.schema[src].dataType)
            for c, src in zip(payload_out, payload_src)
        ]
    )
    l_tagged = left.select(
        _c(on),
        _c(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[_c(c) for c in left.columns if c not in (on, left_ts)],
        F.lit(None).cast(payload_type).alias("__rpay"),
    )
    # A right row with NULL ts can match nothing: ASOF's t_right <= t_left
    # is NULL-falsy (the DuckDB oracle never matches it), but Spark's ASC
    # sort puts NULLs FIRST, where the carry-forward would pick it up.
    right = right.filter(_c(right_ts).isNotNull())
    r_tagged = right.select(
        _c(on),
        _c(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on, left_ts)],
        F.struct(
            *[_c(src).alias(c) for c, src in zip(payload_out, payload_src)]
        ).alias("__rpay"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # "__rpay" as the final sort key is the tiebreaker among RIGHT rows
    # sharing (key, ts): without it their relative order is whatever the
    # shuffle produced and the carried payload flips between runs. Struct
    # ordering is field-wise, so of several candidates the greatest
    # payload deterministically wins (documented choice; DuckDB's ASOF
    # leaves the tie unspecified). NULL __rpay (left rows) sorts first
    # within its (ts, side) group, which is inert: left rows carry no
    # payload and side=1 already orders them after right rows. Spark
    # defines no ordering over maps, so a map-bearing payload keeps the
    # old unspecified tie order rather than failing the whole join.
    orderable = "map<" not in payload_type.simpleString()
    order_keys = ["__ts", "__side"] + (["__rpay"] if orderable else [])
    w = (
        Window.partitionBy(_c(on))
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__rpay", ignorenulls=True).over(w)
    out_left = [c for c in left.columns if c not in (on, left_ts)]
    return (
        unioned.select(
            _c(on),
            F.col("__ts").alias(left_ts),
            "__side",
            *[_c(c) for c in out_left],
            *[carried.getField(c).alias(c) for c in payload_out],
        )
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
