"""As-of join — an operator Spark's built-ins lack, composed from existing
DataFrame ops (SURVEY's guidance for custom operators: composition first,
UDF only if semantics demand it — here they don't).

``asof_join(left, right, …)``: for every left row, attach the single right
row with the greatest timestamp ≤ the left timestamp within the same key
(the standard time-series enrichment join).

Implementation is the union–sort–window technique, not a range join:
tag both sides, union on (key, ts), and carry the most recent right-side
payload forward with ``last(ignorenulls)`` over an ordered window. One
shuffle on the key, no quadratic range explosion — at 10^12 rows this is a
single sort-merge-shaped exchange, which is why it beats the
join-then-filter-max formulation (that one shuffles the full cross product
of same-key pairs)."""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: List[str],
    suffix: str = "_asof",
) -> DataFrame:
    """left LEFT ASOF JOIN right ON left.by = right.by AND right.on <= left.on.

    ``right_cols`` are the right-side payload columns to carry. Ties on the
    timestamp prefer the right row (right sorts before left at equal ts),
    matching DuckDB's ASOF semantics (>= match on equal timestamps).

    All payload columns are carried as ONE struct so they always come from
    the SAME matched right row. Carrying each column independently with
    last(ignorenulls) would backfill a NULL payload value from an OLDER
    right row — true ASOF semantics attach the matched row's value even
    when that value is NULL.
    """
    lcols = left.columns
    payload_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    l_tagged = left.select(
        F.col(by), F.col(on),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c not in (by, on)],
        F.lit(None).cast(payload_t).alias("_r"),
    )
    r_tagged = right.select(
        F.col(by), F.col(on),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (by, on)],
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (W.partitionBy(by).orderBy(F.col(on), F.col("_side"))
         .rowsBetween(W.unboundedPreceding, 0))
    carried = unioned.withColumn("_rm", F.last("_r", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            "*",
            *[F.col("_rm")[c].alias(f"{c}{suffix}") for c in right_cols],
        )
        .drop("_side", "_r", "_rm")
    )
