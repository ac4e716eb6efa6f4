"""Cross-snapshot crawl diffing.

Re-crawl bookkeeping every web-scale pipeline runs between snapshots:
which urls are new, which disappeared, which changed content, which are
byte-identical (and can skip re-extraction entirely — the incremental
analog of the reference's skip-already-processed resume contract,
`/root/reference/gui/app.py` results-cache behavior, re-expressed at
corpus granularity).

Scale shape: one key-partitioned full-outer join — both sides are
(key, fingerprint) projections, so the shuffle carries two slim columns;
keys are unique per snapshot (no skew by construction).  Downstream
stages consume the status column to route work (changed+added →
re-extract; gone → tombstone; unchanged → skip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["crawl_diff", "crawl_diff_counts"]


def crawl_diff(old: DataFrame, new: DataFrame, key_col: str = "url",
               fp_col: str = "fp") -> DataFrame:
    """Per-key diff of two snapshots given (key, content-fingerprint)
    relations: (key, status) with status in
    {'added', 'gone', 'changed', 'unchanged'}.

    Each input must be unique per key (enforce upstream with the exact-
    dedup pass); fingerprints are compared null-safely (a null fp on both
    sides compares 'unchanged' — consistent cross-engine).
    """
    o = old.select(F.col(key_col).alias("k"), F.col(fp_col).alias("fp_old"),
                   F.lit(True).alias("in_old"))
    n = new.select(F.col(key_col).alias("k"), F.col(fp_col).alias("fp_new"),
                   F.lit(True).alias("in_new"))
    j = o.join(n, on="k", how="full_outer")
    status = (
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("gone"))
        .when(F.col("fp_old").eqNullSafe(F.col("fp_new")),
              F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("k").alias(key_col), status.alias("status"))


def crawl_diff_counts(old: DataFrame, new: DataFrame, key_col: str = "url",
                      fp_col: str = "fp") -> DataFrame:
    """Status histogram of the diff — the per-snapshot metrics row."""
    return (crawl_diff(old, new, key_col, fp_col)
            .groupBy("status").agg(F.count(F.lit(1)).alias("n")))
