"""Deterministic corpus sampling operators — the curation steps between
dedup and training-set assembly.

Two operators, both chosen for EXACT cross-engine determinism (no floats,
no RNG state — a corpus rebuild on any engine reproduces the same sample
bit-for-bit, which is what makes ablations and incremental rebuilds
comparable):

* ``cap_per_group`` — keep at most ``cap`` rows per group, chosen by
  md5-order (a fair deterministic lottery). The standard WEB-PIPELINE
  treatment of dominance: cap docs per url host (one forum must not be 3%
  of the corpus), per source, per language. One window per group key;
  Spark 4 compiles the rank<=cap filter to a partial WindowGroupLimit, so
  a viral host ships ~cap rows per map partition rather than its whole
  membership — the same map-side prune ``keep_best`` gets.

* ``with_split`` — reproducible train/holdout assignment from the md5 of
  the id: a row is held out iff its digest's first hex digits fall below
  a threshold, giving exact k/16^d fractions with zero shuffle (a pure
  map — at 10^12 docs the split costs nothing and never drifts between
  runs). Hex-string comparison is engine-portable (lowercase hex on both
  Spark and DuckDB).

The reference repo has no sampling analog (it processes every file);
these belong to the training-data tier the brief adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cap_per_group", "with_split", "mixture_sample", "md5_key"]


def md5_key(col: Column) -> Column:
    """Lowercase-hex md5 of the value's string form — the deterministic
    lottery ticket used by both operators (and by the IVF sampler)."""
    return F.md5(col.cast("string").cast("binary"))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``cap`` rows per ``group_col`` value, deterministically
    chosen by (md5(id), id) order — a fair lottery that is stable across
    engines, partitionings, and reruns. Rows keep all their columns."""
    from pyspark.sql import Window as W

    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    w = W.partitionBy(group_col).orderBy(md5_key(F.col(id_col)), id_col)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap).drop("_rn"))


def mixture_sample(
    df: DataFrame,
    group_col: str,
    rate_sixteenths: dict,
    id_col: str = "doc_id",
    default_sixteenths: int = 16,
) -> DataFrame:
    """Deterministic DATA-MIXING sampler: keep each row with a per-group
    rate of ``rate_sixteenths[group]/16`` (16 = keep all) — the final
    curation step that upsamples high-quality tiers / downsamples noisy
    sources by exact, reproducible fractions.

    Keep rule: first hex digit of md5(id) < rate — the same zero-shuffle
    md5 lottery as ``with_split``, so mixing composes with splitting
    (a row's lottery ticket is fixed forever) and a corpus rebuild on any
    engine reproduces the identical sample.  Groups absent from the dict
    take ``default_sixteenths``.  Pure map: no shuffle, no RNG.
    """
    for g, k in rate_sixteenths.items():
        if not 0 <= k <= 16:
            raise ValueError(f"rate for {g!r} must be in [0, 16], got {k}")
    if not 0 <= default_sixteenths <= 16:
        raise ValueError(
            f"default_sixteenths must be in [0, 16], got {default_sixteenths}")
    rate = F.lit(format(default_sixteenths, "x") if default_sixteenths < 16
                 else "g")            # 'g' > 'f': keep everything
    for g, k in sorted(rate_sixteenths.items(), key=lambda kv: str(kv[0])):
        rate = F.when(F.col(group_col) == F.lit(g),
                      F.lit(format(k, "x") if k < 16 else "g")) \
                .otherwise(rate)
    return df.filter(F.substring(md5_key(F.col(id_col)), 1, 1) < rate)


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    holdout_sixteenths: int = 1,
    out_col: str = "split",
) -> DataFrame:
    """Adds ``split`` ∈ {'holdout', 'train'}: a row is held out iff the
    first hex digit of md5(id) is below ``holdout_sixteenths`` — an exact
    k/16 expected fraction, deterministic per id forever (new crawl
    batches land in the same split their ids dictate; no coordination,
    no shuffle, no RNG)."""
    if not 0 < holdout_sixteenths < 16:
        raise ValueError(
            f"holdout_sixteenths must be in (0, 16), got {holdout_sixteenths}")
    bound = format(holdout_sixteenths, "x")
    return df.withColumn(
        out_col,
        F.when(F.substring(md5_key(F.col(id_col)), 1, 1) < bound,
               F.lit("holdout")).otherwise(F.lit("train")))
