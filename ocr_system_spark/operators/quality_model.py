"""Model-based quality scoring: linear bag-of-words document scorer.

The "model-based quality filter" stage of public web-curation pipelines
(CCNet's fastText LM filter, RefinedWeb/FineWeb quality classifiers): a
LINEAR scorer over token features is the production-standard shape
because it runs at crawl scale.  Two paths:

* ``linear_score(df, weights)`` — the real operator: per-token weights
  arrive as a (term, weight) relation (exported from any trained linear /
  fastText-style model), broadcast to the corpus token stream, summed per
  document.  One corpus-sized explode + broadcast join + map-side-combined
  sum: no shuffle of the corpus beyond the per-doc aggregation.
* ``hashed_linear_score(df)`` — the same dataflow with a DETERMINISTIC
  stub weight function (md5-hex-derived integer in [-1000, 1000]) instead
  of a trained table, so correctness of the scoring plumbing is
  cross-engine verifiable bit-for-bit without shipping a model file.
  The weight derivation is pure JVM expression (no join at all).

Integer-exact throughout: weights and scores are integers, so an
independent SQL engine reproduces every score exactly (a float model
would be replayed via its quantized integer export, same as the int8
similarity path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_system_spark.functions.tokens import exploded_terms as _tokens

__all__ = ["linear_score", "hashed_linear_score", "stub_weight_expr"]

_HEX = "0123456789abcdef"


def stub_weight_expr(term: Column) -> Column:
    """Deterministic stand-in weight for a term: the first four hex digits
    of md5(term) as a base-16 integer, mapped to [-1000, 1000] via
    ``% 2001 - 1000``.  Hex digits decode via string position (instr), so
    any engine with md5 + instr reproduces the weight without numeric
    hex-parsing builtins."""
    h = F.md5(F.encode(term, "UTF-8"))

    def digit(i: int) -> Column:
        return F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1

    val = (digit(1) * 4096 + digit(2) * 256 + digit(3) * 16 + digit(4))
    return (val % 2001 - 1000).cast("long")


def hashed_linear_score(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        threshold: int = 0) -> DataFrame:
    """Per-document linear quality score with the stub weight function:
    (id, n_tokens, score, keep) where score = Σ weight(token) over the
    token stream (with multiplicity) and keep = score >= threshold.
    Zero joins: weight is computed inline per token; one per-doc hash
    aggregation is the only shuffle."""
    tok = _tokens(df, id_col, text_col)
    return (
        tok.select("id", stub_weight_expr(F.col("term")).alias("w"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
             F.sum("w").cast("long").alias("score"))
        .withColumn("keep", F.col("score") >= F.lit(threshold))
    )


def quality_tiers(scored: DataFrame, score_col: str = "score",
                  id_col: str = "id", n_tiers: int = 4) -> DataFrame:
    """Bin scored documents into ``n_tiers`` equal-count quality tiers
    (tier 1 = lowest score) — the FineWeb/CCNet-style bucketing that
    feeds curriculum mixing and per-tier sampling rates.

    Deterministic total order (score, then id) makes ntile reproducible
    across engines, partitionings, and reruns.  One global sort — the
    same single-total-order shape as any ranking sink; for corpora where
    a global sort is unacceptable, bucket by precomputed score
    thresholds instead (two passes: approx quantiles, then a map).
    """
    from pyspark.sql import Window as W

    if n_tiers <= 0:
        raise ValueError(f"n_tiers must be positive, got {n_tiers}")
    w = W.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    return scored.select(
        F.col(id_col).alias("id"),
        F.col(score_col).alias("score"),
        F.ntile(n_tiers).over(w).cast("int").alias("tier"),
    )


def linear_score(df: DataFrame, weights: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 default_weight: int = 0,
                 threshold: int = 0,
                 broadcast_weights: bool = True) -> DataFrame:
    """Per-document linear score against a trained (term, weight) relation
    (integer weights — export a float model quantized; one row per term,
    or the join fans out).  Out-of-vocabulary tokens take
    ``default_weight``.  The weight table is broadcast by default (linear
    text models are ≤ a few hundred MB quantized);
    ``broadcast_weights=False`` shuffles the pre-aggregated token counts
    on term instead, for vocabularies past the broadcast ceiling."""
    tok = _tokens(df, id_col, text_col)
    tf = tok.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    w_side = F.broadcast(weights) if broadcast_weights else weights
    joined = tf.join(w_side, on="term", how="left")
    w = F.coalesce(F.col("weight"), F.lit(default_weight))
    return (
        joined.groupBy("id")
        .agg(F.sum("tf").cast("long").alias("n_tokens"),
             F.sum(F.col("tf") * w).cast("long").alias("score"))
        .withColumn("keep", F.col("score") >= F.lit(threshold))
    )
