"""Substring/span-level duplicate detection.

Document-level dedup (exact / MinHash / SimHash — ``operators/dedup.py``)
misses the other common contamination mode in web corpora: two otherwise
distinct pages sharing a long passage (a quoted article, a licence block, a
templated disclaimer). This module composes the winnowing fingerprints
(``operators/textstats.winnow_fingerprints`` — the same k-gram/window scheme
as Schleimer et al.'s MOSS winnowing) into cross-document span matches.

Reference parity note: the reference repo (MokshaDill/OCR-System) has no
span-level dedup — this is part of the LLM-training-data-pipeline surface
the brief adds on top (see COVERAGE.md §2.11).

Scale shape (the 100 TB argument):
  * fingerprints shuffle once, keyed by ``fp`` (an int64) — never text;
  * boilerplate fingerprints (shared by more than ``max_group`` documents)
    are dropped BEFORE the self-join, exactly like the frequent-shingle
    guard in ``ngram_jaccard_pairs``: they carry no pair-level signal and
    are the quadratic-blowup hazard;
  * after the guard every ``fp`` group holds ≤ max_group rows, so the
    per-fp pair fan-out is bounded by max_group²/2 and spread across the
    fp-hash shuffle — no single hot task.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import winnow_fingerprints

__all__ = ["duplicate_spans", "dup_span_doc_mass"]


def _guarded_fps(df: DataFrame, id_col: str, text_col: str, k: int,
                 window: int, max_group: int) -> DataFrame:
    """Winnowing fingerprints with the boilerplate guard applied: rows
    (id, pos, fp) restricted to fps seen in ≤ ``max_group`` distinct docs."""
    fps = winnow_fingerprints(df, id_col=id_col, text_col=text_col,
                              k=k, window=window)
    ok = (fps.groupBy("fp")
          .agg(F.count_distinct(id_col).alias("n_docs"))
          .filter(F.col("n_docs") <= max_group)
          .select("fp"))
    # inner join on fp — one shuffle keyed by the int64 fingerprint; the
    # guard set is NOT broadcast (it is the large side: most fps are rare).
    return fps.join(ok, "fp")


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    max_group: int = 8,
) -> DataFrame:
    """Cross-document span matches: one row per (doc_a < doc_b) pair of
    winnow-selected k-gram positions sharing a fingerprint.

    Output: (id_a, pos_a, id_b, pos_b, fp). Positions index the NORMALIZED
    text (lowercased, whitespace collapsed — the winnowing input), and a
    match at (pos_a, pos_b) attests a shared k-char span; runs of matches
    with a common offset attest a shared passage.

    ``max_group`` is the boilerplate guard: fingerprints present in more
    than that many documents are dropped from BOTH sides before the join
    (they are template/boilerplate mass, not passage-copy evidence, and
    they are the quadratic hazard at crawl scale).
    """
    fps = _guarded_fps(df, id_col, text_col, k, window, max_group)
    a = fps.select(F.col(id_col).alias("id_a"), F.col("pos").alias("pos_a"),
                   "fp")
    b = fps.select(F.col(id_col).alias("id_b"), F.col("pos").alias("pos_b"),
                   "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "pos_a", "id_b", "pos_b", "fp")
    )


def dup_span_doc_mass(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    max_group: int = 8,
) -> DataFrame:
    """Per-document duplicate-span mass: of a document's winnow-selected
    fingerprints, how many are shared with at least one other document
    (within the ``max_group`` boilerplate guard)?

    Output: (id, n_fps, n_dup_fps) — integer counts so the downstream
    ratio n_dup_fps/n_fps stays a derived value and the cross-engine
    comparison is exact. The standard curation use is dropping documents
    whose dup-mass ratio exceeds a threshold (mostly-quoted pages).

    Scale: two aggregations keyed by fp and by id — no joins wider than
    the guard join, no pair materialization at all (this is the operator
    to run corpus-wide; ``duplicate_spans`` is the forensic follow-up).
    """
    fps = winnow_fingerprints(df, id_col=id_col, text_col=text_col,
                              k=k, window=window)
    # distinct (id, fp): a fp repeated inside one doc is not cross-doc
    # evidence, and distinct rows make n_docs a document count
    dfp = fps.select(F.col(id_col).alias("id"), "fp").distinct()
    counts = (dfp.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs")))
    return (
        dfp.join(counts, "fp")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.sum(
                F.when((F.col("n_docs") >= 2)
                       & (F.col("n_docs") <= max_group), 1).otherwise(0)
            ).alias("n_dup_fps"),
        )
    )
