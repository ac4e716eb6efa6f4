"""Benchmark decontamination — remove training documents that leak
evaluation data.

The standard LLM-training hygiene step (GPT-3 appendix C, PaLM, Llama):
a training document is CONTAMINATED when it shares at least one word
n-gram with any document of an evaluation benchmark. The reference
pipeline has no analog (it never trains anything); this operator is part
of the training-data tier this engine adds (SURVEY §2 extension, same
family as dedup/curation).

Spark shape — the whole point at 100 TB: the benchmark side is SMALL by
definition (eval suites are thousands of rows, not billions), so its
distinct shingle-hash set is BROADCAST and the contamination flag is a
map-side broadcast semi-join on a 64-bit hash — the corpus is touched in
ONE scan with NO shuffle for the filter form; the per-doc hit-count form
adds exactly one doc-keyed aggregation. Shingles travel as
md5-derived 64-bit hashes (md5_number_lower — DuckDB-replayable) (``with_hashed_shingles`` — same kernel and
hash as the dedup family, so a corpus already signed for dedup reuses its
arrays), and equality of hash sets equals equality of string sets w.h.p.
(collisions ~n²/2^64).

``n`` defaults to 8: long enough that natural re-use of common phrasing
does not flag (the published pipelines use 8–13), short enough that a
quoted benchmark item cannot hide behind minor truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_hashed_shingles

__all__ = ["contamination_hits", "decontaminate"]


def _bench_shingles(benchmark: DataFrame, text_col: str, n: int) -> DataFrame:
    return (
        with_hashed_shingles(benchmark.select(text_col), text_col, n)
        .select(F.explode("sh_hashes").alias("h"))
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, n_hits): corpus docs sharing ≥ 1 word-``n``-gram with the
    benchmark, with the count of DISTINCT shared shingles (the audit
    relation — thresholding/reporting happens downstream as plain SQL).
    Plan: corpus-side explode → broadcast hash semi-join per shingle →
    one groupBy(id); the only shuffle is the final doc-keyed count."""
    c = (
        with_hashed_shingles(corpus.select(id_col, text_col), text_col, n)
        .select(F.col(id_col).alias("id"), F.explode("sh_hashes").alias("h"))
    )
    hits = c.join(F.broadcast(_bench_shingles(benchmark, bench_text_col, n)),
                  "h", "left_semi")
    return hits.groupBy("id").agg(F.count(F.lit(1)).alias("n_hits"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """The corpus minus contaminated documents: broadcast SEMI join of the
    exploded shingle hashes finds dirty ids (map-side against the
    broadcast benchmark set), then one ANTI join removes them — the
    corpus text is scanned once, and the only corpus-sized shuffle is the
    id-keyed anti join (at 10^12 docs, prune it further by running
    ``contamination_hits`` once and reusing its tiny dirty-id relation
    across every downstream consumer)."""
    dirty_ids = (
        with_hashed_shingles(corpus.select(id_col, text_col), text_col, n)
        .select(F.col(id_col), F.explode("sh_hashes").alias("h"))
        .join(F.broadcast(_bench_shingles(benchmark, bench_text_col, n)),
              "h", "left_semi")
        .select(id_col).distinct()
    )
    return corpus.join(dirty_ids, id_col, "left_anti")
