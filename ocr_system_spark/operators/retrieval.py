"""BM25 full-text retrieval — inverted-index scoring as relational algebra.

Training-data pipelines retrieve as well as filter: targeted corpus
construction ("find the documents most relevant to these seed queries"),
eval-set mining, and retrieval-augmented dataset building all reduce to
scoring a bounded query set against the whole corpus and keeping the
top-k per query.  The reference system (MokshaDill/OCR-System) extracts
fields per file and never ranks anything (`ocr/pipeline.py`); this
module adds the Okapi BM25 ranking tier over the pinned cross-engine
token stream (`functions/tokens.py`).

The index is not a special data structure — it IS the relational
decomposition Spark already optimizes:

* ``postings(corpus)`` — (id, term, tf) with per-doc length ``dl``:
  one corpus scan, one (id, term)-keyed map-side-combined aggregation.
* document frequency — a vocabulary-sized re-aggregation of postings.
* ``bm25_topk(corpus, queries, k)`` — score every (query, doc) pair
  that shares ≥1 term and keep the k best per query.

Determinism contract: per (query-term, doc) contribution is computed in
IEEE doubles with a PINNED operation order (the oracle SQL mirrors the
expression token-for-token) and quantized to integer micros BEFORE the
per-doc sum — the same sum-of-rounded-terms idiom as `operators/lm.py`,
making the final score an exact integer aggregation under any
partitioning.  Ties break by ascending doc id.

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))        [Lucene form]
    tfn(t, d)   = tf·(k1+1) / (tf + k1·(1 − b + b·(dl·N / L)))
    score(q, d) = Σ_t round(1e6 · idf·tfn)

with N = corpus docs with ≥1 token, L = total token count (so ``dl·N/L``
is the dl/avgdl ratio without a separately rounded avgdl), k1 = 1.2,
b = 0.75.

Scale shape at 100 TB: the QUERY relation is bounded (a query workload,
not a corpus) and broadcast; document frequency is vocabulary-sized
(broadcast under AQE while it fits, term-keyed shuffle past the
ceiling, the `linear_score` fallback contract); the (id, term) postings
relation — the only corpus-sized one — is touched by exactly one
term-keyed semi-broadcast join and one (query, id)-keyed aggregation.
Per-query top-k is a keyed window that Spark executes as map-side
WindowGroupLimit (partial top-k before the shuffle, the
`dedup_keep_best` precedent) — k rows per query per partition move,
not N.  N and L are one bounded 1-row driver collect (the `lm.py` V
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_system_spark.functions.tokens import exploded_terms

__all__ = ["postings", "bm25_topk"]

SCORE_MICROS = 1_000_000
K1 = 1.2
B = 0.75


def postings(corpus: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(id, term, tf, dl) — term frequencies with the per-doc token count
    replicated onto every posting (a window over the (id, term) relation,
    id-keyed, map-side aggregated).  Empty/null docs drop out."""
    tf = (exploded_terms(corpus, id_col, text_col)
          .groupBy("id", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    return tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("id")).cast("long"))


def bm25_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-``k`` documents per query by BM25: (query_id, id, n_terms,
    score_micro, rn) with rn the 1-based rank (score desc, id asc) and
    ``n_terms`` the count of distinct query terms the doc matched.

    ``queries`` is a (query_id, term) relation — one row per DISTINCT
    query term (duplicate terms in a query are a weighting decision this
    operator does not take; ``.distinct()`` upstream if your workload
    repeats terms).  Terms are matched against the pinned token alphabet,
    so cased/raw query strings should pass through
    ``lower_ascii_tokens`` first."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    from pyspark import StorageLevel

    p = postings(corpus, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK)
    stats = p.groupBy().agg(
        F.countDistinct("id").cast("long").alias("n"),
        F.sum("tf").cast("long").alias("l")).first()
    n_docs, total_len = int(stats["n"] or 0), int(stats["l"] or 0)
    if n_docs == 0:
        return (queries.select(F.col("query_id"),
                               F.lit(0).cast("long").alias("id"),
                               F.lit(0).cast("long").alias("n_terms"),
                               F.lit(0).cast("long").alias("score_micro"),
                               F.lit(0).cast("int").alias("rn"))
                .limit(0))

    df_rel = p.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"))

    q = queries.select("query_id", "term")
    matched = (p.join(F.broadcast(q), "term")
               .join(df_rel, "term"))

    # pinned operation order — the oracle SQL mirrors this token-for-token
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5)
        / (F.col("df") + 0.5))
    tfn = (F.col("tf") * (K1 + 1.0)
           / (F.col("tf")
              + K1 * (1.0 - B
                      + B * (F.col("dl").cast("double") * n_docs
                             / total_len))))
    contrib = F.round(idf * tfn * SCORE_MICROS).cast("long")

    scored = (matched.select("query_id", "id", contrib.alias("c"))
              .groupBy("query_id", "id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_terms"),
                   F.sum("c").cast("long").alias("score_micro")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("id").asc())
    # postings stay persisted for the df_rel + matched branches of THIS
    # plan; the reference-based ContextCleaner releases them (the lm.py
    # model-persist contract — an eager unpersist here would force the
    # returned plan to recompute the corpus scan twice).
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))
