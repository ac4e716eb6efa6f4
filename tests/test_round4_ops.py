"""Round-4 operators: guard-aware n-gram dedup evidence, incremental
MinHash index update, quality-aware keep-best dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_system_spark.operators import dedup


# ---------------------------------------------------------------------------
# guard-aware n-gram Jaccard: the adversarial corpus the driver query uses
# ---------------------------------------------------------------------------

def _guard_corpus(spark, n_docs=200):
    """Every doc: one universal 3-word prefix (hot shingle), a mid tier
    keyed by (id//2)%16, a pair tier keyed by id//2, one unique word."""
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    g = F.floor(F.col("doc_id") / 2).cast("long")
    gs, xs = g.cast("string"), (g % 16).cast("string")
    text = F.concat_ws(
        " ", F.lit("z0"), F.lit("z1"), F.lit("z2"),
        F.concat(F.lit("ma"), xs), F.concat(F.lit("mb"), xs),
        F.concat(F.lit("mc"), xs),
        F.concat(F.lit("pa"), gs), F.concat(F.lit("pb"), gs),
        F.concat(F.lit("pc"), gs),
        F.concat(F.lit("u"), F.col("doc_id").cast("string")))
    return d.select("doc_id", text.alias("text"))


def test_ngram_guard_construction_has_hot_and_salted_groups(spark):
    """The adversarial corpus really does exercise both guard tiers at the
    chosen params: ≥1 shingle group > max_group (dropped) and ≥1 group in
    (salt_cap, max_group] (salted)."""
    docs = _guard_corpus(spark)
    freq = (dedup.with_hashed_shingles(docs, "text", 3)
            .select(F.explode("sh_hashes").alias("h"))
            .groupBy("h").agg(F.count(F.lit(1)).alias("g")))
    assert freq.filter(F.col("g") > 150).count() >= 1          # hot tier
    assert freq.filter((F.col("g") > 4) & (F.col("g") <= 150)).count() >= 1


def test_ngram_guard_changes_the_answer(spark):
    """Guarded vs unguarded runs disagree on (inter, uni) for every pair —
    so the driver oracle's hash match is proof the guard fired, not a
    vacuous pass."""
    docs = _guard_corpus(spark)
    guarded = dedup.ngram_jaccard_pairs(
        docs, "doc_id", min_jaccard_pct=50, max_group=150, salt_cap=20) \
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    unguarded = dedup.ngram_jaccard_pairs(
        docs, "doc_id", min_jaccard_pct=50, max_group=10**9, salt_cap=10**9) \
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # same pair set (pairs sit far above the threshold either way) ...
    assert list(guarded["id_a"]) == list(unguarded["id_a"])
    assert list(guarded["id_b"]) == list(unguarded["id_b"])
    # ... but the counts exclude the hot shingle only under the guard
    assert (guarded["inter"] == 6).all() and (guarded["uni"] == 8).all()
    assert (unguarded["inter"] == 7).all() and (unguarded["uni"] == 9).all()
    assert len(guarded) == 100                     # one pair per doc couple


def test_ngram_salting_is_output_invariant(spark):
    """Tiny salt_cap (mid groups of ~12 docs get triangle-salted) vs huge
    salt_cap (plain join): identical pairs and counts — salting changes
    the plan, never the answer."""
    docs = _guard_corpus(spark)
    a = dedup.ngram_jaccard_pairs(
        docs, "doc_id", min_jaccard_pct=50, max_group=150, salt_cap=4) \
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = dedup.ngram_jaccard_pairs(
        docs, "doc_id", min_jaccard_pct=50, max_group=150, salt_cap=10**9) \
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert a.equals(b)
