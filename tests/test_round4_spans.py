"""Round-4 property tests for span-level dedup excision
(operators/spans.remove_duplicate_spans): codepoint safety under
multi-byte text, PAGE BREAK separator survival, and the cleaned-text
fixpoint."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from ocr_system_spark.operators.spans import (remove_duplicate_spans,
                                              winnow_normalize_col)

_spark = None


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    # hypothesis @given can't take pytest fixtures as parameters; stash the
    # session-scoped spark for the property bodies
    global _spark
    _spark = spark
    yield


def _norm(spark, rows):
    out = (spark.createDataFrame(rows, "doc_id long, text string")
           .select("doc_id",
                   winnow_normalize_col(F.col("text")).alias("t")).collect())
    return {r["doc_id"]: r["t"] for r in out}


def _clean(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_duplicate_spans(df, **kw).collect()
    return {r["id"]: (r["clean_text"], r["n_removed"]) for r in out}


# words deliberately include multi-byte codepoints (2-, 3-, 4-byte UTF-8):
# a byte-indexed substr bug would slice through them
_MB = ["héllo", "naïve", "汉字文本", "καλά", "emoji😀word", "ascii"]

_passage_words = st.integers(min_value=6, max_value=10)
_affix_words = st.integers(min_value=3, max_value=8)
_seed = st.integers(min_value=0, max_value=10**6)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n_pass=_passage_words, n_pre=_affix_words, n_suf=_affix_words,
       seed=_seed)
def test_excision_codepoint_safe_and_fixpoint(n_pass, n_pre, n_suf, seed):
    """Three docs; docs 1 and 2 share a multi-byte passage inside unique
    context, doc 3 is all-unique. Properties:
      * untouched doc comes back as its normalized text, n_removed = 0;
      * excision removes whole codepoints only (clean chars are a
        sub-multiset of the normalized chars; no U+FFFD ever appears);
      * n_removed is exactly the length difference;
      * affected docs really lost the passage core;
      * re-running on the cleaned text is a FIXPOINT (nothing new to
        remove — surviving shared fragments are shorter than k)."""
    spark = _spark
    mb = [_MB[(seed + j) % len(_MB)] for j in range(n_pass)]
    passage = " ".join(f"{w}s{seed % 97}p{j}" for j, w in enumerate(mb))
    rows = [
        (1, " ".join(f"d1u{j}q{seed % 89}" for j in range(n_pre))
             + f" {passage} " + " ".join(f"d1v{j}" for j in range(n_suf))),
        (2, " ".join(f"d2u{j}r{seed % 83}" for j in range(n_suf))
             + f" {passage} " + " ".join(f"d2v{j}" for j in range(n_pre))),
        (3, " ".join(f"d3w{j}z{seed % 79}" for j in range(n_pre + n_pass))),
    ]
    norm = _norm(spark, rows)
    got = _clean(spark, rows)

    assert got[3] == (norm[3], 0)                       # untouched doc
    for i in (1, 2, 3):
        clean, n_removed = got[i]
        assert n_removed == len(norm[i]) - len(clean)
        assert "�" not in clean
        assert not (Counter(clean) - Counter(norm[i]))  # sub-multiset
    # the shared passage core is gone from both affected docs
    core = passage.lower()[8:-8]
    if core:
        assert core not in got[1][0] and core not in got[2][0]
    assert got[1][1] > 0 and got[2][1] > 0

    # fixpoint: run again on the cleaned texts
    rows2 = [(i, got[i][0]) for i in (1, 2, 3)]
    got2 = _clean(spark, rows2)
    for i in (1, 2, 3):
        assert got2[i] == (got[i][0], 0), (i, got2[i][1])


def test_excision_never_splits_page_break_separator(spark):
    """The load-bearing PAGE BREAK separator (functions/patterns.py) is
    boilerplate present in EVERY doc: its fingerprints exceed max_group
    and are guard-dropped, and boundary k-grams differ per doc — so
    excision of a genuine shared passage never bites into the separator."""
    sep = "\n\n--- PAGE BREAK ---\n\n"
    sep_norm = "--- page break ---"
    passage = " ".join(f"sharedpass{j}" for j in range(8))
    rows = []
    for i in range(10):
        left = " ".join(f"d{i}u{j}" for j in range(6))
        right = " ".join(f"d{i}v{j}" for j in range(6))
        mid = f" {passage} " if i < 2 else " "
        rows.append((i, left + mid + "tail" + str(i) + sep + right))
    out = _clean(spark, rows, max_group=8)
    for i in range(10):
        assert sep_norm in out[i][0], i
    assert out[0][1] > 0 and out[1][1] > 0              # passage excised
    for i in range(2, 10):
        assert out[i][1] == 0
