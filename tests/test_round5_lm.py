"""Cross-corpus bigram LM scoring (operators/lm.py)."""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from ocr_system_spark.operators.lm import (
    LOG_MICROS,
    bigram_counts,
    bigram_lm_score,
    bigrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_lm(train_texts):
    """Pure-Python mirror: (bigram counts, context counts, vocab size)."""
    c2: dict = {}
    voc: set = set()
    for t in train_texts:
        toks = t.lower().split()
        voc.update(toks)
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict = {}
    for (a, _), n in c2.items():
        c1[a] = c1.get(a, 0) + n
    return c2, c1, len(voc)


def _py_score(text, c2, c1, v):
    toks = t = text.lower().split()
    n = known = lp = 0
    for a, b in zip(t, t[1:]):
        n += 1
        cc2 = c2.get((a, b), 0)
        cc1 = c1.get(a, 0)
        if cc2 > 0:
            known += 1
        term = (math.log(cc2 + 1) - math.log(cc1 + v)) * LOG_MICROS
        # round-half-away-from-zero, matching Spark/DuckDB round()
        lp += int(math.floor(abs(term) + 0.5)) * (1 if term >= 0 else -1)
    return n, known, lp


class TestBigrams:
    def test_stream_and_short_doc_dropout(self, spark):
        df = _docs(spark, [(0, "A b c"), (1, "one"), (2, "")])
        got = sorted((r["id"], r["w1"], r["w2"])
                     for r in bigrams(df).collect())
        assert got == [(0, "a", "b"), (0, "b", "c")]

    def test_counts_with_multiplicity(self, spark):
        df = _docs(spark, [(0, "x y x y"), (1, "x y")])
        got = {(r["w1"], r["w2"]): r["c2"]
               for r in bigram_counts(df).collect()}
        assert got == {("x", "y"): 3, ("y", "x"): 1}


class TestBigramLmScore:
    TRAIN = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "a cat and a dog"),
    ]
    SCORE = [
        (10, "the cat sat"),          # all bigrams seen in training
        (11, "the zebra runs"),       # fully out-of-vocabulary bigrams
        (12, "dog sat on the moon"),  # mixed
        (13, "one"),                  # <2 tokens: no output row
    ]

    def test_matches_python_mirror(self, spark):
        train = _docs(spark, self.TRAIN)
        score = _docs(spark, self.SCORE)
        c2, c1, v = _py_lm([t for _, t in self.TRAIN])
        out = {r["id"]: r for r in bigram_lm_score(score, train).collect()}
        assert set(out) == {10, 11, 12}
        for did, text in self.SCORE[:3]:
            n, known, lp = _py_score(text, c2, c1, v)
            r = out[did]
            assert (r["n_bigrams"], r["known_bigrams"],
                    r["logprob_micro"]) == (n, known, lp)

    def test_oov_floor_is_one_over_vocab(self, spark):
        train = _docs(spark, self.TRAIN)
        score = _docs(spark, [(20, "qq zz")])
        _, _, v = _py_lm([t for _, t in self.TRAIN])
        r = bigram_lm_score(score, train).collect()[0]
        assert r["known_bigrams"] == 0
        expect = round(-math.log(v) * LOG_MICROS)
        assert r["logprob_micro"] == expect

    def test_partitioning_invariance(self, spark):
        """Quantize-then-sum makes the score independent of partition
        count — the determinism the micros design buys."""
        train = _docs(spark, self.TRAIN)
        score = _docs(spark, self.SCORE)
        a = sorted(map(tuple, bigram_lm_score(score, train).collect()))
        b = sorted(map(tuple, bigram_lm_score(
            score.repartition(7), train.repartition(5)).collect()))
        assert a == b

    def test_longer_known_text_scores_higher_than_oov(self, spark):
        """Sanity: a doc of in-distribution bigrams has a higher (less
        negative) mean log-prob than an OOV doc of the same length."""
        train = _docs(spark, self.TRAIN)
        score = _docs(spark, [(30, "the cat sat on the mat"),
                              (31, "zx qv wk jj pq mm")])
        out = {r["id"]: r for r in bigram_lm_score(score, train).collect()}
        mean = {i: out[i]["logprob_micro"] / out[i]["n_bigrams"]
                for i in (30, 31)}
        assert mean[30] > mean[31]


# ---------------------------------------------------------------------------
# Stupid Backoff (trigram) scoring
# ---------------------------------------------------------------------------

def _round_half_away(x):
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _py_backoff(train_texts, text):
    from ocr_system_spark.operators.lm import BACKOFF
    c123: dict = {}
    c2: dict = {}
    uni: dict = {}
    for t in train_texts:
        tk = t.lower().split()
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(tk, tk[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
        for a, b, c in zip(tk, tk[1:], tk[2:]):
            c123[(a, b, c)] = c123.get((a, b, c), 0) + 1
    n_tok, v = sum(uni.values()), len(uni)
    tk = text.lower().split()
    n = h3 = h2 = lp = 0
    for a, b, c in zip(tk, tk[1:], tk[2:]):
        n += 1
        t3, b12, b23 = c123.get((a, b, c), 0), c2.get((a, b), 0), c2.get((b, c), 0)
        if t3 > 0:
            h3 += 1
            term = math.log(t3) - math.log(b12)
        elif b23 > 0:
            h2 += 1
            term = math.log(BACKOFF) + math.log(b23) - math.log(uni[b])
        else:
            term = (math.log(BACKOFF) + math.log(BACKOFF)
                    + math.log(uni.get(c, 0) + 1)
                    - math.log(float(n_tok + v)))
        lp += _round_half_away(term * LOG_MICROS)
    return n, h3, h2, lp


class TestStupidBackoff:
    TRAIN = [(0, "the cat sat on the mat"),
             (1, "the dog sat on the log"),
             (2, "a cat and a dog sat here")]
    # exercises all three branches: seen trigram, bigram backoff,
    # unigram floor (incl. an OOV word)
    SCORE = [(10, "the cat sat daily on the log"),
             (11, "xx"),             # < 3 tokens -> drops out entirely
             (12, "dog sat on")]

    def test_matches_python_mirror(self, spark):
        from ocr_system_spark.operators.lm import stupid_backoff_score
        got = {r["id"]: (r["n_trigrams"], r["hit3"], r["hit2"],
                         r["logscore_micro"])
               for r in stupid_backoff_score(
                   _docs(spark, self.SCORE),
                   _docs(spark, self.TRAIN)).collect()}
        train_texts = [t for _, t in self.TRAIN]
        exp = {i: _py_backoff(train_texts, t)
               for i, t in self.SCORE if len(t.split()) >= 3}
        assert got == exp
        assert 11 not in got
        # sanity: the mixed doc really hits every branch
        n, h3, h2, _ = exp[10]
        assert h3 > 0 and h2 > 0 and h3 + h2 < n

    def test_partitioning_invariance(self, spark):
        from ocr_system_spark.operators.lm import stupid_backoff_score
        a = sorted(map(tuple, stupid_backoff_score(
            _docs(spark, self.SCORE), _docs(spark, self.TRAIN)).collect()))
        b = sorted(map(tuple, stupid_backoff_score(
            _docs(spark, self.SCORE).repartition(7),
            _docs(spark, self.TRAIN).repartition(5)).collect()))
        assert a == b

    def test_empty_train_yields_null_scores(self, spark):
        """No model -> documented errors-as-data: counts stay exact,
        logscore_micro is NULL (ln of an empty model's 0 mass)."""
        from ocr_system_spark.operators.lm import stupid_backoff_score
        rows = stupid_backoff_score(
            _docs(spark, [(0, "a b c d")]),
            _docs(spark, [(9, "")])).collect()
        assert [(r["id"], r["n_trigrams"], r["logscore_micro"])
                for r in rows] == [(0, 2, None)]
