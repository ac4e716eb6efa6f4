"""DSIR hashed n-gram importance weighting (operators/dsir.py)."""
from __future__ import annotations

import hashlib
import math

import pytest

from ocr_system_spark.operators.dsir import (
    LOG_MICROS,
    bucket_counts,
    dsir_logweight,
    dsir_resample,
    hashed_features,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_feats(text, n_buckets):
    toks = text.lower().split()
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out: dict = {}
    for f in feats:
        b = int(hashlib.md5(f.encode()).hexdigest()[:4], 16) % n_buckets
        out[b] = out.get(b, 0) + 1
    return out


def _py_model(texts, n_buckets):
    m: dict = {}
    for t in texts:
        for b, tf in _py_feats(t, n_buckets).items():
            m[b] = m.get(b, 0) + tf
    return m, sum(m.values())


def _round_half_away(x):
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _py_logweight(text, tgt, np_, raw, nq, n_buckets):
    n = lw = 0
    for b, tf in _py_feats(text, n_buckets).items():
        n += tf
        lr = ((math.log(tgt.get(b, 0) + 1) - math.log(np_ + n_buckets))
              - (math.log(raw.get(b, 0) + 1) - math.log(nq + n_buckets))
              ) * LOG_MICROS
        lw += tf * _round_half_away(lr)
    return n, lw


TARGET = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog sat"),
]
RAW = [
    (10, "buy cheap pills online now"),
    (11, "the cat sat on the mat"),
    (12, "click here to win money now"),
    (13, ""),
]


class TestHashedFeatures:
    def test_matches_python_mirror(self, spark):
        df = _docs(spark, [(0, "A b a")])
        got = {r["bucket"]: r["tf"]
               for r in hashed_features(df, n_buckets=64).collect()}
        assert got == _py_feats("A b a", 64)

    def test_empty_and_null_drop_out(self, spark):
        df = _docs(spark, [(0, ""), (1, None), (2, "x")])
        rows = hashed_features(df, n_buckets=16).collect()
        assert {r["id"] for r in rows} == {2}

    def test_single_token_doc_has_unigram_only(self, spark):
        df = _docs(spark, [(0, "solo")])
        rows = hashed_features(df, n_buckets=16).collect()
        assert sum(r["tf"] for r in rows) == 1

    def test_bucket_bounds_validated(self, spark):
        df = _docs(spark, [(0, "x y")])
        with pytest.raises(ValueError):
            hashed_features(df, n_buckets=0)
        with pytest.raises(ValueError):
            hashed_features(df, n_buckets=16 ** 4 + 1)


class TestDsirLogweight:
    def test_matches_python_mirror(self, spark):
        nb = 64
        target = _docs(spark, TARGET)
        raw = _docs(spark, RAW)
        tgt, np_ = _py_model([t for _, t in TARGET], nb)
        rawm, nq = _py_model([t for _, t in RAW if t], nb)
        out = {r["id"]: r for r in
               dsir_logweight(raw, target, n_buckets=nb).collect()}
        assert set(out) == {10, 11, 12}
        for did, text in RAW[:3]:
            n, lw = _py_logweight(text, tgt, np_, rawm, nq, nb)
            assert (out[did]["n_feats"],
                    out[did]["logweight_micro"]) == (n, lw)

    def test_in_target_doc_outweighs_spam(self, spark):
        """The doc that also appears in the target corpus gets a higher
        per-feature weight than the spam docs — the selection signal."""
        target = _docs(spark, TARGET)
        raw = _docs(spark, RAW)
        out = {r["id"]: r["logweight_micro"] / r["n_feats"]
               for r in dsir_logweight(raw, target, n_buckets=64).collect()}
        assert out[11] > out[10] and out[11] > out[12]

    def test_explicit_raw_df(self, spark):
        """raw_df=score_df (default) equals passing score_df explicitly."""
        target = _docs(spark, TARGET)
        raw = _docs(spark, RAW)
        a = sorted(map(tuple, dsir_logweight(raw, target).collect()))
        b = sorted(map(tuple,
                       dsir_logweight(raw, target, raw_df=raw).collect()))
        assert a == b

    def test_partitioning_invariance(self, spark):
        target = _docs(spark, TARGET)
        raw = _docs(spark, RAW)
        a = sorted(map(tuple, dsir_logweight(raw, target).collect()))
        b = sorted(map(tuple, dsir_logweight(
            raw.repartition(7), target.repartition(5)).collect()))
        assert a == b

    def test_model_counts(self, spark):
        df = _docs(spark, [(0, "x y"), (1, "x")])
        m = {r["bucket"]: r["c"]
             for r in bucket_counts(hashed_features(df, n_buckets=32))
             .collect()}
        exp, _ = _py_model(["x y", "x"], 32)
        assert m == exp


def _py_gumbel_micro(doc_id):
    h = int(hashlib.md5(f"gumbel:{doc_id}".encode()).hexdigest()[:4], 16)
    u = (h + 1) / 65537.0
    return _round_half_away(-math.log(-math.log(u)) * LOG_MICROS)


class TestDsirResample:
    def _weights(self, spark, rows):
        return spark.createDataFrame(
            rows, "id long, n_feats long, logweight_micro long")

    def test_matches_python_mirror(self, spark):
        rows = [(i, 5, w) for i, w in
                [(0, 100), (1, -50), (2, 900), (3, 0), (4, 400)]]
        got = dsir_resample(self._weights(spark, rows), k=3).collect()
        keys = sorted(((w + _py_gumbel_micro(i), i) for i, _, w in rows),
                      key=lambda t: (-t[0], t[1]))[:3]
        assert [(r["id"], r["key_micro"]) for r in got] == \
            [(i, k) for k, i in keys]
        for r in got:
            assert r["gumbel_micro"] == _py_gumbel_micro(r["id"])
            assert r["key_micro"] == r["logweight_micro"] + r["gumbel_micro"]

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, 1, (i * 37) % 11 * 1000) for i in range(40)]
        df = self._weights(spark, rows)
        a = [tuple(r) for r in dsir_resample(df, k=10).collect()]
        b = [tuple(r) for r in dsir_resample(df.repartition(13), k=10)
             .collect()]
        assert a == b and len(a) == 10

    def test_k_at_least_corpus_keeps_all(self, spark):
        df = self._weights(spark, [(i, 1, 0) for i in range(5)])
        assert len(dsir_resample(df, k=99).collect()) == 5

    def test_k_validated(self, spark):
        df = self._weights(spark, [(0, 1, 0)])
        with pytest.raises(ValueError):
            dsir_resample(df, k=0)

    def test_plan_is_topk_not_full_sort(self, spark):
        """Global top-k must compile to TakeOrderedAndProject (partial
        per-partition top-k), never a full Sort + Exchange(range)."""
        df = self._weights(spark, [(i, 1, 0) for i in range(10)])
        plan = dsir_resample(df, k=3)._jdf.queryExecution().executedPlan() \
            .toString()
        assert "TakeOrderedAndProject" in plan
        assert "rangepartitioning" not in plan.lower()
