"""DSIR hashed n-gram importance weighting (operators/dsir.py)."""
from __future__ import annotations

import hashlib
import math

import pytest

from ocr_system_spark.operators.dsir import (
    LOG_MICROS,
    bucket_counts,
    dsir_logweight,
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
