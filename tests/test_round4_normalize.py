"""Unicode text normalization (operators/normalize.py).

All non-ASCII codepoints are written as explicit escapes so the test's
intent (decomposed vs composed) survives any editor/tooling NFC pass.
"""
from __future__ import annotations

from ocr_system_spark.operators.normalize import normalize_text

DECOMP_CAFE = "cafe\u0301"            # e + COMBINING ACUTE
COMP_CAFE = "caf\u00e9"               # precomposed
DECOMP_ANG = "A\u030angstro\u0308m"  # A+RING, o+DIAERESIS
COMP_ANG = "\u00c5ngstr\u00f6m"
ZW = "z\u200bw\u200c\u200d\ufeffx"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestNormalizeText:
    def test_nfc_composes_decomposed_codepoints(self, spark):
        df = _df(spark, [(0, DECOMP_CAFE), (1, DECOMP_ANG)])
        out = {r["id"]: r["norm_text"]
               for r in normalize_text(df).collect()}
        assert out[0] == COMP_CAFE
        assert out[1] == COMP_ANG

    def test_crlf_and_zero_width(self, spark):
        df = _df(spark, [(0, "a\r\nb"), (1, ZW)])
        out = {r["id"]: r["norm_text"]
               for r in normalize_text(df).collect()}
        assert out[0] == "a\nb"
        assert out[1] == "zwx"

    def test_already_normal_text_is_fixpoint(self, spark):
        df = _df(spark, [(0, "plain ascii stays put\nline two")])
        r = normalize_text(df).collect()[0]
        assert r["norm_text"] == "plain ascii stays put\nline two"
        again = normalize_text(
            _df(spark, [(0, r["norm_text"])])).collect()[0]
        assert again["norm_text"] == r["norm_text"]

    def test_null_text_empty(self, spark):
        df = _df(spark, [(0, None)])
        assert normalize_text(df).collect()[0]["norm_text"] == ""

    def test_dedup_equivalence_motivation(self, spark):
        """The reason the pass exists: the same rendered text hashes
        identically after normalization — decomposed doc 0 and composed
        doc 1 become byte-identical."""
        df = _df(spark, [(0, DECOMP_CAFE), (1, COMP_CAFE)])
        out = {r["id"]: r["norm_text"]
               for r in normalize_text(df).collect()}
        assert out[0] == out[1] == COMP_CAFE
