"""BPE merge training / encoding (operators/bpe.py): parity with the
classic algorithm, determinism, and edge cases."""
from __future__ import annotations

import collections

import pytest

from ocr_system_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    bpe_train_df,
    word_vocabulary,
)


def ref_bpe(words: list[str], n: int):
    """Reference implementation of classic word-type-weighted BPE with the
    engine's deterministic argmax (count DESC, lhs ASC, rhs ASC)."""
    vocab = collections.Counter(
        tuple(w) + ("</w>",) for w in words)
    merges = []
    for step in range(1, n + 1):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        bc = max(pairs.values())
        lhs, rhs = sorted(p for p, c in pairs.items() if c == bc)[0]
        merges.append((step, lhs, rhs, pairs[(lhs, rhs)]))
        new = collections.Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += c
        vocab = new
    return merges


CORPUS = [
    (0, "low low low lower lower newest newest newest newest widest"),
    (1, "widest widest newest newest"),
]


def _df(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBpeTrain:
    def test_matches_classic_algorithm(self, spark):
        words = " ".join(t for _, t in CORPUS).split()
        assert bpe_train(_df(spark), 6) == ref_bpe(words, 6)

    def test_partitioning_invariant(self, spark):
        df = _df(spark)
        assert bpe_train(df.repartition(7), 4) == bpe_train(df.coalesce(1), 4)

    def test_deterministic_tie_break(self, spark):
        # "ab" and "cd" both appear twice: pairs (a,b,2) (b,</w>,2)
        # (c,d,2) (d,</w>,2) all tie — (a,b) wins lexicographically
        df = _df(spark, [(0, "ab ab cd cd")])
        m = bpe_train(df, 1)
        assert m[0][1:3] == ("a", "b")

    def test_case_folding_and_exhaustion(self, spark):
        # single repeated word: merges exhaust once the word is one symbol.
        # (h,a) and (a,</w>) tie at 3 — lhs ASC picks (a,</w>) first.
        df = _df(spark, [(0, "Ha ha HA")])
        m = bpe_train(df, 10)
        assert [(l, r) for _, l, r, _ in m] == [("a", "</w>"), ("h", "a</w>")]
        words = ["ha", "ha", "ha"]
        assert m == ref_bpe(words, 10)

    def test_invalid_n_merges_raises(self, spark):
        with pytest.raises(ValueError):
            bpe_train(_df(spark), 0)

    def test_train_df_schema(self, spark):
        out = bpe_train_df(_df(spark), 3)
        assert out.columns == ["merge_id", "lhs", "rhs", "pair_count"]
        assert out.count() == 3


class TestBpeEncode:
    def test_subword_counts(self, spark):
        df = _df(spark)
        m = bpe_train(df, 6)
        out = {r["id"]: r for r in bpe_encode(df, m).collect()}
        # after 6 merges: newest -> [newest</w>] (1), widest -> w,i,d,est</w>
        # (4), low -> l,o,w,</w> (4), lower -> l,o,w,e,r,</w> (6)
        assert out[0]["n_tokens"] == 10
        assert out[0]["n_subwords"] == 3 * 4 + 2 * 6 + 4 * 1 + 1 * 4
        assert out[1]["n_tokens"] == 4
        assert out[1]["n_subwords"] == 2 * 4 + 2 * 1

    def test_no_merges_counts_chars_plus_eow(self, spark):
        df = _df(spark, [(0, "ab c")])
        out = bpe_encode(df, []).collect()[0]
        assert out["n_tokens"] == 2 and out["n_subwords"] == 3 + 2

    def test_null_text_doc_absent(self, spark):
        df = spark.createDataFrame([(0, "x"), (1, None)],
                                   "doc_id long, text string")
        assert {r["id"] for r in bpe_encode(df, []).collect()} == {0}


class TestReduplicationMerges:
    """The single-separator replace layout under-merged consecutive pair
    occurrences (a match consumed the boundary separator of the next one):
    'abab' became [ab, a, b] instead of [ab, ab].  The double-separator
    layout fixes it; these tests pin classic behavior on exactly those
    corpora."""

    def test_abab_and_runs_match_classic(self, spark):
        rows = [(0, "abab abab bobo bobo aaaa aaaa aaaaa murmur")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        words = rows[0][1].split()
        for n in (1, 2, 4, 6):
            assert bpe_train(df, n) == ref_bpe(words, n), n

    def test_single_pass_merge_property(self):
        """Separator-string replace == the classic leftmost-disjoint
        one-pass merge, over randomized symbol runs (pure Python — the
        same str.replace semantics the JVM and SQL engines share)."""
        import random
        SEP = "\x1f"

        def classic(syms, l, r):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        rng = random.Random(7)
        for _ in range(5000):
            n = rng.randint(1, 8)
            syms = [rng.choice("ab") * rng.randint(1, 2) for _ in range(n)]
            l, r = rng.choice("ab"), rng.choice(["a", "b", "aa", "ab"])
            s = SEP + (SEP + SEP).join(syms) + SEP
            got = s.replace(SEP + l + SEP + SEP + r + SEP,
                            SEP + l + r + SEP)
            import re as _re
            parts = _re.split("\x1f+", got)[1:-1]
            assert parts == classic(syms, l, r), (syms, l, r)


class TestBatchedEncoderParity:
    def test_bit_identical_to_expression_encoder(self, spark):
        from ocr_system_spark.operators.bpe import bpe_encode_batched
        rows = [
            (0, "low lower newest widest the quick brown fox"),
            (1, "é中 ünïcôdé mixed ASCII and Ünï"),
            (2, "aaa aa a aaaa"),
            (3, None),
            (4, "repeated repeated repeated word word"),
            (5, "x"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        m = bpe_train(df, 8)
        a = sorted(bpe_encode(df, m).collect())
        b = sorted(bpe_encode_batched(df, m).collect())
        assert a == b

    def test_empty_merge_table(self, spark):
        from ocr_system_spark.operators.bpe import bpe_encode_batched
        df = spark.createDataFrame([(0, "ab c")], "doc_id long, text string")
        a = sorted(bpe_encode(df, []).collect())
        b = sorted(bpe_encode_batched(df, []).collect())
        assert a == b


class TestWordVocabulary:
    def test_lowercased_counts(self, spark):
        df = _df(spark, [(0, "The the THE cat")])
        got = {r["term"]: r["cnt"] for r in word_vocabulary(df).collect()}
        assert got == {"the": 3, "cat": 1}
