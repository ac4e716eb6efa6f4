"""Adversarial-HTML robustness for the tokenizer/extractor: arbitrary byte
soup must never raise, invariants must hold, and pathological inputs
(unterminated quotes/comments, deep nesting, huge attribute blobs) must
complete in time linear-ish in the input — a 10^12-page crawl contains
every malformed page imaginable."""

from __future__ import annotations

import time

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    HAVE_HYP = True
except Exception:                       # pragma: no cover
    HAVE_HYP = False

from ocr_system_spark.functions.html_extract import _parse_one, extract_main_batch

pytestmark = pytest.mark.skipif(not HAVE_HYP, reason="hypothesis missing")

# token soup biased toward markup metacharacters so the tokenizer's state
# machine actually gets exercised (pure-random text rarely forms tags)
_TOKENS = (list("<>/=\"' abcdiv!-?&;\n\tp")
           + ["<a", "</", "-->", "<!--", "<div", "<a/>", "</div>", "&amp;",
              "<script>", "</script>", "<![CDATA[", "]]>", "<p class=", "é中"])
MARKUPISH = st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=120).map("".join)

FUZZ = settings(max_examples=300, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


@FUZZ
@given(MARKUPISH)
def test_parse_never_raises_and_invariants_hold(src):
    d = _parse_one(src)
    n = len(d.tags)
    assert len(d.parent) == len(d.depth) == len(d.own_text) == len(d.own_link) == n
    for i in range(n):
        assert 0 <= d.parent[i] < n
        assert d.own_link[i] <= d.own_text[i]          # link text ⊆ text
        assert d.own_text[i] >= 0
    # every recorded text span points into the source
    for s, e in zip(d.txt_start, d.txt_end):
        assert 0 <= s < e <= len(src)


@FUZZ
@given(MARKUPISH)
def test_extract_batch_never_raises(src):
    [(text, spans)] = extract_main_batch([src])
    if text:
        assert isinstance(text, str)
    for s, e in spans:
        assert 0 <= s < e <= len(src)


def test_pathological_inputs_complete_fast():
    """Unterminated constructs must not trigger super-linear regex
    backtracking: time a family of adversarial ~1MB pages."""
    mb = 1_000_000
    cases = {
        "unterminated_quote": '<div class="' + "a" * mb,
        "unterminated_comment": "<!--" + "x" * mb,
        "angle_storm": "<" * mb,
        "deep_nesting": "<div>" * 20000 + "core text" + "</div>" * 20000,
        "attr_soup": ('<a href="x" ' * 3 + '>t</a> word ') * 20000,
        "quote_flip_flop": ("<p a='\"' b=\"'\">w</p> " * 25000),
    }
    for name, src in cases.items():
        t0 = time.perf_counter()
        extract_main_batch([src])
        dt = time.perf_counter() - t0
        # generous bound: a backtracking blowup is minutes-to-forever, and
        # the co-tenanted box can stretch honest runs several-fold
        assert dt < 30.0, (name, dt)
