"""Driver-side pattern codegen (F7/F8/F8b): fixed expectations plus live
comparison against the reference implementation when it is available."""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from ocr_system_spark.functions import dynamic_patterns as dp

REF = Path("/root/reference/ocr/dynamic.py")


def test_smart_patterns_shapes():
    # date-shaped sample
    pats = dp.generate_smart_patterns("12/05/2024")
    assert pats[0] == re.escape("12/05/2024")
    assert r"\d{1,2}[/-]\d{1,2}[/-]\d{4}" in pats
    # uppercase-id-shaped
    pats = dp.generate_smart_patterns("ABC123")
    assert r"[A-Z]{2,}\d+" in pats
    # numeric
    pats = dp.generate_smart_patterns("4471")
    assert r"\d+" in pats
    # context anchoring: ≤3 words, each >2 chars
    pats = dp.generate_smart_patterns("X9", "the permit no is")
    anchored = [p for p in pats if p.startswith(r"\b")]
    assert anchored == [r"\bthe.*?X9", r"\bpermit.*?X9"][: len(anchored)] or anchored
    assert dp.generate_smart_patterns("") == []


def test_token_shape_classes():
    assert dp.infer_token_shape("AB12") == r"[A-Za-z0-9/()\-\s]{4,10}"
    assert dp.infer_token_shape("1234") == r"[0-9/()\-\s]{4,10}"
    assert dp.infer_token_shape("abcd") == r"[A-Za-z/()\-\s]{4,10}"
    assert dp.infer_token_shape("  ") == r"\S{2,20}"


def test_window_patterns_dedup_and_gap():
    pats = dp.generate_window_patterns("AB12", ["License", "no", "License"], ["valid"])
    gap = r"(?:\W+\w+){0,3}"
    assert pats[0] == rf"\bLicense\b{gap}\W+([A-Za-z0-9/()\-\s]{{4,10}})"
    # 'no' dropped (len ≤ 1? no — len 2 > 1 keeps it)... 'no' has len 2 → kept
    assert any("valid" in p for p in pats)
    assert len(pats) == len(set(pats))


@pytest.mark.skipif(not REF.exists(), reason="reference not present")
def test_codegen_matches_reference_live():
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from make_goldens import load_reference_text_layer

    ref = load_reference_text_layer()["dynamic"]
    samples = [
        ("12/05/2024", None), ("ABC123", "the permit number is"),
        ("4471", "ref no"), ("X9", None), ("", "ctx"),
        ("LIC-99", "license id follows here now ok"),
    ]
    for sample, ctx in samples:
        assert dp.generate_smart_patterns(sample, ctx) == \
            ref.generate_smart_patterns(sample, ctx), (sample, ctx)
        assert dp.infer_token_shape(sample) == ref.infer_token_shape(sample)
    assert dp.generate_window_patterns("AB12", ["License", "x"], ["valid", "to"]) == \
        ref.generate_window_patterns("AB12", ["License", "x"], ["valid", "to"])
