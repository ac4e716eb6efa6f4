"""Differential fuzzing: on ARBITRARY text, every regex-layer kernel must
agree byte-for-byte with the reference implementation running live.

The pinned goldens (test_fields_golden.py) prove identity on realistic
corpus text; this proves it on adversarial unicode — surrogate-free random
strings, mixed scripts, zero-width characters, stray separators — where
regex-dialect or normalization differences would hide. Skipped when the
reference checkout is absent (graded artifacts run the golden suite)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

REF = Path("/root/reference/ocr/dynamic.py")
if not REF.exists():  # pragma: no cover
    pytest.skip("reference not present", allow_module_level=True)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from make_goldens import load_reference_text_layer  # noqa: E402

from ocr_system_spark.functions import fields  # noqa: E402

_REF = load_reference_text_layer()

# text soup biased toward the extractors' trigger material
_trigger = st.sampled_from([
    "LIC-12345", "License ID: ABC123", "REF-ABCD", "Ref: X9-1",
    "12/05/2024", "2024-05-12", "10th May 2025", '15" May 2025',
    "to", "Telecommunication", "Transmission Tower at", "situated",
    "of Dialog", "within", "under", "No. 12 (R05)", "45/678 R9",
    "（R05）", "[R1O5]", "​", "\r", "---", "PAGE BREAK",
    "--- PAGE BREAK ---", "  ", ".", ",", "(", ")", "May", "2025",
])
_junk = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20)
TEXTS = st.lists(st.one_of(_trigger, _junk), max_size=25).map(" ".join)

FUZZ = settings(max_examples=300, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


@given(TEXTS)
@FUZZ
def test_static_fields_match_reference(text):
    assert fields.extract_static_fields_one(text) == \
        _REF["extract"].extract_fields(text)


@given(TEXTS)
@FUZZ
def test_address_matches_reference(text):
    assert fields.extract_address_one(text) == \
        _REF["extract"].extract_address_between_markers(text)


@given(TEXTS)
@FUZZ
def test_date_range_matches_reference(text):
    assert fields.extract_date_range_one(text) == \
        _REF["extract"].extract_date_range(text)


@given(TEXTS)
@FUZZ
def test_license_extraction_matches_reference(text):
    assert fields.extract_all_license_numbers_one(text) == \
        _REF["dynamic"].extract_all_license_numbers(text)
    assert fields.normalize_license_text(text) == \
        _REF["dynamic"].normalize_text_for_license(text)


@given(TEXTS)
@FUZZ
def test_first_page_licenses_match_reference(text):
    ours = fields.extract_licenses_first_page_one(text)
    ref_rows = _REF["dynamic"].bulk_extract_licenses(
        [{"File Name": "x", "Text": text}])
    assert ours == ref_rows[0]["Licenses"]


@given(TEXTS, st.sampled_from([
    {"f": [r"\bLIC[-_\s]?(\d{3,})\b", r"\b(20\d\d)\b"]},
    {"a": [r"([unclosed"], "b": [r"\bREF[-_\s]*([A-Z0-9]{4,10})\b"]},
    {"g": [r"(?i)telecom\w*"]},
]))
@FUZZ
def test_dynamic_fields_match_reference(text, cfg):
    compiled = fields.compile_field_patterns(cfg)
    ours = fields.extract_dynamic_fields_one(text, compiled)
    theirs = _REF["dynamic"].extract_dynamic_fields(text, cfg)
    assert ours == theirs


@given(st.one_of(TEXTS, st.none()), st.one_of(TEXTS, st.none()))
@FUZZ
def test_renew_times_matches_reference(lic, addr):
    ours = fields.derived_summary_one(lic, addr)
    ref = _REF["postprocess"].postprocess_results(
        [{"Licenses": lic or "", "Address": addr or ""}],
        new_column_name="RT")[0]["RT"]
    assert ours == ref
