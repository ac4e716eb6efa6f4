"""Behavioral pattern constants of the extraction tier.

These regex strings and separators ARE the observable semantics of the
reference extractor — they define WHAT is computed, so they must be
value-identical for the byte-identity guarantee (the engine around them is
new). Provenance:

* ``DEFAULT_PATTERNS`` — /root/reference/ocr/patterns.py:6-21 (field → ordered
  regex priority list, first match wins; note the intentionally greedy
  catch-all third alternatives).
* ``LICENSE_TYPE_A`` / ``LICENSE_TYPE_B`` — /root/reference/ocr/dynamic.py:120-124
  (typed license forms; all TYPE_A results win over any TYPE_B).
* ``PAGE_BREAK`` — /root/reference/ocr/pipeline.py:40 — the page-join
  separator. It is load-bearing: license extraction is restricted to the
  first page by splitting on it (/root/reference/ocr/dynamic.py:182-184).
"""

from __future__ import annotations

from typing import Dict, List

# The exact page separator used when per-page texts are concatenated into one
# document text. Downstream first-page-only logic splits on the bare token.
PAGE_BREAK: str = "\n\n--- PAGE BREAK ---\n\n"
PAGE_BREAK_TOKEN: str = "--- PAGE BREAK ---"

# Field → ordered regex list. First match wins; a pattern with a capture
# group yields group(1), otherwise group(0). Compiled IGNORECASE.
DEFAULT_PATTERNS: Dict[str, List[str]] = {
    "license_id": [
        r"\bLIC[-_\s]?\d{3,}\b",
        r"\bLicense\s*ID[:#-]*\s*([A-Z0-9]{6,20})\b",
        r"\b[A-Z0-9]{6,20}\b",
    ],
    "date": [
        r"\b\d{2}[\/-]\d{2}[\/-]\d{4}\b",
        r"\b\d{4}[\/-]\d{2}[\/-]\d{2}\b",
    ],
    "reference_id": [
        r"\bREF[-_\s]*([A-Z0-9]{4,10})\b",
        r"\b(?:Reference|Ref)[\s:#-]*([A-Z0-9-]{4,10})\b",
        r"\b[A-Z0-9]{4,10}\b",
    ],
}

# Typed license-number forms, matched over normalized text (see
# fields.normalize_license_text). TYPE_A examples: "No. 123 (R05)",
# "ABC 4567 (R/2)". TYPE_B example: "45/678 R9".
LICENSE_TYPE_A: str = (
    r"\b(?:[A-Z]{1,5}|No)\.?\s*\d{1,10}\s*"
    r"\(\s*[Rr][ \t/_\\\-:;]*[A-Za-z0-9₀-₉;:/\-]{1,8}\s*\)"
)
LICENSE_TYPE_B: str = r"\b\d{1,6}/\d{1,6}\s*R\d+\b"

# Address extraction: the verbose marker-to-marker pattern
# (/root/reference/ocr/extract.py:56-70). Captures the span between a
# tower-phrase + " at " and the first stop keyword (or end of string).
ADDRESS_PATTERN: str = r"""
    (?:Telecommunication|Transmission)[\w\s,()/-]*?
    \s+at\s+
    (.*?)
    (?=
        \s+of\s+Dialog|
        \s*situated|
        \s*within|
        \s*under|
        $
    )
"""

# Month-name → month-number map used by date-range normalization
# (/root/reference/ocr/extract.py:132-135). Values are NOT zero-padded:
# "10th May 2025" normalizes to "10.5.2025".
MONTH_MAP: Dict[str, int] = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}

MONTH_NAMES_ALTERNATION: str = (
    r"Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec|"
    r"January|February|March|April|May|June|July|August|September|October|November|December"
)
