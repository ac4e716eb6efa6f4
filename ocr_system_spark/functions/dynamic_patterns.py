"""Driver-side dynamic pattern codegen (reference F7/F8/F8b).

Reproduces the sample-driven pattern generation of
/root/reference/ocr/dynamic.py:7-51 (smart patterns), 71-100 (window
patterns) and 103-117 (token shape inference). These run ONCE on the driver
to build a field→patterns config which is then broadcast into the batch
extraction kernel — they never touch per-row data on executors.
"""

from __future__ import annotations

import re
from typing import List, Optional


def generate_smart_patterns(sample_text: str, context_text: Optional[str] = None) -> List[str]:
    """Escaped literal + shape-class generalizations + up-to-3
    context-anchored patterns, first-occurrence-deduped."""
    if not sample_text:
        return []
    pats: List[str] = [re.escape(sample_text)]
    try:
        if re.match(r"\d{1,2}[/-]\d{1,2}[/-]\d{4}", sample_text):
            pats += [
                r"\d{1,2}[/-]\d{1,2}[/-]\d{4}",
                r"\d{4}[/-]\d{1,2}[/-]\d{1,2}",
                r"\d{1,2}\s+\d{1,2}\s+\d{4}",
            ]
        elif re.match(r"[A-Z]{2,}\d+", sample_text):
            pats += [r"[A-Z]{2,}\d+", r"[A-Z]{2,}[-_\s]?\d+", r"[A-Z]*\d+"]
        elif re.match(r"\d+", sample_text):
            pats += [r"\d+", r"[A-Z]*\d+", r"\d+[A-Z]*"]
    except re.error:
        pass
    if context_text:
        for word in context_text.split()[:3]:
            if len(word) > 2:
                pats.append(rf"\b{re.escape(word)}.*?{re.escape(sample_text)}")
    seen: set = set()
    out: List[str] = []
    for p in pats:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def infer_token_shape(sample_text: str) -> str:
    """Char-class + length-range regex inferred from a sample value."""
    s = sample_text.strip()
    if not s:
        return r"\S{2,20}"
    has_alpha = any(c.isalpha() for c in s)
    has_digit = any(c.isdigit() for c in s)
    min_len = max(2, min(4, len(s)))
    max_len = min(40, max(len(s) + 6, 8))
    if has_alpha and has_digit:
        cls = r"[A-Za-z0-9/()\-\s]"
    elif has_digit:
        cls = r"[0-9/()\-\s]"
    else:
        cls = r"[A-Za-z/()\-\s]"
    return rf"{cls}{{{min_len},{max_len}}}"


def generate_window_patterns(
    sample_text: str,
    before_words: List[str],
    after_words: List[str],
    max_words_window: int = 3,
    shape_regex: Optional[str] = None,
) -> List[str]:
    """Anchor the sample's shape regex to nearby context words with a bounded
    word gap, producing capture-group patterns for the dynamic extractor."""
    if not sample_text:
        return []
    shape = shape_regex if shape_regex is not None else infer_token_shape(sample_text)
    bw = [re.escape(w) for w in before_words if len(w) > 1][:max_words_window]
    aw = [re.escape(w) for w in after_words if len(w) > 1][:max_words_window]
    gap = rf"(?:\W+\w+){{0,{max_words_window}}}"
    pats: List[str] = []
    for w in bw:
        pats.append(rf"\b{w}\b{gap}\W+({shape})")
    for w in aw:
        pats.append(rf"({shape})\W+{gap}\b{w}\b")
    seen: set = set()
    out: List[str] = []
    for p in pats:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out
