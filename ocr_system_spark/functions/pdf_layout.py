"""PDF layout pass: XY-cut column detection + baseline line clustering.

Replaces the reference's rasterize-then-OCR chain (pdf2image @300dpi →
cv2 preprocess → tesseract per page, /root/reference/ocr/pdf.py +
/root/reference/ocr/preprocess.py + /root/reference/ocr/ocr_engine.py) with a
deterministic layout algorithm over PDF *text objects* — the pdfminer-style
approach of SURVEY §7.1 M4. The reference's deskew stage picks a global
rotation via the median of Hough-line angles (ocr/preprocess.py:19-47); the
same median-statistic idea reappears here as baseline clustering by line
pitch.

Payload grammar (deliberately minimal — we control the generator in
sources/pages.py and are not writing a general PDF parser, SURVEY §7.3.4):

    %PDF-SYN1
    PAGE
    BT <x> <y> Td (<text, with \\ \\( \\) escapes>) Tj ET
    ...
    ENDPAGE

Algorithm per page:
  1. parse token boxes (x, y, text);
  2. XY-cut columns: sort token x-origins, split where the gap between
     consecutive distinct x values exceeds COLUMN_GAP;
  3. baseline clustering inside each column: group by y within
     LINE_TOLERANCE (descending y = top to bottom);
  4. reading order = columns left→right, lines top→bottom, tokens by x;
     tokens joined by spaces, lines by newlines.
Pages are joined with the exact PAGE_BREAK separator so first-page-only
downstream logic keeps working.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import numpy as np

from ocr_system_spark.functions.patterns import PAGE_BREAK

MAGIC = b"%PDF-SYN1"
COLUMN_GAP = 50.0
LINE_TOLERANCE = 3.0

_TOKEN_RE = re.compile(
    r"^BT\s+(-?[\d.]+)\s+(-?[\d.]+)\s+Td\s+\(((?:[^()\\]|\\.)*)\)\s+Tj\s+ET\s*$"
)
_UNESCAPE_RE = re.compile(r"\\([\\()])")


def is_pdf_payload(payload: bytes) -> bool:
    return payload.startswith(b"%PDF")


def _parse_pages(payload: bytes) -> List[List[Tuple[float, float, str]]]:
    """payload → per-page lists of (x, y, text) token boxes. Lenient: lines
    that do not parse are skipped (malformed payloads degrade, not raise)."""
    text = payload.decode("utf-8", errors="replace")
    pages: List[List[Tuple[float, float, str]]] = []
    cur: Optional[List[Tuple[float, float, str]]] = None
    for line in text.splitlines():
        line = line.strip()
        if line == "PAGE":
            cur = []
        elif line == "ENDPAGE":
            if cur is not None:
                pages.append(cur)
            cur = None
        elif cur is not None:
            m = _TOKEN_RE.match(line)
            if m:
                tok = _UNESCAPE_RE.sub(r"\1", m.group(3))
                cur.append((float(m.group(1)), float(m.group(2)), tok))
    if cur:  # tolerate missing trailing ENDPAGE
        pages.append(cur)
    return pages


def _layout_page(tokens: List[Tuple[float, float, str]]) -> str:
    if not tokens:
        return ""
    xs = np.array([t[0] for t in tokens])
    ys = np.array([t[1] for t in tokens])

    # --- XY-cut on the x projection: split at gaps > COLUMN_GAP
    ux = np.unique(xs)
    col_starts = [ux[0]]
    for a, b in zip(ux[:-1], ux[1:]):
        if b - a > COLUMN_GAP:
            col_starts.append(b)
    col_edges = np.array(col_starts + [np.inf])
    col_of = np.searchsorted(col_edges, xs, side="right") - 1

    out_lines: List[str] = []
    for c in range(len(col_starts)):
        in_col = np.nonzero(col_of == c)[0]
        if in_col.size == 0:
            continue
        # --- baseline clustering: sort by y descending, split at pitch gaps
        order = in_col[np.argsort(-ys[in_col], kind="stable")]
        cur_y = None
        cur_line: List[int] = []
        lines: List[List[int]] = []
        for i in order:
            if cur_y is None or abs(ys[i] - cur_y) <= LINE_TOLERANCE:
                cur_line.append(int(i))
                cur_y = ys[i] if cur_y is None else cur_y
            else:
                lines.append(cur_line)
                cur_line = [int(i)]
                cur_y = ys[i]
        if cur_line:
            lines.append(cur_line)
        for line in lines:
            line_sorted = sorted(line, key=lambda i: xs[i])
            out_lines.append(" ".join(tokens[i][2] for i in line_sorted))
    return "\n".join(out_lines)


def extract_pdf_text_one(payload: bytes) -> Tuple[Optional[str], List[Tuple[int, int]]]:
    """payload → (reading-order text, per-line (start,end) spans within the
    extracted text). Returns (None, []) when the magic header is absent."""
    if not payload.startswith(MAGIC):
        return None, []
    pages = _parse_pages(payload)
    page_texts = [_layout_page(p) for p in pages]
    text = PAGE_BREAK.join(page_texts)
    spans: List[Tuple[int, int]] = []
    pos = 0
    for pt in page_texts:
        for ln in pt.split("\n") if pt else []:
            start = text.index(ln, pos)
            spans.append((start, start + len(ln)))
            pos = start + len(ln)
        pos += len(PAGE_BREAK)
    return text, spans
