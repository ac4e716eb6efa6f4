"""HTML main-content extraction over flat node arrays (north-star kernel).

Replaces the reference's rasterize+OCR stage (poppler+tesseract subprocesses,
/root/reference/ocr/pdf.py:10-17 + /root/reference/ocr/ocr_engine.py:10-27)
with a deterministic Readability/Boilerpipe-class algorithm designed for
Arrow-batched execution:

1. a regex/state-machine tokenizer (lxml-free) parses each page into FLAT
   node arrays — tag id, parent pointer, depth, per-element own text/link
   lengths — appended across the whole batch;
2. scoring is pure numpy over the concatenated batch arrays: subtree
   text/link totals via per-depth-level ``np.add.at`` rollup (children add
   into parents, deepest level first — no per-node Python), then
   text-density × (1 − link-density)² content scores (Boilerpipe-style
   shallow features: character mass, anchor mass, tag depth);
3. the best-scoring content subtree per document is selected (ties break to
   the deeper, i.e. more specific, node) and membership is propagated
   top-down per depth level, again vectorized;
4. text assembly groups the subtree's text nodes by nearest block-level
   ancestor → one line per block, whitespace-normalized, newline-joined —
   plus character-span offsets of every contributing text node in the RAW
   html source.

Per-document tokenization is a Python loop inside the batch (SURVEY §7.3.2's
sanctioned fallback); everything after tokenization is numpy over batch-wide
arrays.
"""

from __future__ import annotations

import html as _htmllib
import re
from itertools import groupby
from typing import List, Optional, Tuple

import numpy as np

# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

_MARKUP_RE = re.compile(
    r"<!--.*?(?:-->|$)"                       # comments (tolerate unclosed)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<![^>]*>"                              # doctype & other declarations
    r"|<\?[^>]*>"                             # processing instructions
    # NOTE the lazy attr group + anchored slash: a greedy attr group would
    # consume the trailing '/' itself (since '/' matches [^>"']), so the
    # self-closing capture would never fire and <a/> would leak link_depth.
    r"|<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)\s*(/?)>",
    re.DOTALL,
)

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_RAWTEXT_TAGS = frozenset("script style noscript template textarea".split())
_SKIP_SUBTREES = frozenset("script style noscript template svg head".split())
_BLOCK_TAGS = frozenset(
    "address article aside blockquote body dd div dl dt fieldset figcaption "
    "figure footer form h1 h2 h3 h4 h5 h6 header hr li main nav ol p pre "
    "section table tbody td tfoot th thead tr ul".split()
)
# candidate containers for the main-content subtree
_CANDIDATE_TAGS = frozenset("article body div main section td table".split())

_WS_RE = re.compile(r"\s+")


class _DocNodes:
    """Flat per-document parse product (element arrays + text-node lists)."""

    __slots__ = ("tags", "parent", "depth", "own_text", "own_link",
                 "is_cand", "is_block",
                 "txt_owner", "txt_raw", "txt_start", "txt_end")

    def __init__(self) -> None:
        # element 0 is a virtual root
        self.tags: List[str] = ["#root"]
        self.parent: List[int] = [0]
        self.depth: List[int] = [0]
        self.own_text: List[int] = [0]
        self.own_link: List[int] = [0]
        # candidate/block flags recorded AT PARSE TIME (two frozenset
        # lookups per opening tag) instead of re-walking every tag list
        # in Python during batch concatenation — that re-walk measured a
        # visible slice of the scoring pass. "#root" counts as block.
        self.is_cand: List[bool] = [False]
        self.is_block: List[bool] = [True]
        self.txt_owner: List[int] = []   # owning element index
        self.txt_raw: List[str] = []     # raw (unescaped) text content
        self.txt_start: List[int] = []   # char offset in source
        self.txt_end: List[int] = []


def _parse_one(src: str) -> _DocNodes:
    d = _DocNodes()
    stack: List[int] = [0]          # element-index stack
    tag_stack: List[str] = ["#root"]
    link_depth = 0                  # <a> nesting count
    skip_until: Optional[str] = None  # inside script/style/etc.
    pos = 0
    n = len(src)
    # bound methods hoisted out of the tag loop (pure CPython overhead —
    # attribute lookups measured a visible slice of this hot kernel)
    _tags_app = d.tags.append
    _parent_app = d.parent.append
    _depth_app = d.depth.append
    _otext_app = d.own_text.append
    _olink_app = d.own_link.append
    _cand_app = d.is_cand.append
    _block_app = d.is_block.append

    def add_text(start: int, end: int) -> None:
        if start >= end:
            return
        raw = src[start:end]
        if not raw.strip():
            return
        owner = stack[-1]
        txt = _htmllib.unescape(raw)
        d.txt_owner.append(owner)
        d.txt_raw.append(txt)
        d.txt_start.append(start)
        d.txt_end.append(end)
        # collapsed-whitespace length WITHOUT building the normalized string
        # (str.split's whitespace set == re \s in unicode mode, and this is
        # the hottest line of the tokenizer — a regex sub per text node
        # measured ~40% of _parse_one)
        words = txt.split()
        tlen = sum(map(len, words)) + len(words) - 1 if words else 0
        d.own_text[owner] += tlen
        if link_depth > 0:
            d.own_link[owner] += tlen

    for m in _MARKUP_RE.finditer(src):
        m_start, m_end = m.span()
        if skip_until is None and m_start > pos:
            add_text(pos, m_start)
        pos = m_end
        # one C-level call for all four groups (three .group() calls and a
        # .lower() allocation per tag measured ~15% of this kernel's time;
        # tag names are already lowercase in almost all real HTML)
        close_g, name, _attrs, self_g = m.group(1, 2, 3, 4)
        if name is None:            # comment/doctype/PI
            continue
        if not name.islower():
            name = name.lower()
        closing = close_g == "/"
        self_closing = self_g == "/"
        if skip_until is not None:
            if closing and name == skip_until:
                skip_until = None
                # pop the skipped element
                if len(stack) > 1 and tag_stack[-1] in _SKIP_SUBTREES | _RAWTEXT_TAGS:
                    stack.pop(); tag_stack.pop()
            continue
        if closing:
            if name == "a" and link_depth > 0:
                link_depth -= 1
            if name in tag_stack:
                # lenient pop up to the matching open tag
                while len(stack) > 1:
                    t = tag_stack.pop()
                    stack.pop()
                    if t == name:
                        break
            continue
        # opening tag
        if name in _VOID_TAGS:
            continue
        parent = stack[-1]
        idx = len(d.tags)
        _tags_app(name)
        _parent_app(parent)
        _depth_app(len(stack))       # root depth 0
        _otext_app(0)
        _olink_app(0)
        _cand_app(name in _CANDIDATE_TAGS)
        _block_app(name in _BLOCK_TAGS)
        if name == "a":
            link_depth += 1
        if self_closing:
            if name == "a" and link_depth > 0:
                link_depth -= 1
            continue
        stack.append(idx)
        tag_stack.append(name)
        if name in _SKIP_SUBTREES or name in _RAWTEXT_TAGS:
            skip_until = name
    if skip_until is None and pos < n:
        add_text(pos, n)
    return d


# --------------------------------------------------------------------------
# batch scoring + assembly
# --------------------------------------------------------------------------

def extract_main_batch(html_texts: List[Optional[str]]):
    """Batch kernel: list of decoded html strings → list of
    (extracted_text | None, spans list[(start,end)]).

    Tokenizes per document, then scores ALL documents' nodes in one set of
    numpy arrays (SURVEY §7.1 M3).
    """
    docs = [_parse_one(s) if s else None for s in html_texts]

    # ---- concatenate element arrays across the batch
    sizes = [len(d.tags) if d else 0 for d in docs]
    total = int(np.sum(sizes))
    if total == 0:
        return [(None, []) for _ in html_texts]
    offs = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])

    # Flat Python lists via C-level extend, one bulk conversion each, and
    # a single vectorized add to globalize the doc-local parent pointers —
    # six small numpy slice-assignments PER DOCUMENT (120k tiny ops per
    # 20k-page batch, each dominated by numpy call overhead) measured a
    # visible slice of this kernel.
    parent_l: List[int] = []
    depth_l: List[int] = []
    own_text_l: List[int] = []
    own_link_l: List[int] = []
    is_cand_l: List[bool] = []
    is_block_l: List[bool] = []
    for d in docs:
        if d is None:
            continue
        parent_l.extend(d.parent)
        depth_l.extend(d.depth)
        own_text_l.extend(d.own_text)
        own_link_l.extend(d.own_link)
        is_cand_l.extend(d.is_cand)
        is_block_l.extend(d.is_block)
    doc_ids = np.repeat(np.arange(len(docs), dtype=np.int64),
                        np.asarray(sizes, dtype=np.int64))
    parent = np.asarray(parent_l, dtype=np.int64) + offs[doc_ids]
    depth = np.asarray(depth_l, dtype=np.int32)
    own_text = np.asarray(own_text_l, dtype=np.int64)
    own_link = np.asarray(own_link_l, dtype=np.int64)
    is_cand = np.asarray(is_cand_l, dtype=bool)
    is_block = np.asarray(is_block_l, dtype=bool)

    # ---- subtree rollup: deepest level first, children add into parents
    sub_text = own_text.astype(np.float64)
    sub_link = own_link.astype(np.float64)
    max_depth = int(depth.max()) if total else 0
    by_level = [np.nonzero(depth == lvl)[0] for lvl in range(max_depth + 1)]
    for lvl in range(max_depth, 0, -1):
        idx = by_level[lvl]
        if idx.size:
            np.add.at(sub_text, parent[idx], sub_text[idx])
            np.add.at(sub_link, parent[idx], sub_link[idx])

    # ---- block-level text attribution: text owned by inline elements rolls
    # up to the nearest block ancestor (computed below, but attribution only
    # needs one np.add.at once nearest_block is known) — so compute
    # nearest_block first, top-down per level
    nearest_block = np.arange(total, dtype=np.int64)
    for lvl in range(1, max_depth + 1):
        idx = by_level[lvl]
        if idx.size:
            nb = np.where(is_block[idx], idx, nearest_block[parent[idx]])
            nearest_block[idx] = nb

    blk_text = np.zeros(total, dtype=np.float64)
    blk_link = np.zeros(total, dtype=np.float64)
    np.add.at(blk_text, nearest_block, own_text.astype(np.float64))
    np.add.at(blk_link, nearest_block, own_link.astype(np.float64))

    # ---- Readability-style voting: every text-bearing block casts a vote,
    # damped by its own link density, for its parent (full) and grandparent
    # (half). Containers of real prose accumulate votes; nav/footer/sidebar
    # blocks vote ~0 because their text is mostly anchor text.
    blk_ld = np.where(blk_text > 0, blk_link / np.maximum(blk_text, 1.0), 0.0)
    vote = np.where(
        (blk_text > 0) & is_block,
        (1.0 + np.minimum(blk_text / 100.0, 3.0)) * (1.0 - blk_ld), 0.0,
    )
    votes = np.zeros(total, dtype=np.float64)
    voters = np.nonzero(vote > 0)[0]
    np.add.at(votes, parent[voters], vote[voters])
    np.add.at(votes, parent[parent[voters]], vote[voters] * 0.5)

    # ---- final candidate score: votes × (1 − subtree link density)
    with np.errstate(divide="ignore", invalid="ignore"):
        link_density = np.where(sub_text > 0, sub_link / np.maximum(sub_text, 1), 0.0)
    score = np.where(is_cand & (votes > 0), votes * (1.0 - link_density), -1.0)
    # fallback for pathological docs where no candidate got votes (e.g. text
    # straight under <html>): raw character mass damped by link density
    mass = np.where(is_cand, sub_text * (1.0 - link_density) ** 2, -1.0)

    # ---- per-doc argmax with deeper-node tie-break
    chosen = np.full(len(docs), -1, dtype=np.int64)
    # lexicographic key: (score, depth) — stable argmax per doc slice
    for i, d in enumerate(docs):
        if d is None or sizes[i] == 0:
            continue
        sl = slice(offs[i], offs[i + 1])
        s = score[sl]
        if s.size == 0:
            continue
        if s.max() <= 0:
            s = mass[sl]          # vote-less fallback: raw damped mass
            if s.max() < 0:
                continue
        best = s.max()
        cand = np.nonzero(s >= best)[0]
        # deeper wins; then first in document order
        dep = depth[sl][cand]
        chosen[i] = offs[i] + cand[np.argmax(dep)]

    # ---- subtree membership, top-down per level (vectorized per level)
    in_sub = np.zeros(total, dtype=bool)
    ok = chosen[chosen >= 0]
    in_sub[ok] = True
    for lvl in range(1, max_depth + 1):
        idx = by_level[lvl]
        if idx.size:
            in_sub[idx] |= in_sub[parent[idx]]

    # ---- assembly per document
    out: List[Tuple[Optional[str], List[Tuple[int, int]]]] = []
    for i, d in enumerate(docs):
        if d is None:
            out.append((None, []))
            continue
        if chosen[i] < 0:
            out.append(("", []))
            continue
        o = offs[i]
        owners = np.asarray(d.txt_owner, dtype=np.int64) + o
        keep = in_sub[owners]
        if not keep.any():
            out.append(("", []))
            continue
        kept_idx = np.nonzero(keep)[0]
        blocks = nearest_block[owners[kept_idx]]
        lines: List[str] = []
        spans: List[Tuple[int, int]] = []
        for _, grp in groupby(zip(blocks.tolist(), kept_idx.tolist()), key=lambda t: t[0]):
            idxs = [j for _, j in grp]
            line = _WS_RE.sub(" ", " ".join(d.txt_raw[j] for j in idxs)).strip()
            if line:
                lines.append(line)
                spans.extend((d.txt_start[j], d.txt_end[j]) for j in idxs)
        out.append(("\n".join(lines), spans))
    return out


# --------------------------------------------------------------------------
# metadata kernel (title / heading count)
# --------------------------------------------------------------------------

# Regex-as-spec (the functions/fields.py contract): these patterns ARE the
# documented semantics, chosen from the RE2-safe subset so an independent
# SQL engine replays them verbatim (non-greedy first <title>, tag-shaped
# <h1 occurrences, ASCII-whitespace collapse — the pinned [\t\n\f\r ]
# class shared with functions/tokens.py).
_TITLE_RE = re.compile(r"(?is)<title[^>]*>(.*?)</title>")
_H1_RE = re.compile(r"(?i)<h1[\t\n\f\r >]")
_ASCII_WS_RE = re.compile(r"[\t\n\f\r ]+")


def extract_title_batch(
    html_texts: List[Optional[str]],
) -> List[Tuple[str, int]]:
    """Batch metadata kernel: decoded html strings → (title, h1_count)
    per document — the trafilatura-class metadata pass that rides along
    with main-content extraction (page title for provenance/display,
    heading count as a structure feature for quality models).

    title = first ``<title …>…</title>`` payload, ASCII-whitespace
    collapsed and stripped; missing/None html → ``""`` (the F9
    empty-not-None convention).  h1_count = number of ``<h1`` tag opens.
    Pure per-string regex — no node arrays needed; stays a cheap
    sidecar to :func:`extract_main_batch`."""
    out: List[Tuple[str, int]] = []
    for src in html_texts:
        if not src:
            out.append(("", 0))
            continue
        m = _TITLE_RE.search(src)
        title = _ASCII_WS_RE.sub(" ", m.group(1)).strip() if m else ""
        out.append((title, len(_H1_RE.findall(src))))
    return out
