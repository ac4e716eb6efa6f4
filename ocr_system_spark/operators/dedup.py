"""Deduplication operator family for training-data pipelines.

Five dedup strategies, all expressed Spark-first:

* exact           — content-hash groupBy (one shuffle on the hash)
* n-gram Jaccard  — exact sparse similarity join: shingle-explode →
                    self-join on (shingle, blocking key) → integer
                    intersection/union counts. Shingles travel as 64-bit
                    hashes (collisions ~n²/2^64 — exact w.h.p., and the
                    DuckDB string-set oracle confirms it at test scale)
* MinHash + LSH   — k JVM-side hash permutations over shingles → banded
                    signature buckets → candidate pairs → EXACT Jaccard
                    verification of candidates (so output matches the exact
                    all-pairs answer whenever LSH recall holds; bands/rows
                    are sized so the miss probability at the threshold is
                    ≪ 1e-9 for true near-dups)
* SimHash         — 64-bit sign-of-weighted-token-hash signature (Arrow
                    batch kernel), 4×16-bit band blocking, Hamming verify
* embedding cosine — see operators/similarity.py

Scale notes: every strategy is shuffle-bounded by its blocking key
(content hash, shingle, band hash, simhash band). At 10^12 docs the
shingle self-join must be salted on hot shingles; here hot-shingle groups
are capped via a group-size guard (``max_group``) — the standard frequent-
shingle drop used by web-dedup pipelines (very frequent shingles carry no
dedup signal and only create quadratic blowup).
"""

from __future__ import annotations

import random
import re
from functools import lru_cache
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 2^31-1 (Mersenne prime). Using a 31-bit hash universe keeps every
# a*h+b term below 2^62, so the JVM-side arithmetic can never overflow a
# long — required under Spark 4 ANSI mode (overflow is an error, not a wrap).
MERSENNE31 = (1 << 31) - 1


# ---------------------------------------------------------------------------
# shared: word shingles, JVM-side
# ---------------------------------------------------------------------------

def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                  out_col: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles per row, as an Arrow-batched kernel.

    A pure-JVM formulation exists (`transform(sequence(...), i ->
    array_join(slice(words, i+1, n)))`) but Spark evaluates higher-order
    lambdas per element INTERPRETED — measured ~12s for 10k mid-size docs
    vs ~1s for this batch kernel. Order of first occurrence is preserved
    (dict semantics), matching array_distinct."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def shingle_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.tolist():
            words = (t or "").split()
            if len(words) < n:
                out.append([])
                continue
            seen = dict.fromkeys(
                " ".join(words[i:i + n]) for i in range(len(words) - n + 1)
            )
            out.append(list(seen))
        return pd.Series(out, index=texts.index, dtype=object)

    return df.withColumn(out_col, shingle_udf(F.col(text_col)))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, key_col: str, text_col: str = "text") -> DataFrame:
    """Group identical content: (text_hash, n_copies, keep_id=min key)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(key_col).alias("keep_id"),
        )
    )


def exact_dedup(df: DataFrame, key_col: str, text_col: str = "text") -> DataFrame:
    """Keep exactly one row (min key) per distinct content."""
    from pyspark.sql import Window as W
    w = W.partitionBy(F.md5(F.col(text_col))).orderBy(key_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    n: int = 3,
    block_col: Optional[str] = None,
    min_jaccard_pct: int = 50,
    max_group: int = 1000,
    salt_cap: int = 250,
) -> DataFrame:
    """All pairs with word-``n``-gram Jaccard ≥ min_jaccard_pct/100, via the
    exact sparse-join: explode shingles, self-join on shingle (+ optional
    blocking column), count common shingles, compare integer-only
    (100·inter ≥ pct·union — no floating point in the decision or output).

    ``max_group`` drops shingles shared by more than that many docs — they
    contribute no discriminative signal and are the quadratic-blowup hazard
    at scale. When the guard fires, the hot shingles are removed from the
    per-doc shingle SETS before anything is counted, so inter/uni/n_sh are
    all computed over the same (non-frequent) universe — the output stays
    exactly "Jaccard over non-frequent shingles", never a mixed count.

    ``salt_cap``: shingle groups that SURVIVE the guard but exceed this
    size (boilerplate just under ``max_group`` — common at crawl scale) go
    through the same triangle salting as the MinHash band join, so no
    single task ever holds ~max_group²/2 pairs; the pair set (and every
    inter/uni count) is unchanged.
    """
    # shingles travel as 64-bit hashes (with_hashed_shingles): the explode +
    # self-join below shuffles every shingle twice, so 8-byte longs instead
    # of strings cut the operator's dominant shuffle ~4×. Set-cardinality
    # decisions (inter/uni/n_sh) are unchanged w.h.p. (collisions ~n²/2^64).
    # cached: read by the frequency aggregate, the salted-group probe, and
    # the exploded join side — one fused-kernel run instead of three
    base = with_hashed_shingles(df, text_col, n).select(
        F.col(key_col).alias("id"),
        *([F.col(block_col).alias("blk")] if block_col else [F.lit(0).alias("blk")]),
        F.col("sh_hashes").alias("shingles"),
    ).cache()
    # frequent-shingle guard: the hot set is tiny by construction (shingles
    # in > max_group docs), so collect it per block and broadcast; subtract
    # from the arrays BEFORE sizing so n_sh matches the joined universe.
    freq = (base.select("blk", F.explode("shingles").alias("shingle"))
            .groupBy("blk", "shingle").agg(F.count(F.lit(1)).alias("g")))
    # Only the OVERSIZED-group tail of `freq` is ever consumed (the hot
    # drop set and the salting relation), and it is bounded by
    # total_shingles/min(salt_cap, max_group). Cache the tail so the
    # corpus-scale explode+groupBy behind it executes ONCE instead of
    # once per consumer (hot broadcast, salting emptiness probe, salted
    # join broadcast) — guide §2.4/§5; released by the reference-based
    # ContextCleaner like every other operator-scoped cache here.
    tail = freq.filter(
        F.col("g") > min(int(salt_cap), int(max_group))).cache()
    hot = (tail.filter(F.col("g") > max_group)
           .groupBy("blk").agg(F.collect_list("shingle").alias("hot")))
    sh = (
        base.join(F.broadcast(hot), "blk", "left")
        .withColumn(
            "shingles",
            F.when(F.col("hot").isNotNull(),
                   F.array_except("shingles", "hot")).otherwise(F.col("shingles")),
        )
        .select("id", "blk", F.size("shingles").alias("n_sh"),
                F.explode("shingles").alias("shingle"))
    )
    # shingle groups that survive the guard but exceed salt_cap are
    # triangle-salted (the cached tail is already aggregated — reuse it)
    big = (tail.filter((F.col("g") > salt_cap) & (F.col("g") <= max_group))
           .select("blk", "shingle", F.col("g").alias("gsz")))
    matched = _salted_self_join(sh, ["blk", "shingle"], salt_cap,
                                payload_cols=("n_sh",), big=big)
    pairs = (
        matched
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("a_n_sh").alias("n_a"),
            F.first("b_n_sh").alias("n_b"),
        )
        .withColumn("uni", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .filter(F.col("inter") * 100 >= F.col("uni") * min_jaccard_pct)
        .select("id_a", "id_b", "inter", "uni")
    )
    return pairs


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(k: int, seed: int = 1234567):
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31)) for _ in range(k)]


def with_shingle_hashes(df: DataFrame, shingle_col: str = "shingles",
                        out_col: str = "sh_hashes") -> DataFrame:
    """64-bit xxhash64 per shingle (JVM-side, hashed ONCE). Downstream —
    MinHash permutations AND exact-verification set intersections — works
    on these 8-byte longs instead of the raw shingle strings, which cuts
    shuffle bytes by the average shingle length (~4×)."""
    return df.withColumn(
        out_col, F.transform(F.col(shingle_col), lambda s: F.xxhash64(s)))


# odd 64-bit mixing multipliers (splitmix64 constants) — one per shingle
# position so reordered words hash differently. Positions beyond the
# seeded six are derived on demand (splitmix64 of the position, forced
# odd), so any n is valid — n used to raise IndexError past 6.
_MIX = np.array([0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
                 0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5, 0xC2B2AE3D27D4EB4F],
                dtype=np.uint64)

_M64 = (1 << 64) - 1


@lru_cache(maxsize=None)
def _mix_for(n: int) -> np.ndarray:
    """Per-position multipliers for word-``n``-grams: the seeded constants
    for positions 0–5 (unchanged — existing hashes/oracles depend on them),
    splitmix64(position)|1 beyond."""
    if n <= len(_MIX):
        return _MIX[:n]
    extra = []
    for j in range(len(_MIX), n):
        z = (j * 0x9E3779B97F4A7C15 + 0xBF58476D1CE4E5B9) & _M64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
        z ^= z >> 31
        extra.append(z | 1)
    return np.concatenate([_MIX, np.array(extra, dtype=np.uint64)])


def _hashed_shingles_one(words: list, n: int, memo: dict) -> np.ndarray:
    """Distinct 64-bit word-``n``-gram hashes WITHOUT materializing shingle
    strings: each word is hashed once (memoized across the batch — web
    vocab repeats heavily), then the n-gram hash is a position-weighted
    wrapping mix of the word hashes, vectorized over the whole doc.

    The word hash is md5-digest bytes [8:16] little-endian — DuckDB's
    ``md5_number_lower``, the same primitive the SimHash kernel pins —
    so an independent SQL engine can replay the ENTIRE MinHash chain
    (word hash → position mix → affine permutations → band buckets) and
    the incremental-dedup oracles need no LSH-recall assumption."""
    if len(words) < n:
        return np.empty(0, dtype=np.int64)
    import hashlib
    mix = _mix_for(n)
    wh = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = memo.get(w)
        if h is None:
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:16],
                               "little")
            memo[w] = h
        wh[i] = h
    m = len(words) - n + 1
    with np.errstate(over="ignore"):
        tri = wh[:m] * mix[0]
        for j in range(1, n):
            tri = tri ^ (wh[j:j + m] * mix[j])
    return np.unique(tri).view(np.int64)


def with_hashed_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                         out_col: str = "sh_hashes") -> DataFrame:
    """Distinct word n-gram shingles per row, as 64-bit HASHES — one fused
    Arrow kernel, no shingle strings ever built (the string-join dominated
    the with_shingles profile and the strings dominated its shuffle bytes).
    Hash-set semantics equal string-set semantics w.h.p. (collisions
    ~n_shingles²/2^64); every downstream decision is set-cardinality based
    so the outputs are unchanged."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(texts: pd.Series) -> pd.Series:
        memo: dict = {}
        return pd.Series(
            [_hashed_shingles_one((t or "").split(), n, memo).tolist()
             for t in texts.tolist()],
            index=texts.index, dtype=object)

    return df.withColumn(out_col, udf(F.col(text_col)))


def with_hashed_shingles_minhash(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    seed: int = 1234567,
) -> DataFrame:
    """ONE fused Arrow kernel: text → (sh_hashes, minhash).

    Fusing matters twice at scale: the hash arrays never round-trip
    JVM→Python a second time for the signature pass, and the k affine
    permutations run as ONE slab matmul over the batch's concatenated
    shingle hashes with a segmented min (np.minimum.reduceat) — no
    per-row Python loop at all after word hashing."""
    params = _minhash_params(k, seed)
    a_vec = np.array([a for a, _ in params], dtype=np.int64)[None, :]
    b_vec = np.array([b for _, b in params], dtype=np.int64)[None, :]
    empty_sig = [int(MERSENNE31)] * k

    out_t = T.StructType([
        T.StructField("sh_hashes", T.ArrayType(T.LongType()), False),
        T.StructField("minhash", T.ArrayType(T.LongType()), False),
    ])

    @F.pandas_udf(out_t)
    def udf(texts: pd.Series) -> pd.DataFrame:
        memo: dict = {}
        arrs = [_hashed_shingles_one((t or "").split(), n, memo)
                for t in texts.tolist()]
        # per-row (n_shingles × k) expansion: the arrays are small enough to
        # stay cache-resident, which measured ~20× faster than one big
        # batch-wide expansion + segmented min (memory-bandwidth bound)
        sigs: list = []
        for a in arrs:
            if a.size == 0:
                sigs.append(empty_sig)
                continue
            hv = (a % MERSENNE31)[:, None]                 # non-negative
            sigs.append(((hv * a_vec + b_vec) % MERSENNE31)
                        .min(axis=0).tolist())
        return pd.DataFrame({
            "sh_hashes": [a.tolist() for a in arrs],
            "minhash": sigs,
        }, index=texts.index)

    return (df.withColumn("_smh", udf(F.col(text_col)))
            .withColumn("sh_hashes", F.col("_smh.sh_hashes"))
            .withColumn("minhash", F.col("_smh.minhash"))
            .drop("_smh"))


def with_minhash(df: DataFrame, shingle_col: str = "shingles", k: int = 64,
                 out_col: str = "minhash", seed: int = 1234567,
                 hash_col: Optional[str] = None) -> DataFrame:
    """k-permutation MinHash signature:
    sig_i = min over shingles of pmod(a_i·(xxhash64(s) mod 2^31−1) + b_i, 2^31−1).

    Hybrid execution: shingles are hashed ONCE on the JVM (xxhash64 — pass
    ``hash_col`` to reuse a precomputed with_shingle_hashes column), then
    the k affine permutations + min-reduce run as one numpy matrix op per
    row inside a pandas UDF. Spark's higher-order-function lambdas are
    interpreted per element — k=64 separate `transform` passes measured
    ~10× slower than the (shingles×k) numpy broadcast."""
    params = _minhash_params(k, seed)
    a_vec = np.array([a for a, _ in params], dtype=np.int64)[None, :]
    b_vec = np.array([b for _, b in params], dtype=np.int64)[None, :]

    if hash_col is not None:
        hashes = F.col(hash_col)
    else:
        hashes = F.transform(F.col(shingle_col), lambda s: F.xxhash64(s))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(harr: pd.Series) -> pd.Series:
        out = []
        empty = [int(MERSENNE31)] * a_vec.shape[1]
        for h in harr:
            if h is None or len(h) == 0:
                out.append(empty)
                continue
            # fold the 64-bit hash into the 31-bit permutation universe
            # here (numpy % matches Spark pmod: non-negative result)
            hv = (np.asarray(h, dtype=np.int64) % MERSENNE31)[:, None]  # (n, 1)
            sig = ((hv * a_vec + b_vec) % MERSENNE31).min(axis=0)       # (k,)
            out.append(sig.tolist())
        return pd.Series(out, index=harr.index, dtype=object)

    return df.withColumn(out_col, sig_udf(hashes))


def _salted_self_join(
    exploded: DataFrame,
    keys: list,
    salt_cap: int,
    payload_cols: tuple = (),
    big: Optional[DataFrame] = None,
) -> DataFrame:
    """Self-join ``exploded`` (columns: id, *keys, *payload_cols) on
    ``keys``, emitting EXACTLY ONE row per (key-group, unordered id pair)
    with id_a < id_b and the pair's payloads as a_<col>/b_<col> — with
    triangle salting of oversized key groups.

    A group of G rows yields G²/2 pairs in ONE task under a plain
    self-join — a viral near-dup cluster at crawl scale quadratically blows
    a single task. Groups above ``salt_cap`` are hash-split into
    m=⌈G/cap⌉ chunks; a row in chunk c serves as the LEFT of chunk-pairs
    (c, j≥c) and the RIGHT of chunk-pairs (i≤c, c), and the join key
    (*keys, pi, pj) spreads the same pair set over m(m+1)/2 bounded tasks.
    No pair is lost or duplicated: pair (x, y) with chunks cx ≤ cy meets
    only at chunk-pair (cx, cy), in one orientation when cx < cy and — via
    the aid < bid filter — once when cx = cy.

    ``big`` is the oversized-group relation (*keys, gsz): pass it
    precomputed when the caller already aggregated group sizes (the ngram
    path); when None it is derived here and, if EMPTY, the whole salting
    machinery short-circuits to a plain |keys|-key equi-join — the common
    no-viral-cluster case pays one tiny aggregate instead of a 4-key join
    with a per-row ``sequence`` explode (the round-2 dedup_minhash
    regression)."""
    if big is None:
        # cached: the oversized-bucket relation is TINY (bounded by
        # rows/salt_cap) and read twice — the emptiness probe below and,
        # when non-empty, the salted join's broadcast side — so the
        # bucket-count aggregation behind it runs once (the ngram
        # freq-tail precedent; released by the ContextCleaner)
        big = (exploded.groupBy(*keys)
               .agg(F.count(F.lit(1)).alias("gsz"))
               .filter(F.col("gsz") > salt_cap)
               .cache())
    # the emptiness probe is ONE tiny aggregate job (over the caller's
    # cached upstream in every call site) and decides between the plain
    # 2-key join and the 4-key salted join + per-row sequence explode
    if big.isEmpty():
        big = None

    def payload(side: str):
        return [F.col(c).alias(f"{side}_{c}") for c in payload_cols]

    if big is None:
        a = exploded.select(F.col("id").alias("aid"), *keys, *payload("a"))
        b = exploded.select(F.col("id").alias("bid"), *keys, *payload("b"))
        return (a.join(b, list(keys))
                .filter(F.col("aid") < F.col("bid"))
                .select(F.col("aid").alias("id_a"), F.col("bid").alias("id_b"),
                        *[F.col(f"{s}_{c}")
                          for c in payload_cols for s in ("a", "b")]))

    ex = (
        exploded.join(F.broadcast(big.select(*keys, "gsz")), list(keys), "left")
        .withColumn("m", F.coalesce(
            F.ceil(F.col("gsz") / salt_cap), F.lit(1)).cast("int"))
        .withColumn("chunk", F.pmod(F.xxhash64("id"), F.col("m")).cast("int"))
    )
    a = ex.select(
        F.col("id").alias("aid"), *keys, *payload("a"),
        F.col("chunk").alias("pi"),
        F.explode(F.sequence(F.col("chunk"), F.col("m") - 1)).alias("pj"))
    b = ex.select(
        F.col("id").alias("bid"), *keys, *payload("b"),
        F.explode(F.sequence(F.lit(0), F.col("chunk"))).alias("pi"),
        F.col("chunk").alias("pj"))
    j = (a.join(b, [*keys, "pi", "pj"])
         .filter((F.col("pi") < F.col("pj")) | (F.col("aid") < F.col("bid"))))
    swap = F.col("aid") > F.col("bid")
    return j.select(
        F.least("aid", "bid").alias("id_a"),
        F.greatest("aid", "bid").alias("id_b"),
        *[F.when(swap, F.col(f"{t}_{c}")).otherwise(F.col(f"{s}_{c}"))
          .alias(f"{s}_{c}")
          for c in payload_cols for s, t in (("a", "b"), ("b", "a"))])


def _salted_band_candidates(exploded: DataFrame, salt_cap: int) -> DataFrame:
    """Distinct candidate (id_a < id_b) pairs sharing a (band, bhash)
    bucket — the `_salted_self_join` core (triangle salting of oversized
    buckets, plain 2-key join short-circuit when none exist) plus the
    across-band distinct."""
    return (_salted_self_join(exploded, ["band", "bhash"], salt_cap)
            .select("id_a", "id_b")
            .distinct())


def minhash_signatures(df: DataFrame, key_col: str, text_col: str = "text",
                       n: int = 3, k: int = 64,
                       seed: int = 1234567) -> DataFrame:
    """The persistable MinHash signature relation: (id, sh_hashes, minhash)
    — one fused Arrow kernel per input row, empty-shingle rows dropped.
    This is the table an INCREMENTAL dedup pipeline stores between batches
    (write it bucketed by ``id`` via plans/bucketed for exchange-free
    verification joins)."""
    return (
        with_hashed_shingles_minhash(df, text_col, n, k, seed)
        .select(F.col(key_col).alias("id"), "sh_hashes", "minhash")
        .filter(F.size("sh_hashes") > 0)
    )


def band_rows(sig: DataFrame, bands: int = 16, rows: int = 4) -> DataFrame:
    """LSH band rows (id, band, bhash) from a signature relation — pure
    JVM expressions over the ``minhash`` array (xxhash64 of each band's
    ``rows`` signature slots), so deriving band rows from a stored
    signature table costs no Python and no extra kernel run."""
    band_structs = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.xxhash64(F.concat_ws(",", *[
                F.element_at("minhash", j * rows + r + 1).cast("string")
                for r in range(rows)
            ])).alias("bhash"),
        )
        for j in range(bands)
    ])
    return (
        sig.select("id", F.explode(band_structs).alias("b"))
        .select("id", F.col("b.band").alias("band"),
                F.col("b.bhash").alias("bhash"))
    )


def incremental_minhash_pairs(
    batch_sig: DataFrame,
    index_sig: DataFrame,
    k: int = 64,
    bands: int = 16,
    min_jaccard_pct: int = 70,
    include_batch_pairs: bool = False,
    salt_cap: int = 1000,
) -> DataFrame:
    """Dedup an incoming batch AGAINST A PERSISTED SIGNATURE INDEX — the
    production shape of MinHash dedup: signatures are computed once per
    document ever (``minhash_signatures``), stored, and each new crawl
    batch joins its band rows against the index's instead of re-shingling
    the whole corpus.

    Inputs are signature relations (id, sh_hashes, minhash) — the batch
    side fresh, the index side typically read back from storage. Output:
    (index_id, batch_id, inter, uni) pairs at Jaccard ≥ pct/100, exact-
    verified over the stored hash arrays, ids that appear in both
    relations excluded (re-crawled documents are not their own dups).

    ``include_batch_pairs=True`` additionally emits WITHIN-batch pairs as
    (index_id=min, batch_id=max) rows — a batch containing its own dups
    must catch them before its survivors join the index. The within-batch
    leg reuses the triangle-salted self-join.

    Scale: the cross join is keyed by (band, bhash) — co-locate it by
    storing the index band rows bucketed on bhash (plans/bucketed) and the
    batch side repartitioned to match. ``salt_cap`` additionally
    chunk-salts INDEX-side buckets above the cap (the index is the side
    that accumulates viral clusters over batches): index rows hash into
    m=⌈G/cap⌉ chunks and only the hot buckets' batch rows are replicated
    m×, so a batch doc landing in a viral index cluster spreads over m
    bounded tasks instead of one. The probe is one tiny aggregate and the
    plain 2-key join runs when no bucket is hot (the common case). The
    verify join is id-keyed and exact."""
    rows = k // bands
    # both band relations cached: bb feeds the cross join and the
    # within-batch leg; ib feeds the hot-bucket probe and the cross join
    bb = band_rows(batch_sig, bands, rows).cache()
    ib = band_rows(index_sig, bands, rows).cache()
    # cached: read by the emptiness probe and, when non-empty, by BOTH
    # legs' broadcast joins (il and bl) — bounded by index_rows/salt_cap
    big = (ib.groupBy("band", "bhash")
           .agg(F.count(F.lit(1)).alias("gsz"))
           .filter(F.col("gsz") > salt_cap)
           .cache())
    il = ib.select(F.col("id").alias("index_id"), "band", "bhash")
    bl = bb.select(F.col("id").alias("batch_id"), "band", "bhash")
    if big.isEmpty():
        raw = il.join(bl, ["band", "bhash"])
    else:
        il = (il.join(F.broadcast(big), ["band", "bhash"], "left")
              .withColumn("m", F.coalesce(
                  F.ceil(F.col("gsz") / salt_cap), F.lit(1)).cast("int"))
              .withColumn("chunk", F.pmod(F.xxhash64("index_id"),
                                          F.col("m")).cast("int")))
        bl = (bl.join(F.broadcast(big), ["band", "bhash"], "left")
              .withColumn("m", F.coalesce(
                  F.ceil(F.col("gsz") / salt_cap), F.lit(1)).cast("int"))
              .withColumn("chunk", F.explode(
                  F.sequence(F.lit(0), F.col("m") - 1))))
        raw = (il.select("index_id", "band", "bhash", "chunk")
               .join(bl.select("batch_id", "band", "bhash", "chunk"),
                     ["band", "bhash", "chunk"]))
    cand = (
        raw.filter(F.col("index_id") != F.col("batch_id"))
        .select("index_id", "batch_id")
        .distinct()
    )
    if include_batch_pairs:
        within = (_salted_band_candidates(bb, salt_cap)
                  .select(F.col("id_a").alias("index_id"),
                          F.col("id_b").alias("batch_id")))
        cand = cand.union(within).distinct()
    # the left verify side may need batch rows too (within-batch pairs);
    # on an id present in BOTH relations (re-crawl) the INDEX version wins
    # deterministically — it is the stored truth until the batch is merged
    # (dropDuplicates would pick an arbitrary side per run)
    sa = index_sig.unionByName(
        batch_sig.join(index_sig.select("id"), "id", "left_anti")
    ).select(
        F.col("id").alias("index_id"), F.col("sh_hashes").alias("sh_a"))
    sb = batch_sig.select(
        F.col("id").alias("batch_id"), F.col("sh_hashes").alias("sh_b"))
    return (
        cand.join(sa, "index_id").join(sb, "batch_id")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size("sh_a") + F.size("sh_b") - F.col("inter"))
        .filter(F.col("inter") * 100 >= F.col("uni") * min_jaccard_pct)
        .select("index_id", "batch_id", "inter", "uni")
    )


def minhash_index_survivors(
    batch_sig: DataFrame,
    index_sig: DataFrame,
    pairs: DataFrame,
) -> DataFrame:
    """The batch rows that should JOIN the index after a dedup pass:

    * not matched to any stored document — every ``batch_id`` appearing in
      ``pairs`` is a duplicate (of the index, or — when the pairs came from
      ``incremental_minhash_pairs(include_batch_pairs=True)`` — of an
      earlier batch sibling, which appears as the pair's min/``index_id``
      side and therefore survives unless it matched something itself);
    * not a re-crawl of an id already present in the index (the stored
      version wins deterministically — same rule the verify join uses).

    Plan shape: two left-anti hash joins keyed on id — no new shuffles
    beyond the ids already flowing, safe at any corpus size."""
    losers = pairs.select(F.col("batch_id").alias("id")).distinct()
    return (batch_sig.join(losers, "id", "left_anti")
            .join(index_sig.select("id"), "id", "left_anti"))


def update_minhash_index(
    index_sig: DataFrame,
    batch_sig: DataFrame,
    pairs: DataFrame,
) -> DataFrame:
    """The NEXT version of a persisted MinHash signature index: the stored
    relation plus the batch's survivors (``minhash_index_survivors``).
    This is the missing write-side half of ``incremental_minhash_pairs``:
    compute pairs → report/drop duplicates → persist this relation as
    version N+1 (see plans/index_store for the atomic versioned write)
    → batch N+1 dedups against it. Columns: (id, sh_hashes, minhash)."""
    return index_sig.unionByName(
        minhash_index_survivors(batch_sig, index_sig, pairs))


def minhash_lsh_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    min_jaccard_pct: int = 70,
    seed: int = 1234567,
    salt_cap: int = 1000,
    eager_cleanup: bool = False,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact verification.

    LSH prunes the pair space (band-hash equality buckets); surviving
    candidates are verified with exact shingle-set intersection, so the
    output carries exact integer (inter, uni) — byte-stable across engines.
    With k=64, bands=16 (rows=4) the probability a true 0.7-Jaccard pair
    misses every band is (1−0.7⁴)¹⁶ ≈ 1.2%, and for the ≥0.9 near-dups this
    operator targets it is < 1e-8.

    Verification runs over the per-doc xxhash64(shingle) arrays (8 bytes
    each), never the raw shingle strings — integer set intersections give
    the same (inter, uni) w.h.p. (64-bit collisions ~n²/2^64) and shuffle
    ~4× fewer bytes through the three joins.

    ``salt_cap`` triangle-salts oversized band buckets: a viral cluster of
    G near-identical docs puts all G rows in ONE (band, bhash) bucket and
    its G²/2 pairs in ONE task. Buckets larger than the cap are split into
    m=⌈G/cap⌉ hash chunks and the join runs per chunk-pair (i ≤ j), so the
    same pairs emerge from m(m+1)/2 bounded tasks — no pair is lost.

    ``eager_cleanup=True`` materializes the (small) result and unpersists
    the two intermediate caches before returning — for long-lived jobs
    where cache pressure matters more than laziness.
    """
    rows = k // bands
    # cache the hashed shingle sets + signatures: read three times (both
    # sides of the band self-join + the verification joins) and the fused
    # shingle/minhash kernel is the dominant cost. Cached payload is longs,
    # not strings.
    sh = minhash_signatures(df, key_col, text_col, n, k, seed).cache()
    exploded = band_rows(sh, bands, rows).cache()

    cand = _salted_band_candidates(exploded, salt_cap)
    # exact verification of candidates over the hash arrays
    sa = sh.select(F.col("id").alias("id_a"), F.col("sh_hashes").alias("sh_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("sh_hashes").alias("sh_b"))
    verified = (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size("sh_a") + F.size("sh_b") - F.col("inter"))
        .filter(F.col("inter") * 100 >= F.col("uni") * min_jaccard_pct)
        .select("id_a", "id_b", "inter", "uni")
    )
    if eager_cleanup:
        verified = verified.localCheckpoint(eager=True)
        sh.unpersist()
        exploded.unpersist()
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64

# Tokens are ASCII-whitespace-separated runs — pinned to the alphabet RE2
# and Python `re` agree on, so the DuckDB oracle's regexp_extract_all sees
# the identical token stream.
_SIMHASH_TOKEN_RE = re.compile(r"[^\t\n\f\r ]+")


def simhash_token_hash(tok: str) -> int:
    """64-bit token hash = DuckDB's md5_number_lower: little-endian uint64
    of md5-digest bytes [8:16]. Chosen so an independent SQL engine can
    recompute the full SimHash signature from scratch (oracle parity)."""
    import hashlib
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[8:16], "little")


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per text: sign of the per-bit sum of ±1 votes from
    each distinct token's 64-bit hash, weighted by token frequency.
    Token→hash memoized per batch (web corpora repeat tokens heavily);
    per-doc bit voting is one numpy matmul over the token-hash bit matrix."""
    cache: dict = {}

    def tok_hash(tok: str) -> int:
        h = cache.get(tok)
        if h is None:
            h = simhash_token_hash(tok)
            cache[tok] = h
        return h

    out = np.zeros(len(texts), dtype=np.int64)
    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    for i, t in enumerate(texts.tolist()):
        toks = _SIMHASH_TOKEN_RE.findall(t or "")
        if not toks:
            continue
        vals, counts = np.unique(
            np.array([tok_hash(tok) for tok in toks], dtype=np.uint64),
            return_counts=True,
        )
        bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.int64)  # (T, 64)
        votes = (counts[:, None] * (2 * bits - 1)).sum(axis=0)
        sig = np.uint64(0)
        sig_bits = (votes >= 0).astype(np.uint64)
        sig = (sig_bits << shifts).sum(dtype=np.uint64)
        out[i] = np.int64(sig.astype(np.uint64).view(np.int64))
    return pd.Series(out, index=texts.index)


def with_simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        return _simhash_batch(texts)

    return df.withColumn(out_col, simhash_udf(F.col(text_col)))


def simhash_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    salt_cap: int = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the four 16-bit sub-keys (any pair
    within Hamming ≤ 3 of 64 bits must agree exactly on ≥1 of 4 sub-keys —
    pigeonhole), then verify exact Hamming distance JVM-side via bit_count.

    The sub-key self-join goes through the same triangle salting as the
    MinHash band join (``_salted_band_candidates``): a viral cluster shares
    all four sub-keys, so without the salt its G²/2 candidate pairs land in
    ONE task."""
    # cached: read three times (sub-key explode + both verify sides) and
    # the signature kernel is the dominant cost; payload is (id, long)
    sh = (with_simhash(df.select(F.col(key_col).alias("id"), text_col), text_col)
          .select("id", "simhash")
          .cache())
    keyed = sh.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), j * 16)
                .bitwiseAND(F.lit(0xFFFF)).alias("bhash"),
            )
            for j in range(4)
        ])).alias("b"),
    ).select("id", "b.band", "b.bhash")
    cand = _salted_band_candidates(keyed, salt_cap)
    ha = sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("h_a"))
    hb = sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("h_b"))
    return (
        cand.join(ha, "id_a").join(hb, "id_b")
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# helper: union a perturbed copy (drop first word) — the deterministic
# near-dup generator used by queries and tests (reconstructable in SQL)
# ---------------------------------------------------------------------------

def with_near_dup_copies(df: DataFrame, key_col: str, text_col: str = "text",
                         id_offset: int = 100000) -> DataFrame:
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    perturbed = df.select(
        (F.col(key_col) + id_offset).alias(key_col),
        F.array_join(F.slice(words, 2, F.size(words) - 1), " ").alias(text_col),
        *[c for c in df.columns if c not in (key_col, text_col)],
    )
    return df.select(key_col, text_col, *[c for c in df.columns if c not in (key_col, text_col)]).union(perturbed)
