"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: broadcast the (small)
  query set against the corpus, score with JVM higher-order functions
  (zip_with/aggregate — no Python, no UDF), rank with a window;
* LSH-bucketed top-k — the scale path: random-hyperplane signatures put
  each vector in a bucket; queries only score candidates sharing a bucket
  probe. At 10^12 rows the bucket join replaces the full cross product —
  the cross join is O(Q·N) while LSH is O(Q·N/2^bits · probes);
* cosine near-dup pairs — threshold join used as the embedding-based dedup
  strategy.

All scoring is double-precision accumulation over float32 inputs; outputs
expose integer ids/ranks (ties broken by id) so cross-engine comparison is
exact.
"""

from __future__ import annotations

import random
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


TOPK_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("neighbor_id", T.LongType(), False),
    T.StructField("rank", T.IntegerType(), False),
])


def _collect_matrix(queries: DataFrame, id_col: str, vec_col: str):
    rows = queries.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return ids, mat


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact cosine top-k.

    The query set is small by definition: it is collected to the driver and
    closed over as a normalized numpy matrix (the mapInPandas analog of a
    broadcast join). Each corpus Arrow batch is scored with ONE matmul
    (batch×dim @ dim×queries) — a JVM zip_with/aggregate formulation exists
    but higher-order lambdas evaluate interpreted and measured ~10× slower.
    Per-query global top-k is a window over the (corpus × queries) scored
    rows, ties broken by neighbor id."""
    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            scores = mat @ q_mat.T                       # (batch, nq)
            nb, nq = scores.shape
            out = pd.DataFrame({
                "neighbor_id": np.repeat(ids, nq),
                "query_id": np.tile(q_ids, nb),
                "score": scores.ravel(),
            })
            yield out[out["neighbor_id"] != out["query_id"]]

    scored = emb.select(id_col, vec_col).mapInPandas(
        run,
        schema=T.StructType([
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("query_id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k — the scale path for clustered corpora.

    Centroids are a deterministic corpus sample (every ⌈N/C⌉-th vector by
    id — at production scale use k-means|| once, offline). Each corpus
    vector is assigned to its nearest centroid (one matmul per Arrow
    batch); a query scores ONLY the cells of its ``n_probe`` nearest
    centroids, so the scan fraction is ~n_probe/n_centroids instead of 1."""
    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)

    # deterministic centroid sample, normalized
    total = emb.count()
    stride = max(total // n_centroids, 1)
    cent_rows = (emb.select(id_col, vec_col)
                 .filter((F.col(id_col) % stride == 0))
                 .orderBy(id_col).limit(n_centroids).collect())
    cents = np.array([r[1] for r in cent_rows], dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    # which cells does each query probe?
    q_cells = np.argsort(-(q_mat @ cents.T), axis=1)[:, :n_probe]   # (nq, p)
    cell_to_queries = {
        int(c): np.nonzero((q_cells == c).any(axis=1))[0]
        for c in np.unique(q_cells)
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            assign = np.argmax(mat @ cents.T, axis=1)               # (batch,)
            frames = []
            for cell, qs in cell_to_queries.items():
                in_cell = np.nonzero(assign == cell)[0]
                if in_cell.size == 0:
                    continue
                scores = mat[in_cell] @ q_mat[qs].T                 # (m, |qs|)
                m = in_cell.size
                frames.append(pd.DataFrame({
                    "neighbor_id": np.repeat(ids[in_cell], qs.size),
                    "query_id": np.tile(q_ids[qs], m),
                    "score": scores.ravel(),
                }))
            if frames:
                out = pd.concat(frames, ignore_index=True)
                yield out[out["neighbor_id"] != out["query_id"]]

    scored = emb.select(id_col, vec_col).mapInPandas(
        run,
        schema=T.StructType([
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("query_id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 424242) -> List[List[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 424242,
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane (SRP) LSH bucket id: bit i = sign(v·p_i)."""
    planes = _hyperplanes(n_planes, dim, seed)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in p])
        bit = (dot(F.col(vec_col), lit_plane) > 0).cast("int")
        bucket = bucket + (bit * (1 << i))
    return df.withColumn(out_col, bucket)


def _bucket_array(vec_col: str, n_tables: int, n_planes: int, dim: int,
                  seed: int) -> Column:
    """Array of n_tables SRP bucket ids (one per independent hash table)."""
    buckets = []
    for t in range(n_tables):
        planes = _hyperplanes(n_planes, dim, seed + 1000 * t)
        b = F.lit(0)
        for i, p in enumerate(planes):
            lit_plane = F.array(*[F.lit(x) for x in p])
            bit = (dot(F.col(vec_col), lit_plane) > 0).cast("int")
            b = b + (bit * (1 << i))
        buckets.append(b + (t << n_planes))  # disjoint id space per table
    return F.array(*buckets)


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 6,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 424242,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE SRP LSH: a vector belongs to one
    bucket per table; query candidates are the union over tables (classic
    L-table LSH — single-probe recall on moderate-similarity neighbors is
    poor, union-of-tables trades candidate count for recall). Candidates
    are deduped before scoring, then ranked exactly. Recall vs
    brute_force_topk is asserted in tests — approximation is the point."""
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        F.explode(_bucket_array(vec_col, n_tables, n_planes, dim, seed)).alias("c_bkt"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(_bucket_array(vec_col, n_tables, n_planes, dim, seed)).alias("q_bkt"),
    )
    cand = (
        c.join(F.broadcast(q), (F.col("c_bkt") == F.col("q_bkt"))
               & (F.col("neighbor_id") != F.col("query_id")))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("score", cosine(F.col("qv"), F.col("cv")))
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def cosine_dup_pairs(
    emb: DataFrame,
    min_cosine: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b) pairs with cosine ≥ threshold. Exact all-pairs — at
    corpus scale swap the self-join for an LSH-bucketed candidate join
    (with_lsh_bucket) exactly as minhash_lsh_pairs does for text."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("score", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("score") >= min_cosine)
        .select("id_a", "id_b")
    )
