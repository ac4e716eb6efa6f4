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
from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
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


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) — exact cosine top-k. The query side is
    broadcast (small); the corpus side streams, so the plan is a single
    broadcast nested-loop scoring pass + per-query top-k window."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("qv"), F.col("cv")))
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
