"""Volume check for the BPE ENCODER paths with a production-scale merge
table: train a large vocabulary once via the vocabulary-collect trainer,
then encode 200k Zipfian docs with (a) the pattern-scan batched encoder
(per-unique-word cost grows with the merge count) and (b) the
rank-cursor encoder (per-word cost bounded by the word), asserting
bit-identical outputs first at a small merge count across all three
encoders and then at the large table between (a) and (b).

Prints ONE JSON line; record results in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = int(os.environ.get("SPARK_GRAFT_BPE_ENC_DOCS", "200000"))
TOKENS_PER_DOC = 30
VOCAB = 50_000
N_MERGES_SMALL = 8
N_MERGES_BIG = int(os.environ.get("SPARK_GRAFT_BPE_ENC_MERGES", "4000"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_system_spark.operators.bpe import (
        bpe_encode, bpe_encode_batched, bpe_encode_ranked, bpe_train_local)
    from ocr_system_spark.session import get_spark

    spark = get_spark(cores=CORES, app_name="bpe_encode_volume",
                      shuffle_partitions=CORES * 2)
    docs = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    ztoks = [
        F.translate(
            (((F.col("doc_id") * 131 + k * 17_923) % 10_000)
             * ((F.col("doc_id") * 131 + k * 17_923) % 10_000)
             * VOCAB / 100_000_000).cast("long").cast("string"),
            "0123456789", "abcdefghij")
        for k in range(TOKENS_PER_DOC)
    ]
    zdf = (docs.select("doc_id", F.concat_ws(" ", *ztoks).alias("text"))
           .repartition(CORES * 2).cache())
    zdf.count()

    def collect(df):
        return sorted((r["id"], r["n_tokens"], r["n_subwords"])
                      for r in df.collect())

    # 3-way bit-identity at a small merge count (incl. the JVM chain)
    small = bpe_train_local(zdf, N_MERGES_SMALL)
    sample = zdf.limit(2000)
    a = collect(bpe_encode(sample, small))
    b = collect(bpe_encode_batched(sample, small))
    c = collect(bpe_encode_ranked(sample, small))
    assert a == b == c

    # production-size table: batched vs ranked at full volume
    big = bpe_train_local(zdf, N_MERGES_BIG)
    n_big = len(big)

    t0 = time.perf_counter()
    rb = collect(bpe_encode_batched(zdf, big))
    wall_batched = round(time.perf_counter() - t0, 3)
    t1 = time.perf_counter()
    rr = collect(bpe_encode_ranked(zdf, big))
    wall_ranked = round(time.perf_counter() - t1, 3)
    assert rr == rb
    assert len(rr) == N_DOCS

    print(json.dumps({
        "metric": "bpe encode volume (Zipfian corpus, vocab-collect merges)",
        "docs": N_DOCS, "n_merges": n_big,
        "batched": {"wall_sec": wall_batched,
                    "docs_per_sec": round(N_DOCS / wall_batched, 1)},
        "ranked": {"wall_sec": wall_ranked,
                   "docs_per_sec": round(N_DOCS / wall_ranked, 1)},
        "speedup": round(wall_batched / wall_ranked, 2),
        "cpus": CORES,
    }))


if __name__ == "__main__":
    main()
