"""Volume check for BPE training: 200k docs over a 50,000-term
vocabulary (6M token occurrences), 6 merge steps at local[32].

Asserts partitioning-invariance of the learned merges (the determinism
contract) and that every step's argmax count is positive; reports wall
seconds per training step.  The corpus shuffles once (vocabulary build);
each step's pair count runs over vocabulary rows (~50k) — the design
that makes merge training independent of corpus size.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = 200_000
VOCAB = 50_000
TOKENS_PER_DOC = 30
N_MERGES = 6


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_system_spark.operators.bpe import bpe_train
    from ocr_system_spark.session import get_spark

    spark = get_spark(cores=32, app_name="bpe_volume",
                      shuffle_partitions=64)
    docs = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    toks = [
        F.concat(F.lit("w"),
                 ((F.col("doc_id") * 31 + k * 7919) % VOCAB).cast("string"))
        for k in range(TOKENS_PER_DOC)
    ]
    df = (docs.select("doc_id", F.concat_ws(" ", *toks).alias("text"))
          .repartition(64).cache())
    df.count()

    t0 = time.perf_counter()
    merges = bpe_train(df, N_MERGES)
    wall = round(time.perf_counter() - t0, 3)

    assert len(merges) == N_MERGES, merges
    assert all(c > 0 for _, _, _, c in merges), merges
    # determinism across partitionings — the cross-engine contract
    merges2 = bpe_train(df.coalesce(4), N_MERGES)
    assert merges == merges2, (merges, merges2)

    print(json.dumps({
        "metric": "bpe_train volume (200k docs, 50k vocab, 6 merges)",
        "wall_sec": wall,
        "sec_per_merge": round(wall / N_MERGES, 3),
        "merges": [[m, l, r, c] for m, l, r, c in merges],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
