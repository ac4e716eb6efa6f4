"""Volume check for BPE training: 200k docs over a 50,000-term
vocabulary (6M token occurrences) at local[32].

Two measurements:

1. Sequential ``bpe_train`` at 6 merges — the cross-engine-replayable
   path; asserts partitioning-invariance of the learned merges (the
   determinism contract) and positive argmax counts; reports wall
   seconds per merge.
2. Batched ``bpe_train_batched`` at >= 1,000 merges — the production
   path; asserts bit-identity with sequential on a prefix, reports
   sec/merge and the realized batch factor (merges per driver round).
   A 32k-merge production vocabulary is viable iff sec/merge here is
   far below sequential's (round-4 measured sequential at ~1.56 s/merge
   => ~14 h for 32k; the batched path divides that by the batch factor).

The corpus shuffles once (vocabulary build); every training step runs
over vocabulary rows (~50k) — the design that makes merge training
independent of corpus size.
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
N_MERGES_BATCHED = 1_000
MAX_BATCH = 64


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_system_spark.operators.bpe import bpe_train, bpe_train_batched
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

    # batched path: bit-identity on the sequential prefix, then volume
    batched_prefix = bpe_train_batched(df, N_MERGES, max_batch=MAX_BATCH)
    assert batched_prefix == merges, (batched_prefix, merges)

    t1 = time.perf_counter()
    big = bpe_train_batched(df, N_MERGES_BATCHED, max_batch=MAX_BATCH)
    wall_b = round(time.perf_counter() - t1, 3)
    assert len(big) == N_MERGES_BATCHED, len(big)
    assert big[:N_MERGES] == merges
    assert all(c > 0 for _, _, _, c in big)

    print(json.dumps({
        "metric": "bpe_train volume (200k docs, 50k vocab)",
        "sequential": {
            "n_merges": N_MERGES,
            "wall_sec": wall,
            "sec_per_merge": round(wall / N_MERGES, 3),
        },
        "batched": {
            "n_merges": N_MERGES_BATCHED,
            "max_batch": MAX_BATCH,
            "wall_sec": wall_b,
            "sec_per_merge": round(wall_b / N_MERGES_BATCHED, 4),
            "projected_hours_32k": round(
                wall_b / N_MERGES_BATCHED * 32_000 / 3600, 2),
        },
        "merges_head": [[m, l, r, c] for m, l, r, c in merges],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
