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
N_MERGES_WORST = 200
N_MERGES_LOCAL = 8_000
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

    # batched path: bit-identity on the sequential prefix, then volume.
    # THIS corpus is the batching worst case: every token starts with the
    # same symbol 'w' and counts tie in huge blocks, so the acceptance
    # rule degrades to ~1 merge/round (which is the point of measuring
    # it — never worse than sequential).
    batched_prefix = bpe_train_batched(df, N_MERGES, max_batch=MAX_BATCH)
    assert batched_prefix == merges, (batched_prefix, merges)

    stats_w: dict = {}
    t1 = time.perf_counter()
    big = bpe_train_batched(df, N_MERGES_WORST, max_batch=MAX_BATCH,
                            stats=stats_w)
    wall_b = round(time.perf_counter() - t1, 3)
    assert len(big) == N_MERGES_WORST, len(big)
    assert big[:N_MERGES] == merges
    assert all(c > 0 for _, _, _, c in big)

    # Zipfian letter-word corpus — the shape batching exists for: skewed
    # frequencies (few ties at the top) and diverse leading symbols.
    # idx = (u/10000)^2 * VOCAB quantized; word = base-10 digits of idx
    # translated to letters (deterministic, letters-only, varied).
    ztoks = [
        F.translate(
            (((F.col("doc_id") * 131 + k * 17_923) % 10_000)
             * ((F.col("doc_id") * 131 + k * 17_923) % 10_000)
             * VOCAB / 100_000_000).cast("long").cast("string"),
            "0123456789", "abcdefghij")
        for k in range(TOKENS_PER_DOC)
    ]
    zdf = (docs.select("doc_id", F.concat_ws(" ", *ztoks).alias("text"))
           .repartition(64).cache())
    zdf.count()

    zseq = bpe_train(zdf, N_MERGES)
    zbatch_prefix = bpe_train_batched(zdf, N_MERGES, max_batch=MAX_BATCH)
    assert zbatch_prefix == zseq, (zbatch_prefix, zseq)

    stats_z: dict = {}
    t2 = time.perf_counter()
    zbig = bpe_train_batched(zdf, N_MERGES_BATCHED, max_batch=MAX_BATCH,
                             stats=stats_z)
    wall_z = round(time.perf_counter() - t2, 3)
    assert len(zbig) == N_MERGES_BATCHED, len(zbig)
    assert zbig[:N_MERGES] == zseq

    # local (vocabulary-collect) path: the production route — measure a
    # REAL vocabulary-scale merge count, driver-side after one corpus agg
    from ocr_system_spark.operators.bpe import bpe_train_local
    zloc_prefix = bpe_train_local(zdf, N_MERGES)
    assert zloc_prefix == zseq, (zloc_prefix, zseq)
    t3 = time.perf_counter()
    zloc = bpe_train_local(zdf, N_MERGES_LOCAL)
    wall_l = round(time.perf_counter() - t3, 3)
    assert zloc[:N_MERGES] == zseq
    assert zloc == zbig[:len(zloc)] or zloc[:N_MERGES_BATCHED] == zbig

    def rpt(n, wall_s, st):
        return {
            "n_merges": n,
            "max_batch": MAX_BATCH,
            "wall_sec": wall_s,
            "sec_per_merge": round(wall_s / n, 4),
            "rounds": st.get("rounds"),
            "realized_batch_factor": round(n / st["rounds"], 2)
            if st.get("rounds") else None,
            "projected_hours_32k": round(wall_s / n * 32_000 / 3600, 2),
        }

    print(json.dumps({
        "metric": "bpe_train volume (200k docs, 50k vocab)",
        "sequential": {
            "n_merges": N_MERGES,
            "wall_sec": wall,
            "sec_per_merge": round(wall / N_MERGES, 3),
        },
        "batched_worstcase_corpus": rpt(N_MERGES_WORST, wall_b, stats_w),
        "batched_zipf_corpus": rpt(N_MERGES_BATCHED, wall_z, stats_z),
        "local_zipf_corpus": {
            "n_merges": len(zloc),
            "requested": N_MERGES_LOCAL,
            "wall_sec": wall_l,
            "sec_per_merge": round(wall_l / max(len(zloc), 1), 5),
            "projected_hours_32k": round(
                wall_l / max(len(zloc), 1) * 32_000 / 3600, 3),
        },
        "merges_head": [[m, l, r, c] for m, l, r, c in merges],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
