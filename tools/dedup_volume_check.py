"""Volume check for the INCREMENTAL DEDUP LOOP — the round-4 write side.

~100k-document signature index, 20k-document incoming batch (half planted
near-dups of index docs, half genuinely fresh), run end-to-end at
local[32]:

    minhash_signatures(index)  →  versioned publish v1
    minhash_signatures(batch)
    incremental_minhash_pairs(batch, v1, include_batch_pairs=True)
    update_minhash_index       →  versioned publish v2

Asserts exact expected pair and survivor counts (the construction makes
them deterministic), then prints ONE JSON line with per-phase walls and
appends a section to BENCH/BASELINE.md. The sandbox cannot hold a 100 TB
index, but it can prove the loop's bookkeeping and its shuffle shapes
(band joins keyed by (band, bhash), id-keyed verify + anti-joins, bounded
by construction) hold two orders of magnitude past test sizes with no
driver-side collection beyond the hot-bucket probe.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_INDEX = int(os.environ.get("SPARK_GRAFT_DEDUP_VOLUME_DOCS", "100000"))
N_BATCH = N_INDEX // 5          # 10% dups of index docs + 10% fresh
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORDS_PER_DOC = 30


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_system_spark.operators import dedup
    from ocr_system_spark.plans import index_store
    from ocr_system_spark.session import get_spark

    spark = get_spark(cores=CORES, app_name="dedup_volume",
                      shuffle_partitions=CORES * 4)
    tmp = tempfile.mkdtemp(prefix="dedup_volume_")
    store = os.path.join(tmp, "mh_index")

    # deterministic corpora, built ON the cluster (no driver materialize):
    # every word carries its doc id → zero organic cross-doc similarity
    def mk_docs(ids, prefix):
        words = F.concat_ws(" ", F.array(*[
            F.concat(F.lit(f"{prefix}"), F.col("id").cast("string"),
                     F.lit(f"x{j}"))
            for j in range(WORDS_PER_DOC)]))
        return ids.select(F.col("id").alias("doc_id"), words.alias("text"))

    index_docs = mk_docs(spark.range(N_INDEX), "t").repartition(CORES * 4)
    half = N_BATCH // 2
    # dups: drop the first word of every 10th index doc; fresh: new prefix
    dup_src = mk_docs(
        spark.range(half).select((F.col("id") * 10).alias("id")), "t")
    dup_words = F.split(F.col("text"), " ")
    dups = dup_src.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.array_join(F.slice(dup_words, 2, WORDS_PER_DOC - 1), " ")
        .alias("text"))
    fresh = mk_docs(
        spark.range(half).select((F.col("id") + 20_000_000).alias("id")), "f")
    batch_docs = dups.union(fresh).repartition(CORES * 2)

    timings = {}

    def phase(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 2)
        return out

    # phase 1: index signatures + publish v1
    idx_sig = dedup.minhash_signatures(index_docs, "doc_id")
    v = phase("index_sign_publish",
              lambda: index_store.write_index_version(
                  idx_sig, store, n_partitions=CORES * 4))
    assert v == 1

    stored, _ = index_store.read_index(spark, store)
    b_sig = dedup.minhash_signatures(batch_docs, "doc_id").cache()

    # phase 2: dedup the batch against the stored index
    pairs = dedup.incremental_minhash_pairs(
        b_sig, stored, include_batch_pairs=True).cache()
    n_pairs = phase("pairs", pairs.count)
    assert n_pairs == half, n_pairs          # each dup matches ITS source only

    # phase 3: next index version + publish
    nxt = dedup.update_minhash_index(stored, b_sig, pairs)
    v = phase("update_publish",
              lambda: index_store.write_index_version(
                  nxt, store, n_partitions=CORES * 4))
    assert v == 2
    v2, _ = index_store.read_index(spark, store)
    n_v2 = v2.count()
    assert n_v2 == N_INDEX + half, n_v2      # survivors = the fresh half

    total = round(sum(timings.values()), 2)
    line = {
        "metric": "incremental dedup loop wall (sign+publish, pairs, update+publish)",
        "value": total, "unit": "sec", "phases": timings,
        "index_docs": N_INDEX, "batch_docs": N_BATCH,
        "pairs": n_pairs, "index_v2_docs": n_v2,
        "batch_docs_per_sec": round(N_BATCH / max(
            timings["pairs"] + timings["update_publish"], 1e-9), 1),
        "cpus": CORES,
    }
    print(json.dumps(line))

    md = f"""
## Incremental dedup loop at volume (round 4)

{N_INDEX:,}-doc signature index, {N_BATCH:,}-doc batch (half planted
near-dups, half fresh), full loop at local[{CORES}] — signatures →
versioned publish → band-join pairs (within-batch leg on) → index update
→ atomic publish of v2. Exact expected outputs asserted
({N_BATCH // 2:,} pairs, {N_INDEX + N_BATCH // 2:,} v2 rows).

| phase | wall sec |
|---|---|
""" + "\n".join(f"| {k} | {v} |" for k, v in timings.items()) + f"""
| **total** | **{total}** |

Batch dedup throughput (pairs + update + publish):
**{line['batch_docs_per_sec']:,} batch docs/sec** — the steady-state cost
of admitting a crawl batch against an ever-growing index is the batch's
own size, never the index scan (band join is keyed, verify is id-keyed,
survivor anti-joins are id-keyed).
"""
    with open(REPO / "BENCH" / "BASELINE.md", "a") as f:
        f.write(md)
    print("appended BENCH/BASELINE.md", file=sys.stderr)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
