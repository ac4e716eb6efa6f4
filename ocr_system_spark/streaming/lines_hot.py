"""Streaming hot-line maintenance — the continuous-crawl form of the
line-level dedup family (operators/lines).

A long-running ingest maintains the corpus-wide line document-frequency
relation (line, n_docs) as a VERSIONED store (plans/index_store — same
atomic-pointer publishes the MinHash loop uses), and each arriving
micro-batch is CLEANED against the hot set the store knew before the
batch — so the stream continuously produces deduplicated documents while
its own lines feed the next version's counts.

Exactly-once under micro-batch replay (foreachBatch re-runs a batch after
a crash) is stricter here than in the MinHash loop: counts DOUBLE on a
naive replay (a re-merged batch adds its lines twice), and no re-crawl
exclusion can save an aggregate.  The loop is replay-idempotent because a
batch always merges against ITS OWN predecessor version — version
``base + batch_id`` read explicitly (``index_store.read_index_version``),
never "latest" — and publishes ``base + batch_id + 1``.  A replayed batch
therefore recomputes byte-identical counts and overwrites its own version
directory; whatever the crash interleaving, every version's content is a
pure function of (base version content, batches 1..k).

Scale: the merge is a full-outer join of two pre-aggregated count
relations on the line key (map-side combined on both sides); the cleaning
pass is the row-local broadcast rebuild (`remove_duplicate_lines`
``rebuild="local"`` internals) driven by the bounded hot set.  Rewriting
the counts relation per batch is the sandbox stand-in for an aggregating
MERGE INTO on an Iceberg table — the loop logic is unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_system_spark.operators.lines import _REBUILD_SCHEMA, line_doc_frequency
from ocr_system_spark.plans import index_store

__all__ = ["process_lines_batch", "start_hot_line_stream",
           "current_hot_lines"]

_BASE_VERSION_FILE = "_HOT_LINE_BASE_VERSION"


def _load_or_pin_base_version(checkpoint_dir: str,
                              store_path: str,
                              base_version: Optional[int]) -> int:
    """Resolve the stream's base version and PIN it to a sidecar file
    inside the checkpoint directory, so restarts of the same checkpoint
    (which resume the batch-id sequence at n, not 0) reuse the base the
    sequence was started with.  Deriving the default from the store's
    CURRENT latest on every start is wrong on exactly the resume path:
    latest has advanced to base+n, so target-1 = latest+n doesn't exist
    and a naive restart would silently merge against an empty predecessor,
    discarding all accumulated counts.

    Resolution order: an explicit ``base_version`` argument wins (and is
    validated against any pinned value — a mismatch is a hard error, not a
    silent re-base); else the pinned sidecar value; else the store's
    current latest (0 for a fresh store), which is then pinned."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    sidecar = os.path.join(checkpoint_dir, _BASE_VERSION_FILE)
    pinned: Optional[int] = None
    if os.path.exists(sidecar):
        with open(sidecar, "r", encoding="ascii") as f:
            pinned = int(f.read().strip())
    if base_version is not None:
        if pinned is not None and pinned != base_version:
            raise ValueError(
                f"base_version={base_version} conflicts with the value "
                f"{pinned} pinned at {sidecar} when this checkpoint's "
                f"batch-id sequence started; pass base_version=None to "
                f"resume, or use a fresh checkpoint_dir to re-base")
        resolved = base_version
    elif pinned is not None:
        resolved = pinned
    else:
        resolved = index_store.read_latest_version(store_path) or 0
    if pinned is None:
        # write-then-rename so a crash mid-write can't pin garbage
        tmp = sidecar + ".tmp"
        with open(tmp, "w", encoding="ascii") as f:
            f.write(str(resolved))
        os.replace(tmp, sidecar)
    return resolved


def _merge_counts(prev: Optional[DataFrame],
                  batch_counts: DataFrame) -> DataFrame:
    if prev is None:
        return batch_counts
    p = prev.select("line", F.col("n_docs").alias("_p"))
    b = batch_counts.select("line", F.col("n_docs").alias("_b"))
    return (p.join(b, on="line", how="full_outer")
            .select("line",
                    (F.coalesce(F.col("_p"), F.lit(0))
                     + F.coalesce(F.col("_b"), F.lit(0)))
                    .cast("long").alias("n_docs")))


def process_lines_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    clean_dir: str,
    base_version: int,
    min_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int = 16,
) -> int:
    """One micro-batch: clean against the predecessor version's hot set,
    write the cleaned docs, publish merged counts as the next version.
    Returns the published version.  Exposed separately so tests (and
    batch backfills) drive the exact code path the stream runs, replays
    included."""
    spark = batch_df.sparkSession
    target_version = base_version + batch_id + 1
    try:
        prev = index_store.read_index_version(
            spark, store_path, target_version - 1)
    except FileNotFoundError:
        # A missing predecessor is legitimate only for the very first
        # version of a fresh store (version 0 is never written).  Anywhere
        # else it means the batch-id sequence and the version chain have
        # come apart (e.g. a restart re-derived a different base) — treat
        # that as corruption, not as an empty predecessor: merging against
        # None here would silently discard every accumulated line count.
        if target_version - 1 != 0:
            raise FileNotFoundError(
                f"hot-line store {store_path} is missing version "
                f"{target_version - 1}, the predecessor of batch "
                f"{batch_id} (base_version={base_version}); refusing to "
                f"treat it as empty — check that base_version matches the "
                f"value this checkpoint's batch sequence started with")
        prev = None

    # hot set as of the predecessor version — bounded, collected once
    if prev is None:
        hot = set()
    else:
        hot = {r["line"] for r in
               prev.filter(F.col("n_docs") >= min_docs)
                   .select("line").collect()}
    b = spark.sparkContext.broadcast(hot)

    @F.pandas_udf(_REBUILD_SCHEMA)
    def clean_udf(texts: pd.Series) -> pd.DataFrame:
        h = b.value
        clean, n_lines, n_removed = [], [], []
        for t in texts.tolist():
            ls = (t or "").split("\n")
            kept = [l for l in ls if l not in h]
            clean.append("\n".join(kept))
            n_lines.append(len(ls))
            n_removed.append(len(ls) - len(kept))
        return pd.DataFrame({"clean_text": clean, "n_lines": n_lines,
                             "n_removed": n_removed}, index=texts.index)

    cleaned = (batch_df
               .select(F.col(id_col).alias("id"),
                       clean_udf(F.col(text_col)).alias("r"))
               .select("id", "r.clean_text", "r.n_lines", "r.n_removed"))
    (cleaned.write.mode("overwrite")
     .parquet(os.path.join(clean_dir, f"batch={batch_id}")))

    merged = _merge_counts(prev, line_doc_frequency(batch_df, id_col,
                                                    text_col))
    index_store.write_index_version(
        merged, store_path, version=target_version,
        n_partitions=n_partitions, key_col="line")
    return target_version


def current_hot_lines(spark, store_path: str, min_docs: int) -> DataFrame:
    """The hot-line relation of the CURRENT published version."""
    idx, _ = index_store.read_index(spark, store_path)
    return idx.filter(F.col("n_docs") >= min_docs)


def start_hot_line_stream(
    docs_stream: DataFrame,
    store_path: str,
    clean_dir: str,
    checkpoint_dir: str,
    min_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int = 16,
    available_now: bool = True,
    base_version: Optional[int] = None,
):
    """docs stream → foreachBatch hot-line maintenance + cleaning.
    ``base_version`` is pinned to a sidecar file in ``checkpoint_dir`` at
    first start (defaulting to the store's current version, 0 for a fresh
    store) and reloaded on restarts of the SAME checkpoint, so the resumed
    batch-id sequence keeps mapping to the version chain it started —
    passing an explicit value that conflicts with the pin is an error."""
    base_version = _load_or_pin_base_version(
        checkpoint_dir, store_path, base_version)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_lines_batch(
            batch_df, batch_id, store_path, clean_dir, base_version,
            min_docs, id_col=id_col, text_col=text_col,
            n_partitions=n_partitions)

    writer = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
