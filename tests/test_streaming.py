"""Structured Streaming ingest: drain-existing (availableNow), incremental
arrival without reprocessing, and watermarked metrics windows."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from ocr_system_spark.sources.pages import generate_pages
from ocr_system_spark.streaming import ingest


def _write_batch(pdf: pd.DataFrame, path: str) -> None:
    pdf[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
        path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)


@pytest.fixture()
def stream_dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ["in", "out", "ckpt", "mout", "mckpt"]}
    os.makedirs(d["in"])
    return d


def test_stream_extracts_and_resumes_incrementally(spark, stream_dirs):
    batch1 = generate_pages(120, seed=21)
    _write_batch(batch1, os.path.join(stream_dirs["in"], "b1.parquet"))

    q = ingest.start_extraction_stream(
        ingest.read_page_stream(spark, stream_dirs["in"]),
        stream_dirs["out"], stream_dirs["ckpt"], n_buckets=8)
    q.awaitTermination(180)
    out1 = spark.read.parquet(stream_dirs["out"])
    assert out1.count() == 120
    assert out1.filter("extract_ok").count() > 100

    # second arrival: only the new file is processed (checkpoint resume)
    batch2 = generate_pages(80, seed=22)
    batch2["url"] = batch2["url"] + "#b2"
    _write_batch(batch2, os.path.join(stream_dirs["in"], "b2.parquet"))
    q2 = ingest.start_extraction_stream(
        ingest.read_page_stream(spark, stream_dirs["in"]),
        stream_dirs["out"], stream_dirs["ckpt"], n_buckets=8)
    q2.awaitTermination(180)
    out2 = spark.read.parquet(stream_dirs["out"]).toPandas()
    assert len(out2) == 200
    assert out2["url"].is_unique  # no reprocessing of batch 1


def test_stream_metrics_windows(spark, stream_dirs):
    """Append mode + watermark: only CLOSED windows (older than
    max_event_time − watermark) are emitted; the tail stays in state until
    later arrivals advance the watermark. Assert exactly that contract."""
    batch = generate_pages(200, seed=23)
    _write_batch(batch, os.path.join(stream_dirs["in"], "m1.parquet"))
    q = ingest.start_metrics_stream(
        ingest.read_page_stream(spark, stream_dirs["in"]),
        stream_dirs["mout"], stream_dirs["mckpt"], window="1 hour",
        watermark="2 hours")
    q.awaitTermination(180)
    m = spark.read.parquet(stream_dirs["mout"]).toPandas()

    ts = batch["warc_ts"]
    frontier = ts.max() - pd.Timedelta(hours=2)
    closed = ts.dt.floor("h") < frontier.floor("h")
    expected_docs = int(closed.sum())
    assert m["docs"].sum() == expected_docs
    assert expected_docs > 0
    # per-(window, lang) counts of the closed windows match the fixture
    exp = (batch[closed].groupby([ts[closed].dt.floor("h"), "lang"])
           .size().rename("docs").reset_index())
    got = m.groupby([m["window_start"].dt.tz_localize("UTC"), "lang"])["docs"].sum()
    for _, row in exp.iterrows():
        assert got.get((row["warc_ts"], row["lang"]), 0) == row["docs"]
    assert (m["bytes"] > 0).all()

    # a later batch advances the watermark → previously held windows flush
    late = generate_pages(40, seed=24)
    late["warc_ts"] = late["warc_ts"] + pd.Timedelta(days=2)
    late["url"] = late["url"] + "#late"
    _write_batch(late, os.path.join(stream_dirs["in"], "m2.parquet"))
    q2 = ingest.start_metrics_stream(
        ingest.read_page_stream(spark, stream_dirs["in"]),
        stream_dirs["mout"], stream_dirs["mckpt"], window="1 hour",
        watermark="2 hours")
    q2.awaitTermination(180)
    m2 = spark.read.parquet(stream_dirs["mout"]).toPandas()
    assert m2["docs"].sum() == 200  # batch-1 windows now fully emitted


def test_stream_exact_dedup_across_batches(spark, stream_dirs):
    """Duplicates must be dropped ACROSS micro-batches (state store), not
    just within one; first arrival wins; distinct texts all survive."""
    b1 = generate_pages(60, seed=25)
    _write_batch(b1, os.path.join(stream_dirs["in"], "d1.parquet"))
    q = ingest.start_dedup_stream(
        ingest.read_page_stream(spark, stream_dirs["in"]),
        stream_dirs["out"], stream_dirs["ckpt"], watermark="30 days")
    q.awaitTermination(180)
    out1 = spark.read.parquet(stream_dirs["out"]).toPandas()
    n_distinct_b1 = b1["text"].fillna("").nunique()
    assert len(out1) == n_distinct_b1

    # batch 2: half exact duplicates of batch-1 texts (same event times →
    # inside the watermark → must be dropped), half genuinely new
    b2 = generate_pages(40, seed=26)
    b2.loc[:19, "text"] = b1["text"].iloc[:20].values
    # aligned-index assignment keeps the (tz-aware) datetime dtype intact
    b2.loc[:19, "warc_ts"] = b1["warc_ts"].iloc[:20].set_axis(range(20))
    b2["url"] = b2["url"] + "#d2"
    _write_batch(b2, os.path.join(stream_dirs["in"], "d2.parquet"))
    q2 = ingest.start_dedup_stream(
        ingest.read_page_stream(spark, stream_dirs["in"]),
        stream_dirs["out"], stream_dirs["ckpt"], watermark="30 days")
    q2.awaitTermination(180)
    out2 = spark.read.parquet(stream_dirs["out"]).toPandas()
    assert len(out2) == n_distinct_b1 + len(
        set(b2["text"].fillna("").iloc[20:]) - set(b1["text"].fillna("")))
    # every batch-1 duplicate was suppressed by the cross-batch state store
    dup_urls = set(b2["url"].iloc[:20])
    assert not any(u in dup_urls for u in out2["url"])
