"""Sessionization: batch (window) form vs hand-computed expectation, and
the applyInPandasWithState streaming form vs the batch form (the batch
result over the same finite input IS the oracle for the stream)."""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest
from pyspark.sql import types as T

from ocr_system_spark.streaming import sessionize

T0 = datetime(2024, 6, 1, 12, 0, 0)

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("user_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("value", T.DoubleType(), True),
])


def _events():
    rows = []
    eid = 0

    def add(user, minutes, value):
        nonlocal eid
        rows.append((eid, user, T0 + timedelta(minutes=minutes), float(value)))
        eid += 1

    # user 1: two sessions (gap 45 min > 30)
    for m in (0, 5, 20):
        add(1, m, 1.0)
    for m in (65, 70):
        add(1, m, 2.0)
    # user 2: one long session, events 25 min apart (chained, never >30 gap)
    for m in (0, 25, 50, 75):
        add(2, m, 1.5)
    # user 3: single event
    add(3, 10, 9.0)
    return pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])


EXPECTED = {
    (1, T0 + timedelta(minutes=0), T0 + timedelta(minutes=20), 3, 3.0),
    (1, T0 + timedelta(minutes=65), T0 + timedelta(minutes=70), 2, 4.0),
    (2, T0 + timedelta(minutes=0), T0 + timedelta(minutes=75), 4, 6.0),
    (3, T0 + timedelta(minutes=10), T0 + timedelta(minutes=10), 1, 9.0),
}


def _as_set(pdf: pd.DataFrame):
    return {
        (int(r.user_id), r.session_start.to_pydatetime().replace(tzinfo=None),
         r.session_end.to_pydatetime().replace(tzinfo=None),
         int(r.n_events), float(r.total_value))
        for r in pdf.itertuples()
    }


def test_sessionize_batch_known_answer(spark):
    df = spark.createDataFrame(_events(), schema=EVENTS_SCHEMA)
    out = sessionize.sessionize_batch(df, gap_min=30).toPandas()
    assert _as_set(out) == EXPECTED


def test_sessionize_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    ev = _events()
    ev.to_parquet(os.path.join(in_dir, "b1.parquet"), index=False,
                  coerce_timestamps="us", allow_truncated_timestamps=True)

    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .format("parquet").load(in_dir))
    q = sessionize.sessionize_stream(stream, gap_min=30).writeStream \
        .format("parquet").option("path", str(tmp_path / "out")) \
        .option("checkpointLocation", str(tmp_path / "ckpt")) \
        .outputMode("append").trigger(availableNow=True).start()
    q.awaitTermination(180)

    got1 = spark.read.parquet(str(tmp_path / "out")).toPandas()
    # only sessions CLOSED by a successor event are emitted in round 1
    # (user 1's first session); open sessions wait on the watermark
    assert _as_set(got1) <= EXPECTED

    # a far-future event advances the watermark → all old sessions flush
    flush = pd.DataFrame(
        [(999, 99, T0 + timedelta(days=3), 0.0)],
        columns=["event_id", "user_id", "ts", "value"])
    flush.to_parquet(os.path.join(in_dir, "b2.parquet"), index=False,
                     coerce_timestamps="us", allow_truncated_timestamps=True)
    q2 = sessionize.sessionize_stream(
        (spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(in_dir)),
        gap_min=30).writeStream \
        .format("parquet").option("path", str(tmp_path / "out")) \
        .option("checkpointLocation", str(tmp_path / "ckpt")) \
        .outputMode("append").trigger(availableNow=True).start()
    q2.awaitTermination(180)

    got2 = spark.read.parquet(str(tmp_path / "out")).toPandas()
    assert EXPECTED <= _as_set(got2)
    # and the stream agrees with the batch operator on the same input
    batch = sessionize.sessionize_batch(
        spark.createDataFrame(_events(), schema=EVENTS_SCHEMA), gap_min=30
    ).toPandas()
    assert _as_set(batch) == EXPECTED
