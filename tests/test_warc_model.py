"""WARC source round-trip and the model-UDF extraction slot."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_system_spark.operators.model_extract import model_extract
from ocr_system_spark.sources import warc
from ocr_system_spark.sources.pages import generate_pages


def test_warc_roundtrip_through_pipeline(spark, tmp_path):
    pdf = generate_pages(60, seed=55)
    # pack the synthetic pages into two WARC files
    recs = [
        (r.url, r.warc_ts.to_pydatetime(), bytes(r.html))
        for r in pdf.itertuples()
    ]
    warc.write_synthetic_warc(str(tmp_path / "a.warc"), recs[:30])
    warc.write_synthetic_warc(str(tmp_path / "b.warc"), recs[30:])

    pages = warc.read_warc(spark, str(tmp_path / "*.warc"))
    got = pages.toPandas().sort_values("url").reset_index(drop=True)
    assert len(got) == 60
    exp = pdf.sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(exp["url"])
    assert all(bytes(a) == bytes(b) for a, b in zip(got["html"], exp["html"]))
    # timestamps survive (second precision in WARC-Date)
    assert got["warc_ts"].notna().all()

    # and the parsed pages feed the extraction pipeline directly
    from ocr_system_spark.plans.pipeline import extract_all, with_buckets
    res = extract_all(with_buckets(pages, n_buckets=8)).toPandas()
    assert len(res) == 60
    meta = pdf.set_index("url")
    for _, r in res.iterrows():
        if meta.at[r["url"], "payload_kind"] in ("html", "pdf"):
            assert r["extracted_text"] == meta.at[r["url"], "expected_main"]


def test_warc_malformed_records_skipped(spark, tmp_path):
    good = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://x.example/ok\r\n"
            b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 4\r\n\r\nBODY\r\n\r\n")
    junk = b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 3\r\n\r\nGET\r\n\r\n"
    broken = b"WARC/1.0\r\nWARC-Target-URI: no-type\r\nContent-Length: bogus\r\n\r\n"
    (tmp_path / "m.warc").write_bytes(junk + good + broken)
    got = warc.read_warc(spark, str(tmp_path / "m.warc")).toPandas()
    assert list(got["url"]) == ["https://x.example/ok"]
    assert bytes(got["html"][0]) == b"BODY"


def test_model_extract_validates_decodes(spark):
    pdf = pd.DataFrame({
        "url": ["a", "b", "c"],
        "text": [
            "permit LIC-4411 dated 12/05/2024 Ref: REF-AB99",
            "no extractable entities here at all",
            "weird LIC-X candidate only",  # candidate regex misses → None
        ],
    })
    df = spark.createDataFrame(pdf)
    out = model_extract(df).toPandas().set_index("url")
    assert out.at["a", "license_id"] == "LIC-4411"
    assert out.at["a", "date"] == "12/05/2024"
    assert out.at["a", "reference_id"] == "REF-AB99"
    assert out.loc["b"].isna().all()
    assert out.at["c", "license_id"] is None
