"""Readers for the driver-provided testdata tables and a deterministic
pages-table view built from ``documents``.

The driver's DuckDB oracle can only see the pre-registered parquet views
(region…documents/embeddings), so operator queries that exercise the
extraction pipeline build their pages input FROM ``documents`` with pure
JVM-side expressions (concat/encode) — both engines can reconstruct the
exact same input, making independent oracles possible.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# HTML template pieces for pages_from_documents — ONE main-content paragraph
# surrounded by link-dense boilerplate chrome. Kept in sync with the SQL
# oracle expectation: extracted main text == documents.text verbatim
# (documents.text is single-spaced, so whitespace normalization is a no-op).
HTML_PREFIX = (
    '<html><head><title>doc</title><script>var x=1;</script></head><body>'
    '<header><h1>Corpus Portal</h1><nav><ul>'
    '<li><a href="/home">Home</a></li><li><a href="/about">About Us</a></li>'
    '<li><a href="/contact">Contact</a></li><li><a href="/terms">Terms</a></li>'
    '</ul></nav></header><main><article><p>'
)
HTML_SUFFIX = (
    '</p></article></main><footer><p><a href="/privacy">Privacy</a> | '
    '<a href="/sitemap">Sitemap</a> | © 2024 Corpus Inc.</p></footer>'
    '</body></html>'
)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, …) → pages(url, warc_ts, html, text, lang).

    Deterministic, expression-only (no UDF): url from doc_id, warc_ts from a
    fixed epoch + doc_id·137 s, html = boilerplate-wrapped text.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.format_string("https://docs.example/%s/doc%d", F.col("lang"), F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 137).alias("warc_ts"),
        F.encode(
            F.concat(F.lit(HTML_PREFIX), F.col("text"), F.lit(HTML_SUFFIX)), "UTF-8"
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )
