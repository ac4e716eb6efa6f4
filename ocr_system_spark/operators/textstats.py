"""Spark operators over the text-analysis kernels (Arrow-batched)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocr_system_spark.functions import textstats as K


def with_langid(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    @F.pandas_udf(T.StringType())
    def udf(texts: pd.Series) -> pd.Series:
        return K.langid_batch(texts)

    return df.withColumn(out_col, udf(F.col(text_col)))


QUALITY_SCHEMA = T.StructType([
    T.StructField("n_chars", T.LongType(), False),
    T.StructField("n_words", T.LongType(), False),
    T.StructField("n_stopwords", T.LongType(), False),
    T.StructField("punct_ratio", T.DoubleType(), False),
    T.StructField("upper_ratio", T.DoubleType(), False),
])


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    @F.pandas_udf(QUALITY_SCHEMA)
    def udf(texts: pd.Series) -> pd.DataFrame:
        return K.quality_features_batch(texts)

    return df.withColumn("q", udf(F.col(text_col))).select("*", "q.*").drop("q")


TOKENS_SCHEMA = T.StructType([
    T.StructField("ws_tokens", T.LongType(), False),
    T.StructField("bpeish_tokens", T.LongType(), False),
])


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    @F.pandas_udf(TOKENS_SCHEMA)
    def udf(texts: pd.Series) -> pd.DataFrame:
        return K.token_count_batch(texts)

    return df.withColumn("t", udf(F.col(text_col))).select("*", "t.*").drop("t")


FP_STRUCT = T.ArrayType(T.StructType([
    T.StructField("pos", T.LongType(), False),
    T.StructField("fp", T.LongType(), False),
]))


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        window: int = 4) -> DataFrame:
    """Winnowing fingerprints as SCALAR rows (id, pos, fp) — one row per
    selected k-gram. Scalar output (not array<long>) so downstream joins,
    aggregations, and cross-engine comparison all work on plain columns."""
    @F.pandas_udf(FP_STRUCT)
    def udf(texts: pd.Series) -> pd.Series:
        return K.winnow_fingerprint_batch(texts, k, window).map(
            lambda xs: [{"pos": p, "fp": v} for p, v in xs]
        )

    return (
        df.select(F.col(id_col), F.explode(udf(F.col(text_col))).alias("s"))
        .select(id_col, F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
    )
