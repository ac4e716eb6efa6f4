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


def with_winnow_fingerprint(df: DataFrame, text_col: str = "text",
                            out_col: str = "fingerprints") -> DataFrame:
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(texts: pd.Series) -> pd.Series:
        return K.winnow_fingerprint_batch(texts).map(
            lambda xs: [x - (1 << 64) if x >= (1 << 63) else x for x in xs]
        )

    return df.withColumn(out_col, udf(F.col(text_col)))
