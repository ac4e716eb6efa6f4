"""W1 filter operator, custom-column UDF slot, CSV sink."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ocr_system_spark.operators.extract import (
    extract_fields, has_data_filter, with_custom_column)
from ocr_system_spark.plans.sinks import export_csv
from tests.test_pipeline_e2e import pages_df


def test_has_data_filter_drops_empty_rows(spark, pages_fixture, golden_fields):
    pages = pages_df(spark, pages_fixture.head(300))
    res = extract_fields(pages)
    kept = has_data_filter(res).toPandas()
    # expected from goldens: any of licenses/address/start/end non-blank
    g = golden_fields.head(300).fillna("")
    exp = g[(g["licenses"].str.strip() != "") | (g["address"].str.strip() != "")
            | (g["start_date"].str.strip() != "") | (g["end_date"].str.strip() != "")]
    assert set(kept["url"]) == set(exp["url"])
    assert len(kept) < 300  # the filter actually drops something


def test_custom_column_slot(spark, pages_fixture):
    pages = pages_df(spark, pages_fixture.head(50))
    res = extract_fields(pages)

    def my_rule(rows: pd.DataFrame) -> pd.Series:
        return rows["licenses"].fillna("").str.len().astype(str) + "!"

    out = with_custom_column(res, my_rule, name="custom").toPandas()
    assert (out["custom"] == out["licenses"].fillna("").str.len().astype(str) + "!").all()


def test_csv_sink_roundtrip(spark, pages_fixture, tmp_path):
    pages = pages_df(spark, pages_fixture.head(40))
    res = extract_fields(pages)
    path = str(tmp_path / "out_csv")
    export_csv(res, path, single_file=True)
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == 40
    assert "license_id" in back.columns
