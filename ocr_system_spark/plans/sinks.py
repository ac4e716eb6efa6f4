"""Result sinks (reference K1/K2: append-mode CSV with header, CSV/XLSX
export — /root/reference/ocr/csv_utils.py:8-16, gui/app.py:106-112).

Parquet partitioned by bucket is the primary sink (plans/pipeline.py); CSV
is the report/export path. XLSX is out of scope (openpyxl not in the
container and not a distributed format)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_csv(results: DataFrame, path: str, mode: str = "overwrite",
               single_file: bool = False) -> None:
    """results → CSV with header. ``single_file`` coalesces to one part —
    the reference's one-file export; leave False at scale."""
    df = results.drop("spans") if "spans" in results.columns else results
    out = df.coalesce(1) if single_file else df
    (out.write.mode(mode)
        .option("header", "true")
        .option("emptyValue", "")
        # extracted_text contains newlines: quote+escape everything so the
        # file round-trips (readers must set multiLine=true)
        .option("quoteAll", "true")
        .option("escape", '"')
        .csv(path))


def append_csv(results: DataFrame, path: str) -> None:
    """Append-mode CSV (reference writes header only when the file is new;
    Spark's csv source writes a header per part-file, which readers handle)."""
    export_csv(results, path, mode="append")
