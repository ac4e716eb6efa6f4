"""Bucketed-table layout for co-located joins — the storage-level answer to
repeated large-×-large joins at 100 TB.

A join between two tables bucketed (and sorted) on the join key by the SAME
bucket count is exchange-free: every task reads bucket i of both sides and
sort-merge-joins them locally. At crawl scale that converts the two biggest
shuffles of a repeated enrichment workload (e.g. results ⋈ lineage,
pages ⋈ labels) into pure scans — paid ONCE at write time instead of on
every query.

This mirrors the pipeline's runtime salting (plans/pipeline.with_buckets):
with_buckets decides the bucket at execution time for one pass; bucketBy
persists the same decision into the table layout for every future pass.

Spark bucketing requires the table catalog (saveAsTable), not bare parquet
paths; `spark.sql.sources.bucketing.enabled` is on by default.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_cols: List[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) catalog table. Sorting within
    buckets lets the co-located join skip its local sort too."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    w = w.sortBy(*(sort_cols or [bucket_col]))
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With matching
    layouts Catalyst plans a SortMergeJoin with NO Exchange on either side
    (pin: tests/test_plan_quality.py::test_bucketed_join_is_exchange_free)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
