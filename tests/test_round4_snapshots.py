"""Cross-snapshot crawl diff (operators/snapshots.py) and the
host-disjoint split composition."""
from __future__ import annotations

from pyspark.sql import functions as F

from ocr_system_spark.operators.sampling import with_split
from ocr_system_spark.operators.snapshots import crawl_diff, crawl_diff_counts


class TestHostDisjointSplit:
    def test_every_host_lands_in_exactly_one_split(self, spark):
        df = spark.createDataFrame(
            [(i, "h%d" % (i % 7)) for i in range(70)],
            "doc_id long, host string")
        out = with_split(df, id_col="host", holdout_sixteenths=2)
        per_host = (out.groupBy("host")
                    .agg(F.countDistinct("split").alias("k")).collect())
        assert all(r["k"] == 1 for r in per_host)
        assert {r["split"] for r in out.select("split").distinct().collect()} \
            <= {"train", "holdout"}


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, fp string")


class TestCrawlDiff:
    def test_all_four_statuses(self, spark):
        old = _snap(spark, [("a", "1"), ("b", "2"), ("c", "3"), ("d", "4")])
        new = _snap(spark, [("a", "1"), ("b", "9"), ("d", "4"), ("e", "5")])
        got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
        assert got == {"a": "unchanged", "b": "changed", "c": "gone",
                       "d": "unchanged", "e": "added"}

    def test_null_fingerprints_compare_null_safe(self, spark):
        old = _snap(spark, [("a", None), ("b", None)])
        new = _snap(spark, [("a", None), ("b", "x")])
        got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
        assert got == {"a": "unchanged", "b": "changed"}

    def test_counts(self, spark):
        old = _snap(spark, [("a", "1"), ("b", "2")])
        new = _snap(spark, [("a", "1"), ("c", "3")])
        got = {r["status"]: r["n"]
               for r in crawl_diff_counts(old, new).collect()}
        assert got == {"unchanged": 1, "gone": 1, "added": 1}

    def test_no_cartesian(self, spark):
        old = _snap(spark, [("a", "1")])
        new = _snap(spark, [("a", "1")])
        p = crawl_diff(old, new)._sc._jvm.PythonSQLUtils.explainString(
            crawl_diff(old, new)._jdf.queryExecution(), "formatted")
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
