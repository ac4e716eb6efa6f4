"""Cross-snapshot crawl diff (operators/snapshots.py)."""
from __future__ import annotations

from ocr_system_spark.operators.snapshots import crawl_diff, crawl_diff_counts


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
