"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes one DataFrame callable per implemented operator from
SURVEY.md §2 (plus the training-data-pipeline operators); ``oracle_sql()``
gives the DuckDB-runnable ANSI equivalent for every SQL-expressible one.

Oracle strategy for the extraction kernels: queries that exercise the real
Python-re/numpy kernels run over text that is deterministically ENRICHED
from ``documents`` with known field snippets built from ``doc_id`` — so the
DuckDB oracle can compute the expected extraction results INDEPENDENTLY
(from doc_id arithmetic), not by re-running the kernel. Byte-identity with
the reference extractor itself is covered separately by the pytest golden
suite (tests/test_fields_golden.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from ocr_system_spark.session import ensure_package_on_executors  # noqa: E402
from ocr_system_spark.sources import tables  # noqa: E402


# ---------------------------------------------------------------------------
# deterministic enrichment: documents.text + known snippets from doc_id
# ---------------------------------------------------------------------------

def _enriched_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    i = F.col("doc_id")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" LIC-"), ((i * 37) % 90000 + 10000).cast("string"),
            F.lit(" issued "), F.lpad((i % 28 + 1).cast("string"), 2, "0"), F.lit("/05/2024"),
            F.lit(" REF-AB"), ((i * 13) % 9000 + 1000).cast("string"),
            F.lit(" Telecommunication Tower at "), (i % 400 + 1).cast("string"),
            F.lit(" Main St, Zone "), (i % 9 + 1).cast("string"),
            F.lit(" situated in province"),
            F.lit(" valid from "), (i % 27 + 1).cast("string"),
            F.lit("th May 2025 to 12.06.2026"),
            F.lit(" No. "), (i % 9999 + 1).cast("string"),
            F.lit(" (R"), (i % 98 + 1).cast("string"), F.lit(")"),
        ).alias("text"),
    )


_ENRICH_SQL = """
    SELECT doc_id,
           text
           || ' LIC-'  || CAST(doc_id*37 % 90000 + 10000 AS VARCHAR)
           || ' issued ' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '/05/2024'
           || ' REF-AB' || CAST(doc_id*13 % 9000 + 1000 AS VARCHAR)
           || ' Telecommunication Tower at ' || CAST(doc_id % 400 + 1 AS VARCHAR)
           || ' Main St, Zone ' || CAST(doc_id % 9 + 1 AS VARCHAR)
           || ' situated in province'
           || ' valid from ' || CAST(doc_id % 27 + 1 AS VARCHAR)
           || 'th May 2025 to 12.06.2026'
           || ' No. ' || CAST(doc_id % 9999 + 1 AS VARCHAR)
           || ' (R' || CAST(doc_id % 98 + 1 AS VARCHAR) || ')'
           AS text
    FROM documents
"""


def _keyed_kernel(df: DataFrame, out_fields: list[str], batch_fn) -> DataFrame:
    """Run a pandas batch kernel over (doc_id, text|html) keyed by doc_id."""
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
        + [T.StructField(f, T.StringType(), True) for f in out_fields]
    )

    def run(batches):
        for pdf in batches:
            out = batch_fn(pdf)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id"] + out_fields]

    return df.mapInPandas(run, schema=schema)


def _static_fields_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_system_spark.operators.extract import extract_fields_batch

    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        tmp = pdf.rename(columns={"doc_id": "url"})
        tmp["url"] = tmp["url"].astype(str)
        return extract_fields_batch(tmp).drop(columns=["url"])

    return _keyed_kernel(
        _enriched_docs(spark, sf_dir),
        ["license_id", "date", "reference_id", "address",
         "start_date", "end_date", "licenses", "renew_times", "notes"],
        batch,
    )


# ---------------------------------------------------------------------------
# entry — flagship pipeline on sf0.001
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Pages built from sf0.001 documents → full fused extraction pipeline
    (bucketed, skew-aware) → results DataFrame."""
    ensure_package_on_executors(spark)
    from ocr_system_spark.plans.pipeline import extract_all, with_buckets

    pages = tables.pages_from_documents(spark, "/root/testdata/sf0.001")
    bucketed = with_buckets(pages, n_buckets=8, skew_bytes=1 << 20)
    return extract_all(bucketed)


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- extraction tier: real kernels, independent oracles --------------

    def q_html_main_extract(spark, sf_dir):
        ensure_package_on_executors(spark)
        from ocr_system_spark.operators.payload import extract_text_batch

        pages = tables.pages_from_documents(spark, sf_dir)

        def batch(pdf):
            out = extract_text_batch(pdf.rename(columns={"doc_id": "url"})
                                     .assign(url=lambda x: x["url"].astype(str)))
            return out[["extracted_text"]]

        return _keyed_kernel(pages.select("doc_id", "html"), ["extracted_text"], batch)

    q["html_main_extract"] = q_html_main_extract

    def _mk_field_query(col):
        def fn(spark, sf_dir):
            ensure_package_on_executors(spark)
            return _static_fields_df(spark, sf_dir).select("doc_id", col)
        return fn

    for col in ["license_id", "date", "reference_id", "address",
                "start_date", "end_date", "licenses", "renew_times"]:
        q[f"field_{col}"] = _mk_field_query(col)

    def q_static_fields_raw(spark, sf_dir):
        """Static projection over RAW documents text (catch-all patterns +
        W1 non-empty filter + notes errors-as-data)."""
        ensure_package_on_executors(spark)
        from ocr_system_spark.operators.extract import extract_fields_batch

        d = tables.load(spark, sf_dir, "documents").select("doc_id", "text")

        def batch(pdf):
            tmp = pdf.rename(columns={"doc_id": "url"})
            tmp["url"] = tmp["url"].astype(str)
            out = extract_fields_batch(tmp)
            return out[["license_id", "reference_id", "notes"]]

        return _keyed_kernel(d, ["license_id", "reference_id", "notes"], batch)

    q["static_fields_raw"] = q_static_fields_raw

    # ---- relational operators --------------------------------------------

    def q_agg_pricing(spark, sf_dir):
        li = tables.load(spark, sf_dir, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_base_price"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
                F.avg("l_discount").alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    q["agg_pricing"] = q_agg_pricing

    def q_join_broadcast(spark, sf_dir):
        o = tables.load(spark, sf_dir, "orders")
        c = tables.load(spark, sf_dir, "customer")
        return (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
            .groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice").alias("revenue"),
                 F.count(F.lit(1)).alias("n_orders"))
        )

    q["join_broadcast"] = q_join_broadcast

    def q_multi_join(spark, sf_dir):
        li = tables.load(spark, sf_dir, "lineitem")
        o = tables.load(spark, sf_dir, "orders")
        c = tables.load(spark, sf_dir, "customer")
        n = tables.load(spark, sf_dir, "nation")
        r = tables.load(spark, sf_dir, "region")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        )

    q["multi_join"] = q_multi_join

    def q_left_join_enrich(spark, sf_dir):
        """J1 shape: results left-join licenses ⇒ customer ⟕ orders."""
        c = tables.load(spark, sf_dir, "customer")
        o = tables.load(spark, sf_dir, "orders")
        agg = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("total"))
        return (
            c.join(agg, c.c_custkey == agg.o_custkey, "left")
            .select("c_custkey", F.coalesce(F.col("total"), F.lit(0.0)).alias("total_spent"))
        )

    q["left_join_enrich"] = q_left_join_enrich

    def q_semi_join(spark, sf_dir):
        c = tables.load(spark, sf_dir, "customer")
        o = tables.load(spark, sf_dir, "orders")
        return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")

    q["semi_join"] = q_semi_join

    def q_anti_join(spark, sf_dir):
        c = tables.load(spark, sf_dir, "customer")
        o = tables.load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
        return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")

    q["anti_join"] = q_anti_join

    def q_dedup_pairs(spark, sf_dir):
        d = tables.load(spark, sf_dir, "documents")
        return d.select("lang", "source").dropDuplicates()

    q["dedup_pairs"] = q_dedup_pairs

    def q_ordered_concat(spark, sf_dir):
        e = tables.load(spark, sf_dir, "events")
        return (
            e.groupBy("user_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                        lambda x: x["event_type"],
                    ),
                    ",",
                ).alias("event_seq")
            )
        )

    q["ordered_concat"] = q_ordered_concat

    def q_window_topk(spark, sf_dir):
        from pyspark.sql import Window as W
        e = tables.load(spark, sf_dir, "events")
        w = W.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
        return (
            e.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("event_type", "event_id", "rk")
        )

    q["window_topk"] = q_window_topk

    def q_sort_limit(spark, sf_dir):
        d = tables.load(spark, sf_dir, "documents")
        return (
            d.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
            .select("doc_id", "n_chars")
            .limit(10)
        )

    q["sort_limit"] = q_sort_limit

    def q_rollup(spark, sf_dir):
        li = tables.load(spark, sf_dir, "lineitem")
        return (
            li.rollup("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"))
        )

    q["rollup"] = q_rollup

    def q_union_distinct(spark, sf_dir):
        c = tables.load(spark, sf_dir, "customer")
        s = tables.load(spark, sf_dir, "supplier")
        return (
            c.select(F.col("c_nationkey").alias("nationkey"))
            .union(s.select(F.col("s_nationkey").alias("nationkey")))
            .distinct()
        )

    q["union_distinct"] = q_union_distinct

    def q_timestamp_window(spark, sf_dir):
        e = tables.load(spark, sf_dir, "events")
        return (
            e.filter(
                (F.col("ts") >= F.lit("2024-01-10"))
                & (F.col("ts") < F.lit("2024-01-20"))
            )
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
        )

    q["timestamp_window"] = q_timestamp_window

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    # extraction kernels vs INDEPENDENTLY computed expectations
    o["html_main_extract"] = (
        "SELECT doc_id, text AS extracted_text FROM documents"
    )
    o["field_license_id"] = (
        "SELECT doc_id, 'LIC-' || CAST(doc_id*37 % 90000 + 10000 AS VARCHAR) AS license_id FROM documents"
    )
    o["field_date"] = (
        "SELECT doc_id, lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '/05/2024' AS date FROM documents"
    )
    o["field_reference_id"] = (
        "SELECT doc_id, 'AB' || CAST(doc_id*13 % 9000 + 1000 AS VARCHAR) AS reference_id FROM documents"
    )
    o["field_address"] = (
        "SELECT doc_id, CAST(doc_id % 400 + 1 AS VARCHAR) || ' Main St, Zone ' || CAST(doc_id % 9 + 1 AS VARCHAR) AS address FROM documents"
    )
    o["field_start_date"] = (
        "SELECT doc_id, CAST(doc_id % 27 + 1 AS VARCHAR) || '.5.2025' AS start_date FROM documents"
    )
    o["field_end_date"] = (
        "SELECT doc_id, '12.06.2026' AS end_date FROM documents"
    )
    o["field_licenses"] = (
        "SELECT doc_id, 'NO. ' || CAST(doc_id % 9999 + 1 AS VARCHAR) || ' (R' || CAST(doc_id % 98 + 1 AS VARCHAR) || ')' AS licenses FROM documents"
    )
    o["field_renew_times"] = (
        "SELECT doc_id, CAST(doc_id % 98 + 1 AS VARCHAR) || ' times' AS renew_times FROM documents"
    )
    # raw-text static projection: DuckDB RE2 shadow of the priority chains
    o["static_fields_raw"] = """
        SELECT doc_id,
               COALESCE(
                 NULLIF(regexp_extract(text, '(?i)\\bLIC[-_\\s]?\\d{3,}\\b', 0), ''),
                 NULLIF(regexp_extract(text, '(?i)\\bLicense\\s*ID[:#-]*\\s*([A-Z0-9]{6,20})\\b', 1), ''),
                 NULLIF(regexp_extract(text, '(?i)\\b[A-Z0-9]{6,20}\\b', 0), '')
               ) AS license_id,
               COALESCE(
                 NULLIF(regexp_extract(text, '(?i)\\bREF[-_\\s]*([A-Z0-9]{4,10})\\b', 1), ''),
                 NULLIF(regexp_extract(text, '(?i)\\b(?:Reference|Ref)[\\s:#-]*([A-Z0-9-]{4,10})\\b', 1), ''),
                 NULLIF(regexp_extract(text, '(?i)\\b[A-Z0-9]{4,10}\\b', 0), '')
               ) AS reference_id,
               CASE WHEN
                 COALESCE(
                   NULLIF(regexp_extract(text, '(?i)\\bLIC[-_\\s]?\\d{3,}\\b', 0), ''),
                   NULLIF(regexp_extract(text, '(?i)\\bLicense\\s*ID[:#-]*\\s*([A-Z0-9]{6,20})\\b', 1), ''),
                   NULLIF(regexp_extract(text, '(?i)\\b[A-Z0-9]{6,20}\\b', 0), '')
                 ) IS NULL
                 AND regexp_extract(text, '(?i)\\b\\d{2}[/-]\\d{2}[/-]\\d{4}\\b', 0) = ''
                 AND regexp_extract(text, '(?i)\\b\\d{4}[/-]\\d{2}[/-]\\d{2}\\b', 0) = ''
                 AND COALESCE(
                   NULLIF(regexp_extract(text, '(?i)\\bREF[-_\\s]*([A-Z0-9]{4,10})\\b', 1), ''),
                   NULLIF(regexp_extract(text, '(?i)\\b(?:Reference|Ref)[\\s:#-]*([A-Z0-9-]{4,10})\\b', 1), ''),
                   NULLIF(regexp_extract(text, '(?i)\\b[A-Z0-9]{4,10}\\b', 0), '')
                 ) IS NULL
               THEN 'No patterns matched' ELSE NULL END AS notes
        FROM documents
    """

    # relational
    o["agg_pricing"] = """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               avg(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """
    o["join_broadcast"] = """
        SELECT c_mktsegment, sum(o_totalprice) AS revenue, count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """
    o["multi_join"] = """
        SELECT r_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """
    o["left_join_enrich"] = """
        SELECT c_custkey, COALESCE(t.total, 0.0) AS total_spent
        FROM customer
        LEFT JOIN (SELECT o_custkey, sum(o_totalprice) AS total
                   FROM orders GROUP BY o_custkey) t
               ON c_custkey = t.o_custkey
    """
    o["semi_join"] = """
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """
    o["anti_join"] = """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """
    o["dedup_pairs"] = "SELECT DISTINCT lang, source FROM documents"
    o["ordered_concat"] = """
        SELECT user_id,
               string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq
        FROM events GROUP BY user_id
    """
    o["window_topk"] = """
        SELECT event_type, event_id, CAST(rk AS INTEGER) AS rk FROM (
            SELECT event_type, event_id,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id) AS rk
            FROM events) t
        WHERE rk <= 3
    """
    o["sort_limit"] = """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 10
    """
    o["rollup"] = """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """
    o["union_distinct"] = """
        SELECT DISTINCT nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey FROM supplier)
    """
    o["timestamp_window"] = """
        SELECT event_type, count(*) AS n, avg(value) AS avg_value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          AND ts <  TIMESTAMP '2024-01-20 00:00:00'
        GROUP BY event_type
    """
    return o
