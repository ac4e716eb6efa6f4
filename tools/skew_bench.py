"""Skew-split evidence: measure, don't assume (SURVEY §7.3.6).

Builds a pages table where a handful of documents are ~300× median size
(the web's heavy-tail reality), then times the fused extraction job twice
on the same input and parallelism:

  A) skew-split OFF — oversize blobs salt into the normal bucket space, so
     whichever partitions draw them become stragglers;
  B) skew-split ON  — rows with payloads > threshold re-salt into dedicated
     finer buckets (plans/pipeline.with_buckets), bounding every normal
     partition's work.

Prints one JSON line with both times + per-partition max task skew, and
appends the table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# a heavy-tail corpus: ~2% of docs are ~60× median — enough oversize mass
# that several blobs land in the same salt bucket by birthday collision,
# which is exactly the straggler hazard the re-salt removes
N_PAGES = 8000
N_SKEW = 160
SKEW_FACTOR = 60


def main() -> None:
    from ocr_system_spark.plans.pipeline import extract_all, with_buckets
    from ocr_system_spark.session import get_spark
    from ocr_system_spark.sources.pages import generate_pages

    tmp = tempfile.mkdtemp(prefix="skew_pages_")
    pages_path = os.path.join(tmp, "pages.parquet")
    pdf = generate_pages(N_PAGES, seed=88, skew_rows=N_SKEW, skew_factor=SKEW_FACTOR)
    pdf[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
        pages_path, index=False, coerce_timestamps="us",
        allow_truncated_timestamps=True)

    spark = get_spark(cores=CORES, app_name="skew_bench",
                      shuffle_partitions=CORES * 2)
    pages = spark.read.parquet(pages_path).repartition(64).cache()
    n = pages.count()
    sizes = pages.select(F.length("html").alias("l")).agg(
        F.max("l").alias("mx"), F.expr("percentile_approx(l, 0.5)").alias("md")
    ).collect()[0]
    print(f"pages: {n}, median html {sizes['md']}B, max {sizes['mx']}B",
          file=sys.stderr)

    def run(skew_split: bool) -> float:
        # skew_bytes=1<<62 disables the split (nothing qualifies)
        threshold = (1 << 16) if skew_split else (1 << 62)
        bucketed = with_buckets(pages, n_buckets=CORES * 2,
                                skew_bytes=threshold, skew_buckets=CORES)
        res = extract_all(bucketed.repartition(CORES * 2, "bucket_id"))
        t0 = time.perf_counter()
        assert res.agg(F.count(F.lit(1))).collect()[0][0] == n
        return time.perf_counter() - t0

    def bucket_load(skew_split: bool) -> dict:
        """The memory-bounding evidence: bytes the heaviest NORMAL bucket
        must hold in one task's Arrow stream, with and without the re-salt.
        At 100 TB this is the OOM-vs-not difference; wall-time effects at
        sandbox blob sizes are secondary."""
        threshold = (1 << 16) if skew_split else (1 << 62)
        bucketed = with_buckets(pages, n_buckets=CORES * 2,
                                skew_bytes=threshold, skew_buckets=CORES)
        per = (bucketed.groupBy("bucket_id")
               .agg(F.sum(F.length("html")).alias("bytes"),
                    F.max(F.length("html")).alias("max_doc"))
               .collect())
        normal = [r for r in per if r.bucket_id < CORES * 2]
        skew = [r for r in per if r.bucket_id >= CORES * 2]
        return {
            "max_normal_bucket_bytes": max(r.bytes for r in normal),
            "mean_normal_bucket_bytes": int(
                sum(r.bytes for r in normal) / len(normal)),
            "n_skew_buckets_used": len(skew),
            "max_skew_bucket_bytes": max((r.bytes for r in skew), default=0),
        }

    # warm (workers + cache), untimed
    run(True)
    t_off = round(run(False), 3)
    t_on = round(run(True), 3)
    load_off = bucket_load(False)
    load_on = bucket_load(True)
    out = {
        "n_pages": n, "n_skew_docs": N_SKEW, "skew_factor": SKEW_FACTOR,
        "median_html_bytes": int(sizes["md"]), "max_html_bytes": int(sizes["mx"]),
        "sec_without_skew_split": t_off, "sec_with_skew_split": t_on,
        "speedup": round(t_off / t_on, 3),
        "bucket_load_without_split": load_off,
        "bucket_load_with_split": load_on,
        "normal_bucket_imbalance_without_split": round(
            load_off["max_normal_bucket_bytes"]
            / max(load_off["mean_normal_bucket_bytes"], 1), 2),
        "normal_bucket_imbalance_with_split": round(
            load_on["max_normal_bucket_bytes"]
            / max(load_on["mean_normal_bucket_bytes"], 1), 2),
    }
    print(json.dumps(out))

    bench = REPO / "BENCH" / "BASELINE.md"
    if bench.exists():
        imb_off = out["normal_bucket_imbalance_without_split"]
        imb_on = out["normal_bucket_imbalance_with_split"]
        with open(bench, "a") as f:
            f.write(f"""
## Skew-split evidence (oversize-blob re-salt — measured, not assumed)

{N_PAGES} pages with {N_SKEW} planted ~{SKEW_FACTOR}× blobs
(median {out['median_html_bytes']} B, max {out['max_html_bytes']} B),
same job and parallelism (local[{CORES}]):

| variant | wall sec | max normal-bucket bytes | normal-bucket imbalance (max/mean) |
|---|---|---|---|
| split OFF | {t_off} | {load_off['max_normal_bucket_bytes']:,} | {imb_off}× |
| split ON  | {t_on} | {load_on['max_normal_bucket_bytes']:,} | {imb_on}× |

With the re-salt, no normal bucket ever holds an oversize blob: the
heaviest normal task's byte load drops {round(load_off['max_normal_bucket_bytes']/max(load_on['max_normal_bucket_bytes'],1),2)}×
and bucket loads flatten ({imb_off}× → {imb_on}× max/mean). At sandbox blob
sizes (~{out['max_html_bytes']//1024} KB) the wall-time effect is small
({out['speedup']}×); at crawl scale (100 MB pages, GB-scale buckets) the
same mechanism is the OOM-vs-not and straggler bound — the per-task byte
ceiling is what matters. Reproduce: `python tools/skew_bench.py`.
""")
    spark.stop()


if __name__ == "__main__":
    main()
