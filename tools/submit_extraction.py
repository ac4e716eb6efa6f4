"""spark-submit entry point for the extraction job — the north rule's
cluster deployment shape:

    # build the code artifact once
    python tools/submit_extraction.py --build-zip dist/

    # run on a cluster (any master: yarn, k8s, standalone)
    spark-submit \\
        --master yarn --deploy-mode cluster \\
        --num-executors 1000 --executor-cores 8 --executor-memory 16g \\
        --py-files dist/ocr_system_spark.zip \\
        --conf spark.executorEnv.PYTHONPATH=ocr_system_spark/_workerenv \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.sources.partitionOverwriteMode=dynamic \\
        tools/submit_extraction.py \\
        --input s3://bucket/crawl/pages --output s3://bucket/crawl/extracted \\
        --run-id crawl-2026-08 --n-buckets 16384

    # local smoke (this sandbox)
    python tools/submit_extraction.py --input <pages.parquet dir> \\
        --output /tmp/out --local-cores 8

Sizing notes for the 10^12-doc run: ``--n-buckets`` is the checkpoint/
retry granule — set it ≫ executor count (2^14 default) so a straggler
re-runs cheaply and the manifest table stays small; executors of 4-8 cores
are the measured sweet spot (BENCH/BASELINE.md: the engine matches bare
multiprocessing at that shape). Resume after ANY failure is re-running the
same command — completed buckets are skipped via the manifest anti-join.
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_zip(out_dir: str) -> str:
    """Package ocr_system_spark for --py-files."""
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, "ocr_system_spark.zip")
    pkg = REPO / "ocr_system_spark"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(pkg.rglob("*.py")):
            zf.write(f, f.relative_to(REPO))
    return zip_path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--build-zip", metavar="DIR",
                    help="write dist zip for --py-files and exit")
    ap.add_argument("--input", help="pages table path (parquet)")
    ap.add_argument("--output", help="output directory")
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--n-buckets", type=int, default=1 << 14)
    ap.add_argument("--skew-bytes", type=int, default=1 << 20)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--local-cores", type=int, default=None,
                    help="build a local[N] session instead of using the "
                         "spark-submit-provided one (sandbox smoke)")
    args = ap.parse_args()

    if args.build_zip:
        print(build_zip(args.build_zip))
        return
    if not args.input or not args.output:
        ap.error("--input and --output are required to run the job")

    from pyspark.sql import SparkSession

    from ocr_system_spark.plans.pipeline import run_extraction
    from ocr_system_spark.session import ensure_package_on_executors, get_spark

    if args.local_cores:
        spark = get_spark(cores=args.local_cores, app_name="extract_submit")
    else:
        # under spark-submit the master/resources come from the submit args;
        # run_extraction pins the overwrite mode it needs at the write itself
        spark = SparkSession.builder.appName("ocr_system_spark_extract").getOrCreate()
    ensure_package_on_executors(spark)

    pages = spark.read.parquet(args.input)
    summary = run_extraction(
        spark, pages, args.output,
        run_id=args.run_id,
        n_buckets=args.n_buckets,
        skew_bytes=args.skew_bytes,
        resume=not args.no_resume,
    )
    print(summary)


if __name__ == "__main__":
    main()
