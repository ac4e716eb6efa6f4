"""Scaling evidence for the SHUFFLE-heavy path: the duplicate-line
removal job (two-level frequency aggregation + broadcast mark join +
per-doc rebuild) at two parallelism levels (the honest 2->8 gate span) on one box, for BOTH rebuild strategies.

The north-rule gate evidence (BENCH/BASELINE.md) uses the fused
extraction job — a map-dominated pipeline.  This tool runs the same
N→4N comparison for a job whose cost IS the shuffle machinery, so the
claim "the engine's decomposition scales" covers both path shapes.
Same discipline as tools/scaling_bench.py: one untimed warm pass per
level, two timed passes, per-level wall = minimum (co-tenant box).

Prints one JSON line; record results in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = 1_000_000
POOL = 40
CONTENT_LINES = 12
BOILER_EVERY = 3
LEVELS = [2, 8]
PASSES = 2


def build(spark):
    from pyspark.sql import functions as F

    docs = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))

    def line_expr(j: int):
        if j % (BOILER_EVERY + 1) == BOILER_EVERY:
            return F.concat(F.lit("pool boilerplate line "),
                            ((F.col("doc_id") + j) % POOL).cast("string"))
        return F.concat(F.lit("doc "), F.col("doc_id").cast("string"),
                        F.lit(f" line {j}"))

    n_slots = CONTENT_LINES + CONTENT_LINES // BOILER_EVERY
    text = F.concat_ws("\n", *[line_expr(j) for j in range(n_slots)])
    return docs.select("doc_id", text.alias("text"))


def run_once(spark, mode: str) -> None:
    from pyspark.sql import functions as F

    from ocr_system_spark.operators.lines import remove_duplicate_lines

    df = build(spark)
    agg = remove_duplicate_lines(df, min_docs=1000, rebuild=mode).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_removed").alias("removed")).collect()[0]
    assert agg["docs"] == N_DOCS, agg
    assert agg["removed"] == N_DOCS * (CONTENT_LINES // BOILER_EVERY), agg


def main() -> None:
    from ocr_system_spark.session import get_spark

    results = {}
    for cores in LEVELS:
        spark = get_spark(cores=cores, app_name=f"lines_scale_{cores}",
                          shuffle_partitions=max(cores * 2, 8))
        per_mode = {}
        for mode in ("local", "join"):
            run_once(spark, mode)            # warm (worker fork, codegen)
            walls = []
            for _ in range(PASSES):
                t0 = time.perf_counter()
                run_once(spark, mode)
                walls.append(round(time.perf_counter() - t0, 3))
            per_mode[mode] = {"best": min(walls), "walls": walls,
                              "docs_per_sec": round(N_DOCS / min(walls), 1)}
        results[cores] = per_mode
        spark.stop()

    spans = {mode: round((results[2][mode]["best"]
                          / results[8][mode]["best"]) / 4.0, 3)
             for mode in ("local", "join")}
    print(json.dumps({
        "metric": "line_dedup scaling, local vs join rebuild (1M docs)",
        "levels": results,
        "span_2_to_8_efficiency": spans,
        "loadavg": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
