"""Volume check for the line-level curation family: 200k synthetic lined
documents (≈3.2M line occurrences) through duplicate-line removal at
local[32], with exact expected outputs asserted.

Construction (deterministic, known answer):
* 200k docs, 16 lines each: 12 unique content lines ("doc <i> line <j>")
  and 4 boilerplate pool lines drawn from a 40-line pool — every pool
  line lands in ~20k docs (hot at min_docs=1000 by construction; the hot
  set is exactly the 40 pool lines).
* Expected after removal: every doc keeps exactly its 12 unique lines;
  n_removed == 4 for every doc.

Prints one JSON line (wall seconds, docs/sec) for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = 200_000
POOL = 40
CONTENT_LINES = 12
BOILER_EVERY = 3          # a pool line after every 3rd content line → 4/doc


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_system_spark.operators.lines import hot_lines, remove_duplicate_lines
    from ocr_system_spark.session import get_spark

    spark = get_spark(cores=32, app_name="lines_volume",
                      shuffle_partitions=64)
    docs = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))

    def line_expr(j: int):
        if j % (BOILER_EVERY + 1) == BOILER_EVERY:
            # pool line: depends on (doc_id, slot) but only POOL variants
            return F.concat(F.lit("pool boilerplate line "),
                            ((F.col("doc_id") + j) % POOL).cast("string"))
        return F.concat(F.lit("doc "), F.col("doc_id").cast("string"),
                        F.lit(f" line {j}"))

    n_slots = CONTENT_LINES + CONTENT_LINES // BOILER_EVERY  # 16
    text = F.concat_ws("\n", *[line_expr(j) for j in range(n_slots)])
    df = docs.select("doc_id", text.alias("text")).repartition(64).cache()
    df.count()

    t0 = time.perf_counter()
    hot = hot_lines(df, min_docs=1000)
    n_hot = hot.count()
    out = remove_duplicate_lines(df, min_docs=1000)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_removed").alias("removed"),
        F.min("n_removed").alias("min_rm"),
        F.max("n_removed").alias("max_rm"),
        F.min("n_lines").alias("min_lines"),
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 3)

    assert n_hot == POOL, n_hot
    assert agg["docs"] == N_DOCS, agg
    assert agg["min_rm"] == agg["max_rm"] == n_slots - CONTENT_LINES, agg
    assert agg["removed"] == N_DOCS * (n_slots - CONTENT_LINES), agg
    assert agg["min_lines"] == n_slots, agg

    print(json.dumps({
        "metric": "line_dedup volume (200k docs, 3.2M lines, exact asserts)",
        "wall_sec": wall,
        "docs_per_sec": round(N_DOCS / wall, 1),
        "hot_lines": n_hot,
        "removed": int(agg["removed"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
