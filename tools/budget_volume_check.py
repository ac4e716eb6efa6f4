"""Volume + equivalence check for budget_sample's bucketed plan.

The operator's claim (operators/sampling.py): the three-step bucketed
plan — 256 ticket-range cells, grouped-bucket prefix sum, row-level
window over ONLY the boundary bucket — is exactly equivalent to the
naive per-group cumulative window, without ever pushing a whole group
through one window task.  This tool checks both halves at volume:

1. EXACT EQUIVALENCE: 5M rows with a dominant group (80% of the corpus
   in one group — the straggler case), bucketed result compared
   row-for-row against an inline naive one-window implementation.
2. The timing of each, for the record (on one box the naive window
   still completes — its failure mode is the single 4M-row window TASK,
   which a 10^12-row group turns into an OOM/straggler; the bucketed
   plan's largest window is ~1/256 of the group).

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

N_ROWS = int(os.environ.get("BUDGET_VOLUME_ROWS", 5_000_000))
BUDGETS = {"big": 40_000_000, "m1": 2_000_000}   # big group budget-bound
DEFAULT = 1_500_000


def build(spark):
    from pyspark.sql import functions as F

    # 80% of rows in group 'big', the rest spread over 4 minor groups
    return spark.range(N_ROWS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 5 < 4, F.lit("big"))
        .otherwise(F.concat(F.lit("m"), (F.col("id") % 3).cast("string")))
        .alias("grp"),
        (F.col("id") % 97 + 3).cast("long").alias("w"))


def naive(df, budgets, default):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ocr_system_spark.operators.sampling import md5_key

    budget = F.lit(default).cast("long")
    for g, b in sorted(budgets.items()):
        budget = F.when(F.col("grp") == g, F.lit(b).cast("long")) \
                  .otherwise(budget)
    w = (W.partitionBy("grp")
         .orderBy(md5_key(F.col("doc_id")).asc(), F.col("doc_id").asc())
         .rowsBetween(W.unboundedPreceding, 0))
    return (df.withColumn("_cum", F.sum(F.coalesce(F.col("w"), F.lit(0)))
                          .over(w))
            .filter(F.col("_cum") <= budget)
            .drop("_cum"))


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_system_spark.operators.sampling import budget_sample
    from ocr_system_spark.session import get_spark

    spark = get_spark(cores=8, app_name="budget_volume",
                      shuffle_partitions=16)
    df = build(spark).persist()
    df.count()

    def fingerprint(out):
        return (out.groupBy("grp")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("w").alias("sw"),
                     F.sum(F.col("doc_id") * F.col("w")).alias("sx"))
                .orderBy("grp").collect())

    t0 = time.perf_counter()
    bkt = fingerprint(budget_sample(df, "grp", BUDGETS, weight_col="w",
                                    default_budget=DEFAULT))
    t_bucketed = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    nv = fingerprint(naive(df, BUDGETS, DEFAULT))
    t_naive = round(time.perf_counter() - t0, 3)

    assert [tuple(r) for r in bkt] == [tuple(r) for r in nv], (bkt, nv)
    print(json.dumps({
        "metric": f"budget_sample bucketed-vs-naive at {N_ROWS} rows "
                  "(80% one group)",
        "equal": True,
        "groups": {r["grp"]: {"kept": r["n"], "kept_weight": r["sw"]}
                   for r in bkt},
        "sec_bucketed": t_bucketed,
        "sec_naive_single_window": t_naive,
        "loadavg": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
