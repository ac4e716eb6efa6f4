"""Volume check for the host-graph PageRank: 1M hosts, ~4M weighted
edges, 3 fused iterations — evidence that the operator's cost scales
with the HOST graph (as documented), not with any document corpus, and
that the integer mass-conservation bound holds at volume.

Edges are a deterministic expander-ish graph: host i links to
(i·k + c_k) mod N for k in 1..4 (self-loops dropped by host_edges).
Checks: output cardinality = N hosts; total rank mass within the
documented drop bound (≤ 1 unit/edge + DAMP_DEN/node + 1/node init
loss per iteration); wall time per iteration.

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

N_HOSTS = int(os.environ.get("PAGERANK_VOLUME_HOSTS", 1_000_000))
N_ITER = 3


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_system_spark.operators.linkgraph import (
        DAMP_DEN,
        RANK_SCALE,
        host_edges,
        pagerank,
    )
    from ocr_system_spark.session import get_spark

    spark = get_spark(cores=8, app_name="pagerank_volume",
                      shuffle_partitions=16)
    base = spark.range(N_HOSTS)
    links = base.select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("src"),
        F.explode(F.array(*[
            (F.col("id") * k + 7 * k + 1) % N_HOSTS for k in (2, 3, 5, 7)
        ])).alias("d")).select(
        "src", F.concat(F.lit("h"), F.col("d").cast("string")).alias("dst"))
    edges = host_edges(links).persist()
    n_edges = edges.count()

    t0 = time.perf_counter()
    out = pagerank(edges, n_iter=N_ITER)
    agg = out.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rank_micro").alias("mass")).collect()[0]
    wall = round(time.perf_counter() - t0, 3)

    n, mass = int(agg["n"]), int(agg["mass"])
    assert n == N_HOSTS, n
    # init loses <= N units (scale//N floor); each iteration drops
    # < 1/edge (contribution floor) + DAMP_DEN/node (damping floor)
    lower = RANK_SCALE - N_HOSTS - N_ITER * (n_edges + DAMP_DEN * N_HOSTS)
    assert lower <= mass <= RANK_SCALE, (mass, lower)
    print(json.dumps({
        "metric": f"pagerank volume ({N_HOSTS} hosts, {n_edges} edges, "
                  f"{N_ITER} fused iterations)",
        "hosts": n,
        "edges": n_edges,
        "mass_retained": round(mass / RANK_SCALE, 6),
        "sec_total": wall,
        "sec_per_iter": round(wall / N_ITER, 3),
        "loadavg": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
