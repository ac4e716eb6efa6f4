"""No-Spark scaling control for the 8→32 span (BENCH/BASELINE.md).

Runs the EXACT extraction kernels (HTML main-content + regex fields) over
the same synthetic pages with bare multiprocessing — no JVM, no Arrow, no
shuffle. If this control shows the same 8→32 efficiency cliff as the Spark
job, the cliff is single-socket hardware (memory bandwidth / cache
contention between 32 CPython processes), not engine overhead.

    python tools/noSpark_scaling_control.py [n_pages]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
LEVELS = (2, 8, 32)


N_CHUNKS = 256


def work(args):
    """Generate this chunk's pages IN-PROCESS (no parent→child pickle pipe —
    a single feeder process caps throughput at ~8 workers and would masquerade
    as a scaling cliff), then run both extraction kernels."""
    seed, n = args
    from ocr_system_spark.operators.extract import extract_fields_batch
    from ocr_system_spark.operators.payload import extract_text_batch
    from ocr_system_spark.sources.pages import generate_pages
    chunk_pdf = generate_pages(n, seed=seed, heft=10)
    t = extract_text_batch(chunk_pdf[["url", "html"]])
    f = extract_fields_batch(chunk_pdf[["url", "text"]])
    return len(t) + len(f)


def main() -> None:
    per = N_PAGES // N_CHUNKS
    chunks = [(1000 + i, per) for i in range(N_CHUNKS)]

    out = {"n_pages": per * N_CHUNKS, "levels": {}, "spans": []}
    for lvl in LEVELS:
        with mp.Pool(lvl) as pool:
            pool.map(work, chunks[:lvl])          # warm fork+import
            t0 = time.perf_counter()
            pool.map(work, chunks)
            dt = time.perf_counter() - t0
        out["levels"][str(lvl)] = {
            "procs": lvl, "seconds": round(dt, 3),
            "docs_per_sec": round(per * N_CHUNKS / dt, 1),
        }
    for lo, hi in zip(LEVELS, LEVELS[1:]):
        s = out["levels"][str(lo)]["seconds"] / out["levels"][str(hi)]["seconds"]
        out["spans"].append({
            "lo": lo, "hi": hi, "speedup": round(s, 3),
            "efficiency": round(s / (hi / lo), 3),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
