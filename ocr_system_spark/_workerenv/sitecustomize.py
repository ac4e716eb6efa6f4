"""Python-worker startup patch: make per-task import-cache invalidation O(1).

pyspark's worker calls ``importlib.invalidate_caches()`` at the start of
EVERY task (worker.py ``setup_spark_files``). On CPython 3.11+ the
zipimporter's ``invalidate_caches`` EAGERLY re-reads the zip's entire
central directory — and Spark deployments always carry ``pyspark.zip`` and
``py4j-*.zip`` on the worker ``sys.path``. Measured on this box: ~60 ms per
invalidation, ~150 ms per task once the follow-up imports are counted —
for EVERY Python task, including trivial ones. That fixed per-task tax was
the dominant scaling limiter for fine-grained task layouts (256 tasks of
~60 docs: ~45 s of pure overhead across a 256-task stage at 8 cores).

Spark's deployment zips are immutable for the lifetime of the job (addFile/
addPyFile land in a separate spark-files DIRECTORY, whose FileFinder
invalidation stays active and cheap), so skipping zip-finder invalidation
is semantically safe: only a zip whose bytes are REWRITTEN IN PLACE mid-job
could be missed, which Spark itself never does.

This file is loaded by the ``site`` module at worker-interpreter startup
because ocr_system_spark.session.get_spark puts this directory on
``spark.executorEnv.PYTHONPATH`` (cluster equivalent:
``--conf spark.executorEnv.PYTHONPATH=.../ocr_system_spark/_workerenv``).

Two containment rules (PYTHONPATH is process-global, so ANY later Python
subprocess of the driver environment would otherwise load this file too):

* the patch applies ONLY inside pyspark worker/daemon interpreters —
  detected by the env vars Spark's PythonWorkerFactory sets for exactly
  these processes (``PYTHON_WORKER_FACTORY_SECRET`` / ``_PORT``, or the
  legacy ``SPARK_REUSE_WORKER``/``PYSPARK_WORKER`` markers). A plain
  ``python`` subprocess spawned from the same environment keeps stock
  zipimport behavior.
* being first on sys.path, this file SHADOWS any deployment sitecustomize;
  after running (patched or not) it locates the next ``sitecustomize.py``
  further along sys.path and executes it, so an existing one still runs.

Escape hatch: set OCR_SPARK_KEEP_ZIPIMPORT_INVALIDATION=1 (e.g. via
spark.executorEnv) to leave stdlib behavior untouched.
"""

import os
import sys

_WORKER_MARKERS = (
    "PYTHON_WORKER_FACTORY_SECRET",   # Spark 3.4+ worker/daemon launch
    "PYTHON_WORKER_FACTORY_PORT",
    "SPARK_REUSE_WORKER",
    "PYSPARK_WORKER",
)


def _in_pyspark_worker() -> bool:
    return any(m in os.environ for m in _WORKER_MARKERS)


if (_in_pyspark_worker()
        and not os.environ.get("OCR_SPARK_KEEP_ZIPIMPORT_INVALIDATION")):
    import zipimport

    zipimport.zipimporter.invalidate_caches = (  # type: ignore[method-assign]
        lambda self: None)


def _chain_next_sitecustomize() -> None:
    """Run the sitecustomize this file shadows (site imports only the FIRST
    one found on sys.path). Errors in the chained file are swallowed — a
    broken deployment hook must not take down every Spark worker."""
    here = os.path.dirname(os.path.abspath(__file__))
    for p in sys.path:
        # per-entry scan errors (unreadable dir, bad abspath) skip THAT
        # entry only — aborting the scan would silently shadow a legitimate
        # deployment sitecustomize further down the path, the exact bug
        # this chain exists to avoid. Only the located file's execution
        # errors are swallowed-and-done (a broken deployment hook must not
        # take down every worker, and rescanning past it would double-run
        # nothing useful).
        try:
            base = os.path.abspath(p or ".")
            if base == here:
                continue
            cand = os.path.join(base, "sitecustomize.py")
            found = os.path.isfile(cand)
        except Exception:
            continue
        if not found:
            continue
        try:
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "sitecustomize_chained", cand)
            if spec and spec.loader:
                mod = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(mod)
        except Exception:
            pass
        return


_chain_next_sitecustomize()
