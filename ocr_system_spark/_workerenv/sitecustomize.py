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
It runs once per worker process, before pyspark imports.

Escape hatch: set OCR_SPARK_KEEP_ZIPIMPORT_INVALIDATION=1 (e.g. via
spark.executorEnv) to leave stdlib behavior untouched. Note that ``site``
imports only the FIRST sitecustomize on sys.path — if your deployment
already ships one, fold this patch into it instead of shadowing it.
"""

import os

if not os.environ.get("OCR_SPARK_KEEP_ZIPIMPORT_INVALIDATION"):
    import zipimport

    zipimport.zipimporter.invalidate_caches = (  # type: ignore[method-assign]
        lambda self: None)
