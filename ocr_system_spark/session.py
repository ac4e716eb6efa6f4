"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]`` threads; the same config block is what
we would pass to ``spark-submit`` on a real cluster (AQE on, Arrow on,
shuffle partitions sized to cores).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parents[1])


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Works even when the SparkSession was created by someone else (the test
    driver) before this module was imported — the cluster-mode equivalent is
    ``spark-submit --py-files ocr_system_spark.zip``.
    """
    if getattr(spark, "_ocr_system_spark_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.join(_REPO_ROOT, "ocr_system_spark")
    zip_path = os.path.join(tempfile.gettempdir(), "ocr_system_spark_pkg.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, _REPO_ROOT)
                        zf.write(full, rel)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added in this context
    spark._ocr_system_spark_shipped = True


def get_spark(
    cores: int | str = "*",
    app_name: str = "ocr_system_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` is the local[] parallelism; on a real cluster the master URL
    comes from spark-submit and this arg is ignored by Spark.
    """
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores in ("*",) else max(int(cores), 2) * 2
    # Executor Python workers must be able to import this package. On a real
    # cluster that is `spark-submit --py-files ocr_system_spark.zip`; in
    # local mode the worker processes inherit the driver environment, so
    # prepending the repo root to PYTHONPATH is the equivalent.
    # _workerenv holds a sitecustomize.py that neutralizes the per-task
    # zipimporter cache invalidation (see its docstring) — worth ~150 ms of
    # fixed CPU on EVERY Python task. It must be on the worker interpreter's
    # PYTHONPATH at startup; on a real cluster pass the same directory via
    # --conf spark.executorEnv.PYTHONPATH.
    _workerenv = os.path.join(_REPO_ROOT, "ocr_system_spark", "_workerenv")
    pypath = os.environ.get("PYTHONPATH", "")
    parts = pypath.split(os.pathsep) if pypath else []
    for p in (_workerenv, _REPO_ROOT):
        if p not in parts:
            parts.insert(0, p)
    os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        # AQE: runtime shuffle-partition coalescing + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Prefer shuffled-hash over sort-merge when a per-partition build
        # side fits (guide §3.1/§9): skips both sort passes on keyed
        # equi-joins. Partition build sides are bounded here by the salting
        # caps (dedup band/shingle joins) and AQE skew splitting; the AQE
        # threshold below additionally converts planned SMJs at runtime
        # when every post-shuffle partition is under 128 MB. Measured at
        # sf1.0: dedup_minhash ~3.6→2.9 s, multi_join 1.71→1.50 s (A/B
        # toggled in one session; SMJ remains the fallback above the
        # threshold, so spill-graceful behavior at scale is unchanged).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                "128m")
        # Arrow transfer for every pandas UDF / mapInPandas stage. Batching
        # is WIDTH-ADAPTIVE (guide §4.2): the byte cap bounds a batch at
        # ~8 MB — the size the round-2 heavy-page bench measured optimal
        # (256 rows × ~32 KB pages; 60 MB batches were 40% slower from
        # Python-worker memory churn) — while the generous row cap lets
        # narrow rows (dedup/token kernels, ~300 B docs) batch 8192 at a
        # time instead of 256, cutting JVM↔Python crossings 32×. Measured:
        # extract_pipeline 5.35→3.64 s, fields_only 2.69→1.94 s at sf1.0;
        # verified the byte cap yields ~84-row batches on 100 KB rows.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "8m")
        # Shuffle partitions sized to local cores, not the 200 default.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # Idempotent per-bucket overwrite for checkpoint-resume (plans/resume.py).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        # Shuffle/spill through RAM-backed tmpfs when present: the sandbox
        # has ONE local disk whose fixed bandwidth otherwise serializes
        # shuffles; tmpfs models a cluster's per-node local SSDs. Opt out
        # with SPARK_GRAFT_DISK_SHUFFLE=1.
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_LOCAL_DIRS",
                "/dev/shm/spark_local"
                if os.path.isdir("/dev/shm")
                and not os.environ.get("SPARK_GRAFT_DISK_SHUFFLE")
                else os.path.join(os.sep, "tmp"),
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
