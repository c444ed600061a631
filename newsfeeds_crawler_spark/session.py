"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the config block is what we would submit
with ``spark-submit --py-files`` on a real multi-executor cluster — AQE on,
skew-join on, Arrow on, shuffle partitions sized explicitly per workload.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "newsfeeds-crawler-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS (driver contract) else all cores.
    Determinism discipline: fixed shuffle partitions, no wall-clock anywhere
    in plans, session timezone pinned to UTC.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # make the package importable on python workers regardless of the
    # driver's cwd: the JVM (and every python worker / streaming runner it
    # forks) inherits this env. Closures pickle by value, but module-level
    # classes (e.g. the transformWithStateInPandas StatefulProcessor)
    # pickle by REFERENCE and must import on the worker — locally this env
    # bridge is what `spark-submit --py-files` provides on a cluster. A
    # no-op if the JVM already exists (getOrCreate reuse).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = pkg_root + (os.pathsep + pp if pp else "")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("NFC_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("NFC_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
