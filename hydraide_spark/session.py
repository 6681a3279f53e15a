"""SparkSession construction with engine defaults.

Local-mode testing uses ``local[N]``; the same conf names govern cluster
deployments. Defaults follow the scale guidance in SURVEY.md §4/§7:
AQE on (runtime re-planning + skew-join handling), shuffle partitions
sized to cores locally (cluster: ~2-3x total cores), Arrow enabled for
the pandas-UDF paths, UTC session timezone so results are oracle-stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: keep row-group pruning + pushdown on (defaults, pinned)
    "spark.sql.parquet.filterPushdown": "true",
    # TIMESTAMP(NANOS) parquet columns (Spark has no ns type): read as
    # long, converted to microsecond timestamps by sources.tables.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # At 100 TB the default 128MB split is fine; local tests read small files.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    # Local mode runs driver AND executors in one JVM; the 1g default
    # heap is sized for neither (the 10x scale stress OOM'd an
    # AQE-chosen broadcast build inside it while the machine had 100+
    # GiB free). Only effective before the JVM starts; clusters size
    # driver/executor memory in deploy conf instead.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
}


def get_spark(
    app_name: str = "hydraide_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback
    ``local[*]``) so the same entry points serve tests, bench, and the
    driver harness. On a real cluster pass ``master=None`` with
    ``spark.master`` preset in the environment.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(ENGINE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
