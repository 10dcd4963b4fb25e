"""SparkSession helper used by tests, bench, and the CLI entrypoints."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fulltextsearch-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local SparkSession tuned for this engine.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. On a real
    cluster the same confs apply; only ``master`` changes (spark-submit
    sets it).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores == "*" else max(int(cores), 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # local-scale advisory: the default 64m coalesces the build's
        # ~100MB shuffles down to 2 tasks, serializing CPU-bound stages;
        # cluster deployments override via spark-submit --conf
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # local-scale scan splits: defaults (128m/4m) bin-pack a small
        # corpus into 1-3 scan tasks regardless of cores. Fine splits
        # matter for the Python-heavy tokenize stage: a ~100MB corpus
        # must yield several task waves per core, or the last wave's
        # stragglers idle the other cores (measured 11 tasks on 8 cores
        # = 0.61 stage scaling; ~40 tasks restores balance)
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "128k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE rewrite sort-merge joins to shuffled-hash at runtime
        # when the REAL per-partition build side is small (phrase/AND
        # legs join decoded posting rows whose plan-time size estimates
        # are useless behind mapInArrow) — skips sorting array rows.
        # Size-gated per partition, so it stays safe at cluster scale:
        # an oversized partition simply keeps sort-merge.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "128m",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
