"""SparkSession factory tuned for the engine (tests + bench)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "lucene-spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    master = f"local[{cores}]" if cores else "local[*]"
    shuffle = shuffle_partitions or max(8, cores or 32)
    return (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # local corpora are tiny vs the 128m default split — finer splits keep
        # scan-stage parallelism (where the tokenizer runs) core-bound. At
        # cluster scale this is sized to executor memory instead.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", "8m"))
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
