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
        # Commit renames in the tasks (parallel) instead of the driver's
        # serial commitJob loop: the index write path emits one file per
        # (reducer task x segment), so v1's O(#files) driver rename loop is a
        # direct Amdahl term that GROWS with core count — measured 12s of a
        # 95s 600k-doc local[8] build. Partial-visibility-on-failure is
        # mitigated by the engine's own snapshot commit: readers only see a
        # wave after its catalog commit, and a retried wave rmtree-cleans
        # first (index_wave). Flip to v1 only for speculative execution.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
                "2")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
