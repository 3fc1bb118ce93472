"""SparkSession builder with the engine's scale-tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "krt-extractor",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Session with AQE, Arrow, and sane shuffle sizing.

    On a real cluster these same configs apply; ``master`` defaults to the
    environment (``local[$SPARK_GRAFT_CPUS]`` in this sandbox).
    """
    import re

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    m = re.fullmatch(r"local\[(\d+)\]", master)
    slots = int(m.group(1)) if m else int(cpus)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batches so mega-docs with heavy spans can't blow a batch
        # (SURVEY.md §4 skew notes)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        # default heap = the GC-quiet sizing measured by the round-7 sf1
        # soak (~0.75 GB per task slot: at the old flat 8g default the 32-
        # slot soak ran at 94% heap occupancy with GC at ~11% of core
        # time; tripling the heap bought +13% throughput). Parameterized
        # by slot count, overridable via SPARK_DRIVER_MEM; on a cluster
        # the same rule sizes executor heaps per core.
        .config(
            "spark.driver.memory",
            os.environ.get(
                "SPARK_DRIVER_MEM",
                f"{max(8, round(0.75 * slots))}g",
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
