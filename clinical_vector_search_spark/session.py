"""SparkSession factory.

Mirrors the reference's session setup (src/pipeline/embedding.py:17-26:
local master, Arrow enabled, sized driver memory) but tuned for the Spark-4
DataFrame engine: AQE on, shuffle partitions sized to the machine, nanosecond
parquet timestamps readable (the driver's events.parquet is timestamp[ns],
which PySpark 4 otherwise rejects with PARQUET_TYPE_ILLEGAL).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "clinical_vector_search_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults are chosen for local[N] testing but every setting is the one
    you'd also want on a real cluster (AQE, Arrow, broadcast threshold);
    cluster deployments override master/memory via spark-submit.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # fallback for timestamp[ns] parquet files (read as long epoch-ns);
        # current testdata ships timestamp[us] — streaming.events adapts
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
