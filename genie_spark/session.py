"""SparkSession factory tuned for the genie_spark workload.

Local mode is the test harness; the config choices are the ones that
matter on a real cluster too: AQE (skew joins, partition coalescing),
a shuffle-partition count matched to parallelism, Arrow for the few
Pandas-UDF paths, and a broadcast threshold large enough that every
dimension table (nation/region-sized, oncotree-sized) broadcasts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "genie_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    On a real cluster the master/memory settings come from spark-submit;
    everything set here is cluster-safe.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # per-center skew (a few centers dominate) makes this mandatory.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Dim tables (region/nation/oncotree/code-maps/assay info) are tiny;
        # raise the auto-broadcast threshold so they always broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS) which Spark has no native
        # type for; read as epoch-nanos LongType (workload converts to µs).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load every driver-provided parquet table from ``sf_dir``."""
    return {
        name: spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for name in TESTDATA_TABLES
    }
