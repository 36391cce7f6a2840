"""Bucketed silver tables: amortize the big join shuffles into layout.

The release pipeline joins maf/cna/seg against clinical on the sample
id every run (reference bin/database_to_staging.py release loop); at
100 TB that is a full shuffle of the fact tables per release.  Synapse
tables give the reference no say in physical layout — Spark does:
write both sides ``bucketBy(N, key)`` once at ingest and every
subsequent equi-join on that key is planned WITHOUT an Exchange
(EnsureRequirements sees both sides already hash-partitioned by the
bucket key).  tests/test_bucketed.py asserts the Exchange disappears
from the physical plan.

Bucketing requires catalog tables (`saveAsTable`) rather than bare
parquet paths — bucket metadata lives in the catalog.  Keep bucket
counts identical on all sides meant to co-join, and pick N so one
bucket of the biggest table fits an executor core (e.g. 100 TB maf /
2048 buckets ≈ 50 GB per bucket pre-compression — size to taste).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 64


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (+ in-bucket sorted) catalog table.
    Sorting by the join key lets sort-merge joins skip the Sort node
    too when files-per-bucket is 1."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*(sort_cols or [bucket_col]))
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    shuffle-free by construction when both were written with
    ``write_bucketed`` using the same key and bucket count."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def physical_plan(df: DataFrame) -> str:
    """The planned physical tree as text (pre-execution; used by tests
    to assert the absence of Exchange under a bucketed join)."""
    return df._jdf.queryExecution().executedPlan().toString()
