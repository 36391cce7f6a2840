"""Deterministic row identifiers.

``monotonically_increasing_id`` is assigned at execution time, so a plan
that references the same uid-carrying branch on both sides of a join can
silently mismatch rows when a task retry (or AQE re-plan) recomputes the
branch with a different partition layout.  At cluster scale retries are
routine, so every join-back uid in this repo is *derived from the row's
content* instead: identical inputs always hash to the identical uid, on
every attempt, on every executor.

The uid is a struct of two independent 64-bit xxhash64 values (the second
seeded by an extra literal column), giving an effectively 128-bit key:
collision probability over n rows ≈ n²/2¹²⁹ — negligible even at 10¹²
rows.  xxhash64 is a typed JVM hash (null ≠ "" ≠ 0), stays inside
whole-stage codegen, and costs far less than a sha2 over a string concat.

Rows that are full duplicates share a uid by construction.  That is the
desired semantics for every caller here (classification / overlap marks
apply equally to identical rows); callers that need duplicate-preserving
identity must carry a real natural key instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stable_uid_col(df: DataFrame, cols: list[str] | None = None) -> Column:
    """128-bit content-derived uid expression over ``cols`` (default: all
    columns of ``df``)."""
    cs = [F.col(c) for c in (cols if cols is not None else df.columns)]
    return F.struct(
        F.xxhash64(*cs).alias("h1"),
        F.xxhash64(F.lit("gs-uid-2"), *cs).alias("h2"),
    )


def with_stable_uid(
    df: DataFrame, name: str, cols: list[str] | None = None
) -> DataFrame:
    """Attach a deterministic uid column named ``name``."""
    return df.withColumn(name, stable_uid_col(df, cols))
