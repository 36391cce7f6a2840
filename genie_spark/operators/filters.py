"""Filter / semi / anti operators (SURVEY.md §2.2).

All release filters in the reference are pandas ``isin`` masks over
driver-resident id lists; here they are semi/anti joins so the id set
never has to fit on the driver — the 100 TB posture.  Small literal
lists still go through ``isin`` (Catalyst turns them into an in-filter
it can push to parquet).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def semi_filter(df: DataFrame, keep: DataFrame, on: str | list[str]) -> DataFrame:
    """Rows of ``df`` whose key exists in ``keep`` — the reference's
    ``_get_left_union_df`` (genie/process_functions.py:478-494) and the
    keep-samples MAF filter (genie/database_to_staging.py:237-250)."""
    return df.join(keep, on, "left_semi")


def anti_filter(df: DataFrame, remove: DataFrame, on: str | list[str]) -> DataFrame:
    """Rows of ``df`` whose key does NOT exist in ``remove`` — the
    reference's ``_get_left_diff_df`` (genie/process_functions.py:459-475)."""
    return df.join(remove, on, "left_anti")


def keep_samples(df: DataFrame, col: str, ids: Sequence[str] | DataFrame) -> DataFrame:
    """``isin`` for small literal lists, semi join for DataFrame id sets
    (reference ``remove_maf_samples`` genie/database_to_staging.py:237-250)."""
    if isinstance(ids, DataFrame):
        return df.join(ids.select(F.col(ids.columns[0]).alias(col)), col, "left_semi")
    return df.where(F.col(col).isin(list(ids)))


def retract_cascade(
    child: DataFrame,
    retracted_parents: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Retraction with cascade: removing parents removes their children
    (reference genie/toRetract.py:9-84 — retracting a patient retracts
    its samples).  Anti join on the parent key."""
    return child.join(
        retracted_parents.select(parent_key).distinct(), parent_key, "left_anti"
    )


def group_count_filter(
    df: DataFrame,
    group_col: str | list[str],
    min_count: int,
    count_distinct: str | None = None,
) -> DataFrame:
    """Drop rows whose group has fewer than ``min_count`` members — the
    deprecated small-SEQ_ASSAY_ID filter (reference
    genie/database_to_staging.py:765-783, <50 samples per assay).

    Window count avoids a join; partial aggregation happens map-side.
    """
    cols = [group_col] if isinstance(group_col, str) else list(group_col)
    w = Window.partitionBy(*cols)
    cnt = (
        F.size(F.collect_set(count_distinct).over(w))
        if count_distinct
        else F.count(F.lit(1)).over(w)
    )
    return (
        df.withColumn("__gs_n", cnt)
        .where(F.col("__gs_n") >= min_count)
        .drop("__gs_n")
    )


def greatest_threshold_predicate(
    cols: Sequence[str], threshold: float, keep_above: bool = False
) -> Column:
    """Row-wise ``max(cols, skipna) > threshold`` predicate — the gnomAD
    germline filter (reference genie/database_to_staging.py:346-374:
    variants with max population allele frequency > 0.0005 are dropped
    unless whitelisted).  All-null rows count as below-threshold, matching
    pandas ``max(skipna=True) -> NaN -> comparison False``.
    """
    mx = F.greatest(*[F.col(c) for c in cols])  # greatest() skips nulls
    above = mx.isNotNull() & (mx > threshold)
    return above if keep_above else (mx.isNull() | (mx <= threshold))


def non_null_rows(df: DataFrame, how: str = "all") -> DataFrame:
    """Drop fully-null rows (reference genie_registry/clinical.py:820-825)."""
    return df.na.drop(how=how)
