"""Aggregation operators (SURVEY.md §2.4).

Everything here is a thin, named composition of built-in Spark
aggregates — partial (map-side) aggregation, spill, and AQE coalescing
come free.  The names track the reference's dashboard/validation
aggregations so the parity mapping stays auditable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def counts_with_total(
    df: DataFrame, group_col: str, total_label: str = "Total"
) -> DataFrame:
    """Per-group counts plus a Total row — the reference's center
    count tables (genie/dashboard_table_updater.py:113-175)."""
    per = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    total = df.agg(
        F.lit(total_label).alias(group_col), F.count(F.lit(1)).alias("n")
    )
    return per.unionByName(total)


def distinct_counts(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """Distinct-id counts per group (reference
    genie/dashboard_table_updater.py:143-156, unique samples per center)."""
    return df.groupBy(group_col).agg(F.countDistinct(id_col).alias("n_distinct"))


def pivot_counts(
    df: DataFrame,
    row_col: str,
    pivot_col: str,
    pivot_values: Sequence[str] | None = None,
) -> DataFrame:
    """Row × column count matrix — the oncotree-by-center pivot
    (genie/dashboard_table_updater.py:297-395).  Passing ``pivot_values``
    avoids the extra distinct-values job Spark otherwise runs."""
    p = df.groupBy(row_col).pivot(pivot_col, list(pivot_values) if pivot_values else None)
    return p.count().na.fill(0)


def with_row_total(
    df: DataFrame, row_col: str, alias: str = "Total"
) -> DataFrame:
    """Append a row-wise Total column summing every count column — the
    reference's pivot tables carry one
    (genie/dashboard_table_updater.py:325-328)."""
    count_cols = [c for c in df.columns if c != row_col]
    total = count_cols[0] if count_cols else None
    expr = F.lit(0).cast("long")
    for c in count_cols:
        expr = expr + F.coalesce(F.col(c).cast("long"), F.lit(0))
    return df.withColumn(alias, expr) if total else df


def completeness_ratio(
    df: DataFrame, group_col: str, cols: Sequence[str], missing_sentinels: Sequence[str] = ()
) -> DataFrame:
    """Per group, per column: fraction of informative (non-null,
    non-sentinel) values — reference ``get_center_data_completion``
    (genie/dashboard_table_updater.py:16-50).  Emits long form
    (group, column, completeness); one pass over the data."""
    aggs = []
    for c in cols:
        informative = F.col(c).isNotNull()
        for s in missing_sentinels:
            informative = informative & (F.col(c) != s)
        aggs.append(F.avg(informative.cast("double")).alias(c))
    wide = df.groupBy(group_col).agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    return wide.selectExpr(
        group_col, f"stack({len(cols)}, {stack_expr}) as (column, completeness)"
    )


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key combinations occurring more than once (reference duplicate
    checks, e.g. genie_registry/maf.py:274-299 5-column variant key)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def merge_duplicate_values(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """CNA duplicate-gene merge (reference ``mergeCNAvalues``
    genie_registry/cna.py:86-105): per key, 1 distinct value → keep it;
    2 distinct values one of which is 0 → the nonzero one; else null.
    Long-form groupBy replaces the per-column pandas loop.

    The distinct-set rule is decided from five SCALAR aggregates
    (min/max, a zero-presence flag, min/max over the nonzero values)
    instead of a ``collect_set``:

      * 1 distinct       ⇔ min = max                    → that value
      * 2 distinct, one 0 ⇔ zero present ∧ min ≠ max ∧
                            min_nonzero = max_nonzero   → the nonzero
      * else → null.

    Equivalent case-by-case to the set form (including all-null
    groups → null via null-propagating comparisons, and NaN groups —
    Spark's NaN = NaN is true), but the aggregate is a plain codegen
    ``HashAggregate`` with map-side partial combine rather than an
    ``ObjectHashAggregate`` shipping per-group sets (measured ~2×
    on the a8 bench path, same 1-exchange plan shape).
    """
    v = F.col(value_col)
    nz = F.when(v != 0, v)
    merged = (
        F.when(F.col("__mn") == F.col("__mx"), F.col("__mn"))
        .when(
            (F.col("__z") == 1) & (F.col("__mnz") == F.col("__mxz")),
            F.col("__mnz"),
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return (
        df.groupBy(*keys)
        .agg(
            F.min(v).alias("__mn"),
            F.max(v).alias("__mx"),
            F.max(F.when(v == 0, F.lit(1)).otherwise(F.lit(0))).alias("__z"),
            F.min(nz).alias("__mnz"),
            F.max(nz).alias("__mxz"),
        )
        .withColumn("merged_value", merged)
        .drop("__mn", "__mx", "__z", "__mnz", "__mxz")
    )


def median(df: DataFrame, col: str):
    """Exact median expression — the AGE sanity rule (reference
    genie_registry/clinical.py:953-961, ``median(AGE) < 100`` ⇒ days not
    years).  Exact ``percentile`` matches the pandas/duckdb interpolated
    median; swap to ``percentile_approx`` when the column is huge and
    the rule only needs an order-of-magnitude check."""
    return F.expr(f"percentile({col}, 0.5)")


def robust_outlier_stats(
    df: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Median/MAD robust outlier report per group (r15 A-family
    extension — the outlier screen the reference's mean/stddev checks
    can't do robustly, since one wild value inflates a stddev but not
    a median): per group, the interpolated median, the median absolute
    deviation, and the count of values with |x − med| > 3·MAD (no
    normal-consistency factor — documented plain-MAD rule).

    Exactness: over integer inputs both engines' interpolated medians
    are dyadic rationals (lo + frac·(hi − lo), frac ∈ {0, 0.5}) and
    every derived comparison is the same IEEE double sequence.

    Spark shape: three same-key rounds (median agg → deviation join →
    MAD agg → flag join + final agg) — every exchange hashes the same
    keys, so the later rounds reuse the first shuffle's layout."""
    med = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, 0.5D)").alias("__med")
    )
    d = df.join(med, keys).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = d.groupBy(*keys).agg(
        F.expr("percentile(__dev, 0.5D)").alias("__mad")
    )
    return (
        d.join(mad, keys)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("__med").alias("median_value"),
            F.max("__mad").alias("mad_value"),
            F.sum(
                F.when(F.col("__dev") > 3 * F.col("__mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


def fill_count_algebra(
    df: DataFrame, depth: str, ref: str, alt: str
) -> DataFrame:
    """Fill any one missing member of depth = ref + alt (reference
    ``calculate_missing_variant_counts``
    genie/database_to_staging.py:406-442)."""
    return (
        df.withColumn(depth, F.coalesce(F.col(depth), F.col(ref) + F.col(alt)))
        .withColumn(ref, F.coalesce(F.col(ref), F.col(depth) - F.col(alt)))
        .withColumn(alt, F.coalesce(F.col(alt), F.col(depth) - F.col(ref)))
    )


def value_count_decreases(
    current: DataFrame,
    older: DataFrame,
    group_col: str = "CENTER",
    id_col: str = "SAMPLE_ID",
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Per-group, per-column value-distribution decrease flags between
    two release snapshots (reference ``check_column_decreases`` +
    ``print_clinical_values_difference_table``,
    genie/dashboard_table_updater.py:633-807).

    Semantics match the reference: the current side is first restricted
    to ids present in the older release (so sample retirements don't
    read as value decreases), only columns present in BOTH frames are
    compared, and a column is flagged when ANY of its values has a
    lower count than before within the group.

    Spark shape (vs the reference's per-center pandas loop): one melt
    (``stack``) per side into (group, column, value) long form, one
    count aggregation each, a full-outer join on the key, and an any()
    rollup — 3 shuffles total regardless of how many centers/columns,
    where the reference loops centers × columns driver-side.  Returns
    (group_col, column, has_decrease) long form, orderable into the
    reference's center × column boolean matrix with a pivot.
    """
    shared = [
        c
        for c in (columns or current.columns)
        if c in current.columns and c in older.columns and c != group_col
    ]
    if not shared:
        # disjoint schemas (or a filtering ``columns`` arg): nothing to
        # compare — return an empty, correctly-typed frame instead of
        # generating an unparsable ``stack(0, )`` expression
        return current.limit(0).select(
            F.col(group_col),
            F.lit(None).cast("string").alias("column"),
            F.lit(None).cast("boolean").alias("has_decrease"),
        )
    cur = current.join(
        older.select(id_col).distinct(), id_col, "left_semi"
    )

    def melt_counts(df: DataFrame) -> DataFrame:
        pairs = ", ".join(
            f"'{c}', CAST(`{c}` AS STRING)" for c in shared
        )
        return (
            df.select(
                F.col(group_col),
                F.expr(f"stack({len(shared)}, {pairs}) AS (column, value)"),
            )
            # pandas value_counts drops NaN — null cells are not values
            # (a populated→null transition still shows as the populated
            # value's count dropping)
            .where(F.col("value").isNotNull())
            .groupBy(group_col, "column", "value")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    new_counts = melt_counts(cur)
    old_counts = melt_counts(older).withColumnRenamed("n", "n_old")
    joined = new_counts.join(
        old_counts, [group_col, "column", "value"], "full_outer"
    ).select(
        group_col,
        "column",
        (
            F.coalesce(F.col("n"), F.lit(0))
            < F.coalesce(F.col("n_old"), F.lit(0))
        ).alias("dec"),
    )
    return (
        joined.groupBy(group_col, "column")
        .agg(F.max(F.col("dec")).alias("has_decrease"))
        .orderBy(group_col, "column")
    )


def group_concat(
    df: DataFrame, group_col: str, value_col: str, sep: str = "\n"
) -> DataFrame:
    """Deterministic group-concat (reference error-report assembly,
    genie/write_invalid_reasons.py:70-89): sort the collected list so
    output is stable under Spark's unordered shuffles."""
    return df.groupBy(group_col).agg(
        F.array_join(F.array_sort(F.collect_list(value_col)), sep).alias("combined")
    )
