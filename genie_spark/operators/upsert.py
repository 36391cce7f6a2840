"""Primary-key upsert (MERGE) semantics (SURVEY.md §2.1 S15 / §2.3 J7).

The reference diffs new data against the live Synapse table and pushes
only changed rows (genie/load.py:129-296; row-compare in
genie/process_functions.py:497-629).  Spark-first equivalent: a single
full-outer join on the primary key classifies every row as
insert / update / delete / unchanged; the row comparison is a hash
(``sha2(concat_ws)``) instead of the reference's cell-wise pandas
compare — one expression, codegen'd, no Python in the loop.

On a Delta-enabled cluster this is ``MERGE INTO``; the join-diff below
is storage-agnostic and is also the dry-run/"what changed" report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "__change"


def _row_hash(df: DataFrame, cols: list[str]) -> Column:
    # null-safe: a null cell and the empty string must hash differently,
    # mirroring the reference's to-string compare with NA markers
    # (genie/process_functions.py:560-583).
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
    return F.sha2(F.concat_ws("\x01", *parts), 256)


def upsert_diff(
    new: DataFrame,
    existing: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify rows: full outer join on ``keys``; left-only → insert,
    right-only → delete, both-with-different-payload → update.

    Returns new-side columns (existing-side for deletes) plus a
    ``__change`` column in {'insert','update','delete'}; unchanged rows
    are dropped (the reference stores only the changed sets,
    genie/load.py:255-296).
    """
    value_cols = compare_cols or [c for c in new.columns if c not in keys]
    n = new.select(
        *[F.col(c).alias(f"n_{c}") for c in new.columns],
        _row_hash(new, value_cols).alias("__n_hash"),
    )
    e = existing.select(
        *[F.col(c).alias(f"e_{c}") for c in existing.columns],
        _row_hash(existing, value_cols).alias("__e_hash"),
    )
    cond = None
    for k in keys:
        c = n[f"n_{k}"] == e[f"e_{k}"]
        cond = c if cond is None else cond & c
    j = n.join(e, cond, "full_outer")

    change = (
        F.when(F.col(f"e_{keys[0]}").isNull(), F.lit("insert"))
        .when(F.col(f"n_{keys[0]}").isNull(), F.lit("delete"))
        .when(F.col("__n_hash") != F.col("__e_hash"), F.lit("update"))
        .otherwise(F.lit(None))
    )
    out_cols = [
        F.coalesce(F.col(f"n_{c}"), F.col(f"e_{c}")).alias(c)
        if c in existing.columns
        else F.col(f"n_{c}").alias(c)
        for c in new.columns
    ]
    return (
        j.withColumn(CHANGE_COL, change)
        .where(F.col(CHANGE_COL).isNotNull())
        .select(*out_cols, CHANGE_COL)
    )


def apply_upsert(
    new: DataFrame,
    existing: DataFrame,
    keys: list[str],
    delete_missing: bool = False,
) -> DataFrame:
    """Materialized MERGE result: existing rows replaced by matching new
    rows, new keys appended; optionally keys absent from ``new`` deleted
    (the reference's ``to_delete=True`` mode, genie/load.py:129-171)."""
    if delete_missing:
        return new
    kept = existing.join(new.select(*keys).distinct(), keys, "left_anti")
    return new.unionByName(kept.select(*new.columns))
