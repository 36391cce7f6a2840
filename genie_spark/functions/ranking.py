"""Rank a BOUNDED frame without a window.

The post-top-k report paths (bm25/tf-idf top-k, token drift, DSIR /
priority samples, sketch estimates) need a dense 1..n rank over a
frame that is <= k rows BY CONSTRUCTION (it sits behind an
``orderBy().limit(k)`` or is a sketch artifact).  A window with an
empty partition spec computes the same thing but logs WindowExec's
move-all-data-to-one-partition warning on every execution — and
partitioning by a literal doesn't help, because Catalyst constant-
folds the foldable key straight back out of the spec (measured).
Since one partition is the PLAN here, not an accident, rank without
WindowExec: coalesce to the single partition the data already fits,
sort within it, and number rows with monotonically_increasing_id —
0-based and dense within a single partition (partition index 0), so
``mid + 1`` is exactly row_number() in the sort order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rank_bounded(
    df: DataFrame,
    *order_cols: Column | str,
    rank_col: str = "rank",
    max_rows: int | None = None,
) -> DataFrame:
    """``df`` (<= k rows by construction) plus ``rank_col`` = 1..n in
    ``order_cols`` order — row_number() semantics, zero WindowExec.

    This is the repo's ONE audited monotonically_increasing_id site
    (test_plans.test_no_nondeterministic_uid_in_package): after
    coalesce(1) the partition index is fixed at 0 and the row ordinal
    follows the total sort order, so the rank is a pure function of
    content — task retries reproduce it bit-for-bit.  Callers must
    pass a TOTAL order (include a unique tie-breaker column).

    ``max_rows`` (VERDICT r13 item 3) turns the <=k-rows precondition
    from a convention into a runtime contract: when set, any rank
    past the bound raises loudly at execution (an expression-level
    guard — one comparison per row, no extra job) instead of letting
    a mis-sized frame silently serialize through one partition.
    Call sites pass their own k."""
    out = df.coalesce(1).sortWithinPartitions(*order_cols)
    rank = (F.monotonically_increasing_id() + 1).cast("long")
    if max_rows is not None:
        rank = F.when(
            rank > F.lit(int(max_rows)),
            F.raise_error(
                F.lit(
                    f"rank_bounded: frame exceeds max_rows={int(max_rows)}"
                    " — the caller's <=k-rows precondition is violated"
                )
            ).cast("long"),
        ).otherwise(rank)
    return out.withColumn(rank_col, rank)
