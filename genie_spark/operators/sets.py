"""Set operations (SURVEY.md §2.7).

The reference uses ``pd.concat`` for union-all (genie_registry/bed.py:246,
genie/toRetract.py:66) and unix ``diff`` for set difference
(genie_registry/bed.py:211-241).  Spark equivalents are shuffle-aware
built-ins; ``unionByName`` with ``allowMissingColumns`` mirrors pandas
concat's column alignment.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame, allow_missing: bool = True) -> DataFrame:
    """Column-aligned union of any number of frames (pandas ``pd.concat``
    analog; missing columns become null)."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs
    )


def except_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """Distinct rows of left absent from right — the unix ``diff`` used
    for intron/intergenic classification (genie_registry/bed.py:211-241).
    ``subtract`` is SQL EXCEPT DISTINCT (exceptAll would be multiset
    difference: a row appearing oftener on the left than the right would
    wrongly survive)."""
    return left.subtract(right)


def intersect_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.intersect(right)
