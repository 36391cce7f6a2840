"""Symbol/code remap joins (SURVEY.md §2.3 J9/J10).

The reference resolves CNA gene symbols per-row against the center's
BED (``validateSymbol`` genie_registry/cna.py:14-66, applied row-wise at
cna.py:138-139): a symbol is kept if it appears in bed.Hugo_Symbol,
remapped to the bed symbol whose ID matches it otherwise, and nulled
when neither matches.  Here that is two broadcast left joins + one
coalesce — the per-row pandas apply becomes a set-at-a-time plan (BED
panels are dim-sized, so both joins broadcast; no shuffle of the CNA
fact side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cna_symbol_remap(
    cna: DataFrame,
    bed: DataFrame,
    symbol_col: str = "Hugo_Symbol",
    bed_symbol_col: str = "Hugo_Symbol",
    bed_id_col: str = "ID",
) -> DataFrame:
    """Resolve each CNA symbol against the BED (J10).

    Adds ``remapped_symbol``: the input symbol if it is a valid bed
    symbol; else the bed symbol whose ID equals it; else null
    (untrackable gene, dropped downstream — cna.py:263-266).
    """
    valid = bed.select(F.col(bed_symbol_col).alias("__direct")).distinct()
    # one symbol per ID (the reference takes the first match,
    # cna.py:50-54; min() is the order-independent equivalent)
    id_map = (
        bed.select(
            F.col(bed_id_col).alias("__id"),
            F.col(bed_symbol_col).alias("__via_id"),
        )
        .where(F.col("__id").isNotNull())
        .groupBy("__id")
        .agg(F.min("__via_id").alias("__via_id"))
    )
    out = (
        cna.join(
            F.broadcast(valid),
            F.col(symbol_col) == F.col("__direct"),
            "left",
        )
        .join(F.broadcast(id_map), F.col(symbol_col) == F.col("__id"), "left")
        .withColumn(
            "remapped_symbol", F.coalesce(F.col("__direct"), F.col("__via_id"))
        )
        .drop("__direct", "__id", "__via_id")
    )
    return out
