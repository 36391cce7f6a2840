"""Window / neighbor analytics (SURVEY.md §2.5).

The reference's only neighbor computation is mutation-in-cis
("mergeCheck", R/mergecheck_functions.R:80-192): per sample, variants
sorted by genomic position; adjacent pairs closer than a few bases with
similar VAF are flagged as one merged variant reported as two.  In
Spark that is a single window pass — ``lag()`` over
(partitionBy=sample, orderBy=position) — no R subprocess, no per-sample
loop, and it scales to any number of samples because the shuffle is
hash-partitioned on the sample id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def adjacent_pairs(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: str | list[str],
    lag_cols: dict[str, str],
) -> DataFrame:
    """Attach each row's predecessor values within a partition.

    ``lag_cols`` maps source column → new column holding the previous
    row's value.  This is the spine of mutation-in-cis (reference
    R/mergecheck_functions.R:150-168, adjacent variants with
    ``0 < dBP < 6`` and ``|dVAF| < 0.05``).
    """
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    orders = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*parts).orderBy(*orders)
    out = df
    for src, dst in lag_cols.items():
        out = out.withColumn(dst, F.lag(src).over(w))
    return out


def flag_variants_to_merge(
    maf: DataFrame,
    sample_col: str = "Tumor_Sample_Barcode",
    chrom_col: str = "Chromosome",
    pos_col: str = "Start_Position",
    end_col: str = "End_Position",
    alt_col: str = "t_alt_count",
    depth_col: str = "t_depth",
    protein_pos_col: str = "Protein_position",
    max_dbp: int = 6,
    max_dvaf: float = 0.05,
) -> DataFrame:
    """Mutation-in-cis detection as one window pass.

    Criteria from the reference (R/mergecheck_functions.R:150-168):
    within a sample + chromosome, sort by (start, end); flag a pair when
    ``0 < dBP < max_dbp``, ``|dVAF| < max_dvaf`` and the codon-number
    difference ``|Δcodon|`` is NA or exactly 1 (R:165
    ``is.na(codonDiff) | codonDiff == 1``).  ``dBP`` is the GRanges
    inter-range *gap* — ``next_start − prev_end − 1`` — not the
    start-to-start delta, so for SNVs start deltas 2–6 flag.  VAF =
    alt/depth with zero/null depth treated as 1/1
    (mergecheck_functions.R:120-135).

    Returns rows that participate in a flagged pair, with the pair
    metrics attached.
    """
    vaf = F.when(
        F.coalesce(F.col(depth_col), F.lit(0)) == 0, F.lit(1.0)
    ).otherwise(F.col(alt_col) / F.col(depth_col))
    # "123/456" or "12" → leading integer; null if unparseable.  An
    # unannotated MAF has no Protein_position at all — same as
    # all-unparseable (the codon criterion accepts NA,
    # mergecheck_functions.R:160-163).
    cols = {c.lower(): c for c in maf.columns}
    if protein_pos_col.lower() in cols:
        codon = F.regexp_extract(
            F.col(cols[protein_pos_col.lower()]), r"^(\d+)", 1
        ).cast("long")
    else:
        codon = F.lit(None).cast("long")
    # SNV-only MAFs may omit End_Position; a point range has end = start.
    end = F.col(end_col) if end_col in maf.columns else F.col(pos_col)
    w = Window.partitionBy(sample_col, chrom_col).orderBy(pos_col, end.asc())
    paired = (
        maf.withColumn("__vaf", vaf)
        .withColumn("__codon", codon)
        .withColumn("__end", end)
        .withColumn("__prev_end", F.lag("__end").over(w))
        .withColumn("__prev_vaf", F.lag("__vaf").over(w))
        .withColumn("__prev_codon", F.lag("__codon").over(w))
    )
    dbp = F.col(pos_col) - F.col("__prev_end") - F.lit(1)
    dvaf = F.abs(F.col("__vaf") - F.col("__prev_vaf"))
    dcodon = F.abs(F.col("__codon") - F.col("__prev_codon"))
    flagged = (dbp > 0) & (dbp < max_dbp) & (dvaf < max_dvaf) & (
        dcodon.isNull() | (dcodon == 1)
    )
    return (
        paired.withColumn("__flag", F.coalesce(flagged, F.lit(False)))
        .withColumn("__next_flag", F.lead("__flag").over(w))
        .where(F.col("__flag") | F.coalesce(F.col("__next_flag"), F.lit(False)))
        .drop("__next_flag")
    )


def latest_per_key(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: list,
) -> DataFrame:
    """Keep the latest row per key — the reference's "current release per
    major version" dedup (genie/extract.py:152-159).  ``order_by`` should
    end with a tiebreaker column for determinism."""
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    w = Window.partitionBy(*parts).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__gs_rn", F.row_number().over(w))
        .where(F.col("__gs_rn") == 1)
        .drop("__gs_rn")
    )


def _orderable(dt) -> bool:
    """True iff Spark can sort on this type: maps are unorderable,
    arrays/structs inherit from their element/field types."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload: list[str],
    tiebreak: str,
    prefix: str = "asof_",
    direction: str = "backward",
    validate_tiebreak: bool = False,
) -> DataFrame:
    """Backward as-of join (each left row ⟵ the right row with the
    greatest ``ts_col`` ≤ its own, per key) as ONE shuffle.
    ``direction="forward"`` matches the SMALLEST right ts ≥ the left
    row's instead (next-event attribution), with ties at a duplicate
    right (key, ts) resolved to the MIN-``tiebreak`` row — the mirror
    of backward's max, so both directions pick the row nearest the
    left row in the sort.

    The naive formulation is a range join — an n·m candidate blowup
    (or a per-key loop).  Here both sides are tagged and UNIONED, each
    key's rows sort once by (ts, side, tiebreak), and the right
    payload is carried forward with ``last(ignorenulls)`` over an
    unbounded-preceding frame; left rows are kept.  Cost: one hash
    exchange on the key + the window sort — identical to any per-key
    window op, and linear in |left|+|right| at any scale.

    Semantics (deterministic, mirrored by DuckDB's native ASOF JOIN
    over a (key, ts, arg_max(payload, tiebreak)) right side):

    * inclusive — a right row AT the left row's ts matches (right
      sorts before left at equal ts);
    * duplicate right (key, ts) rows resolve to the max-``tiebreak``
      row's payload (the sort puts it last).  Rows identical even in
      (key, ts, tiebreak) resolve by the payload STRUCT itself as the
      final sort key (max struct wins backward, min forward) — the
      pick is deterministic with NO uniqueness precondition, at zero
      extra cost (one more sort key in the same window sort, no extra
      job — the scale-friendly alternative to a default-on validation
      scan of the right side).  ``validate_tiebreak=True`` still
      asserts tiebreak uniqueness up front (one extra aggregate job)
      for callers that want duplicate tiebreaks to be an ERROR rather
      than struct-resolved.  Payloads containing non-orderable types
      (maps) skip the struct sort key automatically (sorting on them
      raises at plan time) and keep the historic partition-order
      behavior for duplicate tiebreaks — pass ``validate_tiebreak=
      True`` there to make duplicates an error instead;
    * right rows with null ts are dropped (a null can never satisfy
      ts_right ≤ ts_left); left rows with null ts get null payload;
    * left rows with no prior right row get null payload (left-join
      semantics).

    Right payload columns surface as ``{prefix}{name}``; the left
    frame must not already contain those names.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    for c in payload:
        out_name = f"{prefix}{c}"
        if out_name in left.columns:
            raise ValueError(f"left side already has a column named {out_name}")
    if validate_tiebreak:
        dup = (
            right.where(F.col(ts_col).isNotNull())
            .groupBy(*on, ts_col, tiebreak)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"asof_join: tiebreak column {tiebreak!r} is not unique "
                f"within (key, ts) on the right side (e.g. {dup[0]}); the "
                "payload pick would be partition-order-dependent"
            )

    # the payload travels as ONE struct so the match is atomic: with
    # per-column last(ignorenulls), a right row carrying a null in one
    # payload column would splice that column from an OLDER right row
    r = (
        right.where(F.col(ts_col).isNotNull())
        .select(
            *on,
            F.col(ts_col),
            F.col(tiebreak).alias("__tb"),
            F.struct(*[F.col(c).alias(c) for c in payload]).alias("__p"),
        )
        .withColumn("__side", F.lit(0))
    )
    l = left.withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # the payload struct joins the sort order ONLY when every payload
    # type is orderable — sorting a struct containing a map raises at
    # plan time, so map-carrying payloads keep the historic order (and
    # validate_tiebreak is their determinism guard, per the docstring)
    payload_sortable = all(
        _orderable(right.schema[c].dataType) for c in payload
    )
    if direction == "backward":
        order = [
            F.col(ts_col).asc(),
            F.col("__side").asc(),
            F.col("__tb").asc(),
        ]
        if payload_sortable:
            order.append(F.col("__p").asc())
    else:
        # descending ts puts LATER rows first, so the unbounded-
        # preceding last() seen at a left row is the nearest ts ≥ it;
        # __tb desc makes the min-tiebreak right row sort last (win);
        # __p desc mirrors backward's max-struct pick as min-struct
        order = [
            F.col(ts_col).desc(),
            F.col("__side").asc(),
            F.col("__tb").desc(),
        ]
        if payload_sortable:
            order.append(F.col("__p").desc())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    # a null left ts can never satisfy the inequality in either
    # direction; mask explicitly (under desc order nulls sort LAST and
    # would otherwise see every right row)
    u = u.withColumn(
        "__m", F.when(F.col(ts_col).isNotNull(), F.col("__m"))
    )
    return u.where(F.col("__side") == 1).select(
        *left.columns,
        *[F.col("__m")[c].alias(f"{prefix}{c}") for c in payload],
    )
