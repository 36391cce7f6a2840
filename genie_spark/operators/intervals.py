"""Interval (genomic range) join machinery.

The reference escapes to external interval-tree engines for every range
join — R GRanges ``%over%`` (reference: R/MAFinBED.R:126-161), pyranges
containment (genie/database_to_staging.py:253-292) and shell ``bedtools
intersect`` (genie_registry/bed.py:131-247).  In Spark a naive range
join ``a JOIN b ON a.pos BETWEEN b.start AND b.end`` degenerates to a
broadcast-nested-loop (O(n·m) per group key) — fatal at 100 TB.

The scale-safe pattern implemented here is *bin bucketing*: bucket
positions into fixed-width bins and use the bin id as an extra equi-join
key so the planner picks a hash/sort-merge join; the exact range
predicate then filters within each bin.  Intervals spanning k bins are
exploded into k rows (``sequence()``), so each (key, bin) pair meets
only the points in that bin.  Cost drops from O(n·m) per key to
O(n + m + hits), shuffles hash-partition by (key, bin) — skew-resistant
and AQE-splittable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 10 kb mirrors typical exon/panel interval widths in the reference's BED
# data; for generic numeric ranges callers pass an explicit bin size.
DEFAULT_BIN_SIZE = 10_000

_BIN = "__gs_bin"
_ROW = "__gs_row"


def _binned_pairs(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    pos: str,
    start: str,
    end: str,
    bin_size: int,
    pad: int = 0,
    containment_end: str | None = None,
) -> tuple[DataFrame, DataFrame, Column]:
    """Common core: returns (binned_points, binned_intervals, predicate)."""
    pts = points.withColumn(_BIN, (F.col(pos) / bin_size).cast("long"))
    ivs = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                ((F.col(start) - pad) / bin_size).cast("long"),
                ((F.col(end) + pad) / bin_size).cast("long"),
            )
        ),
    )
    cond = pts[_BIN] == ivs[_BIN]
    for k in on:
        cond = cond & (pts[k] == ivs[k])
    if containment_end is None:
        # overlap: start - pad <= pos <= end + pad
        cond = cond & (pts[pos] >= ivs[start] - pad) & (pts[pos] <= ivs[end] + pad)
    else:
        # containment: interval fully contains [pos, containment_end]
        cond = (
            cond
            & (pts[pos] >= ivs[start] - pad)
            & (pts[containment_end] <= ivs[end] + pad)
        )
    return pts, ivs, cond


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    pos: str,
    start: str,
    end: str,
    bin_size: int = DEFAULT_BIN_SIZE,
    pad: int = 0,
) -> DataFrame:
    """Inner join points to every overlapping interval.

    Matches the semantics of GRanges ``findOverlaps`` / ``bedtools
    intersect -wa -wb`` (reference: genie_registry/bed.py:154-241).
    ``on`` is the equi part (e.g. chromosome [+ panel]); the range part
    is ``start - pad <= pos <= end + pad``.  An interval spanning
    multiple bins meets a point in exactly one bin (the point's), so no
    dedup is needed for point-vs-interval joins.
    """
    pts, ivs, cond = _binned_pairs(points, intervals, on, pos, start, end, bin_size, pad)
    out = pts.join(ivs, cond, "inner")
    # drop helper bins and the duplicate equi-key columns from the right side
    return out.drop(ivs[_BIN]).drop(pts[_BIN]).drop(*[ivs[k] for k in on])


def interval_semi_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    pos: str,
    start: str,
    end: str,
    bin_size: int = DEFAULT_BIN_SIZE,
    pad: int = 0,
) -> DataFrame:
    """Points that overlap at least one interval (GRanges ``%over%``,
    reference R/MAFinBED.R:126-132).  Semi join ⇒ no row duplication."""
    pts, ivs, cond = _binned_pairs(points, intervals, on, pos, start, end, bin_size, pad)
    return pts.join(ivs, cond, "left_semi").drop(_BIN)


def interval_anti_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    pos: str,
    start: str,
    end: str,
    bin_size: int = DEFAULT_BIN_SIZE,
    pad: int = 0,
) -> DataFrame:
    """Points overlapping NO interval — the MAFinBED "remove" set
    (reference R/MAFinBED.R:133-136: ``removeVariants = maf[!overlap]``)."""
    pts, ivs, cond = _binned_pairs(points, intervals, on, pos, start, end, bin_size, pad)
    return pts.join(ivs, cond, "left_anti").drop(_BIN)


def overlap_semi_join(
    ranges: DataFrame,
    intervals: DataFrame,
    on: list[str],
    start_left: str,
    end_left: str,
    start: str,
    end: str,
    bin_size: int = DEFAULT_BIN_SIZE,
    how: str = "left_semi",
) -> DataFrame:
    """Left ranges overlapping ANY right interval (``bedtools intersect
    -wa`` / GRanges any-overlap with a range on BOTH sides, reference
    genie_registry/bed.py:154-241).  Both sides explode over their
    covered bins (overlapping ranges share ≥1 bin); a pair meeting in
    several bins collapses because the semi/anti join keeps each
    exploded left row at most once and the trailing distinct-by-row
    removes the bin multiplicity.  ``how='left_anti'`` gives the
    no-overlap complement.
    """
    from genie_spark.functions.ids import with_stable_uid

    uid = "__gs_ov_uid"
    # Content-derived uid: deterministic under task retries (a
    # monotonically_increasing_id referenced on both sides of the
    # join-back could re-assign between attempts).  Full-duplicate rows
    # share a uid — harmless for semi/anti semantics (kept/dropped
    # together either way).
    left = with_stable_uid(ranges, uid)
    lspread = left.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                (F.col(start_left) / bin_size).cast("long"),
                (F.col(end_left) / bin_size).cast("long"),
            )
        ),
    )
    ispread = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                (F.col(start) / bin_size).cast("long"),
                (F.col(end) / bin_size).cast("long"),
            )
        ),
    )
    cond = lspread[_BIN] == ispread[_BIN]
    for k in on:
        cond = cond & (lspread[k] == ispread[k])
    cond = cond & (lspread[start_left] <= ispread[end]) & (
        lspread[end_left] >= ispread[start]
    )
    hit = lspread.join(ispread, cond, "left_semi").select(uid).distinct()
    if how == "left_semi":
        return left.join(hit, uid, "left_semi").drop(uid)
    if how == "left_anti":
        return left.join(hit, uid, "left_anti").drop(uid)
    raise ValueError(f"how must be left_semi or left_anti, got {how}")


def containment_join(
    ranges: DataFrame,
    intervals: DataFrame,
    on: list[str],
    start_left: str,
    end_left: str,
    start: str,
    end: str,
    bin_size: int = DEFAULT_BIN_SIZE,
    how: str = "left_semi",
) -> DataFrame:
    """Left ranges fully contained in a right interval — pyranges
    ``intersect(how="containment")`` (reference
    genie/database_to_staging.py:271-273, whitelist variant check).
    """
    pts, ivs, cond = _binned_pairs(
        ranges, intervals, on, start_left, start, end, bin_size,
        containment_end=end_left,
    )
    if how in ("left_semi", "left_anti"):
        return pts.join(ivs, cond, how).drop(_BIN)
    out = pts.join(ivs, cond, how)
    return out.drop(ivs[_BIN]).drop(pts[_BIN]).drop(*[ivs[k] for k in on])


def max_overlap_remap(
    segments: DataFrame,
    genes: DataFrame,
    on: list[str],
    seg_start: str,
    seg_end: str,
    gene_start: str,
    gene_end: str,
    gene_symbol: str,
    min_ratio: float = 0.9,
    bin_size: int = DEFAULT_BIN_SIZE,
    seg_id: str | None = None,
) -> DataFrame:
    """Remap each segment to the gene with maximal overlap ratio.

    Re-expresses the reference's per-row loop ``_get_max_overlap_index``
    / ``_map_position_within_boundary`` (genie_registry/bed.py:250-393):
    a segment maps to the overlapping gene whose overlap/segment-length
    ratio is largest and > ``min_ratio``; ambiguity (several genes tie at
    the max with different symbols) → null symbol.  One range join + one
    window instead of O(rows) pandas loops.

    Returns the segments with a ``remapped_symbol`` column.
    """
    uid = seg_id or "__gs_seg_uid"
    if seg_id:
        segs = segments
    else:
        # Content-derived uid (functions.ids): deterministic under task
        # retries — a monotonically_increasing_id here feeds a groupBy
        # whose upstream can recompute with a different partition
        # layout on retry/AQE re-plan, silently splitting a segment's
        # hit set.  Full-duplicate segments share a uid and collapse to
        # one output row; pass ``seg_id`` to preserve multiplicity.
        from genie_spark.functions.ids import with_stable_uid

        segs = with_stable_uid(segments, uid)
    # range-vs-range overlap: explode BOTH sides over their covered bins —
    # overlapping ranges necessarily share at least one bin.  Multiplicity
    # (a pair meeting in several bins) is collapsed by the groupBy below.
    def _spread(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            _BIN,
            F.explode(
                F.sequence(
                    (F.col(lo) / bin_size).cast("long"),
                    (F.col(hi) / bin_size).cast("long"),
                )
            ),
        )

    pts = _spread(segs, seg_start, seg_end)
    ivs = _spread(genes, gene_start, gene_end)
    cond = pts[_BIN] == ivs[_BIN]
    for k in on:
        cond = cond & (pts[k] == ivs[k])
    cond = cond & (pts[seg_start] <= ivs[gene_end]) & (pts[seg_end] >= ivs[gene_start])
    joined = pts.join(ivs, cond, "left").drop(ivs[_BIN]).drop(pts[_BIN])
    # Guard on a REAL matched gene: the left join emits one null-gene
    # row per (segment, bin) that met no interval, and least/greatest
    # IGNORE nulls — unguarded, that phantom row computes overlap =
    # segment length (ratio exactly 1.0) and poisons the max.  A hit
    # is a matched gene row carrying a symbol (a matched gene with a
    # null symbol cannot be remapped to and is treated as no hit);
    # phantom and null-symbol rows contribute NULL to every aggregate
    # below, so all three reductions see the identical hit set — the
    # oracle's inner-join hits CTE semantics.
    overlap = F.when(
        F.col(gene_start).isNotNull() & F.col(gene_symbol).isNotNull(),
        F.least(F.col(seg_end), F.col(gene_end))
        - F.greatest(F.col(seg_start), F.col(gene_start))
        + F.lit(1),
    )
    ratio = overlap / (F.col(seg_end) - F.col(seg_start) + F.lit(1))
    # ONE shuffle: per segment collect the (ratio, symbol) hits (tens of
    # rows) and resolve max/ambiguity with JVM array expressions.  A
    # window-based formulation costs two extra full shuffles of the hit
    # set — measured 10× slower at sf0.1.
    # Resolve "unique symbol at the max overlap ratio" with two ordered
    # struct aggregates instead of collect_list: max(struct(r, sym)) is
    # the max-ratio hit with the LARGEST symbol, min(struct(-r, sym)) the
    # max-ratio hit with the SMALLEST symbol — ambiguity ⇔ they differ.
    # Unlike collect_list this partial-aggregates map-side, so the
    # shuffle carries one row per (segment, partition) not one per hit.
    # (r15 optimization note: struct-valued min/max buffers force a
    # SortAggregate — a fixed-width string encoding of (overlap,
    # symbol) was tried and also plans SortAggregate, since STRING
    # buffers are not hash-aggregable either; measured a wash, so the
    # clearer struct form stays.)
    r = F.col("__r")
    hi = F.max(F.when(r.isNotNull(), F.struct(r.alias("r"), F.col(gene_symbol).alias("s"))))
    lo = F.min(F.when(r.isNotNull(), F.struct((-r).alias("nr"), F.col(gene_symbol).alias("s"))))
    hits = (
        joined.withColumn("__r", ratio)
        .groupBy(uid, *[pts[k] for k in on], seg_start, seg_end)
        .agg(F.max("__r").alias("__mr"), hi.alias("__hi"), lo.alias("__lo"))
    )
    # unique symbol at the max ratio and ratio > min_ratio → symbol; else
    # null (ambiguous or weak overlap — reference bed.py:357-366)
    best = (
        hits.withColumn(
            "remapped_symbol",
            F.when(
                (F.col("__hi.s") == F.col("__lo.s")) & (F.col("__mr") > min_ratio),
                F.col("__hi.s"),
            ).otherwise(F.lit(None).cast("string")),
        )
        .drop("__hi", "__lo", "__mr")
    )
    if not seg_id:
        best = best.drop(uid)
    return best
