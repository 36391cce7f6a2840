"""Multi-dimensional data layout: Z-order (Morton) clustering for
file-level data skipping.

A table sorted lexicographically by (A, B) gives parquet min/max
footer stats that prune scans filtering on A — but a filter on B
alone matches every file (each file spans B's whole range).  Z-order
interleaves the BITS of the clustering columns so files hold points
that are close in EVERY dimension: min/max stats stay narrow per file
in each column, and a range filter on any clustered column (or any
conjunction) skips most files.  This is the published lakehouse
layout strategy (Morton 1966; Delta Lake's OPTIMIZE ZORDER BY,
Iceberg's zorder rewrite) re-expressed as pure Spark column
expressions — the reference engine has no layout optimizer; this is
§2.13 extension surface for the 100 TB posture, where scan pruning is
the difference between touching 4 files and 4,000.

Mechanics, exact and engine-portable (every step integer — no float
quantization, so the DuckDB oracle reproduces keys bit-for-bit):

1. column bounds from ONE tiny aggregate (`.first()` — a 1-row,
   dim-sized collect, the same contract as the merge's partition
   values); callers with a metastore pass ``ranges`` and skip the job.
2. per column, an integer CODE in [0, 2^n_bits):
   ``(x − min) >> max(0, bit_length(max − min) − n_bits)`` — a pure
   right shift drops the low bits that don't fit; monotone, exact,
   overflow-free at any magnitude.
3. the Z key interleaves code bits: bit b of column i lands at
   position ``b·n_cols + i`` — a fixed fan of shift/mask/or terms the
   optimizer folds into one codegen stage (no UDF, no shuffle).
4. ``write_zordered`` range-partitions by Z (Spark samples quantiles —
   skew-robust FILE boundaries regardless of value skew) and sorts
   within partitions, so every file covers one compact Z interval ⇒ a
   compact region of the clustered space ⇒ narrow per-file min/max in
   every clustered column.

Value-skew caveat (documented, deliberate): step 2 is value-scaled,
so a heavily skewed column concentrates codes in few cells; the range
partitioner still balances file SIZES (it splits on Z quantiles),
only stat tightness degrades toward the skew.  The rank-based
alternative (ntile per column) costs one full window shuffle per
column; at 100 TB the shift map is the right default and the hook
stays open via precomputed ``ranges``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def zorder_shift(lo: int, hi: int, n_bits: int) -> int:
    """How many low bits the quantizer drops so (hi − lo) fits in
    ``n_bits``: max(0, bit_length(span) − n_bits)."""
    span = int(hi) - int(lo)
    if span < 0:
        raise ValueError(f"zorder_shift: hi < lo ({hi} < {lo})")
    return max(0, span.bit_length() - n_bits)


def zorder_key(
    codes: list[Column], n_bits: int = DEFAULT_BITS
) -> Column:
    """Interleave already-quantized integer codes into one Morton key:
    bit b of codes[i] → bit b·len(codes)+i.  Pure expression fan —
    n_bits·n_cols shift/and/shift terms, zero-shuffle, codegen-fused."""
    n_cols = len(codes)
    terms = [
        F.shiftleft(
            F.shiftright(codes[i], b).bitwiseAND(F.lit(1)),
            b * n_cols + i,
        )
        for i in range(n_cols)
        for b in range(n_bits)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms, F.lit(0).cast("long"))


def with_zorder(
    df: DataFrame,
    cols: list[str],
    n_bits: int = DEFAULT_BITS,
    ranges: dict[str, tuple[int, int]] | None = None,
    out_col: str = "__z",
) -> DataFrame:
    """``df`` plus the Morton key over integer columns ``cols``.

    ``ranges`` supplies {col: (min, max)} when the caller already
    knows them; otherwise ONE aggregate job collects all bounds (one
    row).  A null value in any clustered column yields a null key —
    the range partitioner groups those rows together.
    """
    if not cols:
        raise ValueError("with_zorder: need at least one clustering column")
    if n_bits * len(cols) > 63:
        raise ValueError(
            f"with_zorder: {len(cols)} cols × {n_bits} bits exceeds a signed "
            "64-bit key; lower n_bits"
        )
    if ranges is None:
        row = df.agg(
            *[
                g
                for c in cols
                for g in (
                    F.min(F.col(c).cast("long")).alias(f"lo_{c}"),
                    F.max(F.col(c).cast("long")).alias(f"hi_{c}"),
                )
            ]
        ).first()
        if row is None or any(row[f"lo_{c}"] is None for c in cols):
            raise ValueError(
                "with_zorder: empty input or all-null clustering column — "
                "no bounds to quantize against"
            )
        ranges = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
    else:
        missing = [c for c in cols if c not in ranges]
        if missing:
            raise ValueError(f"with_zorder: ranges missing for {missing}")
    codes = []
    for c in cols:
        lo, hi = ranges[c]
        shift = zorder_shift(lo, hi, n_bits)
        codes.append(
            F.shiftright(F.col(c).cast("long") - F.lit(int(lo)), shift)
        )
    return df.withColumn(out_col, zorder_key(codes, n_bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    n_bits: int = DEFAULT_BITS,
    ranges: dict[str, tuple[int, int]] | None = None,
    commit=None,
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols`` into
    ``n_files`` range-partitioned files.

    With ``commit`` (a ``TableCommit``, e.g. ``LogCommit``) the write
    goes through ``rewrite_bronze`` — versioned, per-file stats in the
    log, file-level pruning via ``read_snapshot(ranges=...)``.
    Without, a plain parquet directory (footer stats still serve
    row-group pruning)."""
    z = with_zorder(df, cols, n_bits, ranges)
    ordered = (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    if commit is not None:
        from genie_spark.io.bronze import rewrite_bronze

        rewrite_bronze(ordered, path, commit=commit)
    else:
        ordered.write.mode("overwrite").parquet(path)
