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


# string clustering columns are dictionary-encoded with a literal
# sorted-distinct array; beyond this cardinality the per-row
# array_position scan stops being cheap — pre-encode a numeric code
# upstream (or pass ``dicts`` from a metastore) instead
ZDICT_MAX = 1024


def with_zorder(
    df: DataFrame,
    cols: list[str],
    n_bits: int = DEFAULT_BITS,
    ranges: dict[str, tuple[int, int]] | None = None,
    out_col: str = "__z",
    dicts: dict[str, list[str]] | None = None,
) -> DataFrame:
    """``df`` plus the Morton key over clustering columns ``cols``.

    Numeric/date columns quantize by the shift rule (module doc);
    STRING columns are dictionary-encoded: the sorted distinct values
    (≤ ``ZDICT_MAX`` — CENTER-like dimensions, not free text) map to
    their 1-based rank via an ``array_position`` against a literal
    array — narrow, zero-join, and the sort makes the code order the
    lexicographic order, so footer min/max stats on the string column
    itself stay meaningful per file.  Higher-cardinality strings raise
    with the workaround named (pre-encode a numeric code upstream, or
    pass ``dicts`` from a metastore/previous run).

    ``ranges`` supplies {col: (min, max)} for numeric columns and
    ``dicts`` supplies {col: sorted values} for string columns when
    the caller already knows them; anything missing is collected by
    ONE combined aggregate job (one row, dim-sized).  A null value in
    any clustered column yields a null key — the range partitioner
    groups those rows together.
    """
    if not cols:
        raise ValueError("with_zorder: need at least one clustering column")
    if n_bits * len(cols) > 63:
        raise ValueError(
            f"with_zorder: {len(cols)} cols × {n_bits} bits exceeds a signed "
            "64-bit key; lower n_bits"
        )
    dtypes = dict(df.dtypes)
    str_cols = [c for c in cols if dtypes.get(c) == "string"]
    num_cols = [c for c in cols if c not in str_cols]
    dicts = {c: list(v) for c, v in (dicts or {}).items()}
    if ranges is not None:
        missing = [c for c in num_cols if c not in ranges]
        if missing:
            raise ValueError(f"with_zorder: ranges missing for {missing}")
        ranges = dict(ranges)
    else:
        ranges = {}
    need_num = [c for c in num_cols if c not in ranges]
    need_str = [c for c in str_cols if c not in dicts]
    if need_str:
        # Sketch-sized pre-flight BEFORE collect_set ships the full
        # distinct set to the driver in one row: a mistakenly-passed
        # free-text column would otherwise OOM the driver before the
        # exact ZDICT_MAX guard below ever runs.  1.5× slack absorbs
        # the ~5% rsd; anything that slips past is ≤ ~1.5k values and
        # the exact check still catches it harmlessly.
        est = df.agg(
            *[
                F.approx_count_distinct(c).alias(f"ad_{c}")
                for c in need_str
            ]
        ).first()
        for c in need_str:
            if est is not None and (est[f"ad_{c}"] or 0) > ZDICT_MAX * 1.5:
                raise ValueError(
                    f"with_zorder: string column {c!r} has ~{est[f'ad_{c}']} "
                    f"distinct values (>> ZDICT_MAX={ZDICT_MAX}) — refusing "
                    "to collect the dictionary; pre-encode a numeric code "
                    "column upstream or pass dicts={...} from a metastore"
                )
    if need_num or need_str:
        row = df.agg(
            *[
                g
                for c in need_num
                for g in (
                    F.min(F.col(c).cast("long")).alias(f"lo_{c}"),
                    F.max(F.col(c).cast("long")).alias(f"hi_{c}"),
                )
            ],
            *[
                F.sort_array(F.collect_set(F.col(c))).alias(f"dv_{c}")
                for c in need_str
            ],
        ).first()
        if (
            row is None
            or any(row[f"lo_{c}"] is None for c in need_num)
            or any(not row[f"dv_{c}"] for c in need_str)
        ):
            raise ValueError(
                "with_zorder: empty input or all-null clustering column — "
                "no bounds to quantize against"
            )
        for c in need_num:
            ranges[c] = (row[f"lo_{c}"], row[f"hi_{c}"])
        for c in need_str:
            dicts[c] = list(row[f"dv_{c}"])
    for c in str_cols:
        if len(dicts[c]) > ZDICT_MAX:
            raise ValueError(
                f"with_zorder: string column {c!r} has {len(dicts[c])} "
                f"distinct values (> ZDICT_MAX={ZDICT_MAX}) — the literal-"
                "dictionary path is for low-cardinality dimensions; "
                "pre-encode a numeric code column upstream and cluster on "
                "that, or pass dicts={...} from a metastore"
            )
    codes = []
    for c in cols:
        if c in str_cols:
            # 1-based rank in the sorted dictionary; null → null key,
            # like the numeric path
            codes.append(
                F.array_position(
                    F.lit(dicts[c]), F.col(c)
                ).cast("long")
            )
            shift = zorder_shift(0, len(dicts[c]), n_bits)
        else:
            lo, hi = ranges[c]
            shift = zorder_shift(lo, hi, n_bits)
            codes.append(F.col(c).cast("long") - F.lit(int(lo)))
        if shift:
            codes[-1] = F.shiftright(codes[-1], shift)
    return df.withColumn(out_col, zorder_key(codes, n_bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    n_bits: int = DEFAULT_BITS,
    ranges: dict[str, tuple[int, int]] | None = None,
    commit=None,
    dicts: dict[str, list[str]] | None = None,
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols`` into
    ``n_files`` range-partitioned files.

    With ``commit`` (a ``TableCommit``, e.g. ``LogCommit``) the write
    goes through ``rewrite_bronze`` — versioned, per-file stats in the
    log, file-level pruning via ``read_snapshot(ranges=...)``.
    Without, a plain parquet directory (footer stats still serve
    row-group pruning)."""
    z = with_zorder(df, cols, n_bits, ranges, dicts=dicts)
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


def _hilbert_nd(codes: list, bits: int):
    """Vectorized N-D Hilbert index (Skilling, "Programming the
    Hilbert curve", AIP Conf. Proc. 707, 2004 — the Butz/Hamilton
    state walk in transpose form): axes → transpose (inverse-undo +
    Gray encode), then bit-interleave with dim 0 most significant per
    level.  ``codes`` is a list of np.int64 arrays, one per
    dimension, each value in [0, 2^bits).  Pure numpy over the Arrow
    batch — the per-level loop is parameter-axis (bits · n_dims
    iterations), the data axis stays vectorized."""
    import numpy as np

    n = len(codes)
    X = [c.copy() for c in codes]
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            inv = (X[i] & q) != 0
            X[0] = np.where(inv, X[0] ^ p, X[0])
            t = np.where(inv, 0, (X[0] ^ X[i]) & p)
            X[0] ^= t
            X[i] ^= t
        q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    q = 1 << (bits - 1)
    while q > 1:
        t = np.where((X[n - 1] & q) != 0, t ^ (q - 1), t)
        q >>= 1
    for i in range(n):
        X[i] ^= t
    d = np.zeros_like(X[0])
    for j in range(bits):
        for i in range(n):
            d |= ((X[i] >> j) & 1) << (j * n + (n - 1 - i))
    return d


def with_hilbert(
    df: DataFrame,
    cols: list[str],
    n_bits: int = DEFAULT_BITS,
    ranges: dict[str, tuple[int, int]] | None = None,
    out_col: str = "__h",
) -> DataFrame:
    """``df`` plus the HILBERT curve key over two to four numeric
    clustering columns — the locality upgrade over ``with_zorder``
    (Hilbert 1891; Faloutsos & Roseman 1989 showed Hilbert beats
    Z-order on range-query locality because CONSECUTIVE curve cells
    are always grid-ADJACENT — Z-order jumps across the space at
    power-of-two seams, so a file covering one Z interval can span
    two far-apart regions; this is why Databricks' liquid clustering
    moved from Z-order to Hilbert).  Same quantization contract as
    ``with_zorder`` (shift rule, ONE bounds aggregate or caller
    ``ranges``, null column → null key); strings must be pre-encoded
    (the ZDICT path is Z-order-only — pass the numeric code).

    Two dimensions use the classic xy→d state loop (one reflect/swap
    per bit level — kept bit-for-bit stable for the registered 2-D
    oracle); three or four dimensions use Skilling's transpose form
    of the Butz/Hamilton walk (``_hilbert_nd`` — round 13, VERDICT
    r12 item 4).  Either way the state at level k feeds level k−1, so
    a pure column-expression unroll doubles in size per level (the
    round-9 Catalyst-depth class); the engine is therefore a
    vectorized Arrow scan (the X53-arrow documented escape:
    parameter-axis state, not data-axis) — zero exchanges, exact
    int64 throughout, and the DuckDB oracles unroll the same loops as
    materialized CTE steps.
    """
    if not 2 <= len(cols) <= 4:
        raise ValueError(
            "with_hilbert: two to four clustering columns"
        )
    if len(cols) * n_bits > 62:
        raise ValueError(
            f"with_hilbert: {len(cols)}×{n_bits} bits exceeds a signed key"
        )
    dtypes = dict(df.dtypes)
    if any(dtypes.get(c) == "string" for c in cols):
        raise ValueError(
            "with_hilbert: string clustering columns are not supported — "
            "pre-encode a numeric code (the with_zorder ZDICT path is "
            "Z-order-only)"
        )
    if ranges is not None:
        missing = [c for c in cols if c not in ranges]
        if missing:
            raise ValueError(f"with_hilbert: ranges missing for {missing}")
    else:
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
                "with_hilbert: empty input or all-null clustering column"
            )
        ranges = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
    code_cols = []
    for c in cols:
        lo, hi = ranges[c]
        shift = zorder_shift(lo, hi, n_bits)
        code = F.col(c).cast("long") - F.lit(int(lo))
        if shift:
            code = F.shiftright(code, shift)
        code_cols.append(code)
    from pyspark.sql import types as T

    code_names = [f"__c{i}" for i in range(len(code_cols))]
    prepared = df
    for name, code in zip(code_names, code_cols):
        prepared = prepared.withColumn(name, code)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )
    orig_cols = list(df.columns)
    bits = n_bits
    two_d = len(cols) == 2

    def key(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            raw = [pdf[n].to_numpy(dtype="float64") for n in code_names]
            ok = np.logical_and.reduce([np.isfinite(a) for a in raw])
            codes = [np.where(ok, a, 0).astype(np.int64) for a in raw]
            if two_d:
                x, y = codes
                d = np.zeros(len(x), dtype=np.int64)
                s = 1 << (bits - 1)
                while s > 0:
                    rx = ((x & s) > 0).astype(np.int64)
                    ry = ((y & s) > 0).astype(np.int64)
                    d += s * s * ((3 * rx) ^ ry)
                    flip = ry == 0
                    fx = np.where(rx == 1, s - 1 - x, x)
                    fy = np.where(rx == 1, s - 1 - y, y)
                    x, y = (
                        np.where(flip, fy, x),
                        np.where(flip, fx, y),
                    )
                    s >>= 1
            else:
                d = _hilbert_nd(codes, bits)
            out = pdf[orig_cols].copy()
            out[out_col] = pd.array(
                [int(v) if k else None for v, k in zip(d, ok)],
                dtype="Int64",
            )
            yield out

    return prepared.mapInPandas(key, out_schema)


def write_hilbert_ordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    n_bits: int = DEFAULT_BITS,
    ranges: dict[str, tuple[int, int]] | None = None,
    commit=None,
) -> None:
    """Write ``df`` clustered by the HILBERT key of two to four
    numeric ``cols`` into ``n_files`` range-partitioned files — the
    ``write_zordered`` contract on the better-locality curve: every
    file covers one curve interval, and Hilbert intervals are
    CONNECTED grid regions (no power-of-two seam jumps), so per-file
    min/max boxes are tighter and range scans on either column skip
    more files.  ``commit`` behaves as in ``write_zordered``."""
    h = with_hilbert(df, cols, n_bits, ranges)
    ordered = (
        h.repartitionByRange(n_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
    )
    if commit is not None:
        from genie_spark.io.bronze import rewrite_bronze

        rewrite_bronze(ordered, path, commit=commit)
    else:
        ordered.write.mode("overwrite").parquet(path)
