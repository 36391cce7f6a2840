"""Z-order layout (io/layout.py): bit-exact Morton keys, and the
data-skipping claim itself — a Z-ordered table prunes on EVERY
clustered dimension where a lexicographic sort prunes on one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from genie_spark.io.layout import (
    with_zorder,
    write_zordered,
    zorder_shift,
)


def _interleave(codes, n_bits):
    z = 0
    n = len(codes)
    for i, c in enumerate(codes):
        for b in range(n_bits):
            z |= ((c >> b) & 1) << (b * n + i)
    return z


def test_zorder_key_matches_python_model(spark):
    rows = [(0, 0), (1, 2), (7, 5), (100, 255), (255, 0), (255, 255)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = {
        (r["a"], r["b"]): r["__z"]
        for r in with_zorder(df, ["a", "b"], n_bits=8).collect()
    }
    # bounds are data-derived: lo=0, hi=255 for a; lo=0, hi=255 for b
    sa = zorder_shift(0, 255, 8)
    sb = zorder_shift(0, 255, 8)
    assert sa == 0 and sb == 0
    for a, b in rows:
        assert out[(a, b)] == _interleave([a, b], 8), (a, b)


def test_zorder_shift_quantizes_wide_ranges(spark):
    """A span wider than 2^n_bits drops low bits; codes stay in
    [0, 2^n_bits) and the key still matches the model."""
    rows = [(i * 1000, i) for i in range(20)]
    df = spark.createDataFrame(rows, ["a", "b"])
    n_bits = 4
    sa = zorder_shift(0, 19_000, n_bits)  # span 19000 → 15 bits → shift 11
    assert sa == 11
    sb = zorder_shift(0, 19, n_bits)  # span 19 → 5 bits → shift 1
    out = {
        (r["a"], r["b"]): r["__z"]
        for r in with_zorder(df, ["a", "b"], n_bits=n_bits).collect()
    }
    for a, b in rows:
        ca, cb = a >> sa, b >> sb
        assert ca < 2**n_bits and cb < 2**n_bits
        assert out[(a, b)] == _interleave([ca, cb], n_bits)


def test_zorder_guards(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError, match="64-bit"):
        with_zorder(df, ["a", "b"], n_bits=32)
    with pytest.raises(ValueError, match="ranges missing"):
        with_zorder(df, ["a", "b"], ranges={"a": (0, 1)})
    with pytest.raises(ValueError, match="empty input or all-null"):
        with_zorder(df.where(F.col("a") > 99), ["a"])


def test_zorder_prunes_both_dims_lexicographic_only_one(spark, tmp_path):
    """The layout claim, measured through the txn log's file stats:
    on a uniform 2-D grid written as 16 files, a narrow range on
    EITHER dimension prunes most Z-ordered files, while the
    lexicographic (a, b)-sorted layout prunes only on a."""
    from genie_spark.io.bronze import rewrite_bronze
    from genie_spark.io.txnlog import LogCommit, snapshot_files

    n, files = 64, 16
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b")
    )

    ztbl = str(tmp_path / "ztbl")
    write_zordered(grid, ztbl, ["a", "b"], n_files=files, n_bits=6,
                   commit=LogCommit(orphan_grace_s=0.0))

    lextbl = str(tmp_path / "lextbl")
    rewrite_bronze(
        grid.repartitionByRange(files, "a", "b").sortWithinPartitions("a", "b"),
        lextbl, commit=LogCommit(orphan_grace_s=0.0),
    )

    def n_files_scanned(table, col):
        return len(snapshot_files(table, ranges={col: (10, 13)}))

    total_z = len(snapshot_files(ztbl))
    total_lex = len(snapshot_files(lextbl))
    assert total_z == files and total_lex == files

    # z-order: narrow range on each dim touches a minority of files
    assert n_files_scanned(ztbl, "a") <= files // 2
    assert n_files_scanned(ztbl, "b") <= files // 2
    # lexicographic: prunes on the leading column only; the trailing
    # column's range matches (nearly) every file
    assert n_files_scanned(lextbl, "a") <= files // 2
    assert n_files_scanned(lextbl, "b") >= files - 1
    # and pruning is SAFE: the pruned scan returns exactly the rows
    from genie_spark.io.txnlog import read_snapshot

    got = sorted(
        (r["a"], r["b"])
        for r in read_snapshot(spark, ztbl, ranges={"b": (10, 13)})
        .where(F.col("b").between(10, 13))
        .collect()
    )
    assert got == sorted((a, b) for a in range(n) for b in range(10, 14))


def test_zorder_string_dictionary_matches_model(spark):
    """String dims dictionary-encode to their 1-based sorted rank;
    the key equals the python interleave of (rank, numeric code)."""
    centers = ["GOLD", "DFCI", "MSK", "UHN", "VICC", "JHU", "NKI", "WAKE"]
    rows = [(c, i) for i, c in enumerate(centers) for _ in range(2)]
    df = spark.createDataFrame(rows, ["center", "x"])
    out = {
        (r["center"], r["x"]): r["__z"]
        for r in with_zorder(df, ["center", "x"], n_bits=4).collect()
    }
    sorted_c = sorted(centers)
    # dict span = len(vals) = 8 → 4 bits, no shift; x span 7 → no shift
    for c, x in rows:
        rank = sorted_c.index(c) + 1
        assert out[(c, x)] == _interleave([rank, x], 4), (c, x)


def test_zorder_string_cardinality_guard(spark):
    """Above ZDICT_MAX distinct values the literal-dictionary path
    refuses with the workaround named."""
    from genie_spark.io.layout import ZDICT_MAX

    df = spark.range(ZDICT_MAX + 10).select(
        F.format_string("v%05d", F.col("id")).alias("s"), F.col("id").alias("x")
    )
    with pytest.raises(ValueError, match="pre-encode a numeric code"):
        with_zorder(df, ["s", "x"], n_bits=8)


def test_zorder_string_dim_prunes_files(spark, tmp_path):
    """layout_zorder_str: a (string, numeric) Z-ordered table prunes
    on BOTH dims through the txn-log stats — the string column's
    footer min/max stay narrow because the dictionary rank order IS
    the lexicographic order."""
    from genie_spark.io.txnlog import LogCommit, read_snapshot, snapshot_files

    n, files = 16, 16
    letters = [f"{chr(ord('a') + i)}{chr(ord('a') + i)}" for i in range(n)]
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("ci"),
            (F.col("id") / n).cast("long").alias("b"),
        )
        .select(
            F.element_at(F.lit(letters), (F.col("ci") + 1).cast("int")).alias("s"),
            "b",
        )
    )
    ztbl = str(tmp_path / "zstr")
    write_zordered(grid, ztbl, ["s", "b"], n_files=files, n_bits=4,
                   commit=LogCommit(orphan_grace_s=0.0))
    assert len(snapshot_files(ztbl)) == files
    # narrow range on the STRING dim and on the numeric dim each
    # touch a minority of files (a point-ish range — same ~1/16
    # selectivity as the numeric pruning test)
    assert len(snapshot_files(ztbl, ranges={"s": ("cc", "cc")})) <= files // 2
    assert len(snapshot_files(ztbl, ranges={"b": (2, 3)})) <= files // 2
    # pruning stays safe: pruned scan + exact filter == exact rows
    got = sorted(
        (r["s"], r["b"])
        for r in read_snapshot(spark, ztbl, ranges={"s": ("cc", "ee")})
        .where(F.col("s").between("cc", "ee"))
        .collect()
    )
    assert got == sorted(
        (s, b) for s in letters if "cc" <= s <= "ee" for b in range(n)
    )


def test_hilbert_key_bijection_adjacency_and_nulls(spark):
    """X76: on the full 2^5 × 2^5 grid the Hilbert key is a bijection
    onto 0..1023 and CONSECUTIVE keys are always grid-ADJACENT
    (Manhattan distance 1 — the defining locality property Z-order
    lacks at power-of-two seams); a null clustering value yields a
    null key; guards fire on strings / >2 cols / oversized bits."""
    import pytest
    from pyspark.sql import functions as F

    from genie_spark.io.layout import with_hilbert, with_zorder

    n = 32
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    rng = {"x": (0, n - 1), "y": (0, n - 1)}
    out = with_hilbert(grid, ["x", "y"], n_bits=5, ranges=rng)
    rows = {r["__h"]: (r["x"], r["y"]) for r in out.collect()}
    assert sorted(rows) == list(range(n * n))  # bijection
    assert all(
        abs(rows[d][0] - rows[d + 1][0]) + abs(rows[d][1] - rows[d + 1][1]) == 1
        for d in range(n * n - 1)
    )
    # Z-order on the same grid BREAKS adjacency (the seam jumps) —
    # the measured reason Hilbert exists
    z = with_zorder(grid, ["x", "y"], n_bits=5, ranges=rng)
    zrows = {r["__z"]: (r["x"], r["y"]) for r in z.collect()}
    z_breaks = sum(
        abs(zrows[d][0] - zrows[d + 1][0]) + abs(zrows[d][1] - zrows[d + 1][1]) != 1
        for d in range(n * n - 1)
    )
    assert z_breaks > 0
    # nulls
    withnull = spark.createDataFrame(
        [(1, 2), (None, 3)], "x long, y long"
    )
    got = {r["y"]: r["__h"] for r in with_hilbert(
        withnull, ["x", "y"], n_bits=4, ranges={"x": (0, 15), "y": (0, 15)}
    ).collect()}
    assert got[3] is None and got[2] is not None
    with pytest.raises(ValueError, match="two to four"):
        with_hilbert(grid, ["x"], n_bits=4)
    with pytest.raises(ValueError, match="signed key"):
        with_hilbert(grid, ["x", "y"], n_bits=32)
    s = spark.createDataFrame([("a", 1)], "s string, y long")
    with pytest.raises(ValueError, match="pre-encode"):
        with_hilbert(s, ["s", "y"], n_bits=4)


def test_hilbert_prunes_both_dims_and_tightens_boxes(spark, tmp_path):
    """X76 through the txn log's file stats: Hilbert-ordered files
    prune a narrow range on EITHER dimension like Z-order does, AND
    the summed per-file bounding-box area is no worse than Z-order's
    (connected curve intervals → tighter boxes — the measured locality
    claim); pruning stays safe (pruned scan returns exactly the
    rows)."""
    from pyspark.sql import functions as F

    from genie_spark.io.layout import write_hilbert_ordered, write_zordered
    from genie_spark.io.txnlog import (
        LogCommit,
        read_snapshot,
        snapshot_actions,
        snapshot_files,
    )

    n, files = 64, 16
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b")
    )
    htbl = str(tmp_path / "htbl")
    write_hilbert_ordered(grid, htbl, ["a", "b"], n_files=files, n_bits=6,
                          commit=LogCommit(orphan_grace_s=0.0))
    ztbl = str(tmp_path / "ztbl")
    write_zordered(grid, ztbl, ["a", "b"], n_files=files, n_bits=6,
                   commit=LogCommit(orphan_grace_s=0.0))

    assert len(snapshot_files(htbl)) == files
    for col in ("a", "b"):
        assert len(
            snapshot_files(htbl, ranges={col: (10, 13)})
        ) <= files // 2

    def box_area_sum(table):
        total = 0
        for act in snapshot_actions(table).values():
            st = act["stats"]
            total += (
                (int(st["a"]["max"]) - int(st["a"]["min"]) + 1)
                * (int(st["b"]["max"]) - int(st["b"]["min"]) + 1)
            )
        return total

    assert box_area_sum(htbl) <= box_area_sum(ztbl)

    got = sorted(
        (r["a"], r["b"])
        for r in read_snapshot(spark, htbl, ranges={"b": (10, 13)})
        .where(F.col("b").between(10, 13))
        .collect()
    )
    assert got == sorted((a, b) for a in range(n) for b in range(10, 14))


def _skilling_ref(coords, b, n):
    """Scalar reference model of Skilling's axes->Hilbert-index walk
    (AIP Conf. Proc. 707, 2004) — the oracle-of-record for the
    vectorized _hilbert_nd engine."""
    X = list(coords)
    q = 1 << (b - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            if X[i] & q:
                X[0] ^= p
            else:
                t = (X[0] ^ X[i]) & p
                X[0] ^= t
                X[i] ^= t
        q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    q = 1 << (b - 1)
    while q > 1:
        if X[n - 1] & q:
            t ^= q - 1
        q >>= 1
    for i in range(n):
        X[i] ^= t
    d = 0
    for j in range(b):
        for i in range(n):
            d |= ((X[i] >> j) & 1) << (j * n + (n - 1 - i))
    return d


def test_hilbert_3d_bijection_adjacency_and_model(spark):
    """r13 N-D Hilbert (VERDICT r12 item 4): on the full 16^3 grid the
    3-D key is a bijection onto 0..4095, consecutive keys are always
    grid-adjacent (Manhattan distance exactly 1), the vectorized
    engine matches the scalar Skilling reference on every cell, and
    3-col Z-order on the same grid breaks adjacency."""
    from pyspark.sql import functions as F

    from genie_spark.io.layout import with_hilbert, with_zorder

    n = 16
    grid = spark.range(n * n * n).select(
        (F.col("id") % n).alias("x"),
        ((F.col("id") / n).cast("long") % n).alias("y"),
        (F.col("id") / (n * n)).cast("long").alias("z"),
    )
    rng = {c: (0, n - 1) for c in ("x", "y", "z")}
    out = with_hilbert(grid, ["x", "y", "z"], n_bits=4, ranges=rng)
    rows = {r["__h"]: (r["x"], r["y"], r["z"]) for r in out.collect()}
    assert sorted(rows) == list(range(n**3))  # bijection
    assert all(
        sum(abs(a - b) for a, b in zip(rows[d], rows[d + 1])) == 1
        for d in range(n**3 - 1)
    )  # FULL adjacency
    assert all(
        d == _skilling_ref(rows[d], 4, 3) for d in rows
    )  # engine == scalar model
    z = with_zorder(grid, ["x", "y", "z"], n_bits=4, ranges=rng)
    zrows = {r["__z"]: (r["x"], r["y"], r["z"]) for r in z.collect()}
    z_breaks = sum(
        sum(abs(a - b) for a, b in zip(zrows[d], zrows[d + 1])) != 1
        for d in range(n**3 - 1)
    )
    assert z_breaks > 0
    # 4-D smoke: bijection on the 8^4 grid
    m = 8
    g4 = spark.range(m**4).select(
        (F.col("id") % m).alias("a"),
        ((F.col("id") / m).cast("long") % m).alias("b"),
        ((F.col("id") / (m * m)).cast("long") % m).alias("c"),
        (F.col("id") / (m * m * m)).cast("long").alias("d"),
    )
    r4 = {c: (0, m - 1) for c in ("a", "b", "c", "d")}
    h4 = with_hilbert(g4, ["a", "b", "c", "d"], n_bits=3, ranges=r4)
    keys = sorted(r["__h"] for r in h4.collect())
    assert keys == list(range(m**4))


def test_hilbert_3d_prunes_and_tightens_boxes(spark, tmp_path):
    """r13: 3-col Hilbert-ordered files prune a narrow range on ANY of
    the three dimensions through the txn log, and the summed per-file
    bounding-VOLUME is no worse than 3-col Z-order's; pruned scans
    stay exact."""
    from pyspark.sql import functions as F

    from genie_spark.io.layout import write_hilbert_ordered, write_zordered
    from genie_spark.io.txnlog import (
        LogCommit,
        read_snapshot,
        snapshot_actions,
        snapshot_files,
    )

    n, files = 16, 16
    grid = spark.range(n * n * n).select(
        (F.col("id") % n).alias("a"),
        ((F.col("id") / n).cast("long") % n).alias("b"),
        (F.col("id") / (n * n)).cast("long").alias("c"),
    )
    htbl = str(tmp_path / "h3tbl")
    write_hilbert_ordered(grid, htbl, ["a", "b", "c"], n_files=files,
                          n_bits=4, commit=LogCommit(orphan_grace_s=0.0))
    ztbl = str(tmp_path / "z3tbl")
    write_zordered(grid, ztbl, ["a", "b", "c"], n_files=files, n_bits=4,
                   commit=LogCommit(orphan_grace_s=0.0))

    assert len(snapshot_files(htbl)) == files
    for col in ("a", "b", "c"):
        assert len(
            snapshot_files(htbl, ranges={col: (5, 6)})
        ) <= files // 2, col

    def box_volume_sum(table):
        total = 0
        for act in snapshot_actions(table).values():
            st = act["stats"]
            v = 1
            for col in ("a", "b", "c"):
                v *= int(st[col]["max"]) - int(st[col]["min"]) + 1
            total += v
        return total

    assert box_volume_sum(htbl) <= box_volume_sum(ztbl)

    got = sorted(
        (r["a"], r["b"], r["c"])
        for r in read_snapshot(spark, htbl, ranges={"c": (5, 6)})
        .where(F.col("c").between(5, 6))
        .collect()
    )
    assert got == sorted(
        (a, b, c) for a in range(n) for b in range(n) for c in (5, 6)
    )
