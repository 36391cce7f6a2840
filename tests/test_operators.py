"""Operator unit tests on tiny inline DataFrames — mirrors the
reference's test strategy (small fixtures, exact expected frames;
tests/test_load.py, tests/test_process_functions.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from genie_spark.operators.aggregations import (
    duplicate_keys,
    fill_count_algebra,
    merge_duplicate_values,
)
from genie_spark.operators.filters import anti_filter, group_count_filter, semi_filter
from genie_spark.operators.intervals import (
    interval_anti_join,
    interval_join,
    interval_semi_join,
    max_overlap_remap,
)
from genie_spark.operators.upsert import apply_upsert, upsert_diff
from genie_spark.operators.windows import flag_variants_to_merge, latest_per_key


def rows(df, *cols):
    out = [tuple(r) for r in df.select(*cols).collect()]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_semi_anti_filter(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    keys = spark.createDataFrame([(1,), (3,)], ["k"])
    assert rows(semi_filter(left, keys, "k"), "k") == [(1,), (3,)]
    assert rows(anti_filter(left, keys, "k"), "k") == [(2,)]


def test_group_count_filter(spark):
    df = spark.createDataFrame([("a", i) for i in range(5)] + [("b", 0)], ["g", "x"])
    out = group_count_filter(df, "g", 3)
    assert rows(out, "g") == [("a",)] * 5


def test_interval_join_matches_naive(spark):
    pts = spark.createDataFrame(
        [(i, i % 2, (i * 997) % 1000) for i in range(200)], ["pid", "grp", "pos"]
    )
    ivs = spark.createDataFrame(
        [(j, j % 2, (j * 313) % 900, (j * 313) % 900 + 37) for j in range(40)],
        ["iid", "grp", "s", "e"],
    )
    fast = interval_join(pts, ivs, ["grp"], "pos", "s", "e", bin_size=50)
    naive = pts.alias("p").join(
        ivs.alias("i"),
        (F.col("p.grp") == F.col("i.grp"))
        & (F.col("p.pos") >= F.col("i.s"))
        & (F.col("p.pos") <= F.col("i.e")),
    )
    assert rows(fast, "pid", "iid") == rows(naive, "pid", "iid")
    semi = interval_semi_join(pts, ivs, ["grp"], "pos", "s", "e", bin_size=50)
    anti = interval_anti_join(pts, ivs, ["grp"], "pos", "s", "e", bin_size=50)
    assert semi.count() + anti.count() == pts.count()
    assert semi.count() == naive.select("pid").distinct().count()


def test_interval_join_with_pad(spark):
    pts = spark.createDataFrame([(1, 0, 89), (2, 0, 121), (3, 0, 150)], ["pid", "g", "pos"])
    ivs = spark.createDataFrame([(10, 0, 100, 110)], ["iid", "g", "s", "e"])
    hit = interval_semi_join(pts, ivs, ["g"], "pos", "s", "e", bin_size=10, pad=15)
    # pad 15: [85, 125] → pids 1 and 2 overlap, 3 does not
    assert rows(hit, "pid") == [(1,), (2,)]


def test_max_overlap_remap(spark):
    # seg 1 overlaps gene A fully (ratio 1.0 > 0.9) → A
    # seg 2 overlaps A and B equally at max → ambiguous → null
    # seg 3 overlaps nothing → null
    # seg 4 best overlap (gene B, ratio 20/30) < 0.9 → null
    segs = spark.createDataFrame(
        [(1, 0, 100, 109), (2, 0, 195, 204), (3, 0, 900, 909), (4, 0, 190, 219)],
        ["seg_id", "g", "s", "e"],
    )
    genes = spark.createDataFrame(
        [(0, 50, 199, "A"), (0, 200, 300, "B")], ["g", "gs", "ge", "sym"]
    )
    out = max_overlap_remap(
        segs, genes, ["g"], "s", "e", "gs", "ge", "sym", min_ratio=0.9,
        bin_size=100, seg_id="seg_id",
    )
    got = {r["seg_id"]: r["remapped_symbol"] for r in out.collect()}
    assert got == {1: "A", 2: None, 3: None, 4: None}


def test_upsert_diff(spark):
    existing = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "v", "x"]
    )
    new = spark.createDataFrame([(2, "b", 20), (3, "C", 30), (4, "d", 40)], ["k", "v", "x"])
    diff = upsert_diff(new, existing, keys=["k"])
    got = {r["k"]: r["__change"] for r in diff.collect()}
    assert got == {1: "delete", 3: "update", 4: "insert"}
    merged = apply_upsert(new, existing, keys=["k"])
    assert rows(merged, "k", "v") == [(1, "a"), (2, "b"), (3, "C"), (4, "d")]
    replaced = apply_upsert(new, existing, keys=["k"], delete_missing=True)
    assert rows(replaced, "k") == [(2,), (3,), (4,)]


def test_upsert_diff_null_vs_empty(spark):
    existing = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, "")], "k int, v string")
    diff = upsert_diff(new, existing, keys=["k"])
    assert [r["__change"] for r in diff.collect()] == ["update"]


def test_merge_duplicate_values(spark):
    df = spark.createDataFrame(
        [("g1", "s1", 1.0), ("g1", "s1", 1.0),   # 1 distinct → 1.0
         ("g2", "s1", 0.0), ("g2", "s1", 2.0),   # 2 distinct with 0 → 2.0
         ("g3", "s1", 1.0), ("g3", "s1", 2.0),   # 2 distinct no 0 → null
         ("g4", "s1", 1.0), ("g4", "s1", 2.0), ("g4", "s1", 3.0)],  # 3 → null
        ["gene", "sample", "value"],
    )
    out = merge_duplicate_values(df, ["gene", "sample"], "value")
    got = {r["gene"]: r["merged_value"] for r in out.collect()}
    assert got == {"g1": 1.0, "g2": 2.0, "g3": None, "g4": None}


def test_merge_duplicate_values_scalar_rule_edges(spark):
    # r15 internals change (collect_set → five scalar aggregates):
    # pin the edge cases the set form decided structurally —
    # negative-with-zero picks the nonzero, all-null → null,
    # null-mixed groups ignore nulls, singleton zero stays zero
    df = spark.createDataFrame(
        [("n1", "s", -3.0), ("n1", "s", 0.0),          # {0,-3} → -3
         ("n2", "s", None), ("n2", "s", None),         # all null → null
         ("n3", "s", None), ("n3", "s", 5.0),          # {null,5} → 5
         ("n4", "s", 0.0),                             # {0} → 0
         ("n5", "s", 0.0), ("n5", "s", 1.0), ("n5", "s", 2.0)],  # 3 → null
        "gene string, sample string, value double",
    )
    out = merge_duplicate_values(df, ["gene", "sample"], "value")
    got = {r["gene"]: r["merged_value"] for r in out.collect()}
    assert got == {"n1": -3.0, "n2": None, "n3": 5.0, "n4": 0.0, "n5": None}
    # the optimization's point: plain codegen HashAggregate, no
    # set-valued ObjectHashAggregate shipping per-group arrays
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_max_overlap_remap_unmatched_bin_phantom(spark):
    # r15 regression pin: a segment spanning TWO bins whose only real
    # hit (ratio < min_ratio) lies in one bin while the other bin is
    # empty.  The left join emits a null-gene row for the empty bin,
    # and least/greatest IGNORE nulls — unguarded, that phantom row
    # scores overlap = segment length (ratio 1.0) and poisons the
    # max.  Real hit 96..100 of seg 95..124 → ratio 6/30 < 0.9 → null.
    segs = spark.createDataFrame([(1, 0, 95, 124)], ["seg_id", "g", "s", "e"])
    genes = spark.createDataFrame([(0, 90, 100, "A")], ["g", "gs", "ge", "sym"])
    out = max_overlap_remap(
        segs, genes, ["g"], "s", "e", "gs", "ge", "sym", min_ratio=0.9,
        bin_size=100, seg_id="seg_id",
    )
    got = {r["seg_id"]: r["remapped_symbol"] for r in out.collect()}
    assert got == {1: None}


def test_duplicate_keys(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["k", "v"])
    assert rows(duplicate_keys(df, ["k", "v"]), "k", "n") == [(1, 2)]


def test_fill_count_algebra(spark):
    df = spark.createDataFrame(
        [(1, None, 3.0, 7.0), (2, 10.0, None, 4.0), (3, 10.0, 6.0, None)],
        "id int, d double, r double, a double",
    )
    out = fill_count_algebra(df, "d", "r", "a")
    got = {r["id"]: (r["d"], r["r"], r["a"]) for r in out.collect()}
    assert got == {1: (10.0, 3.0, 7.0), 2: (10.0, 6.0, 4.0), 3: (10.0, 6.0, 4.0)}


def test_latest_per_key(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")], ["k", "t", "v"]
    )
    out = latest_per_key(df, "k", ["t"])
    assert rows(out, "k", "v") == [(1, "new"), (2, "only")]


def test_flag_variants_to_merge(spark):
    # sample S: variants at 100 and 103 (gap = 103-100-1 = 2 bp) with
    # close VAF and codon diff 1 → flagged pair; variant at 500
    # isolated → not flagged.
    df = spark.createDataFrame(
        [
            ("S", "1", 100, 30.0, 100.0, "12/400"),
            ("S", "1", 103, 32.0, 100.0, "13/400"),
            ("S", "1", 500, 30.0, 100.0, "99/400"),
            ("T", "1", 104, 30.0, 100.0, "12/400"),
        ],
        ["Tumor_Sample_Barcode", "Chromosome", "Start_Position",
         "t_alt_count", "t_depth", "Protein_position"],
    )
    out = flag_variants_to_merge(df)
    got = sorted((r["Tumor_Sample_Barcode"], r["Start_Position"]) for r in out.collect())
    assert got == [("S", 100), ("S", 103)]


def test_flag_variants_zero_depth_vaf(spark):
    # zero depth → VAF treated as 1/1 (R/mergecheck_functions.R:120-135)
    df = spark.createDataFrame(
        [
            ("S", "1", 100, 5.0, 0.0, "1"),
            ("S", "1", 102, 5.0, 0.0, "2"),
        ],
        ["Tumor_Sample_Barcode", "Chromosome", "Start_Position",
         "t_alt_count", "t_depth", "Protein_position"],
    )
    assert flag_variants_to_merge(df).count() == 2


def test_cna_symbol_remap(spark):
    from genie_spark.operators.remap import cna_symbol_remap

    cna = spark.createDataFrame(
        [(1, "TP53"), (2, "OLD1"), (3, "NOPE")], ["row_id", "Hugo_Symbol"]
    )
    bed = spark.createDataFrame(
        [("TP53", "TP53"), ("EGFR", "OLD1"), ("AAK1", "OLD1")],
        ["Hugo_Symbol", "ID"],
    )
    got = {
        r["row_id"]: r["remapped_symbol"]
        for r in cna_symbol_remap(cna, bed).collect()
    }
    # direct match keeps; ID match remaps to first (min) symbol; miss → null
    assert got == {1: "TP53", 2: "AAK1", 3: None}


def test_salted_join_matches_plain_join(spark):
    from genie_spark.operators.skew import salted_join

    # one pathologically hot key (90% of rows) + a long tail
    big = spark.range(0, 2000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 'HOT' ELSE concat('k', id % 50) END AS k",
        "id AS payload",
    )
    small = spark.range(0, 50).selectExpr(
        "concat('k', id) AS k", "id * 10 AS dim_val"
    ).union(spark.sql("SELECT 'HOT' AS k, -1 AS dim_val"))

    expect = sorted(
        (r["k"], r["payload"], r["dim_val"])
        for r in big.join(small, "k").collect()
    )
    got = sorted(
        (r["k"], r["payload"], r["dim_val"])
        for r in salted_join(big, small, on=["k"], n_salts=8).collect()
    )
    assert got == expect

    # left join keeps unmatched big-side rows exactly once
    big2 = big.union(spark.sql("SELECT 'NOMATCH' AS k, 0 AS payload"))
    left = salted_join(big2, small, on=["k"], n_salts=8, how="left")
    assert left.count() == big2.join(small, "k", "left").count()


def test_salted_join_rejects_small_side_preserving(spark):
    import pytest as _pytest

    from genie_spark.operators.skew import salted_join

    df = spark.range(2).selectExpr("'k' AS k", "id AS v")
    with _pytest.raises(ValueError, match="big-side-preserving"):
        salted_join(df, df, on=["k"], how="right")


def test_value_count_decreases(spark):
    """Reference check_column_decreases semantics
    (dashboard_table_updater.py:633-807): current restricted to older's
    ids, shared columns only, flag = any value count drops per group."""
    from genie_spark.operators.aggregations import value_count_decreases

    older = spark.createDataFrame(
        [
            ("S1", "SAGE", "Male", "White"),
            ("S2", "SAGE", "Male", "Asian"),
            ("S3", "SAGE", "Female", "White"),
            ("S4", "GOLD", "Male", "White"),
        ],
        "SAMPLE_ID string, CENTER string, SEX string, RACE string",
    )
    current = spark.createDataFrame(
        [
            # S1 flips Male→Female: Male count 2→1 in SAGE ⇒ SEX flagged
            ("S1", "SAGE", "Female", "White"),
            ("S2", "SAGE", "Male", "Asian"),
            ("S3", "SAGE", "Female", "White"),
            ("S4", "GOLD", "Male", "White"),
            # S9 is NEW — must be excluded (not in older), so its values
            # can't mask or cause decreases
            ("S9", "SAGE", "Male", "Black"),
        ],
        "SAMPLE_ID string, CENTER string, SEX string, RACE string",
    )
    out = value_count_decreases(current, older)
    got = {
        (r["CENTER"], r["column"]): r["has_decrease"] for r in out.collect()
    }
    assert got[("SAGE", "SEX")] is True          # Male 2→1
    assert got[("SAGE", "RACE")] is False        # unchanged
    assert got[("GOLD", "SEX")] is False
    assert got[("GOLD", "RACE")] is False
    assert got[("SAGE", "SAMPLE_ID")] is False   # intersection ids stable

    # a column only in one side is ignored (reference: olderdf.get(col))
    cur2 = current.withColumn("NEW_COL", current.SEX)
    cols = {r["column"] for r in value_count_decreases(cur2, older).collect()}
    assert "NEW_COL" not in cols

    # disjoint schemas (no shared columns beyond the group) → empty
    # result, not a stack(0,) parse error
    empty = value_count_decreases(
        current.select("SAMPLE_ID", "CENTER"),
        older.select(F.col("SAMPLE_ID"), F.col("CENTER"), F.col("SEX")),
        columns=["SEX"],  # filters to a column current lacks
    )
    assert empty.collect() == []
    assert empty.columns == ["CENTER", "column", "has_decrease"]


def test_asof_join_semantics(spark):
    """Backward as-of: inclusive at equal ts, max-tiebreak at duplicate
    right ts, null payload atomicity (one right row, never a splice),
    left-join nulls before any right row, null-ts rows handled."""
    from genie_spark.operators.windows import asof_join

    left = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 20), (3, 1, 5), (4, 2, 100), (5, 3, 50), (6, 1, None)],
        "lid long, k long, ts long",
    )
    right = spark.createDataFrame(
        [
            (101, 1, 10, "a"),     # equal-ts to lid=1 → inclusive match
            (102, 1, 15, None),    # null payload value: must surface as
            (103, 1, 15, "c"),     # ... no — 103 wins the 15-ts tie (max rid)
            (104, 2, 300, "z"),    # after lid=4 → no match
            (105, 3, None, "n"),   # null right ts: dropped
        ],
        "rid long, k long, ts long, tag string",
    )
    out = {
        r["lid"]: (r["asof_rid"], r["asof_tag"])
        for r in asof_join(
            left, right, on=["k"], ts_col="ts",
            payload=["rid", "tag"], tiebreak="rid",
        ).collect()
    }
    assert out[1] == (101, "a")        # inclusive: right at ts==left ts
    assert out[2] == (103, "c")        # duplicate ts=15: max rid wins
    assert out[3] == (None, None)      # ts=5 before any right row
    assert out[4] == (None, None)      # only later right rows
    assert out[5] == (None, None)      # right null-ts row dropped
    assert out[6] == (None, None)      # left null ts → null payload


def test_asof_join_null_payload_is_atomic(spark):
    """The matched row's payload is taken wholesale: a null column in
    the newest right row must NOT be backfilled from an older row."""
    from genie_spark.operators.windows import asof_join

    left = spark.createDataFrame([(1, 1, 100)], "lid long, k long, ts long")
    right = spark.createDataFrame(
        [(11, 1, 10, "old"), (12, 1, 50, None)],
        "rid long, k long, ts long, tag string",
    )
    r = asof_join(
        left, right, on=["k"], ts_col="ts", payload=["rid", "tag"], tiebreak="rid"
    ).collect()[0]
    assert r["asof_rid"] == 12 and r["asof_tag"] is None  # not "old"


def test_asof_join_rejects_column_collision(spark):
    from genie_spark.operators.windows import asof_join

    left = spark.createDataFrame([(1, 1, 1, "x")], "lid long, k long, ts long, asof_tag string")
    right = spark.createDataFrame([(2, 1, 1, "y")], "rid long, k long, ts long, tag string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="asof_tag"):
        asof_join(left, right, on=["k"], ts_col="ts", payload=["tag"], tiebreak="rid")


def test_asof_join_validate_tiebreak(spark):
    """validate_tiebreak=True enforces the determinism precondition:
    duplicate right (key, ts, tiebreak) rows (whose payload pick would
    be partition-order-dependent) raise; unique tiebreaks pass."""
    from genie_spark.operators.windows import asof_join

    left = spark.createDataFrame([(1, 1, 5)], "lid long, k long, ts long")
    dup_right = spark.createDataFrame(
        [(7, 1, 3, "a"), (7, 1, 3, "b")], "rid long, k long, ts long, tag string"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not unique"):
        asof_join(
            left, dup_right, on=["k"], ts_col="ts", payload=["tag"],
            tiebreak="rid", validate_tiebreak=True,
        )
    ok_right = spark.createDataFrame(
        [(7, 1, 3, "a"), (8, 1, 3, "b")], "rid long, k long, ts long, tag string"
    )
    out = asof_join(
        left, ok_right, on=["k"], ts_col="ts", payload=["tag"],
        tiebreak="rid", validate_tiebreak=True,
    ).collect()
    assert out[0]["asof_tag"] == "b"  # max-tiebreak row wins


def test_asof_join_duplicate_tiebreak_is_deterministic(spark):
    """Without validation, duplicate (key, ts, tiebreak) rows must
    still resolve DETERMINISTICALLY: the payload struct is the final
    sort key (max struct wins backward, min forward), so the pick is
    partition-layout-invariant — no precondition needed (VERDICT r6
    item 6)."""
    from genie_spark.operators.windows import asof_join

    left = spark.createDataFrame([(1, 1, 5)], "lid long, k long, ts long")
    rows = [(7, 1, 3, t) for t in ("c", "a", "b")]
    base = spark.createDataFrame(
        rows, "rid long, k long, ts long, tag string"
    )
    picks = set()
    for parts in (1, 3, 7):
        out = asof_join(
            left, base.repartition(parts), on=["k"], ts_col="ts",
            payload=["tag"], tiebreak="rid",
        ).collect()
        picks.add(out[0]["asof_tag"])
    assert picks == {"c"}  # max payload struct, every layout

    fwd = set()
    for parts in (1, 3, 7):
        out = asof_join(
            left, base.repartition(parts), on=["k"], ts_col="ts",
            payload=["tag"], tiebreak="rid", direction="forward",
        ).collect()
        # forward never matches ts 3 < 5 — use a later right ts
        fwd.add(out[0]["asof_tag"])
    assert fwd == {None}
    later = spark.createDataFrame(
        [(7, 1, 9, t) for t in ("c", "a", "b")],
        "rid long, k long, ts long, tag string",
    )
    fwd_picks = {
        asof_join(
            left, later.repartition(p), on=["k"], ts_col="ts",
            payload=["tag"], tiebreak="rid", direction="forward",
        ).collect()[0]["asof_tag"]
        for p in (1, 3, 7)
    }
    assert fwd_picks == {"a"}  # min payload struct, every layout


def test_asof_join_forward_direction(spark):
    """Forward as-of: nearest right ts >= left ts, inclusive, min
    tiebreak at a duplicate right ts, null left ts unmatched."""
    from genie_spark.operators.windows import asof_join

    left = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 40), (3, 1, 500), (4, 1, None)],
        "lid long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(11, 1, 10, "a"), (12, 1, 50, "b"), (13, 1, 50, "b2"), (14, 1, 5, "z")],
        "rid long, k long, ts long, tag string",
    )
    out = {
        r["lid"]: (r["asof_rid"], r["asof_tag"])
        for r in asof_join(
            left, right, on=["k"], ts_col="ts",
            payload=["rid", "tag"], tiebreak="rid", direction="forward",
        ).collect()
    }
    assert out[1] == (11, "a")      # inclusive at equal ts
    assert out[2] == (12, "b")      # duplicate ts=50: MIN rid wins
    assert out[3] == (None, None)   # nothing at/after 500
    assert out[4] == (None, None)   # null left ts


def test_asof_join_map_payload_skips_struct_tiebreak(spark):
    """A map-typed payload column cannot join the sort order (maps are
    unorderable) — the struct tiebreak is skipped automatically and
    the join still works; validate_tiebreak remains the determinism
    guard there (code-review r7 regression: the unconditional sort key
    raised AnalysisException at plan time)."""
    from genie_spark.operators.windows import asof_join

    left = spark.createDataFrame([(1, 1, 5)], "lid long, k long, ts long")
    right = spark.createDataFrame(
        [(7, 1, 3, {"x": "a"}), (8, 1, 4, {"x": "b"})],
        "rid long, k long, ts long, m map<string,string>",
    )
    out = asof_join(
        left, right, on=["k"], ts_col="ts", payload=["m"], tiebreak="rid",
        validate_tiebreak=True,
    ).collect()
    assert out[0]["asof_m"] == {"x": "b"}  # latest ts <= 5 wins
