"""KMV distinct-sketch tests: accuracy, mergeability, determinism."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from genie_spark.analytics.sketches import (
    KMV_DENOM,
    kmv_hash,
    kmv_merge,
    kmv_sketch,
    kmv_union_estimate,
)


def _values(spark, groups):
    """groups: {group: n_distinct}; each value appears twice (repeats
    must not affect a distinct sketch)."""
    rows = []
    for g, n in groups.items():
        for i in range(n):
            rows.append((g, f"{g}-value-{i}"))
            rows.append((g, f"{g}-value-{i}"))
    return spark.createDataFrame(rows, ["source", "text"])


def test_kmv_exact_below_k(spark):
    """A group with fewer than k distinct values gets the EXACT count
    (the sketch holds the whole hash set)."""
    df = _values(spark, {"small": 10})
    row = kmv_sketch(df, k=64).collect()[0]
    assert row["n_seen"] == 10
    assert row["est_distinct"] == 10.0
    assert len(row["kmin"]) == 10


def test_kmv_estimate_accuracy(spark):
    """2000 distinct values, k=64: the Beyer estimator's relative error
    concentrates at ~1/sqrt(k-2) ≈ 13%; assert a generous 3-sigma."""
    df = _values(spark, {"big": 2000})
    row = kmv_sketch(df, k=64).collect()[0]
    assert row["n_seen"] == 64
    assert len(row["kmin"]) == 64
    assert abs(row["est_distinct"] - 2000) / 2000 < 0.4


def test_kmv_merge_equals_global(spark):
    """Sharded build then merge == one global build, bit-for-bit —
    the associativity that makes the artifact composable."""
    df = _values(spark, {"a": 300, "b": 40})
    whole = {r["source"]: r for r in kmv_sketch(df, k=32).collect()}

    shard1 = df.where(F.crc32(F.col("text")) % 2 == 0)
    shard2 = df.where(F.crc32(F.col("text")) % 2 == 1)
    parts = kmv_sketch(shard1, k=32).unionByName(kmv_sketch(shard2, k=32))
    merged = {r["source"]: r for r in kmv_merge(parts, k=32).collect()}

    assert set(merged) == set(whole)
    for g in whole:
        assert merged[g]["kmin"] == whole[g]["kmin"]
        assert merged[g]["n_seen"] == whole[g]["n_seen"]
        assert merged[g]["est_distinct"] == whole[g]["est_distinct"]


def test_kmv_merge_idempotent(spark):
    """Merging a sketch with itself changes nothing (distinct hashes)."""
    df = _values(spark, {"a": 100})
    sk = kmv_sketch(df, k=16)
    twice = kmv_merge(sk.unionByName(sk), k=16).collect()[0]
    once = sk.collect()[0]
    assert twice["kmin"] == once["kmin"]
    assert twice["est_distinct"] == once["est_distinct"]


def test_kmv_union_estimate_over_groups(spark):
    """Union across groups with OVERLAPPING values: the union estimate
    reflects the distinct union, not the sum of group counts."""
    rows = [("a", f"shared-{i}") for i in range(50)] + [
        ("b", f"shared-{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    sk = kmv_sketch(df, k=64)
    u = kmv_union_estimate(sk, k=64).collect()[0]
    assert u["n_seen"] == 50          # not 100 — same hashes dedupe
    assert u["est_distinct"] == 50.0


def test_kmv_hash_matches_reference_md5(spark):
    """The hash is the documented first-15-hex-chars-of-md5 — pin it
    against hashlib so the DuckDB oracle contract can't drift."""
    df = spark.createDataFrame([("g", "hello")], ["source", "text"])
    h = df.select(kmv_hash("text").alias("h")).collect()[0]["h"]
    expected = int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    assert h == expected
    assert 0 <= h < KMV_DENOM


def test_kmv_nulls_and_empty(spark):
    """Null values are excluded; an empty frame yields an empty sketch."""
    df = spark.createDataFrame(
        [("g", "x"), ("g", None), ("h", None)], ["source", "text"]
    )
    out = {r["source"]: r for r in kmv_sketch(df, k=8).collect()}
    assert set(out) == {"g"}
    assert out["g"]["n_seen"] == 1
    empty = spark.createDataFrame([], "source string, text string")
    assert kmv_sketch(empty, k=8).count() == 0


def test_kmv_salted_topk_is_exact(spark):
    """The salted two-phase top-k returns the SAME k smallest distinct
    hashes as a direct global sort, for several salt counts (salting
    is a physical-skew fix, never a semantic change)."""
    df = _values(spark, {"a": 500, "b": 20})
    direct = {r["source"]: r["kmin"] for r in kmv_sketch(df, k=32, n_salts=1).collect()}
    for s in (4, 64, 1024):
        salted = {
            r["source"]: r["kmin"] for r in kmv_sketch(df, k=32, n_salts=s).collect()
        }
        assert salted == direct


def test_kmv_jaccard_exact_when_under_k(spark):
    """Sets smaller than k: the sketch IS the set, so the Jaccard and
    intersection estimates are exact."""
    from genie_spark.analytics.sketches import kmv_jaccard_pairs

    rows = (
        [("a", f"v{i}") for i in range(30)]
        + [("b", f"v{i}") for i in range(20, 50)]   # |A∩B|=10, |A∪B|=50
        + [("c", f"w{i}") for i in range(5)]        # disjoint from both
    )
    df = spark.createDataFrame(rows, ["source", "text"])
    sk = kmv_sketch(df, k=64)
    out = {(r["a"], r["b"]): r for r in kmv_jaccard_pairs(sk, k=64).collect()}
    ab = out[("a", "b")]
    assert ab["n_common"] == 10 and ab["n_union_k"] == 50
    assert ab["jaccard_est"] == 10 / 50
    assert abs(ab["est_intersection"] - 10.0) < 1e-9
    assert out[("a", "c")]["n_common"] == 0
    assert out[("b", "c")]["jaccard_est"] == 0.0


def test_kmv_jaccard_estimates_above_k(spark):
    """Sets much larger than k: the k-sample estimate lands near the
    true Jaccard (1000 ∩ 2000-union → J=0.5; k=64 → σ≈J·(1-J)/√k)."""
    from genie_spark.analytics.sketches import kmv_jaccard_pairs

    rows = [("a", f"v{i}") for i in range(1500)] + [
        ("b", f"v{i}") for i in range(500, 2000)
    ]  # |A∩B|=1000, |A∪B|=2000
    df = spark.createDataFrame(rows, ["source", "text"])
    sk = kmv_sketch(df, k=64)
    r = kmv_jaccard_pairs(sk, k=64).collect()[0]
    assert r["n_union_k"] == 64
    assert abs(r["jaccard_est"] - 0.5) < 0.25
    assert abs(r["est_intersection"] - 1000) / 1000 < 0.5


def test_sampled_quantiles_exact_at_full_sample(spark):
    """sample_bp=10000 → whole table: values equal the exact lower
    quantiles computed by a Python model."""
    from genie_spark.analytics.sketches import sampled_quantiles

    vals = {"a": [5, 1, 9, 3, 7, 2, 8, 4, 6, 10], "b": [100, 300, 200]}
    rows = [
        (g, i * 100 + j, v)
        for i, (g, vs) in enumerate(vals.items())
        for j, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, ["g", "rid", "v"])
    out = {
        (r["g"], r["q"]): (r["quantile_value"], r["n_sample"])
        for r in sampled_quantiles(
            df, "g", "v", "rid", qs=(0.25, 0.5, 0.75, 0.95), sample_bp=10_000
        ).collect()
    }
    import math

    for g, vs in vals.items():
        srt = sorted(vs)
        for q in (0.25, 0.5, 0.75, 0.95):
            expect = srt[math.floor(q * (len(srt) - 1))]
            assert out[(g, q)] == (expect, len(srt)), (g, q)


def test_sampled_quantiles_sample_is_deterministic(spark):
    """The 10% variant picks the same rows on every run/partitioning
    (md5 of the id), so results are rerun-stable."""
    from genie_spark.analytics.sketches import sampled_quantiles

    df = spark.range(2000).selectExpr(
        "'g' AS g", "id AS rid", "CAST(id % 977 AS LONG) AS v"
    )
    a = sorted(
        sampled_quantiles(df, "g", "v", "rid", sample_bp=1_000).collect()
    )
    b = sorted(
        sampled_quantiles(
            df.repartition(13), "g", "v", "rid", sample_bp=1_000
        ).collect()
    )
    assert a == b and len(a) == 4
    n = a[0]["n_sample"]
    assert 100 < n < 350  # ≈10% of 2000, md5-binomial


def test_count_min_overestimates_and_merges(spark):
    """Count-Min contracts: (1) est ≥ true for EVERY queried value,
    with unseen values estimating small (0 unless every row
    collides); (2) shard sketches merged with count_min_merge equal
    the whole-corpus sketch row-for-row (mergeability — the property
    that makes the artifact useful across shards/releases)."""
    from pyspark.sql import functions as F

    from genie_spark.analytics.sketches import (
        count_min_lookup,
        count_min_merge,
        count_min_sketch,
    )

    rows = []
    for i in range(60):
        rows.extend([(f"tok{i % 7}",)] * (i % 3 + 1))  # skewed counts
    occ = spark.createDataFrame(rows, ["value"]).repartition(5)
    width, depth = 64, 3  # narrow width → real collisions
    sk = count_min_sketch(occ, "value", width=width, depth=depth)

    probes = spark.createDataFrame(
        [(f"tok{i}",) for i in range(7)] + [("never-seen",)], ["value"]
    )
    est = {
        r["value"]: r["est_count"]
        for r in count_min_lookup(sk, probes, "value", width=width, depth=depth).collect()
    }
    true = {
        r["value"]: r["cnt"]
        for r in occ.groupBy("value").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for v, t in true.items():
        assert est[v] >= t, (v, est[v], t)
    assert est["never-seen"] >= 0

    # mergeability: split by hash of the row, sketch halves, merge
    tagged = occ.withColumn("half", F.abs(F.xxhash64("value")) % 2)
    s0 = count_min_sketch(tagged.where("half = 0"), "value", width=width, depth=depth)
    s1 = count_min_sketch(tagged.where("half = 1"), "value", width=width, depth=depth)
    merged = count_min_merge(s0, s1)
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in sk.collect())
    assert a == b


def test_token_budget_select_matches_naive_window(spark):
    """The binned two-pass token_budget_select must keep EXACTLY the
    set the naive global window keeps (docs whose tokens-before in
    (md5(id), id) order are < budget), including the straddling doc;
    budget 0 keeps nothing, a huge budget keeps everything."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from genie_spark.analytics.corpus import token_budget_select
    from genie_spark.analytics.dedup import shingle_hash
    from genie_spark.analytics.text import tokens

    rows = [
        (i, "en" if i % 3 else "fr", " ".join(f"w{i}_{j}" for j in range(i % 11 + 1)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    budget = 150
    got = {
        (r["doc_id"], r["lang"], r["n_tokens"])
        for r in token_budget_select(df, budget, group_col="lang").collect()
    }

    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("__h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = (
        df.select(
            "doc_id",
            "lang",
            shingle_hash(F.col("doc_id").cast("string")).alias("__h"),
            F.size(tokens("text")).cast("long").alias("n_tokens"),
        )
        .withColumn("before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .where(F.col("before") < budget)
    )
    expected = {
        (r["doc_id"], r["lang"], r["n_tokens"]) for r in naive.collect()
    }
    assert got == expected
    assert len({l for _, l, _ in got}) == 2  # both groups represented
    # the greedy fill genuinely truncates: not everything survives
    assert len(got) < 200

    assert token_budget_select(df, 0, group_col="lang").count() == 0
    assert token_budget_select(df, 10**9, group_col="lang").count() == 200


def test_token_budget_dict_budgets(spark):
    """Per-group budget dict: each listed group fills to ITS target,
    unlisted groups get default_budget (0 = dropped)."""
    from pyspark.sql import functions as F

    from genie_spark.analytics.corpus import token_budget_select

    rows = [
        (i, ["en", "fr", "de"][i % 3], " ".join(f"w{i}_{j}" for j in range(10)))
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = token_budget_select(
        df, {"en": 55, "fr": 10**6}, group_col="lang"
    )
    per = {
        r["lang"]: (r["n"], r["tok"])
        for r in out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok"))
        .collect()
    }
    assert "de" not in per                      # unlisted → dropped
    assert per["fr"] == (30, 300)               # huge budget → all kept
    # en fills to its own target: 55 tokens → 6 docs of 10 (greedy
    # includes the straddler)
    assert per["en"] == (6, 60)
    # default_budget resurrects unlisted groups
    out2 = token_budget_select(
        df, {"en": 55}, group_col="lang", default_budget=25
    )
    per2 = {
        r["lang"]: r["n"]
        for r in out2.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per2["de"] == 3 and per2["fr"] == 3  # 25 tokens → 3 docs


def test_token_budget_zero_token_docs_at_boundary(spark):
    """Zero-token documents must obey the strict naive rule: budget 0
    keeps NOTHING (even empty-text docs), and an unlisted group under
    a dict budget with default 0 is fully dropped even when it
    contains empty docs (code-review r7: the <= whole-bin condition
    kept them)."""
    from genie_spark.analytics.corpus import token_budget_select

    df = spark.createDataFrame(
        [(1, "en", ""), (2, "en", "one two"), (3, "fr", "   "), (4, "fr", "a b c")],
        "doc_id long, lang string, text string",
    )
    assert token_budget_select(df, 0, group_col="lang").count() == 0
    out = token_budget_select(df, {"fr": 100}, group_col="lang").collect()
    assert {r["lang"] for r in out} == {"fr"}
    # exact-boundary: budget equal to the group's leading tokens —
    # a trailing zero-token doc whose tokens_before == budget drops
    df2 = spark.createDataFrame(
        [(i, "en", "t1 t2") for i in range(10)] + [(99, "en", "")],
        "doc_id long, lang string, text string",
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from genie_spark.analytics.dedup import shingle_hash
    from genie_spark.analytics.text import tokens as _tok

    for budget in (2, 4, 20, 22):
        got = {
            r["doc_id"]
            for r in token_budget_select(df2, budget, group_col="lang").collect()
        }
        w = (
            Window.partitionBy("lang")
            .orderBy(F.col("__h").asc(), F.col("doc_id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        naive = (
            df2.select(
                "doc_id", "lang",
                shingle_hash(F.col("doc_id").cast("string")).alias("__h"),
                F.size(_tok("text")).cast("long").alias("n_tokens"),
            )
            .withColumn("before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
            .where(F.col("before") < budget)
        )
        assert got == {r["doc_id"] for r in naive.collect()}, budget


def test_token_budget_group_cardinality_guard(spark, monkeypatch):
    """A doc-level group_col must raise a descriptive error instead of
    broadcasting a groups-sized artifact, and a legitimate group count
    near the cap shrinks the bin bits (result unchanged — binning is
    pure execution strategy) rather than failing (ADVICE r7)."""
    import pytest as _pytest

    from genie_spark.analytics import corpus

    df = spark.createDataFrame(
        [(i, f"g{i}", "tok " * 3) for i in range(64)],
        "doc_id long, lang string, text string",
    )
    monkeypatch.setattr(corpus, "_BUDGET_BROADCAST_MAX", 16)
    with _pytest.raises(ValueError, match="dim-sized by contract"):
        corpus.token_budget_select(df, 10, group_col="lang")

    # 4 groups under a 16-row cap: bits shrink from 12 to 2; the kept
    # set must equal the default-bits run on the same corpus
    df4 = spark.createDataFrame(
        [(i, f"g{i % 4}", "tok " * (i % 5 + 1)) for i in range(40)],
        "doc_id long, lang string, text string",
    )
    got = {
        r["doc_id"]
        for r in corpus.token_budget_select(df4, 9, group_col="lang").collect()
    }
    monkeypatch.setattr(corpus, "_BUDGET_BROADCAST_MAX", 1 << 22)
    want = {
        r["doc_id"]
        for r in corpus.token_budget_select(df4, 9, group_col="lang").collect()
    }
    assert got == want


def test_hll_registers_match_python_model(spark):
    """hll_sketch's (reg, rho) rows equal a pure-Python md5 model:
    top-p register bits, rank = rho-field bits − base-2 length + 1,
    max-merged per register — the exact arithmetic the DuckDB oracle
    unrolls."""
    import hashlib

    from genie_spark.analytics.sketches import HLL_P, hll_sketch

    vals = [f"tok{i}" for i in range(500)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "source string, value string"
    )
    got = {
        (r["reg"], r["rho"])
        for r in hll_sketch(df, "source", "value").collect()
    }
    rho_bits = 60 - HLL_P
    model: dict[int, int] = {}
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        reg, low = h >> rho_bits, h & ((1 << rho_bits) - 1)
        rho = (rho_bits + 1) if low == 0 else rho_bits - low.bit_length() + 1
        model[reg] = max(model.get(reg, 0), rho)
    assert got == set(model.items())


def test_hll_merge_law_and_estimate_accuracy(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) bit-for-bit (the
    mergeable-artifact contract), and the raw estimator lands within
    ~3·(1.04/√m) of the true distinct count at 20k values."""
    from pyspark.sql import functions as F

    from genie_spark.analytics.sketches import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    a = spark.range(12_000).select(
        F.lit("g").alias("source"),
        F.concat(F.lit("v"), F.col("id")).alias("value"),
    )
    b = spark.range(8_000, 20_000).select(
        F.lit("g").alias("source"),
        F.concat(F.lit("v"), F.col("id")).alias("value"),
    )
    merged = hll_merge(
        hll_sketch(a, "source", "value"),
        hll_sketch(b, "source", "value"),
        "source",
    )
    whole = hll_sketch(a.unionByName(b), "source", "value")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }
    est = hll_estimate(whole, "source").first()["est_distinct"]
    assert abs(est - 20_000) / 20_000 < 0.10  # 3σ ≈ 0.0975 at m=1024

    import pytest as _pytest

    with _pytest.raises(ValueError, match="outside"):
        hll_sketch(a, "source", "value", p=2)


# ---------------------------------------------------------------------------
# X43 bounded-memory exact heavy hitters
# ---------------------------------------------------------------------------


def _token_df(spark, counts):
    rows = [(t,) for t, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, ["token"]).repartition(4)


def test_heavy_hitters_exact_vs_naive(spark):
    """Result equals the naive full groupBy + threshold, regardless of
    how tokens were partitioned."""
    from genie_spark.analytics.sketches import heavy_hitters

    counts = {f"tok{i}": (i + 1) * 7 for i in range(40)}
    counts["whale"] = 2_000
    counts["shark"] = 900
    df = _token_df(spark, counts)
    total = sum(counts.values())
    got = {
        (r["token"], r["cnt"])
        for r in heavy_hitters(df, m=64, min_share_bp=200).collect()
    }
    want = {
        (t, c) for t, c in counts.items() if c * 10_000 >= 200 * total
    }
    assert got == want
    assert ("whale", 2_000) in got


def test_heavy_hitters_partitioning_invariant(spark):
    """The exact verify pass makes the output identical across 1 vs
    many partitions (candidates may differ; results must not)."""
    from genie_spark.analytics.sketches import heavy_hitters

    counts = {f"t{i}": 5 for i in range(200)}
    counts["big"] = 400
    one = _token_df(spark, counts).coalesce(1)
    many = _token_df(spark, counts).repartition(16)
    r1 = sorted(map(tuple, heavy_hitters(one, m=64, min_share_bp=200).collect()))
    r2 = sorted(map(tuple, heavy_hitters(many, m=64, min_share_bp=200).collect()))
    assert r1 == r2 and [t for t, _, _ in r1] == ["big"]


def test_heavy_hitters_exactly_two_stream_passes(spark):
    """The token stream is read EXACTLY twice (MG summary pass + exact
    verify pass): the global N rides along with the candidates as
    per-partition count rows, so the round-8 third ``count()`` scan is
    gone.  Pinned with a pass-through mapInPandas tap that counts every
    row evaluation through an accumulator — AQE-proof, unlike job
    counting."""
    from genie_spark.analytics.sketches import heavy_hitters

    counts = {f"t{i}": 5 for i in range(50)}
    counts["big"] = 300
    df = _token_df(spark, counts)
    acc = spark.sparkContext.accumulator(0)

    def tap(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    tapped = df.mapInPandas(tap, schema="token string")
    res = heavy_hitters(tapped, m=64, min_share_bp=200).collect()
    total = sum(counts.values())
    assert [r["token"] for r in res] == ["big"]
    assert acc.value == 2 * total


def test_misra_gries_candidates_cover_heavy_tokens(spark):
    """Every token above the global N/(m+1) bar appears in the
    candidate union (the pigeonhole guarantee), with a small m that
    actually forces decrements."""
    from genie_spark.analytics.sketches import misra_gries_candidates

    counts = {f"noise{i}": 2 for i in range(60)}
    counts.update({"h1": 90, "h2": 70})
    df = _token_df(spark, counts)
    m = 8
    total = sum(counts.values())
    cand = {r["token"] for r in misra_gries_candidates(df, m=m).collect()}
    for t, c in counts.items():
        if c > total / (m + 1):
            assert t in cand, t


def test_heavy_hitters_m_threshold_guard(spark):
    """(m+1)*min_share_bp must exceed 10_000 or pass 1 could lose a
    qualifying token — asserted loudly."""
    import pytest

    from genie_spark.analytics.sketches import heavy_hitters

    df = _token_df(spark, {"a": 3})
    with pytest.raises(AssertionError, match="m too small"):
        heavy_hitters(df, m=8, min_share_bp=100)


def test_quantile_sketch_merge_equals_rebuild_any_split(spark):
    """X70 merge law: survival is content-determined, so union-then-
    refilter is EXACTLY the sketch of the concatenated stream — for
    any split of the data, any merge order, the artifact (survivor
    set AND level AND n_items) is identical to building once over the
    whole."""
    from genie_spark.analytics.sketches import (
        quantile_level_sketch,
        quantile_sketch_merge,
    )

    df = spark.range(1, 5001).select(
        (F.col("id") * 37 % 9973).alias("v"), F.col("id").alias("k")
    )
    whole = quantile_level_sketch(df, "v", "k", k_max=128)
    want = {(r["v"], r["h60"]) for r in whole.collect()}
    w_meta = whole.select("level", "n_items").first()
    parts = [
        quantile_level_sketch(df.where(F.col("k") % 3 == i), "v", "k", k_max=128)
        for i in range(3)
    ]
    for order in ((0, 1, 2), (2, 0, 1)):
        m = quantile_sketch_merge(parts[order[0]], parts[order[1]], k_max=128)
        m = quantile_sketch_merge(m, parts[order[2]], k_max=128)
        got = m.collect()
        assert {(r["v"], r["h60"]) for r in got} == want
        assert got[0]["level"] == w_meta["level"]
        assert got[0]["n_items"] == w_meta["n_items"] == 5000


def test_quantile_sketch_exact_below_k(spark):
    """X70: with n <= k_max the sketch keeps everything at level 0 and
    the estimates are the EXACT lower quantiles (weight 1, rank
    selection is plain index arithmetic)."""
    from genie_spark.analytics.sketches import (
        quantile_level_sketch,
        quantile_sketch_estimates,
    )

    df = spark.range(1, 101).select(
        F.col("id").alias("v"), F.col("id").alias("k")
    )
    sk = quantile_level_sketch(df, "v", "k", k_max=256)
    rows = sk.collect()
    assert len(rows) == 100
    assert rows[0]["level"] == 0 and rows[0]["n_items"] == 100
    est = {
        r["phi_milli"]: r
        for r in quantile_sketch_estimates(sk, (250, 500, 900)).collect()
    }
    # v == its own rank: exact lower quantile = target_rank itself
    assert est[250]["est_value"] == 25
    assert est[500]["est_value"] == 50
    assert est[900]["est_value"] == 90
    assert all(r["k_kept"] == 100 for r in est.values())


def test_quantile_sketch_rank_accuracy(spark):
    """X70 accuracy: on v == rank data (so rank error is readable off
    the estimate directly), every estimate's rank error stays within
    4·N/sqrt(k_kept) — the bottom-level-sampling error regime; the
    artifact respects the k_max bound and the 2^level weight law."""
    from genie_spark.analytics.sketches import (
        quantile_level_sketch,
        quantile_sketch_estimates,
    )

    n = 20_000
    df = spark.range(1, n + 1).select(
        F.col("id").alias("v"), F.col("id").alias("k")
    )
    sk = quantile_level_sketch(df, "v", "k", k_max=256)
    rows = sk.collect()
    assert 0 < len(rows) <= 256
    level = rows[0]["level"]
    # survivor count concentrates around n/2^level (binomial)
    assert 0.7 * n <= len(rows) * (1 << level) <= 1.3 * n
    ests = quantile_sketch_estimates(sk).collect()
    assert len(ests) == 4
    bound = 4 * n / (len(rows) ** 0.5)
    for r in ests:
        assert abs(r["est_value"] - r["target_rank"]) <= bound, (
            r["phi_milli"], r["est_value"], r["target_rank"], bound,
        )


def test_moments_merge_law_and_stats(spark):
    """X77: component-wise merge of per-shard moments artifacts is
    bit-identical to sketching the whole (any split), derived
    mean/variance milli stats are exact floors (negative-value safe),
    and null rows/groups are excluded."""
    from genie_spark.analytics.sketches import (
        moments_merge,
        moments_sketch,
        moments_stats,
    )

    rows = [(i, ["a", "b"][i % 2], (i * 7) % 101 - 50) for i in range(1, 201)]
    rows += [(900, None, 5), (901, "a", None)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, v long")
    whole = moments_sketch(df, "grp", "v")
    want = {tuple(r) for r in whole.collect()}
    parts = [
        moments_sketch(df.where(F.col("doc_id") % 3 == i), "grp", "v")
        for i in range(3)
    ]
    merged = moments_merge(*parts)
    assert {tuple(r) for r in merged.collect()} == want
    got = {r["g"]: r for r in moments_stats(whole).collect()}
    import math

    model = {}
    for _, g, v in rows:
        if g is None or v is None:
            continue
        model.setdefault(g, []).append(v)
    for g, vs in model.items():
        n, s1, s2 = len(vs), sum(vs), sum(x * x for x in vs)
        r = got[g]
        assert (r["n"], r["s1"], r["s2"]) == (n, s1, s2)
        assert r["min_v"] == min(vs) and r["max_v"] == max(vs)
        # python int // is an EXACT floor (arbitrary precision) — the
        # reference model must not route through float
        assert r["mean_milli"] == (s1 * 1000) // n
        assert r["var_milli"] == ((n * s2 - s1 * s1) * 1000) // (n * n)
    assert math.floor(-7 / 2) == -4  # pin: floor semantics, not trunc


def test_moments_stats_exact_beyond_int64(spark):
    """ADVICE r12: n*s2 - s1^2 exceeds int64 even at the artifact's
    documented-safe domain (|x| <= 1e6); moments_stats must stay
    EXACT via decimal(38,0) intermediates instead of wrapping in
    silent long multiply.  Values chosen so n*s2 ~ 3e18 * n digits —
    far outside int64 — with exact python-int expectations."""
    from genie_spark.analytics.sketches import moments_sketch, moments_stats

    vs = [1_000_000 + (i * 7) % 101 - 50 for i in range(5000)]
    rows = [(i, "g1", v) for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, v long")
    n, s1, s2 = len(vs), sum(vs), sum(x * x for x in vs)
    assert n * s2 > 2**63  # the failure mode this test pins
    r = moments_stats(moments_sketch(df, "grp", "v")).collect()[0]
    assert (r["n"], r["s1"], r["s2"]) == (n, s1, s2)
    assert r["mean_milli"] == (s1 * 1000) // n
    assert r["var_milli"] == ((n * s2 - s1 * s1) * 1000) // (n * n)


def test_moments_stats_raises_past_decimal_bound(spark):
    """ADVICE r14 (low): past n > MOMENTS_STATS_MAX_N the r1*1000
    intermediate can leave DECIMAL(38,0) where non-ANSI overflow is a
    SILENT NULL — the guard must raise loudly instead, and artifacts
    exactly AT the bound must keep computing."""
    import pytest

    from genie_spark.analytics.sketches import (
        MOMENTS_STATS_MAX_N,
        moments_stats,
    )

    # hand-built artifacts (a real corpus of 1.8e17 rows is not a
    # test fixture): n over the bound raises, n at the bound is exact
    over = spark.createDataFrame(
        [("g1", MOMENTS_STATS_MAX_N + 1, 7, 11, 0, 2)],
        "g string, n long, s1 long, s2 long, min_v long, max_v long",
    )
    with pytest.raises(Exception, match="exact-decimal bound"):
        moments_stats(over).collect()
    at = spark.createDataFrame(
        [("g1", MOMENTS_STATS_MAX_N, 7, 11, 0, 2)],
        "g string, n long, s1 long, s2 long, min_v long, max_v long",
    )
    r = moments_stats(at).collect()[0]
    n = MOMENTS_STATS_MAX_N
    assert r["var_milli"] == ((n * 11 - 49) * 1000) // (n * n)


def test_kmv_set_ops_inclusion_exclusion(spark):
    """X83: set-operation estimates from sketches alone — EXACT when
    both sets are below k (est == true union/intersection/diffs,
    including a proper subset pair whose difference is exactly one
    side), clamped at zero, and consistent with kmv_jaccard_pairs'
    intersection on the same sketches."""
    from pyspark.sql import functions as F

    from genie_spark.analytics.sketches import (
        kmv_jaccard_pairs,
        kmv_set_ops,
        kmv_sketch,
    )

    rows = (
        [(i, "A", f"tok{i}") for i in range(30)]           # A = 0..29
        + [(100 + i, "B", f"tok{i + 20}") for i in range(30)]  # B = 20..49
        + [(200 + i, "C", f"tok{i}") for i in range(10)]   # C = 0..9 ⊂ A
    )
    df = spark.createDataFrame(rows, "doc_id long, g string, v string")
    sk = kmv_sketch(df, "g", "v", k=64)
    got = {(r["a"], r["b"]): r for r in kmv_set_ops(sk, "g", k=64).collect()}
    ab = got[("A", "B")]
    assert ab["est_a"] == 30.0 and ab["est_b"] == 30.0
    assert ab["est_union"] == 50.0 and ab["est_intersection"] == 10.0
    assert ab["est_diff_ab"] == 20.0 and ab["est_diff_ba"] == 20.0
    ac = got[("A", "C")]  # C ⊂ A: diff_ca clamps to exactly 0
    assert ac["est_union"] == 30.0 and ac["est_intersection"] == 10.0
    assert ac["est_diff_ab"] == 20.0 and ac["est_diff_ba"] == 0.0
    # intersection agrees with the jaccard pair report
    jac = {
        (r["a"], r["b"]): r["est_intersection"]
        for r in kmv_jaccard_pairs(sk, "g", k=64).collect()
    }
    for key, r in got.items():
        assert r["est_intersection"] == jac[key]


def test_kmv_containment_exact_below_k_and_clamps(spark):
    """X83 containment rung: exact when both sets are below k — a true
    subset reads containment 1.0 in the subset direction and
    |∩|/|superset| in the other; consistent with kmv_set_ops'
    intersection; an empty-side estimate yields NULL, not Inf."""
    from pyspark.sql import functions as F

    from genie_spark.analytics.sketches import (
        kmv_containment_pairs,
        kmv_set_ops,
        kmv_sketch,
    )

    rows = (
        [(i, "A", f"tok{i}") for i in range(30)]            # A = 0..29
        + [(100 + i, "B", f"tok{i + 20}") for i in range(30)]  # B = 20..49
        + [(200 + i, "C", f"tok{i}") for i in range(10)]    # C = 0..9 ⊂ A
    )
    df = spark.createDataFrame(rows, "doc_id long, g string, v string")
    sk = kmv_sketch(df, "g", "v", k=64)
    got = {
        (r["a"], r["b"]): r
        for r in kmv_containment_pairs(sk, "g", k=64).collect()
    }
    ab = got[("A", "B")]  # |A∩B| = 10, |A| = |B| = 30
    assert ab["cont_ab"] == 10.0 / 30.0 and ab["cont_ba"] == 10.0 / 30.0
    ac = got[("A", "C")]  # C ⊂ A: containment of C in A is exactly 1
    assert ac["cont_ba"] == 1.0 and ac["cont_ab"] == 10.0 / 30.0
    # consistency with the set-ops intersection on the same sketches
    ops = {
        (r["a"], r["b"]): r["est_intersection"]
        for r in kmv_set_ops(sk, "g", k=64).collect()
    }
    for key, r in got.items():
        assert r["est_intersection"] == ops[key]
