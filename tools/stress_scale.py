"""Scaling-slope probe for the analytics scale paths.

Generates deterministic synthetic corpora of two sizes ENTIRELY
JVM-side (no Python in the data path), runs each scale-path operator at
both sizes, and prints the wall-time ratio vs the size ratio.  A path
whose time ratio tracks the size ratio is shuffle/partition-healthy; a
superlinear ratio exposes a hidden all-pairs or hot-key blowup before
it bites at 100 TB.

Usage: python tools/stress_scale.py [small_n] [big_n] [probe,probe,...]
       (default 10000 100000, all probes)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_docs(spark: SparkSession, n: int) -> DataFrame:
    """n docs ≈ 15 'sentences' of 2 md5 words each — unique text per
    doc (hash-seeded), realistic token structure, zero Python."""
    words = F.array(
        *[
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_{k}")))
            for k in range(15)
        ]
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(words, lambda w: F.concat(F.substring(w, 1, 12), F.lit(" "), F.substring(w, 13, 12))),
            " ",
        ).alias("text"),
    )


def synth_embeddings(spark: SparkSession, n: int, dim: int = 64) -> DataFrame:
    """n unit-ish vectors from xxhash64 — deterministic, JVM-side."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000)).cast("double")
                / 1000.0
                - 1.0
            ).cast("float"),
        ).alias("embedding"),
    )


def synth_embeddings_dups(
    spark: SparkSession, n: int, dim: int = 64, dup_frac: float = 0.05
) -> DataFrame:
    """Near-dup corpus with REALISTIC dup density: (1-dup_frac)·n unique
    random vectors plus dup_frac·n perturbed near-copies of the first
    vectors (per-component nudge → cosine ≈ 0.999 to the original).

    Why not threshold the plain random corpus: uniform random vectors
    have cosine std ≈ 1/√dim ≈ 0.125, so a 0.35 threshold at 1M vectors
    yields a DENSE tens-of-millions-edge pair graph — a drop list
    covering half the corpus, which no real dedup corpus produces.  The
    end-to-end probe must measure candidate-generation + verify + a
    sparse survivor-selection tail, not a degenerate everything-matches
    clustering."""
    n_base = n - int(n * dup_frac)
    base = synth_embeddings(spark, n_base, dim)
    dups = synth_embeddings(spark, n - n_base, dim).select(
        (F.col("vec_id") + n_base).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (x + ((F.pmod(i, F.lit(7)) - 3).cast("double")) * 0.005).cast(
                "float"
            ),
        ).alias("embedding"),
    )
    return base.unionByName(dups)


def timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 2)


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    from genie_spark.analytics.dedup import minhash_dedup_pairs, simhash_pairs
    from genie_spark.analytics.similarity import ivf_topk, lsh_cosine_candidates
    from genie_spark.analytics.text import quality_score
    from genie_spark.session import get_spark

    spark = get_spark("stress_scale")
    results: dict[str, dict] = {}

    def probe(name, build):
        if only is not None and name not in only:
            return
        times = {}
        for label, n in (("small", small), ("big", big)):
            # time build + execute together: iterative operators
            # (connected_components) do their work eagerly at build
            # time via localCheckpoint, not at the sink
            times[label] = timed(
                lambda: build(n).write.format("noop").mode("overwrite").save()
            )
            # Connect-safe: _jvm exists only on a classic in-process driver
            try:
                jvm = spark.sparkContext._jvm
            except Exception:
                jvm = None
            if jvm is not None:
                jvm.System.gc()
        ratio = round(times["big"] / max(times["small"], 0.01), 1)
        results[name] = {**times, "time_ratio": ratio}
        print(f"{name}: {times['small']}s -> {times['big']}s  ratio {ratio}x", flush=True)

    docs = lambda n: synth_docs(spark, n).repartition(32).cache()  # noqa: E731
    embs = lambda n: synth_embeddings(spark, n).repartition(32)  # noqa: E731

    probe("minhash_lsh", lambda n: minhash_dedup_pairs(docs(n), k=20, n_perm=16, bands=4, threshold=0.5))
    probe("simhash", lambda n: simhash_pairs(docs(n)))
    # planes follow the documented sizing rule p ≈ log2(n/B) (constant
    # expected bucket occupancy B=16 → candidate volume ~ n·B/2, linear);
    # a fixed 8 planes at 1M vectors would mean n²/2^8 ≈ 4B pairs
    import math as _math

    probe(
        "lsh_buckets",
        lambda n: lsh_cosine_candidates(
            embs(n), n_planes=max(8, _math.ceil(_math.log2(max(n, 2) / 16)))
        ),
    )
    # n_centroids follows the operator's own √n sizing rule (viable
    # since the Arrow cell-assignment engine: per-row cost is one
    # matmul row, independent of C) — candidates per query track
    # n_probe·n/C ≈ 4·√n, sublinear
    probe(
        "ivf_topk",
        lambda n: ivf_topk(
            embs(n), query_filter=F.col("vec_id") < 16,
            n_centroids=max(16, _math.isqrt(max(n, 1))), n_probe=4, k=10,
        ),
    )
    probe("quality_score", lambda n: quality_score(synth_docs(spark, n)))

    # embedding near-dup drop, end-to-end (candidates → exact verify →
    # connected components → drop list).  Candidates from banded
    # sign-LSH with r = log2-scaled planes so expected bucket occupancy
    # is constant: candidate volume ~ b·n·B/2 (linear), assignment
    # O(b·r·dim) per row — the 100 TB generator.  The registered
    # sf0.01 query uses the centroid ivf_cell_pairs variant tuned for
    # measured-total recall at that sf; both feed the same
    # verify→components tail probed here.
    import math

    from genie_spark.analytics.dedup import near_dup_drop_list
    from genie_spark.analytics.similarity import cosine_verify_pairs, lsh_banded_pairs

    def run_embedding_drop(n):
        # planted near-dups (cos≈0.999) at 5% density + a 0.6 verify
        # threshold: the planted pairs collide in ≥1 sign-LSH table
        # w.p. ~0.9997 while random candidate pairs essentially never
        # verify — the probe measures the real pipeline regime (sparse
        # genuine dups), not an everything-matches clustering (a 0.35
        # threshold on the uniform corpus yields a dense 10M+-edge
        # graph at 1M vectors whose survivor-selection tail dwarfs the
        # candidate path)
        from genie_spark.analytics.similarity import measured_plane_counts

        e = synth_embeddings_dups(spark, n).repartition(32).cache()
        # closed-loop sizing (VERDICT r7 item 1): per-table plane
        # counts from MEASURED bucket occupancy on a bounded sample,
        # so candidate volume stays <= slack*b*n*B/2 at every n — the
        # open-loop banded_plane_counts crept to 1.99x the target at
        # 1M on this corpus's occupancy skew
        counts = measured_plane_counts(e, n_rows=n, n_tables=4, target_occupancy=16)
        cand = lsh_banded_pairs(e, n_planes=counts, n_tables=4)
        ver = cosine_verify_pairs(e, cand, threshold=0.6).select("a", "b")
        return near_dup_drop_list(ver)

    probe("embedding_drop_e2e", run_embedding_drop)

    # connected components over chain-shaped pair graphs (clusters of 5
    # + one long chain of 64 to exercise the pointer-jump rounds)
    from genie_spark.analytics.dedup import connected_components

    def synth_pairs(n):
        base = spark.range(n).select(
            F.col("id").alias("a"), (F.col("id") + 1).alias("b")
        ).where((F.col("id") % 5 != 4) | (F.col("id") < 64))
        return base.repartition(32)

    probe("connected_components", lambda n: connected_components(synth_pairs(n)))

    # binned interval join: n points vs n/10 intervals across 24 chroms
    from genie_spark.operators.intervals import interval_join

    def synth_interval_inputs(n):
        pts = spark.range(n).select(
            (F.col("id") % 24).cast("string").alias("chrom"),
            F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("pos"),
            F.col("id").alias("pt_id"),
        )
        ivs = spark.range(n // 10).select(
            (F.col("id") % 24).cast("string").alias("chrom"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)).alias("s"),
        ).withColumn("e", F.col("s") + 500)
        return pts.repartition(32), ivs

    def run_interval(n):
        pts, ivs = synth_interval_inputs(n)
        return interval_join(pts, ivs, on=["chrom"], pos="pos", start="s", end="e")

    probe("interval_join", run_interval)

    # corpus pipeline stages ------------------------------------------------
    from genie_spark.analytics.corpus import (
        decontaminate_ngram,
        pack_sequences,
        stratified_sample,
    )
    from genie_spark.analytics.text import repetition_stats, tfidf_topk

    def run_decontaminate(n):
        # benchmark = a FIXED 256-doc eval suite drawn from the corpus
        # itself (ids 0..255), so real n-gram matches flow through the
        # broadcast join at every n
        corpus = docs(n)
        bench = corpus.where(F.col("doc_id") < 256)
        return decontaminate_ngram(corpus, bench, n=8)

    probe("decontaminate", run_decontaminate)

    # Bloom variant: the same fixed benchmark collapsed to a ≤m_bits
    # position set; corpus probes via broadcast anti join — wall must
    # track the corpus n-gram explode, like the exact variant
    def run_bloom_decontaminate(n):
        from genie_spark.analytics.corpus import bloom_build, bloom_decontaminate

        corpus = docs(n)
        bench = corpus.where(F.col("doc_id") < 256)
        bloom = bloom_build(bench, n=8)
        return bloom_decontaminate(corpus, bloom, n=8)

    probe("bloom_decontaminate", run_bloom_decontaminate)
    probe(
        "pack_sequences",
        lambda n: pack_sequences(
            docs(n).withColumn("source", F.pmod("doc_id", F.lit(64))),
            budget=512,
        ),
    )
    # tfidf's term-df side grows with the vocabulary; the synthetic
    # corpus's md5 vocab grows ~linearly with n, the worst case
    probe("tfidf_topk", lambda n: tfidf_topk(docs(n), k=5))
    probe("repetition", lambda n: repetition_stats(docs(n)))
    probe(
        "stratified_sample",
        lambda n: stratified_sample(
            docs(n).withColumn("lang", F.pmod("doc_id", F.lit(5)).cast("string")),
            strata_col="lang", fractions_bp={"0": 5_000}, default_bp=2_500,
        ),
    )

    # passage-level exact dedup with a HOT boilerplate passage: every
    # doc shares an 8-token prefix (4 hot 2-token chunks, each with n
    # occurrences corpus-wide).  The claim under test is skew-immunity:
    # the min-struct winner is a PARTIAL-aggregable groupBy, so the hot
    # chunks collapse map-side (one row per input partition) instead of
    # funneling n rows into one reducer.
    from genie_spark.analytics.corpus import passage_dedup, train_split_shuffle

    BOILER = "copyright notice all rights reserved terms of use"

    probe(
        "passage_dedup",
        lambda n: passage_dedup(
            docs(n).withColumn(
                "text", F.concat(F.lit(BOILER + " "), F.col("text"))
            ),
            n_tokens=2,
        ),
    )
    probe("split_shuffle", lambda n: train_split_shuffle(docs(n), n_shards=32))

    # k-means: iters+1 scans of the cached quantized corpus; per-row
    # assignment is O(k·dim) map work and the only shuffle per
    # iteration is the k·dim-group centroid aggregate, so wall should
    # track n (scan+map bound)
    from genie_spark.analytics.clustering import kmeans_assign

    probe("kmeans", lambda n: kmeans_assign(embs(n), k=8, iters=3))

    # corpus-scale k (VERDICT r6 item 2): the √n sizing rule puts k in
    # the 10⁴ range long before 100 TB — the literal-centroid plan
    # chokes on plan SIZE there, so these probes pin that the arrow
    # engines (broadcast-variable centroids, BLAS cross-term) actually
    # run at k=10⁴.  One Lloyd iteration / one probe pass: the claim
    # under test is "the plan builds and the scan is matmul-bound",
    # not the iteration count.
    from genie_spark.analytics.similarity import ivf_topk as _ivf_topk

    probe(
        "kmeans_bigk",
        lambda n: kmeans_assign(embs(n), k=min(10_000, n), iters=1),
    )
    # ivf at the HONEST √n sizing rule at BOTH tiers (k=100 @ 10k,
    # k=316 @ 100k, k=10³ @ 1M) with a 4096-query BATCH — the round-7
    # k=10⁴-pinned variant's small tier was the n=k degenerate case
    # (every vector its own centroid), so its ratio measured nothing
    # (VERDICT r7 item 6); kmeans_bigk above keeps k pinned on purpose
    # (plan-size claim).  Candidates per query track n_probe·n/√n =
    # 4√n, so the batch probe should scale ~√n-sublinearly past the
    # scan term.
    probe(
        "ivf_topk_bigk",
        lambda n: _ivf_topk(
            embs(n),
            n_centroids=max(16, _math.isqrt(max(n, 1))),
            n_probe=4,
            k=5,
            query_filter=F.col("vec_id") < 4096,
        ),
    )

    # Count-Min sketch: explode to depth rows + ONE bounded groupBy —
    # shuffle is sketch-sized (≤ depth·width rows post-partial-agg),
    # so wall should track the scan
    from genie_spark.analytics.sketches import count_min_lookup, count_min_sketch
    from genie_spark.analytics.text import tokens as _tokens

    def run_count_min(n):
        occ = synth_docs(spark, n).repartition(32).select(
            F.explode(_tokens("text")).alias("value")
        )
        sk = count_min_sketch(occ, "value", width=1 << 12, depth=3)
        probes = spark.range(64).select(
            F.concat(F.lit("probe"), F.col("id")).alias("value")
        )
        return count_min_lookup(sk, probes, "value", width=1 << 12, depth=3)

    probe("count_min", run_count_min)

    # HyperLogLog registers: token explode + ONE bounded groupBy —
    # repeated (group, reg) pairs collapse map-side to ≤ 2^p rows per
    # partition before the exchange, so wall should track the scan
    from genie_spark.analytics.sketches import hll_estimate, hll_sketch

    def run_hll(n):
        occ = docs(n).withColumn(
            "source", F.pmod("doc_id", F.lit(20)).cast("string")
        ).select("source", F.explode(_tokens("text")).alias("value"))
        return hll_estimate(hll_sketch(occ, "source", "value"), "source")

    probe("hll_sketch", run_hll)

    # image perceptual near-dup: md5-synthesized 8x8 PGM binaries with
    # 1-in-8 planted one-nibble near-copies → REAL decode + avg-hash in
    # mapInPandas → exact pigeonhole Hamming banding.  All linear:
    # hash-join candidates, popcount verify on candidates only.
    from genie_spark.analytics.dedup import hamming_near_dup_pairs
    from genie_spark.analytics.multimodal import image_ahash

    def run_phash(n):
        from genie_spark.workload_analytics import synth_media_hex

        media = spark.range(n).repartition(32).select(
            F.col("id").alias("media_id"),
            F.concat(
                F.lit(b"P5\n8 8\n255\n"),
                F.unhex(synth_media_hex("img_", 4, id_col="id")),
            ).alias("content"),
        )
        return hamming_near_dup_pairs(
            image_ahash(media), "media_id", "ahash", max_distance=3, n_bits=64
        )

    probe("image_phash", run_phash)

    # token-budget selection: per-bin rollup (bounded) + the ONE
    # straddling bin's window sort — wall should track the scan, not
    # a global per-group sort
    from genie_spark.analytics.corpus import token_budget_select

    def run_token_budget(n):
        d = synth_docs(spark, n).repartition(32).withColumn(
            "lang", F.concat(F.lit("l"), F.pmod(F.col("doc_id"), F.lit(4)))
        )
        # budget scaled to keep ~half of each group at any n
        return token_budget_select(d, budget=n * 4, group_col="lang")

    probe("token_budget", run_token_budget)

    # incremental dedup: FIXED 10k-doc batch against a GROWING store —
    # the claim under test is that wall tracks |batch| + matched
    # buckets, not |corpus|, so the ratio across store sizes should be
    # far below the size ratio
    from genie_spark.analytics.dedup import incremental_minhash_pairs, minhash_docinfo

    def probe_store(name):
        # store = signatures of n docs materialized to parquet first
        # (store build is the previous batches' cost, not this
        # batch's); batch ids shift FULLY past the store's id range
        # (+ n — an overlap would put two documents under one id in
        # the verify docinfo union) while the id-seeded texts make
        # every batch doc an exact dup of the store's first 10k, so
        # real candidate pairs flow through verify
        if only is not None and name not in only:
            return
        times = {}
        for label, n in (("small", small), ("big", big)):
            import tempfile

            store_path = tempfile.mkdtemp() + "/sigstore"
            minhash_docinfo(synth_docs(spark, n).repartition(32)).write.parquet(
                store_path
            )
            store = spark.read.parquet(store_path)
            batch = synth_docs(spark, 10_000).select(
                (F.col("doc_id") + n).alias("doc_id"), "text"
            )
            times[label] = timed(
                lambda: incremental_minhash_pairs(store, batch)[0]
                .write.format("noop").mode("overwrite").save()
            )
        ratio = round(times["big"] / max(times["small"], 0.01), 1)
        results[name] = {**times, "time_ratio": ratio}
        print(f"{name}: {times['small']}s -> {times['big']}s  ratio {ratio}x (store-size scaling, fixed 10k batch)", flush=True)

    probe_store("incremental_minhash")

    # KMV distinct sketch with 20 HOT groups (the salting claim: the
    # final per-group top-k task is bounded at n_salts·k rows, so wall
    # tracks the distinct shuffle, not the biggest group)
    from genie_spark.analytics.sketches import kmv_sketch

    probe(
        "kmv_sketch",
        lambda n: kmv_sketch(
            docs(n).withColumn("source", F.pmod("doc_id", F.lit(20)).cast("string")),
            "source", "text", k=64,
        ),
    )

    # SemDeDup, default (LSH) path: k is a FIXED semantic cluster
    # count, candidate volume is held linear by sizing n_planes ≈
    # log₂(n/B) for constant bucket occupancy B, verify is
    # candidate-bounded — every term linear in n.  5%-density planted
    # near-dups as in embedding_drop_e2e.  (The candidates='exact'
    # flat all-pairs variant stays guarded at 200k and is no longer
    # probed — BASELINE.md §5 records its 5.4×/10× slope.)
    from genie_spark.analytics.clustering import semantic_dedup

    probe(
        "semantic_dedup",
        lambda n: semantic_dedup(
            synth_embeddings_dups(spark, n).repartition(32).cache(),
            k=64, iters=2, threshold=0.6,
            n_planes=max(4, (max(n, 2) // 64).bit_length()), n_tables=4,
        ),
    )

    # as-of join: n clicks vs n views over 1000 hot-ish users — the
    # union-window form should track n (one exchange + sort), where a
    # range join would blow up as clicks×views per user
    from genie_spark.operators.windows import asof_join

    def run_asof(n):
        left = spark.range(n).select(
            F.col("id").alias("lid"),
            F.pmod("id", F.lit(1000)).alias("k"),
            F.pmod(F.xxhash64("id"), F.lit(10_000_000)).alias("ts"),
        ).repartition(32)
        right = spark.range(n).select(
            F.col("id").alias("rid"),
            F.pmod("id", F.lit(1000)).alias("k"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000_000)).alias("ts"),
            F.md5(F.col("id").cast("string")).alias("tag"),
        )
        return asof_join(
            left, right, on=["k"], ts_col="ts",
            payload=["rid", "tag"], tiebreak="rid",
        )

    probe("asof_join", run_asof)

    # X41 prefix-filtered set-similarity join on a boilerplate-heavy
    # corpus: every doc shares a hot boilerplate prefix (its shingles
    # have df = n — the all-shingle join's quadratic nightmare) and 5%
    # of docs duplicate their neighbor's unique tail.  Prefixes pick
    # each doc's RAREST shingles, so candidates ≈ the planted dup
    # pairs and wall stays linear despite the hot shingles.
    from genie_spark.analytics.dedup import setsim_prefix_pairs

    def synth_docs_boiler(n):
        boiler = (
            "shared boilerplate header every document repeats verbatim "
            "license terms navigation chrome etc "
        )
        base_id = F.when(
            F.pmod(F.col("id"), 20) == 19, F.col("id") - 1
        ).otherwise(F.col("id"))
        words = [
            F.md5(F.concat(base_id.cast("string"), F.lit(f"_{k}")))
            for k in range(8)
        ]
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit(boiler), F.concat_ws(" ", *words)).alias("text"),
        ).repartition(32).cache()

    probe(
        "setsim_prefix",
        lambda n: setsim_prefix_pairs(synth_docs_boiler(n), k=20, threshold_pct=80),
    )

    # X42 priority sampling: per-group top-k window over 32 groups —
    # one exchange, wall should track the scan+sort
    from genie_spark.analytics.corpus import priority_sample

    def synth_weighted(n):
        return spark.range(n).select(
            F.pmod("id", F.lit(32)).cast("string").alias("source"),
            F.col("id").alias("doc_id"),
            (F.pmod(F.xxhash64("id"), F.lit(1000)) + 1).alias("n_chars"),
        ).repartition(32)

    probe("priority_sample", lambda n: priority_sample(synth_weighted(n), k=10))

    # X43 heavy hitters: 30% of occurrences from 10 hot tokens (3%
    # share each, above the 2% bar), the rest unique — vocabulary is
    # ~0.7n but the shuffle carries only the ≤m·P candidates
    from genie_spark.analytics.sketches import heavy_hitters

    def synth_tokens(n):
        h = F.pmod(F.xxhash64("id"), F.lit(10))
        return spark.range(n).select(
            F.when(
                h < 3,
                F.concat(
                    F.lit("hot"),
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10)).cast("string"),
                ),
            )
            .otherwise(F.md5(F.col("id").cast("string")))
            .alias("token")
        ).repartition(32)

    probe(
        "heavy_hitters",
        lambda n: heavy_hitters(synth_tokens(n), m=64, min_share_bp=200),
    )

    # X46 edit-distance near-miss join: sequentially-numbered ID-like
    # values (dense one-digit-apart neighborhoods).  Variants fan
    # ~length+1 per distinct value; candidates concentrate in deletion
    # buckets of the shared prefix+digits shape — wall must track the
    # variant explode, never n².
    from genie_spark.analytics.dedup import edit_near_miss_pairs

    def synth_names(n):
        return spark.range(n).select(
            F.concat(
                F.lit("GENIE-SAGE-"), F.lpad(F.col("id").cast("string"), 9, "0")
            ).alias("value")
        ).repartition(32)

    probe("edit_near", lambda n: edit_near_miss_pairs(synth_names(n), "value"))

    # X47 substring duplicate-span MASK: every doc embeds the same
    # 12-token boilerplate block between unique halves — the hot-anchor
    # worst case (anchor df = n).  The mask needs only per-anchor
    # COUNTS + a per-doc window, so wall must track n even though every
    # anchor is corpus-hot (the pair formulation would be n² here).
    from genie_spark.analytics.dedup import duplicate_span_mask, duplicate_span_pairs

    def synth_docs_spans(n):
        boiler = (
            " shared duplicated span alpha beta gamma delta epsilon "
            "zeta eta theta iota kappa "
        )
        pre = [
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_p{k}")))
            for k in range(5)
        ]
        post = [
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_q{k}")))
            for k in range(5)
        ]
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.concat_ws(" ", *pre), F.lit(boiler), F.concat_ws(" ", *post)
            ).alias("text"),
        ).repartition(32)

    probe(
        "substring_spans",
        lambda n: duplicate_span_mask(synth_docs_spans(n), k=8),
    )

    # X47 PAIR form under the df cap: boilerplate anchors (df = n) are
    # dropped by max_df before the self-join; the planted 5%
    # neighbor-dup tails (df = 2) survive, so output ≈ planted pairs
    # and wall stays linear — the cap is what makes the pair form
    # shippable at corpus scale.
    probe(
        "substring_pairs",
        lambda n: duplicate_span_pairs(synth_docs_boiler(n), k=8, max_df=100),
    )

    # X47-adjacent (round-10 item 3): signature-store incremental sync
    # vs from-scratch rebuild, SAME +10%-grown corpus.  The A/B claim:
    # sync re-shingles only the delta (manifest diff over slim columns,
    # bucket-scoped rewrite), so sync wall ≪ full wall at every n and
    # the gap widens with corpus size.
    def probe_sigstore(name):
        if only is not None and name not in only:
            return
        from genie_spark.analytics.signature_store import sync_docinfo_store

        import tempfile

        # untimed warmup at a token size: JIT-compile the exact sync
        # code paths (manifest diff joins, partitioned write, txnlog
        # commit) so the small tier measures sync cost, not first-run
        # JIT tax (round-10's 68 s small-tier reading was exactly that)
        wstore = tempfile.mkdtemp() + "/sigstore_warm"
        sync_docinfo_store(
            spark, synth_docs(spark, 2_000).repartition(32), wstore,
            n_buckets=64,
        )
        sync_docinfo_store(
            spark, synth_docs(spark, 2_200).repartition(32), wstore,
            n_buckets=64,
        )

        times, fulls = {}, {}
        for label, n in (("small", small), ("big", big)):

            store = tempfile.mkdtemp() + "/sigstore"
            # untimed: the existing store of n docs (prior runs' cost)
            sync_docinfo_store(
                spark, synth_docs(spark, n).repartition(32), store,
                n_buckets=64,
            )
            grown = synth_docs(spark, n + n // 10).repartition(32)
            times[label] = timed(
                lambda: sync_docinfo_store(
                    spark, grown, store, n_buckets=64
                )
            )
            fresh = tempfile.mkdtemp() + "/sigstore_fresh"
            fulls[label] = timed(
                lambda: sync_docinfo_store(
                    spark, grown, fresh, n_buckets=64
                )
            )
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        ratio = round(times["big"] / max(times["small"], 0.01), 1)
        results[name] = {
            **times,
            "time_ratio": ratio,
            "full_small": fulls["small"],
            "full_big": fulls["big"],
            "speedup_big": round(fulls["big"] / max(times["big"], 0.01), 1),
        }
        print(
            f"{name}: sync {times['small']}s -> {times['big']}s  ratio "
            f"{ratio}x; from-scratch {fulls['small']}s -> {fulls['big']}s "
            f"(big-tier speedup {results[name]['speedup_big']}x)",
            flush=True,
        )

    probe_sigstore("sigstore_sync")

    # X48 BM25: fixed 3-term query over a growing corpus — the tf
    # table is |hits|×|query| (query-term filter BEFORE aggregation),
    # top-k is TakeOrdered; wall must track the scan.
    from genie_spark.analytics.text import bm25_topk

    def synth_docs_query(n):
        # ~1/3 of docs contain a query term so the tf table is real
        hit = F.when(
            F.pmod("id", F.lit(3)) == 0,
            F.lit(" spark shuffle partition"),
        ).otherwise(F.lit(""))
        base = F.concat_ws(
            " ",
            *[
                F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_{j}")))
                for j in range(10)
            ],
        )
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(base, hit).alias("text"),
        ).repartition(32)

    probe(
        "bm25_topk",
        lambda n: bm25_topk(
            synth_docs_query(n), ["spark", "shuffle", "partition"], k=25
        ),
    )

    # X49 winnowing: selection is map-side (bound-lambda window mins);
    # the boilerplate corpus makes every doc produce real selections
    # and the pair report exercises the df cap — wall must track the
    # gram stream, never pair volume.
    from genie_spark.analytics.dedup import winnow_dup_pairs

    probe(
        "winnow_pairs",
        lambda n: winnow_dup_pairs(
            synth_docs_boiler(n), k=8, w=4, min_shared=1, max_df=100
        ),
    )

    # X50 hashed linear classifier: fixture model (md5 expression
    # weights) — pure explode + hash + per-doc sum; must track the scan
    from genie_spark.analytics.text import hashed_linear_classify

    probe(
        "quality_classifier",
        lambda n: hashed_linear_classify(docs(n), n_buckets=1 << 16),
    )

    # X51 DSIR: two bucket-keyed model aggs (map-side partial,
    # <= n_buckets rows shuffled per task), broadcast lambda join, one
    # doc-keyed scoring exchange, TakeOrdered top-k — must track the
    # feature-stream scan, never the corpus sort or a join blowup
    from genie_spark.analytics.corpus import _uniform_bp, dsir_sample

    def run_dsir(n):
        d = docs(n)
        return dsir_sample(
            d, d.where(_uniform_bp("doc_id") < 2_500), k=50,
            n_buckets=4096,
        )

    probe("dsir_sample", run_dsir)

    # X52 BPE trainer: one corpus-sized word-count shuffle, then 5
    # iterations over the vocabulary table (map-side partial pair
    # counts + TakeOrdered(1) + literal replace, localCheckpoint per
    # step).  The md5 corpus is the WORST case (every word unique →
    # vocab scales with corpus); wall must still track the scan.
    from genie_spark.analytics.text import bpe_train

    def run_bpe(n):
        out = bpe_train(docs(n), n_merges=5)
        return out

    probe("bpe_train", run_bpe)

    # X54 Unicode normalization: one Arrow pandas_udf pass — must
    # track the scan (no shuffle, batch-vectorized unicodedata)
    from genie_spark.analytics.text import normalize_text

    probe("normalize_text", lambda n: normalize_text(docs(n)))

    # X55 token drift: two map-side-partial token aggregates + one
    # vocab-keyed full-outer merge join + TakeOrdered — wall must
    # track the two scans, never a vocab blowup
    from genie_spark.analytics.text import token_drift

    def run_drift(n):
        d = docs(n)
        return token_drift(
            d.where(F.col("doc_id") % 2 == 0),
            d.where(F.col("doc_id") % 2 == 1),
            k=100,
        )

    probe("token_drift", run_drift)

    # X56 domain cap: one group-keyed window with the Partial
    # WindowGroupLimit map-side reduction — a 90%-hot-domain corpus is
    # the worst case and must still track the scan (each map task
    # ships <= k rows for the hot key)
    from genie_spark.analytics.corpus import domain_cap

    def run_cap(n):
        d = synth_docs(spark, n).repartition(32).withColumn(
            "source",
            F.when(F.col("doc_id") % 10 < 9, "HOT").otherwise(
                F.concat(F.lit("s"), (F.col("doc_id") % 50).cast("string"))
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
        return domain_cap(d, max_per_group=100, order_col="n_chars")

    probe("domain_cap", run_cap)

    # X57 semantic decontamination: the eval side is FIXED SIZE by
    # contract (benchmark suites don't grow with the corpus) — 1024
    # vectors broadcast as one exact-int matmul matrix; the corpus
    # side is a single zero-exchange mapInPandas scan, so the wall
    # must track the scan (cost = n·|eval|·dim, linear in n)
    from genie_spark.analytics.similarity import semantic_decontaminate

    def run_semdecon(n):
        return semantic_decontaminate(
            embs(n), synth_embeddings(spark, 1024), threshold=0.9
        )

    probe("semantic_decontaminate", run_semdecon)

    # X58 SoftDeDup: the md5 corpus is the WORST case (every 3-gram
    # unique → the count model and the gram-keyed scoring join both
    # carry a corpus-sized stream); wall must stay linear — two
    # map-side-partial shuffles + one doc-keyed exchange + TakeOrdered
    from genie_spark.analytics.corpus import soft_dedup

    probe("soft_dedup", lambda n: soft_dedup(docs(n), n=3, k=100))

    # X59 BPE fertility: a FIXED learned merge table applied map-side
    # (the bounded literal replace chain) + one group-keyed agg whose
    # reduce side is |groups| rows — must track the scan.  Training
    # cost is bpe_train's probe; this pins the report side.
    from genie_spark.analytics.text import bpe_fertility

    _FERT_MERGES = [
        ("a", "b"), ("c", "d"), ("e", "f"), ("0", "1"), ("ab", "c"),
    ]

    def run_fertility(n):
        d = docs(n).withColumn(
            "lang", F.concat(F.lit("l"), (F.col("doc_id") % 8).cast("string"))
        )
        return bpe_fertility(d, _FERT_MERGES, group_col="lang")

    probe("bpe_fertility", run_fertility)

    # X60 Gopher rule battery: one narrow projection, zero shuffles —
    # must track the scan exactly (the X9/X11 posture)
    from genie_spark.analytics.text import gopher_quality_filter

    probe("gopher_filter", lambda n: gopher_quality_filter(docs(n)))

    # X61 product quantization: training is m×iters bounded update
    # aggregates (k·sub_dim rows each — sketch-sized), the encode is
    # ONE fused Arrow scan with all m codebooks on a single broadcast
    # — total wall must track the corpus scan
    from genie_spark.analytics.clustering import pq_encode, pq_topk

    probe("pq_encode", lambda n: pq_encode(embs(n), m=4, k=8, iters=2))

    # ADC top-k with a FIXED 16-query set (benchmark-style contract):
    # LUT broadcast, corpus codes unpivot + one partial-summed
    # (query, vector) aggregate — linear in n
    probe(
        "pq_topk",
        lambda n: pq_topk(
            embs(n), F.col("vec_id") < 16, k_neighbors=10, m=4, k=8, iters=2
        ),
    )

    # X62 IVF-PQ: coarse cells prune candidates to ~n·p/C before ADC
    # scoring — with C on the √n rule the scored volume grows ~√n per
    # query, so the composite must track (or beat) flat pq_topk
    from genie_spark.analytics.clustering import ivfpq_topk

    probe(
        "ivfpq_topk",
        lambda n: ivfpq_topk(
            embs(n), F.col("vec_id") < 16, k_neighbors=10,
            n_centroids=max(16, _math.isqrt(max(n, 1))), n_probe=4,
            m=4, k=8, iters=2,
        ),
    )

    # X63 bigram backoff LM: two map-side-partial model aggregates +
    # three vocab-keyed merge joins on the scoring stream + one
    # doc-keyed aggregate; the md5 corpus is the worst case (every
    # bigram unique → model tables scale with the corpus)
    from genie_spark.analytics.text import lm_surprisal_bigram

    def run_lm_bigram(n):
        d = docs(n)
        return lm_surprisal_bigram(d, d.where(F.col("doc_id") % 2 == 0))

    probe("lm_bigram", run_lm_bigram)

    # X64 line/paragraph repetition: per-row sorted-run folds, zero
    # shuffle — must track the scan (the X11/X60 posture)
    from genie_spark.analytics.text import line_repetition_stats

    probe("line_repetition", lambda n: line_repetition_stats(docs(n)))

    # X66/X67: single narrow projections — must track the scan
    from genie_spark.analytics.text import blocklist_filter, char_entropy

    probe("char_entropy", lambda n: char_entropy(docs(n)))
    probe(
        "blocklist",
        lambda n: blocklist_filter(docs(n), ["aaaa", "bbbb", "cccc"]),
    )

    # X69 temperature mixture: one persisted dim-sized domain
    # aggregate + broadcast narrow admission — must track the scan
    from genie_spark.analytics.corpus import temperature_mix

    def docs_lang(n):
        return docs(n).withColumn(
            "lang",
            F.concat(F.lit("l"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string")),
        )

    probe(
        "temperature_mix",
        lambda n: temperature_mix(docs_lang(n), n_target=n // 2, group_col="lang"),
    )

    # X70 quantile level-sketch: tz histogram + survivor filter (two
    # narrow scans, dim-sized aggregates); estimates window is
    # sketch-sized
    from genie_spark.analytics.sketches import (
        quantile_level_sketch,
        quantile_sketch_estimates,
    )

    def run_kll(n):
        items = docs(n).select(
            "doc_id", (F.col("doc_id") * 37 % 99991).alias("v")
        )
        return quantile_sketch_estimates(
            quantile_level_sketch(items, "v", "doc_id", k_max=1024)
        )

    probe("kll_quantiles", run_kll)

    # X71 residual IVF-PQ at the same √n centroid sizing as the X62
    # probe: the extra work over X62 is one dim-sized mean aggregate +
    # an integer zip_with — the slope must match ivfpq_topk's
    from genie_spark.analytics.clustering import ivfpq_residual_topk

    probe(
        "ivfpq_residual",
        lambda n: ivfpq_residual_topk(
            embs(n), F.col("vec_id") < 16, k_neighbors=10,
            n_centroids=max(16, _math.isqrt(max(n, 1))), n_probe=4,
            m=4, k=8, iters=2,
        ),
    )

    # X72 CCNet buckets: the X63 scoring shape + a sample-only window
    # + broadcast thresholds — slope must track lm_bigram's
    from genie_spark.analytics.text import ccnet_buckets

    def run_ccnet(n):
        d = docs_lang(n)
        return ccnet_buckets(
            d, d.where(F.col("doc_id") % 2 == 0), sample_bp=2_500
        )

    probe("ccnet_buckets", run_ccnet)

    # X73 WordPiece: zero-exchange Arrow scan over distinct words —
    # must track the scan (md5 words are hex, so heads/continuations
    # cover [0-9a-f])
    from genie_spark.analytics.text import wordpiece_encode

    _hexchars = list("0123456789abcdef")
    probe(
        "wordpiece",
        lambda n: wordpiece_encode(
            docs(n), _hexchars + ["##" + c for c in _hexchars]
        ),
    )

    # X78 WordPiece trainer: corpus scanned once (word count), then
    # vocab-table iterations — slope must track the word-count scan
    from genie_spark.analytics.text import wordpiece_train

    probe("wordpiece_train", lambda n: wordpiece_train(docs(n), n_merges=4))

    # X76 3-D Hilbert: vectorized Skilling walk over an Arrow scan —
    # slope must track the scan like the 2-D path
    from genie_spark.io.layout import with_hilbert

    def run_hilbert3d(n):
        base = spark.range(n).select(
            F.col("id").alias("a"),
            (F.col("id") * 37 % 65536).alias("b"),
            (F.col("id") * 97 % 65536).alias("c"),
        )
        return with_hilbert(
            base,
            ["a", "b", "c"],
            n_bits=16,
            ranges={"a": (0, n), "b": (0, 65535), "c": (0, 65535)},
        )

    probe("hilbert_3d", run_hilbert3d)

    # X80 leakage-safe split: components over a synthetic chain-pair
    # graph (n/4 chains of 4) + ONE corpus left join — slope must
    # track the components probe, not the corpus
    from genie_spark.analytics.corpus import epoch_allocation, leakage_safe_split

    def run_leakage(n):
        ids = spark.range(n).select(F.col("id").alias("doc_id"))
        pairs = (
            spark.range(n // 2)
            .where(F.col("id") % 4 != 3)  # chains of 4 over half the ids
            .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
        )
        return leakage_safe_split(ids, pairs)

    probe("leakage_split", run_leakage)

    # X81 epoch allocation: one domain aggregate + a dims^2 cumsum —
    # must be scan-bound
    def run_epoch(n):
        d = docs(n).withColumn(
            "source", (F.col("doc_id") % 20).cast("string")
        )
        return epoch_allocation(d, 10_000_000)

    probe("epoch_allocation", run_epoch)

    # X79 Unigram Viterbi: same zero-exchange Arrow-scan shape as X73
    from genie_spark.analytics.text import unigram_encode

    _hexv = {c: -6000 for c in "0123456789abcdef"}
    _hexv.update({"ab": -7000, "cd": -7000, "ef": -7000, "0123": -9000})
    probe("unigram_encode", lambda n: unigram_encode(docs(n), _hexv))

    # X84 Unigram seed vocab: ONE corpus-sized word count, substring
    # enumeration over DISTINCT words — must track the scan
    from genie_spark.analytics.text import unigram_seed_vocab

    probe(
        "unigram_seed",
        lambda n: unigram_seed_vocab(
            synth_docs(spark, n), vocab_size=64, max_piece_len=5
        ),
    )

    # X85 signed random projection: scan -> project, literal planes —
    # must be scan-bound (O(out_dim*dim) per row)
    from genie_spark.analytics.similarity import random_projection

    probe(
        "random_projection",
        lambda n: random_projection(embs(n), out_dim=8, dim=64),
    )

    # X80+X82 store-fed split: per-batch maps via ONE disjoint-union
    # tagged components pass, merge-law components, one corpus join —
    # the corpus-sized work is the final join only
    from genie_spark.streaming.windows import _components_store_merge

    def run_split_store(n):
        ids = spark.range(n).select(F.col("id").alias("doc_id"))
        pairs = (
            spark.range(n // 2)
            .where(F.col("id") % 4 != 3)
            .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
        ).localCheckpoint(eager=True)
        shard = F.pmod(F.col("a"), F.lit(3))
        tagged = pairs.select(
            (F.col("a") * 4 + shard).alias("a"),
            (F.col("b") * 4 + shard).alias("b"),
        )
        store = connected_components(tagged).select(
            F.expr("node div 4").alias("node"),
            F.expr("cluster_id div 4").alias("cluster_id"),
        )
        return leakage_safe_split(
            ids, components=_components_store_merge(store)
        )

    probe("leakage_split_store", run_split_store)

    # X88 persistent IVF store: build = one assignment scan + one
    # partitioned write (linear); query = probe-cell partition cut +
    # candidate join (sublinear in corpus at the sqrt-n sizing)
    import shutil
    import tempfile

    from genie_spark.analytics.ann_store import (
        ivf_store_build,
        ivf_store_topk,
    )

    def run_ivf_store(n):
        d = tempfile.mkdtemp(prefix="ivf_probe_")
        try:
            e = embs(n).localCheckpoint(eager=True)
            ivf_store_build(
                e, d, n_centroids=max(16, _math.isqrt(max(n, 1)))
            )
            return ivf_store_topk(
                spark, d, e.where(F.col("vec_id") < 16), k=10, n_probe=4
            ).localCheckpoint(eager=True)
        finally:
            # the checkpoint above materialized the result; the store
            # dir can go
            shutil.rmtree(d, ignore_errors=True)

    probe("ivf_store_build_query", run_ivf_store)

    # X89 SQ8: train = one 2·dim-aggregate scan, encode = literal-array
    # transform, search = the local-top-k Arrow engine — wall must be
    # linear in the corpus at fixed query count
    from genie_spark.analytics.similarity import prefix_rerank_topk, sq8_topk

    probe(
        "sq8_topk",
        lambda n: sq8_topk(
            embs(n), k=10, query_filter=F.col("vec_id") < 16
        ),
    )
    # X90 Matryoshka funnel: prefix pass scans everything at 1/4 the
    # dot width, rerank touches only queries × m candidate rows —
    # linear with a smaller constant than the full brute pass
    probe(
        "prefix_rerank",
        lambda n: prefix_rerank_topk(
            embs(n), prefix_dim=16, m=50, k=10,
            query_filter=F.col("vec_id") < 16,
        ),
    )

    # W5-W7 event analytics: one user-keyed exchange each (plan-pinned
    # in tests/test_sessions.py) — wall tracks the event count, and
    # parallelism is user cardinality (n/50 users here)
    from genie_spark.operators.sessions import (
        funnel_times,
        retention_matrix,
        session_stats,
    )

    def synth_events(n):
        types = F.array(
            F.lit("view"), F.lit("click"), F.lit("purchase"),
            F.lit("signup"), F.lit("error"),
        )
        return spark.range(n).select(
            F.col("id").alias("event_id"),
            F.pmod(F.col("id"), F.lit(max(n // 50, 1))).alias("user_id"),
            F.element_at(
                types, (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int")
            ).alias("event_type"),
            # deterministic pseudo-times: spread each user's events
            # over ~n minutes with md5-derived jitter
            (
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
                .cast("long") % (n * 60_000_000)
            ).alias("ts_us"),
        ).repartition(32)

    # X91 PageRank: per iteration one src-keyed join + one dst-keyed
    # aggregate over node-sized state (localCheckpointed) — wall must
    # be linear in edges at fixed iteration count
    from genie_spark.analytics.graph import pagerank

    def synth_edges(n):
        return spark.range(n).select(
            (F.pmod(F.col("id") * 7, F.lit(max(n // 10, 2)))).alias("src"),
            (F.pmod(F.col("id") * 13 + 5, F.lit(max(n // 10, 2)))).alias("dst"),
        ).repartition(32)

    probe("pagerank", lambda n: pagerank(synth_edges(n), iters=3))
    # X92 triangles: degree orientation caps per-vertex wedge fans at
    # O(sqrt(E)) — wall must stay near-linear even on this
    # multi-community synthetic graph
    from genie_spark.analytics.graph import triangle_count

    probe("triangles", lambda n: triangle_count(synth_edges(n)))

    probe("sessionize_stats", lambda n: session_stats(synth_events(n)))
    probe(
        "funnel",
        lambda n: funnel_times(
            synth_events(n), steps=["view", "click", "purchase"]
        ),
    )
    probe("retention", lambda n: retention_matrix(synth_events(n)))

    print(json.dumps({"size_ratio": big / small, "results": results}))


if __name__ == "__main__":
    main()
