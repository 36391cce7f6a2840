"""Embedding clustering: deterministic distributed k-means (Lloyd's).

The corpus-organization step of a training-data pipeline (domain
discovery, cluster-balanced sampling, semantic sharding — the
SemDeDup/k-means-curation family): partition the embedding space into
k cells and tag every vector with its cell.

Spark shape — the 100 TB one:

* The corpus is quantized once (`similarity.quantized`, exact integer
  vectors) and persisted; each Lloyd iteration is ONE scan of that
  cached table with a PURE MAP assignment (centroids are collected
  driver-side — k·dim longs, tiny by contract — and embedded as a
  literal array, the same broadcast-argmax shape as
  ``similarity.ivf_topk``) followed by ONE partial-aggregable
  groupBy((cid, dim)) shuffle for the centroid update.  No iteration
  ever shuffles the vectors themselves.
* k and iters are FIXED hyper-parameters, so the whole run is
  iters + 1 jobs regardless of corpus size; at 1000 executors each
  job is scan + map + a k·dim-row aggregate.

Determinism (the property that lets a DuckDB oracle mirror the run
bit-for-bit, and reruns reproduce):

* init: the k lowest-id vectors ARE the initial centroids (no RNG);
* distance: squared Euclidean on quantized integers — exact longs;
* ties: lowest centroid id wins (struct-min on (d2, cid));
* update: element-wise ``floor(sum/count)`` — sum and count are exact
  longs and |sum| << 2^53, so the IEEE divide+floor is identical in
  any engine; an empty cluster keeps its previous centroid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genie_spark.analytics.similarity import quantized

# flat-Lloyd SemDeDup's compute envelope (see semantic_dedup docstring)
SEMANTIC_DEDUP_MAX_ROWS = 200_000


def _assign_cid(vec: Column, centroids: list[tuple[int, list[int]]]) -> Column:
    """Nearest-centroid id for a quantized vector column: one literal
    array<struct(d2, cid)> built per centroid, struct-min = (d2 asc,
    cid asc) — pure map, whole-stage codegen, zero shuffle.  The
    centroid literals are rendered as ONE F.expr string (per-literal
    Column objects cost a Py4J round-trip each — see
    similarity._centroid_literals)."""
    structs = []
    for cid, cvec in centroids:
        vs = ",".join(str(int(x)) for x in cvec)
        structs.append(f"CAST(array({vs}) AS ARRAY<BIGINT>)")
    cent_arr = F.expr(
        "array("
        + ",".join(
            f"named_struct('cid', CAST({cid} AS BIGINT), 'v', {s})"
            for (cid, _), s in zip(centroids, structs)
        )
        + ")"
    )
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(vec, c["v"], lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, d: acc + d,
            ).alias("d2"),
            c["cid"].alias("cid"),
        ),
    )
    return F.array_min(scored)


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Lloyd's k-means over an ``array<float>`` column; returns
    (id, cluster_id, d2) — the final assignment and its exact squared
    quantized distance.

    Each iteration: assignment is a literal-centroid map over the
    persisted quantized corpus; the update aggregates
    ``posexplode``d (cid, dim, value) triples — a k·dim-group partial
    aggregate, the ONLY shuffle per iteration — and the new centroids
    (k·dim longs) are collected driver-side for the next literal.
    ``iters`` is fixed (not convergence-tested) so the oracle can
    unroll the same number of steps.
    """
    from pyspark import StorageLevel

    q = df.select(
        F.col(id_col).alias("__id"), quantized(vec_col).alias("__v")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        init = q.orderBy("__id").limit(k).collect()
        centroids = [(i, list(r["__v"])) for i, r in enumerate(init)]
        if not centroids:
            # empty corpus: no centroids to seed — an empty literal
            # array would be VOID-typed and break the struct extract
            return df.sparkSession.createDataFrame(
                [], f"{id_col} long, cluster_id long, d2 long"
            )
        dim = len(centroids[0][1])
        for _ in range(iters):
            assigned = q.withColumn("__c", _assign_cid(F.col("__v"), centroids))
            sums = (
                assigned.select(
                    F.col("__c")["cid"].alias("cid"),
                    F.posexplode("__v").alias("pos", "x"),
                )
                .groupBy("cid", "pos")
                .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
                .withColumn("m", F.floor(F.col("s") / F.col("n")).cast("long"))
                .collect()
            )
            by_cid: dict[int, list[int]] = {}
            for r in sums:
                by_cid.setdefault(r["cid"], [0] * dim)[r["pos"]] = r["m"]
            centroids = [
                (cid, by_cid.get(cid, old)) for cid, old in centroids
            ]
        final = q.withColumn("__c", _assign_cid(F.col("__v"), centroids))
        return final.select(
            F.col("__id").alias(id_col),
            F.col("__c")["cid"].alias("cluster_id"),
            F.col("__c")["d2"].alias("d2"),
        )
    finally:
        q.unpersist()


def kmeans_sizes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Cluster cardinality + mean distance rollup of
    ``kmeans_assign`` — the shape used for cluster-balanced sampling
    decisions (which cells are over/under-represented)."""
    a = kmeans_assign(df, id_col, vec_col, k, iters)
    return a.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("d2").alias("sum_d2"),
    )


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    target_per_cluster: int = 100,
) -> DataFrame:
    """Cluster-balanced downsampling (the SemDeDup/DoReMi-style
    curation move): k-means the embedding space, then keep each member
    of an over-represented cell with probability ``target/|cell|`` so
    every cell contributes ≈``target_per_cluster`` vectors — flattens
    semantic over-representation (boilerplate clusters shrink, rare
    domains survive intact).

    Deterministic: the keep decision is the same md5-uniform the
    sampling ops use (``corpus._uniform_bp`` formula), thresholded at
    ``min(10000, target·10000 // |cell|)`` basis points — exact
    integers, so the oracle reproduces the row set bit-for-bit.

    Scale shape: ``kmeans_assign``'s cost (iters scans + k·dim aggs)
    plus ONE k-row size aggregate broadcast back over the assignment —
    the corpus is filtered map-side, never shuffled again.
    """
    from pyspark import StorageLevel

    # two consumers (size aggregate + the filter join) — persist so the
    # final assignment map runs once, not per consumer
    a = kmeans_assign(df, id_col, vec_col, k, iters).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = a.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("__n"))
    # the ONE md5-uniform implementation every sampling op shares —
    # a drifted copy would silently break oracle reproducibility
    from genie_spark.analytics.corpus import SAMPLE_DENOM, _uniform_bp

    keep_bp = F.least(
        F.lit(SAMPLE_DENOM).cast("long"),
        F.floor(
            F.lit(target_per_cluster * SAMPLE_DENOM) / F.col("__n")
        ).cast("long"),
    )
    u = _uniform_bp(id_col)
    return (
        a.join(F.broadcast(sizes), "cluster_id")  # sizes: k rows, dim table
        .withColumn("keep_bp", keep_bp)
        .withColumn("sample_bucket", u)
        .where(F.col("sample_bucket") < F.col("keep_bp"))
        .select(id_col, "cluster_id", "sample_bucket", "keep_bp")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.35,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    compare pairs only WITHIN a cluster and drop every vector that has
    a near-duplicate (cosine > threshold) with a smaller id — the
    keep-lowest-id greedy.  Returns the drop list
    (id, kept_witness, max_cosine).

    This is the third candidate-generation geometry in the
    candidates→verify family: MinHash bands (lexical), IVF cell
    co-membership (one-shot spatial), and here LLOYD cells — iterated
    centroids adapt to the density of the corpus, so comparisons
    concentrate where the semantic mass is.  Pairs that straddle a
    cluster boundary are missed by design (SemDeDup's approximation);
    the oracle mirrors the identical deterministic clustering, so the
    two engines agree exactly.

    Scale shape: ``kmeans_assign``'s fixed-job-count clustering, then
    ONE equi-join on cluster_id (merge-hinted — candidate volume is
    data-sized, never broadcast on a static misestimate) and a
    candidate-sized exact verify (``cosine_verify_pairs``).

    Compute envelope — flat-Lloyd SemDeDup is inherently superlinear,
    so this operator is capped: assignment costs O(n·k·dim) (every
    vector against every literal centroid) while per-cell verify costs
    O(n²·B/k) for occupancy B; the total is minimized near
    k ≈ n/√(dim) at O(n^1.5)·dim ops.  The stress probe measures 5.4×
    wall per 10× rows with the k = n/256 occupancy rule
    (tools/stress_scale.py, BASELINE.md §5) — faithful to the
    published method, not a 100 TB path.  Past the guard, generate
    candidates with ``similarity.lsh_banded_pairs`` (or
    ``ivf_cell_pairs``) + ``cosine_verify_pairs`` — the linear
    candidates→verify geometry ``dedup_embedding_drop`` uses; at
    extreme scale a hierarchical (multi-level) k-means assignment
    would restore SemDeDup's cluster semantics, at the cost of a
    second centroid tier.
    """
    from genie_spark.analytics.similarity import cosine_verify_pairs

    n = df.count()
    if n > SEMANTIC_DEDUP_MAX_ROWS:
        raise ValueError(
            f"semantic_dedup's flat-Lloyd assignment is O(n·k·dim) and its "
            f"per-cell verify O(n²/k) — ~O(n^1.5) total at the optimal k; "
            f"input has {n:,} vectors. Use lsh_banded_pairs/ivf_cell_pairs + "
            "cosine_verify_pairs at this scale (the dedup_embedding_drop "
            "geometry)."
        )

    # the assignment is consumed twice (both sides of the pair join) —
    # localCheckpoint, not persist: checkpoint blocks free when the
    # DataFrame is garbage collected, so repeated calls in a session
    # don't accumulate cache-manager entries only unpersist would
    # release (the incremental_minhash_pairs hygiene rule)
    a = (
        kmeans_assign(df, id_col, vec_col, k, iters)
        .select(F.col(id_col), "cluster_id")
        .localCheckpoint(eager=True)
    )
    left = a.select(F.col(id_col).alias("a"), "cluster_id")
    right = a.select(F.col(id_col).alias("b"), "cluster_id")
    cand = (
        left.join(right.hint("merge"), "cluster_id")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    pairs = cosine_verify_pairs(df, cand, id_col, vec_col, threshold)
    return (
        pairs.groupBy("b")
        .agg(
            F.min("a").alias("kept_witness"),
            F.max("cosine").alias("max_cosine"),
        )
        .select(F.col("b").alias(id_col), "kept_witness", "max_cosine")
    )
