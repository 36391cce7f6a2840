"""Iterative graph centrality — exact-integer PageRank.

X91 (r15): the iterative-numeric graph operator class, extending the
connected-components family (analytics/dedup.py — the reference's
retraction cascade is the transitive-closure cousin,
genie/database_to_staging.py retraction walk) with the canonical
damped-distribution algorithm (Brin & Page 1998).

Exact-integer discipline (the repo's engine-stability rule): ranks are
held in integer ``scale`` units; one iteration is

    r'(v) = (scale · (1000 − d_milli)) div 1000
            + (d_milli · Σ_{u→v} (r(u) div deg(u))) div 1000

— every operation a long ``div`` (operands nonnegative, trunc ==
floor), so a DuckDB oracle unrolling the same steps reproduces ranks
bit-for-bit.  The simplified dangling-mass variant (mass at sinks
drops rather than teleporting) is used, as in most SQL formulations;
document rankings only need relative order.

Spark shape (the 100 TB posture): out-degrees are ONE map-side-partial
aggregate; each iteration is ONE src-keyed equi-join (ranks ⋈ edges —
both sides hash-partitioned on the same key, so consecutive
iterations reuse the exchange layout) + ONE dst-keyed aggregate, then
a left join back to the node set for sink rows.  Per-iteration state
is node-sized, ``localCheckpoint``ed (the ``connected_components``
discipline) so lineage stays flat across iterations instead of
doubling.  No driver-side state beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genie_spark.session import local_rows_df

PR_SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping_milli: int = 850,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Exact-integer PageRank over a directed edge list.

    Returns (node, rank) with ranks in integer ``scale`` units after
    ``iters`` synchronous iterations from the uniform start
    ``r0 = scale``.  Duplicate edges are kept (each contributes —
    multigraph semantics; dedup first for simple-graph semantics).
    """
    if iters < 1:
        raise ValueError(f"pagerank: iters must be >= 1, got {iters}")
    if not 0 <= damping_milli <= 1000:
        raise ValueError(
            f"pagerank: damping_milli must be in [0, 1000], got {damping_milli}"
        )
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # edges annotated with the sender's out-degree once — reused every
    # iteration (degree never changes).  NO pre-checkpoint repartition
    # by src: under AQE ``localCheckpoint`` captures UnknownPartitioning
    # (AdaptiveSparkPlanExec defeats LogicalRDD's
    # partitioning-preservation path — the committed after-plan's edge
    # scan reads ``UnknownPartitioning(0)`` and ENSURE_REQUIREMENTS
    # re-exchanges it every iteration regardless), so the repartition
    # the first r15 pass added was one extra edge-sized shuffle in the
    # build job for zero loop benefit (A/B at sf0.1: build 3.2 s with
    # it, 2.4 s without; iteration plans identical).
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    base = (int(scale) * (1000 - int(damping_milli))) // 1000
    ranks = nodes.withColumn("rank", F.lit(int(scale)).cast("long"))
    for _ in range(iters):
        # shuffle_hash with the NODE-sized side as build (r15, guide
        # §3.1): sort-merge was sorting the edge-sized ``ed`` stream
        # every iteration just to meet the node-sized rank/contrib
        # tables; the build side is n_nodes/P per partition and AQE
        # grows P with the edge volume, so it stays bounded at scale.
        # Interleaved A/B at sf0.1 (3 iters): 7.2 -> 4.7 s median with
        # a bit-identical rank trajectory.
        contrib = (
            ed.join(
                ranks.select(F.col("node").alias("src"), "rank").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .select("dst", F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        ranks = (
            nodes.join(
                contrib.hint("shuffle_hash"),
                nodes["node"] == contrib["dst"],
                "left",
            )
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({int(damping_milli)} * coalesce(s, 0L)) div 1000"
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """X92 — global triangle count over an undirected simple graph
    (self-loops dropped, duplicate/reverse edges collapsed), the
    standard graph-analytics benchmark reduction (LDBC / GraphFrames
    class).  Returns ONE row (n_nodes, n_edges, n_triangles).

    The scale trick is DEGREE ORIENTATION (Chiba & Nishizeki 1985 /
    the MapReduce formulation of Suri & Vassilvitskii 2011): orient
    every edge from its lower-(degree, node) endpoint to the higher
    one — a total order, so each triangle is counted EXACTLY once at
    its lowest-ranked vertex — and build wedges only among each
    vertex's OUT-neighbors.  Out-degree under this orientation is
    O(sqrt(E)) even for skewed (power-law) graphs, so the wedge join
    is O(E^1.5) worst-case instead of the hub-quadratic blow-up a
    naive node-id orientation suffers; the count itself is
    orientation-invariant (the oracle counts via plain id-ordered
    3-way join and must agree).

    Spark shape: canonicalize+distinct (one exchange), one degree
    aggregate, two broadcast-or-shuffle equi-joins (wedge build on the
    pivot vertex, closing-edge check on the (v, w) pair) and a single
    global count — no driver-side graph state.
    """
    a = F.least(F.col(src_col).cast("long"), F.col(dst_col).cast("long"))
    b = F.greatest(F.col(src_col).cast("long"), F.col(dst_col).cast("long"))
    e = (
        edges.select(a.alias("a"), b.alias("b"))
        .where(F.col("a").isNotNull() & (F.col("a") != F.col("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    keyed = (
        e.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "da")
        .join(deg.withColumnRenamed("node", "b"), "b")
        .withColumnRenamed("deg", "db")
    )
    # identical field names in both structs — CASE branches must have
    # the same STRUCT type, and struct(da, a) != struct(db, b) to the
    # type checker
    ka = F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
    kb = F.struct(F.col("db").alias("d"), F.col("b").alias("n"))
    o = keyed.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(ka < kb, kb).otherwise(ka).alias("kv"),
    ).localCheckpoint(eager=True)
    x = o.select(F.col("u"), F.col("v").alias("v1"), F.col("kv").alias("k1"))
    y = o.select(F.col("u"), F.col("v").alias("v2"), F.col("kv").alias("k2"))
    # wedge (v1, v2) at pivot u with rank(v1) < rank(v2); the triangle
    # closes iff the ORIENTED edge v1→v2 exists (it must run low→high,
    # so matching o's (u, v) as (v1, v2) is exhaustive).  Each wedge
    # row keeps its pivot implicitly (one row per (u, v1, v2)), and a
    # semi join neither drops nor duplicates rows on the unique closing
    # edge — so count(semi) IS the triangle count.
    #
    # Join strategy (r15, guide §3.1): both joins build their hash
    # table on an EDGE-sized side and stream the wedge-sized side.
    # Sort-merge would sort the O(E^1.5) wedge stream just to probe the
    # O(E) closing-edge set (measured: the wedge Exchange+Sort was the
    # whole query's dominant cost — 41M wedges vs 1.2M edges at sf0.1;
    # SMJ 6.5 s → SHJ 3.2 s median, interleaved).  The build side stays
    # safe at scale: per-partition build is E/P and AQE grows P with
    # the wedge volume (E^1.5), so the build SHRINKS relative to the
    # stream as the graph grows; never broadcast (edge sets are
    # data-sized).
    wedges = (
        x.join(y.hint("shuffle_hash"), "u")
        .where(F.col("k1") < F.col("k2"))
        .select("v1", "v2")
    )
    closing = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    n_tri = wedges.join(closing.hint("shuffle_hash"), ["v1", "v2"], "semi").count()
    spark = edges.sparkSession
    # the wedge job shuffles O(E^1.5) rows; release its state before
    # any follow-up job runs (ContextCleaner frees shuffle blocks only
    # on driver GC — without this the next action, even a 1-row write
    # of the result, measured 31 s at sf0.1 against the leftovers)
    from genie_spark.session import gc_nudge

    gc_nudge(spark)
    n_nodes = deg.count()
    n_edges = e.count()
    return local_rows_df(
        spark,
        [(int(n_nodes), int(n_edges), int(n_tri))],
        "n_nodes long, n_edges long, n_triangles long",
    )
