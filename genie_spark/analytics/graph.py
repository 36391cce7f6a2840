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
    # iteration (degree never changes)
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    base = (int(scale) * (1000 - int(damping_milli))) // 1000
    ranks = nodes.withColumn("rank", F.lit(int(scale)).cast("long"))
    for _ in range(iters):
        contrib = (
            ed.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select("dst", F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
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
