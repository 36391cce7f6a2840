"""Measured recall of the compressed ANN tiers vs the exact baseline.

For the sf queries (vec_id < 20): exact top-k by squared quantized L2
distance (the metric ADC approximates), then recall@k of
``pq_topk`` (X61, flat ADC) and ``ivfpq_topk`` (X62, coarse-pruned
ADC).  Prints one JSON line; evidence for BASELINE.md — PQ recall is
a sizing question (m, k, iters, n_probe), measured, not asserted.

Usage: python tools/measure_pq_recall.py [sf_dir] [k] [pq_m] [pq_k]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    pq_m = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    pq_k = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from pyspark.sql import functions as F

    from genie_spark.analytics.clustering import (
        ivfpq_residual_topk,
        ivfpq_topk,
        pq_topk,
    )
    from genie_spark.analytics.similarity import dot, quantized
    from genie_spark.session import get_spark

    spark = get_spark("pq_recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    qf = F.col("vec_id") < 20

    # exact squared quantized L2 top-k per query (the ADC target
    # metric): ||a-b||^2 = ||a||^2 - 2ab + ||b||^2 on exact ints
    v = emb.select(F.col("vec_id"), quantized("embedding").alias("v"))
    v = v.withColumn("n2", dot(F.col("v"), F.col("v")))
    q = v.where(qf).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn"),
    )
    pairs = q.crossJoin(v.hint("broadcast")).where(
        F.col("query_id") != F.col("vec_id")
    )
    d2 = F.col("qn") - 2 * dot(F.col("qv"), F.col("v")) + F.col("n2")
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    exact = (
        pairs.withColumn("d2", d2)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .collect()
    )
    truth: dict[int, set] = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(df) -> float:
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(got.get(qid, set()) & t) for qid, t in truth.items())
        total = sum(len(t) for t in truth.values())
        return round(hits / total, 4) if total else 0.0

    out = {
        "sf_dir": sf_dir,
        "k": k,
        "pq_m": pq_m,
        "pq_k": pq_k,
        "n_queries": len(truth),
        "recall_pq_topk": recall(
            pq_topk(emb, qf, k_neighbors=k, m=pq_m, k=pq_k, iters=2)
        ),
        "recall_ivfpq_topk": recall(
            ivfpq_topk(
                emb, qf, k_neighbors=k, n_centroids=16, n_probe=4,
                m=pq_m, k=pq_k, iters=2,
            )
        ),
        # X71 A/B: residual training at the IDENTICAL (m, k, iters,
        # n_centroids, n_probe) budget — the §V recall rung
        "recall_ivfpq_residual_topk": recall(
            ivfpq_residual_topk(
                emb, qf, k_neighbors=k, n_centroids=16, n_probe=4,
                m=pq_m, k=pq_k, iters=2,
            )
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
