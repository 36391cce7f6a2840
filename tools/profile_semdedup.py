"""One-off stage profiler for semantic_dedup's default path.

Times each stage (kmeans assignment, signatures, candidates, verify)
separately at two corpus sizes to locate the slope driver.
Usage: python tools/profile_semdedup.py [small_n] [big_n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from genie_spark.session import get_spark
from tools.stress_scale import synth_embeddings_dups


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("profile_semdedup")

    from genie_spark.analytics.clustering import kmeans_assign
    from genie_spark.analytics.similarity import (
        _sign_signature,
        cosine_verify_pairs,
    )

    for n in (small, big):
        df = synth_embeddings_dups(spark, n).repartition(32).cache()
        df.count()
        n_planes = max(4, (max(n, 2) // 64).bit_length())
        n_tables = 4
        report = {"n": n, "n_planes": n_planes}

        t = time.time()
        a = (
            kmeans_assign(df, "vec_id", "embedding", 64, 2)
            .select("vec_id", "cluster_id")
            .localCheckpoint(eager=True)
        )
        report["kmeans_s"] = round(time.time() - t, 2)

        t = time.time()
        sigs = df.select(
            F.col("vec_id"),
            *[
                _sign_signature("embedding", 64, n_planes, seed0=1 + tt * n_planes).alias(
                    f"__b{tt}"
                )
                for tt in range(n_tables)
            ],
        )
        tagged = sigs.join(a.hint("merge"), "vec_id").localCheckpoint(eager=True)
        report["signatures_s"] = round(time.time() - t, 2)

        t = time.time()
        # mirrors semantic_dedup's round-7 single-exchange melt: long
        # form + ONE self-join on (cluster_id, table, bucket) instead
        # of n_tables per-table join branches
        long_form = tagged.select(
            "vec_id",
            "cluster_id",
            F.posexplode(
                F.array(*[F.col(f"__b{tt}") for tt in range(n_tables)])
            ).alias("table", "bucket"),
        )
        x = long_form.select(
            F.col("vec_id").alias("a"), "cluster_id", "table", "bucket"
        )
        y = long_form.select(
            F.col("vec_id").alias("b"), "cluster_id", "table", "bucket"
        )
        cand = (
            x.hint("merge")
            .join(y, ["cluster_id", "table", "bucket"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_cand = cand.count()
        report["candidates_s"] = round(time.time() - t, 2)
        report["n_cand"] = n_cand

        t = time.time()
        pairs = cosine_verify_pairs(df, cand, "vec_id", "embedding", 0.6)
        out = (
            pairs.groupBy("b")
            .agg(F.min("a"), F.max("cosine"))
            .count()
        )
        report["verify_s"] = round(time.time() - t, 2)
        report["n_out"] = out
        print(report, flush=True)
        df.unpersist()


if __name__ == "__main__":
    main()
