"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing uses the noop sink so we measure the full distributed compute
(scan → shuffle → agg) without driver-collect serialization noise.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — scan/agg, join chain, window,
# interval join, pivot, upsert, dedup-ish group, text analytics, plus
# (round 8) the round-7 LLM-pipeline families so a regression there is
# visible in BENCH_r*.json: semantic dedup, Bloom decontamination,
# Count-Min sketch, token-budgeted selection.  Round 12 widens the set
# (VERDICT r11 item 4) with five round-10/11 family representatives —
# substring dedup, BPE encode, bigram LM, winnow fingerprint pairs,
# DSIR resampling — so their walls are driver-tracked round-over-round
# instead of living only in BASELINE prose.  The FIRST 17 entries are
# the legacy-17 set, anchor 30.64 s (BASELINE.md) — keep them leading
# so the subtotal stays comparable; the widened-22 anchor is recorded
# alongside it.
LEGACY_17 = 17
HEADLINE = [
    "q1_pricing_summary",
    "j1_revenue_per_nation",
    "p3_semi_filter",
    "a3_pivot_counts",
    "a8_merge_duplicates",
    "j7_upsert_diff",
    "w1_adjacent_events",
    "j3_interval_join",
    "j6_max_overlap_remap",
    "phi_redaction",
    "dedup_minhash_lsh",
    "ann_topk",
    "text_quality",
    "dedup_semantic",
    "corpus_bloom_decontaminate",
    "sketch_count_min",
    "corpus_token_budget",
    # round-12 widening (round-10/11 families)
    "dedup_substring_spans",
    "text_bpe_encode",
    "text_lm_bigram",
    "dedup_winnow_pairs",
    "corpus_dsir_sample",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from genie_spark.session import get_spark
    from genie_spark.workload import QUERIES

    spark = get_spark("genie_spark_bench")
    # untimed JIT/codegen warmup on NON-benchmark data (a tiny dim
    # table + a synthetic agg): the first query of a cold session
    # otherwise pays 1-3 s of whole-stage-codegen compilation that is
    # session cost, not query cost — the BASELINE.md anchors were
    # measured in warm sessions.  Deliberately does NOT touch
    # lineitem/documents, so no benchmark input is pre-cached.
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(1_000_000).groupBy(F.pmod("id", F.lit(7))).count().write.format(
        "noop"
    ).mode("overwrite").save()
    timings: dict[str, object] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        # Failure-isolated: one broken query must not zero the whole
        # round's bench evidence (round 3 lost all numbers to a single
        # AnalysisException with no per-query handling).
        try:
            df = fn(spark, sf_dir)
            _ = df.schema  # resolve the plan (no execution)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — record and continue
            timings[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
        # nudge the ContextCleaner: old executions' shuffle state is only
        # released on driver GC; letting it pile up degrades later
        # queries (observed 30×: high sys-CPU, shuffle-file churn).
        # _jvm is a classic-mode private handle — absent under Spark
        # Connect, where the nudge simply doesn't apply (no local JVM).
        try:
            jvm = spark.sparkContext._jvm
        except Exception:  # Connect: sparkContext property itself raises
            jvm = None
        if jvm is not None:
            jvm.System.gc()
    total = round(sum(t for t in timings.values() if isinstance(t, float)), 3)
    legacy = round(
        sum(
            t
            for name in HEADLINE[:LEGACY_17]
            for t in [timings.get(name)]
            if isinstance(t, float)
        ),
        3,
    )
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "legacy17_subtotal": legacy,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
