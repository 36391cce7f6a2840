"""Physical-plan assertions: lock in the scale-critical plan shapes so
a regression (lost pushdown, un-broadcast dim, disappearing partial
aggregation) fails CI rather than surfacing as a 100 TB incident."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_scan_prunes_and_pushes_down(spark):
    from genie_spark.workload import q1_pricing_summary

    df = q1_pricing_summary(spark, SF)
    plan = plan_of(df)
    # filter on l_shipdate reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan
    # column pruning: l_comment is never read
    assert "l_comment" not in plan
    # partial aggregation before the exchange (map-side combine)
    assert "partial_sum" in plan or "partial_count" in plan


def test_j1_dims_broadcast(spark):
    from genie_spark.workload import j1_revenue_per_nation

    plan = plan_of(j1_revenue_per_nation(spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_semi_filter_stays_semi(spark):
    from genie_spark.workload import p3_semi_filter

    plan = plan_of(p3_semi_filter(spark, SF))
    # LeftSemi never materializes the join payload
    assert "LeftSemi" in plan, plan


def test_minhash_no_cartesian(spark):
    from genie_spark.workload_analytics import dedup_minhash_lsh

    plan = plan_of(dedup_minhash_lsh(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_no_cartesian(spark):
    from genie_spark.workload import j3_interval_join

    plan = plan_of(j3_interval_join(spark, SF))
    # the binned range join must be an equi-join on (key, bin), never
    # a nested-loop over the range predicate
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lookup_annotator_broadcasts_dim(spark):
    """The annotation table is a reference dim — the maf side must
    never shuffle for the join (100 TB: maf is data-sized)."""
    from genie_spark.release.mutation import lookup_annotator

    maf = spark.createDataFrame(
        [("17", "7578406", "C", "T")],
        "Chromosome string, Start_Position string, Reference_Allele string, "
        "Tumor_Seq_Allele2 string",
    )
    lookup = spark.createDataFrame(
        [("17", "7578406", "C", "T", "p.R175H")],
        "Chromosome string, Start_Position string, Reference_Allele string, "
        "Tumor_Seq_Allele2 string, HGVSp_Short string",
    )
    plan = plan_of(lookup_annotator(lookup)(maf))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_latest_per_key_reduces_before_exchange(spark):
    """w2 latest-per-key must reduce map-side before the shuffle: Spark
    4 plans the row_number-top-1 as a Partial WindowGroupLimit under
    the exchange, so each map task ships at most one row per key
    instead of the whole 100 TB events table."""
    from genie_spark.workload import w2_latest_per_key

    plan = plan_of(w2_latest_per_key(spark, SF))
    partial = plan.split("Exchange", 1)[-1]
    assert "WindowGroupLimit" in partial and "Partial" in partial, plan


def test_dedup_components_no_cartesian(spark):
    """Pointer-jumping joins stay equi-joins on node/label keys."""
    from genie_spark.workload_analytics import ANALYTICS_QUERIES

    df = ANALYTICS_QUERIES["dedup_components"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
