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
