"""Capture .explain("formatted") for headline (or named) queries into
plans/r16/<query>_<tag>.txt, plus a one-line plan-shape summary
(Exchange count, join strategies, Python-eval nodes, scans) per query.

Usage:
    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]

Plans are captured WITHOUT executing the query (explain only), so this
is safe to run alongside nothing else; it starts its own Spark session.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def plan_summary(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "BroadcastExchange": len(re.findall(r"BroadcastExchange", plan)),
        "SortMergeJoin": len(re.findall(r"SortMergeJoin", plan)),
        "BroadcastHashJoin": len(re.findall(r"BroadcastHashJoin", plan)),
        "ShuffledHashJoin": len(re.findall(r"ShuffledHashJoin", plan)),
        "BatchEvalPython": len(re.findall(r"BatchEvalPython", plan)),
        "ArrowEvalPython": len(re.findall(r"ArrowEvalPython", plan)),
        "MapInArrow": len(re.findall(r"MapInArrow", plan)),
        "FlatMapGroupsInPandas": len(re.findall(r"FlatMapGroupsInPandas", plan)),
        "Scan parquet": len(re.findall(r"Scan parquet", plan)),
        "WindowExec": len(re.findall(r"\bWindow\b", plan)),
        "Sort": len(re.findall(r"\bSort\b", plan)),
        "HashAggregate": len(re.findall(r"HashAggregate", plan)),
        "ObjectHashAggregate": len(re.findall(r"ObjectHashAggregate", plan)),
        "SortAggregate": len(re.findall(r"SortAggregate", plan)),
        "CartesianProduct": len(re.findall(r"CartesianProduct", plan)),
        "BroadcastNestedLoopJoin": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "InMemoryTableScan": len(re.findall(r"InMemoryTableScan", plan)),
    }
    return ", ".join(f"{k}={v}" for k, v in counts.items() if v)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from genie_spark.session import get_spark
    from genie_spark.workload import QUERIES

    spark = get_spark("genie_spark_plan_capture")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"ERR {name}: {exc}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {plan_summary(plan)}")


if __name__ == "__main__":
    main()
