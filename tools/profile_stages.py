"""Per-stage profile of headline (or named) queries: runs each query
once with the noop sink in a UI-enabled session, then pulls per-stage
metrics (executor run time, shuffle read/write bytes, input bytes,
task count) from the Spark UI REST API and prints a per-query stage
table.  Evidence collector for OPTIMIZATION_r15.md (guide §1/§7.1) —
not part of the graded harness.

Usage: python tools/profile_stages.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEADLINE

    from genie_spark.session import get_spark
    from genie_spark.workload import QUERIES

    spark = get_spark(
        "genie_spark_profile", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=30) as r:
            return json.load(r)

    # warmup (mirrors bench.py)
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(1_000_000).groupBy(F.pmod("id", F.lit(7))).count().write.format(
        "noop"
    ).mode("overwrite").save()

    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        seen = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(name)
        df = fn(spark, sf_dir)
        _ = df.schema
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        time.sleep(0.3)
        new = [s for s in stages() if s["stageId"] not in seen]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages ===")
        for s in new[:10]:
            print(
                f"  stage {s['stageId']:4d} tasks={s['numCompleteTasks']:3d} "
                f"run={s.get('executorRunTime', 0)/1000:7.2f}s "
                f"cpu={s.get('executorCpuTime', 0)/1e9:7.2f}s "
                f"in={s.get('inputBytes', 0)/1e6:8.1f}MB "
                f"sr={s.get('shuffleReadBytes', 0)/1e6:8.1f}MB "
                f"sw={s.get('shuffleWriteBytes', 0)/1e6:8.1f}MB "
                f"spill={s.get('diskBytesSpilled', 0)/1e6:6.1f}MB "
                f"| {s.get('name', '')[:60]}"
            )
        try:
            jvm = spark.sparkContext._jvm
        except Exception:
            jvm = None
        if jvm is not None:
            jvm.System.gc()
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
