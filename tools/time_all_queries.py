"""Time EVERY registered query at a given SF dir: construction wall
(driver-side work: collects, localCheckpoints, guards) and noop-sink
execution wall, separately — the optimization round's coverage sweep.

Usage: python tools/time_all_queries.py [SF_DIR] [name ...]

Prints one line per query: name, construct_s, exec_s, total_s; then a
ranking of the top totals.  One run per query (this is a coverage
scan, not the bench — medians come from bench.py for the headline
set).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    from genie_spark.session import get_spark
    from genie_spark.workload import QUERIES

    spark = get_spark("time_all_queries")
    # same untimed warmup as bench.py
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(1_000_000).groupBy(F.pmod("id", F.lit(7))).count().write.format(
        "noop"
    ).mode("overwrite").save()

    rows = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(name)
        try:
            t0 = time.time()
            df = fn(spark, sf_dir)
            _ = df.schema
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            df = None
            rows.append((name, round(t1 - t0, 3), round(t2 - t1, 3)))
            print(
                f"{name:40s} construct {t1 - t0:7.3f}  exec {t2 - t1:7.3f}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — record and continue
            rows.append((name, None, None))
            print(f"{name:40s} ERROR {type(exc).__name__}: {exc}"[:200], flush=True)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
    spark.sparkContext.setJobDescription(None)

    ok = [(n, c, e) for n, c, e in rows if c is not None]
    print("\n== top 25 by total (construct + exec) ==")
    for n, c, e in sorted(ok, key=lambda r: -(r[1] + r[2]))[:25]:
        print(f"{n:40s} total {c + e:7.3f}  (construct {c:.3f} exec {e:.3f})")
    print(f"\ntotal construct {sum(c for _, c, _ in ok):.1f}s  "
          f"exec {sum(e for _, _, e in ok):.1f}s  n={len(ok)}")


if __name__ == "__main__":
    main()
