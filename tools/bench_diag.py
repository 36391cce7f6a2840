"""Diagnostic bench: same headline sequence as bench.py, plus a
watchdog that captures a JVM thread dump + GC stats DURING any query
that exceeds a stall threshold.  Evidence collector for the round-8
intermittent 30-55 s stall (VERDICT r8 'What's wrong #1') — not part
of the graded harness.

Usage: python tools/bench_diag.py [stall_threshold_sec]
Dumps land in /tmp/bench_diag/.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402

OUT = "/tmp/bench_diag"


def _jvm_pid() -> int | None:
    try:
        out = subprocess.run(
            ["jps", "-l"], capture_output=True, text=True, timeout=10
        ).stdout
    except Exception:
        return None
    for line in out.splitlines():
        parts = line.split()
        if len(parts) == 2 and "SparkSubmit" in parts[1]:
            return int(parts[0])
    # local-mode pyspark shows as org.apache.spark.deploy.SparkSubmit;
    # fall back to any non-jps java process
    for line in out.splitlines():
        parts = line.split()
        if len(parts) >= 1 and "Jps" not in line:
            try:
                return int(parts[0])
            except ValueError:
                continue
    return None


def _capture(tag: str, pid: int) -> None:
    os.makedirs(OUT, exist_ok=True)
    stamp = time.strftime("%H%M%S")
    for name, cmd in [
        ("jstack", ["jstack", "-l", str(pid)]),
        ("gcutil", ["jcmd", str(pid), "GC.heap_info"]),
        ("vmstat", ["jcmd", str(pid), "VM.native_memory", "summary"]),
        ("safept", ["jcmd", str(pid), "VM.stringtable"]),
    ]:
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=30)
            with open(f"{OUT}/{tag}_{stamp}_{name}.txt", "w") as f:
                f.write(r.stdout + "\n--- stderr ---\n" + r.stderr)
        except Exception as exc:  # noqa: BLE001
            with open(f"{OUT}/{tag}_{stamp}_{name}.txt", "w") as f:
                f.write(f"capture failed: {exc}")
    try:
        with open(f"/proc/{pid}/stat") as f:
            stat = f.read()
        with open(f"{OUT}/{tag}_{stamp}_procstat.txt", "w") as f:
            f.write(stat)
    except Exception:
        pass
    # also: how many python workers are alive?
    try:
        r = subprocess.run(["ps", "-eo", "pid,ppid,rss,etime,comm"],
                           capture_output=True, text=True, timeout=10)
        with open(f"{OUT}/{tag}_{stamp}_ps.txt", "w") as f:
            f.write(r.stdout)
    except Exception:
        pass


def main() -> None:
    thresh = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from genie_spark.session import get_spark
    from genie_spark.workload import QUERIES

    spark = get_spark("genie_spark_bench_diag")
    pid = _jvm_pid()
    print(f"jvm pid: {pid}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        _ = df.schema
        stop = threading.Event()
        fired = []

        def watchdog(qname=name):
            # capture twice during a stall: at thresh and thresh+10
            for delay in (thresh, 10.0):
                if stop.wait(delay):
                    return
                fired.append(qname)
                if pid:
                    _capture(qname, pid)

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        stop.set()
        timings[name] = dt
        flag = "  <-- STALL CAPTURED" if fired else ""
        print(f"{name}: {dt}{flag}", file=sys.stderr)
        try:
            jvm = spark.sparkContext._jvm
        except Exception:
            jvm = None
        if jvm is not None:
            jvm.System.gc()
    total = round(sum(timings.values()), 3)
    print(json.dumps({"metric": "diag_total", "value": total,
                      "queries": timings}))


if __name__ == "__main__":
    main()
