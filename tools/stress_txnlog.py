"""Scale probes for the transaction-log backend (X44) and the Z-order
layout (X45) — the evidence BASELINE.md records per operator family.

Part 1 (metadata-only, no Spark): commit-append and snapshot-replay
wall vs table age.  Builds tables of N commits through the SAME
_append_entry/_write_checkpoint pair the LogCommit hook runs
(one add+remove per commit — the steady-state upsert shape), then
measures (a) mean append wall early vs late in the table's life and
(b) snapshot resolution wall + log files read, with and without
checkpoints.

Part 2 (--zorder, Spark): files-touched fraction vs file count for a
fixed-selectivity range on each clustered dim, at growing file counts
— the pruning claim must hold as the table splits finer.

Usage:
    python tools/stress_txnlog.py [n_commits ...]   # default 50 500 5000
    python tools/stress_txnlog.py --zorder          # Spark part
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import genie_spark.io.txnlog as tx  # noqa: E402


def build_table(root: str, n: int) -> str:
    tgt = os.path.join(root, f"t{n}")
    os.makedirs(tgt)
    append_walls: list[float] = []
    for v in range(1, n + 1):
        entry = {
            "version": v,
            "op": "replace_partitions",
            "partition_col": "CENTER",
            "ts": 0.0,
            "actions": [
                *(
                    [{"remove": {"path": f"CENTER=A/f{v-1}.parquet",
                                 "partition": {"CENTER": "A"}}}]
                    if v > 1
                    else []
                ),
                {"add": {"path": f"CENTER=A/f{v}.parquet",
                         "partition": {"CENTER": "A"},
                         "rows": v, "stats": {"k": {"min": v, "max": v,
                                                    "nulls": 0}}}},
            ],
        }
        t0 = time.time()
        assert tx._append_entry(tgt, entry, v)
        if v % tx.CHECKPOINT_INTERVAL == 0:
            tx._write_checkpoint(tgt, v, tx.snapshot_actions(tgt, v))
        append_walls.append(time.time() - t0)
    head = append_walls[: min(20, n)]
    tail = append_walls[-min(20, n):]
    return tgt, sum(head) / len(head), sum(tail) / len(tail)


def count_reads(fn):
    reads = {"entry": 0, "checkpoint": 0}
    real_e, real_c = tx._read_entry, tx._read_checkpoint
    tx._read_entry = lambda t, v: (reads.__setitem__("entry", reads["entry"] + 1),
                                   real_e(t, v))[1]
    tx._read_checkpoint = lambda t, v: (
        reads.__setitem__("checkpoint", reads["checkpoint"] + 1), real_c(t, v))[1]
    try:
        t0 = time.time()
        fn()
        wall = time.time() - t0
    finally:
        tx._read_entry, tx._read_checkpoint = real_e, real_c
    return wall, reads


def run_txnlog(sizes: list[int]) -> None:
    root = tempfile.mkdtemp(prefix="txnlog_probe_")
    out = {}
    try:
        for n in sizes:
            tgt, head_w, tail_w = build_table(root, n)
            wall_cp, reads_cp = count_reads(lambda: tx.snapshot_actions(tgt))
            # strip checkpoints → the full-fold baseline
            d = tx._log_dir(tgt)
            for name in os.listdir(d):
                if name.endswith(".checkpoint.json") or name == tx._LAST_CHECKPOINT:
                    os.unlink(os.path.join(d, name))
            wall_full, reads_full = count_reads(lambda: tx.snapshot_actions(tgt))
            out[n] = {
                "append_wall_head_ms": round(head_w * 1000, 2),
                "append_wall_tail_ms": round(tail_w * 1000, 2),
                "resolve_ckpt_ms": round(wall_cp * 1000, 1),
                "resolve_ckpt_reads": reads_cp,
                "resolve_full_ms": round(wall_full * 1000, 1),
                "resolve_full_reads": reads_full,
            }
            print(f"{n} commits: append head/tail "
                  f"{out[n]['append_wall_head_ms']}/{out[n]['append_wall_tail_ms']} ms, "
                  f"resolve ckpt {out[n]['resolve_ckpt_ms']} ms "
                  f"({reads_cp}), full {out[n]['resolve_full_ms']} ms "
                  f"({reads_full})", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"txnlog": out}))


def run_zorder() -> None:
    from pyspark.sql import functions as F

    from genie_spark.io.layout import write_zordered
    from genie_spark.io.txnlog import LogCommit, snapshot_files
    from genie_spark.session import get_spark

    spark = get_spark("stress_zorder")
    root = tempfile.mkdtemp(prefix="zorder_probe_")
    n = 1024  # 1024x1024 grid ≈ 1M rows
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b")
    )
    out = {}
    try:
        for files in (16, 64, 256):
            tbl = os.path.join(root, f"z{files}")
            t0 = time.time()
            write_zordered(grid, tbl, ["a", "b"], n_files=files, n_bits=10,
                           commit=LogCommit(orphan_grace_s=0.0))
            wall = time.time() - t0
            total = len(snapshot_files(tbl))
            # fixed ~1/16 selectivity on each dim
            lo, hi = 512, 512 + n // 16 - 1
            fa = len(snapshot_files(tbl, ranges={"a": (lo, hi)}))
            fb = len(snapshot_files(tbl, ranges={"b": (lo, hi)}))
            out[files] = {
                "write_s": round(wall, 1),
                "files": total,
                "touched_a": fa,
                "touched_b": fb,
                "frac_a": round(fa / total, 3),
                "frac_b": round(fb / total, 3),
            }
            print(f"{files} files: write {out[files]['write_s']}s, "
                  f"1/16 range touches a:{fa}/{total} b:{fb}/{total}",
                  flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"zorder": out}))


if __name__ == "__main__":
    if "--zorder" in sys.argv[1:]:
        run_zorder()
    else:
        sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [50, 500, 5000]
        run_txnlog(sizes)
