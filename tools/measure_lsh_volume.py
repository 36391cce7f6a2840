"""Candidate-volume audit for banded sign-LSH sizing.

For each corpus size given, builds the stress near-dup corpus
(tools/stress_scale.synth_embeddings_dups), sizes the per-table plane
counts BOTH ways — open-loop (banded_plane_counts) and closed-loop
(measured_plane_counts) — and counts the realized distinct candidate
pairs from lsh_banded_pairs, reporting each as a ratio of the linear
b·n·B/2 target (the BASELINE.md convention).  The closed-loop row is
the VERDICT r7 item-1 acceptance check: ratio ≤ 1.5 at every probed n.

Usage: python tools/measure_lsh_volume.py [n ...]   (default 100000 1000000)
       python tools/measure_lsh_volume.py --skip-open 3000000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_open = "--skip-open" in sys.argv[1:]
    sizes = [int(a) for a in args] or [100_000, 1_000_000]

    from genie_spark.analytics.similarity import (
        banded_plane_counts,
        lsh_banded_pairs,
        measured_plane_counts,
    )
    from genie_spark.session import get_spark
    from tools.stress_scale import synth_embeddings_dups

    spark = get_spark("measure_lsh_volume")
    B, b = 16, 4
    for n in sizes:
        e = synth_embeddings_dups(spark, n).repartition(32).cache()
        e.count()
        target = b * n * B / 2.0
        report: dict = {"n": n, "target": int(target)}
        modes = [("closed", lambda: measured_plane_counts(e, n_rows=n, n_tables=b, target_occupancy=B))]
        if not skip_open:
            modes.append(("open", lambda: banded_plane_counts(n, n_tables=b, target_occupancy=B)))
        for mode, size_fn in modes:
            t0 = time.monotonic()
            counts = size_fn()
            sizing_s = round(time.monotonic() - t0, 1)
            t0 = time.monotonic()
            n_cand = lsh_banded_pairs(e, n_planes=counts, n_tables=b).count()
            report[mode] = {
                "counts": counts,
                "sizing_s": sizing_s,
                "n_cand": n_cand,
                "ratio": round(n_cand / target, 2),
                "pairs_s": round(time.monotonic() - t0, 1),
            }
        print(json.dumps(report), flush=True)
        e.unpersist()


if __name__ == "__main__":
    main()
