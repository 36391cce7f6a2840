"""Probe: BPE trainer wall vs |merges| (VERDICT r12 item 3).

Two rungs measured:

* **spark batched** — each pass collects top-``batch_k`` candidates
  and applies the longest provably-sequential-equivalent prefix as
  one fused replace + checkpoint.  Acceptance is tie-limited on count
  plateaus (measured mean batch ~2-3), so the distributed trainer
  stays roughly linear in |merges| — the probe records its exponent
  honestly rather than hiding it.
* **histogram (auto past 256 merges)** — ONE distributed word count,
  then the driver-side lazy-heap trainer over the collected
  histogram (the published learn_bpe / GPT-2 practice).  Wall is the
  corpus scan + O(touched-words) per merge — deeply sublinear in
  |merges| at Spark-job granularity.

Usage: python tools/probe_bpe_trainer.py [n_small n_big batch_k]
Prints one JSON line with both rungs' walls and scaling exponents
(1.0 = linear; < 1 = sublinear).
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time

sys.path.insert(0, ".")

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def corpus(n_docs: int = 400, words_per_doc: int = 24) -> list[str]:
    """Deterministic wide-alphabet corpus: 8-char words over 62
    symbols with Zipf-ish repetition (i % 61 word classes), so the
    pair space is rich enough to sustain 1k merges the way real
    unicode text is — a 16-char hex corpus exhausts productive
    disjoint pairs too early to exercise batching."""
    texts = []
    for i in range(n_docs):
        ws = []
        for j in range(words_per_doc):
            h = hashlib.md5(f"{i % 61}_{j}".encode()).digest()
            ws.append("".join(ALPHABET[b % 62] for b in h[:8]))
        texts.append(" ".join(ws))
    return texts


def exponent(walls: dict, merges: dict) -> float:
    return round(
        math.log(walls["big"] / walls["small"])
        / math.log(merges["big"] / merges["small"]),
        3,
    )


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    n_small, n_big, batch_k = (args + [100, 1000, 64])[:3]

    from genie_spark.session import get_spark
    from genie_spark.analytics.text import bpe_train

    spark = get_spark("probe_bpe_trainer")
    docs = spark.createDataFrame(
        list(enumerate(corpus())), ["doc_id", "text"]
    ).localCheckpoint(eager=True)

    # warmup (codegen/JIT) on a tiny run
    bpe_train(docs, n_merges=3, batch_k=batch_k).collect()

    out: dict = {"probe": "bpe_trainer", "batch_k": batch_k}
    for eng in ("histogram", "spark"):
        walls: dict[str, float] = {}
        got: dict[str, int] = {}
        for label, n in (("small", n_small), ("big", n_big)):
            if eng == "spark" and n > 250:
                # the distributed rung is the oracle path, not the
                # production-vocabulary path — cap its probe cost
                n = 250
            t0 = time.time()
            rows = bpe_train(
                docs, n_merges=n, batch_k=batch_k, engine=eng
            ).collect()
            walls[label] = round(time.time() - t0, 2)
            got[label] = len(rows)
        out[eng] = {
            "n_merges": got,
            "wall_sec": walls,
            "scaling_exponent": exponent(walls, got),
        }
    out["sublinear"] = out["histogram"]["scaling_exponent"] < 0.9
    print(json.dumps(out))


if __name__ == "__main__":
    main()
