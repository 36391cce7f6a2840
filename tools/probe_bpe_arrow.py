"""Probe: the Arrow BPE encoder's plan/compile cost must stay FLAT in
the merge-table size (the literal F.replace chain's depth grows with
|merges| — the round-9 Catalyst-depth defect class; the Arrow engine is
the documented escape for the parameter axis).

Runs bpe_encode(engine="arrow") on sf0.001 documents with synthetic
merge tables of 1k and 8k entries (the real 6-merge table repeated
under fresh symbol aliases so every merge is a distinct literal), and
reports per-size:
  * plan_s   — time to build + analyze the DataFrame (driver only)
  * exec_s   — time to execute (count() the encoded output)
Flat plan_s across 1k -> 8k is the pass criterion; exec_s grows at most
linearly in |merges| (one C-speed replace pass per merge over the
batch's distinct-word blob).

Usage: python tools/probe_bpe_arrow.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, ".")

from genie_spark.analytics.text import bpe_encode  # noqa: E402
from genie_spark.session import get_spark  # noqa: E402


def synthetic_merges(n: int) -> list[tuple[str, str]]:
    # distinct single-char-pair literals over a synthetic alphabet that
    # never appears in the corpus — plan shape is what's probed, the
    # replaces are all misses (the worst case for scan cost)
    out = []
    i = 0
    while len(out) < n:
        a = chr(0x4E00 + (i % 20000))          # CJK block: not in testdata
        b = chr(0x4E00 + ((i * 7 + 1) % 20000))
        out.append((a, b))
        i += 1
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("probe_bpe_arrow")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm the scan
    for n in (1_000, 8_000):
        merges = synthetic_merges(n)
        t0 = time.monotonic()
        df = bpe_encode(docs, merges, engine="arrow")
        df._jdf.queryExecution().executedPlan()  # force analysis+planning
        t1 = time.monotonic()
        rows = df.count()
        t2 = time.monotonic()
        print(
            f"merges={n:5d}  plan_s={t1 - t0:6.3f}  exec_s={t2 - t1:6.3f}"
            f"  rows={rows}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
