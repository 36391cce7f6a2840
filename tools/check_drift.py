"""Testdata drift detector — run FIRST, every round.

The driver regenerates /root/testdata between rounds and has already
changed physical types twice (round 1: events.ts TIMESTAMP(NANOS);
round 3: plain timestamp[us]), each time silently breaking queries
that assumed the old type.  This tool compares the observed parquet
schemas against the committed snapshot and exits nonzero on any
difference, so drift is caught on turn 1 instead of at the
correctness gate.

    python tools/check_drift.py            # compare all SFs
    python tools/check_drift.py --update   # re-snapshot (after adapting code)

The snapshot lives at tools/testdata_schema.json.  On drift: fix the
reading code to branch on the observed dtype (see
genie_spark.workload._events for the pattern), re-run
tools/verify_oracle.py, THEN --update.
"""

from __future__ import annotations

import glob
import json
import os
import sys

SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "testdata_schema.json")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def observe() -> dict:
    import pyarrow.parquet as pq

    out: dict = {}
    for sf_dir in sorted(glob.glob(os.path.join(TESTDATA, "sf*"))):
        sf = os.path.basename(sf_dir)
        for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            table = os.path.basename(p)[: -len(".parquet")]
            schema = pq.read_schema(p)
            meta = pq.ParquetFile(p).metadata
            out.setdefault(sf, {})[table] = {
                "columns": {f.name: str(f.type) for f in schema},
                "num_rows": meta.num_rows,
            }
    return out


def main() -> int:
    observed = observe()
    if "--update" in sys.argv:
        with open(SNAPSHOT, "w") as f:
            json.dump(observed, f, indent=1, sort_keys=True)
        print(f"snapshot written: {SNAPSHOT}")
        return 0

    if not os.path.isfile(SNAPSHOT):
        print(f"no snapshot at {SNAPSHOT}; run with --update first")
        return 2

    with open(SNAPSHOT) as f:
        expected = json.load(f)

    drift: list[str] = []
    for sf, tables in sorted(expected.items()):
        obs_tables = observed.get(sf, {})
        for table, exp in sorted(tables.items()):
            obs = obs_tables.get(table)
            if obs is None:
                drift.append(f"{sf}/{table}: MISSING")
                continue
            for col, typ in exp["columns"].items():
                got = obs["columns"].get(col)
                if got is None:
                    drift.append(f"{sf}/{table}.{col}: column REMOVED")
                elif got != typ:
                    drift.append(f"{sf}/{table}.{col}: {typ} -> {got}")
            for col in obs["columns"]:
                if col not in exp["columns"]:
                    drift.append(f"{sf}/{table}.{col}: column ADDED "
                                 f"({obs['columns'][col]})")
            if obs["num_rows"] != exp["num_rows"]:
                drift.append(
                    f"{sf}/{table}: rows {exp['num_rows']} -> {obs['num_rows']}"
                )
        for table in observed.get(sf, {}):
            if table not in tables:
                drift.append(f"{sf}/{table}: table ADDED")

    if drift:
        print("TESTDATA DRIFT DETECTED — fix readers, re-run the oracle "
              "gate, then --update:")
        for d in drift:
            print(f"  {d}")
        return 1
    print("no drift: testdata matches the committed snapshot")
    return 0


if __name__ == "__main__":
    sys.exit(main())
