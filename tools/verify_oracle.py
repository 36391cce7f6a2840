"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB at the given scale factor, then compares
row count, column names, and an order-insensitive value comparison
(sorted rows, stringified values).  Usage:

    python tools/verify_oracle.py [sf_dir] [query ...]
    python tools/verify_oracle.py [sf_dir] --window   # first 50 only,
                                  # exactly what the round driver runs
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def normalize(rows, columns):
    """Sort columns by name, stringify values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v!r}"
            vals.append(str(v) if v is not None else "\x00")
        out.append("\x01".join(vals))
    out.sort()
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--window"]
    window = "--window" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb

    import __spark_entry__ as e
    from genie_spark.session import get_spark, TESTDATA_TABLES

    spark = get_spark("verify_oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    if window:
        # the driver's correctness gate runs the FIRST 50 entries —
        # simulate exactly that membership (intersected with explicit
        # names, if any were also given)
        first50 = set(list(qs)[:50])
        only = (only & first50) if only else first50
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(srows)} rows {time.time()-t0:.1f}s")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = ddf.columns
            drows = ddf.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            continue
        status = []
        if len(srows) != len(drows):
            status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(c for c in dcols):
            status.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if not status:
            sn, dn = normalize(srows, scols), normalize(drows, dcols)
            if sn != dn:
                diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                status.append(f"values differ, first diffs: {diffs}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok {name}: {len(srows)} rows {time.time()-t0:.1f}s")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
