#!/usr/bin/env python3
"""Cross-run / cross-config determinism compare (r15 verdict task 2).

Reads two or more graft.Verify output dirs (each: parquet per query)
and checks every query's result is bit-identical across them: columns
sorted by name, rows sorted by all columns, sha256 over the csv
serialization — the same canonicalization the r15 same-config sweep
used, now over arbitrary configs (e.g. local[32]/32-shuffle-partitions
vs local[8]/8) so partition-order leaks that two same-config runs can
never expose become visible.

Usage:
  python3 tools/determinism.py OUT.json LABEL1=DIR1 LABEL2=DIR2 [...]
"""
import hashlib
import json
import sys

import duckdb


def query_hash(con, path):
    """Canonical sha256 of one query dump (columns sorted, rows sorted)."""
    cols = [r[0] for r in
            con.sql(f"DESCRIBE SELECT * FROM '{path}/*.parquet'").fetchall()]
    sel = ", ".join(f'"{c}"' for c in sorted(cols))
    rows = con.sql(
        f"SELECT {sel} FROM '{path}/*.parquet' ORDER BY ALL").fetchall()
    h = hashlib.sha256()
    for row in rows:
        h.update(repr(row).encode())
        h.update(b"\n")
    return h.hexdigest(), len(rows)


def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    out_path = sys.argv[1]
    runs = []
    for arg in sys.argv[2:]:
        label, d = arg.split("=", 1)
        runs.append((label, d))
    con = duckdb.connect()
    import os
    names = sorted(d for d in os.listdir(runs[0][1])
                   if os.path.isdir(os.path.join(runs[0][1], d))
                   and not d.startswith("_"))
    different = {}
    compared = 0
    for name in names:
        hashes = {}
        for label, d in runs:
            p = os.path.join(d, name)
            try:
                hashes[label] = query_hash(con, p)
            except Exception as e:
                hashes[label] = ("ERROR: " + str(e), -1)
        compared += 1
        if len(set(h for h, _ in hashes.values())) != 1:
            different[name] = {l: {"hash": h, "rows": n}
                               for l, (h, n) in hashes.items()}
            print(f"DIFF {name}: " + "; ".join(
                f"{l}={h[:12]}({n} rows)" for l, (h, n) in hashes.items()))
        else:
            print(f"OK   {name}")
    result = {
        "metric": "determinism",
        "sf": "/root/testdata/sf0.01",
        "configs": [l for l, _ in runs],
        "queries_compared": compared,
        "identical": compared - len(different),
        "different": different,
        "method": ("independent graft.Verify JVM runs per config; "
                   "per query: read each parquet dump, sort columns by "
                   "name and rows by all columns, sha256 the row "
                   "serialization"),
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(result) + "\n")
    print(f"\n{result['identical']}/{compared} identical across "
          f"{[l for l, _ in runs]} -> {out_path}")
    sys.exit(0 if not different else 1)


if __name__ == "__main__":
    main()
