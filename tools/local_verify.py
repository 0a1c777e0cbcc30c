#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Reads graft.Verify output (parquet per query + oracle_sql.json), runs
each oracle in DuckDB over the same source parquet tables, and compares:
columns sorted by name, rows sorted by all columns, exact value match.

Usage: python3 tools/local_verify.py [sfDir] [verifyOut]
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rows-only queries (no oracle): flag empty/missing output
    for d in sorted(os.listdir(out)):
        full = os.path.join(out, d)
        # _errors/ holds per-query stack traces, not a query output
        if not os.path.isdir(full) or d in oracle or d.startswith("_"):
            continue
        try:
            cols = [r[0] for r in con.sql(
                f"DESCRIBE SELECT * FROM '{full}/*.parquet'").fetchall()]
            n = con.sql(f"SELECT count(*) FROM '{full}/*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"FAIL {d} (rows-only): unreadable {e}"); n_fail += 1; continue
        if "_graft_error" in cols:
            print(f"FAIL {d} (rows-only): Verify error marker "
                  f"(see {out}/_errors/{d}.txt)"); n_fail += 1
        elif n == 0:
            print(f"FAIL {d} (rows-only): 0 rows"); n_fail += 1
        else:
            print(f"PASS {d} (rows-only, {n} rows)"); n_pass += 1
    for name, sql in sorted(oracle.items()):
        pq = f"{out}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: query error {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: cols spark={gc} oracle={ec}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}"); n_fail += 1; continue
        # dtype parity: the driver hashes values, so int64 vs float64
        # (e.g. DuckDB SUM(BIGINT)→HUGEINT→float64) fails even when == passes
        dt = [c for c in gc if str(got[c].dtype) != str(exp[c].dtype)]
        if dt:
            c = dt[0]
            print(f"FAIL {name}: dtype {c} spark={got[c].dtype} "
                  f"oracle={exp[c].dtype}"); n_fail += 1; continue
        # duckdb-level base-type parity: a column carrying NULLs lands as
        # float64/object in pandas on BOTH sides, masking e.g. BIGINT vs
        # HUGEINT (r12: the txn gates' un-cast fingerprint subquery made
        # the oracle's unioned fp column HUGEINT — pandas-equal, but a
        # type-tagged driver hash fails). Compare DESCRIBE base types
        # (precision stripped: DECIMAL(18,2) vs DECIMAL(38,2) is fine —
        # pandas dtype above already guards the value representation).
        # DATE vs TIMESTAMP is driver-proven benign (six date_trunc
        # queries have passed the driver hash since r1 with exactly this
        # split — both land as datetime64 wherever the driver compares);
        # numeric base-type splits are NOT known benign, keep them hard.
        EQUIV = {"DATE": "DATETIME", "TIMESTAMP": "DATETIME",
                 "TIMESTAMP_NS": "DATETIME", "TIMESTAMP WITH TIME ZONE":
                 "DATETIME"}
        def base_types(rel_sql):
            return {r[0]: EQUIV.get(r[1].split("(")[0], r[1].split("(")[0])
                    for r in con.sql(f"DESCRIBE {rel_sql}").fetchall()}
        bt_g = base_types(f"SELECT * FROM '{pq}/*.parquet'")
        bt_e = base_types(sql)
        bd = [c for c in gc if bt_g[c] != bt_e[c]]
        if bd:
            c = bd[0]
            print(f"FAIL {name}: duckdb type {c} spark={bt_g[c]} "
                  f"oracle={bt_e[c]}"); n_fail += 1; continue
        g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        e = exp[ec].sort_values(by=ec, kind="mergesort").reset_index(drop=True)
        bad = []
        for c in gc:
            gv, ev = g[c], e[c]
            try:
                eq = (gv == ev) | (gv.isna() & ev.isna())
            except Exception:
                eq = gv.astype(str) == ev.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append(f"{c}[row{i}]: spark={gv[i]!r} oracle={ev[i]!r}")
        if bad:
            print(f"FAIL {name}: {len(bad)} col diffs; first: {bad[0]}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
