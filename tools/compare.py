#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query result
parquet dumped by graft.Verify, run the oracle SQL in DuckDB over the same
tables and compare values exactly (columns sorted by name; rows compared
in emitted order only — every catalog query ends in a fully deterministic
ORDER BY, and pd.read_parquet concatenates part files in sorted filename
order, which matches Spark's partition write order for our single-job
coalesced outputs).

Usage: compare.py <verify_out_dir> <sf_dir>
"""
import duckdb, json, sys, glob, os
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        path = f"{out}/{name}"
        if not os.path.isdir(path):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            a = pd.read_parquet(path)
            b = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        a = a[sorted(a.columns)].reset_index(drop=True)
        b = b[sorted(b.columns)].reset_index(drop=True)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        problems = []
        for c in a.columns:
            av, bv = a[c], b[c]
            # normalize timestamps to ns
            if str(av.dtype).startswith("datetime"): av = av.astype("datetime64[us]")
            if str(bv.dtype).startswith("datetime"): bv = bv.astype("datetime64[us]")
            try:
                ordered_eq = (av.isna() & bv.isna()) | (av == bv)
                if not ordered_eq.all():
                    idx = (~ordered_eq).idxmax()
                    problems.append(
                        f"col {c} (dtype {a[c].dtype}/{b[c].dtype}) first diff row {idx}: "
                        f"{av[idx]!r} vs {bv[idx]!r}")
            except Exception as e:
                problems.append(f"col {c}: compare error {e}")
        # dtype check (schema fidelity); datetime unit (ns/us) and
        # date-as-object differences are pandas conversion artifacts, not
        # schema differences — values above are still compared exactly.
        def kind(dt):
            s = str(dt)
            return "datetime" if s.startswith("datetime") or s == "object" else s
        for c in a.columns:
            if kind(a[c].dtype) != kind(b[c].dtype):
                problems.append(f"dtype-mismatch col {c}: {a[c].dtype} vs {b[c].dtype}")
        if problems:
            print(f"FAIL {name}:")
            for p in problems[:5]:
                print(f"   {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
