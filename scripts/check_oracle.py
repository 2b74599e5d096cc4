#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare with the engine's dumped
parquet (graft.Verify output). Driver-side tooling only — the shipped
library never imports this.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(f"{v!r}")
            elif hasattr(v, "tolist"):  # numpy arrays / lists
                row.append(str(list(v)))
            else:
                row.append(str(v))
        rows.append("|".join(row))
    return sorted(rows), list(df.columns), [str(t) for t in df.dtypes]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            wr, wc, wt = canon(want)
            gr, gc, gt = canon(got)
            if wc != gc:
                print(f"FAIL {name}: columns {gc} vs oracle {wc}")
                n_fail += 1
            elif wr != gr:
                diff = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
                print(f"FAIL {name}: rows {len(gr)} vs {len(wr)}; "
                      f"first diffs: {diff}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
