#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [only1,only2,...]

Loads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, and
compares: schema (column names), row count, and values (columns sorted by
name, floats rounded to 6 dp, row order as produced).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{round(v, 6):.6f}")
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    return out


def main(out_dir, sf_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    for name, sql in sorted(oracle.items()):
        err_sentinel = os.path.join(out_dir, f"{name}._error")
        if os.path.exists(err_sentinel):
            msg = open(err_sentinel).read().strip().splitlines()
            print(f"FAIL {name}: MISSING (build error) {msg[0] if msg else ''}")
            n_fail += 1
            continue
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"FAIL {name}: MISSING (no result written, no sentinel)")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols exp={sorted(exp_cols)} got={sorted(got_cols)}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        e = canon([[r[i] for i in eidx] for r in exp_rows])
        g = canon([[r[i] for i in gidx] for r in got_rows])
        if len(e) != len(g):
            print(f"FAIL {name}: rows exp={len(e)} got={len(g)}")
            n_fail += 1
        elif e != g:
            diff = next(i for i, (a, b) in enumerate(zip(e, g)) if a != b)
            print(f"FAIL {name}: first diff at row {diff}:\n  exp={e[diff]}\n  got={g[diff]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
