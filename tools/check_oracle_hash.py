#!/usr/bin/env python3
"""Checksum variant of check_oracle.py for giant-output queries.

Usage: python3 tools/check_oracle_hash.py <verify_out_dir> <sf_dir> only1,only2,...

The exact gate (check_oracle.py) canonicalizes every row in Python, which is
the right fidelity for the driver's sf0.01 gate but takes O(minutes) and
O(10 GB) per query once outputs reach tens of millions of rows (q03/q04/q08
dump 60M rows at the 100x corpus). This variant pushes the comparison into
DuckDB: per query it checks row count plus an order-insensitive
sum-of-row-hash over all columns (floats rounded to 6 dp first, matching the
exact gate's canonicalization). Row ORDER is deliberately not checked here —
the exact gate already pins ordering at sf0.01/sf0.1/sf1; this gate exists
to extend the VALUE check to corpus sizes where the Python loop is the
bottleneck, not the engines.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(out_dir, sf_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in only:
        sql = oracle.get(name)
        if sql is None:
            print(f"FAIL {name}: no oracle SQL")
            n_fail += 1
            continue
        res_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            cols = [(d[0], d[1]) for d in con.execute(
                f"SELECT * FROM ({sql}) LIMIT 0").description]
            # float columns round to 6 dp, mirroring check_oracle.canon
            exprs = ", ".join(
                f'round("{c}", 6) AS "{c}"' if t in ("FLOAT", "DOUBLE")
                else f'"{c}"' for c, t in cols)
            collist = ", ".join(f'"{c}"' for c, _ in cols)
            probe = f"""
              WITH s AS (SELECT {exprs} FROM (
                     SELECT {collist} FROM read_parquet('{res_glob}'))),
                   o AS (SELECT {exprs} FROM ({sql}))
              SELECT (SELECT count(*) FROM s) AS s_n,
                     (SELECT count(*) FROM o) AS o_n,
                     (SELECT sum(hash({collist})) FROM s) AS s_h,
                     (SELECT sum(hash({collist})) FROM o) AS o_h"""
            s_n, o_n, s_h, o_h = con.execute(probe).fetchone()
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if s_n != o_n:
            print(f"FAIL {name}: rows exp={o_n} got={s_n}")
            n_fail += 1
        elif s_h != o_h:
            print(f"FAIL {name}: checksum mismatch over {s_n} rows")
            n_fail += 1
        else:
            print(f"PASS {name} ({s_n} rows, checksum)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_pass + n_fail} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3].split(",")))
