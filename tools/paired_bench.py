#!/usr/bin/env python3
"""Paired DuckDB measurement for the graft bench (driver-side only).

Runs every SQL oracle from a `graft.Verify` output dir against the same
parquet tables the Spark bench reads, and times a WARM pass: each query
executes once untimed (so the OS page cache, DuckDB's catalog and its
optimizer caches are hot) before the timed pass — the same discipline
`graft.Bench` applies to the Spark side (ADVICE r7: the published ratio
must not compare a warm engine against a cold one). Fixture-pinned
queries (oracle = read_parquet of a fixtures/ file) are skipped: their
"oracle" is a file read, not comparable work.

Usage: python3 tools/paired_bench.py <verify_out_dir> <sf_dir> [reps]
Prints per-query seconds and a total, plus the skipped list.
"""
import json
import sys
import time

import duckdb


def main(out_dir, sf_dir, reps=2):
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    timed = {}
    skipped = []
    for name in sorted(oracles):
        sql = oracles[name]
        if "fixtures/" in sql:
            skipped.append(name)
            continue
        con.execute(sql).fetchall()  # warm pass, untimed
        best = None
        for _ in range(max(1, int(reps))):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timed[name] = best
        print(f"{name:36s} {best:8.3f} s")
    total = sum(timed.values())
    print(f"\nTOTAL (warm, best-of-{reps}): {total:.3f} s "
          f"over {len(timed)} SQL oracles; skipped {len(skipped)} "
          f"fixture pins: {','.join(skipped)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:] or []))
