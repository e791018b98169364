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

INDEX-BACKED ASYMMETRY (ADVICE r8): the Spark side of s07/s09 reads a
PERSISTED PQ index (corpus codes + ADC tables, built untimed by the
bench's per-pass index warm-up — the artifact a FAISS deployment
maintains beside the corpus), while these DuckDB oracles compute the
same encode inline. The comparison basis differs for exactly those
queries, so they are tagged [index-backed] per-row and the total is
ALSO printed with them excluded — a reader sees both bases instead of
a silently mixed one.

Usage: python3 tools/paired_bench.py <verify_out_dir> <sf_dir> [reps] [only]
`only` is an optional comma-separated query-name filter (the SCALE.md
measured-trend runs use it to pair the heavy-15 subset at each sf).
Prints per-query seconds and a total, plus the skipped list.
"""
import json
import sys
import time

import duckdb

# Queries whose Spark runs read an index the bench warms untimed while
# the DuckDB oracle computes the equivalent inline (the PQ encode scan).
# s10's oracle is a fixture pin (skipped anyway); streaming twins are a
# *documented* asymmetry of a different class (machinery floor) and are
# reported via the bench JSON's streaming_sec split, not here.
INDEX_BACKED = {"s07_ann_pq_topk", "s09_ann_ivfpq_topk"}


def main(out_dir, sf_dir, reps=2, only=None):
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if only:
        keep = set(only.split(","))
        oracles = {k: v for k, v in oracles.items() if k in keep}
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
        tag = "  [index-backed on the Spark side]" if name in INDEX_BACKED else ""
        print(f"{name:36s} {best:8.3f} s{tag}")
    total = sum(timed.values())
    ib = sum(v for k, v in timed.items() if k in INDEX_BACKED)
    n_ib = sum(1 for k in timed if k in INDEX_BACKED)
    print(f"\nTOTAL (warm, best-of-{reps}): {total:.3f} s "
          f"over {len(timed)} SQL oracles; skipped {len(skipped)} "
          f"fixture pins: {','.join(skipped)}")
    print(f"TOTAL excluding {n_ib} index-backed queries "
          f"({','.join(sorted(INDEX_BACKED & set(timed)))}): "
          f"{total - ib:.3f} s — the like-for-like basis (Spark reads a "
          f"warmed PQ index there; these oracles encode inline)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:5] or []))
