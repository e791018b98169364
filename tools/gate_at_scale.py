#!/usr/bin/env python3
"""Run the full oracle gate against any sf directory, at any scale.

Usage: python3 tools/gate_at_scale.py <sf_dir> <verify_out> [skip1,skip2,...]

Orchestrates what SCALE.md's "Correctness holds at 100x" section reports:

1. `sbt runMain graft.Verify <sf_dir> <verify_out>` (skipped if the output
   dir already has a full dump — delete it to force a re-run);
2. splits the SQL oracles (fixture pins excluded) into the exact row-by-row
   gate (check_oracle.py) and the checksum gate (check_oracle_hash.py) by
   RESULT SIZE — past ~5M rows the exact gate's Python canon loop, not
   either engine, is the bottleneck;
3. runs both and prints a combined total.

The optional skip list is for oracles whose DuckDB side is infeasible at
the target scale (at sf10: d04_simhash_pairs,d05_embedding_neardup,
d13_semantic_dedup — the quadratic pair-enumeration twins; d04's aborted
at >35 min / >100 GB RSS while Spark ran it in 11 s).
"""
import glob
import json
import os
import subprocess
import sys

HASH_GATE_ROWS = 5_000_000


def result_rows(out_dir, name):
    import pyarrow.parquet as pq
    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in glob.glob(os.path.join(out_dir, name, "*.parquet")))


def main(sf_dir, out_dir, skip=()):
    manifest = os.path.join(out_dir, "oracle_sql.json")
    if not os.path.exists(manifest):
        print(f"[gate] running graft.Verify {sf_dir} -> {out_dir}")
        env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get(
            "SPARK_GRAFT_CPUS", "32"))
        subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
            check=True, env=env)
    oracle = json.load(open(manifest))
    sql_names = [k for k, v in sorted(oracle.items())
                 if "read_parquet" not in v]
    skipped = [n for n in sql_names if n in skip]
    gated = [n for n in sql_names if n not in skip]
    exact = [n for n in gated if result_rows(out_dir, n) <= HASH_GATE_ROWS]
    hashed = [n for n in gated if n not in set(exact)]
    print(f"[gate] {len(exact)} exact + {len(hashed)} checksum; "
          f"skipped (DuckDB-infeasible): {skipped or 'none'}")
    here = os.path.dirname(os.path.abspath(__file__))
    rc = 0
    if exact:
        rc |= subprocess.run(
            [sys.executable, os.path.join(here, "check_oracle.py"),
             out_dir, sf_dir, ",".join(exact)]).returncode
    if hashed:
        rc |= subprocess.run(
            [sys.executable, os.path.join(here, "check_oracle_hash.py"),
             out_dir, sf_dir, ",".join(hashed)]).returncode
    return rc


if __name__ == "__main__":
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    sys.exit(main(sys.argv[1], sys.argv[2], skip))
