#!/usr/bin/env python3
"""Compute the paired suite/batch ratios for a bench JSON vs a paired_bench log.

Usage: python3 tools/pair_ratio.py <bench.json> <paired.log>

Spark side: per-query times from the bench JSON (already best-of-passes),
restricted to the queries the paired_bench log actually ran (it skips the
fixture pins itself). Suite ratio = Spark sum / Duck suite total.
Batch ratio = both sides minus streaming twins (keys ending in 's') and the
two index-backed ANN queries (s07, s09) where Spark reads a warmed index.
"""
import json, re, sys

def main(bench_path, paired_path):
    bench = json.load(open(bench_path))
    q = bench["queries"]
    duck = {}
    duck_suite = None
    for line in open(paired_path):
        m = re.match(r"^(\w+?)_\S+\s+([\d.]+) s", line.strip())
        if m:
            duck[m.group(1)] = float(m.group(2))
        m = re.search(r"TOTAL \(warm, best-of-\d+\): ([\d.]+) s over (\d+) SQL oracles", line)
        if m:
            duck_suite = float(m.group(1)); n = int(m.group(2))
    assert duck_suite is not None and len(duck) == n, (duck_suite, len(duck))
    missing = [k for k in duck if k not in q]
    assert not missing, f"bench JSON lacks {missing}"
    spark_suite = sum(q[k] for k in duck)
    stream = {k for k in duck if k.endswith("s")}
    index = {"s07", "s09"} & set(duck)
    excl = stream | index
    spark_batch = sum(q[k] for k in duck if k not in excl)
    duck_batch = sum(v for k, v in duck.items() if k not in excl)
    print(f"n={len(duck)} (stream={len(stream)}, index={len(index)})")
    print(f"spark suite {spark_suite:.1f}  duck suite {duck_suite:.1f}  ratio {spark_suite/duck_suite:.2f}x")
    print(f"spark batch {spark_batch:.1f}  duck batch {duck_batch:.1f}  ratio {spark_batch/duck_batch:.2f}x")
    print(f"canary_sec {bench.get('canary_sec')}  pass_cpu {bench.get('pass_cpu_sec')}  pass_wall {bench.get('pass_wall_sec')}  total {bench.get('value')}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
