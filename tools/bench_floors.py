#!/usr/bin/env python3
"""Regenerate BenchGuard's committed clean-floor maps from the
committed clean bench records. Run after committing a new clean record
(or after a query's implementation legitimately changes) and paste the
output into src/main/scala/graft/BenchGuard.scala.

Usage: python3 tools/bench_floors.py BASELINE_bench_r12_clean.json BASELINE_bench_r13_final.json ...
"""
import json
import sys


def main(paths):
    recs = [json.load(open(p)) for p in paths]
    sf01, sf1 = {}, {}
    for r in recs:
        for k, v in (r.get("queries") or {}).items():
            sf01[k] = min(v, sf01.get(k, v))
        sf1_tier = r.get("sf1") or {}
        for k, v in (sf1_tier.get("queries") or {}).items():
            sf1[k] = min(v, sf1.get(k, v))
    for name, m in [("cleanFloorSf01", sf01), ("cleanFloorSf1", sf1)]:
        print(f"  val {name}: Map[String, Double] = Map(")
        print(",\n".join(f'    "{k}" -> {v}' for k, v in sorted(m.items())) + ")")


if __name__ == "__main__":
    main(sys.argv[1:] or
         ["BASELINE_bench_r12_clean.json", "BASELINE_bench_r13_final.json"])
