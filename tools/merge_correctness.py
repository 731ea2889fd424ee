#!/usr/bin/env python3
"""Merge split check.py artifacts into one CORRECTNESS-shaped JSON.

Big-tier DuckDB runs are dominated by one or two heavy oracles (d5's
banded self-join above all); splitting a gate into parallel check.py
processes (subset arg) halves the wall time, and this merges the
per-subset GRAFT_CHECK_JSON outputs back into the single artifact the
round protocol commits. Query sets must be disjoint; n_pass/n_fail are
recomputed from the union.

Usage: python3 tools/merge_correctness.py OUT.json IN1.json IN2.json ...
"""
import json
import sys


def main():
    out, ins = sys.argv[1], sys.argv[2:]
    queries = {}
    for p in ins:
        part = json.load(open(p))["queries"]
        dup = set(part) & set(queries)
        if dup:
            raise SystemExit(f"overlapping queries across inputs: {sorted(dup)[:5]}")
        queries.update(part)
    npass = sum(1 for v in queries.values() if v.get("status") == "pass")
    merged = {"n_fail": len(queries) - npass, "n_pass": npass,
              "queries": dict(sorted(queries.items()))}
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"wrote {out}: {npass} pass, {len(queries) - npass} fail, "
          f"{len(queries)} queries from {len(ins)} parts")


if __name__ == "__main__":
    main()
