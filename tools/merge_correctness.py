#!/usr/bin/env python3
"""Merge split check.py artifacts into one CORRECTNESS-shaped JSON.

Big-tier DuckDB runs are dominated by one or two heavy oracles (d5's
banded self-join above all); splitting a gate into parallel check.py
processes (subset arg) halves the wall time, and this merges the
per-subset GRAFT_CHECK_JSON outputs back into the single artifact the
round protocol commits. Query sets must be disjoint; n_pass/n_fail are
recomputed from the union.

Provenance (round-13 ADVICE + verdict #4): every part must carry the
SAME sfdir and git_sha — parts from different tiers or different
commits would otherwise merge silently into a mixed artifact — and a
part check.py marked incomplete (its run was interrupted mid-gate) is
refused: a merged gate must only be built from finished checks.

Usage: python3 tools/merge_correctness.py OUT.json IN1.json IN2.json ...
"""
import json
import sys


def main():
    out, ins = sys.argv[1], sys.argv[2:]
    queries = {}
    prov = {}  # field -> (value, first file that set it)
    for p in ins:
        part = json.load(open(p))
        if part.get("complete") is False:
            raise SystemExit(
                f"{p} is marked incomplete (check.py was interrupted "
                "mid-run) — finish or rerun that split before merging")
        for field in ("sfdir", "git_sha", "git_dirty"):
            v = part.get(field)
            if field not in prov:
                prov[field] = (v, p)
            elif prov[field][0] != v:
                raise SystemExit(
                    f"parts disagree on {field}: {prov[field][1]} has "
                    f"{prov[field][0]!r}, {p} has {v!r} — refusing to "
                    "merge across tiers/commits")
        dup = set(part["queries"]) & set(queries)
        if dup:
            raise SystemExit(f"overlapping queries across inputs: {sorted(dup)[:5]}")
        queries.update(part["queries"])
    npass = sum(1 for v in queries.values() if v.get("status") == "pass")
    merged = {"sfdir": prov.get("sfdir", (None,))[0],
              "git_sha": prov.get("git_sha", (None,))[0],
              "git_dirty": prov.get("git_dirty", (None,))[0],
              "complete": True,
              "n_fail": len(queries) - npass, "n_pass": npass,
              "queries": dict(sorted(queries.items()))}
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"wrote {out}: {npass} pass, {len(queries) - npass} fail, "
          f"{len(queries)} queries from {len(ins)} parts")


if __name__ == "__main__":
    main()
