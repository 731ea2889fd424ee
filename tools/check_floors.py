#!/usr/bin/env python3
"""Band-quality floor gate over BAND_RECALL.json (round-13 item 4).

The r12 plane-bank defect (mod-2^31 LCG cross-plane correlation) showed
that band-quality regressions arrive SILENTLY: every replay gate stays
green because the oracle replays the same planes, so only the
banded-vs-exact measurement sees the loss. BandedBucketSpec pins floors
on a synthetic cluster corpus; this gate pins them on the REAL tiers the
artifact was measured on, and fails the round protocol if the shipped
width ever drops below them:

  - s10 edge recall >= 0.99 at EVERY measured tier
  - d5 pair recall  >= 0.99 at EVERY measured tier
  - d5 spurious pairs == 0 everywhere (a spurious pair is a correctness
    bug, not a quality trade)
  - d5 connected-component mismatches == 0 at the LARGEST measured tier
    (what downstream d7 grouping consumes; small-tier label flips on
    <= a handful of vertices are the priced band cost)

Provenance: when the artifact carries a git_sha (BandRecall stamps it),
the gate refuses an artifact generated on a different commit than HEAD
— a stale artifact passing its floors says nothing about the shipped
plan (round-13 verdict #4). Legacy artifacts without the field are
accepted with a warning.

Usage: python3 tools/check_floors.py [BAND_RECALL.json] [shipped_width]
Exit 0 = all floors hold; exit 1 with one line per violation.
Malformed tier entries (missing s10/d5/recall keys) are reported as
floor failures, not tracebacks (round-13 ADVICE).
"""
import json
import re
import subprocess
import sys


def tier_num(name):
    m = re.search(r"tier(\d+)", name)
    return int(m.group(1)) if m else -1


def head_sha():
    try:
        return subprocess.run(["git", "rev-parse", "HEAD"],
                              capture_output=True, text=True,
                              timeout=10).stdout.strip()
    except Exception:
        return None


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BAND_RECALL.json"
    width = sys.argv[2] if len(sys.argv) > 2 else "512"
    data = json.load(open(path))
    sha = data.get("git_sha")
    if sha:
        head = head_sha()
        if head and sha != head:
            print(f"FLOORS FAIL: {path} was generated on commit "
                  f"{sha[:12]} but HEAD is {head[:12]} — regenerate the "
                  "artifact on the shipped plan")
            return 1
    else:
        print(f"[floors] WARNING: {path} carries no git_sha "
              "(legacy artifact; provenance unverified)")
    tiers = {k: v for k, v in data.items() if isinstance(v, dict) and width in v}
    if not tiers:
        print(f"FLOORS FAIL: no tier in {path} carries width {width}")
        return 1
    largest = max(tiers, key=tier_num)
    fails = []
    for t, v in sorted(tiers.items(), key=lambda kv: tier_num(kv[0])):
        w = v[width]
        s10, d5 = w.get("s10"), w.get("d5")
        # malformed entries are floor FAILURES with a clean line, not
        # a KeyError traceback the regen script would surface as an
        # unexplained exit (round-13 ADVICE)
        missing = [k for k, d in (("s10", s10), ("d5", d5)) if not isinstance(d, dict)]
        missing += [f"{fam}.{k}"
                    for fam, d, ks in (("s10", s10, ("recall",)),
                                       ("d5", d5, ("recall", "spurious",
                                                   "component_mismatches")))
                    if isinstance(d, dict) for k in ks if k not in d]
        if missing:
            fails.append(f"{t}: malformed entry, missing {missing}")
            continue
        if s10["recall"] < 0.99:
            fails.append(f"{t}: s10 recall {s10['recall']} < 0.99")
        if d5["recall"] < 0.99:
            fails.append(f"{t}: d5 recall {d5['recall']} < 0.99")
        if d5["spurious"] != 0:
            fails.append(f"{t}: d5 spurious pairs {d5['spurious']} != 0")
        if t == largest and d5["component_mismatches"] != 0:
            fails.append(f"{t} (largest): d5 component mismatches "
                         f"{d5['component_mismatches']} != 0")
        print(f"[floors] {t} w={width}: s10 recall {s10['recall']}, "
              f"d5 recall {d5['recall']}, spurious {d5['spurious']}, "
              f"components {d5['component_mismatches']}"
              f"{' (largest: must be 0)' if t == largest else ''}")
    if fails:
        for f in fails:
            print("FLOORS FAIL:", f)
        return 1
    print(f"FLOORS PASS: {len(tiers)} tiers at width {width}, "
          f"largest {largest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
