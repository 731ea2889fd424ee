#!/usr/bin/env python3
"""Promote a check.py split artifact to a committed gate, recording any
ops whose oracle is LOCALLY INFEASIBLE as explicit entries instead of
leaving the subset implicit (round-13 verdict #7: "document which
oracle checks are locally infeasible instead of leaving subsets
implicit").

The stamped op gets status "infeasible_local" with the stated reason.
It is NOT counted in n_pass — the gate claims exactly what it checked,
plus an auditable record of what it could not and why.

Usage: stamp_infeasible.py IN.json OUT.json OP1 REASON1 [OP2 REASON2 …]
"""
import json
import sys


def main():
    inp, out = sys.argv[1], sys.argv[2]
    pairs = sys.argv[3:]
    if len(pairs) % 2:
        raise SystemExit("op/reason arguments must come in pairs")
    d = json.load(open(inp))
    if d.get("complete") is False:
        raise SystemExit(f"{inp} is marked incomplete — finish the check first")
    for op, reason in zip(pairs[::2], pairs[1::2]):
        if op in d["queries"]:
            raise SystemExit(f"{op} was actually checked in {inp}; refusing "
                             "to overwrite a real result with an infeasibility stamp")
        d["queries"][op] = {"status": "infeasible_local", "reason": reason}
    d["queries"] = dict(sorted(d["queries"].items()))
    with open(out, "w") as f:
        json.dump(d, f, indent=1, sort_keys=False)
        f.write("\n")
    st = [v["status"] for v in d["queries"].values()]
    print(f"wrote {out}: {st.count('pass')} pass, {st.count('fail') + st.count('err')} "
          f"fail/err, {st.count('infeasible_local')} infeasible_local")


if __name__ == "__main__":
    main()
