#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfdir> <outdir>"`:
loads each <outdir>/<name> parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over the raw tables, and compares
schema + rows exactly (column order normalized by sorting names,
which is what the driver does before hashing).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    con = duckdb.connect()
    df = con.execute(
        "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
    ).df()
    con.close()
    return df


def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def compare(name, sdf, odf, notes=None):
    issues = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    s, o = norm(sdf), norm(odf)
    if len(s) != len(o):
        issues.append(f"row count: spark={len(s)} oracle={len(o)}")
        return issues
    for c in s.columns:
        sv, ov = s[c], o[c]
        if str(sv.dtype) != str(ov.dtype):
            issues.append(f"dtype[{c}]: spark={sv.dtype} oracle={ov.dtype}")
        try:
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                # STRICT bitwise equality, no ulp tolerance. The one
                # historical concession (DuckDB's DECIMAL->DOUBLE cast
                # double-rounds, 1 ulp off on ~25% of wide decimals) was
                # retired in round 11 by fixing the ORACLE: Det.sqlD2d
                # routes every decimal->double through VARCHAR, a single
                # correctly-rounded parse matching Spark's
                # BigDecimal.doubleValue exactly.
                a = np.asarray(sv.values, dtype=np.float64)
                b = np.asarray(ov.values, dtype=np.float64)
                eq = (a == b) | (pd.isna(a) & pd.isna(b))
            else:
                eq = (sv.astype(str).values == ov.astype(str).values)
            bad = np.where(~eq)[0]
            if len(bad):
                i = bad[0]
                issues.append(
                    f"values[{c}]: {len(bad)}/{len(s)} mismatch; first@row{i}: "
                    f"spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}")
        except Exception as e:
            issues.append(f"compare[{c}] failed: {e}")
    if issues and not any(i.startswith(("dtype", "compare")) for i in issues):
        # The positional compare assumes every oracle's ORDER BY is a
        # TOTAL order (preserve_insertion_order=false makes any other
        # order nondeterministic). If the same multiset of rows passes
        # after sorting both frames on all columns, the failure is
        # row-order-only — still a FAIL (the driver compares
        # positionally too), but flagged so a non-total ORDER BY can't
        # masquerade as a value mismatch.
        try:
            ss = s.astype(str).sort_values(list(s.columns)).reset_index(drop=True)
            oo = o.astype(str).sort_values(list(o.columns)).reset_index(drop=True)
            if ss.equals(oo):
                issues.append(
                    "ROW-ORDER-ONLY mismatch: identical row multisets — "
                    "the oracle's ORDER BY is not a total order; fix the "
                    "query's ordering key")
        except Exception:
            pass
    return issues


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    # optional: write a CORRECTNESS-shaped per-query JSON artifact
    json_out = os.environ.get("GRAFT_CHECK_JSON")
    results = {}
    con = duckdb.connect()
    # An in-memory DuckDB has NO temp_directory, so blocking operators
    # (distinct/join/sort) OOM instead of spilling once the candidate
    # volume of a brute oracle outgrows RAM (first hit: d5's T=29
    # self-join at the 40x tier). Give it a spill dir + a bounded
    # memory budget so tier-scale oracles go out-of-core like any
    # real engine would.
    con.execute("SET temp_directory='/tmp/duckdb_check_spill'")
    # default memory budget derived from what the host actually has
    # free (capped at 48GB — the verified-good tier-run budget) rather
    # than assuming a large machine; override with GRAFT_CHECK_MEM
    def default_mem():
        try:
            with open("/proc/meminfo") as f:
                kb = {l.split(":")[0]: int(l.split()[1]) for l in f}
            return "%dGB" % max(4, min(48, int(kb["MemAvailable"] * 0.8 / 1048576)))
        except Exception:
            return "16GB"
    con.execute("SET memory_limit='%s'"
                % os.environ.get("GRAFT_CHECK_MEM", default_mem()))
    # insertion-order preservation buffers entire join outputs in order
    # (226M rows x 1KB at d5/tier40 -> OOM at any memory_limit); every
    # oracle ends in an explicit ORDER BY, so result order never depends
    # on this setting
    con.execute("SET preserve_insertion_order=false")
    # 32 threads each carrying their own join/aggregate scratch can
    # exhaust the SYSTEM allocator (malloc "bad allocation", below any
    # memory_limit) on the big self-join oracles; tier-scale invocations
    # bound the worker count (the verified-good d5/tier40 run used 16)
    threads = os.environ.get("GRAFT_CHECK_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (e.g. a MakeTier scale corpus): a
            # directory of part files, globbed for DuckDB
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    # provenance stamp written by graft.Verify next to the dumps: the
    # artifact names the commit/sfdir the SPARK side ran against, so a
    # gate built from stale dumps self-identifies (round-13 verdict #4)
    meta = {}
    meta_p = os.path.join(outdir, "_meta.json")
    if os.path.exists(meta_p):
        try:
            meta = json.load(open(meta_p))
        except Exception as e:
            meta = {"meta_error": str(e)}
    npass = nfail = 0
    import time

    def dump_json(complete):
        # incremental: rewritten after EVERY query (round 13 lost a
        # 86-passes-deep tier gate because the artifact was only written
        # at completion and the round ended first). complete=False marks
        # a partial artifact so it can never be mistaken for the gate.
        if not json_out:
            return
        tmp = json_out + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"sfdir": sfdir, "complete": bool(complete),
                       "git_sha": meta.get("git_sha"),
                       "git_dirty": meta.get("git_dirty"),
                       "n_pass": int(npass), "n_fail": int(nfail),
                       "queries": results},
                      f, indent=1, sort_keys=True)
        os.replace(tmp, json_out)

    for name in sorted(oracle):
        if only and name not in only:
            continue
        t_q = time.time()
        sdf = load_spark(outdir, name)
        if sdf is None:
            print(f"FAIL {name}: no spark output")
            results[name] = {"status": "err", "issues": ["no spark output"]}
            nfail += 1
            dump_json(False)
            continue
        try:
            odf = con.execute(oracle[name]).df()
            t_q = time.time() - t_q
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            results[name] = {"status": "err",
                             "issues": [f"oracle sql error: {e}"]}
            nfail += 1
            dump_json(False)
            continue
        notes = []
        issues = compare(name, sdf, odf, notes)
        if issues:
            print(f"FAIL {name}:")
            for i in issues:
                print(f"   {i}")
            results[name] = {"status": "fail", "rows": len(sdf),
                             "issues": issues}
            nfail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows, {t_q:.1f}s)", flush=True)
            results[name] = {"status": "pass", "rows": len(sdf),
                             "oracle_sec": round(t_q, 1)}
            if notes:
                results[name]["notes"] = notes
            npass += 1
        dump_json(False)
    # queries with no oracle → rows-only check
    outs = {os.path.basename(p) for p in glob.glob(os.path.join(outdir, "*"))
            if os.path.isdir(p)}
    for name in sorted(outs - set(oracle)):
        sdf = load_spark(outdir, name)
        ok = sdf is not None and len(sdf) > 0
        print(f"{'PASS' if ok else 'FAIL'} {name} (rows-only: {0 if sdf is None else len(sdf)} rows)")
        npass += ok
        nfail += not ok
    print(f"== {npass} pass, {nfail} fail")
    dump_json(True)
    if json_out:
        print(f"wrote {json_out}")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
