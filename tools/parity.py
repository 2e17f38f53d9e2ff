#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF dir, then replay oracle_sql.json in DuckDB over the same parquet
tables and compare values column-by-column (columns sorted by name).

Usage: python3 tools/parity.py [sfdir] [outdir] [--skip-verify] [names...]

Every run also times each DuckDB oracle query and writes the per-query
seconds to <outdir>/oracle_bench.json — the single-node baseline the Spark
bench is judged against. `--oracle-only` skips Verify AND the comparison:
it just replays oracle_sql.json (from a previous run's outdir) over the
given sfdir and writes the timings, so the oracle can be timed at sf0.1
without re-running the Spark side there.
"""
import sys, os, json, glob, subprocess, time
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])
    if "--skip-verify" not in sys.argv and "--oracle-only" not in sys.argv:
        names = " ".join(sorted(only))
        r = subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir} {names}'.rstrip()],
                           capture_output=True, text=True)
        errs = [l for l in r.stdout.splitlines() if "[verify]" in l or "[error]" in l]
        for l in errs: print(l)
        if r.returncode != 0:
            print("VERIFY FAILED rc=", r.returncode); print(r.stdout[-3000:]); sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))

    # --reps=N: time each oracle query N times and record the MIN — the same
    # stall-discarding policy graft.Bench applies to the Spark side, so the
    # committed anchor doesn't inherit one pass's host noise. Every timed
    # pass uses fetchall(); the comparison frame's fetchdf() is NOT timed
    # (pandas conversion is not query cost and would make reps=1 and
    # reps=N numbers incomparable).
    reps = next((int(a.split("=", 1)[1]) for a in sys.argv if a.startswith("--reps=")), 1)
    oracle_secs = {}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        try:
            for _ in range(reps):
                t0 = time.monotonic()
                con.execute(sql).fetchall()
                secs = round(time.monotonic() - t0, 3)
                oracle_secs[name] = min(oracle_secs.get(name, float("inf")), secs)
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_bad += 1; continue
        if "--oracle-only" in sys.argv:
            print(f"time {name} {oracle_secs[name]} s ({len(ddf)} rows)"); n_ok += 1
            continue
        spark_path = f"{outdir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        sdf = pq.read_table(spark_path).to_pandas()
        ok, msg = compare(sdf, ddf)
        if ok:
            print(f"ok   {name} ({len(sdf)} rows)"); n_ok += 1
        else:
            print(f"FAIL {name}: {msg}"); n_bad += 1
    # A names-filtered or partially-failing run must not clobber a complete
    # anchor file with a partial one whose total_sec looks authoritative.
    partial = bool(only) or n_bad > 0
    bench_path = f"{outdir}/oracle_bench{'.partial' if partial else ''}.json"
    with open(bench_path, "w") as f:
        json.dump({"engine": "duckdb", "sf": sfdir, "reps": reps, "policy": "min",
                   "total_sec": round(sum(oracle_secs.values()), 3),
                   "queries": oracle_secs}, f, indent=1, sort_keys=True)
    print(f"\n{n_ok} ok, {n_bad} fail; oracle timings -> {bench_path}")
    sys.exit(1 if n_bad else 0)

def compare(sdf, ddf):
    if sorted(sdf.columns) != sorted(ddf.columns):
        return False, f"columns differ: spark={sorted(sdf.columns)} duckdb={sorted(ddf.columns)}"
    if len(sdf) != len(ddf):
        return False, f"row count spark={len(sdf)} duckdb={len(ddf)}"
    cols = sorted(sdf.columns)
    sdf, ddf = sdf[cols], ddf[cols]
    for c in cols:
        a, b = sdf[c], ddf[c]
        # dtype check (loose: both-numeric same kind)
        if a.dtype != b.dtype and not (a.dtype.kind == b.dtype.kind):
            return False, f"col {c} dtype spark={a.dtype} duckdb={b.dtype}"
        av, bv = a.values, b.values
        if a.dtype.kind == 'f':
            eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
        elif a.dtype.kind == 'M':
            eq = (a.astype('datetime64[us]').values == b.astype('datetime64[us]').values)
        else:
            eq = np.array([x == y or (pd.isna(x) is True and pd.isna(y) is True)
                           for x, y in zip(a.tolist(), b.tolist())])
        if not eq.all():
            i = int(np.argmin(eq))
            return False, (f"col {c} first mismatch at row {i}: "
                           f"spark={a.iloc[i]!r} duckdb={b.iloc[i]!r} "
                           f"({int((~eq).sum())}/{len(eq)} rows differ)")
    return True, ""

if __name__ == "__main__":
    main()
