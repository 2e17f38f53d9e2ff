#!/usr/bin/env python3
"""One DuckDB anchor pass for graft.Bench: replay each oracle SQL once over
the SF dir's parquet tables and print ONE JSON line {name: seconds}.

graft.Bench invokes this after EVERY Spark pass and takes the element-wise
min across invocations, so the anchor samples share the Spark samples'
host-noise windows (same session, same stalls) and the emitted
spark_over_duckdb ratios stay interpretable on a loud host — unlike
cross-session absolute seconds, which on this host drift 30%+ on identical
code (README "totals drift with the HOST").

Timing policy matches tools/parity.py --reps: fetchall() per query, no
pandas conversion in the timed window.
"""
import sys, json, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sfdir, sqljson = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(sqljson))
    out = {}
    for name, sql in sorted(oracle.items()):
        try:
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            out[name] = round(time.monotonic() - t0, 3)
        except Exception as e:
            # a broken oracle entry surfaces in parity; the anchor just skips it
            print(f"[anchor] {name} failed: {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
