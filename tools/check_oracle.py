#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet under OUTDIR, run the paired oracle SQL in DuckDB against the sf
tables and hash-compare values with columns sorted by name.

Usage: python3 tools/check_oracle.py OUTDIR SFDIR [skip|only q1,q2,...]

Per-query progress prints as it goes (flushed — long DuckDB queries are
visible, not silent). `skip`/`only` subset the run: the sf1 ratchet's
slow oracle replays (recursive-CTE d7/d8, unrolled-kmeans s5) can be
deferred to a second pass without losing the fast 95%.
"""
import glob
import json, sys, hashlib, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def frame_hash(df):
    # astype(str), NOT per-value str(): pandas renders all-midnight
    # datetime64 columns date-only under astype(str) ('2026-01-15'), which
    # matches pyarrow's datetime.date on the Spark side — the driver's
    # round-1 verdict (DATE outputs hash-matched, DECIMAL outputs didn't)
    # is only consistent with this rendering.
    df = df[sorted(df.columns)].astype(str)
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()

def main(outdir, sfdir, mode=None, names=""):
    if mode not in (None, "skip", "only"):
        sys.exit(f"unknown mode {mode!r}: expected 'skip' or 'only'")
    sel = set(names.split(",")) if names else set()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    items = sorted(oracle.items())
    if mode is not None:
        # a stale/misspelled name in the selection would silently shrink
        # the run — in 'only' mode all the way to a 0-query false green
        unknown = sel - set(oracle)
        if unknown:
            sys.exit(f"{mode} selection names absent from oracle_sql.json: "
                     f"{sorted(unknown)}")
        if mode == "skip":
            items = [(k, v) for k, v in items if k not in sel]
        else:
            items = [(k, v) for k, v in items if k in sel]
        if not items:
            sys.exit(f"mode {mode!r} selected zero queries — refusing to "
                     "report an empty pass")
    ok = bad = 0
    for name, sql in items:
        t0 = time.time()
        try:
            # Spark side MUST go through pyarrow/pandas like the driver does —
            # routing it through DuckDB masked decimal-rendering mismatches in
            # round 1 (DuckDB reads parquet DECIMAL and converts like its own
            # results; pyarrow keeps Decimal objects whose str() keeps scale).
            parts = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
            got = pd.concat([pd.read_parquet(p) for p in parts],
                            ignore_index=True)
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}", flush=True)
            bad += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            bad += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            bad += 1
        elif frame_hash(got) != frame_hash(want):
            print(f"FAIL {name}: value hash mismatch ({len(got)} rows)")
            # show first few diffs
            g = got[sorted(got.columns)].astype(str)
            w = want[sorted(want.columns)].astype(str)
            neq = (g.values != w.values).any(axis=1)
            print(g[neq].head(3))
            print(w[neq].head(3))
            bad += 1
        else:
            ok += 1
            print(f"ok {name} ({time.time() - t0:.1f}s)", flush=True)
    print(f"{ok} ok, {bad} fail / {ok + bad} total", flush=True)
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(*sys.argv[1:])
