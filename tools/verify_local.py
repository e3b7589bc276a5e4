#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: reads Verify.scala output
(outDir/<name> parquet dirs + oracle_sql.json), runs each oracle in DuckDB
over the same sf tables, and compares (rows, schema names, values).

Comparison is strict: columns sorted by name, rows sorted, exact value
equality (floats compared bit-exact after float64 cast; this is stricter
than any plausible driver tolerance)."""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(os.path.join(outdir, 'oracle_sql.json')))
fail, ok, skip = [], [], []
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(os.path.join(path, '*.parquet'))
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        skip.append((name, len(got)))
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fail.append((name, f"oracle SQL error: {e}"))
        continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                pass
            elif np.issubdtype(df[c].dtype, np.floating):
                df[c] = df[c].astype('float64')
            elif np.issubdtype(df[c].dtype, np.integer):
                df[c] = df[c].astype('int64')
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        fail.append((name, f"schema: got {list(g.columns)} want {list(e.columns)}"))
        continue
    # The driver hashes rendered values, so int64 123 vs float64 123.0 is a
    # hash MISMATCH there even when numerically equal. Be at least as strict:
    # fail on any int-vs-float kind divergence (DuckDB SUM(int)→HUGEINT→float64
    # is the classic cause; fix the oracle with CAST(... AS BIGINT)).
    kind_diverge = [c for c in g.columns
                    if {g[c].dtype.kind, e[c].dtype.kind} == {'i', 'f'}]
    if kind_diverge:
        fail.append((name, f"dtype int-vs-float divergence on {kind_diverge} "
                           f"(spark {[str(g[c].dtype) for c in kind_diverge]} vs "
                           f"oracle {[str(e[c].dtype) for c in kind_diverge]}) — "
                           f"driver would hash-mismatch; CAST the oracle"))
        continue
    if len(g) != len(e):
        fail.append((name, f"rows: got {len(g)} want {len(e)}"))
        continue
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        ok.append((name, len(g)))
    except AssertionError as ex:
        fail.append((name, str(ex).split('\n')[0] + ' | ' + '\n'.join(str(ex).split('\n')[1:3])))

for n, r in ok: print(f"PASS {n} ({r} rows)")
for n, r in skip: print(f"SKIP (no oracle) {n} ({r} rows)")
for n, msg in fail: print(f"FAIL {n}: {msg}")
print(f"\n{len(ok)} pass, {len(skip)} rows-only, {len(fail)} fail")
sys.exit(1 if fail else 0)
