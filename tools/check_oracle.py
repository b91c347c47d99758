"""Local replica of the driver's t2 correctness loop: for each query output in
VERIFY_OUT, run the corresponding oracle SQL in DuckDB over the sf tables and
compare (sorted columns, sorted rows, NaN-safe). Usage:
    python3 tools/check_oracle.py [sfDir] [verifyOut]
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
for p in glob.glob(f'{sf}/*.parquet'):
    name = p.split('/')[-1].replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
results = {}
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        results[name] = f'ORACLE-ERROR: {e}'
        continue
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        # nested artifact dirs (_gen holds one subdir per kernel dump):
        # mirror the driver's recursive read
        files = glob.glob(f'{out}/{name}/**/*.parquet', recursive=True)
    if not files:
        results[name] = 'NO-SPARK-OUTPUT'
        continue
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    # normalize: sort columns by name, sort rows by all columns
    def norm(df):
        df = df[sorted(df.columns)]
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        results[name] = f'SCHEMA: spark={list(g.columns)} oracle={list(e.columns)}'
        continue
    if len(g) != len(e):
        results[name] = f'ROWS: spark={len(g)} oracle={len(e)}'
        continue
    ok = True
    for c in g.columns:
        gv, ev = g[c].values, e[c].values
        # The driver's value hash is dtype/repr-sensitive: an oracle column
        # DuckDB types as HUGEINT comes back float64 while Spark writes int64,
        # and the hashes diverge even when every value is numerically equal
        # (the round-7 q275/q277/q292/q297/q308 failure class). Model that
        # here: one side floating + other side integer = hard failure; the
        # oracle SQL must cast such columns ::BIGINT.
        g_f = np.issubdtype(g[c].dtype, np.floating)
        e_f = np.issubdtype(e[c].dtype, np.floating)
        if g_f != e_f:
            results[name] = (f'DTYPE col {c}: spark={g[c].dtype} '
                             f'oracle={e[c].dtype} (HUGEINT leak? cast '
                             f'the oracle column ::BIGINT)')
            ok = False
            break
        if g_f or e_f:
            # BITWISE-exact, like the driver's value hash — atol tolerance here
            # let q09/q31/q33 slip through in round 1
            a, b = gv.astype(float), ev.astype(float)
            same = ((a == b) | (np.isnan(a) & np.isnan(b))).all()
        else:
            same = (gv == ev).all() if len(gv) else True
        if not same:
            diff_i = None
            for i in range(len(gv)):
                a, b = gv[i], ev[i]
                eqv = (a == b) or (isinstance(a, float) and isinstance(b, float)
                                   and np.isnan(a) and np.isnan(b))
                if not eqv:
                    diff_i = i
                    break
            results[name] = f'VALUES col {c} row {diff_i}: spark={gv[diff_i]!r} oracle={ev[diff_i]!r}'
            ok = False
            break
    if ok:
        results[name] = f'OK ({len(g)} rows)'

fails = 0
for name, r in sorted(results.items()):
    flag = ' ' if r.startswith('OK') else 'X'
    if flag == 'X': fails += 1
    print(f'{flag} {name}: {r}')
print(f'\n{len(results) - fails}/{len(results)} queries match')
sys.exit(1 if fails else 0)
