"""Time each oracle SQL in DuckDB (driver-side audit, r13 verdict #3): the
round's correctness budget is Verify (Spark) + the DuckDB compare, and the
compare's cost concentrates in a few expensive oracles. Prints the slowest N
with cumulative share so rewrite effort lands where the wall-clock is.
Usage:
    python3 tools/time_oracle.py [sfDir] [verifyOut] [topN]
"""
import json, sys, glob, time
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
top = int(sys.argv[3]) if len(sys.argv) > 3 else 25

con = duckdb.connect()
for p in glob.glob(f'{sf}/*.parquet'):
    name = p.split('/')[-1].replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
times = {}
t_all = time.time()
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.execute(sql).df()
        times[name] = time.time() - t0
    except Exception as e:
        times[name] = time.time() - t0
        print(f'  {name}: ORACLE-ERROR after {times[name]:.2f}s: {str(e)[:120]}')
total = time.time() - t_all
ranked = sorted(times.items(), key=lambda kv: -kv[1])
cum = 0.0
print(f'\n{len(times)} oracles, total {total:.1f}s; slowest {top}:')
for name, t in ranked[:top]:
    cum += t
    print(f'  {t:7.2f}s  {100*cum/total:5.1f}% cum  {name}')
