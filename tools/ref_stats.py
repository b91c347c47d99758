"""Empirical reference stats for cross-validating the Scala kernel.

Loads each reference generator with heavy deps stubbed, generates one series
per (family, nVars) at n=5000 / maxLag=2 / seed=42, and dumps per-column
mean/std (+ missing fraction) to ref_stats.json. scipy IS required for the
student_t families; we use gaussian everywhere so the scipy stub suffices.
"""
import json, sys, types
import numpy as np

def load(fname):
    for m in ['tigramite','tigramite.plotting','matplotlib','matplotlib.pyplot',
              'scipy','scipy.stats','google','google.colab']:
        sys.modules.setdefault(m, types.ModuleType(m))
    sys.modules['tigramite'].plotting = sys.modules['tigramite.plotting']
    sys.modules['scipy'].stats = sys.modules['scipy.stats']
    if not hasattr(sys.modules['scipy.stats'], 't'):
        sys.modules['scipy.stats'].t = types.SimpleNamespace(
            random_state=None,
            rvs=lambda *a, **k: (_ for _ in ()).throw(RuntimeError('t.rvs unused')))
    src = ''.join(l for l in open('/root/reference/Codes/'+fname)
                  if not l.lstrip().startswith('!'))
    for cut_marker in ['from google.colab', '\ndrive.mount', "\nif __name__"]:
        i = src.find(cut_marker)
        if i != -1:
            src = src[:i]
    # never run module-tail sweeps
    i = src.find('\ngenerate_all_combinations()')
    if i != -1: src = src[:i]
    ns = {'__name__': 'refmod_'+fname}
    exec(compile(src, fname, 'exec'), ns)
    return ns

N, LAG, SEED = 5000, 2, 42
out = {}

def record(fam, v, df, extra=None, lag=None):
    cols = [c for c in df.columns if c != 'time']
    stats = {}
    for c in cols:
        vals = df[c].values.astype(float)
        ok = ~np.isnan(vals)
        stats[c] = {'mean': float(np.nanmean(vals)), 'std': float(np.nanstd(vals)),
                    'miss': float(1.0 - ok.mean())}
    stats['_time_last'] = float(df['time'].values[-1])
    if extra: stats.update(extra)
    key = f'{fam}_{v}' if lag is None else f'{fam}_{v}_lag{lag}'
    out[key] = stats

for v in (4, 6, 8):
    ns = load('a1.py')
    g = ns['LinearTimeSeriesGenerator']('gaussian', 0.1, random_state=SEED)
    record('A1', v, g.generate_multivariate_ts(N, v, LAG))

    ns = load('a1c.py')
    g = ns['LinearTimeSeriesGeneratorWithConfounder']('gaussian', 0.1, random_state=SEED) \
        if 'LinearTimeSeriesGeneratorWithConfounder' in ns else None
    if g is None:
        cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
        g = ns[cls]('gaussian', 0.1, random_state=SEED)
    record('A1C', v, g.generate_multivariate_ts(N, v, LAG))

    ns = load('a2.py')
    g = ns['TimeSeriesGenerator']('gaussian', random_state=SEED)
    record('A2', v, g.generate_multivariate_ts(N, v, LAG))

    ns = load('a2c.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls]('gaussian', random_state=SEED)
    record('A2C', v, g.generate_multivariate_ts(N, v, LAG))

    ns = load('b1c.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls]('gaussian', random_state=SEED)
    record('B1C', v, g.generate_multivariate_ts(N, v, LAG))

    ns = load('b2.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls](noise_mix_ratio=0.5, random_state=SEED)
    record('B2', v, g.generate_multivariate_ts(N, v, LAG))

    ns = load('b2c.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls](noise_mix_ratio=0.5, random_state=SEED)
    record('B2C', v, g.generate_multivariate_ts(N, v, LAG))

    ns = load('c1.py')
    g = ns['NonlinearTimeSeriesGenerator'](random_state=SEED)
    record('C1', v, g.generate_multivariate_ts(N, v, LAG))

    ns = load('c1c.py')
    g = ns['NonlinearTimeSeriesGenerator'](random_state=SEED)
    record('C1C', v, g.generate_multivariate_ts(N, v, LAG))

    ns = load('c2.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls](noise_type='gaussian', random_state=SEED)
    record('C2', v, g.generate_multivariate_ts(N, v, LAG))

    ns = load('c2c.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls](noise_type='gaussian', random_state=SEED)
    record('C2C', v, g.generate_multivariate_ts(N, v, LAG))

    ns = load('d1.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls](noise_type='gaussian', missing_rate=0.2, random_state=SEED)
    dfm, _ = g.generate_multivariate_ts(N, v, LAG)
    record('D1', v, dfm)

    ns = load('d1c.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls](noise_type='gaussian', missing_rate=0.2, random_state=SEED)
    res = g.generate_multivariate_ts(N, v, LAG)
    record('D1C', v, res[0])

    ns = load('d2.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls](block_prob=0.2, noise_type='gaussian', random_state=SEED)
    dfm, dfc, _ = g.generate_multivariate_ts(N, v, LAG)
    record('D2', v, dfm)

    ns = load('d2c.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls](block_prob=0.2, noise_type='gaussian', random_state=SEED)
    res = g.generate_multivariate_ts(N, v, LAG)
    record('D2C', v, res[0])

    ns = load('d3.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls](noise_mix_ratio=0.5, mcar_prob=0.05, block_prob=0.05, random_state=SEED)
    res = g.generate_multivariate_ts(N, v, LAG)
    record('D3', v, res[0])

    ns = load('d3c.py')
    cls = [k for k in ns if isinstance(ns[k], type) and 'Generator' in k][0]
    g = ns[cls](noise_mix_ratio=0.5, mcar_prob=0.05, block_prob=0.05, random_state=SEED)
    res = g.generate_multivariate_ts(N, v, LAG)
    record('D3C', v, res[0])

# --- lag-3/4 sweep at nVars=6 (validates lag-dependent indexing paths) ---
GENS = [
  ('A1','a1.py', lambda ns,S: ns['LinearTimeSeriesGenerator']('gaussian', 0.1, random_state=S), 1),
  ('A2','a2.py', lambda ns,S: ns['TimeSeriesGenerator']('gaussian', random_state=S), 1),
  ('B2','b2.py', lambda ns,S: [ns[k] for k in ns if isinstance(ns[k], type) and 'Generator' in k][0](noise_mix_ratio=0.5, random_state=S), 1),
  ('C1','c1.py', lambda ns,S: ns['NonlinearTimeSeriesGenerator'](random_state=S), 1),
  ('C2','c2.py', lambda ns,S: [ns[k] for k in ns if isinstance(ns[k], type) and 'Generator' in k][0](noise_type='gaussian', random_state=S), 1),
  ('D1','d1.py', lambda ns,S: [ns[k] for k in ns if isinstance(ns[k], type) and 'Generator' in k][0](noise_type='gaussian', missing_rate=0.2, random_state=S), 0),
  ('D2','d2.py', lambda ns,S: [ns[k] for k in ns if isinstance(ns[k], type) and 'Generator' in k][0](block_prob=0.2, noise_type='gaussian', random_state=S), 0),
  ('D3C','d3c.py', lambda ns,S: [ns[k] for k in ns if isinstance(ns[k], type) and 'Generator' in k][0](noise_mix_ratio=0.5, mcar_prob=0.05, block_prob=0.05, random_state=S), 0),
]
for lag in (3, 4):
    for fam, fn, mk, direct in GENS:
        ns = load(fn)
        g = mk(ns, SEED)
        res = g.generate_multivariate_ts(N, 6, lag)
        df = res if direct else res[0]
        record(fam, 6, df, lag=lag)

json.dump(out, open('/root/repo/tools/ref_stats.json', 'w'), indent=1)
print('total keys:', len(out))
