import json
stats = json.load(open('/root/repo/tools/ref_stats.json'))
lines = ["package graft", "",
 "/** Reference empirical column stats (mean, std, missing-fraction) at",
 "  * n=5000, seed=42 — measured by running the reference generators",
 "  * (tools/ref_stats.py). Keys: (family, nVars, maxLag).",
 "  * Generated — do not edit. */",
 "object RefStats {",
 "  val stats: Map[(String, Int, Int), Map[String, (Double, Double, Double)]] = Map("]
entries = []
for key in sorted(stats.keys()):
    parts = key.split('_')
    if parts[-1].startswith('lag'):
        lag = int(parts[-1][3:]); v = int(parts[-2]); fam = '_'.join(parts[:-2])
    else:
        lag = 2; v = int(parts[-1]); fam = '_'.join(parts[:-1])
    cols = []
    for c, s in stats[key].items():
        if c.startswith('_'): continue
        cols.append(f'"{c}" -> ({s["mean"]}, {s["std"]}, {s["miss"]})')
    entries.append(f'    ("{fam}", {v}, {lag}) -> Map({", ".join(cols)})')
lines.append(',\n'.join(entries))
lines.append("  )")
lines.append("}")
open('/root/repo/src/test/scala/graft/RefStats.scala','w').write('\n'.join(lines)+'\n')
print('ok', len(entries))
