import json
stats = json.load(open('/root/repo/tools/ref_stats.json'))
lines = ["package graft", "",
 "/** Reference empirical column stats (mean, std, missing-fraction) at",
 "  * n=5000, maxLag=2, seed=42 — measured by running the reference generators",
 "  * (tools/ref_stats.py). Cross-validates the Scala kernel distributionally.",
 "  * Generated — do not edit. */",
 "object RefStats {",
 "  // key: (family, nVars) -> col -> (mean, std, missFrac)",
 "  val stats: Map[(String, Int), Map[String, (Double, Double, Double)]] = Map("]
entries = []
for key in sorted(stats.keys()):
    fam, v = key.rsplit('_', 1)
    cols = []
    for c, s in stats[key].items():
        if c.startswith('_'): continue
        cols.append(f'"{c}" -> ({s["mean"]}, {s["std"]}, {s["miss"]})')
    entries.append(f'    ("{fam}", {v}) -> Map({", ".join(cols)})')
lines.append(',\n'.join(entries))
lines.append("  )")
lines.append("}")
open('/root/repo/src/test/scala/graft/RefStats.scala','w').write('\n'.join(lines)+'\n')
print('ok', len(entries))
