#!/usr/bin/env python3
"""One-shot mechanical splitter for SparkEntry.scala (round-13 item #5).

Parses the two 374-entry map literals (queries / oracleSql), classifies each
key into a domain by its position in the queries map's section structure, and
emits per-domain trait files composing the same Maps. Helpers stay in
SparkEntry.scala with `private` widened to `private[graft]` so the self-typed
traits keep unqualified access. Behavior-preserving by construction: entry
bodies are copied verbatim.
"""
import re, sys, collections

SRC = '/root/repo/src/main/scala/graft/SparkEntry.scala'
lines = open(SRC).read().split('\n')  # 0-based; file line N = lines[N-1]

Q_OPEN, Q_CLOSE = 162, 9253      # 1-based: 'Map(' line and ')' line of queries
O_OPEN, O_CLOSE = 10992, 18822   # same for oracleSql

ENTRY_RE = re.compile(r'^    "([A-Za-z0-9_]+)" ->')

def parse_map(open_line, close_line):
    """Return list of (key, start, end) 1-based inclusive line ranges.
    Comments between entries attach to the FOLLOWING entry."""
    entries = []
    starts = []  # (lineno, key)
    for n in range(open_line + 1, close_line):
        m = ENTRY_RE.match(lines[n - 1])
        if m:
            starts.append((n, m.group(1)))
    out = []
    for i, (n, key) in enumerate(starts):
        # walk back over attached comment/blank lines
        s = n
        while s - 1 > open_line:
            prev = lines[s - 2].strip()
            if prev == '' or prev.startswith('//') or prev.startswith('*') \
               or prev.startswith('/*'):
                s -= 1
            else:
                break
        e = (starts[i + 1][0] - 1) if i + 1 < len(starts) else close_line - 1
        # the next entry's attached comments get clipped off our end later:
        out.append([key, s, e])
    # fix overlaps: entry i's end must stop before entry i+1's (comment-
    # adjusted) start
    for i in range(len(out) - 1):
        out[i][2] = out[i + 1][1] - 1
    return out

qents = parse_map(Q_OPEN, Q_CLOSE)
oents = parse_map(O_OPEN, O_CLOSE)
assert len(qents) == 374 and len(oents) == 374, (len(qents), len(oents))

# domain by position in the queries map
def domain(start):
    if start < 284: return 'Relational'
    if start < 468: return 'TextSim'
    if start < 646: return 'GenStats'
    if start < 985: return 'Generation'
    if start < 5327: return 'Pipeline'
    return 'Causal'

key_dom = {k: domain(s) for k, s, _ in qents}
missing = [k for k, _, _ in oents if k not in key_dom]
assert not missing, missing

DOMS = ['Relational', 'TextSim', 'GenStats', 'Generation', 'Pipeline', 'Causal']

def body(ents, keys):
    chunks = []
    for k, s, e in ents:
        if k in keys:
            chunks.append('\n'.join(lines[s - 1:e]))
    txt = ',\n'.join(c.rstrip().rstrip(',') for c in chunks)
    return txt

HEADER = '''package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._
import graft.generate.Generate
import graft.ops.{AsOf, ExactStats, Lagged}
import graft.text.{Dedup, TextOps}
import graft.sim.Similarity
'''

stats = {}
for dom in DOMS:
    keys = {k for k, d in key_dom.items() if d == dom}
    qb = body(qents, keys)
    ob = body(oents, keys)
    qfile = f'/root/repo/src/main/scala/graft/entries/Queries{dom}.scala'
    ofile = f'/root/repo/src/main/scala/graft/entries/Oracles{dom}.scala'
    qtxt = (HEADER +
            f'\n/** {dom} slice of [[SparkEntry.queries]] — mechanical split of the\n'
            f'  * single registry map; entry bodies are verbatim. */\n'
            f'private[graft] trait Queries{dom} {{ this: SparkEntry.type =>\n\n'
            f'  private[graft] def queries{dom}: '
            f'Map[String, (SparkSession, String) => DataFrame] = Map(\n'
            + qb + '\n  )\n}\n')
    otxt = ('package graft\n' +
            f'\n/** {dom} slice of [[SparkEntry.oracleSql]] — the DuckDB twins of\n'
            f'  * [[Queries{dom}]], split mechanically from the single map. */\n'
            f'private[graft] trait Oracles{dom} {{ this: SparkEntry.type =>\n\n'
            f'  private[graft] def oracleSql{dom}: Map[String, String] = Map(\n'
            + ob + '\n  )\n}\n')
    open(qfile, 'w').write(qtxt)
    open(ofile, 'w').write(otxt)
    stats[dom] = (len(keys), qtxt.count('\n'), otxt.count('\n'))

# rebuild SparkEntry.scala: header+helpers, composed defs, mid helpers, tail
new = []
new.extend(lines[0:Q_OPEN - 1])          # 1..161 (up to the --- divider)
new.append('  def queries: Map[String, (SparkSession, String) => DataFrame] =')
new.append('    ' + ' ++ '.join(f'queries{d}' for d in DOMS))
new.append('')
new.extend(lines[Q_CLOSE:O_OPEN - 1])    # 9254..10991 helpers
new.append('  def oracleSql: Map[String, String] =')
new.append('    ' + ' ++ '.join(f'oracleSql{d}' for d in DOMS))
new.append('')
new.extend(lines[O_CLOSE:])              # 18823..end
txt = '\n'.join(new)
# the object must now extend the traits
txt = txt.replace('object SparkEntry {',
                  'object SparkEntry\n'
                  + '  extends ' + ' with '.join(f'Queries{d}' for d in DOMS)
                  + '\n  with ' + ' with '.join(f'Oracles{d}' for d in DOMS)
                  + ' {', 1)
# widen top-level private members so the self-typed traits can see them
txt = re.sub(r'^  private (def|val|lazy val|object|case class|class) ',
             r'  private[graft] \1 ', txt, flags=re.M)
open(SRC, 'w').write(txt)

for d, (n, ql, ol) in stats.items():
    print(f'{d:12s} {n:4d} keys  queries file {ql:5d} lines  oracles file {ol:5d} lines')
print('SparkEntry.scala now', txt.count('\n') + 1, 'lines')
