"""Regenerate README.md's capability table from the query registry.

One row per driver query: name -> capability (first sentence of the comment
block above the entry) -> graft entry point exercised -> specs referencing
it. Replaces the region between the capability-table markers in README.md.
The registry lives in src/main/scala/graft/entries/Queries*.scala (split
from the former single SparkEntry map in round 13); oracle keys come from
the matching Oracles*.scala traits.
Usage: python3 tools/gen_readme_table.py
"""
import glob
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY_DIR = os.path.join(ROOT, 'src/main/scala/graft/entries')
README = os.path.join(ROOT, 'README.md')

KEY = r'"((?:q\d+|_gen)[^"]*)" *->'
entry_re = re.compile(KEY + r' *\(\((s|spark), *d\)')

oracle_keys = set()
for p in glob.glob(os.path.join(ENTRY_DIR, 'Oracles*.scala')):
    oracle_keys |= set(re.findall(KEY, open(p).read()))


def comment_above(qbody, lines, pos):
    """First sentence of the contiguous // block right above an offset."""
    ln = qbody[:pos].count('\n')
    block = []
    for i in range(ln - 1, -1, -1):
        s = lines[i].strip()
        if s.startswith('//'):
            body = s[2:].strip()
            # section dividers ("-- similarity search --") are headings for
            # a RUN of entries, never one entry's capability — skip them
            if re.fullmatch(r'-+ .*? -+', body):
                continue
            block.insert(0, body)
        elif s == '':
            if block:
                break
            continue
        else:
            break
    if not block:
        return ''
    joined = ' '.join(block)
    # first sentence-ish: cut at ' — ' explanations after the claim, or '. '
    for cut in ['. ', ': the ', ' — the ', ' — ']:
        idx = joined.find(cut)
        if 0 < idx < 120:
            joined = joined[:idx]
            break
    return (joined[:117] + '...') if len(joined) > 120 else joined


CALL = re.compile(r'graft\.((?:\w+\.)*[A-Z]\w*)\.(\w+)\(')

specs_text = {}
for p in glob.glob(os.path.join(ROOT, 'src/test/scala/graft/*.scala')):
    specs_text[os.path.basename(p).replace('.scala', '')] = open(p).read()

rows = []
for p in sorted(glob.glob(os.path.join(ENTRY_DIR, 'Queries*.scala'))):
    qbody = open(p).read()
    lines = qbody.split('\n')
    entries = list(entry_re.finditer(qbody))
    for i, m in enumerate(entries):
        name = m.group(1)
        body_end = entries[i + 1].start() if i + 1 < len(entries) else len(qbody)
        body = qbody[m.start():body_end]
        call = CALL.search(body)
        if call:
            entry = f'`graft.{call.group(1)}.{call.group(2)}`'
        elif '.sql(' in body or 's.sql' in body:
            entry = 'SQL (`SparkEntry`)'
        else:
            entry = 'DataFrame (`SparkEntry`)'
        qkey = name.split('_')[0]
        if qkey.startswith('q'):
            specs = sorted(sp for sp, t in specs_text.items()
                           if re.search(rf'\b{qkey}_', t) or name in t)
        else:  # `_gen` and friends: exact-name references only
            specs = sorted(sp for sp, t in specs_text.items() if f'"{name}"' in t)
        cap = comment_above(qbody, lines, m.start()).replace('|', '\\|')
        rows.append((name, cap, entry, ', '.join(specs) if specs else '—'))
        if name not in oracle_keys:
            raise SystemExit(f'query {name} has no oracleSql entry')

rows.sort(key=lambda r: (r[0] != '_gen', r[0]))

hdr = (f'Every one of the {len(rows)} driver-facing queries below is '
       'hash-checked bitwise against a DuckDB oracle (see `Verify.scala` / '
       '`tools/check_oracle.py`); `PlanSpec` pins the physical-plan shape '
       'of the scale-sensitive entries.\n\n'
       '| query | capability | entry point | spec |\n'
       '|---|---|---|---|\n')
table = hdr + '\n'.join(
    f'| `{n}` | {c or "—"} | {e} | {s} |' for n, c, e, s in rows) + '\n'

readme = open(README).read()
START = '<!-- capability-table:start -->'
END = '<!-- capability-table:end -->'
if START not in readme:
    readme = readme.rstrip() + f'\n\n## Query surface\n\n{START}\n{END}\n'
pre = readme[:readme.index(START) + len(START)]
post = readme[readme.index(END):]
open(README, 'w').write(pre + '\n' + table + post)
print(f'{len(rows)} queries -> README capability table')
