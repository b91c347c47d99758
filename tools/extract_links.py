"""Golden link-dicts: run each family's own extractor on its equation sets."""
import ast, json
CAT = json.load(open('/root/repo/tools/catalog.json'))
EXTR = {
 'A1': ('a1.py','extract_linear_links'),
 'A1C': ('a1c.py','extract_linear_links'),
 'A2': ('a2.py','extract_coefficients_from_equations'),
 'A2C': ('a2c.py','extract_linear_links'),
 'B1C': ('b1c.py','extract_linear_links'),
 'B2': ('b2.py','extract_linear_links_for_graph'),
 'B2C': ('b2c.py','extract_linear_links_for_graph'),
 'C1': ('c1.py','extract_causal_links'),
 'C1C': ('c1c.py','extract_causal_links'),
 'C2': ('c2.py','extract_causal_links'),
 'C2C': ('c2c.py','extract_causal_links'),
 'D1': ('d1.py','extract_linear_links'),
 'D1C': ('d1c.py','extract_linear_links'),
 'D2': ('d2.py','extract_linear_links_for_graph'),
 'D2C': ('d2c.py','extract_linear_links_for_graph'),
 'D3': ('d3.py','extract_causal_links'),
 'D3C': ('d3c.py','extract_causal_links'),
}
out = {}
for fam,(fn,name) in EXTR.items():
    src = '\n'.join(l for l in open('/root/reference/Codes/'+fn) if not l.lstrip().startswith('!'))
    tree = ast.parse(src)
    fns = [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef) and n.name==name]
    ns = {}
    exec(compile(ast.Module(body=[fns[0]], type_ignores=[]), fn, 'exec'), ns)
    f = ns[name]
    for key, eqs in CAT[fam].items():
        links = f(eqs)
        # normalize: key tuple -> list, value float
        ser = [[list(k) if isinstance(k, tuple) else [k], v] for k, v in links.items()]
        out.setdefault(fam, {})[key] = ser
json.dump(out, open('/root/repo/tools/links_golden.json','w'), indent=1)
for fam in ['A1','B2','C1','D3C','A2']:
    print(fam, '4_2:', out[fam]['4_2'])
