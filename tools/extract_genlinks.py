"""Golden GENERATION-side link-dicts for link-based families (what the kernels
actually iterate over, incl. dropped-cubic + A2C-empty quirks)."""
import ast, json
CAT = json.load(open('/root/repo/tools/catalog.json'))
EXTR = {
 'A2': ('a2.py','extract_coefficients_from_equations'),
 'A2C': ('a2c.py','extract_coefficients_from_equations'),
 'B1C': ('b1c.py','extract_coefficients_from_equations'),
 'B2': ('b2.py','extract_coefficients_from_equations'),
 'B2C': ('b2c.py','extract_coefficients_from_equations'),
 'D2': ('d2.py','extract_coefficients_from_equations'),
 'D2C': ('d2c.py','extract_coefficients_from_equations'),
}
out = {}
for fam,(fn,name) in EXTR.items():
    src = '\n'.join(l for l in open('/root/reference/Codes/'+fn) if not l.lstrip().startswith('!'))
    tree = ast.parse(src)
    f = [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef) and n.name==name][0]
    ns = {}
    exec(compile(ast.Module(body=[f], type_ignores=[]), fn, 'exec'), ns)
    for key, eqs in CAT[fam].items():
        links = ns[name](eqs)
        out.setdefault(fam, {})[key] = [[list(map(str, k)), v] for k, v in links.items()]
    # B1 reconstruction: B2 equations through b2-style extractor
    if fam == 'B2':
        for key, eqs in CAT['B2'].items():
            out.setdefault('B1', {})[key] = [[list(map(str, k)), v] for k, v in ns[name](eqs).items()]
json.dump(out, open('/root/repo/tools/genlinks_golden.json','w'), indent=1)
print('B1C 4_2:', out['B1C']['4_2']); print('A2C 4_2:', out['A2C']['4_2']); print('D2C 6_2:', out['D2C']['6_2'])
