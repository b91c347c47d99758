"""Dump every reference family's equation catalog to JSON by exec'ing
only the pure get_*_equations functions (no imports needed)."""
import ast, json, sys, textwrap

FAMS = {
 'A1': ('a1.py','get_linear_equations'),
 'A1C': ('a1c.py','get_linear_equations'),
 'A2': ('a2.py','get_equation_set'),
 'A2C': ('a2c.py','get_linear_equations'),
 'B1C': ('b1c.py','get_nonlinear_equations'),
 'B2': ('b2.py','get_nonlinear_equations_no_u'),
 'B2C': ('b2c.py','get_nonlinear_equations_with_confounder'),
 'C1': ('c1.py','get_nonlinear_equations'),
 'C1C': ('c1c.py','get_nonlinear_equations'),
 'C2': ('c2.py','get_nonlinear_equations'),
 'C2C': ('c2c.py','get_nonlinear_equations_with_confounder'),
 'D1': ('d1.py','get_linear_equations'),
 'D1C': ('d1c.py','get_linear_equations'),
 'D2': ('d2.py','get_nonlinear_equations'),
 'D2C': ('d2c.py','get_nonlinear_equations_with_confounder'),
 'D3': ('d3.py','get_nonlinear_equations'),
 'D3C': ('d3c.py','get_nonlinear_equations_with_confounder'),
}
out = {}
for fam,(fn,name) in FAMS.items():
    src = '\n'.join(l for l in open('/root/reference/Codes/'+fn) if not l.lstrip().startswith('!'))
    tree = ast.parse(src)
    fns = [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef) and n.name==name]
    assert fns, (fam,name)
    ns = {}
    exec(compile(ast.Module(body=[fns[0]], type_ignores=[]), fn, 'exec'), ns)
    f = ns[name]
    for v in (4,6,8):
        for l in (2,3,4):
            eqs = f(v,l)
            out.setdefault(fam,{})[f"{v}_{l}"] = eqs
json.dump(out, open('/root/repo/tools/catalog.json','w'), indent=1)
print("families:", len(out), "total eq-sets:", sum(len(v) for v in out.values()))
