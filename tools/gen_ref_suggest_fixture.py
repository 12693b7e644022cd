#!/usr/bin/env python3
"""suggest() differential fixture: EXECUTES the reference's composite-score
suggestion helper (test/test_static_parser.py:63-71) on 300 seeded cases
whose key pools are real normalized PTT neighbourhood names and whose
targets are exact, truncated, typo'd, or unrelated names. Records the
top-5 lists VERBATIM — including the stable-sort tie order.

Output: src/test/resources/ref_suggest.json  (seed 20260817)
"""
import ast
import json
import random
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _ref_common import XLSX, read_xlsx_rows, patch_reference_io


SRC = "/root/reference/test/test_static_parser.py"
OUT = "src/test/resources/ref_suggest.json.gz"


def load_suggest():
    # the test module imports the parser (torch-free) but builds TR at import
    # of static_parser; serve the xlsx through the same monkeypatch
    tree = ast.parse(open(SRC).read())
    fns = [n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name == "suggest"]
    ns = {"List": list, "Tuple": tuple}
    exec(compile(ast.fix_missing_locations(
        ast.Module(body=fns, type_ignores=[])), SRC, "exec"), ns)
    return ns["suggest"]


def main():
    rows = read_xlsx_rows(XLSX)
    refmap = patch_reference_io(rows)
    tr = refmap.Turkey.load(XLSX)
    suggest = load_suggest()

    all_nbhds = tr.neighbourhoods_of()  # normalized, countrywide
    rnd = random.Random(20260817)

    cases = []
    for i in range(300):
        keys = rnd.sample(all_nbhds, rnd.randint(20, 200))
        base = rnd.choice(keys if i % 3 else all_nbhds)
        t = i % 5
        if t == 0:   target = base
        elif t == 1: target = base[: max(3, len(base) - 2)]   # truncated
        elif t == 2: target = base.replace("a", "e", 1)       # typo
        elif t == 3: target = base.split()[0]                  # first token
        else:        target = rnd.choice(all_nbhds)            # unrelated
        cases.append({"keys": keys, "target": target,
                      "top": suggest(keys, target)})

    import gzip
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(cases, f, ensure_ascii=False)
    print(f"wrote {len(cases)} suggest cases")


if __name__ == "__main__":
    main()
