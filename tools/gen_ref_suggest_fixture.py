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
import re
import sys
import xml.etree.ElementTree as ET
import zipfile

import pandas as pd

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
XLSX = "/root/reference/data/ptt_data/turkiye_posta_kodlari.xlsx"
SRC = "/root/reference/test/test_static_parser.py"
OUT = "src/test/resources/ref_suggest.json.gz"


def read_xlsx_rows(path):
    z = zipfile.ZipFile(path)
    sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    out = []
    for row in sheet.iter(NS + "row"):
        vals = {}
        for c in row.iter(NS + "c"):
            col = re.match(r"([A-Z]+)", c.get("r")).group(1)
            if c.get("t") == "inlineStr":
                t = c.find(f"{NS}is/{NS}t")
                vals[col] = "" if t is None or t.text is None else t.text
            else:
                v = c.find(f"{NS}v")
                vals[col] = "" if v is None or v.text is None else v.text
        out.append([vals.get(k, "") for k in "ABCDE"])
    return out


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
    pd.read_excel = lambda path, header=None: pd.DataFrame(rows)
    sys.path.insert(0, "/root/reference")
    import data.ptt_data.map as refmap
    refmap.Turkey._write_cache = lambda *a, **k: None
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
