#!/usr/bin/env python3
"""Differential-fixture generator: EXECUTES the reference StaticAddressParser
over its REAL 73,305-row PTT gazetteer and records (input -> parse) pairs.

Driver-side only (pandas lives outside sbt; the engine never runs this).
The sandbox has no openpyxl, so the xlsx is read via zipfile+ElementTree
(inlineStr cells) and pandas.read_excel is monkey-patched to serve it;
Turkey's pickle cache write is disabled (reference tree is read-only).

Outputs (committed as test fixtures):
  src/main/resources/graft/ref_gaz_raw.tsv.gz   raw (il, ilce, mahalle) rows, xlsx order
  src/test/resources/ref_parse.json       2,000 (input, province, district,
                                          neighbourhood) cases, seed 20260817
"""
import gzip
import json
import random
import re
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _ref_common import XLSX, read_xlsx_rows, patch_reference_io


OUT_GAZ = "src/main/resources/graft/ref_gaz_raw.tsv.gz"
OUT_CASES = "src/test/resources/ref_parse.json"


def main():
    rows = read_xlsx_rows(XLSX)
    print(f"xlsx rows: {len(rows)} (incl. header)")
    patch_reference_io(rows)
    from src.address_matching.parsing.static_parser import StaticAddressParser

    parser = StaticAddressParser()

    data = [r for r in rows[1:] if r[0].strip() and r[1].strip() and r[3].strip()]
    rnd = random.Random(20260817)

    def n_bare(n):  # neighbourhood surface without the trailing MAH keyword
        return re.sub(r"\s*MAH\s*$", "", n)

    def make_case(i):
        r = rnd.choice(data)
        p, d, n = r[0], r[1], r[3]
        r2 = rnd.choice(data)
        street = rnd.choice(["Atatürk Cad.", "1004 Sok.", "İnönü Caddesi", "Gül Sk."])
        t = i % 14
        if t == 0:  return f"{n} {d} {p}"
        if t == 1:  return f"{n.title()} {d.title()} {p.title()}"
        if t == 2:  return f"{n_bare(n)} mahallesi {d} / {p}".lower()
        if t == 3:  return f"{p} {d} {n}"                       # reversed order
        if t == 4:  return n                                     # nbhd alone
        if t == 5:  return f"{d} {p}"                            # no nbhd
        if t == 6:  return f"{n} {street} No:12 {d} {p}"
        if t == 7:  return f"{n_bare(n)} Mah. No:3 Kat:2 {p}"    # district omitted
        if t == 8:  return f"{n} {r2[1]} {r2[0]}"                # mismatched hierarchy
        if t == 9:  return n_bare(n).lower()                     # bare lowercase name
        if t == 10: return f"asdf qwer {n} {d} {p}"              # noise prefix
        if t == 11: return f"{n_bare(n)} Mh. {d} {p}"            # dotted variant
        if t == 12: return f"{n_bare(n)}, {d}, {p} 34710"        # commas + postcode
        return f"{r2[3]} {d} {p}"                                # foreign nbhd

    cases = []
    for i in range(2000):
        s = make_case(i)
        a = parser.parse(s)
        cases.append({
            "input": s,
            "province": a.province,
            "district": a.district,
            "neighbourhood": a.neighbourhood,
        })

    with gzip.open(OUT_GAZ, "wt", encoding="utf-8") as f:
        for r in rows[1:]:
            f.write(f"{r[0]}\t{r[1]}\t{r[3]}\n")
    with open(OUT_CASES, "w", encoding="utf-8") as f:
        json.dump(cases, f, ensure_ascii=False)
    hit = sum(1 for c in cases if c["province"])
    print(f"wrote {len(cases)} cases ({hit} with a parsed province) + gazetteer tsv")


if __name__ == "__main__":
    main()
