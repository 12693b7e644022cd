#!/usr/bin/env python3
"""Lookup-API differential fixture: EXECUTES the reference Turkey tree
(map.py) over the real 73,305-row PTT xlsx and records the outputs of every
public query mode — neighbourhoods_of (all 4 modes), district_count,
neighbourhood_count, duplicate_districts_across_provinces, provinces.

Large lists are stored as (count, md5 of "\n".join(sorted list), first 3,
last 3) so the fixture stays small while the comparison stays exact.

Output: src/test/resources/ref_lookup.json  (seed 20260817 for sampling)
"""
import gzip
import hashlib
import json
import random
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _ref_common import XLSX, read_xlsx_rows, patch_reference_io


OUT = "src/test/resources/ref_lookup.json"


def digest(names):
    s = sorted(names)
    return {
        "n": len(s),
        "md5": hashlib.md5("\n".join(s).encode("utf-8")).hexdigest(),
        "head": s[:3],
        "tail": s[-3:],
    }


def main():
    rows = read_xlsx_rows(XLSX)
    refmap = patch_reference_io(rows)
    tr = refmap.Turkey.load(XLSX)

    rnd = random.Random(20260817)
    provs = sorted(tr.provinces())
    dup = tr.duplicate_districts_across_provinces()

    pairs = []
    for _ in range(30):
        p = rnd.choice(provs)
        d = rnd.choice(sorted(tr.districts_of(p)))
        pairs.append({"province": p, "district": d,
                      "neighbourhoods": digest(tr.neighbourhoods_of(province=p, district=d))})

    prov_only = [{"province": p, "neighbourhoods": digest(tr.neighbourhoods_of(province=p))}
                 for p in rnd.sample(provs, 10)]

    dup_names = sorted(dup.keys())
    dist_only = [{"district": d, "neighbourhoods": digest(tr.neighbourhoods_of(district=d))}
                 for d in (rnd.sample(dup_names, min(8, len(dup_names))) +
                           [rnd.choice(sorted(tr.districts_of(rnd.choice(provs)))) for _ in range(4)])]

    out = {
        "provinces": digest(provs),
        "all_neighbourhoods": digest(tr.neighbourhoods_of()),
        "district_count": {p: tr.district_count(p) for p in provs},
        "neighbourhood_count": {p: tr.neighbourhood_count(p) for p in provs},
        "duplicate_districts": {d: dup[d] for d in dup_names},
        "pairs": pairs,
        "prov_only": prov_only,
        "dist_only": dist_only,
    }
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False)
    print(f"provinces={len(provs)} dup_districts={len(dup_names)} "
          f"pairs={len(pairs)} wrote {OUT}")


if __name__ == "__main__":
    main()
