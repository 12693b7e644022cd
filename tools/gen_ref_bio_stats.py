#!/usr/bin/env python3
"""Generator-distribution differential fixture: EXECUTES the reference's
A2E and F2J BIO synthesizers (20,000 samples each, seed 42) and records
distributional rates over their (tokens, tags) output — per-type presence,
street-family mix, admin order, numeric-segment co-occurrence, token-length
mean. The engine's generator uses a counter-hash RNG (sequences cannot match
sample-for-sample by design), so fidelity is judged on RATES: the Scala spec
generates its own corpus and asserts each rate within a two-sample binomial
tolerance.

Output: src/test/resources/ref_bio_stats.json
"""
import json
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _ref_common import read_xlsx_rows, patch_reference_io

N = 20000
OUT = "src/test/resources/ref_bio_stats.json"

TYPES = ["IL", "ILCE", "MAHALLE", "CADDE", "SOKAK", "BINA_NO", "DAIRE_NO",
         "KAT", "POSTA_KODU", "SITE_ADI", "BINA_ADI", "BULVAR", "TARIF"]


def rates(samples):
    n = len(samples)
    def has(tags, t):
        return any(y == f"B-{t}" for y in tags)
    def first(tags, t):
        return next((i for i, y in enumerate(tags) if y == f"B-{t}"), None)
    out = {"n": n}
    for t in TYPES:
        out[f"p_{t.lower()}"] = sum(1 for _, _, tg in samples if has(tg, t)) / n
    both = cad = sk = 0
    dfirst = pfirst = 0
    bina_daire = 0
    tok_total = 0
    for _, toks, tg in samples:
        c, s = has(tg, "CADDE"), has(tg, "SOKAK")
        if c and s: both += 1
        elif c: cad += 1
        elif s: sk += 1
        fi, fp = first(tg, "ILCE"), first(tg, "IL")
        if fi is not None and fp is not None:
            if fi < fp: dfirst += 1
            else: pfirst += 1
        if has(tg, "BINA_NO") and has(tg, "DAIRE_NO"): bina_daire += 1
        tok_total += len(toks)
    out.update(p_cad_and_sk=both / n, p_cad_only=cad / n, p_sk_only=sk / n,
               p_district_first=dfirst / n, p_province_first=pfirst / n,
               p_bina_and_daire=bina_daire / n, avg_tokens=tok_total / n)
    return out


def main():
    patch_reference_io(read_xlsx_rows())
    # F2J's fallback import chain expects `synth.config...` resolvable
    sys.path.insert(0, "/root/reference/data")
    from data.synth.group_A2E_BIO_synth import GroupA2EGenerator
    from data.synth.group_F2J_BIO_synth import GroupF2JGenerator
    from data.synth.config.general_config import KeywordVariants
    from data.synth.config.groupA2E_config import SynthesisConfigA2E
    from data.synth.config.groupF2J_config import SynthesisConfigF2J

    a2e = GroupA2EGenerator(variants=KeywordVariants(), cfg=SynthesisConfigA2E(), seed=42)
    f2j = GroupF2JGenerator(cfg=SynthesisConfigF2J(), seed=42)
    sa = [a2e.generate_one() for _ in range(N)]
    sf = [f2j.generate_one() for _ in range(N)]

    out = {"a2e": rates(sa), "f2j": rates(sf)}
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False, indent=1)
    print(f"wrote rates over {N}+{N} executed-reference samples")
    for g in ("a2e", "f2j"):
        top = {k: round(v, 4) for k, v in out[g].items() if k != "n"}
        print(g, top)


if __name__ == "__main__":
    main()
