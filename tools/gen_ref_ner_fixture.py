#!/usr/bin/env python3
"""NER-output-surface differential fixture: EXECUTES the reference's pure
E1-E4 helpers (whitespace_tokens_with_offsets, spans_to_bio,
aggregate_entities, join_entities_flat) from ner_address_parser.py on 500
seeded fuzz cases and records their outputs.

The module itself imports torch/transformers (absent in the sandbox), so the
four helper function defs are extracted via `ast` and executed standalone —
they are pure stdlib (re + typing). Spans are DISJOINT (the domain the real
`aggregation_strategy="simple"` pipeline produces) but include mid-token char
boundaries to exercise the any-overlap tagging rule.

Output: src/test/resources/ref_ner.json  (seed 20260817)
"""
import ast
import json
import random

SRC = "/root/reference/src/address_matching/parsing/ner_address_parser.py"
OUT = "src/test/resources/ref_ner.json"
WANT = {"whitespace_tokens_with_offsets", "spans_to_bio",
        "aggregate_entities", "join_entities_flat"}


def load_helpers():
    tree = ast.parse(open(SRC).read())
    mod = ast.Module(
        body=[n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name in WANT]
        + [n for n in tree.body if isinstance(n, ast.Assign)
           and any(getattr(t, "id", "") == "_WS_TOKEN_RE" for t in n.targets)],
        type_ignores=[])
    ns = {"re": __import__("re"), "List": list, "Dict": dict,
          "Tuple": tuple, "Any": object}
    exec(compile(ast.fix_missing_locations(mod), SRC, "exec"), ns)
    return ns


def main():
    ns = load_helpers()
    rnd = random.Random(20260817)
    vocab = ["kazimdirik", "mah", "bornova", "izmir", "cad", "sk", "no", "12",
             "5", "ataturk", "yali", "apartmani", "sitesi", "kat", "daire",
             "a", ":", "/", "guzel", "evleri"]
    labels = ["MAHALLE", "ILCE", "IL", "CADDE", "SOKAK", "BINA_NO", "KAT"]

    cases = []
    for _ in range(500):
        n = rnd.randint(1, 12)
        toks = [rnd.choice(vocab) for _ in range(n)]
        text = " ".join(toks)
        _, offsets = ns["whitespace_tokens_with_offsets"](text)
        # random disjoint spans over token runs; occasionally nudge a char
        # boundary into a token's interior (partial-overlap still tags it)
        spans = []
        i = 0
        while i < n:
            if rnd.random() < 0.4:
                j = min(n, i + rnd.randint(1, 3))
                s, e = offsets[i][0], offsets[j - 1][1]
                snapped = True
                if rnd.random() < 0.2 and e - s > 2:
                    s += 1; snapped = False
                if rnd.random() < 0.2 and e - s > 2:
                    e -= 1; snapped = False
                spans.append({"entity_group": rnd.choice(labels),
                              "start": s, "end": e, "snapped": snapped,
                              "score": round(rnd.random(), 3)})
                i = j
            else:
                i += 1
        rnd.shuffle(spans)  # ref sorts internally; record unsorted input
        tokens, tags = ns["spans_to_bio"](text, spans)
        ents = ns["aggregate_entities"](text, spans)
        flat = ns["join_entities_flat"](ents)
        cases.append({"text": text, "spans": spans, "tokens": tokens,
                      "offsets": [list(o) for o in offsets],
                      "tags": tags, "entities": ents, "flat": flat})

    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(cases, f, ensure_ascii=False)
    n_spans = sum(len(c["spans"]) for c in cases)
    print(f"wrote {len(cases)} cases, {n_spans} spans")


if __name__ == "__main__":
    main()
