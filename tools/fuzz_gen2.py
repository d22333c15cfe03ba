#!/usr/bin/env python3
"""Differential-fixture generator #2 (dev-only): the DataConverter
pipeline (/root/reference/script.py) — section split, format dispatch,
type coercion, title-class merge, single-key flatten.

Composes seeded random documents (sectioned and single-format), runs
the reference `DataConverter().parse` on each, and writes text +
parsed-JSON pairs to src/test/resources/fuzz_converter.json for
FuzzConverterSpec to replay through the Scala port. Documents on which
the reference itself raises are skipped (the port mirrors only the
non-crashing surface).

Regenerate with:  python3 tools/fuzz_gen2.py
"""
import importlib.util
import json
import random
import sys

spec = importlib.util.spec_from_file_location("refscript", "/root/reference/script.py")
ref = importlib.util.module_from_spec(spec)
sys.modules["refscript"] = ref
spec.loader.exec_module(ref)

# optional: fuzz_gen2.py [seed] [output_path] — defaults regenerate the
# committed fixture; alternate seeds pair with `Test/runMain graft.FuzzCheck`
SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 20260813
OUT = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/fuzz_converter.json"
rng = random.Random(SEED)

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
         "omicron pi rho sigma tau upsilon phi chi psi omega data value record").split()


def words(a, b):
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(a, b)))


def val():
    return rng.choice([
        words(1, 2), str(rng.randint(0, 9999)), str(round(rng.uniform(0, 99), 2)),
        "true", "Yes", "OFF", "N/A", "null", '"quoted"', "'single'",
        "1,5", "12.", "a;b;c", "3;4;5.5", "$12,34",
    ])


def sec_metadata():
    lines = [f"{rng.choice(['id', 'name', 'version', 'owner', 'region'])}: {val()}"
             for _ in range(rng.randint(2, 5))]
    return rng.choice(["METADATA", "Metadata Header", "KEY-VALUE PAIRS"]), "\n".join(lines)


def sec_json():
    keys = rng.sample(["sku", "price", "active", "n"], rng.randint(2, 4))
    body = ", ".join(
        f'"{k}": ' + rng.choice([str(rng.randint(1, 99)), f'"{words(1, 2)}"', "true", "null"])
        for k in keys)
    obj = "{" + body + "}"
    if rng.random() < 0.4:  # malformed variants exercise fix_json/extract
        obj = rng.choice([
            obj[:-1] + ",}",
            obj.replace('"', "'", 2),
            "{mode: 'fast', level: %d}" % rng.randint(1, 9),
        ])
    return rng.choice(["JSON DATA", "json payload"]), obj


def sec_table():
    cols = [words(1, 1).capitalize() for _ in range(rng.randint(2, 3))]
    head = "".join(f"<th>{c}</th>" for c in cols)
    rows = "".join(
        "<tr>" + "".join(f"<td>{rng.choice([words(1, 1), str(rng.randint(0, 99)), 'yes', 'N/A'])}</td>"
                         for _ in cols) + "</tr>"
        for _ in range(rng.randint(1, 3)))
    return rng.choice(["HTML TABLE", "Data Table"]), f"<table><tr>{head}</tr>{rows}</table>"


def sec_csv():
    cols = ["name", "qty", "code"][: rng.randint(2, 3)]
    lines = [",".join(cols)]
    for _ in range(rng.randint(1, 3)):
        lines.append(",".join(rng.choice([words(1, 1), str(rng.randint(0, 999)), "N/A", "true"])
                              for _ in cols))
    return rng.choice(["CSV EXPORT", "csv dump"]), "\n".join(lines)


def sec_sql():
    return rng.choice(["SQL CODE", "Code Block"]), \
        f"SELECT id FROM t WHERE k = {rng.randint(1, 99)};"


def sec_ocr():
    return "OCR SCAN", (
        f"l0cation: {words(1, 2)}\n"
        f"amount: one hundred and twenty\nnote: {words(2, 4)}")


def sec_other():
    title = rng.choice(["Extra Notes!", "Misc Section", "User Profile"])
    body = rng.choice([
        f"phone: (555) 123-4567 email {words(1, 2)}@example.com",
        f"{words(4, 10)} https://example.com/{words(1, 1)} price $4,99",
        "\n".join(f"{rng.choice(['k1', 'key2', 'setting'])}: {val()}"
                  for _ in range(rng.randint(2, 3))),
    ])
    return title, body


def sec_jsonld():
    # dispatch checks for script tags BEFORE the title class is applied
    body = '{"@context": "https://schema.org", "@type": "Thing", "name": "%s", "n": %d}' % (
        words(1, 2), rng.randint(1, 99))
    return rng.choice(["JSON DATA", "Embedded Block"]), \
        f'<script type="application/ld+json">{body}</script>'


def sec_js():
    obj = "{mode: '%s', level: %d}" % (words(1, 1), rng.randint(1, 9))
    return rng.choice(["Config Script", "JSON SNIPPET"]), f"var config = {obj};"


def sec_table_mismatch():
    # arity-mismatched rows are dropped by the HTMLTableParser port
    return "DATA TABLE", ("<table><tr><th>A</th><th>B</th></tr>"
                          "<tr><td>1</td></tr>"
                          "<tr><td>2</td><td>3</td></tr></table>")


UNI_WORDS = ["café", "naïve", "übel", "señor", "résumé", "åres", "中文键"]


def sec_unicode():
    # non-ASCII WORD chars (BMP): Python's \w matches 'é'/'中' — the
    # port's clean_key / bare-key / kv-line / pair-extraction regexes
    # compile with UNICODE_CHARACTER_CLASS; these sections pin that
    w = lambda: rng.choice(UNI_WORDS)
    kind = rng.randint(0, 3)
    if kind == 0:  # metadata kv with unicode keys -> clean_key path
        return "METADATA", "\n".join(
            f"{w()}: {rng.choice([str(rng.randint(1, 99)), words(1, 2), w()])}"
            for _ in range(rng.randint(2, 4)))
    if kind == 1:  # malformed JSON with unicode bare keys -> fix_json
        return "JSON DATA", "{%s: '%s', nivel: %d}" % (w(), w(), rng.randint(1, 9))
    if kind == 2:  # unicode keys through extract_json_pairs
        return "JSON DATA", '{"%s": %d, "%s": "x" broken' % (w(), rng.randint(1, 99), w())
    return f"Notes {w()}", f"texte {w()} {words(3, 7)} contact: {w()} fin"


SECTIONS = [sec_metadata, sec_json, sec_table, sec_csv, sec_sql, sec_ocr,
            sec_other, sec_jsonld, sec_js, sec_table_mismatch, sec_unicode]


def gen_sectioned():
    n = rng.randint(2, 5)
    parts = []
    for k in range(n):
        title, body = rng.choice(SECTIONS)()
        parts.append(f"{title}\n{body}")
    return "\n--- ".join(parts)


def gen_single():
    _, body = rng.choice(SECTIONS)()
    return body


def main():
    docs, skipped = [], 0
    i = 0
    while len(docs) < 140:
        i += 1
        text = gen_sectioned() if len(docs) % 3 != 2 else gen_single()
        try:
            parsed = ref.DataConverter().parse(text)
            json.dumps(parsed)  # must be serializable
        except Exception:
            skipped += 1
            continue
        docs.append({"id": len(docs), "text": text, "parsed": parsed})
    path = OUT
    with open(path, "w") as f:
        json.dump({"seed": SEED, "docs": docs}, f, indent=1)
    keys = sum(len(d["parsed"]) if isinstance(d["parsed"], dict) else 1 for d in docs)
    print(f"wrote {path}: {len(docs)} docs ({skipped} crashed in reference, skipped), "
          f"{keys} top-level keys")


if __name__ == "__main__":
    sys.exit(main())
