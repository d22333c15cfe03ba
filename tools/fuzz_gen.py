#!/usr/bin/env python3
"""Differential-fixture generator (dev-only, like oracle_check.py).

Composes seeded random messy documents from fragment-shaped pieces,
executes the READ-ONLY reference parser on each
(/root/reference/etl_parser.py parse_file), and writes the observed
fragments/summary/records to src/test/resources/fuzz_detector.json.
bs4 is not installed in this container, so a minimal stdlib-html.parser
stand-in (below) provides the three calls the reference makes; on the
simple well-formed markup generated here it is behavior-identical.
The committed fixture is DATA produced by running the reference — the
Scala FuzzDifferentialSpec replays the same documents through the port
and must reproduce every span byte-for-byte.

Regenerate with:  python3 tools/fuzz_gen.py
"""
import importlib.util
import json
import random
import sys
import types
from html.parser import HTMLParser


# ---- minimal bs4 stand-in (bs4 is not installed here; the reference only
# calls find/find_all/get_text on well-formed markup, where this stdlib
# tree builder behaves identically) --------------------------------------
class _Node:
    def __init__(self, name):
        self.name = name
        self.children = []  # _Node or str

    def find_all(self, names):
        names = [names] if isinstance(names, str) else list(names)
        out = []

        def walk(n):
            for c in n.children:
                if isinstance(c, _Node):
                    if c.name in names:
                        out.append(c)
                    walk(c)
        walk(self)
        return out

    def find(self, name):
        hits = self.find_all(name)
        return hits[0] if hits else None

    def get_text(self, strip=False):
        parts = []

        def walk(n):
            for c in n.children:
                if isinstance(c, _Node):
                    walk(c)
                else:
                    parts.append(c)
        walk(self)
        if strip:
            return "".join(p.strip() for p in parts if p.strip())
        return "".join(parts)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag)
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_endtag(self, tag):
        for k in range(len(self.stack) - 1, 0, -1):
            if self.stack[k].name == tag:
                del self.stack[k:]
                break

    def handle_data(self, data):
        self.stack[-1].children.append(data)


def _fake_soup(markup, parser=None):
    b = _TreeBuilder()
    b.feed(markup)
    return b.root


_bs4 = types.ModuleType("bs4")
_bs4.BeautifulSoup = _fake_soup
sys.modules["bs4"] = _bs4

spec = importlib.util.spec_from_file_location("etl_parser", "/root/reference/etl_parser.py")
ref = importlib.util.module_from_spec(spec)
sys.modules["etl_parser"] = ref  # @dataclass resolves its module via sys.modules
spec.loader.exec_module(ref)

# optional: fuzz_gen.py [seed] [output_path] — defaults regenerate the
# committed fixture; alternate seeds pair with `Test/runMain graft.FuzzCheck`
SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 20260812
OUT = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/fuzz_detector.json"
rng = random.Random(SEED)

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
         "omicron pi rho sigma tau upsilon phi chi psi omega data value record").split()


def words(a, b):
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(a, b)))


def piece_json():
    keys = rng.sample(["id", "name", "price", "tags", "meta", "ok"], rng.randint(2, 4))
    parts = []
    for k in keys:
        v = rng.choice([
            str(rng.randint(0, 999)),
            f'"{words(1, 2)}"',
            str(round(rng.uniform(0, 99), 2)),
            "true", "false", "null",
            '["a", "b"]',
            '{"x": 1, "y": "z"}',
            '"brace } inside"',
        ])
        parts.append(f'"{k}": {v}')
    return "{" + ", ".join(parts) + "}"


def piece_malformed():
    return rng.choice([
        "{'state': 'on', 'n': %d,}" % rng.randint(1, 99),
        '{"a": 1, "b": 2,}',
        "{mode: 'fast', level: %d}" % rng.randint(1, 9),
        '{"x": 01, "y": "ok"}',
        '{unquoted: yes, other: "%s"}' % words(1, 2),
    ])


def piece_json_ld():
    return ('<script type="application/ld+json">\n'
            + rng.choice([piece_json(), piece_malformed()])
            + "\n</script>")


def piece_yaml():
    lines = [f"{rng.choice(['title', 'author', 'date', 'layout', 'tag'])}: {words(1, 3)}"
             for _ in range(rng.randint(2, 5))]
    return "---\n" + "\n".join(lines) + "\n---"


def piece_sectioned():
    return f"--- {rng.choice(['USERS', 'CONFIG', 'METRICS'])}\n{piece_json()}"


def piece_html_table():
    cols = [words(1, 1).capitalize() for _ in range(rng.randint(2, 3))]
    ent = rng.choice(["A&amp;B", "x &lt; y", "plain"])
    head = "".join(f"<th>{c}</th>" for c in cols)
    rows = []
    for _ in range(rng.randint(1, 3)):
        cells = [rng.choice([words(1, 2), str(rng.randint(0, 99)), ent]) for _ in cols]
        rows.append("<tr>" + "".join(f"<td>{c}</td>" for c in cells) + "</tr>")
    if rng.random() < 0.4:  # thead variant: exercises the reference's
        # header-row-also-data quirk in _html_table_to_rows
        return f"<table><thead><tr>{head}</tr></thead>{''.join(rows)}</table>"
    return f"<table><tr>{head}</tr>{''.join(rows)}</table>"


def piece_html_block():
    return f"<div class=\"card\"><p>{words(3, 8)}</p><span>{words(1, 3)}</span></div>"


def piece_csv():
    delim = rng.choice([",", ","])
    header = rng.random() < 0.7
    cols = ["name", "qty", "code"][: rng.randint(2, 3)]
    lines = []
    if header:
        lines.append(delim.join(cols))
    for _ in range(rng.randint(2, 4)):
        lines.append(delim.join(
            rng.choice([words(1, 1), str(rng.randint(0, 999)), "N/A", "1,5" if delim != "," else "x"])
            for _ in cols))
    return "\n".join(lines)


def piece_kv():
    sep = rng.choice([": ", ": ", " = "])
    lines = [f"{rng.choice(['host', 'port', 'user', 'retries', 'mode'])}{sep}"
             + rng.choice([words(1, 2), str(rng.randint(0, 9999)), '"quoted value"'])
             for _ in range(rng.randint(3, 5))]
    return "\n".join(lines)


def piece_js():
    return f"var config = {rng.choice([piece_json(), piece_malformed()])};"


def piece_sql():
    return rng.choice([
        f"SELECT id, name FROM users WHERE id = {rng.randint(1, 99)};",
        f"INSERT INTO logs (msg) VALUES ('{words(1, 3)}');",
        f"UPDATE t SET n = {rng.randint(1, 99)} WHERE k = 'a';",
        f"DELETE FROM cache WHERE ts < {rng.randint(1000, 9999)};",
    ])


def piece_raw():
    return words(6, 20) + rng.choice([".", "!", ""])


# ---- adversarial pieces: reference paths the plain pieces never hit ----

def piece_sectioned_json():
    # '--- <HEADER with JSON>' boundary (etl_parser detect_sectioned_jsons)
    header = rng.choice(["USERS JSON", "JSON CONFIG", "RAW JSON DUMP"])
    body = rng.choice([piece_json(), piece_malformed()])
    return f"--- {header}\n{body}"


def piece_unclosed():
    # unclosed brace -> MALFORMED_JSON 'unclosed' heuristic (conf 0.35)
    return '{"%s": %d, "state": "open"' % (words(1, 1), rng.randint(1, 99))


def piece_csv_alt():
    # ';' and tab delimiters + headerless numeric-first variant
    d = rng.choice([";", "\t"])
    headerless = rng.random() < 0.5
    lines = []
    if not headerless:
        lines.append(d.join(["name", "qty"]))
    for _ in range(rng.randint(2, 4)):
        lines.append(d.join([str(rng.randint(0, 999)), words(1, 1)]))
    return "\n".join(lines)


def piece_yaml_low_colon():
    # frontmatter with <=50% colon lines -> conf 0.6 branch
    lines = [f"title: {words(1, 2)}"] + [words(2, 4) for _ in range(3)]
    return "---\n" + "\n".join(lines) + "\n---"


def piece_sql_comment():
    # leading '--' comment form of the SQL regex
    return f"-- latest rows\nSELECT * FROM t LIMIT {rng.randint(1, 9)};"


def piece_brace_in_string():
    # braces inside JSON strings exercise the string-aware span scan
    return '{"expr": "if (x) { y } else { z }", "n": %d}' % rng.randint(1, 99)


UNI_WORDS = ["café", "naïve", "übel", "señor", "résumé", "åres", "中文键"]


def piece_unicode():
    # non-ASCII WORD chars (BMP only): Python's \w matches 'é'/'中',
    # Java's default \w does not — the port compiles its \w patterns
    # with UNICODE_CHARACTER_CLASS, and these documents pin that. KV
    # keys, malformed-JSON bare keys and unclosed tails all route
    # through \w heuristics in the reference.
    w = lambda: rng.choice(UNI_WORDS)
    return rng.choice([
        f"{w()}: {rng.randint(1, 99)}\n{w()} = {words(1, 2)}\n{w()}: {w()}",
        "{%s: 'on', autre: %d,}" % (w(), rng.randint(1, 99)),
        '{"%s": %d, "mode"' % (w(), rng.randint(1, 99)),  # unclosed
        f"--- RÉSUMÉ JSON\n" + '{"%s": %d}' % (w(), rng.randint(1, 9)),
        f"texte {w()} {words(4, 9)} {w()} fin.",
    ])


ADVERSARIAL = [piece_sectioned_json, piece_unclosed, piece_csv_alt,
               piece_yaml_low_colon, piece_sql_comment, piece_brace_in_string,
               piece_unicode]

PIECES = [piece_json, piece_malformed, piece_json_ld, piece_sectioned,
          piece_html_table, piece_html_block, piece_csv, piece_kv,
          piece_js, piece_sql, piece_raw, piece_raw]


def gen_doc(adversarial=False):
    n = rng.randint(3, 8)
    parts = []
    if rng.random() < 0.25:
        parts.append(piece_yaml())
    pool = PIECES + (ADVERSARIAL * 2 if adversarial else [])
    parts += [rng.choice(pool)() for _ in range(n)]
    return "\n\n".join(parts)


def main():
    docs = []
    for i in range(160):
        text = gen_doc(adversarial = i >= 80)
        out = ref.parse_file(text)
        docs.append({
            "id": i,
            "text": text,
            "fragments": [
                {"format_type": b.format_type, "start": b.start_index,
                 "end": b.end_index, "confidence": round(b.confidence, 6)}
                for b in out["fragments"]],
            "summary": out["summary"],
            # record identity AND payload: which fragments normalized,
            # and to what (compared structurally on the Scala side)
            "records": [{"format": r["format"], "start": r["start"],
                         "end": r["end"], "data": r["data"]}
                        for r in out["records"]],
        })
    path = OUT
    with open(path, "w") as f:
        json.dump({"seed": SEED, "docs": docs}, f, indent=1)
    total = sum(len(d["fragments"]) for d in docs)
    fmts = {}
    for d in docs:
        for k, v in d["summary"].items():
            fmts[k] = fmts.get(k, 0) + v
    print(f"wrote {path}: {len(docs)} docs, {total} fragments, formats={fmts}")


if __name__ == "__main__":
    sys.exit(main())
