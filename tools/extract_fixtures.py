"""Extract the reference's Jest E2E cases into a JSON fixture corpus.

Reads /root/reference/test/RdfParser-test.ts (input HTML + expected quads
are embedded inline there; helper ``parse()`` at :3507-3509, matcher is
bnode-invariant ``toBeRdfIsomorphic``) and writes one JSON object per case
to tests/fixtures/corpus.json.  This ports the *expectations*, not code:
the corpus is the correctness gate for our from-scratch evaluator
(FIXTURES.md §2).

Usage: python tools/extract_fixtures.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

SRC = Path("/root/reference/test/RdfParser-test.ts")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "corpus.json"

text = SRC.read_text()


def lex_js(s: str, start: int, stop_at_depth: int = 0):
    """Scan from ``start`` (must be at an opening bracket) to its match.

    Understands '...', "...", `...`, // and /* */ comments.  Returns the
    index just past the matching close bracket.
    """
    depth = 0
    i = start
    n = len(s)
    opens = "([{"
    closes = ")]}"
    while i < n:
        c = s[i]
        if c in opens:
            depth += 1
        elif c in closes:
            depth -= 1
            if depth == stop_at_depth:
                return i + 1
        elif c in "'\"`":
            quote = c
            i += 1
            while i < n:
                if s[i] == "\\":
                    i += 2
                    continue
                if s[i] == quote:
                    break
                i += 1
        elif c == "/" and i + 1 < n:
            if s[i + 1] == "/":
                i = s.find("\n", i)
                if i < 0:
                    return n
            elif s[i + 1] == "*":
                i = s.find("*/", i) + 1
        i += 1
    return n


def parse_js_string_expr(expr: str, consts: dict[str, str]) -> str | None:
    """Evaluate a JS expression made of string literals joined by '+',
    with identifier substitution from ``consts``."""
    i, n = 0, len(expr)
    parts: list[str] = []
    expect_operand = True
    while i < n:
        c = expr[i]
        if c.isspace() or c == "\n":
            i += 1
            continue
        if c == "+":
            expect_operand = True
            i += 1
            continue
        if c in "'\"`":
            j = i + 1
            buf = []
            while j < n:
                if expr[j] == "\\":
                    nxt = expr[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
                    j += 2
                    continue
                if expr[j] == c:
                    break
                if c == "`" and expr[j] == "$" and j + 1 < n and expr[j + 1] == "{":
                    k = expr.find("}", j)
                    name = expr[j + 2:k].strip()
                    if name not in consts:
                        return None
                    buf.append(consts[name])
                    j = k + 1
                    continue
                buf.append(expr[j])
                j += 1
            parts.append("".join(buf))
            i = j + 1
            expect_operand = False
            continue
        m = re.match(r"[A-Za-z_$][\w$]*", expr[i:])
        if m:
            name = m.group(0)
            if name in consts:
                parts.append(consts[name])
                i += m.end()
                expect_operand = False
                continue
            return None
        return None
    return "".join(parts)


def split_top_level_args(s: str) -> list[str]:
    """Split a JS argument list on top-level commas."""
    args, depth, i, start = [], 0, 0, 0
    n = len(s)
    while i < n:
        c = s[i]
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c in "'\"`":
            quote = c
            i += 1
            while i < n:
                if s[i] == "\\":
                    i += 2
                    continue
                if s[i] == quote:
                    break
                i += 1
        elif c == "," and depth == 0:
            args.append(s[start:i])
            start = i + 1
        i += 1
    tail = s[start:].strip()
    if tail:
        args.append(tail)
    return args


def parse_options(obj_src: str, consts: dict) -> dict | None:
    """Parse a `new RdfaParser({ ... })` object literal."""
    opts: dict = {}
    body = obj_src.strip()
    assert body.startswith("{") and body.endswith("}"), body
    for entry in split_top_level_args(body[1:-1]):
        entry = entry.strip()
        if not entry:
            continue
        m = re.match(r"^([A-Za-z_$][\w$]*)\s*:\s*(.*)$", entry, re.S)
        if m:
            key, value = m.group(1), m.group(2).strip()
        else:
            key = value = entry  # shorthand `features`
        if key in ("baseIRI", "profile", "contentType", "vocab", "language"):
            parsed = parse_js_string_expr(value, consts)
            if parsed is None:
                return None
            opts[key] = parsed
        elif key == "features":
            if value == "features" or value == key == "features" and value in consts:
                value = consts.get("__features_obj__", value)
            if not value.startswith("{"):
                value = consts.get("__features_obj__")
                if value is None:
                    return None
            feats = {}
            for fentry in split_top_level_args(value.strip()[1:-1]):
                fentry = fentry.strip()
                if not fentry:
                    continue
                fm = re.match(r"^([A-Za-z_$][\w$]*)\s*:\s*(true|false)$", fentry)
                if not fm:
                    return None
                feats[fm.group(1)] = fm.group(2) == "true"
            opts["features"] = feats
        elif key == "htmlParseListener":
            continue  # listener does not affect triples
        else:
            return None  # dataFactory / defaultGraph cases: skip
    return opts


# --- walk all it(...) blocks -------------------------------------------------

cases = []
skipped = []

DEFAULT_OPTS = {"baseIRI": "http://example.org/"}

for m in re.finditer(r"\bit\('((?:[^'\\]|\\.)*)',\s*async\(\)\s*=>\s*\{", text):
    name = m.group(1).replace("\\'", "'")
    body_start = text.index("{", m.end() - 1)
    body_end = lex_js(text, body_start)
    body = text[body_start:body_end]
    line = text[:m.start()].count("\n") + 1

    # constants defined in the body (e.g. `const attrs = '...'`)
    consts: dict[str, str] = {}
    for cm in re.finditer(r"const\s+([A-Za-z_$][\w$]*)\s*=\s*((?:'(?:[^'\\]|\\.)*'|`(?:[^`\\]|\\.)*`)(?:\s*\+\s*(?:'(?:[^'\\]|\\.)*'|`(?:[^`\\]|\\.)*`))*)", body):
        value = parse_js_string_expr(cm.group(2), consts)
        if value is not None:
            consts[cm.group(1)] = value
    fm = re.search(r"const\s+features\s*=\s*(\{[^}]*\})", body)
    if fm:
        consts["__features_obj__"] = fm.group(1)

    # parser override inside the it-body?
    opts = dict(DEFAULT_OPTS)
    pm = re.search(r"parser\s*=\s*new RdfaParser\(", body)
    if pm:
        ostart = body.index("(", pm.end() - 1)
        oend = lex_js(body, ostart)
        parsed = parse_options(body[ostart + 1:oend - 1], consts)
        if parsed is None:
            skipped.append((line, name, "unparseable options"))
            continue
        opts = parsed

    # the parse(parser, `...`) call
    sm = re.search(r"parse\(parser,\s*", body)
    if not sm:
        skipped.append((line, name, "no parse() call"))
        continue
    i = sm.end()
    if body[i] != "`":
        skipped.append((line, name, "non-template input"))
        continue
    j = i + 1
    while j < len(body):
        if body[j] == "\\":
            j += 2
            continue
        if body[j] == "`":
            break
        j += 1
    html = parse_js_string_expr(body[i:j + 1], consts)
    if html is None:
        skipped.append((line, name, "template with unknown interpolation"))
        continue

    # the expected quads
    em = re.search(r"\.toBeRdfIsomorphic\(\s*\[", body)
    if not em:
        skipped.append((line, name, "no toBeRdfIsomorphic"))
        continue
    astart = body.index("[", em.end() - 1)
    aend = lex_js(body, astart)
    arr_src = body[astart + 1:aend - 1]
    quads = []
    ok = True
    for qm in re.finditer(r"\bquad\(", arr_src):
        qstart = arr_src.index("(", qm.end() - 1)
        qend = lex_js(arr_src, qstart)
        args = split_top_level_args(arr_src[qstart + 1:qend - 1])
        if len(args) != 3:
            ok = False
            break
        terms = [parse_js_string_expr(a.strip(), consts) for a in args]
        if any(t is None for t in terms):
            ok = False
            break
        quads.append(terms)
    if not ok:
        skipped.append((line, name, "unparseable quads"))
        continue

    cases.append({
        "name": name,
        "source": f"test/RdfParser-test.ts:{line}",
        "options": opts,
        "html": html,
        "expected": quads,
    })

OUT.parent.mkdir(parents=True, exist_ok=True)
OUT.write_text(json.dumps(cases, indent=1))
print(f"extracted {len(cases)} cases -> {OUT}")
print(f"skipped {len(skipped)}:")
for line, name, why in skipped:
    print(f"  :{line} {name!r} ({why})")
