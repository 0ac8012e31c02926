"""Public API surface tests: streaming writes, direct SAX API, listener
hook, per-document isolation (reference RdfaParser.ts:68-85, README
'direct SAX API', IHtmlParseListener)."""

from rdfa_streaming_parser_js_ray.core.parser import (
    HtmlParseListener, RdfaParser, parse_rdfa,
)
from rdfa_streaming_parser_js_ray.core.terms import Literal, NamedNode

DOC = """<html>
<head></head>
<body>
    <h2 about="http://example2.org/" property="http://purl.org/dc/terms/title">The Trouble with Bob</h2>
</body>
</html>"""


def test_fast_path_equivalent_to_full_sequence():
    """Tags with only RDFa-irrelevant attributes (class/id/style) take the
    inheritance fast path; forcing them through the full processing
    sequence (by making 'class'/'id'/... \"relevant\") must not change any
    emitted triple on a corpus that mixes plain and annotated markup."""
    from rdfa_streaming_parser_js_ray.core import evaluator as ev_mod
    from rdfa_streaming_parser_js_ray.core.parser import RdfaParser
    from rdfa_streaming_parser_js_ray.sources.documents import synthesize_documents

    tbl = synthesize_documents(60, seed=99)
    docs = ["".join(s["text"] for s in row["spans"] if s["kind"] == "text")
            for row in tbl.to_pylist()]

    def run():
        out = []
        for i, html in enumerate(docs):
            p = RdfaParser(base_iri=f"http://e.org/d{i}")
            p.write(html)
            p.end()
            out.append(p.triples)
        return out

    fast = run()
    saved = ev_mod._RDFA_RELEVANT_ATTRS
    try:
        ev_mod._RDFA_RELEVANT_ATTRS = saved | {"class", "id", "style", "title"}
        full = run()
    finally:
        ev_mod._RDFA_RELEVANT_ATTRS = saved
    assert fast == full


def test_chunked_write_equals_single_shot():
    whole = parse_rdfa(DOC, base_iri="http://example.org/")
    for chunk_size in (1, 3, 7, 100):
        parser = RdfaParser(base_iri="http://example.org/")
        for i in range(0, len(DOC), chunk_size):
            parser.write(DOC[i:i + chunk_size])
        parser.end()
        assert parser.triples == whole, f"chunk_size={chunk_size}"


def test_listener_receives_events():
    """Mirrors RdfParser-test.ts:3431-3460 (listener call counts)."""
    class Recorder(HtmlParseListener):
        def __init__(self):
            self.opens, self.texts, self.closes, self.ends = [], [], [], 0

        def on_tag_open(self, name, attributes):
            self.opens.append((name, dict(attributes)))

        def on_text(self, data):
            self.texts.append(data)

        def on_tag_close(self):
            self.closes.append(1)

        def on_end(self):
            self.ends += 1

    rec = Recorder()
    parser = RdfaParser(base_iri="http://example.org/", html_parse_listener=rec)
    parser.write(DOC)
    parser.end()
    assert [n for n, _ in rec.opens] == ["html", "head", "body", "h2"]
    assert rec.opens[3][1] == {"about": "http://example2.org/",
                               "property": "http://purl.org/dc/terms/title"}
    assert len(rec.closes) == 4
    assert "The Trouble with Bob" in rec.texts
    assert rec.ends == 1
    assert parser.triples == [(NamedNode("http://example2.org/"),
                               NamedNode("http://purl.org/dc/terms/title"),
                               Literal("The Trouble with Bob"))]


def test_direct_sax_api():
    """Bring-your-own-tokenizer path (reference README.md:170-176)."""
    parser = RdfaParser(base_iri="http://example.org/")
    parser.on_tag_open("html", {})
    parser.on_tag_open("p", {"property": "http://ex.org/p"})
    parser.on_text("hello")
    parser.on_tag_close()
    parser.on_tag_close()
    parser.on_end()
    assert parser.triples == [(NamedNode("http://example.org/"),
                               NamedNode("http://ex.org/p"), Literal("hello"))]


def test_fresh_parser_isolation():
    """import() semantics: each document gets a fresh evaluator; state
    (base overrides, bnode counters, patterns) never leaks."""
    doc1 = '<html><head><base href="http://other.com/"/></head>' \
           '<body><p property="http://ex.org/p" resource="x">v</p></body></html>'
    out1 = parse_rdfa(doc1, base_iri="http://example.org/")
    out2 = parse_rdfa('<p about="_:b" property="http://ex.org/p">v</p>',
                      base_iri="http://example.org/")
    out3 = parse_rdfa(doc1, base_iri="http://example.org/")
    assert out1 == out3
    assert out1[0][0].value == "http://other.com/"
    assert out2[0][0].value == "b"


def test_emit_callback():
    got = []
    parser = RdfaParser(base_iri="http://example.org/",
                        emit=lambda s, p, o: got.append((s, p, o)))
    parser.write(DOC)
    parser.end()
    assert len(got) == 1 and parser.triples == []
