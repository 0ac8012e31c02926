"""Public API surface tests: streaming writes, direct SAX API, listener
hook, per-document isolation (reference RdfaParser.ts:68-85, README
'direct SAX API', IHtmlParseListener)."""

import pytest

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


def test_content_type_selects_profile():
    """Constructor contentType → profile (RdfaParser.ts:944-958 via
    Util.ts:137-139): XML content types get the expat tokenizer and
    case-preserving behavior."""
    from rdfa_streaming_parser_js_ray.core.parser import RdfaParser
    from rdfa_streaming_parser_js_ray.core.tokenizer import (
        FastHtmlTokenizer, XmlTokenizer,
    )

    p_xml = RdfaParser(base_iri="http://e.org/",
                       content_type="application/xml")
    assert isinstance(p_xml._tokenizer, XmlTokenizer)
    assert p_xml.evaluator.profile == "xml"
    p_html = RdfaParser(base_iri="http://e.org/", content_type="text/html")
    assert isinstance(p_html._tokenizer, FastHtmlTokenizer)
    assert p_html.evaluator.profile == "html"


def test_emit_triple_validity_gate():
    """emitTriple drops triples containing an invalid IRI term
    (test/RdfParser-test.ts:96-124): valid terms emit, an invalid
    subject/predicate/object suppresses the whole triple silently."""
    from rdfa_streaming_parser_js_ray.core.evaluator import RdfaEvaluator
    from rdfa_streaming_parser_js_ray.core.terms import NamedNode

    ev = RdfaEvaluator(base_iri="http://example.org/")
    ev.emit_triple(NamedNode("http://s"), NamedNode("http://p"),
                   NamedNode("http://o"))
    assert len(ev.triples) == 1
    for s, p, o in (("s", "http://p", "http://o"),
                    ("http://s", "p", "http://o"),
                    ("http://s", "http://p", "o")):
        ev.emit_triple(NamedNode(s), NamedNode(p), NamedNode(o))
    assert len(ev.triples) == 1


def test_errors_in_sax_callbacks_propagate():
    """A throwing SAX callback surfaces to the caller instead of being
    swallowed (test/RdfParser-test.ts:125-173) — per-document isolation
    (catching per doc) is the extraction stage's job, not the parser's."""
    from rdfa_streaming_parser_js_ray.core.parser import RdfaParser

    html = '<html><body><h2 property="http://purl.org/dc/terms/title">T</h2></body></html>'
    for method in ("on_tag_open", "on_text", "on_tag_close", "on_end"):
        p = RdfaParser(base_iri="http://example.org/")
        def boom(*a, **k):
            raise RuntimeError("Dummy error")
        setattr(p.evaluator, method, boom)
        with pytest.raises(RuntimeError, match="Dummy error"):
            p.write(html)
            p.end()


def test_base_without_href_keeps_base_iri():
    """<base /> without href must not clobber the baseIRI
    (test/RdfParser-test.ts:325-338)."""
    from rdfa_streaming_parser_js_ray.core.parser import RdfaParser

    p = RdfaParser(base_iri="http://example.org/")
    p.write('<html><head><base /></head>'
            '<body prefix="dc: http://purl.org/dc/terms/">'
            '<div property="dc:title" resource="img.jpg"></div></body></html>')
    p.end()
    assert p.evaluator.base_iri == "http://example.org/"
    assert any(o.value == "http://example.org/img.jpg"
               for _, _, o in p.triples)


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


def test_fast_path_completes_incomplete_triples_via_head_body_inherit():
    """A bare <head>/<body> under an element with a pending @rel completes
    the incomplete triple through the fast path (head/body subject
    inheritance), identically to the full processing sequence — each child
    that establishes a subject completes the parent's incompletes."""
    from rdfa_streaming_parser_js_ray.core import evaluator as ev_mod
    from rdfa_streaming_parser_js_ray.core.parser import RdfaParser

    html = ('<html rel="http://ex.org/p"><head class="c"><title>t</title>'
            '</head><body class="c" about="http://ex.org/me"><p>x</p>'
            '</body></html>')

    def run():
        p = RdfaParser(base_iri="http://e.org/", profile="html")
        p.write(html)
        p.end()
        return p.triples

    fast = run()
    saved = ev_mod._RDFA_RELEVANT_ATTRS
    try:
        ev_mod._RDFA_RELEVANT_ATTRS = saved | {"class"}
        full = run()
    finally:
        ev_mod._RDFA_RELEVANT_ATTRS = saved
    assert fast == full
    # both head (inherited bnode object) and body (about) complete the rel
    assert [(s.value, p.value) for s, p, _ in fast] == \
        [("http://e.org/", "http://ex.org/p")] * 2
    assert fast[1][2].value == "http://ex.org/me"


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
