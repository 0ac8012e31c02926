"""Generate tests/fixtures/w3c_style.json — a spec-derived RDFa 1.1
conformance corpus in the shape of the W3C test suite's HTML5 / XHTML5 /
SVG profile manifests, plus the legacy HTML4 / XHTML1 / RDFa-1.0-variant
manifests the reference also runs (spec-html4 / spec-xhtml1 /
spec-1-xhtml1 / spec-1-svg in /root/reference/package.json).

The real W3C manifests are fetched over the network by the reference's
conformance harness (/root/reference/package.json:51-79); this sandbox has
no network access, so the manifests cannot be vendored here.  These cases
are hand-derived from the public RDFa Core 1.1 / HTML+RDFa 1.1 processing
sequence (the same rules the reference implements at
/root/reference/lib/RdfaParser.ts:87-755) and mirror the behaviors the
classic suite exercises per profile: CURIE/safe-CURIE expansion, @vocab,
term resolution, initial contexts, @about/@resource/@href/@src chaining,
@typeof, @rel/@rev (incl. incomplete-triple completion), @content,
@datatype, language inheritance, @inlist lists, <base>, <time>/@datetime,
rdfa:Pattern copies, xmlns: mappings, xml:base, and XML-mode case
sensitivity.

Expectations use the same compact term syntax as corpus.json; the
companion test (tests/test_w3c_style.py) computes per-profile pass counts
and corpus-level triple precision/recall against the BASELINE.json gate
(P/R >= 0.95).
"""

from __future__ import annotations

import json
from pathlib import Path

B = "http://rdfa.example.org/doc"          # baseIRI used by every case
DC = "http://purl.org/dc/terms/"
FOAF = "http://xmlns.com/foaf/0.1/"
SCHEMA = "http://schema.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFA = "http://www.w3.org/ns/rdfa#"
XHV = "http://www.w3.org/1999/xhtml/vocab#"

PREFIXES = f"dc: {DC} foaf: {FOAF} ex: http://example.org/vocab#"
EX = "http://example.org/vocab#"

CASES: list[dict] = []


def case(name: str, profile: str, html: str, expected: list[list[str]],
         label: str | None = None, **opts):
    options = {"baseIRI": B}
    if profile:
        options["profile"] = profile
    options.update(opts)
    CASES.append({"name": name, "source": "spec-derived (W3C-suite style)",
                  "profile_label": label or
                  {"html": "html5", "xhtml": "xhtml5",
                   "xml": "svg"}.get(profile, profile or "html5"),
                  "options": options, "html": html, "expected": expected})


# ----------------------------------------------------------- html5 cases --

case("predicate establishment with @property", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<h1 property="dc:title">The Title</h1></body></html>',
     [[B, DC + "title", '"The Title"']])

case("@about sets a resolved subject", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#me"><span property="foaf:name">Alice</span></div>'
     '</body></html>',
     [[B + "#me", FOAF + "name", '"Alice"']])

case("@rel with @href emits an object triple", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#me" rel="foaf:homepage" href="http://example.net/home">h</a>'
     '</body></html>',
     [[B + "#me", FOAF + "homepage", "http://example.net/home"]])

case("@rev reverses subject and object", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#me" rev="foaf:knows" href="#bob">b</a>'
     '</body></html>',
     [[B + "#bob", FOAF + "knows", B + "#me"]])

case("@typeof with @about emits rdf:type", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#me" typeof="foaf:Person"></div></body></html>',
     [[B + "#me", RDF + "type", FOAF + "Person"]])

case("@typeof without @about types a blank node shared by children", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div typeof="foaf:Person"><span property="foaf:name">Alice</span></div>'
     '</body></html>',
     [["_:b0", RDF + "type", FOAF + "Person"],
      ["_:b0", FOAF + "name", '"Alice"']])

case("@content overrides element text", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="dc:title" content="Real Title">ignored text</span>'
     '</body></html>',
     [[B, DC + "title", '"Real Title"']])

case("@datatype types the literal", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="ex:count" datatype="http://www.w3.org/2001/XMLSchema#integer">3</span>'
     '</body></html>',
     [[B, EX + "count", f'"3"^^{XSD}integer']])

case("@lang is inherited onto literals", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div lang="en"><span property="dc:title">Title</span></div>'
     '</body></html>',
     [[B, DC + "title", '"Title"@en']])

case("inner @lang overrides outer", "html",
     f'<html><body prefix="{PREFIXES}" lang="en">'
     '<span property="dc:title" lang="fr">Titre</span>'
     '</body></html>',
     [[B, DC + "title", '"Titre"@fr']])

# createLiteral lowercases the language tag at literal creation
# (reference Util.ts:212 — activeTag.language?.toLowerCase()); the raw
# attribute case never reaches the emitted term.
case("mixed-case @lang is lowercased on the literal", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="#s" property="ex:p" lang="EN-us">x</span>'
     '<span about="#s" property="ex:q" xml:lang="PT-BR">y</span>'
     '</body></html>',
     [[B + "#s", EX + "p", '"x"@en-us'],
      [B + "#s", EX + "q", '"y"@pt-br']])

case("inherited uppercase @lang is lowercased at emission, and an "
     "empty @datatype falls through to the language", "html",
     f'<html><body prefix="{PREFIXES}" lang="FR">'
     '<span about="#s" property="ex:p">x</span>'
     '<span about="#s" property="ex:q" lang="EN" datatype="">y</span>'
     '</body></html>',
     [[B + "#s", EX + "p", '"x"@fr'],
      [B + "#s", EX + "q", '"y"@en']])

case("@vocab sets term resolution and emits usesVocabulary", "html",
     f'<html><body vocab="{SCHEMA}">'
     '<span property="name">Alice</span></body></html>',
     [[B, RDFA + "usesVocabulary", SCHEMA],
      [B, SCHEMA + "name", '"Alice"']])

case("empty @vocab has no effect without a root vocab", "html",
     f'<html><body vocab="{SCHEMA}">'
     '<div vocab=""><span property="name">x</span></div></body></html>',
     [[B, RDFA + "usesVocabulary", SCHEMA]]),

case("safe CURIE in @about", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="[ex:thing]" property="dc:title">T</div></body></html>',
     [[EX + "thing", DC + "title", '"T"']])

case("initial-context prefix (schema) needs no declaration", "html",
     '<html><body><span property="schema:name">Alice</span></body></html>',
     [[B, SCHEMA + "name", '"Alice"']])

case("@resource supplies the object for @rel", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#a" rel="dc:source" resource="#b"></div></body></html>',
     [[B + "#a", DC + "source", B + "#b"]])

case("@src supplies the object", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<img about="#a" rel="foaf:img" src="photo.jpg">'
     '</body></html>',
     [[B + "#a", FOAF + "img", "http://rdfa.example.org/photo.jpg"]])

case("incomplete forward triple completed by child @about", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#a" rel="foaf:knows"><div about="#b">x</div></div>'
     '</body></html>',
     [[B + "#a", FOAF + "knows", B + "#b"]])

case("incomplete reverse triple completed by child @about", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#a" rev="foaf:knows"><div about="#b">x</div></div>'
     '</body></html>',
     [[B + "#b", FOAF + "knows", B + "#a"]])

case("two children complete the same hanging @rel", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#a" rel="foaf:knows">'
     '<div about="#b">x</div><div about="#c">y</div></div>'
     '</body></html>',
     [[B + "#a", FOAF + "knows", B + "#b"],
      [B + "#a", FOAF + "knows", B + "#c"]])

case("@inlist with @property builds an rdf list of literals", "html",
     f'<html><body prefix="{PREFIXES}"><div about="#a">'
     '<span inlist="" property="ex:p">one</span>'
     '<span inlist="" property="ex:p">two</span>'
     '</div></body></html>',
     [["_:l0", RDF + "first", '"one"'],
      ["_:l0", RDF + "rest", "_:l1"],
      ["_:l1", RDF + "first", '"two"'],
      ["_:l1", RDF + "rest", RDF + "nil"],
      [B + "#a", EX + "p", "_:l0"]])

case("@inlist with @rel + @resource builds a one-member list", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#a" inlist="" rel="ex:p" resource="#x"></div></body></html>',
     [[B + "#a", EX + "p", "_:l0"],
      ["_:l0", RDF + "first", B + "#x"],
      ["_:l0", RDF + "rest", RDF + "nil"]])

case("<base> changes the document base", "html",
     '<html><head><base href="http://other.example.com/"></head>'
     '<body><span property="schema:name">A</span></body></html>',
     [["http://other.example.com/", SCHEMA + "name", '"A"']])

case("<time> content is datatype-sniffed to xsd:date", "html",
     '<html><body><time property="schema:startDate">2020-01-02</time>'
     '</body></html>',
     [[B, SCHEMA + "startDate", f'"2020-01-02"^^{XSD}date']])

case("@datetime wins over <time> text", "html",
     '<html><body><time property="schema:startDate" '
     'datetime="2020-01-02T03:04:05">January</time></body></html>',
     [[B, SCHEMA + "startDate", f'"2020-01-02T03:04:05"^^{XSD}dateTime']])

case("<time> sniffs xsd:gYear", "html",
     '<html><body><time property="schema:startDate">2020</time></body></html>',
     [[B, SCHEMA + "startDate", f'"2020"^^{XSD}gYear']])

case("head inherits the subject of <html about>", "html",
     '<html about="#top"><head>'
     '<title property="dc11:title">T</title></head><body></body></html>'
     .replace("dc11:", "dcterms:"),
     [[B + "#top", DC + "title", '"T"']])

case("rdfa:Pattern content copied onto the referencing subject", "html",
     '<html><body>'
     '<div resource="#pat" typeof="rdfa:Pattern">'
     '<span property="schema:name">Amy</span></div>'
     '<div about="#x"><link property="rdfa:copy" href="#pat"/></div>'
     '</body></html>',
     [[B + "#x", SCHEMA + "name", '"Amy"']])

case("unreferenced rdfa:Pattern replays as plain content", "html",
     '<html><body>'
     '<div resource="#pat" typeof="rdfa:Pattern">'
     '<span property="schema:name">Amy</span></div>'
     '</body></html>',
     [[B + "#pat", RDF + "type", RDFA + "Pattern"],
      [B + "#pat", SCHEMA + "name", '"Amy"']])

case("multiple values in @rel", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" rel="foaf:knows foaf:member" href="#b">x</a>'
     '</body></html>',
     [[B + "#a", FOAF + "knows", B + "#b"],
      [B + "#a", FOAF + "member", B + "#b"]])

case("multiple values in @property", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="dc:title dc:description">T</span></body></html>',
     [[B, DC + "title", '"T"'],
      [B, DC + "description", '"T"']])

case("explicit blank node in @about", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="_:x" property="dc:title">T</div></body></html>',
     [["_:x", DC + "title", '"T"']])

case("@typeof + @property types the resource, literal on parent subject",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="#a" property="dc:title" typeof="foaf:Document">T</span>'
     '</body></html>',
     [[B + "#a", RDF + "type", FOAF + "Document"],
      [B + "#a", DC + "title", '"T"']])

case("chaining: typed bnode object via @rel + @typeof child", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#a" rel="foaf:knows">'
     '<div typeof="foaf:Person"><span property="foaf:name">Bob</span></div>'
     '</div></body></html>',
     [[B + "#a", FOAF + "knows", "_:p"],
      ["_:p", RDF + "type", FOAF + "Person"],
      ["_:p", FOAF + "name", '"Bob"']])

case("undeclared-prefix CURIE passes through as a valid IRI", "html",
     # 'nosuch:thing' is scheme:path — a syntactically valid IRI, so the
     # processing rules keep it (reference Util.ts:288-296 semantics)
     '<html><body><span property="nosuch:thing">x</span></body></html>',
     [[B, "nosuch:thing", '"x"']])

case("plain term without vocab yields no triple in html", "html",
     '<html><body><span property="frobnicate">x</span></body></html>',
     [])

case("@property with @href and no @rel: href becomes the object", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" property="dc:source" href="http://example.net/s">x</a>'
     '</body></html>',
     [[B + "#a", DC + "source", "http://example.net/s"]])

case("non-CURIE @rel dropped when @property present "
     "(onlyAllowUriRelRevIfProperty)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" property="dc:title" rel="nofollow" '
     'href="http://example.net/s">T</a></body></html>',
     # rel='nofollow' is a term, not a CURIE → dropped entirely; property
     # then takes href as its resource object
     [[B + "#a", DC + "title", "http://example.net/s"]])

case("CURIE @rel kept alongside @property", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" property="dc:title" rel="dc:source" '
     'href="http://example.net/s">T</a></body></html>',
     [[B + "#a", DC + "source", "http://example.net/s"],
      [B + "#a", DC + "title", '"T"']])

case("xml:lang wins over lang", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="dc:title" xml:lang="de" lang="fr">T</span>'
     '</body></html>',
     [[B, DC + "title", '"T"@de']])

case("@role with @id emits xhv:role", "html",
     '<html><body><div id="b" role="button">x</div></body></html>',
     [[B + "#b", XHV + "role", XHV + "button"]])

case("empty @about refers to the base", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about=""><span property="dc:title">T</span></div></body></html>',
     [[B, DC + "title", '"T"']])

case("@vocab applies to @typeof terms", "html",
     f'<html><body vocab="{SCHEMA}">'
     '<div about="#e" typeof="Event"></div></body></html>',
     [[B, RDFA + "usesVocabulary", SCHEMA],
      [B + "#e", RDF + "type", SCHEMA + "Event"]])

# ---------------------------------------------------------- xhtml5 cases --

case("xhtml initial-context term in @rel", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
     '<a about="#a" rel="next" href="#b">n</a></body></html>',
     [[B + "#a", XHV + "next", B + "#b"]])

case("xhtml initial-context term license", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
     '<a about="" rel="license" href="http://example.net/lic">l</a>'
     '</body></html>',
     [[B, XHV + "license", "http://example.net/lic"]])

case("xmlns: prefix mapping declares a CURIE prefix", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml" '
     'xmlns:ex="http://example.org/vocab#"><body>'
     '<span property="ex:p">v</span></body></html>',
     [[B, EX + "p", '"v"']])

case("@prefix wins over xmlns: for the same prefix", "xhtml",
     '<html xmlns:ex="http://wrong.example.com/#"><body '
     'prefix="ex: http://example.org/vocab#">'
     '<span property="ex:p">v</span></body></html>',
     [[B, EX + "p", '"v"']])

case("xhtml property literal with xml:lang", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body xml:lang="de">'
     '<span property="schema:name">Ada</span></body></html>',
     [[B, SCHEMA + "name", '"Ada"@de']])

case("body inherits subject of <html about> (xhtml)", "xhtml",
     '<html about="#top" xmlns="http://www.w3.org/1999/xhtml">'
     '<body><span property="schema:name">A</span></body></html>',
     [[B + "#top", SCHEMA + "name", '"A"']])

case("safe CURIE in @resource (xhtml)", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body '
     'prefix="ex: http://example.org/vocab#">'
     '<div about="#a" rel="ex:r" resource="[ex:target]"></div></body></html>',
     [[B + "#a", EX + "r", EX + "target"]])

case("blank node safe CURIE in @about (xhtml)", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body '
     'prefix="ex: http://example.org/vocab#">'
     '<div about="[_:n]" property="ex:p">v</div></body></html>',
     [["_:n", EX + "p", '"v"']])

case("initial-context dcterms prefix (xhtml)", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
     '<span property="dcterms:title">T</span></body></html>',
     [[B, DC + "title", '"T"']])

case("@inlist resources in xhtml", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body '
     'prefix="ex: http://example.org/vocab#"><div about="#a">'
     '<link inlist="" rel="ex:l" href="#m1"/>'
     '<link inlist="" rel="ex:l" href="#m2"/>'
     '</div></body></html>',
     [["_:l0", RDF + "first", B + "#m1"],
      ["_:l0", RDF + "rest", "_:l1"],
      ["_:l1", RDF + "first", B + "#m2"],
      ["_:l1", RDF + "rest", RDF + "nil"],
      [B + "#a", EX + "l", "_:l0"]])

case("@content with xml:lang (xhtml)", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body xml:lang="it">'
     '<meta about="#a" property="schema:name" content="Nome"/>'
     '</body></html>',
     [[B + "#a", SCHEMA + "name", '"Nome"@it']])

case("nested xmlns: redeclaration overrides for the subtree", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml" '
     'xmlns:ex="http://outer.example.com/#"><body>'
     '<div xmlns:ex="http://example.org/vocab#">'
     '<span property="ex:p">in</span></div>'
     '<span property="ex:q">out</span></body></html>',
     [[B, EX + "p", '"in"'],
      [B, "http://outer.example.com/#q", '"out"']])

# ------------------------------------------------------------- svg cases --

case("xml:base rebases IRIs in svg", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'xml:base="http://svgbase.example.com/">'
     '<metadata about="#x" property="schema:name">N</metadata></svg>',
     [["http://svgbase.example.com/#x", SCHEMA + "name", '"N"']])

case("scoped xml:base only affects its subtree", "xml",
     # the xml:base carrier gets @about so it is not a skipElement (the
     # reference drops localBaseIRI across skipped frames,
     # RdfaParser.ts:95-114 — parity preserved here)
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<g xml:base="http://scoped.example.com/" about="#g">'
     '<metadata property="schema:name">N</metadata></g>'
     '<metadata about="#out" property="schema:description">M</metadata></svg>',
     [["http://scoped.example.com/#g", SCHEMA + "name", '"N"'],
      [B + "#out", SCHEMA + "description", '"M"']])

case("xml:lang on svg literal", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" xml:lang="fr">'
     '<metadata property="schema:name">Nom</metadata></svg>',
     [[B, SCHEMA + "name", '"Nom"@fr']])

case("self-closing element with @content (svg)", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<metadata property="schema:name" content="N"/></svg>',
     [[B, SCHEMA + "name", '"N"']])

case("attribute names are case-sensitive in xml mode", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<metadata PROPERTY="schema:name">N</metadata></svg>',
     [])

case("CDATA section contributes literal text (svg)", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<metadata property="schema:name"><![CDATA[A & B]]></metadata></svg>',
     [[B, SCHEMA + "name", '"A & B"']])

case("@rel chaining in svg", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'xmlns:foaf="http://xmlns.com/foaf/0.1/">'
     '<g about="#a" rel="foaf:maker"><g about="#b"><metadata '
     'property="foaf:name">B</metadata></g></g></svg>',
     [[B + "#a", FOAF + "maker", B + "#b"],
      [B + "#b", FOAF + "name", '"B"']])


case("typed bnode chain in svg", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'xmlns:foaf="http://xmlns.com/foaf/0.1/">'
     '<g about="#a" rel="foaf:maker"><g typeof="foaf:Person">'
     '<metadata property="foaf:name">Ann</metadata></g></g></svg>',
     [[B + "#a", FOAF + "maker", "_:p"],
      ["_:p", RDF + "type", FOAF + "Person"],
      ["_:p", FOAF + "name", '"Ann"']])

case("typed literal in svg (xsd:decimal)", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'xmlns:ex="http://example.org/vocab#">'
     '<metadata property="ex:score" '
     'datatype="http://www.w3.org/2001/XMLSchema#decimal">1.5</metadata>'
     '</svg>',
     [[B, EX + "score", f'"1.5"^^{XSD}decimal']])

case("@datetime attribute works in svg profile", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<time property="schema:startDate" datetime="2021-07-01">x</time></svg>',
     [[B, SCHEMA + "startDate", f'"2021-07-01"^^{XSD}date']])

case("numeric character entity in svg text", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<metadata property="schema:name">A&#65;&amp;B</metadata></svg>',
     [[B, SCHEMA + "name", '"AA&B"']])

case("entities decoded in svg attribute values", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<metadata property="schema:name" content="A&amp;B"/></svg>',
     [[B, SCHEMA + "name", '"A&B"']])

case("full-IRI @rev in svg", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<g about="#a" rev="http://example.org/vocab#of" resource="#b"></g>'
     '</svg>',
     [[B + "#b", EX + "of", B + "#a"]])


case("@rev with xhtml term", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
     '<a about="#a" rev="next" href="#b">n</a></body></html>',
     [[B + "#b", XHV + "next", B + "#a"]])

case("multiple xhtml terms in one @rel", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
     '<a about="" rel="next prev" href="#b">n</a></body></html>',
     [[B, XHV + "next", B + "#b"],
      [B, XHV + "prev", B + "#b"]])

case("xhtml term lookup is case-insensitive", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
     '<a about="" rel="NEXT" href="#b">n</a></body></html>',
     [[B, XHV + "next", B + "#b"]])

case("typed bnode via @typeof on body descendant (xhtml)", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
     '<div typeof="schema:Person"><span property="schema:name">P</span>'
     '</div></body></html>',
     [["_:b", RDF + "type", SCHEMA + "Person"],
      ["_:b", SCHEMA + "name", '"P"']])

case("<base> works in xhtml too", "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml">'
     '<head><base href="http://xb.example.com/"/></head>'
     '<body><span property="schema:name">A</span></body></html>',
     [["http://xb.example.com/", SCHEMA + "name", '"A"']])

case("@content suppresses datatype sniffing without time context (xhtml)",
     "xhtml",
     '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
     '<span property="schema:startDate" content="2020-01-02">x</span>'
     '</body></html>',
     [[B, SCHEMA + "startDate", '"2020-01-02"']])

case("about chain through g elements (svg)", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<g about="#outer"><g about="#inner">'
     '<metadata property="schema:name">I</metadata></g>'
     '<metadata property="schema:description">O</metadata></g></svg>',
     [[B + "#inner", SCHEMA + "name", '"I"'],
      [B + "#outer", SCHEMA + "description", '"O"']])

case("@vocab in svg", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" vocab="{SCHEMA}">'
     '<metadata property="name">N</metadata></svg>',
     [[B, RDFA + "usesVocabulary", SCHEMA],
      [B, SCHEMA + "name", '"N"']])

case("prefix attribute in svg", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'prefix="ex: http://example.org/vocab#">'
     '<metadata property="ex:p">v</metadata></svg>',
     [[B, EX + "p", '"v"']])

case("safe CURIE about in svg", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'prefix="ex: http://example.org/vocab#">'
     '<g about="[ex:node]"><metadata property="ex:p">v</metadata></g></svg>',
     [[EX + "node", EX + "p", '"v"']])

case("xml:lang on inner element overrides outer (svg)", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" xml:lang="en">'
     '<metadata property="schema:name" xml:lang="de">N</metadata></svg>',
     [[B, SCHEMA + "name", '"N"@de']])

case("empty xml:lang clears the language (svg)", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" xml:lang="en">'
     '<metadata property="schema:name" xml:lang="">N</metadata></svg>',
     [[B, SCHEMA + "name", '"N"']])

case("incomplete triple completed across svg groups", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'xmlns:foaf="http://xmlns.com/foaf/0.1/">'
     '<g about="#a" rel="foaf:knows"><g about="#b"/></g></svg>',
     [[B + "#a", FOAF + "knows", B + "#b"]])


# ----------------------------------------------------------- html4 cases --
# The reference runs the html4 manifest with profile "html"
# (/root/reference/package.json: spec-html4); the documents below use
# HTML 4.01 conventions — doctype, uppercase tags/attributes, unquoted
# values, unclosed <p>/<li>/<td>, xmlns: prefix declarations, <base>,
# @version — processed under the RDFa 1.1 HTML rules.

DC11 = "http://purl.org/dc/elements/1.1/"
H4DOC = '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN">'

case("uppercase tags and attributes (html4)", "html",
     H4DOC + '<HTML VERSION="HTML+RDFa 1.1"><HEAD><TITLE>t</TITLE></HEAD>'
     f'<BODY PREFIX="dc: {DC}"><H1 PROPERTY="dc:title">The Title</H1>'
     '</BODY></HTML>',
     [[B, DC + "title", '"The Title"']],
     label="html4")

case("unquoted attribute values (html4)", "html",
     H4DOC + f'<html><body prefix="{PREFIXES}">'
     '<div about=#me><span property=foaf:name>Alice</span></div>'
     '</body></html>',
     [[B + "#me", FOAF + "name", '"Alice"']],
     label="html4")

case("xmlns: prefix declaration (html4 style)", "html",
     H4DOC + f'<html><body xmlns:dc="{DC11}">'
     '<p property="dc:creator">A. Author</p></body></html>',
     [[B, DC11 + "creator", '"A. Author"']],
     label="html4")

case("base tag sets the base IRI (html4)", "html",
     H4DOC + '<html><head><base href="http://base.example.org/dir/">'
     f'</head><body xmlns:dc="{DC11}"><div about="doc2">'
     '<span property="dc:title">T</span></div></body></html>',
     [["http://base.example.org/dir/doc2", DC11 + "title", '"T"']],
     label="html4")

case("unclosed p elements imply close (html4)", "html",
     H4DOC + f'<html><body xmlns:dc="{DC11}">'
     '<p property="dc:title">One<p property="dc:description">Two'
     '</body></html>',
     [[B, DC11 + "title", '"One"'],
      [B, DC11 + "description", '"Two"']],
     label="html4")

case("unclosed li elements with about (html4)", "html",
     H4DOC + f'<html><body xmlns:dc="{DC11}"><ul>'
     '<li about="#a" property="dc:title">First'
     '<li about="#b" property="dc:title">Second'
     '</ul></body></html>',
     [[B + "#a", DC11 + "title", '"First"'],
      [B + "#b", DC11 + "title", '"Second"']],
     label="html4")

case("unclosed td cells in a table (html4)", "html",
     H4DOC + f'<html><body xmlns:dc="{DC11}"><table><tr>'
     '<td property="dc:title">X<td property="dc:description">Y'
     '</tr></table></body></html>',
     [[B, DC11 + "title", '"X"'],
      [B, DC11 + "description", '"Y"']],
     label="html4")

case("lang attribute inherited (html4)", "html",
     H4DOC + f'<html lang="en"><body xmlns:dc="{DC11}">'
     '<span property="dc:title">T</span></body></html>',
     [[B, DC11 + "title", '"T"@en']],
     label="html4")

case("inner lang overrides and empty lang clears (html4)", "html",
     H4DOC + f'<html lang="en"><body xmlns:dc="{DC11}">'
     '<span property="dc:title" lang="de">D</span>'
     '<span property="dc:description" lang="">N</span></body></html>',
     [[B, DC11 + "title", '"D"@de'],
      [B, DC11 + "description", '"N"']],
     label="html4")

case("meta and link in head inherit the base subject (html4)", "html",
     H4DOC + f'<html xmlns:dc="{DC11}"><head>'
     '<meta property="dc:title" content="M">'
     '<link rel="dc:source" href="http://other.example.org/">'
     '</head><body></body></html>',
     [[B, DC11 + "title", '"M"'],
      [B, DC11 + "source", "http://other.example.org/"]],
     label="html4")

case("entity references decode in literals (html4)", "html",
     H4DOC + f'<html><body xmlns:dc="{DC11}">'
     '<span property="dc:title">Caf&eacute; &amp; Bar&#33;</span>'
     '</body></html>',
     [[B, DC11 + "title", '"Café & Bar!"']],
     label="html4")

case("bare rel term without vocab yields nothing (html4)", "html",
     H4DOC + '<html><body>'
     '<a rel="next" href="http://other.example.org/">n</a></body></html>',
     [],
     label="html4")

case("bare rel term resolves via vocab (html4)", "html",
     H4DOC + f'<html><body vocab="{EX}">'
     '<a rel="next" href="http://other.example.org/">n</a></body></html>',
     [[B, RDFA + "usesVocabulary", EX],
      [B, EX + "next", "http://other.example.org/"]],
     label="html4")

case("typeof with about emits rdf:type (html4)", "html",
     H4DOC + f'<html><body prefix="{PREFIXES}">'
     '<div about="#me" typeof="foaf:Person">'
     '<span property="foaf:name">Alice</span></div></body></html>',
     [[B + "#me", RDF + "type", FOAF + "Person"],
      [B + "#me", FOAF + "name", '"Alice"']],
     label="html4")

case("typeof without about types a blank node (html4)", "html",
     H4DOC + f'<html><body prefix="{PREFIXES}">'
     '<div typeof="foaf:Person"><span property="foaf:name">A</span>'
     '</div></body></html>',
     [["_:b0", RDF + "type", FOAF + "Person"],
      ["_:b0", FOAF + "name", '"A"']],
     label="html4")

case("resource wins over href as object (html4)", "html",
     H4DOC + f'<html><body xmlns:dc="{DC11}">'
     '<a about="#s" rel="dc:source" resource="#r" href="#h">x</a>'
     '</body></html>',
     [[B + "#s", DC11 + "source", B + "#r"]],
     label="html4")

case("datetime attribute sniffs xsd:date (html4)", "html",
     H4DOC + f'<html><body xmlns:dc="{DC11}">'
     '<time property="dc:date" datetime="2012-03-18">March 18</time>'
     '</body></html>',
     [[B, DC11 + "date", f'"2012-03-18"^^{XSD}date']],
     label="html4")

case("time tag content sniffs xsd:dateTime (html4)", "html",
     H4DOC + f'<html><body prefix="ex: {EX}">'
     '<time property="ex:t">2012-03-18T12:00:00</time></body></html>',
     [[B, EX + "t", f'"2012-03-18T12:00:00"^^{XSD}dateTime']],
     label="html4")

case("duplicate attribute keeps the first (html4)", "html",
     H4DOC + f'<html><body xmlns:dc="{DC11}">'
     '<span PROPERTY="dc:title" property="dc:description">X</span>'
     '</body></html>',
     [[B, DC11 + "title", '"X"']],
     label="html4")

case("comments and conditional comments are skipped (html4)", "html",
     H4DOC + f'<html><body xmlns:dc="{DC11}">'
     '<!--[if IE]><span property="dc:title">NO</span><![endif]-->'
     '<!-- plain comment --><span property="dc:title">YES</span>'
     '</body></html>',
     [[B, DC11 + "title", '"YES"']],
     label="html4")

case("content attribute overrides element text (html4)", "html",
     H4DOC + f'<html><body xmlns:dc="{DC11}">'
     '<span property="dc:title" content="From content">From text</span>'
     '</body></html>',
     [[B, DC11 + "title", '"From content"']],
     label="html4")

case("rel chain completes an incomplete triple (html4)", "html",
     H4DOC + f'<html><body prefix="{PREFIXES}">'
     '<div about="#a" rel="foaf:knows"><div about="#b">'
     '<span property="foaf:name">B</span></div></div></body></html>',
     [[B + "#a", FOAF + "knows", B + "#b"],
      [B + "#b", FOAF + "name", '"B"']],
     label="html4")

# ---------------------------------------------------------- xhtml1 cases --
# The reference runs the xhtml1 manifest with profile "xhtml"
# (spec-xhtml1): XHTML 1.x markup — doctype + xmlns on <html>,
# self-closing elements, the XHTML initial-context vocabulary terms.

X1DOC = ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML+RDFa 1.1//EN" '
         '"http://www.w3.org/MarkUp/DTD/xhtml-rdfa-2.dtd">')
XHTML_NS = "http://www.w3.org/1999/xhtml"

case("property literal under xhtml doctype (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><head><title>t</title></head>'
     f'<body xmlns:dc="{DC11}"><h1 property="dc:title">T</h1>'
     '</body></html>',
     [[B, DC11 + "title", '"T"']],
     label="xhtml1")

case("xhtml vocabulary term rel=next (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body>'
     '<a rel="next" href="http://other.example.org/ch2">c</a>'
     '</body></html>',
     [[B, XHV + "next", "http://other.example.org/ch2"]],
     label="xhtml1")

case("xhtml vocabulary term rel=license (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body>'
     '<a rel="license" href="http://example.org/license">l</a>'
     '</body></html>',
     [[B, XHV + "license", "http://example.org/license"]],
     label="xhtml1")

case("vocabulary terms are case-insensitive (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body>'
     '<a rel="NEXT" href="http://other.example.org/ch2">c</a>'
     '</body></html>',
     [[B, XHV + "next", "http://other.example.org/ch2"]],
     label="xhtml1")

case("unknown bare term in rel is dropped (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body>'
     '<a rel="nosuchterm" href="http://other.example.org/">x</a>'
     '</body></html>',
     [],
     label="xhtml1")

case("empty-prefix CURIE resolves to the xhtml vocab (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body>'
     '<a rel=":license" href="http://example.org/license">l</a>'
     '</body></html>',
     [[B, XHV + "license", "http://example.org/license"]],
     label="xhtml1")

case("self-closing element with content attribute (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body xmlns:dc="{DC11}">'
     '<span about="#a" property="dc:title" content="T"/>'
     '<span property="dc:description">after</span></body></html>',
     [[B + "#a", DC11 + "title", '"T"'],
      [B, DC11 + "description", '"after"']],
     label="xhtml1")

case("meta in head inherits the base subject (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}" xmlns:dc="{DC11}"><head>'
     '<meta property="dc:title" content="M"/></head><body/></html>',
     [[B, DC11 + "title", '"M"']],
     label="xhtml1")

case("xml:lang attribute applies (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body xmlns:dc="{DC11}">'
     '<span property="dc:title" xml:lang="fr">F</span></body></html>',
     [[B, DC11 + "title", '"F"@fr']],
     label="xhtml1")

case("safe CURIE about with xmlns prefix (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body xmlns:ex="{EX}">'
     '<div about="[ex:node]"><span property="ex:p">v</span></div>'
     '</body></html>',
     [[EX + "node", EX + "p", '"v"']],
     label="xhtml1")

case("typeof on head types the base resource (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}" prefix="{PREFIXES}">'
     '<head typeof="foaf:Document"><title>t</title></head><body/></html>',
     [[B, RDF + "type", FOAF + "Document"]],
     label="xhtml1")

case("rev on a link reverses the triple (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body xmlns:dc="{DC11}">'
     '<a about="#cited" rev="dc:source" href="#citing">x</a>'
     '</body></html>',
     [[B + "#citing", DC11 + "source", B + "#cited"]],
     label="xhtml1")

case("incomplete triple completed by child subject (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}" prefix="{PREFIXES}">'
     '<body><div about="#a" rel="foaf:knows"><div about="#b"/>'
     '</div></body></html>',
     [[B + "#a", FOAF + "knows", B + "#b"]],
     label="xhtml1")

case("inlist rel over descendant IRI elements builds an rdf list (xhtml1)",
     "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}" prefix="{PREFIXES}">'
     '<body><div about="#l"><ol rel="ex:items" inlist="">'
     '<li><a href="#i1">x</a></li><li><a href="#i2">y</a></li>'
     '</ol></div></body></html>',
     [[B + "#l", EX + "items", "_:l0"],
      ["_:l0", RDF + "first", B + "#i1"],
      ["_:l0", RDF + "rest", "_:l1"],
      ["_:l1", RDF + "first", B + "#i2"],
      ["_:l1", RDF + "rest", RDF + "nil"]],
     label="xhtml1")

case("xml:base is ignored in xhtml (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body xmlns:dc="{DC11}">'
     '<div xml:base="http://other.example.org/" about="page2">'
     '<span property="dc:title">T</span></div></body></html>',
     [["http://rdfa.example.org/page2", DC11 + "title", '"T"']],
     label="xhtml1")

case("base tag applies in xhtml (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><head>'
     '<base href="http://based.example.org/dir/"/></head>'
     f'<body xmlns:dc="{DC11}"><div about="p">'
     '<span property="dc:title">T</span></div></body></html>',
     [["http://based.example.org/dir/p", DC11 + "title", '"T"']],
     label="xhtml1")

case("explicit datatype on a literal (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}" prefix="xsd: {XSD} ex: {EX}">'
     '<body><span property="ex:count" datatype="xsd:integer">42</span>'
     '</body></html>',
     [[B, EX + "count", f'"42"^^{XSD}integer']],
     label="xhtml1")

# note: the reference injects EVERY in-scope custom prefix (bare xmlns
# plus @prefix-declared ones), alphabetically — RdfaParser.ts:123-139
case("XMLLiteral captures markup with xmlns injection (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}" prefix="rdf: {RDF} ex: {EX}">'
     '<body><span property="ex:p" datatype="rdf:XMLLiteral">'
     'a<b>c</b></span></body></html>',
     [[B, EX + "p",
       f'"a<b xmlns="{XHTML_NS}" xmlns:ex="{EX}" xmlns:rdf="{RDF}">'
       f'c</b>"^^{RDF}XMLLiteral']],
     label="xhtml1")

case("role attribute with id subject (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body>'
     '<div id="widget" role="button">x</div></body></html>',
     [[B + "#widget", XHV + "role", XHV + "button"]],
     label="xhtml1")

case("non-CURIE rel dropped when property present (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body xmlns:dc="{DC11}">'
     '<a property="dc:title" rel="license" '
     'href="http://example.org/doc">T</a></body></html>',
     [[B, DC11 + "title", "http://example.org/doc"]],
     label="xhtml1")

case("empty vocab restores the default (xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body vocab="{SCHEMA}">'
     '<span property="name">N</span>'
     f'<div vocab="" xmlns:dc="{DC11}">'
     '<span property="dc:title">T</span><span property="name">drop</span>'
     '</div></body></html>',
     [[B, RDFA + "usesVocabulary", SCHEMA],
      [B, SCHEMA + "name", '"N"'],
      [B, DC11 + "title", '"T"']],
     label="xhtml1")

# --------------------------------------------------------- rdfa1.0 cases --
# The reference runs the rdfa1.0 manifests with profiles "xhtml" and
# "xml" (spec-1-xhtml1 / spec-1-svg / spec-1-xml): RDFa 1.0-era documents
# (@version, xmlns:-only prefixes, reserved XHTML words, 1.0 constructs
# like @instanceof) processed under the RDFa 1.1 rules, which is what a
# 1.1 processor — the reference and this engine — produces for them.

R10DOC = ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML+RDFa 1.0//EN" '
          '"http://www.w3.org/MarkUp/DTD/xhtml-rdfa-1.dtd">')

case("version attribute is ignored (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" version="XHTML+RDFa 1.0" '
     f'xmlns:dc="{DC11}"><body><h1 property="dc:title">T</h1>'
     '</body></html>',
     [[B, DC11 + "title", '"T"']],
     label="rdfa1.0")

case("xmlns-only prefix mappings (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" version="XHTML+RDFa 1.0" '
     f'xmlns:foaf="{FOAF}" xmlns:dc="{DC11}"><body>'
     '<div about="#me"><span property="foaf:name">Alice</span>'
     '<span property="dc:creator">A</span></div></body></html>',
     [[B + "#me", FOAF + "name", '"Alice"'],
      [B + "#me", DC11 + "creator", '"A"']],
     label="rdfa1.0")

case("nested xmlns scopes override (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" xmlns:ns="{DC11}"><body>'
     '<span property="ns:title">outer</span>'
     f'<div xmlns:ns="{EX}"><span property="ns:p">inner</span></div>'
     '</body></html>',
     [[B, DC11 + "title", '"outer"'],
      [B, EX + "p", '"inner"']],
     label="rdfa1.0")

case("reserved word rel=next (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" version="XHTML+RDFa 1.0"><body>'
     '<link rel="next" href="http://other.example.org/ch2"/>'
     '</body></html>',
     [[B, XHV + "next", "http://other.example.org/ch2"]],
     label="rdfa1.0")

case("bnode safe CURIE about (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" xmlns:foaf="{FOAF}"><body>'
     '<div about="[_:alice]"><span property="foaf:name">Alice</span>'
     '</div></body></html>',
     [["_:alice", FOAF + "name", '"Alice"']],
     label="rdfa1.0")

case("instanceof is not rdfa 1.1 and yields no type (rdfa1.0 xhtml1)",
     "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" xmlns:foaf="{FOAF}"><body>'
     '<div about="#me" instanceof="foaf:Person">'
     '<span property="foaf:name">A</span></div></body></html>',
     [[B + "#me", FOAF + "name", '"A"']],
     label="rdfa1.0")

case("resource chains an incomplete rel (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" xmlns:dc="{DC11}"><body>'
     '<div about="#doc" rel="dc:source" resource="#src">'
     '<span property="dc:title">T</span></div></body></html>',
     [[B + "#doc", DC11 + "source", B + "#src"],
      [B + "#src", DC11 + "title", '"T"']],
     label="rdfa1.0")

case("content is a plain literal (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" xmlns:dc="{DC11}"><body>'
     '<meta about="" property="dc:title" content="Plain"/></body></html>',
     [[B, DC11 + "title", '"Plain"']],
     label="rdfa1.0")

case("empty datatype forces a plain literal over markup (rdfa1.0 xhtml1)",
     "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" xmlns:ex="{EX}"><body>'
     '<span property="ex:p" datatype="">a<b>c</b></span></body></html>',
     [[B, EX + "p", '"ac"']],
     label="rdfa1.0")

case("xml:lang inheritance (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" xml:lang="it" '
     f'xmlns:dc="{DC11}"><body><span property="dc:title">T</span>'
     '</body></html>',
     [[B, DC11 + "title", '"T"@it']],
     label="rdfa1.0")

case("rev with reserved word (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}"><body>'
     '<a rev="up" href="http://parent.example.org/">u</a></body></html>',
     [["http://parent.example.org/", XHV + "up", B]],
     label="rdfa1.0")

case("typeof alone on body-level div makes a typed bnode (rdfa1.0 xhtml1)",
     "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" xmlns:foaf="{FOAF}"><body>'
     '<div typeof="foaf:Person"><span property="foaf:name">N</span>'
     '</div></body></html>',
     [["_:b0", RDF + "type", FOAF + "Person"],
      ["_:b0", FOAF + "name", '"N"']],
     label="rdfa1.0")

case("href fallback object for rel (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" xmlns:dc="{DC11}"><body>'
     '<a about="#doc" rel="dc:source" href="http://src.example.org/">s</a>'
     '</body></html>',
     [[B + "#doc", DC11 + "source", "http://src.example.org/"]],
     label="rdfa1.0")

case("xml:base applies in svg (rdfa1.0 svg)", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'xml:base="http://svg.example.org/base/" '
     f'xmlns:dc="{DC11}"><g about="img">'
     '<metadata property="dc:title">T</metadata></g></svg>',
     [["http://svg.example.org/base/img", DC11 + "title", '"T"']],
     label="rdfa1.0")

case("svg metadata property literal (rdfa1.0 svg)", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:dc="{DC11}">'
     '<metadata property="dc:title">An SVG</metadata></svg>',
     [[B, DC11 + "title", '"An SVG"']],
     label="rdfa1.0")

case("svg content attribute (rdfa1.0 svg)", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:dc="{DC11}">'
     '<metadata property="dc:title" content="From content">text'
     '</metadata></svg>',
     [[B, DC11 + "title", '"From content"']],
     label="rdfa1.0")

case("svg rel with resource (rdfa1.0 svg)", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:dc="{DC11}">'
     '<g about="#fig" rel="dc:source" resource="#photo"/></svg>',
     [[B + "#fig", DC11 + "source", B + "#photo"]],
     label="rdfa1.0")

case("svg typeof blank node (rdfa1.0 svg)", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:foaf="{FOAF}">'
     '<g typeof="foaf:Image"><metadata property="foaf:name">i</metadata>'
     '</g></svg>',
     [["_:b0", RDF + "type", FOAF + "Image"],
      ["_:b0", FOAF + "name", '"i"']],
     label="rdfa1.0")

case("svg xml:lang (rdfa1.0 svg)", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:dc="{DC11}" '
     'xml:lang="en"><metadata property="dc:title">T</metadata></svg>',
     [[B, DC11 + "title", '"T"@en']],
     label="rdfa1.0")

case("svg tag names are case-sensitive (rdfa1.0 svg)", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:dc="{DC11}">'
     '<Metadata property="dc:title">still works</Metadata></svg>',
     [[B, DC11 + "title", '"still works"']],
     label="rdfa1.0")


# ----------------------------------------------------- generic xml cases --
# The reference's spec-xml manifest (rdfa1.1/xml/manifest.ttl, profile
# "xml" in /root/reference/package.json:61) runs RDFa over arbitrary
# (non-SVG, non-XHTML) XML documents: xml:base/xml:lang instead of
# <base>/<lang>, case-sensitive names, CDATA/PI handling, no head/body
# subject inheritance, no rdfa:Pattern copying, no rdf:HTML datatype
# (feature table: lib/RdfaProfile.ts "xml" row).

case("RDFa attributes on a generic xml root", "xml",
     f'<doc prefix="ex: {EX}"><item property="ex:p">v</item></doc>',
     [[B, EX + "p", '"v"']],
     label="xml")

case("root @typeof acts as empty @about (generic xml)", "xml",
     f'<doc prefix="ex: {EX}" typeof="ex:T">'
     '<item property="ex:p">v</item></doc>',
     [[B, RDF + "type", EX + "T"],
      [B, EX + "p", '"v"']],
     label="xml")

case("xml:base on a generic root rebases relative IRIs", "xml",
     f'<doc xml:base="http://xbase.example.com/" prefix="ex: {EX}">'
     '<item about="#x" property="ex:p">v</item></doc>',
     [["http://xbase.example.com/#x", EX + "p", '"v"']],
     label="xml")

case("scoped xml:base with carrier @about (generic xml)", "xml",
     f'<doc prefix="ex: {EX}">'
     '<g xml:base="http://scoped.example.com/" about="#g">'
     '<item property="ex:p" resource="rel">v</item></g></doc>',
     [["http://scoped.example.com/#g", EX + "p",
       "http://scoped.example.com/rel"]],
     label="xml")

case("base element has no effect in generic xml (baseTag off)", "xml",
     f'<doc prefix="ex: {EX}"><base href="http://nope.example.com/"/>'
     '<item property="ex:p">v</item></doc>',
     [[B, EX + "p", '"v"']],
     label="xml")

case("xml:lang inherited from a generic root", "xml",
     f'<doc prefix="ex: {EX}" xml:lang="en">'
     '<item property="ex:p">v</item></doc>',
     [[B, EX + "p", '"v"@en']],
     label="xml")

case("XMLLiteral captures child markup with xmlns injection "
     "(generic xml)", "xml",
     f'<doc xmlns:ex="{EX}" xmlns:rdf="{RDF}">'
     '<item property="ex:d" datatype="rdf:XMLLiteral">a<b>x</b></item>'
     '</doc>',
     [[B, EX + "d",
       f'"a<b xmlns:ex="{EX}" xmlns:rdf="{RDF}">x</b>"^^{RDF}XMLLiteral']],
     label="xml")

case("CDATA section in a generic xml literal", "xml",
     f'<doc prefix="ex: {EX}">'
     '<item property="ex:p"><![CDATA[A & B]]></item></doc>',
     [[B, EX + "p", '"A & B"']],
     label="xml")

case("self-closing child @resource completes an incomplete triple "
     "(generic xml)", "xml",
     f'<doc prefix="ex: {EX}"><item about="#a" rel="ex:r">'
     '<sub resource="#b"/></item></doc>',
     [[B + "#a", EX + "r", B + "#b"]],
     label="xml")

case("@vocab on a generic root emits usesVocabulary", "xml",
     f'<doc vocab="{SCHEMA}"><item property="name">N</item></doc>',
     [[B, RDFA + "usesVocabulary", SCHEMA],
      [B, SCHEMA + "name", '"N"']],
     label="xml")

case("@inlist literal list in generic xml", "xml",
     f'<doc prefix="ex: {EX}"><item about="#a">'
     '<x inlist="" property="ex:p">one</x>'
     '<x inlist="" property="ex:p">two</x></item></doc>',
     [["_:l0", RDF + "first", '"one"'],
      ["_:l0", RDF + "rest", "_:l1"],
      ["_:l1", RDF + "first", '"two"'],
      ["_:l1", RDF + "rest", RDF + "nil"],
      [B + "#a", EX + "p", "_:l0"]],
     label="xml")

case("attribute names are case-sensitive in generic xml", "xml",
     f'<doc prefix="ex: {EX}"><item PROPERTY="ex:p">v</item></doc>',
     [],
     label="xml")

case("comment inside literal text is transparent (generic xml)", "xml",
     f'<doc prefix="ex: {EX}">'
     '<item property="ex:p">a<!--zap-->b</item></doc>',
     [[B, EX + "p", '"ab"']],
     label="xml")

case("processing instruction inside text is transparent (generic xml)",
     "xml",
     f'<doc prefix="ex: {EX}">'
     '<item property="ex:p">a<?pi data?>b</item></doc>',
     [[B, EX + "p", '"ab"']],
     label="xml")

case("child markup without @datatype yields a plain text literal "
     "(htmlDatatype off in xml)", "xml",
     f'<doc prefix="ex: {EX}">'
     '<item property="ex:p">a<b>c</b>d</item></doc>',
     [[B, EX + "p", '"acd"']],
     label="xml")

case("time element with bare date text (timeTag on in xml)", "xml",
     f'<doc><time property="{SCHEMA}startDate">2021-07-01</time></doc>',
     [[B, SCHEMA + "startDate", f'"2021-07-01"^^{XSD}date']],
     label="xml")

case("rdfa:Pattern is NOT copied in generic xml (copyRdfaPatterns off)",
     "xml",
     f'<doc prefix="ex: {EX} rdfa: {RDFA}">'
     '<item typeof="rdfa:Pattern" resource="#p">'
     '<x property="ex:q">v</x></item>'
     '<item about="#a" property="rdfa:copy" resource="#p"/></doc>',
     [[B + "#p", RDF + "type", RDFA + "Pattern"],
      [B + "#p", EX + "q", '"v"'],
      [B + "#a", RDFA + "copy", B + "#p"]],
     label="xml")

case("xmlns: prefix mapping on a generic root", "xml",
     f'<doc xmlns:ex="{EX}">'
     '<item about="#a" property="ex:p">v</item></doc>',
     [[B + "#a", EX + "p", '"v"']],
     label="xml")


# ------------------------------------------------------------ role cases --
# The reference also runs the rdfa1.1-role manifests (spec-role-html5 /
# -xhtml5 / -xhtml1 / -xml in /root/reference/package.json): the W3C
# role-attribute spec used with RDFa (reference lib/RdfaParser.ts:252-268
# — subject = #id IRI or fresh bnode, predicate xhv:role, values resolved
# with the vocabulary temporarily forced to the XHTML vocab).

case("role with id subject (role html5)", "html",
     '<html><body><div id="b1" role="button">x</div></body></html>',
     [[B + "#b1", XHV + "role", XHV + "button"]],
     label="role")

case("role without id types a fresh bnode (role html5)", "html",
     '<html><body><div role="navigation">x</div></body></html>',
     [["_:b0", XHV + "role", XHV + "navigation"]],
     label="role")

case("multiple role values (role html5)", "html",
     '<html><body><div id="m" role="button main">x</div></body></html>',
     [[B + "#m", XHV + "role", XHV + "button"],
      [B + "#m", XHV + "role", XHV + "main"]],
     label="role")

case("CURIE role value uses the declared prefix (role html5)", "html",
     f'<html><body prefix="ex: {EX}">'
     '<div id="c" role="ex:widget">x</div></body></html>',
     [[B + "#c", XHV + "role", EX + "widget"]],
     label="role")

case("absolute IRI role value (role html5)", "html",
     '<html><body><div id="d" role="http://ex.org/abs">x</div>'
     '</body></html>',
     [[B + "#d", XHV + "role", "http://ex.org/abs"]],
     label="role")

case("empty role emits nothing (role html5)", "html",
     '<html><body><div id="e" role="">x</div></body></html>',
     [],
     label="role")

case("role subject is independent of about (role html5)", "html",
     '<html><body><div about="#x" id="y" role="button">'
     '<span property="http://p/t">v</span></div></body></html>',
     [[B + "#y", XHV + "role", XHV + "button"],
      [B + "#x", "http://p/t", '"v"']],
     label="role")

case("role alongside property on the same element (role html5)", "html",
     f'<html><body xmlns:dc="{DC11}">'
     '<div id="r" role="note" property="dc:title">T</div></body></html>',
     [[B + "#r", XHV + "role", XHV + "note"],
      [B, DC11 + "title", '"T"']],
     label="role")

case("role with xmlns-declared CURIE (role xhtml5)", "xhtml",
     f'<html xmlns="{XHTML_NS}" xmlns:ex="{EX}"><body>'
     '<div id="w" role="ex:pane">x</div></body></html>',
     [[B + "#w", XHV + "role", EX + "pane"]],
     label="role")

case("role under the xhtml1 doctype (role xhtml1)", "xhtml",
     X1DOC + f'<html xmlns="{XHTML_NS}"><body>'
     '<span id="s" role="search">x</span></body></html>',
     [[B + "#s", XHV + "role", XHV + "search"]],
     label="role")

case("role in svg (role xml)", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<g id="g1" role="button">x</g></svg>',
     [[B + "#g1", XHV + "role", XHV + "button"]],
     label="role")

case("role feature disabled emits nothing (role html5)", "html",
     '<html><body><div id="b" role="button">x</div></body></html>',
     [],
     label="role",
     features={"baseTag": True, "langAttribute": True,
               "onlyAllowUriRelRevIfProperty": True,
               "inheritSubjectInHeadBody": True,
               "datetimeAttribute": True, "timeTag": True,
               "htmlDatatype": True, "copyRdfaPatterns": True,
               "xmlnsPrefixMappings": True})


# ------------------------------------------------- round-4 long-tail cases --
# Processor-graph (rdfa:usesVocabulary) variants, @property coexisting
# with @rel/@rev/@typeof/@resource (RDFa Core 1.1 §5.1 steps 5/6/11 and
# the 1.0-doctype replay), and SVG metadata elements — the remaining
# W3C-manifest families VERDICT r3 flagged as cheap offline insurance.

case("nested vocab re-declaration emits one usesVocabulary per vocab", "html",
     f'<html><body vocab="{SCHEMA}"><span property="name">A</span>'
     f'<div vocab="{EX}"><span property="p">x</span></div></body></html>',
     [[B, RDFA + "usesVocabulary", SCHEMA],
      [B, RDFA + "usesVocabulary", EX],
      [B, SCHEMA + "name", '"A"'],
      [B, EX + "p", '"x"']])

case("usesVocabulary subject follows the rebased document", "html",
     '<html><head><base href="http://nb.example.org/"></head>'
     f'<body vocab="{SCHEMA}"><span property="name">A</span></body></html>',
     [["http://nb.example.org/", RDFA + "usesVocabulary", SCHEMA],
      ["http://nb.example.org/", SCHEMA + "name", '"A"']])

case("usesVocabulary subject is the base even under a changed subject",
     "html",
     f'<html><body><div about="#s" vocab="{SCHEMA}">'
     '<span property="name">A</span></div></body></html>',
     [[B, RDFA + "usesVocabulary", SCHEMA],
      [B + "#s", SCHEMA + "name", '"A"']])

case("unknown term without a vocab emits nothing", "html",
     '<html><body><span property="nosuchterm">x</span></body></html>',
     [])

case("@property plus @rel: rel takes href, property takes the literal",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" rel="foaf:homepage" property="foaf:name" '
     'href="http://h.example.org/">Alice</a></body></html>',
     [[B + "#a", FOAF + "homepage", "http://h.example.org/"],
      [B + "#a", FOAF + "name", '"Alice"']])

case("@property plus @rev: rev reverses to href, property stays literal",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" rev="ex:cites" property="ex:label" '
     'href="http://c.example.org/">t</a></body></html>',
     [["http://c.example.org/", EX + "cites", B + "#a"],
      [B + "#a", EX + "label", '"t"']])

case("@property with @resource and no rel: object is the resource", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#a" property="ex:p" resource="#b">text</div></body></html>',
     [[B + "#a", EX + "p", B + "#b"]])

case("@property with @href and no rel: object is the IRI", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" property="ex:p" href="http://x.example.org/">t</a>'
     '</body></html>',
     [[B + "#a", EX + "p", "http://x.example.org/"]])

case("@content beats @href for @property", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" property="ex:p" content="c" '
     'href="http://x.example.org/">t</a></body></html>',
     [[B + "#a", EX + "p", '"c"']])

case("@property with @typeof and no resource makes a typed bnode object",
     "html",
     f'<html><body prefix="{PREFIXES}"><div about="#a">'
     '<span property="ex:p" typeof="ex:T">x</span></div></body></html>',
     [[B + "#a", EX + "p", "_:b0"],
      ["_:b0", RDF + "type", EX + "T"]])

case("@property with @typeof and @resource types the resource", "html",
     f'<html><body prefix="{PREFIXES}"><div about="#a">'
     '<span property="ex:p" typeof="ex:T" resource="#r">x</span>'
     '</div></body></html>',
     [[B + "#a", EX + "p", B + "#r"],
      [B + "#r", RDF + "type", EX + "T"]])

case("multiple CURIEs in @property emit one triple each", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="dc:title foaf:name">A</span></body></html>',
     [[B, DC + "title", '"A"'],
      [B, FOAF + "name", '"A"']])

case("@rel mixing a CURIE and an unknown term keeps only the CURIE", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" rel="foaf:knows bogusterm" href="#b">x</a>'
     '</body></html>',
     [[B + "#a", FOAF + "knows", B + "#b"]])

case("<base> fragment is stripped from the document base", "html",
     '<html><head><base href="http://nb.example.org/d#frag"></head>'
     '<body><span property="schema:name">A</span></body></html>',
     [["http://nb.example.org/d", SCHEMA + "name", '"A"']])

case("safe CURIE with an undeclared prefix falls back to IRI "
     "interpretation", "html",
     # reference parity (Util.ts createIri/expandPrefixedTerm): an
     # unexpandable bracketed CURIE whose content is itself a valid IRI
     # ('bogus' reads as a scheme) becomes that IRI, not an ignore
     f'<html><body prefix="{PREFIXES}">'
     '<div about="[bogus:x]" property="dc:title">T</div></body></html>',
     [["bogus:x", DC + "title", '"T"']])

case("<time> text sniffed to xsd:dateTime", "html",
     '<html><body><time property="schema:startDate">'
     '2020-01-02T03:04:05</time></body></html>',
     [[B, SCHEMA + "startDate", f'"2020-01-02T03:04:05"^^{XSD}dateTime']])

case("<time> text sniffed to xsd:duration", "html",
     '<html><body><time property="schema:duration">P2Y6M</time>'
     '</body></html>',
     [[B, SCHEMA + "duration", f'"P2Y6M"^^{XSD}duration']])

case("@prefix redeclaration shadows the initial context", "html",
     f'<html><body prefix="schema: {EX}">'
     '<span property="schema:name">A</span></body></html>',
     [[B, EX + "name", '"A"']])

case("@property plus @rel under the 1.0 doctype (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" version="XHTML+RDFa 1.0" '
     f'xmlns:foaf="{FOAF}"><body>'
     '<a about="#a" rel="foaf:homepage" property="foaf:name" '
     'href="http://h.example.org/">Alice</a></body></html>',
     [[B + "#a", FOAF + "homepage", "http://h.example.org/"],
      [B + "#a", FOAF + "name", '"Alice"']],
     label="rdfa1.0")

case("@property with @resource under the 1.0 doctype (rdfa1.0 xhtml1)",
     "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" xmlns:dc="{DC11}"><body>'
     '<div about="#a" property="dc:title" resource="#b">T</div>'
     '</body></html>',
     [[B + "#a", DC11 + "title", B + "#b"]],
     label="rdfa1.0")

case("svg desc property literal", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:dc="{DC}">'
     '<desc property="dc:description">d</desc></svg>',
     [[B, DC + "description", '"d"']])

case("svg title property literal", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:dc="{DC}">'
     '<title property="dc:title">t</title></svg>',
     [[B, DC + "title", '"t"']])

case("svg metadata XMLLiteral captures markup with xmlns injection", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:rdf="{RDF}" '
     f'xmlns:ex="{EX}"><metadata property="ex:meta" '
     'datatype="rdf:XMLLiteral">a<x>1</x></metadata></svg>',
     [[B, EX + "meta",
       f'"a<x xmlns="http://www.w3.org/2000/svg" xmlns:ex="{EX}" '
       f'xmlns:rdf="{RDF}">1</x>"^^{RDF}XMLLiteral']])

case("svg metadata typed literal", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:ex="{EX}">'
     '<metadata property="ex:count" '
     f'datatype="http://www.w3.org/2001/XMLSchema#integer">7</metadata>'
     '</svg>',
     [[B, EX + "count", f'"7"^^{XSD}integer']])

case("svg nested g completes the hanging rel", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" xmlns:dc="{DC}">'
     '<g about="#fig" rel="dc:source"><g about="#photo"/></g></svg>',
     [[B + "#fig", DC + "source", B + "#photo"]])


# ------------------------------------------- round-4 batch-2 cases --
# <time> datatype-sniffing long tail (every TIME_REGEXES family:
# Util.ts:17-31), language resets, multi-typeof, safe-CURIE
# @resource, mixed/parallel @inlist lists, multi-target and typed
# rdfa:Pattern copies, vocab rel terms, @src objects.

# time sniffing long tail
case("<time> sniffed to xsd:time", "html",
     '<html><body><time property="schema:openingHours">09:30:00</time>'
     '</body></html>',
     [[B, SCHEMA + "openingHours", f'"09:30:00"^^{XSD}time']])

case("<time> sniffed to xsd:gYear", "html",
     '<html><body><time property="schema:copyrightYear">2019</time>'
     '</body></html>',
     [[B, SCHEMA + "copyrightYear", f'"2019"^^{XSD}gYear']])

case("<time> sniffed to xsd:gYearMonth", "html",
     '<html><body><time property="schema:issued">2019-06</time>'
     '</body></html>',
     [[B, SCHEMA + "issued", f'"2019-06"^^{XSD}gYearMonth']])

case("<time> with timezone-suffixed dateTime", "html",
     '<html><body><time property="schema:startDate">'
     '2020-01-02T03:04:05+05:30</time></body></html>',
     [[B, SCHEMA + "startDate",
       f'"2020-01-02T03:04:05+05:30"^^{XSD}dateTime']])

case("<time> non-matching text stays a plain literal", "html",
     '<html><body><time property="schema:startDate">next tuesday</time>'
     '</body></html>',
     [[B, SCHEMA + "startDate", '"next tuesday"']])

case("@datetime beats text and is sniffed", "html",
     '<html><body><time property="schema:startDate" '
     'datetime="2020-01-02">January 2nd</time></body></html>',
     [[B, SCHEMA + "startDate", f'"2020-01-02"^^{XSD}date']])

case("explicit @datatype wins over time sniffing", "html",
     f'<html><body prefix="{PREFIXES}"><time property="ex:when" '
     f'datatype="http://www.w3.org/2001/XMLSchema#string">2019</time>'
     '</body></html>',
     [[B, EX + "when", f'"2019"^^{XSD}string']])

# language corner cases
case("empty xml:lang resets inherited language", "xhtml",
     f'<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="de" '
     f'prefix="{PREFIXES}"><body>'
     '<span property="dc:title" xml:lang="">Neutral</span></body></html>',
     [[B, DC + "title", '"Neutral"']])

case("empty lang resets inherited language (html5)", "html",
     f'<html lang="de"><body prefix="{PREFIXES}">'
     '<span property="dc:title" lang="">Neutral</span></body></html>',
     [[B, DC + "title", '"Neutral"']])

# typeof / about variants
case("multiple @typeof values emit one rdf:type each", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#x" typeof="foaf:Person ex:T"></div></body></html>',
     [[B + "#x", RDF + "type", FOAF + "Person"],
      [B + "#x", RDF + "type", EX + "T"]])

case("@about on the root html element scopes the whole document", "html",
     f'<html about="#root" prefix="{PREFIXES}"><body>'
     '<span property="dc:title">T</span></body></html>',
     [[B + "#root", DC + "title", '"T"']])

case("safe CURIE in @resource", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#a" rel="dc:source" resource="[ex:r]"></div>'
     '</body></html>',
     [[B + "#a", DC + "source", EX + "r"]])

# lists
case("one @inlist list mixes rel resources and property literals", "html",
     f'<html><body prefix="{PREFIXES}"><div about="#a">'
     '<span inlist="" property="ex:p">one</span>'
     '<a inlist="" rel="ex:p" href="#two">x</a>'
     '</div></body></html>',
     [["_:l0", RDF + "first", '"one"'],
      ["_:l0", RDF + "rest", "_:l1"],
      ["_:l1", RDF + "first", B + "#two"],
      ["_:l1", RDF + "rest", RDF + "nil"],
      [B + "#a", EX + "p", "_:l0"]])

case("two different @inlist properties build independent lists", "html",
     f'<html><body prefix="{PREFIXES}"><div about="#a">'
     '<span inlist="" property="ex:p">p1</span>'
     '<span inlist="" property="ex:q">q1</span>'
     '</div></body></html>',
     [["_:l0", RDF + "first", '"p1"'],
      ["_:l0", RDF + "rest", RDF + "nil"],
      ["_:l1", RDF + "first", '"q1"'],
      ["_:l1", RDF + "rest", RDF + "nil"],
      [B + "#a", EX + "p", "_:l0"],
      [B + "#a", EX + "q", "_:l1"]])

# patterns
case("one rdfa:Pattern copied into two targets", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div resource="#pat" typeof="rdfa:Pattern">'
     '<span property="ex:tag">shared</span></div>'
     '<div about="#a"><link property="rdfa:copy" href="#pat"></div>'
     '<div about="#b"><link property="rdfa:copy" href="#pat"></div>'
     '</body></html>',
     [[B + "#a", EX + "tag", '"shared"'],
      [B + "#b", EX + "tag", '"shared"']])

case("pattern with typeof copies the type onto the target", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div resource="#pat" typeof="rdfa:Pattern">'
     '<span typeof="foaf:Person" about="#who"></span></div>'
     '<div about="#a"><link property="rdfa:copy" href="#pat"></div>'
     '</body></html>',
     [[B + "#who", RDF + "type", FOAF + "Person"]])

# property/rel term-vs-curie corners
case("bare rel term on <a> resolves via the vocab", "html",
     f'<html><body vocab="{SCHEMA}">'
     '<a about="#a" rel="author" href="#me">m</a></body></html>',
     [[B, RDFA + "usesVocabulary", SCHEMA],
      [B + "#a", SCHEMA + "author", B + "#me"]])

case("@src with @property and no rel yields the image IRI", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<img about="#a" property="ex:img" src="pic.png">'
     '</body></html>',
     [[B + "#a", EX + "img", "http://rdfa.example.org/pic.png"]])


# -------------------------------------------- round-4 long-tail additions --
# Object-position precedence, empty-valued attributes, IRI-resolution
# corners, list edge cases, RCDATA/entity decoding, and per-profile
# structural details the classic suite probes but earlier sections missed.

case("rel and rev on the same element emit forward and reverse", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" rel="ex:r" rev="ex:v" href="#b">x</a></body></html>',
     [[B + "#a", EX + "r", B + "#b"],
      [B + "#b", EX + "v", B + "#a"]])

case("@content inherits the language", "html",
     f'<html lang="en"><body prefix="{PREFIXES}">'
     '<meta about="#a" property="ex:p" content="hi"></body></html>',
     [[B + "#a", EX + "p", '"hi"@en']])

case("empty @about resolves to the base", "html",
     f'<html><body prefix="{PREFIXES}"><div about="">'
     '<span property="ex:p">v</span></div></body></html>',
     [[B, EX + "p", '"v"']])

case("empty @resource resolves to the base as object", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#a" rel="ex:r" resource=""></div></body></html>',
     [[B + "#a", EX + "r", B]])

case("query-only relative IRI appends to the base", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" rel="ex:r" href="?q=1">x</a></body></html>',
     [[B + "#a", EX + "r", B + "?q=1"]])

case("dot-segments collapse in relative IRIs", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="../up"><span property="ex:p">v</span></div>'
     '</body></html>',
     [["http://rdfa.example.org/up", EX + "p", '"v"']])

case("meta content in head attaches to the document", "html",
     f'<html><head prefix="{PREFIXES}">'
     '<meta property="dc:title" content="T"></head><body></body></html>',
     [[B, DC + "title", '"T"']])

case("empty @datatype forces a plain literal (language kept)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="ex:p" datatype="" lang="en">v</span></body></html>',
     [[B, EX + "p", '"v"@en']])

# NB: in-scope @prefix declarations are serialized into XML literals as
# xmlns: attributes (reference parity, see the svg xmlns-injection case)
# — this case uses full IRIs so the captured markup stays bare.
case("explicit rdf:XMLLiteral datatype captures markup", "html",
     '<html><body>'
     f'<span property="http://p/x" datatype="{RDF}XMLLiteral">a<b>c</b>'
     '</span></body></html>',
     [[B, "http://p/x", f'"a<b>c</b>"^^{RDF}XMLLiteral']])

case("empty @inlist rel emits rdf:nil", "html",
     f'<html><body prefix="{PREFIXES}"><div about="#par">'
     '<span rel="ex:l" inlist=""></span></div></body></html>',
     [[B + "#par", EX + "l", RDF + "nil"]])

case("three inlist members keep document order", "html",
     f'<html><body prefix="{PREFIXES}"><div about="#a">'
     '<span inlist="" property="ex:p">one</span>'
     '<span inlist="" property="ex:p">two</span>'
     '<span inlist="" property="ex:p">three</span>'
     '</div></body></html>',
     [["_:l0", RDF + "first", '"one"'],
      ["_:l0", RDF + "rest", "_:l1"],
      ["_:l1", RDF + "first", '"two"'],
      ["_:l1", RDF + "rest", "_:l2"],
      ["_:l2", RDF + "first", '"three"'],
      ["_:l2", RDF + "rest", RDF + "nil"],
      [B + "#a", EX + "p", "_:l0"]])

case("@typeof on body types the document subject", "html",
     f'<html><body prefix="{PREFIXES}" typeof="ex:T"></body></html>',
     [[B, RDF + "type", EX + "T"]])

case("title RCDATA with entity becomes the literal", "html",
     f'<html><head prefix="{PREFIXES}">'
     '<title property="dc:title">A &amp; B</title></head>'
     '<body></body></html>',
     [[B, DC + "title", '"A & B"']])

case("numeric character references decode in literals", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="ex:p">&#x41;&#66;</span></body></html>',
     [[B, EX + "p", '"AB"']])

case("@resource wins over @href for the object", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#a" rel="ex:r" resource="#r" href="#h">x</a>'
     '</body></html>',
     [[B + "#a", EX + "r", B + "#r"]])

case("bare prefix CURIE expands to the namespace IRI", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="ex:">v</span></body></html>',
     [[B, EX, '"v"']])

case("CURIE beats term when a vocab is set", "html",
     f'<html><body prefix="{PREFIXES}" vocab="{SCHEMA}">'
     '<span property="dc:title">T</span></body></html>',
     [[B, RDFA + "usesVocabulary", SCHEMA],
      [B, DC + "title", '"T"']])

case("vocab term keeps its case", "html",
     f'<html><body vocab="{SCHEMA}">'
     '<span property="fullName">F</span></body></html>',
     [[B, RDFA + "usesVocabulary", SCHEMA],
      [B, SCHEMA + "fullName", '"F"']])

case("xhtml initial-context term next on <a>", "xhtml",
     f'<html xmlns="{XHTML_NS}"><body>'
     '<a rel="next" href="n.html">n</a></body></html>',
     [[B, XHV + "next", "http://rdfa.example.org/n.html"]])

case("xml:lang tags svg literals", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<desc xml:lang="fr" property="http://p/x">b</desc></svg>',
     [[B, "http://p/x", '"b"@fr']])

case("self-closing element with @content in xml mode", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg">'
     '<metadata about="#x" property="http://p/x" content="v"/></svg>',
     [[B + "#x", "http://p/x", '"v"']])

case("content attribute beats element text (html4)", "html",
     H4DOC + f'<html><body xmlns:dc="{DC11}">'
     '<span property="dc:title" content="C">ignored</span></body></html>',
     [[B, DC11 + "title", '"C"']],
     label="html4")

case("triples before a late <base> keep the original base (streaming)",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="#early" property="ex:p">a</span>'
     '<base href="http://late.example.org/">'
     '<span about="#late" property="ex:p">b</span></body></html>',
     [[B + "#early", EX + "p", '"a"'],
      ["http://late.example.org/#late", EX + "p", '"b"']])

case("@inlist does not apply to @rev", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#a" rev="ex:v" inlist="" resource="#b"></div>'
     '</body></html>',
     [[B + "#b", EX + "v", B + "#a"]])

case("initial-context rel term allowed on <a>", "html",
     '<html><body><a rel="license" href="l.html">x</a></body></html>',
     [[B, XHV + "license", "http://rdfa.example.org/l.html"]])

# reference parity: rel terms are only restricted when @property
# co-occurs (RdfaProfile.onlyAllowUriRelRevIfProperty), NOT by element
# type — a bare term on <div> still resolves via the initial context
case("bare rel term resolves on any element without @property", "html",
     '<html><body><div rel="license" resource="#r">x</div></body></html>',
     [[B, XHV + "license", B + "#r"]])

case("@typeof with @resource and no property types the resource", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div typeof="ex:T" resource="#r"></div></body></html>',
     [[B + "#r", RDF + "type", EX + "T"]])

case("@datatype term resolves through the vocab", "html",
     f'<html><body vocab="{EX}">'
     '<span property="p" datatype="myType">v</span></body></html>',
     [[B, RDFA + "usesVocabulary", EX],
      [B, EX + "p", f'"v"^^{EX}myType']])

case("empty @content emits an empty literal", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="ex:p" content="">text ignored</span></body></html>',
     [[B, EX + "p", '""']])


# ------------------------------------------------- round-5 long-tail --
# Spec-corner growth (VERDICT round-3 item 8 continued): subject
# fallbacks, empty/invalid annotation edges, hanging-rel discard,
# datatype pass-through, rdfa1.0-doc literals under 1.1 rules,
# pattern-copy trigger parity with the reference (property-only).

# 1 href as subject
case("@href establishes the subject when no @about/@resource", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a href="#me"><span property="foaf:name">Alice</span></a>'
     '</body></html>',
     [[B + "#me", FOAF + "name", '"Alice"']])

# 2 bnode resource + label reuse
case("blank node label in @resource is shared with a later @about", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#me" rel="foaf:knows" resource="_:joe"></div>'
     '<div about="_:joe"><span property="foaf:name">Joe</span></div>'
     '</body></html>',
     [[B + "#me", FOAF + "knows", "_:joe"],
      ["_:joe", FOAF + "name", '"Joe"']])

# 3 empty property
case("empty @property emits nothing", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="">ignored</span></body></html>',
     [])

# 5 hanging rel discarded
case("hanging @rel with no completing child emits nothing", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#me" rel="foaf:knows"><span>no rdfa here</span></div>'
     '</body></html>',
     [])

# 6 empty typeof
case("empty @typeof emits no type", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#me" typeof=""><span property="foaf:name">A</span></div>'
     '</body></html>',
     [[B + "#me", FOAF + "name", '"A"']])

# 7 undeclared-prefix datatype passes through as IRI
case("undeclared-prefix @datatype passes through as a valid IRI", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="ex:p" datatype="nope:dt">v</span></body></html>',
     [[B, EX + "p", '"v"^^nope:dt']])

# 8 invalid about
case("@about with a space is not a valid IRI and is skipped", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="not a uri"><span property="dc:title">x</span></div>'
     '</body></html>',
     [[B, DC + "title", '"x"']])

# 9 base without href
case("<base> without href leaves the base unchanged", "html",
     f'<html><head><base target="_blank"/></head><body prefix="{PREFIXES}">'
     '<span property="dc:title">x</span></body></html>',
     [[B, DC + "title", '"x"']])

# 16 entity decode in svg resource attr
case("entity-encoded IRI in svg @resource decodes", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" prefix="{PREFIXES}">'
     '<g about="#me" rel="ex:link" resource="http://e.org/?a=1&amp;b=2"/>'
     '</svg>',
     [[B + "#me", EX + "link", "http://e.org/?a=1&b=2"]])

# 18 fragment-only plain resource (xhtml)
case("fragment-only @resource resolves against the base (xhtml)", "xhtml",
     f'<html xmlns="{XHTML_NS}"><body prefix="{PREFIXES}">'
     '<div about="#me" rel="ex:link" resource="#part"></div></body></html>',
     [[B + "#me", EX + "link", B + "#part"]])

# 19 void element inside literal (html4)
case("void br inside a property literal contributes no text (html4)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#me"><span property="dc:title">A<br>B</span></div>'
     '</body></html>',
     [[B + "#me", DC + "title", '"AB"']],
     label="html4")

# 20 bare boolean attribute before rdfa attrs (html4)
case("bare boolean attribute does not eat the next attribute (html4)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span hidden property="ex:p" content="v">x</span></body></html>',
     [[B, EX + "p", '"v"']],
     label="html4")

# 21 rdfa1.0 doc, markup children => plain text literal under 1.1 rules
case("markup children yield a plain text literal under 1.1 rules "
     "(rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" version="XHTML+RDFa 1.0" '
     f'xmlns:dc="{DC11}"><body>'
     '<span property="dc:title">has <b>bold</b> text</span></body></html>',
     [[B, DC11 + "title", '"has bold text"']],
     label="rdfa1.0")

# 22 rdfa1.0 src object
case("@src supplies the object for @rel (rdfa1.0 xhtml1)", "xhtml",
     R10DOC + f'<html xmlns="{XHTML_NS}" version="XHTML+RDFa 1.0" '
     f'xmlns:foaf="{FOAF}"><body>'
     '<img about="#me" rel="foaf:img" src="photo.jpg"/></body></html>',
     [[B + "#me", FOAF + "img", "http://rdfa.example.org/photo.jpg"]],
     label="rdfa1.0")

# 26 property+content on the root element
case("@property with @content on the root html element", "html",
     f'<html prefix="{PREFIXES}" property="dc:title" content="T">'
     '<body>x</body></html>',
     [[B, DC + "title", '"T"']])

# 28 sniffed datatype drops the language
case("<time> sniffed datatype drops the inherited language", "html",
     f'<html><body prefix="{PREFIXES}" lang="en">'
     '<time property="ex:d">2020-01-01</time></body></html>',
     [[B, EX + "d", f'"2020-01-01"^^{XSD}date']])

# 29 property+rel+content
case("@property with @content plus @rel: content literal, href object",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#me" property="dc:title" content="T" rel="foaf:page" '
     'href="http://e.org/p">x</a></body></html>',
     [[B + "#me", DC + "title", '"T"'],
      [B + "#me", FOAF + "page", "http://e.org/p"]])

# 30 one target referencing two patterns (property-triggered, as the
# reference requires: RdfaParser.ts:190 matches property === 'rdfa:copy')
case("one subject copies two rdfa:Patterns", "html",
     f'<html><body prefix="{PREFIXES}">'
     f'<div resource="#p1" typeof="rdfa:Pattern">'
     '<span property="dc:title">T1</span></div>'
     f'<div resource="#p2" typeof="rdfa:Pattern">'
     '<span property="dc:creator">C2</span></div>'
     '<div about="#me">'
     '<link property="rdfa:copy" href="#p1"/>'
     '<link property="rdfa:copy" href="#p2"/>'
     '</div></body></html>',
     [[B + "#me", DC + "title", '"T1"'],
      [B + "#me", DC + "creator", '"C2"']])

# 31 rel-triggered copy does NOT replay (reference parity:
# RdfaParser.ts:190 only matches property='rdfa:copy'; a rel emits the
# raw copy triple and the pattern content stays in place)
case("rel=rdfa:copy does not replay the pattern (property-only trigger)",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     f'<div resource="#p1" typeof="rdfa:Pattern">'
     '<span property="dc:title">T1</span></div>'
     '<div about="#me"><link rel="rdfa:copy" href="#p1"/></div>'
     '</body></html>',
     [[B + "#p1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
       "http://www.w3.org/ns/rdfa#Pattern"],
      [B + "#p1", DC + "title", '"T1"'],
      [B + "#me", "http://www.w3.org/ns/rdfa#copy", B + "#p1"]])


# Pattern-copy recursion parity (reference RdfaParser.ts:856: a pattern
# replaying a copy-link to ANOTHER pattern recurses; a copy-link back to
# the root pattern id is the cycle guard and is skipped), plus a second
# round-5 batch of attribute-grammar and scoping edges.

case("a pattern containing rdfa:copy to a second pattern replays both",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div resource="#p2" typeof="rdfa:Pattern">'
     '<span property="dc:creator">C2</span></div>'
     '<div resource="#p1" typeof="rdfa:Pattern">'
     '<span property="dc:title">T1</span>'
     '<link property="rdfa:copy" href="#p2"/></div>'
     '<div about="#me"><link property="rdfa:copy" href="#p1"/></div>'
     '</body></html>',
     [[B + "#me", DC + "title", '"T1"'],
      [B + "#me", DC + "creator", '"C2"']])

case("a self-referential pattern copy stops at the cycle guard", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div resource="#p1" typeof="rdfa:Pattern">'
     '<span property="dc:title">T1</span>'
     '<link property="rdfa:copy" href="#p1"/></div>'
     '<div about="#me"><link property="rdfa:copy" href="#p1"/></div>'
     '</body></html>',
     [[B + "#me", DC + "title", '"T1"']])

# 4 repeated prefix, last wins
case("repeated prefix declaration in one attribute: last wins", "html",
     f'<html><body prefix="p: {DC} p: {EX}">'
     '<span property="p:x">v</span></body></html>',
     [[B, EX + "x", '"v"']])

# 5 dangling prefix name ignored
case("dangling prefix name without an IRI is ignored", "html",
     f'<html><body prefix="dc: {DC} broken:">'
     '<span property="dc:title">T</span></body></html>',
     [[B, DC + "title", '"T"']])

# 6 typeof on root html
case("@typeof on the root html element types the base", "html",
     f'<html typeof="ex:Doc" prefix="{PREFIXES}"><body>'
     '<span property="dc:title">T</span></body></html>',
     [[B, RDF + "type", EX + "Doc"],
      [B, DC + "title", '"T"']])

# 8 same property inlist on two subjects -> two lists
case("same @inlist property on two subjects builds two lists", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#a"><span property="ex:l" inlist="">1</span></div>'
     '<div about="#b"><span property="ex:l" inlist="">2</span></div>'
     '</body></html>',
     [[B + "#a", EX + "l", "_:la"],
      ["_:la", RDF + "first", '"1"'],
      ["_:la", RDF + "rest", RDF + "nil"],
      [B + "#b", EX + "l", "_:lb"],
      ["_:lb", RDF + "first", '"2"'],
      ["_:lb", RDF + "rest", RDF + "nil"]])

# 9 svg island inside html body (html profile)
case("RDFa on an svg island inside an html body", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<svg about="#pic"><title property="dc:title">A chart</title></svg>'
     '</body></html>',
     [[B + "#pic", DC + "title", '"A chart"']])

# 10 empty rel with href emits nothing
case("empty @rel with @href emits nothing", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#me" rel="" href="#x">t</a></body></html>',
     [])

# 11 whitespace preserved in @content
case("@content whitespace is preserved verbatim", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="ex:p" content=" a  b ">x</span></body></html>',
     [[B, EX + "p", '" a  b "']])

# 12 entity decodes inside @content
case("entity reference decodes inside @content", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="ex:p" content="a&amp;b">x</span></body></html>',
     [[B, EX + "p", '"a&b"']])

# 14 about on head scopes meta children
case("@about on head scopes its meta children", "html",
     f'<html prefix="{PREFIXES}"><head about="#meta">'
     '<meta property="dc:creator" content="A"/></head>'
     '<body></body></html>',
     [[B + "#meta", DC + "creator", '"A"']])

# 16 role + typeof together
case("@role and @typeof on one element both emit", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div id="w" role="ex:widget" typeof="ex:Thing" about="#t"></div>'
     '</body></html>',
     [[B + "#w", XHV + "role", EX + "widget"],
      [B + "#t", RDF + "type", EX + "Thing"]])


# --------------------------------------------- round-5 batch-3 cases --
# Safe-CURIE null-resolution fallbacks, case-insensitive term lookup,
# the default ':' prefix, and the attribute-PRESENCE (not value) checks
# in processing steps 5.1/11 (reference RdfaParser.ts:280-314,494-496:
# `'about' in attributes` gates the typeof→object chain even when the
# about value resolves to null; Util.ts:266-272 nulls bracket terms
# without a colon; Util.ts:98-101 expands the '' prefix to xhv;
# Util.ts:112-117 lowercases term lookups; Util.ts:276 names the '_:'
# identity blank node b_identity).

case("empty safe CURIE [] in @about resolves null and falls back", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="[]"><span property="dc:title">x</span></div>'
     '</body></html>',
     [[B, DC + "title", '"x"']])

case("bracketed term without a colon is not a safe CURIE", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="[foo]"><span property="dc:title">x</span></div>'
     '</body></html>',
     [[B, DC + "title", '"x"']])

case("bare-colon safe CURIE expands through the default xhv prefix",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span property="[:]">x</span></body></html>',
     [[B, XHV, '"x"']])

case("default ':' prefix CURIE in @rel expands to xhv", "html",
     '<html><body>'
     '<a about="#s" rel=":next" href="http://n.org/">x</a></body></html>',
     [[B + "#s", XHV + "next", "http://n.org/"]])

case("'_:' resolves to one shared identity blank node", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="_:"><span property="dc:title">x</span></div>'
     '<div about="_:"><span property="dc:creator">y</span></div>'
     '<div about="_:other"><span property="dc:title">z</span></div>'
     '</body></html>',
     [["_:b_identity", DC + "title", '"x"'],
      ["_:b_identity", DC + "creator", '"y"'],
      ["_:other", DC + "title", '"z"']])

case("uppercase xhtml term in @rel matches case-insensitively", "xhtml",
     f'<html xmlns="{XHTML_NS}"><body>'
     '<a about="#s" rel="LICENSE" href="http://l.org/">x</a>'
     '</body></html>',
     [[B + "#s", XHV + "license", "http://l.org/"]])

case("mixed-case xhtml term in @property matches case-insensitively",
     "xhtml",
     f'<html xmlns="{XHTML_NS}"><body>'
     '<span about="#s" property="License">x</span></body></html>',
     [[B + "#s", XHV + "license", '"x"']])

case("null-resolving @about with @typeof types a fresh bnode; "
     "the property literal stays on the inherited subject", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="[nope]" typeof="ex:T" property="ex:p">x</span>'
     '</body></html>',
     [["_:t", RDF + "type", EX + "T"],
      [B, EX + "p", '"x"']])

case("@typeof with @resource redirects @property to the resource", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span typeof="ex:T" resource="#o" property="ex:p">x</span>'
     '</body></html>',
     [[B + "#o", RDF + "type", EX + "T"],
      [B, EX + "p", B + "#o"]])

case("@typeof with @href redirects @property to the href", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a typeof="ex:T" href="http://o.org/" property="ex:p">x</a>'
     '</body></html>',
     [["http://o.org/", RDF + "type", EX + "T"],
      [B, EX + "p", "http://o.org/"]])

case("null-resolving @resource under @rel falls back to @href", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" rel="ex:r" resource="[nope]" href="http://o.org/">x</a>'
     '</body></html>',
     [[B + "#s", EX + "r", "http://o.org/"]])

case("null-resolving @about under @rel: no type triple, hanging rel "
     "completed by a child on a fresh bnode", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="[nope]" rel="ex:r" typeof="ex:T">'
     '<span property="ex:q">v</span></div></body></html>',
     [[B, EX + "r", "_:o"],
      ["_:o", EX + "q", '"v"']])

case("XMLLiteral capture still processes nested RDFa", "html",
     f'<html><body prefix="{PREFIXES} rdf: {RDF}">'
     '<div about="#s" property="ex:p" datatype="rdf:XMLLiteral">t '
     '<span property="ex:q">inner</span></div></body></html>',
     [[B + "#s", EX + "q", '"inner"'],
      [B + "#s", EX + "p",
       '"t <span property="ex:q" xmlns:dc="http://purl.org/dc/terms/" '
       'xmlns:ex="http://example.org/vocab#" '
       'xmlns:foaf="http://xmlns.com/foaf/0.1/" '
       f'xmlns:rdf="{RDF}">inner</span>"^^{RDF}XMLLiteral']])


# --- attribute-value grammar corners (RdfaParser.ts:388,460-556;
# --- Util.ts:182-213 createVocabIris/createLiteral/TIME_REGEXES) ---------

case("duplicate values in @property emit duplicate triples", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="#s" property="ex:p ex:p">x</span></body></html>',
     [[B + "#s", EX + "p", '"x"'],
      [B + "#s", EX + "p", '"x"']])

case("@content wins under rdf:XMLLiteral datatype; children are not "
     "re-emitted as a literal", "html",
     f'<html><body prefix="{PREFIXES} rdf: {RDF}">'
     '<div about="#s" property="ex:p" datatype="rdf:XMLLiteral" '
     'content="c"><b>x</b></div></body></html>',
     [[B + "#s", EX + "p", f'"c"^^{RDF}XMLLiteral']])

case("time-tag datatype sniffing applies to the @content value", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<time about="#s" property="ex:p" content="2015">2012-03-18</time>'
     '</body></html>',
     [[B + "#s", EX + "p", f'"2015"^^{XSD}gYear']])

case("@datetime sniffs on any element, not just <time>", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="#s" property="ex:p" datetime="2012-03-18">x</span>'
     '</body></html>',
     [[B + "#s", EX + "p", f'"2012-03-18"^^{XSD}date']])

case("empty @href under @rel resolves to the base as object", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" rel="ex:r" href="">x</a></body></html>',
     [[B + "#s", EX + "r", B]])

case("blank-node CURIE in @typeof becomes the type object", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#s" typeof="_:x"></div></body></html>',
     [[B + "#s", RDF + "type", "_:x"]])

case("blank-node CURIE in @property is dropped, valid sibling kept",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="#s" property="_:p ex:q">x</span></body></html>',
     [[B + "#s", EX + "q", '"x"']])

case("safe CURIE is allowed in @rel", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" rel="[ex:r]" href="#o">x</a></body></html>',
     [[B + "#s", EX + "r", B + "#o"]])

case("safe CURIE with undeclared prefix in @rel falls back to IRI "
     "interpretation", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" rel="[nope:x]" href="#o">x</a></body></html>',
     [[B + "#s", "nope:x", B + "#o"]])

case("non-ASCII CURIE localname expands in @about", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="ex:héllo" property="ex:p">x</div></body></html>',
     [[EX + "héllo", EX + "p", '"x"']])

case("empty-localname CURIE in @property resolves to the namespace IRI",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="#s" property="ex:">x</span></body></html>',
     [[B + "#s", EX, '"x"']])

case("safe CURIE is allowed in @datatype", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="#s" property="ex:p" datatype="[ex:dt]">x</span>'
     '</body></html>',
     [[B + "#s", EX + "p", f'"x"^^{EX}dt']])

case("xml:base fragment is stripped from the scoped base (svg)", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" '
     f'prefix="{PREFIXES}" xml:base="http://img.example.org/d#frag">'
     '<text about="#s" property="ex:p">x</text></svg>',
     [["http://img.example.org/d#s", EX + "p", '"x"']],
     label="svg")

case("negative duration is sniffed to xsd:duration", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<time about="#s" property="ex:p">-P10Y</time></body></html>',
     [[B + "#s", EX + "p", f'"-P10Y"^^{XSD}duration']])

case("five-digit year still sniffs xsd:date", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<time about="#s" property="ex:p">12345-01-02</time></body></html>',
     [[B + "#s", EX + "p", f'"12345-01-02"^^{XSD}date']])


# --- rawtext/RCDATA islands inside literals; IRI resolution corners ----

case("script content is raw text inside a property literal", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="#s" property="ex:p"><script>if(a<b)x()</script>!</span>'
     '</body></html>',
     [[B + "#s", EX + "p", '"if(a<b)x()!"']])

case("style content is raw text inside a property literal", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#s" property="ex:p"><style>a>b{color:red}</style>t</div>'
     '</body></html>',
     [[B + "#s", EX + "p", '"a>b{color:red}t"']])

case("a mismatched end tag does not close <script>", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="#s" property="ex:p">'
     '<script>a</scripty>b</script>c</span></body></html>',
     [[B + "#s", EX + "p", '"a</scripty>bc"']])

case("textarea RCDATA decodes entities but keeps tags literal", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<textarea about="#s" property="ex:p">&amp;<b>x</b></textarea>'
     '</body></html>',
     [[B + "#s", EX + "p", '"&<b>x</b>"']])

case("newline-separated @prefix declaration still maps", "html",
     f'<html><body prefix="ex:\n{EX}">'
     '<span about="#s" property="ex:p">x</span></body></html>',
     [[B + "#s", EX + "p", '"x"']])

case("dot-dot segments beyond the root are dropped (RFC 3986)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="../../up" property="ex:p">x</div></body></html>',
     [["http://rdfa.example.org/up", EX + "p", '"x"']])

case("network-path reference keeps the base scheme", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="//other.example.net/p" property="ex:p">x</div>'
     '</body></html>',
     [["http://other.example.net/p", EX + "p", '"x"']])

case("empty @datetime emits an empty plain literal", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<time about="#s" property="ex:p" datetime="">x</time>'
     '</body></html>',
     [[B + "#s", EX + "p", '""']])


# --- chaining via resource/href; core profile; feature overrides ------

case("xmlns: prefix mapping works in the html5 profile too", "html",
     f'<html xmlns:ex="{EX}"><body>'
     '<span about="#s" property="ex:p">x</span></body></html>',
     [[B + "#s", EX + "p", '"x"']])

case("@resource consumed by @property (no @typeof) does NOT chain: "
     "children stay on the @about subject", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#s" property="ex:p" resource="#o">'
     '<span property="ex:q">v</span></div></body></html>',
     [[B + "#s", EX + "p", B + "#o"],
      [B + "#s", EX + "q", '"v"']])

case("@href consumed by @property (no @typeof) does NOT chain either",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" property="ex:p" href="http://o.org/">'
     '<span property="ex:q">v</span></a></body></html>',
     [[B + "#s", EX + "p", "http://o.org/"],
      [B + "#s", EX + "q", '"v"']])

case("<base> has no effect in the core profile (baseTag off)", "core",
     f'<html><head><base href="http://moved.example.org/"/></head>'
     f'<body prefix="{PREFIXES}">'
     '<span about="#s" property="ex:p">x</span></body></html>',
     [[B + "#s", EX + "p", '"x"']],
     label="core")

case("core profile: <time> text is not sniffed and @datetime is ignored",
     "core",
     f'<html><body prefix="{PREFIXES}">'
     '<time about="#s" property="ex:p" datetime="2012-03-18">2015</time>'
     '</body></html>',
     [[B + "#s", EX + "p", '"2015"']],
     label="core")

_HTML_FEATURES_PLUS_SKIP = {
    "baseTag": True, "langAttribute": True,
    "onlyAllowUriRelRevIfProperty": True,
    "inheritSubjectInHeadBody": True, "datetimeAttribute": True,
    "timeTag": True, "htmlDatatype": True, "copyRdfaPatterns": True,
    "xmlnsPrefixMappings": True, "roleAttribute": True,
    "skipHandlingXmlLiteralChildren": True,
}

case("skipHandlingXmlLiteralChildren suppresses nested RDFa inside an "
     "XMLLiteral capture (markup still serialized)", "html",
     f'<html><body prefix="{PREFIXES} rdf: {RDF}">'
     '<div about="#s" property="ex:p" datatype="rdf:XMLLiteral">t '
     '<span property="ex:q">inner</span></div></body></html>',
     [[B + "#s", EX + "p",
       '"t <span property="ex:q" xmlns:dc="http://purl.org/dc/terms/" '
       'xmlns:ex="http://example.org/vocab#" '
       'xmlns:foaf="http://xmlns.com/foaf/0.1/" '
       f'xmlns:rdf="{RDF}">inner</span>"^^{RDF}XMLLiteral']],
     features=_HTML_FEATURES_PLUS_SKIP)


# --- vocab/prefix value grammar (Util.ts:16,52-80; emitTriple gate) ----

case("relative @vocab: terms expand but every triple fails the "
     "emit validity gate (no colon)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div vocab="foo/" about="#s" property="bar">x</div></body></html>',
     [])

case("prefix mapped to a relative IRI: CURIEs resolve against the "
     "document base after expansion (@property)", "html",
     '<html><body prefix="rel: doc2#">'
     '<span about="#s" property="rel:x">v</span></body></html>',
     [[B + "#s", "http://rdfa.example.org/doc2#x", '"v"']])

case("prefix mapped to a relative IRI resolves in @about too", "html",
     f'<html><body prefix="rel: doc2# {PREFIXES}">'
     '<div about="rel:x" property="ex:p">v</div></body></html>',
     [["http://rdfa.example.org/doc2#x", EX + "p", '"v"']])

case("the ':' default prefix stays xhv even when a bare xmlns "
     "declares an empty-prefix mapping (expandPrefixedTerm "
     "special-cases '' before any lookup)", "html",
     '<html><body>'
     '<div xmlns="http://d.org/ns#" about="#s" property=":p">x</div>'
     '</body></html>',
     [[B + "#s", XHV + "p", '"x"']])

case("a colon-less term that equals a declared prefix NAME expands to "
     "that namespace IRI (term branch, lowercased lookup)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<span about="#s" property="EX">v</span></body></html>',
     [[B + "#s", EX, '"v"']])


# --- IRI validity-gate corners (Util.ts:32 IRI_REGEX) ------------------

case("digit-leading scheme is no scheme at all: the value resolves as "
     "a RELATIVE reference against the base", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="1http://x.org/y" property="ex:p">v</div></body></html>',
     [["http://rdfa.example.org/1http://x.org/y", EX + "p", '"v"']])

case("underscore-prefixed scheme (not a bare bnode, prefix undeclared) "
     "also resolves as a relative reference", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="_x:y" property="ex:p">v</div></body></html>',
     [["http://rdfa.example.org/_x:y", EX + "p", '"v"']])

case("curly brace makes @resource invalid; @href takes over as the "
     "property object", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" property="ex:p" resource="http://x.org/{t}" '
     'href="#o">v</a></body></html>',
     [[B + "#s", EX + "p", B + "#o"]])

case("a literal tab inside an IRI is allowed by the validity gate "
     "(only space is excluded)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="http://x.org/a\tb" property="ex:p">v</div>'
     '</body></html>',
     [["http://x.org/a\tb", EX + "p", '"v"']])

case("non-ASCII characters are valid in @href", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" rel="ex:r" href="http://x.org/π">v</a></body></html>',
     [[B + "#s", EX + "r", "http://x.org/π"]])


# --- text propagation; attribute PRESENCE (not value) gates ------------

case("nested @property elements: inner text feeds both literals", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#s" property="ex:o">A<span property="ex:i">B</span>C'
     '</div></body></html>',
     [[B + "#s", EX + "i", '"B"'],
      [B + "#s", EX + "o", '"ABC"']])

case("inner @content consumes the inner predicate but its element text "
     "still feeds the outer literal", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#s" property="ex:o">A'
     '<span property="ex:i" content="X">B</span>C</div></body></html>',
     [[B + "#s", EX + "i", '"X"'],
      [B + "#s", EX + "o", '"ABC"']])

case("time sniffing applies to tag-stripped text (markup inside <time>)",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<time about="#s" property="ex:p"><b>2015</b></time></body></html>',
     [[B + "#s", EX + "p", f'"2015"^^{XSD}gYear']])

case("html5: a colon-less @rel next to @property is DELETED "
     "(onlyAllowUriRelRevIfProperty), so @property takes the href "
     "object", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" property="ex:p" rel="" href="#o">x</a></body></html>',
     [[B + "#s", EX + "p", B + "#o"]])

case("xml profile: empty @rel STAYS present (feature off) and gates "
     "@property back to the text literal", "xml",
     f'<svg xmlns="http://www.w3.org/2000/svg" prefix="{PREFIXES}">'
     '<a about="#s" property="ex:p" rel="" href="#o">x</a></svg>',
     [[B + "#s", EX + "p", '"x"']],
     label="svg")


# --- initial-context long tail (lib/initial-context.json parity) -------

case("initial-context og prefix needs no declaration", "html",
     '<html><body>'
     '<meta about="#s" property="og:title" content="T"/></body></html>',
     [[B + "#s", "http://ogp.me/ns#title", '"T"']])

case("initial-context skos prefix works in @typeof", "html",
     '<html><body><div about="#s" typeof="skos:Concept"></div>'
     '</body></html>',
     [[B + "#s", RDF + "type",
       "http://www.w3.org/2004/02/skos/core#Concept"]])

case("initial-context term describedby resolves in @rel", "html",
     '<html><body><a about="#s" rel="describedby" href="#o">x</a>'
     '</body></html>',
     [[B + "#s", "http://www.w3.org/2007/05/powder-s#describedby",
       B + "#o"]])

case("initial-context term lookup is case-insensitive (DESCRIBEDBY)",
     "html",
     '<html><body><a about="#s" rel="DESCRIBEDBY" href="#o">x</a>'
     '</body></html>',
     [[B + "#s", "http://www.w3.org/2007/05/powder-s#describedby",
       B + "#o"]])


# --- @src resolution chain + attribute-TRUTHINESS fallthroughs ---------
# The reference resolves subjects/objects via JS `attributes.a || b`
# (lib/RdfaParser.ts:191,305,318,322), so an EMPTY attribute value falls
# through to the next attribute in branch 5.2 — while branch 5.1 tests
# `'about' in attributes` and does NOT fall through.  Pin both sides.

case("@src supplies the new subject in 5.2 (content forces the branch)",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<img src="img.png" property="ex:p" content="X"/></body></html>',
     [[B.rsplit("/", 1)[0] + "/img.png", EX + "p", '"X"']])

case("@typeof with @src redirects @property to the src resource", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<img property="ex:p" typeof="ex:T" src="i.png"/></body></html>',
     [[B.rsplit("/", 1)[0] + "/i.png", RDF + "type", EX + "T"],
      [B, EX + "p", B.rsplit("/", 1)[0] + "/i.png"]])

case("@href takes precedence over @src on the object side", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" rel="ex:r" href="h.html" src="s.png">x</a>'
     '</body></html>',
     [[B + "#s", EX + "r", B.rsplit("/", 1)[0] + "/h.html"]])

case("head @property+@typeof: typedResource inherits the head subject "
     "(inheritSubjectInHeadBody in the 5.1 type cascade)", "html",
     f'<html prefix="{PREFIXES}">'
     '<head property="ex:p" typeof="ex:T"><title>T</title></head></html>',
     [[B, RDF + "type", EX + "T"],
      [B, EX + "p", B]])

case("@property+@content+@typeof makes a typed bnode carrying the "
     "literal", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div property="ex:p" content="X" typeof="ex:T"></div></body></html>',
     [["_:b0", RDF + "type", EX + "T"],
      ["_:b0", EX + "p", '"X"']])

case("empty @about falls through to @resource in 5.2 (JS || truthiness)",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="" resource="#r" property="ex:p" content="X"></div>'
     '</body></html>',
     [[B + "#r", EX + "p", '"X"']])

case("empty @about in 5.1 resolves to base — no resource fallthrough "
     "('about' in attributes, not truthiness)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="" resource="#r" property="ex:p">v</div></body></html>',
     [[B, EX + "p", B + "#r"]])

case("empty @href falls through to @src for the 5.2 subject", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a href="" src="s.png" property="ex:p" content="X">x</a>'
     '</body></html>',
     [[B.rsplit("/", 1)[0] + "/s.png", EX + "p", '"X"']])

case("@about+@resource+@datatype: typed literal stays on the about "
     "subject; @resource is ignored entirely (datatype suppresses the "
     "resource-object cascade)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#s" resource="#r" property="ex:p" datatype="ex:dt">v'
     '</div></body></html>',
     [[B + "#s", EX + "p", f'"v"^^{EX}dt']])


# --- language truthiness, constructor-vocab restore, the '' profile, ----
# --- and xml:base scope interaction with skip-elements ------------------

case("empty xml:lang falls through to @lang for the value (the gate "
     "tests xml:lang PRESENCE, the value uses || truthiness)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div xml:lang="" lang="fr" property="ex:p">v</div></body></html>',
     [[B, EX + "p", '"v"@fr']])

case("empty @vocab restores the CONSTRUCTOR vocab, not no-vocab "
     "(RdfaParser.ts:235-236 falls back to the root tag's vocab)", "html",
     '<html><body><div vocab="http://other.org/ns#">'
     '<span vocab="" property="p">v</span></div></body></html>',
     [[B, RDFA + "usesVocabulary", "http://other.org/ns#"],
      [B, "http://ctor.example.org/ns#p", '"v"']],
     vocab="http://ctor.example.org/ns#")

case("unknown-profile '' feature set: xhv term, @datetime and @role "
     "are all active at once", "",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" rel="next" href="#o">n</a>'
     '<time about="#s" property="ex:d" datetime="2020-01-02">x</time>'
     '<div id="w" role="banner">r</div></body></html>',
     [[B + "#s", XHV + "next", B + "#o"],
      [B + "#s", EX + "d", f'"2020-01-02"^^{XSD}date'],
      [B + "#w", XHV + "role", XHV + "banner"]],
     label="default")

case("unknown-profile '' feature set honors the <base> tag", "",
     '<html><head><base href="http://based.example.org/x"/></head>'
     f'<body prefix="{PREFIXES}">'
     '<span about="#f" property="ex:p">v</span></body></html>',
     [["http://based.example.org/x#f", EX + "p", '"v"']],
     label="default")

case("xml:base on a SKIP-element is lost for children (the skip-parent "
     "context copy restores lang/prefixes/vocab only, "
     "RdfaParser.ts:95-104)", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'prefix="ex: http://example.org/vocab#">'
     '<g xml:base="http://alt.example.org/dir/">'
     '<text about="rel.html" property="ex:p">v</text></g></svg>',
     [[B.rsplit("/", 1)[0] + "/rel.html", EX + "p", '"v"']],
     label="svg")

case("xml:base on a non-skipped element applies to its own @about and "
     "scopes its children", "xml",
     '<svg xmlns="http://www.w3.org/2000/svg" '
     'prefix="ex: http://example.org/vocab#">'
     '<g xml:base="http://alt.example.org/dir/" about="own.html" '
     'property="ex:o">'
     '<text about="rel.html" property="ex:p">v</text></g></svg>',
     [["http://alt.example.org/dir/own.html", EX + "o", '"v"'],
      ["http://alt.example.org/dir/rel.html", EX + "p", '"v"']],
     label="svg")


case("@content beats @datetime, and a non-time carrier gets NO "
     "datatype sniffing (content branch never sets "
     "interpretObjectAsTime)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#s" property="ex:p" content="2020-01-02" '
     'datetime="2030-05-05">t</div></body></html>',
     [[B + "#s", EX + "p", '"2020-01-02"']])

case("@datetime with @inlist builds an rdf list of sniffed time "
     "literals", "html",
     f'<html><body prefix="{PREFIXES}"><div about="#s">'
     '<time property="ex:p" inlist="" datetime="2020-01-02">a</time>'
     '<time property="ex:p" inlist="" datetime="2021-03-04">b</time>'
     '</div></body></html>',
     [["_:l0", RDF + "first", f'"2020-01-02"^^{XSD}date'],
      ["_:l0", RDF + "rest", "_:l1"],
      ["_:l1", RDF + "first", f'"2021-03-04"^^{XSD}date'],
      ["_:l1", RDF + "rest", RDF + "nil"],
      [B + "#s", EX + "p", "_:l0"]])


# --- pattern/copy trigger EXACT-string matching (RdfaParser.ts:176,190) -

case("multi-valued @typeof including rdfa:Pattern is NOT a pattern "
     "(the trigger is an exact string compare)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div typeof="rdfa:Pattern ex:T"><span property="ex:p">v</span>'
     '</div></body></html>',
     [["_:b0", RDF + "type", RDFA + "Pattern"],
      ["_:b0", RDF + "type", EX + "T"],
      ["_:b0", EX + "p", '"v"']])

case("full-IRI @typeof rdfa#Pattern is NOT a pattern either", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div typeof="http://www.w3.org/ns/rdfa#Pattern">'
     '<span property="ex:p">v</span></div></body></html>',
     [["_:b0", RDF + "type", RDFA + "Pattern"],
      ["_:b0", EX + "p", '"v"']])

case("rdfa:copy target: empty @resource falls through to @href "
     "(|| truthiness at RdfaParser.ts:191)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div typeof="rdfa:Pattern" resource="#pat">'
     '<span property="ex:q">Q</span></div>'
     '<div about="#s"><link property="rdfa:copy" resource="" '
     'href="#pat"/></div></body></html>',
     [[B + "#s", EX + "q", '"Q"']])

case("full-IRI @property rdfa#copy is NOT a copy trigger: it emits a "
     "plain triple and leaves the pattern unreferenced (plain replay)",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div typeof="rdfa:Pattern" resource="#pat">'
     '<span property="ex:q">Q</span></div>'
     '<div about="#s"><link '
     'property="http://www.w3.org/ns/rdfa#copy" href="#pat"/></div>'
     '</body></html>',
     [[B + "#s", RDFA + "copy", B + "#pat"],
      [B + "#pat", RDF + "type", RDFA + "Pattern"],
      [B + "#pat", EX + "q", '"Q"']])


case("empty @href falls through to @src on the @rel OBJECT side too "
     "(RdfaParser.ts:370)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" rel="ex:r" href="" src="s.png">x</a></body></html>',
     [[B + "#s", EX + "r", B.rsplit("/", 1)[0] + "/s.png"]])


# --- time-sniffing regex long tail (Util.ts:17-30) ----------------------

case("bare 'P' sniffs as xsd:duration (every duration group is "
     "optional)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<time about="#s" property="ex:p" datetime="P">x</time>'
     '</body></html>',
     [[B + "#s", EX + "p", f'"P"^^{XSD}duration']])

case("date with a Z suffix sniffs as xsd:date", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<time about="#s" property="ex:p" datetime="2020-01-02Z">x</time>'
     '</body></html>',
     [[B + "#s", EX + "p", f'"2020-01-02Z"^^{XSD}date']])

case("fractional-second dateTime matches NO sniffing regex: plain "
     "literal", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<time about="#s" property="ex:p" '
     'datetime="2020-01-02T01:02:03.5">x</time></body></html>',
     [[B + "#s", EX + "p", '"2020-01-02T01:02:03.5"']])

case("time-of-day with a timezone offset sniffs as xsd:time", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<time about="#s" property="ex:p" datetime="01:02:03+05:00">x'
     '</time></body></html>',
     [[B + "#s", EX + "p", f'"01:02:03+05:00"^^{XSD}time']])


# --- pattern STORAGE id quirks (patterns key on @resource only; -------
# --- onTagClose deletes typeof/resource, onEnd restores them) ----------

case("a dangling rdfa:copy replays as a plain rdfa#copy triple at the "
     "end (pending-copy replay runs with copyRdfaPatterns disabled)",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#s"><link property="rdfa:copy" href="#nope"/></div>'
     '</body></html>',
     [[B + "#s", RDFA + "copy", B + "#nope"]])

case("a pattern declared with @about (no @resource) is stored under "
     "the key 'undefined' and never matches a copy: the copy dangles "
     "and the pattern replays unreferenced on its about subject",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div typeof="rdfa:Pattern" about="#pat">'
     '<span property="ex:q">Q</span></div>'
     '<div about="#s"><link property="rdfa:copy" href="#pat"/></div>'
     '</body></html>',
     [[B + "#pat", RDF + "type", RDFA + "Pattern"],
      [B + "#pat", EX + "q", '"Q"'],
      [B + "#s", RDFA + "copy", B + "#pat"]])

case("two @about-only patterns collide on the 'undefined' storage key: "
     "the second overwrites the first, whose content VANISHES", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div typeof="rdfa:Pattern" about="#p1">'
     '<span property="ex:a">A</span></div>'
     '<div typeof="rdfa:Pattern" about="#p2">'
     '<span property="ex:b">B</span></div></body></html>',
     [[B + "#p2", RDF + "type", RDFA + "Pattern"],
      [B + "#p2", EX + "b", '"B"']])


case("a literal-emitting child under a PLAIN middle element has its "
     "text consumed: the outer literal skips it (text resets only "
     "when the IMMEDIATE parent lacks predicates)", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#s" property="ex:o">A<span>B<i property="ex:i">C</i>'
     'D</span>E</div></body></html>',
     [[B + "#s", EX + "i", '"C"'],
      [B + "#s", EX + "o", '"ABDE"']])


case("one hanging @rel is completed by EVERY descendant subject: two "
     "siblings (one through a plain middle element) give two triples",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#s" rel="ex:r"><span><a about="#o1">x</a></span>'
     '<a about="#o2">y</a></div></body></html>',
     [[B + "#s", EX + "r", B + "#o1"],
      [B + "#s", EX + "r", B + "#o2"]])

case("hanging @rel pre-creates a bnode object (RdfaParser.ts:461-462): "
     "a property-only child chains onto it", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div about="#s" rel="ex:r"><span property="ex:p">text</span>'
     '</div></body></html>',
     [[B + "#s", EX + "r", "_:b0"],
      ["_:b0", EX + "p", '"text"']])


case("relative prefix expansion in VOCAB mode resolves against the "
     "FROZEN document base (Util.ts:42,291), while base-mode terms "
     "follow the <base> override — one triple, three bases", "html",
     '<html><head><base href="http://based.example.org/dir/"/></head>'
     '<body prefix="p: rel/">'
     '<span about="#s" property="p:x" resource="p:y">v</span>'
     '</body></html>',
     [["http://based.example.org/dir/#s",
       B.rsplit("/", 1)[0] + "/rel/x",
       "http://based.example.org/dir/rel/y"]])


case("an 'xmlns'-prefixed attribute WITHOUT a colon still declares a "
     "prefix via slice(6): xmlnsabc maps prefix 'bc' (Util.ts:60-61)",
     "html",
     '<html><body><div xmlnsabc="http://x.example.org/" '
     'property="bc:p">v</div></body></html>',
     [[B, "http://x.example.org/p", '"v"']])

case("PREFIX lookup is case-sensitive (only term lookup lowercases): "
     "EX:p with only ex declared passes through as the IRI EX:p",
     "html",
     '<html><body prefix="ex: http://example.org/vocab#">'
     '<div about="#s" property="EX:p">v</div></body></html>',
     [[B + "#s", "EX:p", '"v"']])


case("@href '_:foo' is NOT a bnode (no CURIE path for href): the "
     "resolver treats '_' as no scheme and resolves it as a relative "
     "reference", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" rel="ex:r" href="_:foo">x</a></body></html>',
     [[B + "#s", EX + "r", B.rsplit("/", 1)[0] + "/_:foo"]])


case("core profile: head @property+@typeof types a FRESH bnode "
     "(inheritSubjectInHeadBody off — contrast with the html5 pin)",
     "core",
     '<html prefix="ex: http://example.org/vocab#">'
     '<head property="ex:p" typeof="ex:T"><title>T</title></head></html>',
     [["_:b0", RDF + "type", EX + "T"],
      [B, EX + "p", "_:b0"]],
     label="core")


case("pattern-internal bnodes are instantiated ONCE: later copies "
     "REUSE the first copy's blank nodes (RdfaParser.ts:823-835)",
     "html",
     f'<html><body prefix="{PREFIXES}">'
     '<div typeof="rdfa:Pattern" resource="#pat">'
     '<span rel="ex:r"><span typeof="ex:T"></span></span></div>'
     '<div about="#a"><link property="rdfa:copy" href="#pat"/></div>'
     '<div about="#b"><link property="rdfa:copy" href="#pat"/></div>'
     '</body></html>',
     [["_:b0", RDF + "type", EX + "T"],
      [B + "#a", EX + "r", "_:b0"],
      [B + "#b", EX + "r", "_:b0"]])

case("@rel+@typeof+@href without @about types the OBJECT", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a rel="ex:r" typeof="ex:T" href="#o">x</a></body></html>',
     [[B + "#o", RDF + "type", EX + "T"],
      [B, EX + "r", B + "#o"]])

case("@rel+@typeof WITH @about types the SUBJECT instead", "html",
     f'<html><body prefix="{PREFIXES}">'
     '<a about="#s" rel="ex:r" typeof="ex:T" href="#o">x</a>'
     '</body></html>',
     [[B + "#s", RDF + "type", EX + "T"],
      [B + "#s", EX + "r", B + "#o"]])


def main() -> None:
    out = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "w3c_style.json"
    out.write_text(json.dumps(CASES, indent=1))
    print(f"wrote {len(CASES)} cases -> {out}")


if __name__ == "__main__":
    main()
