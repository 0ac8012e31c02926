"""Scalar term-construction unit tests, ported from the reference's
Util-test.ts (prefix parsing :23-172, CURIE/IRI creation :281-485,
literal + time sniffing :487-638, vocab-IRI splitting :640-768)."""

import pytest

from rdfa_streaming_parser_js_ray.core.evaluator import ActiveTag, RdfaEvaluator
from rdfa_streaming_parser_js_ray.core.iri import resolve_iri
from rdfa_streaming_parser_js_ray.core.profiles import content_type_to_profile
from rdfa_streaming_parser_js_ray.core.terms import (
    XSD, BlankNode, Literal, NamedNode, expand_prefixed_term, is_valid_iri,
    parse_prefixes,
)


def make_eval(base="http://example.org/"):
    return RdfaEvaluator(base_iri=base)


def make_tag(prefixes=None, vocab=None, language=None, datatype=None,
             interpret_time=False):
    tag = ActiveTag()
    tag.prefixes_all = prefixes or {}
    tag.vocab = vocab
    tag.language = language
    tag.datatype = NamedNode(datatype) if datatype else None
    tag.interpret_object_as_time = interpret_time
    return tag


# --- parsePrefixes (Util-test.ts:23-172) -----------------------------------

def clean(d):
    return {k: v for k, v in d.items() if v}


def test_parse_prefixes_cases():
    assert parse_prefixes({}, {}, False) == {}
    assert parse_prefixes({"prefix": ""}, {}, False) == {}
    assert clean(parse_prefixes({"prefix": "dc: http://purl.org/dc/terms/"}, {}, False)) \
        == {"dc": "http://purl.org/dc/terms/"}
    assert clean(parse_prefixes(
        {"prefix": "dc: http://purl.org/dc/terms/ abc: http://example.org"}, {}, False)) \
        == {"dc": "http://purl.org/dc/terms/", "abc": "http://example.org"}
    # invalid entries silently ignored
    assert clean(parse_prefixes(
        {"prefix": "dc: http://purl.org/dc/terms/ abc"}, {}, False)) \
        == {"dc": "http://purl.org/dc/terms/"}
    assert clean(parse_prefixes(
        {"prefix": "dc: http://purl.org/dc/terms/ abc:"}, {}, False)) \
        == {"dc": "http://purl.org/dc/terms/"}
    # parent inheritance / merging / overriding
    assert parse_prefixes({}, {"ex": "http://example.org"}, False) \
        == {"ex": "http://example.org"}
    assert clean(parse_prefixes({"prefix": "dc: http://purl.org/dc/terms/"},
                                {"ex": "http://example.org"}, False)) \
        == {"dc": "http://purl.org/dc/terms/", "ex": "http://example.org"}
    assert clean(parse_prefixes({"prefix": "dc: http://purl.org/dc/terms/"},
                                {"dc": "http://example.org"}, False)) \
        == {"dc": "http://purl.org/dc/terms/"}
    # newlines inside the attribute
    assert clean(parse_prefixes(
        {"prefix": "dc: http://purl.org/dc/terms/\nex: \nhttp://example.org/"},
        {}, False)) == {"dc": "http://purl.org/dc/terms/",
                        "ex": "http://example.org/"}


def test_parse_prefixes_xmlns():
    # xmlns ignored unless the feature is on; @prefix wins over xmlns
    assert parse_prefixes({"xmlns:ex": "http://example.org/"}, {}, False) == {}
    assert clean(parse_prefixes({"xmlns:ex": "http://example.org/"}, {}, True)) \
        == {"ex": "http://example.org/"}
    assert clean(parse_prefixes(
        {"xmlns:ex": "http://old.org/", "prefix": "ex: http://new.org/"}, {}, True)) \
        == {"ex": "http://new.org/"}
    # bare xmlns maps the empty ('' default) prefix
    assert clean(parse_prefixes({"xmlns": "http://example.org/"}, {}, True)) \
        == {"": "http://example.org/"}


# --- expandPrefixedTerm (Util-test.ts / Util.ts:88-120) --------------------

def test_expand_prefixed_term():
    prefixes = {"ex": "http://example.org/", "license": "http://l.org/"}
    assert expand_prefixed_term("ex:abc", prefixes) == "http://example.org/abc"
    assert expand_prefixed_term("unknown:abc", prefixes) == "unknown:abc"
    # empty prefix → XHTML vocab
    assert expand_prefixed_term(":next", prefixes) \
        == "http://www.w3.org/1999/xhtml/vocab#next"
    # bare term lookup is case-insensitive
    assert expand_prefixed_term("LICENSE", prefixes) == "http://l.org/"
    assert expand_prefixed_term("nope", prefixes) == "nope"


# --- createIri (Util-test.ts:281-485) --------------------------------------

def test_create_iri():
    ev = make_eval()
    tag = make_tag()
    ci = ev.create_iri
    assert ci("http://ex.org/abc", tag, False, False, True) == NamedNode("http://ex.org/abc")
    assert ci("abc", tag, False, False, True) == NamedNode("http://example.org/abc")
    # vocab-mode without CURIEs: invalid
    assert ci("abc", tag, True, False, True) is None
    # blank nodes
    assert ci("_:b1", tag, False, True, True) == BlankNode("b1")
    assert ci("_:b1", tag, False, True, False) is None
    assert ci("_:", tag, False, True, True) == BlankNode("b_identity")
    assert ci("[_:]", tag, False, True, True) == BlankNode("b_identity")
    assert ci("[_:b]", tag, False, True, True) == BlankNode("b")
    # prefixed IRIs
    t2 = make_tag({"ex": "http://example.org/"})
    assert ci("ex:def", t2, False, True, True) == NamedNode("http://example.org/def")
    assert ci("ex:def", make_tag({}), False, True, True) == NamedNode("ex:def")
    # relative resolution
    assert ci("def", make_tag({}), False, True, True) == NamedNode("http://example.org/def")
    # vocab mode
    assert ci("def", make_tag({}), True, True, True) is None
    assert ci("def", make_tag({}, vocab="http://vocab.org/"), True, True, True) \
        == NamedNode("http://vocab.org/def")
    # prefixed relative IRIs resolve against the document base
    t3 = make_tag({"abc": "abc/"})
    assert ci("abc:def", t3, False, True, True) == NamedNode("http://example.org/abc/def")
    # safe CURIEs
    assert ci("[http://example.org]", make_tag({}), False, True, True) \
        == NamedNode("http://example.org")
    assert ci("[invalid]", make_tag({}), False, True, True) is None


# --- createLiteral (Util-test.ts:487-638) ----------------------------------

def test_create_literal():
    ev = make_eval()
    cl = ev.create_literal
    assert cl("abc", make_tag()) == Literal("abc")
    assert cl("abc", make_tag(datatype="http://example.org/datatype")) \
        == Literal("abc", "", "http://example.org/datatype")
    assert cl("abc", make_tag(language="en-us")) == Literal("abc", "en-us")
    assert cl("abc", make_tag(language="EN-US")) == Literal("abc", "en-us")
    # datatype wins over language
    assert cl("abc", make_tag(language="en-us", datatype="http://d/")) \
        == Literal("abc", "", "http://d/")


@pytest.mark.parametrize("value,xsd_type", [
    ("2012-03-18T00:00:00", "dateTime"),
    ("2012-03-18T00:00:00Z", "dateTime"),
    ("2012-03-18T00:00:00-10:00", "dateTime"),
    ("2012-03-18T00:00:00+10:00", "dateTime"),
    ("00:00:00", "time"),
    ("00:00:00Z", "time"),
    ("2012-03-18", "date"),
    ("2012-03-18Z", "date"),
    ("2012-03", "gYearMonth"),
    ("2012", "gYear"),
    ("P2Y6M5DT12H35M30S", "duration"),
    ("-P2Y6M5DT12H35M30S", "duration"),
    ("PT1M", "duration"),
])
def test_time_sniffing(value, xsd_type):
    ev = make_eval()
    assert ev.create_literal(value, make_tag(interpret_time=True)) \
        == Literal(value, "", XSD + xsd_type)


@pytest.mark.parametrize("value", ["abc", "2012-03-18T00:00:99x", "99:00"])
def test_time_sniffing_invalid(value):
    ev = make_eval()
    assert ev.create_literal(value, make_tag(interpret_time=True)) == Literal(value)


# --- createVocabIris (Util-test.ts:640-768) --------------------------------

def test_create_vocab_iris():
    ev = make_eval()
    tag = make_tag({"ex": "http://example.org/"})
    assert ev.create_vocab_iris("ex:abc", tag, True, True) \
        == [NamedNode("http://example.org/abc")]
    for sep in (" ", "\t", " \t", "\t    \t\t\t   "):
        assert ev.create_vocab_iris(f"ex:abc{sep}ex:def", tag, True, True) \
            == [NamedNode("http://example.org/abc"), NamedNode("http://example.org/def")]
    # terms filtered when not allowed
    assert ev.create_vocab_iris("term ex:abc", tag, False, True) \
        == [NamedNode("http://example.org/abc")]
    assert ev.create_vocab_iris("", tag, True, True) == []


# --- misc -------------------------------------------------------------------

def test_is_valid_iri():
    assert is_valid_iri("http://example.org/a")
    assert is_valid_iri("_:b")
    assert not is_valid_iri("abc")
    assert not is_valid_iri("http://ex.org/a b")
    assert not is_valid_iri('http://ex.org/"x"')


def test_content_type_to_profile():
    assert content_type_to_profile("text/html") == "html"
    assert content_type_to_profile("application/xhtml+xml") == "xhtml"
    assert content_type_to_profile("image/svg+xml") == "xml"
    assert content_type_to_profile("application/xml") == "xml"
    assert content_type_to_profile("text/xml") == "xml"
    assert content_type_to_profile("unknown/type") == ""


def test_get_base_iri_strips_fragment():
    ev = make_eval("http://example.org/dir/page")
    assert ev.get_base_iri("http://base.com/#frag") == "http://base.com/"
    assert ev.get_base_iri("other") == "http://example.org/dir/other"


def test_resolve_iri_rfc3986():
    base = "http://a/b/c/d;p?q"
    # RFC 3986 §5.4.1 normal examples
    for ref, expect in [
        ("g", "http://a/b/c/g"), ("./g", "http://a/b/c/g"),
        ("g/", "http://a/b/c/g/"), ("/g", "http://a/g"),
        ("//g", "http://g"), ("?y", "http://a/b/c/d;p?y"),
        ("#s", "http://a/b/c/d;p?q#s"), ("g?y", "http://a/b/c/g?y"),
        (";x", "http://a/b/c/;x"), ("g;x", "http://a/b/c/g;x"),
        ("", "http://a/b/c/d;p?q"), (".", "http://a/b/c/"),
        ("..", "http://a/b/"), ("../g", "http://a/b/g"),
        ("../..", "http://a/"), ("../../g", "http://a/g"),
    ]:
        assert resolve_iri(ref, base) == expect, ref
