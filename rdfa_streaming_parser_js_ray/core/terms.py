"""RDF terms + the scalar term-construction functions.

Pure-Python reimplementation (from the W3C RDFa Core 1.1 spec, §7.4 CURIE
and IRI processing) of the reference's utility layer
(/root/reference/lib/Util.ts:52-297): prefix parsing, CURIE/term
expansion, IRI validity, literal construction with <time> datatype
sniffing, and the central ``create_iri`` term constructor.

These are sub-microsecond string ops called inside the per-row evaluator —
they are NOT Ray stages (SURVEY.md §2.3).
"""

from __future__ import annotations

import re


RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDFA = "http://www.w3.org/ns/rdfa#"
XHTML_VOCAB = "http://www.w3.org/1999/xhtml/vocab#"


class NamedNode:
    __slots__ = ("value",)
    term_type = "NamedNode"

    def __init__(self, value: str):
        self.value = value

    def __eq__(self, other):
        return isinstance(other, NamedNode) and other.value == self.value

    def __hash__(self):
        return hash(("iri", self.value))

    def __repr__(self):
        return f"<{self.value}>"


class BlankNode:
    __slots__ = ("value",)
    term_type = "BlankNode"

    def __init__(self, label: str):
        self.value = label

    def __eq__(self, other):
        return isinstance(other, BlankNode) and other.value == self.value

    def __hash__(self):
        return hash(("bnode", self.value))

    def __repr__(self):
        return f"_:{self.value}"


class Literal:
    __slots__ = ("value", "language", "datatype")
    term_type = "Literal"

    def __init__(self, value: str, language: str = "", datatype: str = ""):
        self.value = value
        self.language = language
        self.datatype = datatype

    def __eq__(self, other):
        return (isinstance(other, Literal) and other.value == self.value
                and other.language == self.language and other.datatype == self.datatype)

    def __hash__(self):
        return hash(("lit", self.value, self.language, self.datatype))

    def __repr__(self):
        if self.language:
            return f'"{self.value}"@{self.language}'
        if self.datatype:
            return f'"{self.value}"^^<{self.datatype}>'
        return f'"{self.value}"'


Term = NamedNode | BlankNode | Literal

# prefix-attribute pair: ``prefix: iri`` (reference PREFIX_REGEX, Util.ts:16)
_PREFIX_RE = re.compile(r"\s*([^\s:]*):\s*(\S*)\s*")

# <time>-content datatype sniffing (Util.ts:17-30)
_TIME_REGEXES: tuple[tuple[re.Pattern, str], ...] = (
    (re.compile(r"^-?P(\d+Y)?(\d+M)?(\d+D)?(T(\d+H)?(\d+M)?(\d+(\.\d)?S)?)?$"), "duration"),
    (re.compile(r"^\d+-\d\d-\d\dT\d\d:\d\d:\d\d((Z?)|([+-]\d\d:\d\d))$"), "dateTime"),
    (re.compile(r"^\d+-\d\d-\d\dZ?$"), "date"),
    (re.compile(r"^\d\d:\d\d:\d\d((Z?)|([+-]\d\d:\d\d))$"), "time"),
    (re.compile(r"^\d+-\d\d$"), "gYearMonth"),
    (re.compile(r"^\d+$"), "gYear"),
)

# IRI validity gate (Util.ts:32)
_IRI_RE = re.compile(r'^([A-Za-z][\d+\-.A-Za-z]*|_):[^ "<>\[\\\]`{|}]*$')


def parse_prefixes(attributes: dict[str, str], parent_prefixes: dict[str, str],
                   xmlns_prefix_mappings: bool) -> dict[str, str]:
    """Prefix map for a tag: ``@prefix`` pairs + ``xmlns``/``xmlns:*``.

    ``@prefix`` entries win over xmlns ones; bare ``xmlns`` maps the empty
    prefix. Returns ``parent_prefixes`` (the same object) when the tag
    declares nothing — frames share the parent's map unless changed.
    A pair with an empty IRI is recorded as '' which all lookups treat as
    absent (the reference records ``undefined`` there).
    """
    additional: dict[str, str] = {}
    if xmlns_prefix_mappings:
        for attribute, value in attributes.items():
            if attribute.startswith("xmlns"):
                additional[attribute[6:]] = value

    prefix_attr = attributes.get("prefix")
    if prefix_attr or additional:
        prefixes = {**parent_prefixes, **additional}
        if prefix_attr:
            for m in _PREFIX_RE.finditer(prefix_attr):
                prefixes[m.group(1)] = m.group(2)
        return prefixes
    return parent_prefixes


def expand_prefixed_term(term: str, prefixes_all: dict[str, str]) -> str:
    """CURIE/term → IRI expansion (Util.ts:88-120).

    Empty prefix → XHTML vocab; known prefix → concatenation; otherwise a
    case-insensitive *term* lookup; otherwise the term as-is.
    """
    colon = term.find(":")
    if colon >= 0:
        prefix = term[:colon]
        local = term[colon + 1:]
        if prefix == "":
            return XHTML_VOCAB + local
        expansion = prefixes_all.get(prefix)
        if expansion:
            return expansion + local
    if term:
        expansion = prefixes_all.get(term.lower())
        if expansion:
            return expansion
    return term


_VALID_IRI_CACHE: dict[str, bool] = {}


def is_valid_iri(iri: str) -> bool:
    # IRIs (predicates/types especially) repeat across and within docs;
    # the bounded memo removes most validity-regex work from the hot path
    cached = _VALID_IRI_CACHE.get(iri)
    if cached is None:
        if len(_VALID_IRI_CACHE) > 200_000:
            _VALID_IRI_CACHE.clear()
        cached = _VALID_IRI_CACHE[iri] = _IRI_RE.match(iri) is not None
    return cached


def sniff_time_datatype(literal: str) -> str | None:
    """Return the xsd:* datatype IRI the literal looks like, or None."""
    for regex, xsd_type in _TIME_REGEXES:
        if regex.match(literal):
            return XSD + xsd_type
    return None
