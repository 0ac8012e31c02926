"""Blank-node-invariant RDF graph comparison.

Our equivalent of the reference test-suite's ``toBeRdfIsomorphic`` matcher
(jest-rdf / rdf-isomorphic, used throughout
/root/reference/test/RdfParser-test.ts): graphs are compared as SETS of
triples, with a bijection over blank-node labels.  Used by the fixture
corpus gate and by pipeline-vs-evaluator distributed-correctness checks.
"""

from __future__ import annotations

import re

from ..core.terms import BlankNode, Literal, NamedNode

# canonical triple encoding: ('i', value) | ('b', label) | ('l', value, lang, dt)
TermKey = tuple
Triple = tuple[TermKey, TermKey, TermKey]

_LITERAL_RE = re.compile(r'^"(.*)"(?:@([^"]*)|\^\^(.*))?$', re.S)

_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _norm_dt(datatype: str) -> str:
    # RDF 1.1: xsd:string is the default literal datatype — an explicit
    # xsd:string equals a plain literal (RDFJS Literal equality semantics).
    return "" if datatype == _XSD_STRING else datatype


def term_key(term) -> TermKey:
    if isinstance(term, NamedNode):
        return ("i", term.value)
    if isinstance(term, BlankNode):
        return ("b", term.value)
    if isinstance(term, Literal):
        return ("l", term.value, term.language, _norm_dt(term.datatype))
    raise TypeError(f"not a term: {term!r}")


def term_key_from_string(s: str) -> TermKey:
    """Decode the rdf-quad compact term syntax used in the fixture corpus."""
    if s.startswith('"'):
        m = _LITERAL_RE.match(s)
        if not m:
            raise ValueError(f"bad literal syntax: {s!r}")
        return ("l", m.group(1), m.group(2) or "", _norm_dt(m.group(3) or ""))
    if s.startswith("_:"):
        return ("b", s[2:])
    return ("i", s)


def _bnodes(triple: Triple):
    return [t[1] for t in triple if t[0] == "b"]


def _subst(triple: Triple, mapping: dict[str, str]) -> Triple:
    return tuple(("b", mapping.get(t[1], t[1])) if t[0] == "b" else t for t in triple)


def isomorphic(g1: list[Triple] | set[Triple], g2: list[Triple] | set[Triple]) -> bool:
    """True iff the two triple sets are equal up to blank-node renaming."""
    s1, s2 = set(g1), set(g2)
    ground1 = {t for t in s1 if not _bnodes(t)}
    ground2 = {t for t in s2 if not _bnodes(t)}
    if ground1 != ground2:
        return False
    t1 = [t for t in s1 if _bnodes(t)]
    t2 = {t for t in s2 if _bnodes(t)}
    if len(t1) != len(t2):
        return False
    b1 = sorted({n for t in t1 for n in _bnodes(t)})
    b2 = sorted({n for t in t2 for n in _bnodes(t)})
    if len(b1) != len(b2):
        return False

    def backtrack(i: int, mapping: dict[str, str], used: set[str]) -> bool:
        if i == len(b1):
            return {_subst(t, mapping) for t in t1} == t2
        for cand in b2:
            if cand in used:
                continue
            mapping[b1[i]] = cand
            used.add(cand)
            consistent = all(
                _subst(t, mapping) in t2
                for t in t1
                if all(n in mapping for n in _bnodes(t))
            )
            if consistent and backtrack(i + 1, mapping, used):
                return True
            del mapping[b1[i]]
            used.discard(cand)
        return False

    return backtrack(0, {}, set())


def diff_report(actual: list[Triple], expected: list[Triple]) -> str:
    sa, se = set(actual), set(expected)
    lines = []
    for t in sorted(sa - se):
        lines.append(f"  + actual-only   {t}")
    for t in sorted(se - sa):
        lines.append(f"  - expected-only {t}")
    return "\n".join(lines)
