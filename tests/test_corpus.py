"""Golden-triple corpus gate: every extracted reference E2E case must be
isomorphic to our evaluator's output (FIXTURES.md §2, BASELINE.md gate)."""

import json
from pathlib import Path

import pytest

from rdfa_streaming_parser_js_ray.core.parser import parse_rdfa
from rdfa_streaming_parser_js_ray.core.profiles import features_from_dict
from rdfa_streaming_parser_js_ray.functions.rdf_compare import (
    diff_report, isomorphic, term_key, term_key_from_string,
)

CORPUS = json.loads((Path(__file__).parent / "fixtures" / "corpus.json").read_text())


def run_case(case):
    opts = case["options"]
    features = None
    if "features" in opts:
        features = features_from_dict(opts["features"])
    triples = parse_rdfa(
        case["html"],
        base_iri=opts.get("baseIRI", ""),
        profile=opts.get("profile"),
        content_type=opts.get("contentType"),
        features=features,
        vocab=opts.get("vocab"),
        language=opts.get("language"),
    )
    actual = [tuple(term_key(t) for t in triple) for triple in triples]
    expected = [tuple(term_key_from_string(s) for s in triple)
                for triple in case["expected"]]
    return actual, expected


@pytest.mark.parametrize("case", CORPUS, ids=[
    f"{i:03d}-{c['name'][:60].replace(' ', '_')}" for i, c in enumerate(CORPUS)])
def test_corpus_case(case):
    actual, expected = run_case(case)
    assert isomorphic(actual, expected), (
        f"{case['source']} {case['name']!r}\n" + diff_report(actual, expected))
