"""Per-document RDFa parser facade.

The full public API surface of the reference
(/root/reference/lib/RdfaParser.ts:31-85: constructor options, streaming
``write``/``end``, and the direct onTagOpen/onText/onTagClose methods,
README.md:170-176) condensed to a per-row kernel.  One fresh instance per
document = the reference's per-``import()`` parser isolation
(RdfaParser.ts:68-75).
"""

from __future__ import annotations

from typing import Callable

from .evaluator import RdfaEvaluator
from .profiles import RdfaFeatures, content_type_to_profile
from .terms import Term
from .tokenizer import make_tokenizer


class HtmlParseListener:
    """Optional tap on the SAX event stream (the reference's
    ``htmlParseListener`` hook, IHtmlParseListener.ts:4-29 / wired at
    RdfaParser.ts:876-911).  Subclass and override any subset."""

    def on_tag_open(self, name: str, attributes: dict[str, str]) -> None: ...
    def on_text(self, data: str) -> None: ...
    def on_tag_close(self) -> None: ...
    def on_end(self) -> None: ...


class _TappedSink:
    """Fans SAX events out to the evaluator and a listener."""

    __slots__ = ("evaluator", "listener")

    def __init__(self, evaluator: RdfaEvaluator, listener: HtmlParseListener):
        self.evaluator = evaluator
        self.listener = listener

    def on_tag_open(self, name, attributes):
        self.evaluator.on_tag_open(name, attributes)
        self.listener.on_tag_open(name, attributes)

    def on_text(self, data):
        self.evaluator.on_text(data)
        self.listener.on_text(data)

    def on_tag_close(self):
        self.evaluator.on_tag_close()
        self.listener.on_tag_close()

    def on_end(self):
        self.evaluator.on_end()
        self.listener.on_end()


class RdfaParser:
    """Streaming RDFa parser for a single document.

    Feed text chunks with ``write`` (chunk boundaries arbitrary — may split
    tags mid-token), finish with ``end``; collected triples are in
    ``.triples``.  Or bypass the tokenizer and call ``on_tag_open`` /
    ``on_text`` / ``on_tag_close`` directly.
    """

    def __init__(self, base_iri: str = "", profile: str | None = None,
                 content_type: str | None = None,
                 features: RdfaFeatures | None = None,
                 vocab: str | None = None, language: str | None = None,
                 emit: Callable[[Term, Term, Term], None] | None = None,
                 html_parse_listener: HtmlParseListener | None = None):
        if content_type is not None:
            profile = content_type_to_profile(content_type)
        profile = profile or ""
        self.evaluator = RdfaEvaluator(
            base_iri=base_iri, profile=profile, features=features,
            vocab=vocab, language=language, emit=emit)
        sink = self.evaluator if html_parse_listener is None \
            else _TappedSink(self.evaluator, html_parse_listener)
        self._tokenizer = make_tokenizer(sink, xml_mode=(profile == "xml"))

    @property
    def triples(self) -> list[tuple[Term, Term, Term]]:
        return self.evaluator.triples

    # streaming API
    def write(self, chunk: str) -> None:
        self._tokenizer.write(chunk)

    def end(self) -> None:
        self._tokenizer.end()

    # direct SAX API (bring-your-own tokenizer)
    def on_tag_open(self, name: str, attributes: dict[str, str]) -> None:
        self.evaluator.on_tag_open(name, attributes)

    def on_text(self, data: str) -> None:
        self.evaluator.on_text(data)

    def on_tag_close(self) -> None:
        self.evaluator.on_tag_close()

    def on_end(self) -> None:
        self.evaluator.on_end()


def parse_rdfa(source: str | list[str], base_iri: str = "",
               profile: str | None = None, content_type: str | None = None,
               features: RdfaFeatures | None = None,
               vocab: str | None = None, language: str | None = None,
               ) -> list[tuple[Term, Term, Term]]:
    """Parse a whole document (or pre-chunked spans) and return its triples."""
    parser = RdfaParser(base_iri=base_iri, profile=profile,
                        content_type=content_type, features=features,
                        vocab=vocab, language=language)
    if isinstance(source, str):
        parser.write(source)
    else:
        for chunk in source:
            parser.write(chunk)
    parser.end()
    return parser.triples
