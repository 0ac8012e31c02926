"""Streaming HTML/XML tokenizers driving the RDFa evaluator.

Replaces the reference's htmlparser2 wiring
(/root/reference/lib/RdfaParser.ts:870-920: ``decodeEntities: true,
recognizeSelfClosing: true, xmlMode: profile === 'xml'``) with Python
stdlib parsers, matched to htmlparser2's documented HTML-mode behavior:

- tag and attribute names lowercased; entities decoded in text and
  attribute values; duplicate attributes keep the first occurrence;
- void elements (<br>, <base>, ...) emit an immediate close; stray end
  tags for them are ignored;
- ``openImpliesClose`` auto-closing (<li> closes <li>, block elements
  close <p>, ...);
- an unmatched end tag closes up to its nearest open ancestor of the same
  name, or is ignored; remaining open tags are closed at end of input.

XML mode uses expat: case-preserving, namespace-unaware (so ``xml:lang``
etc. arrive verbatim), self-closing tags native, CDATA as text.

Both tokenizers accept incremental ``feed()`` calls, so a document split
into arbitrary text spans (the interleaved-documents input schema) parses
identically to a single string.
"""

from __future__ import annotations

import re
from html import unescape as _html_unescape
from html.parser import HTMLParser
from typing import Protocol


class SaxSink(Protocol):
    def on_tag_open(self, name: str, attributes: dict[str, str]) -> None: ...
    def on_text(self, data: str) -> None: ...
    def on_tag_close(self) -> None: ...
    def on_end(self) -> None: ...


# htmlparser2 HTML-mode void elements (public htmlparser2 Parser tables)
VOID_ELEMENTS = frozenset((
    "area", "base", "basefont", "br", "col", "command", "embed", "frame",
    "hr", "img", "input", "isindex", "keygen", "link", "meta", "param",
    "source", "track", "wbr",
))

_P_CLOSERS = frozenset((
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hr", "main", "nav", "ol", "p", "pre",
    "section", "table", "ul",
))

# tag being opened → set of open ancestors it implicitly closes
OPEN_IMPLIES_CLOSE: dict[str, frozenset[str]] = {
    "tr": frozenset(("tr", "th", "td")),
    "th": frozenset(("th",)),
    "td": frozenset(("thead", "th", "td")),
    "body": frozenset(("head", "link", "script")),
    "li": frozenset(("li",)),
    "option": frozenset(("option",)),
    "optgroup": frozenset(("optgroup", "option")),
    "dd": frozenset(("dt", "dd")),
    "dt": frozenset(("dt", "dd")),
    "rt": frozenset(("rt", "rp")),
    "rp": frozenset(("rt", "rp")),
    "tbody": frozenset(("thead", "tbody")),
    "tfoot": frozenset(("thead", "tbody")),
}
OPEN_IMPLIES_CLOSE.update({name: OPEN_IMPLIES_CLOSE.get(name, frozenset()) | frozenset(("p",))
                           for name in _P_CLOSERS})


class HtmlTokenizer(HTMLParser):
    """HTML-mode tokenizer with htmlparser2-compatible tree discipline."""

    # htmlparser2 parses no tags inside these; stdlib calls them CDATA.
    # title/textarea are RCDATA — their text is entity-decoded in
    # handle_data below (stdlib skips convert_charrefs in cdata mode)
    CDATA_CONTENT_ELEMENTS = ("script", "style", "title", "textarea")

    def __init__(self, sink: SaxSink):
        super().__init__(convert_charrefs=True)
        self.sink = sink
        self._stack: list[str] = []
        # True once stdlib's goahead hit its invalid-start-tag recovery
        # (emits the raw '<tag…' markup as DATA and reparses after it).
        # htmlparser2 — and the fast tokenizer — stay IN the tag and
        # swallow the junk as attributes instead, so differential
        # harnesses skip the comparison when set.
        self.tolerant_recovery = False
        # verbatim input, kept ONLY to make the recovery heuristic
        # precise (this wrapper exists for differential testing; it is
        # never in a production path): recovery data is raw markup
        # copied from the input, whereas entity-DECODED text that
        # happens to start with '<' (e.g. '&lt;b' -> '<b') is not a
        # substring of the raw input and must not set the flag
        self._raw = ""

    # -- incremental API -------------------------------------------------
    def write(self, chunk: str) -> None:
        self._raw += chunk
        self.feed(chunk)

    def end(self) -> None:
        self.close()
        # close all tags left open at EOF (htmlparser2 onend behavior)
        while self._stack:
            self._stack.pop()
            self.sink.on_tag_close()
        self.sink.on_end()

    # -- internals ---------------------------------------------------------
    def _open(self, name: str, attrs: list[tuple[str, str | None]]) -> None:
        implied = OPEN_IMPLIES_CLOSE.get(name)
        if implied:
            while self._stack and self._stack[-1] in implied:
                self._stack.pop()
                self.sink.on_tag_close()
        attributes: dict[str, str] = {}
        for key, value in attrs:
            if key not in attributes:
                attributes[key] = value if value is not None else ""
        self._stack.append(name)
        self.sink.on_tag_open(name, attributes)

    def handle_starttag(self, tag: str, attrs) -> None:
        self._open(tag, attrs)
        if tag in VOID_ELEMENTS:
            self._stack.pop()
            self.sink.on_tag_close()

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <x/> — recognizeSelfClosing
        self._open(tag, attrs)
        self._stack.pop()
        self.sink.on_tag_close()

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return  # </br> and friends are ignored in HTML mode
        if tag in self._stack:
            while self._stack:
                top = self._stack.pop()
                self.sink.on_tag_close()
                if top == tag:
                    break
        elif tag == "p":
            # htmlparser2: an unmatched </p> implies <p></p>
            self.sink.on_tag_open("p", {})
            self.sink.on_tag_close()

    def handle_data(self, data: str) -> None:
        if data:
            if len(data) > 1 and data[0] == "<" and (
                    data[1].isalpha() or data[1] in "!?") \
                    and data in self._raw:
                # raw markup surfaced as data = a stdlib recovery path
                # (see __init__ note).  '<'+alpha: invalid-start-tag
                # recovery.  '<!' / '<?': close() flushing an
                # unterminated declaration/comment/PI as data — stdlib
                # requires a full '-->' terminator even for short
                # comments ('<!-->', '<!--->'), where htmlparser2
                # treats those as complete (its tokenizer seeds the
                # comment-end sequence index at 2, "Allow short
                # comments") and DROPS a trailing unterminated '<!…'
                # instead of emitting it as text
                self.tolerant_recovery = True
            if self._stack and self._stack[-1] in _RCDATA_ELEMENTS:
                data = _html_unescape(data)
            self.sink.on_text(data)

    # comments / declarations / PIs produce no events
    def handle_comment(self, data: str) -> None: ...
    def handle_decl(self, decl: str) -> None: ...
    def handle_pi(self, data: str) -> None: ...
    def unknown_decl(self, data: str) -> None: ...


# body of a start tag AFTER the name: everything up to the first '>'
# that is not inside a quoted attribute VALUE (handles href="a>b"),
# structured as htmlparser2 attribute UNITS — name (which may START
# with '=' or contain quotes: BeforeAttributeName takes any char into
# InAttributeName, and only a LATER '=' introduces a value) + optional
# '=' value.  Quotes are significant only as the first char of a value
# (htmlparser2 BeforeAttributeValue); a stray quote elsewhere is a
# plain name char (differential-fuzz cases '<t" property=":">' and
# '<n property=v =">' where position-blind quoting mis-scanned the
# extent).  The '(?!["\'])' lookahead on the unquoted-value branch
# keeps a buffer ending inside an UNTERMINATED quoted value failing to
# match (held for more data / dangling at EOF) rather than closing the
# tag at a '>' inside the value.  Matched from the END of the tag name
# (see _process) — htmlparser2 enters attribute scanning only after
# the name, so '<t=" f=">' keeps '="' in the NAME and the quote there
# opens nothing.
# possessive quantifiers (3.11+) everywhere: the nested unit loop must
# fail in LINEAR time on a buffer with no closing '>' (split tags,
# fuzz soup) — with backtracking the alternatives overlap and blow up
# exponentially.  No branch needs giveback: units are delimited by
# first-char-disjoint alternatives.
# each unit is name + (COMPLETE '=value' | assert-no-'='): once a name
# is followed by '=', a complete value MUST match — an unterminated
# quoted value must fail the WHOLE match (chunk boundary inside a
# quote: hold for more data), never fall through to reinterpreting the
# '=' as a new attribute name and closing at a '>' inside the quote
_HTML_TAG_BODY_RE = re.compile(
    r"(?:[\s/]++"
    r"|[^\s/>][^\s=/>]*+"                     # attr name ('=' ok first)
    r"(?:\s*+=\s*+(?:\"[^\"]*+\"|'[^']*+'|(?![\"'])[^\s>]*+)|(?!\s*+=))"
    r")*+>")
_HTML_NAME_RE = re.compile(r"[a-zA-Z][^\s/>]*")
# end-tag names: htmlparser2's InClosingTagName ends only at whitespace
# or '>', so any other char (incl. '/', '!') is a name char; a
# non-alpha-start "name" can never match a start tag's, so it pops
# nothing — but the extent must match for parity
_HTML_END_NAME_RE = re.compile(r"[^\s>]+")
# attr NAMES may start with '=' (htmlparser2 BeforeAttributeName takes
# any char into the name; only a LATER '=' introduces the value) — keeps
# junk-attr spelling identical to stdlib/htmlparser2 inside XMLLiteral
# re-serialization
_HTML_ATTR_RE = re.compile(
    r"""([^\s/>][^\s=/>]*)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*)))?""")
# htmlparser2/stdlib raw-text elements: content is plain text (no entity
# decoding, no nested tags) until the matching end tag
_RAWTEXT_ELEMENTS = frozenset(("script", "style"))
# htmlparser2 RCDATA elements (tokenizer TitleEnd/TextareaEnd sequences):
# no nested tags until the matching end tag, but entities ARE decoded
_RCDATA_ELEMENTS = frozenset(("title", "textarea"))
# a trailing '/' that terminates an unquoted attribute value
# (`<a href=http://e.org/dir/>`) is part of the value, not a self-closing
# marker.  This right-anchored regex is a cheap PRE-FILTER only: it can
# anchor on an '=' inside a *quoted* value (`resource="…?q=1/"/`), so a
# match merely means "maybe value-slash" and must be confirmed by the
# left-to-right attribute scan in _ends_in_unquoted_value; a non-match is
# definitive (no '='-introduced run reaches the slash at all).
_UNQUOTED_VALUE_SLASH_RE = re.compile(r"=\s*(?:[^\s>\"'][^\s>]*)?/$")


def _ends_in_unquoted_value(inner: str, start: int | None = None) -> bool:
    """True iff the final '/' of ``inner`` is consumed as part of an
    '='-introduced unquoted attribute value when scanning attributes
    left-to-right (htmlparser2 tokenizer states: quotes are significant
    only right after '=', and '/' is literal inside values).  ``start``
    is where attribute scanning begins (just past the tag name); when
    None it is derived with the HTML name pattern."""
    if start is None:
        nm = _HTML_NAME_RE.match(inner)
        start = nm.end() if nm else 0
    last = len(inner)
    for am in _HTML_ATTR_RE.finditer(inner, start):
        if am.end() == last and am.group(4):
            return True
    return False
# characters that may follow a raw-text end-tag name (whitespace, '/', '>')
_RAWTEXT_BOUNDARY = " \t\n\r\f/>"


class FastHtmlTokenizer:
    """Single-pass regex HTML tokenizer (hot path for extraction).

    Event-compatible with :class:`HtmlTokenizer` (the stdlib-based
    implementation, kept for differential testing): lowercased tag and
    attribute names, entities decoded in text and attribute values,
    duplicate attributes keep the first occurrence, void elements,
    ``openImpliesClose`` discipline, ``<x/>`` self-closing, script/style
    raw-text, comments/doctype/PIs skipped.  Accepts arbitrary chunk
    boundaries: incomplete constructs (a tag, comment, or entity split
    across ``write`` calls) are buffered until resolvable.
    """

    __slots__ = ("sink", "_stack", "_buf", "_rawtext", "dangling_tag",
                 "short_comment", "dropped_decl", "nonstd_end_tag")

    def __init__(self, sink: SaxSink):
        self.sink = sink
        self._stack: list[str] = []
        self._buf = ""
        self._rawtext: str | None = None
        # True once a short comment ('<!-->' / '<!--->') completed —
        # correct per htmlparser2/HTML5 but a structural stdlib
        # divergence (stdlib scans for a full post-opener '-->'), so
        # differential harnesses skip the stdlib comparison when set.
        self.short_comment = False
        # True once end() DROPPED an unterminated '<!…'/'<?…'/'</…'
        # construct (htmlparser2 handleTrailingData drops them; stdlib
        # close() re-emits the raw chars as data) — same skip contract
        # as short_comment.
        self.dropped_decl = False
        # True once an end tag took a shape where stdlib's endtagfind /
        # tagfind_tolerant recovery differs from htmlparser2's
        # InClosingTagName ('/' in the name; whitespace-led name with
        # trailing junk) — same skip contract.
        self.nonstd_end_tag = False
        # True once end() hit an unterminated start tag (e.g. EOF inside
        # a quoted attribute value).  htmlparser2 drops such tags; we
        # surface the markup as text (pinned in tests); Python's stdlib
        # HTMLParser instead tolerantly closes at the next '>', so
        # differential harnesses skip the stdlib comparison when set.
        self.dangling_tag = False

    # -- incremental API -------------------------------------------------
    def write(self, chunk: str) -> None:
        if self._buf:
            self._buf += chunk
        else:
            self._buf = chunk
        self._process(final=False)

    def end(self) -> None:
        self._process(final=True)
        if self._buf:  # dangling '<...' at EOF surfaces as text
            text = self._buf
            self._buf = ""
            self.sink.on_text(_html_unescape(text) if "&" in text else text)
        while self._stack:
            self._stack.pop()
            self.sink.on_tag_close()
        self.sink.on_end()

    # -- internals ---------------------------------------------------------
    def _emit_text(self, text: str) -> None:
        self.sink.on_text(_html_unescape(text) if "&" in text else text)

    def _open(self, name: str, attributes: dict[str, str]) -> None:
        implied = OPEN_IMPLIES_CLOSE.get(name)
        if implied:
            stack = self._stack
            sink = self.sink
            while stack and stack[-1] in implied:
                stack.pop()
                sink.on_tag_close()
        self._stack.append(name)
        self.sink.on_tag_open(name, attributes)

    def _close(self, name: str) -> None:
        if name in VOID_ELEMENTS:
            return  # </br> and friends are ignored in HTML mode
        stack = self._stack
        if name in stack:
            sink = self.sink
            while stack:
                top = stack.pop()
                sink.on_tag_close()
                if top == name:
                    break
        elif name == "p":
            # htmlparser2: an unmatched </p> implies <p></p>
            self.sink.on_tag_open("p", {})
            self.sink.on_tag_close()

    def _process(self, final: bool) -> None:
        buf = self._buf
        pos = 0
        n = len(buf)
        sink = self.sink
        while pos < n:
            if self._rawtext is not None:
                # inside <script>/<style> (raw) or <title>/<textarea>
                # (RCDATA — entities decoded): scan for the matching end
                # tag; the name must be followed by whitespace, '/', or
                # '>' ('</scripty>' does NOT close a <script> —
                # htmlparser2 and stdlib both require a name boundary)
                dec = _html_unescape \
                    if self._rawtext in _RCDATA_ELEMENTS else None
                closer = "</" + self._rawtext
                clen = len(closer)
                lower = buf.lower()
                idx = lower.find(closer, pos)
                while (idx >= 0 and idx + clen < n
                       and buf[idx + clen] not in _RAWTEXT_BOUNDARY):
                    idx = lower.find(closer, idx + 1)
                if idx >= 0 and idx + clen >= n and not final:
                    # closer found flush at buffer end: the boundary char
                    # is not visible yet — hold from here
                    if idx > pos:
                        text = buf[pos:idx]
                        sink.on_text(dec(text) if dec else text)
                    pos = idx
                    break
                if idx < 0:
                    if final:
                        if pos < n:
                            text = buf[pos:]
                            sink.on_text(dec(text) if dec else text)
                        pos = n
                        break
                    # hold back a possible split '</scrip' tail — and in
                    # RCDATA also a possible split entity ('&am' + 'p;'),
                    # so chunked decoding equals single-shot
                    keep = max(pos, n - clen)
                    if dec:
                        amp = buf.rfind("&", pos, keep)
                        # 33 = the longest named entity incl. '&' and ';'
                        # ('&CounterClockwiseContourIntegral;'): a split
                        # one char before its ';' leaves a 32-char prefix
                        if amp >= 0 and ";" not in buf[amp:keep] \
                                and keep - amp < 33:
                            keep = amp
                    if pos < keep:
                        text = buf[pos:keep]
                        sink.on_text(dec(text) if dec else text)
                    pos = keep
                    break
                if idx > pos:
                    text = buf[pos:idx]
                    sink.on_text(dec(text) if dec else text)
                gt = buf.find(">", idx)
                if gt < 0:
                    if final:
                        pos = n
                        break
                    pos = idx
                    break
                self._close(self._rawtext)
                self._rawtext = None
                pos = gt + 1
                continue
            lt = buf.find("<", pos)
            if lt < 0:
                text = buf[pos:]
                if not final:
                    # hold back a possible split entity ('&am' + 'p;');
                    # 33 = longest named entity incl. '&' and ';'
                    amp = text.rfind("&")
                    if amp >= 0 and ";" not in text[amp:] \
                            and len(text) - amp < 33:
                        held = text[amp:]
                        text = text[:amp]
                        if text:
                            self._emit_text(text)
                        self._buf = held
                        return
                if text:
                    self._emit_text(text)
                pos = n
                break
            if lt > pos:
                self._emit_text(buf[pos:lt])
                pos = lt
            if pos + 1 >= n:
                break  # lone '<' at buffer end: hold
            nxt = buf[pos + 1]
            if nxt == "!":
                if buf.startswith("<!--", pos):
                    # htmlparser2 primes the '-->' end-sequence with the
                    # opener's own dashes ("allow short comments"), so
                    # '<!-->' and '<!--->' are complete empty comments:
                    # search from pos+2, letting the match overlap '<!--'
                    end = buf.find("-->", pos + 2)
                    if end < 0:
                        if final:
                            self.dropped_decl = True
                            pos = n
                        break
                    if end < pos + 4:
                        # terminator overlapped the opener ('<!-->' /
                        # '<!--->') — complete here and in htmlparser2,
                        # but stdlib requires a full post-opener '-->'
                        # and swallows to the NEXT one: differential
                        # harnesses skip the stdlib comparison
                        self.short_comment = True
                    pos = end + 3
                    continue
                if not final and n - pos < 4 and "<!--".startswith(buf[pos:]):
                    break  # possible split '<!--'
                end = buf.find(">", pos)
                if end < 0:
                    if final:
                        self.dropped_decl = True
                        pos = n
                    break
                pos = end + 1
            elif nxt == "?":
                end = buf.find(">", pos)
                if end < 0:
                    if final:
                        self.dropped_decl = True
                        pos = n
                    break
                pos = end + 1
            elif nxt == "/":
                end = buf.find(">", pos)
                if end < 0:
                    if final:
                        # trailing unterminated '</…' is DROPPED
                        # (htmlparser2 handleTrailingData ignores
                        # closing-tag states; stdlib re-emits the raw
                        # chars as data) — same skip contract as the
                        # decl/PI drops
                        self.dropped_decl = True
                        pos = n
                    break
                # htmlparser2 BeforeClosingTagName: whitespace after
                # '</' is IGNORED ('</ div>' closes div — stdlib's
                # endtagfind agrees), then ANY non-ws char starts the
                # name (InClosingTagName ends only at whitespace or
                # '>', so '/' is a legal name char here unlike in
                # start tags); anything after the name is skipped to
                # '>' (AfterClosingTagName)
                j = pos + 2
                while j < end and buf[j] in " \t\n\r\f":
                    j += 1
                nm = _HTML_END_NAME_RE.match(buf, j)
                if nm is not None and nm.start() < end:
                    name = nm.group(0)
                    # stdlib parity holds only for the plain shapes:
                    # a '/' in the name means stdlib closes the
                    # PREFIX name ('</div/y>' pops div) where
                    # htmlparser2 pops nothing, and a whitespace-led
                    # name with trailing junk ('</ div x=1>') is a
                    # stdlib bogus comment (no close) where
                    # htmlparser2 closes — flag both for the
                    # differential harnesses
                    if "/" in name or (j > pos + 2
                                       and buf[nm.end():end].strip()):
                        self.nonstd_end_tag = True
                    self._close(name.lower())
                pos = end + 1
            elif ("a" <= nxt <= "z") or ("A" <= nxt <= "Z"):
                # name first (always matches: nxt is a letter) — the
                # quote-aware body scan starts only AFTER the name, like
                # htmlparser2's InTagName -> BeforeAttributeName states
                nm0 = _HTML_NAME_RE.match(buf, pos + 1)
                m = _HTML_TAG_BODY_RE.match(buf, nm0.end())
                if m is None:
                    if final:
                        # malformed dangling tag: surface as text
                        self.dangling_tag = True
                        self._emit_text(buf[pos:])
                        pos = n
                    break
                end = m.end()  # index just past '>'
                inner = buf[pos + 1:end - 1]
                # '/' before '>' is self-closing only when it is NOT part
                # of an unquoted attribute value (htmlparser2 tokenizer
                # states: '/' is literal inside quoted and unquoted values);
                # the regex pre-filter is confirmed by an attribute-span
                # scan because it can false-positive on '=' inside quotes
                self_closing = (inner.endswith("/")
                                and not (_UNQUOTED_VALUE_SLASH_RE.search(inner)
                                         and _ends_in_unquoted_value(inner)))
                if self_closing:
                    inner = inner[:-1]
                nm = _HTML_NAME_RE.match(inner)
                name = nm.group(0).lower()
                attributes: dict[str, str] = {}
                if nm.end() < len(inner):
                    for am in _HTML_ATTR_RE.finditer(inner, nm.end()):
                        key = am.group(1).lower()
                        if key in attributes:
                            continue
                        value = am.group(2)
                        if value is None:
                            value = am.group(3)
                            if value is None:
                                value = am.group(4) or ""
                        if "&" in value:
                            value = _html_unescape(value)
                        attributes[key] = value
                self._open(name, attributes)
                if self_closing or name in VOID_ELEMENTS:
                    self._stack.pop()
                    sink.on_tag_close()
                elif name in _RAWTEXT_ELEMENTS or name in _RCDATA_ELEMENTS:
                    self._rawtext = name
                pos = end
            else:
                # '<' not starting a construct: it's text
                self._emit_text("<")
                pos += 1
        self._buf = buf[pos:]


_XML_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}
_XML_ENTITY_RE = re.compile(r"&(#x[0-9A-Fa-f]+|#\d+|[A-Za-z][\w.-]*);")
_XML_ATTR_RE = re.compile(
    r"""([^\s=/>]+)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*)))?""")
_XML_NAME_RE = re.compile(r"[^\s/>]+")


def _decode_xml_entities(s: str) -> str:
    def sub(m: re.Match) -> str:
        ent = m.group(1)
        if ent.startswith("#x") or ent.startswith("#X"):
            try:
                return chr(int(ent[2:], 16))
            except ValueError:
                return m.group(0)
        if ent.startswith("#"):
            try:
                return chr(int(ent[1:]))
            except ValueError:
                return m.group(0)
        return _XML_ENTITIES.get(ent, m.group(0))
    return _XML_ENTITY_RE.sub(sub, s)


class XmlTokenizer:
    """Forgiving streaming XML-mode tokenizer.

    Matches htmlparser2's ``xmlMode`` (which is NOT a strict XML parser):
    case-preserving tag/attribute names, no void elements, no implied
    closes, self-closing ``<x/>`` recognized, CDATA as text, XML entities
    (named 5 + numeric) decoded, unclosed tags closed at end of input,
    stray end tags ignored.
    """

    def __init__(self, sink: SaxSink):
        self.sink = sink
        self._buf = ""
        self._depth = 0

    def write(self, chunk: str) -> None:
        self._buf += chunk
        self._process(final=False)

    def end(self) -> None:
        self._process(final=True)
        if self._buf:  # dangling '<...' at EOF: surface as text
            self.sink.on_text(_decode_xml_entities(self._buf))
            self._buf = ""
        while self._depth > 0:
            self._depth -= 1
            self.sink.on_tag_close()
        self.sink.on_end()

    def _process(self, final: bool) -> None:
        buf = self._buf
        pos = 0
        n = len(buf)
        while pos < n:
            lt = buf.find("<", pos)
            if lt < 0:
                text = buf[pos:]
                if not final:
                    # hold back a possible split entity ('&am' + 'p;')
                    amp = text.rfind("&")
                    if amp >= 0 and ";" not in text[amp:] and len(text) - amp < 12:
                        self._buf = text[amp:]
                        text = text[:amp]
                        if text:
                            self.sink.on_text(_decode_xml_entities(text))
                        return
                if text:
                    self.sink.on_text(_decode_xml_entities(text))
                pos = n
                break
            if lt > pos:
                self.sink.on_text(_decode_xml_entities(buf[pos:lt]))
                pos = lt
            # a construct starting at '<'
            if buf.startswith("<!--", pos):
                end = buf.find("-->", pos)
                if end < 0:
                    if final:
                        pos = n
                    break
                pos = end + 3
            elif buf.startswith("<![CDATA[", pos):
                end = buf.find("]]>", pos)
                if end < 0:
                    if not final:
                        break
                    self.sink.on_text(buf[pos + 9:])
                    pos = n
                else:
                    self.sink.on_text(buf[pos + 9:end])
                    pos = end + 3
            elif buf.startswith("<!", pos) or buf.startswith("<?", pos):
                end = buf.find(">", pos)
                if end < 0:
                    if final:
                        pos = n
                    break
                pos = end + 1
            elif buf.startswith("</", pos):
                end = buf.find(">", pos)
                if end < 0:
                    if final:
                        pos = n
                    break
                if self._depth > 0:
                    self._depth -= 1
                    self.sink.on_tag_close()
                pos = end + 1
            else:
                nm0 = _XML_NAME_RE.match(buf, pos + 1)
                if nm0 is None:
                    # '<' + ws/'>' — not a tag start; skip the construct
                    end = buf.find(">", pos)
                    if end < 0:
                        if final:
                            self.sink.on_text(
                                _decode_xml_entities(buf[pos:]))
                            pos = n
                        break
                    pos = end + 1
                    continue
                # quote-aware tag extent, same attribute-unit states as
                # HTML mode (htmlparser2 runs ONE attribute state
                # machine for both modes): a '>' inside a quoted value
                # ('<a b="x>y"/>' — legal XML) must not end the tag,
                # and a chunk boundary inside a quoted value holds the
                # buffer instead of closing at the in-quote '>'
                m = _HTML_TAG_BODY_RE.match(buf, nm0.end())
                if m is None:
                    if final:
                        # malformed dangling tag: treat as text
                        self.sink.on_text(_decode_xml_entities(buf[pos:]))
                        pos = n
                    break
                end = m.end() - 1  # index of the closing '>'
                inner = buf[pos + 1:end]
                name = nm0.group(0)
                # same self-closing rule as HTML mode (ONE attribute
                # state machine in htmlparser2): a '/' that ends an
                # '='-introduced unquoted value is part of the VALUE
                # ('<a href=http://e.org/dir/>' is an OPEN tag with a
                # trailing-slash href), not a self-closing marker
                self_closing = (inner.endswith("/")
                                and not (_UNQUOTED_VALUE_SLASH_RE.search(inner)
                                         and _ends_in_unquoted_value(
                                             inner, len(name))))
                if self_closing:
                    inner = inner[:-1]
                nm = _XML_NAME_RE.match(inner)
                attributes: dict[str, str] = {}
                for am in _XML_ATTR_RE.finditer(inner, nm.end()):
                    key = am.group(1)
                    value = am.group(2) or am.group(3) or am.group(4) or ""
                    if key not in attributes:
                        attributes[key] = _decode_xml_entities(value)
                self.sink.on_tag_open(name, attributes)
                self._depth += 1
                if self_closing:
                    self._depth -= 1
                    self.sink.on_tag_close()
                pos = end + 1
        self._buf = buf[pos:]


def make_tokenizer(sink: SaxSink, xml_mode: bool):
    return XmlTokenizer(sink) if xml_mode else FastHtmlTokenizer(sink)
