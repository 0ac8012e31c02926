"""Property-based robustness tests (hypothesis).

The reference ships no randomized tests (SURVEY.md §5); these pin the
invariants that matter for a distributed engine, where one malformed
document must never poison a block:

- the parser never raises on arbitrary text (malformed markup included);
- chunked writes == single-shot parse for ANY chunking of ANY input;
- the fast regex tokenizer and the stdlib-based reference tokenizer
  produce identical triples on arbitrary tag soup.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from rdfa_streaming_parser_js_ray.core.evaluator import RdfaEvaluator
from rdfa_streaming_parser_js_ray.core.parser import RdfaParser
from rdfa_streaming_parser_js_ray.core.tokenizer import (
    FastHtmlTokenizer, HtmlTokenizer,
)

# tag soup: fragments that compose into plausible-to-broken markup.
# The pool and the stdlib-comparability predicate live in
# tools/fuzz_differential.py (single source of truth — the offline
# fuzz harness scales these same properties to multi-hundred-k-case
# seeded bursts); per-round provenance comments live there too.
from tools.fuzz_differential import (  # noqa: E402
    FRAGMENTS as _FRAGMENT_POOL,
    stdlib_comparable as _stdlib_comparable,
)

_FRAGMENTS = st.sampled_from(_FRAGMENT_POOL)
_SOUP = st.lists(_FRAGMENTS, min_size=0, max_size=30).map("".join)


def _parse(html: str, tokenizer_cls=None) -> list:
    out = []
    ev = RdfaEvaluator(base_iri="http://e.org/", profile="",
                       emit=lambda s, p, o: out.append((s, p, o)))
    tk = (tokenizer_cls or FastHtmlTokenizer)(ev)
    tk.write(html)
    tk.end()
    return out


@settings(max_examples=200, deadline=None)
@given(html=st.text(max_size=400))
def test_never_raises_on_arbitrary_text(html):
    _parse(html)


@settings(max_examples=200, deadline=None)
@given(html=_SOUP)
def test_never_raises_on_tag_soup(html):
    _parse(html)


@settings(max_examples=150, deadline=None)
@given(html=_SOUP, data=st.data())
def test_chunked_equals_single_shot(html, data):
    full = _parse(html)
    n_cuts = data.draw(st.integers(min_value=0, max_value=6))
    cuts = sorted(data.draw(st.lists(
        st.integers(min_value=0, max_value=max(0, len(html))),
        min_size=n_cuts, max_size=n_cuts)))
    out = []
    ev = RdfaEvaluator(base_iri="http://e.org/", profile="",
                       emit=lambda s, p, o: out.append((s, p, o)))
    tk = FastHtmlTokenizer(ev)
    prev = 0
    for c in cuts + [len(html)]:
        tk.write(html[prev:c])
        prev = c
    tk.end()
    assert out == full


def _parse_tk(html: str, tokenizer_cls):
    out = []
    ev = RdfaEvaluator(base_iri="http://e.org/", profile="",
                       emit=lambda s, p, o: out.append((s, p, o)))
    tk = tokenizer_cls(ev)
    tk.write(html)
    tk.end()
    return out, tk


# _stdlib_comparable is imported from tools.fuzz_differential above —
# the documented structural wrapper divergences (fast follows
# htmlparser2; stdlib does not) are pinned in the tests below.


@settings(max_examples=200, deadline=None)
@given(html=_SOUP)
def test_fast_tokenizer_matches_stdlib(html):
    fast, ftk = _parse_tk(html, FastHtmlTokenizer)
    ref, stk = _parse_tk(html, HtmlTokenizer)
    if _stdlib_comparable(ftk, stk):
        assert fast == ref


@settings(max_examples=100, deadline=None)
@given(html=st.text(max_size=300))
def test_fast_tokenizer_matches_stdlib_on_text(html):
    fast, ftk = _parse_tk(html, FastHtmlTokenizer)
    ref, stk = _parse_tk(html, HtmlTokenizer)
    if _stdlib_comparable(ftk, stk):
        assert fast == ref


@settings(max_examples=150, deadline=None)
@given(html=_SOUP, data=st.data())
def test_xml_mode_chunked_equals_single_shot(html, data):
    def run(chunks):
        out = []
        p = RdfaParser(base_iri="http://e.org/", profile="xml",
                       emit=lambda s, p_, o: out.append((s, p_, o)))
        for c in chunks:
            p.write(c)
        p.end()
        return out

    full = run([html])
    n_cuts = data.draw(st.integers(min_value=0, max_value=6))
    cuts = sorted(data.draw(st.lists(
        st.integers(min_value=0, max_value=max(0, len(html))),
        min_size=n_cuts, max_size=n_cuts)))
    bounds = [0] + cuts + [len(html)]
    assert run([html[a:b] for a, b in zip(bounds, bounds[1:])]) == full


# non-differential harsher pool — single-sourced with the fuzz tool
# (provenance comments live there)
from tools.fuzz_differential import (  # noqa: E402
    NASTY_FRAGMENTS as _NASTY_POOL,
)

_NASTY = st.sampled_from(_NASTY_POOL)
_NASTY_SOUP = st.lists(st.one_of(_FRAGMENTS, _NASTY),
                       min_size=0, max_size=30).map("".join)


@settings(max_examples=200, deadline=None)
@given(html=_NASTY_SOUP, data=st.data())
def test_nasty_soup_never_raises_and_chunk_invariant(html, data):
    """Harsher fragment pool (unterminated constructs, null bytes, quoted
    '>' in attributes, bare comment closers): must never raise and any
    chunking must equal the single-shot parse.  (stdlib equality is NOT
    asserted here — see the pinned EOF edge cases below.)"""
    full = _parse(html)
    n_cuts = data.draw(st.integers(min_value=0, max_value=6))
    cuts = sorted(data.draw(st.lists(
        st.integers(min_value=0, max_value=max(0, len(html))),
        min_size=n_cuts, max_size=n_cuts)))
    out = []
    ev = RdfaEvaluator(base_iri="http://e.org/", profile="",
                       emit=lambda s, p, o: out.append((s, p, o)))
    tk = FastHtmlTokenizer(ev)
    prev = 0
    for c in cuts + [len(html)]:
        tk.write(html[prev:c])
        prev = c
    tk.end()
    assert out == full


def test_unterminated_comment_dropped_like_htmlparser2():
    """htmlparser2 flushes an unterminated ``<!--`` at EOF as a COMMENT
    (no text events); the fast tokenizer matches that.  (The stdlib-based
    HtmlTokenizer surfaces it as text — a known stdlib quirk, which is why
    the differential corpus only contains complete comments.)"""
    out = _parse('<p property="http://p/x">a<!--never closed')
    assert [o.value for _, _, o in out] == ["a"]


def test_short_comments_close_like_htmlparser2():
    """htmlparser2 primes the '-->' end sequence with the opener's own
    dashes ("allow short comments"): '<!-->' and '<!--->' are complete
    empty comments, not comment-to-EOF."""
    for prefix in ("<!-->", "<!--->"):
        out = _parse(prefix + '<p property="http://p/x">v</p>')
        assert [o.value for _, _, o in out] == ["v"], prefix


def test_junk_dash_attrs_accepted_like_htmlparser2():
    """'<a property="v"-->' parses as a tag with a junk '--' attribute in
    htmlparser2's attribute-name state (stdlib refuses the tag entirely —
    a known stdlib quirk kept out of the differential pool)."""
    out = _parse('<span property="http://p/x" -->v</span>')
    assert [o.value for _, _, o in out] == ["v"]


def test_stray_quote_in_tag_body_is_plain_char():
    """'<t" property=":">' — the stray '"' is part of the (junk) tag name,
    not a value delimiter, so the property attribute parses and the tag
    ends at the first '>' (htmlparser2/stdlib parity; round-2 fuzz find:
    the old tokenizer treated any quote as value-quoting and swallowed
    the real tag end)."""
    out = _parse('<t" property=":">v</t">')
    assert [(p.value, o.value) for _, p, o in out] == \
        [("http://www.w3.org/1999/xhtml/vocab#", "v")]


def test_quoted_value_split_across_chunks_is_held():
    """A buffer ending inside an unterminated quoted value must be held
    for more data — not closed at a '>' inside the value."""
    html = "<t property=\":\"='>'>x"
    full = _parse(html)
    for cut in range(len(html) + 1):
        out = []
        ev = RdfaEvaluator(base_iri="http://e.org/", profile="",
                           emit=lambda s, p, o: out.append((s, p, o)))
        tk = FastHtmlTokenizer(ev)
        tk.write(html[:cut])
        tk.write(html[cut:])
        tk.end()
        assert out == full, cut


def test_unquoted_attr_trailing_slash_is_not_self_closing():
    """'<a href=http://e.org/dir/>' keeps the trailing slash in the value
    and does not self-close (htmlparser2 tokenizer states)."""
    out = []
    ev = RdfaEvaluator(base_iri="http://e.org/", profile="",
                       emit=lambda s, p, o: out.append((s, p, o)))
    tk = FastHtmlTokenizer(ev)
    tk.write('<a rel="http://p/r" href=http://e.org/dir/>in</a>')
    tk.end()
    assert [(s.value, o.value) for s, _, o in out] == \
        [("http://e.org/", "http://e.org/dir/")]
    # ...and the element's text stays inside it (no early close)
    out2 = _parse('<span property="http://p/x" datatype="" id=a/>t</span>')
    assert [o.value for _, _, o in out2] == ["t"]


def test_quoted_value_with_equals_then_slash_still_self_closes():
    """'<span resource="http://e.org/?q=1/"/>' IS self-closing: the '='
    inside the quoted value must not anchor the value-slash classifier
    (right-anchored regex false positive), or subsequent content gets
    mis-scoped inside the element."""
    out = _parse('<div about="http://e.org/d">'
                 '<span rel="http://p/r" resource="http://e.org/?q=1/"/>'
                 '<span property="http://p/t">after</span></div>')
    by_pred = {p.value: (s.value, o.value) for s, p, o in out}
    assert by_pred["http://p/r"] == ("http://e.org/d", "http://e.org/?q=1/")
    # 'after' hangs off the DIV's subject, not the self-closed span's
    # resource — proving the span closed before the text
    assert by_pred["http://p/t"] == ("http://e.org/d", "after")


def test_rawtext_closer_requires_name_boundary():
    """'</scripty>' does not close a <script>: all raw content up to the
    real '</script>' stays inside the script element (name boundary rule;
    text inside the element still bubbles per htmlparser2)."""
    events = []

    class Sink:
        def on_tag_open(self, n, a): events.append(("open", n))
        def on_text(self, d):
            if events and events[-1][0] == "text":
                events[-1] = ("text", events[-1][1] + d)
            else:
                events.append(("text", d))
        def on_tag_close(self): events.append(("close",))
        def on_end(self): events.append(("end",))

    tk = FastHtmlTokenizer(Sink())
    tk.write('a<script>b</scripty>c</script>d')
    tk.end()
    assert events == [("text", "a"), ("open", "script"),
                      ("text", "b</scripty>c"), ("close",),
                      ("text", "d"), ("end",)]


def test_dangling_tag_at_eof_surfaces_as_text():
    out_frag = _parse('<p property="http://p/x">a<div')
    assert [o.value for _, _, o in out_frag] == ["a<div"]


def test_xml_mode_keeps_raw_attribute_whitespace():
    """htmlparser2's xmlMode (the reference's XML path) does NOT apply
    XML attribute-value normalization — newlines in attribute values stay
    raw (a conformant parser like expat would fold them to spaces).
    Pinned as deliberate reference parity; verified differentially
    against expat."""
    out = []
    p = RdfaParser(base_iri="http://e.org/", profile="xml",
                   emit=lambda s, p_, o: out.append((s, p_, o)))
    p.write('<svg><metadata property="http://p/x" content="a\nb"/></svg>')
    p.end()
    assert [o.value for _, _, o in out] == ["a\nb"]


@settings(max_examples=100, deadline=None)
@given(html=_SOUP)
def test_parser_api_matches_evaluator(html):
    p = RdfaParser(base_iri="http://e.org/")
    p.write(html)
    p.end()
    assert p.triples == _parse(html)


def test_rcdata_title_textarea_like_htmlparser2():
    """htmlparser2 RCDATA: no tags parse inside <title>/<textarea>,
    entities ARE decoded (unlike script/style), '</titlex>' does not
    close, and chunked parsing equals single-shot across a split
    entity."""
    html = ('<title>a &amp; <div property="http://p/x">v</div></title>'
            '<span property="http://p/y">w</span>')
    full = _parse(html)
    assert full == _parse(html, HtmlTokenizer)
    assert [str(p) for _, p, _ in full] == ["<http://p/y>"]

    inner = '<div property="http://p/t"><title>t &lt;x&gt;</title></div>'
    got = _parse(inner)
    assert got == _parse(inner, HtmlTokenizer)
    assert str(got[0][2]) == '"t <x>"'

    # split entity across chunks inside RCDATA
    out_chunks, out_full = [], []
    for sink_out, chunks in ((out_full, [inner]),
                             (out_chunks, [inner[:28], inner[28:31],
                                           inner[31:]])):
        ev = RdfaEvaluator(base_iri="http://e.org/", profile="",
                           emit=lambda s, p, o, _o=sink_out:
                           _o.append((str(s), str(p), str(o))))
        tk = FastHtmlTokenizer(ev)
        for c in chunks:
            tk.write(c)
        tk.end()
    assert out_chunks == out_full

    # script keeps RAW semantics: entities NOT decoded
    raw = '<div property="http://p/s"><script>&amp;</script>x</div>'
    tr = _parse(raw)
    assert any(str(v) == '"&amp;x"' for _, _, v in tr), tr


def test_unterminated_rcdata_flushed_like_htmlparser2():
    """Pending RCDATA text at EOF is flushed as text (htmlparser2
    onend); the stdlib-based tokenizer swallows it — a known stdlib
    quirk, which is why bare <title>/<textarea> openers live only in
    the non-differential pool."""
    out = _parse('<p property="http://p/x"><title>tail')
    assert [str(v) for _, _, v in out] == ['"tail"']


def test_explicit_subject_empty_inlist_emits_no_boolean_term():
    """@about + @rel + @inlist with no object: the reference emits a quad
    whose rdf:first object is the JS boolean `false` (RdfaParser.ts:441-444
    passing `false` through Util.ts:161-163's cast) — unrepresentable in
    any RDF term model.  Our documented divergence drops the falsy
    sentinel (evaluator.add_list_mapping); children completing the list
    still contribute."""
    out = _parse('<div about="#a" rel="http://p/l" inlist=""></div>')
    assert out == []
    for triples in [_parse('<div about="#a" rel="http://p/l" inlist="">'
                           '<span about="#b">x</span></div>')]:
        for s, p, o in triples:
            # every emitted term renders; no raw Python bool leaks out
            assert not isinstance(o, bool)
        assert any(str(p).endswith("first>") for _, p, _ in triples)


def test_extract_discards_only_the_failing_document(monkeypatch):
    """A document whose triples fail to SERIALIZE (not just to parse) is
    dropped whole; other docs in the batch survive and no partial rows
    from the bad doc leak into the output columns."""
    import pyarrow as pa
    from rdfa_streaming_parser_js_ray.stages import extract as ex

    real = ex.triples_for_document

    def boobytrapped(doc_id, spans, **kw):
        triples = list(real(doc_id, spans, **kw))
        if doc_id == "bad":
            triples.append((triples[0][0], triples[0][1], False))
        return triples

    monkeypatch.setattr(ex, "triples_for_document", boobytrapped)
    span = [{"offset": 0, "kind": "text",
             "text": '<p property="http://p/x">v</p>', "media_ref": ""}]
    batch = pa.table({"doc_id": pa.array(["good1", "bad", "good2"]),
                      "spans": pa.array([span, span, span])})
    out = ex.ExtractTriples(profile="")(batch)
    assert sorted(out["doc_id"].to_pylist()) == ["good1", "good2"]


def test_attr_name_position_quotes_match_htmlparser2():
    """Round-4 differential-fuzz finds: htmlparser2 enters attribute
    scanning only AFTER the tag name ('=' and quotes are legal name
    chars), quotes open values only as a value's first char, and once a
    name is followed by '=' an unterminated quoted value swallows to
    EOF instead of closing at an in-quote '>'."""
    # '=' after a COMPLETED attr starts a new (bare) attribute name
    # '="' — the tag closes at '>' and property=v is live
    out = _parse('<n property=v =">')
    assert [str(o) for _, _, o in out] == ['""']

    # '="' inside the tag NAME opens nothing: the name is 't="', the f
    # value swallows '><n rel=:' to its closing quote — no second tag
    assert _parse('<t=" f="><n rel=":"resource>') == []

    # bare name 't' then '= "': the '=' binds as t's value separator,
    # the quote opens an unterminated value — swallowed to EOF, markup
    # surfaced as text (stdlib's tolerant close-at-'>' is a documented
    # wrapper divergence, flagged via dangling_tag)
    out2 = []
    ev = RdfaEvaluator(base_iri="http://e.org/", profile="",
                       emit=lambda s, p, o: out2.append((s, p, o)))
    tk = FastHtmlTokenizer(ev)
    tk.write('<n property="v"t =">')
    tk.end()
    assert out2 == [] and tk.dangling_tag


def test_short_comments_complete_like_htmlparser2():
    """'<!-->' / '<!--->' are complete empty comments (htmlparser2
    seeds the '-->' sequence index with the opener's dashes, "Allow
    short comments"); stdlib scans for a full post-opener '-->' and
    swallows to the next one — a flagged structural divergence."""
    out, tk = _parse_tk('<!--><span property="dc:t">v</span>',
                        FastHtmlTokenizer)
    assert [str(o) for _, _, o in out] == ['"v"'] and tk.short_comment
    out, tk = _parse_tk('<!---><span property="dc:t">v</span>',
                        FastHtmlTokenizer)
    assert [str(o) for _, _, o in out] == ['"v"'] and tk.short_comment
    # '<!---->' is the shortest NON-short form: both engines agree,
    # no flag, and the stdlib wrapper matches
    out, tk = _parse_tk('<!----><span property="dc:t">v</span>',
                        FastHtmlTokenizer)
    ref, _ = _parse_tk('<!----><span property="dc:t">v</span>',
                       HtmlTokenizer)
    assert not tk.short_comment and out == ref
    # a trailing unterminated '<!…' is DROPPED (htmlparser2
    # handleTrailingData; stdlib close() re-emits the raw chars as
    # data) — flagged via dropped_decl on the fast side
    out, tk = _parse_tk('<span property="dc:t">v<!', FastHtmlTokenizer)
    assert [str(o) for _, _, o in out] == ['"v"'] and tk.dropped_decl
    out, tk = _parse_tk('<span property="dc:t">v<!--x', FastHtmlTokenizer)
    assert [str(o) for _, _, o in out] == ['"v"'] and tk.dropped_decl


def test_end_tag_whitespace_and_name_extent_match_htmlparser2():
    """htmlparser2 BeforeClosingTagName ignores whitespace after '</'
    ('</ div>' closes the div — stdlib's endtagfind agrees), and
    InClosingTagName ends only at whitespace or '>' (so '/' is a name
    char in END tags, unlike start tags)."""
    # '</ div>' pops the about scope: the span's subject is base again
    out = _parse('<div about="#s"></ div><span property="dc:t">v</span>')
    assert [str(s) for s, _, _ in out] == ['<http://e.org/>']
    # '</div/x>' is a no-op close (name "div/x" matches nothing):
    # the about scope survives
    out = _parse('<div about="#s"></div/x><span property="dc:t">v</span>')
    assert [str(s) for s, _, _ in out] == ['<http://e.org/#s>']
    # junk after the end-tag name is skipped to '>' either way
    out = _parse('<div about="#s"></div x=1><span property="dc:t">v</span>')
    assert [str(s) for s, _, _ in out] == ['<http://e.org/>']


def test_xml_mode_quoted_gt_in_attr_value():
    """'>' is legal inside an XML attribute value; the tag extent must
    come from the quote-aware attribute-unit scan (htmlparser2 runs one
    attribute state machine for both modes), including when a chunk
    boundary falls inside the quoted value.  Found by the xml-vs-expat
    differential in tools/fuzz_differential.py."""
    doc = '<root><a property="dc:t" content="x>y"/></root>'

    def run(chunks):
        out = []
        p = RdfaParser(base_iri="http://e.org/", profile="xml",
                       emit=lambda s, p_, o: out.append((str(s), str(p_),
                                                         str(o))))
        for c in chunks:
            p.write(c)
        p.end()
        return out

    single = run([doc])
    assert [o for _, _, o in single] == ['"x>y"']
    # cut inside the quoted value (index 30 is between 'x' and '>')
    assert run([doc[:30], doc[30:]]) == single


def test_xml_mode_unquoted_slash_value_not_self_closing():
    """Same rule as HTML mode (one htmlparser2 attribute state
    machine): a '/' ending an '='-introduced unquoted value is part of
    the VALUE, so the tag stays open and @href keeps its trailing
    slash.  Self-review find: XML mode used a bare endswith('/')."""
    out = []
    p = RdfaParser(base_iri="http://e.org/", profile="xml",
                   emit=lambda s, p_, o: out.append((str(s), str(p_),
                                                     str(o))))
    p.write('<r><a rel="dc:source" href=http://e.org/dir/>in</a></r>')
    p.end()
    assert [o for _, _, o in out] == ['<http://e.org/dir/>']


def test_end_tag_divergence_flags():
    """Self-review finds: the end-tag recovery shapes where stdlib and
    htmlparser2 disagree must be FLAGGED so differential harnesses
    skip them (fast follows htmlparser2 in all of them)."""
    # trailing unterminated '</…': dropped (htmlparser2
    # handleTrailingData ignores closing-tag states) + flagged
    out, tk = _parse_tk('<span property="dc:t">v</d', FastHtmlTokenizer)
    assert [str(o) for _, _, o in out] == ['"v"'] and tk.dropped_decl
    # '/' in an end-tag name: pops nothing here (stdlib would pop the
    # prefix name 'div') + flagged
    out, tk = _parse_tk(
        '<div about="#s"></div/y><span property="dc:t">v</span>',
        FastHtmlTokenizer)
    assert [str(s) for s, _, _ in out] == ['<http://e.org/#s>']
    assert tk.nonstd_end_tag
    # whitespace-led name with trailing junk: closes here (stdlib
    # treats it as a bogus comment) + flagged
    out, tk = _parse_tk(
        '<div about="#s"></ div x=1><span property="dc:t">v</span>',
        FastHtmlTokenizer)
    assert [str(s) for s, _, _ in out] == ['<http://e.org/>']
    assert tk.nonstd_end_tag
    # the plain shapes stay UNflagged (valid comparisons not skipped)
    _, tk = _parse_tk('<div about="#s"></ div><i property="dc:t">v</i>',
                      FastHtmlTokenizer)
    assert not tk.nonstd_end_tag


def test_tolerant_recovery_not_set_by_decoded_entities():
    """Self-review find: '&lt' decoding to '<'+letter in ordinary text
    must NOT set the stdlib wrapper's recovery flag (the flag requires
    the data to be VERBATIM raw markup), or valid differential
    comparisons get silently skipped."""
    html = '&lttext <span property="dc:t">v</span>'
    fast, ftk = _parse_tk(html, FastHtmlTokenizer)
    ref, stk = _parse_tk(html, HtmlTokenizer)
    assert not stk.tolerant_recovery
    assert _stdlib_comparable(ftk, stk) and fast == ref
    # while genuine recovery (verbatim raw markup as data — here
    # stdlib re-emits the short comment '<!-->' it cannot terminate)
    # still flags
    _, stk = _parse_tk('x<!-->y<span property="dc:t">v</span>',
                       HtmlTokenizer)
    assert stk.tolerant_recovery


def test_deep_nesting_is_iterative():
    """5000-deep nested RDFa must complete without recursion limits —
    the evaluator's active-tag state is an explicit list-of-frames
    stack, not call recursion (the reference inherits this from
    htmlparser2's event loop; RdfaParser.ts:87 onTagOpen is likewise
    iterative per event)."""
    depth = 5000
    doc = ('<html><body prefix="ex: http://ex.org/">'
           + '<div about="#s" property="ex:p">' * depth
           + "x" + "</div>" * depth + "</body></html>")
    p = RdfaParser(base_iri="http://e.org/")
    p.write(doc)
    p.end()
    # one literal per level; every level's captured text is the same
    # concatenated inner text "x"
    assert len(p.triples) == depth
    assert {str(t[2]) for t in p.triples} == {'"x"'}


def test_deep_xmlliteral_capture_stays_linear_enough():
    """A 1000-deep XMLLiteral capture serializes the whole subtree into
    one literal (markup preserved) without blowing up: guards the
    text-segment merge in onTagClose against accidental quadratic
    copying regressions."""
    depth = 1000
    doc = ('<html><body prefix="ex: http://ex.org/ '
           'rdf: http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
           '<div about="#s" property="ex:p" datatype="rdf:XMLLiteral">'
           + "<b>" * depth + "x" + "</b>" * depth + "</div></body></html>")
    p = RdfaParser(base_iri="http://e.org/")
    p.write(doc)
    p.end()
    assert len(p.triples) == 1
    val = p.triples[0][2].value
    # every captured opening tag carries the xmlns injection
    assert val.count("<b ") == depth and val.count("</b>") == depth
