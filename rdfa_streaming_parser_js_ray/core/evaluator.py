"""The RDFa 1.1 evaluation-context engine.

A from-scratch Python implementation of the W3C RDFa Core 1.1 processing
sequence (https://www.w3.org/TR/rdfa-core/#s_rdfaindetail), behaviorally
matched to the reference parser's event methods
(/root/reference/lib/RdfaParser.ts:87-868) so its test expectations hold.

This class is the per-row kernel of the Ray pipeline: one evaluator per
document, driven by SAX-ish events from a tokenizer (or called directly —
the reference's public onTagOpen/onText/onTagClose API, README.md:170-176).
All state (the active-tag stack, pattern store, mutable base IRI, blank-node
counter) lives inside the instance, so the enclosing ``map_batches`` stage
is stateless and embarrassingly parallel across documents (SURVEY.md §1).
"""

from __future__ import annotations

from typing import Callable

from .contexts import INITIAL_CONTEXT, INITIAL_CONTEXT_XHTML
from .iri import resolve_iri
from .profiles import RdfaFeatures, RDFA_FEATURES, content_type_to_profile
from .terms import (
    RDF, RDFA, XHTML_VOCAB, BlankNode, Literal, NamedNode, Term,
    expand_prefixed_term, is_valid_iri, parse_prefixes, sniff_time_datatype,
)

_EMPTY: dict[str, str] = {}

# constant terms reused across all emissions (immutable value objects)
_RDF_TYPE = NamedNode(RDF + "type")
_RDF_FIRST = NamedNode(RDF + "first")
_RDF_REST = NamedNode(RDF + "rest")
_RDF_NIL = NamedNode(RDF + "nil")
_RDFA_USES_VOCAB = NamedNode(RDFA + "usesVocabulary")
_XHV_ROLE = NamedNode(XHTML_VOCAB + "role")

# Attributes that make a tag take the full RDFa processing sequence; a tag
# carrying none of these (and no xml:*/xmlns*) is pure context inheritance.
# href/src matter even alone (step 5.2 subject fallback); lang/prefix/vocab
# mutate inherited context; role (W3C role spec) emits its own triple.
_RDFA_RELEVANT_ATTRS = frozenset((
    "about", "resource", "typeof", "property", "rel", "rev", "href", "src",
    "content", "datatype", "datetime", "vocab", "prefix", "lang", "inlist",
    "role",
))


class ActiveTag:
    """One evaluation-context frame per open element (IActiveTag.ts:7-30)."""

    __slots__ = (
        "name", "prefixes_all", "prefixes_custom", "subject",
        "explicit_new_subject", "predicates", "object", "text_with_tags",
        "text_without_tags", "vocab", "language", "datatype",
        "collect_child_tags", "collect_child_tags_for_current_tag",
        "collected_pattern_tag", "interpret_object_as_time",
        "incomplete_triples", "inlist", "list_mapping", "list_mapping_local",
        "skip_element", "local_base_iri",
    )

    def __init__(self):
        self.name = ""
        self.prefixes_all: dict[str, str] = _EMPTY
        self.prefixes_custom: dict[str, str] = _EMPTY
        self.subject = None            # Term | True | None
        self.explicit_new_subject = False
        self.predicates = None         # list[Term] | None
        self.object = None             # Term | True | None
        self.text_with_tags = None     # list[str] | None
        self.text_without_tags = None  # list[str] | None
        self.vocab = None              # str | None
        self.language = None           # str | None
        self.datatype = None           # NamedNode | None
        self.collect_child_tags = False
        self.collect_child_tags_for_current_tag = False
        self.collected_pattern_tag = None  # RdfaPattern | None
        self.interpret_object_as_time = False
        self.incomplete_triples: list[tuple] = []   # (predicate, reverse, list)
        self.inlist = False
        self.list_mapping: dict[str, list] = {}
        self.list_mapping_local: dict[str, list] = {}
        self.skip_element = False
        self.local_base_iri = None     # str | None

    def shallow_copy(self) -> "ActiveTag":
        dup = ActiveTag.__new__(ActiveTag)
        for slot in ActiveTag.__slots__:
            setattr(dup, slot, getattr(self, slot))
        return dup


class RdfaPattern:
    """Retained mini-DOM for rdfa:Pattern templates (IRdfaPattern.ts:7-16)."""

    __slots__ = ("name", "attributes", "text", "children", "referenced",
                 "root_pattern", "parent_tag", "constructed_blank_nodes")

    def __init__(self, name: str, attributes: dict[str, str],
                 root_pattern: bool, parent_tag: ActiveTag | None = None):
        self.name = name
        self.attributes = attributes
        self.text: list[str] = []
        self.children: list[RdfaPattern] = []
        self.referenced = False
        self.root_pattern = root_pattern
        self.parent_tag = parent_tag
        self.constructed_blank_nodes: list[BlankNode] | None = None


class RdfaEvaluator:
    """Per-document RDFa evaluator.

    ``emit`` receives ``(subject, predicate, object)`` Term triples; by
    default they are appended to ``self.triples``.
    """

    def __init__(self, base_iri: str = "", profile: str | None = None,
                 content_type: str | None = None,
                 features: RdfaFeatures | None = None,
                 vocab: str | None = None, language: str | None = None,
                 emit: Callable[[Term, Term, Term], None] | None = None):
        if content_type is not None:
            profile = content_type_to_profile(content_type)
        self.profile = profile or ""
        self.features = features if features is not None else RDFA_FEATURES[self.profile]
        f = self.features
        # mutable copy of the one feature onEnd() toggles (RdfaParser.ts:728,753)
        self._copy_patterns_active = f.copy_rdfa_patterns

        self.base_iri = base_iri          # mutable: <base> overrides it
        self.base_iri_document = base_iri  # frozen at construction (Util.ts:42)
        self.triples: list[tuple[Term, Term, Term]] = []
        self._emit_cb = emit

        self._bnode_counter = 0
        self._blank_node_factory: Callable[[], BlankNode] | None = None

        self.rdfa_patterns: dict[str, RdfaPattern] = {} if f.copy_rdfa_patterns else None
        self.pending_pattern_copies: dict[str, list[ActiveTag]] = {} if f.copy_rdfa_patterns else None

        root = ActiveTag()
        root.language = language
        root.vocab = vocab
        prefixes = dict(INITIAL_CONTEXT)
        if f.xhtml_initial_context:
            prefixes.update(INITIAL_CONTEXT_XHTML)
        root.prefixes_all = prefixes
        root.prefixes_custom = {}
        self.stack: list[ActiveTag] = [root]

    # ------------------------------------------------------------------ #
    # term construction (Util.ts methods that need evaluator state)

    def create_blank_node(self) -> BlankNode:
        if self._blank_node_factory is not None:
            return self._blank_node_factory()
        label = f"df_{self._bnode_counter}"
        self._bnode_counter += 1
        return BlankNode(label)

    def get_base_iri(self, value: str) -> str:
        """Strip #fragment, resolve against current base (Util.ts:146-153)."""
        i = value.find("#")
        if i >= 0:
            value = value[:i]
        return resolve_iri(value, self.base_iri)

    def get_base_iri_term(self, tag: ActiveTag) -> NamedNode:
        return NamedNode(tag.local_base_iri if tag.local_base_iri is not None else self.base_iri)

    def resource_or_base(self, term, tag: ActiveTag):
        return self.get_base_iri_term(tag) if term is True else term

    def create_iri(self, term: str | None, tag: ActiveTag, vocab: bool,
                   allow_safe_curie: bool, allow_blank_node: bool):
        """The central term constructor (Util.ts:239-297)."""
        term = term or ""
        if not allow_safe_curie:
            if not vocab:
                term = resolve_iri(term, self.get_base_iri_term(tag).value)
            if not is_valid_iri(term):
                return None
            return NamedNode(term)

        if term and term.startswith("[") and term.endswith("]"):
            term = term[1:-1]
            # Strict (safe) CURIEs MUST have a prefix separator
            if ":" not in term:
                return None

        if term.startswith("_:"):
            return BlankNode(term[2:] or "b_identity") if allow_blank_node else None

        if vocab and tag.vocab and ":" not in term:
            return NamedNode(tag.vocab + term)

        iri = expand_prefixed_term(term, tag.prefixes_all)
        if not vocab:
            iri = resolve_iri(iri, self.get_base_iri_term(tag).value)
        elif term != iri:
            # prefixed relative IRIs resolve against the *original* document
            # base, even after <base> mutated the active one (Util.ts:291)
            iri = resolve_iri(iri, self.base_iri_document)
        if not is_valid_iri(iri):
            return None
        return NamedNode(iri)

    def create_vocab_iris(self, terms: str, tag: ActiveTag, allow_terms: bool,
                          allow_blank_node: bool) -> list:
        """Whitespace-separated term list → IRI terms (Util.ts:182-195)."""
        out = []
        for part in terms.split():
            if not part or (not allow_terms and ":" not in part):
                continue
            iri = self.create_iri(part, tag, True, True, allow_blank_node)
            if iri is not None:
                out.append(iri)
        return out

    def create_literal(self, value: str, tag: ActiveTag) -> Literal:
        """Literal with lang/datatype + <time> sniffing (Util.ts:203-213)."""
        if tag.interpret_object_as_time and tag.datatype is None:
            sniffed = sniff_time_datatype(value)
            if sniffed is not None:
                tag.datatype = NamedNode(sniffed)
        if tag.datatype is not None:
            return Literal(value, "", tag.datatype.value)
        if tag.language:
            return Literal(value, tag.language.lower(), "")
        return Literal(value, "", "")

    # ------------------------------------------------------------------ #
    # emission

    def emit_triple(self, subject, predicate, obj) -> None:
        """Validity-gated emission (RdfaParser.ts:803-811).

        A None term (unresolvable subject/object) drops the triple instead
        of failing the document — the reference surfaces a stream error
        there; our per-row contract is best-effort extraction (SURVEY §4).
        """
        if subject is None or predicate is None or obj is None:
            return
        if (isinstance(subject, NamedNode) and ":" not in subject.value) or \
           (isinstance(predicate, NamedNode) and ":" not in predicate.value) or \
           (isinstance(obj, NamedNode) and ":" not in obj.value):
            return
        if self._emit_cb is not None:
            self._emit_cb(subject, predicate, obj)
        else:
            self.triples.append((subject, predicate, obj))

    # ------------------------------------------------------------------ #
    # SAX events (RdfaParser.ts:87-755)

    def on_tag_open(self, name: str, attributes: dict[str, str]) -> None:
        features = self.features
        stack = self.stack

        # Determine the parent tag, skipping over skipElement frames but
        # keeping the skipped tag's lang/prefixes/vocab (RdfaParser.ts:88-104)
        parent_i = len(stack) - 1
        while parent_i > 0 and stack[parent_i].skip_element:
            parent_i -= 1
        parent = stack[parent_i]
        if parent_i != len(stack) - 1:
            last = stack[-1]
            parent = parent.shallow_copy()
            parent.language = last.language
            parent.prefixes_all = last.prefixes_all
            parent.prefixes_custom = last.prefixes_custom
            parent.vocab = last.vocab

        tag = ActiveTag()
        tag.name = name
        tag.collect_child_tags = parent.collect_child_tags
        tag.collect_child_tags_for_current_tag = parent.collect_child_tags_for_current_tag
        tag.inlist = "inlist" in attributes
        tag.list_mapping = {}
        tag.list_mapping_local = parent.list_mapping
        tag.local_base_iri = parent.local_base_iri
        stack.append(tag)

        # Fast path: a tag with no RDFa-relevant attributes (bare, or only
        # class/id/style/...) that isn't <base>/<time>, outside XMLLiteral
        # capture and pattern collection, reduces the whole processing
        # sequence to pure context inheritance — the dominant case in
        # real-world markup, where most elements are plain structure.
        if (not attributes
            or _RDFA_RELEVANT_ATTRS.isdisjoint(attributes)
                and not any(k.startswith("xml") for k in attributes)) \
                and not tag.collect_child_tags \
                and not (self._copy_patterns_active
                         and parent.collected_pattern_tag is not None) \
                and name != "base" and name != "time":
            tag.vocab = parent.vocab
            tag.prefixes_custom = parent.prefixes_custom
            tag.prefixes_all = parent.prefixes_all
            tag.language = parent.language
            if len(stack) == 2:
                new_subject = True
            elif self._inherit_subject_in_head_body(name):
                new_subject = parent.object
            elif parent.object:
                new_subject = parent.object
                tag.skip_element = True
            else:
                new_subject = None
            completed = False
            if not tag.skip_element and new_subject and parent.incomplete_triples:
                completed = True
                self._complete_incomplete_triples(tag, parent, new_subject)
            if not completed and parent.incomplete_triples:
                tag.incomplete_triples = tag.incomplete_triples + parent.incomplete_triples
            tag.subject = new_subject if new_subject else parent.subject
            tag.object = new_subject
            return

        # XMLLiteral capture: serialize the open tag, injecting inherited
        # xmlns declarations sorted alphabetically (RdfaParser.ts:123-139)
        if tag.collect_child_tags:
            for prefix in sorted(parent.prefixes_custom):
                key = "xmlns" if prefix == "" else f"xmlns:{prefix}"
                if key not in attributes:
                    attributes[key] = parent.prefixes_custom[prefix]
            serialized = " ".join(f'{k}="{v}"' for k, v in attributes.items())
            tag.text_with_tags = [f"<{name} {serialized}>" if serialized else f"<{name}>"]
            if features.skip_handling_xml_literal_children:
                return

        allow_terms_in_rel = True
        allow_terms_in_rev = True
        if features.only_allow_uri_rel_rev_if_property:
            # drop non-CURIE rel/rev when property present (RdfaParser.ts:141-157)
            if "property" in attributes and "rel" in attributes:
                allow_terms_in_rel = False
                if ":" not in attributes["rel"]:
                    del attributes["rel"]
            if "property" in attributes and "rev" in attributes:
                allow_terms_in_rev = False
                if ":" not in attributes["rev"]:
                    del attributes["rev"]

        if self._copy_patterns_active:
            # inside-pattern subtree capture (RdfaParser.ts:159-173)
            if parent.collected_pattern_tag is not None:
                pattern = RdfaPattern(name, attributes, root_pattern=False)
                parent.collected_pattern_tag.children.append(pattern)
                tag.collected_pattern_tag = pattern
                return
            # typeof="rdfa:Pattern" root capture (RdfaParser.ts:175-187)
            if attributes.get("typeof") == "rdfa:Pattern":
                tag.collected_pattern_tag = RdfaPattern(
                    name, attributes, root_pattern=True, parent_tag=parent)
                return
            # property="rdfa:copy" instantiation or pend (RdfaParser.ts:189-201)
            if attributes.get("property") == "rdfa:copy":
                target = attributes.get("resource") or attributes.get("href") \
                    or attributes.get("src")
                existing = self.rdfa_patterns.get(target)
                if existing is not None:
                    self.emit_pattern_copy(parent, existing, target)
                else:
                    self.pending_pattern_copies.setdefault(target, []).append(parent)
                return

        # <base href> overrides the document base IRI (RdfaParser.ts:204-207)
        if features.base_tag and name == "base" and attributes.get("href"):
            self.base_iri = self.get_base_iri(attributes["href"])
        # xml:base scopes a local base to this subtree (RdfaParser.ts:208-211)
        if features.xml_base and attributes.get("xml:base"):
            tag.local_base_iri = self.get_base_iri(attributes["xml:base"])

        # <time> sets time-literal sniffing (RdfaParser.ts:213-216)
        if features.time_tag and name == "time" and "datatype" not in attributes:
            tag.interpret_object_as_time = True

        # --- W3C RDFa 1.1 processing sequence ---
        # 1: initialize values
        new_subject = None            # Term | True | None
        current_object_resource = None
        typed_resource = None

        # 2: @vocab (RdfaParser.ts:226-240)
        if "vocab" in attributes:
            if attributes["vocab"]:
                tag.vocab = attributes["vocab"]
                self.emit_triple(
                    self.get_base_iri_term(tag),
                    _RDFA_USES_VOCAB,
                    NamedNode(tag.vocab),
                )
            else:
                # empty @vocab restores the constructor-level root vocab
                tag.vocab = stack[0].vocab
        else:
            tag.vocab = parent.vocab

        # 3: prefixes (RdfaParser.ts:242-250)
        tag.prefixes_custom = parse_prefixes(
            attributes, parent.prefixes_custom, features.xmlns_prefix_mappings)
        if tag.prefixes_custom is parent.prefixes_custom:
            # nothing declared here: the parent's merged map already
            # contains these customs (its own construction invariant) —
            # share it instead of re-merging a fresh dict per tag
            tag.prefixes_all = parent.prefixes_all
        elif tag.prefixes_custom:
            tag.prefixes_all = {**parent.prefixes_all, **tag.prefixes_custom}
        else:
            tag.prefixes_all = parent.prefixes_all

        # @role (RdfaParser.ts:252-268)
        if features.role_attribute and attributes.get("role"):
            if attributes.get("id"):
                role_subject = self.create_iri("#" + attributes["id"], tag, False, False, False)
            else:
                role_subject = self.create_blank_node()
            vocab_old = tag.vocab
            tag.vocab = XHTML_VOCAB
            if role_subject is not None:
                for role in self.create_vocab_iris(attributes["role"], tag, True, False):
                    self.emit_triple(role_subject, _XHV_ROLE, role)
            tag.vocab = vocab_old

        # 4: language (RdfaParser.ts:271-276)
        if "xml:lang" in attributes or (features.lang_attribute and "lang" in attributes):
            tag.language = attributes.get("xml:lang") or attributes.get("lang")
        else:
            tag.language = parent.language

        is_root_tag = len(stack) == 2
        if "rel" not in attributes and "rev" not in attributes:
            # 5: new subject without rel/rev
            if "property" in attributes and "content" not in attributes \
                    and "datatype" not in attributes:
                # 5.1 (RdfaParser.ts:281-315)
                if "about" in attributes:
                    new_subject = self.create_iri(attributes["about"], tag, False, True, True)
                    tag.explicit_new_subject = bool(new_subject)
                elif is_root_tag:
                    new_subject = True
                elif parent.object:
                    new_subject = parent.object

                if "typeof" in attributes:
                    if "about" in attributes:
                        typed_resource = self.create_iri(attributes["about"], tag, False, True, True)
                    if not typed_resource and is_root_tag:
                        typed_resource = True
                    if not typed_resource and "resource" in attributes:
                        typed_resource = self.create_iri(attributes["resource"], tag, False, True, True)
                    if not typed_resource and ("href" in attributes or "src" in attributes):
                        typed_resource = self.create_iri(
                            attributes.get("href") or attributes.get("src"),
                            tag, False, False, True)
                    if not typed_resource and self._inherit_subject_in_head_body(name):
                        typed_resource = new_subject
                    if not typed_resource:
                        typed_resource = self.create_blank_node()
                    current_object_resource = typed_resource
            else:
                # 5.2 (RdfaParser.ts:317-345)
                if "about" in attributes or "resource" in attributes:
                    new_subject = self.create_iri(
                        attributes.get("about") or attributes.get("resource"),
                        tag, False, True, True)
                    tag.explicit_new_subject = bool(new_subject)
                if not new_subject and ("href" in attributes or "src" in attributes):
                    new_subject = self.create_iri(
                        attributes.get("href") or attributes.get("src"),
                        tag, False, False, True)
                    tag.explicit_new_subject = bool(new_subject)
                if not new_subject:
                    if is_root_tag:
                        new_subject = True
                    elif self._inherit_subject_in_head_body(name):
                        new_subject = parent.object
                    elif "typeof" in attributes:
                        new_subject = self.create_blank_node()
                        tag.explicit_new_subject = True
                    elif parent.object:
                        new_subject = parent.object
                        if "property" not in attributes:
                            tag.skip_element = True
                if "typeof" in attributes:
                    typed_resource = new_subject
        else:
            # 6: rel or rev present (RdfaParser.ts:347-384)
            if "about" in attributes:
                new_subject = self.create_iri(attributes["about"], tag, False, True, True)
                tag.explicit_new_subject = bool(new_subject)
                if "typeof" in attributes:
                    typed_resource = new_subject
            elif is_root_tag:
                new_subject = True
            elif parent.object:
                new_subject = parent.object

            if "resource" in attributes:
                current_object_resource = self.create_iri(
                    attributes["resource"], tag, False, True, True)
            if not current_object_resource:
                if "href" in attributes or "src" in attributes:
                    current_object_resource = self.create_iri(
                        attributes.get("href") or attributes.get("src"),
                        tag, False, False, True)
                elif "typeof" in attributes and "about" not in attributes \
                        and not self._inherit_subject_in_head_body(name):
                    current_object_resource = self.create_blank_node()

            if "typeof" in attributes and "about" not in attributes:
                if self._inherit_subject_in_head_body(name):
                    typed_resource = new_subject
                else:
                    typed_resource = current_object_resource

        # 7: rdf:type for the typed resource (RdfaParser.ts:386-395)
        if typed_resource:
            for type_term in self.create_vocab_iris(attributes.get("typeof", ""), tag, True, True):
                self.emit_triple(
                    self.resource_or_base(typed_resource, tag),
                    _RDF_TYPE,
                    type_term,
                )

        # 8: reset list mapping on a new subject (RdfaParser.ts:397-400)
        if new_subject:
            tag.list_mapping = {}

        # 9: rel/rev triples, or list contributions (RdfaParser.ts:402-435)
        if current_object_resource:
            if "rel" in attributes and "inlist" in attributes:
                for predicate in self.create_vocab_iris(
                        attributes["rel"], tag, allow_terms_in_rel, False):
                    self.add_list_mapping(tag, new_subject, predicate, current_object_resource)
            else:
                if "rel" in attributes:
                    for predicate in self.create_vocab_iris(
                            attributes["rel"], tag, allow_terms_in_rel, False):
                        self.emit_triple(
                            self.resource_or_base(new_subject, tag),
                            predicate,
                            self.resource_or_base(current_object_resource, tag),
                        )
                if "rev" in attributes:
                    for predicate in self.create_vocab_iris(
                            attributes["rev"], tag, allow_terms_in_rev, False):
                        self.emit_triple(
                            self.resource_or_base(current_object_resource, tag),
                            predicate,
                            self.resource_or_base(new_subject, tag),
                        )

        # 10: incomplete triples (RdfaParser.ts:437-464)
        if not current_object_resource:
            if "rel" in attributes:
                if "inlist" in attributes:
                    for predicate in self.create_vocab_iris(
                            attributes["rel"], tag, allow_terms_in_rel, False):
                        self.add_list_mapping(tag, new_subject, predicate, False)
                        tag.incomplete_triples.append((predicate, False, True))
                else:
                    for predicate in self.create_vocab_iris(
                            attributes["rel"], tag, allow_terms_in_rel, False):
                        tag.incomplete_triples.append((predicate, False, False))
            if "rev" in attributes:
                for predicate in self.create_vocab_iris(
                        attributes["rev"], tag, allow_terms_in_rev, False):
                    tag.incomplete_triples.append((predicate, True, False))
            if tag.incomplete_triples:
                current_object_resource = self.create_blank_node()

        # 11: current property value (RdfaParser.ts:466-556)
        if "property" in attributes:
            tag.predicates = self.create_vocab_iris(attributes["property"], tag, True, False)

            local_object_resource = None
            if "datatype" in attributes:
                tag.datatype = self.create_iri(attributes["datatype"], tag, True, True, False)
                if tag.datatype is not None and (
                        tag.datatype.value == RDF + "XMLLiteral" or
                        (features.html_datatype and tag.datatype.value == RDF + "HTML")):
                    tag.collect_child_tags = True
                    tag.collect_child_tags_for_current_tag = True
            else:
                if "rev" not in attributes and "rel" not in attributes \
                        and "content" not in attributes:
                    if "resource" in attributes:
                        local_object_resource = self.create_iri(
                            attributes["resource"], tag, False, True, True)
                    if not local_object_resource and "href" in attributes:
                        local_object_resource = self.create_iri(
                            attributes["href"], tag, False, False, True)
                    if not local_object_resource and "src" in attributes:
                        local_object_resource = self.create_iri(
                            attributes["src"], tag, False, False, True)
                if "typeof" in attributes and "about" not in attributes:
                    local_object_resource = typed_resource

            # a non-datatyped tag inside an XMLLiteral capture does not
            # re-serialize its own tag into the literal (RdfaParser.ts:499-504)
            if "datatype" not in attributes or attributes["datatype"] == "":
                tag.collect_child_tags_for_current_tag = False

            if "content" in attributes:
                obj = self.create_literal(attributes["content"], tag)
                if "inlist" in attributes:
                    for predicate in tag.predicates:
                        self.add_list_mapping(tag, new_subject, predicate, obj)
                else:
                    subject = self.resource_or_base(new_subject, tag)
                    for predicate in tag.predicates:
                        self.emit_triple(subject, predicate, obj)
                tag.predicates = None
            elif features.datetime_attribute and "datetime" in attributes:
                tag.interpret_object_as_time = True
                obj = self.create_literal(attributes["datetime"], tag)
                if "inlist" in attributes:
                    for predicate in tag.predicates:
                        self.add_list_mapping(tag, new_subject, predicate, obj)
                else:
                    subject = self.resource_or_base(new_subject, tag)
                    for predicate in tag.predicates:
                        self.emit_triple(subject, predicate, obj)
                tag.predicates = None
            elif local_object_resource:
                obj = self.resource_or_base(local_object_resource, tag)
                if "inlist" in attributes:
                    for predicate in tag.predicates:
                        self.add_list_mapping(tag, new_subject, predicate, obj)
                else:
                    subject = self.resource_or_base(new_subject, tag)
                    for predicate in tag.predicates:
                        self.emit_triple(subject, predicate, obj)
                tag.predicates = None

        # 12: complete the parent's incomplete triples (RdfaParser.ts:558-585)
        completed = False
        if not tag.skip_element and new_subject and parent.incomplete_triples:
            completed = True
            self._complete_incomplete_triples(tag, parent, new_subject)
        if not completed and parent.incomplete_triples:
            tag.incomplete_triples = tag.incomplete_triples + parent.incomplete_triples

        # 13: save evaluation context (RdfaParser.ts:587-589)
        tag.subject = new_subject if new_subject else parent.subject
        tag.object = current_object_resource if current_object_resource else new_subject

    def on_text(self, data: str) -> None:
        tag = self.stack[-1]
        # collect text inside a pattern subtree (RdfaParser.ts:596-599)
        if self._copy_patterns_active and tag.collected_pattern_tag is not None:
            tag.collected_pattern_tag.text.append(data)
            return
        if tag.text_with_tags is None:
            tag.text_with_tags = []
        if tag.text_without_tags is None:
            tag.text_without_tags = []
        tag.text_with_tags.append(data)
        tag.text_without_tags.append(data)

    def on_tag_close(self) -> None:
        stack = self.stack
        tag = stack[-1]
        parent = stack[-2] if len(stack) >= 2 else None

        if not (tag.collect_child_tags and parent is not None and parent.collect_child_tags
                and self.features.skip_handling_xml_literal_children):
            # store a finalized rdfa:Pattern (RdfaParser.ts:619-642)
            if self._copy_patterns_active and tag.collected_pattern_tag is not None \
                    and tag.collected_pattern_tag.root_pattern:
                pattern = tag.collected_pattern_tag
                pattern_id = pattern.attributes.get("resource")
                pattern.attributes.pop("resource", None)
                pattern.attributes.pop("typeof", None)
                self.rdfa_patterns[pattern_id] = pattern
                pending = self.pending_pattern_copies.pop(pattern_id, None)
                if pending:
                    for waiting_tag in pending:
                        self.emit_pattern_copy(waiting_tag, pattern, pattern_id)
                stack.pop()
                return

            # pending-property literal emission (RdfaParser.ts:645-673)
            if tag.predicates is not None:
                subject = self.resource_or_base(tag.subject, tag)
                if tag.collect_child_tags_for_current_tag:
                    segments = tag.text_with_tags or []
                    if tag.collect_child_tags and parent is not None and parent.collect_child_tags:
                        # nested XMLLiteral with RDFa content: drop own open tag
                        segments = segments[1:]
                else:
                    segments = tag.text_without_tags or []
                obj = self.create_literal("".join(segments), tag)
                if tag.inlist:
                    for predicate in tag.predicates:
                        self.add_list_mapping(tag, subject, predicate, obj)
                else:
                    for predicate in tag.predicates:
                        self.emit_triple(subject, predicate, obj)
                if parent is not None and parent.predicates is None:
                    tag.text_without_tags = None
                    tag.text_with_tags = None

            # 14: local list mappings → rdf:first/rest chains (RdfaParser.ts:675-698)
            if tag.object and tag.list_mapping:
                subject = self.resource_or_base(tag.object, tag)
                for predicate_value, values in tag.list_mapping.items():
                    predicate = NamedNode(predicate_value)
                    if values:
                        bnodes = [self.create_blank_node() for _ in values]
                        for i, value in enumerate(values):
                            obj = self.resource_or_base(value, tag)
                            self.emit_triple(bnodes[i], _RDF_FIRST, obj)
                            rest = bnodes[i + 1] if i < len(values) - 1 else _RDF_NIL
                            self.emit_triple(bnodes[i], _RDF_REST, rest)
                        self.emit_triple(subject, predicate, bnodes[0])
                    else:
                        self.emit_triple(subject, predicate, _RDF_NIL)

        stack.pop()

        # close the serialized tag in the XMLLiteral buffer (RdfaParser.ts:704-707)
        if tag.collect_child_tags and tag.text_with_tags is not None:
            tag.text_with_tags.append(f"</{tag.name}>")

        # bubble text buffers to the parent (RdfaParser.ts:709-723)
        if tag.text_with_tags is not None and parent is not None:
            if parent.text_with_tags is not None:
                parent.text_with_tags = parent.text_with_tags + tag.text_with_tags
            else:
                parent.text_with_tags = tag.text_with_tags
        if tag.text_without_tags is not None and parent is not None:
            if parent.text_without_tags is not None:
                parent.text_without_tags = parent.text_without_tags + tag.text_without_tags
            else:
                parent.text_without_tags = tag.text_without_tags

    def on_end(self) -> None:
        """Replay unreferenced patterns and dangling copies (RdfaParser.ts:726-755)."""
        if self.features.copy_rdfa_patterns:
            self._copy_patterns_active = False

            for pattern_id, pattern in self.rdfa_patterns.items():
                if not pattern.referenced:
                    pattern.attributes["typeof"] = "rdfa:Pattern"
                    pattern.attributes["resource"] = pattern_id
                    self.emit_pattern_copy(pattern.parent_tag, pattern, pattern_id)
                    pattern.referenced = False
                    pattern.attributes.pop("typeof", None)
                    pattern.attributes.pop("resource", None)

            for pattern_id, parent_tags in self.pending_pattern_copies.items():
                for parent_tag in parent_tags:
                    self.stack.append(parent_tag)
                    self.on_tag_open("link", {"property": "rdfa:copy", "href": pattern_id})
                    self.on_tag_close()
                    self.stack.pop()

            self._copy_patterns_active = True

    # ------------------------------------------------------------------ #
    # helpers

    def _complete_incomplete_triples(self, tag: ActiveTag, parent: ActiveTag,
                                     new_subject) -> None:
        """Step 12 body (RdfaParser.ts:560-582)."""
        stack = self.stack
        subject = self.resource_or_base(parent.subject, tag)
        obj = self.resource_or_base(new_subject, tag)
        for predicate, reverse, is_list in parent.incomplete_triples:
            if reverse:
                self.emit_triple(obj, predicate, subject)
            elif is_list:
                first_in_list_tag = None
                for i in range(len(stack) - 1, -1, -1):
                    if stack[i].inlist:
                        first_in_list_tag = stack[i]
                        break
                self.add_list_mapping(first_in_list_tag, new_subject, predicate, obj)
            else:
                self.emit_triple(subject, predicate, obj)

    def _inherit_subject_in_head_body(self, name: str) -> bool:
        return self.features.inherit_subject_in_head_body and name in ("head", "body")

    def add_list_mapping(self, tag: ActiveTag, subject, predicate, current_object_resource) -> None:
        """List contribution (RdfaParser.ts:775-795).

        Deliberate divergence: with an explicit new subject and NO object
        (``@about`` + ``@rel`` + ``@inlist`` and nothing to point at yet,
        RdfaParser.ts:441-444 passes ``false``), the reference emits
        ``(bnode, rdf:first, false)`` — a quad whose object is a JS
        boolean, which slips past its NamedNode-only emit guard
        (RdfaParser.ts:803-809) and the ``getResourceOrBaseIri`` cast
        (Util.ts:161-163).  No RDF consumer can represent that term, so
        here the falsy sentinel is dropped instead (matching the filter
        the non-explicit branch below always had); children completing
        the incomplete list still contribute normally."""
        if tag.explicit_new_subject:
            if not current_object_resource:
                return
            bnode = self.create_blank_node()
            self.emit_triple(self.resource_or_base(subject, tag), predicate, bnode)
            self.emit_triple(bnode, _RDF_FIRST,
                             self.resource_or_base(current_object_resource, tag))
            self.emit_triple(bnode, _RDF_REST, _RDF_NIL)
        else:
            predicate_list = tag.list_mapping_local.get(predicate.value)
            if predicate_list is None:
                predicate_list = tag.list_mapping_local[predicate.value] = []
            if current_object_resource:
                predicate_list.append(current_object_resource)

    def emit_pattern_copy(self, parent_tag: ActiveTag, pattern: RdfaPattern,
                          root_pattern_id: str) -> None:
        """Instantiate a pattern under a tag, reusing the pattern's blank
        nodes across copies (RdfaParser.ts:819-842)."""
        self.stack.append(parent_tag)
        pattern.referenced = True

        if pattern.constructed_blank_nodes is not None:
            nodes = pattern.constructed_blank_nodes
            state = {"i": 0}

            def factory() -> BlankNode:
                node = nodes[state["i"]]
                state["i"] += 1
                return node
            self._blank_node_factory = factory
        else:
            pattern.constructed_blank_nodes = []
            nodes = pattern.constructed_blank_nodes

            def factory() -> BlankNode:
                label = f"df_{self._bnode_counter}"
                self._bnode_counter += 1
                node = BlankNode(label)
                nodes.append(node)
                return node
            self._blank_node_factory = factory

        self._emit_pattern_copy_absolute(pattern, True, root_pattern_id)

        self._blank_node_factory = None
        self.stack.pop()

    def _emit_pattern_copy_absolute(self, pattern: RdfaPattern, root: bool,
                                    root_pattern_id: str) -> None:
        """Replay a pattern subtree; cycle-guarded (RdfaParser.ts:854-868)."""
        if not root and pattern.attributes.get("property") == "rdfa:copy" \
                and pattern.attributes.get("href") == root_pattern_id:
            return
        self.on_tag_open(pattern.name, pattern.attributes)
        for text in pattern.text:
            self.on_text(text)
        for child in pattern.children:
            self._emit_pattern_copy_absolute(child, False, root_pattern_id)
        self.on_tag_close()
