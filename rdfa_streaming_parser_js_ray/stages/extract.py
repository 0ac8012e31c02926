"""Triple extraction: the reference parser as one stateless Ray Data stage.

One input row (an interleaved document) explodes to N output triple rows.
The whole reference engine — tokenizer + RDFa evaluation sequence — runs
per row inside ``map_batches`` with zero cross-document state (SURVEY.md §1:
document = unit of parallelism).  Text spans are fed to the streaming
parser in ``offset`` order exactly as the reference consumes stream chunks
(/root/reference/lib/RdfaParser.ts:77-80); media spans are skipped for
parsing but counted, and span sequences are never reordered or mutated
(per-row invariant in BASELINE.json input_hint).

Blank-node labels are doc_id-scoped (``_:{doc_id}/{label}``) so extraction
is deterministic under retries and bnodes never collide across documents.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from ..core.parser import RdfaParser
from ..core.profiles import RdfaFeatures
from ..core.terms import BlankNode, Literal
from ..sources.documents import TRIPLES_SCHEMA

DEFAULT_PARTITIONS = 64


def triples_for_document(doc_id: str, spans: list[dict], *,
                         base_iri: str | None = None, profile: str = "",
                         features: RdfaFeatures | None = None,
                         vocab: str | None = None, language: str | None = None,
                         ) -> list[tuple]:
    """Parse one document's ordered spans; returns term triples.

    ``base_iri`` defaults to a doc_id-derived IRI (the reference takes it
    per-document from the caller, RdfaParser.ts:929-932).
    """
    if base_iri is None:
        base_iri = f"http://data.example/{doc_id}"
    parser = RdfaParser(base_iri=base_iri, profile=profile, features=features,
                        vocab=vocab, language=language)
    for span in sorted(spans, key=lambda s: s["offset"]):
        if span["kind"] == "text" and span["text"]:
            parser.write(span["text"])
    parser.end()
    return parser.triples


class ExtractTriples:
    """Callable for ``ds.map_batches(ExtractTriples(...))``.

    Configured once per worker (profile/features parsed in ``__init__``),
    then applied per Arrow batch.  Usable as a plain function too — it
    holds no mutable state, so Ray schedules it as stateless tasks unless
    an actor pool is requested.
    """

    def __init__(self, profile: str = "", features: RdfaFeatures | None = None,
                 vocab: str | None = None, language: str | None = None,
                 base_iri: str | None = None, default_graph: str = "",
                 num_partitions: int = DEFAULT_PARTITIONS):
        self.profile = profile
        self.features = features
        self.vocab = vocab
        self.language = language
        self.base_iri = base_iri
        # constant graph term for all quads (the reference's defaultGraph
        # constructor option, RdfaParser.ts:37,941-943); '' = default graph
        self.default_graph = default_graph
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc, out_s, out_p = [], [], []
        out_kind, out_val, out_lang, out_dt = [], [], [], []
        num_partitions = self.num_partitions

        doc_ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        for doc_id, spans in zip(doc_ids, spans_col):
            # per-doc staging so a term that fails to serialize discards
            # only this document's rows, never a partially-appended doc
            d_doc, d_s, d_p = [], [], []
            d_kind, d_val, d_lang, d_dt = [], [], [], []
            try:
                triples = triples_for_document(
                    doc_id, spans, base_iri=self.base_iri, profile=self.profile,
                    features=self.features, vocab=self.vocab, language=self.language)
                prefix = f"_:{doc_id}/"
                for s, p, o in triples:
                    d_doc.append(doc_id)
                    d_s.append(prefix + s.value if isinstance(s, BlankNode) else s.value)
                    d_p.append(p.value)
                    if isinstance(o, Literal):
                        d_kind.append("literal")
                        d_val.append(o.value)
                        d_lang.append(o.language)
                        d_dt.append(o.datatype)
                    elif isinstance(o, BlankNode):
                        d_kind.append("bnode")
                        d_val.append(prefix + o.value)
                        d_lang.append("")
                        d_dt.append("")
                    else:
                        d_kind.append("iri")
                        d_val.append(o.value)
                        d_lang.append("")
                        d_dt.append("")
            except Exception:
                # best-effort per document: a malformed doc yields nothing
                # rather than failing the block (SURVEY.md §4 error handling)
                continue
            out_doc.extend(d_doc)
            out_s.extend(d_s)
            out_p.extend(d_p)
            out_kind.extend(d_kind)
            out_val.extend(d_val)
            out_lang.extend(d_lang)
            out_dt.extend(d_dt)

        from .canonicalize import part_key_of
        part = part_key_of(out_s, num_partitions)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.string()),
            "subj": pa.array(out_s, pa.string()),
            "pred": pa.array(out_p, pa.string()),
            "obj_kind": pa.array(out_kind, pa.string()),
            "obj_value": pa.array(out_val, pa.string()),
            "obj_lang": pa.array(out_lang, pa.string()),
            "obj_datatype": pa.array(out_dt, pa.string()),
            "graph": pa.array([self.default_graph] * len(out_doc), pa.string()),
            "part_key": pa.array(part, pa.int32()),
        }, schema=TRIPLES_SCHEMA)


def extract_triples(docs_ds, *, profile: str = "",
                    features: RdfaFeatures | None = None,
                    vocab: str | None = None, language: str | None = None,
                    base_iri: str | None = None, default_graph: str = "",
                    batch_size: int = 64,
                    num_partitions: int = DEFAULT_PARTITIONS):
    """documents Dataset → triples Dataset (stateless, shuffle-free).

    ``batch_size`` is deliberately small (docs are KB–MB each and parsing is
    CPU-heavy); the streaming executor pipelines blocks with backpressure.
    """
    fn = ExtractTriples(profile=profile, features=features, vocab=vocab,
                        language=language, base_iri=base_iri,
                        default_graph=default_graph,
                        num_partitions=num_partitions)
    return docs_ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def parse_errors(docs_ds, **extract_kwargs):
    """Per-document error lineage (SURVEY.md §4): one row per document
    whose parse raised, with the error text — the companion to
    ``extract_triples``'s best-effort skip, so a run can account for every
    input row (extracted + errored = total)."""

    def errs(batch: pa.Table) -> pa.Table:
        doc_ids, errors = [], []
        for doc_id, spans in zip(batch["doc_id"].to_pylist(),
                                 batch["spans"].to_pylist()):
            try:
                triples_for_document(doc_id, spans, **extract_kwargs)
            except Exception as exc:  # noqa: BLE001 - lineage wants them all
                doc_ids.append(doc_id)
                errors.append(f"{type(exc).__name__}: {exc}")
        return pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                         "error": pa.array(errors, pa.string())})

    return docs_ds.map_batches(errs, batch_format="pyarrow")


def span_audit(docs_ds):
    """Per-row span-sequence audit record: (doc_id, n_spans, n_text, n_media,
    fingerprint) where fingerprint hashes the ordered (kind, text, media_ref)
    sequence.  Comparing audits before/after a pipeline proves the span
    invariant (BASELINE.json input_hint)."""

    def audit(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        rows = {"doc_id": [], "n_spans": [], "n_text": [], "n_media": [],
                "fingerprint": []}
        for doc_id, spans in zip(doc_ids, spans_col):
            ordered = sorted(spans, key=lambda s: s["offset"])
            fp = zlib.crc32(
                "\x1f".join(f"{s['kind']}\x1e{s['text']}\x1e{s['media_ref']}"
                            for s in ordered).encode())
            rows["doc_id"].append(doc_id)
            rows["n_spans"].append(len(ordered))
            rows["n_text"].append(sum(s["kind"] == "text" for s in ordered))
            rows["n_media"].append(sum(s["kind"] == "media" for s in ordered))
            rows["fingerprint"].append(fp)
        return pa.table(rows)

    return docs_ds.map_batches(audit, batch_format="pyarrow")


def doc_manifest(docs_ds):
    """Per-document identity record for incremental re-ingest:
    ``(doc_id, content_hash)`` where content_hash is the md5 hex of the
    ordered ``(kind, text, media_ref)`` span serialization — the same
    serialization :func:`span_audit` fingerprints, but 128-bit so
    cross-snapshot equality is collision-safe at 10^12 documents
    (crc32's birthday bound is ~10^5).  Written next to the extraction
    checkpoint by ``construct_kg`` so a later run can diff against it
    and re-parse only the delta."""
    import hashlib

    def manifest(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        hashes = []
        for spans in spans_col:
            ordered = sorted(spans, key=lambda s: s["offset"])
            payload = "\x1f".join(
                f"{s['kind']}\x1e{s['text']}\x1e{s['media_ref']}"
                for s in ordered)
            hashes.append(hashlib.md5(payload.encode()).hexdigest())
        return pa.table({"doc_id": doc_ids, "content_hash": hashes})

    return docs_ds.map_batches(manifest, batch_format="pyarrow")
