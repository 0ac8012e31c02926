"""The interleaved-documents table: schema, synthesis, read/write.

Authoritative input shape (BASELINE.json ``input_hint`` / FIXTURES.md §1):

    doc_id: string
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>

``kind`` is ``"text"`` (an HTML/XHTML/SVG chunk — chunk boundaries are
arbitrary and may split tags mid-token, mirroring the reference's stream
chunking at /root/reference/lib/RdfaParser.ts:77-80) or ``"media"`` (an
opaque media reference that must round-trip unchanged).

Lance is preferred when ``pylance`` is importable; this container has no
Lance, so Parquet is the interchange format behind the same two calls.
"""

from __future__ import annotations

import random

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

DOCS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

TRIPLES_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj_kind", pa.string()),       # "iri" | "bnode" | "literal"
    ("obj_value", pa.string()),
    ("obj_lang", pa.string()),
    ("obj_datatype", pa.string()),
    ("graph", pa.string()),
    ("part_key", pa.int32()),
])

try:  # pragma: no cover - environment probe
    import lance  # noqa: F401
    _HAVE_LANCE = True
except ImportError:
    _HAVE_LANCE = False


def read_parquet_clean(path: str, columns: list[str] | None = None, **kwargs):
    """``read_parquet`` with a metadata-free explicit schema.

    Pandas-written parquet carries schema metadata that is unhashable,
    which defeats Ray's block-schema deduplication (a warning per fused
    read task and a slower unify path); projecting to bare fields fixes
    both.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    base = pq.read_schema(path)
    names = columns if columns is not None else base.names
    schema = pa.schema([base.field(n) for n in names])
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)


def read_documents(path: str, **kwargs):
    """documents table → ray.data.Dataset (Lance when available, else Parquet)."""
    import ray.data as rd

    if _HAVE_LANCE and not path.endswith(".parquet"):
        return rd.read_lance(path, **kwargs)
    return rd.read_parquet(path, **kwargs)


def write_table(ds, path: str, **kwargs):
    if _HAVE_LANCE and not path.endswith(".parquet"):
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)


# deterministic kind mix for the media manifest (image/audio/video/unknown)
_MEDIA_EXTS = (".png", ".mp3", ".mp4", "")


def spans_from_html(doc_id: str, html: str, rng: random.Random,
                    max_text_spans: int = 8, max_media_spans: int = 3) -> list[dict]:
    """Pack one document's markup into an interleaved span sequence.

    Splits at pseudo-random character positions into 1..max_text_spans text
    spans (boundaries may fall inside tags/entities) and interleaves
    0..max_media_spans opaque media spans (FIXTURES.md §1 generation rules).
    Deterministic given the caller's seeded ``rng``.
    """
    n_cuts = rng.randint(0, max_text_spans - 1)
    cuts = sorted(rng.sample(range(1, max(2, len(html))), min(n_cuts, max(0, len(html) - 1))))
    pieces = []
    prev = 0
    for cut in cuts:
        pieces.append(html[prev:cut])
        prev = cut
    pieces.append(html[prev:])

    n_media = rng.randint(0, max_media_spans)
    media_slots = sorted(rng.randint(0, len(pieces)) for _ in range(n_media))

    spans: list[dict] = []
    offset = 0
    media_i = 0
    for i, piece in enumerate(pieces):
        while media_i < len(media_slots) and media_slots[media_i] == i:
            spans.append({"kind": "media", "text": "",
                          "media_ref": f"media://{doc_id}/m{media_i}{_MEDIA_EXTS[media_i % 4]}",
                          "offset": offset})
            offset += 1
            media_i += 1
        spans.append({"kind": "text", "text": piece, "media_ref": "", "offset": offset})
        offset += 1
    while media_i < len(media_slots):
        spans.append({"kind": "media", "text": "",
                      "media_ref": f"media://{doc_id}/m{media_i}{_MEDIA_EXTS[media_i % 4]}",
                      "offset": offset})
        offset += 1
        media_i += 1
    return spans


def documents_from_files(paths: str | list[str], chunk_bytes: int = 0):
    """HTML files on disk → interleaved-documents Dataset (one row per
    file; doc_id = file path).

    Mirrors the reference's file-stream entrypoint
    (/root/reference/perf/RdfaParser-perf.ts:11-29: createReadStream →
    parser).  ``chunk_bytes`` > 0 splits each file into fixed-size text
    spans (stream chunking); 0 keeps one span per file.
    """
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def to_rows(batch: "pa.Table") -> pa.Table:
        doc_ids, spans_col = [], []
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            text = data.decode("utf-8", errors="replace")
            if chunk_bytes > 0:
                pieces = [text[i:i + chunk_bytes]
                          for i in range(0, max(1, len(text)), chunk_bytes)]
            else:
                pieces = [text]
            doc_ids.append(path)
            spans_col.append([
                {"kind": "text", "text": piece, "media_ref": "", "offset": i}
                for i, piece in enumerate(pieces)])
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans_col, pa.list_(SPAN_STRUCT)),
        })

    return files.map_batches(to_rows, batch_format="pyarrow")


def documents_from_jsonl(paths: str | list[str], **kwargs):
    """JSONL documents (one ``{"doc_id": ..., "spans": [...]}`` object per
    line) → interleaved-documents Dataset with ``DOCS_SCHEMA``.

    The common interchange format for crawl/annotation dumps.  Ray's
    ``read_json`` parallelizes at the file level, so a sharded dump (one
    .jsonl per shard) streams with the same block-per-shard layout as the
    Parquet path; the explicit schema pins ``offset`` to int32 and makes a
    missing/misspelled field a hard parse error instead of a silent
    schema drift.
    """
    import ray.data as rd
    from pyarrow import json as pj

    return rd.read_json(
        paths,
        parse_options=pj.ParseOptions(explicit_schema=DOCS_SCHEMA),
        **kwargs)


def write_documents_jsonl(ds, path: str, **kwargs):
    """Interleaved-documents Dataset → sharded JSONL (one file per block),
    the inverse of ``documents_from_jsonl``."""
    return ds.write_json(path, **kwargs)


FLAT_DOCS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])


def flat_docs_from_csv(paths: str | list[str], schema: "pa.Schema" = None,
                       **kwargs):
    """Sharded CSV → flat documents Dataset (the ``documents`` table's
    doc_id/text/lang/source/n_chars shape) with an explicit Arrow schema.

    CSV cannot hold the interleaved table's nested ``spans`` column —
    that path is JSONL (:func:`documents_from_jsonl`); this is the
    interchange format for FLAT per-document tables (exports from
    spreadsheets/warehouses).  Ray parallelizes at the file level, so a
    sharded dump streams block-per-shard like the Parquet path.  The
    convert options pair with :func:`write_flat_docs_csv`'s quoting
    contract: an UNQUOTED empty field is NULL, a QUOTED ``""`` is the
    empty string — so null/empty text round-trips byte-exact; embedded
    newlines in text cells parse because ``newlines_in_values`` is on.
    """
    import ray.data as rd
    from pyarrow import csv as pcsv

    schema = schema if schema is not None else FLAT_DOCS_SCHEMA
    return rd.read_csv(
        paths,
        parse_options=pcsv.ParseOptions(newlines_in_values=True),
        convert_options=pcsv.ConvertOptions(
            column_types={f.name: f.type for f in schema},
            strings_can_be_null=True,
            quoted_strings_can_be_null=False),
        **kwargs)


def write_flat_docs_csv(ds, path: str, **kwargs):
    """Flat documents Dataset → sharded CSV (one file per block), the
    inverse of :func:`flat_docs_from_csv`.  ``quoting_style='all_valid'``
    quotes every non-null string so the reader can tell NULL (unquoted
    empty) from the empty string (``""``)."""
    from pyarrow import csv as pcsv

    return ds.write_csv(
        path,
        arrow_csv_args_fn=lambda: {
            "write_options": pcsv.WriteOptions(quoting_style="all_valid")},
        **kwargs)


# --- deterministic synthetic corpora ---------------------------------------

_VOCABS = [
    "http://schema.org/",
    "http://xmlns.com/foaf/0.1/",
    "http://purl.org/dc/terms/",
]
_PROPS = ["name", "title", "description", "creator", "subject", "knows",
          "member", "author", "headline", "text"]


def _synth_html(doc_id: str, rng: random.Random, depth_max: int, scale_chars: int) -> str:
    """Seeded template expansion: nested div/span trees with
    property/rel/typeof/about/inlist attributes (FIXTURES.md §4)."""
    vocab = rng.choice(_VOCABS)
    parts = [f'<html prefix="ex: http://example.org/ns#">'
             f'<head><base href="http://data.example/{doc_id}/" /></head>'
             f'<body vocab="{vocab}">']
    budget = [max(1, scale_chars)]

    def emit_node(depth: int) -> None:
        if budget[0] <= 0:
            return
        choice = rng.random()
        prop = rng.choice(_PROPS)
        # ~half the elements are plain structure (class/id/nav markup with
        # no RDFa attributes) — real pages are mostly un-annotated; the
        # RDFa constructs sit inside that skeleton
        if choice < 0.25:
            text = " ".join(rng.choice(_PROPS) for _ in range(rng.randint(2, 10)))
            parts.append(f'<p class="c{rng.randint(0, 30)}">{text}</p>')
            budget[0] -= len(text) + 25
        elif choice < 0.38:
            parts.append(f'<div class="wrap{rng.randint(0, 9)}" '
                         f'id="s{rng.randint(0, 999)}">')
            if depth < depth_max:
                for _ in range(rng.randint(1, 3)):
                    emit_node(depth + 1)
            parts.append("</div>")
            budget[0] -= 45
        elif choice < 0.48:
            # plain nav link: href with no rel/rev/property still walks the
            # full subject-resolution path (step 5.2) — keep some of each
            if rng.random() < 0.5:
                parts.append(f'<a class="nav" href="page{rng.randint(0, 99)}">x</a>')
            else:
                parts.append(f'<span class="badge" title="{prop}">x</span>')
            budget[0] -= 40
        elif choice < 0.6:
            text = " ".join(rng.choice(_PROPS) for _ in range(rng.randint(1, 8)))
            parts.append(f'<span property="{prop}">{text}</span>')
            budget[0] -= len(text) + 30
        elif choice < 0.72:
            eid = rng.randint(0, 199)
            # mention text matches the IRI tail so entity linking has signal
            parts.append(f'<div about="#Entity{eid}" typeof="Thing">'
                         f'<span property="name">Entity{eid}</span>')
            if depth < depth_max:
                for _ in range(rng.randint(1, 3)):
                    emit_node(depth + 1)
            parts.append("</div>")
            budget[0] -= 70
        elif choice < 0.8:
            parts.append(f'<a rel="ex:{prop}" href="item{rng.randint(0, 999)}">x</a>')
            budget[0] -= 40
        elif choice < 0.87:
            parts.append(f'<ul rel="ex:list{rng.randint(0, 9)}" inlist="">')
            for i in range(rng.randint(0, 3)):
                parts.append(f'<li about="#i{rng.randint(0, 99)}"></li>')
            parts.append("</ul>")
            budget[0] -= 50
        elif choice < 0.94:
            parts.append(f'<time property="dateModified">20{rng.randint(10, 29)}-0{rng.randint(1, 9)}-1{rng.randint(0, 9)}</time>')
            budget[0] -= 45
        else:
            text = " ".join(rng.choice(_PROPS) for _ in range(rng.randint(1, 5)))
            parts.append(f'<p property="{prop}" content="{text}">ignored</p>')
            budget[0] -= len(text) + 40
        return

    while budget[0] > 0:
        emit_node(0)
    parts.append("</body></html>")
    return "".join(parts)


def synthesize_documents(n_docs: int, seed: int = 42,
                         median_chars: int = 1500, heavy_tail: bool = True,
                         ) -> pa.Table:
    """Deterministic corpus of n_docs interleaved documents.

    Doc sizes are log-normal (top ~1% ≈ 30-100× median) to exercise skew
    handling; every doc is packed via ``spans_from_html``.
    """
    rng = random.Random(seed)
    doc_ids, spans_col = [], []
    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        if heavy_tail:
            scale = int(median_chars * rng.lognormvariate(0, 1.2))
        else:
            scale = median_chars
        html = _synth_html(doc_id, rng, depth_max=rng.randint(2, 6),
                           scale_chars=scale)
        doc_ids.append(doc_id)
        spans_col.append(spans_from_html(doc_id, html, rng))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "spans": pa.array(spans_col, pa.list_(SPAN_STRUCT)),
    })


def documents_from_sf_table(sf_dir: str) -> "object":
    """Wrap the driver's ``documents`` parquet table (doc_id:int64, text,
    lang, source, n_chars) into RDFa-annotated interleaved span documents.

    The wrapping template is deliberately simple enough that the emitted
    triples are SQL-derivable from the source table — this is what makes the
    distributed extraction stage oracle-checkable end-to-end.  Each doc
    emits (subj = http://data.example/doc/{doc_id}):

      (subj, dc:title,      text-literal@lang)
      (subj, dc:source,     source-IRI)
      (subj, dc:identifier, "doc{doc_id}"@lang)

    Docs with ``doc_id % 50 == 7`` additionally carry a *mirror* section
    under the alternate IRI http://mirror.example/doc/{doc_id} with the
    same dc:identifier and dc:title — planted duplicate entities that the
    KG pipeline's identifier-based entity resolution must merge (mirror
    subject canonicalizes onto the primary IRI, after which exact dedup
    collapses its triples), keeping the full kg_construct output
    SQL-derivable too.

    Returns a ray.data.Dataset with DOCS_SCHEMA.
    """
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang", "source"])

    def to_spans(batch: pa.Table) -> pa.Table:
        doc_ids, spans_col = [], []
        for doc_id, text, lang, source in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist(),
                batch["lang"].to_pylist(), batch["source"].to_pylist()):
            esc = (text or "").replace("&", "&amp;").replace("<", "&lt;")
            mirror = ""
            if doc_id % 50 == 7:
                mirror = (
                    f'<div about="http://mirror.example/doc/{doc_id}">'
                    f'<h2 property="dc:title">{esc}</h2>'
                    f'<span property="dc:identifier">doc{doc_id}</span>'
                    f"</div>"
                )
            html = (
                f'<html prefix="dc: http://purl.org/dc/terms/">'
                f'<body about="http://data.example/doc/{doc_id}" lang="{lang}">'
                f'<h1 property="dc:title">{esc}</h1>'
                f'<a rel="dc:source" href="http://data.example/src/{source}">src</a>'
                f'<span property="dc:identifier">doc{doc_id}</span>'
                f"{mirror}</body></html>"
            )
            rng = random.Random(doc_id)  # deterministic per-doc chunking
            doc_ids.append(f"doc-{doc_id}")
            spans_col.append(spans_from_html(f"doc-{doc_id}", html, rng))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans_col, pa.list_(SPAN_STRUCT)),
        })

    return ds.map_batches(to_spans, batch_format="pyarrow", batch_size=1024)
