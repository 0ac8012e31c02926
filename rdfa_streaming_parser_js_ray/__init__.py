"""rdfa_streaming_parser_js_ray — a Ray-Data-native knowledge-graph
construction engine.

Re-expresses the query/data-processing capabilities of the reference
RDFa 1.1 streaming parser (rubensworks/rdfa-streaming-parser.js) as a
distributed Ray Data pipeline:

- ``core``      — pure-Python RDFa 1.1 evaluator (per-document, no Ray)
- ``sources``   — documents-table (interleaved text+media spans) readers/writers
- ``stages``    — Ray Data ``map_batches`` stages (extract, mentions, linking,
                  canonicalize, dedup, text analysis, ANN, media)
- ``functions`` — scalar/vectorized helpers shared by stages
- ``pipelines`` — end-to-end composed pipelines (KG construction, dedup, ...)
- ``state``     — checkpoint manifests / resumable-partition bookkeeping
"""

__version__ = "0.1.0"

from .core.parser import RdfaParser, parse_rdfa  # noqa: F401
