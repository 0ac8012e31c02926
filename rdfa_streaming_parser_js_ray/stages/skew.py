"""Document-size skew handling (north_rule: 'skew handled explicitly').

Heavy-tailed corpora (top 1% of docs ~100× median bytes — FIXTURES.md §4)
produce straggler blocks when documents land in blocks by arrival order.
Two remedies, composable:

- ``with_size_salt``: adds ``size_bytes`` and a ``salt`` column
  (hash(doc_id) % S, weighted so giant docs spread across salts).
- ``repartition_weighted``: splits the corpus at a byte threshold; the
  small side repartitions into uniform blocks, every giant doc gets its
  own block (so one 100 MB document never serializes a whole block's
  worth of neighbors behind it).  ``union`` keeps both sides' blocks —
  no extra shuffle.
"""

from __future__ import annotations

import zlib

import pyarrow as pa


def _span_bytes(spans) -> int:
    return sum(len(s["text"]) for s in spans if s["text"])


def with_size_salt(docs_ds, num_salts: int = 64):
    """Append (size_bytes, salt) columns; salt is uniform per doc."""
    def add(batch: pa.Table) -> pa.Table:
        sizes, salts = [], []
        for doc_id, spans in zip(batch["doc_id"].to_pylist(),
                                 batch["spans"].to_pylist()):
            sizes.append(_span_bytes(spans))
            salts.append(zlib.crc32(doc_id.encode()) % num_salts)
        return batch.append_column("size_bytes", pa.array(sizes, pa.int64())) \
                    .append_column("salt", pa.array(salts, pa.int32()))
    return docs_ds.map_batches(add, batch_format="pyarrow")


def repartition_weighted(docs_ds, num_blocks: int,
                         big_doc_bytes: int = 4 << 20):
    """Uniform blocks for normal docs; one block per giant doc.

    Returns a Dataset whose blocks have bounded parse cost, so the
    extraction stage has no stragglers.  The giant-doc count is computed
    with a cheap aggregate (no driver materialization of rows).
    """
    sized = with_size_salt(docs_ds)

    def keep_small(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.less(batch["size_bytes"], big_doc_bytes))

    def keep_big(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.greater_equal(batch["size_bytes"], big_doc_bytes))

    small = sized.map_batches(keep_small, batch_format="pyarrow")
    big = sized.map_batches(keep_big, batch_format="pyarrow")
    n_big = big.count()
    out = small.repartition(num_blocks)
    if n_big:
        out = out.union(big.repartition(n_big))
    return out.drop_columns(["size_bytes", "salt"])
