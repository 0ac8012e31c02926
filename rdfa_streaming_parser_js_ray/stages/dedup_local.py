"""Size-guarded single-task kernels for the MinHash-LSH family.

Same rationale as ``graph_local.py`` (round-5 gate-latency work): the
joined near-dup/decontam pipelines spend 4-5 all-to-all exchanges
(band-row bucket groupby, pair fold, two text hash-joins, final
aggregate) whose FIXED cost is ~1-2 s each regardless of data size.
On a corpus whose band rows and texts fit one worker's heap, that
overhead dominates a hundred-fold: the sf0.01 ``fuzzy_decontam`` gate
entry spent ~20 s in exchange fixed costs for well under a second of
shingling and Jaccard arithmetic.

Division of labor under the bound:

- band-row generation (the MinHash compute, the only part that is
  CPU-heavy) stays a DISTRIBUTED ``map_batches`` — embarrassingly
  parallel, exchange-free;
- everything exchange-shaped (candidate self-join, band counting,
  text attachment, exact-Jaccard verify, per-doc reduction) collapses
  into ONE Ray task over the materialized band-row / text blocks.

The guard is METADATA-CHEAP (``joins.estimate_rows``: materialized
counts, else parquet-metadata byte sizes at 64 B/row — which for
kilobyte text rows over-counts ~30x, i.e. errs toward the distributed
path).  Nothing corpus-sized touches the driver: blocks stream object
store -> task, the result returns as one block ref.  Above the bound
the callers' bucket-bounded exchanges run unchanged — at 100 TB the
estimate is astronomically past the bound and this module is inert.

Kernels replicate their distributed twins' semantics EXACTLY (pinned
byte-equal by ``tests/test_stages.py``):

- ``pairs_verify_kernel``  == ``minhash_lsh_candidates`` +
  ``minhash_dedup_pairs_joined``'s two hash-joins + verify: distinct
  (doc, band, hash) rows self-joined on (band, hash), ``doc_a <
  doc_b``, per-pair band count, exact shingle Jaccard >= threshold.
- ``decontam_kernel``      == ``minhash_decontam``'s cross-side
  bucket merge + joins + verify + per-doc Count/Max reduction.
"""

from __future__ import annotations

import pandas as pd

# Estimated-document bound for the single-task path.  100k docs x 32
# bands = 3.2M slim band rows plus the doc texts (~a few hundred MB at
# kilobyte documents) — comfortably one task's heap.  The byte-based
# estimate over-counts kilobyte rows ~30x, so the effective corpus
# bound is smaller still.
SMALL_CORPUS_MAX_DOCS = 100_000


_RUN_REMOTE = None


def _run_kernel_task(kern, kwargs, counts, *blocks):
    dfs, i = [], 0
    for c in counts:
        blks = [b for b in blocks[i:i + c] if len(b)]
        if blks:
            dfs.append(pd.concat(blks, ignore_index=True))
        elif c:
            dfs.append(blocks[i].iloc[:0])
        else:
            dfs.append(pd.DataFrame())
        i += c
    return kern(*dfs, **kwargs)


def solve_in_task_n(kernel, datasets, **kw):
    """Run ``kernel(df_0, df_1, ..., **kw)`` inside ONE Ray task over
    the blocks of several materialized Datasets; return a Dataset.

    The single-dataset ``graph_local.solve_in_task`` delegates here.
    The driver only handles ObjectRefs — blocks stream object store ->
    task and the kernel's output comes back as a single block ref.
    The remote function is created once per driver process (module
    cache), not re-exported per invocation.
    """
    import ray
    import ray.data as rd

    global _RUN_REMOTE
    if _RUN_REMOTE is None:
        _RUN_REMOTE = ray.remote(_run_kernel_task)

    groups = [ds.to_pandas_refs() for ds in datasets]
    counts = [len(g) for g in groups]
    flat = [r for g in groups for r in g]
    return rd.from_pandas_refs(
        [_RUN_REMOTE.remote(kernel, kw, counts, *flat)])


def candidate_pairs_kernel(band_rows: pd.DataFrame) -> pd.DataFrame:
    """``minhash_lsh_candidates`` in one frame: band rows
    [doc_id, band, band_hash] -> candidate pairs with agreeing-band
    counts [doc_a, doc_b, n_bands] (doc_a < doc_b)."""
    id_dtype = band_rows["doc_id"].dtype \
        if "doc_id" in band_rows.columns else "int64"
    empty = pd.DataFrame({
        "doc_a": pd.Series(dtype=id_dtype),
        "doc_b": pd.Series(dtype=id_dtype),
        "n_bands": pd.Series(dtype="int64")})
    if "doc_id" not in band_rows.columns or not len(band_rows):
        return empty
    g = band_rows[["doc_id", "band", "band_hash"]].drop_duplicates()
    j = g.merge(g, on=["band", "band_hash"], suffixes=("_a", "_b"))
    j = j[j["doc_id_a"] < j["doc_id_b"]]
    if not len(j):
        return empty
    cand = j.groupby(["doc_id_a", "doc_id_b"], as_index=False,
                     sort=False).size() \
        .rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b",
                         "size": "n_bands"})
    cand["n_bands"] = cand["n_bands"].astype("int64")
    return cand.reset_index(drop=True)


def pairs_verify_kernel(band_rows: pd.DataFrame, texts: pd.DataFrame, *,
                        threshold: float, shingle_k: int) -> pd.DataFrame:
    """``minhash_dedup_pairs_joined`` in one frame: band rows
    [doc_id, band, band_hash] -> verified near-dup pairs
    [doc_a, doc_b, n_bands, jaccard].  ``texts`` is [doc_id, text]."""
    from .dedup import ngram_jaccard

    cand = candidate_pairs_kernel(band_rows)
    if not len(cand):
        cand["jaccard"] = pd.Series(dtype="float64")
        return cand
    cand = cand.merge(
        texts.rename(columns={"doc_id": "doc_a", "text": "text_a"}),
        on="doc_a")
    cand = cand.merge(
        texts.rename(columns={"doc_id": "doc_b", "text": "text_b"}),
        on="doc_b")
    sims = [ngram_jaccard(a or "", b or "", shingle_k)
            for a, b in zip(cand["text_a"], cand["text_b"])]
    cand = cand.assign(jaccard=pd.Series(sims, index=cand.index,
                                         dtype="float64"))
    out = cand.loc[cand["jaccard"] >= threshold,
                   ["doc_a", "doc_b", "n_bands", "jaccard"]]
    return out.reset_index(drop=True)


def decontam_kernel(corp_rows: pd.DataFrame, ben_rows: pd.DataFrame,
                    corp_texts: pd.DataFrame, ben_texts: pd.DataFrame, *,
                    threshold: float, shingle_k: int) -> pd.DataFrame:
    """``minhash_decontam`` in one frame: corpus/benchmark band rows +
    texts -> [doc_id, n_bench_matches, max_jaccard_ppm] over corpus
    docs whose exact Jaccard vs ANY benchmark doc >= threshold."""
    import numpy as np

    from .dedup import ngram_jaccard

    empty = pd.DataFrame({
        "doc_id": pd.Series(dtype=corp_rows["doc_id"].dtype
                            if "doc_id" in corp_rows.columns else "int64"),
        "n_bench_matches": pd.Series(dtype="int64"),
        "max_jaccard_ppm": pd.Series(dtype="int64")})
    if "doc_id" not in corp_rows.columns \
            or "doc_id" not in ben_rows.columns:
        return empty
    corp = corp_rows[["doc_id", "band", "band_hash"]].drop_duplicates()
    ben = ben_rows[["doc_id", "band", "band_hash"]].drop_duplicates() \
        .rename(columns={"doc_id": "bench_id"})
    cand = corp.merge(ben, on=["band", "band_hash"])[
        ["doc_id", "bench_id"]].drop_duplicates()
    if not len(cand):
        return empty
    cand = cand.merge(
        corp_texts.rename(columns={"text": "text_c"}), on="doc_id")
    cand = cand.merge(
        ben_texts.rename(columns={"doc_id": "bench_id", "text": "text_b"}),
        on="bench_id")
    sims = np.array([ngram_jaccard(a or "", b or "", shingle_k)
                     for a, b in zip(cand["text_c"], cand["text_b"])],
                    dtype="float64")
    keep = sims >= threshold
    if not keep.any():
        return empty
    kept = pd.DataFrame({
        "doc_id": cand.loc[keep, "doc_id"].to_numpy(),
        "jaccard_ppm": np.floor(sims[keep] * 1e6).astype("int64")})
    out = kept.groupby("doc_id", as_index=False).agg(
        n_bench_matches=("jaccard_ppm", "size"),
        max_jaccard_ppm=("jaccard_ppm", "max"))
    out["n_bench_matches"] = out["n_bench_matches"].astype("int64")
    return out
