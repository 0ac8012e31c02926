"""Benchmark decontamination: tag corpus documents whose word n-grams
overlap a held-out evaluation set (the GPT-3 / The-Pile "13-gram
decontamination" step of a training-data pipeline).

Shape (ray_guide: broadcast small sides, never shuffle the corpus):

1. The benchmark side is SMALL by construction (eval sets are a few
   thousand documents even when the corpus is 100 TB).  Its distinct
   gram hashes are built distributed (map_batches → per-batch unique),
   reduced to one sorted uint64 array with a size guard, and shipped
   ONCE via ``ray.put``.
2. The corpus side is a single map-only pass: an actor pool fetches the
   broadcast array in ``__init__`` (once per actor, not per batch) and
   runs a vectorized ``np.searchsorted`` membership test per document
   over the same rolling-polynomial shingle hashes the MinHash path
   uses (stages/dedup.py:_shingle_hashes — one crc32 per token, numpy
   window combine; no per-gram string allocation).

No shuffle, no join, nothing corpus-sized crosses the network — the
100-TB cost is one broadcast object plus one streaming scan.  If an
eval set ever outgrew the broadcast guard, the fallback is the repo's
partitioned ``hash_join`` over exploded (doc_id, gram_hash) rows; not
implemented because a benchmark that large stops being a benchmark.

The md5 twin (:func:`decontaminate_md5`) trades the vectorized token
hash for md5-of-gram-string so a DuckDB oracle can replay every count
exactly (same convention as stages/text.py:winnow_profile and
simhash_md5_profile).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .dedup import _shingle_hashes

_DEFAULT_MAX_BENCH_GRAMS = 50_000_000      # ~400 MB of uint64 — node-safe


def _collect_bench_grams(bench_ds, n: int, text_col: str) -> np.ndarray:
    """Distinct rolling-crc shingle hashes of the benchmark set as one
    sorted uint64 array (uniqued per batch BEFORE the driver pull) —
    shared by the exact and bloom broadcast builders."""
    def grams(batch: pd.DataFrame) -> pd.DataFrame:
        # skip empty/whitespace-only benchmark docs: their sentinel
        # gram (hash of zero tokens) would tag EVERY empty corpus doc
        # as contaminated — pure noise
        parts = [_shingle_hashes(t, k=n) for t in batch[text_col]
                 if t and t.strip()]
        h = np.unique(np.concatenate(parts)) if parts else \
            np.array([], dtype=np.uint64)
        return pd.DataFrame({"gram": h})

    pulled = bench_ds.map_batches(grams, batch_format="pandas").to_pandas()
    return np.unique(pulled["gram"].to_numpy(dtype=np.uint64))


def benchmark_gram_ref(bench_ds, n: int = 5, text_col: str = "text",
                       max_grams: int = _DEFAULT_MAX_BENCH_GRAMS):
    """Distinct shingle hashes of the benchmark set → ``ray.put`` ref of
    one sorted uint64 array.

    The guard raises rather than silently truncating (the caller must
    shrink n or the eval set)."""
    import ray

    arr = _collect_bench_grams(bench_ds, n, text_col)
    if len(arr) > max_grams:
        raise ValueError(
            f"benchmark gram set ({len(arr)}) exceeds broadcast guard "
            f"({max_grams}); shrink the eval set or raise max_grams")
    from ..state.broadcast import pin_broadcast
    return pin_broadcast(arr)


class _Decontaminator:
    """Actor-pool stage: broadcast benchmark grams in, per-doc overlap
    counts out."""

    def __init__(self, bench_ref, n: int, id_col: str, text_col: str,
                 threshold: int):
        import ray
        self.bench = bench_ref if isinstance(bench_ref, np.ndarray) \
            else ray.get(bench_ref)          # once per actor
        self.n = n
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_grams = np.empty(len(batch), dtype=np.int64)
        n_hits = np.empty(len(batch), dtype=np.int64)
        for i, text in enumerate(batch[self.text_col]):
            if not text or not text.strip():
                # empty corpus doc: no grams, never contaminated (the
                # zero-token sentinel hash would otherwise collide with
                # any empty benchmark doc's)
                n_grams[i] = 0
                n_hits[i] = 0
                continue
            h = _shingle_hashes(text, k=self.n)           # unique, sorted-ish
            n_grams[i] = len(h)
            # sorted-array membership: searchsorted + equality probe
            pos = np.searchsorted(self.bench, h)
            pos = np.minimum(pos, len(self.bench) - 1) if len(self.bench) \
                else pos
            n_hits[i] = int(np.count_nonzero(
                self.bench[pos] == h)) if len(self.bench) else 0
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "n_grams": n_grams,
            "n_hit_grams": n_hits,
            "contaminated": (n_hits >= self.threshold).astype("int64"),
        })


def decontaminate(corpus_ds, bench_ref, n: int = 5, threshold: int = 1,
                  id_col: str = "doc_id", text_col: str = "text",
                  concurrency: int = 4):
    """Tag every corpus doc with its distinct-n-gram overlap against the
    broadcast benchmark gram set → (id, n_grams, n_hit_grams,
    contaminated)."""
    return corpus_ds.map_batches(
        _Decontaminator,
        fn_constructor_kwargs=dict(bench_ref=bench_ref, n=n, id_col=id_col,
                                   text_col=text_col, threshold=threshold),
        batch_format="pandas", concurrency=concurrency, num_cpus=0.5)


def drop_contaminated(corpus_ds, bench_ref, n: int = 5, threshold: int = 1,
                      id_col: str = "doc_id", text_col: str = "text",
                      concurrency: int = 4):
    """Filter variant: keep only clean docs (full rows), same single
    map-only pass."""

    class _Filter(_Decontaminator):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            tags = super().__call__(batch)
            return batch[(tags["n_hit_grams"] < self.threshold).to_numpy()]

    return corpus_ds.map_batches(
        _Filter,
        fn_constructor_kwargs=dict(bench_ref=bench_ref, n=n, id_col=id_col,
                                   text_col=text_col, threshold=threshold),
        batch_format="pandas", concurrency=concurrency, num_cpus=0.5)


# ------------------------------------------------------------ md5 twin --

def _md5_grams(text: str, n: int) -> list[str]:
    """md5 hex digests of space-joined lowered word n-grams; a document
    shorter than n tokens (but non-empty) contributes its whole text as
    one gram (the winnow_profile convention, so the SQL replay is
    shared); an empty/whitespace-only document contributes NO grams —
    md5("") as a gram would make any two empty docs "contaminate" each
    other, which is pure noise."""
    tokens = (text or "").lower().split()
    if not tokens:
        return []
    return [hashlib.md5(" ".join(tokens[i:i + n]).encode()).hexdigest()
            for i in range(max(1, len(tokens) - (n - 1)))]


def decontaminate_md5(corpus_ds, bench_hashes: frozenset, n: int = 3,
                      threshold: int = 1, id_col: str = "doc_id",
                      text_col: str = "text", concurrency: int = 4):
    """SQL-oracleable twin: md5-of-gram-string hashes, distinct-gram
    overlap counts → (id, n_grams, n_distinct_grams, n_hit_grams,
    contaminated).  ``bench_hashes`` is a frozenset of md5 hex digests
    (use :func:`benchmark_md5_hashes`)."""
    import ray
    from ..state.broadcast import pin_broadcast
    bench_ref = bench_hashes if isinstance(bench_hashes, ray.ObjectRef) \
        else pin_broadcast(bench_hashes)

    class _Md5Decon:
        def __init__(self):
            self.bench = ray.get(bench_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for doc_id, text in zip(batch[id_col], batch[text_col]):
                grams = _md5_grams(text, n)
                distinct = set(grams)
                hits = len(distinct & self.bench)
                rows.append((doc_id, len(grams), len(distinct), hits,
                             int(hits >= threshold)))
            return pd.DataFrame(rows, columns=[
                id_col, "n_grams", "n_distinct_grams", "n_hit_grams",
                "contaminated"]).astype({
                    "n_grams": "int64", "n_distinct_grams": "int64",
                    "n_hit_grams": "int64", "contaminated": "int64"})

    return corpus_ds.map_batches(
        _Md5Decon, batch_format="pandas", concurrency=concurrency,
        num_cpus=0.5)


def benchmark_md5_hashes(bench_ds, n: int = 3, text_col: str = "text",
                         max_grams: int = _DEFAULT_MAX_BENCH_GRAMS
                         ) -> frozenset:
    """Distinct md5 gram digests of the benchmark set (driver-side set
    behind the same size guard)."""
    def grams(batch: pd.DataFrame) -> pd.DataFrame:
        out = set()
        for t in batch[text_col]:
            out.update(_md5_grams(t, n))
        return pd.DataFrame({"gram": sorted(out)})

    pulled = bench_ds.map_batches(grams, batch_format="pandas").to_pandas()
    result = frozenset(pulled["gram"])
    if len(result) > max_grams:
        raise ValueError(
            f"benchmark gram set ({len(result)}) exceeds broadcast guard")
    return result


# ------------------------------------------------------------- bloom --

def benchmark_bloom_ref(bench_ds, n: int = 5, text_col: str = "text",
                        bits_log2: int = 24, k_hashes: int = 4,
                        grams: np.ndarray | None = None):
    """Bloom-filter form of the broadcast benchmark side: ``2**bits_log2``
    bits (2**24 = 2 MiB) instead of the sorted uint64 array (8 B/gram).

    This is the broadcast-budget knob for large eval sets: at 50M grams
    the sorted array is 400 MB per node; a 2**30-bit bloom is 128 MiB at
    ~3% false-positive rate with k=4.  False positives only ever
    OVER-flag (a clean document may be tagged contaminated) — the safe
    direction for decontamination — and never under-flag, so the bloom
    path's drop set is a superset of the exact path's (pinned by test).

    Probe positions by double hashing the same rolling-crc gram hashes
    the exact path uses: ``pos_j = (h + j * h2) mod m`` with
    ``h2 = h * 0x9E3779B97F4A7C15 | 1`` (odd, so all m positions are
    reachable).  Returns ``(ray.put(words), bits_log2, k_hashes)`` where
    ``words`` is the packed uint64 bitset.  Pass a precomputed gram
    array via ``grams`` to skip the benchmark scan (e.g. when the exact
    builder already ran).
    """
    import ray

    h = grams if grams is not None \
        else _collect_bench_grams(bench_ds, n, text_col)
    m = np.uint64(1 << bits_log2)
    words = np.zeros((1 << bits_log2) >> 6, dtype=np.uint64)
    h2 = h * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
    for j in range(k_hashes):
        pos = (h + np.uint64(j) * h2) % m
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    from ..state.broadcast import pin_broadcast
    return pin_broadcast(words), bits_log2, k_hashes


class _BloomDecontaminator:
    """Actor-pool stage: packed bloom bitset in (once per actor),
    per-doc bloom-positive gram counts out."""

    def __init__(self, bloom_ref, bits_log2: int, k_hashes: int, n: int,
                 id_col: str, text_col: str, threshold: int):
        import ray
        self.words = bloom_ref if isinstance(bloom_ref, np.ndarray) \
            else ray.get(bloom_ref)
        self.m = np.uint64(1 << bits_log2)
        self.k = k_hashes
        self.n = n
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold

    def _member(self, h: np.ndarray) -> np.ndarray:
        ok = np.ones(len(h), dtype=bool)
        h2 = h * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
        for j in range(self.k):
            pos = (h + np.uint64(j) * h2) % self.m
            bits = self.words[(pos >> np.uint64(6)).astype(np.int64)]
            ok &= (bits >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return ok

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_grams = np.empty(len(batch), dtype=np.int64)
        n_hits = np.empty(len(batch), dtype=np.int64)
        for i, text in enumerate(batch[self.text_col]):
            h = _shingle_hashes(text or "", k=self.n)
            n_grams[i] = len(h)
            n_hits[i] = int(np.count_nonzero(self._member(h))) if len(h) \
                else 0
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "n_grams": n_grams,
            "n_hit_grams": n_hits,
            "contaminated": (n_hits >= self.threshold).astype("int64"),
        })


def decontaminate_bloom(corpus_ds, bloom, n: int = 5, threshold: int = 1,
                        id_col: str = "doc_id", text_col: str = "text",
                        concurrency: int = 4):
    """Bloom-broadcast decontamination tagging: same single map-only
    corpus pass as :func:`decontaminate`, constant-size broadcast.
    ``bloom`` is the tuple from :func:`benchmark_bloom_ref`."""
    bloom_ref, bits_log2, k_hashes = bloom
    return corpus_ds.map_batches(
        _BloomDecontaminator,
        fn_constructor_kwargs=dict(bloom_ref=bloom_ref, bits_log2=bits_log2,
                                   k_hashes=k_hashes, n=n, id_col=id_col,
                                   text_col=text_col, threshold=threshold),
        batch_format="pandas", concurrency=concurrency, num_cpus=0.5)


def minhash_decontam(corpus_ds, benchmark_ds, *, threshold: float = 0.5,
                     num_perm: int = 128, bands: int = 32,
                     shingle_k: int = 3, concurrency: int = 4,
                     num_buckets: int | None = None,
                     text_col: str = "text", id_col: str = "doc_id",
                     bench_text_col: str | None = None,
                     bench_id_col: str | None = None,
                     small_corpus_max_docs: int | None = None):
    """FUZZY benchmark decontamination: corpus documents whose exact
    word-``shingle_k``-gram Jaccard against ANY benchmark document is
    ``>= threshold`` — the near-duplicate analogue of the exact-n-gram
    :func:`decontaminate` (a paraphrased or lightly-edited benchmark
    leak slips through exact grams but not through Jaccard).

    Output contract (what the SQL oracle replays exactly): one row per
    contaminated corpus doc — (doc_id, n_bench_matches,
    max_jaccard_ppm) where n_bench_matches counts benchmark docs at
    ``>= threshold`` and ppm = floor(jaccard * 1e6).  MinHash-LSH is
    candidate PRUNING only; every emitted value comes from the exact
    Jaccard verify (same contract as ``minhash_dedup_pairs_joined``).

    Scale shape (the 100-TB path, no broadcast anywhere): band rows of
    BOTH sides share one bucket-bounded grouped exchange keyed on the
    hash of the full (band, band_hash) pair (``_lsh_bucket``), the
    cross-side merge runs per bucket, candidate (doc, bench) pairs —
    a tiny fraction of the corpus — pick their texts back up via two
    partitioned hash joins, and the final per-doc reduction is a slim
    grouped Count/Max.  The benchmark side streams like the corpus; it
    never needs to fit one node.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    from .dedup import _lsh_bucket, band_rows_fn, ngram_jaccard
    from .joins import auto_buckets, estimate_rows, hash_join

    bench_text_col = bench_text_col or text_col
    bench_id_col = bench_id_col or id_col

    # small-input fast path (dedup_local docstring): band rows stay a
    # distributed map_batches; the 5 exchange-shaped stages collapse
    # into ONE task with identical semantics (byte-equality in tests)
    from .dedup_local import (
        SMALL_CORPUS_MAX_DOCS, decontam_kernel, solve_in_task_n,
    )
    if small_corpus_max_docs is None:
        small_corpus_max_docs = SMALL_CORPUS_MAX_DOCS
    est_c = estimate_rows(corpus_ds)
    est_b = estimate_rows(benchmark_ds)
    if small_corpus_max_docs and est_c is not None and est_b is not None \
            and est_c + est_b <= small_corpus_max_docs:
        mk = dict(num_perm=num_perm, bands=bands, shingle_k=shingle_k)
        corp_rows = corpus_ds.map_batches(
            band_rows_fn,
            fn_kwargs=dict(text_col=text_col, id_col=id_col, **mk),
            batch_format="pandas").materialize()
        ben_rows = benchmark_ds.map_batches(
            band_rows_fn,
            fn_kwargs=dict(text_col=bench_text_col, id_col=bench_id_col,
                           **mk),
            batch_format="pandas").materialize()

        def txt(idc, tc):
            def f(batch: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({"doc_id": batch[idc],
                                     "text": batch[tc]})
            return f

        corp_texts = corpus_ds.map_batches(
            txt(id_col, text_col), batch_format="pandas").materialize()
        ben_texts = benchmark_ds.map_batches(
            txt(bench_id_col, bench_text_col),
            batch_format="pandas").materialize()
        return solve_in_task_n(
            decontam_kernel, [corp_rows, ben_rows, corp_texts, ben_texts],
            threshold=threshold, shingle_k=shingle_k)

    if num_buckets is None:
        num_buckets = auto_buckets(corpus_ds, benchmark_ds,
                                   rows_per_bucket=1024, multiplier=bands,
                                   fallback=256, minimum=256)

    # task-based band rows on both sides (dedup.band_rows_fn has the
    # actor-pool cost rationale; ``concurrency`` kept for API compat)
    mk = dict(num_perm=num_perm, bands=bands, shingle_k=shingle_k)
    corp_rows = corpus_ds.map_batches(
        band_rows_fn,
        fn_kwargs=dict(text_col=text_col, id_col=id_col, **mk),
        batch_format="pandas")
    ben_rows = benchmark_ds.map_batches(
        band_rows_fn,
        fn_kwargs=dict(text_col=bench_text_col, id_col=bench_id_col, **mk),
        batch_format="pandas")

    def tag(side: int):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["_bucket"] = _lsh_bucket(batch["band"].to_numpy(),
                                           batch["band_hash"].to_numpy(),
                                           num_buckets)
            batch["_side"] = np.int8(side)
            return batch
        return f

    both = corp_rows.map_batches(tag(0), batch_format="pandas") \
        .union(ben_rows.map_batches(tag(1), batch_format="pandas"))

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        side = group["_side"].to_numpy()
        cols = ["doc_id", "band", "band_hash"]
        corp = group.loc[side == 0, cols].drop_duplicates()
        ben = group.loc[side == 1, cols].drop_duplicates() \
            .rename(columns={"doc_id": "bench_id"})
        joined = corp.merge(ben, on=["band", "band_hash"])
        return joined[["doc_id", "bench_id"]].drop_duplicates()

    pairs = both.groupby("_bucket").map_groups(
        bucket_pairs, batch_format="pandas").materialize()
    out_schema = ["doc_id", "n_bench_matches", "max_jaccard_ppm"]
    if pairs.count() == 0:
        return rd.from_pandas(pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in out_schema}))
    # dedup candidate pairs seen in several bands/buckets — one bucketed
    # fold (int hash of the pair key) instead of Ray's sort-based
    # groupby (~10x at this shape)
    from .joins import bucketed_fold

    def count_pair(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_id", "bench_id"], as_index=False,
                        sort=False).size().rename(columns={"size": "_nb"})
        out["_nb"] = out["_nb"].astype("int64")
        return out

    cand = bucketed_fold(pairs, ["doc_id", "bench_id"], count_pair,
                         num_buckets=min(num_buckets, 64)).materialize()

    def corp_text(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch[id_col],
                             "text_c": batch[text_col]})

    def ben_text(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bench_id": batch[bench_id_col],
                             "text_b": batch[bench_text_col]})

    with_c = hash_join(cand,
                       corpus_ds.map_batches(corp_text,
                                             batch_format="pandas"),
                       on="doc_id")
    with_b = hash_join(with_c,
                       benchmark_ds.map_batches(ben_text,
                                                batch_format="pandas"),
                       on="bench_id")

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        sims = np.array([ngram_jaccard(a or "", b or "", shingle_k)
                         for a, b in zip(batch["text_c"], batch["text_b"])],
                        dtype="float64")
        keep = sims >= threshold
        return pd.DataFrame({
            "doc_id": batch.loc[keep, "doc_id"].to_numpy(),
            "jaccard_ppm": np.floor(sims[keep] * 1e6).astype("int64"),
        })

    verified = with_b.map_batches(verify, batch_format="pandas")
    return verified.groupby("doc_id").aggregate(
        Count(alias_name="n_bench_matches"),
        Max("jaccard_ppm", alias_name="max_jaccard_ppm"))
