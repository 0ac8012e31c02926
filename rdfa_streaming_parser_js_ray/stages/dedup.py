"""Deduplication operators for large-scale training-data pipelines.

All four families as Ray Data compositions (ray_guide: Aggregation at
scale):

- exact:        vectorized content-hash per batch (combiner) → one
                hash-partitioned groupby → first-per-group.
- MinHash+LSH:  shingle → K minhashes (numpy-vectorized) → band rows →
                groupby(bucket of (band, band_hash)) → candidate pairs →
                Jaccard verify.
- SimHash:      64-bit weighted token fingerprint; near-dups = equal
                fingerprints on rotated bands (Hamming ≤ k by pigeonhole).
- n-gram Jaccard: exact verification kernel, also usable standalone.

Scale notes: every groupby here is keyed on a hash (uniform, no skew) with
group size bounded by num_buckets (never corpus-sized per group);
candidate verification has both shapes — broadcast doc-text lookup
(``minhash_dedup_pairs``) for corpora that fit a node, and partitioned
hash-join verification (``minhash_dedup_pairs_joined``) that never
materializes texts anywhere for corpora that don't.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------- exact --

def add_content_hash(ds, text_col: str = "text", out_col: str = "text_hash"):
    """Vectorized md5 content hash per batch (the dedup/bucketing key)."""
    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = [ _md5_hex(t or "") for t in batch[text_col] ]
        return batch
    return ds.map_batches(hash_batch, batch_format="pandas")


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the smallest id per distinct text.

    Returns (text_hash, doc_id, n_copies).  Hash-partition + per-group
    first (SURVEY.md §2.6): per-batch partial (min id, count) per hash,
    then a small global groupby over partials — the shuffle moves one row
    per distinct text per batch, not the corpus.
    """
    from ray.data.aggregate import Min, Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[id_col, text_col]].copy()
        batch["text_hash"] = [ _md5_hex(t or "") for t in batch[text_col] ]
        grouped = batch.groupby("text_hash", as_index=False).agg(
            **{id_col: (id_col, "min"), "n_copies": (id_col, "size")})
        return grouped[["text_hash", id_col, "n_copies"]]

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("text_hash").aggregate(
        Min(id_col, alias_name=id_col),
        Sum("n_copies", alias_name="n_copies"),
    )


def exact_dedup_rows(ds, text_col: str = "text", id_col: str = "doc_id",
                     num_buckets: int | None = None):
    """Emit the surviving full rows (smallest id per distinct text) — the
    deduped corpus itself, which is what a training pipeline writes out.

    Per-batch combiner keeps one candidate row per (hash) per batch, then
    ONE hash-bucketed groupby picks the global winner per hash with a
    vectorized sort + drop_duplicates per bucket (uniform buckets — the
    key is a hash).  ``num_buckets=None`` → size-derived via
    ``auto_buckets`` (fallback 256).
    """
    if num_buckets is None:
        from .joins import auto_buckets
        num_buckets = auto_buckets(ds, rows_per_bucket=65_536,
                                   fallback=256, minimum=256)
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_h"] = [_md5_hex(t or "") for t in batch[text_col]]
        batch = batch.sort_values(id_col).drop_duplicates("_h", keep="first")
        # vectorized bucket from the content hash (any deterministic
        # function of _h co-locates equal texts)
        batch["_bucket"] = (pd.util.hash_array(batch["_h"].to_numpy(object))
                            % np.uint64(num_buckets)).astype("int32")
        return batch

    def bucket_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col) \
                    .drop_duplicates("_h", keep="first") \
                    .drop(columns=["_h", "_bucket"])

    return ds.map_batches(partial, batch_format="pandas") \
             .groupby("_bucket").map_groups(bucket_first, batch_format="pandas")


# ------------------------------------------------------------- shingles --

_TOK_MIX = np.uint64(0x100000001B3)          # FNV-ish odd multiplier


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-word shingles → unique sorted uint64 hash array, vectorized.

    One crc32 per TOKEN (not per shingle string), then a numpy rolling
    polynomial combine over each k-window — no per-shingle ``" ".join``
    allocations; identical token sequences hash identically, so set
    Jaccard over these hashes is k-gram Jaccard (up to hash collisions,
    as before).  Deterministic.
    """
    tokens = text.lower().split()
    n = len(tokens)
    if n == 0:
        return np.array([np.uint64(0)], dtype=np.uint64)
    tok = np.fromiter(
        (zlib.crc32(t.encode()) for t in tokens), dtype=np.uint64, count=n)
    tok = (tok << np.uint64(32)) | (tok * _TOK_MIX >> np.uint64(32))
    if n < k:
        k = n
    m = n - k + 1
    acc = tok[0:m].copy()
    for j in range(1, k):                    # k-1 vectorized passes
        acc = acc * _TOK_MIX ^ tok[j:j + m]
    # Jaccard is set-valued: duplicate shingles never change a min, so
    # uniquing up front shrinks the minhash matrix for free
    return np.unique(acc)


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity."""
    a = set(_shingle_hashes(text_a, k).tolist())
    b = set(_shingle_hashes(text_b, k).tolist())
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# -------------------------------------------------------------- minhash --

class MinHasher:
    """Actor-pool stage: text → K minhash values → LSH band rows.

    Hash parameters are built once per actor (``__init__``); per-batch work
    is numpy over the shingle-hash arrays.  Output: one row per (doc, band):
    (doc_id, band, band_hash) — ``groupby(["band","band_hash"])`` downstream
    buckets near-duplicate candidates without comparing all pairs.
    """

    def __init__(self, num_perm: int = 128, bands: int = 32, shingle_k: int = 3,
                 seed: int = 42, text_col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.shingle_k)
        # (a*h + b) in uint64 wraparound arithmetic, then mod p — a
        # multiply-shift-style universal hash family (the 2^64 wrap is
        # deliberate; exact mod-p permutations aren't required for
        # min-wise estimation, deterministic uniformity is), row-wise min
        # vectorized over shingles × perms
        prod = (self.a[:, None] * (h[None, :] % _MERSENNE) + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame({"doc_id": [], "band": [], "band_hash": []})
        # (n, bands, rows_per_band) signature cube, folded to one digest
        # per (doc, band) with a vectorized polynomial combine — no
        # per-doc/per-band Python loop or crc32 call
        sigs = np.stack([self.signature(t or "")
                         for t in batch[self.text_col]])
        cube = sigs.reshape(n, self.bands, self.rows_per_band)
        acc = cube[:, :, 0].copy()
        for j in range(1, self.rows_per_band):
            acc = acc * _TOK_MIX ^ cube[:, :, j]
        return pd.DataFrame({
            "doc_id": np.repeat(batch[self.id_col].to_numpy(), self.bands),
            "band": np.tile(np.arange(self.bands, dtype=np.int64), n),
            "band_hash": acc.reshape(-1),
        })


_HASHER_CACHE: dict[tuple, "MinHasher"] = {}


def band_rows_fn(batch: pd.DataFrame, *, num_perm: int = 128,
                 bands: int = 32, shingle_k: int = 3, seed: int = 42,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> pd.DataFrame:
    """Task-side MinHasher: documents → LSH band rows as a STATELESS
    ``map_batches`` function with a per-worker-process parameter cache.

    The hasher's "state" is a microsecond numpy parameter draw — an
    actor pool's per-pipeline spin-up/teardown costs far more than the
    state is worth (measured ~1-2 s per query in the 80-query gate).
    Ray worker processes persist across pipelines in a session, so the
    module cache amortizes exactly like an actor's ``__init__`` while
    the stage stays elastic (no fixed pool size)."""
    key = (num_perm, bands, shingle_k, seed, text_col, id_col)
    h = _HASHER_CACHE.get(key)
    if h is None:
        h = _HASHER_CACHE[key] = MinHasher(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            seed=seed, text_col=text_col, id_col=id_col)
    return h(batch)


_BUCKET_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_BUCKET_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)


def _lsh_bucket(band: np.ndarray, band_key: np.ndarray,
                num_buckets: int) -> np.ndarray:
    """Uniform bucket id for (band, key) LSH rows — the groupby key.

    Grouping on the *bucket of the full (band, key) pair* keeps every
    co-candidate set intact inside one group while bounding the group size
    at ~corpus×bands/num_buckets rows, instead of corpus rows per band
    (the round-1 scale-killer: ``groupby("band")`` has only `bands`
    distinct keys, so one worker had to hold corpus/1 rows per band)."""
    h = (band.astype(np.uint64) * _BUCKET_MIX_A
         ^ band_key.astype(np.uint64) * _BUCKET_MIX_B)
    # xorshift-mix so low bits depend on high bits before the modulo
    h ^= h >> np.uint64(29)
    h *= _BUCKET_MIX_B
    h ^= h >> np.uint64(32)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def minhash_lsh_candidates(ds, num_perm: int = 128, bands: int = 32,
                           shingle_k: int = 3, concurrency: int = 4,
                           text_col: str = "text", id_col: str = "doc_id",
                           num_buckets: int | None = None,
                           small_corpus_max_docs: int | None = None):
    """documents → candidate near-dup pairs (doc_a < doc_b, n_bands agreeing).

    Candidate generation groups on a hash bucket of the full
    ``(band, band_hash)`` pair (`num_buckets` groups, uniform), so the
    per-group working set is bucket-bounded at ~corpus×bands/num_buckets
    rows.  ``num_buckets=None`` derives the count from the corpus size
    (×``bands`` fan-out, ~1k band rows per bucket) via ``auto_buckets``,
    so a 10× corpus gets ~10× buckets and the per-group bound holds
    without retuning; the fallback when the input size is not free to
    know is 256.
    """
    # task-based band rows (band_rows_fn docstring has the actor-pool
    # cost rationale); ``concurrency`` is retained in the signature for
    # API compatibility but no longer pins a pool size
    band_rows = ds.map_batches(
        band_rows_fn,
        fn_kwargs=dict(num_perm=num_perm, bands=bands,
                       shingle_k=shingle_k, text_col=text_col,
                       id_col=id_col),
        batch_format="pandas")

    # small-input fast path (dedup_local docstring): band rows stay the
    # distributed map_batches above; the bucket groupby + pair fold
    # collapse into ONE task with identical semantics
    from .dedup_local import (
        SMALL_CORPUS_MAX_DOCS, candidate_pairs_kernel, solve_in_task_n,
    )
    from .joins import estimate_rows
    if small_corpus_max_docs is None:
        small_corpus_max_docs = SMALL_CORPUS_MAX_DOCS
    est = estimate_rows(ds)
    if small_corpus_max_docs and est is not None \
            and est <= small_corpus_max_docs:
        return solve_in_task_n(candidate_pairs_kernel,
                               [band_rows.materialize()]).materialize()

    if num_buckets is None:
        from .joins import auto_buckets
        num_buckets = auto_buckets(ds, rows_per_bucket=1024,
                                   multiplier=bands, fallback=256,
                                   minimum=256)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_bucket"] = _lsh_bucket(batch["band"].to_numpy(),
                                       batch["band_hash"].to_numpy(),
                                       num_buckets)
        return batch

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # vectorized self-join on (band, band_hash) within one bucket —
        # one pandas merge per bucket; all rows sharing a (band, hash)
        # co-candidate set are co-located by construction of _bucket
        g = group[["doc_id", "band", "band_hash"]].drop_duplicates()
        joined = g.merge(g, on=["band", "band_hash"], suffixes=("_a", "_b"))
        joined = joined[joined["doc_id_a"] < joined["doc_id_b"]]
        return pd.DataFrame({"doc_a": joined["doc_id_a"],
                             "doc_b": joined["doc_id_b"]})

    # materialize before the empty-guard count: counting a lazy Dataset
    # executes the whole lineage, and the aggregate below would then
    # recompute it from scratch (double work)
    pairs = band_rows.map_batches(add_bucket, batch_format="pandas") \
                     .groupby("_bucket").map_groups(
        bucket_pairs, batch_format="pandas").materialize()
    if pairs.count() == 0:
        return pairs
    # de-duplicate pairs found in multiple bands, counting agreements —
    # a bucketed fold (int hash of the pair key), not Ray's sort-based
    # groupby, whose cross-block key sort costs ~10x at this shape;
    # materialized because every consumer both guards on count() and
    # reads the rows (candidate sets are tiny relative to the corpus)
    from .joins import bucketed_fold

    def count_bands(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_a", "doc_b"], as_index=False, sort=False) \
               .size().rename(columns={"size": "n_bands"})
        out["n_bands"] = out["n_bands"].astype("int64")
        return out

    return bucketed_fold(pairs, ["doc_a", "doc_b"], count_bands,
                         num_buckets=min(num_buckets, 64)).materialize()


class JaccardVerifier:
    """Verify candidate pairs with exact shingle Jaccard.

    ``texts_ref``: broadcast {doc_id → text} (``ray.put`` once).  At corpus
    sizes beyond node memory, replace with a bucket join: hash-partition
    both pairs and texts on doc_id and verify per bucket.
    """

    def __init__(self, texts_ref, shingle_k: int = 3, threshold: float = 0.8):
        import ray
        self.texts = ray.get(texts_ref) if not isinstance(texts_ref, dict) else texts_ref
        self.k = shingle_k
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sims = [ngram_jaccard(self.texts.get(a, ""), self.texts.get(b, ""), self.k)
                for a, b in zip(batch["doc_a"], batch["doc_b"])]
        batch = batch.assign(jaccard=sims)
        return batch[batch["jaccard"] >= self.threshold]


def minhash_dedup_pairs(ds, texts_ref, threshold: float = 0.8, **kwargs):
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold.

    Broadcast-verify variant: ``texts_ref`` is a ``ray.put`` {doc_id→text}
    map fetched once per verifier actor.  Right when the text corpus fits a
    node; for corpora beyond node memory use
    :func:`minhash_dedup_pairs_joined` (no broadcast, no driver
    materialization).
    """
    candidates = minhash_lsh_candidates(ds, **kwargs)
    if candidates.count() == 0:
        return candidates
    return candidates.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs=dict(texts_ref=texts_ref,
                                   shingle_k=kwargs.get("shingle_k", 3),
                                   threshold=threshold),
        batch_format="pandas", concurrency=2, num_cpus=0.5)


def minhash_dedup_pairs_joined(ds, threshold: float = 0.8,
                               num_buckets: int | None = None,
                               text_col: str = "text", id_col: str = "doc_id",
                               small_corpus_max_docs: int | None = None,
                               **kwargs):
    """Near-dup pipeline with *joined* verification — the 100-TB path.

    Candidate (doc_a, doc_b) pairs get their texts attached via two
    partitioned hash joins against the documents dataset (each one
    all-to-all exchange over the pair/text buckets; candidate pairs are a
    tiny fraction of the corpus, texts stream through), then exact shingle
    Jaccard is computed per pair.  Nothing is materialized on the driver
    and no node ever holds the whole corpus.

    ``small_corpus_max_docs`` (default ``dedup_local.SMALL_CORPUS_MAX_
    DOCS``; 0 disables): when the metadata-cheap row estimate is at or
    under the bound, band-row generation stays a distributed
    ``map_batches`` but the 4-5 exchange-shaped stages (bucket groupby,
    pair fold, two text joins, verify) collapse into ONE Ray task with
    identical semantics (byte-equality pinned by tests) — the exchange
    fixed costs dominate a hundred-fold at that size.
    """
    from .joins import estimate_rows, hash_join

    from .dedup_local import (
        SMALL_CORPUS_MAX_DOCS, pairs_verify_kernel, solve_in_task_n,
    )
    if small_corpus_max_docs is None:
        small_corpus_max_docs = SMALL_CORPUS_MAX_DOCS
    est = estimate_rows(ds)
    shingle_k = kwargs.get("shingle_k", 3)
    if small_corpus_max_docs and est is not None \
            and est <= small_corpus_max_docs:
        mk = dict(num_perm=kwargs.get("num_perm", 128),
                  bands=kwargs.get("bands", 32), shingle_k=shingle_k,
                  text_col=text_col, id_col=id_col)
        band_rows = ds.map_batches(band_rows_fn, fn_kwargs=mk,
                                   batch_format="pandas").materialize()

        def txt(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"doc_id": batch[id_col],
                                 "text": batch[text_col]})

        texts = ds.map_batches(txt, batch_format="pandas").materialize()
        return solve_in_task_n(pairs_verify_kernel, [band_rows, texts],
                               threshold=threshold, shingle_k=shingle_k)

    candidates = minhash_lsh_candidates(
        ds, text_col=text_col, id_col=id_col,
        small_corpus_max_docs=small_corpus_max_docs, **kwargs)
    if candidates.count() == 0:
        return candidates

    def project(side: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({f"doc_{side}": batch[id_col],
                                 f"text_{side}": batch[text_col]})
        return f

    texts_a = ds.map_batches(project("a"), batch_format="pandas")
    texts_b = ds.map_batches(project("b"), batch_format="pandas")
    with_a = hash_join(candidates, texts_a, on="doc_a",
                       num_buckets=num_buckets)
    with_b = hash_join(with_a, texts_b, on="doc_b", num_buckets=num_buckets)

    k = kwargs.get("shingle_k", 3)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        sims = [ngram_jaccard(a or "", b or "", k)
                for a, b in zip(batch["text_a"], batch["text_b"])]
        batch = batch.assign(jaccard=sims)
        return batch.loc[batch["jaccard"] >= threshold,
                         ["doc_a", "doc_b", "n_bands", "jaccard"]]

    return with_b.map_batches(verify, batch_format="pandas")


# -------------------------------------------------------------- simhash --

def simhash_md5_profile(ds, text_col: str = "text", id_col: str = "doc_id"):
    """SQL-replayable SimHash twin: the same frequency-weighted
    bit-majority kernel as :class:`SimHasher` but with md5-low-64 token
    hashes (DuckDB's ``md5_number`` is the little-endian digest integer,
    matching ``int.from_bytes(md5(t).digest(), 'little')``), so an
    oracle can replay the simhash MACHINERY the way ``winnow_profile``
    replays the winnowing machinery.  Bit convention: bit i of the
    result is 1 iff sum over tokens of weight·(2·bit_i(h)−1) > 0.
    The production :class:`SimHasher` keeps its faster crc32 family.
    """
    import hashlib
    import re as _re

    word = _re.compile(r"\S+")
    mask = (1 << 64) - 1
    shifts = np.arange(64, dtype=np.uint64)

    def prof(batch: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(batch), dtype=np.uint64)
        for i, text in enumerate(batch[text_col]):
            tokens = word.findall((text or "").lower())
            if not tokens:
                continue
            counts: dict[str, int] = {}
            for t in tokens:
                counts[t] = counts.get(t, 0) + 1
            hashes = np.fromiter(
                (int.from_bytes(hashlib.md5(t.encode()).digest(),
                                "little") & mask for t in counts),
                dtype=np.uint64, count=len(counts))
            weights = np.fromiter(counts.values(), dtype=np.int64,
                                  count=len(counts))
            bits = ((hashes[:, None] >> shifts[None, :])
                    & np.uint64(1)).astype(np.int64)
            acc = ((2 * bits - 1) * weights[:, None]).sum(axis=0)
            out[i] = ((acc > 0).astype(np.uint64) << shifts).sum(
                dtype=np.uint64)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "simhash_md5": out})

    return ds.map_batches(prof, batch_format="pandas")


class SimHasher:
    """64-bit SimHash per document (frequency-weighted token hashes)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash64(text: str) -> int:
        tokens = (text or "").lower().split()
        if not tokens:
            return 0
        from collections import Counter
        counts = Counter(tokens)
        hashes = np.empty(len(counts), dtype=np.uint64)
        weights = np.empty(len(counts), dtype=np.int64)
        for i, (token, count) in enumerate(counts.items()):
            b = token.encode()
            hashes[i] = (zlib.crc32(b) << 32) | zlib.crc32(b, 0xBEEF)
            weights[i] = count
        # one vectorized (n_tokens, 64) bit expansion + weighted column sum
        bits = np.unpackbits(hashes.view(np.uint8)).reshape(-1, 64)
        acc = ((bits.astype(np.int64) * 2 - 1) * weights[:, None]).sum(axis=0)
        return int(np.packbits(acc > 0).view(">u8")[0])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "simhash": [self.simhash64(t) for t in batch[self.text_col]],
        })


def simhash_documents(ds, concurrency: int = 4, num_cpus: float = 0.5, **kwargs):
    return ds.map_batches(SimHasher, fn_constructor_kwargs=kwargs,
                          batch_format="pandas", concurrency=concurrency,
                          num_cpus=num_cpus)


def simhash_near_dup_pairs(ds, hamming_k: int = 3, concurrency: int = 4,
                           num_buckets: int | None = None):
    """Near-dup pairs with Hamming distance ≤ k via the pigeonhole trick:
    split 64 bits into k+1 bands; any pair within k differing bits agrees
    exactly on ≥1 band.  Candidates are grouped on a hash bucket of the
    full ``(band, band_bits)`` pair (`num_buckets` uniform groups — group
    size is bucket-bounded, not corpus-bounded; ``None`` → size-derived
    via ``auto_buckets`` at ~1k band rows per bucket, fallback 256)."""
    if num_buckets is None:
        from .joins import auto_buckets
        num_buckets = auto_buckets(ds, rows_per_bucket=1024,
                                   multiplier=hamming_k + 1, fallback=256,
                                   minimum=256)
    sigs = simhash_documents(ds, concurrency=concurrency, num_cpus=0.5)
    n_bands = hamming_k + 1
    width = 64 // n_bands

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized (doc × band) expansion: repeat/tile + shift/mask
        sig = batch["simhash"].to_numpy(dtype=np.uint64)
        band = np.tile(np.arange(n_bands, dtype=np.int64), len(sig))
        sig_rep = np.repeat(sig, n_bands)
        bits = (sig_rep >> (band * width).astype(np.uint64)) \
            & np.uint64((1 << width) - 1)
        return pd.DataFrame({
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), n_bands),
            "band": band,
            "band_bits": bits,
            "simhash": sig_rep,
            "_bucket": _lsh_bucket(band, bits, num_buckets),
        })

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # vectorized self-join on (band, band_bits) within one bucket,
        # then a vectorized popcount over the xor of the full signatures
        g = group[["doc_id", "band", "band_bits", "simhash"]] \
            .drop_duplicates(["doc_id", "band"])
        joined = g.merge(g, on=["band", "band_bits"], suffixes=("_a", "_b"))
        joined = joined[joined["doc_id_a"] < joined["doc_id_b"]]
        if joined.empty:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        x = joined["simhash_a"].to_numpy(dtype=np.uint64) ^ \
            joined["simhash_b"].to_numpy(dtype=np.uint64)
        ham = np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1)
        joined = joined.assign(hamming=ham)[ham <= hamming_k]
        return pd.DataFrame({"doc_a": joined["doc_id_a"],
                             "doc_b": joined["doc_id_b"],
                             "hamming": joined["hamming"]})

    pairs = sigs.map_batches(to_bands, batch_format="pandas") \
                .groupby("_bucket") \
                .map_groups(bucket_pairs, batch_format="pandas") \
                .materialize()
    if pairs.count() == 0:
        return pairs

    from ray.data.aggregate import Min
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))
