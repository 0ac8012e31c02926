"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (the small side ships once via ``ray.put``), then a
global top-k merge.  Scale path: LSH (random-hyperplane) bucketing so each
query only scans its probe buckets, plus an embedding-cosine near-dup
operator built on the same buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _to_matrix(column) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float32) for v in column])


def _keep_in_set(col: str, wanted) -> "callable":
    """Vectorized membership filter for ``map_batches`` (``np.isin`` mask)
    — replaces per-row ``ds.filter(lambda row: ...)`` on the hot path."""
    w = np.asarray(sorted(wanted), dtype=np.int64)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[np.isin(batch[col].to_numpy(dtype=np.int64), w)]
    return f


def _local_topk(col: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k best rows by (score DESC, id ASC) — TIE-STABLE.

    An ``argpartition`` prefilter is not: when ties straddle the local
    k boundary it keeps an arbitrary subset, so the global merge (which
    does tie-break correctly) never sees the lower-id tied candidate —
    caught by the randomized oracle differential with planted duplicate
    and zero-norm vectors (all-equal score columns).  A full lexsort per
    query column is O(n log n) against the O(n·d) score computation that
    produced it, so the combiner stays matmul-dominated.
    """
    order = np.lexsort((ids, -col))
    return order if k >= len(ids) else order[:k]


class BruteForceScorer:
    """Per-batch cosine scores vs the broadcast query matrix; emits each
    batch's local top-k per query (the combiner) — the global merge only
    sees n_batches × k × n_queries rows."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, (np.ndarray, list)) \
            else queries_ref
        self.q = np.asarray(q, dtype=np.float32)
        self.qnorm = self.q / np.maximum(np.linalg.norm(self.q, axis=1, keepdims=True), 1e-30)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _to_matrix(batch[self.vec_col])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        scores = mat @ self.qnorm.T                      # (rows, n_queries)
        ids = np.asarray(batch[self.id_col])
        out = {"qid": [], self.id_col: [], "score": []}
        k = min(self.k, len(ids))
        id_key = np.asarray(ids, dtype=np.int64)
        for qid in range(scores.shape[1]):
            col = scores[:, qid]
            for i in _local_topk(col, id_key, k):
                out["qid"].append(qid)
                out[self.id_col].append(ids[i])
                out["score"].append(float(col[i]))
        return pd.DataFrame(out)


def brute_force_topk(ds, queries_ref, k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding", concurrency: int = 4):
    """Exact cosine top-k for each query row in the broadcast matrix.

    Returns (qid, vec_id, score) with exactly k rows per query, ties broken
    by ascending id (deterministic).
    """
    local = ds.map_batches(
        BruteForceScorer,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k,
                                   id_col=id_col, vec_col=vec_col),
        batch_format="pandas", concurrency=concurrency, num_cpus=0.5)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["score", id_col], ascending=[False, True]).head(k)

    return local.groupby("qid").map_groups(merge, batch_format="pandas")


def knn_graph(ds, k: int = 5, id_col: str = "vec_id",
              vec_col: str = "embedding", concurrency: int = 4,
              max_rows: int = 1_000_000):
    """Exact cosine k-NN graph: every vector's top-k neighbors, self
    excluded — the eval-scale exact variant behind dedup-graph /
    diversity-sampling pipelines.

    Shape: the corpus is pinned ONCE in the object store and its
    per-block refs (never the data) go to the scoring actors, each of
    which concatenates the query matrix actor-side in ``__init__`` —
    the driver holds only ObjectRefs, nothing materializes driver-side.
    The same dataset then streams through as the data side; per-batch
    blocked float64 matmul + local top-k combiner, then a per-query
    merge.  The exact variant is O(n²) scoring and needs the whole
    matrix per actor, so it is eval-scale BY CONTRACT: ``max_rows``
    (default 1M ≈ 1 GB float32 at d=128) is ENFORCED with a raise —
    past it, use :func:`lsh_bucketed_topk` / :func:`ivf_topk` over the
    same column.  float64 scoring keeps rank boundaries stable against
    an oracle computing cosine in double precision.
    Returns (src_id, rank, dst_id) with exactly k rows per vector.
    """
    import ray

    from ..state.broadcast import pin_refs

    slim = ds.select_columns([id_col, vec_col]).materialize()
    n_rows = slim.count()
    if n_rows > max_rows:
        raise ValueError(
            f"knn_graph is the exact eval-scale variant: input has "
            f"{n_rows} vectors > max_rows={max_rows}; use "
            f"lsh_bucketed_topk or ivf_topk for corpora this size "
            f"(or raise max_rows explicitly if the nodes can hold "
            f"the full matrix per scoring actor)")
    block_refs = slim.to_pandas_refs()
    # pinned (slot-replaced per call: corpus-sized, a long-lived driver
    # must not grow by ~1 GB per knn_graph call): these refs ride in
    # actor constructor kwargs, the ray#53727 restart window
    # pin_broadcast documents (state/broadcast.py)
    pin_refs(block_refs, slot="knn_graph_corpus")
    # the pandas blocks are now the ONLY corpus copy: drop the Arrow
    # materialization and stream the data side from the same refs
    del slim
    data = ray.data.from_pandas_refs(list(block_refs))

    class GraphScorer:
        def __init__(self, block_refs, k):
            blocks = [b for b in ray.get(list(block_refs)) if len(b)]
            ids = np.concatenate(
                [np.asarray(b[id_col], dtype=np.int64) for b in blocks]) \
                if blocks else np.empty(0, dtype=np.int64)
            mats = [_to_matrix(b[vec_col]).astype(np.float64)
                    for b in blocks]
            order = np.argsort(ids)
            self.qids = ids[order]
            qmat = np.concatenate(mats)[order] if mats else \
                np.empty((0, 0), dtype=np.float64)
            self.qnorm = qmat / np.maximum(
                np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30) \
                if len(qmat) else qmat
            self.k = k

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = _to_matrix(batch[vec_col]).astype(np.float64)
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            scores = mat @ self.qnorm.T              # (rows, n_vectors)
            ids = np.asarray(batch[id_col], dtype=np.int64)
            scores[ids[:, None] == self.qids[None, :]] = -np.inf  # no self
            out = {"src_id": [], "dst_id": [], "score": []}
            k = min(self.k, scores.shape[0])
            for q in range(scores.shape[1]):
                col = scores[:, q]
                for i in _local_topk(col, ids, k):
                    if np.isinf(col[i]):
                        continue
                    out["src_id"].append(self.qids[q])
                    out["dst_id"].append(ids[i])
                    out["score"].append(float(col[i]))
            return pd.DataFrame(out)

    local = data.map_batches(
        GraphScorer, fn_constructor_kwargs=dict(block_refs=block_refs, k=k),
        batch_format="pandas", concurrency=concurrency, num_cpus=0.5)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "dst_id"],
                              ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["src_id", "rank", "dst_id"]]

    return local.groupby("src_id").map_groups(merge, batch_format="pandas")


class LshBucketer:
    """Random-hyperplane LSH: n_bits sign bits → bucket id per vector.

    The scale path for ANN: co-bucket vectors once (shuffle keyed on a
    uniform hash), then answer queries by scanning only matching buckets.
    """

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 42,
                 vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_bits)).astype(np.float32)
        self.vec_col = vec_col
        self._weights = (1 << np.arange(n_bits)).astype(np.int64)

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes) > 0
        return signs @ self._weights

    def probe_buckets(self, mat: np.ndarray, n_probes: int) -> np.ndarray:
        """Multi-probe bucket ids per row: the home bucket plus the
        buckets reached by flipping the lowest-|margin| hyperplane bits
        one at a time — the standard multi-probe LSH extension (a point
        near a hyperplane is likely hashed across it).  Returns
        (rows, n_probes) int64."""
        scores = mat @ self.planes                       # (rows, n_bits)
        home = ((scores > 0) @ self._weights)[:, None]   # (rows, 1)
        order = np.argsort(np.abs(scores), axis=1)       # ascending margin
        extra = min(max(n_probes - 1, 0), self.planes.shape[1])
        flips = home ^ self._weights[order[:, :extra]]   # (rows, extra)
        return np.concatenate([home, flips], axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _to_matrix(batch[self.vec_col])
        batch = batch.assign(bucket=self.bucket_of(mat))
        return batch


def lsh_bucketed_topk(ds, query_vecs: np.ndarray, dim: int, k: int = 10,
                      n_bits: int = 8, seed: int = 42, id_col: str = "vec_id",
                      vec_col: str = "embedding", concurrency: int = 4,
                      n_probes: int = 1):
    """ANN top-k scanning only the query's probe buckets (approximate).

    ``n_probes=1`` scans each query's home bucket; higher values add the
    buckets across the query's lowest-margin hyperplanes (multi-probe
    LSH), trading scan cost for recall without re-bucketing the corpus.
    """
    import ray

    bucketer = LshBucketer(dim=dim, n_bits=n_bits, seed=seed, vec_col=vec_col)
    q = np.asarray(query_vecs, dtype=np.float32)
    q_buckets = bucketer.probe_buckets(q, n_probes)      # (n_q, n_probes)
    wanted = set(int(b) for b in q_buckets.ravel())

    bucketed = ds.map_batches(bucketer, batch_format="pandas",
                              concurrency=concurrency, num_cpus=0.5)
    candidates = bucketed.map_batches(_keep_in_set("bucket", wanted),
                                      batch_format="pandas")

    # per-bucket queries only (a query probes all its buckets)
    by_bucket: dict[int, list[int]] = {}
    for qid, row in enumerate(q_buckets):
        for b in dict.fromkeys(int(x) for x in row):
            by_bucket.setdefault(b, []).append(qid)

    from ..state.broadcast import pin_broadcast
    queries_ref = pin_broadcast(q)

    class BucketScorer(BruteForceScorer):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for bucket, grp in batch.groupby("bucket"):
                qids = by_bucket.get(int(bucket))
                if not qids:
                    continue
                scored = BruteForceScorer.__call__(self, grp)
                scored = scored[scored["qid"].isin(qids)]
                outs.append(scored)
            if not outs:
                return pd.DataFrame({"qid": [], id_col: [], "score": []})
            return pd.concat(outs, ignore_index=True)

    local = candidates.map_batches(
        BucketScorer,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k,
                                   id_col=id_col, vec_col=vec_col),
        batch_format="pandas", concurrency=concurrency, num_cpus=0.5)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["score", id_col], ascending=[False, True]).head(k)

    return local.groupby("qid").map_groups(merge, batch_format="pandas")


def build_ivf_centroids(ds, n_centroids: int = 64, sample_size: int = 4096,
                        iters: int = 10, seed: int = 42,
                        vec_col: str = "embedding") -> np.ndarray:
    """Coarse quantizer for IVF: seeded mini k-means over a bounded sample.

    Only ``sample_size`` rows ever reach the driver (the index itself is
    never materialized); spherical k-means (normalized centroids) because
    queries score by cosine.  Deterministic given seed.
    """
    sample = _to_matrix([r[vec_col] for r in ds.limit(sample_size).take(sample_size)])
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)),
                              replace=False)]
    for _ in range(iters):
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / max(float(np.linalg.norm(v)), 1e-30)
    return cents


class IvfAssigner:
    """Assign each vector to its nearest coarse centroid (broadcast once)."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        import ray
        cents = ray.get(centroids_ref) \
            if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.cents = np.asarray(cents, dtype=np.float32)
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _to_matrix(batch[self.vec_col])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        return batch.assign(cluster=(mat @ self.cents.T).argmax(axis=1))


def ivf_topk(ds, query_vecs: np.ndarray, k: int = 10, n_centroids: int = 64,
             nprobe: int = 4, sample_size: int = 4096, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             concurrency: int = 4):
    """IVF approximate top-k: scan only each query's ``nprobe`` nearest
    coarse clusters (the standard inverted-file scale path; recall rises
    with nprobe, cost with nprobe/n_centroids).

    One map to assign clusters (centroids broadcast), a filter to the
    probed clusters, per-cluster vectorized scoring, one small top-k merge
    — no all-to-all over the corpus.
    """
    import ray

    from ..state.broadcast import pin_broadcast

    cents = build_ivf_centroids(ds, n_centroids=n_centroids,
                                sample_size=sample_size, seed=seed,
                                vec_col=vec_col)
    q = np.asarray(query_vecs, dtype=np.float32)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]

    by_cluster: dict[int, list[int]] = {}
    for qid, clusters in enumerate(probe):
        for c in clusters:
            by_cluster.setdefault(int(c), []).append(qid)
    wanted = set(by_cluster)

    assigned = ds.map_batches(
        IvfAssigner, fn_constructor_kwargs=dict(centroids_ref=pin_broadcast(cents),
                                                vec_col=vec_col),
        batch_format="pandas", concurrency=(1, concurrency), num_cpus=0.5)
    candidates = assigned.map_batches(_keep_in_set("cluster", wanted),
                                      batch_format="pandas")

    queries_ref = pin_broadcast(q)

    class ClusterScorer(BruteForceScorer):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for cluster, grp in batch.groupby("cluster"):
                qids = by_cluster.get(int(cluster))
                if not qids:
                    continue
                scored = BruteForceScorer.__call__(self, grp)
                outs.append(scored[scored["qid"].isin(qids)])
            if not outs:
                return pd.DataFrame({"qid": [], id_col: [], "score": []})
            return pd.concat(outs, ignore_index=True)

    local = candidates.map_batches(
        ClusterScorer,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k,
                                   id_col=id_col, vec_col=vec_col),
        batch_format="pandas", concurrency=(1, concurrency), num_cpus=0.5)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["score", id_col],
                                 ascending=[False, True]).head(k)

    return local.groupby("qid").map_groups(merge, batch_format="pandas")


def embedding_near_dup_pairs(ds, threshold: float = 0.95, n_bits: int = 10,
                             dim: int | None = None, seed: int = 42,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             concurrency: int = 4):
    """Embedding-cosine near-duplicate pairs via LSH co-bucketing.

    groupby(bucket) → exact pairwise cosine within bucket ≥ threshold.
    Bucket sizes stay bounded because random hyperplanes split uniformly;
    skewed buckets would be salted by an extra hash of the id.
    """
    if dim is None:
        first = ds.take(1)[0]
        dim = len(first[vec_col])
    bucketer = LshBucketer(dim=dim, n_bits=n_bits, seed=seed, vec_col=vec_col)
    bucketed = ds.map_batches(bucketer, batch_format="pandas",
                              concurrency=concurrency, num_cpus=0.5)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        # sort by id first so emitted pairs satisfy id_a < id_b, then take
        # the upper triangle of the similarity matrix in one vectorized
        # mask (no per-pair Python loop)
        ids = np.asarray(group[id_col])
        order = np.argsort(ids)
        ids = ids[order]
        mat = _to_matrix(group[vec_col])[order]
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = (mat @ mat.T).astype(np.float64)
        ia, ib = np.triu_indices(len(ids), k=1)
        hit = sims[ia, ib] >= threshold
        return pd.DataFrame({"id_a": ids[ia[hit]],
                             "id_b": ids[ib[hit]],
                             "cosine": sims[ia[hit], ib[hit]].round(6)})

    # materialize before the empty-guard count so the groupby below reads
    # the computed blocks instead of recomputing the lineage
    found = bucketed.groupby("bucket").map_groups(
        pairs, batch_format="pandas").materialize()
    if found.count() == 0:
        return found

    def dedup(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)
    return found.groupby(["id_a", "id_b"]).map_groups(dedup, batch_format="pandas")


def quantize_embeddings_int8(ds, embedding_col: str = "embedding",
                             id_col: str = "vec_id"):
    """Symmetric per-vector int8 quantization — the storage/compute
    shrink step before an ANN index ships to a cluster (4× smaller than
    float32, SIMD-friendly int dot products).

    q_i = trunc(127 · x_i / max|x|) computed in float64, which is
    bit-reproducible across engines (IEEE multiply/divide + trunc — no
    rounding-mode hazard), so a SQL oracle replays every component.
    Map-only, zero shuffle.  Emits the quantized vector plus integer
    summaries (the oracle compares the summaries; list payloads stay in
    Arrow for downstream stages): (id, n_dims, scale_ppm, q_sum, q_min,
    q_max, q_l1).
    """
    def quant(batch: pd.DataFrame) -> pd.DataFrame:
        ids, qvecs = [], []
        n_dims = np.empty(len(batch), dtype=np.int64)
        scale_ppm = np.empty(len(batch), dtype=np.int64)
        q_sum = np.empty(len(batch), dtype=np.int64)
        q_min = np.empty(len(batch), dtype=np.int64)
        q_max = np.empty(len(batch), dtype=np.int64)
        q_l1 = np.empty(len(batch), dtype=np.int64)
        for i, (vid, vec) in enumerate(
                zip(batch[id_col], batch[embedding_col])):
            x = np.asarray(vec, dtype=np.float64)
            mx = float(np.abs(x).max()) if len(x) else 0.0
            q = (np.trunc(127.0 * x / mx).astype(np.int64)
                 if mx > 0 else np.zeros(len(x), dtype=np.int64))
            ids.append(vid)
            # plain list: pandas->Arrow block conversion rejects columns
            # of numpy int8 ndarrays but handles list<int64> natively
            qvecs.append(q.tolist())
            n_dims[i] = len(x)
            scale_ppm[i] = int(np.floor(mx * 1_000_000))
            q_sum[i] = int(q.sum())
            q_min[i] = int(q.min()) if len(q) else 0
            q_max[i] = int(q.max()) if len(q) else 0
            q_l1[i] = int(np.abs(q).sum())
        return pd.DataFrame({
            id_col: ids, "q_vec": qvecs, "n_dims": n_dims,
            "scale_ppm": scale_ppm, "q_sum": q_sum, "q_min": q_min,
            "q_max": q_max, "q_l1": q_l1})

    return ds.map_batches(quant, batch_format="pandas")


class SemanticDecontaminator:
    """Per-batch cosine vs the broadcast benchmark matrix; emits one row
    per corpus vector with at least one benchmark match at
    ``threshold``: (id_col, n_bench_matches).  The classic map-only
    broadcast shape (ray.put once, fetched per actor in ``__init__``)."""

    def __init__(self, bench_ref, threshold: float = 0.9,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray
        b = ray.get(bench_ref) \
            if not isinstance(bench_ref, (np.ndarray, list)) else bench_ref
        b = np.asarray(b, dtype=np.float32)
        self.bnorm = b / np.maximum(
            np.linalg.norm(b, axis=1, keepdims=True), 1e-30)
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch) or not len(self.bnorm):
            return pd.DataFrame({self.id_col: pd.Series(dtype="int64"),
                                 "n_bench_matches":
                                     pd.Series(dtype="int64")})
        mat = _to_matrix(batch[self.vec_col])
        mat = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        scores = mat @ self.bnorm.T                  # (rows, n_bench)
        n = (scores >= self.threshold).sum(axis=1).astype("int64")
        keep = n > 0
        return pd.DataFrame({
            self.id_col: np.asarray(batch[self.id_col])[keep],
            "n_bench_matches": n[keep],
        })


def benchmark_matrix_ref(bench_ds, vec_col: str = "embedding",
                         max_rows: int = 1_000_000):
    """Collect the benchmark embedding matrix once and ``ray.put`` it.

    Eval sets are small by construction; a benchmark beyond ``max_rows``
    raises instead of silently materializing on the driver (same guard
    discipline as ``build_alias_dict`` / the decontam gram set) — at that
    size, bucket-join the two embedding tables instead of broadcasting.
    """
    bench_ds = bench_ds.materialize()   # one execution: guard + collect
    n = bench_ds.count()
    if n > max_rows:
        raise ValueError(
            f"benchmark has {n} vectors (> max_rows={max_rows}); broadcast "
            "would not fit — bucket-join the embedding tables instead")
    mats = [_to_matrix(b[vec_col])
            for b in bench_ds.iter_batches(batch_format="pandas")
            if len(b)]
    mat = np.concatenate(mats) if mats \
        else np.zeros((0, 1), dtype=np.float32)
    from ..state.broadcast import pin_broadcast
    return pin_broadcast(mat)


def semantic_decontam(corpus_ds, bench_ref, threshold: float = 0.9,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      concurrency: int = 4):
    """Embedding-cosine benchmark decontamination: corpus vectors whose
    cosine against ANY benchmark vector is ``>= threshold`` — the
    semantic sibling of the n-gram decontaminators (a reworded leak has
    near-identical embeddings but few shared n-grams).  One map-only
    pass; no shuffle."""
    return corpus_ds.map_batches(
        SemanticDecontaminator,
        fn_constructor_kwargs=dict(bench_ref=bench_ref, threshold=threshold,
                                   id_col=id_col, vec_col=vec_col),
        batch_format="pandas", concurrency=concurrency, num_cpus=0.5)
