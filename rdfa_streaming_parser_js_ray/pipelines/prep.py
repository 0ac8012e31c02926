"""Training-data corpus preparation: the second flagship pipeline.

Chains the training-data operators end to end over a raw documents table
(doc_id, text):

    exact dedup (surviving rows)          one hash-bucketed exchange
    → MinHash-LSH near-dup removal        band groupby + joined verify
    → quality filter                      vectorized map, no shuffle
    → deterministic train/val split       hash-modulo map, no shuffle
    → partitioned write by split          resumable parquet layout

Everything before the near-dup candidate groupby is map-only; the kept
corpus streams through — near-dup victims are removed by a partitioned
anti-join, so nothing row-shaped ever reaches the driver.
"""

from __future__ import annotations

import time


def prepare_corpus(docs_ds, out_dir: str | None = None, *,
                   near_dup_threshold: float = 0.8,
                   min_words: int = 5, max_stop_ratio: float = 0.9,
                   train_mod: int = 10, train_buckets: int = 8,
                   id_col: str = "doc_id", text_col: str = "text",
                   normalize: bool = False,
                   decontam_bench_ds=None, decontam_n: int = 3,
                   decontam_threshold: int = 1):
    """Returns (prepared Dataset, metrics dict).

    Near-dup policy: within each verified near-dup pair the larger id is
    dropped (the smaller survives) — deterministic and order-free.

    Optional stages (both default off so the round-2 oracle stays
    byte-stable):

    - ``normalize=True`` canonicalizes text FIRST (NFC + lowercase +
      whitespace collapse + trim — stages.text.normalize_text order),
      so dedup hashes and n-grams see canonical bytes.
    - ``decontam_bench_ds`` drops documents sharing ≥ threshold distinct
      word-``decontam_n``-grams with the benchmark set, after near-dup
      removal.  Uses the md5-of-gram twin (SQL-replayable; collisions
      negligible) — the crc-rolling production path is
      ``stages.decontam.drop_contaminated``.
    """
    import numpy as np
    import pandas as pd

    from ..stages.dedup import exact_dedup_rows, minhash_dedup_pairs_joined

    metrics: dict = {"stages": {}}
    t0 = time.monotonic()

    if normalize:
        from ..stages.text import normalize_series

        def norm(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch[text_col] = normalize_series(batch[text_col])
            return batch

        docs_ds = docs_ds.map_batches(norm, batch_format="pandas")

    # 1. exact dedup, keeping full rows
    t_s = time.monotonic()
    unique_docs = exact_dedup_rows(docs_ds, text_col=text_col,
                                   id_col=id_col).materialize()
    metrics["stages"]["exact_dedup_sec"] = round(time.monotonic() - t_s, 3)
    metrics["docs_after_exact"] = unique_docs.count()

    # 2. near-dup removal: verified pairs → drop the larger id of each
    # via a partitioned anti-join (no driver materialization of the pair
    # set — at 100 TB the drop set is not guaranteed to fit anywhere)
    t_s = time.monotonic()
    from ..stages.joins import anti_join
    pairs = minhash_dedup_pairs_joined(unique_docs,
                                       threshold=near_dup_threshold,
                                       text_col=text_col,
                                       id_col=id_col).materialize()
    # distinct-victim count as a distributed aggregate (combiner distinct
    # per batch, one grouped exchange, then a metadata count) — only the
    # INT reaches the driver; at 100 TB the victim id set itself can be
    # arbitrarily large and must never be pulled
    if pairs.count():
        from ray.data.aggregate import Count
        metrics["near_dups_dropped"] = pairs.map_batches(
            lambda b: b[["doc_b"]].drop_duplicates(),
            batch_format="pandas").groupby("doc_b") \
            .aggregate(Count(alias_name="_n")).count()
    else:
        metrics["near_dups_dropped"] = 0
    kept = anti_join(unique_docs, pairs, on=id_col, right_on="doc_b") \
        if pairs.count() else unique_docs
    metrics["stages"]["near_dup_sec"] = round(time.monotonic() - t_s, 3)

    # 2b. optional benchmark decontamination (broadcast gram set, one
    # map-only filter pass; the benchmark side is eval-set-sized)
    if decontam_bench_ds is not None:
        import ray

        from ..stages.decontam import _md5_grams, benchmark_md5_hashes
        t_s = time.monotonic()
        from ..state.broadcast import pin_broadcast
        bench_ref = pin_broadcast(
            benchmark_md5_hashes(decontam_bench_ds, n=decontam_n,
                                 text_col=text_col))
        n_gram, thresh = decontam_n, decontam_threshold

        class _Drop:
            def __init__(self):
                self.bench = ray.get(bench_ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                keep = [len(set(_md5_grams(t, n_gram)) & self.bench)
                        < thresh for t in batch[text_col]]
                return batch[np.asarray(keep)]

        kept = kept.map_batches(_Drop, batch_format="pandas",
                                concurrency=2, num_cpus=0.5)
        metrics["stages"]["decontam_sec"] = round(time.monotonic() - t_s, 3)

    # 3. quality filter — features computed inline per batch (no driver
    # round-trip; the scored columns are dropped after thresholding)
    t_s = time.monotonic()
    from ..stages.text import _STOPWORDS

    def filter_quality(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("").reset_index(drop=True)
        n_words = s.str.count(r"\S+").to_numpy()
        words = s.str.lower().str.findall(r"[a-z]+")
        # one explode + grouped isin-sum across the batch (no per-doc scan)
        n_stop = words.explode().dropna().isin(_STOPWORDS["en"]) \
            .groupby(level=0).sum() \
            .reindex(np.arange(len(s)), fill_value=0).to_numpy()
        n_letter = np.maximum(words.str.len().to_numpy(), 1)
        keep = (n_words >= min_words) & ((n_stop / n_letter) <= max_stop_ratio)
        return batch[keep]

    final = kept.map_batches(filter_quality, batch_format="pandas")
    metrics["stages"]["quality_sec"] = round(time.monotonic() - t_s, 3)

    # 4. deterministic split (hash-modulo; retry-stable, no shuffle)
    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col]
        if ids.dtype.kind in "iu":
            bucket = ids.to_numpy() % train_mod
        else:
            import zlib
            bucket = np.fromiter(
                (zlib.crc32(str(v).encode()) % train_mod for v in ids),
                dtype=np.int64, count=len(ids))
        batch = batch.copy()
        batch["split"] = np.where(bucket < train_buckets, "train", "val")
        return batch

    final = final.map_batches(assign, batch_format="pandas")

    if out_dir is not None:
        t_s = time.monotonic()
        final.write_parquet(out_dir, partition_cols=["split"])
        metrics["stages"]["write_sec"] = round(time.monotonic() - t_s, 3)

    metrics["wall_sec"] = round(time.monotonic() - t0, 3)
    return final, metrics
