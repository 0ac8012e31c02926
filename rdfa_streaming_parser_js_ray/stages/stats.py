"""Distributed order statistics (grouped quantiles, top-k per group).

The reference has no analytics layer; these are the rollups a
training-data pipeline runs constantly (token-length percentiles per
language, "show me the k biggest documents per source") expressed
shuffle-light:

- ``grouped_quantiles`` never sorts the data: a per-batch value-count
  combiner compresses each block to one row per (key, value), ONE grouped
  exchange sums the histograms, and the per-key quantile is read off the
  cumulative histogram.  For discrete-valued columns (token counts,
  lengths, scores) this is EXACT and the exchange carries
  O(distinct values) rows, not O(rows) — at 100 TB the histogram of
  int token counts is a few thousand rows per key regardless of corpus
  size.  Quantile convention matches DuckDB's ``quantile_disc``:
  the element at index ceil(q*n)-1 of the sorted multiset (verified
  empirically; use binary-exact q like 0.25/0.5/0.75 so float ceil
  agrees across engines).
- ``topk_per_group``: per-batch top-k combiner, then one grouped
  exchange over at most k rows per (key, block) — the classic
  bounded-shuffle top-k.  Deterministic under ties via an explicit
  tiebreak column.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def grouped_quantiles(ds, key_col: str, value_col: str,
                      qs: tuple[float, ...] = (0.25, 0.5, 0.75)):
    """(key, n, q25, q50, ...) — exact discrete quantiles per key.

    ``value_col`` must be discrete (ints or low-cardinality floats); the
    shuffled histogram has one row per (key, distinct value).
    Output quantile columns are named ``q`` + percent with dots stripped
    (0.25 → ``q25``, 0.995 → ``q99_5``).
    """
    from ray.data.aggregate import Sum

    def qname(q: float) -> str:
        pct = q * 100
        if abs(pct - round(pct)) < 1e-9:
            return f"q{int(round(pct))}"
        return "q" + str(pct).replace(".", "_")

    names = [qname(q) for q in qs]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch.groupby([key_col, value_col], as_index=False).size()
        return vc.rename(columns={"size": "_n"})

    hist = ds.map_batches(partial, batch_format="pandas") \
        .groupby([key_col, value_col]).aggregate(Sum("_n", alias_name="_n"))

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(value_col)
        counts = g["_n"].to_numpy(dtype=np.int64)
        values = g[value_col].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])
        row = {key_col: g[key_col].iloc[0], "n": n}
        for q, name in zip(qs, names):
            idx = max(math.ceil(q * n) - 1, 0)  # quantile_disc convention
            row[name] = values[np.searchsorted(cum, idx, side="right")]
        return pd.DataFrame([row])

    return hist.groupby(key_col).map_groups(finish, batch_format="pandas")


def topk_per_group(ds, key_col: str, order_col: str, k: int,
                   tiebreak_col: str, ascending: bool = False):
    """Top-k rows per key by ``order_col`` (ties broken by ascending
    ``tiebreak_col`` — deterministic across block layouts).

    Per-batch combiner keeps at most k rows per key per block, so the
    single grouped exchange moves O(k × keys × blocks) rows; the final
    per-key pass re-applies the same bounded selection.  Output keeps
    the input columns.
    """
    cols = list(ds.schema().names)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values([order_col, tiebreak_col],
                              ascending=[ascending, True])
        return b.groupby(key_col, as_index=False, sort=False).head(k)

    partials = ds.map_batches(local_topk, batch_format="pandas")

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([order_col, tiebreak_col],
                              ascending=[ascending, True])
        return g.head(k)[cols]

    return partials.groupby(key_col).map_groups(finish,
                                                batch_format="pandas")


def ntile_of_rank(rank, n, n_tiles: int):
    """SQL NTILE from 0-based rank(s): with ``n`` rows and ``T`` tiles,
    the first ``n % T`` tiles get ``n // T + 1`` rows, the rest
    ``n // T`` (the remainder-spread convention every engine shares).
    ``rank`` and ``n`` may be scalars or aligned numpy arrays (the
    grouped variant passes per-row group sizes).  Returns 1-based
    tiles as int64."""
    rank = np.asarray(rank, dtype="int64")
    n = np.asarray(n, dtype="int64")
    q, r = n // n_tiles, n % n_tiles
    head = r * (q + 1)
    # q == 0 (fewer rows than tiles): every rank sits in the head, so
    # the tail branch (division by max(q, 1)) is never selected
    tail = r + (rank - head) // np.maximum(q, 1)
    return (np.where(rank < head, rank // (q + 1), tail) + 1) \
        .astype("int64")


def global_ntile(ds, value_col: str, tiebreak_col: str,
                 n_tiles: int = 10, num_ranges: int = 64):
    """GLOBAL order-statistic tiles: NTILE(``n_tiles``) over the whole
    dataset ordered by (round(value×100) cents, tiebreak), reduced to one
    summary row per tile — (tile, n_rows, sum_cents, min_cents,
    max_cents).

    No global sort.  The global rank of every row is recovered from a
    RANGE partition of the value domain plus a driver-side prefix over
    per-range counts (the distributed-prefix-sum shape pack.py uses for
    token packing, applied to ranking):

    1. one cheap columnar pass computes global min/max cents;
    2. each row maps to ``_rg = (cents - lo) * num_ranges // span`` — a
       function of the VALUE only, so tied values always co-locate and
       ranges are totally ordered by value (every row of range r sorts
       before every row of range r+1);
    3. per-range counts (``num_ranges`` integers — the only driver pull)
       prefix-sum into per-range rank offsets;
    4. ONE grouped exchange on ``_rg``; each range sorts locally by
       (cents, tiebreak), adds its offset → exact 0-based global rank →
       SQL NTILE tile (first N % T tiles get the extra row), and
       pre-aggregates per tile, so the tail exchange moves at most
       ``n_tiles`` rows per range.

    Skewed value distributions make ranges uneven (a constant column
    collapses to one range); callers with pathological skew should raise
    ``num_ranges`` — correctness is unaffected, only balance.
    """
    from ray.data.aggregate import Max, Min, Sum

    from ..state.broadcast import pin_broadcast

    slim_cols = [value_col, tiebreak_col]

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cents": np.rint(batch[value_col].to_numpy() * 100)
                       .astype("int64"),
            "tb": batch[tiebreak_col].to_numpy(),
        })

    cents_ds = ds.select_columns(slim_cols) \
        .map_batches(to_cents, batch_format="pandas") \
        .materialize()  # scanned 3× (bounds, counts, rank) — pin once

    bounds = cents_ds.aggregate(Min("cents"), Max("cents"))
    if bounds is None or bounds.get("min(cents)") is None:   # empty input
        import pyarrow as pa
        import ray.data as rd
        return rd.from_arrow(pa.table(
            {c: pa.array([], pa.int64())
             for c in ("tile", "n_rows", "sum_cents", "min_cents",
                       "max_cents")}))
    lo, hi = int(bounds["min(cents)"]), int(bounds["max(cents)"])
    span = max(hi - lo + 1, 1)

    def add_range(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        c = batch["cents"].to_numpy()
        batch["_rg"] = ((c - lo) * num_ranges // span).astype("int64")
        return batch

    ranged = cents_ds.map_batches(add_range, batch_format="pandas")

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("_rg", as_index=False).size()
        return g.rename(columns={"size": "_n"})

    counts = ranged.map_batches(count_partial, batch_format="pandas") \
        .groupby("_rg").aggregate(Sum("_n", alias_name="_n")).to_pandas()
    counts = counts.sort_values("_rg")
    per_range = dict(zip(counts["_rg"].astype(int),
                         counts["_n"].astype(int)))
    total = sum(per_range.values())
    offsets, acc = {}, 0
    for rg in sorted(per_range):
        offsets[rg] = acc
        acc += per_range[rg]
    off_ref = pin_broadcast(offsets)

    def rank_and_tile(group: pd.DataFrame) -> pd.DataFrame:
        import ray
        offs = ray.get(off_ref)
        g = group.sort_values(["cents", "tb"]).reset_index(drop=True)
        rank = np.arange(len(g), dtype="int64") + offs[int(g["_rg"].iloc[0])]
        g["tile"] = ntile_of_rank(rank, total, n_tiles)
        out = g.groupby("tile", as_index=False).agg(
            n_rows=("cents", "size"), sum_cents=("cents", "sum"),
            min_cents=("cents", "min"), max_cents=("cents", "max"))
        return out

    partials = ranged.groupby("_rg").map_groups(rank_and_tile,
                                                batch_format="pandas")

    out = partials.groupby("tile").aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("sum_cents", alias_name="sum_cents"),
        Min("min_cents", alias_name="min_cents"),
        Max("max_cents", alias_name="max_cents"))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("tile", "n_rows", "sum_cents", "min_cents", "max_cents"):
            batch[c] = batch[c].astype("int64")
        return batch
    return out.map_batches(finish, batch_format="pandas")


def kmv_distinct_tokens(ds, text_col: str = "text", k: int = 256):
    """Distributed cardinality sketch: K-minimum-values estimate of the
    corpus's distinct-token count.

    The classic mergeable sketch shape on Ray Data:

    - per-batch COMBINER: batch-distinct tokens → md5-low-64 hashes
      (the ``md5_number`` convention DuckDB can replay) → the k
      smallest survive — at most k rows per block cross the wire;
    - ONE constant-key fold merges the partials (k·blocks rows total,
      independent of corpus size) and reads off the estimator.

    Estimator: with m = |sketch| and R = kth_min/2⁶⁴,
    est = (k−1)/R computed in EXACT integer arithmetic
    ((k−1)·2⁶⁴ // kth_min — Python ints, HUGEINT in the oracle); when
    the corpus has fewer than k distinct hashes the sketch IS the
    distinct set and the estimate is exact.  Hash-value dedup (not
    token dedup) keeps both engines identical under collisions.
    Returns one row: (k, n_mins, kth_min, est_distinct).
    """
    import hashlib
    import re as _re

    word = _re.compile(r"\S+")
    mask = (1 << 64) - 1

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for text in batch[text_col]:
            toks.update(word.findall((text or "").lower()))
        if not toks:
            return pd.DataFrame({"_g": pd.Series([], dtype="int64"),
                                 "h": pd.Series([], dtype="uint64")})
        hashes = np.unique(np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode()).digest(),
                            "little") & mask for t in toks),
            dtype=np.uint64, count=len(toks)))
        return pd.DataFrame({"_g": np.int64(0), "h": hashes[:k]})

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        hashes = np.unique(group["h"].to_numpy(dtype=np.uint64))[:k]
        m = len(hashes)
        kth = int(hashes[-1]) if m else 0
        est = m if m < k else ((k - 1) * (1 << 64)) // kth
        return pd.DataFrame({
            "k": pd.Series([k], dtype="int64"),
            "n_mins": pd.Series([m], dtype="int64"),
            "kth_min": pd.Series([kth], dtype="uint64"),
            "est_distinct": pd.Series([est], dtype="int64"),
        })

    return ds.map_batches(partial, batch_format="pandas") \
             .groupby("_g").map_groups(fold, batch_format="pandas")


def kmv_grouped_distinct(ds, key_col: str, value_col: str, k: int = 256):
    """Per-key KMV distinct-count sketch — the scalable replacement for
    ``COUNT(DISTINCT value) GROUP BY key`` (exact distinct per key needs
    a value-level shuffle; the sketch ships ≤ k hashes per key per
    block).

    Same estimator and md5-low-64 hash convention as
    :func:`kmv_distinct_tokens`; values are hashed as strings so any
    dtype works and the SQL replay is one cast.  Returns one row per
    key: (key, n_mins, kth_min, est_distinct) — exact when a key has
    fewer than k distinct hashes.
    """
    import hashlib

    mask = (1 << 64) - 1

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sub = pd.DataFrame({
            "key": batch[key_col].to_numpy(),
            "val": batch[value_col].astype(str).to_numpy()}) \
            .drop_duplicates()
        if not len(sub):
            return pd.DataFrame({"key": pd.Series([], dtype=object),
                                 "h": pd.Series([], dtype="uint64")})
        sub["h"] = np.fromiter(
            (int.from_bytes(hashlib.md5(v.encode()).digest(),
                            "little") & mask for v in sub["val"]),
            dtype=np.uint64, count=len(sub))
        sub = sub.drop_duplicates(["key", "h"]).sort_values("h")
        return sub.groupby("key", sort=False).head(k)[["key", "h"]]

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        hashes = np.unique(group["h"].to_numpy(dtype=np.uint64))[:k]
        m = len(hashes)
        kth = int(hashes[-1]) if m else 0
        est = m if m < k else ((k - 1) * (1 << 64)) // kth
        return pd.DataFrame({
            key_col: [group["key"].iloc[0]],
            "n_mins": pd.Series([m], dtype="int64"),
            "kth_min": pd.Series([kth], dtype="uint64"),
            "est_distinct": pd.Series([est], dtype="int64"),
        })

    return ds.map_batches(partial, batch_format="pandas") \
             .groupby("key").map_groups(fold, batch_format="pandas")


def grouping_sets_agg(ds, sets: list[tuple[str, ...]], value_col: str,
                      sentinel: str = "__ALL__"):
    """ROLLUP / CUBE / GROUPING SETS aggregation in ONE exchange.

    ``sets`` lists the grouping sets, e.g. SQL ``ROLLUP(source, lang)``
    = ``[("source", "lang"), ("source",), ()]``.  The combiner emits,
    per batch, one partial (n_rows, sum) row per grouping set per key
    combo present — rolled-up dimensions carry ``sentinel`` (the SQL
    replay COALESCEs its NULLs to the same sentinel) — and a single
    grouped exchange sums the partials.  The shuffle carries
    |sets| × (combos per batch) rows, never the data.  Sums stay on the
    input dtype, so integer columns are engine-exact.

    Dim columns come out as STRINGS (nulls preserved as nulls): the
    rolled-up rows carry the string ``sentinel``, so a non-string dim
    would otherwise feed mixed int/str keys into the grouped exchange
    and crash Ray's sort-based groupby at sample_boundaries.  Null dim
    VALUES ride the exchange as a reserved string (``"\\x00null"``) for
    the same reason — None-vs-str boundary comparisons crash too, shape-
    dependently — and are restored to None on the way out.  A SQL
    replay of an integer dim must CAST it to VARCHAR.

    Returns (dim columns in first-set order, n_rows, sum_<value_col>).
    """
    from ray.data.aggregate import Sum

    # reserved: impossible in real dim strings; no TRAILING NUL — numpy
    # unicode arrays (Ray's sort path) silently strip trailing \x00
    _NULL_DIM = "\x00null"

    cols: list[str] = []
    for s in sets:
        for c in s:
            if c not in cols:
                cols.append(c)
    sum_col = f"sum_{value_col}"

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for s in sets:
            if s:
                # dropna=False: a null dim value is its own group (SQL
                # ROLLUP keeps a NULL group too) — the default would
                # drop those rows from fine sets while the () grand
                # total still counts them, making the output
                # self-contradictory
                g = batch.groupby(list(s), as_index=False,
                                  dropna=False).agg(
                    n_rows=(value_col, "size"),
                    **{sum_col: (value_col, "sum")})
            else:
                g = pd.DataFrame({"n_rows": [len(batch)],
                                  sum_col: [batch[value_col].sum()]})
            for c in cols:
                if c not in s:
                    g[c] = sentinel
                    continue
                # stringify non-string dims AND encode nulls as a string
                # sentinel so the exchange keys are uniformly str —
                # Ray's sort-based groupby samples boundaries with `<`,
                # which a None-vs-str (or int-vs-str) key pair crashes
                na = g[c].isna()
                if g[c].dtype.kind in "iufbmM":
                    g[c] = g[c].astype(str).astype(object)
                else:
                    # object dims may hold non-str values (e.g. Python
                    # ints after a join demotion) — same mixed-key crash
                    g[c] = g[c].map(
                        lambda v: v if isinstance(v, str) else str(v))
                g[c] = g[c].mask(na, _NULL_DIM)
            outs.append(g[cols + ["n_rows", sum_col]])
        return pd.concat(outs, ignore_index=True)

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby(cols).aggregate(Sum("n_rows", alias_name="n_rows"),
                                 Sum(sum_col, alias_name=sum_col))

    def restore_nulls(batch: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            batch[c] = batch[c].mask(batch[c] == _NULL_DIM, None)
        return batch

    return out.map_batches(restore_nulls, batch_format="pandas")


def pivot_agg(ds, row_key: str, col_key: str, value_col: str,
              columns: list[str], other: str | None = "__OTHER__"):
    """Pivot to wide: one row per ``row_key``, one (count, sum) column
    pair per pinned ``columns`` value of ``col_key``.

    The column vocabulary is an explicit argument — the scale-safe
    pivot contract (a discovered vocabulary would make the schema
    data-dependent and unboundedly wide).  Values outside it fold into
    ``other`` (or are dropped when ``other=None``).  Per batch the
    combiner emits one wide partial row per row_key (vectorized
    crosstab via groupby-unstack); ONE grouped exchange sums partials.
    Sums stay on the input dtype — integer inputs are engine-exact.

    Returns (row_key, n_<col>, sum_<col>, ... [, n_other, sum_other]).
    """
    from ray.data.aggregate import Sum

    vocab = list(columns) + ([other] if other is not None else [])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[[row_key, col_key, value_col]].copy()
        known = b[col_key].isin(columns)
        if other is None:
            b = b[known]
        else:
            b.loc[~known, col_key] = other
        # dropna=False: a null row_key keeps its rows (its own group)
        # instead of silently vanishing from the pivot
        g = b.groupby([row_key, col_key], dropna=False).agg(
            n=(value_col, "size"), s=(value_col, "sum"))
        wide = g.unstack(col_key)
        int_vals = pd.api.types.is_integer_dtype(batch[value_col])
        out = pd.DataFrame(index=wide.index)
        for c in vocab:
            n = wide["n"][c] if ("n", c) in wide.columns else 0
            s = wide["s"][c] if ("s", c) in wide.columns else 0
            out[f"n_{c}"] = pd.Series(n, index=wide.index).fillna(0) \
                .astype("int64")
            sum_series = pd.Series(s, index=wide.index).fillna(0)
            # unstack's NaN fill silently floats integer sums — cast back
            # so integer inputs stay engine-exact end to end
            out[f"sum_{c}"] = sum_series.astype("int64") if int_vals \
                else sum_series
        return out.reset_index()

    aggs = []
    for c in vocab:
        aggs.append(Sum(f"n_{c}", alias_name=f"n_{c}"))
        aggs.append(Sum(f"sum_{c}", alias_name=f"sum_{c}"))
    return ds.map_batches(partial, batch_format="pandas") \
        .groupby(row_key).aggregate(*aggs)


def frequent_ngrams(ds, threshold: int, n: int = 2, text_col: str = "text",
                    sketch_k: int = 4096, sketch_batch_size: int = 4096,
                    max_candidates: int = 2_000_000, concurrency: int = 4,
                    on_overflow: str = "fallback"):
    """EXACT frequent n-grams (global count >= ``threshold``) without ever
    shuffling the full gram vocabulary — the bounded-exchange complement
    of the exact wordcount (``q_top_terms``), for the 100 TB case where
    distinct n-grams outnumber what an all-to-all groupby can carry.

    Two passes, SpaceSaving-flavored (Metwally et al., "Efficient
    computation of frequent and top-k elements in data streams"):

    1. **Sketch** — per batch, count n-grams exactly, keep only the top
       ``sketch_k`` entries and record the largest TRUNCATED count as
       that batch's error bound ``e_b`` (a sentinel row, gram ``""`` —
       unreachable, real grams match ``[a-z]+( [a-z]+)*``).  The grouped
       exchange then carries <= ``sketch_k + 1`` rows per batch instead
       of the vocabulary.  For any gram ``g``, ``kept_sum(g) <= true(g)
       <= kept_sum(g) + E`` with ``E = sum(e_b)``, so
       ``kept_sum + E >= threshold`` is a PROVABLY COMPLETE candidate
       superset (a batch that truncates ``g`` contributes at most
       ``e_b`` of its count).
    2. **Verify** — broadcast the candidate set once
       (``pin_broadcast``, size-guarded at ``max_candidates`` — raises
       rather than silently truncating, like the decontam gram guard),
       re-count ONLY candidates exactly, and keep ``count >=
       threshold``.  Output is exact: (gram, n) — no approximation
       survives to the result, so a SQL oracle replays it verbatim.

    Tokenization matches ``q_top_terms``/``tfidf``: lowercase ``[a-z]+``
    runs, n-grams joined by single spaces.  ``sketch_k`` trades exchange
    width against candidate-set size: if every batch truncates hard,
    ``E`` grows and more candidates reach the verify pass (still exact,
    just wider); batches with <= ``sketch_k`` distinct grams contribute
    zero error.

    **Completeness contract.**  The superset proof needs ``threshold >
    E``: a gram truncated in EVERY batch has ``kept_sum = 0`` — it never
    reaches the candidate table at all, and its true count can still be
    as large as ``E``.  ``E`` is known exactly after the (bounded)
    sketch exchange, so the bound is CHECKED at runtime: when
    ``total_err >= threshold`` the sketch cannot certify completeness
    and the call either falls back to the exact full-vocabulary
    groupby (``on_overflow="fallback"``, the default — same shape as
    ``q_top_terms``, correct at any threshold, just an unbounded
    exchange; repo precedent: ``build_canonical_map``'s overflow
    fallback to the joined closure) or raises with sizing guidance
    (``on_overflow="raise"`` — use in tests/pipelines that must prove
    the bounded path ran).  Either way the OUTPUT is exact; only the
    exchange width differs.
    """
    import re
    from collections import Counter

    import pyarrow as pa
    import ray
    from ray.data.aggregate import Sum

    from ..state.broadcast import pin_broadcast

    token_re = re.compile(r"[a-z]+")

    def _gram_counts(texts) -> Counter:
        counts: Counter = Counter()
        for text in texts:
            toks = token_re.findall((text or "").lower())
            counts.update(" ".join(toks[i:i + n])
                          for i in range(len(toks) - n + 1))
        return counts

    def sketch(batch: pa.Table) -> pa.Table:
        counts = _gram_counts(batch[text_col].to_pylist())
        err = 0
        if len(counts) > sketch_k:
            mc = counts.most_common(sketch_k + 1)
            err = mc[sketch_k][1]
            counts = dict(mc[:sketch_k])
        grams = list(counts.keys())
        vals = list(counts.values())
        if err:
            grams.append("")
            vals.append(err)
        return pa.table({"gram": pa.array(grams, pa.string()),
                         "n": pa.array(vals, pa.int64())})

    summed = ds.map_batches(sketch, batch_format="pyarrow",
                            batch_size=sketch_batch_size) \
        .groupby("gram").aggregate(Sum("n", alias_name="n")) \
        .materialize()  # bounded: <= sketch_k x batches rows, post-reduce

    err_tbl = summed.map_batches(
        lambda b: b[b["gram"] == ""], batch_format="pandas").take_all()
    total_err = int(err_tbl[0]["n"]) if err_tbl else 0

    def _count_all(batch: pa.Table) -> pa.Table:
        counts = _gram_counts(batch[text_col].to_pylist())
        return pa.table({"gram": pa.array(list(counts), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    if total_err >= threshold:
        # Sketch can't certify completeness (a gram truncated in every
        # batch never surfaces; its true count may reach total_err).
        if on_overflow == "raise":
            raise ValueError(
                f"frequent_ngrams sketch error bound E={total_err} >= "
                f"threshold={threshold}: completeness not certifiable. "
                f"Raise sketch_k (now {sketch_k}) / sketch_batch_size, "
                f"raise the threshold, or use on_overflow='fallback'.")
        return ds.map_batches(_count_all, batch_format="pyarrow") \
            .groupby("gram").aggregate(Sum("n", alias_name="n")) \
            .map_batches(lambda b: b[b["n"] >= threshold],
                         batch_format="pandas")

    def cand_filter(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["gram"] != "") & (batch["n"] + total_err >= threshold)
        return batch.loc[keep, ["gram"]]

    cand_rows = summed.map_batches(cand_filter, batch_format="pandas") \
        .take_all(limit=max_candidates)
    candidates = frozenset(r["gram"] for r in cand_rows)
    if not candidates:
        return ray.data.from_arrow(pa.table(
            {"gram": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}))
    cand_ref = pin_broadcast(candidates)

    class _ExactCount:
        def __init__(self):
            self.cands = ray.get(cand_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            counts = _gram_counts(batch[text_col].to_pylist())
            kept = {g: c for g, c in counts.items() if g in self.cands}
            return pa.table({"gram": pa.array(list(kept), pa.string()),
                             "n": pa.array(list(kept.values()), pa.int64())})

    exact = ds.map_batches(_ExactCount, batch_format="pyarrow",
                           concurrency=concurrency, num_cpus=0.5) \
        .groupby("gram").aggregate(Sum("n", alias_name="n"))
    return exact.map_batches(
        lambda b: b[b["n"] >= threshold], batch_format="pandas")
