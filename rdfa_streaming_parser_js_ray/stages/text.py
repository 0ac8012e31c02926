"""Text-analysis stages: language-ID, quality scoring, token counting,
document fingerprinting.  All vectorized pandas/numpy inside
``map_batches``; the language model (stopword tables) and compiled
regexes load once per actor."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
           "with", "on", "as", "at", "by", "this", "from", "or", "an", "be"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por",
           "con", "no", "para", "los", "las", "del", "se", "al", "lo", "como"},
    "fr": {"le", "la", "de", "et", "un", "une", "est", "en", "que", "pour",
           "dans", "qui", "au", "du", "des", "les", "ce", "il", "ne", "pas"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit",
           "ist", "des", "im", "nicht", "ein", "eine", "auf", "für", "als"},
}


class LangId:
    """Stopword-overlap language identifier (n-gram-free heuristic).

    Emits (id, lang_pred, lang_conf).  A real fastText-style model would
    load in ``__init__`` exactly the same way — the actor-pool shape is the
    contract."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.word = re.compile(r"[a-zA-Zàâçéèêëîïôûùüÿñäöüß]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized: lowercase once (C), findall per row (C regex loop),
        # then ONE explode + isin per language over the whole batch —
        # no Python token scan per document.  Lowering BEFORE findall is
        # a deliberate behavior choice, not a no-op: the word class only
        # lists lowercase accented letters, so 'ÉTÉ' tokenizes as 'été'
        # here where findall-on-raw split it at the accents — this is
        # exactly the SQL oracle's formulation and the better tokenizer
        s = batch[self.text_col].fillna("").reset_index(drop=True)
        tokens = s.str.lower().str.findall(self.word).str[:2000]
        n_tok = tokens.str.len().to_numpy()
        ex = tokens.explode().dropna()
        scores = np.zeros((len(s), len(_STOPWORDS)))
        langs = sorted(_STOPWORDS)  # de, en, es, fr — ascending
        for j, lang in enumerate(langs):
            hits = ex.isin(_STOPWORDS[lang]).groupby(level=0).sum()
            scores[hits.index.to_numpy(), j] = hits.to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            ratios = scores / np.maximum(n_tok, 1)[:, None]
        # argmax with ties to the lexicographically LARGER code: scan the
        # reversed-sorted lang list and keep the first maximal column
        best_j = (len(langs) - 1) - np.argmax(ratios[:, ::-1], axis=1)
        best = ratios[np.arange(len(s)), best_j]
        preds = np.where((n_tok == 0) | (best == 0), "und",
                         np.asarray(langs, dtype=object)[best_j])
        return pd.DataFrame({self.id_col: batch[self.id_col].to_numpy(),
                             "lang_pred": preds,
                             "lang_conf": np.round(best, 4)})


def lang_id(ds, concurrency: int = 4, **kwargs):
    return ds.map_batches(LangId, fn_constructor_kwargs=kwargs,
                          batch_format="pandas", concurrency=concurrency, num_cpus=0.5)


def token_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, n_tokens, n_chars) — whitespace tokens, vectorized str ops."""
    def count(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        return pd.DataFrame({
            id_col: batch[id_col],
            "n_tokens": s.str.count(r"\S+").astype("int64"),
            "n_chars": s.str.len().astype("int64"),
        })
    return ds.map_batches(count, batch_format="pandas")


_BPE_ISH = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


def bpe_ish_token_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, n_bpe_tokens) — GPT-2-style pre-tokenizer regex approximation:
    letter runs, digit runs, and single punctuation marks."""
    def count(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col],
            # Series.str.count == len(findall) for non-overlapping matches,
            # but the row loop runs in C
            "n_bpe_tokens": batch[text_col].fillna("")
                            .str.count(_BPE_ISH).astype("int64"),
        })
    return ds.map_batches(count, batch_format="pandas")


def quality_scores(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc quality features (vectorized): char/word counts, mean word
    length, punctuation ratio, distinct-word ratio, stopword(en) ratio."""
    def score(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("").reset_index(drop=True)
        n_chars = s.str.len().astype("int64")
        n_words = s.str.count(r"\S+").astype("int64")
        # ASCII classes ([A-Za-z0-9_]) so the integer features are exactly
        # reproducible by an RE2-based SQL oracle
        n_punct = s.str.count(r"[^A-Za-z0-9_ \t\n\r]").astype("int64")
        words = s.str.lower().str.findall(r"[a-z]+")
        # one explode + grouped nunique/isin-sum over the whole batch
        # instead of a Python set/scan per document
        ex = words.explode().dropna()
        idx = np.arange(len(s))
        n_distinct = ex.groupby(level=0).nunique() \
            .reindex(idx, fill_value=0).astype("int64")
        n_stop = ex.isin(_STOPWORDS["en"]).groupby(level=0).sum() \
            .reindex(idx, fill_value=0).astype("int64")
        n_letter_words = words.str.len().astype("int64")
        return pd.DataFrame({
            # arrays, not Series: s was index-reset, batch[id_col] wasn't —
            # constructing from Series would realign on mismatched indices
            id_col: batch[id_col].to_numpy(),
            "n_chars": n_chars.to_numpy(),
            "n_words": n_words.to_numpy(),
            "n_punct": n_punct.to_numpy(),
            "n_distinct": n_distinct.to_numpy(),
            "n_stop": n_stop.to_numpy(),
            "punct_ratio": (n_punct / n_chars.replace(0, 1)).round(6).to_numpy(),
            "distinct_ratio": (n_distinct / n_letter_words.replace(0, 1)).round(6).to_numpy(),
            "stopword_ratio": (n_stop / n_letter_words.replace(0, 1)).round(6).to_numpy(),
        })
    return ds.map_batches(score, batch_format="pandas")


def repetition_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc line-structure repetition stats (Gopher/C4-style quality
    filters): (id, n_lines, n_distinct_lines, max_line_len,
    dup_line_ratio).  Vectorized: one split + explode + two grouped
    reductions per batch; lines are raw ``\\n`` segments (no strip), so a
    SQL oracle can replay the integers exactly via
    ``unnest(string_split(text, chr(10)))``.
    """
    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("").reset_index(drop=True)
        lines = s.str.split("\n")
        n_lines = lines.str.len().to_numpy(dtype="int64")
        ex = lines.explode()
        idx = np.arange(len(s))
        grp = ex.groupby(level=0)
        n_distinct = grp.nunique().reindex(idx, fill_value=0) \
            .to_numpy(dtype="int64")
        max_len = ex.str.len().groupby(level=0).max() \
            .reindex(idx, fill_value=0).to_numpy(dtype="int64")
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_lines": n_lines,
            "n_distinct_lines": n_distinct,
            "max_line_len": max_len,
            "dup_line_ratio": np.round(1.0 - n_distinct / n_lines, 6),
        })
    return ds.map_batches(stats, batch_format="pandas")


def source_summary(ds, source_col: str = "source", lang_col: str = "lang",
                   text_col: str = "text"):
    """Per-source corpus rollup, combiner-first: per-batch partials keyed
    on (source, lang) — n_docs, sum_chars — so the single grouped
    exchange moves one row per (source, lang) per batch, then a tiny
    per-source fold computes (source, n_docs, n_langs, sum_chars,
    avg_chars).  The shape every 100-TB "how big is each slice" report
    takes: nothing document-sized crosses the exchange.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame({
            "source": batch[source_col].to_numpy(),
            "lang": batch[lang_col].to_numpy(),
            "chars": batch[text_col].fillna("").str.len()
                     .to_numpy(dtype="int64")})
        return b.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("chars", "size"), sum_chars=("chars", "sum"))

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        n = int(group["n_docs"].sum())
        total = int(group["sum_chars"].sum())
        return pd.DataFrame({
            "source": [group["source"].iloc[0]],
            "n_docs": pd.Series([n], dtype="int64"),
            "n_langs": pd.Series([group["lang"].nunique()], dtype="int64"),
            "sum_chars": pd.Series([total], dtype="int64"),
            "avg_chars": [round(total / n, 2)],
        })

    return ds.map_batches(partial, batch_format="pandas") \
             .groupby("source").map_groups(fold, batch_format="pandas")


_MIX_PRIME = 2654435761          # Knuth multiplicative hash constant
_MIX_MOD = 1 << 32
_MIX_BUCKETS = 10_000


def sample_sources(ds, weights: dict[str, float], default: float = 1.0,
                   id_col: str = "doc_id", source_col: str = "source"):
    """Deterministic weighted source mixing — the data-mixing step of a
    training pipeline (keep fraction w_s of each source, stable across
    reruns/retries, no RNG state).

    A row survives iff ``(id·K mod 2³²) mod 10000 < w·10000`` with
    Knuth's multiplicative constant K — shuffle-free, vectorized, no
    RNG/float hazard.  The multiply runs in uint64: wraparound mod 2⁶⁴
    is harmless because 2³² divides 2⁶⁴, so the bucket is the exact
    mathematical ``id·K mod 2³²`` for the FULL int64 id range (an int64
    multiply would silently wrap differently above id ≈ 2³³).  The SQL
    replay (`(doc_id * K) % 4294967296`) is BIGINT and therefore only
    valid for ids < 2³³ — use HUGEINT arithmetic beyond that.  Integer
    ids only (string ids would need a portable string hash; use a
    precomputed int key column for those).
    """
    items = sorted(weights.items())
    w_keys = np.array([k for k, _ in items], dtype=object)
    w_vals = np.array([int(v * _MIX_BUCKETS) for _, v in items],
                      dtype=np.int64)
    default_i = int(default * _MIX_BUCKETS)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype=np.int64).astype(np.uint64)
        bucket = (ids * np.uint64(_MIX_PRIME) % np.uint64(_MIX_MOD)) \
            % np.uint64(_MIX_BUCKETS)
        idx = pd.Index(w_keys).get_indexer(batch[source_col].to_numpy())
        thresh = np.where(idx >= 0, w_vals[np.maximum(idx, 0)], default_i)
        return batch[bucket < thresh]

    return ds.map_batches(f, batch_format="pandas")


def _winnow_mins(text: str, window: int) -> tuple[set[str], int]:
    """Per-doc winnowing kernel shared by :func:`winnow_profile` and
    :func:`winnow_fingerprint_sets`: md5 over word 4-grams, distinct
    sliding-``window`` minima.  ONE definition on purpose — the same
    DuckDB SQL reformulation oracles both callers, so the selection
    logic must not be able to drift between them."""
    import hashlib

    tokens = (text or "").lower().split()
    grams = [" ".join(tokens[i:i + 4])
             for i in range(max(1, len(tokens) - 3))]
    hashes = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    if len(hashes) >= window:
        return {min(hashes[i:i + window])
                for i in range(len(hashes) - window + 1)}, len(hashes)
    return set(hashes), len(hashes)


def winnow_profile(ds, id_col: str = "doc_id", text_col: str = "text",
                   window: int = 8):
    """SQL-oracleable winnowing profile: md5 over word 4-grams, sliding
    ``window`` minima → (id, n_grams, n_winnow, min_gram_hash).

    Same selection logic as :func:`fingerprints` but with md5 (available
    in DuckDB) instead of crc32 and summary columns instead of the
    xor-fold, so the driver can verify the winnowing machinery against a
    pure-SQL reformulation.  Lexicographic min over hex digests ==
    numeric min over the digests' big-endian value, so the two agree.
    """
    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        n_grams, n_winnow, min_hash = [], [], []
        for text in batch[text_col]:
            mins, gram_count = _winnow_mins(text, window)
            n_grams.append(gram_count)
            n_winnow.append(len(mins))
            min_hash.append(min(mins))
        return pd.DataFrame({id_col: batch[id_col],
                             "n_grams": pd.Series(n_grams, dtype="int64"),
                             "n_winnow": pd.Series(n_winnow, dtype="int64"),
                             "min_gram_hash": min_hash})
    return ds.map_batches(fp, batch_format="pandas")


def fingerprints(ds, id_col: str = "doc_id", text_col: str = "text",
                 window: int = 8):
    """Winnowing-style rolling-hash fingerprint: min gram hash over each
    ``window`` of word 4-grams, xor-folded to one uint64 per doc.

    Token hashing is batch-global (ONE multithreaded polars hash over
    every token of the batch — no per-gram join/encode and no per-token
    Python hash calls), the 4-gram rolling combine runs in 3 vectorized
    passes per document segment, and the winnow minima / xor-fold are
    numpy reductions.  The SQL-replayable md5 variant of the same
    selection logic lives in :func:`winnow_profile` (the oracled query);
    this is the fast production kernel, so its hash family is free to
    differ."""
    from .dedup import _TOK_MIX

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl
        s = batch[text_col].fillna("").str.lower().reset_index(drop=True)
        toks = s.str.split()
        counts = toks.str.len().to_numpy()
        n_docs = len(s)
        out = np.zeros(n_docs, dtype=np.uint64)
        flat = toks.explode().dropna().to_numpy()
        th = pl.Series(flat).hash(seed=0).to_numpy() if len(flat) \
            else np.empty(0, dtype=np.uint64)
        offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        arange = np.arange(4096, dtype=np.uint64)  # grown on demand
        for i in range(n_docs):
            seg = th[offs[i]:offs[i + 1]]
            n = len(seg)
            if n == 0:
                continue  # empty doc → fingerprint 0 (one empty gram)
            k = 4 if n >= 4 else n
            m = n - k + 1
            acc = seg[:m].copy()
            for j in range(1, k):            # k-1 vectorized passes
                acc = acc * _TOK_MIX ^ seg[j:j + m]
            if m >= window:
                mins = np.lib.stride_tricks.sliding_window_view(
                    acc, window).min(axis=1)
            else:
                mins = acc
            u = np.unique(mins)
            if len(u) > len(arange):
                arange = np.arange(len(u), dtype=np.uint64)
            out[i] = np.bitwise_xor.reduce(
                u << (arange[:len(u)] % np.uint64(32)))
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "fingerprint": out})
    return ds.map_batches(fp, batch_format="pandas")


_INDEX_TOKEN_RE = re.compile(r"[a-z]+")


def build_inverted_index(ds, id_col: str = "doc_id", text_col: str = "text",
                         min_df: int = 2, max_df: int | None = None):
    """Postings of an inverted index: one (token, doc) row per distinct
    occurrence, kept only for tokens whose document frequency lies in
    [min_df, max_df] — the df band is how real index builds drop hapaxes
    (noise) and stopword-frequency terms (posting lists that would hold
    the whole corpus).

    ONE grouped exchange: per-batch vectorized explode + in-batch
    distinct (documents are unique by id, so in-batch distinct IS global
    distinct), then ``groupby(token)`` — each group holds exactly the
    token's posting list, emitted only if its length is in band.  The
    df cap is also the skew guard: no group larger than max_df rows ever
    leaves the final stage.
    """
    max_df_eff = max_df  # None = unbounded

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower() \
            .str.findall(_INDEX_TOKEN_RE)
        out = pd.DataFrame({
            id_col: batch[id_col].to_numpy().repeat(toks.str.len()),
            "token": np.concatenate(toks.to_numpy())
                     if len(batch) else np.array([], dtype=object)})
        return out.drop_duplicates()

    posts = ds.map_batches(explode, batch_format="pandas")

    def band(group: pd.DataFrame) -> pd.DataFrame:
        df_ = len(group)
        if df_ < min_df or (max_df_eff is not None and df_ > max_df_eff):
            return group.iloc[0:0]
        return group[["token", id_col]]

    return posts.groupby("token").map_groups(band, batch_format="pandas")


def _tfidf_score_frame(m: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """The ONE copy of the integer-exact scoring expression (shared by
    the distributed ``score`` stage and the single-task kernel, so the
    byte-equality contract can't drift between them)."""
    tf_ = m["tf"].to_numpy(dtype=np.int64)
    df_ = m["df"].to_numpy(dtype=np.int64)
    return pd.DataFrame({
        id_col: m[id_col].to_numpy(),
        "term": m["term"].to_numpy(),
        "tf": tf_,
        "df": df_,
        "score_scaled": tf_ * 1_000_000 // df_,
    })


def _tfidf_finish_kernel(tf: pd.DataFrame, *, k: int,
                         id_col: str) -> pd.DataFrame:
    """``tfidf_top_terms``' post-tf stages in one frame (single-task
    fast path): global df counts, integer score, top-k per doc with
    ascending-term tiebreak — identical to the df exchange + term
    hash-join + ``topk_per_group`` it stands in for."""
    if "term" not in tf.columns or not len(tf):
        # zero-block materialized tf reaches the kernel column-less;
        # an empty-with-columns tf keeps its id dtype (string doc ids
        # must not demote to int64 in the empty output)
        id_dtype = tf[id_col].dtype if id_col in tf.columns else "int64"
        return pd.DataFrame({
            id_col: pd.Series(dtype=id_dtype),
            "term": pd.Series(dtype="object"),
            "tf": pd.Series(dtype="int64"),
            "df": pd.Series(dtype="int64"),
            "score_scaled": pd.Series(dtype="int64")})
    df = tf.groupby("term", as_index=False).agg(df=(id_col, "size"))
    scored = _tfidf_score_frame(tf.merge(df, on="term"), id_col)
    out = scored.sort_values(["score_scaled", "term"],
                             ascending=[False, True]) \
        .groupby(id_col, as_index=False, sort=False).head(k)
    return out.reset_index(drop=True)


def tfidf_top_terms(ds, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text",
                    num_buckets: int | None = None,
                    small_corpus_max_docs: int | None = None):
    """Integer-exact TF-IDF: top-k terms per document scored by
    ``tf * 1_000_000 // df`` (monotone in the tf/idf ratio, no float in
    the compare, so a SQL oracle replays the ranking bit-for-bit).

    Shuffle budget at 100 TB:

    - tf needs NO exchange: a document is one input row, so a per-batch
      ``groupby([id, term]).size`` IS the global term frequency.
    - df is ONE grouped exchange over per-batch partials — one
      (term, n_docs) row per term per batch crosses the wire, never the
      postings.
    - tf ⋈ df is the partitioned ``hash_join`` on the term (vocab-scale
      build side, corpus-scale probe side, bucketed on a vectorized
      string hash).
    - the final top-k is the combiner-first :func:`~.stats.topk_per_group`
      (≤ k rows per doc per block cross its exchange).

    Ties break by ascending term so output is layout-independent.
    """
    from ray.data.aggregate import Sum

    from .joins import hash_join
    from .stats import topk_per_group

    def tf_partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("").reset_index(drop=True)
        toks = s.str.lower().str.findall(_INDEX_TOKEN_RE)
        ids = batch[id_col].to_numpy()
        frame = pd.DataFrame({
            id_col: ids.repeat(toks.str.len()),
            "term": np.concatenate(toks.to_numpy())
                    if len(batch) else np.array([], dtype=object)})
        return frame.groupby([id_col, "term"], as_index=False) \
                    .agg(tf=("term", "size"))

    tf = ds.map_batches(tf_partial, batch_format="pandas")

    # small-input fast path (dedup_local docstring): tf extraction (the
    # CPU-heavy leg) stays a distributed map_batches; the df exchange,
    # term hash-join and top-k exchange collapse into ONE task with
    # identical integer-exact semantics (byte-equality pinned by tests)
    from .dedup_local import SMALL_CORPUS_MAX_DOCS, solve_in_task_n
    from .joins import estimate_rows
    if small_corpus_max_docs is None:
        small_corpus_max_docs = SMALL_CORPUS_MAX_DOCS
    est = estimate_rows(ds)
    if small_corpus_max_docs and est is not None \
            and est <= small_corpus_max_docs:
        return solve_in_task_n(_tfidf_finish_kernel, [tf.materialize()],
                               k=k, id_col=id_col)

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("term", as_index=False).agg(df=(id_col, "size"))

    df = tf.map_batches(df_partial, batch_format="pandas") \
           .groupby("term").aggregate(Sum("df", alias_name="df"))

    joined = hash_join(tf, df, on="term", num_buckets=num_buckets)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        return _tfidf_score_frame(batch, id_col)

    scored = joined.map_batches(score, batch_format="pandas")
    return topk_per_group(scored, key_col=id_col, order_col="score_scaled",
                          k=k, tiebreak_col="term")


_PII_EMAIL = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_PII_IPV4 = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
_PII_PHONE = re.compile(r"\+\d{7,15}")


class PiiRedactor:
    """PII scrub (emails → <EMAIL>, IPv4 → <IP>, +international phones →
    <PHONE>) — the privacy pass of a pre-training pipeline.

    Actor-pool stage: patterns compile once per actor; each batch is
    three vectorized ``Series.str`` passes (C regex loops).  Counts are
    taken SEQUENTIALLY (emails on the raw text, IPs on the
    email-redacted text, phones after both) so they compose exactly the
    way the replacements do — and so a SQL oracle nesting
    ``regexp_replace`` reproduces both the text and the counts.  The
    patterns are RE2-compatible by construction (no backrefs or
    lookaround), which keeps Python and DuckDB semantics identical.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n_emails = s.str.count(_PII_EMAIL).astype("int64")
        s = s.str.replace(_PII_EMAIL, "<EMAIL>", regex=True)
        n_ips = s.str.count(_PII_IPV4).astype("int64")
        s = s.str.replace(_PII_IPV4, "<IP>", regex=True)
        n_phones = s.str.count(_PII_PHONE).astype("int64")
        s = s.str.replace(_PII_PHONE, "<PHONE>", regex=True)
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "clean_text": s.to_numpy(),
            "n_emails": n_emails.to_numpy(),
            "n_ips": n_ips.to_numpy(),
            "n_phones": n_phones.to_numpy(),
        })


def redact_pii(ds, concurrency: int = 4, **kwargs):
    return ds.map_batches(PiiRedactor, fn_constructor_kwargs=kwargs,
                          batch_format="pandas", concurrency=concurrency,
                          num_cpus=0.5)


def normalize_series(s: pd.Series) -> pd.Series:
    """The shared NFC → lower → whitespace-collapse → strip kernel (step
    order is load-bearing: the DuckDB oracles replay it verbatim).  NFC
    only where needed — ASCII rows are NFC by definition, which keeps
    the common 100-TB path allocation-free."""
    import unicodedata

    s = s.fillna("")
    ascii_mask = ~s.str.contains(r"[^\x00-\x7f]", regex=True)
    if not ascii_mask.all():
        fixed = s[~ascii_mask].map(
            lambda t: unicodedata.normalize("NFC", t))
        s = s.copy()
        s[~ascii_mask] = fixed
    return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()


def normalize_text(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Canonical text normalization — the first prep pass of a training
    pipeline: Unicode NFC, default lowercase, whitespace collapsed to
    single spaces, ends trimmed.  Vectorized (one C-regex pass per
    batch; NFC via a str accessor only when the batch actually contains
    non-ASCII, which keeps the common 100-TB path allocation-free).
    Emits (id, norm_text, n_chars_norm); the steps mirror DuckDB's
    ``nfc_normalize``/``lower``/``regexp_replace`` so the oracle
    replays them in the same order.
    """
    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        s = normalize_series(batch[text_col])
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "norm_text": s.to_numpy(),
            "n_chars_norm": s.str.len().to_numpy(dtype="int64"),
        })

    return ds.map_batches(norm, batch_format="pandas")


def winnow_fingerprint_sets(ds, id_col: str = "doc_id",
                            text_col: str = "text", window: int = 8):
    """Exploded winnowing fingerprints: one (id, fp) row per DISTINCT
    window-min md5 gram hash per document — the joinable form of
    :func:`winnow_profile` (same selection logic, so the same SQL
    reformulation replays it row for row)."""
    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        ids, fps = [], []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            mins, _ = _winnow_mins(text, window)
            ids.extend([doc_id] * len(mins))
            fps.extend(sorted(mins))
        return pd.DataFrame({id_col: ids, "fp": fps})
    return ds.map_batches(fp, batch_format="pandas")


def winnow_dedup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                       window: int = 8, min_shared: int = 2,
                       max_df: int = 64, num_buckets: int | None = None):
    """Shared-substring near-dup pairs: documents sharing ≥ ``min_shared``
    winnowing fingerprints — the containment-sensitive complement to
    MinHash (a long verbatim excerpt shares window minima even when
    whole-document Jaccard is low).

    Scale shape: fingerprints explode to slim (id, fp) rows;
    fingerprints with document frequency outside [2, ``max_df``] are
    dropped INSIDE the first bucketed exchange (boilerplate phrases are
    stop-fingerprints, exactly the inverted-index df band), which bounds
    every pair expansion at ``max_df``²/2; a vectorized self-merge emits
    the pairs; a second bucketed exchange sums shared-fp counts per
    pair.  Two exchanges total, both over slim rows, every group
    bounded.
    """
    from .joins import _bucket_of, auto_buckets

    fps = winnow_fingerprint_sets(ds, id_col=id_col, text_col=text_col,
                                  window=window)
    if num_buckets is None:
        num_buckets = auto_buckets(fps, rows_per_bucket=100_000,
                                   fallback=64)

    def add_fp_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_bucket"] = _bucket_of(batch["fp"], num_buckets)
        return batch

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        df_per_fp = group.groupby("fp")[id_col].transform("size")
        kept = group[(df_per_fp >= 2) & (df_per_fp <= max_df)]
        if not len(kept):
            return pd.DataFrame({"doc_a": pd.Series([], dtype=group[id_col].dtype),
                                 "doc_b": pd.Series([], dtype=group[id_col].dtype),
                                 "shared": pd.Series([], dtype="int64")})
        m = kept.merge(kept, on="fp", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = m.groupby([f"{id_col}_a", f"{id_col}_b"], as_index=False) \
            .agg(shared=("fp", "size"))
        return out.rename(columns={f"{id_col}_a": "doc_a",
                                   f"{id_col}_b": "doc_b"})

    partial = fps.map_batches(add_fp_bucket, batch_format="pandas") \
        .groupby("_bucket").map_groups(bucket_pairs, batch_format="pandas")

    def add_pair_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_bucket"] = _bucket_of(
            batch["doc_a"].astype(str) + "|" + batch["doc_b"].astype(str),
            num_buckets)
        return batch

    def fold_pairs(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby(["doc_a", "doc_b"], as_index=False) \
            .agg(shared=("shared", "sum"))
        return out[out["shared"] >= min_shared]

    return partial.map_batches(add_pair_bucket, batch_format="pandas") \
        .groupby("_bucket").map_groups(fold_pairs, batch_format="pandas")
