"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (+ the training-data additions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query (same column names,
so the driver's order-insensitive value-hash compare holds).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_STOP_SQL = "['the','and','of','to','a','in','is','it','that','for','with','on','as','at','by','this','from','or','an','be']"


def _sw_sql(lang: str) -> str:
    from rdfa_streaming_parser_js_ray.stages.text import _STOPWORDS
    return "[" + ",".join(f"'{w}'" for w in sorted(_STOPWORDS[lang])) + "]"


_SW_EN, _SW_ES, _SW_FR, _SW_DE = (_sw_sql(s) for s in ("en", "es", "fr", "de"))

# the SQL replay of the constructed KG (kg_construct's oracle), shared by
# the follow-on graph-pattern query's oracle
_KG_SQL = """
            WITH d AS (SELECT doc_id AS i, text, lang, source FROM documents),
            prim AS (SELECT 'http://data.example/doc/' || CAST(i AS VARCHAR)
                            AS subj, * FROM d)
            SELECT subj, 'http://purl.org/dc/terms/title' AS pred,
                   'literal' AS obj_kind, text AS obj_value,
                   lang AS obj_lang, '' AS obj_datatype
            FROM prim
            UNION ALL
            SELECT subj, 'http://purl.org/dc/terms/source' AS pred,
                   'iri' AS obj_kind,
                   'http://data.example/src/' || source AS obj_value,
                   '' AS obj_lang, '' AS obj_datatype
            FROM prim
            UNION ALL
            SELECT subj, 'http://purl.org/dc/terms/identifier' AS pred,
                   'literal' AS obj_kind, 'doc' || CAST(i AS VARCHAR) AS obj_value,
                   lang AS obj_lang, '' AS obj_datatype
            FROM prim
"""


# --------------------------------------------------------------------- #
# helpers

def _wrapped_docs(sf_dir: str):
    from rdfa_streaming_parser_js_ray.sources.documents import documents_from_sf_table
    return documents_from_sf_table(sf_dir)



def _pin_broadcast(obj):
    """ray.put + session-lifetime pin (state/broadcast.py): an actor pool
    whose constructor kwargs hold an ObjectRef cannot restart if the ref
    dies during the pool's asynchronous teardown (ray#53727) — pinning
    closes that per-query crash window in the 77-query driver session."""
    from rdfa_streaming_parser_js_ray.state.broadcast import pin_broadcast
    return pin_broadcast(obj)

def _sf_documents(sf_dir: str):
    from rdfa_streaming_parser_js_ray.sources.documents import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])


# Session-scoped materialized-view reuse: several registered queries
# derive from the SAME deterministic intermediate (the RDFa extraction
# and the flagship canonical-triple table), and the driver's gate runs
# all ~80 queries sequentially in one Ray session — recomputing the
# full KG pipeline per consumer is pure redundant wall (round-5 gate-
# latency work; the round-4 artifact was cut off mid-suite).  The memo
# holds the MATERIALIZED dataset (object-store blocks, spillable), is
# keyed by sf_dir, and only short-circuits byte-identical recomputes —
# every query is unchanged when called in a fresh session.  Checkpoint
# -writing runs (kg_lineage, kg_incremental) stay un-memoized: their
# side effects ARE the query.
_MEMO: dict[tuple, Any] = {}


def _memoized(key: tuple, build):
    if key not in _MEMO:
        _MEMO[key] = build().materialize()
    return _MEMO[key]


def _extract(sf_dir: str):
    from rdfa_streaming_parser_js_ray.stages.extract import extract_triples
    return _memoized(("extract", sf_dir),
                     lambda: extract_triples(_wrapped_docs(sf_dir)))


def _kg_triples(sf_dir: str):
    """Canonical triples of the flagship pipeline (no checkpoint dir),
    shared by kg_construct / bgp_titles via the session memo."""
    from rdfa_streaming_parser_js_ray.pipelines.kg import construct_kg

    def build():
        triples, _metrics = construct_kg(_wrapped_docs(sf_dir))
        return triples

    return _memoized(("kg", sf_dir), build)


# --------------------------------------------------------------------- #
# queries

def q_rdfa_extract(sf_dir: str):
    """Distributed RDFa extraction over the interleaved-span wrapping of the
    documents table (SURVEY.md §2.2 — the whole reference engine)."""
    return _extract(sf_dir).select_columns(
        ["doc_id", "subj", "pred", "obj_kind", "obj_value", "obj_lang"])


def q_rdfa_triple_counts(sf_dir: str):
    """Triples per document (metrics aggregation, SURVEY.md §2.6)."""
    from ray.data.aggregate import Count
    return _extract(sf_dir).groupby("doc_id").aggregate(Count(alias_name="n_triples"))


def q_kg_construct(sf_dir: str):
    """Flagship: extract → mentions → link → canonicalize → dedup."""
    triples = _kg_triples(sf_dir)
    return triples.select_columns(
        ["subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"])


def q_kg_lineage(sf_dir: str):
    """Per-partition lineage of a checkpointed flagship run (north_rule:
    'checkpoints per-partition triple outputs with lineage + throughput
    metrics') surfaced as a queryable table — one row per partition with
    its row count and the input fingerprint that wrote it.  Rows-only
    (the partition key is a pandas uint64 hash, not SQL-replayable);
    tests pin sum(rows) == total canonical triples and key coverage."""
    import re
    import shutil

    import ray.data as rd

    from rdfa_streaming_parser_js_ray.pipelines.kg import construct_kg
    from rdfa_streaming_parser_js_ray.state.checkpoints import (
        completed_partitions,
    )
    out = "/tmp/kg_lineage_" + re.sub(r"[^A-Za-z0-9]+", "_", sf_dir)
    try:
        construct_kg(_wrapped_docs(sf_dir), out_dir=out,
                     input_fingerprint=f"lineage-{sf_dir}")
        rows = [{"part_key": k, "rows": m["rows"],
                 "input_fingerprint": m["input_fingerprint"]}
                for k, m in sorted(completed_partitions(out).items())]
    finally:
        # scratch checkpoints must not accumulate across a 75-query
        # driver session (session-survival hygiene, round-4 item #1)
        shutil.rmtree(out, ignore_errors=True)
    return rd.from_items(rows)


def q_kg_incremental(sf_dir: str):
    """Incremental re-ingest correctness, driver-visible: build the KG
    once (checkpoint + doc manifest), then run
    ``construct_kg_incremental`` of the SAME corpus against it (delta 0
    — nothing re-parses; the global tail reruns) and return its triples.
    The oracle is the SAME SQL as `kg_construct`: an increment must be
    indistinguishable from a full rebuild.  (Perturbed-delta equality is
    pinned bit-for-bit by the pytest suite; the sf tables are fixed so a
    perturbation can't be SQL-replayed here.)"""
    import re
    import shutil

    from rdfa_streaming_parser_js_ray.pipelines.kg import (
        construct_kg, construct_kg_incremental,
    )
    prev = "/tmp/kg_inc_prev_" + re.sub(r"[^A-Za-z0-9]+", "_", sf_dir)
    out = "/tmp/kg_inc_next_" + re.sub(r"[^A-Za-z0-9]+", "_", sf_dir)
    try:
        construct_kg(_wrapped_docs(sf_dir), out_dir=prev,
                     input_fingerprint=f"inc-prev-{sf_dir}")
        triples, _metrics = construct_kg_incremental(
            _wrapped_docs(sf_dir), out, prev_dir=prev,
            input_fingerprint=f"inc-next-{sf_dir}")
        # pin the result to driver-local Arrow BEFORE deleting the
        # checkpoint dirs the dataset may lazily read from; the result
        # is correctness-gate-sized (the driver materializes it anyway)
        result = triples.select_columns(
            ["subj", "pred", "obj_kind", "obj_value", "obj_lang",
             "obj_datatype"]).to_pandas()
    finally:
        shutil.rmtree(prev, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
    # re-wrap so every queries() entry returns a Dataset (the pandas
    # hop above is only the driver-local pin against the rmtree race)
    import ray.data as _rd
    return _rd.from_pandas(result)


def q_exact_dedup(sf_dir: str):
    from rdfa_streaming_parser_js_ray.stages.dedup import exact_dedup
    return exact_dedup(_sf_documents(sf_dir))


def q_dedup_corpus(sf_dir: str):
    """Exact dedup emitting the surviving rows (the deduped corpus)."""
    from rdfa_streaming_parser_js_ray.stages.dedup import exact_dedup_rows
    return exact_dedup_rows(_sf_documents(sf_dir)) \
        .select_columns(["doc_id", "text"])


def q_corpus_prep(sf_dir: str):
    """Second flagship: full training-data prep (exact dedup → MinHash
    near-dup removal → quality filter → deterministic split).

    NOW ORACLED end to end: DuckDB replays every stage — smallest-id-per
    md5(text) dedup, near-dup victims via exact all-pairs 3-gram Jaccard
    ≥ 0.8 (the LSH is a candidate *accelerator*; at this corpus's
    planted similarities its miss probability is ~1e-26, and the seeded
    pipeline is deterministic), the quality filter's integer/ratio
    arithmetic, and the doc_id-modulo split."""
    from rdfa_streaming_parser_js_ray.pipelines.prep import prepare_corpus
    final, _metrics = prepare_corpus(_sf_documents(sf_dir))
    return final.select_columns(["doc_id", "split"])


def q_corpus_prep_full(sf_dir: str):
    """The WHOLE training-data prep chain with every optional stage on:
    normalize → exact dedup → near-dup removal → benchmark
    decontamination → quality filter → split — oracled end to end
    (DuckDB replays normalization, normalized-text dedup, exact Jaccard
    victims, gram-overlap contamination, quality arithmetic, and the
    modulo split).  The benchmark side is the doc_id % 97 == 3 slice;
    gram extraction is normalization-invariant (lower + \\S+ tokens), so
    the raw slice and its normalized twin share grams."""
    import numpy as np
    import pyarrow as pa
    from rdfa_streaming_parser_js_ray.pipelines.prep import prepare_corpus

    docs = _sf_documents(sf_dir)

    def bench_slice(batch):
        mask = batch["doc_id"].to_numpy() % 97 == 3
        return batch.filter(pa.array(mask))

    bench = docs.map_batches(bench_slice, batch_format="pyarrow")
    final, _metrics = prepare_corpus(docs, normalize=True,
                                     decontam_bench_ds=bench)
    return final.select_columns(["doc_id", "split"])


def q_token_counts(sf_dir: str):
    from rdfa_streaming_parser_js_ray.stages.text import token_counts
    return token_counts(_sf_documents(sf_dir))


def q_bpe_token_counts(sf_dir: str):
    from rdfa_streaming_parser_js_ray.stages.text import bpe_ish_token_counts
    return bpe_ish_token_counts(_sf_documents(sf_dir))


def q_quality(sf_dir: str):
    from rdfa_streaming_parser_js_ray.stages.text import quality_scores
    return quality_scores(_sf_documents(sf_dir)).select_columns(
        ["doc_id", "n_chars", "n_words", "n_punct", "n_distinct", "n_stop"])


def q_quality_melt(sf_dir: str):
    """Wide→long unpivot (melt): the five integer quality metrics as
    (doc_id, metric, value) rows — the layout a metrics store or
    per-metric distribution job wants.  Pure map (pd.melt per batch,
    5× row fan-out, no exchange); the oracle is the portable UNION-ALL
    unpivot."""
    import pandas as pd
    from rdfa_streaming_parser_js_ray.stages.text import quality_scores

    cols = ["n_chars", "n_words", "n_punct", "n_distinct", "n_stop"]
    q = quality_scores(_sf_documents(sf_dir)).select_columns(
        ["doc_id"] + cols)

    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.melt(id_vars="doc_id", value_vars=cols,
                         var_name="metric", value_name="value")
        out["value"] = out["value"].astype("int64")
        return out

    return q.map_batches(melt, batch_format="pandas")


def q_cumulative_spend(sf_dir: str):
    """Per-key UNBOUNDED running total + ordinal (ROW_NUMBER + SUM OVER
    ROWS UNBOUNDED PRECEDING): each order's 1-based sequence number
    within its customer and the customer's cumulative spend in integer
    cents through that order, ordered by (o_orderdate, o_orderkey).
    Distribution shape = the rolling_features bucketed fold (keys hash
    into bounded uniform buckets, ONE grouped exchange, vectorized
    grouped cumsum/cumcount per bucket); the frame is unbounded instead
    of trailing-k."""
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.windows import running_per_key

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"])
    return running_per_key(orders, key_col="o_custkey",
                           order_cols=["o_orderdate", "o_orderkey"],
                           value_col="o_totalprice")


def q_sources_with_en_not_de(sf_dir: str):
    """Distributed EXCEPT: sources with at least one English document and
    NO German one.  The INTERSECT twin (sources_with_en_and_de) with the
    one comparison flipped: per-batch distinct-pair combiner, ONE
    co-grouped fold keeping keys present on the left side only."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.loc[batch["lang"].isin(["en", "de"])]
        return b.drop_duplicates(["source", "lang"])[["source", "lang"]]

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        d = group.drop_duplicates(["source", "lang"])
        langs = d.groupby("source")["lang"].agg(set)
        keep = langs.index[langs.apply(lambda s: "en" in s and "de" not in s)]
        return pd.DataFrame({"source": keep})

    return bucketed_fold(docs.map_batches(partial, batch_format="pandas"),
                         "source", fold, num_buckets=16)


def q_party_balances(sf_dir: str):
    """UNION ALL across two tables (the Dataset.union shape at the query
    level): customer and supplier account balances align to one slim
    schema (nationkey, cents, is_cust) inside each side's scan, the two
    streams union WITHOUT a barrier, a per-batch combiner reduces to one
    row per nation per block, and one tiny grouped exchange finishes
    (nationkey, n_customers, n_suppliers, total_bal_cents)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def align(nat_col: str, bal_col: str, is_cust: int):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "nationkey": batch[nat_col].to_numpy().astype("int64"),
                "cents": np.rint(batch[bal_col].to_numpy() * 100)
                           .astype("int64"),
                "is_cust": np.int64(is_cust),
            })
        return fn

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_nationkey", "c_acctbal"]) \
        .map_batches(align("c_nationkey", "c_acctbal", 1),
                     batch_format="pandas")
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_nationkey", "s_acctbal"]) \
        .map_batches(align("s_nationkey", "s_acctbal", 0),
                     batch_format="pandas")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("nationkey", as_index=False).agg(
            n_customers=("is_cust", "sum"),
            n_rows=("is_cust", "size"),
            total_bal_cents=("cents", "sum"))

    out = cust.union(supp).map_batches(partial, batch_format="pandas") \
        .groupby("nationkey").aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("n_rows", alias_name="n_rows"),
            Sum("total_bal_cents", alias_name="total_bal_cents"))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "nationkey": batch["nationkey"].astype("int64"),
            "n_customers": batch["n_customers"].astype("int64"),
            "n_suppliers": (batch["n_rows"] - batch["n_customers"])
                             .astype("int64"),
            "total_bal_cents": batch["total_bal_cents"].astype("int64"),
        })
    return out.map_batches(finish, batch_format="pandas")


def q_balance_deciles(sf_dir: str):
    """Global NTILE(10) over customer balances without a global sort:
    exact global ranks from a value-range partition + driver prefix over
    per-range counts (stages/stats.global_ntile), reduced to one summary
    row per decile."""
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.stats import global_ntile

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_acctbal", "c_custkey"])
    return global_ntile(cust, value_col="c_acctbal",
                        tiebreak_col="c_custkey", n_tiles=10)


def q_order_date_ranks(sf_dir: str):
    """RANK and DENSE_RANK per key (ties SHARE a rank — the window shape
    ROW_NUMBER can't express): each order's rank of its date within its
    customer, gapped and dense.  Same ONE bucketed-fold exchange as
    cumulative_spend; the per-bucket pass is pandas' C-implemented
    grouped ``rank(method='min'/'dense')`` on the date column."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        by_key = group.groupby("o_custkey", sort=False)["o_orderdate"]
        return pd.DataFrame({
            "o_custkey": group["o_custkey"],
            "o_orderkey": group["o_orderkey"],
            "date_rank": by_key.rank(method="min").astype("int64"),
            "date_dense_rank": by_key.rank(method="dense").astype("int64"),
        })

    from rdfa_streaming_parser_js_ray.stages.joins import auto_buckets
    return bucketed_fold(orders, "o_custkey", fold,
                         num_buckets=auto_buckets(orders,
                                                  rows_per_bucket=131_072,
                                                  fallback=64))


def q_daily_order_vs_ship(sf_dir: str):
    """FULL OUTER reconciliation across two fact tables: per-day order
    counts vs per-day shipped-line counts, keeping days present in
    EITHER table at zero on the other side.  The efficient plan for a
    full outer join of two AGGREGATES is a union-aggregate: each scan
    reduces to one row per day per batch (combiner), the tagged partials
    union without a barrier, and ONE tiny grouped exchange finishes both
    sums — the oracle spells the same result as FULL OUTER JOIN +
    COALESCE."""
    import pandas as pd
    import ray.data as rd

    def per_day(ts_col: str, out_col: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            g = batch[ts_col].dt.floor("D").value_counts().sort_index()
            counts = g.to_numpy().astype("int64")
            zero = np.zeros(len(g), dtype="int64")
            # FIXED column order on both union sides (don't rely on the
            # exchange aligning blocks by name)
            return pd.DataFrame({
                "day": g.index,
                "n_orders": counts if out_col == "n_orders" else zero,
                "n_ship": counts if out_col == "n_ship" else zero,
            })
        return fn

    import numpy as np

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate"]) \
        .map_batches(per_day("o_orderdate", "n_orders"),
                     batch_format="pandas")
    ships = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_shipdate"]) \
        .map_batches(per_day("l_shipdate", "n_ship"),
                     batch_format="pandas")

    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("day", as_index=False).agg(
            n_orders=("n_orders", "sum"), n_ship=("n_ship", "sum"))
        g["n_orders"] = g["n_orders"].astype("int64")
        g["n_ship"] = g["n_ship"].astype("int64")
        return g

    # bucketed fold, not ds.groupby("day"): Ray's sort-based exchange on
    # a timestamp key measured 14.0 s for 43k partial rows vs 0.3 s here;
    # partials are bounded by days x blocks, so buckets scale with the
    # day domain (~1 row per day per block crosses the wire)
    from rdfa_streaming_parser_js_ray.stages.joins import auto_buckets
    return bucketed_fold(orders.union(ships), "day", fold,
                         num_buckets=auto_buckets(
                             orders, ships, rows_per_bucket=1_048_576,
                             fallback=64))


def q_price_corr_stats(sf_dir: str):
    """Single-pass distributed correlation/covariance sufficient
    statistics: per returnflag, the exact integer moments (n, Σq, Σp,
    Σq², Σp², Σqp) of (quantity units, price dollars) from which
    Pearson r, covariance and both variances derive driver-side — the
    one-scan numeric-profiling shape.  Quantities round to integer
    units and prices to integer dollars so every moment is exact int64
    (Σp² bounds the scale: dollars² keeps ~10¹⁰/row, safe past 10⁸
    rows; a 100 TB run promotes the quadratic moments to float or
    128-bit)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def moments(batch: pd.DataFrame) -> pd.DataFrame:
        # both inputs carry exactly 2 decimals, so cents are exact;
        # units/dollars round HALF-AWAY-FROM-ZERO from cents (x.50
        # happens) to match SQL ROUND — np.rint's half-to-even drifts
        # on every .50 (the randomized sweep caught quantities doing
        # exactly that at seed 12000); sign-split so negative halves
        # also go away from zero (-1.50 → -2, not -1)
        def half_up(col: str) -> np.ndarray:
            cents = np.rint(batch[col].to_numpy() * 100).astype("int64")
            return np.sign(cents) * ((np.abs(cents) + 50) // 100)

        q = half_up("l_quantity")
        p = half_up("l_extendedprice")
        d = pd.DataFrame({"l_returnflag": batch["l_returnflag"],
                          "n": np.int64(1), "sum_q": q, "sum_p": p,
                          "sum_qq": q * q, "sum_pp": p * p,
                          "sum_qp": q * p})
        return d.groupby("l_returnflag", as_index=False).sum()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"]) \
        .map_batches(moments, batch_format="pandas")

    out = li.groupby("l_returnflag").aggregate(
        *[Sum(c, alias_name=c)
          for c in ("n", "sum_q", "sum_p", "sum_qq", "sum_pp", "sum_qp")])

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("n", "sum_q", "sum_p", "sum_qq", "sum_pp", "sum_qp"):
            batch[c] = batch[c].astype("int64")
        return batch
    return out.map_batches(finish, batch_format="pandas")


def q_funnel_users(sf_dir: str,
                   steps: tuple[str, ...] = ("click", "view", "purchase")):
    """Ordered event-pattern match per key (the MATCH_RECOGNIZE /
    funnel shape): users whose event stream contains the step types at
    STRICTLY increasing timestamps, with the earliest such chain's
    timestamps.  Greedy earliest-step matching is provably optimal for
    subsequence existence, so the fold is one vectorized grouped min
    per step (tᵢ = min ts of step i with ts > tᵢ₋₁) — no per-row loop;
    one bucketed exchange on user_id.  Equal-timestamp events NEVER
    chain (strict >) — the tie convention the dedicated stage test
    pins."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[batch["event_type"].isin(steps)]

    def step_min(df: pd.DataFrame, etype: str,
                 after: pd.Series | None) -> pd.Series:
        e = df.loc[df["event_type"] == etype, ["user_id", "ts"]]
        if after is not None:
            prev = e["user_id"].map(after)
            e = e.loc[prev.notna() & (e["ts"] > prev)]
        return e.groupby("user_id")["ts"].min()

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        t = None
        mins = []
        for s in steps:
            t = step_min(group, s, t)
            mins.append(t)
        out = pd.DataFrame({"user_id": mins[-1].index,
                            f"t_{steps[-1]}": mins[-1].to_numpy()})
        for s, m in zip(steps[:-1], mins[:-1]):
            out[f"t_{s}"] = out["user_id"].map(m)
        return out[["user_id"] + [f"t_{s}" for s in steps]]

    from rdfa_streaming_parser_js_ray.stages.joins import auto_buckets
    return bucketed_fold(ev.map_batches(partial, batch_format="pandas"),
                         "user_id", fold,
                         num_buckets=auto_buckets(ev,
                                                  rows_per_bucket=131_072,
                                                  fallback=64))


def q_latest_events(sf_dir: str):
    """Latest-record compaction (the CDC/upsert shape, SQL DISTINCT ON
    ... ORDER BY ts DESC): per (user_id, event_type), the single most
    recent event row, timestamp ties broken by highest event_id.  The
    per-batch combiner keeps ONE row per key per block (sort +
    drop_duplicates — both C kernels), so the single bucketed exchange
    moves at most |keys| rows per block regardless of history depth;
    the fold re-applies the same selection."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "event_id",
                                  "ts", "value"])

    def latest(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["ts", "event_id"], ascending=False) \
            .drop_duplicates(["user_id", "event_type"])

    from rdfa_streaming_parser_js_ray.stages.joins import auto_buckets
    return bucketed_fold(ev.map_batches(latest, batch_format="pandas"),
                         ["user_id", "event_type"], latest,
                         num_buckets=auto_buckets(ev,
                                                  rows_per_bucket=131_072,
                                                  fallback=64))


def q_hourly_user_load(sf_dir: str):
    """Per-key TIME-range trailing window (RANGE frame, not ROWS): for
    each distinct (user, ts), the sum/count of event values in the
    trailing hour INCLUSIVE of both the window start and all equal-ts
    peers — the load/velocity feature real-time risk systems compute.
    See stages/windows.time_range_sum_per_key for why peers force the
    collapse-to-distinct-ts shape."""
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.windows import (
        time_range_sum_per_key,
    )

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    return time_range_sum_per_key(ev, window="1h")


def q_lang_len_quartiles(sf_dir: str):
    """GROUPED NTILE (windowed order statistics per partition key):
    quartiles of document length within each language, reduced to one
    summary row per (lang, tile).  Unlike balance_deciles' global
    ranks (range partition + prefix offsets), the grouped variant needs
    no cross-bucket coordination at all: every key's rows co-locate in
    its bucket, so the exact per-key NTILE is one vectorized pass —
    sort, grouped cumcount, the shared remainder-spread tile formula
    (stages/stats.ntile_of_rank)."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold
    from rdfa_streaming_parser_js_ray.stages.stats import ntile_of_rank

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "n_chars", "doc_id"])

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["lang", "n_chars", "doc_id"]) \
            .reset_index(drop=True)
        by = g.groupby("lang", sort=False)
        n = by["doc_id"].transform("size").to_numpy()
        rank = by.cumcount().to_numpy()
        g["tile"] = ntile_of_rank(rank, n, n_tiles=4)
        out = g.groupby(["lang", "tile"], as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"),
            min_chars=("n_chars", "min"), max_chars=("n_chars", "max"))
        for c in ("n_docs", "sum_chars", "min_chars", "max_chars"):
            out[c] = out[c].astype("int64")
        return out

    return bucketed_fold(docs, "lang", fold, num_buckets=16)


def q_customer_order_counts(sf_dir: str):
    """LEFT OUTER partitioned hash join: every customer with their order
    count and spend, customers with NO orders kept at zero.  The orders
    side pre-aggregates to one row per custkey inside the scan (combiner
    — only unique keys cross the wire), the left join is the same ONE
    bucketed exchange as join_hash with unmatched left rows NULL-padded,
    and the zero-fill is a map.  Registry gap this closes: every prior
    join query was inner/semi/anti/as-of/range — none kept unmatched
    left rows."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame({
            "c_custkey": batch["o_custkey"].to_numpy(),
            "n_orders": 1,
            "spend_cents": (batch["o_totalprice"].to_numpy() * 100)
                             .round().astype("int64"),
        })
        return b.groupby("c_custkey", as_index=False).agg(
            n_orders=("n_orders", "sum"), spend_cents=("spend_cents", "sum"))

    counts = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"]) \
        .map_batches(partial, batch_format="pandas")

    # fuse the count finish + left join + zero-fill into the join's ONE
    # bucketed exchange (the large_volume_customers rework pattern):
    # customer rows ride with NULL metric columns, order partials with
    # NULL names; the per-bucket fold finishes the per-key sums and
    # left-merges — two exchanges (groupby + join) become one
    def tag_cust(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        # masked all-null columns without an O(n) Python list of pd.NA
        batch["n_orders"] = pd.Series(pd.NA, index=batch.index,
                                      dtype="Int64")
        batch["spend_cents"] = pd.Series(pd.NA, index=batch.index,
                                         dtype="Int64")
        return batch[["c_custkey", "c_name", "n_orders", "spend_cents"]]

    def tag_counts(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["c_name"] = pd.Series(pd.NA, index=batch.index,
                                    dtype="string")
        batch["n_orders"] = batch["n_orders"].astype("Int64")
        batch["spend_cents"] = batch["spend_cents"].astype("Int64")
        return batch[["c_custkey", "c_name", "n_orders", "spend_cents"]]

    both = cust.map_batches(tag_cust, batch_format="pandas").union(
        counts.map_batches(tag_counts, batch_format="pandas"))

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        is_cust = group["c_name"].notna()
        left = group.loc[is_cust, ["c_custkey", "c_name"]]
        agg = group.loc[~is_cust] \
            .groupby("c_custkey", as_index=False).agg(
                n_orders=("n_orders", "sum"),
                spend_cents=("spend_cents", "sum"))
        out = left.merge(agg, on="c_custkey", how="left")
        out["c_name"] = out["c_name"].astype(object)
        out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
        out["spend_cents"] = out["spend_cents"].fillna(0).astype("int64")
        return out

    from rdfa_streaming_parser_js_ray.stages.joins import auto_buckets
    return bucketed_fold(both, "c_custkey", fold,
                         num_buckets=auto_buckets(cust, counts,
                                                  rows_per_bucket=131_072,
                                                  fallback=64))


def q_repetition(sf_dir: str):
    """Line-structure repetition stats (Gopher/C4-style quality filters).
    The oracle replays the integer columns via
    unnest(string_split(text, chr(10))); the derived dup_line_ratio
    float stays out of the compare (same precedent as `quality`)."""
    from rdfa_streaming_parser_js_ray.stages.text import repetition_stats
    return repetition_stats(_sf_documents(sf_dir)).select_columns(
        ["doc_id", "n_lines", "n_distinct_lines", "max_line_len"])


def q_source_summary(sf_dir: str):
    """Per-source corpus rollup (combiner-first grouped exchange)."""
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.text import source_summary
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "lang", "text"])
    return source_summary(docs).select_columns(
        ["source", "n_docs", "n_langs", "sum_chars"])


def q_props_stats(sf_dir: str):
    """JSON-sidecar field extraction + per-event-type rollup."""
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.windows import props_field_stats
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "props"])
    return props_field_stats(events)


def q_knn_graph(sf_dir: str):
    """Exact cosine k-NN graph over the embeddings table (self excluded,
    rank ties to the smaller dst_id) — the eval-scale exact variant
    behind dedup-graph / diversity-sampling pipelines."""
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.ann import knn_graph
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).materialize()
    return knn_graph(emb, k=5, concurrency=2)


def q_source_mix(sf_dir: str):
    """Deterministic weighted source mixing: every third source sampled
    at 25%, the rest at 75% (pure-integer hash threshold, SQL-exact)."""
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.text import sample_sources
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    weights = {f"src{i}": (0.25 if i % 3 == 0 else 0.75)
               for i in range(100)}
    return sample_sources(docs, weights)


def q_pagerank(sf_dir: str):
    """Integer-exact distributed PageRank (3 iterations) over the
    customer→supplier purchase graph (orders ⋈ lineitem).  Fixed-point
    int64 arithmetic makes the result bit-identical across block
    layouts, retries, and the SQL oracle replaying the same unrolled
    iterations — float PageRank could never be value-hashed across
    engines."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.graph import pagerank_int
    from rdfa_streaming_parser_js_ray.stages.joins import hash_join
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"]) \
        .map_batches(lambda b: b.rename(columns={"o_orderkey": "orderkey"}),
                     batch_format="pandas")
    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey"]) \
        .map_batches(lambda b: b.rename(columns={"l_orderkey": "orderkey"}),
                     batch_format="pandas")
    joined = hash_join(orders, lineitem, on="orderkey")

    def to_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": "c" + batch["o_custkey"].astype(str),
            "dst": "s" + batch["l_suppkey"].astype(str)})

    edges = joined.map_batches(to_edges, batch_format="pandas")
    # oracle-scale bucket count: results are bucketing-invariant and the
    # per-iteration fixed cost of 64-way exchanges dominates at sf0.01
    return pagerank_int(edges, iterations=3, num_buckets=8)


def q_simhash_md5(sf_dir: str):
    """SQL-replayable SimHash machinery twin (md5-low-64 token hashes);
    the production simhash query keeps the faster crc32 family
    (rows-only)."""
    from rdfa_streaming_parser_js_ray.stages.dedup import simhash_md5_profile
    return simhash_md5_profile(_sf_documents(sf_dir))


def q_lang_id(sf_dir: str):
    """Stopword-ratio language ID.  The prediction is SQL-expressible
    (deterministic argmax over stopword-hit ratios), so the oracle covers
    lang_pred; the float confidence stays out of the compare (Python
    banker's rounding vs SQL half-away rounding can differ in the last
    decimal)."""
    from rdfa_streaming_parser_js_ray.stages.text import lang_id
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return lang_id(docs, concurrency=2).select_columns(["doc_id", "lang_pred"])


def q_winnow(sf_dir: str):
    """Winnowing fingerprint machinery with an md5 hash so DuckDB can
    replay it (the production ``fingerprints`` uses crc32 + xor-fold,
    which SQL cannot express)."""
    from rdfa_streaming_parser_js_ray.stages.text import winnow_profile
    return winnow_profile(_sf_documents(sf_dir))


def q_fingerprints(sf_dir: str):
    from rdfa_streaming_parser_js_ray.stages.text import fingerprints
    return fingerprints(_sf_documents(sf_dir))


def q_decontam(sf_dir: str):
    """Benchmark decontamination (SQL-replayable md5 twin): the eval set
    is the deterministic slice doc_id % 97 == 3; every corpus doc is
    tagged with its distinct word-3-gram overlap against that set.  The
    production path (vectorized rolling-hash grams + broadcast
    searchsorted membership, stages/decontam.py:decontaminate) is
    pinned by pytest planted cases."""
    from rdfa_streaming_parser_js_ray.stages.decontam import (
        benchmark_md5_hashes, decontaminate_md5,
    )
    docs = _sf_documents(sf_dir)

    def bench_slice(batch):
        import numpy as np
        import pyarrow as pa
        mask = batch["doc_id"].to_numpy() % 97 == 3
        return batch.filter(pa.array(mask))

    bench = docs.map_batches(bench_slice, batch_format="pyarrow")
    bh = benchmark_md5_hashes(bench, n=3)
    return decontaminate_md5(docs, bh, n=3, threshold=1)


def q_fuzzy_decontam(sf_dir: str):
    """FUZZY benchmark decontamination (MinHash-LSH cross-table with
    joined exact-Jaccard verify, stages/decontam.py:minhash_decontam):
    the eval set is the deterministic slice doc_id % 11 == 5; a corpus
    doc is contaminated when its exact word-3-gram Jaccard vs ANY eval
    doc >= 0.5.  The LSH only PRUNES candidates — every emitted value is
    the exact Jaccard — so DuckDB replays the full cross-product Jaccard
    at oracle scale.  True pairs in this corpus sit at J = 1.0 (the eval
    slice matching itself) or >= 0.96 (planted near-dups), far above the
    seeded LSH's theoretical false-negative band near J = 0.5, and the
    whole pipeline is seeded — oracle equality is stable run to run."""
    from rdfa_streaming_parser_js_ray.stages.decontam import minhash_decontam
    docs = _sf_documents(sf_dir)

    def bench_slice(batch):
        import pyarrow as pa
        mask = batch["doc_id"].to_numpy() % 11 == 5
        return batch.filter(pa.array(mask))

    bench = docs.map_batches(bench_slice, batch_format="pyarrow")
    return minhash_decontam(docs, bench, threshold=0.5)


def q_semantic_decontam(sf_dir: str):
    """Embedding-cosine benchmark decontamination
    (stages/ann.py:semantic_decontam): the eval set is the embeddings of
    the deterministic slice vec_id % 13 == 7; a corpus vector is
    contaminated when its cosine vs ANY eval vector >= 0.9.  Map-only
    broadcast shape (eval matrix ray.put once, size-guarded).  DuckDB
    replays the full cross cosine with list_cosine_similarity — safe at
    the fp boundary because this table's true matches sit at cos = 1.0
    (the slice matching itself) and everything else at <= ~0.51."""
    import ray.data as rd

    from rdfa_streaming_parser_js_ray.stages.ann import (
        benchmark_matrix_ref, semantic_decontam,
    )
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    def bench_slice(batch):
        import pyarrow as pa
        mask = batch["vec_id"].to_numpy() % 13 == 7
        return batch.filter(pa.array(mask))

    bench = emb.map_batches(bench_slice, batch_format="pyarrow")
    return semantic_decontam(emb, benchmark_matrix_ref(bench),
                             threshold=0.9, concurrency=2)


def q_minhash_near_dups(sf_dir: str):
    """LSH candidates verified via partitioned hash-joins of the texts onto
    the pairs — the no-broadcast scale path (nothing driver-materialized).

    NOW ORACLED: DuckDB replays the exact word-3-gram Jaccard over all
    pairs (O(n²) is fine at oracle scale) and keeps pairs ≥ threshold.
    The LSH candidate pass can in principle false-negative a pair, but at
    this corpus's planted similarities (J ≥ 0.96) the per-pair miss
    probability is (1-J^4)^32 ≈ 1e-26 — and the whole pipeline is seeded
    and deterministic, so the oracle equality is stable run to run.  The
    verified jaccard equals SQL's exactly (both are IEEE double ratios of
    the same integers; hashed-shingle collisions would show up here and
    don't), exported as integer ppm to keep float formatting out of the
    driver's value hash.  n_bands (an LSH internal) stays out of the
    compare."""
    import pandas as pd
    from rdfa_streaming_parser_js_ray.stages.dedup import minhash_dedup_pairs_joined
    docs = _sf_documents(sf_dir)
    pairs = minhash_dedup_pairs_joined(docs, threshold=0.5, num_buckets=16,
                                       concurrency=2)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        out = batch[["doc_a", "doc_b"]].copy()
        out["jaccard_ppm"] = np.floor(
            batch["jaccard"].to_numpy() * 1e6).astype("int64")
        return out

    return pairs.map_batches(project, batch_format="pandas")


def q_kmv_distinct(sf_dir: str):
    """KMV cardinality sketch of the corpus vocabulary — per-batch k-min
    combiner, ONE constant-key fold, exact-integer estimator, fully
    SQL-replayable (md5-low-64 hash order)."""
    from rdfa_streaming_parser_js_ray.stages.stats import kmv_distinct_tokens
    return kmv_distinct_tokens(_sf_documents(sf_dir), k=64)


def q_token_band_filter(sf_dir: str):
    """Per-language interquartile token-count filter (keep docs whose
    length sits in [q25, q75] of their language) — the Gopher-style
    length trim composed from the histogram-exact grouped_quantiles.
    The quantile table is a handful of rows (one per language), so it
    broadcasts; the corpus pass stays map-only."""
    import pandas as pd
    import ray
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.sources.documents import read_parquet_clean
    from rdfa_streaming_parser_js_ray.stages.stats import grouped_quantiles

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang"])

    def with_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "lang": batch["lang"].to_numpy(),
            "n_tokens": batch["text"].fillna("").str.count(r"\S+")
                        .to_numpy(dtype="int64")})

    toks = docs.map_batches(with_tokens, batch_format="pandas")
    bands = grouped_quantiles(toks, key_col="lang", value_col="n_tokens",
                              qs=(0.25, 0.75)).to_pandas()
    band_ref = _pin_broadcast(bands.set_index("lang")[["q25", "q75"]])

    class BandFilter:
        def __init__(self):
            self.bands = ray.get(band_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            lo = self.bands["q25"].reindex(batch["lang"]).to_numpy()
            hi = self.bands["q75"].reindex(batch["lang"]).to_numpy()
            n = batch["n_tokens"].to_numpy()
            return batch[(n >= lo) & (n <= hi)]

    return toks.map_batches(BandFilter, batch_format="pandas",
                            concurrency=2, num_cpus=0.5)


def q_normalize(sf_dir: str):
    """Canonical text normalization (NFC + lowercase + whitespace
    collapse + trim), map-only."""
    from rdfa_streaming_parser_js_ray.stages.text import normalize_text
    return normalize_text(_sf_documents(sf_dir))


def q_quantize(sf_dir: str):
    """int8 embedding quantization (map-only, zero shuffle).  The oracle
    compares the integer summaries; the q_vec list column itself stays
    Arrow-side for downstream ANN stages (driver hash needs scalar
    columns)."""
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.ann import quantize_embeddings_int8
    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    return quantize_embeddings_int8(vecs).drop_columns(["q_vec"])


def q_kmv_users(sf_dir: str):
    """Grouped KMV sketch: estimated distinct users per event type —
    the scalable COUNT(DISTINCT) GROUP BY shape (≤ k hashes per key per
    block cross the exchange).  k=32 keeps the estimator branch (not
    the exact small-set branch) under oracle test."""
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.stats import kmv_grouped_distinct
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "user_id"])
    return kmv_grouped_distinct(events, key_col="event_type",
                                value_col="user_id", k=32)


def q_pii_redact(sf_dir: str):
    """PII redaction over a corpus with deterministically planted PII
    (synthetic email/IP/phone per doc — the test tables carry none, so
    the plant gives the oracle real substitutions to verify, not just
    passthrough).  Both engines build the identical planted text, then
    redact sequentially."""
    import pandas as pd
    from rdfa_streaming_parser_js_ray.stages.text import redact_pii

    docs = _sf_documents(sf_dir)

    def plant(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].astype("int64")
        batch = batch.copy()
        batch["text"] = (
            batch["text"].fillna("")
            + " contact user" + ids.astype(str) + "@example.com from 10.0."
            + (ids % 256).astype(str) + "." + (ids % 100).astype(str)
            + " or +1555" + (1000000 + ids % 1000000).astype(str))
        return batch

    return redact_pii(docs.map_batches(plant, batch_format="pandas"),
                      concurrency=2)


def q_tfidf(sf_dir: str):
    """Integer-exact TF-IDF top-3 terms per document (score =
    tf·10⁶ // df — float-free, so ranking replays bit-for-bit in SQL).
    tf is exchange-free (doc = one row), df is one combiner-first
    grouped exchange, the join is the partitioned term-hash join."""
    from rdfa_streaming_parser_js_ray.stages.text import tfidf_top_terms
    return tfidf_top_terms(_sf_documents(sf_dir), k=3, num_buckets=16)


def q_dedup_clusters(sf_dir: str):
    """Near-dup CLUSTERING: LSH pairs → distributed min-label connected
    components → every doc tagged (cluster_id, is_canonical).  The
    keep-one-per-near-dup-group step of a dedup pipeline, composed
    entirely from the joined (no-broadcast) machinery: pair generation
    is the bucket-bounded LSH path, the closure is hash-to-min pointer
    doubling, and membership lands back on the corpus via a partitioned
    left hash-join.  The oracle replays exact Jaccard pairs + a
    recursive-CTE min-reachability closure in SQL."""
    import pandas as pd
    from rdfa_streaming_parser_js_ray.stages.dedup import minhash_dedup_pairs_joined
    from rdfa_streaming_parser_js_ray.stages.graph import connected_components
    from rdfa_streaming_parser_js_ray.stages.joins import hash_join

    docs = _sf_documents(sf_dir)
    pairs = minhash_dedup_pairs_joined(docs, threshold=0.5, num_buckets=16,
                                       concurrency=2)
    comp = connected_components(pairs, src_col="doc_a", dst_col="doc_b",
                                num_buckets=16)
    comp = comp.map_batches(
        lambda b: b.rename(columns={"node": "doc_id",
                                    "component": "cluster_id"}),
        batch_format="pandas")
    ids = docs.select_columns(["doc_id"])
    joined = hash_join(ids, comp, on="doc_id", how="left", num_buckets=16)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        cl = b["cluster_id"].fillna(b["doc_id"]).astype("int64")
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "cluster_id": cl,
            "is_canonical": (cl == b["doc_id"].astype("int64"))
                            .astype("int64")})

    return joined.map_batches(finish, batch_format="pandas")


def q_lang_pivot(sf_dir: str):
    """Pivot the corpus wide: per source, doc count + char sum per
    pinned language column (en/de/es/fr, remainder folded to __OTHER__)
    — conditional-aggregation replay in SQL (FILTER clauses).  The
    pinned-vocabulary contract keeps the schema data-independent at
    scale."""
    from rdfa_streaming_parser_js_ray.sources.documents import (
        read_parquet_clean,
    )
    from rdfa_streaming_parser_js_ray.stages.stats import pivot_agg
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["source", "lang", "n_chars"])
    return pivot_agg(docs, "source", "lang", "n_chars",
                     ["en", "de", "es", "fr"])


def _planted_embeddings(sf_dir: str):
    """Embeddings table + planted exact duplicates (ids +100000 of
    vec_id < 20) — the ONE definition of the planted-ids contract that
    both `embedding_near_dups` and `embedding_dedup_clusters` oracles
    assert (their SQL hardcodes the same +100000 / <20 constants)."""
    import pandas as pd

    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    def plant(batch: pd.DataFrame) -> pd.DataFrame:
        dup = batch[batch["vec_id"] < 20].copy()
        dup["vec_id"] = dup["vec_id"] + 100_000
        return pd.concat([batch, dup], ignore_index=True)

    return emb.map_batches(plant, batch_format="pandas")


def q_embedding_dedup_clusters(sf_dir: str):
    """Semantic (embedding-space) dedup CLUSTERING: LSH-bucketed cosine
    near-dup pairs → hash-to-min connected components → every vector
    tagged (cluster_id, is_canonical) via a partitioned left join — the
    embedding twin of `dedup_clusters`.  Planted exact duplicates (ids
    +100000 of vec_id < 20, as in `embedding_near_dups`) make the whole
    composition DuckDB-oracleable: expected clusters are exactly the 20
    planted pairs, everything else a singleton."""
    import pandas as pd

    from rdfa_streaming_parser_js_ray.stages.ann import (
        embedding_near_dup_pairs,
    )
    from rdfa_streaming_parser_js_ray.stages.graph import (
        connected_components,
    )
    from rdfa_streaming_parser_js_ray.stages.joins import hash_join

    planted = _planted_embeddings(sf_dir)
    pairs = embedding_near_dup_pairs(planted, threshold=0.9, concurrency=2)
    comp = connected_components(pairs, src_col="id_a", dst_col="id_b",
                                num_buckets=16)
    comp = comp.map_batches(
        lambda b: b.rename(columns={"node": "vec_id",
                                    "component": "cluster_id"}),
        batch_format="pandas")
    ids = planted.select_columns(["vec_id"])
    joined = hash_join(ids, comp, on="vec_id", how="left", num_buckets=16)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        cl = b["cluster_id"].fillna(b["vec_id"]).astype("int64")
        return pd.DataFrame({
            "vec_id": b["vec_id"].astype("int64"),
            "cluster_id": cl,
            "is_canonical": (cl == b["vec_id"].astype("int64"))
                            .astype("int64")})

    return joined.map_batches(finish, batch_format="pandas")


def q_interval_overlap(sf_dir: str):
    """KEYLESS interval-overlap join: 10-minute event intervals
    [ts, ts+600s) against the distinct hour windows [h, h+3600s) present
    in the stream — axis-bucketed with canonical-bucket dedup (no dedup
    exchange); each event overlaps 1–2 windows so output stays linear.
    SQL replays the overlap predicate over the same derived windows."""
    import pandas as pd

    import ray.data as rd

    from rdfa_streaming_parser_js_ray.stages.joins import interval_join

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts"])

    def to_interval(b: pd.DataFrame) -> pd.DataFrame:
        lo = b["ts"].astype("datetime64[ns]").astype("int64") // 10**9
        return pd.DataFrame({"event_id": b["event_id"].astype("int64"),
                             "lo": lo.astype("float64"),
                             "hi": (lo + 600).astype("float64")})

    def to_windows(b: pd.DataFrame) -> pd.DataFrame:
        h = (b["ts"].astype("datetime64[ns]").astype("int64") // 10**9
             // 3600 * 3600).drop_duplicates()
        return pd.DataFrame({"wlo": h.astype("float64"),
                             "whi": (h + 3600).astype("float64")})

    intervals = events.map_batches(to_interval, batch_format="pandas")
    # distinct hour windows: per-batch distinct -> one tiny grouped pass
    windows = events.map_batches(to_windows, batch_format="pandas") \
        .groupby("wlo").map_groups(lambda g: g.iloc[:1],
                                   batch_format="pandas")
    joined = interval_join(intervals, windows, l_lo="lo", l_hi="hi",
                           r_lo="wlo", r_hi="whi", bucket_width=3600.0)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b["event_id"].astype("int64"),
            "window_start_s": b["wlo"].astype("int64")})
    return joined.map_batches(finish, batch_format="pandas")


def q_kg_predicate_stats(sf_dir: str):
    """VoID-style KG profile: per predicate, triple count + exact
    distinct subject/object counts over the constructed graph — the
    dataset-statistics step of KG publishing.  Oracle wraps the full KG
    SQL replay in a GROUP BY with COUNT(DISTINCT ...)."""
    from rdfa_streaming_parser_js_ray.stages.graph import predicate_stats
    return predicate_stats(q_kg_construct(sf_dir))


def q_winnow_pairs(sf_dir: str):
    """Shared-substring near-dup pairs via winnowing fingerprints — the
    containment-sensitive complement to MinHash (long verbatim excerpts
    share window minima even at low whole-document Jaccard).  Two slim
    bucketed exchanges, df band [2, 64] bounds every pair expansion;
    the oracle replays the winnow selection + fp self-join in SQL."""
    from rdfa_streaming_parser_js_ray.stages.text import winnow_dedup_pairs
    return winnow_dedup_pairs(_sf_documents(sf_dir), min_shared=2,
                              max_df=64)


def q_source_rollup(sf_dir: str):
    """ROLLUP(source, lang) over the corpus in ONE exchange (grouping
    sets combiner) — per-(source,lang), per-source, and grand-total doc
    counts + char sums; SQL GROUP BY ROLLUP is the oracle (NULLs
    coalesced to the same sentinel the combiner emits)."""
    from rdfa_streaming_parser_js_ray.sources.documents import (
        read_parquet_clean,
    )
    from rdfa_streaming_parser_js_ray.stages.stats import grouping_sets_agg
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["source", "lang", "n_chars"])
    return grouping_sets_agg(docs, [("source", "lang"), ("source",), ()],
                             "n_chars")


def q_simhash(sf_dir: str):
    from rdfa_streaming_parser_js_ray.stages.dedup import simhash_documents
    return simhash_documents(_sf_documents(sf_dir), concurrency=2)


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for the first 5 embedding rows as queries;
    returns integer (qid, rank, vec_id) so the SQL oracle matches exactly."""
    import ray
    import ray.data as rd
    import numpy as np
    import pandas as pd
    from rdfa_streaming_parser_js_ray.stages.ann import brute_force_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qrows = sorted(emb.take(200), key=lambda r: r["vec_id"])[:5]
    q = np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    topk = brute_force_topk(emb, _pin_broadcast(q), k=10, concurrency=2)

    def rank(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["score", "vec_id"],
                                  ascending=[False, True]).head(10)
        group = group.reset_index(drop=True)
        group["rank"] = group.index + 1
        return group[["qid", "rank", "vec_id"]]
    return topk.groupby("qid").map_groups(rank, batch_format="pandas")


def q_ann_ivf(sf_dir: str):
    """IVF approximate top-k (coarse k-means quantizer + nprobe cluster
    scan) — the inverted-file scale path; approximate, so rows-only."""
    import ray.data as rd
    import numpy as np
    from rdfa_streaming_parser_js_ray.stages.ann import ivf_topk
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qrows = sorted(emb.take(200), key=lambda r: r["vec_id"])[:5]
    q = np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    return ivf_topk(emb, q, k=10, n_centroids=32, nprobe=8, concurrency=2)


def q_ann_ivf_exhaustive(sf_dir: str):
    """IVF with nprobe = n_centroids: probing EVERY cluster makes the
    inverted-file path exact, so the whole IVF plumbing (k-means
    quantizer, cluster assignment, per-cluster scoring, top-k merge) is
    DuckDB-oracleable against the same full-scan SQL as ann_topk — the
    approximate q_ann_ivf stays rows-only, this pins the machinery."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rdfa_streaming_parser_js_ray.stages.ann import ivf_topk
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qrows = sorted(emb.take(200), key=lambda r: r["vec_id"])[:5]
    q = np.asarray([np.asarray(r["embedding"], dtype=np.float64)
                    for r in qrows])
    topk = ivf_topk(emb, q, k=10, n_centroids=16, nprobe=16, concurrency=2)

    def rank(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["score", "vec_id"],
                                  ascending=[False, True]).head(10)
        group = group.reset_index(drop=True)
        group["rank"] = group.index + 1
        return group[["qid", "rank", "vec_id"]]
    return topk.groupby("qid").map_groups(rank, batch_format="pandas")


def q_embedding_near_dups(sf_dir: str):
    """The synthetic embeddings table has no natural near-dups (max
    off-diagonal cosine ≈ 0.51), so the query plants exact duplicates of
    the first 20 vectors under shifted ids: the expected answer is
    exactly those 20 pairs, which makes the whole LSH-co-bucket +
    in-bucket pair-scan path DuckDB-oracleable (ids only — the float32
    cosine of an exact dup is 1.0 ± fp error, not SQL-reproducible)."""
    from rdfa_streaming_parser_js_ray.stages.ann import embedding_near_dup_pairs
    pairs = embedding_near_dup_pairs(_planted_embeddings(sf_dir),
                                     threshold=0.9, concurrency=2)
    return pairs.select_columns(["id_a", "id_b"])


def q_window_agg(sf_dir: str):
    import ray.data as rd
    import pandas as pd
    from rdfa_streaming_parser_js_ray.stages.windows import tumbling_window_agg
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "ts", "value"])
    out = tumbling_window_agg(events, window="1h")

    def to_ints(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": batch["event_type"],
            "window_start_s": (batch["window_start"].astype("datetime64[ns]").astype("int64") // 10**9),
            "n_events": batch["n_events"].astype("int64"),
            "sum_value_cents": (batch["sum_value"] * 100).round().astype("int64"),
        })
    return out.map_batches(to_ints, batch_format="pandas")


def q_sessionize(sf_dir: str):
    import ray.data as rd
    import pandas as pd
    from rdfa_streaming_parser_js_ray.stages.windows import sessionize
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"])
    out = sessionize(events, gap_minutes=30.0)

    def to_ints(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].astype("int64"),
            "session_id": batch["session_id"].astype("int64"),
            "session_start_s": batch["session_start"].astype("datetime64[ns]").astype("int64") // 10**9,
            "session_end_s": batch["session_end"].astype("datetime64[ns]").astype("int64") // 10**9,
            "n_events": batch["n_events"].astype("int64"),
        })
    return out.map_batches(to_ints, batch_format="pandas")


def q_rolling_features(sf_dir: str):
    """Per-user ordered rolling features (lag + rolling 3-event sum) —
    LAG/SUM-OVER-ROWS replay in the oracle; integer-cents output so both
    engines agree bit-for-bit.  Missing lag → -1 sentinel (SQL
    COALESCE) to keep the column integer."""
    import pandas as pd

    import ray.data as rd

    from rdfa_streaming_parser_js_ray.stages.windows import rolling_per_key
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_id", "ts", "value"])
    out = rolling_per_key(events, k=3)

    def to_ints(batch: pd.DataFrame) -> pd.DataFrame:
        prev_cents = (batch["prev_value"] * 100).round()
        return pd.DataFrame({
            "user_id": batch["user_id"].astype("int64"),
            "event_id": batch["event_id"].astype("int64"),
            "prev_cents": prev_cents.fillna(-1).astype("int64"),
            "roll_sum_cents": batch["roll_sum_cents"].astype("int64"),
            "roll_n": batch["roll_n"].astype("int64"),
        })
    return out.map_batches(to_ints, batch_format="pandas")


def q_sliding_window(sf_dir: str):
    """Hopping windows (3h windows advancing hourly) over the events
    stream — each event lands in exactly 3 windows via a vectorized
    k-way explode in the combiner; ONE grouped exchange over partials."""
    import ray.data as rd
    import pandas as pd
    from rdfa_streaming_parser_js_ray.stages.windows import sliding_window_agg
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "ts", "value"])
    out = sliding_window_agg(events, size="3h", hop="1h")

    def to_ints(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": batch["event_type"],
            "window_start_s": (batch["window_start"].astype("datetime64[ns]")
                               .astype("int64") // 10**9),
            "n_events": batch["n_events"].astype("int64"),
            "sum_value_cents": (batch["sum_value"] * 100).round()
                               .astype("int64"),
        })
    return out.map_batches(to_ints, batch_format="pandas")


def q_asof_orders(sf_dir: str):
    """As-of join: each event gets the user's latest order at-or-before
    the event timestamp (DuckDB ASOF LEFT JOIN against a pre-reduced
    right side is the oracle).  Determinism under orderdate ties comes
    from the operator's ``tiebreak`` (max orderkey wins) — no extra
    pre-reduction exchange on the Ray side."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import asof_join

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"]) \
        .map_batches(lambda b: b.rename(columns={"o_custkey": "user_id"}),
                     batch_format="pandas")
    # oracle-scale bucket count (results are bucketing-invariant; the
    # fixed cost of a 64-way exchange dominates at sf0.01)
    out = asof_join(events, orders, on="user_id", left_ts="ts",
                    right_ts="o_orderdate", tiebreak="o_orderkey",
                    num_buckets=8)

    def to_ints(batch: pd.DataFrame) -> pd.DataFrame:
        key = pd.to_numeric(batch["o_orderkey"], errors="coerce")
        date = pd.to_datetime(batch["o_orderdate"], errors="coerce")
        return pd.DataFrame({
            "event_id": batch["event_id"].astype("int64"),
            "user_id": batch["user_id"].astype("int64"),
            "ts_s": batch["ts"].astype("datetime64[ns]").astype("int64")
                    // 10**9,
            "last_orderkey": key.fillna(-1).astype("int64"),
            "last_orderdate_s": (date.astype("datetime64[ns]")
                                 .astype("int64") // 10**9)
                                .where(date.notna(), 0).astype("int64"),
        })
    return out.map_batches(to_ints, batch_format="pandas")


def q_shipments_in_window(sf_dir: str):
    """Range join: every lineitem whose ship date falls inside the 90
    days following its order's date — key-equality bucketing + vectorized
    per-bucket interval mask (stages/joins.range_join)."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import range_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber",
                                  "l_shipdate"])

    def widen(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.rename(columns={"o_orderkey": "l_orderkey",
                                      "o_orderdate": "lo"})
        batch["hi"] = batch["lo"] + pd.Timedelta(days=90)
        return batch

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(widen, batch_format="pandas")
    out = range_join(li, orders, on="l_orderkey", ts_col="l_shipdate",
                     lo_col="lo", hi_col="hi")

    def to_ints(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": batch["l_orderkey"].astype("int64"),
            "l_linenumber": batch["l_linenumber"].astype("int64"),
            "ship_s": batch["l_shipdate"].astype("datetime64[ns]")
                      .astype("int64") // 10**9,
            "order_date_s": batch["lo"].astype("datetime64[ns]")
                            .astype("int64") // 10**9,
        })
    return out.map_batches(to_ints, batch_format="pandas")


def q_part_triangles(sf_dir: str):
    """Triangle count of the part co-occurrence graph (parts sharing an
    order are connected; capped at the first two lineitems per order so
    the demo graph stays sparse — the operator itself has no cap).  Pair
    expansion is a per-order self-join (order groups are small); counting
    is the two-bounded-join wedge closure in
    stages/graph.triangle_count."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.graph import triangle_count
    from rdfa_streaming_parser_js_ray.stages.joins import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey",
                                  "l_linenumber"]) \
        .map_batches(lambda b: b[b["l_linenumber"] <= 2]
                     [["l_orderkey", "l_partkey"]],
                     batch_format="pandas")
    pairs = hash_join(
        li, li.map_batches(lambda b: b.rename(columns={"l_partkey": "p2"}),
                           batch_format="pandas"),
        on="l_orderkey", num_buckets=8)

    def to_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": batch["l_partkey"].astype("int64"),
                             "dst": batch["p2"].astype("int64")})

    edges = pairs.map_batches(to_edges, batch_format="pandas")
    # oracle-scale bucket count; see q_pagerank
    return triangle_count(edges, num_buckets=8)


def q_token_quantiles(sf_dir: str):
    """Exact discrete token-count quantiles per language via the
    shuffled-histogram operator (one grouped exchange carrying one row
    per (lang, distinct count) — never a sort of the data)."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.stats import grouped_quantiles

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])

    def tokens(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": batch["lang"],
            "n_tokens": batch["text"].fillna("").str.count(r"\S+")
                        .astype("int64")})

    return grouped_quantiles(docs.map_batches(tokens, batch_format="pandas"),
                             "lang", "n_tokens")


def q_inverted_index(sf_dir: str):
    """Inverted-index postings for tokens with document frequency in
    [5, 50] — per-batch vectorized explode + distinct, one grouped
    exchange whose group sizes are capped by the df band itself."""
    from rdfa_streaming_parser_js_ray.stages.text import build_inverted_index
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return build_inverted_index(docs, min_df=5, max_df=50)


def q_bgp_titles(sf_dir: str):
    """Conjunctive graph-pattern query over the constructed KG (the
    SPARQL-BGP follow-on every KG pipeline serves): every document
    entity sourced from src1, with its title — two triple patterns
    joined on the shared subject variable via the partitioned hash
    join (stages/bgp.bgp_match)."""
    from rdfa_streaming_parser_js_ray.stages.bgp import bgp_match
    triples = _kg_triples(sf_dir)
    return bgp_match(triples, [
        ("?d", "http://purl.org/dc/terms/source",
         "http://data.example/src/src1"),
        ("?d", "http://purl.org/dc/terms/title", "?title"),
    ], num_buckets=8)


def q_top_docs_per_lang(sf_dir: str):
    """Top-3 documents per language by length (bounded top-k combiner —
    the exchange moves ≤ k rows per key per block)."""
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.stats import topk_per_group
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    return topk_per_group(docs, "lang", "n_chars", k=3,
                          tiebreak_col="doc_id")


def q_join_broadcast(sf_dir: str):
    """Broadcast join (orders x customer small side) + pre-aggregated
    rollup per market segment (SURVEY.md SS2.5 broadcast-small-side join)."""
    import ray
    import ray.data as rd
    import pandas as pd
    from ray.data.aggregate import Sum
    from rdfa_streaming_parser_js_ray.stages.joins import broadcast_join

    customer = rd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"]).to_pandas()
    customer = customer.rename(columns={"c_custkey": "o_custkey"})
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, _pin_broadcast(customer), on="o_custkey",
                            concurrency=2)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        grouped = batch.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("o_totalprice", "size"),
            total_cents=("o_totalprice", "sum"))
        grouped["total_cents"] = (grouped["total_cents"] * 100).round()
        return grouped

    partials = joined.map_batches(partial, batch_format="pandas")
    out = partials.groupby("c_mktsegment").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_cents", alias_name="total_cents"))

    def to_int(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_orders"] = batch["n_orders"].astype("int64")
        batch["total_cents"] = batch["total_cents"].round().astype("int64")
        return batch
    return out.map_batches(to_int, batch_format="pandas")


def q_join_semi(sf_dir: str):
    """Partitioned hash semi-join (stages/joins.py:semi_join): customers
    with at least one order, each emitted once regardless of how many
    urgent orders they have — the slim exchange moves customers + unique
    urgent-order custkeys only.  SQL twin: WHERE EXISTS."""
    import pandas as pd
    import ray.data as rd

    from rdfa_streaming_parser_js_ray.stages.joins import semi_join
    customer = rd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])

    def urgent(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[batch["o_orderpriority"] == "1-URGENT",
                         ["o_custkey"]]

    return semi_join(customer, orders.map_batches(urgent,
                                                  batch_format="pandas"),
                     on="c_custkey", right_on="o_custkey")


def q_join_hash(sf_dir: str):
    """Partitioned hash join (lineitem x orders, both large) + rollup per
    order priority (SURVEY.md SS2.5 bucketed hash-join pattern)."""
    import ray.data as rd
    import pandas as pd
    from ray.data.aggregate import Sum
    from rdfa_streaming_parser_js_ray.stages.joins import hash_join

    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_quantity"]) \
        .map_batches(lambda b: b.rename(columns={"l_orderkey": "orderkey"}),
                     batch_format="pandas")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(lambda b: b.rename(columns={"o_orderkey": "orderkey"}),
                     batch_format="pandas")
    joined = hash_join(lineitem, orders, on="orderkey", num_buckets=32)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        grouped = batch.groupby("o_orderpriority", as_index=False).agg(
            n_items=("l_quantity", "size"),
            sum_qty_cents=("l_quantity", "sum"))
        # pin the partial to int64 (cents are integral) so every block
        # ships the same dtype into the grouped Sum
        grouped["sum_qty_cents"] = (
            grouped["sum_qty_cents"].astype("float64") * 100
        ).round().astype("int64")
        return grouped

    partials = joined.map_batches(partial, batch_format="pandas")
    out = partials.groupby("o_orderpriority").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("sum_qty_cents", alias_name="sum_qty_cents"))

    def to_int(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_items"] = batch["n_items"].astype("int64")
        batch["sum_qty_cents"] = batch["sum_qty_cents"].round().astype("int64")
        return batch
    return out.map_batches(to_int, batch_format="pandas")


def q_train_val_split(sf_dir: str):
    """Deterministic dataset splitting (hash-of-key modulo buckets) — the
    standard reproducible train/val assignment for a training corpus;
    vectorized pyarrow, no shuffle, stable under retries."""
    import ray.data as rd
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np
        bucket = pa.array(batch["doc_id"].to_numpy() % 10)
        split = pc.if_else(pc.less(bucket, 8),
                           pa.scalar("train"), pa.scalar("val"))
        return batch.append_column("split", split)

    return docs.map_batches(assign, batch_format="pyarrow")


def q_suppliers_by_region(sf_dir: str):
    """Chained broadcast joins (supplier ⋈ nation ⋈ region — both small
    sides ship once via ray.put) + rollup per region."""
    import ray
    import ray.data as rd
    import pandas as pd
    from ray.data.aggregate import Sum
    from rdfa_streaming_parser_js_ray.stages.joins import broadcast_join

    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_regionkey"]).to_pandas() \
        .rename(columns={"n_nationkey": "s_nationkey"})
    region = rd.read_parquet(f"{sf_dir}/region.parquet",
                             columns=["r_regionkey", "r_name"]).to_pandas() \
        .rename(columns={"r_regionkey": "n_regionkey"})
    supplier = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                               columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    joined = broadcast_join(supplier, _pin_broadcast(nation), on="s_nationkey",
                            concurrency=2)
    joined = broadcast_join(joined, _pin_broadcast(region), on="n_regionkey",
                            concurrency=2)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        grouped = batch.groupby("r_name", as_index=False).agg(
            n_suppliers=("s_suppkey", "size"), acctbal_cents=("s_acctbal", "sum"))
        grouped["acctbal_cents"] = (grouped["acctbal_cents"] * 100).round()
        return grouped

    out = joined.map_batches(partial, batch_format="pandas") \
        .groupby("r_name").aggregate(
            Sum("n_suppliers", alias_name="n_suppliers"),
            Sum("acctbal_cents", alias_name="acctbal_cents"))

    def to_int(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_suppliers"] = batch["n_suppliers"].astype("int64")
        batch["acctbal_cents"] = batch["acctbal_cents"].round().astype("int64")
        return batch
    return out.map_batches(to_int, batch_format="pandas")


def q_media_manifest(sf_dir: str):
    from rdfa_streaming_parser_js_ray.stages.media import media_manifest
    return media_manifest(_wrapped_docs(sf_dir))


def q_media_features(sf_dir: str):
    from rdfa_streaming_parser_js_ray.stages.media import (
        decode_and_featurize, media_manifest,
    )
    manifest = media_manifest(_wrapped_docs(sf_dir))
    feats = decode_and_featurize(manifest, concurrency=2)
    return feats.select_columns(["media_ref", "doc_id", "mean_r", "mean_g", "mean_b"])


def q_top_docs_by_tokens(sf_dir: str):
    """Distributed sort + limit (top-k documents by token count)."""
    from rdfa_streaming_parser_js_ray.stages.text import token_counts
    counts = token_counts(_sf_documents(sf_dir))
    return counts.sort(["n_tokens", "doc_id"], descending=[True, False]) \
                 .limit(20)


def q_distinct_langs(sf_dir: str):
    """Distributed distinct (pre-reduced per batch, then one exchange)."""
    import ray.data as rd
    import pyarrow as pa
    import pyarrow.compute as pc
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])

    def local_unique(batch: pa.Table) -> pa.Table:
        return pa.table({"lang": pc.unique(batch["lang"])})

    return docs.map_batches(local_unique, batch_format="pyarrow") \
               .groupby("lang").count().select_columns(["lang"])


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style multi-aggregate groupby over lineitem, pre-aggregated
    inside map_batches (combiner) before one small global groupby."""
    import ray.data as rd
    import pandas as pd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            qty_c=(batch["l_quantity"] * 100).round(),
            price_c=(batch["l_extendedprice"] * 100).round(),
            disc_price_c=(batch["l_extendedprice"] * (1 - batch["l_discount"]) * 10000).round(),
            n=1)
        return batch.groupby(["l_returnflag", "l_linestatus"], as_index=False) \
                    .agg(sum_qty_cents=("qty_c", "sum"),
                         sum_price_cents=("price_c", "sum"),
                         sum_disc_price_e4=("disc_price_c", "sum"),
                         n_rows=("n", "sum"))

    out = li.map_batches(partial, batch_format="pandas") \
            .groupby(["l_returnflag", "l_linestatus"]).aggregate(
                Sum("sum_qty_cents", alias_name="sum_qty_cents"),
                Sum("sum_price_cents", alias_name="sum_price_cents"),
                Sum("sum_disc_price_e4", alias_name="sum_disc_price_e4"),
                Sum("n_rows", alias_name="n_rows"))

    def to_int(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("sum_qty_cents", "sum_price_cents", "sum_disc_price_e4", "n_rows"):
            batch[c] = batch[c].round().astype("int64")
        return batch
    return out.map_batches(to_int, batch_format="pandas")


def q_shipping_priority(sf_dir: str):
    """TPC-H-Q3-style shipping priority: the filtered dimension (BUILDING
    customers) broadcasts once into orders (map-side semi filter — no
    exchange for the dim side), then orders x lineitem is a partitioned
    hash join on orderkey, revenue rolls up combiner-first per order, and
    a distributed sort takes the top 10.  Revenue is exact integer
    arithmetic — price_cents x (100 - disc_pct) = revenue_e4 — so the
    DuckDB oracle hash-matches bit-for-bit."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Max, Min
    from rdfa_streaming_parser_js_ray.stages.joins import broadcast_join, hash_join

    # data-derived cutoff (min + (max-min)/100, floored to day): one
    # streaming min/max reduce over the date column — scale-free, and
    # non-degenerate on any date distribution the oracle sees.  The SQL
    # twin computes the identical scalar subquery; both sides are exact
    # because the inputs are day-resolution and the floor kills any
    # sub-day division residue.
    dates = rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate"]) \
        .aggregate(Min("o_orderdate"), Max("o_orderdate"))
    mn = pd.Timestamp(dates["min(o_orderdate)"])
    mx = pd.Timestamp(dates["max(o_orderdate)"])
    cutoff = (mn + (mx - mn) / 100).floor("D")
    # segment filter pushed into the parquet scan: only BUILDING custkeys
    # ever leave storage, and only the key column rides the broadcast
    import pyarrow.dataset as pads
    building = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=(pads.field("c_mktsegment") == "BUILDING")).to_pandas() \
        .rename(columns={"c_custkey": "o_custkey"})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate",
                                      "o_orderpriority"])
    orders_f = broadcast_join(orders, _pin_broadcast(building),
                              on="o_custkey", concurrency=2)

    def orders_prep(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.loc[batch["o_orderdate"] < cutoff,
                        ["o_orderkey", "o_orderdate", "o_orderpriority"]]
        return out.rename(columns={"o_orderkey": "orderkey"})

    def li_prep(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.loc[batch["l_shipdate"] > cutoff]
        price_c = (out["l_extendedprice"].to_numpy() * 100) \
            .round().astype("int64")
        disc_pct = (out["l_discount"].to_numpy() * 100).round().astype("int64")
        return pd.DataFrame({"orderkey": out["l_orderkey"].to_numpy(),
                             "revenue_e4": price_c * (100 - disc_pct)})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pandas")
    joined = hash_join(li, orders_f.map_batches(orders_prep,
                                                batch_format="pandas"),
                       on="orderkey")

    # per-order revenue rollup as a bucketed fold on the int orderkey
    # (orderdate/priority are functionally dependent on it, so grouping
    # all three inside the fold is per-key-correct), then a bounded
    # global top-10: a per-block top-10 combiner caps the driver pull at
    # 10 × n_blocks rows regardless of corpus size.  orderkey is unique
    # per group → the (revenue, orderkey) sort is a total order and the
    # boundary can't flake on ties.
    def fold(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(["orderkey", "o_orderdate", "o_orderpriority"],
                            as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"))
        agg["revenue_e4"] = agg["revenue_e4"].astype("int64")
        return agg

    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold
    per_order = bucketed_fold(joined, "orderkey", fold, num_buckets=32)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["revenue_e4", "orderkey"],
                                 ascending=[False, True]).head(10)

    top = per_order.map_batches(local_topk, batch_format="pandas") \
        .to_pandas()
    if len(top) == 0:
        # legitimately-empty qualifying set (possible on adversarial
        # random dates): empty Ray to_pandas() drops columns, so
        # rebuild the typed empty frame instead of KeyError-ing on sort
        return pd.DataFrame({
            "orderkey": pd.Series(dtype="int64"),
            "o_orderdate": pd.Series(dtype="datetime64[us]"),
            "o_orderpriority": pd.Series(dtype="object"),
            "revenue_e4": pd.Series(dtype="int64")})
    return top.sort_values(["revenue_e4", "orderkey"],
                           ascending=[False, True]).head(10) \
        .reset_index(drop=True)


def q_returned_revenue(sf_dir: str):
    """TPC-H-Q10-style returned-item revenue: lineitem filters to
    returnflag='R' and pre-aggregates revenue per order INSIDE the scan
    batch (combiner-first — the join exchange moves one row per order,
    not one per line), hash-joins orders for the custkey, rolls up per
    customer, cuts the top 20 FIRST, and only then decorates those 20
    keys with names via a filtered customer read — the dimension never
    broadcasts whole."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import hash_join

    def li_prep(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.loc[batch["l_returnflag"] == "R"]
        price_c = (out["l_extendedprice"].to_numpy() * 100) \
            .round().astype("int64")
        disc_pct = (out["l_discount"].to_numpy() * 100).round().astype("int64")
        per_line = pd.DataFrame({"orderkey": out["l_orderkey"].to_numpy(),
                                 "revenue_e4": price_c * (100 - disc_pct)})
        return per_line.groupby("orderkey", as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pandas")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"]) \
        .map_batches(lambda b: b.rename(columns={"o_orderkey": "orderkey"}),
                     batch_format="pandas")
    joined = hash_join(li, orders, on="orderkey")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("o_custkey", as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"))

    # per-customer rollup as a bucketed fold on the int custkey, then a
    # bounded global top-20 (per-block top-20 combiner caps the driver
    # pull at 20 × n_blocks rows).  Top-20 cut BEFORE decoration
    # (custkey is unique after the rollup, so the (revenue, custkey)
    # sort is a total order), then only those 20 keys read back out of
    # the customer table — the name decoration never broadcasts the
    # full dimension, no matter how big customer is.
    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("o_custkey", as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"))
        agg["revenue_e4"] = agg["revenue_e4"].astype("int64")
        return agg

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["revenue_e4", "o_custkey"],
                                 ascending=[False, True]).head(20)

    per_cust = bucketed_fold(
        joined.map_batches(partial, batch_format="pandas"),
        "o_custkey", fold, num_buckets=32)
    top = per_cust.map_batches(local_topk, batch_format="pandas") \
        .to_pandas()
    if len(top) == 0:
        # no returned items at all (possible on adversarial random
        # inputs): empty Ray to_pandas() drops columns — return the
        # typed empty frame instead of KeyError-ing below
        return pd.DataFrame({"custkey": pd.Series(dtype="int64"),
                             "c_name": pd.Series(dtype="object"),
                             "revenue_e4": pd.Series(dtype="int64")})
    top = top.sort_values(["revenue_e4", "o_custkey"],
                          ascending=[False, True]).head(20) \
        .reset_index(drop=True)

    import pyarrow.dataset as pads
    names = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
        filter=(pads.field("c_custkey").isin(top["o_custkey"].tolist()))) \
        .to_pandas()
    out = top.merge(names, left_on="o_custkey", right_on="c_custkey") \
        .rename(columns={"o_custkey": "custkey"})
    return out[["custkey", "c_name", "revenue_e4"]]


def q_revenue_forecast(sf_dir: str):
    """TPC-H-Q6-style scalar forecast: multi-predicate filter + global
    SUM over the biggest fact table, fully map-side — each scan batch
    reduces to ONE partial row, the exchange moves n_blocks rows, and the
    result is a single row.  The predicate band (quantity < 25, discount
    in [0.02, 0.08]) is value-based so it is distribution-free for the
    randomized oracle."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        disc_pct = (batch["l_discount"].to_numpy() * 100) \
            .round().astype("int64")
        m = (batch["l_quantity"].to_numpy() < 25.0) \
            & (disc_pct >= 2) & (disc_pct <= 8)
        price_c = (batch.loc[m, "l_extendedprice"].to_numpy() * 100) \
            .round().astype("int64")
        rev = price_c * disc_pct[m]
        return pd.DataFrame({"revenue_e4": [int(rev.sum())],
                             "n_items": [int(m.sum())]})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice",
                                  "l_discount"]) \
        .map_batches(partial, batch_format="pandas")
    out = li.aggregate(Sum("revenue_e4"), Sum("n_items"))
    return pd.DataFrame({"revenue_e4": [int(out["sum(revenue_e4)"] or 0)],
                         "n_items": [int(out["sum(n_items)"] or 0)]})


def q_large_volume_customers(sf_dir: str):
    """TPC-H-Q18-style large-volume customers: per-order quantity rollup
    (combiner inside the lineitem scan), HAVING-style threshold filter,
    then the qualifying order set — small by construction — decorates via
    broadcast joins into orders and a filtered customer read.  The big
    side is touched exactly once; no all-to-all."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import (
        broadcast_join, bucketed_fold,
    )

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        qty_c = (batch["l_quantity"].to_numpy() * 100).round().astype("int64")
        per = pd.DataFrame({"o_orderkey": batch["l_orderkey"].to_numpy(),
                            "qty_cents": qty_c})
        return per.groupby("o_orderkey", as_index=False).agg(
            qty_cents=("qty_cents", "sum"))

    # per-key sum + HAVING fused into one bucketed fold (int-hash bucket
    # exchange — the repo's measured ~10× alternative to a sort groupby;
    # the HAVING filter is per-key-correct because a bucket holds every
    # partial of each key).  > 250 quantity units, like Q18's spec
    # constant, picks the extreme tail (204 of 14,743 orders at sf0.01),
    # so the qualifying set stays broadcast-small by construction.
    def fold(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("o_orderkey", as_index=False).agg(
            qty_cents=("qty_cents", "sum"))
        agg["qty_cents"] = agg["qty_cents"].astype("int64")
        return agg.loc[agg["qty_cents"] > 250 * 100]

    big = bucketed_fold(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_quantity"])
        .map_batches(li_partial, batch_format="pandas"),
        "o_orderkey", fold, num_buckets=32)

    big_df = big.to_pandas()
    if len(big_df) == 0:
        # empty qualifying set (the randomized tables by contract):
        # empty Ray to_pandas() drops columns — return the typed empty
        # frame instead of KeyError-ing in the broadcast merge
        return pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                             "o_custkey": pd.Series(dtype="int64"),
                             "price_cents": pd.Series(dtype="int64"),
                             "qty_cents": pd.Series(dtype="int64")})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    decorated = broadcast_join(orders, _pin_broadcast(big_df),
                               on="o_orderkey", concurrency=2)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["price_cents"] = (batch["o_totalprice"] * 100) \
            .round().astype("int64")
        return batch[["o_orderkey", "o_custkey", "price_cents",
                      "qty_cents"]]
    # the join output is qualifying-set-sized (~204 rows), so the top-30
    # cut finishes driver-side; o_orderkey is unique → total order
    out = decorated.map_batches(finish, batch_format="pandas").to_pandas()
    return out.sort_values(["qty_cents", "o_orderkey"],
                           ascending=[False, True]).head(30) \
        .reset_index(drop=True)


def q_nation_revenue(sf_dir: str):
    """TPC-H-Q5-flavoured supplier-nation revenue: the big fact
    (lineitem) pre-aggregates revenue per suppkey inside each scan batch,
    the supplier→nation dimension chain collapses driver-side (10k + 25
    rows) into ONE broadcast lookup, and the final groupby moves at most
    n_suppliers tiny rows.  No all-to-all anywhere."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum
    from rdfa_streaming_parser_js_ray.stages.joins import broadcast_join

    def li_prep(batch: pd.DataFrame) -> pd.DataFrame:
        price_c = (batch["l_extendedprice"].to_numpy() * 100) \
            .round().astype("int64")
        disc_pct = (batch["l_discount"].to_numpy() * 100) \
            .round().astype("int64")
        per_line = pd.DataFrame({"l_suppkey": batch["l_suppkey"].to_numpy(),
                                 "revenue_e4": price_c * (100 - disc_pct),
                                 "n_items": 1})
        return per_line.groupby("l_suppkey", as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"), n_items=("n_items", "sum"))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"]) \
        .map_batches(li_prep, batch_format="pandas")

    supplier = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                               columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"]).to_pandas()
    supp_nation = supplier.merge(
        nation, left_on="s_nationkey", right_on="n_nationkey") \
        [["s_suppkey", "n_name"]].rename(columns={"s_suppkey": "l_suppkey"})

    joined = broadcast_join(li, _pin_broadcast(supp_nation),
                            on="l_suppkey", concurrency=2)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("n_name", as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"), n_items=("n_items", "sum"))

    out = joined.map_batches(partial, batch_format="pandas") \
        .groupby("n_name").aggregate(
            Sum("revenue_e4", alias_name="revenue_e4"),
            Sum("n_items", alias_name="n_items"))

    def to_int(batch: pd.DataFrame) -> pd.DataFrame:
        batch["revenue_e4"] = batch["revenue_e4"].round().astype("int64")
        batch["n_items"] = batch["n_items"].astype("int64")
        return batch
    return out.map_batches(to_int, batch_format="pandas")


def q_lang_mode_per_source(sf_dir: str):
    """Per-group mode (argmax with deterministic tie-break): the most
    frequent lang per source, ties broken by lexicographically smallest
    lang.  Shape: per-batch (source, lang) count combiner — only unique
    pairs cross the wire — then ONE bucketed fold on source finishes the
    count and picks the argmax per key.  The per-group-argmax shape every
    corpus-composition report needs."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["source", "lang"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        c = group.groupby(["source", "lang"], as_index=False).agg(
            n=("n", "sum"))
        # per source: max count, then min lang among the tied rows
        mx = c.groupby("source")["n"].transform("max")
        tied = c.loc[c["n"] == mx]
        out = tied.sort_values(["source", "lang"]) \
            .groupby("source", as_index=False).first()
        out = out.rename(columns={"lang": "mode_lang", "n": "n_docs"})
        out["n_docs"] = out["n_docs"].astype("int64")
        return out[["source", "mode_lang", "n_docs"]]

    return bucketed_fold(docs.map_batches(partial, batch_format="pandas"),
                         "source", fold, num_buckets=16)


def q_langs_per_source(sf_dir: str):
    """Ordered distinct string aggregation (group_concat): per source,
    the sorted CSV of its distinct langs + the distinct count.  Shape:
    per-batch distinct-pair combiner (only unique (source, lang) pairs
    cross the wire — bounded by |sources| × |langs| per block, not rows)
    → ONE bucketed fold doing the sort + join per key.  Deterministic by
    construction (sorted order is the tie-break)."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates(["source", "lang"])[["source", "lang"]]

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.drop_duplicates(["source", "lang"]) \
            .sort_values(["source", "lang"]) \
            .groupby("source", as_index=False).agg(
                langs_csv=("lang", ",".join), n_langs=("lang", "size"))
        agg["n_langs"] = agg["n_langs"].astype("int64")
        return agg

    return bucketed_fold(docs.map_batches(partial, batch_format="pandas"),
                         "source", fold, num_buckets=16)


def q_sources_with_en_and_de(sf_dir: str):
    """Distributed INTERSECT: sources that have at least one English AND
    one German document.  Each side reduces to distinct keys inside the
    scan (per-batch combiner), then one co-grouped fold keeps the keys
    present on both sides — the set-operation shape (INTERSECT/EXCEPT
    flips one comparison) without materializing either side."""
    import pandas as pd
    import ray.data as rd
    from rdfa_streaming_parser_js_ray.stages.joins import bucketed_fold

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.loc[batch["lang"].isin(["en", "de"])]
        return b.drop_duplicates(["source", "lang"])[["source", "lang"]]

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        d = group.drop_duplicates(["source", "lang"])
        both = d.groupby("source")["lang"].nunique()
        return pd.DataFrame({"source": both.index[both == 2]})

    return bucketed_fold(docs.map_batches(partial, batch_format="pandas"),
                         "source", fold, num_buckets=16)


def q_docs_above_source_avg(sf_dir: str):
    """Aggregate-broadcast-back filter (the correlated-subquery shape):
    documents whose whitespace token count exceeds their source's mean.
    Pass 1 reduces to per-source (total, count) — a tiny combiner-first
    groupby; the n_sources-row result broadcasts back into a second scan
    whose filter uses exact integer cross-multiplication
    (n_tokens × cnt > total), so no float division anywhere and the
    DuckDB twin hash-matches."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    def tok(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "n_tokens": batch["text"].fillna("")
                        .str.count(r"\S+").astype("int64"),
        })

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"]) \
        .map_batches(tok, batch_format="pandas")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("source", as_index=False).agg(
            total=("n_tokens", "sum"), cnt=("n_tokens", "size"))
        return g

    agg = docs.map_batches(partial, batch_format="pandas") \
        .groupby("source").aggregate(Sum("total", alias_name="total"),
                                     Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    totals = _pin_broadcast({
        s: (int(t), int(c))
        for s, t, c in zip(agg["source"], agg["total"], agg["cnt"])})

    class AboveAvg:
        def __init__(self, totals_ref):
            import ray
            self.totals = ray.get(totals_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            tot = batch["source"].map(lambda s: self.totals[s][0]).to_numpy()
            cnt = batch["source"].map(lambda s: self.totals[s][1]).to_numpy()
            keep = batch["n_tokens"].to_numpy() * cnt > tot
            return batch.loc[keep]

    return docs.map_batches(AboveAvg, fn_constructor_args=(totals,),
                            batch_format="pandas", concurrency=2)


def q_top_terms(sf_dir: str):
    """Distributed heavy hitters: per-batch term-count combiner (the only
    thing crossing the exchange is unique terms per batch) → small global
    groupby → top-50.  The wordcount shape every corpus-stats job needs."""
    import re
    from collections import Counter
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    token_re = re.compile(r"[a-z]+")

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch["text"].to_pylist():
            counts.update(token_re.findall((text or "").lower()))
        return pa.table({"term": pa.array(list(counts.keys()), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    totals = _sf_documents(sf_dir).map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n"))

    def to_int(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n"] = batch["n"].astype("int64")
        return batch
    return totals.map_batches(to_int, batch_format="pandas") \
                 .sort(["n", "term"], descending=[True, False]).limit(50)


def q_frequent_ngrams(sf_dir: str):
    """Exact frequent bigrams via the bounded sketch+verify operator
    (``stages/stats.frequent_ngrams``): per-batch top-k sketch with a
    tracked error bound -> candidate broadcast -> exact re-count.  The
    runtime completeness check (threshold > E, else exact fallback)
    keeps the output exact on every path, so a plain GROUP BY ...
    HAVING oracle replays it verbatim."""
    from rdfa_streaming_parser_js_ray.stages.stats import frequent_ngrams
    return frequent_ngrams(_sf_documents(sf_dir), threshold=30, n=2,
                           sketch_k=1024)


def q_events_filtered(sf_dir: str):
    """Prune at the read: column projection + row-filter expression pushed
    into read_parquet (only matching row groups/columns leave storage),
    then a pre-aggregated rollup."""
    import ray.data as rd
    import pandas as pd
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"],
        filter=(pads.field("value") > 50.0))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        grouped = batch.groupby("event_type", as_index=False).agg(
            n_events=("value", "size"), sum_value_cents=("value", "sum"))
        grouped["sum_value_cents"] = (grouped["sum_value_cents"] * 100).round()
        return grouped

    out = events.map_batches(partial, batch_format="pandas") \
        .groupby("event_type").aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_cents", alias_name="sum_value_cents"))

    def to_int(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_events"] = batch["n_events"].astype("int64")
        batch["sum_value_cents"] = batch["sum_value_cents"].round().astype("int64")
        return batch
    return out.map_batches(to_int, batch_format="pandas")


def q_degree_histogram(sf_dir: str):
    """Two-level aggregation over the extracted graph: per-subject
    out-degree (combiner + grouped Sum), then the degree distribution."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    triples = _extract(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(["subj"]).group_by("subj") \
                    .aggregate([("subj", "count")]) \
                    .rename_columns(["subj", "out_degree"])

    degrees = triples.map_batches(partial, batch_format="pyarrow") \
        .groupby("subj").aggregate(Sum("out_degree", alias_name="out_degree"))
    hist = degrees.groupby("out_degree").aggregate(Count(alias_name="n_subjects"))

    def to_int(batch: pd.DataFrame) -> pd.DataFrame:
        batch["out_degree"] = batch["out_degree"].astype("int64")
        batch["n_subjects"] = batch["n_subjects"].astype("int64")
        return batch
    return hist.map_batches(to_int, batch_format="pandas")


def q_media_frames(sf_dir: str):
    """Video frame sampling: each video ref explodes to n evenly-spaced
    decoded frames (stub codec, real fan-out plumbing); returns the frame
    index manifest (tensors dropped for the driver compare)."""
    from rdfa_streaming_parser_js_ray.stages.media import (
        media_manifest, sample_video_frames,
    )
    import pandas as pd

    frames = sample_video_frames(media_manifest(_wrapped_docs(sf_dir)),
                                 n_frames=3, concurrency=2)

    def meta(batch: dict) -> pd.DataFrame:
        return pd.DataFrame({"media_ref": batch["media_ref"],
                             "doc_id": batch["doc_id"],
                             "frame_index": batch["frame_index"]})
    return frames.map_batches(meta, batch_format="numpy")


def q_span_audit(sf_dir: str):
    from rdfa_streaming_parser_js_ray.stages.extract import span_audit
    return span_audit(_wrapped_docs(sf_dir))


def q_pack_docs(sf_dir: str):
    """Token-budget contiguous packing (distributed prefix sum): pack_id
    = global token prefix // budget under the deterministic
    (md5-bucket, doc_id) order; the driver sees only the 16 per-bucket
    totals.  SQL-replayable via md5_number + a window SUM."""
    from rdfa_streaming_parser_js_ray.stages.pack import pack_documents
    return pack_documents(_sf_documents(sf_dir), budget=2048,
                          num_buckets=16)


def q_shard_manifest(sf_dir: str):
    """Seeded epoch-shuffle shard manifest: shard + in-shard position
    from a uint64 md5 rank — a reshufflable training permutation with
    ONE slim grouped exchange instead of a payload random_shuffle."""
    from rdfa_streaming_parser_js_ray.stages.pack import shard_documents
    return shard_documents(_sf_documents(sf_dir), n_shards=8, seed="epoch0")


def q_k_core(sf_dir: str):
    """k-core decomposition (k=40, iterative degree peeling, 3 rounds
    max) of the undirected customer–supplier purchase graph; the oracle
    replays the same peels unrolled — converged extra rounds are
    no-ops, so early exit equals the full unroll."""
    import pandas as pd
    import ray.data as rd

    from rdfa_streaming_parser_js_ray.stages.graph import k_core
    from rdfa_streaming_parser_js_ray.stages.joins import hash_join
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"]) \
        .map_batches(lambda b: b.rename(columns={"o_orderkey": "orderkey"}),
                     batch_format="pandas")
    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey"]) \
        .map_batches(lambda b: b.rename(columns={"l_orderkey": "orderkey"}),
                     batch_format="pandas")
    joined = hash_join(orders, lineitem, on="orderkey")

    def to_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": "c" + batch["o_custkey"].astype(str),
            "dst": "s" + batch["l_suppkey"].astype(str),
        })

    edges = joined.map_batches(to_edges, batch_format="pandas")
    return k_core(edges, k=40, max_rounds=3)


def q_snapshot_diff(sf_dir: str):
    """Incremental-ingest delta: compare the corpus against a
    deterministically perturbed second snapshot (drop %50==7, edit
    %37==0, add %100==3 under new ids) by md5 content hash; only
    added/removed/changed rows leave the outer hash-join stage."""
    import pandas as pd

    from rdfa_streaming_parser_js_ray.sources.documents import (
        read_parquet_clean,
    )
    from rdfa_streaming_parser_js_ray.stages.snapshot import snapshot_diff
    old = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])

    def make_new(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["doc_id"] % 50 != 7].copy()
        mod = keep["doc_id"] % 37 == 0
        keep.loc[mod, "text"] = keep.loc[mod, "text"] + " v2"
        add = batch[batch["doc_id"] % 100 == 3]
        added = pd.DataFrame({
            "doc_id": add["doc_id"] + 1_000_000,
            "text": "new doc " + add["doc_id"].astype(str),
        })
        return pd.concat([keep[["doc_id", "text"]], added],
                         ignore_index=True)

    new = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]) \
        .map_batches(make_new, batch_format="pandas")
    return snapshot_diff(old, new, num_buckets=16)


def q_validate_columns(sf_dir: str):
    """Data-quality gate over events: per-(column, rule) violation
    counts; one partial row per rule per batch crosses the wire."""
    import ray.data as rd

    from rdfa_streaming_parser_js_ray.stages.snapshot import validate_columns
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_type", "value"])
    return validate_columns(events, {
        "user_id": {"not_null": True, "min": 0},
        "event_type": {"allowed": ["click", "view", "purchase"]},
        "value": {"not_null": True, "min": 0.0, "max": 200.0},
    })


def q_pack_chunks(sf_dir: str):
    """Composed training-batch manifest: chunk to 512-token windows
    (64 overlap) then pack the chunks into 1024-token training windows
    — budget >= window guarantees single-boundary packs, and a doc's
    chunks stay contiguous under the (bucket, doc_id, chunk_index)
    order."""
    from rdfa_streaming_parser_js_ray.stages.pack import pack_token_windows
    return pack_token_windows(_sf_documents(sf_dir), window=512,
                              overlap=64, budget=1024, num_buckets=16)


def q_sample_per_source(sf_dir: str):
    """Deterministic stratified sample: 5 docs per source by seeded md5
    rank; per-batch k-min combiner bounds what crosses the exchange."""
    from rdfa_streaming_parser_js_ray.sources.documents import (
        read_parquet_clean,
    )
    from rdfa_streaming_parser_js_ray.stages.pack import sample_per_group
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "source"])
    return sample_per_group(docs, group_col="source", k=5, seed="s0")


def q_chunk_windows(sf_dir: str):
    """Map-only long-document windowing: 512-token windows with
    64-token overlap, exact-integer chunk math, empty docs keep one
    empty chunk."""
    from rdfa_streaming_parser_js_ray.stages.pack import token_window_chunks
    return token_window_chunks(_sf_documents(sf_dir), window=512,
                               overlap=64)


# --------------------------------------------------------------------- #
# contract

def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    return q_kg_construct("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """Registered pipelines, ordered for the sequential driver gate:
    memo-warmers first (rdfa_extract / kg_construct feed the shared
    session views), then every ORACLED query cheapest-first, then the
    rows-only queries.  If the driver's wall budget cuts the suite
    mid-run (the round-4 artifact stopped at entry 50), the recorded
    prefix maximizes hash-checked oracle rows.  Ordering is cosmetic
    for correctness: every query is independent (the session memo is
    compute-on-first-use).
    """
    return {
        "rdfa_extract": q_rdfa_extract,
        "rdfa_triple_counts": q_rdfa_triple_counts,
        "kg_construct": q_kg_construct,
        "chunk_windows": q_chunk_windows,
        "degree_histogram": q_degree_histogram,
        "source_mix": q_source_mix,
        "train_val_split": q_train_val_split,
        "bgp_titles": q_bgp_titles,
        "bpe_token_counts": q_bpe_token_counts,
        "quantize_embeddings": q_quantize,
        "repetition": q_repetition,
        "simhash_md5": q_simhash_md5,
        "token_counts": q_token_counts,
        "validate_columns": q_validate_columns,
        "distinct_langs": q_distinct_langs,
        "inverted_index": q_inverted_index,
        "kmv_distinct": q_kmv_distinct,
        "normalize_text": q_normalize,
        "quality": q_quality,
        "quality_melt": q_quality_melt,
        "cumulative_spend": q_cumulative_spend,
        "sources_with_en_not_de": q_sources_with_en_not_de,
        "party_balances": q_party_balances,
        "balance_deciles": q_balance_deciles,
        "customer_order_counts": q_customer_order_counts,
        "order_date_ranks": q_order_date_ranks,
        "daily_order_vs_ship": q_daily_order_vs_ship,
        "price_corr_stats": q_price_corr_stats,
        "funnel_users": q_funnel_users,
        "latest_events": q_latest_events,
        "hourly_user_load": q_hourly_user_load,
        "lang_len_quartiles": q_lang_len_quartiles,
        "shard_manifest": q_shard_manifest,
        "top_docs_by_tokens": q_top_docs_by_tokens,
        "top_docs_per_lang": q_top_docs_per_lang,
        "kmv_users": q_kmv_users,
        "rolling_features": q_rolling_features,
        "sample_per_source": q_sample_per_source,
        "dedup_corpus": q_dedup_corpus,
        "top_terms": q_top_terms,
        "pack_chunks": q_pack_chunks,
        "pricing_summary": q_pricing_summary,
        "shipping_priority": q_shipping_priority,
        "returned_revenue": q_returned_revenue,
        "nation_revenue": q_nation_revenue,
        "revenue_forecast": q_revenue_forecast,
        "large_volume_customers": q_large_volume_customers,
        "lang_mode_per_source": q_lang_mode_per_source,
        "docs_above_source_avg": q_docs_above_source_avg,
        "langs_per_source": q_langs_per_source,
        "sources_with_en_and_de": q_sources_with_en_and_de,
        "sessionize": q_sessionize,
        "snapshot_diff": q_snapshot_diff,
        "source_summary": q_source_summary,
        "token_quantiles": q_token_quantiles,
        "join_semi": q_join_semi,
        "lang_pivot": q_lang_pivot,
        "source_rollup": q_source_rollup,
        "asof_orders": q_asof_orders,
        "pack_docs": q_pack_docs,
        "shipments_in_window": q_shipments_in_window,
        "props_stats": q_props_stats,
        "exact_dedup": q_exact_dedup,
        "pii_redact": q_pii_redact,
        "suppliers_by_region": q_suppliers_by_region,
        "embedding_near_dups": q_embedding_near_dups,
        "winnow_pairs": q_winnow_pairs,
        "embedding_dedup_clusters": q_embedding_dedup_clusters,
        "events_filtered": q_events_filtered,
        "lang_id": q_lang_id,
        "pagerank": q_pagerank,
        "winnow": q_winnow,
        "join_broadcast": q_join_broadcast,
        "kg_predicate_stats": q_kg_predicate_stats,
        "ann_topk": q_ann_topk,
        "part_triangles": q_part_triangles,
        "frequent_ngrams": q_frequent_ngrams,
        "k_core": q_k_core,
        "semantic_decontam": q_semantic_decontam,
        "join_hash": q_join_hash,
        "token_band_filter": q_token_band_filter,
        "window_agg": q_window_agg,
        "knn_graph": q_knn_graph,
        "sliding_window": q_sliding_window,
        "interval_overlap": q_interval_overlap,
        "decontam": q_decontam,
        "ann_ivf_exhaustive": q_ann_ivf_exhaustive,
        "dedup_clusters": q_dedup_clusters,
        "tfidf": q_tfidf,
        "corpus_prep": q_corpus_prep,
        "minhash_near_dups": q_minhash_near_dups,
        "kg_incremental": q_kg_incremental,
        "corpus_prep_full": q_corpus_prep_full,
        "fuzzy_decontam": q_fuzzy_decontam,
        "media_manifest": q_media_manifest,
        "span_audit": q_span_audit,
        "media_frames": q_media_frames,
        "fingerprints": q_fingerprints,
        "simhash": q_simhash,
        "media_features": q_media_features,
        "ann_ivf": q_ann_ivf,
        "kg_lineage": q_kg_lineage,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rdfa_extract": """
            WITH docs AS (
              SELECT doc_id AS i, 'doc-' || CAST(doc_id AS VARCHAR) AS doc_id,
                     'http://data.example/doc/' || CAST(doc_id AS VARCHAR) AS subj,
                     'http://mirror.example/doc/' || CAST(doc_id AS VARCHAR) AS msubj,
                     text, lang, source
              FROM documents)
            SELECT doc_id, subj, 'http://purl.org/dc/terms/title' AS pred,
                   'literal' AS obj_kind, text AS obj_value, lang AS obj_lang
            FROM docs
            UNION ALL
            SELECT doc_id, subj, 'http://purl.org/dc/terms/source' AS pred,
                   'iri' AS obj_kind,
                   'http://data.example/src/' || source AS obj_value,
                   '' AS obj_lang
            FROM docs
            UNION ALL
            SELECT doc_id, subj, 'http://purl.org/dc/terms/identifier' AS pred,
                   'literal' AS obj_kind,
                   'doc' || CAST(i AS VARCHAR) AS obj_value, lang AS obj_lang
            FROM docs
            UNION ALL
            SELECT doc_id, msubj, 'http://purl.org/dc/terms/title' AS pred,
                   'literal' AS obj_kind, text AS obj_value, lang AS obj_lang
            FROM docs WHERE i % 50 = 7
            UNION ALL
            SELECT doc_id, msubj, 'http://purl.org/dc/terms/identifier' AS pred,
                   'literal' AS obj_kind,
                   'doc' || CAST(i AS VARCHAR) AS obj_value, lang AS obj_lang
            FROM docs WHERE i % 50 = 7
        """,
        "rdfa_triple_counts": """
            SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(CASE WHEN doc_id % 50 = 7 THEN 5 ELSE 3 END AS BIGINT)
                     AS n_triples
            FROM documents
        """,
        "kg_construct": _KG_SQL,
        "kg_incremental": _KG_SQL,
        "kg_predicate_stats": f"""
            WITH kg AS ({_KG_SQL})
            SELECT pred, COUNT(*) AS n_triples,
                   COUNT(DISTINCT subj) AS n_subj,
                   COUNT(DISTINCT obj_value) AS n_obj
            FROM kg GROUP BY pred
        """,
        "bgp_titles": f"""
            WITH kg AS ({_KG_SQL})
            SELECT a.subj AS d, b.obj_value AS title
            FROM kg a JOIN kg b ON a.subj = b.subj
            WHERE a.pred = 'http://purl.org/dc/terms/source'
              AND a.obj_value = 'http://data.example/src/src1'
              AND b.pred = 'http://purl.org/dc/terms/title'
        """,
        "inverted_index": """
            WITH post AS (
              SELECT DISTINCT doc_id, token FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z]+'))
                         AS token
                FROM documents)),
            ok AS (SELECT token FROM post
                   GROUP BY token HAVING COUNT(*) BETWEEN 5 AND 50)
            SELECT p.token, p.doc_id FROM post p JOIN ok USING (token)
        """,
        "exact_dedup": """
            SELECT md5(text) AS text_hash, MIN(doc_id) AS doc_id,
                   COUNT(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "dedup_corpus": """
            SELECT doc_id, text FROM (
              SELECT doc_id, text,
                     row_number() OVER (PARTITION BY md5(text)
                                        ORDER BY doc_id) AS rn
              FROM documents) WHERE rn = 1
        """,
        "token_counts": """
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        """,
        "pack_docs": """
            WITH t AS (
              SELECT doc_id,
                     CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
                       AS n_tokens,
                     CAST(((md5_number(CAST(doc_id AS VARCHAR)) % 16) + 16)
                          % 16 AS BIGINT) AS bucket
              FROM documents),
            c AS (
              SELECT doc_id, n_tokens, bucket,
                     SUM(n_tokens) OVER (ORDER BY bucket, doc_id
                                         ROWS UNBOUNDED PRECEDING)
                       - n_tokens AS cum0
              FROM t)
            SELECT doc_id, n_tokens, bucket,
                   CAST(cum0 // 2048 AS BIGINT) AS pack_id,
                   CAST(cum0 - (cum0 // 2048) * 2048 AS BIGINT) AS pack_offset
            FROM c
        """,
        "k_core": """
            WITH e0 AS (
              SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              FROM (
                SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                       's' || CAST(l_suppkey AS VARCHAR) AS dst
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
              WHERE src <> dst),
            d1 AS (SELECT node, COUNT(*) AS deg FROM (
                     SELECT a AS node FROM e0
                     UNION ALL SELECT b FROM e0) GROUP BY node),
            a1 AS (SELECT node FROM d1 WHERE deg >= 40),
            e1 AS (SELECT e0.a, e0.b FROM e0
                   JOIN a1 x ON e0.a = x.node JOIN a1 y ON e0.b = y.node),
            d2 AS (SELECT node, COUNT(*) AS deg FROM (
                     SELECT a AS node FROM e1
                     UNION ALL SELECT b FROM e1) GROUP BY node),
            a2 AS (SELECT node FROM d2 WHERE deg >= 40),
            e2 AS (SELECT e1.a, e1.b FROM e1
                   JOIN a2 x ON e1.a = x.node JOIN a2 y ON e1.b = y.node),
            d3 AS (SELECT node, COUNT(*) AS deg FROM (
                     SELECT a AS node FROM e2
                     UNION ALL SELECT b FROM e2) GROUP BY node),
            a3 AS (SELECT node FROM d3 WHERE deg >= 40),
            e3 AS (SELECT e2.a, e2.b FROM e2
                   JOIN a3 x ON e2.a = x.node JOIN a3 y ON e2.b = y.node)
            SELECT node, CAST(deg AS BIGINT) AS degree FROM (
              SELECT node, COUNT(*) AS deg FROM (
                SELECT a AS node FROM e3
                UNION ALL SELECT b FROM e3) GROUP BY node)
            WHERE deg >= 40
        """,
        "snapshot_diff": """
            WITH old AS (
              SELECT doc_id, md5(text) AS h FROM documents),
            neww AS (
              SELECT doc_id,
                     md5(text || CASE WHEN doc_id % 37 = 0
                                      THEN ' v2' ELSE '' END) AS h
              FROM documents WHERE doc_id % 50 <> 7
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id,
                     md5('new doc ' || CAST(doc_id AS VARCHAR)) AS h
              FROM documents WHERE doc_id % 100 = 3),
            j AS (
              SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                     o.h AS h_old, n.h AS h_new
              FROM old o FULL OUTER JOIN neww n ON o.doc_id = n.doc_id)
            SELECT doc_id,
                   CASE WHEN h_old IS NULL THEN 'added'
                        WHEN h_new IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM j
            WHERE h_old IS NULL OR h_new IS NULL OR h_old <> h_new
        """,
        "validate_columns": """
            SELECT 'user_id' AS col, 'not_null' AS rule,
                   CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS violations,
                   CAST(COUNT(*) AS BIGINT) AS n_rows FROM events
            UNION ALL
            SELECT 'user_id', 'min',
                   CAST(SUM(CASE WHEN user_id IS NOT NULL AND user_id < 0
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM events
            UNION ALL
            SELECT 'event_type', 'allowed',
                   CAST(SUM(CASE WHEN event_type IS NOT NULL
                                  AND event_type NOT IN
                                      ('click', 'view', 'purchase')
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM events
            UNION ALL
            SELECT 'value', 'not_null',
                   CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM events
            UNION ALL
            SELECT 'value', 'min',
                   CAST(SUM(CASE WHEN value IS NOT NULL AND value < 0.0
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM events
            UNION ALL
            SELECT 'value', 'max',
                   CAST(SUM(CASE WHEN value IS NOT NULL AND value > 200.0
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM events
        """,
        "pack_chunks": """
            WITH t AS (
              SELECT doc_id,
                     CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
                       AS n,
                     CAST(((md5_number(CAST(doc_id AS VARCHAR)) % 16) + 16)
                          % 16 AS BIGINT) AS bucket
              FROM documents),
            ch AS (
              SELECT doc_id, bucket,
                     CAST(gs AS BIGINT) AS chunk_index,
                     CAST(LEAST(gs * 448 + 512, n) - gs * 448 AS BIGINT)
                       AS n_tokens
              FROM (
                SELECT doc_id, n, bucket,
                       unnest(generate_series(
                           0, (GREATEST(n - 512, 0) + 447) // 448)) AS gs
                FROM t)),
            c AS (
              SELECT doc_id, chunk_index, n_tokens, bucket,
                     SUM(n_tokens) OVER (ORDER BY bucket, doc_id, chunk_index
                                         ROWS UNBOUNDED PRECEDING)
                       - n_tokens AS cum0
              FROM ch)
            SELECT doc_id, chunk_index, n_tokens, bucket,
                   CAST(cum0 // 1024 AS BIGINT) AS pack_id,
                   CAST(cum0 - (cum0 // 1024) * 1024 AS BIGINT) AS pack_offset
            FROM c
        """,
        "sample_per_source": """
            WITH t AS (
              SELECT doc_id, source,
                     CAST(((md5_number('s0:' || CAST(doc_id AS VARCHAR))
                            % 18446744073709551616) + 18446744073709551616)
                          % 18446744073709551616 AS UBIGINT) AS rank
              FROM documents)
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY rank, doc_id) AS rn
              FROM t) WHERE rn <= 5
        """,
        "shard_manifest": """
            WITH t AS (
              SELECT doc_id,
                     CAST(((md5_number('epoch0:' || CAST(doc_id AS VARCHAR))
                            % 18446744073709551616) + 18446744073709551616)
                          % 18446744073709551616 AS UBIGINT) AS rank
              FROM documents)
            SELECT doc_id,
                   CAST(rank % 8 AS BIGINT) AS shard,
                   CAST(row_number() OVER (PARTITION BY rank % 8
                                           ORDER BY rank, doc_id) - 1
                        AS BIGINT) AS pos
            FROM t
        """,
        "chunk_windows": """
            WITH t AS (
              SELECT doc_id,
                     CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
                       AS n
              FROM documents)
            SELECT doc_id,
                   CAST(gs AS BIGINT) AS chunk_index,
                   CAST(gs * 448 AS BIGINT) AS tok_start,
                   CAST(LEAST(gs * 448 + 512, n) AS BIGINT) AS tok_end
            FROM (
              SELECT doc_id, n,
                     unnest(generate_series(
                         0, (GREATEST(n - 512, 0) + 447) // 448)) AS gs
              FROM t)
        """,
        "bpe_token_counts": """
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "quality": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
                   CAST(length(regexp_extract_all(text, '[^A-Za-z0-9_ \\t\\n\\r]')) AS BIGINT) AS n_punct,
                   CAST(length(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS BIGINT) AS n_distinct,
                   CAST(length(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                        x -> list_contains({_STOP_SQL}, x))) AS BIGINT) AS n_stop
            FROM documents
        """,
        "quality_melt": f"""
            WITH q AS (
              SELECT doc_id,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
                     CAST(length(regexp_extract_all(text, '[^A-Za-z0-9_ \\t\\n\\r]')) AS BIGINT) AS n_punct,
                     CAST(length(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS BIGINT) AS n_distinct,
                     CAST(length(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                          x -> list_contains({_STOP_SQL}, x))) AS BIGINT) AS n_stop
              FROM documents)
            SELECT doc_id, 'n_chars' AS metric, n_chars AS value FROM q
            UNION ALL SELECT doc_id, 'n_words', n_words FROM q
            UNION ALL SELECT doc_id, 'n_punct', n_punct FROM q
            UNION ALL SELECT doc_id, 'n_distinct', n_distinct FROM q
            UNION ALL SELECT doc_id, 'n_stop', n_stop FROM q
        """,
        "cumulative_spend": """
            SELECT o_custkey, o_orderkey,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        OVER w AS BIGINT) AS cum_cents
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS UNBOUNDED PRECEDING)
        """,
        "sources_with_en_not_de": """
            SELECT source FROM documents WHERE lang = 'en'
            EXCEPT
            SELECT source FROM documents WHERE lang = 'de'
        """,
        "party_balances": """
            WITH u AS (
              SELECT c_nationkey AS nationkey,
                     CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
                     1 AS is_cust
              FROM customer
              UNION ALL
              SELECT s_nationkey,
                     CAST(ROUND(s_acctbal * 100) AS BIGINT), 0
              FROM supplier)
            SELECT CAST(nationkey AS BIGINT) AS nationkey,
                   CAST(SUM(is_cust) AS BIGINT) AS n_customers,
                   CAST(COUNT(*) - SUM(is_cust) AS BIGINT) AS n_suppliers,
                   CAST(SUM(cents) AS BIGINT) AS total_bal_cents
            FROM u GROUP BY 1
        """,
        "hourly_user_load": """
            SELECT DISTINCT user_id, ts,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                     AS BIGINT) AS range_sum_cents,
                   CAST(COUNT(*) OVER w AS BIGINT) AS range_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
        """,
        "lang_len_quartiles": """
            WITH t AS (
              SELECT lang, n_chars,
                     NTILE(4) OVER (PARTITION BY lang
                                    ORDER BY n_chars, doc_id) AS tile
              FROM documents)
            SELECT lang, CAST(tile AS BIGINT) AS tile,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(MIN(n_chars) AS BIGINT) AS min_chars,
                   CAST(MAX(n_chars) AS BIGINT) AS max_chars
            FROM t GROUP BY 1, 2
        """,
        "latest_events": """
            SELECT user_id, event_type, event_id, ts, value FROM (
              SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1
        """,
        "funnel_users": """
            WITH c AS (
              SELECT user_id, MIN(ts) AS t_click FROM events
              WHERE event_type = 'click' GROUP BY 1),
            v AS (
              SELECT e.user_id, MIN(e.ts) AS t_view
              FROM events e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'view' AND e.ts > c.t_click
              GROUP BY 1),
            b AS (
              SELECT e.user_id, MIN(e.ts) AS t_purchase
              FROM events e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'purchase' AND e.ts > v.t_view
              GROUP BY 1)
            SELECT b.user_id, c.t_click, v.t_view, b.t_purchase
            FROM b JOIN v ON b.user_id = v.user_id
            JOIN c ON b.user_id = c.user_id
        """,
        "daily_order_vs_ship": """
            WITH o AS (
              SELECT date_trunc('day', o_orderdate) AS day,
                     CAST(COUNT(*) AS BIGINT) AS n_orders
              FROM orders GROUP BY 1),
            s AS (
              SELECT date_trunc('day', l_shipdate) AS day,
                     CAST(COUNT(*) AS BIGINT) AS n_ship
              FROM lineitem GROUP BY 1)
            SELECT COALESCE(o.day, s.day) AS day,
                   COALESCE(o.n_orders, 0) AS n_orders,
                   COALESCE(s.n_ship, 0) AS n_ship
            FROM o FULL OUTER JOIN s ON o.day = s.day
        """,
        "price_corr_stats": """
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                     AS sum_q,
                   CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT))
                     AS BIGINT) AS sum_p,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                          * CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                     AS sum_qq,
                   CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)
                          * CAST(ROUND(l_extendedprice) AS BIGINT))
                     AS BIGINT) AS sum_pp,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                          * CAST(ROUND(l_extendedprice) AS BIGINT))
                     AS BIGINT) AS sum_qp
            FROM lineitem GROUP BY 1
        """,
        "order_date_ranks": """
            SELECT o_custkey, o_orderkey,
                   CAST(RANK() OVER w AS BIGINT) AS date_rank,
                   CAST(DENSE_RANK() OVER w AS BIGINT) AS date_dense_rank
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
        """,
        "customer_order_counts": """
            WITH a AS (
              SELECT o_custkey AS c_custkey,
                     CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS spend_cents
              FROM orders GROUP BY 1)
            SELECT c.c_custkey, c.c_name,
                   COALESCE(a.n_orders, 0) AS n_orders,
                   COALESCE(a.spend_cents, 0) AS spend_cents
            FROM customer c LEFT JOIN a USING (c_custkey)
        """,
        "balance_deciles": """
            WITH t AS (
              SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
                     NTILE(10) OVER (
                       ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT),
                                c_custkey) AS tile
              FROM customer)
            SELECT CAST(tile AS BIGINT) AS tile,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents,
                   CAST(MIN(cents) AS BIGINT) AS min_cents,
                   CAST(MAX(cents) AS BIGINT) AS max_cents
            FROM t GROUP BY 1
        """,
        "pagerank": """
            WITH edges AS (
              SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                     's' || CAST(l_suppkey AS VARCHAR) AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            nodes AS (
              SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION SELECT dst FROM edges)),
            deg AS (SELECT src AS node, COUNT(*) AS d
                    FROM edges GROUP BY 1),
            params AS (
              SELECT CAST(1000000000 // COUNT(*) AS BIGINT) AS init,
                     CAST(15 * (1000000000 // COUNT(*)) // 100 AS BIGINT)
                         AS base
              FROM nodes),
            r0 AS (SELECT node, (SELECT init FROM params) AS rank
                   FROM nodes),
            c1 AS (
              SELECT r0.node, r0.rank // d AS c
              FROM r0 JOIN deg USING (node)),
            s1 AS (
              SELECT e.dst AS node, SUM(c) AS s
              FROM edges e JOIN c1 ON e.src = c1.node GROUP BY 1),
            r1 AS (
              SELECT n.node,
                     (SELECT base FROM params)
                     + 85 * COALESCE(s, 0) // 100 AS rank
              FROM nodes n LEFT JOIN s1 USING (node)),
            c2 AS (
              SELECT r1.node, r1.rank // d AS c
              FROM r1 JOIN deg USING (node)),
            s2 AS (
              SELECT e.dst AS node, SUM(c) AS s
              FROM edges e JOIN c2 ON e.src = c2.node GROUP BY 1),
            r2 AS (
              SELECT n.node,
                     (SELECT base FROM params)
                     + 85 * COALESCE(s, 0) // 100 AS rank
              FROM nodes n LEFT JOIN s2 USING (node)),
            c3 AS (
              SELECT r2.node, r2.rank // d AS c
              FROM r2 JOIN deg USING (node)),
            s3 AS (
              SELECT e.dst AS node, SUM(c) AS s
              FROM edges e JOIN c3 ON e.src = c3.node GROUP BY 1),
            r3 AS (
              SELECT n.node,
                     (SELECT base FROM params)
                     + 85 * COALESCE(s, 0) // 100 AS rank
              FROM nodes n LEFT JOIN s3 USING (node))
            SELECT node, CAST(rank AS BIGINT) AS rank FROM r3
        """,
        "knn_graph": """
            WITH scored AS (
              SELECT q.vec_id AS src_id, e.vec_id AS dst_id,
                     CASE WHEN list_dot_product(e.embedding, e.embedding) = 0
                            OR list_dot_product(q.embedding, q.embedding) = 0
                          THEN 0.0
                          ELSE list_cosine_similarity(e.embedding,
                                                      q.embedding)
                     END AS score
              FROM embeddings e CROSS JOIN embeddings q
              WHERE e.vec_id <> q.vec_id),
            ranked AS (
              SELECT src_id, dst_id,
                     row_number() OVER (PARTITION BY src_id
                                        ORDER BY score DESC, dst_id)
                         AS rank
              FROM scored)
            SELECT src_id, CAST(rank AS BIGINT) AS rank, dst_id
            FROM ranked WHERE rank <= 5
        """,
        "source_mix": """
            SELECT doc_id, source FROM documents
            WHERE (doc_id * 2654435761) % 4294967296 % 10000 <
                  CASE WHEN CAST(substr(source, 4) AS BIGINT) % 3 = 0
                       THEN 2500 ELSE 7500 END
        """,
        "simhash_md5": """
            WITH tc AS (
              SELECT doc_id, tok, COUNT(*) AS w FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
                FROM documents) GROUP BY 1, 2),
            th AS (
              SELECT doc_id, w,
                     CAST(((md5_number(tok) % 18446744073709551616)
                           + 18446744073709551616) % 18446744073709551616
                          AS UBIGINT) AS h
              FROM tc),
            bits AS (
              SELECT doc_id, i.i AS i,
                     SUM(w * (2 * CAST((h // CAST(power(2, i.i) AS UBIGINT))
                                       % 2 AS BIGINT) - 1)) AS acc
              FROM th CROSS JOIN
                   (SELECT unnest(generate_series(0, 63)) AS i) i
              GROUP BY 1, 2),
            sh AS (
              SELECT doc_id,
                     SUM(CASE WHEN acc > 0
                              THEN CAST(power(2, i) AS HUGEINT)
                              ELSE 0 END) AS simhash_md5
              FROM bits GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(sh.simhash_md5, 0) AS UBIGINT) AS simhash_md5
            FROM documents d LEFT JOIN sh USING (doc_id)
        """,
        "corpus_prep": f"""
            WITH uniq AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       row_number() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn
                FROM documents) WHERE rn = 1),
            toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
              FROM uniq),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                         generate_series(1, greatest(1, len(t) - 2)),
                         i -> COALESCE(array_to_string(t[i:i+2], ' '), ''))) AS g
              FROM toks),
            victims AS (
              SELECT DISTINCT b.doc_id AS doc_b
              FROM grams a JOIN grams b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.g, b.g))::DOUBLE
                    / (len(a.g) + len(b.g)
                       - len(list_intersect(a.g, b.g))) >= 0.8),
            kept AS (
              SELECT u.doc_id, u.text FROM uniq u
              WHERE u.doc_id NOT IN (SELECT doc_b FROM victims)),
            scored AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\\S+')) AS n_words,
                     len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                         x -> list_contains({_STOP_SQL}, x))) AS n_stop,
                     greatest(len(regexp_extract_all(lower(text), '[a-z]+')),
                              1) AS n_letter
              FROM kept)
            SELECT doc_id,
                   CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'val' END
                       AS split
            FROM scored
            WHERE n_words >= 5 AND n_stop::DOUBLE / n_letter <= 0.9
        """,
        "corpus_prep_full": f"""
            WITH norm AS (
              SELECT doc_id,
                     trim(regexp_replace(
                         lower(nfc_normalize(COALESCE(text, ''))),
                         '\\s+', ' ', 'g')) AS text
              FROM documents),
            uniq AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       row_number() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn
                FROM norm) WHERE rn = 1),
            toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
              FROM uniq),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                         generate_series(1, greatest(1, len(t) - 2)),
                         i -> COALESCE(array_to_string(t[i:i+2], ' '), ''))) AS g
              FROM toks),
            victims AS (
              SELECT DISTINCT b.doc_id AS doc_b
              FROM grams a JOIN grams b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.g, b.g))::DOUBLE
                    / (len(a.g) + len(b.g)
                       - len(list_intersect(a.g, b.g))) >= 0.8),
            kept AS (
              SELECT u.doc_id, u.text FROM uniq u
              WHERE u.doc_id NOT IN (SELECT doc_b FROM victims)),
            btoks AS (
              SELECT regexp_extract_all(lower(text), '\\S+') AS t
              FROM documents WHERE doc_id % 97 = 3),
            bench_g AS (
              SELECT DISTINCT unnest(
                CASE WHEN len(t) <= 3 THEN [COALESCE(array_to_string(t, ' '), '')]
                ELSE list_transform(range(1, len(t) - 1),
                       i -> array_to_string(list_slice(t, i, i + 2), ' '))
                END) AS gr
              FROM btoks),
            dgrams AS (
              SELECT doc_id,
                CASE WHEN len(t) <= 3 THEN [COALESCE(array_to_string(t, ' '), '')]
                ELSE list_transform(range(1, len(t) - 1),
                       i -> array_to_string(list_slice(t, i, i + 2), ' '))
                END AS hs
              FROM toks),
            contaminated AS (
              SELECT DISTINCT doc_id FROM (
                SELECT doc_id, unnest(list_distinct(hs)) AS gr
                FROM dgrams)
              JOIN bench_g USING (gr)),
            decon AS (
              SELECT k.doc_id, k.text FROM kept k
              WHERE k.doc_id NOT IN
                    (SELECT doc_id FROM contaminated)),
            scored AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\\S+')) AS n_words,
                     len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                         x -> list_contains({_STOP_SQL}, x))) AS n_stop,
                     greatest(len(regexp_extract_all(lower(text), '[a-z]+')),
                              1) AS n_letter
              FROM decon)
            SELECT doc_id,
                   CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'val' END
                       AS split
            FROM scored
            WHERE n_words >= 5 AND n_stop::DOUBLE / n_letter <= 0.9
        """,
        "minhash_near_dups": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
              FROM documents),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                         generate_series(1, greatest(1, len(t) - 2)),
                         i -> COALESCE(array_to_string(t[i:i+2], ' '), ''))) AS g
              FROM toks),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     len(list_intersect(a.g, b.g))::DOUBLE
                     / (len(a.g) + len(b.g)
                        - len(list_intersect(a.g, b.g))) AS j
              FROM grams a JOIN grams b ON a.doc_id < b.doc_id)
            SELECT doc_a, doc_b,
                   CAST(FLOOR(j * 1000000) AS BIGINT) AS jaccard_ppm
            FROM pairs WHERE j >= 0.5
        """,
        "dedup_clusters": """
            WITH RECURSIVE toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
              FROM documents),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                         generate_series(1, greatest(1, len(t) - 2)),
                         i -> COALESCE(array_to_string(t[i:i+2], ' '), ''))) AS g
              FROM toks),
            near AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM grams a JOIN grams b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.g, b.g))::DOUBLE
                    / (len(a.g) + len(b.g)
                       - len(list_intersect(a.g, b.g))) >= 0.5),
            edges AS (
              SELECT doc_a AS a, doc_b AS b FROM near
              UNION SELECT doc_b, doc_a FROM near),
            reach(node, r) AS (
              SELECT a, a FROM edges
              UNION
              SELECT reach.node, e.b FROM reach
              JOIN edges e ON reach.r = e.a),
            cc AS (
              SELECT node, MIN(r) AS component FROM reach GROUP BY node)
            SELECT d.doc_id,
                   COALESCE(cc.component, d.doc_id) AS cluster_id,
                   CAST(COALESCE(cc.component, d.doc_id) = d.doc_id
                        AS BIGINT) AS is_canonical
            FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
        """,
        "repetition": """
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(COUNT(DISTINCT line) AS BIGINT) AS n_distinct_lines,
                   CAST(MAX(length(line)) AS BIGINT) AS max_line_len
            FROM (SELECT doc_id,
                         unnest(string_split(text, chr(10))) AS line
                  FROM documents)
            GROUP BY doc_id
        """,
        "source_summary": """
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(SUM(length(text)) AS BIGINT) AS sum_chars
            FROM documents GROUP BY source
        """,
        "props_stats": """
            WITH vals AS (
              SELECT event_type,
                     CAST(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1)
                          AS BIGINT) AS v
              FROM events
              WHERE regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) <> '')
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(v) AS BIGINT) AS sum_k,
                   CAST(MIN(v) AS BIGINT) AS min_k,
                   CAST(MAX(v) AS BIGINT) AS max_k
            FROM vals GROUP BY event_type
        """,
        "ann_ivf_exhaustive": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.qid, e.vec_id,
                     CASE WHEN list_dot_product(e.embedding, e.embedding) = 0
                            OR list_dot_product(q.qe, q.qe) = 0 THEN 0.0
                          ELSE list_cosine_similarity(e.embedding, q.qe)
                     END AS score
              FROM embeddings e CROSS JOIN q),
            ranked AS (
              SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY score DESC, vec_id) AS rank
              FROM scored)
            SELECT qid, rank, vec_id FROM ranked WHERE rank <= 10
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.qid, e.vec_id,
                     CASE WHEN list_dot_product(e.embedding, e.embedding) = 0
                            OR list_dot_product(q.qe, q.qe) = 0 THEN 0.0
                          ELSE list_cosine_similarity(e.embedding, q.qe)
                     END AS score
              FROM embeddings e CROSS JOIN q),
            ranked AS (
              SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY score DESC, vec_id) AS rank
              FROM scored)
            SELECT qid, rank, vec_id FROM ranked WHERE rank <= 10
        """,
        "window_agg": """
            SELECT event_type,
                   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_s,
                   COUNT(*) AS n_events,
                   CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "sliding_window": """
            SELECT event_type,
                   ((epoch_us(ts) // 3600000000) - i) * 3600 AS window_start_s,
                   COUNT(*) AS n_events,
                   CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_cents
            FROM events CROSS JOIN (SELECT unnest(range(3)) AS i)
            GROUP BY 1, 2
        """,
        "asof_orders": """
            WITH o AS (
              SELECT o_custkey AS user_id, o_orderdate,
                     MAX(o_orderkey) AS o_orderkey
              FROM orders GROUP BY 1, 2)
            SELECT e.event_id, e.user_id,
                   epoch_us(e.ts) // 1000000 AS ts_s,
                   COALESCE(o.o_orderkey, -1) AS last_orderkey,
                   CAST(COALESCE(epoch(o.o_orderdate), 0) AS BIGINT)
                     AS last_orderdate_s
            FROM events e ASOF LEFT JOIN o
              ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
        """,
        "shipments_in_window": """
            SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT)
                     AS l_linenumber,
                   CAST(epoch(l.l_shipdate) AS BIGINT) AS ship_s,
                   CAST(epoch(o.o_orderdate) AS BIGINT) AS order_date_s
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey
             AND l.l_shipdate BETWEEN o.o_orderdate
                                  AND o.o_orderdate + INTERVAL 90 DAY
        """,
        "part_triangles": """
            WITH pairs AS (
              SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                              greatest(a.l_partkey, b.l_partkey) AS b
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey <> b.l_partkey
              WHERE a.l_linenumber <= 2 AND b.l_linenumber <= 2)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM pairs e1
            JOIN pairs e2 ON e1.b = e2.a
            JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
        """,
        "token_quantiles": """
            WITH t AS (
              SELECT lang,
                     CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
                       AS v
              FROM documents)
            SELECT lang, COUNT(*) AS n,
                   quantile_disc(v, 0.25) AS q25,
                   quantile_disc(v, 0.5) AS q50,
                   quantile_disc(v, 0.75) AS q75
            FROM t GROUP BY 1
        """,
        "top_docs_per_lang": """
            SELECT doc_id, lang, n_chars FROM (
              SELECT doc_id, lang, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY lang
                                        ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents) WHERE rn <= 3
        """,
        "sessionize": """
            -- both windows MUST share a fully deterministic order
            -- (ts, event_id): with duplicate timestamps and ORDER BY ts
            -- alone, DuckDB's two window scans may pick DIFFERENT tie
            -- orders under parallel execution, attaching the session-
            -- break flags to the wrong tied rows — a scheduling-
            -- dependent oracle flake the randomized sweep caught (the
            -- Ray pipeline was right; session CONTENTS are tie-order-
            -- invariant once both windows agree)
            WITH o AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id, ts,
                     SUM(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) - 1
                         AS session_id_raw
              FROM o)
            SELECT user_id, CAST(session_id_raw AS BIGINT) AS session_id,
                   CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
                   CAST(floor(epoch(MAX(ts))) AS BIGINT) AS session_end_s,
                   COUNT(*) AS n_events
            FROM s GROUP BY 1, 2
        """,
        "lang_pivot": """
            SELECT source,
                   COUNT(*) FILTER (lang = 'en') AS n_en,
                   CAST(COALESCE(SUM(n_chars) FILTER (lang = 'en'), 0)
                        AS BIGINT) AS sum_en,
                   COUNT(*) FILTER (lang = 'de') AS n_de,
                   CAST(COALESCE(SUM(n_chars) FILTER (lang = 'de'), 0)
                        AS BIGINT) AS sum_de,
                   COUNT(*) FILTER (lang = 'es') AS n_es,
                   CAST(COALESCE(SUM(n_chars) FILTER (lang = 'es'), 0)
                        AS BIGINT) AS sum_es,
                   COUNT(*) FILTER (lang = 'fr') AS n_fr,
                   CAST(COALESCE(SUM(n_chars) FILTER (lang = 'fr'), 0)
                        AS BIGINT) AS sum_fr,
                   COUNT(*) FILTER (lang NOT IN ('en','de','es','fr'))
                       AS n___OTHER__,
                   CAST(COALESCE(SUM(n_chars)
                        FILTER (lang NOT IN ('en','de','es','fr')), 0)
                        AS BIGINT) AS sum___OTHER__
            FROM documents GROUP BY source
        """,
        "source_rollup": """
            SELECT COALESCE(source, '__ALL__') AS source,
                   COALESCE(lang, '__ALL__') AS lang,
                   COUNT(*) AS n_rows,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
            FROM documents
            GROUP BY ROLLUP(source, lang)
        """,
        "rolling_features": """
            SELECT user_id, event_id,
                   CAST(COALESCE(ROUND(LAG(value) OVER w * 100), -1)
                        AS BIGINT) AS prev_cents,
                   CAST(SUM(CAST(ROUND(value*100) AS BIGINT))
                        OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS roll_sum_cents,
                   CAST(COUNT(*)
                        OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS roll_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "join_broadcast": """
            SELECT c_mktsegment,
                   COUNT(*) AS n_orders,
                   CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS total_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "join_hash": """
            SELECT o_orderpriority,
                   COUNT(*) AS n_items,
                   CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS sum_qty_cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1
        """,
        "top_docs_by_tokens": """
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
            ORDER BY n_tokens DESC, doc_id LIMIT 20
        """,
        "distinct_langs": "SELECT DISTINCT lang FROM documents",
        "top_terms": """
            SELECT term, COUNT(*) AS n
            FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                  FROM documents)
            GROUP BY term ORDER BY n DESC, term LIMIT 50
        """,
        "frequent_ngrams": """
            WITH toks AS (
              SELECT regexp_extract_all(lower(text), '[a-z]+') AS t
              FROM documents),
            grams AS (
              SELECT unnest(list_transform(
                       generate_series(1, len(t) - 1),
                       i -> array_to_string(t[i:i+1], ' '))) AS gram
              FROM toks WHERE len(t) >= 2)
            SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
            FROM grams GROUP BY gram HAVING COUNT(*) >= 30
        """,
        "events_filtered": """
            SELECT event_type, COUNT(*) AS n_events,
                   CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_cents
            FROM events WHERE value > 50.0 GROUP BY 1
        """,
        "train_val_split": """
            SELECT doc_id,
                   CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'val' END AS split
            FROM documents
        """,
        "suppliers_by_region": """
            SELECT r_name, COUNT(*) AS n_suppliers,
                   CAST(ROUND(SUM(s_acctbal) * 100) AS BIGINT) AS acctbal_cents
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1
        """,
        "degree_histogram": """
            WITH deg AS (
              SELECT subj, COUNT(*) AS out_degree FROM (
                SELECT 'http://data.example/doc/' || CAST(doc_id AS VARCHAR) AS subj
                FROM documents
                CROSS JOIN (SELECT unnest([1, 2, 3]) AS arm)
                UNION ALL
                SELECT 'http://mirror.example/doc/' || CAST(doc_id AS VARCHAR) AS subj
                FROM documents CROSS JOIN (SELECT unnest([1, 2]) AS arm)
                WHERE doc_id % 50 = 7
              ) GROUP BY subj)
            SELECT out_degree, COUNT(*) AS n_subjects FROM deg GROUP BY 1
        """,
        "shipping_priority": """
            SELECT o_orderkey AS orderkey, o_orderdate, o_orderpriority,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS revenue_e4
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < (SELECT date_trunc('day',
                    min(o_orderdate) + (max(o_orderdate) - min(o_orderdate))
                    / 100) FROM orders)
              AND l_shipdate > (SELECT date_trunc('day',
                    min(o_orderdate) + (max(o_orderdate) - min(o_orderdate))
                    / 100) FROM orders)
            GROUP BY 1, 2, 3
            ORDER BY revenue_e4 DESC, orderkey
            LIMIT 10
        """,
        "returned_revenue": """
            SELECT o_custkey AS custkey, c_name,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS revenue_e4
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE l_returnflag = 'R'
            GROUP BY 1, 2
            ORDER BY revenue_e4 DESC, custkey
            LIMIT 20
        """,
        "langs_per_source": """
            SELECT source,
                   string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs_csv,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
            FROM documents GROUP BY 1
        """,
        "sources_with_en_and_de": """
            SELECT source FROM documents WHERE lang = 'en'
            INTERSECT
            SELECT source FROM documents WHERE lang = 'de'
        """,
        "lang_mode_per_source": """
            WITH c AS (
              SELECT source, lang, COUNT(*) AS n
              FROM documents GROUP BY 1, 2),
            m AS (SELECT source, MAX(n) AS mx FROM c GROUP BY 1)
            SELECT c.source, MIN(c.lang) AS mode_lang,
                   CAST(MAX(c.n) AS BIGINT) AS n_docs
            FROM c JOIN m ON c.source = m.source AND c.n = m.mx
            GROUP BY 1
        """,
        "docs_above_source_avg": """
            WITH t AS (
              SELECT doc_id, source,
                     CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
                       AS n_tokens
              FROM documents),
            a AS (SELECT source, SUM(n_tokens) AS total, COUNT(*) AS cnt
                  FROM t GROUP BY 1)
            SELECT t.doc_id, t.source, t.n_tokens
            FROM t JOIN a ON t.source = a.source
            WHERE t.n_tokens * a.cnt > a.total
        """,
        "revenue_forecast": """
            SELECT CAST(COALESCE(SUM(
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(ROUND(l_discount * 100) AS BIGINT)), 0)
                   AS BIGINT) AS revenue_e4,
                   COUNT(*) AS n_items
            FROM lineitem
            WHERE l_quantity < 25
              AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 2 AND 8
        """,
        "large_volume_customers": """
            WITH per AS (
              SELECT l_orderkey AS o_orderkey,
                     CAST(SUM(ROUND(l_quantity * 100)) AS BIGINT) AS qty_cents
              FROM lineitem GROUP BY 1
              HAVING CAST(SUM(ROUND(l_quantity * 100)) AS BIGINT) > 25000)
            SELECT o.o_orderkey, o.o_custkey,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_cents,
                   per.qty_cents
            FROM per JOIN orders o USING (o_orderkey)
            ORDER BY per.qty_cents DESC, o.o_orderkey
            LIMIT 30
        """,
        "nation_revenue": """
            SELECT n_name,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS revenue_e4,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(ROUND(l_quantity * 100)) AS BIGINT) AS sum_qty_cents,
                   CAST(SUM(ROUND(l_extendedprice * 100)) AS BIGINT) AS sum_price_cents,
                   CAST(SUM(ROUND(l_extendedprice * (1 - l_discount) * 10000)) AS BIGINT)
                     AS sum_disc_price_e4,
                   COUNT(*) AS n_rows
            FROM lineitem GROUP BY 1, 2
        """,
        "embedding_near_dups": """
            SELECT vec_id AS id_a, vec_id + 100000 AS id_b
            FROM embeddings WHERE vec_id < 20
        """,
        "embedding_dedup_clusters": """
            SELECT vec_id, vec_id AS cluster_id,
                   CAST(1 AS BIGINT) AS is_canonical
            FROM embeddings
            UNION ALL
            SELECT vec_id + 100000 AS vec_id, vec_id AS cluster_id,
                   CAST(0 AS BIGINT) AS is_canonical
            FROM embeddings WHERE vec_id < 20
        """,
        "lang_id": f"""
            WITH t AS (
              SELECT doc_id,
                     list_transform(
                       list_slice(regexp_extract_all(
                         text, '[a-zA-Zàâçéèêëîïôûùüÿñäöüß]+'), 1, 2000),
                       x -> lower(x)) AS toks
              FROM documents),
            s AS (
              SELECT doc_id, len(toks) AS n,
                CASE WHEN len(toks)=0 THEN 0.0 ELSE
                  len(list_filter(toks, x -> list_contains({_SW_EN}, x)))::DOUBLE / len(toks) END AS s_en,
                CASE WHEN len(toks)=0 THEN 0.0 ELSE
                  len(list_filter(toks, x -> list_contains({_SW_ES}, x)))::DOUBLE / len(toks) END AS s_es,
                CASE WHEN len(toks)=0 THEN 0.0 ELSE
                  len(list_filter(toks, x -> list_contains({_SW_FR}, x)))::DOUBLE / len(toks) END AS s_fr,
                CASE WHEN len(toks)=0 THEN 0.0 ELSE
                  len(list_filter(toks, x -> list_contains({_SW_DE}, x)))::DOUBLE / len(toks) END AS s_de
              FROM t)
            SELECT doc_id,
              CASE WHEN n = 0 OR greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                   -- argmax with ties to the lexicographically larger code
                   WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                   WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                   WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                   ELSE 'de' END AS lang_pred
            FROM s
        """,
        "winnow": """
            WITH t AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '\\S+') AS toks
              FROM documents),
            g AS (
              SELECT doc_id,
                CASE WHEN len(toks) <= 4 THEN [COALESCE(array_to_string(toks, ' '), '')]
                     ELSE list_transform(range(1, len(toks) - 2),
                            i -> array_to_string(list_slice(toks, i, i + 3), ' '))
                END AS grams
              FROM t),
            h AS (
              SELECT doc_id,
                     list_transform(grams, x -> md5(x)) AS hashes
              FROM g),
            w AS (
              SELECT doc_id, len(hashes) AS n_grams,
                CASE WHEN len(hashes) >= 8 THEN
                  list_distinct(list_transform(range(1, len(hashes) - 6),
                    i -> list_aggregate(list_slice(hashes, i, i + 7), 'min')))
                ELSE list_distinct(hashes) END AS mins
              FROM h)
            SELECT doc_id, n_grams,
                   CAST(len(mins) AS BIGINT) AS n_winnow,
                   list_aggregate(mins, 'min') AS min_gram_hash
            FROM w
        """,
        "interval_overlap": """
            WITH e AS (
              SELECT event_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS lo,
                     CAST(floor(epoch(ts)) AS BIGINT) + 600 AS hi
              FROM events),
            w AS (
              SELECT DISTINCT
                     CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600
                         AS wlo
              FROM events)
            SELECT e.event_id, w.wlo AS window_start_s
            FROM e JOIN w
              ON e.lo < w.wlo + 3600 AND w.wlo < e.hi
        """,
        "winnow_pairs": """
            WITH t AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '\\S+') AS toks
              FROM documents),
            g AS (
              SELECT doc_id,
                CASE WHEN len(toks) <= 4 THEN [COALESCE(array_to_string(toks, ' '), '')]
                     ELSE list_transform(range(1, len(toks) - 2),
                            i -> array_to_string(list_slice(toks, i, i + 3), ' '))
                END AS grams
              FROM t),
            h AS (
              SELECT doc_id,
                     list_transform(grams, x -> md5(x)) AS hashes
              FROM g),
            w AS (
              SELECT doc_id,
                CASE WHEN len(hashes) >= 8 THEN
                  list_distinct(list_transform(range(1, len(hashes) - 6),
                    i -> list_aggregate(list_slice(hashes, i, i + 7), 'min')))
                ELSE list_distinct(hashes) END AS mins
              FROM h),
            f AS (SELECT doc_id, unnest(mins) AS fp FROM w),
            keep AS (
              SELECT fp FROM f GROUP BY fp
              HAVING COUNT(*) BETWEEN 2 AND 64)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS shared
            FROM f a JOIN keep USING (fp) JOIN f b USING (fp)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 2
        """,
        "token_band_filter": """
            WITH t AS (
              SELECT doc_id, lang,
                     CAST(len(regexp_extract_all(text, '\\S+'))
                         AS BIGINT) AS n_tokens
              FROM documents),
            q AS (
              SELECT lang,
                     quantile_disc(n_tokens, 0.25) AS q25,
                     quantile_disc(n_tokens, 0.75) AS q75
              FROM t GROUP BY lang)
            SELECT doc_id, t.lang, n_tokens
            FROM t JOIN q USING (lang)
            WHERE n_tokens BETWEEN q25 AND q75
        """,
        "normalize_text": """
            WITH n AS (
              SELECT doc_id,
                     trim(regexp_replace(
                         lower(nfc_normalize(COALESCE(text, ''))),
                         '\\s+', ' ', 'g')) AS norm_text
              FROM documents)
            SELECT doc_id, norm_text,
                   CAST(len(norm_text) AS BIGINT) AS n_chars_norm
            FROM n
        """,
        "quantize_embeddings": """
            WITH x AS (
              SELECT vec_id,
                     list_transform(embedding,
                                    v -> CAST(v AS DOUBLE)) AS xs
              FROM embeddings),
            m AS (
              SELECT vec_id, xs,
                     list_max(list_transform(xs, v -> abs(v))) AS mx
              FROM x),
            q AS (
              SELECT vec_id, mx,
                     CASE WHEN mx > 0 THEN
                       list_transform(xs,
                         v -> CAST(trunc(127.0 * v / mx) AS BIGINT))
                     ELSE list_transform(xs, v -> CAST(0 AS BIGINT))
                     END AS qs
              FROM m)
            SELECT vec_id,
                   CAST(len(qs) AS BIGINT) AS n_dims,
                   CAST(FLOOR(mx * 1000000) AS BIGINT) AS scale_ppm,
                   CAST(list_sum(qs) AS BIGINT) AS q_sum,
                   CAST(list_min(qs) AS BIGINT) AS q_min,
                   CAST(list_max(qs) AS BIGINT) AS q_max,
                   CAST(list_sum(list_transform(qs, v -> abs(v)))
                       AS BIGINT) AS q_l1
            FROM q
        """,
        "kmv_users": """
            WITH v AS (
              SELECT DISTINCT event_type,
                     CAST(((md5_number(CAST(user_id AS VARCHAR))
                            % 18446744073709551616)
                           + 18446744073709551616) % 18446744073709551616
                          AS UBIGINT) AS h
              FROM events),
            mins AS (
              SELECT event_type, h,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY h) AS rk
              FROM v),
            agg AS (
              SELECT event_type, COUNT(*) AS m, MAX(h) AS kth
              FROM mins WHERE rk <= 32 GROUP BY 1)
            SELECT event_type,
                   CAST(m AS BIGINT) AS n_mins,
                   CAST(kth AS UBIGINT) AS kth_min,
                   CAST(CASE WHEN m < 32 THEN m
                        ELSE (CAST(31 AS HUGEINT) * 18446744073709551616)
                             // CAST(kth AS HUGEINT) END
                        AS BIGINT) AS est_distinct
            FROM agg
        """,
        "kmv_distinct": """
            WITH toks AS (
              SELECT DISTINCT
                     unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
              FROM documents),
            h AS (
              SELECT DISTINCT
                     CAST(((md5_number(tok) % 18446744073709551616)
                           + 18446744073709551616) % 18446744073709551616
                          AS UBIGINT) AS h
              FROM toks),
            mins AS (SELECT h FROM h ORDER BY h LIMIT 64),
            agg AS (SELECT COUNT(*) AS m, MAX(h) AS kth FROM mins)
            SELECT CAST(64 AS BIGINT) AS k,
                   CAST(m AS BIGINT) AS n_mins,
                   CAST(COALESCE(kth, 0) AS UBIGINT) AS kth_min,
                   CAST(CASE WHEN m < 64 THEN m
                        ELSE (CAST(63 AS HUGEINT) * 18446744073709551616)
                             // CAST(kth AS HUGEINT) END
                        AS BIGINT) AS est_distinct
            FROM agg
        """,
        "pii_redact": """
            WITH planted AS (
              SELECT doc_id,
                     COALESCE(text, '') || ' contact user'
                     || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'
                     || CAST(doc_id % 256 AS VARCHAR) || '.'
                     || CAST(doc_id % 100 AS VARCHAR) || ' or +1555'
                     || CAST(1000000 + doc_id % 1000000 AS VARCHAR) AS t
              FROM documents),
            e AS (
              SELECT doc_id,
                CAST(len(regexp_extract_all(t,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                  AS BIGINT) AS n_emails,
                regexp_replace(t,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                  '<EMAIL>', 'g') AS t
              FROM planted),
            i AS (
              SELECT doc_id, n_emails,
                CAST(len(regexp_extract_all(t,
                  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                  AS BIGINT) AS n_ips,
                regexp_replace(t,
                  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                  '<IP>', 'g') AS t
              FROM e)
            SELECT doc_id,
                   regexp_replace(t, '\\+\\d{7,15}', '<PHONE>', 'g')
                       AS clean_text,
                   n_emails, n_ips,
                   CAST(len(regexp_extract_all(t, '\\+\\d{7,15}'))
                       AS BIGINT) AS n_phones
            FROM i
        """,
        "tfidf": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+'))
                         AS term
              FROM documents),
            tf AS (
              SELECT doc_id, term, COUNT(*) AS tf
              FROM toks GROUP BY 1, 2),
            df AS (
              SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
            scored AS (
              SELECT tf.doc_id, tf.term,
                     CAST(tf.tf AS BIGINT) AS tf,
                     CAST(df.df AS BIGINT) AS df,
                     CAST(tf.tf * 1000000 // df.df AS BIGINT)
                         AS score_scaled
              FROM tf JOIN df USING (term)),
            ranked AS (
              SELECT *, row_number() OVER (
                  PARTITION BY doc_id
                  ORDER BY score_scaled DESC, term) AS rk
              FROM scored)
            SELECT doc_id, term, tf, df, score_scaled
            FROM ranked WHERE rk <= 3
        """,
        "semantic_decontam": """
            WITH bench AS (
              SELECT embedding FROM embeddings WHERE vec_id % 13 = 7),
            hits AS (
              SELECT e.vec_id, COUNT(*) AS n
              FROM embeddings e JOIN bench b
                ON list_cosine_similarity(e.embedding, b.embedding) >= 0.9
              GROUP BY 1)
            SELECT vec_id, CAST(n AS BIGINT) AS n_bench_matches FROM hits
        """,
        "join_semi": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        """,
        "fuzzy_decontam": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
              FROM documents),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                         generate_series(1, greatest(1, len(t) - 2)),
                         i -> COALESCE(array_to_string(t[i:i+2], ' '), ''))) AS g
              FROM toks),
            pairs AS (
              SELECT c.doc_id, b.doc_id AS bench_id,
                     len(list_intersect(c.g, b.g))::DOUBLE
                     / (len(c.g) + len(b.g)
                        - len(list_intersect(c.g, b.g))) AS j
              FROM grams c JOIN grams b ON b.doc_id % 11 = 5)
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
                   CAST(MAX(FLOOR(j * 1000000)) AS BIGINT)
                       AS max_jaccard_ppm
            FROM pairs WHERE j >= 0.5 GROUP BY 1
        """,
        "decontam": """
            WITH t AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '\\S+') AS toks
              FROM documents),
            g AS (
              SELECT doc_id,
                CASE WHEN len(toks) = 0
                     THEN CAST([] AS VARCHAR[])
                     WHEN len(toks) <= 3
                     THEN [md5(array_to_string(toks, ' '))]
                     ELSE list_transform(range(1, len(toks) - 1),
                            i -> md5(array_to_string(
                                       list_slice(toks, i, i + 2), ' ')))
                END AS hashes
              FROM t),
            bench AS (
              SELECT DISTINCT unnest(hashes) AS h FROM g
              WHERE doc_id % 97 = 3),
            hits AS (
              SELECT doc_id, COUNT(*) AS n_hit FROM (
                SELECT doc_id, unnest(list_distinct(hashes)) AS h FROM g)
              JOIN bench USING (h) GROUP BY 1)
            SELECT g.doc_id,
                   CAST(len(hashes) AS BIGINT) AS n_grams,
                   CAST(len(list_distinct(hashes)) AS BIGINT)
                       AS n_distinct_grams,
                   CAST(COALESCE(hits.n_hit, 0) AS BIGINT) AS n_hit_grams,
                   CAST(COALESCE(hits.n_hit, 0) >= 1 AS BIGINT)
                       AS contaminated
            FROM g LEFT JOIN hits USING (doc_id)
        """,
        # fingerprints, minhash_near_dups, simhash, embedding_near_dups,
        # media_*, span_audit: non-SQL-expressible (crc32-/model-
        # parameterized or defined over the synthesized span wrapping) →
        # rows-only check.  The winnow/lang_id entries above oracle the
        # same machinery in SQL-computable form.
    }
