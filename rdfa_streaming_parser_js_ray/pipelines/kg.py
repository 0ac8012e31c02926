"""The flagship KG-construction pipeline (north_star, end to end).

documents (interleaved spans) → extract triples [stateless map_batches]
→ mention detection [actor pool] → entity linking vs broadcast alias dict
[actor pool] → canonicalization [groupby + broadcast rewrite]
→ exact dedup [combiner + hash-partitioned groupby]
→ partitioned materialize with per-partition manifests [resumable].

Everything before the canonicalization groupby is shuffle-free and
streams; the only materialized intermediates are the (small) alias dict
and canonical map.
"""

from __future__ import annotations

import time

from ..stages.canonicalize import (
    ApplyCanonicalMap, build_canonical_map, combine_distinct, part_distinct,
    with_part_key,
)
from ..stages.extract import extract_triples
from ..stages.linking import build_alias_dict, link_entities
from ..stages.mentions import detect_mentions
from ..state import checkpoints


def construct_kg(docs_ds, out_dir: str | None = None, *,
                 actor_concurrency: int = 2,
                 num_partitions: int = 64,
                 input_fingerprint: str = "",
                 resume: bool = True,
                 skip_linking: bool = False,
                 broadcast_max_entities: int = 1_000_000,
                 joined_token_fallback: bool = False,
                 pin_triples: bool = True,
                 write_doc_manifest: bool = True,
                 _pre_extracted=None,
                 _doc_manifest_ds=None):
    """Run the full pipeline; returns (canonical_triples_ds, metrics dict).

    When ``out_dir`` is given, materializes partitioned parquet with
    per-partition lineage manifests and resumability.

    ``broadcast_max_entities`` is the size threshold between the two
    linking/canonicalization modes: below it, the alias dict and the
    (union-find-closed) canonical map broadcast via ``ray.put``; above
    it, the pipeline switches to the fully distributed path — hash-join
    linking against the alias Dataset, grouped min-propagation for the
    transitive closure, and join-based triple rewriting — with nothing
    map-shaped ever held on one node (``metrics["linking_mode"]``
    records which path ran).
    """
    import ray

    # NOTE on shuffle strategy: the part_key exchange below is ~3× faster
    # under push-based shuffle (measured 15.1s → 5.1s on 7.5M triples),
    # but that is a session-global DataContext setting — configure
    # ``DataContext.get_current().shuffle_strategy =
    # ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED`` at the session entrypoint
    # (bench.py does); a library call must not flip global flags.

    metrics: dict = {"stages": {}}
    t0 = time.monotonic()
    # pipeline-affecting parameters: the full-resume fast path may only
    # return a prior run's output when these match (a run with
    # skip_linking=True or a different partitioning must not be served
    # as the output of a differently-configured call)
    run_config = {"skip_linking": skip_linking,
                  "num_partitions": num_partitions,
                  "broadcast_max_entities": broadcast_max_entities,
                  "joined_token_fallback": joined_token_fallback}

    # Full-resume fast path: a COMPLETED run (run manifest + every
    # partition manifest matching the input fingerprint) restarts by
    # reading its own partitioned output — no re-extract, no re-link,
    # no shuffle.  This is what "resumable from checkpoint" means for a
    # finished multi-day run; partially-finished runs fall through to
    # the per-stage skips below.
    if out_dir is not None and resume and input_fingerprint:
        import json
        import os
        done = checkpoints.completed_partitions(out_dir)
        run_path = os.path.join(out_dir, "_RUN.json")
        run = None
        if done and os.path.exists(run_path):
            try:
                with open(run_path) as f:
                    run = json.load(f)
            except (OSError, json.JSONDecodeError):
                run = None
        if run and run.get("input_fingerprint") == input_fingerprint \
                and run.get("config") == run_config \
                and run.get("partitions") == len(done) \
                and all(m.get("input_fingerprint") == input_fingerprint
                        for m in done.values()):
            import ray.data as rd
            ds = rd.read_parquet(
                [checkpoints.partition_dir(out_dir, k) for k in sorted(done)],
                file_extensions=["parquet"])
            metrics["fully_resumed"] = True
            metrics["partitions_written"] = len(done)
            metrics["wall_sec"] = round(time.monotonic() - t0, 3)
            return ds, metrics

    # _pre_extracted (construct_kg_incremental) supplies merged triples
    # from a prior run's checkpoint + a delta re-parse; everything below
    # — checkpoint, manifest, linking, tail — is shared unchanged.
    triples = _pre_extracted if _pre_extracted is not None \
        else extract_triples(docs_ds, num_partitions=num_partitions)

    # Checkpointed stage boundary: extraction output is consumed by three
    # downstream passes (alias build, mention→link, final rewrite).  Parse
    # ONCE and pin the triples — to parquet when an out_dir exists (doubles
    # as a resumable checkpoint), else into the object store (spills to
    # disk under pressure; fine for the block-sized intermediates here).
    if out_dir is not None:
        import json
        import os
        import shutil

        import ray.data as rd
        raw_dir = os.path.join(out_dir, "triples_raw")
        # the extraction checkpoint is itself resumable: when a prior
        # run's triples_raw carries the same input fingerprint, skip the
        # whole re-parse (at real scale extraction dominates a resumed
        # run's cost; the partition-write skip alone is not enough)
        raw_manifest = os.path.join(out_dir, "triples_raw._EXTRACT.json")
        reuse = False
        if resume and input_fingerprint and os.path.exists(raw_manifest):
            try:
                with open(raw_manifest) as f:
                    reuse = json.load(f).get("input_fingerprint") \
                        == input_fingerprint
            except (OSError, json.JSONDecodeError):
                reuse = False
        t_x = time.monotonic()
        if not reuse:
            shutil.rmtree(raw_dir, ignore_errors=True)
            try:
                os.remove(raw_manifest)
            except OSError:
                pass
            # plain write (one file per block): min_rows_per_file would
            # bound the file count but serializes the fused parse→write
            # pipeline behind a handful of coalescing writers (measured
            # 12× slower); the pinned re-read below absorbs the
            # many-small-files cost
            triples.write_parquet(raw_dir)
            if input_fingerprint:
                with open(raw_manifest, "w") as f:
                    json.dump({"input_fingerprint": input_fingerprint}, f)
        metrics["extract_resumed"] = reuse
        metrics["stages"]["extract_sec"] = round(time.monotonic() - t_x, 3)

        # Per-document identity manifest (doc_id, md5 content hash of the
        # span sequence) — what construct_kg_incremental diffs against to
        # re-parse only the delta next time.  Same fingerprint-marker
        # resume discipline as the extraction checkpoint.
        if write_doc_manifest:
            from ..stages.extract import doc_manifest
            man_dir = os.path.join(out_dir, "doc_manifest")
            man_marker = os.path.join(out_dir, "doc_manifest._MANIFEST.json")
            man_reuse = False
            if resume and input_fingerprint and os.path.exists(man_marker):
                try:
                    with open(man_marker) as f:
                        man_reuse = json.load(f).get("input_fingerprint") \
                            == input_fingerprint
                except (OSError, json.JSONDecodeError):
                    man_reuse = False
            if not man_reuse:
                shutil.rmtree(man_dir, ignore_errors=True)
                try:
                    os.remove(man_marker)
                except OSError:
                    pass
                # incremental calls pass the manifest they already
                # computed for the diff — don't re-hash the corpus
                (doc_manifest(docs_ds) if _doc_manifest_ds is None
                 else _doc_manifest_ds).write_parquet(man_dir)
                if input_fingerprint:
                    with open(man_marker, "w") as f:
                        json.dump({"input_fingerprint": input_fingerprint},
                                  f)
        # pin the (re-)read once: three downstream passes consume it, and
        # object-store blocks (spillable) beat re-reading the many small
        # files a wide write_parquet produces.  pin_triples=False is the
        # lazy-consumer alternative (each pass re-reads the parquet
        # checkpoint) — measured at 160k-doc stress scale in BASELINE.md;
        # the pinned shape won, the flag remains for corpora whose
        # triples exceed aggregate object-store + spill capacity.
        triples = rd.read_parquet(raw_dir)
        if pin_triples:
            triples = triples.materialize()
    else:
        t_x = time.monotonic()
        triples = triples.materialize()
        metrics["stages"]["extract_sec"] = round(time.monotonic() - t_x, 3)

    if skip_linking:
        canonical = triples
        metrics["linking_mode"] = "skipped"
    else:
        t_s = time.monotonic()
        try:
            alias = build_alias_dict(triples,
                                     max_entities=broadcast_max_entities)
        except ValueError:
            alias = None  # alias table beyond broadcast → joined mode
        if alias is not None:
            metrics["linking_mode"] = "broadcast"
            metrics["alias_entries"] = len(alias)
            metrics["stages"]["alias_sec"] = round(time.monotonic() - t_s, 3)
            from ..state.broadcast import pin_broadcast
            alias_ref = pin_broadcast(alias)

            t_s = time.monotonic()
            mentions = detect_mentions(triples, concurrency=actor_concurrency)
            links = link_entities(mentions, alias_ref,
                                  concurrency=actor_concurrency)
            # the identity-evidence pair set can outgrow the broadcast
            # budget even when the alias table fit (2×: the closure map is
            # pair-shaped, roughly the same order as the alias table) —
            # fall back to the distributed closure + joined rewrite
            # instead of crashing
            try:
                mapping = build_canonical_map(
                    links, max_entities=2 * broadcast_max_entities)
            except ValueError:
                from ..stages.canonicalize import (
                    apply_canonical_map_joined, canonical_pairs,
                    transitive_closure_joined,
                )
                metrics["linking_mode"] = "broadcast+joined_closure"
                mapping_ds = transitive_closure_joined(
                    canonical_pairs(links)).materialize()
                n_map = mapping_ds.count()
                metrics["canonical_map_entries"] = n_map
                metrics["stages"]["link_sec"] = \
                    round(time.monotonic() - t_s, 3)
                canonical = apply_canonical_map_joined(triples, mapping_ds) \
                    if n_map else triples
            else:
                metrics["canonical_map_entries"] = len(mapping)
                metrics["stages"]["link_sec"] = \
                    round(time.monotonic() - t_s, 3)
                mapping_ref = pin_broadcast(mapping)
                canonical = triples.map_batches(
                    ApplyCanonicalMap,
                    fn_constructor_kwargs={"mapping_ref": mapping_ref},
                    batch_format="pyarrow",
                    concurrency=(1, actor_concurrency), num_cpus=0.5)
        else:
            # Fully distributed mode: the alias/canonical maps never land
            # on one node.  Hash-join linking (exact norms), grouped
            # min-propagation closure, join-based rewrite.
            from ..stages.canonicalize import (
                apply_canonical_map_joined, canonical_pairs,
                transitive_closure_joined,
            )
            from ..stages.linking import alias_pairs, link_entities_joined

            metrics["linking_mode"] = "joined"
            alias_ds = alias_pairs(triples).materialize()
            metrics["alias_entries"] = alias_ds.count()
            metrics["stages"]["alias_sec"] = round(time.monotonic() - t_s, 3)

            t_s = time.monotonic()
            mentions = detect_mentions(triples, concurrency=actor_concurrency)
            # joined_token_fallback restores the broadcast linker's
            # partial-match recall (extra probe rows + one exchange);
            # off by default — the matched fraction below records the
            # recall actually achieved either way, so the broadcast →
            # joined switch never silently drops recall unobserved
            links = link_entities_joined(
                mentions, alias_ds,
                token_fallback=joined_token_fallback).materialize()
            n_mentions = mentions.count()
            metrics["mention_rows"] = n_mentions
            n_links = links.count()
            metrics["link_rows"] = n_links
            # recall metric = DISTINCT mentions matched / mentions (one
            # mention can yield several link rows when an alias maps to
            # several entities — raw link_rows/mentions can exceed 1)
            uid = ["doc_id", "subj", "pred", "surface"]
            n_matched = links.map_batches(
                lambda b: b[uid].drop_duplicates(),
                batch_format="pandas").groupby(uid).count().count() \
                if n_links else 0
            metrics["link_matched_fraction"] = round(
                n_matched / n_mentions, 4) if n_mentions else 0.0
            mapping_ds = transitive_closure_joined(
                canonical_pairs(links)).materialize()
            n_map = mapping_ds.count()
            metrics["canonical_map_entries"] = n_map
            metrics["stages"]["link_sec"] = round(time.monotonic() - t_s, 3)

            # an empty mapping Dataset has no schema to join against —
            # and nothing to rewrite
            canonical = apply_canonical_map_joined(triples, mapping_ds) \
                if n_map else triples

    # Tail = ONE all-to-all: per-batch distinct combiner (shuffle-free) →
    # part_key groupby whose per-group pass does the global distinct AND
    # (when materializing) the partition write.  Equal triples share subj
    # and hence part_key, so part_key-grouped dedup is exact; fusing the
    # write into the same groupby avoids a second exchange.
    keyed = with_part_key(combine_distinct(canonical, keep_doc_id=True),
                          num_partitions=num_partitions)

    t_s = time.monotonic()
    if out_dir is not None:
        deduped, written = materialize_partitioned(
            keyed, out_dir, num_partitions=num_partitions,
            input_fingerprint=input_fingerprint, resume=resume,
            run_config=run_config)
        metrics["partitions_written"] = written
        metrics["stages"]["write_sec"] = round(time.monotonic() - t_s, 3)
    else:
        deduped = keyed.groupby("part_key").map_groups(
            part_distinct(keep_doc_id=True), batch_format="pandas")
    metrics["wall_sec"] = round(time.monotonic() - t0, 3)
    return deduped, metrics


def materialize_partitioned(keyed_ds, out_dir: str, *, num_partitions: int,
                            input_fingerprint: str, resume: bool,
                            dedup: bool = True,
                            run_config: dict | None = None):
    """Partition-keyed parquet materialize with manifests + resume.

    ONE shuffle total: the ``part_key`` groupby whose per-group pass runs
    the global exact-distinct (input is combiner output — per-batch
    distinct rows) and writes the partition, keyed the same way
    (hash(subj) % P) downstream consumers read.  Skips partitions whose
    manifest matches ``input_fingerprint``; each written partition
    directory is atomic (checkpoints module).  Returns (deduped Dataset,
    partitions written).
    """
    done = checkpoints.completed_partitions(out_dir) if resume else {}
    skip = {k for k, m in done.items()
            if m.get("input_fingerprint") == input_fingerprint}
    distinct = part_distinct(keep_doc_id=True) if dedup else (lambda g: g)

    def write_group(group):
        import pyarrow as pa
        group = distinct(group)
        part_key = int(group["part_key"].iloc[0])
        if part_key not in skip:
            lineage = {}
            if "doc_id" in group.columns:
                lineage = {"n_docs": int(group["doc_id"].nunique()),
                           "doc_id_min": str(group["doc_id"].min()),
                           "doc_id_max": str(group["doc_id"].max())}
            checkpoints.write_partition(
                out_dir, part_key,
                pa.Table.from_pandas(group, preserve_index=False),
                input_fingerprint, extra=lineage)
        return group

    deduped = keyed_ds.groupby("part_key").map_groups(
        write_group, batch_format="pandas").materialize()
    # Count only partitions belonging to THIS run (its key set + matching
    # fingerprint); prune anything else left on disk by earlier runs with
    # a different fingerprint or partition count, so out_dir holds exactly
    # the current run's output for downstream readers.
    run_keys = {int(k) for k in deduped.unique("part_key")} \
        if deduped.count() else set()
    done_now = checkpoints.completed_partitions(out_dir)
    stale = sorted(k for k, m in done_now.items()
                   if k not in run_keys
                   or m.get("input_fingerprint") != input_fingerprint)
    for k in stale:
        checkpoints.remove_partition(out_dir, k)
    written = sum(1 for k, m in done_now.items()
                  if k in run_keys
                  and m.get("input_fingerprint") == input_fingerprint)
    checkpoints.write_run_manifest(out_dir, {
        "input_fingerprint": input_fingerprint,
        "config": run_config,
        "partitions": written,
        "resumed_skipped": sorted(skip & run_keys),
        "stale_pruned": stale,
    })
    return deduped, written


def construct_kg_incremental(docs_ds, out_dir: str, *, prev_dir: str,
                             input_fingerprint: str = "",
                             num_partitions: int = 64,
                             broadcast_max_delta: int = 5_000_000,
                             **kwargs):
    """Incremental re-ingest: diff the new corpus against ``prev_dir``'s
    per-document manifest, RE-PARSE ONLY added/changed documents, splice
    their triples into the prior extraction checkpoint (stale doc ids
    anti-filtered), then run the normal tail (linking, canonicalization,
    dedup, partitioned write) into ``out_dir``.

    The tail reruns globally because it IS global — one changed document
    can alter the alias dictionary and the canonical closure — but the
    corpus-scale cost center is the parse, and that now costs O(delta).
    The output is identical to a full ``construct_kg`` over the new
    corpus (pinned by test), and ``out_dir`` (with its own checkpoint +
    manifest) becomes a valid ``prev_dir`` for the next increment.

    Scale shape: the manifest diff is one outer hash-join over slim
    (id, 128-bit hash) rows; the delta/stale id filters broadcast as
    numpy arrays when the delta holds at most ``broadcast_max_delta``
    ids, else they run as partitioned hash/anti joins — nothing
    corpus-sized ever lands on the driver.
    """
    import os

    import numpy as np
    import ray.data as rd

    from ..stages.extract import doc_manifest
    from ..stages.joins import anti_join
    from ..stages.snapshot import hashed_diff

    t0 = time.monotonic()

    def rename(col):
        def f(batch):
            return batch.rename(columns={"content_hash": col})
        return f

    old_slim = rd.read_parquet(os.path.join(prev_dir, "doc_manifest")) \
        .map_batches(rename("h_old"), batch_format="pandas")
    new_man = doc_manifest(docs_ds).materialize()   # one hash pass, reused
    new_slim = new_man.map_batches(rename("h_new"), batch_format="pandas")
    delta = hashed_diff(old_slim, new_slim, id_col="doc_id").materialize()

    # Resume keys must be CONTENT-derived here: the whole point of an
    # incremental run is "same input path, changed content", so a
    # path-derived fingerprint (driver.py's default) would match the
    # previous run's markers and full-resume to the STALE output,
    # silently discarding the delta.  Fold an order-independent XOR of
    # the per-doc identity hashes into the fingerprint: identical corpus
    # -> identical key (fast resume stays correct), any content change
    # -> new key.  One tiny partial row per block reaches the driver.
    def _sig_partial(batch) -> "pd.DataFrame":
        import pandas as pd
        h = pd.util.hash_array(
            (batch["doc_id"].astype(str) + ":"
             + batch["content_hash"]).to_numpy(dtype=object))
        return pd.DataFrame({"x": [int(np.bitwise_xor.reduce(h))
                                   if len(h) else 0]})

    parts = new_man.map_batches(_sig_partial,
                                batch_format="pandas").take_all()
    corpus_sig = 0
    for row in parts:
        corpus_sig ^= int(row["x"])
    effective_fp = (f"{input_fingerprint}|corpus:{corpus_sig:016x}"
                    if input_fingerprint else f"corpus:{corpus_sig:016x}")

    prev_raw = rd.read_parquet(os.path.join(prev_dir, "triples_raw"))
    raw_cols = list(prev_raw.schema().names)

    n_delta = delta.count()
    inc_metrics: dict = {"delta_rows": n_delta}
    if n_delta == 0:
        merged = prev_raw
        inc_metrics.update(added=0, changed=0, removed=0, reparsed_docs=0)
    elif n_delta <= broadcast_max_delta:
        pdf = delta.to_pandas()
        counts = pdf["status"].value_counts()
        inc_metrics.update(added=int(counts.get("added", 0)),
                           changed=int(counts.get("changed", 0)),
                           removed=int(counts.get("removed", 0)))
        reparse_ids = pdf.loc[pdf["status"].isin(("added", "changed")),
                              "doc_id"].to_numpy()
        stale_ids = pdf.loc[pdf["status"].isin(("removed", "changed")),
                            "doc_id"].to_numpy()
        inc_metrics["reparsed_docs"] = len(reparse_ids)

        # pyarrow filters: zero-copy and they keep the nested spans
        # column intact (a pandas round-trip of list<struct> does not
        # survive conversion back to Arrow)
        import pyarrow as pa
        import pyarrow.compute as pc
        reparse_set = pa.array(list(reparse_ids))
        stale_set = pa.array(list(stale_ids))

        def keep_docs(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch["doc_id"], value_set=reparse_set))

        def drop_stale(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(
                pc.is_in(batch["doc_id"], value_set=stale_set)))

        kept = prev_raw.map_batches(drop_stale, batch_format="pyarrow") \
            if len(stale_ids) else prev_raw
        if len(reparse_ids):
            reparse_docs = docs_ds.map_batches(keep_docs,
                                               batch_format="pyarrow")
            delta_triples = extract_triples(reparse_docs,
                                            num_partitions=num_partitions)
            merged = kept.select_columns(raw_cols) \
                .union(delta_triples.select_columns(raw_cols))
        else:
            merged = kept
    else:
        # Oversized-delta fallback.  The stale filter stays fully
        # distributed (anti-join on the flat triples table).  The
        # reparse side cannot go through a pandas hash-join (the nested
        # spans column does not survive the pandas round-trip), so the
        # reparse id set is processed in hash-SLICES: the driver holds
        # at most broadcast_max_delta ids at a time and each slice is
        # the same zero-copy pyarrow is_in filter as the broadcast
        # path.  Each slice re-scans the docs metadata — acceptable,
        # because a delta this large means the incremental run is
        # approaching a full rebuild anyway.
        import math

        import pyarrow as pa
        import pyarrow.compute as pc

        from ..stages.joins import _bucket_of

        def status_filter(statuses):
            def f(batch):
                return batch[batch["status"].isin(statuses)][["doc_id"]]
            return f

        stale_keys = delta.map_batches(status_filter(("removed", "changed")),
                                       batch_format="pandas")
        n_stale = stale_keys.count()
        reparse_keys = delta.map_batches(
            status_filter(("added", "changed")),
            batch_format="pandas").materialize()
        n_reparse = reparse_keys.count()
        # delta = added + removed + changed; stale = removed + changed;
        # reparse = added + changed  =>  changed = stale + reparse - delta
        n_changed = n_stale + n_reparse - n_delta
        inc_metrics.update(changed=n_changed, removed=n_stale - n_changed,
                           added=n_reparse - n_changed,
                           reparsed_docs=n_reparse)

        kept = anti_join(prev_raw, stale_keys, on="doc_id") if n_stale \
            else prev_raw
        merged = kept.select_columns(raw_cols)
        n_slices = max(1, math.ceil(n_reparse / broadcast_max_delta))
        for s in range(n_slices):
            def take_slice(batch, s=s):
                return batch[_bucket_of(batch["doc_id"], n_slices) == s]

            ids_s = reparse_keys.map_batches(
                take_slice, batch_format="pandas").to_pandas()
            if not len(ids_s):
                continue
            id_set = pa.array(list(ids_s["doc_id"].to_numpy()))

            def keep_docs(batch, id_set=id_set):
                return batch.filter(
                    pc.is_in(batch["doc_id"], value_set=id_set))

            slice_triples = extract_triples(
                docs_ds.map_batches(keep_docs, batch_format="pyarrow"),
                num_partitions=num_partitions)
            merged = merged.union(slice_triples.select_columns(raw_cols))

    if os.path.realpath(out_dir) == os.path.realpath(prev_dir):
        # In-place rolling snapshot: construct_kg clears
        # out_dir/triples_raw before writing, and the lazy `merged`
        # pipeline still READS prev_dir/triples_raw — identical here.
        # Pin the merged triples in the object store first so the
        # delete cannot race the read (without this the run crashes
        # AND destroys the previous checkpoint).
        merged = merged.materialize()

    result, metrics = construct_kg(docs_ds, out_dir,
                                   num_partitions=num_partitions,
                                   input_fingerprint=effective_fp,
                                   _pre_extracted=merged,
                                   _doc_manifest_ds=new_man, **kwargs)
    inc_metrics["wall_sec"] = round(time.monotonic() - t0, 3)
    metrics["incremental"] = inc_metrics
    return result, metrics
