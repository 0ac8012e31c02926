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
                 pin_triples: bool = True):
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

    triples = extract_triples(docs_ds, num_partitions=num_partitions)

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
            alias_ref = ray.put(alias)

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
                mapping_ref = ray.put(mapping)
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
            metrics["link_rows"] = links.count()
            metrics["link_matched_fraction"] = round(
                links.count() / n_mentions, 4) if n_mentions else 0.0
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
