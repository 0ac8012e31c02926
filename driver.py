"""``ray job submit`` entrypoint for the KG-construction pipeline.

On a cluster:

    ray job submit --working-dir . -- \
        python driver.py --input /data/sf/ --out /data/kg_out \
        --partitions 4096 --actor-concurrency 64

Locally (this sandbox has no dashboard/job server, so invoke directly —
the job-submission contract is identical):

    python driver.py --input /root/testdata/sf0.001 --out /tmp/kg_out

Incremental re-ingest against a previous run's output (its doc manifest
is diffed; only added/changed documents re-parse):

    python driver.py --input /data/sf_v2 --out /data/kg_v2 \
        --prev-dir /data/kg_v1

The run is resumable: partitions whose ``_MANIFEST.json`` matches the
input fingerprint are skipped on rerun.  Prints one JSON line of metrics
(stage walls, docs/s, partitions written, canonical-map size).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="sf dir (documents.parquet inside) or a parquet "
                         "path already in the interleaved-spans schema")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--actor-concurrency", type=int, default=8)
    ap.add_argument("--fingerprint", default="",
                    help="input fingerprint for resume (defaults to the "
                         "input path)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--prev-dir", default="",
                    help="previous run's output dir: switch to incremental "
                         "re-ingest (diff its doc manifest, re-parse only "
                         "added/changed docs, rerun the global tail)")
    ap.add_argument("--num-cpus", type=int, default=0,
                    help="local-mode CPU count (0 = cluster default)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)

    # session entrypoint owns the DataContext (library code never flips
    # global flags): push-based shuffle is ~3x faster on the part_key
    # exchange (BENCH/BASELINE.md)
    from ray.data.context import DataContext, ShuffleStrategy
    DataContext.get_current().shuffle_strategy = \
        ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    from rdfa_streaming_parser_js_ray.pipelines.kg import construct_kg
    from rdfa_streaming_parser_js_ray.sources.documents import (
        documents_from_sf_table, read_documents,
    )

    if os.path.isdir(args.input) and \
            os.path.exists(os.path.join(args.input, "documents.parquet")):
        docs = documents_from_sf_table(args.input)
    else:
        docs = read_documents(args.input)

    t0 = time.monotonic()
    n_docs = docs.count()
    if args.prev_dir:
        from rdfa_streaming_parser_js_ray.pipelines.kg import (
            construct_kg_incremental,
        )
        triples, metrics = construct_kg_incremental(
            docs, args.out, prev_dir=args.prev_dir,
            actor_concurrency=args.actor_concurrency,
            num_partitions=args.partitions,
            input_fingerprint=args.fingerprint or args.input,
            resume=not args.no_resume)
    else:
        triples, metrics = construct_kg(
            docs, out_dir=args.out,
            actor_concurrency=args.actor_concurrency,
            num_partitions=args.partitions,
            input_fingerprint=args.fingerprint or args.input,
            resume=not args.no_resume)
    wall = time.monotonic() - t0
    metrics.update({
        "docs": n_docs,
        "triples": triples.count(),
        "docs_per_s": round(n_docs / wall, 1),
        "out_dir": args.out,
    })
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
