"""Multi-seed sweep of the randomized oracle differential.

Reuses the generators and compare logic of
tests/test_randomized_oracle.py over an ARBITRARY seed range — the
pytest module pins three seeds for CI wall budget; this tool is the
offline burst (the same role tools/fuzz_differential.py plays for the
parser property tests).  Every seed regenerates all nine tables with
fresh adversarial randomness and replays the full curated query list
(plus the wide registry with --wide) against the registered DuckDB
oracles.

Usage: python tools/randomized_sweep.py [N_SEEDS] [SEED0] [--wide]
Prints one JSON line; exit 1 on any mismatch (with the failing
(seed, query) pairs as reproducers — rerun via pytest by adding the
seed to SEEDS in the test module).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--wide"]
    wide = "--wide" in sys.argv[1:]
    n_seeds = int(args[0]) if args else 10
    seed0 = int(args[1]) if len(args) > 1 else 1000

    import tempfile

    import duckdb
    import numpy as np
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from tests.test_randomized_oracle import (
        QUERIES, QUERIES_WIDE, _compare, _gen_documents, _gen_embeddings,
        _gen_dims, _gen_events, _gen_lineitem, _gen_orders,
    )

    queries = QUERIES + (QUERIES_WIDE if wide else [])
    failures: list[dict] = []
    t0 = time.time()
    n_checks = 0
    for s in range(seed0, seed0 + n_seeds):
        rng = np.random.default_rng(s)
        d = tempfile.mkdtemp(prefix=f"randsweep_{s}_")
        events = _gen_events(rng)
        orders, supp_slot = _gen_orders(rng)
        lineitem = _gen_lineitem(rng, orders, supp_slot)
        tables = {
            "events": events, "orders": orders, "lineitem": lineitem,
            "documents": _gen_documents(rng),
            "embeddings": _gen_embeddings(rng),
            **_gen_dims(rng, orders, lineitem),
        }
        # every second seed writes tiny row groups (multi-block shape;
        # see the fixture comment in tests/test_randomized_oracle.py)
        kw = {"row_group_size": 32} if s % 2 == 0 else {}
        for name, df in tables.items():
            df.to_parquet(f"{d}/{name}.parquet", index=False, **kw)
        con = duckdb.connect()
        for name in tables:
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{d}/{name}.parquet')")
        def dump(q, tag, exc):
            """Write the FAILED frames (attached by _compare) to CSV —
            the only usable evidence for a nondeterministic mismatch."""
            for side in ("ray_df", "oracle_df"):
                df = getattr(exc, side, None)
                if df is not None:
                    path = f"/tmp/sweep_fail_{s}_{q}_{tag}_{side}.csv"
                    df.to_csv(path, index=False)
                    print(f"dumped {path}", file=sys.stderr)

        for q in queries:
            try:
                _compare(q, d, con)
            except AssertionError as exc:
                dump(q, "first", exc)
                # retry once: classifies scheduling-dependent flakes
                # (e.g. empty-block dtype artifacts) vs stable
                # semantic divergences — both are findings, but they
                # are debugged differently
                try:
                    _compare(q, d, con)
                    failures.append({"seed": s, "query": q,
                                     "transient": True,
                                     "err": str(exc)[:700]})
                except AssertionError as exc2:
                    dump(q, "retry", exc2)
                    failures.append({"seed": s, "query": q,
                                     "transient": False,
                                     "err": str(exc2)[:700]})
            n_checks += 1
        con.close()
        print(f"seed {s}: {len(queries)} queries, "
              f"{len(failures)} cumulative failures", file=sys.stderr)
    print(json.dumps({
        "n_seeds": n_seeds, "seed0": seed0, "wide": wide,
        "queries_per_seed": len(queries), "checks": n_checks,
        "failures": failures, "wall_sec": round(time.time() - t0, 1),
    }))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
