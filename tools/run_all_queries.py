"""Session-survival smoke gate: run EVERY ``queries()`` entry back-to-back
in ONE Ray session, the way the driver's correctness harness does.

Round 3's driver artifact came back empty because Ray 2.49 tripped a core
assertion (``task_manager.cc:930 Check failed: it !=
submissible_tasks_.end()``) roughly 49 queries into a single session.  This
tool exists to (a) reproduce that failure mode locally and (b) prove the
mitigations hold: the gate is THREE consecutive full passes.

Usage: python tools/run_all_queries.py [sf_dir] [--repeat N] [--from NAME]

No DuckDB comparison here (tools/check_oracles.py owns that); this gate is
purely "does the full query suite survive one session" (the registry
has grown well past the original 75 since; the tool runs whatever
``queries()`` returns).
"""

from __future__ import annotations

import gc
import sys
import time


def main() -> int:
    args = [a for a in sys.argv[1:]]
    repeat = 1
    start_from = None
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i:i + 2]
    if "--from" in args:
        i = args.index("--from")
        start_from = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    failures = 0
    for r in range(repeat):
        queries = entrymod.queries()
        names = list(queries)
        if start_from and start_from in names:
            names = names[names.index(start_from):]
            start_from = None
        t_pass = time.monotonic()
        for i, name in enumerate(names):
            t0 = time.monotonic()
            try:
                result = queries[name](sf_dir)
                # consume the way the driver does
                import ray.data as rd
                if isinstance(result, rd.Dataset):
                    result = result.to_pandas()
                n = len(result)
            except Exception as exc:  # noqa: BLE001
                print(f"[pass {r + 1}] FAIL {i + 1}/{len(names)} {name}: "
                      f"{type(exc).__name__}: {exc}", flush=True)
                failures += 1
                continue
            print(f"[pass {r + 1}] ok {i + 1}/{len(names)} {name}: "
                  f"rows={n} [{time.monotonic() - t0:.1f}s]", flush=True)
            del result
            gc.collect()
        print(f"[pass {r + 1}] total {time.monotonic() - t_pass:.1f}s, "
              f"failures so far {failures}", flush=True)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
