"""Per-partition checkpoint manifests for resumable runs.

"Resumable from checkpoint" for a batch pipeline (north_rule) means: output
is laid out one directory per partition key, each written atomically (temp
dir + rename) with a JSON manifest carrying lineage (input fingerprint, row
count, wall time); a rerun verifies manifests and skips finished partitions
(ray_guide: Sources & sinks).
"""

from __future__ import annotations

import json
import os
import shutil
import time


MANIFEST = "_MANIFEST.json"


def partition_dir(root: str, part_key: int) -> str:
    return os.path.join(root, f"part_key={part_key}")


def is_partition_done(root: str, part_key: int, input_fingerprint: str) -> bool:
    path = os.path.join(partition_dir(root, part_key), MANIFEST)
    try:
        with open(path) as f:
            manifest = json.load(f)
        return manifest.get("input_fingerprint") == input_fingerprint
    except (OSError, json.JSONDecodeError):
        return False


def write_partition(root: str, part_key: int, table, input_fingerprint: str,
                    extra: dict | None = None) -> dict:
    """Atomically write one partition (parquet + manifest)."""
    import pyarrow.parquet as pq

    final = partition_dir(root, part_key)
    tmp = final + ".tmp"
    started = time.monotonic()
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "data.parquet"))
    manifest = {
        "part_key": part_key,
        "rows": table.num_rows,
        "input_fingerprint": input_fingerprint,
        "wall_sec": round(time.monotonic() - started, 4),
        **(extra or {}),
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f)
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)
    return manifest


def remove_partition(root: str, part_key: int) -> None:
    """Prune one partition directory (stale fingerprint / key cleanup)."""
    shutil.rmtree(partition_dir(root, part_key), ignore_errors=True)


def completed_partitions(root: str) -> dict[int, dict]:
    out = {}
    if not os.path.isdir(root):
        return out
    for name in os.listdir(root):
        if name.startswith("part_key="):
            try:
                with open(os.path.join(root, name, MANIFEST)) as f:
                    manifest = json.load(f)
                out[int(name.split("=", 1)[1])] = manifest
            except (OSError, ValueError, json.JSONDecodeError):
                continue
    return out


def write_run_manifest(root: str, metrics: dict) -> None:
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "_RUN.json"), "w") as f:
        json.dump(metrics, f, indent=1)
