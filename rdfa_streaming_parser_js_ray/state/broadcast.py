"""Broadcast-object pinning for actor-pool constructor refs.

Ray Data actor pools run with ``max_restarts > 0``; an actor whose
``fn_constructor_kwargs`` contain an ``ObjectRef`` CANNOT restart if that
ref's object was released (ray-project/ray#53727 — Ray prints a
core-worker warning for exactly this shape).  Pool teardown is
asynchronous, so a broadcast ref that dies with its query's local scope
can become that lost constructor argument while the pool is still
winding down — in a 77-query single-session run that is one crash window
per query (the round-3 driver gate died to a core-worker
``task_manager.cc:930`` assertion mid-suite).

``pin_broadcast`` is a drop-in ``ray.put`` that keeps every broadcast
ref alive for the driver-process lifetime, closing the window.  The
pinned objects are the engine's small sides (alias dicts, query
matrices, benchmark gram sets — MBs), and a production driver runs one
pipeline per process, where process lifetime IS the natural ref
lifetime.  A long-lived multi-pipeline driver that must reclaim the
memory can call :func:`clear_pins` between pipelines, accepting the
(teardown-window) hazard for the pipeline just finished.
"""

from __future__ import annotations

from typing import Any

_PINNED: list = []


def pin_broadcast(obj: Any):
    """``ray.put(obj)`` + pin the ref for the process lifetime."""
    import ray
    ref = ray.put(obj)
    _PINNED.append(ref)
    return ref


_SLOTS: dict[str, list] = {}


def pin_refs(refs, slot: str | None = None) -> None:
    """Pin ALREADY-CREATED ObjectRefs (e.g. ``to_pandas_refs`` blocks)
    — same restart-window rationale as :func:`pin_broadcast`, for refs
    we didn't ``ray.put`` ourselves.

    ``slot=None`` pins for the process lifetime (small payloads).  A
    named ``slot`` REPLACES that slot's previous refs instead — for
    corpus-sized payloads (knn_graph pins up to ~1 GB per call) a
    long-lived multi-query driver then holds at most one generation per
    slot rather than growing the object store by a corpus per call.
    Replacement assumes the slot's previous query is no longer running
    (its actor pool has wound down by the time a new same-slot call
    starts); keep concurrent same-slot calls in separate processes."""
    if slot is None:
        _PINNED.extend(refs)
    else:
        _SLOTS[slot] = list(refs)


def clear_pins() -> int:
    """Release every pinned broadcast ref; returns how many were held."""
    n = len(_PINNED) + sum(len(v) for v in _SLOTS.values())
    _PINNED.clear()
    _SLOTS.clear()
    return n
