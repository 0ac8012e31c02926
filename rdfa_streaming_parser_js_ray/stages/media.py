"""Multimodal (media) stages: opaque binary columns + typed metadata.

Images/audio/video ride through the pipeline as opaque ``binary`` payloads
(or ``media_ref`` pointers in the interleaved-documents table) with typed
metadata columns.  Decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages whose Ray-side plumbing — schema, batch
size, actor signature, output layout — is real and tested; the actual
codec call is STUBBED (no image/audio libraries in this container): a
clearly-marked deterministic fake behind ``decode_fn``, or
``NotImplementedError`` when ``strict=True``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("doc_id", pa.string()),
    ("kind", pa.string()),          # "image" | "audio" | "video" | "unknown"
    ("payload", pa.binary()),       # opaque bytes (empty when ref-only)
])


def media_manifest(docs_ds):
    """interleaved documents → one row per media span (ref passthrough).

    Proves the media half of the span invariant: every media_ref surfaces
    exactly once, in offset order, unmodified.
    """
    def explode(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "media_ref": [], "offset": [], "kind": []}
        for doc_id, spans in zip(batch["doc_id"].to_pylist(),
                                 batch["spans"].to_pylist()):
            for span in sorted(spans, key=lambda s: s["offset"]):
                if span["kind"] == "media":
                    rows["doc_id"].append(doc_id)
                    rows["media_ref"].append(span["media_ref"])
                    rows["offset"].append(span["offset"])
                    rows["kind"].append(_sniff_kind(span["media_ref"]))
        return pa.table(rows)
    return docs_ds.map_batches(explode, batch_format="pyarrow")


def _sniff_kind(media_ref: str) -> str:
    ref = media_ref.lower()
    if any(ref.endswith(e) for e in (".png", ".jpg", ".jpeg", ".webp")) or "/img" in ref:
        return "image"
    if any(ref.endswith(e) for e in (".wav", ".mp3", ".flac")) or "/aud" in ref:
        return "audio"
    if any(ref.endswith(e) for e in (".mp4", ".webm", ".mkv")) or "/vid" in ref:
        return "video"
    return "unknown"


def _fake_decode(media_ref: str, shape: tuple[int, int, int]) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels from the ref hash.

    Replace with PIL/libav in a container that has them — the surrounding
    Ray plumbing does not change.
    """
    seed = int.from_bytes(hashlib.md5(media_ref.encode()).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


class MediaDecoder:
    """Actor-pool decode stage: media_ref/payload → fixed-size tensor.

    ``__init__`` is where a real codec/model would load (once per actor);
    batches must stay SMALL (decoded frames are large — see ray_guide
    memory notes: batch_size × concurrency × frame bytes must fit the
    worker heap).
    """

    def __init__(self, height: int = 32, width: int = 32, channels: int = 3,
                 strict: bool = False):
        self.shape = (height, width, channels)
        self.strict = strict

    def __call__(self, batch: pd.DataFrame) -> dict:
        if self.strict:
            raise NotImplementedError(
                "real media decoding requires an image/audio library not "
                "present in this container; run with strict=False for the "
                "deterministic stub decoder")
        tensors = np.stack([_fake_decode(ref, self.shape)
                            for ref in batch["media_ref"]])
        return {
            "media_ref": batch["media_ref"].to_numpy(),
            "doc_id": batch["doc_id"].to_numpy(),
            "frame": tensors,
        }


class MediaFeaturizer:
    """Decode-adjacent feature extraction: per-channel means + a coarse
    16-bin intensity histogram (numpy-vectorized across the whole batch)."""

    def __call__(self, batch: dict) -> pd.DataFrame:
        frames = batch["frame"].astype(np.float32)
        means = frames.mean(axis=(1, 2))
        hist = np.stack([np.histogram(f, bins=16, range=(0, 256))[0]
                         for f in frames]).astype(np.int64)
        return pd.DataFrame({
            "media_ref": batch["media_ref"],
            "doc_id": batch["doc_id"],
            "mean_r": means[:, 0].round(4),
            "mean_g": means[:, 1].round(4),
            "mean_b": means[:, 2].round(4),
            "hist": list(hist),
        })


class MediaResizer:
    """Resize decoded frames to a target (h, w) — strided nearest-neighbor
    in pure numpy (real resize math; swapping in PIL/cv2 changes only the
    kernel, not the stage shape).  Runs on the numpy batch format so the
    (N, H, W, C) tensor stays a single contiguous array end to end."""

    def __init__(self, height: int, width: int):
        self.h = height
        self.w = width

    def __call__(self, batch: dict) -> dict:
        frames = batch["frame"]
        n, src_h, src_w = frames.shape[:3]
        ys = (np.arange(self.h) * src_h // self.h)
        xs = (np.arange(self.w) * src_w // self.w)
        batch["frame"] = frames[:, ys[:, None], xs[None, :], :]
        return batch


def resize_media(frames_ds, height: int, width: int, concurrency: int = 2,
                 batch_size: int = 64):
    return frames_ds.map_batches(
        MediaResizer, fn_constructor_kwargs=dict(height=height, width=width),
        batch_format="numpy", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=0.5)


class FrameSampler:
    """Video frame sampling: decode ``n_frames`` evenly-spaced frames per
    video ref (stub codec — one deterministic fake frame per (ref, index);
    a real libav reader seeks the same way).  Output explodes one video
    row into n_frames rows, keyed (media_ref, frame_index)."""

    def __init__(self, n_frames: int = 4, height: int = 32, width: int = 32,
                 channels: int = 3, total_frames: int = 256):
        self.n = n_frames
        self.shape = (height, width, channels)
        self.total = total_frames

    def __call__(self, batch: pd.DataFrame) -> dict:
        refs, docs, idxs, tensors = [], [], [], []
        indices = (np.arange(self.n) * self.total) // self.n
        for doc_id, ref in zip(batch["doc_id"], batch["media_ref"]):
            for i in indices:
                refs.append(ref)
                docs.append(doc_id)
                idxs.append(int(i))
                tensors.append(_fake_decode(f"{ref}#frame={i}", self.shape))
        return {
            "media_ref": np.asarray(refs, dtype=object),
            "doc_id": np.asarray(docs, dtype=object),
            "frame_index": np.asarray(idxs, dtype=np.int32),
            "frame": np.stack(tensors) if tensors
            else np.zeros((0,) + self.shape, dtype=np.uint8),
        }


def sample_video_frames(manifest_ds, n_frames: int = 4, concurrency: int = 2,
                        batch_size: int = 16, **kwargs):
    """video rows of the manifest → (media_ref, frame_index, frame) rows.

    Small batch_size: each input row fans out to n_frames decoded tensors
    (batch bytes = batch_size × n_frames × frame bytes must fit the heap).
    """
    import pandas as pd

    def keep_videos(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["kind"].to_numpy() == "video"]

    videos = manifest_ds.map_batches(keep_videos, batch_format="pandas")
    return videos.map_batches(
        FrameSampler, fn_constructor_kwargs=dict(n_frames=n_frames, **kwargs),
        batch_format="pandas", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=0.5)


def decode_and_featurize(manifest_ds, concurrency: int = 2, batch_size: int = 64,
                         height: int = 32, width: int = 32):
    """media manifest → decoded frames → features (two actor-pool stages,
    small batches on the decoded side)."""
    frames = manifest_ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs=dict(height=height, width=width),
        batch_format="pandas", batch_size=batch_size, concurrency=concurrency, num_cpus=0.5)
    return frames.map_batches(MediaFeaturizer, batch_format="numpy",
                              batch_size=batch_size, concurrency=concurrency, num_cpus=0.5)
