"""Multimodal column plumbing (engine extension).

Image/audio payloads are opaque ``binary`` columns with typed metadata; the
decode/resize/feature kernels THEMSELVES are stubbed (no imaging libs in this
container — each raises ``NotImplementedError`` or applies a deterministic
fake, clearly marked), but the Ray-side plumbing is real and tested: schema,
actor-pool signature, small-batch sizing for large payloads, output layout.

Mirrors the reference's notebook model stages (SURVEY.md §2.7): expensive
one-time init in actor ``__init__``, batched work in ``__call__``, resumable
per-partition Parquet output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)


def synth_media(n: int = 64, seed: int = 5, payload_bytes: int = 1024) -> "ray.data.Dataset":
    """Deterministic fake media table matching MEDIA_SCHEMA (tests/bench)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    t = pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png" if i % 2 == 0 else "audio/wav"
                              for i in range(n)], pa.string()),
            "width": pa.array(rng.integers(16, 256, size=n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 256, size=n).astype(np.int32)),
        }
    )
    return ray.data.from_arrow(t)


class MediaFeatureActor:
    """Actor-pool feature extractor for binary media.

    The DECODE step is the plug-in point (this container has no
    imaging/audio libs): pass ``decode_factory`` — a picklable zero-arg
    callable, run ONCE per actor (the ESM ``model_factory`` pattern,
    ESM_embed.ipynb cell 2), returning ``decode(payload: bytes, mime: str)
    -> np.ndarray`` (any shape/dtype; pixels, samples, frames).  The
    feature math downstream of decode (per-chunk moments over the decoded
    array) is real and shared by both paths.  Without a factory,
    ``fake=True`` decodes the raw payload bytes as the array — a
    deterministic stand-in exercising the same plumbing — and
    ``fake=False`` raises loudly.
    """

    DIM = 8

    def __init__(self, fake: bool = True, decode_factory=None):
        self.fake = fake
        # decoder/model loads ONCE per actor process, never per batch
        self.decode = decode_factory() if decode_factory is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode is None and not self.fake:
            raise NotImplementedError(
                "real media decode requires an imaging/audio library; "
                "pass decode_factory=... or run with fake=True"
            )
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        mimes = batch["mime"].to_numpy(zero_copy_only=False)
        feats = np.zeros((len(payloads), self.DIM), dtype=np.float64)
        for i, p in enumerate(payloads):
            if self.decode is not None:
                a = np.asarray(
                    self.decode(p or b"", str(mimes[i]))
                ).astype(np.float64).ravel()
            else:
                a = np.frombuffer(p or b"\x00", dtype=np.uint8).astype(np.float64)
            # deterministic digest: moments of array chunks
            chunks = np.array_split(a, self.DIM)
            feats[i] = [c.mean() if len(c) else 0.0 for c in chunks]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "media_vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float64()), self.DIM
                ),
            }
        )


def media_features(
    ds: "ray.data.Dataset",
    concurrency: int = 2,
    batch_size: int = 32,  # SMALL: payload bytes dominate block memory
    decode_factory=None,
) -> "ray.data.Dataset":
    return ds.map_batches(
        MediaFeatureActor,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=1,
        fn_constructor_kwargs={"decode_factory": decode_factory},
    )


class MediaResizeActor:
    """Actor-pool resize stage for image payloads.  ``fake=True`` (this
    container has no imaging libs) applies a deterministic stand-in —
    payload truncated proportionally to the pixel-count ratio, width/height
    metadata updated for real — so the schema contract, metadata flow and
    actor plumbing are exercised end-to-end; ``fake=False`` raises until a
    decoder is available (the clearly-marked plug-in point)."""

    def __init__(self, out_w: int = 64, out_h: int = 64, fake: bool = True):
        self.out_w = int(out_w)
        self.out_h = int(out_h)
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real image resize requires an imaging library; run with "
                "fake=True in this environment"
            )
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = (self.out_w * self.out_h) / np.maximum(w * h, 1)
        out_p = []
        for p, r in zip(payloads, ratio):
            n = max(1, int(len(p or b"\x00") * min(r, 1.0)))
            out_p.append((p or b"\x00")[:n])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out_p, pa.binary()),
                "mime": batch["mime"],
                "width": pa.array(
                    np.full(len(batch), self.out_w, dtype=np.int32)),
                "height": pa.array(
                    np.full(len(batch), self.out_h, dtype=np.int32)),
            }
        )


def media_resize(ds: "ray.data.Dataset", out_w: int = 64, out_h: int = 64,
                 concurrency: int = 2, batch_size: int = 32) -> "ray.data.Dataset":
    return ds.map_batches(
        MediaResizeActor, fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size, num_cpus=1,
    )


def frame_sample(ds: "ray.data.Dataset", n_frames: int = 4,
                 concurrency: int = 2,
                 batch_size: int = 16) -> "ray.data.Dataset":
    """Frame-sampling stage for video/audio payloads: one input row ->
    ``n_frames`` output rows (media_id, frame_idx, frame payload).  The
    REAL decode is environment-blocked; the deterministic stand-in slices
    the payload into equal byte spans — the Ray-side shape (row fan-out via
    a flat-map style batch fn, small batches for fat payloads, stable
    output schema) is the part that matters at scale."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        out_id, out_fi, out_p = [], [], []
        for mid, p in zip(ids, payloads):
            p = p or b"\x00"
            span = max(1, len(p) // n_frames)
            for fi in range(n_frames):
                out_id.append(mid)
                out_fi.append(fi)
                out_p.append(p[fi * span: (fi + 1) * span] or b"\x00")
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_fi, pa.int32()),
                "frame": pa.array(out_p, pa.binary()),
            }
        )

    return ds.map_batches(
        fn, batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size, num_cpus=1,
    )
