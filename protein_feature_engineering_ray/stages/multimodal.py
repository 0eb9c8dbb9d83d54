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

    ``fake=True`` (default in this container) computes a deterministic
    payload digest vector; ``fake=False`` is the real-decoder path and raises
    ``NotImplementedError`` until an imaging/audio lib is available.
    """

    DIM = 8

    def __init__(self, fake: bool = True):
        self.fake = fake
        # real path would load the decoder/model ONCE here (the ESM pattern,
        # ESM_embed.ipynb cell 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires an imaging/audio library; "
                "run with fake=True in this environment"
            )
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        feats = np.zeros((len(payloads), self.DIM), dtype=np.float64)
        for i, p in enumerate(payloads):
            a = np.frombuffer(p or b"\x00", dtype=np.uint8).astype(np.float64)
            # deterministic fake "embedding": moments of byte chunks
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
) -> "ray.data.Dataset":
    return ds.map_batches(
        MediaFeatureActor,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=1,
    )
