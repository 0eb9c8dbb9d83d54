"""Deterministic synthetic scale-up of an events table (bench / scaling /
resume-proof inputs).

One independent Ray task per copy — each reads the (page-cached) parquet
itself, so the producer side scales with the cpu count instead of
serializing in a single fan-out task over the one input block.  Copy ``k``
suffixes every conv_id with ``#k``, so copies are distinct conversations and
the replicated corpus exercises the same per-conversation code paths as a
genuinely larger input.  REPLICATE <= 1 falls back to the plain reader.
"""

from __future__ import annotations

import ray.data

from protein_feature_engineering_ray.sources.transcripts import from_events


def replicated_events(
    sf_dir: str, replicate: int, ids: list[int] | None = None
) -> ray.data.Dataset:
    """``ids`` emits only those copy indices (same conv_ids/rows as the
    corresponding copies of the full build) — e.g. ``ids=[replicate]`` is
    the arrival-partitioned DELTA of a ``replicate+1``-wide corpus."""
    if replicate <= 1 and ids is None:
        return from_events(sf_dir)

    src = f"{sf_dir}/events.parquet"

    def emit(batch):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        out = []
        for k in batch["id"]:
            t = pq.read_table(src)
            value = t["value"]
            et = t["event_type"]
            conv = pc.binary_join_element_wise(
                pc.cast(t["user_id"], pa.string()),
                pc.cast(pa.scalar(f"#{k}"), pa.string()), ""
            )
            tool = pc.if_else(pc.greater_equal(value, 100.0), et,
                              pa.scalar("", pa.string()))
            out.append(pa.table({
                "conv_id": conv,
                "event_id": t["event_id"],
                "turn_idx": pa.array(
                    np.full(len(t), -1, dtype=np.int32), pa.int32()),
                "role": et,
                "text": t["props"],
                "tool": tool,
                "ts": t["ts"],
                "value": value,
            }))
        return pa.concat_tables(out)

    if ids is not None:
        base = ray.data.from_items(
            [{"id": k} for k in ids], override_num_blocks=len(ids))
    else:
        base = ray.data.range(replicate)
    return base.map_batches(emit, batch_format="numpy", batch_size=1)


def sized_num_buckets(n_turns: int) -> int:
    """SIZE-derived bucket count (a property of the DATA layout, not the cpu
    count): ~64k rows per bucket, floored to a power of two, min 64 —
    reproduces the measured optima at both bench scales (512 at 40M turns,
    64 at 2M) and keeps growing with the input at real scale."""
    return max(64, 1 << (max(1, n_turns // 65536).bit_length() - 1))
