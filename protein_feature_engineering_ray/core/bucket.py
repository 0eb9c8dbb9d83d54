"""The one co-location shuffle.

Everything per-conversation in this engine rides on a single hash-by-
``conv_id`` exchange (SURVEY.md §7.3): rows gain a ``_bucket`` column from a
process-stable hash of ``conv_id``, then ``groupby("_bucket").map_groups``
delivers each bucket — MANY whole conversations — to one task as one Arrow
table.  Kernels then run segment-vectorized across every conversation in the
bucket (no per-row or per-conversation Python in the hot path).

Scale notes (100 TB / multi-node):
- ``num_buckets`` is the unit of shuffle parallelism AND of output
  partitioning/resume; size it so a bucket (~corpus/num_buckets) fits a
  worker's heap.  Default scales with cluster CPUs.
- Skew: a bucket holds many conversations, so one hot conversation only skews
  its bucket by its own size; for pathological mega-conversations raise
  ``num_buckets`` (salting happens naturally because OTHER convs hash away)
  and cap per-conv work in kernels (e.g. ASDC O(n²) caps, functions/).
- The same ``_bucket`` key is reused by the as-of join (stages/asof.py) and
  the resumable backfill partition layout (pipelines/backfill.py), so the
  corpus is exchanged once per pipeline, not once per operator.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

DEFAULT_NUM_BUCKETS = 64


def bucket_hash(conv_ids, num_buckets: int) -> np.ndarray:
    """Process-stable hash bucket for each conv_id (uint32).

    Uses pandas' fixed-key siphash (``pd.util.hash_array``) — deterministic
    across processes/nodes, unlike Python's salted ``hash``.
    """
    arr = np.asarray(conv_ids, dtype=object)
    return (pd.util.hash_array(arr) % np.uint64(num_buckets)).astype(np.uint32)


def add_bucket(
    ds: ray.data.Dataset,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    key: str = "conv_id",
) -> ray.data.Dataset:
    """Append the ``_bucket`` column (vectorized, stateless map_batches).

    Dictionary-encoded keys (``pre_encode(dict_conv=True)``) hash their
    small dictionary once and gather by index — same bucket assignment as
    hashing the decoded strings, without materializing them."""

    def _add(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if not pa.types.is_dictionary(col.type) and (
            pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
        ) and col.null_count == 0:
            # plain string keys: encode once and hash only the dictionary —
            # pd.util.hash_array over boxed objects is the cost, and keys
            # repeat (~turns-per-conversation times); measured 6-7x faster
            # per batch at 100x repetition, not slower even all-unique
            # (identical buckets: the hash is elementwise)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            col = col.dictionary_encode()
        if pa.types.is_dictionary(col.type):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            dic_b = bucket_hash(
                col.dictionary.to_numpy(zero_copy_only=False), num_buckets
            )
            b = dic_b[col.indices.to_numpy(zero_copy_only=False)]
        else:
            b = bucket_hash(col.to_numpy(zero_copy_only=False), num_buckets)
        return batch.append_column("_bucket", pa.array(b, pa.uint32()))

    return ds.map_batches(_add, batch_format="pyarrow")


def sort_bucket(
    table: pa.Table,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> pa.Table:
    """Stable sort of one bucket by conversation + intra-conversation order.

    String key columns (conv_id) are replaced by dictionary-RANK int64 codes
    before the multi-key sort: encode once, rank the (small) dictionary of
    distinct conversations lexicographically, sort ints.  Byte-identical
    output to sorting the strings directly, measured ~1.6x faster on a
    600k-row bucket — this sort runs inside every bucket task of the hot
    exchange, so it is ~2-3% of end-to-end backfill wall per pass.  Null
    keys fall back to the direct path (rank remap is not null-safe)."""
    if table.num_rows == 0:
        return table
    keys = []
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for i, c in enumerate(order_cols):
        col = table[c]
        is_dict = pa.types.is_dictionary(col.type)
        if is_dict or pa.types.is_string(col.type) or pa.types.is_large_string(
            col.type
        ):
            if col.null_count == 0:
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()  # unifies dictionaries
                de = col if is_dict else col.dictionary_encode()
                order = pa.compute.sort_indices(de.dictionary).to_numpy()
                rank = np.empty(len(order), dtype=np.int64)
                rank[order] = np.arange(len(order), dtype=np.int64)
                col = pa.array(
                    rank[de.indices.to_numpy(zero_copy_only=False)], pa.int64()
                )
            elif is_dict:
                col = col.cast(pa.string())  # rare null path: decode + direct
        name = f"_k{i}"
        cols[name] = col
        keys.append((name, "ascending"))
    idx = pa.compute.sort_indices(pa.table(cols), sort_keys=keys)
    return table.take(idx)


def grouped_buckets(
    ds: ray.data.Dataset,
    bucket_fn: Callable[[pa.Table], pa.Table],
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    key: str = "conv_id",
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    drop_bucket: bool = True,
    max_bucket_rows: int | None = 50_000_000,
) -> ray.data.Dataset:
    """Apply ``bucket_fn`` to each co-located, sorted bucket.

    ``bucket_fn`` receives one Arrow table per bucket, already sorted by
    ``order_cols`` (whole conversations, in turn order), and returns an Arrow
    table.  This is the engine's single wide exchange — Ray implements the
    ``groupby`` via its sort-based shuffle with streaming backpressure.

    ``max_bucket_rows`` fails loudly (instead of OOMing a worker) when a
    bucket oversubscribes — raise ``num_buckets`` (see stages/skew.py
    ``plan_buckets``), unless one conversation alone exceeds the cap, which
    needs kernel-level chunking, not more buckets.
    """

    def _fn(table: pa.Table) -> pa.Table:
        if max_bucket_rows is not None and table.num_rows > max_bucket_rows:
            raise RuntimeError(
                f"bucket holds {table.num_rows} rows > max_bucket_rows="
                f"{max_bucket_rows}; raise num_buckets (currently "
                f"{num_buckets}; see stages/skew.plan_buckets) or chunk the "
                "dominating conversation"
            )
        table = sort_bucket(table, order_cols)
        if drop_bucket and "_bucket" in table.column_names:
            table = table.drop_columns(["_bucket"])
        out = bucket_fn(table)
        return out

    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()
    return add_bucket(ds, num_buckets, key=key).groupby("_bucket").map_groups(
        _fn, batch_format="pyarrow"
    )


def segment_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Offsets (len n_segments+1) of equal-key runs in a sorted key array."""
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    change = np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1
    return np.concatenate(([0], change, [n])).astype(np.int64)
