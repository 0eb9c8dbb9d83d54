"""Sequence packing (concat-and-chunk) for training-data preparation.

The standard LLM pretraining layout: documents are concatenated in a
deterministic order and the token stream is cut into fixed-``budget``
windows.  This stage computes, per document, WHERE it lands — shard, token
offset, first/last pack index — without materializing the token stream:
everything derives from one lagged cumsum per shard, so the whole operator
is a per-shard integer window computation (the reference's analogue is the
notebook-side batch assembly before embedding, ESM_embed.ipynb cell 2).

Determinism and layout-invariance: shard and within-shard order are pure
functions of the document id (``rank_hash(id)``, same two-mode contract as
``reduce.quota_sample`` — ``"fast"`` pd.util.hash_array for scale,
``"md5"`` bit-identical to DuckDB ``md5_number_lower(CAST(id AS
VARCHAR))`` for the SQL oracle).  Shards are independent, so at 100 TB
each shard packs in isolation after one coarse bucket exchange and pack
ids never depend on block layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from protein_feature_engineering_ray.core.bucket import grouped_buckets
from protein_feature_engineering_ray.stages.reduce import _rank_hash

_RANK = "_pack_rank"
_SHARD = "pack_shard"


def pack_sequences(
    ds: ray.data.Dataset,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_shards: int = 8,
    num_buckets: int = 32,
    hash_fn: str = "fast",
) -> ray.data.Dataset:
    """Assign every document its packed location: ``pack_shard``,
    ``tok_offset`` (start offset in the shard's concatenated token
    stream), ``pack_first`` / ``pack_last`` (indices of the
    ``budget``-token windows the document spans; empty docs occupy one
    notional token so they pin to a single window), and ``n_splits``
    (window boundaries crossed).  Null token counts pack as 0-token
    (notional) documents rather than poisoning the cumsum."""
    assert hash_fn in ("fast", "md5"), hash_fn
    assert budget > 0 and num_shards > 0

    def annotate(t: pa.Table) -> pa.Table:
        rh = _rank_hash(t[id_col], hash_fn)
        t = t.append_column(_RANK, pa.array(rh, pa.uint64()))
        return t.append_column(
            _SHARD, pa.array((rh % np.uint64(num_shards)).astype(np.int64)))

    def pack(t: pa.Table) -> pa.Table:
        # sorted by (_SHARD, _RANK, id) — shard runs are contiguous
        n = t.num_rows
        toks = pc.fill_null(t[token_col], 0).to_numpy(zero_copy_only=False)
        toks = np.asarray(toks, dtype=np.int64)
        shard = t[_SHARD].to_numpy(zero_copy_only=False)
        csum = np.cumsum(toks)
        off = np.concatenate([[0], csum[:-1]])
        starts = np.empty(n, dtype=bool)
        if n:
            starts[0] = True
            starts[1:] = shard[1:] != shard[:-1]
        base = np.maximum.accumulate(np.where(starts, off, 0))
        off = off - base  # per-shard lagged cumsum
        first = off // budget
        last = (off + np.maximum(toks, 1) - 1) // budget
        keep = [c for c in t.column_names if c not in (_RANK, _SHARD)]
        out = t.select(keep)
        for name, arr in (
            (_SHARD, pa.array(shard, pa.int64())),
            ("tok_offset", pa.array(off, pa.int64())),
            ("pack_first", pa.array(first, pa.int64())),
            ("pack_last", pa.array(last, pa.int64())),
            ("n_splits", pa.array(last - first, pa.int64())),
        ):
            out = out.append_column(name, arr)
        return out

    annotated = ds.map_batches(annotate, batch_format="pyarrow")
    return grouped_buckets(
        annotated, pack, num_buckets=num_buckets, key=_SHARD,
        order_cols=(_SHARD, _RANK, id_col),
    )
