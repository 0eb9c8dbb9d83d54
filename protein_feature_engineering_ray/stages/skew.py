"""Skew diagnostics (SURVEY.md §7.4 'skewed conversations').

A bucket holds MANY conversations, so a hot conversation skews its bucket by
at most its own size; the failure mode at 10^12 turns is a mega-conversation
whose single bucket exhausts a worker.  ``conversation_skew`` measures the
conversation-length distribution cheaply (partial counts per block -> one
small shuffle of one row per (block, conv)), and ``plan_buckets`` turns it
into a bucket-count recommendation.  The co-location pass itself enforces
``max_bucket_rows`` (core/bucket.py) so oversubscribed buckets fail loudly
with guidance instead of OOMing a worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def conversation_skew(
    ds: ray.data.Dataset, key: str = "conv_id", top_k: int = 10
) -> dict:
    """Conversation-length stats: {n_convs, total_rows, p50, p95, p99, max,
    top (list of (conv_id, rows))}.

    DIAGNOSTICS-ONLY helper, not a pipeline stage: the final
    ``.to_pandas()`` materializes one row per conversation on the driver —
    O(#conversations) driver memory.  Fine for planning runs (one int64 per
    conv — 10^8 convs ≈ a few GB); for a quantiles-only probe at extreme
    conv counts, sample conversations upstream (``bounded_sample`` on
    conv_id) before calling."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: t[key].to_numpy(zero_copy_only=False)})
        c = df.groupby(key, sort=False).size().reset_index(name="rows")
        return pa.table({key: pa.array(c[key], pa.string()),
                         "rows": pa.array(c["rows"], pa.int64())})

    per_conv = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .sum("rows")
        .to_pandas()
    )
    counts = per_conv["sum(rows)"].to_numpy()
    top = per_conv.nlargest(top_k, "sum(rows)")
    return {
        "n_convs": int(len(counts)),
        "total_rows": int(counts.sum()),
        "p50": float(np.percentile(counts, 50)),
        "p95": float(np.percentile(counts, 95)),
        "p99": float(np.percentile(counts, 99)),
        "max": int(counts.max()),
        "top": list(zip(top[key].tolist(), top["sum(rows)"].astype(int).tolist())),
    }


def plan_buckets(
    skew: dict,
    target_bucket_rows: int = 2_000_000,
    min_buckets: int = 64,
) -> int:
    """Bucket count so the EXPECTED bucket (total/buckets) stays under
    ``target_bucket_rows`` — noting that the floor is the largest single
    conversation (it cannot be split without kernel-specific decomposition;
    if max >> target, the job needs chunked kernels, not more buckets)."""
    need = int(np.ceil(skew["total_rows"] / target_bucket_rows))
    return max(min_buckets, need)
