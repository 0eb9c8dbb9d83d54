"""Validation stage: schema + ordering + equal-length invariants.

The reference enforces preconditions at runtime inside each descriptor
(``is_equal`` guards, feature.py:458-460, 628-630; sanitization regex 107);
here validation is ONE explicit stage so downstream kernels can assume their
invariants (SURVEY.md §7.4 'ordering correctness under distribution' —
enforced, not conventional).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from protein_feature_engineering_ray.core.bucket import (
    DEFAULT_NUM_BUCKETS,
    grouped_buckets,
)
from protein_feature_engineering_ray.core.context import ConvContext
from protein_feature_engineering_ray.schema import DEFAULT_ALPHABET, TRANSCRIPT_COLUMNS


class ValidationError(ValueError):
    pass


def validate_schema(ds: ray.data.Dataset, require=TRANSCRIPT_COLUMNS) -> ray.data.Dataset:
    missing = set(require) - set(ds.schema().names)
    if missing:
        raise ValidationError(f"missing transcript columns: {sorted(missing)}")
    return ds


def validate_conversations(
    ds: ray.data.Dataset,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    require_equal_length: bool = False,
    require_contiguous: bool = True,
    require_monotonic_ts: bool = False,
) -> ray.data.Dataset:
    """Per-conversation invariant checks inside the co-location pass; raises
    (failing the task -> the job, loudly) instead of the reference's silent
    ``error_msg`` swallowing (feature.py:452-454, 339)."""

    def fn(table: pa.Table) -> pa.Table:
        ctx = ConvContext(table, DEFAULT_ALPHABET)
        ti = table["turn_idx"].to_numpy(zero_copy_only=False)
        if require_contiguous:
            expect = ctx.pos
            if not np.array_equal(ti.astype(np.int64), expect):
                bad = ctx.seg_heads(
                    np.flatnonzero(ti.astype(np.int64) != expect)[:3])
                raise ValidationError(
                    f"non-contiguous turn_idx in conversations {list(bad)}"
                )
        if require_monotonic_ts:
            ts = ctx.ts_us
            ok = ts[1:] >= ts[:-1]
            same = ctx.same_seg(1)
            if not np.all(ok | ~same):
                raise ValidationError("non-monotonic ts within a conversation")
        if require_equal_length and ctx.n_segs > 1:
            if ctx.lengths.min() != ctx.lengths.max():
                raise ValidationError(
                    "equal-length precondition violated: lengths "
                    f"[{ctx.lengths.min()}, {ctx.lengths.max()}]"
                )
        return table

    return grouped_buckets(ds, fn, num_buckets=num_buckets)
