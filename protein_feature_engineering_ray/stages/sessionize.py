"""Gap-based sessionization + fixed-stride frames (SURVEY.md §7.1 step 6).

The transcript analogue of the reference's window segmentation:
- ``sessionize``: a new session starts at the first turn of a conversation or
  whenever the inter-turn gap exceeds ``gap_seconds`` (north-star gap-based
  sessionization).  Pure per-turn output; vectorized cumsum over segment
  boundaries.
- ``assign_frames`` / ``frame_features``: fixed-stride frame segmentation —
  the reference's ``gapModel`` strided sampling (feature.py:2732, 2745, 2761)
  generalized to tumbling frames of ``stride`` turns; ``frame_features``
  emits one row per (conv, frame) with role composition + bounds, i.e. the
  per-frame feature stack.

Both ride the same co-location shuffle as every other per-conversation stage.
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
from protein_feature_engineering_ray.functions.composition import (
    _seg_code_counts,
)
from protein_feature_engineering_ray.schema import Alphabet, DEFAULT_ALPHABET


def _session_ids(ctx: ConvContext, gap_us: int) -> np.ndarray:
    """0-based session index within each conversation."""
    n = ctx.n
    ts = ctx.ts_us
    new = np.ones(n, dtype=np.int64)  # first row of bucket starts a session
    if n > 1:
        same = ctx.same_seg(1)
        gap_break = (ts[1:] - ts[:-1]) > gap_us
        new[1:] = (~same | gap_break).astype(np.int64)
    sid_global = np.cumsum(new) - 1
    # rebase per conversation so session_idx starts at 0 in every conv
    first_sid = sid_global[ctx.starts[:-1]]
    return sid_global - first_sid[ctx.seg_of_row]


def sessionize(
    ds: ray.data.Dataset,
    gap_seconds: float = 1800.0,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    assign_turn_idx: bool = False,
) -> ray.data.Dataset:
    """Input transcript rows + ``session_idx:int64`` (0-based per conversation)."""
    gap_us = int(gap_seconds * 1e6)

    def fn(table: pa.Table) -> pa.Table:
        ctx = ConvContext(table, DEFAULT_ALPHABET)
        if assign_turn_idx:
            ti = ctx.pos.astype(np.int32)
            idx = table.column_names.index("turn_idx")
            table = table.set_column(idx, "turn_idx", pa.array(ti, pa.int32()))
            ctx.table = table
        sid = _session_ids(ctx, gap_us)
        return table.append_column("session_idx", pa.array(sid, pa.int64()))

    return grouped_buckets(ds, fn, num_buckets=num_buckets, order_cols=order_cols)


def session_stats(
    ds: ray.data.Dataset,
    gap_seconds: float = 1800.0,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> ray.data.Dataset:
    """One row per (conv_id, session_idx): n_turns + wall duration — computed
    segment-vectorized in the SAME bucket pass as session assignment (no
    second shuffle, no per-session Python)."""
    gap_us = int(gap_seconds * 1e6)

    def fn(table: pa.Table) -> pa.Table:
        ctx = ConvContext(table, DEFAULT_ALPHABET)
        sid = _session_ids(ctx, gap_us)
        # global session key: sessions are contiguous runs in the sorted bucket
        new = np.ones(ctx.n, dtype=bool)
        new[1:] = (sid[1:] != sid[:-1]) | (ctx.seg_of_row[1:] != ctx.seg_of_row[:-1])
        sess_start = np.flatnonzero(new)
        sess_end = np.concatenate((sess_start[1:], [ctx.n])) - 1
        ts = ctx.ts_us
        return pa.table(
            {
                "conv_id": pa.array(ctx.seg_heads(sess_start), pa.string()),
                "session_idx": pa.array(sid[sess_start], pa.int64()),
                "n_turns": pa.array(
                    (sess_end - sess_start + 1).astype(np.float64), pa.float64()
                ),
                "duration_sec": pa.array(
                    (ts[sess_end] - ts[sess_start]).astype(np.float64) / 1e6,
                    pa.float64(),
                ),
            }
        )

    return grouped_buckets(ds, fn, num_buckets=num_buckets, order_cols=order_cols)


def session_composition(
    ds: ray.data.Dataset,
    alphabet: Alphabet,
    gap_seconds: float = 1800.0,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> ray.data.Dataset:
    """Per-(conv, session) role composition — the composition family (§2.2)
    re-anchored on sessions instead of whole conversations.  Same single
    bucket pass as session assignment; counts exact (SQL-oracle parity)."""
    gap_us = int(gap_seconds * 1e6)

    def fn(table: pa.Table) -> pa.Table:
        ctx = ConvContext(table, alphabet)
        sid = _session_ids(ctx, gap_us)
        new = np.ones(ctx.n, dtype=bool)
        new[1:] = (sid[1:] != sid[:-1]) | (ctx.seg_of_row[1:] != ctx.seg_of_row[:-1])
        sess_of_row = np.cumsum(new) - 1
        ns = int(sess_of_row[-1]) + 1 if ctx.n else 0
        codes = ctx.codes
        valid = codes >= 0
        counts = _seg_code_counts(
            sess_of_row[valid], codes[valid], ns, alphabet.size)
        n_turns = np.bincount(sess_of_row, minlength=ns)
        first = np.flatnonzero(new)
        denom = n_turns.astype(np.float64)
        denom[denom == 0] = 1.0
        cols = {
            "conv_id": pa.array(ctx.seg_heads(first), pa.string()),
            "session_idx": pa.array(sid[first], pa.int64()),
            "n_turns": pa.array(n_turns, pa.int64()),
        }
        for i, s in enumerate(alphabet.letters):
            cols[f"sess_{s}"] = pa.array(counts[:, i] / denom, pa.float64())
        return pa.table(cols)

    return grouped_buckets(ds, fn, num_buckets=num_buckets, order_cols=order_cols)


def frame_features(
    ds: ray.data.Dataset,
    stride: int = 8,
    alphabet: Alphabet = DEFAULT_ALPHABET,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    assign_turn_idx: bool = False,
) -> ray.data.Dataset:
    """One row per (conv_id, frame_idx): tumbling ``stride``-turn frames with
    role composition counts + frame bounds.

    Output: conv_id, frame_idx, n_turns, ts_first, ts_last, frame role counts
    ``frame_<letter>`` (raw counts, gapModel-style feature.py:2732).
    """

    def fn(table: pa.Table) -> pa.Table:
        ctx = ConvContext(table, alphabet)
        if assign_turn_idx:
            ti = ctx.pos.astype(np.int32)
            idx = table.column_names.index("turn_idx")
            table = table.set_column(idx, "turn_idx", pa.array(ti, pa.int32()))
            ctx.table = table
        frame = ctx.pos // stride
        # rows arrive sorted by (conv, pos), so the (segment, frame) key is
        # non-decreasing and frames are CONTIGUOUS RUNS: run boundaries give
        # the frame index, sizes and first/last positions in O(n) — the same
        # idiom as session_composition (np.unique would re-sort; the
        # minimum/maximum.at scatters it replaces are unbuffered)
        new = np.ones(ctx.n, dtype=bool)
        if ctx.n:
            new[1:] = (frame[1:] != frame[:-1]) | (
                ctx.seg_of_row[1:] != ctx.seg_of_row[:-1])
        inv = np.cumsum(new) - 1
        nf = int(inv[-1]) + 1 if ctx.n else 0
        codes = ctx.codes
        valid = codes >= 0
        counts = _seg_code_counts(
            inv[valid], codes[valid], nf, alphabet.size)
        ts = ctx.ts_us
        first_pos = np.flatnonzero(new)
        last_pos = np.append(first_pos[1:], ctx.n) - 1
        n_turns = last_pos - first_pos + 1
        ts_first = ts[first_pos]
        ts_last = ts[last_pos]
        cols = {
            "conv_id": pa.array(ctx.seg_heads(first_pos), pa.string()),
            "frame_idx": pa.array(frame[first_pos], pa.int64()),
            "n_turns": pa.array(n_turns, pa.int64()),
            "ts_first": pa.array(ts_first, pa.timestamp("us")),
            "ts_last": pa.array(ts_last, pa.timestamp("us")),
        }
        for i, s in enumerate(alphabet.letters):
            cols[f"frame_{s}"] = pa.array(counts[:, i], pa.int64())
        return pa.table(cols)

    return grouped_buckets(ds, fn, num_buckets=num_buckets, order_cols=order_cols)
