"""Descriptor executors: conversation-level and turn-level feature stages.

The analogue of the reference's ``get_descriptor`` dispatch + per-sample loop
(feature.py:331-342 and every ``for i in self.fasta_list``): here N kernels
run over ONE co-location shuffle, vectorized across all conversations of a
bucket at once.

- ``conv_features``: one output row per conversation (composition / lag /
  autocorrelation descriptor families, SURVEY.md §2.2/2.4/2.5).
- ``turn_features``: one output row per turn (positional / rolling / lag-lead
  families, SURVEY.md §2.3) — the entity×timestamp feature stack of the
  north rule.
"""

from __future__ import annotations

from typing import Protocol, Sequence

import numpy as np
import pyarrow as pa

import ray.data

from protein_feature_engineering_ray.core.bucket import (
    DEFAULT_NUM_BUCKETS,
    grouped_buckets,
)
from protein_feature_engineering_ray.core.context import ConvContext
from protein_feature_engineering_ray.schema import Alphabet, DEFAULT_ALPHABET


class ConvKernel(Protocol):
    def names(self) -> list[str]: ...
    def apply(self, ctx: ConvContext) -> np.ndarray: ...  # (n_segs, width)


class TurnKernel(Protocol):
    def names(self) -> list[str]: ...
    def apply(self, ctx: ConvContext) -> np.ndarray: ...  # (n_rows, width)


def _feature_table(
    key_cols: dict[str, pa.Array],
    mats: list[np.ndarray],
    names: list[str],
    vector_col: str | None = None,
) -> pa.Table:
    """Assemble keys + features.  ``vector_col`` packs ALL features into one
    ``FixedSizeList<float64>[width]`` column instead of ``width`` named
    columns — the layout for very wide descriptor stacks (the reference's
    8,000-column TPC matrix, feature.py:611; SURVEY §7.4)."""
    cols = dict(key_cols)
    mat = np.concatenate([np.atleast_2d(m.T).T for m in mats], axis=1) if mats else None
    if mat is not None:
        if vector_col is not None:
            flat = np.ascontiguousarray(mat, dtype=np.float64).reshape(-1)
            cols[vector_col] = pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.float64()), mat.shape[1]
            )
        else:
            for j, name in enumerate(names):
                cols[name] = pa.array(mat[:, j])
    return pa.table(cols)


def feature_names(kernels: Sequence) -> list[str]:
    """Declared feature order — the schema companion of ``vector_col``."""
    out: list[str] = []
    for k in kernels:
        out.extend(k.names())
    return out


def _make_bucket_fn(
    kernels: Sequence, alphabet: Alphabet, per_turn: bool, assign_turn_idx: bool,
    vector_col: str | None = None,
):
    all_names = feature_names(kernels)
    if len(set(all_names)) != len(all_names):
        raise ValueError("duplicate feature names across kernels")

    def bucket_fn(table: pa.Table) -> pa.Table:
        ctx = ConvContext(table, alphabet)
        if assign_turn_idx:
            # events-derived tables carry turn_idx == -1 placeholders: the
            # true index is the position within the (conv, ts, tiebreak)-sorted
            # segment, assignable only after co-location.
            ti = ctx.pos.astype(np.int32)
            idx = table.column_names.index("turn_idx")
            table = table.set_column(idx, "turn_idx", pa.array(ti, pa.int32()))
            ctx.table = table
        mats = [np.atleast_2d(k.apply(ctx).T).T for k in kernels]
        if per_turn:
            keys = {
                "conv_id": table["conv_id"],
                "turn_idx": table["turn_idx"],
                "ts": table["ts"],
            }
        else:
            keys = {"conv_id": pa.array(ctx.conv_ids, pa.string())}
        return _feature_table(keys, mats, all_names, vector_col=vector_col)

    return bucket_fn


def conv_features(
    ds: ray.data.Dataset,
    kernels: Sequence[ConvKernel],
    alphabet: Alphabet = DEFAULT_ALPHABET,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    assign_turn_idx: bool = False,
    vector_col: str | None = None,
) -> ray.data.Dataset:
    """One row per conversation: ``conv_id`` + one float64 column per feature
    (or one packed vector column when ``vector_col`` is set)."""
    fn = _make_bucket_fn(kernels, alphabet, per_turn=False,
                         assign_turn_idx=assign_turn_idx, vector_col=vector_col)
    return grouped_buckets(ds, fn, num_buckets=num_buckets, order_cols=order_cols)


def turn_features(
    ds: ray.data.Dataset,
    kernels: Sequence[TurnKernel],
    alphabet: Alphabet = DEFAULT_ALPHABET,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    assign_turn_idx: bool = False,
    vector_col: str | None = None,
) -> ray.data.Dataset:
    """One row per turn: ``(conv_id, turn_idx, ts)`` + feature columns (or
    one packed vector column when ``vector_col`` is set)."""
    fn = _make_bucket_fn(kernels, alphabet, per_turn=True,
                         assign_turn_idx=assign_turn_idx, vector_col=vector_col)
    return grouped_buckets(ds, fn, num_buckets=num_buckets, order_cols=order_cols)
