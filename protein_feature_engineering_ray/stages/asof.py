"""Point-in-time (as-of) join — the engine's zero-temporal-leakage core.

Generalizes the reference's only partition-discipline operator, ``_KNN``
(feature.py:3802-3866), whose rule is "a sample's features may depend only on
the designated reference partition, never on test peers / the future"
(test<->test pairs skipped at feature.py:3832).  Here the rule becomes: a
turn at time ``ts`` may see only timeline rows with ``feat_ts <= ts`` of the
SAME conversation — a per-conversation backward sort-merge as-of join.

Distribution: both sides take the same stable ``hash(conv_id) % B`` bucket,
are tagged and unioned (one schema superset), and each bucket joins locally
with ``pd.merge_asof(by=conv_id)`` — one shuffle, no unsorted partition ever
materializes, matching the north-star streaming constraint.

Tie/ordering semantics (documented invariant):
- backward join, exact matches allowed (``feat_ts == ts`` is visible);
- among equal ``(conv_id, feat_ts)`` timeline rows the LAST under a stable
  sort by (feat_ts, tiebreak_col) wins — deterministic for any input order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from protein_feature_engineering_ray.core.bucket import (
    DEFAULT_NUM_BUCKETS,
    add_bucket,
)


def asof_join(
    turns: ray.data.Dataset,
    timeline: ray.data.Dataset,
    feature_cols: list[str],
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    right_ts: str = "feat_ts",
    tiebreak: str | None = None,
    assign_turn_idx_by: list[str] | None = None,
    left_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Backward as-of join of ``timeline`` features onto ``turns``.

    turns:    canonical transcript rows (conv_id, turn_idx, ..., ts)
    timeline: (conv_id, feat_ts, <feature_cols...>)
    Output:   turns columns + feature_cols (NaN/null where no past row).

    ``left_cols`` prunes the turn columns that ride the exchange (shuffle
    bytes; e.g. drop ``text`` when the consumer only needs keys).
    """
    if left_cols is not None:
        need = set(left_cols) | {"conv_id", "ts"} | set(assign_turn_idx_by or [])
        turns = turns.select_columns(
            [c for c in turns.schema().names if c in need]
        )
    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError, ValueError):
            return pa.string()  # numpy object dtype (str columns)

    turn_schema = turns.schema()  # ray.data Schema wrapper
    turn_cols = list(turn_schema.names)
    turn_types = {n: _pa_type(t) for n, t in zip(turn_schema.names, turn_schema.types)}

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in turn_cols}
        cols["_ats"] = t["ts"].cast(pa.timestamp("us"))
        for f in feature_cols:
            cols[f] = pa.nulls(len(t), pa.float64())
        if tiebreak:
            cols["_tb"] = pa.nulls(len(t), pa.float64())
        cols["_src"] = pa.array(np.zeros(len(t), dtype=np.int8), pa.int8())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {}
        for c in turn_cols:
            if c == "conv_id":
                cols[c] = t["conv_id"]
            else:
                cols[c] = pa.nulls(n, turn_types[c])
        cols["_ats"] = t[right_ts].cast(pa.timestamp("us"))
        for f in feature_cols:
            cols[f] = t[f].cast(pa.float64())
        if tiebreak:
            cols["_tb"] = t[tiebreak].cast(pa.float64())
        cols["_src"] = pa.array(np.ones(n, dtype=np.int8), pa.int8())
        return pa.table(cols)

    left = turns.map_batches(tag_left, batch_format="pyarrow")
    right = timeline.map_batches(tag_right, batch_format="pyarrow")
    both = left.union(right)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        lhs = g[g["_src"] == 0].drop(columns=["_src"] + feature_cols
                                     + (["_tb"] if tiebreak else []))
        rhs = g[g["_src"] == 1][["conv_id", "_ats"] + feature_cols
                                + (["_tb"] if tiebreak else [])]
        # stable deterministic right order; last among equal keys wins
        sort_keys = ["_ats"] + (["_tb"] if tiebreak else [])
        rhs = rhs.sort_values(sort_keys, kind="mergesort")
        if assign_turn_idx_by is not None:
            # placeholder turn_idx (-1) from events-derived sources: assign
            # the canonical per-conversation index inside the co-located
            # bucket (same rule as ConvContext.pos)
            lhs = lhs.sort_values(["conv_id"] + assign_turn_idx_by, kind="mergesort")
            lhs["turn_idx"] = lhs.groupby("conv_id", sort=False).cumcount().astype(
                "int32"
            )
        lhs = lhs.sort_values("_ats", kind="mergesort")
        out = pd.merge_asof(
            lhs, rhs, on="_ats", by="conv_id", direction="backward",
            allow_exact_matches=True,
        )
        if tiebreak:
            out = out.drop(columns=["_tb"])
        return out.drop(columns=["_ats"])

    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()
    joined = (
        add_bucket(both, num_buckets)
        .groupby("_bucket")
        .map_groups(join_bucket, batch_format="pandas")
    )
    return joined
