"""Point-in-time (as-of) join — the engine's zero-temporal-leakage core.

Generalizes the reference's only partition-discipline operator, ``_KNN``
(feature.py:3802-3866), whose rule is "a sample's features may depend only on
the designated reference partition, never on test peers / the future"
(test<->test pairs skipped at feature.py:3832).  Here the rule becomes: a
turn at time ``ts`` may see only timeline rows with ``feat_ts <= ts`` of the
SAME conversation — a per-conversation backward sort-merge as-of join.

Distribution: both sides take the same stable ``hash(conv_id) % B`` bucket,
are tagged and unioned (one schema superset), and each bucket joins locally
with a vectorized sort + running-maximum scan (rights ordered before lefts
at equal ts; one ``np.maximum.accumulate`` finds each turn's latest visible
timeline row) — one shuffle, no unsorted partition ever materializes,
matching the north-star streaming constraint.

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
    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError, ValueError):
            return pa.string()  # numpy object dtype (str columns)

    # ONE schema probe (each .schema() on a lazy Dataset executes a
    # limit-1 sample pipeline); the post-select schema is derived from it
    turn_schema = turns.schema()  # ray.data Schema wrapper
    if turn_schema is None:
        # fully-empty left side (zero-row source loses its schema through
        # Ray's lazy ops): emit a typed empty result mirroring the non-empty
        # path's column set — left_cols ∪ {conv_id, ts} ∪ assign_turn_idx_by
        # in canonical transcript order (the engine's canonical left shape;
        # unknown extras land at the end, float64)
        known = {"conv_id": pa.string(), "event_id": pa.int64(),
                 "turn_idx": pa.int32(), "role": pa.string(),
                 "text": pa.string(), "tool": pa.string(),
                 "ts": pa.timestamp("us"), "value": pa.float64()}
        if left_cols is not None:
            need = (set(left_cols) | {"conv_id", "ts"}
                    | set(assign_turn_idx_by or []))
        else:
            need = set(known)
        names = [c for c in known if c in need]
        names += sorted(need - set(names))
        cols = {c: pa.array([], known.get(c, pa.float64())) for c in names}
        for f in feature_cols:
            cols[f] = pa.array([], pa.float64())
        return ray.data.from_arrow(pa.table(cols))
    turn_cols = list(turn_schema.names)
    turn_types = {n: _pa_type(t) for n, t in zip(turn_schema.names, turn_schema.types)}
    if left_cols is not None:
        need = set(left_cols) | {"conv_id", "ts"} | set(assign_turn_idx_by or [])
        turn_cols = [c for c in turn_cols if c in need]
        turn_types = {c: turn_types[c] for c in turn_cols}
        turns = turns.select_columns(turn_cols)

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

    from protein_feature_engineering_ray.core.bucket import segment_starts

    def _empty_out() -> pa.Table:
        cols = {c: pa.array([], turn_types[c]) for c in turn_cols}
        for f in feature_cols:
            cols[f] = pa.array([], pa.float64())
        return pa.table(cols)

    def join_bucket(g: pa.Table) -> pa.Table:
        """Vectorized per-bucket backward as-of join (no pandas merge_asof):
        both sides sorted by (conv, ts) — rights additionally by tiebreak,
        rights ORDERED BEFORE lefts at equal ts (exact matches visible) —
        then one ``np.maximum.accumulate`` over right-row indices gives each
        left row its latest visible right row; a conv-equality check voids
        matches that leaked across a conversation boundary."""
        import pyarrow.compute as pc

        if g.num_columns == 0:
            return _empty_out()
        if "_bucket" in g.column_names:
            g = g.drop_columns(["_bucket"])
        # encode conv_id ONCE over the union table: both sides then sort,
        # merge-lexsort and equality-check on int codes instead of boxed
        # Python strings (the join only needs conv contiguity + a
        # side-consistent total order — any dictionary order qualifies)
        ck = g["conv_id"]
        if isinstance(ck, pa.ChunkedArray):
            ck = ck.combine_chunks()
        if not pa.types.is_dictionary(ck.type):
            ck = ck.dictionary_encode()
        g = g.append_column(
            "_ck", ck.indices.cast(pa.int64())
        )
        side = g["_src"]
        L = g.filter(pc.equal(side, 0)).select(
            list(turn_cols) + ["_ats", "_ck"]
        )
        rsel = ["_ck", "_ats"] + feature_cols + (["_tb"] if tiebreak else [])
        R = g.filter(pc.equal(side, 1)).select(rsel)
        nl, nr = len(L), len(R)
        if nl == 0:
            return _empty_out()
        if assign_turn_idx_by is not None:
            # placeholder turn_idx (-1) from events-derived sources: assign
            # the canonical per-conversation index inside the co-located
            # bucket (same rule as ConvContext.pos)
            keys = [("_ck", "ascending")] + [
                (c, "ascending") for c in assign_turn_idx_by
            ]
            L = L.take(pc.sort_indices(L, sort_keys=keys))
            starts = segment_starts(
                L["_ck"].to_numpy(zero_copy_only=False)
            )
            seg = np.repeat(np.arange(len(starts) - 1), np.diff(starts))
            pos = (np.arange(nl) - starts[seg]).astype(np.int32)
            L = L.set_column(
                L.column_names.index("turn_idx"), "turn_idx",
                pa.array(pos, pa.int32()),
            )
        L = L.take(pc.sort_indices(
            L, sort_keys=[("_ck", "ascending"), ("_ats", "ascending")]
        ))
        rkeys = [("_ck", "ascending"), ("_ats", "ascending")] + (
            [("_tb", "ascending")] if tiebreak else []
        )
        R = R.take(pc.sort_indices(R, sort_keys=rkeys))
        conv_l = L["_ck"].to_numpy(zero_copy_only=False)
        conv_r = R["_ck"].to_numpy(zero_copy_only=False)
        ats_l = L["_ats"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ats_r = R["_ats"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        conv_all = np.concatenate([conv_r, conv_l])
        ats_all = np.concatenate([ats_r, ats_l])
        side_all = np.concatenate(
            [np.zeros(nr, np.int8), np.ones(nl, np.int8)]
        )
        # rights before lefts at equal (conv, ts); stable, so equal-key
        # rights keep their (ts, tiebreak) order and max index = last wins
        order = np.lexsort((side_all, ats_all, conv_all))
        marker = np.where(order < nr, order, -1)
        last = np.maximum.accumulate(marker)
        left_pos = np.flatnonzero(order >= nr)
        l_idx = order[left_pos] - nr
        lastr = last[left_pos]
        valid = lastr >= 0
        if valid.any():
            vv = np.flatnonzero(valid)
            valid[vv] = conv_r[lastr[vv]] == conv_l[l_idx[vv]]
        cols = {c: L[c] for c in turn_cols}
        li, ri = l_idx[valid], lastr[valid]
        for f in feature_cols:
            fv = R[f].to_numpy(zero_copy_only=False).astype(np.float64)
            out = np.full(nl, np.nan)
            out[li] = fv[ri]
            cols[f] = pa.array(out, pa.float64())
        return pa.table(cols)

    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()
    joined = (
        add_bucket(both, num_buckets)
        .groupby("_bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
    return joined
