"""Skew-safe two-pass CTDD (distribution descriptor) for arbitrarily long
conversations.

CTDD (feature.py:1978-2051 + Count1 1957-1976) needs the position of the
``floor(q*count)``-th occurrence of each role group — a rank statistic, not a
sum, so it cannot ride the one-pass partial-count merge of
``conv_features_chunked``.  The two-pass plan:

1. PASS 1 (salted): per ``conv_id#chunk`` — per-group occurrence counts and
   the chunk's own-row count.  Output is one tiny row per chunk.
2. PLAN (per conv, chunks in order): totals -> the 5 target ranks per group
   (Count1 rule); each target is routed to the chunk whose cumulative count
   crosses its rank, as ``(salt, group, column, local_rank, prefix_len,
   total_len)``.  Also one anchor row per conversation so empty
   conversations still emit a (zero) feature row.
3. PASS 2 (salted, tag-union-bucket): target rows are co-located with their
   chunk's raw rows by hashing the SAME salt — no broadcast, no driver
   funnel; inside the bucket a vectorized cumcount-merge finds the
   local_rank-th occurrence and converts it to the global position
   percentage ``(prefix_len + local_pos + 1) / total_len * 100``.
4. ASSEMBLE (per conv): scatter the resolved values into the 5*G-wide row.

Four shuffles total, every intermediate O(#chunks + #targets) — a 10^8-turn
conversation never has to fit one worker.  Exactly equals the unchunked
``CTDDistribution`` output (integer ranks, single division at the end).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from protein_feature_engineering_ray.core.bucket import (
    DEFAULT_NUM_BUCKETS,
    bucket_hash,
    grouped_buckets,
    segment_starts,
)
from protein_feature_engineering_ray.core.context import ConvContext
from protein_feature_engineering_ray.core.executor import _explode_chunks
from protein_feature_engineering_ray.functions.composition import (
    CTDDistribution,
    _seg_code_counts,
)
from protein_feature_engineering_ray.schema import Alphabet, DEFAULT_ALPHABET


def ctdd_chunked(
    ds: ray.data.Dataset,
    kernel: CTDDistribution | None = None,
    alphabet: Alphabet = DEFAULT_ALPHABET,
    chunk_size: int = 100_000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    if kernel is None:
        kernel = CTDDistribution(list(alphabet.groups.keys()))
    G = len(kernel.groups)
    quants = np.asarray(kernel.QUANTS)
    NQ = len(quants)
    names = kernel.names()

    # ---- pass 1: per (conv, chunk) group counts ----------------------------
    def partial_fn(table: pa.Table) -> pa.Table:
        ctx = ConvContext(table, alphabet, seg_col="_salt")
        gc = ctx.group_codes
        seg = ctx.seg_of_row
        sel = gc >= 0
        cnt = _seg_code_counts(seg[sel], gc[sel], ctx.n_segs, G)
        first = ctx.starts[:-1]
        conv = np.asarray(
            table["conv_id"].to_numpy(zero_copy_only=False), dtype=object
        )[first]
        salts = np.asarray(
            table["_salt"].to_numpy(zero_copy_only=False), dtype=object
        )[first]
        chunk_idx = np.array(
            [int(s.rsplit("#", 1)[1]) for s in salts], dtype=np.int64
        )
        cols = {
            "conv_id": pa.array(conv, pa.string()),
            "_chunk": pa.array(chunk_idx, pa.int64()),
            "own_len": pa.array(ctx.lengths, pa.int64()),
        }
        for g in range(G):
            cols[f"c{g}"] = pa.array(cnt[:, g], pa.int64())
        return pa.table(cols)

    partials = grouped_buckets(
        _explode_chunks(ds, chunk_size, 0), partial_fn,
        num_buckets=num_buckets, key="_salt", order_cols=("_salt", "turn_idx"),
    )

    # ---- plan: per conv, route target ranks to chunks ----------------------
    def plan_fn(table: pa.Table) -> pa.Table:
        conv = np.asarray(
            table["conv_id"].to_numpy(zero_copy_only=False), dtype=object
        )
        starts = segment_starts(conv)
        chunks = table["_chunk"].to_numpy(zero_copy_only=False)
        own = table["own_len"].to_numpy(zero_copy_only=False)
        cnt = np.column_stack(
            [table[f"c{g}"].to_numpy(zero_copy_only=False) for g in range(G)]
        )
        o_conv, o_salt, o_g, o_col, o_rank = [], [], [], [], []
        o_pref, o_tot, o_anchor = [], [], []
        for ci in range(len(starts) - 1):
            a, b = starts[ci], starts[ci + 1]
            cid = conv[a]
            total_len = int(own[a:b].sum())
            # anchor: guarantees an output row even with no targets
            o_conv.append(cid); o_salt.append(""); o_g.append(-1)
            o_col.append(-1); o_rank.append(0); o_pref.append(0)
            o_tot.append(total_len); o_anchor.append(1)
            len_prefix = np.concatenate([[0], np.cumsum(own[a:b])[:-1]])
            cum = np.concatenate(
                [np.zeros((1, G), dtype=np.int64), np.cumsum(cnt[a:b], axis=0)]
            )
            totals = cum[-1]
            for g in range(G):
                c = int(totals[g])
                if c == 0:
                    continue
                # Count1 rule: [1, floor(.25c), floor(.5c), floor(.75c), c],
                # each clamped to >= 1
                ranks = np.maximum(
                    1, np.floor(quants * c).astype(np.int64)
                )
                ranks[0] = 1
                ranks[-1] = c
                # chunk containing each rank: first chunk with cum >= rank
                pos = np.searchsorted(cum[1:, g], ranks, side="left")
                for qi in range(NQ):
                    k = int(pos[qi])
                    o_conv.append(cid)
                    o_salt.append(f"{cid}#{int(chunks[a + k]):09d}")
                    o_g.append(g)
                    o_col.append(g * NQ + qi)
                    o_rank.append(int(ranks[qi] - cum[k, g]))  # local rank
                    o_pref.append(int(len_prefix[k]))
                    o_tot.append(total_len)
                    o_anchor.append(0)
        return pa.table(
            {
                "conv_id": pa.array(np.asarray(o_conv, dtype=object), pa.string()),
                "_salt": pa.array(np.asarray(o_salt, dtype=object), pa.string()),
                "gcode": pa.array(o_g, pa.int32()),
                "col": pa.array(o_col, pa.int32()),
                "local_rank": pa.array(o_rank, pa.int64()),
                "prefix_len": pa.array(o_pref, pa.int64()),
                "total_len": pa.array(o_tot, pa.int64()),
                "anchor": pa.array(o_anchor, pa.int8()),
            }
        )

    plan = grouped_buckets(
        partials, plan_fn, num_buckets=num_buckets, key="conv_id",
        order_cols=("conv_id", "_chunk"),
    )

    def split_anchors(t: pa.Table, want: int) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_columns == 0:
            return t
        return t.filter(pc.equal(t["anchor"], want))

    targets = plan.map_batches(
        lambda t: split_anchors(t, 0), batch_format="pyarrow"
    )
    def anchor_proj(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({})
        return pa.table(
            {"conv_id": t["conv_id"], "col": t["col"],
             "value": pa.array(np.zeros(len(t)), pa.float64())}
        )

    anchors = plan.map_batches(
        lambda t: split_anchors(t, 1), batch_format="pyarrow"
    ).map_batches(anchor_proj, batch_format="pyarrow")

    # ---- pass 2: tag-union-bucket on the salt, resolve positions -----------
    def prep_rows(t: pa.Table) -> pa.Table:
        ctx = ConvContext(t, alphabet)  # codes only; segmentation unused here
        gc = ctx.group_codes.astype(np.int32)
        n = len(t)
        salt = t["_salt"]
        if pa.types.is_dictionary(salt.type):
            # the target side (prep_tgts) carries plain-string salts; decode
            # so the tag-union's blocks concat under one schema
            salt = salt.cast(pa.string())
        return pa.table(
            {
                "_salt": salt,
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"].cast(pa.int64()),
                "gcode": pa.array(gc, pa.int32()),
                "col": pa.nulls(n, pa.int32()),
                "local_rank": pa.nulls(n, pa.int64()),
                "prefix_len": pa.nulls(n, pa.int64()),
                "total_len": pa.nulls(n, pa.int64()),
                "_tag": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
            }
        )

    def prep_tgts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({})
        n = len(t)
        return pa.table(
            {
                "_salt": t["_salt"],
                "conv_id": t["conv_id"],
                "turn_idx": pa.nulls(n, pa.int64()),
                "gcode": t["gcode"],
                "col": t["col"],
                "local_rank": t["local_rank"],
                "prefix_len": t["prefix_len"],
                "total_len": t["total_len"],
                "_tag": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            }
        )

    raw = _explode_chunks(ds, chunk_size, 0).map_batches(
        prep_rows, batch_format="pyarrow"
    )
    tg = targets.map_batches(prep_tgts, batch_format="pyarrow")

    _EMPTY_HITS = pd.DataFrame(
        {"conv_id": pd.Series([], dtype=object),
         "col": pd.Series([], dtype=np.int32),
         "value": pd.Series([], dtype=np.float64)}
    )

    def resolve(t: pa.Table) -> pd.DataFrame:
        if t.num_columns == 0:
            return _EMPTY_HITS
        # split sides BEFORE pandas conversion so the raw side's int columns
        # are not float-promoted by the target side's padding nulls
        import pyarrow.compute as pc

        tag = t["_tag"]
        R = t.filter(pc.equal(tag, 0)).select(
            ["_salt", "turn_idx", "gcode"]
        ).to_pandas()
        T = t.filter(pc.equal(tag, 1)).select(
            ["_salt", "gcode", "col", "local_rank", "prefix_len", "total_len"]
        ).to_pandas()
        if len(T) == 0 or len(R) == 0:
            return _EMPTY_HITS
        R = R.sort_values(["_salt", "turn_idx"], kind="mergesort")
        R = R.assign(
            _pos=R.groupby("_salt").cumcount(),
            _occ=(R.groupby(["_salt", "gcode"]).cumcount() + 1).astype(np.int64),
        )
        T = T.astype({"local_rank": np.int64, "prefix_len": np.int64,
                      "total_len": np.int64})
        m = T.merge(
            R[["_salt", "gcode", "_occ", "_pos"]],
            left_on=["_salt", "gcode", "local_rank"],
            right_on=["_salt", "gcode", "_occ"],
            how="inner",
        )
        val = (
            (m["prefix_len"] + m["_pos"] + 1).astype(np.float64)
            / m["total_len"].astype(np.float64) * 100.0
        )
        conv = m["_salt"].map(lambda s: s.rsplit("#", 1)[0])
        return pd.DataFrame(
            {"conv_id": conv.astype(object),
             "col": m["col"].astype(np.int32),
             "value": val.astype(np.float64)}
        )

    hits = grouped_buckets(
        raw.union(tg), resolve, num_buckets=num_buckets, key="_salt",
        order_cols=("_salt", "_tag", "turn_idx"),
    )

    # ---- assemble one row per conversation ---------------------------------
    def assemble(t: pa.Table) -> pd.DataFrame:
        g = t.to_pandas()
        convs = g["conv_id"].to_numpy()
        order = np.argsort(convs, kind="stable")
        convs_s = convs[order]
        st = segment_starts(convs_s)
        out = np.zeros((len(st) - 1, G * NQ))
        cols_ = g["col"].to_numpy()[order]
        vals = g["value"].to_numpy()[order]
        rows = np.repeat(np.arange(len(st) - 1), np.diff(st))
        keep = cols_ >= 0
        out[rows[keep], cols_[keep]] = vals[keep]
        res = {"conv_id": convs_s[st[:-1]]}
        for j, name in enumerate(names):
            res[name] = out[:, j]
        return pd.DataFrame(res)

    return grouped_buckets(
        hits.union(anchors), assemble, num_buckets=num_buckets,
        key="conv_id", order_cols=("conv_id",),
    )
