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
    out_dtype: str = "float64",
) -> pa.Table:
    """Assemble keys + features.  ``vector_col`` packs ALL features into one
    ``FixedSizeList[width]`` column instead of ``width`` named columns — the
    layout for very wide descriptor stacks (the reference's 8,000-column TPC
    matrix, feature.py:611; SURVEY §7.4).  ``out_dtype="float32"`` halves
    output bytes (the backfill's output stream is the one term that does not
    scale with cpu count on a single node — BASELINE.md); default float64
    keeps bit-compat with the oracles."""
    cols = dict(key_cols)
    mat = np.concatenate([np.atleast_2d(m.T).T for m in mats], axis=1) if mats else None
    np_dt = np.dtype(out_dtype)
    pa_dt = pa.from_numpy_dtype(np_dt)
    if mat is not None:
        if vector_col is not None:
            flat = np.ascontiguousarray(mat, dtype=np_dt).reshape(-1)
            cols[vector_col] = pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa_dt), mat.shape[1]
            )
        else:
            for j, name in enumerate(names):
                cols[name] = pa.array(mat[:, j].astype(np_dt, copy=False), pa_dt)
    return pa.table(cols)


def feature_names(kernels: Sequence) -> list[str]:
    """Declared feature order — the schema companion of ``vector_col``."""
    out: list[str] = []
    for k in kernels:
        out.extend(k.names())
    return out


def _empty_transcript_table() -> pa.Table:
    """Zero-row table in the canonical transcript schema — the input every
    conv-level bucket fn accepts (kernels ignore extra source columns, and a
    conv-level OUTPUT schema does not depend on the input's dtypes)."""
    return pa.table({
        "conv_id": pa.array([], pa.string()),
        "event_id": pa.array([], pa.int64()),
        "turn_idx": pa.array([], pa.int32()),
        "role": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
        "tool": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
    })


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
            conv = table["conv_id"]
            if pa.types.is_dictionary(conv.type):
                conv = conv.cast(pa.string())  # stable output schema
            keys = {
                "conv_id": conv,
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
    out = grouped_buckets(ds, fn, num_buckets=num_buckets, order_cols=order_cols)
    # schema anchor: a conv-level output schema is fully kernel-determined
    # (conv_id string + float feature columns), so union one typed ZERO-ROW
    # block — on an empty corpus map_groups yields no blocks and the dataset
    # would otherwise lose its schema (to_pandas() -> column-less frame).
    # Best-effort: kernels referencing DERIVED columns (e.g. a latency_sec
    # added upstream) — or plugin kernels with any zero-row blind spot —
    # raise on the canonical empty probe; the anchor is an optional
    # nicety, so NO probe exception may abort pipeline construction.
    try:
        anchor = ray.data.from_arrow(fn(_empty_transcript_table()))
    except Exception:
        return out
    return anchor.union(out)


def _salt_dict(conv_col, chunk: np.ndarray) -> pa.Array:
    """Dictionary-encoded ``conv#NNNNNNNNN`` chunk salt — no per-row Python.

    Only the DISTINCT (conversation, chunk) pairs of the batch are formatted
    (one per ~``chunk_size`` rows); every row carries an int32 index.  All
    downstream stages then take their dictionary fast paths: ``add_bucket``
    hashes only the small dictionary, ``sort_bucket`` rank-sorts it, and
    ``ConvContext`` segments on the int32 codes without materializing
    strings.  The zero-padded chunk suffix keeps lexicographic salt order ==
    (conv, chunk) order, so chunked outputs stay byte-identical to the
    per-row f-string construction this replaces."""
    if isinstance(conv_col, pa.ChunkedArray):
        conv_col = conv_col.combine_chunks()
    de = (
        conv_col
        if pa.types.is_dictionary(conv_col.type)
        else conv_col.dictionary_encode()
    )
    if chunk.size and int(chunk.max()) >= 1 << 32:
        raise ValueError(
            f"chunk index {int(chunk.max())} >= 2^32; raise chunk_size"
        )
    if de.null_count > 0:
        # rare null-conv path: match the legacy f-string rendering ("None#…")
        conv = np.asarray(conv_col.cast(pa.string()).to_numpy(
            zero_copy_only=False), dtype=object)
        return pa.array(
            [f"{c}#{k:09d}" for c, k in zip(conv, chunk)], pa.string()
        ).dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    combined = (codes << 32) | chunk.astype(np.int64)
    uniq, inv = np.unique(combined, return_inverse=True)
    dic = de.dictionary.to_pylist()
    salts = pa.array(
        [f"{dic[int(u >> 32)]}#{int(u & 0xFFFFFFFF):09d}" for u in uniq],
        pa.string(),
    )
    return pa.DictionaryArray.from_arrays(
        pa.array(inv.astype(np.int32), pa.int32()), salts
    )


def _explode_chunks(ds: ray.data.Dataset, chunk_size: int, L: int) -> ray.data.Dataset:
    """Salt rows into ``conv_id#chunk`` groups; rows in the last ``L``
    positions of a chunk are duplicated into the next chunk as read-only
    context (``_ctx=1``).  Requires a valid ``turn_idx``."""

    def explode(t: pa.Table) -> pa.Table:
        ti = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        chunk = ti // chunk_size
        own = t.append_column("_salt", _salt_dict(t["conv_id"], chunk))
        own = own.append_column(
            "_ctx", pa.array(np.zeros(len(t), dtype=np.int8), pa.int8())
        )
        if L == 0:
            return own
        tail = (ti % chunk_size) >= (chunk_size - L)
        if not tail.any():
            return own
        idx = np.flatnonzero(tail)
        ctx_rows = t.take(pa.array(idx))
        ctx_rows = ctx_rows.append_column(
            "_salt", _salt_dict(ctx_rows["conv_id"], chunk[idx] + 1)
        )
        ctx_rows = ctx_rows.append_column(
            "_ctx", pa.array(np.ones(len(idx), dtype=np.int8), pa.int8())
        )
        return pa.concat_tables([own, ctx_rows])

    return ds.map_batches(explode, batch_format="pyarrow")


def conv_features_chunked(
    ds: ray.data.Dataset,
    kernels: Sequence[ConvKernel],
    alphabet: Alphabet = DEFAULT_ALPHABET,
    chunk_size: int = 100_000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Conversation-level descriptors for arbitrarily long conversations:
    salted per-chunk partials -> per-conv merge -> finalize.

    Two merge protocols, chosen per kernel:

    - SUM-mergeable (``counts``/``counts_width``/``finalize`` + bounded
      ``lookback``): per-chunk partial counts (grams anchored at their last
      row, a context prefix supplying cross-boundary grams), merged by
      plain per-conv summation.  Count kernels stay EXACTLY equal to the
      unchunked path (partials travel as float64; integer counts are exact
      well past 2^52).  Covers CompositionK / NGramComposition /
      KSpacedPairs / CTDTransition / DDE, the absolute-position-grid
      PseKRAAC kernels (StridedKTuple / LambdaKTuple — grid membership
      reads the global ``turn_idx``, so per-chunk partials see the true
      grid), and the raw-positional lag kernels (SOCNumber / QSOrder /
      PAAC / APAAC, float partials — allclose, not bit-equal, because
      chunk sums reorder float addition).
    - ORDER-mergeable (``counts`` + ``merge_ordered`` + ``lookback == 0``):
      kernels whose pair structure lives on a NaN-COMPACTED series (NMBroto
      / AC / Moran / Geary) emit self-contained per-chunk stats incl. the
      first/last ``nlag`` valid boundary values; ``merge_ordered`` stitches
      chunks IN ORDER (cross-boundary lag products reconstructed from the
      boundary values), correct for ANY interior-NaN pattern without
      context rows."""
    for k in kernels:
        ordered = hasattr(k, "merge_ordered")
        if not hasattr(k, "counts") or (
            not ordered and getattr(k, "lookback", None) is None
        ):
            raise ValueError(
                f"kernel {type(k).__name__} is not decomposable "
                "(needs counts/finalize [+ bounded lookback] or "
                "counts/merge_ordered)"
            )
    L = max(
        (int(getattr(k, "lookback", 0) or 0) for k in kernels), default=0
    )
    if L >= chunk_size:
        raise ValueError(f"lookback {L} must be < chunk_size {chunk_size}")
    all_names = feature_names(kernels)

    def partial_fn(table: pa.Table) -> pa.Table:
        ctx = ConvContext(table, alphabet, seg_col="_salt")
        own = table["_ctx"].to_numpy(zero_copy_only=False) == 0
        mats = [k.counts(ctx, anchor=own) for k in kernels]
        # one salt per segment (dictionary-aware head decode — never all
        # rows); parse conv + chunk index from the conv#NNNNNNNNN suffix so
        # the merge can restore chunk order for order-mergeable kernels
        salts = ctx.conv_ids
        split = [s.rsplit("#", 1) for s in salts]
        conv = np.array([p[0] for p in split], dtype=object)
        chunk_idx = np.array([int(p[1]) for p in split], dtype=np.int64)
        # ONE FixedSizeList partial column instead of sum(counts_width) named
        # float64 columns: the merge exchange ships the same bytes but Arrow
        # handles one child buffer, not thousands of arrays (assembly, block
        # concat and the bucket sort all scale with column COUNT)
        pmat = np.ascontiguousarray(
            np.concatenate(
                [np.atleast_2d(m.T).T.astype(np.float64) for m in mats], axis=1
            )
        )
        cols = {
            "conv_id": pa.array(conv, pa.string()),
            "_chunk": pa.array(chunk_idx, pa.int64()),
            "_p": pa.FixedSizeListArray.from_arrays(
                pa.array(pmat.reshape(-1), pa.float64()), pmat.shape[1]
            ),
        }
        return pa.table(cols)

    def merge_fn(table: pa.Table) -> pa.Table:
        conv = np.asarray(
            table["conv_id"].to_numpy(zero_copy_only=False), dtype=object
        )
        from protein_feature_engineering_ray.core.bucket import segment_starts

        starts = segment_starts(conv)
        pcol = table["_p"].combine_chunks()
        width = pcol.type.list_size
        mat = (
            pcol.values.to_numpy(zero_copy_only=False)
            .astype(np.float64, copy=False)
            .reshape(len(table), width)
        )
        n_conv = len(starts) - 1
        cols = {"conv_id": pa.array(conv[starts[:-1]], pa.string())}
        off = 0
        outs = []
        for k in kernels:
            wk = k.counts_width
            sub = mat[:, off : off + wk]
            if hasattr(k, "merge_ordered"):
                # rows arrive (conv, _chunk)-sorted: combine each conv's
                # chunk partials left-to-right (tiny row count: one row per
                # 100k-turn chunk)
                fin = np.empty((n_conv, len(k.names())), dtype=np.float64)
                for ci in range(n_conv):
                    fin[ci] = k.merge_ordered(sub[starts[ci]:starts[ci + 1]])
            else:
                summed = np.add.reduceat(sub, starts[:-1], axis=0)
                fin = np.atleast_2d(k.finalize(summed).T).T
            outs.append(fin)
            off += wk
        mat_out = np.concatenate(outs, axis=1)
        for j, name in enumerate(all_names):
            cols[name] = pa.array(mat_out[:, j])
        return pa.table(cols)

    partials = grouped_buckets(
        _explode_chunks(ds, chunk_size, L), partial_fn,
        num_buckets=num_buckets, key="_salt", order_cols=("_salt", "turn_idx"),
    )
    return grouped_buckets(
        partials, merge_fn, num_buckets=num_buckets, key="conv_id",
        order_cols=("conv_id", "_chunk"),
    )


def _route_by_length(
    ds: ray.data.Dataset, chunk_size: int, max_long_convs: int
) -> tuple[ray.data.Dataset, ray.data.Dataset] | None:
    """Shared skew-router split: (short, long) datasets, or None when no
    conversation exceeds ``chunk_size`` rows.

    A column-pruned pre-pass collects the DISTINCT conv_ids owning any row
    with ``turn_idx >= chunk_size`` — by construction at most
    ``n_turns / chunk_size`` ids (loud ``max_long_convs`` cap).  The id set
    is broadcast ONCE (``ray.put``) and each batch partitions with a
    vectorized ``pc.is_in`` — no shuffle for the split.  Requires a valid
    ``turn_idx``.  The input dataset is consumed once per returned side
    plus this 2-column pre-pass — materialize upstream or read from
    storage."""
    import pyarrow.compute as pc

    import ray

    def long_ids(t: pa.Table) -> pa.Table:
        sel = t.filter(
            pc.greater_equal(t["turn_idx"], pa.scalar(chunk_size))
        )["conv_id"]
        if pa.types.is_dictionary(sel.type):
            sel = sel.cast(pa.string())
        return pa.table({"conv_id": pc.unique(sel)})

    ids_df = (
        ds.select_columns(["conv_id", "turn_idx"])
        .map_batches(long_ids, batch_format="pyarrow")
        .to_pandas()
    )
    # all-empty blocks can drop the schema entirely
    ids = (
        ids_df["conv_id"].unique() if "conv_id" in ids_df.columns else []
    )
    if len(ids) > max_long_convs:
        raise RuntimeError(
            f"{len(ids)} conversations exceed chunk_size={chunk_size} rows "
            f"(> max_long_convs={max_long_convs}); raise chunk_size or the cap"
        )
    if len(ids) == 0:
        return None
    ref = ray.put(pa.array(np.asarray(ids, dtype=object), pa.string()))

    def side(keep_long: bool):
        def fn(t: pa.Table) -> pa.Table:
            conv = t["conv_id"]
            if pa.types.is_dictionary(conv.type):
                conv = conv.cast(pa.string())
            m = pc.is_in(conv, value_set=ray.get(ref))
            if not keep_long:
                m = pc.invert(m)
            return t.filter(m)

        return fn

    return (
        ds.map_batches(side(False), batch_format="pyarrow"),
        ds.map_batches(side(True), batch_format="pyarrow"),
    )




def conv_features_auto(
    ds: ray.data.Dataset,
    kernels: Sequence[ConvKernel],
    alphabet: Alphabet = DEFAULT_ALPHABET,
    chunk_size: int = 100_000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    max_long_convs: int = 2_000_000,
) -> ray.data.Dataset:
    """Skew-routed conversation descriptors: only conversations LONGER than
    ``chunk_size`` take the salted chunked machinery; everything else takes
    the plain one-exchange ``conv_features`` path.

    ``conv_features_chunked`` pays per conversation whether it needs the
    split or not — context-row duplication, a per-chunk partial row of
    ``sum(counts_width)`` float64s, and a second merge exchange.  On a
    realistic corpus (many normal conversations, a few pathological ones)
    that overhead dwarfs the straggler it removes; measured on a corpus
    with one 33%-share mega conversation the always-chunk path is 0.7-1.0x
    the straggling unchunked path while this router is 1.3-1.7x
    (scripts/megaconv_proof.py).  Split semantics: ``_route_by_length``.

    Values are identical to ``conv_features``: count families bit-exact,
    the order-merged lag families equal up to float summation order.
    """
    routed = _route_by_length(ds, chunk_size, max_long_convs)
    if routed is None:
        return conv_features(
            ds, kernels, alphabet=alphabet, num_buckets=num_buckets
        )
    short_ds, long_ds = routed
    short_out = conv_features(
        short_ds, kernels, alphabet=alphabet, num_buckets=num_buckets
    )
    long_out = conv_features_chunked(
        long_ds, kernels, alphabet=alphabet, chunk_size=chunk_size,
        num_buckets=num_buckets,
    )
    return short_out.union(long_out)


def turn_features_chunked(
    ds: ray.data.Dataset,
    kernels: Sequence[TurnKernel],
    alphabet: Alphabet = DEFAULT_ALPHABET,
    chunk_size: int = 100_000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Per-turn features for arbitrarily long conversations (SURVEY §7.4
    'skewed conversations': the salted path).

    A conversation is split into ``chunk_size``-turn chunks keyed
    ``conv_id#chunk`` — DIFFERENT chunks hash to different buckets, so a
    10^8-turn conversation no longer has to fit one worker.  Each chunk also
    receives the last ``L`` rows of its predecessor as read-only context
    (``L`` = max declared kernel ``lookback``) and, symmetrically, the first
    ``LA`` rows of its successor (``LA`` = max declared ``lookahead``), so
    backward-looking kernels (lag, latency, rolling windows) AND
    forward-looking ones (lead) produce EXACTLY the same values as the
    unchunked path; kernels with unbounded lookback (expanding windows,
    position-in-conversation) declare ``lookback=None`` and are rejected
    here.

    Requires a valid ``turn_idx`` column (canonical transcripts; run the
    co-location pass once to assign it for events-derived tables).
    """
    lookbacks, lookaheads = [], []
    for k in kernels:
        lb = getattr(k, "lookback", None)
        if lb is None:
            raise ValueError(
                f"kernel {type(k).__name__} has unbounded lookback; it needs "
                "the whole conversation (use turn_features, or raise "
                "num_buckets for skew)"
            )
        lookbacks.append(int(lb))
        lookaheads.append(int(getattr(k, "lookahead", 0) or 0))
    L = max(lookbacks) if lookbacks else 0
    LA = max(lookaheads) if lookaheads else 0
    if max(L, LA) >= chunk_size:
        raise ValueError(
            f"lookback {L} / lookahead {LA} must be < chunk_size {chunk_size}"
        )

    fn_names = feature_names(kernels)

    def explode(t: pa.Table) -> pa.Table:
        ti = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        chunk = ti // chunk_size
        own = t.append_column("_salt", _salt_dict(t["conv_id"], chunk))
        own = own.append_column(
            "_ctx", pa.array(np.zeros(len(t), dtype=np.int8), pa.int8())
        )
        parts = [own]
        if L > 0:
            # rows in the last L positions of a chunk also feed the NEXT
            # chunk as context
            tail = (ti % chunk_size) >= (chunk_size - L)
            if tail.any():
                idx = np.flatnonzero(tail)
                ctx_rows = t.take(pa.array(idx))
                ctx_rows = ctx_rows.append_column(
                    "_salt", _salt_dict(ctx_rows["conv_id"], chunk[idx] + 1)
                )
                ctx_rows = ctx_rows.append_column(
                    "_ctx", pa.array(np.ones(len(idx), dtype=np.int8), pa.int8())
                )
                parts.append(ctx_rows)
        if LA > 0:
            # rows in the first LA positions of a chunk also feed the
            # PREVIOUS chunk as a context SUFFIX (sorted after its own rows
            # by turn_idx — exactly the window a lead kernel reads)
            head = ((ti % chunk_size) < LA) & (chunk > 0)
            if head.any():
                idx = np.flatnonzero(head)
                ctx_rows = t.take(pa.array(idx))
                ctx_rows = ctx_rows.append_column(
                    "_salt", _salt_dict(ctx_rows["conv_id"], chunk[idx] - 1)
                )
                ctx_rows = ctx_rows.append_column(
                    "_ctx", pa.array(np.ones(len(idx), dtype=np.int8), pa.int8())
                )
                parts.append(ctx_rows)
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)

    def chunk_fn(table: pa.Table) -> pa.Table:
        # context rows of chunk k have smaller turn_idx than its own rows, so
        # sorting by (salt, turn_idx) puts them first — exactly the prefix a
        # backward-looking kernel needs
        ctx = ConvContext(table, alphabet, seg_col="_salt")
        mats = [np.atleast_2d(k.apply(ctx).T).T for k in kernels]
        own = table["_ctx"].to_numpy(zero_copy_only=False) == 0
        keys = {
            "conv_id": table["conv_id"].filter(pa.array(own)),
            "turn_idx": table["turn_idx"].filter(pa.array(own)),
            "ts": table["ts"].filter(pa.array(own)),
        }
        return _feature_table(keys, [m[own] for m in mats], fn_names)

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return grouped_buckets(
        exploded, chunk_fn, num_buckets=num_buckets, key="_salt",
        order_cols=("_salt", "turn_idx"),
    )


def turn_features_auto(
    ds: ray.data.Dataset,
    kernels: Sequence[TurnKernel],
    alphabet: Alphabet = DEFAULT_ALPHABET,
    chunk_size: int = 100_000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    max_long_convs: int = 2_000_000,
) -> ray.data.Dataset:
    """Skew-routed per-turn features: the ``conv_features_auto`` router for
    the turn-level stack.  Conversations longer than ``chunk_size`` take the
    salted ``turn_features_chunked`` path (context-prefix/suffix duplication
    + per-chunk tasks), everything else the plain one-exchange
    ``turn_features`` path; the union is row-identical to ``turn_features``
    (every kernel declares a bounded lookback/lookahead, so chunked values
    are exactly equal, not merely close).  Requires a valid ``turn_idx``.
    The input dataset is consumed twice plus a 2-column pre-pass — see
    ``conv_features_auto``."""
    routed = _route_by_length(ds, chunk_size, max_long_convs)
    if routed is None:
        return turn_features(
            ds, kernels, alphabet=alphabet, num_buckets=num_buckets
        )
    short_ds, long_ds = routed
    short_out = turn_features(
        short_ds, kernels, alphabet=alphabet, num_buckets=num_buckets
    )
    long_out = turn_features_chunked(
        long_ds, kernels, alphabet=alphabet, chunk_size=chunk_size,
        num_buckets=num_buckets,
    )
    return short_out.union(long_out)


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
