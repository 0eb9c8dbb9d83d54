"""Coarse-bucket hash joins (inner / left_outer / left_semi / left_anti).

Ray 2.49's native ``Dataset.join`` hash-shuffles each side into
``num_partitions`` pyarrow tables and joins them pairwise with Acero — but an
EMPTY partition is built as a schema-less table, and Acero then fails with
"No match for FieldRef on right side of the join" whenever any partition
receives no rows (guaranteed at test scale, possible at any scale).  Acero
also rejects list-typed payload columns outright.

This module instead expresses a join as the engine's one idiom for wide
operations: tag each side, union them under one superset schema, shuffle ONCE
on a coarse key-hash bucket (push-based sort shuffle, see config.py), and
merge the co-located sides vectorized in pandas inside each fat bucket.
Empty buckets simply produce no groups — no schema-less partitions — and
payload columns of any type ride through untouched.

Scale notes: one shuffle per join; ``num_buckets`` plays the same role as in
core/bucket.py (unit of shuffle parallelism — a bucket must fit a worker's
heap).  Key skew: a hot join key skews only its bucket; salt upstream if a
single key's rows exceed a bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_SIDE = "_join_side"
_JB = "_jb"


def _key_bucket(df: pd.DataFrame, num_buckets: int) -> np.ndarray:
    """Process-stable bucket of each row's key tuple (combined row hash).
    Key dtypes must match across sides — same requirement as any hash join."""
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _drop_null_keys(t: pa.Table, key_cols: list[str]) -> pa.Table:
    """SQL null-key semantics: a null join key matches nothing — drop rows
    with any null key (pandas merge would match NaN keys to each other)."""
    import pyarrow.compute as pc

    valid = None
    for k in key_cols:
        v = pc.is_valid(t[k])
        valid = v if valid is None else pc.and_(valid, v)
    if valid is not None and not pc.all(valid).as_py():
        t = t.filter(valid)
    return t


def bucket_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    num_buckets: int = 64,
    right_suffix: str = "_r",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    right_types: list[pa.DataType] | None = None,
) -> ray.data.Dataset:
    """Join two Datasets on equality of ``on`` (left) vs ``right_on`` (right).

    ``how``: "inner" | "left_outer" | "left_semi" | "left_anti".
    semi/anti return left columns only; inner/left_outer append the right
    side's non-key columns (collisions renamed with ``right_suffix``).

    Pass ``left_cols`` / ``right_cols`` (column name lists) when known to
    avoid a schema-probe execution of each input's lineage.  When passing
    ``right_cols``, also pass ``right_types`` (parallel pyarrow types) if you
    can: it types the left side's padding columns, so buckets that receive no
    right rows still emit concretely-typed right-value columns.  Without it
    such buckets emit Arrow ``null``-typed columns — valid for every
    downstream Arrow kernel (promotes to the concrete type on concat), but
    ``to_pandas()`` on the raw join output then carries a block-mix-dependent
    dtype (object vs float64) for those columns.
    """
    assert how in ("inner", "left_outer", "left_semi", "left_anti"), how
    on = list(on)
    right_on = list(right_on or on)
    assert len(on) == len(right_on)

    def _schema(ds, cols):
        if cols is not None:
            return list(cols), None
        s = ds.schema()
        return list(s.names), list(s.types)

    lnames, ltypes = _schema(left, left_cols)
    rnames, rtypes = _schema(right, right_cols)
    if right_types is not None:
        rtypes = list(right_types)
        assert len(rtypes) == len(rnames), (rnames, rtypes)
    # Ray's Schema.types reports python classes (not pyarrow DataTypes) for
    # object columns of pandas-backed blocks — only concrete Arrow types can
    # type the padding; anything else falls back to null-typed padding
    rtype_of = {
        n: t
        for n, t in zip(rnames, rtypes or [])
        if isinstance(t, pa.DataType)
    }
    # right value (non-key) columns, renamed on collision with ANY left col
    rvals = [c for c in rnames if c not in right_on]
    rv_out = [c + right_suffix if c in lnames else c for c in rvals]
    keep_right = how in ("inner", "left_outer")
    out_names = lnames + (rv_out if keep_right else [])

    # unified wire schema: left cols + right value cols (+ _side, _jb);
    # right keys travel IN the left key column slots

    def pad_left(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # schema-less empty block from an upstream groupby
            return pa.table({})
        cols = {c: t[c] for c in lnames}
        for c, oc in zip(rvals, rv_out):
            cols[oc] = pa.nulls(len(t), type=rtype_of.get(c))
        key_df = t.select(on).to_pandas()
        cols[_JB] = pa.array(_key_bucket(key_df, num_buckets), pa.int32())
        cols[_SIDE] = pa.array(np.zeros(len(t), dtype=np.int8), pa.int8())
        return pa.table(cols)

    def pad_right(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({})
        # drop right rows with any null key (_drop_null_keys); left
        # null-key rows then fall through as non-matches (inner/semi drop
        # them, left_outer/anti keep them unmatched).
        t = _drop_null_keys(t, right_on)
        cols = {}
        for lk, rk in zip(on, right_on):
            cols[lk] = t[rk]
        for c in lnames:
            if c not in on:
                cols[c] = pa.nulls(len(t))
        for c, oc in zip(rvals, rv_out):
            cols[oc] = t[c]
        key_df = t.select(right_on).to_pandas()
        cols[_JB] = pa.array(_key_bucket(key_df, num_buckets), pa.int32())
        cols[_SIDE] = pa.array(np.ones(len(t), dtype=np.int8), pa.int8())
        # order must match pad_left for the union
        return pa.table({c: cols[c] for c in lnames + rv_out + [_JB, _SIDE]})

    def merge(g: pa.Table) -> pa.Table:
        # The pandas merge sees KEY COLUMNS ONLY (plus row-number columns);
        # payload columns — packed binary signatures, list columns, text —
        # never convert to pandas: match indices gather them with zero-copy
        # Arrow take/filter.  Sides split BEFORE the key conversion: within
        # its own rows every key is null-free, so int64 keys stay int64 (a
        # joint conversion would see the other side's padding nulls and
        # promote to float64, silently breaking the next join's key hash).
        import pyarrow.compute as pc

        side = g[_SIDE]
        L = g.filter(pc.equal(side, 0)).select(lnames)
        R = g.filter(pc.equal(side, 1))
        lkey = L.select(on).to_pandas()
        if how == "inner" or how == "left_outer":
            Rv = R.select(on + rv_out)
            rkey = Rv.select(on).to_pandas()
            lkey["_li"] = np.arange(len(lkey), dtype=np.int64)
            rkey["_ri"] = np.arange(len(rkey), dtype=np.int64)
            m = lkey.merge(
                rkey, on=on, how="inner" if how == "inner" else "left",
                suffixes=(None, None),
            )
            Lt = L.take(pa.array(m["_li"].to_numpy(), pa.int64()))
            if how == "inner":
                ri = pa.array(m["_ri"].to_numpy(), pa.int64())
            else:
                # unmatched left rows: null indices -> Arrow take emits null
                # rows in the column's own (wire) type — fully-matched and
                # zero-right buckets stay on one per-column schema
                rn = m["_ri"].to_numpy()
                miss = np.isnan(rn) if rn.dtype.kind == "f" else np.zeros(
                    len(rn), dtype=bool
                )
                ri = pa.array(
                    np.where(miss, 0, rn).astype(np.int64), pa.int64(),
                    mask=miss,
                )
            Rt = Rv.select(rv_out).take(ri)
            return pa.table(
                {c: Lt[c] for c in lnames} | {c: Rt[c] for c in rv_out}
            )
        # semi/anti: dedupe right keys, probe membership (left order and
        # multiplicity preserved: one output row per left row vs deduped rk)
        rk = R.select(on).to_pandas().drop_duplicates()
        m = lkey.merge(rk, on=on, how="left", indicator=True)["_merge"]
        mask = (m == "both").to_numpy()
        if how == "left_anti":
            mask = ~mask
        return L.filter(pa.array(mask))

    lt = left.map_batches(pad_left, batch_format="pyarrow")
    rt = right.map_batches(pad_right, batch_format="pyarrow")
    return (
        lt.union(rt)
        .groupby(_JB)
        .map_groups(merge, batch_format="pyarrow")
    )


def flag_join(
    left: ray.data.Dataset,
    markers: dict,
    on: list[str],
    num_buckets: int = 64,
    left_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Append one int64 0/1 MEMBERSHIP column per marker set, all in ONE
    co-grouped exchange.

    ``markers`` maps flag name -> a Dataset carrying the ``on`` key
    columns (any other columns are ignored); the output is every left row
    plus ``flag = 1`` iff its key appears in that marker set.  Chaining a
    ``left_outer`` ``bucket_join`` per flag costs N shuffles of the
    progressively wider left side (and N schema probes); here the left
    rows ride the key-hash exchange exactly ONCE and every marker ships
    only its key columns through the same union.  Null marker keys match
    nothing (SQL semantics); a left row with a null key gets flag 0.

    Scale shape: identical to ``bucket_join`` — one coarse key-hash
    shuffle, vectorized membership probes inside each fat bucket, hot keys
    skew only their bucket."""
    import pyarrow.compute as pc

    assert markers, "flag_join needs at least one marker set"
    names = list(markers)
    assert len(names) <= 127, "flag_join supports at most 127 marker sets"
    if left_cols is not None:
        lnames = list(left_cols)
    else:
        lnames = list(left.schema().names)
    bad = [n for n in names if n in lnames or n in on]
    assert not bad, f"flag names collide with left columns: {bad}"

    def canon_keys(t: pa.Table) -> tuple[list[np.ndarray], np.ndarray]:
        """Per-key-column canonical string form (Arrow cast — injective for
        a fixed key type, and crucially computed WITHOUT pandas conversion:
        a null-bearing int key column would otherwise promote to float64 on
        the side that holds the nulls and silently stop matching the other
        side) plus the rows' all-keys-valid mask.  Caveat shared with
        ``bucket_join``: float keys follow canonical-form equality, so
        -0.0 and 0.0 are distinct keys on either primitive."""
        out, valid = [], np.ones(t.num_rows, dtype=bool)
        for k in on:
            c = t[k]
            valid &= pc.is_valid(c).to_numpy(zero_copy_only=False)
            s = pc.fill_null(pc.cast(c, pa.string()), "\x00null")
            out.append(np.asarray(
                s.to_numpy(zero_copy_only=False), dtype=object))
        return out, valid

    def key_bucket(t: pa.Table) -> pa.Array:
        df = pd.DataFrame(dict(zip(on, canon_keys(t)[0])))
        return pa.array(_key_bucket(df, num_buckets), pa.int32())

    def pad_left(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({})
        cols = {c: t[c] for c in lnames}
        cols[_JB] = key_bucket(t)
        cols[_SIDE] = pa.array(np.zeros(len(t), dtype=np.int8), pa.int8())
        return pa.table(cols)

    def pad_marker(i: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return pa.table({})
            t = _drop_null_keys(t, on)
            cols = {k: t[k] for k in on}
            for c in lnames:
                if c not in on:
                    cols[c] = pa.nulls(len(t))
            cols[_JB] = key_bucket(t)
            cols[_SIDE] = pa.array(
                np.full(len(t), i, dtype=np.int8), pa.int8())
            return pa.table({c: cols[c] for c in lnames + [_JB, _SIDE]})

        return fn

    def _index(keys: list[np.ndarray]):
        return (pd.MultiIndex.from_arrays(keys) if len(keys) > 1
                else pd.Index(keys[0]))

    def merge(g: pa.Table) -> pa.Table:
        # one scan of the side tags; markers probe on KEY columns only
        # (payload columns never copy per marker)
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        L = g.filter(pa.array(side == 0)).select(lnames)
        lkeys, lvalid = canon_keys(L)
        lidx = _index(lkeys)
        gk = g.select(on)
        cols = {c: L[c] for c in lnames}
        for i, name in enumerate(names, start=1):
            rkeys, _ = canon_keys(gk.filter(pa.array(side == i)))
            # a left NULL key matches nothing, even the canonical sentinel
            # string carried literally by some marker row
            hit = lidx.isin(_index(rkeys)) & lvalid
            cols[name] = pa.array(hit.astype(np.int64), pa.int64())
        return pa.table(cols)

    parts = [left.map_batches(pad_left, batch_format="pyarrow")]
    for i, name in enumerate(names, start=1):
        parts.append(markers[name].map_batches(
            pad_marker(i), batch_format="pyarrow"))
    return (
        parts[0].union(*parts[1:])
        .groupby(_JB)
        .map_groups(merge, batch_format="pyarrow")
    )
