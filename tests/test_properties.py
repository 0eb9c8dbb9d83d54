"""Property-based kernel tests (hypothesis) — SURVEY.md §5.3.

These exercise the segment-vectorized kernels directly on in-memory Arrow
tables via ``ConvContext`` (no Ray round-trip per example), against the
loop-style oracle, over randomized corpora: ragged conversation lengths,
unknown roles, single-turn conversations, equal timestamps.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import os

from hypothesis import given, settings
from hypothesis import strategies as st

# soak knob: GRAFT_HYP_SCALE=20 multiplies every test's example budget
_HYP_SCALE = int(os.environ.get("GRAFT_HYP_SCALE", "1"))

from protein_feature_engineering_ray.core.context import ConvContext
from protein_feature_engineering_ray.functions import composition as comp
from protein_feature_engineering_ray.functions import positional as pos
from protein_feature_engineering_ray.schema import Alphabet

from tests import oracle

ALPHA = Alphabet(
    letters=("a", "b", "c"),
    groups={"g1": ("a", "b"), "g2": ("c",)},
)
ROLES = ["a", "b", "c", "???"]  # includes an unknown (encodes to -1)


@st.composite
def corpora(draw):
    n_convs = draw(st.integers(1, 6))
    rows = []
    for k in range(n_convs):
        length = draw(st.integers(1, 12))
        t = 0
        for j in range(length):
            role = draw(st.sampled_from(ROLES))
            t += draw(st.integers(0, 5))  # allows equal-ts ties
            rows.append(
                {"conv_id": f"c{k}", "turn_idx": j, "role": role,
                 "text": f"c{k}:{j}", "tool": "",
                 "ts": np.datetime64(1_700_000_000_000_000 + t * 1_000_000, "us"),
                 "value": float(draw(st.integers(-5, 5)))}
            )
    return pd.DataFrame(rows)


def _ctx(df: pd.DataFrame) -> ConvContext:
    df = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return ConvContext(pa.Table.from_pandas(df, preserve_index=False), ALPHA)


def _frame(ctx, kernel) -> pd.DataFrame:
    m = np.atleast_2d(kernel.apply(ctx).T).T
    out = pd.DataFrame(m, columns=kernel.names())
    out.insert(0, "conv_id", ctx.conv_ids)
    return out


def _check(got: pd.DataFrame, want: pd.DataFrame, keys=("conv_id",)):
    got = got.sort_values(list(keys)).reset_index(drop=True)
    want = want.sort_values(list(keys)).reset_index(drop=True)
    for c in want.columns:
        if c in keys:
            continue
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float),
            rtol=1e-9, atol=1e-12, err_msg=c,
        )


@settings(max_examples=40 * _HYP_SCALE, deadline=None)
@given(corpora())
def test_composition_properties(df):
    ctx = _ctx(df)
    _check(_frame(ctx, comp.CompositionK(list(ALPHA.letters))),
           oracle.composition(df, ALPHA))
    _check(_frame(ctx, comp.NGramComposition(list(ALPHA.letters), n=2)),
           oracle.ngram(df, ALPHA, n=2))
    _check(_frame(ctx, comp.KSpacedPairs(list(ALPHA.letters), kspace=2)),
           oracle.kspaced(df, ALPHA, kspace=2))
    _check(_frame(ctx, comp.CTDDistribution(list(ALPHA.groups))),
           oracle.ctdd(df, ALPHA))
    _check(_frame(ctx, comp.StridedKTuple(list(ALPHA.groups), k=2, gap=1)),
           oracle.stride_ktuple(df, ALPHA, k=2, gap=1))


@settings(max_examples=40 * _HYP_SCALE, deadline=None)
@given(corpora())
def test_rolling_properties(df):
    ctx = _ctx(df)
    kern = pos.RollingComposition(list(ALPHA.letters), w=3)
    m = kern.apply(ctx)
    got = pd.DataFrame(m, columns=kern.names())
    srt = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got.insert(0, "conv_id", srt["conv_id"])
    got.insert(1, "turn_idx", srt["turn_idx"])
    _check(got, oracle.rolling_composition(df, ALPHA, w=3),
           keys=("conv_id", "turn_idx"))
    # invariant: rolling composition rows over VALID codes sum to <= 1 and
    # equal the valid fraction of the window
    assert (m.sum(axis=1) <= 1.0 + 1e-12).all()


@settings(max_examples=30 * _HYP_SCALE, deadline=None)
@given(corpora(), st.integers(1, 4))
def test_lag_properties(df, lag):
    ctx = _ctx(df)
    kern = pos.LagLead("value", offsets=(lag,))
    m = kern.apply(ctx)[:, 0]
    srt = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # invariant: first `lag` rows of every conversation are NaN, the rest
    # equal the value `lag` rows back
    for cid, g in srt.groupby("conv_id"):
        vals = m[g.index.to_numpy()]
        assert np.isnan(vals[: min(lag, len(g))]).all()
        if len(g) > lag:
            np.testing.assert_array_equal(
                vals[lag:], g["value"].to_numpy()[:-lag]
            )


def test_empty_and_degenerate():
    # empty table
    empty = pd.DataFrame({"conv_id": pd.Series([], dtype=str),
                          "turn_idx": pd.Series([], dtype=np.int32),
                          "role": pd.Series([], dtype=str),
                          "text": pd.Series([], dtype=str),
                          "tool": pd.Series([], dtype=str),
                          "ts": pd.Series([], dtype="datetime64[us]"),
                          "value": pd.Series([], dtype=float)})
    ctx = ConvContext(pa.Table.from_pandas(empty, preserve_index=False), ALPHA)
    out = comp.CompositionK(list(ALPHA.letters)).apply(ctx)
    assert out.shape == (0, 3)
    # all-unknown conversation: composition all zero
    df = pd.DataFrame({"conv_id": ["x"] * 3, "turn_idx": [0, 1, 2],
                       "role": ["?", "?", "?"], "text": [""] * 3,
                       "tool": [""] * 3,
                       "ts": pd.to_datetime([0, 1, 2], unit="s").astype("datetime64[us]"),
                       "value": [1.0, 2.0, 3.0]})
    ctx = ConvContext(pa.Table.from_pandas(df, preserve_index=False), ALPHA)
    assert (comp.CompositionK(list(ALPHA.letters)).apply(ctx) == 0).all()


@st.composite
def lag_series(draw):
    """One conversation: ragged length, interior NaNs, optional huge offset
    (the |mean| >> std regime that killed the raw-moment merge), and a
    random chunk split."""
    length = draw(st.integers(2, 40))
    offset = draw(st.sampled_from([0.0, 3.0, 1.0e9]))
    vals = [
        np.nan if draw(st.booleans()) and draw(st.booleans())
        else offset + draw(st.integers(-50, 50)) / 10.0
        for _ in range(length)
    ]
    n_chunks = draw(st.integers(1, 5))
    cuts = sorted(
        draw(st.lists(st.integers(1, length - 1), min_size=n_chunks - 1,
                      max_size=n_chunks - 1))
    ) if length > 1 else []
    return vals, [0] + cuts + [length]


@settings(max_examples=60 * _HYP_SCALE, deadline=None)
@given(lag_series(), st.integers(1, 4))
def test_lag_merge_ordered_equals_apply(series, nlag):
    """Chunked protocol invariant for the order-merged lag family: counts()
    per chunk folded by merge_ordered == apply() on the whole conversation,
    for ANY chunk split, interior-NaN pattern, and value offset (incl. the
    1e9 offset where raw-moment merging cancelled catastrophically)."""
    from protein_feature_engineering_ray.functions import autocorr as ac

    vals, bounds = series

    def df_for(lo, hi):
        n = hi - lo
        return pd.DataFrame(
            {"conv_id": ["c0"] * n, "turn_idx": range(lo, hi),
             "role": ["a"] * n, "text": [""] * n, "tool": [""] * n,
             "ts": pd.to_datetime(range(lo, hi), unit="s").astype("datetime64[us]"),
             "value": vals[lo:hi]}
        )

    kernels = [
        ac.NMBroto(("col", "value"), nlag=nlag),
        ac.AutoCovariance(("col", "value"), nlag=nlag),
        ac.Moran(("col", "value"), nlag=nlag),
        ac.Geary(("col", "value"), nlag=nlag),
    ]
    full = _ctx(df_for(0, len(vals)))
    for k in kernels:
        want = k.apply(full)[0]
        rows = np.stack([
            k.counts(_ctx(df_for(bounds[i], bounds[i + 1])))[0]
            for i in range(len(bounds) - 1)
            if bounds[i + 1] > bounds[i]
        ])
        got = k.merge_ordered(rows)
        # scale-aware tolerance: at offset 1e9 the centered values carry the
        # input representation error (~1e-7 abs), amplified by ratio forms
        np.testing.assert_allclose(
            got, want, rtol=1e-6, atol=1e-6,
            err_msg=f"{type(k).__name__} nlag={nlag} bounds={bounds}",
        )


def test_lag_all_nan_conversation():
    """Regression: an all-NaN value series compacts to an EMPTY array, and
    np.bincount with empty weights returns int64 (numpy quirk) — apply()
    and counts() must still run and emit zero rows for every kernel."""
    from protein_feature_engineering_ray.functions import autocorr as ac

    df = pd.DataFrame(
        {"conv_id": ["c0", "c0"], "turn_idx": [0, 1],
         "role": ["a", "a"], "text": ["", ""], "tool": ["", ""],
         "ts": pd.to_datetime([0, 1], unit="s").astype("datetime64[us]"),
         "value": [np.nan, np.nan]}
    )
    ctx = _ctx(df)
    for k in [ac.NMBroto(("col", "value"), nlag=2),
              ac.AutoCovariance(("col", "value"), nlag=2),
              ac.Moran(("col", "value"), nlag=2),
              ac.Geary(("col", "value"), nlag=2)]:
        out = k.apply(ctx)
        assert out.shape == (1, 2) and np.all(out == 0.0)
        cnts = k.counts(ctx)
        assert cnts.shape[0] == 1
        merged = k.merge_ordered(cnts[None, 0:1][0])
        np.testing.assert_allclose(merged, out[0])
    cc = ac.CrossCovariance(("col", "value"), ("col", "value"), nlag=2)
    out = cc.apply(ctx)
    assert out.shape == (1, 2) and np.all(out == 0.0)


@settings(max_examples=60 * _HYP_SCALE, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=30),
        min_size=1, max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=5),
)
def test_winnow_segments_properties(token_docs, k, window):
    """_winnow_segments invariants on random corpora: (1) equals the pure
    per-doc reference (rolling k-gram hash -> window min -> set, with the
    short-doc min fallback); (2) batch composition — fingerprints of a doc
    do not depend on which other docs share the batch."""
    from protein_feature_engineering_ray.stages.text import _winnow_segments

    hashes = [
        pd.util.hash_array(np.asarray(d, dtype=object)).astype(np.uint64)
        if d else np.empty(0, np.uint64)
        for d in token_docs
    ]
    flat = (np.concatenate(hashes) if any(len(h) for h in hashes)
            else np.empty(0, np.uint64))
    offsets = np.concatenate([[0], np.cumsum([len(h) for h in hashes])])
    rid, fp = _winnow_segments(flat, offsets, k, window)

    B = np.uint64(1099511628211)

    def ref(h):
        if len(h) < k:
            return set()
        grams = []
        with np.errstate(over="ignore"):
            for i in range(len(h) - k + 1):
                g = np.uint64(0)
                for j in range(k):
                    g = g * B + h[i + j]
                grams.append(g)
        if window <= 1:
            return set(grams)
        if len(grams) < window:
            return {min(grams)}
        return {min(grams[i:i + window]) for i in range(len(grams) - window + 1)}

    for i, h in enumerate(hashes):
        got = set(fp[rid == i])
        assert got == ref(h), (i, k, window)

    # composition: each doc alone gives the same set
    for i, h in enumerate(hashes):
        ri, fi = _winnow_segments(
            h, np.array([0, len(h)]), k, window
        )
        assert set(fi) == set(fp[rid == i]), i


@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.sampled_from(["hello", "wörld", "", "a", "токен", "x" * 300]),
            st.text(max_size=20),
        ),
        max_size=200,
    ),
)
@settings(max_examples=60 * _HYP_SCALE, deadline=None)
def test_hash_strings_matches_boxed_pandas(vals):
    """hash_strings (dictionary-encode + distinct-only hashing) must be
    bit-identical to the boxed pd.util.hash_array path it replaced — for
    plain/large/dictionary string columns, chunked arrays, nulls, empties."""
    from protein_feature_engineering_ray.core.strhash import hash_strings

    arr = pa.array(vals, pa.string())
    ref = pd.util.hash_array(
        np.asarray(arr.to_numpy(zero_copy_only=False), dtype=object)
    ).astype(np.uint64) if len(vals) else np.empty(0, np.uint64)

    assert np.array_equal(hash_strings(arr), ref)
    assert np.array_equal(hash_strings(pa.array(vals, pa.large_string())), ref)
    if len(vals) > 1:
        mid = len(vals) // 2
        ch = pa.chunked_array([arr[:mid], arr[mid:]])
        assert np.array_equal(hash_strings(ch), ref)
    if arr.null_count == 0:
        assert np.array_equal(hash_strings(arr.dictionary_encode()), ref)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=80),
    as_str=st.booleans(),
)
@settings(max_examples=200 * _HYP_SCALE, deadline=None)
def test_local_cc_labels_matches_union_find(edges, as_str):
    """The vectorized min-label CC (pointer doubling over the edge list)
    must assign every node the MIN id of its component — checked against a
    plain union-find oracle on random multigraphs with self-loops, duplicate
    edges, both orientations, and string or int ids."""
    from protein_feature_engineering_ray.stages.dedup import local_cc_labels

    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    if as_str:
        # zero-pad so lexicographic order == numeric order
        a = np.array([f"n{v:03d}" for v in a], dtype=object)
        b = np.array([f"n{v:03d}" for v in b], dtype=object)

    nodes, lab = local_cc_labels(a, b)
    got = dict(zip(nodes, (nodes[i] for i in lab)))

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(a, b):
        parent[find(u)] = find(v)
    roots: dict = {}
    for n in parent:
        r = find(n)
        if r not in roots or n < roots[r]:
            roots[r] = n
    want = {n: roots[find(n)] for n in parent}
    assert got == want
