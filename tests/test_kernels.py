"""Oracle-equivalence tests (SURVEY.md §5.1): every kernel family vs the
single-node pandas/numpy oracle on the seeded synthetic corpus."""

import numpy as np
import pandas as pd
import pytest

from protein_feature_engineering_ray.core.executor import conv_features, turn_features
from protein_feature_engineering_ray.functions import autocorr as ac
from protein_feature_engineering_ray.functions.registry import make_kernel
from protein_feature_engineering_ray.schema import Alphabet
from protein_feature_engineering_ray.sources import synth_transcripts

from tests import oracle

ALPHA = Alphabet(
    letters=("assistant", "system", "tool", "user"),
    groups={"bot": ("assistant", "system", "tool"), "hum": ("user",)},
)
N_CONVS = 24


@pytest.fixture(scope="module")
def corpus():
    ds = synth_transcripts(n_convs=N_CONVS, duplicates=False)
    pdf = synth_transcripts(n_convs=N_CONVS, duplicates=False, as_pandas=True)
    return ds, pdf


def _compare(got: pd.DataFrame, want: pd.DataFrame, keys=("conv_id",)):
    keys = list(keys)
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want)
    feature_cols = [c for c in want.columns if c not in keys and c != "ts"]
    assert set(feature_cols) <= set(got.columns), set(feature_cols) - set(got.columns)
    for c in feature_cols:
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=float),
            want[c].to_numpy(dtype=float),
            rtol=1e-9,
            atol=1e-12,
            err_msg=c,
        )


def run_conv(corpus, name, params=None):
    ds, _ = corpus
    _, k = make_kernel(name, ALPHA, params)
    return conv_features(ds, [k], alphabet=ALPHA, num_buckets=7).to_pandas()


def run_turn(corpus, name, params=None):
    ds, _ = corpus
    _, k = make_kernel(name, ALPHA, params)
    return turn_features(ds, [k], alphabet=ALPHA, num_buckets=7).to_pandas()


def test_aac(corpus):
    _compare(run_conv(corpus, "AAC"), oracle.composition(corpus[1], ALPHA))


def test_gaac(corpus):
    _compare(run_conv(corpus, "GAAC"), oracle.composition(corpus[1], ALPHA, grouped=True))


def test_dpc(corpus):
    _compare(run_conv(corpus, "DPC"), oracle.ngram(corpus[1], ALPHA, n=2))


def test_tpc(corpus):
    _compare(run_conv(corpus, "TPC"), oracle.ngram(corpus[1], ALPHA, n=3))


def test_gdpc_gtpc(corpus):
    _compare(run_conv(corpus, "GDPC"), oracle.ngram(corpus[1], ALPHA, n=2, grouped=True))
    _compare(run_conv(corpus, "GTPC"), oracle.ngram(corpus[1], ALPHA, n=3, grouped=True))


def test_dde(corpus):
    _compare(run_conv(corpus, "DDE"), oracle.dde(corpus[1], ALPHA))


def test_cksaap(corpus):
    _compare(run_conv(corpus, "CKSAAP", {"kspace": 2}),
             oracle.kspaced(corpus[1], ALPHA, kspace=2))


def test_cksaagp(corpus):
    _compare(run_conv(corpus, "CKSAAGP", {"kspace": 2}),
             oracle.kspaced(corpus[1], ALPHA, kspace=2, grouped=True))


def test_asdc(corpus):
    _compare(run_conv(corpus, "ASDC", {"max_skip": 64}),
             oracle.asdc(corpus[1], ALPHA, max_skip=64))


def test_ctdc(corpus):
    want = oracle.composition(corpus[1], ALPHA, grouped=True, prefix="ctdc")
    _compare(run_conv(corpus, "CTDC"), want)


def test_ctdt(corpus):
    _compare(run_conv(corpus, "CTDT"), oracle.ctdt(corpus[1], ALPHA))


def test_ctdd(corpus):
    _compare(run_conv(corpus, "CTDD"), oracle.ctdd(corpus[1], ALPHA))


def test_ctriad(corpus):
    _compare(run_conv(corpus, "CTriad"), oracle.triad(corpus[1], ALPHA, kspace=0))


def test_ksctriad(corpus):
    _compare(run_conv(corpus, "KSCTriad", {"kspace": 2}),
             oracle.triad(corpus[1], ALPHA, kspace=2))


def test_stride_ktuple(corpus):
    _compare(run_conv(corpus, "StrideKTuple", {"k": 2, "gap": 1}),
             oracle.stride_ktuple(corpus[1], ALPHA, k=2, gap=1))
    _compare(run_conv(corpus, "StrideKTuple", {"k": 3, "gap": 2}),
             oracle.stride_ktuple(corpus[1], ALPHA, k=3, gap=2))


def test_lambda_ktuple(corpus):
    _compare(run_conv(corpus, "LambdaKTuple", {"k": 2, "lam": 3}),
             oracle.lambda_ktuple(corpus[1], ALPHA, k=2, lam=3))
    _compare(run_conv(corpus, "LambdaKTuple", {"k": 3, "lam": 2}),
             oracle.lambda_ktuple(corpus[1], ALPHA, k=3, lam=2))


PROPS = np.array([[0.5, -1.0], [1.5, 0.25], [-0.75, 2.0], [0.0, -0.5]])


def _latency_series_df(pdf):
    # attach latency_sec as a column for the ("col", ...) series specs
    lat = oracle.latency(pdf)
    return pdf.merge(lat, on=["conv_id", "turn_idx"])


def test_nmbroto_prop_series(corpus):
    spec = ("prop", ac.znorm_table(PROPS)[:, 0])
    got = run_conv(corpus, "NMBroto", {"series": spec, "nlag": 3})
    _compare(got, oracle.nmbroto(corpus[1], ALPHA, spec, nlag=3))


def test_ac_latency_series(corpus):
    pdf = _latency_series_df(corpus[1])
    spec = ("col", "latency_sec")
    ds, _ = corpus
    import ray.data

    ds2 = ray.data.from_pandas(pdf)
    _, k = make_kernel("AC", ALPHA, {"series": spec, "nlag": 3})
    got = conv_features(ds2, [k], alphabet=ALPHA, num_buckets=5).to_pandas()
    _compare(got, oracle.autocov(pdf, ALPHA, spec, nlag=3))


def test_moran_geary(corpus):
    spec = ("prop", ac.znorm_table(PROPS)[:, 1])
    _compare(run_conv(corpus, "Moran", {"series": spec, "nlag": 3}),
             oracle.moran(corpus[1], ALPHA, spec, nlag=3))
    _compare(run_conv(corpus, "Geary", {"series": spec, "nlag": 3}),
             oracle.geary(corpus[1], ALPHA, spec, nlag=3))


DIST = np.array(
    [[0.0, 0.3, 0.7, 0.2],
     [0.3, 0.0, 0.5, 0.6],
     [0.7, 0.5, 0.0, 0.4],
     [0.2, 0.6, 0.4, 0.0]]
)


def test_socnumber(corpus):
    _compare(run_conv(corpus, "SOCNumber", {"dist_table": DIST, "nlag": 3}),
             oracle.socnumber(corpus[1], ALPHA, DIST, nlag=3))


def test_qsorder(corpus):
    _compare(run_conv(corpus, "QSOrder", {"dist_table": DIST, "nlag": 3}),
             oracle.qsorder(corpus[1], ALPHA, DIST, nlag=3))


def test_paac_apaac(corpus):
    _compare(run_conv(corpus, "PAAC", {"prop_table": PROPS, "lam": 3}),
             oracle.paac(corpus[1], ALPHA, PROPS, lam=3))
    _compare(run_conv(corpus, "APAAC", {"prop_table": PROPS, "lam": 3}),
             oracle.apaac(corpus[1], ALPHA, PROPS, lam=3))


def test_crosscov(corpus):
    from protein_feature_engineering_ray.functions import autocorr as acm

    spec_a = ("prop", acm.znorm_table(PROPS)[:, 0])
    spec_b = ("prop", acm.znorm_table(PROPS)[:, 1])
    got = run_conv(corpus, "CC", {"series_a": spec_a, "series_b": spec_b, "nlag": 3})
    _compare(got, oracle.crosscov(corpus[1], ALPHA, spec_a, spec_b, nlag=3))


def test_acc(corpus):
    from protein_feature_engineering_ray.functions import autocorr as acm

    spec_a = ("prop", acm.znorm_table(PROPS)[:, 0])
    spec_b = ("prop", acm.znorm_table(PROPS)[:, 1])
    got = run_conv(corpus, "ACC", {"series_a": spec_a, "series_b": spec_b, "nlag": 2})
    want_ac = oracle.autocov(corpus[1], ALPHA, spec_a, nlag=2)
    want_ac.columns = [c.replace("ac_", "acc_ac_") for c in want_ac.columns]
    want_cc = oracle.crosscov(corpus[1], ALPHA, spec_a, spec_b, nlag=2)
    want_cc.columns = [c.replace("cc_", "acc_cc_") for c in want_cc.columns]
    _compare(got, want_ac)
    _compare(got, want_cc)


def test_latency(corpus):
    _compare(run_turn(corpus, "Latency"), oracle.latency(corpus[1]),
             keys=("conv_id", "turn_idx"))


def test_rolling_composition(corpus):
    _compare(run_turn(corpus, "RollingComposition", {"w": 4}),
             oracle.rolling_composition(corpus[1], ALPHA, w=4),
             keys=("conv_id", "turn_idx"))


def test_expanding_composition(corpus):
    # expanding == rolling with window >= max conv length
    big = corpus[1].groupby("conv_id").size().max()
    want = oracle.rolling_composition(corpus[1], ALPHA, w=int(big))
    want.columns = [c.replace(f"eaac{big}", "cumaac") for c in want.columns]
    _compare(run_turn(corpus, "ExpandingComposition"), want,
             keys=("conv_id", "turn_idx"))


def test_rolling_stats_latency(corpus):
    pdf = _latency_series_df(corpus[1])
    import ray.data

    ds2 = ray.data.from_pandas(pdf)
    _, k = make_kernel("RollingStats", ALPHA, {"col": "latency_sec", "w": 3})
    got = turn_features(ds2, [k], alphabet=ALPHA, num_buckets=5).to_pandas()
    _compare(got, oracle.rolling_stats(pdf, "latency_sec", w=3),
             keys=("conv_id", "turn_idx"))


def test_lag_lead(corpus):
    pdf = _latency_series_df(corpus[1])
    import ray.data

    ds2 = ray.data.from_pandas(pdf)
    _, k = make_kernel("LagLead", ALPHA, {"col": "latency_sec", "offsets": (1, 3)})
    got = turn_features(ds2, [k], alphabet=ALPHA, num_buckets=5).to_pandas()
    _compare(got, oracle.lag_lead(pdf, "latency_sec", offsets=(1, 3)),
             keys=("conv_id", "turn_idx"))
    _, k2 = make_kernel("LagLead", ALPHA, {"col": "latency_sec", "offsets": (2,), "lead": True})
    got2 = turn_features(ds2, [k2], alphabet=ALPHA, num_buckets=5).to_pandas()
    _compare(got2, oracle.lag_lead(pdf, "latency_sec", offsets=(2,), lead=True),
             keys=("conv_id", "turn_idx"))


def test_onehot(corpus):
    got = run_turn(corpus, "OneHot")
    pdf = oracle.per_turn_base(corpus[1])
    for i, s in enumerate(ALPHA.letters):
        want = (pdf["role"] == s).astype(float).to_numpy()
        g = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        np.testing.assert_array_equal(g[f"onehot_{s}"].to_numpy(), want)


def test_multiple_kernels_one_pass(corpus):
    """N kernels share one shuffle and stay column-aligned."""
    ds, pdf = corpus
    ks = [make_kernel(n, ALPHA)[1] for n in ("AAC", "GAAC", "DPC", "CTDT")]
    got = conv_features(ds, ks, alphabet=ALPHA, num_buckets=7).to_pandas()
    _compare(got, oracle.composition(pdf, ALPHA))
    _compare(got, oracle.ctdt(pdf, ALPHA))


def test_conv_graph_descriptor_hand_computed():
    """Role-transition interaction graph vs a hand-built example."""
    import pyarrow as pa

    from protein_feature_engineering_ray.core.context import ConvContext
    from protein_feature_engineering_ray.functions.graph import ConvGraph
    from protein_feature_engineering_ray.schema import Alphabet

    alpha = Alphabet(letters=("a", "b", "c"), groups={"all": ("a", "b", "c")})
    # conv1: a->b, b->a, b->c  => edges {ab, ba, bc}; undirected {ab, bc}
    # conv2: single turn        => empty graph
    df = pd.DataFrame({
        "conv_id": ["c1"] * 4 + ["c2"],
        "turn_idx": [0, 1, 2, 3, 0],
        "role": ["a", "b", "a", "b", "a"],
        "text": [""] * 5, "tool": [""] * 5,
        "ts": pd.to_datetime([0, 1, 2, 3, 4], unit="s").astype("datetime64[us]"),
    })
    # adjust conv1 roles so pairs are a->b, b->a, a->b -> edges {ab, ba}
    out = ConvGraph(list(alpha.letters)).apply(
        ConvContext(pa.Table.from_pandas(df, preserve_index=False), alpha)
    )
    names = ConvGraph(list(alpha.letters)).names()
    row1 = dict(zip(names, out[0]))
    # conv1 directed edges: {a->b, b->a} = 2 of 6 possible
    assert row1["graph_density"] == 2 / 6
    assert row1["graph_reciprocity"] == 1.0  # the one unordered pair is reciprocated
    assert row1["graphdeg_a"] == 1 / 2 and row1["graphdeg_b"] == 1 / 2
    assert row1["graphdeg_c"] == 0.0
    assert row1["graph_clustering"] == 0.0  # no triangles possible
    row2 = dict(zip(names, out[1]))
    assert all(row2[n] == 0.0 for n in names)


def test_conv_graph_triangle():
    import pyarrow as pa

    from protein_feature_engineering_ray.core.context import ConvContext
    from protein_feature_engineering_ray.functions.graph import ConvGraph
    from protein_feature_engineering_ray.schema import Alphabet

    alpha = Alphabet(letters=("a", "b", "c"), groups={"all": ("a", "b", "c")})
    # path a b c a: edges ab, bc, ca -> undirected triangle
    df = pd.DataFrame({
        "conv_id": ["t"] * 4, "turn_idx": range(4),
        "role": ["a", "b", "c", "a"],
        "text": [""] * 4, "tool": [""] * 4,
        "ts": pd.to_datetime(range(4), unit="s").astype("datetime64[us]"),
    })
    out = ConvGraph(list(alpha.letters)).apply(
        ConvContext(pa.Table.from_pandas(df, preserve_index=False), alpha)
    )
    row = dict(zip(ConvGraph(list(alpha.letters)).names(), out[0]))
    assert row["graph_density"] == 3 / 6
    assert row["graph_reciprocity"] == 0.0
    assert row["graph_clustering"] == 1.0  # every node closes the triangle


def test_time_window_stats_matches_pandas_reference():
    """TimeWindowStats (RANGE-window analogue): count bit-equal and
    sum/mean allclose vs a per-row pandas reference incl. ts ties and NaN
    values; whole-conversation-only (rejected by the chunked executor)."""
    import ray.data

    from protein_feature_engineering_ray.core.executor import turn_features_chunked

    pdf = synth_transcripts(n_convs=8, duplicates=False, as_pandas=True)
    rng = np.random.default_rng(3)
    val = rng.normal(size=len(pdf))
    val[rng.random(len(pdf)) < 0.1] = np.nan
    pdf["value"] = val
    # inject ts ties inside conversations to exercise peer inclusion
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    dup = pdf.groupby("conv_id").cumcount() == 3
    prev = pdf["ts"].shift(1)
    pdf.loc[dup, "ts"] = prev[dup]
    ds = ray.data.from_pandas(pdf).repartition(3)
    W = 60.0
    got = (
        turn_features(
            ds, [make_kernel("TimeWindowStats", ALPHA,
                             {"col": "value", "seconds": W})[1]],
            alphabet=ALPHA, num_buckets=3,
        )
        .to_pandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ts_us = want["ts"].astype("datetime64[us]").astype("int64")
    for conv in want["conv_id"].unique():
        sel = np.flatnonzero((want["conv_id"] == conv).to_numpy())
        t = ts_us.to_numpy()[sel]
        v = want["value"].to_numpy()[sel]
        for j, row in enumerate(sel):
            m = (t >= t[j] - int(W * 1e6)) & (t <= t[j])
            window = v[m]
            window = window[~np.isnan(window)]
            assert got.loc[row, "tw60_value_count"] == len(window)
            if len(window):
                np.testing.assert_allclose(
                    got.loc[row, "tw60_value_sum"], window.sum(), rtol=1e-9
                )
            else:
                assert np.isnan(got.loc[row, "tw60_value_sum"])

    with pytest.raises(ValueError, match="unbounded lookback"):
        turn_features_chunked(
            ds, [make_kernel("TimeWindowStats", ALPHA, {"col": "value"})[1]],
            alphabet=ALPHA, chunk_size=8,
        )


def test_time_window_stats_wide_history_no_overflow():
    """Regression: the old composite key was seg_idx × (corpus-wide ts
    range) — two conversations hundreds of millennia apart (rel ~9e18 us)
    overflowed int64 for seg 1, silently unsorting the key array.  The
    per-segment cumulative-base key is bounded by the SUM of conversation
    durations; answers must match a direct per-row window."""
    import pyarrow as pa

    from protein_feature_engineering_ray.core.context import ConvContext
    from protein_feature_engineering_ray.functions.positional import (
        TimeWindowStats,
    )

    far = np.datetime64("287396-01-01T00:00:00", "us")  # near datetime64 max
    rows = []
    for cid, t0 in (("a", np.datetime64("1970-01-02T00:00:00", "us")),
                    ("b", far)):
        for j in range(6):
            rows.append({"conv_id": cid, "turn_idx": j, "role": "x",
                         "text": "", "tool": "",
                         "ts": t0 + np.timedelta64(j * 30, "s"),
                         "value": float(j)})
    df = pd.DataFrame(rows)
    ctx = ConvContext(pa.Table.from_pandas(df, preserve_index=False), ALPHA)
    out = TimeWindowStats("value", seconds=60.0).apply(ctx)
    # window = self + up to 2 predecessors at 30s spacing, per conversation
    want_cnt = [1, 2, 3, 3, 3, 3] * 2
    np.testing.assert_array_equal(out[:, 0], want_cnt)
    want_sum = [0, 1, 3, 6, 9, 12] * 2
    np.testing.assert_allclose(out[:, 1], want_sum)


def test_time_window_stats_per_segment_fallback_path(monkeypatch):
    """Force the loud per-segment fallback (summed durations past the 2^62
    guard are unreachable with real timestamps, so shrink the guard) and
    pin it to the vectorized path's output — ties, NaNs and all."""
    import pyarrow as pa

    from protein_feature_engineering_ray.core.context import ConvContext
    from protein_feature_engineering_ray.functions.positional import (
        TimeWindowStats,
    )

    pdf = pd.DataFrame({
        "conv_id": ["a"] * 5 + ["b"] * 4,
        "turn_idx": list(range(5)) + list(range(4)),
        "role": ["x"] * 9, "text": [""] * 9, "tool": [""] * 9,
        "ts": pd.to_datetime(
            [0, 10, 70, 70, 200, 5, 50, 66, 300], unit="s"
        ).astype("datetime64[us]"),
        "value": [1.0, 2, np.nan, 4, 5, 1, 1, 1, 1],
    })
    ctx = ConvContext(pa.Table.from_pandas(pdf, preserve_index=False), ALPHA)
    k = TimeWindowStats("value", seconds=60.0)
    fast = k.apply(ctx)
    monkeypatch.setattr(TimeWindowStats, "_KEYSPACE_LIMIT", 0)
    ctx2 = ConvContext(pa.Table.from_pandas(pdf, preserve_index=False), ALPHA)
    slow = TimeWindowStats("value", seconds=60.0).apply(ctx2)
    np.testing.assert_array_equal(
        np.nan_to_num(fast, nan=-1), np.nan_to_num(slow, nan=-1)
    )
