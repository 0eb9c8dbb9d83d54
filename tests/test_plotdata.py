"""Plot-data sink tests (stages/plotdata.py — the iPlot analogue,
feature.py:5155-5622): each aggregate is checked against a direct
numpy/pandas computation on the same rows, plus partition-invariance
(the distributed partial+combine must not depend on block boundaries)."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data

from protein_feature_engineering_ray.stages.plotdata import (
    corr_pairs,
    grouped_mean,
    histogram_counts,
    quantile_summary,
    scatter_sample,
)

RNG = np.random.default_rng(1234)
N = 500


@pytest.fixture(scope="module")
def frame():
    return pd.DataFrame({
        "conv_id": [f"c{i % 37}" for i in range(N)],
        "x": RNG.normal(10.0, 3.0, N),
        "k": RNG.integers(0, 9, N).astype(np.int64),
        "a": RNG.integers(0, 50, N).astype(np.int64),
        "b": RNG.integers(0, 50, N).astype(np.int64),
        "role": RNG.choice(["user", "assistant", "tool"], N),
    })


def _ds(pdf, blocks):
    return ray.data.from_pandas(
        [pdf.iloc[i::blocks].reset_index(drop=True) for i in range(blocks)]
    )


@pytest.mark.parametrize("blocks", [1, 7])
def test_histogram_counts(frame, blocks):
    got = histogram_counts(_ds(frame, blocks), "x", nbins=16)
    lo, hi = frame["x"].min(), frame["x"].max()
    bins = np.minimum(
        np.floor((frame["x"].to_numpy() - lo) * 16 / (hi - lo)), 15
    ).astype(np.int64)
    want = np.bincount(bins, minlength=16).astype(np.float64)
    assert got["value"].sum() == N
    np.testing.assert_array_equal(got["value"].to_numpy(), want)
    np.testing.assert_array_equal(got["idx"].to_numpy(), np.arange(16))


def test_histogram_constant_column():
    pdf = pd.DataFrame({"x": np.full(40, 7.0)})
    got = histogram_counts(_ds(pdf, 3), "x", nbins=8)
    assert got["value"][0] == 40 and got["value"][1:].sum() == 0


@pytest.mark.parametrize("blocks", [1, 7])
def test_quantile_summary(frame, blocks):
    got = quantile_summary(_ds(frame, blocks), "k")
    x = np.sort(frame["k"].to_numpy())
    for i, q in enumerate((0.0, 0.25, 0.5, 0.75, 1.0)):
        rank = max(1, math.ceil(q * N))
        assert got["value"][i] == float(x[rank - 1]), q


@pytest.mark.parametrize("blocks", [1, 7])
def test_corr_pairs(frame, blocks):
    got = corr_pairs(_ds(frame, blocks), ["a", "b", "k"])
    m = np.corrcoef(frame[["a", "b", "k"]].to_numpy().T)
    assert len(got) == 6  # upper triangle incl. diagonal, no zero-variance col
    for _, row in got.iterrows():
        i, j = row["idx"] // 3, row["idx"] % 3
        assert abs(row["value"] - m[i, j]) < 1e-12, (row["name_a"], row["name_b"])
    # block-partitioning must not change a single bit
    again = corr_pairs(_ds(frame, 3), ["a", "b", "k"])
    np.testing.assert_array_equal(got["value"].to_numpy(), again["value"].to_numpy())


def test_corr_pairs_drops_zero_variance(frame):
    pdf = frame.assign(z=np.int64(5))
    got = corr_pairs(_ds(pdf, 4), ["a", "z"])
    assert set(got["name_a"] + "|" + got["name_b"]) == {"a|a"}


@pytest.mark.parametrize("blocks", [1, 7])
def test_grouped_mean(frame, blocks):
    keys = ["assistant", "tool", "user"]
    got = grouped_mean(_ds(frame, blocks), "role", "x", keys, scale=100)
    for i, key in enumerate(keys):
        q = np.floor(frame.loc[frame["role"] == key, "x"].to_numpy() * 100)
        want = q.sum() / len(q)
        assert got["value"][i] == want, key
    assert list(got["name"]) == keys


def test_grouped_mean_unknown_keys_ignored(frame):
    got = grouped_mean(_ds(frame, 3), "role", "x", ["user", "nosuch"], scale=100)
    assert np.isnan(got["value"][1])


def test_null_values_excluded(frame):
    """Nulls never reach an int cast: the histogram skips them, the
    quantile distribution drops them, and grouped_mean follows SQL avg
    (null excluded from sum AND count)."""
    pdf = frame.head(60).copy()
    pdf.loc[::5, "x"] = np.nan
    pdf["k"] = pdf["k"].astype("Int64")
    pdf.loc[::7, "k"] = pd.NA
    valid_x = pdf["x"].dropna().to_numpy()
    got_h = histogram_counts(_ds(pdf, 4), "x", nbins=8)
    assert got_h["value"].sum() == len(valid_x)

    got_q = quantile_summary(_ds(pdf, 4), "k")
    x = np.sort(pdf["k"].dropna().to_numpy().astype(np.int64))
    assert got_q["value"][4] == float(x[-1])
    assert got_q["value"][0] == float(x[0])

    keys = ["assistant", "tool", "user"]
    got_m = grouped_mean(_ds(pdf, 4), "role", "x", keys, scale=100)
    for i, key in enumerate(keys):
        sel = pdf.loc[(pdf["role"] == key) & pdf["x"].notna(), "x"].to_numpy()
        want = np.floor(sel * 100).sum() / len(sel) if len(sel) else np.nan
        assert (np.isnan(want) and np.isnan(got_m["value"][i])) or (
            got_m["value"][i] == want
        ), key


def test_scatter_sample_partition_invariant(frame):
    a = scatter_sample(_ds(frame, 2), ["x", "k"], cap=100).to_pandas()
    b = scatter_sample(_ds(frame, 9), ["x", "k"], cap=100).to_pandas()
    key = ["conv_id", "x", "k"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    assert 0 < len(a) <= N


def test_plot_data_line_null_and_absent_role_matches_sql(tmp_path):
    """The 'line' oracle arm must agree with grouped_mean on BOTH
    divergence hazards: null values (engine excludes them from sum AND
    count — SQL must use count(value), not count(*)) and a role absent
    from the corpus (engine emits a NaN row for every key — SQL must
    left-join a VALUES key table, not GROUP BY what exists)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from protein_feature_engineering_ray.pipelines import queries as Q

    n = 60
    rng = np.random.default_rng(11)
    roles = rng.choice(
        [r for r in Q.LETTERS if r != "signup"], size=n
    )  # 'signup' absent
    # REAL Arrow nulls (not NaN doubles): DuckDB treats NaN as an ordinary
    # out-of-range value but excludes NULL from sum/count(value), which is
    # the semantics grouped_mean mirrors
    null_mask = rng.random(n) < 0.25
    value = pa.array(
        [None if m else float(v)
         for m, v in zip(null_mask, rng.uniform(-5, 150, size=n))],
        pa.float64(),
    )
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(
            pd.to_datetime(np.arange(n), unit="s").astype("datetime64[us]")),
        "user_id": pa.array(np.arange(n) % 7, pa.int64()),
        "event_type": pa.array(roles),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(["p"] * n),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    got = Q.q_plot_data(str(tmp_path))
    got = got[got["kind"] == "line"].sort_values("idx").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    import __ray_entry__ as e

    sql = e.oracle_sql()["plot_data"]
    want = con.execute(sql).df()
    want = want[want["kind"] == "line"].sort_values("idx").reset_index(drop=True)
    assert len(got) == len(want) == len(Q.LETTERS)
    assert list(got["name"]) == list(want["name"])
    np.testing.assert_allclose(
        got["value"].to_numpy(float), want["value"].to_numpy(float),
        rtol=0, atol=0, equal_nan=True,
    )
    si = list(got["name"]).index("signup")
    assert np.isnan(got["value"].iloc[si])


def test_corr_pairs_overflow_guard():
    # a block whose product-sum would exceed int64 must fail LOUDLY (silent
    # numpy wraparound would corrupt the correlation); amax^2 * rows >= 2^62
    big = np.full(4, 2**31, dtype=np.int64)
    pdf = pd.DataFrame({"a": big, "b": big})
    # Ray surfaces worker exceptions wrapped (RayTaskError), so match on the
    # message rather than the type
    with pytest.raises(Exception, match="corr_pairs block product-sum"):
        corr_pairs(ray.data.from_pandas(pdf), ["a", "b"])
    # just-under-the-guard values still work
    ok = pd.DataFrame({"a": np.array([3, 1, 4, 1], dtype=np.int64),
                       "b": np.array([2, 7, 1, 8], dtype=np.int64)})
    out = corr_pairs(ray.data.from_pandas(ok), ["a", "b"])
    assert len(out) == 3
