"""Plot-DATA sinks — the ``iPlot`` analogue (feature.py:5155-5622) with the
rendering stripped out: every reference plot is backed by a small data product
(bin counts, five-number summaries, a correlation matrix, per-category means,
a bounded scatter sample), and THOSE are what a distributed engine should
compute.  Each function here streams the full dataset through a partial+final
aggregate (one tiny row per block, then a bin-keyed combine or a driver-side
fold over per-block partials) and returns a small pandas frame ready to plot
or persist — no full materialization, no sampling shortcuts (the reference
downsamples hist input to 32,000 cells, feature.py:5192-5195; we aggregate
everything).

Reference mapping:

- ``histogram_counts``   <- ``iPlot.hist`` / KDE input (feature.py:5189)
- ``quantile_summary``   <- ``iPlot.boxplot`` (feature.py:5335)
- ``corr_pairs``         <- correlation heatmap (5251) + circular corr plots
                            (5428, 5510)
- ``grouped_mean``       <- line plot of feature means (feature.py:5306)
- ``scatter_sample``     <- scatter (5569) / ``ClusteringScatterPlot`` (4991)

Oracle-parity discipline (same as pipelines/queries.py): histogram bins are a
fixed three-op IEEE expression over exact min/max, quantiles use an integer
cumulative-count rank rule, means and correlations are computed from EXACT
integer sums (values pre-quantized where needed) with one fixed float
expression at the end — so a DuckDB oracle reproduces every output bit.

Scale notes: histogram partials are ``nbins`` rows per block; quantile
summaries assume a cardinality-bounded integer column (conversation lengths,
latency buckets — use ``histogram_counts`` for unbounded continuous columns);
``corr_pairs`` ships one ``K + K^2 + 1``-wide row per block and combines with
arbitrary-precision Python ints on the driver, so no overflow at any scale.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Min


def histogram_counts(
    ds: ray.data.Dataset, col: str, nbins: int = 32,
    lo: float | None = None, hi: float | None = None,
) -> pd.DataFrame:
    """Exact full-data histogram of ``col`` (``iPlot.hist``, feature.py:5189).

    Two streaming passes: global min/max aggregate, then per-block
    ``np.bincount`` partials combined by a tiny bin-keyed groupby.  The bin
    rule is the fixed expression ``min(floor((x-lo)*nbins/(hi-lo)), nbins-1)``
    so any engine evaluating the same three IEEE ops lands every value in the
    same bin.  Returns ``(idx, value)`` with zero bins present.
    """
    def _zero_hist() -> pd.DataFrame:
        return pd.DataFrame({
            "idx": np.arange(nbins, dtype=np.int64),
            "value": np.zeros(nbins, dtype=np.float64),
        })

    if lo is None or hi is None:
        agg = ds.aggregate(Min(col), Max(col))
        mn = agg[f"min({col})"] if agg else None
        mx = agg[f"max({col})"] if agg else None
        if mn is None or mx is None:  # empty / all-null column
            return _zero_hist()
        lo = float(mn) if lo is None else lo
        hi = float(mx) if hi is None else hi

    def partial(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]  # nulls/NaNs are not counted in any bin
        if hi == lo:
            b = np.zeros(len(x), dtype=np.int64)
        else:
            # clamp BOTH sides: with caller-supplied lo/hi, out-of-range
            # values land in the edge bins (symmetric with the top clamp)
            # instead of producing negative bincount indices
            b = np.clip(
                np.floor((x - lo) * nbins / (hi - lo)), 0, nbins - 1
            ).astype(np.int64)
        cnt = np.bincount(b, minlength=nbins).astype(np.int64)
        return pa.table({f"b{i}": [cnt[i]] for i in range(nbins)})

    # one nbins-wide row per block, combined by Ray's global sum aggregate —
    # no shuffle, no driver-side partial materialization
    sums = ds.map_batches(partial, batch_format="pyarrow").sum(
        [f"b{i}" for i in range(nbins)]
    )
    if sums is None:  # zero blocks reached the aggregate
        return _zero_hist()
    return pd.DataFrame({
        "idx": np.arange(nbins, dtype=np.int64),
        "value": np.array([sums[f"sum(b{i})"] for i in range(nbins)],
                          dtype=np.float64),
    })


def quantile_summary(
    ds: ray.data.Dataset, col: str,
    qs: tuple[float, ...] = (0.0, 0.25, 0.5, 0.75, 1.0),
) -> pd.DataFrame:
    """Exact five-number summary of an integer column (``iPlot.boxplot``,
    feature.py:5335) via a value-histogram: per-block ``np.unique`` partials,
    bin-keyed combine, then the cumulative rank rule — quantile q = smallest
    value whose cumulative count reaches ``max(1, ceil(q*n))``.  Exact at any
    scale for cardinality-bounded integer columns (conversation lengths,
    bucketed latencies); integer in, integer-valued double out.
    """

    def partial(t: pa.Table) -> pa.Table:
        # drop_null BEFORE the int cast: a null -> NaN -> int64 cast is
        # undefined (INT_MIN garbage values entering the distribution)
        x = t[col].drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        v, c = np.unique(x, return_counts=True)
        return pa.table({"v": v, "c": c.astype(np.int64)})

    dist = ds.map_batches(partial, batch_format="pyarrow").groupby("v") \
        .sum("c").to_pandas()
    if len(dist) == 0:  # empty input: column-less frame from zero blocks
        dist = pd.DataFrame({"v": pd.Series([], dtype=np.int64),
                             "sum(c)": pd.Series([], dtype=np.int64)})
    dist = dist.sort_values("v").reset_index(drop=True)
    cum = dist["sum(c)"].cumsum().to_numpy()
    vals = dist["v"].to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for i, q in enumerate(qs):
        rank = max(1, math.ceil(q * n))
        out.append((i, float(vals[np.searchsorted(cum, rank)]) if n else np.nan))
    return pd.DataFrame({
        "idx": np.array([i for i, _ in out], dtype=np.int64),
        "value": np.array([v for _, v in out], dtype=np.float64),
    })


def corr_pairs(ds: ray.data.Dataset, cols: list[str]) -> pd.DataFrame:
    """Pearson correlation matrix over INTEGER feature columns (the heatmap /
    circular-corr-plot data, feature.py:5251, 5428) from exact integer sums.

    One streaming pass: per block emit ``n``, ``sum(x_i)`` and the K x K
    product-sum matrix (int64, exact); the driver folds the per-block rows
    with Python ints (arbitrary precision — no overflow at 100 TB), then one
    fixed float expression per pair::

        corr = (n*p_ij - s_i*s_j) / (sqrt(n*p_ii - s_i^2) * sqrt(n*p_jj - s_j^2))

    with the numerator/variance terms computed exactly as integers and cast
    to double once — bit-reproducible by any engine with exact integer sums
    (DuckDB hugeint).  Pairs with a zero-variance side are omitted.  Returns
    the upper triangle incl. the diagonal as ``(name_a, name_b, idx, value)``
    with ``idx = i*K + j``.
    """
    k = len(cols)

    def partial(t: pa.Table) -> pa.Table:
        x = np.stack(
            [t[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in cols],
            axis=1,
        )
        # numpy int64 overflow is SILENT: a block mixing huge per-conv counts
        # with many rows could wrap x.T @ x before the arbitrary-precision
        # driver fold ever sees it.  |sum products| <= amax^2 * rows, so fail
        # loudly while there is still headroom (shrink batch_size to fix).
        if len(x):
            amax = int(np.abs(x).max())
            if amax and amax * amax * len(x) >= (1 << 62):
                raise OverflowError(
                    f"corr_pairs block product-sum may overflow int64 "
                    f"(max |value| {amax}, rows {len(x)}); reduce the "
                    f"map_batches batch_size so amax^2 * rows < 2^62"
                )
        p = x.T @ x  # int64-exact within the guard above
        row: dict[str, list] = {"n": [np.int64(len(x))]}
        for i in range(k):
            row[f"s{i}"] = [x[:, i].sum()]
        for i in range(k):
            for j in range(i, k):
                row[f"p{i}_{j}"] = [p[i, j]]
        return pa.table(row)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:  # empty input: every pair is zero-variance-omitted
        return pd.DataFrame({
            "name_a": pd.Series([], dtype=object),
            "name_b": pd.Series([], dtype=object),
            "idx": pd.Series([], dtype=np.int64),
            "value": pd.Series([], dtype=np.float64),
        })
    n = sum(int(v) for v in parts["n"])
    s = [sum(int(v) for v in parts[f"s{i}"]) for i in range(k)]
    p = {
        (i, j): sum(int(v) for v in parts[f"p{i}_{j}"])
        for i in range(k) for j in range(i, k)
    }
    var = [n * p[(i, i)] - s[i] * s[i] for i in range(k)]
    rows = []
    for i in range(k):
        for j in range(i, k):
            if var[i] <= 0 or var[j] <= 0:
                continue
            num = n * p[(i, j)] - s[i] * s[j]
            val = float(num) / (math.sqrt(float(var[i])) * math.sqrt(float(var[j])))
            rows.append((cols[i], cols[j], i * k + j, val))
    return pd.DataFrame(rows, columns=["name_a", "name_b", "idx", "value"]).astype(
        {"idx": np.int64, "value": np.float64}
    )


def grouped_mean(
    ds: ray.data.Dataset, key_col: str, val_col: str, keys: list[str],
    scale: int = 100,
) -> pd.DataFrame:
    """Per-category mean of a numeric column (line-plot data,
    feature.py:5306), quantized to ``floor(x*scale)`` integer units so the sum
    is exact and the mean is one float division — bit-reproducible.  Keys not
    in ``keys`` are ignored (and ``keys`` fixes the output order).
    """
    import pyarrow.compute as pc

    kidx = len(keys)

    def partial(t: pa.Table) -> pa.Table:
        # pc.index_in yields null for misses (-> NaN through to_numpy)
        codes = pc.index_in(t[key_col], value_set=pa.array(keys)).to_numpy(
            zero_copy_only=False
        )
        codes = np.nan_to_num(codes.astype(np.float64), nan=-1).astype(np.int64)
        x = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # null values are excluded from both sum and count (SQL avg
        # semantics); NaN would otherwise turn into an undefined int cast
        ok = (codes >= 0) & ~np.isnan(x)
        q = np.floor(np.nan_to_num(x) * scale).astype(np.int64)
        sums = np.zeros(kidx, dtype=np.int64)
        cnts = np.zeros(kidx, dtype=np.int64)
        np.add.at(sums, codes[ok], q[ok])
        np.add.at(cnts, codes[ok], 1)
        return pa.table({
            "idx": np.arange(kidx, dtype=np.int64), "s": sums, "c": cnts,
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:  # empty input: zero partial rows, column-less frame
        parts = pd.DataFrame({"idx": pd.Series([], dtype=np.int64),
                              "s": pd.Series([], dtype=np.int64),
                              "c": pd.Series([], dtype=np.int64)})
    rows = []
    for i, key in enumerate(keys):
        sel = parts[parts["idx"] == i]
        s = sum(int(v) for v in sel["s"])
        c = sum(int(v) for v in sel["c"])
        rows.append((key, i, float(s) / c if c else np.nan))
    return pd.DataFrame(rows, columns=["name", "idx", "value"]).astype(
        {"idx": np.int64, "value": np.float64}
    )


def scatter_sample(
    ds: ray.data.Dataset, cols: list[str], cap: int = 32000,
    sample_by: str = "conv_id",
) -> ray.data.Dataset:
    """Bounded deterministic scatter input (feature.py:5569, 4991): content-
    hash thinning via ``bounded_sample`` — the same points come back no matter
    how the corpus is partitioned or ordered, unlike the reference's implicit
    first-N."""
    from protein_feature_engineering_ray.stages.reduce import bounded_sample

    return bounded_sample(
        ds.select_columns([sample_by, *cols]), cap, sample_by=sample_by
    )
