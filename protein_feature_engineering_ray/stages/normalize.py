"""Global normalization stages (``iAnalysis.ZScore``/``MinMax``,
feature.py:5041-5082) — the reference's whole-matrix operations as two-pass
streaming aggregate + broadcast apply (SURVEY.md §2.6).

Pass 1 streams partial (count, mean, centered M2, min, max, nan-count) per
column through ``map_batches`` (one tiny row per block) and combines on the
driver with Chan's parallel-variance update — centered moments, because the
raw ``E[x²]-mean²`` form cancels catastrophically when |mean| >> std and can
even go negative.  Pass 2 broadcasts the scalar stats and applies the
transform per batch.  At cluster scale the broadcast is a plain closure
(a few floats per column), shipped once per task by Ray.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _column_stats(ds: ray.data.Dataset, cols: list[str]) -> dict[str, dict[str, float]]:
    def partial(t: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            x = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            ok = ~np.isnan(x)
            v = x[ok]
            m = float(v.mean()) if len(v) else 0.0
            out[f"{c}__n"] = [float(len(v))]
            out[f"{c}__nan"] = [float(len(x) - len(v))]
            out[f"{c}__m"] = [m]
            # centered second moment (see module docstring)
            out[f"{c}__m2"] = [float(((v - m) ** 2).sum()) if len(v) else 0.0]
            out[f"{c}__mn"] = [float(v.min()) if len(v) else np.inf]
            out[f"{c}__mx"] = [float(v.max()) if len(v) else -np.inf]
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        # empty input produces zero partial rows (and a column-less frame):
        # degenerate stats keep the transform a well-defined no-op
        return {c: {"n": 0.0, "mean": 0.0, "std": 0.0,
                    "min": np.inf, "max": -np.inf} for c in cols}
    stats = {}
    for c in cols:
        # Chan et al. pairwise combine, folded left-to-right over blocks
        n = 0.0
        mean = 0.0
        m2 = 0.0
        for nb, mb, m2b in zip(parts[f"{c}__n"], parts[f"{c}__m"],
                               parts[f"{c}__m2"]):
            if nb == 0:
                continue
            if n == 0:
                n, mean, m2 = nb, mb, m2b
                continue
            delta = mb - mean
            tot = n + nb
            mean += delta * nb / tot
            m2 += m2b + delta * delta * n * nb / tot
            n = tot
        var = m2 / n if n else 0.0
        stats[c] = {
            "n": n,
            "mean": mean,
            "std": float(np.sqrt(var)),
            "min": float(parts[f"{c}__mn"].min()),
            "max": float(parts[f"{c}__mx"].max()),
        }
    return stats


def zscore(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Global per-column z-normalize; zero-variance columns -> 0
    (feature.py:5044-5050)."""
    stats = _column_stats(ds, cols)

    def apply(t: pa.Table) -> pa.Table:
        for c in cols:
            x = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            st = stats[c]
            z = (x - st["mean"]) / st["std"] if st["std"] > 0 else np.zeros_like(x)
            t = t.set_column(t.column_names.index(c), c, pa.array(z))
        return t

    return ds.map_batches(apply, batch_format="pyarrow")


def minmax(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Global per-column min-max scale; NaN -> column mean after scaling
    (feature.py:5059-5082)."""
    stats = _column_stats(ds, cols)

    def apply(t: pa.Table) -> pa.Table:
        for c in cols:
            x = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            st = stats[c]
            rng = st["max"] - st["min"]
            y = (x - st["min"]) / rng if rng > 0 else np.zeros_like(x)
            if st["n"]:
                scaled_mean = (
                    (st["mean"] - st["min"]) / rng if rng > 0 else 0.0
                )
                y = np.where(np.isnan(y), scaled_mean, y)
            t = t.set_column(t.column_names.index(c), c, pa.array(y))
        return t

    return ds.map_batches(apply, batch_format="pyarrow")
