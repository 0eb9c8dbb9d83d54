"""Dimensionality reduction + clustering scoring (``iAnalysis`` analogues,
feature.py:4769-4983) in the Ray-idiomatic split: FIT on a driver-side sample
(the matrices are tiny relative to the corpus — exactly how the reference's
notebooks PCA their stacked embeddings, ESM_embed.ipynb cell 5), TRANSFORM /
ASSIGN distributed via broadcast ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _sample_matrix(ds, cols: list[str] | None, vec_col: str | None, limit: int):
    df = ds.limit(limit).to_pandas()
    if vec_col is not None:
        X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
    else:
        X = df[cols].to_numpy(dtype=np.float64)
    return X


def pca_fit(ds, cols: list[str] | None = None, vec_col: str | None = None,
            k: int = 2, sample_limit: int = 10000) -> dict:
    """Driver-side PCA fit (numpy SVD on a bounded sample): returns the
    broadcastable model {mean, components}."""
    X = _sample_matrix(ds, cols, vec_col, sample_limit)
    mean = X.mean(axis=0)
    Xc = X - mean
    _u, _s, vt = np.linalg.svd(Xc, full_matrices=False)
    # sign convention: largest-|.| element of each component positive
    comps = vt[:k]
    signs = np.sign(comps[np.arange(len(comps)),
                          np.abs(comps).argmax(axis=1)])
    comps = comps * signs[:, None]
    return {"mean": mean, "components": comps}


def pca_transform(ds, model: dict, cols: list[str] | None = None,
                  vec_col: str | None = None, out_prefix: str = "pc") -> "ray.data.Dataset":
    ref = ray.put(model)

    def fn(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        if vec_col is not None:
            raw = t[vec_col].to_numpy(zero_copy_only=False)
            X = np.stack(list(raw)).astype(np.float64)
        else:
            X = np.column_stack(
                [t[c].to_numpy(zero_copy_only=False) for c in cols]
            ).astype(np.float64)
        Y = (X - m["mean"]) @ m["components"].T
        for j in range(Y.shape[1]):
            t = t.append_column(f"{out_prefix}{j}", pa.array(Y[:, j]))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def kmeans_fit(ds, cols: list[str] | None = None, vec_col: str | None = None,
               k: int = 8, iters: int = 20, sample_limit: int = 10000,
               seed: int = 17) -> np.ndarray:
    """Driver-side Lloyd iterations on a bounded sample -> centroids."""
    X = _sample_matrix(ds, cols, vec_col, sample_limit)
    # deterministic farthest-point init (robust to the local optima random
    # init hits on well-separated clusters)
    k_eff = min(k, len(X))
    idx = [0]
    d2 = ((X - X[0]) ** 2).sum(axis=1)
    for _ in range(1, k_eff):
        nxt = int(d2.argmax())
        idx.append(nxt)
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
    C = X[idx].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(len(C)):
            m = a == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    return C


def kmeans_assign(ds, centroids: np.ndarray, cols: list[str] | None = None,
                  vec_col: str | None = None,
                  out_col: str = "cluster") -> "ray.data.Dataset":
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(t: pa.Table) -> pa.Table:
        C = ray.get(ref)
        if vec_col is not None:
            raw = t[vec_col].to_numpy(zero_copy_only=False)
            X = np.stack(list(raw)).astype(np.float64)
        else:
            X = np.column_stack(
                [t[c].to_numpy(zero_copy_only=False) for c in cols]
            ).astype(np.float64)
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return t.append_column(out_col, pa.array(d.argmin(axis=1).astype(np.int32)))

    return ds.map_batches(fn, batch_format="pyarrow")
