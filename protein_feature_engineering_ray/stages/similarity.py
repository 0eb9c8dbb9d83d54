"""Similarity search over an embedding column (engine extension; the KNN
analogue of the reference's all-pairs similarity, feature.py:3802-3866, made
scalable).

- ``knn_brute``: exact top-k cosine per query — the query matrix is broadcast
  ONCE via ``ray.put`` and every batch does one numpy matmul against it (the
  reference's O(n²) pairwise loop, feature.py:3828-3835, becomes a blocked
  matmul that streams the corpus).
- ``knn_train_partition``: the reference's train/test discipline — queries =
  the 'testing' split, corpus = 'training' rows only; emits per-query label
  fractions among top-k (the ``_KNN`` feature, feature.py:3855-3856).
- ``ivf_knn``: scale path — k-means-style coarse centroids (fit on a driver
  sample), per-batch assignment to ``n_probe`` nearest centroid buckets, then
  exact search within buckets (the IVF/coarse-quantizer scheme of Jégou,
  Douze & Schmid, "Product quantization for nearest neighbor search",
  TPAMI 2011 — without the PQ residual codes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _to_matrix(t: pa.Table, vec_col: str) -> np.ndarray:
    """Vector column -> (n, d) float64; handles list/fixed_size_list arrays
    and Ray's tensor extension type (after pandas round-trips)."""
    raw = t[vec_col].to_numpy(zero_copy_only=False)
    return np.stack(list(raw)).astype(np.float64).reshape(len(t), -1)


def _normalize(V: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(V, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return V / n


def knn_brute(
    corpus: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact top-k cosine neighbors of each query over the corpus Dataset.

    Streaming: per corpus batch, matmul against the broadcast query matrix,
    keep a per-query running top-k (merged driver-side per batch partials —
    the partials are (n_queries × k), tiny)."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(Q)

    def partial(t: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        V = _normalize(_to_matrix(t, vec_col))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sims = Qm @ V.T  # (nq, batch)
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(sims.shape[0]), kk)
        return pa.table(
            {
                "q": pa.array(rows, pa.int64()),
                "nbr": pa.array(ids[top.reshape(-1)]),
                "sim": pa.array(sims[rows, top.reshape(-1)], pa.float64()),
            }
        )

    parts = corpus.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in parts.groupby("q"):
        g = g.nlargest(k, "sim")
        out.append(
            pd.DataFrame(
                {
                    "query_id": query_ids[qi],
                    "rank": np.arange(len(g)),
                    "nbr_id": g["nbr"].to_numpy(),
                    "cosine": g["sim"].to_numpy(),
                }
            )
        )
    return pd.concat(out, ignore_index=True)


def knn_train_partition(
    ds: "ray.data.Dataset",
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    ks: list[int] | None = None,
    test_frac_mod: int = 5,
) -> pd.DataFrame:
    """_KNN discipline (feature.py:3832): rows with ``id % test_frac_mod == 0``
    are 'testing' queries; neighbors come ONLY from 'training' rows.  Emits
    per-query fraction of each label among the top-k training neighbors, for
    every k in ``ks`` (the reference sweeps 30 k values, feature.py:3811-3812;
    one search at max(ks), prefixes reused)."""
    def _split(t: pa.Table, want_test: bool) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = (ids % test_frac_mod == 0) == want_test
        return t.filter(pa.array(m))

    ks = sorted(ks or [k])
    tdf = ds.map_batches(
        lambda t: _split(t, True), batch_format="pyarrow"
    ).to_pandas()
    Q = np.stack(tdf[vec_col].to_numpy())
    train = ds.map_batches(lambda t: _split(t, False), batch_format="pyarrow")
    nbrs = knn_brute(train, Q, tdf[id_col].to_numpy(), k=ks[-1],
                     id_col=id_col, vec_col=vec_col)
    lab = ds.select_columns([id_col, label_col]).to_pandas()
    merged = nbrs.merge(lab, left_on="nbr_id", right_on=id_col)
    out = None
    for kk in ks:
        sub = merged[merged["rank"] < kk]
        frac = (
            sub.groupby(["query_id", label_col]).size().unstack(fill_value=0)
        )
        frac = frac.div(frac.sum(axis=1), axis=0)
        suffix = f"_k{kk}" if len(ks) > 1 else ""
        frac.columns = [f"knn_label_{c}{suffix}" for c in frac.columns]
        out = frac if out is None else out.join(frac, how="outer")
    return out.reset_index()


def ivf_knn(
    corpus: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_limit: int = 4096,
    seed: int = 11,
) -> pd.DataFrame:
    """IVF approximate top-k: coarse centroids from a driver-side sample
    (Lloyd iterations on <= sample_limit rows), corpus rows searched only in
    the ``n_probe`` centroid cells nearest each query."""
    samp = _normalize(
        np.stack(
            corpus.limit(sample_limit).to_pandas()[vec_col].to_numpy()
        ).astype(np.float64)
    )
    rng = np.random.default_rng(seed)
    C = samp[rng.choice(len(samp), size=min(n_centroids, len(samp)), replace=False)]
    for _ in range(8):
        assign = (samp @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = samp[m].mean(axis=0)
                C[c] = v / (np.linalg.norm(v) or 1.0)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    q_cells = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    c_ref = ray.put((C, Q, q_cells))

    def partial(t: pa.Table) -> pa.Table:
        Cm, Qm, qc = ray.get(c_ref)
        V = _normalize(_to_matrix(t, vec_col))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cell = (V @ Cm.T).argmax(axis=1)
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(len(Qm)):
            m = np.isin(cell, qc[qi])
            if not m.any():
                continue
            sims = V[m] @ Qm[qi]
            kk = min(k, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            rows_q.append(np.full(kk, qi, dtype=np.int64))
            rows_n.append(ids[m][top])
            rows_s.append(sims[top])
        if not rows_q:
            return pa.table(
                {"q": pa.array([], pa.int64()), "nbr": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "q": pa.array(np.concatenate(rows_q), pa.int64()),
                "nbr": pa.array(np.concatenate(rows_n)),
                "sim": pa.array(np.concatenate(rows_s), pa.float64()),
            }
        )

    parts = corpus.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in parts.groupby("q"):
        g = g.nlargest(k, "sim")
        out.append(
            pd.DataFrame(
                {
                    "query_id": query_ids[qi],
                    "rank": np.arange(len(g)),
                    "nbr_id": g["nbr"].to_numpy(),
                    "cosine": g["sim"].to_numpy(),
                }
            )
        )
    return pd.concat(out, ignore_index=True)
