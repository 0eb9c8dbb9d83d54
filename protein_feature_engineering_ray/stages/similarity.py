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
import ray.data


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
    emit a (n_queries × k) partial; the driver folds each arriving partial
    into ONE running (n_queries × k) top-k state via ``iter_batches`` — a
    streaming reduce with O(nq·k) driver memory, never a concat of all
    block partials."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(Q)
    nq = len(Q)

    def partial(t: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        V = _normalize(_to_matrix(t, vec_col))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sims = Qm @ V.T  # (nq, batch)
        kk = min(k, sims.shape[1])
        # prune under the FULL (sim desc, id asc) total order. Fast path:
        # argpartition selects the top-kk SET by sim; that set is exact
        # unless a sim tie straddles the kk-boundary (then which tied id
        # survives depends on partition order, and a lower-id neighbor can
        # be dropped before the deterministic final sort sees it). Detect
        # straddles per row and re-select only those rows with an id-aware
        # sort — exact everywhere, O(batch) in the common no-tie case.
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        if kk < sims.shape[1]:
            rows_ix = np.arange(sims.shape[0])[:, None]
            bound = sims[rows_ix, top].min(axis=1)
            bad = np.flatnonzero((sims >= bound[:, None]).sum(axis=1) > kk)
            if len(bad):
                order = np.argsort(ids, kind="stable")
                id_rank = np.empty(len(ids), dtype=np.int64)
                id_rank[order] = np.arange(len(ids))
                for r in bad:
                    top[r] = np.lexsort((id_rank, -sims[r]))[:kk]
        rows = np.repeat(np.arange(sims.shape[0]), kk)
        return pa.table(
            {
                "q": pa.array(rows, pa.int64()),
                "nbr": pa.array(ids[top.reshape(-1)]),
                "sim": pa.array(sims[rows, top.reshape(-1)], pa.float64()),
            }
        )

    parts = corpus.map_batches(partial, batch_format="pyarrow")
    return _streaming_topk(parts, nq, k, query_ids)


def _streaming_topk(
    parts: "ray.data.Dataset", nq: int, k: int, query_ids: np.ndarray
) -> pd.DataFrame:
    """Fold a (q, nbr, sim) partials Dataset into per-query top-k with
    O(nq·k) driver memory: each arriving batch merges into one running
    (nq, k) state via ``iter_batches`` — a streaming reduce, never a concat
    of all block partials."""
    run_sim = np.full((nq, 0), -np.inf)
    run_nbr = np.empty((nq, 0), dtype=object)
    for b in parts.iter_batches(batch_format="pandas", batch_size=None):
        if len(b) == 0:
            continue
        # fold this partial into the running top-k (vectorized per query)
        width = int(b.groupby("q").size().max())
        nbrs = b["nbr"].to_numpy()
        sim_b = np.full((nq, width), -np.inf)
        # pad with a real id value (not None): the prune's lexsort compares
        # the id key within sim ties, and -inf pads tie with each other
        nbr_b = np.full((nq, width), nbrs[0], dtype=object)
        qi = b["q"].to_numpy()
        pos = b.groupby("q").cumcount().to_numpy()
        sim_b[qi, pos] = b["sim"].to_numpy()
        nbr_b[qi, pos] = nbrs
        run_sim = np.concatenate([run_sim, sim_b], axis=1)
        run_nbr = np.concatenate([run_nbr, nbr_b], axis=1)
        if run_sim.shape[1] > k:
            # same (sim desc, id asc) total order as the per-block prune:
            # sim-only argpartition picks the exact top-k SET unless a tie
            # straddles the boundary; re-select only those rows id-aware
            sel = np.argpartition(-run_sim, k - 1, axis=1)[:, :k]
            bound = np.take_along_axis(run_sim, sel, axis=1).min(axis=1)
            bad = np.flatnonzero((run_sim >= bound[:, None]).sum(axis=1) > k)
            for r in bad:
                sel[r] = np.lexsort((run_nbr[r], -run_sim[r]))[:k]
            run_sim = np.take_along_axis(run_sim, sel, axis=1)
            run_nbr = np.take_along_axis(run_nbr, sel, axis=1)

    out = []
    for qi in range(nq):
        valid = np.isfinite(run_sim[qi])
        # deterministic rank: similarity desc, then neighbor id asc — exact
        # ties no longer depend on block arrival order (mirrors the oracle's
        # ORDER BY c DESC, nid); nq×k driver-side values, not a hot path
        cand = run_nbr[qi][valid]
        order = np.array(
            sorted(range(len(cand)),
                   key=lambda i: (-run_sim[qi][valid][i], cand[i]))[:k],
            dtype=np.int64,
        )
        out.append(
            pd.DataFrame(
                {
                    "query_id": query_ids[qi],
                    "rank": np.arange(len(order)),
                    "nbr_id": run_nbr[qi][valid][order],
                    "cosine": run_sim[qi][valid][order],
                }
            )
        )
    # nbr ids rode in an object-padded matrix; restore their native dtype
    return pd.concat(out, ignore_index=True).infer_objects()


def knn_train_partition(
    ds: "ray.data.Dataset",
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    ks: list[int] | None = None,
    test_frac_mod: int = 5,
    max_queries: int = 4096,
) -> pd.DataFrame:
    """_KNN discipline (feature.py:3832): rows with ``id % test_frac_mod == 0``
    are 'testing' queries; neighbors come ONLY from 'training' rows.  Emits
    per-query fraction of each label among the top-k training neighbors, for
    every k in ``ks`` (the reference sweeps 30 k values, feature.py:3811-3812;
    one search at max(ks), prefixes reused).

    Bounded memory: only up to ``max_queries`` query vectors are collected
    (content-hash thinned when the test split is larger — deterministic and
    input-order-invariant); neighbor labels are joined DISTRIBUTIVELY onto
    the (nq × k) neighbor list via bucket_join, never a full driver-side
    label table."""
    from protein_feature_engineering_ray.core.joins import bucket_join

    def _split(t: pa.Table, want_test: bool) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = (ids % test_frac_mod == 0) == want_test
        return t.filter(pa.array(m))

    ks = sorted(ks or [k])
    test = ds.map_batches(lambda t: _split(t, True), batch_format="pyarrow")
    n_test = test.count()
    if n_test > max_queries:
        keep_mod = int(np.ceil(n_test / max_queries))

        def thin(t: pa.Table) -> pa.Table:
            h = pd.util.hash_array(
                np.asarray(t[id_col].to_numpy(zero_copy_only=False),
                           dtype=object)
            )
            return t.filter(pa.array(h % keep_mod == 0))

        test = test.map_batches(thin, batch_format="pyarrow")
    tdf = test.select_columns([id_col, vec_col]).to_pandas()
    if len(tdf) == 0:
        # zero query rows (e.g. empty corpus): typed empty result — a
        # column-less empty pandas frame would KeyError downstream
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64)})
    Q = np.stack(tdf[vec_col].to_numpy())
    train = ds.map_batches(lambda t: _split(t, False), batch_format="pyarrow")
    nbrs = knn_brute(train, Q, tdf[id_col].to_numpy(), k=ks[-1],
                     id_col=id_col, vec_col=vec_col)
    merged = bucket_join(
        ray.data.from_pandas(nbrs), ds.select_columns([id_col, label_col]),
        on=["nbr_id"], right_on=[id_col], how="inner", num_buckets=32,
        left_cols=list(nbrs.columns), right_cols=[id_col, label_col],
    ).to_pandas()
    if len(merged) == 0:
        # zero verified neighbors (e.g. the training split is empty): the
        # empty join result loses its columns — typed empty output
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64)})
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


def _fit_centroids(
    corpus: "ray.data.Dataset", n_centroids: int, sample_limit: int,
    seed: int, id_col: str, vec_col: str,
) -> np.ndarray:
    """Deterministic, input-order-invariant coarse centroids: bounded
    content-hash sample -> canonical sort -> seeded k-means (8 rounds),
    unit-normalized rows."""
    from protein_feature_engineering_ray.stages.reduce import bounded_sample

    samp = _normalize(
        np.stack(
            bounded_sample(corpus, sample_limit, sample_by=id_col)
            .select_columns([vec_col]).to_pandas()[vec_col].to_numpy()
        ).astype(np.float64)
    )
    samp = samp[np.lexsort(samp.T[::-1])]  # order-invariant rng picks
    rng = np.random.default_rng(seed)
    C = samp[rng.choice(len(samp), size=min(n_centroids, len(samp)),
                        replace=False)]
    for _ in range(8):
        assign = (samp @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = samp[m].mean(axis=0)
                C[c] = v / (np.linalg.norm(v) or 1.0)
    return C


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
    """IVF approximate top-k: coarse centroids from a bounded UNBIASED
    sample (content-hash thinned on ``id_col`` — deterministic and
    input-order-invariant, unlike ``limit()`` which sees only the first
    blocks of a sorted corpus), corpus rows searched only in the
    ``n_probe`` centroid cells nearest each query.

    NOTE on what this prunes: FLOPs, not bytes — every corpus block is
    still scanned to route its rows.  For the IO-side IVF (read only the
    probed cells' FILES) build a centroid-partitioned store with
    ``ivf_build`` and search it with ``ivf_search``."""
    C = _fit_centroids(corpus, n_centroids, sample_limit, seed,
                       id_col, vec_col)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    q_cells = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    c_ref = ray.put((C, Q, q_cells))
    parts = corpus.map_batches(
        _make_ivf_partial(c_ref, k, id_col, vec_col),
        batch_format="pyarrow")
    return _streaming_topk(parts, len(Q), k, query_ids)


def _make_ivf_partial(c_ref, k: int, id_col: str, vec_col: str):
    """Per-batch IVF scorer: route rows to their nearest centroid, score
    each query only against rows in its probed cells, emit per-batch
    top-k partials (folded by ``_streaming_topk``)."""

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
            cand = ids[m]
            kk = min(k, len(sims))
            # same (sim desc, id asc) total order as knn_brute's prune:
            # argpartition's top-kk SET is exact unless a sim tie straddles
            # the boundary — then re-select id-aware so the deterministic
            # final sort never loses a lower-id tied neighbor
            top = np.argpartition(-sims, kk - 1)[:kk]
            if kk < len(sims) and (sims >= sims[top].min()).sum() > kk:
                top = np.lexsort((cand, -sims))[:kk]
            rows_q.append(np.full(kk, qi, dtype=np.int64))
            rows_n.append(cand[top])
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

    return partial


def ivf_build(
    corpus: "ray.data.Dataset",
    store_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_limit: int = 4096,
    seed: int = 11,
) -> list[dict]:
    """Centroid-partitioned ANN store — the IO-side IVF.

    ``ivf_knn`` prunes FLOPs but still SCANS every corpus block to route
    rows; at 100 TB the scan IS the cost.  This builds the store once:
    fit coarse centroids (same deterministic fit as ``ivf_knn``), assign
    every row, commit ONE parquet partition per cell through the
    state/manifest machinery (atomic per-cell `_SUCCESS`, resumable —
    committed cells are skipped on rerun), centroid matrix recorded in
    the root ``_RUN.json``.  ``ivf_search`` then reads ONLY the probed
    cells' files — the same partitioned-store discipline as the corpus
    store (state/corpus.py) applied to similarity search."""
    from protein_feature_engineering_ray.state.manifest import (
        commit_bucket,
        completed_buckets,
        validate_run_layout,
        write_run_meta,
    )

    C = _fit_centroids(corpus, n_centroids, sample_limit, seed,
                       id_col, vec_col)
    validate_run_layout(store_dir, len(C), what="ivf_build")
    write_run_meta(store_dir, len(C), complete=False,
                   extra={"kind": "ivf", "centroids": C.tolist()})
    done = completed_buckets(store_dir)
    c_ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        V = _normalize(_to_matrix(t, vec_col))
        cell = (V @ Cm.T).argmax(axis=1).astype(np.int32)
        keep = ~np.isin(cell, np.asarray(sorted(done), dtype=np.int32)) \
            if done else np.ones(len(t), dtype=bool)
        return t.filter(pa.array(keep)).append_column(
            "_cell", pa.array(cell[keep], pa.int32()))

    def commit(t: pa.Table) -> pa.Table:
        cell = int(t["_cell"][0].as_py())
        table = t.drop_columns(["_cell"]).sort_by([(id_col, "ascending")])
        meta = commit_bucket(store_dir, cell, table)
        return pa.table({
            "bucket": pa.array([meta["bucket"]], pa.int64()),
            "rows": pa.array([meta["rows"]], pa.int64()),
        })

    manifest = (
        corpus.map_batches(assign, batch_format="pyarrow")
        .groupby("_cell").map_groups(commit, batch_format="pyarrow")
        .to_pandas()
    )
    write_run_meta(store_dir, len(C), complete=True,
                   extra={"kind": "ivf", "centroids": C.tolist()})
    return manifest.to_dict("records")


def ivf_probe_files(
    store_dir: str, queries: np.ndarray, n_probe: int = 4,
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """(probed parquet files, centroid matrix, per-query probed cells) for
    ``queries`` over an ``ivf_build`` store — also the byte-accounting
    hook (len(files) vs the manifest total is the read-pruning factor)."""
    import os

    from protein_feature_engineering_ray.state.manifest import (
        bucket_dir,
        fragment_files,
        read_manifest,
        read_run_meta,
    )

    meta = read_run_meta(store_dir)
    if meta is None or meta.get("kind") != "ivf":
        raise RuntimeError(
            f"{store_dir!r} is not an ivf store (no _RUN.json kind=ivf); "
            "build it with ivf_build first")
    C = np.asarray(meta["centroids"], dtype=np.float64)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    q_cells = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]
    probed = {int(c) for c in np.unique(q_cells)}
    files = []
    for m in read_manifest(store_dir):
        if m["bucket"] in probed:
            d = bucket_dir(store_dir, m["bucket"])
            files += [os.path.join(d, f) for f in fragment_files(m)]
    return files, C, q_cells


def ivf_search(
    store_dir: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Search an ``ivf_build`` store reading ONLY the probed cells' files.

    Identical results to ``ivf_knn`` with the same centroids (the scorer
    is shared; rows outside every query's probed cells were exactly the
    rows the scorer would drop), but the unprobed cells' bytes never
    leave storage."""
    files, C, q_cells = ivf_probe_files(store_dir, queries, n_probe)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    if not files:
        return _streaming_topk(
            ray.data.from_items([]), len(Q), k, query_ids)
    ds = ray.data.read_parquet(files, columns=[id_col, vec_col])
    c_ref = ray.put((C, Q, q_cells))
    parts = ds.map_batches(
        _make_ivf_partial(c_ref, k, id_col, vec_col),
        batch_format="pyarrow")
    return _streaming_topk(parts, len(Q), k, query_ids)
