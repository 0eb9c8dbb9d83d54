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


def bounded_sample(ds, limit: int, sample_by: str | None = None,
                   seed: int = 17) -> "ray.data.Dataset":
    """UNBIASED bounded fit sample — never ``limit()``, which takes the
    first blocks and biases every fit on sorted/clustered input.

    With ``sample_by``: content-hash thinning on that column — deterministic
    AND invariant to input order/partitioning (the same rows are sampled no
    matter how the corpus is laid out); expected size ~= limit (binomial,
    uncapped so the invariance holds).  Without: seeded ``random_sample``
    capped at ``limit``."""
    n = ds.count()
    if n <= limit:
        return ds
    if sample_by is not None:
        keep_mod = int(np.ceil(n / limit))

        def thin(t: pa.Table) -> pa.Table:
            h = pd.util.hash_array(
                np.asarray(t[sample_by].to_numpy(zero_copy_only=False),
                           dtype=object)
            )
            return t.filter(pa.array(h % np.uint64(keep_mod) == 0))

        return ds.map_batches(thin, batch_format="pyarrow")
    return ds.random_sample(min(1.0, 1.2 * limit / n), seed=seed).limit(limit)


def _rank_hash(ids: pa.Array | pa.ChunkedArray, hash_fn: str) -> np.ndarray:
    """Deterministic per-id rank hash for quota sampling.  ``"fast"`` =
    pd.util.hash_array over the decimal-string form (scale path);
    ``"md5"`` = lower 64 bits of md5 of the same string, bit-identical to
    DuckDB ``md5_number_lower(CAST(id AS VARCHAR))`` — the oracle bridge
    (same two-mode contract as stages/dedup.simhash64)."""
    import pyarrow.compute as pc

    from protein_feature_engineering_ray.stages.dedup import _md5_lower64

    sv = pc.cast(ids, pa.string()).to_numpy(zero_copy_only=False)
    sv = np.asarray(sv, dtype=object)
    if hash_fn == "md5":
        return _md5_lower64(sv)
    return pd.util.hash_array(sv).astype(np.uint64)


def _key_codes(t: pa.Table, key_col: str) -> tuple[np.ndarray, list]:
    """Dictionary-encode a key column -> (int64 codes, dictionary values).
    Null keys form ONE group with the sentinel code len(dictionary) (SQL
    PARTITION BY semantics); without the fill, null indices surface as NaN
    from to_numpy and every null row would become its own run start."""
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(t[key_col].combine_chunks())
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dic = enc.dictionary.to_pylist()
    codes = np.asarray(
        pc.fill_null(enc.indices.cast(pa.int64()), len(dic)).to_numpy(
            zero_copy_only=False))
    return codes, dic


def _per_key_topk(t: pa.Table, key_col: str, id_col: str, k: int,
                  hash_fn: str) -> pa.Table:
    """Keep the <=k rows per key with the smallest (rank_hash(id), id) —
    one dictionary encode + one lexsort, no Python per-key loop."""
    if t.num_rows == 0:
        return t
    codes, _ = _key_codes(t, key_col)
    h = _rank_hash(t[id_col], hash_fn)
    idv = t[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((idv, h, codes))
    cs = codes[order]
    starts = np.empty(len(cs), dtype=bool)
    starts[0] = True
    starts[1:] = cs[1:] != cs[:-1]
    run_start = np.maximum.accumulate(np.where(starts, np.arange(len(cs)), 0))
    pos = np.arange(len(cs)) - run_start
    return t.take(pa.array(np.sort(order[pos < k])))


def rate_threshold(rate: float) -> int:
    """A sampling rate in [0, 1] -> the uint64 keep threshold
    (``rank_hash(id) < threshold`` keeps ~``rate`` of ids).  Computed once
    here so the engine and a SQL oracle compare against the SAME integer
    literal — never recompute ``rate * 2**64`` on both sides and hope the
    float rounding agrees."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return min(int(rate * 2.0**64), 2**64 - 1)


def rate_sample(
    ds: ray.data.Dataset,
    rates: dict,
    key_col: str,
    id_col: str = "doc_id",
    default: float = 0.0,
    hash_fn: str = "fast",
) -> ray.data.Dataset:
    """Deterministic per-key RATE sampling — the weighted data-mixing
    primitive ``quota_sample`` (absolute top-k) cannot express: keep each
    row iff ``rank_hash(id) < rate(key) * 2^64``, i.e. an
    order/partition-invariant Bernoulli(rate) decided purely by the row's
    id.  ``rates`` maps key value -> rate in [0, 1]; unmapped keys (and
    null keys) use ``default``.

    NO exchange at all: this is a stateless ``map_batches`` filter — the
    (small) rates table rides the task closure once per task like any
    broadcast lookup, so at 100 TB the stage costs exactly one streaming
    pass.  ``hash_fn="md5"`` makes the keep set bit-identical to a DuckDB
    ``md5_number_lower(CAST(id AS VARCHAR)) < <rate_threshold(rate)>``
    oracle (inject ``rate_threshold``'s integer, never a recomputed
    float product; a rate of EXACTLY 1.0 is keep-all — mirror it as a
    literal TRUE, not a threshold compare).  A row kept at rate r stays
    kept at every rate >= r (nested samples — the standard
    reproducible-subsample property)."""
    assert hash_fn in ("fast", "md5"), hash_fn
    thr = {k: np.uint64(rate_threshold(v)) for k, v in rates.items()}
    dthr = np.uint64(rate_threshold(default))
    # rate 1.0 means keep-all, which `h < threshold` cannot express in
    # uint64 (an all-ones hash would be dropped); resolve it per key
    def _full(rate: float) -> bool:
        return rate == 1.0

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        codes, dic = _key_codes(t, key_col)
        lut = np.array([thr.get(v, dthr) for v in dic] + [dthr],
                       dtype=np.uint64)
        isfull = np.array(
            [_full(rates.get(v, default)) for v in dic] + [_full(default)],
            dtype=bool)
        h = _rank_hash(t[id_col], hash_fn)
        return t.filter(pa.array((h < lut[codes]) | isfull[codes]))

    return ds.map_batches(keep, batch_format="pyarrow")


def quota_sample(
    ds: ray.data.Dataset,
    key_col: str,
    k: int,
    id_col: str = "doc_id",
    num_buckets: int = 32,
    hash_fn: str = "fast",
) -> ray.data.Dataset:
    """Deterministic stratified quota sampling — keep the ``k`` rows per
    ``key_col`` value with the smallest ``(rank_hash(id), id)``.  The
    data-mixing primitive (per-source / per-language quotas) the reference
    hand-rolls with pandas slicing in its notebooks.

    Invariant to input order AND partitioning: the rank is a pure function
    of the row's id, so the winner set never depends on block layout.
    Two-phase top-k keeps the exchange small at 100 TB: a per-block
    COMBINER first prunes to <=k rows per key per block (the shuffle then
    moves at most k rows per (key, block) instead of the full corpus),
    then one coarse key-hash bucket exchange and a final per-key top-k
    inside each bucket group.  ``hash_fn="md5"`` makes the winner set
    bit-identical to a DuckDB ``row_number() OVER (PARTITION BY key ORDER
    BY md5_number_lower(CAST(id AS VARCHAR)), id)`` oracle."""
    assert hash_fn in ("fast", "md5"), hash_fn
    from protein_feature_engineering_ray.core.bucket import grouped_buckets

    partial = ds.map_batches(
        lambda t: _per_key_topk(t, key_col, id_col, k, hash_fn),
        batch_format="pyarrow",
    )
    return grouped_buckets(
        partial,
        lambda t: _per_key_topk(t, key_col, id_col, k, hash_fn),
        num_buckets=num_buckets, key=key_col, order_cols=(key_col, id_col),
    )


def _sample_matrix(ds, cols: list[str] | None, vec_col: str | None,
                   limit: int, sample_by: str | None = None):
    df = bounded_sample(ds, limit, sample_by).to_pandas()
    if len(df) == 0:
        # empty corpus: a zero-row Ray dataset collects to a COLUMN-LESS
        # frame, so the column access below would KeyError
        return np.zeros((0, 1))
    if vec_col is not None:
        X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
    else:
        X = df[cols].to_numpy(dtype=np.float64)
    # canonical row order: downstream fits (argmax ties, rng picks) become
    # independent of block arrival order
    return X[np.lexsort(X.T[::-1])] if len(X) else X


def _farthest_point_init(X: np.ndarray, k_eff: int) -> np.ndarray:
    """Deterministic farthest-point seeding (robust to the local optima a
    random init hits on well-separated clusters), anchored on the sample's
    lexicographically-extreme point so the seeds do not depend on row order
    within the sample.  Shared by every clusterer fit here."""
    start = int(np.lexsort(X.T[::-1])[0])
    idx = [start]
    d2 = ((X - X[start]) ** 2).sum(axis=1)
    for _ in range(1, k_eff):
        nxt = int(d2.argmax())
        idx.append(nxt)
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
    return X[idx].copy()


def pca_fit(ds, cols: list[str] | None = None, vec_col: str | None = None,
            k: int = 2, sample_limit: int = 10000,
            sample_by: str | None = None) -> dict:
    """Driver-side PCA fit (numpy SVD on a bounded sample): returns the
    broadcastable model {mean, components}."""
    X = _sample_matrix(ds, cols, vec_col, sample_limit, sample_by)
    mean = X.mean(axis=0)
    Xc = X - mean
    _u, _s, vt = np.linalg.svd(Xc, full_matrices=False)
    # sign convention: largest-|.| element of each component positive
    comps = vt[:k]
    signs = np.sign(comps[np.arange(len(comps)),
                          np.abs(comps).argmax(axis=1)])
    comps = comps * signs[:, None]
    if len(comps) < k:
        # rank-deficient sample (fewer rows than k): pad with zero
        # components so the transform always emits exactly k columns
        comps = np.vstack(
            [comps, np.zeros((k - len(comps), X.shape[1]))]
        )
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
               seed: int = 17, sample_by: str | None = None) -> np.ndarray:
    """Driver-side Lloyd iterations on a bounded sample -> centroids."""
    X = _sample_matrix(ds, cols, vec_col, sample_limit, sample_by)
    k_eff = min(k, len(X))
    if len(X) == 0:
        return np.empty((0, 0))
    C = _farthest_point_init(X, k_eff)
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


def mcl_fit(ds, cols: list[str] | None = None, vec_col: str | None = None,
            sample_limit: int = 2000, sample_by: str | None = None,
            expand_factor: int = 2, inflate_factor: float = 2.0,
            mult_factor: float = 2.0, max_loop: int = 200) -> np.ndarray:
    """Markov-cluster attractor clustering (MCL, van Dongen, "Graph
    Clustering by Flow Simulation", 2000) — the ``MarkvCluster`` analogue
    (feature.py:5083-5154: correlation similarity with negatives zeroed and
    no self-correlation, ``mult_factor`` self-loops, column-normalized flow
    matrix iterated through inflation+expansion until idempotent, clusters
    read off attractor rows), in the engine's fit/assign split: MCL runs on
    a bounded UNBIASED sample (content-hash thinned, order-invariant), and
    the returned cluster-mean centroids feed the distributed
    ``kmeans_assign`` pass over the full corpus."""
    X = _sample_matrix(ds, cols, vec_col, sample_limit, sample_by)
    n = len(X)
    if n == 0:
        return np.empty((0, 0))
    if n == 1:
        return X.copy()
    with np.errstate(invalid="ignore"):
        S = np.corrcoef(X)
    S = np.nan_to_num(S, nan=0.0)
    S[S < 0] = 0.0
    np.fill_diagonal(S, 0.0)
    M = S + mult_factor * np.eye(n)

    def _colnorm(A):
        s = A.sum(axis=0, keepdims=True)
        s[s == 0] = 1.0
        return A / s

    M = _colnorm(M)
    for _ in range(max_loop):
        prev = M
        M = _colnorm(np.power(M, inflate_factor))
        M = np.linalg.matrix_power(M, expand_factor)
        if np.allclose(M, prev, atol=1e-12):
            break
    eps = 1e-9
    # attractor rows own their clusters; every sample joins its first owner
    label = np.full(n, -1, dtype=np.int64)
    k = 0
    for i in range(n):
        if M[i, i] > eps:
            members = np.flatnonzero((M[i] > eps) & (label < 0))
            if len(members):
                label[members] = k
                k += 1
    if (label < 0).any():  # orphans (no attractor row claims them)
        label[label < 0] = k
        k += 1
    cents = np.stack([X[label == c].mean(axis=0) for c in range(k)])
    return cents


def lda_fit(ds, label_col: str, cols: list[str] | None = None,
            vec_col: str | None = None, k: int = 2,
            sample_limit: int = 10000, sample_by: str | None = None,
            reg: float = 1e-6) -> dict:
    """Supervised linear discriminant projection (Fisher LDA) — the
    reference's labeled-DR step (feature.py:4967-4981; NOTE the upstream
    actually instantiates sklearn's LatentDirichletAllocation, a topic
    model that ignores the labels it is handed — we take the intent to be
    LinearDiscriminantAnalysis, the standard labeled companion to its
    PCA/t-SNE).  Fit: class scatter matrices on a bounded unbiased sample,
    top-k eigenvectors of (Sw + reg·I)^-1 Sb; returns the same broadcast
    {mean, components} model shape as ``pca_fit`` so ``pca_transform``
    projects the full corpus distributed."""
    df = bounded_sample(ds, sample_limit, sample_by).to_pandas()
    if vec_col is not None:
        X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
    else:
        X = df[cols].to_numpy(dtype=np.float64)
    y = df[label_col].to_numpy()
    # canonical order for order-invariant eig tie-breaks
    order = np.lexsort(X.T[::-1])
    X, y = X[order], y[order]
    mean = X.mean(axis=0)
    d = X.shape[1]
    Sw = np.zeros((d, d))
    Sb = np.zeros((d, d))
    for c in np.unique(y):
        Xc = X[y == c]
        mc = Xc.mean(axis=0)
        Z = Xc - mc
        Sw += Z.T @ Z
        dm = (mc - mean)[:, None]
        Sb += len(Xc) * (dm @ dm.T)
    evals, evecs = np.linalg.eig(
        np.linalg.solve(Sw + reg * np.eye(d), Sb)
    )
    evals, evecs = evals.real, evecs.real
    top = np.argsort(-evals)[:k]
    comps = evecs[:, top].T
    # degenerate scatter (single class / single row): zero eigenvectors
    # would divide 0/0 into NaN columns — keep them zero instead
    comps = comps / np.maximum(
        np.linalg.norm(comps, axis=1, keepdims=True), 1e-30
    )
    signs = np.sign(comps[np.arange(len(comps)),
                          np.abs(comps).argmax(axis=1)])
    return {"mean": mean, "components": comps * signs[:, None]}


# ---------------------------------------------------------------------------
# density clustering (DBSCAN analogue over the embedding column)
# ---------------------------------------------------------------------------


def exact_threshold_edges(
    ds, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.5, max_broadcast_rows: int = 200_000,
):
    """All pairs (id_a < id_b) with cosine >= threshold, EXACTLY — the
    quadratic validation baseline of ``density_cluster`` (the scale path is
    the banded-LSH edge source, ``stages.dedup.embedding_neardup``).

    The normalized matrix is broadcast ONCE via ``ray.put`` and each batch
    does one blocked matmul against it: O(n²) total work distributed over
    the batches, O(n·d) broadcast bytes.  Refuses corpora above
    ``max_broadcast_rows`` loudly instead of silently exhausting workers."""
    n = ds.count()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }))
    if n > max_broadcast_rows:
        raise ValueError(
            f"exact_threshold_edges is the O(n²) validation baseline; corpus "
            f"has {n} rows > max_broadcast_rows={max_broadcast_rows}. Use "
            "embedding_neardup (banded LSH) as the edge source at scale."
        )
    ref_df = ds.select_columns([id_col, vec_col]).to_pandas()
    all_ids = ref_df[id_col].to_numpy()
    V = np.stack(ref_df[vec_col].to_numpy()).astype(np.float64)
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
    ref = ray.put((all_ids, V))

    def edges(t: pa.Table) -> pa.Table:
        ids_b = t[id_col].to_numpy(zero_copy_only=False)
        B = np.stack(list(t[vec_col].to_numpy(zero_copy_only=False))).astype(
            np.float64
        )
        B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-30)
        ids_all, Vm = ray.get(ref)
        sim = B @ Vm.T  # (batch, n)
        bi, aj = np.nonzero(sim >= threshold)
        a = ids_b[bi]
        b = ids_all[aj]
        keep = a < b  # each unordered pair once, no self-pairs
        return pa.table(
            {
                "id_a": pa.array(a[keep]),
                "id_b": pa.array(b[keep]),
                "cosine": pa.array(sim[bi[keep], aj[keep]], pa.float64()),
            }
        )

    return ds.map_batches(edges, batch_format="pyarrow")


def component_labels(
    ds, edges, id_col: str = "vec_id", out_col: str = "cluster",
    num_buckets: int = 64, cc_local_threshold: int = 2_000_000,
):
    """(id, cluster) for EVERY row of ``ds``: cluster = min id of the row's
    connected component in ``edges``; edge-less rows label themselves (the
    DBSCAN(minPts=2) noise convention — singletons are their own cluster).
    Same edge-count gate as drop_component_dups: driver union-find while the
    edge list is provably small, distributed min-label propagation beyond."""
    from protein_feature_engineering_ray.core.joins import bucket_join

    edges = edges.select_columns(["id_a", "id_b"]).materialize()
    n_edges = edges.count()
    ids_only = ds.select_columns([id_col])
    if n_edges == 0:
        def self_label(t: pa.Table) -> pa.Table:
            return pa.table({id_col: t[id_col], out_col: t[id_col]})

        return ids_only.map_batches(self_label, batch_format="pyarrow")

    if n_edges <= cc_local_threshold:
        from protein_feature_engineering_ray.stages.dedup import local_cc_labels

        epdf = edges.to_pandas()
        # vectorized min-label CC (shared with drop_component_dups): root of
        # every endpoint = min id of its component, same `<` as the per-edge
        # union-find it replaced
        nodes, lab = local_cc_labels(
            epdf["id_a"].to_numpy(), epdf["id_b"].to_numpy())
        root = dict(zip(nodes, nodes[lab]))
        root_ref = ray.put(root)

        def assign(t: pa.Table) -> pa.Table:
            r = ray.get(root_ref)
            ids = pd.Series(t[id_col].to_numpy(zero_copy_only=False))
            lab = ids.map(r)  # vectorized hash lookup, no per-row Python
            lab = lab.where(lab.notna(), ids).astype(ids.dtype)
            return pa.table(
                {id_col: t[id_col], out_col: pa.array(lab.to_numpy())}
            )

        return ids_only.map_batches(assign, batch_format="pyarrow")

    from protein_feature_engineering_ray.stages.dedup import connected_components

    labels = connected_components(edges, num_buckets)
    joined = bucket_join(
        ids_only, labels, on=[id_col], right_on=["node"], how="left_outer",
        num_buckets=num_buckets, left_cols=[id_col],
        right_cols=["node", "label"],
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lab = pc.if_else(pc.is_null(t["label"]), t[id_col], t["label"])
        return pa.table(
            {id_col: t[id_col], out_col: pc.cast(lab, t[id_col].type)}
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def density_cluster(
    ds, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.5, method: str = "exact",
    num_buckets: int = 64, cc_local_threshold: int = 2_000_000,
    **edge_kwargs,
):
    """DBSCAN-style density clustering over an embedding column — the
    clusterer an LLM-data pipeline actually reaches for (the density member
    of the reference's clusterer zoo, feature.py:4869-4887): eps-threshold
    cosine neighbor graph -> connected components.  With minPts=2 this IS
    DBSCAN: every point with >= 1 neighbor is core, clusters are the
    components of the eps-graph, degree-0 points are noise (labeled as their
    own singleton cluster here, keeping the output total).

    ``method="exact"`` uses the quadratic broadcast edge baseline (bounded,
    for validation); ``method="lsh"`` uses banded hyperplane LSH
    (``embedding_neardup``) — near-linear, the 100 TB path, with the
    documented recall ~ 1-(1-p^n)^reps per edge."""
    if method == "exact":
        edges = exact_threshold_edges(
            ds, id_col, vec_col, threshold, **edge_kwargs
        )
    elif method == "lsh":
        from protein_feature_engineering_ray.stages.dedup import embedding_neardup

        edges = embedding_neardup(
            ds, id_col, vec_col, threshold, **edge_kwargs
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return component_labels(
        ds, edges, id_col, num_buckets=num_buckets,
        cc_local_threshold=cc_local_threshold,
    )


# ---------------------------------------------------------------------------
# clusterer zoo: Gaussian mixture (EM) + agglomerative, same fit/assign split
# ---------------------------------------------------------------------------


def gmm_fit(ds, cols: list[str] | None = None, vec_col: str | None = None,
            k: int = 8, iters: int = 50, sample_limit: int = 10000,
            sample_by: str | None = None, reg: float = 1e-6,
            tol: float = 1e-8) -> dict:
    """Diagonal-covariance Gaussian mixture fit by EM on a bounded unbiased
    sample — the ``GaussianM`` member of the reference clusterer zoo
    (feature.py:4798-4812) in pure numpy (no sklearn in this environment).
    Deterministic: k-means++-style farthest-point init from the sample's
    canonical (lexicographic) order, like ``kmeans_fit``.  Returns the
    broadcastable model {weights, means, vars}; assignment over the corpus
    is ``gmm_assign`` (distributed map_batches)."""
    X = _sample_matrix(ds, cols, vec_col, sample_limit, sample_by)
    n, d = X.shape if X.ndim == 2 else (len(X), 1)
    if n == 0:
        return {"weights": np.empty(0), "means": np.empty((0, d)),
                "vars": np.empty((0, d))}
    k_eff = min(k, n)
    mu = _farthest_point_init(X, k_eff)
    var = np.tile(X.var(axis=0) + reg, (k_eff, 1))
    w = np.full(k_eff, 1.0 / k_eff)
    prev_ll = -np.inf
    for _ in range(iters):
        # E-step: log N(x | mu_c, diag var_c) + log w_c, stabilized
        logp = (
            -0.5 * (((X[:, None, :] - mu[None, :, :]) ** 2)
                    / var[None, :, :]).sum(axis=2)
            - 0.5 * np.log(2 * np.pi * var).sum(axis=1)[None, :]
            + np.log(w)[None, :]
        )
        m = logp.max(axis=1, keepdims=True)
        p = np.exp(logp - m)
        s = p.sum(axis=1, keepdims=True)
        resp = p / s
        ll = float((m[:, 0] + np.log(s[:, 0])).mean())
        # M-step
        nk = resp.sum(axis=0) + 1e-12
        mu = (resp.T @ X) / nk[:, None]
        # centered second moment — the E[x^2]-mu^2 form cancels
        # catastrophically when |mean| >> std (large-offset embeddings)
        # and can go NEGATIVE, poisoning the next E-step's log
        diff = X[:, None, :] - mu[None, :, :]
        var = (resp[:, :, None] * diff**2).sum(axis=0) / nk[:, None] + reg
        w = nk / n
        if abs(ll - prev_ll) < tol:
            break
        prev_ll = ll
    return {"weights": w, "means": mu, "vars": var}


def gmm_assign(ds, model: dict, cols: list[str] | None = None,
               vec_col: str | None = None,
               out_col: str = "cluster") -> "ray.data.Dataset":
    """Distributed MAP assignment under the broadcast mixture model."""
    ref = ray.put(
        {k: np.asarray(v, dtype=np.float64) for k, v in model.items()}
    )

    def fn(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        if vec_col is not None:
            raw = t[vec_col].to_numpy(zero_copy_only=False)
            X = np.stack(list(raw)).astype(np.float64)
        else:
            X = np.column_stack(
                [t[c].to_numpy(zero_copy_only=False) for c in cols]
            ).astype(np.float64)
        mu, var, w = m["means"], m["vars"], m["weights"]
        logp = (
            -0.5 * (((X[:, None, :] - mu[None, :, :]) ** 2)
                    / var[None, :, :]).sum(axis=2)
            - 0.5 * np.log(2 * np.pi * var).sum(axis=1)[None, :]
            + np.log(np.maximum(w, 1e-300))[None, :]
        )
        return t.append_column(
            out_col, pa.array(logp.argmax(axis=1).astype(np.int32))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def agglomerative_fit(ds, cols: list[str] | None = None,
                      vec_col: str | None = None, k: int = 8,
                      sample_limit: int = 2000,
                      sample_by: str | None = None) -> np.ndarray:
    """Average-linkage agglomerative clustering on a bounded unbiased sample
    (the ``Agglomerative``/``hcluster`` members of the reference zoo,
    feature.py:4813-4827) — Lance-Williams update in pure numpy, O(m³) worst
    case on the SAMPLE only (m <= sample_limit).  Returns the k cluster-mean
    centroids; corpus assignment is ``kmeans_assign`` (nearest centroid),
    the same fit/assign split as every clusterer here."""
    X = _sample_matrix(ds, cols, vec_col, sample_limit, sample_by)
    m = len(X)
    if m == 0:
        return np.empty((0, 0))
    k_eff = min(k, m)
    # average-linkage distance between clusters = mean pairwise distance;
    # maintained exactly via the Lance-Williams average-link update.
    # Built row-chunked: the per-element expression is unchanged (each
    # output row's diff/square/sum runs on the same operands in the same
    # order), so D is bitwise-identical to the one-shot broadcast — but the
    # temporary drops from m²·d doubles (~2 GB at the 2000×128 cap, whose
    # first-touch page faults dominated the fit at ~50 s) to chunk·m·d.
    D = np.empty((m, m))
    row_chunk = max(1, min(m, (1 << 24) // max(1, m * X.shape[1])))
    for s in range(0, m, row_chunk):
        e = min(m, s + row_chunk)
        np.sqrt(
            ((X[s:e, None, :] - X[None, :, :]) ** 2).sum(axis=2),
            out=D[s:e],
        )
    np.fill_diagonal(D, np.inf)
    size = np.ones(m, dtype=np.int64)
    label = np.arange(m)
    # cached per-row first minima: the global row-major argmin over the
    # symmetric matrix == first row holding the global min, first column
    # within it — so (argmin(rmin_v), rmin_c[i]) reproduces np.argmin(D)
    # exactly (ties included) while dropping the O(m²) full-matrix scan
    # per merge that made the sample-cap fit take ~50 s (2000×32: now ~1 s;
    # bitwise-identical merges/centroids, A/B-checked incl. forced ties)
    alive = np.ones(m, dtype=bool)
    rmin_v = D.min(axis=1)
    rmin_c = D.argmin(axis=1)
    for _ in range(m - k_eff):
        i = int(np.argmin(rmin_v))
        j = int(rmin_c[i])
        # merge j into i (i < j always: the min's first row-major hit)
        ni, nj = size[i], size[j]
        Dn = (ni * D[i] + nj * D[j]) / (ni + nj)
        D[i] = Dn
        D[:, i] = Dn
        D[i, i] = np.inf
        D[j, :] = np.inf
        D[:, j] = np.inf
        size[i] += size[j]
        label[label == label[j]] = label[i]
        alive[j] = False
        rmin_v[j] = np.inf
        # rows whose cached min sat in the merged columns recompute fully;
        # every other row only checks its updated column-i entry (first-
        # occurrence tie rule: an equal value at a SMALLER column wins)
        need = alive & ((rmin_c == i) | (rmin_c == j))
        need[i] = True
        need[j] = False
        nr = np.flatnonzero(need)
        if nr.size:
            sub = D[nr]
            rmin_v[nr] = sub.min(axis=1)
            rmin_c[nr] = sub.argmin(axis=1)
        rest = alive & ~need
        rest[i] = False
        col = D[:, i]
        upd = rest & ((col < rmin_v) | ((col == rmin_v) & (i < rmin_c)))
        rmin_v[upd] = col[upd]
        rmin_c[upd] = i
    cents = np.stack(
        [X[label == c].mean(axis=0) for c in np.unique(label)]
    )
    return cents


def _pairwise_sq(P: np.ndarray, X: np.ndarray,
                 Xsq: np.ndarray | None = None) -> np.ndarray:
    """Pairwise squared distances via GEMM (|p|² + |x|² − 2 p·x, clamped
    at 0).  The broadcasted ``(m, m, d)`` temporary is ~1 GB per call at
    the default sample caps and memory-bound; BLAS keeps it O(m²) memory
    and ~2 orders of magnitude faster.  NOT bitwise-equal to the broadcast
    form — callers here feed thresholded kernels / rank statistics gated
    by allclose/structural tests, never hashed floats (agglomerative_fit
    keeps the broadcast form: its merge order is bitwise-pinned)."""
    if Xsq is None:
        Xsq = np.einsum("ij,ij->i", X, X)
    Psq = np.einsum("ij,ij->i", P, P) if P is not X else Xsq
    d2 = Psq[:, None] + Xsq[None, :] - 2.0 * (P @ X.T)
    return np.maximum(d2, 0.0, out=d2)


def spectral_fit(ds, cols: list[str] | None = None,
                 vec_col: str | None = None, k: int = 8,
                 gamma: float | None = None, sample_limit: int = 2000,
                 sample_by: str | None = None) -> np.ndarray:
    """Normalized-cut spectral clustering on a bounded unbiased sample — the
    ``Spectral`` member of the reference zoo (feature.py:4828-4841) in pure
    numpy: RBF affinity (gamma defaults to 1/median²(pairwise distance) —
    self-tuning), symmetric normalized Laplacian, bottom-k eigenvectors
    (``eigh``), row-normalized spectral embedding clustered by the
    deterministic k-means, cluster-mean centroids returned in the ORIGINAL
    space so ``kmeans_assign`` extends labels to the corpus (the documented
    out-of-sample approximation every fit/assign clusterer here uses)."""
    X = _sample_matrix(ds, cols, vec_col, sample_limit, sample_by)
    m = len(X)
    if m == 0:
        return np.empty((0, 0))
    k_eff = min(k, m)
    D2 = _pairwise_sq(X, X)
    if gamma is None:
        med = np.median(D2[np.triu_indices(m, k=1)]) if m > 1 else 1.0
        gamma = 1.0 / max(med, 1e-12)
    W = np.exp(-gamma * D2)
    np.fill_diagonal(W, 0.0)
    d = W.sum(axis=1)
    d_inv_sqrt = 1.0 / np.sqrt(np.maximum(d, 1e-12))
    L = np.eye(m) - (d_inv_sqrt[:, None] * W) * d_inv_sqrt[None, :]
    _evals, evecs = np.linalg.eigh(L)
    U = evecs[:, :k_eff]  # bottom-k of L_sym (eigh returns ascending)
    # deterministic sign per eigenvector (largest-|.| entry positive)
    signs = np.sign(U[np.abs(U).argmax(axis=0), np.arange(k_eff)])
    U = U * signs[None, :]
    norms = np.linalg.norm(U, axis=1, keepdims=True)
    U = U / np.maximum(norms, 1e-12)
    # deterministic k-means in the spectral embedding, same shared seeding
    C = _farthest_point_init(U, k_eff)
    lab = np.zeros(m, dtype=np.int64)
    for _ in range(30):
        dist = ((U[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        lab = dist.argmin(axis=1)
        for c in range(k_eff):
            sel = lab == c
            if sel.any():
                C[c] = U[sel].mean(axis=0)
    return np.stack([
        X[lab == c].mean(axis=0) if (lab == c).any() else X[0]
        for c in range(k_eff)
    ])


def meanshift_fit(ds, cols: list[str] | None = None,
                  vec_col: str | None = None, bandwidth: float | None = None,
                  sample_limit: int = 2000, sample_by: str | None = None,
                  max_iter: int = 100, tol: float = 1e-6) -> np.ndarray:
    """Flat-kernel mean shift on a bounded unbiased sample — the
    ``meanshift`` member of the reference zoo (feature.py:4842-4855).
    Bandwidth defaults to the quantile-kNN estimate (mean over points of
    the distance to their 0.3·m-th nearest neighbor — the standard
    estimate_bandwidth rule, which stays within-cluster-sized instead of
    spanning clusters like a global median would); every sample point seeds
    a mode climb; converged modes closer than bandwidth/2 merge (min-index
    representative — deterministic under the canonical sample order).
    Returns the mode points; assignment = ``kmeans_assign``."""
    X = _sample_matrix(ds, cols, vec_col, sample_limit, sample_by)
    m = len(X)
    if m == 0:
        return np.empty((0, 0))
    Xsq = np.einsum("ij,ij->i", X, X)
    D = np.sqrt(_pairwise_sq(X, X, Xsq))
    if bandwidth is None:
        if m > 1:
            kq = max(1, int(0.3 * m))
            knn_d = np.sort(D, axis=1)[:, kq]  # col 0 is self (0.0)
            bandwidth = float(knn_d.mean())
        else:
            bandwidth = 1.0
        bandwidth = max(bandwidth, 1e-12)
    P = X.copy()
    for _ in range(max_iter):
        d2 = _pairwise_sq(P, X, Xsq)
        inside = d2 <= bandwidth * bandwidth
        cnt = inside.sum(axis=1)
        newP = (inside.astype(np.float64) @ X) / np.maximum(
            cnt, 1
        )[:, None]
        shift = np.linalg.norm(newP - P, axis=1).max()
        P = newP
        if shift < tol * bandwidth:
            break
    # merge modes within bandwidth/2, keep the first (canonical order)
    modes: list[np.ndarray] = []
    for p in P:
        if not any(np.linalg.norm(p - q) < bandwidth / 2 for q in modes):
            modes.append(p)
    return np.stack(modes)


def affinity_propagation_fit(ds, cols: list[str] | None = None,
                             vec_col: str | None = None,
                             damping: float = 0.7, max_iter: int = 200,
                             sample_limit: int = 1000,
                             sample_by: str | None = None) -> np.ndarray:
    """Affinity propagation (Frey & Dueck, Science 2007) on a bounded
    unbiased sample — the ``APC`` member of the reference zoo
    (feature.py:4856-4868): responsibility/availability message passing on
    the negative-squared-distance similarity with median preference,
    exemplar points returned as centroids for ``kmeans_assign``."""
    X = _sample_matrix(ds, cols, vec_col, sample_limit, sample_by)
    m = len(X)
    if m == 0:
        return np.empty((0, 0))
    if m == 1:
        return X.copy()
    S = -((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    pref = np.median(S[np.triu_indices(m, k=1)])
    np.fill_diagonal(S, pref)
    R = np.zeros((m, m))
    A = np.zeros((m, m))
    idx = np.arange(m)
    for _ in range(max_iter):
        # responsibilities
        AS = A + S
        first = AS.max(axis=1)
        first_k = AS.argmax(axis=1)
        AS[idx, first_k] = -np.inf
        second = AS.max(axis=1)
        Rn = S - first[:, None]
        Rn[idx, first_k] = S[idx, first_k] - second
        R = damping * R + (1 - damping) * Rn
        # availabilities
        Rp = np.maximum(R, 0)
        np.fill_diagonal(Rp, np.diag(R))
        An = Rp.sum(axis=0)[None, :] - Rp
        dA = np.diag(An).copy()
        An = np.minimum(An, 0)
        np.fill_diagonal(An, dA)
        A = damping * A + (1 - damping) * An
    exemplars = np.flatnonzero(np.diag(R) + np.diag(A) > 0)
    if len(exemplars) == 0:
        exemplars = np.array([int(np.argmax(np.diag(R) + np.diag(A)))])
    return X[exemplars]


def tsne_fit(ds, cols: list[str] | None = None, vec_col: str | None = None,
             k: int = 2, perplexity: float = 30.0, iters: int = 400,
             learning_rate: float = 100.0, sample_limit: int = 1000,
             sample_by: str | None = None) -> dict:
    """Exact t-SNE (van der Maaten & Hinton, JMLR 2008) on a bounded
    unbiased sample — the ``t_sne`` member of the reference DR trio
    (feature.py:4937-4960), pure numpy: per-point sigma by binary search to
    the target perplexity, symmetrized P, KL gradient descent with momentum
    and early exaggeration, PCA init (deterministic — no random state
    anywhere).  t-SNE has NO out-of-sample map, so the returned model also
    carries the least-squares LINEAR extension (centered X -> Y) fitted on
    the sample; ``pca_transform`` broadcasts it so the corpus projection
    streams — the sample embedding is exact t-SNE, out-of-sample points get
    its best linear extension (documented approximation, same fit/assign
    split as every reducer here).  Returns {mean, components, sample_Y,
    sample_X}."""
    X = _sample_matrix(ds, cols, vec_col, sample_limit, sample_by)
    m = len(X)
    if m == 0:
        return {"mean": np.empty(0), "components": np.empty((k, 0)),
                "sample_Y": np.empty((0, k)), "sample_X": X}
    perplexity = min(perplexity, max((m - 1) / 3.0, 1.0))
    D2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    # per-point sigma: binary search so H(P_i) = log(perplexity)
    target = np.log(perplexity)
    P = np.zeros((m, m))
    for i in range(m):
        lo, hi = 1e-20, 1e20
        beta = 1.0
        d = np.delete(D2[i], i)
        for _ in range(50):
            p = np.exp(-d * beta)
            s = p.sum()
            if s <= 0:
                beta /= 2.0
                hi = beta * 2.0
                continue
            p = p / s
            h = -(p * np.log(np.maximum(p, 1e-300))).sum()
            if abs(h - target) < 1e-5:
                break
            if h > target:
                lo = beta
                beta = beta * 2 if hi >= 1e20 else (beta + hi) / 2
            else:
                hi = beta
                beta = beta / 2 if lo <= 1e-20 else (beta + lo) / 2
        row = np.insert(p, i, 0.0)
        P[i] = row
    P = (P + P.T) / (2.0 * m)
    P = np.maximum(P, 1e-12)
    # deterministic PCA init (zero-padded when sample rank < k)
    Xc = X - X.mean(axis=0)
    _u, _s, vt = np.linalg.svd(Xc, full_matrices=False)
    Y = Xc @ vt[:k].T
    if Y.shape[1] < k:
        Y = np.pad(Y, ((0, 0), (0, k - Y.shape[1])))
    Y = Y / max(Y.std(), 1e-12) * 1e-4
    gain = np.ones_like(Y)
    vel = np.zeros_like(Y)
    for it in range(iters):
        exag = 12.0 if it < 100 else 1.0
        momentum = 0.5 if it < 100 else 0.8
        d2y = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(axis=2)
        Q = 1.0 / (1.0 + d2y)
        np.fill_diagonal(Q, 0.0)
        Z = Q.sum()
        qn = np.maximum(Q / max(Z, 1e-300), 1e-12)
        PQ = (exag * P - qn) * Q
        grad = 4.0 * ((np.diag(PQ.sum(axis=1)) - PQ) @ Y)
        gain = np.where(np.sign(grad) != np.sign(vel),
                        gain + 0.2, gain * 0.8)
        gain = np.maximum(gain, 0.01)
        vel = momentum * vel - learning_rate * gain * grad
        Y = Y + vel
        Y = Y - Y.mean(axis=0)
    mean = X.mean(axis=0)
    # ridge-free least-squares linear extension (m >= d samples typical;
    # lstsq handles either shape)
    W, *_ = np.linalg.lstsq(X - mean, Y, rcond=None)
    return {"mean": mean, "components": W.T, "sample_Y": Y, "sample_X": X}
