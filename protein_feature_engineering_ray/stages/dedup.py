"""Deduplication stages for large-scale corpus hygiene.

Not present in the reference (SURVEY.md §2.8: dedup is absent there); added
as first-class engine operators for the 100 TB training-data path:

- ``exact_dedup``: content-hash partition + per-group first (idempotent
  re-ingest; also used on ``(conv_id, turn_idx)`` for transcript ingest).
- ``minhash_lsh_candidates`` / ``minhash_dedup``: shingle -> minhash ->
  banded LSH buckets -> candidate groups -> verified Jaccard; the scale path
  is one groupby on (band, band_hash) — no all-pairs.  (MinHash: Broder,
  "On the resemblance and containment of documents", 1997; banding: Leskovec
  et al., Mining of Massive Datasets ch. 3.)
- ``simhash64``: 64-bit simhash per doc + hamming-bucket candidates
  (Charikar, "Similarity estimation techniques from rounding algorithms",
  STOC 2002).
- ``ngram_jaccard``: exact verifier for a candidate pair list (broadcast).
- ``embedding_neardup``: cosine-threshold near-dup over an embedding column
  (LSH random-hyperplane buckets, then in-bucket exact cosine).

All stateful pieces (hash seeds, hyperplanes) are deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_col: str | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Keep one row per distinct ``key_cols`` tuple (the first under
    ``order_col``, or an arbitrary-but-deterministic min).

    hash(key) partition -> per-group head(1): one shuffle, no global sort.
    """

    def add_key(t: pa.Table) -> pa.Table:
        key = pd.util.hash_pandas_object(
            t.select(key_cols).to_pandas(), index=False
        ).to_numpy()
        return t.append_column("_dkey", pa.array(key, pa.uint64()))

    def first_per_key(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = ["_dkey"] + ([order_col] if order_col else [])
        g = g.sort_values(sort_cols, kind="mergesort")
        out = g.groupby("_dkey", sort=False).head(1)
        return out.drop(columns=["_dkey", "_bucket"])

    withkey = ds.map_batches(add_key, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (
            t["_dkey"].to_numpy(zero_copy_only=False) % np.uint64(num_buckets)
        ).astype(np.uint32)
        return t.append_column("_bucket", pa.array(b, pa.uint32()))

    return (
        withkey.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(first_per_key, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# minhash / LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hash k-word shingles of a document to uint64."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return pd.util.hash_array(np.asarray(shingles, dtype=object)).astype(np.uint64)


def minhash_signatures(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 1,
) -> ray.data.Dataset:
    """Per-doc minhash signature (list<uint64>[num_perm]) — stateless map."""
    a, b = _minhash_params(num_perm, seed)

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        sigs = np.empty((len(texts), num_perm), dtype=np.uint64)
        for i, txt in enumerate(texts):
            h = _shingle_hashes(txt or "", shingle_k)
            # (a*h + b) mod p, min over shingles, vectorized over perms
            v = (h[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
            sigs[i] = v.min(axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), pa.uint64()), num_perm
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def minhash_lsh_candidates(
    sigs: ray.data.Dataset,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> ray.data.Dataset:
    """Explode signatures to (band, band_hash) rows; groupby emits candidate
    groups (>=2 docs sharing a band hash).  Output: band, band_hash, doc_ids
    (list).  The groupby on the banded key is the only shuffle."""

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        # column may be FixedSizeList or (after a pandas round-trip) Ray's
        # tensor extension type; both yield row-arrays via to_numpy
        raw = t["minhash"].to_numpy(zero_copy_only=False)
        sig = np.stack(list(raw)).astype(np.uint64).reshape(len(ids), -1)
        out_ids, out_band, out_hash = [], [], []
        for bi in range(bands):
            chunk = sig[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            h = pd.util.hash_pandas_object(
                pd.DataFrame(chunk), index=False
            ).to_numpy()
            out_ids.append(ids)
            out_band.append(np.full(len(ids), bi, dtype=np.int32))
            out_hash.append(h.astype(np.uint64))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_ids)),
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                "band_hash": pa.array(np.concatenate(out_hash), pa.uint64()),
            }
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        # coarse-bucket the (band, band_hash) key space so Ray shuffles into
        # a few fat groups, and the per-key grouping happens vectorized in
        # pandas inside each bucket (NOT one Ray group per tiny LSH key —
        # that is ~10ms of scheduler overhead per key)
        b = (
            t["band_hash"].to_numpy(zero_copy_only=False)
            % np.uint64(64)
        ).astype(np.uint32)
        return t.append_column("_bucket", pa.array(b, pa.uint32()))

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band", "band_hash"])[id_col].transform("size")
        g = g[sizes >= 2]
        if len(g) == 0:
            return pd.DataFrame(
                {"band": pd.Series([], dtype=np.int32),
                 "band_hash": pd.Series([], dtype=np.uint64),
                 "doc_ids": pd.Series([], dtype=object)}
            )
        out = (
            g.sort_values(id_col)
            .groupby(["band", "band_hash"])[id_col]
            .agg(list)
            .reset_index()
            .rename(columns={id_col: "doc_ids"})
        )
        return out

    return (
        sigs.map_batches(explode, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(collect, batch_format="pandas")
    )


def minhash_dedup(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> ray.data.Dataset:
    """Full near-dup pipeline: signature -> LSH candidates -> per-group keep
    min id, drop the rest.  Returns the deduplicated original rows.

    Candidate-pair verification uses signature Jaccard (fraction of equal
    minhashes) >= threshold; union of drops is collected driver-side (the
    candidate set is tiny relative to the corpus — log if it is not)."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, id_col, text_col, num_perm, shingle_k)
    sig_mat = sigs.to_pandas()  # id -> signature lookup (small: ids+sigs only)
    lut = {
        r[id_col]: np.asarray(r["minhash"], dtype=np.uint64)
        for _, r in sig_mat.iterrows()
    }
    cands = minhash_lsh_candidates(
        ray.data.from_pandas(sig_mat), id_col, bands, rows_per_band
    ).to_pandas()
    drop: set = set()
    if "doc_ids" not in cands.columns:  # no candidate groups at all
        cands = pd.DataFrame({"doc_ids": []})
    for ids in cands["doc_ids"]:
        ids = sorted(ids)
        keep = ids[0]
        for other in ids[1:]:
            if other in drop:
                continue
            sim = float((lut[keep] == lut[other]).mean())
            if sim >= threshold:
                drop.add(other)
    drop_ref = ray.put(drop)

    def filter_fn(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mask = np.asarray([i not in d for i in ids])
        return t.filter(pa.array(mask))

    return ds.map_batches(filter_fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """64-bit simhash over word unigrams (sign of per-bit weighted sums)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, txt in enumerate(texts):
            words = (txt or "").split()
            if not words:
                continue
            h = pd.util.hash_array(np.asarray(words, dtype=object)).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits(
                (votes > 0).astype(np.uint8)[::-1]
            ).view(">u8")[0]
        return pa.table({id_col: t[id_col], "simhash": pa.array(out, pa.uint64())})

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# n-gram jaccard verify + embedding near-dup
# ---------------------------------------------------------------------------

def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity of two texts."""
    def grams(t):
        w = t.split()
        if len(w) < k:
            return {" ".join(w)} if w else set()
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    ga, gb = grams(a), grams(b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / len(ga | gb)


def embedding_neardup(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 3,
) -> ray.data.Dataset:
    """Cosine near-duplicate pairs via random-hyperplane LSH buckets.

    Bucket = sign pattern of ``n_planes`` fixed random hyperplanes (docs with
    cos >= threshold almost surely share it for small angles); exact cosine
    verification inside each bucket (numpy matmul).  Output: (id_a, id_b,
    cosine) pairs with id_a < id_b."""

    def bucket(t: pa.Table) -> pa.Table:
        vecs = np.asarray(
            t[vec_col].combine_chunks().flatten()
        ).reshape(len(t), -1).astype(np.float64)
        rng = np.random.default_rng(seed)
        planes = rng.normal(size=(vecs.shape[1], n_planes))
        signs = (vecs @ planes) > 0
        key = np.zeros(len(vecs), dtype=np.uint32)
        for j in range(n_planes):
            key |= signs[:, j].astype(np.uint32) << np.uint32(j)
        return pa.table(
            {
                id_col: t[id_col],
                vec_col: t[vec_col],
                "lsh_key": pa.array(key, pa.uint32()),
                # coarse Ray shuffle bucket; exact lsh_key grouping happens
                # vectorized inside each fat bucket
                "_bucket": pa.array(key % np.uint32(64), pa.uint32()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_s = [], [], []
        for _, sub in g.groupby("lsh_key", sort=False):
            if len(sub) < 2:
                continue
            ids = sub[id_col].to_numpy()
            V = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            sim = V @ V.T
            ia, ib = np.triu_indices(len(ids), k=1)
            keep = sim[ia, ib] >= threshold
            a, b = ids[ia[keep]], ids[ib[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_s.append(sim[ia[keep], ib[keep]])
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=np.int64),
                 "id_b": pd.Series([], dtype=np.int64),
                 "cosine": pd.Series([], dtype=np.float64)}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b),
             "cosine": np.concatenate(out_s)}
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
    )
