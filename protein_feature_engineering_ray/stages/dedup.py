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

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from protein_feature_engineering_ray.core.joins import bucket_join
from protein_feature_engineering_ray.core.strhash import hash_strings


def _probe_id_type(ds: ray.data.Dataset, id_col: str) -> pa.DataType:
    """Id dtype from the dataset's schema (int64 when unprobeable) — empty
    result blocks must carry the REAL id dtype or Ray's block-schema
    unification breaks against non-empty siblings (string doc ids)."""
    try:
        sch = ds.schema()
        probed = dict(zip(sch.names, sch.types)).get(id_col)
        if isinstance(probed, pa.DataType):
            return probed
    except Exception:
        pass
    return pa.int64()


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_col: str | None = None,
    num_buckets: int = 64,
    _hash_fn=None,
) -> ray.data.Dataset:
    """Keep one row per distinct ``key_cols`` tuple (the first under
    ``order_col``, or an arbitrary-but-deterministic min).

    hash(key) partition -> per-group first per ACTUAL key tuple: one shuffle,
    no global sort.  The 64-bit hash is used ONLY to route rows — rows with
    equal keys always share a hash so they land in one bucket — while the
    keep/drop decision compares the real key columns, so a 64-bit collision
    between distinct keys (expected ~1e4 times at 1e12 rows) never drops a
    legitimate row.
    """

    # _hash_fn is test-only: inject a degenerate hash to force collisions
    hash_fn = _hash_fn or (
        lambda df: pd.util.hash_pandas_object(df, index=False).to_numpy()
    )

    def add_key(t: pa.Table) -> pa.Table:
        key = np.asarray(hash_fn(t.select(key_cols).to_pandas()), dtype=np.uint64)
        return t.append_column("_dkey", pa.array(key, pa.uint64()))

    def first_per_key(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = list(key_cols) + ([order_col] if order_col else [])
        g = g.sort_values(sort_cols, kind="mergesort")
        out = g.drop_duplicates(subset=key_cols, keep="first")
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


def _split_lines(texts: pa.Array):
    """Split a string array on newlines -> (flat lines Array, per-row line
    counts int64, flat-slot start offsets int64)."""
    lists = pc.split_pattern(pc.fill_null(texts, ""), "\n")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    counts = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(counts)])
    return flat, counts, offs


def line_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    min_len: int = 1,
) -> ray.data.Dataset:
    """Cross-document LINE-level exact dedup (the C4 / RefinedWeb "dedup
    lines across the corpus" hygiene pass the document-level ``exact_dedup``
    cannot express): every distinct line of at least ``min_len`` characters
    is kept only at its FIRST occurrence in global ``(id, line_index)``
    order; later occurrences are deleted from their documents.  Lines
    shorter than ``min_len`` (including the '' a trailing newline or empty
    document produces) never participate and are always kept.  Returns one
    row per document: ``(id, <text_col> rebuilt, n_lines, n_lines_kept,
    n_dup_lines_removed)``.

    Two exchanges, the ``exact_dedup`` routing discipline on each:
    1. participating ``(line, id, line_idx)`` triples co-locate by line
       content hash; after the in-bucket sort equal-line runs are
       contiguous, so every row but each run's head is a loser —
       vectorized boundary detection, no pairwise work (a hot line costs
       its occurrence count in one bucket, never all-pairs).
    2. loser slots co-locate with their documents by id hash; each
       document's text is rebuilt by dropping its loser line slots (an
       Arrow list-offsets rebuild + ``binary_join`` — no per-row Python).
    The full text rides only exchange 2 and exactly once; exchange 1
    ships just the participating line content — the same
    content-proportional bytes a fingerprint pass ships."""
    from protein_feature_engineering_ray.core.bucket import grouped_buckets

    def explode(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, counts, offs = _split_lines(texts)
        rid = np.repeat(np.arange(len(t)), counts)
        li = np.arange(len(flat), dtype=np.int64) - offs[rid]
        keep = pc.utf8_length(flat).to_numpy(
            zero_copy_only=False) >= min_len
        return pa.table({
            id_col: t[id_col].take(pa.array(rid[keep], pa.int64())),
            "_li": pa.array(li[keep], pa.int64()),
            "_ln": flat.filter(pa.array(keep)),
        })

    def losers_fn(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.select([id_col, "_li"])
        ln = g["_ln"]
        if isinstance(ln, pa.ChunkedArray):
            ln = ln.combine_chunks()
        # sorted by (_ln, id, _li): a row is a loser iff it equals its
        # predecessor (run heads are the global first occurrences)
        dup = np.zeros(n, dtype=bool)
        if n > 1:
            dup[1:] = pc.equal(ln.slice(1), ln.slice(0, n - 1)).to_numpy(
                zero_copy_only=False)
        m = pa.array(dup)
        return pa.table({id_col: g[id_col].filter(m),
                         "_li": g["_li"].filter(m)})

    losers = grouped_buckets(
        ds.map_batches(explode, batch_format="pyarrow"),
        losers_fn, num_buckets=num_buckets, key="_ln",
        order_cols=("_ln", id_col, "_li"),
    )

    # tagged union keyed by id: the document row sorts first in its id run
    # (_li = -1 precedes every real 0-based line index)
    def tag_doc(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        return pa.table({
            id_col: t[id_col],
            "_li": pa.array(np.full(len(t), -1, np.int64)),
            text_col: pc.fill_null(texts.cast(pa.string()), ""),
        })

    def tag_loser(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "_li": t["_li"],
            text_col: pa.nulls(t.num_rows, pa.string()),
        })

    tagged = ds.map_batches(tag_doc, batch_format="pyarrow").union(
        losers.map_batches(tag_loser, batch_format="pyarrow"))

    def rebuild(g: pa.Table) -> pa.Table:
        li = g["_li"].to_numpy(zero_copy_only=False)
        isdoc = li < 0
        if g.num_rows == 0 or not isdoc.any():
            empty = pa.array([], pa.int64())
            return pa.table({
                id_col: g[id_col].slice(0, 0).combine_chunks(),
                text_col: pa.array([], pa.string()),
                "n_lines": empty,
                "n_lines_kept": empty,
                "n_dup_lines_removed": empty,
            })
        # run index per row on the sorted id column (adjacency on
        # dictionary codes — plain equality, no boxing for strings)
        ids = g[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        codes = ids
        if not pa.types.is_dictionary(codes.type) and codes.null_count == 0:
            codes = codes.dictionary_encode()
        iv = (codes.indices.to_numpy(zero_copy_only=False)
              if pa.types.is_dictionary(codes.type)
              else np.asarray(codes.to_numpy(zero_copy_only=False),
                              dtype=object))
        starts = np.empty(len(iv), dtype=bool)
        starts[0] = True
        starts[1:] = iv[1:] != iv[:-1]
        run = np.cumsum(starts) - 1
        # every run's head row must be the document row (losers reference
        # ids present in the corpus; _li=-1 sorts first)
        if not isdoc[starts].all():
            missing = ids.take(
                pa.array(np.flatnonzero(starts & ~isdoc)[:3], pa.int64()))
            raise RuntimeError(
                "line_dedup: loser rows reference ids absent from the "
                f"corpus stream, e.g. {missing.to_pylist()!r}"
            )
        texts = g[text_col].filter(pa.array(isdoc))
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, counts, offs = _split_lines(texts)
        drop_run = run[~isdoc]
        slots = offs[drop_run] + li[~isdoc]
        keep = np.ones(len(flat), dtype=bool)
        keep[slots] = False
        removed = np.bincount(drop_run, minlength=len(counts))
        kept = counts - removed
        new_offs = np.concatenate([[0], np.cumsum(kept)]).astype(np.int32)
        rebuilt = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()),
                                     flat.filter(pa.array(keep))),
            "\n",
        )
        out_ids = ids.filter(pa.array(isdoc))
        if pa.types.is_dictionary(out_ids.type):
            out_ids = out_ids.cast(out_ids.type.value_type)
        return pa.table({
            id_col: out_ids,
            text_col: rebuilt,
            "n_lines": pa.array(counts, pa.int64()),
            "n_lines_kept": pa.array(kept, pa.int64()),
            "n_dup_lines_removed": pa.array(removed, pa.int64()),
        })

    return grouped_buckets(
        tagged, rebuild, num_buckets=num_buckets, key=id_col,
        order_cols=(id_col, "_li"),
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


def _batch_shingle_hashes(
    texts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes of every k-word shingle of every text, flattened, plus
    per-row offsets — ONE Arrow tokenize + ONE vectorized hash pass for the
    whole batch (no per-document Python loop).  k-shingles hash their word-
    hash k-tuple; rows with < k words hash the joined string (empty rows
    hash "")."""
    import pyarrow.compute as pc

    arr = pc.split_pattern_regex(
        pc.fill_null(pa.array(texts, pa.string()), ""), r"\s+"
    )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten()
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = tok_len > 0  # .split() semantics: drop empty split artifacts
    n = len(texts)
    rid = np.repeat(np.arange(n), np.diff(offs))[keep]
    kept = flat.filter(pa.array(keep))
    wh = hash_strings(kept)
    nw = np.bincount(rid, minlength=n)
    row_start = np.concatenate([[0], np.cumsum(nw)])
    out_h = []
    out_rid = []
    longm = nw[rid] >= k if len(rid) else np.empty(0, bool)
    if longm.any():
        lh, lr = wh[longm], rid[longm]
        cols = {f"h{s}": lh[s:len(lh) - (k - 1 - s)] for s in range(k)}
        same = lr[: len(lr) - (k - 1)] == lr[k - 1:]
        gh = pd.util.hash_pandas_object(
            pd.DataFrame(cols), index=False
        ).to_numpy().astype(np.uint64)
        out_h.append(gh[same])
        out_rid.append(lr[: len(lr) - (k - 1)][same])
    shortm = nw < k  # includes empty rows -> "" shingle, like text.split()
    if shortm.any():
        srows = np.flatnonzero(shortm)
        # box only the short rows' tokens (the common long-document case
        # never materializes Python strings)
        words = np.asarray(
            kept.to_numpy(zero_copy_only=False), dtype=object
        )
        joined = np.array(
            [" ".join(words[row_start[r]:row_start[r + 1]]) for r in srows],
            dtype=object,
        )
        out_h.append(pd.util.hash_array(joined).astype(np.uint64))
        out_rid.append(srows)
    if not out_h:
        return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
    hh = np.concatenate(out_h)
    rr = np.concatenate(out_rid)
    order = np.argsort(rr, kind="stable")
    hh = hh[order]
    counts = np.bincount(rr, minlength=n)
    return hh, np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)


def minhash_signatures(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 1,
) -> ray.data.Dataset:
    """Per-doc minhash signature (list<uint64>[num_perm]) — stateless map,
    vectorized: the whole batch's shingles hash in one pass, then each
    permutation is one ``(a*h + b) % p`` array op + one
    ``np.minimum.reduceat`` segment-min (loop over the 64 permutations, not
    over thousands of documents)."""
    a, b = _minhash_params(num_perm, seed)

    def fn(t: pa.Table) -> pa.Table:
        texts = np.asarray(
            t[text_col].to_numpy(zero_copy_only=False), dtype=object
        )
        n = len(texts)
        h, offs = _batch_shingle_hashes(texts, shingle_k)
        sigs = np.full((n, num_perm), np.uint64(_MERSENNE), dtype=np.uint64)
        if len(h):
            nonempty = np.diff(offs) > 0  # every row has >= 1 shingle here
            starts = offs[:-1][nonempty]
            for j in range(num_perm):
                v = (h * a[j] + b[j]) % np.uint64(_MERSENNE)
                sigs[nonempty, j] = np.minimum.reduceat(v, starts)
        return pa.table(
            {
                id_col: t[id_col],
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), pa.uint64()), num_perm
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _sig_matrix(col, n: int) -> np.ndarray:
    """Signature column -> (n, num_perm) uint64; accepts FixedSizeList,
    Ray's tensor extension (post-pandas round-trips), or packed binary
    (the join-transport encoding — Acero joins reject list payloads)."""
    if hasattr(col, "type") and (
        pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type)
    ):
        vals = col.to_numpy(zero_copy_only=False)
        # one C-level join + one frombuffer (rows are fixed-width)
        return np.frombuffer(b"".join(vals), dtype=np.uint64).reshape(n, -1)
    raw = col.to_numpy(zero_copy_only=False)
    return np.stack(list(raw)).astype(np.uint64).reshape(n, -1)


def _pack_rows(m: np.ndarray) -> pa.Array:
    """(n, w) uint64 -> fixed-width binary column, zero per-row Python: one
    contiguous byte buffer + arithmetic offsets."""
    n, w = m.shape
    width = w * 8
    data = np.ascontiguousarray(m).tobytes()  # row-major = per-row bytes
    offsets = pa.array(
        np.arange(0, (n + 1) * width, width, dtype=np.int32), pa.int32()
    )
    return pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, offsets.buffers()[1], pa.py_buffer(data)]
    )


def pack_signatures(
    sigs: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(id, minhash list) -> (id, minhash binary): the join-transport form."""

    def pack(t: pa.Table) -> pa.Table:
        m = _sig_matrix(t["minhash"], len(t))
        return pa.table({id_col: t[id_col], "minhash": _pack_rows(m)})

    return sigs.map_batches(pack, batch_format="pyarrow")


def _banded_rows(
    sigs: ray.data.Dataset,
    id_col: str,
    bands: int,
    rows_per_band: int,
    coarse_buckets: int = 64,
    carry_sig: bool = False,
) -> ray.data.Dataset:
    """Explode signatures to (id, band, band_hash, _bucket) rows.  The
    coarse ``_bucket`` (band_hash % coarse_buckets) is what Ray shuffles on —
    a few fat groups, with exact per-(band, band_hash) grouping done
    vectorized in pandas inside each bucket (NOT one Ray group per tiny LSH
    key: that costs ~10ms scheduler overhead per key).  ``carry_sig`` ships
    the packed signature with every banded row (×bands byte inflation) so
    the band group can VERIFY in place — the fewer-barriers tradeoff of
    ``minhash_dedup(verify="inband")``."""

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sig = _sig_matrix(t["minhash"], len(ids))
        out_ids, out_band, out_hash = [], [], []
        for bi in range(bands):
            chunk = sig[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            h = pd.util.hash_pandas_object(
                pd.DataFrame(chunk), index=False
            ).to_numpy()
            out_ids.append(ids)
            out_band.append(np.full(len(ids), bi, dtype=np.int32))
            out_hash.append(h.astype(np.uint64))
        # compact run key (8 bytes/row, NOT the full signature): a hash of
        # the WHOLE signature row.  Equal digest => identical signature
        # (2^-64 collision), so digest runs are exactly the
        # signature-identical member sets — the unit the pair generators
        # collapse on (pair volume then scales with DISTINCT signatures,
        # not copies; see _group_run_pair_indices).  sig[:, 0] alone (the
        # old key) kept duplicate runs adjacent but could not SEPARATE
        # distinct texts sharing their first perm.
        dig = (
            pd.util.hash_pandas_object(pd.DataFrame(sig), index=False)
            .to_numpy().astype(np.uint64)
        )
        cols = {
            id_col: pa.array(np.concatenate(out_ids)),
            "band": pa.array(np.concatenate(out_band), pa.int32()),
            "band_hash": pa.array(np.concatenate(out_hash), pa.uint64()),
            "sig_digest": pa.array(np.tile(dig, bands), pa.uint64()),
        }
        if carry_sig:
            cols["minhash"] = _pack_rows(np.tile(sig, (bands, 1)))
        return pa.table(cols)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (
            t["band_hash"].to_numpy(zero_copy_only=False)
            % np.uint64(coarse_buckets)
        ).astype(np.uint32)
        return t.append_column("_bucket", pa.array(b, pa.uint32()))

    return sigs.map_batches(explode, batch_format="pyarrow").map_batches(
        add_bucket, batch_format="pyarrow"
    )


def minhash_lsh_candidates(
    sigs: ray.data.Dataset,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> ray.data.Dataset:
    """Candidate GROUPS (>=2 docs sharing a band hash) from banded LSH.
    Output: band, band_hash, doc_ids (list).  One shuffle (the coarse-bucket
    groupby in ``_banded_rows``)."""

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
        _banded_rows(sigs, id_col, bands, rows_per_band)
        .groupby("_bucket")
        .map_groups(collect, batch_format="pandas")
    )


def _group_pair_indices(
    sz: np.ndarray, small_full: int | None = 16
) -> tuple[np.ndarray, np.ndarray]:
    """Candidate-pair ROW indices (a_idx, b_idx) over group-contiguous sorted
    rows: ALL i<j pairs for groups of size <= ``small_full`` (closes the
    chain's residual under-merge — similar members that are never
    sort-adjacent and fail against their neighbors — at bounded O(size²)
    cost), CHAIN (i-1, i) pairs above (hot groups stay O(size)).  Fully
    vectorized: the all-pairs side is the rank/offset trick (element at
    local rank r pairs with its r predecessors).

    ``small_full=None`` = EXACT mode: all-pairs in EVERY group, no chain
    fallback — candidate recall becomes provably complete (the oracle-gate
    mode; cost is O(size²) per collided group, bounded in practice because
    callers pair RUNS of identical signatures, not members)."""
    sz = np.asarray(sz, dtype=np.int64)
    n = int(sz.sum())
    starts = np.concatenate([[0], np.cumsum(sz)[:-1]])
    grp = np.repeat(np.arange(len(sz)), sz)
    rank = np.arange(n, dtype=np.int64) - starts[grp]
    small = (
        np.ones(len(sz), dtype=bool) if small_full is None
        else sz <= small_full
    )
    srow = small[grp]
    idx_s = np.flatnonzero(srow)
    r_s = rank[idx_s]
    tot = int(r_s.sum())
    pre = np.cumsum(r_s) - r_s
    within = np.arange(tot, dtype=np.int64) - np.repeat(pre, r_s)
    a1 = np.repeat(starts[grp[idx_s]], r_s) + within
    b1 = np.repeat(idx_s, r_s)
    lrow = (~small[grp]) & (rank >= 1)
    b2 = np.flatnonzero(lrow)
    a2 = b2 - 1
    return np.concatenate([a1, a2]), np.concatenate([b1, b2])


def _group_run_pair_indices(
    grp_of: np.ndarray, run_key: np.ndarray, band: np.ndarray,
    small_full: int | None = 16, run_chain_band: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Candidate-pair ROW indices over group-contiguous rows sorted by
    (group, run_key, id), REPLICATION-INVARIANT:

    - members of a group sharing ``run_key`` (= the full-signature digest)
      are signature-identical RUNS.  Within a run: chain (i-1, i) pairs —
      they verify at signature-Jaccard 1, so the run always links — and
      only in ``run_chain_band`` (an identical-signature run recurs in
      EVERY band; one band's chain gives the connectivity without x-bands
      duplicate edges).
    - across runs, each run's FIRST member represents it: ALL
      representative pairs when the group holds <= ``small_full`` runs,
      chain of adjacent representatives above (``_group_pair_indices`` at
      run granularity).

    Pair volume therefore scales with DISTINCT signatures, not copies.
    The previous member-level form let exact-copy replication (a) push
    mixed groups past the all-pairs floor — non-adjacent distinct texts
    lost their pair in every band, an UNDER-MERGE measured at 8 copies —
    and (b) inflate the verified edge list past the local-CC threshold
    (~45x wall blowup via the distributed label-propagation path)."""
    n = len(grp_of)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = grp_of[1:] != grp_of[:-1]
    new_run = new_grp | np.concatenate(
        [[True], run_key[1:] != run_key[:-1]])
    # within-run chain rows, one canonical band only
    chain_b = np.flatnonzero((~new_run) & (band == run_chain_band))
    chain_a = chain_b - 1
    # run representatives, still group-contiguous
    run_first = np.flatnonzero(new_run)
    runs_per_group = np.bincount(
        np.cumsum(new_grp)[run_first] - 1
    )
    ra, rb = _group_pair_indices(runs_per_group, small_full)
    return (
        np.concatenate([run_first[ra], chain_a]),
        np.concatenate([run_first[rb], chain_b]),
    )


def minhash_candidate_pairs(
    sigs: ray.data.Dataset,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    coarse_buckets: int = 64,
    small_full: int = 16,
) -> ray.data.Dataset:
    """Distinct candidate pairs ``(id_a < id_b)`` from banded LSH: within
    every (band, band_hash) group of size <= ``small_full``, ALL member
    pairs; above that, each member pairs with its sorted PREDECESSOR (chain).
    Chains connect a group with the same O(group size) edge volume as a
    star, but survive downstream threshold verification better: a star
    loses the whole group when its hub fails verification against everyone,
    a chain only splits at genuinely-dissimilar adjacent links.  The
    small-group all-pairs floor closes the chain's residual under-merge
    (similar members that are never sort-adjacent AND fail against their
    neighbors) at bounded O(small_full·size) cost."""

    base = _banded_rows(sigs, id_col, bands, rows_per_band, coarse_buckets)

    def collect_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band", "band_hash"])[id_col].transform("size")
        g = g[sizes >= 2]
        if len(g) == 0:
            idt = g[id_col].dtype if id_col in g else np.int64
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=idt),
                 "id_b": pd.Series([], dtype=idt)}
            )
        # group-contiguous in (sig_digest, id) order — digest runs are
        # exactly the signature-identical member sets the pair generator
        # collapses on (see _group_run_pair_indices)
        g = g.sort_values(["band", "band_hash", "sig_digest", id_col],
                          kind="mergesort")
        grp_of = (
            g.groupby(["band", "band_hash"], sort=False).ngroup().to_numpy()
        )
        ai, bi = _group_run_pair_indices(
            grp_of, g["sig_digest"].to_numpy(), g["band"].to_numpy(),
            small_full)
        ids = g[id_col].to_numpy()
        # pairs can cross runs, so the positional predecessor can have
        # the LARGER id — normalize to the documented (id_a < id_b)
        # orientation so mirrored duplicates collapse in drop_duplicates
        pa_, pb_ = ids[ai], ids[bi]
        flip = pb_ < pa_
        out = pd.DataFrame(
            {"id_a": np.where(flip, pb_, pa_),
             "id_b": np.where(flip, pa_, pb_)}
        )
        # dedupe within the bucket; the cross-bucket dedupe is the groupby
        # below (the same pair can fire in several bands -> several buckets)
        return out.drop_duplicates()

    # NOTE: the same pair can fire in several bands -> several buckets, so a
    # few duplicate pairs survive (within-bucket dedupe only).  Downstream
    # verification + components are insensitive to duplicate edges, and
    # skipping the global (id_a, id_b) dedupe saves one full shuffle.
    return (
        base.groupby("_bucket").map_groups(collect_pairs, batch_format="pandas")
    )


def verified_edges_inband(
    packed_sigs: ray.data.Dataset,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.8,
    coarse_buckets: int = 64,
    small_full: int = 16,
) -> ray.data.Dataset:
    """Candidate generation AND signature-Jaccard verification in ONE
    shuffle: each banded row carries its packed signature, so a (band,
    band_hash) group verifies its candidate pairs in place — no join
    round-trips (all-pairs for small groups, chain above: see
    ``minhash_candidate_pairs``).  Trades ×bands signature bytes through the
    shuffle for 2 fewer barriers; ``minhash_dedup(verify="joins")`` is the
    low-byte alternative."""
    base = _banded_rows(
        packed_sigs, id_col, bands, rows_per_band, coarse_buckets,
        carry_sig=True,
    )

    def collect_verify(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band", "band_hash"])[id_col].transform("size")
        g = g[sizes >= 2]
        if len(g) == 0:
            idt = g[id_col].dtype if id_col in g else np.int64
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=idt),
                 "id_b": pd.Series([], dtype=idt),
                 "sig_jaccard": pd.Series([], dtype=np.float64)}
            )
        # group-contiguous in (sig_digest, id) order — the SAME key the
        # joins path sorts by, so both verify modes emit identical pair
        # sets; digest runs collapse exactly as in the joins path
        g = g.sort_values(["band", "band_hash", "sig_digest", id_col],
                          kind="mergesort")
        S = np.frombuffer(
            b"".join(g["minhash"]), dtype=np.uint64
        ).reshape(len(g), -1)
        grp_of = (
            g.groupby(["band", "band_hash"], sort=False).ngroup().to_numpy()
        )
        ai, bi = _group_run_pair_indices(
            grp_of, g["sig_digest"].to_numpy(), g["band"].to_numpy(),
            small_full)
        sim = (S[ai] == S[bi]).mean(axis=1)
        ids = g[id_col].to_numpy()
        keep = sim >= threshold
        # normalize to (id_a < id_b) — see minhash_candidate_pairs
        pa_, pb_ = ids[ai[keep]], ids[bi[keep]]
        flip = pb_ < pa_
        out = pd.DataFrame(
            {"id_a": np.where(flip, pb_, pa_),
             "id_b": np.where(flip, pa_, pb_),
             "sig_jaccard": sim[keep]}
        )
        return out.drop_duplicates(["id_a", "id_b"])

    return (
        base.groupby("_bucket").map_groups(collect_verify, batch_format="pandas")
    )


def verify_pairs(
    pairs: ray.data.Dataset,
    packed_sigs: ray.data.Dataset,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distributed pair verification: join both endpoints' (binary-packed)
    signatures onto the pair list, score signature Jaccard (fraction of equal
    minhash perms) per pair vectorized, keep >= threshold.  No driver-side
    signature table.  (bucket_join, not Dataset.join: Acero rejects the
    binary payloads' sibling list types and empty hash partitions — see
    core/joins.py.)"""
    j = bucket_join(
        pairs, packed_sigs, on=["id_a"], right_on=[id_col], how="inner",
        num_buckets=num_buckets, left_cols=["id_a", "id_b"],
        right_cols=[id_col, "minhash"],
    )
    j = bucket_join(
        j, packed_sigs, on=["id_b"], right_on=[id_col], how="inner",
        num_buckets=num_buckets, right_suffix="_b",
        left_cols=["id_a", "id_b", "minhash"], right_cols=[id_col, "minhash"],
    )

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"id_a": t["id_a"], "id_b": t["id_b"],
                 "sig_jaccard": pa.array([], pa.float64())}
            )
        A = _sig_matrix(t["minhash"], len(t))
        B = _sig_matrix(t["minhash_b"], len(t))
        sim = (A == B).mean(axis=1)
        keep = sim >= threshold
        return pa.table(
            {
                "id_a": t["id_a"].filter(pa.array(keep)),
                "id_b": t["id_b"].filter(pa.array(keep)),
                "sig_jaccard": pa.array(sim[keep], pa.float64()),
            }
        )

    return j.map_batches(score, batch_format="pyarrow")


def connected_components(
    edges: ray.data.Dataset,
    num_buckets: int = 64,
    max_iters: int = 25,
) -> ray.data.Dataset:
    """Min-label propagation over an undirected edge list (id_a, id_b) ->
    (node, label) with label = the component's minimum id.  Each iteration is
    one neighbor-propagation join + one pointer-doubling join (label :=
    label-of-label) over the EDGE/LABEL sets (O(dup pairs), never O(corpus)),
    so convergence needs O(log diameter) rounds, not O(diameter) — a
    chain-shaped component of 10^6 hops converges in ~20 rounds.  Labels are
    materialized per round so the lineage does not grow with the iteration
    count.  Raises if ``max_iters`` rounds still leave changing labels
    (silent under-merging would under-drop duplicates)."""

    def fwd(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["id_a"], "dst": t["id_b"]})

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["id_b"], "dst": t["id_a"]})

    und = (
        edges.map_batches(fwd, batch_format="pyarrow")
        .union(edges.map_batches(rev, batch_format="pyarrow"))
        .materialize()
    )
    # node/label columns all carry the edge id type; threading it into every
    # bucket_join keeps buckets that receive no right rows concretely typed
    # (schema probe is free here — und is materialized)
    idt = und.schema().types[0]

    def init(t: pa.Table) -> pa.Table:
        lab = pc.if_else(
            pc.less(t["min(dst)"], t["src"]), t["min(dst)"], t["src"]
        )
        return pa.table({"node": t["src"], "label": lab})

    labels = (
        und.groupby("src").min("dst")
        .map_batches(init, batch_format="pyarrow")
        .materialize()
    )
    for _ in range(max_iters):
        msgs = bucket_join(
            und, labels, on=["src"], right_on=["node"], how="inner",
            num_buckets=num_buckets, left_cols=["src", "dst"],
            right_cols=["node", "label"], right_types=[idt, idt],
        )
        inc = msgs.groupby("dst").min("label")
        new = bucket_join(
            labels, inc, on=["node"], right_on=["dst"], how="left_outer",
            num_buckets=num_buckets, left_cols=["node", "label"],
            right_cols=["dst", "min(label)"], right_types=[idt, idt],
        )

        def upd(t: pa.Table) -> pa.Table:
            old = t["label"]
            # the left_outer pandas merge can surface unmatched int labels as
            # float64 (NaN padding); compare in the promoted type, then cast
            # back to the label's own type (ids are exact well past 2^52)
            m = t["min(label)"]
            lab = pc.if_else(
                pc.is_null(m), old, pc.if_else(pc.less(m, old), m, old)
            )
            lab = pc.cast(lab, old.type)
            return pa.table(
                {
                    "node": t["node"],
                    "label": lab,
                    "_chg": pc.cast(pc.less(lab, old), pa.int64()),
                }
            )

        # repartition BEFORE materializing: each join/groupby round multiplies
        # block count (~×4 with tiny blocks), so an unbounded loop explodes
        # into thousands of near-empty blocks whose task overhead grows the
        # per-round cost exponentially — coalescing to num_buckets blocks
        # keeps every round O(edge bytes / num_buckets) per task
        stepped = (
            new.map_batches(upd, batch_format="pyarrow")
            .repartition(num_buckets).materialize()
        )
        changed = stepped.sum("_chg")
        labels = stepped.drop_columns(["_chg"])
        if not changed:
            return labels
        # pointer doubling: label := min(label, label[label]).  label values
        # are themselves node ids present in ``labels``, so one self-join
        # shortcuts chains — min-label propagation alone needs O(diameter)
        # rounds, with this step O(log diameter).
        short = bucket_join(
            labels, labels, on=["label"], right_on=["node"], how="inner",
            num_buckets=num_buckets, right_suffix="_of",
            left_cols=["node", "label"], right_cols=["node", "label"],
            right_types=[idt, idt],
        )

        def jump(t: pa.Table) -> pa.Table:
            a, b = t["label"], t["label_of"]
            return pa.table(
                {"node": t["node"],
                 "label": pc.if_else(pc.less(b, a), b, a)}
            )

        labels = (
            short.map_batches(jump, batch_format="pyarrow")
            .repartition(num_buckets).materialize()
        )
    raise RuntimeError(
        f"connected_components: labels still changing after {max_iters} "
        "pointer-doubled rounds (component diameter > 2^"
        f"{max_iters}?) — raise max_iters"
    )


def minhash_dedup(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    num_buckets: int = 64,
    cc_local_threshold: int = 2_000_000,
    verify: str = "joins",
    small_full: int = 16,
) -> ray.data.Dataset:
    """Full near-dup pipeline: signature -> banded LSH candidates
    (all-pairs in small band groups, chain above)
    -> join-verified signature Jaccard -> connected components -> keep the
    min id per component, drop the rest.

    Scale design: the signature table and candidate pairs NEVER land on the
    driver — signatures are join-verified distributively (``verify_pairs``)
    and every intermediate is O(candidate pairs), which banding keeps
    near-linear in the true dup count.  Components run over the VERIFIED
    edge list (O(dup pairs), strictly smaller): union-find driver-side while
    it is provably small (``edges.count() <= cc_local_threshold``, a few MB
    — drops then broadcast once via ``ray.put``), distributed min-label
    propagation + anti-join beyond that (a dup-heavy 100 TB corpus).

    ``verify``: "joins" (default — signatures shuffled once, candidate
    pairs verified via two bucket joins; lowest total bytes), "inband"
    (signatures ride into the band groups and verify in place — ×bands
    shuffle bytes but 2 fewer barriers; faster when latency floors dominate,
    e.g. modest corpora on many cores), or "ngram" (candidates verified
    with EXACT word-``shingle_k``-gram Jaccard against the original texts —
    the Gopher/RefinedWeb-style exact-verify variant: sig-Jaccard estimation
    error cannot flip an edge, only banding recall remains probabilistic;
    costs two text joins instead of two signature joins)."""
    if verify not in ("joins", "inband", "ngram"):
        raise ValueError(f"unknown verify mode {verify!r}")
    rows_per_band = num_perm // bands
    packed = pack_signatures(
        minhash_signatures(ds, id_col, text_col, num_perm, shingle_k), id_col
    )
    if verify == "inband":
        edges = verified_edges_inband(
            packed, id_col, bands, rows_per_band, threshold,
            coarse_buckets=num_buckets, small_full=small_full,
        ).materialize()
    elif verify == "ngram":
        pairs = minhash_candidate_pairs(
            packed, id_col, bands, rows_per_band, coarse_buckets=num_buckets,
            small_full=small_full,
        )
        edges = ngram_verify_pairs(
            pairs, ds, id_col, text_col, shingle_k, threshold, num_buckets
        ).materialize()
    else:
        packed = packed.materialize()  # reused by candidates AND both joins
        pairs = minhash_candidate_pairs(
            packed, id_col, bands, rows_per_band, coarse_buckets=num_buckets,
            small_full=small_full,
        )
        edges = verify_pairs(
            pairs, packed, id_col, threshold, num_buckets
        ).materialize()
    return drop_component_dups(
        ds, edges, id_col, num_buckets, cc_local_threshold
    )


def local_cc_labels(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized min-label connected components over an in-memory edge list
    (no per-edge Python loop): compress ids to dense indices — np.unique
    sorts ascending, so the min label index IS the min id (numeric or
    lexicographic, same ``<`` as a union-find on raw ids) — then alternate
    edge-relax passes with pointer doubling; O(log diameter) rounds, each a
    handful of array ops over the edge list.

    Returns ``(nodes, lab)``: the sorted unique node ids and, per node, the
    dense INDEX of its component's minimum id (``nodes[lab]`` = min id)."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a):]
    lab = np.arange(len(nodes))
    while True:
        relaxed = lab.copy()
        np.minimum.at(relaxed, ea, lab[eb])
        np.minimum.at(relaxed, eb, lab[ea])
        while True:
            jumped = relaxed[relaxed]
            if np.array_equal(jumped, relaxed):
                break
            relaxed = jumped
        if np.array_equal(relaxed, lab):
            break
        lab = relaxed
    return nodes, lab


def drop_component_dups(
    ds: ray.data.Dataset,
    edges: ray.data.Dataset,
    id_col: str,
    num_buckets: int = 64,
    cc_local_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Keep the min id of every connected component of ``edges`` (a
    MATERIALIZED (id_a, id_b) dataset), drop the rest from ``ds``.

    Edge-count-gated: union-find driver-side while the edge list is provably
    small (it is O(dup pairs), never O(corpus); drops broadcast once via
    ``ray.put``), distributed min-label propagation + anti-join beyond."""
    n_edges = edges.count()
    if n_edges == 0:
        return ds

    if n_edges <= cc_local_threshold:
        epdf = edges.select_columns(["id_a", "id_b"]).to_pandas()
        nodes, lab = local_cc_labels(
            epdf["id_a"].to_numpy(), epdf["id_b"].to_numpy())
        # broadcast the drop list as a pandas Index: hash-based vectorized
        # membership per batch (a multi-million-entry drop set must never be
        # probed by a per-row Python loop in the hot filter)
        drop_idx = pd.Index(nodes[lab != np.arange(len(nodes))])
        drop_ref = ray.put(drop_idx)

        def filter_fn(t: pa.Table) -> pa.Table:
            d = ray.get(drop_ref)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            mask = ~pd.Index(ids).isin(d)
            return t.filter(pa.array(mask))

        return ds.map_batches(filter_fn, batch_format="pyarrow")

    labels = connected_components(edges, num_buckets)

    def drops_only(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["node"], t["label"])
        return pa.table({"_drop_id": t["node"].filter(keep)})

    drops = labels.map_batches(drops_only, batch_format="pyarrow")
    return bucket_join(
        ds, drops, on=[id_col], right_on=["_drop_id"], how="left_anti",
        num_buckets=num_buckets, right_cols=["_drop_id"],
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (uint8-view table lookup)."""
    return (
        _POP8[np.ascontiguousarray(x).view(np.uint8)]
        .reshape(len(x), 8)
        .sum(axis=1)
        .astype(np.int64)
    )


def _md5_lower64(words: np.ndarray) -> np.ndarray:
    """Lower 64 bits of md5(token) — bytes 8..16 of the digest read
    little-endian, bit-identical to DuckDB's ``md5_number_lower()`` (probed
    empirically: both give 10575884659879408057 for 'hello').  Hashes each
    DISTINCT token once (np.unique + inverse scatter), so cost scales with
    vocabulary, not token count."""
    import hashlib
    import struct

    uniq, inv = np.unique(words, return_inverse=True)
    hu = np.empty(len(uniq), dtype=np.uint64)
    unpack = struct.Struct("<Q").unpack_from
    for i, w in enumerate(uniq):
        hu[i] = unpack(hashlib.md5(w.encode("utf-8")).digest(), 8)[0]
    return hu[inv]


def simhash64(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "fast",
) -> ray.data.Dataset:
    """64-bit simhash over word unigrams (sign of per-bit weighted sums).
    Vectorized across the batch: one flat token-hash array, per-(doc, bit)
    vote accumulation — no per-document Python loop.

    ``hash_fn``: ``"fast"`` (default) hashes tokens with the vectorized
    ``pd.util.hash_array`` — the scale path.  ``"md5"`` uses the lower 64
    bits of md5, bit-identical to DuckDB ``md5_number_lower()``, making the
    whole fingerprint (and every survivor decision built on it) exactly
    reproducible in SQL — the oracle-gate mode, same role as
    ``minhash_dedup(verify="ngram")``.  Same algorithm either way; only the
    token-hash family differs."""
    assert hash_fn in ("fast", "md5"), hash_fn

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(t[text_col], "")
        toks = pc.split_pattern_regex(texts, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        keep = tok_len > 0
        rid = np.repeat(np.arange(len(t)), np.diff(offsets))[keep]
        kept = flat.filter(pa.array(keep))
        out = np.zeros(len(t), dtype=np.uint64)
        if len(kept):
            if hash_fn == "md5":
                words = np.asarray(
                    kept.to_numpy(zero_copy_only=False), dtype=object
                )
                h = _md5_lower64(words)
            else:
                h = hash_strings(kept)
            # votes[d, b] = (#tokens with bit b set) - (#without) per doc;
            # rid is nondecreasing (repeat(arange) then a mask), so docs are
            # CONTIGUOUS token segments: one unpackbits (1 byte/bit, C speed)
            # + one segment add.reduceat replaces the 64-wide uint64 shift
            # blowup + unbuffered np.add.at (measured 6x on 500k docs).
            # Byte/bit order: little-endian uint64 view + bitorder="little"
            # makes column b == bit b; guarded for exotic hosts.
            cnt = np.bincount(rid, minlength=len(t))
            seen = cnt > 0
            starts = np.concatenate(([0], np.cumsum(cnt)))[:-1][seen]
            if sys.byteorder == "little":
                bits = np.unpackbits(
                    h.reshape(-1, 1).view(np.uint8), axis=1, bitorder="little"
                )
            else:  # pragma: no cover - big-endian fallback, same values
                bits = (
                    (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
                ).astype(np.uint8)
            ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
            # votes > 0  <=>  2*ones > token count (ties stay 0-bit, as before)
            pos = (2 * ones) > cnt[seen, None]
            weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
            out[seen] = (pos.astype(np.uint64) * weights[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            # empty docs voted nowhere: all-zero rows stay 0 like before
        return pa.table({id_col: t[id_col], "simhash": pa.array(out, pa.uint64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_dedup(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    num_buckets: int = 64,
    cc_local_threshold: int = 2_000_000,
    small_full: int | None = 16,
    hash_fn: str = "fast",
) -> ray.data.Dataset:
    """SimHash near-dup removal with GUARANTEED candidate recall: the 64-bit
    fingerprint splits into ``bands`` equal bit-bands; a pair within
    ``max_hamming`` bit flips must (pigeonhole, for max_hamming < bands)
    share at least one intact band, so grouping by each band key finds every
    such pair.  Candidate pairs (all-pairs in small band groups, chain above
    — see ``_group_pair_indices``) carry both fingerprints (8 bytes — the
    cheap in-band verify), exact popcount Hamming filters them, connected
    components keep the min id per cluster (same machinery as
    minhash_dedup)."""
    assert max_hamming < bands, "recall guarantee needs max_hamming < bands"
    fps = simhash64(ds, id_col, text_col, hash_fn=hash_fn)
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    def explode(t: pa.Table) -> pa.Table:
        fp = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_ids, out_band, out_key, out_fp = [], [], [], []
        for b in range(bands):
            key = (fp >> np.uint64(b * width)) & mask
            out_ids.append(ids)
            out_band.append(np.full(len(t), b, dtype=np.int8))
            out_key.append(key)
            out_fp.append(fp)
        bcol = np.concatenate(out_band)
        kcol = np.concatenate(out_key)
        cell = bcol.astype(np.uint64) << np.uint64(48) | kcol
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_ids)),
                "band": pa.array(bcol, pa.int8()),
                "bkey": pa.array(kcol, pa.uint64()),
                "fp": pa.array(np.concatenate(out_fp), pa.uint64()),
                "_bucket": pa.array(
                    (cell * np.uint64(2654435761)) % np.uint64(num_buckets),
                    pa.uint64(),
                ),
            }
        )

    def collect_verify(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band", "bkey"])[id_col].transform("size")
        g = g[sizes >= 2]
        if len(g) == 0:
            idt = g[id_col].dtype if id_col in g else np.int64
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=idt),
                 "id_b": pd.Series([], dtype=idt)}
            )
        # pair edges in FINGERPRINT-sorted order within each band group:
        # a 16-bit band key collides across genuinely dissimilar texts, so
        # an id-sorted chain can interleave dissimilar members and break
        # every link even between EXACT duplicates (each link spans an
        # A-B boundary).  Sorting by fp first puts identical / numerically
        # close fingerprints adjacent; the full fingerprint doubles as the
        # RUN key (_group_run_pair_indices, same as minhash's signature
        # digest): fingerprint-identical members chain within their run
        # (ham = 0, always kept; one canonical band), runs pair via their
        # representatives — all-pairs up to small_full RUNS (None = ALWAYS
        # all-pairs: the verified edge set is then provably the complete
        # Hamming<=max_hamming graph — oracle-gate mode), so exact-copy
        # replication can neither push a group past the all-pairs floor
        # (under-merge) nor inflate the edge list (the minhash K=8 wall).
        g = g.sort_values(["band", "bkey", "fp", id_col], kind="mergesort")
        grp_of = g.groupby(["band", "bkey"], sort=False).ngroup().to_numpy()
        fp = g["fp"].to_numpy().astype(np.uint64)
        ai, bi = _group_run_pair_indices(
            grp_of, fp, g["band"].to_numpy(), small_full)
        ham = _popcount64(np.bitwise_xor(fp[ai], fp[bi]))
        ids = g[id_col].to_numpy()
        keep = ham <= max_hamming
        # normalize to (id_a < id_b) — see minhash_candidate_pairs
        pa_, pb_ = ids[ai[keep]], ids[bi[keep]]
        flip = pb_ < pa_
        return pd.DataFrame(
            {"id_a": np.where(flip, pb_, pa_),
             "id_b": np.where(flip, pa_, pb_)}
        ).drop_duplicates()

    edges = (
        fps.map_batches(explode, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(collect_verify, batch_format="pandas")
        .materialize()
    )
    return drop_component_dups(
        ds, edges, id_col, num_buckets, cc_local_threshold
    )


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


def _gram_hashes(texts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_id, gram_hash) pairs, distinct per row.  Rows with >= k words
    hash shifted word-hash k-tuples; shorter non-empty rows hash the
    joined string (a j<k-word gram can never string-equal a k-word gram,
    so the mixed encodings cannot create false matches)."""
    arr = pc.split_pattern_regex(
        pc.fill_null(pa.array(texts, pa.string()), ""), r"\s+"
    )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten()
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = tok_len > 0
    rid_all = np.repeat(np.arange(len(texts)), np.diff(offsets))
    kept = flat.filter(pa.array(keep))
    wh = hash_strings(kept)
    rid = rid_all[keep]
    nw = np.bincount(rid, minlength=len(texts))
    # contiguous per-row layout (already sorted by rid)
    rids_out, hashes_out = [], []
    longm = nw[rid] >= k
    if longm.any():
        lh, lr = wh[longm], rid[longm]
        cols = {f"h{s}": lh[s:len(lh) - (k - 1 - s)] for s in range(k)}
        same = lr[: len(lr) - (k - 1)] == lr[k - 1:]
        gh = pd.util.hash_pandas_object(
            pd.DataFrame(cols), index=False
        ).to_numpy().astype(np.uint64)
        rids_out.append(lr[: len(lr) - (k - 1)][same])
        hashes_out.append(gh[same])
    shortm = (nw > 0) & (nw < k)
    if shortm.any():
        srows = np.flatnonzero(shortm)
        # tokens are contiguous per row in the rid-sorted flat array:
        # slice by cumulative counts, no per-row rescans
        row_start = np.concatenate([[0], np.cumsum(nw)])
        wk = np.asarray(kept.to_numpy(zero_copy_only=False), dtype=object)
        joined = np.array(
            [" ".join(wk[row_start[r]:row_start[r + 1]]) for r in srows],
            dtype=object,
        )
        rids_out.append(srows)
        hashes_out.append(pd.util.hash_array(joined).astype(np.uint64))
    if not rids_out:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    rr = np.concatenate(rids_out)
    hh = np.concatenate(hashes_out)
    # distinct per row
    order = np.lexsort((hh, rr))
    rr, hh = rr[order], hh[order]
    first = np.empty(len(rr), dtype=bool)
    if len(rr):
        first[0] = True
        first[1:] = (rr[1:] != rr[:-1]) | (hh[1:] != hh[:-1])
    return rr[first], hh[first]


def _rowwise_jaccard(ta: np.ndarray, tb: np.ndarray, k: int) -> np.ndarray:
    """Exact word-k-gram Jaccard of aligned text pairs (ta[i] vs tb[i]),
    fully vectorized: per-(row, side) distinct gram hashes, then a single
    joint sort counting two-side matches."""
    n = len(ta)
    ra, ha = _gram_hashes(ta, k)
    rb, hb = _gram_hashes(tb, k)
    na = np.bincount(ra, minlength=n)
    nb = np.bincount(rb, minlength=n)
    # intersection: distinct per side, so a (row, hash) match appears as
    # one adjacent A/B pair after the joint sort
    rr = np.concatenate([ra, rb])
    hh = np.concatenate([ha, hb])
    side = np.concatenate(
        [np.zeros(len(ra), np.int8), np.ones(len(rb), np.int8)]
    )
    order = np.lexsort((side, hh, rr))
    rr, hh = rr[order], hh[order]
    if len(rr) > 1:
        dup = (rr[1:] == rr[:-1]) & (hh[1:] == hh[:-1])
        inter = np.bincount(rr[1:][dup], minlength=n)
    else:
        inter = np.zeros(n, dtype=np.int64)
    union = na + nb - inter
    return np.where(union == 0, 1.0, inter / np.where(union == 0, 1, union))


def pairwise_ngram_jaccard(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_buckets: int = 32,
    partner_offset: int = 1,
) -> ray.data.Dataset:
    """EXACT word-k-gram Jaccard for every ``(id, id+offset)`` pair — the
    distributed form of the ``ngram_jaccard`` verifier: pairs co-located by
    one bucket_join, similarity computed fully vectorized per batch
    (``_rowwise_jaccard``).  Output: (id_a, id_b, jaccard)."""

    def addp(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_partner", pc.add(t[id_col], partner_offset)
        )

    left = ds.map_batches(addp, batch_format="pyarrow")
    j = bucket_join(
        left, ds, on=["_partner"], right_on=[id_col], how="inner",
        num_buckets=num_buckets,
        left_cols=[id_col, text_col, "_partner"],
        right_cols=[id_col, text_col], right_suffix="_b",
    )
    idt = _probe_id_type(ds, id_col)

    def score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {"id_a": pa.array([], idt),
                 "id_b": pa.array([], idt),
                 "jaccard": pa.array([], pa.float64())}
            )
        ta = np.asarray(t[text_col].to_numpy(zero_copy_only=False), dtype=object)
        tb = np.asarray(
            t[text_col + "_b"].to_numpy(zero_copy_only=False), dtype=object
        )
        jac = _rowwise_jaccard(ta, tb, k)
        return pa.table(
            {
                "id_a": t[id_col],
                "id_b": t["_partner"],
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    # typed zero-row anchor: with no join matches (e.g. a 1-doc corpus) the
    # inner join yields NO blocks and the dataset would lose its schema
    anchor = ray.data.from_arrow(pa.table(
        {"id_a": pa.array([], idt), "id_b": pa.array([], idt),
         "jaccard": pa.array([], pa.float64())}
    ))
    return anchor.union(j.map_batches(score, batch_format="pyarrow"))


def ngram_verify_pairs(
    pairs: ray.data.Dataset,
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Verify candidate pairs with EXACT word-k-gram Jaccard (instead of the
    signature-Jaccard estimate): join both endpoints' texts onto the pair
    list (two bucket joins — same shape as ``verify_pairs``), score
    ``_rowwise_jaccard`` per batch, keep >= threshold.

    This is the Gopher/RefinedWeb-style "verify candidates exactly" dedup
    variant: the kept edge set is exactly {candidate pairs with true
    Jaccard >= threshold} — independent of the MinHash permutations, which
    only affect recall through candidate generation.  Output: (id_a, id_b,
    jaccard)."""
    j = bucket_join(
        pairs, ds, on=["id_a"], right_on=[id_col], how="inner",
        num_buckets=num_buckets, left_cols=["id_a", "id_b"],
        right_cols=[id_col, text_col],
    )
    j = bucket_join(
        j, ds, on=["id_b"], right_on=[id_col], how="inner",
        num_buckets=num_buckets, right_suffix="_b",
        left_cols=["id_a", "id_b", text_col],
        right_cols=[id_col, text_col],
    )
    idt = _probe_id_type(ds, id_col)

    def score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            # typed from the input's id dtype: a zero-pair coarse bucket
            # must not emit int64 ids next to non-int64 siblings (block
            # schema unification would fail for e.g. string doc ids)
            return pa.table(
                {"id_a": pa.array([], idt),
                 "id_b": pa.array([], idt),
                 "jaccard": pa.array([], pa.float64())}
            )
        ta = np.asarray(t[text_col].to_numpy(zero_copy_only=False), dtype=object)
        tb = np.asarray(
            t[text_col + "_b"].to_numpy(zero_copy_only=False), dtype=object
        )
        jac = _rowwise_jaccard(ta, tb, k)
        keep = jac >= threshold
        m = pa.array(keep)
        return pa.table(
            {
                "id_a": t["id_a"].filter(m),
                "id_b": t["id_b"].filter(m),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return j.map_batches(score, batch_format="pyarrow")


def embedding_neardup(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 3,
    reps: int = 4,
    max_bucket: int = 4096,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Cosine near-duplicate pairs via BANDED random-hyperplane LSH.

    ``reps`` independent ``n_planes``-bit sign codes per vector (planes drawn
    ONCE here, captured by the batch fn — not regenerated per batch); a pair
    is a candidate if it collides in ANY rep, so near-dups straddling one
    hyperplane are recovered by another rep (recall ~ 1-(1-p^n)^reps vs the
    single-code p^n).  Exact cosine verification inside each (rep, code)
    cell, with an overflow guard: cells larger than ``max_bucket`` split
    recursively on additional deterministic hyperplanes, so no cell ever
    does more than O(max_bucket^2) work — a hot cell at corpus scale can no
    longer trigger an all-pairs blowup (pairs crossing an overflow split may
    be missed in that rep; other reps compensate).  Duplicate hits across
    reps are reduced by a final (id_a, id_b) groupby.  Output: (id_a, id_b,
    cosine), id_a < id_b."""
    rngs = np.random.default_rng(seed)
    plane_seeds = rngs.integers(0, 2**31, size=reps)

    def _planes(rep_seed: int, dim: int, n: int) -> np.ndarray:
        return np.random.default_rng(int(rep_seed)).normal(size=(dim, n))

    planes_cache: dict = {}

    def bucket(t: pa.Table) -> pa.Table:
        col = t[vec_col]
        try:  # list / fixed_size_list: zero-copy flatten
            vecs = np.asarray(
                col.combine_chunks().flatten()
            ).reshape(len(t), -1).astype(np.float64)
        except AttributeError:  # Ray tensor extension (pandas round-trips)
            vecs = np.stack(
                list(col.to_numpy(zero_copy_only=False))
            ).reshape(len(t), -1).astype(np.float64)
        dim = vecs.shape[1]
        ids_out, vec_idx, rep_out, code_out = [], [], [], []
        ids = t[id_col].to_numpy(zero_copy_only=False)
        for rep in range(reps):
            key = (rep, dim)
            if key not in planes_cache:
                planes_cache[key] = _planes(plane_seeds[rep], dim, n_planes)
            signs = (vecs @ planes_cache[key]) > 0
            code = np.zeros(len(vecs), dtype=np.uint32)
            for j in range(n_planes):
                code |= signs[:, j].astype(np.uint32) << np.uint32(j)
            ids_out.append(ids)
            vec_idx.append(np.arange(len(vecs)))
            rep_out.append(np.full(len(vecs), rep, dtype=np.int16))
            code_out.append(code)
        rep_all = np.concatenate(rep_out)
        code_all = np.concatenate(code_out)
        cell = rep_all.astype(np.uint64) << np.uint64(32) | code_all
        vecs_rep = vecs[np.concatenate(vec_idx)]
        flat = pa.array(vecs_rep.reshape(-1), pa.float64())
        return pa.table(
            {
                id_col: pa.array(np.concatenate(ids_out)),
                vec_col: pa.FixedSizeListArray.from_arrays(flat, dim),
                "rep": pa.array(rep_all, pa.int16()),
                "code": pa.array(code_all, pa.uint32()),
                # coarse Ray shuffle bucket; exact (rep, code) grouping is
                # vectorized inside each fat bucket
                "_bucket": pa.array(
                    (cell * np.uint64(2654435761)) % np.uint64(num_buckets),
                    pa.uint64(),
                ),
            }
        )

    def _emit_cell(ids, V, rep, depth, out):
        if len(ids) < 2:
            return
        if len(ids) > max_bucket:
            if depth >= 20:
                # unsplittable cell (e.g. many IDENTICAL vectors agree with
                # every extra plane): star edges to the min id — O(n), and
                # exactly what a dedup consumer needs (connects the cluster)
                order = np.argsort(ids)
                ids_s, V_s = ids[order], V[order]
                sims = V_s[1:] @ V_s[0]
                keep = sims >= threshold
                out.append(
                    (np.full(int(keep.sum()), ids_s[0]), ids_s[1:][keep],
                     sims[keep])
                )
                return
            # overflow: deterministic extra hyperplane, recurse both halves
            dim = V.shape[1]
            extra = _planes(
                (int(plane_seeds[rep]) * 1000003 + depth + 1) % (2**31),
                dim, 1,
            )[:, 0]
            side = (V @ extra) > 0
            if side.all() or (~side).all():
                _emit_cell(ids, V, rep, depth + 20, out)  # force star path
                return
            _emit_cell(ids[side], V[side], rep, depth + 1, out)
            _emit_cell(ids[~side], V[~side], rep, depth + 1, out)
            return
        sim = V @ V.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sim[ia, ib] >= threshold
        a, b = ids[ia[keep]], ids[ib[keep]]
        out.append((np.minimum(a, b), np.maximum(a, b), sim[ia[keep], ib[keep]]))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out: list = []
        for (rep, _code), sub in g.groupby(["rep", "code"], sort=False):
            if len(sub) < 2:
                continue
            ids = sub[id_col].to_numpy()
            V = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
            _emit_cell(ids, V, int(rep), 0, out)
        if not out:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=np.int64),
                 "id_b": pd.Series([], dtype=np.int64),
                 "cosine": pd.Series([], dtype=np.float64)}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate([o[0] for o in out]),
             "id_b": np.concatenate([o[1] for o in out]),
             "cosine": np.concatenate([o[2] for o in out])}
        )

    hits = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
    )

    # a pair colliding in several reps appears once per rep: reduce to the
    # max cosine per pair.  Same coarse-bucket combine as winnow_matches
    # (stages/text.py): Ray's sort-based multi-key Aggregate pays per-key
    # Python overhead on what can be a large pair table; an int32 pair-hash
    # groupby + one vectorized pandas max inside each group is exact and
    # orders of magnitude cheaper.
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_pb", pa.array([], pa.int32()))
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = a * np.uint64(0x9E3779B97F4A7C15) ^ b
        pb = (mixed % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("_pb", pa.array(pb, pa.int32()))

    def max_pairs(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        red = (
            pd.DataFrame({
                "id_a": g["id_a"].to_numpy(zero_copy_only=False),
                "id_b": g["id_b"].to_numpy(zero_copy_only=False),
                "cosine": g["cosine"].to_numpy(zero_copy_only=False),
            })
            .groupby(["id_a", "id_b"], sort=False)["cosine"].max()
            .reset_index()
        )
        return pa.table(
            {"id_a": pa.array(red["id_a"].to_numpy(), pa.int64()),
             "id_b": pa.array(red["id_b"].to_numpy(), pa.int64()),
             "cosine": pa.array(red["cosine"].to_numpy(), pa.float64())}
        )

    # Ray drops empty blocks (a zero-hit corpus would lose the schema
    # through the groupby): union a typed empty seed — no-op otherwise
    seed = ray.data.from_arrow(pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    ))
    return (
        hits.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(max_pairs, batch_format="pyarrow")
        .union(seed)
    )
