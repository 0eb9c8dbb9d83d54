"""Text-analysis stages over the ``documents`` table (engine extensions for
training-data pipelines; SURVEY.md extension scope).

All stateful setup (compiled regexes, stopword sets, language n-gram
profiles) lives in actor ``__init__`` — the reference's only once-per-worker
pattern is its notebook model load (ESM_embed.ipynb cell 2); these stages
follow the same actor-pool shape at trivial cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from protein_feature_engineering_ray.core.strhash import hash_strings

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "des", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "del", "que"},
}


def _tokens_flat(texts: pa.ChunkedArray | pa.Array, pattern: str):
    """Split every text by ``pattern``; return (flat tokens, row offsets).

    One Arrow kernel call for the whole batch — the flat token array plus
    int offsets is the segment-vectorized layout every downstream stat
    (counts, lengths, memberships) reduces over with numpy, no Python row
    loop."""
    toks = pc.split_pattern_regex(texts, pattern)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks.flatten(), toks.offsets.to_numpy(zero_copy_only=False)


def _set_column(t: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    """Overwrite-or-append (matches the pandas assignment the actors had)."""
    if name in t.schema.names:
        return t.set_column(t.schema.get_field_index(name), name, arr)
    return t.append_column(name, arr)


def _segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum ``values`` within each [offsets[i], offsets[i+1]) segment."""
    c = np.concatenate([[0], np.cumsum(values, dtype=np.float64)])
    return c[offsets[1:]] - c[offsets[:-1]]


def _distinct_per_row(h: np.ndarray, rid: np.ndarray, n_rows: int) -> np.ndarray:
    """Count distinct hash values per row id (sort + transition count)."""
    if len(h) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    order = np.lexsort((h, rid))
    hs, rs = h[order], rid[order]
    new = np.empty(len(hs), dtype=bool)
    new[0] = True
    new[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
    return np.bincount(rs[new], minlength=n_rows)


class TextQuality:
    """Quality-scoring actor: token counts, char classes, stopword ratio,
    repetition.  Fully vectorized: Arrow regex kernels produce a flat token
    array + offsets per batch; every stat is a numpy segment reduction.
    Stopword hash set built once per actor."""

    WORD_SPLIT = r"[^A-Za-z0-9_']+"  # complement of the word class

    def __init__(self):
        self.stop_en_h = pd.util.hash_array(
            np.asarray(sorted(_STOPWORDS["en"]), dtype=object)
        ).astype(np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t["text"], "")
        n = len(t)
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        flat, offsets = _tokens_flat(texts, self.WORD_SPLIT)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        nonempty = tok_len > 0  # split artifacts at string boundaries
        n_words = _segment_sum(nonempty, offsets).astype(np.int64)
        sum_len = _segment_sum(tok_len, offsets)  # empties add 0
        denom_w = np.maximum(n_words, 1)
        n_punct = pc.count_substring_regex(texts, r"[.,;:!?]").to_numpy(
            zero_copy_only=False
        )
        lower_h = hash_strings(pc.utf8_lower(flat))
        is_stop = np.isin(lower_h, self.stop_en_h) & nonempty
        n_stop = _segment_sum(is_stop, offsets)
        rid = np.repeat(np.arange(n), np.diff(offsets))
        n_uniq = _distinct_per_row(lower_h[nonempty], rid[nonempty], n)
        out = t
        for name, arr in (
            ("n_chars", pa.array(n_chars.astype(np.int64), pa.int64())),
            ("n_words", pa.array(n_words, pa.int64())),
            ("avg_word_len", pa.array(sum_len / denom_w, pa.float64())),
            ("punct_ratio",
             pa.array(n_punct / np.maximum(n_chars, 1), pa.float64())),
            ("stopword_ratio", pa.array(n_stop / denom_w, pa.float64())),
            ("uniq_word_ratio",
             pa.array(n_uniq / denom_w, pa.float64())),
        ):
            out = _set_column(out, name, arr)
        return out


def text_quality(ds: ray.data.Dataset, concurrency: int = 4,
                 batch_size: int = 4096) -> ray.data.Dataset:
    return ds.map_batches(
        TextQuality, batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size,
    )


# GPT-2-style pre-tokenizer pattern WITHOUT lookahead (RE2 has none — and
# RE2 is exactly what both Arrow's count_substring_regex and DuckDB's
# regexp_extract_all run, so one pattern string gives identical counts in
# the engine and the SQL oracle): contraction suffixes, optional-space
# letter runs, digit runs, punctuation runs, whitespace runs.
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Token counts — exact, SQL-oracle-friendly (stateless arrow):
    ``n_tokens`` (whitespace tokens) and ``n_bpe_tokens`` (BPE-ish GPT-2
    pre-tokenizer segments via ``BPE_ISH_PATTERN`` — the usual
    budget/pricing proxy when the real tokenizer is not on the cluster)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t[text_col], "")
        toks = pc.list_value_length(pc.split_pattern_regex(texts, r"\s+"))
        bpe = pc.count_substring_regex(texts, BPE_ISH_PATTERN)
        t = t.append_column("n_tokens", toks.cast(pa.int64()))
        return t.append_column("n_bpe_tokens", bpe.cast(pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


class LangId:
    """Language-ID actor: stopword-overlap heuristic over the 4 profiled
    languages ('zh' by CJK codepoint share, 'und' when no signal).
    Vectorized: one CJK regex count per batch, whitespace tokens flattened
    once, per-language DISTINCT-stopword overlap via hash membership +
    segment reduction.  Profile hash sets built once per actor."""

    LANGS = tuple(_STOPWORDS)  # tie-break order matches dict iteration

    def __init__(self):
        self.prof_h = [
            np.unique(
                pd.util.hash_array(
                    np.asarray(sorted(_STOPWORDS[lang]), dtype=object)
                ).astype(np.uint64)
            )
            for lang in self.LANGS
        ]

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t["text"], "")
        n = len(t)
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        cjk = pc.count_substring_regex(texts, r"[一-鿿]").to_numpy(
            zero_copy_only=False
        )
        flat, offsets = _tokens_flat(pc.utf8_lower(texts), r"\s+")
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        nonempty = tok_len > 0
        h = hash_strings(flat)
        rid = np.repeat(np.arange(n), np.diff(offsets))
        # distinct (row, word) pairs once; then per-language membership sums
        hh, rr = h[nonempty], rid[nonempty]
        if len(hh):
            order = np.lexsort((hh, rr))
            hs, rs = hh[order], rr[order]
            first = np.empty(len(hs), dtype=bool)
            first[0] = True
            first[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
            hs, rs = hs[first], rs[first]
        else:
            hs = np.empty(0, dtype=np.uint64)
            rs = np.empty(0, dtype=np.int64)
        scores = np.zeros((n, len(self.LANGS)), dtype=np.int64)
        for li, ph in enumerate(self.prof_h):
            m = np.isin(hs, ph)
            if m.any():
                scores[:, li] = np.bincount(rs[m], minlength=n)
        best = scores.argmax(axis=1)  # first max wins = dict-order tie-break
        pred = np.asarray(self.LANGS, dtype=object)[best]
        pred[scores.max(axis=1) == 0] = "und"
        pred[cjk / np.maximum(n_chars, 1) > 0.05] = "zh"
        pred[n_chars == 0] = "und"
        return _set_column(t, "lang_pred", pa.array(pred, pa.string()))


def lang_id(ds: ray.data.Dataset, concurrency: int = 4) -> ray.data.Dataset:
    return ds.map_batches(LangId, batch_format="pyarrow",
                          concurrency=concurrency)


class TextProfile:
    """Fused quality + language-ID actor: one pool, one batch pass, instead
    of two chained pools each paying actor spin-up and a separate scan of
    the text column.  Output = TextQuality columns + lang_pred, identical to
    ``lang_id(text_quality(ds))``."""

    def __init__(self):
        self.quality = TextQuality()
        self.langid = LangId()

    def __call__(self, t: pa.Table) -> pa.Table:
        return self.langid(self.quality(t))


# one profile per WORKER PROCESS for the task-based path: Ray reuses
# worker processes across tasks, so the (cheap) regex/stopword state
# amortizes exactly like an actor's __init__ — without paying actor-pool
# spawn latency on every pipeline execution
_PROFILE_CACHE: TextProfile | None = None


def _profile_batch(t: pa.Table) -> pa.Table:
    global _PROFILE_CACHE
    if _PROFILE_CACHE is None:
        _PROFILE_CACHE = TextProfile()
    return _PROFILE_CACHE(t)


def text_profile(ds: ray.data.Dataset, concurrency=None,
                 batch_size: int = 4096) -> ray.data.Dataset:
    """Fused quality + language-ID profile.

    ``concurrency=None`` (default) runs as PLAIN TASKS with a module-cached
    profile per worker process: the stage's state (compiled regexes +
    stopword hash sets) is cheap, so an actor pool's spawn latency buys
    nothing — actor pools are for EXPENSIVE state (models: stages/embed).
    Measured at sf0.1 (5k docs, 32 cpus): 1.08 s pooled -> ~0.3 s as
    tasks, identical output.  Pass an int/tuple to force the actor-pool
    form (autoscaling, explicit pool sizing)."""
    if concurrency is None:
        return ds.map_batches(
            _profile_batch, batch_format="pyarrow", batch_size=batch_size)
    return ds.map_batches(
        TextProfile, batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size,
    )


def _winnow_segments(h: np.ndarray, offsets: np.ndarray, k: int, window: int):
    """Winnowing fingerprints over per-document token-hash segments.

    For each document (a segment of ``h``): polynomial rolling hash of
    every k-gram of token hashes, then the MINIMUM VALUE of each sliding
    window of ``window`` consecutive k-gram hashes (the winnowing scheme;
    the output is the deduplicated value set, so intra-window tie position
    is irrelevant).  Guarantees every shared substring of at least
    k+window-1 tokens contributes at least one IDENTICAL fingerprint to
    both documents — the matching property a whole-document content hash
    cannot give.  A document with at least k tokens but fewer than
    k+window-1 emits its single minimum gram, so every k-token-or-longer
    document is fingerprinted.

    Fully vectorized: one k-gram pass over the flat hash array (documents
    shorter than k simply contribute no grams), one sliding-window-view
    minimum, boundary grams masked out per segment.  Returns
    (row_ids, fingerprints) arrays.
    """
    n = len(h)
    n_rows = len(offsets) - 1
    if n < k:
        return (np.empty(0, np.int64), np.empty(0, np.uint64))
    # rolling polynomial hash over k consecutive token hashes
    B = np.uint64(1099511628211)  # FNV prime as the base
    gram = np.zeros(n - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):  # k is tiny (4-8); the array op is the hot axis
            gram = gram * B + h[j:n - k + 1 + j]
    # gram i spans tokens [i, i+k); valid iff entirely inside one segment
    seg_of = np.repeat(np.arange(n_rows), np.diff(offsets))
    valid = seg_of[: n - k + 1] == seg_of[k - 1:]
    rid_parts = [np.empty(0, np.int64)]
    fp_parts = [np.empty(0, np.uint64)]
    if window <= 1:
        rid_parts.append(seg_of[: n - k + 1][valid].astype(np.int64))
        fp_parts.append(gram[valid])
    else:
        # sliding-window minimum; windows that straddle a segment boundary
        # are dropped (first and last covered token must share a segment —
        # segments are contiguous, so that implies every gram inside is
        # valid too)
        g = np.where(valid, gram, np.uint64(0xFFFFFFFFFFFFFFFF))
        if len(g) >= window:
            sw = np.lib.stride_tricks.sliding_window_view(g, window)
            win_min = sw.min(axis=1)
            first = seg_of[: len(win_min)]
            last = seg_of[window + k - 2: window + k - 2 + len(win_min)]
            keep = first == last
            rid_parts.append(first[keep].astype(np.int64))
            fp_parts.append(win_min[keep])
        # short-document fallback: a segment with >=1 valid gram but fewer
        # than `window` grams gets its minimum gram (per-segment reduceat
        # over ALL gram segments, then select the short ones — reducing
        # over short starts alone would span the segments in between)
        n_grams = np.bincount(seg_of[: n - k + 1][valid], minlength=n_rows)
        if ((n_grams > 0) & (n_grams < window)).any():
            v_rid = seg_of[: n - k + 1][valid]  # already non-decreasing
            v_gram = gram[valid]
            u_rid, u_starts = np.unique(v_rid, return_index=True)
            mins_all = np.minimum.reduceat(v_gram, u_starts)
            sel = n_grams[u_rid] < window
            rid_parts.append(u_rid[sel].astype(np.int64))
            fp_parts.append(mins_all[sel])
    rid = np.concatenate(rid_parts)
    fp = np.concatenate(fp_parts)
    if len(rid) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.uint64))
    # distinct (rid, fp) rows, lexicographically sorted — a two-key lexsort
    # + boundary dedup is ~5x np.unique(axis=0)'s void-view row sort
    order = np.lexsort((fp, rid))
    rs, fs = rid[order], fp[order]
    keep = np.ones(len(rs), dtype=bool)
    keep[1:] = (rs[1:] != rs[:-1]) | (fs[1:] != fs[:-1])
    return (rs[keep].astype(np.int64), fs[keep])


def winnow_fingerprints(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, window: int = 4,
) -> ray.data.Dataset:
    """Rolling-hash document fingerprints (winnowing) — one output row per
    distinct (doc, fingerprint).  Stateless Arrow+numpy map; at 100 TB the
    output is a fingerprint table you co-locate by fingerprint (coarse
    buckets) to find cross-document substring matches, the same shuffle
    discipline as minhash band buckets."""

    def fn(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t[text_col], "")
        flat, offsets = _tokens_flat(pc.utf8_lower(texts), r"\s+")
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        h = hash_strings(flat)
        # drop split artifacts ("" tokens) and rebuild offsets
        nonempty = tok_len > 0
        rid_all = np.repeat(np.arange(len(t)), np.diff(offsets))
        h2, rid2 = h[nonempty], rid_all[nonempty]
        counts = np.bincount(rid2, minlength=len(t))
        off2 = np.concatenate([[0], np.cumsum(counts)])
        rid, fp = _winnow_segments(h2, off2, k, window)
        ids = t[id_col].take(pa.array(rid, pa.int64()))
        return pa.table({id_col: ids,
                         "fingerprint": pa.array(fp, pa.uint64())})

    return ds.map_batches(fn, batch_format="pyarrow")


@ray.remote(num_cpus=0)
class _WinnowDropActor:
    def __init__(self):
        self.fingerprints = 0
        self.doc_slots = 0

    def add(self, fingerprints: int, doc_slots: int) -> None:
        self.fingerprints += fingerprints
        self.doc_slots += doc_slots

    def value(self) -> dict:
        return {"dropped_fingerprints": self.fingerprints,
                "dropped_doc_slots": self.doc_slots}


class WinnowDropStats:
    """Side channel for ``winnow_matches``' hot-fingerprint cap (the repo's
    no-silent-caps rule): pass an instance as ``drop_stats=`` and read
    ``.value()`` AFTER consuming the matches dataset.  ``dropped_fingerprints``
    counts distinct fingerprints shared by more than ``max_group`` documents
    (exact: a fingerprint lands in exactly one bucket); ``dropped_doc_slots``
    is the total (doc, fingerprint) rows those hot fingerprints covered.
    Counts can over-state under Ray task RETRIES (a re-executed bucket adds
    again) — they are a visibility stat, not a ledger."""

    def __init__(self):
        self._actor = _WinnowDropActor.remote()

    def value(self) -> dict:
        return ray.get(self._actor.value.remote())


def winnow_matches(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, window: int = 4, min_shared: int = 2,
    num_buckets: int = 64, max_group: int = 256,
    drop_stats: WinnowDropStats | None = None,
    fingerprints: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Cross-document substring matches via winnowing fingerprints:
    (id_a, id_b, n_shared) for unordered doc pairs sharing at least
    ``min_shared`` fingerprints (id_a < id_b).

    Shuffle discipline: fingerprints are co-located by a COARSE hash bucket
    (one Ray group per ~fingerprint-space/num_buckets, never one group per
    fingerprint — the minhash lesson), pairs are emitted vectorized inside
    each bucket (rank/offset arithmetic, no per-group Python loop), and the
    pair counts aggregate with a tiny groupby.  A fingerprint shared by
    more than ``max_group`` documents is dropped instead of emitting O(m²)
    pairs — at corpus scale such a fingerprint is a boilerplate shingle
    with no matching value (the same hot-key cap as the LSH band buckets).
    The cap is LOUD: every affected bucket logs a warning, and passing
    ``drop_stats=WinnowDropStats()`` tallies exactly how many fingerprints
    and (doc, fingerprint) slots the cap removed; raise ``max_group`` if
    you need those pairs.  Document ids must be orderable (the output
    orients id_a < id_b); the id dtype is preserved from the input,
    including on a corpus with ZERO matching pairs (the empty result is
    rebuilt with the probed id type).

    ``fingerprints``: a precomputed ``winnow_fingerprints``-shaped dataset
    ((id, fingerprint) rows) to match on instead of re-tokenizing ``ds`` —
    reuse one fingerprint table across several match configurations, or
    feed synthetically replicated fingerprints (bench).
    """
    fps = fingerprints if fingerprints is not None else winnow_fingerprints(
        ds, text_col=text_col, id_col=id_col, k=k, window=window)
    # probe the id dtype ONCE from the fingerprint stage's Arrow schema (a
    # limit-1 sample execution, ~0.1 s) so empty results — Ray's empty
    # aggregate otherwise types id columns int64 — mirror the real schema
    idt = pa.int64()
    try:
        sch = fps.schema()
        probed = dict(zip(sch.names, sch.types)).get(id_col)
        if isinstance(probed, pa.DataType):
            idt = probed
    except Exception:
        pass
    drop_actor = drop_stats._actor if drop_stats is not None else None

    def add_bucket(t: pa.Table) -> pa.Table:
        fp = t["fingerprint"].to_numpy(zero_copy_only=False)
        b = (fp % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("_fb", pa.array(b, pa.int32()))

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            # column-less empty group (only on an empty input dataset)
            return pa.table({"id_a": pa.array([], idt),
                             "id_b": pa.array([], idt),
                             "n_shared": pa.array([], pa.int64())})
        id_type = g.schema.field(id_col).type
        fp = g["fingerprint"].to_numpy(zero_copy_only=False)
        ids = np.asarray(g[id_col].to_numpy(zero_copy_only=False))

        def _empty():
            return pa.table({"id_a": pa.array([], id_type),
                             "id_b": pa.array([], id_type),
                             "n_shared": pa.array([], pa.int64())})

        # sort by (fp, id): deterministic id_a < id_b within each group
        # (a doc emits each fingerprint at most once, so no equal-id pairs)
        order = np.lexsort((ids, fp))
        fp, ids = fp[order], ids[order]
        new_grp = np.empty(len(fp), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = fp[1:] != fp[:-1]
        grp_of = np.cumsum(new_grp) - 1
        sizes = np.bincount(grp_of)
        hot = sizes > max_group
        if hot.any():
            n_fp = int(hot.sum())
            n_slots = int(sizes[hot].sum())
            import logging

            logging.getLogger(__name__).warning(
                "winnow_matches hot-fingerprint cap: dropped %d "
                "fingerprint(s) covering %d (doc, fingerprint) slot(s) in "
                "this bucket (max_group=%d)", n_fp, n_slots, max_group)
            if drop_actor is not None:
                # synchronous: consuming the matches dataset must imply the
                # counter saw every bucket's add (a fire-and-forget .remote
                # races with a .value() read right after to_pandas); hot
                # buckets are rare so the blocking round-trip is noise
                ray.get(drop_actor.add.remote(n_fp, n_slots))
        keep = (sizes[grp_of] >= 2) & (sizes[grp_of] <= max_group)
        if not keep.any():
            return _empty()
        ids = ids[keep]
        grp_of = grp_of[keep]
        # all (i<j) pairs per group, fully vectorized: element at local rank
        # r pairs with its r predecessors — b side repeats the element r
        # times, a side is the group's first r elements (rank/offset trick)
        dense = np.cumsum(np.concatenate([[True], grp_of[1:] != grp_of[:-1]])) - 1
        gstart = np.concatenate([[0], np.flatnonzero(dense[1:] != dense[:-1]) + 1])
        rank = np.arange(len(ids)) - gstart[dense]
        total = int(rank.sum())
        if total == 0:
            return _empty()
        b = np.repeat(ids, rank)
        pre = np.cumsum(rank) - rank
        within = np.arange(total) - np.repeat(pre, rank)
        a = ids[np.repeat(gstart[dense], rank) + within]
        pdf = pd.DataFrame({"id_a": a, "id_b": b})
        cnt = pdf.groupby(["id_a", "id_b"], sort=False).size().reset_index(
            name="n_shared")
        return pa.table({
            "id_a": pa.Array.from_pandas(cnt["id_a"], type=id_type),
            "id_b": pa.Array.from_pandas(cnt["id_b"], type=id_type),
            "n_shared": pa.array(cnt["n_shared"].to_numpy(), pa.int64()),
        })

    per_bucket = (
        fps.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(pairs, batch_format="pyarrow")
    )

    # a pair's fingerprints spread across fingerprint buckets, so the
    # per-bucket counts need one cross-bucket sum keyed on (id_a, id_b).
    # Ray's multi-key Aggregate is sort-based with per-key Python overhead
    # (~30 s of CPU on a 600k-pair stress corpus); the same coarse-bucket
    # discipline as the fingerprint side — int32 pair-hash groupby + a
    # vectorized pandas combine inside each group — sums the same rows two
    # orders of magnitude faster.
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_pb", pa.array([], pa.int32()))
        # ids are any orderable dtype (ints here, strings allowed):
        # pd.util.hash_array gives a stable uint64 for either — stability
        # only matters within this one job (partitioning key, never output)
        ha = pd.util.hash_array(
            np.asarray(t["id_a"].to_numpy(zero_copy_only=False)))
        hb = pd.util.hash_array(
            np.asarray(t["id_b"].to_numpy(zero_copy_only=False)))
        mixed = ha * np.uint64(0x9E3779B97F4A7C15) ^ hb
        pb = (mixed % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("_pb", pa.array(pb, pa.int32()))

    def sum_pairs(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.table({"id_a": pa.array([], idt),
                             "id_b": pa.array([], idt),
                             "n_shared": pa.array([], pa.int64())})
        id_type = g.schema.field("id_a").type
        cnt = (
            pd.DataFrame({
                "id_a": g["id_a"].to_numpy(zero_copy_only=False),
                "id_b": g["id_b"].to_numpy(zero_copy_only=False),
                "n_shared": g["n_shared"].to_numpy(zero_copy_only=False),
            })
            .groupby(["id_a", "id_b"], sort=False)["n_shared"].sum()
            .reset_index()
        )
        return pa.table({
            "id_a": pa.Array.from_pandas(cnt["id_a"], type=id_type),
            "id_b": pa.Array.from_pandas(cnt["id_b"], type=id_type),
            "n_shared": pa.array(cnt["n_shared"].to_numpy(), pa.int64()),
        })

    total = (
        per_bucket.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(sum_pairs, batch_format="pyarrow")
    )

    def fin(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            # empty block: rebuild with the probed id type so empty and
            # non-empty results share one schema
            return pa.table({"id_a": pa.array([], idt),
                             "id_b": pa.array([], idt),
                             "n_shared": pa.array([], pa.int64())})
        keep = pc.greater_equal(t["n_shared"], min_shared)
        t = t.filter(keep)
        return pa.table({"id_a": t["id_a"].cast(idt), "id_b": t["id_b"].cast(idt),
                         "n_shared": t["n_shared"]})

    # Ray DROPS empty blocks outright (map_batches never runs on them and an
    # all-empty pipeline materializes with schema None), so a zero-match
    # corpus would lose the output schema entirely.  Union a typed empty
    # seed block: a no-op for non-empty results, and the schema anchor —
    # with the probed id dtype — for empty ones.
    seed = ray.data.from_arrow(pa.table({
        "id_a": pa.array([], idt), "id_b": pa.array([], idt),
        "n_shared": pa.array([], pa.int64()),
    }))
    return total.map_batches(fin, batch_format="pyarrow").union(seed)


def fingerprint(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic 64-bit document fingerprint (stable content hash) —
    the exact-dedup / idempotent-re-ingest key."""

    def fn(t: pa.Table) -> pa.Table:
        h = hash_strings(t[text_col])
        return pa.table(
            {id_col: t[id_col], "fingerprint": pa.array(h, pa.uint64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- repetition / scrub profiles (training-data filter signals) ------------

def _max_per_row(rid: np.ndarray, h: np.ndarray, n_rows: int) -> np.ndarray:
    """Highest multiplicity of any single hash value within each row id
    (the "top n-gram count" of Gopher-style repetition filters).  Sort by
    (rid, h), collapse equal runs to (row, count) pairs, scatter-max."""
    out = np.zeros(n_rows, dtype=np.int64)
    if len(h) == 0:
        return out
    order = np.lexsort((h, rid))
    hs, rs = h[order], rid[order]
    new = np.empty(len(hs), dtype=bool)
    new[0] = True
    new[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
    gid = np.cumsum(new) - 1
    run = np.bincount(gid)
    np.maximum.at(out, rs[new], run)
    return out


def _repetition_batch(t: pa.Table, text_col: str) -> pa.Table:
    """Per-document repetition signals (Gopher/MassiveText-style quality
    rules: Rae et al. 2021 §A1.1 — duplicate-line fraction, top n-gram
    fraction, duplicate n-gram fraction; count-based variants here so every
    stat is an integer ratio, bit-exact against the SQL oracle).

    Layout: one Arrow split per axis (literal '\\n' for lines, `\\s+` for
    words), then flat-array + row-id segment reductions — no Python row
    loop.  N-grams hash-combine via the joined gram string so the engine's
    multiplicities match SQL's exact-string GROUP BY (64-bit collisions
    are the usual negligible caveat)."""
    from protein_feature_engineering_ray.stages.dedup import _split_lines

    texts = pc.fill_null(t[text_col], "")
    n = len(t)

    # lines: literal newline split, empties dropped on both sides
    # (offset-safe shared helper — raw ListArray.offsets would misalign
    # against .flatten() on a sliced/combined input)
    lflat, lcounts, loff = _split_lines(texts)
    lmask = pc.utf8_length(lflat).to_numpy(zero_copy_only=False) > 0
    n_lines = _segment_sum(lmask, loff).astype(np.int64)
    rid_l = np.repeat(np.arange(n), lcounts)
    h_l = hash_strings(lflat)
    n_dlines = _distinct_per_row(h_l[lmask], rid_l[lmask], n)

    # words: whitespace split, compacted to nonempty tokens
    wflat, woff = _tokens_flat(texts, r"\s+")
    wmask = pc.utf8_length(wflat).to_numpy(zero_copy_only=False) > 0
    rid_w = np.repeat(np.arange(n), np.diff(woff))[wmask]
    wne = wflat.filter(pa.array(wmask))
    n_words = np.bincount(rid_w, minlength=n).astype(np.int64)

    def grams(k: int):
        """(row ids, joined-gram hashes) for all within-row k-grams over
        the compacted token stream; rid is non-decreasing so endpoint
        equality implies the whole window shares one row."""
        if len(wne) < k:
            return (np.empty(0, np.int64), np.empty(0, np.uint64))
        m = len(wne) - k + 1
        valid = rid_w[k - 1:] == rid_w[:m]
        parts = [wne.slice(j, m).filter(pa.array(valid)) for j in range(k)]
        joined = pc.binary_join_element_wise(*parts, " ")
        return rid_w[:m][valid], hash_strings(joined)

    rid2, h2 = grams(2)
    t2 = np.bincount(rid2, minlength=n).astype(np.int64)
    top2 = _max_per_row(rid2, h2, n)

    rid5, h5 = grams(5)
    t5 = np.bincount(rid5, minlength=n).astype(np.int64)
    u5 = _distinct_per_row(h5, rid5, n)

    out = t
    for name, arr in (
        ("n_lines", pa.array(n_lines, pa.int64())),
        ("n_words", pa.array(n_words, pa.int64())),
        ("dup_line_frac",
         pa.array((n_lines - n_dlines) / np.maximum(n_lines, 1),
                  pa.float64())),
        ("top_2gram_frac",
         pa.array(top2 / np.maximum(t2, 1), pa.float64())),
        ("dup_5gram_frac",
         pa.array((t5 - u5) / np.maximum(t5, 1), pa.float64())),
    ):
        out = _set_column(out, name, arr)
    return out


def _run_heads(arr: pa.Array) -> np.ndarray:
    """Boolean run-head mask over a SORTED Arrow array (adjacent equality
    via the Arrow kernel — no string boxing)."""
    n = len(arr)
    heads = np.ones(n, dtype=bool)
    if n > 1:
        heads[1:] = ~pc.equal(arr.slice(1), arr.slice(0, n - 1)).to_numpy(
            zero_copy_only=False)
    return heads


def topk_ngrams(
    ds: ray.data.Dataset,
    k_top: int = 20,
    n: int = 2,
    text_col: str = "text",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Corpus-level heavy hitters: the ``k_top`` most frequent word
    ``n``-grams with EXACT counts (vocabulary/contamination analysis —
    what the reference eyeballs with pandas ``value_counts`` in its
    notebooks).  Output: ``(ngram, cnt, rank)``, rank 1-based, ties broken
    by gram ascending — fully deterministic.

    Shuffle discipline: each block first collapses to its DISTINCT grams
    (``value_counts`` — the pre-aggregation combiner), so the one
    gram-hash exchange moves distinct-grams-per-block rows, not every
    token.  A gram lives entirely in one bucket, so per-bucket top-k is
    globally sound; the final fold sees only ``k_top × num_buckets`` rows
    (one-block repartition — driver never materializes anything).  Count
    sums use int64 ``np.add.reduceat`` (never float bincount weights:
    corpus-scale counts can exceed 2^53)."""
    assert k_top > 0 and n > 0
    from protein_feature_engineering_ray.core.bucket import grouped_buckets

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        wflat, woff = _tokens_flat(texts, r"\s+")
        wmask = pc.utf8_length(wflat).to_numpy(zero_copy_only=False) > 0
        rid = np.repeat(np.arange(len(t)), np.diff(woff))[wmask]
        wne = wflat.filter(pa.array(wmask))
        empty = pa.table({"ngram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if len(wne) < n:
            return empty
        m = len(wne) - n + 1
        valid = rid[n - 1:] == rid[:m]
        if not valid.any():
            return empty
        vmask = pa.array(valid)
        parts = [wne.slice(j, m).filter(vmask) for j in range(n)]
        joined = (parts[0] if n == 1
                  else pc.binary_join_element_wise(*parts, " "))
        vc = joined.value_counts()
        return pa.table({"ngram": vc.field("values").cast(pa.string()),
                         "cnt": vc.field("counts").cast(pa.int64())})

    def topk_table(g: pa.Table, k: int) -> pa.Table:
        """Sum per-gram counts over a gram-sorted table, keep the k most
        frequent (ties: gram ascending)."""
        ng = g["ngram"]
        if isinstance(ng, pa.ChunkedArray):
            ng = ng.combine_chunks()
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        heads = np.flatnonzero(_run_heads(ng))
        tot = np.add.reduceat(cnt, heads).astype(np.int64)
        uniq = ng.take(pa.array(heads, pa.int64()))
        # the input is ALREADY gram-ascending, so a stable count-only
        # argsort yields exactly (count desc, gram asc) — no boxed-string
        # lexsort (the sort_bucket dict-rank lesson)
        order = np.argsort(-tot, kind="stable")[:k]
        return pa.table({"ngram": uniq.take(pa.array(order, pa.int64())),
                         "cnt": pa.array(tot[order], pa.int64())})

    def bucket_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.select(["ngram", "cnt"])
        return topk_table(g, k_top)

    def final_topk(t: pa.Table) -> pa.Table:
        t = t.sort_by([("ngram", "ascending")])
        out = topk_table(t, k_top) if t.num_rows else t
        return out.append_column(
            "rank", pa.array(np.arange(1, out.num_rows + 1), pa.int64()))

    per_bucket = grouped_buckets(
        ds.map_batches(partial, batch_format="pyarrow"),
        bucket_topk, num_buckets=num_buckets, key="ngram",
        order_cols=("ngram",),
    )
    anchor = ray.data.from_arrow(pa.table({
        "ngram": pa.array([], pa.string()),
        "cnt": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
    }))
    return anchor.union(
        per_bucket.repartition(1).map_batches(
            final_topk, batch_format="pyarrow", batch_size=None))


def repetition_profile(ds: ray.data.Dataset,
                       text_col: str = "text") -> ray.data.Dataset:
    """Gopher-style repetition filter signals per document: nonempty
    line/word counts, duplicate-line fraction, top-2-gram fraction,
    duplicate-5-gram fraction.  Stateless Arrow+numpy tasks (cheap state
    — same rationale as text_profile's task form)."""
    return ds.map_batches(
        lambda t: _repetition_batch(t, text_col), batch_format="pyarrow")


# RE2-only patterns (no lookaround): Arrow's count/replace_substring_regex
# and DuckDB's regexp_* both run RE2, so one pattern string yields
# identical counts AND identical replacement output in engine and oracle.
SCRUB_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
)


def scrub_profile(ds: ray.data.Dataset,
                  text_col: str = "text") -> ray.data.Dataset:
    """PII/URL scrub stage: per-pattern match counts on the ORIGINAL text
    plus a `scrubbed` column with the patterns replaced in declaration
    order (email -> url -> phone).  Counts are independent per pattern;
    replacement is sequential so the same text region can only be consumed
    once.  Stateless Arrow kernels (RE2 compiled per pattern inside the
    kernel; no Python loop)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t[text_col], "")
        out = t
        scrub = texts
        for name, pat, repl in SCRUB_PATTERNS:
            cnt = pc.count_substring_regex(texts, pat).cast(pa.int64())
            out = _set_column(out, f"n_{name}s", cnt)
            scrub = pc.replace_substring_regex(scrub, pat, repl)
        return _set_column(out, "scrubbed", scrub)

    return ds.map_batches(fn, batch_format="pyarrow")


def decontaminate(
    ds: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 1,
    num_buckets: int = 64,
    max_benchmark_fps: int = 2_000_000,
):
    """Benchmark decontamination: drop every corpus document that shares a
    >= k+window-1-token substring with ANY benchmark document (the
    GPT-3/Gopher-style test-set overlap pass, built on the same winnowing
    guarantee as ``winnow_matches``).  Returns ``(clean, contaminated)`` —
    the filtered corpus and the (id, n_shared) rows it removed.

    Shuffle discipline: the benchmark is the SMALL side, so its distinct
    fingerprint set broadcasts once (``ray.put``) and the corpus
    fingerprints stream through a vectorized ``np.isin`` membership filter
    — NO corpus-side all-to-all for matching (contrast ``winnow_matches``,
    which pairs within one corpus).  Only the (rare) matched rows take the
    one coarse id-hash exchange that counts shared fingerprints per doc,
    and the final removal is a ``bucket_join`` left_anti.  A benchmark
    with more than ``max_benchmark_fps`` fingerprint rows refuses loudly
    (the knn ``max_broadcast_rows`` rule) — split the benchmark or raise
    the cap deliberately."""
    from protein_feature_engineering_ray.core.bucket import grouped_buckets
    from protein_feature_engineering_ray.core.joins import bucket_join

    bench_fps = winnow_fingerprints(
        benchmark, text_col=text_col, id_col=id_col, k=k, window=window)
    # one pass over the benchmark lineage: count the rows for the cap check
    # WHILE draining the fingerprints (a separate .count() would execute
    # the whole fingerprint map a second time — Ray does not cache lazy
    # lineages between consumptions)
    parts, n_bench = [], 0
    for b in bench_fps.select_columns(["fingerprint"]).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        n_bench += b.num_rows
        if n_bench > max_benchmark_fps:
            raise ValueError(
                f"benchmark exceeds max_benchmark_fps={max_benchmark_fps} "
                "fingerprint rows; the benchmark side must stay "
                "broadcastable — split it into passes or raise the cap "
                "deliberately"
            )
        parts.append(
            np.unique(b["fingerprint"].to_numpy(zero_copy_only=False)))
    bset = (np.unique(np.concatenate(parts)) if parts
            else np.empty(0, np.uint64))
    ref = ray.put(bset)

    corp_fps = winnow_fingerprints(
        ds, text_col=text_col, id_col=id_col, k=k, window=window)

    def member(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        fp = t["fingerprint"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(fp, s)))

    matched = corp_fps.map_batches(member, batch_format="pyarrow")

    def count_per_id(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: g[id_col] if id_col in g.column_names
                             else pa.array([], pa.int64()),
                             "n_shared": pa.array([], pa.int64())})
        ids = g[id_col]
        # grouped_buckets pre-sorts by id: distinct (id, fp) rows count as
        # contiguous runs
        iv = np.asarray(ids.to_numpy(zero_copy_only=False))
        starts = np.empty(len(iv), dtype=bool)
        starts[0] = True
        starts[1:] = iv[1:] != iv[:-1]
        gid = np.cumsum(starts) - 1
        cnt = np.bincount(gid)
        keep = cnt >= min_shared
        head = ids.take(pa.array(np.flatnonzero(starts)))
        return pa.table({
            id_col: head.filter(pa.array(keep)),
            "n_shared": pa.array(cnt[keep], pa.int64()),
        })

    contaminated = grouped_buckets(
        matched, count_per_id, num_buckets=num_buckets, key=id_col,
        order_cols=(id_col, "fingerprint"),
    )
    # right_cols declared: a zero-match corpus yields NO blocks from the
    # grouped exchange, so contaminated.schema() is None and the join's
    # schema probe would crash — the column list is statically known here
    clean = bucket_join(ds, contaminated, on=[id_col], how="left_anti",
                        num_buckets=num_buckets,
                        right_cols=[id_col, "n_shared"])
    return clean, contaminated
