"""Conversation-level composition descriptors (SURVEY.md §2.2, §2.5).

Each kernel consumes a ``ConvContext`` (whole bucket, segment-vectorized) and
emits an ``(n_conversations, width)`` float64 matrix.  Reference citations name
the per-sequence loop each kernel re-expresses; none of these loops survive —
counting is done with flat ``(segment, code)`` bincount scatters across
every conversation in the bucket at once.

Divisions are single ``int count / int count`` operations so results are
bit-identical to any engine computing the same ratio (DuckDB oracle parity).
"""

from __future__ import annotations

import numpy as np

from protein_feature_engineering_ray.core.context import ConvContext


def _seg_code_counts(
    seg: np.ndarray, codes: np.ndarray, n_segs: int, width: int
) -> np.ndarray:
    """(n_segs, width) histogram of codes per segment; codes<0 ignored.
    One flat bincount — ~2.6x the throughput of the 2D np.add.at scatter
    it replaces, same integer counts."""
    valid = codes >= 0
    if not valid.any():
        return np.zeros((n_segs, width), dtype=np.int64)
    flat = seg[valid] * width + codes[valid]
    return np.bincount(flat, minlength=n_segs * width).reshape(n_segs, width)


def _scatter_add1(out: np.ndarray, seg: np.ndarray, idx: np.ndarray) -> None:
    """``out[seg, idx] += 1`` elementwise (np.add.at semantics, integer
    counts) via one flat bincount — ~2.6x the unbuffered 2D scatter."""
    if len(seg):
        w = out.shape[1]
        out += np.bincount(seg * w + idx, minlength=out.size).reshape(out.shape)


def _scatter_count1d(out: np.ndarray, seg: np.ndarray) -> None:
    """``out[seg] += 1`` elementwise (np.add.at semantics)."""
    if len(seg):
        out += np.bincount(seg, minlength=len(out))


def _codes_of(ctx: ConvContext, grouped: bool) -> tuple[np.ndarray, int, list[str]]:
    if grouped:
        letters = list(ctx.alphabet.groups.keys())
        return ctx.group_codes, len(letters), letters
    return ctx.codes, ctx.alphabet.size, list(ctx.alphabet.letters)


class CompositionK:
    """AAC/GAAC analogue: per-conversation letter frequency.

    Reference ``_AAC`` (feature.py:432-455): ``count/len`` per letter; grouped
    form ``_GAAC`` (feature.py:1045-1077).  Here: role (or role-group)
    frequency per conversation.
    """

    def __init__(self, letters: list[str], grouped: bool = False, normalize: bool = True,
                 prefix: str | None = None):
        self.letters = letters
        self.grouped = grouped
        self.normalize = normalize
        self.prefix = prefix or ("gaac" if grouped else "aac")

    lookback = 0  # decomposable: partial counts merge across chunks

    @property
    def counts_width(self):
        return len(self.letters)

    def names(self) -> list[str]:
        return [f"{self.prefix}_{s}" for s in self.letters]

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        codes, width, _ = _codes_of(ctx, self.grouped)
        if anchor is None:
            return _seg_code_counts(ctx.seg_of_row, codes, ctx.n_segs, width)
        sel = (codes >= 0) & anchor
        out = np.zeros((ctx.n_segs, width), dtype=np.int64)
        _scatter_add1(out, ctx.seg_of_row[sel], codes[sel])
        return out

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        if not self.normalize:
            return counts.astype(np.float64)
        denom = counts.sum(axis=1, keepdims=True).astype(np.float64)
        denom[denom == 0] = 1.0
        return counts / denom

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))


class NGramComposition:
    """DPC / TPC / GDPC / GTPC analogue (feature.py:528-625, 1181-1280).

    n-gram (n=2,3) counts of adjacent role transitions; ``normalize`` divides
    by total n-gram count (the reference's type-1 vs type-2 distinction,
    feature.py:545-547).
    """

    def __init__(self, letters: list[str], n: int = 2, grouped: bool = False,
                 normalize: bool = True, prefix: str | None = None):
        assert n in (2, 3)
        self.letters = letters
        self.n = n
        self.grouped = grouped
        self.normalize = normalize
        base = {2: "dpc", 3: "tpc"}[n]
        self.prefix = prefix or (("g" + base) if grouped else base)

    def names(self) -> list[str]:
        L = self.letters
        if self.n == 2:
            return [f"{self.prefix}_{a}.{b}" for a in L for b in L]
        return [f"{self.prefix}_{a}.{b}.{c}" for a in L for b in L for c in L]

    @property
    def lookback(self):
        return self.n - 1

    @property
    def counts_width(self):
        return len(self.letters) ** self.n

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        """Gram counts ANCHORED AT THE LAST ELEMENT (so a gram spanning a
        chunk boundary is counted by exactly the chunk owning its last row)."""
        codes, A, _ = _codes_of(ctx, self.grouped)
        n, seg = ctx.n, ctx.seg_of_row
        width = A**self.n
        out = np.zeros((ctx.n_segs, width), dtype=np.int64)
        if n >= self.n:
            k = self.n - 1
            mask = seg[:-k] == seg[k:]
            gram = codes[: n - k].copy()
            ok = gram >= 0
            for s in range(1, self.n):
                nxt = codes[s : n - k + s]
                gram = gram * A + nxt
                ok &= nxt >= 0
            sel = mask & ok
            if anchor is not None:
                sel = sel & anchor[k:]
            _scatter_add1(out, seg[k:][sel], gram[sel])
        return out

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        if not self.normalize:
            return counts.astype(np.float64)
        denom = counts.sum(axis=1, keepdims=True).astype(np.float64)
        denom[denom == 0] = 1.0
        return counts / denom

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))


class DDE:
    """Deviation-from-expected bigram composition (``_DDE``, feature.py:557-597).

    The reference centers bigram frequency by a codon-usage expectation
    ``TM = (c_i/C)(c_j/C)`` and scales by ``sqrt(TM(1-TM)/(N-1))``.  The
    transcript analogue uses the conversation's own unigram marginals as the
    expectation: how over/under-represented is each role transition relative
    to an order-free model.
    """

    def __init__(self, letters: list[str]):
        self.letters = letters
        self._bigram = NGramComposition(letters, n=2, normalize=False)

    def names(self) -> list[str]:
        return [f"dde_{a}.{b}" for a in self.letters for b in self.letters]

    # --- decomposable protocol: partials = unigram counts + bigram counts
    # (both integer, so the chunked float64 sum is exact and the finalize
    # below reproduces apply() bit-for-bit)

    @property
    def lookback(self):
        return 1  # cross-boundary bigrams come from a 1-row context prefix

    @property
    def counts_width(self):
        A = len(self.letters)
        return A + A * A

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        A = ctx.alphabet.size
        if anchor is None:
            uni = _seg_code_counts(ctx.seg_of_row, ctx.codes, ctx.n_segs, A)
        else:
            sel = (ctx.codes >= 0) & anchor
            uni = _seg_code_counts(
                ctx.seg_of_row[sel], ctx.codes[sel], ctx.n_segs, A)
        bi = self._bigram.counts(ctx, anchor=anchor)
        return np.concatenate([uni, bi], axis=1)

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        A = len(self.letters)
        uni = counts[:, :A].astype(np.float64)
        bi = counts[:, A:].astype(np.float64)
        n_segs = len(counts)
        tot = uni.sum(axis=1, keepdims=True)
        tot[tot == 0] = 1.0
        p = uni / tot  # per-conv unigram marginals
        npairs = bi.sum(axis=1, keepdims=True)
        safe = np.where(npairs == 0, 1.0, npairs)
        dc = bi / safe
        tm = p[:, :, None] * p[:, None, :]  # expected pair prob
        tm = tm.reshape(n_segs, A * A)
        tv = tm * (1.0 - tm) / np.where(npairs == 0, 1.0, npairs)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = (dc - tm) / np.sqrt(tv)
        out[~np.isfinite(out)] = 0.0
        return out

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))


class KSpacedPairs:
    """CKSAAP / CKSAAGP analogue (feature.py:487-527, 1125-1180).

    For each gap g in 0..kspace: counts of (role_i, role_{i+g+1}) pairs,
    normalized per gap by that gap's pair count (feature.py:504-519); zero
    when a conversation has no pairs at that gap (feature.py:1164-1166).
    """

    def __init__(self, letters: list[str], kspace: int = 3, grouped: bool = False,
                 normalize: bool = True, prefix: str | None = None):
        self.letters = letters
        self.kspace = kspace
        self.grouped = grouped
        self.normalize = normalize
        self.prefix = prefix or ("cksaagp" if grouped else "cksaap")

    def names(self) -> list[str]:
        L = self.letters
        return [
            f"{self.prefix}_g{g}_{a}.{b}"
            for g in range(self.kspace + 1)
            for a in L
            for b in L
        ]

    @property
    def lookback(self):
        return self.kspace + 1

    @property
    def counts_width(self):
        A = len(self.letters)
        return (self.kspace + 1) * A * A

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        codes, A, _ = _codes_of(ctx, self.grouped)
        n, seg = ctx.n, ctx.seg_of_row
        blocks = []
        for g in range(self.kspace + 1):
            d = g + 1
            out = np.zeros((ctx.n_segs, A * A), dtype=np.int64)
            if n > d:
                mask = seg[:-d] == seg[d:]
                a, b = codes[:-d], codes[d:]
                sel = mask & (a >= 0) & (b >= 0)
                if anchor is not None:
                    sel = sel & anchor[d:]
                _scatter_add1(out, seg[d:][sel], a[sel] * A + b[sel])
            blocks.append(out)
        return np.concatenate(blocks, axis=1)

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        A = len(self.letters)
        blocks = []
        for g in range(self.kspace + 1):
            out = counts[:, g * A * A : (g + 1) * A * A]
            if self.normalize:
                denom = out.sum(axis=1, keepdims=True).astype(np.float64)
                denom[denom == 0] = 1.0
                blocks.append(out / denom)
            else:
                blocks.append(out.astype(np.float64))
        return np.concatenate(blocks, axis=1)

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))


class CTDComposition:
    """CTDC analogue (feature.py:1796-1870): share of turns in each role group."""

    def __init__(self, groups: list[str]):
        self.groups = groups

    def names(self) -> list[str]:
        return [f"ctdc_{g}" for g in self.groups]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return CompositionK(self.groups, grouped=True).apply(ctx)


class CTDTransition:
    """CTDT analogue (feature.py:1871-1956): rate of adjacent transitions
    between each unordered group pair among adjacent turns (count(g1<->g2) /
    (pairs))."""

    def __init__(self, groups: list[str]):
        self.groups = groups

    def names(self) -> list[str]:
        G = self.groups
        return [f"ctdt_{G[i]}.{G[j]}" for i in range(len(G)) for j in range(i + 1, len(G))]

    lookback = 1

    @property
    def counts_width(self):
        G = len(self.groups)
        return G * (G - 1) // 2 + 1

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        """Partial layout: transition-pair counts + trailing denominator
        column (total adjacent valid pairs), both mergeable."""
        codes = ctx.group_codes
        G = len(self.groups)
        n, seg = ctx.n, ctx.seg_of_row
        pair_idx = [(i, j) for i in range(G) for j in range(i + 1, G)]
        out = np.zeros((ctx.n_segs, len(pair_idx) + 1), dtype=np.int64)
        if n > 1:
            mask = (seg[:-1] == seg[1:]) & (codes[:-1] >= 0) & (codes[1:] >= 0)
            if anchor is not None:
                mask = mask & anchor[1:]
            a = np.minimum(codes[:-1], codes[1:])
            b = np.maximum(codes[:-1], codes[1:])
            _scatter_count1d(out[:, -1], seg[1:][mask])
            lut = np.full((G, G), -1, dtype=np.int64)
            for k, (i, j) in enumerate(pair_idx):
                lut[i, j] = k
            sel = mask & (a != b)
            _scatter_add1(out[:, :-1], seg[1:][sel], lut[a[sel], b[sel]])
        return out

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        d = counts[:, -1:].astype(np.float64)
        d[d == 0] = 1.0
        return counts[:, :-1] / d

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))


class CTDDistribution:
    """CTDD analogue (feature.py:1978-2051 + ``Count1`` 1957-1976).

    For each role group: position (as % of conversation length) of the 1st,
    25%, 50%, 75% and 100%-th occurrence of that group; 0 when absent.
    Matches the reference's ``Count1`` rule — the ``floor(q * count)``-th
    occurrence clamped to a minimum of 1 — and its ``pos / len * 100``
    scaling.  (Round 1 used ceil here; the reference uses floor, so e.g.
    count=6, q=0.25 selects the 1st occurrence, not the 2nd.)
    """

    QUANTS = (0.0, 0.25, 0.5, 0.75, 1.0)

    def __init__(self, groups: list[str]):
        self.groups = groups

    def names(self) -> list[str]:
        return [
            f"ctdd_{g}_p{int(q * 100)}" for g in self.groups for q in self.QUANTS
        ]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        codes = ctx.group_codes
        G = len(self.groups)
        out = np.zeros((ctx.n_segs, G * len(self.QUANTS)), dtype=np.float64)
        pos = ctx.pos
        seg = ctx.seg_of_row
        lengths = ctx.lengths
        for gi in range(G):
            is_g = codes == gi
            # occurrence rank of each matching row within (segment, group)
            cum = np.cumsum(is_g)
            seg_base = np.zeros(ctx.n_segs, dtype=np.int64)
            # cumulative count of group g before each segment start
            cnt_per_seg = np.zeros(ctx.n_segs, dtype=np.int64)
            _scatter_count1d(cnt_per_seg, seg[is_g])
            seg_base[1:] = np.cumsum(cnt_per_seg)[:-1]
            for qi, q in enumerate(self.QUANTS):
                # target occurrence number per segment (reference Count1:
                # floor(count*q), minimum 1; q values are exact binary
                # fractions so floor is float-safe)
                tgt = np.maximum(1, np.floor(cnt_per_seg * q)).astype(np.int64)
                # row where cum == seg_base + tgt and is_g
                want = seg_base + tgt
                hit = is_g & (cum == want[seg])
                # first such row per segment (cum is strictly increasing on
                # group rows, so at most one row matches per segment)
                col = gi * len(self.QUANTS) + qi
                segs_hit = seg[hit]
                out[segs_hit, col] = (pos[hit] + 1) / lengths[segs_hit] * 100.0
                out[cnt_per_seg == 0, col] = 0.0
        return out


class Triad:
    """CTriad / KSCTriad analogue (feature.py:2052-2148): grouped triads of
    positions (i, i+g+1, i+2g+2) for spacing g in 0..kspace, min-max scaled
    per conversation ``(x - min) / max`` exactly as the reference does
    (feature.py:2065-2067 — note: divided by max, not max-min)."""

    def __init__(self, groups: list[str], kspace: int = 0):
        self.groups = groups
        self.kspace = kspace
        self.prefix = "ctriad" if kspace == 0 else "ksctriad"

    def names(self) -> list[str]:
        G = self.groups
        return [
            f"{self.prefix}_g{g}_{a}.{b}.{c}"
            for g in range(self.kspace + 1)
            for a in G
            for b in G
            for c in G
        ]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        codes = ctx.group_codes
        A = len(self.groups)
        n, seg = ctx.n, ctx.seg_of_row
        blocks = []
        for g in range(self.kspace + 1):
            d = g + 1
            out = np.zeros((ctx.n_segs, A**3), dtype=np.float64)
            if n > 2 * d:
                m = n - 2 * d
                mask = seg[:m] == seg[2 * d :]
                a, b, c = codes[:m], codes[d : m + d], codes[2 * d :]
                sel = mask & (a >= 0) & (b >= 0) & (c >= 0)
                _scatter_add1(
                    out, seg[:m][sel], (a[sel] * A + b[sel]) * A + c[sel])
            mn = out.min(axis=1, keepdims=True)
            mx = out.max(axis=1, keepdims=True)
            mx[mx == 0] = 1.0
            blocks.append((out - mn) / mx)
        return np.concatenate(blocks, axis=1)


class ASDC:
    """All-pairs skip dipeptide (``_ASDC``, feature.py:2539-2571): counts over
    every ordered pair (j, k>j), normalized by total pair count.

    The reference is O(n²) per sequence; at transcript scale we cap the
    forward horizon (``max_skip``) so a mega-conversation costs O(n·max_skip)
    — the capped form equals the reference exactly for conversations shorter
    than ``max_skip``."""

    def __init__(self, letters: list[str], max_skip: int = 512):
        self.letters = letters
        self.max_skip = max_skip

    def names(self) -> list[str]:
        L = self.letters
        return [f"asdc_{a}.{b}" for a in L for b in L]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        codes, A = ctx.codes, ctx.alphabet.size
        n, seg = ctx.n, ctx.seg_of_row
        out = np.zeros((ctx.n_segs, A * A), dtype=np.int64)
        horizon = min(self.max_skip, int(ctx.lengths.max()) if ctx.n_segs else 0)
        for d in range(1, horizon):
            if n <= d:
                break
            mask = seg[:-d] == seg[d:]
            a, b = codes[:-d], codes[d:]
            sel = mask & (a >= 0) & (b >= 0)
            _scatter_add1(out, seg[:-d][sel], a[sel] * A + b[sel])
        denom = out.sum(axis=1, keepdims=True).astype(np.float64)
        denom[denom == 0] = 1.0
        return out / denom


def _global_pos(ctx: ConvContext) -> np.ndarray:
    """TRUE per-conversation position of each row.  In whole-conversation
    buckets ``ctx.pos`` is it; in the salted chunked path segments are
    ``conv#chunk`` slices, so the grid position must come from the (valid)
    ``turn_idx`` column instead (the chunked executor's documented
    contract)."""
    if "turn_idx" in ctx.table.column_names:
        ti = ctx.table["turn_idx"].to_numpy(zero_copy_only=False)
        ti = np.asarray(ti, dtype=np.int64)
        if (ti >= 0).all():
            return ti
    return ctx.pos.astype(np.int64)


class StridedKTuple:
    """PseKRAAC ``gapModel`` analogue (feature.py:2722-2770): raw counts of
    adjacent k-tuples sampled at stride ``g+1`` — positions 0, g+1, 2(g+1), …
    — over the (optionally grouped) alphabet.  k in {1,2,3}; raw counts, not
    normalized, exactly as the reference.

    SUM-mergeable chunked protocol (counts/counts_width/finalize, lookback =
    k-1): the absolute-position grid is chunk-computable because grid
    membership depends only on the GLOBAL ``turn_idx`` (chunk_start + local),
    and a tuple crossing a chunk boundary is counted by the chunk owning its
    LAST row via the k-1-row context prefix."""

    def __init__(self, letters: list[str], k: int = 2, gap: int = 1, grouped: bool = True,
                 prefix: str = "stride"):
        assert k in (1, 2, 3)
        self.letters = letters
        self.k = k
        self.gap = gap
        self.grouped = grouped
        self.prefix = prefix

    def names(self) -> list[str]:
        from itertools import product

        return [
            f"{self.prefix}_k{self.k}g{self.gap}_" + ".".join(t)
            for t in product(self.letters, repeat=self.k)
        ]

    @property
    def lookback(self):
        return self.k - 1

    @property
    def counts_width(self):
        return len(self.letters) ** self.k

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        codes, A, _ = _codes_of(ctx, self.grouped)
        seg, n = ctx.seg_of_row, ctx.n
        stride = self.gap + 1
        out = np.zeros((ctx.n_segs, A**self.k), dtype=np.int64)
        on_grid = _global_pos(ctx) % stride == 0
        if self.k == 1:
            sel = on_grid & (codes >= 0)
            if anchor is not None:
                sel = sel & anchor
            _scatter_add1(out, seg[sel], codes[sel])
            return out
        k1 = self.k - 1
        if n > k1:
            # tuple of ADJACENT positions starting at each grid point,
            # anchored (for chunk ownership) at its LAST row
            mask = (seg[:-k1] == seg[k1:]) & on_grid[:-k1]
            gram = codes[: n - k1].copy()
            ok = gram >= 0
            for s in range(1, self.k):
                nxt = codes[s : n - k1 + s]
                gram = gram * A + nxt
                ok &= nxt >= 0
            sel = mask & ok
            if anchor is not None:
                sel = sel & anchor[k1:]
            _scatter_add1(out, seg[k1:][sel], gram[sel])
        return out

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        return counts.astype(np.float64)

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))


class LambdaKTuple:
    """PseKRAAC ``lambdaModel`` analogue (feature.py:2772-2821): raw counts of
    k-tuples at positions (j, j+λ, j+2λ) for every j (lag pairing).

    SUM-mergeable chunked protocol (lookback = λ·(k-1)): the pattern is
    translation-invariant, so a tuple is counted by the chunk owning its
    LAST row, with the λ·(k-1)-row context prefix supplying cross-boundary
    heads."""

    def __init__(self, letters: list[str], k: int = 2, lam: int = 2, grouped: bool = True,
                 prefix: str = "lam"):
        assert k in (2, 3)
        self.letters = letters
        self.k = k
        self.lam = max(1, lam)
        self.grouped = grouped
        self.prefix = prefix

    def names(self) -> list[str]:
        from itertools import product

        return [
            f"{self.prefix}_k{self.k}l{self.lam}_" + ".".join(t)
            for t in product(self.letters, repeat=self.k)
        ]

    @property
    def lookback(self):
        return self.lam * (self.k - 1)

    @property
    def counts_width(self):
        return len(self.letters) ** self.k

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        codes, A, _ = _codes_of(ctx, self.grouped)
        seg, n = ctx.seg_of_row, ctx.n
        lam = self.lam
        out = np.zeros((ctx.n_segs, A**self.k), dtype=np.int64)
        span = lam * (self.k - 1)
        if n > span:
            m = n - span
            mask = seg[:m] == seg[span:]
            gram = codes[:m].copy()
            ok = gram >= 0
            for s in range(1, self.k):
                nxt = codes[s * lam : m + s * lam]
                gram = gram * A + nxt
                ok &= nxt >= 0
            sel = mask & ok
            if anchor is not None:
                sel = sel & anchor[span:]
            _scatter_add1(out, seg[span:][sel], gram[sel])
        return out

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        return counts.astype(np.float64)

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))


class DistancePair:
    """``_DistancePair`` analogue (feature.py:2572-2721): composition under a
    role-coarsening map — distance-0 unigram frequencies plus pair
    frequencies at each distance 1..``distance``, each block normalized by
    its own count."""

    def __init__(self, groups: list[str], distance: int = 2, prefix: str = "dp"):
        self.groups = groups
        self.distance = distance
        self.prefix = prefix

    def names(self) -> list[str]:
        G = self.groups
        out = [f"{self.prefix}_d0_{g}" for g in G]
        for d in range(1, self.distance + 1):
            out += [f"{self.prefix}_d{d}_{a}.{b}" for a in G for b in G]
        return out

    def apply(self, ctx: ConvContext) -> np.ndarray:
        uni = CompositionK(self.groups, grouped=True).apply(ctx)
        blocks = [uni]
        codes = ctx.group_codes
        A = len(self.groups)
        n, seg = ctx.n, ctx.seg_of_row
        for d in range(1, self.distance + 1):
            out = np.zeros((ctx.n_segs, A * A), dtype=np.int64)
            if n > d:
                mask = seg[:-d] == seg[d:]
                a, b = codes[:-d], codes[d:]
                sel = mask & (a >= 0) & (b >= 0)
                _scatter_add1(out, seg[:-d][sel], a[sel] * A + b[sel])
            denom = out.sum(axis=1, keepdims=True).astype(np.float64)
            denom[denom == 0] = 1.0
            blocks.append(out / denom)
        return np.concatenate(blocks, axis=1)


class ConvSummary:
    """Conversation-level summary stats (flagship backfill block): turn count,
    wall duration, tool-turn share, distinct-role count."""

    def __init__(self, tool_letter: str | None = None):
        self.tool_letter = tool_letter

    def names(self) -> list[str]:
        return ["n_turns", "duration_sec", "tool_share", "n_roles"]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        n_turns = ctx.lengths.astype(np.float64)
        ts = ctx.ts_us
        first = ts[ctx.starts[:-1]]
        last = ts[ctx.starts[1:] - 1]
        duration = (last - first).astype(np.float64) / 1e6
        if "tool_flag" in ctx.table.column_names:
            is_tool = ctx.table["tool_flag"].to_numpy(zero_copy_only=False) != 0
        else:
            tool_col = np.asarray(ctx.col_np("tool"), dtype=object)
            # elementwise object compare (no per-row Python loop); same truth
            # table as `t != "" and t is not None` (NaN counts as a tool, as
            # before), and stays dtype=bool on EMPTY input where a list
            # comprehension's asarray defaults to float64 and breaks indexing
            is_tool = (tool_col != "") & (tool_col != None)  # noqa: E711
        tool_cnt = np.zeros(ctx.n_segs, dtype=np.int64)
        _scatter_count1d(tool_cnt, ctx.seg_of_row[is_tool])
        tool_share = tool_cnt / n_turns
        counts = _seg_code_counts(ctx.seg_of_row, ctx.codes, ctx.n_segs, ctx.alphabet.size)
        n_roles = (counts > 0).sum(axis=1).astype(np.float64)
        return np.stack([n_turns, duration, tool_share, n_roles], axis=1)
