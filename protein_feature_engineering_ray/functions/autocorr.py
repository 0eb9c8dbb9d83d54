"""Lag / autocorrelation descriptor family (SURVEY.md §2.4).

Re-expressions of the reference's autocorrelation core — NMBroto
(feature.py:1428-1486), Moran (1487-1549), Geary (1550-1611), AC/CC/ACC
(1620-1789), SOCNumber (2149-2197), QSOrder (2198-2270), PAAC/APAAC
(2271-2383) — over per-turn numeric series of a conversation.

Two series sources:
- a numeric column (``value``, rolling latency, text length) — the transcript
  domain's native property series;
- a static per-letter property table (``prop``) — the reference's own model,
  where the series is ``property[letter_at_position]`` z-normalized across the
  alphabet (feature.py:1451-1455).

All segment-vectorized: lag products are shifted-array multiplies with
same-segment masks, per-conversation sums via order-preserving
``np.bincount`` segment reductions.  A NaN prefix
(e.g. first-turn latency) is compacted away per segment before lagging.
"""

from __future__ import annotations

import numpy as np

from protein_feature_engineering_ray.core.bucket import segment_starts
from protein_feature_engineering_ray.core.context import ConvContext
from protein_feature_engineering_ray.functions.composition import (
    _seg_code_counts,
)


def znorm_table(table: np.ndarray) -> np.ndarray:
    """Z-normalize each property column across the alphabet
    (feature.py:1451-1455: mean/std over the 20 letters)."""
    t = np.asarray(table, dtype=np.float64)
    mu = t.mean(axis=0, keepdims=True)
    sd = t.std(axis=0, keepdims=True)
    sd[sd == 0] = 1.0
    return (t - mu) / sd


def _series(ctx: ConvContext, spec) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Resolve a series spec to (x, starts, seg_map).

    spec: ("col", name) or ("prop", (letters_table_column,) np.ndarray 1-D per
    letter).  Returns compacted x (NaN rows dropped), segment starts for the
    compacted array, and seg_map[i] = original segment index of compacted
    segment i (segments that become empty are dropped from the output rows'
    values — they get 0.0).
    """
    kind, arg = spec
    if kind == "col":
        x = ctx.numeric(arg)
    else:
        per_letter = np.asarray(arg, dtype=np.float64)
        codes = ctx.codes
        x = np.where(codes >= 0, per_letter[np.clip(codes, 0, None)], np.nan)
    valid = ~np.isnan(x)
    if valid.all():
        return x, ctx.starts, np.arange(ctx.n_segs)
    xc = x[valid]
    segc = ctx.seg_of_row[valid]
    st = segment_starts(segc)
    seg_map = segc[st[:-1]] if len(xc) else np.zeros(0, dtype=np.int64)
    return xc, st, seg_map


def _seg_reduce(values: np.ndarray, seg_row: np.ndarray, n_segs: int) -> np.ndarray:
    # bincount accumulates in input order, exactly like the np.add.at scatter
    # it replaces (bit-identical float sums), at ~3x the throughput
    if len(values) == 0:
        # np.bincount returns int64 when weights is EMPTY (numpy quirk);
        # downstream in-place float ops (mean /= lens) need float64
        return np.zeros(n_segs, dtype=np.float64)
    return np.bincount(seg_row, weights=values, minlength=n_segs)


class _LagBase:
    """Shared machinery for the compacted-series lag family (NMBroto / AC /
    Moran / Geary), including the ORDER-mergeable chunked protocol: per-chunk
    partials are CHUNK-MEAN-CENTERED moment sums per lag plus the chunk's
    first/last ``nlag`` valid boundary values, so ``merge_ordered`` can stitch
    chunk partials in order — cross-boundary lag products reconstructed
    exactly for any interior-NaN pattern, with no context rows
    (``lookback = 0``).

    Moments are centered on the chunk's own mean m (NOT raw ``Σx·y`` /
    ``Σx²``): the raw form forces finalizers into ``sxx - N·μ²``-style
    subtractions that cancel catastrophically when |mean| >> std.  The merge
    Chan-combines the per-chunk (N, m, M2) into the global mean μ, then
    shifts each chunk's centered stats by δ = m − μ — every shift term is
    O(std²)-scale, no cancellation.

    Partial layout per segment (width = 10*nlag + 3), m = chunk-segment mean:
      per lag n=1..nlag: [Σ(x_i−m)(x_{i+n}−m), Σ(x_i−m) (heads),
                          Σ(x_{i+n}−m) (tails), Σ(x_i−m)², Σ(x_{i+n}−m)²,
                          pair count]                              (6·nlag)
      global:            [m, M2 = Σ(x−m)², N valid]                (3)
      boundary:          prefix vals, prefix mask, suffix vals,
                          suffix mask (each nlag slots; RAW values) (4·nlag)

    ``_finalize_stats(stats, glob)`` receives stats centered on the GLOBAL
    mean and ``glob = (μ, M2, N)``.
    """

    lookback = 0  # chunked protocol: self-contained partials, no context

    def __init__(self, spec, nlag: int, prefix: str):
        self.spec = spec
        self.nlag = nlag
        self.prefix = prefix

    def names(self) -> list[str]:
        return [f"{self.prefix}_lag{n}" for n in range(1, self.nlag + 1)]

    def _prep(self, ctx: ConvContext):
        x, st, seg_map = _series(ctx, self.spec)
        lens = np.diff(st)
        nseg_c = len(lens)
        seg_row = np.repeat(np.arange(nseg_c), lens)
        return x, st, seg_map, lens, nseg_c, seg_row

    def _emit(self, ctx: ConvContext, vals_c: np.ndarray, seg_map: np.ndarray) -> np.ndarray:
        out = np.zeros((ctx.n_segs, vals_c.shape[1]), dtype=np.float64)
        out[seg_map] = vals_c
        return out

    # ---- chunked (order-mergeable) protocol ----

    @property
    def counts_width(self):
        return 10 * self.nlag + 3

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        nlag = self.nlag
        out = np.zeros((ctx.n_segs, self.counts_width), dtype=np.float64)
        # resolve the series on the FULL table, then restrict to own+valid
        kind, arg = self.spec
        if kind == "col":
            x_full = ctx.numeric(arg)
        else:
            per_letter = np.asarray(arg, dtype=np.float64)
            x_full = np.where(
                ctx.codes >= 0, per_letter[np.clip(ctx.codes, 0, None)], np.nan
            )
        keep = ~np.isnan(x_full)
        if anchor is not None:
            keep &= anchor
        x = x_full[keep]
        segc = ctx.seg_of_row[keep]
        st = segment_starts(segc)
        lens = np.diff(st)
        if len(x) == 0:
            return out
        seg_map = segc[st[:-1]]
        nseg_c = len(lens)
        seg_row = np.repeat(np.arange(nseg_c), lens)
        # chunk-segment mean, then centered moments (see class docstring)
        sx = _seg_reduce(x, seg_row, nseg_c)
        m = sx / np.maximum(lens, 1)
        xm = x - m[seg_row]
        for n in range(1, nlag + 1):
            if len(x) > n:
                mask = seg_row[:-n] == seg_row[n:]
                segm = seg_row[:-n][mask]
                h, t = xm[:-n][mask], xm[n:][mask]
                base = (n - 1) * 6
                blk = np.zeros((nseg_c, 6))
                blk[:, 0] = _seg_reduce(h * t, segm, nseg_c)
                blk[:, 1] = _seg_reduce(h, segm, nseg_c)
                blk[:, 2] = _seg_reduce(t, segm, nseg_c)
                blk[:, 3] = _seg_reduce(h * h, segm, nseg_c)
                blk[:, 4] = _seg_reduce(t * t, segm, nseg_c)
                blk[:, 5] = np.bincount(segm, minlength=nseg_c)
                out[seg_map, base : base + 6] = blk
        g = 6 * nlag
        m2 = _seg_reduce(xm * xm, seg_row, nseg_c)
        out[seg_map, g] = m
        out[seg_map, g + 1] = m2
        out[seg_map, g + 2] = lens
        # boundary values: first/last min(nlag, len) valid values per segment
        b = g + 3
        for j in range(nlag):
            has = lens > j
            pi = st[:-1][has] + j
            out[seg_map[has], b + j] = x[pi]
            out[seg_map[has], b + nlag + j] = 1.0
            si = st[1:][has] - 1 - j
            # suffix stored last-value-first at slot j = distance from end
            out[seg_map[has], b + 2 * nlag + j] = x[si]
            out[seg_map[has], b + 3 * nlag + j] = 1.0
        return out

    def merge_ordered(self, rows: np.ndarray) -> np.ndarray:
        """Fold (n_chunks, width) chunk partials in chunk order into the
        final per-conversation feature vector."""
        nlag = self.nlag
        g = 6 * nlag
        b = g + 3
        # pass 1: Chan-combine per-chunk (N, m, M2) -> global (N, mu, M2)
        N = 0.0
        mu = 0.0
        M2 = 0.0
        for row in rows:
            nb = row[g + 2]
            if nb == 0:
                continue
            if N == 0:
                N, mu, M2 = nb, row[g], row[g + 1]
                continue
            delta = row[g] - mu
            tot = N + nb
            mu += delta * nb / tot
            M2 += row[g + 1] + delta * delta * N * nb / tot
            N = tot
        # pass 2: shift each chunk's centered stats to the global mean and
        # add cross-boundary pairs (centered on mu directly).  Only a running
        # SUFFIX (last min(nlag, N) raw values so far, in order) is needed:
        # every cross-boundary pair has its head in the suffix and its tail
        # in the incoming chunk's prefix values.
        stats = np.zeros((nlag, 6))
        suffix: np.ndarray = np.zeros(0)
        seen = 0.0
        for row in rows:
            nr = int(row[g + 2])
            if nr == 0:
                continue
            pre_m = row[b + nlag : b + 2 * nlag].astype(bool)
            pre = row[b : b + nlag][pre_m]  # first values, in order
            suf_m = row[b + 3 * nlag : b + 4 * nlag].astype(bool)
            suf = row[b + 2 * nlag : b + 3 * nlag][suf_m][::-1]  # in order
            la = len(suffix)
            # cross-boundary pairs per lag from (left suffix, right prefix)
            for n in range(1, nlag + 1):
                lo = max(0, n - la)
                hi = min(n, len(pre))
                for k in range(lo, hi):
                    u = suffix[la - (n - k)] - mu
                    v = pre[k] - mu
                    s = stats[n - 1]
                    s[0] += u * v
                    s[1] += u
                    s[2] += v
                    s[3] += u * u
                    s[4] += v * v
                    s[5] += 1
            blk = row[:g].reshape(nlag, 6)
            d = row[g] - mu  # chunk mean minus global mean: O(std) scale
            cnt = blk[:, 5]
            shifted = np.empty_like(blk)
            shifted[:, 0] = blk[:, 0] + d * (blk[:, 1] + blk[:, 2]) + cnt * d * d
            shifted[:, 1] = blk[:, 1] + cnt * d
            shifted[:, 2] = blk[:, 2] + cnt * d
            shifted[:, 3] = blk[:, 3] + 2.0 * d * blk[:, 1] + cnt * d * d
            shifted[:, 4] = blk[:, 4] + 2.0 * d * blk[:, 2] + cnt * d * d
            shifted[:, 5] = cnt
            stats += shifted
            seen += nr
            suffix = np.concatenate([suffix, suf])[-min(nlag, int(seen)):]
        return self._finalize_stats(stats, np.array([mu, M2, N]))

    def _finalize_stats(self, stats: np.ndarray, glob: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class NMBroto(_LagBase):
    """Normalized Moreau-Broto: ``Σ x_j·x_{j+n} / (N-n)`` (feature.py:1473-1475)."""

    def __init__(self, spec, nlag: int = 4, prefix: str = "nmbroto"):
        super().__init__(spec, nlag, prefix)

    def apply(self, ctx: ConvContext) -> np.ndarray:
        x, st, seg_map, lens, nseg_c, seg_row = self._prep(ctx)
        cols = np.zeros((nseg_c, self.nlag), dtype=np.float64)
        m = len(x)
        for n in range(1, self.nlag + 1):
            if m <= n:
                break
            mask = seg_row[:-n] == seg_row[n:]
            prod = x[:-n] * x[n:]
            s = _seg_reduce(prod[mask], seg_row[:-n][mask], nseg_c)
            cnt = np.maximum(lens - n, 0).astype(np.float64)
            cols[:, n - 1] = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), 0.0)
        return self._emit(ctx, cols, seg_map)

    def _finalize_stats(self, stats: np.ndarray, glob: np.ndarray) -> np.ndarray:
        # raw moment Σ h·t reconstructed from the mu-centered stats; every
        # term is ADDED (the dominant cnt·mu² term is not a near-cancelling
        # difference), so this is safe at any |mean|/std ratio
        mu = glob[0]
        sxy, sh, st, _, _, cnt = stats.T
        raw = sxy + mu * (sh + st) + cnt * mu * mu
        return np.where(cnt > 0, raw / np.where(cnt == 0, 1, cnt), 0.0)


class AutoCovariance(_LagBase):
    """AC: mean-centered auto-covariance per lag (feature.py:1620-1669)."""

    def __init__(self, spec, nlag: int = 4, prefix: str = "ac"):
        super().__init__(spec, nlag, prefix)

    def apply(self, ctx: ConvContext) -> np.ndarray:
        x, st, seg_map, lens, nseg_c, seg_row = self._prep(ctx)
        mean = _seg_reduce(x, seg_row, nseg_c)
        mean /= np.maximum(lens, 1)
        xc = x - mean[seg_row]
        cols = np.zeros((nseg_c, self.nlag), dtype=np.float64)
        m = len(x)
        for n in range(1, self.nlag + 1):
            if m <= n:
                break
            mask = seg_row[:-n] == seg_row[n:]
            prod = xc[:-n] * xc[n:]
            s = _seg_reduce(prod[mask], seg_row[:-n][mask], nseg_c)
            cnt = np.maximum(lens - n, 0).astype(np.float64)
            cols[:, n - 1] = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), 0.0)
        return self._emit(ctx, cols, seg_map)

    def _finalize_stats(self, stats: np.ndarray, glob: np.ndarray) -> np.ndarray:
        _mu, _M2, N = glob
        if N == 0:
            return np.zeros(self.nlag)
        # stats arrive centered on the global mean: Σ(h-μ)(t-μ) IS the AC sum
        sxy, _sh, _st, _, _, cnt = stats.T
        return np.where(cnt > 0, sxy / np.where(cnt == 0, 1, cnt), 0.0)


class Moran(_LagBase):
    """Moran's I (feature.py:1533-1538): lag-covariance over variance, both
    centered on the per-conversation mean."""

    def __init__(self, spec, nlag: int = 4, prefix: str = "moran"):
        super().__init__(spec, nlag, prefix)

    def apply(self, ctx: ConvContext) -> np.ndarray:
        x, st, seg_map, lens, nseg_c, seg_row = self._prep(ctx)
        mean = _seg_reduce(x, seg_row, nseg_c)
        mean /= np.maximum(lens, 1)
        xc = x - mean[seg_row]
        var = _seg_reduce(xc * xc, seg_row, nseg_c) / np.maximum(lens, 1)
        cols = np.zeros((nseg_c, self.nlag), dtype=np.float64)
        m = len(x)
        for n in range(1, self.nlag + 1):
            if m <= n:
                break
            mask = seg_row[:-n] == seg_row[n:]
            prod = xc[:-n] * xc[n:]
            s = _seg_reduce(prod[mask], seg_row[:-n][mask], nseg_c)
            cnt = np.maximum(lens - n, 0).astype(np.float64)
            num = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), 0.0)
            cols[:, n - 1] = np.where(var > 0, num / np.where(var == 0, 1, var), 0.0)
        return self._emit(ctx, cols, seg_map)

    def _finalize_stats(self, stats: np.ndarray, glob: np.ndarray) -> np.ndarray:
        _mu, M2, N = glob
        if N == 0:
            return np.zeros(self.nlag)
        var = M2 / N  # centered second moment: no E[x²]-μ² cancellation
        sxy, _sh, _st, _, _, cnt = stats.T
        num = np.where(cnt > 0, sxy / np.where(cnt == 0, 1, cnt), 0.0)
        return np.where(var > 0, num / np.where(var == 0, 1, var), 0.0)


class Geary(_LagBase):
    """Geary's C (feature.py:1596-1600):
    ``(N-1)/(2(N-n)) · Σ(x_j - x_{j+n})² / Σ(x_j - x̄)²``."""

    def __init__(self, spec, nlag: int = 4, prefix: str = "geary"):
        super().__init__(spec, nlag, prefix)

    def apply(self, ctx: ConvContext) -> np.ndarray:
        x, st, seg_map, lens, nseg_c, seg_row = self._prep(ctx)
        mean = _seg_reduce(x, seg_row, nseg_c)
        mean /= np.maximum(lens, 1)
        xc = x - mean[seg_row]
        ss = _seg_reduce(xc * xc, seg_row, nseg_c)
        cols = np.zeros((nseg_c, self.nlag), dtype=np.float64)
        m = len(x)
        for n in range(1, self.nlag + 1):
            if m <= n:
                break
            mask = seg_row[:-n] == seg_row[n:]
            diff = x[:-n] - x[n:]
            s = _seg_reduce((diff * diff)[mask], seg_row[:-n][mask], nseg_c)
            cnt = np.maximum(lens - n, 0).astype(np.float64)
            coef = np.where(
                cnt > 0, (lens - 1) / (2.0 * np.where(cnt == 0, 1, cnt)), 0.0
            )
            cols[:, n - 1] = np.where(ss > 0, coef * s / np.where(ss == 0, 1, ss), 0.0)
        return self._emit(ctx, cols, seg_map)

    def _finalize_stats(self, stats: np.ndarray, glob: np.ndarray) -> np.ndarray:
        _mu, M2, N = glob
        if N == 0:
            return np.zeros(self.nlag)
        ss = M2  # Σ(x-μ)² directly from the Chan combine
        sxy, _sh, _st, sh2, st2, cnt = stats.T
        # Σ(x_j - x_{j+n})² = Σ((h-μ)-(t-μ))² — centering cancels exactly,
        # and every term here is O(std²) scale
        s = sh2 - 2.0 * sxy + st2
        coef = np.where(cnt > 0, (N - 1) / (2.0 * np.where(cnt == 0, 1, cnt)), 0.0)
        return np.where(ss > 0, coef * s / np.where(ss == 0, 1, ss), 0.0)


class CrossCovariance:
    """CC (feature.py:1670-1722): lagged cross-covariance between two series."""

    def __init__(self, spec_a, spec_b, nlag: int = 4, prefix: str = "cc"):
        self.spec_a = spec_a
        self.spec_b = spec_b
        self.nlag = nlag
        self.prefix = prefix

    def names(self) -> list[str]:
        return [f"{self.prefix}_lag{n}" for n in range(1, self.nlag + 1)]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        # require both series valid at a row (join on row validity)
        ka, aa = self.spec_a
        kb, ab = self.spec_b
        xa_full = (
            ctx.numeric(aa)
            if ka == "col"
            else np.where(ctx.codes >= 0, np.asarray(aa)[np.clip(ctx.codes, 0, None)], np.nan)
        )
        xb_full = (
            ctx.numeric(ab)
            if kb == "col"
            else np.where(ctx.codes >= 0, np.asarray(ab)[np.clip(ctx.codes, 0, None)], np.nan)
        )
        valid = ~np.isnan(xa_full) & ~np.isnan(xb_full)
        xa, xb = xa_full[valid], xb_full[valid]
        segc = ctx.seg_of_row[valid]
        st = segment_starts(segc)
        lens = np.diff(st)
        nseg_c = len(lens)
        seg_map = segc[st[:-1]] if len(xa) else np.zeros(0, dtype=np.int64)
        seg_row = np.repeat(np.arange(nseg_c), lens)
        mean_a = _seg_reduce(xa, seg_row, nseg_c)
        mean_a /= np.maximum(lens, 1)
        mean_b = _seg_reduce(xb, seg_row, nseg_c)
        mean_b /= np.maximum(lens, 1)
        ca = xa - mean_a[seg_row]
        cb = xb - mean_b[seg_row]
        cols = np.zeros((nseg_c, self.nlag), dtype=np.float64)
        m = len(xa)
        for n in range(1, self.nlag + 1):
            if m <= n:
                break
            mask = seg_row[:-n] == seg_row[n:]
            prod = ca[:-n] * cb[n:]
            s = _seg_reduce(prod[mask], seg_row[:-n][mask], nseg_c)
            cnt = np.maximum(lens - n, 0).astype(np.float64)
            cols[:, n - 1] = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), 0.0)
        out = np.zeros((ctx.n_segs, self.nlag), dtype=np.float64)
        out[seg_map] = cols
        return out


class SOCNumber:
    """Sequence-order coupling (feature.py:2149-2197): ``τ_n = Σ d(c_j,
    c_{j+n})² / (N-n)`` with a letter-distance matrix.  ``dist`` is a
    (A, A) matrix of fixed literals (the Schneider-Wrede / Grantham analogue,
    feature.py:2152-2175)."""

    def __init__(self, dist: np.ndarray, nlag: int = 3, prefix: str = "soc"):
        self.dist = np.asarray(dist, dtype=np.float64)
        self.nlag = nlag
        self.prefix = prefix

    def names(self) -> list[str]:
        return [f"{self.prefix}_tau{n}" for n in range(1, self.nlag + 1)]

    # decomposable: lags are RAW-positional (pair anchored at its later row,
    # the context prefix supplies earlier elements), so the standard
    # sum-merge protocol applies; partials = per-lag Σ d² + own-row count
    # (allclose vs unchunked — chunk sums reorder float addition)

    @property
    def lookback(self):
        return self.nlag

    @property
    def counts_width(self):
        return self.nlag + 1

    def _pair_sums(self, ctx: ConvContext, anchor: np.ndarray | None):
        """Per-segment per-lag Σ d²(c_i, c_{i+n}) with anchored pairs, plus
        the own-row count (the raw length term of every denominator)."""
        codes, seg = ctx.codes, ctx.seg_of_row
        d2 = self.dist * self.dist
        sums = np.zeros((ctx.n_segs, self.nlag), dtype=np.float64)
        for n in range(1, self.nlag + 1):
            if ctx.n <= n:
                break
            a, b = codes[:-n], codes[n:]
            mask = (seg[:-n] == seg[n:]) & (a >= 0) & (b >= 0)
            if anchor is not None:
                mask &= anchor[n:]
            vals = d2[a[mask], b[mask]]
            sums[:, n - 1] = _seg_reduce(vals, seg[:-n][mask], ctx.n_segs)
        if anchor is None:
            own_len = ctx.lengths.astype(np.float64)
        else:
            own_len = _seg_reduce(anchor.astype(np.float64), seg, ctx.n_segs)
        return sums, own_len

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        sums, own_len = self._pair_sums(ctx, anchor)
        return np.concatenate([sums, own_len[:, None]], axis=1)

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        sums = counts[:, : self.nlag]
        lens = counts[:, self.nlag]
        cols = np.zeros_like(sums)
        for n in range(1, self.nlag + 1):
            cnt = np.maximum(lens - n, 0).astype(np.float64)
            cols[:, n - 1] = np.where(
                cnt > 0, sums[:, n - 1] / np.where(cnt == 0, 1, cnt), 0.0
            )
        return cols

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))


class QSOrder:
    """Quasi-sequence-order (feature.py:2198-2270): letter frequencies damped
    by ``1 + w·Στ`` plus the ``w·τ_d`` order terms."""

    def __init__(self, letters: list[str], dist: np.ndarray, nlag: int = 3,
                 weight: float = 0.1, prefix: str = "qso"):
        self.letters = letters
        self.soc = SOCNumber(dist, nlag=nlag)
        self.nlag = nlag
        self.weight = weight
        self.prefix = prefix

    def names(self) -> list[str]:
        return [f"{self.prefix}_f_{s}" for s in self.letters] + [
            f"{self.prefix}_tau{n}" for n in range(1, self.nlag + 1)
        ]

    # decomposable via the same raw-positional scheme as SOCNumber:
    # partials = unigram counts + the SOC pair sums + own length

    @property
    def lookback(self):
        return self.nlag

    @property
    def counts_width(self):
        return len(self.letters) + self.soc.counts_width

    def _unigram(self, ctx: ConvContext, anchor: np.ndarray | None) -> np.ndarray:
        A = len(self.letters)
        if anchor is None:
            return _seg_code_counts(
                ctx.seg_of_row, ctx.codes, ctx.n_segs, A
            ).astype(np.float64)
        sel = (ctx.codes >= 0) & anchor
        return _seg_code_counts(
            ctx.seg_of_row[sel], ctx.codes[sel], ctx.n_segs, A
        ).astype(np.float64)

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        return np.concatenate(
            [self._unigram(ctx, anchor), self.soc.counts(ctx, anchor)], axis=1
        )

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        A = len(self.letters)
        uni = counts[:, :A].astype(np.float64)
        tau = self.soc.finalize(counts[:, A:])
        denom = uni.sum(axis=1, keepdims=True) + self.weight * tau.sum(
            axis=1, keepdims=True
        )
        denom[denom == 0] = 1.0
        return np.concatenate([uni / denom, self.weight * tau / denom], axis=1)

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))


class PAAC:
    """Pseudo composition (feature.py:2271-2327): letter composition plus λ
    lag-correlation θ terms, θ_n = mean over j of R(c_j, c_{j+n}) where R is
    the mean squared z-scored property difference (feature.py:2309-2319)."""

    def __init__(self, letters: list[str], prop_table: np.ndarray, lam: int = 3,
                 weight: float = 0.05, prefix: str = "paac"):
        self.letters = letters
        self.props = znorm_table(prop_table)
        self.lam = lam
        self.weight = weight
        self.prefix = prefix

    def names(self) -> list[str]:
        return [f"{self.prefix}_f_{s}" for s in self.letters] + [
            f"{self.prefix}_theta{n}" for n in range(1, self.lam + 1)
        ]

    # decomposable (raw-positional lags): partials = unigram counts +
    # per-lag Σ R(c_i, c_{i+n}) + own length

    @property
    def lookback(self):
        return self.lam

    @property
    def counts_width(self):
        return len(self.letters) + self.lam + 1

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        A = len(self.letters)
        codes, seg = ctx.codes, ctx.seg_of_row
        # R(a,b) = mean over properties of (p(a) - p(b))^2
        P = self.props  # (A, k)
        diff = P[:, None, :] - P[None, :, :]
        R = (diff * diff).mean(axis=2)  # (A, A)
        sums = np.zeros((ctx.n_segs, self.lam), dtype=np.float64)
        for n in range(1, self.lam + 1):
            if ctx.n <= n:
                break
            a, b = codes[:-n], codes[n:]
            mask = (seg[:-n] == seg[n:]) & (a >= 0) & (b >= 0)
            if anchor is not None:
                mask &= anchor[n:]
            sums[:, n - 1] = _seg_reduce(
                R[a[mask], b[mask]], seg[:-n][mask], ctx.n_segs)
        if anchor is None:
            sel = codes >= 0
            uni = _seg_code_counts(
                seg[sel], codes[sel], ctx.n_segs, A).astype(np.float64)
            own_len = ctx.lengths.astype(np.float64)
        else:
            sel = (codes >= 0) & anchor
            uni = _seg_code_counts(
                seg[sel], codes[sel], ctx.n_segs, A).astype(np.float64)
            own_len = _seg_reduce(anchor.astype(np.float64), seg, ctx.n_segs)
        return np.concatenate([uni, sums, own_len[:, None]], axis=1)

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        A = len(self.letters)
        uni = counts[:, :A]
        sums = counts[:, A : A + self.lam]
        lens = counts[:, A + self.lam]
        thetas = np.zeros_like(sums)
        for n in range(1, self.lam + 1):
            cnt = np.maximum(lens - n, 0).astype(np.float64)
            thetas[:, n - 1] = np.where(
                cnt > 0, sums[:, n - 1] / np.where(cnt == 0, 1, cnt), 0.0
            )
        denom = uni.sum(axis=1, keepdims=True) + self.weight * thetas.sum(
            axis=1, keepdims=True
        )
        denom[denom == 0] = 1.0
        return np.concatenate(
            [uni / denom, self.weight * thetas / denom], axis=1
        )

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))


class APAAC:
    """Amphiphilic pseudo composition (feature.py:2328-2383): like PAAC but
    with per-property lag products ``p_k(c_j)·p_k(c_{j+n})`` as the coupling
    terms (feature.py:2364-2369)."""

    def __init__(self, letters: list[str], prop_table: np.ndarray, lam: int = 3,
                 weight: float = 0.05, prefix: str = "apaac"):
        self.letters = letters
        self.props = znorm_table(prop_table)
        self.lam = lam
        self.weight = weight
        self.prefix = prefix

    def names(self) -> list[str]:
        k = self.props.shape[1]
        return [f"{self.prefix}_f_{s}" for s in self.letters] + [
            f"{self.prefix}_tau{n}p{j}" for n in range(1, self.lam + 1) for j in range(k)
        ]

    # decomposable (raw-positional lags): partials = unigram counts +
    # per-(lag, property) Σ p_j(c_i)·p_j(c_{i+n}) + own length

    @property
    def lookback(self):
        return self.lam

    @property
    def counts_width(self):
        return len(self.letters) + self.lam * self.props.shape[1] + 1

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        A = len(self.letters)
        k = self.props.shape[1]
        codes, seg = ctx.codes, ctx.seg_of_row
        sums = np.zeros((ctx.n_segs, self.lam * k), dtype=np.float64)
        for n in range(1, self.lam + 1):
            if ctx.n <= n:
                break
            a, b = codes[:-n], codes[n:]
            mask = (seg[:-n] == seg[n:]) & (a >= 0) & (b >= 0)
            if anchor is not None:
                mask &= anchor[n:]
            segm = seg[:-n][mask]
            for j in range(k):
                prod = self.props[a[mask], j] * self.props[b[mask], j]
                sums[:, (n - 1) * k + j] = _seg_reduce(
                    prod, segm, ctx.n_segs)
        sel = codes >= 0
        if anchor is not None:
            sel = sel & anchor
        uni = _seg_code_counts(
            seg[sel], codes[sel], ctx.n_segs, A).astype(np.float64)
        if anchor is None:
            own_len = ctx.lengths.astype(np.float64)
        else:
            own_len = _seg_reduce(anchor.astype(np.float64), seg, ctx.n_segs)
        return np.concatenate([uni, sums, own_len[:, None]], axis=1)

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        A = len(self.letters)
        k = self.props.shape[1]
        uni = counts[:, :A]
        sums = counts[:, A : A + self.lam * k]
        lens = counts[:, A + self.lam * k]
        taus = np.zeros_like(sums)
        for n in range(1, self.lam + 1):
            cnt = np.maximum(lens - n, 0).astype(np.float64)
            safe = np.where(cnt == 0, 1, cnt)
            for j in range(k):
                c = (n - 1) * k + j
                taus[:, c] = np.where(cnt > 0, sums[:, c] / safe, 0.0)
        denom = uni.sum(axis=1, keepdims=True) + self.weight * taus.sum(
            axis=1, keepdims=True
        )
        denom[denom == 0] = 1.0
        return np.concatenate(
            [uni / denom, self.weight * taus / denom], axis=1
        )

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))


class ACC:
    """ACC (feature.py:1723-1789): concatenation of the AC block and the CC
    block — one kernel so the pair shares the conversation pass."""

    def __init__(self, spec_a, spec_b, nlag: int = 4):
        self.ac = AutoCovariance(spec_a, nlag=nlag, prefix="acc_ac")
        self.cc = CrossCovariance(spec_a, spec_b, nlag=nlag, prefix="acc_cc")

    def names(self) -> list[str]:
        return self.ac.names() + self.cc.names()

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return np.concatenate([self.ac.apply(ctx), self.cc.apply(ctx)], axis=1)


# Deterministic literal distance matrix for the 5-letter events alphabet
# (Schneider-Wrede / Grantham analogue, feature.py:2152-2175).  FROZEN.
EVENT_DISTANCE = np.array(
    [
        [0.00, 0.62, 0.31, 0.45, 0.18],
        [0.62, 0.00, 0.77, 0.52, 0.40],
        [0.31, 0.77, 0.00, 0.29, 0.66],
        [0.45, 0.52, 0.29, 0.00, 0.71],
        [0.18, 0.40, 0.66, 0.71, 0.00],
    ]
)
