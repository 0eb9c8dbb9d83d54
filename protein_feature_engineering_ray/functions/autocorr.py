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
same-segment masks, per-conversation sums via ``np.add.at``.  A NaN prefix
(e.g. first-turn latency) is compacted away per segment before lagging.
"""

from __future__ import annotations

import numpy as np

from protein_feature_engineering_ray.core.bucket import segment_starts
from protein_feature_engineering_ray.core.context import ConvContext


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
    out = np.zeros(n_segs, dtype=np.float64)
    np.add.at(out, seg_row, values)
    return out


class _LagBase:
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


class AutoCovariance(_LagBase):
    """AC: mean-centered auto-covariance per lag (feature.py:1620-1669)."""

    def __init__(self, spec, nlag: int = 4, prefix: str = "ac"):
        super().__init__(spec, nlag, prefix)

    def apply(self, ctx: ConvContext) -> np.ndarray:
        x, st, seg_map, lens, nseg_c, seg_row = self._prep(ctx)
        mean = np.zeros(nseg_c)
        np.add.at(mean, seg_row, x)
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


class Moran(_LagBase):
    """Moran's I (feature.py:1533-1538): lag-covariance over variance, both
    centered on the per-conversation mean."""

    def __init__(self, spec, nlag: int = 4, prefix: str = "moran"):
        super().__init__(spec, nlag, prefix)

    def apply(self, ctx: ConvContext) -> np.ndarray:
        x, st, seg_map, lens, nseg_c, seg_row = self._prep(ctx)
        mean = np.zeros(nseg_c)
        np.add.at(mean, seg_row, x)
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


class Geary(_LagBase):
    """Geary's C (feature.py:1596-1600):
    ``(N-1)/(2(N-n)) · Σ(x_j - x_{j+n})² / Σ(x_j - x̄)²``."""

    def __init__(self, spec, nlag: int = 4, prefix: str = "geary"):
        super().__init__(spec, nlag, prefix)

    def apply(self, ctx: ConvContext) -> np.ndarray:
        x, st, seg_map, lens, nseg_c, seg_row = self._prep(ctx)
        mean = np.zeros(nseg_c)
        np.add.at(mean, seg_row, x)
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
        mean_a = np.zeros(nseg_c)
        np.add.at(mean_a, seg_row, xa)
        mean_a /= np.maximum(lens, 1)
        mean_b = np.zeros(nseg_c)
        np.add.at(mean_b, seg_row, xb)
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
            s = np.zeros(nseg_c)
            np.add.at(s, seg_row[:-n][mask], prod[mask])
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

    def apply(self, ctx: ConvContext) -> np.ndarray:
        codes = ctx.codes
        seg = ctx.seg_of_row
        d2 = self.dist * self.dist
        cols = np.zeros((ctx.n_segs, self.nlag), dtype=np.float64)
        for n in range(1, self.nlag + 1):
            if ctx.n <= n:
                break
            a, b = codes[:-n], codes[n:]
            mask = (seg[:-n] == seg[n:]) & (a >= 0) & (b >= 0)
            vals = d2[a[mask], b[mask]]
            s = np.zeros(ctx.n_segs)
            np.add.at(s, seg[:-n][mask], vals)
            cnt = np.maximum(ctx.lengths - n, 0).astype(np.float64)
            cols[:, n - 1] = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), 0.0)
        return cols


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

    def apply(self, ctx: ConvContext) -> np.ndarray:
        from protein_feature_engineering_ray.functions.composition import (
            _seg_code_counts,
        )

        A = len(self.letters)
        counts = _seg_code_counts(ctx.seg_of_row, ctx.codes, ctx.n_segs, A).astype(
            np.float64
        )
        tau = self.soc.apply(ctx)  # (n_segs, nlag)
        denom = counts.sum(axis=1, keepdims=True) + self.weight * tau.sum(
            axis=1, keepdims=True
        )
        denom[denom == 0] = 1.0
        f = counts / denom
        tq = self.weight * tau / denom
        return np.concatenate([f, tq], axis=1)


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

    def apply(self, ctx: ConvContext) -> np.ndarray:
        from protein_feature_engineering_ray.functions.composition import (
            _seg_code_counts,
        )

        A = len(self.letters)
        codes, seg = ctx.codes, ctx.seg_of_row
        # R(a,b) = mean over properties of (p(a) - p(b))^2
        P = self.props  # (A, k)
        diff = P[:, None, :] - P[None, :, :]
        R = (diff * diff).mean(axis=2)  # (A, A)
        thetas = np.zeros((ctx.n_segs, self.lam), dtype=np.float64)
        for n in range(1, self.lam + 1):
            if ctx.n <= n:
                break
            a, b = codes[:-n], codes[n:]
            mask = (seg[:-n] == seg[n:]) & (a >= 0) & (b >= 0)
            s = np.zeros(ctx.n_segs)
            np.add.at(s, seg[:-n][mask], R[a[mask], b[mask]])
            cnt = np.maximum(ctx.lengths - n, 0).astype(np.float64)
            thetas[:, n - 1] = np.where(cnt > 0, s / np.where(cnt == 0, 1, cnt), 0.0)
        counts = _seg_code_counts(seg, codes, ctx.n_segs, A).astype(np.float64)
        denom = counts.sum(axis=1, keepdims=True) + self.weight * thetas.sum(
            axis=1, keepdims=True
        )
        denom[denom == 0] = 1.0
        f = counts / denom
        th = self.weight * thetas / denom
        return np.concatenate([f, th], axis=1)


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

    def apply(self, ctx: ConvContext) -> np.ndarray:
        from protein_feature_engineering_ray.functions.composition import (
            _seg_code_counts,
        )

        A = len(self.letters)
        k = self.props.shape[1]
        codes, seg = ctx.codes, ctx.seg_of_row
        taus = np.zeros((ctx.n_segs, self.lam * k), dtype=np.float64)
        for n in range(1, self.lam + 1):
            if ctx.n <= n:
                break
            a, b = codes[:-n], codes[n:]
            mask = (seg[:-n] == seg[n:]) & (a >= 0) & (b >= 0)
            segm = seg[:-n][mask]
            cnt = np.maximum(ctx.lengths - n, 0).astype(np.float64)
            for j in range(k):
                prod = self.props[a[mask], j] * self.props[b[mask], j]
                s = np.zeros(ctx.n_segs)
                np.add.at(s, segm, prod)
                taus[:, (n - 1) * k + j] = np.where(
                    cnt > 0, s / np.where(cnt == 0, 1, cnt), 0.0
                )
        counts = _seg_code_counts(seg, codes, ctx.n_segs, A).astype(np.float64)
        denom = counts.sum(axis=1, keepdims=True) + self.weight * taus.sum(
            axis=1, keepdims=True
        )
        denom[denom == 0] = 1.0
        return np.concatenate(
            [counts / denom, self.weight * taus / denom], axis=1
        )


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
