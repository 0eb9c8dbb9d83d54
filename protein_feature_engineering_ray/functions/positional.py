"""Per-turn (entity × timestamp) kernels (SURVEY.md §2.3, §2.4 lag core).

Each kernel emits one row per turn — the north rule's feature stack.  All are
vectorized across every conversation in the bucket via segment-aware shifted
arrays and cumulative sums; window starts are clamped to segment starts so no
window ever crosses a conversation boundary.

Counting-based outputs are exact integer arithmetic + one division, matching
SQL window functions (``ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW``)
bit-for-bit.
Kernels declare ``lookback``: the number of PRECEDING same-conversation rows
their output at a row depends on (0 = none, int = bounded, None = unbounded /
whole conversation).  Bounded-lookback kernels are eligible for chunked
mega-conversation processing (executor.turn_features_chunked).
"""

from __future__ import annotations

import numpy as np

from protein_feature_engineering_ray.core.context import ConvContext
from protein_feature_engineering_ray.functions.composition import (
    _scatter_add1,
)


def _win_start(ctx: ConvContext, w: int) -> np.ndarray:
    """Index of the first row of the backward window of width w at each row."""
    i = np.arange(ctx.n, dtype=np.int64)
    return np.maximum(i - w + 1, ctx.starts[ctx.seg_of_row])


class OneHot:
    """Per-turn one-hot role encoding (``_binary``, feature.py:626-654; grouped
    variants 655-997).  Unknown role -> all zeros (the reference's ``-`` row,
    feature.py:640-646)."""

    lookback = 0

    def __init__(self, letters: list[str], grouped: bool = False, prefix: str | None = None):
        self.letters = letters
        self.grouped = grouped
        self.prefix = prefix or ("gonehot" if grouped else "onehot")

    def names(self) -> list[str]:
        return [f"{self.prefix}_{s}" for s in self.letters]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        codes = ctx.group_codes if self.grouped else ctx.codes
        A = len(self.letters)
        out = np.zeros((ctx.n, A), dtype=np.float64)
        valid = codes >= 0
        out[np.flatnonzero(valid), codes[valid]] = 1.0
        return out


class PropertyLookup:
    """Per-turn static property vector per role (ZScale feature.py:1335-1381,
    BLOSUM62 1382-1427, AAIndex 1281-1334, AESNN3 998-1044 analogues).

    ``table`` is a (len(letters), k) float matrix of fixed literals (so the
    DuckDB oracle can embed the identical constants); unknown roles -> 0 rows
    (reference feature.py:1320-1326).
    """

    lookback = 0

    def __init__(self, letters: list[str], table: np.ndarray, prefix: str = "prop"):
        self.letters = letters
        self.table = np.asarray(table, dtype=np.float64)
        assert self.table.shape[0] == len(letters)
        self.prefix = prefix

    def names(self) -> list[str]:
        return [f"{self.prefix}_{j}" for j in range(self.table.shape[1])]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        codes = ctx.codes
        out = np.zeros((ctx.n, self.table.shape[1]), dtype=np.float64)
        valid = codes >= 0
        out[valid] = self.table[codes[valid]]
        return out


# Fixed literal property table for the 5-letter events alphabet — the ZScale
# analogue (values are arbitrary but FROZEN; the oracle SQL embeds the same
# literals).  Rows in alphabet order: click, error, purchase, signup, view.
EVENT_ZSCALE = np.array(
    [
        [0.24, -2.32, 0.60],
        [3.98, 0.93, 1.93],
        [-2.49, -0.62, -0.35],
        [2.18, 0.53, -1.14],
        [-4.28, -1.30, -1.49],
    ]
)

# AESNN3 analogue (feature.py:1003-1025): an alternative FROZEN 3-d code per
# letter — distinct table, same lookup mechanics.
EVENT_AESNN3 = np.array(
    [
        [-0.99, -0.61, 0.00],
        [0.28, -0.99, -0.22],
        [0.77, -0.90, 0.15],
        [-0.63, 0.98, 0.46],
        [0.10, 0.47, -0.11],
    ]
)

# BLOSUM-row analogue (feature.py:1382-1427): per-letter similarity profile
# over the whole alphabet (5 columns per letter), FROZEN symmetric matrix.
EVENT_BLOSUM = np.array(
    [
        [4.0, -1.0, 0.0, -2.0, 1.0],
        [-1.0, 5.0, -3.0, 0.0, -2.0],
        [0.0, -3.0, 6.0, 1.0, -1.0],
        [-2.0, 0.0, 1.0, 5.0, 0.0],
        [1.0, -2.0, -1.0, 0.0, 4.0],
    ]
)


class MultiHotProperties:
    """Overlapping (non-exclusive) property membership bits per turn — the
    OPF family analogue (``_OPF_10bit``/``_OPF_7bit_*``, feature.py:2384-2538:
    one bit per property, a letter may set several).

    ``props`` maps property name -> tuple of member letters (literals, so the
    SQL oracle can embed identical CASE lists).
    """

    lookback = 0

    def __init__(self, letters: list[str], props: dict[str, tuple[str, ...]],
                 prefix: str = "opf"):
        self.letters = letters
        self.props = props
        self.prefix = prefix

    def names(self) -> list[str]:
        return [f"{self.prefix}_{p}" for p in self.props]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        codes = ctx.codes
        out = np.zeros((ctx.n, len(self.props)), dtype=np.float64)
        for j, (_name, members) in enumerate(self.props.items()):
            member_codes = [self.letters.index(m) for m in members
                            if m in self.letters]
            out[:, j] = np.isin(codes, member_codes).astype(np.float64)
        return out


# Frozen overlapping property sets for the events alphabet (OPF analogue).
EVENT_PROPS = {
    "engaged": ("click", "purchase", "signup"),
    "monetary": ("purchase",),
    "problem": ("error",),
    "passive": ("view", "error"),
    "onboarding": ("signup", "view"),
}


class LagLead:
    """``lag(col, n)`` / ``lead(col, n)`` within conversation (SURVEY.md §2.4
    shifted-array core; reference lag pairing e.g. feature.py:1473-1475).
    Out-of-segment positions -> NaN (SQL NULL)."""

    def __init__(self, col: str, offsets: tuple[int, ...] = (1,), lead: bool = False,
                 prefix: str | None = None):
        self.col = col
        self.offsets = offsets
        self.lead = lead
        self.prefix = prefix or (("lead_" if lead else "lag_") + col)

    @property
    def lookback(self):
        return 0 if self.lead else max(self.offsets)

    @property
    def lookahead(self):
        # forward-looking offsets need a bounded CONTEXT SUFFIX (the first
        # rows of the next chunk), symmetric to the lag kernels' prefix
        return max(self.offsets) if self.lead else 0

    def names(self) -> list[str]:
        return [f"{self.prefix}_{n}" for n in self.offsets]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        x = ctx.numeric(self.col)
        out = np.full((ctx.n, len(self.offsets)), np.nan)
        for j, off in enumerate(self.offsets):
            if off >= ctx.n:
                continue
            ok = ctx.same_seg(off)
            if self.lead:
                out[: ctx.n - off, j] = np.where(ok, x[off:], np.nan)
            else:
                out[off:, j] = np.where(ok, x[: ctx.n - off], np.nan)
        return out


class Latency:
    """Inter-turn latency ``ts - lag(ts)`` in seconds (the per-turn numeric
    series the autocorrelation family consumes; north-star 'inter-turn latency
    stats').  First turn of a conversation -> NaN.  Exact: int64 µs difference
    divided by 1e6."""

    lookback = 1

    def names(self) -> list[str]:
        return ["latency_sec"]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        ts = ctx.ts_us
        out = np.full(ctx.n, np.nan)
        if ctx.n > 1:
            ok = ctx.same_seg(1)
            d = (ts[1:] - ts[:-1]).astype(np.float64) / 1e6
            out[1:] = np.where(ok, d, np.nan)
        return out.reshape(-1, 1)


class RollingComposition:
    """EAAC/EGAAC analogue (feature.py:456-486, 1078-1117): per-turn role
    frequency over the trailing ``w``-turn window (window clamped at the
    conversation start; divisor = actual window row count, mirroring
    feature.py:1101-1109)."""

    def __init__(self, letters: list[str], w: int = 5, grouped: bool = False,
                 prefix: str | None = None):
        self.letters = letters
        self.w = w
        self.grouped = grouped
        self.prefix = prefix or (f"egaac{w}" if grouped else f"eaac{w}")

    @property
    def lookback(self):
        return self.w - 1

    def names(self) -> list[str]:
        return [f"{self.prefix}_{s}" for s in self.letters]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        codes = ctx.group_codes if self.grouped else ctx.codes
        A = len(self.letters)
        ws = _win_start(ctx, self.w)
        i = np.arange(ctx.n, dtype=np.int64)
        width = (i - ws + 1).astype(np.float64)
        out = np.empty((ctx.n, A), dtype=np.float64)
        for c in range(A):
            cum = np.concatenate(([0], np.cumsum(codes == c)))
            out[:, c] = (cum[i + 1] - cum[ws]) / width
        return out


class ExpandingComposition:
    """Cumulative (expanding-window) role composition — the reference's
    *type-2 cumulative shell* semantics (feature.py:4292ff: 'everything up to
    horizon'), anchored per turn: share of each role among turns 0..j."""

    lookback = None  # unbounded: needs the whole conversation prefix

    def __init__(self, letters: list[str], grouped: bool = False, prefix: str | None = None):
        self.letters = letters
        self.grouped = grouped
        self.prefix = prefix or ("cumgaac" if grouped else "cumaac")

    def names(self) -> list[str]:
        return [f"{self.prefix}_{s}" for s in self.letters]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        codes = ctx.group_codes if self.grouped else ctx.codes
        A = len(self.letters)
        i = np.arange(ctx.n, dtype=np.int64)
        sstart = ctx.starts[ctx.seg_of_row]
        width = (i - sstart + 1).astype(np.float64)
        out = np.empty((ctx.n, A), dtype=np.float64)
        for c in range(A):
            cum = np.concatenate(([0], np.cumsum(codes == c)))
            out[:, c] = (cum[i + 1] - cum[sstart]) / width
        return out


class RollingStats:
    """Trailing-window stats of a numeric column: count / sum / mean / min /
    max over ``w`` turns (window-clamped per conversation).  NaN inputs are
    excluded like SQL NULLs, so results match ``SUM/AVG/MIN/MAX OVER (ROWS
    BETWEEN w-1 PRECEDING AND CURRENT ROW)``."""

    def __init__(self, col: str, w: int = 5, prefix: str | None = None):
        self.col = col
        self.w = w
        self.prefix = prefix or f"roll{w}_{col}"

    @property
    def lookback(self):
        return self.w - 1

    def names(self) -> list[str]:
        return [f"{self.prefix}_{s}" for s in ("count", "sum", "mean", "min", "max")]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        x = ctx.numeric(self.col)
        ok = ~np.isnan(x)
        x0 = np.where(ok, x, 0.0)
        ws = _win_start(ctx, self.w)
        i = np.arange(ctx.n, dtype=np.int64)
        cum_n = np.concatenate(([0], np.cumsum(ok)))
        cnt = (cum_n[i + 1] - cum_n[ws]).astype(np.float64)
        cum_s = np.concatenate(([0.0], np.cumsum(x0)))
        ssum = cum_s[i + 1] - cum_s[ws]
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(cnt > 0, ssum / cnt, np.nan)
        ssum = np.where(cnt > 0, ssum, np.nan)
        # min/max via per-row loop-free sliding trick: use stride windows only
        # for small w (w is a config constant, typically <= 32)
        mn = np.full(ctx.n, np.nan)
        mx = np.full(ctx.n, np.nan)
        xm = np.where(ok, x, np.inf)
        xM = np.where(ok, x, -np.inf)
        for off in range(self.w):
            j = i - off
            valid = j >= ws
            jj = np.clip(j, 0, ctx.n - 1)
            cand_m = np.where(valid, xm[jj], np.inf)
            cand_M = np.where(valid, xM[jj], -np.inf)
            mn = np.fmin(mn, np.where(np.isinf(cand_m), np.nan, cand_m))
            mx = np.fmax(mx, np.where(np.isinf(cand_M), np.nan, cand_M))
        return np.stack([cnt, ssum, mean, mn, mx], axis=1)


class PositionFeatures:
    """Per-turn position block: 0-based index, reverse index, relative
    position in [0,1] (reference positional headers, e.g. feature.py:465-467)."""

    lookback = None  # needs the conversation length

    def names(self) -> list[str]:
        return ["pos_idx", "pos_rev", "pos_frac"]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        pos = ctx.pos.astype(np.float64)
        L = ctx.lengths[ctx.seg_of_row].astype(np.float64)
        rev = L - 1 - pos
        frac = np.where(L > 1, pos / (L - 1), 0.0)
        return np.stack([pos, rev, frac], axis=1)


class TextLen:
    """Per-turn text length in characters — cheap per-turn numeric property
    (the notebooks' tokenized-length analogue, ESM_embed.ipynb cell 2)."""

    lookback = 0
    needs_text = True  # pruned reads must keep the text column for this kernel

    def names(self) -> list[str]:
        return ["text_len"]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        import pyarrow.compute as pc

        lens = pc.fill_null(pc.utf8_length(ctx.table["text"]), 0)
        out = lens.to_numpy(zero_copy_only=False).astype(np.float64)
        return out.reshape(-1, 1)


class ShellComposition:
    """Concentric-shell neighborhood composition — the ``get_atom_descriptor``
    analogue (feature.py:4178-4218: per-atom counts of each element type in
    concentric distance shells around a residue).  Here the 'atom' is the
    turn and distance is |Δ turn_idx|: for every turn, the count of each role
    among same-conversation turns at distance d in shell s = [lo_s, hi_s]
    (both directions).  Integer counts -> bit-exact SQL oracle.

    Bounded lookback AND lookahead (= max shell radius), so the kernel is
    chunkable by ``turn_features_chunked``.  Cost is O(n · Σ shell widths)
    shifted adds — no per-row loop, no self-join."""

    def __init__(self, letters: list[str],
                 shells: tuple[tuple[int, int], ...] = ((1, 2), (3, 5), (6, 10)),
                 prefix: str = "shell"):
        self.letters = letters
        self.shells = tuple((int(lo), int(hi)) for lo, hi in shells)
        assert all(1 <= lo <= hi for lo, hi in self.shells)
        self.prefix = prefix

    @property
    def lookback(self):
        return max(hi for _, hi in self.shells)

    @property
    def lookahead(self):
        return max(hi for _, hi in self.shells)

    def names(self) -> list[str]:
        return [
            f"{self.prefix}{si}_{s}"
            for si in range(len(self.shells))
            for s in self.letters
        ]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        codes, seg, n = ctx.codes, ctx.seg_of_row, ctx.n
        A = len(self.letters)
        out = np.zeros((n, len(self.shells) * A), dtype=np.float64)
        idx = np.arange(n, dtype=np.int64)
        for si, (lo, hi) in enumerate(self.shells):
            for d in range(lo, hi + 1):
                if n <= d:
                    break
                same = seg[:-d] == seg[d:]
                # forward neighbor (row i sees i+d)
                sel = same & (codes[d:] >= 0)
                _scatter_add1(out, idx[:-d][sel], si * A + codes[d:][sel])
                # backward neighbor (row i sees i-d)
                sel = same & (codes[:-d] >= 0)
                _scatter_add1(out, idx[d:][sel], si * A + codes[:-d][sel])
        return out


class TimeWindowStats:
    """TIME-based trailing-window stats per turn: count / sum / mean of a
    numeric column over rows with ``ts`` in ``[t - seconds, t]`` within the
    conversation (inclusive both ends — exactly SQL ``RANGE BETWEEN
    INTERVAL seconds PRECEDING AND CURRENT ROW``, including ts-peers on
    both sides).  The row-based rolling family can't express this; an
    entity×timestamp feature stack needs both.

    Vectorized: ts is sorted within each segment, so window boundaries are
    two ``np.searchsorted`` calls on a segment-offset composite key and the
    aggregates are prefix-sum differences — no per-row loop.  The COUNT is
    integer-exact (the oracle-gated column); sum/mean reassociate float
    addition (prefix differences) and are allclose-gated in pytest.

    ``lookback = None``: a time window may reach arbitrarily many rows back,
    so the kernel needs whole conversations (rejected by the chunked
    executor by design).  Requires ``ts`` non-decreasing within each
    conversation under the chosen order_cols (true for canonical
    transcripts, where turn order IS timestamp order) — the searchsorted
    boundaries assume it."""

    lookback = None
    # composite-key space must fit int64; beyond this the kernel takes the
    # exact per-segment fallback (patchable in tests)
    _KEYSPACE_LIMIT = 2**62

    def __init__(self, col: str, seconds: float = 60.0,
                 prefix: str | None = None):
        self.col = col
        self.seconds = seconds
        self.prefix = prefix or f"tw{int(seconds)}_{col}"

    def names(self) -> list[str]:
        return [f"{self.prefix}_{s}" for s in ("count", "sum", "mean")]

    def apply(self, ctx: ConvContext) -> np.ndarray:
        x = ctx.numeric(self.col)
        ok = ~np.isnan(x)
        x0 = np.where(ok, x, 0.0)
        ts = ctx.ts_us
        w_us = int(round(self.seconds * 1e6))
        if ctx.n == 0:
            return np.zeros((0, 3), dtype=np.float64)
        # composite key: per-segment cumulative base offsets with a gap of
        # w+2 between segments, so ONE global searchsorted respects segment
        # boundaries (a query key t-w can never cross into the previous
        # segment's key range).  Offsetting by each segment's OWN first ts
        # bounds the key space by the SUM of conversation durations — not
        # n_segs × the corpus's full time range, which silently overflowed
        # int64 (and broke the sort invariant) for wide-history buckets.
        seg = ctx.seg_of_row
        starts = ctx.starts
        seg_t0 = ts[starts[:-1]]
        rel = (ts - seg_t0[seg]).astype(np.int64)  # >= 0: ts sorted per conv
        dur = (ts[starts[1:] - 1] - seg_t0).astype(np.int64)
        if int(dur.sum()) + ctx.n_segs * (w_us + 2) < self._KEYSPACE_LIMIT:
            base = np.zeros(ctx.n_segs, dtype=np.int64)
            np.cumsum(dur[:-1] + (w_us + 2), out=base[1:])
            key = base[seg] + rel
            lo = np.searchsorted(key, key - w_us, side="left")
            hi = np.searchsorted(key, key, side="right")  # includes ts-peers
        else:
            # astronomically wide conversations: exact per-segment fallback
            lo = np.empty(ctx.n, dtype=np.int64)
            hi = np.empty(ctx.n, dtype=np.int64)
            for s in range(ctx.n_segs):
                a, b = starts[s], starts[s + 1]
                t_seg = ts[a:b]
                lo[a:b] = a + np.searchsorted(t_seg, t_seg - w_us, side="left")
                hi[a:b] = a + np.searchsorted(t_seg, t_seg, side="right")
        cum_n = np.concatenate(([0], np.cumsum(ok)))
        cnt = (cum_n[hi] - cum_n[lo]).astype(np.float64)
        cum_s = np.concatenate(([0.0], np.cumsum(x0)))
        ssum = cum_s[hi] - cum_s[lo]
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(cnt > 0, ssum / cnt, np.nan)
        ssum = np.where(cnt > 0, ssum, np.nan)
        return np.stack([cnt, ssum, mean], axis=1)
