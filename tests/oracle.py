"""Single-node pandas/numpy oracle.

Deliberately written in the reference's own style — an explicit Python loop
over conversations, one sequence at a time (the shape of every descriptor in
/root/reference/feature.py, e.g. the ``for i in self.fasta_list`` loops at
feature.py:440, 469, 501) — so it shares no code path with the segment-
vectorized Ray kernels it checks.

Every function takes a transcripts ``pd.DataFrame`` (any row order) and
returns a feature DataFrame keyed by ``conv_id`` (+ ``turn_idx`` for per-turn
families).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from protein_feature_engineering_ray.schema import Alphabet


def _convs(df: pd.DataFrame):
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    for cid, g in df.groupby("conv_id", sort=True):
        yield cid, g.reset_index(drop=True)


def _code_seq(g: pd.DataFrame, alpha: Alphabet, grouped: bool) -> list[int]:
    if grouped:
        letter_to_group = {}
        for gi, (_gn, members) in enumerate(alpha.groups.items()):
            for m in members:
                letter_to_group[m] = gi
        return [letter_to_group.get(r, -1) for r in g["role"]]
    lut = {s: i for i, s in enumerate(alpha.letters)}
    return [lut.get(r, -1) for r in g["role"]]


def _letters(alpha: Alphabet, grouped: bool) -> list[str]:
    return list(alpha.groups.keys()) if grouped else list(alpha.letters)


def composition(df, alpha: Alphabet, grouped=False, prefix=None) -> pd.DataFrame:
    letters = _letters(alpha, grouped)
    prefix = prefix or ("gaac" if grouped else "aac")
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, grouped)
        counts = [0] * len(letters)
        for c in seq:
            if c >= 0:
                counts[c] += 1
        tot = sum(counts) or 1
        rows.append({"conv_id": cid, **{f"{prefix}_{s}": counts[i] / tot
                                        for i, s in enumerate(letters)}})
    return pd.DataFrame(rows)


def ngram(df, alpha: Alphabet, n=2, grouped=False, normalize=True) -> pd.DataFrame:
    from itertools import product

    letters = _letters(alpha, grouped)
    base = {2: "dpc", 3: "tpc"}[n]
    prefix = ("g" + base) if grouped else base
    names = [prefix + "_" + ".".join(t) for t in product(letters, repeat=n)]
    A = len(letters)
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, grouped)
        counts = [0] * (A**n)
        for j in range(len(seq) - n + 1):
            tup = seq[j : j + n]
            if all(c >= 0 for c in tup):
                idx = 0
                for c in tup:
                    idx = idx * A + c
                counts[idx] += 1
        if normalize:
            tot = sum(counts) or 1
            vals = [c / tot for c in counts]
        else:
            vals = [float(c) for c in counts]
        rows.append({"conv_id": cid, **dict(zip(names, vals))})
    return pd.DataFrame(rows)


def dde(df, alpha: Alphabet) -> pd.DataFrame:
    letters = list(alpha.letters)
    A = len(letters)
    names = [f"dde_{a}.{b}" for a in letters for b in letters]
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, False)
        uni = [0] * A
        for c in seq:
            if c >= 0:
                uni[c] += 1
        tot = sum(uni) or 1
        p = [u / tot for u in uni]
        bi = [0] * (A * A)
        for j in range(len(seq) - 1):
            a, b = seq[j], seq[j + 1]
            if a >= 0 and b >= 0:
                bi[a * A + b] += 1
        npairs = sum(bi)
        safe = npairs or 1
        vals = []
        for i in range(A):
            for j in range(A):
                tm = p[i] * p[j]
                dc = bi[i * A + j] / safe
                tv = tm * (1 - tm) / safe
                if tv > 0:
                    vals.append((dc - tm) / np.sqrt(tv))
                else:
                    vals.append(0.0)
        rows.append({"conv_id": cid, **dict(zip(names, vals))})
    return pd.DataFrame(rows)


def kspaced(df, alpha: Alphabet, kspace=3, grouped=False) -> pd.DataFrame:
    letters = _letters(alpha, grouped)
    A = len(letters)
    prefix = "cksaagp" if grouped else "cksaap"
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, grouped)
        rec = {"conv_id": cid}
        for gap in range(kspace + 1):
            d = gap + 1
            counts = [0] * (A * A)
            for j in range(len(seq) - d):
                a, b = seq[j], seq[j + d]
                if a >= 0 and b >= 0:
                    counts[a * A + b] += 1
            tot = sum(counts) or 1
            for i, a in enumerate(letters):
                for jj, b in enumerate(letters):
                    rec[f"{prefix}_g{gap}_{a}.{b}"] = counts[i * A + jj] / tot
        rows.append(rec)
    return pd.DataFrame(rows)


def asdc(df, alpha: Alphabet, max_skip=512) -> pd.DataFrame:
    letters = list(alpha.letters)
    A = len(letters)
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, False)
        counts = [0] * (A * A)
        for j in range(len(seq)):
            for k in range(j + 1, min(len(seq), j + max_skip)):
                a, b = seq[j], seq[k]
                if a >= 0 and b >= 0:
                    counts[a * A + b] += 1
        tot = sum(counts) or 1
        rec = {"conv_id": cid}
        for i, a in enumerate(letters):
            for jj, b in enumerate(letters):
                rec[f"asdc_{a}.{b}"] = counts[i * A + jj] / tot
        rows.append(rec)
    return pd.DataFrame(rows)


def ctdt(df, alpha: Alphabet) -> pd.DataFrame:
    groups = list(alpha.groups.keys())
    G = len(groups)
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, True)
        pairs = 0
        counts = {}
        for j in range(len(seq) - 1):
            a, b = seq[j], seq[j + 1]
            if a >= 0 and b >= 0:
                pairs += 1
                if a != b:
                    key = (min(a, b), max(a, b))
                    counts[key] = counts.get(key, 0) + 1
        denom = pairs or 1
        rec = {"conv_id": cid}
        for i in range(G):
            for j in range(i + 1, G):
                rec[f"ctdt_{groups[i]}.{groups[j]}"] = counts.get((i, j), 0) / denom
        rows.append(rec)
    return pd.DataFrame(rows)


def ctdd(df, alpha: Alphabet) -> pd.DataFrame:
    groups = list(alpha.groups.keys())
    quants = (0.0, 0.25, 0.5, 0.75, 1.0)
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, True)
        L = len(seq)
        rec = {"conv_id": cid}
        for gi, gname in enumerate(groups):
            positions = [j for j, c in enumerate(seq) if c == gi]
            for q in quants:
                col = f"ctdd_{gname}_p{int(q*100)}"
                if not positions:
                    rec[col] = 0.0
                else:
                    k = max(1, int(np.floor(len(positions) * q)))
                    rec[col] = (positions[k - 1] + 1) / L * 100.0
        rows.append(rec)
    return pd.DataFrame(rows)


def triad(df, alpha: Alphabet, kspace=0) -> pd.DataFrame:
    groups = list(alpha.groups.keys())
    A = len(groups)
    prefix = "ctriad" if kspace == 0 else "ksctriad"
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, True)
        rec = {"conv_id": cid}
        for gap in range(kspace + 1):
            d = gap + 1
            counts = [0] * (A**3)
            for j in range(len(seq) - 2 * d):
                a, b, c = seq[j], seq[j + d], seq[j + 2 * d]
                if a >= 0 and b >= 0 and c >= 0:
                    counts[(a * A + b) * A + c] += 1
            mn, mx = min(counts), max(counts)
            mx = mx or 1
            k = 0
            for a in groups:
                for b in groups:
                    for c in groups:
                        rec[f"{prefix}_g{gap}_{a}.{b}.{c}"] = (counts[k] - mn) / mx
                        k += 1
        rows.append(rec)
    return pd.DataFrame(rows)


def stride_ktuple(df, alpha: Alphabet, k=2, gap=1, grouped=True) -> pd.DataFrame:
    from itertools import product

    letters = _letters(alpha, grouped)
    A = len(letters)
    names = [f"stride_k{k}g{gap}_" + ".".join(t) for t in product(letters, repeat=k)]
    stride = gap + 1
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, grouped)
        counts = [0] * (A**k)
        for j in range(0, len(seq), stride):
            tup = seq[j : j + k]
            if len(tup) == k and all(c >= 0 for c in tup):
                idx = 0
                for c in tup:
                    idx = idx * A + c
                counts[idx] += 1
        rows.append({"conv_id": cid, **dict(zip(names, [float(c) for c in counts]))})
    return pd.DataFrame(rows)


def lambda_ktuple(df, alpha: Alphabet, k=2, lam=2, grouped=True) -> pd.DataFrame:
    from itertools import product

    letters = _letters(alpha, grouped)
    A = len(letters)
    names = [f"lam_k{k}l{lam}_" + ".".join(t) for t in product(letters, repeat=k)]
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, grouped)
        counts = [0] * (A**k)
        for j in range(len(seq) - lam * (k - 1)):
            tup = [seq[j + s * lam] for s in range(k)]
            if all(c >= 0 for c in tup):
                idx = 0
                for c in tup:
                    idx = idx * A + c
                counts[idx] += 1
        rows.append({"conv_id": cid, **dict(zip(names, [float(c) for c in counts]))})
    return pd.DataFrame(rows)


# --- autocorrelation family ----------------------------------------------


def _series_of(g: pd.DataFrame, alpha: Alphabet, spec):
    kind, arg = spec
    if kind == "col":
        return list(g[arg].astype(float))
    per_letter = list(np.asarray(arg, dtype=float))
    lut = {s: i for i, s in enumerate(alpha.letters)}
    return [
        per_letter[lut[r]] if r in lut else float("nan") for r in g["role"]
    ]


def _lag_stat(df, alpha, spec, nlag, prefix, stat) -> pd.DataFrame:
    rows = []
    for cid, g in _convs(df):
        x = [v for v in _series_of(g, alpha, spec) if not np.isnan(v)]
        N = len(x)
        mean = sum(x) / N if N else 0.0
        rec = {"conv_id": cid}
        for n in range(1, nlag + 1):
            col = f"{prefix}_lag{n}"
            if N <= n:
                rec[col] = 0.0
                continue
            rec[col] = stat(x, n, mean, N)
        rows.append(rec)
    return pd.DataFrame(rows)


def nmbroto(df, alpha, spec, nlag=4):
    return _lag_stat(
        df, alpha, spec, nlag, "nmbroto",
        lambda x, n, mean, N: sum(x[j] * x[j + n] for j in range(N - n)) / (N - n),
    )


def autocov(df, alpha, spec, nlag=4):
    return _lag_stat(
        df, alpha, spec, nlag, "ac",
        lambda x, n, mean, N: sum(
            (x[j] - mean) * (x[j + n] - mean) for j in range(N - n)
        ) / (N - n),
    )


def moran(df, alpha, spec, nlag=4):
    def stat(x, n, mean, N):
        var = sum((v - mean) ** 2 for v in x) / N
        if var <= 0:
            return 0.0
        num = sum((x[j] - mean) * (x[j + n] - mean) for j in range(N - n)) / (N - n)
        return num / var

    return _lag_stat(df, alpha, spec, nlag, "moran", stat)


def geary(df, alpha, spec, nlag=4):
    def stat(x, n, mean, N):
        ss = sum((v - mean) ** 2 for v in x)
        if ss <= 0:
            return 0.0
        s = sum((x[j] - x[j + n]) ** 2 for j in range(N - n))
        return (N - 1) / (2.0 * (N - n)) * s / ss

    return _lag_stat(df, alpha, spec, nlag, "geary", stat)


def socnumber(df, alpha, dist, nlag=3):
    dist = np.asarray(dist, dtype=float)
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, False)
        rec = {"conv_id": cid}
        for n in range(1, nlag + 1):
            pairs = [
                (seq[j], seq[j + n])
                for j in range(len(seq) - n)
                if seq[j] >= 0 and seq[j + n] >= 0
            ]
            cnt = max(len(seq) - n, 0)
            rec[f"soc_tau{n}"] = (
                sum(dist[a, b] ** 2 for a, b in pairs) / cnt if cnt else 0.0
            )
        rows.append(rec)
    return pd.DataFrame(rows)


def qsorder(df, alpha, dist, nlag=3, weight=0.1):
    soc = socnumber(df, alpha, dist, nlag).set_index("conv_id")
    comp_counts = {}
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, False)
        counts = [0] * alpha.size
        for c in seq:
            if c >= 0:
                counts[c] += 1
        comp_counts[cid] = counts
    rows = []
    for cid, counts in comp_counts.items():
        taus = [soc.loc[cid, f"soc_tau{n}"] for n in range(1, nlag + 1)]
        denom = sum(counts) + weight * sum(taus)
        denom = denom or 1.0
        rec = {"conv_id": cid}
        for i, s in enumerate(alpha.letters):
            rec[f"qso_f_{s}"] = counts[i] / denom
        for n in range(1, nlag + 1):
            rec[f"qso_tau{n}"] = weight * taus[n - 1] / denom
        rows.append(rec)
    return pd.DataFrame(rows)


def paac(df, alpha, prop_table, lam=3, weight=0.05):
    from protein_feature_engineering_ray.functions.autocorr import znorm_table

    P = znorm_table(prop_table)
    A = alpha.size
    rows = []
    for cid, g in _convs(df):
        seq = [c for c in _code_seq(g, alpha, False)]
        counts = [0] * A
        for c in seq:
            if c >= 0:
                counts[c] += 1
        thetas = []
        for n in range(1, lam + 1):
            pairs = [
                (seq[j], seq[j + n])
                for j in range(len(seq) - n)
                if seq[j] >= 0 and seq[j + n] >= 0
            ]
            cnt = max(len(seq) - n, 0)
            if cnt == 0:
                thetas.append(0.0)
                continue
            s = 0.0
            for a, b in pairs:
                s += float(((P[a] - P[b]) ** 2).mean())
            thetas.append(s / cnt)
        denom = sum(counts) + weight * sum(thetas)
        denom = denom or 1.0
        rec = {"conv_id": cid}
        for i, let in enumerate(alpha.letters):
            rec[f"paac_f_{let}"] = counts[i] / denom
        for n in range(1, lam + 1):
            rec[f"paac_theta{n}"] = weight * thetas[n - 1] / denom
        rows.append(rec)
    return pd.DataFrame(rows)


def apaac(df, alpha, prop_table, lam=3, weight=0.05):
    from protein_feature_engineering_ray.functions.autocorr import znorm_table

    P = znorm_table(prop_table)
    A = alpha.size
    k = P.shape[1]
    rows = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, False)
        counts = [0] * A
        for c in seq:
            if c >= 0:
                counts[c] += 1
        taus = []
        for n in range(1, lam + 1):
            cnt = max(len(seq) - n, 0)
            for j in range(k):
                if cnt == 0:
                    taus.append(0.0)
                    continue
                s = 0.0
                for i in range(len(seq) - n):
                    a, b = seq[i], seq[i + n]
                    if a >= 0 and b >= 0:
                        s += float(P[a, j] * P[b, j])
                taus.append(s / cnt)
        denom = sum(counts) + weight * sum(taus)
        denom = denom or 1.0
        rec = {"conv_id": cid}
        for i, let in enumerate(alpha.letters):
            rec[f"apaac_f_{let}"] = counts[i] / denom
        idx = 0
        for n in range(1, lam + 1):
            for j in range(k):
                rec[f"apaac_tau{n}p{j}"] = weight * taus[idx] / denom
                idx += 1
        rows.append(rec)
    return pd.DataFrame(rows)


def crosscov(df, alpha, spec_a, spec_b, nlag=4):
    rows = []
    for cid, g in _convs(df):
        xa_full = _series_of(g, alpha, spec_a)
        xb_full = _series_of(g, alpha, spec_b)
        keep = [
            (a, b)
            for a, b in zip(xa_full, xb_full)
            if not (np.isnan(a) or np.isnan(b))
        ]
        xa = [a for a, _ in keep]
        xb = [b for _, b in keep]
        N = len(xa)
        ma = sum(xa) / N if N else 0.0
        mb = sum(xb) / N if N else 0.0
        rec = {"conv_id": cid}
        for n in range(1, nlag + 1):
            if N <= n:
                rec[f"cc_lag{n}"] = 0.0
                continue
            s = sum((xa[j] - ma) * (xb[j + n] - mb) for j in range(N - n))
            rec[f"cc_lag{n}"] = s / (N - n)
        rows.append(rec)
    return pd.DataFrame(rows)


# --- per-turn families ----------------------------------------------------


def per_turn_base(df) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )


def latency(df) -> pd.DataFrame:
    out = []
    for cid, g in _convs(df):
        ts = g["ts"].astype("datetime64[us]").astype("int64").tolist()
        lat = [np.nan] + [(ts[j] - ts[j - 1]) / 1e6 for j in range(1, len(ts))]
        out.append(
            pd.DataFrame(
                {"conv_id": cid, "turn_idx": g["turn_idx"], "latency_sec": lat}
            )
        )
    return pd.concat(out, ignore_index=True)


def rolling_composition(df, alpha: Alphabet, w=5, grouped=False) -> pd.DataFrame:
    letters = _letters(alpha, grouped)
    prefix = f"egaac{w}" if grouped else f"eaac{w}"
    out = []
    for cid, g in _convs(df):
        seq = _code_seq(g, alpha, grouped)
        recs = []
        for j in range(len(seq)):
            lo = max(0, j - w + 1)
            win = seq[lo : j + 1]
            rec = {"conv_id": cid, "turn_idx": int(g["turn_idx"].iloc[j])}
            for i, s in enumerate(letters):
                rec[f"{prefix}_{s}"] = sum(1 for c in win if c == i) / len(win)
            recs.append(rec)
        out.append(pd.DataFrame(recs))
    return pd.concat(out, ignore_index=True)


def rolling_stats(df, col, w=5) -> pd.DataFrame:
    prefix = f"roll{w}_{col}"
    out = []
    for cid, g in _convs(df):
        x = g[col].astype(float).tolist()
        recs = []
        for j in range(len(x)):
            lo = max(0, j - w + 1)
            win = [v for v in x[lo : j + 1] if not np.isnan(v)]
            rec = {
                "conv_id": cid,
                "turn_idx": int(g["turn_idx"].iloc[j]),
                f"{prefix}_count": float(len(win)),
                f"{prefix}_sum": sum(win) if win else np.nan,
                f"{prefix}_mean": sum(win) / len(win) if win else np.nan,
                f"{prefix}_min": min(win) if win else np.nan,
                f"{prefix}_max": max(win) if win else np.nan,
            }
            recs.append(rec)
        out.append(pd.DataFrame(recs))
    return pd.concat(out, ignore_index=True)


def lag_lead(df, col, offsets=(1, 2), lead=False) -> pd.DataFrame:
    prefix = ("lead_" if lead else "lag_") + col
    out = []
    for cid, g in _convs(df):
        x = g[col].astype(float).tolist()
        recs = []
        for j in range(len(x)):
            rec = {"conv_id": cid, "turn_idx": int(g["turn_idx"].iloc[j])}
            for n in offsets:
                src = j + n if lead else j - n
                rec[f"{prefix}_{n}"] = (
                    x[src] if 0 <= src < len(x) else np.nan
                )
            recs.append(rec)
        out.append(pd.DataFrame(recs))
    return pd.concat(out, ignore_index=True)
