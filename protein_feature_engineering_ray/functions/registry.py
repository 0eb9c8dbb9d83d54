"""Descriptor registry — the reference's string-keyed ``__cmd_dict`` dispatch
(feature.py:244-319) without ``eval``: name -> (kind, factory).

``kind`` is "conv" (one row per conversation) or "turn" (one row per turn).
Factories take (alphabet, params) and return a kernel instance; parameters
mirror the reference's per-descriptor knob dict (feature.py:191-242) and can
be overridden from JSON/dict (the ``import_parameters`` analogue,
feature.py:321-330).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from protein_feature_engineering_ray.functions import autocorr as ac
from protein_feature_engineering_ray.functions import composition as comp
from protein_feature_engineering_ray.functions import positional as pos
from protein_feature_engineering_ray.schema import Alphabet


def _letters(a: Alphabet, grouped: bool) -> list[str]:
    return list(a.groups.keys()) if grouped else list(a.letters)


def _prop_table(a: Alphabet, params: dict) -> np.ndarray:
    t = params.get("prop_table")
    if t is None:
        if a.size == len(pos.EVENT_ZSCALE):
            return pos.EVENT_ZSCALE
        rng = np.random.default_rng(13)  # deterministic fallback table
        return rng.normal(size=(a.size, 3)).round(3)
    return np.asarray(t, dtype=np.float64)


def _conv_graph(a: Alphabet):
    from protein_feature_engineering_ray.functions.graph import ConvGraph

    return ConvGraph(list(a.letters))


def _dist_table(a: Alphabet, params: dict) -> np.ndarray:
    t = params.get("dist_table")
    if t is None:
        if a.size == len(ac.EVENT_DISTANCE):
            return ac.EVENT_DISTANCE
        p = _prop_table(a, params)
        d = np.sqrt(((p[:, None, :] - p[None, :, :]) ** 2).sum(axis=2))
        return d.round(6)
    return np.asarray(t, dtype=np.float64)


REGISTRY: dict[str, tuple[str, Callable[[Alphabet, dict[str, Any]], Any]]] = {
    # --- conversation-level composition (SURVEY §2.2) ---
    "AAC": ("conv", lambda a, p: comp.CompositionK(_letters(a, False))),
    "GAAC": ("conv", lambda a, p: comp.CompositionK(_letters(a, True), grouped=True)),
    "DPC": ("conv", lambda a, p: comp.NGramComposition(
        _letters(a, False), n=2, normalize=p.get("normalize", True),
        prefix=p.get("prefix"))),
    "TPC": ("conv", lambda a, p: comp.NGramComposition(
        _letters(a, False), n=3, normalize=p.get("normalize", True),
        prefix=p.get("prefix"))),
    "GDPC": ("conv", lambda a, p: comp.NGramComposition(
        _letters(a, True), n=2, grouped=True, normalize=p.get("normalize", True))),
    "GTPC": ("conv", lambda a, p: comp.NGramComposition(
        _letters(a, True), n=3, grouped=True, normalize=p.get("normalize", True))),
    "DDE": ("conv", lambda a, p: comp.DDE(_letters(a, False))),
    "CKSAAP": ("conv", lambda a, p: comp.KSpacedPairs(
        _letters(a, False), kspace=p.get("kspace", 3))),
    "CKSAAGP": ("conv", lambda a, p: comp.KSpacedPairs(
        _letters(a, True), kspace=p.get("kspace", 3), grouped=True)),
    "ASDC": ("conv", lambda a, p: comp.ASDC(
        _letters(a, False), max_skip=p.get("max_skip", 512))),
    "CTDC": ("conv", lambda a, p: comp.CTDComposition(_letters(a, True))),
    "CTDT": ("conv", lambda a, p: comp.CTDTransition(_letters(a, True))),
    "CTDD": ("conv", lambda a, p: comp.CTDDistribution(_letters(a, True))),
    "CTriad": ("conv", lambda a, p: comp.Triad(_letters(a, True), kspace=0)),
    "KSCTriad": ("conv", lambda a, p: comp.Triad(
        _letters(a, True), kspace=p.get("kspace", 2))),
    # --- PseKRAAC stride / lambda kernels (SURVEY §2.5) ---
    "StrideKTuple": ("conv", lambda a, p: comp.StridedKTuple(
        _letters(a, p.get("grouped", True)), k=p.get("k", 2), gap=p.get("gap", 1),
        grouped=p.get("grouped", True), prefix=p.get("prefix", "stride"))),
    "LambdaKTuple": ("conv", lambda a, p: comp.LambdaKTuple(
        _letters(a, p.get("grouped", True)), k=p.get("k", 2), lam=p.get("lam", 2),
        grouped=p.get("grouped", True), prefix=p.get("prefix", "lam"))),
    "ConvSummary": ("conv", lambda a, p: comp.ConvSummary()),
    # network-descriptor analogue (feature.py:4566-4623): role-transition
    # interaction graph statistics, decomposable like DPC
    "ConvGraph": ("conv", lambda a, p: _conv_graph(a)),
    "DistancePair": ("conv", lambda a, p: comp.DistancePair(
        _letters(a, True), distance=p.get("distance", 2))),
    # --- lag / autocorrelation (SURVEY §2.4) ---
    "NMBroto": ("conv", lambda a, p: ac.NMBroto(
        p.get("series", ("col", "value")), nlag=p.get("nlag", 4))),
    "Moran": ("conv", lambda a, p: ac.Moran(
        p.get("series", ("col", "value")), nlag=p.get("nlag", 4))),
    "Geary": ("conv", lambda a, p: ac.Geary(
        p.get("series", ("col", "value")), nlag=p.get("nlag", 4))),
    "AC": ("conv", lambda a, p: ac.AutoCovariance(
        p.get("series", ("col", "value")), nlag=p.get("nlag", 4))),
    "CC": ("conv", lambda a, p: ac.CrossCovariance(
        p.get("series_a", ("col", "value")),
        p.get("series_b", ("prop", _prop_table(a, p)[:, 0])),
        nlag=p.get("nlag", 4))),
    "ACC": ("conv", lambda a, p: ac.ACC(
        p.get("series_a", ("col", "value")),
        p.get("series_b", ("prop", _prop_table(a, p)[:, 0])),
        nlag=p.get("nlag", 4))),
    "SOCNumber": ("conv", lambda a, p: ac.SOCNumber(
        _dist_table(a, p), nlag=p.get("nlag", 3))),
    "QSOrder": ("conv", lambda a, p: ac.QSOrder(
        _letters(a, False), _dist_table(a, p), nlag=p.get("nlag", 3),
        weight=p.get("weight", 0.1))),
    "PAAC": ("conv", lambda a, p: ac.PAAC(
        _letters(a, False), _prop_table(a, p), lam=p.get("lam", 3),
        weight=p.get("weight", 0.05))),
    "APAAC": ("conv", lambda a, p: ac.APAAC(
        _letters(a, False), _prop_table(a, p), lam=p.get("lam", 3),
        weight=p.get("weight", 0.05))),
    # --- per-turn positional / rolling (SURVEY §2.3) ---
    "OneHot": ("turn", lambda a, p: pos.OneHot(_letters(a, False))),
    "GroupOneHot": ("turn", lambda a, p: pos.OneHot(
        _letters(a, True), grouped=True)),
    "PropertyLookup": ("turn", lambda a, p: pos.PropertyLookup(
        _letters(a, False), _prop_table(a, p), prefix=p.get("prefix", "prop"))),
    # frozen-table lookup variants (ZScale 1335-1381 / AESNN3 998-1044 /
    # BLOSUM62 1382-1427 analogues); fall back to the generic table for
    # non-5-letter alphabets
    "ZScale": ("turn", lambda a, p: pos.PropertyLookup(
        _letters(a, False),
        pos.EVENT_ZSCALE if a.size == 5 else _prop_table(a, p),
        prefix="zscale")),
    "AESNN3": ("turn", lambda a, p: pos.PropertyLookup(
        _letters(a, False),
        pos.EVENT_AESNN3 if a.size == 5 else _prop_table(a, p),
        prefix="aesnn3")),
    "BlosumRow": ("turn", lambda a, p: pos.PropertyLookup(
        _letters(a, False),
        pos.EVENT_BLOSUM if a.size == 5 else _prop_table(a, p),
        prefix="blosum")),
    "LagLead": ("turn", lambda a, p: pos.LagLead(
        p.get("col", "value"), offsets=tuple(p.get("offsets", (1, 2))),
        lead=p.get("lead", False))),
    "Latency": ("turn", lambda a, p: pos.Latency()),
    "RollingComposition": ("turn", lambda a, p: pos.RollingComposition(
        _letters(a, p.get("grouped", False)), w=p.get("w", 5),
        grouped=p.get("grouped", False))),
    "ExpandingComposition": ("turn", lambda a, p: pos.ExpandingComposition(
        _letters(a, p.get("grouped", False)), grouped=p.get("grouped", False))),
    "RollingStats": ("turn", lambda a, p: pos.RollingStats(
        p.get("col", "value"), w=p.get("w", 5))),
    "TimeWindowStats": ("turn", lambda a, p: pos.TimeWindowStats(
        p.get("col", "value"), seconds=p.get("seconds", 60.0))),
    "PositionFeatures": ("turn", lambda a, p: pos.PositionFeatures()),
    "ShellComposition": ("turn", lambda a, p: pos.ShellComposition(
        _letters(a, False),
        shells=tuple(tuple(s) for s in p.get("shells",
                                             ((1, 2), (3, 5), (6, 10)))))),
    "TextLen": ("turn", lambda a, p: pos.TextLen()),
    "MultiHot": ("turn", lambda a, p: pos.MultiHotProperties(
        _letters(a, False),
        p.get("props", pos.EVENT_PROPS if a.size == len(pos.EVENT_ZSCALE)
              else {}),
    )),
}


def make_kernel(name: str, alphabet: Alphabet, params: dict[str, Any] | None = None):
    kind, factory = REGISTRY[name]
    return kind, factory(alphabet, params or {})
