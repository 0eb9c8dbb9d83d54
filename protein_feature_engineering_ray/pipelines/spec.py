"""Declarative FeatureSpec layer (SURVEY.md §1.3): the engine analogue of the
reference's parameter dicts + JSON override (feature.py:191-242, 321-330) and
its ``display_feature_types`` menu (feature.py:343-425) — without ``eval``.

A spec is JSON like::

    {
      "alphabet": {"letters": ["click", ...], "groups": {"act": [...], ...}},
      "gap_seconds": 1800,
      "num_buckets": 512,
      "conv": [{"name": "AAC"}, {"name": "CKSAAP", "params": {"kspace": 3}}],
      "turn": [{"name": "Latency"}, {"name": "RollingComposition",
                "params": {"w": 5}}]
    }
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import ray.data

from protein_feature_engineering_ray.functions.registry import REGISTRY, make_kernel
from protein_feature_engineering_ray.schema import Alphabet


def list_descriptors() -> dict[str, str]:
    """Name -> kind for every registered descriptor (the menu)."""
    return {name: kind for name, (kind, _f) in sorted(REGISTRY.items())}


@dataclass
class FeatureSpec:
    alphabet: Alphabet
    conv: list[tuple[str, dict]] = field(default_factory=list)
    turn: list[tuple[str, dict]] = field(default_factory=list)
    gap_seconds: float = 1800.0
    num_buckets: int = 64
    vector_col: str | None = None

    @classmethod
    def from_json(cls, text: str) -> "FeatureSpec":
        d = json.loads(text)
        a = d.get("alphabet", {})
        alphabet = Alphabet(
            letters=tuple(a.get("letters", ())),
            groups={k: tuple(v) for k, v in a.get("groups", {}).items()},
        )
        def entries(key):
            out = []
            for e in d.get(key, []):
                name = e["name"]
                if name not in REGISTRY:
                    raise KeyError(
                        f"unknown descriptor {name!r}; known: "
                        f"{sorted(REGISTRY)}"
                    )
                kind, _ = REGISTRY[name]
                if kind != key:
                    raise ValueError(f"{name} is a {kind} descriptor, not {key}")
                out.append((name, e.get("params", {})))
            return out

        return cls(
            alphabet=alphabet,
            conv=entries("conv"),
            turn=entries("turn"),
            gap_seconds=float(d.get("gap_seconds", 1800.0)),
            num_buckets=int(d.get("num_buckets", 64)),
            vector_col=d.get("vector_col"),
        )

    def conv_kernels(self):
        return [make_kernel(n, self.alphabet, p)[1] for n, p in self.conv]

    def turn_kernels(self):
        return [make_kernel(n, self.alphabet, p)[1] for n, p in self.turn]


def infer_alphabet(
    ds: ray.data.Dataset, col: str = "role", sample_limit: int = 100_000
) -> Alphabet:
    """Sampled alphabet inference — the ``check_sequence_type`` analogue
    (feature.py:133-162 samples 100 sequences to infer the alphabet)."""
    vals = ds.limit(sample_limit).unique(col)
    return Alphabet(letters=tuple(sorted(v for v in vals if v is not None)))
