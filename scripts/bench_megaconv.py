"""Mega-conversation skew bench: ONE conversation of N turns (default 2M),
chunked vs unchunked conv-level descriptors at 32 cpus.

Round-2 recorded the composition families (BASELINE.md "Mega-conversation
skew"); this run covers the two families that joined the chunked protocol
later: the ORDER-merged lag family (NMBroto/AC/Moran/Geary — boundary-value
stitched merges) and the round-3 absolute-position PseKRAAC kernels
(StrideKTuple/LambdaKTuple — global-turn_idx grids).  Prints one JSON line
with both walls and the max abs output difference (must be allclose).

Usage: python scripts/bench_megaconv.py [n_turns]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()

    import pandas as pd
    import ray.data

    from protein_feature_engineering_ray.core.executor import (
        conv_features,
        conv_features_chunked,
    )
    from protein_feature_engineering_ray.functions.registry import make_kernel
    from protein_feature_engineering_ray.schema import EVENT_ALPHABET

    rng = np.random.default_rng(3)
    roles = np.asarray(EVENT_ALPHABET.letters, dtype=object)[
        rng.integers(0, len(EVENT_ALPHABET.letters), size=n)
    ]
    pdf = pd.DataFrame(
        {
            "conv_id": np.full(n, "mega", dtype=object),
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": roles,
            "text": np.full(n, "", dtype=object),
            "tool": np.full(n, "", dtype=object),
            "ts": pd.to_datetime(np.arange(n), unit="s"),
            "value": rng.normal(size=n),
        }
    )
    ds = ray.data.from_pandas(pdf).repartition(32).materialize()

    SPECS = [
        ("NMBroto", {"nlag": 6}), ("AC", {"nlag": 6}),
        ("Moran", {"nlag": 6}), ("Geary", {"nlag": 6}),
        ("StrideKTuple", {"k": 2, "gap": 1}),
        ("LambdaKTuple", {"k": 2, "lam": 2}),
    ]

    def ks():
        return [make_kernel(nm, EVENT_ALPHABET, p)[1] for nm, p in SPECS]

    # warm-up on a slice (worker imports)
    conv_features(ds.limit(10_000), ks(), alphabet=EVENT_ALPHABET,
                  num_buckets=8).count()

    t0 = time.perf_counter()
    whole = conv_features(
        ds, ks(), alphabet=EVENT_ALPHABET, num_buckets=64,
    ).to_pandas()
    t_whole = time.perf_counter() - t0

    t0 = time.perf_counter()
    chunked = conv_features_chunked(
        ds, ks(), alphabet=EVENT_ALPHABET, chunk_size=100_000, num_buckets=64,
    ).to_pandas()
    t_chunked = time.perf_counter() - t0

    cols = [c for c in whole.columns if c != "conv_id"]
    diff = float(
        np.abs(whole[cols].to_numpy() - chunked[cols].to_numpy()).max()
    )
    rel = diff / max(1e-12, float(np.abs(whole[cols].to_numpy()).max()))
    out = {
        "n_turns": n,
        "families": [s[0] for s in SPECS],
        "unchunked_sec": round(t_whole, 2),
        "chunked_sec": round(t_chunked, 2),
        "speedup": round(t_whole / t_chunked, 2),
        "max_abs_diff": diff,
        "max_rel_diff": rel,
        "allclose": bool(rel < 1e-9),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
