"""IVF store read-pruning proof: ivf_search touches only the probed
cells' bytes while returning exactly what the in-stream scorer returns.

Protocol (single node, deterministic):
- corpus = sf0.1 embeddings (2k x 64 float) replicated --replicate times
  with id offsets (default 256 -> 512k vectors, ~130 MB raw float).
- ivf_build commits a 64-cell centroid-partitioned store under /tmp.
- 8 fixed queries, n_probe=4: report probed files/bytes vs the store
  total (the IO-pruning factor), ivf_search wall vs ivf_knn's full-scan
  wall over the SAME replicated corpus with the SAME probe budget, and
  assert the two results identical (shared scorer, shared centroid fit).

Run: python scripts/ivf_store_proof.py [--replicate 256]
Exit 0 = results identical AND the mean PER-QUERY probed bytes < 25% of
store bytes (the batch union is also reported — 8 scattered queries
probe mostly-disjoint cells, so the union is the batch's cost, the
per-query fraction is what one lookup pays).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=256)
    ap.add_argument("--n-centroids", type=int, default=64)
    ap.add_argument("--n-probe", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from protein_feature_engineering_ray.sources.io import sized_read_parquet
    from protein_feature_engineering_ray.stages.similarity import (
        ivf_build,
        ivf_knn,
        ivf_probe_files,
        ivf_search,
    )

    rep = args.replicate

    def replicate(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({
                "vec_id": pc.add(t["vec_id"], r * 10_000_000),
                "embedding": t["embedding"],
            })
            for r in range(rep)
        ])

    base = sized_read_parquet(
        f"{args.sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(pc.is_valid(t["embedding"])),
        batch_format="pyarrow",
    )
    corpus = base.map_batches(replicate, batch_format="pyarrow").materialize()
    n = corpus.count()

    qdf = base.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 8)), batch_format="pyarrow"
    ).to_pandas()
    Q = np.stack(qdf["embedding"].to_numpy())
    qids = qdf["vec_id"].to_numpy()

    store = tempfile.mkdtemp(prefix="pfer_ivf_proof_")
    try:
        t0 = time.perf_counter()
        manifest = ivf_build(corpus, store, n_centroids=args.n_centroids)
        build_s = time.perf_counter() - t0
        assert sum(m["rows"] for m in manifest) == n

        all_files = []
        for root, _, fs in os.walk(store):
            all_files += [os.path.join(root, f) for f in fs
                          if f.endswith(".parquet")]
        total_bytes = sum(os.path.getsize(f) for f in all_files)

        probed, _, _ = ivf_probe_files(store, Q, n_probe=args.n_probe)
        probed_bytes = sum(os.path.getsize(f) for f in probed)
        # per-query pruning (what ONE lookup pays); the union above is what
        # this 8-query batch pays — scattered queries probe disjoint cells
        per_q = []
        for i in range(len(Q)):
            fs, _, _ = ivf_probe_files(store, Q[i:i + 1],
                                       n_probe=args.n_probe)
            per_q.append(sum(os.path.getsize(f) for f in fs))

        t0 = time.perf_counter()
        got = ivf_search(store, Q, qids, k=10, n_probe=args.n_probe)
        search_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        want = ivf_knn(corpus, Q, qids, k=10,
                       n_centroids=args.n_centroids, n_probe=args.n_probe)
        stream_s = time.perf_counter() - t0

        key = ["query_id", "nbr_id"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            want.sort_values(key).reset_index(drop=True),
        )
        frac = probed_bytes / total_bytes
        per_q_frac = float(np.mean(per_q)) / total_bytes
        print(json.dumps({
            "n_vectors": n, "dim": len(Q[0]),
            "n_centroids": args.n_centroids, "n_probe": args.n_probe,
            "n_queries": len(Q),
            "store_files": len(all_files), "probed_files": len(probed),
            "store_bytes": total_bytes, "probed_bytes": probed_bytes,
            "batch_probed_fraction": round(frac, 4),
            "per_query_probed_fraction": round(per_q_frac, 4),
            "build_sec": round(build_s, 3),
            "ivf_search_sec": round(search_s, 3),
            "ivf_knn_fullscan_sec": round(stream_s, 3),
            "results_identical": True,
        }))
        return 0 if per_q_frac < 0.25 else 1
    finally:
        shutil.rmtree(store, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
