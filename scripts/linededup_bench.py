"""line_dedup throughput measurement (BASELINE.md "line_dedup throughput").

Replicates the sf0.1 documents table x`--replicate` (default 100 -> 500k
docs) in three shapes and times `line_dedup` fully consumed:

- shared:    exact copies (every line duplicated across all copies —
             dedup-heavy extreme);
- salted:    per-copy doc suffix (all lines distinct — dedup-light);
- multiline: every word becomes a line (tens of millions of lines from a
             ~130-word vocabulary — single hot line values with >200k
             occurrences each, the pathological run-length case).

Usage: python scripts/linededup_bench.py [--replicate N] [--sf DIR]
Prints one JSON line per shape.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: F401  (kept for parity with sibling scripts)
import pyarrow as pa
import pyarrow.compute as pc

import ray


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=100)
    ap.add_argument("--sf", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--num-cpus", type=int, default=int(
        os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from protein_feature_engineering_ray.config import tune_data_context
    from protein_feature_engineering_ray.sources.io import sized_read_parquet
    from protein_feature_engineering_ray.stages.dedup import line_dedup

    tune_data_context()
    R = args.replicate

    def shape(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            txt0 = pc.fill_null(t["text"], "")
            if kind == "multiline":
                txt0 = pc.replace_substring(txt0, " ", "\n")
            out = []
            for r in range(R):
                txt = txt0
                if kind == "salted":
                    txt = pc.binary_join_element_wise(
                        txt0, pa.array([f" s{r}"] * t.num_rows), "")
                elif kind == "multiline":
                    txt = pc.binary_join_element_wise(
                        txt0, pa.array([f"\ncopy{r}"] * t.num_rows), "")
                out.append(pa.table({
                    "doc_id": pc.add(t["doc_id"], r * 10_000_000),
                    "text": txt,
                }))
            return pa.concat_tables(out)

        return fn

    base = sized_read_parquet(
        f"{args.sf}/documents.parquet", columns=["doc_id", "text"])
    for kind in ("shared", "salted", "multiline"):
        ds = base.map_batches(
            shape(kind), batch_format="pyarrow").materialize()
        t0 = time.perf_counter()
        agg = line_dedup(ds, num_buckets=64).map_batches(
            lambda t: pa.table({
                "n": [t.num_rows],
                "tot": [int(pc.sum(t["n_lines"]).as_py() or 0)],
                "kept": [int(pc.sum(t["n_lines_kept"]).as_py() or 0)],
                "rem": [int(pc.sum(t["n_dup_lines_removed"]).as_py() or 0)],
            }),
            batch_format="pyarrow",
        ).to_pandas().sum()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "shape": kind, "docs": int(agg.n), "lines": int(agg.tot),
            "kept": int(agg.kept), "removed": int(agg.rem),
            "sec": round(dt, 2), "lines_per_sec": int(agg.tot / dt),
        }))
    ray.shutdown()


if __name__ == "__main__":
    main()
