"""Print per-stage Ray Data stats for the flagship pipelines (the measure-
don't-guess loop): `python tools/stats_report.py [sf_dir]`."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str) -> None:
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()
    from protein_feature_engineering_ray.pipelines.backfill import flagship_backfill

    ds = flagship_backfill(sf_dir).materialize()  # small sf dirs only
    print(f"rows: {ds.count()}")
    print(ds.stats())
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
