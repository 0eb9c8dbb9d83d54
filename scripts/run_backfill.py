"""Backfill job entry point — submit with::

    ray job submit -- python scripts/run_backfill.py \
        --input /data/transcripts --out /data/features \
        --spec spec.json [--resume]

On the fixed cluster the driver owns no Ray session config beyond the
address; locally this guards ``ray.init`` so it composes with an existing
session.  Output is per-bucket atomic Parquet with ``_SUCCESS`` watermarks;
re-running with the same ``--out`` resumes (completed buckets are skipped).
Prints a one-line JSON summary (rows, buckets, wall seconds) — the per-
partition lineage lives next to the data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="parquet path/dir of canonical transcript rows")
    p.add_argument("--out", required=True)
    p.add_argument("--spec", default=None, help="FeatureSpec JSON file")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--events", action="store_true",
                   help="input is an events table (derive transcripts)")
    p.add_argument("--vector-col", default=None,
                   help="pack all features into ONE FixedSizeList column "
                        "of this name (wide stacks / output bandwidth)")
    p.add_argument("--float32", action="store_true",
                   help="write features as float32 (halves the output "
                        "stream; float64 is the bit-compat default)")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()
    import ray.data

    from protein_feature_engineering_ray.pipelines.backfill import (
        DEFAULT_TURN_SPECS,
        EVENTS_TURN_SPECS,
        backfill_to_dir,
    )
    from protein_feature_engineering_ray.pipelines.spec import FeatureSpec
    from protein_feature_engineering_ray.schema import (
        DEFAULT_ALPHABET,
        EVENT_ALPHABET,
    )
    from protein_feature_engineering_ray.sources import from_events
    from protein_feature_engineering_ray.state.manifest import read_manifest

    if args.events:
        sf_dir = args.input.rstrip("/")
        if sf_dir.endswith("events.parquet"):
            sf_dir = os.path.dirname(sf_dir)
        ds = from_events(sf_dir)
        alphabet = EVENT_ALPHABET
        turn_specs = EVENTS_TURN_SPECS
        order_cols = ("conv_id", "ts", "event_id")
        assign_turn_idx = True
    else:
        ds = ray.data.read_parquet(args.input)
        alphabet = DEFAULT_ALPHABET
        turn_specs = DEFAULT_TURN_SPECS
        order_cols = ("conv_id", "turn_idx")
        assign_turn_idx = False

    num_buckets = 64
    gap_seconds = 1800.0
    if args.spec:
        spec = FeatureSpec.from_json(open(args.spec).read())
        alphabet = spec.alphabet if spec.alphabet.letters else alphabet
        turn_specs = spec.turn or turn_specs
        num_buckets = spec.num_buckets
        gap_seconds = spec.gap_seconds

    t0 = time.perf_counter()
    ran = backfill_to_dir(
        ds, args.out, num_buckets=num_buckets, alphabet=alphabet,
        turn_specs=turn_specs, gap_seconds=gap_seconds,
        order_cols=order_cols, assign_turn_idx=assign_turn_idx,
        vector_col=args.vector_col,
        out_dtype="float32" if args.float32 else "float64",
    )
    wall = time.perf_counter() - t0
    manifest = read_manifest(args.out)
    print(json.dumps({
        "buckets_completed_now": len(ran),
        "buckets_total": len(manifest),
        "rows_total": int(sum(m["rows"] for m in manifest)),
        "wall_sec": round(wall, 2),
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
