"""max_fragments read-amplification sweep (BASELINE.md; round-4 ask 8).

How much does LSM fragment DEPTH cost the reader?  The incremental splice
appends one ``delta-<gen>.parquet`` per wave and compacts a bucket once it
would exceed ``max_fragments`` (default 16) — this script measures what the
default actually buys/costs at the proof scale:

1. **base**: 10M-turn backfill (replicate=100, 128 buckets, the
   incremental-proof kernel spec) — fragment depth 1 everywhere.
2. **waves**: 15 consecutive ~1% append waves (fresh conv_ids, ts strictly
   past every committed watermark), delta mode, ``max_fragments=64`` so
   auto-compaction never fires during the experiment.  A wave's
   conversations hash across all 128 buckets, so depth grows uniformly:
   after wave k every bucket holds 1 + k generations.
3. **read**: after depth 1 / 4 / 8 / 16, a fresh process times
   ``read_backfill(out).count()`` (full scan with last-generation-wins
   fragment resolution), min-of-2 in-session (the first run also warms the
   page cache, which is the steady state a reader sees).

Each phase is a fresh process owning its own Ray session.  Prints ONE JSON
line; record it in BASELINE.md next to the chosen ``max_fragments`` default.

Usage::

    python scripts/fragment_sweep.py                  # 10M base, 15 waves
    python scripts/fragment_sweep.py --replicate 20   # quick 2M-turn check
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

READ_DEPTHS = (1, 4, 8, 16)  # read after these fragment depths
N_WAVES = max(READ_DEPTHS) - 1


def child_main(args) -> int:
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()
    import pyarrow as pa
    import pyarrow.compute as pc

    from protein_feature_engineering_ray.pipelines.backfill import (
        EVENTS_TURN_SPECS,
        backfill_to_dir,
        incremental_backfill_to_dir,
        read_backfill,
    )
    from protein_feature_engineering_ray.schema import EVENT_ROLE_ALPHABET
    from protein_feature_engineering_ray.sources.synthscale import (
        replicated_events,
        sized_num_buckets,
    )
    from protein_feature_engineering_ray.sources.transcripts import pre_encode

    nb = sized_num_buckets(args.n_turns)
    kw = dict(
        num_buckets=nb,
        turn_specs=EVENTS_TURN_SPECS,
        project=("conv_id", "event_id", "turn_idx", "role_code",
                 "tool_flag", "ts", "value"),
        vector_col="features", out_dtype="float32",
    )
    corpus = os.path.join(args.base, "corpus")
    base_pq = os.path.join(corpus, "base")

    def wave_pq(w: int) -> str:
        return os.path.join(corpus, f"wave-{w:02d}")

    def shifted_wave(w: int):
        """Replica index (replicate + w) with ts shifted (w+1) spans past
        the base max — strictly newer than every committed watermark."""
        rid = args.replicate + w
        suffix = f"#{rid}"
        shift = (w + 1) * args.shift_us

        def shiftfn(t: pa.Table) -> pa.Table:
            is_w = pc.ends_with(t["conv_id"], pattern=suffix)
            moved = pc.add(t["ts"], pa.scalar(shift, pa.duration("us")))
            return t.set_column(
                t.schema.get_field_index("ts"), "ts",
                pc.if_else(is_w, moved, t["ts"]))

        return replicated_events(
            args.sf_dir, rid + 1, ids=[rid]
        ).map_batches(shiftfn, batch_format="pyarrow")

    if args.mode == "materialize":
        pre_encode(replicated_events(args.sf_dir, args.replicate),
                   EVENT_ROLE_ALPHABET).write_parquet(base_pq)
        for w in range(N_WAVES):
            pre_encode(shifted_wave(w), EVENT_ROLE_ALPHABET).write_parquet(
                wave_pq(w))
        print("RESULT {}")
    elif args.mode == "base":
        import ray.data

        files = sorted(glob.glob(os.path.join(base_pq, "*.parquet")))
        backfill_to_dir(ray.data.read_parquet(files), args.out, **kw)
        print("RESULT {}")
    elif args.mode.startswith("wave"):
        import ray.data

        w = int(args.mode[4:])
        dirs = [base_pq] + [wave_pq(i) for i in range(w + 1)]
        files = sorted(sum((glob.glob(os.path.join(d, "*.parquet"))
                            for d in dirs), []))
        delta_files = sorted(glob.glob(os.path.join(wave_pq(w), "*.parquet")))
        incremental_backfill_to_dir(
            ray.data.read_parquet(files), args.out,
            delta_ds=ray.data.read_parquet(
                delta_files, columns=["conv_id", "ts"]),
            max_fragments=64, **kw,
        )
        print("RESULT {}")
    elif args.mode == "read":
        depth = len(glob.glob(os.path.join(
            args.out, "bucket=00000", "*.parquet")))
        walls, rows = [], 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = read_backfill(args.out).count()
            walls.append(round(time.perf_counter() - t0, 3))
        bytes_on_disk = sum(
            os.path.getsize(p) for p in glob.glob(
                os.path.join(args.out, "bucket=*", "*.parquet")))
        print("RESULT " + json.dumps({
            "depth": depth, "rows": rows, "read_sec": min(walls),
            "read_runs": walls, "bytes": bytes_on_disk,
        }))
    else:
        raise SystemExit(f"unknown mode {args.mode}")
    ray.shutdown()
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--replicate", type=int, default=100)
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--base", default="/tmp/fragment_sweep")
    p.add_argument("--shift-us", type=int, default=0)
    p.add_argument("--out", default=None, help="internal: child mode")
    p.add_argument("--mode", default=None, help="internal: child mode")
    args = p.parse_args()

    import duckdb

    base_turns, ts_lo, ts_hi = duckdb.sql(
        f"""select count(*), min(ts), max(ts)
            from read_parquet('{args.sf_dir}/events.parquet')"""
    ).fetchone()
    args.n_turns = base_turns * max(args.replicate, 1)
    span_us = int((ts_hi - ts_lo).total_seconds() * 1e6)
    args.shift_us = args.shift_us or span_us + 86_400_000_000

    if args.mode is not None:
        return child_main(args)

    out_dir = os.path.join(args.base, "out")
    shutil.rmtree(args.base, ignore_errors=True)
    os.makedirs(args.base)

    def run(mode: str) -> dict:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--sf-dir", args.sf_dir, "--replicate", str(args.replicate),
             "--num-cpus", str(args.num_cpus),
             "--shift-us", str(args.shift_us), "--base", args.base,
             "--out", out_dir, "--mode", mode],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        out, _ = proc.communicate()
        assert proc.returncode == 0, f"{mode} run failed"
        return json.loads([ln for ln in out.splitlines()
                           if ln.startswith("RESULT ")][-1][7:])

    run("materialize")
    run("base")
    reads = [run("read")]
    for w in range(N_WAVES):
        run(f"wave{w}")
        if (w + 2) in READ_DEPTHS:
            reads.append(run("read"))

    for r in reads:  # waves ADD rows — normalize per logical Mrow too
        r["sec_per_mrow"] = round(r["read_sec"] / (r["rows"] / 1e6), 4)
    base_read = reads[0]["read_sec"]
    base_norm = reads[0]["sec_per_mrow"]
    result = {
        "metric": "read_backfill wall vs LSM fragment depth "
                  "(last-generation-wins resolve; waves never compacted)",
        "n_turns_base": args.n_turns,
        "wave_turns": base_turns,
        "num_cpus": args.num_cpus,
        "reads": reads,
        "amplification_vs_depth1": [
            round(r["read_sec"] / base_read, 3) for r in reads],
        "per_row_amplification_vs_depth1": [
            round(r["sec_per_mrow"] / base_norm, 3) for r in reads],
    }
    print(json.dumps(result))
    shutil.rmtree(args.base, ignore_errors=True)
    # sanity: every read returns the same logical row count growth pattern
    return 0


if __name__ == "__main__":
    sys.exit(main())
