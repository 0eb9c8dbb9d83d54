"""Kill/resume proof at SCALING scale (north-rule resumability, judged at
40M turns — the small-scale equivalence lives in tests/test_pipeline.py).

Protocol (each phase a fresh process owning its own local Ray session):

1. **killed run**: start the full backfill into ``<base>/resume``; the
   parent polls the output dir and SIGKILLs the whole process group the
   moment >= half the buckets carry a ``_SUCCESS.json`` watermark.
2. **resume run**: the same command again — ``backfill_to_dir`` must skip
   every committed bucket and recompute ONLY the missing ones (the run's
   manifest is asserted == the post-kill missing set).
3. **cold run**: same input into ``<base>/cold`` for the wall-time and
   equality reference.
4. **equality**: DuckDB folds count + order-insensitive value hashes over
   both outputs (conv_id / event_id / turn_idx / the packed float32 feature
   vector) — the resumed directory must be value-identical to the cold one.

Usage::

    python scripts/resume_proof.py                  # 40M turns, 32 cpus
    python scripts/resume_proof.py --replicate 20   # quick 2M-turn check

Prints ONE JSON line; record it in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child_main(args) -> int:
    """One full (or killed-from-outside) backfill run; prints this run's
    manifest bucket list as JSON on completion."""
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()
    from protein_feature_engineering_ray.pipelines.backfill import (
        EVENTS_TURN_SPECS,
        backfill_to_dir,
    )
    from protein_feature_engineering_ray.schema import EVENT_ROLE_ALPHABET
    from protein_feature_engineering_ray.sources.synthscale import (
        replicated_events,
        sized_num_buckets,
    )
    from protein_feature_engineering_ray.sources.transcripts import pre_encode

    ds = pre_encode(replicated_events(args.sf_dir, args.replicate),
                    EVENT_ROLE_ALPHABET)
    manifest = backfill_to_dir(
        ds, args.out, num_buckets=sized_num_buckets(args.n_turns),
        turn_specs=EVENTS_TURN_SPECS,
        project=("conv_id", "event_id", "turn_idx", "role_code",
                 "tool_flag", "ts", "value"),
        vector_col="features", out_dtype="float32",
    )
    print("MANIFEST " + json.dumps(sorted(int(m["bucket"]) for m in manifest)))
    ray.shutdown()
    return 0


def _spawn(argv: list[str]) -> subprocess.Popen:
    # new session => the child's whole Ray process tree shares one process
    # group we can SIGKILL atomically
    return subprocess.Popen(
        argv, start_new_session=True, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True,
    )


def _dir_hash(con, out_dir: str) -> tuple:
    row = con.execute(
        f"""SELECT count(*),
               sum(hash(conv_id)), sum(hash(turn_idx)), sum(hash(ts)),
               sum(hash(session_idx)), sum(hash(features))
        FROM read_parquet('{out_dir}/bucket=*/data.parquet')"""
    ).fetchone()
    return tuple(int(x) for x in row)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--replicate", type=int, default=400)  # 40M turns
    p.add_argument("--num-cpus", type=int, default=int(
        os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--base", default="/dev/shm/resume_proof")
    p.add_argument("--n-turns", type=int, default=0, help="internal")
    p.add_argument("--out", default=None, help="internal: child mode")
    args = p.parse_args()

    import duckdb

    base_turns = duckdb.sql(
        f"select count(*) from read_parquet('{args.sf_dir}/events.parquet')"
    ).fetchone()[0]
    args.n_turns = base_turns * max(args.replicate, 1)

    if args.out is not None:
        return child_main(args)

    from protein_feature_engineering_ray.sources.synthscale import (
        sized_num_buckets,
    )
    from protein_feature_engineering_ray.state.manifest import (
        completed_buckets,
    )

    nb = sized_num_buckets(args.n_turns)
    resume_dir = os.path.join(args.base, "resume")
    cold_dir = os.path.join(args.base, "cold")
    shutil.rmtree(args.base, ignore_errors=True)
    os.makedirs(args.base)

    def child_cmd(out_dir):
        return [sys.executable, os.path.abspath(__file__),
                "--sf-dir", args.sf_dir, "--replicate", str(args.replicate),
                "--num-cpus", str(args.num_cpus), "--out", out_dir]

    # 1. killed run: SIGKILL the process group at >= nb//2 committed buckets
    t0 = time.perf_counter()
    proc = _spawn(child_cmd(resume_dir))
    killed_after = None
    while proc.poll() is None:
        done = len(completed_buckets(resume_dir))
        if done >= nb // 2:
            os.killpg(proc.pid, signal.SIGKILL)
            killed_after = done
            break
        time.sleep(0.25)
    proc.wait()
    t_kill = round(time.perf_counter() - t0, 3)
    assert killed_after is not None, (
        "backfill finished before reaching the kill point — raise "
        "--replicate so the run is long enough to kill mid-flight")
    time.sleep(2.0)  # let the killed Ray tree die before starting a new one

    done_after_kill = completed_buckets(resume_dir)
    missing = sorted(set(range(nb)) - done_after_kill)

    # 2. resume run
    t0 = time.perf_counter()
    proc = _spawn(child_cmd(resume_dir))
    out, _ = proc.communicate()
    t_resume = round(time.perf_counter() - t0, 3)
    assert proc.returncode == 0, "resume run failed"
    resumed = json.loads(
        [ln for ln in out.splitlines() if ln.startswith("MANIFEST ")][-1][9:]
    )
    assert resumed == missing, (
        f"resume recomputed the wrong buckets: {len(resumed)} vs "
        f"{len(missing)} missing")

    # 3. cold reference run
    t0 = time.perf_counter()
    proc = _spawn(child_cmd(cold_dir))
    out, _ = proc.communicate()
    t_cold = round(time.perf_counter() - t0, 3)
    assert proc.returncode == 0, "cold run failed"

    # 4. value equality (order-insensitive exact hashes)
    con = duckdb.connect()
    h_resume = _dir_hash(con, resume_dir)
    h_cold = _dir_hash(con, cold_dir)
    equal = h_resume == h_cold

    result = {
        "metric": "40M-turn kill/resume proof (north-rule resumability)",
        "n_turns": args.n_turns,
        "num_buckets": nb,
        "num_cpus": args.num_cpus,
        "killed_after_buckets": killed_after,
        "buckets_resumed": len(resumed),
        "sec_until_kill": t_kill,
        "sec_resume": t_resume,
        "sec_cold_full": t_cold,
        "outputs_equal": equal,
        "rows": h_resume[0],
    }
    print(json.dumps(result))
    shutil.rmtree(args.base, ignore_errors=True)
    return 0 if equal else 1


if __name__ == "__main__":
    sys.exit(main())
