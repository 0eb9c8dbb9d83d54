"""Conversation-skew resilience proof (the bucket.py scale note, measured).

Claim under test: ONE mega-conversation holding ~1/3 of every turn in the
corpus cannot straggle descriptor extraction.  The unchunked executor
co-locates a whole conversation in one bucket task by design, so the mega
conversation serializes its kernel+sort work on one core; the skew router
(``conv_features_auto``) detects conversations longer than ``chunk_size``
with a column-pruned pre-pass, routes ONLY them through the salted
chunked machinery (``ceil(n/chunk_size)`` independent chunk tasks that
hash across the cluster + a tiny per-conv partial merge) and everything
else through the plain one-exchange path — with output EQUAL to the
unchunked path (bit-exact for count-derived families, allclose for the
order-merged float lag families).

Protocol (one process, one Ray session — both paths read the SAME
materialized canonical input, so the comparison isolates the kernel-stage
skew):

1. Replicate the sf0.1 events table R times; the first R/3 copies are
   rewritten to a single conv id (``MEGA``), the rest keep distinct
   per-copy conversations.
2. Assign canonical turn_idx (one co-location pass) and materialize.
3. Path A: ``conv_features`` (whole conversations).  Path B:
   ``conv_features_auto`` (routes MEGA through ~16 chunk tasks, the other
   conversations through the plain path).  Each timed min-of-2 after a
   warm-up of the opposite path.
4. Equality: AAC/DPC/CKSAAP/DDE columns bit-exact, NMBroto/AC allclose.

Pass = outputs equal AND the chunked path is not slower than the
unchunked path beyond jitter (<= 0.8x wall, i.e. >= 1.25x speedup — at a
33% skew share the serial floor alone predicts ~2x on an idle 32-core
host; the lenient gate keeps the proof robust to neighbor noise).

Prints ONE JSON line; record it in BASELINE.md.

Usage::

    python scripts/megaconv_proof.py                  # R=48 (~4.8M turns)
    python scripts/megaconv_proof.py --replicate 12   # quick smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=48)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--num-cpus", type=int, default=int(
        os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--chunk-size", type=int, default=65536)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()

    from protein_feature_engineering_ray.core.bucket import grouped_buckets
    from protein_feature_engineering_ray.core.context import ConvContext
    from protein_feature_engineering_ray.core.executor import (
        conv_features,
        conv_features_auto,
    )
    from protein_feature_engineering_ray.functions.registry import make_kernel
    from protein_feature_engineering_ray.schema import EVENT_ALPHABET
    from protein_feature_engineering_ray.sources.synthscale import (
        replicated_events,
        sized_num_buckets,
    )

    R = args.replicate
    n_mega_copies = max(1, R // 3)

    def with_mega(t: pa.Table) -> pa.Table:
        # copies 0..n_mega_copies-1 (suffix "#k") collapse into ONE conv
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False),
                          dtype=object)
        copy = np.array([int(c.rsplit("#", 1)[1]) for c in conv],
                        dtype=np.int64)
        conv = np.where(copy < n_mega_copies, "MEGA", conv)
        i = t.column_names.index("conv_id")
        return t.set_column(i, "conv_id", pa.array(conv, pa.string()))

    events = replicated_events(args.sf_dir, R).map_batches(
        with_mega, batch_format="pyarrow")

    # canonical turn_idx (both paths consume the SAME materialized input)
    def assign(table: pa.Table) -> pa.Table:
        ctx = ConvContext(table, EVENT_ALPHABET)
        i = table.column_names.index("turn_idx")
        return table.set_column(
            i, "turn_idx", pa.array(ctx.pos.astype(np.int32), pa.int32()))

    nb = sized_num_buckets(0)  # placeholder; fixed after count
    t0 = time.perf_counter()
    canon = grouped_buckets(
        events, assign, num_buckets=256,
        order_cols=("conv_id", "ts", "event_id"),
    ).materialize()
    sec_canonical = round(time.perf_counter() - t0, 3)
    n_turns = canon.count()
    nb = sized_num_buckets(n_turns)
    mega_rows = int(canon.map_batches(
        lambda t: pa.table({"n": pa.array(
            [pc.sum(pc.cast(pc.equal(t["conv_id"], "MEGA"),
                            pa.int64())).as_py() or 0], pa.int64())}),
        batch_format="pyarrow").to_pandas()["n"].sum())

    SPECS = [("AAC", {}), ("DPC", {}), ("CKSAAP", {"kspace": 3}),
             ("DDE", {}), ("NMBroto", {"nlag": 4}), ("AC", {"nlag": 4})]
    kernels = [make_kernel(n, EVENT_ALPHABET, p)[1] for n, p in SPECS]
    exact_prefixes = ("aac_", "dpc_", "cksaap_", "dde_")

    def run_unchunked():
        return conv_features(
            canon, kernels, alphabet=EVENT_ALPHABET, num_buckets=nb,
            order_cols=("conv_id", "turn_idx"),
        ).to_pandas()

    def run_chunked():
        return conv_features_auto(
            canon, kernels, alphabet=EVENT_ALPHABET,
            chunk_size=args.chunk_size, num_buckets=nb,
        ).to_pandas()

    # warm-up (worker pool, imports, page cache) then min-of-2 each,
    # interleaved so a load drift cannot land on one path only
    run_chunked()
    walls_a, walls_b = [], []
    dfa = dfb = None
    for _ in range(2):
        t0 = time.perf_counter()
        dfa = run_unchunked()
        walls_a.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        dfb = run_chunked()
        walls_b.append(time.perf_counter() - t0)
    sec_unchunked = round(min(walls_a), 3)
    sec_chunked = round(min(walls_b), 3)

    dfa = dfa.sort_values("conv_id").reset_index(drop=True)
    dfb = dfb.sort_values("conv_id").reset_index(drop=True)
    ok_rows = len(dfa) == len(dfb) and (
        dfa["conv_id"].to_numpy() == dfb["conv_id"].to_numpy()).all()
    bit_exact_cols = allclose_cols = 0
    ok_exact = ok_close = True
    if ok_rows:
        for c in dfa.columns:
            if c == "conv_id":
                continue
            a, b = dfa[c].to_numpy(), dfb[c].to_numpy()
            if c.startswith(exact_prefixes):
                bit_exact_cols += 1
                ok_exact &= bool(np.array_equal(a, b))
            else:
                allclose_cols += 1
                ok_close &= bool(np.allclose(a, b, rtol=1e-9, atol=1e-12))

    speedup = round(sec_unchunked / sec_chunked, 3)
    result = {
        "metric": ("mega-conversation skew proof: unchunked vs skew-routed "
                   "(conv_features_auto) descriptor extraction (6 "
                   "families), same materialized canonical input"),
        "n_turns": n_turns,
        "mega_rows": mega_rows,
        "mega_share": round(mega_rows / n_turns, 3),
        "num_buckets": nb,
        "chunk_size": args.chunk_size,
        "mega_chunks": -(-mega_rows // args.chunk_size),
        "bucket_skew_x": round(mega_rows / (n_turns / nb), 1),
        "num_cpus": args.num_cpus,
        "sec_canonicalize": sec_canonical,
        "sec_unchunked": sec_unchunked,
        "sec_chunked": sec_chunked,
        "sec_unchunked_all": [round(w, 3) for w in walls_a],
        "sec_chunked_all": [round(w, 3) for w in walls_b],
        "chunked_speedup_x": speedup,
        "n_convs": len(dfa),
        "bit_exact_cols": bit_exact_cols,
        "allclose_cols": allclose_cols,
        "rows_equal": bool(ok_rows),
        "count_families_bit_exact": bool(ok_exact),
        "lag_families_allclose": bool(ok_close),
        "loadavg_1m": round(os.getloadavg()[0], 1),
    }
    ok = ok_rows and ok_exact and ok_close and speedup >= 1.25
    result["pass"] = bool(ok)
    print(json.dumps(result))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
