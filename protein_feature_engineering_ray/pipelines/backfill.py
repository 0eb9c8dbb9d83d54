"""Flagship end-to-end feature backfill (north rule).

One co-location shuffle computes, per bucket, in a single pass:
sessionization + the full per-turn feature stack (latency, lag/lead, rolling
role composition, rolling value stats, one-hot, position) — the
entity×timestamp feature vectors of BASELINE.json.  Optionally each bucket is
committed atomically to partitioned Parquet with a per-partition watermark
manifest (state/manifest.py), giving mid-backfill resume.

This is the Ray-native replacement for the reference's whole-corpus
descriptor loop + notebook embedding jobs (SURVEY.md §3.1-3.2): streaming
blocks with backpressure instead of a resident corpus, one shuffle instead of
per-descriptor passes, explicit instead of accidental resume.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from protein_feature_engineering_ray.core.bucket import grouped_buckets
from protein_feature_engineering_ray.core.context import ConvContext
from protein_feature_engineering_ray.core.executor import _feature_table
from protein_feature_engineering_ray.functions.registry import make_kernel
from protein_feature_engineering_ray.schema import EVENT_ALPHABET, Alphabet
from protein_feature_engineering_ray.sources.transcripts import from_events
from protein_feature_engineering_ray.stages.sessionize import _session_ids
from protein_feature_engineering_ray.state.manifest import (
    commit_bucket,
    completed_buckets,
)

# canonical transcript schema only (input_hint columns)
DEFAULT_TURN_SPECS = [
    ("Latency", {}),
    ("RollingComposition", {"w": 5}),
    ("OneHot", {}),
    ("PositionFeatures", {}),
    ("TextLen", {}),
]

# events-derived transcripts additionally carry the numeric ``value`` series
EVENTS_TURN_SPECS = [
    ("Latency", {}),
    ("LagLead", {"col": "value", "offsets": (1, 2)}),
    ("RollingComposition", {"w": 5}),
    ("RollingStats", {"col": "value", "w": 5}),
    ("OneHot", {}),
    ("PositionFeatures", {}),
]


def make_backfill_fn(
    kernels,
    alphabet: Alphabet,
    gap_seconds: float = 1800.0,
    assign_turn_idx: bool = True,
    out_dir: str | None = None,
    dedup: bool = False,
    vector_col: str | None = None,
    out_dtype: str = "float64",
):
    names: list[str] = []
    for k in kernels:
        names.extend(k.names())

    def bucket_fn(table: pa.Table) -> pa.Table:
        t_start = time.perf_counter()
        bucket = None
        if "_bucket" in table.column_names:  # kept when committing partitions
            bucket = int(table["_bucket"][0].as_py())
            table = table.drop_columns(["_bucket"])
        if dedup and table.num_rows > 1 and not assign_turn_idx:
            # idempotent re-ingest: duplicated (conv_id, turn_idx) rows are
            # adjacent after the in-bucket sort — keep the first; free here
            # (no extra shuffle, SURVEY §2.8)
            conv = np.asarray(
                table["conv_id"].to_numpy(zero_copy_only=False), dtype=object
            )
            ti = table["turn_idx"].to_numpy(zero_copy_only=False)
            keep = np.ones(table.num_rows, dtype=bool)
            keep[1:] = (conv[1:] != conv[:-1]) | (ti[1:] != ti[:-1])
            if not keep.all():
                table = table.filter(pa.array(keep))
        ctx = ConvContext(table, alphabet)
        if assign_turn_idx:
            ti = ctx.pos.astype(np.int32)
            idx = table.column_names.index("turn_idx")
            table = table.set_column(idx, "turn_idx", pa.array(ti, pa.int32()))
            ctx.table = table
        sid = _session_ids(ctx, int(gap_seconds * 1e6))
        mats = [np.atleast_2d(k.apply(ctx).T).T for k in kernels]
        keys = {
            "conv_id": table["conv_id"],
            "turn_idx": table["turn_idx"],
            "ts": table["ts"],
            "session_idx": pa.array(sid, pa.int64()),
        }
        out = _feature_table(keys, mats, names, vector_col=vector_col,
                             out_dtype=out_dtype)
        if out_dir is not None:
            convs = ctx.n_segs
            # per-partition WATERMARK (max input ts covered by this commit,
            # epoch µs) + metrics: a resuming/incremental run can read how
            # far each partition has progressed and what it cost without
            # opening the data file (north-rule lineage/metrics clause)
            mm = pc.min_max(table["ts"])
            to_us = (lambda v: None if v.as_py() is None
                     else int(v.cast(pa.int64()).as_py()))
            meta = commit_bucket(
                out_dir,
                bucket,
                out,
                lineage={
                    "convs": convs,
                    "turns": ctx.n,
                    "ts_watermark_us": to_us(mm["max"]),
                    "ts_min_us": to_us(mm["min"]),
                    "compute_sec": round(time.perf_counter() - t_start, 4),
                },
            )
            return pa.table(
                {
                    "bucket": pa.array([meta["bucket"]], pa.int64()),
                    "rows": pa.array([meta["rows"]], pa.int64()),
                    "convs": pa.array([convs], pa.int64()),
                }
            )
        return out

    return bucket_fn


def flagship_backfill(
    sf_dir: str,
    num_buckets: int = 32,
    alphabet: Alphabet = EVENT_ALPHABET,
    turn_specs=None,
) -> ray.data.Dataset:
    """events-derived transcripts -> one-pass session + turn-feature stack.
    Returns the (lazy) entity×timestamp feature Dataset."""
    specs = turn_specs or EVENTS_TURN_SPECS
    kernels = [make_kernel(n, alphabet, p)[1] for n, p in specs]
    fn = make_backfill_fn(kernels, alphabet)
    # prune text at the parquet decode unless a kernel declares it reads
    # text (kernel contract: ``needs_text = True``, e.g. TextLen)
    cols = ["role", "tool", "value"]
    if any(getattr(k, "needs_text", False) for k in kernels):
        cols.append("text")
    return grouped_buckets(
        from_events(sf_dir, columns=cols),
        fn, num_buckets=num_buckets,
        order_cols=("conv_id", "ts", "event_id"),
    )


def backfill_to_dir(
    ds: ray.data.Dataset,
    out_dir: str,
    num_buckets: int = 32,
    alphabet: Alphabet = EVENT_ALPHABET,
    turn_specs=None,
    gap_seconds: float = 1800.0,
    order_cols: tuple[str, ...] = ("conv_id", "ts", "event_id"),
    assign_turn_idx: bool = True,
    project: tuple[str, ...] | None = None,
    dedup: bool = False,
    vector_col: str | None = None,
    out_dtype: str = "float64",
) -> list[dict]:
    """Resumable partitioned backfill: skips buckets already committed (their
    ``_SUCCESS.json`` exists), atomically commits the rest, returns the
    manifest rows of THIS run.

    ``project`` prunes columns BEFORE the co-location exchange (shuffle bytes
    are the scaling currency at 100 TB — never ship ``text`` through the
    shuffle when no kernel reads it).  ``vector_col``/``out_dtype="float32"``
    pack the feature stack into one FixedSizeList<float32> column — halves
    the output stream, the one term that cannot scale with cpu count on a
    single node (BASELINE.md)."""
    if project is not None:
        ds = ds.select_columns(list(project))
    done = completed_buckets(out_dir)
    specs = turn_specs or DEFAULT_TURN_SPECS
    kernels = [make_kernel(n, alphabet, p)[1] for n, p in specs]
    fn = make_backfill_fn(
        kernels, alphabet, gap_seconds=gap_seconds,
        assign_turn_idx=assign_turn_idx, out_dir=out_dir, dedup=dedup,
        vector_col=vector_col, out_dtype=out_dtype,
    )
    if done:
        done_arr = np.array(sorted(done), dtype=np.uint32)

        def skip_done(t: pa.Table) -> pa.Table:
            b = t["_bucket"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(b, done_arr)))
    else:
        skip_done = None

    from protein_feature_engineering_ray.core.bucket import add_bucket, sort_bucket

    def _fn(table: pa.Table) -> pa.Table:
        return fn(sort_bucket(table, order_cols))

    withb = add_bucket(ds, num_buckets)
    if skip_done is not None:
        withb = withb.map_batches(skip_done, batch_format="pyarrow")
    manifest = (
        withb.groupby("_bucket").map_groups(_fn, batch_format="pyarrow").to_pandas()
    )
    return manifest.to_dict("records")


def read_backfill(out_dir: str) -> ray.data.Dataset:
    """Read a committed backfill output (only successful partitions)."""
    dirs = [
        f"{out_dir}/bucket={b:05d}/data.parquet"
        for b in sorted(completed_buckets(out_dir))
    ]
    return ray.data.read_parquet(dirs)
