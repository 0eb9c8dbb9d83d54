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

import os
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
    read_run_meta,
    ts_bounds_us as _ts_bounds_us,
    validate_run_layout,
    write_run_meta,
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
            ccol = table["conv_id"]
            if isinstance(ccol, pa.ChunkedArray):
                ccol = ccol.combine_chunks()  # unified: index <=> value
            if not pa.types.is_dictionary(ccol.type) and ccol.null_count == 0:
                # adjacency equality only needs equality-preserving codes
                ccol = ccol.dictionary_encode()
            if pa.types.is_dictionary(ccol.type):
                conv = ccol.indices.to_numpy(zero_copy_only=False)
            else:
                conv = np.asarray(
                    ccol.to_numpy(zero_copy_only=False), dtype=object
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
        conv = table["conv_id"]
        if pa.types.is_dictionary(conv.type):
            conv = conv.cast(pa.string())  # stable output schema
        keys = {
            "conv_id": conv,
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
            lo, hi = _ts_bounds_us(table["ts"])
            meta = commit_bucket(
                out_dir,
                bucket,
                out,
                lineage={
                    "convs": convs,
                    "turns": ctx.n,
                    "ts_watermark_us": hi,
                    "ts_min_us": lo,
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
    # layout guard: resuming under a different num_buckets would hash
    # conversations into fresh buckets while stale rows linger in the old
    # partitions — duplicates on read.  The root _RUN.json records the
    # committed layout; ``complete`` flips true only when a run drains.
    validate_run_layout(out_dir, num_buckets, what="backfill_to_dir")
    write_run_meta(out_dir, num_buckets, complete=False)
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
    write_run_meta(out_dir, num_buckets, complete=True)
    return manifest.to_dict("records")


def _ts_us(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """ts column -> epoch microseconds int64 (normalizes ns-unit pandas
    timestamps the same way ConvContext.ts_us does)."""
    return col.cast(pa.timestamp("us")).cast(pa.int64())


def incremental_backfill_to_dir(
    ds: ray.data.Dataset | None,
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
    max_touched_convs: int = 2_000_000,
    mode: str = "delta",
    max_fragments: int = 16,
    delta_ds: ray.data.Dataset | None = None,
    corpus_dir: str | None = None,
) -> list[dict]:
    """Append-only INCREMENTAL backfill against a committed output dir.

    Where ``backfill_to_dir`` resumes (skips whole committed buckets),
    this ingests NEW DATA into them: it recomputes exactly the
    conversations that own rows newer than their bucket's committed
    ``ts_watermark_us``, splices their refreshed feature rows into the
    partition (untouched conversations' rows are carried over unchanged),
    and advances the watermark.  The logical output (``read_backfill``) is
    identical to a cold full backfill over the whole input.

    ``mode="delta"`` (default, the 100 TB shape): the splice APPENDS the
    refreshed conversations as an LSM-style ``delta-<gen>.parquet``
    fragment — a 1 % append writes ~1 % of the bytes; the committed
    generations are never read or rewritten.  Readers resolve
    last-generation-wins per conversation; once a bucket would exceed
    ``max_fragments`` the splice compacts it (resolve + single-file
    rewrite) instead, bounding read amplification.  ``mode="rewrite"``
    resolves and rewrites every touched partition to one ``data.parquet``
    (measured at 10 M turns / 1 % delta this is SLOWER than a cold
    rebuild — the backfill is byte-bound, not compute-bound — which is
    exactly why delta is the default; scripts/incremental_proof.py).

    Scale shape (the whole point at 100 TB):
    - pass 1 is a column-pruned (conv_id, ts) scan; only rows PAST each
      bucket's watermark survive the filter, so the driver-side touched-
      conversation set is proportional to the NEW data, not the corpus —
      and is loudly capped by ``max_touched_convs`` (a touched set near
      corpus size means a full backfill is cheaper; run that instead).
      With ARRIVAL-PARTITIONED ingest (new rows land in their own files —
      the natural 100 TB layout) pass ``delta_ds`` pointing at just the
      new files: pass 1 then scans ONLY the delta instead of the whole
      mixed corpus, turning the incremental's two full column-pruned
      passes into one full pass (pass 2's touched-history collection)
      plus a delta-sized one.  ``ds`` must still be the FULL corpus
      (base + delta): touched conversations recompute over their entire
      history.
    - pass 2 ships only touched conversations' rows (full history — the
      windowed/sessionized features need it) through the one co-location
      exchange; buckets with no new data are never read, shuffled, or
      rewritten.
    - in delta mode the splice reads only the bucket's meta JSON; the
      occasional compaction (and every rewrite-mode splice) reads one
      committed partition inside the bucket task — bounded by partition
      size, never a driver fold.

    WATERMARK CONTRACT (standard streaming semantics): every row added
    since the committed run must carry ``ts`` strictly greater than its
    bucket's ``ts_watermark_us``.  Late data at-or-before the watermark is
    invisible to the pass-1 filter; backfill a fresh directory if ingest
    cannot honor the contract.

    ``corpus_dir`` (the 100 TB pass-2 shape): when the committed INPUT lives
    in a bucket-partitioned corpus store (state/corpus.py — same
    ``bucket_hash(conv_id)`` modulus as this output), pass 2 no longer scans
    the whole corpus to collect touched conversations' history: it reads
    ONLY the touched buckets' files, row-group-pruned to the touched
    conversations (the store writes partitions sorted by conv_id with
    bounded parquet row groups).  A 1 TB delta against a 100 TB corpus then
    reads ~delta-proportional bytes in BOTH passes instead of one full scan
    (scripts/incremental_proof.py measures the pruning).  ``ds`` may be
    None in that case; with arrival-partitioned ingest pass ``delta_ds``
    pointing at the fragments ``append_corpus`` just wrote.
    """
    from protein_feature_engineering_ray.core.bucket import add_bucket, sort_bucket
    from protein_feature_engineering_ray.state.manifest import (
        bucket_dir,
        commit_delta,
        fragment_files,
        read_bucket_meta,
        read_manifest,
        resolve_fragments,
    )

    if mode not in ("delta", "rewrite"):
        raise ValueError(f"mode must be 'delta' or 'rewrite', got {mode!r}")
    if ds is None and corpus_dir is None:
        raise ValueError("pass ds, or corpus_dir to read the corpus store")

    validate_run_layout(out_dir, num_buckets,
                        what="incremental_backfill_to_dir")
    if corpus_dir is not None:
        from protein_feature_engineering_ray.state.corpus import (
            corpus_meta,
            read_corpus,
        )

        cmeta = corpus_meta(corpus_dir)
        if cmeta["num_buckets"] != num_buckets:
            raise RuntimeError(
                f"corpus store {corpus_dir!r} is partitioned with "
                f"num_buckets={cmeta['num_buckets']} but this backfill uses "
                f"{num_buckets} — touched-bucket pruning requires the same "
                "hash modulus on both layouts"
            )
        if ds is None:
            ds = read_corpus(corpus_dir, columns=project)

    done = completed_buckets(out_dir)
    if not done:
        return backfill_to_dir(
            ds, out_dir, num_buckets=num_buckets, alphabet=alphabet,
            turn_specs=turn_specs, gap_seconds=gap_seconds,
            order_cols=order_cols, assign_turn_idx=assign_turn_idx,
            project=project, dedup=dedup, vector_col=vector_col,
            out_dtype=out_dtype,
        )
    if delta_ds is not None:
        root = read_run_meta(out_dir)
        if not (root and root.get("complete")):
            # with delta-only pass 1, a bucket that crashed mid-backfill
            # (no _SUCCESS) would splice-commit holding ONLY the delta's
            # conversations — its pre-crash conversations silently dropped.
            # Full-corpus pass 1 is safe (the -inf watermark touches every
            # conversation of an uncommitted bucket); require it, or a
            # finished resume, before trusting a delta-sized scan.
            raise RuntimeError(
                f"{out_dir!r} holds a partially-committed backfill (root "
                "manifest not complete): finish it first — rerun "
                "backfill_to_dir (resume) or run incremental_backfill_to_dir "
                "without delta_ds (full-corpus pass 1) — before using "
                "delta_ds, or its crashed buckets would commit without "
                "their pre-crash conversations"
            )

    if project is not None:
        ds = ds.select_columns(list(project))

    # bucket -> committed watermark (µs); uncommitted buckets get -inf so
    # ANY row they receive counts as new
    wm = np.full(num_buckets, np.iinfo(np.int64).min, dtype=np.int64)
    for m in read_manifest(out_dir):
        if m.get("ts_watermark_us") is not None:
            wm[m["bucket"]] = m["ts_watermark_us"]

    # ---- pass 1: touched conversations (pruned scan, new rows only) ----
    def new_convs(t: pa.Table) -> pa.Table:
        from protein_feature_engineering_ray.core.bucket import bucket_hash

        col = t["conv_id"]
        if pa.types.is_dictionary(col.type):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            dic_b = bucket_hash(
                col.dictionary.to_numpy(zero_copy_only=False), num_buckets)
            b = dic_b[col.indices.to_numpy(zero_copy_only=False)]
        else:
            b = bucket_hash(col.to_numpy(zero_copy_only=False), num_buckets)
        ts = _ts_us(t["ts"]).combine_chunks() if isinstance(
            t["ts"], pa.ChunkedArray) else _ts_us(t["ts"])
        is_new = np.asarray(ts) > wm[b]
        conv = t["conv_id"].filter(pa.array(is_new))
        uniq = conv.unique()
        if pa.types.is_dictionary(uniq.type):
            uniq = uniq.cast(pa.string())  # plain strings into Dataset.unique
        return pa.table({"conv_id": uniq})

    touched = (
        (delta_ds if delta_ds is not None else ds)
        .select_columns(["conv_id", "ts"])
        .map_batches(new_convs, batch_format="pyarrow")
        .unique("conv_id")
    ) or []  # Dataset.unique returns None on an all-empty dataset
    if len(touched) == 0:
        return []
    if len(touched) > max_touched_convs:
        raise RuntimeError(
            f"incremental backfill touches {len(touched)} conversations > "
            f"max_touched_convs={max_touched_convs}; at that volume a full "
            f"backfill into a fresh directory is cheaper — run that instead"
        )
    touched_sorted = sorted(touched)
    # broadcast the touched set ONCE via the object store — at the
    # max_touched_convs cap this is ~10^8 bytes of conv_id strings, which a
    # task-closure capture would re-pickle into every pass-2 task
    touched_ref = ray.put(pa.array(touched_sorted))

    # ---- pass 2: full history of touched convs only, splice-committed ----
    compute_fn = make_backfill_fn(
        [make_kernel(n, alphabet, p)[1]
         for n, p in (turn_specs or DEFAULT_TURN_SPECS)],
        alphabet, gap_seconds=gap_seconds, assign_turn_idx=assign_turn_idx,
        out_dir=None, dedup=dedup, vector_col=vector_col, out_dtype=out_dtype,
    )

    def keep_touched(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t["conv_id"], value_set=ray.get(touched_ref)))

    def splice(table: pa.Table) -> pa.Table:
        t_start = time.perf_counter()
        bucket = int(table["_bucket"][0].as_py())
        table = sort_bucket(table.drop_columns(["_bucket"]), order_cols)
        fresh = compute_fn(table)
        d = bucket_dir(out_dir, bucket)
        old_meta = read_bucket_meta(out_dir, bucket) or {}
        old_wm = old_meta.get("ts_watermark_us")
        old_min = old_meta.get("ts_min_us")
        new_min, new_wm = _ts_bounds_us(table["ts"])
        lineage = {
            "ts_watermark_us": max(
                x for x in (old_wm, new_wm) if x is not None),
            "ts_min_us": min(
                x for x in (old_min, new_min) if x is not None),
            "incremental": True,
        }
        frags = fragment_files(old_meta) if old_meta else []
        if (mode == "delta" and old_meta
                and len(frags) + 1 <= max_fragments):
            lineage.update({
                "delta_convs": int(
                    pc.count_distinct(fresh["conv_id"]).as_py()),
                "delta_turns": fresh.num_rows,
                "compute_sec": round(time.perf_counter() - t_start, 4),
            })
            meta = commit_delta(out_dir, bucket, fresh, lineage)
        else:
            # rewrite mode, first generation, or fragment-cap compaction
            if old_meta:
                old = resolve_fragments(d, frags)
                carry = old.filter(pc.invert(
                    pc.is_in(old["conv_id"], value_set=ray.get(touched_ref))))
                out = pa.concat_tables([carry, fresh]).sort_by(
                    [("conv_id", "ascending"), ("turn_idx", "ascending")]
                )
            else:
                out = fresh
            lineage.update({
                "convs": int(pc.count_distinct(out["conv_id"]).as_py()),
                "turns": out.num_rows,
                "compute_sec": round(time.perf_counter() - t_start, 4),
            })
            meta = commit_bucket(out_dir, bucket, out, lineage)
        return pa.table({
            "bucket": pa.array([meta["bucket"]], pa.int64()),
            "rows": pa.array([meta["rows"]], pa.int64()),
            "convs": pa.array(
                [meta.get("convs", meta.get("delta_convs", 0))], pa.int64()),
        })

    if corpus_dir is not None:
        # touched-bucket + row-group pruned read: only the touched buckets'
        # files are opened, and inside each file only the row groups whose
        # conv_id [min, max] range intersects the touched set are decoded —
        # pass 2's read cost is delta-proportional, not corpus-proportional
        from protein_feature_engineering_ray.core.bucket import bucket_hash

        tb = np.unique(bucket_hash(
            np.asarray(touched_sorted, dtype=object), num_buckets))
        src = read_corpus(
            corpus_dir, buckets=[int(b) for b in tb], columns=project,
            conv_filter=touched_ref,
        )
    else:
        src = ds.map_batches(keep_touched, batch_format="pyarrow")
    manifest = (
        add_bucket(src, num_buckets)
        .groupby("_bucket")
        .map_groups(splice, batch_format="pyarrow")
        .to_pandas()
    )
    # a full-pass-1 incremental over a partially-committed dir completes it
    # (uncommitted buckets' conversations were all touched and spliced in)
    write_run_meta(out_dir, num_buckets, complete=True)
    return manifest.to_dict("records")


def _fragmented_partitions(out_dir: str) -> tuple[list[dict], list[dict]]:
    """(all partition metas, the subset with >1 fragment)."""
    from protein_feature_engineering_ray.state.manifest import (
        fragment_files,
        read_manifest,
    )

    metas = read_manifest(out_dir)
    return metas, [m for m in metas if len(fragment_files(m)) > 1]


def read_backfill(out_dir: str) -> ray.data.Dataset:
    """Read a committed backfill output (only successful partitions).

    Partitions never touched by a delta-mode incremental ingest stream
    through the plain parquet reader; fragmented ones are resolved
    (last-generation-wins per conversation) one partition per task —
    bounded by partition size, same shape as the splice that wrote them."""
    from protein_feature_engineering_ray.state.manifest import (
        bucket_dir,
        fragment_files,
        resolve_fragments,
    )

    metas, multi = _fragmented_partitions(out_dir)
    plain = [
        os.path.join(bucket_dir(out_dir, m["bucket"]), "data.parquet")
        for m in metas if len(fragment_files(m)) == 1
    ]
    parts = []
    if plain:
        parts.append(ray.data.read_parquet(plain))
    if multi:
        items = [
            {"dir": bucket_dir(out_dir, m["bucket"]),
             "bucket": f"{m['bucket']:05d}",
             "files": ";".join(fragment_files(m))}
            for m in multi
        ]

        def _resolve(t: pa.Table) -> pa.Table:
            # mirror the hive-partition column the plain reader infers
            # from the bucket=<k> directory names
            out = []
            for d, b, f in zip(t["dir"], t["bucket"], t["files"]):
                r = resolve_fragments(d.as_py(), f.as_py().split(";"))
                out.append(r.append_column(
                    "bucket",
                    pa.array([b.as_py()] * r.num_rows, pa.string())))
            return pa.concat_tables(out)

        parts.append(
            ray.data.from_items(items, override_num_blocks=len(items))
            .map_batches(_resolve, batch_format="pyarrow")
        )
    if not parts:
        return ray.data.from_items([])
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]


def compact_backfill(out_dir: str) -> list[dict]:
    """Rewrite every fragmented partition to a single ``data.parquet``
    generation (resolve + atomic commit, watermark preserved).  Run this on
    the ingest cadence's amortization schedule — delta ingests stay cheap,
    read amplification stays bounded.  Returns the compacted buckets'
    manifest rows."""
    from protein_feature_engineering_ray.state.manifest import (
        bucket_dir,
        commit_bucket,
        fragment_files,
        resolve_fragments,
    )

    _, multi = _fragmented_partitions(out_dir)
    if not multi:
        return []
    items = [
        {"bucket": m["bucket"],
         "files": ";".join(fragment_files(m)),
         "ts_watermark_us": m.get("ts_watermark_us"),
         "ts_min_us": m.get("ts_min_us")}
        for m in multi
    ]

    def _compact(t: pa.Table) -> pa.Table:
        rows_out = []
        for i in range(t.num_rows):
            b = int(t["bucket"][i].as_py())
            table = resolve_fragments(
                bucket_dir(out_dir, b), t["files"][i].as_py().split(";"))
            meta = commit_bucket(
                out_dir, b, table,
                lineage={
                    "convs": int(
                        pc.count_distinct(table["conv_id"]).as_py()),
                    "turns": table.num_rows,
                    "ts_watermark_us": t["ts_watermark_us"][i].as_py(),
                    "ts_min_us": t["ts_min_us"][i].as_py(),
                    "compacted": True,
                },
            )
            rows_out.append((meta["bucket"], meta["rows"]))
        return pa.table({
            "bucket": pa.array([r[0] for r in rows_out], pa.int64()),
            "rows": pa.array([r[1] for r in rows_out], pa.int64()),
        })

    return (
        ray.data.from_items(items, override_num_blocks=len(items))
        .map_batches(_compact, batch_format="pyarrow")
        .to_pandas()
        .to_dict("records")
    )
