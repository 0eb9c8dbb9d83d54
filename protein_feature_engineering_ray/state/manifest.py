"""Per-partition watermark / lineage manifest (north-rule resumability).

Layout: ``out_dir/bucket=<k>/data.parquet`` + ``bucket=<k>/_SUCCESS.json``.
Both are written temp-then-rename, so a mid-backfill kill can never leave a
partition that looks complete; resume = skip buckets whose ``_SUCCESS.json``
exists (the reference's accidental per-sample ``.pt`` resume granularity,
ESM_embed.ipynb cell 2, made explicit and atomic — SURVEY.md §4).

Incremental ingest (LSM-style fragments): ``commit_delta`` appends
``delta-<gen>.parquet`` fragments instead of rewriting the partition, so a
1 % append writes ~1 % of the bytes.  ``_SUCCESS.json`` carries the ordered
``fragments`` list; a fragment file not listed there (a crash between the
two renames) is invisible and gets overwritten by the retry.  Readers
resolve with last-generation-wins per conversation (``resolve_fragments``);
``rows`` in the meta counts PHYSICAL rows on disk (>= resolved rows once a
conversation has been superseded).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def ts_bounds_us(col) -> tuple[int | None, int | None]:
    """(min, max) of a ts column in epoch MICROSECONDS regardless of the
    column's own unit (pandas-sourced datasets carry timestamp[ns]; parquet
    carries [us] — a watermark must not depend on which one fed the run)."""
    mm = pc.min_max(col.cast(pa.timestamp("us")))
    to_us = (lambda v: None if v.as_py() is None
             else int(v.cast(pa.int64()).as_py()))
    return to_us(mm["min"]), to_us(mm["max"])


def bucket_dir(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"bucket={bucket:05d}")


RUN_META = "_RUN.json"


def read_run_meta(out_dir: str) -> dict | None:
    p = os.path.join(out_dir, RUN_META)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_run_meta(out_dir: str, num_buckets: int, complete: bool,
                   extra: dict | None = None) -> dict:
    """Root-level run manifest: records the PARTITION LAYOUT (``num_buckets``
    — the hash modulus every bucket dir was committed under) and whether the
    last full backfill DRAINED (``complete``).  Both guard silent corruption:
    a resume/incremental run under a different ``num_buckets`` would hash
    conversations into fresh buckets while their stale rows linger in the old
    ones (duplicates on read), and an incremental ``delta_ds`` pass over a
    partially-committed directory would splice-commit a crashed bucket with
    only the delta's conversations, silently dropping its pre-crash ones."""
    os.makedirs(out_dir, exist_ok=True)
    meta = {"num_buckets": int(num_buckets), "complete": bool(complete),
            "committed_at": time.time(), **(extra or {})}
    tmp = os.path.join(out_dir, ".tmp-run.json")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, RUN_META))
    return meta


def validate_run_layout(out_dir: str, num_buckets: int,
                        what: str = "run") -> dict | None:
    """Raise if ``out_dir`` was committed under a different ``num_buckets``
    than this call is about to use.  Returns the root meta (None if the
    directory predates root manifests or is fresh)."""
    meta = read_run_meta(out_dir)
    if meta is not None and meta.get("num_buckets") != int(num_buckets):
        raise RuntimeError(
            f"{what} over {out_dir!r} uses num_buckets={num_buckets} but the "
            f"directory was committed with num_buckets={meta['num_buckets']}"
            " — conversations would hash into different buckets, leaving "
            "stale rows behind (duplicates on read). Pass the original "
            "num_buckets, or backfill a fresh directory."
        )
    if meta is None and completed_buckets(out_dir):
        raise RuntimeError(
            f"{what} over {out_dir!r}: committed buckets exist but no "
            f"{RUN_META} records their num_buckets — this directory predates "
            "layout manifests; rebuild it (or write _RUN.json by hand if the "
            "layout is known) before resuming into it."
        )
    return meta


def completed_buckets(out_dir: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("bucket=") and os.path.exists(
            os.path.join(out_dir, name, "_SUCCESS.json")
        ):
            done.add(int(name.split("=")[1]))
    return done


def _write_meta(d: str, meta: dict) -> None:
    tmp_m = os.path.join(d, ".tmp-success.json")
    with open(tmp_m, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_m, os.path.join(d, "_SUCCESS.json"))


def read_bucket_meta(out_dir: str, bucket: int) -> dict | None:
    p = os.path.join(bucket_dir(out_dir, bucket), "_SUCCESS.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def fragment_files(meta: dict) -> list[str]:
    """Ordered (generation 0 first) fragment filenames of a partition.
    Pre-fragment metas have no ``fragments`` key: one data.parquet."""
    return [f["file"] for f in meta.get("fragments", [{"file": "data.parquet"}])]


IDX_SUFFIX = ".idx"


def write_conv_index(path: str, table: pa.Table, index_col: str) -> str:
    """Write the exact key→row-group membership sidecar ``<path>.idx``.

    ``table`` is the data file's content, SORTED by ``index_col`` (each key's
    rows are one contiguous run).  One sidecar row per distinct key:
    (key, rg_first, rg_last), with row-group boundaries read back from the
    just-written file's footer — robust to whatever splitting the writer
    applied.  Parquet min/max range pruning over-selects badly when the
    queried keys scatter through the key order (every range "intersects" a
    key that is not actually present); exact membership is what makes the
    corpus store's pass-2 read delta-proportional (state/corpus.py)."""
    import numpy as np

    md = pq.ParquetFile(path).metadata
    bounds = np.cumsum(
        [md.row_group(i).num_rows for i in range(md.num_row_groups)])
    col = table[index_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    vals = arr.to_numpy(zero_copy_only=False)
    n = len(vals)
    if n:
        change = np.flatnonzero(vals[1:] != vals[:-1]) + 1
        starts = np.concatenate(([0], change)).astype(np.int64)
        ends = np.concatenate((change, [n])).astype(np.int64) - 1
        idx = pa.table({
            index_col: pa.array(vals[starts]),
            "rg_first": pa.array(
                np.searchsorted(bounds, starts, side="right"), pa.int32()),
            "rg_last": pa.array(
                np.searchsorted(bounds, ends, side="right"), pa.int32()),
        })
    else:
        idx = pa.table({index_col: pa.array([], pa.string()),
                        "rg_first": pa.array([], pa.int32()),
                        "rg_last": pa.array([], pa.int32())})
    tmp = path + ".tmp-idx"
    pq.write_table(idx, tmp)
    os.replace(tmp, path + IDX_SUFFIX)
    return path + IDX_SUFFIX


def commit_bucket(
    out_dir: str, bucket: int, table: pa.Table, lineage: dict | None = None,
    row_group_size: int | None = None, index_col: str | None = None,
) -> dict:
    """Atomically write one bucket partition + its watermark manifest.

    Rewrites the partition to a single ``data.parquet`` generation: any
    delta fragments a previous meta listed are de-listed (and their files
    removed) — this is also the compaction primitive.  ``row_group_size``
    bounds parquet row groups and ``index_col`` adds the exact key→row-group
    sidecar (the corpus store's pruning granularity; the table must arrive
    sorted by ``index_col``)."""
    d = bucket_dir(out_dir, bucket)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, ".tmp-data.parquet")
    pq.write_table(table, tmp, row_group_size=row_group_size)
    data = os.path.join(d, "data.parquet")
    os.replace(tmp, data)
    if index_col is not None:
        write_conv_index(data, table, index_col)
    elif os.path.exists(data + IDX_SUFFIX):
        os.unlink(data + IDX_SUFFIX)  # stale index over the fresh rewrite
    meta = {
        "bucket": bucket,
        "rows": table.num_rows,
        "committed_at": time.time(),
        **(lineage or {}),
    }
    _write_meta(d, meta)
    for name in os.listdir(d):  # stale fragments are now unreferenced
        if name.startswith("delta-") and (
            name.endswith(".parquet") or name.endswith(IDX_SUFFIX)
        ):
            os.unlink(os.path.join(d, name))
    return meta


def commit_delta(
    out_dir: str, bucket: int, table: pa.Table, lineage: dict | None = None,
    row_group_size: int | None = None, index_col: str | None = None,
) -> dict:
    """Append one delta fragment to an already-committed partition.

    Writes ONLY the fresh rows (the refreshed conversations' full history)
    as ``delta-<gen>.parquet`` — the existing generations are never read or
    rewritten — then atomically re-points ``_SUCCESS.json`` at the extended
    fragment list.  ``lineage`` overwrites same-named meta keys (callers
    pass the advanced ``ts_watermark_us``); ``rows`` becomes the physical
    row total across fragments.  Falls back to ``commit_bucket`` when the
    partition has no committed meta yet (first generation)."""
    meta = read_bucket_meta(out_dir, bucket)
    if meta is None:
        return commit_bucket(out_dir, bucket, table, lineage,
                             row_group_size=row_group_size,
                             index_col=index_col)
    d = bucket_dir(out_dir, bucket)
    frags = meta.get("fragments")
    if frags is None:
        frags = [{"file": "data.parquet", "rows": meta["rows"]}]
        # logical counts from the full-rewrite era would silently go stale
        # as fragments accumulate: rename them base_* (per-fragment counts
        # live in the fragments list; ``rows`` is PHYSICAL across fragments)
        for k in ("convs", "turns"):
            if k in meta:
                meta[f"base_{k}"] = meta.pop(k)
    gen = len(frags)
    name = f"delta-{gen:05d}.parquet"
    tmp = os.path.join(d, f".tmp-{name}")
    pq.write_table(table, tmp, row_group_size=row_group_size)
    frag_path = os.path.join(d, name)
    os.replace(tmp, frag_path)
    if index_col is not None:
        write_conv_index(frag_path, table, index_col)
    frag_entry = {"file": name, "rows": table.num_rows}
    if lineage and "delta_convs" in lineage:
        frag_entry["convs"] = lineage["delta_convs"]
    frags = frags + [frag_entry]
    meta = {
        **meta,
        "rows": sum(f["rows"] for f in frags),
        "committed_at": time.time(),
        **(lineage or {}),
        "fragments": frags,
    }
    _write_meta(d, meta)
    return meta


def resolve_fragments(
    d: str,
    files: list[str],
    key: str = "conv_id",
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> pa.Table:
    """Materialize one partition's logical table: a conversation's rows come
    from the LAST fragment that contains it (an incremental splice rewrites
    a touched conversation's whole history into its delta).  Bounded by the
    partition's physical size — runs inside one read/compact task."""
    tables = [pq.read_table(os.path.join(d, f)) for f in files]
    if len(tables) == 1:
        return tables[0]
    parts: list[pa.Table] = []
    seen: pa.Array | None = None
    for t in reversed(tables):
        if seen is not None and len(seen):
            t = t.filter(pc.invert(pc.is_in(t[key], value_set=seen)))
        parts.append(t)
        ids = pc.unique(t[key])
        seen = ids if seen is None else pc.unique(
            pa.concat_arrays([seen.combine_chunks() if isinstance(
                seen, pa.ChunkedArray) else seen,
                ids.combine_chunks() if isinstance(
                    ids, pa.ChunkedArray) else ids]))
    out = pa.concat_tables(reversed(parts))
    # dict-rank multi-key sort (core.bucket.sort_bucket): byte-identical
    # order, ~1.6x faster than sort_by on string conv_id keys — this sort
    # is the dominant term of the fragmented-read resolve (BASELINE.md
    # fragment sweep)
    from protein_feature_engineering_ray.core.bucket import sort_bucket

    return sort_bucket(out, tuple(sort_cols))


def read_manifest(out_dir: str) -> list[dict]:
    out = []
    for b in sorted(completed_buckets(out_dir)):
        with open(os.path.join(bucket_dir(out_dir, b), "_SUCCESS.json")) as f:
            out.append(json.load(f))
    return out
