"""Bucket-partitioned managed CORPUS store — the committed INPUT layout.

At 100 TB the incremental backfill's pass 2 (collect the touched
conversations' full history) must not scan the whole corpus: a 1 TB daily
delta would re-read 100 TB per increment.  This store keeps the raw input
co-partitioned by the SAME ``bucket_hash(conv_id)`` modulus as the feature
output (pipelines/backfill.py), so pass 2 opens only the touched buckets'
files — and inside each file only the parquet ROW GROUPS whose conv_id
[min, max] statistics range intersects the touched set (partitions are
written sorted by conv_id with bounded row groups).  Read cost is then
proportional to the delta, not the corpus (scripts/incremental_proof.py
measures it).

Layout mirrors the feature store (state/manifest.py): one
``bucket=<k>/data.parquet`` generation per bucket plus append-only
``delta-<gen>.parquet`` fragments, ``_SUCCESS.json`` per bucket and a root
``_RUN.json`` recording ``num_buckets``.  The one SEMANTIC difference:
corpus fragments are arrival waves of NEW ROWS, so readers CONCATENATE all
fragments (``resolve: "concat"`` in the metas) — unlike the feature store's
last-generation-wins, where a delta supersedes a conversation's rows.

Idempotency rides the same per-bucket watermark as the splice: an
``append_corpus`` retry after a mid-append crash re-filters each bucket's
rows against its committed ``ts_watermark_us``, so already-committed
fragments are never duplicated (the north rule's resume granularity applied
to ingest itself — the reference's analogue is the per-sample ``.pt`` skip,
ESM_embed.ipynb cell 2).  Rows AT the watermark microsecond are resolved by
an exact whole-row multiset diff against the committed rows at that
timestamp (row-group-pruned read), so a retry skips them while a genuinely
new same-microsecond row arriving in a later wave is still ingested — the
watermark never silently drops data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from protein_feature_engineering_ray.core.bucket import add_bucket, sort_bucket
from protein_feature_engineering_ray.state.manifest import (
    bucket_dir,
    commit_bucket,
    commit_delta,
    completed_buckets,
    fragment_files,
    read_bucket_meta,
    read_manifest,
    read_run_meta,
    ts_bounds_us,
    validate_run_layout,
    write_run_meta,
)

# bounded row groups are the pruning granularity: touched reads decode
# ~ROW_GROUP_ROWS × touched-conv-count rows, not whole partitions
ROW_GROUP_ROWS = 64 * 1024

ORDER_COLS = ("conv_id", "ts")


def corpus_meta(corpus_dir: str) -> dict:
    meta = read_run_meta(corpus_dir)
    if meta is None:
        raise RuntimeError(
            f"{corpus_dir!r} is not a corpus store (no _RUN.json); build it "
            "with ingest_corpus first"
        )
    return meta


def ingest_corpus(
    ds: ray.data.Dataset,
    corpus_dir: str,
    num_buckets: int,
    order_cols: tuple[str, ...] = ORDER_COLS,
) -> list[dict]:
    """Commit ``ds`` as the corpus base generation: one co-location shuffle,
    each bucket written sorted by ``order_cols`` (conv_id first — the
    row-group pruning contract) with per-bucket ts watermarks.  Resumable
    like the feature backfill: committed buckets are skipped on rerun."""
    validate_run_layout(corpus_dir, num_buckets, what="ingest_corpus")
    write_run_meta(corpus_dir, num_buckets, complete=False,
                   extra={"kind": "corpus", "resolve": "concat"})
    done = completed_buckets(corpus_dir)

    def commit(table: pa.Table) -> pa.Table:
        bucket = int(table["_bucket"][0].as_py())
        table = sort_bucket(table.drop_columns(["_bucket"]), order_cols)
        lo, hi = ts_bounds_us(table["ts"])
        meta = commit_bucket(
            corpus_dir, bucket, table,
            lineage={"ts_watermark_us": hi, "ts_min_us": lo,
                     "resolve": "concat"},
            row_group_size=ROW_GROUP_ROWS, index_col="conv_id",
        )
        return pa.table({
            "bucket": pa.array([meta["bucket"]], pa.int64()),
            "rows": pa.array([meta["rows"]], pa.int64()),
        })

    withb = add_bucket(ds, num_buckets)
    if done:
        done_arr = np.array(sorted(done), dtype=np.uint32)

        def skip_done(t: pa.Table) -> pa.Table:
            b = t["_bucket"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(b, done_arr)))

        withb = withb.map_batches(skip_done, batch_format="pyarrow")
    manifest = (
        withb.groupby("_bucket").map_groups(commit, batch_format="pyarrow")
        .to_pandas()
    )
    write_run_meta(corpus_dir, num_buckets, complete=True,
                   extra={"kind": "corpus", "resolve": "concat"})
    return manifest.to_dict("records")


def _committed_rows_at_ts(corpus_dir: str, bucket: int, wm_us: int,
                          meta: dict) -> pa.Table:
    """Every committed row of one bucket whose ts equals ``wm_us``, decoding
    only the row groups whose ts statistics cover the watermark (the
    boundary microsecond typically lives in a handful of groups)."""

    def _us(v) -> int:
        # parquet stats give datetimes; route through pyarrow for exact us
        return int(pa.scalar(v).cast(pa.timestamp("us"))
                   .cast(pa.int64()).as_py())

    bdir = bucket_dir(corpus_dir, bucket)
    out = []
    for fname in fragment_files(meta):
        pf = pq.ParquetFile(os.path.join(bdir, fname))
        ts_idx = pf.schema_arrow.get_field_index("ts")
        keep = []
        for g in range(pf.num_row_groups):
            st = pf.metadata.row_group(g).column(ts_idx).statistics
            if st is None or not st.has_min_max:
                keep.append(g)  # no stats: read conservatively
            elif _us(st.min) <= wm_us <= _us(st.max):
                keep.append(g)
        if not keep:
            continue
        t = pf.read_row_groups(keep)
        ts = t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        t = t.filter(pc.equal(ts, wm_us))
        if t.num_rows:
            out.append(t)
    if not out:
        return pa.table({})
    return pa.concat_tables(out)


def _multiset_diff(new: pa.Table, committed: pa.Table) -> pa.Table:
    """``new`` minus ``committed`` as MULTISETS of whole rows — the k-th
    identical copy survives only when committed holds fewer than k copies.
    Exact (grouped on every column); inputs are the few rows sharing one
    boundary microsecond, so pandas here is cheap."""
    if committed.num_rows == 0 or new.num_rows == 0:
        return new
    cols = list(new.column_names)
    nd = new.to_pandas()
    cd = committed.select(cols).to_pandas()
    occ = nd.groupby(cols, sort=False, dropna=False).cumcount().to_numpy()
    have = (cd.groupby(cols, sort=False, dropna=False).size()
            .reset_index(name="_have"))
    cnt = nd.merge(have, on=cols, how="left")["_have"].fillna(0).to_numpy()
    return new.filter(pa.array(occ >= cnt))


def append_corpus(
    delta_ds: ray.data.Dataset,
    corpus_dir: str,
    order_cols: tuple[str, ...] = ORDER_COLS,
) -> list[str]:
    """Append one arrival wave: per touched bucket, rows newer than the
    bucket's committed watermark become one sorted ``delta-<gen>``
    fragment.  Rows BELOW the watermark are skipped (that is what makes a
    crashed append retry-safe); rows AT the watermark are ambiguous — a
    retry remnant of the committed wave, or a genuinely new row in the same
    microsecond straddling the wave boundary — and are resolved exactly: a
    row-group-pruned read of the committed rows at that timestamp, then a
    whole-row multiset diff, so retries stay idempotent while no new data
    is ever silently lost (the per-bucket meta records the duplicate count
    it skipped as ``boundary_dup_skipped``).  Returns the fragment file
    paths — point the incremental backfill's ``delta_ds`` at them for a
    delta-sized pass 1."""
    meta = corpus_meta(corpus_dir)
    if not meta.get("complete"):
        raise RuntimeError(
            f"corpus store {corpus_dir!r} is partially ingested; finish "
            "ingest_corpus before appending deltas"
        )
    num_buckets = meta["num_buckets"]

    def commit(table: pa.Table) -> pa.Table:
        bucket = int(table["_bucket"][0].as_py())
        table = sort_bucket(table.drop_columns(["_bucket"]), order_cols)
        old = read_bucket_meta(corpus_dir, bucket) or {}
        wm = old.get("ts_watermark_us")
        dup_skipped = 0
        if wm is not None:
            ts = table["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            newer = table.filter(pc.greater(ts, wm))
            boundary = table.filter(pc.equal(ts, wm))
            if boundary.num_rows:
                fresh = _multiset_diff(
                    boundary, _committed_rows_at_ts(corpus_dir, bucket,
                                                    wm, old))
                dup_skipped = boundary.num_rows - fresh.num_rows
                table = (sort_bucket(pa.concat_tables([newer, fresh]),
                                     order_cols)
                         if fresh.num_rows else newer)
            else:
                table = newer
        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "file": pa.array([], pa.string()),
                          "rows": pa.array([], pa.int64())})
        if table.num_rows == 0:
            return empty
        lo, hi = ts_bounds_us(table["ts"])
        lineage = {
            "ts_watermark_us": hi if wm is None else max(wm, hi),
            "resolve": "concat",
            "boundary_dup_skipped":
                int(old.get("boundary_dup_skipped", 0)) + dup_skipped,
        }
        if old.get("ts_min_us") is not None or lo is not None:
            lineage["ts_min_us"] = min(
                x for x in (old.get("ts_min_us"), lo) if x is not None)
        new_meta = commit_delta(corpus_dir, bucket, table, lineage,
                                row_group_size=ROW_GROUP_ROWS,
                                index_col="conv_id")
        return pa.table({
            "bucket": pa.array([new_meta["bucket"]], pa.int64()),
            "file": pa.array([new_meta["fragments"][-1]["file"]
                              if "fragments" in new_meta else "data.parquet"],
                             pa.string()),
            "rows": pa.array([table.num_rows], pa.int64()),
        })

    rows = (
        add_bucket(delta_ds, num_buckets)
        .groupby("_bucket").map_groups(commit, batch_format="pyarrow")
        .to_pandas()
    )
    if len(rows) == 0 or "bucket" not in rows.columns:
        return []  # retry of an already-committed wave: nothing new anywhere
    return [
        os.path.join(bucket_dir(corpus_dir, int(b)), f)
        for b, f in zip(rows["bucket"], rows["file"])
    ]


def compact_corpus(corpus_dir: str, min_fragments: int = 2) -> list[dict]:
    """Rewrite fragmented partitions to one sorted, conv-indexed
    ``data.parquet`` generation (CONCAT resolution — corpus fragments are
    arrival waves of new rows, nothing supersedes).  ``min_fragments`` is
    the size-tiered trigger: only buckets holding at least that many
    fragments rewrite (default 2 = every fragmented bucket).  Calling this
    after each append wave with e.g. ``min_fragments=8`` gives the standard
    LSM amortization — appends stay cheap, read amplification and the
    row-group index stay bounded, and each bucket rewrites only once per
    ~8 waves (compaction MUST run after the wave's returned delta paths
    have been consumed by the incremental backfill: it deletes them).
    Watermarks are preserved, so append idempotency is unaffected.  One Ray
    task per compacted bucket; returns their manifest rows."""
    if min_fragments < 2:
        raise ValueError(f"min_fragments must be >= 2, got {min_fragments}")
    meta = corpus_meta(corpus_dir)
    multi = [m for m in read_manifest(corpus_dir)
             if len(fragment_files(m)) >= min_fragments]
    if not multi:
        return []
    items = [
        {"bucket": m["bucket"],
         "files": ";".join(fragment_files(m)),
         "ts_watermark_us": m.get("ts_watermark_us"),
         "ts_min_us": m.get("ts_min_us"),
         # cumulative idempotency diagnostic survives the rewrite
         "boundary_dup_skipped": int(m.get("boundary_dup_skipped", 0))}
        for m in multi
    ]

    def _compact(t: pa.Table) -> pa.Table:
        out_rows = []
        for i in range(t.num_rows):
            b = int(t["bucket"][i].as_py())
            d = bucket_dir(corpus_dir, b)
            table = pa.concat_tables(
                [pq.read_table(os.path.join(d, f))
                 for f in t["files"][i].as_py().split(";")],
                promote_options="default",
            )
            table = sort_bucket(table, ORDER_COLS)
            new_meta = commit_bucket(
                corpus_dir, b, table,
                lineage={
                    "ts_watermark_us": t["ts_watermark_us"][i].as_py(),
                    "ts_min_us": t["ts_min_us"][i].as_py(),
                    "resolve": "concat",
                    "compacted": True,
                    "boundary_dup_skipped":
                        int(t["boundary_dup_skipped"][i].as_py()),
                },
                row_group_size=ROW_GROUP_ROWS, index_col="conv_id",
            )
            out_rows.append((new_meta["bucket"], new_meta["rows"]))
        return pa.table({
            "bucket": pa.array([r[0] for r in out_rows], pa.int64()),
            "rows": pa.array([r[1] for r in out_rows], pa.int64()),
        })

    rows = (
        ray.data.from_items(items, override_num_blocks=len(items))
        .map_batches(_compact, batch_format="pyarrow")
        .to_pandas()
    )
    write_run_meta(corpus_dir, meta["num_buckets"], complete=True,
                   extra={"kind": "corpus", "resolve": "concat"})
    return rows.to_dict("records")


def corpus_files(corpus_dir: str, buckets=None) -> list[str]:
    """Manifest-listed fragment paths (orphans from crashed commits stay
    invisible), optionally restricted to ``buckets``."""
    sel = None if buckets is None else {int(b) for b in buckets}
    files = []
    for m in read_manifest(corpus_dir):
        if sel is not None and m["bucket"] not in sel:
            continue
        d = bucket_dir(corpus_dir, m["bucket"])
        files += [os.path.join(d, f) for f in fragment_files(m)]
    return files


def _kept_row_groups(path: str, touched_np: np.ndarray) -> list[int]:
    """Row groups that can contain a touched conversation (``touched_np``
    sorted).

    Preferred path — EXACT membership via the ``<path>.idx`` sidecar
    (manifest.write_conv_index: one row per distinct conv_id with its
    [rg_first, rg_last] span; partitions are written sorted by conv_id so
    spans are contiguous).  Exactness matters: a daily delta's touched
    conv_ids scatter uniformly through the key order, so min/max RANGE
    pruning keeps nearly every row group even when zero touched rows are
    actually present (measured kept_fraction 1.0 on the 2M-turn proof);
    the index keeps only row groups holding real matches — in particular
    ZERO base row groups for brand-new conversations.

    Fallback (no sidecar — legacy stores): [min, max] statistics range
    intersection; groups without stats are kept.  The exact ``is_in``
    filter after decode guarantees correctness on every path."""
    idx_path = path + ".idx"
    if os.path.exists(idx_path):
        t = pq.read_table(idx_path)
        vs = pa.array(touched_np, pa.string())
        if t["conv_id"].type != vs.type:
            vs = vs.cast(t["conv_id"].type)
        sel = t.filter(pc.is_in(t["conv_id"], value_set=vs))
        keep: set[int] = set()
        for a, b in zip(sel["rg_first"].to_numpy(),
                        sel["rg_last"].to_numpy()):
            keep.update(range(int(a), int(b) + 1))
        return sorted(keep)
    pf = pq.ParquetFile(path)
    if pf.metadata.num_row_groups == 0:
        return []
    rg0 = pf.metadata.row_group(0)
    ci = next(c for c in range(rg0.num_columns)
              if rg0.column(c).path_in_schema.split(".")[0] == "conv_id")
    keep_l = []
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            keep_l.append(rg)
            continue
        lo, hi = st.min, st.max
        if isinstance(lo, bytes):
            lo, hi = lo.decode(), hi.decode()
        i = int(np.searchsorted(touched_np, lo, side="left"))
        if i < len(touched_np) and touched_np[i] <= hi:
            keep_l.append(rg)
    return keep_l


def read_corpus(
    corpus_dir: str,
    buckets=None,
    columns: tuple[str, ...] | list[str] | None = None,
    conv_filter=None,
) -> ray.data.Dataset:
    """Stream the corpus store (concat resolution).

    Without ``conv_filter``: a plain column-pruned parquet read over the
    selected buckets' manifest-listed files.  With ``conv_filter`` (a
    ``ray.ObjectRef`` to a sorted pa.Array of conv_ids, or the array
    itself): one task per file opens the parquet footer, DECODES ONLY the
    row groups whose conv_id stats range intersects the touched set, and
    applies the exact ``is_in`` filter — the delta-proportional read path
    of the incremental backfill's pass 2."""
    files = corpus_files(corpus_dir, buckets)
    cols = list(columns) if columns is not None else None
    if not files:
        return ray.data.from_items([])
    if conv_filter is None:
        if cols is None:
            # the reader would infer a hive "bucket" column from the dir
            # names; pin the column list to the FILE schema instead (the
            # store's logical schema is exactly what was ingested) — an
            # explicit list keeps this a pure pushed-down projection read,
            # where a post-read strip map_batches would decode every column
            cols = pq.read_schema(files[0]).names
        return ray.data.read_parquet(files, columns=cols)

    ref = conv_filter if isinstance(conv_filter, ray.ObjectRef) \
        else ray.put(conv_filter)

    # the exact filter needs conv_id even when the caller's projection
    # drops it — read it alongside, strip after filtering
    read_cols = cols
    strip_key = False
    if cols is not None and "conv_id" not in cols:
        read_cols = ["conv_id"] + cols
        strip_key = True

    def load(t: pa.Table) -> pa.Table:
        touched = ray.get(ref)  # pa.Array, sorted
        touched_np = np.asarray(
            (touched.combine_chunks() if isinstance(touched, pa.ChunkedArray)
             else touched).to_numpy(zero_copy_only=False), dtype=object)
        out = []
        for p in t["path"]:
            path = p.as_py()
            keep = _kept_row_groups(path, touched_np)
            if not keep:
                continue
            tab = pq.ParquetFile(path).read_row_groups(
                keep, columns=read_cols)
            mask = pc.is_in(tab["conv_id"], value_set=touched)
            tab = tab.filter(mask)
            if strip_key:
                tab = tab.drop_columns(["conv_id"])
            out.append(tab)
        if not out:
            # typed empty table so downstream schemas stay concrete
            schema = pq.read_schema(t["path"][0].as_py())
            if cols is not None:
                schema = pa.schema([schema.field(c) for c in cols])
            return schema.empty_table()
        return pa.concat_tables(out, promote_options="default")

    items = [{"path": f} for f in files]
    # one task can open SEVERAL files (load iterates its batch's paths):
    # bound the task count so a 10^6-file touched set doesn't become 10^6
    # tiny Ray tasks — ~2 tasks per CPU saturates the pool, and each task
    # still decodes only indexed row groups
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    n_tasks = min(len(items), max(32, 2 * ncpu))
    return ray.data.from_items(
        items, override_num_blocks=n_tasks
    ).map_batches(load, batch_format="pyarrow")


def pruned_read_stats(
    corpus_dir: str,
    touched: list | np.ndarray,
    num_buckets: int | None = None,
    columns: tuple[str, ...] | list[str] | None = None,
) -> dict:
    """Replay the pass-2 pruning decision offline and account the bytes: of
    all manifest-listed files, which buckets would be opened and which row
    groups decoded for ``touched``, summing the (projected columns')
    compressed bytes.  Evidence for the delta-proportionality claim."""
    from protein_feature_engineering_ray.core.bucket import bucket_hash

    meta = corpus_meta(corpus_dir)
    nb = num_buckets or meta["num_buckets"]
    touched_np = np.asarray(sorted(touched), dtype=object)
    tb = set(int(b) for b in bucket_hash(touched_np, nb))

    def col_bytes(rgmeta, want):
        tot = 0
        for c in range(rgmeta.num_columns):
            col = rgmeta.column(c)
            name = col.path_in_schema.split(".")[0]
            if want is None or name in want:
                tot += col.total_compressed_size
        return tot

    want = set(columns) if columns is not None else None
    stats = {"bytes_total": 0, "bytes_kept": 0, "bytes_index": 0,
             "row_groups_total": 0, "row_groups_kept": 0,
             "files_total": 0, "files_opened": 0}
    for m in read_manifest(corpus_dir):
        d = bucket_dir(corpus_dir, m["bucket"])
        for f in fragment_files(m):
            path = os.path.join(d, f)
            pf = pq.ParquetFile(path)
            stats["files_total"] += 1
            opened = m["bucket"] in tb
            if opened:
                stats["files_opened"] += 1
                kept = set(_kept_row_groups(path, touched_np))
                if os.path.exists(path + ".idx"):
                    # the sidecar read is part of the pruned path's cost
                    stats["bytes_index"] += os.path.getsize(path + ".idx")
            for rg in range(pf.metadata.num_row_groups):
                b = col_bytes(pf.metadata.row_group(rg), want)
                stats["bytes_total"] += b
                stats["row_groups_total"] += 1
                if opened and rg in kept:
                    stats["bytes_kept"] += b
                    stats["row_groups_kept"] += 1
    stats["kept_fraction"] = (
        stats["bytes_kept"] / stats["bytes_total"]
        if stats["bytes_total"] else 0.0
    )
    return stats
