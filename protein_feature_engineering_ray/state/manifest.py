"""Per-partition watermark / lineage manifest (north-rule resumability).

Layout: ``out_dir/bucket=<k>/data.parquet`` + ``bucket=<k>/_SUCCESS.json``.
Both are written temp-then-rename, so a mid-backfill kill can never leave a
partition that looks complete; resume = skip buckets whose ``_SUCCESS.json``
exists (the reference's accidental per-sample ``.pt`` resume granularity,
ESM_embed.ipynb cell 2, made explicit and atomic — SURVEY.md §4).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def bucket_dir(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"bucket={bucket:05d}")


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


def commit_bucket(
    out_dir: str, bucket: int, table: pa.Table, lineage: dict | None = None
) -> dict:
    """Atomically write one bucket partition + its watermark manifest."""
    d = bucket_dir(out_dir, bucket)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, ".tmp-data.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(d, "data.parquet"))
    meta = {
        "bucket": bucket,
        "rows": table.num_rows,
        "committed_at": time.time(),
        **(lineage or {}),
    }
    tmp_m = os.path.join(d, ".tmp-success.json")
    with open(tmp_m, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_m, os.path.join(d, "_SUCCESS.json"))
    return meta


def read_manifest(out_dir: str) -> list[dict]:
    out = []
    for b in sorted(completed_buckets(out_dir)):
        with open(os.path.join(bucket_dir(out_dir, b), "_SUCCESS.json")) as f:
            out.append(json.load(f))
    return out
