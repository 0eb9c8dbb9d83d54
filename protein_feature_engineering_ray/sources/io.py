"""Sources & sinks beyond Parquet (SURVEY.md §2.1).

- ``save_features``: multi-format sink dispatch — the ``save_descriptor``
  analogue (feature.py:4624-4660): parquet (engine-native), csv/tsv
  (feature.py:3867-3882), svm (libsvm ``label idx:val``, feature.py:3883-3895),
  arff (Weka preamble, feature.py:3896-3908).  svm/arff stream through
  ``map_batches`` formatting into text files per block.
- ``read_rawlog``: the ``read_fasta`` analogue (feature.py:91-113) for raw
  transcript logs: tab-separated lines -> canonical schema, with alphabet
  sanitization (unknown roles kept as-is; they encode to -1 downstream, the
  reference's ``-`` pad, feature.py:107).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


_READ_TARGET_BYTES = 32 << 20  # compressed file bytes per read block


def sized_read_parquet(
    path: str, columns: list[str] | None = None, min_blocks: int = 4, **kw
) -> ray.data.Dataset:
    """``read_parquet`` with a SIZE-derived block count.

    Ray's reader picks its parallelism from the cpu count alone (~2× cpus),
    so a 2 MB table explodes into 64 ~80 KB blocks whose fixed per-block
    coordination cost then dominates every downstream sort/groupby exchange
    (measured 3–6× wall-time on the bench exchange lines at sf0.1).
    Deriving the count from file bytes (~32 MB of compressed parquet per
    block ≈ Ray's 128 MB in-memory block target) is a no-op at scale — a
    100 TB input still gets its natural many-thousand-block parallelism —
    while toy inputs collapse to a handful of blocks; parallelism after the
    exchange comes from the bucket groups, not from the read.
    """
    import os

    try:
        # single FILE only: getsize on a directory returns the dirent size
        # (~4 KB), which would clamp a partitioned multi-GB dataset to
        # min_blocks — directories/lists keep Ray's default heuristic
        if os.path.isfile(path):
            sz = os.path.getsize(path)
            blocks = max(min_blocks, -(-sz // _READ_TARGET_BYTES))
            kw.setdefault("override_num_blocks", int(blocks))
    except (OSError, TypeError):
        pass  # list-of-paths / remote path: keep Ray's default heuristic
    return ray.data.read_parquet(path, columns=columns, **kw)


def save_features(
    ds: ray.data.Dataset,
    path: str,
    fmt: str = "parquet",
    label_col: str | None = None,
) -> None:
    if fmt == "parquet":
        ds.write_parquet(path)
        return
    if fmt in ("csv", "tsv"):
        if fmt == "tsv":
            import csv as _csv

            ds.write_csv(path, arrow_csv_args_fn=lambda: {
                "write_options": __import__("pyarrow.csv", fromlist=["WriteOptions"])
                .WriteOptions(delimiter="\t")
            })
        else:
            ds.write_csv(path)
        return
    if fmt == "svm":
        def to_svm(t: pa.Table) -> list[str]:
            # columnwise string build (label + " idx:value" per feature
            # column, pandas str concat): O(K) vectorized ops per block, no
            # per-row Python f-string loop in the sink
            df = t.to_pandas()
            feat_cols = [c for c in df.columns if c != label_col
                         and df[c].dtype.kind in "fiu"]
            if label_col:
                lines = df[label_col].astype(str)
            else:
                lines = pd.Series(["0"] * len(df), index=df.index)
            for j, c in enumerate(feat_cols):
                lines = lines + f" {j + 1}:" + df[c].astype(str)
            return lines.tolist()

        _write_text_blocks(ds, path, to_svm, "svm")
        return
    if fmt == "arff":
        schema = ds.schema()
        attrs = "\n".join(
            f"@attribute {n} "
            + ("numeric" if "int" in str(t) or "double" in str(t) or "float" in str(t)
               else "string")
            for n, t in zip(schema.names, schema.types)
        )
        header = f"@relation features\n{attrs}\n@data"
        import os

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "header.arff"), "w") as f:
            f.write(header + "\n")

        def to_arff(t: pa.Table) -> list[str]:
            df = t.to_pandas()
            return df.astype(str).agg(",".join, axis=1).tolist()

        _write_text_blocks(ds, path, to_arff, "arff")
        return
    raise ValueError(f"unknown format {fmt!r}")


def _write_text_blocks(ds: ray.data.Dataset, path: str, fmt_fn, ext: str) -> None:
    """Per-block text sink: each block's lines land in one file, written by
    the task itself (Ray has no raw-text sink; write_csv would quote)."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        lines = fmt_fn(t)
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.{ext}")
        tmp = name + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(tmp, name)
        return pa.table({"rows": pa.array([len(lines)], pa.int64())})

    ds.map_batches(write_block, batch_format="pyarrow").count()


def read_rawlog(paths: str | list[str]) -> ray.data.Dataset:
    """Tab-separated raw transcript log -> canonical transcript Dataset.

    Line format: ``conv_id<TAB>turn_idx<TAB>role<TAB>tool<TAB>ts_us<TAB>text``.
    Malformed lines are dropped (counted per block into Ray logs), mirroring
    the reference's regex sanitization on read (feature.py:107, 153).
    """
    lines = ray.data.read_text(paths)

    def parse(t: pa.Table) -> pa.Table:
        rows = t["text"].to_numpy(zero_copy_only=False)
        cols: dict[str, list] = {c: [] for c in
                                 ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
        for line in rows:
            parts = line.split("\t", 5)
            if len(parts) != 6:
                continue
            cid, ti, role, tool, ts_us, text = parts
            try:
                ti_i = int(ti)
                ts_i = int(ts_us)
            except ValueError:
                continue
            cols["conv_id"].append(cid)
            cols["turn_idx"].append(ti_i)
            cols["role"].append(role)
            cols["text"].append(text)
            cols["tool"].append(tool)
            cols["ts"].append(ts_i)
        return pa.table(
            {
                "conv_id": pa.array(cols["conv_id"], pa.string()),
                "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
                "role": pa.array(cols["role"], pa.string()),
                "text": pa.array(cols["text"], pa.string()),
                "tool": pa.array(cols["tool"], pa.string()),
                "ts": pa.array(cols["ts"], pa.timestamp("us")),
            }
        )

    return lines.map_batches(parse, batch_format="pyarrow")


def join_labels(
    ds: ray.data.Dataset,
    labels: pd.DataFrame,
    on: str = "conv_id",
    cols: tuple[str, ...] = ("label", "split"),
) -> ray.data.Dataset:
    """Broadcast small-side label join — the keyed replacement for the
    reference's positional ``add_samples_label`` zip (feature.py:426-431).
    The label table is ``ray.put`` once and read per task; no shuffle."""
    import ray as _ray

    ref = _ray.put(labels.set_index(on)[list(cols)])

    def fn(t: pa.Table) -> pa.Table:
        lut = _ray.get(ref)
        keys = t[on].to_numpy(zero_copy_only=False)
        sub = lut.reindex(keys)
        for c in cols:
            t = t.append_column(c, pa.array(sub[c].to_numpy()))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")
