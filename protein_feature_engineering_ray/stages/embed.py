"""Embedding extraction — the engine's analogue of the reference's ESM
batch-embedding pipeline (ESM2_15B_embed.ipynb cell 2): model loaded ONCE
per worker, sequences packed into token-budget micro-batches
(``toks_per_batch=4096`` with ``get_batch_indices``-style length-sorted
greedy packing and ``truncation_seq_length`` truncation), per-sample
resumable output.

The container has no torch/GPU, so the "model" is a deterministic
hash-projection encoder: token -> hashed vocab bucket -> fixed random
projection row, mean-pooled and L2-normalized (the notebook's
``include='mean'`` pooling).  Everything AROUND the kernel is the real scale
path: an actor pool that builds the projection once in ``__init__``, true
token-budget micro-batching inside each Ray batch (the unit a GPU forward
pass would see), ``FixedSizeList<float32>`` output, and an atomic
manifest-committed partition layout (``state/manifest.py``) so a killed
embedding backfill resumes by skipping finished partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from protein_feature_engineering_ray.core.bucket import add_bucket
from protein_feature_engineering_ray.state.manifest import (
    commit_bucket,
    completed_buckets,
)


class HashProjectionModel:
    """Deterministic embedding 'model': whitespace tokens hashed into a
    ``vocab`` of projection rows; document embedding = L2-normalized mean of
    its (truncated) token rows.  float32 end-to-end."""

    def __init__(self, dim: int = 64, vocab: int = 4096, seed: int = 29,
                 truncation_seq_length: int = 512):
        rng = np.random.default_rng(seed)
        self.table = rng.standard_normal((vocab, dim)).astype(np.float32)
        self.vocab = vocab
        self.dim = dim
        self.truncation = truncation_seq_length

    def token_lengths(self, texts: np.ndarray) -> np.ndarray:
        """Truncated whitespace token counts — one Arrow tokenize + one
        segment count for the batch (equals len(t.split()) per row)."""
        import pyarrow.compute as pc

        arr = pc.split_pattern_regex(
            pc.fill_null(pa.array(texts, pa.string()), ""), r"\s+"
        )
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        tok_len = pc.utf8_length(arr.flatten()).to_numpy(zero_copy_only=False)
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        rid = np.repeat(np.arange(len(texts)), np.diff(offs))
        nw = np.bincount(rid[tok_len > 0], minlength=len(texts))
        return np.minimum(nw, self.truncation).astype(np.int64)

    def encode(self, texts: list[str]) -> np.ndarray:
        """One micro-batch forward pass (the GPU-call analogue)."""
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            toks = (t or "").split()[: self.truncation]
            if not toks:
                continue
            h = pd.util.hash_array(np.asarray(toks, dtype=object)).astype(
                np.uint64
            ) % np.uint64(self.vocab)
            v = self.table[h].mean(axis=0)
            n = float(np.linalg.norm(v))
            out[i] = v / n if n > 0 else v
        return out


class EmbedActor:
    """Actor-pool stage: model built once per actor (``__init__``), each Ray
    batch split into length-sorted token-budget micro-batches
    (``toks_per_batch``, the ESM ``get_batch_indices`` discipline) so a real
    model's forward passes would see near-uniform token counts regardless of
    document length skew.

    PLUG-IN CONTRACT (the drop-in point for a real checkpoint — ESM /
    ProtBERT / T5-style, ESM2_15B_embed.ipynb cell 2): pass
    ``model_factory``, a zero-arg callable run ONCE per actor process
    (load weights, ``.eval()``, move to device, optionally ``.half()`` —
    fp16 halves both load time and activation memory and is the standard
    inference dtype for these encoders).  The returned object must expose:

    - ``dim: int`` — output embedding width (FixedSizeList size).
    - ``truncation: int`` — max tokens per document; ``token_lengths`` must
      clamp to it and ``encode`` must truncate to it, or a long document
      blows the micro-batch budget a GPU forward pass was sized for.
    - ``token_lengths(texts: np.ndarray[object]) -> np.ndarray[int64]`` —
      PRE-truncation-clamped token counts for a whole Ray batch (used only
      for budget packing + the ``n_model_tokens`` column; a fast tokenizer
      pass, not a forward pass).
    - ``encode(texts: list[str]) -> np.ndarray[float32 (n, dim)]`` — ONE
      forward pass over one micro-batch whose total token count is
      <= toks_per_batch (the GPU-call unit; pooling/normalization policy
      lives here).

    The factory must be picklable (module-level function or functools
    .partial — Ray ships it to each actor); the MODEL never crosses the
    wire.  Interface compliance is tested with a fake torch-like shim in
    tests/test_stages.py::test_embed_actor_pluggable_model."""

    def __init__(self, dim: int = 64, seed: int = 29,
                 toks_per_batch: int = 4096,
                 truncation_seq_length: int = 512, text_col: str = "text",
                 model_factory=None):
        if model_factory is not None:
            self.model = model_factory()
        else:
            self.model = HashProjectionModel(
                dim=dim, seed=seed,
                truncation_seq_length=truncation_seq_length,
            )
        self.toks_per_batch = toks_per_batch
        self.text_col = text_col

    def _micro_batches(self, lens: np.ndarray) -> list[np.ndarray]:
        """Length-sorted greedy packing under the token budget (+1 per seq,
        the notebook's ``extra_toks_per_seq=1``)."""
        order = np.argsort(lens, kind="stable")
        batches, cur, cur_toks = [], [], 0
        for i in order:
            t = int(lens[i]) + 1
            if cur and cur_toks + t > self.toks_per_batch:
                batches.append(np.asarray(cur))
                cur, cur_toks = [], 0
            cur.append(i)
            cur_toks += t
        if cur:
            batches.append(np.asarray(cur))
        return batches

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = np.asarray(
            t[self.text_col].to_numpy(zero_copy_only=False), dtype=object
        )
        lens = self.model.token_lengths(texts)
        emb = np.zeros((len(texts), self.model.dim), dtype=np.float32)
        for idx in self._micro_batches(lens):
            emb[idx] = self.model.encode(list(texts[idx]))
        flat = pa.array(emb.reshape(-1), pa.float32())
        out = t.append_column(
            "embedding", pa.FixedSizeListArray.from_arrays(flat, self.model.dim)
        )
        return out.append_column("n_model_tokens", pa.array(lens, pa.int64()))


def embed_docs(
    ds: ray.data.Dataset,
    dim: int = 64,
    seed: int = 29,
    toks_per_batch: int = 4096,
    truncation_seq_length: int = 512,
    text_col: str = "text",
    concurrency: int = 4,
    batch_size: int = 512,
    model_factory=None,
) -> ray.data.Dataset:
    """Streaming embedding stage (no sink): appends ``embedding``
    (FixedSizeList<float32>[dim]) and ``n_model_tokens``.  Pass
    ``model_factory`` to swap the deterministic stand-in for a real
    checkpoint (see the EmbedActor plug-in contract)."""
    return ds.map_batches(
        EmbedActor,
        fn_constructor_kwargs=dict(
            dim=dim, seed=seed, toks_per_batch=toks_per_batch,
            truncation_seq_length=truncation_seq_length, text_col=text_col,
            model_factory=model_factory,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def embed_docs_to_dir(
    ds: ray.data.Dataset,
    out_dir: str,
    id_col: str = "doc_id",
    num_buckets: int = 16,
    dim: int = 64,
    seed: int = 29,
    toks_per_batch: int = 4096,
    truncation_seq_length: int = 512,
    text_col: str = "text",
) -> list[dict]:
    """Resumable partitioned embedding backfill: hash(id) partitions, each
    embedded by an actor-held model and committed atomically
    (temp-then-rename + ``_SUCCESS.json``); a killed run resumes by skipping
    committed partitions — the notebook's accidental per-``.pt``-file resume
    made explicit.  Returns this run's manifest rows."""
    done = completed_buckets(out_dir)
    withb = add_bucket(ds, num_buckets, key=id_col)
    if done:
        done_arr = np.array(sorted(done), dtype=np.uint32)

        def skip(t: pa.Table) -> pa.Table:
            b = t["_bucket"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(b, done_arr)))

        withb = withb.map_batches(skip, batch_format="pyarrow")

    actor = EmbedActor(
        dim=dim, seed=seed, toks_per_batch=toks_per_batch,
        truncation_seq_length=truncation_seq_length, text_col=text_col,
    )

    def bucket_fn(t: pa.Table) -> pa.Table:
        bucket = int(t["_bucket"][0].as_py())
        body = t.drop_columns(["_bucket"])
        out = actor(body)
        meta = commit_bucket(
            out_dir, bucket, out,
            lineage={"docs": out.num_rows,
                     "model_tokens": int(
                         pa.compute.sum(out["n_model_tokens"]).as_py() or 0)},
        )
        return pa.table(
            {
                "bucket": pa.array([meta["bucket"]], pa.int64()),
                "rows": pa.array([meta["rows"]], pa.int64()),
            }
        )

    manifest = (
        withb.groupby("_bucket")
        .map_groups(bucket_fn, batch_format="pyarrow")
        .to_pandas()
    )
    return manifest.to_dict("records")
