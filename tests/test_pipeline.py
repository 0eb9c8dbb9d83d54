"""Backfill resume (kill/restart equivalence), dedup, similarity, media
plumbing, property tests (order/partition invariance)."""

import os
import time

import numpy as np
import pandas as pd
import pytest
import ray.data

from protein_feature_engineering_ray.pipelines.backfill import (
    backfill_to_dir,
    incremental_backfill_to_dir,
    read_backfill,
)
from protein_feature_engineering_ray.core.bucket import bucket_hash
from protein_feature_engineering_ray.schema import Alphabet
from protein_feature_engineering_ray.sources import synth_transcripts
from protein_feature_engineering_ray.state.manifest import (
    bucket_dir,
    completed_buckets,
    read_manifest,
)

ALPHA = Alphabet(
    letters=("assistant", "system", "tool", "user"),
    groups={"bot": ("assistant", "system", "tool"), "hum": ("user",)},
)
ORDER = ("conv_id", "turn_idx")


def _run(out_dir, n_buckets=8):
    ds = synth_transcripts(n_convs=24, duplicates=False)
    return backfill_to_dir(
        ds, out_dir, num_buckets=n_buckets, alphabet=ALPHA,
        order_cols=ORDER, assign_turn_idx=False,
    )


def _read_sorted(out_dir):
    return (
        read_backfill(out_dir)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_backfill_and_resume(tmp_path):
    full = str(tmp_path / "full")
    manifest = _run(full)
    assert sum(m["rows"] for m in manifest) == synth_transcripts(
        n_convs=24, duplicates=False, as_pandas=True
    ).shape[0]
    want = _read_sorted(full)
    assert {"session_idx", "latency_sec", "eaac5_user"} <= set(want.columns)

    # simulate a crash: a second run dir where some buckets never committed
    # (one of them mid-write: stale tmp file, no _SUCCESS)
    part = str(tmp_path / "part")
    _run(part)
    done = sorted(completed_buckets(part))
    assert len(done) >= 3
    killed = done[:2]
    for b in killed:
        d = bucket_dir(part, b)
        os.remove(os.path.join(d, "_SUCCESS.json"))
    with open(os.path.join(bucket_dir(part, killed[0]), ".tmp-data.parquet"), "wb") as f:
        f.write(b"garbage-partial-write")

    surviving = {
        b: os.path.getmtime(os.path.join(bucket_dir(part, b), "data.parquet"))
        for b in done[2:]
    }
    time.sleep(0.05)
    manifest2 = _run(part)
    # only the killed buckets were recomputed
    assert sorted(m["bucket"] for m in manifest2) == killed
    for b, mtime in surviving.items():
        assert os.path.getmtime(
            os.path.join(bucket_dir(part, b), "data.parquet")
        ) == mtime, "resume rewrote a committed partition"
    got = _read_sorted(part)
    pd.testing.assert_frame_equal(got, want)
    assert len(read_manifest(part)) == len(completed_buckets(part))

    # lineage/metrics: every committed partition carries a ts WATERMARK
    # equal to the true max input ts it covers, plus convs/turns/compute_sec
    src = synth_transcripts(n_convs=24, duplicates=False, as_pandas=True)
    src_b = bucket_hash(src["conv_id"].to_numpy(), 8)
    ts_us = src["ts"].astype("datetime64[us]").astype("int64")
    for m in read_manifest(part):
        sel = src_b == m["bucket"]
        assert m["turns"] == int(sel.sum())
        assert m["convs"] == src.loc[sel, "conv_id"].nunique()
        assert m["ts_watermark_us"] == int(ts_us[sel].max())
        assert m["ts_min_us"] == int(ts_us[sel].min())
        assert m["compute_sec"] >= 0


def test_incremental_backfill(tmp_path):
    """Append-only incremental ingest: backfill an early snapshot, then
    incrementally ingest the full corpus — output must equal a cold full
    backfill; untouched partitions must not be rewritten; a second no-new-
    data run must recompute nothing."""
    full_df = synth_transcripts(n_convs=24, duplicates=False, as_pandas=True)
    # cutoff = 6th-latest conversation end: 5 touched conversations, and the
    # split exercises all three cases — truncated convs, convs fully in the
    # early snapshot, and convs that are entirely new
    g = full_df.groupby("conv_id")["ts"].agg(["min", "max"])
    cutoff = g["max"].sort_values().iloc[-6]
    early_df = full_df[full_df["ts"] <= cutoff].reset_index(drop=True)
    touched_c = g[g["max"] > cutoff]
    assert (touched_c["min"] > cutoff).any(), "need a fully-new conv"
    assert (touched_c["min"] <= cutoff).any(), "need a truncated conv"

    kw = dict(num_buckets=8, alphabet=ALPHA, order_cols=ORDER,
              assign_turn_idx=False)
    cold = str(tmp_path / "cold")
    backfill_to_dir(ray.data.from_pandas(full_df), cold, **kw)
    want = _read_sorted(cold)

    inc = str(tmp_path / "inc")
    backfill_to_dir(ray.data.from_pandas(early_df), inc, **kw)
    early_b = set(bucket_hash(early_df["conv_id"].to_numpy(), 8))
    touched_b = set(
        bucket_hash(
            full_df.loc[full_df["ts"] > cutoff, "conv_id"].unique(), 8)
    )
    untouched = early_b - touched_b
    assert untouched, "fixture must leave at least one bucket untouched"
    mtimes = {
        b: os.path.getmtime(os.path.join(bucket_dir(inc, b), "data.parquet"))
        for b in untouched
    }
    time.sleep(0.05)

    # loud cap fires BEFORE any commit when the touched set is too large
    with pytest.raises(RuntimeError, match="max_touched_convs"):
        incremental_backfill_to_dir(
            ray.data.from_pandas(full_df), inc, max_touched_convs=1, **kw)

    manifest = incremental_backfill_to_dir(
        ray.data.from_pandas(full_df), inc, **kw)
    assert sorted(m["bucket"] for m in manifest) == sorted(touched_b)
    pd.testing.assert_frame_equal(_read_sorted(inc), want)
    for b, mt in mtimes.items():
        assert os.path.getmtime(
            os.path.join(bucket_dir(inc, b), "data.parquet")
        ) == mt, "incremental run rewrote a bucket with no new data"
    # watermarks advanced to the full corpus's per-bucket max ts
    full_b = bucket_hash(full_df["conv_id"].to_numpy(), 8)
    ts_us = full_df["ts"].astype("datetime64[us]").astype("int64")
    for m in read_manifest(inc):
        assert m["ts_watermark_us"] == int(ts_us[full_b == m["bucket"]].max())

    # no-op rerun: nothing new -> no bucket recomputed
    assert incremental_backfill_to_dir(
        ray.data.from_pandas(full_df), inc, **kw) == []


def test_incremental_delta_fragments(tmp_path):
    """LSM-style delta ingest: each incremental run appends ONE fragment per
    touched bucket (data.parquet bytes untouched), a conversation refreshed
    twice resolves to its latest generation, rewrite mode is fragment-aware,
    and compaction collapses back to one value-identical generation."""
    from protein_feature_engineering_ray.pipelines.backfill import (
        compact_backfill,
    )
    from protein_feature_engineering_ray.state.manifest import (
        fragment_files,
        read_bucket_meta,
    )

    full_df = synth_transcripts(n_convs=24, duplicates=False, as_pandas=True)
    g = full_df.groupby("conv_id")["ts"].agg(["min", "max"])
    cuts = g["max"].sort_values()
    cut1, cut2 = cuts.iloc[-10], cuts.iloc[-4]  # two append waves
    df1 = full_df[full_df["ts"] <= cut1].reset_index(drop=True)
    df2 = full_df[full_df["ts"] <= cut2].reset_index(drop=True)
    # a conversation with rows in BOTH waves is refreshed twice
    twice = g[(g["max"] > cut1) & (g["min"] <= cut2)]
    assert (g.loc[twice.index, "max"] > cut2).any()

    kw = dict(num_buckets=8, alphabet=ALPHA, order_cols=ORDER,
              assign_turn_idx=False)
    cold = str(tmp_path / "cold")
    backfill_to_dir(ray.data.from_pandas(full_df), cold, **kw)
    want = _read_sorted(cold)

    inc = str(tmp_path / "inc")
    backfill_to_dir(ray.data.from_pandas(df1), inc, **kw)
    data_mtimes = {
        b: os.path.getmtime(os.path.join(bucket_dir(inc, b), "data.parquet"))
        for b in completed_buckets(inc)
    }
    time.sleep(0.05)

    m1 = incremental_backfill_to_dir(ray.data.from_pandas(df2), inc, **kw)
    m2 = incremental_backfill_to_dir(ray.data.from_pandas(full_df), inc, **kw)
    assert m1 and m2
    # delta mode never rewrote a committed generation
    for b, mt in data_mtimes.items():
        assert os.path.getmtime(
            os.path.join(bucket_dir(inc, b), "data.parquet")) == mt
    # fragment accounting: one delta per touched run, physical rows = sum
    twice_touched = False
    for b in completed_buckets(inc):
        meta = read_bucket_meta(inc, b)
        frags = fragment_files(meta)
        assert 1 <= len(frags) <= 3 and frags[0] == "data.parquet"
        assert meta["rows"] == sum(
            f["rows"] for f in meta.get(
                "fragments", [{"rows": meta["rows"]}]))
        twice_touched |= len(frags) == 3
    assert twice_touched, "fixture must refresh some bucket in both waves"
    # resolved read equals the cold full backfill (last generation wins)
    pd.testing.assert_frame_equal(_read_sorted(inc), want)

    # compaction: back to single-generation partitions, value-identical
    compacted = compact_backfill(inc)
    assert compacted and compact_backfill(inc) == []
    for b in completed_buckets(inc):
        meta = read_bucket_meta(inc, b)
        assert fragment_files(meta) == ["data.parquet"]
        d = bucket_dir(inc, b)
        assert not [n for n in os.listdir(d) if n.startswith("delta-")]
    pd.testing.assert_frame_equal(_read_sorted(inc), want)

    # rewrite mode resolves fragments before splicing (no delta rows lost)
    rw = str(tmp_path / "rw")
    backfill_to_dir(ray.data.from_pandas(df1), rw, **kw)
    incremental_backfill_to_dir(ray.data.from_pandas(df2), rw, **kw)
    m_rw = incremental_backfill_to_dir(
        ray.data.from_pandas(full_df), rw, mode="rewrite", **kw)
    for m in m_rw:  # every bucket THIS run touched is single-generation again
        assert fragment_files(
            read_bucket_meta(rw, m["bucket"])) == ["data.parquet"]
    pd.testing.assert_frame_equal(_read_sorted(rw), want)

    # fragment cap: max_fragments=1 forces in-splice compaction
    capped = str(tmp_path / "capped")
    backfill_to_dir(ray.data.from_pandas(df1), capped, **kw)
    incremental_backfill_to_dir(
        ray.data.from_pandas(full_df), capped, max_fragments=1, **kw)
    for b in completed_buckets(capped):
        assert fragment_files(read_bucket_meta(capped, b)) == ["data.parquet"]
    pd.testing.assert_frame_equal(_read_sorted(capped), want)


def test_incremental_delta_ds_pass1(tmp_path):
    """Arrival-partitioned ingest: pass 1 over ``delta_ds`` (just the new
    rows) finds the same touched set as scanning the whole mixed corpus,
    and the spliced result equals a cold full backfill."""
    full_df = synth_transcripts(n_convs=24, duplicates=False, as_pandas=True)
    g = full_df.groupby("conv_id")["ts"].agg(["min", "max"])
    cutoff = g["max"].sort_values().iloc[-6]
    base_df = full_df[full_df["ts"] <= cutoff].reset_index(drop=True)
    new_df = full_df[full_df["ts"] > cutoff].reset_index(drop=True)
    assert len(new_df)

    kw = dict(num_buckets=8, alphabet=ALPHA, order_cols=ORDER,
              assign_turn_idx=False)
    cold = str(tmp_path / "cold")
    backfill_to_dir(ray.data.from_pandas(full_df), cold, **kw)
    want = _read_sorted(cold)

    inc = str(tmp_path / "inc")
    backfill_to_dir(ray.data.from_pandas(base_df), inc, **kw)
    manifest = incremental_backfill_to_dir(
        ray.data.from_pandas(full_df), inc,
        delta_ds=ray.data.from_pandas(new_df), **kw)
    touched_b = set(bucket_hash(new_df["conv_id"].unique(), 8))
    assert sorted(m["bucket"] for m in manifest) == sorted(touched_b)
    pd.testing.assert_frame_equal(_read_sorted(inc), want)

    # empty delta -> no-op without scanning the corpus's touched set
    assert incremental_backfill_to_dir(
        ray.data.from_pandas(full_df), inc,
        delta_ds=ray.data.from_pandas(new_df.iloc[:0]), **kw) == []


def test_backfill_dedup_on_ingest(tmp_path):
    """Duplicated (conv_id, turn_idx) rows are dropped inside the bucket
    pass (idempotent re-ingest) — output equals the clean corpus's."""
    clean = str(tmp_path / "clean")
    dup = str(tmp_path / "dup")
    backfill_to_dir(
        synth_transcripts(n_convs=12, duplicates=False), clean,
        num_buckets=5, alphabet=ALPHA, order_cols=ORDER, assign_turn_idx=False,
    )
    dup_ds = synth_transcripts(n_convs=12, duplicates=True)
    assert dup_ds.count() > synth_transcripts(
        n_convs=12, duplicates=False
    ).count()
    backfill_to_dir(
        dup_ds, dup, num_buckets=5, alphabet=ALPHA, order_cols=ORDER,
        assign_turn_idx=False, dedup=True,
    )
    a = _read_sorted(clean)
    b = _read_sorted(dup)
    pd.testing.assert_frame_equal(a, b)


def test_add_bucket_string_encode_parity():
    """add_bucket's plain-string fast path (dictionary_encode + hash the
    dictionary) assigns the SAME buckets as hashing the decoded strings —
    for plain, pre-dictionary-encoded, chunked, and null-containing keys
    (nulls fall back to the direct object hash)."""
    import pyarrow as pa

    from protein_feature_engineering_ray.core.bucket import (
        add_bucket,
        bucket_hash,
    )

    rng = np.random.default_rng(11)
    keys = np.array([f"conv-{i}" for i in rng.integers(0, 40, 300)],
                    dtype=object)
    expect = bucket_hash(keys, 8)

    def got(tbl):
        out = add_bucket(ray.data.from_arrow(tbl), 8).to_pandas()
        out = out.sort_values("row").reset_index(drop=True)
        return out["_bucket"].to_numpy()

    base = pa.table({"conv_id": pa.array(keys, pa.string()),
                     "row": np.arange(len(keys))})
    np.testing.assert_array_equal(got(base), expect)

    dicted = base.set_column(
        0, "conv_id", base["conv_id"].combine_chunks().dictionary_encode()
    )
    np.testing.assert_array_equal(got(dicted), expect)

    chunked = pa.table({
        "conv_id": pa.chunked_array([keys[:100], keys[100:]]),
        "row": np.arange(len(keys)),
    })
    np.testing.assert_array_equal(got(chunked), expect)

    with_null = keys.copy().astype(object)
    with_null[7] = None
    tbl_null = pa.table({"conv_id": pa.array(with_null, pa.string()),
                         "row": np.arange(len(keys))})
    np.testing.assert_array_equal(got(tbl_null), bucket_hash(with_null, 8))


def test_order_invariance():
    """Shuffled input blocks -> identical output (SURVEY §5.3)."""
    from protein_feature_engineering_ray.core.executor import conv_features
    from protein_feature_engineering_ray.functions.registry import make_kernel

    pdf = synth_transcripts(n_convs=16, duplicates=False, as_pandas=True)
    shuffled = pdf.sample(frac=1.0, random_state=99).reset_index(drop=True)
    outs = []
    for frame, nb in ((pdf, 4), (shuffled, 9)):
        ds = ray.data.from_pandas(frame).repartition(5)
        out = conv_features(
            ds, [make_kernel("CKSAAP", ALPHA, {"kspace": 2})[1]],
            alphabet=ALPHA, num_buckets=nb,
        ).to_pandas().sort_values("conv_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_dedup_exact():
    from protein_feature_engineering_ray.stages.dedup import exact_dedup

    pdf = synth_transcripts(n_convs=16, duplicates=True, as_pandas=True)
    assert pdf.duplicated(["conv_id", "turn_idx"]).any()
    ds = ray.data.from_pandas(pdf)
    out = exact_dedup(ds, ["conv_id", "turn_idx"], num_buckets=6).to_pandas()
    assert not out.duplicated(["conv_id", "turn_idx"]).any()
    assert len(out) == len(pdf.drop_duplicates(["conv_id", "turn_idx"]))


def test_minhash_dedup_finds_planted_neardups():
    from protein_feature_engineering_ray.stages.dedup import minhash_dedup, ngram_jaccard

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(200)]
    texts = [
        " ".join(rng.choice(words, size=60)) for _ in range(40)
    ]
    # plant near-dups: copy with one word changed
    dup_of = {}
    for i in range(5):
        src = texts[i].split()
        src[10] = "CHANGED"
        texts.append(" ".join(src))
        dup_of[40 + i] = i
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = minhash_dedup(
        ray.data.from_pandas(df), threshold=0.5
    ).to_pandas()
    kept = set(out["doc_id"])
    for dup, src in dup_of.items():
        assert ngram_jaccard(texts[dup], texts[src]) > 0.5
        assert dup not in kept, "planted near-dup survived"
        assert src in kept
    assert 39 in kept  # unrelated docs survive


def test_simhash_close_for_neardups():
    from protein_feature_engineering_ray.stages.dedup import simhash64

    rng = np.random.default_rng(6)
    words = [f"w{i}" for i in range(100)]
    base = " ".join(rng.choice(words, size=80))
    variant = base.replace("w1 ", "w999 ")
    other = " ".join(rng.choice(words, size=80))
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": [base, variant, other]})
    out = simhash64(ray.data.from_pandas(df)).to_pandas().set_index("doc_id")

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    h = out["simhash"]
    assert ham(h[0], h[1]) < ham(h[0], h[2])
    assert ham(h[0], h[1]) <= 12


def test_knn_brute_matches_numpy():
    from protein_feature_engineering_ray.stages.similarity import knn_brute

    rng = np.random.default_rng(7)
    V = rng.normal(size=(200, 16))
    df = pd.DataFrame({"vec_id": np.arange(200), "embedding": list(V)})
    ds = ray.data.from_pandas(df).repartition(4)
    Q = V[:3]
    got = knn_brute(ds, Q, np.array([0, 1, 2]), k=5)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = (Q / np.linalg.norm(Q, axis=1, keepdims=True)) @ Vn.T
    for qi in range(3):
        want = set(np.argsort(-sims[qi])[:5])
        have = set(got[got["query_id"] == qi]["nbr_id"])
        assert have == want


def test_knn_brute_tie_break_deterministic():
    """Exact-duplicate corpus vectors tie at sim=1.0 across and within
    blocks; the (sim desc, id asc) total order must pick the k smallest
    ids regardless of block arrival or argpartition order."""
    from protein_feature_engineering_ray.stages.similarity import knn_brute

    rng = np.random.default_rng(21)
    v = rng.normal(size=16)
    dup_ids = np.arange(1000, 1040)  # 40 exact copies of the query vector
    rnd = rng.normal(size=(160, 16)) * 0.1  # low-sim fillers
    ids = np.concatenate([dup_ids, np.arange(160)])
    V = np.concatenate([np.tile(v, (40, 1)), rnd])
    perm = rng.permutation(len(ids))  # scatter the tied ids over blocks
    df = pd.DataFrame({"vec_id": ids[perm], "embedding": list(V[perm])})
    ds = ray.data.from_pandas(df).repartition(6)
    got = knn_brute(ds, v[None, :], np.array([0]), k=10)
    assert list(got["nbr_id"]) == list(dup_ids[:10])
    assert np.allclose(got["cosine"], 1.0)


def test_ivf_knn_recall():
    from protein_feature_engineering_ray.stages.similarity import ivf_knn, knn_brute

    rng = np.random.default_rng(8)
    # clustered data so IVF cells are meaningful
    centers = rng.normal(size=(8, 16)) * 3
    V = np.concatenate([c + rng.normal(size=(50, 16)) * 0.3 for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(len(V)), "embedding": list(V)})
    ds = ray.data.from_pandas(df).repartition(4)
    Q = V[:4]
    qids = np.array([0, 1, 2, 3])
    exact = knn_brute(ds, Q, qids, k=10)
    approx = ivf_knn(ds, Q, qids, k=10, n_centroids=8, n_probe=3)
    recalls = []
    for qi in qids:
        e = set(exact[exact["query_id"] == qi]["nbr_id"])
        a = set(approx[approx["query_id"] == qi]["nbr_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


def test_ivf_knn_tie_break_deterministic():
    """Same duplicate-vector discipline as knn_brute: with full-probe IVF
    (structurally exact) and 40 exact copies tying at sim=1.0, the per-cell
    argpartition prune must not drop a lower-id tied neighbor."""
    from protein_feature_engineering_ray.stages.similarity import ivf_knn

    rng = np.random.default_rng(22)
    v = rng.normal(size=16)
    dup_ids = np.arange(1000, 1040)
    rnd = rng.normal(size=(160, 16)) * 0.1
    ids = np.concatenate([dup_ids, np.arange(160)])
    V = np.concatenate([np.tile(v, (40, 1)), rnd])
    perm = rng.permutation(len(ids))
    df = pd.DataFrame({"vec_id": ids[perm], "embedding": list(V[perm])})
    ds = ray.data.from_pandas(df).repartition(6)
    got = ivf_knn(ds, v[None, :], np.array([0]), k=10, n_centroids=4,
                  n_probe=4)  # n_probe == n_centroids: exact search
    assert list(got["nbr_id"]) == list(dup_ids[:10])
    assert np.allclose(got["cosine"], 1.0)


def test_media_plumbing():
    from protein_feature_engineering_ray.stages.multimodal import (
        MediaFeatureActor,
        media_features,
        synth_media,
    )

    out = media_features(synth_media(n=32), concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 32
    assert len(out["media_vec"].iloc[0]) == MediaFeatureActor.DIM
    # deterministic across runs
    out2 = media_features(synth_media(n=32), concurrency=2, batch_size=8).to_pandas()
    a = np.stack(out.sort_values("media_id")["media_vec"].to_numpy())
    b = np.stack(out2.sort_values("media_id")["media_vec"].to_numpy())
    np.testing.assert_array_equal(a, b)
    with pytest.raises(NotImplementedError):
        MediaFeatureActor(fake=False)({})


def test_chunked_turn_features_equivalence():
    """Salted chunked processing == whole-conversation processing for every
    bounded-lookback kernel, including across chunk boundaries of the mega
    conversation (chunk_size far below its 400 turns)."""
    from protein_feature_engineering_ray.core.executor import (
        turn_features,
        turn_features_chunked,
    )
    from protein_feature_engineering_ray.functions.registry import make_kernel

    specs = [
        ("Latency", {}),
        ("RollingComposition", {"w": 5}),
        ("RollingStats", {"col": "latency2", "w": 4}),
        ("LagLead", {"col": "latency2", "offsets": (1, 3)}),
        ("LagLead", {"col": "latency2", "offsets": (1, 2), "lead": True}),
        ("OneHot", {}),
        ("TextLen", {}),
        # bidirectional-context kernel: shells need BOTH the lookback prefix
        # and the lookahead suffix (radius 5 < chunk_size 7, so shells cross
        # chunk boundaries in both directions)
        ("ShellComposition", {"shells": ((1, 2), (3, 5))}),
    ]
    pdf = synth_transcripts(n_convs=16, duplicates=False, as_pandas=True)
    # add a numeric col for the value-kernels
    pdf["latency2"] = np.arange(len(pdf), dtype=float)
    ds = ray.data.from_pandas(pdf).repartition(4)
    ks = lambda: [make_kernel(n, ALPHA, p)[1] for n, p in specs]  # noqa: E731
    whole = (
        turn_features(ds, ks(), alphabet=ALPHA, num_buckets=5)
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    chunked = (
        turn_features_chunked(ds, ks(), alphabet=ALPHA, chunk_size=7,
                              num_buckets=9)
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert len(whole) == len(chunked) == len(pdf)
    pd.testing.assert_frame_equal(whole, chunked)

    # unbounded-lookback kernels are rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unbounded lookback"):
        turn_features_chunked(
            ds, [make_kernel("ExpandingComposition", ALPHA)[1]],
            alphabet=ALPHA, chunk_size=7,
        )
    with _pytest.raises(ValueError, match="lookback"):
        turn_features_chunked(
            ds, [make_kernel("RollingStats", ALPHA, {"col": "latency2", "w": 9})[1]],
            alphabet=ALPHA, chunk_size=8,
        )


def test_chunked_conv_features_equivalence():
    """Salted partial-count aggregation == whole-conversation descriptors for
    the decomposable composition kernels, across chunk boundaries."""
    from protein_feature_engineering_ray.core.executor import (
        conv_features,
        conv_features_chunked,
    )
    from protein_feature_engineering_ray.functions.registry import make_kernel

    specs = [
        ("AAC", {}),
        ("GAAC", {}),
        ("DPC", {}),
        ("TPC", {"normalize": False}),
        ("CKSAAP", {"kspace": 2}),
        ("CTDT", {}),
        # absolute-position-grid PseKRAAC kernels: chunk-computable since
        # round 3 (grid membership from global turn_idx; λ-tuples via the
        # span-sized context prefix) — chunk_size=7 is NOT a multiple of
        # stride/λ, so grids genuinely cross chunk boundaries here
        ("StrideKTuple", {"k": 2, "gap": 1}),
        ("StrideKTuple", {"k": 3, "gap": 2, "prefix": "stride3"}),
        ("LambdaKTuple", {"k": 2, "lam": 2}),
        ("LambdaKTuple", {"k": 3, "lam": 3, "prefix": "lam3"}),
    ]
    ds = synth_transcripts(n_convs=16, duplicates=False)
    ks = lambda: [make_kernel(n, ALPHA, p)[1] for n, p in specs]  # noqa: E731
    whole = (
        conv_features(ds, ks(), alphabet=ALPHA, num_buckets=5)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    chunked = (
        conv_features_chunked(ds, ks(), alphabet=ALPHA, chunk_size=7,
                              num_buckets=9)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(whole, chunked)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not decomposable"):
        conv_features_chunked(
            ds, [make_kernel("CTDD", ALPHA)[1]],
            alphabet=ALPHA,
        )


def test_conv_features_auto_routes_by_length():
    """The skew router: long conversations (> chunk_size turns) go through
    the salted chunked machinery, short ones through the plain path — and
    the union equals ``conv_features`` on everything.  Also covers the
    no-long-convs fast path and the loud ``max_long_convs`` cap."""
    from protein_feature_engineering_ray.core.executor import (
        conv_features,
        conv_features_auto,
    )
    from protein_feature_engineering_ray.functions.registry import make_kernel

    specs = [("AAC", {}), ("DPC", {}), ("CKSAAP", {"kspace": 2}),
             ("DDE", {}), ("NMBroto", {"nlag": 3}), ("AC", {"nlag": 3})]
    pdf = synth_transcripts(n_convs=16, duplicates=False, as_pandas=True)
    rng = np.random.default_rng(47)
    val = rng.normal(loc=1.0, scale=2.0, size=len(pdf))
    val[rng.random(len(pdf)) < 0.1] = np.nan
    pdf["value"] = val
    ds = ray.data.from_pandas(pdf)
    ks = lambda: [make_kernel(n, ALPHA, p)[1] for n, p in specs]  # noqa: E731
    whole = (
        conv_features(ds, ks(), alphabet=ALPHA, num_buckets=5)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    # chunk_size=7: several synth conversations exceed it -> both sides run
    routed = (
        conv_features_auto(ds, ks(), alphabet=ALPHA, chunk_size=7,
                           num_buckets=9)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert list(whole.columns) == list(routed.columns)
    pd.testing.assert_series_equal(whole["conv_id"], routed["conv_id"])
    exact = [c for c in whole.columns
             if c.startswith(("aac_", "dpc_", "cksaap_", "dde_"))]
    pd.testing.assert_frame_equal(whole[exact], routed[exact])
    for c in whole.columns[1:]:
        np.testing.assert_allclose(
            whole[c], routed[c], rtol=1e-9, atol=1e-12, err_msg=c
        )

    # no conversation is long -> identical to the plain path, one exchange
    routed_all_short = (
        conv_features_auto(ds, ks(), alphabet=ALPHA, chunk_size=10**6,
                           num_buckets=5)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(whole, routed_all_short)

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="max_long_convs"):
        conv_features_auto(ds, ks(), alphabet=ALPHA, chunk_size=7,
                           num_buckets=5, max_long_convs=1)


def test_turn_features_auto_routes_by_length():
    """Per-turn skew router: union of the plain path (short convs) and the
    salted chunked path (long convs) is row-identical to ``turn_features``
    — bounded lookback/lookahead kernels are exactly equal when chunked."""
    from protein_feature_engineering_ray.core.executor import (
        turn_features,
        turn_features_auto,
    )
    from protein_feature_engineering_ray.functions.registry import make_kernel

    specs = [
        ("OneHot", {}),
        ("RollingComposition", {"w": 4}),
        ("Latency", {}),
        ("LagLead", {"col": "latency2", "shifts": (-2, 1, 3)}),
        ("RollingStats", {"col": "latency2", "w": 5}),
    ]
    pdf = synth_transcripts(n_convs=16, duplicates=False, as_pandas=True)
    pdf["latency2"] = np.arange(len(pdf), dtype=float)
    ds = ray.data.from_pandas(pdf).repartition(4)
    ks = lambda: [make_kernel(n, ALPHA, p)[1] for n, p in specs]  # noqa: E731
    whole = (
        turn_features(ds, ks(), alphabet=ALPHA, num_buckets=5)
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    routed = (
        turn_features_auto(ds, ks(), alphabet=ALPHA, chunk_size=7,
                           num_buckets=9)
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert len(whole) == len(routed) == len(pdf)
    pd.testing.assert_frame_equal(whole, routed)

    # all short -> plain path
    routed_all_short = (
        turn_features_auto(ds, ks(), alphabet=ALPHA, chunk_size=10**6,
                           num_buckets=5)
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(whole, routed_all_short)


def test_chunked_conv_lag_and_dde_equivalence():
    """Round-2 decomposable kernels: DDE (integer partials, bit-exact) and
    the full lag/autocorrelation family across chunk boundaries — the
    order-merged compacted-series kernels (NMBroto/AC/Moran/Geary) with an
    interior-NaN series, and the raw-positional sum-merged kernels
    (SOCNumber/QSOrder/PAAC/APAAC).  Float sums reorder across chunks, so
    allclose (tight) rather than bitwise."""
    from protein_feature_engineering_ray.core.executor import (
        conv_features,
        conv_features_chunked,
    )
    from protein_feature_engineering_ray.functions.registry import make_kernel

    pdf = synth_transcripts(n_convs=14, duplicates=False, as_pandas=True)
    # a numeric series with interior NaNs to exercise compaction stitching
    rng = np.random.default_rng(41)
    val = rng.normal(loc=3.0, scale=2.0, size=len(pdf))
    val[rng.random(len(pdf)) < 0.15] = np.nan
    pdf["value"] = val
    ds = ray.data.from_pandas(pdf)
    specs = [
        ("DDE", {}),
        ("ConvGraph", {}),
        ("NMBroto", {"nlag": 3}),
        ("AC", {"nlag": 3}),
        ("Moran", {"nlag": 3}),
        ("Geary", {"nlag": 3}),
        ("SOCNumber", {"nlag": 3}),
        ("QSOrder", {"nlag": 3}),
        ("PAAC", {"lam": 3}),
        ("APAAC", {"lam": 3}),
    ]
    ks = lambda: [make_kernel(n, ALPHA, p)[1] for n, p in specs]  # noqa: E731
    whole = (
        conv_features(ds, ks(), alphabet=ALPHA, num_buckets=5)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    chunked = (
        conv_features_chunked(ds, ks(), alphabet=ALPHA, chunk_size=6,
                              num_buckets=9)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert list(whole.columns) == list(chunked.columns)
    pd.testing.assert_series_equal(whole["conv_id"], chunked["conv_id"])
    for c in whole.columns[1:]:
        np.testing.assert_allclose(
            whole[c], chunked[c], rtol=1e-9, atol=1e-12, err_msg=c
        )
    # DDE partials are integer counts: bit-exact, not just close
    dde_cols = [c for c in whole.columns if c.startswith("dde_")]
    pd.testing.assert_frame_equal(whole[dde_cols], chunked[dde_cols])


def test_chunked_lag_family_large_offset_no_cancellation():
    """|mean| >> std series (1e9 + N(0, 1e-3)): the old raw-moment merge
    (``sxx - N·mu²``-style finalizers) lost all significant bits — var went
    to 0/negative and AC/Moran/Geary collapsed to zeros.  The chunk-mean-
    centered partials + Chan combine must track the unchunked path (which
    centers before squaring and is only input-representation-limited)."""
    from protein_feature_engineering_ray.core.executor import (
        conv_features,
        conv_features_chunked,
    )
    from protein_feature_engineering_ray.functions.registry import make_kernel

    pdf = synth_transcripts(n_convs=10, duplicates=False, as_pandas=True)
    rng = np.random.default_rng(43)
    pdf["value"] = 1.0e9 + rng.normal(0.0, 1e-3, size=len(pdf))
    ds = ray.data.from_pandas(pdf)
    specs = [("AC", {"nlag": 3}), ("Moran", {"nlag": 3}),
             ("Geary", {"nlag": 3})]
    ks = lambda: [make_kernel(n, ALPHA, p)[1] for n, p in specs]  # noqa: E731
    whole = (
        conv_features(ds, ks(), alphabet=ALPHA, num_buckets=4)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    chunked = (
        conv_features_chunked(ds, ks(), alphabet=ALPHA, chunk_size=6,
                              num_buckets=7)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    for c in whole.columns[1:]:
        assert np.isfinite(chunked[c]).all(), c
        # x stored at 1e9 has ~1e-7 ulp vs 1e-3 noise: centered values carry
        # ~1e-4 relative representation error, inherited (differently) by
        # both paths — measured divergence ≤1.3e-4 abs / ≤1% rel near zeros
        np.testing.assert_allclose(
            whole[c], chunked[c], rtol=2e-2, atol=5e-4, err_msg=c
        )
    # white noise: Geary's C clusters near 1 (short conversations scatter
    # widely) — NOT the degenerate all-zeros the cancelling form produced
    geary = [c for c in chunked.columns if c.startswith("geary_")]
    g = chunked[geary].to_numpy()
    assert (g > 0.05).all() and abs(np.median(g) - 1.0) < 0.5


def test_vector_output_matches_columns():
    """vector_col packs the same values in declared feature order."""
    from protein_feature_engineering_ray.core.executor import (
        conv_features,
        feature_names,
    )
    from protein_feature_engineering_ray.functions.registry import make_kernel

    ds = synth_transcripts(n_convs=10, duplicates=False)
    ks = [make_kernel(n, ALPHA)[1] for n in ("AAC", "TPC")]
    names = feature_names(ks)
    wide = conv_features(ds, ks, alphabet=ALPHA, num_buckets=4).to_pandas()
    vec = conv_features(
        [k for k in [ds]][0], ks, alphabet=ALPHA, num_buckets=4,
        vector_col="features",
    ).to_pandas()
    wide = wide.sort_values("conv_id").reset_index(drop=True)
    vec = vec.sort_values("conv_id").reset_index(drop=True)
    V = np.stack(vec["features"].to_numpy())
    assert V.shape == (len(wide), len(names))
    np.testing.assert_array_equal(V, wide[names].to_numpy())


def test_session_stats_matches_sessionize():
    from protein_feature_engineering_ray.stages.sessionize import (
        session_stats,
        sessionize,
    )

    ds = synth_transcripts(n_convs=16, duplicates=False)
    per_turn = sessionize(ds, gap_seconds=600.0, num_buckets=5).to_pandas()
    want = (
        per_turn.groupby(["conv_id", "session_idx"])
        .agg(n_turns=("turn_idx", "size"))
        .reset_index()
    )
    got = session_stats(ds, gap_seconds=600.0, num_buckets=5).to_pandas()
    m = got.merge(want, on=["conv_id", "session_idx"], suffixes=("", "_o"))
    assert len(m) == len(want) == len(got)
    assert (m["n_turns"] == m["n_turns_o"]).all()


def test_ctdd_chunked_equivalence():
    """Two-pass chunked CTDD == unchunked CTDDistribution, including the
    mega-conversation and empty-group defaults (rank statistics routed to
    chunks, no conversation materialized whole)."""
    from protein_feature_engineering_ray.core.executor import conv_features
    from protein_feature_engineering_ray.functions.ctdd_chunked import ctdd_chunked
    from protein_feature_engineering_ray.functions.registry import make_kernel

    ds = synth_transcripts(n_convs=14, duplicates=False)
    k = make_kernel("CTDD", ALPHA)[1]
    whole = (
        conv_features(ds, [k], alphabet=ALPHA, num_buckets=5)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    chunked = (
        ctdd_chunked(ds, make_kernel("CTDD", ALPHA)[1], alphabet=ALPHA,
                     chunk_size=6, num_buckets=9)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(whole, chunked)


def test_backfill_float32_packed_output(tmp_path):
    """vector_col + float32 output: same rows/keys, features packed into one
    FixedSizeList<float32> column matching the float64 named columns to
    float32 precision."""
    d64 = str(tmp_path / "f64")
    d32 = str(tmp_path / "f32")
    ds = synth_transcripts(n_convs=12, duplicates=False)
    backfill_to_dir(ds, d64, num_buckets=4, alphabet=ALPHA, order_cols=ORDER,
                    assign_turn_idx=False)
    backfill_to_dir(
        synth_transcripts(n_convs=12, duplicates=False), d32, num_buckets=4,
        alphabet=ALPHA, order_cols=ORDER, assign_turn_idx=False,
        vector_col="features", out_dtype="float32",
    )
    a = _read_sorted(d64).drop(columns=["bucket"], errors="ignore")
    b = _read_sorted(d32).drop(columns=["bucket"], errors="ignore")
    assert len(a) == len(b)
    feat_cols = [c for c in a.columns
                 if c not in ("conv_id", "turn_idx", "ts", "session_idx")]
    assert list(b.columns) == ["conv_id", "turn_idx", "ts", "session_idx",
                               "features"]
    packed = np.stack(b["features"].to_numpy())
    assert packed.dtype == np.float32
    np.testing.assert_allclose(
        packed, a[feat_cols].to_numpy(), rtol=1e-6, atol=1e-6
    )


def test_sized_read_parquet_block_count(tmp_path):
    """Block count derives from FILE BYTES, not cpu count: a tiny table
    collapses to min_blocks (the per-block exchange cost was measured
    near-linear in block count), a synthetic big size yields ceil(sz/32MB),
    and an explicit override or a non-path input falls through untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from protein_feature_engineering_ray.sources import io as src_io

    p = tmp_path / "tiny.parquet"
    pq.write_table(pa.table({"x": list(range(100))}), p)

    ds = src_io.sized_read_parquet(str(p))
    assert ds.count() == 100

    captured = {}
    orig = src_io.ray.data.read_parquet

    def spy(path, columns=None, **kw):
        captured.update(kw)
        return orig(path, columns=columns, **kw)

    src_io.ray.data.read_parquet = spy
    try:
        src_io.sized_read_parquet(str(p))
        assert captured["override_num_blocks"] == 4  # min_blocks floor
        captured.clear()
        src_io.sized_read_parquet(str(p), min_blocks=2)
        assert captured["override_num_blocks"] == 2
        captured.clear()
        # caller override wins over the derived count
        src_io.sized_read_parquet(str(p), override_num_blocks=7)
        assert captured["override_num_blocks"] == 7
        captured.clear()
        # a fat file gets ceil(bytes / 32MB)
        import os as _os
        orig_getsize = _os.path.getsize
        _os.path.getsize = lambda _: 100 << 20
        try:
            src_io.sized_read_parquet(str(p))
            assert captured["override_num_blocks"] == 4  # ceil(100/32) = 4
            _os.path.getsize = lambda _: (32 << 20) * 50
            captured.clear()
            src_io.sized_read_parquet(str(p))
            assert captured["override_num_blocks"] == 50
        finally:
            _os.path.getsize = orig_getsize
        captured.clear()
        # list-of-paths input: no override injected (Ray default heuristic)
        src_io.sized_read_parquet([str(p), str(p)])
        assert "override_num_blocks" not in captured
    finally:
        src_io.ray.data.read_parquet = orig


@pytest.mark.skipif(not os.path.isdir("/root/testdata/sf0.001"),
                    reason="driver testdata not present")
def test_from_events_column_pruning_contract():
    """``columns`` selects transcript outputs: identity/order columns are
    always included, pruned outputs equal the full read's on shared columns,
    and unknown names raise."""

    from protein_feature_engineering_ray.sources.transcripts import from_events

    sf = "/root/testdata/sf0.001"
    full = from_events(sf).to_pandas().sort_values(
        ["conv_id", "ts", "event_id"], kind="mergesort").reset_index(drop=True)
    pruned = from_events(sf, columns=["role", "value"]).to_pandas().sort_values(
        ["conv_id", "ts", "event_id"], kind="mergesort").reset_index(drop=True)
    assert list(pruned.columns) == ["conv_id", "event_id", "turn_idx",
                                    "role", "ts", "value"]
    for c in pruned.columns:
        assert pruned[c].equals(full[c]), c
    with pytest.raises(ValueError):
        from_events(sf, columns=["no_such_col"])


def test_run_layout_guard(tmp_path):
    """num_buckets is recorded at commit time and a resume / incremental
    under a DIFFERENT modulus refuses loudly (silent corruption otherwise:
    conversations re-hash into fresh buckets while stale rows linger)."""
    from protein_feature_engineering_ray.state.manifest import read_run_meta

    out = str(tmp_path / "o")
    _run(out, n_buckets=8)
    meta = read_run_meta(out)
    assert meta["num_buckets"] == 8 and meta["complete"] is True

    df = synth_transcripts(n_convs=24, duplicates=False, as_pandas=True)
    with pytest.raises(RuntimeError, match="num_buckets=8"):
        backfill_to_dir(ray.data.from_pandas(df), out, num_buckets=16,
                        alphabet=ALPHA, order_cols=ORDER,
                        assign_turn_idx=False)
    with pytest.raises(RuntimeError, match="num_buckets=8"):
        incremental_backfill_to_dir(
            ray.data.from_pandas(df), out, num_buckets=16, alphabet=ALPHA,
            order_cols=ORDER, assign_turn_idx=False)
    # legacy dir: committed buckets but no root manifest -> refuse
    os.remove(os.path.join(out, "_RUN.json"))
    with pytest.raises(RuntimeError, match="_RUN.json"):
        backfill_to_dir(ray.data.from_pandas(df), out, num_buckets=8,
                        alphabet=ALPHA, order_cols=ORDER,
                        assign_turn_idx=False)


def test_incremental_delta_ds_requires_complete_dir(tmp_path):
    """delta_ds pass 1 over a partially-committed dir would permanently drop
    a crashed bucket's pre-crash conversations — must refuse; a full-corpus
    pass 1 run is allowed, heals the dir, and marks it complete again."""
    from protein_feature_engineering_ray.state.manifest import read_run_meta

    full_df = synth_transcripts(n_convs=24, duplicates=False, as_pandas=True)
    kw = dict(num_buckets=8, alphabet=ALPHA, order_cols=ORDER,
              assign_turn_idx=False)
    cold = str(tmp_path / "cold")
    backfill_to_dir(ray.data.from_pandas(full_df), cold, **kw)
    want = _read_sorted(cold)

    inc = str(tmp_path / "inc")
    backfill_to_dir(ray.data.from_pandas(full_df), inc, **kw)
    # simulate the mid-backfill crash: drop one bucket's commit AND mark the
    # root manifest incomplete (what a killed run leaves behind)
    b0 = sorted(completed_buckets(inc))[0]
    os.remove(os.path.join(bucket_dir(inc, b0), "_SUCCESS.json"))
    from protein_feature_engineering_ray.state.manifest import write_run_meta

    write_run_meta(inc, 8, complete=False)

    with pytest.raises(RuntimeError, match="partially-committed"):
        incremental_backfill_to_dir(
            ray.data.from_pandas(full_df), inc,
            delta_ds=ray.data.from_pandas(full_df.iloc[:5]), **kw)

    # full-corpus pass 1: allowed, recomputes the crashed bucket, completes
    manifest = incremental_backfill_to_dir(
        ray.data.from_pandas(full_df), inc, **kw)
    assert b0 in {m["bucket"] for m in manifest}
    pd.testing.assert_frame_equal(_read_sorted(inc), want)
    assert read_run_meta(inc)["complete"] is True


def test_delta_meta_counts_stay_honest(tmp_path):
    """After a delta commit the meta must not mix stale logical counts with
    physical rows: convs/turns become base_convs/base_turns, fragments carry
    their own convs, and rows is the PHYSICAL total."""
    from protein_feature_engineering_ray.state.manifest import read_bucket_meta

    full_df = synth_transcripts(n_convs=24, duplicates=False, as_pandas=True)
    g = full_df.groupby("conv_id")["ts"].agg(["min", "max"])
    cutoff = g["max"].sort_values().iloc[-6]
    df1 = full_df[full_df["ts"] <= cutoff].reset_index(drop=True)
    kw = dict(num_buckets=8, alphabet=ALPHA, order_cols=ORDER,
              assign_turn_idx=False)
    inc = str(tmp_path / "inc")
    backfill_to_dir(ray.data.from_pandas(df1), inc, **kw)
    manifest = incremental_backfill_to_dir(
        ray.data.from_pandas(full_df), inc, **kw)
    frag_bucket = None
    for m in manifest:
        meta = read_bucket_meta(inc, m["bucket"])
        if "fragments" not in meta:
            continue
        frag_bucket = meta
        assert "convs" not in meta and "turns" not in meta
        assert meta["base_convs"] >= 1 and meta["base_turns"] >= 1
        assert meta["rows"] == sum(f["rows"] for f in meta["fragments"])
        assert meta["fragments"][-1]["convs"] == meta["delta_convs"]
    assert frag_bucket is not None, "no delta fragment was committed"


def test_incremental_dedup_passthrough(tmp_path):
    """dedup=True survives the incremental path: duplicated (conv_id,
    turn_idx) delta rows collapse exactly as a cold dedup rebuild's."""
    full_df = synth_transcripts(n_convs=16, duplicates=False, as_pandas=True)
    g = full_df.groupby("conv_id")["ts"].agg(["min", "max"])
    cutoff = g["max"].sort_values().iloc[-4]
    df1 = full_df[full_df["ts"] <= cutoff].reset_index(drop=True)
    dup_full = pd.concat(
        [full_df, full_df[full_df["ts"] > cutoff]], ignore_index=True)

    kw = dict(num_buckets=6, alphabet=ALPHA, order_cols=ORDER,
              assign_turn_idx=False)
    cold = str(tmp_path / "cold")
    backfill_to_dir(ray.data.from_pandas(full_df), cold, **kw)
    want = _read_sorted(cold)

    inc = str(tmp_path / "inc")
    backfill_to_dir(ray.data.from_pandas(df1), inc, **kw)
    incremental_backfill_to_dir(
        ray.data.from_pandas(dup_full), inc, dedup=True, **kw)
    pd.testing.assert_frame_equal(_read_sorted(inc), want)


def test_corpus_store_incremental(tmp_path):
    """Bucket-partitioned corpus store: ingest + append are value-complete
    and retry-safe, and the corpus-backed incremental (touched-bucket +
    row-group pruned pass 2) equals a cold full backfill."""
    from protein_feature_engineering_ray.state.corpus import (
        append_corpus,
        corpus_files,
        ingest_corpus,
        pruned_read_stats,
        read_corpus,
    )

    full_df = synth_transcripts(n_convs=24, duplicates=False, as_pandas=True)
    g = full_df.groupby("conv_id")["ts"].agg(["min", "max"])
    cutoff = g["max"].sort_values().iloc[-6]
    base_df = full_df[full_df["ts"] <= cutoff].reset_index(drop=True)
    new_df = full_df[full_df["ts"] > cutoff].reset_index(drop=True)

    store = str(tmp_path / "store")
    ingest_corpus(ray.data.from_pandas(base_df), store, num_buckets=8)
    got = read_corpus(store).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    want_in = base_df.sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want_in[sorted(want_in.columns)])

    # append the delta; a RETRY of the same append must be a no-op
    new_files = append_corpus(ray.data.from_pandas(new_df), store)
    assert new_files and all(os.path.exists(f) for f in new_files)
    assert append_corpus(ray.data.from_pandas(new_df), store) == []
    got2 = read_corpus(store).to_pandas()
    assert len(got2) == len(full_df)

    # pruned read returns exactly the touched conversations' history
    touched = sorted(new_df["conv_id"].unique())
    import pyarrow as pa

    pruned = read_corpus(
        store, conv_filter=pa.array(touched)).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    want_t = full_df[full_df["conv_id"].isin(touched)].sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        pruned[sorted(pruned.columns)], want_t[sorted(want_t.columns)])

    # corpus-backed incremental == cold full backfill
    kw = dict(num_buckets=8, alphabet=ALPHA, order_cols=ORDER,
              assign_turn_idx=False)
    cold = str(tmp_path / "cold")
    backfill_to_dir(ray.data.from_pandas(full_df), cold, **kw)
    want = _read_sorted(cold)

    inc = str(tmp_path / "inc")
    backfill_to_dir(read_corpus(store), inc, **kw)
    # note: base backfill ran BEFORE append in real life; here the store
    # already holds the delta, so rebuild the base dir from base_df instead
    import shutil

    shutil.rmtree(inc)
    backfill_to_dir(ray.data.from_pandas(base_df), inc, **kw)
    manifest = incremental_backfill_to_dir(
        None, inc, corpus_dir=store,
        delta_ds=ray.data.read_parquet(new_files), **kw)
    assert manifest
    pd.testing.assert_frame_equal(_read_sorted(inc), want)

    # mismatched modulus refuses
    with pytest.raises(RuntimeError, match="hash modulus"):
        incremental_backfill_to_dir(
            None, str(tmp_path / "x"), corpus_dir=store,
            num_buckets=16, alphabet=ALPHA, order_cols=ORDER,
            assign_turn_idx=False)

    # pruning accounting is self-consistent and actually prunes something
    stats = pruned_read_stats(store, touched)
    assert stats["bytes_total"] > 0
    assert stats["bytes_kept"] <= stats["bytes_total"]
    assert stats["files_opened"] <= stats["files_total"]
    assert len(corpus_files(store)) == stats["files_total"]


def test_append_corpus_watermark_boundary(tmp_path):
    """Rows AT a bucket's committed watermark resolve exactly: a retry
    remnant (whole-row duplicate) is skipped, a genuinely NEW row in the
    same microsecond is ingested, identical new copies follow multiset
    semantics, and the skip count lands in the bucket meta — the watermark
    never silently drops data."""
    from protein_feature_engineering_ray.state.corpus import (
        append_corpus,
        ingest_corpus,
        read_corpus,
    )
    from protein_feature_engineering_ray.state.manifest import (
        read_bucket_meta,
    )

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    us = pd.Timedelta(microseconds=1)
    base = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": [0, 1, 0],
        "role": ["user", "assistant", "user"],
        "ts": [t0, t0 + 5 * us, t0 + 5 * us],
    })
    store = str(tmp_path / "store")
    ingest_corpus(ray.data.from_pandas(base), store, num_buckets=4)

    wm_ts = t0 + 5 * us  # every committed row's max ts — the watermark
    wave2 = pd.DataFrame({
        # row 0: exact duplicate of committed (c1, 1) at the watermark
        # (a crashed-append retry remnant) — must be skipped;
        # rows 1-3: genuinely NEW rows in the SAME microsecond (two of
        # them identical copies — both must survive, committed has zero);
        # row 4: a plainly newer row.
        "conv_id": ["c1", "c1", "c2", "c2", "c1"],
        "turn_idx": [1, 2, 1, 1, 3],
        "role": ["assistant", "user", "tool", "tool", "user"],
        "ts": [wm_ts, wm_ts, wm_ts, wm_ts, t0 + 9 * us],
    })
    files = append_corpus(ray.data.from_pandas(wave2), store)
    assert files
    got = read_corpus(store).to_pandas()
    assert len(got) == len(base) + 4  # all of wave2 except the retry dup
    assert len(got[(got["conv_id"] == "c1") & (got["turn_idx"] == 1)]) == 1
    assert len(got[(got["conv_id"] == "c2") & (got["turn_idx"] == 1)]) == 2

    # a full retry of the whole wave is a no-op
    assert append_corpus(ray.data.from_pandas(wave2), store) == []
    assert len(read_corpus(store).to_pandas()) == len(base) + 4

    # the skipped duplicate is accounted loudly in its bucket's meta
    b_c1 = int(bucket_hash(np.asarray(["c1"], dtype=object), 4)[0])
    meta = read_bucket_meta(store, b_c1)
    assert meta.get("boundary_dup_skipped", 0) >= 1


def test_incremental_random_waves(tmp_path):
    """Randomized armor: N random append cut-points, incremental after each
    wave, final logical output equals a cold full backfill regardless of
    which conversations were refreshed in which wave (delta fragments +
    in-splice compaction both exercised by mixed max_fragments)."""
    import numpy as np

    rng = np.random.default_rng(11)
    full_df = synth_transcripts(n_convs=30, duplicates=False, as_pandas=True)
    kw = dict(num_buckets=8, alphabet=ALPHA, order_cols=ORDER,
              assign_turn_idx=False)
    cold = str(tmp_path / "cold")
    backfill_to_dir(ray.data.from_pandas(full_df), cold, **kw)
    want = _read_sorted(cold)

    for trial in range(2):
        ts_sorted = np.sort(full_df["ts"].unique())
        cuts = np.sort(rng.choice(
            ts_sorted[len(ts_sorted) // 4:-1], size=3, replace=False))
        inc = str(tmp_path / f"inc{trial}")
        first = full_df[full_df["ts"] <= cuts[0]].reset_index(drop=True)
        backfill_to_dir(ray.data.from_pandas(first), inc, **kw)
        for i, c in enumerate(list(cuts[1:]) + [None]):
            snap = full_df if c is None else (
                full_df[full_df["ts"] <= c].reset_index(drop=True))
            # trial 1 forces in-splice compaction on every wave
            incremental_backfill_to_dir(
                ray.data.from_pandas(snap), inc,
                max_fragments=16 if trial == 0 else 1, **kw)
        pd.testing.assert_frame_equal(_read_sorted(inc), want)


def test_corpus_store_compaction(tmp_path):
    """compact_corpus collapses append fragments to one sorted indexed
    generation: logical content identical, pruned reads still exact,
    watermarks preserved (a replayed append wave stays a no-op)."""
    import pyarrow as pa

    from protein_feature_engineering_ray.state.corpus import (
        append_corpus,
        compact_corpus,
        corpus_files,
        ingest_corpus,
        read_corpus,
    )

    full_df = synth_transcripts(n_convs=24, duplicates=False, as_pandas=True)
    g = full_df.groupby("conv_id")["ts"].agg(["min", "max"])
    cuts = g["max"].sort_values()
    c1, c2 = cuts.iloc[-10], cuts.iloc[-4]
    base = full_df[full_df["ts"] <= c1]
    w1 = full_df[(full_df["ts"] > c1) & (full_df["ts"] <= c2)]
    w2 = full_df[full_df["ts"] > c2]

    store = str(tmp_path / "store")
    ingest_corpus(ray.data.from_pandas(base.reset_index(drop=True)),
                  store, num_buckets=8)
    append_corpus(ray.data.from_pandas(w1.reset_index(drop=True)), store)
    append_corpus(ray.data.from_pandas(w2.reset_index(drop=True)), store)
    n_buckets = len(completed_buckets(store))  # a bucket may own 0 convs
    n_files_before = len(corpus_files(store))
    assert n_files_before > n_buckets  # fragments actually accumulated

    want = read_corpus(store).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    # size-tiered trigger: every bucket holds <= 3 fragments (base + 2
    # waves), so a min_fragments=4 cadence call is a no-op
    assert compact_corpus(store, min_fragments=4) == []
    assert len(corpus_files(store)) == n_files_before
    rows = compact_corpus(store)
    assert rows and len(corpus_files(store)) == n_buckets  # one per bucket
    got = read_corpus(store).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])

    # pruned read stays exact over the rewritten index
    touched = sorted(w2["conv_id"].unique())
    pruned = read_corpus(
        store, conv_filter=pa.array(touched)).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    want_t = full_df[full_df["conv_id"].isin(touched)].sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        pruned[sorted(pruned.columns)], want_t[sorted(want_t.columns)])

    # watermark preserved: replaying the last wave is still a no-op
    assert append_corpus(
        ray.data.from_pandas(w2.reset_index(drop=True)), store) == []
    # compacting an already-compact store is a no-op
    assert compact_corpus(store) == []


def test_corpus_pruned_read_without_index_sidecars(tmp_path):
    """Legacy stores (no .idx sidecars) fall back to min/max range pruning;
    the post-decode is_in filter keeps the result exact either way."""
    import glob as _glob

    import pyarrow as pa

    from protein_feature_engineering_ray.state.corpus import (
        ingest_corpus,
        read_corpus,
    )

    df = synth_transcripts(n_convs=16, duplicates=False, as_pandas=True)
    store = str(tmp_path / "store")
    ingest_corpus(ray.data.from_pandas(df), store, num_buckets=4)
    for p in _glob.glob(os.path.join(store, "bucket=*", "*.idx")):
        os.remove(p)
    touched = sorted(df["conv_id"].unique())[:3]
    got = read_corpus(
        store, conv_filter=pa.array(touched)).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    want = df[df["conv_id"].isin(touched)].sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)])


def test_corpus_pruned_read_projection_without_key(tmp_path):
    """A conv-filtered corpus read whose projection drops conv_id still
    filters exactly (the key is read alongside and stripped after)."""
    import pyarrow as pa

    from protein_feature_engineering_ray.state.corpus import (
        ingest_corpus,
        read_corpus,
    )

    df = synth_transcripts(n_convs=12, duplicates=False, as_pandas=True)
    store = str(tmp_path / "store")
    ingest_corpus(ray.data.from_pandas(df), store, num_buckets=4)
    touched = sorted(df["conv_id"].unique())[:2]
    got = read_corpus(
        store, columns=["turn_idx", "text"],
        conv_filter=pa.array(touched)).to_pandas()
    want = df[df["conv_id"].isin(touched)]
    assert list(got.columns) == ["turn_idx", "text"]
    assert len(got) == len(want)
    assert sorted(got["turn_idx"]) == sorted(want["turn_idx"])


def test_corpus_store_random_waves(tmp_path):
    """Randomized armor for the 100 TB shape end-to-end: random append
    cut-points flow through the corpus store (append_corpus wave files ->
    delta-sized pass 1 -> touched-bucket + index-pruned pass 2), with a
    mid-sequence corpus compaction; final logical output equals a cold
    full backfill."""
    import numpy as np

    from protein_feature_engineering_ray.state.corpus import (
        append_corpus,
        compact_corpus,
        ingest_corpus,
        read_corpus,
    )

    rng = np.random.default_rng(13)
    full_df = synth_transcripts(n_convs=30, duplicates=False, as_pandas=True)
    kw = dict(num_buckets=8, alphabet=ALPHA, order_cols=ORDER,
              assign_turn_idx=False)
    cold = str(tmp_path / "cold")
    backfill_to_dir(ray.data.from_pandas(full_df), cold, **kw)
    want = _read_sorted(cold)

    ts_sorted = np.sort(full_df["ts"].unique())
    cuts = np.sort(rng.choice(
        ts_sorted[len(ts_sorted) // 4:-1], size=3, replace=False))
    store = str(tmp_path / "store")
    inc = str(tmp_path / "inc")
    prev = full_df[full_df["ts"] <= cuts[0]].reset_index(drop=True)
    ingest_corpus(ray.data.from_pandas(prev), store, num_buckets=8)
    backfill_to_dir(read_corpus(store), inc, **kw)
    lo = cuts[0]
    for i, c in enumerate(list(cuts[1:]) + [None]):
        wave = full_df[full_df["ts"] > lo] if c is None else (
            full_df[(full_df["ts"] > lo) & (full_df["ts"] <= c)])
        lo = c
        new_files = append_corpus(
            ray.data.from_pandas(wave.reset_index(drop=True)), store)
        if not new_files:
            continue
        incremental_backfill_to_dir(
            None, inc, corpus_dir=store,
            delta_ds=ray.data.read_parquet(new_files), **kw)
        if i == 1:  # pruned pass 2 must survive a mid-sequence compaction
            compact_corpus(store)
    pd.testing.assert_frame_equal(_read_sorted(inc), want)
