"""Tests for the coarse-bucket join (core/joins.py), connected components,
and the distributed dedup paths built on them."""

import numpy as np
import pandas as pd
import ray.data

from protein_feature_engineering_ray.core.joins import bucket_join


def _pdf(d):
    return pd.DataFrame(d)


def test_bucket_join_inner_and_outer():
    left = ray.data.from_pandas(
        _pdf({"k": [1, 2, 3, 4], "x": [10, 20, 30, 40]})
    )
    right = ray.data.from_pandas(_pdf({"id": [2, 4, 4, 5], "y": [9, 8, 7, 6]}))
    inner = (
        bucket_join(left, right, on=["k"], right_on=["id"], how="inner",
                    num_buckets=4)
        .to_pandas().sort_values(["k", "y"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        inner, _pdf({"k": [2, 4, 4], "x": [20, 40, 40], "y": [9, 7, 8]})
    )
    outer = (
        bucket_join(left, right, on=["k"], right_on=["id"], how="left_outer",
                    num_buckets=4)
        .to_pandas().sort_values(["k", "y"]).reset_index(drop=True)
    )
    assert len(outer) == 5  # 1 and 3 survive unmatched
    assert outer[outer["k"] == 1]["y"].isna().all()


def test_bucket_join_left_outer_all_left_buckets_schema():
    """Buckets with ZERO right rows must emit explicit null columns (Arrow
    promotes null -> int64 across blocks), never a pandas-inferred float64
    that diverges from the matched buckets' int64 per-block schema."""
    import pyarrow as pa

    left = ray.data.from_pandas(
        _pdf({"k": np.arange(100, dtype=np.int64)})
    )
    right = ray.data.from_pandas(
        _pdf({"k": np.array([3], dtype=np.int64),
              "v": np.array([42], dtype=np.int64)})
    )
    j = bucket_join(left, right, on=["k"], how="left_outer", num_buckets=16,
                    left_cols=["k"], right_cols=["k", "v"])
    for b in j.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b.schema.field("v").type
        assert pa.types.is_null(t) or pa.types.is_int64(t), t
    df = j.to_pandas()
    assert len(df) == 100
    assert df.loc[df["k"] == 3, "v"].tolist() == [42]
    assert df["v"].isna().sum() == 99


def test_bucket_join_semi_anti_and_collision_suffix():
    left = ray.data.from_pandas(_pdf({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]}))
    right = ray.data.from_pandas(_pdf({"k": [2, 2, 9], "v": [99.0, 98.0, 0.0]}))
    semi = bucket_join(left, right, on=["k"], how="left_semi",
                       num_buckets=3).to_pandas()
    assert sorted(semi["k"]) == [2] and list(semi.columns) == ["k", "v"]
    anti = bucket_join(left, right, on=["k"], how="left_anti",
                       num_buckets=3).to_pandas()
    assert sorted(anti["k"]) == [1, 3]
    inner = bucket_join(left, right, on=["k"], how="inner",
                        num_buckets=3).to_pandas()
    assert sorted(inner.columns) == ["k", "v", "v_r"]
    assert len(inner) == 2  # one left row x two right matches


def test_bucket_join_int_keys_stay_int_through_chained_joins():
    # regression: pandas-side conversion of a group containing the other
    # side's padding nulls promoted int64 keys to float64, silently emptying
    # the next join
    a = ray.data.from_pandas(_pdf({"id_a": [1, 2], "id_b": [10, 20]}))
    sig = ray.data.from_pandas(_pdf({"doc": [1, 2, 10, 20],
                                     "payload": [b"a", b"b", b"c", b"d"]}))
    j = bucket_join(a, sig, on=["id_a"], right_on=["doc"], how="inner",
                    num_buckets=4, left_cols=["id_a", "id_b"],
                    right_cols=["doc", "payload"])
    j = bucket_join(j, sig, on=["id_b"], right_on=["doc"], how="inner",
                    num_buckets=4, right_suffix="_b",
                    left_cols=["id_a", "id_b", "payload"],
                    right_cols=["doc", "payload"])
    out = j.to_pandas().sort_values("id_a")
    assert list(out["id_a"]) == [1, 2]
    assert list(out["payload"]) == [b"a", b"b"]
    assert list(out["payload_b"]) == [b"c", b"d"]


def test_connected_components_chain_and_islands():
    from protein_feature_engineering_ray.stages.dedup import connected_components

    # chain 1-2-3-4 (via star edges from overlapping groups), island 7-8,
    # singleton edges absent for 99
    edges = ray.data.from_pandas(
        _pdf({"id_a": [1, 2, 3, 7], "id_b": [2, 3, 4, 8]})
    )
    lab = connected_components(edges, num_buckets=4).to_pandas()
    got = dict(zip(lab["node"], lab["label"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7}


def test_exact_dedup_hash_collision_soundness():
    from protein_feature_engineering_ray.stages.dedup import exact_dedup

    pdf = _pdf({"key": [f"k{i}" for i in range(20)], "val": range(20)})
    # degenerate hash: EVERY distinct key collides into one _dkey
    out = exact_dedup(
        ray.data.from_pandas(pdf), key_cols=["key"], num_buckets=4,
        _hash_fn=lambda df: np.zeros(len(df), dtype=np.uint64),
    ).to_pandas()
    assert sorted(out["key"]) == sorted(pdf["key"]), (
        "distinct keys sharing a hash were dropped"
    )


def test_minhash_dedup_dup_heavy_corpus():
    """>30% duplicates, overlapping clusters; fully distributed path."""
    from protein_feature_engineering_ray.stages.dedup import minhash_dedup

    rng = np.random.default_rng(17)
    words = [f"w{i}" for i in range(300)]
    base = [" ".join(rng.choice(words, size=50)) for _ in range(30)]
    texts = list(base)
    expect_dropped = set()
    # 3 near-copies of each of the first 10 docs -> 30 dups over 60 docs
    for i in range(10):
        for j in range(3):
            src = base[i].split()
            src[5 + j] = f"MUT{j}"
            texts.append(" ".join(src))
            expect_dropped.add(len(texts) - 1)
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    # cc_local_threshold=0 forces the fully-distributed components + anti-join
    # path (the 100 TB route); the default bounded-local path is covered by
    # test_minhash_dedup_finds_planted_neardups
    out = minhash_dedup(
        ray.data.from_pandas(df), threshold=0.5, num_buckets=8,
        cc_local_threshold=0,
    ).to_pandas()
    kept = set(out["doc_id"])
    assert kept.isdisjoint(expect_dropped)
    # every original survives (originals are mutually dissimilar)
    assert set(range(30)) <= kept
    assert len(out) == 30


def test_fit_sampling_order_invariance():
    """pca/kmeans/ivf fit samples are content-hash based: shuffling the
    input row order must not change the fitted model or cluster census
    (regression for the limit()-takes-first-blocks bias)."""
    from protein_feature_engineering_ray.stages.reduce import (
        kmeans_assign,
        kmeans_fit,
        pca_fit,
    )

    rng = np.random.default_rng(23)
    # 3 well-separated clusters, ids interleaved so a prefix sample would
    # see a biased mix
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    X = np.concatenate(
        [c + rng.normal(scale=0.3, size=(400, 2)) for c in centers]
    )
    ids = np.arange(len(X))
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    shuffled = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    # sorted-by-cluster order vs shuffled order
    fits = []
    for frame in (df, shuffled):
        ds = ray.data.from_pandas(frame)
        C = kmeans_fit(ds, vec_col="embedding", k=3, sample_limit=300,
                       sample_by="vec_id")
        counts = (
            kmeans_assign(ds, C, vec_col="embedding")
            .to_pandas().groupby("cluster").size().sort_index()
        )
        model = pca_fit(ds, vec_col="embedding", k=2, sample_limit=300,
                        sample_by="vec_id")
        fits.append((C, counts, model))
    (C0, n0, m0), (C1, n1, m1) = fits
    np.testing.assert_allclose(C0, C1)
    pd.testing.assert_series_equal(n0, n1)
    np.testing.assert_allclose(m0["mean"], m1["mean"])
    np.testing.assert_allclose(m0["components"], m1["components"])
    assert sorted(n0.to_numpy()) == [400, 400, 400]


def test_embedding_neardup_banded_recall_and_caps():
    """Banded (multi-rep) hyperplane LSH must recover at least as many
    planted near-dup pairs as a single projection, and overflow cells must
    split (or star) instead of running all-pairs."""
    from protein_feature_engineering_ray.stages.dedup import embedding_neardup

    rng = np.random.default_rng(31)
    dim = 16
    base = rng.normal(size=(40, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [v for v in base]
    planted = set()
    for i in range(12):  # near-dup of base i with a small perturbation
        v = base[i] + rng.normal(scale=0.05, size=dim)
        v /= np.linalg.norm(v)
        vecs.append(v)
        planted.add((i, 40 + i))
    df = pd.DataFrame(
        {"vec_id": np.arange(len(vecs)), "embedding": [list(v) for v in vecs]}
    )

    def recovered(reps):
        out = embedding_neardup(
            ray.data.from_pandas(df), threshold=0.9, n_planes=8, reps=reps,
        ).to_pandas()
        return {(a, b) for a, b in zip(out["id_a"], out["id_b"])} & planted

    r1, r4 = recovered(1), recovered(4)
    assert r4 >= r1
    assert len(r4) >= 10  # banded recall near-complete on 12 planted pairs

    # cap path: 60 IDENTICAL vectors in one cell with max_bucket=10 must
    # still link the whole cluster (star edges), not all-pairs-explode
    same = np.tile(base[0], (60, 1))
    df2 = pd.DataFrame(
        {"vec_id": np.arange(60), "embedding": [list(v) for v in same]}
    )
    out2 = embedding_neardup(
        ray.data.from_pandas(df2), threshold=0.99, n_planes=4, reps=2,
        max_bucket=10,
    ).to_pandas()
    # star edges from min id connect all 60 into one component
    assert set(out2["id_a"]) == {0}
    assert set(out2["id_b"]) == set(range(1, 60))


def test_embed_actor_packing_and_determinism():
    """Token-budget micro-batching must not change embeddings (packing is a
    throughput concern only), batches must respect toks_per_batch, and the
    model is deterministic across actors."""
    import pyarrow as pa

    from protein_feature_engineering_ray.stages.embed import (
        EmbedActor,
        embed_docs,
    )

    rng = np.random.default_rng(47)
    texts = [
        " ".join(f"w{rng.integers(0, 500)}" for _ in range(int(n)))
        for n in rng.integers(0, 900, size=60)
    ] + ["", "   ", "single"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})

    tiny = EmbedActor(dim=16, toks_per_batch=64, truncation_seq_length=128)
    big = EmbedActor(dim=16, toks_per_batch=10**9, truncation_seq_length=128)
    t = pa.table({"doc_id": df.doc_id.to_numpy(), "text": df.text.to_numpy()})
    e_tiny = np.stack(tiny(t)["embedding"].to_pandas().to_numpy())
    e_big = np.stack(big(t)["embedding"].to_pandas().to_numpy())
    np.testing.assert_array_equal(e_tiny, e_big)

    # packing respects the budget (seqs longer than the budget get their own
    # batch)
    lens = tiny.model.token_lengths(df.text.to_numpy(dtype=object))
    for b in tiny._micro_batches(lens):
        assert len(b) == 1 or (lens[b] + 1).sum() <= 64

    # distributed stage matches the local actor
    out = (
        embed_docs(ray.data.from_pandas(df), dim=16, concurrency=2,
                   truncation_seq_length=128)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    np.testing.assert_array_equal(np.stack(out["embedding"].to_numpy()), e_big)
    # unit-norm (or zero for empty docs)
    norms = np.linalg.norm(e_big, axis=1)
    empty = lens == 0
    np.testing.assert_allclose(norms[~empty], 1.0, rtol=1e-5)
    np.testing.assert_array_equal(norms[empty], 0.0)


def test_embed_to_dir_resume(tmp_path):
    """Kill/resume equivalence for the embedding backfill: uncommitted
    partitions recompute, committed ones are untouched, final output equals
    a clean run."""
    import os

    from protein_feature_engineering_ray.stages.embed import embed_docs_to_dir
    from protein_feature_engineering_ray.state.manifest import (
        bucket_dir,
        completed_buckets,
    )

    rng = np.random.default_rng(53)
    texts = [" ".join(f"w{rng.integers(0, 99)}" for _ in range(20))
             for _ in range(200)]
    df = pd.DataFrame({"doc_id": np.arange(200), "text": texts})

    def run(d):
        return embed_docs_to_dir(
            ray.data.from_pandas(df), d, num_buckets=6, dim=16
        )

    def read(d):
        import pyarrow.parquet as pq

        parts = [
            pq.read_table(os.path.join(d, n, "data.parquet")).to_pandas()
            for n in sorted(os.listdir(d)) if n.startswith("bucket=")
        ]
        return (
            pd.concat(parts).sort_values("doc_id").reset_index(drop=True)
        )

    clean = str(tmp_path / "clean")
    run(clean)
    want = read(clean)
    assert len(want) == 200

    part = str(tmp_path / "part")
    run(part)
    done = sorted(completed_buckets(part))
    for b in done[:2]:
        os.remove(os.path.join(bucket_dir(part, b), "_SUCCESS.json"))
    manifest2 = run(part)
    assert sorted(m["bucket"] for m in manifest2) == done[:2]
    got = read(part)
    pd.testing.assert_frame_equal(got, want)


def test_minhash_verify_modes_agree():
    """verify='joins' (low shuffle bytes) and verify='inband' (fewer
    barriers) must keep exactly the same documents."""
    from protein_feature_engineering_ray.stages.dedup import minhash_dedup

    rng = np.random.default_rng(61)
    words = [f"w{i}" for i in range(250)]
    texts = [" ".join(rng.choice(words, size=40)) for _ in range(50)]
    for i in range(8):
        src = texts[i].split()
        src[3] = "ALT"
        texts.append(" ".join(src))
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df)
    a = set(minhash_dedup(ds, threshold=0.5, num_buckets=8)
            .to_pandas()["doc_id"])
    b = set(minhash_dedup(ds, threshold=0.5, num_buckets=8, verify="inband")
            .to_pandas()["doc_id"])
    assert a == b
    assert len(a) == 50


def test_minhash_verify_ngram_matches_exact_ground_truth():
    """verify='ngram' survivors == a brute-force pandas oracle (all-pairs
    exact trigram Jaccard -> union-find -> min-id per component), given
    complete banding recall — the invariant the hard-gated neardup_dedup
    catalog row rides on.  Unknown verify mode refuses."""
    import pytest

    from protein_feature_engineering_ray.stages.dedup import (
        minhash_dedup,
        ngram_jaccard,
    )

    rng = np.random.default_rng(83)
    words = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(words, size=40)) for _ in range(40)]
    for i in range(10):  # near-dups at several distances + exact copies
        src = texts[i].split()
        for j in range(i % 3):
            src[5 + j] = f"ALT{j}"
        texts.append(" ".join(src))
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})

    thr = 0.7
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if ngram_jaccard(texts[i], texts[j]) >= thr:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    want = {i for i in range(len(texts)) if find(i) == i}

    got = set(
        minhash_dedup(ray.data.from_pandas(df), threshold=thr,
                      num_buckets=8, verify="ngram").to_pandas()["doc_id"]
    )
    assert got == want

    with pytest.raises(ValueError, match="verify"):
        minhash_dedup(ray.data.from_pandas(df), verify="nope")


def test_ngram_verify_pairs_string_ids():
    """Empty coarse buckets must emit blocks typed with the REAL id dtype:
    with string doc ids and more buckets than pairs, zero-pair buckets used
    to hardcode int64 and break block-schema unification."""
    from protein_feature_engineering_ray.stages.dedup import (
        ngram_verify_pairs,
    )

    docs = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["x y z w q", "x y z w q", "p q r s t", "u v"],
    })
    pairs = pd.DataFrame({"id_a": ["a"], "id_b": ["b"]})
    out = ngram_verify_pairs(
        ray.data.from_pandas(pairs), ray.data.from_pandas(docs),
        k=3, threshold=0.5, num_buckets=8,
    ).to_pandas()
    assert list(out["id_a"]) == ["a"] and list(out["id_b"]) == ["b"]
    assert out["jaccard"].iloc[0] == 1.0
    assert out["id_a"].dtype == object


def test_pairwise_ngram_jaccard_matches_reference_fn():
    """Vectorized hash-based trigram Jaccard == the per-pair exact helper,
    including short (<k words), empty and whitespace-only docs."""
    from protein_feature_engineering_ray.stages.dedup import (
        ngram_jaccard,
        pairwise_ngram_jaccard,
    )

    rng = np.random.default_rng(71)
    words = [f"w{i}" for i in range(60)]
    texts = [" ".join(rng.choice(words, size=int(n)))
             for n in rng.integers(0, 30, size=40)]
    texts += ["", "  ", "one", "two words", texts[0]]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = (
        pairwise_ngram_jaccard(ray.data.from_pandas(df), num_buckets=4)
        .to_pandas().sort_values("id_a").reset_index(drop=True)
    )
    assert len(out) == len(texts) - 1
    for _, r in out.iterrows():
        want = ngram_jaccard(texts[int(r.id_a)], texts[int(r.id_b)])
        assert r.jaccard == want, (r.id_a, r.id_b, r.jaccard, want)


def test_simhash64_vectorized_matches_per_doc_reference():
    from protein_feature_engineering_ray.stages.dedup import simhash64

    rng = np.random.default_rng(83)
    words = [f"w{i}" for i in range(80)]
    texts = [" ".join(rng.choice(words, size=int(n)))
             for n in rng.integers(0, 40, size=25)] + ["", "  ", "solo"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = (simhash64(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id")["simhash"].to_numpy())
    for i, t in enumerate(texts):
        ws = (t or "").split()
        if not ws:
            assert got[i] == 0
            continue
        h = pd.util.hash_array(np.asarray(ws, dtype=object)).astype(np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
                ).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        want = int(np.packbits((votes > 0).astype(np.uint8)[::-1]).view(">u8")[0])
        assert int(got[i]) == want, i


def test_simhash_dedup_guaranteed_recall():
    """Pairs within max_hamming bit flips MUST be caught (pigeonhole over
    the fingerprint bands); distant docs survive."""
    from protein_feature_engineering_ray.stages.dedup import (
        simhash64,
        simhash_dedup,
    )

    rng = np.random.default_rng(89)
    words = [f"w{i}" for i in range(400)]
    texts = [" ".join(rng.choice(words, size=60)) for _ in range(30)]
    # near-copies: change ONE word of a 60-word doc -> tiny fingerprint drift
    for i in range(6):
        src = texts[i].split()
        src[7] = "XX"
        texts.append(" ".join(src))
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df)
    fps = (simhash64(ds).to_pandas().sort_values("doc_id")["simhash"]
           .to_numpy().astype(np.uint64))

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    # choose the threshold from the actual drift so the test is deterministic
    drifts = [ham(fps[i], fps[30 + i]) for i in range(6)]
    thr = max(drifts)
    assert thr < 8  # one word in 60 moves few bits
    out = simhash_dedup(
        ray.data.from_pandas(df), max_hamming=thr, bands=thr + 1,
        num_buckets=8,
    ).to_pandas()
    kept = set(out["doc_id"])
    for i in range(6):
        assert (30 + i) not in kept or i not in kept  # one of the pair dropped
        assert (i in kept) or (30 + i in kept)
    # mutually-distant originals survive
    assert len(kept & set(range(6, 30))) == 24


def test_md5_lower64_matches_duckdb():
    """The md5-mode token hash is bit-identical to DuckDB md5_number_lower
    (lower 8 digest bytes, little-endian) — the bridge that makes the
    simhash_dedup catalog entry SQL-exact.  Tricky tokens: unicode,
    combining marks, long strings, punctuation."""
    import duckdb

    from protein_feature_engineering_ray.stages.dedup import _md5_lower64

    toks = np.asarray(
        ["hello", "héllo", "日本語", "a" * 300, "tab\ttok", "mixed123!@#",
         "ß", " nbsp", "é", "ABC", "abc"], dtype=object)
    got = _md5_lower64(toks)
    con = duckdb.connect()
    for t, g in zip(toks, got):
        want = con.execute("SELECT md5_number_lower(?)", [t]).fetchone()[0]
        assert int(g) == int(want), t


def test_simhash_md5_exact_mode_matches_bruteforce_components():
    """hash_fn='md5' + small_full=None (the oracle-gate configuration):
    survivors == min-id per connected component of the complete
    Hamming<=max_hamming graph, computed here by brute force over all
    pairs — the engine's banding/run/verify machinery must reproduce the
    mathematical definition exactly."""
    from protein_feature_engineering_ray.stages.dedup import (
        simhash64,
        simhash_dedup,
    )

    rng = np.random.default_rng(101)
    words = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(words, size=40)) for _ in range(40)]
    # near-copies (1-word edits), exact copies, and empty docs
    for i in range(8):
        src = texts[i].split()
        src[3] = "YY"
        texts.append(" ".join(src))
    texts += [texts[0], texts[1], "", "   "]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df)
    fps = (simhash64(ds, hash_fn="md5").to_pandas().sort_values("doc_id")
           ["simhash"].to_numpy().astype(np.uint64))
    max_hamming = 3
    n = len(fps)
    lab = np.arange(n)

    def find(i):
        while lab[i] != i:
            lab[i] = lab[lab[i]]
            i = lab[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if bin(int(fps[i]) ^ int(fps[j])).count("1") <= max_hamming:
                ri, rj = find(i), find(j)
                if ri != rj:
                    lab[max(ri, rj)] = min(ri, rj)
    want = sorted({find(i) for i in range(n)})
    out = simhash_dedup(
        ray.data.from_pandas(df), max_hamming=max_hamming, bands=4,
        num_buckets=8, hash_fn="md5", small_full=None,
    ).to_pandas()
    assert sorted(out["doc_id"]) == want


def test_bucket_join_randomized_vs_pandas_merge():
    """Randomized cross-check: every join mode equals the pandas-merge
    ground truth on random frames with duplicate keys, null-free int keys,
    and disjoint/overlapping key ranges."""
    rng = np.random.default_rng(97)
    for trial in range(3):
        nl, nr = int(rng.integers(0, 25)), int(rng.integers(0, 25))
        L = pd.DataFrame({
            "k": rng.integers(0, 12, size=nl),
            "x": rng.normal(size=nl),
        })
        R = pd.DataFrame({
            "id": rng.integers(0, 12, size=nr),
            "y": rng.normal(size=nr),
        })
        lds, rds = ray.data.from_pandas(L), ray.data.from_pandas(R)
        for how, ref in (
            ("inner", lambda: L.merge(R, left_on="k", right_on="id")
                .drop(columns="id")),
            ("left_outer", lambda: L.merge(R, left_on="k", right_on="id",
                                           how="left").drop(columns="id")),
            ("left_semi", lambda: L[L["k"].isin(R["id"])]),
            ("left_anti", lambda: L[~L["k"].isin(R["id"])]),
        ):
            got = bucket_join(lds, rds, on=["k"], right_on=["id"], how=how,
                              num_buckets=5).to_pandas()
            want = ref().reset_index(drop=True)
            if len(want) == 0:
                assert len(got) == 0, (trial, how)
                continue
            sort_cols = [c for c in got.columns]
            got = got.sort_values(sort_cols).reset_index(drop=True)
            want = (want[got.columns].sort_values(sort_cols)
                    .reset_index(drop=True))
            pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucket_join_null_keys_match_nothing():
    """SQL null-key semantics (round-3 ADVICE fix): a null join key matches
    nothing — inner drops both sides' null-key rows, left_outer keeps the
    left row unmatched, anti keeps it, semi drops it (pandas merge alone
    would have matched NaN keys to each other)."""
    import pandas as pd

    import ray.data

    from protein_feature_engineering_ray.core.joins import bucket_join

    left = ray.data.from_pandas(pd.DataFrame(
        {"k": ["a", None, "b"], "lv": [1, 2, 3]}
    ))
    right = ray.data.from_pandas(pd.DataFrame(
        {"k": ["a", None, "c"], "rv": [10, 20, 30]}
    ))

    inner = bucket_join(left, right, on=["k"], num_buckets=4).to_pandas()
    assert sorted(inner["lv"]) == [1]  # only the 'a' match; NOT null-null

    outer = bucket_join(
        left, right, on=["k"], how="left_outer", num_buckets=4
    ).to_pandas().sort_values("lv")
    assert list(outer["lv"]) == [1, 2, 3]
    null_row = outer[outer["lv"] == 2]
    assert null_row["rv"].isna().all()  # unmatched, not joined to null key

    semi = bucket_join(
        left, right, on=["k"], how="left_semi", num_buckets=4
    ).to_pandas()
    assert sorted(semi["lv"]) == [1]

    anti = bucket_join(
        left, right, on=["k"], how="left_anti", num_buckets=4
    ).to_pandas()
    assert sorted(anti["lv"]) == [2, 3]


def test_flag_join_membership_flags_one_exchange():
    """flag_join: every left row gains one int64 0/1 column per marker set
    in a single exchange — membership by key, null marker keys match
    nothing, left null keys flag 0, marker duplicates are harmless, empty
    marker sets flag all-0, string and multi-column keys work, and the
    result equals chaining left_outer joins (the pattern it replaces)."""
    import numpy as np
    import pandas as pd

    import ray.data

    from protein_feature_engineering_ray.core.joins import flag_join

    rng = np.random.default_rng(17)
    n = 300
    left = pd.DataFrame({
        "k": rng.integers(0, 120, n),
        "payload": rng.standard_normal(n),
    })
    left.loc[left.index[:5], "k"] = pd.NA
    left["k"] = left["k"].astype("Int64")
    a = pd.DataFrame({"k": rng.integers(0, 120, 40)})      # dups likely
    b = pd.DataFrame({"k": [1, 2, 3, None]})               # null marker key
    c = pd.DataFrame({"k": pd.array([], dtype="Int64")})   # empty set

    out = flag_join(
        ray.data.from_pandas(left).repartition(3),
        {"fa": ray.data.from_pandas(a),
         "fb": ray.data.from_pandas(b),
         "fc": ray.data.from_pandas(c)},
        on=["k"], num_buckets=4,
    ).to_pandas().sort_values(["k", "payload"]).reset_index(drop=True)

    assert list(out.columns) == ["k", "payload", "fa", "fb", "fc"]
    assert len(out) == n
    sa, sb = set(a.k.dropna()), set(b.k.dropna())
    for _, r in out.iterrows():
        if pd.isna(r.k):
            assert r.fa == 0 and r.fb == 0 and r.fc == 0
        else:
            assert r.fa == int(r.k in sa) and r.fb == int(r.k in sb)
        assert r.fc == 0

    # multi-column string+int keys
    left2 = pd.DataFrame({"s": ["x", "y", "x", "z"], "i": [1, 1, 2, 3],
                          "v": [10, 20, 30, 40]})
    m2 = pd.DataFrame({"s": ["x", "z"], "i": [2, 3]})
    got2 = flag_join(
        ray.data.from_pandas(left2), {"hit": ray.data.from_pandas(m2)},
        on=["s", "i"], num_buckets=4,
    ).to_pandas().sort_values("v").reset_index(drop=True)
    assert list(got2.hit) == [0, 0, 1, 1]

    # flag-name collision refuses EVEN when left_cols is omitted (the
    # schema-derived guard; a silent overwrite would lose the left column)
    import pytest

    with pytest.raises(AssertionError, match="collide"):
        flag_join(ray.data.from_pandas(left2),
                  {"v": ray.data.from_pandas(m2)}, on=["s", "i"],
                  num_buckets=4)

    # a marker carrying the null-canonicalization sentinel LITERALLY as a
    # string key must not match a left NULL key (validity-masked probe) —
    # but must match a left row whose string key really is that literal
    left3 = pd.DataFrame({"k": ["a", None, "\x00null"], "v": [1, 2, 3]})
    m3 = pd.DataFrame({"k": ["\x00null"]})
    got3 = flag_join(
        ray.data.from_pandas(left3), {"f": ray.data.from_pandas(m3)},
        on=["k"], num_buckets=4,
    ).to_pandas().sort_values("v").reset_index(drop=True)
    assert list(got3.f) == [0, 0, 1]


def test_bucket_join_randomized_vs_pandas_semantics():
    """Randomized armor for the engine's join primitive: for many random
    key/value frames (with null keys and disjoint/overlapping/duplicated
    keys), every mode of bucket_join equals the SQL-semantics reference
    (pandas merge computed on null-key-filtered right, left null keys as
    non-matching)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from protein_feature_engineering_ray.core.joins import bucket_join

    rng = np.random.default_rng(77)
    for trial in range(12):
        nl = int(rng.integers(0, 30))
        nr = int(rng.integers(0, 30))
        keyspace = ["a", "b", "c", "d", None]
        lk = [keyspace[i] for i in rng.integers(0, len(keyspace), nl)]
        rk = [keyspace[i] for i in rng.integers(0, len(keyspace), nr)]
        L = pd.DataFrame({"k": lk, "lv": np.arange(nl)})
        R = pd.DataFrame({"k": rk, "rv": np.arange(nr) * 10})
        lds = ray.data.from_pandas(L) if nl else ray.data.from_pandas(
            pd.DataFrame({"k": pd.Series([], dtype=object),
                          "lv": pd.Series([], dtype=np.int64)}))
        rds = ray.data.from_pandas(R) if nr else ray.data.from_pandas(
            pd.DataFrame({"k": pd.Series([], dtype=object),
                          "rv": pd.Series([], dtype=np.int64)}))

        Rnn = R[R["k"].notna()]
        for how, ref in (
            ("inner", lambda: L[L["k"].notna()].merge(Rnn, on="k")),
            ("left_outer", lambda: L.merge(
                Rnn, on="k", how="left") if nl else L),
            ("left_semi", lambda: L[L["k"].isin(set(Rnn["k"]))]),
            ("left_anti", lambda: L[~L["k"].isin(set(Rnn["k"]))]),
        ):
            # right_types makes the padding concretely typed — without it a
            # bucket with no right rows emits a null-typed rv column and the
            # raw to_pandas dtype depends on the block mix (documented)
            got = bucket_join(
                lds, rds, on=["k"], how=how, num_buckets=4,
                left_cols=["k", "lv"], right_cols=["k", "rv"],
                right_types=[pa.string(), pa.int64()],
            ).to_pandas()
            want = ref()
            cols = list(got.columns)
            g = got.sort_values(cols).reset_index(drop=True)
            w = want[cols].sort_values(cols).reset_index(drop=True) if len(
                want) else want.reindex(columns=cols)
            assert len(g) == len(w), (trial, how)
            if len(g):
                for c in cols:
                    a = g[c].astype(str).fillna("~")
                    b = w[c].astype(str).fillna("~")
                    assert a.equals(b), (trial, how, c)


def test_simhash_dedup_merges_exact_copies_in_collided_groups():
    """Regression (round-3 scale check): 16-bit simhash band keys collide
    across dissimilar texts, and an id-sorted chain interleaved dissimilar
    members so EXACT duplicates failed to merge.  Fingerprint-sorted chains
    must collapse every replica set regardless of group collisions."""
    import ray.data

    from protein_feature_engineering_ray.stages.dedup import simhash_dedup

    rng = np.random.default_rng(19)
    words = [f"w{i}" for i in range(200)]
    texts = [
        " ".join(rng.choice(words, size=30)) for _ in range(400)
    ]
    rows = []
    for rep in range(5):  # 5 exact copies of each text, interleaved ids
        for i, t in enumerate(texts):
            rows.append({"doc_id": rep + i * 10, "text": t})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)
    kept = simhash_dedup(
        ds, max_hamming=3, bands=4, num_buckets=8
    ).to_pandas()
    # every replica set must collapse to exactly one survivor (possibly
    # fewer if two DISTINCT texts are genuine near-dups)
    assert len(kept) <= 400
    # and each surviving doc is the min id of its replica set unless merged
    # into another text's cluster: at minimum, no replica pair survives
    tid = kept["doc_id"].to_numpy() // 10
    assert len(np.unique(tid)) == len(tid), "replica pair survived dedup"


def test_minhash_dedup_replication_invariant():
    """Exact-copy replication must change NEITHER the survivor component
    structure NOR the asymptotics: digest runs collapse signature-identical
    members, so a group's all-pairs budget counts DISTINCT signatures.
    Before the run-collapse fix, 8 copies pushed mixed band groups past
    small_full and non-adjacent distinct texts lost their pair in every
    band (one extra survivor at K=8 on the sf corpus), while the inflated
    edge list crossed the local-CC threshold (45x wall)."""
    from protein_feature_engineering_ray.stages.dedup import minhash_dedup

    rng = np.random.default_rng(97)
    words = [f"w{i}" for i in range(250)]
    texts = [" ".join(rng.choice(words, size=40)) for _ in range(30)]
    for i in range(6):  # near-dups so components are non-trivial
        src = texts[i].split()
        src[3] = "ALT"
        texts.append(" ".join(src))
    base = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})

    def survivors(df):
        kept = minhash_dedup(
            ray.data.from_pandas(df), threshold=0.5, num_buckets=8
        ).to_pandas()
        return set(kept["doc_id"] % 1_000_000)

    want = survivors(base)
    for k in (4, 12, 24):  # 24 copies x2 texts >> small_full member count
        rep = pd.concat(
            [base.assign(doc_id=base["doc_id"] + r * 1_000_000)
             for r in range(k)], ignore_index=True)
        got = survivors(rep)
        # every replicated copy of a survivor's text collapses to the one
        # min-id representative: survivor set mod the replica offset must
        # equal the base survivor set exactly
        assert got == want, (k, sorted(got ^ want))


def test_ivf_store_search_matches_ivf_knn_and_prunes_files(tmp_path):
    """ivf_build + ivf_search: identical neighbors to ivf_knn with the same
    deterministic centroids, while reading ONLY the probed cells' files
    (the IO-side IVF — the in-stream form scans every block)."""
    import glob
    import os

    from protein_feature_engineering_ray.stages.similarity import (
        ivf_build,
        ivf_knn,
        ivf_probe_files,
        ivf_search,
    )

    rng = np.random.default_rng(41)
    centers = rng.normal(size=(8, 16)) * 4
    X = np.concatenate([c + rng.normal(size=(400, 16)) for c in centers])
    ids = np.arange(len(X))
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    corpus = ray.data.from_pandas(df).repartition(8)
    Q, qids = X[:5], ids[:5]

    store = str(tmp_path / "ivf")
    manifest = ivf_build(corpus, store, n_centroids=8, sample_limit=1024)
    assert sum(m["rows"] for m in manifest) == len(X)

    got = ivf_search(store, Q, qids, k=7, n_probe=2).sort_values(
        ["query_id", "nbr_id"]).reset_index(drop=True)
    want = ivf_knn(corpus, Q, qids, k=7, n_centroids=8, n_probe=2,
                   sample_limit=1024).sort_values(
        ["query_id", "nbr_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    files, _, _ = ivf_probe_files(store, Q, n_probe=2)
    total = glob.glob(os.path.join(store, "bucket=*", "*.parquet"))
    assert 0 < len(files) < len(total), (len(files), len(total))

    # resume: wipe two cells' commits; rebuild recomputes exactly those
    from protein_feature_engineering_ray.state.manifest import (
        bucket_dir,
        completed_buckets,
    )

    done = sorted(completed_buckets(store))
    for b in done[:2]:
        os.remove(os.path.join(bucket_dir(store, b), "_SUCCESS.json"))
    manifest2 = ivf_build(corpus, store, n_centroids=8, sample_limit=1024)
    assert sorted(m["bucket"] for m in manifest2) == done[:2]
    got2 = ivf_search(store, Q, qids, k=7, n_probe=2).sort_values(
        ["query_id", "nbr_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want)
