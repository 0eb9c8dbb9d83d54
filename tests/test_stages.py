"""Stage tests: sessionization, as-of join (+ temporal-leakage probe,
SURVEY.md §5.2), frames, normalization."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from protein_feature_engineering_ray.schema import Alphabet
from protein_feature_engineering_ray.sources import (
    synth_feature_timeline,
    synth_transcripts,
)
from protein_feature_engineering_ray.stages.asof import asof_join
from protein_feature_engineering_ray.stages.normalize import minmax, zscore
from protein_feature_engineering_ray.stages.sessionize import frame_features, sessionize

ALPHA = Alphabet(letters=("assistant", "system", "tool", "user"))
GAP = 1800.0


@pytest.fixture(scope="module")
def corpus():
    return (
        synth_transcripts(n_convs=24, duplicates=False),
        synth_transcripts(n_convs=24, duplicates=False, as_pandas=True),
    )


def oracle_sessions(pdf: pd.DataFrame, gap_s: float) -> pd.DataFrame:
    out = []
    for cid, g in pdf.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        sid, prev = 0, None
        for _, row in g.iterrows():
            if prev is not None and (row["ts"] - prev).total_seconds() > gap_s:
                sid += 1
            out.append({"conv_id": cid, "turn_idx": row["turn_idx"], "session_idx": sid})
            prev = row["ts"]
    return pd.DataFrame(out)


def test_sessionize(corpus):
    ds, pdf = corpus
    got = (
        sessionize(ds, gap_seconds=GAP, num_buckets=6)
        .to_pandas()[["conv_id", "turn_idx", "session_idx"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = oracle_sessions(pdf, GAP).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False
    )
    # the synth corpus is built to contain real session breaks
    assert got["session_idx"].max() >= 1


def test_frame_features(corpus):
    ds, pdf = corpus
    got = frame_features(ds, stride=8, alphabet=ALPHA, num_buckets=6).to_pandas()
    pdf2 = pdf.sort_values(["conv_id", "turn_idx"]).copy()
    pdf2["frame_idx"] = pdf2["turn_idx"] // 8
    want = (
        pdf2.groupby(["conv_id", "frame_idx"])
        .agg(
            n_turns=("turn_idx", "size"),
            frame_user=("role", lambda s: int((s == "user").sum())),
        )
        .reset_index()
    )
    m = got.merge(want, on=["conv_id", "frame_idx"], suffixes=("", "_o"))
    assert len(m) == len(want) == len(got)
    assert (m["n_turns"] == m["n_turns_o"]).all()
    assert (m["frame_user"] == m["frame_user_o"]).all()
    # frame bounds ordered
    assert (m["ts_first"] <= m["ts_last"]).all()


def oracle_asof(pdf: pd.DataFrame, tl: pd.DataFrame) -> pd.DataFrame:
    rows = []
    tl = tl.sort_values(["feat_ts", "feat_b"], kind="mergesort")
    for _, r in pdf.iterrows():
        cand = tl[(tl["conv_id"] == r["conv_id"]) & (tl["feat_ts"] <= r["ts"])]
        rows.append(
            {
                "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"],
                "feat_a": cand["feat_a"].iloc[-1] if len(cand) else np.nan,
                "feat_b": float(cand["feat_b"].iloc[-1]) if len(cand) else np.nan,
            }
        )
    return pd.DataFrame(rows)


def test_asof_join(corpus):
    ds, pdf = corpus
    tl = synth_feature_timeline(n_convs=24)
    tldf = synth_feature_timeline(n_convs=24, as_pandas=True)
    got = (
        asof_join(ds, tl, ["feat_a", "feat_b"], num_buckets=6, tiebreak="feat_b")
        .to_pandas()[["conv_id", "turn_idx", "feat_a", "feat_b"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        oracle_asof(pdf, tldf)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    for c in ("feat_a", "feat_b"):
        np.testing.assert_allclose(got[c], want[c], rtol=1e-12, err_msg=c)
    # null-match path exercised: convs without timeline rows -> NaN
    assert got["feat_a"].isna().any()


def test_asof_leakage_probe(corpus):
    """Perturb every timeline row with feat_ts > cutoff; features at turns
    with ts <= cutoff must be BIT-identical (north-star leakage gate)."""
    ds, pdf = corpus
    tldf = synth_feature_timeline(n_convs=24, as_pandas=True)
    cutoff = pdf["ts"].quantile(0.5)

    base = (
        asof_join(ds, ray.data.from_pandas(tldf), ["feat_a", "feat_b"],
                  num_buckets=6, tiebreak="feat_b")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    evil = tldf.copy()
    fut = evil["feat_ts"] > cutoff
    assert fut.any()
    evil.loc[fut, "feat_a"] = 1e9
    evil.loc[fut, "feat_b"] = -1
    pert = (
        asof_join(ds, ray.data.from_pandas(evil), ["feat_a", "feat_b"],
                  num_buckets=6, tiebreak="feat_b")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    past = base["ts"] <= cutoff
    for c in ("feat_a", "feat_b"):
        a = base.loc[past, c].to_numpy()
        b = pert.loc[past, c].to_numpy()
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), f"temporal leakage in {c}"


def test_per_turn_text_equality(corpus):
    """North-star gate: per-turn ``text`` byte-equality under stable
    (conv_id, turn_idx) ordering, through the full co-location exchange."""
    from protein_feature_engineering_ray.core.bucket import grouped_buckets

    ds, pdf = corpus
    got = (
        grouped_buckets(ds, lambda t: t, num_buckets=6)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    assert (got["text"].to_numpy() == want["text"].to_numpy()).all()
    assert (got["conv_id"] == want["conv_id"]).all()
    assert (got["turn_idx"].to_numpy() == want["turn_idx"].to_numpy()).all()


def test_zscore(corpus):
    ds, _ = corpus
    from protein_feature_engineering_ray.core.executor import conv_features
    from protein_feature_engineering_ray.functions.registry import make_kernel

    feats = conv_features(ds, [make_kernel("AAC", ALPHA)[1]], alphabet=ALPHA,
                          num_buckets=6)
    cols = [f"aac_{s}" for s in ALPHA.letters]
    z = zscore(feats, cols).to_pandas()
    raw = feats.to_pandas()
    for c in cols:
        x = raw[c].to_numpy()
        want = (x - x.mean()) / x.std() if x.std() > 0 else np.zeros_like(x)
        got = z.sort_values("conv_id")[c].to_numpy()
        np.testing.assert_allclose(
            np.sort(got), np.sort(want), rtol=1e-9, atol=1e-12
        )
        assert abs(got.mean()) < 1e-9


def test_zscore_large_offset_no_cancellation():
    """|mean| >> std: the raw E[x^2]-mean^2 variance form loses all
    significant bits (std -> 0 or NaN); the centered Chan combine must
    recover unit-variance output."""
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(5)
    x = 1e9 + rng.normal(0.0, 1e-3, 4000)  # mean/std ratio 1e12
    ds = ray.data.from_pandas(
        pd.DataFrame({"conv_id": [f"c{i}" for i in range(len(x))], "v": x})
    ).repartition(8)
    z = zscore(ds, ["v"]).to_pandas()["v"].to_numpy()
    assert np.isfinite(z).all()
    assert abs(z.std() - 1.0) < 1e-3, z.std()
    # x ~ 1e9 has ~1e-7 ulp; (x-mean)/std amplifies that to ~1e-4 per
    # element — inherent to the input representation, not the combine.
    assert abs(z.mean()) < 1e-4


def test_minmax(corpus):
    ds, _ = corpus
    from protein_feature_engineering_ray.core.executor import turn_features
    from protein_feature_engineering_ray.functions.registry import make_kernel

    feats = turn_features(ds, [make_kernel("Latency", ALPHA)[1]], alphabet=ALPHA,
                          num_buckets=6)
    mm = minmax(feats, ["latency_sec"]).to_pandas()
    x = mm["latency_sec"].to_numpy()
    assert np.nanmin(x) >= 0 and np.nanmax(x) <= 1
    assert not np.isnan(x).any()  # NaNs replaced by scaled mean


def test_text_quality_and_langid_match_row_reference():
    """Vectorized Arrow/numpy text stages must equal a per-row Python
    reference on boundary cases (empty, null, CJK, unicode, repeated words,
    leading/trailing separators)."""
    import re

    from protein_feature_engineering_ray.stages.text import (
        _STOPWORDS,
        lang_id,
        text_quality,
    )

    texts = [
        "the quick brown fox, the lazy dog!",
        "",
        None,
        "   spaced   out   the the THE   ",
        "der die das und ist ein zu den",
        "这是一个中文句子 with some english words mixed in",
        "it's a test_case with 'quotes' and numbers 123",
        "no-stop-words here just hyphens...",
        "¿dónde está el baño? el el la la",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        lang_id(text_quality(ray.data.from_pandas(df), concurrency=2),
                concurrency=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    word_re = re.compile(r"[A-Za-z0-9_']+")
    punct_re = re.compile(r"[.,;:!?]")
    stop_en = _STOPWORDS["en"]
    for i, t in enumerate(texts):
        t = t or ""
        ws = word_re.findall(t)
        nw = len(ws)
        assert out.loc[i, "n_chars"] == len(t)
        assert out.loc[i, "n_words"] == nw
        np.testing.assert_allclose(
            out.loc[i, "avg_word_len"],
            float(np.mean([len(w) for w in ws])) if ws else 0.0,
        )
        np.testing.assert_allclose(
            out.loc[i, "punct_ratio"],
            len(punct_re.findall(t)) / max(len(t), 1),
        )
        np.testing.assert_allclose(
            out.loc[i, "stopword_ratio"],
            sum(1 for w in ws if w.lower() in stop_en) / max(nw, 1),
        )
        np.testing.assert_allclose(
            out.loc[i, "uniq_word_ratio"],
            len({w.lower() for w in ws}) / max(nw, 1),
        )
        # per-row language reference (the round-1 actor's exact rule)
        if not t:
            expect = "und"
        else:
            cjk = sum(1 for ch in t if "一" <= ch <= "鿿")
            if cjk / max(len(t), 1) > 0.05:
                expect = "zh"
            else:
                words = set(t.lower().split())
                scores = {
                    lang: len(words & prof)
                    for lang, prof in _STOPWORDS.items()
                }
                best = max(scores, key=scores.get)
                expect = best if scores[best] > 0 else "und"
        assert out.loc[i, "lang_pred"] == expect, (i, t)


class _FakeCheckpointModel:
    """Torch-like shim exercising the EmbedActor plug-in contract: a
    'loaded checkpoint' with its own tokenizer, truncation, and pooled
    forward pass — asserts the budget discipline a GPU kernel relies on."""

    def __init__(self, dim=16, truncation=8, toks_per_batch=64):
        self.dim = dim
        self.truncation = truncation
        self._budget = toks_per_batch
        # 'weights': deterministic per-charcode rows, fp16 like a real
        # inference checkpoint (cast up in the forward pass)
        self.W = (np.arange(dim, dtype=np.float16) + 1.0)

    def token_lengths(self, texts):
        return np.minimum(
            [len((t or "").split()) for t in texts], self.truncation
        ).astype(np.int64)

    def encode(self, texts):
        lens = self.token_lengths(np.asarray(texts, dtype=object))
        # the micro-batcher must never exceed the budget with >1 sequence
        assert len(texts) == 1 or int((lens + 1).sum()) <= self._budget, (
            "token budget violated"
        )
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            toks = (t or "").split()[: self.truncation]
            out[i] = len(toks) * self.W.astype(np.float32)
        return out


def _fake_factory():
    return _FakeCheckpointModel()


def test_embed_actor_pluggable_model():
    """A custom model_factory drops into EmbedActor: built once per actor,
    token budget respected, output schema unchanged
    (FixedSizeList<float32>[model.dim] + n_model_tokens)."""
    import pyarrow as pa

    from protein_feature_engineering_ray.stages.embed import embed_docs

    texts = [" ".join(["w"] * n) for n in [0, 1, 3, 5, 8, 12, 40, 7, 2, 9]]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ).repartition(2)
    out = embed_docs(
        ds, concurrency=1, batch_size=4, toks_per_batch=64,
        model_factory=_fake_factory,
    )
    got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # schema: dim comes from the MODEL (16), not the default dim arg (64)
    assert len(got["embedding"][1]) == 16
    # truncation clamps n_model_tokens at the model's own limit (8)
    want_lens = np.minimum([len(t.split()) for t in texts], 8)
    np.testing.assert_array_equal(got["n_model_tokens"].to_numpy(), want_lens)
    # deterministic forward pass: embedding[0] == n_toks * 1.0
    emb0 = np.stack(got["embedding"].to_numpy())[:, 0]
    np.testing.assert_allclose(emb0, want_lens.astype(np.float32))


def test_media_resize_and_frame_sample_plumbing():
    """Multimodal plumbing beyond feature-extract: resize updates metadata
    and shrinks payloads deterministically; frame_sample fans one row into
    n_frames rows with a stable schema (decode itself stays the documented
    stub)."""
    from protein_feature_engineering_ray.stages.multimodal import (
        frame_sample,
        media_features,
        media_resize,
        synth_media,
    )

    ds = synth_media(n=16, payload_bytes=512)
    resized = media_resize(ds, out_w=8, out_h=8, concurrency=1).to_pandas()
    assert (resized["width"] == 8).all() and (resized["height"] == 8).all()
    orig = ds.to_pandas()
    assert (
        resized.sort_values("media_id")["payload"].str.len().to_numpy()
        <= orig.sort_values("media_id")["payload"].str.len().to_numpy()
    ).all()
    # resized payloads still feed the feature stage (chained pipeline)
    feats = media_features(
        media_resize(ds, out_w=8, out_h=8, concurrency=1), concurrency=1
    ).to_pandas()
    assert len(feats) == 16 and len(feats["media_vec"][0]) == 8

    frames = frame_sample(ds, n_frames=4, concurrency=1).to_pandas()
    assert len(frames) == 16 * 4
    assert set(frames["frame_idx"]) == {0, 1, 2, 3}
    per = frames.groupby("media_id").size()
    assert (per == 4).all()
    # determinism
    frames2 = frame_sample(ds, n_frames=4, concurrency=1).to_pandas()
    a = frames.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    b = frames2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    assert (a["frame"] == b["frame"]).all()


def test_winnow_fingerprints_vs_reference():
    """Winnowing fingerprints equal a pure-python reference (per-doc k-gram
    rolling hash -> sliding-window min -> set), including the short-doc
    fallback, and give the guaranteed-match property: docs sharing a
    >= k+window-1-token substring share at least one fingerprint."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from protein_feature_engineering_ray.stages.text import winnow_fingerprints

    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens >= k+w-1
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            f"one two three {shared} four five",
            f"xx yy {shared} zz",
            "completely different words here entirely now",
            "tiny doc",                      # < k tokens -> no fingerprints
            "just four small tokens",        # k <= tokens < k+w-1 -> fallback
            "",                               # empty
        ],
    })
    ds = ray.data.from_pandas(docs)
    out = winnow_fingerprints(ds, k=k, window=w).to_pandas()

    def ref_fps(text):
        toks = [t for t in text.lower().split() if t]
        if len(toks) < k:
            return set()
        h = pd.util.hash_array(np.asarray(toks, dtype=object)).astype(np.uint64)
        B = np.uint64(1099511628211)
        grams = []
        with np.errstate(over="ignore"):
            for i in range(len(h) - k + 1):
                g = np.uint64(0)
                for j in range(k):
                    g = g * B + h[i + j]
                grams.append(g)
        if len(grams) < w:
            return {min(grams)}
        return {min(grams[i:i + w]) for i in range(len(grams) - w + 1)}

    for did, text in zip(docs["doc_id"], docs["text"]):
        got = set(out[out["doc_id"] == did]["fingerprint"])
        assert got == ref_fps(text), did

    # guaranteed-match property across docs 0 and 1
    f0 = set(out[out["doc_id"] == 0]["fingerprint"])
    f1 = set(out[out["doc_id"] == 1]["fingerprint"])
    f2 = set(out[out["doc_id"] == 2]["fingerprint"])
    assert f0 & f1, "shared substring must share a fingerprint"
    assert not (f0 & f2)


def test_winnow_matches_pairs_and_counts():
    """winnow_matches finds the doc pairs sharing >= min_shared fingerprints
    with exact shared counts (vs the per-doc fingerprint sets), orients
    id_a < id_b, and excludes unrelated docs."""
    import numpy as np
    import pandas as pd

    import ray.data

    from protein_feature_engineering_ray.stages.text import (
        winnow_fingerprints,
        winnow_matches,
    )

    body = "the quick brown fox jumps over the lazy dog again and again today"
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            f"intro words {body} outro",
            f"{body} trailing stuff here",
            "unrelated content entirely different from everything else now",
            f"prefix {body}",
        ],
    })
    ds = ray.data.from_pandas(docs)
    k, w = 3, 4
    got = winnow_matches(ds, k=k, window=w, min_shared=2,
                         num_buckets=8).to_pandas()
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    fps = winnow_fingerprints(ds, k=k, window=w).to_pandas()
    sets = {d: set(g["fingerprint"]) for d, g in fps.groupby("doc_id")}
    want = []
    for a in range(4):
        for b in range(a + 1, 4):
            n = len(sets.get(a, set()) & sets.get(b, set()))
            if n >= 2:
                want.append((a, b, n))
    want = pd.DataFrame(want, columns=["id_a", "id_b", "n_shared"])
    assert len(got) == len(want) and len(want) >= 3  # 0-1, 0-3, 1-3 at least
    for (_, g), (_, w_) in zip(got.iterrows(), want.iterrows()):
        assert (g["id_a"], g["id_b"], g["n_shared"]) == (
            w_["id_a"], w_["id_b"], w_["n_shared"])
    assert not ((got["id_a"] == 2) | (got["id_b"] == 2)).any()

    # id dtype is preserved: the same corpus with STRING doc ids
    sdocs = docs.assign(doc_id=docs["doc_id"].map(lambda i: f"doc{i}"))
    sgot = winnow_matches(ray.data.from_pandas(sdocs), k=k, window=w,
                          min_shared=2, num_buckets=8).to_pandas()
    assert sgot["id_a"].map(type).eq(str).all()
    assert len(sgot) == len(got)


def test_text_stages_adversarial_unicode():
    """Quality/lang-ID/token/fingerprint stages over adversarial text: CJK,
    emoji, combining marks, a 1MB single token, null bytes in-python
    strings, and whitespace-only docs — no crashes, sane invariants."""
    import numpy as np
    import pandas as pd

    import ray.data

    from protein_feature_engineering_ray.stages.text import (
        text_profile,
        token_count,
        winnow_fingerprints,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "你好世界 这是中文文本 完全没有空格的长句子也要处理",
            "emoji 🎉🎊 mixed with ASCII and ümlaut über naïve café",
            "a" * (1 << 20),                 # one 1MB token
            "   \t\n  ",                     # whitespace only
            "éé combining acute repeated",  # combining marks
            "the quick brown fox " * 50,     # high repetition
        ],
    })
    ds = ray.data.from_pandas(docs)
    prof = text_profile(ds, concurrency=1).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert prof["lang_pred"].iloc[0] == "zh"
    assert (prof["n_words"] >= 0).all()
    assert (prof["uniq_word_ratio"] <= 1.0 + 1e-9).all()
    assert prof["n_chars"].iloc[2] == (1 << 20)
    assert prof["n_words"].iloc[3] == 0

    tc = token_count(ds).to_pandas().sort_values("doc_id")
    assert (tc["n_tokens"] >= 0).all()

    fp = winnow_fingerprints(ds, k=3, window=4).to_pandas()
    # repetition-heavy doc still fingerprints; whitespace-only emits none
    assert (fp["doc_id"] == 5).any()
    assert not (fp["doc_id"] == 3).any()


def test_winnow_matches_drop_stats_and_empty_dtype():
    """The hot-fingerprint cap is LOUD (WinnowDropStats tallies dropped
    fingerprints / doc slots) and a zero-match corpus keeps the probed id
    dtype in its empty result (was a documented int64 caveat)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from protein_feature_engineering_ray.stages.text import (
        WinnowDropStats,
        winnow_matches,
    )

    # boilerplate-heavy corpus: 10 docs share one body -> with max_group=4
    # every shared fingerprint is hot and gets dropped (no pairs survive)
    body = "common boilerplate sentence shared across every document here"
    docs = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": [body] * 10,
    })
    stats = WinnowDropStats()
    got = winnow_matches(ray.data.from_pandas(docs), k=3, window=4,
                         min_shared=1, num_buckets=8, max_group=4,
                         drop_stats=stats).to_pandas()
    assert len(got) == 0  # every fingerprint was hot
    v = stats.value()
    assert v["dropped_fingerprints"] >= 1
    assert v["dropped_doc_slots"] >= 10 * 1  # each hot fp covered 10 docs
    # clean corpus: the counter stays zero
    clean = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["totally distinct alpha beta gamma delta words one",
                 "another unrelated epsilon zeta eta theta body two"],
    })
    stats2 = WinnowDropStats()
    winnow_matches(ray.data.from_pandas(clean), k=3, window=4, min_shared=1,
                   num_buckets=8, max_group=4, drop_stats=stats2).to_pandas()
    assert stats2.value() == {"dropped_fingerprints": 0,
                              "dropped_doc_slots": 0}

    # zero-match STRING-id corpus: empty result mirrors the string schema
    sdocs = clean.assign(doc_id=clean["doc_id"].map(lambda i: f"doc{i}"))
    out = winnow_matches(ray.data.from_pandas(sdocs), k=3, window=4,
                         min_shared=99, num_buckets=8).materialize()
    assert out.count() == 0
    sch = out.schema()
    t = sch.types[sch.names.index("id_a")]
    assert isinstance(t, pa.DataType) and pa.types.is_string(t), t


def test_group_pair_indices_small_full():
    """Small groups emit ALL i<j pairs, large groups chain; mixed layouts
    stay group-local and fully cover the small groups."""
    import numpy as np

    from protein_feature_engineering_ray.stages.dedup import _group_pair_indices

    # one small group of 3: all 3 pairs
    ai, bi = _group_pair_indices(np.array([3]), small_full=16)
    assert sorted(zip(ai.tolist(), bi.tolist())) == [(0, 1), (0, 2), (1, 2)]
    # same group above the threshold: chain only
    ai, bi = _group_pair_indices(np.array([3]), small_full=2)
    assert sorted(zip(ai.tolist(), bi.tolist())) == [(0, 1), (1, 2)]
    # mixed: [2 small, 4 large, 3 small] with small_full=3
    ai, bi = _group_pair_indices(np.array([2, 4, 3]), small_full=3)
    got = sorted(zip(ai.tolist(), bi.tolist()))
    want = sorted(
        [(0, 1)]                                  # group 0 all-pairs
        + [(2, 3), (3, 4), (4, 5)]                # group 1 chain
        + [(6, 7), (6, 8), (7, 8)]                # group 2 all-pairs
    )
    assert got == want
    # empty and singleton groups emit nothing
    ai, bi = _group_pair_indices(np.array([1, 1]), small_full=4)
    assert len(ai) == 0 and len(bi) == 0
    # no pair ever crosses a group boundary (random sizes)
    rng = np.random.default_rng(7)
    sz = rng.integers(1, 9, 20)
    ai, bi = _group_pair_indices(sz, small_full=4)
    grp = np.repeat(np.arange(len(sz)), sz)
    assert (grp[ai] == grp[bi]).all() and (ai < bi).all()


def test_media_decode_factory_plugin():
    """The decode plug-in contract: a picklable zero-arg factory loads once
    per actor and its decode(payload, mime) array feeds the shared feature
    math — what a PIL/cv2 user supplies where those libs exist."""
    import numpy as np

    from protein_feature_engineering_ray.stages.multimodal import (
        media_features,
        synth_media,
    )

    def numpy_decode_factory():
        # stand-in for e.g. PIL.Image.open(io.BytesIO(payload)) -> np.array
        def decode(payload: bytes, mime: str) -> np.ndarray:
            a = np.frombuffer(payload or b"\x00", dtype=np.uint8)
            return a.reshape(-1, 1).astype(np.float32) * 2.0
        return decode

    ds = synth_media(n=16)
    out = media_features(ds, decode_factory=numpy_decode_factory).to_pandas()
    base = media_features(synth_media(n=16)).to_pandas()
    assert len(out) == 16 and len(base) == 16
    m = out.merge(base, on="media_id", suffixes=("_dec", "_fake"))
    a = np.stack(m["media_vec_dec"].to_numpy())
    b = np.stack(m["media_vec_fake"].to_numpy())
    # decode path = 2x the byte moments (the factory's transform is real)
    np.testing.assert_allclose(a, 2.0 * b, rtol=1e-12)


def test_repetition_and_scrub_match_oracle_on_dirty_text():
    """The driver's documents table has no newlines, URLs or emails, so its
    gate exercises the zero paths of repetition_profile / scrub_profile.
    This corpus hits the real ones — duplicate lines, a dominant 2-gram,
    duplicated 5-grams, emails inside URLs, phone runs, nulls, unicode —
    and must match the SAME SQL oracle strings the driver runs (DuckDB view
    over the crafted frame)."""
    import duckdb

    from protein_feature_engineering_ray.pipelines.queries import (
        _sql_repetition,
        _sql_scrub,
    )
    from protein_feature_engineering_ray.stages.text import (
        repetition_profile,
        scrub_profile,
    )

    oracles = {"repetition_profile": _sql_repetition(),
               "scrub_profile": _sql_scrub()}

    texts = [
        "a b a b a b a b c d e f g h c d e f g h",   # top 2-gram + dup 5-gram
        "line one\nline two\nline one\n\nline two\nline three",
        "mail me at jo.doe+x@example.co.uk or http://ex.com/a?u=a@b.cc ok",
        "call +1 (555) 123-4567 or 555 123 4567 now",
        "",
        None,
        "   \n\n   ",                                  # whitespace-only
        "单 词 单 词 单 词 单 词 单 词",                  # unicode tokens repeat
        "https://x.io/p#f https://x.io/p#f duplicated url line\n"
        "https://x.io/p#f https://x.io/p#f duplicated url line",
        "one two three four five six seven eight nine ten",  # all-distinct
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    ds = ray.data.from_pandas(df).repartition(3)  # batch-composition proof

    con = duckdb.connect()
    con.register("documents", df)

    for name, stage in (("repetition_profile", repetition_profile),
                        ("scrub_profile", scrub_profile)):
        got = (stage(ds).to_pandas().drop(columns=["text"])
               .sort_values("doc_id").reset_index(drop=True))
        want = (con.execute(oracles[name]).df()
                .sort_values("doc_id").reset_index(drop=True))
        got, want = got[sorted(got.columns)], want[sorted(want.columns)]
        assert list(got.columns) == list(want.columns), name
        for c in got.columns:
            if got[c].dtype.kind == "f":
                np.testing.assert_array_equal(
                    got[c].to_numpy(), want[c].to_numpy(), err_msg=f"{name}:{c}")
            else:
                assert got[c].astype(str).equals(want[c].astype(str)), (name, c)

    # spot-check the scrub semantics on the crafted rows
    s = scrub_profile(ds).to_pandas().set_index("doc_id")
    assert s.loc[2, "n_emails"] == 2 and s.loc[2, "n_urls"] == 1
    assert "<EMAIL>" in s.loc[2, "scrubbed"]
    assert s.loc[3, "n_phones"] >= 1 and "<PHONE>" in s.loc[3, "scrubbed"]
    r = repetition_profile(ds).to_pandas().set_index("doc_id")
    assert r.loc[1, "dup_line_frac"] > 0
    assert r.loc[0, "top_2gram_frac"] == 4 / 19  # "a b" 4x of 19 2-grams
    assert r.loc[0, "dup_5gram_frac"] > 0
    assert r.loc[9, "dup_5gram_frac"] == 0.0
    assert r.loc[4, "n_words"] == 0 and r.loc[5, "n_words"] == 0


def test_line_dedup_matches_sql_oracle_and_is_partition_invariant():
    """line_dedup (cross-document line-level exact dedup): the rebuilt
    text, per-doc line counts and removal counts must equal the DuckDB
    first-occurrence oracle (global (doc_id, line_idx) order), including
    trailing newlines, empty documents, intra-document duplicates and
    non-participating short lines; the result must not depend on input
    partitioning, and string doc ids must ride through."""
    import duckdb

    from protein_feature_engineering_ray.stages.dedup import line_dedup

    rng = np.random.default_rng(7)
    vocab = ["lorem ipsum", "dolor sit", "amet", "consectetur adipiscing",
             "sed do", "eiusmod", "tempor incididunt", ""]
    texts = ["\n".join(rng.choice(vocab, rng.integers(0, 6)))
             for _ in range(120)]
    texts += ["", "solo\n", "\n\n", "lorem ipsum"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})

    oracle = """
WITH l AS (
  SELECT doc_id,
         unnest(string_split(coalesce(text,''), chr(10))) AS ln,
         generate_subscripts(string_split(coalesce(text,''), chr(10)), 1)
           AS li
  FROM documents),
 p AS (SELECT doc_id, ln, li,
         row_number() OVER (PARTITION BY ln ORDER BY doc_id, li) AS rn
       FROM l WHERE length(ln) >= 1),
 keepers AS (
   SELECT doc_id, li, ln FROM l WHERE length(ln) < 1
   UNION ALL SELECT doc_id, li, ln FROM p WHERE rn = 1),
 agg AS (SELECT doc_id, string_agg(ln, chr(10) ORDER BY li) AS text,
                count(*) AS n_lines_kept FROM keepers GROUP BY doc_id),
 tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id),
 rem AS (SELECT doc_id, count(*) AS n_dup_lines_removed FROM p
         WHERE rn > 1 GROUP BY doc_id)
SELECT t.doc_id, coalesce(a.text, '') AS text, t.n_lines,
       coalesce(a.n_lines_kept, 0) AS n_lines_kept,
       coalesce(r.n_dup_lines_removed, 0) AS n_dup_lines_removed
FROM tot t LEFT JOIN agg a USING (doc_id) LEFT JOIN rem r USING (doc_id)
ORDER BY doc_id"""
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(oracle).df()

    def run(frame, nparts):
        ds = ray.data.from_pandas(frame).repartition(nparts)
        return (line_dedup(ds, num_buckets=4).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    got = run(df, 3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    shuf = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    pd.testing.assert_frame_equal(run(shuf, 7), got)

    # conservation: kept + removed == total, and every removed line was a
    # repeat of a line kept somewhere
    assert (got.n_lines_kept + got.n_dup_lines_removed == got.n_lines).all()

    # string doc ids survive the id-keyed rebuild exchange
    sdf = df.head(20).copy()
    sdf["doc_id"] = ["d%03d" % i for i in range(20)]
    sgot = (line_dedup(ray.data.from_pandas(sdf).repartition(3),
                       num_buckets=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert sgot.doc_id.tolist() == sorted(sdf.doc_id)
    assert (sgot.n_lines_kept + sgot.n_dup_lines_removed
            == sgot.n_lines).all()


def test_decontaminate_removes_benchmark_overlaps_only():
    """decontaminate must remove every corpus doc sharing a >=k+window-1
    (=8) token substring with the benchmark (the winnowing guarantee) and
    keep every doc sharing no k-gram (=5 tokens) at all; results must not
    depend on partitioning."""
    from protein_feature_engineering_ray.stages.text import decontaminate

    bench_text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                  "lambda mu nu xi omicron pi rho sigma tau upsilon")
    bench = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1000], "text": [bench_text]}))

    texts = {
        0: "intro words then alpha beta gamma delta epsilon zeta eta theta"
           " and a tail",                       # 8-token overlap -> removed
        1: "zero shared vocabulary here cat dog bird fish tree rock",  # kept
        2: "alpha beta gamma delta nothing else matches afterwards at all",
        # ^ only a 4-token overlap: shares NO 5-gram -> kept
        3: "xi omicron pi rho sigma tau upsilon plus trailing content",
        # ^ 7-token overlap: >=5-gram shared, MAY be removed (no guarantee
        #   either way) — excluded from the strict asserts
        4: "",                                   # empty -> kept
    }
    df = pd.DataFrame({"doc_id": sorted(texts), "text": [texts[i] for i in sorted(texts)]})

    for nparts in (1, 3):
        ds = ray.data.from_pandas(df).repartition(nparts)
        clean, contaminated = decontaminate(
            ds, bench, k=5, window=4, num_buckets=4)
        kept = set(clean.to_pandas()["doc_id"])
        removed_df = contaminated.to_pandas()
        removed = set(removed_df["doc_id"]) if len(removed_df) else set()
        assert 0 in removed, "guaranteed >=8-token overlap must be caught"
        assert {1, 2, 4} <= kept, "no shared 5-gram -> never removed"
        assert kept | removed == set(texts) and not (kept & removed)
        if len(removed_df):
            assert (removed_df["n_shared"] >= 1).all()

    # oversized benchmark refuses loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_benchmark_fps"):
        decontaminate(ray.data.from_pandas(df), bench, k=5, window=4,
                      max_benchmark_fps=1)

    # zero-match corpus (the common CLEAN case): the contaminated side has
    # no blocks, so the left_anti join must not schema-probe it (regression:
    # AttributeError on contaminated.schema() is None)
    cleandf = pd.DataFrame({
        "doc_id": [10, 11],
        "text": ["totally disjoint vocabulary one two three four five six",
                 "another clean document seven eight nine ten eleven"]})
    clean, contaminated = decontaminate(
        ray.data.from_pandas(cleandf), bench, k=5, window=4, num_buckets=4)
    assert set(clean.to_pandas()["doc_id"]) == {10, 11}
    assert contaminated.count() == 0
