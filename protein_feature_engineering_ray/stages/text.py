"""Text-analysis stages over the ``documents`` table (engine extensions for
training-data pipelines; SURVEY.md extension scope).

All stateful setup (compiled regexes, stopword sets, language n-gram
profiles) lives in actor ``__init__`` — the reference's only once-per-worker
pattern is its notebook model load (ESM_embed.ipynb cell 2); these stages
follow the same actor-pool shape at trivial cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "des", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "del", "que"},
}


class TextQuality:
    """Quality-scoring actor: token counts, char classes, stopword ratio,
    repetition.  Compiles patterns once per actor (actor-pool stage)."""

    def __init__(self):
        import re

        self.word_re = re.compile(r"[A-Za-z0-9_']+")
        self.punct_re = re.compile(r"[.,;:!?]")
        self.stop_en = _STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        words = texts.map(self.word_re.findall)
        n_words = words.map(len)
        batch["n_chars"] = texts.str.len().astype("int64")
        batch["n_words"] = n_words.astype("int64")
        batch["avg_word_len"] = words.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0
        )
        batch["punct_ratio"] = texts.map(
            lambda t: len(self.punct_re.findall(t))
        ) / np.maximum(batch["n_chars"], 1)
        batch["stopword_ratio"] = words.map(
            lambda ws: sum(1 for w in ws if w.lower() in self.stop_en)
        ) / np.maximum(n_words, 1)
        batch["uniq_word_ratio"] = words.map(
            lambda ws: len({w.lower() for w in ws})
        ) / np.maximum(n_words, 1)
        return batch


def text_quality(ds: ray.data.Dataset, concurrency: int = 4,
                 batch_size: int = 4096) -> ray.data.Dataset:
    return ds.map_batches(
        TextQuality, batch_format="pandas", concurrency=concurrency,
        batch_size=batch_size,
    )


def token_count(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Whitespace token count — exact, SQL-oracle-friendly (stateless arrow)."""

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern_regex(pc.fill_null(t[text_col], ""), r"\s+")
        )
        return t.append_column("n_tokens", toks.cast(pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


class LangId:
    """Language-ID actor: character-n-gram + stopword heuristic over the 4
    profiled languages; 'zh' by CJK codepoint share; 'und' when no signal."""

    def __init__(self):
        self.profiles = {k: v for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def ident(t: str) -> str:
            if not t:
                return "und"
            cjk = sum(1 for ch in t if "一" <= ch <= "鿿")
            if cjk / max(len(t), 1) > 0.05:
                return "zh"
            words = set(t.lower().split())
            scores = {
                lang: len(words & prof) for lang, prof in self.profiles.items()
            }
            best = max(scores, key=scores.get)
            return best if scores[best] > 0 else "und"

        batch["lang_pred"] = batch["text"].fillna("").map(ident)
        return batch


def lang_id(ds: ray.data.Dataset, concurrency: int = 4) -> ray.data.Dataset:
    return ds.map_batches(LangId, batch_format="pandas", concurrency=concurrency)


def fingerprint(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic 64-bit document fingerprint (stable content hash) —
    the exact-dedup / idempotent-re-ingest key."""

    def fn(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(t[text_col].to_numpy(zero_copy_only=False), dtype=object)
        ).astype(np.uint64)
        return pa.table(
            {id_col: t[id_col], "fingerprint": pa.array(h, pa.uint64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")
