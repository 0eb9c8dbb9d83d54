"""Per-bucket computation context.

A ``ConvContext`` wraps one co-located, ``(conv_id, turn order)``-sorted Arrow
table (many whole conversations) and lazily exposes the numpy views kernels
need: segment offsets, per-row segment ids, encoded role/tool codes, int64
timestamps, positions within conversation.  Computing these ONCE per bucket —
instead of once per descriptor, as the reference recomputes its per-sequence
scaffolding in every method loop (e.g. feature.py:440, 469, 501) — is what
lets dozens of descriptor kernels share a single shuffle.
"""

from __future__ import annotations

from functools import cached_property

import numpy as np
import pyarrow as pa

from protein_feature_engineering_ray.core.bucket import segment_starts
from protein_feature_engineering_ray.schema import Alphabet


class ConvContext:
    def __init__(self, table: pa.Table, alphabet: Alphabet, seg_col: str = "conv_id"):
        self.table = table
        self.alphabet = alphabet
        self.n = table.num_rows
        self.seg_col = seg_col

    def col_np(self, name: str):
        return self.table[name].to_numpy(zero_copy_only=False)

    @cached_property
    def _seg_dict(self):
        """Combined, dictionary-encoded seg column — pre-encoded input
        (``pre_encode(dict_conv=True)``) or a null-free plain-string column
        encoded HERE once per bucket (equality-preserving int32 codes beat
        boxing every row to a Python string for segmentation, measured ~6x).
        None only for null-containing non-dictionary columns (object-compare
        fallback)."""
        col = self.table[self.seg_col]
        is_dict = pa.types.is_dictionary(col.type)
        if not is_dict and not (
            (pa.types.is_string(col.type) or pa.types.is_large_string(col.type))
            and col.null_count == 0
        ):
            return None
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()  # unifies dictionaries
        return col if is_dict else col.dictionary_encode()

    @cached_property
    def conv_ids_rows(self) -> np.ndarray:
        """Segmentation key per row (``conv_id``, or the salted chunk key in
        chunked mode — see executor.turn_features_chunked), as strings.
        Decodes EVERY row — prefer ``seg_heads(positions)`` for sparse
        access."""
        if self._seg_dict is not None:
            return np.asarray(
                self._seg_dict.cast(pa.string()).to_numpy(zero_copy_only=False),
                dtype=object,
            )
        return np.asarray(self.col_np(self.seg_col), dtype=object)

    def seg_heads(self, positions: np.ndarray) -> np.ndarray:
        """Seg-column strings at the given row positions (decodes ONLY
        those rows — the per-session/per-frame key materialization)."""
        if "conv_ids_rows" in self.__dict__:  # already decoded: reuse
            return self.conv_ids_rows[positions]
        col = self._seg_dict
        if col is None:
            return self.conv_ids_rows[positions]
        heads = col.take(pa.array(np.asarray(positions, dtype=np.int64)))
        return np.asarray(
            heads.cast(pa.string()).to_numpy(zero_copy_only=False),
            dtype=object,
        )

    @cached_property
    def starts(self) -> np.ndarray:
        """Segment offsets, length n_segments + 1."""
        if self._seg_dict is not None:
            # equal unified-dictionary index <=> equal conversation: segment
            # on int32 codes, never materializing the strings
            return segment_starts(
                self._seg_dict.indices.to_numpy(zero_copy_only=False)
            )
        return segment_starts(self.conv_ids_rows)

    @cached_property
    def lengths(self) -> np.ndarray:
        return np.diff(self.starts)

    @property
    def n_segs(self) -> int:
        return len(self.starts) - 1

    @cached_property
    def seg_of_row(self) -> np.ndarray:
        return np.repeat(np.arange(self.n_segs, dtype=np.int64), self.lengths)

    @cached_property
    def conv_ids(self) -> np.ndarray:
        """One conv_id per segment (strings; decodes only the segment heads,
        not every row)."""
        return self.seg_heads(self.starts[:-1])

    @cached_property
    def pos(self) -> np.ndarray:
        """0-based position of each row within its conversation."""
        return np.arange(self.n, dtype=np.int64) - self.starts[self.seg_of_row]

    @cached_property
    def codes(self) -> np.ndarray:
        """Role codes in the fine alphabet; unknown -> -1.

        If the producer pre-encoded roles (``role_code`` int8 column, see
        ``sources.transcripts.pre_encode``) the codes ride the shuffle
        directly — fewer bytes exchanged, no per-bucket string encode."""
        if "role_code" in self.table.column_names:
            return (
                self.table["role_code"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        return self.alphabet.encode(self.col_np("role"))

    @cached_property
    def group_codes(self) -> np.ndarray:
        """Role codes coarsened through the alphabet's grouping map."""
        gmap = self.alphabet.group_code_map()
        c = self.codes
        out = np.where(c >= 0, gmap[np.clip(c, 0, None)], -1)
        return out

    @cached_property
    def ts_us(self) -> np.ndarray:
        """ts as int64 microseconds regardless of source unit (ns from pandas,
        us from the canonical schema)."""
        ts = self.table["ts"].cast(pa.timestamp("us"))
        return ts.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)

    def numeric(self, col: str) -> np.ndarray:
        return self.col_np(col).astype(np.float64)

    def same_seg(self, shift: int) -> np.ndarray:
        """Boolean mask (len n - shift): rows i and i+shift in same conversation."""
        s = self.seg_of_row
        return s[: self.n - shift] == s[shift:]
