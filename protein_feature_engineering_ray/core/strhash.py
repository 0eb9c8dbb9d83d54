"""Elementwise string hashing without per-row Python boxing.

``pd.util.hash_array`` over an Arrow string column costs one Python object
per row just to build the input array (``to_numpy(zero_copy_only=False)``
boxes every value); the hash itself already factorizes internally.
``hash_strings`` dictionary-encodes the column in C++ and boxes/hashes only
the DISTINCT values, then gathers by index — identical uint64s (the hash is
elementwise), measured 6-7x faster at ~100x value repetition (corpus tokens
are Zipf-distributed; conversation keys repeat ~turns-per-conversation
times) and not slower even when all values are unique.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EMPTY = np.empty(0, np.uint64)


def hash_strings(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 siphash per element of a string / dictionary<string> column —
    bit-identical to ``pd.util.hash_array(np.asarray(col, dtype=object))``.

    Null-containing columns fall back to the boxed path (null indices don't
    gather; pandas hashes ``None`` like the object path always did)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return _EMPTY.copy()
    if arr.null_count > 0:
        boxed = np.asarray(arr.to_numpy(zero_copy_only=False), dtype=object)
        return pd.util.hash_array(boxed).astype(np.uint64)
    de = arr if pa.types.is_dictionary(arr.type) else arr.dictionary_encode()
    dic = np.asarray(
        de.dictionary.to_numpy(zero_copy_only=False), dtype=object
    )
    dh = pd.util.hash_array(dic).astype(np.uint64)
    return dh[de.indices.to_numpy(zero_copy_only=False)]
