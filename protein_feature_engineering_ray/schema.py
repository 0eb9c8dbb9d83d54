"""Canonical transcript schema + alphabets.

The input table shape is fixed by BASELINE.json ``input_hint``::

    conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
    ts:timestamp[us]

The ``role`` column plays the part of the reference's 20-letter amino-acid
alphabet (``/root/reference/feature.py:434`` ``AA = 'ACDEFGHIKLMNPQRSTVWY'``);
an ``Alphabet`` here is an ordered list of category values plus an optional
coarsening map (the analogue of the reference's physicochemical groupings,
feature.py:1047-1053).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def transcript_schema() -> pa.Schema:
    return pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )


# Default role alphabet for synthetic transcripts (FIXTURES.md F1).
ROLE_ALPHABET = ("assistant", "system", "tool", "user")

# Alphabet of the events-derived transcript table (sources/transcripts.from_events):
# the 5 event types play the 5-group GAAC alphabet (feature.py:1047-1053).
EVENT_ROLE_ALPHABET = ("click", "error", "purchase", "signup", "view")


@dataclass(frozen=True)
class Alphabet:
    """Ordered category alphabet with an optional coarsening (grouping) map.

    ``letters`` is the ordered fine alphabet; ``groups`` maps group name ->
    tuple of member letters (the reference's reduced-alphabet tables, e.g.
    feature.py:2825-2845).  Unknown values encode to ``-1`` (the reference's
    ``-`` pad, feature.py:107).
    """

    letters: tuple[str, ...]
    groups: dict[str, tuple[str, ...]] = field(default_factory=dict)

    @property
    def size(self) -> int:
        return len(self.letters)

    def encode(self, values: np.ndarray) -> np.ndarray:
        """Vectorized str -> int code; unknown AND null -> -1."""
        lookup = {s: i for i, s in enumerate(self.letters)}
        # values may be an object ndarray of str (from Arrow); vectorize via
        # factorize-style dict lookup on the unique values only.  Nulls
        # (None/NaN from a nullable source column) would break np.unique's
        # sort — map them to the unknown code like any non-letter.
        arr = np.asarray(values, dtype=object)
        import pandas as pd

        na = pd.isna(arr)
        if na.any():
            arr = arr.copy()
            arr[na] = ""
        uniq, inv = np.unique(arr, return_inverse=True)
        codes_for_uniq = np.array([lookup.get(u, -1) for u in uniq], dtype=np.int64)
        return codes_for_uniq[inv]

    def group_alphabet(self) -> "Alphabet":
        """Coarsened alphabet: one letter per group, in group-name order."""
        return Alphabet(letters=tuple(self.groups.keys()))

    def group_code_map(self) -> np.ndarray:
        """fine code -> group code array (size,), -1 for letters in no group."""
        gmap = np.full(self.size, -1, dtype=np.int64)
        for gi, (_gname, members) in enumerate(self.groups.items()):
            for m in members:
                gmap[self.letters.index(m)] = gi
        return gmap


DEFAULT_ALPHABET = Alphabet(letters=ROLE_ALPHABET)

EVENT_ALPHABET = Alphabet(
    letters=EVENT_ROLE_ALPHABET,
    # A deterministic 2-group coarsening used by grouped descriptors in the
    # events-derived domain: "active" interactions vs "passive"/system ones.
    groups={
        "act": ("click", "purchase", "signup"),
        "obs": ("error", "view"),
    },
)
