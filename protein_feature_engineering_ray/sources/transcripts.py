"""Transcript sources.

Two ways to obtain the canonical transcript table (schema.py):

1. ``synth_transcripts`` — deterministic seeded generator implementing
   FIXTURES.md F1 (plus F2 ``feature_timeline`` and F3 ``labels``).  The
   analogue of the reference's FASTA reader + corpus (feature.py:91-113);
   used by unit / property / leakage tests and the bench harness.

2. ``from_events`` — derives a transcript-shaped table deterministically from
   the driver-provided ``events`` table (TESTDATA.md), with an exactly
   equivalent SQL CTE so every transcript operator can be oracle-checked by
   DuckDB:

       conv_id  = CAST(user_id AS VARCHAR)
       turn_idx = ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
       role     = event_type         (the 5-letter alphabet)
       text     = props
       tool     = event_type when value >= 100 else ''   (sparse tool channel)
       ts, value kept

   ``value`` (double) rides along as the per-turn numeric property used by the
   lag/autocorrelation family (reference property series, feature.py:1451-1455).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

EPOCH_US = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z in microseconds

# Keep in exact lockstep with from_events() below — every oracle_sql() query
# builds on this CTE.
TRANSCRIPTS_SQL_CTE = """
WITH transcripts AS (
  SELECT
    CAST(user_id AS VARCHAR) AS conv_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER)
      AS turn_idx,
    coalesce(event_type, '') AS role,
    coalesce(props, '') AS text,
    CASE WHEN value >= 100 THEN coalesce(event_type, '') ELSE '' END AS tool,
    ts,
    value
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
)
"""


# transcript output column -> the events.parquet columns it derives from
_SRC_OF = {
    "conv_id": ("user_id",),
    "event_id": ("event_id",),
    "turn_idx": (),
    "role": ("event_type",),
    "text": ("props",),
    "tool": ("event_type", "value"),
    "ts": ("ts",),
    "value": ("value",),
}
# identity/order columns every consumer needs (order_cols + tie-break)
_ALWAYS = ("conv_id", "event_id", "turn_idx", "ts")


def from_events(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """events.parquet -> transcript-shaped Dataset (lazy, per-batch transform).

    ``columns`` selects transcript OUTPUT columns; the identity/order columns
    (conv_id, event_id, turn_idx, ts) are always included, and the read is
    pruned to exactly the source columns those outputs derive from — the
    column-prune-at-the-read rule for the widest table in the system.

    ``turn_idx`` needs per-conversation ordering, which the co-location
    shuffle (core.bucket) establishes anyway — so here we only project and
    rename; ``turn_idx`` is assigned inside the bucketed sort where the whole
    conversation is guaranteed co-located (never a driver-side pass).
    A placeholder turn_idx of -1 marks "assign after co-location".
    """
    from protein_feature_engineering_ray.sources.io import sized_read_parquet

    if columns is None:
        out_cols = list(_SRC_OF)
        src_cols = None
    else:
        unknown = set(columns) - set(_SRC_OF)
        if unknown:
            raise ValueError(f"from_events: unknown columns {sorted(unknown)}")
        out_cols = [c for c in _SRC_OF
                    if c in _ALWAYS or c in set(columns)]
        src_cols = sorted(
            {"user_id", "ts", "event_id"}  # malformed-row-drop triple
            | {s for c in out_cols for s in _SRC_OF[c]}
        )
    ds = sized_read_parquet(f"{sf_dir}/events.parquet", columns=src_cols)

    def to_transcript(batch: pa.Table) -> pa.Table:
        # identity/order triple must be present: a null user_id has no
        # conversation, a null ts has no position (it would cast to INT_MIN
        # garbage in ts_us and corrupt latency/windows/session gaps), a
        # null event_id breaks the deterministic tie-break.  Same
        # malformed-row-drop discipline as sources.io.read_rawlog.
        ok = pc.and_(
            pc.and_(pc.is_valid(batch["user_id"]), pc.is_valid(batch["ts"])),
            pc.is_valid(batch["event_id"]),
        )
        if not pc.all(ok).as_py():
            batch = batch.filter(ok)
        # null-harden the string columns at the ingestion boundary: a null
        # role encodes to the unknown code (like any non-letter), null
        # text/tool become ""; a null value stays null (-> NaN, the numeric
        # kernels' existing missing-data path).  A null tool CONDITION
        # (null value) also yields "", via the outer fill.
        out: dict = {}
        for c in out_cols:
            if c == "conv_id":
                out[c] = pc.cast(batch["user_id"], pa.string())
            elif c == "event_id":
                # event_id breaks ts ties deterministically in the later sort
                out[c] = batch["event_id"]
            elif c == "turn_idx":
                out[c] = pa.array(
                    np.full(len(batch), -1, dtype=np.int32), pa.int32()
                )
            elif c == "role":
                out[c] = pc.fill_null(batch["event_type"], "")
            elif c == "text":
                out[c] = pc.fill_null(batch["props"], "")
            elif c == "tool":
                et = pc.fill_null(batch["event_type"], "")
                out[c] = pc.fill_null(
                    pc.if_else(pc.greater_equal(batch["value"], 100.0), et,
                               pa.scalar("", pa.string())),
                    "",
                )
            elif c == "ts":
                out[c] = batch["ts"]
            elif c == "value":
                out[c] = batch["value"]
        return pa.table(out)

    return ds.map_batches(to_transcript, batch_format="pyarrow")


def pre_encode(
    ds: ray.data.Dataset, letters: tuple[str, ...], dict_conv: bool = False
) -> ray.data.Dataset:
    """Producer-side role/tool encoding: ``role`` -> ``role_code`` int8
    (unknown -> -1, the reference's ``-`` pad) and ``tool`` -> ``tool_flag``
    int8, dropping the string columns.  Shrinks the bytes shipped through the
    co-location exchange and removes the per-bucket string encode
    (ConvContext.codes fast path).

    ``dict_conv=True`` additionally dictionary-encodes ``conv_id``: each
    conversation's id travels the shuffle ONCE per block (int32 index per
    row) instead of once per turn — ~25 % fewer exchange bytes at avg conv
    length ~150 — and every consumer is dictionary-aware (add_bucket hashes
    the dictionary, sort_bucket ranks it, ConvContext segments on indices);
    outputs cast back to plain string, so results and schemas are identical
    either way (A/B-asserted).  DEFAULT OFF after measurement: on the
    one-socket sandbox the 40M-turn sweep ran 10.7 s dict vs 7.3 s plain
    (interleaved min-of-3) — Ray's sort shuffle re-unifies the per-block
    dictionaries at every merge, and that CPU cost exceeds the DRAM saving.
    On a real multi-node cluster, where the exchange crosses a NETWORK,
    the byte saving may win; measure there before flipping."""

    letter_arr = pa.array(list(letters), pa.string())

    def fn(t: pa.Table) -> pa.Table:
        code = pc.fill_null(pc.index_in(t["role"], letter_arr), -1).cast(pa.int8())
        tool_flag = pc.cast(
            pc.not_equal(pc.fill_null(t["tool"], ""), ""), pa.int8()
        )
        t = t.append_column("role_code", code)
        t = t.append_column("tool_flag", tool_flag)
        if dict_conv and not pa.types.is_dictionary(t["conv_id"].type):
            i = t.column_names.index("conv_id")
            t = t.set_column(
                i, "conv_id", pc.dictionary_encode(t["conv_id"]))
        return t.drop_columns([c for c in ("role", "tool", "text")
                               if c in t.column_names])

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Seeded synthetic fixtures (FIXTURES.md F1-F3)
# ---------------------------------------------------------------------------

_ROLES = np.array(["user", "assistant", "tool", "system"], dtype=object)
# Markov transition rows over _ROLES order (user, assistant, tool, system)
_TRANS = np.array(
    [
        [0.05, 0.75, 0.15, 0.05],  # after user
        [0.60, 0.10, 0.25, 0.05],  # after assistant
        [0.10, 0.80, 0.08, 0.02],  # after tool
        [0.70, 0.20, 0.05, 0.05],  # after system
    ]
)
_TOOLS = np.array(
    ["search", "python", "browser", "calc", "sql", "shell", "http", "files"],
    dtype=object,
)


def synth_transcripts(
    n_convs: int = 64,
    seed: int = 7,
    mega_conv: bool = True,
    duplicates: bool = True,
    equal_length: int | None = 8,
    gap_seconds: float = 1800.0,
    as_pandas: bool = False,
):
    """Deterministic transcript corpus (FIXTURES.md F1).

    Length mix of short/long conversations, one mega-conversation (skew), a
    family of exactly-``equal_length``-turn conversations (the reference's
    ``is_equal`` precondition, feature.py:458-460), occasional > ``gap_seconds``
    gaps (sessionization), equal-``ts`` ties, and (optionally) duplicated
    ``(conv_id, turn_idx)`` rows for the dedup-on-ingest path.  Rows are
    emitted SHUFFLED so engines must restore order.
    """
    rng = np.random.default_rng(seed)
    lengths = []
    for k in range(n_convs):
        if mega_conv and k == 0:
            lengths.append(400)
        elif equal_length is not None and k % 5 == 1:
            lengths.append(equal_length)
        elif k % 3 == 0:
            lengths.append(int(rng.integers(3, 11)))
        else:
            lengths.append(int(rng.integers(12, 120)))

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for k, L in enumerate(lengths):
        cid = f"conv{k:06d}"
        state = 0  # start at "user"
        t = EPOCH_US + np.int64(k) * 3_600_000_000
        for j in range(L):
            conv_ids.append(cid)
            turn_idxs.append(j)
            role = _ROLES[state]
            roles.append(role)
            texts.append(f"{cid}:{j}:w{int(rng.integers(0, 50))}")
            tools.append(_TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else "")
            tss.append(t)
            # inter-turn gap: lognormal seconds, occasional session break,
            # occasional zero gap (equal-ts tie)
            u = rng.random()
            if u < 0.03:
                gap_us = np.int64((gap_seconds + 60.0 * rng.random() * 10) * 1e6)
            elif u < 0.06:
                gap_us = np.int64(0)
            else:
                gap_us = np.int64(np.exp(rng.normal(2.5, 1.0)) * 1e6)
            t = t + gap_us
            state = int(rng.choice(4, p=_TRANS[state]))

    df = pd.DataFrame(
        {
            "conv_id": pd.array(conv_ids, dtype="string[python]").astype(object),
            "turn_idx": np.asarray(turn_idxs, dtype=np.int32),
            "role": np.asarray(roles, dtype=object),
            "text": np.asarray(texts, dtype=object),
            "tool": np.asarray(tools, dtype=object),
            "ts": pd.to_datetime(np.asarray(tss, dtype=np.int64), unit="us"),
        }
    )
    if duplicates:
        dup = df.sample(frac=0.01, random_state=seed)
        df = pd.concat([df, dup], ignore_index=True)
    # shuffle row order (disorder knob)
    df = df.sample(frac=1.0, random_state=seed + 1).reset_index(drop=True)
    if as_pandas:
        return df
    return ray.data.from_pandas(df)


def synth_feature_timeline(
    n_convs: int = 64, seed: int = 7, rows_per_conv: int = 6, as_pandas: bool = False
):
    """F2: sparse irregular per-conversation feature timeline (as-of right side)."""
    rng = np.random.default_rng(seed + 100)
    conv_ids, feat_ts, feat_a, feat_b = [], [], [], []
    counter = 0
    for k in range(n_convs):
        if k % 7 == 3:  # some convs have no timeline rows -> null-match path
            continue
        cid = f"conv{k:06d}"
        base = EPOCH_US + np.int64(k) * 3_600_000_000
        walk = 0.0
        # spread rows from slightly before the conv start to well past it
        offsets = np.sort(rng.integers(-600_000_000, 7_200_000_000, size=rows_per_conv))
        for off in offsets:
            walk += float(rng.normal())
            conv_ids.append(cid)
            feat_ts.append(base + np.int64(off))
            feat_a.append(walk)
            feat_b.append(counter)
            counter += 1
    df = pd.DataFrame(
        {
            "conv_id": np.asarray(conv_ids, dtype=object),
            "feat_ts": pd.to_datetime(np.asarray(feat_ts, dtype=np.int64), unit="us"),
            "feat_a": np.asarray(feat_a, dtype=np.float64),
            "feat_b": np.asarray(feat_b, dtype=np.int64),
        }
    )
    if as_pandas:
        return df
    return ray.data.from_pandas(df)


def synth_labels(n_convs: int = 64, seed: int = 7, as_pandas: bool = False):
    """F3: per-conversation label/split table (reference ``>name|label|purpose``
    headers, feature.py:108-111)."""
    rng = np.random.default_rng(seed + 200)
    df = pd.DataFrame(
        {
            "conv_id": np.asarray([f"conv{k:06d}" for k in range(n_convs)], dtype=object),
            "label": np.asarray(
                [str(int(x)) for x in rng.integers(0, 2, size=n_convs)], dtype=object
            ),
            "split": np.asarray(
                [
                    "training" if x < 0.8 else "testing"
                    for x in rng.random(size=n_convs)
                ],
                dtype=object,
            ),
        }
    )
    if as_pandas:
        return df
    return ray.data.from_pandas(df)
