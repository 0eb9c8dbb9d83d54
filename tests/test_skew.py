import pytest
import ray.data

from protein_feature_engineering_ray.sources import synth_transcripts
from protein_feature_engineering_ray.stages.skew import conversation_skew, plan_buckets


def test_conversation_skew_finds_mega_conv():
    ds = synth_transcripts(n_convs=24, duplicates=False).repartition(6)
    s = conversation_skew(ds)
    assert s["n_convs"] == 24
    # the generator plants conv000000 as the mega conversation (400 turns)
    assert s["top"][0][0] == "conv000000"
    assert s["top"][0][1] == 400
    assert s["max"] == 400
    assert s["total_rows"] == synth_transcripts(
        n_convs=24, duplicates=False, as_pandas=True
    ).shape[0]
    assert plan_buckets(s, target_bucket_rows=100) >= s["total_rows"] // 100
    assert plan_buckets(s, target_bucket_rows=10**9) == 64


def test_max_bucket_rows_guard():
    from protein_feature_engineering_ray.core.bucket import grouped_buckets

    ds = synth_transcripts(n_convs=8, duplicates=False)
    with pytest.raises(Exception) as ei:
        grouped_buckets(
            ds, lambda t: t, num_buckets=2, max_bucket_rows=10
        ).count()
    assert "max_bucket_rows" in str(ei.value)


def test_sort_bucket_dictrank_byte_identical():
    """The dictionary-rank fast path must be byte-identical to a direct
    multi-key string sort, and null string keys must fall back safely."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from protein_feature_engineering_ray.core.bucket import sort_bucket

    rng = np.random.default_rng(7)
    n = 5000
    conv = np.array([f"c{rng.integers(0, 300):04d}" for _ in range(n)], object)
    tab = pa.table({
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(rng.integers(0, 1000, n), pa.int64()),
        "payload": pa.array(rng.normal(size=n)),
    })
    # multi-chunk input (the shuffle delivers chunked tables)
    tab = pa.concat_tables([tab.slice(0, 1700), tab.slice(1700, 1800),
                            tab.slice(3500)])
    want = tab.take(pc.sort_indices(
        tab, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
    assert sort_bucket(tab, ("conv_id", "turn_idx")).equals(want)

    # nulls in the string key: fall back to the direct path, same order
    mask = rng.random(n) < 0.05
    conv_null = pa.array(
        [None if m else v for m, v in zip(mask, conv)], pa.string())
    tab_null = tab.set_column(0, "conv_id", conv_null)
    want_null = tab_null.take(pc.sort_indices(
        tab_null,
        sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
    assert sort_bucket(tab_null, ("conv_id", "turn_idx")).equals(want_null)

    # empty table round-trips
    assert sort_bucket(tab.slice(0, 0), ("conv_id", "turn_idx")).num_rows == 0


def test_replicated_events_ids_subset():
    """replicated_events(ids=[k]) emits exactly copy k of the full build."""
    import pandas as pd

    from protein_feature_engineering_ray.sources.synthscale import (
        replicated_events,
    )

    sf = "/root/testdata/sf0.001"
    full = replicated_events(sf, 3).to_pandas()
    one = replicated_events(sf, 3, ids=[2]).to_pandas()
    want = full[full["conv_id"].str.endswith("#2")].reset_index(drop=True)
    got = one.sort_values(["conv_id", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        want.sort_values(["conv_id", "event_id"]).reset_index(drop=True), got)
