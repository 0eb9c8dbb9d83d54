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
