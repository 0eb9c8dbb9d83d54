from protein_feature_engineering_ray.sources.transcripts import (
    TRANSCRIPTS_SQL_CTE,
    from_events,
    synth_feature_timeline,
    synth_labels,
    synth_transcripts,
)

__all__ = [
    "TRANSCRIPTS_SQL_CTE",
    "from_events",
    "synth_feature_timeline",
    "synth_labels",
    "synth_transcripts",
]
