"""Ray-Data-native feature-engineering engine over conversation transcripts.

A from-scratch re-expression of the capabilities of
``Binyun-Z/Protein-feature-engineering`` (reference: ``/root/reference/feature.py``,
an iFeatureOmega-style per-sequence descriptor toolkit) as a streaming Ray Data
engine over Parquet transcript tables:

    conversation  = sequence      (reference ``fasta_list`` rows, feature.py:44-70)
    turn          = residue
    role / tool   = the alphabet  (reference 20-letter AA alphabet, feature.py:434)
    ts            = position
    descriptors   = windowed / lag / composition feature stacks
    train/test KNN discipline = point-in-time as-of join (zero temporal leakage)

Architecture: ``ray.data.Dataset`` -> one hash-by-``conv_id`` co-location shuffle
-> segment-vectorized numpy kernels over whole-bucket Arrow tables ->
partitioned, resumable Parquet output.  See SURVEY.md for the full operator map.
"""

from protein_feature_engineering_ray.schema import (
    TRANSCRIPT_COLUMNS,
    transcript_schema,
)

__all__ = ["TRANSCRIPT_COLUMNS", "transcript_schema"]
__version__ = "0.1.0"
