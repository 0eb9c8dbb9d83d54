from protein_feature_engineering_ray.core.bucket import (
    add_bucket,
    bucket_hash,
    grouped_buckets,
)
from protein_feature_engineering_ray.core.context import ConvContext

__all__ = ["add_bucket", "bucket_hash", "grouped_buckets", "ConvContext"]
