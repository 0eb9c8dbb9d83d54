from protein_feature_engineering_ray.functions import (  # noqa: F401
    autocorr,
    composition,
    positional,
)
from protein_feature_engineering_ray.functions.registry import REGISTRY, make_kernel

__all__ = ["autocorr", "composition", "positional", "REGISTRY", "make_kernel"]
