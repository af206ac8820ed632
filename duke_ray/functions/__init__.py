from .agg import (
    AGG_REGISTRY,
    exponential,
    max_of_rows,
    mean_of_rows,
    null_prep,
    parent_children_funcs,
    quadratic,
    resolve_agg,
    step,
)
from .vector import unit_norm_rows

__all__ = [
    "AGG_REGISTRY",
    "exponential",
    "max_of_rows",
    "mean_of_rows",
    "null_prep",
    "parent_children_funcs",
    "quadratic",
    "resolve_agg",
    "step",
    "unit_norm_rows",
]
