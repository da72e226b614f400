from adampro_spark.operators.scan import (
    boolean_filter,
    count_projection,
    distinct_projection,
    exists_projection,
    knn,
    project,
    radius_scan,
    sequential_scan,
)
from adampro_spark.operators.fusion import (
    except_fusion,
    fuzzy_intersect,
    fuzzy_union,
    intersect_fusion,
    stochastic_fusion,
    union_fusion,
)

__all__ = [
    "knn",
    "radius_scan",
    "sequential_scan",
    "boolean_filter",
    "project",
    "count_projection",
    "exists_projection",
    "distinct_projection",
    "union_fusion",
    "intersect_fusion",
    "except_fusion",
    "fuzzy_union",
    "fuzzy_intersect",
    "stochastic_fusion",
]
