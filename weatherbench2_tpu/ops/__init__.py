"""TPU compute kernels (Pallas) for the hot reduction paths."""
from .reductions import (  # noqa: F401
    STAT_NAMES,
    fused_deterministic_metrics,
    fused_deterministic_sums,
    fused_deterministic_sums_reference,
    fused_region_sums,
    fused_region_sums_reference,
    make_region_weight_matrix,
)
