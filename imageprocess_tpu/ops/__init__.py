"""Jitted numeric core: quantiles, background, masked ROI statistics,
ratio/QC math.  Everything here is shape-static, jit/vmap/shard_map-safe."""

from .percentile import (  # noqa: F401
    exact_quantile_pos,
    masked_quantile,
    quantile_from_sorted,
    strided_submask,
)
from .background import bg_value, bg_correct, histogram_mode_value  # noqa: F401
from .stats import masked_stats, roi_stats, STAT_FIELDS, auto_minmax  # noqa: F401
from .ratio import (  # noqa: F401
    pick_epsilon,
    ratio_with_eps,
    saturation_to_nan,
    clip_ratio_to_nan,
    spectral_correct,
)
