"""Polygon geometry: host vertex math + on-device rasterization."""

from .polygon import (  # noqa: F401
    convex_hull,
    douglas_peucker,
    pad_polygons,
    polygon_bbox,
    polygon_centroid,
    polygon_perimeter,
    shoelace_area,
)
from .rasterize import (  # noqa: F401
    EdgeRule,
    rasterize_polygon_np,
    rasterize_polygons,
    rasterize_union,
)
