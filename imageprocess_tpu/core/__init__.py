"""Host-side core: dataset grammar, image/ROI I/O, configuration, logging."""

from . import naming, tiffio, roiio  # noqa: F401
