"""Workload pipelines: one jit-compiled device program per workload,
host-side orchestration around it (dataset discovery, ROI loading, report
writing).  Mirrors the reference's per-script pipelines (SURVEY §2.1)."""

from .intensity import IntensityConfig, run_intensity  # noqa: F401
from .fret import FretConfig, run_fret  # noqa: F401
from .nesprin2 import Nesprin2Config, run_nesprin2  # noqa: F401
from .morphology import MorConfig, run_morphology  # noqa: F401
