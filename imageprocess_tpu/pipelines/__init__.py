"""Workload pipelines: one jit-compiled device program per workload,
host-side orchestration around it (dataset discovery, ROI loading, report
writing).  Mirrors the reference's per-script pipelines (SURVEY §2.1)."""

from .intensity import IntensityConfig, run_intensity  # noqa: F401
