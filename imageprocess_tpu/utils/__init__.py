"""Cross-cutting utilities: profiling, timers."""

from .profiling import maybe_profile, StageTimer  # noqa: F401
