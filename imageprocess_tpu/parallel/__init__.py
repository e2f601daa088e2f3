"""Device-mesh parallelism: sharded batch execution of the workload
pipelines (the TPU equivalent of the reference's ProcessPoolExecutor fan-out
over (stage, time) keys, SURVEY §2.3)."""

from .runner import (  # noqa: F401
    make_mesh,
    batched_intensity_step,
    sharded_intensity_step,
    PrefetchLoader,
)
