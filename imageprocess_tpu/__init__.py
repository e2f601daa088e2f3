"""imageprocess_tpu — TPU-native fluorescence-microscopy quantification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of gavyek/ImageProcess
(reference mounted at /root/reference): per-ROI intensity quantification,
focal-adhesion detection, ratiometric FRET (incl. nuclear-rim FRET), ROI
morphology, channel cropping, automatic/interactive segmentation and report
generation (CSV/XLSX/PNG/TIFF/PPTX/ImageJ).

Architecture (TPU-first, not a port):

- ``core``       host-side dataset grammar, TIFF/ROI I/O, configs, logging
- ``geom``       polygon math + on-device polygon rasterization
- ``ops``        jitted numeric core: percentiles, background, masked stats,
                 ratio/QC/spectral math, view pipeline
- ``morphology`` on-device binary morphology, connected components, EDT,
                 contours, region properties
- ``pipelines``  one jit-compiled program per workload, batched over a
                 sharded (stage, time) axis
- ``parallel``   device mesh / sharding / host prefetch
- ``report``     CSV/XLSX/PNG/TIFF/PPTX writers (host side)
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (first compile of the
    pipeline programs costs seconds-to-minutes; subsequent CLI invocations
    then start hot).  Opt out with IMAGEPROCESS_TPU_NO_CACHE=1 or point
    JAX_COMPILATION_CACHE_DIR elsewhere."""
    import os

    if os.environ.get("IMAGEPROCESS_TPU_NO_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "imageprocess_tpu", "jax_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()
