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
