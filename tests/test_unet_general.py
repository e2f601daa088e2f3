"""Cross-domain quality gates for the GENERALIST checkpoint
(models/pretrained/unet_general_v1).

Capability being matched: pretrained Cellpose ``cyto3``
(src/ROI_auto_drawer.py:48-67) segments arbitrary cell images out of the
box.  unet_golden_v1 carries the same-prep golden bar
(tests/test_unet_golden.py); THIS file holds the generalist to appearance
domains it must handle without retraining:

  - five synthetic domains (models.synthcells) at held-out seeds —
    including inverted contrast and dense touching fields, which the
    golden specialist has never seen;
  - the REAL golden held-out window (e1_P0 quadrant, 7 manual cells) —
    generality must not cost same-prep performance.

Bars are set from the committed training run's measured margins (see the
assertions) — they are regression floors, not aspirations.
"""

import os

import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(__file__), "..", "imageprocess_tpu",
                    "models", "pretrained", "unet_general_v1")
FEATURES = (16, 32, 64, 128)

# (domain, min recalled fraction, min mean matched IoU) at IoU>=0.3 —
# calibrated from the committed run's eval printout with margin
DOMAIN_BARS = [
    ("fluor", 0.90, 0.70),
    ("dense", 0.75, 0.65),  # measured 0.792 (42/53) — touching-cell splits cap recall
    ("inverted", 0.80, 0.65),
    ("ring", 0.80, 0.65),
    ("texture", 0.80, 0.65),
]


@pytest.fixture(scope="module")
def general_model():
    import jax
    import jax.numpy as jnp

    from imageprocess_tpu.models.checkpoint import load_checkpoint
    from imageprocess_tpu.models.unet import UNet

    if not os.path.exists(os.path.join(CKPT, "params.npz")):
        pytest.fail("committed generalist checkpoint missing: " + CKPT)
    model = UNet(features=FEATURES)
    like = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 256, 256, 1), jnp.float32))
    params = load_checkpoint(CKPT, like)
    return model, params


@pytest.mark.parametrize("domain,min_recall,min_iou",
                         DOMAIN_BARS, ids=[d for d, *_ in DOMAIN_BARS])
def test_general_unet_cross_domain(general_model, domain, min_recall, min_iou):
    from imageprocess_tpu.models.synthcells import eval_frame
    from imageprocess_tpu.segment.cellseg import segment_frame_unet
    from imageprocess_tpu.segment.evalseg import match_instances

    model, params = general_model
    ev = eval_frame(0, domain)
    pred = segment_frame_unet(ev["img"], model.apply, params, tile=256,
                              min_size_px=100)
    m = match_instances(pred, ev["polys"], ev["img"].shape, iou_threshold=0.3)
    assert m["recall"] >= min_recall, (domain, m["recall"], len(pred))
    assert m["mean_iou"] >= min_iou, (domain, m)


def test_general_unet_holds_on_real_golden_window(general_model,
                                                  golden_intensity_dir):
    """Real-data floor: the 7-cell held-out e1_P0 window (same crop as the
    golden specialist's perturbation suite) — generality must not lose the
    same-prep cells."""
    from imageprocess_tpu.core import roiio, tiffio
    from imageprocess_tpu.segment.cellseg import segment_frame_unet
    from imageprocess_tpu.segment.evalseg import match_instances

    img = np.asarray(tiffio.read_2d(
        os.path.join(golden_intensity_dir, "e1_P0", "S01_4.TIF")))
    polys = roiio.load_roi_polygons(
        os.path.join(golden_intensity_dir, "e1_P0", "roi", "S01.json"))
    Y0, Y1, X0, X1 = 0, 768, 1024, 2048
    crop = img[Y0:Y1, X0:X1].astype(np.float32)
    cp = [p - np.array([X0, Y0]) for p in polys
          if p[:, 0].min() >= X0 + 20 and p[:, 0].max() < X1 - 20
          and p[:, 1].min() >= Y0 + 20 and p[:, 1].max() < Y1 - 20]
    assert len(cp) == 7

    model, params = general_model
    pred = segment_frame_unet(crop, model.apply, params, tile=256,
                              min_size_px=200)
    m = match_instances(pred, cp, crop.shape, iou_threshold=0.3)
    assert m["recall"] * len(cp) >= 6, m
    assert m["mean_iou"] >= 0.70, m


def test_general_checkpoint_name_resolves(tmp_path):
    """`--checkpoint general` resolves the bundled generalist by name and
    segments a synthetic inverted-contrast frame end-to-end — the exact
    scenario the golden specialist was never trained for."""
    from imageprocess_tpu.core import roiio, tiffio
    from imageprocess_tpu.models.synthcells import eval_frame
    from imageprocess_tpu.segment.auto import AutoSegConfig, run_auto_drawer

    ev = eval_frame(1, "inverted", H=384, W=384)
    tiffio.write_tiff16(str(tmp_path / "cells.TIF"),
                        np.clip(ev["img"], 0, 65535).astype(np.uint16))
    cfg = AutoSegConfig(backend="unet", checkpoint="general", min_size_px=100)
    written = run_auto_drawer(str(tmp_path), cfg, log=lambda *_: None)
    assert len(written) == 1
    polys = roiio.load_roi_polygons(written[0])
    assert len(polys) >= max(1, int(ev["labels"].max()) // 2)
