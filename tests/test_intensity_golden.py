"""End-to-end golden test: the intensity pipeline must reproduce the
reference's committed ``fluor_intensity_perROI.csv`` within 1e-4 relative
(BASELINE.md north-star tolerance) on both golden experiment folders."""

import os

import numpy as np
import pandas as pd
import pytest

from imageprocess_tpu.pipelines.intensity import IntensityConfig, run_intensity
from imageprocess_tpu.report.excel import intensity_dataframe


GOLDEN_CFG = IntensityConfig(
    channels=(2, 3),
    bg_mode="percentile",
    bg_scope="full",
    percentile=1.0,
    clip_neg=True,
    bg_stride=4,
    channel_colors={2: "Green", 3: "Red"},
    do_xls=True,
)


@pytest.mark.parametrize("exp", ["e1_P0", "e2_P1"])
def test_intensity_golden_csv(golden_intensity_dir, tmp_path, exp):
    folder = os.path.join(golden_intensity_dir, exp)
    golden_csv = os.path.join(folder, "RES", "xls", "fluor_intensity_perROI.csv")
    if not os.path.exists(golden_csv):
        pytest.skip(f"no golden CSV for {exp}")
    golden = pd.read_csv(golden_csv)

    out_root = tmp_path / "RES"
    rows = run_intensity(folder, GOLDEN_CFG, out_root=str(out_root), log=lambda *_: None)
    ours = intensity_dataframe(rows)

    assert list(ours.columns) == list(golden.columns)
    assert len(ours) == len(golden)

    for col in golden.columns:
        g = golden[col]
        o = ours[col]
        if g.dtype.kind in "fi":
            gv = g.to_numpy(float)
            ov = o.to_numpy(float)
            both_nan = np.isnan(gv) & np.isnan(ov)
            rel = np.abs(ov - gv) / np.maximum(np.abs(gv), 1e-12)
            ok = both_nan | (rel <= 1e-4) | (np.abs(ov - gv) <= 1e-6)
            assert ok.all(), (
                f"{col}: max rel err {np.nanmax(rel[~both_nan])} "
                f"rows {np.where(~ok)[0][:5]}"
            )
        else:
            assert (g.fillna("") .astype(str) == o.fillna("").astype(str)).all(), col

    # the pipeline also writes its own CSV/XLSX
    assert (out_root / "xls" / "fluor_intensity_perROI.csv").exists()
    assert (out_root / "xls" / "fluor_intensity_perROI.xlsx").exists()


def test_intensity_images(golden_intensity_dir, tmp_path):
    """TIF32/TIF16 + PNG full/crop exports are written for every channel."""
    from imageprocess_tpu.report.render import PanelPngOptions

    folder = os.path.join(golden_intensity_dir, "e1_P0")
    cfg = IntensityConfig(
        channels=(2,),
        channel_colors={2: "Green"},
        do_xls=False,
        do_tif=True,
        do_png=True,
        png_full=PanelPngOptions(enabled=True, cmap_on=True, colorbar=True,
                                 scalebar_um=10.0, dpi=72),
        png_crop=PanelPngOptions(enabled=True, mask_outside=True, dpi=72),
        px_um=0.223,
        crop_size=120,
    )
    out_root = tmp_path / "RES"
    run_intensity(folder, cfg, out_root=str(out_root), log=lambda *_: None)
    assert (out_root / "TIFF" / "S01_ch2_bgcorr.tif").exists()
    assert (out_root / "TIFF16" / "S01_ch2_bgcorr_preview.tif").exists()
    assert (out_root / "PNG" / "full" / "ch2" / "S01_ch2.png").exists()
    crops = list((out_root / "PNG" / "crop" / "ch2").glob("S01_roi*_ch2.png"))
    assert len(crops) >= 18
