"""Observability: run-log files with [START]/[END] stamps, progress/ETA,
FA per-cell settings restore (outputs-as-checkpoints resume)."""

import os
import re

import numpy as np
import pandas as pd

from imageprocess_tpu.core.runlog import Progress, RunLogger
from imageprocess_tpu.pipelines.fa import FA_CSV_COLS, restore_cell_settings


def test_run_logger_file(tmp_path):
    lines = []
    logger = RunLogger(str(tmp_path / "logs"), echo=lines.append)
    logger("hello", 42)
    logger.close()
    files = os.listdir(tmp_path / "logs")
    assert len(files) == 1 and re.match(r"run_\d{8}_\d{6}\.txt", files[0])
    content = (tmp_path / "logs" / files[0]).read_text().splitlines()
    assert content[0].startswith("[START]")
    assert content[1] == "hello 42"
    assert content[-1].startswith("[END]")
    assert lines == ["hello 42"]


def test_progress_eta_reports():
    out = []
    p = Progress(4, log=out.append)
    for _ in range(4):
        p.step(1)
    assert len(out) == 4
    assert out[-1].startswith("[100.0%] 4/4 ETA 00:00")


def test_progress_eta_uses_weighted_units(monkeypatch):
    """ROI-weighted callers pass step(n=len(rows)) against a weighted
    total; the ETA rate must be in those units (a call-count rate inflated
    the ETA by the average weight per call).  Injected clock: a real
    sleep-based version was flaky under this box's multi-second noise
    bursts."""
    from imageprocess_tpu.core import runlog as rl

    clock = {"t": 1000.0}
    monkeypatch.setattr(rl.time, "time", lambda: clock["t"])
    out = []
    p = Progress(100, log=out.append, window=8)
    for _ in range(5):
        clock["t"] += 0.02
        p.step(10)          # 10 units per 0.02 s -> 500 units/s exactly
    # 50 units remain -> weighted ETA 0.1 s (prints 00:00); the call-count
    # rate said 1 s for the remaining 50 calls-worth (00:01)
    assert out[-1].split("ETA ")[1].startswith("00:00")


def test_intensity_run_log_written(golden_intensity_dir, tmp_path):
    from imageprocess_tpu.pipelines.intensity import IntensityConfig, run_intensity

    folder = os.path.join(golden_intensity_dir, "e1_P0")
    cfg = IntensityConfig(channels=(2,), do_xls=False)
    run_intensity(folder, cfg, out_root=str(tmp_path), log=lambda *_: None,
                  run_log=True, progress=True)
    logs = os.listdir(tmp_path / "logs")
    assert len(logs) == 1
    text = (tmp_path / "logs" / logs[0]).read_text()
    assert "[START]" in text and "[END]" in text
    assert "[DONE-QUANT] S01 ROI=18" in text
    assert "ETA" in text


def test_fa_restore_cell_settings(tmp_path):
    indiv = tmp_path / "individual_results"
    indiv.mkdir()
    rows = [{
        "File": "S01", "Cell_ID": 2, "Category": "OK", "Area_px": 10.0,
        "Area_um2": 0.1, "Mean_Intensity_Raw": 1.0, "Mean_Intensity_Corr": 1.0,
        "Int_Density_Raw": 10.0, "Int_Density_Corr": 10.0,
        "Background_Level": 5.0, "Used_Alpha": 4.5, "Global_Threshold": 100.0,
        "Min_Area_Setting": 2.0, "Max_Area_Setting": 25.0,
        "Close_Radius_Setting": 2, "Subtract_BG_Setting": False,
    }]
    pd.DataFrame(rows)[FA_CSV_COLS].to_csv(indiv / "S01_results.csv", index=False)
    settings = restore_cell_settings(str(tmp_path), "S01")
    assert settings == {1: {"alpha": 4.5, "min_area_um": 2.0,
                            "max_area_um": 25.0, "close_radius": 2,
                            "subtract_bg": False}}
    assert restore_cell_settings(str(tmp_path), "S09") == {}


def test_corrupt_frame_is_skipped(tmp_path):
    """A corrupt TIFF logs an error and the run continues
    (reference worker error capture, Fluor_INT.py:1139-1143)."""
    import numpy as np

    from imageprocess_tpu.core import roiio, tiffio
    from imageprocess_tpu.pipelines.intensity import IntensityConfig, run_intensity

    rng = np.random.default_rng(0)
    H, W = 64, 96
    poly = np.array([[10, 10], [50, 12], [48, 50], [8, 46]], float)
    (tmp_path / "roi").mkdir()
    for s in (1, 2):
        roiio.save_roi_bundle(str(tmp_path / "roi" / f"S{s:02d}.json"),
                              f"S{s:02d}", (H, W), [poly])
    tiffio.write_tiff16(str(tmp_path / "S01_1.TIF"),
                        rng.integers(10, 2000, (H, W)).astype(np.uint16))
    (tmp_path / "S02_1.TIF").write_bytes(b"not a tiff at all")

    logs = []
    rows = run_intensity(str(tmp_path), IntensityConfig(channels=(1,),
                                                        do_xls=False),
                         out_root=str(tmp_path / "RES"), log=logs.append)
    assert len(rows) == 1 and rows[0]["stage"] == "S01"
    assert any(("[ERROR][WORKER]" in l or "[오류][작업]" in l) and "S02" in l
               for l in logs)
