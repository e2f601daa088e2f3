"""CLI entrypoint tests (in-process main(argv))."""

import os

import pandas as pd
import pytest

from imageprocess_tpu.cli import main
from imageprocess_tpu.core import i18n


def test_cli_intensity_golden(golden_intensity_dir, tmp_path, capsys):
    folder = os.path.join(golden_intensity_dir, "e1_P0")
    rc = main([
        "intensity", folder, "--channels", "2", "3",
        "--colors", "2=Green", "3=Red", "--out", str(tmp_path), "--lang", "en",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Run start" in out and "Run end" in out
    df = pd.read_csv(tmp_path / "xls" / "fluor_intensity_perROI.csv")
    assert len(df) == 18


def test_cli_mode_flag_korean(golden_intensity_dir, tmp_path, capsys):
    folder = os.path.join(golden_intensity_dir, "e1_P0")
    rc = main(["-mode", "KO", "morphology", folder, "--px-um", "0.223",
               "--channel", "2", "--no-full", "--no-crop",
               "--out", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "실행 시작" in out  # korean run_start banner
    assert (tmp_path / "xls" / "morphology_perROI.csv").exists()
    i18n.set_lang("en")


def test_cli_ppt_failure_exit_code(tmp_path):
    rc = main(["ppt", str(tmp_path)])
    assert rc == 1


def test_cli_help_lists_all_workloads(capsys):
    with pytest.raises(SystemExit):
        main(["--help"])
    out = capsys.readouterr().out
    for cmd in ("intensity", "morphology", "fret", "nesprin2", "fa", "crop",
                "roi-auto", "refine", "ppt"):
        assert cmd in out


def test_cli_all_experiments(tmp_path, capsys):
    """Parent-folder mode processes every experiment subfolder (DP over
    experiments — SURVEY §2.3 'multi-host batch fan-out')."""
    import numpy as np

    from imageprocess_tpu.core import roiio, tiffio

    rng = np.random.default_rng(0)
    H, W = 64, 96
    poly = np.array([[10, 10], [50, 12], [48, 50], [8, 46]], float)
    for exp in ("e1", "e2"):
        d = tmp_path / exp
        (d / "roi").mkdir(parents=True)
        tiffio.write_tiff16(str(d / "S01_2.TIF"),
                            rng.integers(10, 2000, (H, W)).astype(np.uint16))
        roiio.save_roi_bundle(str(d / "roi" / "S01.json"), "S01", (H, W), [poly])
    (tmp_path / "not_an_experiment").mkdir()

    rc = main(["intensity", str(tmp_path), "--channels", "2",
               "--all-experiments", "--lang", "en"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("=== experiment:") == 2
    import os
    for exp in ("e1", "e2"):
        assert os.path.exists(os.path.join(
            tmp_path, exp, "RES", "xls", "fluor_intensity_perROI.csv"))
