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


def test_cli_smoke_remaining_subcommands(tmp_path, capsys):
    """fret / nesprin2 / crop / roi-auto / refine / fa through the CLI on a
    tiny synthetic experiment."""
    import numpy as np

    from imageprocess_tpu.core import roiio, tiffio

    rng = np.random.default_rng(0)
    H, W = 80, 112
    poly = np.array([[15, 15], [60, 18], [55, 60], [12, 55]], float)
    (tmp_path / "roi").mkdir()
    for ch in (1, 2):
        img = rng.integers(10, 2000, (H, W)).astype(np.uint16)
        yy, xx = np.mgrid[0:H, 0:W]
        img = (img + 3000 * np.exp(-((yy - 38) ** 2 + (xx - 36) ** 2) / 60.0)
               ).clip(0, 65535).astype(np.uint16)
        tiffio.write_tiff16(str(tmp_path / f"S01_{ch}.TIF"), img)
    roiio.save_roi_bundle(str(tmp_path / "roi" / "S01.json"), "S01", (H, W),
                          [poly])
    f = str(tmp_path)

    assert main(["fret", f, "--donor-ch", "1", "--acceptor-ch", "2",
                 "--out", f + "/RES_F"]) == 0
    assert main(["nesprin2", f, "--donor-ch", "1", "--fret-ch", "2",
                 "--px-um", "0.223", "--rim-um", "1.0",
                 "--out", f + "/RES_N"]) == 0
    assert main(["crop", f, "--channel", "1", "--no-png", "--tiff16",
                 "--out", f + "/RES_C"]) == 0
    assert main(["roi-auto", f, "--channel", "1", "--thr-mode", "mean_std",
                 "--min-size-px", "20", "--out", f + "/roi_auto"]) == 0
    assert main(["refine", f, "--thr", "90", "--min-area", "10"]) == 0
    assert main(["fa", f, "--roi-dir", f + "/roi", "--out", f + "/BND_FA",
                 "--channel", "1", "--alpha", "1.5",
                 "--min-area-um", "0.2"]) == 0

    import os
    assert os.path.exists(f + "/RES_F/xls/fret_ratio_perROI.csv")
    assert os.path.exists(f + "/RES_N/xls/nesprin2_fret_perROI.csv")
    assert os.path.exists(f + "/RES_C/TIFF16/S01_roi1_ch1.tif")
    assert os.path.exists(f + "/roi_auto/S01.json")
    assert os.path.exists(f + "/roi/mask/S01_mask.tif")  # refine bundle


def test_cli_intensity_batched_writes_run_log(golden_intensity_dir, tmp_path,
                                              capsys):
    """--batched produces the same CSV AND the L8 run log
    (RES/logs/run_*.txt with [START]/[END]) like the serial runner."""
    import glob

    folder = os.path.join(golden_intensity_dir, "e1_P0")
    rc = main([
        "intensity", folder, "--channels", "2", "3", "--batched",
        "--out", str(tmp_path), "--lang", "en",
    ])
    assert rc == 0
    df = pd.read_csv(tmp_path / "xls" / "fluor_intensity_perROI.csv")
    assert len(df) == 18
    logs = glob.glob(str(tmp_path / "logs" / "run_*.txt"))
    assert len(logs) == 1
    text = open(logs[0]).read()
    assert "[START]" in text and "[END]" in text
    assert "[batch]" in text


def test_cli_gui_parity_flags(tmp_path):
    """The GUI-equivalent knobs exposed this round: per-channel percentile,
    crop geometry, eps overrides, FA master options — values must land in
    the configs and the runs must succeed."""
    import numpy as np

    from imageprocess_tpu.core import roiio, tiffio

    rng = np.random.default_rng(2)
    H, W = 80, 112
    poly = np.array([[15, 15], [60, 18], [55, 60], [12, 55]], float)
    yy, xx = np.mgrid[0:H, 0:W]
    blob = 6000 * np.exp(-((yy - 38) ** 2 + (xx - 36) ** 2) / 30.0)
    for ch in (1, 2):
        img = (rng.integers(10, 2000, (H, W)) + blob).clip(0, 65535)
        tiffio.write_tiff16(str(tmp_path / f"S01_{ch}.TIF"),
                            img.astype(np.uint16))
    roiio.save_roi_bundle(str(tmp_path / "roi" / "S01.json"), "S01", (H, W),
                          [poly])
    f = str(tmp_path)

    assert main(["intensity", f, "--channels", "1", "2",
                 "--per-channel-p", "1=2.0", "2=0.5",
                 "--crop-size", "64", "--auto-lo", "0.5",
                 "--out", f + "/RES_I"]) == 0
    assert main(["fret", f, "--donor-ch", "1", "--acceptor-ch", "2",
                 "--donor-p", "2.0", "--fret-p", "0.5", "--eps-abs", "3.0",
                 "--crop-w", "64", "--crop-h", "64",
                 "--out", f + "/RES_F"]) == 0
    assert main(["fa", f, "--roi-dir", f + "/roi", "--out", f + "/BND_FA",
                 "--channel", "1", "--alpha", "1.0", "--min-area-um", "0.2",
                 "--master-name", "Custom_Master.xlsx"]) == 0

    import csv as _csv
    import os
    rows = list(_csv.DictReader(
        open(f + "/RES_I/xls/fluor_intensity_perROI.csv")))
    assert rows and float(rows[0]["ch1_p"]) == 2.0
    assert float(rows[0]["ch2_p"]) == 0.5
    # the CSV keeps the reference's exact column subset (no donor_p column);
    # --eps-abs landing in the run proves the new FRET flags reached cfg
    frows = list(_csv.DictReader(
        open(f + "/RES_F/xls/fret_ratio_perROI.csv")))
    assert frows and float(frows[0]["eps"]) == 3.0
    assert os.path.exists(f + "/BND_FA/Custom_Master.xlsx")


def test_cli_all_experiments_with_out(tmp_path, capsys):
    """--all-experiments + explicit --out writes each experiment under
    <out>/<experiment> (regression: --out was silently discarded)."""
    import numpy as np
    import os

    from imageprocess_tpu.core import roiio, tiffio

    rng = np.random.default_rng(4)
    H, W = 64, 96
    poly = np.array([[10, 10], [50, 12], [48, 50], [8, 46]], float)
    for exp in ("e1", "e2"):
        d = tmp_path / "ANA" / exp
        tiffio.write_tiff16(str(d / "S01_2.TIF"),
                            rng.integers(10, 2000, (H, W)).astype(np.uint16))
        roiio.save_roi_bundle(str(d / "roi" / "S01.json"), "S01", (H, W),
                              [poly])
    out = str(tmp_path / "results")
    rc = main(["intensity", str(tmp_path / "ANA"), "--channels", "2",
               "--all-experiments", "--out", out, "--lang", "en"])
    assert rc == 0
    for exp in ("e1", "e2"):
        assert os.path.exists(os.path.join(
            out, exp, "xls", "fluor_intensity_perROI.csv")), exp


def test_cli_batched_devices_mesh(golden_intensity_dir, tmp_path):
    """--batched --devices N shards the batch axis over the (virtual CPU)
    mesh from the CLI; rows match the single-device golden run."""
    folder = os.path.join(golden_intensity_dir, "e1_P0")
    rc = main(["intensity", folder, "--channels", "2", "3", "--batched",
               "--devices", "4", "--out", str(tmp_path), "--lang", "en"])
    assert rc == 0
    df = pd.read_csv(tmp_path / "xls" / "fluor_intensity_perROI.csv")
    assert len(df) == 18
    gold = pd.read_csv(os.path.join(folder, "RES", "xls",
                                    "fluor_intensity_perROI.csv"))
    a = df.sort_values("roi")["ch2_mean"].to_numpy()
    b = gold.sort_values("roi")["ch2_mean"].to_numpy()
    assert (abs(a - b) <= 1e-4 * abs(b)).all()


def test_cli_malformed_ch_map_is_friendly(tmp_path):
    """Malformed --colors/--per-channel-p specs exit with a usage message,
    not a raw ValueError traceback."""
    import pytest

    from imageprocess_tpu.cli import main

    (tmp_path / "S01_1.TIF").write_bytes(b"")
    for argv in (
        ["intensity", str(tmp_path), "--colors", "Green"],
        ["intensity", str(tmp_path), "--colors", "x=Red"],
        ["intensity", str(tmp_path), "--per-channel-p", "2"],
    ):
        with pytest.raises(SystemExit) as e:
            main(argv)
        assert "pairs" in str(e.value)


def test_cli_intensity_devices_implies_batched(golden_intensity_dir, tmp_path,
                                               capsys):
    """`--devices N` without `--batched` must run the sharded batched
    runner (like nesprin2/fa), not silently drop the sharding request on
    the serial path."""
    from imageprocess_tpu.cli import main

    folder = os.path.join(golden_intensity_dir, "e1_P0")
    rc = main(["intensity", folder, "--channels", "2", "3", "--devices", "2",
               "--out", str(tmp_path / "o"), "--lang", "en"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[batch]" in out or "[배치]" in out
    assert (tmp_path / "o" / "xls" / "fluor_intensity_perROI.csv").exists()


def test_cli_intensity_png_batched_says_serial(golden_intensity_dir, tmp_path,
                                               capsys):
    """--batched with --png falls back to the serial runner AND says so
    (the mesh/sharding request is dropped there)."""
    from imageprocess_tpu.cli import main

    folder = os.path.join(golden_intensity_dir, "e1_P0")
    rc = main(["intensity", folder, "--channels", "2", "--batched", "--png",
               "--out", str(tmp_path / "o2"), "--lang", "en"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "serial runner" in out or "직렬 러너" in out
    assert "[batch]" not in out


def test_cli_docs_are_fresh(monkeypatch):
    """docs/CLI.md is generated from the argparse tree; a flag change
    without regenerating (python scripts/gen_cli_docs.py) fails here."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_cli_docs", os.path.join(root, "scripts", "gen_cli_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    # argparse wraps help to $COLUMNS: pin it so the comparison is stable
    # (render() itself pins the i18n language, which other tests mutate)
    monkeypatch.setenv("COLUMNS", "80")
    spec.loader.exec_module(mod)
    with open(os.path.join(root, "docs", "CLI.md")) as f:
        assert f.read() == mod.render()
