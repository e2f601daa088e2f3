"""Adversarial FA checks against the COMMITTED golden outputs.

The FA input TIFFs were LFS-stripped from the reference clone, so full
numeric replay is impossible — but the committed per-stage CSVs
(BND_FA/individual_results/S0#_results.csv) and the ANA-level master
workbooks carry real numbers whose internal relationships pin down the FA
logic (FA_Analyzer.py:123-195): classification vs the recorded settings,
mean_corr = max(0, mean_raw - bg), integrated densities, threshold
ordering, per-cell setting constancy.  These tests fail if our FA
classification or report logic drifts from the reference semantics.
"""

import glob
import math
import os

import numpy as np
import pytest

from imageprocess_tpu.pipelines.fa import FA_CSV_COLS, FaConfig


def _rows(golden_fa_dir):
    import csv

    rows = []
    for e in ("e1", "e2"):
        for p in sorted(glob.glob(os.path.join(
                golden_fa_dir, e, "BND_FA", "individual_results",
                "*_results.csv"))):
            with open(p) as f:
                r = csv.DictReader(f)
                assert list(r.fieldnames) == FA_CSV_COLS, p
                for row in r:
                    row["_exp"] = e
                    rows.append(row)
    if not rows:
        pytest.skip("no committed FA golden CSVs")
    return rows


@pytest.fixture(scope="module")
def fa_rows(golden_fa_dir):
    return _rows(golden_fa_dir)


def test_schema_and_px_size(fa_rows):
    """Area_um2 == Area_px * px^2 with one consistent pixel size (the
    0.112 um preset, FA_Analyzer.py:353)."""
    for r in fa_rows:
        area_px = float(r["Area_px"])
        area_um = float(r["Area_um2"])
        assert area_px > 0
        px = math.sqrt(area_um / area_px)
        assert abs(px - 0.112) < 1e-9, r


def test_category_matches_our_rule(fa_rows):
    """Replays OUR classification (pipelines/fa.py: area < min_px -> Small,
    > max_px -> Large, else OK) on the golden rows using each row's
    recorded settings: any drift in the comparison or the um->px
    conversion breaks this."""
    for r in fa_rows:
        cfg = FaConfig(px_size=0.112,
                       min_area_um=float(r["Min_Area_Setting"]),
                       max_area_um=float(r["Max_Area_Setting"]))
        area = float(r["Area_px"])
        category = "OK"
        if area < cfg.min_px:
            category = "Small"
        elif area > cfg.max_px:
            category = "Large"
        assert category == r["Category"], r


def test_intensity_relationships(fa_rows):
    """mean_corr = max(0, mean_raw - bg) (float32, FA_Analyzer.py:168);
    IntDen = mean * area; FA pixels all exceed the global threshold, so
    the FA's raw mean must too; bg < threshold."""
    for r in fa_rows:
        raw = float(r["Mean_Intensity_Raw"])
        corr = float(r["Mean_Intensity_Corr"])
        bg = float(r["Background_Level"])
        thr = float(r["Global_Threshold"])
        area = float(r["Area_px"])
        assert r["Subtract_BG_Setting"] == "True"
        want_corr = np.float32(max(0.0, np.float32(raw) - np.float32(bg)))
        assert abs(corr - float(want_corr)) <= 2e-3, r
        assert abs(float(r["Int_Density_Raw"]) - raw * area) <= max(
            1.0, 1e-5 * raw * area), r
        assert abs(float(r["Int_Density_Corr"]) - corr * area) <= max(
            1.0, 1e-5 * corr * area), r
        assert raw > thr, r
        assert bg < thr, r


def test_per_cell_setting_constancy(fa_rows):
    """Within one (experiment, File, Cell_ID), the recorded bg, alpha,
    threshold and settings are constant (per-cell overrides apply to the
    whole cell, FA_Analyzer.py:572-608)."""
    seen = {}
    for r in fa_rows:
        key = (r["_exp"], r["File"], r["Cell_ID"])
        sig = (r["Background_Level"], r["Used_Alpha"], r["Global_Threshold"],
               r["Min_Area_Setting"], r["Max_Area_Setting"],
               r["Close_Radius_Setting"], r["Subtract_BG_Setting"])
        assert seen.setdefault(key, sig) == sig, key


def test_master_raw_data_matches_csvs(golden_fa_dir, fa_rows):
    """The committed ANA-level master workbook's Raw_Data sheet must agree
    with the concatenated per-stage CSVs (count + area/intensity sums) —
    also exercises xlsxlite's shared-strings reader on a third-party
    (openpyxl-written) workbook."""
    from imageprocess_tpu.report.xlsxlite import read_xlsx

    for e in ("e1", "e2"):
        p = os.path.join(golden_fa_dir, f"{e}_FA_Results_Master.xlsx")
        if not os.path.exists(p):
            pytest.skip("no committed master workbook")
        sheets = read_xlsx(p)
        raw = sheets["Raw_Data"]
        header, body = raw[0], raw[1:]
        rows_e = [r for r in fa_rows if r["_exp"] == e]
        assert len(body) == len(rows_e)
        ai = header.index("Area_um2")
        mi = header.index("Mean_Intensity_Corr")
        assert abs(sum(float(b[ai]) for b in body)
                   - sum(float(r["Area_um2"]) for r in rows_e)) < 1e-6
        assert abs(sum(float(b[mi]) for b in body)
                   - sum(float(r["Mean_Intensity_Corr"]) for r in rows_e)) < 1e-3


def test_our_master_report_on_golden_csvs(golden_fa_dir, tmp_path):
    """Run OUR merge_fa_report (FA_Analyzer.py:1054-1113 semantics) over
    the committed golden per-stage CSVs and verify the aggregation
    arithmetic against hand-computed values."""
    import shutil

    from imageprocess_tpu.pipelines.fa import merge_fa_report
    from imageprocess_tpu.report.xlsxlite import read_xlsx

    src = os.path.join(golden_fa_dir, "e1", "BND_FA", "individual_results")
    dst = tmp_path / "individual_results"
    shutil.copytree(src, dst)
    merge_fa_report(str(tmp_path), log=lambda *_: None)
    out = read_xlsx(str(tmp_path / "FA_Results_Master.xlsx"))
    assert set(out) == {"File_Summary", "Cell_Summary", "All_Data"}
    rows = _rows(golden_fa_dir)
    e1 = [r for r in rows if r["_exp"] == "e1"]
    assert len(out["All_Data"]) - 1 == len(e1)
    fs = out["File_Summary"]
    header = fs[0]
    for row in fs[1:]:
        d = dict(zip(header, row))
        mine = [r for r in e1 if r["File"] == d["File"]]
        n_cells = len({r["Cell_ID"] for r in mine})
        assert d["Total_FA_Count"] == len(mine)
        assert d["Analyzed_Cells_Count"] == n_cells
        assert abs(float(d["Avg_FA_per_Cell"])
                   - round(len(mine) / n_cells, 2)) < 1e-9
        assert d["OK"] == sum(r["Category"] == "OK" for r in mine)
