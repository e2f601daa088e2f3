"""Tabular report writers (pandas -> CSV/XLSX).

Column orders, derived columns, sheet layouts and filenames replicate the
reference writers so downstream analysis notebooks keep working:

- intensity: src/INT/Fluor_INT.py:728-791 (``save_excel``)
- FRET:      src/FRET/fret_ratio_builder.py:980-1011
- Nesprin2:  src/FRET/Nesprin2_FRET_Builder.py:1287-1326
- morphology: src/MOR_by_ROI.py:461-500
- FA:        src/INT/FA_Analyzer.py:1054-1113
"""

from __future__ import annotations

import os
import re
from typing import Dict, List

import pandas as pd

from ..core.naming import natural_key
from .xlsxlite import write_xlsx, _df_rows


def intensity_dataframe(rows_all: List[dict]) -> pd.DataFrame:
    """per-ROI table with the reference's column order and derived columns
    (Fluor_INT.py:731-751)."""
    df = pd.DataFrame(rows_all)
    if df.empty:
        return df
    base_cols = [
        "stage", "time", "roi", "area_px",
        "bg_mode", "bg_scope", "clip_neg", "bg_stride",
    ]
    dyn_cols = sorted(
        [c for c in df.columns if c not in base_cols], key=natural_key
    )
    df = df[base_cols + dyn_cols]
    df["stage_idx"] = df["stage"].str.extract(r"S(\d+)", expand=False).astype(int)
    if df["time"].notna().any():
        df["time_idx"] = (
            df["time"].fillna("t0").str.extract(r"t(\d+)", expand=False).astype(int)
        )
    else:
        df["time_idx"] = 0
    df["roi_lab"] = "s" + df["stage_idx"].astype(str) + "c" + df["roi"].astype(str)
    df["roi_id"] = df["stage"] + "_roi" + df["roi"].astype(str)
    return df


def save_intensity_excel(rows_all: List[dict], keymap: Dict, xls_dir: str) -> None:
    """``fluor_intensity_perROI.{xlsx,csv}`` with per-channel sheets
    (non-timelapse) or time x roi pivot matrices (timelapse)."""
    df = intensity_dataframe(rows_all)
    if df.empty:
        return
    xlsx = os.path.join(xls_dir, "fluor_intensity_perROI.xlsx")
    csv = os.path.join(xls_dir, "fluor_intensity_perROI.csv")

    ch_list = sorted(
        {int(m.group(1)) for col in df.columns
         if (m := re.match(r"ch(\d+)_mean", col))}
    )
    sheets = {"per_ROI": _df_rows(df)}
    is_tl = any(k[1] is not None for k in keymap.keys())
    if not is_tl:
        for ch in ch_list:
            keep = ["stage", "roi", "roi_id", "area_px"] + [
                c for c in df.columns if c.startswith(f"ch{ch}_")
            ]
            keep = [c for c in keep if c in df.columns]
            sub = df[keep].copy().sort_values(["stage", "roi"])
            sub.insert(0, "No.", range(1, len(sub) + 1))
            sheets[f"ch{ch}"] = _df_rows(sub)
    else:
        for ch in ch_list:
            for stat in ("mean", "median"):
                mat = df.pivot(
                    index="time_idx", columns="roi_lab",
                    values=f"ch{ch}_{stat}",
                ).sort_index()
                sheets[f"ch{ch}_{stat}_matrix"] = _df_rows(mat, index=True)
    write_xlsx(xlsx, sheets)
    df.to_csv(csv, index=False)


def save_fret_excel(rows_all: List[dict], xls_dir: str, timelapse: bool) -> None:
    """``fret_ratio_perROI.{xlsx,csv}`` with the reference's exact column
    subset/order and pivot matrices (fret_ratio_builder.py:980-1011)."""
    df = pd.DataFrame(rows_all)
    if df.empty:
        return
    cols = ["stage", "time", "roi", "area_px", "ratio_mean", "ratio_median",
            "ratio_std", "ratio_p5", "ratio_p95", "donor_mean", "donor_median",
            "yfret_mean", "yfret_median", "eps", "p", "ratio_mode", "bg_mode"]
    df = df[[c for c in cols if c in df.columns]]
    if timelapse:
        df["time_idx"] = df["time"].str.extract(r"t(\d+)", expand=False).astype(int)
    else:
        df["time_idx"] = 0
    df["stage_idx"] = df["stage"].str.extract(r"S(\d+)", expand=False).astype(int)
    df["roi_lab"] = "s" + df["stage_idx"].astype(str) + "c" + df["roi"].astype(str)
    mean_mat = df.pivot(index="time_idx", columns="roi_lab",
                        values="ratio_mean").sort_index()
    med_mat = df.pivot(index="time_idx", columns="roi_lab",
                       values="ratio_median").sort_index()
    os.makedirs(xls_dir, exist_ok=True)
    write_xlsx(os.path.join(xls_dir, "fret_ratio_perROI.xlsx"), {
        "per_ROI": _df_rows(df),
        "ratio_mean_matrix": _df_rows(mean_mat, index=True),
        "ratio_median_matrix": _df_rows(med_mat, index=True),
    })
    df.to_csv(os.path.join(xls_dir, "fret_ratio_perROI.csv"), index=False)


def save_nesprin2_excel(rows_all: List[dict], xls_dir: str, timelapse: bool) -> None:
    """``nesprin2_fret_perROI.{csv,xlsx}``
    (Nesprin2_FRET_Builder.py:1287-1326)."""
    df = pd.DataFrame(rows_all)
    if df.empty:
        return
    keep = ["stage", "time", "roi", "area_px", "ratio_mode",
            "ratio_mean", "ratio_median", "ratio_std", "ratio_p5", "ratio_p95",
            "ratio_FoverD_mean", "ratio_DoverF_mean",
            "donor_mean", "fret_mean",
            "eps", "p", "donor_p", "fret_p", "bg_scope", "bg_mode", "clip_neg",
            "sat_filter_on", "sat_threshold", "clip_ratio_on", "clip_ratio_max"]
    df = df[[c for c in keep if c in df.columns]].copy()
    df["stage_idx"] = df["stage"].str.extract(r"S(\d+)", expand=False).astype(int)
    if timelapse:
        df["time_idx"] = df["time"].str.extract(r"t(\d+)", expand=False).astype(int)
    else:
        df["time_idx"] = 0
    df["roi_lab"] = "s" + df["stage_idx"].astype(str) + "c" + df["roi"].astype(str)
    mean_mat = df.pivot(index="time_idx", columns="roi_lab",
                        values="ratio_mean").sort_index()
    med_mat = df.pivot(index="time_idx", columns="roi_lab",
                       values="ratio_median").sort_index()
    os.makedirs(xls_dir, exist_ok=True)
    df.to_csv(os.path.join(xls_dir, "nesprin2_fret_perROI.csv"), index=False)
    write_xlsx(os.path.join(xls_dir, "nesprin2_fret_perROI.xlsx"), {
        "per_ROI": _df_rows(df),
        "ratio_mean_matrix": _df_rows(mean_mat, index=True),
        "ratio_median_matrix": _df_rows(med_mat, index=True),
    })


# (A generic save_ratio_excel / save_simple_table pair used to live here;
# both were uncalled near-duplicates of save_fret_excel and were removed —
# the live writers above are the single source of the column/pivot layout.)
