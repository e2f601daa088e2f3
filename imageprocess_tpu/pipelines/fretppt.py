"""FRET timelapse -> PowerPoint deck (the reference's
Make_FRET_timelapsePPT).

Reference semantics: src/FRET/Make_FRET_timelapsePPT.py — filename pattern
``S##_t##_roi#_<suffix>.{png,tif}`` (:36-39), keyword channel classifier
(:47-56, fret: dov/ratio/fret; bf: bf/phase/dic/ch*), pair collection
(:59-97, FRET+BF both present, time-sorted), 16:9 slide layout with
auto-shrink and per-(stage, roi) slides (:100-188), output
``FRET_timelapse_auto.pptx`` in the image folder.
"""

from __future__ import annotations

import os
import re
from collections import defaultdict
from typing import Dict, List, Tuple

from ..report.pptxlite import Presentation, cm

FNAME_PATTERN = re.compile(
    r"^(S\d+)_t(\d+)_roi(\d+)_(.+)\.(png|tif|tiff)$", re.IGNORECASE
)


def classify_channel(suffix: str):
    suf = suffix.lower()
    if "dov" in suf or "ratio" in suf or "fret" in suf:
        return "fret"
    if "bf" in suf or "phase" in suf or "dic" in suf or suf.startswith("ch"):
        return "bf"
    return None


def collect_pairs(img_dir: str) -> Dict[Tuple[str, str], List[Tuple[int, str, str]]]:
    """{(stage, roi): [(time, fret_path, bf_path), ...]} time-sorted."""
    raw: Dict[Tuple[str, str, int], Dict[str, str]] = defaultdict(dict)
    for fname in os.listdir(img_dir):
        fpath = os.path.join(img_dir, fname)
        if not os.path.isfile(fpath):
            continue
        m = FNAME_PATTERN.match(fname)
        if not m:
            continue
        stage, t_str, roi, suffix, _ext = m.groups()
        ch_type = classify_channel(suffix)
        if ch_type is None:
            continue
        raw[(stage, roi, int(t_str))][ch_type] = fpath

    timeline: Dict[Tuple[str, str], List[Tuple[int, str, str]]] = defaultdict(list)
    for (stage, roi, t), d in raw.items():
        if "fret" in d and "bf" in d:
            timeline[(stage, roi)].append((t, d["fret"], d["bf"]))
    for key in timeline:
        timeline[key].sort(key=lambda x: x[0])
    return timeline


def build_ppt(timeline, img_dir: str, img_width_cm: float = 2.0):
    """(success, message); writes ``FRET_timelapse_auto.pptx``."""
    if not timeline:
        return False, "no valid FRET/BF pairs found"

    prs = Presentation(slide_width=cm(33.867), slide_height=cm(19.05))
    left_margin = cm(1.0)
    top_margin = cm(1.5)
    row_gap = cm(0.3)
    col_gap = cm(0.1)
    desired_img_w = cm(img_width_cm)

    def sort_key(item):
        (stage, roi) = item[0]
        return (int(stage[1:]), int(roi))

    for (stage, roi), seq in sorted(timeline.items(), key=sort_key):
        if not seq:
            continue
        slide = prs.add_slide()
        n = len(seq)
        total_gap = col_gap * (n - 1) if n > 1 else 0
        needed = left_margin * 2 + desired_img_w * n + total_gap
        if needed > prs.slide_width:
            scale = (prs.slide_width - left_margin * 2 - total_gap) / (
                desired_img_w * n)
            if scale <= 0:
                return False, (f"{stage} ROI{roi}: too many images to fit; "
                               "reduce image width or timepoints")
            img_w = int(desired_img_w * scale)
        else:
            img_w = desired_img_w

        fret_top = top_margin
        bf_top = fret_top + img_w + row_gap
        for idx, (t, fret_path, bf_path) in enumerate(seq):
            left = left_margin + idx * (img_w + col_gap)
            slide.add_picture(fret_path, left, fret_top, width=img_w)
            slide.add_picture(bf_path, left, bf_top, width=img_w)
        slide.add_textbox(
            f"{stage}  ROI{roi}  (top: FRET / bottom: BF, "
            f"t00 -> t{seq[-1][0]:02d})",
            cm(1.0), cm(0.5), cm(15), cm(1.0),
        )

    out_path = os.path.join(img_dir, "FRET_timelapse_auto.pptx")
    prs.save(out_path)
    return True, out_path


def run_fret_ppt(img_dir: str, img_width_cm: float = 2.0, log=print):
    timeline = collect_pairs(img_dir)
    ok, msg = build_ppt(timeline, img_dir, img_width_cm)
    log(("[saved] " if ok else "[failed] ") + str(msg))
    return ok, msg
