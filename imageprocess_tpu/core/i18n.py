"""i18n: ko/en message catalogs + ``t()`` lookup + ``-mode EN`` argv flag.

The reference ships per-script STRINGS dicts with a ``t(key)`` helper and a
``-mode EN`` command-line switch (src/INT/Fluor_INT.py:37-254,
``pick_lang_from_argv`` :244-254); Korean is the default.  The rebuild keeps
one merged catalog for all CLI/pipeline messages with the same lookup and
flag semantics (plus the conventional ``--lang``).
"""

from __future__ import annotations

from typing import Optional, Sequence

DEFAULT_LANG = "ko"
LANG_CURRENT = DEFAULT_LANG

STRINGS = {
    "ko": {
        "app_title": "ImageProcess TPU — 형광 이미지 정량 분석",
        "run_start": "================= 실행 시작 =================",
        "run_end": "================= 실행 종료 =================",
        "log_no_ch": "[스킵] {stid} — 채널 없음",
        "log_no_roi": "[스킵] {stid} — ROI 없음",
        "log_done_quant": "[완료-정량] {stid} ROI={roi_count}",
        "log_save_xls": "[저장 완료] {path}",
        "msg_no_pairs": "매칭되는 (donor, fret) 채널 쌍이 없습니다.",
        "msg_info_pairs": "[정보] 총 처리 대상 쌍: {count}",
        "msg_processing": "[처리] {tag} ...",
        "msg_warn_no_roi_tag": "[경고] {tag}: ROI 없음 — 건너뜀",
        "msg_done_outdir": "[완료] 출력 폴더: {dir}",
        "warn_no_map": "[스킵] 채널 ch={ch}에 해당하는 파일을 찾지 못했습니다.",
        "done_all": "[완료] 모든 크롭 작업 완료.",
        "auto_found": "[자동분할] {tag}: ROI {count}개",
        "ppt_done": "FRET_timelapse_auto.pptx 생성 완료",
        "ppt_no_pairs": "유효한 FRET/BF 페어가 없습니다.",
        "progress": "[진행] {done}/{total}",
        "elapsed": "[소요] {mm:02d}:{ss:02d}",
    },
    "en": {
        "app_title": "ImageProcess TPU — fluorescence image quantification",
        "run_start": "================= Run start =================",
        "run_end": "================= Run end =================",
        "log_no_ch": "[SKIP] {stid} — no channels",
        "log_no_roi": "[SKIP] {stid} — no ROI",
        "log_done_quant": "[DONE-QUANT] {stid} ROI={roi_count}",
        "log_save_xls": "[Saved] {path}",
        "msg_no_pairs": "No matched (donor, fret) channel pairs.",
        "msg_info_pairs": "[Info] pairs to process: {count}",
        "msg_processing": "[Processing] {tag} ...",
        "msg_warn_no_roi_tag": "[Warn] {tag}: no ROI — skipped",
        "msg_done_outdir": "[Done] output folder: {dir}",
        "warn_no_map": "[SKIP] no files for channel ch={ch}.",
        "done_all": "[Done] all crops complete.",
        "auto_found": "[auto-seg] {tag}: {count} ROIs",
        "ppt_done": "FRET_timelapse_auto.pptx created",
        "ppt_no_pairs": "No valid FRET/BF pairs.",
        "progress": "[Progress] {done}/{total}",
        "elapsed": "[Elapsed] {mm:02d}:{ss:02d}",
    },
}


def t(key: str, default: Optional[str] = None, lang: Optional[str] = None) -> str:
    """Reference-style lookup: catalog[lang][key], falling back to the
    provided default, then the key itself."""
    lang = (lang or LANG_CURRENT).lower()
    table = STRINGS.get(lang, STRINGS[DEFAULT_LANG])
    if key in table:
        return table[key]
    if default is not None:
        return default
    return STRINGS["en"].get(key, key)


def pick_lang_from_argv(argv: Sequence[str]) -> str:
    """``-mode EN`` / ``-mode KO`` (reference flag, Fluor_INT.py:244-254) and
    ``--lang en|ko``.  Unknown values keep the default."""
    lang = DEFAULT_LANG
    args = list(argv)
    for i, a in enumerate(args):
        if a == "-mode" and i + 1 < len(args):
            v = args[i + 1].lower()
            if v in STRINGS:
                lang = v
        elif a.startswith("--lang"):
            v = a.split("=", 1)[1] if "=" in a else (
                args[i + 1] if i + 1 < len(args) else "")
            if v.lower() in STRINGS:
                lang = v.lower()
    return lang


def set_lang(lang: str) -> None:
    global LANG_CURRENT
    if lang.lower() in STRINGS:
        LANG_CURRENT = lang.lower()
