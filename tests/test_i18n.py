"""i18n routing: with ``--lang ko`` every workload's pipeline logs come from
the Korean catalog, not hardcoded English (reference: per-script STRINGS +
t(), src/INT/Fluor_INT.py:37-254; Korean is the reference default).

Each test runs a pipeline on a tiny synthetic experiment under lang=ko and
asserts at least one emitted log line contains Hangul."""

import os

import numpy as np
import pytest

from imageprocess_tpu.core import i18n, roiio, tiffio


def _has_hangul(s: str) -> bool:
    return any("가" <= c <= "힯" for c in str(s))


@pytest.fixture()
def ko_lang():
    prev = i18n.LANG_CURRENT
    i18n.set_lang("ko")
    yield
    i18n.set_lang(prev)


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    """Tiny 2-channel, 1-stage experiment with 2 polygon ROIs."""
    d = tmp_path_factory.mktemp("i18n_exp")
    rng = np.random.default_rng(3)
    H, W = 160, 192
    for ch in (1, 2):
        tiffio.write_tiff16(str(d / f"S01_{ch}.TIF"),
                            rng.integers(10, 3000, (H, W)).astype(np.uint16))
    polys = [np.array([[15, 15], [60, 18], [55, 70], [12, 66]], float),
             np.array([[70, 40], [115, 45], [110, 85], [65, 80]], float)]
    roiio.save_roi_bundle(str(d / "roi" / "S01.json"), "S01", (H, W), polys)
    return str(d)


def _run_and_collect(fn):
    logs = []
    fn(logs.append)
    assert logs, "pipeline emitted no logs"
    assert any(_has_hangul(line) for line in logs), logs
    return logs


def test_intensity_korean_logs(folder, tmp_path, ko_lang):
    from imageprocess_tpu.pipelines.intensity import IntensityConfig, run_intensity

    _run_and_collect(lambda log: run_intensity(
        folder, IntensityConfig(channels=(1, 2)),
        out_root=str(tmp_path), log=log))


def test_intensity_batched_korean_logs(folder, tmp_path, ko_lang):
    from imageprocess_tpu.pipelines.intensity import (
        IntensityConfig, run_intensity_batched,
    )

    _run_and_collect(lambda log: run_intensity_batched(
        folder, IntensityConfig(channels=(1, 2), do_xls=False),
        out_root=str(tmp_path), log=log))


def test_fret_korean_logs(folder, tmp_path, ko_lang):
    from imageprocess_tpu.pipelines.fret import FretConfig, run_fret

    _run_and_collect(lambda log: run_fret(
        folder, FretConfig(donor_ch=1, acceptor_ch=2),
        out_root=str(tmp_path), log=log))


def test_nesprin2_korean_logs(folder, tmp_path, ko_lang):
    from imageprocess_tpu.pipelines.nesprin2 import Nesprin2Config, run_nesprin2

    _run_and_collect(lambda log: run_nesprin2(
        folder, Nesprin2Config(donor_ch=1, fret_ch=2, intensity_ch=1),
        out_root=str(tmp_path), log=log))


def test_morphology_korean_logs(folder, tmp_path, ko_lang):
    from imageprocess_tpu.pipelines.morphology import MorConfig, run_morphology

    _run_and_collect(lambda log: run_morphology(
        folder, MorConfig(sel_ch=1), out_root=str(tmp_path), log=log))


def test_crop_korean_logs(folder, tmp_path, ko_lang):
    from imageprocess_tpu.pipelines.crop import CropConfig, run_crop

    import os

    _run_and_collect(lambda log: run_crop(
        folder, os.path.join(folder, "roi"), str(tmp_path),
        CropConfig(channel=1), log=log))


def test_drawer_save_korean_logs(tmp_path, ko_lang):
    """The drawer save-bundle path (round-2 i18n residue) logs in Korean."""
    from imageprocess_tpu.segment.drawer import save_drawer_bundle

    rng = np.random.default_rng(5)
    img = rng.integers(10, 3000, (96, 128)).astype(np.uint16)
    rois = [np.array([[10, 10], [50, 12], [45, 60], [8, 55]], float)]
    logs = []
    save_drawer_bundle(str(tmp_path / "roi"), "S01", rois, img,
                       log=logs.append)
    assert len(logs) == 4  # json / mask / overlay / zip
    assert all(_has_hangul(line) for line in logs), logs


def test_annotator_korean_logs(tmp_path, ko_lang):
    """Annotator ROI-add events come from the catalog under lang=ko."""
    from imageprocess_tpu.apps.draw import ROIAnnotator

    rng = np.random.default_rng(7)
    img = rng.normal(100, 10, (96, 128)).clip(0, 65535)
    img[20:60, 20:80] += 4000.0
    tif = str(tmp_path / "S01_1.TIF")
    tiffio.write_tiff16(tif, img.astype(np.uint16))
    logs = []
    ann = ROIAnnotator({1: tif}, "S01", str(tmp_path / "roi"),
                       log=logs.append)
    ann.add_rough_polygon([(15, 15), (90, 15), (90, 70), (15, 70)])
    assert any(_has_hangul(line) for line in logs), logs


def test_en_mode_still_english(folder, tmp_path):
    """-mode EN keeps the reference's English strings."""
    from imageprocess_tpu.pipelines.intensity import IntensityConfig, run_intensity

    prev = i18n.LANG_CURRENT
    i18n.set_lang("en")
    try:
        logs = []
        run_intensity(folder, IntensityConfig(channels=(1, 2)),
                      out_root=str(tmp_path), log=logs.append)
        assert logs and not any(_has_hangul(line) for line in logs)
        assert any("[DONE-QUANT]" in str(line) for line in logs)
    finally:
        i18n.set_lang(prev)
