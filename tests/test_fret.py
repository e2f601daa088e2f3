"""FRET pipeline parity vs an in-test numpy replication of the reference's
``process_one_stage`` math (src/FRET/fret_ratio_builder.py:429-552) on the
golden intensity inputs (ch2 = donor, ch3 = acceptor).  The reference ships
no golden FRET outputs, so the oracle is the reference algorithm itself,
re-expressed with numpy + matplotlib (the same libraries it uses)."""

import os

import numpy as np
import pytest
from matplotlib.path import Path as MplPath

from imageprocess_tpu.core import roiio, tiffio
from imageprocess_tpu.pipelines.fret import FretConfig, run_fret


def _ref_rasterize(poly, shape):
    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W]
    pts = np.vstack((xx.ravel(), yy.ravel())).T
    return MplPath(np.asarray(poly, float)).contains_points(pts).reshape(H, W)


def _ref_fret_rows(folder):
    D = tiffio.read_2d(os.path.join(folder, "S01_2.TIF"))
    A = tiffio.read_2d(os.path.join(folder, "S01_3.TIF"))
    polys = roiio.load_roi_polygons(os.path.join(folder, "roi", "S01.json"))
    H, W = D.shape

    def bg_correct(img, p=1.0):
        B = float(np.percentile(img.ravel(), p))
        J = img - B
        J[J < 0] = 0.0
        return J, B

    Dbc, _ = bg_correct(D)
    Abc, _ = bg_correct(A)
    eps = max(5.0, float(np.percentile(Dbc.ravel(), 1.0)))
    R = (Abc + eps) / (Dbc + eps)

    rows = []
    for i, poly in enumerate(polys, 1):
        m = _ref_rasterize(poly, (H, W))
        vals = R[m]
        vals = vals[np.isfinite(vals)]
        rows.append({
            "roi": i,
            "area_px": int(m.sum()),
            "ratio_mean": float(np.mean(vals)),
            "ratio_median": float(np.median(vals)),
            "ratio_std": float(np.std(vals)),
            "ratio_p5": float(np.percentile(vals, 5)),
            "ratio_p95": float(np.percentile(vals, 95)),
            "donor_mean": float(np.mean(Dbc[m])),
            "yfret_median": float(np.median(Abc[m])),
            "eps": eps,
        })
    return rows


@pytest.fixture(scope="module")
def fret_results(golden_intensity_dir, tmp_path_factory):
    folder = os.path.join(golden_intensity_dir, "e1_P0")
    out = tmp_path_factory.mktemp("fret_out")
    cfg = FretConfig(donor_ch=2, acceptor_ch=3, do_xls=True, do_tif=True,
                     do_png=True, png_dpi=60)
    rows = run_fret(folder, cfg, out_root=str(out), log=lambda *_: None)
    return folder, rows, out


def test_fret_rows_match_reference_math(fret_results):
    folder, rows, _ = fret_results
    ref_rows = _ref_fret_rows(folder)
    assert len(rows) == len(ref_rows) == 18
    for ours, ref in zip(rows, ref_rows):
        for k, v in ref.items():
            o = ours[k]
            if isinstance(v, float):
                assert abs(o - v) / max(abs(v), 1e-12) <= 1e-4, (k, o, v)
            else:
                assert o == v, (k, o, v)
    assert rows[0]["ratio_mode"] == "FRET/Donor"
    assert rows[0]["stage"] == "S01"


def test_fret_outputs_written(fret_results):
    _, _, out = fret_results
    assert (out / "xls" / "fret_ratio_perROI.csv").exists()
    assert (out / "xls" / "fret_ratio_perROI.xlsx").exists()
    assert (out / "RAT" / "32bit" / "S01_ratio_FoverD.tif").exists()
    assert (out / "RAT" / "16bit" / "S01_ratio_FoverD_preview.tif").exists()
    assert (out / "RAT_ROI_masked" / "32bit" / "S01_ratio_FoverD.tif").exists()
    assert (out / "PNG_RAT" / "full" / "S01_ratio_FoverD.png").exists()
    crops = list((out / "PNG_RAT" / "crop").glob("S01_roi*_FoverD.png"))
    assert len(crops) == 18

    # masked 32-bit ratio: NaN outside the union
    import PIL.Image
    arr = np.array(PIL.Image.open(out / "RAT_ROI_masked" / "32bit" / "S01_ratio_FoverD.tif"))
    assert np.isnan(arr).any() and np.isfinite(arr).any()


def test_fret_ratio_mode_flip(golden_intensity_dir, tmp_path):
    folder = os.path.join(golden_intensity_dir, "e1_P0")
    cfg = FretConfig(donor_ch=2, acceptor_ch=3, ratio_mode="Donor/FRET",
                     do_xls=False, subset_stage=1)
    rows = run_fret(folder, cfg, out_root=str(tmp_path), log=lambda *_: None)
    assert len(rows) == 18
    ref = _ref_fret_rows(folder)
    # Donor/FRET numerator/denominator swap also swaps the eps source channel
    D = tiffio.read_2d(os.path.join(folder, "S01_2.TIF"))
    A = tiffio.read_2d(os.path.join(folder, "S01_3.TIF"))
    Dbc = np.clip(D - np.percentile(D.ravel(), 1.0), 0, None)
    Abc = np.clip(A - np.percentile(A.ravel(), 1.0), 0, None)
    eps = max(5.0, float(np.percentile(Abc.ravel(), 1.0)))
    R = (Dbc + eps) / (Abc + eps)
    polys = roiio.load_roi_polygons(os.path.join(folder, "roi", "S01.json"))
    m = _ref_rasterize(polys[0], D.shape)
    assert abs(rows[0]["ratio_mean"] - float(R[m].mean())) <= 1e-4 * abs(R[m].mean())


def test_fret_timelapse(tmp_path):
    """Timelapse FRET pairing + per-time rows + pivot time_idx."""
    rng = np.random.default_rng(0)
    H, W = 96, 128
    polys = [np.array([[20, 20], [70, 25], [65, 70], [15, 66]], float)]
    for t in range(3):
        for ch in (1, 2):
            tiffio.write_tiff16(str(tmp_path / f"S01_t{t:02d}_{ch}.TIF"),
                                rng.integers(10, 3000, (H, W)).astype(np.uint16))
        roiio.save_roi_bundle(str(tmp_path / "roi" / f"S01_t{t:02d}.json"),
                              f"S01_t{t:02d}", (H, W), polys)
    cfg = FretConfig(donor_ch=1, acceptor_ch=2, timelapse=True, do_xls=True)
    rows = run_fret(str(tmp_path), cfg, out_root=str(tmp_path / "RES"),
                    log=lambda *_: None)
    assert len(rows) == 3
    assert [r["time"] for r in rows] == ["t00", "t01", "t02"]
    import pandas as pd
    df = pd.read_csv(tmp_path / "RES" / "xls" / "fret_ratio_perROI.csv")
    assert list(df["time_idx"]) == [0, 1, 2]


def test_fret_batched_matches_serial(golden_intensity_dir, tmp_path):
    """run_fret_batched (host bg/eps + ROI-tile transfer) vs run_fret on
    the golden frames: identical rows within float tolerance."""
    from imageprocess_tpu.pipelines.fret import run_fret_batched

    folder = os.path.join(golden_intensity_dir, "e1_P0")
    cfg = FretConfig(donor_ch=2, acceptor_ch=3, do_xls=False)
    serial = run_fret(folder, cfg, out_root=str(tmp_path / "s"),
                      log=lambda *_: None)
    batched = run_fret_batched(folder, cfg, out_root=str(tmp_path / "b"),
                               log=lambda *_: None, batch_size=2)
    assert len(serial) == len(batched) == 18
    sd = {(r["stage"], r["time"], r["roi"]): r for r in serial}
    for r in batched:
        ref = sd[(r["stage"], r["time"], r["roi"])]
        for k, v in ref.items():
            if isinstance(v, float):
                assert abs(r[k] - v) <= 1e-5 * max(abs(v), 1e-9), (k, r[k], v)
            else:
                assert r[k] == v, k


def test_fret_batched_flip_and_fallback(golden_intensity_dir, tmp_path):
    """Donor/FRET orientation through the fast path; PNG outputs force the
    fallback to the rendering runner."""
    from imageprocess_tpu.pipelines.fret import run_fret_batched

    folder = os.path.join(golden_intensity_dir, "e1_P0")
    cfg = FretConfig(donor_ch=2, acceptor_ch=3, do_xls=False,
                     ratio_mode="Donor/FRET")
    serial = run_fret(folder, cfg, out_root=str(tmp_path / "s"),
                      log=lambda *_: None)
    batched = run_fret_batched(folder, cfg, out_root=str(tmp_path / "b"),
                               log=lambda *_: None)
    sd = {r["roi"]: r for r in serial}
    for r in batched:
        want = sd[r["roi"]]["ratio_mean"]
        assert abs(r["ratio_mean"] - want) <= 1e-5 * max(abs(want), 1e-9)

    cfg_png = FretConfig(donor_ch=2, acceptor_ch=3, do_xls=False,
                         do_png=True, save_crop=False)
    rows = run_fret_batched(folder, cfg_png, out_root=str(tmp_path / "p"),
                            log=lambda *_: None)
    assert len(rows) == 18
    assert (tmp_path / "p" / "PNG_RAT" / "full").exists()


def test_fret_batched_sharded_over_mesh(tmp_path):
    """run_fret_batched with a mesh shards the batch axis over the
    8-virtual-device CPU mesh and matches the single-device rows."""
    import numpy as np

    from imageprocess_tpu.core import roiio, tiffio
    from imageprocess_tpu.parallel.runner import make_mesh
    from imageprocess_tpu.pipelines.fret import FretConfig, run_fret_batched

    folder = tmp_path / "exp"
    rng = np.random.default_rng(0)
    H, W = 160, 192
    polys = [np.array([[15, 15], [60, 18], [55, 70], [12, 66]], float),
             np.array([[70, 40], [115, 45], [110, 85], [65, 80]], float)]
    for s in range(1, 9):
        for ch in (1, 2):
            tiffio.write_tiff16(
                str(folder / f"S{s:02d}_{ch}.TIF"),
                rng.integers(10, 3000, (H, W)).astype(np.uint16))
        roiio.save_roi_bundle(str(folder / "roi" / f"S{s:02d}.json"),
                              f"S{s:02d}", (H, W), polys)
    cfg = FretConfig(donor_ch=1, acceptor_ch=2, do_xls=False)
    single = run_fret_batched(str(folder), cfg, out_root=str(tmp_path / "a"),
                              log=lambda *_: None, batch_size=4)
    mesh = make_mesh(8)
    sharded = run_fret_batched(str(folder), cfg, out_root=str(tmp_path / "b"),
                               log=lambda *_: None, batch_size=8, mesh=mesh)
    assert len(single) == len(sharded) == 16
    sd = {(r["stage"], r["roi"]): r for r in single}
    for r in sharded:
        ref = sd[(r["stage"], r["roi"])]
        assert r["area_px"] == ref["area_px"]
        for k in ("ratio_mean", "ratio_median", "donor_mean", "eps"):
            assert abs(r[k] - ref[k]) <= 1e-5 * max(abs(ref[k]), 1e-9), k
