import os

import numpy as np
import pytest

from imageprocess_tpu.core import roiio, tiffio


def test_tiff_u16_roundtrip(tmp_path):
    img = (np.random.default_rng(0).random((64, 48)) * 65535).astype(np.uint16)
    p = str(tmp_path / "a.tif")
    tiffio.write_tiff16(p, img)
    back = tiffio.read_tiff(p)
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back, img)


def test_tiff_f32_roundtrip(tmp_path):
    img = np.random.default_rng(1).random((32, 32)).astype(np.float32)
    p = str(tmp_path / "f.tif")
    tiffio.write_tiff32(p, img)
    back = tiffio.read_tiff(p)
    assert back.dtype == np.float32
    np.testing.assert_array_equal(back, img)


def test_read_2d_squeeze_modes():
    a3 = np.zeros((4, 8, 3), dtype=np.uint16)
    a3[..., 0] = 7
    assert tiffio.squeeze_first_channel(a3).shape == (4, 8)
    assert (tiffio.squeeze_first_channel(a3) == 7).all()
    # smallest-axis heuristic picks axis 2 (size 3)
    assert tiffio.squeeze_smallest_axis(a3).shape == (4, 8)
    chw = np.zeros((3, 4, 8), dtype=np.uint16)
    assert tiffio.squeeze_smallest_axis(chw).shape == (4, 8)


def test_normalize_to_u16():
    img = np.array([[0.0, 50.0, 100.0]], dtype=np.float32)
    out = tiffio.normalize_to_u16(img, 0.0, 100.0)
    assert out.dtype == np.uint16
    assert out[0, 0] == 0 and out[0, 2] == 65535 and 32000 < out[0, 1] < 33500


def test_roi_bundle_roundtrip(tmp_path):
    polys = [np.array([[1.0, 2.0], [10.0, 2.0], [10.0, 12.0]]),
             np.array([[0.0, 0.0], [5.0, 0.0], [5.0, 5.0], [0.0, 5.0]])]
    p = str(tmp_path / "roi" / "S01.json")
    roiio.save_roi_bundle(p, "S01", (100, 200), polys, view_params={"gamma": 1.0})
    loaded = roiio.load_roi_polygons(p)
    assert len(loaded) == 2
    np.testing.assert_allclose(loaded[0], polys[0])
    bundle = roiio.load_roi_bundle(p)
    assert bundle["image_shape"] == {"height": 100, "width": 200}
    assert bundle["view_params"]["gamma"] == 1.0


def test_mask_png_pad_crop(tmp_path):
    from PIL import Image

    m = np.zeros((10, 10), dtype=np.uint8)
    m[2:5, 3:7] = 255
    p = str(tmp_path / "S01.png")
    Image.fromarray(m).save(p)
    mask = roiio.load_mask_png(p)
    assert mask.sum() == 12
    padded = roiio.load_mask_png(p, img_shape=(12, 8))
    assert padded.shape == (12, 8)
    assert padded.sum() == 3 * 4  # cols 3..6 all kept within width 8


def test_imagej_roi_roundtrip(tmp_path):
    polys = [np.array([[10.0, 20.0], [30.0, 20.0], [30.0, 40.0], [10.0, 40.0]]),
             np.array([[1.0, 1.0], [4.0, 2.0], [2.0, 6.0]])]
    zp = str(tmp_path / "S01.zip")
    roiio.save_imagej_roi_zip(zp, polys, "S01")
    back = roiio.load_imagej_roi_zip(zp)
    assert len(back) == 2
    np.testing.assert_allclose(back[0], polys[0])
    np.testing.assert_allclose(back[1], polys[1])


def test_imagej_roi_out_of_range_raises_and_no_tmp(tmp_path):
    """The .roi format is signed-16-bit: a stitched-frame polygon past
    x=32767 must raise an actionable ValueError (not a bare struct.error),
    and the failed zip save must not leave a .tmp behind."""
    import os

    import pytest

    with pytest.raises(ValueError, match="16-bit"):
        roiio.encode_imagej_roi(
            np.array([[40000.0, 10.0], [40010.0, 10.0], [40010.0, 20.0]]))
    zp = str(tmp_path / "big.zip")
    with pytest.raises(ValueError):
        roiio.save_imagej_roi_zip(
            zp, [np.array([[40000.0, 10.0], [40010.0, 10.0],
                           [40010.0, 20.0]])], "big")
    assert not os.path.exists(zp) and not os.path.exists(zp + ".tmp")


def test_golden_roi_json(golden_intensity_dir):
    p = os.path.join(golden_intensity_dir, "e1_P0", "roi", "S01.json")
    polys = roiio.load_roi_polygons(p)
    assert len(polys) == 18
    assert all(poly.shape[1] == 2 for poly in polys)


def test_golden_tiff_decode(golden_intensity_dir):
    p = os.path.join(golden_intensity_dir, "e1_P0", "S01_2.TIF")
    a = tiffio.read_2d(p)
    assert a.shape == (1536, 2048)
    assert a.dtype == np.float32


def test_xlsx_sheet_name_dedup(tmp_path):
    """Sanitization can collapse distinct sheet names ("a/b" and "a?b" both
    become "a_b"); duplicates make the workbook invalid, so xlsxlite must
    de-dup with numeric suffixes inside the 31-char limit."""
    from imageprocess_tpu.report.xlsxlite import read_xlsx, write_xlsx

    p = str(tmp_path / "dup.xlsx")
    write_xlsx(p, {
        "a/b": [[1]],
        "a?b": [[2]],
        "x" * 40: [[3]],
        "x" * 40 + "y": [[4]],
    })
    back = read_xlsx(p)
    assert len(back) == 4
    assert back["a_b"] == [[1]]
    assert back["a_b_2"] == [[2]]
    assert all(len(n) <= 31 for n in back)


def test_scalebar_spec_geometry():
    """Scalebar placement math: 5% margins, [2 px, 0.8W] clamp, the printed
    label reflects the CLAMPED physical length (Fluor_INT.py:588-613)."""
    from imageprocess_tpu.report.render import scalebar_spec

    s = scalebar_spec(1000, 800, scalebar_um=10.0, px_um=0.1, anchor="br")
    assert s.x1 - s.x0 == 100          # 10 um / 0.1 um/px
    assert s.x1 == 1000 - 50           # 5% right margin
    assert s.y == 800 - 40             # 5% bottom margin
    assert s.label == "10 µm" and s.label_va == "bottom"

    s = scalebar_spec(100, 100, scalebar_um=500.0, px_um=0.1, anchor="tl")
    assert s.x1 - s.x0 == 80           # clamped to 0.8 * W
    assert s.label == "8 µm"           # label follows the clamp
    assert s.x0 == 5 and s.y == 5 and s.label_va == "top"

    s = scalebar_spec(1000, 800, scalebar_um=0.01, px_um=0.1, anchor="bl")
    assert s.x1 - s.x0 == 2            # minimum bar length


def test_imagej_roi_zip_order_and_names(tmp_path):
    """>= 10 ROIs load back in ROI-number order (lexicographic sorting put
    roi_10 before roi_2 and silently mis-paired polygons with result rows),
    and the encoded name round-trips the ImageJ way (header2 + UTF-16BE)."""
    import numpy as np

    from imageprocess_tpu.core import roiio

    polys = [np.array([[i, 0], [i + 5, 0], [i + 5, 5], [i, 5]], float) * 1.0
             + i * 10 for i in range(12)]
    zp = str(tmp_path / "many.zip")
    roiio.save_imagej_roi_zip(zp, polys)
    back = roiio.load_imagej_roi_zip(zp)
    assert len(back) == 12
    for i, (orig, got) in enumerate(zip(polys, back)):
        assert np.allclose(orig, got, atol=1.0), i  # order preserved
    import zipfile

    with zipfile.ZipFile(zp) as zf:
        blob = zf.read("roi_11.roi")
    assert roiio.decode_imagej_roi_name(blob) == "roi_11"
    # nameless ROIs still decode (no header2)
    bare = roiio.encode_imagej_roi(polys[0])
    assert roiio.decode_imagej_roi_name(bare) == ""
    assert np.allclose(roiio.decode_imagej_roi(bare), np.round(polys[0]))


def test_xlsxlite_control_chars_and_col_refs(tmp_path):
    """XML-invalid control characters in cell strings are stripped (one
    stray \\x08 used to corrupt the whole workbook) and column refs are
    correct deep into multi-letter territory."""
    from imageprocess_tpu.report.xlsxlite import _col_ref, read_xlsx, write_xlsx

    p = str(tmp_path / "ctrl.xlsx")
    wide = [list("ABCDEFGHIJKLMNOPQRSTUVWXYZ") * 3]
    write_xlsx(p, {"s": [["bad\x08name\x1b", "ok\tkeep\n"], [1.5, 2]],
                   "wide": wide})
    sheets = read_xlsx(p)
    assert sheets["s"][0][0] == "badname"
    assert sheets["s"][0][1] == "ok\tkeep\n"
    assert sheets["wide"][0][:28] == wide[0][:28]
    assert _col_ref(0) == "A" and _col_ref(25) == "Z"
    assert _col_ref(26) == "AA" and _col_ref(701) == "ZZ"
    assert _col_ref(702) == "AAA" and _col_ref(2000) == "BXY"


def test_xlsxlite_numpy_scalars_and_whitespace(tmp_path):
    """numpy scalars must land as NUMBER cells (repr of np.float64 under
    numpy>=2 is 'np.float64(x)', invalid inside <v>; np.int64 fell through
    to the text branch), and significant leading/trailing whitespace needs
    xml:space=preserve or Excel trims it on load."""
    from imageprocess_tpu.report.xlsxlite import read_xlsx, write_xlsx

    p = str(tmp_path / "np.xlsx")
    write_xlsx(p, {"s": [[np.float64(1.5), np.int64(7), np.float32(2.0),
                          np.bool_(True), "  padded  "]]})
    row = read_xlsx(p)["s"][0]
    assert row[0] == 1.5 and isinstance(row[0], float)
    assert row[1] == 7 and not isinstance(row[1], str)
    assert row[2] == 2.0
    assert row[4] == "  padded  "
    import zipfile

    with zipfile.ZipFile(p) as zf:
        xml = zf.read("xl/worksheets/sheet1.xml").decode()
    assert 'xml:space="preserve"' in xml
    assert "np.float64" not in xml


def test_pptxlite_rejects_undeclared_picture_extension(tmp_path):
    """The package declares content types for png/jpg/jpeg/tif/tiff only;
    zipping any other extension would make PowerPoint reject the whole
    deck as corrupt, so add_picture must refuse it up front."""
    import pytest

    from imageprocess_tpu.report.pptxlite import Presentation

    from PIL import Image

    bmp = str(tmp_path / "img.bmp")
    Image.new("RGB", (8, 8)).save(bmp)
    deck = Presentation()
    slide = deck.add_slide()
    with pytest.raises(ValueError, match="extension"):
        slide.add_picture(bmp, 0, 0, width=914400)
