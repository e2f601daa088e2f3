import numpy as np
import pytest

from imageprocess_tpu.core.naming import (
    ChannelGrammar,
    FrameKey,
    build_keymap,
    build_pairs_by_channel,
    clean_base_for_save,
    find_roi_basepath,
    fmt_stage,
    fmt_time,
    list_tifs,
    natural_key,
    parse_tokens,
    swap_channel_in_name,
)

A = ChannelGrammar.TOKEN_OR_LAST
B = ChannelGrammar.END_ANCHORED
C = ChannelGrammar.KEYWORD


def test_natural_sort():
    names = ["S10_1.TIF", "S2_1.TIF", "S1_1.TIF"]
    assert sorted(names, key=natural_key) == ["S1_1.TIF", "S2_1.TIF", "S10_1.TIF"]


@pytest.mark.parametrize(
    "name,timelapse,expect",
    [
        ("S01_2.TIF", False, (1, None, 2)),
        ("S01_t03_2.TIF", True, (1, 3, 2)),
        ("S01_t03_2.TIF", False, (1, None, 2)),
        ("S5_ch12.tif", False, (5, None, 12)),
        ("S5_c7.tif", False, (5, None, 7)),
        ("exp_S2-t10_3.tiff", True, (2, 10, 3)),
        # time digits excluded from last-number channel fallback
        ("S01_t03.TIF", True, (1, 3, None)),
        ("noStage_4.TIF", False, (None, None, 4)),
    ],
)
def test_parse_grammar_a(name, timelapse, expect):
    k = parse_tokens(name, timelapse, A)
    assert (k.stage, k.time, k.channel) == expect


def test_grammar_a_stage_needs_boundary():
    # 'XS01' has no [_-] or start boundary before S -> no stage in grammar A,
    # but loose grammar B finds it.
    assert parse_tokens("XS01_2.TIF", False, A).stage is None
    assert parse_tokens("XS01_2.TIF", False, B).stage == 1


@pytest.mark.parametrize(
    "name,timelapse,expect",
    [
        ("S01_2.TIF", False, (1, None, 2)),
        ("S01_t03_2.TIF", True, (1, 3, 2)),
        ("S01_ch4.TIF", False, (1, None, 4)),
        # end-anchored: a mid-name number is NOT a channel
        ("S01_2_final.TIF", False, (1, None, None)),
        # loose stage regex matches any s+digits, even mid-word
        ("es7_1.tif", False, (7, None, 1)),
    ],
)
def test_parse_grammar_b(name, timelapse, expect):
    k = parse_tokens(name, timelapse, B)
    assert (k.stage, k.time, k.channel) == expect


@pytest.mark.parametrize(
    "name,expect_ch",
    [
        ("S01_2.TIF", 2),
        ("S01_CFP.TIF", 1),
        ("S01_donor.TIF", 1),
        ("S01_FRET.TIF", 2),
        ("S01_YFP.TIF", 2),
        ("S01_acceptor.TIF", 2),
        ("S01_whatever.TIF", None),
    ],
)
def test_parse_grammar_c_keywords(name, expect_ch):
    assert parse_tokens(name, True, C).channel == expect_ch


def test_fmt_and_clean_base():
    assert fmt_stage(1) == "S01"
    assert fmt_time(0) == "t00"
    assert clean_base_for_save("S1_2.TIF", False) == "S01"
    assert clean_base_for_save("S1_t3_2.TIF", True) == "S01_t03"
    assert clean_base_for_save("plain_7.TIF", False) == "plain"
    assert (
        clean_base_for_save("plain_7.TIF", False, B, strip_trailing_number_fallback=False)
        == "plain_7"
    )


def test_keymap_and_pairs(tmp_path):
    files = [
        str(tmp_path / n)
        for n in ["S2_1.TIF", "S2_2.TIF", "S1_1.TIF", "S1_2.TIF", "S3_1.TIF"]
    ]
    km = build_keymap(files, timelapse=False)
    assert list(km.keys()) == [("S01", None), ("S02", None), ("S03", None)]
    assert set(km[("S01", None)].keys()) == {1, 2}

    pairs, _ = build_pairs_by_channel(files, False, donor_ch=1, acceptor_ch=2)
    assert [p[0] for p in pairs] == [("S01", None), ("S02", None)]
    assert pairs[0][1].endswith("S1_1.TIF")
    assert pairs[0][2].endswith("S1_2.TIF")


def test_list_tifs_dedup_and_sort(tmp_path):
    for n in ["S10_1.TIF", "S2_1.tif", "S1_1.tiff"]:
        (tmp_path / n).write_bytes(b"")
    out = list_tifs(str(tmp_path))
    assert [n.split("/")[-1] for n in out] == ["S1_1.tiff", "S2_1.tif", "S10_1.TIF"]


def test_find_roi_basepath_legacy_fallback(tmp_path):
    (tmp_path / "S1.json").write_text("{}")
    base = find_roi_basepath(str(tmp_path), "S01_2.TIF", False)
    assert base.endswith("S1")
    (tmp_path / "S01.json").write_text("{}")
    base = find_roi_basepath(str(tmp_path), "S01_2.TIF", False)
    assert base.endswith("S01")


def test_swap_channel_in_name():
    assert swap_channel_in_name("/a/S01_t00_2.TIF", 3).endswith("S01_t00_3.TIF")
    assert swap_channel_in_name("/a/S01_ch2.TIF", 4).endswith("S01_4.TIF") or \
        swap_channel_in_name("/a/S01_ch2.TIF", 4).endswith("S01_ch4.TIF")


def test_reference_parity_grammar_a(golden_intensity_dir):
    """Our grammar-A parse matches the reference's committed dataset layout."""
    import os

    folder = os.path.join(golden_intensity_dir, "e1_P0")
    files = list_tifs(folder)
    assert len(files) == 4
    km = build_keymap(files, timelapse=False)
    assert list(km.keys()) == [("S01", None)]
    assert sorted(km[("S01", None)].keys()) == [1, 2, 3, 4]
