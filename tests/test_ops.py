import numpy as np
import jax.numpy as jnp
import pytest

from imageprocess_tpu.ops import (
    auto_minmax,
    bg_correct,
    bg_value,
    clip_ratio_to_nan,
    exact_quantile_pos,
    masked_quantile,
    masked_stats,
    pick_epsilon,
    ratio_with_eps,
    roi_stats,
    saturation_to_nan,
    spectral_correct,
    strided_submask,
)
from imageprocess_tpu.ops.percentile import p1000_of

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("n", [1, 2, 3, 99, 100, 101, 786432, 3145728, 20_000_000])
@pytest.mark.parametrize("p", [0.0, 1.0, 5.0, 50.0, 95.0, 99.0, 100.0, 2.5, 0.1])
def test_exact_quantile_pos(n, p):
    k, g = exact_quantile_pos(jnp.int32(n), p1000_of(p))
    h = (n - 1) * p / 100.0  # exact in python floats
    assert int(k) == int(np.floor(h + 1e-12)) or abs(h - round(h)) < 1e-9
    np.testing.assert_allclose(float(k) + float(g), h, atol=1e-6 * max(h, 1))


@pytest.mark.parametrize("n", [21_474_837, 21_474_838, 100_000_000,
                               1_000_000_001, 2_147_483_647])
@pytest.mark.parametrize("p", [0.1, 5.0, 50.0, 95.0, 99.9, 100.0])
def test_exact_quantile_pos_full_int32_range(n, p):
    """Above n-1 ~ 2.1e7 the old single-level decomposition overflowed
    int32 (silently corrupting every quantile on >21.5 Mpix frames, e.g.
    row-sharded stitched FOVs); the two-level form is exact for ANY
    int32 n."""
    p1000 = p1000_of(p)
    k, g = exact_quantile_pos(jnp.int32(n), p1000)
    k_true, rem_true = divmod((n - 1) * p1000, 100000)  # exact python ints
    assert int(k) == k_true, (int(k), k_true)
    np.testing.assert_allclose(float(g), rem_true / 100000.0, atol=2e-7)


@pytest.mark.parametrize("p", [1.0, 5.0, 50.0, 95.0, 99.0])
@pytest.mark.parametrize("kind", ["u16", "float"])
def test_masked_quantile_matches_numpy(p, kind):
    if kind == "u16":
        x = RNG.integers(0, 4096, size=(257, 129)).astype(np.float32)
    else:
        x = (RNG.random((257, 129)) * 1000).astype(np.float32)
    mask = RNG.random((257, 129)) < 0.7
    ours = float(masked_quantile(jnp.asarray(x), jnp.asarray(mask), p1000_of(p)))
    ref = float(np.percentile(x[mask], p))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-4)


def test_masked_quantile_empty():
    x = jnp.zeros((4, 4))
    assert np.isnan(float(masked_quantile(x, jnp.zeros((4, 4), bool), 50000)))


def test_strided_submask_matches_slicing():
    x = (RNG.random((64, 48)) * 100).astype(np.float32)
    mask = RNG.random((64, 48)) < 0.5
    for stride in (1, 2, 4, 7):
        sub = np.asarray(strided_submask(jnp.asarray(mask), stride))
        ref_vals = x[mask][::stride]
        np.testing.assert_array_equal(np.sort(x[sub]), np.sort(ref_vals))


@pytest.mark.parametrize("stride", [1, 4])
@pytest.mark.parametrize("scoped", [False, True])
def test_bg_value_percentile_parity(stride, scoped):
    img = RNG.integers(0, 4096, size=(128, 96)).astype(np.float32)
    scope = (RNG.random((128, 96)) < 0.3) if scoped else None
    # reference semantics
    vals = img[scope] if scoped else img.ravel()
    vals = vals[::stride] if stride > 1 else vals
    ref = float(np.percentile(vals, 1.0))
    ours = float(
        bg_value(
            jnp.asarray(img),
            1000,
            None if scope is None else jnp.asarray(scope),
            "percentile",
            stride,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-4)


def test_bg_correct_clip():
    img = jnp.asarray(np.array([[0.0, 10.0, 100.0]], np.float32))
    out, b = bg_correct(img, 50000, stride=1)  # median = 10
    assert float(b) == 10.0
    np.testing.assert_allclose(np.asarray(out), [[0.0, 0.0, 90.0]])
    out2, _ = bg_correct(img, 50000, stride=1, clip_neg=False)
    np.testing.assert_allclose(np.asarray(out2), [[-10.0, 0.0, 90.0]])


def test_bg_hist_mode_close_to_numpy_reference():
    img = RNG.integers(0, 4000, size=(256, 256)).astype(np.float32)
    # reference hist-mode
    vals = img.ravel()
    hist, bins = np.histogram(vals, bins=2048)
    cdf = np.cumsum(hist).astype(float)
    cdf /= cdf[-1]
    idx = int(np.searchsorted(cdf, 0.01, side="left"))
    ref = bins[-1] if idx >= len(bins) - 1 else 0.5 * (bins[idx] + bins[idx + 1])
    ours = float(bg_value(jnp.asarray(img), 1000, None, "hist-mode", 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2.0)


def _np_stats(vals):
    vals = vals[np.isfinite(vals)]
    return dict(
        mean=np.mean(vals), median=np.median(vals), std=np.std(vals),
        p5=np.percentile(vals, 5), p95=np.percentile(vals, 95),
        vmin=np.min(vals), vmax=np.max(vals), vsum=np.sum(vals), npx=vals.size,
    )


def test_masked_stats_matches_numpy():
    img = RNG.integers(0, 4096, size=(200, 150)).astype(np.float32)
    img[5, 5] = np.nan
    mask = RNG.random((200, 150)) < 0.4
    mask[5, 5] = True
    ours = masked_stats(jnp.asarray(img), jnp.asarray(mask))
    ref = _np_stats(img[mask])
    for k, v in ref.items():
        np.testing.assert_allclose(
            float(ours[k]), float(v), rtol=1e-5, atol=1e-4, err_msg=k
        )


def test_masked_stats_empty():
    ours = masked_stats(jnp.zeros((8, 8)), jnp.zeros((8, 8), bool))
    assert int(ours["npx"]) == 0
    for k in ("mean", "median", "std", "p5", "p95", "vmin", "vmax", "vsum"):
        assert np.isnan(float(ours[k])), k


def test_roi_stats_shapes():
    imgs = jnp.asarray(RNG.random((2, 64, 64)).astype(np.float32))
    masks = jnp.asarray(RNG.random((3, 64, 64)) < 0.5)
    out = roi_stats(imgs, masks)
    assert out["mean"].shape == (2, 3)
    for c in range(2):
        for r in range(3):
            ref = _np_stats(np.asarray(imgs[c])[np.asarray(masks[r])])
            np.testing.assert_allclose(float(out["mean"][c, r]), ref["mean"], rtol=1e-5)
            np.testing.assert_allclose(float(out["median"][c, r]), ref["median"], rtol=1e-5)


def test_auto_minmax():
    img = jnp.asarray(np.arange(10000, dtype=np.float32).reshape(100, 100))
    lo, hi = auto_minmax(img)
    np.testing.assert_allclose(float(lo), np.percentile(np.arange(10000), 1), rtol=1e-6)
    np.testing.assert_allclose(float(hi), np.percentile(np.arange(10000), 99), rtol=1e-6)
    # degenerate
    lo, hi = auto_minmax(jnp.zeros((4, 4)))
    assert float(hi) > float(lo)


def test_auto_minmax_constant_large_value():
    """float32: lo + 1e-6 == lo once lo >= ~16 (ulp exceeds the epsilon),
    so the flat reference guard silently returned hi == lo on constant
    bright frames — the scaled epsilon must keep hi > lo."""
    lo, hi = auto_minmax(jnp.full((16, 16), 1000.0, jnp.float32))
    assert float(lo) == 1000.0
    assert float(hi) > float(lo)


def test_bg_hist_mode_ignores_nan_in_scope():
    """A QC-NaN'd pixel inside the scope mask must not be binned (the
    int32 cast of NaN lands in an arbitrary bin and skews the CDF):
    hist-mode over a NaN-bearing frame == hist-mode with those pixels
    masked out."""
    x = (RNG.random((64, 64)) * 100).astype(np.float32)
    x[5:9, 5:9] = np.nan
    mask = np.ones_like(x, bool)
    got = float(bg_value(jnp.asarray(x), p1000_of(5.0),
                         scope_mask=jnp.asarray(mask), mode="hist-mode",
                         stride=1))
    want = float(bg_value(jnp.asarray(x), p1000_of(5.0),
                          scope_mask=jnp.asarray(mask & np.isfinite(x)),
                          mode="hist-mode", stride=1))
    assert np.isfinite(got)
    assert got == want


def test_ratio_and_qc():
    d = jnp.asarray(np.array([[10.0, 100.0]], np.float32))
    a = jnp.asarray(np.array([[20.0, 4095.0]], np.float32))
    eps = pick_epsilon(d, eps_abs=5.0, p_floor1000=1000)
    assert float(eps) >= 5.0
    r = ratio_with_eps(a, d, 5.0)
    np.testing.assert_allclose(np.asarray(r), [[25.0 / 15.0, 4100.0 / 105.0]], rtol=1e-6)
    sat = saturation_to_nan(a, 4095.0)
    assert np.isnan(np.asarray(sat)[0, 1]) and not np.isnan(np.asarray(sat)[0, 0])
    rc = clip_ratio_to_nan(r, 10.0)
    assert np.isnan(np.asarray(rc)[0, 1])


def test_pick_epsilon_percentile_floor():
    d = jnp.asarray(np.full((100,), 50.0, np.float32))
    eps = pick_epsilon(d, eps_abs=5.0, p_floor1000=1000)
    assert float(eps) == 50.0


def test_spectral_correct():
    f = jnp.asarray(np.array([100.0], np.float32))
    d = jnp.asarray(np.array([10.0], np.float32))
    ao = jnp.asarray(np.array([20.0], np.float32))
    out = spectral_correct(f, d, ao, alpha=0.5, beta=0.25, g_factor=2.0)
    np.testing.assert_allclose(np.asarray(out), [(100 - 5 - 5) * 2.0])
    out2 = spectral_correct(f, d, None, alpha=0.5, beta=0.25, g_factor=1.0)
    np.testing.assert_allclose(np.asarray(out2), [95.0])


def test_integral_hist_quantile_matches_sort_path():
    """u16 frames take the 65536-bin histogram quantile (no megapixel
    sort); must be bit-identical to the f32 sort path and np.percentile."""
    import jax.numpy as jnp

    from imageprocess_tpu.ops.background import bg_value

    rng = np.random.default_rng(11)
    img = rng.integers(0, 65536, (300, 257)).astype(np.uint16)
    for stride in (1, 4):
        for p1000 in (0, 1000, 50000, 99900, 100000):
            a = float(bg_value(jnp.asarray(img), p1000, None, "percentile",
                               stride))
            b = float(bg_value(jnp.asarray(img, jnp.float32), p1000, None,
                               "percentile", stride))
            want = float(np.percentile(
                img.ravel()[::stride].astype(np.float64), p1000 / 1000.0))
            assert a == b, (stride, p1000, a, b)
            assert abs(a - want) < 1e-3, (stride, p1000, a, want)


def test_integral_hist_quantile_masked_scope():
    import jax.numpy as jnp

    from imageprocess_tpu.ops.background import bg_value

    rng = np.random.default_rng(12)
    img = rng.integers(0, 4000, (128, 96)).astype(np.uint16)
    mask = rng.random((128, 96)) > 0.5
    for stride in (1, 4):
        a = float(bg_value(jnp.asarray(img), 1000, jnp.asarray(mask),
                           "percentile", stride))
        b = float(bg_value(jnp.asarray(img, jnp.float32), 1000,
                           jnp.asarray(mask), "percentile", stride))
        assert a == b, (stride, a, b)


def test_bg_value_wide_integer_dtypes_not_clipped():
    """int32/int16 frames must NOT take the u16 fast paths (they would
    clip at 65535 / 0); the background comes out exact regardless."""
    import jax.numpy as jnp

    from imageprocess_tpu.ops.background import bg_value

    rng = np.random.default_rng(13)
    img = rng.integers(0, 200000, (200, 160)).astype(np.int32)
    for stride in (1, 4):
        got = float(bg_value(jnp.asarray(img), 1000, None, "percentile",
                             stride))
        want = float(np.percentile(
            img.ravel()[::stride].astype(np.float32).astype(np.float64),
            1.0))
        assert abs(got - want) <= 1e-3 * max(1.0, abs(want)), (stride, got, want)
    # masked scope too
    mask = rng.random((200, 160)) > 0.5
    got = float(bg_value(jnp.asarray(img), 1000, jnp.asarray(mask),
                         "percentile", 1))
    vals = img[mask].astype(np.float32)
    want = float(np.percentile(vals.astype(np.float64), 1.0))
    assert abs(got - want) <= 1e-3 * max(1.0, abs(want))
