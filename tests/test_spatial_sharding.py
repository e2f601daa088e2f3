"""Spatially-sharded single-frame ops vs single-device oracles, on the
8-virtual-device CPU mesh (halo exchange + psum collectives)."""

import numpy as np
import pytest

import jax.numpy as jnp

from imageprocess_tpu.parallel.runner import make_mesh
from imageprocess_tpu.parallel.spatial import (
    shard_frame,
    sharded_bg_correct_u16,
    sharded_quantile_u16,
    sharded_square_dilation,
    sharded_square_erosion,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis="rows")


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(0)
    return rng.integers(0, 4000, (256, 192)).astype(np.uint16)


@pytest.mark.parametrize("p", [1.0, 50.0, 99.0])
def test_sharded_quantile_exact(mesh, frame, p):
    run = sharded_quantile_u16(mesh, int(p * 1000))
    got = float(run(shard_frame(mesh, frame)))
    want = float(np.percentile(frame.astype(np.float64).ravel(), p))
    assert abs(got - want) < 1e-6


def test_sharded_bg_correct(mesh, frame):
    run = sharded_bg_correct_u16(mesh, 1000)
    out = np.asarray(run(shard_frame(mesh, frame)))
    bg = np.percentile(frame.astype(np.float64).ravel(), 1.0)
    want = np.clip(frame.astype(np.float32) - bg, 0, None)
    assert np.allclose(out, want, atol=1e-3)


@pytest.mark.parametrize("k", [1, 3])
def test_sharded_square_dilation_matches_single_device(mesh, k):
    import scipy.ndimage as ndi

    rng = np.random.default_rng(1)
    fg = (rng.random((256, 192)) > 0.97)
    run = sharded_square_dilation(mesh, k)
    got = np.asarray(run(shard_frame(mesh, fg)))
    want = ndi.binary_dilation(fg, np.ones((2 * k + 1, 2 * k + 1), bool))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("k", [1, 3])
def test_sharded_square_erosion_matches_single_device(mesh, k):
    """Erosion needs the +inf halo identity at edge shards: a zeros-pad
    halo (the round-1 bug class) would erode away every shard-boundary
    row.  Oracle = single-device reduce_window min with SAME padding
    (border acts foreground)."""
    import jax

    rng = np.random.default_rng(2)
    fg = (rng.random((256, 192)) > 0.3)
    fg[24:48, 50:100] = True  # solid block across the 32-row shard boundary
    run = sharded_square_erosion(mesh, k)
    got = np.asarray(run(shard_frame(mesh, fg)))
    want = np.asarray(
        jax.lax.reduce_window(
            jnp.asarray(fg, jnp.float32), jnp.inf, jax.lax.min,
            (2 * k + 1, 2 * k + 1), (1, 1), "SAME",
        ) > 0.5
    )
    assert np.array_equal(got, want)
    # and it must differ from what a zeros-filled halo would produce:
    # interior foreground rows adjacent to shard boundaries survive
    assert got.any()


@pytest.mark.parametrize("rim_px", [1, 3, 6])
def test_sharded_rim_mask_matches_single_device(mesh, rim_px):
    """Exact sharded nuclear-rim mask vs morphology.edt.rim_mask, with
    blobs crossing shard boundaries AND touching the frame edge (where
    out-of-image must act as non-background)."""
    from imageprocess_tpu.morphology.edt import rim_mask
    from imageprocess_tpu.parallel.spatial import sharded_rim_mask

    rng = np.random.default_rng(3)
    u = np.zeros((256, 192), bool)
    u[20:70, 30:120] = True      # interior blob
    u[28:37, 50:110] = True      # spans the 32-row shard boundary
    u[0:12, 150:190] = True      # touches the top frame edge
    u[240:256, 0:40] = True      # touches the bottom frame edge
    u |= rng.random((256, 192)) > 0.995
    run = sharded_rim_mask(mesh, rim_px)
    got = np.asarray(run(shard_frame(mesh, u)))
    want = np.asarray(rim_mask(jnp.asarray(u), rim_px))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("inner,outer", [(2, 5), (1, 2), (4, 9)])
def test_sharded_annulus_matches_single_device(mesh, inner, outer):
    from imageprocess_tpu.morphology.binary import annulus_mask
    from imageprocess_tpu.parallel.spatial import sharded_annulus_mask

    rng = np.random.default_rng(4)
    base = np.zeros((256, 192), bool)
    base[30:34, 40:44] = True
    base[92:100, 100:140] = True  # spans the 96-row shard boundary
    base |= rng.random((256, 192)) > 0.999
    run = sharded_annulus_mask(mesh, inner, outer)
    got = np.asarray(run(shard_frame(mesh, base)))
    want = np.asarray(annulus_mask(jnp.asarray(base), inner, outer))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_sharded_label_matches_single_device(mesh, connectivity):
    """Sharded CCL vs morphology.ccl.label, exact numbering parity —
    including a snake that crosses ALL eight shards (worst case for the
    outer reconciliation loop) and blobs touching shard boundaries."""
    from imageprocess_tpu.morphology.ccl import label
    from imageprocess_tpu.parallel.spatial import sharded_label

    rng = np.random.default_rng(5)
    fg = np.zeros((256, 192), bool)
    # vertical snake spanning the whole frame (all 8 shards), 2 px wide,
    # weaving left-right so its pixels alternate column ranges per shard
    for y in range(256):
        x = 20 + int(60 * (0.5 + 0.5 * np.sin(y / 17.0)))
        fg[y, x:x + 2] = True
    fg[40:44, 100:140] = True     # blob inside one shard
    fg[62:70, 150:170] = True     # blob across the 64-row boundary
    fg[0:2, 0:4] = True           # corner blob
    fg |= rng.random((256, 192)) > 0.995
    # 315 components at conn=1 / 236 at conn=2 (scipy count): the bound
    # must exceed that or sharded_label refuses (overflow would alias)
    run = sharded_label(mesh, connectivity=connectivity, max_labels=512)
    got = np.asarray(run(shard_frame(mesh, fg)))
    want = np.asarray(label(jnp.asarray(fg), connectivity=connectivity,
                            max_labels=512))
    assert np.array_equal(got, want)
    assert got.max() > 200  # the fixture is genuinely component-dense


def test_sharded_fa_chain_matches_single_device(mesh):
    """Full FA segmentation chain on a row-sharded frame (threshold
    mu+alpha*sigma -> remove_small -> closing(disk) -> label) vs the
    single-device ops, exact labels + threshold + background."""
    from imageprocess_tpu.morphology.binary import binary_closing_skimage, disk
    from imageprocess_tpu.morphology.ccl import label, remove_small_objects
    from imageprocess_tpu.parallel.spatial import sharded_fa_segment

    rng = np.random.default_rng(6)
    H, W = 256, 192
    img = rng.integers(90, 120, (H, W)).astype(np.uint16)
    for cy, cx, r, v in [(40, 50, 6, 4000), (126, 90, 5, 3500),
                         (130, 96, 4, 3600),  # crosses the 128-row boundary
                         (250, 180, 4, 3900), (70, 20, 2, 3000)]:
        yy, xx = np.mgrid[0:H, 0:W]
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = v
    roi = np.zeros((H, W), bool)
    roi[10:256, 5:190] = True
    alpha, min_px, close_r = 3.0, 10.0, 1

    run = sharded_fa_segment(mesh, alpha, min_px, close_r, max_labels=64)
    got_lab, got_thr, got_bg = run(shard_frame(mesh, img),
                                   shard_frame(mesh, roi))
    got_lab = np.asarray(got_lab)

    from imageprocess_tpu.pipelines.fa import fa_global_stats

    mu, sigma, bg = fa_global_stats(jnp.asarray(img))
    thr = float(mu) + alpha * float(sigma)
    bw = (img.astype(np.float32) > thr) & roi
    bw = np.asarray(remove_small_objects(jnp.asarray(bw), 10, connectivity=1))
    bw = np.asarray(binary_closing_skimage(jnp.asarray(bw), disk(close_r)))
    want = np.asarray(label(jnp.asarray(bw), connectivity=2, max_labels=64))

    assert abs(got_thr - thr) < 1e-2
    assert abs(got_bg - float(bg)) < 1e-6
    assert np.array_equal(got_lab, want)
    assert want.max() >= 3  # the fixture produced several components


def test_sharded_label_empty_and_full(mesh):
    """Degenerate inputs: all-background and all-foreground frames."""
    from imageprocess_tpu.morphology.ccl import label
    from imageprocess_tpu.parallel.spatial import sharded_label

    run = sharded_label(mesh, connectivity=2, max_labels=16)
    empty = np.zeros((256, 192), bool)
    assert np.asarray(run(shard_frame(mesh, empty))).max() == 0
    full = np.ones((256, 192), bool)
    got = np.asarray(run(shard_frame(mesh, full)))
    want = np.asarray(label(jnp.asarray(full), connectivity=2, max_labels=16))
    assert np.array_equal(got, want)
    assert got.max() == 1  # one component spanning every shard


def test_sharded_fa_stats_empty_bg_sample_is_nan(mesh):
    """An empty global histogram (every [::10, ::10] sample pixel
    non-finite) must give bg = NaN, matching quantile_from_sorted's
    contract — an unguarded searchsorted over the all-zero cdf returned
    the garbage value 65536."""
    from imageprocess_tpu.parallel.spatial import sharded_fa_stats

    img = np.full((256, 192), 100.0, np.float32)
    img[::10, ::10] = np.nan   # exactly the bg subsample
    run = sharded_fa_stats(mesh)
    m, s, bg = run(shard_frame(mesh, img))
    assert np.isnan(bg)
    assert m == 100.0 and s == 0.0  # finite-only moments unaffected


def test_sharded_rim_mask_empty(mesh):
    from imageprocess_tpu.parallel.spatial import sharded_rim_mask

    run = sharded_rim_mask(mesh, 3)
    out = np.asarray(run(shard_frame(mesh, np.zeros((256, 192), bool))))
    assert not out.any()


def test_sharded_label_overflow_raises(mesh):
    """More components than max_labels must raise (labels would alias),
    never return silently wrong label images."""
    from imageprocess_tpu.parallel.spatial import sharded_label

    fg = np.zeros((256, 192), bool)
    fg[::4, ::4] = True  # 64*48 = 3072 isolated single-pixel components
    run = sharded_label(mesh, connectivity=1, max_labels=64)
    with pytest.raises(ValueError, match="max_labels"):
        run(shard_frame(mesh, fg))
    # a large enough bound handles the same frame
    run_big = sharded_label(mesh, connectivity=1, max_labels=4096)
    lab = np.asarray(run_big(shard_frame(mesh, fg)))
    assert lab.max() == 3072


def test_sharded_window_refuses_oversized_halo():
    """A window whose halo exceeds the rows per shard must raise an
    actionable error instead of silently producing shifted output."""
    import numpy as np
    import pytest

    from imageprocess_tpu.parallel.runner import make_mesh
    from imageprocess_tpu.parallel.spatial import (
        sharded_annulus_mask, sharded_square_dilation,
    )

    mesh = make_mesh(8)
    x = np.zeros((64, 128), bool)  # 8 rows per shard
    x[30:34, 60:70] = True
    with pytest.raises(ValueError, match="halo"):
        sharded_square_dilation(mesh, 9)(x)
    with pytest.raises(ValueError, match="halo"):
        sharded_annulus_mask(mesh, 3, 12)(x)
    # a fitting window still works
    out = sharded_square_dilation(mesh, 2)(x)
    assert np.asarray(out)[29, 60]
