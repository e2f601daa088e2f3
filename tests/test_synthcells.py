"""Generator invariants for the multi-domain synthetic training fields
(models.synthcells) — the training distribution behind the generalist
checkpoint must stay deterministic and well-formed or the committed
model's eval gates lose their meaning."""

import numpy as np
import pytest

from imageprocess_tpu.models.synthcells import (DOMAINS, eval_frame,
                                                frame_arrays, synth_frame)


@pytest.mark.parametrize("domain", DOMAINS)
def test_synth_frame_invariants(domain):
    rng = np.random.default_rng(3)
    img, labels = synth_frame(rng, 256, 256, domain)
    assert img.shape == labels.shape == (256, 256)
    assert img.dtype == np.float32 and labels.dtype == np.int32
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 60000.0
    n = int(labels.max())
    assert n >= 1
    # ids are dense 1..N: every id owns pixels (overwritten cells dropped)
    ids = np.unique(labels[labels > 0])
    assert ids.tolist() == list(range(1, n + 1))


def test_inverted_cells_are_darker_than_background():
    rng = np.random.default_rng(5)
    img, labels = synth_frame(rng, 256, 256, "inverted")
    fg, bg = labels > 0, labels == 0
    assert img[fg].mean() < 0.9 * img[bg].mean()


def test_fluor_cells_are_brighter_than_background():
    rng = np.random.default_rng(5)
    img, labels = synth_frame(rng, 256, 256, "fluor")
    fg, bg = labels > 0, labels == 0
    assert img[fg].mean() > 1.5 * img[bg].mean()


def test_dense_domain_has_touching_cells():
    """The dense domain exists to exercise flow-following: adjacent pixels
    with different nonzero labels must occur."""
    rng = np.random.default_rng(11)
    _, labels = synth_frame(rng, 256, 256, "dense")
    h = (labels[:, 1:] != labels[:, :-1]) & (labels[:, 1:] > 0) & (labels[:, :-1] > 0)
    v = (labels[1:, :] != labels[:-1, :]) & (labels[1:, :] > 0) & (labels[:-1, :] > 0)
    assert h.sum() + v.sum() > 0


def test_frame_arrays_supervision():
    rng = np.random.default_rng(7)
    img, labels = synth_frame(rng, 192, 192, "fluor")
    x, probs, flows = frame_arrays(img, labels)
    assert x.shape == (192, 192) and 0.0 <= x.min() and x.max() <= 1.0001
    assert set(np.unique(probs)) <= {0.0, 1.0}
    assert (probs > 0).sum() == (labels > 0).sum()
    # flows are unit-ish vectors inside cells, zero outside
    mag = np.sqrt((flows ** 2).sum(-1))
    fg = labels > 0
    assert np.allclose(mag[~fg], 0.0)
    inner = fg & (mag > 0)  # centroid pixel itself can sit at d~0
    assert (np.abs(mag[inner] - 1.0) < 1e-3).all()


def test_eval_frame_deterministic_and_filtered():
    a = eval_frame(3, "dense", H=256, W=256)
    b = eval_frame(3, "dense", H=256, W=256)
    assert np.array_equal(a["img"], b["img"])
    assert np.array_equal(a["labels"], b["labels"])
    assert len(a["polys"]) == len(b["polys"])
    # the min_px filter: every surviving instance has >= 150 px
    ids, counts = np.unique(a["labels"][a["labels"] > 0], return_counts=True)
    assert (counts >= 150).all()
    # distinct seeds give distinct fields
    c = eval_frame(4, "dense", H=256, W=256)
    assert not np.array_equal(a["img"], c["img"])


def test_unknown_domain_raises():
    with pytest.raises(ValueError):
        synth_frame(np.random.default_rng(0), 64, 64, "nope")
