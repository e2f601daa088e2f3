import numpy as np

from imageprocess_tpu.geom import (
    convex_hull,
    douglas_peucker,
    pad_polygons,
    polygon_bbox,
    polygon_centroid,
    polygon_perimeter,
    shoelace_area,
)


def test_shoelace_and_perimeter():
    square = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    assert shoelace_area(square) == 16.0
    assert polygon_perimeter(square) == 16.0
    # orientation independence
    assert shoelace_area(square[::-1]) == 16.0


def test_centroid():
    square = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    assert polygon_centroid(square) == (2.0, 2.0)
    # degenerate: collinear points -> vertex mean
    line = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    cx, cy = polygon_centroid(line)
    assert (cx, cy) == (1.0, 1.0)


def test_convex_hull():
    pts = np.array(
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [2.0, 2.0], [1.0, 1.0]]
    )
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert shoelace_area(hull) == 16.0


def test_douglas_peucker():
    # a noisy straight line collapses to its endpoints
    x = np.linspace(0, 10, 11)
    y = np.zeros_like(x)
    y[5] = 0.05
    line = np.stack([x, y], axis=1)
    out = douglas_peucker(line, tolerance=0.1)
    assert len(out) == 2
    out2 = douglas_peucker(line, tolerance=0.01)
    assert len(out2) >= 3  # the bump survives a tighter tolerance


def test_bbox_and_padding():
    tri = np.array([[1.5, 2.5], [7.0, 3.0], [4.0, 9.5]])
    assert polygon_bbox(tri) == (1, 2, 8, 11)
    padded = pad_polygons([tri, np.array([[0, 0], [1, 0], [1, 1], [0, 1]])])
    assert padded.shape == (2, 4, 2)
    # first polygon padded by repeating its first vertex
    np.testing.assert_allclose(padded[0, 3], [1.5, 2.5])
