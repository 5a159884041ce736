"""Geometry kernels + single-process oracle micro-cases (hand-computed)."""

import numpy as np

from hydro_raster_ray import oracle
from hydro_raster_ray.geom import line2sub_walk, points_in_polygon, polygon_bbox
from hydro_raster_ray.grid import GridSpec


def test_pip_square_inclusive():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    px = np.array([5.0, 0.0, 10.0, 5.0, -0.1, 10.1, 5.0])
    py = np.array([5.0, 5.0, 5.0, 0.0, 5.0, 5.0, 10.0])
    got = points_in_polygon(px, py, ring)
    # interior, on left edge, on right edge, on bottom, outside, outside, on top
    assert got.tolist() == [True, True, True, True, False, False, True]


def test_pip_corner_vertex():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    got = points_in_polygon(np.array([0.0, 10.0]), np.array([0.0, 10.0]), ring)
    assert got.tolist() == [True, True]


def test_pip_concave():
    # L-shape: (0,0)-(10,0)-(10,4)-(4,4)-(4,10)-(0,10)
    ring = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], float)
    px = np.array([2.0, 8.0, 8.0, 2.0])
    py = np.array([2.0, 2.0, 8.0, 8.0])
    assert points_in_polygon(px, py, ring).tolist() == [True, True, False, True]


def test_pip_skewed_matches_matplotlib_free_check():
    # triangle; half-plane checks by hand
    ring = np.array([[0, 0], [10, 0], [0, 10]], float)
    px = np.array([1.0, 6.0, 4.9])
    py = np.array([1.0, 6.0, 4.9])
    assert points_in_polygon(px, py, ring).tolist() == [True, False, True]


def test_polygon_bbox():
    assert polygon_bbox([[[1, 2], [3, -1], [0, 5]]]) == (0.0, 3.0, -1.0, 5.0)


def test_line2sub_matches_reference_walk():
    # horizontal segment from (r=0,c=0) to (r=0,c=4): steps 5, endpoint
    # dropped (reference quirk: final vertex of each segment is trimmed)
    r, c = line2sub_walk([0, 0], [0, 4], 10, 10)
    assert r.tolist() == [0, 0, 0, 0]
    assert c.tolist() == [0, 1, 2, 3]
    # diagonal + bounds filter
    r, c = line2sub_walk([0, 5], [0, 5], 3, 3)
    assert list(zip(r.tolist(), c.tolist())) == [(0, 0), (1, 1), (2, 2)]


SPEC = GridSpec(ncols=12, nrows=8, xllcorner=0.0, yllcorner=0.0, cellsize=1.0)


def _arr():
    return np.arange(8 * 12, dtype=float).reshape(8, 12)


def test_oracle_rect_clip_identity():
    a = _arr()
    out, spec, loc = oracle.rect_clip(a, SPEC, SPEC.extent)
    np.testing.assert_array_equal(out, a)
    assert spec == SPEC


def test_oracle_rect_clip_window():
    a = _arr()
    # window (2.0, 5.0, 1.0, 4.0): centre-snap → cols 2..4, rows 4..6
    out, spec, loc = oracle.rect_clip(a, SPEC, (2.0, 5.0, 1.0, 4.0))
    assert out.shape == (3, 3)
    assert spec.xllcorner == 2.0 and spec.yllcorner == 1.0
    np.testing.assert_array_equal(out, a[4:7, 2:5])


def test_oracle_rasterize_burn_order_and_fill():
    feats = [
        {"rings": [[[1, 1], [6, 1], [6, 6], [1, 6], [1, 1]]]},
        {"rings": [[[4, 4], [9, 4], [9, 7], [4, 7], [4, 4]]]},
    ]
    plane = oracle.rasterize(SPEC, feats)  # burn enumerate index
    # cell centre (1.5, 1.5) in first polygon only → 0
    assert plane[6, 1] == 0.0
    # overlap region → later feature wins → 1
    assert plane[3, 5] == 1.0
    # untouched stays NaN
    assert np.isnan(plane[0, 11])
    # attribute burn
    plane2 = oracle.rasterize(SPEC, feats, attribute=[7.0, 3.0])
    assert plane2[6, 1] == 7.0 and plane2[3, 5] == 3.0
    # include_nan: untouched → 1
    plane3 = oracle.rasterize(SPEC, feats, include_nan=True)
    assert plane3[0, 11] == 1.0


def test_oracle_merge_scatter():
    target = np.zeros((8, 12))
    o_spec = GridSpec(ncols=3, nrows=2, xllcorner=2.0, yllcorner=3.0, cellsize=1.0)
    origin = np.array([[1.0, np.nan, 3.0], [4.0, 5.0, 6.0]])
    out = oracle.merge(origin, o_spec, target, SPEC)
    # origin top row is at y=4.5 → target row 3; cols 2,3,4
    assert out[3, 2] == 1.0 and out[3, 4] == 3.0
    assert out[3, 3] == 0.0  # NaN skipped
    assert out[4, 2] == 4.0 and out[4, 4] == 6.0


def test_oracle_paste_on_gt0_quirk():
    large = np.zeros((8, 12))
    s_spec = GridSpec(ncols=3, nrows=3, xllcorner=-1.0, yllcorner=5.0, cellsize=1.0)
    small = np.ones((3, 3)) * 7.0
    out = oracle.paste_on(small, s_spec, large, SPEC)
    # small covers target rows 0..2, cols -1..1; quirk keeps rows>0 and
    # cols>0 only → rows 1..2 × col 1
    assert out[0, 1] == 0.0  # row 0 excluded by the > 0 quirk
    assert out[1, 1] == 7.0 and out[2, 1] == 7.0
    assert out[1, 0] == 0.0  # col 0 excluded


def test_oracle_assign_to_clamps():
    a = _arr()
    new_spec = GridSpec(ncols=4, nrows=4, xllcorner=-2.0, yllcorner=-2.0, cellsize=2.0)
    out = oracle.assign_to(a, SPEC, new_spec)
    assert out.shape == (4, 4)
    # target centre of (r=1, c=0) is (-1, 3): col -1.5 rounds to -2 →
    # clamped to 0; row (7.5-3)/1 = 4.5 rounds half-even to 4 → a[4, 0]
    assert out[1, 0] == a[4, 0]
    # (r=3, c=3) centre is (5, -1): row 8.5 → 8 → clamped to 7; col 4.5 →
    # half-even → 4
    assert out[3, 3] == a[7, 4]


def test_oracle_resample_nearest_shapes():
    a = _arr()
    out, spec = oracle.grid_resample_nearest(a, SPEC, 2.0)
    assert spec.ncols == 6 and spec.nrows == 4
    assert out.shape == (4, 6)
    # identity at same cellsize
    out2, spec2 = oracle.grid_resample_nearest(a, SPEC, 1.0)
    np.testing.assert_array_equal(out2, a)


def test_oracle_nearest_interpolate_voronoi():
    pts = np.array([[2.0, 2.0], [10.0, 6.0]])
    vals = np.array([1.0, 9.0])
    surf, idx = oracle.nearest_interpolate(SPEC, pts, vals)
    assert surf[6, 1] == 1.0  # near first gauge
    assert surf[1, 10] == 9.0
    assert set(np.unique(surf)) == {1.0, 9.0}


def test_oracle_idw_exact_hit():
    pts = np.array([[2.5, 2.5], [9.5, 5.5]])
    vals = np.array([4.0, 8.0])
    surf = oracle.idw_interpolate(SPEC, pts, vals)
    # cell centre exactly at gauge → gauge value
    assert abs(surf[5, 2] - 4.0) < 1e-9
    assert surf.min() >= 4.0 - 1e-9 and surf.max() <= 8.0 + 1e-9


def test_oracle_classify():
    a = np.array([[np.nan, -40.0], [5.0, 50.0]])
    out = oracle.classify(a, [-30.0, 0.0, 30.0])
    assert np.isnan(out[0, 0])
    assert out[0, 1] == 0.0 and out[1, 0] == 2.0 and out[1, 1] == 3.0


def test_oracle_zonal_stats():
    a = np.array([[1.0, 2.0], [3.0, np.nan]])
    zones = np.array([[5.0, 5.0], [np.nan, 7.0]])
    st = oracle.zonal_stats(a, zones)
    assert st[5.0]["n"] == 2 and st[5.0]["sum"] == 3.0
    assert 7.0 not in st  # its only cell is NaN-valued


def test_grid_points_in_polygon_bit_identical():
    """Scanline grid kernel vs the per-point kernel: identical booleans on
    adversarial rings — edges exactly through cell centres, horizontal /
    vertical edges, slivers, non-convex and self-closing rings."""
    from hydro_raster_ray.geom import grid_points_in_polygon, points_in_polygon

    X = 100.0 + 5.0 * (np.arange(48) + 0.5)
    Y = 400.0 - 5.0 * (np.arange(40) + 0.5)
    XX, YY = np.meshgrid(X, Y)
    rng = np.random.RandomState(7)
    rings = [
        # rectangle with edges exactly on cell-centre coordinates
        [[X[3], Y[30]], [X[20], Y[30]], [X[20], Y[5]], [X[3], Y[5]], [X[3], Y[30]]],
        # triangle with a horizontal and a vertical edge through centres
        [[X[10], Y[35]], [X[40], Y[35]], [X[10], Y[2]]],
        # thin sliver
        [[110.0, 150.0], [235.0, 152.5], [110.0, 151.0]],
        # star-ish non-convex
        [[150, 250], [180, 330], [210, 250], [130, 300], [230, 300]],
        # degenerate: repeated vertex + explicit closure
        [[120, 200], [120, 200], [200, 260], [160, 380], [120, 200]],
    ]
    for _ in range(12):
        n = rng.randint(3, 9)
        r = np.c_[rng.uniform(90, 350, n), rng.uniform(180, 410, n)]
        rings.append(r.tolist())
    for k, ring in enumerate(rings):
        ring = np.asarray(ring, dtype=np.float64)
        want = points_in_polygon(XX.ravel(), YY.ravel(), ring).reshape(XX.shape)
        got = grid_points_in_polygon(X, Y, ring)
        np.testing.assert_array_equal(got, want, err_msg=f"ring {k}")
