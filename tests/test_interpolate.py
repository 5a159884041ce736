"""Gauge interpolation actor pool vs the oracle (scipy-griddata parity)."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.interpolate import (
    GaugeInterpolator,
    _BucketIndex,
    point_interpolate,
    voronoi_counts,
)


def _gauges(scheme, n=25):
    t = fixtures.gauges_table(scheme, n)
    return {k: t[k].to_numpy(zero_copy_only=False) for k in ("x", "y", "value")} | {
        "gauge_id": t["gauge_id"].to_pylist()
    }


@pytest.fixture(scope="module")
def tileset(ray_session, small_scheme):
    return from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)


def test_nearest_matches_oracle(tileset, small_scheme):
    g = _gauges(small_scheme)
    pts = np.c_[g["x"], g["y"]]
    want, _ = oracle.nearest_interpolate(small_scheme.grid, pts, g["value"])
    got = to_array(point_interpolate(tileset, g, method="nearest", concurrency=2))
    # stored at float32 precision
    np.testing.assert_array_equal(got, want.astype(np.float32).astype(np.float64))


def test_idw_matches_oracle(tileset, small_scheme):
    g = _gauges(small_scheme)
    pts = np.c_[g["x"], g["y"]]
    want = oracle.idw_interpolate(small_scheme.grid, pts, g["value"])
    got = to_array(point_interpolate(tileset, g, method="idw", concurrency=2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bucket_index_exact_vs_brute():
    rng_x = fixtures._halton(5000, 2) * 1000.0
    rng_y = fixtures._halton(5000, 3) * 800.0
    idx = _BucketIndex(rng_x, rng_y)
    # query points on a grid extending PAST the gauge bbox on all sides
    qx, qy = np.meshgrid(np.linspace(-200, 1200, 60), np.linspace(-150, 950, 55))
    qx, qy = qx.ravel(), qy.ravel()
    got, got_d2 = idx.nearest(qx, qy)
    d2 = (qx[:, None] - rng_x[None, :]) ** 2 + (qy[:, None] - rng_y[None, :]) ** 2
    want = np.argmin(d2, axis=1)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(got_d2, d2[np.arange(qx.size), want])


def test_large_gauge_table_uses_index_and_matches(tileset, small_scheme):
    g = _gauges(small_scheme, n=3000)  # > BRUTE_MAX → bucket index path
    interp = GaugeInterpolator(g, method="nearest")
    assert interp.index is not None
    pts = np.c_[g["x"], g["y"]]
    want, _ = oracle.nearest_interpolate(small_scheme.grid, pts, g["value"])
    got = to_array(point_interpolate(tileset, g, method="nearest", concurrency=2))
    np.testing.assert_array_equal(got, want.astype(np.float32).astype(np.float64))


def test_voronoi_counts(tileset, small_scheme):
    g = _gauges(small_scheme)
    pts = np.c_[g["x"], g["y"]]
    _, idx_plane = oracle.nearest_interpolate(small_scheme.grid, pts, g["value"])
    counts = np.bincount(idx_plane.ravel(), minlength=len(g["gauge_id"]))
    got = {r["gauge_id"]: r["n_cells"] for r in voronoi_counts(tileset, g).take_all()}
    want = {
        gid: int(c) for gid, c in zip(g["gauge_id"], counts) if c > 0
    }
    assert got == want
    assert sum(got.values()) == small_scheme.grid.nrows * small_scheme.grid.ncols


def test_knn_idw_runs(tileset, small_scheme):
    g = _gauges(small_scheme, n=100)
    got = to_array(point_interpolate(tileset, g, method="idw", k=8, concurrency=2))
    assert np.isfinite(got).all()
    assert got.min() >= min(g["value"]) - 1e-6
    assert got.max() <= max(g["value"]) + 1e-6


def test_delaunay_linear_reproduces_affine(ray_session):
    """An affine surface is reproduced EXACTLY inside the hull for ANY valid
    triangulation — a triangulation-independent correctness witness."""
    from hydro_raster_ray.tri import TriInterpolator, delaunay

    rng = np.random.RandomState(7)
    x = rng.uniform(0, 100, 40)
    y = rng.uniform(0, 100, 40)
    v = 3.0 * x - 2.0 * y + 17.0
    tri = TriInterpolator(x, y, v)
    # triangulation sanity: Euler for planar triangulation of a point set
    assert len(delaunay(np.c_[x, y])) >= 40 - 2
    qx = rng.uniform(10, 90, 500)
    qy = rng.uniform(10, 90, 500)
    got = tri(qx, qy)
    inside = ~np.isnan(got)
    assert inside.sum() > 400  # interior queries resolve
    np.testing.assert_allclose(
        got[inside], 3.0 * qx[inside] - 2.0 * qy[inside] + 17.0, rtol=1e-9
    )
    # gauges themselves are reproduced exactly
    at_g = tri(x, y)
    np.testing.assert_allclose(at_g, v, rtol=1e-9)
    # far outside the hull -> NaN
    assert np.isnan(tri(np.array([1e6]), np.array([1e6]))[0])


def test_point_interpolate_linear_matches_whole_array(ray_session, small_scheme):
    from hydro_raster_ray import fixtures
    from hydro_raster_ray.grid import sub2map
    from hydro_raster_ray.sources import from_arrow_tiles, to_array
    from hydro_raster_ray.stages.interpolate import point_interpolate
    from hydro_raster_ray.tri import TriInterpolator

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    gt = fixtures.gauges_table(small_scheme, 25)
    g = {k: gt[k].to_numpy() for k in ("x", "y", "value")}
    got = to_array(point_interpolate(ts, g, method="linear", concurrency=2))
    gspec = small_scheme.grid
    X, Y = sub2map(np.arange(gspec.nrows), np.arange(gspec.ncols), gspec)
    XX, YY = np.meshgrid(X, Y)
    interp = TriInterpolator(g["x"], g["y"], g["value"])
    want = interp(XX.ravel(), YY.ravel()).reshape(gspec.nrows, gspec.ncols)
    want = want.astype(np.float32).astype(np.float64)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got[~np.isnan(got)], want[~np.isnan(want)], rtol=0, atol=0)


def test_point_interpolate_pruned_read_matches_full(ray_session):
    """Geometry-only mode: a TileSet read WITHOUT the payload column must
    produce the identical interpolated surface (the reference builds its
    meshgrid from the header alone, Raster.py:424)."""
    import numpy as np

    from hydro_raster_ray import fixtures
    from hydro_raster_ray.sources import read_tiles
    from hydro_raster_ray.sources.tiles import to_array
    from hydro_raster_ray.stages.interpolate import point_interpolate

    d = fixtures.ensure_fixture_dir("sf0.001")
    scheme = fixtures.make_scheme(*fixtures.SCALES["sf0.001"])
    gt = fixtures.gauges_table(scheme, 25)
    g = {k: gt[k].to_numpy(zero_copy_only=False) for k in ("x", "y", "value")}

    full = read_tiles(f"{d}/tiles.parquet", scheme)
    pruned = read_tiles(
        f"{d}/tiles.parquet", scheme,
        columns=["w", "h", "fmt", "caption", "phash"],
    )
    a = to_array(point_interpolate(full, g, method="nearest", concurrency=2))
    b = to_array(point_interpolate(pruned, g, method="nearest", concurrency=2))
    assert np.array_equal(a, b, equal_nan=True)
