"""Channel bathymetry + remove_block compositions."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures
from hydro_raster_ray.geom import points_in_polygon
from hydro_raster_ray.pipelines.channel import (
    _ChannelBurn,
    _RemoveBlock,
    channel_ring,
    line_to_surface,
    remove_block,
)
from hydro_raster_ray.sources import from_arrow_tiles, to_array


@pytest.fixture(scope="module")
def tileset(ray_session, small_scheme):
    return from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)


def _mosaic(scheme):
    out = np.full(scheme.grid.shape, np.nan)
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            h, w = scheme.tile_shape(tr, tc)
            out[r0 : r0 + h, c0 : c0 + w] = fixtures.tile_truth(scheme, tr, tc)
    return out


def test_line_to_surface(tileset, small_scheme):
    b0, b1, xs = fixtures.sections_fixture(small_scheme)
    out = to_array(line_to_surface(tileset, xs, b0, b1, method="idw"))
    base = _mosaic(small_scheme)
    ring = channel_ring(b0, b1)
    g = small_scheme.grid
    X = g.xllcorner + (np.arange(g.ncols) + 0.5) * g.cellsize
    top = g.yllcorner + g.nrows * g.cellsize
    Y = top - (np.arange(g.nrows) + 0.5) * g.cellsize
    XX, YY = np.meshgrid(X, Y)
    inside = points_in_polygon(XX.ravel(), YY.ravel(), ring).reshape(base.shape)
    # outside the channel: DEM untouched (bit-exact)
    m = ~inside & np.isfinite(base)
    np.testing.assert_array_equal(out[m], base[m])
    # inside: interpolated channel bed sits below the bank-level surface
    zvals = np.vstack(xs)[:, 2]
    ins = inside & np.isfinite(out)
    assert ins.any()
    assert out[ins].min() >= zvals.min() - 1e-6
    assert out[ins].max() <= zvals.max() + 1e-6
    # whole-array composition equality (same kernel, single "tile")
    import ray
    from hydro_raster_ray.stages.decode import TileInfo

    burn = _ChannelBurn(
        {"x": np.vstack(xs)[:, 0], "y": np.vstack(xs)[:, 1], "value": zvals},
        ring,
    )
    info = TileInfo("whole", g.nrows, g.ncols, "raw-f32", "", 0, 0, 0, 0, 0, g)
    want = burn(base, info).astype(np.float32).astype(np.float64)
    got_m = np.isfinite(want)
    np.testing.assert_array_equal(out[got_m], want[got_m])


def test_remove_block(tileset, small_scheme):
    feats = [fixtures.rect_zone_features(small_scheme)[1]]  # zone (b): inside one tile
    base = _mosaic(small_scheme)
    out = to_array(remove_block(tileset, feats))
    ring = np.asarray(feats[0]["rings"][0])
    g = small_scheme.grid
    X = g.xllcorner + (np.arange(g.ncols) + 0.5) * g.cellsize
    top = g.yllcorner + g.nrows * g.cellsize
    Y = top - (np.arange(g.nrows) + 0.5) * g.cellsize
    XX, YY = np.meshgrid(X, Y)
    inside = points_in_polygon(XX.ravel(), YY.ravel(), ring).reshape(base.shape)
    # outside: untouched
    m = ~inside & np.isfinite(base)
    np.testing.assert_array_equal(out[m], base[m])
    # inside: refilled from surrounding terrain, within the donor value range
    donors = ~inside & np.isfinite(base)
    assert np.isfinite(out[inside]).all()
    lo, hi = base[donors].min(), base[donors].max()
    assert out[inside].min() >= lo - 1e-6 and out[inside].max() <= hi + 1e-6
