"""Distributed rect/polygon clip vs the single-process oracle (golden)."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.clip import polygon_clip, rect_clip
from hydro_raster_ray.stages.decode import map_tiles


@pytest.fixture(scope="module")
def tileset(ray_session, small_scheme):
    table = fixtures.tiles_table(small_scheme)
    return from_arrow_tiles(table, small_scheme), small_scheme


def _mosaic(scheme):
    out = np.full(scheme.grid.shape, np.nan)
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            h, w = scheme.tile_shape(tr, tc)
            out[r0 : r0 + h, c0 : c0 + w] = fixtures.tile_truth(scheme, tr, tc)
    return out


def test_roundtrip_assemble(tileset):
    ts, scheme = tileset
    got = to_array(ts)
    want = _mosaic(scheme)
    np.testing.assert_array_equal(got, want)


def test_rect_clip_matches_oracle(tileset):
    ts, scheme = tileset
    window = fixtures.CLIP_WINDOW
    want, want_spec, _ = oracle.rect_clip(_mosaic(scheme), scheme.grid, window)
    clipped = rect_clip(ts, window)
    assert clipped.grid == want_spec
    got = to_array(clipped)
    np.testing.assert_array_equal(got, want)


def test_rect_clip_full_extent_identity(tileset):
    ts, scheme = tileset
    clipped = rect_clip(ts, scheme.grid.extent)
    assert clipped.grid == scheme.grid
    np.testing.assert_array_equal(to_array(clipped), _mosaic(scheme))


def test_rect_clip_off_grid_window(tileset):
    ts, scheme = tileset
    ext = scheme.grid.extent
    # window larger than the grid clamps to the grid (identity array)
    clipped = rect_clip(ts, (ext[0] - 100, ext[1] + 100, ext[2] - 50, ext[3] + 50))
    np.testing.assert_array_equal(to_array(clipped), _mosaic(scheme))


def test_rect_clip_single_tile_interior(tileset):
    ts, scheme = tileset
    # window strictly inside tile (1, 1)
    g = scheme.grid
    x0 = g.xllcorner + (64 + 10) * g.cellsize
    y1 = g.extent[3] - (64 + 10) * g.cellsize
    window = (x0, x0 + 20 * g.cellsize, y1 - 20 * g.cellsize, y1)
    want, want_spec, _ = oracle.rect_clip(_mosaic(scheme), g, window)
    clipped = rect_clip(ts, window)
    assert clipped.grid == want_spec
    np.testing.assert_array_equal(to_array(clipped), want)
    # only one tile survives the metadata filter
    assert clipped.count() == 1


def test_polygon_clip_matches_oracle(tileset):
    ts, scheme = tileset
    feats = fixtures.poly_features(scheme)
    rings = feats[0]["rings"]
    want, want_spec = oracle.polygon_clip(_mosaic(scheme), scheme.grid, rings)
    clipped = polygon_clip(ts, rings, drop_empty=False)
    assert clipped.grid == want_spec
    np.testing.assert_array_equal(to_array(clipped), want)


def test_map_tiles_udf_and_caption_survival(tileset):
    ts, scheme = tileset
    out = map_tiles(ts, lambda a, info: a + 20.0)
    got = to_array(out)
    want = _mosaic(scheme)
    # raw-f32 rows are exact; quantized fmts re-quantize after the edit
    mask = np.isfinite(want)
    np.testing.assert_allclose(got[mask], (want + 20.0)[mask], atol=2e-3)
    caps = sorted(out.ds.select_columns(["caption"]).take_all(), key=str)
    caps0 = sorted(ts.ds.select_columns(["caption"]).take_all(), key=str)
    assert caps == caps0


def test_map_tiles_actor_pool(tileset):
    ts, scheme = tileset

    class AddConst:
        def __init__(self, c=5.0):
            self.c = c

        def __call__(self, arr, info):
            return arr + self.c

    out = map_tiles(ts, AddConst, concurrency=2, fn_constructor_kwargs={"c": 5.0})
    got = to_array(out)
    want = _mosaic(scheme) + 5.0
    mask = np.isfinite(want)
    np.testing.assert_allclose(got[mask], want[mask], atol=2e-3)
