"""Kernel tests: coordinate math vs hand-computed reference cases."""

import numpy as np
import pytest

from hydro_raster_ray.grid import (
    GridSpec,
    TileScheme,
    compare_extent,
    header2extent,
    map2sub,
    morton_decode,
    morton_encode,
    parse_tile_id,
    shape_extent_to_header,
    sub2map,
    tile_id,
)

SPEC = GridSpec(ncols=120, nrows=60, xllcorner=-5.0, yllcorner=0.0, cellsize=0.5)


def test_header2extent():
    # sample_data.pkl header: ncols=120 nrows=60 cellsize=0.5 xll=-5 yll=0
    assert header2extent(SPEC) == (-5.0, 55.0, 0.0, 30.0)


def test_map2sub_header_branch_centres():
    # centre of top-left cell is (-4.75, 29.75) → (0, 0)
    r, c = map2sub(np.array([-4.75]), np.array([29.75]), SPEC)
    assert (r[0], c[0]) == (0, 0)
    # centre of bottom-right cell
    r, c = map2sub(np.array([54.75]), np.array([0.25]), SPEC)
    assert (r[0], c[0]) == (59, 119)


def test_map2sub_scalar_truncates():
    # reference uses int() for scalars (spatial_analysis.py:388-389)
    r, c = map2sub(-4.0, 29.0, SPEC)
    assert isinstance(r, int) and isinstance(c, int)
    assert (r, c) == (1, 1)


def test_map2sub_round_half_even():
    # (y0 - Y)/cs lands exactly on 0.5 → np.round → 0 (half-to-even)
    spec = GridSpec(ncols=10, nrows=10, xllcorner=0.0, yllcorner=0.0, cellsize=1.0)
    r, c = map2sub(np.array([1.0]), np.array([9.0]), spec)  # cell edges
    assert r[0] == 0 and c[0] == 0
    r, c = map2sub(np.array([2.0]), np.array([8.0]), spec)
    assert r[0] == 2 and c[0] == 2  # 1.5 rounds to 2 (even)


def test_map2sub_geotransform_branch():
    # GDAL-style transform (cs, 0, xul, 0, -cs, yul)
    gt = (0.5, 0.0, -5.0, 0.0, -0.5, 30.0)
    r, c = map2sub(np.array([-4.75]), np.array([29.75]), gt)
    assert (r[0], c[0]) == (0, 0)


def test_sub2map_roundtrip():
    rows = np.arange(60)
    cols = np.arange(120)
    X, Y = sub2map(rows, cols, SPEC)
    r2, c2 = map2sub(X[:60], Y[:60], SPEC)
    np.testing.assert_array_equal(r2, rows)
    np.testing.assert_array_equal(c2, cols[:60])


def test_shape_extent_to_header():
    g = shape_extent_to_header((60, 120), (-5.0, 55.0, 0.0, 30.0))
    assert g.cellsize == 0.5 and g.ncols == 120 and g.nrows == 60
    with pytest.raises(ValueError):
        shape_extent_to_header((60, 120), (-5.0, 55.0, 0.0, 31.0))


def test_compare_extent():
    assert compare_extent((0, 10, 0, 10), (1, 9, 1, 9)) == 0
    assert compare_extent((1, 9, 1, 9), (0, 10, 0, 10)) == 1
    assert compare_extent((0, 5, 0, 10), (1, 9, 1, 9)) == 2


def test_morton_roundtrip():
    r = np.arange(0, 1000, 7)
    c = np.arange(1000, 0, -7)[: r.size]
    cell = morton_encode(r, c)
    r2, c2 = morton_decode(cell)
    np.testing.assert_array_equal(r, r2)
    np.testing.assert_array_equal(c, c2)
    # locality: adjacent tiles share high bits at coarse level
    a = morton_encode(10, 10) >> np.uint64(4)
    b = morton_encode(11, 11) >> np.uint64(4)
    assert a == b


def test_tile_scheme_ragged():
    from hydro_raster_ray import fixtures

    s = fixtures.make_scheme(4, 4)
    assert s.grid.nrows == 3 * 64 + 24 and s.grid.ncols == 3 * 64 + 40
    assert s.tile_shape(3, 3) == (24, 40)
    assert s.tile_shape(0, 0) == (64, 64)
    ts = s.tile_spec(0, 0)
    assert ts.xllcorner == s.grid.xllcorner
    assert ts.yllcorner + ts.nrows * ts.cellsize == s.grid.extent[3]
    # bottom-left tile spec abuts the global yll
    bl = s.tile_spec(3, 0)
    assert bl.yllcorner == s.grid.yllcorner


def test_tile_id_roundtrip():
    assert parse_tile_id(tile_id(12, 34)) == (12, 34)


def test_tiles_overlapping_rc():
    s = TileScheme(
        grid=GridSpec(ncols=100, nrows=100, xllcorner=0, yllcorner=0, cellsize=1.0),
        tile_h=40,
        tile_w=40,
    )
    assert s.tiles_overlapping_rc(0, 40, 0, 40) == [(0, 0)]
    assert s.tiles_overlapping_rc(39, 41, 39, 41) == [(0, 0), (0, 1), (1, 0), (1, 1)]
    assert s.tiles_overlapping_rc(-5, 5, 95, 200) == [(0, 2)]
    assert s.tiles_overlapping_rc(200, 300, 0, 10) == []


def test_tile_cell_centres_match_sub2map():
    from hydro_raster_ray import fixtures

    s = fixtures.make_scheme(2, 2)
    X, Y = s.tile_cell_centres(1, 1)
    r0, c0 = s.tile_origin_rc(1, 1)
    h, w = s.tile_shape(1, 1)
    rows, cols = np.meshgrid(
        np.arange(r0, r0 + h), np.arange(c0, c0 + w), indexing="ij"
    )
    Xr, Yr = sub2map(rows, cols, s.grid)
    np.testing.assert_allclose(X, Xr)
    np.testing.assert_allclose(Y, Yr)


def test_meta2header_and_normalize_crs():
    from hydro_raster_ray.grid import GridSpec, meta2header, normalize_crs

    spec = meta2header(
        {
            "transform": (5.0, 0.0, 340000.0, 0.0, -5.0, 556360.0),
            "width": 488,
            "height": 472,
            "nodata": -9999.0,
            "crs": "epsg:27700",
        }
    )
    assert spec == GridSpec(
        ncols=488, nrows=472, xllcorner=340000.0, yllcorner=554000.0,
        cellsize=5.0, nodata=-9999.0, crs="EPSG:27700",
    )
    assert normalize_crs(4326) == "EPSG:4326"
    assert normalize_crs(" epsg: 27700 ") == "EPSG:27700"
    wkt = 'PROJCS["OSGB36",AUTHORITY["EPSG","27700"]]'
    assert normalize_crs(wkt) == "EPSG:27700"
    assert normalize_crs("+proj=utm +zone=30") == "+proj=utm +zone=30"
    import pytest as _pt

    with _pt.raises(ValueError):
        meta2header({"transform": (5.0, 1.0, 0.0, 0.0, -5.0, 0.0), "width": 1, "height": 1})
