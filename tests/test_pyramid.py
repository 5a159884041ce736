"""2× overview pyramid vs its whole-array witness — bit-exact across
chained levels and on both exchange paths; hand-computed pencil case
for the NaN-aware fixed-order mean and odd-edge raggedness."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.pyramid import pyramid_level, reduce2x


def _f32(a):
    return a.astype(np.float32).astype(np.float64)


def test_pyramid_three_levels_match_witness(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    want = _f32(fixtures.assemble_truth(small_scheme))
    cur = ts
    for _ in range(3):
        want = oracle.pyramid_reduce(want)
        cur = pyramid_level(cur)
        got = to_array(cur)
        np.testing.assert_array_equal(got, want)
    # grid metadata halves (ceil) each level
    assert cur.grid.nrows == (small_scheme.grid.nrows + 7) // 8
    assert cur.grid.cellsize == small_scheme.grid.cellsize * 8


def test_pyramid_exchange_paths_bit_match(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(pyramid_level(ts, exchange="files"))
    slow = to_array(pyramid_level(ts, exchange="shuffle"))
    np.testing.assert_array_equal(fast, slow)


def test_pyramid_small_tiles_cross_parent_boundaries(ray_session):
    """Tiny 3×3 output tiles force parent cells whose four children span
    up to four different source tiles — the exchange must reassemble
    them before reducing."""
    scheme = fixtures.make_scheme(4, 4)
    ts = from_arrow_tiles(fixtures.tiles_table(scheme), scheme)
    want = oracle.pyramid_reduce(_f32(fixtures.assemble_truth(scheme)))
    got = to_array(pyramid_level(ts, tile_h=3, tile_w=3))
    np.testing.assert_array_equal(got, want)


def test_pyramid_pencil_case():
    a = np.array(
        [
            [1.0, 2.0, 3.0],
            [4.0, np.nan, 6.0],
            [np.nan, np.nan, np.nan],
        ]
    )
    out = oracle.pyramid_reduce(a)
    assert out.shape == (2, 2)
    # ((1+2)+4)+0 over 3 finite children
    assert out[0, 0] == np.float32((1.0 + 2.0 + 4.0) / 3.0)
    # odd right edge: children (0,2) valid, (1,2) valid -> (3+6)/2
    assert out[0, 1] == np.float32(4.5)
    # bottom row: all children NaN or out of grid
    assert np.isnan(out[1, 0]) and np.isnan(out[1, 1])


def test_reduce2x_fixed_order_is_left_associative():
    # values chosen so float addition is NOT associative: the contract
    # order ((w00+w01)+w10)+w11 differs from other parenthesizations
    w = np.array([[1e16, 1.0], [1.0, -1e16]])
    out = reduce2x(w)
    expect = (((1e16 + 1.0) + 1.0) + -1e16) / 4.0
    assert out[0, 0] == expect
    assert expect != ((1e16 + (1.0 + 1.0)) + -1e16) / 4.0
