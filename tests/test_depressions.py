"""Distributed depression filling (spill-graph contraction) vs the
whole-array Priority-Flood witness — exact, including cross-tile
depressions, NaN-hole drains, ragged tiles, and the exchange fallback."""

import numpy as np

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.depressions import fill_depressions

from test_flowacc import _f32, _tileset_from


def _assert_fill_matches(ts, full):
    want = oracle.fill_depressions(_f32(full))
    got = to_array(fill_depressions(ts))
    np.testing.assert_array_equal(got, want)
    return got


def test_fixture_surface_matches_witness(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    got = _assert_fill_matches(ts, full)
    finite = np.isfinite(got)
    assert (got[finite] >= _f32(full)[finite]).all()  # fill never lowers


def test_giant_cross_tile_depression(ray_session):
    """A paraboloid bowl spanning all nine tiles: every interior cell must
    fill to the bowl's rim spill level, which only the global minimax
    solve (not any single tile) can know."""
    scheme = fixtures.make_scheme(3, 3, tile_h=16, tile_w=16, ragged=False)
    cc, rr = np.meshgrid(np.arange(48.0), np.arange(48.0))
    full = ((rr - 24) ** 2 + (cc - 24) ** 2) * 0.05
    ts = _tileset_from(full, scheme)
    got = _assert_fill_matches(ts, full)
    # the center (bowl bottom, z=0) fills to the spill level of the rim —
    # the minimum over the grid edge of the f32 elevations
    spill = _f32(full)[[0, -1], :].min().item()
    spill = min(spill, _f32(full)[:, [0, -1]].min().item())
    assert got[24, 24] == spill
    assert got[24, 24] > 0.0


def test_nan_hole_drains_the_bowl(ray_session):
    """Punching a NaN hole in the bowl floor turns its ring into drains:
    cells near the hole fill to (near) their own elevation instead of the
    rim spill level."""
    scheme = fixtures.make_scheme(3, 3, tile_h=16, tile_w=16, ragged=False)
    cc, rr = np.meshgrid(np.arange(48.0), np.arange(48.0))
    full = ((rr - 24) ** 2 + (cc - 24) ** 2) * 0.05
    holed = full.copy()
    holed[23:26, 23:26] = np.nan
    ts = _tileset_from(holed, scheme)
    got = _assert_fill_matches(ts, holed)
    z = _f32(holed)
    assert got[22, 24] == z[22, 24]  # hole-adjacent cell drains at own z
    assert np.isnan(got[24, 24])


def test_random_nan_and_ragged_tiles(ray_session):
    rng = np.random.default_rng(11)
    scheme = fixtures.make_scheme(3, 3, tile_h=16, tile_w=16, ragged=True)
    g = scheme.grid
    full = rng.normal(100.0, 10.0, (g.nrows, g.ncols))
    full[rng.random(full.shape) < 0.05] = np.nan
    ts = _tileset_from(full, scheme)
    _assert_fill_matches(ts, full)


def test_exchange_fallback_bit_matches_broadcast(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(fill_depressions(ts))
    slow = to_array(fill_depressions(ts, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)


def test_side_pit_fills_to_its_own_spill(ray_session):
    """A local pit dug into the bowl slope fills to ITS spill (the lowest
    saddle out of the pit), not the bowl rim — nested depression levels."""
    scheme = fixtures.make_scheme(3, 3, tile_h=16, tile_w=16, ragged=False)
    cc, rr = np.meshgrid(np.arange(48.0), np.arange(48.0))
    full = np.abs(cc - 24.0) * 0.5 + rr * 0.1  # tilted valley, drains north
    full[30:34, 10:14] -= 20.0  # pit on the west slope
    ts = _tileset_from(full, scheme)
    got = _assert_fill_matches(ts, full)
    z = _f32(full)
    inside = got[31, 11]
    assert inside > z[31, 11]  # pit floor raised
    assert inside < z[:, [0, -1]].max()  # but nowhere near the global max


def test_event_fill_bit_matches_reconstruction(ray_session):
    """The exact event sweep (fallback) and the reconstruction-by-erosion
    fast path compute the same fixpoint bit-exactly."""
    rng = np.random.default_rng(23)
    scheme = fixtures.make_scheme(3, 3, tile_h=16, tile_w=16, ragged=False)
    g = scheme.grid
    full = rng.normal(100.0, 10.0, (g.nrows, g.ncols))
    full[rng.random(full.shape) < 0.04] = np.nan
    full[20:28, 20:28] -= 40.0  # cross-tile depression
    ts = _tileset_from(full, scheme)
    fast = to_array(fill_depressions(ts))
    slow = to_array(fill_depressions(ts, force_event_fill=True))
    np.testing.assert_array_equal(fast, slow)
    np.testing.assert_array_equal(fast, oracle.fill_depressions(_f32(full)))
