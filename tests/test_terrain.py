"""Distributed slope/aspect (1-px halo exchange) vs the whole-array witness
— bit-exact, including one-sided gradients at global edges and NaN-hole
propagation (no pre-fill, unlike hillshade)."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.terrain import aspect, slope


def _f32(a):
    return a.astype(np.float32).astype(np.float64)


@pytest.fixture(scope="module")
def tileset(ray_session, small_scheme):
    return from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)


def test_slope_matches_witness(tileset, small_scheme):
    full = fixtures.assemble_truth(small_scheme)
    want = _f32(oracle.slope_aspect(full)[0])
    got = to_array(slope(tileset))
    np.testing.assert_array_equal(got, want)


def test_aspect_matches_witness(tileset, small_scheme):
    full = fixtures.assemble_truth(small_scheme)
    want = _f32(oracle.slope_aspect(full)[1])
    got = to_array(aspect(tileset))
    np.testing.assert_array_equal(got, want)


def test_slope_params_match_witness(tileset, small_scheme):
    full = fixtures.assemble_truth(small_scheme)
    want = _f32(oracle.slope_aspect(full, dx=2.5, dy=5.0, vert_exag=3.0)[0])
    got = to_array(slope(tileset, dx=2.5, dy=5.0, vert_exag=3.0))
    np.testing.assert_array_equal(got, want)


def test_nan_holes_propagate(ray_session):
    """NaN holes must propagate exactly one central-difference step — and
    identically on both sides (the fixture truth grid has NODATA holes,
    but pin the semantics with a hand-built hole here)."""
    scheme = fixtures.make_scheme(2, 2, tile_h=16, tile_w=16, ragged=False)
    full = fixtures.assemble_truth(scheme)
    full = full.copy()
    full[10:12, 14:17] = np.nan  # hole straddling work near a tile border
    import pyarrow as pa

    from hydro_raster_ray import codecs

    t = fixtures.tiles_table(scheme)
    # rebuild payloads from the holed truth grid
    rows_b = []
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            h, w = scheme.tile_shape(tr, tc)
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            rows_b.append(codecs.encode(full[r0 : r0 + h, c0 : c0 + w], "raw-f32"))
    t = t.set_column(
        t.schema.get_field_index("bytes"), "bytes", pa.array(rows_b, pa.binary())
    )
    t = t.set_column(
        t.schema.get_field_index("fmt"),
        "fmt",
        pa.array(["raw-f32"] * t.num_rows, pa.string()),
    )
    ts = from_arrow_tiles(t, scheme)
    want_s = _f32(oracle.slope_aspect(_f32(full))[0])
    got_s = to_array(slope(ts))
    np.testing.assert_array_equal(got_s, want_s)
    assert np.isnan(got_s).any() and not np.isnan(got_s).all()


def test_slope_groupby_fallback_bit_matches_broadcast(tileset, small_scheme):
    """Force the groupby-exchange fallback (zero halo budget) — must be
    bit-identical to the broadcast-halo fast path and the witness."""
    fast = to_array(slope(tileset))
    slow = to_array(slope(tileset, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)


def test_flow_dir_matches_witness(tileset, small_scheme):
    from hydro_raster_ray.stages.terrain import flow_dir

    full = fixtures.assemble_truth(small_scheme)
    want = _f32(oracle.flow_dir_d8(full))
    got = to_array(flow_dir(tileset))
    np.testing.assert_array_equal(got, want)


def test_flow_dir_hand_case():
    """Pin the D8 semantics with a hand-verified 3x3 bowl: codes, pit=0,
    tie-break (W before N), diagonal preference."""
    a = np.array([[3.0, 2.0, 3.0], [2.0, 1.0, 2.0], [3.0, 2.0, 9.0]])
    want = np.array(
        [[2.0, 4.0, 8.0], [1.0, 0.0, 16.0], [128.0, 64.0, 16.0]]
    )
    np.testing.assert_array_equal(oracle.flow_dir_d8(a), want)


def test_flow_dir_needs_corners(ray_session):
    """A cell whose steepest drop is the DIAGONAL neighbor across a tile
    boundary — wrong without the corner-pixel halo (the gradient family's
    4-neighbor strips would miss it)."""
    from hydro_raster_ray.stages.terrain import flow_dir

    scheme = fixtures.make_scheme(2, 2, tile_h=16, tile_w=16, ragged=False)
    full = fixtures.assemble_truth(scheme).copy()
    full[:] = 0.0
    # tile boundary is at row/col 16; cell (15,15) is tile (0,0)'s SE corner
    full[15, 15] = 10.0
    full[16, 16] = -50.0  # diagonal neighbor in tile (1,1): steepest drop
    full[15, 16] = -1.0
    full[16, 15] = -1.0
    import pyarrow as pa

    from hydro_raster_ray import codecs

    t = fixtures.tiles_table(scheme)
    rows_b = []
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            h, w = scheme.tile_shape(tr, tc)
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            rows_b.append(codecs.encode(full[r0 : r0 + h, c0 : c0 + w], "raw-f32"))
    t = t.set_column(
        t.schema.get_field_index("bytes"), "bytes", pa.array(rows_b, pa.binary())
    )
    t = t.set_column(
        t.schema.get_field_index("fmt"),
        "fmt",
        pa.array(["raw-f32"] * t.num_rows, pa.string()),
    )
    ts = from_arrow_tiles(t, scheme)
    got = to_array(flow_dir(ts))
    want = _f32(oracle.flow_dir_d8(_f32(full)))
    np.testing.assert_array_equal(got, want)
    assert got[15, 15] == 2.0  # SE across both tile borders


def test_flow_dir_exchange_fallback_bit_matches_broadcast(tileset):
    from hydro_raster_ray.stages.terrain import flow_dir

    fast = to_array(flow_dir(tileset))
    slow = to_array(flow_dir(tileset, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)


def test_fill_pits_matches_witness(tileset, small_scheme):
    from hydro_raster_ray.stages.terrain import fill_pits

    full = fixtures.assemble_truth(small_scheme)
    want = _f32(oracle.fill_pits(full))
    got = to_array(fill_pits(tileset))
    np.testing.assert_array_equal(got, want)


def test_fill_pits_semantics():
    a = np.full((5, 5), 5.0)
    a[2, 2] = 1.0
    a[2, 3] = 3.0
    assert oracle.fill_pits(a)[2, 2] == 3.0  # raised to min neighbor
    e = np.full((5, 5), 5.0)
    e[0, 0] = 1.0
    assert oracle.fill_pits(e)[0, 0] == 1.0  # edge cells drain outward
    h = np.full((5, 5), 5.0)
    h[2, 2] = 1.0
    h[1, 1] = np.nan
    assert oracle.fill_pits(h)[2, 2] == 1.0  # hole-adjacent drains into hole


def test_curvature_matches_witness(ray_session, small_scheme):
    from hydro_raster_ray.stages.terrain import curvature

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    want = oracle.curvature(full).astype(np.float32).astype(np.float64)
    got = to_array(curvature(ts))
    np.testing.assert_array_equal(got, want)
    # exchange fallback is bit-identical
    slow = to_array(curvature(ts, halo_broadcast_budget=0))
    np.testing.assert_array_equal(slow, want)


def test_curvature_hand_cases(ray_session):
    # quadratic bowl z = x² + y² → ∇²z = 4 exactly everywhere interior
    n = 7
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    z = xx * xx + yy * yy
    c = oracle.curvature(z)
    np.testing.assert_array_equal(c[1:-1, 1:-1], np.full((n - 2, n - 2), 4.0))
    assert np.isnan(c[0]).all() and np.isnan(c[:, -1]).all()  # grid edge
    # a hole propagates to its 4-neighborhood
    z[3, 3] = np.nan
    c = oracle.curvature(z)
    assert np.isnan(c[3, 3]) and np.isnan(c[2, 3]) and np.isnan(c[3, 4])
    assert c[2, 2] == 4.0  # diagonal neighbor unaffected (4-stencil)
    # cellsize scaling: cs=2 divides by 4
    c2 = oracle.curvature(xx * xx + yy * yy, cs=2.0)
    np.testing.assert_array_equal(c2[1:-1, 1:-1], np.full((n - 2, n - 2), 1.0))
