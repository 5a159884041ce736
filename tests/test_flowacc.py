"""Distributed D8 flow accumulation (tile contraction) vs the whole-array
witness — exact, including long cross-tile rivers, NaN holes, and the
forced exchange fallback."""

import numpy as np
import pyarrow as pa
import pytest

from hydro_raster_ray import codecs, fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.flowacc import flow_accumulation


def _f32(a):
    return a.astype(np.float32).astype(np.float64)


def _tileset_from(full: np.ndarray, scheme):
    """Rebuild a TileSet whose payloads carry ``full`` exactly (raw-f32)."""
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
    return from_arrow_tiles(t, scheme)


def _assert_acc_matches(ts, full):
    want = _f32(oracle.flow_accumulation(_f32(full)))
    got = to_array(flow_accumulation(ts))
    np.testing.assert_array_equal(got, want)
    return got


def test_fixture_surface_matches_witness(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    _assert_acc_matches(ts, full)


def test_cross_tile_river(ray_session):
    """A valley running south through every tile row: accumulation along
    the channel must grow across tile boundaries (the border solve)."""
    scheme = fixtures.make_scheme(3, 3, tile_h=16, tile_w=16, ragged=False)
    n = 48
    cc, rr = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float))
    full = np.abs(cc - 24.0) * 2.0 - rr * 0.5  # V-valley at col 24, south tilt
    ts = _tileset_from(full, scheme)
    got = _assert_acc_matches(ts, full)
    # channel outlet (bottom of the valley) drains a large share of cells
    assert got[n - 1, 24] > n * 3  # crossed all 3 tile rows accumulating


def test_nan_holes_and_pits(ray_session):
    scheme = fixtures.make_scheme(2, 2, tile_h=16, tile_w=16, ragged=False)
    full = fixtures.assemble_truth(scheme).copy()
    full[10:12, 14:17] = np.nan  # hole straddling a tile border
    full[20, 20] = -1e6  # deep pit absorbing its neighborhood
    ts = _tileset_from(full, scheme)
    _assert_acc_matches(ts, full)


def test_exchange_fallback_bit_matches_broadcast(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(flow_accumulation(ts))
    slow = to_array(flow_accumulation(ts, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)


def test_conservation(ray_session, small_scheme):
    """Every finite cell contributes exactly 1 to each cell on its path:
    the sum of (acc - 1) equals the total number of hops, and the max acc
    cannot exceed the finite-cell count."""
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    got = to_array(flow_accumulation(ts))
    finite = np.isfinite(got)
    assert (got[finite] >= 1.0).all()
    assert got[finite].max() <= finite.sum()


def test_stream_mask_matches_witness(ray_session, small_scheme):
    """Threshold mask over the distributed accumulation equals the
    whole-array accumulation thresholded — and is a genuine network
    (some stream cells, far fewer than total cells)."""
    from hydro_raster_ray.sources import from_arrow_tiles, to_array
    from hydro_raster_ray.stages.flowacc import stream_mask

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    acc = oracle.flow_accumulation(_f32(full))
    want = np.where(np.isnan(acc), np.nan, (acc >= 20.0).astype(np.float64))
    got = to_array(stream_mask(ts, threshold=20.0))
    np.testing.assert_array_equal(got, want)
    n_stream = np.nansum(got)
    assert 0 < n_stream < np.isfinite(got).sum()


def test_flow_length_matches_witness(ray_session, small_scheme):
    """Distributed flow length (integer hop-count contraction) equals the
    whole-array witness bit-exactly, including the √2 diagonal steps."""
    from hydro_raster_ray.sources import from_arrow_tiles, to_array
    from hydro_raster_ray.stages.flowacc import flow_length

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    want = _f32(oracle.flow_length(_f32(full)))
    got = to_array(flow_length(ts))
    np.testing.assert_array_equal(got, want)
    finite = np.isfinite(got)
    assert (got[finite] >= 0).all() and got[finite].max() > 1.0


def test_flow_length_cross_tile_river(ray_session):
    """The valley channel's outlet-adjacent cells carry path lengths that
    grow monotonically upstream across all three tile rows."""
    from hydro_raster_ray.sources import to_array
    from hydro_raster_ray.stages.flowacc import flow_length

    scheme = fixtures.make_scheme(3, 3, tile_h=16, tile_w=16, ragged=False)
    n = 48
    cc, rr = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float))
    full = np.abs(cc - 24.0) * 2.0 - rr * 0.5
    ts = _tileset_from(full, scheme)
    got = to_array(flow_length(ts))
    want = _f32(oracle.flow_length(_f32(full)))
    np.testing.assert_array_equal(got, want)
    chan = got[:, 24]
    assert chan[0] > chan[24] > chan[n - 1] == 0.0  # outlet pit is 0


def test_flow_length_exchange_fallback(ray_session, small_scheme):
    from hydro_raster_ray.sources import from_arrow_tiles, to_array
    from hydro_raster_ray.stages.flowacc import flow_length

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(flow_length(ts))
    slow = to_array(flow_length(ts, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)


def test_strahler_matches_witness(ray_session, small_scheme):
    """Distributed Strahler order (stream-forest contraction) equals the
    whole-array witness exactly, and the network has confluences (order
    ≥ 2 somewhere) so the +1-on-equal-max rule is actually exercised."""
    from hydro_raster_ray.sources import from_arrow_tiles, to_array
    from hydro_raster_ray.stages.flowacc import strahler

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    want = oracle.strahler(_f32(full), threshold=20.0)
    got = to_array(strahler(ts, threshold=20.0))
    np.testing.assert_array_equal(got, want)
    assert np.nanmax(got) >= 2.0


def test_strahler_confluence_rule(ray_session):
    """Two symmetric order-1 channels meeting must produce order 2 below
    the confluence; a third order-1 tributary joining later must NOT bump
    it to 3 (max stays 2, count of max is 1)."""
    from hydro_raster_ray.sources import to_array
    from hydro_raster_ray.stages.flowacc import strahler

    scheme = fixtures.make_scheme(3, 3, tile_h=16, tile_w=16, ragged=False)
    n = 48
    cc, rr = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float))
    # twin V-valleys at cols 12 and 36 merging into one at col 24 below row 24
    upper = np.minimum(np.abs(cc - 12.0), np.abs(cc - 36.0)) * 2.0
    lower = np.abs(cc - 24.0) * 2.0
    full = np.where(rr < 24, upper, lower) - rr * 0.5
    ts = _tileset_from(full, scheme)
    want = oracle.strahler(_f32(full), threshold=8.0)
    got = to_array(strahler(ts, threshold=8.0))
    np.testing.assert_array_equal(got, want)
    assert np.nanmax(got) >= 2.0


def test_strahler_contraction_below_raw_forest_budget(ray_session, small_scheme):
    """The driver only ever sees the CONTRACTED stream graph: a budget set
    BELOW the raw stream-cell count (which the pre-contraction
    implementation materialized and would trip on) must still solve
    exactly — hard evidence that in-degree-1 chains never leave their
    tiles."""
    from hydro_raster_ray.sources import from_arrow_tiles, to_array
    from hydro_raster_ray.stages.flowacc import strahler

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    want = oracle.strahler(_f32(full), threshold=20.0)
    n_stream = int((want > 0).sum())
    assert n_stream > 0
    got = to_array(strahler(ts, threshold=20.0, stream_budget_rows=n_stream - 1))
    np.testing.assert_array_equal(got, want)


def test_strahler_exchange_fallback(ray_session, small_scheme):
    from hydro_raster_ray.sources import from_arrow_tiles, to_array
    from hydro_raster_ray.stages.flowacc import strahler

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(strahler(ts, threshold=20.0))
    slow = to_array(strahler(ts, threshold=20.0, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)
