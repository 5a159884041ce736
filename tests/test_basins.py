"""Distributed D8 basin delineation (terminal contraction) vs the
whole-array witness — exact labels, including cross-tile chains, NaN
holes, the raw-f64 plane format, and exact basin-size counts."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.basins import basin_labels, basin_sizes

from test_flowacc import _f32, _tileset_from


def _assert_labels_match(ts, full):
    want = oracle.basin_labels(_f32(full))
    got = to_array(basin_labels(ts))
    np.testing.assert_array_equal(got, want)
    return got


def test_fixture_surface_matches_witness(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    got = _assert_labels_match(ts, full)
    # labels are global flat indices of pit cells: every label's cell must
    # itself carry that label (pits label themselves)
    labs = np.unique(got[np.isfinite(got)]).astype(np.int64)
    ncols = got.shape[1]
    for g in labs.tolist():
        assert got[g // ncols, g % ncols] == g


def test_cross_tile_valley_single_basin(ray_session):
    """A south-tilted V-valley whose every cell drains to one outlet pit:
    the label must propagate back UP through all three tile rows (the
    driver chain solve), yielding a single basin."""
    scheme = fixtures.make_scheme(3, 3, tile_h=16, tile_w=16, ragged=False)
    n = 48
    cc, rr = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float))
    full = np.abs(cc - 24.0) * 2.0 - rr * 0.5  # V-valley at col 24, south tilt
    ts = _tileset_from(full, scheme)
    got = _assert_labels_match(ts, full)
    # valley floor cells across ALL tile rows share the outlet's basin
    outlet = got[n - 1, 24]
    assert got[0, 24] == outlet and got[24, 24] == outlet


def test_nan_holes_and_deep_pit(ray_session):
    scheme = fixtures.make_scheme(2, 2, tile_h=16, tile_w=16, ragged=False)
    full = fixtures.assemble_truth(scheme).copy()
    full[10:12, 14:17] = np.nan  # hole straddling a tile border
    full[20, 20] = -1e6  # deep pit capturing its neighborhood
    ts = _tileset_from(full, scheme)
    got = _assert_labels_match(ts, full)
    assert np.isnan(got[10, 15])
    assert got[20, 20] == 20 * full.shape[1] + 20
    assert got[19, 19] == got[20, 20]  # neighbor drains into the deep pit


def test_exchange_fallback_bit_matches_broadcast(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(basin_labels(ts))
    slow = to_array(basin_labels(ts, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)


def test_output_fmt_is_raw_f64(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    out = basin_labels(ts)
    fmts = set(
        f
        for b in out.ds.select_columns(["fmt"]).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
        for f in b["fmt"].to_pylist()
    )
    assert fmts == {"raw-f64"}


def test_basin_sizes_exact(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    want_lab = oracle.basin_labels(_f32(full))
    u, cnt = np.unique(want_lab[np.isfinite(want_lab)], return_counts=True)
    got = (
        basin_sizes(ts)
        .to_pandas()
        .sort_values("basin")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(got["basin"].to_numpy(), u.astype(np.int64))
    np.testing.assert_array_equal(got["n_cells"].to_numpy(), cnt.astype(np.int64))
    assert got["n_cells"].sum() == np.isfinite(full).sum()
