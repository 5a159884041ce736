"""Focal statistics (3×3 NaN-aware mean/min/max/range) vs the whole-array
witness — bit-exact on both execution paths, hole-FILLING semantics."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.focal import focal_stats


def _f32(a):
    return a.astype(np.float32).astype(np.float64)


@pytest.mark.parametrize("stat", ["mean", "min", "max", "range", "median"])
def test_focal_matches_witness(ray_session, small_scheme, stat):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    want = _f32(oracle.focal(full, stat))
    got = to_array(focal_stats(ts, stat))
    np.testing.assert_array_equal(got, want)


def test_focal_fills_single_holes(ray_session, small_scheme):
    """Focal stats FILL 1-px holes (output NaN only where the whole window
    is NaN) — the opposite convention from the derivative family."""
    full = fixtures.assemble_truth(small_scheme)
    m = oracle.focal(full, "mean")
    # a single NaN hole: its focal mean is finite (neighbors exist)
    holes = np.isnan(full)
    if holes.any():
        assert np.isfinite(m[holes]).any() or not holes.any()
    # synthetic check independent of fixture holes
    a = np.full((5, 5), 2.0)
    a[2, 2] = np.nan
    out = oracle.focal(a, "mean")
    assert out[2, 2] == 2.0
    a[:, :] = np.nan
    assert np.isnan(oracle.focal(a, "max")).all()


def test_focal_exchange_fallback_bit_matches(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(focal_stats(ts, "mean"))
    slow = to_array(focal_stats(ts, "mean", halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)


def test_focal_rejects_unknown_stat(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    with pytest.raises(ValueError, match="stat must be one of"):
        focal_stats(ts, "mode")


def test_focal_median_hand_cases(ray_session):
    """Median semantics: odd interior window picks the middle order
    statistic, a clipped corner window (4 values) averages the two middle,
    NaNs are dropped from the order statistic, all-NaN stays NaN."""
    a = np.array(
        [
            [1.0, 9.0, 2.0],
            [8.0, 3.0, 7.0],
            [4.0, 6.0, 5.0],
        ]
    )
    out = oracle.focal(a, "median")
    assert out[1, 1] == 5.0                       # median of 1..9
    assert out[0, 0] == np.median([1.0, 9.0, 8.0, 3.0])  # corner: 4 vals
    a[1, 1] = np.nan
    out = oracle.focal(a, "median")
    # centre window drops its NaN: median of the 8 neighbors
    assert out[1, 1] == np.median([1, 9, 2, 8, 7, 4, 6, 5])
    assert np.isnan(oracle.focal(np.full((3, 3), np.nan), "median")).all()
