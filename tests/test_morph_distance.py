"""Grayscale morphology (erode/dilate/open/close) and the bounded
Chebyshev distance transform vs their whole-array witnesses — bit-exact
on both halo execution paths (broadcast strips + fragment exchange)."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.distance import distance_transform
from hydro_raster_ray.stages.morph import morph


def _f32(a):
    return a.astype(np.float32).astype(np.float64)


@pytest.mark.parametrize("op", ["erode", "dilate", "open", "close"])
def test_morph_matches_witness(ray_session, small_scheme, op):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    # morphology SELECTS values (order statistics): witness of the f32
    # corpus equals f32 of the witness — no arithmetic anywhere
    want = _f32(oracle.morph(_f32(full), op))
    got = to_array(morph(ts, op))
    np.testing.assert_array_equal(got, want)


def test_morph_exchange_path_bit_matches(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(morph(ts, "open"))
    slow = to_array(morph(ts, "open", halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)


def test_morph_open_removes_speckle(ray_session):
    """Opening removes a 1-px bright speckle but keeps a 3×3 plateau."""
    a = np.zeros((9, 9))
    a[2, 2] = 9.0  # speckle
    a[5:8, 5:8] = 7.0  # plateau (erosion-stable core at its centre)
    out = oracle.morph(a, "open")
    assert out[2, 2] == 0.0
    assert out[6, 6] == 7.0


def test_morph_rejects_unknown_op(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    with pytest.raises(ValueError, match="op must be one of"):
        morph(ts, "thin")


@pytest.mark.parametrize("iters", [0, 1, 4])
def test_distance_matches_witness(ray_session, small_scheme, iters):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = _f32(fixtures.assemble_truth(small_scheme))
    want = oracle.distance_transform(full, threshold=50.0, iters=iters)
    got = to_array(distance_transform(ts, threshold=50.0, iters=iters))
    np.testing.assert_array_equal(got, want)


def test_distance_exchange_path_bit_matches(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(distance_transform(ts, 50.0, iters=2))
    slow = to_array(distance_transform(ts, 50.0, iters=2, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)


def test_distance_hand_case(ray_session):
    """Exact-to-k semantics: one source, NaN excluded, inf beyond budget."""
    a = np.full((1, 6), 0.0)
    a[0, 0] = 100.0  # source
    a[0, 3] = np.nan  # wall: paths may not cross nodata
    d = oracle.distance_transform(a, 50.0, iters=4)
    assert d[0, 0] == 0.0 and d[0, 1] == 1.0 and d[0, 2] == 2.0
    assert np.isnan(d[0, 3])
    # cells past the NaN wall are unreachable on a 1-row grid
    assert np.isinf(d[0, 4]) and np.isinf(d[0, 5])
    # budget cap: with iters=1 the distance-2 cell is still inf
    d1 = oracle.distance_transform(a, 50.0, iters=1)
    assert np.isinf(d1[0, 2])
