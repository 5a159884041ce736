"""Sobel gradient magnitude vs its whole-array witness — bit-exact on
both halo execution paths, strict-window semantics, hand-computed
pencil case."""

import numpy as np

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.sobel import sobel_magnitude


def _f32(a):
    return a.astype(np.float32).astype(np.float64)


def test_sobel_matches_witness(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    want = oracle.sobel_magnitude(_f32(full))
    got = to_array(sobel_magnitude(ts))
    np.testing.assert_array_equal(got, want)


def test_sobel_exchange_path_bit_matches(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(sobel_magnitude(ts))
    slow = to_array(sobel_magnitude(ts, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)


def test_sobel_pencil_case():
    """Hand-computed 3×3 ramp centre, strict edges, hole poisoning."""
    a = np.array(
        [
            [1.0, 2.0, 3.0, 4.0],
            [4.0, 5.0, 6.0, 7.0],
            [7.0, 8.0, 9.0, np.nan],
        ]
    )
    out = oracle.sobel_magnitude(a)
    # centre [1,1]: gx = -1+3-8+12-7+9 = 8 ; gy = -1-4-3+7+16+9 = 24
    # |g| = sqrt(64 + 576) = sqrt(640)
    assert out[1, 1] == np.float32(np.sqrt(640.0))
    # every border cell lacks part of its window -> NaN (strict)
    assert np.isnan(out[0, :]).all() and np.isnan(out[2, :]).all()
    assert np.isnan(out[:, 0]).all() and np.isnan(out[:, 3]).all()
    # the hole poisons its neighborhood: [1,2] window includes [2,3]=NaN
    assert np.isnan(out[1, 2])


def test_sobel_flat_plane_is_zero_not_negative_zero():
    """A constant plane has |g| = +0.0 — sqrt never yields -0.0, the
    engine/oracle hash-parity guard from the module docstring."""
    a = np.full((5, 5), 42.0)
    out = oracle.sobel_magnitude(a)
    inner = out[1:-1, 1:-1]
    assert (inner == 0.0).all()
    assert not np.signbit(inner).any()
