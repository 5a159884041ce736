"""LBP codes vs a hand-computed pencil case and the whole-array witness
implied by the module contract; both halo execution paths bit-match."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.lbp import LBP_OFFSETS, _lbp_kernel, lbp_codes


def _f32(a):
    return a.astype(np.float32).astype(np.float64)


def _reference(a):
    """Independent scalar re-derivation of the contract."""
    h, w = a.shape
    out = np.full((h, w), np.nan)
    for r in range(1, h - 1):
        for c in range(1, w - 1):
            win = a[r - 1 : r + 2, c - 1 : c + 2]
            if not np.isfinite(win).all():
                continue
            code = 0
            for i, (dr, dc) in enumerate(LBP_OFFSETS):
                if a[r + dr, c + dc] >= a[r, c]:
                    code |= 1 << i
            out[r, c] = float(code)
    return out


def test_lbp_pencil_case():
    a = np.array(
        [
            [5.0, 1.0, 9.0, 2.0],
            [3.0, 4.0, 4.0, np.nan],
            [8.0, 4.0, 0.0, 7.0],
        ]
    )
    out = _lbp_kernel(a)
    # centre (1,1)=4: neighbors cw from (-1,-1): 5>=4 ->1, 1<4 ->0,
    # 9>=4 ->4, 4>=4 ->8, 0<4 ->0, 4>=4 ->32, 8>=4 ->64, 3<4 ->0
    assert out[1, 1] == float(1 + 4 + 8 + 32 + 64)
    # (1,2) touches the NaN hole -> strict NaN; borders all NaN
    assert np.isnan(out[1, 2])
    assert np.isnan(out[0, :]).all() and np.isnan(out[:, 0]).all()
    np.testing.assert_array_equal(
        np.isnan(out), np.isnan(_reference(a))
    )
    m = np.isfinite(out)
    np.testing.assert_array_equal(out[m], _reference(a)[m])


def test_lbp_matches_reference_on_fixture(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = _f32(fixtures.assemble_truth(small_scheme))
    want = _reference(full)
    # strict window: pad edges NaN like the kernel does globally
    got = to_array(lbp_codes(ts))
    np.testing.assert_array_equal(got, want)


def test_lbp_exchange_path_bit_matches(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(lbp_codes(ts))
    slow = to_array(lbp_codes(ts, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)
