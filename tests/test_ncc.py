"""NCC template matching: hand-computed pencil case, flat-window NaN,
perfect-match score 1, and bit-identical halo execution paths."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.ncc import TEMPLATE, _ncc_kernel, ncc_match


def test_ncc_perfect_match_scores_one():
    # a window proportional to the template (t itself) has ncc == 1
    a = np.array(TEMPLATE, dtype=np.float64)
    big = np.full((5, 5), 0.0)
    big[1:4, 1:4] = a * 3.0 + 7.0  # affine image of the template
    out = _ncc_kernel(big)
    assert out[2, 2] == pytest.approx(1.0, abs=1e-12)
    # anti-template scores -1
    big[1:4, 1:4] = -a * 2.0 + 1.0
    out = _ncc_kernel(big)
    assert out[2, 2] == pytest.approx(-1.0, abs=1e-12)


def test_ncc_pencil_case():
    a = np.array(
        [
            [1.0, 2.0, 3.0],
            [4.0, 5.0, 6.0],
            [7.0, 8.0, 9.0],
        ]
    )
    # mw = 5; d = [-4..4]; num = 2(-4)-(-3)-(-2)-(-1)+2(0)-1-2-3+2(4)
    d = a - 5.0
    t = np.array(TEMPLATE)
    num = float((t * d).sum())
    den = float((d * d).sum())
    want = num / np.sqrt(den * 18.0)
    out = _ncc_kernel(a)
    assert out[1, 1] == pytest.approx(want, rel=1e-15)


def test_ncc_flat_window_and_holes_are_nan():
    a = np.full((4, 4), 3.25)
    out = _ncc_kernel(a)
    assert np.isnan(out).all()  # den == 0 everywhere interior + edges
    a2 = np.arange(16, dtype=np.float64).reshape(4, 4)
    a2[1, 2] = np.nan
    out2 = _ncc_kernel(a2)
    assert np.isnan(out2[1, 1]) and np.isnan(out2[2, 1])  # hole poisons
    assert np.isfinite(out2[2, 2]) is not None  # 3x3 at (2,2) misses hole?
    # (2,2)'s window rows 1..3 cols 1..3 include the hole -> NaN
    assert np.isnan(out2[2, 2])


def test_ncc_exchange_path_bit_matches(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(ncc_match(ts))
    slow = to_array(ncc_match(ts, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)
    # and the plane is non-trivial on the fixture
    assert np.isfinite(fast).sum() > 0
