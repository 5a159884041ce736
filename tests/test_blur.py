"""Binomial (Gaussian) blur vs its whole-array witness — bit-exact on
both halo execution paths, strict-window semantics, hand-computed
pencil case."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.blur import binomial_blur


def _f32(a):
    return a.astype(np.float32).astype(np.float64)


@pytest.mark.parametrize("passes", [1, 2])
def test_blur_matches_witness(ray_session, small_scheme, passes):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)
    # the witness applies the f32 storage round-trip per pass itself;
    # its input is the f32-decoded corpus
    want = oracle.binomial_blur(_f32(full), passes)
    got = to_array(binomial_blur(ts, passes))
    np.testing.assert_array_equal(got, want)


def test_blur_exchange_path_bit_matches(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    fast = to_array(binomial_blur(ts, 2))
    slow = to_array(binomial_blur(ts, 2, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)


def test_blur_pencil_case():
    """Hand-computed 3×3 window: centre of a ramp, strict edges, holes."""
    a = np.array(
        [
            [1.0, 2.0, 3.0, 4.0],
            [5.0, 6.0, 7.0, 8.0],
            [9.0, 10.0, 11.0, np.nan],
        ]
    )
    out = oracle.binomial_blur(a, passes=1)
    # (1*1 + 2*2 + 1*3 + 2*5 + 4*6 + 2*7 + 1*9 + 2*10 + 1*11) / 16 = 6
    assert out[1, 1] == 6.0
    # every border cell lacks part of its window -> NaN (strict)
    assert np.isnan(out[0, :]).all() and np.isnan(out[2, :]).all()
    assert np.isnan(out[:, 0]).all() and np.isnan(out[:, 3]).all()
    # the hole poisons its neighborhood: [1,2] window includes [2,3]=NaN
    assert np.isnan(out[1, 2])


def test_blur_two_passes_equal_chained_single_passes():
    """passes=2 IS pass∘pass including the f32 round-trip in between."""
    rng = np.random.default_rng(7)
    a = rng.uniform(0, 100, size=(12, 9))
    two = oracle.binomial_blur(a, passes=2)
    chained = oracle.binomial_blur(oracle.binomial_blur(a, 1), 1)
    np.testing.assert_array_equal(two, chained)


def test_blur_rejects_bad_passes(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    with pytest.raises(ValueError, match="passes must be >= 1"):
        binomial_blur(ts, passes=0)
