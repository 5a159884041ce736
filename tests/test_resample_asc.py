"""Halo-exchange resampling + ASC I/O parity + simple element ops."""

import gzip

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.grid import GridSpec
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.sources.asc import from_numpy, read_asc, write_asc
from hydro_raster_ray.stages.resample import resample


@pytest.fixture(scope="module")
def tileset(ray_session, small_scheme):
    return from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)


def _mosaic(scheme):
    out = np.full(scheme.grid.shape, np.nan)
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            h, w = scheme.tile_shape(tr, tc)
            out[r0 : r0 + h, c0 : c0 + w] = fixtures.tile_truth(scheme, tr, tc)
    return out


from hydro_raster_ray.stages.resample import METHODS


@pytest.mark.parametrize("method", list(METHODS))
@pytest.mark.parametrize("newsize", [7.5, 3.0])
def test_resample_matches_oracle(tileset, small_scheme, method, newsize):
    a = _mosaic(small_scheme)
    want, want_spec = oracle.resample(a, small_scheme.grid, newsize, method)
    got_ts = resample(tileset, newsize, method)
    assert got_ts.grid == want_spec
    got = to_array(got_ts)
    # engine stores float32 precision
    want32 = want.astype(np.float32).astype(np.float64)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want32))
    if method == "average":
        # summed-area table accumulates in window-local order → last-ulp
        # differences vs the whole-array oracle are expected
        np.testing.assert_allclose(
            got[~np.isnan(got)], want32[~np.isnan(want32)], rtol=1e-6, atol=1e-4
        )
    else:
        np.testing.assert_allclose(
            got[~np.isnan(got)], want32[~np.isnan(want32)], rtol=0, atol=0
        )


def test_resample_upscale_identity_points(tileset, small_scheme):
    # bilinear at the SAME cellsize is the identity (fy lands on integers)
    got = to_array(resample(tileset, small_scheme.grid.cellsize, "bilinear"))
    np.testing.assert_array_equal(got, _mosaic(small_scheme))


def test_asc_roundtrip(tmp_path):
    spec = GridSpec(ncols=10, nrows=5, xllcorner=0.0, yllcorner=0.0, cellsize=2.0)
    a = np.arange(50, dtype=np.float64).reshape(5, 10)
    a[0, 0] = np.nan
    p = str(tmp_path / "g.asc")
    write_asc(a.copy(), spec, p)
    with open(p, "rb") as f:
        head = f.read(60)
    assert head.startswith(b"ncols    10\nnrows    5\nxllcorner    0\n")
    b, spec2, wkt = read_asc(p)
    assert spec2 == spec and wkt is None
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    np.testing.assert_array_equal(a[~np.isnan(a)], b[~np.isnan(b)])
    # gz round trip (reference auto-suffix)
    p2 = write_asc(a.copy(), spec, str(tmp_path / "g2.asc"), compression=True)
    assert p2.endswith(".gz")
    c, spec3, _ = read_asc(p2)
    np.testing.assert_array_equal(b[~np.isnan(b)], c[~np.isnan(c)])


def test_from_numpy_and_write_asc_tileset(ray_session, tmp_path):
    spec = GridSpec(ncols=120, nrows=60, xllcorner=-5.0, yllcorner=0.0, cellsize=0.5)
    a = fixtures.analytic_z(*np.meshgrid(
        spec.xllcorner + (np.arange(120) + 0.5) * 0.5,
        spec.yllcorner + spec.nrows * 0.5 - (np.arange(60) + 0.5) * 0.5,
    ), spec)
    ts = from_numpy(a, spec, tile_h=32, tile_w=32)
    got = to_array(ts)
    np.testing.assert_array_equal(got, a.astype(np.float32).astype(np.float64))
    p = write_asc(ts, str(tmp_path / "m.asc"))
    b, spec2, _ = read_asc(p)
    assert spec2 == spec
