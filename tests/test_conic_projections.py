"""Lambert conformal conic + Albers equal-area (Snyder 1987 §15/§14
ellipsoidal series) — validated by mathematical invariants rather than
memorized worked examples: exact round-trips, unit scale on the standard
parallels (conformal), the authalic Jacobian identity (equal-area), a
vertical central meridian, and the EPSG dispatch."""

import numpy as np
import pytest

from hydro_raster_ray.stages.reproject import (
    AlbersEqualArea,
    LambertConformalConic,
    conus_albers,
    crs_transform,
    epsg_transform,
    lambert93,
)


def _scale_along_parallel(proj, lat_deg: float, lon_deg: float) -> float:
    """Numerical local scale factor along a parallel: projected length of
    an infinitesimal east step over its true ellipsoidal arc
    (ds = nu(phi) cos(phi) dlambda)."""
    a = proj.a
    e2 = 1.0 - (proj.b / proj.a) ** 2
    phi = np.deg2rad(lat_deg)
    nu = a / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
    dlam = 1e-6
    x1, y1 = proj.forward(lon_deg, lat_deg)
    x2, y2 = proj.forward(lon_deg + np.rad2deg(dlam), lat_deg)
    return float(np.hypot(x2 - x1, y2 - y1) / (nu * np.cos(phi) * dlam))


def test_lcc_roundtrip_exact():
    lon, lat = np.meshgrid(np.linspace(-4, 9, 25), np.linspace(41, 51, 25))
    E, N = lambert93.forward(lon, lat)
    lo2, la2 = lambert93.inverse(E, N)
    np.testing.assert_allclose(lo2, lon, atol=1e-11)
    np.testing.assert_allclose(la2, lat, atol=1e-11)


def test_lcc_unit_scale_on_standard_parallels():
    for sp in (lambert93.sp1, lambert93.sp2):
        assert abs(_scale_along_parallel(lambert93, sp, 2.0) - 1.0) < 1e-8
    # conformal cone: scale < 1 between the parallels, > 1 outside
    assert _scale_along_parallel(lambert93, 46.5, 2.0) < 1.0
    assert _scale_along_parallel(lambert93, 52.0, 2.0) > 1.0
    assert _scale_along_parallel(lambert93, 41.0, 2.0) > 1.0


def test_lcc_central_meridian_vertical():
    E, _ = lambert93.forward(lambert93.lon0, np.array([42.0, 46.5, 50.0]))
    np.testing.assert_allclose(E, lambert93.e0, atol=1e-6)


def test_albers_roundtrip_exact():
    lon, lat = np.meshgrid(
        np.linspace(-120, -75, 25), np.linspace(25, 49, 25)
    )
    E, N = conus_albers.forward(lon, lat)
    lo2, la2 = conus_albers.inverse(E, N)
    np.testing.assert_allclose(lo2, lon, atol=1e-11)
    np.testing.assert_allclose(la2, lat, atol=1e-10)


def test_albers_preserves_area_element():
    """The equal-area defining property: |det J| of (E,N) w.r.t. (lam,phi)
    equals the ellipsoid's area element a²(1−e²)cosφ/(1−e²sin²φ)²
    everywhere — not just on the standard parallels."""
    a = conus_albers.a
    e2 = 1.0 - (conus_albers.b / conus_albers.a) ** 2
    rng = np.random.default_rng(0)
    dd = 1e-6
    for lo, la in zip(rng.uniform(-120, -75, 12), rng.uniform(25, 49, 12)):
        x0, y0 = conus_albers.forward(lo, la)
        xl, yl = conus_albers.forward(lo + np.rad2deg(dd), la)
        xp, yp = conus_albers.forward(lo, la + np.rad2deg(dd))
        J = abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (dd * dd)
        phi = np.deg2rad(la)
        truth = a * a * (1 - e2) * np.cos(phi) / (1 - e2 * np.sin(phi) ** 2) ** 2
        assert abs(J / truth - 1.0) < 1e-6


def test_batch_invariance():
    """Splitting the input into chunks of any size gives bit-identical
    results to one full-array call — what the tile path relies on (the
    witness evaluates whole-array, the engine per tile). Fixed-count
    inverse iterations plus elementwise numpy kernels guarantee it.
    (Scalar 0-d evaluation may differ by 1 ulp — numpy's scalar
    transcendental path differs from the SIMD one — which is why the
    engine always warps arrays, never python floats.)"""
    rng = np.random.default_rng(5)
    lons = rng.uniform(-4, 9, 97)
    lats = rng.uniform(41, 51, 97)
    Ev, Nv = lambert93.forward(lons, lats)
    for cuts in ((40, 57), (1, 31, 65), (96, 1)):
        pos, Es, Ns = 0, [], []
        for n in cuts:
            Ec, Nc = lambert93.forward(lons[pos : pos + n], lats[pos : pos + n])
            Es.append(np.atleast_1d(Ec))
            Ns.append(np.atleast_1d(Nc))
            pos += n
        Ec, Nc = lambert93.forward(lons[pos:], lats[pos:])
        Es.append(np.atleast_1d(Ec))
        Ns.append(np.atleast_1d(Nc))
        np.testing.assert_array_equal(np.concatenate(Es), Ev)
        np.testing.assert_array_equal(np.concatenate(Ns), Nv)
    lov, lav = conus_albers.inverse(Ev, Nv)
    lo1, la1 = conus_albers.inverse(Ev[:50], Nv[:50])
    lo2, la2 = conus_albers.inverse(Ev[50:], Nv[50:])
    np.testing.assert_array_equal(np.concatenate([lo1, lo2]), lov)
    np.testing.assert_array_equal(np.concatenate([la1, la2]), lav)


def test_epsg_dispatch_and_composition():
    f, i = epsg_transform(2154)
    E, N = f(3.0, 46.5)
    lo, la = i(E, N)
    assert abs(lo - 3.0) < 1e-10 and abs(la - 46.5) < 1e-10
    f5, _ = epsg_transform(5070)
    assert np.isfinite(f5(-96.0, 23.0)[0])
    # projected→projected through geographic: BNG → Lambert-93 round trip
    fwd, inv = crs_transform(27700, 2154)
    x, y = fwd(400000.0, 250000.0)
    x2, y2 = inv(x, y)
    assert abs(x2 - 400000.0) < 1e-5 and abs(y2 - 250000.0) < 1e-5
    # 31370 is registered now (round-5 registry); an unimplemented
    # family still raises with the scoping stated
    with pytest.raises(ValueError, match="EPSG:28992"):
        epsg_transform(28992)


def test_custom_parameterizations():
    """The classes are general: a one-standard-parallel-style custom cone
    and a southern-hemisphere Albers both round-trip."""
    lcc = LambertConformalConic(sp1=33.0, sp2=45.0, lat0=23.0, lon0=-96.0,
                                e0=0.0, n0=0.0)
    E, N = lcc.forward(-75.0, 35.0)
    lo, la = lcc.inverse(E, N)
    assert abs(lo + 75.0) < 1e-10 and abs(la - 35.0) < 1e-10
    alb = AlbersEqualArea(sp1=-18.0, sp2=-36.0, lat0=0.0, lon0=132.0,
                          e0=0.0, n0=0.0)
    E, N = alb.forward(145.0, -30.0)
    lo, la = alb.inverse(E, N)
    assert abs(lo - 145.0) < 1e-10 and abs(la + 30.0) < 1e-10


def test_polar_stereo_roundtrip_exact_both_aspects():
    from hydro_raster_ray.stages.reproject import (
        antarctic_south,
        nsidc_north,
    )

    lon, lat = np.meshgrid(np.linspace(-180, 180, 19), np.linspace(55, 89, 9))
    E, N = nsidc_north.forward(lon, lat)
    lo2, la2 = nsidc_north.inverse(E, N)
    # longitudes wrap at ±180: compare modulo 360
    np.testing.assert_allclose((lo2 - lon + 180) % 360 - 180, 0, atol=1e-9)
    np.testing.assert_allclose(la2, lat, atol=1e-10)
    E, N = antarctic_south.forward(lon, -lat)
    lo2, la2 = antarctic_south.inverse(E, N)
    np.testing.assert_allclose((lo2 - lon + 180) % 360 - 180, 0, atol=1e-9)
    np.testing.assert_allclose(la2, -lat, atol=1e-10)


def test_polar_stereo_unit_scale_on_standard_parallel():
    from hydro_raster_ray.stages.reproject import antarctic_south, nsidc_north

    assert abs(_scale_along_parallel(nsidc_north, 70.0, 10.0) - 1.0) < 1e-8
    assert abs(_scale_along_parallel(antarctic_south, -71.0, 10.0) - 1.0) < 1e-8
    # stereographic: scale > 1 equatorward of the standard parallel,
    # < 1 poleward
    assert _scale_along_parallel(nsidc_north, 60.0, 10.0) > 1.0
    assert _scale_along_parallel(nsidc_north, 80.0, 10.0) < 1.0


def test_polar_stereo_conformal_isotropy():
    """Conformality: the local scale along a parallel equals the local
    scale along a meridian at random points (isotropic Jacobian)."""
    from hydro_raster_ray.stages.reproject import nsidc_north as p

    a, e2 = p.a, 1.0 - (p.b / p.a) ** 2
    rng = np.random.default_rng(3)
    dd = 1e-7
    for lo, la in zip(rng.uniform(-180, 180, 10), rng.uniform(56, 88, 10)):
        phi = np.deg2rad(la)
        x0, y0 = p.forward(lo, la)
        xl, yl = p.forward(lo + np.rad2deg(dd), la)
        xp, yp = p.forward(lo, la + np.rad2deg(dd))
        nu = a / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
        rho_m = a * (1 - e2) / (1.0 - e2 * np.sin(phi) ** 2) ** 1.5
        k_par = np.hypot(xl - x0, yl - y0) / (nu * np.cos(phi) * dd)
        k_mer = np.hypot(xp - x0, yp - y0) / (rho_m * dd)
        assert abs(k_par / k_mer - 1.0) < 1e-5


def test_polar_stereo_pole_and_axes():
    from hydro_raster_ray.stages.reproject import antarctic_south, nsidc_north

    E, N = nsidc_north.forward(np.array([0.0]), np.array([90.0]))
    assert abs(E[0] - nsidc_north.e0) < 1e-6 and abs(N[0] - nsidc_north.n0) < 1e-6
    E, N = antarctic_south.forward(np.array([0.0]), np.array([-90.0]))
    assert abs(E[0]) < 1e-6 and abs(N[0]) < 1e-6
    # variant-B axes: along lon0, north aspect N decreases away from the
    # pole, south aspect N increases (EPSG:3031 grid-north = lon0)
    _, Nn = nsidc_north.forward(np.array([nsidc_north.lon0]), np.array([80.0]))
    assert Nn[0] < 0
    _, Ns = antarctic_south.forward(np.array([0.0]), np.array([-80.0]))
    assert Ns[0] > 0


def test_polar_stereo_epsg_dispatch_and_batch_invariance():
    from hydro_raster_ray.stages.reproject import epsg_transform

    f, i = epsg_transform(3413)
    lo, la = i(*f(np.array([-45.0]), np.array([75.0])))
    assert abs(lo[0] + 45.0) < 1e-9 and abs(la[0] - 75.0) < 1e-9
    f, i = epsg_transform(3031)
    rng = np.random.default_rng(9)
    lons = rng.uniform(-180, 180, 61)
    lats = rng.uniform(-89, -60, 61)
    Ev, Nv = f(lons, lats)
    E1, N1 = f(lons[:23], lats[:23])
    E2, N2 = f(lons[23:], lats[23:])
    np.testing.assert_array_equal(np.concatenate([E1, E2]), Ev)
    np.testing.assert_array_equal(np.concatenate([N1, N2]), Nv)
