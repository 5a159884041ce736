"""Reproject: identity parity, rotated warp vs whole-array, transforms."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures
from hydro_raster_ray.grid import map2sub, sub2map, TileScheme
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.reproject import (
    AffineTransform,
    inv_web_mercator,
    reproject,
    target_grid_for,
    web_mercator,
)


def test_affine_inverse_roundtrip():
    t = AffineTransform.rotation(37.0, 1000.0, 2000.0)
    inv = t.inverse()
    x = np.linspace(-5e3, 5e3, 11)
    y = np.linspace(-3e3, 7e3, 11)
    tx, ty = t(x, y)
    bx, by = inv(tx, ty)
    np.testing.assert_allclose(bx, x, atol=1e-6)
    np.testing.assert_allclose(by, y, atol=1e-6)


def test_web_mercator_roundtrip():
    lon = np.linspace(-179, 179, 21)
    lat = np.linspace(-80, 80, 21)
    x, y = web_mercator(lon, lat)
    lon2, lat2 = inv_web_mercator(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_reproject_identity_preserves_pixels(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    ident = AffineTransform(1, 0, 0, 0, 1, 0)
    got_ts = reproject(
        ts, ident, ident, small_scheme.grid.cellsize, crs=small_scheme.grid.crs
    )
    got = to_array(got_ts)
    want = fixtures.assemble_truth(small_scheme)
    # identity target grid snaps to the same lattice → exact copy where the
    # footprints overlap (target bbox is ceil-snapped, may add 1 edge row/col)
    h = min(got.shape[0], want.shape[0])
    w = min(got.shape[1], want.shape[1])
    ok = ~np.isnan(want[:h, :w])
    np.testing.assert_allclose(got[:h, :w][ok], want[:h, :w][ok], rtol=0, atol=0)


def test_reproject_rotation_matches_whole_array(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    g = small_scheme.grid
    ext = g.extent
    fwd = AffineTransform.rotation(
        15.0, 0.5 * (ext[0] + ext[1]), 0.5 * (ext[2] + ext[3])
    )
    inv = fwd.inverse()
    got = to_array(reproject(ts, fwd, inv, g.cellsize, crs="rot15"))
    spec = target_grid_for(g, fwd, g.cellsize, crs="rot15")
    X, Y = sub2map(np.arange(spec.nrows), np.arange(spec.ncols), spec)
    XX, YY = np.meshgrid(X, Y)
    sx, sy = inv(XX.ravel(), YY.ravel())
    rr, cc = map2sub(sx, sy, g)
    ok = (rr >= 0) & (rr < g.nrows) & (cc >= 0) & (cc < g.ncols)
    full = fixtures.assemble_truth(small_scheme)
    want = np.full(XX.size, np.nan)
    want[ok] = full[rr[ok], cc[ok]]
    want = want.reshape(spec.nrows, spec.ncols).astype(np.float32).astype(np.float64)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got[~np.isnan(got)], want[~np.isnan(want)], rtol=0, atol=0)


def test_tmerc_matches_os_worked_example():
    """Published OS test vector (coordinate-systems guide): OSGB36
    52°39'27.2531"N 1°43'4.5177"E -> E 651409.903, N 313177.270."""
    import numpy as np

    from hydro_raster_ray.stages.reproject import bng_tmerc

    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    E, N = bng_tmerc.forward(np.array([lon]), np.array([lat]))
    assert abs(E[0] - 651409.903) < 1e-3
    assert abs(N[0] - 313177.270) < 1e-3


def test_tmerc_round_trip_over_fixture_extent():
    import numpy as np

    from hydro_raster_ray.stages.reproject import bng_tmerc

    rng = np.random.default_rng(7)
    E = rng.uniform(300000, 500000, 2000)
    N = rng.uniform(400000, 700000, 2000)
    lon, lat = bng_tmerc.inverse(E, N)
    E2, N2 = bng_tmerc.forward(lon, lat)
    assert np.abs(E2 - E).max() < 1e-5  # metres
    assert np.abs(N2 - N).max() < 1e-5


def test_reproject_tmerc_distributed_matches_witness(ray_session):
    """Distributed warp == whole-array witness, pixel-exact per-tile stats
    (sf0.001 fixture)."""
    import pandas as pd

    from hydro_raster_ray import fixtures
    from hydro_raster_ray.pipelines.tile_queries import q_reproject_tmerc

    d = fixtures.ensure_fixture_dir("sf0.001")
    got = (
        q_reproject_tmerc("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    import pyarrow.parquet as pq

    want = (
        pq.read_table(f"{d}/witness_reproject_tmerc.parquet")
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["image_id", "n_px", "n_valid", "sum_z"]],
        want[["image_id", "n_px", "n_valid", "sum_z"]],
    )


def test_utm_meridional_arc_vs_integral():
    """UTM northing at the central meridian == k0 x the true meridional arc
    (independent check: Simpson integration of the ellipsoid arc integrand,
    not the series)."""
    from hydro_raster_ray.stages.reproject import utm_tmerc

    utm = utm_tmerc(30)
    a, b = utm.a, utm.b
    e2 = (a**2 - b**2) / a**2
    for lat in (12.0, 45.0, 67.5):
        n = 40001
        phi = np.linspace(0.0, np.deg2rad(lat), n)
        f = a * (1 - e2) * (1 - e2 * np.sin(phi) ** 2) ** -1.5
        h = phi[1] - phi[0]
        simpson = h / 3 * (f[0] + f[-1] + 4 * f[1:-1:2].sum() + 2 * f[2:-2:2].sum())
        E, N = utm.forward(utm.lon0, lat)
        assert abs(float(N) - utm.f0 * simpson) < 1e-4, lat


def test_utm_round_trip_across_zone():
    from hydro_raster_ray.stages.reproject import utm_tmerc

    utm = utm_tmerc(30)
    lon, lat = np.meshgrid(np.linspace(-5.9, -0.1, 13), np.linspace(0.5, 70.0, 17))
    E, N = utm.forward(lon.ravel(), lat.ravel())
    lon2, lat2 = utm.inverse(E, N)
    E2, N2 = utm.forward(lon2, lat2)
    assert np.abs(E2 - E).max() < 1e-3
    assert np.abs(N2 - N).max() < 1e-3


def test_utm_offsets_symmetry_and_zones():
    import pytest as _pytest

    from hydro_raster_ray.stages.reproject import utm_tmerc

    utm = utm_tmerc(30)
    # central meridian: easting is exactly the false easting, equator N = 0
    E, N = utm.forward(utm.lon0, 0.0)
    assert float(E) == 500000.0 and float(N) == 0.0
    # southern-hemisphere false northing
    Es, Ns = utm_tmerc(30, south=True).forward(utm.lon0, 0.0)
    assert float(Ns) == 10000000.0
    # antisymmetric easting about the central meridian
    Ep, Np_ = utm.forward(utm.lon0 + 2.0, 40.0)
    Em, Nm = utm.forward(utm.lon0 - 2.0, 40.0)
    np.testing.assert_allclose(float(Ep) - 500000.0, -(float(Em) - 500000.0), rtol=1e-12)
    np.testing.assert_allclose(float(Np_), float(Nm), rtol=1e-12)
    with _pytest.raises(ValueError):
        utm_tmerc(0)


def test_reproject_utm_distributed_matches_witness(ray_session):
    """BNG-metres -> UTM-30N warp (composed TM transforms): distributed ==
    whole-array witness per-tile stats (sf0.001 fixture)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from hydro_raster_ray import fixtures
    from hydro_raster_ray.pipelines.tile_queries import q_reproject_utm

    d = fixtures.ensure_fixture_dir("sf0.001")
    got = (
        q_reproject_utm("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    want = (
        pq.read_table(f"{d}/witness_reproject_utm.parquet")
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["image_id", "n_px", "n_valid", "sum_z"]],
        want[["image_id", "n_px", "n_valid", "sum_z"]],
    )


def test_epsg_registry_families():
    from hydro_raster_ray.stages.reproject import crs_transform, epsg_transform

    # identity for geographic; known code families resolve; others raise
    f, i = epsg_transform(4326)
    assert f(1.5, 52.0) == (1.5, 52.0)
    # TM-family codes only where (-1.5E, 52N) is near their central
    # meridian (the series diverge far from it); conic/stereo codes are
    # closed-form in longitude, so any northern point works
    for code in (3857, 27700, 32630, 32730, 2154, 5070,
                 2157, 29902, 3978, 3946, 3995, 25830):
        f, i = epsg_transform(code)
        x, y = f(np.array([-1.5]), np.array([52.0]))
        lon, lat = i(x, y)
        np.testing.assert_allclose([lon[0], lat[0]], [-1.5, 52.0], atol=1e-6)
    with pytest.raises(ValueError):
        epsg_transform(28992)  # oblique stereographic: unimplemented family


def test_epsg_registry_true_origins():
    """Each registered projection maps its true origin to its false
    origin — a registry-independent pin on the parameter tables (a wrong
    k0/FE/FN/parallel shows up here immediately)."""
    from hydro_raster_ray.stages.reproject import epsg_transform

    cases = {
        2193: ((173.0, 0.0), (1600000.0, 10000000.0)),  # NZTM2000
        2180: ((19.0, 0.0), (500000.0, -5300000.0)),  # Poland CS92
        2157: ((-8.0, 53.5), (600000.0, 750000.0)),  # Irish TM
        29902: ((-8.0, 53.5), (200000.0, 250000.0)),  # Irish Grid
        3946: ((3.0, 46.0), (1700000.0, 5200000.0)),  # RGF93 CC46
        3978: ((-95.0, 49.0), (0.0, 0.0)),  # Canada Atlas Lambert
        3577: ((132.0, 0.0), (0.0, 0.0)),  # GDA94 Australian Albers
        3310: ((-120.0, 0.0), (0.0, -4000000.0)),  # California Albers
        3995: ((10.0, 90.0), (0.0, 0.0)),  # Arctic Polar Stereo (pole)
        3976: ((10.0, -90.0), (0.0, 0.0)),  # NSIDC Sea Ice South (pole)
        25830: ((-3.0, 0.0), (500000.0, 0.0)),  # ETRS89 / UTM 30N
        26910: ((-123.0, 0.0), (500000.0, 0.0)),  # NAD83 / UTM 10N
        26715: ((-93.0, 0.0), (500000.0, 0.0)),  # NAD27 / UTM 15N
    }
    for code, ((lon, lat), (E, N)) in cases.items():
        f, i = epsg_transform(code)
        e, n = f(np.array([lon]), np.array([lat]))
        np.testing.assert_allclose([e[0], n[0]], [E, N], atol=1e-4,
                                   err_msg=f"EPSG:{code}")
        # and the inverse round-trips a nearby grid point
        lo2, la2 = i(np.array([E + 25000.0]), np.array([N + 18000.0]))
        e2, n2 = f(lo2, la2)
        np.testing.assert_allclose(
            [e2[0], n2[0]], [E + 25000.0, N + 18000.0], atol=1e-5,
            err_msg=f"EPSG:{code}",
        )

    # projected->projected composition round-trips through geographic
    from hydro_raster_ray.stages.reproject import crs_transform

    fwd, inv = crs_transform(27700, 32630)
    E = np.linspace(350000.0, 450000.0, 7)
    N = np.linspace(-150000.0, -50000.0, 7)
    E2, N2 = inv(*fwd(E, N))
    np.testing.assert_allclose(E2, E, atol=1e-5)
    np.testing.assert_allclose(N2, N, atol=1e-5)


def test_reproject_epsg_matches_explicit_compose(ray_session, small_scheme):
    """reproject_epsg(27700 -> 32630) must equal the hand-composed warp the
    reproject_utm witness already validates."""
    from hydro_raster_ray.stages.reproject import (
        bng_tmerc,
        compose,
        crs_transform,
        reproject,
        reproject_epsg,
        utm_tmerc,
    )

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    cs = small_scheme.grid.cellsize
    got = to_array(reproject_epsg(ts, 27700, 32630, cs))
    utm = utm_tmerc(30)
    fwd = compose(utm.forward, bng_tmerc.inverse)
    inv = compose(bng_tmerc.forward, utm.inverse)
    ts2 = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    want = to_array(reproject(ts2, fwd, inv, cs, crs="EPSG:32630"))
    np.testing.assert_array_equal(got, want)
