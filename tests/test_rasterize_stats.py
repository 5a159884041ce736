"""Broadcast rasterize join, fused combine, and aggregate operators."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages import stats
from hydro_raster_ray.stages.rasterize import apply_features, rasterize_plane


@pytest.fixture(scope="module")
def tileset(ray_session, small_scheme):
    table = fixtures.tiles_table(small_scheme)
    return from_arrow_tiles(table, small_scheme), small_scheme


def _mosaic(scheme):
    out = np.full(scheme.grid.shape, np.nan)
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            h, w = scheme.tile_shape(tr, tc)
            out[r0 : r0 + h, c0 : c0 + w] = fixtures.tile_truth(scheme, tr, tc)
    return out


def test_rasterize_index_plane_matches_oracle(tileset):
    ts, scheme = tileset
    feats = fixtures.poly_features(scheme)
    want = oracle.rasterize(scheme.grid, feats)
    got = to_array(rasterize_plane(ts, feats))
    np.testing.assert_array_equal(got, want)


def test_rasterize_attribute_plane_matches_oracle(tileset):
    ts, scheme = tileset
    feats = fixtures.rect_zone_features(scheme)
    want = oracle.rasterize(scheme.grid, feats, attribute="adjust_val")
    got = to_array(rasterize_plane(ts, feats, attribute="adjust_val"))
    np.testing.assert_array_equal(got, want)


def test_rasterize_include_nan(tileset):
    ts, scheme = tileset
    feats = fixtures.poly_features(scheme)
    want = oracle.rasterize(scheme.grid, feats, include_nan=True)
    got = to_array(rasterize_plane(ts, feats, include_nan=True))
    np.testing.assert_array_equal(got, want)


def test_rasterize_burn_order_overlap(tileset):
    ts, scheme = tileset
    feats = fixtures.rect_zone_features(scheme)
    plane = to_array(rasterize_plane(ts, feats))
    # features (a)=0 and (d)=3 overlap; in the overlap the later one wins
    za = np.asarray(feats[0]["rings"][0])
    zd = np.asarray(feats[3]["rings"][0])
    x0 = max(za[:, 0].min(), zd[:, 0].min())
    x1 = min(za[:, 0].max(), zd[:, 0].max())
    y0 = max(za[:, 1].min(), zd[:, 1].min())
    y1 = min(za[:, 1].max(), zd[:, 1].max())
    assert x0 < x1 and y0 < y1, "fixture zones (a) and (d) must overlap"
    from hydro_raster_ray.grid import map2sub

    r, c = map2sub(np.array([(x0 + x1) / 2]), np.array([(y0 + y1) / 2]), scheme.grid)
    assert plane[r[0], c[0]] == 3.0


def test_apply_features_edit_dem(tileset):
    """Tutorial cells 8/12: boolean-mask edit of the DEM via the fused op."""
    ts, scheme = tileset
    feats = fixtures.rect_zone_features(scheme)
    mosaic = _mosaic(scheme)
    plane = oracle.rasterize(scheme.grid, feats, attribute="adjust_val")
    want = mosaic.copy()
    m = ~np.isnan(plane)
    want[m] = want[m] + plane[m]
    # storage contract: edited tiles round to float32 precision on encode
    want = want.astype(np.float32).astype(np.float64)
    got = to_array(
        apply_features(
            ts,
            feats,
            lambda arr, pl, info: np.where(np.isnan(pl), arr, arr + pl),
            attribute="adjust_val",
        )
    )
    np.testing.assert_array_equal(got, want)


def test_global_stats(tileset):
    ts, scheme = tileset
    mosaic = _mosaic(scheme)
    st = stats.global_stats(ts)
    assert st["n_cells"] == mosaic.size
    assert st["n_valid"] == int(np.isfinite(mosaic).sum())
    assert st["min"] == np.nanmin(mosaic)
    assert st["max"] == np.nanmax(mosaic)
    np.testing.assert_allclose(st["sum"], np.nansum(mosaic), rtol=1e-12)
    np.testing.assert_allclose(st["mean"], np.nanmean(mosaic), rtol=1e-12)


def test_summary(tileset):
    ts, scheme = tileset
    s = stats.summary(ts)
    assert s["ncols"] == scheme.grid.ncols and s["crs"] == "EPSG:27700"
    assert s["num_valid_cells"] > 0


def test_exact_median(tileset):
    ts, scheme = tileset
    mosaic = _mosaic(scheme)
    got = stats.exact_median(ts)
    assert got == np.nanmedian(mosaic)


def test_exact_median_small_leaf(tileset):
    ts, scheme = tileset
    mosaic = _mosaic(scheme)
    got = stats.exact_median(ts, bins=8, leaf_size=50)
    assert got == np.nanmedian(mosaic)


def test_zonal_stats_matches_oracle(tileset):
    ts, scheme = tileset
    feats = fixtures.rect_zone_features(scheme)
    mosaic = _mosaic(scheme)
    plane = oracle.rasterize(scheme.grid, feats, attribute="id")
    want = oracle.zonal_stats(mosaic, plane)
    got = stats.zonal_stats(ts, feats, attribute="id").to_pandas()
    got = got.set_index("zone").sort_index()
    assert set(got.index) == set(want)
    for zone, w in want.items():
        row = got.loc[zone]
        assert int(row["n"]) == w["n"]
        np.testing.assert_allclose(row["sum_z"], w["sum"], rtol=1e-12)
        assert row["min_z"] == w["min"] and row["max_z"] == w["max"]
        np.testing.assert_allclose(row["mean_z"], w["mean"], rtol=1e-12)


def test_zonal_majority_matches_brute_force(tileset):
    """Modal class per zone vs a whole-array numpy recount; ties must
    break to the smallest bin."""
    from collections import Counter

    ts, scheme = tileset
    feats = fixtures.rect_zone_features(scheme)
    mosaic = _mosaic(scheme).astype(np.float32).astype(np.float64)
    plane = oracle.rasterize(scheme.grid, feats, attribute="id")
    got = (
        stats.zonal_majority(ts, feats, fixtures.CLASSIFY_BREAKS,
                             attribute="id")
        .to_pandas()
        .set_index("zone")
        .sort_index()
    )
    m = np.isfinite(mosaic) & np.isfinite(plane)
    bins = np.digitize(mosaic, list(fixtures.CLASSIFY_BREAKS))
    zones = set(plane[m].tolist())
    assert set(got.index) == zones
    for zone in zones:
        zm = m & (plane == zone)
        cnt = Counter(bins[zm].tolist())
        best = min(cnt, key=lambda b: (-cnt[b], b))  # tie -> smallest bin
        row = got.loc[zone]
        assert int(row["maj_bin"]) == best
        assert int(row["n_maj"]) == cnt[best]
        assert int(row["n_total"]) == int(zm.sum())


def test_classify_matches_oracle(tileset):
    ts, scheme = tileset
    mosaic = _mosaic(scheme)
    want = oracle.classify(mosaic, list(fixtures.CLASSIFY_BREAKS))
    got = to_array(stats.classify(ts, fixtures.CLASSIFY_BREAKS))
    np.testing.assert_array_equal(got, want)


def _disc_rank(vals: np.ndarray, p: float) -> float:
    """DuckDB quantile_disc: the element at 1-based rank ceil(p*n)."""
    v = np.sort(vals[np.isfinite(vals)])
    k = min(max(int(np.ceil(p * v.size)) - 1, 0), v.size - 1)
    return float(v[k])


def test_exact_quantiles(tileset):
    ts, scheme = tileset
    mosaic = _mosaic(scheme).astype(np.float32).astype(np.float64)
    got = stats.exact_quantiles(ts, ps=(0.1, 0.5, 0.9))
    for p in (0.1, 0.5, 0.9):
        assert got[p] == _disc_rank(mosaic.ravel(), p), p


def test_exact_quantiles_forced_refinement(tileset):
    """Tiny bins + leaf force several multi-interval refinement levels
    (including the ties early-exit path) and divergent per-quantile
    descent; extreme quantiles hit the clamp arithmetic."""
    ts, scheme = tileset
    mosaic = _mosaic(scheme).astype(np.float32).astype(np.float64)
    ps = (0.001, 0.25, 0.75, 0.999)
    got = stats.exact_quantiles(ts, ps=ps, bins=4, leaf_size=40)
    for p in ps:
        assert got[p] == _disc_rank(mosaic.ravel(), p), p


def test_exact_quantiles_duckdb_parity(tileset):
    """Pin the rank convention against DuckDB itself (quantile_disc over
    the same finite values) rather than a re-derivation."""
    import duckdb

    ts, scheme = tileset
    mosaic = _mosaic(scheme).astype(np.float32).astype(np.float64)
    v = mosaic.ravel()
    v = v[np.isfinite(v)]
    got = stats.exact_quantiles(ts, ps=(0.1, 0.5, 0.9), bins=16, leaf_size=100)
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"z": v}))
    want = con.execute(
        "SELECT quantile_disc(z,0.1), quantile_disc(z,0.5), quantile_disc(z,0.9) FROM t"
    ).fetchone()
    assert (got[0.1], got[0.5], got[0.9]) == want


def test_zonal_crosstab_sums_match_majority(ray_session, small_scheme):
    """The crosstab is the table the majority argmaxes over: per zone,
    sum(n) == n_total and max row == (maj_bin, n_maj)."""
    from hydro_raster_ray import fixtures
    from hydro_raster_ray.sources import from_arrow_tiles
    from hydro_raster_ray.stages.stats import zonal_crosstab, zonal_majority

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    feats = fixtures.rect_zone_features(small_scheme)
    ct = zonal_crosstab(
        ts, feats, fixtures.CLASSIFY_BREAKS, attribute="id").to_pandas()
    mj = zonal_majority(
        ts, feats, fixtures.CLASSIFY_BREAKS, attribute="id").to_pandas()
    for _, row in mj.iterrows():
        z = ct[ct["zone"] == int(row["zone"])]
        assert z["n"].sum() == row["n_total"]
        best = z.sort_values(["n", "bin"],
                             ascending=[False, True]).iloc[0]
        assert best["bin"] == row["maj_bin"]
        assert best["n"] == row["n_maj"]
