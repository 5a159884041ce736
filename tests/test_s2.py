"""S2 cell-id index: structural invariants + scalar-witness parity.

The tables are public spec constants, so correctness is gated on properties
that would break under any transcription or vectorization error:
  * the level-k curve is a true Hilbert curve (consecutive positions are
    4-adjacent cells) on every face,
  * ij→pos and pos→ij are inverse per orientation,
  * leaf round-trips (encode → center → encode) are exact,
  * parents contain their children as id ranges,
  * the vectorized pipeline bit-matches the independent scalar walk.
"""

from __future__ import annotations

import numpy as np
import pytest

from hydro_raster_ray import s2


def test_tables_are_inverse_pairs():
    for orient in range(4):
        for pos in range(4):
            ij = s2._POS_TO_IJ[orient][pos]
            assert s2._IJ_TO_POS[orient][ij] == pos


@pytest.mark.parametrize("face", range(6))
def test_hilbert_continuity_per_face(face):
    """Consecutive curve positions at level 6 are edge-adjacent cells."""
    level = 6
    n = 1 << level
    # all level-6 cells on this face in curve order: take each cell's first
    # leaf (pos << remaining bits), decode to leaf ij, shift down to level ij
    pos = np.arange(n * n, dtype=np.uint64) << np.uint64(2 * (s2.MAX_LEVEL - level))
    ids = (
        (np.uint64(face) << np.uint64(61)) | (pos << np.uint64(1)) | np.uint64(1)
    )
    _, i, j = s2.id_to_face_ij(ids)
    ci = (i >> np.uint64(s2.MAX_LEVEL - level)).astype(np.int64)
    cj = (j >> np.uint64(s2.MAX_LEVEL - level)).astype(np.int64)
    # every cell visited exactly once
    assert len(set(zip(ci.tolist(), cj.tolist()))) == n * n
    # consecutive cells differ by exactly 1 in exactly one coordinate
    d = np.abs(np.diff(ci)) + np.abs(np.diff(cj))
    assert np.all(d == 1)


def test_leaf_roundtrip_exact():
    rng = np.random.default_rng(7)
    lng = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-90, 90, 5000)
    ids = s2.lnglat_to_leaf(lng, lat)
    clng, clat = s2.leaf_to_lnglat(ids)
    ids2 = s2.lnglat_to_leaf(clng, clat)
    np.testing.assert_array_equal(ids, ids2)
    # centers are close to the original points (leaf ≈ 1cm at the equator,
    # so allow generous slack for the cube-face distortion)
    assert np.max(np.abs(clat - lat)) < 1e-6


def test_scalar_witness_parity():
    rng = np.random.default_rng(11)
    lng = rng.uniform(-180, 180, 400)
    lat = rng.uniform(-90, 90, 400)
    vec = s2.lnglat_to_leaf(lng, lat)
    ref = np.array([s2.leaf_scalar(a, b) for a, b in zip(lng, lat)], dtype=np.uint64)
    np.testing.assert_array_equal(vec, ref)
    # include face-boundary / pole / antimeridian probes
    edges = [(0.0, 0.0), (45.0, 35.26), (-180.0, 0.0), (180.0, 0.0),
             (0.0, 90.0), (0.0, -90.0), (90.0, 0.0), (-45.0, -35.26)]
    for lg, lt in edges:
        assert int(s2.lnglat_to_leaf([lg], [lt])[0]) == s2.leaf_scalar(lg, lt)


def test_face_centers_and_levels():
    # the center of each face maps to i = j = 2^29 on that face
    centers = [(0, 0), (90, 0), (0, 90), (180, 0), (-90, 0), (0, -90)]
    for f, (lg, lt) in enumerate(centers):
        ids = s2.lnglat_to_leaf([lg], [lt])
        face, i, j = s2.id_to_face_ij(ids)
        assert int(face[0]) == f
        # cos(90°) is 6e-17 in floats, so exact face centers can land one
        # leaf off the midline — allow ±1 leaf
        assert abs(int(i[0]) - (1 << 29)) <= 1 and abs(int(j[0]) - (1 << 29)) <= 1
        assert int(s2.level_of(ids)[0]) == s2.MAX_LEVEL
        # level-0 ancestor is the bare face cell
        assert int(s2.parent(ids, 0)[0]) == (f << 61) | (1 << 60)


def test_parent_contains_child():
    rng = np.random.default_rng(3)
    lng = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    leaf = s2.lnglat_to_leaf(lng, lat)
    for level in (2, 8, 12, 20, 29):
        par = s2.parent(leaf, level)
        assert np.all(s2.level_of(par) == level)
        lsb = np.uint64(1 << (2 * (s2.MAX_LEVEL - level)))
        lo, hi = par - (lsb - np.uint64(1)), par + (lsb - np.uint64(1))
        assert np.all((leaf >= lo) & (leaf <= hi))
        # parent is monotone in level: parent(parent(x, 12), 8) == parent(x, 8)
    p12 = s2.parent(leaf, 12)
    np.testing.assert_array_equal(s2.parent(p12, 8), s2.parent(leaf, 8))


def test_prefix_locality():
    """Nearby points share the level-10 ancestor; antipodal points do not."""
    base_lng, base_lat = -1.5, 52.0
    near = s2.lnglat_to_leaf([base_lng + 1e-5], [base_lat + 1e-5])
    here = s2.lnglat_to_leaf([base_lng], [base_lat])
    far = s2.lnglat_to_leaf([base_lng + 140.0], [-base_lat])
    assert int(s2.parent(here, 10)[0]) == int(s2.parent(near, 10)[0])
    assert int(s2.parent(here, 1)[0]) != int(s2.parent(far, 1)[0])


def test_token_roundtrip():
    rng = np.random.default_rng(5)
    ids = s2.lnglat_to_leaf(rng.uniform(-180, 180, 64), rng.uniform(-90, 90, 64))
    for level in (0, 7, 16, s2.MAX_LEVEL):
        cells = s2.parent(ids, level)
        toks = s2.token(cells)
        back = np.array([s2.token_to_id(t) for t in toks], dtype=np.uint64)
        np.testing.assert_array_equal(back, cells)
        assert all(not t.endswith("0") for t in toks)


def test_s2_gauge_join_partitions_every_gauge(ray_session):
    """The S2-bucketed spatial join is a partition of the gauge set:
    tiles tile the grid and every Halton gauge lies strictly inside it,
    so per-tile counts must sum to exactly the gauge-table size and the
    per-tile counts must match a direct geometric assignment."""
    import duckdb

    from hydro_raster_ray import fixtures
    from hydro_raster_ray.pipelines.tile_queries import q_s2_gauge_join

    sf = "/root/testdata/sf0.001"
    got = q_s2_gauge_join(sf).to_pandas().sort_values("image_id")
    d = fixtures.ensure_fixture_dir("sf0.001")
    n_gauges = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{d}/gauges_large.parquet')"
    ).fetchone()[0]
    assert got["n_gauges"].sum() == n_gauges
    want = duckdb.sql(f"""
        WITH ext AS (
          SELECT tile_id, min(x) - 2.5 xmin, max(x) + 2.5 xmax,
                 min(y) - 2.5 ymin, max(y) + 2.5 ymax
          FROM read_parquet('{d}/pixels.parquet') GROUP BY tile_id)
        SELECT e.tile_id image_id, count(*) n_gauges
        FROM ext e JOIN read_parquet('{d}/gauges_large.parquet') g
          ON g.x >= e.xmin AND g.x < e.xmax AND g.y >= e.ymin AND g.y < e.ymax
        GROUP BY e.tile_id ORDER BY e.tile_id
    """).df()
    assert list(got["image_id"]) == list(want["image_id"])
    assert list(got["n_gauges"]) == list(want["n_gauges"])


def test_s2_gauge_join_large_tiles_complete(ray_session):
    """Tiles LARGER than the level-14 cell edge (the bench geometry that
    exposed the unpadded-lattice under-cover): every gauge must still
    land in exactly one tile — completeness of the padded adaptive
    lattice, not just the small-tile case the sf fixtures exercise."""
    import ray.data

    from hydro_raster_ray import fixtures
    from hydro_raster_ray.sources import from_arrow_tiles
    from hydro_raster_ray.stages.spatial_join import s2_gauge_join

    scheme = fixtures.make_scheme(4, 4, tile_h=256, tile_w=256, ragged=False)
    ts = from_arrow_tiles(fixtures.tiles_table(scheme), scheme)
    n = 20_000
    gauges = ray.data.from_arrow(fixtures.gauges_large_table(scheme, n))
    got = s2_gauge_join(ts, gauges).to_pandas()
    assert got["n_gauges"].sum() == n
    assert len(got) == 16  # every tile holds gauges (Halton is space-filling)


def test_s2_gauge_join_paths_identical(ray_session):
    """The broadcast probe path (default under budget) and the
    Dataset.join path (broadcast_budget=0) must produce identical rows —
    same candidate set by construction (one level-14 cell per gauge,
    per-tile-deduped cell rows), same bbox predicate."""
    import pandas as pd
    import ray.data

    from hydro_raster_ray import fixtures
    from hydro_raster_ray.sources import from_arrow_tiles
    from hydro_raster_ray.stages.spatial_join import s2_gauge_join

    scheme = fixtures.make_scheme(4, 4, tile_h=64, tile_w=64, ragged=True)
    ts = from_arrow_tiles(fixtures.tiles_table(scheme), scheme)
    gauges = ray.data.from_arrow(fixtures.gauges_large_table(scheme, 5000))
    a = (
        s2_gauge_join(ts, gauges)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    b = (
        s2_gauge_join(ts, gauges, broadcast_budget=0)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)[a.columns]
    )
    assert a["n_gauges"].sum() == 5000
    pd.testing.assert_frame_equal(a, b)


def test_haversine_nn_matches_scalar_reference(ray_session):
    """q_haversine_nn vs an independent scalar ``math``-module brute
    force over the same gauge fixture (equator anchor: 1 degree of
    longitude at lat 0 is 6371*pi/180 = 111.195 km — the derived lat/lon
    here are small, so distances land in that regime)."""
    import math

    import pyarrow.parquet as pq

    from hydro_raster_ray import fixtures
    from hydro_raster_ray.pipelines.tile_queries import q_haversine_nn

    got = q_haversine_nn("sf0.001").to_pandas()
    fdir = fixtures.ensure_fixture_dir("sf0.001")
    g = pq.read_table(fdir + "/gauges.parquet").to_pandas()
    lat = ((g["y"] - 556000.0) / 5000.0).tolist()
    lon = ((g["x"] - 340000.0) / 3000.0).tolist()
    ids = g["gauge_id"].tolist()

    def hav(i, j):
        p1, p2 = lat[i] * math.pi / 180, lat[j] * math.pi / 180
        dp = (lat[j] - lat[i]) * math.pi / 180
        dl = (lon[j] - lon[i]) * math.pi / 180
        h = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * \
            math.sin(dl / 2) ** 2
        return 2 * 6371.0 * math.asin(math.sqrt(h))

    assert len(got) == len(ids)
    for _, row in got.iterrows():
        i = ids.index(row["gauge_id"])
        best = min(
            (hav(i, j), ids[j]) for j in range(len(ids)) if j != i)
        assert row["nn_id"] == best[1]
        assert abs(row["dist_km"] - round(best[0], 6)) < 1e-9
