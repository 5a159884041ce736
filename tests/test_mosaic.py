"""Mosaic scatter/gather shuffles vs the single-process oracle."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.grid import GridSpec
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages import mosaic


def _truth_array(scheme):
    out = np.full(scheme.grid.shape, np.nan)
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            h, w = scheme.tile_shape(tr, tc)
            out[r0 : r0 + h, c0 : c0 + w] = fixtures.tile_truth(scheme, tr, tc)
    return out


@pytest.fixture(scope="module")
def mosaic_inputs(ray_session):
    schemes = fixtures.mosaic_schemes()
    tsets = [from_arrow_tiles(fixtures.tiles_table(s), s) for s in schemes]
    arrays = [_truth_array(s) for s in schemes]
    return schemes, tsets, arrays


def test_combine_mosaic_matches_reference_block_paste(mosaic_inputs):
    schemes, tsets, arrays = mosaic_inputs
    got_ts = mosaic.combine_mosaic(tsets)
    got = to_array(got_ts)
    # oracle: union canvas + sequential whole-block paste incl. NaN
    # (spatial_analysis.py:278-295)
    union = got_ts.grid
    want = np.full(union.shape, np.nan)
    from hydro_raster_ray.grid import map2sub

    for s, a in zip(schemes, arrays):
        ext = s.grid.extent
        x0 = ext[0] + s.grid.cellsize / 2
        y0 = ext[3] - s.grid.cellsize / 2
        r0, c0 = map2sub(np.array([x0]), np.array([y0]), union)
        want[r0[0] : r0[0] + s.grid.nrows, c0[0] : c0[0] + s.grid.ncols] = a
    np.testing.assert_array_equal(got, want)
    # union header matches the reference's int() dims
    assert union.ncols == int((union.extent[1] - union.extent[0]) / 5.0)


def test_merge_into_matches_oracle(mosaic_inputs):
    schemes, tsets, arrays = mosaic_inputs
    # merge input 1 (origin) into input 0 (target) — overlap overwrite
    want = oracle.merge(arrays[1], schemes[1].grid, arrays[0], schemes[0].grid)
    got_ts = mosaic.merge_into([tsets[1]], tsets[0])
    assert got_ts.grid == schemes[0].grid
    np.testing.assert_array_equal(to_array(got_ts), want)


def test_merge_nan_skip(mosaic_inputs):
    schemes, tsets, arrays = mosaic_inputs
    # origin NaN holes must NOT punch holes in the target (Raster.py:889-892)
    got = to_array(mosaic.merge_into([tsets[2]], tsets[0]))
    origin_nan_in_target = np.zeros_like(arrays[0], dtype=bool)
    want = oracle.merge(arrays[2], schemes[2].grid, arrays[0], schemes[0].grid)
    overlap = ~np.isnan(arrays[0]) & np.isnan(want)
    assert not overlap.any()
    np.testing.assert_array_equal(got, want)


def test_paste_on_quirk(mosaic_inputs):
    schemes, tsets, arrays = mosaic_inputs
    want = oracle.paste_on(arrays[2], schemes[2].grid, arrays[0], schemes[0].grid)
    got = to_array(mosaic.paste_on(tsets[2], tsets[0]))
    np.testing.assert_array_equal(got, want)


def test_grid_resample_nearest_matches_oracle(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    a = _truth_array(small_scheme)
    for newsize in (10.0, 2.0, 7.5):
        want, want_spec = oracle.grid_resample_nearest(a, small_scheme.grid, newsize)
        got_ts = mosaic.grid_resample_nearest(ts, newsize)
        assert got_ts.grid == want_spec
        np.testing.assert_array_equal(to_array(got_ts), want)


def test_assign_to_matches_oracle(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    a = _truth_array(small_scheme)
    g = small_scheme.grid
    # coarser grid, offset, extending past the source on two sides → clamp
    new_spec = GridSpec(
        ncols=40,
        nrows=36,
        xllcorner=g.xllcorner - 60.0,
        yllcorner=g.yllcorner + 100.0,
        cellsize=37.0,
        nodata=g.nodata,
    )
    want = oracle.assign_to(a, g, new_spec)
    got_ts = mosaic.assign_to(ts, new_spec)
    assert got_ts.grid == new_spec
    np.testing.assert_array_equal(to_array(got_ts), want)


def test_dedup_exact(ray_session, small_scheme):
    table = fixtures.tiles_table(small_scheme, dup_mod=7)
    ts = from_arrow_tiles(table, small_scheme, validate=False)
    deduped = mosaic.dedup_exact(ts)
    phashes = table["phash"].to_pylist()
    ids = table["image_id"].to_pylist()
    want_keep = {}
    for pid, img in zip(phashes, ids):
        want_keep[pid] = min(want_keep.get(pid, img), img)
    got = {
        r["phash"]: r["image_id"]
        for r in deduped.ds.select_columns(["phash", "image_id"]).take_all()
    }
    assert got == want_keep
    assert deduped.ds.count() == len(set(phashes)) < len(phashes)


def test_top_k_tiles(ray_session, small_scheme):
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    got = mosaic.top_k_tiles(ts, 3, stat="max").take_all()
    per_tile = {}
    for tr in range(small_scheme.n_tile_rows):
        for tc in range(small_scheme.n_tile_cols):
            z = fixtures.tile_truth(small_scheme, tr, tc)
            per_tile[fixtures.tile_id(tr, tc) if hasattr(fixtures, "tile_id") else f"t{tr:04d}_{tc:04d}"] = np.nanmax(z)
    want = sorted(per_tile.items(), key=lambda kv: -kv[1])[:3]
    assert [r["image_id"] for r in got] == [k for k, _ in want]
    np.testing.assert_allclose([r["stat"] for r in got], [v for _, v in want])


def test_intersect_except_tiles(ray_session, small_scheme):
    table = fixtures.tiles_table(small_scheme)
    ts_all = from_arrow_tiles(table, small_scheme)
    # window clip keeps a strict subset of tiles
    from hydro_raster_ray.stages.clip import filter_tiles_rc

    subset = filter_tiles_rc(ts_all, 0, 100, 0, 100)
    n_sub = subset.ds.count()
    assert 0 < n_sub < small_scheme.n_tiles
    inter = mosaic.intersect_tiles(ts_all, subset)
    assert sorted(r["image_id"] for r in inter.ds.select_columns(["image_id"]).take_all()) == sorted(
        r["image_id"] for r in subset.ds.select_columns(["image_id"]).take_all()
    )
    exc = mosaic.except_tiles(ts_all, subset)
    assert exc.ds.count() == small_scheme.n_tiles - n_sub
    # disjoint union restores the full set
    assert inter.ds.count() + exc.ds.count() == small_scheme.n_tiles


def test_phash_near_dups_hand_cases(ray_session, tmp_path):
    """Hamming-LSH image near-dups: ≤3-bit perturbations group with their
    base (pigeonhole guarantees a shared band), far rows stay out, exact
    dups group, group_id is the min image_id string, t>3 rejected."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from hydro_raster_ray.stages.mosaic import phash_near_dups

    base = 0x123456789ABCDEF0
    rows = {
        "a0": base,
        "a1": base ^ 0b11,                 # 2 flips in band 0 → groups
        "a2": base,                        # exact dup → groups
        "b0": base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)),
        # ^ 4 flips, one per band: no shared band AND d=4 > 3 → isolated
        "c0": 0x0F0F0F0F0F0F0F0F,          # unrelated
    }
    p = os.path.join(tmp_path, "t.parquet")
    pq.write_table(
        pa.table(
            {
                "image_id": pa.array(list(rows), pa.string()),
                "phash": pa.array(
                    [v - (1 << 64) if v >= (1 << 63) else v for v in rows.values()],
                    pa.int64(),
                ),
            }
        ),
        p,
    )
    ds = ray.data.read_parquet(p)
    got = phash_near_dups(ds).to_pandas().sort_values("image_id")
    assert list(got["image_id"]) == ["a0", "a1", "a2"]
    assert set(got["group_id"]) == {"a0"}
    import pytest as _pt

    with _pt.raises(ValueError, match="pigeonhole"):
        phash_near_dups(ds, t=4)


def test_pack_shards_contiguity(ray_session, small_scheme):
    """Shard spans tile the byte stream exactly: spans are contiguous in
    image_id order, cover sum(n_bytes) bytes, and straddling tiles span
    ceil over the boundary."""
    from hydro_raster_ray import fixtures
    from hydro_raster_ray.sources import from_arrow_tiles
    from hydro_raster_ray.stages.mosaic import pack_shards

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    S = 10_000
    got = (
        pack_shards(ts, shard_bytes=S)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    start = 0
    for _, r in got.iterrows():
        assert r["first_shard"] == start // S
        assert r["last_shard"] == (start + r["n_bytes"] - 1) // S
        assert r["n_shards"] == r["last_shard"] - r["first_shard"] + 1
        start += int(r["n_bytes"])
    assert got["last_shard"].iloc[-1] == (start - 1) // S


def test_pack_shards_numeric_order_past_4_digits(ray_session):
    """Past 9999 tile rows, %04d widens and lexicographic image_id order
    diverges from row-major ('t10000_…' < 't9999_…' as strings): the
    layout must follow numeric (tile_row, tile_col), and the meta parse
    must accept the wider ids."""
    import pyarrow as pa

    from hydro_raster_ray import codecs, fixtures
    from hydro_raster_ray.sources import from_arrow_tiles
    from hydro_raster_ray.stages.mosaic import pack_shards

    scheme = fixtures.make_scheme(10001, 1, tile_h=4, tile_w=4, ragged=False)
    payload = codecs.encode(np.arange(16, dtype=np.float64).reshape(4, 4),
                            "raw-f32")
    t = pa.table(
        {
            "image_id": pa.array(["t9999_0000", "t10000_0000"]),
            "bytes": pa.array([payload, payload], pa.binary()),
            "w": pa.array([4, 4], pa.int32()),
            "h": pa.array([4, 4], pa.int32()),
            "fmt": pa.array(["raw-f32", "raw-f32"]),
            "caption": pa.array(["a", "b"]),
            "phash": pa.array([0, 0], pa.int64()),
        }
    )
    ts = from_arrow_tiles(t, scheme)
    nb = len(payload)
    got = pack_shards(ts, shard_bytes=nb).to_pandas().set_index("image_id")
    assert got.loc["t9999_0000", "first_shard"] == 0  # numeric order wins
    assert got.loc["t10000_0000", "first_shard"] == 1


def test_phash_near_dups_no_dups_is_empty(ray_session, tmp_path):
    """All phashes pairwise far apart in every band → zero edges → empty
    result (exercises the empty-CC path end to end)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from hydro_raster_ray.stages.mosaic import phash_near_dups

    vals = [0x0000000000000000, 0x1111111111111111, 0x2222222222222222]
    p = os.path.join(tmp_path, "t.parquet")
    pq.write_table(
        pa.table({
            "image_id": pa.array([f"x{i}" for i in range(3)], pa.string()),
            "phash": pa.array(vals, pa.int64()),
        }),
        p,
    )
    out = phash_near_dups(ray.data.read_parquet(p)).to_pandas()
    assert len(out) == 0
