"""Resumable bucket-partitioned write + lineage manifests (kill/resume)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from hydro_raster_ray import fixtures
from hydro_raster_ray.sources import from_arrow_tiles, read_tiles
from hydro_raster_ray.state.lineage import (
    bucket_of,
    completed_buckets,
    read_manifests,
    resumable_write,
)


@pytest.fixture()
def tileset(ray_session, small_scheme, tmp_path):
    return from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)


def _read_back(out_dir):
    import glob

    parts = sorted(glob.glob(f"{out_dir}/cell_bucket=*/part-*.parquet"))
    import pyarrow as pa

    return pa.concat_tables([pq.read_table(p) for p in parts])


def test_write_and_manifests(tileset, small_scheme, tmp_path):
    out = str(tmp_path / "out")
    res = resumable_write(tileset, out)
    assert res["skipped_buckets"] == 0 and res["rows_written"] == 16
    ms = read_manifests(out)
    assert sum(m["rows"] for m in ms) == 16
    assert all(m["complete"] for m in ms)
    # bucket ids match the Morton-shift of each tile's cell
    got = _read_back(out)
    assert got.num_rows == 16
    assert sorted(got["image_id"].to_pylist()) == sorted(
        fixtures.tiles_table(small_scheme)["image_id"].to_pylist()
    )


def test_resume_skips_completed(tileset, small_scheme, tmp_path):
    out = str(tmp_path / "out")
    # simulate a killed run: write only the tiles of bucket 0 (partial run)
    import pyarrow as pa

    table = fixtures.tiles_table(small_scheme)
    ts_all = tileset

    # first full write to learn the bucket of each tile
    probe = str(tmp_path / "probe")
    resumable_write(ts_all, probe)
    all_buckets = completed_buckets(probe)
    some_bucket = sorted(all_buckets)[0]

    # partial run: only tiles of `some_bucket`
    from hydro_raster_ray.grid import morton_encode, parse_tile_id

    keep_rows = []
    for i in range(table.num_rows):
        tr, tc = parse_tile_id(table["image_id"][i].as_py())
        if int(bucket_of(np.array([morton_encode(tr, tc)]))[0]) == some_bucket:
            keep_rows.append(i)
    partial = table.take(keep_rows)
    ts_partial = from_arrow_tiles(partial, small_scheme)
    r1 = resumable_write(ts_partial, out)
    assert r1["written_buckets"] == 1
    assert completed_buckets(out) == {some_bucket}

    # resume with the FULL input: completed bucket must be skipped
    r2 = resumable_write(ts_all, out)
    assert r2["skipped_buckets"] == 1
    assert r2["rows_written"] == 16 - len(keep_rows)
    assert completed_buckets(out) == all_buckets
    got = _read_back(out)
    assert got.num_rows == 16  # no duplicates, full coverage


def test_resume_noop_when_all_complete(tileset, tmp_path):
    out = str(tmp_path / "out")
    resumable_write(tileset, out)
    r = resumable_write(tileset, out)
    assert r["rows_written"] == 0 and r["written_buckets"] == 0
    assert _read_back(out).num_rows == 16


def test_roundtrip_via_read_tiles(tileset, small_scheme, tmp_path):
    out = str(tmp_path / "out")
    resumable_write(tileset, out)
    import glob

    parts = sorted(glob.glob(f"{out}/cell_bucket=*/part-*.parquet"))
    ts2 = read_tiles(parts, small_scheme)
    from hydro_raster_ray.sources import to_array

    a1 = to_array(tileset)
    a2 = to_array(ts2)
    np.testing.assert_array_equal(a1, a2)


def test_shuffle_resume_prunes_exchange(tileset, small_scheme, tmp_path):
    """North-rule resume across a SHUFFLE boundary (EP2 mosaic shape):
    fragments aimed at completed output buckets are dropped before the
    repartition, the resumed run recomputes only the missing buckets, and
    the final bytes equal a clean run's."""
    from hydro_raster_ray import fixtures as fx
    from hydro_raster_ray.sources import from_arrow_tiles
    from hydro_raster_ray.stages import mosaic

    # half-tile-offset target (the EP2 shape: every source tile scatters to
    # up to 4 target tiles — a genuine all-to-all)
    target = fx.make_scheme(
        4, 4, ragged=False,
        xll=fx.XLL + 32 * fx.CELLSIZE, yll=fx.YLL + 32 * fx.CELLSIZE,
    )

    # clean run → ground truth bytes + manifests
    clean = str(tmp_path / "clean")
    merged = mosaic.merge_into([tileset], target)
    resumable_write(merged, clean, level=1)
    want = _read_back(clean)
    all_buckets = completed_buckets(clean)
    assert len(all_buckets) >= 2

    # simulate a killed run: only ONE bucket's manifest is complete
    out = str(tmp_path / "resumed")
    done_bucket = sorted(all_buckets)[0]
    from hydro_raster_ray.grid import morton_encode, parse_tile_id

    want_cells = [
        morton_encode(*parse_tile_id(i)) for i in want["image_id"].to_pylist()
    ]
    done_rows = [
        i for i, c in enumerate(want_cells)
        if int(bucket_of(np.array([c]), level=1)[0]) == done_bucket
    ]
    partial_ts = from_arrow_tiles(want.take(done_rows), target)
    r1 = resumable_write(partial_ts, out, level=1)
    assert r1["written_buckets"] == 1
    assert completed_buckets(out) == {done_bucket}

    # resume: the merge itself prunes fragments of the completed bucket —
    # the built Dataset must not contain ANY tile of that bucket
    resumed = mosaic.merge_into(
        [tileset], target, resume_out_dir=out, resume_level=1
    )
    built_cells = np.asarray(
        resumed.ds.select_columns(["cell"]).to_pandas()["cell"]
    )
    assert not np.isin(bucket_of(built_cells, level=1), [done_bucket]).any()
    assert built_cells.size == want.num_rows - len(done_rows)

    r2 = resumable_write(resumed, out, level=1)
    assert r2["skipped_buckets"] == 1
    assert completed_buckets(out) == all_buckets

    # resumed bytes == clean-run bytes (determinism gate)
    got = _read_back(out)
    key = lambda t: sorted(zip(t["image_id"].to_pylist(), t["phash"].to_pylist()))
    assert key(got) == key(want)
