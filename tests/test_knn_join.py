"""Partitioned (no-broadcast) exact kNN-IDW join vs the whole-array witness.

Three independent implementations are cross-checked:
  * brute force (argsort ALL gauges per pixel) — ground truth;
  * ``oracle.knn_idw_canonical`` — y-sorted band search (the DuckDB-side
    witness generator);
  * ``stages.knn_join.knn_idw_partitioned`` — the distributed
    bucket-replication pipeline (x-sorted window search per cell).
All three must agree BIT-exactly under the canonical gauge-id-order
summation contract (fixtures use Halton points — no distance ties).
"""

import numpy as np
import pytest
import ray.data

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.knn_join import knn_idw_partitioned


def _brute_canonical(spec, gx, gy, gv, gid, k=8, power=2.0, eps=1e-12):
    """Ground truth: full argsort per pixel, then the shared canonical
    gid-ordered IDW arithmetic."""
    X, Y = oracle._to_points(spec)
    px, py = X.ravel(), Y.ravel()
    out = np.empty(px.size)
    k_eff = min(k, gx.size)
    for i in range(px.size):
        d2 = (px[i] - gx) ** 2 + (py[i] - gy) ** 2
        sel = np.argsort(d2, kind="stable")[:k_eff]
        sel = sel[np.argsort(gid[sel], kind="stable")]
        d2s = d2[sel]
        w = 1.0 / np.power(np.maximum(d2s, eps), power * 0.5)
        out[i] = (w * gv[sel]).sum() / w.sum()
        j = int(np.argmin(d2s))
        if d2s[j] <= eps:
            out[i] = gv[sel][j]
    return out.reshape(spec.nrows, spec.ncols)


def _f32(a):
    return a.astype(np.float32).astype(np.float64)


def test_canonical_witness_matches_brute_force():
    scheme = fixtures.make_scheme(2, 2, tile_h=16, tile_w=16, ragged=False)
    gt = fixtures.gauges_large_table(scheme, 60)
    gx, gy = gt["x"].to_numpy(), gt["y"].to_numpy()
    gv, gid = gt["value"].to_numpy(), gt["gid"].to_numpy()
    want = _brute_canonical(scheme.grid, gx, gy, gv, gid, k=8)
    got = oracle.knn_idw_canonical(scheme.grid, gx, gy, gv, gid, k=8)
    np.testing.assert_array_equal(got, want)


def test_canonical_witness_k_exceeds_gauges():
    scheme = fixtures.make_scheme(2, 2, tile_h=8, tile_w=8, ragged=False)
    gt = fixtures.gauges_large_table(scheme, 5)
    gx, gy = gt["x"].to_numpy(), gt["y"].to_numpy()
    gv, gid = gt["value"].to_numpy(), gt["gid"].to_numpy()
    want = _brute_canonical(scheme.grid, gx, gy, gv, gid, k=8)
    got = oracle.knn_idw_canonical(scheme.grid, gx, gy, gv, gid, k=8)
    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def meta_tileset(ray_session, small_scheme):
    # geometry-only TileSet: drop the payload column before ingest (the
    # stage never decodes pixels)
    t = fixtures.tiles_table(small_scheme).drop_columns(["bytes"])
    return from_arrow_tiles(t, small_scheme, validate=False)


@pytest.mark.parametrize("tiles_per_cell", [1, 2])
def test_partitioned_matches_witness(meta_tileset, small_scheme, tiles_per_cell):
    gt = fixtures.gauges_large_table(small_scheme, 3000)
    want = _f32(
        oracle.knn_idw_canonical(
            small_scheme.grid,
            gt["x"].to_numpy(),
            gt["y"].to_numpy(),
            gt["value"].to_numpy(),
            gt["gid"].to_numpy(),
            k=8,
        )
    )
    gauges = ray.data.from_arrow(gt).repartition(4)
    out = knn_idw_partitioned(
        meta_tileset, gauges, k=8, tiles_per_cell=tiles_per_cell
    )
    np.testing.assert_array_equal(to_array(out), want)


def test_partitioned_skewed_gauges(ray_session, small_scheme):
    """All gauges clustered in one corner: the replication plan must reach
    across the grid (every cell's D-bound pulls in the far cluster) and the
    result must still be exact."""
    ext = small_scheme.grid.extent
    n = 400
    x = ext[0] + fixtures._halton_vec(n, 2) * 0.08 * (ext[1] - ext[0])
    y = ext[2] + fixtures._halton_vec(n, 3) * 0.08 * (ext[3] - ext[2])
    v = fixtures.analytic_z(x, y, small_scheme.grid)
    gid = np.arange(n, dtype=np.int64)
    import pyarrow as pa

    gt = pa.table(
        {
            "gid": pa.array(gid, pa.int64()),
            "x": pa.array(x),
            "y": pa.array(y),
            "value": pa.array(v),
        }
    )
    want = _f32(oracle.knn_idw_canonical(small_scheme.grid, x, y, v, gid, k=8))
    t = fixtures.tiles_table(small_scheme).drop_columns(["bytes"])
    ts = from_arrow_tiles(t, small_scheme, validate=False)
    out = knn_idw_partitioned(ts, ray.data.from_arrow(gt), k=8)
    np.testing.assert_array_equal(to_array(out), want)


def test_gauges_large_ds_bit_exact_vs_driver_table(ray_session, small_scheme):
    """The distributed Halton gauge generator must be BIT-identical to the
    driver-side table for any block split (the radical inverse's extra
    loop iterations add exactly 0.0 — fixtures._radical_inverse)."""
    import pandas as pd

    want = fixtures.gauges_large_table(small_scheme, 1000).to_pandas()
    got = (
        fixtures.gauges_large_ds(small_scheme, 1000, num_blocks=7)
        .to_pandas()
        .sort_values("gid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
