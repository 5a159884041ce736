"""Distributed vectorize (connected components + cross-tile stitch)."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures
from hydro_raster_ray.grid import GridSpec, TileScheme
from hydro_raster_ray.sources import from_arrow_tiles
from hydro_raster_ray.sources.asc import from_numpy
from hydro_raster_ray.stages.vectorize import label_tile, vectorize_components


def _oracle_components(arr):
    """Whole-array BFS labeling (independent of the engine's union-find)."""
    h, w = arr.shape
    seen = np.zeros((h, w), dtype=bool)
    comps = []
    for r in range(h):
        for c in range(w):
            if seen[r, c] or not np.isfinite(arr[r, c]):
                continue
            v = arr[r, c]
            stack = [(r, c)]
            seen[r, c] = True
            cells = []
            while stack:
                rr, cc = stack.pop()
                cells.append((rr, cc))
                for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    nr, nc = rr + dr, cc + dc
                    if (
                        0 <= nr < h
                        and 0 <= nc < w
                        and not seen[nr, nc]
                        and np.isfinite(arr[nr, nc])
                        and arr[nr, nc] == v
                    ):
                        seen[nr, nc] = True
                        stack.append((nr, nc))
            rs = [x[0] for x in cells]
            cs = [x[1] for x in cells]
            comps.append(
                (float(v), len(cells), min(rs), max(rs), min(cs), max(cs))
            )
    return sorted(comps)


def test_label_tile_basic():
    a = np.array(
        [
            [1.0, 1.0, np.nan, 2.0],
            [1.0, np.nan, 2.0, 2.0],
            [3.0, 3.0, np.nan, 2.0],
        ]
    )
    labels, n = label_tile(a)
    assert n == 3  # {1,1,1}, the connected 2-group, {3,3}
    assert labels[0, 0] == labels[0, 1] == labels[1, 0]
    assert labels[0, 3] == labels[1, 3] == labels[1, 2] == labels[2, 3]
    assert labels[2, 0] == labels[2, 1]
    assert labels[0, 2] == -1


def test_components_cross_tile_stitch(ray_session):
    # a plus-shaped region of one value spanning 4 tiles + isolated regions
    spec = GridSpec(ncols=64, nrows=64, xllcorner=0.0, yllcorner=0.0, cellsize=1.0)
    a = np.full((64, 64), np.nan)
    a[20:44, 28:36] = 7.0  # vertical bar crossing the 32-row tile border
    a[28:36, 10:54] = 7.0  # horizontal bar crossing the 32-col border → plus
    a[2:6, 2:6] = 7.0  # isolated same-value square (separate component)
    a[50:60, 50:60] = 3.0  # different value
    ts = from_numpy(a, spec, tile_h=32, tile_w=32)
    got = vectorize_components(ts)
    want = _oracle_components(a)
    got_t = sorted(
        (
            float(r["value"]),
            int(r["n_cells"]),
            int(r["min_gr"]),
            int(r["max_gr"]),
            int(r["min_gc"]),
            int(r["max_gc"]),
        )
        for _, r in got.iterrows()
    )
    assert got_t == want
    assert len(got) == 3


def test_components_on_fixture(ray_session, small_scheme):
    """Classified fixture mosaic: engine components == whole-array oracle."""
    from hydro_raster_ray.stages.stats import classify
    from hydro_raster_ray import oracle

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    binned = classify(ts, [0.0])  # two-level classification → chunky regions
    got = vectorize_components(binned)
    mosaic = np.full(small_scheme.grid.shape, np.nan)
    for tr in range(small_scheme.n_tile_rows):
        for tc in range(small_scheme.n_tile_cols):
            r0, c0 = small_scheme.tile_origin_rc(tr, tc)
            h, w = small_scheme.tile_shape(tr, tc)
            mosaic[r0 : r0 + h, c0 : c0 + w] = fixtures.tile_truth(
                small_scheme, tr, tc
            )
    want = _oracle_components(oracle.classify(mosaic, [0.0]))
    got_t = sorted(
        (
            float(r["value"]),
            int(r["n_cells"]),
            int(r["min_gr"]),
            int(r["max_gr"]),
            int(r["min_gc"]),
            int(r["max_gc"]),
        )
        for _, r in got.iterrows()
    )
    assert got_t == want


def test_vectorize_polygons_rings_and_holes(ray_session):
    """Ring extraction: exterior/hole rings, signed-area = cell-count
    invariant, cross-tile assembly."""
    import pandas as pd

    from hydro_raster_ray.grid import GridSpec
    from hydro_raster_ray.sources.asc import from_numpy
    from hydro_raster_ray.stages.vectorize import vectorize_polygons

    spec = GridSpec(ncols=64, nrows=64, xllcorner=0.0, yllcorner=0.0, cellsize=1.0)
    a = np.full((64, 64), np.nan)
    a[20:44, 28:36] = 7.0
    a[28:36, 10:54] = 7.0  # plus crossing both tile borders
    a[2:10, 2:10] = 5.0
    a[4:8, 4:8] = np.nan  # hole
    a[50:60, 50:60] = 3.0
    ts = from_numpy(a, spec, tile_h=32, tile_w=32)
    out = vectorize_polygons(ts)
    # signed ring areas per component sum to the cell count exactly
    per_comp = out.groupby("component_id").agg(
        n_cells=("n_cells", "first"), area=("area_cells", "sum"), rings=("ring_idx", "size")
    )
    assert (per_comp["area"] == per_comp["n_cells"]).all()
    sq = out[(out["value"] == 5.0)]
    assert len(sq) == 2  # exterior + hole
    assert sq.iloc[0]["n_vertices"] == 32 and sq.iloc[1]["area_cells"] == -16.0
    plus = out[out["value"] == 7.0]
    assert len(plus) == 1 and plus.iloc[0]["n_cells"] == 480
    # every ring closes: vertex coords are lists with first == last
    for _, r in out.iterrows():
        assert r["rs"][0] == r["rs"][-1] and r["cs"][0] == r["cs"][-1]
