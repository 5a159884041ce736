"""Cost distance: octile pencil cases, snake-wall detours (multi-sweep
convergence), and the distributed engine vs an in-test scalar Dijkstra
over the real multi-tile fixture (ragged tiles + NaN holes)."""

import heapq

import numpy as np
import pytest

from hydro_raster_ray import fixtures
from hydro_raster_ray.stages.costdist import chamfer_solve, cost_distance_stats

SQ2 = float(np.sqrt(2.0))


def _dijkstra(cost, sources):
    h, w = cost.shape
    dist = np.full((h, w), np.inf)
    heap = []
    for r, c in sources:
        dist[r, c] = 0.0
        heapq.heappush(heap, (0.0, r, c))
    while heap:
        d, r, c = heapq.heappop(heap)
        if d > dist[r, c]:
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = r + dr, c + dc
                if not (0 <= nr < h and 0 <= nc < w):
                    continue
                if not np.isfinite(cost[nr, nc]):
                    continue
                nd = d + 0.5 * (cost[r, c] + cost[nr, nc]) * (
                    SQ2 if dr and dc else 1.0)
                if nd < dist[nr, nc]:
                    dist[nr, nc] = nd
                    heapq.heappush(heap, (nd, nr, nc))
    return dist


def test_chamfer_uniform_cost_is_octile_distance():
    """Unit cost plane: d = (max−min)·1 + min·√2 (octile metric)."""
    cost = np.ones((7, 9))
    seed = np.full((7, 9), np.inf)
    seed[0, 0] = 0.0
    d = chamfer_solve(cost, seed)
    for r, c in [(0, 5), (4, 0), (3, 3), (6, 8), (2, 7)]:
        lo, hi = sorted((r, c))
        assert d[r, c] == pytest.approx(hi - lo + lo * SQ2, abs=1e-12)


def test_chamfer_snake_wall_needs_multiple_sweeps():
    """A serpentine of impassable walls forces a path that reverses
    direction repeatedly — one chamfer sweep cannot finish; the fixed
    point must still equal scalar Dijkstra EXACTLY."""
    h, w = 12, 12
    cost = np.ones((h, w))
    for r in range(1, h - 1, 2):
        if (r // 2) % 2 == 0:
            cost[r, :-2] = np.inf
        else:
            cost[r, 2:] = np.inf
    seed = np.full((h, w), np.inf)
    seed[0, 0] = 0.0
    d = chamfer_solve(cost, seed)
    want = _dijkstra(cost, [(0, 0)])
    np.testing.assert_array_equal(d, want)


def test_cost_distance_engine_matches_scalar_dijkstra(ray_session):
    """The full distributed operator (tile solves + driver ring rounds)
    vs an in-test whole-grid Dijkstra with the spec's cost surface, over
    the REAL sf0.001-shaped fixture — ragged edge tiles, NaN holes, all
    cross-tile (incl. corner) couplings."""
    from hydro_raster_ray.sources import from_arrow_tiles

    scheme = fixtures.make_scheme(3, 3)
    ts = from_arrow_tiles(fixtures.tiles_table(scheme), scheme)
    g = scheme.grid
    full = fixtures.assemble_truth(scheme)
    zmin = float(np.nanmin(full))
    cost = full - zmin + 1.0
    cost[~np.isfinite(full)] = np.inf
    # three observers spread across different tiles (map coords)
    cells = [(5, 7), (100, 150), (130, 20)]
    xy = [
        (g.xllcorner + (c + 0.5) * g.cellsize,
         g.yllcorner + (g.nrows - r - 0.5) * g.cellsize)
        for r, c in cells
    ]
    got = cost_distance_stats(ts, xy).to_pandas().sort_values(
        "image_id").reset_index(drop=True)
    dist = _dijkstra(cost, [rc for rc in cells if np.isfinite(cost[rc])])
    for i, row in got.iterrows():
        tr, tc = (int(v) for v in row["image_id"][1:].split("_"))
        r0, c0 = scheme.tile_origin_rc(tr, tc)
        z = fixtures.tile_truth(scheme, tr, tc)
        d = dist[r0:r0 + z.shape[0], c0:c0 + z.shape[1]]
        fin = np.isfinite(d)
        assert row["n_reached"] == int(fin.sum())
        assert row["sum_dist"] == (round(float(d[fin].sum()), 2)
                                   if fin.any() else 0.0)
        assert row["max_dist"] == (round(float(d[fin].max()), 6)
                                   if fin.any() else 0.0)


def test_least_cost_path_invariants_and_scalar_parity(ray_session):
    """Path invariants on the multi-tile fixture — strictly decreasing
    dist, 8-connected steps, starts at the global remote cell, ends at a
    source (dist 0) — and bit-parity with the identical walk on the
    in-test Dijkstra field."""
    from hydro_raster_ray.sources import from_arrow_tiles
    from hydro_raster_ray.stages.costdist import least_cost_path

    scheme = fixtures.make_scheme(3, 3)
    ts = from_arrow_tiles(fixtures.tiles_table(scheme), scheme)
    g = scheme.grid
    full = fixtures.assemble_truth(scheme)
    zmin = float(np.nanmin(full))
    cost = full - zmin + 1.0
    cost[~np.isfinite(full)] = np.inf
    cells = [(5, 7), (100, 150)]
    xy = [
        (g.xllcorner + (c + 0.5) * g.cellsize,
         g.yllcorner + (g.nrows - r - 0.5) * g.cellsize)
        for r, c in cells
    ]
    got = least_cost_path(ts, xy).to_pandas().sort_values("step")
    assert len(got) > 2
    d = got["dist"].to_numpy()
    assert (np.diff(d) < 0).all()
    assert d[-1] == 0.0
    steps_r = np.abs(np.diff(got["gr"].to_numpy()))
    steps_c = np.abs(np.diff(got["gc"].to_numpy()))
    assert (np.maximum(steps_r, steps_c) == 1).all()
    # start == global row-major first-max of the Dijkstra field
    dist = _dijkstra(cost, cells)
    dm = np.where(np.isfinite(dist), dist, -np.inf)
    r0, c0 = divmod(int(np.argmax(dm)), cost.shape[1])
    assert (got["gr"].iloc[0], got["gc"].iloc[0]) == (r0, c0)
    assert got["dist"].iloc[0] == round(float(dist[r0, c0]), 6)
    assert (int(got["gr"].iloc[-1]), int(got["gc"].iloc[-1])) in cells
