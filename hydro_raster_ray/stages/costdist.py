"""Distributed cost-distance (least-accumulated-cost surface).

The classic GIS "Cost Distance" operator (ArcGIS/GRASS r.cost, public
semantics): from a set of source cells, the minimum accumulated travel
cost to every cell of a cost raster, moving over the 8-neighborhood with
step cost ``0.5·(cost(u) + cost(v))·len`` (len = 1 or √2). Here the cost
surface is ``z − zmin + 1`` (strictly positive; NaN cells impassable) and
the sources are gauge cells.

Exactness contract: a shortest-path value is the LEFT-ASSOCIATED float
sum of step costs along its path (both Dijkstra and Bellman relaxation
build sums in path order), and float ``+`` is monotone, so the converged
relaxation equals the scalar-Dijkstra witness BIT-EXACTLY: at a Bellman
fixed point d(v) ≤ d(u) + w along every edge implies, by induction along
the optimal path, d(v) ≤ its float path sum; and every d(v) IS some path
sum, hence the min.

Distributed shape (the flowacc/depressions contraction family, but
value- rather than topology-coupled, so it is ITERATIVE):

1. per-tile solve: a vectorized Gauss-Seidel chamfer (down/right/up/left
   sweeps, each a column- or row-vectorized relaxation covering all 8
   edge directions) seeded by in-tile sources and the tile's current
   border-ring estimates — loops until the tile reaches its local fixed
   point;
2. driver ring relaxation: ring cells are BORDER-SCALE (O(√cells) per
   tile); the driver relaxes the cross-tile (incl. corner-diagonal)
   edges between adjacent rings and re-seeds only the tiles whose ring
   improved — the frontier re-solve, so quiescent regions are never
   re-decoded;
3. iterate to global quiescence (rounds ≤ the tile-graph hop diameter
   from the sources — the documented bound; a budget guard raises
   rather than looping), then one stats pass with the converged seeds.

Columns: image_id, n_reached, sum_dist (round 2), max_dist (round 6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..grid import map2sub
from .decode import iter_tiles
from .stats import global_stats

__all__ = ["cost_distance_stats", "chamfer_solve", "least_cost_path"]

_SQ2 = float(np.sqrt(2.0))


def chamfer_solve(cost: np.ndarray, d: np.ndarray,
                  max_iters: int = 100000) -> np.ndarray:
    """Gauss-Seidel relaxation to the in-tile fixed point. ``cost`` uses
    +inf for impassable cells (inf propagates harmlessly through the
    candidate sums; NaN would poison ``np.minimum``)."""
    h, w = cost.shape
    d = d.copy()
    for _ in range(max_iters):
        before = d.copy()
        for r in range(1, h):  # DOWN: vertical + both diagonals
            up = d[r - 1]
            c0, c1 = cost[r - 1], cost[r]
            np.minimum(d[r], up + 0.5 * (c0 + c1), out=d[r])
            np.minimum(d[r][1:],
                       up[:-1] + 0.5 * (c0[:-1] + c1[1:]) * _SQ2,
                       out=d[r][1:])
            np.minimum(d[r][:-1],
                       up[1:] + 0.5 * (c0[1:] + c1[:-1]) * _SQ2,
                       out=d[r][:-1])
        for c in range(1, w):  # RIGHT
            np.minimum(d[:, c],
                       d[:, c - 1] + 0.5 * (cost[:, c - 1] + cost[:, c]),
                       out=d[:, c])
        for r in range(h - 2, -1, -1):  # UP: vertical + both diagonals
            dn = d[r + 1]
            c0, c1 = cost[r + 1], cost[r]
            np.minimum(d[r], dn + 0.5 * (c0 + c1), out=d[r])
            np.minimum(d[r][1:],
                       dn[:-1] + 0.5 * (c0[:-1] + c1[1:]) * _SQ2,
                       out=d[r][1:])
            np.minimum(d[r][:-1],
                       dn[1:] + 0.5 * (c0[1:] + c1[:-1]) * _SQ2,
                       out=d[r][:-1])
        for c in range(w - 2, -1, -1):  # LEFT
            np.minimum(d[:, c],
                       d[:, c + 1] + 0.5 * (cost[:, c + 1] + cost[:, c]),
                       out=d[:, c])
        if np.array_equal(before, d):
            return d
    raise RuntimeError("chamfer_solve: no fixed point within budget")


def _ring_index(h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Row-major border-ring cell coordinates of an h×w tile."""
    rr, cc = np.mgrid[0:h, 0:w]
    m = (rr == 0) | (rr == h - 1) | (cc == 0) | (cc == w - 1)
    return rr[m], cc[m]


def _converge(ts, sources_xy, max_rounds: int | None = None):
    """Shared phase 1+2: iterate tile solves + ring relaxation to global
    quiescence. Returns (zmin, src_arr, seeds, meta) — seeds/meta are
    border-scale driver state keyed by image_id."""
    grid = ts.grid
    zmin = float(global_stats(ts)["min"])
    srcs = set()
    for x, y in sources_xy:
        r, c = map2sub(float(x), float(y), grid)
        r, c = int(r), int(c)
        if 0 <= r < grid.nrows and 0 <= c < grid.ncols:
            srcs.add((r, c))
    src_arr = sorted(srcs)
    if max_rounds is None:
        # tile-graph hop diameter bound (+slack): the documented budget
        max_rounds = 4 * (grid.nrows + grid.ncols)

    def _tile_cost(arr: np.ndarray) -> np.ndarray:
        c = arr.astype(np.float64) - zmin + 1.0
        c[~np.isfinite(arr)] = np.inf
        return c

    def _seed_grid(info, ring_seed: np.ndarray | None,
                   cost: np.ndarray) -> np.ndarray:
        d = np.full(cost.shape, np.inf)
        if ring_seed is not None:
            rr, cc = _ring_index(*cost.shape)
            d[rr, cc] = ring_seed
        for (gr, gc) in src_arr:
            r, c = gr - info.gr0, gc - info.gc0
            if 0 <= r < cost.shape[0] and 0 <= c < cost.shape[1] \
                    and np.isfinite(cost[r, c]):
                d[r, c] = 0.0
        return d

    # round 0: ring metadata (global coords + cost) and first solve
    meta: dict[str, tuple] = {}  # image_id -> (gr0, gc0, h, w)
    ringcost: dict[str, np.ndarray] = {}
    dists: dict[str, np.ndarray] = {}
    seeds: dict[str, np.ndarray] = {}

    def solve_round(active_ref):
        def fn(batch: pa.Table) -> pa.Table:
            act = ray.get(active_ref)
            ids, rings, costs_o, metas = [], [], [], []
            for info, arr in iter_tiles(batch, grid, dtype=np.float32):
                if act is not None and info.image_id not in act:
                    continue
                cost = _tile_cost(arr)
                seed = act[info.image_id] if act is not None else None
                d = chamfer_solve(cost, _seed_grid(info, seed, cost))
                rr, cc = _ring_index(*cost.shape)
                ids.append(info.image_id)
                rings.append(d[rr, cc].tobytes())
                costs_o.append(cost[rr, cc].tobytes())
                metas.append(
                    f"{info.gr0},{info.gc0},{cost.shape[0]},{cost.shape[1]}")
            return pa.table(
                {"image_id": pa.array(ids, pa.string()),
                 "ring": pa.array(rings, pa.binary()),
                 "ringcost": pa.array(costs_o, pa.binary()),
                 "meta": pa.array(metas, pa.string())}
            )

        return ts.ds.map_batches(fn, batch_format="pyarrow").to_pandas()

    out0 = solve_round(ray.put(None))
    for _, row in out0.iterrows():
        g0, c0, h, w = (int(v) for v in row["meta"].split(","))
        meta[row["image_id"]] = (g0, c0, h, w)
        ringcost[row["image_id"]] = np.frombuffer(row["ringcost"], np.float64)
        dists[row["image_id"]] = np.frombuffer(row["ring"], np.float64)
        seeds[row["image_id"]] = dists[row["image_id"]].copy()

    # global position index of every ring cell (driver: border-scale)
    pos: dict[tuple, tuple] = {}
    for tid, (g0, c0, h, w) in meta.items():
        rr, cc = _ring_index(h, w)
        for i, (r, c) in enumerate(zip(rr + g0, cc + c0)):
            pos[(int(r), int(c))] = (tid, i)

    for _round in range(max_rounds):
        new_seeds = {t: v.copy() for t, v in seeds.items()}
        improved: set[str] = set()
        for (r, c), (tid, i) in pos.items():
            du = dists[tid][i]
            if not np.isfinite(du):
                continue
            cu = ringcost[tid][i]
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if dr == 0 and dc == 0:
                        continue
                    nb = pos.get((r + dr, c + dc))
                    if nb is None or nb[0] == tid:
                        continue
                    vt, vi = nb
                    cv = ringcost[vt][vi]
                    step = 0.5 * (cu + cv) * (_SQ2 if dr and dc else 1.0)
                    cand = du + step
                    if cand < new_seeds[vt][vi]:
                        new_seeds[vt][vi] = cand
                        improved.add(vt)
        if not improved:
            break
        seeds = new_seeds
        act = {t: seeds[t] for t in improved}
        outr = solve_round(ray.put(act))
        for _, row in outr.iterrows():
            dists[row["image_id"]] = np.frombuffer(row["ring"], np.float64)
        for t in improved:  # solved tiles now dominate their seeds
            seeds[t] = dists[t].copy()
    else:
        raise RuntimeError("cost_distance: no quiescence within budget")
    return zmin, src_arr, seeds, meta


def _tile_cost_of(arr: np.ndarray, zmin: float) -> np.ndarray:
    c = arr.astype(np.float64) - zmin + 1.0
    c[~np.isfinite(arr)] = np.inf
    return c


def _seed_grid_of(info, ring_seed, cost, src_arr) -> np.ndarray:
    d = np.full(cost.shape, np.inf)
    if ring_seed is not None:
        rr, cc = _ring_index(*cost.shape)
        d[rr, cc] = ring_seed
    for (gr, gc) in src_arr:
        r, c = gr - info.gr0, gc - info.gc0
        if 0 <= r < cost.shape[0] and 0 <= c < cost.shape[1] \
                and np.isfinite(cost[r, c]):
            d[r, c] = 0.0
    return d


def cost_distance_stats(ts, sources_xy, max_rounds: int | None = None):
    """Distributed cost distance → per-tile stats (see module doc)."""
    grid = ts.grid
    zmin, src_arr, seeds, _meta = _converge(ts, sources_xy, max_rounds)

    # stats pass with converged ring seeds
    sref = ray.put(seeds)

    def stats_fn(batch: pa.Table) -> pa.Table:
        sd = ray.get(sref)
        ids, nr, sm, mx = [], [], [], []
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            cost = _tile_cost_of(arr, zmin)
            d = chamfer_solve(
                cost, _seed_grid_of(info, sd[info.image_id], cost, src_arr))
            fin = np.isfinite(d)
            ids.append(info.image_id)
            nr.append(int(fin.sum()))
            sm.append(round(float(d[fin].sum()), 2) if fin.any() else 0.0)
            mx.append(round(float(d[fin].max()), 6) if fin.any() else 0.0)
        return pa.table(
            {"image_id": pa.array(ids, pa.string()),
             "n_reached": pa.array(nr, pa.int64()),
             "sum_dist": pa.array(sm, pa.float64()),
             "max_dist": pa.array(mx, pa.float64())}
        )

    return ts.ds.map_batches(stats_fn, batch_format="pyarrow").sort("image_id")


def least_cost_path(ts, sources_xy, max_rounds: int | None = None):
    """Least-cost PATH extraction (ArcGIS Cost Path / GRASS r.drain):
    steepest-descent backtrack over the converged cost-distance field
    from the MOST REMOTE reachable cell (global max distance, ties to
    the smallest (gr, gc) — the worst-case evacuation route) down to a
    source.

    Shape: phase 1 reuses ``_converge`` (border-ring driver state);
    phase 2 finds the remote cell via a per-tile argmax pass (one row
    per tile); phase 3 walks downhill on the driver, lazily re-solving
    ONLY the tiles the path enters (each solve is seeded by the
    converged ring, so its field is the global field restricted to the
    tile — the bit-exactness argument in the module doc). The walk is
    RESULT-SIZED: O(path length) driver work, O(path tiles) tile
    fetches (at scale, a key-partitioned tile store makes each fetch
    O(1) instead of a filtered scan). Descent to the globally minimal
    8-neighbor strictly decreases d, so termination at d = 0 is
    guaranteed; neighbor ties break by (dr, dc) row-major order.
    Columns: step, gr, gc, dist (round 6)."""
    grid = ts.grid
    zmin, src_arr, seeds, meta = _converge(ts, sources_xy, max_rounds)
    sref = ray.put(seeds)

    def argmax_fn(batch: pa.Table) -> pa.Table:
        sd = ray.get(sref)
        ids, md, mr, mc = [], [], [], []
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            cost = _tile_cost_of(arr, zmin)
            d = chamfer_solve(
                cost, _seed_grid_of(info, sd[info.image_id], cost, src_arr))
            fin = np.isfinite(d)
            if not fin.any():
                continue
            dm = np.where(fin, d, -np.inf)
            # ties to smallest (r, c): argmax of row-major flat is exactly
            # the first maximum in (r, c) order
            flat = int(np.argmax(dm))
            r, c = divmod(flat, d.shape[1])
            ids.append(info.image_id)
            md.append(float(d[r, c]))
            mr.append(int(info.gr0 + r))
            mc.append(int(info.gc0 + c))
        return pa.table(
            {"image_id": pa.array(ids, pa.string()),
             "maxd": pa.array(md, pa.float64()),
             "gr": pa.array(mr, pa.int64()),
             "gc": pa.array(mc, pa.int64())}
        )

    cand = ts.ds.map_batches(argmax_fn, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return ray.data.from_pandas(pd.DataFrame(
            {"step": pd.Series([], dtype=np.int64),
             "gr": pd.Series([], dtype=np.int64),
             "gc": pd.Series([], dtype=np.int64),
             "dist": pd.Series([], dtype=np.float64)}))
    cand = cand.sort_values(
        ["maxd", "gr", "gc"], ascending=[False, True, True])
    cur = (int(cand.iloc[0]["gr"]), int(cand.iloc[0]["gc"]))

    # lazy per-tile field cache: one filtered solve per tile the path enters
    fields: dict[str, tuple] = {}  # image_id -> (gr0, gc0, d array)
    by_origin = {}
    for tid, (g0, c0, h, w) in meta.items():
        by_origin[tid] = (g0, c0, h, w)

    def tile_of(r, c):
        for tid, (g0, c0, h, w) in by_origin.items():
            if g0 <= r < g0 + h and c0 <= c < c0 + w:
                return tid
        return None

    def field(tid):
        if tid in fields:
            return fields[tid]
        want = {tid}
        wref = ray.put(want)

        def solve_one(batch: pa.Table) -> pa.Table:
            w_ = ray.get(wref)
            sd = ray.get(sref)
            ids, g0s, c0s, bufs = [], [], [], []
            for info, arr in iter_tiles(batch, grid, dtype=np.float32):
                if info.image_id not in w_:
                    continue
                cost = _tile_cost_of(arr, zmin)
                d = chamfer_solve(
                    cost,
                    _seed_grid_of(info, sd[info.image_id], cost, src_arr))
                ids.append(info.image_id)
                g0s.append(info.gr0)
                c0s.append(info.gc0)
                bufs.append(d.astype("<f8").tobytes())
            return pa.table(
                {"image_id": pa.array(ids, pa.string()),
                 "gr0": pa.array(g0s, pa.int64()),
                 "gc0": pa.array(c0s, pa.int64()),
                 "buf": pa.array(bufs, pa.binary())}
            )

        out = ts.ds.map_batches(solve_one, batch_format="pyarrow").to_pandas()
        row = out[out["image_id"] == tid].iloc[0]
        g0, c0, h, w = by_origin[tid]
        d = np.frombuffer(row["buf"], "<f8").reshape(h, w)
        fields[tid] = (int(row["gr0"]), int(row["gc0"]), d)
        return fields[tid]

    def dval(r, c):
        if not (0 <= r < grid.nrows and 0 <= c < grid.ncols):
            return np.inf
        tid = tile_of(r, c)
        g0, c0, d = field(tid)
        return float(d[r - g0, c - c0])

    path = []
    guard = grid.nrows * grid.ncols
    d_cur = dval(*cur)
    while True:
        path.append((len(path), cur[0], cur[1], round(d_cur, 6)))
        if d_cur == 0.0 or len(path) > guard:
            break
        best = None
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                dv = dval(cur[0] + dr, cur[1] + dc)
                if best is None or dv < best[0]:
                    best = (dv, cur[0] + dr, cur[1] + dc)
        if best is None or best[0] >= d_cur:
            break  # defensive: no descent possible
        d_cur = best[0]
        cur = (best[1], best[2])

    return ray.data.from_pandas(pd.DataFrame(
        {
            "step": np.array([p[0] for p in path], np.int64),
            "gr": np.array([p[1] for p in path], np.int64),
            "gc": np.array([p[2] for p in path], np.int64),
            "dist": np.array([p[3] for p in path], np.float64),
        }
    ))
