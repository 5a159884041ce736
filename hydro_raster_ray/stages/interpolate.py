"""Gauge → surface interpolation: the stateful actor-pool stage (EP3).

``Raster.point_interpolate`` (``Raster.py:409-429``) delegates to
``scipy.interpolate.griddata``; with ``method='nearest'`` that is exactly the
Euclidean-nearest-gauge value at every cell centre (Voronoi assignment). The
engine reimplements it pure-numpy as a ``map_tiles`` ACTOR POOL: the gauge
table is ``ray.put`` once, each actor builds its spatial index ONCE in
``__init__`` (the analog of scipy rebuilding its triangulation per call —
amortized here), and ``__call__`` interpolates one tile per row.

Methods:
- ``nearest`` — exact Voronoi (griddata-nearest parity).
- ``idw``     — inverse-distance weighting over all gauges (small tables) or
  the k nearest (large tables), the engine's documented extension of the
  reference's interpolation family (SURVEY.md §2.7).

Index: for ≤ ``BRUTE_MAX`` gauges, chunked brute force (numpy, exact). For
larger tables, a uniform bucket grid with ring expansion — the kNN guarantee
comes from the ring bound (a gauge outside ring r is farther than r·bucket
cells), matching brute force exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..sources.tiles import TileSet
from .decode import iter_tile_meta, iter_tiles, map_tiles

__all__ = ["GaugeInterpolator", "point_interpolate", "voronoi_counts"]

BRUTE_MAX = 2048
_CHUNK = 2048  # cells per distance block (bounds memory at 2048×BRUTE_MAX)


class _BucketIndex:
    """Uniform-grid spatial index over gauge points (pure numpy)."""

    def __init__(self, x: np.ndarray, y: np.ndarray):
        self.x = x
        self.y = y
        n = x.size
        self.x0 = float(x.min())
        self.y0 = float(y.min())
        span_x = float(x.max()) - self.x0
        span_y = float(y.max()) - self.y0
        nb = max(1, int(np.sqrt(n / 2)))
        self.bs = max(span_x, span_y) / nb or 1.0
        self.nbx = int(span_x / self.bs) + 1
        self.nby = int(span_y / self.bs) + 1
        bx = np.minimum(((x - self.x0) / self.bs).astype(np.int64), self.nbx - 1)
        by = np.minimum(((y - self.y0) / self.bs).astype(np.int64), self.nby - 1)
        key = by * self.nbx + bx
        self.order = np.argsort(key, kind="stable")
        sorted_key = key[self.order]
        self.offsets = np.searchsorted(
            sorted_key, np.arange(self.nbx * self.nby + 1)
        )

    def _bucket_members(self, bx: int, by: int) -> np.ndarray:
        if bx < 0 or by < 0 or bx >= self.nbx or by >= self.nby:
            return np.empty(0, dtype=np.int64)
        k = by * self.nbx + bx
        return self.order[self.offsets[k] : self.offsets[k + 1]]

    def _ring_members(self, bx: int, by: int, r: int) -> np.ndarray:
        if r == 0:
            return self._bucket_members(bx, by)
        parts = []
        for dx in range(-r, r + 1):
            parts.append(self._bucket_members(bx + dx, by - r))
            parts.append(self._bucket_members(bx + dx, by + r))
        for dy in range(-r + 1, r):
            parts.append(self._bucket_members(bx - r, by + dy))
            parts.append(self._bucket_members(bx + r, by + dy))
        return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)

    def nearest(self, px: np.ndarray, py: np.ndarray):
        """Exact nearest gauge index per query point (ring expansion)."""
        m = px.size
        best_idx = np.full(m, -1, dtype=np.int64)
        best_d2 = np.full(m, np.inf)
        # UNclamped bucket coords: a query outside the gauge bbox sits in a
        # virtual empty bucket, which keeps the ring-resolution bound exact
        qbx = np.floor((px - self.x0) / self.bs).astype(np.int64)
        qby = np.floor((py - self.y0) / self.bs).astype(np.int64)
        unresolved = np.arange(m)
        excess = max(
            0,
            int(-qbx.min()),
            int(qbx.max() - (self.nbx - 1)),
            int(-qby.min()),
            int(qby.max() - (self.nby - 1)),
        )
        max_r = max(self.nbx, self.nby) + excess
        for r in range(max_r + 1):
            if unresolved.size == 0:
                break
            # group unresolved points by their bucket → vectorize per bucket
            keys = qby[unresolved] * (2 * max_r + self.nbx) + qbx[unresolved]
            for k in np.unique(keys):
                sel = unresolved[keys == k]
                bx = int(qbx[sel[0]])
                by = int(qby[sel[0]])
                cand = self._ring_members(bx, by, r)
                if cand.size == 0:
                    continue
                d2 = (px[sel, None] - self.x[cand][None, :]) ** 2 + (
                    py[sel, None] - self.y[cand][None, :]
                ) ** 2
                j = np.argmin(d2, axis=1)
                dd = d2[np.arange(sel.size), j]
                upd = dd < best_d2[sel]
                best_d2[sel] = np.where(upd, dd, best_d2[sel])
                best_idx[sel] = np.where(upd, cand[j], best_idx[sel])
            # resolution bound: no gauge beyond ring r can be closer than
            # r * bucket_size from the point's bucket
            bound = (r * self.bs) ** 2
            done = best_d2[unresolved] <= bound
            unresolved = unresolved[~done]
        assert (best_idx >= 0).all(), "bucket index failed to resolve a point"
        return best_idx, best_d2


class GaugeInterpolator:
    """Callable-class UDF for ``map_tiles``: one instance per actor.

    ``gauges_ref`` is an ``ray.put`` handle to a dict of numpy arrays
    (x, y, value) — fetched once per actor, index built once per actor.
    """

    def __init__(self, gauges_ref, method: str = "nearest", power: float = 2.0,
                 k: int | None = None, eps: float = 1e-12):
        g = ray.get(gauges_ref) if isinstance(gauges_ref, ray.ObjectRef) else gauges_ref
        self.x = np.asarray(g["x"], dtype=np.float64)
        self.y = np.asarray(g["y"], dtype=np.float64)
        self.v = np.asarray(g["value"], dtype=np.float64)
        self.method = method
        self.power = power
        self.k = k
        self.eps = eps
        self.index = _BucketIndex(self.x, self.y) if self.x.size > BRUTE_MAX else None
        if method == "linear":
            # Delaunay built ONCE per actor (the scipy-griddata analog of
            # rebuilding the triangulation per call, amortized)
            from ..tri import TriInterpolator

            self.tri = TriInterpolator(self.x, self.y, self.v)

    def _nearest_idx(self, px, py):
        if self.index is not None:
            idx, d2 = self.index.nearest(px, py)
            return idx, d2
        idx = np.empty(px.size, dtype=np.int64)
        d2o = np.empty(px.size)
        for s in range(0, px.size, _CHUNK):
            e = min(s + _CHUNK, px.size)
            d2 = (px[s:e, None] - self.x[None, :]) ** 2 + (
                py[s:e, None] - self.y[None, :]
            ) ** 2
            j = np.argmin(d2, axis=1)
            idx[s:e] = j
            d2o[s:e] = d2[np.arange(e - s), j]
        return idx, d2o

    def _idw(self, px, py):
        out = np.empty(px.size)
        for s in range(0, px.size, _CHUNK):
            e = min(s + _CHUNK, px.size)
            d2 = (px[s:e, None] - self.x[None, :]) ** 2 + (
                py[s:e, None] - self.y[None, :]
            ) ** 2
            if self.k is not None and self.k < self.x.size:
                # kNN-IDW: zero out all but the k smallest distances
                part = np.argpartition(d2, self.k, axis=1)[:, self.k :]
                d2[np.arange(e - s)[:, None], part] = np.inf
            w = 1.0 / np.power(np.maximum(d2, self.eps), self.power / 2.0)
            w[~np.isfinite(w)] = 0.0
            out[s:e] = (w * self.v[None, :]).sum(axis=1) / w.sum(axis=1)
            hit = d2.min(axis=1) <= self.eps
            if hit.any():
                out[s:e][hit] = self.v[np.argmin(d2[hit], axis=1)]
        return out

    def __call__(self, arr, info):
        X, Y = info.cell_centres()
        px, py = X.ravel(), Y.ravel()
        if self.method == "nearest":
            idx, _ = self._nearest_idx(px, py)
            out = self.v[idx]
        elif self.method == "idw":
            out = self._idw(px, py)
        elif self.method == "linear":
            # barycentric on the per-actor triangulation; NaN outside the
            # hull (griddata-linear contract, Raster.py:420-421)
            out = self.tri(px, py)
        else:
            raise ValueError(f"unknown method {self.method!r}")
        return out.reshape(info.h, info.w)


def point_interpolate(
    ts: TileSet, gauges, method: str = "nearest", concurrency: int = 4, **kw
) -> TileSet:
    """``Raster.point_interpolate`` analog: interpolate the gauge table onto
    every cell of the mosaic (replaces pixel values, like the reference's
    returned new Raster). ``gauges`` is a dict/pandas of x, y, value.

    The input PAYLOADS are never decoded: the reference builds its meshgrid
    from the header alone (``Raster.py:424``), so the stage runs in
    geometry-only mode (``needs_pixels=False``). For true I/O pruning pass
    a TileSet read WITHOUT the payload column
    (``read_tiles(path, scheme, columns=["w","h","fmt","caption","phash"])``)
    — at 100 TB that is the difference between streaming the corpus and
    streaming a metadata table. (Pruning mid-pipeline with
    ``select_columns`` does NOT push down through the derive-meta stage —
    measured slower than leaving the column in place.)"""
    g = {k: np.asarray(gauges[k], dtype=np.float64) for k in ("x", "y", "value")}
    ref = ray.put(g)
    return map_tiles(
        ts,
        GaugeInterpolator,
        concurrency=concurrency,
        fn_constructor_kwargs={"gauges_ref": ref, "method": method, **kw},
        lossless=True,  # interpolated values replace pixels; keep them exact
        needs_pixels=False,
    )


def voronoi_counts(ts: TileSet, gauges, concurrency: int = 4):
    """Per-gauge Voronoi cell count + mean observed pixel value — the
    join-row-count witness of the kNN gauge-to-cell join. Returns a Ray
    Dataset (gauge_id, n_cells, sum_z) via per-batch partials + a tiny
    groupby."""
    ids = np.asarray(gauges["gauge_id"]).astype(str)
    g = {k: np.asarray(gauges[k], dtype=np.float64) for k in ("x", "y", "value")}
    ref = ray.put(g)
    grid = ts.grid

    class Counter:
        def __init__(self):
            self.interp = GaugeInterpolator(ref, method="nearest")

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = self.interp.x.size
            counts = np.zeros(n, dtype=np.int64)
            sums = np.zeros(n)
            for info, arr in iter_tiles(batch, grid):
                X, Y = info.cell_centres()
                idx, _ = self.interp._nearest_idx(X.ravel(), Y.ravel())
                counts += np.bincount(idx, minlength=n)
                m = np.isfinite(arr.ravel())
                sums += np.bincount(idx[m], weights=arr.ravel()[m], minlength=n)
            nz = np.nonzero(counts)[0]
            return pa.table(
                {
                    "gauge_id": pa.array(ids[nz], pa.string()),
                    "n_cells": pa.array(counts[nz], pa.int64()),
                    "sum_z": pa.array(sums[nz], pa.float64()),
                }
            )

    from ray.data.aggregate import Sum

    from ..runtime import auto_pool

    partial = ts.ds.map_batches(
        Counter, batch_format="pyarrow", batch_size=None,
        concurrency=auto_pool(concurrency),
    )
    return partial.groupby("gauge_id").aggregate(
        Sum("n_cells", alias_name="n_cells"), Sum("sum_z", alias_name="sum_z")
    )


def idw_stats(ts: TileSet, gauges, power: float = 2.0, concurrency: int = 4):
    """Global (n, mean) of the IDW surface computed in FULL float64 (no
    storage rounding) — the value the DuckDB cross-join oracle reproduces
    exactly. Returns a Ray Dataset with one row (n_cells, mean_idw)."""
    g = {k: np.asarray(gauges[k], dtype=np.float64) for k in ("x", "y", "value")}
    ref = ray.put(g)
    grid = ts.grid

    class Partial:
        def __init__(self):
            self.interp = GaugeInterpolator(ref, method="idw", power=power)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = 0
            s = 0.0
            for info in iter_tile_meta(batch, grid):  # geometry only
                X, Y = info.cell_centres()
                vals = self.interp._idw(X.ravel(), Y.ravel())
                n += vals.size
                s += float(vals.sum())
            return pa.table({"n": [n], "s": [s]})

    from ray.data.aggregate import Sum

    from ..runtime import auto_pool

    agg = ts.ds.map_batches(
        Partial, batch_format="pyarrow", batch_size=None,
        concurrency=auto_pool(concurrency),
    ).aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    import pandas as pd

    return pd.DataFrame(
        {"n_cells": [int(agg["n"])], "mean_idw": [round(agg["s"] / agg["n"], 6)]}
    )
