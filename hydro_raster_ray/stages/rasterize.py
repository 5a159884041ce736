"""Rasterize: the broadcast-small-side spatial join (``Raster.rasterize``,
``Raster.py:277-338``).

The features table (polygons + attributes, the analog of the reference's
4-polygon shapefile) is the SMALL side: it is ``ray.put`` once on the driver
and read inside every task — never re-shipped per batch, never shuffled. Per
tile, a pure-numpy even-odd scanline burns each candidate feature onto the
tile's cell-centre block; later features overwrite earlier (burn order =
feature order, ``Raster.py:324-333``); untouched cells stay NaN; the
``include_nan`` flag sets NaN→1 and ``burned == nodata`` → NaN afterwards,
exactly mirroring ``Raster.py:334-336``.

Skew note (hot-cell salting): tiles on feature-dense boundaries burn many
polygons. Candidates are bbox-pruned per tile, each feature burns only its
bbox sub-rectangle of the tile, and the feature list is processed in fixed
chunks so per-task memory is bounded; because features are broadcast, a
dense tile costs CPU (not shuffle), which Ray's streaming executor load-
balances across the pool. Burn order stays deterministic under any chunking
because chunks recombine by feature index (last-feature-wins), never by task
completion order.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray

from ..geom import grid_points_in_polygon
from ..sources.tiles import TileSet
from .decode import TileInfo, iter_tiles, rows_to_table

__all__ = ["burn_features", "rasterize_plane", "apply_features"]


def _features_ref(features):
    """Normalize features to (list-of-dicts, values) and ray.put the payload
    once (broadcast). Each feature dict needs 'rings'; bbox is precomputed."""
    feats = []
    for f in features:
        rings = [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in f["rings"]]
        pts = np.concatenate(rings)
        feats.append(
            {
                "rings": rings,
                "bbox": (
                    float(pts[:, 0].min()),
                    float(pts[:, 0].max()),
                    float(pts[:, 1].min()),
                    float(pts[:, 1].max()),
                ),
                "attrs": {k: v for k, v in f.items() if k != "rings"},
            }
        )
    return ray.put(feats)


def _resolve_values(feats, attribute):
    """Reference attribute dispatch (``Raster.py:316-328``): None → enumerate
    index; str → attribute per feature; list → parallel values."""
    if attribute is None:
        return list(range(len(feats)))
    if isinstance(attribute, str):
        return [f["attrs"][attribute] for f in feats]
    return list(attribute)


def burn_features(
    info: TileInfo, feats, values, include_nan=False, dtype=np.float64
) -> np.ndarray:
    """Burn the candidate features onto one tile; returns the (h, w) plane.

    ``dtype=np.float32`` is for planes whose burned values are f32-exact
    (e.g. feature INDICES) — half the plane traffic, identical contents."""
    g = info.grid
    cs = g.cellsize
    spec = info.spec
    left, right, bottom, top = (
        spec.xllcorner,
        spec.xllcorner + spec.ncols * cs,
        spec.yllcorner,
        spec.yllcorner + spec.nrows * cs,
    )
    out = np.full((info.h, info.w), np.nan, dtype=dtype)
    X = left + (np.arange(info.w) + 0.5) * cs
    Y = top - (np.arange(info.h) + 0.5) * cs
    for feat, val in zip(feats, values):
        bx0, bx1, by0, by1 = feat["bbox"]
        if bx1 < left or bx0 > right or by1 < bottom or by0 > top:
            continue
        # burn only the feature's bbox sub-rectangle of the tile
        c0 = int(np.searchsorted(X, bx0 - cs, side="left"))
        c1 = int(np.searchsorted(X, bx1 + cs, side="right"))
        # Y is descending; bound rows by the bbox ± one cell margin
        rr = np.nonzero((Y >= by0 - cs) & (Y <= by1 + cs))[0]
        if rr.size == 0 or c1 <= c0:
            continue
        r0, r1 = int(rr[0]), int(rr[-1]) + 1
        # scanline grid kernel — bit-identical to points_in_polygon on the
        # meshgrid, O(rows·edges) instead of O(rows·cols·edges)
        mask = np.zeros((r1 - r0, c1 - c0), dtype=bool)
        for ring in feat["rings"]:
            mask |= grid_points_in_polygon(X[c0:c1], Y[r0:r1], ring)
        # 2-D mask assignment: out[...] slice may be non-contiguous, so a
        # ravel() would copy and drop the writes
        out[r0:r1, c0:c1][mask] = val  # last feature wins
    if include_nan:
        out[np.isnan(out)] = 1.0
    out[out == g.nodata] = np.nan
    return out


def rasterize_plane(
    ts: TileSet, features, attribute=None, include_nan: bool = False
) -> TileSet:
    """Features → a mask/attribute plane TileSet aligned with ``ts`` (the
    standalone ``Raster.rasterize`` output; fmt raw-f32, captions carried)."""
    ref = _features_ref(features)
    grid = ts.grid

    def burn_batch(batch: pa.Table) -> pa.Table:
        feats = ray.get(ref)
        values = _resolve_values(feats, attribute)
        rows = []
        for info, _arr in iter_tiles(batch, grid):
            rows.append((info, burn_features(info, feats, values, include_nan)))
        return rows_to_table(rows, lossless=True) if rows else rows_to_table([])

    return TileSet(
        ds=ts.ds.map_batches(burn_batch, batch_format="pyarrow", batch_size=None), grid=grid
    )


def apply_features(
    ts: TileSet,
    features,
    combine: Callable[[np.ndarray, np.ndarray, TileInfo], np.ndarray],
    attribute=None,
    include_nan: bool = False,
) -> TileSet:
    """Fused rasterize + landcover-to-parameter combine (tutorial cells 8/12:
    ``array[index] += 20``, ``array - value_array*2``).

    ``combine(pixels, plane, info) -> pixels'`` runs per tile with both the
    decoded payload and the burned plane — one pass, no second read, no join
    shuffle. The mask-index idiom is ``plane >= 0`` (``README.md:56-63``).
    """
    ref = _features_ref(features)
    grid = ts.grid

    def fuse_batch(batch: pa.Table) -> pa.Table:
        feats = ray.get(ref)
        values = _resolve_values(feats, attribute)
        rows = []
        for info, arr in iter_tiles(batch, grid):
            plane = burn_features(info, feats, values, include_nan)
            rows.append((info, np.asarray(combine(arr, plane, info), dtype=np.float64)))
        return rows_to_table(rows, lossless=True) if rows else rows_to_table([])

    return TileSet(
        ds=ts.ds.map_batches(fuse_batch, batch_format="pyarrow", batch_size=None), grid=grid
    )
