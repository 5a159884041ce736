"""Channel-geometry compositions: line→surface bathymetry and
overhead-block removal.

The reference documents these as the missing modules
``interp_line2surface`` / ``channel_geometry`` and ``remove_block``
(``docs/source/Modules/index.rst:1-14``, README items 3-4); their input data
survives in ``sample_data.pkl`` (banklines 40×2/50×2, crosslines 4×21×3 —
SURVEY.md §0). Per SURVEY.md §2.7 they are COMPOSITIONS of already-built
primitives, not new ones:

- ``line_to_surface``: cross-section soundings (x, y, z polylines) →
  scattered-point interpolation (broadcast gauge actor, §interpolate)
  restricted to the channel polygon between the banklines (point-in-polygon
  mask, §geom), pasted over the DEM — one fused per-tile stage.
- ``remove_block``: rasterize the footprint mask (§rasterize), then refill
  masked cells by IDW from the surrounding valid "donor" ring (mask
  dilation). Assumes footprint + donor ring fit inside one tile (true for
  building/bridge footprints at ≥64-px tiles); the halo-join of
  stages/resample.py is the documented scale path for larger footprints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geom import points_in_polygon
from ..sources.tiles import TileSet
from ..stages.decode import map_tiles
from ..stages.interpolate import GaugeInterpolator

__all__ = ["channel_ring", "line_to_surface", "remove_block"]


def channel_ring(bankline0: np.ndarray, bankline1: np.ndarray) -> np.ndarray:
    """Closed channel polygon: bank 0 forward + bank 1 reversed."""
    b0 = np.asarray(bankline0, dtype=np.float64)
    b1 = np.asarray(bankline1, dtype=np.float64)
    return np.vstack([b0, b1[::-1], b0[:1]])


def _crossline_points(crosslines) -> dict:
    """Stack (n, 3) x,y,z cross-section soundings into a gauge table."""
    pts = np.vstack([np.asarray(c, dtype=np.float64) for c in crosslines])
    return {"x": pts[:, 0], "y": pts[:, 1], "value": pts[:, 2]}


class _ChannelBurn:
    """Per-tile: interpolate the soundings inside the channel polygon and
    paste over the DEM (outside the channel the DEM is untouched)."""

    def __init__(self, gauges_ref, ring, method="idw", power=2.0):
        self.interp = GaugeInterpolator(gauges_ref, method=method, power=power)
        self.ring = np.asarray(ring, dtype=np.float64)

    def __call__(self, arr, info):
        X, Y = info.cell_centres()
        inside = points_in_polygon(X.ravel(), Y.ravel(), self.ring)
        if not inside.any():
            return arr  # tile doesn't touch the channel: pass through
        px, py = X.ravel()[inside], Y.ravel()[inside]
        if self.interp.method == "nearest":
            idx, _ = self.interp._nearest_idx(px, py)
            vals = self.interp.v[idx]
        else:
            vals = self.interp._idw(px, py)
        out = arr.copy().ravel()
        out[inside] = vals
        return out.reshape(info.h, info.w)


def line_to_surface(
    ts: TileSet,
    crosslines,
    bankline0,
    bankline1,
    method: str = "idw",
    concurrency: int = 4,
) -> TileSet:
    """Burn river bathymetry interpolated from cross-sections into the DEM."""
    g = _crossline_points(crosslines)
    ring = channel_ring(bankline0, bankline1)
    ref = ray.put(g)
    return map_tiles(
        ts,
        _ChannelBurn,
        concurrency=concurrency,
        fn_constructor_kwargs={"gauges_ref": ref, "ring": ring, "method": method},
        lossless=True,
    )


def _dilate(mask: np.ndarray, iters: int) -> np.ndarray:
    out = mask.copy()
    for _ in range(iters):
        grown = out.copy()
        grown[1:, :] |= out[:-1, :]
        grown[:-1, :] |= out[1:, :]
        grown[:, 1:] |= out[:, :-1]
        grown[:, :-1] |= out[:, 1:]
        out = grown
    return out


class _RemoveBlock:
    def __init__(self, feats_ref, ring_width=3, power=2.0):
        feats = ray.get(feats_ref) if isinstance(feats_ref, ray.ObjectRef) else feats_ref
        self.rings = [np.asarray(r, dtype=np.float64) for f in feats for r in f["rings"]]
        self.ring_width = ring_width
        self.power = power

    def __call__(self, arr, info):
        X, Y = info.cell_centres()
        mask = np.zeros(X.size, dtype=bool)
        for ring in self.rings:
            mask |= points_in_polygon(X.ravel(), Y.ravel(), ring)
        if not mask.any():
            return arr
        mask2 = mask.reshape(info.h, info.w)
        donors = _dilate(mask2, self.ring_width) & ~mask2 & np.isfinite(arr)
        out = arr.copy()
        if not donors.any():
            out[mask2] = np.nan  # no donors in reach: cells become holes
            return out
        dx = X[donors]
        dy = Y[donors]
        dv = arr[donors]
        tx = X[mask2]
        ty = Y[mask2]
        # IDW from the donor ring (chunked; donor counts are small)
        fill = np.empty(tx.size)
        for s in range(0, tx.size, 4096):
            e = min(s + 4096, tx.size)
            d2 = (tx[s:e, None] - dx[None, :]) ** 2 + (ty[s:e, None] - dy[None, :]) ** 2
            w = 1.0 / np.maximum(d2, 1e-12) ** (self.power / 2.0)
            fill[s:e] = (w * dv[None, :]).sum(axis=1) / w.sum(axis=1)
        out[mask2] = fill
        return out


def remove_block(
    ts: TileSet, features, ring_width: int = 3, concurrency: int = 4
) -> TileSet:
    """Remove overhead buildings/bridges: refill footprint cells from the
    surrounding terrain (README item 4 reconstructed)."""
    feats = [
        {"rings": [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in f["rings"]]}
        for f in features
    ]
    ref = ray.put(feats)
    return map_tiles(
        ts,
        _RemoveBlock,
        concurrency=concurrency,
        fn_constructor_kwargs={"feats_ref": ref, "ring_width": ring_width},
        lossless=True,
    )
