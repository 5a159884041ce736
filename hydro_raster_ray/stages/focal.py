"""Focal (moving-window) statistics as distributed data transforms.

The GIS "focal statistics" family — 3×3 NaN-aware mean / min / max /
range / median — on the shared 1-px halo machinery (``stages/halo.py``, corners
included: the window reads diagonals). Semantics defined by the
whole-array witness ``oracle.focal``: window clipped at the grid edge,
output NaN only where the whole window is NaN (focal stats FILL 1-px
holes, unlike the derivative family where holes propagate).

Bit-exactness across tiling: every output cell depends only on its nine
window values, the kernel pads the haloed window with NaN exactly like
the witness pads the whole array, and the mean accumulates in float64
with the same fixed row-major shift order — so per-cell arithmetic is
identical no matter how the corpus is tiled. min/max/range are
order-free. Same two execution paths as slope/aspect: broadcast-halo
single map pass under the strip budget, bucket-file fragment exchange
above it (bit-identical, asserted by tests).
"""

from __future__ import annotations

import numpy as np

from ..sources.tiles import TileSet
from .terrain import _terrain

__all__ = ["focal_stats"]

_STATS = ("mean", "min", "max", "range", "median")


def focal_stats(
    ts: TileSet,
    stat: str = "mean",
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """3×3 focal ``stat`` raster (``raw-f32`` tiles). ``stat``: mean |
    min | max | range | median. The window size is fixed at 3 because the halo
    exchange ships 1-px strips by design; larger windows would compose
    (k applications of 3×3 min/max = (2k+1)×(2k+1)) or need a deeper
    halo."""
    if stat not in _STATS:
        raise ValueError(f"stat must be one of {_STATS}, got {stat!r}")

    def kernel(win: np.ndarray) -> np.ndarray:
        a = win.astype(np.float64)
        h, w = a.shape
        p = np.full((h + 2, w + 2), np.nan)
        p[1:-1, 1:-1] = a
        if stat == "median":
            # order statistic over ≤ 9 values: order-free, exact, and
            # identical to the witness cell-for-cell (same window values)
            import warnings

            stack = np.stack(
                [p[dr : dr + h, dc : dc + w]
                 for dr in (0, 1, 2) for dc in (0, 1, 2)]
            )
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                return np.nanmedian(stack, axis=0)
        acc = np.zeros((h, w))
        cnt = np.zeros((h, w), dtype=np.int64)
        mx = np.full((h, w), -np.inf)
        mn = np.full((h, w), np.inf)
        for dr in (0, 1, 2):  # fixed row-major order — matches the witness
            for dc in (0, 1, 2):
                v = p[dr : dr + h, dc : dc + w]
                ok = np.isfinite(v)
                acc = acc + np.where(ok, v, 0.0)
                cnt = cnt + ok
                mx = np.where(ok & (v > mx), v, mx)
                mn = np.where(ok & (v < mn), v, mn)
        hole = cnt == 0
        if stat == "mean":
            return np.where(hole, np.nan, acc / np.maximum(cnt, 1))
        if stat == "min":
            return np.where(hole, np.nan, mn)
        if stat == "max":
            return np.where(hole, np.nan, mx)
        return np.where(hole, np.nan, mx - mn)

    return _terrain(
        ts, kernel, f"focal {stat} 3x3", shuffle_blocks,
        halo_broadcast_budget, corners=True,
    )
