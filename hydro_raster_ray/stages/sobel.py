"""Sobel gradient magnitude — the classic edge-detection stage of an
image-curation pipeline (blur-then-edge is the canonical quality probe
for blurry/flat tile filtering).

Same halo machinery as the focal/blur family (``stages/terrain.py:
_terrain``, corners=True): broadcast-halo single map pass under the strip
budget, bucket-file fragment exchange above it. STRICT window like
``stages/blur.py``: NaN wherever any of the nine 3×3 cells is missing
(grid edge or hole) — a partial-window gradient is biased.

Exactness contract (mirrors the blur module's — what lets ``sobel_stats``
carry a genuinely INDEPENDENT SQL oracle): per cell

    gx = (((((-1·z00 + 1·z02) + -2·z10) + 2·z12) + -1·z20) + 1·z22)
    gy = (((((-1·z00 + -2·z01) + -1·z02) + 1·z20) + 2·z21) + 1·z22)
    g  = sqrt(gx·gx + gy·gy)

evaluated in float64 over the f32-stored inputs with the FIXED
left-associative order shown (zero-weight cells skipped — adding an exact
0·z term cannot change an IEEE sum, but skipping keeps the expression
identical on both sides), then rounded to f32 by tile storage. Integer
weights are exact in FP and sqrt is correctly rounded, so a SQL engine
evaluating the same expressions reproduces every cell bit-for-bit.
``g`` is produced by ``sqrt`` and is therefore never ``-0.0`` — the
engine/oracle value-hash cannot diverge on signed zeros.
"""

from __future__ import annotations

import numpy as np

from ..sources.tiles import TileSet
from .terrain import _terrain

__all__ = ["sobel_magnitude"]

# (dr, dc, weight) in the FIXED accumulation order of the contract above
_GX = ((0, 0, -1.0), (0, 2, 1.0), (1, 0, -2.0), (1, 2, 2.0),
       (2, 0, -1.0), (2, 2, 1.0))
_GY = ((0, 0, -1.0), (0, 1, -2.0), (0, 2, -1.0), (2, 0, 1.0),
       (2, 1, 2.0), (2, 2, 1.0))


def _sobel_kernel(win: np.ndarray) -> np.ndarray:
    a = win.astype(np.float64)
    h, w = a.shape
    p = np.full((h + 2, w + 2), np.nan)
    p[1:-1, 1:-1] = a
    ok = np.ones((h, w), dtype=bool)
    for dr in (0, 1, 2):  # strict 3x3 window incl. zero-weight cells
        for dc in (0, 1, 2):
            ok &= np.isfinite(p[dr : dr + h, dc : dc + w])

    def acc(terms):
        g = None
        for dr, dc, wgt in terms:  # fixed order IS the contract
            v = p[dr : dr + h, dc : dc + w]
            t = wgt * np.where(np.isfinite(v), v, 0.0)
            g = t if g is None else g + t
        return g

    gx = acc(_GX)
    gy = acc(_GY)
    mag = np.sqrt(gx * gx + gy * gy)
    return np.where(ok, mag, np.nan)


def sobel_magnitude(
    ts: TileSet,
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """3×3 Sobel gradient magnitude per cell (strict window — NaN beside
    any hole or grid edge)."""
    return _terrain(
        ts, _sobel_kernel, "sobel magnitude 3x3", shuffle_blocks,
        halo_broadcast_budget, corners=True,
    )
