"""Local Binary Pattern codes — the classic texture descriptor of an
image-curation pipeline (LBP histograms separate flat/noisy/structured
tiles; Ojala et al. 2002, public method). Same halo machinery as the
focal/blur/sobel family (``stages/terrain._terrain``, corners=True).

STRICT window like ``stages/sobel.py``: NaN wherever any of the nine 3×3
cells is missing (grid edge or hole) — a partial-window code is not
comparable across cells.

Exactness contract (what lets ``lbp_hist`` carry a genuinely INDEPENDENT
SQL oracle): per cell, with neighbors in the FIXED clockwise bit order

    bit 0: (-1,-1)   bit 1: (-1, 0)   bit 2: (-1,+1)   bit 3: ( 0,+1)
    bit 4: (+1,+1)   bit 5: (+1, 0)   bit 6: (+1,-1)   bit 7: ( 0,-1)

    code = Σ 2^i · [neighbor_i >= center]

The comparison is on the f32-stored values — exact, no arithmetic at
all — and the code is a small integer (0..255, exactly representable in
the f32 tile storage), so a SQL engine evaluating the same comparisons
reproduces every cell bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from ..sources.tiles import TileSet
from .terrain import _terrain

__all__ = ["lbp_codes", "LBP_OFFSETS"]

# (dr, dc) per bit, padded-window coordinates (add 1 to centre-relative)
LBP_OFFSETS = (
    (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)
)


def _lbp_kernel(win: np.ndarray) -> np.ndarray:
    a = win.astype(np.float64)
    h, w = a.shape
    p = np.full((h + 2, w + 2), np.nan)
    p[1:-1, 1:-1] = a
    ok = np.isfinite(a)
    code = np.zeros((h, w), dtype=np.float64)
    for i, (dr, dc) in enumerate(LBP_OFFSETS):
        nb = p[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
        ok &= np.isfinite(nb)
        with np.errstate(invalid="ignore"):
            code += float(1 << i) * (nb >= a)
    return np.where(ok, code, np.nan)


def lbp_codes(
    ts: TileSet,
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """3×3 LBP code per cell (strict window — NaN beside any hole or
    grid edge)."""
    return _terrain(
        ts, _lbp_kernel, "LBP 3x3 codes", shuffle_blocks,
        halo_broadcast_budget, corners=True,
    )
