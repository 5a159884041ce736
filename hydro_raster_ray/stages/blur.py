"""Binomial (Gaussian) smoothing as chained weighted halo passes.

The separable binomial kernel [1,2,1]/4 ⊗ [1,2,1]/4 is the classic
integer-weight Gaussian approximation; two chained 3×3 passes compose to
the 5×5 binomial ([1,4,6,4,1]/16 each axis), the standard pyramid /
pre-decimation smoother. The reference's domain uses the same family for
DEM noise suppression next to the focal mean (``spatial_analysis.py``
neighborhood ops); here it is the image-curation smoothing stage of the
Lance-shaped tile table. Same two execution paths as the focal family
(``stages/terrain.py:_terrain``): broadcast-halo single map pass under
the strip budget, bucket-file fragment exchange above it.

Semantics — STRICT window, unlike the hole-filling focal family: a
weighted mean over a partial window is biased, so the output is NaN
wherever ANY of the nine window cells is missing (grid edge or hole).
Each pass therefore erodes one ring off the valid hull; two passes erode
two — exactly the 5×5 kernel's support requirement.

Exactness contract (what lets ``gauss_blur_stats`` carry a genuinely
INDEPENDENT SQL oracle rather than a witness SELECT): per cell the value
is the FIXED left-to-right weighted sum

    ((((((((1*z00 + 2*z01) + 1*z02) + 2*z10) + 4*z11) + 2*z12)
        + 1*z20) + 2*z21) + 1*z22) / 16

in float64 over the f32-stored inputs, then rounded to f32 by tile
storage. Integer weights are exact in FP, /16 is a power-of-two exponent
shift, and IEEE addition is deterministic given operand order — so a SQL
engine evaluating the same left-associative expression over the same
nine values, with the same CAST to FLOAT between passes, reproduces
every cell bit-for-bit regardless of tiling or summation strategy.
"""

from __future__ import annotations

import numpy as np

from ..sources.tiles import TileSet
from .terrain import _terrain

__all__ = ["binomial_blur"]

# row-major 3×3 binomial weights — the fixed accumulation order IS the
# exactness contract (module docstring); do not reorder
_W = (1.0, 2.0, 1.0, 2.0, 4.0, 2.0, 1.0, 2.0, 1.0)


def _blur_kernel(win: np.ndarray) -> np.ndarray:
    a = win.astype(np.float64)
    h, w = a.shape
    p = np.full((h + 2, w + 2), np.nan)
    p[1:-1, 1:-1] = a
    acc = np.zeros((h, w))
    ok = np.ones((h, w), dtype=bool)
    k = 0
    for dr in (0, 1, 2):  # fixed row-major order — the SQL oracle's order
        for dc in (0, 1, 2):
            v = p[dr : dr + h, dc : dc + w]
            fin = np.isfinite(v)
            ok &= fin
            acc = acc + _W[k] * np.where(fin, v, 0.0)
            k += 1
    return np.where(ok, acc / 16.0, np.nan)


def binomial_blur(
    ts: TileSet,
    passes: int = 2,
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """``passes`` chained 3×3 binomial smoothing passes (2 = the 5×5
    Gaussian). Strict-window: NaN beside any hole or grid edge.

    Multi-pass intermediates are checkpointed with ``materialize()`` —
    the same one-corpus-in-the-object-store trade as ``stages/morph.py``
    open/close and every multi-sweep stencil.
    """
    if passes < 1:
        raise ValueError(f"passes must be >= 1, got {passes}")
    out = _terrain(
        ts, _blur_kernel, "binomial blur 3x3", shuffle_blocks,
        halo_broadcast_budget, corners=True,
    )
    for _ in range(passes - 1):
        mid = TileSet(ds=out.ds.materialize(), grid=out.grid)
        out = _terrain(
            mid, _blur_kernel, "binomial blur 3x3", shuffle_blocks,
            halo_broadcast_budget, corners=True,
        )
    return out
