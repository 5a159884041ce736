"""Normalized cross-correlation against a fixed 3×3 template — the
classic template-matching primitive of an image-curation pipeline
(Lewis 1995 "Fast Normalized Cross-Correlation", public method). Same
halo machinery as the focal/blur/sobel family
(``stages/terrain._terrain``, corners=True). STRICT window: NaN wherever
any of the nine cells is missing.

The default template is the zero-mean diagonal detector

    [[ 2, -1, -1],
     [-1,  2, -1],
     [-1, -1,  2]]      (Σt = 0, Σt² = 18 — exact small integers)

Exactness contract (what lets ``ncc_hist`` carry a genuinely INDEPENDENT
SQL oracle): per cell, in float64 over the f32-stored inputs, with w_ij
the 3×3 window row-major and d_ij = w_ij − mw,

    sw  = ((((((((w00+w01)+w02)+w10)+w11)+w12)+w20)+w21)+w22
    mw  = sw / 9.0
    num = fixed left-assoc row-major Σ  t_ij · d_ij
    den = fixed left-assoc row-major Σ  d_ij · d_ij
    ncc = num / sqrt(den · 18.0)   if den > 0 else NaN

then rounded to f32 by tile storage. Every operation is an IEEE double
op in a FIXED order with integer template weights, so a SQL engine
evaluating the identically-parenthesized expressions reproduces every
cell bit-for-bit (den == 0 iff the window is exactly flat — an exact
predicate on both sides).
"""

from __future__ import annotations

import numpy as np

from ..sources.tiles import TileSet
from .terrain import _terrain

__all__ = ["ncc_match", "TEMPLATE"]

TEMPLATE = ((2.0, -1.0, -1.0), (-1.0, 2.0, -1.0), (-1.0, -1.0, 2.0))
_ST2 = 18.0  # Σ t² for the default template


def _ncc_kernel(win: np.ndarray) -> np.ndarray:
    a = win.astype(np.float64)
    h, w = a.shape
    p = np.full((h + 2, w + 2), np.nan)
    p[1:-1, 1:-1] = a
    planes = [
        np.where(
            np.isfinite(p[dr : dr + h, dc : dc + w]),
            p[dr : dr + h, dc : dc + w],
            0.0,
        )
        for dr in (0, 1, 2)
        for dc in (0, 1, 2)
    ]
    ok = np.ones((h, w), dtype=bool)
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            ok &= np.isfinite(p[dr : dr + h, dc : dc + w])
    sw = planes[0]
    for t in planes[1:]:  # fixed row-major order IS the contract
        sw = sw + t
    mw = sw / 9.0
    num = None
    den = None
    flat_t = [TEMPLATE[i][j] for i in range(3) for j in range(3)]
    for t, wgt in zip(planes, flat_t):
        d = t - mw
        nterm = wgt * d
        dterm = d * d
        num = nterm if num is None else num + nterm
        den = dterm if den is None else den + dterm
    with np.errstate(invalid="ignore", divide="ignore"):
        ncc = num / np.sqrt(den * _ST2)
    return np.where(ok & (den > 0), ncc, np.nan)


def ncc_match(
    ts: TileSet,
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """Per-cell NCC score against the module template (strict window —
    NaN beside any hole, grid edge, or exactly-flat window)."""
    return _terrain(
        ts, _ncc_kernel, "NCC 3x3 diagonal template", shuffle_blocks,
        halo_broadcast_budget, corners=True,
    )
