"""Marching-squares contour extraction over a distributed tile set.

The classic iso-line operator (Lorensen & Cline's marching squares — the 2-D
slice of marching cubes; public algorithm) the reference ecosystem exposes
through matplotlib's ``contour`` path in ``mapshow`` (``visual.py``) — here
as a DATA product, not a drawing: per contour level, the crossed-cell count,
segment count, and total polyline length.

Geometry contract (shared verbatim with the SQL oracle, which reproduces the
whole operator independently as a 2×2 pixel self-join in DuckDB — no witness
file involved):

- a CELL is a 2×2 pixel-corner window; the cell at (r, c) owns corners
  z00=(r,c), z01=(r,c+1), z10=(r+1,c), z11=(r+1,c+1) and belongs to the tile
  containing its top-left corner — so each cell is counted by exactly one
  tile, with the right/bottom/diagonal corners arriving through the shared
  1-px halo machinery (``stages/halo.py``, ``corners=True``: the diagonal
  1×1 corner IS read here, unlike the gradient family);
- cells with any non-finite corner are skipped (NODATA holes break lines);
- an edge crosses level L iff exactly one endpoint is ``>= L``; the crossing
  parameter is the IDENTICAL double expression both sides,
  ``t = (L - z_a) / (z_b - z_a)`` (a strict straddle, so the divisor can
  never be zero);
- crossing points in cell-local units: top=(t,0) right=(1,t) bottom=(t,1)
  left=(0,t). A 2-crossing cell contributes one segment between its two
  crossing points; the 4-crossing saddle is disambiguated by the FIXED
  pairing (top,right)+(bottom,left) — no centre-average rule, documented so
  the oracle can mirror it. Cell-local coordinates keep the per-cell
  arithmetic bit-identical across engine and SQL (absolute coordinates would
  reassociate the subtraction); only the final sum order differs, absorbed
  by ``round(·, 3)`` on a length ~9 decimal digits above the accumulated
  double error.

Scale shape: ONE haloed map pass over the tiles (broadcast-strip fast path
under budget, bucket-file fragment exchange above it — ``halo_map``), each
tile emitting ``len(levels)`` partial rows; the only exchange after that is
a ``groupby(level)`` over n_tiles×n_levels tiny rows. No driver
materialization anywhere; 100-TB ready by the hillshade argument.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tiles import TileSet
from .halo import halo_map

__all__ = ["contour_stats"]

_OUT_SCHEMA = pa.schema(
    [
        ("level", pa.float64()),
        ("n_cells", pa.int64()),
        ("n_segments", pa.int64()),
        ("len_sum", pa.float64()),
    ]
)


def _cell_lengths(zw: np.ndarray, level: float) -> tuple[int, int, float]:
    """Marching-squares partials for one tile window: ``zw`` is the
    (h+1, w+1) float64 corner window (NaN where the halo is off-grid).
    Returns (n_crossed_cells, n_segments, summed cell-local length)."""
    z00 = zw[:-1, :-1]
    z01 = zw[:-1, 1:]
    z10 = zw[1:, :-1]
    z11 = zw[1:, 1:]
    valid = (
        np.isfinite(z00) & np.isfinite(z01) & np.isfinite(z10)
        & np.isfinite(z11)
    )
    g00 = z00 >= level
    g01 = z01 >= level
    g10 = z10 >= level
    g11 = z11 >= level
    ct = (g00 != g01) & valid
    cr = (g01 != g11) & valid
    cb = (g10 != g11) & valid
    cl = (g00 != g10) & valid
    ncross = (
        ct.astype(np.int8) + cr.astype(np.int8)
        + cb.astype(np.int8) + cl.astype(np.int8)
    )
    hit = ncross > 0
    n_cells = int(hit.sum())
    if not n_cells:
        return 0, 0, 0.0
    n_segments = int((ncross[hit] // 2).sum(dtype=np.int64))

    # crossing parameters, gated to crossing edges (strict straddle ⇒ the
    # divisor is nonzero); subset to crossed cells only
    def t(num_a, num_b, flag):
        a = num_a[hit]
        b = num_b[hit]
        f = flag[hit]
        out = np.full(a.shape, np.nan)
        np.divide(level - a, b - a, out=out, where=f)
        return out

    tt = t(z00, z01, ct)
    tr = t(z01, z11, cr)
    tb = t(z10, z11, cb)
    tl = t(z00, z10, cl)
    # points in cell-local units, edge order [top, right, bottom, left]
    n = n_cells
    px = np.column_stack([tt, np.ones(n), tb, np.zeros(n)])
    py = np.column_stack([np.zeros(n), tr, np.ones(n), tl])
    mask = np.column_stack([ct[hit], cr[hit], cb[hit], cl[hit]])
    # stable argsort on ~mask puts the set edges first, preserving the
    # [top,right,bottom,left] order the oracle's CASE ladder walks
    order = np.argsort(~mask, axis=1, kind="stable")
    sx = np.take_along_axis(px, order, axis=1)
    sy = np.take_along_axis(py, order, axis=1)
    dx = sx[:, 0] - sx[:, 1]
    dy = sy[:, 0] - sy[:, 1]
    d = np.sqrt(dx * dx + dy * dy)
    four = ncross[hit] == 4
    if four.any():
        dx2 = sx[four, 2] - sx[four, 3]
        dy2 = sy[four, 2] - sy[four, 3]
        d[four] = d[four] + np.sqrt(dx2 * dx2 + dy2 * dy2)
    return n_cells, n_segments, float(d.sum())


def contour_stats(
    ts: TileSet,
    levels: tuple[float, ...] = (-50.0, 0.0, 50.0),
    halo_broadcast_budget: int = 256 << 20,
) -> "pa.Table":
    """Per-level contour statistics: (level, n_cells, n_segments,
    total_len) with total_len in map units (cell lengths × cellsize,
    rounded to 3 decimals), ordered by level. See module docstring for
    the geometry/oracle contract."""
    cs = float(ts.grid.cellsize)

    def per_tile(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        # (h+1, w+1) corner window; NaN where the halo is off-grid (the
        # bottom/right rim of the global grid), which skips those cells
        # exactly like the whole-array formulation would
        zw = np.full((h + 1, w + 1), np.nan)
        ah = min(h + 1, win.shape[0] - br)
        aw = min(w + 1, win.shape[1] - bc)
        zw[:ah, :aw] = win[br : br + ah, bc : bc + aw]
        rows = {k: [] for k in _OUT_SCHEMA.names}
        for lv in levels:
            n_cells, n_seg, dsum = _cell_lengths(zw, float(lv))
            rows["level"].append(float(lv))
            rows["n_cells"].append(n_cells)
            rows["n_segments"].append(n_seg)
            # cs·Σd here vs the oracle's Σ(cs·d): association + sum order
            # differ by ~1 ulp per term, absorbed by the final round(·, 3)
            rows["len_sum"].append(cs * dsum)
        return pa.table(rows, schema=_OUT_SCHEMA)

    partials = halo_map(
        ts, per_tile, corners=True, budget_bytes=halo_broadcast_budget
    )
    from ray.data.aggregate import Sum

    agg = partials.groupby("level").aggregate(
        Sum("n_cells", alias_name="n_cells"),
        Sum("n_segments", alias_name="n_segments"),
        Sum("len_sum", alias_name="len_sum"),
    )

    def final(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "level": t["level"],
                "n_cells": pc.cast(t["n_cells"], pa.int64()),
                "n_segments": pc.cast(t["n_segments"], pa.int64()),
                "total_len": pc.round(t["len_sum"], 3),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow").sort("level")
