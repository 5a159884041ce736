"""Vector-geometry kernels: point-in-polygon, polyline rasterization.

Pure-numpy replacements for the reference's delegates to
``rasterio.features.rasterize`` (``Raster.py:330-333``) and shapely. The
inclusion rule is the reference docstring's "in and on the polygon"
(``Raster.py:280-282``): even-odd crossing count, with points exactly on a
boundary edge counted inside.

``line2sub`` reimplements ``Raster.py:340-366`` exactly, including the
per-segment ``linspace`` walk and ``round().astype('int32')``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "points_in_polygon",
    "grid_points_in_polygon",
    "polygon_bbox",
    "line2sub_walk",
]

_EDGE_EPS = 1e-12


def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd point-in-polygon test, boundary-inclusive.

    Args:
        px, py: flat arrays of query point coords (same shape).
        ring: (n, 2) closed or open outer ring (closure is implied).

    Returns:
        bool array, True for points inside or on the ring.
    """
    px = np.asarray(px, dtype=np.float64).ravel()
    py = np.asarray(py, dtype=np.float64).ravel()
    ring = np.asarray(ring, dtype=np.float64)
    if ring.ndim != 2 or ring.shape[1] < 2:
        raise ValueError("ring must be (n, 2)")
    # drop explicit closing point; closure is implied below
    if ring.shape[0] > 1 and np.allclose(ring[0], ring[-1]):
        ring = ring[:-1]
    x0 = ring[:, 0]
    y0 = ring[:, 1]
    x1 = np.roll(x0, -1)
    y1 = np.roll(y0, -1)

    inside = np.zeros(px.shape[0], dtype=bool)
    on_edge = np.zeros(px.shape[0], dtype=bool)
    # vectorize over edges (few) against all points (many)
    for ex0, ey0, ex1, ey1 in zip(x0, y0, x1, y1):
        # on-edge test: collinear + within segment bbox
        dx, dy = ex1 - ex0, ey1 - ey0
        cross = (px - ex0) * dy - (py - ey0) * dx
        seg_len2 = dx * dx + dy * dy
        if seg_len2 > 0:
            t = ((px - ex0) * dx + (py - ey0) * dy) / seg_len2
            near = (np.abs(cross) <= _EDGE_EPS * max(1.0, np.sqrt(seg_len2))) & (
                t >= -_EDGE_EPS
            ) & (t <= 1 + _EDGE_EPS)
            on_edge |= near
        # even-odd ray cast (horizontal ray to +x), half-open rule
        cond = (ey0 > py) != (ey1 > py)
        if cond.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = ex0 + (py - ey0) * dx / (dy if dy != 0 else np.inf)
            inside ^= cond & (px < xint)
    return inside | on_edge


def grid_points_in_polygon(X: np.ndarray, Y: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Scanline specialization of ``points_in_polygon`` for an axis-aligned
    grid of query points — BIT-IDENTICAL output, ~grid-width times less work.

    ``points_in_polygon`` evaluates every (point, edge) pair; on a grid the
    per-edge crossing abscissa ``xint = ex0 + (py-ey0)*dx/dy`` is constant
    along a row, so the row's parity flips are an interval [0, #cols with
    ``px < xint``) — computed with ONE ``searchsorted`` against the sorted
    column coordinates (the comparison is the same float ``<`` on the same
    ``xint`` value, so every point's parity bit is identical to the
    per-point loop). The boundary-inclusion test has nanometre tolerance
    (``_EDGE_EPS·len``), so its candidates are confined to ±2 columns
    around each edge's row crossing (±2 rows/full col-range for horizontal
    edges); the ORIGINAL on-edge expressions are evaluated verbatim on just
    those candidates.

    Args:
        X: strictly ascending column x-coords (cell centres).
        Y: row y-coords, any order (each row is independent).
        ring: (n, 2) outer ring, closure implied.

    Returns:
        (len(Y), len(X)) bool plane.
    """
    X = np.asarray(X, dtype=np.float64).ravel()
    Y = np.asarray(Y, dtype=np.float64).ravel()
    ring = np.asarray(ring, dtype=np.float64)
    R, W = Y.size, X.size
    if R == 0 or W == 0:
        return np.zeros((R, W), dtype=bool)
    if ring.shape[0] > 1 and np.allclose(ring[0], ring[-1]):
        ring = ring[:-1]
    x0 = ring[:, 0]
    y0 = ring[:, 1]
    x1 = np.roll(x0, -1)
    y1 = np.roll(y0, -1)
    dx = x1 - x0
    dy = y1 - y0

    # ---- even-odd parity via per-row interval flips ----------------------
    cond = (y0[:, None] > Y[None, :]) != (y1[:, None] > Y[None, :])  # (E, R)
    with np.errstate(divide="ignore", invalid="ignore"):
        dy_div = np.where(dy == 0.0, np.inf, dy)
        # EXACT expression order of points_in_polygon: ((py-ey0)*dx)/dy + ex0
        xint = x0[:, None] + ((Y[None, :] - y0[:, None]) * dx[:, None]) / dy_div[:, None]
    er, rr = np.nonzero(cond)
    flips = np.zeros((R, W + 1), dtype=np.int64)
    if er.size:
        idx = np.searchsorted(X, xint[er, rr], side="left")  # #cols with px < xint
        np.add.at(flips, (rr, np.zeros_like(idx)), 1)
        np.add.at(flips, (rr, idx), -1)
    inside = (np.cumsum(flips[:, :W], axis=1) % 2).astype(bool)

    # ---- boundary inclusion: original formulas on a thin candidate set ---
    on = np.zeros((R, W), dtype=bool)

    def _apply_edge(rows_idx, cols_idx, ex0, ey0, ex1, ey1, edx, edy):
        if rows_idx.size == 0 or cols_idx.size == 0:
            return
        rg, cg = np.meshgrid(rows_idx, cols_idx, indexing="ij")
        px = X[cg.ravel()]
        py = Y[rg.ravel()]
        cross = (px - ex0) * edy - (py - ey0) * edx
        seg_len2 = edx * edx + edy * edy
        if seg_len2 <= 0:
            return
        t = ((px - ex0) * edx + (py - ey0) * edy) / seg_len2
        near = (
            (np.abs(cross) <= _EDGE_EPS * max(1.0, np.sqrt(seg_len2)))
            & (t >= -_EDGE_EPS)
            & (t <= 1 + _EDGE_EPS)
        )
        on[rg.ravel()[near], cg.ravel()[near]] = True

    ymin_e = np.minimum(y0, y1)
    ymax_e = np.maximum(y0, y1)
    xmin_e = np.minimum(x0, x1)
    xmax_e = np.maximum(x0, x1)
    # conservative pads: a cell either side swallows the nm-scale tolerance
    y_pad = (np.abs(np.diff(Y)).max() if R > 1 else 1.0) + 1.0
    for e in range(x0.size):
        row_band = np.nonzero((Y >= ymin_e[e] - y_pad) & (Y <= ymax_e[e] + y_pad))[0]
        if row_band.size == 0:
            continue
        seg_len = float(np.hypot(dx[e], dy[e]))
        cs_x = float(X[1] - X[0]) if W > 1 else 1.0
        # near-horizontal edges: the |cross|≤tol strip spans ≥ a column width
        # in x, so the ±2-column window around the crossing is not
        # conservative — use the edge's full column range instead
        if abs(dy[e]) * cs_x <= 2.0 * _EDGE_EPS * max(1.0, seg_len):
            c_lo = int(np.searchsorted(X, xmin_e[e], side="left")) - 2
            c_hi = int(np.searchsorted(X, xmax_e[e], side="right")) + 2
            cols = np.arange(max(c_lo, 0), min(c_hi, W))
            _apply_edge(row_band, cols, x0[e], y0[e], x1[e], y1[e], dx[e], dy[e])
        else:
            a = x0[e] + ((Y[row_band] - y0[e]) * dx[e]) / dy[e]
            ctr = np.searchsorted(X, a, side="left")
            for off in range(-2, 3):
                cc = ctr + off
                ok = (cc >= 0) & (cc < W)
                if not ok.any():
                    continue
                rsel = row_band[ok]
                csel = cc[ok]
                px = X[csel]
                py = Y[rsel]
                cross = (px - x0[e]) * dy[e] - (py - y0[e]) * dx[e]
                seg_len2 = dx[e] * dx[e] + dy[e] * dy[e]
                t = ((px - x0[e]) * dx[e] + (py - y0[e]) * dy[e]) / seg_len2
                near = (
                    (np.abs(cross) <= _EDGE_EPS * max(1.0, np.sqrt(seg_len2)))
                    & (t >= -_EDGE_EPS)
                    & (t <= 1 + _EDGE_EPS)
                )
                on[rsel[near], csel[near]] = True
    return inside | on


def polygon_bbox(rings) -> tuple[float, float, float, float]:
    """(xmin, xmax, ymin, ymax) over one or many rings."""
    pts = np.concatenate([np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in rings])
    return (
        float(pts[:, 0].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].min()),
        float(pts[:, 1].max()),
    )


def line2sub_walk(rows: np.ndarray, cols: np.ndarray, nrows: int, ncols: int):
    """Polyline vertices (already in subscript space) → traversed cells.

    Exact reimplementation of the segment walk of ``Raster.line2sub``
    (``Raster.py:340-366``): per segment, ``max(|dr|,|dc|)+1`` linspace steps
    rounded to int32; the shared endpoint of consecutive segments is emitted
    once; out-of-bounds cells filtered at the end.
    """
    subs_all = np.c_[np.asarray(rows, dtype=np.int64), np.asarray(cols, dtype=np.int64)]
    if subs_all.shape[0] < 2:
        raise ValueError("polyline needs >= 2 vertices")
    line_subs = []
    for n in range(subs_all.shape[0] - 1):
        p0 = subs_all[n]
        p1 = subs_all[n + 1]
        sub_steps = int(np.abs(p1 - p0).max()) + 1
        seg_rows = np.linspace(p0[0], p1[0], sub_steps).round().astype("int32")
        seg_cols = np.linspace(p0[1], p1[1], sub_steps).round().astype("int32")
        seg = np.c_[seg_rows, seg_cols]
        if (seg[-1] == p1).all():
            line_subs.append(seg[:-1])
        else:
            line_subs.append(seg)
    subs = np.concatenate(line_subs)
    r, c = subs[:, 0], subs[:, 1]
    ok = (r >= 0) & (r < nrows) & (c >= 0) & (c < ncols)
    return r[ok], c[ok]
