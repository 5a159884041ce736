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

__all__ = ["points_in_polygon", "polygon_bbox", "line2sub_walk"]

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
