"""Pure-numpy Delaunay triangulation + barycentric linear interpolation.

``Raster.point_interpolate(method='linear')`` (``Raster.py:420-421``)
delegates to ``scipy.interpolate.griddata``, which triangulates the gauges
(Qhull) and interpolates barycentrically per triangle, NaN outside the
convex hull. scipy is not available in this environment, so this module
reimplements both halves from the published algorithms:

- ``delaunay``: Bowyer–Watson incremental insertion with a super-triangle
  (gauge tables are small — they are the broadcast side — so the O(n²)
  incremental construction is irrelevant; it runs once per actor).
- ``TriInterpolator``: per-triangle affine inverses precomputed once; a
  query point's triangle is located by testing barycentric coordinates
  against every triangle (vectorized over triangles × points; ties on
  shared edges resolve to the lowest triangle index, deterministically).

Engine-defined semantics note: the triangulation of cocircular point sets
is not unique, so cell values inside such triangles may differ from
scipy's Qhull choice; the fixture gauges (Halton) are irregular and the
LINEAR-REPRODUCTION property (an affine surface is reproduced exactly for
ANY triangulation) is what the tests pin.
"""

from __future__ import annotations

import numpy as np

__all__ = ["delaunay", "TriInterpolator"]


def _circumcircle_contains(pts, tri, p, eps=1e-12):
    """True if p lies inside the circumcircle of triangle tri (robust-ish
    via the standard 3x3 in-circle determinant, normalized)."""
    a, b, c = pts[tri[0]], pts[tri[1]], pts[tri[2]]
    m = np.array(
        [
            [a[0] - p[0], a[1] - p[1], (a[0] - p[0]) ** 2 + (a[1] - p[1]) ** 2],
            [b[0] - p[0], b[1] - p[1], (b[0] - p[0]) ** 2 + (b[1] - p[1]) ** 2],
            [c[0] - p[0], c[1] - p[1], (c[0] - p[0]) ** 2 + (c[1] - p[1]) ** 2],
        ]
    )
    det = np.linalg.det(m)
    # orientation: positive for CCW triangles
    orient = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    return det * np.sign(orient) > eps


def delaunay(points: np.ndarray) -> np.ndarray:
    """Bowyer–Watson Delaunay triangulation. Returns (m, 3) int64 vertex
    indices into ``points`` ((n, 2) float64, n ≥ 3, non-collinear)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    # super-triangle enclosing everything
    cx, cy = pts.mean(axis=0)
    r = max(np.abs(pts - [cx, cy]).max(), 1.0) * 100.0
    sup = np.array(
        [[cx - 2 * r, cy - r], [cx + 2 * r, cy - r], [cx, cy + 2 * r]]
    )
    allp = np.vstack([pts, sup])
    tris = [(n, n + 1, n + 2)]
    for i in range(n):
        p = allp[i]
        bad = [t for t in tris if _circumcircle_contains(allp, t, p)]
        # polygon boundary = edges of bad triangles not shared by two
        edge_count: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        boundary = [e for e, cnt in edge_count.items() if cnt == 1]
        tris = [t for t in tris if t not in bad]
        for e in boundary:
            tris.append((e[0], e[1], i))
    # drop triangles touching the super-triangle
    out = [t for t in tris if max(t) < n]
    return np.array(sorted(tuple(sorted(t)) for t in out), dtype=np.int64)


class TriInterpolator:
    """Barycentric linear interpolation over a fixed gauge set. Build once
    (per actor); call with flat query coordinate arrays."""

    def __init__(self, x, y, values, eps: float = 1e-9):
        self.pts = np.c_[np.asarray(x, np.float64), np.asarray(y, np.float64)]
        self.v = np.asarray(values, dtype=np.float64)
        self.eps = eps
        self.tris = delaunay(self.pts)
        # per-triangle inverse affine: lam12 = Tinv @ (p - p0)
        p0 = self.pts[self.tris[:, 0]]
        d1 = self.pts[self.tris[:, 1]] - p0
        d2 = self.pts[self.tris[:, 2]] - p0
        det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
        self.p0 = p0
        self.inv = np.stack(
            [
                np.c_[d2[:, 1], -d2[:, 0]] / det[:, None],
                np.c_[-d1[:, 1], d1[:, 0]] / det[:, None],
            ],
            axis=1,
        )  # (m, 2, 2): row k gives lam_{k+1} coefficients

    def __call__(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Interpolated values; NaN outside the convex hull."""
        q = np.c_[px, py]
        out = np.full(q.shape[0], np.nan)
        unresolved = np.ones(q.shape[0], dtype=bool)
        for t in range(len(self.tris)):
            if not unresolved.any():
                break
            idx = np.nonzero(unresolved)[0]
            d = q[idx] - self.p0[t]
            l1 = self.inv[t, 0, 0] * d[:, 0] + self.inv[t, 0, 1] * d[:, 1]
            l2 = self.inv[t, 1, 0] * d[:, 0] + self.inv[t, 1, 1] * d[:, 1]
            l0 = 1.0 - l1 - l2
            inside = (l0 >= -self.eps) & (l1 >= -self.eps) & (l2 >= -self.eps)
            if not inside.any():
                continue
            sel = idx[inside]
            va = self.v[self.tris[t, 0]]
            vb = self.v[self.tris[t, 1]]
            vc = self.v[self.tris[t, 2]]
            out[sel] = l0[inside] * va + l1[inside] * vb + l2[inside] * vc
            unresolved[sel] = False
        return out
