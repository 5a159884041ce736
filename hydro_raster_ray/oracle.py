"""Single-process pure-numpy oracle replaying the reference's semantics.

This module is the conformance witness (SURVEY.md §5): a tiny whole-array
reimplementation of the reference's ``Raster`` operators. The distributed
engine's output — assembled back into a small mosaic — must match the oracle
exactly (lossless ``fmt``) or within PSNR ≥ 40 dB (lossy ``fmt``).

Each function cites the reference behavior it mirrors. Unlike the engine, the
oracle deliberately materializes whole grids (that is the reference's own
execution model, ``SURVEY.md §4``) — it is only ever run on test-scale data.
"""

from __future__ import annotations

import numpy as np

from .geom import points_in_polygon, polygon_bbox
from .grid import GridSpec, header2extent, map2sub, sub2map

__all__ = [
    "rect_clip",
    "rasterize",
    "polygon_clip",
    "merge",
    "paste_on",
    "assign_to",
    "grid_resample_nearest",
    "nearest_interpolate",
    "idw_interpolate",
    "zonal_stats",
    "classify",
]


def _to_points(spec: GridSpec):
    """Full cell-centre meshgrid (``Raster.to_points``, ``Raster.py:553-567``)."""
    rows = np.arange(spec.nrows)
    cols = np.arange(spec.ncols)
    X, Y = sub2map(rows, cols, spec)
    return np.meshgrid(X, Y)


def rect_clip(array: np.ndarray, spec: GridSpec, clip_extent):
    """``Raster.rect_clip`` (``Raster.py:185-233``): clamp the window to the
    grid extent, snap to cell centres via map2sub/sub2map, slice."""
    extent = header2extent(spec)
    new_extent = list(clip_extent)
    if clip_extent[0] < extent[0]:
        new_extent[0] = extent[0]
    if clip_extent[1] > extent[1]:
        new_extent[1] = extent[1]
    if clip_extent[2] < extent[2]:
        new_extent[2] = extent[2]
    if clip_extent[3] > extent[3]:
        new_extent[3] = extent[3]
    X = np.array(new_extent[0:2])
    Y = np.array(new_extent[2:4])
    cellsize = spec.cellsize
    X_centre = np.array([X.min() + cellsize / 2, X.max() - cellsize / 2])
    Y_centre = np.array([Y.min() + cellsize / 2, Y.max() - cellsize / 2])
    rows, cols = map2sub(X_centre, Y_centre, spec)
    x_centre, y_centre = sub2map(rows, cols, spec)
    xllcorner = float(np.min(x_centre) - cellsize / 2)
    yllcorner = float(np.min(y_centre) - cellsize / 2)
    loc = (slice(int(rows.min()), int(rows.max()) + 1),
           slice(int(cols.min()), int(cols.max()) + 1))
    array_new = array[loc]
    spec_new = GridSpec(
        ncols=array_new.shape[1],
        nrows=array_new.shape[0],
        xllcorner=xllcorner,
        yllcorner=yllcorner,
        cellsize=cellsize,
        nodata=spec.nodata,
        crs=spec.crs,
    )
    return array_new.copy(), spec_new, loc


def rasterize(spec: GridSpec, features, attribute=None, include_nan=False):
    """``Raster.rasterize`` (``Raster.py:277-338``): burn features onto an
    NaN-prefilled plane; value = feature index (enumerate) or attribute;
    fill=0 for untouched cells; later features overwrite earlier; cells in
    and on the polygon are burned; burned == nodata → NaN.

    Args:
        features: sequence of dicts with 'rings': list of (n,2) arrays.
        attribute: None (burn enumerate index), a str key into the feature
            dicts, or a list of values parallel to features.
    """
    if isinstance(attribute, str):
        values = [f[attribute] for f in features]
    elif attribute is None:
        values = list(range(len(features)))
    else:
        values = list(attribute)
    X, Y = _to_points(spec)
    px, py = X.ravel(), Y.ravel()
    # the reference prefills NaN and passes `out=` to rasterio, so `fill=0`
    # never fires: untouched cells stay NaN (Raster.py:330-333)
    out = np.full(px.shape[0], np.nan)
    for feat, val in zip(features, values):
        mask = np.zeros(px.shape[0], dtype=bool)
        for ring in feat["rings"]:
            mask |= points_in_polygon(px, py, np.asarray(ring))
        out[mask] = val  # later features overwrite earlier (burn order)
    burned = out
    if include_nan:
        burned[np.isnan(burned)] = 1.0
    burned[burned == spec.nodata] = np.nan
    return burned.reshape(spec.nrows, spec.ncols)


def polygon_clip(array: np.ndarray, spec: GridSpec, rings):
    """``Raster.clip`` (``Raster.py:235-275``): cells outside the polygon →
    NaN, extent cropped to the polygon's bbox (rasterio ``crop=True``
    behavior: crop window = shape bbox snapped outward to the grid)."""
    xmin, xmax, ymin, ymax = polygon_bbox(rings)
    clipped, cspec, _ = rect_clip(array, spec, (xmin, xmax, ymin, ymax))
    X, Y = _to_points(cspec)
    inside = np.zeros(X.size, dtype=bool)
    for ring in rings:
        inside |= points_in_polygon(X.ravel(), Y.ravel(), np.asarray(ring))
    out = clipped.copy()
    out.ravel()[~inside] = np.nan
    return out, cspec


def merge(origin_array, origin_spec, target_array, target_spec):
    """``hydro_raster.Raster.merge`` (``Raster.py:873-895``), equal-cellsize
    path: scatter origin cell values into target cells via map2sub of origin
    centres; skip NaN and out-of-range; origin overwrites target."""
    grid_x, grid_y = _to_points(origin_spec)
    rows, cols = map2sub(grid_x, grid_y, target_spec)
    ind = (
        (rows >= 0)
        & (rows <= target_spec.nrows - 1)
        & (cols >= 0)
        & (cols <= target_spec.ncols - 1)
        & ~np.isnan(origin_array)
    )
    out = target_array.copy()
    out[rows[ind], cols[ind]] = origin_array[ind]
    return out


def paste_on(small_array, small_spec, large_array, large_spec, ignore_nan=True):
    """``Raster.paste_on`` (``Raster.py:517-551``) including the boundary
    quirk: rows/cols are kept where ``> 0`` (not >= 0) and ``<= n-1``."""
    extent_s = header2extent(small_spec)
    r0, c0 = map2sub(
        extent_s[0] + small_spec.cellsize / 2,
        extent_s[3] - small_spec.cellsize / 2,
        large_spec,
    )
    rows = np.arange(r0, r0 + small_spec.nrows)
    cols = np.arange(c0, c0 + small_spec.ncols)
    ind_r = (rows > 0) & (rows <= large_spec.nrows - 1)
    ind_c = (cols > 0) & (cols <= large_spec.ncols - 1)
    rows = rows[ind_r]
    cols = cols[ind_c]
    array_small = small_array[ind_r, :][:, ind_c].copy()
    rows_grid, cols_grid = np.meshgrid(rows, cols, indexing="ij")
    out = large_array.copy()
    if ignore_nan:
        array_large = out[rows_grid, cols_grid]
        ind_nan = np.isnan(array_small)
        array_small[ind_nan] = array_large[ind_nan]
    out[rows_grid, cols_grid] = array_small
    return out


def assign_to(array, spec: GridSpec, new_spec: GridSpec):
    """``Raster.assign_to`` (``Raster.py:489-515``): nearest-neighbour gather
    of source values at target cell centres, CLAMPED to the source borders
    (border values extend outward); nodata → NaN after."""
    rows = np.arange(new_spec.nrows)
    cols = np.arange(new_spec.ncols)
    X, Y = sub2map(rows, cols, new_spec)
    grid_x, grid_y = np.meshgrid(X, Y)
    r, c = map2sub(grid_x, grid_y, spec)
    r = np.clip(r, 0, spec.nrows - 1)
    c = np.clip(c, 0, spec.ncols - 1)
    new_array = array[r, c] + 0.0
    new_array[new_array == spec.nodata] = np.nan
    return new_array


def grid_resample_nearest(array, spec: GridSpec, newsize):
    """``Raster.grid_resample_nearest`` (``Raster.py:457-487``): floor'd new
    dims, nearest gather, dtype preserved."""
    if isinstance(newsize, GridSpec):
        new_spec = newsize
    else:
        ncols = int(np.floor(spec.cellsize * spec.ncols / newsize))
        nrows = int(np.floor(spec.cellsize * spec.nrows / newsize))
        new_spec = GridSpec(
            ncols=ncols,
            nrows=nrows,
            xllcorner=spec.xllcorner,
            yllcorner=spec.yllcorner,
            cellsize=float(newsize),
            nodata=spec.nodata,
            crs=spec.crs,
        )
    x11 = new_spec.xllcorner + 0.5 * new_spec.cellsize
    y11 = new_spec.yllcorner + (new_spec.nrows - 0.5) * new_spec.cellsize
    x_all = np.linspace(
        x11, x11 + (new_spec.ncols - 1) * new_spec.cellsize, new_spec.ncols
    )
    y_all = np.linspace(
        y11, y11 - (new_spec.nrows - 1) * new_spec.cellsize, new_spec.nrows
    )
    row_all, col_all = map2sub(x_all, y_all, spec)
    rows, cols = np.meshgrid(row_all, col_all)
    out = array[rows, cols].transpose().astype(array.dtype)
    return out, new_spec


def nearest_interpolate(spec: GridSpec, points: np.ndarray, values: np.ndarray):
    """``Raster.point_interpolate(method='nearest')`` (``Raster.py:409-429``):
    scipy ``griddata`` nearest == Euclidean-nearest gauge value at each cell
    centre (Voronoi assignment). Brute-force; oracle-scale only."""
    X, Y = _to_points(spec)
    px = X.ravel()
    py = Y.ravel()
    d2 = (px[:, None] - points[None, :, 0]) ** 2 + (py[:, None] - points[None, :, 1]) ** 2
    idx = np.argmin(d2, axis=1)
    return values[idx].reshape(spec.nrows, spec.ncols), idx.reshape(
        spec.nrows, spec.ncols
    )


def idw_interpolate(spec: GridSpec, points, values, power=2.0, eps=1e-12):
    """Inverse-distance weighting over ALL gauges (the engine's documented
    extension of the reference's interpolation family, SURVEY.md §2.7)."""
    X, Y = _to_points(spec)
    px = X.ravel()
    py = Y.ravel()
    d2 = (px[:, None] - points[None, :, 0]) ** 2 + (py[:, None] - points[None, :, 1]) ** 2
    w = 1.0 / np.power(np.maximum(d2, eps), power / 2.0)
    out = (w * values[None, :]).sum(axis=1) / w.sum(axis=1)
    # exact hit → gauge value
    hit = d2.min(axis=1) <= eps
    if hit.any():
        out[hit] = values[np.argmin(d2[hit], axis=1)]
    return out.reshape(spec.nrows, spec.ncols)


def zonal_stats(array, zone_plane):
    """Per-zone (count, sum, min, max, mean) over valid cells; zones are the
    rasterized attribute plane (NaN = outside all zones)."""
    valid = ~np.isnan(array) & ~np.isnan(zone_plane)
    zones = zone_plane[valid]
    vals = array[valid]
    out = {}
    for z in np.unique(zones):
        v = vals[zones == z]
        out[float(z)] = {
            "n": int(v.size),
            "sum": float(v.sum()),
            "min": float(v.min()),
            "max": float(v.max()),
            "mean": float(v.mean()),
        }
    return out


def classify(array, breaks):
    """``rankshow`` value-binning (``grid_show.py:323-331``): np.digitize by
    break values; NaN stays NaN (encoded as -1 bin)."""
    out = np.digitize(array, breaks).astype(np.float64)
    out[np.isnan(array)] = np.nan
    return out


def knn_idw_interpolate(
    spec: GridSpec, points, values, k: int = 8, power: float = 2.0, eps: float = 1e-12
):
    """Whole-array kNN-IDW (the engine's approximate scale path): all but
    the k nearest gauges are masked to ∞ before weighting — replicating the
    engine's argpartition/inf-mask arithmetic exactly so per-cell values are
    bit-identical (Halton gauges have no distance ties by construction)."""
    X, Y = _to_points(spec)
    px, py = X.ravel(), Y.ravel()
    values = np.asarray(values, dtype=np.float64)
    out = np.empty(px.size)
    for s in range(0, px.size, 4096):
        e = min(s + 4096, px.size)
        d2 = (px[s:e, None] - points[None, :, 0]) ** 2 + (
            py[s:e, None] - points[None, :, 1]
        ) ** 2
        if k < values.size:
            part = np.argpartition(d2, k, axis=1)[:, k:]
            d2[np.arange(e - s)[:, None], part] = np.inf
        w = 1.0 / np.power(np.maximum(d2, eps), power / 2.0)
        w[~np.isfinite(w)] = 0.0
        out[s:e] = (w * values[None, :]).sum(axis=1) / w.sum(axis=1)
        hit = d2.min(axis=1) <= eps
        if hit.any():
            out[s:e][hit] = values[np.argmin(d2[hit], axis=1)]
    return out.reshape(spec.nrows, spec.ncols)


def knn_idw_canonical(
    spec: GridSpec,
    gx,
    gy,
    gv,
    gid,
    k: int = 8,
    power: float = 2.0,
    eps: float = 1e-12,
):
    """Whole-array EXACT kNN-IDW under the canonical-gauge-id contract of
    ``stages/knn_join.py``: per pixel, the k nearest gauges (unique — no
    distance ties by fixture construction), IDW terms summed in ASCENDING
    gauge-id order via ``np.sum(axis=1)`` over the (n, k) term matrix.

    Independent witness implementation: gauges sorted by **y** with a
    horizontal band window per pixel chunk, widened until every pixel's
    k-th candidate distance is within the band margin (the engine prunes
    along **x** — a different candidate enumeration arriving at the same
    provably-exact kNN set, then bit-identical arithmetic)."""
    gx = np.asarray(gx, np.float64)
    gy = np.asarray(gy, np.float64)
    gv = np.asarray(gv, np.float64)
    gid = np.asarray(gid, np.int64)
    yo = np.argsort(gy, kind="stable")
    gx, gy, gv, gid = gx[yo], gy[yo], gv[yo], gid[yo]
    n = gx.size
    k_eff = min(k, n)
    span = max(
        (gx.max() - gx.min()) * (gy[-1] - gy[0]) if n > 1 else 1.0, 1.0
    )
    m0 = max(2.0 * np.sqrt(span * k_eff / n), 1e-9)
    X, Y = _to_points(spec)
    px_all, py_all = X.ravel(), Y.ravel()
    out = np.empty(px_all.size)
    for s in range(0, px_all.size, 4096):
        e = min(s + 4096, px_all.size)
        px, py = px_all[s:e], py_all[s:e]
        xmin, xmax = float(px.min()), float(px.max())
        ymin, ymax = float(py.min()), float(py.max())
        m = m0
        while True:
            lo = int(np.searchsorted(gy, ymin - m))
            hi = int(np.searchsorted(gy, ymax + m, side="right"))
            inx = (gx[lo:hi] >= xmin - m) & (gx[lo:hi] <= xmax + m)
            cx = gx[lo:hi][inx]
            full = lo == 0 and hi == n and bool(inx.all())
            if cx.size >= k_eff:
                cy = gy[lo:hi][inx]
                cv = gv[lo:hi][inx]
                cg = gid[lo:hi][inx]
                d2 = (px[:, None] - cx[None, :]) ** 2 + (
                    py[:, None] - cy[None, :]
                ) ** 2
                if cx.size > k_eff:
                    part = np.argpartition(d2, k_eff - 1, axis=1)[:, :k_eff]
                else:
                    part = np.broadcast_to(
                        np.arange(k_eff), (px.size, k_eff)
                    ).copy()
                d2s = np.take_along_axis(d2, part, axis=1)
                if full or float(d2s.max()) <= m * m:
                    o = np.argsort(cg[part], axis=1, kind="stable")
                    d2o = np.take_along_axis(d2s, o, axis=1)
                    vo = np.take_along_axis(cv[part], o, axis=1)
                    w = 1.0 / np.power(np.maximum(d2o, eps), power * 0.5)
                    vals = (w * vo).sum(axis=1) / w.sum(axis=1)
                    jm = np.argmin(d2o, axis=1)
                    rr = np.arange(px.size)
                    hit = d2o[rr, jm] <= eps
                    if hit.any():
                        vals[hit] = vo[rr[hit], jm[hit]]
                    out[s:e] = vals
                    break
            if full:
                raise AssertionError("witness band exhausted the gauge set")
            m *= 2.0
    return out.reshape(spec.nrows, spec.ncols)


def hillshade(
    array: np.ndarray,
    azdeg: float = 315.0,
    altdeg: float = 45.0,
    vert_exag: float = 1.0,
    dx: float = 1.0,
    dy: float = 1.0,
) -> np.ndarray:
    """Whole-array hillshade witness — the illumination-intensity core of the
    reference's ``hillshade`` (``grid_show.py:136-158``), which delegates to
    matplotlib ``LightSource``: NaN → global nanmax pre-fill, gradient
    surface normals (``dy`` negated: row 0 is north), dot with the light
    direction, then a global min/max contrast stretch and [0, 1] clip.
    Returns float64 intensity; the engine's halo-tile path must bit-match."""
    z = array.copy()
    z[np.isnan(z)] = np.nanmax(z)
    e_dy, e_dx = np.gradient(vert_exag * z, -dy, dx)
    mag = np.sqrt(e_dx * e_dx + e_dy * e_dy + 1.0)
    az = np.radians(90.0 - azdeg)
    alt = np.radians(altdeg)
    d0 = np.cos(az) * np.cos(alt)
    d1 = np.sin(az) * np.cos(alt)
    d2 = np.sin(alt)
    intensity = (-e_dx * d0 - e_dy * d1 + d2) / mag
    imin, imax = float(intensity.min()), float(intensity.max())
    if (imax - imin) > 1e-6:
        intensity = (intensity - imin) / (imax - imin)
    return np.clip(intensity, 0.0, 1.0)


def slope_aspect(
    array: np.ndarray,
    dx: float = 1.0,
    dy: float = 1.0,
    vert_exag: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Whole-array slope/aspect witness — the gradient-derivative companions
    of ``hillshade`` (same ``np.gradient`` convention: ``dy`` negated, row 0
    is north). Unlike hillshade there is no NaN pre-fill: NODATA holes
    propagate through the central differences, so slope/aspect are NaN in
    the 1-px neighborhood of a hole (the engine's halo path reproduces the
    identical propagation).

    slope  = degrees(arctan(hypot(dz/d_east, dz/d_north)))
    aspect = downslope azimuth, degrees CLOCKWISE FROM NORTH in [0, 360):
             degrees(arctan2(-dz/d_east, -dz/d_north)) mod 360
             (flat cells: arctan2(0, 0) = 0 → aspect 0 by convention).
    Returns float64 planes; the engine's halo-tile path must bit-match."""
    e_dy, e_dx = np.gradient(vert_exag * array, -dy, dx)
    slope = np.degrees(np.arctan(np.hypot(e_dx, e_dy)))
    aspect = np.mod(np.degrees(np.arctan2(-e_dx, -e_dy)), 360.0)
    aspect = np.where(np.isnan(slope), np.nan, aspect)
    return slope, aspect


def curvature(array: np.ndarray, cs: float = 1.0) -> np.ndarray:
    """Whole-array Laplacian curvature witness (∇²z, the terrain second
    derivative — convexity/concavity): central second difference
    ``((up + dn) + (lf + rt) − 4·c) / cs²`` with a fixed add order so the
    tiled engine bit-matches. Derivative-family NaN convention: grid-edge
    cells (no central stencil) and the 1-px neighborhood of NODATA holes
    are NaN."""
    a = np.asarray(array, dtype=np.float64)
    h, w = a.shape
    p = np.full((h + 2, w + 2), np.nan)
    p[1:-1, 1:-1] = a
    up, dn = p[:-2, 1:-1], p[2:, 1:-1]
    lf, rt = p[1:-1, :-2], p[1:-1, 2:]
    return ((up + dn) + (lf + rt) - 4.0 * a) / (cs * cs)


def components_bfs(arr: np.ndarray):
    """Whole-array 4-connected components of equal finite values via plain
    BFS — the independent witness for the distributed vectorize (same
    contract as ``rasterio.features.shapes`` region grouping,
    ``Raster.py:735-778``). Returns a list of dicts (value, n_cells,
    min_gr, max_gr, min_gc, max_gc), unordered."""
    from collections import deque

    h, w = arr.shape
    seen = np.zeros((h, w), dtype=bool)
    finite = np.isfinite(arr)
    comps = []
    for r0 in range(h):
        for c0 in range(w):
            if not finite[r0, c0] or seen[r0, c0]:
                continue
            v = arr[r0, c0]
            q = deque([(r0, c0)])
            seen[r0, c0] = True
            n = 0
            mnr = mxr = r0
            mnc = mxc = c0
            while q:
                r, c = q.popleft()
                n += 1
                mnr = min(mnr, r)
                mxr = max(mxr, r)
                mnc = min(mnc, c)
                mxc = max(mxc, c)
                for rr, cc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
                    if (
                        0 <= rr < h
                        and 0 <= cc < w
                        and finite[rr, cc]
                        and not seen[rr, cc]
                        and arr[rr, cc] == v
                    ):
                        seen[rr, cc] = True
                        q.append((rr, cc))
            comps.append(
                {
                    "value": float(v),
                    "n_cells": n,
                    "min_gr": mnr,
                    "max_gr": mxr,
                    "min_gc": mnc,
                    "max_gc": mxc,
                }
            )
    return comps


def resample(array, spec: GridSpec, new_cellsize: float, method: str = "bilinear"):
    """Whole-array reference for ``stages.resample`` (``Raster.resample``
    header math, ``Raster.py:387-403``; kernel semantics documented in
    stages/resample.py since rasterio cannot run in this sandbox)."""
    from .stages.resample import _axis_fractional, resample_kernel

    factor = spec.cellsize / new_cellsize
    new_nrows = int(np.round(spec.nrows * factor))
    new_ncols = int(np.round(spec.ncols * factor))
    top = spec.yllcorner + spec.nrows * spec.cellsize
    new_spec = GridSpec(
        ncols=new_ncols,
        nrows=new_nrows,
        xllcorner=spec.xllcorner,
        yllcorner=top - new_nrows * new_cellsize,
        cellsize=float(new_cellsize),
        nodata=spec.nodata,
        crs=spec.crs,
    )
    fy = _axis_fractional(spec.nrows, new_nrows, np.arange(new_nrows))
    fx = _axis_fractional(spec.ncols, new_ncols, np.arange(new_ncols))
    out = resample_kernel(
        array, 0, 0, fy, fx, method,
        spec.nrows / new_nrows, spec.ncols / new_ncols, spec.nrows, spec.ncols,
    )
    return out, new_spec


# D8 neighbor table: ESRI direction codes in tie-break order (E first,
# then clockwise), offsets in (row, col) with row+1 = south (row 0 north).
_D8 = (
    (0, 1, 1.0, 1),      # E
    (1, 1, 2.0 ** 0.5, 2),   # SE
    (1, 0, 1.0, 4),      # S
    (1, -1, 2.0 ** 0.5, 8),  # SW
    (0, -1, 1.0, 16),    # W
    (-1, -1, 2.0 ** 0.5, 32),  # NW
    (-1, 0, 1.0, 64),    # N
    (-1, 1, 2.0 ** 0.5, 128),  # NE
)


def flow_dir_d8(array: np.ndarray) -> np.ndarray:
    """Whole-array D8 flow-direction witness (ESRI codes: E=1, SE=2, S=4,
    SW=8, W=16, NW=32, N=64, NE=128).

    Engine-defined semantics, documented because the reference's toolkit
    stops at the DEM-conditioning inputs of its flood model: direction of
    the steepest POSITIVE drop rate ``(z - z_n) / dist`` (dist in cells,
    √2 diagonal — uniform cellsize cancels); ties pick the FIRST code in
    the table order above; no strictly-lower in-grid finite neighbor
    (pit/flat) → 0; NaN cell → NaN; NaN and out-of-grid neighbors are not
    candidates (grid-edge cells drain inward or pit — no phantom outward
    flow). The engine's halo-tile path must bit-match."""
    h, w = array.shape
    p = np.pad(array.astype(np.float64), 1, constant_values=np.nan)
    z = p[1:-1, 1:-1]
    best = np.full((h, w), -np.inf)
    code = np.zeros((h, w))
    for dr, dc, dist, c in _D8:
        zn = p[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
        with np.errstate(invalid="ignore"):
            d = (z - zn) / dist
        d = np.where(np.isnan(d), -np.inf, d)
        take = d > best  # strict: the first code in table order wins ties
        best = np.where(take, d, best)
        code = np.where(take, float(c), code)
    out = np.where(best > 0, code, 0.0)
    out[np.isnan(z)] = np.nan
    return out


def fill_pits(array: np.ndarray) -> np.ndarray:
    """Whole-array single-cell pit-fill witness (DEM conditioning for D8).

    Engine-defined semantics: a PIT is a finite cell strictly lower than
    all eight of its neighbors, all of which must be in-grid and finite —
    global-edge cells drain outward and hole-adjacent cells drain into the
    hole, so neither is a pit. Each pit is raised to its neighborhood
    minimum (one pass — single-cell depressions only; basin-scale filling
    is an iterative/global op out of this operator's scope, documented).
    The engine's corner-halo tile path must bit-match."""
    h, w = array.shape
    p = np.pad(array.astype(np.float64), 1, constant_values=np.nan)
    z = p[1:-1, 1:-1]
    nmin = np.full((h, w), np.inf)
    all_finite = np.ones((h, w), dtype=bool)
    for dr, dc, _dist, _c in _D8:
        zn = p[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
        all_finite &= np.isfinite(zn)
        nmin = np.fmin(nmin, np.where(np.isnan(zn), np.inf, zn))
    pit = np.isfinite(z) & all_finite & (z < nmin)
    return np.where(pit, nmin, z)


def carve_depressions(
    z: np.ndarray, gr0: int, gc0: int, nrows: int, ncols: int
) -> np.ndarray:
    """Deterministically carve three compact-support depressions into a
    surface patch — the fill_depressions test input (the smooth fixture
    surface has no depressions at all, so filling it would be an identity
    no-op and the oracle would not exercise the solve). Parameterized by
    GLOBAL coordinates so the per-tile engine carve and the whole-array
    witness carve are the same elementwise arithmetic, hence bit-equal."""
    rr = (gr0 + np.arange(z.shape[0], dtype=np.float64))[:, None]
    cc = (gc0 + np.arange(z.shape[1], dtype=np.float64))[None, :]
    out = z.astype(np.float64, copy=True)
    scale = float(min(nrows, ncols))
    for fr, fc, frad, depth in (
        (0.30, 0.35, 0.08, 12.0),
        (0.62, 0.70, 0.10, 20.0),
        (0.75, 0.25, 0.06, 8.0),
    ):
        d2 = ((rr - fr * nrows) / (frad * scale)) ** 2 + (
            (cc - fc * ncols) / (frad * scale)
        ) ** 2
        out -= depth * np.maximum(0.0, 1.0 - d2)
    return out


def fill_depressions(array: np.ndarray) -> np.ndarray:
    """Whole-array depression-filling witness — classic Priority-Flood
    (Barnes 2014, "Priority-flood: an optimal depression-filling and
    watershed-labeling algorithm" — public literature, textbook form).

    Engine-defined semantics, consistent with ``fill_pits``: water drains
    off the GLOBAL grid edge and into NaN holes, so the drain set is every
    finite cell on the grid edge plus every finite cell 8-adjacent to a
    NaN. ``fill(c)`` = the minimal water level at which ``c`` drains =
    min over finite 8-connected paths from ``c`` to a drain of the max
    elevation along the path (including both endpoints); always ≥ z(c).
    NaN cells stay NaN. Pure max/min over input values — no arithmetic —
    so the engine's tiled contraction must match bit-exactly.

    Implementation: heap seeded with drains at their own z; pop the lowest
    level, fix it, push unvisited neighbors at ``max(level, z_n)``."""
    import heapq

    h, w = array.shape
    z = array.astype(np.float64)
    finite = np.isfinite(z)
    p = np.pad(finite, 1, constant_values=False)
    nan_adj = np.zeros((h, w), dtype=bool)
    for dr, dc, _dist, _c in _D8:
        nan_adj |= ~p[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
    drain = finite & (
        nan_adj
        | (np.arange(h)[:, None] == 0)
        | (np.arange(h)[:, None] == h - 1)
        | (np.arange(w)[None, :] == 0)
        | (np.arange(w)[None, :] == w - 1)
    )
    fill = np.full((h, w), np.nan)
    heap = [(float(z[r, c]), int(r), int(c)) for r, c in zip(*np.nonzero(drain))]
    heapq.heapify(heap)
    done = np.zeros((h, w), dtype=bool)
    while heap:
        lvl, r, c = heapq.heappop(heap)
        if done[r, c]:
            continue
        done[r, c] = True
        fill[r, c] = lvl
        for dr, dc, _dist, _cc in _D8:
            nr, nc = r + dr, c + dc
            if 0 <= nr < h and 0 <= nc < w and finite[nr, nc] and not done[nr, nc]:
                heapq.heappush(heap, (max(lvl, float(z[nr, nc])), nr, nc))
    return fill


def strahler(array: np.ndarray, threshold: float = 50.0) -> np.ndarray:
    """Whole-array Strahler stream-order witness over the channel network
    (cells with ``flow_accumulation ≥ threshold`` — the network is closed
    under D8 because accumulation is monotone downstream). Classic
    definition: a head cell (no stream inflow) is order 1; a cell's order
    is the max of its stream inflows' orders, +1 when that max arrives
    from two or more inflows. One descending-z sweep resolves the forest
    (inflows are strictly higher, hence already done). Non-stream finite
    cells are 0; NaN stays NaN."""
    h, w = array.shape
    acc = flow_accumulation(array)
    d = flow_dir_d8(array)
    off = {c: (dr, dc) for dr, dc, _dist, c in _D8}
    flat = array.ravel()
    df = d.ravel()
    stream = np.isfinite(acc.ravel()) & (acc.ravel() >= threshold)
    order_z = np.flatnonzero(stream)
    order_z = order_z[np.argsort(-flat[order_z], kind="stable")]
    mx = np.zeros(h * w, dtype=np.int64)  # max inflow order per cell
    cnt = np.zeros(h * w, dtype=np.int64)  # how many inflows carry it
    order = np.zeros(h * w, dtype=np.int64)
    for idx in order_z:
        o = 1 if mx[idx] == 0 else mx[idx] + (1 if cnt[idx] >= 2 else 0)
        order[idx] = o
        c = int(df[idx])
        if c:
            dr, dc = off[c]
            r = idx + dr * w + dc
            if o > mx[r]:
                mx[r] = o
                cnt[r] = 1
            elif o == mx[r]:
                cnt[r] += 1
    out = order.astype(np.float64)
    out[np.isnan(flat)] = np.nan
    return out.reshape(h, w)


def flow_length(array: np.ndarray) -> np.ndarray:
    """Whole-array downstream flow-path length witness: the D8 distance
    (cellsize units) from each cell to the terminal pit/flat where its
    flow ends — ``n_straight + n_diagonal·√2`` where the HOP COUNTS are
    exact integers accumulated downstream (ascending-z sweep: a cell's
    receiver is strictly lower, hence already resolved). Forming the
    value as ONE multiply-add of exact counts makes it independent of
    summation association — float chains like ``(...((√2+1)+√2)...)``
    round differently per grouping, which would make a tiled reproduction
    impossible; counts are associative, so the engine's contraction must
    match bit-exactly. Pits/flats are 0; NaN stays NaN."""
    h, w = array.shape
    d = flow_dir_d8(array)
    off = {c: (dr, dc) for dr, dc, _dist, c in _D8}
    flat = array.ravel()
    df = d.ravel()
    ns = np.zeros(h * w, dtype=np.int64)
    nd = np.zeros(h * w, dtype=np.int64)
    finite = np.flatnonzero(np.isfinite(flat))
    order = finite[np.argsort(flat[finite], kind="stable")]  # ascending z
    for idx in order:
        c = int(df[idx])
        if c:
            dr, dc = off[c]
            r = idx + dr * w + dc
            diag = dr != 0 and dc != 0
            ns[idx] = ns[r] + (0 if diag else 1)
            nd[idx] = nd[r] + (1 if diag else 0)
    out = ns.astype(np.float64) + nd.astype(np.float64) * np.sqrt(2.0)
    out[np.isnan(flat)] = np.nan
    return out.reshape(h, w)


def basin_labels(array: np.ndarray) -> np.ndarray:
    """Whole-array D8 basin (watershed) delineation witness: each finite
    cell is labeled with the GLOBAL FLAT INDEX (``r*ncols + c``) of the
    terminal cell of its D8 path — the pit/flat cell (``flow_dir_d8`` = 0)
    where its flow ends. NaN cells stay NaN.

    D8 flow strictly descends, so ASCENDING elevation is a topological
    order for terminals: a cell's receiver is strictly lower and therefore
    already carries its final label when the cell is visited — one sweep
    labels every path. Labels are exact in float64 to 2⁵³ cells (the
    engine's tiled path stores them as ``raw-f64`` for the same reason).
    The scalar reproduction the engine's contraction must match exactly."""
    h, w = array.shape
    d = flow_dir_d8(array)
    off = {c: (dr, dc) for dr, dc, _dist, c in _D8}
    flat = array.ravel()
    df = d.ravel()
    lab = np.arange(h * w, dtype=np.float64)
    lab[np.isnan(flat)] = np.nan
    finite = np.flatnonzero(np.isfinite(flat))
    order = finite[np.argsort(flat[finite], kind="stable")]  # ascending z
    for idx in order:
        c = int(df[idx])
        if c:
            dr, dc = off[c]
            lab[idx] = lab[idx + dr * w + dc]
    return lab.reshape(h, w)


def flow_accumulation(array: np.ndarray) -> np.ndarray:
    """Whole-array D8 flow-accumulation witness: the number of cells
    (weight 1 each, SELF INCLUDED) whose downstream D8 path passes through
    each cell. NaN cells stay NaN; pit/flat cells (``flow_dir_d8`` = 0)
    accumulate inflow but pass nothing on.

    D8 flow strictly descends (drop > 0), so descending elevation is a
    topological order: one pass pushing each cell's count to its receiver
    resolves every path — the scalar reproduction the engine's tiled
    Barnes-style two-pass must match exactly."""
    h, w = array.shape
    d = flow_dir_d8(array)
    acc = np.where(np.isnan(array), np.nan, 1.0)
    off = {c: (dr, dc) for dr, dc, _dist, c in _D8}
    flat = array.ravel()
    finite = np.flatnonzero(np.isfinite(flat))
    order = finite[np.argsort(-flat[finite], kind="stable")]
    af = acc.ravel()
    df = d.ravel()
    for idx in order:
        c = int(df[idx])
        if c == 0:
            continue
        dr, dc = off[c]
        af[idx + dr * w + dc] += af[idx]
    return af.reshape(h, w)


def focal(array: np.ndarray, stat: str = "mean") -> np.ndarray:
    """3×3 NaN-aware focal statistic (the GIS "focal statistics" family;
    whole-array single-process witness for ``stages/focal.py``).

    Window = the cell and its 8 neighbors, clipped at the grid edge
    (pad = NaN). A cell's output is NaN only when its whole window is
    NaN — focal statistics FILL 1-px holes (unlike the derivative
    family, where holes propagate). Arithmetic is float64 with a FIXED
    row-major shift order (nine sequential adds), so the result is
    bit-deterministic and the tiled engine can reproduce it exactly.
    ``stat``: mean | min | max | range | median (median is an order
    statistic over ≤ 9 values — order-free and exact; an even finite
    count averages the two middle values, one add + one halving, still
    bit-deterministic).
    """
    a = np.asarray(array, dtype=np.float64)
    h, w = a.shape
    p = np.full((h + 2, w + 2), np.nan)
    p[1:-1, 1:-1] = a
    if stat == "median":
        import warnings

        stack = np.stack(
            [p[dr : dr + h, dc : dc + w] for dr in (0, 1, 2) for dc in (0, 1, 2)]
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN window
            return np.nanmedian(stack, axis=0)
    acc = np.zeros((h, w))
    cnt = np.zeros((h, w), dtype=np.int64)
    mx = np.full((h, w), -np.inf)
    mn = np.full((h, w), np.inf)
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            v = p[dr : dr + h, dc : dc + w]
            ok = np.isfinite(v)
            acc = acc + np.where(ok, v, 0.0)
            cnt = cnt + ok
            mx = np.where(ok & (v > mx), v, mx)
            mn = np.where(ok & (v < mn), v, mn)
    hole = cnt == 0
    if stat == "mean":
        out = np.where(hole, np.nan, acc / np.maximum(cnt, 1))
    elif stat == "min":
        out = np.where(hole, np.nan, mn)
    elif stat == "max":
        out = np.where(hole, np.nan, mx)
    elif stat == "range":
        out = np.where(hole, np.nan, mx - mn)
    else:  # pragma: no cover - guarded by the stage
        raise ValueError(f"unknown focal stat {stat!r}")
    return out


def morph(array: np.ndarray, op: str = "open") -> np.ndarray:
    """3×3 grayscale morphology witness for ``stages/morph.py``:
    erode = focal min, dilate = focal max, open = erode→dilate,
    close = dilate→erode. Pure order statistics (no arithmetic), so the
    composition is bit-exact under any tiling and under the f32 plane
    round-trip (each pass only SELECTS input values)."""
    if op == "erode":
        return focal(array, "min")
    if op == "dilate":
        return focal(array, "max")
    if op == "open":
        return focal(focal(array, "min"), "max")
    if op == "close":
        return focal(focal(array, "max"), "min")
    raise ValueError(f"unknown morph op {op!r}")


def sobel_magnitude(array: np.ndarray) -> np.ndarray:
    """Sobel-magnitude witness for ``stages/sobel.py``: per cell,
    gx/gy are the fixed left-associative integer-weight sums of the
    module's exactness contract, magnitude = sqrt(gx*gx + gy*gy) in
    float64; STRICT 3x3 window — NaN wherever any window cell (even a
    zero-weight one) is missing; output rounded to f32 exactly as tile
    storage rounds it."""
    a = np.asarray(array, dtype=np.float64)
    h, wd = a.shape
    p = np.full((h + 2, wd + 2), np.nan)
    p[1:-1, 1:-1] = a
    ok = np.ones((h, wd), dtype=bool)
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            ok &= np.isfinite(p[dr : dr + h, dc : dc + wd])

    def z(dr, dc):
        v = p[dr : dr + h, dc : dc + wd]
        return np.where(np.isfinite(v), v, 0.0)

    gx = -1.0 * z(0, 0)
    for dr, dc, w in ((0, 2, 1.0), (1, 0, -2.0), (1, 2, 2.0),
                      (2, 0, -1.0), (2, 2, 1.0)):
        gx = gx + w * z(dr, dc)
    gy = -1.0 * z(0, 0)
    for dr, dc, w in ((0, 1, -2.0), (0, 2, -1.0), (2, 0, 1.0),
                      (2, 1, 2.0), (2, 2, 1.0)):
        gy = gy + w * z(dr, dc)
    mag = np.sqrt(gx * gx + gy * gy)
    return (
        np.where(ok, mag, np.nan).astype(np.float32).astype(np.float64)
    )


def binomial_blur(array: np.ndarray, passes: int = 2) -> np.ndarray:
    """Binomial-blur witness for ``stages/blur.py``: per pass, each cell
    is the fixed row-major left-to-right weighted sum of its 3×3 window
    (weights 1-2-1/2-4-2/1-2-1) divided by 16, computed in float64;
    STRICT window — NaN wherever any window cell is missing. Unlike the
    morphology witness, blur does arithmetic, so the f32 tile-storage
    round-trip BETWEEN passes is part of the semantics: each pass's
    result is rounded to float32 here exactly as tile storage rounds it
    in the engine (the final pass too — ``to_array`` reads the stored
    f32 plane)."""
    w = (1.0, 2.0, 1.0, 2.0, 4.0, 2.0, 1.0, 2.0, 1.0)
    a = np.asarray(array, dtype=np.float64)
    h, wd = a.shape
    for _ in range(passes):
        p = np.full((h + 2, wd + 2), np.nan)
        p[1:-1, 1:-1] = a
        acc = np.zeros((h, wd))
        ok = np.ones((h, wd), dtype=bool)
        k = 0
        for dr in (0, 1, 2):  # fixed row-major order — the shared contract
            for dc in (0, 1, 2):
                v = p[dr : dr + h, dc : dc + wd]
                fin = np.isfinite(v)
                ok &= fin
                acc = acc + w[k] * np.where(fin, v, 0.0)
                k += 1
        a = (
            np.where(ok, acc / 16.0, np.nan)
            .astype(np.float32)
            .astype(np.float64)
        )
    return a


def distance_transform(
    array: np.ndarray, threshold: float = 50.0, iters: int = 4
) -> np.ndarray:
    """Bounded Chebyshev distance transform witness for
    ``stages/distance.py``: distance (in cells, 8-connected) from every
    VALID cell to the nearest source cell (``z > threshold``), computed
    by ``iters`` min-plus sweeps — so distances are EXACT up to
    ``iters`` and cells further than that stay +inf ("unreached at this
    budget"). NaN (nodata) cells are excluded entirely: they are not
    sources, carry no distance, and paths may not cross them (matching
    a SQL reproduction that joins only non-NULL pixels). All values are
    small integers held in float64 — exact, no rounding concerns."""
    a = np.asarray(array, dtype=np.float64)
    invalid = np.isnan(a)
    d = np.where(a > threshold, 0.0, np.inf)
    d[invalid] = np.nan
    h, w = d.shape
    for _ in range(iters):
        p = np.full((h + 2, w + 2), np.nan)
        p[1:-1, 1:-1] = d
        best = d.copy()
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                if dr == 1 and dc == 1:
                    continue
                # fmin ignores a NaN neighbor; +1 keeps inf as inf
                best = np.fmin(best, p[dr : dr + h, dc : dc + w] + 1.0)
        best[invalid] = np.nan
        d = best
    return d


def pyramid_reduce(array: np.ndarray) -> np.ndarray:
    """One 2× overview level witness for ``stages/pyramid.py``: parent
    (R, C) averages the finite cells among children (2R..2R+1,
    2C..2C+1) under the module's fixed left-associative sum contract,
    with the f32 storage round-trip applied to the OUTPUT (the input is
    assumed already f32-valued, as decoded tiles are)."""
    a = np.asarray(array, dtype=np.float64)
    h, w = a.shape
    ph, pw = (h + 1) // 2, (w + 1) // 2
    pad = np.full((2 * ph, 2 * pw), np.nan)
    pad[:h, :w] = a
    t00 = pad[0::2, 0::2]
    t01 = pad[0::2, 1::2]
    t10 = pad[1::2, 0::2]
    t11 = pad[1::2, 1::2]
    f00, f01 = np.isfinite(t00), np.isfinite(t01)
    f10, f11 = np.isfinite(t10), np.isfinite(t11)
    s = (
        (np.where(f00, t00, 0.0) + np.where(f01, t01, 0.0))
        + np.where(f10, t10, 0.0)
    ) + np.where(f11, t11, 0.0)
    n = (
        f00.astype(np.int64) + f01.astype(np.int64)
        + f10.astype(np.int64) + f11.astype(np.int64)
    )
    with np.errstate(invalid="ignore"):
        out = np.where(n > 0, s / np.maximum(n, 1), np.nan)
    return out.astype(np.float32).astype(np.float64)
