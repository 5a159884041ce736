"""Resampling with halo exchange: bilinear / average / nearest.

``Raster.resample`` (``Raster.py:369-407``) delegates to rasterio/GDAL with
13 methods; the engine's minimum slice ships ``nearest``, ``bilinear`` and
``average`` (the three the reference's own workflows use — merge's default
is bilinear, ``Raster.py:884-886``) as pure-numpy kernels with the GDAL
pixel-space mapping: target pixel i samples fractional source coordinate
``(i + 0.5) · (src_dim / new_dim) − 0.5``.

Semantics (engine-defined, documented because rasterio cannot run here):
- ``bilinear``: 4-neighbour weighted mean, edge-clamped; NaN in any
  contributing neighbour propagates NaN (float nodata behavior).
- ``average``: NaN-ignoring mean over the source index box
  ``[floor(i·s), ceil((i+1)·s))``; all-NaN box → NaN.
- ``nearest``: round of the fractional coordinate (GDAL convention — note
  this differs from ``grid_resample_nearest``'s map2sub rounding, exactly
  as the reference's two nearest paths differ).

Distribution: the same fragment shuffle as ``regrid_nearest`` — each source
tile emits the sub-rectangle (+1-pixel halo for bilinear) that each target
tile needs, ``groupby(target cell)`` assembles the window, the kernel runs
per target tile. The output header follows the reference: dims
``round(dim · cs_old/cs_new)``, top-left corner preserved
(``Raster.py:387-403``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..grid import GridSpec, TileScheme, morton_encode, tile_id
from ..sources.tiles import TileSet
from .decode import iter_tiles
from .mosaic import _frag_table
from ..codecs import decode, encode, phash64

__all__ = ["resample", "resample_kernel"]


def _axis_fractional(src_n: int, new_n: int, t_idx: np.ndarray) -> np.ndarray:
    scale = src_n / new_n
    return (t_idx + 0.5) * scale - 0.5


def resample_kernel(
    win: np.ndarray, win_r0: int, win_c0: int, fy: np.ndarray, fx: np.ndarray,
    method: str, sy: float, sx: float, src_nrows: int, src_ncols: int
) -> np.ndarray:
    """Apply one resampling method given a source window and the target's
    fractional source coords (fy per row, fx per col)."""
    if method == "nearest":
        ri = np.clip(np.round(fy).astype(np.int64), 0, src_nrows - 1) - win_r0
        ci = np.clip(np.round(fx).astype(np.int64), 0, src_ncols - 1) - win_c0
        return win[np.ix_(np.clip(ri, 0, win.shape[0] - 1),
                          np.clip(ci, 0, win.shape[1] - 1))]
    if method == "bilinear":
        y0 = np.clip(np.floor(fy).astype(np.int64), 0, src_nrows - 1)
        x0 = np.clip(np.floor(fx).astype(np.int64), 0, src_ncols - 1)
        y1 = np.clip(y0 + 1, 0, src_nrows - 1)
        x1 = np.clip(x0 + 1, 0, src_ncols - 1)
        wy = np.clip(fy - y0, 0.0, 1.0)[:, None]
        wx = np.clip(fx - x0, 0.0, 1.0)[None, :]
        ry0 = np.clip(y0 - win_r0, 0, win.shape[0] - 1)
        ry1 = np.clip(y1 - win_r0, 0, win.shape[0] - 1)
        cx0 = np.clip(x0 - win_c0, 0, win.shape[1] - 1)
        cx1 = np.clip(x1 - win_c0, 0, win.shape[1] - 1)
        a = win[np.ix_(ry0, cx0)]
        b = win[np.ix_(ry0, cx1)]
        c = win[np.ix_(ry1, cx0)]
        d = win[np.ix_(ry1, cx1)]

        def term(v, w):
            # a zero-weight neighbour must not contribute — not even NaN —
            # so exact-integer coords reduce to the identity gather
            return np.where(w > 0, v * w, 0.0)

        return (
            term(a, (1 - wy) * (1 - wx))
            + term(b, (1 - wy) * wx)
            + term(c, wy * (1 - wx))
            + term(d, wy * wx)
        )
    if method == "average":
        out = np.empty((fy.size, fx.size))
        # recover the GLOBAL target indices from the fractional coords
        # (fy = (t + 0.5)·s − 0.5), then box edges in source index space
        ty = np.round((fy + 0.5) / sy - 0.5).astype(np.int64)
        tx = np.round((fx + 0.5) / sx - 0.5).astype(np.int64)
        rlo = np.clip(np.floor(ty * sy).astype(np.int64), 0, src_nrows)
        rhi = np.clip(np.ceil((ty + 1.0) * sy).astype(np.int64), 0, src_nrows)
        clo = np.clip(np.floor(tx * sx).astype(np.int64), 0, src_ncols)
        chi = np.clip(np.ceil((tx + 1.0) * sx).astype(np.int64), 0, src_ncols)
        for i in range(fy.size):
            rows = win[rlo[i] - win_r0 : rhi[i] - win_r0]
            for j in range(fx.size):
                box = rows[:, clo[j] - win_c0 : chi[j] - win_c0]
                m = np.isfinite(box)
                out[i, j] = box[m].mean() if m.any() else np.nan
        return out
    raise ValueError(f"unsupported method {method!r} (min slice: nearest, "
                     "bilinear, average — SURVEY.md §2.6)")


def resample(
    ts: TileSet,
    new_cellsize: float,
    method: str = "bilinear",
    tile_h: int = 64,
    tile_w: int = 64,
    shuffle_blocks: int = 64,
) -> TileSet:
    src = ts.grid
    factor = src.cellsize / new_cellsize
    new_nrows = int(np.around(src.nrows * factor))
    new_ncols = int(np.around(src.ncols * factor))
    top = src.yllcorner + src.nrows * src.cellsize
    new_spec = GridSpec(
        ncols=new_ncols,
        nrows=new_nrows,
        xllcorner=src.xllcorner,
        yllcorner=top - new_nrows * new_cellsize,
        cellsize=float(new_cellsize),
        nodata=src.nodata,
        crs=src.crs,
    )
    target = TileScheme(grid=new_spec, tile_h=tile_h, tile_w=tile_w)
    sy = src.nrows / new_nrows
    sx = src.ncols / new_ncols
    grid = ts.grid
    # halo: bilinear needs floor/floor+1; average needs the index box
    halo = 1 if method in ("bilinear", "nearest") else int(np.ceil(max(sy, sx))) + 1

    def _targets_for(axis_n_src, axis_n_new, g0, g1, s):
        """Target indices whose needed source range touches [g0, g1)."""
        # needed src for target t: floor(f(t))-halo .. ceil(f(t))+halo
        t_lo = int(np.floor((g0 - halo + 0.5 - 0.5 * s + 0.0) / s)) - 2
        t_hi = int(np.ceil((g1 + halo) / s)) + 2
        t_lo = max(t_lo, 0)
        t_hi = min(t_hi, axis_n_new - 1)
        if t_hi < t_lo:
            return np.empty(0, dtype=np.int64)
        t = np.arange(t_lo, t_hi + 1)
        f = _axis_fractional(axis_n_src, axis_n_new, t)
        lo_need = np.clip(np.floor(f) - halo, 0, axis_n_src - 1)
        hi_need = np.clip(np.ceil(f) + halo, 0, axis_n_src - 1)
        keep = (hi_need >= g0) & (lo_need < g1)
        return t[keep]

    def emit(batch: pa.Table) -> pa.Table:
        out = []
        for info, arr in iter_tiles(batch, grid):
            t_rows = _targets_for(src.nrows, new_nrows, info.gr0, info.gr0 + info.h, sy)
            t_cols = _targets_for(src.ncols, new_ncols, info.gc0, info.gc0 + info.w, sx)
            if t_rows.size == 0 or t_cols.size == 0:
                continue
            tt_r = t_rows // tile_h
            tt_c = t_cols // tile_w
            for utr in np.unique(tt_r):
                for utc in np.unique(tt_c):
                    out.append(
                        {
                            "tkey": int(morton_encode(int(utr), int(utc))),
                            "t_tr": int(utr),
                            "t_tc": int(utc),
                            "prio": 0,
                            "fr0": 0,
                            "fc0": 0,
                            "fh": arr.shape[0],
                            "fw": arr.shape[1],
                            "payload": encode(arr, "raw-f32"),
                            "src_r0": info.gr0,
                            "src_c0": info.gc0,
                        }
                    )
        return _frag_table(out)

    def build(g: pa.Table) -> pa.Table:
        t_tr = int(g["t_tr"][0].as_py())
        t_tc = int(g["t_tc"][0].as_py())
        th, tw = target.tile_shape(t_tr, t_tc)
        tr0, tc0 = target.tile_origin_rc(t_tr, t_tc)
        fy = _axis_fractional(src.nrows, new_nrows, np.arange(tr0, tr0 + th))
        fx = _axis_fractional(src.ncols, new_ncols, np.arange(tc0, tc0 + tw))
        r0s = g["src_r0"].to_numpy(zero_copy_only=False)
        c0s = g["src_c0"].to_numpy(zero_copy_only=False)
        fhs = g["fh"].to_numpy(zero_copy_only=False)
        fws = g["fw"].to_numpy(zero_copy_only=False)
        win_r0 = int(r0s.min())
        win_c0 = int(c0s.min())
        win = np.full(
            (int((r0s + fhs).max()) - win_r0, int((c0s + fws).max()) - win_c0),
            np.nan,
        )
        for i in range(g.num_rows):
            frag = decode(g["payload"][i].as_py(), int(fhs[i]), int(fws[i]), "raw-f32")
            rr = int(r0s[i]) - win_r0
            cc = int(c0s[i]) - win_c0
            win[rr : rr + int(fhs[i]), cc : cc + int(fws[i])] = frag
        canvas = resample_kernel(
            win, win_r0, win_c0, fy, fx, method, sy, sx, src.nrows, src.ncols
        )
        img = tile_id(t_tr, t_tc)
        buf = encode(canvas, "raw-f32")
        truth = decode(buf, *canvas.shape, "raw-f32")
        return pa.table(
            {
                "image_id": pa.array([img], pa.string()),
                "bytes": pa.array([buf], pa.binary()),
                "w": pa.array([canvas.shape[1]], pa.int32()),
                "h": pa.array([canvas.shape[0]], pa.int32()),
                "fmt": pa.array(["raw-f32"], pa.string()),
                "caption": pa.array(
                    [f"DEM tile {img} cellsize={new_spec.cellsize} crs={new_spec.crs}"],
                    pa.string(),
                ),
                "phash": pa.array([phash64(truth)], pa.int64()),
                "tile_row": pa.array([t_tr], pa.int32()),
                "tile_col": pa.array([t_tc], pa.int32()),
                "gr0": pa.array([tr0], pa.int32()),
                "gc0": pa.array([tc0], pa.int32()),
                "cell": pa.array([int(morton_encode(t_tr, t_tc))], pa.int64()),
            }
        )

    frags = ts.ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
    frags = frags.repartition(shuffle_blocks)
    built = frags.groupby("tkey").map_groups(build, batch_format="pyarrow")
    return TileSet(ds=built, grid=new_spec)
