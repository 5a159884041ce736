"""Resampling with halo exchange: all 13 ``Raster.resample`` methods.

``Raster.resample`` (``Raster.py:369-407``) delegates to rasterio/GDAL with
13 methods (``Raster.py:382-384``); the engine implements every one as a
pure-numpy kernel with the GDAL pixel-space mapping: target pixel i samples
fractional source coordinate ``(i + 0.5) · (src_dim / new_dim) − 0.5``.

Semantics (engine-defined, documented because rasterio cannot run here):

Point kernels (separable convolution at the fractional coordinate,
edge-clamped; a NaN neighbour with non-zero weight propagates NaN):
- ``nearest``: round of the fractional coordinate (GDAL convention — note
  this differs from ``grid_resample_nearest``'s map2sub rounding, exactly
  as the reference's two nearest paths differ).
- ``bilinear``: 4-neighbour weighted mean.
- ``cubic``: Keys bicubic convolution, a = −0.5, 4×4 support.
- ``cubic_spline``: cubic B-spline weights (smoothing approximation, no
  prefilter), 4×4 support.
- ``lanczos``: a = 3 windowed sinc, 6×6 support, truncated-weight
  renormalization.

Box kernels (source index box ``[floor(i·s), ceil((i+1)·s))`` per axis,
NaN-ignoring; all-NaN box → NaN):
- ``average``: mean, computed with a summed-area table (one cumsum over
  the assembled window, O(1) per target pixel — no per-pixel Python loop).
- ``max`` / ``min`` / ``med`` / ``q1`` / ``q3``: order statistics per box
  (vectorized per box; quartiles use numpy's linear interpolation).
- ``mode``: most frequent value, ties → smallest value.
- ``gauss``: Gaussian-weighted mean over the box, σ = max(s, 1)/2 per
  axis, weights centred on the fractional coordinate.

Distribution: the same fragment shuffle as ``regrid_nearest`` — each source
tile emits, PER overlapping target tile, only the sub-rectangle (+ the
method's halo) that that target tile needs (round-1 shipped the whole tile
to every overlapping target — ~4× shuffle amplification, now gone);
``groupby(target cell)`` assembles the window, the kernel runs per target
tile. The output header follows the reference: dims
``round(dim · cs_old/cs_new)``, top-left corner preserved
(``Raster.py:387-403``).

Exchange: ``exchange="files"`` (default) replaces the groupby sort barrier
with the map-side bucket-file exchange of ``stages/exchange.py`` (emit
streams at full width; measured 1.2-2× end-to-end vs the sort at 8-32
CPUs, bit-identical output); ``"sort"`` keeps Ray's shuffle for
deployments without a cluster-shared exchange directory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..grid import GridSpec, TileScheme, morton_encode, tile_id
from ..sources.tiles import TileSet
from .decode import iter_tiles
from .mosaic import _frag_table
from ..codecs import decode, encode, phash64

__all__ = ["resample", "resample_kernel", "METHODS", "POINT_METHODS", "BOX_METHODS", "method_halo"]


def _axis_fractional(src_n: int, new_n: int, t_idx: np.ndarray) -> np.ndarray:
    scale = src_n / new_n
    return (t_idx + 0.5) * scale - 0.5


POINT_METHODS = ("nearest", "bilinear", "cubic", "cubic_spline", "lanczos")
BOX_METHODS = ("average", "max", "min", "med", "q1", "q3", "mode", "gauss")
METHODS = POINT_METHODS + BOX_METHODS


def method_halo(method: str, sy: float, sx: float) -> int:
    if method in ("nearest", "bilinear"):
        return 1
    if method in ("cubic", "cubic_spline"):
        return 2
    if method == "lanczos":
        return 3
    return int(np.ceil(max(sy, sx))) + 1  # box methods


def _keys_cubic(t: np.ndarray) -> np.ndarray:
    """Keys bicubic weight for offsets t in [-2, 2], a = -0.5."""
    a = -0.5
    at = np.abs(t)
    w = np.where(
        at <= 1.0,
        (a + 2) * at**3 - (a + 3) * at**2 + 1.0,
        np.where(at < 2.0, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )
    return w


def _bspline3(t: np.ndarray) -> np.ndarray:
    """Cubic B-spline weight for offsets t in [-2, 2]."""
    at = np.abs(t)
    return np.where(
        at <= 1.0,
        (4.0 - 6.0 * at**2 + 3.0 * at**3) / 6.0,
        np.where(at < 2.0, (2.0 - at) ** 3 / 6.0, 0.0),
    )


def _lanczos3(t: np.ndarray) -> np.ndarray:
    """Lanczos a=3 windowed sinc for offsets t in (-3, 3)."""
    return np.where(np.abs(t) < 3.0, np.sinc(t) * np.sinc(t / 3.0), 0.0)


def _separable_conv(
    win, win_r0, win_c0, fy, fx, taps: int, wfn, src_nrows, src_ncols, renorm: bool
) -> np.ndarray:
    """Separable convolution: for each axis, ``taps`` integer sample rows
    around floor(f) with weights wfn(offset). Edge-clamped; zero-weight
    neighbours contribute nothing (so NaN outside the support is inert);
    NaN under a non-zero weight propagates."""
    lo = -(taps // 2 - 1)  # e.g. taps=4 → offsets -1..2; taps=6 → -2..3
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    wy_tot = np.zeros(fy.size)
    wx_tot = np.zeros(fx.size)
    wys, wxs, rys, cxs = [], [], [], []
    for k in range(lo, lo + taps):
        wy = wfn(fy - (y0 + k))
        wx = wfn(fx - (x0 + k))
        wy_tot += wy
        wx_tot += wx
        wys.append(wy)
        wxs.append(wx)
        rys.append(np.clip(np.clip(y0 + k, 0, src_nrows - 1) - win_r0,
                           0, win.shape[0] - 1))
        cxs.append(np.clip(np.clip(x0 + k, 0, src_ncols - 1) - win_c0,
                           0, win.shape[1] - 1))
    if renorm:
        wys = [w / wy_tot for w in wys]
        wxs = [w / wx_tot for w in wxs]
    # true two-pass separable form: taps row gathers + taps column gathers
    # over a (fy, win_w) float64 intermediate, instead of taps² full-size
    # 2-D gathers (36 → 12 passes for lanczos — the DRAM-bound hot loop).
    # Per-pixel terms and NaN propagation match the 2-D form: a (ky, kx)
    # term contributes iff wy≠0 AND wx≠0 (weights are O(1), so a product
    # of nonzero weights can't underflow to zero), and the result is
    # bit-identical at every win_r0/win_c0 offset because each column's
    # inner sum runs in the same ky order regardless of the window.
    inter = np.zeros((fy.size, win.shape[1]))
    for ky in range(taps):
        wy = wys[ky][:, None]
        v = win[rys[ky], :]
        inter += np.where(wy != 0.0, v * wy, 0.0)
    out = np.zeros((fy.size, fx.size))
    for kx in range(taps):
        wx = wxs[kx][None, :]
        v = inter[:, cxs[kx]]
        out += np.where(wx != 0.0, v * wx, 0.0)
    return out


def _box_edges(fy, fx, sy, sx, src_nrows, src_ncols):
    """Source index box per target pixel: [floor(t·s), ceil((t+1)·s))."""
    ty = np.round((fy + 0.5) / sy - 0.5).astype(np.int64)
    tx = np.round((fx + 0.5) / sx - 0.5).astype(np.int64)
    rlo = np.clip(np.floor(ty * sy).astype(np.int64), 0, src_nrows)
    rhi = np.clip(np.ceil((ty + 1.0) * sy).astype(np.int64), 0, src_nrows)
    clo = np.clip(np.floor(tx * sx).astype(np.int64), 0, src_ncols)
    chi = np.clip(np.ceil((tx + 1.0) * sx).astype(np.int64), 0, src_ncols)
    return rlo, rhi, clo, chi


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
    if method == "cubic":
        return _separable_conv(
            win, win_r0, win_c0, fy, fx, 4, _keys_cubic, src_nrows, src_ncols, False
        )
    if method == "cubic_spline":
        return _separable_conv(
            win, win_r0, win_c0, fy, fx, 4, _bspline3, src_nrows, src_ncols, False
        )
    if method == "lanczos":
        return _separable_conv(
            win, win_r0, win_c0, fy, fx, 6, _lanczos3, src_nrows, src_ncols, True
        )
    if method in BOX_METHODS:
        rlo, rhi, clo, chi = _box_edges(fy, fx, sy, sx, src_nrows, src_ncols)
        rlow = np.clip(rlo - win_r0, 0, win.shape[0])
        rhiw = np.clip(rhi - win_r0, 0, win.shape[0])
        clow = np.clip(clo - win_c0, 0, win.shape[1])
        chiw = np.clip(chi - win_c0, 0, win.shape[1])
        if method == "average":
            # summed-area table: O(1) per target pixel, no Python loop
            finite = np.isfinite(win)
            z = np.where(finite, win, 0.0)
            Sz = np.zeros((win.shape[0] + 1, win.shape[1] + 1))
            Sc = np.zeros_like(Sz)
            # explicit float64 accumulator: with an f32 window the cumsum
            # must not accumulate in f32, or sums drift vs the f64 path
            Sz[1:, 1:] = z.cumsum(axis=0, dtype=np.float64).cumsum(axis=1)
            Sc[1:, 1:] = finite.astype(np.float64).cumsum(axis=0).cumsum(axis=1)

            def boxsum(S):
                return (
                    S[np.ix_(rhiw, chiw)]
                    - S[np.ix_(rlow, chiw)]
                    - S[np.ix_(rhiw, clow)]
                    + S[np.ix_(rlow, clow)]
                )

            cnt = boxsum(Sc)
            with np.errstate(invalid="ignore", divide="ignore"):
                out = boxsum(Sz) / cnt
            out[cnt <= 0] = np.nan
            return out
        out = np.full((fy.size, fx.size), np.nan)
        if method == "gauss":
            sig_y = max(sy, 1.0) / 2.0
            sig_x = max(sx, 1.0) / 2.0
        for i in range(fy.size):
            sl_rows = win[rlow[i] : rhiw[i]]
            for j in range(fx.size):
                box = sl_rows[:, clow[j] : chiw[j]]
                if box.size == 0:
                    continue
                m = np.isfinite(box)
                if not m.any():
                    continue
                # promote per-box values so order statistics (percentile
                # interpolation) match the f64 path exactly under f32 windows
                v = box[m].astype(np.float64, copy=False)
                if method == "max":
                    out[i, j] = v.max()
                elif method == "min":
                    out[i, j] = v.min()
                elif method == "med":
                    out[i, j] = np.percentile(v, 50.0)
                elif method == "q1":
                    out[i, j] = np.percentile(v, 25.0)
                elif method == "q3":
                    out[i, j] = np.percentile(v, 75.0)
                elif method == "mode":
                    vals, counts = np.unique(v, return_counts=True)
                    out[i, j] = vals[np.argmax(counts)]  # ties → smallest
                elif method == "gauss":
                    rr = np.arange(rlow[i], rhiw[i]) + win_r0
                    cc = np.arange(clow[j], chiw[j]) + win_c0
                    wy = np.exp(-0.5 * ((rr - fy[i]) / sig_y) ** 2)
                    wx = np.exp(-0.5 * ((cc - fx[j]) / sig_x) ** 2)
                    w = (wy[:, None] * wx[None, :])[m]
                    out[i, j] = (w * v).sum() / w.sum()
        return out
    raise ValueError(
        f"unsupported method {method!r} (supported: {', '.join(METHODS)})"
    )


def resample(
    ts: TileSet,
    new_cellsize: float,
    method: str = "bilinear",
    tile_h: int = 64,
    tile_w: int = 64,
    shuffle_blocks: int | None = None,
    exchange: str = "files",
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
    halo = method_halo(method, sy, sx)

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

    def _needed_range(f: np.ndarray, g0: int, g1: int) -> tuple[int, int]:
        """Source index range [lo, hi) this target-row/col set needs from a
        tile spanning [g0, g1), including the method halo."""
        lo = max(int(np.floor(f.min())) - halo, g0)
        hi = min(int(np.ceil(f.max())) + halo + 1, g1)
        return lo, hi

    def emit(batch: pa.Table) -> pa.Table:
        out = []
        # f32 planes: lossless by codec contract, half the decode+slice
        # traffic; raw-f32 payloads decode zero-copy
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            t_rows = _targets_for(src.nrows, new_nrows, info.gr0, info.gr0 + info.h, sy)
            t_cols = _targets_for(src.ncols, new_ncols, info.gc0, info.gc0 + info.w, sx)
            if t_rows.size == 0 or t_cols.size == 0:
                continue
            tt_r = t_rows // tile_h
            tt_c = t_cols // tile_w
            # per target tile, ship ONLY the needed sub-rectangle (+ halo):
            # round-1 shipped the whole source tile to every overlapping
            # target → ~4× payload amplification at 2×2 overlap
            for utr in np.unique(tt_r):
                fy = _axis_fractional(src.nrows, new_nrows, t_rows[tt_r == utr])
                r_lo, r_hi = _needed_range(fy, info.gr0, info.gr0 + info.h)
                if r_hi <= r_lo:
                    continue
                for utc in np.unique(tt_c):
                    fx = _axis_fractional(src.ncols, new_ncols, t_cols[tt_c == utc])
                    c_lo, c_hi = _needed_range(fx, info.gc0, info.gc0 + info.w)
                    if c_hi <= c_lo:
                        continue
                    frag = arr[
                        r_lo - info.gr0 : r_hi - info.gr0,
                        c_lo - info.gc0 : c_hi - info.gc0,
                    ]
                    out.append(
                        {
                            "tkey": int(morton_encode(int(utr), int(utc))),
                            "t_tr": int(utr),
                            "t_tc": int(utc),
                            "prio": 0,
                            "fr0": 0,
                            "fc0": 0,
                            "fh": frag.shape[0],
                            "fw": frag.shape[1],
                            "payload": encode(np.ascontiguousarray(frag), "raw-f32"),
                            "src_r0": r_lo,
                            "src_c0": c_lo,
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
        # f32 window: the kernel promotes to float64 at each weighted
        # product, so outputs stay bit-identical to an f64 window while the
        # gather traffic (the DRAM-bound cost) halves
        win = np.full(
            (int((r0s + fhs).max()) - win_r0, int((c0s + fws).max()) - win_c0),
            np.nan,
            dtype=np.float32,
        )
        for i in range(g.num_rows):
            frag = decode(
                g["payload"][i].as_py(), int(fhs[i]), int(fws[i]), "raw-f32",
                dtype=np.float32,
            )
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
    if exchange == "files":
        # map-side bucket-file exchange: no sort barrier throttling the
        # emit stage (see stages/exchange.py)
        from .exchange import fragment_exchange

        built = fragment_exchange(frags, build, key="tkey")
        return TileSet(ds=built, grid=new_spec)
    if shuffle_blocks is None:
        from .cc import auto_shuffle_blocks

        shuffle_blocks = auto_shuffle_blocks(floor=64)
    frags = frags.repartition(shuffle_blocks)
    built = frags.groupby("tkey").map_groups(build, batch_format="pyarrow")
    return TileSet(ds=built, grid=new_spec)
