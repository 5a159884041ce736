"""Overview pyramid: chained 2× box reductions — the COG/tile-server
overview builder (``gdaladdo``-shaped; the reference's ``Raster.resample``
covers general factors, `spatial_analysis.py:300-`, but a serving
pipeline builds power-of-two overviews, so the 2× reduce is its own
first-class stage with an exact contract).

Each parent cell covers children (2R, 2C)…(2R+1, 2C+1) in GLOBAL pixel
coordinates; every child pixel contributes to exactly ONE parent, so the
emit ships each pixel once (no halo, no overlap — cheaper than the
general resample path). Parent tiles are rebuilt via the same
map-side bucket-file fragment exchange as resample
(``stages/exchange.py``); the reduce assembles the full child window
for its parent tile BEFORE reducing, so the result is independent of how
fragments split across source tiles.

Exactness contract (what lets ``pyramid_stats`` carry a genuinely
INDEPENDENT SQL oracle): per parent cell, with w_ij = float64(child ij)
where finite else 0.0 and n = the count of finite children,

    s = ((w00 + w01) + w10) + w11      (fixed left-associative order)
    z = s / n   if n > 0 else NaN

evaluated in float64 over the f32-stored children, then rounded to f32
by tile storage (``CAST AS FLOAT`` on the SQL side). Integer-free
divisions and the fixed order make every cell bit-reproducible by the
identically-parenthesized SQL expression; chaining levels re-applies the
same contract to the previous level's f32 output.

Scale: level k holds corpus/4^k pixels; materializing every level totals
< corpus/3 extra object-store footprint (geometric series), which is the
price of feeding each level to BOTH its stats pass and the next level
without recomputing the exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import decode, encode, phash64
from ..grid import GridSpec, TileScheme, morton_encode, tile_id
from ..sources.tiles import TileSet
from .decode import iter_tiles
from .mosaic import _frag_table

__all__ = ["pyramid_level", "reduce2x"]


def reduce2x(win: np.ndarray) -> np.ndarray:
    """Reduce an even-shaped float window by 2× under the module's exact
    contract. NaN marks missing children (holes / beyond the grid edge)."""
    a = win.astype(np.float64)
    t00 = a[0::2, 0::2]
    t01 = a[0::2, 1::2]
    t10 = a[1::2, 0::2]
    t11 = a[1::2, 1::2]
    f00 = np.isfinite(t00)
    f01 = np.isfinite(t01)
    f10 = np.isfinite(t10)
    f11 = np.isfinite(t11)
    # fixed left-associative order IS the contract
    s = (
        (np.where(f00, t00, 0.0) + np.where(f01, t01, 0.0))
        + np.where(f10, t10, 0.0)
    ) + np.where(f11, t11, 0.0)
    n = (
        f00.astype(np.int64) + f01.astype(np.int64)
        + f10.astype(np.int64) + f11.astype(np.int64)
    )
    with np.errstate(invalid="ignore"):
        return np.where(n > 0, s / np.maximum(n, 1), np.nan)


def pyramid_level(
    ts: TileSet,
    tile_h: int = 64,
    tile_w: int = 64,
    exchange: str = "files",
    shuffle_blocks: int | None = None,
) -> TileSet:
    """One 2× overview level: parent grid ceil(nrows/2) × ceil(ncols/2),
    re-tiled at ``tile_h``×``tile_w``."""
    src = ts.grid
    new_nrows = (src.nrows + 1) // 2
    new_ncols = (src.ncols + 1) // 2
    top = src.yllcorner + src.nrows * src.cellsize
    new_spec = GridSpec(
        ncols=new_ncols,
        nrows=new_nrows,
        xllcorner=src.xllcorner,
        yllcorner=top - new_nrows * (2.0 * src.cellsize),
        cellsize=2.0 * src.cellsize,
        nodata=src.nodata,
        crs=src.crs,
    )
    target = TileScheme(grid=new_spec, tile_h=tile_h, tile_w=tile_w)
    grid = ts.grid

    def emit(batch: pa.Table) -> pa.Table:
        out = []
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            # parent rows/cols this child tile touches
            pr0, pr1 = info.gr0 >> 1, (info.gr0 + info.h - 1) >> 1
            pc0, pc1 = info.gc0 >> 1, (info.gc0 + info.w - 1) >> 1
            for utr in range(pr0 // tile_h, pr1 // tile_h + 1):
                # child-row range owned by parent tile row utr
                cr_lo = max(2 * utr * tile_h, info.gr0)
                cr_hi = min(2 * (utr + 1) * tile_h, info.gr0 + info.h)
                for utc in range(pc0 // tile_w, pc1 // tile_w + 1):
                    cc_lo = max(2 * utc * tile_w, info.gc0)
                    cc_hi = min(2 * (utc + 1) * tile_w, info.gc0 + info.w)
                    frag = arr[
                        cr_lo - info.gr0 : cr_hi - info.gr0,
                        cc_lo - info.gc0 : cc_hi - info.gc0,
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
                            "payload": encode(
                                np.ascontiguousarray(frag), "raw-f32"
                            ),
                            "src_r0": cr_lo,
                            "src_c0": cc_lo,
                        }
                    )
        return _frag_table(out)

    def build(g: pa.Table) -> pa.Table:
        t_tr = int(g["t_tr"][0].as_py())
        t_tc = int(g["t_tc"][0].as_py())
        th, tw = target.tile_shape(t_tr, t_tc)
        tr0, tc0 = target.tile_origin_rc(t_tr, t_tc)
        # full child window for this parent tile: always even-shaped;
        # out-of-grid / unshipped cells stay NaN and count as missing
        win = np.full((2 * th, 2 * tw), np.nan, dtype=np.float32)
        r0s = g["src_r0"].to_numpy(zero_copy_only=False)
        c0s = g["src_c0"].to_numpy(zero_copy_only=False)
        fhs = g["fh"].to_numpy(zero_copy_only=False)
        fws = g["fw"].to_numpy(zero_copy_only=False)
        for i in range(g.num_rows):
            frag = decode(
                g["payload"][i].as_py(), int(fhs[i]), int(fws[i]),
                "raw-f32", dtype=np.float32,
            )
            rr = int(r0s[i]) - 2 * tr0
            cc = int(c0s[i]) - 2 * tc0
            win[rr : rr + int(fhs[i]), cc : cc + int(fws[i])] = frag
        canvas = reduce2x(win)
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
                    [
                        f"DEM tile {img} cellsize={new_spec.cellsize} "
                        f"crs={new_spec.crs}"
                    ],
                    pa.string(),
                ),
                "phash": pa.array([phash64(truth)], pa.int64()),
                "tile_row": pa.array([t_tr], pa.int32()),
                "tile_col": pa.array([t_tc], pa.int32()),
                "gr0": pa.array([tr0], pa.int32()),
                "gc0": pa.array([tc0], pa.int32()),
                "cell": pa.array(
                    [int(morton_encode(t_tr, t_tc))], pa.int64()
                ),
            }
        )

    frags = ts.ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
    if exchange == "files":
        from .exchange import fragment_exchange

        built = fragment_exchange(frags, build, key="tkey")
        return TileSet(ds=built, grid=new_spec)
    if shuffle_blocks is None:
        from .cc import auto_shuffle_blocks

        shuffle_blocks = auto_shuffle_blocks(floor=64)
    frags = frags.repartition(shuffle_blocks)
    built = frags.groupby("tkey").map_groups(build, batch_format="pyarrow")
    return TileSet(ds=built, grid=new_spec)
