"""Deterministic synthetic fixtures (FIXTURES.md).

Replays the reference's sample data shapes (`hydro_raster/sample/`: CA1 DEM,
4-polygon overhead-features shapefile, gauge points) at parametric scale, with
zero external data and zero randomness: every value derives from ids via fixed
formulas, so any parallelism level and any retry produces identical bytes.

The *decoded truth* of a tile is ``decode(encode(analytic_z))`` — i.e. lossy
formats are quantized at generation time — so engine-vs-oracle comparisons are
exact for all three ``fmt`` codecs while the codec-vs-analytic PSNR gate stays
meaningful.

Besides the Lance-shaped ``tiles`` table (``input_hint`` schema), the module
emits an exploded ``pixels`` Parquet (tile_id, gr, gc, x, y, z) that DuckDB
oracle SQL reads directly — the independent witness for the driver's
correctness gate.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import codecs
from .grid import GridSpec, TileScheme, tile_id

__all__ = [
    "make_scheme",
    "analytic_z",
    "tile_truth",
    "tiles_table",
    "pixels_table",
    "gauges_table",
    "rect_zone_features",
    "zones_table",
    "poly_features",
    "mosaic_schemes",
    "ensure_fixture_dir",
    "line_fixture",
    "assemble_truth",
    "CLIP_WINDOW",
    "CLASSIFY_BREAKS",
]

TILES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# CA1-like georef: British National Grid, 5 m cells (SURVEY.md §5 /
# reference sample `CA1_overhead_features.prj`, tutorial clip window family).
XLL = 340000.0
YLL = 554000.0
CELLSIZE = 5.0
NODATA = -9999.0

# interesting sub-window for clip queries (inside an 8x8-tile grid; edges NOT
# on half-cell boundaries so np.round vs SQL ROUND never disagree)
CLIP_WINDOW = (340261.0, 341028.0, 554168.0, 554882.0)
CLASSIFY_BREAKS = (-30.0, -10.0, 0.0, 10.0, 30.0)


def make_scheme(
    n_tile_rows: int = 4,
    n_tile_cols: int = 4,
    tile_h: int = 64,
    tile_w: int = 64,
    ragged: bool = True,
    xll: float = XLL,
    yll: float = YLL,
    cellsize: float = CELLSIZE,
) -> TileScheme:
    """Global grid of TRxTC tiles; last row/col ragged (24 / 40 px) when
    `ragged` (FIXTURES.md §1)."""
    nrows = (n_tile_rows - 1) * tile_h + (24 if ragged else tile_h)
    ncols = (n_tile_cols - 1) * tile_w + (40 if ragged else tile_w)
    grid = GridSpec(
        ncols=ncols,
        nrows=nrows,
        xllcorner=xll,
        yllcorner=yll,
        cellsize=cellsize,
        nodata=NODATA,
    )
    return TileScheme(grid=grid, tile_h=tile_h, tile_w=tile_w)


def analytic_z(x, y, grid: GridSpec) -> np.ndarray:
    """Smooth, non-separable synthetic DEM (catches transposition / flip /
    off-by-half-cell bugs): FIXTURES.md §1 formula."""
    ext = grid.extent
    xc = 0.5 * (ext[0] + ext[1])
    yc = 0.5 * (ext[2] + ext[3])
    ridge = 15.0 * np.exp(
        -(((x - (xc + 137.0)) ** 2 + (y - (yc - 89.0)) ** 2)) / (2.0 * 200.0**2)
    )
    return (
        40.0 * np.sin(x / 450.0) * np.cos(y / 600.0)
        + 0.00005 * (x - xc) * (y - yc)
        + ridge
    )


def tile_fmt(tile_row: int) -> str:
    return codecs.FORMATS[tile_row % 3]


def _raw_tile(scheme: TileScheme, tr: int, tc: int) -> np.ndarray:
    """Analytic surface at the tile's cell centres with NaN holes where
    (global_row + global_col) % 97 == 0."""
    X, Y = scheme.tile_cell_centres(tr, tc)
    z = analytic_z(X, Y, scheme.grid)
    h, w = scheme.tile_shape(tr, tc)
    r0, c0 = scheme.tile_origin_rc(tr, tc)
    gr = np.arange(r0, r0 + h)[:, None]
    gc = np.arange(c0, c0 + w)[None, :]
    z[(gr + gc) % 97 == 0] = np.nan
    return z


def tile_truth(scheme: TileScheme, tr: int, tc: int) -> np.ndarray:
    """Decoded ground truth = decode(encode(analytic)) for the tile's fmt."""
    z = _raw_tile(scheme, tr, tc)
    fmt = tile_fmt(tr)
    h, w = z.shape
    return codecs.decode(codecs.encode(z, fmt), h, w, fmt)


def _caption(img_id: str, cellsize: float) -> str:
    return f"DEM tile {img_id} cellsize={cellsize} crs=EPSG:27700"


def tiles_table(scheme: TileScheme, dup_mod: int | None = None) -> pa.Table:
    """The Lance-layout stand-in, exactly ``input_hint``-shaped.

    When ``dup_mod`` is set, tile (tr, tc) with ``(tr*31+tc) % dup_mod == 3``
    carries the payload of tile (tr % 2, tc % 2) — exact-duplicate rows
    sharing ``phash`` for the dedup fixtures."""
    ids, bufs, ws, hs, fmts, caps, hashes = [], [], [], [], [], [], []
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            src = (tr, tc)
            if dup_mod is not None and (tr * 31 + tc) % dup_mod == 3:
                src = (tr % 2, tc % 2)
            fmt = tile_fmt(src[0])
            z = _raw_tile(scheme, *src)
            buf = codecs.encode(z, fmt)
            h, w = z.shape
            truth = codecs.decode(buf, h, w, fmt)
            img_id = tile_id(tr, tc)
            ids.append(img_id)
            bufs.append(buf)
            ws.append(w)
            hs.append(h)
            fmts.append(fmt)
            caps.append(_caption(img_id, scheme.grid.cellsize))
            hashes.append(codecs.phash64(truth))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
        },
        schema=TILES_SCHEMA,
    )


def pixels_table(scheme: TileScheme) -> pa.Table:
    """Exploded decoded-truth pixels — the DuckDB-side witness table.

    Columns: tile_id, gr (global row, 0 = north), gc, x, y (cell centres),
    z (decoded value; NULL at NaN holes).
    """
    tiles, grs, gcs, xs, ys, zs = [], [], [], [], [], []
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            z = tile_truth(scheme, tr, tc)
            h, w = z.shape
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            gr, gc = np.meshgrid(
                np.arange(r0, r0 + h), np.arange(c0, c0 + w), indexing="ij"
            )
            X, Y = scheme.tile_cell_centres(tr, tc)
            tiles.append(np.full(z.size, tile_id(tr, tc), dtype=object))
            grs.append(gr.ravel())
            gcs.append(gc.ravel())
            xs.append(X.ravel())
            ys.append(Y.ravel())
            zs.append(z.ravel())
    z = np.concatenate(zs)
    return pa.table(
        {
            "tile_id": pa.array(np.concatenate(tiles), pa.string()),
            "gr": pa.array(np.concatenate(grs).astype(np.int32)),
            "gc": pa.array(np.concatenate(gcs).astype(np.int32)),
            "x": pa.array(np.concatenate(xs)),
            "y": pa.array(np.concatenate(ys)),
            "z": pa.array(z, mask=np.isnan(z)),
        }
    )


def _halton(n: int, base: int) -> np.ndarray:
    out = np.zeros(n)
    for i in range(n):
        f, r = 1.0, 0.0
        k = i + 1
        while k > 0:
            f /= base
            r += f * (k % base)
            k //= base
        out[i] = r
    return out


def _radical_inverse(k: np.ndarray, base: int) -> np.ndarray:
    """Vectorized radical inverse of 1-based indices ``k`` — bit-identical
    for any index slice: iteration count depends only on ``k.max()`` and
    the extra iterations for already-exhausted elements add exactly 0.0,
    so computing a sub-range gives the same values as the full range
    (what makes the large-gauge fixture distributable block-by-block)."""
    k = k.astype(np.int64, copy=True)
    out = np.zeros(k.size)
    f = 1.0
    while k.size and k.max() > 0:
        f /= base
        out += f * (k % base)
        k //= base
    return out


def _halton_vec(n: int, base: int) -> np.ndarray:
    """Vectorized radical inverse — bit-identical to ``_halton`` (the extra
    iterations for already-exhausted elements add exactly 0.0)."""
    return _radical_inverse(np.arange(1, n + 1, dtype=np.int64), base)


def gauges_table(scheme: TileScheme, n: int = 25) -> pa.Table:
    """Low-discrepancy (Halton 2/3) gauge points; value = analytic z —
    deterministic, irregular, no distance ties (FIXTURES.md §3)."""
    ext = scheme.grid.extent
    hx = _halton(n, 2)
    hy = _halton(n, 3)
    x = ext[0] + hx * (ext[1] - ext[0])
    y = ext[2] + hy * (ext[3] - ext[2])
    v = analytic_z(x, y, scheme.grid)
    return pa.table(
        {
            "gauge_id": pa.array([f"g{k:03d}" for k in range(n)], pa.string()),
            "x": pa.array(x),
            "y": pa.array(y),
            "value": pa.array(v),
        }
    )


# tag → large-gauge fixture size (the partitioned-kNN path's "too big to
# broadcast" stand-in; ≥100k at the driver's correctness scale)
KNN_LARGE_N = {"sf0.001": 20000, "sf0.01": 120000, "sf0.1": 120000}


def gauges_large_table(scheme: TileScheme, n: int) -> pa.Table:
    """Large gauge table (``gid:int64, x, y, value``) for the partitioned
    kNN-IDW path (``stages/knn_join.py``) — Halton 2/3 placement like
    ``gauges_table`` (no distance ties), value = analytic z."""
    ext = scheme.grid.extent
    x = ext[0] + _halton_vec(n, 2) * (ext[1] - ext[0])
    y = ext[2] + _halton_vec(n, 3) * (ext[3] - ext[2])
    v = analytic_z(x, y, scheme.grid)
    return pa.table(
        {
            "gid": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "x": pa.array(x),
            "y": pa.array(y),
            "value": pa.array(v),
        }
    )


def gauges_large_ds(
    scheme: TileScheme, n: int, num_blocks: int = 64
) -> "ray.data.Dataset":
    """Distributed ``gauges_large_table``: the Halton radical inverse is
    index-addressable (see ``_radical_inverse``), so each block generates
    its own id-range slice inside ``map_batches`` — the table never
    materializes on the driver (at 10M+ gauges the driver build is an
    ~11 s serial term and a ~300 MB driver→object-store copy). Bit-exact
    vs the driver table by test."""
    import ray

    ext = scheme.grid.extent
    grid = scheme.grid

    def mk(batch: pa.Table) -> pa.Table:
        gid = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = ext[0] + _radical_inverse(gid + 1, 2) * (ext[1] - ext[0])
        y = ext[2] + _radical_inverse(gid + 1, 3) * (ext[3] - ext[2])
        v = analytic_z(x, y, grid)
        return pa.table(
            {
                "gid": pa.array(gid, pa.int64()),
                "x": pa.array(x),
                "y": pa.array(y),
                "value": pa.array(v),
            }
        )

    return ray.data.range(n, override_num_blocks=num_blocks).map_batches(
        mk, batch_format="pyarrow", batch_size=None
    )


def _ensure_knn_fixture(tag: str, out: str) -> None:
    """Large-gauge table + whole-array witness for ``knn_idw_partitioned``
    (own marker so existing fixture dirs upgrade in place)."""
    done = os.path.join(out, "_KNN_LARGE_V1")
    if os.path.exists(done):
        return
    from . import oracle

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    n = KNN_LARGE_N.get(tag, KNN_LARGE_N["sf0.01"])
    gt = gauges_large_table(scheme, n)
    _write_atomic(gt, os.path.join(out, "gauges_large.parquet"))
    surf = oracle.knn_idw_canonical(
        scheme.grid,
        gt["x"].to_numpy(),
        gt["y"].to_numpy(),
        gt["value"].to_numpy(),
        gt["gid"].to_numpy(),
        k=8,
        power=2.0,
    )
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(surf)),
        os.path.join(out, "witness_knn_partitioned.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def rect_zone_features(scheme: TileScheme) -> list[dict]:
    """Four axis-aligned rectangle zones placed relative to the grid extent
    (mirrors the 4-polygon CA1_overhead_features sample: ids {2,4,5,9},
    adjust_val per FIXTURES.md §2): (a) spans a tile border, (b) fully inside
    one tile, (c) has edges exactly on cell-centre coords (on-edge inclusion),
    (d) overlaps (a) (burn-order)."""
    g = scheme.grid
    cs = g.cellsize
    ext = g.extent
    W = ext[1] - ext[0]
    H = ext[3] - ext[2]

    def rect(x0, x1, y0, y1):
        return [
            [
                [x0, y0],
                [x1, y0],
                [x1, y1],
                [x0, y1],
                [x0, y0],
            ]
        ]

    # (a) spans the border between tile cols 0/1 (x near tile_w*cs)
    ax0 = ext[0] + scheme.tile_w * cs - 17.0
    a = rect(ax0, ax0 + 34.0 + 0.3 * W / 8, ext[2] + 0.15 * H, ext[2] + 0.40 * H)
    # (b) fully inside tile (0, 0) region (top-left of the map)
    b = rect(ext[0] + 3.2 * cs, ext[0] + 9.7 * cs, ext[3] - 11.6 * cs, ext[3] - 4.1 * cs)
    # (c) edges exactly on cell-centre coords (k + 0.5 cells from the corner)
    c = rect(
        ext[0] + 20.5 * cs,
        ext[0] + 30.5 * cs,
        ext[2] + 10.5 * cs,
        ext[2] + 18.5 * cs,
    )
    # (d) overlaps (a)
    d = rect(ax0 + 10.0, ax0 + 60.0 + 0.3 * W / 8, ext[2] + 0.30 * H, ext[2] + 0.55 * H)
    ids = [2, 4, 5, 9]
    adjust = [-3.00, 1.25, -7.50, 2.00]
    feats = []
    for k, (rings, fid, adj) in enumerate(zip([a, b, c, d], ids, adjust)):
        feats.append(
            {
                "feature_id": k,
                "kind": "polygon",
                "rings": rings,
                "id": fid,
                "adjust_val": adj,
            }
        )
    return feats


def zones_table(scheme: TileScheme) -> pa.Table:
    """Rect-zone features flattened to (feature_id, id, adjust_val, xmin,
    xmax, ymin, ymax) — the shape DuckDB SQL joins against."""
    feats = rect_zone_features(scheme)
    rows = {
        "feature_id": [],
        "id": [],
        "adjust_val": [],
        "xmin": [],
        "xmax": [],
        "ymin": [],
        "ymax": [],
    }
    for f in feats:
        ring = np.asarray(f["rings"][0])
        rows["feature_id"].append(f["feature_id"])
        rows["id"].append(f["id"])
        rows["adjust_val"].append(f["adjust_val"])
        rows["xmin"].append(float(ring[:, 0].min()))
        rows["xmax"].append(float(ring[:, 0].max()))
        rows["ymin"].append(float(ring[:, 1].min()))
        rows["ymax"].append(float(ring[:, 1].max()))
    return pa.table(
        {
            "feature_id": pa.array(rows["feature_id"], pa.int64()),
            "id": pa.array(rows["id"], pa.int64()),
            "adjust_val": pa.array(rows["adjust_val"], pa.float64()),
            "xmin": pa.array(rows["xmin"]),
            "xmax": pa.array(rows["xmax"]),
            "ymin": pa.array(rows["ymin"]),
            "ymax": pa.array(rows["ymax"]),
        }
    )


def poly_features(scheme: TileScheme) -> list[dict]:
    """Four skewed quadrilaterals (non-axis-aligned) for the pytest-only
    general point-in-polygon path — same attribute values as the sample DBF."""
    g = scheme.grid
    ext = g.extent
    W = ext[1] - ext[0]
    H = ext[3] - ext[2]

    def quad(cx, cy, rx, ry, skew):
        return [
            [
                [cx - rx, cy - ry + skew],
                [cx + rx, cy - ry - skew],
                [cx + rx - skew, cy + ry],
                [cx - rx + skew, cy + ry - skew / 2],
                [cx - rx, cy - ry + skew],
            ]
        ]

    quads = [
        quad(ext[0] + 0.30 * W, ext[2] + 0.60 * H, 0.08 * W, 0.07 * H, 11.0),
        quad(ext[0] + 0.62 * W, ext[2] + 0.33 * H, 0.05 * W, 0.09 * H, -7.0),
        quad(ext[0] + 0.50 * W, ext[2] + 0.52 * H, 0.12 * W, 0.05 * H, 23.0),
        quad(ext[0] + 0.36 * W, ext[2] + 0.58 * H, 0.06 * W, 0.06 * H, 5.0),
    ]
    ids = [2, 4, 5, 9]
    adjust = [-3.00, 1.25, -7.50, 2.00]
    return [
        {
            "feature_id": k,
            "kind": "polygon",
            "rings": q,
            "id": fid,
            "adjust_val": adj,
        }
        for k, (q, fid, adj) in enumerate(zip(quads, ids, adjust))
    ]


def mosaic_schemes(tile_h: int = 64, tile_w: int = 64) -> list[TileScheme]:
    """Three partially-overlapping equal-cellsize inputs (FIXTURES.md §5,
    equal-cellsize variant; offsets are whole cells so grids are aligned)."""
    return [
        make_scheme(2, 2, tile_h, tile_w, ragged=False, xll=XLL, yll=YLL),
        make_scheme(2, 2, tile_h, tile_w, ragged=False, xll=XLL + 640.0, yll=YLL),
        make_scheme(2, 2, tile_h, tile_w, ragged=False, xll=XLL + 320.0, yll=YLL + 320.0),
    ]


def line_fixture(scheme: TileScheme) -> list[list[float]]:
    """The 3-vertex diagonal polyline used by the line_cells query (shared
    here so the witness generator and the query agree by construction)."""
    ext = scheme.grid.extent
    return [
        [ext[0] + 12.0, ext[2] + 17.0],
        [ext[0] + 0.55 * (ext[1] - ext[0]), ext[2] + 0.81 * (ext[3] - ext[2])],
        [ext[1] - 23.0, ext[2] + 0.3 * (ext[3] - ext[2])],
    ]


def assemble_truth(scheme: TileScheme) -> np.ndarray:
    """Whole-grid decoded truth (tile_truth tiles pasted into one array) —
    the oracle-side execution model."""
    g = scheme.grid
    out = np.empty((g.nrows, g.ncols))
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            z = tile_truth(scheme, tr, tc)
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            out[r0 : r0 + z.shape[0], c0 : c0 + z.shape[1]] = z
    return out


def _f32(a: np.ndarray) -> np.ndarray:
    """raw-f32 storage quantization (what lossless=True re-encode applies)."""
    return a.astype(np.float32).astype(np.float64)


def _per_tile_stats_table(scheme: TileScheme, full: np.ndarray) -> pa.Table:
    """Whole-array mirror of ``pipelines.tile_queries.per_tile_stats``:
    (image_id, n_px, n_valid, sum_z[2dec]) per tile, same C-order summation
    so float results are bit-identical."""
    ids, npx, nva, sums = [], [], [], []
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            h, w = scheme.tile_shape(tr, tc)
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            sl = full[r0 : r0 + h, c0 : c0 + w]
            m = np.isfinite(sl)
            ids.append(tile_id(tr, tc))
            npx.append(sl.size)
            nva.append(int(m.sum()))
            sums.append(round(float(sl[m].sum()), 2) if m.any() else 0.0)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "n_px": pa.array(npx, pa.int64()),
            "n_valid": pa.array(nva, pa.int64()),
            "sum_z": pa.array(sums, pa.float64()),
        }
    )


def _ensure_tile_witnesses(tag: str, out: str) -> None:
    """Expected-value witness parquets for the queries whose operators are
    not directly SQL-expressible (VERDICT round-1 item 2). Each is computed
    by the single-process whole-array oracle path and stored for the DuckDB
    oracle to SELECT verbatim. Guarded by its own marker so existing fixture
    dirs upgrade in place."""
    done = os.path.join(out, "_TILE_WITNESS_V9")
    if os.path.exists(done):
        return
    import pandas as pd

    from . import geom, oracle
    from .grid import map2sub, sub2map

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    g = scheme.grid
    full = assemble_truth(scheme)

    # ---- line_cells: per-segment linspace walk + value extraction ----
    coords = np.asarray(line_fixture(scheme), dtype=np.float64)
    vr, vc = map2sub(coords[:, 0], coords[:, 1], g)
    rr, cc = geom.line2sub_walk(vr, vc, g.nrows, g.ncols)
    X, Y = sub2map(rr, cc, g)
    z = full[rr, cc]
    _write_atomic(
        pa.table(
            {
                "ordinal": pa.array(np.arange(rr.size), pa.int64()),
                "gr": pa.array(rr.astype(np.int64)),
                "gc": pa.array(cc.astype(np.int64)),
                "x": pa.array(X),
                "y": pa.array(Y),
                "z": pa.array(z, mask=np.isnan(z)),
            }
        ),
        os.path.join(out, "witness_line_cells.parquet"),
    )

    gau = gauges_table(scheme, 25)
    pts = np.c_[gau["x"].to_numpy(), gau["y"].to_numpy()]
    vals = gau["value"].to_numpy()

    # ---- knn_idw_surface: per-tile stats of the kNN-IDW surface ----
    knn = _f32(oracle.knn_idw_interpolate(g, pts, vals, k=8, power=2.0))
    _write_atomic(
        _per_tile_stats_table(scheme, knn), os.path.join(out, "witness_knn_idw.parquet")
    )

    # ---- linear_interp_surface: Delaunay barycentric, NaN outside hull --
    from .tri import TriInterpolator

    interp = TriInterpolator(pts[:, 0], pts[:, 1], vals)
    Xl, Yl = sub2map(np.arange(g.nrows), np.arange(g.ncols), g)
    XXl, YYl = np.meshgrid(Xl, Yl)
    lin = _f32(interp(XXl.ravel(), YYl.ravel()).reshape(g.nrows, g.ncols))
    _write_atomic(
        _per_tile_stats_table(scheme, lin),
        os.path.join(out, "witness_linear_interp.parquet"),
    )

    # ---- channel_surface: IDW bathymetry inside the bankline polygon ----
    b0, b1, xs = sections_fixture(scheme)
    ring = np.vstack([b0, b1[::-1], b0[:1]])
    cpts_xyz = np.vstack([np.asarray(c, dtype=np.float64) for c in xs])
    Xall, Yall = sub2map(np.arange(g.nrows), np.arange(g.ncols), g)
    XX, YY = np.meshgrid(Xall, Yall)
    inside = geom.points_in_polygon(XX.ravel(), YY.ravel(), ring)
    surf = full.copy().ravel()
    if inside.any():
        idw_all = oracle.idw_interpolate(
            g, cpts_xyz[:, :2], cpts_xyz[:, 2], power=2.0
        ).ravel()
        surf[inside] = idw_all[inside]
    surf = surf.reshape(g.nrows, g.ncols)
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(surf)),
        os.path.join(out, "witness_channel.parquet"),
    )

    # ---- remove_block: footprint refill from the donor ring ------------
    # The query removes zone (b), which is interior to tile (0, 0) incl.
    # its ring_width=3 dilation — the per-tile refill therefore equals this
    # whole-array computation restricted to that tile (the op's documented
    # partitioning assumption).
    rb = full.copy()
    feat = rect_zone_features(scheme)[1]
    fr = np.asarray(feat["rings"][0], dtype=np.float64)
    mask = geom.points_in_polygon(XX.ravel(), YY.ravel(), fr).reshape(g.nrows, g.ncols)
    if mask.any():
        grown = mask.copy()
        for _ in range(3):
            gg2 = grown.copy()
            gg2[1:, :] |= grown[:-1, :]
            gg2[:-1, :] |= grown[1:, :]
            gg2[:, 1:] |= grown[:, :-1]
            gg2[:, :-1] |= grown[:, 1:]
            grown = gg2
        donors = grown & ~mask & np.isfinite(rb)
        dx, dy, dv = XX[donors], YY[donors], rb[donors]
        tx, ty = XX[mask], YY[mask]
        d2 = (tx[:, None] - dx[None, :]) ** 2 + (ty[:, None] - dy[None, :]) ** 2
        w = 1.0 / np.maximum(d2, 1e-12) ** 1.0
        rb[mask] = (w * dv[None, :]).sum(axis=1) / w.sum(axis=1)
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(rb)),
        os.path.join(out, "witness_remove_block.parquet"),
    )

    # ---- to_int_hist: rounded-value sign histogram ---------------------
    r = np.round(full)
    v = r[np.isfinite(r)]
    _write_atomic(
        pa.table(
            {
                "neg": pa.array([int((v < 0).sum())], pa.int64()),
                "pos": pa.array([int((v > 0).sum())], pa.int64()),
                "zero": pa.array([int((v == 0).sum())], pa.int64()),
                "sum_round": pa.array([round(float(v.sum()), 1)], pa.float64()),
            }
        ),
        os.path.join(out, "witness_to_int.parquet"),
    )

    # ---- resample_bilinear: whole-array kernel + raw-f32 storage -------
    rs, _spec = oracle.resample(full, g, 7.5, method="bilinear")
    rs = _f32(rs)
    m = np.isfinite(rs)
    _write_atomic(
        pa.table(
            {
                "n_px": pa.array([rs.size], pa.int64()),
                "n_valid": pa.array([int(m.sum())], pa.int64()),
                "sum_z": pa.array([round(float(rs[m].sum()), 2)], pa.float64()),
                "min_z": pa.array([float(rs[m].min())], pa.float64()),
                "max_z": pa.array([float(rs[m].max())], pa.float64()),
            }
        ),
        os.path.join(out, "witness_resample_bilinear.parquet"),
    )

    # ---- reproject_affine: whole-array nearest warp --------------------
    from .stages.reproject import AffineTransform, target_grid_for

    ext_g = g.extent
    rcx = 0.5 * (ext_g[0] + ext_g[1])
    rcy = 0.5 * (ext_g[2] + ext_g[3])
    fwd_t = AffineTransform.rotation(15.0, rcx, rcy)
    inv_t = fwd_t.inverse()
    warp_spec = target_grid_for(g, fwd_t, g.cellsize, crs="rot15")
    warp_scheme = TileScheme(grid=warp_spec, tile_h=64, tile_w=64)
    Xw, Yw = sub2map(np.arange(warp_spec.nrows), np.arange(warp_spec.ncols), warp_spec)
    XXw, YYw = np.meshgrid(Xw, Yw)
    sxw, syw = inv_t(XXw.ravel(), YYw.ravel())
    rrw, ccw = map2sub(sxw, syw, g)
    okw = (rrw >= 0) & (rrw < g.nrows) & (ccw >= 0) & (ccw < g.ncols)
    warped = np.full(XXw.size, np.nan)
    warped[okw] = full[rrw[okw], ccw[okw]]
    warped = _f32(warped.reshape(warp_spec.nrows, warp_spec.ncols))
    _write_atomic(
        _per_tile_stats_table(warp_scheme, warped),
        os.path.join(out, "witness_reproject.parquet"),
    )

    # ---- reproject_tmerc: BNG metres → OSGB36 geographic degrees -------
    # (real ellipsoidal transverse-Mercator math, EPSG:27700 constants;
    # same whole-array nearest warp as the affine witness above)
    from .stages.reproject import bng_tmerc

    tm_spec = target_grid_for(g, bng_tmerc.inverse, 1e-4, crs="osgb36-geo")
    tm_scheme = TileScheme(grid=tm_spec, tile_h=64, tile_w=64)
    Xt, Yt = sub2map(np.arange(tm_spec.nrows), np.arange(tm_spec.ncols), tm_spec)
    XXt, YYt = np.meshgrid(Xt, Yt)
    sxt, syt = bng_tmerc.forward(XXt.ravel(), YYt.ravel())
    rrt, cct = map2sub(sxt, syt, g)
    okt = (rrt >= 0) & (rrt < g.nrows) & (cct >= 0) & (cct < g.ncols)
    warped_t = np.full(XXt.size, np.nan)
    warped_t[okt] = full[rrt[okt], cct[okt]]
    warped_t = _f32(warped_t.reshape(tm_spec.nrows, tm_spec.ncols))
    _write_atomic(
        _per_tile_stats_table(tm_scheme, warped_t),
        os.path.join(out, "witness_reproject_tmerc.parquet"),
    )

    # ---- resample_methods: whole-array kernels, one row per method -----
    from .pipelines.resample_shim import QUERY_METHODS

    mrows = []
    for meth in QUERY_METHODS:
        rm, _ = oracle.resample(full, g, 7.5, method=meth)
        rm = _f32(rm)
        mm = np.isfinite(rm)
        mrows.append(
            (
                meth,
                int(mm.sum()),
                round(float(rm[mm].sum()), 2),
                round(float(rm[mm].min()), 4),
                round(float(rm[mm].max()), 4),
            )
        )
    _write_atomic(
        pa.table(
            {
                "method": pa.array([r[0] for r in mrows], pa.string()),
                "n_valid": pa.array([r[1] for r in mrows], pa.int64()),
                "sum_z": pa.array([r[2] for r in mrows], pa.float64()),
                "min_z": pa.array([r[3] for r in mrows], pa.float64()),
                "max_z": pa.array([r[4] for r in mrows], pa.float64()),
            }
        ),
        os.path.join(out, "witness_resample_methods.parquet"),
    )

    # ---- media witnesses: audio / video-frame / image features ---------
    # audio: decode the deterministic pcm16le table scalar-style and apply
    # the published feature formulas (rms, peak, zcr, dominant rfft bin)
    from .stages.multimodal import make_fake_audio

    at = make_fake_audio(32)
    arows = []
    for i in range(at.num_rows):
        x = np.frombuffer(at["bytes"][i].as_py(), dtype="<i2").astype(np.float64) / 32768.0
        sr = int(at["sample_rate"][i].as_py())
        spec = np.abs(np.fft.rfft(x))
        spec[0] = 0.0
        arows.append(
            (
                at["audio_id"][i].as_py(),
                round(float(np.sqrt((x * x).mean())), 6),
                round(float(np.abs(x).max()), 6),
                round(float((np.diff(np.signbit(x)) != 0).mean()), 6),
                round(float(np.argmax(spec) * sr / x.size), 6),
            )
        )
    _write_atomic(
        pa.table(
            {
                "audio_id": pa.array([r[0] for r in arows], pa.string()),
                "rms": pa.array([r[1] for r in arows], pa.float64()),
                "peak": pa.array([r[2] for r in arows], pa.float64()),
                "zcr": pa.array([r[3] for r in arows], pa.float64()),
                "dom_freq": pa.array([r[4] for r in arows], pa.float64()),
            }
        ),
        os.path.join(out, "witness_media_audio.parquet"),
    )

    # video frames: compute each sampled frame DIRECTLY from the generator
    # formula (independent of the engine's byte-range decode_frame path)
    vrows = []
    vh, vw, vn = 32, 32, 40
    yyv, xxv = np.mgrid[0:vh, 0:vw]
    for v in range(8):
        for k in range(0, vn, 10):
            plane = ((3 * xxv + 7 * yyv + 11 * k + 13 * v) % 256).astype(np.float64)
            vrows.append(
                (
                    f"v{v:04d}", k,
                    round(float(plane.mean()), 6),
                    round(float(plane.std()), 6),
                )
            )
    _write_atomic(
        pa.table(
            {
                "video_id": pa.array([r[0] for r in vrows], pa.string()),
                "frame_idx": pa.array([r[1] for r in vrows], pa.int64()),
                "mean": pa.array([r[2] for r in vrows], pa.float64()),
                "std": pa.array([r[3] for r in vrows], pa.float64()),
            }
        ),
        os.path.join(out, "witness_media_frames.parquet"),
    )

    # frame motion: consecutive-frame SAD + cut flag straight from the
    # generator formula (independent of the engine's decode_video path);
    # all-integer arithmetic, so the comparison is exact
    mrows2 = []
    for v in range(8):
        prev = None
        for k in range(vn):
            plane = ((3 * xxv + 7 * yyv + 11 * k + 13 * v) % 256).astype(np.int64)
            if prev is not None:
                sad = int(np.abs(plane - prev).sum())
                cut = int(100 * sad >= 4000 * (vh * vw))
                mrows2.append((f"v{v:04d}", k, sad, cut))
            prev = plane
    _write_atomic(
        pa.table(
            {
                "video_id": pa.array([r[0] for r in mrows2], pa.string()),
                "frame_idx": pa.array([r[1] for r in mrows2], pa.int64()),
                "sad": pa.array([r[2] for r in mrows2], pa.int64()),
                "cut": pa.array([r[3] for r in mrows2], pa.int64()),
            }
        ),
        os.path.join(out, "witness_media_motion.parquet"),
    )

    # image features: per-tile statistical features over the assembled
    # truth grid (mirrors multimodal._ImageFeatures on raw-f32 tiles)
    irows = []
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            th2, tw2 = scheme.tile_shape(tr, tc)
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            sl = full[r0 : r0 + th2, c0 : c0 + tw2]
            vfin = sl[np.isfinite(sl)]
            if vfin.size == 0:
                continue
            gx = np.diff(sl, axis=1)
            gy = np.diff(sl, axis=0)
            irows.append(
                (
                    tile_id(tr, tc),
                    round(float(vfin.mean()), 6),
                    round(float(vfin.std()), 6),
                    round(float(np.percentile(vfin, 5)), 6),
                    round(float(np.percentile(vfin, 95)), 6),
                    round(float(np.nansum(gx * gx) + np.nansum(gy * gy)), 4),
                )
            )
    _write_atomic(
        pa.table(
            {
                "image_id": pa.array([r[0] for r in irows], pa.string()),
                "mean": pa.array([r[1] for r in irows], pa.float64()),
                "std": pa.array([r[2] for r in irows], pa.float64()),
                "p_low": pa.array([r[3] for r in irows], pa.float64()),
                "p_high": pa.array([r[4] for r in irows], pa.float64()),
                "edge_energy": pa.array([r[5] for r in irows], pa.float64()),
            }
        ),
        os.path.join(out, "witness_media_image.parquet"),
    )

    # ---- phash Hamming near-dups: tiles_near table + star-edge witness --
    # tiles_near = the dup table's (image_id, phash) plus 6 deterministic
    # bit-flipped rows: k<3 flips 2 bits INSIDE band k (within t=3 → must
    # group with its base), k≥3 flips 6 bits touching ALL 4 bands (beyond
    # t AND no shared band → must stay isolated)
    dup_tbl = pq.read_table(
        os.path.join(out, "tiles_dup.parquet"), columns=["image_id", "phash"]
    )
    base_ids = dup_tbl["image_id"].to_pylist()
    base_ph = dup_tbl["phash"].to_numpy().astype(np.int64)
    near_ids, near_ph = [], []
    for k in range(6):
        if k < 3:
            mask = (1 << (16 * k)) | (1 << (16 * k + 1))
        else:
            mask = (1 << 0) | (1 << 1) | (1 << 16) | (1 << 17) | (1 << 32) | (1 << 48)
        near_ids.append(f"near{k:04d}")
        near_ph.append(np.int64(np.uint64(base_ph[k]) ^ np.uint64(mask)))
    all_ids = base_ids + near_ids
    all_ph = np.concatenate([base_ph, np.array(near_ph, np.int64)])
    _write_atomic(
        pa.table(
            {
                "image_id": pa.array(all_ids, pa.string()),
                "phash": pa.array(all_ph, pa.int64()),
            }
        ),
        os.path.join(out, "tiles_near.parquet"),
    )
    # star-edge witness (the engine's pinned semantics): per 16-bit band
    # bucket, edge (member ↔ bucket-min-image_id) kept iff hamming ≤ 3;
    # groups = union-find components, group_id = min image_id (string)
    buckets: dict[int, list[int]] = {}
    u64 = all_ph.astype(np.uint64)
    for b in range(4):
        key16 = ((u64 >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        for i, kk in enumerate(key16):
            buckets.setdefault((b << 16) | int(kk), []).append(i)
    parent: dict[str, str] = {}

    def _find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def _popcnt(a: int, b: int) -> int:
        return bin((int(a) & 0xFFFFFFFFFFFFFFFF) ^ (int(b) & 0xFFFFFFFFFFFFFFFF)).count("1")

    members: set[str] = set()
    for mem in buckets.values():
        rep_i = min(mem, key=lambda i: all_ids[i])
        for i in mem:
            if i == rep_i:
                continue
            if _popcnt(all_ph[i], all_ph[rep_i]) <= 3:
                for s in (all_ids[i], all_ids[rep_i]):
                    parent.setdefault(s, s)
                ra, rb = _find(all_ids[i]), _find(all_ids[rep_i])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
                members.add(all_ids[i])
                members.add(all_ids[rep_i])
    wrows = sorted((m, _find(m)) for m in members)
    _write_atomic(
        pa.table(
            {
                "image_id": pa.array([r[0] for r in wrows], pa.string()),
                "group_id": pa.array([r[1] for r in wrows], pa.string()),
            }
        ),
        os.path.join(out, "witness_phash_near.parquet"),
    )

    # ---- vectorize: BFS components of the classified grid --------------
    cls = oracle.classify(full, list(CLASSIFY_BREAKS[2:3]))  # breaks=[0.0]
    comps = oracle.components_bfs(cls)
    dfc = (
        pd.DataFrame(comps)
        .sort_values(["min_gr", "min_gc", "value"])
        .reset_index(drop=True)
    )
    dfc["component_id"] = np.arange(len(dfc), dtype=np.int64)
    dfc = dfc[
        ["component_id", "value", "n_cells", "min_gr", "max_gr", "min_gc", "max_gc"]
    ].astype(
        {
            "n_cells": np.int64,
            "min_gr": np.int64,
            "max_gr": np.int64,
            "min_gc": np.int64,
            "max_gc": np.int64,
        }
    )
    _write_atomic(
        pa.Table.from_pandas(dfc, preserve_index=False),
        os.path.join(out, "witness_vectorize.parquet"),
    )

    # ---- vectorize_rings: whole-array boundary-following ---------------
    # Single-process ring extraction: the whole grid as ONE tile, so the
    # entire distribution layer (per-tile segments, pending-face
    # resolution, stitch re-keying, per-component grouping) is exercised
    # against an execution with none of it. The ring-assembly policy
    # function is shared (it IS the operator's definition).
    from types import SimpleNamespace

    from .stages.vectorize import _boundary_segments, assemble_rings, label_tile

    labels_full, n_lab = label_tile(cls)
    ring_rows = []
    if n_lab:
        info0 = SimpleNamespace(tile_row=0, tile_col=0, gr0=0, gc0=0)
        segs = _boundary_segments(info0, cls, labels_full)
        m = labels_full >= 0
        rr2, cc2 = np.nonzero(m)
        lab_df = pd.DataFrame(
            {"l": labels_full[m], "r": rr2, "c": cc2, "v": cls[m]}
        ).groupby("l").agg(
            value=("v", "first"),
            n_cells=("v", "size"),
            min_gr=("r", "min"),
            min_gc=("c", "min"),
        ).reset_index()
        lab_df = lab_df.sort_values(["min_gr", "min_gc", "value"]).reset_index(drop=True)
        lab_df["component_id"] = np.arange(len(lab_df), dtype=np.int64)
        # independent per-label boundary-edge counts (pure neighbor-compare,
        # no shared ring code): used to SELF-CHECK the assembled rings
        pad = np.full(
            (cls.shape[0] + 2, cls.shape[1] + 2), np.nan
        )
        pad[1:-1, 1:-1] = cls
        edge_cnt = np.zeros(n_lab, dtype=np.int64)
        core = pad[1:-1, 1:-1]
        for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            nb = pad[1 + dr : pad.shape[0] - 1 + dr, 1 + dc : pad.shape[1] - 1 + dc]
            diff = np.isfinite(core) & ~(
                np.isfinite(nb) & (nb == core)
            )
            np.add.at(edge_cnt, labels_full[diff & (labels_full >= 0)], 1)
        for _, row in lab_df.iterrows():
            sub = segs[segs["node"] == row["l"]]
            scored = []
            for ring in assemble_rings(sub):
                r = ring[:, 0].astype(np.float64)
                c = ring[:, 1].astype(np.float64)
                a = 0.5 * float(np.sum(c[:-1] * r[1:] - c[1:] * r[:-1]))
                scored.append((ring, a))
            scored.sort(key=lambda t: -abs(t[1]))
            # self-checks against BFS/neighbor-count quantities that do NOT
            # use the shared ring-assembly code: the signed areas must sum
            # to the cell count and the vertex count to the boundary edges
            assert abs(sum(a for _, a in scored) - row["n_cells"]) < 1e-6, (
                "ring witness: area/cell-count mismatch"
            )
            assert sum(len(rg) - 1 for rg, _ in scored) == edge_cnt[int(row["l"])], (
                "ring witness: vertex/boundary-edge mismatch"
            )
            for k, (ring, a) in enumerate(scored):
                ring_rows.append(
                    (
                        int(row["component_id"]),
                        float(row["value"]),
                        int(row["n_cells"]),
                        k,
                        len(ring) - 1,
                        a,
                    )
                )
    rdf = pd.DataFrame(
        ring_rows,
        columns=["component_id", "value", "n_cells", "ring_idx", "n_vertices", "area_cells"],
    ).astype(
        {
            "component_id": np.int64,
            "n_cells": np.int64,
            "ring_idx": np.int64,
            "n_vertices": np.int64,
        }
    )
    _write_atomic(
        pa.Table.from_pandas(rdf, preserve_index=False),
        os.path.join(out, "witness_vectorize_rings.parquet"),
    )

    with open(done, "w") as f:
        f.write("ok\n")


SKEW_TILE = 32


def skew_stack_layers(
    n: int = 12, tile: int = SKEW_TILE
) -> list[tuple[TileScheme, pa.Table, np.ndarray]]:
    """The hot-cell-salting fixture: ``n`` one-tile ``tile``² layers, layer i
    shifted i cells right, constant value 100+i with a deterministic 30%
    NaN-hole pattern — every cell of the overlap strip receives fragments
    from many layers (the coastal many-survey stack). Shared between the
    ``mosaic_skew_stats`` query and its pixel witness so they agree by
    construction."""
    t = tile
    out = []
    for i in range(n):
        rng = np.random.RandomState(i)
        z = np.full((t, t), 100.0 + i, dtype=np.float64)
        z[rng.rand(t, t) < 0.3] = np.nan
        grid = GridSpec(
            ncols=t,
            nrows=t,
            xllcorner=XLL + i * CELLSIZE,
            yllcorner=YLL,
            cellsize=CELLSIZE,
            nodata=NODATA,
            crs="EPSG:27700",
        )
        scheme = TileScheme(grid=grid, tile_h=t, tile_w=t)
        buf = codecs.encode(z, "raw-f32")
        truth = codecs.decode(buf, t, t, "raw-f32")
        img = tile_id(0, 0)
        table = pa.table(
            {
                "image_id": pa.array([img], pa.string()),
                "bytes": pa.array([buf], pa.binary()),
                "w": pa.array([t], pa.int32()),
                "h": pa.array([t], pa.int32()),
                "fmt": pa.array(["raw-f32"], pa.string()),
                "caption": pa.array([_caption(img, CELLSIZE)], pa.string()),
                "phash": pa.array([codecs.phash64(truth)], pa.int64()),
            },
            schema=TILES_SCHEMA,
        )
        out.append((scheme, table, truth))
    return out


def skew_stack_table(n: int = 12, tile: int = SKEW_TILE) -> pa.Table:
    """The same skew stack as ONE georeferenced-tile table (input_hint
    columns + xll, yll, layer) — the ``merge_stack`` input form."""
    parts = []
    for li, (scheme, t, _truth) in enumerate(skew_stack_layers(n, tile)):
        g = scheme.grid
        t = t.append_column("xll", pa.array([g.xllcorner] * len(t), pa.float64()))
        t = t.append_column("yll", pa.array([g.yllcorner] * len(t), pa.float64()))
        t = t.append_column("layer", pa.array([li] * len(t), pa.int64()))
        parts.append(t)
    return pa.concat_tables(parts)


def skew_stack_target(
    n: int = 12, tile: int = SKEW_TILE, target_tile: int = 16
) -> TileScheme:
    """Union-extent target tiling for the skew stack (16-px tiles so one
    salted cell is cheap but the strip spans many cells)."""
    t = tile
    grid = GridSpec(
        ncols=t + n - 1,
        nrows=t,
        xllcorner=XLL,
        yllcorner=YLL,
        cellsize=CELLSIZE,
        nodata=NODATA,
        crs="EPSG:27700",
    )
    return TileScheme(grid=grid, tile_h=target_tile, tile_w=target_tile)


def _ensure_salt_witness(tag: str, out: str) -> None:
    """witness: per-layer decoded pixels (li, x, y, z) of the skew stack —
    the DuckDB side re-derives the NaN-skip overlay with arg_max(z, li)."""
    done = os.path.join(out, "_SALT_WITNESS_V1")
    if os.path.exists(done):
        return
    lis, xs, ys, zs = [], [], [], []
    for li, (scheme, _t, truth) in enumerate(skew_stack_layers()):
        g = scheme.grid
        cc, rr = np.meshgrid(np.arange(g.ncols), np.arange(g.nrows))
        x = g.xllcorner + (cc.ravel() + 0.5) * g.cellsize
        ytop = g.yllcorner + g.nrows * g.cellsize
        y = ytop - (rr.ravel() + 0.5) * g.cellsize
        z = truth.ravel()
        lis.append(np.full(z.size, li, dtype=np.int64))
        xs.append(x)
        ys.append(y)
        zs.append(z)
    z = np.concatenate(zs)
    table = pa.table(
        {
            "li": pa.array(np.concatenate(lis)),
            "x": pa.array(np.concatenate(xs)),
            "y": pa.array(np.concatenate(ys)),
            "z": pa.array(z, mask=np.isnan(z)),
        }
    )
    _write_atomic(table, os.path.join(out, "skew_pixels.parquet"))
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_r4_witnesses(tag: str, out: str) -> None:
    """Round-4 witness parquets (own marker → in-place upgrade):
    hillshade_stats and reproject_utm."""
    done = os.path.join(out, "_R4_WITNESS_V1")
    if os.path.exists(done):
        return
    from . import oracle
    from .grid import map2sub, sub2map

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    g = scheme.grid
    full = assemble_truth(scheme)

    # ---- hillshade: global-stretch illumination intensity ----------------
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(oracle.hillshade(full))),
        os.path.join(out, "witness_hillshade.parquet"),
    )

    # ---- reproject_utm: BNG metres → UTM 30N metres (composed TM) --------
    from .stages.reproject import bng_tmerc, compose, target_grid_for, utm_tmerc

    utm = utm_tmerc(30)
    fwd = compose(utm.forward, bng_tmerc.inverse)
    inv = compose(bng_tmerc.forward, utm.inverse)
    utm_spec = target_grid_for(g, fwd, g.cellsize, crs="utm30n")
    utm_scheme = TileScheme(grid=utm_spec, tile_h=64, tile_w=64)
    Xu, Yu = sub2map(np.arange(utm_spec.nrows), np.arange(utm_spec.ncols), utm_spec)
    XXu, YYu = np.meshgrid(Xu, Yu)
    sxu, syu = inv(XXu.ravel(), YYu.ravel())
    rru, ccu = map2sub(sxu, syu, g)
    oku = (rru >= 0) & (rru < g.nrows) & (ccu >= 0) & (ccu < g.ncols)
    warped_u = np.full(XXu.size, np.nan)
    warped_u[oku] = full[rru[oku], ccu[oku]]
    warped_u = _f32(warped_u.reshape(utm_spec.nrows, utm_spec.ncols))
    _write_atomic(
        _per_tile_stats_table(utm_scheme, warped_u),
        os.path.join(out, "witness_reproject_utm.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_terrain_witnesses(tag: str, out: str) -> None:
    """Slope/aspect/curvature/TWI witness parquets (own marker → in-place
    upgrade): whole-array ``oracle.slope_aspect`` / ``oracle.curvature`` /
    the two-raster wetness-index composition, then the standard per-tile
    stats."""
    done = os.path.join(out, "_TERRAIN_WITNESS_V3")
    if os.path.exists(done):
        return
    from . import oracle

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    full = assemble_truth(scheme)
    sl, asp = oracle.slope_aspect(full)
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(sl)),
        os.path.join(out, "witness_slope.parquet"),
    )
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(asp)),
        os.path.join(out, "witness_aspect.parquet"),
    )
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(oracle.curvature(full))),
        os.path.join(out, "witness_curvature.parquet"),
    )
    # TWI: compose the f32-rounded acc/slope planes (the engine's tiles
    # are raw-f32, so the codec rounding sits BETWEEN the two passes)
    acc32 = _f32(oracle.flow_accumulation(full))
    sl32 = _f32(sl)
    twi = np.log((acc32 + 1.0) / np.maximum(np.tan(np.radians(sl32)), 1e-6))
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(twi)),
        os.path.join(out, "witness_twi.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_augment_witness(tag: str, out: str) -> None:
    """Image-augmentation witness (own marker → in-place upgrade): per
    tile and per op (fliplr / flipud / rot90), an ORIENTATION-SENSITIVE
    positional checksum ``round(Σ z·(r·w_out + c), 2)`` over finite cells
    of the flipped/rotated truth slice (plain per-tile stats are flip-
    invariant and would pass a broken transform)."""
    done = os.path.join(out, "_AUGMENT_WITNESS_V1")
    if os.path.exists(done):
        return
    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    full = assemble_truth(scheme)
    fns = {"fliplr": np.fliplr, "flipud": np.flipud, "rot90": np.rot90}
    rows = []
    for op, fn in fns.items():
        for tr in range(scheme.n_tile_rows):
            for tc in range(scheme.n_tile_cols):
                th, tw = scheme.tile_shape(tr, tc)
                r0, c0 = scheme.tile_origin_rc(tr, tc)
                a = fn(_f32(full[r0 : r0 + th, c0 : c0 + tw]))
                h2, w2 = a.shape
                pos = (
                    np.arange(h2, dtype=np.float64)[:, None] * w2
                    + np.arange(w2, dtype=np.float64)
                )
                m = np.isfinite(a)
                rows.append(
                    (
                        op,
                        tile_id(tr, tc),
                        int(m.sum()),
                        round(float((np.where(m, a, 0.0) * pos).sum()), 2),
                    )
                )
    _write_atomic(
        pa.table(
            {
                "op": pa.array([r[0] for r in rows], pa.string()),
                "image_id": pa.array([r[1] for r in rows], pa.string()),
                "n_valid": pa.array([r[2] for r in rows], pa.int64()),
                "chk": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        os.path.join(out, "witness_augment.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_focal_witness(tag: str, out: str) -> None:
    """Focal-statistics witness parquets (own marker → in-place upgrade):
    whole-array ``oracle.focal`` (3×3 mean / range / median) then the
    standard per-tile stats."""
    done = os.path.join(out, "_FOCAL_WITNESS_V2")
    if os.path.exists(done):
        return
    from . import oracle

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    full = assemble_truth(scheme)
    for stat in ("mean", "range", "median"):
        _write_atomic(
            _per_tile_stats_table(scheme, _f32(oracle.focal(full, stat))),
            os.path.join(out, f"witness_focal_{stat}.parquet"),
        )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_flowdir_witness(tag: str, out: str) -> None:
    """D8 flow-direction + pit-fill + flow-accumulation witnesses (own
    marker → in-place upgrade): whole-array ``oracle.flow_dir_d8`` /
    ``oracle.fill_pits`` / ``oracle.flow_accumulation`` then the standard
    per-tile stats."""
    done = os.path.join(out, "_FLOWDIR_WITNESS_V3")
    if os.path.exists(done):
        return
    from . import oracle

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    full = assemble_truth(scheme)
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(oracle.flow_dir_d8(full))),
        os.path.join(out, "witness_flowdir.parquet"),
    )
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(oracle.fill_pits(full))),
        os.path.join(out, "witness_fillpits.parquet"),
    )
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(oracle.flow_accumulation(full))),
        os.path.join(out, "witness_flowacc.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_lcc_witness(tag: str, out: str) -> None:
    """Lambert-conformal-conic warp witness (own marker → in-place
    upgrade): BNG metres → Lambert-93 metres through geographic
    coordinates, whole-array nearest lookup, then per-tile stats —
    the same scalar mirror as the UTM witness."""
    done = os.path.join(out, "_LCC_WITNESS_V1")
    if os.path.exists(done):
        return
    from .grid import map2sub, sub2map
    from .sources.tiles import TileScheme
    from .stages.reproject import bng_tmerc, compose, lambert93, target_grid_for

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    g = scheme.grid
    full = assemble_truth(scheme)
    fwd = compose(lambert93.forward, bng_tmerc.inverse)
    inv = compose(bng_tmerc.forward, lambert93.inverse)
    spec = target_grid_for(g, fwd, g.cellsize, crs="lambert93")
    lcc_scheme = TileScheme(grid=spec, tile_h=64, tile_w=64)
    X, Y = sub2map(np.arange(spec.nrows), np.arange(spec.ncols), spec)
    XX, YY = np.meshgrid(X, Y)
    sx, sy = inv(XX.ravel(), YY.ravel())
    rr, cc = map2sub(sx, sy, g)
    ok = (rr >= 0) & (rr < g.nrows) & (cc >= 0) & (cc < g.ncols)
    warped = np.full(XX.size, np.nan)
    warped[ok] = full[rr[ok], cc[ok]]
    warped = _f32(warped.reshape(spec.nrows, spec.ncols))
    _write_atomic(
        _per_tile_stats_table(lcc_scheme, warped),
        os.path.join(out, "witness_reproject_lcc.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_spectral_witness(tag: str, out: str) -> None:
    """media_audio_spectral witness (own marker → in-place upgrade).

    Same independence split as the WAV witness: samples rebuilt from the
    generator formula (never the RIFF container), then the documented
    STFT contract (256-sample Hann frames, hop 128, |rfft|² power,
    per-frame centroid mean, 300/1500 Hz band fractions, 85 % rolloff)
    applied with the same numpy expressions."""
    done = os.path.join(out, "_SPECTRAL_WITNESS_V1")
    if os.path.exists(done):
        return
    from .stages.multimodal import _fake_wav_samples

    sr, seconds, n_clips = 8000, 0.5, 32
    N, HOP = 256, 128
    win = np.hanning(N)
    rows = {"audio_id": [], "n_frames": [], "centroid_mean": [],
            "low_frac": [], "mid_frac": [], "high_frac": [], "rolloff85": []}
    for c in range(n_clips):
        kind, chans = _fake_wav_samples(c, sr, seconds)
        if kind == 2:
            scaled = [(ch.astype(np.float64) - 128.0) / 128.0 for ch in chans]
        else:
            scaled = [ch.astype(np.float64) / 32768.0 for ch in chans]
        x = np.mean(scaled, axis=0)
        n_frames = (x.size - N) // HOP + 1
        idx = np.arange(N)[None, :] + (np.arange(n_frames) * HOP)[:, None]
        frames = x[idx] * win[None, :]
        p = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        freqs = np.arange(p.shape[1]) * (sr / N)
        tot_f = p.sum(axis=1)
        centroid = float(((p @ freqs) / tot_f).mean())
        spec = p.sum(axis=0)
        tot = float(spec.sum())
        rows["audio_id"].append(f"w{c:04d}")
        rows["n_frames"].append(n_frames)
        rows["centroid_mean"].append(round(centroid, 6))
        rows["low_frac"].append(round(float(spec[freqs < 300.0].sum() / tot), 6))
        rows["mid_frac"].append(
            round(float(spec[(freqs >= 300.0) & (freqs < 1500.0)].sum() / tot), 6)
        )
        rows["high_frac"].append(
            round(float(spec[freqs >= 1500.0].sum() / tot), 6)
        )
        rows["rolloff85"].append(
            round(float(freqs[np.searchsorted(np.cumsum(spec), 0.85 * tot)]), 6)
        )
    _write_atomic(
        pa.table(
            {
                "audio_id": pa.array(rows["audio_id"], pa.string()),
                "n_frames": pa.array(rows["n_frames"], pa.int64()),
                "centroid_mean": pa.array(rows["centroid_mean"], pa.float64()),
                "low_frac": pa.array(rows["low_frac"], pa.float64()),
                "mid_frac": pa.array(rows["mid_frac"], pa.float64()),
                "high_frac": pa.array(rows["high_frac"], pa.float64()),
                "rolloff85": pa.array(rows["rolloff85"], pa.float64()),
            }
        ),
        os.path.join(out, "witness_media_audio_spectral.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_epsg_witness(tag: str, out: str) -> None:
    """Registry-driven EPSG warp witness (own marker → in-place upgrade):
    BNG metres → Irish TM metres (EPSG:2157, a code the pre-registry
    dispatch raised on) through geographic coordinates via
    ``crs_transform`` — the same scalar mirror as the UTM/LCC
    witnesses."""
    done = os.path.join(out, "_EPSG_WITNESS_V1")
    if os.path.exists(done):
        return
    from .grid import map2sub, sub2map
    from .sources.tiles import TileScheme
    from .stages.reproject import crs_transform, target_grid_for

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    g = scheme.grid
    full = assemble_truth(scheme)
    fwd, inv = crs_transform(27700, 2157)
    spec = target_grid_for(g, fwd, g.cellsize, crs="EPSG:2157")
    itm_scheme = TileScheme(grid=spec, tile_h=64, tile_w=64)
    X, Y = sub2map(np.arange(spec.nrows), np.arange(spec.ncols), spec)
    XX, YY = np.meshgrid(X, Y)
    sx, sy = inv(XX.ravel(), YY.ravel())
    rr, cc = map2sub(sx, sy, g)
    ok = (rr >= 0) & (rr < g.nrows) & (cc >= 0) & (cc < g.ncols)
    warped = np.full(XX.size, np.nan)
    warped[ok] = full[rr[ok], cc[ok]]
    warped = _f32(warped.reshape(spec.nrows, spec.ncols))
    _write_atomic(
        _per_tile_stats_table(itm_scheme, warped),
        os.path.join(out, "witness_reproject_epsg2157.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_stream_witness(tag: str, out: str) -> None:
    """Stream-network + flow-length + Strahler witnesses (own marker →
    in-place upgrade): whole-array flow accumulation, threshold ≥ 50
    upstream cells → 0/1/NaN mask; whole-array downstream flow length;
    whole-array Strahler order at the same threshold; standard per-tile
    stats for each."""
    done = os.path.join(out, "_STREAM_WITNESS_V3")
    if os.path.exists(done):
        return
    from . import oracle

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    full = assemble_truth(scheme)
    acc = oracle.flow_accumulation(full)
    mask = np.where(np.isnan(acc), np.nan, (acc >= 50.0).astype(np.float64))
    _write_atomic(
        _per_tile_stats_table(scheme, mask),
        os.path.join(out, "witness_streams.parquet"),
    )
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(oracle.flow_length(full))),
        os.path.join(out, "witness_flowlen.parquet"),
    )
    _write_atomic(
        _per_tile_stats_table(scheme, oracle.strahler(full, threshold=50.0)),
        os.path.join(out, "witness_strahler.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_depression_witness(tag: str, out: str) -> None:
    """Depression-filling witness (own marker → in-place upgrade):
    deterministically carve depressions into the decoded truth (the
    fixture surface has none — ``oracle.carve_depressions``), f32-quantize
    (the engine's carve stage stores raw-f32), run the whole-array
    Priority-Flood witness, then the standard per-tile stats."""
    done = os.path.join(out, "_DEPRESSION_WITNESS_V1")
    if os.path.exists(done):
        return
    from . import oracle

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    g = scheme.grid
    carved = _f32(
        oracle.carve_depressions(assemble_truth(scheme), 0, 0, g.nrows, g.ncols)
    )
    _write_atomic(
        _per_tile_stats_table(scheme, _f32(oracle.fill_depressions(carved))),
        os.path.join(out, "witness_filldep.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_basin_witness(tag: str, out: str) -> None:
    """D8 basin-delineation witnesses (own marker → in-place upgrade):
    whole-array ``oracle.basin_labels`` then (a) the standard per-tile
    stats of the label plane — NO f32 quantization: labels are global cell
    ids, exact only in f64, matching the engine's ``raw-f64`` storage —
    and (b) the exact per-basin cell-count table."""
    done = os.path.join(out, "_BASIN_WITNESS_V1")
    if os.path.exists(done):
        return
    from . import oracle

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    lab = oracle.basin_labels(assemble_truth(scheme))
    _write_atomic(
        _per_tile_stats_table(scheme, lab),
        os.path.join(out, "witness_basins.parquet"),
    )
    u, cnt = np.unique(lab[np.isfinite(lab)], return_counts=True)
    _write_atomic(
        pa.table(
            {
                "basin": pa.array(u.astype(np.int64), pa.int64()),
                "n_cells": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        ),
        os.path.join(out, "witness_basin_sizes.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_png16_witness(tag: str, out: str) -> None:
    """png16-transcode witness (own marker → in-place upgrade).

    Independent scalar reproduction of the ``transcode(ts, "png16")`` →
    per-tile-stats query: per tile, u16-quantize the decoded truth over its
    finite min..max (the raw-u16/png16 value mapping, 65534 levels) and take
    the standard stats. Deliberately NEVER calls the PNG container code —
    a decode bug in ``png.py`` cannot cancel out here.
    """
    done = os.path.join(out, "_PNG16_WITNESS_V1")
    if os.path.exists(done):
        return
    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    ids, npx, nva, sums = [], [], [], []
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            z = tile_truth(scheme, tr, tc)
            m = np.isfinite(z)
            if m.any():
                lo = float(z[m].min())
                hi = float(z[m].max())
                scale = (hi - lo) / 65534.0 if hi > lo else 1.0
                q = np.clip(np.round((z - lo) / scale), 0, 65534)
                rt = (lo + scale * np.nan_to_num(q)).astype(np.float32).astype(np.float64)
                rt[~m] = np.nan
            else:
                rt = z
            ids.append(f"t{tr:04d}_{tc:04d}")
            npx.append(rt.size)
            nva.append(int(m.sum()))
            sums.append(round(float(rt[m].sum()), 2) if m.any() else 0.0)
    _write_atomic(
        pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_px": pa.array(npx, pa.int64()),
                "n_valid": pa.array(nva, pa.int64()),
                "sum_z": pa.array(sums, pa.float64()),
            }
        ),
        os.path.join(out, "witness_png16.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_jpeg_witness(tag: str, out: str) -> None:
    """media_image_features_jpeg witness (own marker → in-place upgrade).

    The lossy-fmt convention: truth is the decode∘encode pixel value (the
    quantized image), so the witness regenerates the deterministic
    ``make_fake_jpegs`` corpus and computes features on ``jpeg_decode`` of
    each payload — exact parity with the query by construction. Codec
    CORRECTNESS is evidenced independently in ``tests/test_jpeg.py``
    (hand-built bitstreams with pencil-derived pixels, flat-block scalar
    math, PSNR gates vs the pre-encode array), mirroring how png16 split
    container-independence from plumbing parity."""
    done = os.path.join(out, "_JPEG_WITNESS_V1")
    if os.path.exists(done):
        return
    from .jpeg import jpeg_decode
    from .stages.multimodal import make_fake_jpegs

    t = make_fake_jpegs(12, 40, 32)
    rows = {"image_id": [], "mean": [], "std": [], "p_low": [], "p_high": [],
            "edge_energy": []}
    for i in range(t.num_rows):
        a, _info = jpeg_decode(t["bytes"][i].as_py())
        a = a.astype(np.float64)
        v = a[np.isfinite(a)]
        rows["image_id"].append(t["image_id"][i].as_py())
        rows["mean"].append(round(float(v.mean()), 6))
        rows["std"].append(round(float(v.std()), 6))
        rows["p_low"].append(round(float(np.percentile(v, 5)), 6))
        rows["p_high"].append(round(float(np.percentile(v, 95)), 6))
        plane = a if a.ndim == 2 else a[..., 0]
        gx = np.diff(plane, axis=1)
        gy = np.diff(plane, axis=0)
        rows["edge_energy"].append(
            round(float(np.nansum(gx * gx) + np.nansum(gy * gy)), 4)
        )
    _write_atomic(
        pa.table(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "mean": pa.array(rows["mean"], pa.float64()),
                "std": pa.array(rows["std"], pa.float64()),
                "p_low": pa.array(rows["p_low"], pa.float64()),
                "p_high": pa.array(rows["p_high"], pa.float64()),
                "edge_energy": pa.array(rows["edge_energy"], pa.float64()),
            }
        ),
        os.path.join(out, "witness_media_image_jpeg.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_gif_witness(tag: str, out: str) -> None:
    """media_image_features_gif witness (own marker → in-place upgrade).

    GIF is LOSSLESS, so truth is simply ``gif_decode`` of the
    deterministic ``make_fake_gifs`` payloads (= palette lookup of the
    index plane). Codec correctness is evidenced independently in
    ``tests/test_gif.py`` (an external-truth 35-byte 1×1 stream, LZW
    dict-overflow and KwKwK round-trips, the interlace permutation)."""
    done = os.path.join(out, "_GIF_WITNESS_V1")
    if os.path.exists(done):
        return
    from .gif import gif_decode
    from .stages.multimodal import make_fake_gifs

    t = make_fake_gifs(12, 40, 32)
    rows = {"image_id": [], "mean": [], "std": [], "p_low": [], "p_high": [],
            "edge_energy": []}
    for i in range(t.num_rows):
        a, _info = gif_decode(t["bytes"][i].as_py())
        a = a.astype(np.float64)
        v = a[np.isfinite(a)]
        rows["image_id"].append(t["image_id"][i].as_py())
        rows["mean"].append(round(float(v.mean()), 6))
        rows["std"].append(round(float(v.std()), 6))
        rows["p_low"].append(round(float(np.percentile(v, 5)), 6))
        rows["p_high"].append(round(float(np.percentile(v, 95)), 6))
        plane = a if a.ndim == 2 else a[..., 0]
        gx = np.diff(plane, axis=1)
        gy = np.diff(plane, axis=0)
        rows["edge_energy"].append(
            round(float(np.nansum(gx * gx) + np.nansum(gy * gy)), 4)
        )
    _write_atomic(
        pa.table(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "mean": pa.array(rows["mean"], pa.float64()),
                "std": pa.array(rows["std"], pa.float64()),
                "p_low": pa.array(rows["p_low"], pa.float64()),
                "p_high": pa.array(rows["p_high"], pa.float64()),
                "edge_energy": pa.array(rows["edge_energy"], pa.float64()),
            }
        ),
        os.path.join(out, "witness_media_image_gif.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_tiff_witness(tag: str, out: str) -> None:
    """media_image_features_tiff witness (own marker → in-place upgrade).

    TIFF is LOSSLESS, so the witness computes the features straight from
    the GENERATOR FORMULA planes (``tiff_fake_plane``) — the container,
    strips, LZW/PackBits and predictor paths are never touched here;
    their correctness is evidenced independently in ``tests/test_tiff.py``
    (hand-built IFDs in the opposite layout, the TIFF 6.0 §9 PackBits
    spec example, a binary-string-concatenated MSB-first LZW bitstream)."""
    done = os.path.join(out, "_TIFF_WITNESS_V1")
    if os.path.exists(done):
        return
    from .stages.multimodal import tiff_fake_plane

    rows = {"image_id": [], "mean": [], "std": [], "p_low": [], "p_high": [],
            "edge_energy": []}
    for i in range(12):
        a = tiff_fake_plane(i, 40, 32).astype(np.float64)
        v = a[np.isfinite(a)]
        rows["image_id"].append(f"t{i:04d}")
        rows["mean"].append(round(float(v.mean()), 6))
        rows["std"].append(round(float(v.std()), 6))
        rows["p_low"].append(round(float(np.percentile(v, 5)), 6))
        rows["p_high"].append(round(float(np.percentile(v, 95)), 6))
        plane = a if a.ndim == 2 else a[..., 0]
        gx = np.diff(plane, axis=1)
        gy = np.diff(plane, axis=0)
        rows["edge_energy"].append(
            round(float(np.nansum(gx * gx) + np.nansum(gy * gy)), 4)
        )
    _write_atomic(
        pa.table(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "mean": pa.array(rows["mean"], pa.float64()),
                "std": pa.array(rows["std"], pa.float64()),
                "p_low": pa.array(rows["p_low"], pa.float64()),
                "p_high": pa.array(rows["p_high"], pa.float64()),
                "edge_energy": pa.array(rows["edge_energy"], pa.float64()),
            }
        ),
        os.path.join(out, "witness_media_image_tiff.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_costdist_witness(tag: str, out: str) -> None:
    """cost_distance witness (own marker → in-place upgrade).

    SCALAR multi-source Dijkstra (plain ``heapq``) over the assembled
    truth grid with the spec's step costs — completely independent of the
    engine's chamfer relaxation and tile/ring machinery; the two agree
    bit-exactly because both compute the min over left-associated float
    path sums (see ``stages/costdist.py``'s exactness contract)."""
    done = os.path.join(out, "_COSTDIST_WITNESS_V1")
    if os.path.exists(done):
        return
    import heapq

    import pyarrow.parquet as _pq

    from .grid import map2sub

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    full = assemble_truth(scheme)
    g = scheme.grid
    zmin = float(np.nanmin(full))
    cost = full - zmin + 1.0
    cost[~np.isfinite(full)] = np.inf
    h, w = cost.shape
    ga = _pq.read_table(os.path.join(out, "gauges.parquet")).to_pandas()
    dist = np.full((h, w), np.inf)
    heap = []
    sq2 = float(np.sqrt(2.0))
    for _, o in ga.iterrows():
        r, c = map2sub(float(o["x"]), float(o["y"]), g)
        r, c = int(r), int(c)
        if 0 <= r < h and 0 <= c < w and np.isfinite(cost[r, c]) \
                and dist[r, c] > 0.0:
            dist[r, c] = 0.0
            heapq.heappush(heap, (0.0, r, c))
    while heap:
        d, r, c = heapq.heappop(heap)
        if d > dist[r, c]:
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = r + dr, c + dc
                if not (0 <= nr < h and 0 <= nc < w):
                    continue
                if not np.isfinite(cost[nr, nc]):
                    continue
                step = 0.5 * (cost[r, c] + cost[nr, nc]) * (
                    sq2 if dr and dc else 1.0)
                nd = d + step
                if nd < dist[nr, nc]:
                    dist[nr, nc] = nd
                    heapq.heappush(heap, (nd, nr, nc))
    rows = {"image_id": [], "n_reached": [], "sum_dist": [], "max_dist": []}
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            z = tile_truth(scheme, tr, tc)
            d = dist[r0:r0 + z.shape[0], c0:c0 + z.shape[1]]
            fin = np.isfinite(d)
            rows["image_id"].append(f"t{tr:04d}_{tc:04d}")
            rows["n_reached"].append(int(fin.sum()))
            rows["sum_dist"].append(
                round(float(d[fin].sum()), 2) if fin.any() else 0.0)
            rows["max_dist"].append(
                round(float(d[fin].max()), 6) if fin.any() else 0.0)
    _write_atomic(
        pa.table(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "n_reached": pa.array(rows["n_reached"], pa.int64()),
                "sum_dist": pa.array(rows["sum_dist"], pa.float64()),
                "max_dist": pa.array(rows["max_dist"], pa.float64()),
            }
        ),
        os.path.join(out, "witness_costdist.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_costpath_witness(tag: str, out: str) -> None:
    """least_cost_path witness: scalar Dijkstra field (same as the
    costdist witness), then the identical remote-cell pick (global
    row-major first-max) and steepest-descent walk with the documented
    (dr, dc) tie order."""
    done = os.path.join(out, "_COSTPATH_WITNESS_V1")
    if os.path.exists(done):
        return
    import heapq

    import pyarrow.parquet as _pq

    from .grid import map2sub

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    full = assemble_truth(scheme)
    g = scheme.grid
    zmin = float(np.nanmin(full))
    cost = full - zmin + 1.0
    cost[~np.isfinite(full)] = np.inf
    h, w = cost.shape
    ga = _pq.read_table(os.path.join(out, "gauges.parquet")).to_pandas()
    dist = np.full((h, w), np.inf)
    heap = []
    sq2 = float(np.sqrt(2.0))
    for _, o in ga.iterrows():
        r, c = map2sub(float(o["x"]), float(o["y"]), g)
        r, c = int(r), int(c)
        if 0 <= r < h and 0 <= c < w and np.isfinite(cost[r, c]) \
                and dist[r, c] > 0.0:
            dist[r, c] = 0.0
            heapq.heappush(heap, (0.0, r, c))
    while heap:
        d, r, c = heapq.heappop(heap)
        if d > dist[r, c]:
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = r + dr, c + dc
                if not (0 <= nr < h and 0 <= nc < w):
                    continue
                if not np.isfinite(cost[nr, nc]):
                    continue
                nd = d + 0.5 * (cost[r, c] + cost[nr, nc]) * (
                    sq2 if dr and dc else 1.0)
                if nd < dist[nr, nc]:
                    dist[nr, nc] = nd
                    heapq.heappush(heap, (nd, nr, nc))
    dm = np.where(np.isfinite(dist), dist, -np.inf)
    flat = int(np.argmax(dm))  # global row-major first-max
    cur = divmod(flat, w)
    rows = {"step": [], "gr": [], "gc": [], "dist": []}
    d_cur = float(dist[cur])
    guard = h * w
    while True:
        rows["step"].append(len(rows["step"]))
        rows["gr"].append(int(cur[0]))
        rows["gc"].append(int(cur[1]))
        rows["dist"].append(round(d_cur, 6))
        if d_cur == 0.0 or len(rows["step"]) > guard:
            break
        best = None
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = cur[0] + dr, cur[1] + dc
                dv = (float(dist[nr, nc])
                      if 0 <= nr < h and 0 <= nc < w else np.inf)
                if best is None or dv < best[0]:
                    best = (dv, nr, nc)
        if best is None or best[0] >= d_cur:
            break
        d_cur = best[0]
        cur = (best[1], best[2])
    _write_atomic(
        pa.table(
            {
                "step": pa.array(rows["step"], pa.int64()),
                "gr": pa.array(rows["gr"], pa.int64()),
                "gc": pa.array(rows["gc"], pa.int64()),
                "dist": pa.array(rows["dist"], pa.float64()),
            }
        ),
        os.path.join(out, "witness_costpath.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_pnm_witness(tag: str, out: str) -> None:
    """media_image_features_pnm witness: PNM is LOSSLESS and the corpus
    shares ``tiff_fake_plane``, so the witness is the tiff computation
    with the 'p' id prefix — still formula-only, codec never touched
    (container correctness evidenced in ``tests/test_pnm.py``)."""
    done = os.path.join(out, "_PNM_WITNESS_V1")
    if os.path.exists(done):
        return
    from .stages.multimodal import tiff_fake_plane

    rows = {"image_id": [], "mean": [], "std": [], "p_low": [], "p_high": [],
            "edge_energy": []}
    for i in range(12):
        a = tiff_fake_plane(i, 40, 32).astype(np.float64)
        v = a[np.isfinite(a)]
        rows["image_id"].append(f"p{i:04d}")
        rows["mean"].append(round(float(v.mean()), 6))
        rows["std"].append(round(float(v.std()), 6))
        rows["p_low"].append(round(float(np.percentile(v, 5)), 6))
        rows["p_high"].append(round(float(np.percentile(v, 95)), 6))
        plane = a if a.ndim == 2 else a[..., 0]
        gx = np.diff(plane, axis=1)
        gy = np.diff(plane, axis=0)
        rows["edge_energy"].append(
            round(float(np.nansum(gx * gx) + np.nansum(gy * gy)), 4)
        )
    _write_atomic(
        pa.table(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "mean": pa.array(rows["mean"], pa.float64()),
                "std": pa.array(rows["std"], pa.float64()),
                "p_low": pa.array(rows["p_low"], pa.float64()),
                "p_high": pa.array(rows["p_high"], pa.float64()),
                "edge_energy": pa.array(rows["edge_energy"], pa.float64()),
            }
        ),
        os.path.join(out, "witness_media_image_pnm.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_avi_witness(tag: str, out: str) -> None:
    """media_frame_sample_avi witness (own marker → in-place upgrade).

    The AVI container is LOSSLESS, so the witness computes each sampled
    frame's features straight from the GENERATOR FORMULA
    (``avi_fake_frames``) — RIFF walking, bottom-up DIB rows, stride
    padding and palette are never touched here; their correctness is
    evidenced independently in ``tests/test_avi.py`` (hand-built streams
    with pencil-derived row order/stride/palette)."""
    done = os.path.join(out, "_AVI_WITNESS_V1")
    if os.path.exists(done):
        return
    from .stages.multimodal import avi_fake_frames

    rows = {"video_id": [], "frame_idx": [], "mean": [], "std": []}
    for v in range(8):
        frames = avi_fake_frames(v, 24, 18 + v % 3, 25).astype(np.float64)
        for k in range(0, 25, 10):
            a = frames[k]
            rows["video_id"].append(f"a{v:04d}")
            rows["frame_idx"].append(k)
            rows["mean"].append(round(float(a.mean()), 6))
            rows["std"].append(round(float(a.std()), 6))
    _write_atomic(
        pa.table(
            {
                "video_id": pa.array(rows["video_id"], pa.string()),
                "frame_idx": pa.array(rows["frame_idx"], pa.int64()),
                "mean": pa.array(rows["mean"], pa.float64()),
                "std": pa.array(rows["std"], pa.float64()),
            }
        ),
        os.path.join(out, "witness_media_frames_avi.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_viewshed_witness(tag: str, out: str) -> None:
    """viewshed_coverage witness (own marker → in-place upgrade).

    SCALAR reproduction of the R3 spec in ``stages/viewshed.py``'s module
    docstring: per target a plain per-sample Python loop, bilinear with
    the same expression (a zero-weight NaN corner poisons the sample both
    sides), strict-< blocking, observed over the whole assembled truth
    grid — no window gather, no vectorized fancy-indexing."""
    done = os.path.join(out, "_VIEWSHED_WITNESS_V1")
    if os.path.exists(done):
        return
    import pyarrow.parquet as _pq

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    full = assemble_truth(scheme)
    g = scheme.grid
    ga = _pq.read_table(os.path.join(out, "gauges.parquet")).to_pandas()
    from .grid import map2sub

    R, mast = 12, 2.0
    rows = {"obs_id": [], "n_cells": [], "n_visible": [], "sum_vis_z": []}
    for _, o in ga.iterrows():
        orow, ocol = map2sub(float(o["x"]), float(o["y"]), g)
        orow, ocol = int(orow), int(ocol)
        if not (0 <= orow < g.nrows and 0 <= ocol < g.ncols):
            continue
        if not np.isfinite(full[orow, ocol]):
            continue
        z_o = full[orow, ocol] + mast
        n_cells = n_vis = 0
        s_vis = 0.0
        for tr in range(max(0, orow - R), min(g.nrows, orow + R + 1)):
            for tc in range(max(0, ocol - R), min(g.ncols, ocol + R + 1)):
                dr, dc = tr - orow, tc - ocol
                if dr * dr + dc * dc > R * R or (dr == 0 and dc == 0):
                    continue
                if not np.isfinite(full[tr, tc]):
                    continue
                n_cells += 1
                dist = np.sqrt(float(tr - orow) ** 2.0
                               + float(tc - ocol) ** 2.0)
                tslope = (full[tr, tc] - z_o) / dist
                n = max(abs(dr), abs(dc))
                vis = True
                for k in range(1, n):
                    t = k / n
                    fr = orow + (tr - orow) * t
                    fc = ocol + (tc - ocol) * t
                    r0, c0 = int(np.floor(fr)), int(np.floor(fc))
                    r1 = min(r0 + 1, g.nrows - 1)
                    c1 = min(c0 + 1, g.ncols - 1)
                    wr, wc = fr - r0, fc - c0
                    zi = (full[r0, c0] * (1 - wr) * (1 - wc)
                          + full[r0, c1] * (1 - wr) * wc
                          + full[r1, c0] * wr * (1 - wc)
                          + full[r1, c1] * wr * wc)
                    d = np.sqrt((fr - orow) ** 2 + (fc - ocol) ** 2)
                    s = (zi - z_o) / d
                    if np.isfinite(s) and s >= tslope:
                        vis = False
                        break
                if vis:
                    n_vis += 1
                    s_vis += full[tr, tc]
        rows["obs_id"].append(str(o["gauge_id"]))
        rows["n_cells"].append(n_cells)
        rows["n_visible"].append(n_vis)
        rows["sum_vis_z"].append(round(float(s_vis), 2))
    _write_atomic(
        pa.table(
            {
                "obs_id": pa.array(rows["obs_id"], pa.string()),
                "n_cells": pa.array(rows["n_cells"], pa.int64()),
                "n_visible": pa.array(rows["n_visible"], pa.int64()),
                "sum_vis_z": pa.array(rows["sum_vis_z"], pa.float64()),
            }
        ),
        os.path.join(out, "witness_viewshed.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ensure_wav_witness(tag: str, out: str) -> None:
    """media_audio_features_wav witness (own marker → in-place upgrade).

    Independence split: the witness rebuilds each clip's QUANTIZED sample
    arrays straight from the generator formula (``_fake_wav_samples``) and
    applies the published decode math (q/32768, (q8-128)/128, channel-mean
    downmix) plus the feature formulas — it never touches the RIFF
    container or the stdlib ``wave`` parser the engine decodes with.
    Container-parse correctness is evidenced separately by hand-built
    RIFF bytes in ``tests/test_multimodal.py``."""
    done = os.path.join(out, "_WAV_WITNESS_V1")
    if os.path.exists(done):
        return
    from .stages.multimodal import _fake_wav_samples

    sr, seconds, n_clips = 8000, 0.5, 32
    rows = {"audio_id": [], "rms": [], "peak": [], "zcr": [], "dom_freq": []}
    for c in range(n_clips):
        kind, chans = _fake_wav_samples(c, sr, seconds)
        if kind == 2:
            scaled = [(ch.astype(np.float64) - 128.0) / 128.0 for ch in chans]
        else:
            scaled = [ch.astype(np.float64) / 32768.0 for ch in chans]
        x = np.mean(scaled, axis=0)
        spec = np.abs(np.fft.rfft(x))
        spec[0] = 0.0
        rows["audio_id"].append(f"w{c:04d}")
        rows["rms"].append(round(float(np.sqrt((x * x).mean())), 6))
        rows["peak"].append(round(float(np.abs(x).max()), 6))
        rows["zcr"].append(round(float((np.diff(np.signbit(x)) != 0).mean()), 6))
        rows["dom_freq"].append(round(float(np.argmax(spec) * sr / x.size), 6))
    _write_atomic(
        pa.table(
            {
                "audio_id": pa.array(rows["audio_id"], pa.string()),
                "rms": pa.array(rows["rms"], pa.float64()),
                "peak": pa.array(rows["peak"], pa.float64()),
                "zcr": pa.array(rows["zcr"], pa.float64()),
                "dom_freq": pa.array(rows["dom_freq"], pa.float64()),
            }
        ),
        os.path.join(out, "witness_media_audio_wav.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _ref_mulaw_encode_scalar(x: int) -> int:
    """Scalar REFERENCE G.711 mu-law encoder, derived differently from
    the engine's vectorized bit-test loop: segment index from Python
    ``int.bit_length`` on the biased magnitude (ITU-T G.711 Table 2a's
    segment boundaries are exactly the powers of two of the biased
    value), mantissa by shift, one's-complement output byte."""
    sign = 0x80 if x < 0 else 0x00
    biased = min(abs(int(x)), 32635) + 132
    seg = max(biased.bit_length() - 8, 0)
    mant = (biased >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant)) & 0xFF


def _ref_mulaw_decode_table() -> np.ndarray:
    """256-entry REFERENCE decode table from the published 14-bit-domain
    formula ``((2·mant + 33) << seg − 33) × 4`` (G.711 Table 2a read
    back), a different algebraic form from the engine's
    ``((mant·8)+0x84)<<exp − 0x84`` expansion."""
    tab = np.empty(256, dtype=np.int64)
    for b in range(256):
        u = (~b) & 0xFF
        seg = (u >> 4) & 0x07
        mant = u & 0x0F
        mag14 = ((2 * mant + 33) << seg) - 33
        tab[b] = -4 * mag14 if (u & 0x80) else 4 * mag14
    return tab


def _ensure_mulaw_witness(tag: str, out: str) -> None:
    """media_audio_features_mulaw witness (own marker → in-place upgrade).

    Independence split: rebuilds each clip's QUANTIZED int16-domain
    samples straight from the generator formula, compands them through a
    scalar reference G.711 encoder (bit_length segment derivation) and a
    table decoder built from the published 14-bit formula — never touching
    the engine's vectorized ``mulaw_encode``/``mulaw_decode`` — then
    applies the feature formulas. Codec-math agreement between the two
    derivations is additionally pinned byte-exactly in
    ``tests/test_multimodal.py``."""
    done = os.path.join(out, "_MULAW_WITNESS_V1")
    if os.path.exists(done):
        return
    sr, seconds, n_clips = 8000, 0.5, 32
    dec_tab = _ref_mulaw_decode_table()
    n = int(sr * seconds)
    t = np.arange(n) / sr
    rows = {"audio_id": [], "rms": [], "peak": [], "zcr": [], "dom_freq": []}
    for c in range(n_clips):
        f0 = 170.0 + 37.0 * c
        f1 = 610.0 + 53.0 * c
        xf = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.25 * np.sin(2 * np.pi * f1 * t)
        q = np.round(xf * 32767.0).astype(np.int64)
        codes = np.array([_ref_mulaw_encode_scalar(v) for v in q], dtype=np.int64)
        x = dec_tab[codes].astype(np.float64) / 32768.0
        spec = np.abs(np.fft.rfft(x))
        spec[0] = 0.0
        rows["audio_id"].append(f"m{c:04d}")
        rows["rms"].append(round(float(np.sqrt((x * x).mean())), 6))
        rows["peak"].append(round(float(np.abs(x).max()), 6))
        rows["zcr"].append(round(float((np.diff(np.signbit(x)) != 0).mean()), 6))
        rows["dom_freq"].append(round(float(np.argmax(spec) * sr / x.size), 6))
    _write_atomic(
        pa.table(
            {
                "audio_id": pa.array(rows["audio_id"], pa.string()),
                "rms": pa.array(rows["rms"], pa.float64()),
                "peak": pa.array(rows["peak"], pa.float64()),
                "zcr": pa.array(rows["zcr"], pa.float64()),
                "dom_freq": pa.array(rows["dom_freq"], pa.float64()),
            }
        ),
        os.path.join(out, "witness_media_audio_mulaw.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def _write_atomic(table: pa.Table, path: str) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


# tag → (n_tile_rows, n_tile_cols): scale ladder matching the driver's sf dirs
SCALES = {"sf0.001": (4, 4), "sf0.01": (8, 8), "sf0.1": (16, 16)}
FIXTURE_ROOT = "/tmp/graft_fixtures"


def _ensure_s2_witness(tag: str, out: str) -> None:
    """s2_cell_counts witness (own marker → in-place upgrade).

    Scalar reproduction of the S2 tile-footprint assignment: per tile,
    center easting/northing (same float expression as the query), one
    array call of the BNG inverse (the engine always warps arrays — numpy's
    scalar transcendental path can differ by 1 ulp), then the INDEPENDENT
    per-point curve walk ``s2.leaf_scalar`` + scalar parent/token
    arithmetic. Aggregated with a plain dict."""
    done = os.path.join(out, "_S2_WITNESS_V2")
    if os.path.exists(done):
        return
    from . import s2
    from .stages.reproject import bng_tmerc

    tr_n, tc_n = SCALES.get(tag, SCALES["sf0.01"])
    scheme = make_scheme(tr_n, tc_n)
    g = scheme.grid
    level = 14
    new_lsb = 1 << (2 * (s2.MAX_LEVEL - level))
    ids, xcs, ycs = [], [], []
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            gr0, gc0 = tr * scheme.tile_h, tc * scheme.tile_w
            h = min(scheme.tile_h, g.nrows - gr0)
            w = min(scheme.tile_w, g.ncols - gc0)
            ids.append(f"t{tr:04d}_{tc:04d}")
            xcs.append(g.xllcorner + (float(gc0) + float(w) / 2.0) * g.cellsize)
            ycs.append(g.yllcorner + (g.nrows - float(gr0) - float(h) / 2.0) * g.cellsize)
    lon, lat = bng_tmerc.inverse(np.asarray(xcs), np.asarray(ycs))
    acc: dict[int, list] = {}
    for k, iid in enumerate(ids):
        leaf = s2.leaf_scalar(float(lon[k]), float(lat[k]))
        cell = (leaf & ~(new_lsb - 1) & ~new_lsb) | new_lsb
        a = acc.setdefault(cell, [0, iid])
        a[0] += 1
        a[1] = min(a[1], iid)
    cells = sorted(acc)
    _write_atomic(
        pa.table(
            {
                "cell_token": pa.array(
                    [format(c, "016x").rstrip("0") or "X" for c in cells], pa.string()
                ),
                "n_tiles": pa.array([acc[c][0] for c in cells], pa.int64()),
                "min_tile": pa.array([acc[c][1] for c in cells], pa.string()),
            }
        ),
        os.path.join(out, "witness_s2_cells.parquet"),
    )

    # ---- footprint cover: 3×3 boundary-inclusive sample lattice per tile,
    # per-tile cell dedupe, per-cell tile counts (query q_s2_footprint_cover;
    # same float expression order, scalar curve walk) ----
    S = 3
    f = np.linspace(0.0, 1.0, S)
    sx, sy, tile_k = [], [], []
    k = 0
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            gr0, gc0 = tr * scheme.tile_h, tc * scheme.tile_w
            h = min(scheme.tile_h, g.nrows - gr0)
            w = min(scheme.tile_w, g.ncols - gc0)
            x0 = g.xllcorner + float(gc0) * g.cellsize
            y1 = g.yllcorner + (g.nrows - float(gr0)) * g.cellsize
            for fx in f:
                for fy in f:
                    sx.append(x0 + (float(w) * g.cellsize) * fx)
                    sy.append(y1 - (float(h) * g.cellsize) * fy)
                    tile_k.append(k)
            k += 1
    lon2, lat2 = bng_tmerc.inverse(np.asarray(sx), np.asarray(sy))
    per_tile: dict[int, set] = {}
    for j, tk in enumerate(tile_k):
        leaf = s2.leaf_scalar(float(lon2[j]), float(lat2[j]))
        cell = (leaf & ~(new_lsb - 1) & ~new_lsb) | new_lsb
        per_tile.setdefault(tk, set()).add(cell)
    cover: dict[int, int] = {}
    for cells_of in per_tile.values():
        for c in cells_of:
            cover[c] = cover.get(c, 0) + 1
    ccells = sorted(cover)
    _write_atomic(
        pa.table(
            {
                "cell_token": pa.array(
                    [format(c, "016x").rstrip("0") or "X" for c in ccells],
                    pa.string(),
                ),
                "n_tiles": pa.array([cover[c] for c in ccells], pa.int64()),
            }
        ),
        os.path.join(out, "witness_s2_cover.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")


def ensure_fixture_dir(tag: str, root: str = FIXTURE_ROOT) -> str:
    """Idempotently materialize the fixture Parquet set for a scale tag.

    Files: tiles.parquet (input_hint schema), tiles_dup.parquet (exact-dup
    rows), pixels.parquet (decoded truth), gauges.parquet, zones.parquet,
    mosaic{0,1,2}.parquet + mosaic{0,1,2}_pixels.parquet. Returns the dir.
    """
    tr, tc = SCALES.get(tag, SCALES["sf0.01"])
    out = os.path.join(root, tag)
    done = os.path.join(out, "_COMPLETE")
    if not os.path.exists(done):
        scheme = make_scheme(tr, tc)
        _write_atomic(tiles_table(scheme), os.path.join(out, "tiles.parquet"))
        _write_atomic(tiles_table(scheme, dup_mod=7), os.path.join(out, "tiles_dup.parquet"))
        _write_atomic(pixels_table(scheme), os.path.join(out, "pixels.parquet"))
        _write_atomic(gauges_table(scheme, 25), os.path.join(out, "gauges.parquet"))
        _write_atomic(zones_table(scheme), os.path.join(out, "zones.parquet"))
        for i, ms in enumerate(mosaic_schemes()):
            _write_atomic(tiles_table(ms), os.path.join(out, f"mosaic{i}.parquet"))
            _write_atomic(pixels_table(ms), os.path.join(out, f"mosaic{i}_pixels.parquet"))
        with open(done, "w") as f:
            f.write("ok\n")
    _ensure_tile_witnesses(tag, out)
    _ensure_knn_fixture(tag, out)
    _ensure_r4_witnesses(tag, out)
    _ensure_salt_witness(tag, out)
    _ensure_terrain_witnesses(tag, out)
    _ensure_png16_witness(tag, out)
    _ensure_focal_witness(tag, out)
    _ensure_augment_witness(tag, out)
    _ensure_flowdir_witness(tag, out)
    _ensure_basin_witness(tag, out)
    _ensure_depression_witness(tag, out)
    _ensure_stream_witness(tag, out)
    _ensure_lcc_witness(tag, out)
    _ensure_s2_witness(tag, out)
    _ensure_jpeg_witness(tag, out)
    _ensure_gif_witness(tag, out)
    _ensure_wav_witness(tag, out)
    _ensure_mulaw_witness(tag, out)
    _ensure_tiff_witness(tag, out)
    _ensure_avi_witness(tag, out)
    _ensure_viewshed_witness(tag, out)
    _ensure_pnm_witness(tag, out)
    _ensure_costdist_witness(tag, out)
    _ensure_costpath_witness(tag, out)
    _ensure_spectral_witness(tag, out)
    _ensure_epsg_witness(tag, out)
    return out


def write_bench_tiles(
    path: str,
    n_tile_rows: int = 36,
    n_tile_cols: int = 36,
    tile_h: int = 256,
    tile_w: int = 256,
) -> TileScheme:
    """Generate the bench-scale tiles Parquet DISTRIBUTED (a Ray pipeline:
    range over tile ids → build rows per batch → write_parquet), idempotent
    via a _COMPLETE marker. Deterministic: same formulas as the test fixture,
    square tiles (no ragged edge) for clean throughput accounting."""
    import ray.data

    scheme = make_scheme(
        n_tile_rows, n_tile_cols, tile_h, tile_w, ragged=False
    )
    done = os.path.join(path, "_COMPLETE")
    if os.path.exists(done):
        return scheme

    n_cols_t = scheme.n_tile_cols

    def build(batch):
        import pyarrow as pa

        ids, bufs, ws, hs, fmts, caps, hashes = [], [], [], [], [], [], []
        for k in batch["id"].to_pylist():
            tr, tc = int(k) // n_cols_t, int(k) % n_cols_t
            fmt = tile_fmt(tr)
            z = _raw_tile(scheme, tr, tc)
            buf = codecs.encode(z, fmt)
            h, w = z.shape
            truth = codecs.decode(buf, h, w, fmt)
            img_id = tile_id(tr, tc)
            ids.append(img_id)
            bufs.append(buf)
            ws.append(w)
            hs.append(h)
            fmts.append(fmt)
            caps.append(_caption(img_id, scheme.grid.cellsize))
            hashes.append(codecs.phash64(truth))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(bufs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
                "caption": pa.array(caps, pa.string()),
                "phash": pa.array(hashes, pa.int64()),
            },
            schema=TILES_SCHEMA,
        )

    (
        ray.data.range(scheme.n_tiles, override_num_blocks=max(32, scheme.n_tiles // 16))
        .map_batches(build, batch_format="pyarrow", batch_size=16)
        .write_parquet(path)
    )
    with open(done, "w") as f:
        f.write("ok\n")
    return scheme


def bench_zone_features(scheme: TileScheme, n: int = 64) -> list[dict]:
    """A denser landcover layer for benchmarking: n deterministic skewed
    quadrilaterals scattered over the extent (Halton placement), ids cycling
    over the sample values. Exercises the bbox-pruned multi-feature burn at a
    realistic feature density."""
    ext = scheme.grid.extent
    W = ext[1] - ext[0]
    H = ext[3] - ext[2]
    hx = _halton(n, 2)
    hy = _halton(n, 3)
    hw = _halton(n, 5)
    feats = []
    for k in range(n):
        cx = ext[0] + (0.05 + 0.9 * hx[k]) * W
        cy = ext[2] + (0.05 + 0.9 * hy[k]) * H
        rx = (0.01 + 0.06 * hw[k]) * W
        ry = (0.01 + 0.06 * hw[(k * 7 + 3) % n]) * H
        skew = (hw[k] - 0.5) * rx * 0.5
        ring = [
            [cx - rx, cy - ry + skew],
            [cx + rx, cy - ry - skew],
            [cx + rx - skew, cy + ry],
            [cx - rx + skew, cy + ry - skew / 2],
            [cx - rx, cy - ry + skew],
        ]
        feats.append(
            {
                "feature_id": k,
                "kind": "polygon",
                "rings": [ring],
                "id": (2, 4, 5, 9)[k % 4],
                "adjust_val": (-3.0, 1.25, -7.5, 2.0)[k % 4],
            }
        )
    return feats


def sections_fixture(scheme: TileScheme):
    """Bankline / cross-section polylines replaying sample_data.pkl's shape
    envelope (FIXTURES.md §4): two sinusoidal banks ~21 samples apart with
    parabolic depth profiles across 4 stations. Returns
    (bankline0 (40,2), bankline1 (50,2), crosslines [4 x (21,3)])."""
    ext = scheme.grid.extent
    W = ext[1] - ext[0]
    H = ext[3] - ext[2]
    xc = ext[0] + 0.5 * W
    amp = 0.06 * H
    half_w = 0.05 * H

    def bank(n, sign):
        t = np.linspace(0.1, 0.9, n)
        x = ext[0] + t * W
        y = ext[2] + 0.5 * H + amp * np.sin(t * 4 * np.pi) + sign * half_w
        return np.c_[x, y]

    bank0 = bank(40, +1.0)
    bank1 = bank(50, -1.0)
    crosslines = []
    for k, t in enumerate(np.linspace(0.2, 0.8, 4)):
        x = ext[0] + t * W
        yc = ext[2] + 0.5 * H + amp * np.sin(t * 4 * np.pi)
        s = np.linspace(-1.0, 1.0, 21)
        y = yc + s * half_w
        z = analytic_z(np.full(21, x), y, scheme.grid) - 8.0 * (1 - s**2)
        crosslines.append(np.c_[np.full(21, x), y, z])
    return bank0, bank1, crosslines
