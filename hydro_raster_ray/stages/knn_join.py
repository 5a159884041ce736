"""Distributed (partitioned) kNN gauge-to-cell join — the large-gauge path.

``stages/interpolate.py`` broadcasts the gauge table to every actor
(``ray.put`` once, index per actor) — correct while gauges fit a worker's
heap. This module is the SURVEY §2.7-committed scale path for gauge tables
too big to broadcast (millions of sensors): hash-partition BOTH sides by a
spatial cell and replicate gauges into the neighbor cells that could hold a
cell's k nearest — the "kNN guarantee via ring expansion" design
(``Raster.py:409-429`` is the reference semantics; the reference itself
broadcasts because it is single-process).

Topology (no gauge broadcast anywhere):

1. **Tile meta pass** (payloads pruned at the read — the surface is a
   function of geometry only): each tile maps to ONE target cell
   (``tile_row // T, tile_col // T``); a tiny groupby computes each target
   cell's pixel-extent rectangle.
2. **Gauge bucketing**: gauges get a nominal uniform source bucket
   (floor-divide by the median target-cell edge); a tiny groupby counts
   gauges per occupied bucket. Only the (cell → count) table — O(cells),
   not O(gauges) — reaches the driver.
3. **Replication plan** (driver, vectorized numpy): for every target cell,
   sort occupied source buckets by rect-to-rect MAX distance, take the
   shortest prefix holding ≥ k gauges → bound D on the true per-pixel
   k-th-NN distance (those ≥ k gauges are all within D of EVERY pixel in
   the target rect); include every bucket whose rect-to-rect MIN distance
   is ≤ D. The included buckets provably contain the exact kNN of every
   pixel in the cell. Plan size is O(cells × replication factor) — tiny —
   and is broadcast with ``ray.put``. (The plan loop here scores every
   occupied bucket per target — fine up to ~10⁴ cells; beyond that the
   same scoring restricts to an expanding ring neighborhood, which the
   D-bound caps at a few rings for any non-degenerate density.)
4. **Replicated shuffle**: one ``map_batches`` over gauges emits (tgt_cell,
   gid, x, y, value) per plan entry; a tagged UNION with the tile-meta rows
   and ONE ``groupby(tgt_cell).map_groups`` co-locates each cell's tiles
   with exactly the gauges that can matter. No ``Dataset.join`` at all:
   cell keys are LOW-cardinality at test scale and an Arrow hash-join
   partition that receives zero shards dies (``stages/cc.py`` module
   docstring); ``map_groups``'s one-Python-call-per-key cost is paid per
   CELL (coarse, ~#partitions), not per row.
5. **Per-cell kernel**: gauges x-sorted once per group; per pixel chunk a
   bbox+margin candidate window (doubling until every pixel's k-th
   candidate distance ≤ margin — an EXACT cutoff: a gauge outside
   bbox+margin is farther than margin from every chunk pixel), then
   vectorized k-selection.

Determinism contract (shared with the oracle witness,
``oracle.knn_idw_canonical``): the k nearest gauges are unique
(fixtures use Halton points — no distance ties); the IDW value is computed
with terms ordered by ASCENDING gauge id, ``w = 1/max(d2,eps)^(p/2)``,
``Σwv/Σw`` via ``np.sum(axis=1)`` over the (n,k) term matrix — identical
floating-point sequences on both sides, so per-pixel values are
bit-identical and the raw-f32 per-tile sums hash-match.

Skew note: a pathological hot cell (most gauges at one point) concentrates
its pack in one group — bound it by shrinking ``tiles_per_cell`` (more,
smaller cells) or pre-splitting the hot bucket; tile-side work stays
balanced because each group holds at most T² tiles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min

from ..sources.tiles import TileSet
from .cc import coerce_schema
from .decode import iter_tile_meta, rows_to_table

__all__ = ["knn_idw_partitioned"]

_CHUNK = 4096
_OFF = 1 << 20  # bucket-index offset so slightly-out-of-extent gauges stay valid


def _cell_id(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return (cy.astype(np.int64) + _OFF) * (1 << 21) + (cx.astype(np.int64) + _OFF)


def _knn_idw_chunk(px, py, gx, gy, gv, gid, k_eff, power, eps, m0):
    """Exact kNN-IDW for one pixel chunk; gauges sorted by x (ascending)."""
    xmin, xmax = float(px.min()), float(px.max())
    ymin, ymax = float(py.min()), float(py.max())
    m = m0
    while True:
        lo = int(np.searchsorted(gx, xmin - m))
        hi = int(np.searchsorted(gx, xmax + m, side="right"))
        msk = (gy[lo:hi] >= ymin - m) & (gy[lo:hi] <= ymax + m)
        cx = gx[lo:hi][msk]
        full = lo == 0 and hi == gx.size and bool(msk.all())
        if cx.size >= k_eff:
            cy_ = gy[lo:hi][msk]
            cv = gv[lo:hi][msk]
            cg = gid[lo:hi][msk]
            d2 = (px[:, None] - cx[None, :]) ** 2 + (py[:, None] - cy_[None, :]) ** 2
            if cx.size > k_eff:
                part = np.argpartition(d2, k_eff - 1, axis=1)[:, :k_eff]
            else:
                part = np.broadcast_to(
                    np.arange(k_eff), (px.size, k_eff)
                ).copy()
            d2s = np.take_along_axis(d2, part, axis=1)
            # exact cutoff: every pixel's k-th candidate within the margin
            # ⇒ no gauge outside the window can enter its kNN
            if full or float(d2s.max()) <= m * m:
                o = np.argsort(cg[part], axis=1, kind="stable")  # gid order
                d2o = np.take_along_axis(d2s, o, axis=1)
                vo = np.take_along_axis(cv[part], o, axis=1)
                d2c = np.maximum(d2o, eps)
                # power=2 ⇒ exponent 1.0: IEEE pow(x, 1) == x exactly, so
                # the division shortcut is bit-identical to the pow form
                w = 1.0 / (d2c if power == 2.0 else np.power(d2c, power * 0.5))
                vals = (w * vo).sum(axis=1) / w.sum(axis=1)
                jm = np.argmin(d2o, axis=1)
                rows = np.arange(px.size)
                hit = d2o[rows, jm] <= eps
                if hit.any():
                    vals[hit] = vo[rows[hit], jm[hit]]
                return vals
        if full:  # fewer gauges than k_eff can't happen (k_eff ≤ pack size)
            raise AssertionError("kNN window exhausted the pack")
        m *= 2.0


def _knn_idw_points(px, py, gx, gy, gv, gid, k, power, eps, shape=None):
    """Exact kNN-IDW of query points vs an UNSORTED gauge pack.

    ``shape=(h, w)`` declares that ``px/py`` are a C-order raster — chunks
    are then SQUARE pixel blocks instead of flat (row-strip) slices, which
    shrinks each chunk's bbox and with it the candidate window (a 64×64
    block's window holds ~3× fewer candidates than a 16×256 strip's at the
    same margin). The initial margin is 2× the expected k-th-neighbor
    radius under uniform density ``sqrt(k·area/(π·n))`` — measured optimum
    of a 1.5–4× sweep (smaller thrashes the doubling retry, larger
    over-scans; the former ``2·sqrt(area·k/n)`` scanned ~4× more
    candidates). The doubling loop keeps EXACTNESS regardless of the
    starting guess — margins affect only performance, never values."""
    n = gx.size
    if n == 0:
        return np.full(px.size, np.nan)
    k_eff = min(k, n)
    xo = np.argsort(gx, kind="stable")
    gx, gy, gv, gid = gx[xo], gy[xo], gv[xo], gid[xo]
    span_x = float(gx[-1] - gx[0])
    span_y = float(gy.max() - gy.min()) if n > 1 else 0.0
    area = max(span_x * span_y, 1.0)
    m0 = max(2.0 * np.sqrt(k_eff * area / (np.pi * n)), 1e-9)
    out = np.empty(px.size)
    if shape is not None:
        h, w = shape
        side = max(1, int(np.sqrt(_CHUNK)))
        pr = px.reshape(h, w)
        pc = py.reshape(h, w)
        orr = out.reshape(h, w)
        for r0 in range(0, h, side):
            for c0 in range(0, w, side):
                blk_x = pr[r0 : r0 + side, c0 : c0 + side].ravel()
                blk_y = pc[r0 : r0 + side, c0 : c0 + side].ravel()
                orr[r0 : r0 + side, c0 : c0 + side] = _knn_idw_chunk(
                    blk_x, blk_y, gx, gy, gv, gid, k_eff, power, eps, m0
                ).reshape(min(side, h - r0), min(side, w - c0))
        return out
    for s in range(0, px.size, _CHUNK):
        e = min(s + _CHUNK, px.size)
        out[s:e] = _knn_idw_chunk(
            px[s:e], py[s:e], gx, gy, gv, gid, k_eff, power, eps, m0
        )
    return out


def _rect_dists(tx0, tx1, ty0, ty1, sx0, sx1, sy0, sy1):
    """(min, max) Euclidean distance between a target rect and each source
    rect (vectorized over sources)."""
    dx = np.maximum(0.0, np.maximum(sx0 - tx1, tx0 - sx1))
    dy = np.maximum(0.0, np.maximum(sy0 - ty1, ty0 - sy1))
    dmin = np.hypot(dx, dy)
    dX = np.maximum(sx1 - tx0, tx1 - sx0)
    dY = np.maximum(sy1 - ty0, ty1 - sy0)
    dmax = np.hypot(dX, dY)
    return dmin, dmax


_UNION_SCHEMA = pa.schema(
    [
        ("tgt_cell", pa.int64()),
        ("is_tile", pa.int8()),
        ("image_id", pa.string()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("gr0", pa.int32()),
        ("gc0", pa.int32()),
        ("cell", pa.int64()),
        ("gid", pa.int64()),
        ("x", pa.float64()),
        ("y", pa.float64()),
        ("value", pa.float64()),
    ]
)


def knn_idw_partitioned(
    ts: TileSet,
    gauges: "ray.data.Dataset",
    k: int = 8,
    power: float = 2.0,
    tiles_per_cell: int = 1,
    eps: float = 1e-12,
) -> TileSet:
    """Partitioned exact kNN-IDW surface over ``ts`` from a LARGE gauge
    Dataset (columns ``gid:int64, x, y, value:float64``) — no broadcast of
    the gauge table; see module docstring for the topology and bound.

    Pass ``ts`` read WITHOUT the payload column (the surface depends on
    geometry only) so tile bytes never leave storage. Returns a TileSet of
    ``raw-f32`` tiles (the interpolated surface)."""
    grid = ts.grid
    T = int(tiles_per_cell)
    top = grid.yllcorner + grid.nrows * grid.cellsize
    cs = grid.cellsize

    # ---- 1. tile meta + target cell rects ---------------------------------
    def add_tgt(t: pa.Table) -> pa.Table:
        tr = t["tile_row"].to_numpy()
        tc = t["tile_col"].to_numpy()
        gr0 = t["gr0"].to_numpy().astype(np.int64)
        gc0 = t["gc0"].to_numpy().astype(np.int64)
        tid = _cell_id(tc // T, tr // T)
        return t.append_column("tgt_cell", pa.array(tid, pa.int64())) \
                .append_column("gr1", pa.array(gr0 + t["h"].to_numpy(), pa.int64())) \
                .append_column("gc1", pa.array(gc0 + t["w"].to_numpy(), pa.int64()))

    meta_cols = [c for c in ts.ds.schema().names if c != "bytes"]
    meta = (
        ts.ds.map_batches(add_tgt, batch_format="pyarrow")
        .map_batches(
            lambda t: t.select(meta_cols + ["tgt_cell", "gr1", "gc1"]),
            batch_format="pyarrow",
        )
        .materialize()  # meta-only (no payloads): read twice (rects + union)
    )
    rects = (
        meta.groupby("tgt_cell")
        .aggregate(
            Min("gc0", alias_name="c0"),
            Max("gc1", alias_name="c1"),
            Min("gr0", alias_name="r0"),
            Max("gr1", alias_name="r1"),
        )
        .to_pandas()  # O(target cells) rows — the driver-side small side
    )
    t_id = rects["tgt_cell"].to_numpy()
    tx0 = grid.xllcorner + rects["c0"].to_numpy() * cs
    tx1 = grid.xllcorner + rects["c1"].to_numpy() * cs
    ty1 = top - rects["r0"].to_numpy() * cs
    ty0 = top - rects["r1"].to_numpy() * cs
    cw = float(np.median(tx1 - tx0))
    ch = float(np.median(ty1 - ty0))

    # ---- 2. gauge source buckets (nominal uniform lattice) ----------------
    x0, y0 = grid.xllcorner, grid.yllcorner

    def src_of(t: pa.Table) -> pa.Table:
        sx = np.floor((t["x"].to_numpy() - x0) / cw).astype(np.int64)
        sy = np.floor((t["y"].to_numpy() - y0) / ch).astype(np.int64)
        return pa.table({"src": pa.array(_cell_id(sx, sy), pa.int64())})

    counts = coerce_schema(
        gauges.map_batches(src_of, batch_format="pyarrow")
        .groupby("src")
        .aggregate(Count(alias_name="n")),
        pa.schema([("src", pa.int64()), ("n", pa.int64())]),
    ).to_pandas()
    if counts.empty:
        raise ValueError("knn_idw_partitioned: empty gauge table")
    s_id = counts["src"].to_numpy()
    s_n = counts["n"].to_numpy()
    scy = s_id // (1 << 21) - _OFF
    scx = s_id % (1 << 21) - _OFF
    sx0 = x0 + scx * cw
    sx1 = sx0 + cw
    sy0 = y0 + scy * ch
    sy1 = sy0 + ch
    total = int(s_n.sum())
    k_eff = min(k, total)

    # ---- 3. replication plan (driver) -------------------------------------
    plan_src: list[np.ndarray] = []
    plan_tgt: list[np.ndarray] = []
    for i in range(t_id.size):
        dmin, dmax = _rect_dists(
            tx0[i], tx1[i], ty0[i], ty1[i], sx0, sx1, sy0, sy1
        )
        order = np.argsort(dmax, kind="stable")
        cum = np.cumsum(s_n[order])
        j = int(np.searchsorted(cum, k_eff))
        D = dmax[order[j]]
        keep = dmin <= D
        plan_src.append(s_id[keep])
        plan_tgt.append(np.full(int(keep.sum()), t_id[i], np.int64))
    psrc = np.concatenate(plan_src)
    ptgt = np.concatenate(plan_tgt)
    o = np.argsort(psrc, kind="stable")
    psrc, ptgt = psrc[o], ptgt[o]
    uniq_src, first = np.unique(psrc, return_index=True)
    offsets = np.concatenate([first, [psrc.size]])
    plan_ref = ray.put((uniq_src, offsets, ptgt))

    # ---- 4. replicate gauges per plan (map-side, broadcast plan) ----------
    def replicate(t: pa.Table) -> pa.Table:
        us, off, tg = ray.get(plan_ref)
        gxx = t["x"].to_numpy()
        gyy = t["y"].to_numpy()
        sx = np.floor((gxx - x0) / cw).astype(np.int64)
        sy = np.floor((gyy - y0) / ch).astype(np.int64)
        src = _cell_id(sx, sy)
        pos = np.searchsorted(us, src)
        pos = np.clip(pos, 0, us.size - 1)
        valid = us[pos] == src
        cnt = np.where(valid, off[pos + 1] - off[pos], 0)
        rows = np.repeat(np.arange(t.num_rows), cnt)
        starts = off[pos]
        flat = (
            np.repeat(starts, cnt)
            + np.arange(int(cnt.sum()))
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        n = rows.size
        return pa.table(
            {
                "tgt_cell": pa.array(tg[flat], pa.int64()),
                "is_tile": pa.array(np.zeros(n, np.int8), pa.int8()),
                "image_id": pa.nulls(n, pa.string()),
                "h": pa.nulls(n, pa.int32()),
                "w": pa.nulls(n, pa.int32()),
                "fmt": pa.nulls(n, pa.string()),
                "caption": pa.nulls(n, pa.string()),
                "tile_row": pa.nulls(n, pa.int32()),
                "tile_col": pa.nulls(n, pa.int32()),
                "gr0": pa.nulls(n, pa.int32()),
                "gc0": pa.nulls(n, pa.int32()),
                "cell": pa.nulls(n, pa.int64()),
                "gid": pa.array(t["gid"].to_numpy()[rows], pa.int64()),
                "x": pa.array(gxx[rows], pa.float64()),
                "y": pa.array(gyy[rows], pa.float64()),
                "value": pa.array(t["value"].to_numpy()[rows], pa.float64()),
            }
        )

    rep = gauges.map_batches(replicate, batch_format="pyarrow")

    def tiles_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "tgt_cell": t["tgt_cell"],
            "is_tile": pa.array(np.ones(n, np.int8), pa.int8()),
        }
        for name in ("image_id", "h", "w", "fmt", "caption", "tile_row",
                     "tile_col", "gr0", "gc0", "cell"):
            cols[name] = t[name]
        cols["gid"] = pa.nulls(n, pa.int64())
        cols["x"] = pa.nulls(n, pa.float64())
        cols["y"] = pa.nulls(n, pa.float64())
        cols["value"] = pa.nulls(n, pa.float64())
        return pa.table(cols)

    tiles_u = meta.map_batches(tiles_side, batch_format="pyarrow")
    union = coerce_schema(tiles_u, _UNION_SCHEMA).union(
        coerce_schema(rep, _UNION_SCHEMA)
    )

    # ---- 5. per-cell kernel ------------------------------------------------
    def compute(t: pa.Table) -> pa.Table:
        is_t = t["is_tile"].to_numpy(zero_copy_only=False) == 1
        tiles_tab = t.filter(pa.array(is_t))
        g_tab = t.filter(pa.array(~is_t))
        gx = g_tab["x"].to_numpy(zero_copy_only=False)
        gy = g_tab["y"].to_numpy(zero_copy_only=False)
        gv = g_tab["value"].to_numpy(zero_copy_only=False)
        gi = g_tab["gid"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = []
        for info in iter_tile_meta(tiles_tab, grid):
            X, Y = info.cell_centres()
            vals = _knn_idw_points(
                X.ravel(), Y.ravel(), gx, gy, gv, gi, k, power, eps,
                shape=(info.h, info.w),
            )
            rows.append((info, vals.reshape(info.h, info.w)))
        if not rows:
            return rows_to_table([]).slice(0, 0)
        return rows_to_table(rows, lossless=True)

    out = union.groupby("tgt_cell").map_groups(compute, batch_format="pyarrow")
    return TileSet(ds=out, grid=grid)
