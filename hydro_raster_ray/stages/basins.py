"""Distributed D8 basin (watershed) delineation — terminal contraction.

``oracle.basin_labels`` defines the semantics: every finite cell is
labeled with the global flat index of the pit/flat cell where its D8 path
ends (the watershed partition of the DEM); NaN holes stay NaN. This is
the same Barnes-style tile contraction as ``stages/flowacc.py`` — the
reference's toolkit stops at DEM conditioning for its flood model, so the
operator family is engine-defined (public D8 literature semantics) — but
contracted over TERMINALS instead of amounts:

1. **Pass 1 (haloed map, ``halo.halo_map``, corner strips)**: per tile,
   one ascending-z sweep (``flowacc._tile_flow(want_term=True)``) gives
   every cell's in-tile terminal. Emits only border rows: per EXIT cell
   the link (exit gid → receiver gid in the neighbor tile) and per
   border-ring cell its in-tile terminal (ring gid → terminal gid, with a
   pit flag — terminal is either a true pit or another exit cell).

2. **Border solve (driver)**: exit→receiver→ring-terminal hops form a
   functional graph over border cells (~2 (w+h)/(w·h) of the corpus) that
   is ACYCLIC because flow strictly descends across every hop; memoized
   path-compressed walks resolve each exit cell's final PIT gid in
   O(edges). Driver-side by design at this corpus-per-job scale, same
   growth path as flowacc (recursive tiles-of-tiles contraction).

3. **Pass 2 (haloed map)**: broadcast the resolved ``{exit gid → pit
   gid}`` dict (``ray.put``); per tile the label plane is one vectorized
   take ``final_of[term]`` after patching the few exit cells. Labels are
   global cell ids, which exceed float32's 2²⁴ contiguous-integer range on
   grids past ~16.7 M cells, so label planes are stored ``raw-f64``
   (exact to 2⁵³ cells ≈ 9·10¹⁵ — comfortably past a 100 TB corpus).

``basin_sizes`` fuses pass 2 into per-tile ``(basin, n_cells)`` partial
counts followed by one small ``groupby(basin)`` — exact int64 at any
scale, and the label planes are never materialized at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tiles import TileSet
from .decode import rows_to_table
from .flowacc import _border_ring_flat, _tile_flow
from .halo import halo_map
from .terrain import _Meta

__all__ = ["basin_labels", "basin_sizes"]

_LINK_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = exit link, 1 = ring terminal
        ("src", pa.int64()),  # exit gid / ring-cell gid
        ("dst", pa.int64()),  # receiver gid / terminal gid
        ("pit", pa.bool_()),  # kind 1: terminal is a true pit (not an exit)
    ]
)


def _solve_exit_labels(
    ts: TileSet, halo_broadcast_budget: int, border_budget_rows: int, strips
):
    """Passes 1 + the driver border solve. Returns ``ray.put`` handle of
    the resolved ``{exit gid → pit gid}`` dict."""
    grid = ts.grid
    ncols = grid.ncols

    def pass1(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        _nxt, (ex_cells, ex_tr, ex_tc), _acc, _order, term = _tile_flow(
            win, br, bc, h, w, want_term=True, want_acc=False
        )
        zbody = win[br : br + h, bc : bc + w].ravel()
        g_r0, g_c0 = gr0 - br, gc0 - bc  # window top-left in global coords
        kind, src, dst, pit = [], [], [], []
        exit_set = set(int(x) for x in ex_cells)
        for j in range(ex_cells.size):
            u = int(ex_cells[j])
            kind.append(0)
            src.append((gr0 + u // w) * ncols + (gc0 + u % w))
            dst.append((g_r0 + int(ex_tr[j])) * ncols + (g_c0 + int(ex_tc[j])))
            pit.append(False)
        for v in _border_ring_flat(h, w):
            if not np.isfinite(zbody[v]):
                continue
            t = term[v]
            kind.append(1)
            src.append((gr0 + v // w) * ncols + (gc0 + v % w))
            dst.append((gr0 + t // w) * ncols + (gc0 + t % w))
            pit.append(t not in exit_set)
        if not kind:
            return None
        return pa.table(
            {
                "kind": pa.array(kind, pa.int8()),
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "pit": pa.array(pit, pa.bool_()),
            },
            schema=_LINK_SCHEMA,
        )

    links = halo_map(
        ts, pass1, corners=True, budget_bytes=halo_broadcast_budget,
        strips=strips,
    )

    kb, sb, db, pb = [], [], [], []
    n_rows = 0
    for b in links.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_rows += b.num_rows
        if n_rows > border_budget_rows:  # pragma: no cover - budget guard
            raise MemoryError(
                f"border link table exceeds budget {border_budget_rows}; "
                "apply the recursive tiles-of-tiles contraction (module note)"
            )
        kb.append(b["kind"].to_numpy())
        sb.append(b["src"].to_numpy())
        db.append(b["dst"].to_numpy())
        pb.append(b["pit"].to_numpy(zero_copy_only=False))
    if kb:
        kind = np.concatenate(kb)
        src = np.concatenate(sb)
        dst = np.concatenate(db)
        pit = np.concatenate(pb)
    else:
        kind = src = dst = np.empty(0, dtype=np.int64)
        pit = np.empty(0, dtype=bool)

    # fully vectorized solve: compose exit → (receiver's ring terminal)
    # hops by pointer DOUBLING — the chain graph is a forest (flow
    # strictly descends across every hop), so log₂(longest chain) rounds
    # resolve every exit's pit gid with no per-row Python walk.
    m1 = kind == 1
    ring_o = np.argsort(src[m1], kind="stable")
    ring_src = src[m1][ring_o]
    ring_term = dst[m1][ring_o]
    ring_pit = pit[m1][ring_o]
    m0 = kind == 0
    ex_o = np.argsort(src[m0], kind="stable")
    U = src[m0][ex_o]  # sorted exit gids
    R = dst[m0][ex_o]  # their receivers (ring cells of the next tile)
    j = np.searchsorted(ring_src, R)
    T = ring_term[j] if ring_src.size else R
    P = ring_pit[j] if ring_src.size else np.zeros(0, dtype=bool)
    lab = np.where(P, T, -1)
    done = P.copy()
    ptr = np.full(U.size, -1, dtype=np.int64)
    if U.size:
        nx = np.searchsorted(U, T)
        ptr[~P] = nx[~P]  # T is itself an exit gid of the receiving tile
    while not done.all():
        act = np.flatnonzero(~done)
        p = ptr[act]
        fin = done[p]
        lab[act[fin]] = lab[p[fin]]
        done[act[fin]] = True
        rest = act[~fin]
        ptr[rest] = ptr[ptr[rest]]

    import ray as _ray

    return _ray.put(dict(zip(U.tolist(), lab.tolist())))


def _label_plane(aref, ncols, gr0, gc0, h, w, win, br, bc) -> np.ndarray:
    """One tile's basin-label plane (float64, NaN holes) from the broadcast
    exit-label dict — vectorized ``final_of[term]`` take."""
    import ray as _ray

    lbl = _ray.get(aref)
    _nxt, (ex_cells, _tr, _tc), _acc, _order, term = _tile_flow(
        win, br, bc, h, w, want_term=True, want_acc=False
    )
    zf = win[br : br + h, bc : bc + w].ravel()
    idx = np.arange(h * w, dtype=np.int64)
    cellgid = (gr0 + idx // w) * ncols + (gc0 + idx % w)
    final = cellgid.astype(np.float64)
    for u in ex_cells.tolist():  # border-scale loop: |exits| ≤ ring size
        final[u] = lbl[int(cellgid[u])]
    lab = final[np.asarray(term, dtype=np.int64)]
    lab[np.isnan(zf)] = np.nan
    return lab.reshape(h, w)


def basin_labels(
    ts: TileSet,
    halo_broadcast_budget: int = 256 << 20,
    border_budget_rows: int = 50_000_000,
) -> TileSet:
    """D8 watershed labeling over the mosaic (see module docstring):
    ``raw-f64`` tiles whose pixels are the terminal-pit global cell ids."""
    from .halo import collect_strips

    grid = ts.grid
    ncols = grid.ncols
    # one strip collection serves both haloed passes (see flowacc)
    strips = collect_strips(ts, halo_broadcast_budget, corners=True)
    aref = _solve_exit_labels(
        ts, halo_broadcast_budget, border_budget_rows, strips
    )

    def pass2(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        lab = _label_plane(aref, ncols, gr0, gc0, h, w, win, br, bc)
        meta = _Meta(
            f"t{t_tr:04d}_{t_tc:04d}", t_tr, t_tc, gr0, gc0, h, w, "basin d8"
        )
        return rows_to_table([(meta, lab)], fmt="raw-f64")

    out = halo_map(
        ts, pass2, corners=True, budget_bytes=halo_broadcast_budget,
        strips=strips,
    )
    return TileSet(ds=out, grid=grid)


def basin_sizes(
    ts: TileSet,
    halo_broadcast_budget: int = 256 << 20,
    border_budget_rows: int = 50_000_000,
):
    """Per-basin cell counts ``(basin:int64, n_cells:int64)`` — pass 2
    fused into per-tile partial counts, then one groupby over ~n_basins
    rows. Exact at any scale (never stores labels in a float plane)."""
    from ray.data.aggregate import Sum

    from .halo import collect_strips

    grid = ts.grid
    ncols = grid.ncols
    strips = collect_strips(ts, halo_broadcast_budget, corners=True)
    aref = _solve_exit_labels(
        ts, halo_broadcast_budget, border_budget_rows, strips
    )

    def pass2(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        lab = _label_plane(aref, ncols, gr0, gc0, h, w, win, br, bc).ravel()
        vals = lab[np.isfinite(lab)]
        if not vals.size:
            return None
        u, cnt = np.unique(vals, return_counts=True)
        return pa.table(
            {
                "basin": pa.array(u.astype(np.int64), pa.int64()),
                "n_cells": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = halo_map(
        ts, pass2, corners=True, budget_bytes=halo_broadcast_budget,
        strips=strips,
    )
    return partials.groupby("basin").aggregate(Sum("n_cells", alias_name="n_cells"))
