"""Distributed depression filling (Priority-Flood) — spill-graph contraction.

``oracle.fill_depressions`` defines the semantics (fill every cell to the
minimal water level at which it drains off the global grid edge or into a
NaN hole; 8-connected; pure max/min over input values). A whole-array
priority flood cannot run on a tiled corpus, so the engine uses the
tile-contraction scheme of Barnes 2016 ("Parallel priority-flood
depression filling for trillion cell digital elevation models" — public
literature, pattern only):

1. **Pass 1 (haloed map, ``halo.halo_map``, corner strips)**: per tile, a
   Kruskal sweep in ascending z over the body cells builds the tile's
   SPILL GRAPH — the minimax-path structure between its border-ring cells
   (the seeds) and the OCEAN pseudo-node (global-edge cells and cells
   8-adjacent to a NaN hole). One edge per union of two seeded components
   (a Kruskal tree represents ALL pairwise minimax distances — no
   quadratic pair table), plus vectorized cross-tile edges
   ``(ring cell, halo neighbor, max(z_a, z_b))``. Emits ~3× the ring size
   per tile (~2 % of the corpus at 256² tiles).

2. **Border solve (driver)**: minimax Dijkstra from OCEAN over the union
   of all tile graphs resolves ``L(s)`` — the minimal water level at
   which each ring cell drains globally. Driver-side by design at this
   corpus-per-job scale; the documented growth path is the same
   contraction applied recursively (tiles-of-tiles), as with flowacc.

3. **Pass 2 (plain map, NO halo)**: broadcast ``{ring gid → L}``
   (``ray.put``); per tile the fill is the MORPHOLOGICAL RECONSTRUCTION
   BY EROSION of the elevation from the drain-level marker (seeds at
   ``max(z, L)``, in-tile drains at z, +inf elsewhere): the unique
   fixpoint ``F ≤ marker`` of ``F = max(z, min(F, erode8(F)))`` equals
   ``min over 8-paths to a seed of max(seed level, path max z)`` — the
   priority-flood fill. Computed by vectorized directional raster scans
   (Vincent 1993's sequential reconstruction), PROVEN converged by a full
   8-neighbor erosion fixpoint check (any fixpoint ≤ marker is the
   reconstruction: walk the optimal path from a violating cell — each hop
   bounds F by the path max, so F ≤ the true fill everywhere, and
   monotone iteration keeps F ≥ it). Pathological spiral topography that
   exceeds the cycle cap falls back to the exact event sweep
   (``_event_fill`` — cell inserts at z, seed activations at L, Kruskal
   union order, pending components fill when first drained). Both paths
   compute the same function exactly; every fill value is one of the
   input z values (max/min only, no arithmetic) — bit-identical to the
   scalar witness, and losslessly stored as ``raw-f32``.

Assumes the mosaic's tile grid is fully populated (missing interior tiles
would read as NaN ocean) — the same full-mosaic contract as the other
halo stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tiles import TileSet
from .decode import iter_tiles, rows_to_table
from .flowacc import _border_ring_flat
from .halo import halo_map
from .terrain import _D8, _Meta

__all__ = ["fill_depressions"]

_OFFS = [(dr, dc) for dr, dc, _d, _c in _D8]

_EDGE_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("w", pa.float64())]
)  # a = -1 is the OCEAN pseudo-node


class _DSU:
    """Union-find with path halving; per-root attrs tracked by the caller."""

    __slots__ = ("parent",)

    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        p = self.parent
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x


def _rank_pairs(zf: np.ndarray, h: int, w: int):
    """Ascending-z processing order plus the union pair list (i, j),
    sorted by rank[i] so the sweep consumes each cell's unions at its
    insertion.

    Arc reduction: a cell's lower-ranked (already-inserted) 8-neighbors
    form connected ARCS around its king-move ring (_D8 is in cyclic
    order; consecutive ring positions are grid-adjacent). Cells within an
    arc are pairwise connected before this cell inserts (induction on
    rank: each consecutive arc pair is adjacent, both lower-ranked, so
    already united at a threshold ≤ this cell's z), so ONE union per arc
    — the arc's first position — suffices; the dropped pairs would be
    union no-ops. ~3× fewer union calls than all rank-filtered pairs."""
    fin = np.isfinite(zf)
    fidx = np.flatnonzero(fin)
    order = fidx[np.argsort(zf[fidx], kind="stable")]
    rank = np.full(h * w, -1, dtype=np.int64)
    rank[order] = np.arange(order.size)
    fin2 = fin.reshape(h, w)
    rank2 = rank.reshape(h, w)
    M = np.zeros((8, h, w), dtype=bool)
    for p, (dr, dc) in enumerate(_OFFS):
        r0a, r1a = max(0, -dr), min(h, h - dr)
        c0a, c1a = max(0, -dc), min(w, w - dc)
        if r0a >= r1a or c0a >= c1a:
            continue
        M[p, r0a:r1a, c0a:c1a] = (
            fin2[r0a:r1a, c0a:c1a]
            & fin2[r0a + dr : r1a + dr, c0a + dc : c1a + dc]
            & (
                rank2[r0a + dr : r1a + dr, c0a + dc : c1a + dc]
                < rank2[r0a:r1a, c0a:c1a]
            )
        )
    keeps = M & ~np.roll(M, 1, axis=0)  # arc starts (cyclic)
    keeps[0] |= M.all(axis=0)  # full ring: one arc, keep one union
    pi, pj = [], []
    for p, (dr, dc) in enumerate(_OFFS):
        rr, cc = np.nonzero(keeps[p])
        if rr.size:
            pi.append(rr * w + cc)
            pj.append((rr + dr) * w + (cc + dc))
    pi = np.concatenate(pi) if pi else np.empty(0, dtype=np.int64)
    pj = np.concatenate(pj) if pj else np.empty(0, dtype=np.int64)
    o = np.argsort(rank[pi], kind="stable")
    return order, pi[o], pj[o]


def _dir_scans(z: np.ndarray, F: np.ndarray) -> None:
    """One down+up directional-scan pair, in place: each row relaxes
    against the adjacent already-relaxed row's 3-neighborhood (N/NW/NE
    downward, S/SW/SE upward) — information crosses the whole tile along
    the scan axis in a single pass, vectorized per row."""
    h = z.shape[0]
    for r in range(1, h):
        m = F[r - 1]
        e = m.copy()
        np.minimum(e[1:], m[:-1], out=e[1:])  # NW
        np.minimum(e[:-1], m[1:], out=e[:-1])  # NE
        np.maximum(z[r], np.minimum(F[r], e), out=F[r])
    for r in range(h - 2, -1, -1):
        m = F[r + 1]
        e = m.copy()
        np.minimum(e[1:], m[:-1], out=e[1:])  # SW
        np.minimum(e[:-1], m[1:], out=e[:-1])  # SE
        np.maximum(z[r], np.minimum(F[r], e), out=F[r])


def _recon_fill(
    z: np.ndarray, marker: np.ndarray, max_cycles: int | None = None
) -> np.ndarray | None:
    """Reconstruction-by-erosion fill (module docstring step 3): ``z`` is
    the elevation with NaN holes replaced by +inf, ``marker`` the drain
    levels (+inf off drains, ≥ z on them). Returns the fill, or None if
    the scan cycles hit the cap without a PROVEN fixpoint (caller falls
    back to the exact event sweep)."""
    h, w = z.shape
    if max_cycles is None:
        max_cycles = h + w + 8
    F = marker.copy()
    zT = np.ascontiguousarray(z.T)
    for _ in range(max_cycles):
        _dir_scans(z, F)  # vertical axis (N/NW/NE, S/SW/SE)
        FT = np.ascontiguousarray(F.T)
        _dir_scans(zT, FT)  # horizontal axis (W/NW/SW, E/NE/SE)
        F = np.ascontiguousarray(FT.T)
        # fixpoint proof: one full 8-neighbor erosion changes nothing
        E = np.full((h, w), np.inf)
        for dr, dc in _OFFS:
            r0a, r1a = max(0, -dr), min(h, h - dr)
            c0a, c1a = max(0, -dc), min(w, w - dc)
            if r0a >= r1a or c0a >= c1a:
                continue
            np.minimum(
                E[r0a:r1a, c0a:c1a],
                F[r0a + dr : r1a + dr, c0a + dc : c1a + dc],
                out=E[r0a:r1a, c0a:c1a],
            )
        Fn = np.maximum(z, np.minimum(F, E))
        if np.array_equal(Fn, F):
            return F
        F = Fn
    return None  # pragma: no cover - pathological topography


def _event_fill(zf, h, w, sd_i, sd_t) -> list:
    """Exact event-sweep fill (the scan path's fallback and its oracle in
    tests): cell inserts at z and drain activations at their level, in
    ascending threshold order over the Kruskal union structure; a
    component's pending cells fill at the threshold where it first
    reaches an active drain."""
    order, pi, pj = _rank_pairs(zf, h, w)
    fill = np.full(h * w, np.nan)
    ev_t = np.concatenate([zf[order], np.asarray(sd_t, dtype=np.float64)])
    ev_kind = np.concatenate(
        [np.zeros(order.size, np.int8), np.ones(len(sd_i), np.int8)]
    )
    ev_idx = np.concatenate([order, np.asarray(sd_i, dtype=np.int64)])
    eo = np.lexsort((ev_kind, ev_t))  # inserts before activations

    dsu = _DSU(h * w)
    drained = {}
    pending: dict[int, list] = {}
    fl = fill.tolist()
    zl = zf.tolist()
    pil = pi.tolist()
    pjl = pj.tolist()
    ptr = 0
    npairs = len(pil)

    def union(a, b, t):
        ra, rb = dsu.find(a), dsu.find(b)
        if ra == rb:
            return
        da, db = drained.get(ra, False), drained.get(rb, False)
        if da != db:
            und = rb if da else ra
            for c in pending.pop(und, ()):
                fl[c] = t
        pa_, pb_ = pending.get(ra), pending.get(rb)
        dsu.parent[rb] = ra
        if da or db:
            drained[ra] = True
            pending.pop(ra, None)
            pending.pop(rb, None)
        elif pb_:
            if pa_ is None:
                pending[ra] = pending.pop(rb)
            elif len(pa_) < len(pb_):  # union by size
                pb_.extend(pa_)
                pending[ra] = pb_
                del pending[rb]
            else:
                pa_.extend(pb_)
                del pending[rb]

    for k in eo.tolist():
        i = int(ev_idx[k])
        if ev_kind[k] == 0:
            t = zl[i]
            pending[i] = [i]
            while ptr < npairs and pil[ptr] == i:
                union(i, pjl[ptr], t)
                ptr += 1
        else:
            r = dsu.find(i)
            if not drained.get(r, False):
                drained[r] = True
                for c in pending.pop(r, ()):
                    fl[c] = float(ev_t[k])
    return fl


def _ocean_mask(win, br, bc, h, w, gr0, gc0, grid) -> np.ndarray:
    """Body cells that drain directly: on the global grid edge, or
    8-adjacent to a NaN in the haloed window (real data NaN — window
    positions outside the grid never exist, see halo module notes; the
    True padding keeps absent out-of-window sides from reading as NaN,
    and those cells are global-edge cells anyway)."""
    wfin = np.isfinite(win)
    pf = np.pad(wfin, 1, constant_values=True)
    nan_adj = np.zeros((h, w), dtype=bool)
    for dr, dc in _OFFS:
        nan_adj |= ~pf[
            1 + br + dr : 1 + br + dr + h, 1 + bc + dc : 1 + bc + dc + w
        ]
    gr = gr0 + np.arange(h)[:, None]
    gc = gc0 + np.arange(w)[None, :]
    edge = (gr == 0) | (gr == grid.nrows - 1) | (gc == 0) | (gc == grid.ncols - 1)
    return wfin[br : br + h, bc : bc + w] & (nan_adj | edge)


def fill_depressions(
    ts: TileSet,
    halo_broadcast_budget: int = 256 << 20,
    edge_budget_rows: int = 50_000_000,
    force_event_fill: bool = False,
) -> TileSet:
    """Depression-filled DEM over the mosaic (see module docstring).
    ``force_event_fill`` skips the reconstruction fast path so tests can
    pin the two pass-2 implementations bit-identical."""
    grid = ts.grid
    ncols = grid.ncols

    def pass1(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        zb = win[br : br + h, bc : bc + w]
        zf = zb.ravel()
        ocean = _ocean_mask(win, br, bc, h, w, gr0, gc0, grid).ravel()
        ring = np.zeros(h * w, dtype=bool)
        ring[_border_ring_flat(h, w)] = True
        idx = np.arange(h * w, dtype=np.int64)
        gid = (gr0 + idx // w) * ncols + (gc0 + idx % w)

        order, pi, pj = _rank_pairs(zf, h, w)
        dsu = _DSU(h * w)
        seed_of = {}  # root -> seed gid (ring cells are the graph nodes)
        oce = {}  # root -> bool
        ea, eb, ew = [], [], []

        def union(a, b, t):
            ra, rb = dsu.find(a), dsu.find(b)
            if ra == rb:
                return
            sa, sb = seed_of.get(ra, -2), seed_of.get(rb, -2)
            oa, ob = oce.get(ra, False), oce.get(rb, False)
            if sa != -2 and sb != -2:
                ea.append(sa)
                eb.append(sb)
                ew.append(t)
            elif oa and not ob and sb != -2:
                ea.append(-1)
                eb.append(sb)
                ew.append(t)
            elif ob and not oa and sa != -2:
                ea.append(-1)
                eb.append(sa)
                ew.append(t)
            dsu.parent[rb] = ra
            if sa == -2 and sb != -2:
                seed_of[ra] = sb
            if ob and not oa:
                oce[ra] = True

        ol = order.tolist()
        pil = pi.tolist()
        pjl = pj.tolist()
        zl = zf.tolist()
        ringl = ring.tolist()
        ocel = ocean.tolist()
        gidl = gid.tolist()
        ptr = 0
        npairs = len(pil)
        for i in ol:
            t = zl[i]
            if ringl[i]:
                seed_of[i] = gidl[i]
                if ocel[i]:
                    ea.append(-1)
                    eb.append(gidl[i])
                    ew.append(t)
            if ocel[i]:
                oce[i] = True
            while ptr < npairs and pil[ptr] == i:
                union(i, pjl[ptr], t)
                ptr += 1

        # cross-tile edges: body cell ↔ finite halo neighbor outside the body
        winp = np.pad(win, 1, constant_values=np.nan)
        rr = np.arange(h)[:, None]
        cc = np.arange(w)[None, :]
        body_fin = np.isfinite(zb)
        for dr, dc in _OFFS:
            nb = winp[1 + br + dr : 1 + br + dr + h, 1 + bc + dc : 1 + bc + dc + w]
            outside = (rr + dr < 0) | (rr + dr >= h) | (cc + dc < 0) | (cc + dc >= w)
            m = body_fin & np.isfinite(nb) & outside
            if not m.any():
                continue
            mr, mc = np.nonzero(m)
            ea.extend(((gr0 + mr) * ncols + (gc0 + mc)).tolist())
            eb.extend(((gr0 + mr + dr) * ncols + (gc0 + mc + dc)).tolist())
            ew.extend(np.maximum(zb[mr, mc], nb[mr, mc]).tolist())

        if not ea:
            return None
        return pa.table(
            {
                "a": pa.array(ea, pa.int64()),
                "b": pa.array(eb, pa.int64()),
                "w": pa.array(ew, pa.float64()),
            },
            schema=_EDGE_SCHEMA,
        )

    edges = halo_map(ts, pass1, corners=True, budget_bytes=halo_broadcast_budget)

    # ---- border solve (driver): minimax Dijkstra from OCEAN ----
    import heapq

    adj: dict[int, list] = {}
    n_rows = 0
    for b in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_rows += b.num_rows
        if n_rows > edge_budget_rows:  # pragma: no cover - budget guard
            raise MemoryError(
                f"spill graph exceeds budget {edge_budget_rows} rows; apply "
                "the recursive tiles-of-tiles contraction (module note)"
            )
        for a, bb, wt in zip(
            b["a"].to_numpy().tolist(),
            b["b"].to_numpy().tolist(),
            b["w"].to_numpy().tolist(),
        ):
            adj.setdefault(a, []).append((bb, wt))
            adj.setdefault(bb, []).append((a, wt))

    dist: dict[int, float] = {-1: float("-inf")}
    heap = [(float("-inf"), -1)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, wt in adj.get(u, ()):
            nd = d if d >= wt else wt
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    dist.pop(-1, None)

    import ray as _ray

    lref = _ray.put(dist)

    # ---- pass 2 (no halo): reconstruction fill, event-sweep fallback ----
    def pass2(batch: pa.Table) -> pa.Table:
        import ray as _ray2

        force_event = force_event_fill
        levels = _ray2.get(lref)
        rows = []
        for info, zb in iter_tiles(batch, grid):
            h, w, gr0, gc0 = info.h, info.w, info.gr0, info.gc0
            zf = zb.ravel()
            fill = np.full(h * w, np.nan)
            fin = np.isfinite(zf)
            if fin.any():
                # drains: ring cells at their global level L; cells
                # 8-adjacent to an IN-BODY NaN or on the global edge at z
                # (non-ring cells can't touch a neighbor tile's NaN)
                pf = np.pad(np.isfinite(zb), 1, constant_values=True)
                nan_adj = np.zeros((h, w), dtype=bool)
                for dr, dc in _OFFS:
                    nan_adj |= ~pf[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
                gr = gr0 + np.arange(h)[:, None]
                gc = gc0 + np.arange(w)[None, :]
                edge_m = (
                    (gr == 0)
                    | (gr == grid.nrows - 1)
                    | (gc == 0)
                    | (gc == grid.ncols - 1)
                )
                local_drain = (np.isfinite(zb) & (nan_adj | edge_m)).ravel()
                ring = _border_ring_flat(h, w)
                idxs = np.arange(h * w, dtype=np.int64)
                gid = (gr0 + idxs // w) * ncols + (gc0 + idxs % w)

                sd_i, sd_t = [], []
                for v in ring:
                    if fin[v]:
                        sd_i.append(v)
                        sd_t.append(levels[int(gid[v])])
                ldr = np.flatnonzero(local_drain)
                sd_i.extend(ldr.tolist())
                sd_t.extend(zf[ldr].tolist())

                zi = np.where(fin, zf, np.inf).reshape(h, w)
                marker = np.full(h * w, np.inf)
                np.minimum.at(
                    marker,
                    np.asarray(sd_i, dtype=np.int64),
                    np.asarray(sd_t, dtype=np.float64),
                )
                F = (
                    None
                    if force_event
                    else _recon_fill(zi, marker.reshape(h, w))
                )
                if F is not None:
                    fill = np.where(fin, F.ravel(), np.nan)
                else:
                    fill = np.asarray(_event_fill(zf, h, w, sd_i, sd_t))
            rows.append(
                (
                    _Meta(
                        f"t{info.tile_row:04d}_{info.tile_col:04d}",
                        info.tile_row,
                        info.tile_col,
                        gr0,
                        gc0,
                        h,
                        w,
                        "fill_depressions",
                    ),
                    fill.reshape(h, w),
                )
            )
        return rows_to_table(rows, lossless=True)

    out = ts.ds.map_batches(pass2, batch_format="pyarrow")
    return TileSet(ds=out, grid=grid)
