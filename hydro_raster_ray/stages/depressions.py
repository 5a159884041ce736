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


def _basin_labels(zb: np.ndarray) -> np.ndarray:
    """Watershed (falling-path) basin labels over one tile body, vectorized.

    Every finite cell gets a pointer along a NON-INCREASING z path: the
    strictly-lowest 8-neighbor where one exists; plateau cells route across
    equal-z neighbors toward a cell that does have a lower exit (BFS rounds,
    so the pointer forest is acyclic by round number); exitless flats
    contract onto their min-index cell (min-label propagation with pointer
    doubling). Roots are then resolved by pointer doubling. Returns the flat
    root index per cell (-1 for NaN cells).

    The exactness this buys (used by the spill-graph contraction below):
    two cells in the same basin are joined by a path that first descends
    from one and then ascends to the other, so their in-tile minimax
    distance is exactly ``max(z_a, z_b)``."""
    h, w = zb.shape
    n = h * w
    fin = np.isfinite(zb)
    zp = np.pad(zb, 1, constant_values=np.nan)
    idx2 = np.arange(n, dtype=np.int64).reshape(h, w)
    best = np.full((h, w), np.inf)
    barg = np.full((h, w), -1, dtype=np.int64)
    eq_any = np.zeros((h, w), dtype=bool)
    for dr, dc in _OFFS:
        nb = zp[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
        m = fin & (nb < best)  # NaN nb compares False
        if m.any():
            best[m] = nb[m]
            barg[m] = idx2[m] + dr * w + dc
        eq_any |= fin & (nb == zb)
    ptr = np.where((fin & (best < zb)).ravel(), barg.ravel(), -1)

    # plateau routing: unresolved flat cells adopt an equal-z neighbor that
    # already has a downhill path (resolved in an earlier round)
    unres = fin.ravel() & (ptr < 0)
    if (unres & eq_any.ravel()).any():
        resolved2 = (~unres & fin.ravel()).reshape(h, w)
        un2 = unres.reshape(h, w)
        fpad = np.zeros((h + 2, w + 2), dtype=bool)
        while True:
            adopt = np.full((h, w), -1, dtype=np.int64)
            fpad[1:-1, 1:-1] = resolved2
            for dr, dc in _OFFS:
                nb = zp[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
                rnb = fpad[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
                m = un2 & rnb & (nb == zb)
                if m.any():
                    adopt[m] = idx2[m] + dr * w + dc
            ch = adopt >= 0
            if not ch.any():
                break
            ptr[ch.ravel()] = adopt[ch]
            un2 &= ~ch
            resolved2 |= ch

    # exitless flats: contract each onto its min flat index
    unres = fin.ravel() & (ptr < 0)
    if unres.any():
        lab = np.arange(n, dtype=np.int64)
        un2 = unres.reshape(h, w)
        upad = np.zeros((h + 2, w + 2), dtype=bool)
        upad[1:-1, 1:-1] = un2
        lpad = np.full((h + 2, w + 2), np.iinfo(np.int64).max, dtype=np.int64)
        while True:
            lpad[1:-1, 1:-1] = np.where(un2, lab.reshape(h, w), np.iinfo(np.int64).max)
            new = lab.copy()
            for dr, dc in _OFFS:
                nb = zp[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
                lnb = lpad[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
                unb = upad[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
                m = un2 & unb & (nb == zb)
                nf = new.reshape(h, w)
                np.minimum(nf, np.where(m, lnb, np.iinfo(np.int64).max), out=nf)
            new = np.minimum(new, new[new])  # pointer doubling
            if np.array_equal(new, lab):
                break
            lab = new
        ptr[unres] = lab[unres]

    # roots: point to self
    self_idx = np.arange(n, dtype=np.int64)
    ptr = np.where(ptr < 0, self_idx, ptr)
    lab = ptr
    while True:
        nl = lab[lab]
        if np.array_equal(nl, lab):
            break
        lab = nl
    return np.where(fin.ravel(), lab, -1)


def _tile_spill_graph(zb, win, br, bc, gr0, gc0, h, w, grid, ncols):
    """Vectorized per-tile spill-graph contraction (replaces the per-cell
    Kruskal sweep; same minimax semantics, proven by decomposition):

    * basin labels via :func:`_basin_labels`; within a basin, minimax is
      exactly ``max(z_a, z_b)`` (falling-path argument);
    * SADDLE edges ``(basin_a, basin_b, min over boundary pairs of
      max(z_u, z_v))`` — any inter-basin crossing costs at least the
      saddle, and a crossing AT the saddle pair costs exactly it, so
      basin-graph minimax equals cell-graph minimax;
    * seed attach edges ``(ring gid, basin gid, z_ring)``;
    * ocean edges ``(-1, basin gid, min z over the basin's ocean cells)``;
    * cross-tile cell edges for the 4 POSITIVE offsets only — the
      neighbouring tile emits the mirror offsets, so each global pair
      appears exactly once.

    Basin node ids are the global gid of the basin's root cell (disjoint
    across tiles; a root that is itself a ring cell shares its gid with
    the seed node — the same physical point, so the graph is consistent)."""
    zf = zb.ravel()
    fin = np.isfinite(zf)
    lab = _basin_labels(zb)
    idx = np.arange(h * w, dtype=np.int64)
    gid = (gr0 + idx // w) * ncols + (gc0 + idx % w)
    basin_gid = np.where(lab >= 0, gid[np.maximum(lab, 0)], -2)

    ea_parts, eb_parts, ew_parts = [], [], []

    # ---- saddle edges (4 positive offsets: each in-tile pair once) ----
    zp = np.pad(zb, 1, constant_values=np.nan)
    lab2 = lab.reshape(h, w)
    lpad = np.full((h + 2, w + 2), -1, dtype=np.int64)
    lpad[1:-1, 1:-1] = lab2
    sa, sb, sw = [], [], []
    for dr, dc in ((0, 1), (1, -1), (1, 0), (1, 1)):
        nb = zp[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
        lnb = lpad[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
        m = (lab2 >= 0) & (lnb >= 0) & (lab2 != lnb)
        if m.any():
            sa.append(lab2[m])
            sb.append(lnb[m])
            sw.append(np.maximum(zb[m], nb[m]))
    if sa:
        A = np.concatenate(sa)
        B = np.concatenate(sb)
        W = np.concatenate(sw)
        lo = np.minimum(A, B)
        hi = np.maximum(A, B)
        key = lo * np.int64(h * w) + hi
        o = np.argsort(key, kind="stable")
        key_s, W_s = key[o], W[o]
        starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
        saddle = np.minimum.reduceat(W_s, starts)
        klo = key_s[starts] // np.int64(h * w)
        khi = key_s[starts] % np.int64(h * w)
        ea_parts.append(gid[klo])
        eb_parts.append(gid[khi])
        ew_parts.append(saddle)

    # ---- seed attach edges: finite ring cells onto their basin ----
    ring = np.asarray(_border_ring_flat(h, w), dtype=np.int64)
    rfin = ring[fin[ring]]
    if rfin.size:
        keep = gid[rfin] != basin_gid[rfin]  # root == seed: skip self-loop
        ea_parts.append(gid[rfin][keep])
        eb_parts.append(basin_gid[rfin][keep])
        ew_parts.append(zf[rfin][keep])

    # ---- ocean edges: per-basin min z over its ocean cells ----
    ocean = _ocean_mask(win, br, bc, h, w, gr0, gc0, grid).ravel()
    om = np.flatnonzero(ocean)
    if om.size:
        ob = basin_gid[om]
        oz = zf[om]
        o = np.argsort(ob, kind="stable")
        ob_s, oz_s = ob[o], oz[o]
        starts = np.flatnonzero(np.r_[True, ob_s[1:] != ob_s[:-1]])
        ea_parts.append(np.full(starts.size, -1, dtype=np.int64))
        eb_parts.append(ob_s[starts])
        ew_parts.append(np.minimum.reduceat(oz_s, starts))

    # ---- cross-tile edges (positive offsets only — global dedupe) ----
    winp = np.pad(win, 1, constant_values=np.nan)
    rr = np.arange(h)[:, None]
    cc = np.arange(w)[None, :]
    body_fin = np.isfinite(zb)
    for dr, dc in ((0, 1), (1, -1), (1, 0), (1, 1)):
        nb = winp[1 + br + dr : 1 + br + dr + h, 1 + bc + dc : 1 + bc + dc + w]
        outside = (rr + dr < 0) | (rr + dr >= h) | (cc + dc < 0) | (cc + dc >= w)
        m = body_fin & np.isfinite(nb) & outside
        if not m.any():
            continue
        mr, mc = np.nonzero(m)
        ea_parts.append((gr0 + mr) * ncols + (gc0 + mc))
        eb_parts.append((gr0 + mr + dr) * ncols + (gc0 + mc + dc))
        ew_parts.append(np.maximum(zb[mr, mc], nb[mr, mc]))

    if not ea_parts:
        return None
    return pa.table(
        {
            "a": pa.array(np.concatenate(ea_parts).astype(np.int64)),
            "b": pa.array(np.concatenate(eb_parts).astype(np.int64)),
            "w": pa.array(np.concatenate(ew_parts).astype(np.float64)),
        },
        schema=_EDGE_SCHEMA,
    )


def _solve_border_levels(edges, edge_budget_rows: int):
    """Driver minimax solve from OCEAN over the contracted spill graph.

    Replaces dict-ingest + heapq Dijkstra with vectorized ingest and a
    single Kruskal sweep: the minimax level of a node is the weight of the
    edge at which its component first joins the OCEAN component when edges
    are processed in ascending weight (the classic threshold-of-connection
    characterization). The per-node resolution walks the merge forest with
    vectorized pointer doubling. Returns ``(gids_sorted, levels)`` numpy
    arrays (missing nodes ⇒ +inf at lookup time)."""
    As, Bs, Ws = [], [], []
    n_rows = 0
    for b in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_rows += b.num_rows
        if n_rows > edge_budget_rows:  # pragma: no cover - budget guard
            raise MemoryError(
                f"spill graph exceeds budget {edge_budget_rows} rows; apply "
                "the recursive tiles-of-tiles contraction (module note)"
            )
        As.append(b["a"].to_numpy())
        Bs.append(b["b"].to_numpy())
        Ws.append(b["w"].to_numpy())
    if n_rows == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    a = np.concatenate(As)
    bb = np.concatenate(Bs)
    wt = np.concatenate(Ws)
    nodes, inv = np.unique(np.concatenate([a, bb]), return_inverse=True)
    m = a.size
    ai, bi = inv[:m], inv[m:]
    order = np.argsort(wt, kind="stable")
    al = ai[order].tolist()
    bl = bi[order].tolist()
    n = nodes.size
    # ocean pseudo-node: nodes is sorted, so -1 (if present) is index 0
    if nodes[0] != -1:
        # no ocean edge at all: nothing is reachable
        return nodes.astype(np.int64), np.full(n, np.inf)
    parent = list(range(n))  # union-find, path-halved
    link = np.arange(n, dtype=np.int64)  # merge forest (uncompressed)
    att = np.full(n, np.inf)  # weight at which this ROOT joined ocean
    oce = [False] * n
    oce[0] = True
    wl = wt[order].tolist()
    for k in range(m):
        x = al[k]
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        y = bl[k]
        while parent[y] != y:
            parent[y] = parent[parent[y]]
            y = parent[y]
        if x == y:
            continue
        if oce[y] and not oce[x]:
            x, y = y, x  # ocean side always wins
        parent[y] = x
        link[y] = x
        if oce[x] and not oce[y]:
            att[y] = wl[k]
        oce[x] = oce[x] or oce[y]
    # resolution: first attach on each node's merge-forest chain
    stop = att < np.inf
    nxt = np.where(stop, np.arange(n, dtype=np.int64), link)
    while True:
        n2 = nxt[nxt]
        if np.array_equal(n2, nxt):
            break
        nxt = n2
    levels = att[nxt]  # +inf where the chain never attaches (unreached)
    return nodes.astype(np.int64), levels


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
        return _tile_spill_graph(zb, win, br, bc, gr0, gc0, h, w, grid, ncols)

    edges = halo_map(ts, pass1, corners=True, budget_bytes=halo_broadcast_budget)

    gids_sorted, level_arr = _solve_border_levels(edges, edge_budget_rows)

    import ray as _ray

    lref = _ray.put((gids_sorted, level_arr))

    # ---- pass 2 (no halo): reconstruction fill, event-sweep fallback ----
    def pass2(batch: pa.Table) -> pa.Table:
        import ray as _ray2

        force_event = force_event_fill
        lv_gids, lv_levels = _ray2.get(lref)
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
                ring = np.asarray(_border_ring_flat(h, w), dtype=np.int64)
                idxs = np.arange(h * w, dtype=np.int64)
                gid = (gr0 + idxs // w) * ncols + (gc0 + idxs % w)

                rfin = ring[fin[ring]]
                gg = gid[rfin]
                lv = np.full(gg.size, np.inf)  # absent ⇒ unreached from ocean
                if lv_gids.size:
                    pos = np.minimum(np.searchsorted(lv_gids, gg), lv_gids.size - 1)
                    ok = lv_gids[pos] == gg
                    lv[ok] = lv_levels[pos[ok]]
                ldr = np.flatnonzero(local_drain)
                sd_i = np.concatenate([rfin, ldr])
                sd_t = np.concatenate([np.atleast_1d(lv), zf[ldr]])

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
