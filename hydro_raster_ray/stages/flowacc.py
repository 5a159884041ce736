"""Distributed D8 flow accumulation — Barnes-style tile contraction.

``oracle.flow_accumulation`` defines the semantics (upstream cell count,
self included; NaN holes preserved; pits/flats absorb). A whole-array
descending-z pass cannot run on a tiled corpus, so the engine uses the
tile-contraction scheme of Barnes 2017 ("Parallel non-divergent flow
accumulation for trillion cell DEMs" — public literature, pattern only):

1. **Pass 1 (haloed map, ``halo.halo_map``)**: per tile, D8 directions
   from the corner halo (``terrain.d8_codes`` — shared kernel, so
   ``flow_dir`` and accumulation agree by construction), then a LOCAL
   accumulation over in-tile paths only. D8 drops are strictly positive,
   so elevation is a topological order: ONE descending-z push resolves
   the tile, and one ascending-z sweep resolves every cell's in-tile
   TERMINAL (pit or exit cell) — no per-path walking anywhere. Emits only
   tiny border rows: a *transfer* per cell whose receiver lies outside
   the tile (src gid, dst gid, local amount, src z) and a *pass-through*
   per border-ring cell mapping external inflow to its in-tile exit cell.

2. **Border solve (driver)**: the transfers/pass-throughs form a
   functional graph over border cells (~2 (w+h)/(w·h) of the corpus, ~2 %
   at 256² tiles). Flow strictly descends across every hop, so ONE sweep
   of the transfers in descending source-z order resolves every in-flow
   amount exactly — no iteration, no convergence test. Driver-side by
   design at this corpus-per-job scale (1.3 M border cells for the 85 M-px
   bench ≈ a 50 MB frame); the documented growth path is the same
   contraction applied recursively (tiles-of-tiles), which keeps every
   level's border table this small — not a distributed fixpoint loop.

3. **Pass 2 (haloed map)**: broadcast the resolved in-flow dict
   (``ray.put``) and rerun the SAME descending-z push with initial
   weights ``1 + in_flow(cell)`` — the push distributes external amounts
   down their in-tile paths as a side effect of the same topological
   order, so pass 2 costs exactly one pass-1 kernel. Emits final
   accumulation tiles (lossless ``raw-f32``; counts are exact integers
   below 2²⁴ — beyond that scale, sink the plane to an int64 column
   table instead).

Every pass streams; the only materialized artifacts are the border rows
and the in-flow dict. Re-entrant rivers (leave a tile, come back) are
correct: each (entry, exit) segment is its own pass-through link.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tiles import TileSet
from .decode import rows_to_table
from .halo import halo_map
from .terrain import _D8, _Meta, d8_codes

__all__ = ["flow_accumulation", "flow_length", "stream_mask"]

_CODE_TO_K = {int(c): k for k, (_r, _c2, _d, c) in enumerate(_D8)}
_DR = np.array([d[0] for d in _D8])
_DC = np.array([d[1] for d in _D8])
_LUT = np.zeros(256, dtype=np.int64)
for _c, _k in _CODE_TO_K.items():
    _LUT[_c] = _k


def _tile_flow(win, br, bc, h, w, weights=None, want_term=False, want_acc=True):
    """Per-tile flow state from the haloed window.

    Returns ``(nxt, exits, acc, order, term)``:
    - ``nxt``: body-flat receiver index per cell (−1 = pit/flat or exits)
    - ``exits``: (body-flat exit cells, receiver window rows, cols)
    - ``acc``: accumulation with initial weights ``1 (+ weights)`` pushed
      down every in-tile path (descending-z = topological order), or None
      when ``want_acc=False`` (basin labeling needs only terminals)
    - ``order``: body-flat descending-z order of finite cells
    - ``term``: each cell's in-tile terminal (ascending-z sweep), or None
    """
    codes = d8_codes(win)[br : br + h, bc : bc + w]
    zbody = win[br : br + h, bc : bc + w]
    m = np.isfinite(codes) & (codes > 0)
    rr, cc = np.nonzero(m)
    k = _LUT[codes[rr, cc].astype(np.int64)]
    tr_w = rr + br + _DR[k]  # receiver in window coords
    tc_w = cc + bc + _DC[k]
    inside = (tr_w >= br) & (tr_w < br + h) & (tc_w >= bc) & (tc_w < bc + w)
    nxt = np.full(h * w, -1, dtype=np.int64)
    bidx = rr * w + cc
    nxt[bidx[inside]] = (tr_w[inside] - br) * w + (tc_w[inside] - bc)
    exits = (bidx[~inside], tr_w[~inside], tc_w[~inside])

    zf = zbody.ravel()
    finite = np.flatnonzero(np.isfinite(zf))
    order = finite[np.argsort(-zf[finite], kind="stable")]
    # tight loops over Python lists — ~4× faster than numpy scalar indexing
    ol = order.tolist()
    nl = nxt.tolist()
    acc = None
    if want_acc:
        acc = np.where(np.isnan(zf), np.nan, 1.0)
        if weights is not None:
            acc = acc + weights
        al = acc.tolist()
        for idx in ol:
            t = nl[idx]
            if t >= 0:
                al[t] += al[idx]
        acc = np.asarray(al)
    term = None
    if want_term:
        tl = list(range(h * w))
        for idx in reversed(ol):  # ascending z: receiver resolved first
            t = nl[idx]
            if t >= 0:
                tl[idx] = tl[t]
        term = tl
    return nxt, exits, acc, order, term


def _border_ring_flat(h: int, w: int) -> list[int]:
    """Body-flat indices of the tile's border ring (the only cells that can
    receive flow from outside the tile)."""
    idx = set(range(w)) | set(range((h - 1) * w, h * w))
    for r in range(1, h - 1):
        idx.add(r * w)
        idx.add(r * w + w - 1)
    return sorted(idx)


_EDGE_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = transfer, 1 = pass-through
        ("src", pa.int64()),  # transfer: exit cell gid; passthru: entry gid
        ("dst", pa.int64()),  # transfer: receiver gid; passthru: exit gid
        ("amount", pa.float64()),  # transfer: local accumulation at src
        ("z", pa.float64()),  # transfer: z(src) — the solve's sort key
    ]
)


def _acc_solve(
    ts: TileSet, halo_broadcast_budget: int, border_budget_rows: int
):
    """Pass 1 + the driver border solve shared by ``flow_accumulation``
    and ``strahler``: returns ``(strips, aref)`` — the collected halo
    strips (one collection serves every subsequent haloed pass; a
    collection is a full corpus read) and the ``ray.put`` handle of the
    resolved external in-flow dict."""
    from .halo import collect_strips

    grid = ts.grid
    ncols = grid.ncols
    strips = collect_strips(ts, halo_broadcast_budget, corners=True)

    def pass1(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        nxt, (ex_cells, ex_tr, ex_tc), acc, order, term = _tile_flow(
            win, br, bc, h, w, want_term=True
        )
        zbody = win[br : br + h, bc : bc + w].ravel()
        g_r0, g_c0 = gr0 - br, gc0 - bc  # window top-left in global coords
        # transfers: every body cell whose receiver is outside the body
        u = ex_cells.astype(np.int64)
        src_t = (gr0 + u // w) * ncols + (gc0 + u % w)
        dst_t = (g_r0 + ex_tr.astype(np.int64)) * ncols + (
            g_c0 + ex_tc.astype(np.int64)
        )
        amt_t = acc[u].astype(np.float64)
        z_t = zbody[u].astype(np.float64)
        # pass-throughs: border-ring entry → its in-tile terminal, when
        # that terminal is an exit cell (ascending-z sweep, no walking)
        ring = np.asarray(_border_ring_flat(h, w), dtype=np.int64)
        rfin = ring[np.isfinite(zbody[ring])]
        tt = np.asarray(term, dtype=np.int64)[rfin]
        ex_sorted = np.sort(u)
        if ex_sorted.size:
            pos = np.minimum(np.searchsorted(ex_sorted, tt), ex_sorted.size - 1)
            is_exit = ex_sorted[pos] == tt
        else:
            is_exit = np.zeros(tt.size, dtype=bool)
        rp, tp = rfin[is_exit], tt[is_exit]
        src_p = (gr0 + rp // w) * ncols + (gc0 + rp % w)
        dst_p = (gr0 + tp // w) * ncols + (gc0 + tp % w)
        n_t, n_p = src_t.size, src_p.size
        if n_t + n_p == 0:
            return None
        return pa.table(
            {
                "kind": pa.array(
                    np.r_[np.zeros(n_t, np.int8), np.ones(n_p, np.int8)]
                ),
                "src": pa.array(np.r_[src_t, src_p]),
                "dst": pa.array(np.r_[dst_t, dst_p]),
                "amount": pa.array(np.r_[amt_t, np.zeros(n_p)]),
                "z": pa.array(np.r_[z_t, np.zeros(n_p)]),
            },
            schema=_EDGE_SCHEMA,
        )

    edges = halo_map(
        ts, pass1, corners=True, budget_bytes=halo_broadcast_budget,
        strips=strips,
    )

    # ---- border solve (driver): one descending-z sweep over compacted
    # node ids (vectorized ingest + CSR entry groups; the sweep itself is
    # inherently sequential — each transfer consumes in-flows resolved at
    # strictly higher z — but runs over flat int lists, no dicts) ----
    Ks, Ss, Ds, Am, Zs = [], [], [], [], []
    n_rows = 0
    for b in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_rows += b.num_rows
        if n_rows > border_budget_rows:  # pragma: no cover - budget guard
            raise MemoryError(
                f"border table exceeds budget {border_budget_rows} rows; "
                "apply the recursive tiles-of-tiles contraction (module note)"
            )
        Ks.append(b["kind"].to_numpy())
        Ss.append(b["src"].to_numpy())
        Ds.append(b["dst"].to_numpy())
        Am.append(b["amount"].to_numpy())
        Zs.append(b["z"].to_numpy())

    import ray as _ray

    if n_rows == 0:
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        return strips, _ray.put(empty)
    kind = np.concatenate(Ks)
    src = np.concatenate(Ss)
    dst = np.concatenate(Ds)
    amount = np.concatenate(Am)
    z = np.concatenate(Zs)
    tm = kind == 0
    nodes, inv = np.unique(
        np.concatenate([src[tm], dst[tm], src[~tm], dst[~tm]]),
        return_inverse=True,
    )
    nt = int(tm.sum())
    np_ = src.size - nt
    t_src, t_dst = inv[:nt], inv[nt : 2 * nt]
    p_src = inv[2 * nt : 2 * nt + np_]
    p_dst = inv[2 * nt + np_ :]
    n = nodes.size
    # CSR: pass-through ENTRY cells grouped by their exit cell (p_dst)
    eo = np.argsort(p_dst, kind="stable")
    ent_l = p_src[eo].tolist()
    off = np.r_[0, np.cumsum(np.bincount(p_dst, minlength=n))]
    off_l = off.tolist()
    o = np.argsort(-z[tm], kind="stable")  # descending z, ties stable
    s_l = t_src[o].tolist()
    d_l = t_dst[o].tolist()
    a_l = amount[tm][o].tolist()
    in_amt = [0.0] * n
    for k in range(len(s_l)):
        s = s_l[k]
        c = a_l[k]
        for j in range(off_l[s], off_l[s + 1]):
            c += in_amt[ent_l[j]]
        in_amt[d_l[k]] += c
    amts = np.asarray(in_amt)
    nz = amts != 0.0
    return strips, _ray.put((nodes[nz].astype(np.int64), amts[nz]))


def _weights_for(gids, amts, gr0, gc0, h, w, ncols):
    """External in-flow weights for one tile from the broadcast sorted
    ``(gids, amts)`` arrays (searchsorted lookup, vectorized)."""
    if gids.size == 0:
        return None
    ring = np.asarray(_border_ring_flat(h, w), dtype=np.int64)
    g = (gr0 + ring // w) * ncols + (gc0 + ring % w)
    pos = np.minimum(np.searchsorted(gids, g), gids.size - 1)
    ok = gids[pos] == g
    if not ok.any():
        return None
    weights = np.zeros(h * w)
    weights[ring[ok]] = amts[pos[ok]]
    return weights


def flow_accumulation(
    ts: TileSet,
    halo_broadcast_budget: int = 256 << 20,
    border_budget_rows: int = 50_000_000,
) -> TileSet:
    """D8 flow accumulation over the mosaic (see module docstring)."""
    grid = ts.grid
    ncols = grid.ncols
    strips, aref = _acc_solve(ts, halo_broadcast_budget, border_budget_rows)

    def pass2(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        import ray as _ray2

        in_gids, in_amts = _ray2.get(aref)
        # external in-flows become initial weights: the SAME topological
        # push distributes them down their in-tile paths — no walking
        weights = _weights_for(in_gids, in_amts, gr0, gc0, h, w, ncols)
        _nxt, _ex, acc, _o, _t = _tile_flow(win, br, bc, h, w, weights=weights)
        meta = _Meta(
            f"t{t_tr:04d}_{t_tc:04d}", t_tr, t_tc, gr0, gc0, h, w,
            "flow_acc d8",
        )
        return rows_to_table([(meta, acc.reshape(h, w))], lossless=True)

    out = halo_map(
        ts, pass2, corners=True, budget_bytes=halo_broadcast_budget,
        strips=strips,
    )
    return TileSet(ds=out, grid=grid)


def _tile_counts(win, br, bc, h, w):
    """Per-tile flow-length state: body-flat receiver ``nxt``, exits with
    their step kind, in-tile hop counts to each cell's terminal (ns
    straight, nd diagonal — exact integers, one ascending-z sweep), and
    the terminal index per cell."""
    codes = d8_codes(win)[br : br + h, bc : bc + w]
    zbody = win[br : br + h, bc : bc + w]
    m = np.isfinite(codes) & (codes > 0)
    rr, cc = np.nonzero(m)
    k = _LUT[codes[rr, cc].astype(np.int64)]
    diag = (_DR[k] != 0) & (_DC[k] != 0)
    tr_w = rr + br + _DR[k]
    tc_w = cc + bc + _DC[k]
    inside = (tr_w >= br) & (tr_w < br + h) & (tc_w >= bc) & (tc_w < bc + w)
    nxt = np.full(h * w, -1, dtype=np.int64)
    bidx = rr * w + cc
    nxt[bidx[inside]] = (tr_w[inside] - br) * w + (tc_w[inside] - bc)
    sd = np.zeros(h * w, dtype=np.int64)
    sd[bidx] = diag  # step kind of each flowing cell's OWN hop
    exits = (bidx[~inside], tr_w[~inside], tc_w[~inside], diag[~inside])

    zf = zbody.ravel()
    finite = np.flatnonzero(np.isfinite(zf))
    order = finite[np.argsort(-zf[finite], kind="stable")]
    ol = order.tolist()
    nl = nxt.tolist()
    sdl = sd.tolist()
    ns = [0] * (h * w)
    nd = [0] * (h * w)
    tl = list(range(h * w))
    for idx in reversed(ol):  # ascending z: receiver resolved first
        t = nl[idx]
        if t >= 0:
            d = sdl[idx]
            ns[idx] = ns[t] + 1 - d
            nd[idx] = nd[t] + d
            tl[idx] = tl[t]
    return nxt, exits, ns, nd, tl, zf


_LEN_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = exit step, 1 = ring-cell in-tile counts
        ("src", pa.int64()),
        ("dst", pa.int64()),  # exit: receiver gid; ring: terminal gid
        ("z", pa.float64()),  # exit: z(src) — the ascending solve order
        ("a", pa.int64()),  # exit: step is diagonal (0/1); ring: ns
        ("b", pa.int64()),  # ring: nd
        ("pit", pa.bool_()),  # ring: terminal is a true pit
    ]
)


def flow_length(
    ts: TileSet,
    halo_broadcast_budget: int = 256 << 20,
    border_budget_rows: int = 50_000_000,
) -> TileSet:
    """Downstream D8 flow-path length (``oracle.flow_length`` semantics:
    exact straight/diagonal hop counts to the terminal, value
    ``n_s + n_d·√2`` in cellsize units). Same contraction as
    ``flow_accumulation`` but propagating INTEGER count pairs — exact and
    associative at any scale, so tiling cannot perturb the result:

    1. haloed pass: in-tile counts per cell (ascending-z sweep) + border
       rows (per exit its step kind, per ring cell its in-tile counts);
    2. driver solve: exits resolved in one ascending-z sweep (the chain
       strictly descends, so each exit's continuation is already done);
    3. haloed pass: counts = in-tile + broadcast continuation of the
       cell's terminal exit; one multiply-add forms the value plane."""
    from .halo import collect_strips

    grid = ts.grid
    ncols = grid.ncols
    strips = collect_strips(ts, halo_broadcast_budget, corners=True)

    def pass1(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        _nxt, (ex, ex_tr, ex_tc, ex_sd), ns, nd, term, zf = _tile_counts(
            win, br, bc, h, w
        )
        g_r0, g_c0 = gr0 - br, gc0 - bc
        # exit rows: one per body cell whose receiver lies outside the tile
        u = ex.astype(np.int64)
        src_e = (gr0 + u // w) * ncols + (gc0 + u % w)
        dst_e = (g_r0 + ex_tr.astype(np.int64)) * ncols + (
            g_c0 + ex_tc.astype(np.int64)
        )
        z_e = zf[u].astype(np.float64)
        a_e = ex_sd.astype(np.int64)
        # ring rows: each finite border-ring cell → its in-tile terminal
        ring = np.asarray(_border_ring_flat(h, w), dtype=np.int64)
        rfin = ring[np.isfinite(zf[ring])]
        tt = np.asarray(term, dtype=np.int64)[rfin]
        src_r = (gr0 + rfin // w) * ncols + (gc0 + rfin % w)
        dst_r = (gr0 + tt // w) * ncols + (gc0 + tt % w)
        ns_r = np.asarray(ns, dtype=np.int64)[rfin]
        nd_r = np.asarray(nd, dtype=np.int64)[rfin]
        ex_sorted = np.sort(u)
        if ex_sorted.size:
            pos = np.minimum(np.searchsorted(ex_sorted, tt), ex_sorted.size - 1)
            pit_r = ex_sorted[pos] != tt  # terminal is a true pit, not an exit
        else:
            pit_r = np.ones(tt.size, dtype=bool)
        n_e, n_r = src_e.size, src_r.size
        if n_e + n_r == 0:
            return None
        return pa.table(
            {
                "kind": pa.array(
                    np.r_[np.zeros(n_e, np.int8), np.ones(n_r, np.int8)]
                ),
                "src": pa.array(np.r_[src_e, src_r]),
                "dst": pa.array(np.r_[dst_e, dst_r]),
                "z": pa.array(np.r_[z_e, np.zeros(n_r)]),
                "a": pa.array(np.r_[a_e, ns_r]),
                "b": pa.array(np.r_[np.zeros(n_e, np.int64), nd_r]),
                "pit": pa.array(
                    np.r_[np.zeros(n_e, dtype=bool), pit_r]
                ),
            },
            schema=_LEN_SCHEMA,
        )

    rows = halo_map(
        ts, pass1, corners=True, budget_bytes=halo_broadcast_budget,
        strips=strips,
    )

    # ---- driver solve: one ascending-z sweep over the exits (vectorized
    # ingest + gathers; only the sweep itself — inherently sequential, each
    # exit's continuation resolved at strictly lower z — is a flat loop) ----
    cols = {f.name: [] for f in _LEN_SCHEMA}
    n_rows = 0
    for bt in rows.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_rows += bt.num_rows
        if n_rows > border_budget_rows:  # pragma: no cover - budget guard
            raise MemoryError(
                f"border table has {n_rows} rows > budget "
                f"{border_budget_rows}; apply the recursive tiles-of-tiles "
                "contraction (module note)"
            )
        for name in cols:
            cols[name].append(bt[name].to_numpy(zero_copy_only=False))

    def _cat(name, dtype):
        parts = cols[name]
        return (
            np.concatenate(parts) if parts else np.empty(0, dtype=dtype)
        )

    kind = _cat("kind", np.int8)
    src = _cat("src", np.int64)
    dst = _cat("dst", np.int64)
    z = _cat("z", np.float64)
    a = _cat("a", np.int64)
    b = _cat("b", np.int64)
    pit = _cat("pit", bool)
    em = kind == 0
    ex_src, ex_dst, ex_z, ex_sd = src[em], dst[em], z[em], a[em]
    ring_src, ring_dst = src[~em], dst[~em]
    ring_ns, ring_nd, ring_pit = a[~em], b[~em], pit[~em]
    n_ex = ex_src.size
    # each exit's receiver is a finite border-ring cell of the neighbor
    # tile, so a ring row exists for every ex_dst (gather via searchsorted;
    # srcs are unique and ties independent — unstable sorts throughout)
    ro = np.argsort(ring_src)
    rs = ring_src[ro]
    j = ro[np.searchsorted(rs, ex_dst)] if n_ex else np.empty(0, np.int64)
    base_ns = (1 - ex_sd) + ring_ns[j]  # this hop + receiver's in-tile hops
    base_nd = ex_sd + ring_nd[j]
    t_gid = ring_dst[j]  # the receiver's in-tile terminal
    t_pit = ring_pit[j]
    # continuation index: the terminal (when not a pit) is itself an exit
    eo = np.argsort(ex_src)
    es = ex_src[eo]
    ti = np.full(n_ex, -1, dtype=np.int64)
    if n_ex:
        nz = ~t_pit
        ti[nz] = eo[np.searchsorted(es, t_gid[nz])]
    order = np.argsort(ex_z)  # ascending z; equal-z exits are independent
    NS = [0] * n_ex
    ND = [0] * n_ex
    bnl, bdl, til = base_ns.tolist(), base_nd.tolist(), ti.tolist()
    for k in order.tolist():
        t = til[k]
        if t >= 0:
            NS[k] = bnl[k] + NS[t]
            ND[k] = bdl[k] + ND[t]
        else:
            NS[k] = bnl[k]
            ND[k] = bdl[k]

    import ray as _ray

    # broadcast as sorted arrays: (exit gid, ns, nd), searchsorted in pass 2
    ns_sorted = np.asarray(NS, dtype=np.int64)[eo]
    nd_sorted = np.asarray(ND, dtype=np.int64)[eo]
    cref = _ray.put((es, ns_sorted, nd_sorted))

    def pass2(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        import ray as _ray2

        sgid, NSa, NDa = _ray2.get(cref)
        _nxt, (exc, _tr, _tc, _sd), ns, nd, term, zf = _tile_counts(
            win, br, bc, h, w
        )
        idx = np.arange(h * w, dtype=np.int64)
        gid = (gr0 + idx // w) * ncols + (gc0 + idx % w)
        addn = np.zeros(h * w, dtype=np.int64)
        addd = np.zeros(h * w, dtype=np.int64)
        if exc.size:  # every exit gid is present in the broadcast arrays
            p = np.searchsorted(sgid, gid[exc])
            addn[exc] = NSa[p]
            addd[exc] = NDa[p]
        ta = np.asarray(term, dtype=np.int64)
        tot_ns = np.asarray(ns, dtype=np.float64) + addn[ta]
        tot_nd = np.asarray(nd, dtype=np.float64) + addd[ta]
        val = tot_ns + tot_nd * np.sqrt(2.0)
        val[np.isnan(zf)] = np.nan
        meta = _Meta(
            f"t{t_tr:04d}_{t_tc:04d}", t_tr, t_tc, gr0, gc0, h, w,
            "flow_length d8",
        )
        return rows_to_table([(meta, val.reshape(h, w))], lossless=True)

    out = halo_map(
        ts, pass2, corners=True, budget_bytes=halo_broadcast_budget,
        strips=strips,
    )
    return TileSet(ds=out, grid=grid)


def _stream_local(win, br, bc, h, w, weights, threshold, ncols, gr0, gc0):
    """Per-tile stream-forest chain contraction. Shared by the Strahler
    edge pass and the final plane pass — the two recompute it identically
    (same deterministic kernel), so nothing per-cell ever ships.

    Strahler order is CONSTANT along in-degree-1 chains (one inflow ⇒
    order copies), so only SIGNIFICANT stream cells need the global
    solve: heads (in-tile stream in-degree 0), junctions (≥ 2), and
    every border-ring stream cell (the only cells that can receive
    external inflows or exit the tile — a D8 neighbor of an outside
    cell is on the ring). Every other stream cell's order equals the
    order at its chain representative ``rep`` (the significant cell at
    the top of its chain), resolvable tile-locally.

    Returns ``(stream, sig, rep, nxt, exits, gid)`` over body-flat
    indices.
    """
    nxt, exits, acc, order, _t = _tile_flow(win, br, bc, h, w, weights=weights)
    stream = np.isfinite(acc) & (acc >= threshold)
    idx = np.arange(h * w, dtype=np.int64)
    gid = (gr0 + idx // w) * ncols + (gc0 + idx % w)
    s_idx = np.flatnonzero(stream)
    srcs = s_idx[nxt[s_idx] >= 0]  # in-tile stream edges s → nxt[s]
    dsts = nxt[srcs]
    indeg = np.bincount(dsts, minlength=h * w)
    ring = np.zeros(h * w, dtype=bool)
    ring[_border_ring_flat(h, w)] = True
    sig = stream & (ring | (indeg != 1))
    # chain cells have exactly one in-tile stream inflow (not ring ⇒ no
    # external inflow possible); gather it vectorized
    inflow = np.full(h * w, -1, dtype=np.int64)
    m1 = indeg[dsts] == 1
    inflow[dsts[m1]] = srcs[m1]
    rep = idx.copy()
    chain = stream & ~sig
    if chain.any():
        # descending-z sweep: a chain cell's single inflow sits strictly
        # higher, so its rep is already resolved (same justified
        # flat-list loop as _tile_flow)
        rl, il, cl = rep.tolist(), inflow.tolist(), chain.tolist()
        for j in order.tolist():
            if cl[j]:
                rl[j] = rl[il[j]]
        rep = np.asarray(rl, dtype=np.int64)
    return stream, sig, rep, nxt, exits, gid


_SIG_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = node (gid=src, z); 1 = edge (src → dst)
        ("src", pa.int64()),
        ("dst", pa.int64()),
        ("z", pa.float64()),
    ]
)


def strahler(
    ts: TileSet,
    threshold: float = 50.0,
    halo_broadcast_budget: int = 256 << 20,
    border_budget_rows: int = 50_000_000,
    stream_budget_rows: int = 50_000_000,
) -> TileSet:
    """Strahler stream order over the channel network (``oracle.strahler``
    semantics: cells with accumulation ≥ ``threshold``; head = 1; a cell
    is max of stream inflows, +1 when the max arrives twice).

    The network is CLOSED under D8 (accumulation is monotone downstream)
    and order is constant along in-degree-1 chains, so the solve runs on
    the CONTRACTED forest — one level of the module's tiles-of-tiles
    contraction, applied per tile (``_stream_local``):

    1. ``_acc_solve`` (the shared flowacc pass 1 + border sweep);
    2. haloed pass: per tile, recompute accumulation with the broadcast
       in-flows (exactly flowacc pass 2), contract in-degree-1 chains
       tile-locally, and EMIT only significant cells (heads, junctions,
       ring cells — border-scale, like the flowacc/flow_length solves)
       as nodes plus contracted edges ``rep(inflow) → significant cell``
       and cross-tile exit edges;
    3. driver: one descending-z sweep over the contracted graph resolves
       every significant order (an inflow's rep sits strictly higher,
       hence already resolved); ``stream_budget_rows`` guards the
       CONTRACTED table — the raw stream forest never materializes;
    4. haloed pass: re-derive the contraction per tile and paint the
       order plane as one vectorized ``searchsorted`` into the broadcast
       sorted ``(node gid, order)`` arrays via each cell's rep (0 for
       non-stream finite cells, NaN holes preserved).
    """
    grid = ts.grid
    ncols = grid.ncols
    strips, aref = _acc_solve(ts, halo_broadcast_budget, border_budget_rows)

    def edge_pass(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        import ray as _ray2

        in_gids, in_amts = _ray2.get(aref)
        weights = _weights_for(in_gids, in_amts, gr0, gc0, h, w, ncols)
        stream, sig, rep, nxt, (ex, ex_tr, ex_tc), gid = _stream_local(
            win, br, bc, h, w, weights, threshold, ncols, gr0, gc0
        )
        v = np.flatnonzero(sig)
        if not v.size:  # no stream cells ⇒ no significant cells either
            return None
        zf = win[br : br + h, bc : bc + w].ravel()
        # in-tile contracted edges: every stream inflow s of a significant
        # cell t contributes (rep(s) → t); distinct inflows lie on
        # distinct chains, so their reps are distinct — the +1-on-equal-
        # max count survives contraction exactly
        s_idx = np.flatnonzero(stream)
        srcs = s_idx[nxt[s_idx] >= 0]
        dsts = nxt[srcs]
        em = sig[dsts]
        e_src = gid[rep[srcs[em]]]
        e_dst = gid[dsts[em]]
        # cross-tile edges: stream exits → external receiver (a ring cell
        # of the neighbor tile — significant there; exits are ring cells
        # here, so rep(exit) = exit)
        xm = stream[ex]
        g_r0, g_c0 = gr0 - br, gc0 - bc
        x_src = gid[ex[xm]]
        x_dst = (g_r0 + ex_tr[xm].astype(np.int64)) * ncols + (
            g_c0 + ex_tc[xm].astype(np.int64)
        )
        n_n, n_e, n_x = v.size, e_src.size, x_src.size
        return pa.table(
            {
                "kind": pa.array(
                    np.r_[np.zeros(n_n, np.int8), np.ones(n_e + n_x, np.int8)]
                ),
                "src": pa.array(np.r_[gid[v], e_src, x_src]),
                "dst": pa.array(
                    np.r_[np.full(n_n, -1, np.int64), e_dst, x_dst]
                ),
                "z": pa.array(
                    np.r_[zf[v].astype(np.float64), np.zeros(n_e + n_x)]
                ),
            },
            schema=_SIG_SCHEMA,
        )

    rows = halo_map(
        ts, edge_pass, corners=True, budget_bytes=halo_broadcast_budget,
        strips=strips,
    )

    # ---- driver: descending-z Strahler sweep over the CONTRACTED graph
    # (significant nodes only — heads + junctions + ring cells; chains
    # never leave their tiles) ----
    cols = {"kind": [], "src": [], "dst": [], "z": []}
    n_rows = 0
    for b in rows.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_rows += b.num_rows
        if n_rows > stream_budget_rows:  # pragma: no cover - budget guard
            raise MemoryError(
                f"contracted stream graph exceeds budget "
                f"{stream_budget_rows} rows at threshold {threshold}; "
                "raise the threshold or apply the recursive contraction "
                "(module note)"
            )
        for name in cols:
            cols[name].append(b[name].to_numpy())
    if n_rows:
        kind = np.concatenate(cols["kind"])
        src = np.concatenate(cols["src"])
        dst = np.concatenate(cols["dst"])
        z = np.concatenate(cols["z"])
    else:
        kind = np.empty(0, np.int8)
        src = dst = np.empty(0, np.int64)
        z = np.empty(0)
    nm = kind == 0
    node_gid, node_z = src[nm], z[nm]
    e_src, e_dst = src[~nm], dst[~nm]
    # map edge endpoints to node indices (node gids are unique — each tile
    # emits exactly its own body cells; every edge endpoint IS a node:
    # sources are reps/exits, destinations are significant or ring cells)
    sg = np.argsort(node_gid)  # unique gids — stability is moot
    sorted_gid = node_gid[sg]
    n = node_gid.size
    # per-node single outgoing edge (a node's chain meets at most one
    # significant cell downstream; exits have exactly one receiver)
    out = np.full(n, -1, dtype=np.int64)
    if e_src.size:
        out[sg[np.searchsorted(sorted_gid, e_src)]] = sg[
            np.searchsorted(sorted_gid, e_dst)
        ]
    # unstable sort fine: equal-z nodes are independent (flow strictly
    # descends across every hop, so an inflow resolves strictly higher)
    order = np.argsort(-node_z)
    mxl = [0] * n
    cntl = [0] * n
    ordl = [0] * n
    outl = out.tolist()
    for k in order.tolist():
        m = mxl[k]
        oo = 1 if m == 0 else m + (1 if cntl[k] >= 2 else 0)
        ordl[k] = oo
        r = outl[k]
        if r >= 0:
            if oo > mxl[r]:
                mxl[r] = oo
                cntl[r] = 1
            elif oo == mxl[r]:
                cntl[r] += 1

    sorted_ord = np.asarray(ordl, dtype=np.float64)[sg]

    import ray as _ray

    oref = _ray.put((sorted_gid, sorted_ord))

    # ---- haloed pass: re-derive the tile-local contraction and paint the
    # plane via each cell's rep (every rep is a broadcast node) ----
    def plane_pass(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        import ray as _ray2

        in_gids, in_amts = _ray2.get(aref)
        sgid, sord = _ray2.get(oref)
        weights = _weights_for(in_gids, in_amts, gr0, gc0, h, w, ncols)
        stream, _sig, rep, _nxt, _ex, gid = _stream_local(
            win, br, bc, h, w, weights, threshold, ncols, gr0, gc0
        )
        outp = np.zeros(h * w)
        sidx = np.flatnonzero(stream)
        if sidx.size:
            outp[sidx] = sord[np.searchsorted(sgid, gid[rep[sidx]])]
        zf = win[br : br + h, bc : bc + w].ravel()
        outp[np.isnan(zf)] = np.nan
        meta = _Meta(
            f"t{t_tr:04d}_{t_tc:04d}", t_tr, t_tc, gr0, gc0, h, w,
            "strahler d8",
        )
        return rows_to_table([(meta, outp.reshape(h, w))], lossless=True)

    out_ds = halo_map(
        ts, plane_pass, corners=True, budget_bytes=halo_broadcast_budget,
        strips=strips,
    )
    return TileSet(ds=out_ds, grid=grid)


def stream_mask(ts: TileSet, threshold: float = 50.0, **kwargs) -> TileSet:
    """Stream-network extraction: cells whose D8 flow accumulation reaches
    ``threshold`` upstream cells form the channel network — the standard
    accumulation-threshold definition. 0/1/NaN ``raw-f32`` tiles; a pure
    vectorized map over ``flow_accumulation``, so the contraction's
    scale behavior carries over unchanged."""
    from .decode import map_tiles

    acc = flow_accumulation(ts, **kwargs)
    return map_tiles(
        acc,
        lambda arr, info: np.where(
            np.isnan(arr), np.nan, (arr >= threshold).astype(np.float64)
        ),
        lossless=True,
    )
