"""Distributed D8 flow accumulation — Barnes-style tile contraction.

``oracle.flow_accumulation`` defines the semantics (upstream cell count,
self included; NaN holes preserved; pits/flats absorb). A whole-array
descending-z pass cannot run on a tiled corpus, so the engine uses the
tile-contraction scheme of Barnes 2017 ("Parallel non-divergent flow
accumulation for trillion cell DEMs" — public literature, pattern only):

1. **Pass 1 (haloed map, ``halo.halo_map``)**: per tile, D8 directions
   from the corner halo (``terrain.d8_codes`` — shared kernel, so
   ``flow_dir`` and accumulation agree by construction), then a LOCAL
   accumulation over in-tile paths only (descending-z push — D8 drops are
   strictly positive, so elevation is a topological order). Emits only
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
   (``ray.put``), recompute the cheap local state per tile, walk each
   external in-flow down its in-tile path, and emit final accumulation
   tiles (lossless ``raw-f32``; counts are exact integers below 2²⁴ —
   beyond that scale, sink the plane to an int64 column table instead).

Every pass streams; the only materialized artifacts are the border rows
and the in-flow dict. Re-entrant rivers (leave a tile, come back) are
correct: each (entry, exit) segment is its own pass-through link.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tiles import TileSet
from .halo import halo_map
from .terrain import _D8, _Meta, d8_codes
from .decode import rows_to_table

__all__ = ["flow_accumulation"]

# window-flat step per ESRI code (filled per window width at use time)
_CODE_TO_K = {int(c): k for k, (_r, _c2, _d, c) in enumerate(_D8)}
_DR = np.array([d[0] for d in _D8])
_DC = np.array([d[1] for d in _D8])
_CODES = np.array([d[3] for d in _D8])


def _tile_flow(win: np.ndarray, br: int, bc: int, h: int, w: int):
    """Shared per-tile state: body D8 codes, each body cell's receiver in
    BODY-flat coords (-1 = none / exits tile), the window coords of
    out-of-body receivers, and the body's local accumulation.

    Local accumulation: descending-z push over in-body edges only —
    elevation is a topological order because D8 drops are strictly
    positive."""
    codes = d8_codes(win)[br : br + h, bc : bc + w]
    zbody = win[br : br + h, bc : bc + w]
    m = np.isfinite(codes) & (codes > 0)
    # code → table-row lookup (codes are powers of two, not ordered)
    lut = np.zeros(256, dtype=np.int64)
    for c, k in _CODE_TO_K.items():
        lut[c] = k
    rr, cc = np.nonzero(m)
    k = lut[codes[rr, cc].astype(np.int64)]
    tr_w = rr + br + _DR[k]  # receiver in window coords
    tc_w = cc + bc + _DC[k]
    inside = (
        (tr_w >= br) & (tr_w < br + h) & (tc_w >= bc) & (tc_w < bc + w)
    )
    nxt = np.full(h * w, -1, dtype=np.int64)  # body-flat receiver
    bidx = rr * w + cc
    nxt[bidx[inside]] = (tr_w[inside] - br) * w + (tc_w[inside] - bc)
    # out-of-body receivers (window coords) per exiting body cell
    exit_cells = bidx[~inside]
    exit_tr_w = tr_w[~inside]
    exit_tc_w = tc_w[~inside]

    acc = np.where(np.isnan(zbody), np.nan, 1.0).ravel()
    zf = zbody.ravel()
    finite = np.flatnonzero(np.isfinite(zf))
    order = finite[np.argsort(-zf[finite], kind="stable")]
    nx = nxt
    for idx in order:
        t = nx[idx]
        if t >= 0:
            acc[t] += acc[idx]
    return codes, nxt, (exit_cells, exit_tr_w, exit_tc_w), acc


def _border_ring_flat(h: int, w: int) -> np.ndarray:
    """Body-flat indices of the tile's border ring (the only cells that can
    receive flow from outside the tile)."""
    idx = []
    idx.extend(range(w))  # top row
    if h > 1:
        idx.extend(range((h - 1) * w, h * w))  # bottom row
    for r in range(1, h - 1):
        idx.append(r * w)
        if w > 1:
            idx.append(r * w + w - 1)
    return np.array(sorted(set(idx)), dtype=np.int64)


_EDGE_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = transfer, 1 = pass-through
        ("src", pa.int64()),  # transfer: exit cell gid; passthru: entry gid
        ("dst", pa.int64()),  # transfer: receiver gid; passthru: exit gid
        ("amount", pa.float64()),  # transfer: local accumulation at src
        ("z", pa.float64()),  # transfer: z(src) — the solve's sort key
    ]
)


def flow_accumulation(
    ts: TileSet,
    halo_broadcast_budget: int = 256 << 20,
    border_budget_rows: int = 50_000_000,
) -> TileSet:
    """D8 flow accumulation over the mosaic (see module docstring)."""
    grid = ts.grid
    ncols = grid.ncols

    def pass1(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        codes, nxt, (exit_cells, exit_tr_w, exit_tc_w), acc = _tile_flow(
            win, br, bc, h, w
        )
        zbody = win[br : br + h, bc : bc + w].ravel()
        # window top-left in global pixel coords
        g_r0, g_c0 = gr0 - br, gc0 - bc
        rows = {"kind": [], "src": [], "dst": [], "amount": [], "z": []}
        # transfers: every body cell whose receiver is outside the body
        for j in range(exit_cells.size):
            u = int(exit_cells[j])
            rows["kind"].append(0)
            rows["src"].append((gr0 + u // w) * ncols + (gc0 + u % w))
            rows["dst"].append(
                (g_r0 + int(exit_tr_w[j])) * ncols + (g_c0 + int(exit_tc_w[j]))
            )
            rows["amount"].append(float(acc[u]))
            rows["z"].append(float(zbody[u]))
        # pass-throughs: border-ring entry → its in-tile exit cell
        exit_set = set(int(x) for x in exit_cells)
        for v in _border_ring_flat(h, w):
            v = int(v)
            if not np.isfinite(zbody[v]):
                continue
            cur = v
            seen = 0
            while True:
                if cur in exit_set:
                    rows["kind"].append(1)
                    rows["src"].append((gr0 + v // w) * ncols + (gc0 + v % w))
                    rows["dst"].append(
                        (gr0 + cur // w) * ncols + (gc0 + cur % w)
                    )
                    rows["amount"].append(0.0)
                    rows["z"].append(0.0)
                    break
                nx = int(nxt[cur])
                if nx < 0:
                    break  # terminates inside the tile (pit/flat)
                cur = nx
                seen += 1
                if seen > h * w:  # pragma: no cover - cycle guard
                    raise RuntimeError("flow cycle inside tile")
        if not rows["kind"]:
            return None
        return pa.table(
            {k: pa.array(vs, _EDGE_SCHEMA.field(k).type) for k, vs in rows.items()},
            schema=_EDGE_SCHEMA,
        )

    edges = halo_map(
        ts, pass1, corners=True, budget_bytes=halo_broadcast_budget
    )

    # ---- border solve (driver): one descending-z sweep ----
    import pandas as pd

    frames = [
        b.to_pandas()
        for b in edges.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    df = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=[f.name for f in _EDGE_SCHEMA])
    )
    if len(df) > border_budget_rows:  # pragma: no cover - budget guard
        raise MemoryError(
            f"border table has {len(df)} rows > budget {border_budget_rows}; "
            "apply the recursive tiles-of-tiles contraction (module note)"
        )
    passthru = df[df["kind"] == 1]
    # exit cell gid → entry gids routed through it
    exit_to_entries: dict[int, list[int]] = {}
    for s, d in zip(passthru["src"].to_numpy(), passthru["dst"].to_numpy()):
        exit_to_entries.setdefault(int(d), []).append(int(s))
    tr = df[df["kind"] == 0].sort_values("z", ascending=False, kind="stable")
    in_amt: dict[int, float] = {}
    for s, d, a in zip(
        tr["src"].to_numpy(), tr["dst"].to_numpy(), tr["amount"].to_numpy()
    ):
        c = float(a)
        for entry in exit_to_entries.get(int(s), ()):
            c += in_amt.get(entry, 0.0)
        in_amt[int(d)] = in_amt.get(int(d), 0.0) + c

    import ray as _ray

    aref = _ray.put(in_amt)

    def pass2(t_tr, t_tc, gr0, gc0, h, w, win, br, bc):
        import ray as _ray2

        amounts = _ray2.get(aref)
        codes, nxt, _exits, acc = _tile_flow(win, br, bc, h, w)
        for v in _border_ring_flat(h, w):
            v = int(v)
            gid = (gr0 + v // w) * ncols + (gc0 + v % w)
            a = amounts.get(gid)
            if not a:
                continue
            cur = v
            while cur >= 0:
                acc[cur] += a
                cur = int(nxt[cur])
        meta = _Meta(
            f"t{t_tr:04d}_{t_tc:04d}", t_tr, t_tc, gr0, gc0, h, w,
            "flow_acc d8",
        )
        return rows_to_table([(meta, acc.reshape(h, w))], lossless=True)

    out = halo_map(ts, pass2, corners=True, budget_bytes=halo_broadcast_budget)
    return TileSet(ds=out, grid=grid)
