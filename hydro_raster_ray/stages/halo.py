"""Shared 1-px halo-exchange machinery for window-stencil tile transforms.

Gradient-family operators (hillshade, slope/aspect) need each tile's body
plus a 1-px ring from its 4-neighbors so central differences at tile edges
match a whole-array computation exactly. The pattern (originated in
``stages/hillshade.py``, now shared): each tile emits its body and four
1-px edge strips keyed to the neighbor tiles, one ``groupby(tkey)``
co-locates every tile with its halo (~1.03× the corpus through the
exchange), and the consumer assembles the extended float64 window.

``np.gradient``'s central differences never read diagonal corners, so
4-neighbor strips are sufficient; a missing halo side occurs exactly at a
global grid edge, where the whole-array one-sided difference applies too —
body derivatives are therefore bit-identical to the single-array witness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import decode, encode
from ..grid import morton_encode
from .decode import iter_tiles
from .mosaic import _frag_table

__all__ = [
    "emit_halo_frags",
    "assemble_window",
    "collect_strips",
    "window_from_broadcast",
]


def window_from_broadcast(info, arr: np.ndarray, strips: dict):
    """Broadcast-halo fast path, phase 2: one tile's extended float64
    window from its own body plus the broadcast strip entries for its
    cell key. Returns ``(win, br, bc)`` — same NaN hull, same f32→f64
    placement as ``assemble_window``, so downstream kernels are
    bit-identical across the two paths."""
    ents = [(info.gr0, info.gc0, info.h, info.w, arr)]
    for r0, c0, fh, fw, pay in strips.get(int(info.cell), ()):
        ents.append((r0, c0, fh, fw, decode(pay, fh, fw, "raw-f32")))
    win_r0 = min(e[0] for e in ents)
    win_c0 = min(e[1] for e in ents)
    hh = max(e[0] + e[2] for e in ents) - win_r0
    ww = max(e[1] + e[3] for e in ents) - win_c0
    win = np.full((hh, ww), np.nan)
    for r0, c0, fh, fw, a in ents:
        win[r0 - win_r0 : r0 - win_r0 + fh, c0 - win_c0 : c0 - win_c0 + fw] = a
    return win, info.gr0 - win_r0, info.gc0 - win_c0


def emit_halo_frags(
    batch: pa.Table, grid, strips_only: bool = False, corners: bool = False
) -> pa.Table:
    """Fragment rows for one input batch: per tile, the body (prio=1) plus
    up to four 1-px edge strips aimed at the 4-neighbor tile keys (prio=0).
    f32 fragments (lossless by codec contract — half the exchange bytes).
    ``strips_only=True`` omits the bodies — the strip side alone is ~1.5 %
    of the corpus bytes (2·(h+w)/(h·w) of each tile), which is what makes
    the broadcast-halo fast path (``collect_strips``) viable.

    ``corners=True`` additionally ships the four 1×1 corner pixels to the
    diagonal neighbors — required by 8-connected stencils (D8 flow
    direction); ``np.gradient``'s axis-aligned differences never read
    corners, so the gradient family leaves this off."""
    out = []
    for info, arr in iter_tiles(batch, grid, dtype=np.float32):
        tr, tc = info.tile_row, info.tile_col

        def frag(a, key_tr, key_tc, r0, c0, prio=0):
            out.append(
                {
                    "tkey": int(morton_encode(int(key_tr), int(key_tc))),
                    "t_tr": int(key_tr),
                    "t_tc": int(key_tc),
                    "prio": prio,
                    "fr0": 0,
                    "fc0": 0,
                    "fh": a.shape[0],
                    "fw": a.shape[1],
                    "payload": encode(np.ascontiguousarray(a), "raw-f32"),
                    "src_r0": int(r0),
                    "src_c0": int(c0),
                }
            )

        if not strips_only:
            frag(arr, tr, tc, info.gr0, info.gc0, prio=1)  # body
        if tr > 0:  # my row 0 is the north neighbor's south halo
            frag(arr[:1, :], tr - 1, tc, info.gr0, info.gc0)
        if info.gr0 + info.h < grid.nrows:
            frag(arr[-1:, :], tr + 1, tc, info.gr0 + info.h - 1, info.gc0)
        if tc > 0:
            frag(arr[:, :1], tr, tc - 1, info.gr0, info.gc0)
        if info.gc0 + info.w < grid.ncols:
            frag(arr[:, -1:], tr, tc + 1, info.gr0, info.gc0 + info.w - 1)
        if corners:
            n_ok = tr > 0
            s_ok = info.gr0 + info.h < grid.nrows
            w_ok = tc > 0
            e_ok = info.gc0 + info.w < grid.ncols
            r1, c1 = info.gr0 + info.h - 1, info.gc0 + info.w - 1
            if n_ok and w_ok:
                frag(arr[:1, :1], tr - 1, tc - 1, info.gr0, info.gc0)
            if n_ok and e_ok:
                frag(arr[:1, -1:], tr - 1, tc + 1, info.gr0, c1)
            if s_ok and w_ok:
                frag(arr[-1:, :1], tr + 1, tc - 1, r1, info.gc0)
            if s_ok and e_ok:
                frag(arr[-1:, -1:], tr + 1, tc + 1, r1, c1)
    return _frag_table(out)


def collect_strips(ts, budget_bytes: int, corners: bool = False):
    """Broadcast-halo fast path, phase 1: materialize ONLY the 1-px edge
    strips (≈1.5 % of the corpus through the object store — strictly less
    than the groupby path, which exchanges strips AND bodies) and, when
    they fit ``budget_bytes``, collect them into a ``{tkey: [(src_r0,
    src_c0, fh, fw, payload), ...]}`` dict for ``ray.put``. Returns the
    dict or ``None`` (caller falls back to the groupby exchange). The
    small side here is the halo itself — the same broadcast-not-shuffle
    trade as the gauge/feature broadcasts, so each tile's derivative can
    be computed in ONE map pass with no all-to-all barrier at all."""
    grid = ts.grid
    strips = ts.ds.map_batches(
        lambda b: emit_halo_frags(b, grid, strips_only=True, corners=corners),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    if strips.size_bytes() > budget_bytes:
        return None
    d: dict = {}
    for b in strips.iter_batches(batch_size=None, batch_format="pyarrow"):
        if not b.num_rows:
            continue
        tk = b["tkey"].to_numpy()
        r0 = b["src_r0"].to_numpy()
        c0 = b["src_c0"].to_numpy()
        fh = b["fh"].to_numpy()
        fw = b["fw"].to_numpy()
        pay = b["payload"].to_pylist()
        for i in range(b.num_rows):
            d.setdefault(int(tk[i]), []).append(
                (int(r0[i]), int(c0[i]), int(fh[i]), int(fw[i]), pay[i])
            )
    return d


def assemble_window(g: pa.Table):
    """Assemble one tile's extended window from its co-located fragment
    group. Returns ``(t_tr, t_tc, gr0, gc0, h, w, win, br, bc)`` where
    ``win`` is the float64 extended window (NaN where no fragment landed)
    and ``win[br:br+h, bc:bc+w]`` is the tile body — or ``None`` for a
    body-less group (strips aimed at a missing tile of a sparse set)."""
    prios = g["prio"].to_numpy(zero_copy_only=False)
    if prios.max() == 0:
        return None
    r0s = g["src_r0"].to_numpy(zero_copy_only=False)
    c0s = g["src_c0"].to_numpy(zero_copy_only=False)
    fhs = g["fh"].to_numpy(zero_copy_only=False)
    fws = g["fw"].to_numpy(zero_copy_only=False)
    t_tr = int(g["t_tr"][0].as_py())
    t_tc = int(g["t_tc"][0].as_py())
    bi = int(np.argmax(prios))
    h, w = int(fhs[bi]), int(fws[bi])
    gr0, gc0 = int(r0s[bi]), int(c0s[bi])
    win_r0 = int(r0s.min())
    win_c0 = int(c0s.min())
    win = np.full(
        (int((r0s + fhs).max()) - win_r0, int((c0s + fws).max()) - win_c0),
        np.nan,
    )
    for i in range(g.num_rows):
        fragm = decode(g["payload"][i].as_py(), int(fhs[i]), int(fws[i]), "raw-f32")
        rr = int(r0s[i]) - win_r0
        cc = int(c0s[i]) - win_c0
        win[rr : rr + int(fhs[i]), cc : cc + int(fws[i])] = fragm
    return t_tr, t_tc, gr0, gc0, h, w, win, gr0 - win_r0, gc0 - win_c0


def halo_map(ts, fn, corners: bool = False, budget_bytes: int = 256 << 20,
             strips="auto"):
    """Generic haloed-window map: run ``fn(t_tr, t_tc, gr0, gc0, h, w, win,
    br, bc) -> pa.Table`` once per tile over its halo-extended float64
    window (``win[br:br+h, bc:bc+w]`` is the body). Output schema is the
    caller's — unlike ``stages/terrain._terrain`` the result need not be
    tile rows, which is what the flow-accumulation passes need (border
    edge tables in pass 1, accumulation tiles in pass 2).

    Same two paths as the terrain family, bit-identical windows either
    way: broadcast-halo single map pass when the strips fit
    ``budget_bytes``; the bucket-file exchange (``stages/exchange.py``)
    at scale. Multi-pass callers (flow accumulation, basins) collect the
    strips ONCE and pass the dict via ``strips`` — the collection is a
    full corpus read, so re-collecting per pass doubles that cost;
    ``strips=None`` forces the exchange path without re-collecting."""
    import pyarrow as _pa

    grid = ts.grid
    if strips == "auto":
        strips = collect_strips(ts, budget_bytes, corners=corners)
    if strips is not None:
        import ray as _ray

        sref = _ray.put(strips)

        def apply(batch: _pa.Table):
            # generator UDF — a batch whose every tile yields None produces
            # zero output blocks (no empty-schema fabrication needed)
            import ray as _ray2

            dd = _ray2.get(sref)
            for info, arr in iter_tiles(batch, grid, dtype=np.float32):
                win, br, bc = window_from_broadcast(info, arr, dd)
                out = fn(info.tile_row, info.tile_col, info.gr0, info.gc0,
                         info.h, info.w, win, br, bc)
                if out is not None and out.num_rows:
                    yield out

        return ts.ds.map_batches(apply, batch_format="pyarrow")

    def emit(batch: _pa.Table) -> _pa.Table:
        return emit_halo_frags(batch, grid, corners=corners)

    def build(g: _pa.Table) -> _pa.Table:
        asm = assemble_window(g)
        if asm is None:
            return None
        t_tr, t_tc, gr0, gc0, h, w, win, br, bc = asm
        return fn(t_tr, t_tc, gr0, gc0, h, w, win, br, bc)

    from .exchange import fragment_exchange

    frags = ts.ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
    return fragment_exchange(frags, build, key="tkey")
