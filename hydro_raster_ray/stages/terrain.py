"""Slope / aspect surface derivatives as distributed data transforms.

The gradient-family companions of ``stages/hillshade.py`` (the reference's
``hillshade``, ``grid_show.py:136-158``, is the shaded member of the same
``np.gradient`` derivative family): slope in degrees and downslope-azimuth
aspect in degrees clockwise from north. One 1-px halo exchange
(``stages/halo.py``), one per-tile kernel, no global pass — unlike
hillshade there is no contrast stretch, so the pipeline is single-phase
and fully streaming (no materialize).

NODATA semantics (mirrored by the witness ``oracle.slope_aspect``): NaN
holes PROPAGATE through the central differences — no pre-fill — so
derivatives are NaN in the 1-px neighborhood of a hole and outside-grid
window cells never contaminate a body cell (``np.gradient`` reads no
diagonal corners; a missing halo side occurs exactly at a global grid
edge where the witness's one-sided difference applies too).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..grid import morton_encode, tile_id
from ..sources.tiles import TileSet
from .decode import iter_tiles, rows_to_table
from .halo import (
    assemble_window,
    collect_strips,
    emit_halo_frags,
    window_from_broadcast,
)

__all__ = ["slope", "aspect", "curvature", "flow_dir", "fill_pits", "d8_codes"]


def _terrain(
    ts: TileSet,
    kernel,
    caption: str,
    shuffle_blocks: int | None,
    halo_broadcast_budget: int = 256 << 20,
    corners: bool = False,
) -> TileSet:
    grid = ts.grid

    # Broadcast-halo fast path: the 1-px strips are ~1.5 % of the corpus —
    # a genuine small side. When they fit the budget, ship them once via
    # ray.put and compute every tile's derivative in ONE map pass: no
    # groupby, no sort barrier (the ds.stats audit showed the sort-barrier
    # pipeline idles ~2/3 of CPU slots on this family). Fallback below is
    # the exchange path; both produce bit-identical windows (same f32
    # round-trip, same NaN hull), asserted by tests.
    strips = collect_strips(ts, halo_broadcast_budget, corners=corners)
    if strips is not None:
        import ray as _ray

        sref = _ray.put(strips)

        def apply(batch: pa.Table) -> pa.Table:
            import ray as _ray2

            dd = _ray2.get(sref)
            rows = []
            for info, arr in iter_tiles(batch, grid, dtype=np.float32):
                win, br, bc = window_from_broadcast(info, arr, dd)
                plane = kernel(win)[br : br + info.h, bc : bc + info.w]
                meta = _Meta(
                    info.image_id, info.tile_row, info.tile_col,
                    info.gr0, info.gc0, info.h, info.w, caption,
                )
                rows.append((meta, plane))
            if not rows:
                return rows_to_table([]).slice(0, 0)
            return rows_to_table(rows, lossless=True)

        return TileSet(
            ds=ts.ds.map_batches(apply, batch_format="pyarrow"), grid=grid
        )

    def emit(batch: pa.Table) -> pa.Table:
        return emit_halo_frags(batch, grid, corners=corners)

    def build(g: pa.Table) -> pa.Table:
        asm = assemble_window(g)
        if asm is None:
            return rows_to_table([]).slice(0, 0)
        t_tr, t_tc, gr0, gc0, h, w, win, br, bc = asm
        plane = kernel(win)[br : br + h, bc : bc + w]
        info = _Meta(tile_id(t_tr, t_tc), t_tr, t_tc, gr0, gc0, h, w, caption)
        return rows_to_table([(info, plane)], lossless=True)

    # at-scale fallback (strips over budget): bucket-file exchange — same
    # bit-identical windows, no sort barrier (stages/exchange.py)
    frags = ts.ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
    from .exchange import fragment_exchange

    out = fragment_exchange(frags, build, key="tkey")
    return TileSet(ds=out, grid=grid)


class _Meta:
    """Duck-typed tile meta for ``rows_to_table`` (image_id + placement)."""

    __slots__ = (
        "image_id", "tile_row", "tile_col", "gr0", "gc0", "h", "w", "caption", "cell",
    )

    def __init__(self, image_id, tile_row, tile_col, gr0, gc0, h, w, caption):
        self.image_id = image_id
        self.tile_row = tile_row
        self.tile_col = tile_col
        self.gr0 = gr0
        self.gc0 = gc0
        self.h = h
        self.w = w
        self.caption = caption
        self.cell = int(morton_encode(int(tile_row), int(tile_col)))


def slope(
    ts: TileSet,
    dx: float = 1.0,
    dy: float = 1.0,
    vert_exag: float = 1.0,
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """Slope raster in DEGREES (``raw-f32`` tiles):
    ``degrees(arctan(hypot(dz/d_east, dz/d_north)))`` with the hillshade
    gradient convention (row 0 is north → ``dy`` negated)."""

    def kernel(win: np.ndarray) -> np.ndarray:
        e_dy, e_dx = np.gradient(vert_exag * win, -dy, dx)
        return np.degrees(np.arctan(np.hypot(e_dx, e_dy)))

    return _terrain(ts, kernel, "slope deg", shuffle_blocks, halo_broadcast_budget)


def aspect(
    ts: TileSet,
    dx: float = 1.0,
    dy: float = 1.0,
    vert_exag: float = 1.0,
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """Aspect raster (``raw-f32`` tiles): downslope azimuth in degrees
    CLOCKWISE FROM NORTH in [0, 360); flat cells get 0 (``arctan2(0, 0)``),
    NaN-derivative cells stay NaN — identical to ``oracle.slope_aspect``."""

    def kernel(win: np.ndarray) -> np.ndarray:
        e_dy, e_dx = np.gradient(vert_exag * win, -dy, dx)
        slope_nan = np.isnan(e_dx) | np.isnan(e_dy)
        asp = np.mod(np.degrees(np.arctan2(-e_dx, -e_dy)), 360.0)
        return np.where(slope_nan, np.nan, asp)

    return _terrain(ts, kernel, "aspect deg", shuffle_blocks, halo_broadcast_budget)


def curvature(
    ts: TileSet,
    cs: float = 1.0,
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """Laplacian curvature raster (``raw-f32`` tiles): central second
    difference ``((up + dn) + (lf + rt) − 4·c) / cs²`` — the same fixed
    add order as ``oracle.curvature``, so tiling is invisible. Grid-edge
    cells and the 1-px neighborhood of holes are NaN (derivative-family
    propagation, unlike the hole-FILLING focal family)."""

    def kernel(win: np.ndarray) -> np.ndarray:
        a = win.astype(np.float64)
        h, w = a.shape
        p = np.full((h + 2, w + 2), np.nan)
        p[1:-1, 1:-1] = a
        up, dn = p[:-2, 1:-1], p[2:, 1:-1]
        lf, rt = p[1:-1, :-2], p[1:-1, 2:]
        return ((up + dn) + (lf + rt) - 4.0 * a) / (cs * cs)

    return _terrain(
        ts, kernel, "curvature", shuffle_blocks, halo_broadcast_budget
    )


# D8 neighbor table (ESRI codes in tie-break order) — must match the
# witness table in ``oracle.flow_dir_d8``
_D8 = (
    (0, 1, 1.0, 1.0),        # E
    (1, 1, 2.0 ** 0.5, 2.0),     # SE
    (1, 0, 1.0, 4.0),        # S
    (1, -1, 2.0 ** 0.5, 8.0),    # SW
    (0, -1, 1.0, 16.0),      # W
    (-1, -1, 2.0 ** 0.5, 32.0),  # NW
    (-1, 0, 1.0, 64.0),      # N
    (-1, 1, 2.0 ** 0.5, 128.0),  # NE
)


def flow_dir(
    ts: TileSet,
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """D8 flow direction — the hydrology stencil the reference's flood
    toolkit conditions DEMs for. ESRI codes (E=1 … NE=128), steepest
    positive drop rate ``(z - z_n)/dist``, first-code tie-break, 0 for
    pits/flats, NaN holes stay NaN; semantics defined by the witness
    ``oracle.flow_dir_d8``.

    An 8-CONNECTED stencil: unlike the gradient family it reads diagonal
    corners, so the halo exchange ships the four 1×1 corner pixels too
    (``emit_halo_frags(corners=True)``). Same two paths as slope/aspect:
    broadcast-halo single map pass when the strips fit the budget, the
    bucket-file exchange at scale — bit-identical either way.

    The stacked-argmax kernel is a different formulation from the
    witness's running-max loop; both reduce to "first code of the maximal
    positive drop", asserted equal by the goldens.
    """

    return _terrain(
        ts, d8_codes, "flow_dir d8", shuffle_blocks, halo_broadcast_budget,
        corners=True,
    )


def d8_codes(win: np.ndarray) -> np.ndarray:
    """The D8 kernel over one (haloed) window: ESRI code plane (0 =
    pit/flat, NaN preserved). Shared by ``flow_dir`` and the
    flow-accumulation passes (``stages/flowacc``) so the two operators
    agree cell-for-cell by construction."""
    h, w = win.shape
    p = np.pad(win.astype(np.float64, copy=False), 1, constant_values=np.nan)
    z = p[1:-1, 1:-1]
    best = np.full((h, w), -np.inf)
    code = np.zeros((h, w))
    with np.errstate(invalid="ignore"):
        for dr, dc, dist, c in _D8:
            zn = p[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
            d = z - zn
            if dist != 1.0:  # unit-distance divides are identity, skip them
                d = d / dist
            # NaN drops compare False, so holes never win — no -inf rewrite
            take = d > best  # strict: the first code in table order wins ties
            best = np.where(take, d, best)
            code = np.where(take, float(c), code)
    out = np.where(best > 0, code, 0.0)
    out[np.isnan(z)] = np.nan
    return out


def fill_pits(
    ts: TileSet,
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """Single-cell pit fill (DEM conditioning for ``flow_dir``): a finite
    cell strictly below all eight in-grid finite neighbors rises to the
    neighborhood minimum; global-edge and hole-adjacent cells are never
    pits (they drain outward / into the hole). Semantics defined by the
    witness ``oracle.fill_pits``; 8-connected, so the halo ships corner
    pixels like ``flow_dir``."""

    def kernel(win: np.ndarray) -> np.ndarray:
        h, w = win.shape
        p = np.pad(win.astype(np.float64, copy=False), 1,
                   constant_values=np.nan)
        z = p[1:-1, 1:-1]
        nmin = np.full((h, w), np.inf)
        all_finite = np.ones((h, w), dtype=bool)
        for dr, dc, _dist, _c in _D8:
            zn = p[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
            all_finite &= np.isfinite(zn)
            nmin = np.fmin(nmin, np.where(np.isnan(zn), np.inf, zn))
        pit = np.isfinite(z) & all_finite & (z < nmin)
        return np.where(pit, nmin, z)

    return _terrain(
        ts, kernel, "fill_pits", shuffle_blocks, halo_broadcast_budget,
        corners=True,
    )
