"""Hillshade as a distributed data transform.

The reference's ``hillshade`` (``grid_show.py:136-158``) fills NODATA/NaN
with the global nanmax and delegates shading to matplotlib's
``LightSource``; the data-transform core of that call is the documented
``LightSource.hillshade`` algorithm: gradient surface normals (row spacing
negated — row 0 is north), a dot product with the light direction
``(cos(90°−az)·cos(alt), sin(90°−az)·cos(alt), sin(alt))``, then a GLOBAL
min/max contrast stretch and [0, 1] clip. Drawing (colormap blending,
imshow) stays out of scope per SURVEY §2.9.

Distribution (bit-exact vs the whole-array witness ``oracle.hillshade``):

1. one stats pass → global nanmax (the NaN fill value);
2. fragment shuffle (the ``resample``/``mosaic`` pattern): each tile emits
   its body plus four 1-px edge strips keyed to its N/S/E/W neighbors —
   ``np.gradient``'s central differences never read diagonal corners, so
   4-neighbor strips are sufficient; one ``groupby(tkey)`` co-locates each
   tile with its halo (~1.03× the corpus through the exchange, same order
   as one resample);
3. per-tile: assemble the (≤h+2, ≤w+2) extended window, fill NaN with the
   global max, ``np.gradient`` over the window and slice the body back out
   — a missing halo side occurs exactly at a global grid edge, where the
   witness's one-sided difference applies too, so every body derivative is
   bit-identical to the whole-array computation. Intensity is kept in
   FLOAT64 fragments (f32 would quantize before the stretch) with per-tile
   min/max columns;
4. an O(tiles) min/max reduce → global stretch bounds, then a final
   ``map_batches`` rescales, clips and encodes ``raw-f32`` tiles.

The intermediate intensity TileSet is materialized in the object store
(spillable) because the global stretch needs the full pass-2 result before
pass 3 can start — the stretch is inherently two-phase.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import decode, encode, phash64
from ..grid import morton_encode
from ..sources.tiles import TileSet
from . import stats
from .decode import iter_tiles
from .halo import (
    assemble_window,
    collect_strips,
    emit_halo_frags,
    window_from_broadcast,
)

__all__ = ["hillshade"]

_INTER_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("gr0", pa.int32()),
        ("gc0", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("cell", pa.int64()),
        ("payload", pa.binary()),  # float64 intensity, C order
        ("imin", pa.float64()),
        ("imax", pa.float64()),
    ]
)


def hillshade(
    ts: TileSet,
    azdeg: float = 315.0,
    altdeg: float = 45.0,
    vert_exag: float = 1.0,
    dx: float = 1.0,
    dy: float = 1.0,
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """Illumination-intensity raster in [0, 1] (``raw-f32`` tiles) — see
    module docstring. Defaults mirror the reference call (az 315°, alt 45°,
    ``dx = dy = 1`` cell units, ``vert_exag = 1``)."""
    grid = ts.grid
    zmax = float(stats.global_stats(ts)["max"])
    az = np.radians(90.0 - azdeg)
    alt = np.radians(altdeg)
    d0 = float(np.cos(az) * np.cos(alt))
    d1 = float(np.sin(az) * np.cos(alt))
    d2 = float(np.sin(alt))

    def intensity_rows(items) -> pa.Table:
        """Shared phase-1 kernel: (t_tr, t_tc, gr0, gc0, h, w, win, br, bc)
        items → _INTER_SCHEMA rows. The window is float64 so np.gradient
        matches the whole-array oracle bit-exactly on BOTH halo paths."""
        from ..grid import tile_id

        cols: dict = {name: [] for name in _INTER_SCHEMA.names}
        for t_tr, t_tc, gr0, gc0, h, w, win, br, bc in items:
            win[np.isnan(win)] = zmax
            g_dy, g_dx = np.gradient(vert_exag * win, -dy, dx)
            e_dy = g_dy[br : br + h, bc : bc + w]
            e_dx = g_dx[br : br + h, bc : bc + w]
            mag = np.sqrt(e_dx * e_dx + e_dy * e_dy + 1.0)
            inten = (-e_dx * d0 - e_dy * d1 + d2) / mag
            cols["image_id"].append(tile_id(t_tr, t_tc))
            cols["tile_row"].append(t_tr)
            cols["tile_col"].append(t_tc)
            cols["gr0"].append(gr0)
            cols["gc0"].append(gc0)
            cols["h"].append(h)
            cols["w"].append(w)
            cols["cell"].append(int(morton_encode(t_tr, t_tc)))
            cols["payload"].append(inten.tobytes())
            cols["imin"].append(float(inten.min()))
            cols["imax"].append(float(inten.max()))
        if not cols["image_id"]:
            return _INTER_SCHEMA.empty_table()
        return pa.table(cols, schema=_INTER_SCHEMA)

    strips = collect_strips(ts, halo_broadcast_budget)
    if strips is not None:
        # broadcast-halo fast path (stages/halo.py): strips ship once via
        # ray.put and phase 1 is ONE map pass — no groupby/sort barrier
        import ray as _ray

        sref = _ray.put(strips)

        def apply(batch: pa.Table) -> pa.Table:
            import ray as _ray2

            dd = _ray2.get(sref)
            items = []
            for info, arr in iter_tiles(batch, grid, dtype=np.float32):
                win, br, bc = window_from_broadcast(info, arr, dd)
                items.append(
                    (info.tile_row, info.tile_col, info.gr0, info.gc0,
                     info.h, info.w, win, br, bc)
                )
            return intensity_rows(items)

        inter = (
            ts.ds.map_batches(apply, batch_format="pyarrow")
            .materialize()  # two-phase stretch: bounds first, then rescale
        )
    else:

        def emit(batch: pa.Table) -> pa.Table:
            return emit_halo_frags(batch, grid)

        def build(g: pa.Table) -> pa.Table:
            # a body-less group (strips aimed at a missing tile of a sparse
            # set) produces nothing
            asm = assemble_window(g)
            if asm is None:
                return _INTER_SCHEMA.empty_table()
            t_tr, t_tc, gr0, gc0, h, w, win, br, bc = asm
            return intensity_rows([(t_tr, t_tc, gr0, gc0, h, w, win, br, bc)])

        # at-scale fallback (strips over budget): bucket-file exchange —
        # same bit-identical windows, no sort barrier (stages/exchange.py)
        from .exchange import fragment_exchange

        frags = ts.ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
        inter = (
            fragment_exchange(frags, build, key="tkey")
            .materialize()  # two-phase stretch: bounds first, then rescale
        )
    from ray.data.aggregate import Max, Min

    mm = inter.map_batches(
        lambda t: t.select(["imin", "imax"]), batch_format="pyarrow"
    ).aggregate(Min("imin", alias_name="imin"), Max("imax", alias_name="imax"))
    imin, imax = float(mm["imin"]), float(mm["imax"])
    stretch = (imax - imin) > 1e-6

    def finish(t: pa.Table) -> pa.Table:
        ids, bufs, hs, ws, caps, hashes = [], [], [], [], [], []
        for i in range(t.num_rows):
            h, w = int(t["h"][i].as_py()), int(t["w"][i].as_py())
            inten = np.frombuffer(t["payload"][i].as_py(), dtype=np.float64).reshape(h, w)
            if stretch:
                inten = (inten - imin) / (imax - imin)
            inten = np.clip(inten, 0.0, 1.0)
            buf = encode(inten, "raw-f32")
            truth = decode(buf, h, w, "raw-f32")
            img = t["image_id"][i].as_py()
            ids.append(img)
            bufs.append(buf)
            hs.append(h)
            ws.append(w)
            caps.append(f"hillshade {img} az={azdeg} alt={altdeg} crs={grid.crs}")
            hashes.append(phash64(truth))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(bufs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(["raw-f32"] * t.num_rows, pa.string()),
                "caption": pa.array(caps, pa.string()),
                "phash": pa.array(hashes, pa.int64()),
                "tile_row": t["tile_row"],
                "tile_col": t["tile_col"],
                "gr0": t["gr0"],
                "gc0": t["gc0"],
                "cell": t["cell"],
            }
        )

    return TileSet(ds=inter.map_batches(finish, batch_format="pyarrow"), grid=grid)
