"""Bounded Chebyshev distance transform as an iterated min-plus stencil.

"Distance to the nearest source cell" — the proximity raster every
hydro/geospatial stack ships (distance-to-stream, distance-to-coast,
buffer construction; the reference's domain computes it next to the D8
family of ``spatial_analysis.py``) and the image-side chamfer/feature
distance map. Source cells are ``z > threshold``; output is the
8-connected (Chebyshev) cell distance, EXACT up to ``iters`` and +inf
beyond ("unreached at this sweep budget") — the documented cap that
makes the operator a fixed number of halo exchanges instead of a
data-dependent global iteration.

Algorithm: the textbook parallel min-plus relaxation. Seed
``d = 0`` on sources, ``+inf`` elsewhere (NaN nodata cells are excluded
throughout: not sources, never assigned, paths may not cross them —
exactly the relation a SQL reproduction gets by joining only non-NULL
pixels). Each sweep is one 1-px-halo map pass (``_terrain`` on the
shared machinery of ``stages/halo.py``, corners included):

    d'(c) = min(d(c), min over valid 8-neighbors n of d(n) + 1)

After k sweeps every cell within Chebyshev distance k of a source holds
its exact distance (induction: a length-k min path gains one step per
sweep). Distances are small integers in float planes — EXACT under any
tiling, sweep scheduling, and the f32 round-trip; no rounding epsilon
anywhere, which is what lets the driver oracle reproduce the transform
independently in SQL as ``iters`` chained 3×3 self-joins.

Scale: each sweep's input corpus is checkpointed
(``Dataset.materialize()``) because the halo collection and the window
map both consume it — the standard multi-sweep stencil trade (see
``stages/morph.py``); intermediates spill via the object store. Cost is
``iters`` halo exchanges over one corpus width each — at 10¹² tiles
pick ``iters`` to the proximity radius the product needs, or run the
transform on a coarsened pyramid level first and refine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tiles import TileSet
from .decode import iter_tiles, rows_to_table
from .terrain import _Meta, _terrain

__all__ = ["distance_transform"]


def distance_transform(
    ts: TileSet,
    threshold: float = 50.0,
    iters: int = 4,
    shuffle_blocks: int | None = None,
    halo_broadcast_budget: int = 256 << 20,
) -> TileSet:
    """Distance (cells, Chebyshev) to the nearest ``z > threshold`` cell,
    exact up to ``iters``, +inf beyond, NaN on nodata. Witness:
    ``oracle.distance_transform`` (bit-exact, pure integer values)."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    grid = ts.grid

    def seed(batch: pa.Table) -> pa.Table:
        rows = []
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            d = np.where(arr.astype(np.float64) > threshold, 0.0, np.inf)
            d[np.isnan(arr)] = np.nan
            meta = _Meta(
                info.image_id, info.tile_row, info.tile_col,
                info.gr0, info.gc0, info.h, info.w, "distance seed",
            )
            rows.append((meta, d))
        return rows_to_table(rows, lossless=True) if rows else rows_to_table([])

    def sweep(win: np.ndarray) -> np.ndarray:
        a = win.astype(np.float64)
        h, w = a.shape
        p = np.full((h + 2, w + 2), np.nan)
        p[1:-1, 1:-1] = a
        invalid = np.isnan(a)
        best = a.copy()
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                if dr == 1 and dc == 1:
                    continue
                best = np.fmin(best, p[dr : dr + h, dc : dc + w] + 1.0)
        best[invalid] = np.nan
        return best

    out = TileSet(
        ds=ts.ds.map_batches(seed, batch_format="pyarrow", batch_size=None),
        grid=grid,
    )
    for k in range(iters):
        out = TileSet(ds=out.ds.materialize(), grid=grid)
        out = _terrain(
            out, sweep, f"distance sweep {k + 1}/{iters}", shuffle_blocks,
            halo_broadcast_budget, corners=True,
        )
    return out
