"""Polyline operators: the ``line2sub`` cell walk + value extraction.

``line_cells`` reimplements ``Raster.line2sub`` (``Raster.py:340-366``)
exactly (per-segment linspace walk, trimmed endpoints, bounds filter) on the
GLOBAL grid — the walk itself is tiny driver-side math; the heavy part is
fetching the traversed cells' values from the distributed mosaic, done as a
broadcast semi-join: the cell set is broadcast, tiles filter/extract only
their own members. Returns (gr, gc, x, y, z) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geom import line2sub_walk
from ..grid import map2sub, sub2map
from ..sources.tiles import TileSet
from .decode import iter_tiles

__all__ = ["line_cells"]


def line_cells(ts: TileSet, line_coords) -> "ray.data.Dataset":
    """Cells traversed by a polyline (map coords), with their pixel values."""
    grid = ts.grid
    coords = np.asarray(line_coords, dtype=np.float64)
    vr, vc = map2sub(coords[:, 0], coords[:, 1], grid)
    rr, cc = line2sub_walk(vr, vc, grid.nrows, grid.ncols)
    # dedupe preserving first-traversal order is NOT reference semantics —
    # the reference returns duplicates from the walk; keep them, but give
    # each an ordinal so downstream output is deterministic
    want = ray.put((rr.astype(np.int64), cc.astype(np.int64)))

    def extract(batch: pa.Table) -> pa.Table:
        trr, tcc = ray.get(want)
        out_r, out_c, out_z, out_ord = [], [], [], []
        for info, arr in iter_tiles(batch, grid):
            sel = (
                (trr >= info.gr0)
                & (trr < info.gr0 + info.h)
                & (tcc >= info.gc0)
                & (tcc < info.gc0 + info.w)
            )
            if not sel.any():
                continue
            kr = trr[sel]
            kc = tcc[sel]
            out_r.append(kr)
            out_c.append(kc)
            out_z.append(arr[kr - info.gr0, kc - info.gc0])
            out_ord.append(np.nonzero(sel)[0])
        if not out_r:
            return pa.table(
                {
                    "ordinal": pa.array([], pa.int64()),
                    "gr": pa.array([], pa.int64()),
                    "gc": pa.array([], pa.int64()),
                    "x": pa.array([], pa.float64()),
                    "y": pa.array([], pa.float64()),
                    "z": pa.array([], pa.float64()),
                }
            )
        kr = np.concatenate(out_r)
        kc = np.concatenate(out_c)
        z = np.concatenate(out_z)
        X, Y = sub2map(kr, kc, grid)
        return pa.table(
            {
                "ordinal": pa.array(np.concatenate(out_ord), pa.int64()),
                "gr": pa.array(kr),
                "gc": pa.array(kc),
                "x": pa.array(X),
                "y": pa.array(Y),
                "z": pa.array(z, mask=np.isnan(z)),
            }
        )

    return ts.ds.map_batches(extract, batch_format="pyarrow", batch_size=None)
