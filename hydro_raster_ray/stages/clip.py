"""Rectangle and polygon clip operators.

``rect_clip`` is the engine's ``Raster.rect_clip`` (``Raster.py:185-233``):
a pure metadata predicate on the derived georef columns (tiles outside the
snapped window are dropped WITHOUT decoding their payload) plus a per-tile
trim for edge tiles. At 100 TB this means a windowed read touches only the
window's tiles — the analog of the reference's windowed GTiff read
(``spatial_analysis.py:187-204``) expressed as predicate pushdown.

``polygon_clip`` composes it with a rasterized mask (``Raster.clip``,
``Raster.py:235-275``: cells outside the polygon → NaN, extent cropped to the
polygon bbox; rasterio ``crop=True`` behavior).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom import points_in_polygon, polygon_bbox
from ..grid import snap_window
from ..sources.tiles import TileSet
from .decode import iter_tiles, rows_to_table

__all__ = ["rect_clip", "polygon_clip", "filter_tiles_rc"]


def filter_tiles_rc(ts: TileSet, r0: int, r1: int, c0: int, c1: int) -> TileSet:
    """Keep tiles intersecting global pixel rows [r0, r1) × cols [c0, c1).
    Vectorized Arrow predicate on metadata columns only — no decode."""

    def pred(batch: pa.Table) -> pa.Table:
        gr0 = batch["gr0"]
        gc0 = batch["gc0"]
        gr1 = pc.add(gr0, batch["h"])
        gc1 = pc.add(gc0, batch["w"])
        keep = pc.and_(
            pc.and_(pc.less(gr0, r1), pc.greater(gr1, r0)),
            pc.and_(pc.less(gc0, c1), pc.greater(gc1, c0)),
        )
        return batch.filter(keep)

    return TileSet(ds=ts.ds.map_batches(pred, batch_format="pyarrow", batch_size=None), grid=ts.grid)


def rect_clip(ts: TileSet, clip_extent) -> TileSet:
    """Clip the mosaic to a rectangle (reference centre-snap semantics).

    Interior tiles pass through with their payload bytes untouched (zero
    decode/encode); only edge tiles are decoded, sliced and re-encoded. The
    output TileSet's grid is the snapped clipped header; tile gr0/gc0 are
    rebased to it.
    """
    r0, r1, c0, c1, new_spec = snap_window(ts.grid, clip_extent)
    grid = ts.grid

    def clip_batch(batch: pa.Table) -> pa.Table:
        gr0 = batch["gr0"].to_numpy(zero_copy_only=False)
        gc0 = batch["gc0"].to_numpy(zero_copy_only=False)
        h = batch["h"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        inter = (gr0 < r1) & (gr0 + h > r0) & (gc0 < c1) & (gc0 + w > c0)
        batch = batch.filter(pa.array(inter))
        if batch.num_rows == 0:
            return rows_to_table([]).slice(0, 0)
        gr0 = gr0[inter]
        gc0 = gc0[inter]
        h = h[inter]
        w = w[inter]
        interior = (gr0 >= r0) & (gr0 + h <= r1) & (gc0 >= c0) & (gc0 + w <= c1)

        rows = []
        # edge tiles: decode → slice → re-encode (f32 planes: value-
        # preserving by codec contract, raw-f32 decodes zero-copy)
        edge_batch = batch.filter(pa.array(~interior))
        for info, arr in iter_tiles(edge_batch, grid, dtype=np.float32):
            tr0 = max(r0 - info.gr0, 0)
            tr1 = min(r1 - info.gr0, info.h)
            tc0 = max(c0 - info.gc0, 0)
            tc1 = min(c1 - info.gc0, info.w)
            trimmed = arr[tr0:tr1, tc0:tc1]
            info2 = dataclasses.replace(
                info,
                h=trimmed.shape[0],
                w=trimmed.shape[1],
                gr0=info.gr0 + tr0 - r0,
                gc0=info.gc0 + tc0 - c0,
            )
            rows.append((info2, trimmed))
        edge_table = rows_to_table(rows, lossless=True) if rows else None

        # interior tiles: metadata-only rebase, bytes pass through zero-copy
        int_batch = batch.filter(pa.array(interior))
        if int_batch.num_rows:
            new_gr0 = pa.array(
                int_batch["gr0"].to_numpy(zero_copy_only=False) - r0, pa.int32()
            )
            new_gc0 = pa.array(
                int_batch["gc0"].to_numpy(zero_copy_only=False) - c0, pa.int32()
            )
            idx_gr0 = int_batch.schema.get_field_index("gr0")
            idx_gc0 = int_batch.schema.get_field_index("gc0")
            int_batch = int_batch.set_column(idx_gr0, "gr0", new_gr0)
            int_batch = int_batch.set_column(idx_gc0, "gc0", new_gc0)
        if edge_table is not None and int_batch.num_rows:
            return pa.concat_tables(
                [int_batch.select(edge_table.column_names), edge_table]
            )
        if edge_table is not None:
            return edge_table
        return int_batch

    return TileSet(
        ds=ts.ds.map_batches(clip_batch, batch_format="pyarrow", batch_size=None), grid=new_spec
    )


def polygon_clip(ts: TileSet, rings, drop_empty: bool = True) -> TileSet:
    """``Raster.clip`` semantics: rect-clip to the polygon bbox, then NaN out
    cells whose centre is outside every ring. ``drop_empty`` additionally
    drops tiles left with zero valid cells (the ``crop=True`` streamlining:
    downstream stages never see all-NaN boundary tiles)."""
    bbox = polygon_bbox(rings)
    clipped = rect_clip(ts, (bbox[0], bbox[1], bbox[2], bbox[3]))
    grid = clipped.grid
    rings_np = [np.asarray(r, dtype=np.float64) for r in rings]

    def mask_batch(batch: pa.Table) -> pa.Table:
        rows = []
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            X, Y = info.cell_centres()
            inside = np.zeros(X.size, dtype=bool)
            for ring in rings_np:
                inside |= points_in_polygon(X.ravel(), Y.ravel(), ring)
            out = arr.copy()
            out.ravel()[~inside] = np.nan
            if drop_empty and not np.isfinite(out).any():
                continue
            rows.append((info, out))
        return rows_to_table(rows, lossless=True) if rows else rows_to_table([]).slice(0, 0)

    return TileSet(
        ds=clipped.ds.map_batches(mask_batch, batch_format="pyarrow", batch_size=None), grid=grid
    )
