"""Two-raster map algebra: combine aligned TileSets cell-by-cell.

The raster-calculator primitive (NDVI-style ratios, terrain-index
compositions) the single-raster stages can't express: two same-scheme
TileSets meet in a native hash join on ``image_id`` — at 10¹² tiles
NEITHER side broadcasts and no pixel leaves its tile — then one decode of
each plane, one vectorized ``fn(a, b)``, one lossless re-encode.

Scale notes: the join ships only the two payload columns plus the key;
identical partition counts on both sides come from the shared
``auto_join_partitions`` sizing; tiles pair 1:1 (same scheme), so join
output is exactly one row per tile — no fan-out.
"""

from __future__ import annotations

import dataclasses

import pyarrow as pa

from .. import codecs
from ..sources.tiles import TileSet
from .decode import iter_tiles, rows_to_table

__all__ = ["combine_tiles"]


def combine_tiles(
    ts_a: TileSet,
    ts_b: TileSet,
    fn,
    caption: str = "combine",
    num_partitions: int | None = None,
) -> TileSet:
    """Cell-wise ``fn(plane_a, plane_b) -> plane`` over two TileSets on the
    SAME scheme (one output row per image_id; raw-f32 tiles out). ``fn``
    receives float64 planes (f32-precision by codec contract) and must be
    vectorized."""
    from .cc import auto_join_partitions

    if num_partitions is None:
        num_partitions = auto_join_partitions()
    grid = ts_a.grid

    def thin(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes_b": batch["bytes"],
                "h_b": batch["h"],
                "w_b": batch["w"],
                "fmt_b": batch["fmt"],
            }
        )

    b = ts_b.ds.map_batches(thin, batch_format="pyarrow", batch_size=None)
    j = ts_a.ds.join(b, "inner", num_partitions, on=("image_id",))

    def apply(batch: pa.Table) -> pa.Table:
        bufs_b = batch["bytes_b"]
        hs_b = batch["h_b"].to_pylist()
        ws_b = batch["w_b"].to_pylist()
        fmts_b = batch["fmt_b"].to_pylist()
        rows = []
        for i, (info, arr_a) in enumerate(iter_tiles(batch, grid)):
            if (hs_b[i], ws_b[i]) != (info.h, info.w):
                raise ValueError(
                    f"tile {info.image_id}: shape mismatch "
                    f"{(info.h, info.w)} vs {(hs_b[i], ws_b[i])} — "
                    "combine_tiles requires same-scheme inputs"
                )
            arr_b = codecs.decode(
                bufs_b[i].as_py(), hs_b[i], ws_b[i], fmts_b[i]
            )
            meta = dataclasses.replace(info, caption=caption)
            rows.append((meta, fn(arr_a, arr_b)))
        if not rows:
            return rows_to_table([]).slice(0, 0)
        return rows_to_table(rows, lossless=True)

    out = j.map_batches(apply, batch_format="pyarrow")
    return TileSet(ds=out, grid=grid)
