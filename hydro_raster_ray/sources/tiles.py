"""Tiles-table source/sink: the engine's analog of ``Raster.__init__`` I/O.

The physical input is a Lance-shaped Parquet table with exactly the
``input_hint`` schema (``image_id, bytes, w, h, fmt, caption, phash``); the
Lance source itself is a drop-in behind ``read_tiles`` (pylance is not
installable in this sandbox — SURVEY.md env facts).

``read_tiles`` mirrors the reference's load-time checks
(``Raster.py:52-130``): a vectorized schema/payload-length validation (the
analog of the array/header shape consistency check at ``Raster.py:112-114``)
and derivation of the per-tile georef columns (``tile_row, tile_col, gr0,
gc0, cell``) from ``image_id`` — the reference's 6-key header sharded per
tile. NODATA→NaN happens inside the decode of each operator, not here, so
interior tiles that an operator never touches are never decoded.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..codecs import payload_nbytes
from ..grid import GridSpec, TileScheme, morton_encode

__all__ = ["TileSet", "read_tiles", "from_arrow_tiles", "write_tiles", "to_array"]

INPUT_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
# engine working columns appended by the validator (global pixel origin of
# the tile's top-left corner + Morton partition key)
META_COLUMNS = ["tile_row", "tile_col", "gr0", "gc0", "cell"]


@dataclasses.dataclass
class TileSet:
    """A tiles Dataset plus the global grid it shards.

    ``ds`` carries INPUT_COLUMNS + META_COLUMNS; ``grid`` is the mosaic's
    6-key header. Operators take and return TileSets; the Dataset stays lazy
    throughout (streaming execution with backpressure).
    """

    ds: "ray.data.Dataset"
    grid: GridSpec

    def count(self) -> int:
        return self.ds.count()


def _derive_meta(batch: pa.Table, scheme: TileScheme, validate: bool) -> pa.Table:
    ids = batch["image_id"]
    # image_id = f"t{tr:04d}_{tc:04d}" — %04d widens past 9999, so parse by
    # splitting on "_" (vectorized), not fixed slices (parse_tile_id parity)
    parts = pc.split_pattern(
        pc.utf8_slice_codeunits(ids, 1, 1 << 30), "_"
    )
    tr = pc.list_element(parts, 0).cast(pa.int32())
    tc = pc.list_element(parts, 1).cast(pa.int32())
    tr_np = tr.to_numpy(zero_copy_only=False)
    tc_np = tc.to_numpy(zero_copy_only=False)
    h = batch["h"].to_numpy(zero_copy_only=False)
    w = batch["w"].to_numpy(zero_copy_only=False)
    if validate:
        fmts = batch["fmt"].to_numpy(zero_copy_only=False)
        lengths = pc.binary_length(batch["bytes"]).to_numpy(zero_copy_only=False)
        # vectorized payload-length contract per fmt (Raster.py:112-114 analog)
        expected = np.empty(len(h), dtype=np.int64)
        for fmt in np.unique(fmts):
            m = fmts == fmt
            # payload_nbytes is affine in h*w: probe once at (1,1) and (2,1)
            base = payload_nbytes(str(fmt), 1, 1)
            if base < 0:  # compressed fmt, content-dependent length — the
                expected[m] = lengths[m]  # container's own CRCs validate it
                continue
            per = payload_nbytes(str(fmt), 2, 1) - base
            expected[m] = base + per * (h[m] * w[m] - 1)
        bad = np.nonzero(lengths != expected)[0]
        if bad.size:
            i = int(bad[0])
            raise ValueError(
                f"payload length mismatch for {ids[i].as_py()}: "
                f"got {lengths[i]}, expected {expected[i]}"
            )
        oob = (tr_np >= scheme.n_tile_rows) | (tc_np >= scheme.n_tile_cols)
        if oob.any():
            i = int(np.nonzero(oob)[0][0])
            raise ValueError(f"tile {ids[i].as_py()} outside the {scheme} grid")
    gr0 = tr_np.astype(np.int64) * scheme.tile_h
    gc0 = tc_np.astype(np.int64) * scheme.tile_w
    cell = morton_encode(tr_np, tc_np).astype(np.int64)
    out = batch
    for name, arr in (
        ("tile_row", pa.array(tr_np, pa.int32())),
        ("tile_col", pa.array(tc_np, pa.int32())),
        ("gr0", pa.array(gr0.astype(np.int32), pa.int32())),
        ("gc0", pa.array(gc0.astype(np.int32), pa.int32())),
        ("cell", pa.array(cell, pa.int64())),
    ):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, arr)
    return out


def read_tiles(
    path,
    scheme: TileScheme,
    columns: list[str] | None = None,
    validate: bool = True,
    **read_kwargs,
) -> TileSet:
    """``read_parquet`` + vectorized validation + georef derivation.

    ``columns`` prunes at the read (never load ``bytes`` for metadata-only
    pipelines). Returns a lazy TileSet.
    """
    if columns is not None:
        cols = list(dict.fromkeys(["image_id", *columns]))
        validate = validate and "bytes" in cols and "fmt" in cols
    else:
        cols = None
    ds = ray.data.read_parquet(path, columns=cols, **read_kwargs)
    ds = ds.map_batches(
        lambda b: _derive_meta(b, scheme, validate),
        batch_format="pyarrow",
        batch_size=None,
    )
    return TileSet(ds=ds, grid=scheme.grid)


def from_arrow_tiles(table: pa.Table, scheme: TileScheme, validate: bool = True) -> TileSet:
    """Test/ingest constructor: in-memory Arrow tiles → TileSet."""
    ds = ray.data.from_arrow(table)
    ds = ds.map_batches(
        lambda b: _derive_meta(b, scheme, validate),
        batch_format="pyarrow",
        batch_size=None,
    )
    return TileSet(ds=ds, grid=scheme.grid)


def write_tiles(ts: TileSet, path: str, **write_kwargs) -> None:
    """Sink: project back to the exact ``input_hint`` schema and write
    partitioned Parquet (a directory of part files — resumable layout)."""
    ts.ds.select_columns(INPUT_COLUMNS).write_parquet(path, **write_kwargs)


def to_array(ts: TileSet) -> np.ndarray:
    """Assemble the full mosaic on the driver — TEST/DEBUG ONLY (this is the
    reference's whole-array materialization, deliberately not part of any
    pipeline). Decodes every tile."""
    from ..codecs import decode

    out = np.full(ts.grid.shape, np.nan)
    for batch in ts.ds.iter_batches(batch_format="pyarrow", batch_size=256):
        for i in range(batch.num_rows):
            h = batch["h"][i].as_py()
            w = batch["w"][i].as_py()
            gr0 = batch["gr0"][i].as_py()
            gc0 = batch["gc0"][i].as_py()
            z = decode(batch["bytes"][i].as_py(), h, w, batch["fmt"][i].as_py())
            out[gr0 : gr0 + h, gc0 : gc0 + w] = z
    return out
