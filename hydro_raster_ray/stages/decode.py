"""Decode/encode plumbing + the per-tile UDF hook (SURVEY.md §2.10).

The reference's extension surface is direct numpy math on ``Raster.array``
(tutorial cells 8/12, ``README.md:60-63``). The engine formalizes it as
``map_tiles(ts, fn)``: ``fn(array, info) -> array`` runs inside
``map_batches`` over Arrow blocks with all decode / encode / NODATA / phash
plumbing handled here. Pass a callable CLASS to get an actor pool (state
built once per actor in ``__init__``); a plain function runs as stateless
tasks. Every built-in per-tile operator goes through this hook.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import pyarrow as pa

from ..codecs import decode, encode, phash64
from ..grid import GridSpec
from ..sources.tiles import TileSet

__all__ = [
    "TileInfo",
    "iter_tiles",
    "iter_tile_meta",
    "rows_to_table",
    "map_tiles",
    "transcode",
]


@dataclasses.dataclass(frozen=True)
class TileInfo:
    """Per-tile georeference handed to tile UDFs — the sharded header."""

    image_id: str
    h: int
    w: int
    fmt: str
    caption: str
    gr0: int  # global pixel row of the tile's top (north) edge
    gc0: int
    tile_row: int
    tile_col: int
    cell: int
    grid: GridSpec  # the GLOBAL mosaic header

    @property
    def spec(self) -> GridSpec:
        """This tile's own 6-key header."""
        g = self.grid
        top = g.yllcorner + g.nrows * g.cellsize - self.gr0 * g.cellsize
        return GridSpec(
            ncols=self.w,
            nrows=self.h,
            xllcorner=g.xllcorner + self.gc0 * g.cellsize,
            yllcorner=top - self.h * g.cellsize,
            cellsize=g.cellsize,
            nodata=g.nodata,
            crs=g.crs,
        )

    def cell_centres(self):
        """Meshgrid of this tile's cell-centre (X, Y) — lazy per-tile analog
        of ``Raster.to_points`` (``Raster.py:553-567``)."""
        g = self.grid
        rows = np.arange(self.gr0, self.gr0 + self.h)
        cols = np.arange(self.gc0, self.gc0 + self.w)
        X = g.xllcorner + (cols + 0.5) * g.cellsize
        top = g.yllcorner + g.nrows * g.cellsize
        Y = top - (rows + 0.5) * g.cellsize
        return np.meshgrid(X, Y)


def _payload_views(batch: pa.Table, column: str = "bytes"):
    """Zero-copy memoryview per row of a binary column (no per-payload
    bytes materialization — the Arrow buffer is read in place)."""
    col = batch[column]
    views: list[memoryview] = []
    for chunk in col.chunks if hasattr(col, "chunks") else [col]:
        bufs = chunk.buffers()
        # [validity, offsets, data] for (large_)binary arrays
        width = 8 if pa.types.is_large_binary(chunk.type) else 4
        offsets = np.frombuffer(
            bufs[1], dtype=np.int64 if width == 8 else np.int32
        )[chunk.offset : chunk.offset + len(chunk) + 1]
        data = memoryview(bufs[2])
        for i in range(len(chunk)):
            views.append(data[offsets[i] : offsets[i + 1]])
    return views


def iter_tile_meta(batch: pa.Table, grid: GridSpec):
    """Yield a TileInfo per row WITHOUT touching or decoding payloads —
    for operators that use only tile geometry (e.g. gauge interpolation:
    the reference's ``point_interpolate`` builds its meshgrid from the
    header alone, ``Raster.py:424``). The batch need not carry ``bytes``
    at all, so callers can prune the column at the read."""
    ids = batch["image_id"].to_pylist()
    caps = (
        batch["caption"].to_pylist()
        if "caption" in batch.column_names
        else [""] * batch.num_rows
    )
    hs = batch["h"].to_pylist()
    ws = batch["w"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    gr0s = batch["gr0"].to_pylist()
    gc0s = batch["gc0"].to_pylist()
    trs = batch["tile_row"].to_pylist()
    tcs = batch["tile_col"].to_pylist()
    cells = batch["cell"].to_pylist()
    for i in range(batch.num_rows):
        yield TileInfo(
            image_id=ids[i], h=hs[i], w=ws[i], fmt=fmts[i], caption=caps[i],
            gr0=gr0s[i], gc0=gc0s[i], tile_row=trs[i], tile_col=tcs[i],
            cell=cells[i], grid=grid,
        )


def iter_tiles(batch: pa.Table, grid: GridSpec, dtype=np.float64):
    """Yield (TileInfo, decoded float array) per row of an Arrow batch.

    ``dtype=np.float32`` is the bandwidth-lean plane representation —
    lossless by codec contract (see ``codecs.decode``), raw-f32 payloads
    decode as a zero-copy READ-ONLY view. Callers taking f32 planes must
    promote at multi-op arithmetic and use float64 reduction accumulators
    so aggregates stay bit-identical to the float64 path."""
    ids = batch["image_id"].to_pylist()
    bufs = _payload_views(batch)
    hs = batch["h"].to_pylist()
    ws = batch["w"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    caps = batch["caption"].to_pylist()
    gr0s = batch["gr0"].to_pylist()
    gc0s = batch["gc0"].to_pylist()
    trs = batch["tile_row"].to_pylist()
    tcs = batch["tile_col"].to_pylist()
    cells = batch["cell"].to_pylist()
    for i in range(batch.num_rows):
        info = TileInfo(
            image_id=ids[i],
            h=hs[i],
            w=ws[i],
            fmt=fmts[i],
            caption=caps[i],
            gr0=gr0s[i],
            gc0=gc0s[i],
            tile_row=trs[i],
            tile_col=tcs[i],
            cell=cells[i],
            grid=grid,
        )
        yield info, decode(bufs[i], info.h, info.w, info.fmt, dtype=dtype)


def rows_to_table(
    rows: list[tuple[TileInfo, np.ndarray]],
    lossless: bool = False,
    fmt: str | None = None,
) -> pa.Table:
    """Encode (info, array) rows back to the working tiles schema.

    Re-encodes with the tile's own ``fmt`` (NaN→sentinel written back —
    ``spatial_analysis.py:169`` semantics) and recomputes ``phash`` from the
    decoded payload. ``caption`` is carried through verbatim (per-row gate).

    ``lossless=True`` switches the output fmt to ``raw-f32``: since decoded
    values are float32-precision by codec contract, this preserves pixels
    bit-exactly — required by value-preserving ops (trims, masks) whose
    outputs must equal a slice of the source. ``fmt`` overrides the output
    format explicitly (storage transcode — e.g. ``png16`` compression).
    """
    cols = {
        "image_id": [],
        "bytes": [],
        "w": [],
        "h": [],
        "fmt": [],
        "caption": [],
        "phash": [],
        "tile_row": [],
        "tile_col": [],
        "gr0": [],
        "gc0": [],
        "cell": [],
    }
    out_fmt = fmt
    for info, arr in rows:
        h, w = arr.shape
        fmt = out_fmt or ("raw-f32" if lossless else info.fmt)
        buf = encode(arr, fmt)
        truth = decode(buf, h, w, fmt)
        cols["image_id"].append(info.image_id)
        cols["bytes"].append(buf)
        cols["w"].append(w)
        cols["h"].append(h)
        cols["fmt"].append(fmt)
        cols["caption"].append(info.caption)
        cols["phash"].append(phash64(truth))
        cols["tile_row"].append(info.tile_row)
        cols["tile_col"].append(info.tile_col)
        cols["gr0"].append(info.gr0)
        cols["gc0"].append(info.gc0)
        cols["cell"].append(info.cell)
    return pa.table(
        {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "bytes": pa.array(cols["bytes"], pa.binary()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "caption": pa.array(cols["caption"], pa.string()),
            "phash": pa.array(cols["phash"], pa.int64()),
            "tile_row": pa.array(cols["tile_row"], pa.int32()),
            "tile_col": pa.array(cols["tile_col"], pa.int32()),
            "gr0": pa.array(cols["gr0"], pa.int32()),
            "gc0": pa.array(cols["gc0"], pa.int32()),
            "cell": pa.array(cols["cell"], pa.int64()),
        }
    )


def map_tiles(
    ts: TileSet,
    fn: Callable[[np.ndarray, TileInfo], np.ndarray] | type,
    *,
    batch_size: int | None = 64,
    concurrency=None,
    num_cpus: float = 1,
    fn_constructor_kwargs: dict | None = None,
    lossless: bool = False,
    needs_pixels: bool = True,
) -> TileSet:
    """Per-tile UDF over the mosaic — the single plugin API.

    ``fn`` may be:
      * a function ``(array, info) -> array`` → stateless ``map_batches`` tasks;
      * a class whose instances are ``(array, info) -> array`` callables →
        actor pool (``__init__`` once per actor; size with ``concurrency``).
        NEVER size ``concurrency`` to the full CPU count: the pool reserves
        ``concurrency × num_cpus`` CPUs and a pool holding every CPU starves
        the upstream read stage (observed deadlock, not just slowdown).

    The returned array may have a different shape (e.g. trims); georef stays
    that of the input tile unless the UDF also returns a new info via the
    ``(array, info)`` tuple form. ``lossless=True`` stores results as
    ``raw-f32`` (exact) instead of re-encoding with each tile's own fmt —
    use it when the UDF's output values must survive bit-exactly.

    ``needs_pixels=False`` skips payload decode entirely and calls the UDF
    as ``fn(None, info)`` — for generators that only use tile geometry
    (gauge interpolation). Combine with a ``bytes``-pruned read so the
    payloads never leave storage.
    """
    grid = ts.grid

    def _iter(batch):
        if needs_pixels:
            yield from iter_tiles(batch, grid)
        else:
            for info in iter_tile_meta(batch, grid):
                yield info, None

    def apply(udf, batch: pa.Table) -> pa.Table:
        rows = []
        for info, arr in _iter(batch):
            out = udf(arr, info)
            if isinstance(out, tuple):
                arr2, info2 = out
            else:
                arr2, info2 = out, info
            if arr2 is None:
                continue  # UDF may drop tiles
            rows.append((info2, np.asarray(arr2, dtype=np.float64)))
        if not rows:
            return rows_to_table([]).slice(0, 0)
        return rows_to_table(rows, lossless=lossless)

    if isinstance(fn, type):
        class _Actor:
            def __init__(self, **kwargs):
                self.udf = fn(**kwargs)

            def __call__(self, batch: pa.Table) -> pa.Table:
                return apply(self.udf, batch)

        from ..runtime import auto_pool

        ds = ts.ds.map_batches(
            _Actor,
            batch_format="pyarrow",
            batch_size=batch_size,
            # capped at cpus-2: a pool holding every CPU deadlocks the
            # upstream read (runtime.auto_pool)
            concurrency=auto_pool(concurrency or 4),
            num_cpus=num_cpus,
            fn_constructor_kwargs=fn_constructor_kwargs or {},
        )
    else:
        ds = ts.ds.map_batches(
            lambda b: apply(fn, b),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return TileSet(ds=ds, grid=grid)


def to_int_tiles(ts: TileSet) -> TileSet:
    """``Raster.to_int`` (``Raster.py:152-165``): round cell values to
    integers (NaN holes preserved; the NaN→sentinel write-back happens at
    encode, as in the reference's save path)."""
    return map_tiles(ts, lambda a, info: np.round(a), lossless=True)


def set_nodata(ts: TileSet, value: float) -> TileSet:
    """``Raster.set_nodata`` (``Raster.py:683-692``): metadata-only change of
    the NODATA sentinel — pixels are NaN-coded internally, so only the grid
    header changes."""
    import dataclasses

    return TileSet(ds=ts.ds, grid=dataclasses.replace(ts.grid, nodata=float(value)))


def transcode(
    ts: TileSet,
    fmt: str,
    *,
    batch_size: int | None = 64,
    concurrency=None,
) -> TileSet:
    """Storage-format conversion: decode every payload, re-encode as ``fmt``.

    The compression sink for cold storage: ``transcode(ts, "png16")`` wraps
    each tile's u16 quantization in DEFLATE (smooth DEM tiles shrink
    several-fold — measured ~4-8× on the fixture surface), cutting Parquet
    and object-store bytes; ``transcode(ts, "raw-f32")`` is the decompress
    direction for compute-heavy phases. Values degrade only by the target
    fmt's quantization (png16 ≡ raw-u16's grid; see ``codecs.py``). Stateless
    tasks — pure per-tile work, no shuffle, streams at any scale.
    """
    grid = ts.grid

    def conv(batch: pa.Table) -> pa.Table:
        rows = list(iter_tiles(batch, grid))
        if not rows:
            return rows_to_table([]).slice(0, 0)
        return rows_to_table(rows, fmt=fmt)

    ds = ts.ds.map_batches(
        conv,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return TileSet(ds=ds, grid=grid)
