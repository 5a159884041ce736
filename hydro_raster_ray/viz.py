"""Small-mosaic PNG dump — the one cheap slice of the reference's
visualization family (SURVEY.md §2.9) that belongs in a headless engine.

``grid_show.mapshow`` (``grid_show.py:33-81``) renders a Raster with
matplotlib; the engine counterpart is a debugging artifact: assemble a
SMALL mosaic driver-side and write an 8-bit grayscale PNG (NaN cells
transparent), using only numpy + stdlib ``zlib``/``struct`` — no imaging
library exists in this environment. Guarded by a pixel budget: this is a
debug tool for small grids, not a distributed sink (big mosaics belong in
Parquet via ``write_tiles``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["array_to_png", "png_dump"]


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def array_to_png(arr: np.ndarray, vmin: float | None = None,
                 vmax: float | None = None) -> bytes:
    """8-bit RGBA PNG bytes of a 2-D float array: linear grayscale ramp
    over [vmin, vmax] (defaults to the finite range), NaN → transparent.
    Row 0 renders at the top, matching the grid's north-up convention."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("array_to_png expects a 2-D array")
    m = np.isfinite(a)
    # explicit bounds (including 0.0) are honored; defaults come from the
    # finite range, falling back to [0, 1] for an all-NaN grid
    if vmin is not None:
        lo = float(vmin)
    else:
        lo = float(a[m].min()) if m.any() else 0.0
    if vmax is not None:
        hi = float(vmax)
    else:
        hi = float(a[m].max()) if m.any() else 1.0
    span = hi - lo if hi > lo else 1.0
    g = np.zeros(a.shape, np.uint8)
    g[m] = np.clip((a[m] - lo) / span * 255.0, 0, 255).astype(np.uint8)
    h, w = a.shape
    rgba = np.empty((h, w, 4), np.uint8)
    rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = g
    rgba[..., 3] = np.where(m, 255, 0)
    # filter byte 0 per scanline, vectorized insert
    buf = np.zeros((h, 1 + w * 4), np.uint8)
    buf[:, 1:] = rgba.reshape(h, w * 4)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # 8-bit RGBA
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(buf.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def png_dump(ts, path: str, vmin: float | None = None, vmax: float | None = None,
             max_px: int = 16_000_000) -> str:
    """Assemble a small TileSet driver-side and write it as a PNG. Raises
    if the grid exceeds ``max_px`` — resample first
    (``grid_resample_nearest``) rather than materializing a large mosaic
    on the driver."""
    from .sources.tiles import to_array

    g = ts.grid
    if g.nrows * g.ncols > max_px:
        raise ValueError(
            f"png_dump: {g.nrows}x{g.ncols} exceeds max_px={max_px}; "
            "downsample first (grid_resample_nearest) — the PNG dump is a "
            "driver-side debug artifact, not a distributed sink"
        )
    png = array_to_png(to_array(ts), vmin=vmin, vmax=vmax)
    with open(path, "wb") as f:
        f.write(png)
    return path
