"""ESRI ASCII Grid I/O — byte-parity with the reference serializers.

``read_asc`` mirrors ``arcgridread`` (``spatial_analysis.py:98-126``): 6-row
header parse (gzip-aware, lowercase keys except NODATA_value —
``spatial_analysis.py:38-96``), ``np.loadtxt`` float64 body, NODATA→NaN,
``.prj`` WKT sidecar. ``write_asc`` mirrors ``arcgridwrite``
(``spatial_analysis.py:128-172``) byte-for-byte: 4-space header separator,
``%g`` formatting, NaN→sentinel, optional gzip (auto ``.gz`` suffix).

ASC is a whole-grid text format, so these are small-grid ingest/golden-test
utilities: ``read_asc`` feeds ``from_numpy`` (array → tiles table);
``write_asc`` assembles via the driver-side ``to_array`` and is therefore
only for test-scale mosaics (the Parquet tiles sink is the scale path).
"""

from __future__ import annotations

import gzip
import io
import os

import numpy as np
import pyarrow as pa

from .. import codecs
from ..grid import GridSpec, TileScheme, tile_id
from .tiles import TileSet, from_arrow_tiles, to_array

__all__ = ["read_asc_header", "read_asc", "write_asc", "from_numpy"]


def read_asc_header(file_name: str, header_rows: int = 6) -> dict:
    """``arc_header_read`` parity: keys lowercased unless len >= 12 (which
    keeps 'NODATA_value' as-is — ``spatial_analysis.py:70-72``)."""
    opener = gzip.open if file_name.endswith(".gz") else open
    header: dict = {}
    with opener(file_name, "rt") as fh:
        for i, line in enumerate(fh):
            if i >= header_rows:
                break
            key, value = line.split(" ", 1)
            if len(key) < 12:
                key = key.lower()
            header[key] = float(value)
    header["ncols"] = int(header["ncols"])
    header["nrows"] = int(header["nrows"])
    return header


def read_asc(file_name: str, header_rows: int = 6, return_nan: bool = True):
    """``arcgridread`` parity. Returns (array, GridSpec, wkt|None)."""
    header = read_asc_header(file_name, header_rows)
    array = np.loadtxt(file_name, skiprows=header_rows, dtype="float64", ndmin=2)
    if return_nan and "NODATA_value" in header:
        array[array == header["NODATA_value"]] = np.nan
    prj = file_name[:-4] + ".prj"
    wkt = None
    if os.path.isfile(prj):
        with open(prj) as f:
            wkt = f.read()
    return array, GridSpec.from_header(header), wkt


def write_asc(
    ts_or_array, spec_or_path, path: str | None = None, compression: bool = False
) -> str:
    """``arcgridwrite`` parity (byte-identical text). Accepts either
    (array, spec, path) or (TileSet, path)."""
    if isinstance(ts_or_array, TileSet):
        array = to_array(ts_or_array)
        spec = ts_or_array.grid
        path = spec_or_path
    else:
        array = np.asarray(ts_or_array, dtype=np.float64)
        spec = spec_or_path
    assert path is not None
    array = array + 0
    if path.endswith(".gz"):
        compression = True
    if compression and not path.endswith(".gz"):
        path = path + ".gz"
    fh = gzip.open(path, "wb") if compression else open(path, "wb")
    try:
        fh.write(b"ncols    %d\n" % spec.ncols)
        fh.write(b"nrows    %d\n" % spec.nrows)
        fh.write(b"xllcorner    %g\n" % spec.xllcorner)
        fh.write(b"yllcorner    %g\n" % spec.yllcorner)
        fh.write(b"cellsize    %g\n" % spec.cellsize)
        fh.write(b"NODATA_value    %g\n" % spec.nodata)
        array[np.isnan(array)] = spec.nodata
        np.savetxt(fh, array, fmt="%g", delimiter=" ")
    finally:
        fh.close()
    return path


def from_numpy(
    array: np.ndarray,
    spec: GridSpec,
    tile_h: int = 64,
    tile_w: int = 64,
    fmt: str = "raw-f32",
) -> TileSet:
    """Array + header → tiles TileSet (the ``from_tif``/test-constructor
    analog, ``Raster.py:863-870``). Small-grid ingest: tiles are built on
    the driver; use the Parquet path for big data."""
    scheme = TileScheme(
        grid=spec,
        tile_h=tile_h,
        tile_w=tile_w,
    )
    ids, bufs, ws, hs, fmts, caps, hashes = [], [], [], [], [], [], []
    for tr in range(scheme.n_tile_rows):
        for tc in range(scheme.n_tile_cols):
            r0, c0 = scheme.tile_origin_rc(tr, tc)
            h, w = scheme.tile_shape(tr, tc)
            z = np.asarray(array[r0 : r0 + h, c0 : c0 + w], dtype=np.float64)
            buf = codecs.encode(z, fmt)
            truth = codecs.decode(buf, h, w, fmt)
            img = tile_id(tr, tc)
            ids.append(img)
            bufs.append(buf)
            ws.append(w)
            hs.append(h)
            fmts.append(fmt)
            caps.append(
                f"DEM tile {img} cellsize={spec.cellsize} crs={spec.crs}"
            )
            hashes.append(codecs.phash64(truth))
    table = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
        }
    )
    return from_arrow_tiles(table, scheme)
