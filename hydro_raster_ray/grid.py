"""Grid / georeference kernels.

Pure-numpy reimplementation of the coordinate math of the reference
(`hydro_raster/spatial_analysis.py`), plus the tiling scheme that shards the
reference's single in-memory grid (``Raster.array`` + 6-key header,
``Raster.py:94-116``) into a *virtual mosaic*: one row per tile of a global
grid, Lance-table shaped (see BASELINE.json ``input_hint``).

Reference semantics preserved exactly (test-visible rounding):

- ``header2extent`` — ``spatial_analysis.py:310-319``
- ``map2sub`` (header branch: cell-centre rounding via ``np.round``;
  geotransform branch: ``-0.5`` offset) — ``spatial_analysis.py:356-390``
- ``sub2map`` — ``spatial_analysis.py:392-413``
- ``shape_extent_to_header`` — ``spatial_analysis.py:339-354``
- rect-clip centre-snap math — ``Raster.py:185-233``

Everything here is deterministic and side-effect free: the distributed
operators in ``hydro_raster_ray.stages`` are thin shells around these kernels.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

__all__ = [
    "GridSpec",
    "TileScheme",
    "header2extent",
    "meta2header",
    "normalize_crs",
    "map2sub",
    "sub2map",
    "shape_extent_to_header",
    "compare_extent",
    "extent2shape_points",
    "morton_encode",
    "morton_decode",
    "tile_id",
    "parse_tile_id",
]


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """The reference's 6-key header (``Raster.py:94-98``) as a frozen dataclass.

    Row 0 is the NORTH (top) row; the georeference origin is the lower-left
    corner of the southwest cell (``spatial_analysis.py:13-15``). Cells are
    square; the map unit is meters (projected CRS).
    """

    ncols: int
    nrows: int
    xllcorner: float
    yllcorner: float
    cellsize: float
    nodata: float = -9999.0
    crs: str = "EPSG:27700"

    @property
    def extent(self) -> tuple[float, float, float, float]:
        return header2extent(self)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.nrows, self.ncols)

    def to_header(self) -> dict:
        """Render as the reference's plain header dict."""
        return {
            "ncols": self.ncols,
            "nrows": self.nrows,
            "xllcorner": self.xllcorner,
            "yllcorner": self.yllcorner,
            "cellsize": self.cellsize,
            "NODATA_value": self.nodata,
        }

    @staticmethod
    def from_header(header: dict, crs: str = "EPSG:27700") -> "GridSpec":
        return GridSpec(
            ncols=int(header["ncols"]),
            nrows=int(header["nrows"]),
            xllcorner=float(header["xllcorner"]),
            yllcorner=float(header["yllcorner"]),
            cellsize=float(header["cellsize"]),
            nodata=float(header.get("NODATA_value", -9999.0)),
            crs=crs,
        )

    def cell_centres(self, rows: np.ndarray, cols: np.ndarray):
        """Vectorized ``sub2map``."""
        return sub2map(rows, cols, self)


def _spec_of(geo) -> GridSpec:
    if isinstance(geo, GridSpec):
        return geo
    if isinstance(geo, dict):
        return GridSpec.from_header(geo)
    raise TypeError(f"expected GridSpec or header dict, got {type(geo)}")


def meta2header(meta: dict) -> GridSpec:
    """Rasterio-style ``meta`` → GridSpec (``spatial_analysis.py:321-337``):
    ``transform`` is the affine 6-tuple (a, b, c, d, e, f) with
    ``x = a·col + c``, ``y = e·row + f`` (north-up: b = d = 0, e < 0,
    square cells |a| == |e|); ``width``/``height`` in pixels."""
    t = meta["transform"]
    a, b, c, d, e, f = (float(v) for v in tuple(t)[:6])
    if b != 0.0 or d != 0.0:
        raise ValueError("rotated transforms are not grid-aligned headers; use reproject")
    if not (a > 0 and e < 0 and abs(abs(a) - abs(e)) < 1e-9):
        raise ValueError(f"expected north-up square cells, got a={a}, e={e}")
    width = int(meta["width"])
    height = int(meta["height"])
    return GridSpec(
        ncols=width,
        nrows=height,
        xllcorner=c,
        yllcorner=f + e * height,
        cellsize=a,
        nodata=float(meta.get("nodata", -9999.0) if meta.get("nodata") is not None else -9999.0),
        crs=normalize_crs(meta.get("crs", "EPSG:27700")),
    )


def normalize_crs(crs) -> str:
    """Canonical CRS string (``Raster.py:167-183`` family): int → EPSG:n;
    'epsg:n' case-normalized; WKT with an EPSG authority → EPSG:n; other
    strings pass through verbatim."""
    import re as _re

    if crs is None:
        return "EPSG:27700"
    if isinstance(crs, int):
        return f"EPSG:{crs}"
    s = str(crs).strip()
    m = _re.fullmatch(r"(?i)epsg\s*:\s*(\d+)", s)
    if m:
        return f"EPSG:{m.group(1)}"
    m = _re.search(r'AUTHORITY\[\s*"EPSG"\s*,\s*"(\d+)"\s*\]\s*\]\s*$', s)
    if m:
        return f"EPSG:{m.group(1)}"
    return s


def header2extent(geo) -> tuple[float, float, float, float]:
    """(left, right, bottom, top) cell-EDGE coords — ``spatial_analysis.py:310-319``."""
    g = _spec_of(geo)
    left = g.xllcorner
    right = g.xllcorner + g.ncols * g.cellsize
    bottom = g.yllcorner
    top = g.yllcorner + g.nrows * g.cellsize
    return (left, right, bottom, top)


def map2sub(X, Y, geo_ref):
    """Map coords → array subscripts. Both reference branches, exact rounding.

    Header/GridSpec branch (``spatial_analysis.py:375-381``): distances from
    the centre of the top-left cell, rounded with ``np.round`` (half-to-even,
    exactly as the reference's ``np.round`` call at
    ``spatial_analysis.py:384-385``).

    Geotransform branch (``spatial_analysis.py:382-387``): pass a 6-tuple
    ``(cellsize, _, x_ulcorner, _, _, y_ulcorner)`` like a GDAL transform;
    offsets by −0.5 before the same rounding.
    """
    X = np.asarray(X)
    Y = np.asarray(Y)
    scalar = X.ndim == 0 and Y.ndim == 0
    if isinstance(geo_ref, (GridSpec, dict)):
        g = _spec_of(geo_ref)
        cellsize = g.cellsize
        x0 = g.xllcorner + 0.5 * cellsize
        y0 = g.yllcorner + (g.nrows - 0.5) * cellsize
        rows = (y0 - Y) / cellsize
        cols = (X - x0) / cellsize
    else:  # geotransform sequence
        cellsize = geo_ref[0]
        x_ulcorner = geo_ref[2]
        y_ulcorner = geo_ref[5]
        cols = (X - x_ulcorner) / cellsize - 0.5
        rows = (y_ulcorner - Y) / cellsize - 0.5
    if scalar:
        # the reference uses int() (truncation) for scalars
        # (spatial_analysis.py:388-389)
        return int(rows), int(cols)
    rows = np.round(rows).astype("int64")
    cols = np.round(cols).astype("int64")
    return rows, cols


def sub2map(rows, cols, geo_ref):
    """Array subscripts → cell-CENTRE map coords — ``spatial_analysis.py:392-413``."""
    g = _spec_of(geo_ref)
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    left, _, _, top = header2extent(g)
    X = left + (cols + 0.5) * g.cellsize
    Y = top - (rows + 0.5) * g.cellsize
    return X, Y


def shape_extent_to_header(shape, extent, nan_value=-9999.0) -> GridSpec:
    """``spatial_analysis.py:339-354`` — raises when x/y cellsize differ."""
    nrows, ncols = int(shape[0]), int(shape[1])
    cellsize_x = (extent[1] - extent[0]) / ncols
    cellsize_y = (extent[3] - extent[2]) / nrows
    if cellsize_x != cellsize_y:
        raise ValueError("extent produces different cellsize in x and y")
    return GridSpec(
        ncols=ncols,
        nrows=nrows,
        xllcorner=float(extent[0]),
        yllcorner=float(extent[2]),
        cellsize=float(cellsize_x),
        nodata=float(nan_value),
    )


def compare_extent(extent0, extent1) -> int:
    """0: extent0 contains extent1; 1: extent0 inside extent1; 2: partial —
    ``spatial_analysis.py:416-441`` (without the prints)."""
    logic_all = (
        int(extent0[0] <= extent1[0])
        + int(extent0[1] >= extent1[1])
        + int(extent0[2] <= extent1[2])
        + int(extent0[3] >= extent1[3])
    )
    if logic_all == 4:
        return 0
    if logic_all == 0:
        return 1
    return 2


def extent2shape_points(extent) -> np.ndarray:
    """``spatial_analysis.py:443-451``."""
    return np.array(
        [
            [extent[0], extent[2]],
            [extent[1], extent[2]],
            [extent[1], extent[3]],
            [extent[0], extent[3]],
        ]
    )


def snap_window(spec, clip_extent):
    """Reference rect-clip snap math (``Raster.py:185-233``): clamp the
    requested window to the grid extent, snap to cell centres via
    map2sub/sub2map, return the global pixel window + the clipped header.

    Returns: (r0, r1_excl, c0, c1_excl, new_spec).
    """
    g = _spec_of(spec)
    extent = header2extent(g)
    new_extent = list(clip_extent)
    if clip_extent[0] < extent[0]:
        new_extent[0] = extent[0]
    if clip_extent[1] > extent[1]:
        new_extent[1] = extent[1]
    if clip_extent[2] < extent[2]:
        new_extent[2] = extent[2]
    if clip_extent[3] > extent[3]:
        new_extent[3] = extent[3]
    X = np.array(new_extent[0:2])
    Y = np.array(new_extent[2:4])
    cs = g.cellsize
    X_centre = np.array([X.min() + cs / 2, X.max() - cs / 2])
    Y_centre = np.array([Y.min() + cs / 2, Y.max() - cs / 2])
    rows, cols = map2sub(X_centre, Y_centre, g)
    x_centre, y_centre = sub2map(rows, cols, g)
    xllcorner = float(np.min(x_centre) - cs / 2)
    yllcorner = float(np.min(y_centre) - cs / 2)
    r0, r1 = int(rows.min()), int(rows.max()) + 1
    c0, c1 = int(cols.min()), int(cols.max()) + 1
    new_spec = GridSpec(
        ncols=c1 - c0,
        nrows=r1 - r0,
        xllcorner=xllcorner,
        yllcorner=yllcorner,
        cellsize=cs,
        nodata=g.nodata,
        crs=g.crs,
    )
    return r0, r1, c0, c1, new_spec


# ---------------------------------------------------------------------------
# Morton (Z-order) cell keys — the engine's spatial partition key. Pure numpy,
# stands in for an H3/S2 hierarchical index over tile footprints.
# ---------------------------------------------------------------------------

def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v so a bit sits at every even position."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton_encode(tile_row, tile_col) -> np.ndarray:
    """Interleave (tile_row, tile_col) → uint64 Z-order key.

    Neighboring tiles share long key prefixes ⇒ ``cell >> (2*level)`` is a
    hierarchical bucket usable as a shuffle/partition key (the H3/S2-style
    index demanded by the north rule).
    """
    r = np.asarray(tile_row, dtype=np.int64)
    c = np.asarray(tile_col, dtype=np.int64)
    return (_part1by1(r.astype(np.uint64)) << np.uint64(1)) | _part1by1(
        c.astype(np.uint64)
    )


def morton_decode(cell) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.uint64)
    row = _compact1by1(cell >> np.uint64(1)).astype(np.int64)
    col = _compact1by1(cell).astype(np.int64)
    return row, col


# ---------------------------------------------------------------------------
# Tiling scheme: the mapping between the global grid and the tiles table.
# ---------------------------------------------------------------------------

def tile_id(tile_row: int, tile_col: int) -> str:
    return f"t{tile_row:04d}_{tile_col:04d}"


def parse_tile_id(image_id: str) -> tuple[int, int]:
    # image_id = "t{tr:04d}_{tc:04d}" (FIXTURES.md §1); tolerate wider digits
    body = image_id[1:]
    tr_s, tc_s = body.split("_")
    return int(tr_s), int(tc_s)


@dataclasses.dataclass(frozen=True)
class TileScheme:
    """Sharding of a global ``GridSpec`` into HxW-pixel tiles.

    Tile (0, 0) is the NORTH-WEST tile (matching the array orientation of the
    reference: row 0 = top row). The last tile row/col may be ragged.
    """

    grid: GridSpec
    tile_h: int = 64
    tile_w: int = 64

    @property
    def n_tile_rows(self) -> int:
        return math.ceil(self.grid.nrows / self.tile_h)

    @property
    def n_tile_cols(self) -> int:
        return math.ceil(self.grid.ncols / self.tile_w)

    @property
    def n_tiles(self) -> int:
        return self.n_tile_rows * self.n_tile_cols

    def tile_shape(self, tile_row: int, tile_col: int) -> tuple[int, int]:
        h = min(self.tile_h, self.grid.nrows - tile_row * self.tile_h)
        w = min(self.tile_w, self.grid.ncols - tile_col * self.tile_w)
        return (h, w)

    def tile_origin_rc(self, tile_row: int, tile_col: int) -> tuple[int, int]:
        """Global (row, col) of the tile's top-left pixel."""
        return (tile_row * self.tile_h, tile_col * self.tile_w)

    def tile_spec(self, tile_row: int, tile_col: int) -> GridSpec:
        """The per-tile 6-key header — the reference header sharded per tile."""
        h, w = self.tile_shape(tile_row, tile_col)
        r0, c0 = self.tile_origin_rc(tile_row, tile_col)
        g = self.grid
        left = g.xllcorner + c0 * g.cellsize
        top = g.yllcorner + g.nrows * g.cellsize - r0 * g.cellsize
        return GridSpec(
            ncols=w,
            nrows=h,
            xllcorner=left,
            yllcorner=top - h * g.cellsize,
            cellsize=g.cellsize,
            nodata=g.nodata,
            crs=g.crs,
        )

    def tiles_overlapping_rc(
        self, r0: int, r1: int, c0: int, c1: int
    ) -> list[tuple[int, int]]:
        """Tile ids whose pixel ranges intersect global rows [r0, r1) × cols
        [c0, c1). Empty when the window misses the grid."""
        r0 = max(int(r0), 0)
        c0 = max(int(c0), 0)
        r1 = min(int(r1), self.grid.nrows)
        c1 = min(int(c1), self.grid.ncols)
        if r0 >= r1 or c0 >= c1:
            return []
        tr0, tr1 = r0 // self.tile_h, (r1 - 1) // self.tile_h
        tc0, tc1 = c0 // self.tile_w, (c1 - 1) // self.tile_w
        return [
            (tr, tc)
            for tr in range(tr0, tr1 + 1)
            for tc in range(tc0, tc1 + 1)
        ]

    def cell_key(self, tile_row, tile_col) -> np.ndarray:
        return morton_encode(tile_row, tile_col)

    def tile_cell_centres(self, tile_row: int, tile_col: int):
        """Meshgrid of the tile's cell-centre (X, Y) — the per-tile lazy
        analog of ``Raster.to_points`` (``Raster.py:553-567``): only the
        tile's block is ever materialized, never the global meshgrid."""
        h, w = self.tile_shape(tile_row, tile_col)
        r0, c0 = self.tile_origin_rc(tile_row, tile_col)
        rows = np.arange(r0, r0 + h)
        cols = np.arange(c0, c0 + w)
        X = self.grid.xllcorner + (cols + 0.5) * self.grid.cellsize
        top = self.grid.yllcorner + self.grid.nrows * self.grid.cellsize
        Y = top - (rows + 0.5) * self.grid.cellsize
        return np.meshgrid(X, Y)
