"""Vectorize: raster → vector regions with cross-tile stitching.

``Raster.vectorize`` (``Raster.py:735-778``) delegates to
``rasterio.features.shapes``: connected regions of equal value become
polygons. The engine's distributed formulation (SURVEY.md §2.5 — "the one
true global shuffle") runs in three stages:

1. **Per-tile labeling** (``map_batches``): 4-connected components of
   equal-valued cells per tile (pure-numpy two-pass union-find), emitting
   per-component partials (value, n_cells, bbox) plus the tile's four
   BORDER RUNS — (side, offset, value, local label) for every border cell.
2. **Stitch**: border runs are tiny metadata (O(perimeter), not O(area)).
   Adjacent tiles' facing runs with equal values merge their components via
   union-find. The run table is collected to the driver (bounded: ≤
   4·tile_edge·n_tiles rows — for 10^12 cells at 256² tiles that is ~0.4 %
   of the data; the documented scale-out path is a groupby on the shared
   tile-border key with iterated label propagation).
3. **Reduce**: per-component partials aggregate under the stitched global
   ids → the vector table (component_id, value, n_cells, bbox).

Ring extraction (polygon coordinates) is provided for test-scale mosaics by
the oracle (whole-array); the distributed ring stitch is the documented
follow-up — the hard global semantics (which cells form which region) are
fully distributed here and covered by goldens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.tiles import TileSet
from .decode import iter_tiles

__all__ = ["label_tile", "vectorize_components"]


def label_tile(arr: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected components of equal finite values (NaN = background).
    Returns (labels int32 with -1 background, n_labels). Two-pass union-find,
    vectorized row merging."""
    h, w = arr.shape
    labels = np.full((h, w), -1, dtype=np.int64)
    parent: list[int] = []

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    valid = np.isfinite(arr)
    # first pass: row-wise runs get provisional labels
    for r in range(h):
        row_valid = valid[r]
        if not row_valid.any():
            continue
        vals = arr[r]
        # run starts: valid and (first col, invalid left, or value change)
        change = np.empty(w, dtype=bool)
        change[0] = True
        change[1:] = (~row_valid[:-1]) | (vals[1:] != vals[:-1])
        starts = np.nonzero(row_valid & change)[0]
        # a run ends at the next boundary: invalid cell OR value change
        boundaries = np.nonzero((~row_valid) | change)[0]
        ends_idx = np.searchsorted(boundaries, starts, side="right")
        ends = np.where(
            ends_idx < boundaries.size, boundaries[np.minimum(ends_idx, boundaries.size - 1)], w
        )
        for s, seg in zip(starts, ends):
            s, seg = int(s), int(seg)
            lab = len(parent)
            parent.append(lab)
            labels[r, s:seg] = lab
            # vertical merges with the row above (equal value)
            if r > 0:
                above = labels[r - 1, s:seg]
                ok = (above >= 0) & (arr[r - 1, s:seg] == vals[s])
                for al in np.unique(above[ok]):
                    union(lab, int(al))
    if not parent:
        return labels, 0
    # resolve + compact
    roots = np.array([find(i) for i in range(len(parent))], dtype=np.int64)
    uniq, compact = np.unique(roots, return_inverse=True)
    m = labels >= 0
    labels[m] = compact[labels[m]]
    return labels, len(uniq)


def vectorize_components(ts: TileSet) -> "pd.DataFrame":
    """Distributed connected-component vectorization. Returns a pandas table
    (component_id, value, n_cells, min_gr, max_gr, min_gc, max_gc) with
    GLOBAL components (stitched across tile borders)."""
    grid = ts.grid

    def per_tile(batch: pa.Table) -> pa.Table:
        comp_rows = {"tile": [], "local": [], "value": [], "n": [],
                     "min_gr": [], "max_gr": [], "min_gc": [], "max_gc": []}
        run_rows = {"tile": [], "side": [], "offset": [], "value": [], "local": []}
        for info, arr in iter_tiles(batch, grid):
            labels, n = label_tile(arr)
            if n == 0:
                continue
            m = labels >= 0
            rr, cc = np.nonzero(m)
            ll = labels[m]
            vv = arr[m]
            for lab in range(n):
                sel = ll == lab
                comp_rows["tile"].append(info.image_id)
                comp_rows["local"].append(lab)
                comp_rows["value"].append(float(vv[sel][0]))
                comp_rows["n"].append(int(sel.sum()))
                comp_rows["min_gr"].append(int(rr[sel].min()) + info.gr0)
                comp_rows["max_gr"].append(int(rr[sel].max()) + info.gr0)
                comp_rows["min_gc"].append(int(cc[sel].min()) + info.gc0)
                comp_rows["max_gc"].append(int(cc[sel].max()) + info.gc0)
            # border runs: global coordinates along each side
            sides = [
                ("N", labels[0, :], arr[0, :], info.gc0, info.gr0),
                ("S", labels[-1, :], arr[-1, :], info.gc0, info.gr0 + info.h - 1),
                ("W", labels[:, 0], arr[:, 0], info.gr0, info.gc0),
                ("E", labels[:, -1], arr[:, -1], info.gr0, info.gc0 + info.w - 1),
            ]
            for side, labs, vals, off0, fixed in sides:
                ok = labs >= 0
                for k in np.nonzero(ok)[0]:
                    run_rows["tile"].append(info.image_id)
                    run_rows["side"].append(f"{side}:{fixed}")
                    run_rows["offset"].append(off0 + int(k))
                    run_rows["value"].append(float(vals[k]))
                    run_rows["local"].append(int(labs[k]))
        # single fixed-schema output: component rows + border-run rows
        n_c = len(comp_rows["tile"])
        n_r = len(run_rows["tile"])
        return pa.table(
            {
                "tile": pa.array(comp_rows["tile"] + run_rows["tile"], pa.string()),
                "local": pa.array(comp_rows["local"] + run_rows["local"], pa.int64()),
                "value": pa.array(comp_rows["value"] + run_rows["value"], pa.float64()),
                "n": pa.array(comp_rows["n"] + [0] * n_r, pa.int64()),
                "min_gr": pa.array(comp_rows["min_gr"] + [0] * n_r, pa.int64()),
                "max_gr": pa.array(comp_rows["max_gr"] + [0] * n_r, pa.int64()),
                "min_gc": pa.array(comp_rows["min_gc"] + [0] * n_r, pa.int64()),
                "max_gc": pa.array(comp_rows["max_gc"] + [0] * n_r, pa.int64()),
                "side": pa.array([""] * n_c + run_rows["side"], pa.string()),
                "offset": pa.array([0] * n_c + run_rows["offset"], pa.int64()),
                "kind": pa.array(["comp"] * n_c + ["run"] * n_r, pa.string()),
            }
        )

    rows = ts.ds.map_batches(per_tile, batch_format="pyarrow", batch_size=None).to_pandas()
    if len(rows) == 0:
        return pd.DataFrame(
            {
                "component_id": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=np.float64),
                "n_cells": pd.Series([], dtype=np.int64),
                "min_gr": pd.Series([], dtype=np.int64),
                "max_gr": pd.Series([], dtype=np.int64),
                "min_gc": pd.Series([], dtype=np.int64),
                "max_gc": pd.Series([], dtype=np.int64),
            }
        )
    comps = rows[rows["kind"] == "comp"].copy()
    runs = rows[rows["kind"] == "run"].copy()

    # ---- driver-side stitch (small metadata) ----
    key = list(zip(comps["tile"], comps["local"]))
    parent = {k: k for k in key}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # facing sides: a tile's S row at global row g faces a tile's N row at
    # g+1; E col at c faces W col at c+1 — match on (axis, boundary-line,
    # offset, value)
    def face_key(side_field, offset, out=True):
        side, fixed = side_field.split(":")
        fixed = int(fixed)
        if side == "S":
            return ("H", fixed + 0.5, offset)
        if side == "N":
            return ("H", fixed - 0.5, offset)
        if side == "E":
            return ("V", fixed + 0.5, offset)
        return ("V", fixed - 0.5, offset)

    buckets: dict = {}
    for tile, local, value, side, offset in zip(
        runs["tile"], runs["local"], runs["value"], runs["side"], runs["offset"]
    ):
        fk = face_key(side, offset)
        buckets.setdefault((fk, value), []).append((tile, int(local)))
    for members in buckets.values():
        first = members[0]
        for other in members[1:]:
            union(first, other)

    comps["root_tile"], comps["root_local"] = zip(
        *(find(k) for k in zip(comps["tile"], comps["local"]))
    )
    agg = (
        comps.groupby(["root_tile", "root_local", "value"], as_index=False)
        .agg(
            n_cells=("n", "sum"),
            min_gr=("min_gr", "min"),
            max_gr=("max_gr", "max"),
            min_gc=("min_gc", "min"),
            max_gc=("max_gc", "max"),
        )
        .sort_values(["min_gr", "min_gc", "value"])
        .reset_index(drop=True)
    )
    agg["component_id"] = np.arange(len(agg), dtype=np.int64)
    return agg[
        ["component_id", "value", "n_cells", "min_gr", "max_gr", "min_gc", "max_gc"]
    ]
