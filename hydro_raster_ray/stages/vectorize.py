"""Vectorize: raster → vector regions with DISTRIBUTED cross-tile stitching.

``Raster.vectorize`` (``Raster.py:735-778``) delegates to
``rasterio.features.shapes``: connected regions of equal value become
polygons. The engine's distributed formulation (SURVEY.md §2.5 — "the one
true global shuffle"):

1. **Per-tile labeling** (``map_batches``): 4-connected components of
   equal-valued cells per tile (pure-numpy two-pass union-find). Per-label
   partials (value, n_cells, bbox) reduce VECTORIZED via a pandas groupby
   on the label vector — no per-label O(n_labels × n_pixels) scan. Each
   component gets a globally unique int64 node id
   ``morton(tile) << 21 | local_label``.
2. **Border-face groupby**: every border cell emits a row keyed by the
   shared face ``(axis, boundary line, offset, value)``; facing cells of
   equal value land in the same bucket (≤ 2 members), which emits a stitch
   edge between their node ids. Face rows are O(perimeter) metadata.
3. **Distributed stitch**: edges feed ``stages/cc.py`` connected
   components (min-label propagation + pointer jumping) — the round-1
   driver-side union-find is gone; nothing corpus-sized ever reaches the
   driver.
4. **Reduce**: partials LEFT-join the stitch labels on node id (an
   unstitched component is its own root) and aggregate per (root, value).
   The final table is result-sized (one row per global component) — only
   that is collected for deterministic sequential numbering.

Ring extraction (polygon coordinates): see ``vectorize_polygons`` below —
boundary cell-edges are emitted per tile (tile-border edges resolved in the
same face groupby: a face bucket of size 1 is a true region boundary),
re-keyed by stitched root, and each component's ring is assembled in a
single ``map_groups`` task (partitioning assumption: one region's
*perimeter* fits a task — O(√area) metadata).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..grid import morton_encode
from ..sources.tiles import TileSet
from .cc import (
    attach_labels,
    auto_join_partitions,
    auto_shuffle_blocks,
    connected_components,
)
from .decode import iter_tiles

__all__ = ["label_tile", "classify_pre", "vectorize_components", "vectorize_polygons"]

_LOCAL_BITS = 21  # ≤ 2M local labels per tile (a 256² tile has ≤ 32k)


def label_tile(arr: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected components of equal finite values (NaN = background).
    Returns (labels int64 with -1 background, n_labels).

    Fully vectorized two-pass: horizontal runs are labeled in ONE cumsum
    over the row-major run-start mask; vertical merges reduce to the set of
    UNIQUE adjacent-run pairs (tiny — O(runs), not O(pixels)) resolved with
    an array union-find. The round-1 per-row Python loop cost ~40 ms per
    256² tile; this is ~1 ms."""
    h, w = arr.shape
    valid = np.isfinite(arr)
    if not valid.any():
        return np.full((h, w), -1, dtype=np.int64), 0
    # run starts: valid and (first col, invalid left, or value change)
    change = np.ones((h, w), dtype=bool)
    change[:, 1:] = (~valid[:, :-1]) | (arr[:, 1:] != arr[:, :-1])
    start = valid & change
    run_of_cell = (np.cumsum(start.ravel()) - 1).reshape(h, w)
    labels = np.where(valid, run_of_cell, -1).astype(np.int64)
    n_runs = int(start.sum())
    # vertical merges: (run above, run below) pairs of equal value, resolved
    # by fully vectorized hash-to-min label propagation (scatter-min over
    # the pair list + pointer jumping per round, O(log depth) rounds) — the
    # per-pair Python union-find loop this replaces cost ~60 ms on a noisy
    # 256² tile (~30k merge pairs)
    vm = valid[1:, :] & valid[:-1, :] & (arr[1:, :] == arr[:-1, :])
    parent = np.arange(n_runs, dtype=np.int64)
    if vm.any():
        a = labels[1:, :][vm]
        b = labels[:-1, :][vm]
        while True:
            lo = np.minimum(parent[a], parent[b])
            p = parent.copy()
            np.minimum.at(p, a, lo)
            np.minimum.at(p, b, lo)
            while True:  # pointer jumping: collapse chains created above
                nxt = p[p]
                if np.array_equal(nxt, p):
                    break
                p = nxt
            if np.array_equal(p, parent):
                break
            parent = p
    # labels hold run ids; parent[r] = root run of r; dense component id =
    # rank of the root among all roots (row-major first-seen order)
    uniq, dense_of_run = np.unique(parent, return_inverse=True)
    m = labels >= 0
    labels[m] = dense_of_run[labels[m]]
    return labels, len(uniq)


def _node_base(info) -> np.int64:
    return np.int64(int(morton_encode(info.tile_row, info.tile_col))) << _LOCAL_BITS


def _tile_partials(info, arr, labels, n):
    """Vectorized per-label partials: (node, value, n, bbox) via bincount +
    segment reduceat over the label-sorted cell vector (no pandas groupby
    in the per-tile path — ~4x faster on a 256² tile)."""
    m = labels >= 0
    rr, cc = np.nonzero(m)
    lab = labels[m]
    vals = arr[m]
    cnt = np.bincount(lab, minlength=n).astype(np.int64)
    order = np.argsort(lab, kind="stable")
    bounds = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    r_s = rr[order]
    c_s = cc[order]
    # rows are non-decreasing within a label after the stable sort (nonzero
    # is row-major), so min/max row are the segment ends; cols need reduceat
    min_gr = r_s[bounds] + info.gr0
    max_gr = r_s[np.cumsum(cnt) - 1] + info.gr0
    min_gc = np.minimum.reduceat(c_s, bounds) + info.gc0
    max_gc = np.maximum.reduceat(c_s, bounds) + info.gc0
    value = vals[order][bounds]  # first cell's value (constant per label)
    base = _node_base(info)
    return pd.DataFrame(
        {
            "l": np.arange(n, dtype=np.int64),
            "value": value,
            "n": cnt,
            "min_gr": min_gr.astype(np.int64),
            "max_gr": max_gr.astype(np.int64),
            "min_gc": min_gc.astype(np.int64),
            "max_gc": max_gc.astype(np.int64),
            "node": base + np.arange(n, dtype=np.int64),
        }
    )


def _face_rows(info, arr, labels):
    """Border-face rows for the stitch/boundary groupby: one row per border
    cell with a labeled component, keyed by (axis, line, offset, value).
    axis 0 = horizontal face between rows line/line+1; axis 1 = vertical
    face between cols line/line+1. Vectorized per side."""
    base = _node_base(info)
    out = []
    sides = [
        # (axis, line, offsets, labels_vec, vals_vec)
        (0, info.gr0 - 1, np.arange(info.gc0, info.gc0 + info.w), labels[0, :], arr[0, :]),
        (0, info.gr0 + info.h - 1, np.arange(info.gc0, info.gc0 + info.w), labels[-1, :], arr[-1, :]),
        (1, info.gc0 - 1, np.arange(info.gr0, info.gr0 + info.h), labels[:, 0], arr[:, 0]),
        (1, info.gc0 + info.w - 1, np.arange(info.gr0, info.gr0 + info.h), labels[:, -1], arr[:, -1]),
    ]
    for axis, line, offs, labs, vals in sides:
        ok = labs >= 0
        if not ok.any():
            continue
        out.append(
            pd.DataFrame(
                {
                    "axis": np.int8(axis),
                    "line": np.int64(line),
                    "offset": offs[ok].astype(np.int64),
                    "value": vals[ok],
                    "node": base + labs[ok],
                }
            )
        )
    return out


_PARTIAL_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = component partial, 1 = face row
        ("node", pa.int64()),
        ("value", pa.float64()),
        ("n", pa.int64()),
        ("min_gr", pa.int64()),
        ("max_gr", pa.int64()),
        ("min_gc", pa.int64()),
        ("max_gc", pa.int64()),
        ("axis", pa.int8()),
        ("line", pa.int64()),
        ("offset", pa.int64()),
    ]
)


def classify_pre(breaks):
    """Per-cell ``stats.classify`` binning as a fusable pre-transform:
    ``vectorize_components(ts, pre=classify_pre(breaks))`` labels the
    binned values in the SAME decode pass — no intermediate classified
    TileSet is encoded and re-decoded (one full corpus encode+decode saved
    vs chaining ``classify`` then vectorize; semantics identical)."""
    breaks = list(breaks)

    def pre(arr: np.ndarray) -> np.ndarray:
        out = np.digitize(arr, breaks).astype(np.float64)
        out[np.isnan(arr)] = np.nan
        return out

    return pre


def _emit_partials(ts: TileSet, pre=None):
    grid = ts.grid

    def per_tile(batch: pa.Table) -> pa.Table:
        comps, faces = [], []
        for info, arr in iter_tiles(batch, grid):
            if pre is not None:
                arr = pre(arr)
            labels, n = label_tile(arr)
            if n == 0:
                continue
            assert n < (1 << _LOCAL_BITS), "tile exceeds local-label budget"
            comps.append(_tile_partials(info, arr, labels, n))
            faces.extend(_face_rows(info, arr, labels))
        if not comps and not faces:
            return _PARTIAL_SCHEMA.empty_table()
        frames = []
        if comps:
            c = pd.concat(comps, ignore_index=True)
            frames.append(
                pd.DataFrame(
                    {
                        "kind": np.int8(0),
                        "node": c["node"].astype(np.int64),
                        "value": c["value"].astype(np.float64),
                        "n": c["n"].astype(np.int64),
                        "min_gr": c["min_gr"].astype(np.int64),
                        "max_gr": c["max_gr"].astype(np.int64),
                        "min_gc": c["min_gc"].astype(np.int64),
                        "max_gc": c["max_gc"].astype(np.int64),
                        "axis": np.int8(0),
                        "line": np.int64(0),
                        "offset": np.int64(0),
                    }
                )
            )
        if faces:
            f = pd.concat(faces, ignore_index=True)
            frames.append(
                pd.DataFrame(
                    {
                        "kind": np.int8(1),
                        "node": f["node"].astype(np.int64),
                        "value": f["value"].astype(np.float64),
                        "n": np.int64(0),
                        "min_gr": np.int64(0),
                        "max_gr": np.int64(0),
                        "min_gc": np.int64(0),
                        "max_gc": np.int64(0),
                        "axis": f["axis"].astype(np.int8),
                        "line": f["line"].astype(np.int64),
                        "offset": f["offset"].astype(np.int64),
                    }
                )
            )
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), schema=_PARTIAL_SCHEMA, preserve_index=False)

    return ts.ds.map_batches(per_tile, batch_format="pyarrow", batch_size=None)


def _stitch_labels(rows, num_partitions):
    """Distributed stitch: face rows → edges between facing same-value
    cells → CC. The groupby key is the whole border LINE (one row of tile
    borders), not the individual face: a face has ≤ 2 members, so keying
    per face would pay Ray's per-group map_groups overhead ~4·edge·n_tiles
    times (measured 52 s at 1296×256² tiles vs 2 s this way); within a
    line the pairing is one vectorized sort + shift compare."""

    def line_edges(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["offset", "value", "node"]).reset_index(drop=True)
        same = (
            d["offset"].eq(d["offset"].shift())
            & d["value"].eq(d["value"].shift())
        ).to_numpy()
        prev = d["node"].shift().to_numpy()
        cur = d["node"].to_numpy()
        a = np.minimum(prev[same], cur[same]).astype(np.int64)
        b = np.maximum(prev[same], cur[same]).astype(np.int64)
        return pd.DataFrame({"a": a, "b": b})

    # prune to the 5 face columns and coalesce the many small per-tile
    # blocks before the sort shuffle (same 5-6x groupby win as merge_into)
    faces = (
        rows.filter(expr="kind == 1")
        .select_columns(["axis", "line", "offset", "value", "node"])
        .repartition(auto_shuffle_blocks())
    )
    edges = faces.groupby(["axis", "line"]).map_groups(
        line_edges, batch_format="pandas"
    )
    return connected_components(edges, num_partitions=num_partitions)


def _components_table(rows, labels, num_partitions) -> "pd.DataFrame":
    """Aggregate per-tile partials under the stitched roots; returns the
    result-sized component table WITH the root column, sequentially
    numbered by (min_gr, min_gc, value)."""
    from ray.data.aggregate import Max, Min, Sum

    comps = (
        rows.filter(expr="kind == 0")
        .select_columns(["node", "value", "n", "min_gr", "max_gr", "min_gc", "max_gc"])
        .repartition(auto_shuffle_blocks())
    )
    joined = attach_labels(comps, labels, node_col="node", out_col="root")

    def fix_types(df: pd.DataFrame) -> pd.DataFrame:
        # attach_labels routes int columns through nullable padding → float;
        # restore exact integer dtypes before the aggregate
        for c in ("n", "min_gr", "max_gr", "min_gc", "max_gc", "root"):
            df[c] = df[c].astype(np.int64)
        return df

    agg = (
        joined.map_batches(fix_types, batch_format="pandas")
        .groupby(["root", "value"])
        .aggregate(
            Sum("n", alias_name="n_cells"),
            Min("min_gr", alias_name="min_gr"),
            Max("max_gr", alias_name="max_gr"),
            Min("min_gc", alias_name="min_gc"),
            Max("max_gc", alias_name="max_gc"),
        )
    )
    out = agg.to_pandas()  # result-sized: one row per global component
    if len(out) == 0:
        return pd.DataFrame(
            {
                "component_id": pd.Series([], dtype=np.int64),
                "root": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=np.float64),
                "n_cells": pd.Series([], dtype=np.int64),
                "min_gr": pd.Series([], dtype=np.int64),
                "max_gr": pd.Series([], dtype=np.int64),
                "min_gc": pd.Series([], dtype=np.int64),
                "max_gc": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        out.sort_values(["min_gr", "min_gc", "value"])
        .reset_index(drop=True)
        .astype({"n_cells": np.int64, "root": np.int64})
    )
    out["component_id"] = np.arange(len(out), dtype=np.int64)
    return out[
        [
            "component_id",
            "root",
            "value",
            "n_cells",
            "min_gr",
            "max_gr",
            "min_gc",
            "max_gc",
        ]
    ]


def vectorize_components(
    ts: TileSet, num_partitions: int | None = None, pre=None
) -> "pd.DataFrame":
    """Distributed connected-component vectorization. Returns a pandas table
    (component_id, value, n_cells, min_gr, max_gr, min_gc, max_gc) with
    GLOBAL components (stitched across tile borders); the per-component
    aggregation runs distributed and only the result-sized table is
    collected for sequential numbering. ``pre`` (e.g. ``classify_pre``)
    transforms each decoded tile before labeling, fusing a per-cell map
    into the same decode pass."""
    if num_partitions is None:
        num_partitions = auto_join_partitions()
    rows = _emit_partials(ts, pre=pre).materialize()
    labels = _stitch_labels(rows, num_partitions)
    return _components_table(rows, labels, num_partitions).drop(columns=["root"])


# ---------------------------------------------------------------------------
# ring extraction
# ---------------------------------------------------------------------------


def _boundary_segments(info, arr, labels):
    """Directed boundary cell-edge segments for a tile's INTERIOR edges
    (neighbor inside the tile) plus its outer-border edges *pending* face
    resolution. A segment is a unit cell edge in grid-corner coordinates
    (corner (r, c) = NW corner of cell (r, c)), directed so the region lies
    LEFT of travel — rings then assemble counter-clockwise in map space.

    Returns a DataFrame (node, r0, c0, r1, c1, pending, axis, line, offset):
    pending=1 rows sit on the tile border and are dropped later if the
    facing tile continues the region (same face bucket, 2 members)."""
    h, w = arr.shape
    m = labels >= 0
    segs = []

    def emit(rr, cc, drc, pending, axis, line, offs):
        # drc: one of 'N','S','W','E' — which side of cell (rr, cc) the
        # boundary edge is on; direction keeps region left of travel.
        gr = rr + info.gr0
        gc = cc + info.gc0
        if drc == "N":  # edge along top of cell, travel W→E ... region below
            r0, c0, r1, c1 = gr, gc, gr, gc + 1
        elif drc == "S":  # bottom edge, travel E→W
            r0, c0, r1, c1 = gr + 1, gc + 1, gr + 1, gc
        elif drc == "W":  # left edge, travel S→N
            r0, c0, r1, c1 = gr + 1, gc, gr, gc
        else:  # 'E': right edge, travel N→S
            r0, c0, r1, c1 = gr, gc + 1, gr + 1, gc + 1
        segs.append(
            pd.DataFrame(
                {
                    "node": _node_base(info) + labels[rr, cc],
                    "r0": r0,
                    "c0": c0,
                    "r1": r1,
                    "c1": c1,
                    "pending": np.int8(pending),
                    "axis": np.int8(axis),
                    "line": np.int64(line),
                    "offset": offs.astype(np.int64),
                }
            )
        )

    vals = arr
    # N neighbors (row-1): boundary if first row (pending) or neighbor differs
    rr, cc = np.nonzero(m)
    up_in = rr > 0
    diff_up = np.zeros(rr.size, dtype=bool)
    diff_up[up_in] = ~(
        m[rr[up_in] - 1, cc[up_in]]
        & (vals[rr[up_in] - 1, cc[up_in]] == vals[rr[up_in], cc[up_in]])
    )
    sel = up_in & diff_up
    if sel.any():
        emit(rr[sel], cc[sel], "N", 0, 0, 0, np.zeros(sel.sum()))
    sel = ~up_in
    if sel.any():
        emit(rr[sel], cc[sel], "N", 1, 0, info.gr0 - 1, cc[sel] + info.gc0)

    dn_in = rr < h - 1
    diff_dn = np.zeros(rr.size, dtype=bool)
    diff_dn[dn_in] = ~(
        m[rr[dn_in] + 1, cc[dn_in]]
        & (vals[rr[dn_in] + 1, cc[dn_in]] == vals[rr[dn_in], cc[dn_in]])
    )
    sel = dn_in & diff_dn
    if sel.any():
        emit(rr[sel], cc[sel], "S", 0, 0, 0, np.zeros(sel.sum()))
    sel = ~dn_in
    if sel.any():
        emit(rr[sel], cc[sel], "S", 1, 0, info.gr0 + h - 1, cc[sel] + info.gc0)

    lf_in = cc > 0
    diff_lf = np.zeros(rr.size, dtype=bool)
    diff_lf[lf_in] = ~(
        m[rr[lf_in], cc[lf_in] - 1]
        & (vals[rr[lf_in], cc[lf_in] - 1] == vals[rr[lf_in], cc[lf_in]])
    )
    sel = lf_in & diff_lf
    if sel.any():
        emit(rr[sel], cc[sel], "W", 0, 0, 0, np.zeros(sel.sum()))
    sel = ~lf_in
    if sel.any():
        emit(rr[sel], cc[sel], "W", 1, 1, info.gc0 - 1, rr[sel] + info.gr0)

    rt_in = cc < w - 1
    diff_rt = np.zeros(rr.size, dtype=bool)
    diff_rt[rt_in] = ~(
        m[rr[rt_in], cc[rt_in] + 1]
        & (vals[rr[rt_in], cc[rt_in] + 1] == vals[rr[rt_in], cc[rt_in]])
    )
    sel = rt_in & diff_rt
    if sel.any():
        emit(rr[sel], cc[sel], "E", 0, 0, 0, np.zeros(sel.sum()))
    sel = ~rt_in
    if sel.any():
        emit(rr[sel], cc[sel], "E", 1, 1, info.gc0 + w - 1, rr[sel] + info.gr0)

    if not segs:
        return None
    return pd.concat(segs, ignore_index=True)


def assemble_rings(seg_df: pd.DataFrame) -> list[np.ndarray]:
    """Link directed unit segments into closed rings (corner-coordinate
    row/col pairs). Each corner has at most one outgoing segment per ring
    for 4-connected regions EXCEPT at checkerboard corners, where two
    diagonal same-value cells meet — resolved by preferring the RIGHT-turn
    continuation (keeps rings simple, matches rasterio's shapes)."""
    # index segments by start corner
    by_start: dict = {}
    for r0, c0, r1, c1 in zip(seg_df["r0"], seg_df["c0"], seg_df["r1"], seg_df["c1"]):
        by_start.setdefault((r0, c0), []).append((r1, c1))
    rings = []
    # right-turn preference order by incoming direction (dr, dc):
    # try right, straight, left
    def turn_order(d):
        dr, dc = d
        right = (dc, -dr)
        left = (-dc, dr)
        return [right, (dr, dc), left]

    while by_start:
        start = next(iter(by_start))
        ring = [start]
        cur = start
        incoming = None
        while True:
            outs = by_start.get(cur)
            if not outs:
                break  # open chain (shouldn't happen on closed regions)
            if len(outs) == 1 or incoming is None:
                nxt = outs.pop(0)
            else:
                pick = None
                for d in turn_order(incoming):
                    cand = (cur[0] + d[0], cur[1] + d[1])
                    if cand in outs:
                        pick = cand
                        break
                nxt = pick if pick is not None else outs[0]
                outs.remove(nxt)
            if not outs:
                by_start.pop(cur, None)
            incoming = (nxt[0] - cur[0], nxt[1] - cur[1])
            cur = nxt
            ring.append(cur)
            if cur == start:
                break
        if len(ring) > 1 and ring[0] == ring[-1]:
            rings.append(np.asarray(ring, dtype=np.int64))
        # else: drop degenerate chain
    return rings


_SEG_SCHEMA = pa.schema(
    [
        ("node", pa.int64()),
        ("r0", pa.int64()),
        ("c0", pa.int64()),
        ("r1", pa.int64()),
        ("c1", pa.int64()),
        ("pending", pa.int8()),
        ("axis", pa.int8()),
        ("line", pa.int64()),
        ("offset", pa.int64()),
    ]
)


def vectorize_polygons(
    ts: TileSet, num_partitions: int | None = None, pre=None
) -> "pd.DataFrame":
    """Raster → polygon rings (``Raster.py:735-778`` parity path): each
    global component's boundary as closed rings of GRID-CORNER coordinates
    (corner (r, c) = NW corner of cell (r, c); convert to map coords with
    ``sub2map`` of the corner lattice). Returns one row per ring:
    (component_id, value, n_cells, ring_idx, n_vertices, area_cells, rs,
    cs) — ring_idx 0 is the exterior (largest |signed area|), further rings
    are holes. Ring assembly runs one ``map_groups`` task per component
    over O(perimeter) segment rows (the documented partitioning
    assumption: one region's perimeter fits a task)."""
    if num_partitions is None:
        num_partitions = auto_join_partitions()
    grid = ts.grid

    def per_tile(batch: pa.Table) -> pa.Table:
        frames = []
        for info, arr in iter_tiles(batch, grid):
            if pre is not None:
                arr = pre(arr)
            labels, n = label_tile(arr)
            if n == 0:
                continue
            segs = _boundary_segments(info, arr, labels)
            if segs is not None:
                frames.append(segs)
        if not frames:
            return _SEG_SCHEMA.empty_table()
        return pa.Table.from_pandas(
            pd.concat(frames, ignore_index=True), schema=_SEG_SCHEMA, preserve_index=False
        )

    rows = _emit_partials(ts, pre=pre).materialize()
    labels = _stitch_labels(rows, num_partitions)
    segs = ts.ds.map_batches(per_tile, batch_format="pyarrow", batch_size=None)

    # resolve pending (tile-border) segments: a face bucket with ≥2 members
    # means the region continues across the border → BOTH segments drop.
    faces = rows.filter(expr="kind == 1")

    def closed_per_line(df: pd.DataFrame) -> pd.DataFrame:
        # a face is closed iff both sides carry the same value: within a
        # line, same (offset, value) appearing twice (vectorized pairing —
        # see _stitch_labels for why the groupby key is the LINE)
        d = df.sort_values(["offset", "value"]).reset_index(drop=True)
        same = (
            d["offset"].eq(d["offset"].shift()) & d["value"].eq(d["value"].shift())
        ).to_numpy()
        out = d[same]
        return pd.DataFrame(
            {
                "axis": out["axis"].astype(np.int8),
                "line": out["line"].astype(np.int64),
                "offset": out["offset"].astype(np.int64),
            }
        )

    closed = faces.groupby(["axis", "line"]).map_groups(
        closed_per_line, batch_format="pandas"
    )

    # drop pending segments on closed faces (broadcast the closed-face key
    # set: O(stitched border cells) — bounded metadata, like the reference's
    # shapefile side tables)
    import ray as _ray

    closed_df = closed.to_pandas().drop_duplicates()
    closed_df["__closed"] = np.int8(1)
    ckref = _ray.put(closed_df)

    def drop_closed(df: pd.DataFrame) -> pd.DataFrame:
        pend = df["pending"].to_numpy() == 1
        if not pend.any():
            return df
        # vectorized membership via a pandas hash join on the face key (a
        # per-row Python set lookup here cost ~1 µs/row over every boundary
        # segment of the corpus)
        merged = df.merge(
            _ray.get(ckref), on=["axis", "line", "offset"], how="left"
        )
        drop = pend & (merged["__closed"].to_numpy() == 1)
        return df[~drop]

    segs = segs.map_batches(drop_closed, batch_format="pandas")

    # re-key segments by stitched root (join-free label attach)
    joined = attach_labels(
        segs.select_columns(["node", "r0", "c0", "r1", "c1"]),
        labels,
        node_col="node",
        out_col="root",
    )

    def resolve_root(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in ("root", "r0", "c0", "r1", "c1"):
            df[c] = df[c].astype(np.int64)
        return df[["root", "r0", "c0", "r1", "c1"]]

    keyed = joined.map_batches(resolve_root, batch_format="pandas")

    def rings_for(df: pd.DataFrame) -> pd.DataFrame:
        root = int(df["root"].iloc[0])
        scored = []
        for ring in assemble_rings(df):
            # signed area (shoelace) in cell units; exterior = largest |A|
            r = ring[:, 0].astype(np.float64)
            c = ring[:, 1].astype(np.float64)
            a = 0.5 * float(np.sum(c[:-1] * r[1:] - c[1:] * r[:-1]))
            scored.append((ring, a))
        scored.sort(key=lambda t: -abs(t[1]))
        return pd.DataFrame(
            {
                "root": np.int64(root),
                "ring_idx": np.arange(len(scored), dtype=np.int64),
                "n_vertices": np.array([len(r) - 1 for r, _ in scored], dtype=np.int64),
                "area_cells": np.array([a for _, a in scored], dtype=np.float64),
                "rs": [r[:, 0].tolist() for r, _ in scored],
                "cs": [r[:, 1].tolist() for r, _ in scored],
            }
        )

    ring_rows = keyed.groupby("root").map_groups(rings_for, batch_format="pandas")
    out = ring_rows.to_pandas()  # result-sized (the vector output itself)

    comps = _components_table(rows, labels, num_partitions)
    merged = out.merge(
        comps[["component_id", "root", "value", "n_cells"]], on="root", how="left"
    )
    merged = merged.sort_values(["component_id", "ring_idx"]).reset_index(drop=True)
    return merged[
        [
            "component_id",
            "value",
            "n_cells",
            "ring_idx",
            "n_vertices",
            "area_cells",
            "rs",
            "cs",
        ]
    ]
