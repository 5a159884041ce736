"""Aggregations over the mosaic: summary, global stats, exact median,
zonal statistics, classification.

The reference has only whole-array NaN stats (``Raster.py:844-854``) and the
header summary (``Raster.py:134-150``). The engine computes them as per-tile
PARTIALS inside ``map_batches`` (one tiny row per batch) followed by a small
``Dataset.aggregate`` / ``groupby`` — the partial/combiner pattern, so the
shuffle moves kilobytes, not pixels.

``exact_median`` is the custom wide operator the Dataset API lacks: an
iterative histogram-refinement (binary search on value) that finds the exact
NaN-ignoring median (``np.nanmedian`` semantics, ``Raster.py:852-854``) in
O(log) full passes without ever materializing the value multiset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Max, Min, Sum

from ..sources.tiles import TileSet
from .decode import iter_tiles, rows_to_table
from .rasterize import _features_ref, _resolve_values, burn_features

__all__ = [
    "global_stats",
    "summary",
    "exact_median",
    "zonal_stats",
    "zonal_majority",
    "classify",
]


def _partials(ts: TileSet):
    grid = ts.grid

    def per_batch(batch: pa.Table) -> pa.Table:
        n_tiles = batch.num_rows
        n_cells = 0
        n_valid = 0
        s = 0.0
        mn = np.inf
        mx = -np.inf
        # f32 planes (lossless by codec contract); the sum uses an explicit
        # float64 accumulator so the partial equals the f64 path
        for _info, arr in iter_tiles(batch, grid, dtype=np.float32):
            n_cells += arr.size
            m = np.isfinite(arr)
            k = int(m.sum())
            n_valid += k
            if k:
                v = arr[m]
                s += float(v.sum(dtype=np.float64))
                mn = min(mn, float(v.min()))
                mx = max(mx, float(v.max()))
        return pa.table(
            {
                "n_tiles": [n_tiles],
                "n_cells": [n_cells],
                "n_valid": [n_valid],
                "sum": [s],
                "min": [mn],
                "max": [mx],
            }
        )

    return ts.ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def global_stats(ts: TileSet) -> dict:
    """NaN-ignoring global count/sum/min/max/mean (``Raster.py:844-851``)."""
    agg = _partials(ts).aggregate(
        Sum("n_tiles", alias_name="n_tiles"),
        Sum("n_cells", alias_name="n_cells"),
        Sum("n_valid", alias_name="n_valid"),
        Sum("sum", alias_name="sum"),
        Min("min", alias_name="min"),
        Max("max", alias_name="max"),
    )
    out = dict(agg)
    out["mean"] = out["sum"] / out["n_valid"] if out["n_valid"] else float("nan")
    return out


def summary(ts: TileSet) -> dict:
    """``Raster.get_summary`` (``Raster.py:134-150``): header + valid-cell
    count + crs, plus the global stats."""
    st = global_stats(ts)
    g = ts.grid
    return {**g.to_header(), "crs": g.crs, "num_valid_cells": st["n_valid"], **st}


def exact_median(ts: TileSet, bins: int = 1024, leaf_size: int = 200_000) -> float:
    """Exact NaN-ignoring median via distributed histogram refinement.

    Pass 0 gets (count, min, max); each subsequent pass histograms the
    current value interval into ``bins`` buckets (a tiny per-batch partial →
    driver merge) and descends into the bucket holding the k-th order
    statistic; when ≤ ``leaf_size`` values remain they are pulled and the
    exact median taken. Deterministic; ~3 passes for float64 DEMs.
    """
    st = global_stats(ts)
    n = int(st["n_valid"])
    if n == 0:
        return float("nan")
    lo, hi = float(st["min"]), float(st["max"])
    if lo == hi:
        return lo
    # ranks of the median element(s), 0-based
    k1 = (n - 1) // 2
    k2 = n // 2
    grid = ts.grid
    below = 0  # values < lo so far

    def hist_pass(lo, hi):
        edges = np.linspace(lo, hi, bins + 1)

        def per_batch(batch: pa.Table) -> pa.Table:
            counts = np.zeros(bins + 1, dtype=np.int64)  # +1: values == hi
            for _info, arr in iter_tiles(batch, grid, dtype=np.float32):
                v = arr[np.isfinite(arr)]
                v = v[(v >= lo) & (v <= hi)]
                idx = np.searchsorted(edges, v, side="right") - 1
                np.add.at(counts, np.clip(idx, 0, bins), 1)
            return pa.table({"counts": [counts.tolist()]})

        total = np.zeros(bins + 1, dtype=np.int64)
        for b in ts.ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None).iter_batches(
            batch_format="pyarrow"
        ):
            for row in b["counts"].to_pylist():
                total += np.asarray(row, dtype=np.int64)
        return edges, total

    def collect_leaf(lo, hi):
        def per_batch(batch: pa.Table) -> pa.Table:
            vals = []
            # f32 scan, but the leaf values promote to float64 so the
            # two-middle-element average matches np.nanmedian bit-exactly
            for _info, arr in iter_tiles(batch, grid, dtype=np.float32):
                v = arr[np.isfinite(arr)]
                vals.append(v[(v >= lo) & (v <= hi)].astype(np.float64))
            v = np.concatenate(vals) if vals else np.empty(0)
            return pa.table({"v": pa.array(v)})

        chunks = [
            b["v"].to_numpy(zero_copy_only=False)
            for b in ts.ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None).iter_batches(
                batch_format="pyarrow"
            )
        ]
        return np.sort(np.concatenate(chunks)) if chunks else np.empty(0)

    for _ in range(64):  # far more than float64 ever needs
        # count of values in [lo, hi]
        in_range = n - below  # values >= lo (all remaining are <= hi)
        if in_range <= leaf_size:
            vals = collect_leaf(lo, hi)
            i1 = k1 - below
            i2 = k2 - below
            return float((vals[i1] + vals[i2]) / 2.0)
        edges, counts = hist_pass(lo, hi)
        # cumulative counts; find the buckets holding ranks k1 and k2
        cum = below + np.cumsum(counts)
        b1 = int(np.searchsorted(cum, k1 + 1, side="left"))
        b2 = int(np.searchsorted(cum, k2 + 1, side="left"))
        if b1 != b2:
            # the two middle elements straddle buckets — collect their span
            span_hi = float(edges[b2 + 1]) if b2 < bins else hi
            vals = collect_leaf(float(edges[b1]), span_hi)
            off = below + int(counts[:b1].sum())
            vals = np.sort(vals)
            return float((vals[k1 - off] + vals[k2 - off]) / 2.0)
        new_lo = float(edges[b1])
        new_hi = float(edges[b1 + 1]) if b1 < bins else hi
        below = below + int(counts[:b1].sum())
        if new_lo == lo and new_hi == hi:
            # interval no longer narrows (ties): collect and finish exactly
            vals = collect_leaf(lo, hi)
            return float((vals[k1 - below] + vals[k2 - below]) / 2.0)
        lo, hi = new_lo, new_hi
    raise RuntimeError("median refinement failed to converge")


def exact_quantiles(
    ts: TileSet,
    ps=(0.1, 0.5, 0.9),
    bins: int = 1024,
    leaf_size: int = 200_000,
) -> dict:
    """Exact NaN-ignoring order statistics at quantiles ``ps`` — DuckDB
    ``quantile_disc`` semantics (1-based rank ``ceil(p·n)``, an actual
    data element, no interpolation) so the SQL oracle matches
    bit-for-bit.

    Same distributed histogram refinement as ``exact_median``, but
    multi-rank: each refinement LEVEL is ONE corpus pass that histograms
    every unresolved quantile's interval simultaneously (per-batch tiny
    partials → driver merge), so q quantiles cost ~3 passes total, not
    3q. Leaves (≤ ``leaf_size`` values) are pulled and selected exactly.
    """
    st = global_stats(ts)
    n = int(st["n_valid"])
    if n == 0:
        return {p: float("nan") for p in ps}
    lo0, hi0 = float(st["min"]), float(st["max"])
    grid = ts.grid
    # 0-based target rank per quantile (ceil(p·n) − 1, clamped)
    ks = {p: min(max(int(np.ceil(p * n)) - 1, 0), n - 1) for p in ps}
    # per-quantile refinement state: [lo, hi, below, remaining]
    state = {p: [lo0, hi0, 0, n] for p in ps}
    out: dict = {}
    if lo0 == hi0:
        return {p: lo0 for p in ps}

    def hist_pass(intervals):
        m = len(intervals)
        edges_l = [np.linspace(lo, hi, bins + 1) for lo, hi in intervals]

        def per_batch(batch: pa.Table) -> pa.Table:
            cnts = np.zeros((m, bins + 1), dtype=np.int64)
            for _info, arr in iter_tiles(batch, grid, dtype=np.float32):
                v = arr[np.isfinite(arr)]
                for j, (lo, hi) in enumerate(intervals):
                    w = v[(v >= lo) & (v <= hi)]
                    idx = np.searchsorted(edges_l[j], w, side="right") - 1
                    np.add.at(cnts[j], np.clip(idx, 0, bins), 1)
            return pa.table({"counts": [cnts.ravel().tolist()]})

        total = np.zeros((m, bins + 1), dtype=np.int64)
        for b in ts.ds.map_batches(
            per_batch, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            for row in b["counts"].to_pylist():
                total += np.asarray(row, dtype=np.int64).reshape(m, bins + 1)
        return edges_l, total

    def collect_leaf(lo, hi):
        def per_batch(batch: pa.Table) -> pa.Table:
            vals = []
            for _info, arr in iter_tiles(batch, grid, dtype=np.float32):
                v = arr[np.isfinite(arr)]
                vals.append(v[(v >= lo) & (v <= hi)].astype(np.float64))
            v = np.concatenate(vals) if vals else np.empty(0)
            return pa.table({"v": pa.array(v)})

        chunks = [
            b["v"].to_numpy(zero_copy_only=False)
            for b in ts.ds.map_batches(
                per_batch, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow")
        ]
        return np.sort(np.concatenate(chunks)) if chunks else np.empty(0)

    for _ in range(64):
        # resolve leaves (small intervals) exactly
        for p in list(state):
            if p in out:
                continue
            lo, hi, below, remaining = state[p]
            if remaining <= leaf_size:
                vals = collect_leaf(lo, hi)
                out[p] = float(vals[ks[p] - below])
        active = [p for p in state if p not in out]
        if not active:
            return {p: out[p] for p in ps}
        intervals = [tuple(state[p][:2]) for p in active]
        edges_l, totals = hist_pass(intervals)
        for j, p in enumerate(active):
            lo, hi, below, _rem = state[p]
            counts = totals[j]
            cum = below + np.cumsum(counts)
            bkt = int(np.searchsorted(cum, ks[p] + 1, side="left"))
            new_lo = float(edges_l[j][bkt])
            new_hi = float(edges_l[j][bkt + 1]) if bkt < bins else hi
            new_below = below + int(counts[:bkt].sum())
            if new_lo == lo and new_hi == hi:
                # ties: the interval no longer narrows — finish exactly
                vals = collect_leaf(lo, hi)
                out[p] = float(vals[ks[p] - below])
            else:
                state[p] = [new_lo, new_hi, new_below, int(counts[bkt])]
        if all(p in out for p in state):
            return {p: out[p] for p in ps}
    raise RuntimeError("quantile refinement failed to converge")


def _index_partials(fidx: np.ndarray, v: np.ndarray, nf: int):
    """Vectorized per-feature-index partials over one tile's masked pixels:
    (count, sum, min, max) arrays of length ``nf``. Sums accumulate in
    float64 (bincount weights path); min/max scatter via ``ufunc.at``."""
    cnt = np.bincount(fidx, minlength=nf)
    sums = np.bincount(fidx, weights=v, minlength=nf)
    mins = np.full(nf, np.inf)
    np.minimum.at(mins, fidx, v)
    maxs = np.full(nf, -np.inf)
    np.maximum.at(maxs, fidx, v)
    return cnt, sums, mins, maxs


def zonal_stats(ts: TileSet, features, attribute="id"):
    """Per-zone aggregate of pixel values: rasterize the zone plane per tile
    (broadcast features, §rasterize), reduce within the batch to one partial
    row per zone, then a tiny ``groupby('zone')`` shuffle.

    Returns a Ray Dataset with columns zone, n, sum_z, min_z, max_z, mean_z
    (zone = burned attribute; cells outside all zones are excluded)."""
    ref = _features_ref(features)
    grid = ts.grid

    def per_batch(batch: pa.Table) -> pa.Table:
        import ray as _ray

        feats = _ray.get(ref)
        values = np.asarray(_resolve_values(feats, attribute), dtype=np.float64)
        nf = len(feats)
        acc: dict[float, list] = {}
        # burn the feature INDEX and map to zone values afterwards — same
        # last-feature-wins plane, but the per-tile reduction vectorizes as
        # bincount/ufunc.at over 0..nf-1 instead of a per-zone mask loop
        # (O(npix) instead of O(npix·nzones)); f32 planes are lossless by
        # codec contract and halve the burn/mask traffic
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            plane = burn_features(
                info, feats, list(range(nf)), dtype=np.float32
            )
            m = np.isfinite(arr) & np.isfinite(plane)
            if not m.any():
                continue
            fidx = plane[m].astype(np.int64)
            v = arr[m].astype(np.float64)
            cnt, sums, mins, maxs = _index_partials(fidx, v, nf)
            for f_i in np.nonzero(cnt)[0]:
                zone = float(values[f_i])
                if zone == grid.nodata or not np.isfinite(zone):
                    continue  # value-plane parity: nodata/NaN burns excluded
                a = acc.setdefault(zone, [0, 0.0, np.inf, -np.inf])
                a[0] += int(cnt[f_i])
                a[1] += float(sums[f_i])
                a[2] = min(a[2], float(mins[f_i]))
                a[3] = max(a[3], float(maxs[f_i]))
        if not acc:
            return pa.table(
                {
                    "zone": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                    "sum_z": pa.array([], pa.float64()),
                    "min_z": pa.array([], pa.float64()),
                    "max_z": pa.array([], pa.float64()),
                }
            )
        zones = sorted(acc)
        return pa.table(
            {
                "zone": pa.array([float(z) for z in zones]),
                "n": pa.array([acc[z][0] for z in zones], pa.int64()),
                "sum_z": pa.array([acc[z][1] for z in zones]),
                "min_z": pa.array([acc[z][2] for z in zones]),
                "max_z": pa.array([acc[z][3] for z in zones]),
            }
        )

    partial = ts.ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None)
    agg = partial.groupby("zone").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_z", alias_name="sum_z"),
        Min("min_z", alias_name="min_z"),
        Max("max_z", alias_name="max_z"),
    )

    def add_mean(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["mean_z"] = df["sum_z"] / df["n"]
        return df

    return agg.map_batches(add_mean, batch_format="pandas")


def classify(ts: TileSet, breaks) -> TileSet:
    """``rankshow`` value-binning (``grid_show.py:323-331``) as a data
    transform: per-cell ``np.digitize`` by break values; NaN stays NaN."""
    grid = ts.grid
    breaks = list(breaks)

    def per_batch(batch: pa.Table) -> pa.Table:
        rows = []
        for info, arr in iter_tiles(batch, grid):
            out = np.digitize(arr, breaks).astype(np.float64)
            out[np.isnan(arr)] = np.nan
            rows.append((info, out))
        return rows_to_table(rows, lossless=True) if rows else rows_to_table([])

    return TileSet(ds=ts.ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None), grid=grid)


def apply_and_zonal(ts: TileSet, features, edit_attribute="adjust_val",
                    zone_attribute="id"):
    """Fused landcover edit + zonal summary in ONE pass (EP1 headline op).

    Burns the feature-INDEX plane once per tile, derives the edit-value and
    zone-id planes by ``np.take`` lookup (no second geometry pass), applies
    ``pixels + edit_value`` inside the mask, and reduces zonal partials in
    the same task. Returns the zonal Dataset (zone, n, sum_z, min_z, max_z,
    mean_z) over the EDITED pixels. Exactly equivalent to
    ``zonal_stats(apply_features(ts, ...), ...)`` at half the decode+burn
    cost.
    """
    ref = _features_ref(features)
    grid = ts.grid

    def per_batch(batch: pa.Table) -> pa.Table:
        import ray as _ray

        feats = _ray.get(ref)
        edit_vals = np.asarray(_resolve_values(feats, edit_attribute), dtype=np.float64)
        zone_vals = np.asarray(_resolve_values(feats, zone_attribute), dtype=np.float64)
        nf = len(feats)
        acc: dict[float, list] = {}
        # f32 planes (lossless by codec contract — half the decode+burn
        # traffic); the edit add promotes to float64 so the edited values
        # match the f64 path bit-exactly before the storage-contract cast
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            idx_plane = burn_features(
                info, feats, list(range(nf)), dtype=np.float32
            )
            m = np.isfinite(arr) & np.isfinite(idx_plane)
            if not m.any():
                continue
            fidx = idx_plane[m].astype(np.int64)
            v = arr[m].astype(np.float64) + np.take(edit_vals, fidx)
            # storage contract parity with the two-op composition: the edited
            # tile would round to float32 on encode before zonal re-decodes
            v = v.astype(np.float32).astype(np.float64)
            cnt, sums, mins, maxs = _index_partials(fidx, v, nf)
            for f_i in np.nonzero(cnt)[0]:
                zone = float(zone_vals[f_i])
                a = acc.setdefault(zone, [0, 0.0, np.inf, -np.inf])
                a[0] += int(cnt[f_i])
                a[1] += float(sums[f_i])
                a[2] = min(a[2], float(mins[f_i]))
                a[3] = max(a[3], float(maxs[f_i]))
        zones = sorted(acc)
        return pa.table(
            {
                "zone": pa.array([float(z) for z in zones], pa.float64()),
                "n": pa.array([acc[z][0] for z in zones], pa.int64()),
                "sum_z": pa.array([acc[z][1] for z in zones], pa.float64()),
                "min_z": pa.array([acc[z][2] for z in zones], pa.float64()),
                "max_z": pa.array([acc[z][3] for z in zones], pa.float64()),
            }
        )

    partial = ts.ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None)
    agg = partial.groupby("zone").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_z", alias_name="sum_z"),
        Min("min_z", alias_name="min_z"),
        Max("max_z", alias_name="max_z"),
    )

    def add_mean(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["mean_z"] = df["sum_z"] / df["n"]
        return df

    return agg.map_batches(add_mean, batch_format="pandas")


def zonal_majority(ts: TileSet, features, breaks, attribute="id"):
    """Per-zone MAJORITY (modal) class: classify each pixel by ``breaks``
    (the ``classify``/rankshow binning) and report, per rasterized zone,
    the most frequent class — the categorical zonal statistic (landcover
    majority per catchment) that complements ``zonal_stats``'s numeric
    aggregates.

    Same distributed shape as ``zonal_stats``: broadcast features, burn
    the feature-index plane once per tile, reduce (zone, bin) counts
    inside the batch via ONE ``bincount`` over ``fidx·nbins + bin``
    (O(npix)), then a tiny |zones|·|bins|-bounded ``groupby`` and a
    single-block argmax. Ties break to the SMALLEST bin (SQL
    ``row_number ... ORDER BY n DESC, bin`` parity). Columns: zone,
    maj_bin, n_maj, n_total."""
    counts = _zone_bin_counts(ts, features, breaks, attribute)

    def majority(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["zone", "n", "bin"], ascending=[True, False, True]
        ).reset_index(drop=True)
        tot = df.groupby("zone", as_index=False).agg(n_total=("n", "sum"))
        top = df.drop_duplicates("zone", keep="first")
        out = top.merge(tot, on="zone")
        return pd.DataFrame(
            {
                "zone": out["zone"].astype(np.float64),
                "maj_bin": out["bin"].astype(np.int64),
                "n_maj": out["n"].astype(np.int64),
                "n_total": out["n_total"].astype(np.int64),
            }
        )

    # |zones|·|bins| rows total: one block, one exact argmax pass
    return counts.repartition(1).map_batches(
        majority, batch_format="pandas", batch_size=None
    )


def zonal_crosstab(ts: TileSet, features, breaks, attribute="id"):
    """Zone × class contingency table (ArcGIS "Tabulate Area" /
    landcover-per-catchment crosstab): the full (zone, bin, n) counts the
    majority statistic argmaxes over — same broadcast-burn + single
    bincount partials + |zones|·|bins|-bounded groupby shape as
    ``zonal_majority``. Pure integer counts. Columns: zone, bin, n."""
    counts = _zone_bin_counts(ts, features, breaks, attribute)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "zone": df["zone"].astype(np.int64),
                "bin": df["bin"].astype(np.int64),
                "n": df["n"].astype(np.int64),
            }
        )

    return counts.map_batches(final, batch_format="pandas")


def _zone_bin_counts(ts: TileSet, features, breaks, attribute="id"):
    """Shared (zone, bin) count reduction for the categorical zonal
    statistics (majority, crosstab)."""
    ref = _features_ref(features)
    grid = ts.grid
    breaks = list(breaks)
    nbins = len(breaks) + 1

    def per_batch(batch: pa.Table) -> pa.Table:
        import ray as _ray

        feats = _ray.get(ref)
        values = np.asarray(_resolve_values(feats, attribute), dtype=np.float64)
        nf = len(feats)
        acc = np.zeros(nf * nbins, dtype=np.int64)
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            plane = burn_features(info, feats, list(range(nf)), dtype=np.float32)
            m = np.isfinite(arr) & np.isfinite(plane)
            if not m.any():
                continue
            fidx = plane[m].astype(np.int64)
            b = np.digitize(arr[m].astype(np.float64), breaks)
            acc += np.bincount(fidx * nbins + b, minlength=acc.size)
        nz = np.nonzero(acc)[0]
        f_i, b_i = nz // nbins, nz % nbins
        zone = values[f_i]
        keep = np.isfinite(zone) & (zone != grid.nodata)
        return pa.table(
            {
                "zone": pa.array(zone[keep], pa.float64()),
                "bin": pa.array(b_i[keep], pa.int64()),
                "n": pa.array(acc[nz][keep], pa.int64()),
            }
        )

    return (
        ts.ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None)
        .groupby(["zone", "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )


def hist_equalize_stats(ts: "TileSet", nbins: int = 256) -> "ray.data.Dataset":
    """Global histogram equalization (the classic image contrast remap —
    Gonzalez & Woods §3.3, public algorithm) as per-tile integer stats.

    The remap is integer-exact end to end so the SQL oracle matches
    bit-for-bit with no float rounding contract:

    - bin  = min(floor((z - zmin)/(zmax - zmin) · nbins), nbins-1) — one
      IDENTICAL double expression both sides (same operand order), then
      exact int;
    - eq(b) = (cdf(b) - cdfmin) · (nbins-1) // (n - cdfmin) — pure int64
      arithmetic on exact counts (cdfmin = the first occupied bin's cdf,
      the textbook normalization).

    Shape: pass 1 is the existing ``global_stats`` reduction (zmin/zmax);
    pass 2 bins each tile and ships per-batch (bin, cnt) partials through
    a ``groupby(bin)`` whose output is nbins rows — the driver sees ONLY
    the 256-entry histogram (result-sized by construction), builds the
    cdf/eq lookup, and broadcasts it once via ``ray.put``; pass 3 remaps
    each tile vectorized (``eq_map[bins]`` take) and emits per-tile
    integer stats. Three corpus passes total — inherent to any global
    equalization (the remap of pixel i depends on the histogram of every
    other pixel). Columns: image_id, n_valid, sum_eq, min_eq, max_eq."""
    import ray as _ray
    from ray.data.aggregate import Sum as _Sum

    grid = ts.grid
    gs = global_stats(ts)
    zmin, zmax = float(gs["min"]), float(gs["max"])
    n_valid_total = int(gs["n_valid"])
    span = zmax - zmin
    if span <= 0:  # degenerate flat raster: single bin, eq = 0 everywhere
        span = 1.0

    def _bins(arr: np.ndarray) -> np.ndarray:
        z = arr[np.isfinite(arr)].astype(np.float64)
        b = np.floor((z - zmin) / span * nbins)
        return np.minimum(b, nbins - 1).astype(np.int64)

    def hist_partial(batch: pa.Table) -> pa.Table:
        counts = np.zeros(nbins, np.int64)
        for _info, arr in iter_tiles(batch, grid, dtype=np.float32):
            counts += np.bincount(_bins(arr), minlength=nbins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {"bin": pa.array(nz, pa.int64()),
             "cnt": pa.array(counts[nz], pa.int64())}
        )

    hist = (
        ts.ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(_Sum("cnt", alias_name="cnt"))
        .to_pandas()  # nbins rows max — result-sized by construction
        .sort_values("bin")
    )
    counts = np.zeros(nbins, np.int64)
    counts[hist["bin"].to_numpy(np.int64)] = hist["cnt"].to_numpy(np.int64)
    cdf = np.cumsum(counts)
    occupied = counts > 0
    cdfmin = int(cdf[occupied][0]) if occupied.any() else 0
    denom = max(n_valid_total - cdfmin, 1)
    eq_map = (cdf - cdfmin) * (nbins - 1) // denom
    ref = _ray.put(eq_map)

    def remap(batch: pa.Table) -> pa.Table:
        emap = _ray.get(ref)
        ids, nv, se, mn, mx = [], [], [], [], []
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            eq = emap[_bins(arr)]
            if eq.size == 0:
                continue
            ids.append(info.image_id)
            nv.append(eq.size)
            se.append(int(eq.sum(dtype=np.int64)))
            mn.append(int(eq.min()))
            mx.append(int(eq.max()))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_valid": pa.array(nv, pa.int64()),
                "sum_eq": pa.array(se, pa.int64()),
                "min_eq": pa.array(mn, pa.int64()),
                "max_eq": pa.array(mx, pa.int64()),
            }
        )

    return ts.ds.map_batches(remap, batch_format="pyarrow").sort("image_id")


def rle_stats(ts: "TileSet") -> "ray.data.Dataset":
    """Per-tile run-length statistics of the binarization ``z ≥ thr``
    with ``thr = (zmin + zmax) / 2`` (global midpoint — an exact,
    order-independent double both sides, unlike a mean).

    A run is a maximal horizontal stretch of same-flag VALID cells: it
    breaks at a row change, at a NaN gap, and at a flag flip — exactly
    the islands the SQL oracle's ``gc − row_number() OVER (PARTITION BY
    tile, row, flag ORDER BY gc)`` gaps-and-islands construction yields
    (between two same-flag runs the column index advances strictly more
    than the within-flag rank, so the island key strictly increases).

    Shape: pass 1 is the existing global min/max reduction; pass 2 is one
    embarrassingly parallel vectorized pass (no exchange). Columns:
    image_id, n_valid, n_runs, max_run."""
    gs = global_stats(ts)
    thr = (float(gs["min"]) + float(gs["max"])) / 2
    grid = ts.grid

    def per_tile(batch: pa.Table) -> pa.Table:
        ids, nv, nr, mr = [], [], [], []
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            a = arr.astype(np.float64)
            mask = np.isfinite(a)
            n_valid = int(mask.sum())
            if n_valid == 0:
                continue
            rr, cc = np.nonzero(mask)
            fl = a[mask] >= thr
            brk = (
                (rr[1:] != rr[:-1])
                | (cc[1:] != cc[:-1] + 1)
                | (fl[1:] != fl[:-1])
            )
            starts = np.concatenate(([0], np.nonzero(brk)[0] + 1))
            ends = np.concatenate((starts[1:], [fl.size]))
            ids.append(info.image_id)
            nv.append(n_valid)
            nr.append(int(starts.size))
            mr.append(int((ends - starts).max()))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_valid": pa.array(nv, pa.int64()),
                "n_runs": pa.array(nr, pa.int64()),
                "max_run": pa.array(mr, pa.int64()),
            }
        )

    return ts.ds.map_batches(per_tile, batch_format="pyarrow").sort("image_id")


def otsu_threshold_stats(ts: "TileSet", nbins: int = 256) -> "ray.data.Dataset":
    """Global Otsu threshold (Otsu 1979, public algorithm) as per-tile
    integer class stats.

    Parity contract (the ``hist_equalize_stats`` recipe):

    - bin = min(floor((z - zmin)/(zmax - zmin) · nbins), nbins-1) — the
      IDENTICAL double expression as the SQL oracle;
    - the between-class objective is evaluated in the equivalent
      integer-cross-multiplied form  score(t) = a(t)² / (c0(t)·(N−c0(t)))
      with a(t) = c1(t)·N − T1·c0(t)  (c0/c1 = cumulative count / bin-sum,
      T1 = total bin-sum) — a and d are computed in EXACT Python ints on
      the 256-row driver histogram (no int64 overflow at any corpus
      size), then ONE rounding to double each before the divide, matching
      SQL's CAST(a·a AS DOUBLE)/CAST(d AS DOUBLE) on HUGEINT windows;
    - argmax tie-break: smallest bin (np first-max == ORDER BY score
      DESC, bin ASC LIMIT 1);
    - classes: fg = bin > t; per-tile sums are of BIN INDICES → pure
      int64 end to end.

    Shape: pass 1 global min/max (existing reduction), pass 2 per-batch
    histogram partials → 256-row groupby (driver sees only the
    result-sized histogram), pass 3 vectorized per-tile classification.
    Three corpus passes — inherent to any global-threshold operator.
    Columns: image_id, thresh, n_fg, n_bg, sum_bin_fg, sum_bin_bg."""
    gs = global_stats(ts)
    zmin, zmax = float(gs["min"]), float(gs["max"])
    grid = ts.grid
    span = zmax - zmin
    if span <= 0:
        span = 1.0

    def _bins(arr: np.ndarray) -> np.ndarray:
        z = arr[np.isfinite(arr)].astype(np.float64)
        b = np.floor((z - zmin) / span * nbins)
        return np.minimum(b, nbins - 1).astype(np.int64)

    def hist_partial(batch: pa.Table) -> pa.Table:
        counts = np.zeros(nbins, np.int64)
        for _info, arr in iter_tiles(batch, grid, dtype=np.float32):
            counts += np.bincount(_bins(arr), minlength=nbins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {"bin": pa.array(nz, pa.int64()),
             "cnt": pa.array(counts[nz], pa.int64())}
        )

    from ray.data.aggregate import Sum as _Sum

    hist = (
        ts.ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(_Sum("cnt", alias_name="cnt"))
        .to_pandas()  # ≤ nbins rows — result-sized by construction
        .sort_values("bin")
    )
    counts = [0] * nbins
    for b, c in zip(hist["bin"], hist["cnt"]):
        counts[int(b)] = int(c)
    n_total = sum(counts)
    t1 = sum(b * c for b, c in enumerate(counts))
    best_t, best_score = 0, -1.0
    c0 = c1 = 0
    for t in range(nbins):
        c0 += counts[t]
        c1 += t * counts[t]
        if c0 == 0 or c0 == n_total:
            continue
        a = c1 * n_total - t1 * c0  # exact int
        d = c0 * (n_total - c0)  # exact int
        score = float(a * a) / float(d)  # one rounding each, like the SQL
        if score > best_score:  # strict > == first-max tie-break
            best_score, best_t = score, t
    thresh = best_t

    def classify(batch: pa.Table) -> pa.Table:
        ids, nf, nb, sf, sb = [], [], [], [], []
        for info, arr in iter_tiles(batch, grid, dtype=np.float32):
            b = _bins(arr)
            if b.size == 0:
                continue
            fg = b > thresh
            ids.append(info.image_id)
            nf.append(int(fg.sum()))
            nb.append(int(b.size - fg.sum()))
            sf.append(int(b[fg].sum()))
            sb.append(int(b[~fg].sum()))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "thresh": pa.array([thresh] * len(ids), pa.int64()),
                "n_fg": pa.array(nf, pa.int64()),
                "n_bg": pa.array(nb, pa.int64()),
                "sum_bin_fg": pa.array(sf, pa.int64()),
                "sum_bin_bg": pa.array(sb, pa.int64()),
            }
        )

    return ts.ds.map_batches(classify, batch_format="pyarrow").sort("image_id")
