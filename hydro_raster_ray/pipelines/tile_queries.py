"""Driver-facing tile queries: each runs a distributed pipeline over the
deterministic tiles fixture for the given scale and returns a small result
table that a DuckDB oracle (over the exploded ``pixels.parquet`` witness)
reproduces exactly — the correctness gate of `__ray_entry__`.

Float outputs are rounded (sums: 2 dec, means: 6 dec) so the order-
insensitive value-hash comparison is stable across summation orders.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Max, Min, Sum

from .. import fixtures
from ..sources.tiles import TileSet, read_tiles
from ..stages import mosaic, stats
from ..stages.clip import rect_clip
from ..stages.decode import iter_tiles
from ..stages.interpolate import idw_stats, point_interpolate, voronoi_counts
from ..stages.lines import line_cells

__all__ = ["TILE_QUERIES", "fixture_dir_for", "tiles_for"]


def fixture_dir_for(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return fixtures.ensure_fixture_dir(tag)


def tiles_for(sf_dir: str, name: str = "tiles") -> tuple[TileSet, "fixtures.TileScheme"]:
    tag = os.path.basename(os.path.normpath(sf_dir))
    d = fixtures.ensure_fixture_dir(tag)
    scheme = fixtures.make_scheme(*fixtures.SCALES.get(tag, fixtures.SCALES["sf0.01"]))
    return read_tiles(f"{d}/{name}.parquet", scheme, validate=(name == "tiles")), scheme


def _gauges(sf_dir: str) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{fixture_dir_for(sf_dir)}/gauges.parquet")
    return {
        "x": t["x"].to_numpy(),
        "y": t["y"].to_numpy(),
        "value": t["value"].to_numpy(),
        "gauge_id": t["gauge_id"].to_pylist(),
    }


def per_tile_stats(ts: TileSet):
    """Per-tile (image_id, n_px, n_valid, sum_z[2dec]) — the join-row /
    cell-assignment witness rows."""
    grid = ts.grid

    def per_batch(batch: pa.Table) -> pa.Table:
        ids, npx, nva, sums = [], [], [], []
        for info, arr in iter_tiles(batch, grid):
            ids.append(info.image_id)
            npx.append(arr.size)
            m = np.isfinite(arr)
            nva.append(int(m.sum()))
            sums.append(round(float(arr[m].sum()), 2) if m.any() else 0.0)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_px": pa.array(npx, pa.int64()),
                "n_valid": pa.array(nva, pa.int64()),
                "sum_z": pa.array(sums, pa.float64()),
            }
        )

    return ts.ds.map_batches(per_batch, batch_format="pyarrow")


# --- individual queries -----------------------------------------------------


def q_tile_fmt_summary(sf_dir: str):
    ts, _ = tiles_for(sf_dir)
    grid = ts.grid

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, list] = {}
        for info, arr in iter_tiles(batch, grid):
            a = acc.setdefault(info.fmt, [0, 0, 0])
            a[0] += 1
            a[1] += arr.size
            a[2] += int(np.isfinite(arr).sum())
        fmts = sorted(acc)
        return pa.table(
            {
                "fmt": pa.array(fmts, pa.string()),
                "n_tiles": pa.array([acc[f][0] for f in fmts], pa.int64()),
                "n_px": pa.array([acc[f][1] for f in fmts], pa.int64()),
                "n_valid": pa.array([acc[f][2] for f in fmts], pa.int64()),
            }
        )

    return (
        ts.ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(
            Sum("n_tiles", alias_name="n_tiles"),
            Sum("n_px", alias_name="n_px"),
            Sum("n_valid", alias_name="n_valid"),
        )
    )


def q_grid_global_stats(sf_dir: str):
    ts, _ = tiles_for(sf_dir)
    st = stats.global_stats(ts)
    return pd.DataFrame(
        {
            "n_px": [int(st["n_cells"])],
            "n_valid": [int(st["n_valid"])],
            "sum_z": [round(st["sum"], 2)],
            "min_z": [st["min"]],
            "max_z": [st["max"]],
            "mean_z": [round(st["mean"], 6)],
        }
    )


def q_rect_clip_stats(sf_dir: str):
    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(rect_clip(ts, fixtures.CLIP_WINDOW))


def q_zonal_stats(sf_dir: str):
    ts, scheme = tiles_for(sf_dir)
    feats = fixtures.rect_zone_features(scheme)
    zs = stats.zonal_stats(ts, feats, attribute="id")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "zone": df["zone"].astype(np.int64),
                "n": df["n"].astype(np.int64),
                "sum_z": df["sum_z"].round(2),
                "min_z": df["min_z"],
                "max_z": df["max_z"],
            }
        )

    return zs.map_batches(final, batch_format="pandas")


def q_zonal_majority(sf_dir: str):
    """Per-zone modal class (categorical zonal statistic): rankshow
    binning + rasterized zones + one (zone, bin) count shuffle."""
    ts, scheme = tiles_for(sf_dir)
    feats = fixtures.rect_zone_features(scheme)
    zm = stats.zonal_majority(ts, feats, fixtures.CLASSIFY_BREAKS,
                              attribute="id")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["zone"] = df["zone"].astype(np.int64)
        return df

    return zm.map_batches(final, batch_format="pandas")


def q_viewshed(sf_dir: str):
    """Bounded-radius multi-observer R3 viewshed (gauges as towers, R=12,
    2 m mast): per-observer disk gather → vectorized line-of-sight; the
    witness is an independent SCALAR per-sample loop over the assembled
    truth grid (fixtures._ensure_viewshed_witness)."""
    from ..stages.viewshed import viewshed_stats

    ts, _ = tiles_for(sf_dir)
    g = _gauges(sf_dir)
    observers = [
        {"obs_id": gid, "x": x, "y": y}
        for gid, x, y in zip(g["gauge_id"], g["x"], g["y"])
    ]
    return viewshed_stats(ts, observers, radius_cells=12, mast=2.0)


def q_cost_distance(sf_dir: str):
    """Distributed cost distance from the gauge cells over the
    ``z − zmin + 1`` cost surface (iterative tile relaxation with
    border-ring driver coupling); witness = scalar heapq Dijkstra on the
    assembled grid — bit-exact by the left-associated path-sum contract
    (fixtures._ensure_costdist_witness)."""
    from ..stages.costdist import cost_distance_stats

    ts, _ = tiles_for(sf_dir)
    g = _gauges(sf_dir)
    return cost_distance_stats(ts, list(zip(g["x"], g["y"])))


def q_least_cost_path(sf_dir: str):
    """Least-cost path from the most remote reachable cell down to a
    gauge source (steepest descent over the converged cost-distance
    field, lazy per-tile re-solves along the route); witness = the same
    walk on the scalar-Dijkstra field."""
    from ..stages.costdist import least_cost_path

    ts, _ = tiles_for(sf_dir)
    g = _gauges(sf_dir)
    return least_cost_path(ts, list(zip(g["x"], g["y"])))


def q_zonal_crosstab(sf_dir: str):
    """Zone × class contingency counts (Tabulate-Area): full (zone, bin)
    table under the rankshow breaks — the categorical complement the
    majority statistic argmaxes over."""
    ts, scheme = tiles_for(sf_dir)
    feats = fixtures.rect_zone_features(scheme)
    return stats.zonal_crosstab(ts, feats, fixtures.CLASSIFY_BREAKS,
                                attribute="id")


def q_voronoi_counts(sf_dir: str):
    ts, _ = tiles_for(sf_dir)
    vc = voronoi_counts(ts, _gauges(sf_dir))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_cells"] = df["n_cells"].astype(np.int64)
        df["sum_z"] = df["sum_z"].round(2)
        return df

    return vc.map_batches(final, batch_format="pandas")


def q_idw_mean(sf_dir: str):
    ts, _ = tiles_for(sf_dir)
    return idw_stats(ts, _gauges(sf_dir))


def q_resample_stats(sf_dir: str):
    ts, _ = tiles_for(sf_dir)
    rs = mosaic.grid_resample_nearest(ts, 7.5)
    st = stats.global_stats(rs)
    return pd.DataFrame(
        {
            "n_px": [int(st["n_cells"])],
            "n_valid": [int(st["n_valid"])],
            "sum_z": [round(st["sum"], 2)],
            "min_z": [st["min"]],
            "max_z": [st["max"]],
        }
    )


def q_phash_dedup(sf_dir: str):
    ts, _ = tiles_for(sf_dir, "tiles_dup")
    kept = mosaic.dedup_exact(ts)
    return kept.ds.select_columns(["phash", "image_id"])


def q_caption_stats(sf_dir: str):
    """Caption-metadata audit over the ``input_hint`` caption column:
    parse cellsize/CRS out of each caption, verify the embedded tile id
    matches ``image_id`` (the per-row verbatim-carry gate as a QUERY), and
    reduce to per-(cellsize, crs) counts. The payload column is never
    read — pure column-pruned metadata scan."""
    import ray.data

    d = fixtures.ensure_fixture_dir(os.path.basename(os.path.normpath(sf_dir)))
    ds = ray.data.read_parquet(
        f"{d}/tiles.parquet", columns=["image_id", "caption"]
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        cs = df["caption"].str.extract(r"cellsize=([0-9.]+)", expand=False)
        crs = df["caption"].str.extract(r"crs=(\S+)", expand=False)
        tid = df["caption"].str.extract(r"DEM tile (\S+) ", expand=False)
        out = pd.DataFrame(
            {
                "cellsize": cs.astype(np.float64),
                "crs": crs,
                "n": np.int64(1),
                "n_id_ok": (tid == df["image_id"]).astype(np.int64),
            }
        ).groupby(["cellsize", "crs"], as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby(["cellsize", "crs"])
        .aggregate(
            Sum("n", alias_name="n"), Sum("n_id_ok", alias_name="n_id_ok")
        )
    )


def q_pack_shards(sf_dir: str):
    """WebDataset-style shard packing of the tile payload stream (ordered
    byte prefix-sum over image_id order); SQL oracle is the window SUM of
    octet_length over the same order."""
    ts, _ = tiles_for(sf_dir)
    return mosaic.pack_shards(ts)


def q_phash_near_dups(sf_dir: str):
    """Image near-dup groups by phash Hamming distance ≤ 3: 4×16-bit band
    LSH (pigeonhole recall = 1), star edges via aggregate(Min) + hash
    join, popcount verify, distributed CC. Input is the near-dup fixture
    (dup table + deterministic bit-flipped rows); only (image_id, phash)
    is ever read — payloads never move."""
    import ray.data

    d = fixtures.ensure_fixture_dir(os.path.basename(os.path.normpath(sf_dir)))
    ds = ray.data.read_parquet(
        f"{d}/tiles_near.parquet", columns=["image_id", "phash"]
    )
    return mosaic.phash_near_dups(ds)


def q_classify_hist(sf_dir: str):
    ts, _ = tiles_for(sf_dir)
    classified = stats.classify(ts, fixtures.CLASSIFY_BREAKS)
    grid = classified.grid

    def partial(batch: pa.Table) -> pa.Table:
        counts = np.zeros(len(fixtures.CLASSIFY_BREAKS) + 1, dtype=np.int64)
        for _info, arr in iter_tiles(batch, grid):
            v = arr[np.isfinite(arr)].astype(np.int64)
            counts += np.bincount(v, minlength=counts.size)
        bins = np.arange(counts.size, dtype=np.int64)
        return pa.table({"bin": pa.array(bins), "n": pa.array(counts)})

    return (
        classified.ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )


def q_tile_topk(sf_dir: str):
    ts, _ = tiles_for(sf_dir)
    return mosaic.top_k_tiles(ts, 5, stat="max")


def _mosaic_inputs(sf_dir: str):
    d = fixture_dir_for(sf_dir)
    schemes = fixtures.mosaic_schemes()
    return [
        read_tiles(f"{d}/mosaic{i}.parquet", s) for i, s in enumerate(schemes)
    ]


def q_mosaic_combine_stats(sf_dir: str):
    combined = mosaic.combine_mosaic(_mosaic_inputs(sf_dir))
    st = stats.global_stats(combined)
    return pd.DataFrame(
        {
            "n_valid": [int(st["n_valid"])],
            "sum_z": [round(st["sum"], 2)],
            "min_z": [st["min"]],
            "max_z": [st["max"]],
        }
    )


def q_mosaic_skew_stats(sf_dir: str):
    """Hot-cell-salting path: merge a 12-layer overlapping stack with the
    two-level salted combine forced on (salt_width=4 → 3 prio-range salts
    per target cell). Oracle: arg_max(z, li) NaN-skip overlay over the
    per-layer pixel witness."""
    from ..sources import from_arrow_tiles

    layers = fixtures.skew_stack_layers()
    tsets = [from_arrow_tiles(t, s) for s, t, _ in layers]
    merged = mosaic.merge_into(
        tsets, fixtures.skew_stack_target(len(layers)), salt_width=4
    )
    st = stats.global_stats(merged)
    return pd.DataFrame(
        {
            "n_valid": [int(st["n_valid"])],
            "sum_z": [round(st["sum"], 2)],
            "min_z": [st["min"]],
            "max_z": [st["max"]],
        }
    )


def q_merge_stats(sf_dir: str):
    inputs = _mosaic_inputs(sf_dir)
    # input 2 overlaps input 0 (inputs 0/1 merely abut) → real overwrite path
    merged = mosaic.merge_into([inputs[2]], inputs[0])
    st = stats.global_stats(merged)
    return pd.DataFrame(
        {
            "n_valid": [int(st["n_valid"])],
            "sum_z": [round(st["sum"], 2)],
            "min_z": [st["min"]],
            "max_z": [st["max"]],
        }
    )


def q_line_cells(sf_dir: str):
    """Polyline walk + value extraction (oracle: witness parquet from the
    whole-array walk at fixture time)."""
    ts, scheme = tiles_for(sf_dir)
    return line_cells(ts, fixtures.line_fixture(scheme))


def q_resample_bilinear(sf_dir: str):
    """Halo-exchange bilinear resample summary (engine-defined kernel; no
    SQL oracle — exactness covered by the whole-array oracle in pytest)."""
    from .resample_shim import resample_stats_bilinear

    return resample_stats_bilinear(sf_dir)


def q_channel_surface(sf_dir: str):
    """Line-to-surface bathymetry composition (rows-only check)."""
    from .. import fixtures as fx
    from .channel import line_to_surface

    ts, scheme = tiles_for(sf_dir)
    b0, b1, xs = fx.sections_fixture(scheme)
    surf = line_to_surface(ts, xs, b0, b1, method="idw")
    return per_tile_stats(surf)


def q_remove_block(sf_dir: str):
    """Overhead-block removal composition (rows-only check)."""
    from .. import fixtures as fx
    from .channel import remove_block

    ts, scheme = tiles_for(sf_dir)
    feats = [fx.rect_zone_features(scheme)[1]]
    return per_tile_stats(remove_block(ts, feats))


def q_to_int_hist(sf_dir: str):
    """to_int rounding: histogram of rounded values by sign bucket. SQL
    oracle: DuckDB round() (half-away) vs np.round (half-even) differ ONLY
    at exact .5 values, which the continuous fixture never hits."""
    from ..stages.decode import to_int_tiles

    ts, _ = tiles_for(sf_dir)
    rounded = to_int_tiles(ts)
    grid = rounded.grid

    def partial(batch):
        import pyarrow as _pa

        neg = pos = zero = 0
        s = 0.0
        for _info, arr in iter_tiles(batch, grid):
            v = arr[np.isfinite(arr)]
            neg += int((v < 0).sum())
            pos += int((v > 0).sum())
            zero += int((v == 0).sum())
            s += float(v.sum())
        return _pa.table({"neg": [neg], "pos": [pos], "zero": [zero], "s": [s]})

    agg = (
        rounded.ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .aggregate(Sum("neg", alias_name="neg"), Sum("pos", alias_name="pos"),
                   Sum("zero", alias_name="zero"), Sum("s", alias_name="s"))
    )
    return pd.DataFrame({"neg": [int(agg["neg"])], "pos": [int(agg["pos"])],
                         "zero": [int(agg["zero"])],
                         "sum_round": [round(agg["s"], 1)]})


def q_vectorize(sf_dir: str):
    """Raster→vector: classified mosaic → stitched connected components
    (classify FUSED into the labeling decode pass; exactness vs an
    independent BFS oracle in pytest + the witness parquet)."""
    from ..stages.vectorize import classify_pre, vectorize_components

    ts, _ = tiles_for(sf_dir)
    return vectorize_components(ts, pre=classify_pre([0.0]))


def q_sample_tiles(sf_dir: str):
    """Deterministic 1-in-3 sample by md5(image_id) (SQL-reproducible)."""
    ts, _ = tiles_for(sf_dir)
    return mosaic.sample_tiles(ts, m=3, k=0).ds.select_columns(["image_id", "phash"])


def q_tile_set_ops(sf_dir: str):
    """intersect/except over a deterministic split: sampled ∩ all and
    all ∖ sampled row counts + ids (SQL-reproducible via the same hash)."""
    ts, _ = tiles_for(sf_dir)
    sampled = mosaic.sample_tiles(ts, m=3, k=0)
    inter = mosaic.intersect_tiles(ts, sampled)
    exc = mosaic.except_tiles(ts, sampled)
    import pandas as pd

    a = inter.ds.select_columns(["image_id"]).to_pandas()
    a["side"] = "intersect"
    b = exc.ds.select_columns(["image_id"]).to_pandas()
    b["side"] = "except"
    return pd.concat([a, b], ignore_index=True)


def q_reproject_affine(sf_dir: str):
    """Nearest-resampling warp to a 15°-rotated CRS (``Raster.reproject``
    parity path); per-tile stats vs the whole-array witness."""
    from ..stages.reproject import AffineTransform, reproject

    ts, scheme = tiles_for(sf_dir)
    ext = scheme.grid.extent
    cx, cy = 0.5 * (ext[0] + ext[1]), 0.5 * (ext[2] + ext[3])
    fwd = AffineTransform.rotation(15.0, cx, cy)
    warped = reproject(ts, fwd, fwd.inverse(), scheme.grid.cellsize, crs="rot15")
    return per_tile_stats(warped)


def q_reproject_tmerc(sf_dir: str):
    """Real-CRS warp: BNG metres → OSGB36 geographic degrees via the
    pure-numpy ellipsoidal transverse Mercator (EPSG:27700 constants,
    ``Raster.py:773`` sample CRS); per-tile stats vs the whole-array
    witness."""
    from ..stages.reproject import bng_tmerc, reproject

    ts, _ = tiles_for(sf_dir)
    warped = reproject(
        ts, bng_tmerc.inverse, bng_tmerc.forward, 1e-4, crs="osgb36-geo"
    )
    return per_tile_stats(warped)


def q_reproject_utm(sf_dir: str):
    """Projected→projected warp through geographic coordinates: BNG metres
    → UTM zone 30N metres via composed transverse-Mercator transforms (the
    ``Raster.py:695-733`` arbitrary-EPSG flow); per-tile stats vs the
    whole-array witness."""
    from ..stages.reproject import bng_tmerc, compose, reproject, utm_tmerc

    ts, scheme = tiles_for(sf_dir)
    utm = utm_tmerc(30)
    warped = reproject(
        ts,
        compose(utm.forward, bng_tmerc.inverse),
        compose(bng_tmerc.forward, utm.inverse),
        scheme.grid.cellsize,
        crs="utm30n",
    )
    return per_tile_stats(warped)


def q_reproject_epsg_itm(sf_dir: str):
    """Registry-driven warp by EPSG code: BNG → Irish TM (EPSG:2157, a
    code the pre-registry dispatch raised on) via ``reproject_epsg`` —
    the reference's ``Raster.reproject(dst_crs)`` API shape over the
    parameter tables; per-tile stats vs the whole-array witness."""
    from ..stages.reproject import reproject_epsg

    ts, scheme = tiles_for(sf_dir)
    warped = reproject_epsg(ts, 27700, 2157, scheme.grid.cellsize)
    return per_tile_stats(warped)


def q_reproject_lcc(sf_dir: str):
    """Projected→projected warp into the Lambert-conformal-conic family:
    BNG metres → Lambert-93 metres (EPSG:2154 projection constants,
    Snyder §15 ellipsoidal series) composed through geographic
    coordinates; per-tile stats vs the whole-array witness."""
    from ..stages.reproject import bng_tmerc, compose, lambert93, reproject

    ts, scheme = tiles_for(sf_dir)
    warped = reproject(
        ts,
        compose(lambert93.forward, bng_tmerc.inverse),
        compose(bng_tmerc.forward, lambert93.inverse),
        scheme.grid.cellsize,
        crs="lambert93",
    )
    return per_tile_stats(warped)


def q_hillshade_stats(sf_dir: str):
    """Distributed hillshade (halo strips + global contrast stretch) —
    per-tile stats vs the whole-array witness ``oracle.hillshade``."""
    from ..stages.hillshade import hillshade

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(hillshade(ts))


def q_twi_stats(sf_dir: str):
    """Topographic wetness index ``ln((acc+1) / max(tan(slope), 1e-6))`` —
    the classic two-raster terrain composition (Beven & Kirkby 1979,
    public literature), built from the engine's own flow-accumulation and
    slope TileSets via the generic ``combine_tiles`` map-algebra join.
    Witness composes the whole-array acc/slope witnesses through the
    identical expression (f32 codec rounding mirrored between passes)."""
    from ..stages.algebra import combine_tiles
    from ..stages.flowacc import flow_accumulation
    from ..stages.terrain import slope

    ts, _ = tiles_for(sf_dir)
    acc = flow_accumulation(ts)
    sl = slope(ts)

    def twi(a: np.ndarray, s: np.ndarray) -> np.ndarray:
        return np.log((a + 1.0) / np.maximum(np.tan(np.radians(s)), 1e-6))

    return per_tile_stats(combine_tiles(acc, sl, twi, caption="twi"))


def q_curvature_stats(sf_dir: str):
    """Distributed Laplacian curvature (1-px halo, fixed-order central
    second difference) — per-tile stats vs ``oracle.curvature``."""
    from ..stages.terrain import curvature

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(curvature(ts))


def q_slope_stats(sf_dir: str):
    """Distributed slope (1-px halo exchange, single streaming phase) —
    per-tile stats vs the whole-array witness ``oracle.slope_aspect``."""
    from ..stages.terrain import slope

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(slope(ts))


def q_aspect_stats(sf_dir: str):
    """Distributed downslope-azimuth aspect (same halo exchange) —
    per-tile stats vs the whole-array witness ``oracle.slope_aspect``."""
    from ..stages.terrain import aspect

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(aspect(ts))


def q_media_audio(sf_dir: str):
    """Audio features over the deterministic pcm16le table (actor-pool
    decode, thin feature rows); witness applies the same formulas to a
    scalar decode of the identical payload bytes."""
    import ray.data

    from ..stages import multimodal

    ds = ray.data.from_arrow(multimodal.make_fake_audio(32))
    out = multimodal.audio_features(ds, concurrency=2, batch_size=8)

    def rnd(df):
        for c in ("rms", "peak", "zcr", "dom_freq"):
            df[c] = df[c].round(6)
        return df

    return out.map_batches(rnd, batch_format="pandas")


def q_media_audio_wav(sf_dir: str):
    """Audio features over a REAL-WAV corpus (stdlib ``wave`` container
    parse in MediaCodec — 8/16-bit PCM, stereo downmix); witness rebuilds
    the quantized samples from the generator formula and never touches
    the container (fixtures._ensure_wav_witness)."""
    import ray.data

    from ..stages import multimodal

    ds = ray.data.from_arrow(multimodal.make_fake_wavs(32))
    out = multimodal.audio_features(ds, concurrency=2, batch_size=8)

    def rnd(df):
        for c in ("rms", "peak", "zcr", "dom_freq"):
            df[c] = df[c].round(6)
        return df

    return out.map_batches(rnd, batch_format="pandas")


def q_media_audio_mulaw(sf_dir: str):
    """Audio features over a REAL G.711 mu-law corpus (vectorized
    companded decode in MediaCodec); witness rebuilds the quantized
    samples from the generator formula and compands them through an
    independently-derived scalar reference codec
    (fixtures._ensure_mulaw_witness)."""
    import ray.data

    from ..stages import multimodal

    ds = ray.data.from_arrow(multimodal.make_fake_mulaw(32))
    out = multimodal.audio_features(ds, concurrency=2, batch_size=8)

    def rnd(df):
        for c in ("rms", "peak", "zcr", "dom_freq"):
            df[c] = df[c].round(6)
        return df

    return out.map_batches(rnd, batch_format="pandas")


def q_media_frames(sf_dir: str):
    """Every-10th-frame sampling of the deterministic rawv-u8 videos
    (actor-pool byte-range seek decode); witness computes each sampled
    frame directly from the generator formula — fully independent of the
    engine's decode path."""
    import ray.data

    from ..stages import multimodal

    ds = ray.data.from_arrow(multimodal.make_fake_videos(8, 32, 32, 40))
    out = multimodal.sample_frames(ds, every_n=10, concurrency=2, batch_size=4)

    def rnd(df):
        for c in ("mean", "std"):
            df[c] = df[c].round(6)
        return df

    return out.map_batches(rnd, batch_format="pandas")


def q_media_frames_avi(sf_dir: str):
    """Every-10th-frame sampling of a REAL-AVI corpus (RIFF chunk walk,
    bottom-up DIB rows, stride padding, palette — ``avi.py``'s seek
    path); AVI is lossless so the witness computes each sampled frame
    straight from the generator formula (fixtures._ensure_avi_witness)."""
    import ray.data

    from ..stages import multimodal

    ds = ray.data.from_arrow(multimodal.make_fake_avis(8, 24, 18, 25))
    out = multimodal.sample_frames(ds, every_n=10, concurrency=2, batch_size=4)

    def rnd(df):
        for c in ("mean", "std"):
            df[c] = df[c].round(6)
        return df

    return out.map_batches(rnd, batch_format="pandas")


def q_augment_checks(sf_dir: str):
    """Per-image flip/rot90 augmentation verified by an ORIENTATION-
    SENSITIVE positional checksum (plain stats are flip-invariant); all
    three ops in one unioned Dataset vs the whole-array witness."""
    from ..stages.multimodal import augment_tiles

    ts, _ = tiles_for(sf_dir)

    def chk_fn(op):
        def chk(batch: pa.Table) -> pa.Table:
            ops_, ids, nv, cks = [], [], [], []
            for info, arr in iter_tiles(batch, ts.grid):
                h2, w2 = arr.shape
                pos = (
                    np.arange(h2, dtype=np.float64)[:, None] * w2
                    + np.arange(w2, dtype=np.float64)
                )
                m = np.isfinite(arr)
                ops_.append(op)
                ids.append(info.image_id)
                nv.append(int(m.sum()))
                cks.append(round(float((np.where(m, arr, 0.0) * pos).sum()), 2))
            return pa.table(
                {
                    "op": pa.array(ops_, pa.string()),
                    "image_id": pa.array(ids, pa.string()),
                    "n_valid": pa.array(nv, pa.int64()),
                    "chk": pa.array(cks, pa.float64()),
                }
            )

        return chk

    parts = [
        augment_tiles(ts, op).ds.map_batches(
            chk_fn(op), batch_format="pyarrow", batch_size=None
        )
        for op in ("fliplr", "flipud", "rot90")
    ]
    return parts[0].union(parts[1], parts[2])


def q_media_frame_motion(sf_dir: str):
    """Consecutive-frame motion energy + shot-cut flags over the
    deterministic rawv-u8 videos (actor-pool full-scan decode; SAD is
    exact integer arithmetic); witness computes every transition directly
    from the generator formula — independent of decode_video."""
    import ray.data

    from ..stages import multimodal

    ds = ray.data.from_arrow(multimodal.make_fake_videos(8, 32, 32, 40))
    return multimodal.frame_motion(ds, concurrency=2, batch_size=4)


def q_media_image_features(sf_dir: str):
    """Per-image statistical features (mean/std/percentiles/edge energy)
    over the fixture tiles via the multimodal actor pool; witness mirrors
    the math on the assembled truth grid."""
    from ..stages import multimodal

    ts, _ = tiles_for(sf_dir)
    out = multimodal.image_features(ts, concurrency=2)

    def rnd(df):
        for c in ("mean", "std", "p_low", "p_high"):
            df[c] = df[c].round(6)
        df["edge_energy"] = df["edge_energy"].round(4)
        return df

    return out.map_batches(rnd, batch_format="pandas")


def q_media_image_features_jpeg(sf_dir: str):
    """Per-image features over a REAL-jpeg corpus (baseline codec
    ``jpeg.py`` — Huffman + dequant + IDCT + chroma upsample in the
    decode path); witness = the same features on ``jpeg_decode`` of the
    deterministic payloads (lossy-fmt decode∘encode convention)."""
    import ray.data

    from ..stages import multimodal

    ds = ray.data.from_arrow(multimodal.make_fake_jpegs(12, 40, 32))
    out = multimodal.image_features_table(ds, concurrency=2)

    def rnd(df):
        for c in ("mean", "std", "p_low", "p_high"):
            df[c] = df[c].round(6)
        df["edge_energy"] = df["edge_energy"].round(4)
        return df

    return out.map_batches(rnd, batch_format="pandas")


def q_media_image_features_gif(sf_dir: str):
    """Per-image features over a REAL-gif corpus (variable-width LZW +
    palette + interlace decode path, ``gif.py``); GIF is lossless so the
    witness is simply the features on ``gif_decode`` of the deterministic
    payloads."""
    import ray.data

    from ..stages import multimodal

    ds = ray.data.from_arrow(multimodal.make_fake_gifs(12, 40, 32))
    out = multimodal.image_features_table(ds, concurrency=2)

    def rnd(df):
        for c in ("mean", "std", "p_low", "p_high"):
            df[c] = df[c].round(6)
        df["edge_energy"] = df["edge_energy"].round(4)
        return df

    return out.map_batches(rnd, batch_format="pandas")


def q_media_image_features_tiff(sf_dir: str):
    """Per-image features over a REAL-tiff corpus (baseline container:
    strips, LZW + PackBits + predictor, both byte orders, 8/16-bit gray
    and RGB — ``tiff.py``); TIFF is lossless so the witness computes the
    features straight from the generator-formula planes, never touching
    the codec (fixtures._ensure_tiff_witness)."""
    import ray.data

    from ..stages import multimodal

    ds = ray.data.from_arrow(multimodal.make_fake_tiffs(12, 40, 32))
    out = multimodal.image_features_table(ds, concurrency=2)

    def rnd(df):
        for c in ("mean", "std", "p_low", "p_high"):
            df[c] = df[c].round(6)
        df["edge_energy"] = df["edge_energy"].round(4)
        return df

    return out.map_batches(rnd, batch_format="pandas")


def q_media_image_features_pnm(sf_dir: str):
    """Per-image features over a REAL-pnm corpus (Netpbm P2/P3/P5/P6 —
    ASCII token/comment parsing and the 16-bit big-endian binary path,
    ``pnm.py``); lossless, witness = features on the shared formula
    planes (fixtures._ensure_pnm_witness)."""
    import ray.data

    from ..stages import multimodal

    ds = ray.data.from_arrow(multimodal.make_fake_pnms(12, 40, 32))
    out = multimodal.image_features_table(ds, concurrency=2)

    def rnd(df):
        for c in ("mean", "std", "p_low", "p_high"):
            df[c] = df[c].round(6)
        df["edge_energy"] = df["edge_energy"].round(4)
        return df

    return out.map_batches(rnd, batch_format="pandas")


def q_media_audio_spectral(sf_dir: str):
    """Framed-STFT spectral features (256-sample Hann frames, hop 128)
    over the REAL-WAV corpus — the spectrogram-shaped actor-pool stage;
    witness rebuilds samples from the generator formula and applies the
    documented STFT contract (fixtures._ensure_spectral_witness)."""
    import ray.data

    from ..stages import multimodal

    ds = ray.data.from_arrow(multimodal.make_fake_wavs(32))
    out = multimodal.audio_spectral_features(ds, concurrency=2, batch_size=8)

    def rnd(df):
        for c in ("centroid_mean", "low_frac", "mid_frac", "high_frac",
                  "rolloff85"):
            df[c] = df[c].round(6)
        return df

    return out.map_batches(rnd, batch_format="pandas")


def q_resample_methods(sf_dir: str):
    """All-methods resample summary (oracle: whole-array kernel witness)."""
    from .resample_shim import resample_methods_summary

    return resample_methods_summary(sf_dir)


def q_vectorize_rings(sf_dir: str):
    """Raster→polygon ring extraction (``Raster.vectorize`` parity):
    per-ring scalar summary (vertex count, signed shoelace area) so the
    witness comparison is hashable; coordinates covered by pytest."""
    from ..stages.vectorize import classify_pre, vectorize_polygons

    ts, _ = tiles_for(sf_dir)
    out = vectorize_polygons(ts, pre=classify_pre([0.0]))
    return out[
        ["component_id", "value", "n_cells", "ring_idx", "n_vertices", "area_cells"]
    ]


def q_knn_idw_surface(sf_dir: str):
    """kNN-IDW interpolated surface summary (oracle: whole-array witness)."""
    ts, _ = tiles_for(sf_dir)
    surf = point_interpolate(ts, _gauges(sf_dir), method="idw", k=8, concurrency=4)
    return per_tile_stats(surf)


def q_knn_idw_partitioned(sf_dir: str):
    """Partitioned (no-broadcast) exact kNN-IDW over the LARGE gauge table
    (oracle: whole-array band-search witness ``oracle.knn_idw_canonical``).
    Tiles are read geometry-only — the payload column never leaves storage."""
    import ray.data

    from ..sources.tiles import read_tiles
    from ..stages.knn_join import knn_idw_partitioned

    d = fixture_dir_for(sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir))
    scheme = fixtures.make_scheme(*fixtures.SCALES.get(tag, fixtures.SCALES["sf0.01"]))
    ts = read_tiles(
        f"{d}/tiles.parquet", scheme, columns=["w", "h", "fmt", "caption"]
    )
    gauges = ray.data.read_parquet(f"{d}/gauges_large.parquet")
    surf = knn_idw_partitioned(ts, gauges, k=8, power=2.0)
    return per_tile_stats(surf)


def q_linear_interp_surface(sf_dir: str):
    """griddata-linear parity: Delaunay barycentric gauge interpolation
    (NaN outside the hull); per-tile stats vs the whole-array witness."""
    ts, _ = tiles_for(sf_dir)
    surf = point_interpolate(ts, _gauges(sf_dir), method="linear", concurrency=4)
    return per_tile_stats(surf)


def q_flow_dir_stats(sf_dir: str):
    """D8 flow direction (8-connected halo with corner pixels) — per-tile
    stats vs the whole-array witness ``oracle.flow_dir_d8``."""
    from ..stages.terrain import flow_dir

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(flow_dir(ts))


def q_fill_pits_stats(sf_dir: str):
    """Single-cell pit fill (8-connected corner halo) — per-tile stats vs
    the whole-array witness ``oracle.fill_pits``."""
    from ..stages.terrain import fill_pits

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(fill_pits(ts))


def q_flow_acc_stats(sf_dir: str):
    """Distributed D8 flow accumulation (Barnes-style tile contraction:
    haloed local pass → driver border solve → resolved second pass) —
    per-tile stats vs the whole-array witness ``oracle.flow_accumulation``."""
    from ..stages.flowacc import flow_accumulation

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(flow_accumulation(ts))


def q_stream_stats(sf_dir: str):
    """Stream-network extraction (flow accumulation ≥ 50 upstream cells →
    0/1/NaN channel mask) — per-tile stats vs the whole-array witness."""
    from ..stages.flowacc import stream_mask

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(stream_mask(ts, threshold=50.0))


def q_strahler_stats(sf_dir: str):
    """Strahler stream order over the accumulation-threshold network
    (stream-forest extraction → driver descending-z order sweep →
    vectorized broadcast lookup) — per-tile stats vs the whole-array
    witness ``oracle.strahler``."""
    from ..stages.flowacc import strahler

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(strahler(ts, threshold=50.0))


def q_flow_length_stats(sf_dir: str):
    """Downstream D8 flow-path length (exact integer hop-count
    contraction, value n_s + n_d·√2) — per-tile stats vs the whole-array
    witness ``oracle.flow_length``."""
    from ..stages.flowacc import flow_length

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(flow_length(ts))


def q_fill_depressions_stats(sf_dir: str):
    """Distributed depression filling (Barnes-style spill-graph
    contraction: per-tile Kruskal spill graphs → driver minimax Dijkstra
    from the ocean → per-tile event-sweep fill). The fixture surface has
    no depressions, so the query first carves deterministic ones
    (``oracle.carve_depressions`` — the same elementwise arithmetic the
    witness applies whole-array); per-tile stats vs the whole-array
    Priority-Flood witness ``oracle.fill_depressions``."""
    from .. import oracle
    from ..stages.decode import map_tiles
    from ..stages.depressions import fill_depressions

    ts, _ = tiles_for(sf_dir)
    g = ts.grid
    carved = map_tiles(
        ts,
        lambda arr, info: oracle.carve_depressions(
            arr, info.gr0, info.gc0, g.nrows, g.ncols
        ),
        lossless=True,
    )
    return per_tile_stats(fill_depressions(carved))


def q_basin_stats(sf_dir: str):
    """Distributed D8 basin (watershed) delineation — per-tile stats of the
    raw-f64 label plane vs the whole-array witness ``oracle.basin_labels``
    (labels are global pit cell ids, exact only in f64)."""
    from ..stages.basins import basin_labels

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(basin_labels(ts))


def q_basin_sizes(sf_dir: str):
    """Exact per-basin cell counts (fused pass-2 partial counts → one
    small groupby) vs the witness's whole-array ``np.unique`` counts."""
    from ..stages.basins import basin_sizes

    ts, _ = tiles_for(sf_dir)
    return basin_sizes(ts)


def q_tile_png16_stats(sf_dir: str):
    """Compressed-storage transcode: every tile re-encoded as ``png16``
    (real pure-stdlib PNG container, ``png.py``), decoded back through the
    standard tile path, per-tile stats. Oracle: ``witness_png16.parquet`` —
    a scalar u16-quantization reproduction that never touches the PNG code,
    so container encode/decode bugs cannot cancel out."""
    from ..stages.decode import transcode

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(transcode(ts, "png16"))


def q_s2_cells(sf_dir: str):
    """Real S2 index over tile footprints (the north rule's named H3/S2
    mechanism; ``s2.py``): tile centers → BNG inverse → lng/lat → S2 leaf →
    level-14 ancestor; per-cell tile counts + deterministic representative.
    Metadata-only — payload ``bytes`` never leave the read. Oracle:
    ``witness_s2_cells.parquet`` from the independent scalar curve walk
    (``s2.leaf_scalar``)."""
    from .. import s2
    from ..stages.reproject import bng_tmerc

    ts, scheme = tiles_for(sf_dir)
    g = scheme.grid
    level = 14

    def partial(batch: pa.Table) -> pa.Table:
        gr0 = batch["gr0"].to_numpy(zero_copy_only=False).astype(np.float64)
        gc0 = batch["gc0"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        xc = g.xllcorner + (gc0 + w / 2.0) * g.cellsize
        yc = g.yllcorner + (g.nrows - gr0 - h / 2.0) * g.cellsize
        lon, lat = bng_tmerc.inverse(xc, yc)
        cell = s2.parent(s2.lnglat_to_leaf(lon, lat), level)
        ids = batch["image_id"].to_numpy(zero_copy_only=False)
        # per-batch partial: count + min image_id per cell
        order = np.argsort(cell, kind="stable")
        u, start, cnt = np.unique(cell[order], return_index=True, return_counts=True)
        rep = np.minimum.reduceat(ids[order], start)
        return pa.table(
            {
                "s2_cell": pa.array(u, pa.uint64()),
                "n_tiles": pa.array(cnt.astype(np.int64)),
                "min_tile": pa.array(rep, pa.string()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell_token": pa.array(
                    s2.token(batch["s2_cell"].to_numpy(zero_copy_only=False)),
                    pa.string(),
                ),
                "n_tiles": batch["n_tiles"],
                "min_tile": batch["min_tile"],
            }
        )

    meta = ts.ds.select_columns(["image_id", "gr0", "gc0", "h", "w"])
    agg = (
        meta.map_batches(partial, batch_format="pyarrow")
        .groupby("s2_cell")
        .aggregate(Sum("n_tiles", alias_name="n_tiles"), Min("min_tile", alias_name="min_tile"))
    )
    return agg.map_batches(finish, batch_format="pyarrow")


def q_s2_footprint_cover(sf_dir: str):
    """Multi-cell S2 assignment per tile FOOTPRINT (not just the center):
    each tile's projected extent is sampled on a 3×3 boundary-inclusive
    grid, every sample maps to its level-14 cell, and per-tile duplicates
    collapse before the count. Exact here because a level-14 cell
    (~600 m edge) cannot fit strictly between 160 m sample spacings nor
    inside a 320 m tile; callers with finer levels densify the sample
    grid. The spatial-join shape: one tile → several cells → shuffle key.
    Oracle: ``witness_s2_cover.parquet`` (scalar curve walk)."""
    from .. import s2
    from ..stages.reproject import bng_tmerc

    ts, scheme = tiles_for(sf_dir)
    g = scheme.grid
    level = 14
    S = 3
    f = np.linspace(0.0, 1.0, S)

    def partial(batch: pa.Table) -> pa.Table:
        gr0 = batch["gr0"].to_numpy(zero_copy_only=False).astype(np.float64)
        gc0 = batch["gc0"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = gr0.size
        x0 = g.xllcorner + gc0 * g.cellsize
        y1 = g.yllcorner + (g.nrows - gr0) * g.cellsize
        # n×S×S sample lattice over each footprint
        xs = (x0[:, None] + (w * g.cellsize)[:, None] * f[None, :])[:, :, None]
        ys = (y1[:, None] - (h * g.cellsize)[:, None] * f[None, :])[:, None, :]
        X = np.broadcast_to(xs, (n, S, S)).ravel()
        Y = np.broadcast_to(ys, (n, S, S)).ravel()
        lon, lat = bng_tmerc.inverse(X, Y)
        cell = s2.parent(s2.lnglat_to_leaf(lon, lat), level)
        tile_of = np.repeat(np.arange(n, dtype=np.int64), S * S)
        # per-tile dedupe, then per-cell partial counts
        key = np.stack([tile_of, cell.view(np.int64)], axis=1)
        uniq = np.unique(key, axis=0)
        cells_u = uniq[:, 1].view(np.uint64)
        u, cnt = np.unique(cells_u, return_counts=True)
        return pa.table(
            {
                "s2_cell": pa.array(u, pa.uint64()),
                "n_tiles": pa.array(cnt.astype(np.int64)),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell_token": pa.array(
                    s2.token(batch["s2_cell"].to_numpy(zero_copy_only=False)),
                    pa.string(),
                ),
                "n_tiles": batch["n_tiles"],
            }
        )

    meta = ts.ds.select_columns(["gr0", "gc0", "h", "w"])
    agg = (
        meta.map_batches(partial, batch_format="pyarrow")
        .groupby("s2_cell")
        .aggregate(Sum("n_tiles", alias_name="n_tiles"))
    )
    return agg.map_batches(finish, batch_format="pyarrow")


def q_focal_mean_stats(sf_dir: str):
    """3×3 NaN-aware focal mean (GIS focal statistics) on the shared halo
    machinery — per-tile stats vs the whole-array witness
    ``oracle.focal(·, 'mean')``."""
    from ..stages.focal import focal_stats

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(focal_stats(ts, "mean"))


def q_focal_range_stats(sf_dir: str):
    """3×3 focal range (max − min; the order-free minmax path) — per-tile
    stats vs ``oracle.focal(·, 'range')``."""
    from ..stages.focal import focal_stats

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(focal_stats(ts, "range"))


def q_focal_median_stats(sf_dir: str):
    """3×3 NaN-aware focal median (the order-statistic smoother — the
    despeckle filter of the focal family) — per-tile stats vs
    ``oracle.focal(·, 'median')``."""
    from ..stages.focal import focal_stats

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(focal_stats(ts, "median"))


def q_morph_open_stats(sf_dir: str):
    """Grayscale morphological OPENING (3×3 erode→dilate, the despeckle
    operator; ``stages/morph.py``) — two chained halo passes, per-tile
    stats. Morphology is pure order statistics (values are SELECTED, not
    computed), so the oracle is a genuinely independent SQL reproduction:
    two chained 3×3 neighbor self-joins over the pixel witness, exact
    min/max with no rounding epsilon."""
    from ..stages.morph import morph

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(morph(ts, "open"))


def q_dist_transform_hist(sf_dir: str):
    """Bounded Chebyshev distance transform (distance in cells to the
    nearest ``z > 50`` source, exact up to 4 min-plus sweeps = 4 halo
    exchanges; ``stages/distance.py``) — histogram of distances over the
    valid cells, unreached mapped to -1. Distances are small integers:
    bit-exact, independently reproduced in SQL as 4 chained 3×3
    neighbor self-joins (equi-join on an offsets table)."""
    from ..stages.decode import iter_tiles as _it
    from ..stages.distance import distance_transform

    ts, _ = tiles_for(sf_dir)
    out = distance_transform(ts, threshold=50.0, iters=4)
    grid = out.grid

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[int, int] = {}
        for _info, arr in _it(batch, grid):
            v = arr[~np.isnan(arr)]
            d = np.where(np.isinf(v), -1.0, v).astype(np.int64)
            u, cnt = np.unique(d, return_counts=True)
            for k, c in zip(u.tolist(), cnt.tolist()):
                acc[k] = acc.get(k, 0) + c
        ks = sorted(acc)
        return pa.table(
            {
                "dist": pa.array(ks, pa.int64()),
                "n_cells": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    return (
        out.ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dist")
        .aggregate(Sum("n_cells", alias_name="n_cells"))
    )


def q_gauss_blur_stats(sf_dir: str):
    """5×5 binomial Gaussian blur (two chained 3×3 [1,2,1]⊗[1,2,1]/16
    halo passes; ``stages/blur.py``) — per-tile stats. Weighted
    convolution with a FIXED left-to-right accumulation order and
    integer/power-of-two weights, so every cell is bit-reproducible by
    the identically-parenthesized SQL expression (with the same CAST to
    FLOAT between passes — the f32 tile storage). The oracle is a
    genuinely independent SQL reproduction: two chained pivoted 3×3
    neighbor self-joins over the pixel witness evaluating the same
    weighted expression."""
    from ..stages.blur import binomial_blur

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(binomial_blur(ts, passes=2))


def q_sobel_stats(sf_dir: str):
    """3×3 Sobel gradient magnitude (strict-window halo pass;
    ``stages/sobel.py``) — per-tile stats. Fixed left-associative
    integer-weight accumulation + correctly-rounded sqrt, so every cell
    is bit-reproducible by the identically-parenthesized SQL expression
    (with the same CAST to FLOAT — the f32 tile storage). The oracle is
    a genuinely independent SQL reproduction: one pivoted 3×3 neighbor
    self-join over the pixel witness evaluating the same gx/gy/magnitude
    expressions."""
    from ..stages.sobel import sobel_magnitude

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(sobel_magnitude(ts))


def q_contour_stats(sf_dir: str):
    """Marching-squares contour statistics at levels (-50, 0, 50) — the
    iso-line operator as a data product (``stages/contour.py``). The
    oracle is a genuinely independent SQL reproduction: a 2×2 pixel
    self-join over the decoded-truth witness walking the identical
    crossing/pairing geometry — not a witness-file SELECT."""
    from ..stages.contour import contour_stats

    ts, _ = tiles_for(sf_dir)
    return contour_stats(ts)


def q_rle_stats(sf_dir: str):
    """Per-tile run-length stats of the global-midpoint binarization;
    the oracle is an independent SQL gaps-and-islands reproduction
    (``stages/stats.rle_stats`` documents the island-key equivalence)."""
    from ..stages.stats import rle_stats

    ts, _ = tiles_for(sf_dir)
    return rle_stats(ts)


def q_haversine_nn(sf_dir: str):
    """Geodesic nearest-neighbor join: each gauge's closest other gauge
    by great-circle (haversine) distance on a deterministic lat/lon
    derived affinely from the projected coordinates. The small side is
    broadcast once (``ray.put``) and each batch computes a vectorized
    full-matrix haversine — the brute-force pattern that IS the scale
    baseline for a result-sized k=1 join (the S2-bucketed join is the
    partitioned path). Identical double formula both sides, distances in
    km (ulp ≪ the 6-decimal round); tie-break (dist, neighbor id).
    Columns: gauge_id, nn_id, dist_km."""
    import ray as _ray
    import ray.data

    tag = os.path.basename(os.path.normpath(sf_dir))
    fdir = fixtures.ensure_fixture_dir(tag)
    ga = ray.data.read_parquet(os.path.join(fdir, "gauges.parquet"))
    all_g = ga.to_pandas().sort_values("gauge_id")  # gauge table: small side
    lat_all = ((all_g["y"].to_numpy(np.float64) - 556000.0) / 5000.0)
    lon_all = ((all_g["x"].to_numpy(np.float64) - 340000.0) / 3000.0)
    ref = _ray.put(
        (all_g["gauge_id"].to_numpy(dtype=object), lat_all, lon_all))
    pi = np.pi

    def nn(df):
        gids, blat, blon = _ray.get(ref)
        lat1 = ((df["y"].to_numpy(np.float64) - 556000.0) / 5000.0)
        lon1 = ((df["x"].to_numpy(np.float64) - 340000.0) / 3000.0)
        p1 = lat1 * pi / 180
        p2 = blat * pi / 180
        dphi = (blat[None, :] - lat1[:, None]) * pi / 180
        dlmb = (blon[None, :] - lon1[:, None]) * pi / 180
        h = (
            np.sin(dphi / 2) ** 2
            + np.cos(p1)[:, None] * np.cos(p2)[None, :]
            * np.sin(dlmb / 2) ** 2
        )
        d = 2 * 6371.0 * np.arcsin(np.sqrt(h))
        me = df["gauge_id"].to_numpy(dtype=object)[:, None] == gids[None, :]
        d[me] = np.inf
        j = np.argmin(d, axis=1)  # first-min == smallest id (gids sorted)
        return pd.DataFrame(
            {
                "gauge_id": df["gauge_id"].to_numpy(dtype=object),
                "nn_id": gids[j],
                "dist_km": np.round(d[np.arange(len(j)), j], 6),
            }
        )

    return ga.map_batches(nn, batch_format="pandas").sort("gauge_id")


def q_otsu_threshold(sf_dir: str):
    """Global Otsu binarization threshold + per-tile class stats, integer
    exact end to end; the oracle reproduces the whole bin→histogram→
    between-class-argmax→classify chain in SQL
    (``stages/stats.otsu_threshold_stats`` documents the parity contract)."""
    from ..stages.stats import otsu_threshold_stats

    ts, _ = tiles_for(sf_dir)
    return otsu_threshold_stats(ts)


def q_hist_equalize(sf_dir: str):
    """Global histogram equalization (256-bin, integer-exact remap) —
    per-tile stats of the equalized raster; the oracle reproduces the
    whole bin→cdf→remap chain in SQL (``stages/stats.hist_equalize_stats``
    docstring has the shared contract)."""
    from ..stages.stats import hist_equalize_stats

    ts, _ = tiles_for(sf_dir)
    return hist_equalize_stats(ts)


def q_grid_percentiles(sf_dir: str):
    """Exact corpus-wide order statistics (p10/p50/p90) via the
    multi-rank distributed histogram refinement
    (``stats.exact_quantiles`` — one corpus pass per refinement level for
    ALL quantiles, leaves pulled and selected exactly). DuckDB
    ``quantile_disc`` semantics: the result is an actual data element at
    1-based rank ``ceil(p·n)``, so the oracle matches bit-for-bit."""
    from ..stages.stats import exact_quantiles

    ts, _ = tiles_for(sf_dir)
    q = exact_quantiles(ts, ps=(0.1, 0.5, 0.9))
    return pa.table(
        {"p10": [q[0.1]], "p50": [q[0.5]], "p90": [q[0.9]]}
    )


def q_s2_gauge_join(sf_dir: str):
    """S2-bucketed spatial join — the north-star metric's join shape end
    to end: gauges and tile footprints are keyed by their level-14 S2
    cell, a native hash join on the cell id produces candidate pairs,
    and an exact bbox filter removes the false positives the coarse
    cells admit. The SQL oracle is the PURE GEOMETRIC bbox join (tile
    extents from the pixels witness, no S2 anywhere), so an incomplete
    footprint cover or a bad curve walk surfaces as a missing pair —
    a hash mismatch, not a tautology. Tile side is metadata-only (the
    payload ``bytes`` column never leaves storage); gauge side is the
    LARGE table (120k rows at sf0.01 — the too-big-to-broadcast
    stand-in), so the join is a genuine distributed exchange, not a
    broadcast. Core: ``stages/spatial_join.s2_gauge_join``. Columns:
    image_id, n_gauges."""
    import ray.data

    from ..stages.spatial_join import s2_gauge_join

    ts, _scheme = tiles_for(sf_dir)
    d = fixture_dir_for(sf_dir)
    gauges = ray.data.read_parquet(
        f"{d}/gauges_large.parquet", columns=["x", "y"]
    )
    return s2_gauge_join(ts, gauges)


def q_lbp_hist(sf_dir: str):
    """3×3 Local Binary Pattern texture codes (strict-window halo pass;
    ``stages/lbp.py``) — corpus-wide code histogram. Codes are pure
    comparisons on the stored values (no arithmetic), so every cell is
    bit-reproducible; the oracle is a genuinely INDEPENDENT SQL
    reproduction: one weighted 3×3 neighbor self-join over the pixel
    witness evaluating the same eight >= comparisons."""
    from ..stages.decode import iter_tiles as _it
    from ..stages.lbp import lbp_codes

    ts, _ = tiles_for(sf_dir)
    out = lbp_codes(ts)
    grid = out.grid

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[int, int] = {}
        for _info, arr in _it(batch, grid):
            v = arr[~np.isnan(arr)].astype(np.int64)
            u, cnt = np.unique(v, return_counts=True)
            for k, c in zip(u.tolist(), cnt.tolist()):
                acc[k] = acc.get(k, 0) + c
        ks = sorted(acc)
        return pa.table(
            {
                "code": pa.array(ks, pa.int64()),
                "n_cells": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    return (
        out.ds.map_batches(partial, batch_format="pyarrow")
        .groupby("code")
        .aggregate(Sum("n_cells", alias_name="n_cells"))
    )


def q_ncc_stats(sf_dir: str):
    """3×3 NCC template matching (strict-window halo pass;
    ``stages/ncc.py``) — per-tile stats of the correlation plane. Fixed
    left-associative double arithmetic with integer template weights, so
    every cell is bit-reproducible by the identically-parenthesized SQL
    expression; the oracle is a genuinely INDEPENDENT SQL reproduction:
    one pivoted 3×3 neighbor self-join evaluating the same
    mean/num/den/sqrt chain."""
    from ..stages.ncc import ncc_match

    ts, _ = tiles_for(sf_dir)
    return per_tile_stats(ncc_match(ts))


def q_pyramid_stats(sf_dir: str, levels: int = 3):
    """COG-style 2× overview pyramid (``stages/pyramid.py``) — per
    (level, tile) stats across ``levels`` chained reductions. Each
    level's exact fixed-order mean contract is bit-reproducible in SQL
    (module docstring), so the oracle is a genuinely INDEPENDENT chained
    group-and-pivot reproduction over the pixel witness — not a witness
    SELECT. Each level materializes (corpus/4^k — geometric, < corpus/3
    total) to feed both its stats pass and the next level without
    re-running the exchange."""
    from ..stages.pyramid import pyramid_level

    cur, _ = tiles_for(sf_dir)
    out = None
    for lv in range(1, levels + 1):
        nxt = pyramid_level(cur)
        nxt = TileSet(ds=nxt.ds.materialize(), grid=nxt.grid)

        def tag(batch: pa.Table, _lv=lv) -> pa.Table:
            return batch.append_column(
                "level", pa.array([_lv] * batch.num_rows, pa.int64())
            )

        st = per_tile_stats(nxt).map_batches(tag, batch_format="pyarrow")
        out = st if out is None else out.union(st)
        cur = nxt
    return out


TILE_QUERIES = {
    "tile_fmt_summary": q_tile_fmt_summary,
    "s2_gauge_join": q_s2_gauge_join,
    "grid_percentiles": q_grid_percentiles,
    "focal_mean_stats": q_focal_mean_stats,
    "focal_range_stats": q_focal_range_stats,
    "focal_median_stats": q_focal_median_stats,
    "morph_open_stats": q_morph_open_stats,
    "gauss_blur_stats": q_gauss_blur_stats,
    "sobel_stats": q_sobel_stats,
    "pyramid_stats": q_pyramid_stats,
    "lbp_hist": q_lbp_hist,
    "ncc_stats": q_ncc_stats,
    "dist_transform_hist": q_dist_transform_hist,
    "s2_cell_counts": q_s2_cells,
    "s2_footprint_cover": q_s2_footprint_cover,
    "tile_png16_stats": q_tile_png16_stats,
    "grid_global_stats": q_grid_global_stats,
    "rect_clip_stats": q_rect_clip_stats,
    "zonal_stats": q_zonal_stats,
    "zonal_majority": q_zonal_majority,
    "phash_near_dups": q_phash_near_dups,
    "tile_pack_shards": q_pack_shards,
    "caption_stats": q_caption_stats,
    "voronoi_counts": q_voronoi_counts,
    "idw_mean": q_idw_mean,
    "resample_stats": q_resample_stats,
    "phash_dedup": q_phash_dedup,
    "classify_hist": q_classify_hist,
    "tile_topk": q_tile_topk,
    "mosaic_combine_stats": q_mosaic_combine_stats,
    "merge_stats": q_merge_stats,
    "mosaic_skew_stats": q_mosaic_skew_stats,
    "line_cells": q_line_cells,
    "knn_idw_surface": q_knn_idw_surface,
    "knn_idw_partitioned": q_knn_idw_partitioned,
    "linear_interp_surface": q_linear_interp_surface,
    "channel_surface": q_channel_surface,
    "remove_block": q_remove_block,
    "to_int_hist": q_to_int_hist,
    "resample_bilinear": q_resample_bilinear,
    "resample_methods": q_resample_methods,
    "reproject_affine": q_reproject_affine,
    "reproject_tmerc": q_reproject_tmerc,
    "reproject_utm": q_reproject_utm,
    "reproject_lcc": q_reproject_lcc,
    "reproject_epsg_itm": q_reproject_epsg_itm,
    "hillshade_stats": q_hillshade_stats,
    "contour_stats": q_contour_stats,
    "hist_equalize_stats": q_hist_equalize,
    "otsu_threshold_stats": q_otsu_threshold,
    "rle_stats": q_rle_stats,
    "haversine_nn": q_haversine_nn,
    "zonal_crosstab": q_zonal_crosstab,
    "viewshed_coverage": q_viewshed,
    "cost_distance": q_cost_distance,
    "least_cost_path": q_least_cost_path,
    "slope_stats": q_slope_stats,
    "curvature_stats": q_curvature_stats,
    "twi_stats": q_twi_stats,
    "aspect_stats": q_aspect_stats,
    "flow_dir_stats": q_flow_dir_stats,
    "fill_pits_stats": q_fill_pits_stats,
    "flow_acc_stats": q_flow_acc_stats,
    "basin_stats": q_basin_stats,
    "basin_sizes": q_basin_sizes,
    "fill_depressions_stats": q_fill_depressions_stats,
    "stream_stats": q_stream_stats,
    "flow_length_stats": q_flow_length_stats,
    "strahler_stats": q_strahler_stats,
    "media_audio_features": q_media_audio,
    "media_audio_features_wav": q_media_audio_wav,
    "media_audio_features_mulaw": q_media_audio_mulaw,
    "media_frame_sample_avi": q_media_frames_avi,
    "media_frame_sample": q_media_frames,
    "media_frame_motion": q_media_frame_motion,
    "augment_checks": q_augment_checks,
    "media_image_features": q_media_image_features,
    "media_image_features_jpeg": q_media_image_features_jpeg,
    "media_image_features_gif": q_media_image_features_gif,
    "media_image_features_tiff": q_media_image_features_tiff,
    "media_image_features_pnm": q_media_image_features_pnm,
    "media_audio_spectral": q_media_audio_spectral,
    "sample_tiles": q_sample_tiles,
    "tile_set_ops": q_tile_set_ops,
    "vectorize": q_vectorize,
    "vectorize_rings": q_vectorize_rings,
}
