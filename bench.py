#!/usr/bin/env python
"""Benchmark harness: headline tile pipelines + training-data pipelines.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "tiles_per_sec": ..., "px_per_sec": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32),
GRAFT_BENCH_TILES (default 36 → 36x36 tiles of 256x256 = 85M px).

``--scaling`` reruns the bench in fresh subprocesses at N and 4N CPUs
(``GRAFT_SCALE_LO``, default 8 → 8 vs 32; the recorded runs use 2 vs 8 to
leave the 32-CPU box headroom) on the same input and reports throughput at
both plus the scaling efficiency — the sandbox substitute for the N vs 4N
node cluster criterion (BASELINE.md). Scaling numbers are only valid with
NOTHING else running on the box. The pixel pipelines carry a fixed ~0.5-1 s
serial driver term (parquet metadata + plan + executor spin-up, measured by
task-timeline instrumentation) that Amdahl-caps small-input efficiency: run
``GRAFT_BENCH_TILES=72 python bench.py --scaling`` to amortize it at 4× the
input (the regime the 100 TB target actually operates in). Every run also
records host loadavg and /proc/stat busy fraction so cross-round deltas can
be read against box contention.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_T = int(os.environ.get("GRAFT_BENCH_TILES", "36"))
BENCH_DIR = f"/tmp/graft_bench/tiles_{BENCH_T}x{BENCH_T}_256"


def _cpu_jiffies() -> tuple[int, int, int]:
    """(busy, total, steal) jiffies from /proc/stat — host-load accounting so
    cross-round bench deltas can be read against actual box contention
    (BASELINE.md documents ~40% session-to-session drift; this VM also sees
    bursty hypervisor STEAL from co-tenants — measured ~9% cumulative with
    spikes that alone explain 2-7x stage swings between same-code runs)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals) - idle, sum(vals), steal


def run_bench() -> dict:
    import numpy as np
    import ray

    load_start = list(os.getloadavg())
    jb0, jt0, js0 = _cpu_jiffies()

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    logging.getLogger("ray").setLevel(logging.ERROR)
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from hydro_raster_ray.runtime import tune_context

    tune_context()

    import hydro_raster_ray
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(hydro_raster_ray)

    from hydro_raster_ray import fixtures
    from hydro_raster_ray.sources import read_tiles, write_tiles
    from hydro_raster_ray.stages import mosaic, stats
    from hydro_raster_ray.stages.clip import rect_clip
    from hydro_raster_ray.stages.interpolate import point_interpolate
    from hydro_raster_ray.stages.rasterize import apply_features
    from hydro_raster_ray.text import ann, ops

    scheme = fixtures.write_bench_tiles(BENCH_DIR, BENCH_T, BENCH_T, 256, 256)
    n_tiles = scheme.n_tiles
    n_px = scheme.grid.nrows * scheme.grid.ncols

    # Warmup (untimed): spawns the worker pool, imports the stack in every
    # worker, warms the page cache — so timed stages measure compute+shuffle,
    # not process startup or first disk read.
    _warm_feats = fixtures.rect_zone_features(scheme)
    _warm = apply_features(
        read_tiles(BENCH_DIR, scheme),
        _warm_feats,
        lambda arr, plane, info: arr,
        attribute="adjust_val",
    )
    stats.global_stats(_warm)

    timings: dict[str, float] = {}
    # GRAFT_BENCH_ONLY=ep1_edit_dem[,stage...] limits the timed stages (the
    # --scaling runs time only the headline)
    only_env = os.environ.get("GRAFT_BENCH_ONLY", "")
    only = set(only_env.split(",")) if only_env else None

    ext = scheme.grid.extent
    window = (
        ext[0] + 0.1 * (ext[1] - ext[0]) + 2.0,
        ext[0] + 0.9 * (ext[1] - ext[0]) + 2.0,
        ext[2] + 0.1 * (ext[3] - ext[2]) + 2.0,
        ext[2] + 0.9 * (ext[3] - ext[2]) + 2.0,
    )
    feats = fixtures.bench_zone_features(scheme, 64)

    def _edited():
        ts = read_tiles(BENCH_DIR, scheme)
        clipped = rect_clip(ts, window)
        return apply_features(
            clipped,
            feats,
            lambda arr, plane, info: np.where(np.isnan(plane), arr, arr + plane),
            attribute="adjust_val",
        )

    # EP1 (headline): read -> rect_clip -> rasterize 64-feature landcover ->
    # combine edit -> zonal aggregate (compute+shuffle; the write variant is
    # separate because /tmp is one disk and a big write does not scale with
    # CPUs)
    def ep1_edit_dem():
        # fused single-pass edit + zonal (one decode, one burn per tile)
        ts = read_tiles(BENCH_DIR, scheme)
        clipped = rect_clip(ts, window)
        stats.apply_and_zonal(clipped, feats).to_pandas()

    def ep1_write():
        write_tiles(_edited(), "/tmp/graft_bench/ep1_out")

    # EP2: mosaic shuffle — paste the grid onto a half-tile-offset target
    def ep2_mosaic():
        ts = read_tiles(BENCH_DIR, scheme)
        target = fixtures.make_scheme(
            BENCH_T, BENCH_T, 256, 256, ragged=False,
            xll=fixtures.XLL + 128 * fixtures.CELLSIZE,
            yll=fixtures.YLL + 128 * fixtures.CELLSIZE,
        )
        stats.global_stats(mosaic.merge_into([ts], target))

    # EP2b: hot-cell skew — 64 layers of one 512² tile each, all stacked on
    # one strip (every target cell receives ~64 fragments), as ONE
    # georeferenced-tile table (merge_stack). salt_width=8 → 8 prio-range
    # salts: the per-cell paste fans out across the pool instead of
    # serializing in one task per hot cell.
    def ep2b_mosaic_skew():
        import ray as _ray

        table = fixtures.skew_stack_table(64, tile=512)
        target = fixtures.skew_stack_target(64, tile=512, target_tile=64)
        # from_arrow yields ONE block; spread the scatter like a parquet read
        ds = _ray.data.from_arrow(table).repartition(32)
        merged = mosaic.merge_stack(ds, target, n_layers=64, salt_width=8)
        stats.global_stats(merged)

    # EP3: gauge interpolation, 10k gauges -> bucket-index actor pool;
    # the pool must leave CPUs for the upstream read stage (a pool holding
    # every CPU starves the read and the pipeline deadlocks). The payload
    # column is pruned AT THE READ: interpolation uses tile geometry only
    # (Raster.py:424 semantics), so the corpus bytes never leave storage
    def ep3_gauge_interp():
        ts = read_tiles(
            BENCH_DIR, scheme, columns=["w", "h", "fmt", "caption", "phash"]
        )
        gt = fixtures.gauges_table(scheme, 10_000)
        g = {k: gt[k].to_numpy(zero_copy_only=False) for k in ("x", "y", "value")}
        surf = point_interpolate(
            ts, g, method="nearest", concurrency=max(2, NUM_CPUS - 2)
        )
        stats.global_stats(surf)

    # EP3b: partitioned (no-broadcast) exact kNN-IDW — 200k gauges hash-
    # partitioned with ring replication (stages/knn_join.py); tiles read
    # geometry-only so the corpus bytes never leave storage
    def ep3b_knn_partitioned():
        import ray as _ray

        from hydro_raster_ray.stages.knn_join import knn_idw_partitioned

        ts = read_tiles(
            BENCH_DIR, scheme, columns=["w", "h", "fmt", "caption", "phash"]
        )
        gauges = _ray.data.from_arrow(
            fixtures.gauges_large_table(scheme, 200_000)
        ).repartition(max(4, NUM_CPUS // 2))
        stats.global_stats(knn_idw_partitioned(ts, gauges, k=8, power=2.0))

    # EP3c: the metric's namesake — S2-bucketed spatial join of 1M gauges
    # to tile footprints (hash join on level-14 cells + exact bbox verify);
    # tile side metadata-only, neither side broadcast
    _s2_gauge_table = fixtures.gauges_large_table(scheme, 1_000_000)

    def ep3c_s2_join():
        import ray as _ray

        from hydro_raster_ray.stages.spatial_join import s2_gauge_join

        ts = read_tiles(
            BENCH_DIR, scheme, columns=["w", "h", "fmt", "caption", "phash"]
        )
        gauges = _ray.data.from_arrow(_s2_gauge_table).repartition(
            max(4, NUM_CPUS // 2)
        )
        n = s2_gauge_join(ts, gauges).to_pandas()["n_gauges"].sum()
        assert n == 1_000_000, n  # the join partitions the gauge set

    # EP4: halo-exchange resample (sub-rectangle fragment shuffle)
    def ep4_resample():
        from hydro_raster_ray.stages.resample import resample as _resample

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(_resample(ts, 7.5, method="bilinear"))

    # EP4b: lanczos — the highest-arithmetic-intensity resample kernel;
    # the compute-dominated product pipeline for the scaling criterion
    def ep4b_resample_lanczos():
        from hydro_raster_ray.stages.resample import resample as _resample

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(_resample(ts, 7.5, method="lanczos"))

    # EP6: real-CRS warp (ellipsoidal transverse Mercator, trig per target
    # pixel) — compute-dense product pipeline, also used for scaling
    def ep6_reproject_tmerc():
        from hydro_raster_ray.stages.reproject import bng_tmerc, reproject

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(
            reproject(ts, bng_tmerc.inverse, bng_tmerc.forward, 1e-4,
                      crs="osgb36-geo")
        )

    # EP5: raster→vector with distributed cross-tile stitch (classify
    # fused into the labeling decode pass)
    def ep5_vectorize():
        from hydro_raster_ray.stages.vectorize import (
            classify_pre,
            vectorize_components,
        )

        ts = read_tiles(BENCH_DIR, scheme)
        vectorize_components(ts, pre=classify_pre([0.0]))

    # EP7: the north-rule resume gate at bench scale — run 1 writes a
    # bucket-aligned subset (what a killed run leaves: only buckets whose
    # pass finished carry manifests), run 2 resumes over the FULL input and
    # must skip every completed bucket and land the exact total row count
    def ep7_resume():
        import shutil

        from hydro_raster_ray.sources.tiles import TileSet
        from hydro_raster_ray.state.lineage import read_manifests, resumable_write

        out = "/tmp/graft_bench/ep7_resume_out"
        shutil.rmtree(out, ignore_errors=True)
        ts = read_tiles(BENCH_DIR, scheme)
        # 16 tile-cols = 4 whole level-2 Morton bucket columns
        half = TileSet(ds=ts.ds.filter(expr="tile_col < 16"), grid=ts.grid)
        r1 = resumable_write(half, out)
        r2 = resumable_write(read_tiles(BENCH_DIR, scheme), out)
        assert r2["skipped_buckets"] == r1["written_buckets"] > 0, (r1, r2)
        total = sum(m["rows"] for m in read_manifests(out))
        assert total == n_tiles, (total, n_tiles)

    # EP7b: resume across the SHUFFLE boundary (the EP2 mosaic shape) —
    # run 1 completes half the output buckets; run 2 re-runs the full
    # mosaic with resume_out_dir so fragments of completed buckets are
    # dropped BEFORE the repartition (the exchange+build is pruned, not
    # just the write), then asserts manifest hits and exact total rows
    def ep7b_resume_shuffle():
        import shutil

        from hydro_raster_ray.sources.tiles import TileSet
        from hydro_raster_ray.state.lineage import read_manifests, resumable_write

        out = "/tmp/graft_bench/ep7b_resume_out"
        shutil.rmtree(out, ignore_errors=True)
        target = fixtures.make_scheme(
            BENCH_T, BENCH_T, 256, 256, ragged=False,
            xll=fixtures.XLL + 128 * fixtures.CELLSIZE,
            yll=fixtures.YLL + 128 * fixtures.CELLSIZE,
        )
        ts = read_tiles(BENCH_DIR, scheme)
        # a killed run leaves a bucket-ALIGNED prefix of correct output
        # (manifests finalize per completed bucket): simulate it by writing
        # the even buckets of a full mosaic pass
        from hydro_raster_ray.state.lineage import bucket_of
        import pyarrow as _pa

        def even_buckets(b):
            keep = bucket_of(b["cell"].to_numpy(zero_copy_only=False)) % 2 == 0
            return b.filter(_pa.array(keep))

        merged = mosaic.merge_into([ts], target)
        half = TileSet(
            ds=merged.ds.map_batches(
                even_buckets, batch_format="pyarrow", batch_size=None
            ),
            grid=target.grid,
        )
        r1 = resumable_write(half, out)
        resumed = mosaic.merge_into([ts], target, resume_out_dir=out)
        r2 = resumable_write(resumed, out)
        assert r2["skipped_buckets"] == r1["written_buckets"] > 0, (r1, r2)
        total = sum(m["rows"] for m in read_manifests(out))
        full = mosaic.merge_into([ts], target).ds.count()
        assert total == full, (total, full)

    # EP8: slope over the bench grid — the halo-exchange gradient family
    # (stages/terrain.py), single streaming phase
    def ep8_terrain_slope():
        from hydro_raster_ray.stages.terrain import slope as _slope

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(_slope(ts))

    # EP9: D8 flow accumulation — Barnes-style tile contraction (two haloed
    # passes around a driver border solve), the hydrology-family headline
    def ep9_flowacc():
        from hydro_raster_ray.stages.flowacc import flow_accumulation

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(flow_accumulation(ts))

    # EP10: depression filling — per-tile Kruskal spill graphs, driver
    # minimax Dijkstra, reconstruction-by-erosion fill
    def ep10_filldep():
        from hydro_raster_ray.stages.depressions import fill_depressions

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(fill_depressions(ts))

    # EP15: marching-squares contour stats (haloed map + tiny groupby)
    def ep15_contour():
        from hydro_raster_ray.stages.contour import contour_stats

        ts = read_tiles(BENCH_DIR, scheme)
        contour_stats(ts).to_pandas()

    # EP16: global histogram equalization (stats + hist + remap passes)
    def ep16_histeq():
        from hydro_raster_ray.stages.stats import hist_equalize_stats

        ts = read_tiles(BENCH_DIR, scheme)
        hist_equalize_stats(ts).count()

    # EP22: global Otsu threshold (stats + hist + classify passes — the
    # same 3-pass profile as ep16 with an argmax driver step)
    def ep22_otsu():
        from hydro_raster_ray.stages.stats import otsu_threshold_stats

        ts = read_tiles(BENCH_DIR, scheme)
        otsu_threshold_stats(ts).count()

    # EP23: per-tile RLE of the midpoint binarization (stats pass + one
    # exchange-free vectorized pass)
    def ep23_rle():
        from hydro_raster_ray.stages.stats import rle_stats

        ts = read_tiles(BENCH_DIR, scheme)
        rle_stats(ts).count()

    # EP24: 1500-tower bounded-radius R3 viewshed (per-observer disk
    # gather → one groupby(obs) solve; ~3.5M line-of-sight targets)
    def ep24_viewshed():
        from hydro_raster_ray.stages.viewshed import viewshed_stats

        ts = read_tiles(BENCH_DIR, scheme)
        g = fixtures.gauges_large_table(scheme, 1500)
        observers = [
            {"obs_id": f"t{int(i):05d}", "x": float(x), "y": float(y)}
            for i, x, y in zip(
                g["gid"].to_pylist(), g["x"].to_pylist(), g["y"].to_pylist()
            )
        ]
        viewshed_stats(ts, observers, radius_cells=24).count()

    # EP25: distributed cost distance from 200 sources (iterative tile
    # relaxation + border-ring driver coupling until quiescence)
    def ep25_costdist():
        from hydro_raster_ray.stages.costdist import cost_distance_stats

        ts = read_tiles(BENCH_DIR, scheme)
        g = fixtures.gauges_large_table(scheme, 200)
        cost_distance_stats(
            ts, list(zip(g["x"].to_pylist(), g["y"].to_pylist()))
        ).count()

    # EP19: Sobel edge magnitude — single strict-window halo pass
    def ep19_sobel():
        from hydro_raster_ray.stages.sobel import sobel_magnitude

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(sobel_magnitude(ts))

    # EP20: 2x overview pyramid — three chained fragment-exchange
    # reductions, each level materialized (corpus/4^k)
    def ep20_pyramid():
        from hydro_raster_ray.sources.tiles import TileSet
        from hydro_raster_ray.stages.pyramid import pyramid_level

        cur = read_tiles(BENCH_DIR, scheme)
        for _ in range(3):
            nxt = pyramid_level(cur)
            cur = TileSet(ds=nxt.ds.materialize(), grid=nxt.grid)
        stats.global_stats(cur)

    # EP21: LBP texture codes — strict-window halo pass + code histogram
    def ep21_lbp():
        from hydro_raster_ray.stages.lbp import lbp_codes

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(lbp_codes(ts))

    # EP17: morphological opening — two chained halo passes (erode→dilate)
    # with the intermediate corpus checkpointed between them
    def ep17_morph_open():
        from hydro_raster_ray.stages.morph import morph

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(morph(ts, "open"))

    # EP18: bounded Chebyshev distance transform — seed + 4 min-plus
    # halo sweeps (the heaviest multi-sweep stencil in the suite)
    def ep18_distance():
        from hydro_raster_ray.stages.distance import distance_transform

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(distance_transform(ts, threshold=50.0, iters=4))

    # EP11: basin delineation (terminal contraction) — the fused exact
    # basin-size aggregate. NOT in the default timed list: its per-tile
    # kernels match ep9's profile (two haloed passes + border solve), and
    # the full bench must stay inside the driver's wall budget even under
    # co-tenant steal; run via GRAFT_BENCH_ONLY=ep11_basins (measured
    # 44.4 s at 21% steal — see BASELINE.md).
    def ep11_basins():
        from hydro_raster_ray.stages.basins import basin_sizes

        ts = read_tiles(BENCH_DIR, scheme)
        basin_sizes(ts).count()

    # EP12/EP13: flow length and Strahler order — same contraction profile
    # as ep9 (shared _acc_solve / halo passes) plus their driver sweeps.
    # NOT in the default timed list for the same wall-budget reason as
    # ep11; run via GRAFT_BENCH_ONLY=ep12_flowlen,ep13_strahler.
    def ep12_flowlen():
        from hydro_raster_ray.stages.flowacc import flow_length

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(flow_length(ts))

    def ep13_strahler():
        from hydro_raster_ray.stages.flowacc import strahler

        ts = read_tiles(BENCH_DIR, scheme)
        stats.global_stats(strahler(ts, threshold=500.0))

    def ep3d_s2_join_10m():
        # 10× the default gauge count so the join's ~6 s aggregator-startup
        # floor (the reason ep3c was excluded from scaling, BASELINE.md)
        # stops dominating and the 2→8 CPU efficiency measures compute.
        # The gauge table generates DISTRIBUTED (gauges_large_ds — the
        # driver build was an 11 s serial term) in 64 blocks so the S2
        # cell pass parallelizes past 8 tasks, and the join partitions
        # scale with the CPU allocation instead of the conservative
        # auto_join_partitions floor.
        from hydro_raster_ray.stages.spatial_join import s2_gauge_join

        ts = read_tiles(
            BENCH_DIR, scheme, columns=["w", "h", "fmt", "caption", "phash"]
        )
        gauges = fixtures.gauges_large_ds(scheme, 10_000_000, num_blocks=64)
        n = (
            s2_gauge_join(ts, gauges, num_partitions=max(8, NUM_CPUS))
            .to_pandas()["n_gauges"]
            .sum()
        )
        assert n == 10_000_000, n

    def ep14_twi():
        # two-raster map algebra at bench scale: flow-acc ⋈ slope on
        # image_id, ln((acc+1)/max(tan β, 1e-6)) per tile
        import numpy as _np

        from hydro_raster_ray.stages.algebra import combine_tiles
        from hydro_raster_ray.stages.flowacc import flow_accumulation
        from hydro_raster_ray.stages.terrain import slope

        ts = read_tiles(BENCH_DIR, scheme)

        def twi(a, s):
            return _np.log((a + 1.0) / _np.maximum(_np.tan(_np.radians(s)), 1e-6))

        stats.global_stats(combine_tiles(flow_accumulation(ts), slope(ts), twi))

    # documents / embeddings pipelines at the bench sf
    def doc_suite():
        ops.token_stats(SF_DIR).to_pandas()
        ops.quality_by_source(SF_DIR).to_pandas()
        ops.exact_dedup(SF_DIR).count()

    def minhash_dedup():
        ops.minhash_near_dups(SF_DIR).count()

    # df-table build + broadcast-score (the TF-IDF shape): two corpus
    # passes, vocabulary-sized shuffle only
    def doc_rarity():
        ops.rarity_scores(SF_DIR).count()

    # exact duplicated-n-gram windows (window-granular substring dedup):
    # pair emission + window-hash groupby + count join + per-doc reduce
    def doc_ngram_dedup():
        ops.ngram_dup_stats(SF_DIR).count()

    # MinHash SIGNATURE computation only (shingle split + blake2b + 64-perm
    # uint64 math, ~kB/doc memory traffic): the arithmetic-dominated real
    # pipeline stage for the scaling criterion — unlike the pixel stages it
    # is not bound by the single box's DRAM bandwidth
    def minhash_sigs():
        import pandas as _pd

        rep = int(os.environ.get("GRAFT_SIG_REPEAT", "256"))
        docs = ops.read_documents(SF_DIR, columns=["doc_id", "text"])

        def blow_up(df: _pd.DataFrame) -> _pd.DataFrame:
            # corpus sizing for the bench (like GRAFT_BENCH_TILES for the
            # pixel stages): replicate rows with distinct ids
            n = len(df)
            return _pd.DataFrame(
                {
                    "doc_id": np.concatenate(
                        [df["doc_id"].to_numpy() * rep + k for k in range(rep)]
                    ),
                    "text": np.tile(df["text"].to_numpy(), rep),
                }
            )

        def sigs(df: _pd.DataFrame) -> _pd.DataFrame:
            m = ops._minhash_matrix(df["text"], 64, 3)
            return _pd.DataFrame(
                {"doc_id": df["doc_id"].to_numpy(),
                 "sig0": m[:, 0].astype("int64")}
            )

        (
            docs.map_batches(blow_up, batch_format="pandas", batch_size=64)
            .map_batches(sigs, batch_format="pandas", batch_size=32)
            .count()
        )

    def ann_topk():
        ann.brute_force_topk(SF_DIR).to_pandas()

    # CPU-dense scaling witness (python/string compute, low memory traffic)
    def doc_quality():
        ops.quality_by_source(SF_DIR).to_pandas()

    # Scheduler probe: 512 tasks of pure register-bound compute (fixed
    # iteration count, no memory traffic). Separates the ENGINE's scaling
    # (task graph, scheduling, backpressure) from the single box's DRAM
    # bandwidth ceiling that caps the pixel pipelines.
    def sched_probe():
        import pyarrow as _pa
        import ray.data as _rd

        def work(batch):
            acc = 0
            for _ in range(30_000_000):
                acc += 1
            return _pa.table({"x": [acc]})

        # coarse tasks (~1.2 s each): task dispatch is ~5 ms/task through
        # the driver, so fine-grained tasks under-utilize high CPU counts
        _rd.range(128, override_num_blocks=128).map_batches(
            work, batch_format="pyarrow", batch_size=None
        ).count()

    stages = [
        ep1_edit_dem, ep1_write, ep2_mosaic, ep2b_mosaic_skew, ep3_gauge_interp,
        ep3b_knn_partitioned, ep3c_s2_join, ep4_resample, ep4b_resample_lanczos,
        ep5_vectorize,
        ep6_reproject_tmerc, ep7_resume, ep7b_resume_shuffle, ep8_terrain_slope,
        ep9_flowacc, ep10_filldep, ep15_contour, ep16_histeq,
        ep17_morph_open, ep18_distance, ep19_sobel, ep20_pyramid, ep21_lbp,
        ep22_otsu, ep23_rle, ep24_viewshed,
        doc_suite, minhash_dedup, doc_rarity, doc_ngram_dedup, minhash_sigs,
        ann_topk, doc_quality, sched_probe,
    ]
    # opt-in stages: same contraction profile as the listed hydrology
    # headline (ep9/ep10), kept out of the default list so the full bench
    # stays inside the driver's wall budget; reachable ONLY by naming them
    # in GRAFT_BENCH_ONLY
    opt_in = [ep11_basins, ep12_flowlen, ep13_strahler, ep14_twi,
              ep3d_s2_join_10m, ep25_costdist]
    if only is not None:
        stages = stages + [fn for fn in opt_in if fn.__name__ in only]
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    for fn in stages:
        if only is not None and fn.__name__ not in only:
            continue
        best = None
        for _ in range(repeats):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[fn.__name__] = round(best, 3)

    headline = timings.get("ep1_edit_dem", 0.0)
    jb1, jt1, js1 = _cpu_jiffies()
    out = {
        "host": {
            "loadavg_start": [round(x, 2) for x in load_start],
            "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            # busy fraction of the WHOLE box over the bench (includes the
            # bench itself; ≫ num_cpus/os.cpu_count() ⇒ foreign load)
            "cpu_busy_frac": round((jb1 - jb0) / max(jt1 - jt0, 1), 3),
            # fraction of the bench window the hypervisor gave to co-tenants;
            # >0.02 means the numbers are depressed by foreign load
            "cpu_steal_frac": round((js1 - js0) / max(jt1 - jt0, 1), 3),
        },
        "metric": "tiles/sec end-to-end spatial-join+tiling (EP1 edit-DEM: "
        "read->clip->rasterize-combine->write)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_tiles": n_tiles,
        "bench_px": n_px,
        "tiles_per_sec": round(n_tiles / headline, 1) if headline else None,
        "px_per_sec": round(n_px / headline, 0) if headline else None,
    }
    ray.shutdown()
    return out


def run_scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        # ep1 = the memory-bound headline; sched_probe = pure-compute
        # control; lanczos resample + transverse-Mercator warp = heavy
        # pixel kernels (still DRAM-bound on one box); minhash_sigs = the
        # arithmetic-dominated PRODUCT stage the ≥0.8 criterion targets;
        # ep10_filldep = the hydrology contraction (per-tile topological
        # sweeps — CPU-dense, low memory traffic). ep3c_s2_join is NOT in
        # the default scaling list: at the 1M-gauge bench size its wall is
        # dominated by hash-join aggregator startup (measured 15.6 s @2 →
        # 8.0 s @8 → 6.7 s @32 CPUs, a fixed ~6 s floor — see BASELINE.md)
        env.setdefault(
            "GRAFT_BENCH_ONLY",
            "ep1_edit_dem,sched_probe,ep4b_resample_lanczos,ep6_reproject_tmerc,"
            "minhash_sigs,ep8_terrain_slope,ep10_filldep",
        )
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = lo * 4
    r_lo = run(lo)
    r_hi = run(hi)
    effs = {
        name: round((r_lo["queries"][name] / r_hi["queries"][name]) / (hi / lo), 3)
        for name in r_lo["queries"]
        if name in r_hi["queries"]
    }
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo) if r_hi["value"] else None
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency T({lo})/({hi//lo}*T({hi}))",
                "num_cpus_lo": lo,
                "num_cpus_hi": hi,
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "tiles_per_sec_lo": r_lo["tiles_per_sec"],
                "tiles_per_sec_hi": r_hi["tiles_per_sec"],
                "scaling_efficiency": round(eff, 3) if eff else None,
                "scaling_efficiency_per_stage": effs,
                "queries_lo": r_lo["queries"],
                "queries_hi": r_hi["queries"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
