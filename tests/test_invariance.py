"""Partitioning invariance: identical output regardless of block layout.

The reference's determinism criterion (SURVEY.md §4: parallelism-
invariance). One Ray session cannot host two cpu counts, so the stand-in
with identical coverage is block-layout invariance: the same pipeline over
1-block vs many-block inputs must produce byte-identical assembled output
(all nondeterminism in Ray surfaces as block/batch boundary differences).
"""

import numpy as np
import pytest
import ray.data

from hydro_raster_ray import fixtures
from hydro_raster_ray.sources import TileSet, from_arrow_tiles, to_array
from hydro_raster_ray.stages import mosaic, stats
from hydro_raster_ray.stages.clip import rect_clip
from hydro_raster_ray.stages.rasterize import apply_features


def _ts_with_blocks(scheme, n_blocks):
    table = fixtures.tiles_table(scheme)
    ts = from_arrow_tiles(table, scheme)
    return TileSet(ds=ts.ds.repartition(n_blocks), grid=ts.grid)


@pytest.mark.parametrize("blocks", [1, 7])
def test_ep1_block_invariance(ray_session, small_scheme, blocks):
    ts = _ts_with_blocks(small_scheme, blocks)
    feats = fixtures.rect_zone_features(small_scheme)
    out = apply_features(
        rect_clip(ts, fixtures.CLIP_WINDOW),
        feats,
        lambda a, p, i: np.where(np.isnan(p), a, a + p),
        attribute="adjust_val",
    )
    got = to_array(out)
    if not hasattr(test_ep1_block_invariance, "_ref"):
        test_ep1_block_invariance._ref = got
    else:
        np.testing.assert_array_equal(got, test_ep1_block_invariance._ref)


def test_mosaic_block_invariance(ray_session):
    schemes = fixtures.mosaic_schemes()
    outs = []
    for blocks in (1, 5):
        inputs = [
            TileSet(
                ds=from_arrow_tiles(fixtures.tiles_table(s), s).ds.repartition(blocks),
                grid=s.grid,
            )
            for s in schemes
        ]
        outs.append(to_array(mosaic.combine_mosaic(inputs)))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_median_block_invariance(ray_session, small_scheme):
    vals = [
        stats.exact_median(_ts_with_blocks(small_scheme, b)) for b in (1, 6)
    ]
    assert vals[0] == vals[1]
