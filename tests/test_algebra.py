"""Two-raster map algebra (combine_tiles): alignment by image_id, cell-wise
composition, f32 codec rounding between passes, shape-mismatch rejection."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.algebra import combine_tiles


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_combine_tiles_difference_is_zero(ray_session, small_scheme):
    """A TileSet combined with itself under subtraction is exactly zero
    wherever finite (hole pattern preserved)."""
    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    out = to_array(combine_tiles(ts, ts, lambda a, b: a - b))
    full = fixtures.assemble_truth(small_scheme)
    holes = np.isnan(full)
    assert np.isnan(out[holes]).all()
    np.testing.assert_array_equal(out[~holes], 0.0)


def test_combine_tiles_twi_matches_witness(ray_session, small_scheme):
    """The TWI composition over the distributed acc/slope tiles equals the
    whole-array witness composition with f32 rounding between passes."""
    from hydro_raster_ray.stages.flowacc import flow_accumulation
    from hydro_raster_ray.stages.terrain import slope

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    full = fixtures.assemble_truth(small_scheme)

    def twi(a, s):
        return np.log((a + 1.0) / np.maximum(np.tan(np.radians(s)), 1e-6))

    got = to_array(combine_tiles(flow_accumulation(ts), slope(ts), twi))
    f32 = lambda x: x.astype(np.float32).astype(np.float64)  # noqa: E731
    want = f32(twi(f32(oracle.flow_accumulation(full)),
                   f32(oracle.slope_aspect(full)[0])))
    np.testing.assert_array_equal(got, want)


def test_combine_tiles_rejects_shape_mismatch(ray_session, small_scheme):
    from hydro_raster_ray.stages.clip import rect_clip

    ts = from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)
    # clipped tiles keep their image_id but shrink at the window border →
    # the join pairs them with full tiles and the kernel must refuse
    clipped = rect_clip(ts, fixtures.CLIP_WINDOW)
    with pytest.raises(Exception, match="same-scheme|shape mismatch"):
        combine_tiles(ts, clipped, lambda a, b: a + b).ds.materialize()
