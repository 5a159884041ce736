"""Hot-cell salting: the two-level merge must equal the single-level paste
bit-for-bit, in both NaN-skip (merge) and whole-block (combine_raster) modes.

The fixture is the skew shape the salting exists for: L layers that ALL
overlap one small coastal strip, so every target cell in the strip receives
fragments from every layer (one hot tkey group per cell in the single-level
plan)."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages import mosaic

N_LAYERS = 20


@pytest.fixture(scope="module")
def stacked_layers(ray_session):
    layers = fixtures.skew_stack_layers(N_LAYERS)
    tsets = [from_arrow_tiles(t, s) for s, t, _ in layers]
    return layers, tsets


def _oracle(layers, nan_skip: bool) -> np.ndarray:
    n = len(layers)
    t = fixtures.SKEW_TILE
    want = np.full((t, t + n - 1), np.nan)
    for i, (_s, _t, truth) in enumerate(layers):
        dest = want[:, i : i + t]
        if nan_skip:
            m = ~np.isnan(truth)
            dest[m] = truth[m]
        else:
            dest[:, :] = truth
    return want


def test_salted_merge_nan_skip_matches_oracle(stacked_layers):
    layers, tsets = stacked_layers
    target = fixtures.skew_stack_target(len(layers))
    got = to_array(mosaic.merge_into(tsets, target, salt_width=4))
    np.testing.assert_array_equal(got, _oracle(layers, nan_skip=True))


def test_salted_merge_equals_single_level(stacked_layers):
    layers, tsets = stacked_layers
    target = fixtures.skew_stack_target(len(layers))
    salted = to_array(mosaic.merge_into(tsets, target, salt_width=4))
    single = to_array(mosaic.merge_into(tsets, target, salt_width=10_000))
    np.testing.assert_array_equal(salted, single)


def test_salted_block_paste_matches_oracle(stacked_layers):
    """paste_blocks mode: NaN cells DO overwrite, so the salted path must
    carry the touched-mask (not NaN-skip) through the final combine."""
    layers, tsets = stacked_layers
    target = fixtures.skew_stack_target(len(layers))
    got = to_array(
        mosaic.merge_into(tsets, target, paste_blocks=True, salt_width=4)
    )
    np.testing.assert_array_equal(got, _oracle(layers, nan_skip=False))


def test_salt_threshold_is_plan_time(stacked_layers):
    """≤ salt_width layers keeps the single-level plan (no skey column pass);
    the two plans agree on a small stack regardless."""
    layers, tsets = stacked_layers
    target = fixtures.skew_stack_target(len(layers))
    a = to_array(mosaic.merge_into(tsets[:3], target, salt_width=8))
    b = to_array(mosaic.merge_into(tsets[:3], target, salt_width=1))
    np.testing.assert_array_equal(a, b)


def test_merge_stack_single_table_matches_merge_into(stacked_layers):
    """merge_stack (one georeferenced-tile table, layer column = prio) must
    equal the N-Dataset merge_into bit-for-bit, salted and unsalted."""
    import ray

    layers, tsets = stacked_layers
    target = fixtures.skew_stack_target(len(layers))
    table = fixtures.skew_stack_table(len(layers))
    want = to_array(mosaic.merge_into(tsets, target, salt_width=4))
    got_salted = to_array(
        mosaic.merge_stack(
            ray.data.from_arrow(table), target, n_layers=len(layers), salt_width=4
        )
    )
    got_single = to_array(
        mosaic.merge_stack(
            ray.data.from_arrow(table), target, n_layers=len(layers),
            salt_width=10_000,
        )
    )
    np.testing.assert_array_equal(got_salted, want)
    np.testing.assert_array_equal(got_single, want)


def test_salted_merge_with_base_layer(stacked_layers):
    """An existing-target base layer (prio −1) must land in salt 0 and be
    overwritten by every origin layer."""
    layers, tsets = stacked_layers
    target_ts = mosaic.merge_into(
        tsets[:1], fixtures.skew_stack_target(len(layers))
    )
    got = to_array(mosaic.merge_into(tsets[1:], target_ts, salt_width=4))
    np.testing.assert_array_equal(got, _oracle(layers, nan_skip=True))
