"""Distributed hillshade (halo strips + global stretch) vs the whole-array
witness — bit-exact, including one-sided gradients at global edges."""

import numpy as np
import pytest

from hydro_raster_ray import fixtures, oracle
from hydro_raster_ray.sources import from_arrow_tiles, to_array
from hydro_raster_ray.stages.hillshade import hillshade


def _f32(a):
    return a.astype(np.float32).astype(np.float64)


@pytest.fixture(scope="module")
def tileset(ray_session, small_scheme):
    return from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)


def test_hillshade_matches_witness(tileset, small_scheme):
    full = fixtures.assemble_truth(small_scheme)
    want = _f32(oracle.hillshade(full))
    got = to_array(hillshade(tileset))
    np.testing.assert_array_equal(got, want)


def test_hillshade_params_match_witness(tileset, small_scheme):
    full = fixtures.assemble_truth(small_scheme)
    want = _f32(oracle.hillshade(full, azdeg=30.0, altdeg=60.0, vert_exag=3.0))
    got = to_array(hillshade(tileset, azdeg=30.0, altdeg=60.0, vert_exag=3.0))
    np.testing.assert_array_equal(got, want)


def test_hillshade_flat_surface_no_stretch(ray_session):
    """Flat DEM: zero gradient everywhere → intensity = sin(alt) with NO
    contrast stretch applied (imax - imin <= 1e-6), then clipped."""
    scheme = fixtures.make_scheme(2, 2, tile_h=16, tile_w=16, ragged=False)
    t = fixtures.tiles_table(scheme)
    import pyarrow as pa

    from hydro_raster_ray import codecs

    rows = []
    for i in range(t.num_rows):
        h, w = t["h"][i].as_py(), t["w"][i].as_py()
        buf = codecs.encode(np.full((h, w), 7.5), "raw-f32")
        rows.append(buf)
    flat = t.set_column(t.schema.get_field_index("bytes"), "bytes",
                        pa.array(rows, pa.binary()))
    flat = flat.set_column(t.schema.get_field_index("fmt"), "fmt",
                           pa.array(["raw-f32"] * t.num_rows, pa.string()))
    ts = from_arrow_tiles(flat, scheme)
    got = to_array(hillshade(ts, altdeg=45.0))
    want = np.float64(np.float32(np.sin(np.radians(45.0))))
    np.testing.assert_array_equal(got, np.full_like(got, want))


def test_hillshade_groupby_fallback_bit_matches_broadcast(tileset, small_scheme):
    """Force the groupby-exchange fallback (zero halo budget) — must be
    bit-identical to the broadcast-halo fast path."""
    fast = to_array(hillshade(tileset))
    slow = to_array(hillshade(tileset, halo_broadcast_budget=0))
    np.testing.assert_array_equal(fast, slow)
