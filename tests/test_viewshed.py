"""Bounded-radius R3 viewshed: hand-computable wall/hole cases + the
vectorized-vs-scalar kernel equivalence on rough terrain."""

import numpy as np
import pyarrow as pa
import pytest

from hydro_raster_ray import fixtures
from hydro_raster_ray.sources import from_arrow_tiles
from hydro_raster_ray.stages.viewshed import r3_visibility, viewshed_stats


def _one_tile_set(ray_session, arr):
    scheme = fixtures.make_scheme(1, 1, tile_h=arr.shape[0],
                                  tile_w=arr.shape[1], ragged=False)
    t = fixtures.tiles_table(scheme)
    from hydro_raster_ray.codecs import encode

    buf = encode(arr.astype(np.float32), "raw-f32")
    t = t.set_column(t.schema.get_field_index("bytes"), "bytes",
                     pa.array([buf], pa.binary()))
    return from_arrow_tiles(t, scheme), scheme


def _cell_xy(grid, r, c):
    x = grid.xllcorner + (c + 0.5) * grid.cellsize
    y = grid.yllcorner + (grid.nrows - r - 0.5) * grid.cellsize
    return x, y


def test_viewshed_wall_blocks_behind(ray_session):
    """Flat z=0 plane, observer at (2,2) with 2 m mast, 100 m wall at
    (2,4): the wall itself is visible (nothing between at k=1 blocks:
    slope −2 < 24.5); blocked are the two cells straight behind it —
    (2,5), (2,6) sample the wall directly (slope 49 ≥ their negative
    slopes) — AND the two diagonal cells (1,6), (3,6), whose k=2 sample
    at (1.5,4)/(2.5,4) bilinearly reads HALF the wall (z=50, slope 23.3):
    the bilinear R3 spec smears blockers onto adjacent rays."""
    z = np.zeros((5, 9))
    z[2, 4] = 100.0
    ts, scheme = _one_tile_set(ray_session, z)
    g = scheme.grid
    x, y = _cell_xy(g, 2, 2)
    got = viewshed_stats(
        ts, [{"obs_id": "o", "x": x, "y": y}], radius_cells=4, mast=2.0
    ).to_pandas()
    # disk r=4 around (2,2) clipped to the 5x9 grid
    rr, cc = np.mgrid[0:5, 0:9]
    inside = ((rr - 2) ** 2 + (cc - 2) ** 2 <= 16)
    inside[2, 2] = False
    assert got["n_cells"].tolist() == [int(inside.sum())]
    # blocked: (2,5), (2,6) behind the wall + (1,6), (3,6) half-smeared
    assert got["n_visible"].tolist() == [int(inside.sum()) - 4]
    # wall (z=100) is among the visible → its height dominates the sum
    assert got["sum_vis_z"].tolist() == [100.0]


def test_viewshed_nan_hole_does_not_block(ray_session):
    """A NaN hole between observer and target poisons the bilinear sample
    (both sides of the parity contract) → it neither blocks nor counts as
    a target."""
    z = np.zeros((3, 7))
    z[1, 3] = np.nan
    ts, scheme = _one_tile_set(ray_session, z)
    g = scheme.grid
    x, y = _cell_xy(g, 1, 1)
    got = viewshed_stats(
        ts, [{"obs_id": "o", "x": x, "y": y}], radius_cells=4, mast=2.0
    ).to_pandas()
    rr, cc = np.mgrid[0:3, 0:7]
    inside = ((rr - 1) ** 2 + (cc - 1) ** 2 <= 16)
    inside[1, 1] = False
    inside[1, 3] = False  # NaN target doesn't count
    assert got["n_cells"].tolist() == [int(inside.sum())]
    # flat plane: everything else visible — incl. (1,5) THROUGH the hole
    assert got["n_visible"].tolist() == [int(inside.sum())]


def test_viewshed_nan_observer_emits_nothing(ray_session):
    z = np.zeros((3, 3))
    z[1, 1] = np.nan
    ts, scheme = _one_tile_set(ray_session, z)
    g = scheme.grid
    x, y = _cell_xy(g, 1, 1)
    got = viewshed_stats(
        ts, [{"obs_id": "o", "x": x, "y": y}], radius_cells=2
    ).to_pandas()
    assert len(got) == 0


def test_r3_kernel_matches_scalar_reference():
    """The vectorized kernel vs an independent scalar loop on rough
    deterministic terrain (sinusoidal ridges), every target checked."""
    side = 21
    R = 10
    yy, xx = np.mgrid[0:side, 0:side]
    win = 10 * np.sin(yy * 0.7) + 7 * np.cos(xx * 1.1)
    win[3, 4] = np.nan
    mast = 2.0
    tr, tc, vis = r3_visibility(win, R, R, mast, R)
    z_o = win[R, R] + mast
    got = dict(zip(zip(tr.tolist(), tc.tolist()), vis.tolist()))
    checked = 0
    for r in range(side):
        for c in range(side):
            dr, dc = r - R, c - R
            if dr * dr + dc * dc > R * R or (dr == 0 and dc == 0):
                continue
            if not np.isfinite(win[r, c]):
                assert (r, c) not in got
                continue
            dist = np.sqrt(float(dr) ** 2.0 + float(dc) ** 2.0)
            tslope = (win[r, c] - z_o) / dist
            n = max(abs(dr), abs(dc))
            expect = True
            for k in range(1, n):
                t = k / n
                fr, fc = R + dr * t, R + dc * t
                r0, c0 = int(np.floor(fr)), int(np.floor(fc))
                r1, c1 = min(r0 + 1, side - 1), min(c0 + 1, side - 1)
                wr, wc = fr - r0, fc - c0
                zi = (win[r0, c0] * (1 - wr) * (1 - wc)
                      + win[r0, c1] * (1 - wr) * wc
                      + win[r1, c0] * wr * (1 - wc)
                      + win[r1, c1] * wr * wc)
                d = np.sqrt((fr - R) ** 2 + (fc - R) ** 2)
                s = (zi - z_o) / d
                if np.isfinite(s) and s >= tslope:
                    expect = False
                    break
            assert got[(r, c)] == expect, (r, c)
            checked += 1
    assert checked > 250
