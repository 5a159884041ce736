"""Marching-squares contour stats vs an independent scalar per-cell loop
over the assembled whole array — counts exact, lengths to the rounding
contract — plus pencil cases for the saddle pairing and NODATA skipping."""

import math

import numpy as np
import pyarrow as pa
import pytest

from hydro_raster_ray import fixtures
from hydro_raster_ray.sources import from_arrow_tiles
from hydro_raster_ray.stages.contour import contour_stats


def _scalar_contour(z: np.ndarray, level: float, cs: float):
    """Independent reference: per-cell Python loop, same geometry contract
    as stages/contour.py's module docstring (NOT the same code path)."""
    n_cells = n_seg = 0
    total = 0.0
    H, W = z.shape
    for r in range(H - 1):
        for c in range(W - 1):
            z00, z01 = z[r, c], z[r, c + 1]
            z10, z11 = z[r + 1, c], z[r + 1, c + 1]
            if not all(map(math.isfinite, (z00, z01, z10, z11))):
                continue
            g = [z00 >= level, z01 >= level, z10 >= level, z11 >= level]
            ct, cr = g[0] != g[1], g[1] != g[3]
            cb, cl = g[2] != g[3], g[0] != g[2]
            pts = []
            if ct:
                pts.append(((level - z00) / (z01 - z00), 0.0))
            if cr:
                pts.append((1.0, (level - z01) / (z11 - z01)))
            if cb:
                pts.append(((level - z10) / (z11 - z10), 1.0))
            if cl:
                pts.append((0.0, (level - z00) / (z10 - z00)))
            if not pts:
                continue
            n_cells += 1
            n_seg += len(pts) // 2
            d = math.dist(pts[0], pts[1])
            if len(pts) == 4:
                d += math.dist(pts[2], pts[3])
            total += cs * d
    return n_cells, n_seg, total


@pytest.fixture(scope="module")
def tileset(ray_session, small_scheme):
    return from_arrow_tiles(fixtures.tiles_table(small_scheme), small_scheme)


def test_contour_matches_scalar_reference(tileset, small_scheme):
    full = fixtures.assemble_truth(small_scheme).astype(np.float32)
    z = full.astype(np.float64)
    cs = float(small_scheme.grid.cellsize)
    fin = z[np.isfinite(z)]
    # levels inside the small fixture's actual range so every level crosses
    levels = tuple(
        float(np.round(v, 1)) for v in np.percentile(fin, [20, 50, 80])
    )
    got = contour_stats(tileset, levels=levels).to_pandas()
    assert got["level"].tolist() == sorted(levels)
    for _, row in got.iterrows():
        nc, ns, tl = _scalar_contour(z, row["level"], cs)
        assert row["n_cells"] == nc
        assert row["n_segments"] == ns
        assert abs(row["total_len"] - tl) < 2e-3
        assert nc > 0  # the fixture must actually exercise each level


def _one_tile_set(ray_session, arr):
    scheme = fixtures.make_scheme(1, 1, tile_h=arr.shape[0],
                                  tile_w=arr.shape[1], ragged=False)
    t = fixtures.tiles_table(scheme)
    from hydro_raster_ray.codecs import encode

    buf = encode(arr.astype(np.float32), "raw-f32")
    t = t.set_column(t.schema.get_field_index("bytes"), "bytes",
                     pa.array([buf], pa.binary()))
    return from_arrow_tiles(t, scheme), scheme


def test_contour_saddle_pencil_case(ray_session):
    """2×2 saddle at level 0.5: four crossings at t=0.5, fixed pairing
    (top,right)+(bottom,left) → 2 segments of √2/2 cell units each."""
    z = np.array([[1.0, 0.0], [0.0, 1.0]])
    ts, scheme = _one_tile_set(ray_session, z)
    cs = float(scheme.grid.cellsize)
    got = contour_stats(ts, levels=(0.5,)).to_pandas()
    assert got["n_cells"].tolist() == [1]
    assert got["n_segments"].tolist() == [2]
    assert abs(got["total_len"][0] - round(cs * math.sqrt(2.0), 3)) < 1e-9


def test_contour_nan_corner_skips_cell(ray_session):
    """A NaN corner invalidates BOTH cells that read it; the clean cell
    still contributes one distance-1 segment (vertical line at t=0.5)."""
    z = np.array([[0.0, 1.0, np.nan], [0.0, 1.0, 5.0]])
    ts, _ = _one_tile_set(ray_session, z)
    got = contour_stats(ts, levels=(0.5,)).to_pandas()
    assert got["n_cells"].tolist() == [1]
    assert got["n_segments"].tolist() == [1]


def test_hist_equalize_pencil_case(ray_session):
    """Textbook 2×2 equalization, nbins=4: values [0,0,1,3] over range
    [0,3] bin to [0,0,1,3] (v=3 clamps into the last bin); cdf=[2,3,3,4],
    cdfmin=2 → eq(b)=(cdf-2)*3//2 = [0,1,1,3] → remapped [0,0,1,3]."""
    z = np.array([[0.0, 0.0], [1.0, 3.0]])
    ts, _ = _one_tile_set(ray_session, z)
    from hydro_raster_ray.stages.stats import hist_equalize_stats

    got = hist_equalize_stats(ts, nbins=4).to_pandas()
    assert got["n_valid"].tolist() == [4]
    assert got["sum_eq"].tolist() == [0 + 0 + 1 + 3]
    assert got["min_eq"].tolist() == [0]
    assert got["max_eq"].tolist() == [3]


def test_hist_equalize_flat_raster(ray_session):
    """Degenerate flat raster: zero span → every pixel lands in bin 0 and
    equalizes to 0 (no div-by-zero)."""
    z = np.full((2, 3), 7.0)
    ts, _ = _one_tile_set(ray_session, z)
    from hydro_raster_ray.stages.stats import hist_equalize_stats

    got = hist_equalize_stats(ts).to_pandas()
    assert got["sum_eq"].tolist() == [0]
    assert got["min_eq"].tolist() == [0]
    assert got["max_eq"].tolist() == [0]


def test_otsu_pencil_case(ray_session):
    """Hand-computed, nbins=4: values [0,0,0,3,3,3,1,0] bin to
    counts={0:4, 1:1, 3:3}, N=8, T1=10. Scores: t=0 → (-40)²/16 = 100,
    t=1 → (-42)²/15 = 117.6 (t=2 duplicates t=1 through the empty bin,
    t=3 has an empty foreground) → thresh=1; fg = the three 3s."""
    z = np.array([[0.0, 0.0, 0.0, 3.0], [3.0, 3.0, 1.0, 0.0]])
    ts, _ = _one_tile_set(ray_session, z)
    from hydro_raster_ray.stages.stats import otsu_threshold_stats

    got = otsu_threshold_stats(ts, nbins=4).to_pandas()
    assert got["thresh"].tolist() == [1]
    assert got["n_fg"].tolist() == [3]
    assert got["n_bg"].tolist() == [5]
    assert got["sum_bin_fg"].tolist() == [9]
    assert got["sum_bin_bg"].tolist() == [1]


def test_otsu_tie_breaks_to_smallest_bin(ray_session):
    """Perfectly symmetric two-cluster data scores identically for every
    cut between the clusters (t=0,1,2 all 36.0); first-max must pick the
    smallest bin — the documented ORDER BY score DESC, bin ASC contract."""
    z = np.array([[0.0, 0.0], [3.0, 3.0]])
    ts, _ = _one_tile_set(ray_session, z)
    from hydro_raster_ray.stages.stats import otsu_threshold_stats

    got = otsu_threshold_stats(ts, nbins=4).to_pandas()
    assert got["thresh"].tolist() == [0]
    assert got["n_fg"].tolist() == [2]
    assert got["sum_bin_fg"].tolist() == [6]


def test_rle_pencil_case(ray_session):
    """Hand case, thr=(−1+1)/2=0: row0 [1,1,NaN,1] → runs 2+1 (NaN
    splits), row1 [−1,−1,1,1] → runs 2+2 → 4 runs, max 2, 7 valid."""
    z = np.array([[1.0, 1.0, np.nan, 1.0], [-1.0, -1.0, 1.0, 1.0]])
    ts, _ = _one_tile_set(ray_session, z)
    from hydro_raster_ray.stages.stats import rle_stats

    got = rle_stats(ts).to_pandas()
    assert got["n_valid"].tolist() == [7]
    assert got["n_runs"].tolist() == [4]
    assert got["max_run"].tolist() == [2]


def test_rle_flag_boundary_is_half_open(ray_session):
    """z == thr belongs to the upper class (>= thr): [0,0,1,-1] with
    thr=0 → runs [0,0,1] (all >= 0) then [-1] → 2 runs, max 3."""
    z = np.array([[0.0, 0.0, 1.0, -1.0]])
    ts, _ = _one_tile_set(ray_session, z)
    from hydro_raster_ray.stages.stats import rle_stats

    got = rle_stats(ts).to_pandas()
    assert got["n_runs"].tolist() == [2]
    assert got["max_run"].tolist() == [3]
