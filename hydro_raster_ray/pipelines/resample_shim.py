"""Bilinear-resample driver query (kept separate to avoid import cycles)."""

from __future__ import annotations

import pandas as pd

from ..stages import stats
from ..stages.resample import resample
from .tile_queries import tiles_for


def resample_stats_bilinear(sf_dir: str):
    ts, _ = tiles_for(sf_dir)
    rs = resample(ts, 7.5, method="bilinear")
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


# methods exercised by the driver query (one run per method; the full list
# is covered by pytest goldens against the whole-array oracle)
QUERY_METHODS = ("average", "max", "med", "mode", "cubic", "lanczos", "gauss", "q1")


def resample_methods_summary(sf_dir: str):
    """Global stats of the 7.5 m resample under each method — the §2.6
    13-method coverage witness (nearest/bilinear covered by their own
    queries; cubic_spline/min/q3 by pytest)."""
    rows = []
    for m in QUERY_METHODS:
        ts, _ = tiles_for(sf_dir)
        st = stats.global_stats(resample(ts, 7.5, method=m))
        # min/max at 4 decimals: the average kernel's summed-area table
        # accumulates in window-local order, so the last float32 ulp can
        # differ from the whole-array witness
        rows.append(
            (m, int(st["n_valid"]), round(st["sum"], 2),
             round(st["min"], 4), round(st["max"], 4))
        )
    return pd.DataFrame(
        rows, columns=["method", "n_valid", "sum_z", "min_z", "max_z"]
    )
