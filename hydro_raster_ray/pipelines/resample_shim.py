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
