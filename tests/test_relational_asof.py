"""As-of join semantics: inclusive boundary, no-prior-error sentinel,
latest-of-several selection — hand-built events vs the kernel."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_asof_hand_cases(tmp_path):
    from hydro_raster_ray.pipelines.relational import events_error_asof

    base = pd.Timestamp("2024-01-01")
    us = pd.Timedelta(microseconds=1)
    rows = [
        # user 1: error at t=10, clicks at t=9 (before: -1), t=10 (tie:
        # inclusive, gap 0), t=25 (gap 15); second error at t=20 so the
        # t=25 click must pick the LATEST (gap 5, not 15)
        (0, 1, "error", 10),
        (1, 1, "click", 9),
        (2, 1, "click", 10),
        (3, 1, "error", 20),
        (4, 1, "click", 25),
        # user 2: clicks only — all -1 (no cross-user leakage from user 1)
        (5, 2, "click", 11),
        # user 3: errors only — contributes no output rows
        (6, 3, "error", 1),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array(
                    [base + r[3] * us for r in rows],
                    pa.timestamp("us"),
                ),
            }
        ),
        os.path.join(tmp_path, "events.parquet"),
    )
    got = (
        events_error_asof(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = {1: -1, 2: 0, 4: 5, 5: -1}
    assert dict(zip(got["event_id"], got["gap_us"])) == want
    assert got["gap_us"].dtype == np.int64


def test_range_join_band_edges(tmp_path):
    """Banded range join: window-boundary inclusivity and cross-band
    coverage (errors exactly w away, in adjacent buckets, just outside)."""
    from hydro_raster_ray.pipelines.relational import events_error_range_join

    base = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        # click at t=100s (bucket 1 for w=60): errors at 40s (exactly -60,
        # inclusive, bucket 0), 160s (exactly +60, bucket 2), 39.999999s
        # (outside), 160.000001s (outside), 100s (same instant)
        (0, "click", 100.0),
        (1, "error", 40.0),
        (2, "error", 160.0),
        (3, "error", 39.999999),
        (4, "error", 160.000001),
        (5, "error", 100.0),
        # a 'view' event must be ignored entirely
        (6, "view", 100.0),
        # isolated click with no errors anywhere near
        (7, "click", 10_000.0),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [base + r[2] * s for r in rows], pa.timestamp("us")
                ),
            }
        ),
        os.path.join(tmp_path, "events.parquet"),
    )
    got = (
        events_error_range_join(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert dict(zip(got["event_id"], got["n_err"])) == {0: 3, 7: 0}
