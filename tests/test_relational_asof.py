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
