"""Pencil cases for the Q8/Q12/Q21 TPC-H analogs and the
``hash_grouped_combine`` high-cardinality grouping primitive: market-share
ratio arithmetic, exact lag-bucket boundaries, and the composite-key
unique-latest-shipper encoding — hand-built tables vs the kernels."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _write(tmp_path, name, cols):
    pq.write_table(pa.table(cols), os.path.join(tmp_path, f"{name}.parquet"))


def _ts(s):
    return pa.array([pd.Timestamp(x) for x in s], pa.timestamp("us"))


def test_market_share_by_year_hand_case(tmp_path):
    from hydro_raster_ray.pipelines.relational import market_share_by_year

    _write(tmp_path, "region", {
        "r_regionkey": pa.array([0, 3], pa.int64()),
        "r_name": pa.array(["AFRICA", "EUROPE"]),
    })
    # nations 3 and 8 in EUROPE (3 is the target), nation 0 outside
    _write(tmp_path, "nation", {
        "n_nationkey": pa.array([0, 3, 8], pa.int64()),
        "n_name": pa.array(["NATION_0", "NATION_3", "NATION_8"]),
        "n_regionkey": pa.array([0, 3, 3], pa.int64()),
    })
    _write(tmp_path, "part", {
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["ECONOMY", "PROMO"]),
    })
    # suppliers: 10 → target nation, 20 → other EUROPE, 30 → AFRICA
    _write(tmp_path, "supplier", {
        "s_suppkey": pa.array([10, 20, 30], pa.int64()),
        "s_nationkey": pa.array([3, 8, 0], pa.int64()),
    })
    li = [
        # partkey, suppkey, price, disc, shipdate  -> rev (no disc)
        (1, 10, 100.00, 0.00, "1996-06-01"),  # target, 1996: 100
        (1, 20, 300.00, 0.00, "1996-07-01"),  # other EU, 1996: 300
        (1, 10, 50.00, 0.50, "1997-01-01"),   # target, 1997: 25
        (1, 30, 999.00, 0.00, "1996-01-01"),  # AFRICA supplier, OUT
        (2, 10, 999.00, 0.00, "1996-01-01"),  # PROMO part, OUT
    ]
    _write(tmp_path, "lineitem", {
        "l_partkey": pa.array([r[0] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li], pa.int64()),
        "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
        "l_discount": pa.array([r[3] for r in li], pa.float64()),
        "l_shipdate": _ts([r[4] for r in li]),
    })
    got = market_share_by_year(str(tmp_path)).to_pandas()
    assert got["year"].tolist() == [1996, 1997]
    assert got["target_revenue"].tolist() == [100.0, 25.0]
    assert got["total_revenue"].tolist() == [400.0, 25.0]
    assert got["mkt_share"].tolist() == [0.25, 1.0]
    assert got["n_lines"].tolist() == [2, 1]


def test_shipping_lag_bucket_boundaries(tmp_path):
    from hydro_raster_ray.pipelines.relational import (
        shipping_lag_distribution,
    )

    # lags 29 (FAST), 30 (MEDIUM), 89 (MEDIUM), 90 (SLOW); one line ships
    # outside 1997 and must be dropped
    orders = [
        (1, "1997-01-01", "1-URGENT"),
        (2, "1997-01-01", "2-HIGH"),
        (3, "1997-01-01", "5-LOW"),
        (4, "1997-01-01", "3-MEDIUM"),
        (5, "1996-01-01", "1-URGENT"),
    ]
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_orderdate": _ts([o[1] for o in orders]),
        "o_orderpriority": pa.array([o[2] for o in orders]),
    })
    li = [
        (1, "1997-01-30"),  # lag 29 -> FAST, high
        (2, "1997-01-31"),  # lag 30 -> MEDIUM, high
        (3, "1997-03-31"),  # lag 89 -> MEDIUM, low
        (4, "1997-04-01"),  # lag 90 -> SLOW, low
        (5, "1996-06-01"),  # shipped 1996 -> OUT
    ]
    _write(tmp_path, "lineitem", {
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_shipdate": _ts([r[1] for r in li]),
    })
    got = shipping_lag_distribution(str(tmp_path), year=1997).to_pandas()
    got = got.set_index("bucket")
    assert got.loc["FAST", "high_lines"] == 1
    assert got.loc["FAST", "low_lines"] == 0
    assert got.loc["MEDIUM", "high_lines"] == 1
    assert got.loc["MEDIUM", "low_lines"] == 1
    assert got.loc["SLOW", "high_lines"] == 0
    assert got.loc["SLOW", "low_lines"] == 1


def test_late_supplier_count_composite_key_cases(tmp_path):
    from hydro_raster_ray.pipelines.relational import late_supplier_count

    _write(tmp_path, "supplier", {
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"]),
    })
    li = [
        # order 10: S1 latest (unique), S2 earlier -> S1 blamed
        (10, 1, "1996-03-01"),
        (10, 2, "1996-02-01"),
        # order 20: S1 and S2 tie at the max -> nobody blamed
        (20, 1, "1996-03-01"),
        (20, 2, "1996-03-01"),
        (20, 3, "1996-01-01"),
        # order 30: single supplier -> excluded (n_supp < 2)
        (30, 1, "1996-03-01"),
        # order 40: S2 ships TWICE on the max day, S3 earlier -> S2 is
        # still the UNIQUE latest supplier (dup lineitems collapse)
        (40, 2, "1996-05-01"),
        (40, 2, "1996-05-01"),
        (40, 3, "1996-04-01"),
        # order 50: S3 latest over S1 -> S3 blamed
        (50, 3, "1996-07-02"),
        (50, 1, "1996-07-01"),
    ]
    _write(tmp_path, "lineitem", {
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li], pa.int64()),
        "l_shipdate": _ts([r[2] for r in li]),
    })
    got = late_supplier_count(str(tmp_path)).to_pandas()
    # numwait DESC, suppkey ASC: all three have numwait 1
    assert got["s_suppkey"].tolist() == [1, 2, 3]
    assert got["s_name"].tolist() == ["S1", "S2", "S3"]
    assert got["numwait"].tolist() == [1, 1, 1]


def test_hash_grouped_combine_matches_pandas_and_restores_context():
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    from hydro_raster_ray.stages.cc import hash_grouped_combine

    rng = np.random.default_rng(7)
    n, k = 20_000, 5_000
    df = pd.DataFrame({
        "k": rng.integers(0, k, n).astype(np.int64),
        "v": rng.integers(-1000, 1000, n).astype(np.int64),
    })
    want = (
        df.groupby("k", as_index=False)
        .agg(mx=("v", "max"), mn=("v", "min"), s=("v", "sum"))
        .sort_values("k")
        .reset_index(drop=True)
    )

    ds = ray.data.from_pandas(df).repartition(8)
    prev_g = DataContext.get_current().shuffle_strategy
    prev_d = ds.context.shuffle_strategy

    def comb(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("k", as_index=False).agg(
            mx=("v", "max"), mn=("v", "min"), s=("v", "sum")
        )

    out = hash_grouped_combine(ds, ["k"], comb, num_partitions=4)
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # each key must appear in exactly ONE output partition (= exactly once)
    assert got["k"].is_unique
    # the flag flip is scoped: global, input AND output contexts restored
    assert DataContext.get_current().shuffle_strategy == prev_g
    assert ds.context.shuffle_strategy == prev_d
    assert out.context.shuffle_strategy == prev_d
    # downstream groupbys off the materialized result still run (and on the
    # restored strategy) — this was the 37 s HashAggregate leak
    from ray.data.aggregate import Sum

    small = out.groupby("k").aggregate(Sum("s", alias_name="s2")).count()
    assert small == k or small == len(want)
