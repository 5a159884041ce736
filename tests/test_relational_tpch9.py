"""Pencil cases for the Q4/Q6/Q9 TPC-H analogs: exact discount-band
boundaries, the tagged-union EXISTS-as-max-lag recovery, and the
integer-units profit arithmetic — hand-built tables vs the kernels."""

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


def test_forecast_revenue_band_boundaries(tmp_path):
    from hydro_raster_ray.pipelines.relational import forecast_revenue

    li = [
        # price, disc, qty, shipdate   -> in/out
        (100.0, 0.05, 10, "1996-06-01"),  # in:  100*0.05 = 5.00
        (200.0, 0.07, 23, "1996-06-01"),  # in:  200*0.07 = 14.00
        (100.0, 0.04, 10, "1996-06-01"),  # disc below band, OUT
        (100.0, 0.08, 10, "1996-06-01"),  # disc above band, OUT
        (100.0, 0.06, 24, "1996-06-01"),  # qty == 24, OUT
        (100.0, 0.06, 10, "1995-12-31"),  # before year, OUT
        (100.0, 0.06, 10, "1997-01-01"),  # after year, OUT
    ]
    _write(tmp_path, "lineitem", {
        "l_extendedprice": pa.array([r[0] for r in li], pa.float64()),
        "l_discount": pa.array([r[1] for r in li], pa.float64()),
        "l_quantity": pa.array([float(r[2]) for r in li], pa.float64()),
        "l_shipdate": _ts([r[3] for r in li]),
    })
    got = forecast_revenue(str(tmp_path), year=1996).to_pandas()
    assert len(got) == 1
    assert got["revenue"].iloc[0] == 19.0
    assert got["n_lines"].iloc[0] == 2


def test_priority_late_orders_exists_recovery(tmp_path):
    from hydro_raster_ray.pipelines.relational import priority_late_orders

    orders = [
        # okey, orderdate, priority
        (1, "1997-04-10", "1-URGENT"),   # one late line -> counted
        (2, "1997-05-01", "1-URGENT"),   # max lag exactly 90 -> NOT late
        (3, "1997-06-01", "5-LOW"),      # two lines, one late -> counted
        (4, "1997-06-15", "5-LOW"),      # no lineitems at all -> OUT
        (5, "1997-03-31", "1-URGENT"),   # outside quarter, late line, OUT
    ]
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_orderdate": _ts([o[1] for o in orders]),
        "o_orderpriority": pa.array([o[2] for o in orders]),
    })
    li = [
        (1, "1997-07-20"),  # lag 101 -> late
        (1, "1997-04-11"),  # lag 1
        (2, "1997-07-30"),  # lag 90 -> boundary, NOT late
        (3, "1997-06-02"),  # lag 1
        (3, "1997-09-15"),  # lag 106 -> late
        (5, "1997-12-01"),  # order outside quarter
        (9, "1997-12-01"),  # stray orderkey with no order row
    ]
    _write(tmp_path, "lineitem", {
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_shipdate": _ts([r[1] for r in li]),
    })
    got = priority_late_orders(str(tmp_path)).to_pandas()
    assert got["o_orderpriority"].tolist() == ["1-URGENT", "5-LOW"]
    assert got["n_orders"].tolist() == [1, 1]


def test_nation_profit_integer_units(tmp_path):
    from hydro_raster_ray.pipelines.relational import nation_profit

    _write(tmp_path, "nation", {
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["NATION_0", "NATION_1"]),
        "n_regionkey": pa.array([0, 0], pa.int64()),
    })
    _write(tmp_path, "supplier", {
        "s_suppkey": pa.array([10, 20], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int64()),
    })
    _write(tmp_path, "part", {
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"]),
        "p_retailprice": pa.array([50.0, 10.0], pa.float64()),
    })
    li = [
        # partkey, suppkey, qty, price, disc, shipdate
        # red part, nation 0, 1996: rev 200*0.9=180, cost 0.6*50*2=60
        (1, 10, 2, 200.0, 0.10, "1996-03-01"),
        # red part, nation 1, 1997: rev 100, cost 0.6*50*1=30 -> 70
        (1, 20, 1, 100.0, 0.00, "1997-03-01"),
        # blue part: name filter drops it
        (2, 10, 1, 999.0, 0.00, "1996-03-01"),
    ]
    _write(tmp_path, "lineitem", {
        "l_partkey": pa.array([r[0] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li], pa.int64()),
        "l_quantity": pa.array([float(r[2]) for r in li], pa.float64()),
        "l_extendedprice": pa.array([r[3] for r in li], pa.float64()),
        "l_discount": pa.array([r[4] for r in li], pa.float64()),
        "l_shipdate": _ts([r[5] for r in li]),
    })
    got = nation_profit(str(tmp_path), name_like="red").to_pandas()
    assert got["nation"].tolist() == ["NATION_0", "NATION_1"]
    assert got["o_year"].tolist() == [1996, 1997]
    assert got["profit"].tolist() == [120.0, 70.0]
    assert got["n_lines"].tolist() == [1, 1]
