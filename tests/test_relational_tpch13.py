"""Pencil cases for the Q13/Q15/Q17 TPC-H analogs: left-join zero-order
customers + foreign-key strays, integer-exact max-revenue ties, and the
exact 5·qty·n < Σqty threshold boundary — hand-built tables vs the
kernels."""

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


def test_customer_order_distribution_hand_case(tmp_path):
    from hydro_raster_ray.pipelines.relational import (
        customer_order_distribution,
    )

    _write(tmp_path, "customer", {
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
    })
    # cust 1: two orders; cust 2: none; cust 3: one; custkey 9 is a
    # stray not present in customer — must NOT create a histogram row
    _write(tmp_path, "orders", {
        "o_custkey": pa.array([1, 1, 3, 9], pa.int64()),
    })
    got = customer_order_distribution(str(tmp_path)).to_pandas()
    want = pd.DataFrame({
        "n_orders": np.array([0, 1, 2], np.int64),
        "n_cust": np.array([1, 1, 1], np.int64),
    })
    got_s = got.sort_values("n_orders").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want.sort_values("n_orders")
                                  .reset_index(drop=True))
    # ordering contract: n_cust DESC then n_orders DESC
    assert got["n_orders"].tolist() == [2, 1, 0]


def test_top_supplier_revenue_exact_tie(tmp_path):
    from hydro_raster_ray.pipelines.relational import top_supplier_revenue

    _write(tmp_path, "supplier", {
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"]),
    })
    li = [
        # suppkey, price, disc, shipdate
        (1, 100.00, 0.10, "1996-02-01"),   # rev 90.00
        (1, 10.00, 0.00, "1996-02-01"),    # rev 10.00 -> S1 total 100
        (2, 125.00, 0.20, "1996-03-31"),   # rev 100.00 -> exact tie
        (3, 1000.00, 0.00, "1996-04-01"),  # outside window, OUT
        (3, 5.00, 0.00, "1996-02-01"),     # rev 5 -> loser
    ]
    _write(tmp_path, "lineitem", {
        "l_suppkey": pa.array([r[0] for r in li], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in li], pa.float64()),
        "l_discount": pa.array([r[2] for r in li], pa.float64()),
        "l_shipdate": _ts([r[3] for r in li]),
    })
    got = top_supplier_revenue(str(tmp_path)).to_pandas()
    assert got["s_suppkey"].tolist() == [1, 2]
    assert got["s_name"].tolist() == ["S1", "S2"]
    assert got["total_revenue"].tolist() == [100.0, 100.0]


def test_small_quantity_revenue_threshold_boundary(tmp_path):
    from hydro_raster_ray.pipelines.relational import small_quantity_revenue

    _write(tmp_path, "part", {
        "p_partkey": pa.array([10, 20], pa.int64()),
        "p_brand": pa.array(["Brand#23", "Brand#99"]),
    })
    # part 10 (brand): qtys 1, 2, 27 -> sum=30, n=3, avg=10, 0.2*avg=2.
    #   qty 1 qualifies (5*1*3=15 < 30); qty 2 is the EXACT boundary
    #   (5*2*3=30 == 30 -> excluded); qty 27 excluded.
    # part 20 (other brand): tiny qty but must be ignored entirely.
    li = [
        (10, 1.0, 70.00),
        (10, 2.0, 9999.00),
        (10, 27.0, 5.00),
        (20, 1.0, 11.00),
    ]
    _write(tmp_path, "lineitem", {
        "l_partkey": pa.array([r[0] for r in li], pa.int64()),
        "l_quantity": pa.array([r[1] for r in li], pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
    })
    got = small_quantity_revenue(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert int(got["n_lines"].iloc[0]) == 1
    assert got["avg_yearly"].iloc[0] == 7000 / 700.0  # 70.00 dollars / 7
