"""Pencil cases for the Q7/Q14/Q19/Q22 TPC-H analogs: cross-nation pair
direction + same-nation exclusion, promo share from rounded sums,
OR-of-ANDs bracket edges, and the integer-exact above-average boundary
+ anti-join in dormant_customer_balance — hand-built tables vs the
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


def test_nation_trade_volume_hand_case(tmp_path):
    from hydro_raster_ray.pipelines.relational import nation_trade_volume

    _write(tmp_path, "nation", {
        "n_nationkey": pa.array([0, 3, 8], pa.int64()),
        "n_name": pa.array(["NATION_0", "NATION_3", "NATION_8"]),
    })
    _write(tmp_path, "supplier", {
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([3, 8, 0], pa.int64()),
    })
    _write(tmp_path, "customer", {
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([8, 3, 0], pa.int64()),
    })
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([100, 200, 300], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
    })
    li = [
        # (orderkey, suppkey, price, disc, shipdate, why)
        (100, 1, 100.0, 0.1, "1996-06-01"),   # N3 supp -> N8 cust: rev 90
        (100, 2, 50.0, 0.0, "1996-06-01"),    # N8 -> N8: same nation, OUT
        (200, 2, 200.0, 0.5, "1997-03-01"),   # N8 -> N3: rev 100, year 1997
        (200, 1, 10.0, 0.0, "1995-01-01"),    # outside date window, OUT
        (300, 1, 10.0, 0.0, "1996-06-01"),    # cust nation N0, OUT
        (100, 3, 10.0, 0.0, "1996-06-01"),    # supp nation N0, OUT
    ]
    _write(tmp_path, "lineitem", {
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li], pa.int64()),
        "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
        "l_discount": pa.array([r[3] for r in li], pa.float64()),
        "l_shipdate": _ts([r[4] for r in li]),
    })
    got = nation_trade_volume(str(tmp_path)).to_pandas()
    want = pd.DataFrame(
        {
            "supp_nation": ["NATION_3", "NATION_8"],
            "cust_nation": ["NATION_8", "NATION_3"],
            "l_year": np.array([1996, 1997], np.int64),
            "revenue": [90.0, 100.0],
            "n": np.array([1, 1], np.int64),
        }
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_promo_revenue_hand_case(tmp_path):
    from hydro_raster_ray.pipelines.relational import promo_revenue

    _write(tmp_path, "part", {
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO", "STANDARD"]),
    })
    li = [
        (1, 100.0, 0.0, "1997-09-10"),   # promo, rev 100
        (2, 200.0, 0.5, "1997-09-20"),   # non-promo, rev 100
        (1, 999.0, 0.0, "1997-08-31"),   # outside window, OUT
    ]
    _write(tmp_path, "lineitem", {
        "l_partkey": pa.array([r[0] for r in li], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in li], pa.float64()),
        "l_discount": pa.array([r[2] for r in li], pa.float64()),
        "l_shipdate": _ts([r[3] for r in li]),
    })
    got = promo_revenue(str(tmp_path)).to_pandas()
    assert got.shape == (1, 4)
    r = got.iloc[0]
    assert r["promo_revenue"] == 100.0
    assert r["total_revenue"] == 200.0
    assert r["promo_pct"] == 50.0
    assert r["n_items"] == 2 and got["n_items"].dtype == np.int64


def test_bracket_revenue_hand_case(tmp_path):
    from hydro_raster_ray.pipelines.relational import bracket_revenue

    _write(tmp_path, "part", {
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_brand": pa.array(["Brand#12", "Brand#23", "Brand#4", "Brand#9"]),
        "p_size": pa.array([3, 10, 20, 1], pa.int64()),
    })
    li = [
        (1, 5.0, 100.0, 0.0),    # B1 (size 3 in 1..5, qty 5 in 1..11)
        (1, 11.0, 50.0, 0.0),    # B1 qty boundary (inclusive)
        (1, 12.0, 999.0, 0.0),   # qty out of B1, OUT
        (2, 10.0, 200.0, 0.5),   # B2 lower-qty boundary: rev 100
        (3, 25.0, 999.0, 0.0),   # Brand#4 but size 20 > 15, OUT
        (4, 5.0, 999.0, 0.0),    # brand not in any bracket, OUT
    ]
    _write(tmp_path, "lineitem", {
        "l_partkey": pa.array([r[0] for r in li], pa.int64()),
        "l_quantity": pa.array([r[1] for r in li], pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
        "l_discount": pa.array([r[3] for r in li], pa.float64()),
    })
    got = bracket_revenue(str(tmp_path)).to_pandas()
    want = pd.DataFrame(
        {
            "bracket": ["B1", "B2"],
            "revenue": [150.0, 100.0],
            "n": np.array([2, 1], np.int64),
        }
    )
    # no B3 row at all: brackets with zero hits are absent, not zero
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_dormant_customer_balance_hand_case(tmp_path):
    from hydro_raster_ray.pipelines.relational import dormant_customer_balance

    # positives: 100+300+200+400+250 = 1250 cents over n=5 -> avg 250.
    # rich (cents*5 > 1250): c2 (1500) and c5 (2000); c6 sits EXACTLY on
    # the boundary (1250 > 1250 is false) -> excluded — the integer
    # comparison can't float-flip it.
    _write(tmp_path, "customer", {
        "c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "c_nationkey": pa.array([1, 2, 1, 2, 3, 3], pa.int64()),
        "c_acctbal": pa.array([1.0, 3.0, -0.5, 2.0, 4.0, 2.5], pa.float64()),
    })
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([2, 5], pa.int64()),
        # c2's only order predates the cutoff -> dormant; c5 is recent
        "o_orderdate": _ts(["2000-12-31", "2001-06-15"]),
    })
    got = dormant_customer_balance(str(tmp_path)).to_pandas()
    want = pd.DataFrame(
        {
            "c_nationkey": np.array([2], np.int64),
            "n_cust": np.array([1], np.int64),
            "total_acctbal": [3.0],
        }
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
