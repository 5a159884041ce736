"""Pencil cases for the Q2/Q11/Q20 TPC-H analogs: correlated-min tie
boundaries, the exact per-mille HAVING threshold, and the integer
dominance test — hand-built tables vs the kernels."""

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


def _dims(tmp_path):
    _write(tmp_path, "region", {
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["EUROPE", "ASIA"]),
    })
    _write(tmp_path, "nation", {
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["NATION_7", "NATION_9", "NATION_2"]),
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    })
    _write(tmp_path, "supplier", {
        "s_suppkey": pa.array([10, 11, 12], pa.int64()),
        "s_name": pa.array(["SUP10", "SUP11", "SUP12"]),
        "s_nationkey": pa.array([0, 1, 2], pa.int64()),
        "s_acctbal": pa.array([5.0, 6.0, 7.0], pa.float64()),
    })


def test_min_cost_supplier_ties_and_region(tmp_path):
    from hydro_raster_ray.pipelines.relational import min_cost_supplier

    _dims(tmp_path)
    _write(tmp_path, "part", {
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_size": pa.array([15, 15, 9], pa.int64()),
    })
    li = [
        # partkey, suppkey, extendedprice
        (1, 10, 3.00),  # pair min 2.50 after next row
        (1, 10, 2.50),
        (1, 11, 2.50),  # TIE with sup10 at part 1 -> both kept
        (1, 12, 1.00),  # cheapest but ASIA supplier -> excluded
        (2, 11, 9.99),  # sole qualifying pair for part 2
        (3, 10, 0.10),  # part size 9 -> excluded
    ]
    _write(tmp_path, "lineitem", {
        "l_partkey": pa.array([r[0] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li], pa.int64()),
        "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
    })
    got = (
        min_cost_supplier(str(tmp_path))
        .to_pandas()
        .sort_values(["p_partkey", "s_suppkey"])
        .reset_index(drop=True)
    )
    assert list(got["p_partkey"]) == [1, 1, 2]
    assert list(got["s_suppkey"]) == [10, 11, 11]
    assert list(got["min_cost"]) == [2.5, 2.5, 9.99]
    assert list(got["n_name"]) == ["NATION_7", "NATION_9", "NATION_9"]
    assert list(got["s_acctbal"]) == [5.0, 6.0, 6.0]


def test_important_part_value_exact_threshold(tmp_path):
    from hydro_raster_ray.pipelines.relational import important_part_value

    _dims(tmp_path)
    # NATION_7 is suppkey 10 only. Total cents = 100000; the permille=1
    # threshold is value > 100 cents EXACTLY: part 2 sits AT the
    # boundary (100 cents) and must be excluded.
    li = [
        (1, 10, 997.00),   # 99700 cents
        (2, 10, 1.00),     # 100 cents == 0.001 * total -> OUT (strict >)
        (3, 10, 2.00),     # 200 cents -> IN
        (4, 11, 500.00),   # other nation -> ignored entirely
    ]
    _write(tmp_path, "lineitem", {
        "l_partkey": pa.array([r[0] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li], pa.int64()),
        "l_extendedprice": pa.array([r[2] for r in li], pa.float64()),
    })
    got = important_part_value(str(tmp_path)).to_pandas()
    assert list(got["p_partkey"]) == [1, 3]
    assert list(got["value"]) == [997.0, 2.0]


def test_dominant_part_suppliers_integer_bound(tmp_path):
    from hydro_raster_ray.pipelines.relational import dominant_part_suppliers

    _dims(tmp_path)
    _write(tmp_path, "part", {
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": pa.array(["small ring", "small bolt", "red gear"]),
    })
    li = [
        # partkey, suppkey, qty, shipdate
        (1, 11, 10, "1996-03-01"),  # part1 total 20: 2*10 == 20 -> NOT dominant
        (1, 10, 10, "1996-03-01"),
        (2, 11, 11, "1996-05-01"),  # part2 total 21: 2*11 > 21 -> dominant
        (2, 10, 10, "1996-05-01"),
        (2, 11, 50, "1995-05-01"),  # outside year, ignored
        (3, 11, 99, "1996-05-01"),  # part name not prefixed, ignored
    ]
    _write(tmp_path, "lineitem", {
        "l_partkey": pa.array([r[0] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li], pa.int64()),
        "l_quantity": pa.array([float(r[2]) for r in li], pa.float64()),
        "l_shipdate": _ts([r[3] for r in li]),
    })
    got = dominant_part_suppliers(str(tmp_path)).to_pandas()
    assert list(got["s_suppkey"]) == [11]
    assert list(got["s_name"]) == ["SUP11"]

    # NATION_7's sole supplier 10 dominates nothing in-window.
    got7 = dominant_part_suppliers(str(tmp_path), nation="NATION_7")
    assert got7.count() == 0
    assert set(got7.schema().names) == {"s_suppkey", "s_name"}
