"""Windowed prefix-sum and grouped top-k semantics: date-tie ordering in
the running total, count-tie ranking in top-users — hand-built tables vs
the kernels."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_running_total_hand_cases(tmp_path):
    from hydro_raster_ray.pipelines.relational import orders_running_total

    d = pd.Timestamp("2024-03-01")
    rows = [
        # cust 7: two orders on the SAME date — orderkey breaks the tie,
        # so key 10 (placed "later" in key order) must include key 2
        (2, 7, d, 10.01),
        (10, 7, d, 5.99),
        (4, 7, d + pd.Timedelta(days=1), 0.01),
        # cust 8: single order; independent of cust 7
        (3, 8, d, 100.10),
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderdate": pa.array([r[2] for r in rows],
                                        pa.timestamp("us")),
                "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        os.path.join(tmp_path, "orders.parquet"),
    )
    got = (
        orders_running_total(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    by = dict(zip(got["o_orderkey"], got["run_cents"]))
    assert by[2] == 1001
    assert by[10] == 1001 + 599          # same-date tie: key order
    assert by[4] == 1001 + 599 + 1       # next day accumulates
    assert by[3] == 10010                # other customer isolated
    assert got["run_cents"].dtype == np.int64


def test_top_users_hand_cases(tmp_path):
    from hydro_raster_ray.pipelines.relational import events_top_users_per_type

    # type A: counts 3,2,2,1 with a tie at 2 — user_id ASC breaks it;
    # type B: a single user
    rows = (
        [("a", 5)] * 3 + [("a", 9)] * 2 + [("a", 4)] * 2 + [("a", 99)]
        + [("b", 1)] * 2
    )
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array([pd.Timestamp("2024-01-01")] * n,
                               pa.timestamp("us")),
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        os.path.join(tmp_path, "events.parquet"),
    )
    got = (
        events_top_users_per_type(str(tmp_path), k=3)
        .to_pandas()
        .sort_values(["event_type", "rank"])
        .reset_index(drop=True)
    )
    a = got[got["event_type"] == "a"]
    assert list(a["user_id"]) == [5, 4, 9]       # tie at n=2: 4 before 9
    assert list(a["n_events"]) == [3, 2, 2]
    assert list(a["rank"]) == [1, 2, 3]
    b = got[got["event_type"] == "b"]
    assert list(b["user_id"]) == [1] and list(b["n_events"]) == [2]
    assert len(got) == 4                          # user 99 pruned by k=3


def test_hll_registers_and_estimate(tmp_path):
    """HLL: register table matches the scalar witness bit-for-bit; the
    estimate lands within the expected relative error of the true distinct
    count (m=256 → σ ≈ 1.04/√m ≈ 6.5%; assert 4σ); merging is idempotent
    under duplicates."""
    import duckdb

    from hydro_raster_ray.pipelines.relational import events_hll, hll_estimate
    from hydro_raster_ray.text.witness import hll_witness

    SF = "/root/testdata/sf0.01"
    got = events_hll(SF).to_pandas().sort_values("reg").reset_index(drop=True)
    keys = duckdb.sql(
        f"SELECT user_id FROM read_parquet('{SF}/events.parquet')"
    ).df()["user_id"].to_numpy()
    want = hll_witness(keys)
    pd.testing.assert_frame_equal(got, want)
    true_n = len(np.unique(keys))
    est = hll_estimate(got)
    assert abs(est - true_n) / true_n < 4 * 1.04 / np.sqrt(256)
    # duplicates don't move registers: witness over keys ++ keys is equal
    pd.testing.assert_frame_equal(hll_witness(list(keys) + list(keys)), want)


def test_retention_hand_cases(tmp_path):
    """Retention: consecutive calendar days count, gaps don't, duplicate
    same-day events dedup, multi-day streaks attribute to each first day."""
    rows = [
        (1, "2024-01-01 08:00"), (1, "2024-01-01 22:00"),  # dup day
        (1, "2024-01-02 01:00"),                           # retained 1→2
        (1, "2024-01-04 01:00"),                           # gap: 2→4 no
        (2, "2024-01-01 09:00"),                           # one-day user
        (3, "2024-01-02 09:00"), (3, "2024-01-03 09:00"),
        (3, "2024-01-04 09:00"),                           # streak 2,3,4
    ]
    n = len(rows)
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([pd.Timestamp(r[1]) for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([0.0] * n, pa.float64()),
        }),
        os.path.join(tmp_path, "events.parquet"),
    )
    from hydro_raster_ray.pipelines.relational import events_retention

    got = (
        events_retention(str(tmp_path))
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    d = pd.Timestamp
    assert got.loc[d("2024-01-01"), "n_active"] == 2   # users 1, 2
    assert got.loc[d("2024-01-01"), "n_retained"] == 1  # only user 1
    assert got.loc[d("2024-01-02"), "n_active"] == 2   # users 1, 3
    assert got.loc[d("2024-01-02"), "n_retained"] == 1  # user 3 (1 gapped)
    assert got.loc[d("2024-01-03"), "n_retained"] == 1  # user 3 streak
    assert got.loc[d("2024-01-04"), "n_retained"] == 0  # last day


def test_returned_item_revenue_topk(ray_session):
    """TPC-H Q10 analog: exactly k rows, ordered by (rounded revenue desc,
    custkey asc), matching an independent DuckDB evaluation row-for-row."""
    import duckdb

    from hydro_raster_ray.pipelines.relational import returned_item_revenue

    sf = "/root/testdata/sf0.001"
    got = returned_item_revenue(sf, k=20).to_pandas().reset_index(drop=True)
    assert len(got) == 20
    r = got["revenue"].to_numpy()
    k = got["c_custkey"].to_numpy()
    order_keys = list(zip(-r, k))
    assert order_keys == sorted(order_keys)
    want = duckdb.sql(f"""
        WITH r AS (
          SELECT o.o_custkey, sum(l.l_extendedprice * (1 - l.l_discount)) rev,
                 count(*) n_items
          FROM read_parquet('{sf}/lineitem.parquet') l
          JOIN read_parquet('{sf}/orders.parquet') o
            ON l.l_orderkey = o.o_orderkey
          WHERE l.l_returnflag = 'R' GROUP BY o.o_custkey)
        SELECT CAST(c.c_custkey AS BIGINT) c_custkey, c.c_name, n.n_name,
               CAST(round(r.rev, 2) AS DOUBLE) revenue,
               CAST(r.n_items AS BIGINT) n_items
        FROM r JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = r.o_custkey
        JOIN read_parquet('{sf}/nation.parquet') n
          ON n.n_nationkey = c.c_nationkey
        ORDER BY round(r.rev, 2) DESC, c.c_custkey LIMIT 20
    """).df()
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_events_funnel_hand_case(tmp_path, ray_session):
    """Pencil funnel: strict ordering (a click AT the view's timestamp
    does not count), the 48h deadline binds (late purchase ignored),
    users with no view emit nothing, full completion reports exact µs."""
    from hydro_raster_ray.pipelines.relational import events_funnel

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    H = pd.Timedelta(hours=1)
    rows = [
        # user 1: full funnel inside the window → reached 3, 5h to purchase
        (1, t0, "view"), (1, t0 + 2 * H, "click"), (1, t0 + 5 * H, "purchase"),
        # user 2: click at exactly t1 (strict > excludes) then a later
        # click; purchase lands at t1+50h > deadline → reached 2
        (2, t0, "view"), (2, t0, "click"), (2, t0 + 3 * H, "click"),
        (2, t0 + 50 * H, "purchase"),
        # user 3: no view at all → excluded entirely
        (3, t0, "click"), (3, t0 + H, "purchase"),
        # user 4: view only → reached 1
        (4, t0 + 7 * H, "view"),
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }),
        os.path.join(tmp_path, "events.parquet"),
    )
    got = (
        events_funnel(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["user_id"].tolist() == [1, 2, 4]
    assert got["reached"].tolist() == [3, 2, 1]
    assert got["us_to_last"].tolist() == [5 * 3_600_000_000, -1, -1]


def test_large_order_customers_semantics(ray_session):
    """Q18 analog at sf0.001: every returned order's quantity sum really
    exceeds the threshold, ordering is (o_totalprice desc, orderkey), and
    the survivor set matches an independent DuckDB evaluation."""
    import duckdb

    from hydro_raster_ray.pipelines.relational import large_order_customers

    sf = "/root/testdata/sf0.001"
    got = large_order_customers(sf, min_qty=200.0).to_pandas()
    want = duckdb.sql(f"""
        WITH big AS (SELECT l_orderkey, sum(l_quantity) sq
                     FROM read_parquet('{sf}/lineitem.parquet')
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
        SELECT CAST(o.o_custkey AS BIGINT) c_custkey, c.c_name,
               CAST(o.o_orderkey AS BIGINT) o_orderkey, o.o_orderdate,
               o.o_totalprice, CAST(round(big.sq, 2) AS DOUBLE) sum_qty
        FROM big JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_orderkey = big.l_orderkey
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
    """).df()
    assert len(got) == len(want) > 0
    assert (got["sum_qty"] > 200).all()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[want.columns], want
    )


def test_local_supplier_revenue_same_nation_only(tmp_path, ray_session):
    """Pencil case: only the lineitem whose supplier nation equals the
    customer nation AND sits in the requested region contributes."""
    from hydro_raster_ray.pipelines.relational import local_supplier_revenue

    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["EURASIA", "ELSEWHERE"]),
    }), os.path.join(tmp_path, "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([10, 11, 12], pa.int32()),
        "n_name": pa.array(["A", "B", "C"]),
        "n_regionkey": pa.array([0, 0, 1], pa.int32()),
    }), os.path.join(tmp_path, "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([10, 12], pa.int32()),
    }), os.path.join(tmp_path, "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([5, 6], pa.int64()),
        "s_nationkey": pa.array([10, 11], pa.int32()),
    }), os.path.join(tmp_path, "supplier.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 101], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
    }), os.path.join(tmp_path, "orders.parquet"))
    # li rows: (order, supp, price, disc)
    #  100/5: cust nation A == supp nation A, region ok  -> counts (90.0)
    #  100/6: supp nation B != cust nation A             -> excluded
    #  101/5: cust nation C is region 1, order pruned    -> excluded
    pq.write_table(pa.table({
        "l_orderkey": pa.array([100, 100, 101], pa.int64()),
        "l_suppkey": pa.array([5, 6, 5], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 70.0]),
        "l_discount": pa.array([0.10, 0.0, 0.0]),
    }), os.path.join(tmp_path, "lineitem.parquet"))
    got = local_supplier_revenue(str(tmp_path), region="EURASIA").to_pandas()
    assert got["n_name"].tolist() == ["A"]
    assert got["revenue"].tolist() == [90.0]
    assert got["n"].tolist() == [1]
    assert got["n"].dtype == np.int64


def test_events_zscore_outliers_hand_case(tmp_path, ray_session):
    """Pencil moments: user 1 has 5 purchases of 100 cents and one of 700 —
    only the 700 clears |z|>2; user 2 (n=2 < min_n) and the zero-variance
    user 3 emit nothing; non-purchase rows are ignored."""
    from hydro_raster_ray.pipelines.relational import events_zscore_outliers

    vals = [(1, 1.00, "purchase")] * 5 + [(1, 7.00, "purchase")] + \
        [(2, 1.00, "purchase"), (2, 9.00, "purchase")] + \
        [(3, 2.00, "purchase")] * 6 + [(1, 99.0, "click")]
    t0 = pd.Timestamp("2024-01-01")
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array([t0] * len(vals), pa.timestamp("us")),
        "user_id": pa.array([v[0] for v in vals], pa.int64()),
        "event_type": pa.array([v[2] for v in vals]),
        "value": pa.array([v[1] for v in vals]),
        "props": pa.array(["{}"] * len(vals)),
    }), os.path.join(tmp_path, "events.parquet"))
    got = events_zscore_outliers(str(tmp_path)).to_pandas()
    assert got["event_id"].tolist() == [5]
    assert got["cents"].tolist() == [700]
    # n=6, s=1200, ss=540000: var=(540000-240000)/5=60000, std=244.948...
    # z=(700-200)/sqrt(60000)
    assert abs(got["z"].iloc[0] - round(500 / np.sqrt(60000.0), 6)) < 1e-12


def test_global_ranks_matches_argsort(ray_session):
    """_global_ranks == pandas rank under (col, tie) total order, with
    heavy ties and enough rows to span several sample buckets."""
    import ray.data

    from hydro_raster_ray.pipelines.relational import _global_ranks

    n = 1000
    vals = (np.arange(n, dtype=np.int64) * 7919) % 13  # 13 distinct, big ties
    df = pd.DataFrame({"user_id": np.arange(n, dtype=np.int64), "v": vals})
    got = (
        _global_ranks(ray.data.from_pandas(df).repartition(8), "v")
        .to_pandas().sort_values("user_id")
    )
    want = df.sort_values(["v", "user_id"]).reset_index(drop=True)
    want["rank_v"] = np.arange(n, dtype=np.int64)
    want = want.sort_values("user_id")
    assert got["rank_v"].tolist() == want["rank_v"].tolist()


def test_events_rfm_hand_case(tmp_path, ray_session):
    """Pencil RFM over 4 users: recency from the corpus max ts, quartile
    = 0-based-rank*4//4 (one user per tier when all metrics distinct)."""
    from hydro_raster_ray.pipelines.relational import events_rfm

    t0 = pd.Timestamp("2024-01-10")
    D = pd.Timedelta(days=1)
    rows = []  # (user, ts, cents)
    specs = {1: (0, 4), 2: (1, 3), 3: (2, 2), 4: (3, 1)}  # days_back, n_ev
    for u, (back, nev) in specs.items():
        for j in range(nev):
            rows.append((u, t0 - back * D - j * D, 100.0 * u))
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["purchase"] * len(rows)),
        "value": pa.array([r[2] for r in rows]),
        "props": pa.array(["{}"] * len(rows)),
    }), os.path.join(tmp_path, "events.parquet"))
    got = events_rfm(str(tmp_path)).to_pandas().set_index("user_id")
    assert got.loc[1, "r_days"] == 0 and got.loc[4, "r_days"] == 3
    # recency ranks: user1 best (tier 0) ... user4 worst (tier 3)
    assert got["r_tier"].tolist() == [0, 1, 2, 3]
    # frequency ascending: user4 (1 ev) tier 0 ... user1 (4 ev) tier 3
    assert got["f_tier"].tolist() == [3, 2, 1, 0]
    # monetary: user1 4*10000, u2 3*20000, u3 2*30000, u4 1*40000 cents
    assert got["cents"].tolist() == [40000, 60000, 60000, 40000]
    # ties (u1/u4 and u2/u3) break by user_id: lower id gets lower rank
    assert got["m_tier"].tolist() == [0, 2, 3, 1]


def test_events_path_trigrams_hand_case(tmp_path, ray_session):
    """view>click>purchase twice for user 1 (same-ts pair ordered by
    event_id), a 2-event user emits nothing."""
    from hydro_raster_ray.pipelines.relational import events_path_trigrams

    t0 = pd.Timestamp("2024-01-01")
    S = pd.Timedelta(seconds=1)
    rows = [
        (1, t0, "view"), (1, t0 + S, "click"), (1, t0 + 2 * S, "purchase"),
        (1, t0 + 3 * S, "view"), (1, t0 + 4 * S, "click"),
        (1, t0 + 5 * S, "purchase"),
        (2, t0, "view"), (2, t0 + S, "click"),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    }), os.path.join(tmp_path, "events.parquet"))
    got = events_path_trigrams(str(tmp_path)).to_pandas()
    top = dict(zip(got["path"], got["n"]))
    assert top["view>click>purchase"] == 2
    assert top["click>purchase>view"] == 1
    assert sum(top.values()) == 4  # 4 trigrams total from user 1 only


def test_top_unshipped_orders_hand_case(tmp_path, ray_session):
    """Q3-analog semantics: segment filter, date split on BOTH facts,
    revenue grouped per order, rounded ordering."""
    from hydro_raster_ray.pipelines.relational import top_unshipped_orders

    cut = pd.Timestamp("1998-05-15")
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_mktsegment": pa.array(["BUILDING", "MACHINERY"]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
                # 11 is placed AFTER the cutoff, 12 belongs to the wrong
                # segment — both must vanish
                "o_orderdate": pa.array(
                    [cut - pd.Timedelta(days=30), cut + pd.Timedelta(days=1),
                     cut - pd.Timedelta(days=5)],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "2-HIGH"]),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([10, 10, 10, 11, 12], pa.int64()),
                "l_extendedprice": pa.array(
                    [10.0, 20.0, 40.0, 7.0, 8.0], pa.float64()
                ),
                "l_discount": pa.array(
                    [0.1, 0.0, 0.5, 0.0, 0.0], pa.float64()
                ),
                # the 40.0 line ships BEFORE the cutoff — excluded
                "l_shipdate": pa.array(
                    [cut + pd.Timedelta(days=9), cut + pd.Timedelta(days=2),
                     cut - pd.Timedelta(days=2), cut + pd.Timedelta(days=3),
                     cut + pd.Timedelta(days=4)],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    got = top_unshipped_orders(str(tmp_path)).to_pandas()
    assert got["o_orderkey"].tolist() == [10]
    assert got["revenue"].tolist() == [29.0]  # 10*0.9 + 20*1.0
    assert got["n_items"].tolist() == [2]
    assert got["o_orderpriority"].tolist() == ["1-URGENT"]
    assert got["o_orderdate"].tolist() == [cut - pd.Timedelta(days=30)]
    assert list(got.columns) == [
        "o_orderkey", "revenue", "o_orderdate", "o_orderpriority", "n_items"
    ]


def test_brand_supplier_counts_hand_case(tmp_path, ray_session):
    """Exact distinct-supplier counting: duplicate (brand, supplier)
    pairs collapse across parts and batches; the size filter drops the
    whole brand."""
    from hydro_raster_ray.pipelines.relational import brand_supplier_counts

    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_brand": pa.array(["A", "A", "B"]),
                "p_size": pa.array([10, 10, 30], pa.int64()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                # s1 ships brand A via TWO different parts → still ONE
                # distinct supplier; part 3 (size 30) is filtered out
                "l_partkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
                "l_suppkey": pa.array([7, 7, 7, 8, 9], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    got = brand_supplier_counts(str(tmp_path)).to_pandas()
    assert got["p_brand"].tolist() == ["A"]
    assert got["n_suppliers"].tolist() == [2]
    assert got["n_lines"].tolist() == [4]


def test_events_gap_quantiles_pencil(tmp_path, ray_session):
    """Hand case, one type, timestamps at 0,1,3,6,10 s → gaps (µs)
    [1,2,3,4]e6 sorted; m=4: p50 rank (4+1)//2=2 → 2e6; p90 rank
    (36+9)//10=4 → 4e6; duplicate-ts events order by event_id."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hydro_raster_ray.pipelines.relational import events_gap_quantiles

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:01",
         "2024-01-01 00:00:03", "2024-01-01 00:00:06",
         "2024-01-01 00:00:10"])
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["click"] * 5, pa.string()),
            "value": pa.array([0.0] * 5, pa.float64()),
        }),
        os.path.join(tmp_path, "events.parquet"),
    )
    got = events_gap_quantiles(str(tmp_path)).to_pandas()
    assert got["n_gaps"].tolist() == [4]
    assert got["p50_us"].tolist() == [2_000_000]
    assert got["p90_us"].tolist() == [4_000_000]
    assert got["max_us"].tolist() == [4_000_000]


def test_events_mad_pencil(tmp_path, ray_session):
    """Hand case, cents [100, 200, 200, 300, 10000]: m=5, rank 3 →
    med=200; deviations sorted [0, 0, 100, 100, 9800] → mad=100;
    outliers with dev > 300: only 10000 → 1."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hydro_raster_ray.pipelines.relational import events_mad_outliers

    vals = [1.0, 2.0, 2.0, 3.0, 100.0]
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array(
                pd.to_datetime(["2024-01-01"] * 5), pa.timestamp("us")),
            "user_id": pa.array([7] * 5, pa.int64()),
            "event_type": pa.array(["purchase"] * 5, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }),
        os.path.join(tmp_path, "events.parquet"),
    )
    got = events_mad_outliers(str(tmp_path)).to_pandas()
    assert got["n_events"].tolist() == [5]
    assert got["med_cents"].tolist() == [200]
    assert got["mad_cents"].tolist() == [100]
    assert got["n_outliers"].tolist() == [1]


def test_domain_mix_pencil(tmp_path, ray_session):
    """Two sources, 3 vs 1 tokens → 750000/250000 ppm; 1 doc each →
    500000 doc_ppm both."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hydro_raster_ray.pipelines.relational import domain_mix_weights

    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b c", "d"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["s0", "s1"], pa.string()),
            "n_chars": pa.array([5, 1], pa.int64()),
        }),
        os.path.join(tmp_path, "documents.parquet"),
    )
    got = domain_mix_weights(str(tmp_path)).to_pandas().sort_values(
        "source").reset_index(drop=True)
    assert got["weight_ppm"].tolist() == [750000, 250000]
    assert got["doc_ppm"].tolist() == [500000, 500000]


def test_gini_pencil_cases(tmp_path, ray_session):
    """Closed-form anchors: equal revenues → gini 0; with revenues
    [1, 0, 0, 0] concentrated in one of four customers the finite-sample
    Gini is (2·(1·0+2·0+3·0+4·1) − 5·1)/(4·1) = 3/4 → 750000 ppm."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hydro_raster_ray.pipelines.relational import customer_revenue_gini

    def write(revs):
        pq.write_table(
            pa.table({
                "o_orderkey": pa.array(range(len(revs)), pa.int64()),
                "o_custkey": pa.array(range(len(revs)), pa.int64()),
                "o_totalprice": pa.array(revs, pa.float64()),
            }),
            os.path.join(tmp_path, "orders.parquet"),
        )
        return str(tmp_path)

    got = customer_revenue_gini(write([5.0, 5.0, 5.0, 5.0])).to_pandas()
    assert got["gini_ppm"].tolist() == [0]
    got = customer_revenue_gini(write([0.01, 0.0, 0.0, 0.0])).to_pandas()
    assert got["gini_ppm"].tolist() == [750000]
    assert got["total_cents"].tolist() == [1]


def test_markov_pencil(tmp_path, ray_session):
    """One user, sequence a→b→a→c: pairs {(a,b):1,(b,a):1,(a,c):1};
    from 'a' the conditional split is 500000/500000 ppm."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hydro_raster_ray.pipelines.relational import (
        events_markov_transitions,
    )

    ts = pd.to_datetime(["2024-01-01 00:00:0%d" % i for i in range(4)])
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 4, pa.int64()),
            "event_type": pa.array(["a", "b", "a", "c"], pa.string()),
            "value": pa.array([0.0] * 4, pa.float64()),
        }),
        os.path.join(tmp_path, "events.parquet"),
    )
    got = events_markov_transitions(str(tmp_path)).to_pandas()
    by = {(r.from_type, r.to_type): (int(r.n), int(r.p_ppm))
          for r in got.itertuples()}
    assert by[("a", "b")] == (1, 500000)
    assert by[("a", "c")] == (1, 500000)
    assert by[("b", "a")] == (1, 1000000)
    assert len(by) == 3
