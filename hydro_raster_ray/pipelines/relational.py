"""Relational pipelines over the TPC-H-ish test tables.

General-engine infrastructure the tile workloads lean on (SURVEY.md §2.8):
grouped aggregation with per-batch partials, broadcast hash join (small
side via ``ray.put``), and event-time tumbling windows. Each has an exact
DuckDB oracle in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Count, Sum

__all__ = [
    "pricing_summary",
    "revenue_by_brand",
    "segment_orders",
    "events_hourly",
    "events_sliding",
    "events_sessions",
    "events_funnel",
    "order_priority_revenue",
    "returned_item_revenue",
    "orders_running_total",
    "events_top_users_per_type",
    "events_hll",
    "hll_estimate",
    "events_retention",
    "large_order_customers",
    "local_supplier_revenue",
    "events_zscore_outliers",
    "events_rfm",
    "events_path_trigrams",
    "top_unshipped_orders",
    "brand_supplier_counts",
    "nation_trade_volume",
    "promo_revenue",
    "bracket_revenue",
    "dormant_customer_balance",
    "customer_order_distribution",
    "top_supplier_revenue",
    "small_quantity_revenue",
    "market_share_by_year",
    "shipping_lag_distribution",
    "late_supplier_count",
    "forecast_revenue",
    "priority_late_orders",
    "nation_profit",
    "events_cumulative_distinct",
    "min_cost_supplier",
    "important_part_value",
    "dominant_part_suppliers",
    "events_gap_quantiles",
    "domain_mix_weights",
    "events_mad_outliers",
    "customer_revenue_gini",
    "events_markov_transitions",
    "monthly_revenue_share",
]


def pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-style pricing summary on lineitem (date-filtered, grouped by
    returnflag/linestatus). Vectorized pyarrow filter + per-batch partials."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    cutoff = pd.Timestamp("1998-09-02")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= cutoff]
        df = df.assign(revenue=df["l_extendedprice"] * (1 - df["l_discount"]))
        return df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base=("l_extendedprice", "sum"),
            sum_rev=("revenue", "sum"),
            n=("l_quantity", "size"),
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base", alias_name="sum_base"),
            Sum("sum_rev", alias_name="sum_rev"),
            Sum("n", alias_name="n"),
        )
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("sum_qty", "sum_base", "sum_rev"):
            df[c] = df[c].round(2)
        df["n"] = df["n"].astype(np.int64)
        return df

    return agg.map_batches(final, batch_format="pandas")


def revenue_by_brand(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast hash join: part (small side, ray.put once) into lineitem,
    revenue per brand. No shuffle of the big side — the partial groupby
    reduces to one row per (batch, brand)."""
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    # broadcast sorted key/value arrays, probed with np.searchsorted per
    # batch — C rate, not a per-row Python dict probe
    pk = part["p_partkey"].to_numpy()
    po = np.argsort(pk)
    lookup_ref = ray.put((pk[po], part["p_brand"].to_numpy()[po]))
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, vals = ray.get(lookup_ref)
        # every l_partkey exists in part (FK integrity), so the probe hits
        brand = vals[np.searchsorted(keys, df["l_partkey"].to_numpy())]
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        out = pd.DataFrame({"p_brand": brand, "revenue": rev, "n": 1})
        return out.groupby("p_brand", as_index=False).agg(
            revenue=("revenue", "sum"), n=("n", "sum")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("p_brand")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n", alias_name="n"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["revenue"].round(2)
        df["n"] = df["n"].astype(np.int64)
        return df

    return agg.map_batches(final, batch_format="pandas")


def segment_orders(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast join customer→orders: order count + total price per market
    segment (customer is the small side)."""
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    ck = cust["c_custkey"].to_numpy()
    co = np.argsort(ck)
    ref = ray.put((ck[co], cust["c_mktsegment"].to_numpy()[co]))
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, vals = ray.get(ref)
        # every o_custkey exists in customer (FK integrity)
        seg = vals[np.searchsorted(keys, df["o_custkey"].to_numpy())]
        out = pd.DataFrame({"c_mktsegment": seg, "total": df["o_totalprice"], "n": 1})
        return out.groupby("c_mktsegment", as_index=False).agg(
            total=("total", "sum"), n=("n", "sum")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(Sum("total", alias_name="total"), Sum("n", alias_name="n"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["total"] = df["total"].round(2)
        df["n"] = df["n"].astype(np.int64)
        return df

    return agg.map_batches(final, batch_format="pandas")


def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour event-time window per event_type: n events, sum value
    (2-dec). The stream-shaped workload expressed as floor(ts)→groupby."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hour = df["ts"].dt.floor("h")
        out = pd.DataFrame({"win_start": hour, "event_type": df["event_type"],
                            "value": df["value"], "n": 1})
        return out.groupby(["win_start", "event_type"], as_index=False).agg(
            value=("value", "sum"), n=("n", "sum")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["win_start", "event_type"])
        .aggregate(Sum("value", alias_name="sum_value"), Sum("n", alias_name="n"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(2)
        df["n"] = df["n"].astype(np.int64)
        # DuckDB timestamps are microsecond precision; match it for the
        # value-hash comparison
        df["win_start"] = df["win_start"].astype("datetime64[us]")
        return df

    return agg.map_batches(final, batch_format="pandas")


def events_sliding(sf_dir: str) -> "ray.data.Dataset":
    """SLIDING event-time windows: 1-hour windows advancing every 15
    minutes (each event lands in 4 windows). Expressed as a vectorized
    window-explosion inside ``map_batches`` (event → its 4 window starts)
    + per-batch partials + one thin groupby — the streaming-window pattern
    without materializing per-window event lists."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    step = pd.Timedelta(minutes=15)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = df["ts"].dt.floor("15min")
        frames = []
        for k in range(4):
            frames.append(
                pd.DataFrame(
                    {
                        "win_start": base - k * step,
                        "event_type": df["event_type"],
                        "value": df["value"],
                        "n": 1,
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        return out.groupby(["win_start", "event_type"], as_index=False).agg(
            value=("value", "sum"), n=("n", "sum")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["win_start", "event_type"])
        .aggregate(Sum("value", alias_name="sum_value"), Sum("n", alias_name="n"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(2)
        df["n"] = df["n"].astype(np.int64)
        df["win_start"] = df["win_start"].astype("datetime64[us]")
        return df

    return agg.map_batches(final, batch_format="pandas")


def events_sessions(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """SESSION windows per user: a session breaks after a ``gap_minutes``
    silence. ``groupby(user_id).map_groups`` sorts each user's events once
    — the canonical sessionization shuffle (partitioning assumption: one
    user's history fits a task; bucket by (user, day) with boundary merge
    beyond that). Columns: user_id, n_sessions, n_events,
    max_session_secs."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].sort_values().reset_index(drop=True)
        brk = (ts.diff() > gap).cumsum()
        by = ts.groupby(brk)
        durs = (by.max() - by.min()).dt.total_seconds()
        # scalars/lists only: a Series built from the incoming group keeps
        # the group's index, and a dict-of-Series constructor would align
        # on the index union and emit NaN-padded rows if Ray ever hands a
        # group whose index doesn't start at 0
        return pd.DataFrame(
            {
                "user_id": [np.int64(df["user_id"].iloc[0])],
                "n_sessions": [np.int64(brk.nunique())],
                "n_events": [np.int64(len(ts))],
                "max_session_secs": [float(durs.max())],
            }
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def events_funnel(
    sf_dir: str,
    steps: tuple = ("view", "click", "purchase"),
    window_hours: int = 48,
) -> "ray.data.Dataset":
    """Ordered conversion funnel per user: greedy step chain — t1 = the
    user's first ``steps[0]`` event, each later step = its first
    occurrence STRICTLY after the previous step's time and within
    ``window_hours`` of t1. The product-analytics pipeline the events
    windows family was missing (sessions/retention/top-k exist).

    Same distribution as sessionization: ``groupby(user_id).map_groups``
    co-locates each user's history once; the per-group kernel is a sorted
    scan in integer microseconds (exact parity with the SQL INTERVAL
    arithmetic — the asof-join epoch_us recipe). Users with no step-1
    event emit nothing (SQL's s1 CTE drops them identically).

    Columns: user_id, reached (1..len(steps)), us_to_last (µs from t1 to
    the final step's time, -1 unless the whole funnel completed).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    window_us = np.int64(window_hours) * 3_600_000_000

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("ts")
        us = d["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = d["event_type"].to_numpy()
        first = us[et == steps[0]]
        if first.size == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "reached": pd.Series([], dtype=np.int64),
                    "us_to_last": pd.Series([], dtype=np.int64),
                }
            )
        t1 = first[0]
        deadline = t1 + window_us
        t_prev, reached = t1, 1
        for s in steps[1:]:
            nxt = us[(et == s) & (us > t_prev) & (us <= deadline)]
            if nxt.size == 0:
                break
            t_prev = nxt[0]
            reached += 1
        return pd.DataFrame(
            {
                "user_id": [np.int64(df["user_id"].iloc[0])],
                "reached": [np.int64(reached)],
                "us_to_last": [
                    np.int64(t_prev - t1) if reached == len(steps) else np.int64(-1)
                ],
            }
        )

    return ds.groupby("user_id").map_groups(funnel, batch_format="pandas")


def order_priority_revenue(sf_dir: str, num_partitions: int | None = None) -> "ray.data.Dataset":
    """Large × large HASH JOIN via the native ``Dataset.join``: lineitem ⋈
    orders on the order key (neither side broadcast), revenue per order
    priority. The shuffle-join complement of the broadcast joins above —
    order keys are high-cardinality, so join partitions are never empty
    (the planner failure mode documented in stages/cc.py)."""
    from ..stages.cc import auto_join_partitions

    if num_partitions is None:
        num_partitions = auto_join_partitions()
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    j = li.join(
        orders, "inner", num_partitions, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def partial(df: pd.DataFrame) -> "pa.Table":
        # per-batch partials re-emitted as ARROW blocks: join lineages
        # propagate the pandas block format, and Ray's sort aggregate is
        # ~10× slower shuffling pandas blocks (ROUND4_NOTES engine lesson)
        import pyarrow as pa

        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        out = pd.DataFrame({"o_orderpriority": df["o_orderpriority"], "revenue": rev, "n": 1})
        out = out.groupby("o_orderpriority", as_index=False).agg(
            revenue=("revenue", "sum"), n=("n", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        j.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n", alias_name="n"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["revenue"].round(2)
        df["n"] = df["n"].astype(np.int64)
        return df

    return agg.map_batches(final, batch_format="pandas")


def returned_item_revenue(
    sf_dir: str, num_partitions: int | None = None, k: int = 20
) -> "ray.data.Dataset":
    """TPC-H Q10 analog: the top-k customers by revenue lost to returned
    items — the canonical 3-way join + group + top-k reporting pipeline.

    Distributed shape (one large×large exchange, everything else
    broadcast or result-sized):

    1. lineitem is filtered to ``l_returnflag = 'R'`` INSIDE the first
       map_batches after a column-pruned read (only 4 columns leave
       storage) — the big side shrinks before the join;
    2. filtered lineitem ⋈ orders on the order key via the native
       ``Dataset.join`` (high-cardinality key: join-safe), per-batch
       Arrow partial revenue sums → ``groupby(o_custkey)`` — output is
       customer-cardinality;
    3. customer and nation dims broadcast once (sorted-key arrays +
       ``searchsorted``, the segment_orders recipe) and attach name /
       nation to the aggregate;
    4. global top-k via ``sort([rounded revenue desc, custkey asc]).limit``
       over the customer-sized table — ordering uses the ROUNDED revenue
       on both the engine and SQL side so the k-boundary cannot flip on
       float last-bits.

    Columns: c_custkey, c_name, n_name, revenue (2-dec), n_items.
    """
    from ..stages.cc import auto_join_partitions

    if num_partitions is None:
        num_partitions = auto_join_partitions()
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def returned_only(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        d = df[df["l_returnflag"] == "R"]
        return pa.table(
            {
                "l_orderkey": pa.array(d["l_orderkey"].to_numpy(np.int64)),
                "rev": pa.array(
                    (d["l_extendedprice"] * (1 - d["l_discount"])).to_numpy()
                ),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    j = li.map_batches(returned_only, batch_format="pandas").join(
        orders, "inner", num_partitions, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        out = df.assign(n_items=np.int64(1)).groupby(
            "o_custkey", as_index=False
        ).agg(revenue=("rev", "sum"), n_items=("n_items", "sum"))
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        j.map_batches(partial, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(
            Sum("revenue", alias_name="revenue"),
            Sum("n_items", alias_name="n_items"),
        )
    )

    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
    ).sort_values("c_custkey")
    nat = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).sort_values("n_nationkey")
    ref = ray.put(
        (
            cust["c_custkey"].to_numpy(np.int64),
            cust["c_name"].to_numpy(dtype=object),
            cust["c_nationkey"].to_numpy(np.int64),
            nat["n_nationkey"].to_numpy(np.int64),
            nat["n_name"].to_numpy(dtype=object),
        )
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        ck, cn, cnk, nk, nn = ray.get(ref)
        # FK integrity: every o_custkey exists in customer
        ci = np.searchsorted(ck, df["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "c_custkey": df["o_custkey"].to_numpy(np.int64),
                "c_name": cn[ci],
                "n_name": nn[np.searchsorted(nk, cnk[ci])],
                "revenue": df["revenue"].round(2),
                "n_items": df["n_items"].astype(np.int64),
            }
        )

    return (
        agg.map_batches(attach, batch_format="pandas")
        .sort(key=["revenue", "c_custkey"], descending=[True, False])
        .limit(k)
    )


def events_error_asof(sf_dir: str) -> "ray.data.Dataset":
    """AS-OF join: for every click event, the most recent error event of
    the same user at-or-before its timestamp — the time-aligned enrichment
    join Ray Data lacks natively (the brief's canonical custom operator).

    Distributed as ``groupby(user_id).map_groups``: one shuffle co-locates
    each user's history, then the per-group kernel is one sort + one
    ``searchsorted`` (side='right' ⇒ inclusive ``c.ts >= e.ts``, matching
    the SQL ASOF semantics). Partitioning assumption: one user's events
    fit a task — salt hot users by (user, time-bucket) with a boundary
    carry beyond that (the sessionization note). The gap is emitted in
    exact integer microseconds (``epoch_us`` parity, no float rounding);
    clicks with no prior error carry gap −1 (a NULL would flip the whole
    column to nullable/float and break hash parity). Columns: event_id,
    user_id, gap_us."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["event_type"] == "click"]
        if len(c) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.array([], dtype="int64"),
                    "user_id": pd.array([], dtype="int64"),
                    "gap_us": pd.array([], dtype="int64"),
                }
            )
        e = df[df["event_type"] == "error"]
        cts = c["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        ets = np.sort(e["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64))
        j = np.searchsorted(ets, cts, side="right") - 1
        gap = np.full(len(c), -1, dtype=np.int64)
        hit = j >= 0
        # timestamps are parquet microseconds, so the ns difference is an
        # exact multiple of 1000 — integer µs, same value as SQL epoch_us
        gap[hit] = (cts[hit] - ets[j[hit]]) // 1000
        return pd.DataFrame(
            {
                "event_id": c["event_id"].to_numpy().astype(np.int64),
                "user_id": c["user_id"].to_numpy().astype(np.int64),
                "gap_us": gap,
            }
        )

    return ds.groupby("user_id").map_groups(asof, batch_format="pandas")


def events_error_range_join(sf_dir: str, window_s: int = 60) -> "ray.data.Dataset":
    """Range (interval) join: for every click event, the number of error
    events — any user — within ±``window_s`` seconds. The non-equi join of
    the custom-operator family (as-of = latest-before, range = all-within).

    Distributed as a BANDED join: time is bucketed at the window width,
    clicks key to their own bucket, errors replicate to buckets b−1,b,b+1
    (≤3× the small side; any error within the window of a click in b lies
    in those buckets because w = bucket width), then one groupby co-locates
    each band and the kernel is two ``searchsorted`` calls per group —
    no quadratic pair table, no global sort. Hot bands are bounded by the
    bucket width; salt by right-side chunk with partial-count sums if one
    band still overflows a task. Columns: event_id, n_err."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"]
    )
    w_us = np.int64(window_s * 1_000_000)

    def band(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64) // 1000
        bucket = us // w_us
        is_err = (df["event_type"] == "error").to_numpy()
        is_clk = (df["event_type"] == "click").to_numpy()
        ids = df["event_id"].to_numpy().astype(np.int64)
        # clicks once, errors replicated to the 3 covering bands
        parts = [
            pd.DataFrame(
                {
                    "bucket": bucket[is_clk],
                    "event_id": ids[is_clk],
                    "us": us[is_clk],
                    "side": np.zeros(int(is_clk.sum()), dtype=np.int8),
                }
            )
        ]
        if is_err.any():
            eb = bucket[is_err]
            eu = us[is_err]
            parts.append(
                pd.DataFrame(
                    {
                        "bucket": np.concatenate([eb - 1, eb, eb + 1]),
                        "event_id": np.tile(ids[is_err], 3),
                        "us": np.tile(eu, 3),
                        "side": np.ones(3 * int(is_err.sum()), dtype=np.int8),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    def count_band(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["side"] == 0]
        if len(c) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.array([], dtype="int64"),
                    "n_err": pd.array([], dtype="int64"),
                }
            )
        ets = np.sort(df.loc[df["side"] == 1, "us"].to_numpy())
        cus = c["us"].to_numpy()
        n = np.searchsorted(ets, cus + w_us, side="right") - np.searchsorted(
            ets, cus - w_us, side="left"
        )  # BETWEEN is inclusive on both ends
        return pd.DataFrame(
            {
                "event_id": c["event_id"].to_numpy(),
                "n_err": n.astype(np.int64),
            }
        )

    banded = ds.map_batches(band, batch_format="pandas")
    # clicks appear in exactly one band ⇒ one output row per click, and
    # every error replica lands in a distinct band ⇒ no double counting
    return banded.groupby("bucket").map_groups(count_band, batch_format="pandas")


def orders_running_total(sf_dir: str) -> "ray.data.Dataset":
    """Per-customer running order balance: for every order, the cumulative
    sum of ``o_totalprice`` over that customer's orders in
    ``(o_orderdate, o_orderkey)`` order — the windowed-prefix-sum shape
    (SQL ``SUM() OVER (PARTITION BY ... ORDER BY ...)``) every ledger /
    feature-backfill pipeline needs.

    Distributed as ``groupby(o_custkey).map_groups``: one hash shuffle
    co-locates each customer's orders, then an in-group sort + cumsum —
    embarrassingly parallel across customers (partitioning assumption: one
    customer's order history fits a task; TPC-H-shaped data keeps groups
    tiny and the key space wide, so no salting needed). Prices are summed
    as exact integer CENTS (``round(price·100)``) so the running total is
    order-independent integer math and hash-matches the SQL window oracle
    with zero float-accumulation hazards. Columns: o_orderkey, o_custkey,
    run_cents."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderdate", "o_orderkey"])
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "o_custkey": df["o_custkey"].to_numpy(np.int64),
                "run_cents": np.cumsum(cents),
            }
        )

    return ds.groupby("o_custkey").map_groups(running, batch_format="pandas")


def events_top_users_per_type(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Top-``k`` users by event count per event type — the grouped-top-k
    shape (leaderboards, per-class exemplar picks). Rank is
    (count DESC, user_id ASC), deterministic because counts are exact
    integers.

    Distributed: per-batch partial (type, user) counts → one thin
    ``groupby`` whose output is |types|·|users|-bounded (≪ events) → the
    partial-top-k prune pattern (each block emits ≤ k·|types| candidate
    rows, one single-block merge; no global sort). Columns: event_type,
    user_id, n_events, rank."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        out = df.groupby(["event_type", "user_id"], as_index=False).agg(
            n=("user_id", "size")
        )
        out["n"] = out["n"].astype(np.int64)
        # Arrow out: feeds a groupby (pandas blocks poison the shuffle)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("n", alias_name="n_events"))
    )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["event_type", "n_events", "user_id"],
            ascending=[True, False, True],
        ).reset_index(drop=True)
        rank = df.groupby("event_type").cumcount() + 1
        out = df[rank <= k].copy()
        out["rank"] = rank[rank <= k].astype(np.int64)
        out["user_id"] = out["user_id"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out[["event_type", "user_id", "n_events", "rank"]]

    cand = counts.map_batches(prune, batch_format="pandas", batch_size=None)
    # ≤ k·|types| rows per upstream block: single-block exact merge
    return cand.repartition(1).map_batches(
        prune, batch_format="pandas", batch_size=None
    )


def events_hll(sf_dir: str, column: str = "user_id") -> "ray.data.Dataset":
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007, public
    literature) over an events column — the mergeable streaming sketch a
    100-TB pipeline uses where exact COUNT(DISTINCT) would shuffle every
    row. 256 registers; hash = ``splitmix64`` (the engine's vectorized
    primitive), register = top 8 hash bits, rho = 1 + leading-zero count
    of the remaining 56 bits (0-remainder → 57).

    Insert is idempotent (same key → same register/rho), so NO distinct
    pass is needed: each batch reduces to its 256 partial register maxima
    (``np.maximum.at``; rho extracted exactly via unpackbits — float log2
    would mis-round near powers of two), then one 256-key ``groupby.Max``
    merges batches — registers are what a multi-node merge ships, ~2 KB
    per node regardless of corpus size. Returns all 256 rows (reg, rho);
    rho=0 marks a never-touched register. The estimate derivation is
    driver-side arithmetic over this table (see tests)."""
    from ..hashvec import splitmix64

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=[column])

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        h = splitmix64(df[column].to_numpy(np.int64).view(np.uint64))
        reg = (h >> np.uint64(56)).astype(np.int64)
        rem = h & np.uint64((1 << 56) - 1)
        bits = np.unpackbits(
            rem.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
        )[:, 8:]
        any_set = bits.any(axis=1)
        rho = np.where(any_set, bits.argmax(axis=1) + 1, 57).astype(np.int64)
        regs = np.zeros(256, dtype=np.int64)
        np.maximum.at(regs, reg, rho)
        return pa.table(
            {
                "reg": pa.array(np.arange(256, dtype=np.int64), pa.int64()),
                "rho": pa.array(regs, pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    # batch_size=None: one 256-row register table per BLOCK enters the
    # merge (the per-block partial/combiner convention)
    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("reg")
        .aggregate(Max("rho", alias_name="rho"))
    )


def hll_estimate(registers: "pd.DataFrame") -> float:
    """Standard HLL estimate from the (reg, rho) table (m=256, alpha for
    m ≥ 128, with the small-range linear-counting correction)."""
    rho = registers.sort_values("reg")["rho"].to_numpy(np.int64)
    m = rho.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -rho.astype(np.float64)))
    zeros = int((rho == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def events_retention(sf_dir: str) -> "ray.data.Dataset":
    """Day-over-day retention: per activity day, how many users were
    active that day AND the next (attributed to the first day) — the
    cohort-retention join expressed without a self-join of the event log.

    Shape: per-batch DISTINCT (user, day) partials → one
    ``groupby(user, day)`` dedup (the only corpus-wide shuffle, on the
    high-cardinality pair key) → ``groupby(user).map_groups`` finds each
    user's consecutive-day pairs with one sort + diff (per-user history
    fits a task; the sessionization contract) → thin ``groupby(day)``
    sums. All counts exact ints. Columns: day, n_active, n_retained."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def distinct_pairs(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        out = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64),
             "day": df["ts"].dt.floor("D")}
        ).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = (
        ds.map_batches(distinct_pairs, batch_format="pandas")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="_n"))
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        days = np.sort(df["day"].to_numpy().astype("datetime64[D]"))
        nxt = (np.diff(days.astype(np.int64)) == 1)
        return pd.DataFrame(
            {
                "day": days.astype("datetime64[us]"),
                "act": np.ones(days.size, np.int64),
                "ret": np.r_[nxt, False].astype(np.int64),
            }
        )

    per_day = pairs.groupby("user_id").map_groups(
        per_user, batch_format="pandas"
    )

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        out = df.groupby("day", as_index=False).agg(
            act=("act", "sum"), ret=("ret", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        per_day.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(
            Sum("act", alias_name="n_active"),
            Sum("ret", alias_name="n_retained"),
        )
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": df["day"].astype("datetime64[us]"),
                "n_active": df["n_active"].astype(np.int64),
                "n_retained": df["n_retained"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pandas")

def large_order_customers(
    sf_dir: str, min_qty: float = 300.0, k: int = 100
) -> "ray.data.Dataset":
    """TPC-H Q18 analog: orders whose total lineitem quantity exceeds
    ``min_qty``, with the owning customer attached — the canonical
    HAVING-filtered-aggregate semi-join.

    Distributed shape:

    1. lineitem, pruned to two columns, per-batch partial sums →
       ``groupby(l_orderkey)`` (the one high-cardinality exchange; the
       aggregate IS the operator);
    2. the HAVING filter runs distributed, so only qualifying orders
       reach the driver — by construction an extreme-tail fraction
       (``min_qty`` sits past the sum-of-quantities p99; 46 of 15 000
       orders on the sf0.01 fixture). The qualifying (orderkey, qty)
       set is broadcast once via ``ray.put``;
    3. orders is scanned with a ``searchsorted`` membership probe (a
       broadcast semi-join — the big side never shuffles), customer
       name attached from a second broadcast;
    4. global top-k by (o_totalprice desc, o_orderkey) over the tiny
       survivor set. o_totalprice is a raw stored column (no float
       reassociation), so the ordering is identical on the SQL side.

    Columns: c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
    sum_qty (2-dec).
    """
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        out = df.groupby("l_orderkey", as_index=False).agg(
            sum_qty=("l_quantity", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("l_orderkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"))
    )
    def having(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["sum_qty"] > min_qty]

    # distributed HAVING (vectorized batch filter, not a per-row lambda):
    # qualifying orders are an extreme-tail fraction, so this to_pandas()
    # is result-sized (not corpus-sized) by design
    qual = (
        agg.map_batches(having, batch_format="pandas")
        .to_pandas()
        .sort_values("l_orderkey")
    )
    qk = qual["l_orderkey"].to_numpy(np.int64)
    qq = qual["sum_qty"].to_numpy()

    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).sort_values("c_custkey")
    ref = ray.put(
        (qk, qq, cust["c_custkey"].to_numpy(np.int64),
         cust["c_name"].to_numpy(dtype=object))
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        okeys, oqty, ck, cn = ray.get(ref)
        keys = df["o_orderkey"].to_numpy(np.int64)
        pos = np.searchsorted(okeys, keys)
        pos_c = np.minimum(pos, okeys.size - 1) if okeys.size else pos
        hit = (okeys.size > 0) & (okeys[pos_c] == keys)
        d = df[hit]
        ci = np.searchsorted(ck, d["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "c_custkey": d["o_custkey"].to_numpy(np.int64),
                "c_name": cn[ci],
                "o_orderkey": d["o_orderkey"].to_numpy(np.int64),
                "o_orderdate": d["o_orderdate"].astype("datetime64[us]"),
                "o_totalprice": d["o_totalprice"].to_numpy(),
                "sum_qty": np.round(oqty[pos_c[hit]], 2),
            }
        )

    return (
        orders.map_batches(probe, batch_format="pandas")
        .sort(key=["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def local_supplier_revenue(
    sf_dir: str, region: str = "ASIA", num_partitions: int | None = None
) -> "ray.data.Dataset":
    """TPC-H Q5 analog: revenue from lineitems where the supplier and the
    ordering customer sit in the SAME nation, restricted to one region,
    grouped by nation — the canonical multiway star join.

    Distributed shape: all four dimension tables (customer, supplier,
    nation, region) broadcast once as sorted key arrays; both fact scans
    prune to region-local rows INSIDE their first map_batches (orders →
    customer-nation attach + filter, lineitem → supplier-nation attach +
    filter), so the one large×large ``Dataset.join`` on the order key
    exchanges only region-local survivors. The same-nation equality
    filter and per-batch revenue partials run post-join; final output is
    nation-cardinality. Columns: n_name, revenue (2-dec), n (BIGINT),
    ordered by (revenue desc, n_name).
    """
    from ..stages.cc import auto_join_partitions

    if num_partitions is None:
        num_partitions = auto_join_partitions()

    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).sort_values("c_custkey")
    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).sort_values("s_suppkey")
    nat = pd.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).sort_values("n_nationkey")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rkeys = set(
        reg.loc[reg["r_name"] == region, "r_regionkey"].astype(int).tolist()
    )
    in_region = nat["n_regionkey"].astype(int).isin(rkeys).to_numpy()
    nat_keys = nat["n_nationkey"].to_numpy(np.int64)
    nat_in = in_region.astype(bool)
    ref = ray.put(
        (
            cust["c_custkey"].to_numpy(np.int64),
            cust["c_nationkey"].to_numpy(np.int64),
            supp["s_suppkey"].to_numpy(np.int64),
            supp["s_nationkey"].to_numpy(np.int64),
            nat_keys,
            nat_in,
            nat["n_name"].to_numpy(dtype=object),
        )
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def orders_local(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        ck, cnk, _, _, nk, nin, _ = ray.get(ref)
        cn = cnk[np.searchsorted(ck, df["o_custkey"].to_numpy(np.int64))]
        keep = nin[np.searchsorted(nk, cn)]
        return pa.table(
            {
                "o_orderkey": pa.array(
                    df["o_orderkey"].to_numpy(np.int64)[keep]
                ),
                "cust_nat": pa.array(cn[keep]),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def lineitem_local(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        _, _, sk, snk, nk, nin, _ = ray.get(ref)
        sn = snk[np.searchsorted(sk, df["l_suppkey"].to_numpy(np.int64))]
        keep = nin[np.searchsorted(nk, sn)]
        d = df[keep]
        return pa.table(
            {
                "l_orderkey": pa.array(d["l_orderkey"].to_numpy(np.int64)),
                "supp_nat": pa.array(sn[keep]),
                "rev": pa.array(
                    (d["l_extendedprice"] * (1 - d["l_discount"])).to_numpy()
                ),
            }
        )

    j = li.map_batches(lineitem_local, batch_format="pandas").join(
        orders.map_batches(orders_local, batch_format="pandas"),
        "inner",
        num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        d = df[df["supp_nat"].to_numpy() == df["cust_nat"].to_numpy()]
        out = d.assign(n=np.int64(1)).groupby("supp_nat", as_index=False).agg(
            revenue=("rev", "sum"), n=("n", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        j.map_batches(partial, batch_format="pandas")
        .groupby("supp_nat")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n", alias_name="n"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        _, _, _, _, nk, _, nname = ray.get(ref)
        return pd.DataFrame(
            {
                "n_name": nname[
                    np.searchsorted(nk, df["supp_nat"].to_numpy(np.int64))
                ],
                "revenue": df["revenue"].round(2),
                "n": df["n"].astype(np.int64),
            }
        )

    return (
        agg.map_batches(final, batch_format="pandas")
        .sort(key=["revenue", "n_name"], descending=[True, False])
    )

def events_zscore_outliers(
    sf_dir: str, event_type: str = "purchase", min_n: int = 5,
    thresh: float = 2.0,
) -> "ray.data.Dataset":
    """Per-user z-score anomaly flagging over one event type: events whose
    value sits more than ``thresh`` sample standard deviations from that
    user's own mean — the grouped-moments outlier detector.

    Exactness contract: values are quantized to integer cents FIRST, so
    the per-user moments (n, Σc, Σc²) are exact int64 sums — order-free,
    shuffle-safe, and bit-identical to the SQL side. The float z-score is
    then ONE identical double expression on both sides
    (``(c - S/n) / sqrt((SS - S·S/n)/(n-1))``), so hash parity is by
    construction, not by luck.

    Shape: pass 1 computes per-user moments via per-batch partials + one
    ``groupby(user_id)`` (user-cardinality output); pass 2 re-scans events
    with the moment table broadcast (sorted-key ``searchsorted`` probe —
    at user counts past a broadcast budget this becomes the
    ``rarity_scores`` hash-join path; same recipe). Columns: event_id,
    user_id, cents, z (6-dec), ordered by event_id.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    )

    def cents_only(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        d = df[df["event_type"] == event_type]
        return pa.table(
            {
                "event_id": pa.array(d["event_id"].to_numpy(np.int64)),
                "user_id": pa.array(d["user_id"].to_numpy(np.int64)),
                "cents": pa.array(
                    np.round(d["value"].to_numpy() * 100).astype(np.int64)
                ),
            }
        )

    ev = ds.map_batches(cents_only, batch_format="pandas")

    def moments(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        c = df["cents"].to_numpy(np.int64)
        out = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64),
             "n": np.int64(1), "s": c, "ss": c * c}
        ).groupby("user_id", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    mom = (
        ev.map_batches(moments, batch_format="pandas")
        .groupby("user_id")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
    )
    # user-cardinality table; broadcast is the fixture-scale path (the
    # rarity_scores budgeted hash-join recipe is the >budget upgrade)
    mdf = mom.to_pandas().sort_values("user_id")
    ref = ray.put(
        (
            mdf["user_id"].to_numpy(np.int64),
            mdf["n"].to_numpy(np.int64),
            mdf["s"].to_numpy(np.int64),
            mdf["ss"].to_numpy(np.int64),
        )
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        uk, un, us, uss = ray.get(ref)
        ui = np.searchsorted(uk, df["user_id"].to_numpy(np.int64))
        n = un[ui].astype(np.float64)
        s = us[ui].astype(np.float64)
        ss = uss[ui].astype(np.float64)
        c = df["cents"].to_numpy(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (ss - s * s / n) / (n - 1.0)
            z = (c - s / n) / np.sqrt(var)
        keep = (un[ui] >= min_n) & (var > 0) & (np.abs(z) > thresh)
        d = df[keep]
        return pd.DataFrame(
            {
                "event_id": d["event_id"].to_numpy(np.int64),
                "user_id": d["user_id"].to_numpy(np.int64),
                "cents": d["cents"].to_numpy(np.int64),
                "z": np.round(z[keep], 6),
            }
        )

    return ev.map_batches(score, batch_format="pandas").sort("event_id")

def _global_ranks(
    ds: "ray.data.Dataset", col: str, tie_col: str = "user_id",
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Exact distributed global ranking (SQL ``row_number() OVER (ORDER BY
    col, tie_col)``, 0-based) — the primitive Ray Data lacks natively.

    Range-bucket + ordered prefix offsets (the ``pack_chunks`` scan
    recipe, generalized to an arbitrary value column):

    1. bucket boundaries come from a small deterministic per-block sample
       — boundary QUALITY only affects bucket balance, never rank
       correctness, so the sample can be sloppy; equal values always land
       in one bucket (``searchsorted(..., 'right')``), so cross-bucket
       order is total;
    2. per-bucket counts → driver exclusive prefix (≤ n_buckets rows —
       the only driver state) → broadcast;
    3. ``groupby(bucket).map_groups``: sort by (col, tie_col), local
       arange + the bucket's offset.

    Adds column ``rank_<col>`` to the (col, tie_col) rows. Results are
    parallelism-independent: block structure moves bucket boundaries, not
    ranks."""
    sample = ds.map_batches(
        lambda df: df.iloc[:: max(1, len(df) // 4) or 1][[col]],
        batch_format="pandas",
    ).to_pandas()  # a few rows per block — block-cardinality, not corpus
    vals = np.sort(sample[col].to_numpy())
    bounds = np.unique(
        vals[:: max(1, vals.size // n_buckets) or 1][1:]
    ).astype(np.float64)
    bref = ray.put(bounds)

    def assign(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        b = ray.get(bref)
        return pa.Table.from_pandas(
            df.assign(
                _bkt=np.searchsorted(b, df[col].to_numpy(np.float64),
                                     side="right").astype(np.int64)
            ),
            preserve_index=False,
        )

    with_b = ds.map_batches(assign, batch_format="pandas")
    counts = (
        with_b.map_batches(
            lambda df: df.groupby("_bkt", as_index=False).agg(
                n=("_bkt", "size")
            ),
            batch_format="pandas",
        )
        .groupby("_bkt")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ n_buckets rows
        .sort_values("_bkt")
    )
    bk = counts["_bkt"].to_numpy(np.int64)
    offs = np.r_[
        np.zeros(1, np.int64), np.cumsum(counts["n"].to_numpy(np.int64))[:-1]
    ]
    oref = ray.put((bk, offs))

    def local_rank(df: pd.DataFrame) -> pd.DataFrame:
        b_arr, o_arr = ray.get(oref)
        df = df.sort_values([col, tie_col]).reset_index(drop=True)
        off0 = int(o_arr[np.searchsorted(b_arr, int(df["_bkt"].iloc[0]))])
        df[f"rank_{col}"] = off0 + np.arange(len(df), dtype=np.int64)
        return df.drop(columns=["_bkt"])

    return with_b.groupby("_bkt").map_groups(local_rank, batch_format="pandas")


def events_rfm(sf_dir: str, n_tiers: int = 4) -> "ray.data.Dataset":
    """RFM segmentation: per-user Recency (whole days before the corpus'
    last event), Frequency (event count) and Monetary (exact cents), each
    tiered into quartiles by EXACT global rank under the total order
    (metric, user_id) — ``tier = rank · n_tiers // n`` (0-based rank), the
    deterministic NTILE that cannot flip on ties.

    Shape: one ``groupby(user_id)`` builds the user table (Max ts / Count
    / Sum cents partials), then three ``_global_ranks`` passes (the
    distributed row_number primitive) attach the tier ranks; everything
    driver-side is bucket- or boundary-sized. Columns: user_id, r_days,
    freq, cents, r_tier, f_tier, m_tier, ordered by user_id."""
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Max as _Max

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    tmax = pd.Timestamp(ds.max("ts")).value // 1000  # epoch µs

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
                "cents": np.round(df["value"].to_numpy() * 100).astype(
                    np.int64
                ),
                "n": np.int64(1),
            }
        ).groupby("user_id", as_index=False).agg(
            ts_us=("ts_us", "max"), cents=("cents", "sum"), n=("n", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    users = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(
            _Max("ts_us", alias_name="ts_us"),
            Sum("cents", alias_name="cents"),
            Sum("n", alias_name="freq"),
        )
    )
    n_users = users.count()

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "r_days": (tmax - df["ts_us"].to_numpy(np.int64))
                // 86_400_000_000,
                "freq": df["freq"].to_numpy(np.int64),
                "cents": df["cents"].to_numpy(np.int64),
            }
        )

    u = users.map_batches(metrics, batch_format="pandas")
    for col in ("r_days", "freq", "cents"):
        u = _global_ranks(u, col)

    def tiers(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "r_days": df["r_days"].to_numpy(np.int64),
                "freq": df["freq"].to_numpy(np.int64),
                "cents": df["cents"].to_numpy(np.int64),
            }
        )
        for col, name in (("r_days", "r_tier"), ("freq", "f_tier"),
                          ("cents", "m_tier")):
            out[name] = (
                df[f"rank_{col}"].to_numpy(np.int64) * n_tiers // n_users
            )
        return out

    return u.map_batches(tiers, batch_format="pandas").sort("user_id")


def events_path_trigrams(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Top-k 3-step event-type paths: per user, consecutive event-type
    trigrams under the total order (ts, event_id), counted corpus-wide —
    the session-path mining kernel. Exact int counts; top-k by
    (n desc, path asc) is a total order. Shape: one ``groupby(user_id)``
    co-locates each user's stream (the sessionization contract), the
    trigram emit is a vectorized shift inside ``map_groups``, then a thin
    ``groupby(path)`` and a result-sized sort+limit."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id",
                                             "event_type"]
    )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        et = df["event_type"].to_numpy(dtype=object)
        if et.size < 3:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        path = et[:-2] + ">" + et[1:-1] + ">" + et[2:]
        out = pd.DataFrame({"path": path, "n": np.int64(1)})
        return out.groupby("path", as_index=False).agg(n=("n", "sum"))

    agg = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype(np.int64)
        return df

    return (
        agg.map_batches(final, batch_format="pandas")
        .sort(key=["n", "path"], descending=[True, False])
        .limit(k)
    )


def top_unshipped_orders(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-05-15",
    k: int = 10,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q3 analog: the top-k highest-revenue orders placed before
    ``cutoff`` in one market segment whose lineitems ship after it — the
    shipping-priority query (reference scope: the general grouped-join
    analytics layer of SURVEY.md §2.8).

    Distributed shape:

    1. the segment's customer keys broadcast once as a sorted int64
       array (``ray.put`` — the ``local_supplier_revenue`` budgeted
       small-side convention; past the budget this becomes the hash-join
       path, same recipe);
    2. orders scans with the date filter + a ``searchsorted`` membership
       probe fused into ONE map_batches (the big side sheds ~all rows
       before any exchange); the timestamp is carried as int64 epoch-us
       so it can serve as a groupby key;
    3. lineitem scans with the ship-date filter and per-batch partial
       sums keyed on l_orderkey (revenue + line count), shrinking the
       exchange to near order-cardinality;
    4. ONE large×large ``Dataset.join`` on the order key, then the
       order-key groupby (date/priority ride along as functionally
       dependent keys);
    5. global top-k on the ROUNDED revenue (both sides order by the
       same rounded value, so the k boundary cannot flip), tie-broken
       by (o_orderdate, o_orderkey).

    Columns: o_orderkey, revenue (2-dec), o_orderdate, o_orderpriority,
    n_items.
    """
    from ..stages.cc import auto_join_partitions

    if num_partitions is None:
        num_partitions = auto_join_partitions()
    cut = pd.Timestamp(cutoff)

    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg_keys = np.sort(
        cust.loc[cust["c_mktsegment"] == segment, "c_custkey"]
        .to_numpy(np.int64)
    )
    ref = ray.put(seg_keys)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def orders_probe(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        ck = ray.get(ref)
        d = df[df["o_orderdate"] < cut]
        keys = d["o_custkey"].to_numpy(np.int64)
        pos = np.searchsorted(ck, keys)
        pos_c = np.minimum(pos, ck.size - 1) if ck.size else pos
        hit = (ck.size > 0) & (ck[pos_c] == keys)
        d = d[hit]
        return pa.table(
            {
                "o_orderkey": pa.array(d["o_orderkey"].to_numpy(np.int64)),
                "o_date_us": pa.array(
                    d["o_orderdate"].astype("datetime64[us]").astype(np.int64)
                ),
                "o_orderpriority": pa.array(
                    d["o_orderpriority"].astype(str).tolist(), pa.string()
                ),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        d = df[df["l_shipdate"] > cut]
        rev = (d["l_extendedprice"] * (1 - d["l_discount"])).to_numpy()
        out = (
            pd.DataFrame(
                {
                    "l_orderkey": d["l_orderkey"].to_numpy(np.int64),
                    "revenue": rev,
                    "n_items": np.int64(1),
                }
            )
            .groupby("l_orderkey", as_index=False)
            .agg(revenue=("revenue", "sum"), n_items=("n_items", "sum"))
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    j = li.map_batches(li_partial, batch_format="pandas").join(
        orders.map_batches(orders_probe, batch_format="pandas"),
        "inner",
        num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    agg = j.groupby(["l_orderkey", "o_date_us", "o_orderpriority"]).aggregate(
        Sum("revenue", alias_name="revenue"),
        Sum("n_items", alias_name="n_items"),
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["l_orderkey"].astype(np.int64),
                "revenue": df["revenue"].round(2),
                "o_orderdate": df["o_date_us"].astype("datetime64[us]"),
                "o_orderpriority": df["o_orderpriority"],
                "n_items": df["n_items"].astype(np.int64),
                "_dus": df["o_date_us"].astype(np.int64),
            }
        )

    return (
        agg.map_batches(final, batch_format="pandas")
        .sort(key=["revenue", "_dus", "o_orderkey"],
              descending=[True, False, False])
        .limit(k)
        .drop_columns(["_dus"])
    )


def brand_supplier_counts(
    sf_dir: str, max_size: int = 25, num_partitions: int | None = None
) -> "ray.data.Dataset":
    """TPC-H Q16-style distinct-count: for every part brand (parts below
    ``max_size``), how many DISTINCT suppliers shipped it and how many
    lineitems that took — the exact distributed COUNT(DISTINCT) shape.

    Distributed shape: part's (key → brand, size-filtered) broadcast once
    as sorted arrays; lineitem attaches the brand per batch with a
    ``searchsorted`` probe and PRE-COLLAPSES to per-batch (brand,
    suppkey, n_lines) partials — the exchange carries at most
    |brands|×|suppliers| rows per batch, not lineitems. One
    ``groupby(brand, suppkey)`` makes pairs globally unique (exact, no
    sketch); the second groupby is pair-cardinality and counts rows per
    brand. All values integer — bit-exact vs SQL. For an approximate
    one-exchange variant at unbounded pair cardinality see
    ``events_hll`` (same partial/merge skeleton, HLL registers).

    Columns: p_brand, n_suppliers, n_lines (ordered by p_brand).
    """
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    part = part[part["p_size"] < max_size].sort_values("p_partkey")
    ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            part["p_brand"].to_numpy(dtype=object),
        )
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        pk, pb = ray.get(ref)
        keys = df["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(pk, keys)
        pos_c = np.minimum(pos, pk.size - 1) if pk.size else pos
        hit = (pk.size > 0) & (pk[pos_c] == keys)
        out = (
            pd.DataFrame(
                {
                    "p_brand": pb[pos_c[hit]],
                    "l_suppkey": df["l_suppkey"].to_numpy(np.int64)[hit],
                    "n_lines": np.int64(1),
                }
            )
            .groupby(["p_brand", "l_suppkey"], as_index=False)
            .agg(n_lines=("n_lines", "sum"))
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = (
        li.map_batches(partial, batch_format="pandas")
        .groupby(["p_brand", "l_suppkey"])
        .aggregate(Sum("n_lines", alias_name="n_lines"))
    )

    def pair_partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        out = (
            df.assign(n_suppliers=np.int64(1))
            .groupby("p_brand", as_index=False)
            .agg(n_suppliers=("n_suppliers", "sum"),
                 n_lines=("n_lines", "sum"))
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        pairs.map_batches(pair_partial, batch_format="pandas")
        .groupby("p_brand")
        .aggregate(
            Sum("n_suppliers", alias_name="n_suppliers"),
            Sum("n_lines", alias_name="n_lines"),
        )
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["n_suppliers"] = df["n_suppliers"].astype(np.int64)
        df["n_lines"] = df["n_lines"].astype(np.int64)
        return df

    return agg.map_batches(final, batch_format="pandas").sort(key="p_brand")


def nation_trade_volume(
    sf_dir: str,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_8",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """TPC-H Q7 analog: shipping volume between two nations by year —
    lineitems whose SUPPLIER sits in one nation and whose ordering
    CUSTOMER sits in the other, shipped 1996-1997, grouped by
    (supp_nation, cust_nation, year).

    Distributed shape (the Q5 recipe): customer/supplier/nation key
    arrays broadcast once; BOTH fact scans prune to the two target
    nations inside their first map_batches (the pair filter keeps ~8 %
    of rows per side at uniform nation assignment, (2/25)², of the
    join), so the one large×large order-key ``Dataset.join`` exchanges
    only survivors. The cross-pair (A→B / B→A) inequality filter and
    revenue partials run post-join; output is 2×years rows. Columns:
    supp_nation, cust_nation, l_year (BIGINT), revenue (2-dec),
    n (BIGINT), ordered by (supp_nation, cust_nation, l_year).
    """
    from ..stages.cc import auto_join_partitions

    if num_partitions is None:
        num_partitions = auto_join_partitions()

    nat = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    by_name = dict(zip(nat["n_name"], nat["n_nationkey"].astype(np.int64)))
    ka, kb = int(by_name[nation_a]), int(by_name[nation_b])
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).sort_values("c_custkey")
    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).sort_values("s_suppkey")
    ref = ray.put(
        (
            cust["c_custkey"].to_numpy(np.int64),
            cust["c_nationkey"].to_numpy(np.int64),
            supp["s_suppkey"].to_numpy(np.int64),
            supp["s_nationkey"].to_numpy(np.int64),
        )
    )
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
            "l_shipdate",
        ],
    )

    def li_side(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        _, _, sk, snk = ray.get(ref)
        df = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        sn = snk[np.searchsorted(sk, df["l_suppkey"].to_numpy(np.int64))]
        keep = (sn == ka) | (sn == kb)
        d = df[keep]
        return pa.table(
            {
                "l_orderkey": pa.array(d["l_orderkey"].to_numpy(np.int64)),
                "supp_nat": pa.array(sn[keep]),
                "l_year": pa.array(
                    d["l_shipdate"].dt.year.to_numpy(np.int64)
                ),
                "rev": pa.array(
                    (d["l_extendedprice"] * (1 - d["l_discount"])).to_numpy()
                ),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def o_side(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        ck, cnk, _, _ = ray.get(ref)
        cn = cnk[np.searchsorted(ck, df["o_custkey"].to_numpy(np.int64))]
        keep = (cn == ka) | (cn == kb)
        return pa.table(
            {
                "o_orderkey": pa.array(
                    df["o_orderkey"].to_numpy(np.int64)[keep]
                ),
                "cust_nat": pa.array(cn[keep]),
            }
        )

    j = li.map_batches(li_side, batch_format="pandas").join(
        orders.map_batches(o_side, batch_format="pandas"),
        "inner",
        num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        d = df[df["supp_nat"].to_numpy() != df["cust_nat"].to_numpy()]
        out = (
            d.assign(n=np.int64(1))
            .groupby(["supp_nat", "cust_nat", "l_year"], as_index=False)
            .agg(revenue=("rev", "sum"), n=("n", "sum"))
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        j.map_batches(partial, batch_format="pandas")
        .groupby(["supp_nat", "cust_nat", "l_year"])
        .aggregate(Sum("revenue", alias_name="revenue"),
                   Sum("n", alias_name="n"))
    )
    names = {ka: nation_a, kb: nation_b}

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "supp_nation": df["supp_nat"].map(names),
                "cust_nation": df["cust_nat"].map(names),
                "l_year": df["l_year"].astype(np.int64),
                "revenue": df["revenue"].round(2),
                "n": df["n"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pandas").sort(
        key=["supp_nation", "cust_nation", "l_year"]
    )


def promo_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q14 analog: share of September-1997 revenue from PROMO-type
    parts. part (small side) broadcast once as a sorted key array + an
    is-promo bool array; the lineitem scan reduces to per-batch
    (promo_rev, total_rev, counts) partials and ONE global row — no
    shuffle at all beyond the scalar combine. The percentage is computed
    from the two ROUNDED 2-dec sums on both sides (deterministic given
    the rounded operands). Columns: promo_revenue, total_revenue,
    promo_pct (4-dec), n_items (BIGINT).
    """
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).sort_values("p_partkey")
    ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            (part["p_type"] == "PROMO").to_numpy(bool),
        )
    )
    lo, hi = pd.Timestamp("1997-09-01"), pd.Timestamp("1997-10-01")
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pk, promo = ray.get(ref)
        df = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        isp = promo[np.searchsorted(pk, df["l_partkey"].to_numpy(np.int64))]
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        return pd.DataFrame(
            {
                "k": [np.int64(1)],
                "promo_rev": [float(rev[isp].sum())],
                "total_rev": [float(rev.sum())],
                "n_items": [np.int64(len(rev))],
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("k")
        .aggregate(
            Sum("promo_rev", alias_name="promo_rev"),
            Sum("total_rev", alias_name="total_rev"),
            Sum("n_items", alias_name="n_items"),
        )
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        pr = df["promo_rev"].round(2)
        tr = df["total_rev"].round(2)
        return pd.DataFrame(
            {
                "promo_revenue": pr,
                "total_revenue": tr,
                "promo_pct": (100.0 * pr / tr).round(4),
                "n_items": df["n_items"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pandas")


_BRACKETS = (
    ("B1", "Brand#12", 1, 5, 1.0, 11.0),
    ("B2", "Brand#23", 1, 10, 10.0, 20.0),
    ("B3", "Brand#4", 1, 15, 20.0, 30.0),
)


def bracket_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q19 analog: revenue from three OR'd (brand, size-range,
    quantity-range) brackets — the canonical pushed-down OR-of-ANDs
    predicate. part attributes broadcast once (sorted key + brand/size
    arrays); each lineitem batch evaluates all three bracket masks
    vectorized and pre-collapses to ≤3 partial rows, so the only
    exchange is a 3-group combine. Columns: bracket, revenue (2-dec),
    n (BIGINT), ordered by bracket.
    """
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).sort_values("p_partkey")
    ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            part["p_brand"].to_numpy(dtype=object),
            part["p_size"].to_numpy(np.int64),
        )
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pk, brand, size = ray.get(ref)
        idx = np.searchsorted(pk, df["l_partkey"].to_numpy(np.int64))
        b, s = brand[idx], size[idx]
        qty = df["l_quantity"].to_numpy()
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        rows = []
        for name, bb, s_lo, s_hi, q_lo, q_hi in _BRACKETS:
            m = (b == bb) & (s >= s_lo) & (s <= s_hi)
            m &= (qty >= q_lo) & (qty <= q_hi)
            if m.any():
                rows.append(
                    (name, float(rev[m].sum()), np.int64(int(m.sum())))
                )
        # typed even when empty — a dtype-less empty frame flips the
        # streamed block schema and trips the executor's schema check
        return pd.DataFrame(
            {
                "bracket": pd.Series([r[0] for r in rows], dtype=object),
                "revenue": pd.Series([r[1] for r in rows], dtype=np.float64),
                "n": pd.Series([r[2] for r in rows], dtype=np.int64),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bracket")
        .aggregate(Sum("revenue", alias_name="revenue"),
                   Sum("n", alias_name="n"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["revenue"].round(2)
        df["n"] = df["n"].astype(np.int64)
        return df

    return agg.map_batches(final, batch_format="pandas").sort(key="bracket")


def dormant_customer_balance(
    sf_dir: str, since: str = "2001-01-01"
) -> "ray.data.Dataset":
    """TPC-H Q22 analog: customers whose balance exceeds the positive-
    balance average but who placed NO order since ``since`` — counted
    and summed per nation. The anti-join pattern at scale.

    Distributed shape: (1) the global positive-balance average is an
    EXACT integer-cents (sum, count) streaming aggregate — the
    above-average filter compares ``cents·n > total`` in int64, so the
    boundary cannot float-flip; (2) the anti-join is the tag-union
    pattern: above-average survivors (is_cust=1) union the date-pruned,
    per-batch-deduplicated recent-buyer keys (is_ord=1), ONE custkey
    groupby, keep groups with a customer row and zero order rows — no
    broadcast of the (at-scale large) buyer set, and global buyer dedup
    rides the same exchange. (Ray 2.49's ``left_outer`` Dataset.join
    raises ArrowInvalid when a hash partition's left side is empty —
    the tag-union shape is both safe there and one exchange cheaper.)
    Columns: c_nationkey (BIGINT), n_cust (BIGINT), total_acctbal
    (exact, from int cents), ordered by c_nationkey.
    """
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def cents_cols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"].to_numpy(np.int64),
                "c_nationkey": df["c_nationkey"].to_numpy(np.int64),
                "cents": np.round(df["c_acctbal"].to_numpy() * 100)
                .astype(np.int64),
            }
        )

    cust_c = cust.map_batches(cents_cols, batch_format="pandas")

    def pos_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cents"].to_numpy()
        p = c[c > 0]
        return pd.DataFrame(
            {"k": [np.int64(1)], "s": [np.int64(p.sum())],
             "n": [np.int64(len(p))]}
        )

    tot = (
        cust_c.map_batches(pos_partial, batch_format="pandas")
        .groupby("k")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    s_total, n_total = int(tot["s"].iloc[0]), int(tot["n"].iloc[0])

    def _tagged(key, nat, cents, is_cust, is_ord):
        import pyarrow as pa

        # typed Arrow even when empty: a zero-row pandas block degrades
        # to a schema-less block downstream of the union
        return pa.table(
            {
                "k": pa.array(key, pa.int64()),
                "nat": pa.array(nat, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "is_cust": pa.array(is_cust, pa.int64()),
                "is_ord": pa.array(is_ord, pa.int64()),
            }
        )

    def rich_only(df: pd.DataFrame) -> "pa.Table":
        # integer-exact above-average test: cents·n > Σcents (no float avg)
        d = df[df["cents"].to_numpy() * n_total > s_total]
        n = len(d)
        return _tagged(
            d["c_custkey"].to_numpy(np.int64),
            d["c_nationkey"].to_numpy(np.int64),
            d["cents"].to_numpy(np.int64),
            np.ones(n, np.int64),
            np.zeros(n, np.int64),
        )

    rich = cust_c.map_batches(rich_only, batch_format="pandas")

    cutoff = pd.Timestamp(since)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def recent_partial(df: pd.DataFrame) -> "pa.Table":
        d = df[df["o_orderdate"] >= cutoff]
        keys = np.unique(d["o_custkey"].to_numpy(np.int64))
        n = len(keys)
        z = np.zeros(n, np.int64)
        return _tagged(keys, z, z, z, np.ones(n, np.int64))

    recent = orders.map_batches(recent_partial, batch_format="pandas")

    merged = (
        rich.union(recent)
        .groupby("k")
        .aggregate(
            Sum("nat", alias_name="nat"),
            Sum("cents", alias_name="cents"),
            Sum("is_cust", alias_name="is_cust"),
            Sum("is_ord", alias_name="is_ord"),
        )
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # each custkey contributes ≤1 customer row, so nat/cents pass
        # through the Sum unchanged; dormant = customer row, no order row
        d = df[(df["is_cust"].to_numpy() == 1)
               & (df["is_ord"].to_numpy() == 0)]
        return (
            d.assign(n_cust=np.int64(1))
            .rename(columns={"nat": "c_nationkey"})
            .groupby("c_nationkey", as_index=False)
            .agg(n_cust=("n_cust", "sum"), cents=("cents", "sum"))
        )

    agg = (
        merged.map_batches(partial, batch_format="pandas")
        .groupby("c_nationkey")
        .aggregate(Sum("n_cust", alias_name="n_cust"),
                   Sum("cents", alias_name="cents"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": df["c_nationkey"].astype(np.int64),
                "n_cust": df["n_cust"].astype(np.int64),
                "total_acctbal": df["cents"].astype(np.float64) / 100.0,
            }
        )

    return agg.map_batches(final, batch_format="pandas").sort(
        key="c_nationkey"
    )


def customer_order_distribution(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q13 analog: the distribution of customers by order count,
    INCLUDING zero-order customers — the canonical left-outer-join +
    double-grouped histogram.

    Distributed shape: the left join is the tag-union pattern (the
    ``dormant_customer_balance`` recipe — Ray 2.49's ``left_outer``
    join raises on empty hash partitions, and tag-union is one exchange
    cheaper): customer rows emit (custkey, is_cust=1, cnt=0); the orders
    scan pre-collapses each batch to per-custkey counts (custkey,
    is_cust=0, cnt=n), so the single custkey exchange carries
    near-customer-cardinality rows, not order rows. After the groupby,
    customers present in the customer table keep ``sum(cnt)`` as their
    order count (zero-order customers fall out naturally); a second,
    histogram-cardinality groupby counts customers per order count.
    Both aggregations are exact int64. Columns: n_orders (BIGINT),
    n_cust (BIGINT), ordered by (n_cust DESC, n_orders DESC).
    """
    import pyarrow as pa

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def cust_tag(df: pd.DataFrame) -> "pa.Table":
        k = df["c_custkey"].to_numpy(np.int64)
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "is_cust": pa.array(np.ones(len(k), np.int64)),
                "cnt": pa.array(np.zeros(len(k), np.int64)),
            }
        )

    def order_partial(df: pd.DataFrame) -> "pa.Table":
        keys, counts = np.unique(
            df["o_custkey"].to_numpy(np.int64), return_counts=True
        )
        return pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "is_cust": pa.array(np.zeros(len(keys), np.int64)),
                "cnt": pa.array(counts.astype(np.int64)),
            }
        )

    merged = cust.map_batches(cust_tag, batch_format="pandas").union(
        orders.map_batches(order_partial, batch_format="pandas")
    )
    per_cust = merged.groupby("k").aggregate(
        Sum("is_cust", alias_name="is_cust"), Sum("cnt", alias_name="cnt")
    )

    def hist_partial(df: pd.DataFrame) -> "pa.Table":
        d = df[df["is_cust"].to_numpy() >= 1]
        keys, counts = np.unique(
            d["cnt"].to_numpy(np.int64), return_counts=True
        )
        return pa.table(
            {
                "n_orders": pa.array(keys, pa.int64()),
                "n_cust": pa.array(counts.astype(np.int64)),
            }
        )

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pandas")
        .groupby("n_orders")
        .aggregate(Sum("n_cust", alias_name="n_cust"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_orders": df["n_orders"].astype(np.int64),
                "n_cust": df["n_cust"].astype(np.int64),
            }
        )

    return hist.map_batches(final, batch_format="pandas").sort(
        key=["n_cust", "n_orders"], descending=[True, True]
    )


def top_supplier_revenue(
    sf_dir: str, start: str = "1996-01-01", months: int = 3
) -> "ray.data.Dataset":
    """TPC-H Q15 analog: the supplier(s) with the maximum revenue over a
    3-month ship window — max-subquery selection with exact ties.

    Distributed shape: revenue is carried as EXACT int64 in 1e-4-dollar
    units (``round(price*100) * (100 - round(disc*100))`` — both factors
    are 2-dec by data contract), so partial-sum order cannot perturb the
    max boundary and ties are exact integer equality, not float luck.
    The lineitem scan pre-collapses each batch to per-suppkey partials;
    ONE supplier-cardinality groupby; the global max is a tree ``max()``
    aggregate (never a driver materialization of the supplier table);
    winners probe the broadcast (s_suppkey → s_name) sorted arrays.
    int64 bound: rev4 per supplier < 2^63 up to ~1e9 lines/supplier ×
    1e9 units/line; past that, re-scale to 1e-2 units (documented).
    Columns: s_suppkey (BIGINT), s_name, total_revenue (DOUBLE, exact
    rev4/1e4), ordered by s_suppkey.
    """
    lo = pd.Timestamp(start)
    hi = lo + pd.DateOffset(months=months)

    sup = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).sort_values("s_suppkey")
    ref = ray.put(
        (
            sup["s_suppkey"].to_numpy(np.int64),
            sup["s_name"].to_numpy(dtype=object),
        )
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        cents = np.round(d["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        pct = np.round(d["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_suppkey": d["l_suppkey"].to_numpy(np.int64),
                "rev4": cents * (100 - pct),
            }
        )
        return out.groupby("l_suppkey", as_index=False).agg(
            rev4=("rev4", "sum")
        )

    per_supp = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("l_suppkey")
        .aggregate(Sum("rev4", alias_name="rev4"))
    )
    best = int(per_supp.max("rev4"))

    def winners(df: pd.DataFrame) -> pd.DataFrame:
        keys, names = ray.get(ref)
        d = df[df["rev4"].to_numpy(np.int64) == best]
        idx = np.searchsorted(keys, d["l_suppkey"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "s_suppkey": d["l_suppkey"].astype(np.int64),
                "s_name": names[idx],
                "total_revenue": d["rev4"].astype(np.float64) / 1e4,
            }
        )

    return per_supp.map_batches(winners, batch_format="pandas").sort(
        key="s_suppkey"
    )


def small_quantity_revenue(
    sf_dir: str, brand: str = "Brand#23"
) -> "ray.data.Dataset":
    """TPC-H Q17 analog: average yearly revenue lost if small-quantity
    orders (below 20 % of the part's average order quantity) were not
    taken — the correlated per-group-threshold pattern.

    Distributed shape: pass 1 computes per-partkey (Σqty, n) over the
    brand's lineitems (brand partkeys broadcast as a sorted array;
    per-batch partials → a brand-parts-cardinality groupby). Quantities
    are integral by data contract, so the threshold test is EXACT
    integer arithmetic: ``qty < 0.2·(Σqty/n) ⇔ 5·qty·n < Σqty`` — no
    float boundary. Pass 2 re-scans lineitem, probes the broadcast
    (partkey → Σqty, n) arrays, and reduces qualifying rows to exact
    int64 price-cents partials and ONE global row. Broadcast budget:
    brand slices are ~1/25 of parts; past driver memory this becomes the
    hash-join path (the ``rarity_scores`` convention). avg_yearly is
    cents/700.0 — the identical double expression on both sides.
    Columns: avg_yearly (DOUBLE), n_lines (BIGINT).
    """
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    bkeys = np.sort(
        part.loc[part["p_brand"] == brand, "p_partkey"].to_numpy(np.int64)
    )
    bref = ray.put(bkeys)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    )

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        pk = ray.get(bref)
        keys = df["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(pk, keys)
        pos_c = np.minimum(pos, pk.size - 1) if pk.size else pos
        hit = (pk.size > 0) & (pk[pos_c] == keys)
        d = df[hit]
        out = pd.DataFrame(
            {
                "l_partkey": d["l_partkey"].to_numpy(np.int64),
                "s": np.round(d["l_quantity"].to_numpy()).astype(np.int64),
                "n": np.int64(1),
            }
        )
        return out.groupby("l_partkey", as_index=False).agg(
            s=("s", "sum"), n=("n", "sum")
        )

    th = (
        li.map_batches(qty_partial, batch_format="pandas")
        .groupby("l_partkey")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()  # brand-parts cardinality (~parts/25) — bounded
        .sort_values("l_partkey")
    )
    tref = ray.put(
        (
            th["l_partkey"].to_numpy(np.int64),
            th["s"].to_numpy(np.int64),
            th["n"].to_numpy(np.int64),
        )
    )

    li2 = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        pk, s, n = ray.get(tref)
        keys = df["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(pk, keys)
        pos_c = np.minimum(pos, pk.size - 1) if pk.size else pos
        hit = (pk.size > 0) & (pk[pos_c] == keys)
        qty = np.round(df["l_quantity"].to_numpy()).astype(np.int64)
        small = hit & (5 * qty * np.where(hit, n[pos_c], 0)
                       < np.where(hit, s[pos_c], 0))
        cents = np.round(
            df.loc[small, "l_extendedprice"].to_numpy() * 100
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "k": [np.int64(1)],
                "cents": [np.int64(cents.sum())],
                "n_lines": [np.int64(small.sum())],
            }
        )

    agg = (
        li2.map_batches(rev_partial, batch_format="pandas")
        .groupby("k")
        .aggregate(Sum("cents", alias_name="cents"),
                   Sum("n_lines", alias_name="n_lines"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "avg_yearly": df["cents"].astype(np.float64) / 700.0,
                "n_lines": df["n_lines"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pandas")


def market_share_by_year(
    sf_dir: str,
    nation: str = "NATION_3",
    region: str = "EUROPE",
    ptype: str = "ECONOMY",
) -> "ray.data.Dataset":
    """TPC-H Q8 analog: one nation's share of a region's yearly revenue
    for a part type — the multi-dimension star probe with a ratio of
    grouped sums.

    Distributed shape: nation/region resolve on the driver (tiny);
    part (partkey → is-type bool) and supplier (suppkey → nationkey)
    broadcast once as sorted arrays; the lineitem scan fuses all three
    probes and pre-collapses each batch to per-year (target_rev4,
    total_rev4, n) partials — the only exchange is a years-cardinality
    combine. Revenue is EXACT int64 1e-4-dollar units, so mkt_share is
    the identical double division of two exact integers on both sides.
    Columns: year (BIGINT), target_revenue, total_revenue, mkt_share
    (DOUBLE), n_lines (BIGINT), ordered by year.
    """
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    region_nations = np.sort(
        nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"].to_numpy(np.int64)
    )
    target_nk = int(nat.loc[nat["n_name"] == nation, "n_nationkey"].iloc[0])

    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).sort_values("p_partkey")
    sup = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).sort_values("s_suppkey")
    ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            (part["p_type"] == ptype).to_numpy(bool),
            sup["s_suppkey"].to_numpy(np.int64),
            sup["s_nationkey"].to_numpy(np.int64),
            region_nations,
        )
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pk, istype, sk, snat, rn = ray.get(ref)
        typ = istype[np.searchsorted(pk, df["l_partkey"].to_numpy(np.int64))]
        nk = snat[np.searchsorted(sk, df["l_suppkey"].to_numpy(np.int64))]
        pos = np.searchsorted(rn, nk)
        inreg = rn[np.minimum(pos, rn.size - 1)] == nk
        d = df[typ & inreg]
        nk = nk[typ & inreg]
        cents = np.round(d["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        pct = np.round(d["l_discount"].to_numpy() * 100).astype(np.int64)
        rev4 = cents * (100 - pct)
        out = pd.DataFrame(
            {
                "year": d["l_shipdate"].dt.year.to_numpy(np.int64),
                "t": np.where(nk == target_nk, rev4, 0),
                "tot": rev4,
                "n_lines": np.int64(1),
            }
        )
        return out.groupby("year", as_index=False).agg(
            t=("t", "sum"), tot=("tot", "sum"), n_lines=("n_lines", "sum")
        )

    agg = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("year")
        .aggregate(Sum("t", alias_name="t"), Sum("tot", alias_name="tot"),
                   Sum("n_lines", alias_name="n_lines"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        t = df["t"].astype(np.float64)
        tot = df["tot"].astype(np.float64)
        return pd.DataFrame(
            {
                "year": df["year"].astype(np.int64),
                "target_revenue": t / 10000.0,
                "total_revenue": tot / 10000.0,
                "mkt_share": t / tot,
                "n_lines": df["n_lines"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pandas").sort(key="year")


def shipping_lag_distribution(
    sf_dir: str, year: int = 1997, num_partitions: int | None = None
) -> "ray.data.Dataset":
    """TPC-H Q12 analog: lineitems shipped in ``year`` bucketed by
    order→ship lag, counting high- vs low-priority lines per bucket
    (the commit/receipt columns don't exist in this schema, so lag =
    shipdate − orderdate stands in for the late-shipment predicate).

    Distributed shape: the lineitem scan sheds all rows outside the
    ship-year before the ONE large×large ``Dataset.join`` on the order
    key (the Q3 recipe); the joined batches collapse to ≤3 bucket
    partials each, so the final exchange is a 3-row combine. Lag is
    exact integer days (both timestamps are midnight by data contract).
    Columns: bucket, high_lines (BIGINT), low_lines (BIGINT), ordered
    by bucket.
    """
    from ..stages.cc import auto_join_partitions

    if num_partitions is None:
        num_partitions = auto_join_partitions()
    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def li_prune(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        d = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        return pa.table(
            {
                "l_orderkey": pa.array(d["l_orderkey"].to_numpy(np.int64)),
                "ship_us": pa.array(
                    d["l_shipdate"].astype("datetime64[us]").astype(np.int64)
                ),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def ord_cols(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        hi_prio = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(np.int64)),
                "o_date_us": pa.array(
                    df["o_orderdate"].astype("datetime64[us]")
                    .astype(np.int64)
                ),
                "hi": pa.array(hi_prio.to_numpy().astype(np.int64)),
            }
        )

    j = li.map_batches(li_prune, batch_format="pandas").join(
        orders.map_batches(ord_cols, batch_format="pandas"),
        "inner",
        num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    _DAY_US = 86_400_000_000

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        lag = (
            df["ship_us"].to_numpy(np.int64)
            - df["o_date_us"].to_numpy(np.int64)
        ) // _DAY_US
        bucket = np.where(
            lag < 30, "FAST", np.where(lag < 90, "MEDIUM", "SLOW")
        )
        hi_ = df["hi"].to_numpy(np.int64)
        out = pd.DataFrame(
            {"bucket": bucket, "high_lines": hi_, "low_lines": 1 - hi_}
        )
        return out.groupby("bucket", as_index=False).agg(
            high_lines=("high_lines", "sum"), low_lines=("low_lines", "sum")
        )

    agg = (
        j.map_batches(bucket_partial, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("high_lines", alias_name="high_lines"),
                   Sum("low_lines", alias_name="low_lines"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": df["bucket"],
                "high_lines": df["high_lines"].astype(np.int64),
                "low_lines": df["low_lines"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pandas").sort(key="bucket")


def late_supplier_count(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q21 analog: per supplier, the number of multi-supplier
    orders where that supplier was the UNIQUE latest shipper (no
    receipt/commit columns in this schema, so "kept the order waiting"
    = strictly latest ship date among ≥2 distinct suppliers).

    Distributed shape — TWO exchanges total, no join, no per-group
    Python (order groups number in the billions at scale). The whole
    per-order decision collapses into four plain max/min aggregates via
    a composite-key encoding: with ``S = 2**40 > max suppkey`` and
    ``day`` the exact epoch-day of the ship timestamp (midnight by data
    contract),

        m1 = day * S + suppkey      →  max m1 = (gmax_day, HIGHEST
                                       suppkey shipping on gmax_day)
        m2 = day * S - suppkey      →  max m2 = (gmax_day, LOWEST
                                       suppkey shipping on gmax_day)

    (``suppkey < S`` makes the day term dominate, so both maxima land on
    the latest day). The latest shipper is unique iff the two recovered
    suppkeys agree; "≥2 distinct suppliers touched the order" is just
    ``min(suppkey) != max(suppkey)``. So: per-batch vectorized partials
    → ONE order-key groupby (Max/Max/Min/Max) → filter+decode →
    supplier-cardinality groupby → broadcast name probe.

    Columns: s_suppkey (BIGINT), s_name, numwait (BIGINT), only
    suppliers with numwait ≥ 1, ordered by (numwait DESC, s_suppkey).
    """
    sup = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).sort_values("s_suppkey")
    sref = ray.put(
        (
            sup["s_suppkey"].to_numpy(np.int64),
            sup["s_name"].to_numpy(dtype=object),
        )
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )

    _S = np.int64(1) << 40  # > any suppkey; day * _S stays well inside int64
    _DAY_US = np.int64(86_400_000_000)

    def order_partial(df: pd.DataFrame) -> pd.DataFrame:
        sk = df["l_suppkey"].to_numpy(np.int64)
        if sk.size and int(sk.max()) >= int(_S):
            raise ValueError("l_suppkey >= 2**40 breaks the composite key")
        day = (
            df["l_shipdate"].astype("datetime64[us]").astype(np.int64)
            // _DAY_US
        )
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "m1": day * _S + sk,
                "m2": day * _S - sk,
                "sk_lo": sk,
                "sk_hi": sk,
            }
        )
        return out.groupby("l_orderkey", as_index=False).agg(
            m1=("m1", "max"), m2=("m2", "max"),
            sk_lo=("sk_lo", "min"), sk_hi=("sk_hi", "max"),
        )

    from ..stages.cc import hash_grouped_combine

    def order_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_orderkey", as_index=False).agg(
            m1=("m1", "max"), m2=("m2", "max"),
            sk_lo=("sk_lo", "min"), sk_hi=("sk_hi", "max"),
        )

    # order keys are corpus-cardinality: hash-partition + vectorized local
    # merge (see hash_grouped_combine — 9x the built-in sort aggregate here)
    per_order = hash_grouped_combine(
        li.map_batches(order_partial, batch_format="pandas"),
        ["l_orderkey"],
        order_merge,
    )

    def wait_partial(df: pd.DataFrame) -> pd.DataFrame:
        m1 = df["m1"].to_numpy(np.int64)
        m2 = df["m2"].to_numpy(np.int64)
        gday = m1 // _S
        sk_at_hi = m1 - gday * _S
        sk_at_lo = gday * _S - m2
        blamed = (sk_at_hi == sk_at_lo) & (
            df["sk_lo"].to_numpy(np.int64) != df["sk_hi"].to_numpy(np.int64)
        )
        out = pd.DataFrame(
            {"s_suppkey": sk_at_lo[blamed], "numwait": np.int64(1)}
        )
        return out.groupby("s_suppkey", as_index=False).agg(
            numwait=("numwait", "sum")
        )

    agg = (
        per_order.map_batches(wait_partial, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        keys, names = ray.get(sref)
        idx = np.searchsorted(keys, df["s_suppkey"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "s_suppkey": df["s_suppkey"].astype(np.int64),
                "s_name": names[idx],
                "numwait": df["numwait"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pandas").sort(
        key=["numwait", "s_suppkey"], descending=[True, False]
    )


def forecast_revenue(sf_dir: str, year: int = 1996) -> "ray.data.Dataset":
    """TPC-H Q6 analog: revenue increase from dropping small discounts —
    ``sum(price * discount)`` over one ship-year, discount in [5%, 7%],
    quantity < 24. The simplest shape in the family: column-pruned scan →
    vectorized per-batch partial → one single-row combine (no shuffle).

    Discount/quantity predicates run on ROUNDED integers (pct, whole
    units) on both sides — no float comparisons. Revenue is the exact
    int64 sum of cents·pct (1e-4-dollar units) divided once at the end.
    Columns: revenue (DOUBLE), n_lines (BIGINT)."""
    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        pct = np.round(d["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = np.round(d["l_quantity"].to_numpy()).astype(np.int64)
        keep = (pct >= 5) & (pct <= 7) & (qty < 24)
        cents = np.round(
            d["l_extendedprice"].to_numpy()[keep] * 100
        ).astype(np.int64)
        return pd.DataFrame(
            {"k": [np.int64(1)],
             "rev4": [int((cents * pct[keep]).sum())],
             "n_lines": [int(keep.sum())]}
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("k")
        .aggregate(Sum("rev4", alias_name="rev4"),
                   Sum("n_lines", alias_name="n_lines"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "revenue": df["rev4"].astype(np.float64) / 10000.0,
                "n_lines": df["n_lines"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pandas")


def priority_late_orders(
    sf_dir: str, quarter_start: str = "1997-04-01"
) -> "ray.data.Dataset":
    """TPC-H Q4 analog: orders placed in one quarter with AT LEAST ONE
    line shipped more than 90 days after the order date, counted per
    order priority (no commit/receipt columns in this schema, so the
    late-line EXISTS predicate is ship-lag > 90 days).

    Distributed shape — the EXISTS collapses into a max aggregate, so no
    join: quarter-filtered orders and per-order max-ship-day lineitem
    partials are TAGGED-UNIONED and merged in ONE order-key
    ``hash_grouped_combine`` exchange (orders row carries od_day ≥ 0 and
    the priority string; lineitem rows carry ship_day; max() of each
    column recovers both sides — the sentinel -1 / '' never wins a max
    against a real value). Lag is exact integer days (midnight
    timestamps). Columns: o_orderpriority, n_orders (BIGINT), ordered by
    o_orderpriority."""
    from ..stages.cc import hash_grouped_combine

    lo = pd.Timestamp(quarter_start)
    hi = lo + pd.DateOffset(months=3)
    _DAY_US = np.int64(86_400_000_000)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def ord_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
        return pd.DataFrame(
            {
                "okey": d["o_orderkey"].to_numpy(np.int64),
                "od_day": d["o_orderdate"].astype("datetime64[us]")
                .astype(np.int64) // _DAY_US,
                "prio": d["o_orderpriority"].to_numpy(dtype=object),
                "ship_day": np.int64(-1),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def li_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "okey": df["l_orderkey"].to_numpy(np.int64),
                "od_day": np.int64(-1),
                "prio": "",
                "ship_day": df["l_shipdate"].astype("datetime64[us]")
                .astype(np.int64) // _DAY_US,
            }
        )
        return out.groupby("okey", as_index=False).agg(
            od_day=("od_day", "max"), prio=("prio", "max"),
            ship_day=("ship_day", "max"),
        )

    tagged = orders.map_batches(ord_rows, batch_format="pandas").union(
        li.map_batches(li_rows, batch_format="pandas")
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("okey", as_index=False).agg(
            od_day=("od_day", "max"), prio=("prio", "max"),
            ship_day=("ship_day", "max"),
        )
        late = g[(g["od_day"].to_numpy() >= 0)
                 & (g["ship_day"].to_numpy()
                    - g["od_day"].to_numpy() > 90)]
        return (
            pd.DataFrame({"o_orderpriority": late["prio"],
                          "n_orders": np.int64(1)})
            .groupby("o_orderpriority", as_index=False)
            .agg(n_orders=("n_orders", "sum"))
        )

    per_prio = hash_grouped_combine(tagged, ["okey"], merge)
    agg = per_prio.groupby("o_orderpriority").aggregate(
        Sum("n_orders", alias_name="n_orders")
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"],
                "n_orders": df["n_orders"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pandas").sort(
        key="o_orderpriority"
    )


def nation_profit(sf_dir: str, name_like: str = "red") -> "ray.data.Dataset":
    """TPC-H Q9 analog: per (supplier nation, ship year) profit on parts
    whose name contains ``name_like`` — profit = revenue − 0.6·retail·qty
    (the schema has no partsupp/supplycost, so cost is a fixed 60% of the
    part's retail price; both terms are exact int64 1e-4-dollar units).

    Distributed shape (the Q8 recipe): part (is-match bool + retail
    cents) and supplier (→nationkey) broadcast once as sorted arrays; the
    lineitem scan fuses both probes and pre-collapses each batch to
    (nationkey, year) partials — the only exchange is a
    nations×years-cardinality combine. Columns: nation, o_year (BIGINT),
    profit (DOUBLE), n_lines (BIGINT), ordered by (nation, o_year)."""
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    nat_sorted = nat.sort_values("n_nationkey")
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_retailprice"],
    ).sort_values("p_partkey")
    sup = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).sort_values("s_suppkey")
    ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            part["p_name"].str.contains(name_like, regex=False)
            .to_numpy(bool),
            np.round(part["p_retailprice"].to_numpy() * 100)
            .astype(np.int64),
            sup["s_suppkey"].to_numpy(np.int64),
            sup["s_nationkey"].to_numpy(np.int64),
        )
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pk, match, retail, sk, snat = ray.get(ref)
        sel = match[np.searchsorted(pk, df["l_partkey"].to_numpy(np.int64))]
        d = df[sel]
        rc = retail[np.searchsorted(pk, d["l_partkey"].to_numpy(np.int64))]
        nk = snat[np.searchsorted(sk, d["l_suppkey"].to_numpy(np.int64))]
        cents = np.round(d["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        pct = np.round(d["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = np.round(d["l_quantity"].to_numpy()).astype(np.int64)
        profit4 = cents * (100 - pct) - 60 * qty * rc
        out = pd.DataFrame(
            {
                "nationkey": nk,
                "o_year": d["l_shipdate"].dt.year.to_numpy(np.int64),
                "profit4": profit4,
                "n_lines": np.int64(1),
            }
        )
        return out.groupby(["nationkey", "o_year"], as_index=False).agg(
            profit4=("profit4", "sum"), n_lines=("n_lines", "sum")
        )

    agg = (
        li.map_batches(partial, batch_format="pandas")
        .groupby(["nationkey", "o_year"])
        .aggregate(Sum("profit4", alias_name="profit4"),
                   Sum("n_lines", alias_name="n_lines"))
    )

    nnames = nat_sorted["n_name"].to_numpy(dtype=object)
    nkeys = nat_sorted["n_nationkey"].to_numpy(np.int64)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        idx = np.searchsorted(nkeys, df["nationkey"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "nation": nnames[idx],
                "o_year": df["o_year"].astype(np.int64),
                "profit": df["profit4"].astype(np.float64) / 10000.0,
                "n_lines": df["n_lines"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pandas").sort(
        key=["nation", "o_year"]
    )


def events_cumulative_distinct(sf_dir: str) -> "ray.data.Dataset":
    """Daily new-user and cumulative-distinct-user counts — the audience
    growth curve (exact COUNT(DISTINCT) over an ever-growing window,
    which naive windowing recomputes per day).

    Distributed shape: distinct-over-all-history collapses to "count
    users by FIRST-SEEN day" — per-batch min-day partials per user, ONE
    user-key ``hash_grouped_combine`` exchange (user ids are
    corpus-cardinality), then a per-partition collapse to day counts and
    a days-cardinality groupby. The cumulative sum runs over the
    result-sized day table in one task (``repartition(1)`` — bounded by
    the calendar, not the corpus). Columns: day (TIMESTAMP), new_users
    (BIGINT), cum_users (BIGINT), ordered by day."""
    from ..stages.cc import hash_grouped_combine

    _DAY_US = np.int64(86_400_000_000)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "day": df["ts"].astype("datetime64[us]").astype(np.int64)
                // _DAY_US,
            }
        )
        return out.groupby("user_id", as_index=False).agg(day=("day", "min"))

    def first_seen(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).agg(day=("day", "min"))
        out = pd.DataFrame({"day": g["day"], "new_users": np.int64(1)})
        return out.groupby("day", as_index=False).agg(
            new_users=("new_users", "sum")
        )

    per_day = hash_grouped_combine(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"],
        first_seen,
    )
    agg = per_day.groupby("day").aggregate(
        Sum("new_users", alias_name="new_users")
    )

    def cum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day")
        new = df["new_users"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "day": (df["day"].to_numpy(np.int64) * 86_400_000_000)
                .astype("datetime64[us]"),
                "new_users": new,
                "cum_users": np.cumsum(new),
            }
        )

    return agg.repartition(1).map_batches(
        cum, batch_format="pandas", batch_size=None
    ).sort("day")


def min_cost_supplier(
    sf_dir: str, size: int = 15, region: str = "EUROPE"
) -> "ray.data.Dataset":
    """TPC-H Q2 analog: for each part of a given size class, the
    region-local supplier(s) offering the minimum observed unit price —
    the correlated-min-subquery pattern (reference has no relational
    engine; this is general-engine infrastructure per SURVEY.md §2.8).

    The test data has no ``partsupp`` table, so the (part, supplier)
    supply cost is DERIVED from lineitem: ``min(round(l_extendedprice *
    100))`` per observed pair — exact int64 cents, so the per-part min
    boundary and its ties are integer equality on both sides.

    Distributed shape: qualifying partkeys and region-local suppkeys are
    result-sized dims broadcast once (``ray.put`` sorted arrays); the
    lineitem scan prunes to 3 columns, pre-collapses each batch to pair
    minima, and the ONLY exchange is a pair-cardinality
    ``groupby([partkey, suppkey]).aggregate(Min)`` (pairs ≪ lineitems).
    The correlated min is then one ``groupby(partkey).map_groups`` that
    keeps rows equal to the group min — no join-back pass, no second
    shuffle. Supplier name/acctbal/nation attach via broadcast
    searchsorted. ALL tied suppliers are kept (no LIMIT — the oracle set
    matches exactly). Columns: p_partkey, s_suppkey (BIGINT), s_name,
    n_name, s_acctbal (DOUBLE), min_cost (DOUBLE, cents/100).
    """
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
    )
    pkeys = np.sort(
        part.loc[part["p_size"] == size, "p_partkey"].to_numpy(np.int64)
    )
    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rkeys = reg.loc[reg["r_name"] == region, "r_regionkey"].to_numpy(np.int64)
    nat_local = nat[nat["n_regionkey"].isin(rkeys)]
    sup_local = sup[sup["s_nationkey"].isin(nat_local["n_nationkey"])]
    sup_local = sup_local.sort_values("s_suppkey")
    nname = nat.set_index("n_nationkey")["n_name"]
    dims = ray.put(
        (
            pkeys,
            sup_local["s_suppkey"].to_numpy(np.int64),
            sup_local["s_name"].to_numpy(object),
            sup_local["s_acctbal"].to_numpy(np.float64),
            nname.reindex(sup_local["s_nationkey"]).to_numpy(object),
        )
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        pk, sk, _, _, _ = ray.get(dims)
        keys = df["l_partkey"].to_numpy(np.int64)
        skeys = df["l_suppkey"].to_numpy(np.int64)
        pos = np.searchsorted(pk, keys)
        hit_p = (pk.size > 0) & (pk[np.minimum(pos, max(pk.size - 1, 0))] == keys)
        pos_s = np.searchsorted(sk, skeys)
        hit_s = (sk.size > 0) & (sk[np.minimum(pos_s, max(sk.size - 1, 0))] == skeys)
        d = df[hit_p & hit_s]
        out = pd.DataFrame(
            {
                "p_partkey": d["l_partkey"].to_numpy(np.int64),
                "s_suppkey": d["l_suppkey"].to_numpy(np.int64),
                "cents": np.round(
                    d["l_extendedprice"].to_numpy() * 100
                ).astype(np.int64),
            }
        )
        return out.groupby(
            ["p_partkey", "s_suppkey"], as_index=False
        ).agg(cents=("cents", "min"))

    from ray.data.aggregate import Min

    pairs = (
        li.map_batches(pair_partial, batch_format="pandas")
        .groupby(["p_partkey", "s_suppkey"])
        .aggregate(Min("cents", alias_name="cents"))
    )

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cents"].to_numpy(np.int64)
        return df[c == c.min()]

    win = pairs.groupby("p_partkey").map_groups(
        keep_min, batch_format="pandas"
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        _, sk, snm, bal, nnm = ray.get(dims)
        pos = np.searchsorted(sk, df["s_suppkey"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "p_partkey": df["p_partkey"].to_numpy(np.int64),
                "s_suppkey": df["s_suppkey"].to_numpy(np.int64),
                "s_name": snm[pos],
                "n_name": nnm[pos],
                "s_acctbal": bal[pos],
                "min_cost": df["cents"].to_numpy(np.int64) / 100.0,
            }
        )

    return win.map_batches(attach, batch_format="pandas")


def important_part_value(
    sf_dir: str, nation: str = "NATION_7", permille: int = 1
) -> "ray.data.Dataset":
    """TPC-H Q11 analog: parts whose supplied value from one nation's
    suppliers exceeds a fixed fraction of that nation's total supplied
    value — the global-scalar HAVING pattern.

    Value per part is the exact int64 cents sum of ``round(
    l_extendedprice*100)`` over lineitems shipped by the nation's
    suppliers (no partsupp table; lineitem is the supply ledger). The
    HAVING threshold ``value > permille/1000 · total`` is evaluated as
    the EXACT integer test ``1000·value > permille·total`` on both
    sides — no float boundary.

    Distributed shape: the nation's suppkeys broadcast as a sorted
    array; the lineitem scan pre-collapses each batch to per-part cents
    partials; ONE parts-cardinality ``groupby(partkey).aggregate(Sum)``;
    the global total is a second aggregate over that result-sized table
    (driver holds one scalar, never the rows); the filter runs
    distributed against the broadcast scalar. Columns: p_partkey
    (BIGINT), value (DOUBLE, cents/100), ordered by value DESC.
    """
    sup = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    nk = nat.loc[nat["n_name"] == nation, "n_nationkey"].to_numpy(np.int64)
    skeys = np.sort(
        sup.loc[sup["s_nationkey"].isin(nk), "s_suppkey"].to_numpy(np.int64)
    )
    sref = ray.put(skeys)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sk = ray.get(sref)
        keys = df["l_suppkey"].to_numpy(np.int64)
        pos = np.searchsorted(sk, keys)
        hit = (sk.size > 0) & (sk[np.minimum(pos, max(sk.size - 1, 0))] == keys)
        d = df[hit]
        out = pd.DataFrame(
            {
                "p_partkey": d["l_partkey"].to_numpy(np.int64),
                "cents": np.round(
                    d["l_extendedprice"].to_numpy() * 100
                ).astype(np.int64),
            }
        )
        return out.groupby("p_partkey", as_index=False).agg(
            cents=("cents", "sum")
        )

    per_part = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("p_partkey")
        .aggregate(Sum("cents", alias_name="cents"))
        .materialize()  # parts-cardinality (bounded), consumed twice
    )
    total = per_part.aggregate(Sum("cents", alias_name="t"))["t"]
    total = np.int64(0 if total is None else total)

    def having(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cents"].to_numpy(np.int64)
        d = df[1000 * c > permille * total]
        return pd.DataFrame(
            {
                "p_partkey": d["p_partkey"].to_numpy(np.int64),
                "value": d["cents"].to_numpy(np.int64) / 100.0,
            }
        )

    return per_part.map_batches(having, batch_format="pandas").sort(
        "value", descending=True
    )


def dominant_part_suppliers(
    sf_dir: str,
    prefix: str = "small ",
    nation: str = "NATION_9",
    year: int = 1996,
) -> "ray.data.Dataset":
    """TPC-H Q20 analog: suppliers from one nation that DOMINATE the
    supply of some name-prefixed part within a ship year — shipped more
    than half of that part's total quantity — the nested-semi-join
    pattern (EXISTS over a per-part aggregate threshold).

    Quantities are integral by data contract so dominance is the exact
    integer test ``2·pair_qty > part_total``. Distributed shape:
    prefix partkeys and the nation's suppkeys broadcast sorted; the
    lineitem scan prunes to the ship-year window and pre-collapses each
    batch to (part, supplier) quantity partials; ONE pair-cardinality
    ``groupby([partkey, suppkey]).aggregate(Sum)``; dominance is a
    ``groupby(partkey).map_groups`` (group total + filter in one pass,
    no join-back); the surviving suppkey set collapses via
    ``unique``-style groupby and attaches the supplier dim by broadcast
    searchsorted. Columns: s_suppkey (BIGINT), s_name (set semantics,
    row order unspecified).
    """
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    pkeys = np.sort(
        part.loc[
            part["p_name"].str.startswith(prefix), "p_partkey"
        ].to_numpy(np.int64)
    )
    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    nk = nat.loc[nat["n_name"] == nation, "n_nationkey"].to_numpy(np.int64)
    sup_local = sup[sup["s_nationkey"].isin(nk)].sort_values("s_suppkey")
    dims = ray.put(
        (
            pkeys,
            sup_local["s_suppkey"].to_numpy(np.int64),
            sup_local["s_name"].to_numpy(object),
        )
    )
    t0 = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    t1 = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        pk, _, _ = ray.get(dims)
        ts = df["l_shipdate"].astype("datetime64[us]").astype(np.int64)
        keys = df["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(pk, keys)
        hit = (pk.size > 0) & (pk[np.minimum(pos, max(pk.size - 1, 0))] == keys)
        d = df[hit & (ts >= t0).to_numpy() & (ts < t1).to_numpy()]
        out = pd.DataFrame(
            {
                "p_partkey": d["l_partkey"].to_numpy(np.int64),
                "s_suppkey": d["l_suppkey"].to_numpy(np.int64),
                "qty": np.round(d["l_quantity"].to_numpy()).astype(np.int64),
            }
        )
        return out.groupby(
            ["p_partkey", "s_suppkey"], as_index=False
        ).agg(qty=("qty", "sum"))

    pairs = (
        li.map_batches(pair_partial, batch_format="pandas")
        .groupby(["p_partkey", "s_suppkey"])
        .aggregate(Sum("qty", alias_name="qty"))
    )

    import pyarrow as pa

    # Possibly-empty stages return typed Arrow tables: Ray drops the
    # schema of 0-row pandas blocks (the round-5 zero-row lesson).
    def dominant(df: pd.DataFrame) -> "pa.Table":
        q = df["qty"].to_numpy(np.int64)
        d = df[2 * q > q.sum()]
        return pa.table(
            {"s_suppkey": pa.array(d["s_suppkey"].to_numpy(np.int64),
                                   pa.int64())}
        )

    def first_only(df: pd.DataFrame) -> "pa.Table":
        d = df.drop_duplicates("s_suppkey")
        return pa.table(
            {"s_suppkey": pa.array(d["s_suppkey"].to_numpy(np.int64),
                                   pa.int64())}
        )

    sks = (
        pairs.groupby("p_partkey").map_groups(dominant, batch_format="pandas")
        .groupby("s_suppkey")
        .map_groups(first_only, batch_format="pandas")
    )

    def attach(df: pd.DataFrame) -> "pa.Table":
        _, sk, snm = ray.get(dims)
        keys = df["s_suppkey"].to_numpy(np.int64)
        pos = np.searchsorted(sk, keys)
        hit = (sk.size > 0) & (sk[np.minimum(pos, max(sk.size - 1, 0))] == keys)
        d = keys[hit]
        names = snm[np.searchsorted(sk, d)] if d.size else np.empty(0, object)
        return pa.table(
            {
                "s_suppkey": pa.array(d, pa.int64()),
                "s_name": pa.array(names, pa.string()),
            }
        )

    # No final sort: Ray's sort erases the schema of an EMPTY dataset
    # (possible for a nation with no dominant supplier) and the result
    # is a set — the driver compare is order-insensitive.
    return sks.map_batches(attach, batch_format="pandas")


def events_gap_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Inter-event gap distribution per event type: consecutive-event
    deltas in integer MICROSECONDS under the (ts, event_id) total order
    (the ``events_path_trigrams`` ordering contract), summarized as exact
    type-1 quantiles with the ``doc_len_quantiles`` INTEGER rank
    arithmetic — rank = (num·m + num)//den — so DECIMAL-vs-IEEE ceil
    divergence can't occur.

    Distribution: ``groupby(event_type).map_groups`` co-locates each
    type's history (partitioning assumption: one type's event stream fits
    a task; beyond that, bucket by (type, day) and merge per-bucket gap
    multisets — gaps crossing bucket edges are day-boundary rows, a
    border-scale fixup). Per-group kernel is one lexsort + diff.
    Columns: event_type, n_gaps, p50_us, p90_us, max_us."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "event_id"]
    )

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, us))
        g = np.diff(us[order])
        if g.size == 0:
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "n_gaps": pd.Series([], dtype=np.int64),
                 "p50_us": pd.Series([], dtype=np.int64),
                 "p90_us": pd.Series([], dtype=np.int64),
                 "max_us": pd.Series([], dtype=np.int64)}
            )
        g = np.sort(g)
        m = g.size
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_gaps": [np.int64(m)],
                "p50_us": [np.int64(g[(1 * m + 1) // 2 - 1])],
                "p90_us": [np.int64(g[(9 * m + 9) // 10 - 1])],
                "max_us": [np.int64(g[-1])],
            }
        )

    return ds.groupby("event_type").map_groups(gaps, batch_format="pandas")


def domain_mix_weights(sf_dir: str) -> "ray.data.Dataset":
    """Training-mixture weights per source (the DoReMi-style domain
    rebalancing input): each source's share of corpus tokens and docs in
    fixed-point parts-per-million — ``weight_ppm = tok·1e6 // tok_total``
    (pure integer, no float hazards).

    Shape: per-batch (source, n_docs, n_tokens) partials → one
    sources-sized groupby; the global totals come from a final
    single-block pass over THAT table (result-sized by construction).
    Columns: source, n_docs, n_tokens, weight_ppm, doc_ppm."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        toks = df["text"].str.lower().str.split()
        g = pd.DataFrame(
            {"source": df["source"].to_numpy(dtype=object),
             "n_tokens": np.fromiter(
                 (len(t) for t in toks), dtype=np.int64, count=len(df)),
             "n_docs": np.ones(len(df), np.int64)}
        ).groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pandas", batch_size=512)
        .groupby("source")
        .aggregate(_Sum("n_docs", alias_name="n_docs"),
                   _Sum("n_tokens", alias_name="n_tokens"))
    )

    def weights(df: pd.DataFrame) -> pd.DataFrame:
        tok_total = int(df["n_tokens"].sum())
        doc_total = int(df["n_docs"].sum())
        return pd.DataFrame(
            {
                "source": df["source"],
                "n_docs": df["n_docs"].astype(np.int64),
                "n_tokens": df["n_tokens"].astype(np.int64),
                "weight_ppm": (df["n_tokens"].to_numpy(np.int64)
                               * 1_000_000) // tok_total,
                "doc_ppm": (df["n_docs"].to_numpy(np.int64)
                            * 1_000_000) // doc_total,
            }
        )

    # |sources| rows: one block so the totals are global, not per-block
    return agg.repartition(1).map_batches(
        weights, batch_format="pandas", batch_size=None)


def events_mad_outliers(
    sf_dir: str, event_type: str = "purchase", k: int = 3,
) -> "ray.data.Dataset":
    """Median/MAD robust outlier counts per user — the heavy-tail-safe
    complement to ``events_zscore_outliers``. Integer-exact end to end:
    cents quantization first (the zscore contract), TYPE-1 medians via
    the (1·m+1)//2 rank arithmetic (the ``doc_len_quantiles`` recipe) on
    both the values and the absolute deviations, and the outlier test
    ``|c − med| > k·mad`` in pure int64.

    Shape: ``groupby(user_id).map_groups`` (one user's purchase history
    per task — the sessionization partitioning assumption). Columns:
    user_id, n_events, med_cents, mad_cents, n_outliers."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"],
    )

    def cents_only(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        d = df[df["event_type"] == event_type]
        return pa.table(
            {
                "user_id": pa.array(d["user_id"].to_numpy(np.int64)),
                "cents": pa.array(
                    np.round(d["value"].to_numpy() * 100).astype(np.int64)
                ),
            }
        )

    ev = ds.map_batches(cents_only, batch_format="pandas")

    def mad(df: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(df["cents"].to_numpy(np.int64))
        m = c.size
        med = int(c[(1 * m + 1) // 2 - 1])
        dev = np.sort(np.abs(df["cents"].to_numpy(np.int64) - med))
        madv = int(dev[(1 * m + 1) // 2 - 1])
        n_out = int((np.abs(df["cents"].to_numpy(np.int64) - med)
                     > k * madv).sum())
        return pd.DataFrame(
            {
                "user_id": [np.int64(df["user_id"].iloc[0])],
                "n_events": [np.int64(m)],
                "med_cents": [np.int64(med)],
                "mad_cents": [np.int64(madv)],
                "n_outliers": [np.int64(n_out)],
            }
        )

    return ev.groupby("user_id").map_groups(mad, batch_format="pandas")


def customer_revenue_gini(sf_dir: str) -> "ray.data.Dataset":
    """Revenue-concentration Gini coefficient over customers — the
    inequality metric every curation/marketplace dashboard carries.
    Exact integer end to end: per-ORDER cents quantization (the zscore
    contract) → per-customer int sums → the ``_global_ranks`` exact
    distributed ranking (rank by (cents, custkey)) → the closed-form
        gini_ppm = (2·Σ i·xᵢ − (n+1)·Σx) · 1e6 // (n·Σx)
    with 1-based ranks i over ascending x. The Σ i·x partials are int64
    (exact while n·max_cents < 2^63 — past that the driver combine
    switches to Python ints for free since the aggregate is 3 scalars).
    Columns: n_customers, total_cents, gini_ppm."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def cents(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        g = pd.DataFrame(
            {"o_custkey": df["o_custkey"].to_numpy(np.int64),
             "cents": np.round(
                 df["o_totalprice"].to_numpy() * 100).astype(np.int64)}
        ).groupby("o_custkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = (
        ds.map_batches(cents, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(_Sum("cents", alias_name="cents"))
    )
    ranked = _global_ranks(per_cust, "cents", tie_col="o_custkey")

    def partials(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        x = df["cents"].to_numpy(np.int64)
        i = df["rank_cents"].to_numpy(np.int64) + 1  # 1-based
        return pa.table(
            {"n": pa.array([np.int64(len(x))]),
             "s": pa.array([np.int64(x.sum())]),
             "si": pa.array([np.int64((i * x).sum())])}
        )

    agg = ranked.map_batches(partials, batch_format="pandas").aggregate(
        _Sum("n", alias_name="n"), _Sum("s", alias_name="s"),
        _Sum("si", alias_name="si"))
    n, s, si = int(agg["n"]), int(agg["s"]), int(agg["si"])
    gini_ppm = (2 * si - (n + 1) * s) * 1_000_000 // (n * s)
    return ray.data.from_pandas(pd.DataFrame(
        {"n_customers": [np.int64(n)],
         "total_cents": [np.int64(s)],
         "gini_ppm": [np.int64(gini_ppm)]}
    ))


def events_markov_transitions(sf_dir: str) -> "ray.data.Dataset":
    """First-order Markov transition matrix over event types — per user,
    consecutive event pairs under the (ts, event_id) total order (the
    ``events_path_trigrams`` contract), reduced to per-(from, to) counts
    and fixed-point conditional probabilities ``p_ppm = n·1e6 //
    from_total``.

    Shape: ``groupby(user_id).map_groups`` emits per-user pair partials
    (each group pre-collapses its own pairs), one (from, to) groupby
    (|types|²-sized), and the normalization runs in a single
    result-sized block. Columns: from_type, to_type, n, p_ppm."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def pairs(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((df["event_id"].to_numpy(np.int64), us))
        et = df["event_type"].to_numpy(dtype=object)[order]
        if et.size < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = pd.DataFrame({"from_type": et[:-1], "to_type": et[1:]}) \
            .groupby(["from_type", "to_type"], as_index=False).size()
        return pa.table({"from_type": pa.array(g["from_type"], pa.string()),
                         "to_type": pa.array(g["to_type"], pa.string()),
                         "n": pa.array(g["size"].to_numpy(np.int64),
                                       pa.int64())})

    counts = (
        ds.groupby("user_id").map_groups(pairs, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(_Sum("n", alias_name="n"))
    )

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("from_type")["n"].transform("sum").to_numpy(np.int64)
        out = df.copy()
        out["n"] = df["n"].astype(np.int64)
        out["p_ppm"] = df["n"].to_numpy(np.int64) * 1_000_000 // tot
        return out

    # |types|² rows: one block so from-totals are global
    return counts.repartition(1).map_batches(
        normalize, batch_format="pandas", batch_size=None)


def monthly_revenue_share(sf_dir: str) -> "ray.data.Dataset":
    """Order-revenue seasonality: per calendar month (1-12, across all
    years), exact cents totals and fixed-point share of the whole corpus
    — the mixture-weights shape on the time axis. One month groupby, the
    normalization in a single 12-row block. Columns: month, n_orders,
    cents, share_ppm."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        m = pd.to_datetime(df["o_orderdate"]).dt.month.to_numpy(np.int64)
        c = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame({"month": m, "cents": c, "n_orders": 1}) \
            .groupby("month", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("month")
        .aggregate(_Sum("n_orders", alias_name="n_orders"),
                   _Sum("cents", alias_name="cents"))
    )

    def share(df: pd.DataFrame) -> pd.DataFrame:
        tot = int(df["cents"].sum())
        out = df.copy()
        out["month"] = df["month"].astype(np.int64)
        out["n_orders"] = df["n_orders"].astype(np.int64)
        out["cents"] = df["cents"].astype(np.int64)
        out["share_ppm"] = df["cents"].to_numpy(np.int64) * 1_000_000 // tot
        return out

    return agg.repartition(1).map_batches(
        share, batch_format="pandas", batch_size=None)
