"""Relational operator coverage over the TPC-H-ish testdata tables.

These exercise the generic engine surface the reference's SURVEY operators
map onto — filters (F1-F5), groupby aggregations (A1-A6), sort/limit idioms
(G7), hash joins (J), and event-stream windowing/watermark semantics (T7) —
on the driver's relational tables, each with a lockstep DuckDB oracle.

Float aggregates are emitted as integers (cents / ppm) so the driver's
value-hash never compares raw float formatting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Sum

from virtuoso_quad_log_ray.config import DEFAULT_CONFIG, EngineConfig
from virtuoso_quad_log_ray.numerics import half_away_int64, scaled_int_array


def _join_parts(cfg: EngineConfig = DEFAULT_CONFIG) -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(cfg.num_shuffle_partitions, cpus // 2))


# --- Q1-style scan + groupby aggregate (A1 counters analog) ---------------

def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """lineitem pricing summary: filter on ship date, group by flag/status,
    Sum/Mean/Count aggregates (pre-aggregated per block before the shuffle)."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    import datetime

    cutoff = pa.scalar(datetime.datetime(1998, 9, 2), type=pa.timestamp("us"))

    def prep(b: pa.Table) -> pa.Table:
        # Round to integer cents/ppm PER ROW before aggregating: float sums
        # accumulate in nondeterministic order across blocks, so a float
        # Sum + round at the end can differ from the oracle by 1 cent at
        # scale. Integer sums are exact and associative in both engines.
        # Filter compares TIMESTAMPS (string renderings differ per engine).
        b = b.filter(pc.less_equal(pc.cast(b["l_shipdate"], pa.timestamp("us")), cutoff))
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty_c": _cents(b["l_quantity"]),
                "price_c": _cents(b["l_extendedprice"]),
                "disc_ppm": _ppm(b["l_discount"]),
            }
        )

    agg = (
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty_c"), Sum("price_c"), Sum("disc_ppm"), Count())
    )

    def shape(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["count()"], pa.int64())
        sum_disc = pc.cast(batch["sum(disc_ppm)"], pa.float64()).to_numpy(zero_copy_only=False)
        n_np = n.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty_c": pc.cast(batch["sum(qty_c)"], pa.int64()),
                "sum_price_c": pc.cast(batch["sum(price_c)"], pa.int64()),
                "avg_disc_ppm": pa.array(half_away_int64(sum_disc / n_np)),
                "n_rows": n,
            }
        )

    return agg.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True)


def _cents(arr) -> pa.Array:
    return scaled_int_array(arr, 100)


def _ppm(arr) -> pa.Array:
    return scaled_int_array(arr, 1e6)


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(100 * l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(round(100 * l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_price_c,
       CAST(round(sum(CAST(round(1e6 * l_discount) AS BIGINT)) / count(*)) AS BIGINT) AS avg_disc_ppm,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".strip()


# --- hash-join chain + aggregate (J analog) --------------------------------

def revenue_by_nation(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """orders ⋈ customer ⋈ nation -> revenue per nation. customer/nation are
    small sides: broadcast via ray.put into a map_batches lookup (no shuffle
    join for the dimension tables — the SURVEY's broadcast-small-side rule)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    # pre-resolve customer -> nation NAME on the driver (dimension-sized),
    # broadcast two parallel arrays for a vectorized index_in lookup
    c_keys = cust["c_custkey"].combine_chunks()
    c_names = pc.take(
        nat["n_name"].combine_chunks(),
        pc.index_in(cust["c_nationkey"].combine_chunks(), nat["n_nationkey"].combine_chunks()),
    )
    lookup_ref = ray.put((c_keys, c_names))

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])

    class AttachNation:
        def __init__(self):
            self._keys, self._names = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            names = pc.take(self._names, pc.index_in(batch["o_custkey"], self._keys))
            # per-row cents before the Sum (exact integer aggregation)
            return pa.table({"n_name": names, "price_c": _cents(batch["o_totalprice"])})

    from virtuoso_quad_log_ray.stages.shuffle import actor_kwargs

    joined = orders.map_batches(AttachNation, **actor_kwargs(max_pool=4))
    agg = joined.groupby("n_name").aggregate(Sum("price_c"), Count())

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": batch["n_name"],
                "revenue_c": pc.cast(batch["sum(price_c)"], pa.int64()),
                "n_orders": pc.cast(batch["count()"], pa.int64()),
            }
        )

    return agg.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True)


REVENUE_BY_NATION_SQL = """
SELECT n.n_name,
       CAST(sum(CAST(round(100 * o.o_totalprice) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
""".strip()


# --- sort + limit (G7 analog) ---------------------------------------------

def top_orders(sf_dir: str, *, n: int = 20) -> ray.data.Dataset:
    """Top-N orders by totalprice (deterministic tie-break on o_orderkey).
    Distributed sort + limit: Ray's sort is a range-partitioned shuffle and
    the limit short-circuits block consumption."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    top = orders.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(n)
    return top.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"], "price_c": _cents(b["o_totalprice"])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def top_orders_sql(n: int = 20) -> str:
    return (
        "SELECT o_orderkey, CAST(round(100 * o_totalprice) AS BIGINT) AS price_c\n"
        f"FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT {n}"
    )


# --- event-stream windowed aggregate (T7 watermark analog) ----------------

def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour window per event_type: count + sum(value). Window
    assignment is a vectorized floor_temporal inside map_batches; the only
    shuffle is the final small groupby."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def window(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table(
            {
                "hour": pc.cast(pc.cast(hour, pa.timestamp("s")), pa.string()),
                "event_type": batch["event_type"],
                "value_c": _cents(batch["value"]),  # per-row cents: exact int Sum
            }
        )

    agg = (
        ev.map_batches(window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["hour", "event_type"])
        .aggregate(Count(), Sum("value_c"))
    )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": batch["hour"],
                "event_type": batch["event_type"],
                "n_events": pc.cast(batch["count()"], pa.int64()),
                "sum_value_c": pc.cast(batch["sum(value_c)"], pa.int64()),
            }
        )

    return agg.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True)


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(100 * value) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events
GROUP BY 1, 2
""".strip()


# --- latest-event-per-key (CDC/cursor analog, T1/T7) ----------------------

def latest_event_per_user(sf_dir: str) -> ray.data.Dataset:
    """Latest event per user (order by ts, tie-break event_id) — the
    checkpoint-cursor idiom (the reference's 'last trx log processed',
    generate-rdfpatch.sh:44-45) as a groupby-max.

    Implemented as per-block partial latest + one tiny groupby(map_groups)
    over num_users groups."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )

    def partial_latest(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[("user_id", "ascending"), ("ts", "descending"), ("event_id", "descending")],
        )
        t = batch.take(idx)
        users = t["user_id"].to_numpy()
        first_pos = np.unique(users, return_index=True)[1]
        return t.take(pa.array(np.sort(first_pos)))

    partial = ev.map_batches(partial_latest, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("ts", "descending"), ("event_id", "descending")]
        )
        t = group.take(idx).slice(0, 1)
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "last_event_id": pc.cast(t["event_id"], pa.int64()),
                "last_type": t["event_type"],
                "last_value_c": _cents(t["value"]),
            }
        )

    return partial.groupby("user_id").map_groups(merge, batch_format="pyarrow")


LATEST_EVENT_SQL = """
WITH ranked AS (
    SELECT user_id, event_id, event_type, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS last_event_id,
       event_type AS last_type,
       CAST(round(100 * value) AS BIGINT) AS last_value_c
FROM ranked WHERE rn = 1
""".strip()


# --- gap-based sessionization (T7 streaming-window analog) ----------------

SESSION_GAP_S = 1800  # 30 min


def user_sessions(sf_dir: str) -> ray.data.Dataset:
    """Per-user session stats with 30-minute-gap sessionization — the
    streaming session-window op expressed as groupby(user).map_groups:
    sort by ts within the group (vectorized), split where the gap exceeds
    the threshold (one diff + cumsum), aggregate per user. Event-time only;
    no wall-clock."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def sessions(group: pa.Table) -> pa.Table:
        col = group["ts"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ts = np.sort(col.to_numpy().astype("datetime64[s]").astype(np.int64))
        gaps = np.diff(ts)
        n_sessions = 1 + int((gaps > SESSION_GAP_S).sum())
        # session lengths in events: split indices -> segment sizes
        bounds = np.flatnonzero(gaps > SESSION_GAP_S) + 1
        sizes = np.diff(np.concatenate(([0], bounds, [len(ts)])))
        return pa.table(
            {
                "user_id": pc.cast(group["user_id"], pa.int64()).slice(0, 1),
                "n_events": pa.array([len(ts)], type=pa.int64()),
                "n_sessions": pa.array([n_sessions], type=pa.int64()),
                "max_session_events": pa.array([int(sizes.max())], type=pa.int64()),
            }
        )

    return ev.groupby("user_id").map_groups(sessions, batch_format="pyarrow")


USER_SESSIONS_SQL = f"""
WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_S}
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessioned AS (
    SELECT user_id, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked
),
per_session AS (
    SELECT user_id, session_id, count(*) AS n FROM sessioned GROUP BY 1, 2
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       sum(n)::BIGINT AS n_events,
       count(*)::BIGINT AS n_sessions,
       max(n)::BIGINT AS max_session_events
FROM per_session GROUP BY user_id
""".strip()


# --- IN-list filter + aggregate (F1 excluded-graphs analog) ---------------

def filtered_event_stats(sf_dir: str) -> ray.data.Dataset:
    """F1-style IN-list filter (event_type whitelist) + value threshold, then
    per-type count/max — the excluded-graphs predicate shape."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    allowed = pa.array(["error", "purchase"], type=pa.string())

    def filt(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(batch["event_type"], value_set=allowed), pc.greater(batch["value"], 100.0)
        )
        return batch.filter(keep)

    agg = (
        ev.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Count(), Max("value"))
    )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "n_events": pc.cast(batch["count()"], pa.int64()),
                "max_value_c": _cents(batch["max(value)"]),
            }
        )

    return agg.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True)


FILTERED_EVENT_STATS_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(round(100 * max(value)) AS BIGINT) AS max_value_c
FROM events
WHERE event_type IN ('error', 'purchase') AND value > 100.0
GROUP BY event_type
""".strip()
