"""Stream-shaped operators over the events log: windowed aggregates and
as-of joins (operators the reference lacks but a transcript/event pipeline
needs — SURVEY.md §2.9's "custom operators" slot).

Partitioning assumption (documented per the custom-operator rule): events
are grouped per user_id; per-user state (the running cummax in the as-of
join) fits in one group. Windows use two-phase aggregation, so a hot hour
never concentrates raw rows."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from .common import make_rounder, read_table


def q18_hourly_windows(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour windows per user: n_events + sum_value.
    Two-phase: per-batch (user, hour) partials → final groupby sum."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "window_start": df["ts"].dt.floor("h"),
                "value": df["value"],
            }
        )
        return df.groupby(["user_id", "window_start"], as_index=False).agg(
            p_n=("value", "size"), p_sum=("value", "sum")
        )

    agg = ds.map_batches(partial, batch_format="pandas", batch_size=65536).groupby(
        ["user_id", "window_start"]
    ).aggregate(Sum("p_n", alias_name="n_events"), Sum("p_sum", alias_name="sum_value"))

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = make_rounder(["sum_value"])(t)
        i = t.schema.get_field_index("window_start")
        return t.set_column(i, "window_start", pc.cast(t.column("window_start"), pa.timestamp("us")))

    return agg.map_batches(finalize, batch_format="pyarrow")


def q17_asof_last_signup(sf_dir: str) -> "ray.data.Dataset":
    """As-of join: each event gets the ts of the latest 'signup' event by the
    same user at-or-before it (ties broken by event_id order). Sorted scan
    with forward-fill inside per-user groups."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        signup_ts = df["ts"].where(df["event_type"] == "signup")
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                # cummax leaves NaT at non-signup rows; ffill carries the
                # running max forward (matches the SQL window max semantics)
                "last_signup_ts": signup_ts.cummax().ffill(),
            }
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")

    def cast_us(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = t.schema.get_field_index("last_signup_ts")
        return t.set_column(i, "last_signup_ts", pc.cast(t.column("last_signup_ts"), pa.timestamp("us")))

    return out.map_batches(cast_us, batch_format="pyarrow")
