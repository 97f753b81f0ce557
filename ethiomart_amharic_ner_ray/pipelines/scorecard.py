"""Vendor/user scorecard aggregations — the reference's metrics_calculator
semantics (SURVEY.md §2.5 A1-A5) re-expressed as two-phase Ray aggregates.

Two instantiations:
  * events-based (user_id = vendor, value = views) — SQL-checkable against
    the DuckDB oracle at sf0.01;
  * transcripts-based (seller scorecard over the KG mentions output) —
    the reference's actual vendor-analytics branch, rows-only checked.

All reference formulas preserved: 0-views→NULL before engagement stats
(metrics_calculator.py:48), sample-std consistency, weekly ISO bucketing
(data_loader.py:49-56), and the weighted lending score with caps
{views 5000, freq 5, price 10000, variety 50} and weights
{.4, .3, .2, .1} capped at 100 (metrics_calculator.py:100-116,
config/config.py:14-19).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .common import make_rounder, read_table, round_away

LENDING_WEIGHTS = {"avg_views": 0.4, "posting_frequency": 0.3, "avg_price": 0.2, "product_variety": 0.1}
LENDING_CAPS = {"avg_views": 5000.0, "posting_frequency": 5.0, "avg_price": 10000.0, "product_variety": 50.0}


def _finalize_engagement(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = pc.cast(t.column("nz_n"), pa.float64())
    avg = pc.divide(t.column("nz_sum"), n)
    # sample std from (sum, sumsq, n); n==1 → 0 (oracle COALESCEs the NULL)
    var = pc.divide(
        pc.subtract(t.column("nz_sumsq"), pc.multiply(avg, t.column("nz_sum"))),
        pc.subtract(n, pa.scalar(1.0)),
    )
    std = pc.if_else(pc.greater(n, 1.0), pc.sqrt(pc.max_element_wise(var, pa.scalar(0.0))), pa.scalar(0.0))
    t = t.append_column("avg_views", avg)
    t = t.append_column("view_consistency", std)
    t = t.select(["user_id", "n_events", "avg_views", "max_views", "min_views", "view_consistency"])
    return make_rounder(["avg_views", "view_consistency"])(t)


def q07_user_engagement(sf_dir: str) -> "ray.data.Dataset":
    """A2 engagement metrics per user: 0→NULL, then avg/max/min/sample-std.
    Two-phase: per-batch (sum, sumsq, count, min, max) partials, tiny final
    groupby — no raw-row shuffle, robust to hot users (the salt-free
    alternative to salting: partials bound each key's shuffle rows by
    #batches, not #events)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["nz"] = df["value"].replace(0, np.nan)
        g = df.groupby("user_id")
        out = pd.DataFrame(
            {
                "p_n": g["value"].size(),
                "p_nzn": g["nz"].count(),
                "p_sum": g["nz"].sum(),
                "p_sumsq": g["nz"].apply(lambda s: float(np.nansum(np.square(s)))),
                "p_min": g["nz"].min(),
                "p_max": g["nz"].max(),
            }
        ).reset_index()
        return out

    agg = ds.map_batches(partial, batch_format="pandas", batch_size=65536).groupby("user_id").aggregate(
        Sum("p_n", alias_name="n_events"),
        Sum("p_nzn", alias_name="nz_n"),
        Sum("p_sum", alias_name="nz_sum"),
        Sum("p_sumsq", alias_name="nz_sumsq"),
        Min("p_min", alias_name="min_views"),
        Max("p_max", alias_name="max_views"),
    )
    return agg.map_batches(_finalize_engagement, batch_format="pyarrow")


def q08_user_activity(sf_dir: str) -> "ray.data.Dataset":
    """A1 posting-activity metrics: ISO-weekly counts → mean/std/active."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def weekly_partial(df: pd.DataFrame) -> pd.DataFrame:
        iso = df["ts"].dt.isocalendar()
        df = pd.DataFrame({"user_id": df["user_id"], "y": iso["year"].astype("int64"), "w": iso["week"].astype("int64")})
        return df.groupby(["user_id", "y", "w"], as_index=False).agg(p_c=("w", "size"))

    weekly = (
        ds.map_batches(weekly_partial, batch_format="pandas", batch_size=65536)
        .groupby(["user_id", "y", "w"])
        .aggregate(Sum("p_c", alias_name="c"))
    )

    def user_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id")
        return pd.DataFrame(
            {
                "p_total": g["c"].sum(),
                "p_weeks": g["c"].size(),
                "p_sum": g["c"].sum(),
                "p_sumsq": g["c"].apply(lambda s: float(np.sum(np.square(s, dtype="float64")))),
            }
        ).reset_index()

    agg = weekly.map_batches(user_partial, batch_format="pandas").groupby("user_id").aggregate(
        Sum("p_total", alias_name="total_posts"),
        Sum("p_weeks", alias_name="active_weeks"),
        Sum("p_sum", alias_name="w_sum"),
        Sum("p_sumsq", alias_name="w_sumsq"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.cast(t.column("active_weeks"), pa.float64())
        mean = pc.divide(pc.cast(t.column("w_sum"), pa.float64()), n)
        var = pc.divide(
            pc.subtract(pc.cast(t.column("w_sumsq"), pa.float64()), pc.multiply(mean, pc.cast(t.column("w_sum"), pa.float64()))),
            pc.subtract(n, pa.scalar(1.0)),
        )
        std = pc.if_else(pc.greater(n, 1.0), pc.sqrt(pc.max_element_wise(var, pa.scalar(0.0))), pa.scalar(0.0))
        t = t.append_column("posting_frequency", mean)
        t = t.append_column("posting_consistency", std)
        t = t.select(["user_id", "total_posts", "active_weeks", "posting_frequency", "posting_consistency"])
        return make_rounder(["posting_frequency", "posting_consistency"])(t)

    return agg.map_batches(finalize, batch_format="pyarrow")


def q09_user_value_stats(sf_dir: str) -> "ray.data.Dataset":
    """A2's exact-median + argmax-post: per-group sort inside map_groups
    (exact median is inherently per-group; users are bucketed by Ray's
    hash shuffle). Deterministic argmax: min event_id among max-value rows."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "value"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        mx = df["value"].max()
        return pd.DataFrame(
            {
                "user_id": [df["user_id"].iloc[0]],
                "median_value": [round_away(float(df["value"].median()), 4)],
                "top_event_id": [int(df.loc[df["value"] == mx, "event_id"].min())],
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def q10_lending_score(sf_dir: str) -> "ray.data.Dataset":
    """A5 weighted lending score over events (value≈views, purchase value≈
    price, distinct event types≈product variety). Formula and caps exactly
    as metrics_calculator.py:100-116."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value", "ts"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        views = df["value"].replace(0, np.nan)
        avg_views = float(views.mean()) if views.count() else 0.0
        iso = df["ts"].dt.isocalendar()
        weekly = df.groupby([iso["year"], iso["week"]]).size()
        freq = float(weekly.mean())
        purchases = df.loc[df["event_type"] == "purchase", "value"]
        avg_price = float(purchases.mean()) if len(purchases) else 0.0
        variety = float(df["event_type"].nunique())

        def norm(v, cap):
            return min(1.0, max(0.0, v / cap))

        score = (
            LENDING_WEIGHTS["avg_views"] * norm(avg_views, LENDING_CAPS["avg_views"])
            + LENDING_WEIGHTS["posting_frequency"] * norm(freq, LENDING_CAPS["posting_frequency"])
            + LENDING_WEIGHTS["avg_price"] * norm(avg_price, LENDING_CAPS["avg_price"])
            + LENDING_WEIGHTS["product_variety"] * norm(variety, LENDING_CAPS["product_variety"])
        )
        return pd.DataFrame(
            {"user_id": [df["user_id"].iloc[0]], "lending_score": [round_away(min(100.0, score * 100.0), 4)]}
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


# --- transcripts branch (the reference's actual vendor analytics) ----------


def seller_scorecards(mentions_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-seller scorecard over the KG mentions dataset (rows-only check).

    Hot-seller skew (Zipf channels) is handled the two-phase way: per-batch
    partial aggregates bound each seller's shuffle volume by the number of
    batches, so a seller with 40% of all turns still ships only one partial
    row per batch."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for seller, g in df.groupby("seller"):
            n_products = 0
            n_prices = 0
            price_sum = 0.0
            products = set()
            for ml in g["mentions"]:
                if ml is None:
                    continue
                for m in ml:
                    if m["etype"] == "PRODUCT":
                        n_products += 1
                        products.add(m["norm"])
                    elif m["etype"] == "PRICE":
                        n_prices += 1
                        price_sum += float(m["norm"].split(" ")[0])
            rows.append(
                {
                    "seller": seller,
                    "p_turns": len(g),
                    "p_products": n_products,
                    "p_prices": n_prices,
                    "p_price_sum": price_sum,
                    "p_product_set": sorted(products),
                    "p_first_ts": g["ts"].min(),
                    "p_last_ts": g["ts"].max(),
                }
            )
        return pd.DataFrame(rows)

    partials = mentions_ds.map_batches(partial, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        products: set = set()
        for s in df["p_product_set"]:
            products.update(s)
        n_prices = int(df["p_prices"].sum())
        return pd.DataFrame(
            {
                "seller": [df["seller"].iloc[0]],
                "total_turns": [int(df["p_turns"].sum())],
                "total_products": [int(df["p_products"].sum())],
                "product_variety": [len(products)],
                "avg_price": [round_away(float(df["p_price_sum"].sum()) / n_prices, 4) if n_prices else 0.0],
                "first_ts": [df["p_first_ts"].min()],
                "last_ts": [df["p_last_ts"].max()],
            }
        )

    return partials.groupby("seller").map_groups(final, batch_format="pandas")
