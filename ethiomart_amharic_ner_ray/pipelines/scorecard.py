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

Every aggregation here is two-phase + bucketed (common.bucketed_group_agg):
per-batch pandas partials bound a hot vendor's shuffle volume by the number
of batches — the Zipf-hot-seller mitigation — and the final combine is one
vectorized pandas groupby per hash bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .common import bucketed_group_agg, read_table, round_away

LENDING_WEIGHTS = {"avg_views": 0.4, "posting_frequency": 0.3, "avg_price": 0.2, "product_variety": 0.1}
LENDING_CAPS = {"avg_views": 5000.0, "posting_frequency": 5.0, "avg_price": 10000.0, "product_variety": 50.0}


def q07_user_engagement(sf_dir: str) -> "ray.data.Dataset":
    """A2 engagement metrics per user: 0→NULL, then avg/max/min/sample-std
    (std merged from (sum, sumsq, n) partials)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["nz"] = df["value"].replace(0, np.nan)
        df["nz2"] = df["nz"] * df["nz"]
        g = df.groupby("user_id")
        return pd.DataFrame(
            {
                "p_n": g["value"].size(),
                "p_nzn": g["nz"].count(),
                "p_sum": g["nz"].sum(),
                "p_sumsq": g["nz2"].sum(),
                "p_min": g["nz"].min(),
                "p_max": g["nz"].max(),
            }
        ).reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).agg(
            n_events=("p_n", "sum"),
            nz_n=("p_nzn", "sum"),
            nz_sum=("p_sum", "sum"),
            nz_sumsq=("p_sumsq", "sum"),
            min_views=("p_min", "min"),
            max_views=("p_max", "max"),
        )
        n = g["nz_n"].to_numpy(dtype="float64")
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = g["nz_sum"].to_numpy() / n
            var = (g["nz_sumsq"].to_numpy() - avg * g["nz_sum"].to_numpy()) / (n - 1)
        std = np.where(n > 1, np.sqrt(np.maximum(var, 0.0)), 0.0)
        # all-zero-view user: avg over zero non-null rows is NULL (matches
        # SQL avg of all-NULL), consistency coalesces to 0
        g["avg_views"] = np.where(n > 0, round_away(np.nan_to_num(avg), 4), np.nan)
        g["avg_views"] = pd.array(g["avg_views"], dtype="Float64")
        g.loc[n == 0, "avg_views"] = pd.NA
        g["view_consistency"] = round_away(std, 4)
        return g[["user_id", "n_events", "avg_views", "max_views", "min_views", "view_consistency"]]

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["user_id"], final, n_buckets=32)


def q08_user_activity(sf_dir: str) -> "ray.data.Dataset":
    """A1 posting-activity metrics: ISO-weekly counts → mean/std/active."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def weekly_partial(df: pd.DataFrame) -> pd.DataFrame:
        iso = df["ts"].dt.isocalendar()
        df = pd.DataFrame(
            {"user_id": df["user_id"], "y": iso["year"].astype("int64"), "w": iso["week"].astype("int64")}
        )
        return df.groupby(["user_id", "y", "w"], as_index=False).agg(p_c=("w", "size"))

    def weekly_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "y", "w"], as_index=False).agg(c=("p_c", "sum"))

    weekly = bucketed_group_agg(
        ds.map_batches(weekly_partial, batch_format="pandas", batch_size=65536),
        ["user_id", "y", "w"],
        weekly_final,
        n_buckets=32,
    )

    def user_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id")["c"]
        out = pd.DataFrame(
            {
                "total_posts": g.sum().astype("int64"),
                "active_weeks": g.size().astype("int64"),
                "posting_frequency": round_away(g.mean().to_numpy(), 4),
                "posting_consistency": round_away(g.std(ddof=1).fillna(0.0).to_numpy(), 4),
            }
        ).reset_index()
        return out

    return bucketed_group_agg(weekly, ["user_id"], user_final, n_buckets=32)


def q09_user_value_stats(sf_dir: str) -> "ray.data.Dataset":
    """A2's exact-median + argmax-post. Exact median is inherently per-key,
    so raw rows shuffle — but per hash bucket, with a vectorized pandas
    combine per bucket. Deterministic argmax: min event_id among max rows."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "value"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        gm = df.groupby("user_id")["value"].agg(["median", "max"]).reset_index()
        m = df.merge(gm[["user_id", "max"]], on="user_id")
        top = (
            m[m["value"] == m["max"]]
            .groupby("user_id", as_index=False)["event_id"]
            .min()
            .rename(columns={"event_id": "top_event_id"})
        )
        out = gm.merge(top, on="user_id")
        out["median_value"] = round_away(out["median"].to_numpy(), 4)
        return out[["user_id", "median_value", "top_event_id"]]

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=32)


def q10_lending_score(sf_dir: str) -> "ray.data.Dataset":
    """A5 weighted lending score over events (value≈views, purchase value≈
    price, distinct event types≈product variety). Formula and caps exactly
    as metrics_calculator.py:100-116; fully vectorized per bucket."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value", "ts"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["nz"] = df["value"].replace(0, np.nan)
        iso = df["ts"].dt.isocalendar()
        df["_y"], df["_w"] = iso["year"].to_numpy(), iso["week"].to_numpy()

        avg_views = df.groupby("user_id")["nz"].mean()
        weekly = df.groupby(["user_id", "_y", "_w"]).size().rename("c").reset_index()
        freq = weekly.groupby("user_id")["c"].mean()
        avg_price = df[df["event_type"] == "purchase"].groupby("user_id")["value"].mean()
        variety = df.groupby("user_id")["event_type"].nunique()

        users = avg_views.index
        av = avg_views.fillna(0.0).to_numpy()
        fr = freq.reindex(users).fillna(0.0).to_numpy()
        ap = avg_price.reindex(users).fillna(0.0).to_numpy()
        va = variety.reindex(users).fillna(0).to_numpy(dtype="float64")

        def norm(v, cap):
            return np.minimum(1.0, np.maximum(0.0, v / cap))

        score = (
            LENDING_WEIGHTS["avg_views"] * norm(av, LENDING_CAPS["avg_views"])
            + LENDING_WEIGHTS["posting_frequency"] * norm(fr, LENDING_CAPS["posting_frequency"])
            + LENDING_WEIGHTS["avg_price"] * norm(ap, LENDING_CAPS["avg_price"])
            + LENDING_WEIGHTS["product_variety"] * norm(va, LENDING_CAPS["product_variety"])
        )
        return pd.DataFrame(
            {"user_id": users, "lending_score": round_away(np.minimum(100.0, score * 100.0), 4)}
        )

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=32)


def q23_top_event_per_user_type(sf_dir: str) -> "ray.data.Dataset":
    """Per-group top-1 (J2/O5 parity at two-key granularity): for each
    (user_id, event_type), the max value and the deterministic winning
    event (min event_id among max-value rows)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "event_id", "value"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        keys = ["user_id", "event_type"]
        gm = df.groupby(keys, as_index=False)["value"].max().rename(columns={"value": "max_value"})
        m = df.merge(gm, on=keys)
        top = (
            m[m["value"] == m["max_value"]]
            .groupby(keys, as_index=False)["event_id"]
            .min()
            .rename(columns={"event_id": "top_event_id"})
        )
        out = gm.merge(top, on=keys)
        out["max_value"] = round_away(out["max_value"].to_numpy(), 4)
        return out

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=32)


def q24_best_worst_day(sf_dir: str) -> "ray.data.Dataset":
    """A4 temporal-trend parity: per user, the best/worst day by average
    value (the reference's monthly idxmax/idxmin, at daily granularity since
    the events table spans one month). Ties break to the smaller day."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def daily_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"user_id": df["user_id"], "d": df["ts"].dt.day, "value": df["value"]})
        return df.groupby(["user_id", "d"], as_index=False).agg(
            p_n=("value", "size"), p_sum=("value", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "d"], as_index=False).agg(n=("p_n", "sum"), s=("p_sum", "sum"))
        g["av"] = g["s"] / g["n"]
        g = g.sort_values(["user_id", "av", "d"], ascending=[True, False, True], kind="mergesort")
        best = g.groupby("user_id", as_index=False).first()[["user_id", "d", "av"]]
        g2 = g.sort_values(["user_id", "av", "d"], ascending=[True, True, True], kind="mergesort")
        worst = g2.groupby("user_id", as_index=False).first()[["user_id", "d", "av"]]
        out = best.merge(worst, on="user_id", suffixes=("_best", "_worst"))
        return pd.DataFrame(
            {
                "user_id": out["user_id"],
                "best_day": out["d_best"].astype("int64"),
                "worst_day": out["d_worst"].astype("int64"),
                "best_avg": round_away(out["av_best"].to_numpy(), 4),
                "worst_avg": round_away(out["av_worst"].to_numpy(), 4),
            }
        )

    partials = ds.map_batches(daily_partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["user_id"], final, n_buckets=32)


# --- transcripts branch (the reference's actual vendor analytics) ----------


_SC_PARTIAL_COLS = [
    "seller",
    "p_turns",
    "p_products",
    "p_prices",
    "p_price_sum",
    "p_first_ts",
    "p_last_ts",
    "p_norm",
]


def _sc_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize a partial to the fixed column order/dtypes so the two
    partial streams union cleanly."""
    out = pd.DataFrame(index=df.index)
    out["seller"] = df["seller"].astype(str)
    for c, default, dt in [
        ("p_turns", 0, "int64"),
        ("p_products", 0, "int64"),
        ("p_prices", 0, "int64"),
        ("p_price_sum", 0.0, "float64"),
    ]:
        out[c] = (df[c] if c in df else default)
        out[c] = out[c].astype(dt)
    for c in ("p_first_ts", "p_last_ts"):
        out[c] = pd.to_datetime(df[c]) if c in df else pd.NaT
    out["p_norm"] = df["p_norm"] if "p_norm" in df else None
    return out[_SC_PARTIAL_COLS]


def seller_scorecards(mentions_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-seller scorecard over the KG mentions dataset (rows-only check).

    Hot-seller skew (Zipf channels): per-batch partials bound each seller's
    shuffle volume by the number of batches. Fully vectorized (round-1
    verdict finding #5): turn/ts stats come from a pandas groupby over the
    raw columns; mention stats run over the FLAT mention rows
    (kg.flatten_mentions) with vectorized splits; product variety travels
    as distinct (seller, product) partial ROWS (counted with nunique in the
    final), never as Python sets.

    The two partial branches each consume ``mentions_ds``, so pass a
    MATERIALIZED or Parquet-backed dataset — a lazy actor-pool chain
    executed by both union branches can deadlock at low CPU counts."""
    import pyarrow as pa

    from .kg import flatten_mentions

    def turn_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("seller", as_index=False).agg(
            p_turns=("ts", "size"), p_first_ts=("ts", "min"), p_last_ts=("ts", "max")
        )
        return _sc_frame(g)

    def mention_partial(t: pa.Table) -> pd.DataFrame:
        flat = flatten_mentions(
            t.select(["conv_id", "turn_idx", "seller", "mentions"])
        ).to_pandas()
        if flat.empty:
            return _sc_frame(pd.DataFrame(columns=["seller"]))
        prod = flat[flat["etype"] == "PRODUCT"]
        price = flat[flat["etype"] == "PRICE"]
        counts = (
            prod.groupby("seller", as_index=False)
            .size()
            .rename(columns={"size": "p_products"})
        )
        if len(price):
            pv = price.assign(v=price["norm"].str.split(" ").str[0].astype(float))
            pstats = pv.groupby("seller", as_index=False).agg(
                p_prices=("v", "size"), p_price_sum=("v", "sum")
            )
            counts = counts.merge(pstats, on="seller", how="outer")
        stats = _sc_frame(counts.fillna({"p_products": 0, "p_prices": 0, "p_price_sum": 0.0}))
        distinct = prod[["seller", "norm"]].drop_duplicates().rename(columns={"norm": "p_norm"})
        return pd.concat([stats, _sc_frame(distinct)], ignore_index=True)

    partials = mentions_ds.map_batches(turn_partial, batch_format="pandas").union(
        mentions_ds.map_batches(mention_partial, batch_format="pyarrow")
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("seller").agg(
            total_turns=("p_turns", "sum"),
            total_products=("p_products", "sum"),
            product_variety=("p_norm", "nunique"),
            n_prices=("p_prices", "sum"),
            price_sum=("p_price_sum", "sum"),
            first_ts=("p_first_ts", "min"),
            last_ts=("p_last_ts", "max"),
        )
        n = g["n_prices"].to_numpy()
        g["avg_price"] = np.where(
            n > 0, round_away(g["price_sum"].to_numpy() / np.maximum(n, 1), 4), 0.0
        )
        g = g.reset_index()
        return g[
            [
                "seller",
                "total_turns",
                "total_products",
                "product_variety",
                "avg_price",
                "first_ts",
                "last_ts",
            ]
        ].astype({"total_turns": "int64", "total_products": "int64", "product_variety": "int64"})

    return bucketed_group_agg(partials, ["seller"], final, n_buckets=32)


def scorecard_summary(scorecards_ds: "ray.data.Dataset") -> pd.DataFrame:
    """Run-level vendor-analytics summary — the engine-side analogue of the
    reference's report/visualization branch (SURVEY.md §2 S10/S13; charts
    replaced by a tidy (metric, value) frame a dashboard can render).
    Input is the per-seller scorecard AGGREGATE (one row per seller — small
    by construction), so the driver-side collect here is bounded by seller
    cardinality, not corpus size."""
    df = scorecards_ds.to_pandas()
    if df.empty:
        return pd.DataFrame({"metric": pd.array([], dtype="object"), "value": pd.array([], dtype="object")})
    priced = df[df["avg_price"] > 0]
    top = df.sort_values(["total_products", "seller"], ascending=[False, True]).head(5)
    rows = [
        ("n_sellers", str(len(df))),
        ("total_turns", str(int(df["total_turns"].sum()))),
        ("total_product_mentions", str(int(df["total_products"].sum()))),
        ("mean_product_variety", str(round_away(float(df["product_variety"].mean()), 4))),
        ("n_sellers_with_prices", str(len(priced))),
        (
            "median_avg_price",
            str(round_away(float(priced["avg_price"].median()), 4)) if len(priced) else "0.0",
        ),
        ("first_activity", str(df["first_ts"].min())),
        ("last_activity", str(df["last_ts"].max())),
    ]
    for rank, r in enumerate(top.itertuples(), 1):
        rows.append((f"top{rank}_seller", f"{r.seller}:{int(r.total_products)}"))
    return pd.DataFrame(rows, columns=["metric", "value"])
