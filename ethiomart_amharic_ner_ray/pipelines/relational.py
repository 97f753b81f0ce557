"""Generic relational operators over the TPC-H-ish test tables.

Each query demonstrates one scale pattern the engine relies on:

  q01  two-phase grouped aggregation: per-batch pandas partials →
       bucketed_group_agg (the engine-wide wide-aggregation shape; see
       common.py for why GroupedData.aggregate is avoided)
  q02  vectorized filter + projection pruned at the read
  q03  broadcast hash join (dimension table via ray.put, no shuffle)
  q04  two-level broadcast join (snowflake rollup)
  q05  top-k without a global sort shuffle (per-batch top-k, tiny final)
  q06  temporal bucketing + two-phase aggregate (M13/A4 analogue)
  q19  distinct values with counts
  q20  broadcast join rollup on another dimension

These correspond to SURVEY.md §2.4-§2.6 mappings; the reference itself has
no relational engine (single pandas process), so these are the Ray-native
equivalents of its groupby/lookup idioms at cluster scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .common import (
    bucketed_group_agg,
    bucketed_join,
    get_broadcast,
    rename_cols,
    read_small,
    read_table,
    round_away,
)


def q01_pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-style pricing summary: two-phase grouped aggregation."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    keys = ["l_returnflag", "l_linestatus"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["disc_price"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        return df.groupby(keys, as_index=False).agg(
            p_qty=("l_quantity", "sum"),
            p_base=("l_extendedprice", "sum"),
            p_disc=("disc_price", "sum"),
            p_cnt=("l_quantity", "size"),
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            sum_qty=("p_qty", "sum"),
            sum_base_price=("p_base", "sum"),
            sum_disc_price=("p_disc", "sum"),
            count_order=("p_cnt", "sum"),
        )
        g["avg_qty"] = round_away(g["sum_qty"] / g["count_order"], 4)
        g["avg_price"] = round_away(g["sum_base_price"] / g["count_order"], 4)
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            g[c] = round_away(g[c], 4)
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, keys, final, n_buckets=8)


def q02_filter_orders(sf_dir: str) -> "ray.data.Dataset":
    """Vectorized filter + projection; columns pruned at the read."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"])

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater(t.column("o_totalprice"), 100000.0),
            pc.equal(t.column("o_orderstatus"), "O"),
        )
        return t.filter(mask).select(["o_orderkey", "o_custkey", "o_totalprice"])

    return ds.map_batches(f, batch_format="pyarrow")


def _segment_join_batch(t: pa.Table, ref) -> pa.Table:
    """Broadcast join: custkey → mktsegment (sorted-key searchsorted, no
    shuffle). Stateless task + per-worker broadcast cache — the state is
    two arrays, far too cheap to justify an actor pool."""
    keys, segs = get_broadcast(ref)
    ck = t.column("o_custkey").to_numpy()
    idx = np.searchsorted(keys, ck)
    # inner-join semantics: drop rows whose key is absent (searchsorted
    # alone returns an insertion point, which would silently join a
    # missing key to the NEXT customer or index out of bounds)
    idx_c = np.clip(idx, 0, len(keys) - 1)
    hit = keys[idx_c] == ck
    t = t.filter(pa.array(hit))
    seg = segs[idx_c[hit]]
    return t.append_column("c_mktsegment", pa.array(seg, pa.string()))


def q03_segment_revenue(sf_dir: str) -> "ray.data.Dataset":
    """orders ⋈ customer (broadcast small side) → per-segment rollup."""
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    order_ck = np.argsort(cust.column("c_custkey").to_numpy())
    keys = cust.column("c_custkey").to_numpy()[order_ck]
    segs = np.asarray(cust.column("c_mktsegment").to_pylist(), dtype=object)[order_ck]
    ref = ray.put((keys, segs))

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = ds.map_batches(_segment_join_batch, fn_kwargs={"ref": ref}, batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("c_mktsegment", as_index=False).agg(
            p_n=("o_totalprice", "size"), p_sum=("o_totalprice", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("p_n", "sum"), total_price=("p_sum", "sum")
        )
        g["total_price"] = round_away(g["total_price"], 4)
        return g

    partials = joined.map_batches(partial, batch_format="pandas")
    return bucketed_group_agg(partials, ["c_mktsegment"], final, n_buckets=4)


def _nation_region_join_batch(t: pa.Table, ref) -> pa.Table:
    nation_to_region = get_broadcast(ref)
    nk = t.column("c_nationkey").to_pylist()
    rname = [nation_to_region[k] for k in nk]
    return t.append_column("r_name", pa.array(rname, pa.string()))


def q04_region_rollup(sf_dir: str) -> "ray.data.Dataset":
    """customer ⋈ nation ⋈ region via one composed broadcast map."""
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = read_small(sf_dir, "region", columns=["r_regionkey", "r_name"])
    r_map = dict(zip(region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist()))
    n_map = {
        nk: r_map[rk]
        for nk, rk in zip(nation.column("n_nationkey").to_pylist(), nation.column("n_regionkey").to_pylist())
    }
    ref = ray.put(n_map)

    ds = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    joined = ds.map_batches(_nation_region_join_batch, fn_kwargs={"ref": ref}, batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("r_name", as_index=False).agg(
            p_n=("c_acctbal", "size"), p_sum=("c_acctbal", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("r_name", as_index=False).agg(
            n_customers=("p_n", "sum"), total_acctbal=("p_sum", "sum")
        )
        g["total_acctbal"] = round_away(g["total_acctbal"], 4)
        return g

    partials = joined.map_batches(partial, batch_format="pandas")
    return bucketed_group_agg(partials, ["r_name"], final, n_buckets=4)


def q05_topk_parts(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k without a global sort: per-batch top-k, tiny driver-side final.
    (A full ``ds.sort().limit(k)`` shuffles every block; this moves ≤k rows
    per batch.) Tie-break on p_partkey for determinism."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["p_retailprice", "p_partkey"], ascending=[False, True]).head(k)

    cand = ds.map_batches(topk, batch_format="pandas").to_pandas()
    return (
        cand.sort_values(["p_retailprice", "p_partkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def q06_events_daily(sf_dir: str) -> "ray.data.Dataset":
    """Temporal bucketing (reference M13: year/month/week derivation) +
    two-phase aggregate per day."""
    ds = read_table(sf_dir, "events", columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "y": pc.year(t.column("ts")).to_numpy(),
                "m": pc.month(t.column("ts")).to_numpy(),
                "d": pc.day(t.column("ts")).to_numpy(),
                "value": t.column("value").to_numpy(),
            }
        )
        return pa.Table.from_pandas(
            df.groupby(["y", "m", "d"], as_index=False).agg(
                p_n=("value", "size"), p_sum=("value", "sum")
            ),
            preserve_index=False,
        ).replace_schema_metadata(None)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["y", "m", "d"], as_index=False).agg(
            n_events=("p_n", "sum"), sum_value=("p_sum", "sum")
        )
        g["avg_value"] = round_away(g["sum_value"] / g["n_events"], 4)
        g["sum_value"] = round_away(g["sum_value"], 4)
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_agg(partials, ["y", "m", "d"], final, n_buckets=8)


def q19_event_type_counts(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(sf_dir, "events", columns=["event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(p_n=("event_type", "size"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(n=("p_n", "sum"))

    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_group_agg(partials, ["event_type"], final, n_buckets=4)


def q22_customers_without_orders(sf_dir: str, min_totalprice: float = 300000.0) -> "ray.data.Dataset":
    """Broadcast ANTI join: customers with no big order (> min_totalprice).
    The qualifying order-customer key set is collected once on the driver
    (pyarrow filter + unique) and broadcast; the anti filter runs inside
    map_batches. At 100 TB the key set becomes a Bloom filter (same shape,
    probabilistic membership + exact recheck)."""
    import pyarrow.compute as pc

    orders = read_small(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.filter(pc.greater(orders.column("o_totalprice"), min_totalprice))
    okeys = pc.unique(big.column("o_custkey"))
    ref = ray.put(okeys)

    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def anti(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = pc.invert(pc.is_in(batch.column("c_custkey"), value_set=keys))
        return batch.filter(mask)

    return ds.map_batches(anti, batch_format="pyarrow")


def q20_supplier_nation(sf_dir: str) -> "ray.data.Dataset":
    """supplier ⋈ nation broadcast rollup."""
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    n_map = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))
    ref = ray.put(n_map)

    def join_nation(t: pa.Table) -> pa.Table:
        nmap = get_broadcast(ref)
        names = [nmap[k] for k in t.column("s_nationkey").to_pylist()]
        return t.append_column("n_name", pa.array(names, pa.string()))

    ds = read_table(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
    joined = ds.map_batches(join_nation, batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_name", as_index=False).agg(
            p_n=("s_acctbal", "size"), p_sum=("s_acctbal", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_name", as_index=False).agg(
            n_suppliers=("p_n", "sum"), total_acctbal=("p_sum", "sum")
        )
        g["total_acctbal"] = round_away(g["total_acctbal"], 4)
        return g

    partials = joined.map_batches(partial, batch_format="pandas")
    return bucketed_group_agg(partials, ["n_name"], final, n_buckets=4)


def q29_deterministic_sample(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic content-hash sampling (§2.6 sampling parity): keep an
    event iff the first 2 hex chars of md5(event_id) sort below '29' —
    ≈16% rate, stable under resharding/resume (never RNG state), identical
    predicate on the DuckDB side. Stratification across event types falls
    out of hashing the id, not the type."""
    import hashlib

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_pylist()
        keep = [
            hashlib.md5(str(i).encode("ascii")).hexdigest()[:2] < "29" for i in ids
        ]
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(f, batch_format="pyarrow")


def q30_distinct_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Distinct (§2.7 unique parity): distinct (user_id, event_type) pairs
    via per-batch drop_duplicates partials → bucketed final distinct —
    the two-phase shape, so a hot pair never concentrates raw rows."""
    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(df):
        return df.drop_duplicates()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(
        partials, ["user_id", "event_type"], lambda df: df.drop_duplicates(), n_buckets=32
    )


def q31_region_nation_rollup(sf_dir: str) -> "ray.data.Dataset":
    """Hierarchical ROLLUP (region → nation → grand total) over customer
    balances: the detail aggregation runs ONCE (two-phase bucketed); the
    coarser levels reduce the tiny detail result — never a second pass over
    the fact table. NULL group levels are encoded as '' to keep the
    value-hash comparable."""
    cust = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    region = read_small(sf_dir, "region", columns=["r_regionkey", "r_name"])
    n2name = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))
    n2r = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_regionkey").to_pylist()))
    r2name = dict(zip(region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist()))
    import ray as _ray

    ref = _ray.put((n2name, n2r, r2name))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n2name_, n2r_, r2name_ = _ray.get(ref)
        df = df.assign(
            r_name=[r2name_[n2r_[k]] for k in df["c_nationkey"]],
            n_name=[n2name_[k] for k in df["c_nationkey"]],
        )
        return df.groupby(["r_name", "n_name"], as_index=False).agg(
            p_n=("c_acctbal", "size"), p_sum=("c_acctbal", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["r_name", "n_name"], as_index=False).agg(
            n_customers=("p_n", "sum"), total_acctbal=("p_sum", "sum")
        )

    detail_ds = bucketed_group_agg(
        cust.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["r_name", "n_name"],
        final,
        n_buckets=16,
    )
    detail = detail_ds.to_pandas()  # ≤ |nation| rows — the rollup input is tiny
    lvl1 = detail.groupby("r_name", as_index=False).agg(
        n_customers=("n_customers", "sum"), total_acctbal=("total_acctbal", "sum")
    )
    lvl1["n_name"] = ""
    total = pd.DataFrame(
        {
            "r_name": [""],
            "n_name": [""],
            "n_customers": [detail["n_customers"].sum()],
            "total_acctbal": [detail["total_acctbal"].sum()],
        }
    )
    out = pd.concat([detail, lvl1[detail.columns], total[detail.columns]], ignore_index=True)
    out["total_acctbal"] = round_away(out["total_acctbal"].to_numpy(), 4)
    out["n_customers"] = out["n_customers"].astype("int64")
    return out


def q32_event_type_pivot(sf_dir: str) -> "ray.data.Dataset":
    """PIVOT: one row per user, one count column per event type (the closed
    5-type vocabulary). Two-phase: per-batch (user, type) partials →
    bucketed final pivot_table with zero fill."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    types = ["click", "error", "purchase", "signup", "view"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "event_type"], as_index=False).agg(p_n=("event_type", "size"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(n=("p_n", "sum"))
        piv = g.pivot_table(index="user_id", columns="event_type", values="n", fill_value=0)
        for t in types:
            if t not in piv.columns:
                piv[t] = 0
        piv = piv[types].astype("int64").reset_index()
        piv.columns = ["user_id"] + [f"n_{t}" for t in types]
        return piv

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["user_id"], final, n_buckets=32)


def q34_stratified_sample(sf_dir: str, n_per_stratum: int = 50) -> "ray.data.Dataset":
    """Deterministic stratified sampling (§2.6): EXACTLY n rows per stratum
    (event_type), chosen as the n smallest (md5(event_id), event_id) ranks —
    content-addressed like q29, so the sample is stable under resharding,
    resume and reruns (no RNG state to lose), but with a per-stratum count
    guarantee q29's global-rate filter can't give. Min-k per stratum is a
    semilattice: per-batch partials bound each stratum's shuffle volume to
    n x n_blocks rows regardless of stratum skew; the per-bucket final
    re-ranks the partials. Oracle is the row_number-over-hash-order window."""
    import hashlib

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(str(i).encode("ascii")).hexdigest() for i in df["event_id"]]
        return (
            df.assign(_h=h)
            .sort_values(["event_type", "_h", "event_id"], kind="mergesort")
            .groupby("event_type", as_index=False)
            .head(n_per_stratum)
        )

    # partials drop the hash column — the final pass recomputes it over the
    # (tiny) surviving n x n_blocks rows, keeping the shuffle payload slim
    partials = ds.map_batches(
        lambda df: topn(df)[["event_id", "event_type"]],
        batch_format="pandas",
        batch_size=65536,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return topn(df)[["event_id", "event_type"]]

    return bucketed_group_agg(partials, ["event_type"], final, n_buckets=8)


def q33_top3_events_per_user(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Grouped top-k (top-3 events by value per user, deterministic
    event_id tie-break): per-batch per-user top-k partials bound a hot
    user's shuffle volume to k×batches rows; the final per-bucket pass
    re-ranks the partials. The SQL oracle is the classic row_number
    formulation."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "value"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["user_id", "value", "event_id"], ascending=[True, False, True], kind="mergesort")
            .groupby("user_id", as_index=False)
            .head(k)
        )

    partials = ds.map_batches(topk, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = topk(df)
        out = out.rename(columns={"value": "top_value"})
        out["top_value"] = round_away(out["top_value"].to_numpy(), 4)
        return out

    return bucketed_group_agg(partials, ["user_id"], final, n_buckets=32)


def q38_brand_price_rank(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Windowed ranking (dense_rank per partition, §2.6): the k cheapest-to-
    priciest DISTINCT price levels per brand. Per-batch partials keep only
    each brand's top-k distinct prices (a semilattice — merging partial
    top-k sets and re-ranking gives the global answer), so a mega-brand's
    shuffle volume is bounded by k × n_blocks price levels, never its row
    count; the per-bucket final re-ranks and re-joins the surviving rows.
    Oracle: dense_rank() OVER (PARTITION BY brand ORDER BY price DESC)."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_retailprice"])

    def rank_and_trim(df: pd.DataFrame) -> pd.DataFrame:
        r = (
            df.groupby("p_brand")["p_retailprice"]
            .rank(method="dense", ascending=False)
            .astype("int64")
        )
        return df.assign(price_rank=r)[r <= k]

    partials = ds.map_batches(
        lambda df: rank_and_trim(df)[["p_partkey", "p_brand", "p_retailprice"]],
        batch_format="pandas",
        batch_size=65536,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = rank_and_trim(df)
        return out[["p_brand", "p_partkey", "p_retailprice", "price_rank"]]

    return bucketed_group_agg(partials, ["p_brand"], final, n_buckets=16)


def q39_order_size_corr(sf_dir: str) -> pd.DataFrame:
    """Distributed Pearson correlation (one scalar over a joined fact pair):
    corr(o_totalprice, lineitems-per-order). Shape: per-batch lineitem
    partial counts → bucketed per-order counts → ONE bucketed shuffle join
    with orders on o_orderkey → per-batch sufficient statistics
    (n, Σx, Σy, Σxx, Σyy, Σxy) → a 6-number driver reduce. Nothing wide
    ever leaves the workers except the per-batch 6-tuples; the join is the
    engine's standard bucketed exchange. Matches SQL corr() to ~1e-10 at
    this value range (doubles; |x|≲1e6)."""
    import numpy as np

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])

    def pcount(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_orderkey", as_index=False).agg(p_n=("l_orderkey", "size"))

    def fcount(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", as_index=False).agg(n=("p_n", "sum"))
        g = g.rename(columns={"l_orderkey": "o_orderkey"})
        g["n"] = g["n"].astype("float64")
        return g

    per_order = bucketed_group_agg(
        li.map_batches(pcount, batch_format="pandas", batch_size=65536),
        ["l_orderkey"],
        fcount,
        n_buckets=32,
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    joined = bucketed_join(orders, per_order, on="o_orderkey", n_buckets=32)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        x = df["o_totalprice"].to_numpy(dtype=np.float64)
        y = df["n"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "cnt": [float(len(x))],
                "sx": [x.sum()],
                "sy": [y.sum()],
                "sxx": [(x * x).sum()],
                "syy": [(y * y).sum()],
                "sxy": [(x * y).sum()],
            }
        )

    parts = joined.map_batches(stats, batch_format="pandas").to_pandas()
    t = parts.sum()
    cov = t.cnt * t.sxy - t.sx * t.sy
    vx = t.cnt * t.sxx - t.sx * t.sx
    vy = t.cnt * t.syy - t.sy * t.sy
    corr = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else np.nan
    return pd.DataFrame({"corr_price_nitems": [round_away(corr, 6)]})


def q40_brand_median_price(sf_dir: str) -> "ray.data.Dataset":
    """Exact grouped median (a holistic aggregate — NOT decomposable into
    bounded partials, unlike sum/min-k): the group's values must co-locate,
    so this is the one aggregate shape that ships raw values through the
    bucket shuffle. The shuffle moves only the two needed columns, and each
    group's values are median'd vectorized inside its bucket. For groups
    too big for one task at cluster scale, the documented fallback is the
    approx t-digest/quantile sketch in pipelines/sketches.py — exact median
    per group is inherently a co-location aggregate. Interpolation (even
    counts) matches DuckDB's quantile_cont(0.5)."""
    ds = read_table(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_brand", as_index=False).agg(
            median_price=("p_retailprice", "median"),
            n_parts=("p_retailprice", "size"),
        )
        g["median_price"] = round_away(g["median_price"].to_numpy(), 4)
        g["n_parts"] = g["n_parts"].astype("int64")
        return g

    return bucketed_group_agg(ds, ["p_brand"], final, n_buckets=16)


def q41_user_modal_event(sf_dir: str) -> "ray.data.Dataset":
    """Grouped mode with deterministic tie-break (most frequent event_type
    per user; ties → lexicographically smallest type). Two-phase: per-batch
    (user, type) partial counts collapse the raw rows before the shuffle —
    the exchange carries at most users × |type vocabulary| partial rows per
    block; the per-bucket final sums partials and picks the argmax row
    vectorized (sort by n desc, type asc → first per user)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "event_type"], as_index=False).agg(
            p_n=("event_type", "size")
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(n_events=("p_n", "sum"))
        g = g.sort_values(
            ["user_id", "n_events", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = g.groupby("user_id", as_index=False).head(1)
        out = out.rename(columns={"event_type": "modal_event"})
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "modal_event", "n_events"]]

    return bucketed_group_agg(partials, ["user_id"], final, n_buckets=32)


def q42_weekly_active_users(sf_dir: str) -> "ray.data.Dataset":
    """Exact COUNT(DISTINCT) per group (ISO week → distinct active users).
    Two-phase distinct: per-batch (week, user) dedup shrinks the exchange
    to unique pairs per block; bucketing on the week co-locates each week's
    surviving pairs, and the final pass counts uniques vectorized. The
    approximate cousin (HLL, pipelines/sketches.py) avoids even this
    shuffle when ±2% suffices; this is the exact path."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        iso = df["ts"].dt.isocalendar()
        out = pd.DataFrame(
            {
                "iso_year": iso["year"].astype("int64"),
                "iso_week": iso["week"].astype("int64"),
                "user_id": df["user_id"],
            }
        )
        return out.drop_duplicates()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["iso_year", "iso_week"], as_index=False).agg(
            n_active_users=("user_id", "nunique")
        )
        g["n_active_users"] = g["n_active_users"].astype("int64")
        return g

    return bucketed_group_agg(partials, ["iso_year", "iso_week"], final, n_buckets=8)


def q43_bloom_semi_join(sf_dir: str, bloom_bits: int = 1 << 20) -> "ray.data.Dataset":
    """EXACT distributed semi-join with a Bloom prune (lineitem ⋉ urgent
    orders → per-returnflag revenue). The scale shape when the inner key
    set is too big to broadcast exactly:
      1. build-side: per-batch partial Bloom filters over qualifying
         o_orderkey (sketches.BloomFilter — fixed 128 KiB bitset each),
         OR-merged on the driver (n_blocks × 128 KiB, bounded) and
         broadcast once;
      2. probe-side: vectorized Bloom membership inside map_batches drops
         ~all non-matching lineitem rows at the scan (no false negatives);
      3. exactness: survivors (now small) go through ONE bucketed join
         against the real key set, discarding Bloom false positives.
    The oracle is the plain EXISTS subquery. ``bloom_bits`` sizes the
    filter; tests shrink it to force false positives and prove step 3
    keeps the result exact regardless of FP rate."""
    from .sketches import BloomFilter

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def qualifying(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["o_orderpriority"] == "1-URGENT"][["o_orderkey"]]

    keys_ds = orders.map_batches(qualifying, batch_format="pandas", batch_size=65536)

    def partial_bloom(df: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(n_bits=bloom_bits)
        bf.add(df["o_orderkey"])
        return pd.DataFrame({"bits": [bf.bits.tobytes()]})

    bloom = BloomFilter(n_bits=bloom_bits)
    for b in keys_ds.map_batches(partial_bloom, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        for raw in b["bits"]:
            bloom.bits |= np.frombuffer(raw, dtype=np.uint8)
    ref = ray.put(bloom)

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_extendedprice"]
    )

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        bf = get_broadcast(ref)
        return df[bf.contains(df["l_orderkey"])]

    survivors = li.map_batches(probe, batch_format="pandas", batch_size=65536)
    exact = bucketed_join(
        survivors,
        rename_cols(keys_ds, {"o_orderkey": "l_orderkey"}),
        on="l_orderkey",
        n_buckets=32,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_returnflag", as_index=False).agg(
            n_items=("l_extendedprice", "size"), revenue=("l_extendedprice", "sum")
        )
        g["n_items"] = g["n_items"].astype("int64")
        g["revenue"] = round_away(g["revenue"].to_numpy(), 4)
        return g

    return bucketed_group_agg(exact, ["l_returnflag"], final, n_buckets=4)


def q44_region_rollup_totals(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP (region, nation) over customers: detail rows +
    per-region subtotals + a grand total, NULL-marking grouped-out levels
    exactly like SQL ROLLUP. The fact-table pass is the ordinary
    distributed two-phase aggregate to the FINEST level (region × nation —
    bounded by the dimension catalog, ~dozens of rows); the coarser rollup
    levels are re-aggregations of that bounded result, done driver-side
    the same way SQL engines re-aggregate the lowest grouping set."""
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    region = read_small(sf_dir, "region", columns=["r_regionkey", "r_name"])
    rmap = dict(zip(region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist()))
    nmap = {
        k: (nm, rmap[rk])
        for k, nm, rk in zip(
            nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist(),
            nation.column("n_regionkey").to_pylist(),
        )
    }
    ref = ray.put(nmap)

    ds = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = get_broadcast(ref)
        pairs = df["c_nationkey"].map(m)
        df = pd.DataFrame(
            {
                "n_name": pairs.str[0],
                "r_name": pairs.str[1],
                "c_acctbal": df["c_acctbal"],
            }
        )
        return df.groupby(["r_name", "n_name"], as_index=False).agg(
            p_n=("c_acctbal", "size"), p_sum=("c_acctbal", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["r_name", "n_name"], as_index=False).agg(
            n_customers=("p_n", "sum"), sum_acctbal=("p_sum", "sum")
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    finest = bucketed_group_agg(partials, ["r_name", "n_name"], final, n_buckets=4).to_pandas()

    levels = [finest]
    sub = finest.groupby("r_name", as_index=False).agg(
        n_customers=("n_customers", "sum"), sum_acctbal=("sum_acctbal", "sum")
    )
    sub["n_name"] = None
    levels.append(sub)
    tot = pd.DataFrame(
        {
            "r_name": [None],
            "n_name": [None],
            "n_customers": [finest["n_customers"].sum()],
            "sum_acctbal": [finest["sum_acctbal"].sum()],
        }
    )
    levels.append(tot)
    out = pd.concat(levels, ignore_index=True)[["r_name", "n_name", "n_customers", "sum_acctbal"]]
    out["n_customers"] = out["n_customers"].astype("int64")
    out["sum_acctbal"] = round_away(out["sum_acctbal"].to_numpy(), 4)
    return out


def q45_json_props_stats(sf_dir: str) -> "ray.data.Dataset":
    """Semi-structured extraction (§2.8's JSON slot): pull the integer 'k'
    out of the props JSON string column, aggregate avg/max per event_type.
    The extraction is a VECTORIZED regex over the known single-key schema
    (pandas str.extract — one C pass per batch); a general nested-JSON
    stage would instead be an actor-pool map_batches with a compiled JSON
    parser, same dataflow. Oracle: DuckDB json_extract."""
    ds = read_table(sf_dir, "events", columns=["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False).astype("float64")
        d = pd.DataFrame({"event_type": df["event_type"], "k": k}).dropna()
        return d.groupby("event_type", as_index=False).agg(
            p_n=("k", "size"), p_sum=("k", "sum"), p_max=("k", "max")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False).agg(
            n=("p_n", "sum"), s=("p_sum", "sum"), max_k=("p_max", "max")
        )
        g["avg_k"] = round_away((g["s"] / g["n"]).to_numpy(), 4)
        g["max_k"] = g["max_k"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return g.rename(columns={"n": "n_events"})[["event_type", "n_events", "avg_k", "max_k"]]

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["event_type"], final, n_buckets=4)


def q46_brand_type_concat(sf_dir: str) -> "ray.data.Dataset":
    """Grouped ordered string aggregation (SQL string_agg(DISTINCT ..
    ORDER BY ..)): the sorted, comma-joined set of part types per brand.
    Per-batch dedup of (brand, type) pairs bounds the shuffle to distinct
    pairs per block — the exchange never carries more rows per brand than
    |type vocabulary| x n_blocks regardless of the brand's row count; the
    per-bucket final re-dedups, sorts, and joins."""
    ds = read_table(sf_dir, "part", columns=["p_brand", "p_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["p_brand", "p_type"])

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["p_brand", "p_type"]).sort_values(
            ["p_brand", "p_type"], kind="mergesort"
        )
        out = g.groupby("p_brand", as_index=False).agg(
            types=("p_type", ",".join), n_types=("p_type", "size")
        )
        out["n_types"] = out["n_types"].astype("int64")
        return out

    return bucketed_group_agg(partials, ["p_brand"], final, n_buckets=8)


def q47_users_both_events(
    sf_dir: str, type_a: str = "click", type_b: str = "purchase"
) -> "ray.data.Dataset":
    """Conjunctive membership (INTERSECT of two semi-joins): users that did
    BOTH event types. Per-batch boolean partials (any-a, any-b per user)
    collapse the fact rows before the shuffle; the per-bucket final ORs the
    partials — an idempotent semilattice, so duplicate partial rows from
    resharding can never change the answer."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.assign(
            p_a=df["event_type"].eq(type_a), p_b=df["event_type"].eq(type_b)
        )
        return d.groupby("user_id", as_index=False).agg(p_a=("p_a", "any"), p_b=("p_b", "any"))

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).agg(a=("p_a", "any"), b=("p_b", "any"))
        return g.loc[g["a"] & g["b"], ["user_id"]]

    return bucketed_group_agg(partials, ["user_id"], final, n_buckets=32)


def q48_brand_price_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Exact grouped multi-quantile (p25/p50/p75/p90 of price per brand) —
    the multi-point extension of q40's holistic-median shape: group values
    must co-locate, so raw (brand, price) pairs ride the bucket shuffle
    (two short columns), and each bucket computes all four interpolated
    quantiles in one vectorized pass. Interpolation is linear, matching
    DuckDB's quantile_cont. The sketch-based approximate path for groups
    too large for one task is pipelines/sketches.py (documented fallback,
    same as q40)."""
    ds = read_table(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        q = (
            df.groupby("p_brand")["p_retailprice"]
            .quantile([0.25, 0.5, 0.75, 0.9])
            .unstack()
        )
        q.columns = ["p25", "p50", "p75", "p90"]
        q = q.reset_index()
        for c in ("p25", "p50", "p75", "p90"):
            q[c] = round_away(q[c].to_numpy(), 4)
        return q

    return bucketed_group_agg(ds, ["p_brand"], final, n_buckets=16)


def q49_above_avg_orders(sf_dir: str) -> "ray.data.Dataset":
    """Correlated subquery, decorrelated (orders priced above their own
    customer's average): the classic rewrite is a window aggregate compared
    back to each row, which needs the customer's rows co-located — ONE
    bucket shuffle of the two needed columns, then a vectorized
    transform-mean + comparison per bucket. (The broadcast alternative —
    two-phase per-customer averages shipped back to a second fact scan —
    trades a second full pass of the fact table for not shuffling it; with
    only 16 bytes/row shuffled, the one-pass form wins.) The +1e-6 epsilon
    on the comparison is applied identically in the SQL oracle so float
    summation-order noise at the avg boundary can never flip a count."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        avg = df.groupby("o_custkey")["o_totalprice"].transform("mean")
        above = df["o_totalprice"] > avg + 1e-6
        out = df.assign(above=above).groupby("o_custkey", as_index=False).agg(
            n_above=("above", "sum"), n_orders=("above", "size")
        )
        out["n_above"] = out["n_above"].astype("int64")
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    return bucketed_group_agg(ds, ["o_custkey"], final, n_buckets=32)


def _custkey_region_join_batch(t: pa.Table, ref) -> pa.Table:
    keys, rnames = get_broadcast(ref)
    ck = t.column("o_custkey").to_numpy()
    idx = np.searchsorted(keys, ck)
    idx_c = np.clip(idx, 0, len(keys) - 1)
    hit = keys[idx_c] == ck
    t = t.filter(pa.array(hit))
    return t.append_column("r_name", pa.array(rnames[idx_c[hit]], pa.string()))


def q50_region_priority_grid(sf_dir: str) -> pd.DataFrame:
    """Cross-join grid with zero-fill (every region x every order priority,
    including pairs with no orders): the snowflake chain orders → customer
    → nation → region is ONE composed broadcast map (custkey → r_name,
    sorted-key searchsorted); counts come back through the standard
    two-phase aggregate, and the zero-fill is a driver-side reindex over
    the |regions| x |priorities| grid — a few dozen rows by construction,
    never data-sized."""
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = read_small(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = read_small(sf_dir, "region", columns=["r_regionkey", "r_name"])
    r_map = dict(zip(region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist()))
    n_map = {
        nk: r_map[rk]
        for nk, rk in zip(
            nation.column("n_nationkey").to_pylist(), nation.column("n_regionkey").to_pylist()
        )
    }
    order_ck = np.argsort(cust.column("c_custkey").to_numpy())
    keys = cust.column("c_custkey").to_numpy()[order_ck]
    rnames = np.asarray(
        [n_map[nk] for nk in cust.column("c_nationkey").to_pylist()], dtype=object
    )[order_ck]
    ref = ray.put((keys, rnames))

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    joined = ds.map_batches(
        _custkey_region_join_batch, fn_kwargs={"ref": ref}, batch_format="pyarrow"
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["r_name", "o_orderpriority"], as_index=False).agg(
            p_n=("o_orderpriority", "size")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["r_name", "o_orderpriority"], as_index=False).agg(n=("p_n", "sum"))

    partials = joined.map_batches(partial, batch_format="pandas", batch_size=65536)
    counts = bucketed_group_agg(partials, ["r_name", "o_orderpriority"], final, n_buckets=4).to_pandas()
    all_regions = sorted(r_map.values())
    all_prios = sorted(counts["o_orderpriority"].unique())
    grid = pd.MultiIndex.from_product(
        [all_regions, all_prios], names=["r_name", "o_orderpriority"]
    ).to_frame(index=False)
    out = grid.merge(counts, on=["r_name", "o_orderpriority"], how="left")
    out["n_orders"] = out["n"].fillna(0).astype("int64")
    return out[["r_name", "o_orderpriority", "n_orders"]].sort_values(
        ["r_name", "o_orderpriority"]
    ).reset_index(drop=True)


def q51_first_last_event(sf_dir: str) -> "ray.data.Dataset":
    """arg_min / arg_max by a composite ordering (each user's first and
    last event type by (ts, event_id)): per-batch partials keep ONE
    first-candidate and ONE last-candidate row per user — min/max under a
    total order is a semilattice, so partials merge associatively and a
    hot user ships 2 x n_blocks candidate rows through the shuffle, never
    its row count. The SQL oracle is the row_number()=1 window
    formulation."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = s.groupby("user_id", as_index=False)
        first = g.first().rename(
            columns={"ts": "p_fts", "event_id": "p_fid", "event_type": "p_ftype"}
        )
        last = g.last().rename(
            columns={"ts": "p_lts", "event_id": "p_lid", "event_type": "p_ltype"}
        )
        return first.merge(last, on="user_id")

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        f = (
            df.sort_values(["user_id", "p_fts", "p_fid"], kind="mergesort")
            .groupby("user_id", as_index=False)
            .first()[["user_id", "p_ftype"]]
        )
        l = (
            df.sort_values(
                ["user_id", "p_lts", "p_lid"], ascending=[True, False, False], kind="mergesort"
            )
            .groupby("user_id", as_index=False)
            .first()[["user_id", "p_ltype"]]
        )
        out = f.merge(l, on="user_id")
        return out.rename(columns={"p_ftype": "first_type", "p_ltype": "last_type"})

    return bucketed_group_agg(partials, ["user_id"], final, n_buckets=32)


def q55_value_histogram(sf_dir: str, n_bins: int = 10) -> "ray.data.Dataset":
    """Equal-width histogram over a global [min, max] range — the
    two-pass global-statistic-then-transform shape (normalization,
    binning, z-scoring all look like this at scale): pass 1 reduces
    per-batch min/max partials to two exact scalars on the driver (no
    shuffle — a 2-number reduce); pass 2 re-scans with the bounds closed
    over, assigns bins vectorized, and two-phase-aggregates per-bin
    count + value range. Bin arithmetic is the IDENTICAL float expression
    on both oracle sides (floor((v - lo) * n / (hi - lo)) capped into the
    top bin), so IEEE evaluation matches bit-for-bit; min/max are exact
    (order-free) statistics, immune to the summation-order caveats of
    mean-based bounds."""
    ds = read_table(sf_dir, "events", columns=["value"])

    def mm(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].dropna()
        if not len(v):
            return pd.DataFrame({"p_lo": [], "p_hi": []})
        return pd.DataFrame({"p_lo": [v.min()], "p_hi": [v.max()]})

    parts = ds.map_batches(mm, batch_format="pandas", batch_size=65536).to_pandas()
    lo, hi = float(parts["p_lo"].min()), float(parts["p_hi"].max())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].dropna().to_numpy(dtype=np.float64)
        b = np.minimum(np.floor((v - lo) * n_bins / (hi - lo)), n_bins - 1) + 1
        d = pd.DataFrame({"bin": b.astype("int64"), "value": v})
        return d.groupby("bin", as_index=False).agg(
            p_n=("value", "size"), p_lo=("value", "min"), p_hi=("value", "max")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bin", as_index=False).agg(
            n=("p_n", "sum"), lo_val=("p_lo", "min"), hi_val=("p_hi", "max")
        )
        g["lo_val"] = round_away(g["lo_val"].to_numpy(), 4)
        g["hi_val"] = round_away(g["hi_val"].to_numpy(), 4)
        return g.astype({"bin": "int64", "n": "int64"})

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["bin"], final, n_buckets=4)


def q56_customer_bigorder_stats(sf_dir: str, threshold: float = 300_000.0) -> "ray.data.Dataset":
    """Distributed LEFT OUTER join with null-fill (every customer, with
    count/sum of their orders ABOVE a price threshold — zero rows for
    customers that have none): the outer-join sibling of the engine's
    inner (bucketed_join), semi (q43) and anti (q22) shapes. The fact side
    collapses to per-customer partials BEFORE the exchange, then ONE
    bucketed shuffle co-locates each customer row with its (possibly
    absent) aggregate and a left pandas merge fills the misses — the
    customer table rides the shuffle as a full dataset on purpose (the
    outer side of an outer join cannot be broadcast-pruned: rows with NO
    match must still be emitted)."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["o_totalprice"] > threshold]
        return d.groupby("o_custkey", as_index=False).agg(
            p_n=("o_totalprice", "size"), p_sum=("o_totalprice", "sum")
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(n=("p_n", "sum"), s=("p_sum", "sum"))
        return g.rename(columns={"o_custkey": "c_custkey"})

    agg = bucketed_group_agg(
        orders.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["o_custkey"],
        combine,
        n_buckets=32,
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])

    def left_merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        out = ldf.merge(rdf, on="c_custkey", how="left")
        out["n_big_orders"] = out["n"].fillna(0).astype("int64")
        out["big_spend"] = round_away(out["s"].fillna(0.0).to_numpy(), 4)
        return out[["c_custkey", "n_big_orders", "big_spend"]]

    return bucketed_join(cust, agg, on="c_custkey", n_buckets=32, merge_fn=left_merge)


def q57_segment_lineitem_revenue(sf_dir: str) -> "ray.data.Dataset":
    """Shuffle-join CHAIN reusing one partitioning key per stage (the
    'pick ONE key and keep it' rule): lineitem revenue partials collapse
    per l_orderkey in the scan, join orders on the SAME orderkey bucketing
    in one exchange, then the (now order-sized) rows pivot to the customer
    key via the broadcast custkey→segment map (q03's machinery — the
    dimension side is broadcastable, so the second exchange is avoided
    entirely) and two-phase aggregate per segment."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"] * (1.0 - df["l_discount"])
        d = pd.DataFrame({"l_orderkey": df["l_orderkey"], "rev": rev})
        return d.groupby("l_orderkey", as_index=False).agg(
            p_rev=("rev", "sum"), p_n=("rev", "size")
        )

    def li_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", as_index=False).agg(rev=("p_rev", "sum"), n=("p_n", "sum"))
        return g.rename(columns={"l_orderkey": "o_orderkey"})

    per_order = bucketed_group_agg(
        li.map_batches(li_partial, batch_format="pandas", batch_size=65536),
        ["l_orderkey"],
        li_combine,
        n_buckets=32,
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = bucketed_join(orders, per_order, on="o_orderkey", n_buckets=32)

    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    order_ck = np.argsort(cust.column("c_custkey").to_numpy())
    keys = cust.column("c_custkey").to_numpy()[order_ck]
    segs = np.asarray(cust.column("c_mktsegment").to_pylist(), dtype=object)[order_ck]
    ref = ray.put((keys, segs))
    with_seg = joined.map_batches(
        _segment_join_batch, fn_kwargs={"ref": ref}, batch_format="pyarrow"
    )

    def seg_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("c_mktsegment", as_index=False).agg(
            p_rev=("rev", "sum"), p_n=("n", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_mktsegment", as_index=False).agg(
            revenue=("p_rev", "sum"), n_items=("p_n", "sum")
        )
        g["revenue"] = round_away(g["revenue"].to_numpy(), 4)
        g["n_items"] = g["n_items"].astype("int64")
        return g

    partials = with_seg.map_batches(seg_partial, batch_format="pandas")
    return bucketed_group_agg(partials, ["c_mktsegment"], final, n_buckets=4)


def q58_funnel_stages(sf_dir: str) -> "ray.data.Dataset":
    """Three-stage ordered funnel (signup → click → purchase) — the event-
    sequence operator a training-data pipeline uses for behavioral cohort
    selection. Per user: t1 = first signup, t2 = first click AFTER t1,
    t3 = first purchase AFTER t2. The conditional mins are not decomposable
    into per-batch partials (t2 depends on the user-global t1), so this is
    the sessionize shape: project + filter to the three stage types
    (shrinks the exchange ~40%), bucket on user_id, and run the sequence
    logic vectorized once per bucket. Skewed users cost one group, never a
    driver hotspot; at 10^12 turns the per-user event count — not the user
    count — bounds the group, same invariant q21_sessionize documents."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def keep_stages(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"), value_set=pa.array(["signup", "click", "purchase"]))
        return t.filter(m)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized stage cascade: three grouped mins, each conditioned on
        # the previous stage's per-user timestamp via a merge — no per-user
        # Python loop even inside the bucket
        sig = (
            df[df["event_type"] == "signup"]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "signup_ts"})
        )
        d1 = df.merge(sig, on="user_id")
        clk = (
            d1[(d1["event_type"] == "click") & (d1["ts"] > d1["signup_ts"])]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "click_ts"})
        )
        d2 = d1.merge(clk, on="user_id")
        pur = (
            d2[(d2["event_type"] == "purchase") & (d2["ts"] > d2["click_ts"])]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "purchase_ts"})
        )
        return sig.merge(clk, on="user_id", how="left").merge(pur, on="user_id", how="left")

    filtered = ds.map_batches(keep_stages, batch_format="pyarrow")
    return bucketed_group_agg(filtered, ["user_id"], per_user, n_buckets=16)


def q59_cohort_retention(sf_dir: str) -> "ray.data.Dataset":
    """Weekly cohort retention matrix: cohort = Monday-truncated week of a
    user's FIRST event; n_users = distinct users from that cohort active in
    cohort_week + week_offset. Two wide passes, both pre-shrunk map-side:
      1. per-user first-event ts — per-batch min partials → bucketed min
        (the aggregate is user-dimension-sized, read back driver-side and
        broadcast via ray.put; the 10^12-turn path swaps the broadcast for
        the existing bucketed_join on user_id when the user dimension
        outgrows worker heaps — same access pattern, one more shuffle);
      2. events → (cohort_week, week_offset, user_id) deduped per batch →
        bucketed distinct-count (the q42 exact-COUNT-DISTINCT shape)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def min_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(first_ts=("ts", "min"))

    def min_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(first_ts=("first_ts", "min"))

    firsts = bucketed_group_agg(
        ds.map_batches(min_partial, batch_format="pandas", batch_size=65536),
        ["user_id"],
        min_final,
        n_buckets=16,
    ).to_pandas()
    firsts = firsts.sort_values("user_id")  # searchsorted below needs sorted keys
    fw = firsts["first_ts"].dt.normalize() - pd.to_timedelta(
        firsts["first_ts"].dt.weekday, unit="D"
    )
    ref = ray.put((firsts["user_id"].to_numpy(), fw.to_numpy()))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        uids, cweeks = get_broadcast(ref)
        idx = np.searchsorted(uids, df["user_id"].to_numpy())
        cw = cweeks[idx]
        ew = (df["ts"].dt.normalize() - pd.to_timedelta(df["ts"].dt.weekday, unit="D")).to_numpy()
        off = ((ew - cw) / np.timedelta64(7, "D")).astype("int64")
        out = pd.DataFrame({"cohort_week": cw, "week_offset": off, "user_id": df["user_id"]})
        return out.drop_duplicates()

    pairs = ds.map_batches(expand, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cohort_week", "week_offset"], as_index=False).agg(
            n_users=("user_id", "nunique")
        )
        g["n_users"] = g["n_users"].astype("int64")
        return g

    return bucketed_group_agg(pairs, ["cohort_week", "week_offset"], final, n_buckets=8)


def q60_spend_deciles(sf_dir: str) -> "pd.DataFrame":
    """Global-rank bucketing: decile of each user by total purchase spend,
    decile = least(9, floor(10 · percent_rank)), percent_rank = (rank−1)/(n−1)
    with min-rank ties — deterministic, unlike ntile's row_number ties. The
    wide work (per-user sums) is the standard two-phase bucketed aggregate;
    the rank runs on the aggregate-sized result driver-side (users ≪ events).
    When even the user dimension is too big, the cluster path broadcasts
    approx_quantiles boundaries (pipelines/sketches.py) and buckets map-side
    — same output within sketch error, no global sort either way."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "purchase"]
        return df.groupby("user_id", as_index=False).agg(p_sum=("value", "sum"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).agg(total_spend=("p_sum", "sum"))
        g["total_spend"] = round_away(g["total_spend"].to_numpy(), 4)
        return g

    totals = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["user_id"],
        final,
        n_buckets=16,
    ).to_pandas()
    n = len(totals)
    rank = totals["total_spend"].rank(method="min").to_numpy()
    pr = (rank - 1.0) / max(n - 1, 1)
    totals["decile"] = np.minimum(9, np.floor(10.0 * pr)).astype("int64")
    return totals.sort_values("user_id").reset_index(drop=True)


def q61_weighted_sample(sf_dir: str, k: int = 100) -> "pd.DataFrame":
    """Deterministic weight-proportional priority sample: top-k orders by
    priority = o_totalprice / (1 + knuth32(o_orderkey)) — a content-hash
    priority (never RNG state, same invariance story as q29), so the sample
    is stable under resharding, resume and reruns, and heavier rows win
    proportionally more often. knuth32(x) = (x · 2654435761) mod 2^32 in
    exact integer arithmetic, bit-identical in numpy uint64 and DuckDB
    HUGEINT. Per-batch top-k partials → one tiny final merge (q05's shape:
    no global sort, shuffle carries ≤ k rows per block)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def topk(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey").to_numpy().astype(np.uint64)
        h = ((key % np.uint64(1 << 32)) * np.uint64(2654435761)) % np.uint64(1 << 32)
        pri = round_away(t.column("o_totalprice").to_numpy() / (1.0 + h.astype(np.float64)), 8)
        df = pd.DataFrame(
            {
                "o_orderkey": t.column("o_orderkey").to_numpy(),
                "o_totalprice": t.column("o_totalprice").to_numpy(),
                "priority": pri,
            }
        )
        df = df.sort_values(["priority", "o_orderkey"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    cand = ds.map_batches(topk, batch_format="pyarrow", batch_size=65536).to_pandas()
    return (
        cand.sort_values(["priority", "o_orderkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def q64_order_count_histogram(sf_dir: str) -> "ray.data.Dataset":
    """Counts-of-counts (degree distribution of the customer→order graph):
    two chained two-phase aggregations. Phase 1 collapses the corpus to one
    row per customer (per-batch partial counts → bucketed sum), phase 2
    collapses THAT to one row per order-count — each exchange moves only the
    already-shrunk previous level, never raw rows twice. The same shape
    serves token-frequency histograms and node-degree distributions at
    100 TB: the second shuffle's input is catalog-sized regardless of corpus
    size."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).size().rename(columns={"size": "p_n"})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def per_customer(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(n_orders=("p_n", "sum"))
        g["n_orders"] = g["n_orders"].astype("int64")
        return g

    cust = bucketed_group_agg(parts, ["o_custkey"], per_customer, n_buckets=8)

    def partial2(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_orders", as_index=False).size().rename(columns={"size": "p_c"})

    parts2 = cust.map_batches(partial2, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_orders", as_index=False).agg(n_customers=("p_c", "sum"))
        g["n_customers"] = g["n_customers"].astype("int64")
        return g

    return bucketed_group_agg(parts2, ["n_orders"], final, n_buckets=4)


def q65_weekly_change(sf_dir: str) -> "pd.DataFrame":
    """Week-over-week relative change of the event volume: distributed
    two-phase weekly counts (the only corpus-sized pass), then the lag/shift
    runs on the driver over the aggregate — a series with one row per week
    is driver-sized at any corpus scale, so the window function costs
    nothing distributed. Week bucketing is Monday-anchored to match
    DuckDB's date_trunc('week')."""
    ds = read_table(sf_dir, "events", columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        wk = df["ts"].dt.normalize() - pd.to_timedelta(df["ts"].dt.weekday, unit="D")
        return pd.DataFrame({"wk": wk}).groupby("wk", as_index=False).size().rename(columns={"size": "p_n"})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("wk", as_index=False).agg(n_events=("p_n", "sum"))
        g["n_events"] = g["n_events"].astype("int64")
        return g

    weekly = bucketed_group_agg(parts, ["wk"], final, n_buckets=4).to_pandas()
    weekly = weekly.sort_values("wk").reset_index(drop=True)
    prev = weekly["n_events"].shift(1)
    weekly["wow_change"] = round_away(
        ((weekly["n_events"] - prev) / prev).to_numpy(dtype=np.float64), 4
    )
    return weekly


def q70_event_zscore(sf_dir: str) -> "ray.data.Dataset":
    """Group-wise feature normalization (z-score per event_type — the
    standardize-by-group transform of a feature pipeline): two-phase
    sufficient statistics (n, sum, sumsq) per event type collapse to a
    handful of driver-side rows (the event-type set is closed), broadcast
    back, and ONE shuffle-free re-scan stamps
    z = (value − mean) / sample_std per event. Matches DuckDB's windowed
    ``stddev_samp`` to 4dp via the q07 merged-variance recipe
    (var = (sumsq − mean·sum)/(n−1)); a single-row or zero-variance group
    yields NULL on both sides."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False).agg(
            p_n=("value", "size"), p_sum=("value", "sum")
        )
        g2 = df.assign(v2=df["value"] ** 2).groupby("event_type", as_index=False).agg(
            p_sumsq=("v2", "sum")
        )
        return g.merge(g2, on="event_type")

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    stats = parts.groupby("event_type", as_index=False).agg(
        n=("p_n", "sum"), s=("p_sum", "sum"), ss=("p_sumsq", "sum")
    )
    mean = stats["s"].to_numpy() / stats["n"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (stats["ss"].to_numpy() - mean * stats["s"].to_numpy()) / (
            stats["n"].to_numpy() - 1
        )
    std = np.sqrt(np.maximum(var, 0.0))
    lut = {
        t: (m, s if (cnt > 1 and s > 0.0) else np.nan)
        for t, m, s, cnt in zip(stats["event_type"], mean, std, stats["n"])
    }
    ref = ray.put(lut)

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].map(lambda t: get_broadcast(ref)[t][0]).to_numpy(dtype=np.float64)
        s = df["event_type"].map(lambda t: get_broadcast(ref)[t][1]).to_numpy(dtype=np.float64)
        z = round_away((df["value"].to_numpy(dtype=np.float64) - m) / s, 4)
        return pd.DataFrame({"event_id": df["event_id"].astype("int64"), "zscore": z})

    return ds.map_batches(stamp, batch_format="pandas", batch_size=65536)


def q76_order_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE (priority, status) over orders: all four grouping sets
    — detail, each single-dimension margin, and the grand total — with
    '(all)' marking grouped-out levels. Same scale shape as ROLLUP (q44):
    ONE distributed two-phase pass to the finest level (priority × status —
    a dimension-bounded handful of rows), then the other three grouping
    sets re-aggregate that bounded result driver-side, exactly how SQL
    engines evaluate CUBE from the lowest grouping set."""
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["o_orderpriority", "o_orderstatus"], as_index=False).agg(
            p_n=("o_totalprice", "size"), p_sum=("o_totalprice", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["o_orderpriority", "o_orderstatus"], as_index=False).agg(
            n=("p_n", "sum"), s=("p_sum", "sum")
        )

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    fine = bucketed_group_agg(parts, ["o_orderpriority", "o_orderstatus"], final, n_buckets=4).to_pandas()

    out = []
    for keep in ((True, True), (True, False), (False, True), (False, False)):
        g = fine.copy()
        if not keep[0]:
            g["o_orderpriority"] = "(all)"
        if not keep[1]:
            g["o_orderstatus"] = "(all)"
        g = g.groupby(["o_orderpriority", "o_orderstatus"], as_index=False).agg(
            n=("n", "sum"), s=("s", "sum")
        )
        out.append(g)
    cube = pd.concat(out, ignore_index=True).rename(
        columns={"o_orderpriority": "priority", "o_orderstatus": "status"}
    )
    cube["n"] = cube["n"].astype("int64")
    cube["total"] = round_away(cube["s"].to_numpy(dtype=np.float64), 2)
    return cube[["priority", "status", "n", "total"]]


def q78_lineitem_melt(sf_dir: str) -> "ray.data.Dataset":
    """UNPIVOT/melt (the inverse of q32's PIVOT): wide measure columns →
    long (row key, measure, value) triples, the reshape every
    feature-extraction pipeline needs before a grouped-by-measure pass.
    Shuffle-free ×3 row expansion inside one map_batches (concatenated
    column slices, no per-row Python); the oracle is DuckDB UNPIVOT."""
    measures = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"] + measures)

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "l_orderkey": pa.concat_arrays(
                    [t.column("l_orderkey").combine_chunks()] * len(measures)
                ),
                "l_linenumber": pa.concat_arrays(
                    [t.column("l_linenumber").combine_chunks()] * len(measures)
                ),
                "measure": pa.array(np.repeat(measures, n), pa.string()),
                "value": pa.concat_arrays(
                    [pc.cast(t.column(m), pa.float64()).combine_chunks() for m in measures]
                ),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")


def q79_event_type_share(sf_dir: str) -> pd.DataFrame:
    """Percent-of-total report (SQL ratio_to_report / count over ()): per
    event type, its count and share of all events. Two-phase counts (q19's
    shape) plus ONE scalar total — the share division happens on the
    dimension-bounded driver frame, identical expression both oracle
    sides."""
    ds = read_table(sf_dir, "events", columns=["event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).size().rename(columns={"size": "p_n"})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    g = parts.groupby("event_type", as_index=False).agg(n=("p_n", "sum"))
    total = int(g["n"].sum())
    g["n"] = g["n"].astype("int64")
    g["share"] = round_away(g["n"].to_numpy(dtype=np.float64) / total, 4)
    return g


def _order_part_pairs(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Shared co-order pair stream for the market-basket family (q81/q82):
    distinct (order, part) per batch → ONE bucketed shuffle on the order key
    → per-order pair expansion (a < b) inside the bucket, collapsed to
    per-bucket partial pair counts before anything else moves. Fan-out is
    quadratic in ORDER SIZE only (TPC-H baskets are ≤ 7 lines; a retail-scale
    hot basket is capped the same way two_hop caps per-mid paths — cap k
    parts per order by deterministic min-hash selection before pairing)."""

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    parts = ds.map_batches(distinct_partial, batch_format="pandas", batch_size=65536)

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()  # exact distinct: an order never spans buckets
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        g = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False).size()
        return g.rename(columns={"l_partkey_x": "part_a", "l_partkey_y": "part_b", "size": "p_n"})

    return bucketed_group_agg(parts, ["l_orderkey"], pair_counts, n_buckets=n_buckets)


def q81_copurchase_pairs(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Frequent-itemset pair mining (market-basket co-occurrence): the
    top-k part pairs by the number of orders containing both. Second phase
    sums the per-order-bucket pair partials under ONE (a, b) bucket shuffle;
    each pair lives in exactly one bucket, so per-bucket pre-top-k bounds
    the driver collect to k × buckets rows (the q35 discipline)."""

    pairs = _order_part_pairs(sf_dir)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["part_a", "part_b"], as_index=False).agg(n_orders=("p_n", "sum"))
        g = g.sort_values(
            ["n_orders", "part_a", "part_b"], ascending=[False, True, True], kind="mergesort"
        ).head(k)
        return g

    cand = bucketed_group_agg(pairs, ["part_a", "part_b"], final, n_buckets=16).to_pandas()
    out = (
        cand.sort_values(["n_orders", "part_a", "part_b"], ascending=[False, True, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    return out.astype({"part_a": "int64", "part_b": "int64", "n_orders": "int64"})


def q82_triangle_count(sf_dir: str) -> pd.DataFrame:
    """Distributed triangle counting over the part co-order graph (edge =
    two parts share an order). The canonical two-join shape: wedges from
    edges e1(x,y) ⋈ e2(y,z) on the CENTER vertex, closed against a third
    edge on the OUTER pair — both as the engine's bucketed exchanges, so no
    task ever sees the whole graph.

    Orientation: every edge is directed low→high vertex id, so each
    triangle {a<b<c} is generated exactly once as the wedge (a,b,c) centered
    at b and closed by (a,c). Skew note (documented per the custom-operator
    rule): a hot vertex of degree d makes d²/2 wedges; the cluster-scale
    mitigation is degree orientation (direct edges toward the HIGHER-degree
    endpoint by (deg, id) total order, bounding wedge work at the sum of
    min-degree² — degrees come from one two-phase count and ride a
    broadcast or a join, same math, same single-count guarantee)."""

    pair_partials = _order_part_pairs(sf_dir)

    def edge_final(df: pd.DataFrame) -> pd.DataFrame:
        # distinct edges; counts are irrelevant for the triangle closure
        return df[["part_a", "part_b"]].drop_duplicates()

    edges = bucketed_group_agg(pair_partials, ["part_a", "part_b"], edge_final, n_buckets=16)

    # wedge join on the center vertex: e1.part_b == e2.part_a (x<y<z holds
    # transitively, so every wedge is canonical)
    e1 = rename_cols(edges, {"part_a": "x", "part_b": "ctr"})
    e2 = rename_cols(edges, {"part_a": "ctr", "part_b": "z"})
    wedges = bucketed_join(e1, e2, on="ctr", n_buckets=32)

    # closure: semi-join wedge (x, z) against the edge set on a composite
    # key — merge_fn makes it a counting semi-join, so only per-bucket
    # COUNTS leave the exchange
    def key(df: pd.DataFrame, a: str, b: str) -> pd.Series:
        return df[a].astype("int64") * np.int64(1 << 32) + df[b].astype("int64")

    def wkey(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        k = _pc.add(
            _pc.multiply(_pc.cast(t.column("x"), pa.int64()), pa.scalar(1 << 32, pa.int64())),
            _pc.cast(t.column("z"), pa.int64()),
        )
        return pa.table({"xz": k, "w": pa.array(np.ones(t.num_rows, dtype=np.int8))})

    def ekey(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        k = _pc.add(
            _pc.multiply(_pc.cast(t.column("part_a"), pa.int64()), pa.scalar(1 << 32, pa.int64())),
            _pc.cast(t.column("part_b"), pa.int64()),
        )
        return pa.table({"xz": k, "e": pa.array(np.ones(t.num_rows, dtype=np.int8))})

    w = wedges.map_batches(wkey, batch_format="pyarrow")
    e = edges.map_batches(ekey, batch_format="pyarrow")

    def count_closed(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        closed = ldf["xz"].isin(set(rdf["xz"].to_numpy())).sum()
        return pd.DataFrame({"p_n": [int(closed)]})

    counts = bucketed_join(w, e, on="xz", n_buckets=32, merge_fn=count_closed).to_pandas()
    return pd.DataFrame({"n_triangles": pd.array([int(counts["p_n"].sum())], dtype="int64")})


def q83_brand_mad_outliers(sf_dir: str) -> "ray.data.Dataset":
    """Robust outlier detection per group (the winsorize/clip hygiene pass
    of a numeric-feature pipeline): per brand, the price median, the median
    absolute deviation, and the count of prices outside median ± 3·1.4826·MAD
    (the normal-consistent MAD z-score). MAD is doubly holistic (a median OF
    deviations from a median), so the group's raw values co-locate — the
    q40/q48 co-location shape, ONE bucket shuffle on the brand, both medians
    and the outlier count computed vectorized inside the group. Groups too
    big for one task fall back to the sketch quantiles (pipelines/sketches),
    as q40 documents. Prices sit on a 0.01 grid and the threshold is an
    irrational multiple of the (0.005-grid) MAD, so the strict `>` boundary
    cannot land on a data point (comparison is the identical IEEE expression
    both sides)."""

    ds = read_table(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for brand, g in df.groupby("p_brand", sort=False):
            x = g["p_retailprice"].to_numpy(dtype=np.float64)
            med = float(np.median(x))
            ad = np.abs(x - med)
            mad = float(np.median(ad))
            n_out = int((ad > (3.0 * 1.4826) * mad).sum())
            outs.append((brand, len(x), med, mad, n_out))
        out = pd.DataFrame(
            outs, columns=["p_brand", "n_parts", "median_price", "mad", "n_outliers"]
        )
        out["median_price"] = round_away(out["median_price"].to_numpy(), 4)
        out["mad"] = round_away(out["mad"].to_numpy(), 4)
        return out.astype({"n_parts": "int64", "n_outliers": "int64"})

    return bucketed_group_agg(ds, ["p_brand"], final, n_buckets=16)


def q84_brand_price_regression(sf_dir: str) -> "ray.data.Dataset":
    """Grouped OLS (regr_slope/regr_intercept): per brand, the least-squares
    line of retail price over part size. Fully decomposable — per-batch
    grouped sufficient statistics (n, Σx, Σy, Σxx, Σxy) are the ONLY thing
    the exchange carries (the q39 six-number shape, made per-group); the
    slope/intercept algebra runs on the dimension-bounded final rows. The
    oracle SQL spells out the same explicit sufficient-statistic expressions
    instead of regr_slope(), so both sides share one expression tree and the
    4dp round absorbs partial-sum ordering."""

    ds = read_table(sf_dir, "part", columns=["p_brand", "p_size", "p_retailprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "p_brand": df["p_brand"],
                "n": 1.0,
                "sx": df["p_size"].astype("float64"),
                "sy": df["p_retailprice"].astype("float64"),
            }
        )
        d["sxx"] = d["sx"] * d["sx"]
        d["sxy"] = d["sx"] * d["sy"]
        return d.groupby("p_brand", as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_brand", as_index=False).sum()
        slope = (g["n"] * g["sxy"] - g["sx"] * g["sy"]) / (g["n"] * g["sxx"] - g["sx"] * g["sx"])
        intercept = (g["sy"] - slope * g["sx"]) / g["n"]
        return pd.DataFrame(
            {
                "p_brand": g["p_brand"],
                "n_parts": g["n"].astype("int64"),
                "slope": round_away(slope.to_numpy(), 4),
                "intercept": round_away(intercept.to_numpy(), 4),
            }
        )

    return bucketed_group_agg(partials, ["p_brand"], final, n_buckets=16)


def q88_table_profile(sf_dir: str) -> "ray.data.Dataset":
    """One-pass data-profiling operator (the validation step every ingest
    pipeline runs before training): per numeric column, row count, null
    count, min, max, mean — emitted LONG (col_name, …) so adding columns
    never changes the schema. Fully decomposable: each batch collapses to
    ONE partial row per column (count/nulls/sum/min/max are all mergeable),
    so the exchange carries O(blocks × columns) rows regardless of data
    size; profiling 100 TB costs one streaming read plus a constant-size
    reduce. The same shape extends to any mergeable per-column statistic
    (variance via sum-of-squares, sketches for distinct/quantiles — see
    sketches.py)."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = read_table(sf_dir, "lineitem", columns=cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            v = df[c]
            rows.append(
                {
                    "col_name": c,
                    "p_n": len(v),
                    "p_nulls": int(v.isna().sum()),
                    "p_sum": float(v.sum()),
                    "p_min": float(v.min()),
                    "p_max": float(v.max()),
                }
            )
        return pd.DataFrame(rows)

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("col_name", as_index=False).agg(
            n_rows=("p_n", "sum"),
            n_nulls=("p_nulls", "sum"),
            s=("p_sum", "sum"),
            min_val=("p_min", "min"),
            max_val=("p_max", "max"),
        )
        nonnull = g["n_rows"] - g["n_nulls"]
        g["mean_val"] = round_away(g["s"] / nonnull.replace(0, np.nan), 4)
        g["min_val"] = round_away(g["min_val"].to_numpy(), 4)
        g["max_val"] = round_away(g["max_val"].to_numpy(), 4)
        g["n_rows"] = g["n_rows"].astype("int64")
        g["n_nulls"] = g["n_nulls"].astype("int64")
        return g[["col_name", "n_rows", "n_nulls", "min_val", "max_val", "mean_val"]]

    return bucketed_group_agg(partials, ["col_name"], final, n_buckets=4)


def q89_daily_gapfill(sf_dir: str, threshold: float = 300.0) -> pd.DataFrame:
    """Dense-calendar gap fill (time-series prep: a model reading daily
    rates needs explicit zeros, not missing rows): daily counts of
    high-value events with every day of the table's full span present.
    Two bounded aggregations share one column read: per-batch (day, n)
    partials for the filtered counts (bucketed reduce) and a global
    min/max-day partial (tiny driver reduce). The calendar itself is
    driver-side by design — its size is the DATE SPAN, not the data
    (100 TB of events over 5 years is still ~1,800 rows), joined to the
    aggregated counts which are already calendar-sized."""
    ds = read_table(sf_dir, "events", columns=["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.normalize()
        hot = df.loc[df["value"] >= threshold]
        out = (
            hot["ts"].dt.normalize().value_counts().rename_axis("day").reset_index(name="p_n")
        )
        # one sentinel row carries the block's full-span min/max day so the
        # calendar bounds ride the same partial exchange (p_n = 0 rows are
        # dropped after the reduce, never miscounted)
        bounds = pd.DataFrame({"day": [day.min(), day.max()], "p_n": [0, 0]})
        return pd.concat([out, bounds], ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("day", as_index=False)["p_n"].sum()

    counts = bucketed_group_agg(partials, ["day"], final, n_buckets=8).to_pandas()
    lo, hi = counts["day"].min(), counts["day"].max()
    cal = pd.DataFrame({"day": pd.date_range(lo, hi, freq="D")})
    out = cal.merge(counts.loc[counts["p_n"] > 0], on="day", how="left").fillna({"p_n": 0})
    return pd.DataFrame(
        {
            "day": out["day"].dt.strftime("%Y-%m-%d"),
            "n_events": out["p_n"].astype("int64"),
        }
    ).sort_values("day").reset_index(drop=True)


def q92_snapshot_diff(sf_dir: str) -> "ray.data.Dataset":
    """Snapshot diff / CDC classification: compare two snapshots of the
    orders table (derived deterministically here — old drops keys %97==0,
    new drops keys %89==0 and bumps prices 10% on keys %7==0) and emit
    every added / removed / changed key. The engine shape is the general
    one: tag each snapshot side, union, ONE bucketed shuffle on the key,
    and an in-bucket vectorized outer merge + classification — neither
    snapshot is ever broadcast or driver-materialized, so the same code
    diffs two 50 TB snapshots with the shuffle as the only exchange."""

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def tag_sides(df: pd.DataFrame) -> pd.DataFrame:
        key = df["o_orderkey"].to_numpy()
        price = df["o_totalprice"].to_numpy(dtype=np.float64)
        old = pd.DataFrame({"o_orderkey": key[key % 97 != 0], "side": 0,
                            "price": price[key % 97 != 0]})
        new_mask = key % 89 != 0
        new_price = price.copy()
        bump = key % 7 == 0
        new_price[bump] = round_away(new_price[bump] * 1.1, 4)
        new = pd.DataFrame({"o_orderkey": key[new_mask], "side": 1,
                            "price": new_price[new_mask]})
        return pd.concat([old, new], ignore_index=True)

    both = ds.map_batches(tag_sides, batch_format="pandas", batch_size=65536)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        a = df.loc[df["side"] == 0, ["o_orderkey", "price"]].rename(columns={"price": "old"})
        b = df.loc[df["side"] == 1, ["o_orderkey", "price"]].rename(columns={"price": "new"})
        m = a.merge(b, on="o_orderkey", how="outer")
        added = m["old"].isna()
        removed = m["new"].isna()
        changed = ~added & ~removed & (m["old"] != m["new"])
        m = m.loc[added | removed | changed]
        ct = np.where(m["old"].isna(), "added", np.where(m["new"].isna(), "removed", "changed"))
        return pd.DataFrame(
            {
                "o_orderkey": m["o_orderkey"].astype("int64"),
                "change_type": ct,
                "old_price": round_away(m["old"].fillna(-1.0).to_numpy(), 4),
                "new_price": round_away(m["new"].fillna(-1.0).to_numpy(), 4),
            }
        )

    return bucketed_group_agg(both, ["o_orderkey"], final, n_buckets=64)


def q93_referential_integrity(sf_dir: str) -> "ray.data.Dataset":
    """Referential-integrity audit (the data-quality gate a warehouse load
    runs before publishing): count fact rows whose foreign key is missing
    from its dimension, per relation, plus how many DISTINCT keys are
    orphaned. Dimensions are deterministically damaged here (part %13,
    supplier %11, customer %17 dropped) so the audit has real findings.
    Scale shape: each dimension's key set is broadcast ONCE (sorted int64
    array via ray.put); facts stream through stateless map_batches tasks
    emitting one counts row plus the batch's distinct orphan keys — the
    partial exchanged per batch is bounded by the DIMENSION cardinality,
    never the fact row count, and the final reduce groups 3 relations."""

    dims = {
        "lineitem.l_partkey->part": ("part", "p_partkey", 13),
        "lineitem.l_suppkey->supplier": ("supplier", "s_suppkey", 11),
        "orders.o_custkey->customer": ("customer", "c_custkey", 17),
    }
    refs = {}
    for rel, (dim_tbl, dim_key, drop_mod) in dims.items():
        keys = read_small(sf_dir, dim_tbl, columns=[dim_key]).column(dim_key).to_numpy()
        keys = np.sort(keys[keys % drop_mod != 0]).astype("int64")
        refs[rel] = ray.put(keys)

    def audit(df: pd.DataFrame, fk_map: dict) -> pd.DataFrame:
        outs = []
        for rel, (col, ref) in fk_map.items():
            dim_keys = get_broadcast(ref)
            fk = df[col].to_numpy()
            idx = np.searchsorted(dim_keys, fk)
            idx_c = np.clip(idx, 0, len(dim_keys) - 1)
            orphan = dim_keys[idx_c] != fk
            rows = [{"relation": rel, "key": -1, "p_rows": len(fk), "p_orph": int(orphan.sum())}]
            for k in np.unique(fk[orphan]):
                rows.append({"relation": rel, "key": int(k), "p_rows": 0, "p_orph": 0})
            outs.append(pd.DataFrame(rows))
        return pd.concat(outs, ignore_index=True)

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]).map_batches(
        audit,
        fn_kwargs={"fk_map": {
            "lineitem.l_partkey->part": ("l_partkey", refs["lineitem.l_partkey->part"]),
            "lineitem.l_suppkey->supplier": ("l_suppkey", refs["lineitem.l_suppkey->supplier"]),
        }},
        batch_format="pandas", batch_size=65536,
    )
    od = read_table(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        audit,
        fn_kwargs={"fk_map": {
            "orders.o_custkey->customer": ("o_custkey", refs["orders.o_custkey->customer"]),
        }},
        batch_format="pandas", batch_size=65536,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("relation")
        out = pd.DataFrame(
            {
                "fact_rows": g["p_rows"].sum(),
                "orphan_rows": g["p_orph"].sum(),
                "orphan_keys": g["key"].agg(lambda s: int(s[s >= 0].nunique())),
            }
        ).reset_index()
        for c in ("fact_rows", "orphan_rows", "orphan_keys"):
            out[c] = out[c].astype("int64")
        return out

    return bucketed_group_agg(li.union(od), ["relation"], final, n_buckets=4)


def _pair_skyline(pairs: pd.DataFrame) -> pd.DataFrame:
    """Surviving (price, size) pairs of the min-price/max-size skyline:
    per distinct price keep the max size (same price, smaller size is
    strictly dominated), then a price-ascending scan keeps only pairs whose
    size strictly exceeds every cheaper pair's (vectorized cummax-shift)."""
    best = pairs.groupby("p_retailprice", as_index=False)["p_size"].max()
    best = best.sort_values("p_retailprice", kind="mergesort")
    sz = best["p_size"].to_numpy()
    run = np.maximum.accumulate(sz)
    prev = np.concatenate([[np.iinfo("int64").min], run[:-1]])
    return best.loc[sz > prev]


def q94_skyline(sf_dir: str) -> pd.DataFrame:
    """Distributed skyline (pareto frontier): parts not dominated on
    (minimize p_retailprice, maximize p_size); exact-duplicate (price,
    size) rows all survive, matching the SQL NOT-EXISTS strict-dominance
    oracle. Scale shape: the classic local-then-global skyline — each
    batch reduces to the rows matching its LOCAL pair-skyline (global
    skyline ⊆ union of local skylines, since in-batch dominance is global
    dominance), so the driver-side final pass sees at most
    (#distinct sizes) pairs per batch, bounded by the SIZE DOMAIN, not the
    table."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_retailprice", "p_size"])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["p_size"] = df["p_size"].astype("int64")
        keep = _pair_skyline(df[["p_retailprice", "p_size"]])
        return df.merge(keep, on=["p_retailprice", "p_size"])

    cand = ds.map_batches(local, batch_format="pandas", batch_size=65536).to_pandas()
    keep = _pair_skyline(cand[["p_retailprice", "p_size"]])
    out = cand.merge(keep, on=["p_retailprice", "p_size"])
    return pd.DataFrame(
        {
            "p_partkey": out["p_partkey"].astype("int64"),
            "p_retailprice": round_away(out["p_retailprice"].to_numpy(), 4),
            "p_size": out["p_size"],
        }
    ).sort_values("p_partkey").reset_index(drop=True)


def q95_percent_rank(sf_dir: str, n_ranges: int = 64) -> "ray.data.Dataset":
    """Per-row percent_rank within HOT partitions — every o_orderpriority
    group is ~20% of the orders table, so the usual group-bucket shuffle
    (one group per task) cannot work: five tasks would each hold a fifth of
    100 TB. This is the distributed-ECDF / prefix-sum shape instead:

      1. range-partition the ORDER BY column into R value buckets
         (boundaries here from a min/max scan + linspace; the production
         path feeds approx_quantiles boundaries from pipelines/sketches.py
         so buckets stay balanced under skew — R scales with the cluster),
      2. ONE tiny counting pass → per-(group, range) counts on the driver
         (G x R rows, independent of the table), prefix-summed into the
         offset of each range within its group,
      3. ONE range shuffle; in-bucket, strictly-less counts are local
         (sorted searchsorted-left per (group, range)) and the broadcast
         offset lifts them to global ranks: pct = (offset + local_lt)/(n-1).

    Ties get min-rank (SQL percent_rank) because equal values always land
    in the same range bucket. Exact, two scans + one shuffle, nothing
    group-sized ever co-located."""
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    ds = read_table(sf_dir, "orders", columns=cols)

    mm = ds.map_batches(
        lambda df: pd.DataFrame(
            {"mn": [df["o_totalprice"].min()], "mx": [df["o_totalprice"].max()]}
        ),
        batch_format="pandas",
        batch_size=65536,
    ).to_pandas()
    mn, mx = float(mm["mn"].min()), float(mm["mx"].max())
    bounds = np.linspace(mn, mx, n_ranges + 1)[1:-1]

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        rb = np.searchsorted(bounds, df["o_totalprice"].to_numpy(), side="right")
        g = (
            pd.DataFrame({"prio": df["o_orderpriority"], "_rb": rb})
            .groupby(["prio", "_rb"], as_index=False)
            .size()
        )
        return g

    counts = (
        ds.map_batches(cnt_partial, batch_format="pandas", batch_size=65536)
        .to_pandas()  # <= n_batches x G x R partial rows — aggregate-sized
        .groupby(["prio", "_rb"], as_index=False)["size"]
        .sum()
        .sort_values(["prio", "_rb"], kind="mergesort")
    )
    counts["offset"] = counts.groupby("prio")["size"].cumsum() - counts["size"]
    n_per_prio = counts.groupby("prio")["size"].sum().to_dict()
    offsets = {
        (p, r): int(o) for p, r, o in zip(counts["prio"], counts["_rb"], counts["offset"])
    }

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rb"] = np.searchsorted(bounds, df["o_totalprice"].to_numpy(), side="right").astype("int64")
        return df

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderpriority", "_rb", "o_totalprice"], kind="mergesort")
        pos = df.groupby(["o_orderpriority", "_rb"], sort=False).cumcount().to_numpy()
        price = df["o_totalprice"].to_numpy()
        prio = df["o_orderpriority"].to_numpy()
        rb = df["_rb"].to_numpy()
        first = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            first[1:] = (prio[1:] != prio[:-1]) | (rb[1:] != rb[:-1]) | (price[1:] != price[:-1])
        # min-rank ties: strictly-less count = position of the value's FIRST
        # occurrence in its (group, range) run
        local_lt = pd.Series(np.where(first, pos, -1)).replace(-1, np.nan).ffill().to_numpy()
        off = np.fromiter((offsets.get((p, r), 0) for p, r in zip(prio, rb)), dtype=np.float64, count=len(df))
        n = np.fromiter((n_per_prio[p] for p in prio), dtype=np.float64, count=len(df))
        pct = (off + local_lt) / np.maximum(n - 1.0, 1.0)
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "o_orderpriority": df["o_orderpriority"],
                "pct_rank": round_away(pct, 8),
            }
        )

    stamped = ds.map_batches(stamp, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(stamped, ["_rb"], final, n_buckets=64)


def q96_event_entropy(sf_dir: str) -> "ray.data.Dataset":
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity feature (and, over token/domain distributions, the
    data-mixing diagnostic) computed as a grouped aggregate. Per-batch
    (user, type) count partials ride ONE user-bucket shuffle; in-bucket the
    entropy uses the catastrophe-free form H = ln(N) - (sum n*ln n)/N so
    both engine and oracle evaluate the identical expression (no p=n/N
    intermediate whose rounding could differ)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False).size()
        return g.rename(columns={"size": "p_n"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["user_id", "event_type"], as_index=False)["p_n"].sum()
        n = c["p_n"].to_numpy(dtype=np.float64)
        c["_t"] = n * np.log(n)
        agg = c.groupby("user_id", as_index=False).agg(tot=("p_n", "sum"), snln=("_t", "sum"))
        tot = agg["tot"].to_numpy(dtype=np.float64)
        ent = np.log(tot) - agg["snln"].to_numpy() / tot
        return pd.DataFrame(
            {
                "user_id": agg["user_id"],
                "n_events": agg["tot"].astype("int64"),
                "entropy": round_away(ent, 4),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["user_id"], final, n_buckets=32)


def q100_equidepth_bins(sf_dir: str, n_bins: int = 8, n_micro: int = 4096) -> pd.DataFrame:
    """Equal-DEPTH histogram (equi-height: every bin holds ~n/n_bins rows)
    over lineitem prices — the quantile-boundary complement to q55's
    equal-width bins, and the distributed form of NTILE-style bucketing
    where the boundaries themselves are exact order statistics.

    Boundary b_i is the value at sorted position ceil(i*n/n_bins) (exact
    integer arithmetic, (i*n + n_bins-1) // n_bins on both oracle sides —
    no float rank). Finding a kth order statistic at scale without a global
    sort is a counting argument, not a shuffle:
      pass A: exact global [min, max] — a 2-scalar driver reduce (q55);
      pass B: counts per n_micro equal-width micro-bins — two-phase, the
              exchange carries <= n_micro partial rows per block batch and
              the driver sees <= n_micro totals regardless of data size;
      pass C: cumulative micro-counts locate each target rank's micro-bin;
              ONE filtered re-scan collects only values inside those (few)
              micro-bins — expected n/n_micro rows each — and the exact
              order statistic is an offset into their (driver-side,
              micro-bin-sized) sort. A pathological micro-bin (mass point)
              is re-split recursively at cluster scale (documented, not
              needed on smooth prices: the recursion is passes over a
              shrinking range, never a sort);
      pass D: final per-bin counts with the boundaries closed over —
              bin(v) = #(boundaries strictly below v), the IDENTICAL
              comparison set on both oracle sides (boundaries are exact
              data values, so float equality is bit-for-bit).
    Empty bins (duplicate boundaries under heavy ties) are omitted by both
    sides. Output is n_bins-bounded: a driver frame by design."""
    col = "l_extendedprice"
    ds = read_table(sf_dir, "lineitem", columns=[col])

    def mm(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna()
        if not len(v):
            return pd.DataFrame({"p_lo": [], "p_hi": [], "p_n": []})
        return pd.DataFrame({"p_lo": [v.min()], "p_hi": [v.max()], "p_n": [len(v)]})

    parts = ds.map_batches(mm, batch_format="pandas", batch_size=65536).to_pandas()
    lo, hi = float(parts["p_lo"].min()), float(parts["p_hi"].max())
    n = int(parts["p_n"].sum())
    width = (hi - lo) / n_micro or 1.0

    def micro_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna().to_numpy(dtype=np.float64)
        m = np.minimum(np.floor((v - lo) / width), n_micro - 1).astype(np.int64)
        cnt = np.bincount(m, minlength=n_micro)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"micro": nz, "p_n": cnt[nz]})

    def micro_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("micro", as_index=False)["p_n"].sum()

    micro = (
        bucketed_group_agg(
            ds.map_batches(micro_partial, batch_format="pandas", batch_size=65536),
            ["micro"],
            micro_final,
            n_buckets=4,
        )
        .to_pandas()
        .sort_values("micro")
    )
    counts = np.zeros(n_micro, dtype=np.int64)
    counts[micro["micro"].to_numpy()] = micro["p_n"].to_numpy()
    cum = np.concatenate([[0], np.cumsum(counts)])

    ranks = [(i * n + n_bins - 1) // n_bins for i in range(1, n_bins)]
    need: dict[int, list[int]] = {}
    for r in ranks:
        mb = int(np.searchsorted(cum, r, side="left")) - 1  # cum[mb] < r <= cum[mb+1]
        need.setdefault(mb, []).append(r)
    mbs = sorted(need)

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna().to_numpy(dtype=np.float64)
        m = np.minimum(np.floor((v - lo) / width), n_micro - 1).astype(np.int64)
        keep = np.isin(m, mbs)
        return pd.DataFrame({col: v[keep], "micro": m[keep]})

    pool = ds.map_batches(collect, batch_format="pandas", batch_size=65536).to_pandas()
    boundaries = []
    for mb in mbs:
        vals = np.sort(pool.loc[pool["micro"] == mb, col].to_numpy())
        for r in need[mb]:
            boundaries.append(vals[r - cum[mb] - 1])  # rank is 1-indexed
    b = np.sort(np.asarray(boundaries, dtype=np.float64))

    def bin_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna().to_numpy(dtype=np.float64)
        binid = np.searchsorted(b, v, side="left")  # == #(b_i < v), strict
        cnt = np.bincount(binid, minlength=n_bins)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"bin_id": nz, "p_n": cnt[nz]})

    out = (
        ds.map_batches(bin_partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("bin_id", as_index=False)["p_n"]
        .sum()
        .rename(columns={"p_n": "n_rows"})
    )
    return out.astype({"bin_id": "int64", "n_rows": "int64"}).sort_values("bin_id").reset_index(drop=True)


def q102_benford_audit(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit audit of order totals — the fraud/data-quality
    screen over any money column: observed share of each leading digit next
    to Benford's expected log10(1 + 1/d). One two-phase count over a
    9-row key space (digit partials collapse per batch; the driver frame is
    digit-bounded). The digit comes from the DECIMAL STRING of
    floor(value) — identical extraction on both oracle sides, no float
    log10 edge cases."""
    from .common import round_away

    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["o_totalprice"].dropna()
        v = v[v >= 1.0]
        d = np.floor(v.to_numpy(dtype=np.float64)).astype(np.int64).astype(str)
        first = pd.Series([s[0] for s in d], dtype=object).astype(int)
        g = first.value_counts().rename_axis("digit").reset_index(name="p_n")
        return g

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    g = parts.groupby("digit", as_index=False)["p_n"].sum().rename(columns={"p_n": "n"})
    total = float(g["n"].sum())
    g["observed"] = round_away(g["n"].to_numpy(dtype=np.float64) / total, 4)
    g["expected"] = round_away(np.log10(1.0 + 1.0 / g["digit"].to_numpy(dtype=np.float64)), 4)
    return (
        g.astype({"digit": "int64", "n": "int64"})
        .sort_values("digit")
        .reset_index(drop=True)[["digit", "n", "observed", "expected"]]
    )


def q105_audience_overlap(sf_dir: str) -> "ray.data.Dataset":
    """Audience-overlap matrix: for every ordered pair of event types, how
    many users did BOTH — q47's two-type intersection generalized to the
    full |types|² co-occurrence matrix (the segment-overlap report behind
    campaign planning). Shape: DISTINCT (user, type) pairs via one
    two-phase pass; inside the same user bucket each user's type set
    (≤ |types|) expands to its type pairs — fan-out quadratic in the
    CLOSED type vocabulary, never in users or events — and pair counts
    collapse per bucket, so the final exchange is matrix-sized. The
    diagonal is each type's audience."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def per_user_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()  # exact distinct: a user never spans buckets
        m = d.merge(d, on="user_id")
        g = (
            m.groupby(["event_type_x", "event_type_y"], as_index=False)
            .size()
            .rename(
                columns={"event_type_x": "type_a", "event_type_y": "type_b", "size": "n_users"}
            )
        )
        return g

    parts = bucketed_group_agg(
        ds.map_batches(pair_partial, batch_format="pandas", batch_size=65536),
        ["user_id"],
        per_user_pairs,
        n_buckets=32,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["type_a", "type_b"], as_index=False)["n_users"]
            .sum()
            .astype({"n_users": "int64"})
        )

    return bucketed_group_agg(parts, ["type_a", "type_b"], final, n_buckets=4)


def q107_daily_orders_vs_events(sf_dir: str) -> "ray.data.Dataset":
    """Distributed FULL OUTER join: per-day order counts vs per-day event
    counts, keeping days present on EITHER side (the reconciliation shape —
    q56 is LEFT, q92 classifies a diff; this emits the coalesced outer
    merge itself). Both sides pre-aggregate per batch (day partials), the
    tagged union rides ONE day-bucket shuffle, and the in-bucket merge is a
    pandas outer merge with zero-fill — no side is broadcast or
    driver-read, so the shape joins two table-sized streams."""
    orders = read_table(sf_dir, "orders", columns=["o_orderdate"])
    events = read_table(sf_dir, "events", columns=["ts"])

    def o_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame({"day": df["o_orderdate"].dt.floor("D")})
            .groupby("day", as_index=False)
            .size()
            .rename(columns={"size": "p_n"})
        )
        g["side"] = 0
        return g

    def e_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame({"day": df["ts"].dt.floor("D")})
            .groupby("day", as_index=False)
            .size()
            .rename(columns={"size": "p_n"})
        )
        g["side"] = 1
        return g

    u = orders.map_batches(o_partial, batch_format="pandas", batch_size=65536).union(
        events.map_batches(e_partial, batch_format="pandas", batch_size=65536)
    )

    def outer_merge(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 0].groupby("day", as_index=False)["p_n"].sum()
        e = df[df["side"] == 1].groupby("day", as_index=False)["p_n"].sum()
        m = o.merge(e, on="day", how="outer", suffixes=("_o", "_e")).fillna(0)
        out = pd.DataFrame(
            {
                "day": m["day"].astype("datetime64[us]"),
                "n_orders": m["p_n_o"].astype("int64"),
                "n_events": m["p_n_e"].astype("int64"),
            }
        )
        return out

    return bucketed_group_agg(u, ["day"], outer_merge, n_buckets=16)

def q111_chisq_independence(sf_dir: str) -> pd.DataFrame:
    """Pearson chi-squared test of independence between event_type and
    ISO day-of-week — the categorical-association screen a feature-audit
    runs before trusting a column pair. The corpus-sized work is ONE
    bucketed count aggregation to the (type × dow) contingency table
    (≤ |types|·7 cells — bounded by the schema, not the data); the chi²
    reduction over those cells is driver-side on the aggregate, like every
    calendar-sized tail in this file. Expected counts e = row·col/N, the
    statistic Σ(o−e)²/e and dof = (R−1)(C−1) use the identical expression
    tree as the oracle."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"event_type": df["event_type"], "dow": df["ts"].dt.dayofweek + 1})
            .groupby(["event_type", "dow"], as_index=False)
            .size()
            .rename(columns={"size": "p_n"})
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "dow"], as_index=False)["p_n"].sum()

    c = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["event_type", "dow"],
        final,
        n_buckets=8,
    ).to_pandas()
    o = c["p_n"].to_numpy(dtype=np.float64)
    r = c.groupby("event_type")["p_n"].transform("sum").to_numpy(dtype=np.float64)
    k = c.groupby("dow")["p_n"].transform("sum").to_numpy(dtype=np.float64)
    n = float(c["p_n"].sum())
    e = r * k / n
    chi2 = float(np.sum((o - e) * (o - e) / e))
    dof = (c["event_type"].nunique() - 1) * (c["dow"].nunique() - 1)
    return pd.DataFrame({"chi2": [round_away(chi2, 4)], "dof": [int(dof)]})


def q112_weighted_median(sf_dir: str) -> "ray.data.Dataset":
    """Quantity-weighted median extendedprice per returnflag — the
    holistic weighted-quantile shape (portfolio medians, weighted P50
    latency) that no mergeable aggregate computes. Deterministic
    definition: collapse weights per DISTINCT price first (so ties inside
    one price never depend on row order), then the weighted median is the
    smallest price whose running weight reaches half the total. Per-batch
    (flag, price)→weight partials pre-aggregate BEFORE the one bucketed
    shuffle, so the exchange moves distinct-price partials, not raw
    lineitems; in-bucket one sort + grouped cumsum finds the crossing
    row. Weights are integral quantities, so their float64 sums are exact
    and both oracle sides see bit-identical running weights."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["l_returnflag", "l_extendedprice"], as_index=False)["l_quantity"]
            .sum()
            .rename(columns={"l_quantity": "wt"})
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = (
            df.groupby(["l_returnflag", "l_extendedprice"], as_index=False)["wt"]
            .sum()
            .sort_values(["l_returnflag", "l_extendedprice"], kind="mergesort")
        )
        g = df.groupby("l_returnflag", sort=False)
        cw = g["wt"].cumsum().to_numpy()
        tot = g["wt"].transform("sum").to_numpy()
        hit = df.loc[cw >= tot / 2.0]
        out = hit.groupby("l_returnflag", as_index=False)["l_extendedprice"].min()
        return pd.DataFrame(
            {
                "l_returnflag": out["l_returnflag"],
                "wmedian": round_away(out["l_extendedprice"].to_numpy(), 4),
            }
        )

    # flags are few — each bucket holds whole flags, which is the point:
    # the crossing scan needs the flag's full (already price-collapsed)
    # distribution in one place, and that distribution is |distinct price|
    # sized, not row sized
    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["l_returnflag"],
        final,
        n_buckets=4,
    )


def q113_linear_interp(sf_dir: str) -> pd.DataFrame:
    """Gap-filled daily mean event value per type with LINEAR INTERPOLATION
    across missing days (q89 fills zeros; models reading a level signal
    need the line between known points, with the leading/trailing edge
    left NULL — no extrapolation). Distributed part: exact-cents daily
    (type, day) mean partials through one bucketed reduce; the dense
    per-type calendar + neighbor scan is driver-side on the aggregate
    (calendar-sized, like q89). Means are rounded to 4dp BEFORE
    interpolating on BOTH oracle sides, so the interpolation arithmetic —
    prev + (next−prev)·gap_frac on identical inputs — is bit-identical."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": df["ts"].dt.normalize(),
                "cents": np.rint(df["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64),
            }
        )
        return d.groupby(["event_type", "day"], as_index=False).agg(
            p_sum=("cents", "sum"), p_n=("cents", "size")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "day"], as_index=False).agg(
            p_sum=("p_sum", "sum"), p_n=("p_n", "sum")
        )

    agg = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["event_type", "day"],
        final,
        n_buckets=8,
    ).to_pandas()
    agg["v"] = round_away((agg["p_sum"].to_numpy() / 100.0) / agg["p_n"].to_numpy(), 4)
    frames = []
    for et, g in agg.groupby("event_type", sort=True):
        g = g.sort_values("day")
        cal = pd.DataFrame({"day": pd.date_range(g["day"].min(), g["day"].max(), freq="D")})
        m = cal.merge(g[["day", "v"]], on="day", how="left")
        dayn = m["day"].to_numpy().astype("datetime64[D]").astype(np.int64)
        v = m["v"].to_numpy(dtype=np.float64)
        known = ~np.isnan(v)
        idx = np.arange(len(m))
        prev = np.where(known, idx, -1)
        np.maximum.accumulate(prev, out=prev)
        nxt = np.where(known, idx, len(m))
        nxt = np.minimum.accumulate(nxt[::-1])[::-1]
        fillable = ~known & (prev >= 0) & (nxt < len(m))
        out_v = v.copy()
        p, q = prev[fillable], nxt[fillable]
        frac = (dayn[fillable] - dayn[p]) / (dayn[q] - dayn[p])
        out_v[fillable] = v[p] + (v[q] - v[p]) * frac
        frames.append(
            pd.DataFrame(
                {
                    "event_type": et,
                    "day": m["day"].astype("datetime64[us]"),
                    "v_interp": round_away(out_v, 4),
                    "observed": known,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)

def q117_autocorr_lag1(sf_dir: str) -> pd.DataFrame:
    """Lag-1 autocorrelation of each event type's DENSE daily count series
    (zeros on silent days — autocorrelation over a sparse series is a
    different, wrong statistic) — the burstiness/seasonality screen run on
    rate signals. Distributed part: one bucketed (type, day) count; the
    dense fill + Pearson-on-pairs reduction is driver-side on the
    calendar-sized aggregate (q89/q113 pattern). All sums (Σx, Σy, Σxy,
    Σxx, Σyy) are exact int64, so only the final ratio is float and the
    expression tree matches the oracle's q39-style explicit-sums form.
    Types whose span has < 2 days or zero variance on either side are
    dropped, matching the SQL WHERE."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"event_type": df["event_type"], "day": df["ts"].dt.normalize()})
            .groupby(["event_type", "day"], as_index=False)
            .size()
            .rename(columns={"size": "p_n"})
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "day"], as_index=False)["p_n"].sum()

    agg = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["event_type", "day"],
        final,
        n_buckets=8,
    ).to_pandas()
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        g = g.sort_values("day")
        cal = pd.DataFrame({"day": pd.date_range(g["day"].min(), g["day"].max(), freq="D")})
        m = cal.merge(g[["day", "p_n"]], on="day", how="left").fillna({"p_n": 0})
        c = m["p_n"].to_numpy(dtype=np.int64)
        if len(c) < 2:
            continue
        x, y = c[:-1], c[1:]
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if vx == 0 or vy == 0:
            continue
        r = (n * sxy - sx * sy) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
        rows.append({"event_type": et, "n_pairs": n, "autocorr": round_away(float(r), 4)})
    out = pd.DataFrame(rows, columns=["event_type", "n_pairs", "autocorr"])
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out

def q118_minmax_scale(sf_dir: str) -> "ray.data.Dataset":
    """Per-group min-max feature scaling (the normalization every
    training-feature pipeline runs next to q70's z-score): each event's
    value mapped to (v − min)/(max − min) within its event_type; constant
    groups (max == min) scale to NULL. TWO passes, ZERO shuffles of raw
    rows: pass 1 reduces per-batch (type, min, max) partials to a
    schema-bounded bounds table (|types| rows), pass 2 broadcasts it and
    maps every batch — the broadcast-small-side rule applied to an
    aggregate the pipeline itself produced. Both oracle sides compute the
    identical (v − lo)/(hi − lo) on identical exact bounds."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def bounds_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False)["value"].agg(["min", "max"])

    def bounds_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(
            lo=("min", "min"), hi=("max", "max")
        )

    bounds = bucketed_group_agg(
        ds.map_batches(bounds_partial, batch_format="pandas", batch_size=65536),
        ["event_type"],
        bounds_final,
        n_buckets=4,
    ).to_pandas()
    lo = dict(zip(bounds["event_type"], bounds["lo"]))
    hi = dict(zip(bounds["event_type"], bounds["hi"]))
    ref = ray.put((lo, hi))

    def scale(df: pd.DataFrame) -> pd.DataFrame:
        from .common import get_broadcast

        lo_m, hi_m = get_broadcast(ref)
        l = df["event_type"].map(lo_m).to_numpy(dtype=np.float64)
        h = df["event_type"].map(hi_m).to_numpy(dtype=np.float64)
        v = df["value"].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            s = (v - l) / (h - l)
        s = round_away(s, 4)
        s[h <= l] = np.nan
        return pd.DataFrame({"event_id": df["event_id"].astype("int64"), "scaled": s})

    return ds.map_batches(scale, batch_format="pandas", batch_size=65536)


def q119_seasonality_strength(sf_dir: str) -> pd.DataFrame:
    """Day-of-week seasonality strength per event type: the R² of the
    dow-means model over the type's OBSERVED daily counts — ss_between /
    ss_total in the explicit-sums form (Σn, Σn², per-dow S and c), so
    every operand is an exact int64 until the final two divisions. One
    bucketed (type, day) count is the only corpus-sized work; the 7-dow
    reduction is driver-side on the aggregate. Types with zero count
    variance are dropped (R² undefined), matching the SQL WHERE."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"event_type": df["event_type"], "day": df["ts"].dt.normalize()})
            .groupby(["event_type", "day"], as_index=False)
            .size()
            .rename(columns={"size": "p_n"})
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "day"], as_index=False)["p_n"].sum()

    d = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["event_type", "day"],
        final,
        n_buckets=8,
    ).to_pandas()
    d["dow"] = d["day"].dt.dayofweek + 1  # isodow
    rows = []
    for et, g in d.groupby("event_type", sort=True):
        n = g["p_n"].to_numpy(dtype=np.int64)
        nd = len(n)
        sn = int(n.sum())
        snn = int((n * n).sum())
        corr = float(sn * sn) / nd
        ss_total = snn - corr
        dw = g.groupby("dow")["p_n"].agg(["sum", "size"])
        sb = float(((dw["sum"].to_numpy(dtype=np.int64) ** 2) / dw["size"].to_numpy()).sum())
        if ss_total <= 0:
            continue
        rows.append(
            {
                "event_type": et,
                "n_days": nd,
                "seasonality_r2": round_away((sb - corr) / ss_total, 4),
            }
        )
    out = pd.DataFrame(rows, columns=["event_type", "n_days", "seasonality_r2"])
    out["n_days"] = out["n_days"].astype("int64")
    return out


def q120_distinct_user_rollup(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT) under ROLLUP — the aggregate where the grand-total
    row is NOT the sum of the group rows (a user active in two types
    counts once overall), so naive rollup re-aggregation is wrong by
    construction. Distributed form: ONE two-phase DISTINCT (user, type)
    pair reduction (the corpus-sized exchange), then per-type pair counts
    AND a distinct-user count both read from that already-small pair set;
    the '(all)' row is the latter. Driver assembles |types|+1 rows."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["user_id", "event_type"]].drop_duplicates()

    def pair_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    pairs = bucketed_group_agg(
        ds.map_batches(pair_partial, batch_format="pandas", batch_size=65536),
        ["user_id", "event_type"],
        pair_final,
        n_buckets=16,
    )
    # the pair set is |users|·|types| — never driver-side. Per-type counts
    # are a partial-count reduce over it; the '(all)' distinct-user count
    # is a second two-phase distinct + distributed count().
    def type_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).size().rename(columns={"size": "p_n"})

    def type_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False)["p_n"].sum()

    per_type = bucketed_group_agg(
        pairs.map_batches(type_partial, batch_format="pandas", batch_size=65536),
        ["event_type"],
        type_final,
        n_buckets=4,
    ).to_pandas()

    def user_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["user_id"]].drop_duplicates()

    def user_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    n_all = bucketed_group_agg(
        pairs.map_batches(user_partial, batch_format="pandas", batch_size=65536),
        ["user_id"],
        user_final,
        n_buckets=16,
    ).count()
    out = pd.DataFrame(
        {
            "event_type": list(per_type["event_type"]) + ["(all)"],
            "n_users": list(per_type["p_n"]) + [n_all],
        }
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q123_event_grouping_sets(sf_dir: str) -> pd.DataFrame:
    """GROUP BY GROUPING SETS ((event_type, dow), (event_type), (dow)) over
    events — the general form CUBE (q76) and ROLLUP (q44) are special cases
    of: an arbitrary list of grouping sets, here one that is NEITHER a cube
    nor a rollup (no grand total, and (dow) alone is not a rollup prefix).
    Same scale shape: ONE distributed two-phase pass to the finest set
    (event_type x day-of-week — dimension-bounded), then each requested set
    re-aggregates that bounded result driver-side, exactly how SQL engines
    evaluate GROUPING SETS from the lowest common set. '(all)' / -1 mark
    grouped-out levels."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "event_type": df["event_type"],
                # ISO day of week (1=Mon..7=Sun), matching DuckDB isodow()
                "dow": (df["ts"].dt.dayofweek + 1).astype("int64"),
                "value": df["value"],
            }
        )
        return g.groupby(["event_type", "dow"], as_index=False).agg(
            p_n=("value", "size"), p_sum=("value", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "dow"], as_index=False).agg(
            n=("p_n", "sum"), s=("p_sum", "sum")
        )

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    fine = bucketed_group_agg(parts, ["event_type", "dow"], final, n_buckets=4).to_pandas()

    sets = [("event_type", "dow"), ("event_type",), ("dow",)]
    out = []
    for keep in sets:
        g = fine.copy()
        if "event_type" not in keep:
            g["event_type"] = "(all)"
        if "dow" not in keep:
            g["dow"] = -1
        g = g.groupby(["event_type", "dow"], as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    res["n"] = res["n"].astype("int64")
    res["dow"] = res["dow"].astype("int64")
    res["sum_value"] = round_away(res["s"].to_numpy(dtype=np.float64), 4)
    return res[["event_type", "dow", "n", "sum_value"]]


def q122_order_ntile(sf_dir: str, k: int = 8, n_ranges: int = 64) -> "ray.data.Dataset":
    """Distributed NTILE(k) within HOT partitions — equal-count tile
    assignment per o_orderpriority ordered by (o_totalprice, o_orderkey).
    Like q95's percent_rank, the partitions are ~20% of the table each, so
    no group is ever co-located: the same distributed-ECDF shape computes a
    GLOBAL row_number instead (the counting pass's prefix offsets plus an
    in-range-bucket cumcount over the unique (price, orderkey) order), and
    the SQL NTILE remainder rule — the first N % k tiles get one extra row
    — is a closed-form vectorized map from row_number to tile."""
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    ds = read_table(sf_dir, "orders", columns=cols)

    mm = ds.map_batches(
        lambda df: pd.DataFrame(
            {"mn": [df["o_totalprice"].min()], "mx": [df["o_totalprice"].max()]}
        ),
        batch_format="pandas",
        batch_size=65536,
    ).to_pandas()
    mn, mx = float(mm["mn"].min()), float(mm["mx"].max())
    bounds = np.linspace(mn, mx, n_ranges + 1)[1:-1]

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        rb = np.searchsorted(bounds, df["o_totalprice"].to_numpy(), side="right")
        return (
            pd.DataFrame({"prio": df["o_orderpriority"], "_rb": rb})
            .groupby(["prio", "_rb"], as_index=False)
            .size()
        )

    counts = (
        ds.map_batches(cnt_partial, batch_format="pandas", batch_size=65536)
        .to_pandas()  # <= n_batches x G x R partial rows — aggregate-sized
        .groupby(["prio", "_rb"], as_index=False)["size"]
        .sum()
        .sort_values(["prio", "_rb"], kind="mergesort")
    )
    counts["offset"] = counts.groupby("prio")["size"].cumsum() - counts["size"]
    n_per_prio = counts.groupby("prio")["size"].sum().to_dict()
    offsets = {
        (p, r): int(o) for p, r, o in zip(counts["prio"], counts["_rb"], counts["offset"])
    }

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rb"] = np.searchsorted(
            bounds, df["o_totalprice"].to_numpy(), side="right"
        ).astype("int64")
        return df

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_orderpriority", "_rb", "o_totalprice", "o_orderkey"], kind="mergesort"
        )
        pos = df.groupby(["o_orderpriority", "_rb"], sort=False).cumcount().to_numpy()
        prio = df["o_orderpriority"].to_numpy()
        rb = df["_rb"].to_numpy()
        off = np.fromiter(
            (offsets.get((p, r), 0) for p, r in zip(prio, rb)),
            dtype=np.int64,
            count=len(df),
        )
        rn = off + pos + 1  # global 1-based row_number within the partition
        n = np.fromiter((n_per_prio[p] for p in prio), dtype=np.int64, count=len(df))
        q, r = n // k, n % k
        boundary = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
        tile = np.where(
            rn <= boundary,
            (rn + q) // (q + 1),  # ceil(rn / (q+1))
            r + (rn - boundary + np.maximum(q, 1) - 1) // np.maximum(q, 1),
        )
        return pd.DataFrame(
            {"o_orderkey": df["o_orderkey"].to_numpy(), "tile": tile.astype("int64")}
        )

    stamped = ds.map_batches(stamp, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(stamped, ["o_orderpriority", "_rb"], final, n_buckets=32)


def q140_validation_report(sf_dir: str) -> pd.DataFrame:
    """Expectation-suite-style data validation (the Great-Expectations /
    dbt-test family an ingest gate runs before anything downstream): a
    fixed rule set over ``orders`` — not-null, value range, closed value
    set, format regex, and EXACT column uniqueness — emitting one row per
    rule with checked/violation counts. The scalar rules ride ONE
    map_batches partial pass (num_blocks × n_rules ints to the driver);
    uniqueness is the one rule that genuinely needs a shuffle, and it
    ships per-batch (key, count) partials through bucketed_group_agg so
    only distinct-key rows travel — violations = Σ (multiplicity − 1),
    i.e. rows beyond each key's first. The range rule is deliberately
    tighter than the data (violations > 0) so the counting path is
    value-checked, not just the zeros."""
    ds = read_table(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"],
    )

    STATUS = {"O", "F", "P"}
    LO, HI = 1000.0, 300000.0
    PRIO_RE = r"^[1-5]-[A-Z ]+$"

    def scalar_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        key_null = pc.sum(pc.cast(pc.is_null(t.column("o_orderkey")), pa.int64())).as_py() or 0
        price = t.column("o_totalprice")
        bad_range = pc.sum(
            pc.cast(
                pc.or_kleene(
                    pc.or_kleene(pc.less(price, LO), pc.greater(price, HI)),
                    pc.is_null(price),
                ),
                pa.int64(),
            )
        ).as_py() or 0
        status = t.column("o_orderstatus")
        bad_set = n - (
            pc.sum(pc.cast(pc.is_in(status, value_set=pa.array(sorted(STATUS))), pa.int64())).as_py()
            or 0
        )
        prio = t.column("o_orderpriority")
        bad_fmt = n - (
            pc.sum(
                pc.cast(pc.match_substring_regex(pc.cast(prio, pa.string()), PRIO_RE), pa.int64())
            ).as_py()
            or 0
        )
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "key_null": pa.array([key_null], pa.int64()),
                "bad_range": pa.array([bad_range], pa.int64()),
                "bad_set": pa.array([bad_set], pa.int64()),
                "bad_fmt": pa.array([bad_fmt], pa.int64()),
            }
        )

    scal = ds.map_batches(scalar_partial, batch_format="pyarrow").to_pandas().sum()

    def key_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderkey", as_index=False).size()
        return g.rename(columns={"size": "c"})

    def dup_final(df: pd.DataFrame) -> pd.DataFrame:
        per_key = df.groupby("o_orderkey")["c"].sum()
        return pd.DataFrame({"dups": [int((per_key - 1).clip(lower=0).sum())]})

    keyed = read_table(sf_dir, "orders", columns=["o_orderkey"]).map_batches(
        key_partial, batch_format="pandas", batch_size=65536
    )
    dups = int(
        bucketed_group_agg(keyed, ["o_orderkey"], dup_final, n_buckets=16)
        .to_pandas()["dups"]
        .sum()
    )

    n = int(scal["n"])
    rules = [
        ("o_orderkey_not_null", int(scal["key_null"])),
        ("o_orderkey_unique", dups),
        ("o_orderpriority_format", int(scal["bad_fmt"])),
        ("o_orderstatus_in_set", int(scal["bad_set"])),
        ("o_totalprice_range", int(scal["bad_range"])),
    ]
    return pd.DataFrame(
        {
            "rule": [r for r, _ in rules],
            "n_checked": np.int64(n),
            "n_violations": np.array([v for _, v in rules], dtype=np.int64),
            "ok": np.array([int(v == 0) for _, v in rules], dtype=np.int64),
        }
    )


def q141_global_median_exact(sf_dir: str, n_bins: int = 128, tail_cap: int = 65536) -> pd.DataFrame:
    """EXACT global median of ``l_extendedprice`` by distributed selection —
    no global sort, no value ever shuffled. Classic iterative refinement:
    pass 0 gets (count, min, max); each round broadcasts ``n_bins`` bin
    edges, every batch emits one bincount row (searchsorted — vectorized),
    and the driver narrows to the bin(s) holding order statistics
    k1=⌈n/2⌉ and k2=⌈(n+1)/2⌉. When the candidate range holds ≤
    ``tail_cap`` rows, ONE filtered pass collects just that sliver and the
    driver reads the two order stats off a sort of it. O(log_bins(range))
    passes, driver traffic = n_bins ints per pass — at 100 TB this is the
    only way to an exact quantile without an all-to-all. Interpolation
    mirrors DuckDB's quantile_cont: lower + 0.5·(upper−lower) for even n."""
    col = "l_extendedprice"
    ds = read_table(sf_dir, "lineitem", columns=[col])

    def minmax_partial(t: pa.Table) -> pa.Table:
        v = pc.drop_null(t.column(col))
        if len(v) == 0:
            return pa.table({"n": pa.array([0], pa.int64()), "lo": pa.array([np.inf]), "hi": pa.array([-np.inf])})
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "lo": pa.array([pc.min(v).as_py()]),
                "hi": pa.array([pc.max(v).as_py()]),
            }
        )

    mm = ds.map_batches(minmax_partial, batch_format="pyarrow").to_pandas()
    n = int(mm["n"].sum())
    if n == 0:
        return pd.DataFrame({"n": [0], "median": [np.nan]})
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())
    k1, k2 = (n + 1) // 2, (n + 2) // 2  # 1-based order stats; equal for odd n

    # rank offset: values < lo already accounted for
    below = 0
    while True:
        # would the final pass fit? (can't know exactly without counting;
        # the loop's own bin counts tell us — see narrowing below)
        edges = np.linspace(lo, hi, n_bins + 1)
        ref = ray.put(edges)

        def bin_partial(t: pa.Table, ref=ref) -> pa.Table:
            e = get_broadcast(ref)
            v = pc.drop_null(t.column(col)).to_numpy(zero_copy_only=False)
            v = v[(v >= e[0]) & (v <= e[-1])]
            # right-open bins, last bin closed
            ix = np.clip(np.searchsorted(e, v, side="right") - 1, 0, len(e) - 2)
            return pa.table({"cnt": pa.array([np.bincount(ix, minlength=len(e) - 1).tolist()], pa.list_(pa.int64(), len(e) - 1))})

        agg = ds.map_batches(bin_partial, batch_format="pyarrow").to_pandas()
        counts = np.sum([np.asarray(r) for r in agg["cnt"]], axis=0)
        cum = below + np.cumsum(counts)
        b1 = int(np.searchsorted(cum, k1))
        b2 = int(np.searchsorted(cum, k2))
        new_lo, new_hi = edges[b1], edges[b2 + 1]
        in_range = int(counts[b1 : b2 + 1].sum())
        new_below = below + int(counts[:b1].sum())
        if in_range <= tail_cap or (new_lo, new_hi) == (lo, hi):
            lo, hi, below = new_lo, new_hi, new_below
            break
        lo, hi, below = new_lo, new_hi, new_below

    def tail(t: pa.Table) -> pa.Table:
        v = pc.drop_null(t.column(col)).to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(v[(v >= lo) & (v <= hi)])})

    sliver = np.sort(ds.map_batches(tail, batch_format="pyarrow").to_pandas()["v"].to_numpy())
    x1 = float(sliver[k1 - 1 - below])
    x2 = float(sliver[k2 - 1 - below])
    med = x1 + 0.5 * (x2 - x1)  # quantile_cont interpolation
    return pd.DataFrame({"n": np.array([n], dtype=np.int64), "median": [round_away(med, 4)]})


def q142_k_anonymity(sf_dir: str, k: int = 5) -> "ray.data.Dataset":
    """k-anonymity audit over the (c_nationkey, c_mktsegment)
    quasi-identifier pair — the privacy-release check: every equivalence
    class's size, flagged when it re-identifies (size < k). Two-phase
    grouped count (per-batch partials → one bucketed exchange on the
    closed QI vocabulary); the report is class-vocabulary-sized, never
    row-sized."""
    ds = read_table(sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["c_nationkey", "c_mktsegment"], as_index=False).size()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["c_nationkey", "c_mktsegment"], as_index=False)["size"].sum()
        g = g.rename(columns={"size": "class_n"})
        g["anonymous"] = (g["class_n"] >= k).astype("int64")
        g["class_n"] = g["class_n"].astype("int64")
        return g

    part = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(part, ["c_nationkey", "c_mktsegment"], final, n_buckets=8)


def q144_gini_spend(sf_dir: str, n_ranges: int = 64) -> pd.DataFrame:
    """EXACT Gini coefficient of per-customer total spend — the inequality
    metric behind "what fraction of revenue comes from the top X%"
    dashboards. Gini = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n over ASCENDING-sorted
    spend needs global ranks, not a global sort: this reuses q95's
    distributed-ECDF shape. Phase 1 aggregates per-customer totals
    (bucketed two-phase sum — customers are 100M+ at scale, never
    driver-sized). Phase 2: min/max scan → one counting pass gives each
    value-range bucket's global rank OFFSET; one range shuffle sorts each
    bucket locally and emits a single (Σx, Σ j·x local-rank moment, count)
    partial — ties are rank-order-invariant in Σ i·x₍ᵢ₎, so the statistic
    is exact without any tie protocol. Driver algebra over n_ranges rows."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def sum_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False)["o_totalprice"].sum()

    def sum_final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("o_custkey", as_index=False)["o_totalprice"]
            .sum()
            .rename(columns={"o_totalprice": "s"})
        )

    totals = bucketed_group_agg(
        ds.map_batches(sum_partial, batch_format="pandas", batch_size=65536),
        ["o_custkey"],
        sum_final,
        n_buckets=32,
    )

    mm = totals.map_batches(
        lambda df: pd.DataFrame({"mn": [df["s"].min()], "mx": [df["s"].max()]}),
        batch_format="pandas",
        batch_size=65536,
    ).to_pandas()
    mn, mx = float(mm["mn"].min()), float(mm["mx"].max())
    bounds = np.linspace(mn, mx, n_ranges + 1)[1:-1]

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        rb = np.searchsorted(bounds, df["s"].to_numpy(), side="right")
        return pd.DataFrame({"_rb": rb}).groupby("_rb", as_index=False).size()

    counts = (
        totals.map_batches(cnt_partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("_rb", as_index=False)["size"]
        .sum()
        .sort_values("_rb", kind="mergesort")
    )
    counts["offset"] = counts["size"].cumsum() - counts["size"]
    offsets = dict(zip(counts["_rb"], counts["offset"]))
    n = int(counts["size"].sum())

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rb"] = np.searchsorted(bounds, df["s"].to_numpy(), side="right").astype("int64")
        return df

    def moment(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for rb, grp in df.groupby("_rb"):
            x = np.sort(grp["s"].to_numpy(np.float64))
            j = np.arange(1, len(x) + 1, dtype=np.float64)
            out.append(
                {
                    "_rb": int(rb),
                    "m": len(x),
                    "sx": x.sum(),
                    "sjx": float(np.dot(j, x)),
                }
            )
        return pd.DataFrame(out)

    parts = bucketed_group_agg(
        totals.map_batches(stamp, batch_format="pandas", batch_size=65536),
        ["_rb"],
        moment,
        n_buckets=32,
    ).to_pandas()
    # global Σ i·x = Σ_b (offset_b · Σx_b + Σ_j j·x_j)
    six = sum(offsets.get(rb, 0) * sx + sjx for rb, sx, sjx in zip(parts["_rb"], parts["sx"], parts["sjx"]))
    total = float(parts["sx"].sum())
    gini = 2.0 * six / (n * total) - (n + 1.0) / n
    return pd.DataFrame(
        {"n": np.array([n], dtype=np.int64), "gini": [round_away(gini, 6)]}
    )


def _wq_interp(values: np.ndarray, counts: np.ndarray, q: float) -> float:
    """Exact quantile_cont over a multiset given as (sorted distinct values,
    counts) — the (n-1)*q rank-interpolation rule, identical to DuckDB's
    quantile_cont and pandas' default 'linear'. Ranks are located with
    searchsorted over the cumulative counts, so the expanded multiset is
    never materialized."""
    cum = np.cumsum(counts)
    n = int(cum[-1])
    t = (n - 1) * q
    k = int(np.floor(t))
    frac = t - k
    lo = float(values[int(np.searchsorted(cum, k, side="right"))])
    if frac == 0.0:
        return lo
    hi = float(values[int(np.searchsorted(cum, k + 1, side="right"))])
    # DuckDB interpolates lo*(1-frac) + hi*frac (NOT lo + (hi-lo)*frac);
    # the two differ in the last ulp, and the property suite pins bitwise
    # equality with quantile_cont, so match the exact form
    return lo * (1.0 - frac) + hi * frac


def q145_iqr_outliers(sf_dir: str) -> "ray.data.Dataset":
    """Tukey IQR-fence outlier screen per order priority: rows outside
    [Q1 - 1.5*IQR, Q3 + 1.5*IQR] of o_totalprice — the standard
    data-quality / anomaly gate before a numeric column feeds a model.
    Holistic like q48, but NOT the co-locate-raw-rows shape: prices are a
    cents grid, so per-batch (priority, price)->count partials collapse the
    fact table to its distinct-value histogram BEFORE the one bucketed
    shuffle (q112's trick), and each bucket computes the interpolated
    quantiles from (value, count) pairs with _wq_interp and counts the
    outlier mass from the same histogram — one pass, no re-scan, exchange
    bounded by distinct prices x blocks. The +-1e-6 epsilon on the fence
    compare is applied identically in the SQL oracle so summation-order
    ulps at the fence can never flip a count."""
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_orderpriority", "o_totalprice"], as_index=False).size()
        return g.rename(columns={"size": "wt"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = (
            df.groupby(["o_orderpriority", "o_totalprice"], as_index=False)["wt"]
            .sum()
            .sort_values(["o_orderpriority", "o_totalprice"], kind="mergesort")
        )
        out = []
        for prio, g in df.groupby("o_orderpriority", sort=False):
            v = g["o_totalprice"].to_numpy(dtype=np.float64)
            c = g["wt"].to_numpy(dtype=np.int64)
            q1 = _wq_interp(v, c, 0.25)
            q3 = _wq_interp(v, c, 0.75)
            iqr = q3 - q1
            bad = (v > q3 + 1.5 * iqr + 1e-6) | (v < q1 - 1.5 * iqr - 1e-6)
            out.append(
                {
                    "o_orderpriority": prio,
                    "n_rows": int(c.sum()),
                    "n_outliers": int(c[bad].sum()),
                }
            )
        res = pd.DataFrame(out)
        return res.astype({"n_rows": "int64", "n_outliers": "int64"})

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["o_orderpriority"],
        final,
        n_buckets=4,
    )


def q148_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Ratio-to-report: each order priority's share of TOTAL revenue — the
    reporting op where every group's aggregate is divided by the grand
    total. Sums run as exact int64 cents partials (float money sums are
    summation-order-dependent; cents are not), so the one bounded
    two-phase aggregate is hash-stable, and the grand total + division are
    driver math on the |priorities|-sized result. Identical cents
    expression on the SQL side."""
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"],
                "cents": np.rint(df["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(
                    np.int64
                ),
            }
        )
        return d.groupby("o_orderpriority", as_index=False)["cents"].sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False)["cents"].sum()

    agg = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["o_orderpriority"],
        final,
        n_buckets=4,
    ).to_pandas()
    cents = agg["cents"].to_numpy(dtype=np.int64)
    total = float(cents.sum())
    return pd.DataFrame(
        {
            "o_orderpriority": agg["o_orderpriority"],
            "revenue": round_away(cents.astype(np.float64) / 100.0, 2),
            "share": round_away(cents.astype(np.float64) / total, 6),
        }
    )


def q149_copurchase_degree_hist(sf_dir: str) -> "ray.data.Dataset":
    """Degree distribution of the co-purchase graph (how many DISTINCT
    co-purchase partners each part has, histogrammed) — the graph-health
    screen next to q81's top edges and q82's triangle count. Three bounded
    exchanges: (1) DISTINCT (order, part) pairs bucketed by ORDER co-locate
    each basket, and the in-order partner expansion is a vectorized
    self-merge (quadratic only in basket size — single-digit here; a hot
    basket would take two_hop's min-k cap, documented not needed for this
    fixture); (2) the pair stream, pre-deduped per order-bucket, shuffles
    on the source part so each part's partner set is co-located for the
    global dedup + degree count; (3) one-row-per-part degrees collapse to
    the degree histogram through a two-phase count over the (small) degree
    vocabulary."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def lp_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["l_orderkey", "l_partkey"])

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        m = m.loc[m["l_partkey_a"] != m["l_partkey_b"], ["l_partkey_a", "l_partkey_b"]]
        return m.drop_duplicates().rename(columns={"l_partkey_a": "x", "l_partkey_b": "y"})

    pairs = bucketed_group_agg(
        ds.map_batches(lp_partial, batch_format="pandas", batch_size=65536),
        ["l_orderkey"],
        expand,
        n_buckets=32,
    )

    def degree_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().groupby("x", as_index=False)["y"].size()
        return pd.DataFrame({"degree": g["size"].astype("int64")})

    degrees = bucketed_group_agg(pairs, ["x"], degree_final, n_buckets=32)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("degree", as_index=False).size().rename(columns={"size": "p_n"})

    def hist_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("degree", as_index=False)["p_n"].sum()
        return pd.DataFrame(
            {"degree": g["degree"].astype("int64"), "n_parts": g["p_n"].astype("int64")}
        )

    return bucketed_group_agg(
        degrees.map_batches(hist_partial, batch_format="pandas", batch_size=65536),
        ["degree"],
        hist_final,
        n_buckets=4,
    )


def q150_winsorized_mean(sf_dir: str, lo_q: float = 0.01, hi_q: float = 0.99) -> "ray.data.Dataset":
    """Winsorized mean per order priority: o_totalprice clamped to its
    group's [p01, p99] before averaging — the robust-preprocessing step
    that keeps a fat tail from dominating a feature mean. Same
    distinct-value-histogram shape as q145 (one bucketed shuffle of
    (group, value)->count partials; quantiles interpolated from the
    histogram). Hash-exactness trick: raw prices live on the cents grid
    and the (n-1)*q interpolation at q=0.01/0.99 lands on the 1/400 grid,
    so every clamped value x400 rounds to an exact int64 — the group sum
    is integer arithmetic on BOTH oracle sides and the final mean is one
    deterministic division, immune to float summation order."""
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_orderpriority", "o_totalprice"], as_index=False).size()
        return g.rename(columns={"size": "wt"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = (
            df.groupby(["o_orderpriority", "o_totalprice"], as_index=False)["wt"]
            .sum()
            .sort_values(["o_orderpriority", "o_totalprice"], kind="mergesort")
        )
        out = []
        for prio, g in df.groupby("o_orderpriority", sort=False):
            v = g["o_totalprice"].to_numpy(dtype=np.float64)
            c = g["wt"].to_numpy(dtype=np.int64)
            lo = _wq_interp(v, c, lo_q)
            hi = _wq_interp(v, c, hi_q)
            q400 = np.rint(np.clip(v, lo, hi) * 400.0).astype(np.int64)
            n = int(c.sum())
            mean = (float(np.dot(q400, c)) / 400.0) / n
            out.append(
                {
                    "o_orderpriority": prio,
                    "n_rows": n,
                    "wins_mean": float(round_away(np.array([mean]), 4)[0]),
                }
            )
        return pd.DataFrame(out).astype({"n_rows": "int64"})

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["o_orderpriority"],
        final,
        n_buckets=4,
    )


def q151_ship_leadtime(sf_dir: str) -> "ray.data.Dataset":
    """Order-to-ship lead time per priority (mean + worst case in days) —
    the fulfillment-latency SLA screen, and the engine's fact-to-fact join
    aggregate: neither lineitem nor orders is broadcastable, so both ride
    ONE orderkey-bucketed shuffle (bucketed_join, two narrow columns per
    side) and the per-bucket merge_fn collapses matched rows straight to
    per-priority (sum_days, n, max) partials — the exchange after the join
    is |priorities| x buckets, never item-sized. Day diffs are calendar-day
    boundary counts on exact int64 epoch days (dates are midnight-aligned),
    so sums are integer-exact on both oracle sides."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"o_orderkey": "l_orderkey"})

    orders = orders.map_batches(rename, batch_format="pandas", batch_size=65536)

    def merge_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, on="l_orderkey")
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "o_orderpriority": pd.Series([], dtype="object"),
                    "p_sum": pd.Series([], dtype="int64"),
                    "p_n": pd.Series([], dtype="int64"),
                    "p_max": pd.Series([], dtype="int64"),
                }
            )
        days = (
            m["l_shipdate"].to_numpy().astype("datetime64[D]").astype("int64")
            - m["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64")
        )
        d = pd.DataFrame({"o_orderpriority": m["o_orderpriority"], "days": days})
        return d.groupby("o_orderpriority", as_index=False).agg(
            p_sum=("days", "sum"), p_n=("days", "size"), p_max=("days", "max")
        )

    parts = bucketed_join(li, orders, on="l_orderkey", n_buckets=32, merge_fn=merge_fn)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", as_index=False).agg(
            p_sum=("p_sum", "sum"), n_items=("p_n", "sum"), max_lead_days=("p_max", "max")
        )
        return pd.DataFrame(
            {
                "o_orderpriority": g["o_orderpriority"],
                "n_items": g["n_items"].astype("int64"),
                "avg_lead_days": round_away(
                    g["p_sum"].to_numpy(dtype=np.float64) / g["n_items"].to_numpy(dtype=np.float64), 4
                ),
                "max_lead_days": g["max_lead_days"].astype("int64"),
            }
        )

    return bucketed_group_agg(parts, ["o_orderpriority"], final, n_buckets=4)


def _disc_quantiles_from_hist(values: np.ndarray, counts: np.ndarray, qs: list) -> list:
    """quantile_disc over a multiset given as (sorted distinct values,
    counts): the 1-based ceil(q*n) rank element — DuckDB's discrete rule
    (same one q131's threshold extraction pins)."""
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = []
    for q in qs:
        r = int(np.ceil(q * n))
        out.append(int(values[int(np.searchsorted(cum, r, side="left"))]))
    return out


def q154_rfm_segments(sf_dir: str) -> "ray.data.Dataset":
    """RFM customer segmentation (recency / frequency / monetary quartile
    codes, the classic marketing cut): per-customer aggregates reduce the
    fact table ONCE (custkey-bucket two-phase: max order epoch-day, order
    count, exact cents spend), quartile thresholds come from value-count
    histograms over the already-aggregate-sized table (recency is
    calendar-bounded, frequency is small-int-bounded; monetary's distinct
    cents grow with customers — at cluster scale that dimension's
    thresholds come from q141's micro-bin selection instead, same rank
    rule), and code assignment is a broadcast-9-scalars streaming map
    whose (r,f,m) cell counts collapse through a 64-row exchange. Codes
    use quantile_disc's ceil(q*n) rank rule with value > threshold
    boundaries — a pure function of the value, so ties land identically
    on both oracle sides."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "o_custkey": df["o_custkey"],
                "day": df["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64"),
                "cents": np.rint(df["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(
                    np.int64
                ),
            }
        )
        return d.groupby("o_custkey", as_index=False).agg(
            p_day=("day", "max"), p_n=("day", "size"), p_cents=("cents", "sum")
        )

    def agg_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(
            recency_day=("p_day", "max"), frequency=("p_n", "sum"), monetary_cents=("p_cents", "sum")
        )
        return g.astype(
            {"recency_day": "int64", "frequency": "int64", "monetary_cents": "int64"}
        )

    agg = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["o_custkey"],
        agg_final,
        n_buckets=32,
    ).materialize()

    thresholds = {}
    for col in ("recency_day", "frequency", "monetary_cents"):
        def hist_partial(df: pd.DataFrame, col=col) -> pd.DataFrame:
            return df.groupby(col, as_index=False).size().rename(columns={"size": "cnt"})

        h = (
            agg.map_batches(hist_partial, batch_format="pandas", batch_size=65536)
            .to_pandas()
            .groupby(col, as_index=False)["cnt"]
            .sum()
            .sort_values(col, kind="mergesort")
        )
        thresholds[col] = _disc_quantiles_from_hist(
            h[col].to_numpy(dtype=np.int64), h["cnt"].to_numpy(dtype=np.int64), [0.25, 0.5, 0.75]
        )
    ref = ray.put(thresholds)

    def code_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = get_broadcast(ref)
        out = {}
        for col, code in (
            ("recency_day", "r_code"),
            ("frequency", "f_code"),
            ("monetary_cents", "m_code"),
        ):
            v = df[col].to_numpy(dtype=np.int64)
            t1, t2, t3 = t[col]
            out[code] = (1 + (v > t1).astype("int64") + (v > t2) + (v > t3)).astype("int64")
        d = pd.DataFrame(out)
        return d.groupby(["r_code", "f_code", "m_code"], as_index=False).size().rename(
            columns={"size": "p_n"}
        )

    def count_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["r_code", "f_code", "m_code"], as_index=False)["p_n"].sum()
        g = g.rename(columns={"p_n": "n_customers"})
        return g.astype({"n_customers": "int64"})

    coded = agg.map_batches(code_partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(coded, ["r_code", "f_code", "m_code"], count_final, n_buckets=4)


def q156_frequent_triples(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Frequent 3-itemset mining over order baskets (the Apriori rung
    above q81's pair mining): top-k part triples by co-occurrence count.
    DISTINCT (order, part) pairs co-locate per basket in ONE order-bucket
    shuffle; the in-basket ordered-triple expansion is two chained
    self-merges (cubic only in basket size — single digits here; a hot
    basket takes two_hop's min-k cap), per-bucket pre-counts collapse
    repeats before the one triple-key exchange, and the global top-k uses
    q05's per-batch-top-k shape (count desc, then keys — a total order, so
    the LIMIT boundary is deterministic on both oracle sides)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def lp_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["l_orderkey", "l_partkey"])

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"]).rename(
            columns={"l_partkey": "part_a"}
        )
        m2 = d.merge(
            d.rename(columns={"part_a": "part_b"}), on="l_orderkey"
        )
        m2 = m2.loc[m2["part_a"] < m2["part_b"]]
        m3 = m2.merge(
            d.rename(columns={"part_a": "part_c"}), on="l_orderkey"
        )
        m3 = m3.loc[m3["part_b"] < m3["part_c"]]
        g = m3.groupby(["part_a", "part_b", "part_c"], as_index=False).size()
        return g.rename(columns={"size": "p_n"})

    parts = bucketed_group_agg(
        ds.map_batches(lp_partial, batch_format="pandas", batch_size=65536),
        ["l_orderkey"],
        expand,
        n_buckets=32,
    )

    def count_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["part_a", "part_b", "part_c"], as_index=False)["p_n"].sum()
        return g.rename(columns={"p_n": "n_orders"}).astype({"n_orders": "int64"})

    counts = bucketed_group_agg(parts, ["part_a", "part_b", "part_c"], count_final, n_buckets=16)

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n_orders", "part_a", "part_b", "part_c"],
            ascending=[False, True, True, True],
            kind="mergesort",
        ).head(k)

    cand = counts.map_batches(topk_partial, batch_format="pandas", batch_size=65536).to_pandas()
    return (
        cand.sort_values(
            ["n_orders", "part_a", "part_b", "part_c"],
            ascending=[False, True, True, True],
            kind="mergesort",
        )
        .head(k)
        .reset_index(drop=True)
    )


def q157_brand_discount_qty_corr(sf_dir: str) -> "ray.data.Dataset":
    """Grouped Pearson correlation (discount vs quantity per brand) — the
    price-elasticity proxy, and the GROUPED form of q39's
    sufficient-statistic correlation: the part dimension broadcasts
    (sorted-key searchsorted, q50's join shape), each batch emits exact
    int64 six-number partials (n, Σx, Σy, Σxy, Σx², Σy² over cents-grid
    discount and integral quantity), and ONE brand-bucket exchange of
    brand-sized partials finishes. The correlation is evaluated from the
    exact integer sums with the identical explicit expression on both
    oracle sides — every operand below 2^53, so the float math is
    bit-identical."""
    part = read_small(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pk = part.column("p_partkey").to_numpy()
    order = np.argsort(pk)
    ref = ray.put((pk[order], np.asarray(part.column("p_brand").to_pylist(), dtype=object)[order]))

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_discount", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, brands = get_broadcast(ref)
        ix = np.searchsorted(keys, df["l_partkey"].to_numpy())
        ix = np.clip(ix, 0, len(keys) - 1)
        x = np.rint(df["l_discount"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        y = df["l_quantity"].to_numpy(dtype=np.float64).astype(np.int64)
        d = pd.DataFrame(
            {
                "p_brand": brands[ix],
                "n": np.ones(len(df), dtype=np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
                "syy": y * y,
            }
        )
        return d.groupby("p_brand", as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_brand", as_index=False).sum()
        n = g["n"].to_numpy(dtype=np.float64)
        sx = g["sx"].to_numpy(dtype=np.float64)
        sy = g["sy"].to_numpy(dtype=np.float64)
        sxy = g["sxy"].to_numpy(dtype=np.float64)
        sxx = g["sxx"].to_numpy(dtype=np.float64)
        syy = g["syy"].to_numpy(dtype=np.float64)
        corr = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy))
        return pd.DataFrame(
            {
                "p_brand": g["p_brand"],
                "n": g["n"].astype("int64"),
                "corr_disc_qty": round_away(corr, 6),
            }
        )

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["p_brand"],
        final,
        n_buckets=8,
    )


def _copurchase_counts(sf_dir: str):
    """Shared co-purchase machinery for the association family (q158 lift /
    q188 rules / q200 affinity): distinct (order, part) pairs reduce
    through one orderkey-bucket expansion to undirected a<b pair counts,
    and the marginals (per-part distinct-order counts + the distinct-order
    total under sentinel key -1) are emitted as PER-BUCKET partials inside
    the same orderkey bucketing — each order lives wholly in one bucket,
    so the partials sum exactly and the driver merge is dimension-sized.
    Returns (pair_counts Dataset[part_a, part_b, n_ab],
    broadcast_ref (sorted part keys, n_a, n_orders))."""

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def lp_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["l_orderkey", "l_partkey"])

    def pair_expand(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        m = m.loc[m["l_partkey_a"] < m["l_partkey_b"]]
        g = m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False).size()
        return g.rename(
            columns={"l_partkey_a": "part_a", "l_partkey_b": "part_b", "size": "p_n"}
        )

    lp = ds.map_batches(lp_partial, batch_format="pandas", batch_size=65536)
    pairs = bucketed_group_agg(lp, ["l_orderkey"], pair_expand, n_buckets=32)

    def pair_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["part_a", "part_b"], as_index=False)["p_n"].sum()
        return g.rename(columns={"p_n": "n_ab"}).astype({"n_ab": "int64"})

    pair_counts = bucketed_group_agg(pairs, ["part_a", "part_b"], pair_final, n_buckets=16)

    def marg_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        g = d.groupby("l_partkey", as_index=False).size().rename(columns={"size": "n_a"})
        g = pd.concat(
            [g, pd.DataFrame({"l_partkey": [-1], "n_a": [d["l_orderkey"].nunique()]})],
            ignore_index=True,
        )
        return g.astype({"l_partkey": "int64", "n_a": "int64"})

    marg = (
        bucketed_group_agg(lp, ["l_orderkey"], marg_partial, n_buckets=32)
        .to_pandas()
        .groupby("l_partkey", as_index=False)["n_a"]
        .sum()
    )
    n_orders = int(marg.loc[marg["l_partkey"] == -1, "n_a"].iloc[0])
    marg = marg.loc[marg["l_partkey"] != -1]
    keys = marg["l_partkey"].to_numpy(dtype=np.int64)
    order_k = np.argsort(keys)
    ref = ray.put((keys[order_k], marg["n_a"].to_numpy(dtype=np.int64)[order_k], n_orders))
    return pair_counts, ref


def q158_pair_lift(sf_dir: str, min_support: int = 2, k: int = 50) -> pd.DataFrame:
    """Association-rule LIFT for co-purchase pairs: lift(a,b) =
    P(a,b)/(P(a)·P(b)) = n_ab·N / (n_a·n_b) — the normalization q81's raw
    pair counts lack (a pair of two individually-popular parts is not a
    signal; a pair that co-occurs far above its marginals is). Pair counts
    reuse q149's basket expansion (one order-bucket shuffle, a<b
    direction); marginal order-counts per part and the total order count N
    are a second two-phase pass over the SAME distinct (order, part)
    pairs; marginals broadcast (dimension-sized) into a streaming lift map
    over the pair counts, and the top-k rides q05's per-batch-top-k under
    the total order (lift desc, part_a, part_b). Lift is a double ratio of
    exact int64 products (<2^53), so both oracle sides compute identical
    bits."""
    pair_counts, ref = _copurchase_counts(sf_dir)

    def lift_topk(df: pd.DataFrame) -> pd.DataFrame:
        keys, na, n_tot = get_broadcast(ref)
        d = df.loc[df["n_ab"] >= min_support].copy()
        if len(d) == 0:
            return pd.DataFrame(
                {
                    "part_a": pd.Series([], dtype="int64"),
                    "part_b": pd.Series([], dtype="int64"),
                    "n_ab": pd.Series([], dtype="int64"),
                    "lift": pd.Series([], dtype="float64"),
                }
            )
        ia = np.searchsorted(keys, d["part_a"].to_numpy(dtype=np.int64))
        ib = np.searchsorted(keys, d["part_b"].to_numpy(dtype=np.int64))
        lift = (
            d["n_ab"].to_numpy(dtype=np.float64) * float(n_tot)
        ) / (na[ia].astype(np.float64) * na[ib].astype(np.float64))
        d["lift"] = round_away(lift, 6)
        return d.sort_values(
            ["lift", "part_a", "part_b"], ascending=[False, True, True], kind="mergesort"
        ).head(k)

    cand = pair_counts.map_batches(lift_topk, batch_format="pandas", batch_size=65536).to_pandas()
    return (
        cand.sort_values(
            ["lift", "part_a", "part_b"], ascending=[False, True, True], kind="mergesort"
        )
        .head(k)
        .reset_index(drop=True)
    )


def q160_abc_classes(sf_dir: str) -> pd.DataFrame:
    """ABC / Pareto inventory classification: parts bucketed into class A
    (the top revenue values covering the first 80% of total revenue), B
    (to 95%) and C (the tail) — the classic concentration cut next to
    q144's Gini. Per-part revenues reduce through one partkey-bucket
    two-phase (exact int64 cents); parts then collapse to the
    (revenue-value, n_parts) histogram in a second bounded exchange, and
    the descending cumulative scan + class rule is driver math on that
    aggregate (distinct revenue values — part-dimension sized; at cluster
    scale the two boundary thresholds come from q141's micro-bin selection
    instead). The class boundary is an INTEGER comparison
    (cum_prev*100 < total*80) on exact cents, so ties and edges land
    identically on both oracle sides; a value straddling a boundary goes
    wholly to the upper class."""
    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "l_partkey": df["l_partkey"],
                "rev": np.rint(
                    df["l_extendedprice"].to_numpy(dtype=np.float64) * 100
                ).astype(np.int64),
            }
        )
        return d.groupby("l_partkey", as_index=False)["rev"].sum()

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_partkey", as_index=False)["rev"].sum()
        h = g.groupby("rev", as_index=False).size().rename(columns={"size": "n"})
        return h.astype({"rev": "int64", "n": "int64"})

    hist = (
        bucketed_group_agg(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["l_partkey"],
            per_part,
            n_buckets=32,
        )
        .to_pandas()
        .groupby("rev", as_index=False)["n"]
        .sum()
        .sort_values("rev", ascending=False, kind="mergesort")
    )
    rev = hist["rev"].to_numpy(dtype=np.int64)
    n = hist["n"].to_numpy(dtype=np.int64)
    rt = rev * n
    tot = int(rt.sum())
    cum_prev = np.concatenate([[0], np.cumsum(rt)[:-1]])
    cls = np.where(cum_prev * 100 < tot * 80, "A", np.where(cum_prev * 100 < tot * 95, "B", "C"))
    out = (
        pd.DataFrame({"abc_class": cls, "n": n, "rt": rt})
        .groupby("abc_class", as_index=False)
        .agg(n_parts=("n", "sum"), rt=("rt", "sum"))
    )
    return pd.DataFrame(
        {
            "abc_class": out["abc_class"],
            "n_parts": out["n_parts"].astype("int64"),
            "rev_share": round_away(out["rt"].to_numpy(dtype=np.float64) / float(tot), 6),
        }
    )


def q162_supplier_hhi(sf_dir: str) -> "ray.data.Dataset":
    """Herfindahl-Hirschman supply-concentration index per part type: the
    sum of squared supplier shares of shipped quantity — the market- /
    supply-chain-risk screen next to q144's Gini (HHI says WHO dominates a
    segment, Gini says how unequal the whole tail is). Broadcast part
    dimension stamps the type; (type, supplier) integral-quantity sums
    reduce two-phase; in the final type-bucket the index is computed from
    EXACT int64 sums (HHI = Σn_i² / (Σn_i)² — both operands integer, one
    double division at the end), so supplier iteration order can never
    wiggle the result on either oracle side."""
    part = read_small(sf_dir, "part", columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy()
    order = np.argsort(pk)
    ref = ray.put((pk[order], np.asarray(part.column("p_type").to_pylist(), dtype=object)[order]))

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, types = get_broadcast(ref)
        ix = np.clip(np.searchsorted(keys, df["l_partkey"].to_numpy()), 0, len(keys) - 1)
        d = pd.DataFrame(
            {
                "p_type": types[ix],
                "l_suppkey": df["l_suppkey"],
                "qty": df["l_quantity"].to_numpy(dtype=np.float64).astype(np.int64),
            }
        )
        return d.groupby(["p_type", "l_suppkey"], as_index=False)["qty"].sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["p_type", "l_suppkey"], as_index=False)["qty"].sum()
        out = []
        for t, gg in g.groupby("p_type", sort=False):
            n = gg["qty"].to_numpy(dtype=np.int64)
            tot = int(n.sum())
            out.append(
                {
                    "p_type": t,
                    "n_suppliers": len(n),
                    "hhi": float(
                        round_away(
                            np.array([float(int((n * n).sum())) / float(tot * tot)]), 6
                        )[0]
                    ),
                }
            )
        return pd.DataFrame(out).astype({"n_suppliers": "int64"})

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["p_type"],
        final,
        n_buckets=8,
    )


def q163_conversion_ztest(sf_dir: str) -> pd.DataFrame:
    """Two-proportion z-test per ISO weekday: is a weekday's purchase
    share among funnel events (clicks + purchases) significantly different
    from the REST of the week's — the A/B-shaped statistical screen next
    to q111's chi-squared (chi² asks 'is anything off?'; the z per cell
    says WHERE and in which direction). One bounded two-phase count on
    (isodow, event_type) — 14 cells — and the closed-form
    z = (p1-p2)/sqrt(p(1-p)(1/n1+1/n2)) is driver math from exact int64
    counts with the identical expression on the SQL side."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"].isin(["click", "purchase"])]
        g = pd.DataFrame(
            {
                "dow": (d["ts"].dt.dayofweek + 1).astype("int64"),
                "is_purch": (d["event_type"] == "purchase").astype("int64"),
            }
        )
        return g.groupby("dow", as_index=False).agg(p_n=("is_purch", "size"), p_x=("is_purch", "sum"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dow", as_index=False).agg(n=("p_n", "sum"), x=("p_x", "sum"))
        return g.astype({"n": "int64", "x": "int64"})

    cells = (
        bucketed_group_agg(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["dow"],
            final,
            n_buckets=2,
        )
        .to_pandas()
        .sort_values("dow", kind="mergesort")
        .reset_index(drop=True)
    )
    N = float(cells["n"].sum())
    X = float(cells["x"].sum())
    n1 = cells["n"].to_numpy(dtype=np.float64)
    x1 = cells["x"].to_numpy(dtype=np.float64)
    n2 = N - n1
    p1 = x1 / n1
    p2 = (X - x1) / n2
    pooled = X / N
    z = (p1 - p2) / np.sqrt(pooled * (1.0 - pooled) * (1.0 / n1 + 1.0 / n2))
    return pd.DataFrame(
        {
            "dow": cells["dow"].astype("int64"),
            "n_events": cells["n"].astype("int64"),
            "n_purchases": cells["x"].astype("int64"),
            "z": round_away(z, 6),
        }
    )


def q167_customer_order_gap_median(sf_dir: str) -> "ray.data.Dataset":
    """Per-customer median reorder interval (days between consecutive
    orders) — the purchase-cadence feature behind churn models and
    replenishment forecasts; q36 gives MEAN gaps for events, but cadence
    is skewed, so the median is the honest center and it is holistic
    per customer. ONE custkey-bucket shuffle of two narrow columns;
    in-bucket a sorted grouped diff produces each customer's gap
    multiset and a vectorized grouped median (pandas' interpolated rule ==
    quantile_cont) finishes — per-customer state never leaves its bucket.
    Gaps tie-break deterministically because orderdates are day-grid
    timestamps and (custkey, orderdate, orderkey) ordering is total."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        days = d["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        prev_same = d["o_custkey"].to_numpy()
        gapmask = np.zeros(len(d), dtype=bool)
        gaps = np.zeros(len(d), dtype=np.int64)
        if len(d) > 1:
            same = prev_same[1:] == prev_same[:-1]
            gapmask[1:] = same
            gaps[1:] = days[1:] - days[:-1]
        g = pd.DataFrame({"o_custkey": d["o_custkey"], "gap": gaps})[gapmask]
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "o_custkey": pd.Series([], dtype="int64"),
                    "n_gaps": pd.Series([], dtype="int64"),
                    "median_gap_days": pd.Series([], dtype="float64"),
                }
            )
        out = g.groupby("o_custkey", as_index=False).agg(
            n_gaps=("gap", "size"), median_gap_days=("gap", "median")
        )
        out["median_gap_days"] = round_away(out["median_gap_days"].to_numpy(dtype=np.float64), 4)
        return out.astype({"n_gaps": "int64"})

    return bucketed_group_agg(ds, ["o_custkey"], final, n_buckets=32)


def q169_brand_price_bands(sf_dir: str) -> "ray.data.Dataset":
    """Global-threshold stratification: each brand's part mix across the
    CORPUS-WIDE retail-price terciles (low/mid/high) — the interaction
    audit that says which brands live in which end of the global price
    distribution (a per-brand quantile, q48, cannot: the bands must be the
    same cut for every brand). Tercile thresholds come exactly from the
    (price, count) histogram with quantile_disc's ceil(q*n) rule (q154's
    helper); two scalars broadcast into a per-batch band count, and the
    brand x band shares ride a brand-sized exchange. Band edges compare
    with > on the raw cents-grid doubles, identically in the SQL."""
    ds = read_table(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p_retailprice", as_index=False).size().rename(columns={"size": "cnt"})

    h = (
        ds.map_batches(hist_partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("p_retailprice", as_index=False)["cnt"]
        .sum()
        .sort_values("p_retailprice", kind="mergesort")
    )
    cum = np.cumsum(h["cnt"].to_numpy(dtype=np.int64))
    n = int(cum[-1])
    v = h["p_retailprice"].to_numpy(dtype=np.float64)
    t1 = float(v[int(np.searchsorted(cum, int(np.ceil(n / 3.0)), side="left"))])
    t2 = float(v[int(np.searchsorted(cum, int(np.ceil(2.0 * n / 3.0)), side="left"))])
    ref = ray.put((t1, t2))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi = get_broadcast(ref)
        p = df["p_retailprice"].to_numpy(dtype=np.float64)
        band = np.where(p > hi, "high", np.where(p > lo, "mid", "low"))
        d = pd.DataFrame({"p_brand": df["p_brand"], "band": band})
        return d.groupby(["p_brand", "band"], as_index=False).size().rename(columns={"size": "p_n"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["p_brand", "band"], as_index=False)["p_n"].sum()
        tot = g.groupby("p_brand")["p_n"].transform("sum")
        return pd.DataFrame(
            {
                "p_brand": g["p_brand"],
                "band": g["band"],
                "n_parts": g["p_n"].astype("int64"),
                "share": round_away(
                    g["p_n"].to_numpy(dtype=np.float64) / tot.to_numpy(dtype=np.float64), 6
                ),
            }
        )

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["p_brand"],
        final,
        n_buckets=8,
    )


def q170_design_effect(sf_dir: str) -> "ray.data.Dataset":
    """Effective sample size per return flag under quantity weighting:
    ESS = (Σw)²/Σw² — the survey-statistics design-effect diagnostic
    (how many EQUAL-weight rows the weighted sample is worth; ESS ≪ n
    means a few heavy rows dominate any weighted estimate, the q112
    weighted-median caveat quantified). Weights are integral quantities,
    so Σw and Σw² are exact int64 two-phase sums and the index is one
    double division — identical on both oracle sides."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["l_quantity"].to_numpy(dtype=np.float64).astype(np.int64)
        d = pd.DataFrame({"l_returnflag": df["l_returnflag"], "w": w, "w2": w * w})
        return d.groupby("l_returnflag", as_index=False).agg(
            p_n=("w", "size"), p_w=("w", "sum"), p_w2=("w2", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_returnflag", as_index=False).agg(
            n=("p_n", "sum"), sw=("p_w", "sum"), sw2=("p_w2", "sum")
        )
        ess = (
            g["sw"].to_numpy(dtype=np.float64) * g["sw"].to_numpy(dtype=np.float64)
        ) / g["sw2"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "l_returnflag": g["l_returnflag"],
                "n_rows": g["n"].astype("int64"),
                "ess": round_away(ess, 4),
            }
        )

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["l_returnflag"],
        final,
        n_buckets=4,
    )


def q171_nation_flow_matrix(sf_dir: str) -> "ray.data.Dataset":
    """Origin-destination flow matrix: revenue flowing from each SUPPLIER
    nation to each CUSTOMER nation — the trade-balance / data-lineage
    matrix whose output is |nations|² bounded no matter the fact volume.
    Both endpoints resolve through BROADCAST dimension chains (suppkey →
    nation; orderkey → custkey → nation, the second via ONE
    orderkey-bucketed join since orders is fact-sized), and exact int64
    cents partials ride a matrix-sized exchange."""
    sup = read_small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nat = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    n_map = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )
    sk = sup.column("s_suppkey").to_numpy()
    so = np.argsort(sk)
    s_names = np.asarray(
        [n_map[k] for k in sup.column("s_nationkey").to_pylist()], dtype=object
    )[so]
    ck = cust.column("c_custkey").to_numpy()
    co = np.argsort(ck)
    c_names = np.asarray(
        [n_map[k] for k in cust.column("c_nationkey").to_pylist()], dtype=object
    )[co]
    ref = ray.put((sk[so], s_names, ck[co], c_names))

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, snames, _, _ = get_broadcast(ref)
        ix = np.clip(np.searchsorted(keys, df["l_suppkey"].to_numpy()), 0, len(keys) - 1)
        d = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "supp_nation": snames[ix],
                "cents": np.rint(
                    df["l_extendedprice"].to_numpy(dtype=np.float64) * 100
                ).astype(np.int64),
            }
        )
        return d.groupby(["l_orderkey", "supp_nation"], as_index=False)["cents"].sum()

    li = li.map_batches(li_partial, batch_format="pandas", batch_size=65536)

    def o_rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"o_orderkey": "l_orderkey"})

    orders = orders.map_batches(o_rename, batch_format="pandas", batch_size=65536)

    def merge_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        lg = left.groupby(["l_orderkey", "supp_nation"], as_index=False)["cents"].sum()
        m = lg.merge(right, on="l_orderkey")
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "supp_nation": pd.Series([], dtype="object"),
                    "cust_nation": pd.Series([], dtype="object"),
                    "cents": pd.Series([], dtype="int64"),
                }
            )
        _, _, ckeys, cnames = get_broadcast(ref)
        ix = np.clip(np.searchsorted(ckeys, m["o_custkey"].to_numpy()), 0, len(ckeys) - 1)
        d = pd.DataFrame(
            {"supp_nation": m["supp_nation"], "cust_nation": cnames[ix], "cents": m["cents"]}
        )
        return d.groupby(["supp_nation", "cust_nation"], as_index=False)["cents"].sum()

    parts = bucketed_join(li, orders, on="l_orderkey", n_buckets=32, merge_fn=merge_fn)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["supp_nation", "cust_nation"], as_index=False)["cents"].sum()
        return pd.DataFrame(
            {
                "supp_nation": g["supp_nation"],
                "cust_nation": g["cust_nation"],
                "revenue": round_away(g["cents"].to_numpy(dtype=np.float64) / 100.0, 2),
            }
        )

    return bucketed_group_agg(parts, ["supp_nation", "cust_nation"], final, n_buckets=8)


def q172_new_vs_repeat_revenue(sf_dir: str) -> "ray.data.Dataset":
    """Monthly revenue split between NEW customers (orders inside the
    customer's first calendar month) and REPEAT customers — the
    acquisition-vs-retention revenue view (q153 counts heads; this
    follows the money). ONE custkey-bucket shuffle co-locates each
    customer's orders; the in-bucket grouped min marks the first month and
    one compare splits every order's exact cents into the month's
    new/repeat partials — calendar-bounded rows out."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        month = df["o_orderdate"].astype("datetime64[us]").dt.to_period("M")
        d = pd.DataFrame(
            {
                "o_custkey": df["o_custkey"],
                "month": month,
                "cents": np.rint(df["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(
                    np.int64
                ),
            }
        )
        first = d.groupby("o_custkey")["month"].transform("min")
        d["is_new"] = (d["month"] == first).astype("int64")
        g = d.groupby("month", as_index=False).agg(
            p_new=("cents", lambda s: int(s[d.loc[s.index, "is_new"] == 1].sum())),
            p_all=("cents", "sum"),
        )
        g["month"] = g["month"].dt.to_timestamp().astype("datetime64[us]")
        return g.astype({"p_new": "int64", "p_all": "int64"})

    parts = bucketed_group_agg(ds, ["o_custkey"], final, n_buckets=32)

    def month_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("month", as_index=False).agg(new_c=("p_new", "sum"), all_c=("p_all", "sum"))
        return pd.DataFrame(
            {
                "month": g["month"].astype("datetime64[us]"),
                "new_revenue": round_away(g["new_c"].to_numpy(dtype=np.float64) / 100.0, 2),
                "repeat_revenue": round_away(
                    (g["all_c"] - g["new_c"]).to_numpy(dtype=np.float64) / 100.0, 2
                ),
            }
        )

    return bucketed_group_agg(parts, ["month"], month_final, n_buckets=8)


def q173_net_revenue_monthly(sf_dir: str) -> "ray.data.Dataset":
    """Monthly NET revenue: Σ extendedprice·(1−discount)·(1+tax) by ship
    month — q01's classic aggregate re-based to a calendar axis, with the
    float-summation trap removed: price (cents), discount and tax (both
    2dp) all live on integer grids, so each row's term is the exact int64
    micro-unit product cents·(100−d)·(100+t) and the monthly sums are
    order-invariant integers until ONE final division by 10^6 — a money
    pipeline at 100 TB cannot reconcile otherwise. Per-batch month
    partials ride a calendar-bounded exchange."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice", "l_discount", "l_tax"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        d100 = np.rint(df["l_discount"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        t100 = np.rint(df["l_tax"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        micro = cents * (100 - d100) * (100 + t100)
        month = df["l_shipdate"].astype("datetime64[us]").dt.to_period("M").dt.to_timestamp()
        g = pd.DataFrame({"month": month.astype("datetime64[us]"), "micro": micro})
        out = g.groupby("month", as_index=False).agg(p_micro=("micro", "sum"), p_n=("micro", "size"))
        return out.astype({"p_micro": "int64", "p_n": "int64"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("month", as_index=False).agg(micro=("p_micro", "sum"), n=("p_n", "sum"))
        return pd.DataFrame(
            {
                "month": g["month"].astype("datetime64[us]"),
                "n_items": g["n"].astype("int64"),
                "net_revenue": round_away(g["micro"].to_numpy(dtype=np.float64) / 1e6, 2),
            }
        )

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["month"],
        final,
        n_buckets=8,
    )


def q176_return_rate_wilson(sf_dir: str, z: float = 1.96) -> "ray.data.Dataset":
    """Monthly return rate with a Wilson score confidence interval — the
    proportion-with-uncertainty shape every quality dashboard needs (a raw
    rate over 50 rows and over 50,000 rows read the same; the Wilson band
    says which you can trust). One calendar-bounded two-phase count of
    (returned, total) per ship month; the interval is the closed form
    (p + z²/2n ± z·sqrt(p(1−p)/n + z²/4n²)) / (1 + z²/n) evaluated from
    exact int64 counts with the identical expression in the SQL oracle."""
    ds = read_table(sf_dir, "lineitem", columns=["l_shipdate", "l_returnflag"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        month = df["l_shipdate"].astype("datetime64[us]").dt.to_period("M").dt.to_timestamp()
        d = pd.DataFrame(
            {
                "month": month.astype("datetime64[us]"),
                "ret": (df["l_returnflag"] == "R").astype("int64"),
            }
        )
        return d.groupby("month", as_index=False).agg(p_n=("ret", "size"), p_r=("ret", "sum"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("month", as_index=False).agg(n=("p_n", "sum"), r=("p_r", "sum"))
        n = g["n"].to_numpy(dtype=np.float64)
        p = g["r"].to_numpy(dtype=np.float64) / n
        z2 = z * z
        center = (p + z2 / (2.0 * n)) / (1.0 + z2 / n)
        half = (
            z
            * np.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
            / (1.0 + z2 / n)
        )
        return pd.DataFrame(
            {
                "month": g["month"].astype("datetime64[us]"),
                "n_items": g["n"].astype("int64"),
                "n_returned": g["r"].astype("int64"),
                "rate": round_away(p, 6),
                "wilson_lo": round_away(center - half, 6),
                "wilson_hi": round_away(center + half, 6),
            }
        )

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["month"],
        final,
        n_buckets=8,
    )


def q179_segment_priority_residuals(sf_dir: str) -> "ray.data.Dataset":
    """Standardized residuals (o−e)/sqrt(e) for the customer-segment x
    order-priority contingency — WHERE an association lives, which the
    summary statistics (q111 chi², q174 Cramér's V) deliberately compress
    away; residuals beyond ±2 flag the individual cells driving a drift
    alarm. Broadcast custkey→segment map (q03's join shape), one bounded
    grid count exchange, expected counts from exact int64 marginals and a
    per-cell closed form (no cross-cell float accumulation anywhere)."""
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    ck = cust.column("c_custkey").to_numpy()
    order = np.argsort(ck)
    segs = np.asarray(cust.column("c_mktsegment").to_pylist(), dtype=object)[order]
    ref = ray.put((ck[order], segs))

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, s = get_broadcast(ref)
        ix = np.clip(np.searchsorted(keys, df["o_custkey"].to_numpy()), 0, len(keys) - 1)
        d = pd.DataFrame({"segment": s[ix], "priority": df["o_orderpriority"]})
        return d.groupby(["segment", "priority"], as_index=False).size().rename(
            columns={"size": "p_n"}
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["segment", "priority"], as_index=False)["p_n"].sum()
        return g.rename(columns={"p_n": "observed"}).astype({"observed": "int64"})

    cells = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["segment", "priority"],
        final,
        n_buckets=4,
    ).to_pandas()
    piv = cells.pivot_table(
        index="segment", columns="priority", values="observed", fill_value=0
    ).astype("int64")
    obs = piv.to_numpy(dtype=np.float64)
    n = float(obs.sum())
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    exp = row * col / n
    resid = (obs - exp) / np.sqrt(exp)
    out = piv.stack().reset_index()
    out.columns = ["segment", "priority", "observed"]
    out["expected"] = round_away(exp.ravel(), 4)
    out["residual"] = round_away(resid.ravel(), 4)
    return out.astype({"observed": "int64"})


def q180_clv_quartile_migration(sf_dir: str) -> pd.DataFrame:
    """Customer-value migration matrix: each customer's spend quartile in
    their FIRST 365 days vs their SECOND — the cohort-quality question
    behind every LTV model (do cheap acquisitions grow, do whales stay?).
    One custkey-bucket shuffle co-locates orders; in-bucket two exact
    cents sums per customer (year-1 / year-2 of their own lifetime);
    quartile thresholds per period come from value-count histograms over
    the customer-sized aggregate (quantile_disc rank rule, q154's helper —
    q141 micro-bin selection is the cluster path) and the 4x4 matrix is a
    bounded count. Customers with no year-2 order form the 'churned'
    column, which is the most important cell of all."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "o_custkey": df["o_custkey"],
                "day": df["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64),
                "cents": np.rint(df["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(
                    np.int64
                ),
            }
        )
        first = d.groupby("o_custkey")["day"].transform("min")
        off = d["day"] - first
        d["y1"] = np.where(off < 365, d["cents"], 0)
        d["y2"] = np.where((off >= 365) & (off < 730), d["cents"], 0)
        d["has2"] = (off >= 365).astype("int64") * ((off < 730).astype("int64"))
        g = d.groupby("o_custkey", as_index=False).agg(
            first_day=("day", "min"), y1=("y1", "sum"), y2=("y2", "sum"), n2=("has2", "sum")
        )
        return g.astype({"first_day": "int64", "y1": "int64", "y2": "int64", "n2": "int64"})

    # NOTE: per-batch partials are NOT correct here (first_day must be the
    # customer's GLOBAL min), so the raw 3 columns ride the bucket shuffle
    # and per_cust runs once per bucket on co-located customers.
    agg = (
        bucketed_group_agg(ds, ["o_custkey"], per_cust, n_buckets=32)
        .to_pandas()
    )
    thresholds = {}
    for colname in ("y1", "y2"):
        vals = agg.loc[agg[colname] > 0, colname] if colname == "y2" else agg[colname]
        h = (
            pd.DataFrame({colname: vals})
            .groupby(colname, as_index=False)
            .size()
            .sort_values(colname, kind="mergesort")
        )
        # degenerate cohort: nobody has year-2 revenue -> no thresholds
        # (the oracle's quantile over the empty subset is NULL); every
        # customer lands in the churned column below, matching the SQL
        thresholds[colname] = (
            _disc_quantiles_from_hist(
                h[colname].to_numpy(dtype=np.int64),
                h["size"].to_numpy(dtype=np.int64),
                [0.25, 0.5, 0.75],
            )
            if len(h)
            else None
        )
    t1 = thresholds["y1"]
    t2 = thresholds["y2"]
    if t1 is None:  # no orders at all
        return pd.DataFrame(
            {
                "q_year1": pd.Series([], dtype="int64"),
                "q_year2": pd.Series([], dtype="int64"),
                "n_customers": pd.Series([], dtype="int64"),
            }
        )
    v1 = agg["y1"].to_numpy(dtype=np.int64)
    v2 = agg["y2"].to_numpy(dtype=np.int64)
    q1 = 1 + (v1 > t1[0]).astype(np.int64) + (v1 > t1[1]) + (v1 > t1[2])
    if t2 is None:
        q2 = np.zeros(len(v2), dtype=np.int64)  # all churned
    else:
        q2 = np.where(
            v2 <= 0,
            0,  # churned: no year-2 revenue
            1 + (v2 > t2[0]).astype(np.int64) + (v2 > t2[1]) + (v2 > t2[2]),
        )
    out = (
        pd.DataFrame({"q_year1": q1, "q_year2": q2})
        .groupby(["q_year1", "q_year2"], as_index=False)
        .size()
        .rename(columns={"size": "n_customers"})
    )
    return out.astype({"q_year1": "int64", "q_year2": "int64", "n_customers": "int64"})


def q185_quantity_discount_curve(sf_dir: str) -> "ray.data.Dataset":
    """Volume-discount curve: mean discount at each order quantity — the
    pricing-policy readback (does the discount schedule actually slope?).
    Quantity is a closed small-int vocabulary, so (qty, Σd100, n) partials
    are schema-bounded and exact; one tiny exchange, one division."""
    ds = read_table(sf_dir, "lineitem", columns=["l_quantity", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "qty": df["l_quantity"].to_numpy(dtype=np.float64).astype(np.int64),
                "d100": np.rint(df["l_discount"].to_numpy(dtype=np.float64) * 100).astype(
                    np.int64
                ),
            }
        )
        return d.groupby("qty", as_index=False).agg(p_s=("d100", "sum"), p_n=("d100", "size"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("qty", as_index=False).agg(s=("p_s", "sum"), n=("p_n", "sum"))
        return pd.DataFrame(
            {
                "qty": g["qty"].astype("int64"),
                "n_items": g["n"].astype("int64"),
                "avg_discount": round_away(
                    (g["s"].to_numpy(dtype=np.float64) / 100.0)
                    / g["n"].to_numpy(dtype=np.float64),
                    6,
                ),
            }
        )

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["qty"],
        final,
        n_buckets=4,
    )


def q186_leadtime_p90_matrix(sf_dir: str) -> "ray.data.Dataset":
    """Fulfillment SLA matrix: p90 order-to-ship lead time per (priority,
    order month) — q151's mean/max sharpened to the tail percentile the
    SLA is written against, on the seasonality axis. The join reuses
    q151's one orderkey-bucketed shuffle, but the merge_fn now emits
    (priority, month, lead_days)→count HISTOGRAM partials (day-grid
    bounded), and the exact interpolated p90 comes off each cell's merged
    histogram with the bitwise quantile rule."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"o_orderkey": "l_orderkey"})

    orders = orders.map_batches(rename, batch_format="pandas", batch_size=65536)

    def merge_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        m = left.merge(right, on="l_orderkey")
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "priority": pd.Series([], dtype="object"),
                    "month": pd.Series([], dtype="datetime64[us]"),
                    "days": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        days = (
            m["l_shipdate"].to_numpy().astype("datetime64[D]").astype("int64")
            - m["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64")
        )
        month = (
            m["o_orderdate"].astype("datetime64[us]").dt.to_period("M").dt.to_timestamp()
        )
        d = pd.DataFrame(
            {
                "priority": m["o_orderpriority"],
                "month": month.astype("datetime64[us]"),
                "days": days,
            }
        )
        g = d.groupby(["priority", "month", "days"], as_index=False).size()
        return g.rename(columns={"size": "cnt"}).astype({"days": "int64", "cnt": "int64"})

    parts = bucketed_join(li, orders, on="l_orderkey", n_buckets=32, merge_fn=merge_fn)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["priority", "month", "days"], as_index=False)["cnt"].sum()
        out = []
        for (prio, month), gg in g.sort_values(
            ["priority", "month", "days"], kind="mergesort"
        ).groupby(["priority", "month"], sort=False):
            v = gg["days"].to_numpy(dtype=np.float64)
            c = gg["cnt"].to_numpy(dtype=np.int64)
            out.append(
                {
                    "priority": prio,
                    "month": month,
                    "n_items": int(c.sum()),
                    "p90_days": float(round_away(np.array([_wq_interp(v, c, 0.9)]), 4)[0]),
                }
            )
        res = pd.DataFrame(out)
        res["month"] = res["month"].astype("datetime64[us]")
        return res.astype({"n_items": "int64"})

    return bucketed_group_agg(parts, ["priority", "month"], final, n_buckets=8)


def q187_theil_index(sf_dir: str) -> pd.DataFrame:
    """Theil T inequality index of customer spend per market segment — the
    decomposable cousin of q144's Gini (T sums across subgroups, so a
    cluster job can compute region/segment terms independently). Shape:
    orders reduce to per-customer exact cents through one custkey-bucket
    two-phase with the segment stamped from the broadcast customer map
    inside the merge; customers then collapse to per-(segment, spend)
    value-count HISTOGRAMS (segment × distinct-value bounded — never one
    row per customer leaves the bucket), and the driver evaluates
    T = Σ c·(x/μ)·ln(x/μ) / n off the merged histogram. μ is the exact
    int64 cents total over n, so both oracle sides divide identical
    integers; the ln-sum is order-insensitive to ~1e-12 relative, absorbed
    by the 6-decimal round (the q157 correlation convention)."""
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    ck = cust.column("c_custkey").to_numpy()
    order_k = np.argsort(ck)
    seg = np.asarray(cust.column("c_mktsegment").to_pylist(), dtype=object)[order_k]
    ref = ray.put((ck[order_k], seg))

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "o_custkey": df["o_custkey"],
                "cents": np.rint(
                    df["o_totalprice"].to_numpy(dtype=np.float64) * 100
                ).astype(np.int64),
            }
        )
        return d.groupby("o_custkey", as_index=False)["cents"].sum()

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        keys, segs = get_broadcast(ref)
        g = df.groupby("o_custkey", as_index=False)["cents"].sum()
        g["segment"] = segs[np.searchsorted(keys, g["o_custkey"].to_numpy(dtype=np.int64))]
        h = g.groupby(["segment", "cents"], as_index=False).size().rename(columns={"size": "cnt"})
        return h.astype({"cents": "int64", "cnt": "int64"})

    merged = (
        bucketed_group_agg(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["o_custkey"],
            hist,
            n_buckets=32,
        )
        .to_pandas()
        .groupby(["segment", "cents"], as_index=False)["cnt"]
        .sum()
    )
    out = []
    for s, g in merged.groupby("segment", sort=True):
        x = g["cents"].to_numpy(dtype=np.float64)
        c = g["cnt"].to_numpy(dtype=np.float64)
        n = c.sum()
        mu = (g["cents"].to_numpy(dtype=np.int64) * g["cnt"].to_numpy(dtype=np.int64)).sum() / n
        r = x / mu
        out.append(
            {
                "segment": s,
                "n_customers": int(n),
                "theil": float(round_away(np.array([(c * r * np.log(r)).sum() / n]), 6)[0]),
            }
        )
    if not out:  # no orders at all: typed empty frame, matching the oracle
        return pd.DataFrame(
            {
                "segment": pd.Series([], dtype="object"),
                "n_customers": pd.Series([], dtype="int64"),
                "theil": pd.Series([], dtype="float64"),
            }
        )
    return pd.DataFrame(out).astype({"n_customers": "int64"})


def q188_assoc_rules(sf_dir: str, min_support: int = 2, k: int = 50) -> pd.DataFrame:
    """Directed association rules antecedent→consequent over co-purchase
    pairs: confidence n_ab/n_a (how often a basket holding the antecedent
    also holds the consequent) next to q158's symmetric lift — the actual
    recommender primitive. Reuses the q158 machinery end to end: distinct
    (order, part) pairs, one orderkey-bucket expansion for the a<b pair
    counts, and the PER-BUCKET marginal partials (per-part distinct-order
    counts + the sentinel distinct-order total riding the same frame) that
    replaced the round-3 single-batch coalesce. Each undirected pair then
    emits both directions into a streaming confidence map; top-k rides the
    per-batch-top-k under (confidence desc, antecedent, consequent).
    Confidence and lift are double ratios of exact int64 counts — bitwise
    equal on both oracle sides."""
    pair_counts, ref = _copurchase_counts(sf_dir)

    def rules_topk(df: pd.DataFrame) -> pd.DataFrame:
        keys, na, n_tot = get_broadcast(ref)
        d = df.loc[df["n_ab"] >= min_support]
        cols = {
            "antecedent": "int64",
            "consequent": "int64",
            "n_ab": "int64",
            "confidence": "float64",
            "lift": "float64",
        }
        if len(d) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
        both = pd.concat(
            [
                d.rename(columns={"part_a": "antecedent", "part_b": "consequent"}),
                d.rename(columns={"part_b": "antecedent", "part_a": "consequent"}),
            ],
            ignore_index=True,
        )
        ia = np.searchsorted(keys, both["antecedent"].to_numpy(dtype=np.int64))
        ic = np.searchsorted(keys, both["consequent"].to_numpy(dtype=np.int64))
        nab = both["n_ab"].to_numpy(dtype=np.float64)
        both["confidence"] = round_away(nab / na[ia].astype(np.float64), 6)
        both["lift"] = round_away(
            nab * float(n_tot) / (na[ia].astype(np.float64) * na[ic].astype(np.float64)), 6
        )
        return both.sort_values(
            ["confidence", "antecedent", "consequent"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(k)[list(cols)]

    cand = pair_counts.map_batches(rules_topk, batch_format="pandas", batch_size=65536).to_pandas()
    return (
        cand.sort_values(
            ["confidence", "antecedent", "consequent"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        .head(k)
        .reset_index(drop=True)
    )


def q195_anova_f(sf_dir: str) -> pd.DataFrame:
    """One-way ANOVA F statistic of event value across event types — the
    'does the type matter at all' gate before any per-type modeling.
    Values quantize to exact int64 centi-units (the engine-wide money
    convention; bound: Σv² needs v·√rows < 3e9·√1e18), so the per-type
    (n, Σv, Σv²) partials are schema-bounded and EXACT through one tiny
    exchange; F assembles from identical integer sums on both oracle
    sides via the textbook Σs²/n − S²/N decomposition."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.rint(df["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        d = pd.DataFrame({"event_type": df["event_type"], "v": v, "v2": v * v})
        return d.groupby("event_type", as_index=False).agg(
            p_n=("v", "size"), p_s=("v", "sum"), p_q=("v2", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False).agg(
            n=("p_n", "sum"), s=("p_s", "sum"), q=("p_q", "sum")
        )
        return g

    groups = (
        bucketed_group_agg(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["event_type"],
            final,
            n_buckets=4,
        )
        .to_pandas()
        .groupby("event_type", as_index=False)
        .agg(n=("n", "sum"), s=("s", "sum"), q=("q", "sum"))
        .sort_values("event_type", kind="mergesort")
    )
    k = len(groups)
    n_total = int(groups["n"].sum())
    S = float(groups["s"].sum())
    Q = float(groups["q"].sum())
    within = float(
        (groups["s"].to_numpy(dtype=np.float64) ** 2 / groups["n"].to_numpy(dtype=np.float64)).sum()
    )
    if k > 1 and n_total > k:
        ssb = within - S * S / n_total
        ssw = Q - within
        f = (ssb / (k - 1)) / (ssw / (n_total - k)) if ssw > 0 else float("nan")
    else:  # degenerate: <2 groups (or empty input) has no between-term
        f = float("nan")
    return pd.DataFrame(
        {
            "k_groups": pd.array([k], dtype="int64"),
            "n_total": pd.array([n_total], dtype="int64"),
            "f_stat": [round_away(np.array([f]), 6)[0]],
        }
    )


def q196_poisson_dispersion(sf_dir: str) -> pd.DataFrame:
    """Poisson dispersion (variance-to-mean ratio of DAILY counts) per
    event type: ≈1 is Poisson arrivals, ≫1 is burst/campaign days — the
    distributional sibling of q119's seasonality strength. Day-level
    counts reduce through ONE (type, day)-bucket two-phase (a day's rows
    land in one bucket, so counts are exact); the day rows are
    types×days-bounded and collapse to per-type (n_days, Σc, Σc²)
    partials. The ratio assembles from exact integers with the explicit
    Σc²/n − (Σc/n)² expression on BOTH sides (never the built-in
    var_pop, whose single-pass update would differ in the last bits)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64),
            }
        )
        g = d.groupby(["event_type", "day"], as_index=False).size().rename(columns={"size": "c"})
        return g.astype({"day": "int64", "c": "int64"})

    def per_day(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "day"], as_index=False)["c"].sum()
        c = g["c"].to_numpy(dtype=np.int64)
        d = pd.DataFrame({"event_type": g["event_type"], "c": c, "c2": c * c})
        return d.groupby("event_type", as_index=False).agg(
            p_days=("c", "size"), p_s=("c", "sum"), p_q=("c2", "sum")
        )

    merged = (
        bucketed_group_agg(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["event_type", "day"],
            per_day,
            n_buckets=16,
        )
        .to_pandas()
        .groupby("event_type", as_index=False)
        .agg(n_days=("p_days", "sum"), s=("p_s", "sum"), q=("p_q", "sum"))
    )
    n = merged["n_days"].to_numpy(dtype=np.float64)
    s = merged["s"].to_numpy(dtype=np.float64)
    q = merged["q"].to_numpy(dtype=np.float64)
    mean = s / n
    disp = (q / n - mean * mean) / mean
    out = pd.DataFrame(
        {
            "event_type": merged["event_type"],
            "n_days": merged["n_days"].astype("int64"),
            "mean_daily": round_away(mean, 4),
            "dispersion": round_away(disp, 6),
        }
    )
    return out


def q198_weekday_chi2(sf_dir: str) -> pd.DataFrame:
    """Weekday-uniformity chi-square of order volume: per ISO weekday the
    observed count, the uniform expectation N/7, and the (O−E)²/E term —
    the one-glance answer to 'is ordering calendar-flat?'. Counts are a
    7-bin schema-bounded partial sum (no shuffle to speak of); expected
    and the chi-square term are doubles of exact integers with identical
    expressions on both sides."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dow = (
            pd.to_datetime(df["o_orderdate"]).dt.dayofweek.to_numpy(dtype=np.int64) + 1
        )  # 1=Mon ... 7=Sun == DuckDB isodow
        d = pd.DataFrame({"isodow": dow})
        return d.groupby("isodow", as_index=False).size().rename(columns={"size": "n"})

    merged = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("isodow", as_index=False)["n"]
        .sum()
    )
    n_total = int(merged["n"].sum())
    e = n_total / 7.0
    o = merged["n"].to_numpy(dtype=np.float64)
    out = pd.DataFrame(
        {
            "isodow": merged["isodow"].astype("int64"),
            "n_orders": merged["n"].astype("int64"),
            "expected": round_away(np.full(len(merged), e), 4),
            "chi2_term": round_away((o - e) ** 2 / e, 6),
        }
    )
    return out


def q200_part_affinity_jaccard(sf_dir: str, min_support: int = 2, k: int = 50) -> pd.DataFrame:
    """Part-affinity Jaccard: |orders(a)∩orders(b)| / |orders(a)∪orders(b)|
    for co-purchased part pairs — the symmetric, marginal-normalized
    affinity that (unlike q158's lift) is bounded in [0,1] and immune to
    the rare-pair lift blow-up. Third consumer of _copurchase_counts: pair
    counts and exact marginals reduce once, the Jaccard is a double ratio
    of exact int64 counts, top-k rides the per-batch-top-k under
    (jaccard desc, part_a, part_b)."""
    pair_counts, ref = _copurchase_counts(sf_dir)

    def jac_topk(df: pd.DataFrame) -> pd.DataFrame:
        keys, na, _ = get_broadcast(ref)
        d = df.loc[df["n_ab"] >= min_support].copy()
        if len(d) == 0:
            return pd.DataFrame(
                {
                    "part_a": pd.Series([], dtype="int64"),
                    "part_b": pd.Series([], dtype="int64"),
                    "n_ab": pd.Series([], dtype="int64"),
                    "jaccard": pd.Series([], dtype="float64"),
                }
            )
        ia = np.searchsorted(keys, d["part_a"].to_numpy(dtype=np.int64))
        ib = np.searchsorted(keys, d["part_b"].to_numpy(dtype=np.int64))
        nab = d["n_ab"].to_numpy(dtype=np.float64)
        d["jaccard"] = round_away(
            nab / (na[ia].astype(np.float64) + na[ib].astype(np.float64) - nab), 6
        )
        return d.sort_values(
            ["jaccard", "part_a", "part_b"], ascending=[False, True, True], kind="mergesort"
        ).head(k)

    cand = pair_counts.map_batches(jac_topk, batch_format="pandas", batch_size=65536).to_pandas()
    return (
        cand.sort_values(
            ["jaccard", "part_a", "part_b"], ascending=[False, True, True], kind="mergesort"
        )
        .head(k)
        .reset_index(drop=True)
    )


def q201_event_hour_heatmap(sf_dir: str) -> pd.DataFrame:
    """(ISO weekday × hour) event-volume heatmap with each cell's share of
    total — the ops-calendar view q183's hourly p95 sits behind. A 168-cell
    schema-bounded partial sum; share is a double ratio of exact counts."""
    ds = read_table(sf_dir, "events", columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(df["ts"])
        d = pd.DataFrame(
            {
                "isodow": ts.dt.dayofweek.to_numpy(dtype=np.int64) + 1,
                "hour": ts.dt.hour.to_numpy(dtype=np.int64),
            }
        )
        return d.groupby(["isodow", "hour"], as_index=False).size().rename(columns={"size": "n"})

    merged = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["isodow", "hour"], as_index=False)["n"]
        .sum()
    )
    total = int(merged["n"].sum())
    merged["share"] = round_away(merged["n"].to_numpy(dtype=np.float64) / total, 6)
    return merged.rename(columns={"n": "n_events"}).astype(
        {"isodow": "int64", "hour": "int64", "n_events": "int64"}
    )


def q203_l_diversity(sf_dir: str) -> pd.DataFrame:
    """l-diversity audit over the customer table (k-anonymity's q142
    sibling): per quasi-identifier group (mktsegment, nationkey), the
    group size k AND the number of distinct sensitive values l (account
    balance in exact cents) — a group with small l leaks its members'
    attribute even when k is large. Per-batch distinct
    (segment, nation, cents) triples collapse before ONE group-key-bucket
    shuffle; in-bucket the group owns all its rows, so k and l are exact;
    output is |segments|×|nations| bounded."""
    ds = read_table(
        sf_dir, "customer", columns=["c_mktsegment", "c_nationkey", "c_acctbal"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "segment": df["c_mktsegment"],
                "nationkey": df["c_nationkey"].astype("int64"),
                "cents": np.rint(
                    df["c_acctbal"].to_numpy(dtype=np.float64) * 100
                ).astype(np.int64),
            }
        )
        g = d.groupby(["segment", "nationkey"], as_index=False).agg(
            p_k=("cents", "size")
        )
        dd = d.drop_duplicates()
        dd["p_k"] = 0  # distinct rows carry no size; sizes ride the p_k rows
        return pd.concat([g.assign(cents=np.int64(0), _kind=1),
                          dd.assign(_kind=0)], ignore_index=True)[
            ["segment", "nationkey", "cents", "p_k", "_kind"]
        ].astype({"cents": "int64", "p_k": "int64", "_kind": "int64"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.loc[df["_kind"] == 1].groupby(
            ["segment", "nationkey"], as_index=False
        )["p_k"].sum()
        lvals = (
            df.loc[df["_kind"] == 0]
            .drop_duplicates(["segment", "nationkey", "cents"])
            .groupby(["segment", "nationkey"], as_index=False)
            .size()
            .rename(columns={"size": "l_distinct"})
        )
        out = sizes.merge(lvals, on=["segment", "nationkey"])
        return out.rename(columns={"p_k": "k_size"}).astype(
            {"k_size": "int64", "l_distinct": "int64"}
        )

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["segment", "nationkey"],
        final,
        n_buckets=8,
    )


def q207_hill_tail_index(sf_dir: str, tail_q: float = 0.95) -> pd.DataFrame:
    """Hill estimator of the order-value tail exponent: α =
    n_tail / Σ ln(x/xmin) over the top (1−q) of order totals — the
    heavy-tail readout that says whether q144's Gini comes from a power
    law or a lognormal-ish body. ONE value-count histogram reduce
    (distinct-cents bounded) serves both the discrete xmin threshold and
    the tail ln-sum — the tail never leaves the histogram. Ratios are of
    exact int64 cents, ln applied per distinct value with the histogram
    weight; the oracle evaluates the identical per-row form (sum-order
    wobble far under the 6-decimal round)."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        return pd.DataFrame({"cents": cents}).groupby("cents", as_index=False).size().rename(
            columns={"size": "cnt"}
        )

    hist = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("cents", as_index=False)["cnt"]
        .sum()
        .sort_values("cents", kind="mergesort")
    )
    vals = hist["cents"].to_numpy(dtype=np.int64)
    cnts = hist["cnt"].to_numpy(dtype=np.int64)
    xmin = _disc_quantiles_from_hist(vals, cnts, [tail_q])[0]
    tail = vals > xmin
    n_tail = int(cnts[tail].sum())
    lnsum = float(
        (cnts[tail].astype(np.float64) * np.log(vals[tail].astype(np.float64) / xmin)).sum()
    )
    alpha = n_tail / lnsum if lnsum > 0 else float("nan")
    return pd.DataFrame(
        {
            "xmin_cents": pd.array([int(xmin)], dtype="int64"),
            "n_tail": pd.array([n_tail], dtype="int64"),
            "alpha": [float(round_away(np.array([alpha]), 6)[0])],
        }
    )


def q209_price_ending_bias(sf_dir: str) -> pd.DataFrame:
    """Round-number pricing audit: the share of order totals whose cents
    component ends in .00 / .95 / .99 against the ~1% uniform baseline —
    charm-pricing detection as a 100-cell exact count. Per-batch
    (cents mod 100) partial counts, one tiny exchange, shares as double
    ratios of exact counts."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        d = pd.DataFrame({"ending": cents % 100})
        return d.groupby("ending", as_index=False).size().rename(columns={"size": "n"})

    merged = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("ending", as_index=False)["n"]
        .sum()
    )
    total = int(merged["n"].sum())

    def share(e: int) -> tuple[int, float]:
        row = merged.loc[merged["ending"] == e, "n"]
        n = int(row.iloc[0]) if len(row) else 0
        return n, float(round_away(np.array([n / total]), 6)[0])

    n00, s00 = share(0)
    n95, s95 = share(95)
    n99, s99 = share(99)
    return pd.DataFrame(
        {
            "n_orders": pd.array([total], dtype="int64"),
            "n_00": pd.array([n00], dtype="int64"),
            "share_00": [s00],
            "n_95": pd.array([n95], dtype="int64"),
            "share_95": [s95],
            "n_99": pd.array([n99], dtype="int64"),
            "share_99": [s99],
        }
    )


def q210_monthly_supplier_hhi(sf_dir: str) -> "ray.data.Dataset":
    """Supply-concentration TREND: the supplier HHI of shipped quantity
    per ship month — q162's point-in-time risk screen on the time axis
    (a rising curve is consolidation; one month ≈ 1.0 is a single-source
    exposure window). (month, supplier) integer-quantity partials ride
    one bounded exchange; the index assembles from EXACT int64 operands
    with a single final division, so iteration order cannot wiggle either
    oracle side."""
    ds = read_table(sf_dir, "lineitem", columns=["l_suppkey", "l_shipdate", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "month": pd.to_datetime(df["l_shipdate"])
                .dt.to_period("M")
                .dt.to_timestamp()
                .astype("datetime64[us]"),
                "l_suppkey": df["l_suppkey"].astype("int64"),
                "q": df["l_quantity"].to_numpy(dtype=np.float64).astype(np.int64),
            }
        )
        return d.groupby(["month", "l_suppkey"], as_index=False)["q"].sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["month", "l_suppkey"], as_index=False)["q"].sum()
        out = []
        for m, grp in g.groupby("month"):
            qi = grp["q"].to_numpy(dtype=np.int64)
            tot = int(qi.sum())
            num = int((qi.astype(object) ** 2).sum())  # exact python ints
            out.append(
                {
                    "month": m,
                    "n_suppliers": int(len(qi)),
                    "hhi": float(round_away(np.array([num / (tot * tot)]), 6)[0]),
                }
            )
        res = pd.DataFrame(out)
        res["month"] = res["month"].astype("datetime64[us]")
        return res.astype({"n_suppliers": "int64"})

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["month"],
        final,
        n_buckets=8,
    )


def q211_discount_return_rate(sf_dir: str) -> "ray.data.Dataset":
    """Return rate by discount band: does discounting correlate with
    returns (the margin-vs-quality tension, q176's Wilson rate cut along
    the pricing axis)? Discount is a closed 2dp vocabulary, so
    (band, returned, total) partials are schema-bounded; the rate is one
    double ratio of exact counts per band."""
    ds = read_table(sf_dir, "lineitem", columns=["l_discount", "l_returnflag"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "d100": np.rint(df["l_discount"].to_numpy(dtype=np.float64) * 100).astype(
                    np.int64
                ),
                "ret": (df["l_returnflag"] == "R").astype("int64"),
            }
        )
        return d.groupby("d100", as_index=False).agg(p_n=("ret", "size"), p_r=("ret", "sum"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("d100", as_index=False).agg(n=("p_n", "sum"), r=("p_r", "sum"))
        return pd.DataFrame(
            {
                "d100": g["d100"].astype("int64"),
                "n_items": g["n"].astype("int64"),
                "n_returned": g["r"].astype("int64"),
                "return_rate": round_away(
                    g["r"].to_numpy(dtype=np.float64) / g["n"].to_numpy(dtype=np.float64), 6
                ),
            }
        )

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["d100"],
        final,
        n_buckets=4,
    )


def q212_price_digit_benford(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit audit of order totals — the synthetic-data /
    fabricated-invoice screen (organic multi-scale amounts follow
    log10(1+1/d); a flat or spiked first-digit histogram flags generated
    or clamped values; expectations in the docstring only — the output is
    the exact observed histogram, so no transcendental constant has to
    agree bit-wise across oracle sides). Per-batch first-digit partial
    counts (repeated integer //10 on int64 cents — no float log), one
    9-cell exchange, shares as double ratios of exact counts."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        while (c >= 10).any():
            c[c >= 10] //= 10
        d = pd.DataFrame({"digit": c})
        return d.groupby("digit", as_index=False).size().rename(columns={"size": "n"})

    merged = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("digit", as_index=False)["n"]
        .sum()
    )
    total = int(merged["n"].sum())
    return pd.DataFrame(
        {
            "digit": merged["digit"].astype("int64"),
            "n": merged["n"].astype("int64"),
            "share": round_away(merged["n"].to_numpy(dtype=np.float64) / total, 6),
        }
    )


def q215_segment_value_cv(sf_dir: str) -> "ray.data.Dataset":
    """Order-value coefficient of variation per market segment — the
    basket-size VOLATILITY read next to q03's totals (a high-CV segment
    needs risk-adjusted credit terms even when its mean looks healthy).
    q03's broadcast custkey→segment join feeds (n, Σc, Σc²) partials in
    exact int64 CENTS (c² per order ≤ ~1e16 · batch rows keeps partial
    sums inside int64 at fixture scale; the Python-int final merge is
    arbitrary-precision, matching the oracle's HUGEINT, so no wrap can
    survive to the output); σ and CV evaluate the q189/q196 explicit
    double expression identically on both sides, with the variance
    clamped at 0 (greatest) against −ε float cancellation."""
    import math

    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    order_ck = np.argsort(cust.column("c_custkey").to_numpy())
    keys = cust.column("c_custkey").to_numpy()[order_ck]
    segs = np.asarray(cust.column("c_mktsegment").to_pylist(), dtype=object)[order_ck]
    ref = ray.put((keys, segs))

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = ds.map_batches(_segment_join_batch, fn_kwargs={"ref": ref}, batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        d = pd.DataFrame({"seg": df["c_mktsegment"], "c": c, "c2": c * c})
        g = d.groupby("seg", as_index=False).agg(
            p_n=("c", "size"), p_s=("c", "sum"), p_q=("c2", "sum")
        )
        return g.astype({"p_n": "int64", "p_s": "int64", "p_q": "int64"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for seg, g in df.groupby("seg"):
            n = int(g["p_n"].sum())
            s = int(sum(int(x) for x in g["p_s"]))
            q = sum(int(x) for x in g["p_q"])  # arbitrary-precision merge
            sn = float(s) / n
            sd = math.sqrt(max(float(q) / n - sn * sn, 0.0))
            rows.append(
                {
                    "c_mktsegment": seg,
                    "n_orders": n,
                    "mean_value": float(round_away(np.array([sn / 100.0]), 4)[0]),
                    "cv": float(round_away(np.array([sd / sn]), 6)[0]),
                }
            )
        out = pd.DataFrame(rows)
        return out.astype({"n_orders": "int64"})

    # batch_size bounds the int64 partial: max cents² ≈ 3.6e15 × 1024 rows
    # ≈ 3.7e18 < 2^63 with 2.5× headroom; the cross-batch merge is Python-int
    partials = joined.map_batches(partial, batch_format="pandas", batch_size=1024)
    return bucketed_group_agg(partials, ["seg"], final, n_buckets=4)


def q219_brand_price_spread(sf_dir: str) -> "ray.data.Dataset":
    """Catalog-pricing spread per brand — min/max/mean retail price and
    the max/min spread ratio, the assortment-consistency audit (a brand
    whose spread ratio explodes mixes SKU tiers that downstream price
    canonicalization must not average together). Exact int64 CENTS
    partials (n, Σc, min, max) per batch — min/max commute with the
    2dp-grid rint, so both oracle sides see identical integers — one
    brands-sized exchange; mean and ratio are double expressions of exact
    ints evaluated identically on both sides."""
    ds = read_table(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["p_retailprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        d = pd.DataFrame({"brand": df["p_brand"], "c": c})
        g = d.groupby("brand", as_index=False).agg(
            p_n=("c", "size"), p_s=("c", "sum"), p_min=("c", "min"), p_max=("c", "max")
        )
        return g.astype({"p_n": "int64", "p_s": "int64", "p_min": "int64", "p_max": "int64"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("brand", as_index=False).agg(
            n=("p_n", "sum"), s=("p_s", "sum"), mn=("p_min", "min"), mx=("p_max", "max")
        )
        return pd.DataFrame(
            {
                "p_brand": g["brand"],
                "n_parts": g["n"].astype("int64"),
                "min_price": round_away(g["mn"].to_numpy(dtype=np.float64) / 100.0, 2),
                "max_price": round_away(g["mx"].to_numpy(dtype=np.float64) / 100.0, 2),
                "mean_price": round_away(
                    (g["s"].to_numpy(dtype=np.float64) / g["n"].to_numpy(dtype=np.float64))
                    / 100.0,
                    4,
                ),
                "spread_ratio": round_away(
                    g["mx"].to_numpy(dtype=np.float64) / g["mn"].to_numpy(dtype=np.float64), 6
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["brand"], final, n_buckets=4)


def q220_monthly_return_share(sf_dir: str) -> "ray.data.Dataset":
    """Return-rate time series: the share of lineitems flagged 'R' per
    ship month — the quality-trend curve behind q211's discount-band
    snapshot (a rising monthly share is a fulfilment regression, visible
    months before it moves the aggregate). (month, returned, total)
    exact int64 partials, one calendar-sized exchange, share a double
    ratio of exact counts."""
    ds = read_table(sf_dir, "lineitem", columns=["l_shipdate", "l_returnflag"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "month": pd.to_datetime(df["l_shipdate"]).values.astype("datetime64[M]"),
                "r": (df["l_returnflag"] == "R").astype("int64"),
            }
        )
        g = d.groupby("month", as_index=False).agg(p_n=("r", "size"), p_r=("r", "sum"))
        return g.astype({"p_n": "int64", "p_r": "int64"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("month", as_index=False).agg(n=("p_n", "sum"), r=("p_r", "sum"))
        return pd.DataFrame(
            {
                "month": g["month"].astype("datetime64[us]"),
                "n_items": g["n"].astype("int64"),
                "n_returned": g["r"].astype("int64"),
                "return_share": round_away(
                    g["r"].to_numpy(dtype=np.float64) / g["n"].to_numpy(dtype=np.float64), 6
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["month"], final, n_buckets=4)


def q221_orders_per_customer_hist(sf_dir: str) -> "pd.DataFrame":
    """Orders-per-customer frequency-of-frequency histogram — the
    engagement-depth curve (how many customers ordered exactly k times),
    the relational sibling of the corpus hapax/Heaps line: a heavy k=1
    mass is an acquisition-led book, a fat tail is a repeat-purchase
    book. Per-batch custkey partials collapse before ONE custkey-bucket
    shuffle; per-customer totals become in-bucket count-of-counts
    partials, so the second exchange is bounded by max-orders-per-
    customer, not customers. Exact int64 throughout."""
    import pandas as pd

    ds = read_table(sf_dir, "orders", columns=["o_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).size().rename(columns={"size": "p_n"})
        return g.astype({"p_n": "int64"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        per_cust = df.groupby("o_custkey", as_index=False)["p_n"].sum()
        h = per_cust.groupby("p_n", as_index=False).size().rename(
            columns={"p_n": "n_orders", "size": "p_c"}
        )
        return h.astype({"n_orders": "int64", "p_c": "int64"})

    parts = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["o_custkey"],
        final,
        n_buckets=8,
    ).to_pandas()
    merged = parts.groupby("n_orders", as_index=False)["p_c"].sum()
    return pd.DataFrame(
        {
            "n_orders": merged["n_orders"].astype("int64"),
            "n_customers": merged["p_c"].astype("int64"),
        }
    ).sort_values("n_orders").reset_index(drop=True)


def q222_brand_discount_depth(sf_dir: str) -> "ray.data.Dataset":
    """Discount depth per brand — mean discount and the share of
    discounted lines, the promo-exposure screen that q211's return-rate
    bands condition on. The part dimension broadcasts ONCE as a sorted
    partkey→brand array pair (q03's join shape; at catalog sizes past
    ~1 GB/node the documented auto_join cutover swaps in the bucketed
    join); discounts live on the closed 2dp grid, so per-batch partials
    are exact int64 (n, Σ hundredths, n>0), one brands-sized exchange,
    and both oracle sides divide the same exact integers."""
    part = read_small(sf_dir, "part", columns=["p_partkey", "p_brand"])
    order_pk = np.argsort(part.column("p_partkey").to_numpy())
    pkeys = part.column("p_partkey").to_numpy()[order_pk]
    brands = np.asarray(part.column("p_brand").to_pylist(), dtype=object)[order_pk]
    ref = ray.put((pkeys, brands))

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        keys, brds = get_broadcast(ref)
        pk = t.column("l_partkey").to_numpy()
        idx = np.clip(np.searchsorted(keys, pk), 0, len(keys) - 1)
        hit = keys[idx] == pk
        dc = np.rint(
            t.column("l_discount").to_numpy(zero_copy_only=False)[hit] * 100
        ).astype(np.int64)
        d = pd.DataFrame(
            {
                "brand": brds[idx[hit]],
                "p_n": np.ones(len(dc), dtype=np.int64),
                "p_s": dc,
                "p_d": (dc > 0).astype(np.int64),
            }
        )
        g = d.groupby("brand", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("brand", as_index=False).agg(
            n=("p_n", "sum"), s=("p_s", "sum"), nd=("p_d", "sum")
        )
        return pd.DataFrame(
            {
                "p_brand": g["brand"],
                "n_lines": g["n"].astype("int64"),
                "mean_discount": round_away(
                    g["s"].to_numpy(dtype=np.float64)
                    / (100.0 * g["n"].to_numpy(dtype=np.float64)),
                    6,
                ),
                "discounted_share": round_away(
                    g["nd"].to_numpy(dtype=np.float64) / g["n"].to_numpy(dtype=np.float64), 6
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return bucketed_group_agg(partials, ["brand"], final, n_buckets=4)


def q225_priority_mix_by_month(sf_dir: str) -> "ray.data.Dataset":
    """Order-priority mix drift: the share of 1-URGENT and 2-HIGH orders
    per order month — the demand-composition trend q198's weekday test
    and q220's return series bracket (a rising urgent share is an SLA
    exposure ramp). (month, urgent, high, total) exact int64 partials,
    one calendar-sized exchange, shares as double ratios of exact
    counts."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "month": pd.to_datetime(df["o_orderdate"]).values.astype("datetime64[M]"),
                "p_n": np.ones(len(df), dtype=np.int64),
                "p_u": (df["o_orderpriority"] == "1-URGENT").to_numpy(dtype=np.int64),
                "p_h": (df["o_orderpriority"] == "2-HIGH").to_numpy(dtype=np.int64),
            }
        )
        return d.groupby("month", as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("month", as_index=False).agg(
            n=("p_n", "sum"), u=("p_u", "sum"), h=("p_h", "sum")
        )
        return pd.DataFrame(
            {
                "month": g["month"].astype("datetime64[us]"),
                "n_orders": g["n"].astype("int64"),
                "urgent_share": round_away(
                    g["u"].to_numpy(dtype=np.float64) / g["n"].to_numpy(dtype=np.float64), 6
                ),
                "high_share": round_away(
                    g["h"].to_numpy(dtype=np.float64) / g["n"].to_numpy(dtype=np.float64), 6
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["month"], final, n_buckets=4)


def q227_nation_negative_acctbal(sf_dir: str) -> "pd.DataFrame":
    """Supplier credit-risk screen per nation: supplier count, negative-
    account-balance count and share — the supply-side solvency map read
    next to q20's supplier-nation roster. Both tables are dimensions, but
    the shape is the scale-correct one anyway: nationkey→name broadcasts
    once, per-batch (nation, n, n_neg) int64 partials (acctbal is the 2dp
    grid; the sign test is an exact integer comparison on cents), one
    nations-sized exchange."""
    nat = read_small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nmap = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )
    ref = ray.put(nmap)

    ds = read_table(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        lookup = get_broadcast(ref)
        cents = np.rint(
            t.column("s_acctbal").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        d = pd.DataFrame(
            {
                "n_name": [lookup[k] for k in t.column("s_nationkey").to_pylist()],
                "p_n": np.ones(t.num_rows, dtype=np.int64),
                "p_neg": (cents < 0).astype(np.int64),
            }
        )
        g = d.groupby("n_name", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("n_name", as_index=False).sum()
    return (
        pd.DataFrame(
            {
                "n_name": g["n_name"],
                "n_suppliers": g["p_n"].astype("int64"),
                "n_negative": g["p_neg"].astype("int64"),
                "negative_share": round_away(
                    g["p_neg"].to_numpy(dtype=np.float64) / g["p_n"].to_numpy(dtype=np.float64),
                    6,
                ),
            }
        )
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def q228_status_mix_by_year(sf_dir: str) -> "ray.data.Dataset":
    """Order-status composition per order year (O/F/P fill-state drift —
    the fulfilment backlog's annual signature; a P bulge marks partial-
    fill years). (year, status) exact count partials with per-year
    shares, one years×statuses-bounded exchange."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderstatus"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "year": pd.to_datetime(df["o_orderdate"]).dt.year.to_numpy(dtype=np.int64),
                "status": df["o_orderstatus"],
                "p_n": np.ones(len(df), dtype=np.int64),
            }
        )
        return d.groupby(["year", "status"], as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["year", "status"], as_index=False)["p_n"].sum()
        tot = g.groupby("year")["p_n"].transform("sum")
        return pd.DataFrame(
            {
                "year": g["year"].astype("int64"),
                "o_orderstatus": g["status"],
                "n_orders": g["p_n"].astype("int64"),
                "share": round_away(
                    g["p_n"].to_numpy(dtype=np.float64) / tot.to_numpy(dtype=np.float64), 6
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["year"], final, n_buckets=4)


def q229_type_catalog_profile(sf_dir: str) -> "ray.data.Dataset":
    """Catalog profile per part type — count, mean size and mean retail
    price, the assortment-tier snapshot q219's per-brand spread reads
    sideways (is PROMO actually smaller/cheaper stock?). (type, n, Σsize,
    Σcents) exact int64 partials, one types-sized exchange, both means as
    double ratios of exact ints evaluated identically on both sides."""
    ds = read_table(sf_dir, "part", columns=["p_type", "p_size", "p_retailprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["p_retailprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        d = pd.DataFrame(
            {
                "p_type": df["p_type"],
                "p_n": np.ones(len(df), dtype=np.int64),
                "p_sz": df["p_size"].to_numpy(dtype=np.int64),
                "p_c": cents,
            }
        )
        return d.groupby("p_type", as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_type", as_index=False).agg(
            n=("p_n", "sum"), sz=("p_sz", "sum"), c=("p_c", "sum")
        )
        return pd.DataFrame(
            {
                "p_type": g["p_type"],
                "n_parts": g["n"].astype("int64"),
                "mean_size": round_away(
                    g["sz"].to_numpy(dtype=np.float64) / g["n"].to_numpy(dtype=np.float64), 4
                ),
                "mean_price": round_away(
                    (g["c"].to_numpy(dtype=np.float64) / g["n"].to_numpy(dtype=np.float64))
                    / 100.0,
                    4,
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["p_type"], final, n_buckets=4)


def q230_weighted_median(sf_dir: str, n_bins: int = 128, tail_cap: int = 65536) -> pd.DataFrame:
    """EXACT weighted global median — the smallest ``l_extendedprice``
    whose quantity-weighted inclusive cumulative weight reaches half the
    total (the unit-economics midpoint: half of all UNITS ship at or
    below this price). q141's distributed-selection machinery with bin
    WEIGHT sums instead of bin counts: quantities are integral, so every
    per-batch bin partial is an exact int64 weight vector, the driver
    narrows on the integer condition 2·cumweight ≥ W (no float enters
    any comparison), and one filtered pass collects only the candidate
    sliver. The answer is an actual data value (no interpolation), so
    both oracle sides emit the identical double; the SQL side is the
    windowed 2·cum ≥ W min-pick with RANGE framing (peers included),
    which matches the inclusive-cumweight definition exactly."""
    vcol, wcol = "l_extendedprice", "l_quantity"
    ds = read_table(sf_dir, "lineitem", columns=[vcol, wcol])

    def mm_partial(t: pa.Table) -> pa.Table:
        v = t.column(vcol).to_numpy(zero_copy_only=False)
        q = np.rint(t.column(wcol).to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {
                "w": pa.array([int(q.sum())], pa.int64()),
                "lo": pa.array([float(v.min()) if len(v) else np.inf]),
                "hi": pa.array([float(v.max()) if len(v) else -np.inf]),
            }
        )

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    W = int(mm["w"].sum())
    if W == 0:
        return pd.DataFrame({"total_weight": pd.array([0], dtype="int64"), "weighted_median": [np.nan]})
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())

    below = 0  # weight strictly below lo
    while True:
        edges = np.linspace(lo, hi, n_bins + 1)
        ref = ray.put(edges)

        def bin_partial(t: pa.Table, ref=ref) -> pa.Table:
            e = get_broadcast(ref)
            v = t.column(vcol).to_numpy(zero_copy_only=False)
            q = np.rint(t.column(wcol).to_numpy(zero_copy_only=False)).astype(np.int64)
            m = (v >= e[0]) & (v <= e[-1])
            v, q = v[m], q[m]
            ix = np.clip(np.searchsorted(e, v, side="right") - 1, 0, len(e) - 2)
            wsum = np.bincount(ix, weights=q.astype(np.float64), minlength=len(e) - 1).astype(np.int64)
            nrow = np.bincount(ix, minlength=len(e) - 1)
            return pa.table(
                {
                    "w": pa.array([wsum.tolist()], pa.list_(pa.int64(), len(e) - 1)),
                    "n": pa.array([nrow.tolist()], pa.list_(pa.int64(), len(e) - 1)),
                }
            )

        agg = ds.map_batches(bin_partial, batch_format="pyarrow").to_pandas()
        wcounts = np.sum([np.asarray(r) for r in agg["w"]], axis=0).astype(np.int64)
        ncounts = np.sum([np.asarray(r) for r in agg["n"]], axis=0).astype(np.int64)
        cum = below + np.cumsum(wcounts)
        # target bin: first bin whose inclusive cumweight satisfies 2·cum ≥ W
        b = int(np.argmax(2 * cum >= W))
        new_lo, new_hi = float(edges[b]), float(edges[b + 1])
        rows_in = int(ncounts[b])
        new_below = below + int(wcounts[:b].sum())
        if rows_in <= tail_cap or (new_lo, new_hi) == (lo, hi):
            lo, hi, below = new_lo, new_hi, new_below
            break
        lo, hi, below = new_lo, new_hi, new_below

    ref = ray.put((lo, hi))

    def sliver(t: pa.Table) -> pa.Table:
        l, h = get_broadcast(ref)
        v = t.column(vcol).to_numpy(zero_copy_only=False)
        q = np.rint(t.column(wcol).to_numpy(zero_copy_only=False)).astype(np.int64)
        m = (v >= l) & (v <= h)
        return pa.table({"v": pa.array(v[m]), "q": pa.array(q[m], pa.int64())})

    sl = ds.map_batches(sliver, batch_format="pyarrow").to_pandas()
    # the last bin is right-open except the terminal one: rows at exactly hi
    # belong to the NEXT bin unless hi is the global max — replicate the
    # binning rule so `below` stays consistent with the collected rows
    sl = sl.sort_values("v", kind="mergesort")
    cw = below + sl["q"].cumsum().to_numpy(dtype=np.int64)
    pick = np.argmax(2 * cw >= W)
    med = float(sl["v"].to_numpy()[pick])
    return pd.DataFrame(
        {
            "total_weight": pd.array([W], dtype="int64"),
            "weighted_median": [med],
        }
    )
