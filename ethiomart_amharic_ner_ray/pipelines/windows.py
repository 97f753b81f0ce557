"""Stream-shaped operators over the events log: windowed aggregates and
as-of joins (operators the reference lacks but a transcript/event pipeline
needs — SURVEY.md §2.9's "custom operators" slot).

Partitioning assumption (documented per the custom-operator rule): events
are hash-bucketed by user_id; per-user ordered state (the running cummax in
the as-of join) is computed by a vectorized grouped scan inside each bucket.
Windows use two-phase aggregation, so a hot hour never concentrates raw
rows."""

from __future__ import annotations

import pandas as pd
import ray.data

from .common import bucketed_group_agg, read_table, round_away


def q18_hourly_windows(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour windows per user: n_events + sum_value.
    Two-phase: per-batch (user, hour) partials → bucketed final combine."""
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

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "window_start"], as_index=False).agg(
            n_events=("p_n", "sum"), sum_value=("p_sum", "sum")
        )
        g["sum_value"] = round_away(g["sum_value"], 4)
        g["window_start"] = g["window_start"].astype("datetime64[us]")
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["user_id", "window_start"], final, n_buckets=64)


def q21_sessionize(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Session windows (gap-based): a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. Vectorized gaps-and-islands
    scan per user bucket (sort → diff → cumsum); the SQL oracle is the
    classic lag+running-sum formulation."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        gap = pd.Timedelta(minutes=gap_minutes)
        prev_ts = df.groupby("user_id")["ts"].shift()
        new_session = (prev_ts.isna() | ((df["ts"] - prev_ts) > gap)).astype("int64")
        sid = new_session.groupby(df["user_id"]).cumsum()
        out = (
            pd.DataFrame(
                {"user_id": df["user_id"], "session_id": sid, "ts": df["ts"], "value": df["value"]}
            )
            .groupby(["user_id", "session_id"], as_index=False)
            .agg(session_start=("ts", "min"), n_events=("ts", "size"), sum_value=("value", "sum"))
        )
        out["sum_value"] = round_away(out["sum_value"].to_numpy(), 4)
        out["session_start"] = out["session_start"].astype("datetime64[us]")
        return out

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q17_asof_last_signup(sf_dir: str) -> "ray.data.Dataset":
    """As-of join: each event gets the ts of the latest 'signup' event by the
    same user at-or-before it (ties broken by event_id order). Vectorized
    grouped cummax+ffill scan per user bucket."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        signup_ts = df["ts"].where(df["event_type"] == "signup")
        grp = df["user_id"]
        # cummax leaves NaT at non-signup rows; grouped ffill carries the
        # running max forward (matches the SQL window max semantics)
        last = signup_ts.groupby(grp).cummax()
        last = last.groupby(grp).ffill()
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                "last_signup_ts": last.astype("datetime64[us]"),
            }
        )

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q27_range_join_count(sf_dir: str, window_minutes: int = 5) -> "ray.data.Dataset":
    """Band/range join WITHOUT an equality key: for every event, count the
    events (any user) with ts in [ts − W, ts) — strictly earlier, window W.

    Distributed shape (the time-bin co-partition trick for pure range
    joins): bin the time axis at width W. A left event in bin k only needs
    right events from bins {k−1, k}, so rights are emitted to their own bin
    AND the next one; ONE groupby on the bin co-locates every candidate
    pair exactly once; inside a bin the count is two vectorized
    searchsorted probes against the bin's sorted right timestamps — never a
    pairwise product. Skew note: a hot W-wide burst concentrates in one
    bin; at cluster scale shrink the bin width below W and emit rights to
    ceil(W/bin)+1 bins (same math), which re-spreads hot windows."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])
    w = pd.Timedelta(minutes=window_minutes)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        # normalize to ns regardless of the parquet's datetime resolution
        bins = (df["ts"].astype("datetime64[ns]").astype("int64") // int(w.value)).astype("int64")
        left = pd.DataFrame(
            {"bin": bins, "event_id": df["event_id"], "ts": df["ts"], "side": 0}
        )
        rights = pd.concat(
            [
                pd.DataFrame({"bin": bins, "event_id": df["event_id"], "ts": df["ts"], "side": 1}),
                pd.DataFrame({"bin": bins + 1, "event_id": df["event_id"], "ts": df["ts"], "side": 1}),
            ],
            ignore_index=True,
        )
        return pd.concat([left, rights], ignore_index=True)

    def count_in_bin(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("bin", sort=False):
            lefts = g[g["side"] == 0]
            if lefts.empty:
                continue
            rts = np.sort(g.loc[g["side"] == 1, "ts"].to_numpy().astype("datetime64[ns]").astype("int64"))
            lt = lefts["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
            lo = np.searchsorted(rts, lt - int(w.value), side="left")
            hi = np.searchsorted(rts, lt, side="left")
            outs.append(
                pd.DataFrame(
                    {"event_id": lefts["event_id"].to_numpy(), "n_prior": (hi - lo).astype("int64")}
                )
            )
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                {"event_id": pd.array([], dtype="int64"), "n_prior": pd.array([], dtype="int64")}
            )
        )

    emitted = ds.map_batches(emit, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(emitted, ["bin"], count_in_bin, n_buckets=64)


def q28_sliding_windows(sf_dir: str, window_s: int = 3600, slide_s: int = 900) -> "ray.data.Dataset":
    """Sliding windows per user (1 h window, 15 min slide): every event
    belongs to window/slide = 4 overlapping windows; each batch emits its
    (user, window_start) partials for all four — ×4 row amplification of
    tiny partial rows, never raw events — then the standard bucketed final
    combine. window_start is epoch SECONDS (BIGINT) on both engine and
    oracle side, sidestepping timestamptz round-trips."""
    import numpy as np

    k = window_s // slide_s
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    # partials aggregate per (user, SLIDE BIN) — the finest granularity —
    # so the exchange carries each bin ONCE, not once per overlapping
    # window: k-fold less shuffle volume than exploding windows before the
    # shuffle. The window expansion happens inside the bucket final, where
    # each bin's partial fans out to its k windows and re-sums. Bucketing
    # is on user_id alone so all of a user's bins co-locate.
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        epoch = df["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
        d = pd.DataFrame(
            {"user_id": df["user_id"], "bin": (epoch // slide_s) * slide_s, "value": df["value"]}
        )
        return d.groupby(["user_id", "bin"], as_index=False).agg(
            p_n=("value", "size"), p_sum=("value", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        b = df.groupby(["user_id", "bin"], as_index=False).agg(
            p_n=("p_n", "sum"), p_sum=("p_sum", "sum")
        )
        frames = [
            b.assign(window_start=b["bin"] - i * slide_s)[
                ["user_id", "window_start", "p_n", "p_sum"]
            ]
            for i in range(k)
        ]
        g = (
            pd.concat(frames, ignore_index=True)
            .groupby(["user_id", "window_start"], as_index=False)
            .agg(n_events=("p_n", "sum"), sum_value=("p_sum", "sum"))
        )
        g["sum_value"] = round_away(g["sum_value"].to_numpy(), 4)
        return g.astype({"window_start": "int64", "n_events": "int64"})

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["user_id"], final, n_buckets=64)


def q36_event_lag_stats(sf_dir: str) -> "ray.data.Dataset":
    """LAG-window analytics: per-user inter-event gap statistics (count /
    mean / max of the seconds between consecutive events, ordered by
    ts then event_id). Distributed shape: the user is the window partition
    key, so ONE bucket shuffle on user_id co-locates each user's events;
    inside a bucket the lag is a vectorized grouped shift-and-diff — no
    per-row Python, no global sort. Gap arithmetic is exact (microsecond
    int64 diff / 1e6), matching the SQL date_diff formulation bit-for-bit.
    Single-event users emit n_gaps=0 with NULL stats, as SQL does."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id")["ts"].shift()
        gap = (
            df["ts"].astype("datetime64[us]").astype("int64")
            - prev.astype("datetime64[us]").astype("int64")
        ) / 1e6
        gap[prev.isna()] = np.nan
        out = (
            pd.DataFrame({"user_id": df["user_id"], "gap": gap})
            .groupby("user_id", as_index=False)
            .agg(
                n_gaps=("gap", "count"),
                avg_gap_s=("gap", "mean"),
                max_gap_s=("gap", "max"),
            )
        )
        out["n_gaps"] = out["n_gaps"].astype("int64")
        mask = out["n_gaps"] > 0
        out.loc[mask, "avg_gap_s"] = round_away(out.loc[mask, "avg_gap_s"].to_numpy(), 4)
        out.loc[mask, "max_gap_s"] = round_away(out.loc[mask, "max_gap_s"].to_numpy(), 4)
        return out

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q37_cumulative_spend(sf_dir: str) -> "ray.data.Dataset":
    """Running-total window (SUM OVER ... ROWS UNBOUNDED PRECEDING): each
    order's cumulative customer spend, ordered by (o_orderdate, o_orderkey)
    within the customer. Same partition-key discipline as q36: one bucket
    shuffle on o_custkey, then a vectorized grouped cumsum per bucket. The
    output is row-per-order (as wide as the input) — it streams back out of
    the buckets block-by-block, never concentrating on the driver."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        cum = df.groupby("o_custkey")["o_totalprice"].cumsum()
        return pd.DataFrame(
            {
                "o_custkey": df["o_custkey"],
                "o_orderkey": df["o_orderkey"],
                "cum_spend": round_away(cum.to_numpy(), 4),
            }
        )

    return bucketed_group_agg(ds, ["o_custkey"], final, n_buckets=64)


def q62_asof_join(sf_dir: str) -> "ray.data.Dataset":
    """TWO-STREAM as-of join (q17 is the single-stream running-state
    variant): every purchase event picks the latest view event by the same
    user at-or-before it — the probe-stream/reference-stream shape (trade
    vs quote). Distributed: both streams ride the engine's ONE union
    shuffle bucketed on user_id (common.bucketed_join), then a per-bucket
    vectorized pandas merge_asof over time-sorted frames — no row loop, no
    global sort. Only the matched timestamp is emitted, so an equal-ts tie
    (either side picking one of the tied rows) cannot diverge from the
    oracle. The DuckDB oracle is a native ASOF LEFT JOIN."""
    import pyarrow.compute as pc

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def split(kind: str, cols: dict):
        def f(t):
            t = t.filter(pc.equal(t.column("event_type"), kind))
            import pyarrow as pa

            return pa.table({out: t.column(src_) for out, src_ in cols.items()})

        return ev.map_batches(f, batch_format="pyarrow")

    left = split("purchase", {"event_id": "event_id", "user_id": "user_id", "p_ts": "ts"})
    right = split("view", {"user_id": "user_id", "v_ts": "ts"})

    def asof_merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.sort_values("p_ts", kind="mergesort")
        rdf = rdf.sort_values("v_ts", kind="mergesort")
        out = pd.merge_asof(
            ldf,
            rdf,
            left_on="p_ts",
            right_on="v_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        return pd.DataFrame(
            {
                "event_id": out["event_id"],
                "user_id": out["user_id"],
                "last_view_ts": out["v_ts"],
            }
        )

    from .common import bucketed_join

    return bucketed_join(left, right, on="user_id", n_buckets=32, merge_fn=asof_merge)


def conv_context(tx_ds: "ray.data.Dataset", k: int = 2, n_buckets: int = 32) -> "ray.data.Dataset":
    """Per-turn conversation context: each turn's text prefixed by its k
    preceding turns (the context window an NER/model-scoring stage consumes —
    the engine-scale form of the reference's per-conversation message
    assembly). One conv-hash-bucket shuffle co-locates conversations; inside
    a bucket the window is a sorted vectorized shift-prepend per group — no
    per-turn Python, no per-conversation task."""
    import numpy as np

    from .kg import add_conv_bucket

    ds = tx_ds.select_columns(["conv_id", "turn_idx", "text"])
    ds = ds.map_batches(add_conv_bucket, fn_kwargs={"n_buckets": n_buckets}, batch_format="pyarrow")

    def ctx(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        res = df["text"].astype(object).copy()
        grp = df.groupby("conv_id", sort=False)["text"]
        for j in range(1, k + 1):
            sh = grp.shift(j)
            has = sh.notna().to_numpy()
            res = pd.Series(
                np.where(has, sh.fillna("").to_numpy(dtype=object) + " " + res.to_numpy(dtype=object), res.to_numpy(dtype=object)),
                index=res.index,
            )
        return pd.DataFrame(
            {"conv_id": df["conv_id"], "turn_idx": df["turn_idx"].astype("int32"), "ctx": res}
        )

    return ds.groupby("cbucket").map_groups(ctx, batch_format="pandas")


def q73_event_debounce(sf_dir: str, window_s: int = 86400) -> "ray.data.Dataset":
    """Event debouncing (the repeated-signal hygiene pass of an event
    pipeline): keep an event only if the same user had no SAME-TYPE event in
    the preceding ``window_s`` seconds — the distributed form of
    ``ts − LAG(ts) OVER (PARTITION BY user, type ORDER BY ts, id)``.
    ONE bucket shuffle on user_id co-locates each user's stream (the finer
    (user, type) partition rides inside it for free); in-bucket the lag is a
    vectorized grouped shift-and-diff with the (ts, event_id) total-order
    tie-break, so output is deterministic under duplicate timestamps. Gap
    arithmetic is exact microsecond int64, strict `>` matching the SQL
    interval comparison."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"], kind="mergesort")
        prev = df.groupby(["user_id", "event_type"], sort=False)["ts"].shift()
        gap_us = (
            df["ts"].astype("datetime64[us]").astype("int64")
            - prev.astype("datetime64[us]").astype("int64")
        )
        keep = prev.isna().to_numpy() | (gap_us.to_numpy() > window_s * 1_000_000)
        return pd.DataFrame({"event_id": df.loc[keep, "event_id"].astype("int64")})

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q77_moving_avg(sf_dir: str, days: int = 7) -> "ray.data.Dataset":
    """Time-RANGE window frame: each event's average value over the same
    user's events in the preceding ``days`` (inclusive of ties at the
    current timestamp — RANGE peers, matching SQL RANGE BETWEEN ... AND
    CURRENT ROW). ONE user-bucket shuffle; in-bucket the frame bounds are
    two vectorized searchsorted probes against the user's ts array and the
    sums come from one cumulative sum — O(n log n) per user, never a
    per-row rescan.

    Numeric pinning: values are 2-decimal money, so the window sum runs in
    EXACT int64 cents on both oracle sides (a float cumsum's drift flipped
    ~1% of rows across the 4dp rounding boundary at sf0.01); the average is
    then the identical IEEE expression tree (cents / 100.0) / n."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    w_us = days * 86400 * 1_000_000

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        outs = []
        for _, g in df.groupby("user_id", sort=False):
            ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            cents = np.rint(g["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
            cum = np.concatenate([[0], np.cumsum(cents)])
            lo = np.searchsorted(ts, ts - w_us, side="left")
            hi = np.searchsorted(ts, ts, side="right")  # peers included
            outs.append(
                pd.DataFrame(
                    {
                        "event_id": g["event_id"].astype("int64"),
                        "mavg": ((cum[hi] - cum[lo]) / 100.0) / (hi - lo),
                    }
                )
            )
        out = pd.concat(outs, ignore_index=True)
        out["mavg"] = round_away(out["mavg"].to_numpy(), 4)
        return out

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q91_interval_merge(sf_dir: str, dur_scale: int = 100) -> "ray.data.Dataset":
    """Merge overlapping intervals per user (gaps-and-islands over SPANS,
    not points — the scheduling/uptime primitive q21's gap sessionizer
    can't express because intervals have variable lengths: an island ends
    only when the next start exceeds the running MAX of every prior
    interval's end, not the previous row's). Each event spans
    [ts, ts + floor(value*dur_scale) seconds]. ONE user-bucket shuffle;
    in-bucket the island ids come from a vectorized grouped
    cummax-shift-cumsum scan, never a per-row loop. The SQL oracle is the
    classic windowed MAX(e) ROWS UNBOUNDED PRECEDING AND 1 PRECEDING
    formulation."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        dur_s = np.floor(df["value"].to_numpy(dtype=np.float64) * dur_scale).astype("int64")
        end = df["ts"] + pd.to_timedelta(dur_s, unit="s")
        grp = df["user_id"]
        run_max = end.groupby(grp).cummax()
        prev_max = run_max.groupby(grp).shift()
        new_island = (prev_max.isna() | (df["ts"] > prev_max)).astype("int64")
        gid = new_island.groupby(grp).cumsum()
        out = (
            pd.DataFrame(
                {"user_id": df["user_id"], "interval_id": gid, "s": df["ts"], "e": end}
            )
            .groupby(["user_id", "interval_id"], as_index=False)
            .agg(start_ts=("s", "min"), end_ts=("e", "max"), n_events=("s", "size"))
        )
        out["start_ts"] = out["start_ts"].astype("datetime64[us]")
        out["end_ts"] = out["end_ts"].astype("datetime64[us]")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q97_user_transitions(sf_dir: str) -> "pd.DataFrame":
    """Markov transition matrix over per-user event sequences (the
    sequence-mining primitive behind next-action prediction and funnel
    discovery): count (prev_type -> next_type) transitions in (ts,
    event_id) order per user, then normalize per source state. ONE
    user-bucket shuffle; inside each bucket the lead() is a vectorized
    grouped shift and counts collapse to <= |types|^2 partial rows per
    bucket, so the driver merge is matrix-sized regardless of the table."""
    import numpy as np

    from .common import round_away

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        nxt = df.groupby("user_id", sort=False)["event_type"].shift(-1)
        m = pd.DataFrame({"prev_type": df["event_type"].to_numpy(), "next_type": nxt.to_numpy()})
        m = m.dropna(subset=["next_type"])
        return m.groupby(["prev_type", "next_type"], as_index=False).size().rename(columns={"size": "p_n"})

    partials = bucketed_group_agg(ds, ["user_id"], final, n_buckets=32)
    out = partials.to_pandas().groupby(["prev_type", "next_type"], as_index=False)["p_n"].sum()
    out["n_trans"] = out["p_n"].astype("int64")
    tot = out.groupby("prev_type")["n_trans"].transform("sum").to_numpy(dtype=np.float64)
    out["p_next"] = round_away(out["n_trans"].to_numpy(dtype=np.float64) / tot, 4)
    return (
        out[["prev_type", "next_type", "n_trans", "p_next"]]
        .sort_values(["prev_type", "next_type"], kind="mergesort")
        .reset_index(drop=True)
    )


def q98_prev_rows_stats(sf_dir: str, k: int = 5) -> "ray.data.Dataset":
    """ROW-count window frame: per event, count and mean of the SAME user's
    previous ``k`` event values — SQL's ``ROWS BETWEEN k PRECEDING AND 1
    PRECEDING``. The third frame shape next to q37's UNBOUNDED-cumsum and
    q77's time-RANGE: the frame is positional (row offsets), excludes the
    current row, and never includes timestamp peers, so tie-handling runs
    on the (ts, event_id) total order instead of RANGE peer groups.

    ONE user-bucket shuffle; in-bucket fully vectorized with NO per-user
    loop: one mergesort, a grouped cumcount for each row's position inside
    its user run, one cents-cumsum over the whole bucket, and two
    fancy-index probes (i-k clamped to the user's start, i). Sums run in
    EXACT int64 cents (q77's pinning rule: float cumsum drift flips rows
    across the 4dp boundary); the average is then the identical IEEE
    expression (cents / 100.0) / n on both oracle sides. First event of a
    user has an empty frame -> NULL mean, n_frame 0."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.rint(df["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        pos = df.groupby("user_id", sort=False).cumcount().to_numpy()
        i = np.arange(len(df), dtype=np.int64)
        group_start = i - pos
        lo = np.maximum(group_start, i - k)
        csum = np.concatenate([[0], np.cumsum(cents)])
        frame_sum = csum[i] - csum[lo]  # [lo, i) — current row excluded
        n_frame = i - lo
        with np.errstate(invalid="ignore", divide="ignore"):
            prev_avg = (frame_sum / 100.0) / n_frame
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "n_frame": n_frame.astype("int64"),
                "prev_avg": round_away(prev_avg, 4),
            }
        )
        out.loc[out["n_frame"] == 0, "prev_avg"] = np.nan
        return out

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q103_time_weighted_avg(sf_dir: str) -> "ray.data.Dataset":
    """Time-weighted average value per user (TWAP — the irregular-series
    integral behind position/price averaging): with events ordered by
    (ts, event_id), each value holds until the next event, so
    twap = Σ value_i · Δt_i / (t_last − t_first) over the n−1 intervals.
    Users with a single event (or zero span) have no interval and are
    absent, matching the SQL HAVING. ONE user-bucket shuffle; in-bucket a
    vectorized grouped shift produces Δt in EXACT integer microseconds
    (the weights), and the weighted sum is one multiply + grouped sum —
    identical expression tree to the oracle's lead()/epoch_us form."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].astype("datetime64[us]")
        nxt = df.groupby("user_id", sort=False)["ts"].shift(-1).astype("datetime64[us]")
        dt_td = (nxt - ts).to_numpy()  # timedelta64[us], NaT on each user's last row
        dt = dt_td.astype("int64").astype("float64")  # exact integer µs as float
        dt[np.isnat(dt_td)] = np.nan
        w = df["value"].to_numpy(dtype=np.float64) * dt
        d = pd.DataFrame({"user_id": df["user_id"].to_numpy(), "wx": w, "dt": dt})
        g = d.groupby("user_id", as_index=False).agg(s=("wx", "sum"), span=("dt", "sum"))
        g = g[g["span"] > 0]
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64"),
                "twap": round_away((g["s"] / g["span"]).to_numpy(), 4),
            }
        )

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q104_rolling_distinct_users(sf_dir: str, window_days: int = 7) -> "ray.data.Dataset":
    """Rolling 7-day DISTINCT-user count per day — the windowed-distinct
    shape (DAU/WAU dashboards) that neither a sliding SUM (q28) nor a
    per-window groupby (q42) can express, because distinct does not
    decompose over overlapping windows. Exact distributed form: collapse to
    DISTINCT (user, active-day) pairs first (two-phase — the corpus-sized
    exchange), then each pair expands to the ``window_days`` window-end
    days it contributes to (a bounded ×7 fan-out of the already-distinct
    pairs, NOT of raw events), and a second two-phase distinct-count per
    window day finishes. Window ends cover every day any window sees, so
    the first window_days−1 rows are partial windows — same on both oracle
    sides. The approximate path for cardinalities beyond an exact count is
    the per-group HLL (sketches.approx_users_per_event_type's registers
    keyed by window day)."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"user_id": df["user_id"], "day": df["ts"].dt.floor("D")}
        ).drop_duplicates()
        return d

    def pair_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    pairs = bucketed_group_agg(
        ds.map_batches(pair_partial, batch_format="pandas", batch_size=65536),
        ["user_id", "day"],
        pair_final,
        n_buckets=32,
    )

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        k = window_days
        n = len(df)
        if n == 0:
            return pd.DataFrame({"user_id": [], "wday": []})
        off = np.tile(np.arange(k, dtype="timedelta64[D]"), n)
        out = pd.DataFrame(
            {
                "user_id": np.repeat(df["user_id"].to_numpy(), k),
                "wday": np.repeat(df["day"].to_numpy(), k) + off,
            }
        ).drop_duplicates()
        return out

    def count_final(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop_duplicates()
            .groupby("wday", as_index=False)["user_id"]
            .size()
            .rename(columns={"size": "n_users"})
        )
        g["wday"] = g["wday"].astype("datetime64[us]")
        return g.astype({"n_users": "int64"})

    return bucketed_group_agg(
        pairs.map_batches(expand, batch_format="pandas", batch_size=65536),
        ["wday"],
        count_final,
        n_buckets=16,
    )


def q106_purchase_attribution(sf_dir: str, horizon_days: int = 7) -> "ray.data.Dataset":
    """Marketing attribution: each 'purchase' event is attributed to the
    SAME user's latest 'click' within the preceding ``horizon_days`` —
    a LEFT as-of join with a horizon (q62's as-of is inner and unbounded;
    the horizon turns stale clicks into NULL attributions, which is what
    makes it attribution rather than a plain as-of). ONE user-bucket
    shuffle; in-bucket the latest-prior-click is a grouped cummax ffill
    scan and the horizon is one vectorized timestamp compare. Output keeps
    every purchase (left semantics): attributed_click_ts is NULL when no
    click is in the window."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["click", "purchase"])]
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        is_click = (df["event_type"] == "click").to_numpy()
        click_ts = df["ts"].where(is_click)
        last_click = click_ts.groupby(df["user_id"].to_numpy(), sort=False).ffill()
        purch = df["event_type"].to_numpy() == "purchase"
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[purch],
                "user_id": df["user_id"].to_numpy()[purch],
                "ts": df["ts"].to_numpy()[purch],
                "attributed_click_ts": last_click.to_numpy()[purch],
            }
        )
        horizon = np.timedelta64(horizon_days * 86400 * 1_000_000, "us")
        stale = (out["ts"].to_numpy() - out["attributed_click_ts"].to_numpy()) > horizon
        out.loc[stale, "attributed_click_ts"] = np.datetime64("NaT")
        out["ts"] = out["ts"].astype("datetime64[us]")
        out["attributed_click_ts"] = out["attributed_click_ts"].astype("datetime64[us]")
        return out

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q108_upsert_latest(sf_dir: str) -> "ray.data.Dataset":
    """CDC upsert / MERGE-into-latest: treat the event log as a change
    stream keyed by (user_id, event_type) and emit the LATEST version of
    each key — the compaction every CDC sink (Hudi/Delta "merge on read",
    Kafka log compaction) performs. Latest = max (ts, event_id) within the
    key, so concurrent same-timestamp updates resolve deterministically by
    event_id. ONE key-bucket shuffle; in-bucket one mergesort +
    drop_duplicates(keep='last') — no per-key loop. At 100 TB the key
    space shards across buckets and each bucket compacts independently,
    which is exactly how an incremental snapshot-maintenance job would
    partition."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts", "value"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"], kind="mergesort")
        out = df.drop_duplicates(["user_id", "event_type"], keep="last")
        return out[["user_id", "event_type", "event_id", "ts", "value"]].reset_index(drop=True)

    return bucketed_group_agg(ds, ["user_id", "event_type"], final, n_buckets=64)


def q109_scd2_intervals(sf_dir: str) -> "ray.data.Dataset":
    """SCD-Type-2 construction: compress each user's event stream into
    validity intervals of their event_type "state" — a new interval opens
    whenever the type CHANGES (ordered by ts, event_id), valid_to is the
    next change's valid_from, and the current state stays open (NULL
    valid_to). The dimension-history shape warehouses build from change
    logs. ONE user-bucket shuffle; in-bucket a grouped shift-compare marks
    change rows and a second grouped shift(-1) over the kept rows closes
    the intervals — all vectorized, no per-user loop."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        prev_type = df.groupby(uid, sort=False)["event_type"].shift(1)
        keep = prev_type.isna() | (prev_type.to_numpy() != df["event_type"].to_numpy())
        c = df[keep.to_numpy()]
        valid_to = c.groupby(c["user_id"].to_numpy(), sort=False)["ts"].shift(-1)
        return pd.DataFrame(
            {
                "user_id": c["user_id"].astype("int64").to_numpy(),
                "event_type": c["event_type"].to_numpy(),
                "valid_from": c["ts"].astype("datetime64[us]").to_numpy(),
                "valid_to": valid_to.astype("datetime64[us]").to_numpy(),
            }
        )

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q110_user_value_ewma(sf_dir: str, alpha: float = 0.5) -> "ray.data.Dataset":
    """Exponential smoothing: final EWMA of each user's event values in
    (ts, event_id) order — s_1 = x_1, s_i = α·x_i + (1−α)·s_{i−1} — the
    recency-weighted signal behind rate limiters and trend scores. The
    recurrence is sequential, so the distributed form uses its CLOSED FORM
    s_n = Σ_j w_j·x_j with w_j = α(1−α)^{n−j} (j>1) and w_1 = (1−α)^{n−1}:
    one user-bucket shuffle, then a vectorized per-row weight (grouped
    cumcount + group size) and ONE grouped weighted sum — no sequential
    scan anywhere. α = 0.5 keeps every weight an exact power of two, so
    term products are exact in float64 and the oracle's sum agrees to well
    past the 4-decimal rounding on both sides. Values ride as exact int64
    cents; users keep their raw last value too, so the smoothing is
    auditable."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        cents = np.rint(df["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        pos = df.groupby(uid, sort=False).cumcount().to_numpy()  # 0-based j-1
        size = df.groupby(uid, sort=False)["event_id"].transform("size").to_numpy()
        # w_j = alpha*(1-alpha)^(n-j) for j>1, (1-alpha)^(n-1) for j=1
        w = alpha * np.power(1.0 - alpha, (size - 1 - pos).astype(np.float64))
        w[pos == 0] = np.power(1.0 - alpha, (size[pos == 0] - 1).astype(np.float64))
        term = (cents / 100.0) * w
        g = pd.DataFrame({"user_id": uid, "term": term}).groupby("user_id", as_index=False).agg(
            ewma=("term", "sum")
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64"),
                "ewma": round_away(g["ewma"].to_numpy(), 4),
            }
        )

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q115_longest_streak(sf_dir: str) -> "ray.data.Dataset":
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days — the classic islands detection (rn-difference trick) that no
    plain window frame expresses. Distributed form: two-phase DISTINCT
    (user, day) first (the only corpus-sized exchange), then per user the
    island id is day_number − rank (vectorized grouped cumcount), and the
    streak is the max island size. Day arithmetic runs on integer
    epoch-days, so there is no float or timezone hazard."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"], "day": df["ts"].dt.floor("D")}
        ).drop_duplicates()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        uid = df["user_id"].to_numpy()
        dayn = df["day"].to_numpy().astype("datetime64[D]").astype(np.int64)
        rn = df.groupby(uid, sort=False).cumcount().to_numpy()
        island = dayn - rn
        g = (
            pd.DataFrame({"user_id": uid, "island": island})
            .groupby(["user_id", "island"], as_index=False)
            .size()
            .groupby("user_id", as_index=False)["size"]
            .max()
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64"),
                "longest_streak": g["size"].astype("int64"),
            }
        )

    return bucketed_group_agg(
        ds.map_batches(pair_partial, batch_format="pandas", batch_size=65536),
        ["user_id"],
        final,
        n_buckets=64,
    )


def q116_session_conversion(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Ordered-pattern matching inside session windows (MATCH_RECOGNIZE-
    lite): a session CONVERTS when it contains a 'purchase' strictly after
    a 'click' in the session's (ts, event_id) order — q21's gap
    sessionization composed with a sequential pattern no plain aggregate
    sees (a purchase-then-click session must NOT count). ONE user-bucket
    shuffle; in-bucket: vectorized sessionize (diff > gap → cumsum), a
    grouped cummax of the click flag gives "click seen so far" per row,
    and the session converts iff any purchase row has it set. Output is
    per-user session/conversion counts."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        gap = pd.Timedelta(minutes=gap_minutes)
        prev_ts = df.groupby("user_id")["ts"].shift()
        new_session = (prev_ts.isna() | ((df["ts"] - prev_ts) > gap)).astype("int64")
        sid = new_session.groupby(df["user_id"].to_numpy()).cumsum()
        is_click = (df["event_type"] == "click").astype("int64")
        uid = df["user_id"].to_numpy()
        sid_np = sid.to_numpy()
        # group by positional arrays, NOT fresh-index Series: pandas aligns
        # Series groupers on index, and df's index is the pre-sort order
        seen_click = is_click.groupby([uid, sid_np]).cummax()
        hit = ((df["event_type"] == "purchase") & (seen_click == 1)).astype("int64")
        per_session = (
            pd.DataFrame({"user_id": uid, "sid": sid_np, "hit": hit.to_numpy()})
            .groupby(["user_id", "sid"], as_index=False)["hit"]
            .max()
        )
        out = per_session.groupby("user_id", as_index=False).agg(
            n_sessions=("sid", "size"), n_converted=("hit", "sum")
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_converted"] = out["n_converted"].astype("int64")
        return out

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def asof_join(
    left_ds: "ray.data.Dataset",
    right_ds: "ray.data.Dataset",
    on: str,
    by: str,
    direction: str = "backward",
    tolerance=None,
    n_buckets: int = 64,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """Generic AS-OF join primitive (the custom-operator slot the Dataset
    API lacks): every LEFT row is matched to at most ONE right row per
    ``by`` key — backward: the latest right with right.on ≤ left.on;
    forward: the earliest with right.on ≥ left.on; nearest: the minimal
    |Δ| — optionally bounded by ``tolerance`` (unmatched → NULLs, LEFT
    semantics). q17/q62/q106 are fixed instances of this; the primitive
    exposes the direction/tolerance axes as API.

    Partitioning assumption (documented per the custom-operator rule):
    both sides hash-bucket on ``by`` — ONE shuffle each, riding
    bucketed_join's tagged-union exchange — and the in-bucket kernel is
    pandas merge_asof (a vectorized galloping merge over the two sorted
    frames; no per-key loop). Ties on equal ``on`` values within a key
    take the LAST right row in (on, original-order) sort — pin ties with
    a unique secondary column in ``on`` upstream if they matter. The
    right time column arrives renamed ``on+suffix`` so the matched
    timestamp is part of the output (and so the two sides never collide
    on the key name)."""
    from .common import bucketed_join, rename_cols

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    right_on = on + suffix
    right2 = rename_cols(right_ds, {on: right_on})

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.sort_values(on, kind="mergesort")
        rdf = rdf.sort_values(right_on, kind="mergesort")
        return pd.merge_asof(
            ldf,
            rdf,
            left_on=on,
            right_on=right_on,
            by=by,
            direction=direction,
            tolerance=tolerance,
        )

    return bucketed_join(left_ds, right2, on=by, merge_fn=merge, n_buckets=n_buckets)


def range_join(
    left_ds: "ray.data.Dataset",
    right_ds: "ray.data.Dataset",
    on: str,
    window,
    by: str | None = None,
    suffix: str = "_r",
    n_buckets: int = 64,
    merge_fn=None,
) -> "ray.data.Dataset":
    """Generic RANGE (band) join primitive: every left row pairs with every
    right row whose ``on`` lies in [left.on − window, left.on) — strictly
    earlier — optionally also matching an equality key ``by``. q27 is the
    COUNT instance; this primitive emits the PAIRS (left columns + right
    columns, shared names suffixed), with ``merge_fn(pairs_df) -> df`` as
    the per-bin hook to aggregate BEFORE anything leaves the task — pass
    it whenever the raw pair fan-out would be the biggest table in the
    job (at 100 TB it usually is).

    Distributed shape (q27's time-bin co-partition, via bucketed_join's
    tagged-union exchange keyed on the bin): bin the time axis at
    ``window`` width; a left row in bin k needs rights only from bins
    {k−1, k}, so each right is emitted to its own bin and the next — ONE
    shuffle co-locates every candidate pair exactly once. In-bin: sort
    rights once, two searchsorted probes per left row bound its matching
    slice, one repeat/take materializes the pairs — never an O(n²)
    product. Skew: a hot window concentrates in one bin; shrink the bin
    width below ``window`` and widen the right-emit fan-out at cluster
    scale (same math, documented in q27)."""
    import numpy as np

    from .common import bucketed_join, rename_cols

    w = window if isinstance(window, pd.Timedelta) else pd.Timedelta(window)
    right_on = on + suffix
    by_r = (by + suffix) if by else None
    lnames = list(left_ds.schema().names)
    rnames = list(right_ds.schema().names)
    overlap = (set(lnames) & set(rnames)) - {on} - ({by} if by else set())
    if overlap:
        raise ValueError(f"non-key column overlap: {sorted(overlap)}")
    ren = {on: right_on}
    if by:
        ren[by] = by_r
    right1 = rename_cols(right_ds, ren)

    def _bins(ts: pd.Series) -> pd.Series:
        return (ts.astype("datetime64[ns]").astype("int64") // int(w.value)).astype("int64")

    def stamp_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_bin"] = _bins(out[on])
        return out

    def stamp_right(df: pd.DataFrame) -> pd.DataFrame:
        bins = _bins(df[right_on])
        a = df.copy()
        a["_bin"] = bins
        b = df.copy()
        b["_bin"] = bins + 1
        return pd.concat([a, b], ignore_index=True)

    left2 = left_ds.map_batches(stamp_left, batch_format="pandas", batch_size=65536)
    right2 = right1.map_batches(stamp_right, batch_format="pandas", batch_size=65536)

    out_lcols = lnames  # original order, no _bin
    out_rcols = [right_on] + [c for c in rnames if c not in (on, by)]
    lkeys = ["_bin"] + ([by] if by else [])
    rkeys = ["_bin"] + ([by_r] if by else [])

    def pairs_merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        rgroups = dict(iter(rdf.groupby(rkeys, sort=False)))
        for k, lg in ldf.groupby(lkeys, sort=False):
            rg = rgroups.get(k)
            if rg is None or lg.empty:
                continue
            rts = rg[right_on].to_numpy().astype("datetime64[ns]").astype("int64")
            order = np.argsort(rts, kind="stable")
            rts = rts[order]
            lt = lg[on].to_numpy().astype("datetime64[ns]").astype("int64")
            lo = np.searchsorted(rts, lt - int(w.value), side="left")
            hi = np.searchsorted(rts, lt, side="left")
            n = hi - lo
            total = int(n.sum())
            if not total:
                continue
            li = np.repeat(np.arange(len(lg)), n)
            ri = order[
                np.concatenate([np.arange(a, b) for a, b in zip(lo, hi) if b > a])
            ]
            lpart = lg.iloc[li][out_lcols].reset_index(drop=True)
            rpart = rg.iloc[ri][out_rcols].reset_index(drop=True)
            outs.append(pd.concat([lpart, rpart], axis=1))
        if not outs:
            out = pd.DataFrame(
                {
                    **{c: pd.Series(dtype=ldf[c].dtype) for c in out_lcols},
                    **{c: pd.Series(dtype=rdf[c].dtype) for c in out_rcols},
                }
            )
        else:
            out = pd.concat(outs, ignore_index=True)
        return merge_fn(out) if merge_fn is not None else out

    return bucketed_join(left2, right2, on="_bin", merge_fn=pairs_merge, n_buckets=n_buckets)


def window_agg(
    ds: "ray.data.Dataset",
    on: str,
    by: str | None,
    aggs: dict,
    kind: str = "tumbling",
    width=None,
    slide=None,
    gap=None,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Generic WINDOWED AGGREGATE primitive — the third custom-operator
    slot next to asof_join and range_join, unifying the three window
    disciplines the per-query forms (q18/q28/q21) implement separately:

      kind="tumbling": fixed ``width`` windows aligned to the epoch;
      kind="sliding":  ``width`` windows every ``slide`` (width/slide
                       overlapping windows per row);
      kind="session":  per-``by`` gap sessions (> ``gap`` starts a new
                       window) — requires ``by``.

    ``aggs`` is a pandas named-agg dict {out_col: (in_col, fn)} where fn
    is any DECOMPOSABLE pandas agg name ('sum', 'size', 'min', 'max',
    'mean') — tumbling/sliding run per-batch partials BEFORE the one
    bucketed shuffle and re-apply the same agg to combine, so only those
    are exact there (size combines by sum; mean decomposes to hidden
    sum/size partials divided at combine); session windows
    group raw rows inside the by-bucket (gap assignment needs the key's
    full ordered history), so any pandas agg name works. Window identity:
    window_start (epoch-aligned timestamp for time windows; the session's
    first event time for sessions)."""
    import numpy as np

    if kind not in ("tumbling", "sliding", "session"):
        raise ValueError(f"unknown window kind {kind!r}")
    keys = [by] if by else []

    if kind == "session":
        if by is None or gap is None:
            raise ValueError("session windows require by= and gap=")
        g = gap if isinstance(gap, pd.Timedelta) else pd.Timedelta(gap)

        def final(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values([by, on], kind="mergesort")
            prev = df.groupby(by)[on].shift()
            new_s = (prev.isna() | ((df[on] - prev) > g)).astype("int64")
            sid = new_s.groupby(df[by].to_numpy()).cumsum()
            df = df.assign(_sid=sid.to_numpy())
            out = df.groupby([by, "_sid"], as_index=False).agg(
                window_start=(on, "min"), **aggs
            )
            out["window_start"] = out["window_start"].astype("datetime64[us]")
            return out.drop(columns=["_sid"])

        return bucketed_group_agg(ds, [by], final, n_buckets=n_buckets)

    w = width if isinstance(width, pd.Timedelta) else pd.Timedelta(width)
    s = None
    if kind == "sliding":
        s = slide if isinstance(slide, pd.Timedelta) else pd.Timedelta(slide)
        if int(w.value) % int(s.value):
            raise ValueError("width must be a multiple of slide")

    # 'mean' decomposes to hidden (sum, size) partials combined by division;
    # everything else must be self-combining
    mean_names = [name for name, spec in aggs.items() if spec[1] == "mean"]
    part_aggs = {
        name: spec for name, spec in aggs.items() if spec[1] != "mean"
    }
    for name in mean_names:
        col = aggs[name][0]
        part_aggs[f"_{name}_s"] = (col, "sum")
        # 'count' (not 'size'): pandas mean skips NaN, so the denominator
        # must count non-null values only; counts combine by sum
        part_aggs[f"_{name}_n"] = (col, "count")
    combine_fn = {
        name: ("sum" if spec[1] in ("size", "count") else spec[1])
        for name, spec in part_aggs.items()
    }
    allowed = {"sum", "size", "count", "min", "max"}
    bad = {spec[1] for spec in part_aggs.values()} - allowed
    if bad:
        raise ValueError(f"non-decomposable aggs for {kind} windows: {sorted(bad)}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ns = df[on].astype("datetime64[ns]").astype("int64")
        if kind == "tumbling":
            starts = [ns // int(w.value) * int(w.value)]
        else:
            last = ns // int(s.value) * int(s.value)  # last window start <= t
            k = int(w.value) // int(s.value)
            starts = [last - i * int(s.value) for i in range(k)]
        outs = []
        for st in starts:
            d = df.assign(window_start=st.astype("datetime64[ns]"))
            outs.append(
                d.groupby(keys + ["window_start"], as_index=False).agg(**part_aggs)
            )
        return pd.concat(outs, ignore_index=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(keys + ["window_start"], as_index=False).agg(
            **{name: (name, fn) for name, fn in combine_fn.items()}
        )
        for name in mean_names:
            out[name] = out[f"_{name}_s"] / out[f"_{name}_n"]
        if mean_names:
            out = out.drop(
                columns=[f"_{n}_s" for n in mean_names] + [f"_{n}_n" for n in mean_names]
            )
            out = out[keys + ["window_start"] + list(aggs)]
        out["window_start"] = out["window_start"].astype("datetime64[us]")
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, keys + ["window_start"], final, n_buckets=n_buckets)


def q146_dau_jaccard(sf_dir: str) -> pd.DataFrame:
    """Day-over-day audience similarity: for each day with an active
    previous day, the Jaccard overlap of the two days' DISTINCT user sets
    — the churn/stability screen next to q104's rolling distinct and q59's
    cohort matrix (neither expresses 'same users as yesterday?'). Exact
    distributed form: collapse to DISTINCT (user, day) pairs per batch,
    then ONE user-bucket shuffle co-locates each user's day set; in-bucket
    a sorted grouped shift finds consecutive-day hits, and both the
    per-day active counts and the per-day both-days counts leave the
    bucket as calendar-bounded partials (days x buckets rows), so the
    driver reduce is calendar-sized, never user- or event-sized. The
    Jaccard division runs on exact int64 counts on both oracle sides."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"], "day": df["ts"].dt.floor("D")}
        ).drop_duplicates()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates().sort_values(["user_id", "day"], kind="mergesort")
        u = d["user_id"].to_numpy()
        days = d["day"].to_numpy().astype("datetime64[D]").astype(np.int64)
        cur = pd.Series(days).value_counts().rename_axis("day").reset_index(name="n_cur")
        both_mask = (u[1:] == u[:-1]) & (days[1:] - days[:-1] == 1)
        both = (
            pd.Series(days[1:][both_mask])
            .value_counts()
            .rename_axis("day")
            .reset_index(name="n_both")
        )
        out = cur.merge(both, on="day", how="left").fillna({"n_both": 0})
        return out.astype({"day": "int64", "n_cur": "int64", "n_both": "int64"})

    parts = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["user_id"],
        final,
        n_buckets=32,
    ).to_pandas()

    agg = parts.groupby("day", as_index=False).agg(
        n_cur=("n_cur", "sum"), n_both=("n_both", "sum")
    )
    agg = agg.sort_values("day", kind="mergesort").reset_index(drop=True)
    prev = agg.set_index("day")["n_cur"]
    agg["n_prev"] = (agg["day"] - 1).map(prev)
    agg = agg.dropna(subset=["n_prev"])
    n_cur = agg["n_cur"].to_numpy(dtype="int64")
    n_prev = agg["n_prev"].to_numpy(dtype="int64")
    n_both = agg["n_both"].to_numpy(dtype="int64")
    jac = round_away(n_both.astype("float64") / (n_cur + n_prev - n_both), 4)
    return pd.DataFrame(
        {
            "day": agg["day"].to_numpy().astype("datetime64[D]").astype("datetime64[us]"),
            "n_cur": n_cur,
            "n_prev": n_prev,
            "n_both": n_both,
            "jaccard": jac,
        }
    )


def q147_time_to_convert(sf_dir: str) -> "ray.data.Dataset":
    """Cohort time-to-convert: per signup-week cohort, how many users made
    a purchase at-or-after their first signup, and the exact median
    microseconds from signup to first qualifying purchase — the activation
    metric next to q58's funnel counts and q59's retention matrix. Two
    shuffles, both bounded: stage 1 filters the event stream to the two
    participating types (the only raw-row exchange) and ONE user-bucket
    shuffle resolves each user's first-signup / first-purchase-after pair
    with a vectorized conditional-min scan; stage 2 moves ONE 16-byte row
    per CONVERTED user, bucketed by cohort week, and computes the holistic
    median in-bucket (whole-cohort co-location — q40/q48's documented
    shape; the sketch fallback in pipelines/sketches.py applies when a
    single cohort outgrows a task). The median interpolation is
    quantile_cont's (n-1)/2 rule on exact int64 microsecond diffs, so both
    oracle sides interpolate identical values."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["event_type"].isin(["signup", "purchase"])]

    def pair_final(df: pd.DataFrame) -> pd.DataFrame:
        s = df.loc[df["event_type"] == "signup"].groupby("user_id")["ts"].min()
        p = df.loc[df["event_type"] == "purchase", ["user_id", "ts"]].merge(
            s.rename("sts"), left_on="user_id", right_index=True, how="inner"
        )
        p = p.loc[p["ts"] >= p["sts"]]
        if len(p) == 0:
            return pd.DataFrame(
                {
                    "cohort_week": pd.Series([], dtype="datetime64[us]"),
                    "diff_us": pd.Series([], dtype="int64"),
                }
            )
        first = p.groupby("user_id", as_index=False).agg(
            pts=("ts", "min"), sts=("sts", "first")
        )
        sts = first["sts"].astype("datetime64[us]")
        week = sts.dt.normalize() - pd.to_timedelta(sts.dt.dayofweek, unit="D")
        diff = first["pts"].astype("datetime64[us]").astype("int64") - sts.astype("int64")
        return pd.DataFrame(
            {"cohort_week": week.astype("datetime64[us]"), "diff_us": diff.astype("int64")}
        )

    pairs = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["user_id"],
        pair_final,
        n_buckets=32,
    )

    def cohort_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cohort_week", as_index=False).agg(
            n_converted=("diff_us", "size"), median_us=("diff_us", "median")
        )
        g["cohort_week"] = g["cohort_week"].astype("datetime64[us]")
        g["n_converted"] = g["n_converted"].astype("int64")
        g["median_us"] = g["median_us"].astype("float64")
        return g

    return bucketed_group_agg(pairs, ["cohort_week"], cohort_final, n_buckets=8)


def q152_daily_bounce_rate(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Daily bounce rate: share of sessions (q21's 30-minute-gap
    discipline) containing exactly ONE event, keyed by the session's start
    day — the engagement-quality screen a per-event or per-window count
    can't express because 'bounce' is a property of the whole session.
    ONE user-bucket shuffle runs the vectorized gaps-and-islands
    sessionizer in-bucket and collapses sessions straight to per-day
    (n_sessions, n_bounces) partials (calendar-bounded), then a tiny
    two-phase day reduce computes the rate on exact int64 counts."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def session_final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev_ts = df.groupby("user_id")["ts"].shift()
        new_session = (prev_ts.isna() | ((df["ts"] - prev_ts) > gap)).astype("int64")
        sid = new_session.groupby(df["user_id"]).cumsum()
        ses = (
            pd.DataFrame({"user_id": df["user_id"], "sid": sid, "ts": df["ts"]})
            .groupby(["user_id", "sid"], as_index=False)
            .agg(start=("ts", "min"), n=("ts", "size"))
        )
        day = ses["start"].dt.floor("D")
        out = pd.DataFrame({"day": day, "bounce": (ses["n"] == 1).astype("int64")})
        g = out.groupby("day", as_index=False).agg(
            p_sessions=("bounce", "size"), p_bounces=("bounce", "sum")
        )
        return g.astype({"p_sessions": "int64", "p_bounces": "int64"})

    parts = bucketed_group_agg(ds, ["user_id"], session_final, n_buckets=32)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", as_index=False).agg(
            n_sessions=("p_sessions", "sum"), n_bounces=("p_bounces", "sum")
        )
        return pd.DataFrame(
            {
                "day": g["day"].astype("datetime64[us]"),
                "n_sessions": g["n_sessions"].astype("int64"),
                "n_bounces": g["n_bounces"].astype("int64"),
                "bounce_rate": round_away(
                    g["n_bounces"].to_numpy(dtype="float64")
                    / g["n_sessions"].to_numpy(dtype="float64"),
                    4,
                ),
            }
        )

    return bucketed_group_agg(parts, ["day"], final, n_buckets=8)


def q153_new_vs_returning(sf_dir: str) -> "ray.data.Dataset":
    """Daily new-vs-returning active-user split: a user counts as NEW on
    their first-ever active day and RETURNING on every later active day —
    the acquisition-vs-retention dashboard row that q59's cohort matrix
    aggregates away. Exact distributed form: DISTINCT (user, day) pairs
    through ONE user-bucket shuffle; in-bucket each user's min day marks
    the new row and the rest are returning, leaving calendar-bounded
    (day, n_new, n_returning) partials for a tiny day reduce."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"], "day": df["ts"].dt.floor("D")}
        ).drop_duplicates()

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        first = d.groupby("user_id")["day"].transform("min")
        out = pd.DataFrame({"day": d["day"], "new": (d["day"] == first).astype("int64")})
        g = out.groupby("day", as_index=False).agg(p_new=("new", "sum"), p_all=("new", "size"))
        return g.astype({"p_new": "int64", "p_all": "int64"})

    parts = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["user_id"],
        per_user,
        n_buckets=32,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", as_index=False).agg(n_new=("p_new", "sum"), n_all=("p_all", "sum"))
        return pd.DataFrame(
            {
                "day": g["day"].astype("datetime64[us]"),
                "n_new": g["n_new"].astype("int64"),
                "n_returning": (g["n_all"] - g["n_new"]).astype("int64"),
            }
        )

    return bucketed_group_agg(parts, ["day"], final, n_buckets=8)


def q159_double_charge(sf_dir: str, window_s: int = 60) -> "ray.data.Dataset":
    """Double-charge screen (payments fraud/data-glitch audit): per DAY,
    how many events have ANOTHER event by the same user with the IDENTICAL
    value within ``window_s`` seconds — the near-duplicate-transaction
    shape that exact dedup (q11) misses because the rows differ in
    id/timestamp. Exact distributed form: ONE user-bucket shuffle;
    in-bucket rows sort by (user, value, ts), where 'any same-value event
    within the window' reduces to the sorted NEIGHBOR check (the
    nearest-in-time qualifying event is adjacent in this order), one
    vectorized shift compare, calendar-bounded (day, n_events, n_flagged)
    partials out — so the report stays day-sized and zero-filled days
    survive even when the screen finds nothing. Value matching is exact
    float64 equality: both oracle sides read the same parquet doubles."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["user_id", "value", "ts"])
    w_us = int(window_s) * 1_000_000

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "value", "ts"], kind="mergesort")
        u = d["user_id"].to_numpy()
        v = d["value"].to_numpy()
        t = d["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        flagged = np.zeros(len(d), dtype=bool)
        if len(d) > 1:
            hit = (u[1:] == u[:-1]) & (v[1:] == v[:-1]) & ((t[1:] - t[:-1]) <= w_us)
            flagged[1:] |= hit
            flagged[:-1] |= hit
        out = pd.DataFrame({"day": d["ts"].dt.floor("D"), "f": flagged.astype("int64")})
        g = out.groupby("day", as_index=False).agg(p_events=("f", "size"), p_flagged=("f", "sum"))
        return g.astype({"p_events": "int64", "p_flagged": "int64"})

    parts = bucketed_group_agg(ds, ["user_id"], final, n_buckets=32)

    def day_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", as_index=False).agg(
            n_events=("p_events", "sum"), n_flagged=("p_flagged", "sum")
        )
        g["day"] = g["day"].astype("datetime64[us]")
        return g.astype({"n_events": "int64", "n_flagged": "int64"})

    return bucketed_group_agg(parts, ["day"], day_final, n_buckets=8)


def q164_cusum_changepoint(sf_dir: str) -> pd.DataFrame:
    """CUSUM changepoint estimate per event type: the day where the
    cumulative deviation of the daily mean value from the series mean
    peaks — the classic level-shift detector (argmax |Σ_{i<=d}(x_i − μ)|).
    Distributed part is one bounded (type, day) exact-cents reduce (q113's
    partial shape); the changepoint scan is driver math on the
    calendar-sized table. Exactness: daily means are rounded to the 4dp
    grid, scaled to int64, and the deviation is computed in the CLEARED
    form C'_d = D·cumsum_d − d·total (all integer), so there is no float
    accumulation anywhere and ties break to the earliest day identically
    on both oracle sides."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": df["ts"].dt.floor("D"),
                "cents": np.rint(df["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64),
            }
        )
        return d.groupby(["event_type", "day"], as_index=False).agg(
            p_sum=("cents", "sum"), p_n=("cents", "size")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "day"], as_index=False).agg(
            p_sum=("p_sum", "sum"), p_n=("p_n", "sum")
        )
        return g.astype({"p_sum": "int64", "p_n": "int64"})

    daily = (
        bucketed_group_agg(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["event_type", "day"],
            final,
            n_buckets=8,
        )
        .to_pandas()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    # daily mean on the 4dp grid, scaled to int64 (x4 = round(mean*10000))
    mean = (daily["p_sum"].to_numpy(dtype=np.float64) / 100.0) / daily["p_n"].to_numpy(
        dtype=np.float64
    )
    daily["x4"] = np.rint(round_away(mean, 4) * 10000.0).astype(np.int64)
    out = []
    for t, g in daily.groupby("event_type", sort=True):
        x = g["x4"].to_numpy(dtype=np.int64)
        days = g["day"].to_numpy().astype("datetime64[us]")
        D = len(x)
        tot = int(x.sum())
        cum = np.cumsum(x)
        dev = D * cum - np.arange(1, D + 1, dtype=np.int64) * tot
        a = np.abs(dev)
        best = int(np.argmax(a))  # np.argmax returns the FIRST max — earliest day
        out.append(
            {
                "event_type": t,
                "change_day": days[best],
                "n_days": D,
                "peak_dev": int(a[best]),
            }
        )
    res = pd.DataFrame(out)
    res["change_day"] = res["change_day"].astype("datetime64[us]")
    return res.astype({"n_days": "int64", "peak_dev": "int64"})


def q165_open_order_backlog(sf_dir: str) -> pd.DataFrame:
    """Daily open-order backlog: for each day, how many orders are placed
    but not yet fully shipped (orderdate <= day < last shipdate) — the
    interval-STABBING count (concurrent sessions / live connections /
    WIP inventory), a different family from q91's interval MERGE: here
    overlapping intervals are counted, not coalesced. Exact distributed
    form: each order's [start, end) interval comes from ONE
    orderkey-bucketed join (lineitem max-shipdate partials meet orders —
    q151's fact-to-fact shape, merge_fn emits ±1 DELTA partials keyed by
    day, so nothing order-sized leaves the join); the running sum over the
    calendar-bounded delta table is the backlog, integer-exact, scanned in
    day order on both oracle sides."""
    import numpy as np

    from .common import bucketed_join

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def ship_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_orderkey", as_index=False)["l_shipdate"].max()

    li = li.map_batches(ship_partial, batch_format="pandas", batch_size=65536)
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"o_orderkey": "l_orderkey"})

    orders = orders.map_batches(rename, batch_format="pandas", batch_size=65536)

    def merge_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        lmax = left.groupby("l_orderkey", as_index=False)["l_shipdate"].max()
        m = lmax.merge(right, on="l_orderkey")
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "day": pd.Series([], dtype="datetime64[us]"),
                    "delta": pd.Series([], dtype="int64"),
                }
            )
        deltas = pd.concat(
            [
                pd.DataFrame({"day": m["o_orderdate"].astype("datetime64[us]"), "delta": 1}),
                pd.DataFrame({"day": m["l_shipdate"].astype("datetime64[us]"), "delta": -1}),
            ],
            ignore_index=True,
        )
        g = deltas.groupby("day", as_index=False)["delta"].sum()
        return g.astype({"delta": "int64"})

    parts = bucketed_join(li, orders, on="l_orderkey", n_buckets=32, merge_fn=merge_fn)
    agg = (
        parts.to_pandas()
        .groupby("day", as_index=False)["delta"]
        .sum()
        .sort_values("day", kind="mergesort")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "day": agg["day"].astype("datetime64[us]"),
            "open_orders": np.cumsum(agg["delta"].to_numpy(dtype=np.int64)).astype("int64"),
        }
    )


def q166_session_duration_quantiles(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session-duration distribution summary: exact p50/p90 of session
    lengths (last-event minus first-event, whole seconds) across all
    q21-discipline sessions — the engagement-depth companion to q152's
    bounce rate. ONE user-bucket shuffle sessionizes in-bucket and
    collapses sessions to a (duration_s, count) histogram partial —
    durations floor to whole seconds, so the grid is bounded by the
    longest session, not the session count — and the exact interpolated
    quantiles come off the merged histogram with the (n-1)*q rule
    (identical to quantile_cont, as pinned by q145's _wq_interp)."""
    import numpy as np

    from ethiomart_amharic_ner_ray.pipelines.relational import _wq_interp

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev_ts = d.groupby("user_id")["ts"].shift()
        new_session = (prev_ts.isna() | ((d["ts"] - prev_ts) > gap)).astype("int64")
        sid = new_session.groupby(d["user_id"]).cumsum()
        ses = (
            pd.DataFrame({"user_id": d["user_id"], "sid": sid, "ts": d["ts"]})
            .groupby(["user_id", "sid"])
            .agg(lo=("ts", "min"), hi=("ts", "max"), n=("ts", "size"))
        )
        ses = ses.loc[ses["n"] >= 2]  # single-event sessions have no duration
        dur = (
            ses["hi"].to_numpy().astype("datetime64[us]").astype(np.int64)
            - ses["lo"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ) // 1_000_000
        g = pd.DataFrame({"duration_s": dur}).groupby("duration_s", as_index=False).size()
        return g.rename(columns={"size": "cnt"}).astype({"duration_s": "int64", "cnt": "int64"})

    hist = (
        bucketed_group_agg(ds, ["user_id"], final, n_buckets=32)
        .to_pandas()
        .groupby("duration_s", as_index=False)["cnt"]
        .sum()
        .sort_values("duration_s", kind="mergesort")
    )
    v = hist["duration_s"].to_numpy(dtype=np.float64)
    c = hist["cnt"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "n_sessions": np.array([int(c.sum())], dtype=np.int64),
            "p50_s": [round_away(np.array([_wq_interp(v, c, 0.5)]), 4)[0]],
            "p90_s": [round_away(np.array([_wq_interp(v, c, 0.9)]), 4)[0]],
        }
    )


def q168_retention_curve(sf_dir: str) -> pd.DataFrame:
    """User-activity survival curve: S(d) = share of users still active d
    or more days after their FIRST event (activity span = last-day minus
    first-day) — the monotone retention curve the q59 cohort matrix slices
    by calendar week; one curve for the whole corpus is the product
    health-line. Exact distributed form: per-user (min day, max day) rides
    ONE user-bucket shuffle as two-scalar partials; spans collapse to a
    bounded (span_days, n_users) histogram, and the survival curve is a
    reverse cumulative sum over that calendar-bounded table — integer
    counts, one division per point, identical on both oracle sides."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "day": df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64),
            }
        )
        return d.groupby("user_id", as_index=False).agg(p_lo=("day", "min"), p_hi=("day", "max"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).agg(lo=("p_lo", "min"), hi=("p_hi", "max"))
        span = (g["hi"] - g["lo"]).astype("int64")
        h = pd.DataFrame({"span_days": span}).groupby("span_days", as_index=False).size()
        return h.rename(columns={"size": "n_users"}).astype(
            {"span_days": "int64", "n_users": "int64"}
        )

    hist = (
        bucketed_group_agg(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["user_id"],
            final,
            n_buckets=32,
        )
        .to_pandas()
        .groupby("span_days", as_index=False)["n_users"]
        .sum()
        .sort_values("span_days", kind="mergesort")
        .reset_index(drop=True)
    )
    n = hist["n_users"].to_numpy(dtype=np.int64)
    total = int(n.sum())
    surviving = total - np.concatenate([[0], np.cumsum(n)[:-1]])
    return pd.DataFrame(
        {
            "span_days": hist["span_days"].astype("int64"),
            "n_users": hist["n_users"].astype("int64"),
            "surviving": surviving.astype("int64"),
            "retention": round_away(surviving.astype(np.float64) / float(total), 6),
        }
    )


def q178_share_swing(sf_dir: str) -> pd.DataFrame:
    """Mix-stability screen: each event type's maximum day-over-day swing
    in its share of daily traffic — the composition-drift alarm (a type
    whose share jumps 20 points overnight usually means an instrumentation
    change, not user behavior). One bounded (day, type) count exchange;
    shares, consecutive-day diffs and the max are driver math on the
    calendar-sized table (max is order-free, so no float-accumulation
    hazard)."""
    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"event_type": df["event_type"], "day": df["ts"].dt.floor("D")})
        return d.groupby(["event_type", "day"], as_index=False).size().rename(
            columns={"size": "p_n"}
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "day"], as_index=False)["p_n"].sum()
        return g.astype({"p_n": "int64"})

    counts = (
        bucketed_group_agg(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["event_type", "day"],
            final,
            n_buckets=8,
        )
        .to_pandas()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    tot = counts.groupby("day")["p_n"].transform("sum").to_numpy(dtype=np.float64)
    counts["share"] = counts["p_n"].to_numpy(dtype=np.float64) / tot
    out = []
    for t, g in counts.groupby("event_type", sort=True):
        s = g["share"].to_numpy()
        days = g["day"].to_numpy().astype("datetime64[D]").astype(np.int64)
        if len(s) > 1:
            consec = (days[1:] - days[:-1]) == 1
            swings = np.abs(s[1:] - s[:-1])[consec]
        else:
            swings = np.array([])
        out.append(
            {
                "event_type": t,
                "n_days": len(s),
                "max_swing": float(round_away(np.array([swings.max() if len(swings) else 0.0]), 6)[0]),
            }
        )
    return pd.DataFrame(out).astype({"n_days": "int64"})


def q183_hourly_load_p95(sf_dir: str) -> pd.DataFrame:
    """Capacity-planning curve: for each hour-of-day, the p95 of that
    hour's PER-DAY event count — the provisioning number (mean load hides
    the bursts you size for). One bounded (hour-of-day, day) count
    exchange; each hour's daily-count multiset is a small histogram and
    the exact interpolated p95 comes off it with the quantile_cont rule
    (bitwise via _wq_interp). Hours with zero events on a day simply don't
    appear — identical on both oracle sides."""
    import numpy as np

    from ethiomart_amharic_ner_ray.pipelines.relational import _wq_interp

    ds = read_table(sf_dir, "events", columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"hod": df["ts"].dt.hour.astype("int64"), "day": df["ts"].dt.floor("D")}
        )
        return d.groupby(["hod", "day"], as_index=False).size().rename(columns={"size": "p_n"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["hod", "day"], as_index=False)["p_n"].sum()
        return g.astype({"p_n": "int64"})

    daily = (
        bucketed_group_agg(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["hod", "day"],
            final,
            n_buckets=8,
        )
        .to_pandas()
    )
    out = []
    for hod, g in daily.groupby("hod", sort=True):
        h = g.groupby("p_n", as_index=False).size().sort_values("p_n", kind="mergesort")
        v = h["p_n"].to_numpy(dtype=np.float64)
        c = h["size"].to_numpy(dtype=np.int64)
        out.append(
            {
                "hod": int(hod),
                "n_days": int(c.sum()),
                "p95_events": float(round_away(np.array([_wq_interp(v, c, 0.95)]), 4)[0]),
            }
        )
    return pd.DataFrame(out).astype({"hod": "int64", "n_days": "int64"})


def q184_weekly_control_chart(sf_dir: str) -> pd.DataFrame:
    """Shewhart control chart over weekly revenue: which weeks fall outside
    the mean ± 2σ band of ALL weekly totals — the steady-state monitor
    next to q164's CUSUM (CUSUM finds the one level shift; the control
    chart flags every excursion week). Weekly totals are exact int64
    cents through one calendar-bounded exchange; the band is computed from
    those exact integers (sample σ over weeks) and the per-week compare
    uses the identical expression in the SQL oracle."""
    import numpy as np

    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dt = df["o_orderdate"].astype("datetime64[us]")
        week = (dt.dt.normalize() - pd.to_timedelta(dt.dt.dayofweek, unit="D")).astype(
            "datetime64[us]"
        )
        d = pd.DataFrame(
            {
                "week": week,
                "cents": np.rint(df["o_totalprice"].to_numpy(dtype=np.float64) * 100).astype(
                    np.int64
                ),
            }
        )
        return d.groupby("week", as_index=False)["cents"].sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("week", as_index=False)["cents"].sum()
        return g.astype({"cents": "int64"})

    weekly = (
        bucketed_group_agg(
            ds.map_batches(partial, batch_format="pandas", batch_size=65536),
            ["week"],
            final,
            n_buckets=8,
        )
        .to_pandas()
        .sort_values("week", kind="mergesort")
        .reset_index(drop=True)
    )
    c = weekly["cents"].to_numpy(dtype=np.int64)
    n = len(c)
    s = float(c.sum())
    # c*c overflows int64 for ~1e9-cent weeks (numpy wraps SILENTLY while
    # DuckDB's sum promotes to HUGEINT) — the calendar-sized table makes
    # exact Python ints free, and float() then rounds once like the SQL's
    # CAST(HUGEINT AS DOUBLE)
    s2 = float(sum(int(x) * int(x) for x in c))
    mean = s / n
    sd = np.sqrt((s2 - s * s / n) / (n - 1.0)) if n > 1 else 0.0
    rev = c.astype(np.float64) / 100.0
    lo = (mean - 2.0 * sd) / 100.0
    hi = (mean + 2.0 * sd) / 100.0
    flag = ((rev < lo) | (rev > hi)).astype("int64")
    return pd.DataFrame(
        {
            "week": weekly["week"].astype("datetime64[us]"),
            "revenue": round_away(rev, 2),
            "out_of_band": flag,
        }
    )


def q189_user_burstiness(sf_dir: str) -> "ray.data.Dataset":
    """Burstiness index per user (Goh & Barabási): B = (σ−μ)/(σ+μ) over
    the inter-event gaps — B→−1 for metronome users, 0 for Poisson, →+1
    for bursty ones; the behavioral-regularity signal q36's mean/max
    misses. Same partition discipline as q36: ONE user_id-bucket shuffle,
    in-bucket grouped shift-and-diff over (ts, event_id)-sorted rows.

    Exactness (r5, ADVICE — the q196 house convention): σ comes from the
    explicit (n, Σg, Σg²) sums over exact MICROSECOND int64 gaps, not a
    built-in std — np.std's two-pass result differs from stddev_pop in the
    last bits, which can flip a 6-decimal rounding boundary. Σg² overflows
    int64 (a half-year gap squared is ~2.6e26), so it accumulates as
    arbitrary-precision Python int, matching the oracle's HUGEINT; both
    sides then evaluate the IDENTICAL double expression
    sqrt(max(q/n − (s/n)², 0)) with one int→double rounding each (the max
    clamps the ≈0-variance case, where float cancellation can land at −ε
    and DuckDB's sqrt raises instead of returning NaN). B is unit-scale-
    invariant, so the µs→s division drops out entirely. Users need ≥2 gaps
    and Σg > 0 (⇔ μ+σ > 0 for non-negative gaps) — both integer
    conditions, so the oracle's HAVING lands identically. The per-user
    Python loop runs over the bucket's user count (bounded by the group
    key, not the event count) with dim-bounded state per user."""
    import math

    import numpy as np

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id")["ts"].shift()
        gap = (
            df["ts"].astype("datetime64[us]").astype("int64")
            - prev.astype("datetime64[us]").astype("int64")
        ).astype("float64")
        gap[prev.isna()] = np.nan
        g = pd.DataFrame({"user_id": df["user_id"], "gap": gap}).dropna(subset=["gap"])
        uids, ns, bs = [], [], []
        for uid, gg in g.groupby("user_id"):
            v = gg["gap"].to_numpy(dtype="int64")  # µs diffs < 2^53: exact
            n = len(v)
            s = int(v.sum())
            if n < 2 or s <= 0:
                continue
            q = sum(int(x) * int(x) for x in v)  # exact, HUGEINT-parity
            sn = float(s) / n
            sd = math.sqrt(max(float(q) / n - sn * sn, 0.0))
            uids.append(uid)
            ns.append(n)
            bs.append((sd - sn) / (sd + sn))
        return pd.DataFrame(
            {
                "user_id": pd.Series(uids, dtype=g["user_id"].dtype),
                "n_gaps": pd.array(ns, dtype="int64"),
                "burstiness": round_away(np.array(bs, dtype="float64"), 6),
            }
        )

    return bucketed_group_agg(ds, ["user_id"], final, n_buckets=64)


def q217_event_type_cooccurrence(sf_dir: str) -> "pd.DataFrame":
    """Event-type co-occurrence within a (user, day) session — which
    behaviors happen TOGETHER on a user's active day, the unordered
    same-day pairing q97's sequential Markov matrix can't see. Per-batch
    (user, day, type) distinct projection collapses the event stream
    before the ONE user-bucket shuffle; in-bucket a vectorized self-merge
    per (user, day) expands distinct types to unordered pairs and the
    partial leaving each bucket is the types²-bounded pair matrix. Counts
    exact int64; the oracle is the identical distinct-projection self-join
    (a < b). The day value only defines grouping, never crosses to the
    output, so the pandas floor('D') vs SQL date_trunc representations
    need no cross-side parity."""
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "day": pd.to_datetime(df["ts"]).dt.floor("D"),
                "event_type": df["event_type"],
            }
        )
        return d.drop_duplicates()

    dedup = ds.map_batches(day_partial, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "day", "event_type"])
        m = d.merge(d, on=["user_id", "day"])
        m = m[m["event_type_x"] < m["event_type_y"]]
        if m.empty:
            return pd.DataFrame(
                {
                    "type_a": pd.array([], dtype="object"),
                    "type_b": pd.array([], dtype="object"),
                    "p_n": pd.array([], dtype="int64"),
                }
            )
        out = (
            m.groupby(["event_type_x", "event_type_y"], as_index=False)
            .size()
            .rename(columns={"event_type_x": "type_a", "event_type_y": "type_b", "size": "p_n"})
        )
        return out.astype({"p_n": "int64"})

    parts = bucketed_group_agg(dedup, ["user_id"], final, n_buckets=32).to_pandas()
    if "type_a" not in parts.columns or parts.empty:
        return pd.DataFrame(
            {
                "type_a": pd.array([], dtype="object"),
                "type_b": pd.array([], dtype="object"),
                "n_user_days": pd.array([], dtype="int64"),
            }
        )
    merged = parts.groupby(["type_a", "type_b"], as_index=False)["p_n"].sum()
    merged = merged.rename(columns={"p_n": "n_user_days"}).astype({"n_user_days": "int64"})
    return merged.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def q223_weekday_hour_heatmap(sf_dir: str) -> "pd.DataFrame":
    """Traffic heatmap: event counts by (ISO weekday, hour) — the
    7×24-cell operational load surface behind q198's weekday chi-square
    (capacity planning reads the hour axis the daily test collapses).
    Per-batch 168-cell exact partials, driver merge bounded by the grid;
    share a double ratio of exact counts."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(df["ts"])
        d = pd.DataFrame(
            {
                "isodow": t.dt.dayofweek.to_numpy(dtype=np.int64) + 1,
                "hour": t.dt.hour.to_numpy(dtype=np.int64),
                "p_n": np.ones(len(df), dtype=np.int64),
            }
        )
        return d.groupby(["isodow", "hour"], as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    g = parts.groupby(["isodow", "hour"], as_index=False)["p_n"].sum()
    total = int(g["p_n"].sum())
    return (
        pd.DataFrame(
            {
                "isodow": g["isodow"].astype("int64"),
                "hour": g["hour"].astype("int64"),
                "n_events": g["p_n"].astype("int64"),
                "share": round_away(g["p_n"].to_numpy(dtype="float64") / total, 6),
            }
        )
        .sort_values(["isodow", "hour"])
        .reset_index(drop=True)
    )


def q224_value_share_by_type(sf_dir: str) -> "pd.DataFrame":
    """Engagement-value concentration by event type — where the value
    mass actually sits (q19's count mix weighted by worth; a type with
    2 % of events and 40 % of value is the monetization surface). Values
    live on the 2dp grid, so per-batch partials are exact int64 CENTS
    (n, Σc) and the exchange is types-sized; totals and shares are double
    ratios of exact integers on both oracle sides."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        d = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "p_n": np.ones(len(df), dtype=np.int64),
                "p_s": c,
            }
        )
        return d.groupby("event_type", as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    g = parts.groupby("event_type", as_index=False).sum()
    total = int(g["p_s"].sum())
    return (
        pd.DataFrame(
            {
                "event_type": g["event_type"],
                "n_events": g["p_n"].astype("int64"),
                "total_value": round_away(g["p_s"].to_numpy(dtype="float64") / 100.0, 2),
                "value_share": round_away(g["p_s"].to_numpy(dtype="float64") / total, 6),
            }
        )
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def q226_user_lifespan_hist(sf_dir: str) -> "pd.DataFrame":
    """User-lifespan histogram — calendar days between a user's first and
    last event, the coarse stickiness curve the survival analysis
    (q-retention) refines: a mass at 0 days is one-session churn. Per
    user (min day, max day) rides ONE user-bucket shuffle as per-batch
    (user, min, max) partials; lifespan counts DAY-BOUNDARY crossings
    (date-truncated difference), an exact integer identical to the
    oracle's date_diff('day'); the second exchange is bounded by the
    dataset's calendar span."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = pd.to_datetime(df["ts"]).values.astype("datetime64[D]").astype(np.int64)
        d = pd.DataFrame({"user_id": df["user_id"], "d": day})
        g = d.groupby("user_id", as_index=False).agg(p_min=("d", "min"), p_max=("d", "max"))
        return g.astype({"p_min": "int64", "p_max": "int64"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).agg(mn=("p_min", "min"), mx=("p_max", "max"))
        span = (g["mx"] - g["mn"]).to_numpy(dtype=np.int64)
        h = pd.DataFrame({"lifespan_days": span}).groupby(
            "lifespan_days", as_index=False
        ).size().rename(columns={"size": "p_c"})
        return h.astype({"lifespan_days": "int64", "p_c": "int64"})

    parts = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["user_id"],
        final,
        n_buckets=8,
    ).to_pandas()
    merged = parts.groupby("lifespan_days", as_index=False)["p_c"].sum()
    return pd.DataFrame(
        {
            "lifespan_days": merged["lifespan_days"].astype("int64"),
            "n_users": merged["p_c"].astype("int64"),
        }
    ).sort_values("lifespan_days").reset_index(drop=True)
