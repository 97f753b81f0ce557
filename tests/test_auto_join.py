"""auto_join: the adaptive broadcast-vs-shuffle planner primitive. Both
strategies must produce identical rows; the decision must follow the size
estimate against the budget."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def _read(name, cols):
    from ethiomart_amharic_ner_ray.pipelines.common import read_table

    return read_table(SF_DIR, name, columns=cols)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)


@pytest.fixture()
def sides(ray_session):
    left = _read("orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    right = _read("customer", ["c_custkey", "c_mktsegment"])
    from ethiomart_amharic_ner_ray.pipelines.common import rename_cols

    right = rename_cols(right, {"c_custkey": "o_custkey"})
    return left, right


def test_broadcast_and_shuffle_agree(sides):
    from ethiomart_amharic_ner_ray.pipelines.common import auto_join

    left, right = sides
    d1, d2 = {}, {}
    bc = auto_join(left, right, "o_custkey", decision=d1).to_pandas()
    sh = auto_join(
        left, right, "o_custkey", broadcast_max_bytes=0, decision=d2
    ).to_pandas()
    assert d1["strategy"] == "broadcast"  # customer at sf0.001 is tiny
    assert d2["strategy"] == "shuffle"
    pd.testing.assert_frame_equal(_canon(bc), _canon(sh), check_dtype=False)
    # sanity: inner-join row count == orders rows with a matching customer
    lo = left.to_pandas()
    ro = right.to_pandas()
    assert len(bc) == lo["o_custkey"].isin(set(ro["o_custkey"])).sum()


def test_size_hint_overrides_estimate(sides):
    from ethiomart_amharic_ner_ray.pipelines.common import auto_join

    left, right = sides
    d = {}
    auto_join(left, right, "o_custkey", right_size_hint=1 << 40, decision=d)
    assert d["strategy"] == "shuffle" and d["estimated_bytes"] == 1 << 40


def test_non_key_overlap_rejected_on_both_paths(sides, ray_session):
    from ethiomart_amharic_ner_ray.pipelines.common import auto_join

    left, _ = sides
    for budget in (0, 1 << 40):
        with pytest.raises(ValueError, match="overlap"):
            auto_join(left, left, "o_custkey", broadcast_max_bytes=budget)


def test_merge_fn_applies_on_broadcast_path(sides):
    from ethiomart_amharic_ner_ray.pipelines.common import auto_join

    left, right = sides

    def semi(ldf, rdf):
        return ldf[ldf["o_custkey"].isin(set(rdf["o_custkey"]))]

    d1, d2 = {}, {}
    a = auto_join(left, right, "o_custkey", merge_fn=semi, decision=d1).to_pandas()
    b = auto_join(
        left, right, "o_custkey", merge_fn=semi, broadcast_max_bytes=0, decision=d2
    ).to_pandas()
    assert d1["strategy"] == "broadcast" and d2["strategy"] == "shuffle"
    pd.testing.assert_frame_equal(_canon(a), _canon(b), check_dtype=False)


class TestAsofJoinPrimitive:
    """Generic asof_join vs an O(n²) per-key brute force, all three
    directions, with and without tolerance. Only the matched timestamp is
    compared (equal-ts ties share it; payload tie-break is documented as
    last-in-sort)."""

    @pytest.fixture(scope="class")
    def frames(self, ray_session):
        import pyarrow.parquet as pq

        ev = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
        ).to_pandas()
        left = ev[ev["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
        right = ev[ev["event_type"] == "view"][["user_id", "ts"]].copy()
        right["view_n"] = range(len(right))
        return left, right

    def _brute(self, left, right, direction, tolerance):
        out = []
        for _, row in left.iterrows():
            cand = right[right["user_id"] == row["user_id"]]
            if direction == "backward":
                cand = cand[cand["ts"] <= row["ts"]]
                pick = cand["ts"].max() if len(cand) else pd.NaT
            elif direction == "forward":
                cand = cand[cand["ts"] >= row["ts"]]
                pick = cand["ts"].min() if len(cand) else pd.NaT
            else:
                if len(cand):
                    d = (cand["ts"] - row["ts"]).abs()
                    pick = cand.loc[d.idxmin(), "ts"]
                else:
                    pick = pd.NaT
            if tolerance is not None and pd.notna(pick) and abs(pick - row["ts"]) > tolerance:
                pick = pd.NaT
            out.append(pick)
        return pd.Series(out, index=left.index)

    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    def test_direction(self, frames, ray_session, direction):
        import ray.data

        from ethiomart_amharic_ner_ray.pipelines.windows import asof_join

        left, right = frames
        got = (
            asof_join(
                ray.data.from_pandas(left.reset_index(drop=True)),
                ray.data.from_pandas(right.reset_index(drop=True)),
                on="ts",
                by="user_id",
                direction=direction,
                n_buckets=8,
            )
            .to_pandas()
            .set_index("event_id")["ts_r"]
        )
        want = self._brute(left, right, direction, None)
        want.index = left["event_id"]
        got = got.sort_index()
        want = want.sort_index()
        assert len(got) == len(want)
        assert (got.isna() == want.isna()).all()
        m = want.notna()
        assert (got[m] == want[m]).all()

    def test_tolerance_bounds_matches(self, frames, ray_session):
        import ray.data

        from ethiomart_amharic_ner_ray.pipelines.windows import asof_join

        left, right = frames
        tol = pd.Timedelta(hours=6)
        got = (
            asof_join(
                ray.data.from_pandas(left.reset_index(drop=True)),
                ray.data.from_pandas(right.reset_index(drop=True)),
                on="ts",
                by="user_id",
                direction="backward",
                tolerance=tol,
                n_buckets=8,
            )
            .to_pandas()
            .set_index("event_id")["ts_r"]
            .sort_index()
        )
        want = self._brute(left, right, "backward", tol)
        want.index = left["event_id"]
        want = want.sort_index()
        assert (got.isna() == want.isna()).all()
        m = want.notna()
        assert (got[m] == want[m]).all()
        # tolerance must strictly reduce (or keep) the match count
        unbounded = self._brute(left, right, "backward", None)
        assert want.notna().sum() <= unbounded.notna().sum()

    def test_bad_direction_raises(self, ray_session, frames):
        import ray.data

        from ethiomart_amharic_ner_ray.pipelines.windows import asof_join

        left, right = frames
        with pytest.raises(ValueError, match="direction"):
            asof_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                on="ts",
                by="user_id",
                direction="sideways",
            )


class TestRangeJoinPrimitive:
    """Generic range_join vs brute force, with/without the equality key,
    and its COUNT instance cross-checked against q27 (independent
    implementation of the same bin co-partition)."""

    @pytest.fixture(scope="class")
    def ev(self, ray_session):
        import pyarrow.parquet as pq

        return pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
        ).to_pandas()

    def test_pairs_match_brute_force(self, ev, ray_session):
        import ray.data

        from ethiomart_amharic_ner_ray.pipelines.windows import range_join

        w = pd.Timedelta(minutes=30)
        left = ev[["event_id", "ts"]].head(300)
        right = ev[["ts", "value"]]
        pairs = range_join(
            ray.data.from_pandas(left.reset_index(drop=True)),
            ray.data.from_pandas(right.reset_index(drop=True)),
            on="ts",
            window=w,
            n_buckets=8,
        ).to_pandas()
        # brute force pair set
        want = set()
        rts = right["ts"].to_numpy()
        rvs = right["value"].to_numpy()
        for _, row in left.iterrows():
            m = (rts >= row["ts"] - w) & (rts < row["ts"])
            for t, v in zip(rts[m], rvs[m]):
                want.add((row["event_id"], pd.Timestamp(t), v))
        got = set(zip(pairs["event_id"], pairs["ts_r"], pairs["value"]))
        assert got == want

    def test_by_key_restricts_to_same_user(self, ev, ray_session):
        import ray.data

        from ethiomart_amharic_ner_ray.pipelines.windows import range_join

        w = pd.Timedelta(hours=12)
        left = ev[["event_id", "user_id", "ts"]].head(300)
        right = ev[["user_id", "ts", "value"]]
        pairs = range_join(
            ray.data.from_pandas(left.reset_index(drop=True)),
            ray.data.from_pandas(right.reset_index(drop=True)),
            on="ts",
            window=w,
            by="user_id",
            n_buckets=8,
        ).to_pandas()
        want = 0
        for _, row in left.iterrows():
            m = (
                (ev["user_id"] == row["user_id"])
                & (ev["ts"] >= row["ts"] - w)
                & (ev["ts"] < row["ts"])
            )
            want += int(m.sum())
        assert len(pairs) == want
        # every pair really is same-user and in-window
        m = pairs.merge(ev[["event_id", "user_id", "ts"]], on="event_id", suffixes=("", "_l"))
        assert (m["user_id"] == m["user_id_l"]).all()
        assert ((m["ts_r"] >= m["ts_l"] - w) & (m["ts_r"] < m["ts_l"])).all()

    def test_count_instance_matches_q27(self, ray_session):
        import __ray_entry__ as entrymod
        import ray.data

        from ethiomart_amharic_ner_ray.pipelines.common import read_table
        from ethiomart_amharic_ner_ray.pipelines.windows import range_join

        w = pd.Timedelta(minutes=5)
        left = read_table(SF_DIR, "events", columns=["event_id", "ts"])
        from ethiomart_amharic_ner_ray.pipelines.common import rename_cols

        right = rename_cols(
            read_table(SF_DIR, "events", columns=["event_id", "ts"]), {"event_id": "rhs_id"}
        )

        def count_per_left(pairs: pd.DataFrame) -> pd.DataFrame:
            return pairs.groupby("event_id", as_index=False).size().rename(
                columns={"size": "n_prior"}
            )

        got = (
            range_join(left, right, on="ts", window=w, merge_fn=count_per_left, n_buckets=8)
            .to_pandas()
            .set_index("event_id")["n_prior"]
        )
        q27 = (
            entrymod.queries()["q27_range_join_count"](SF_DIR)
            .to_pandas()
            .set_index("event_id")["n_prior"]
        )
        q27nz = q27[q27 > 0].sort_index()
        got = got.sort_index()
        assert got.index.tolist() == q27nz.index.tolist()
        assert (got.to_numpy() == q27nz.to_numpy()).all()


class TestWindowAggPrimitive:
    """window_agg must reproduce the three SQL-checked per-query window
    forms (q18 tumbling, q28 sliding, q21 session) it generalizes."""

    def _events(self):
        from ethiomart_amharic_ner_ray.pipelines.common import read_table

        return read_table(SF_DIR, "events", columns=["event_id", "user_id", "ts", "value"])

    def test_tumbling_matches_q18(self, ray_session):
        import __ray_entry__ as entrymod

        from ethiomart_amharic_ner_ray.pipelines.common import round_away
        from ethiomart_amharic_ner_ray.pipelines.windows import window_agg

        got = window_agg(
            self._events(),
            on="ts",
            by="user_id",
            aggs={"n_events": ("value", "size"), "sum_value": ("value", "sum")},
            kind="tumbling",
            width=pd.Timedelta(hours=1),
            n_buckets=8,
        ).to_pandas()
        got["sum_value"] = round_away(got["sum_value"].to_numpy(), 4)
        want = entrymod.queries()["q18_hourly_windows"](SF_DIR).to_pandas()
        k = ["user_id", "window_start"]
        got = got.sort_values(k).reset_index(drop=True)
        want = want.sort_values(k).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)

    def test_sliding_matches_q28(self, ray_session):
        import __ray_entry__ as entrymod

        from ethiomart_amharic_ner_ray.pipelines.common import round_away
        from ethiomart_amharic_ner_ray.pipelines.windows import window_agg

        got = window_agg(
            self._events(),
            on="ts",
            by="user_id",
            aggs={"n_events": ("value", "size"), "sum_value": ("value", "sum")},
            kind="sliding",
            width=pd.Timedelta(seconds=3600),
            slide=pd.Timedelta(seconds=900),
            n_buckets=8,
        ).to_pandas()
        got["window_start"] = (
            got["window_start"].astype("datetime64[ns]").astype("int64") // 10**9
        )
        got["sum_value"] = round_away(got["sum_value"].to_numpy(), 4)
        want = entrymod.queries()["q28_sliding_windows"](SF_DIR).to_pandas()
        k = ["user_id", "window_start"]
        got = got.sort_values(k).reset_index(drop=True)
        want = want.sort_values(k).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)

    def test_session_matches_q21(self, ray_session):
        import __ray_entry__ as entrymod

        from ethiomart_amharic_ner_ray.pipelines.common import round_away
        from ethiomart_amharic_ner_ray.pipelines.windows import window_agg

        got = window_agg(
            self._events(),
            on="ts",
            by="user_id",
            aggs={"n_events": ("value", "size"), "sum_value": ("value", "sum")},
            kind="session",
            gap=pd.Timedelta(minutes=30),
            n_buckets=8,
        ).to_pandas()
        got["sum_value"] = round_away(got["sum_value"].to_numpy(), 4)
        want = entrymod.queries()["q21_sessionize"](SF_DIR).to_pandas()
        k = ["user_id", "session_start"]
        got = got.rename(columns={"window_start": "session_start"}).sort_values(k).reset_index(drop=True)
        want = want.drop(columns=["session_id"]).sort_values(k).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)

    def test_bad_specs_raise(self, ray_session):
        from ethiomart_amharic_ner_ray.pipelines.windows import window_agg

        ds = self._events()
        with pytest.raises(ValueError, match="kind"):
            window_agg(ds, on="ts", by=None, aggs={}, kind="hopping")
        with pytest.raises(ValueError, match="require"):
            window_agg(ds, on="ts", by=None, aggs={}, kind="session", gap="30min")
        with pytest.raises(ValueError, match="multiple"):
            window_agg(
                ds, on="ts", by=None, aggs={}, kind="sliding",
                width="50min", slide="15min",
            )
        with pytest.raises(ValueError, match="decomposable"):
            window_agg(
                ds, on="ts", by=None, aggs={"m": ("value", "median")},
                kind="tumbling", width="1h",
            )


def test_composite_key_join_both_strategies(ray_session):
    """bucketed_join / auto_join on a COMPOSITE key list: both strategies
    must equal the pandas multi-key inner merge (events joined to a derived
    per-(user, type) lookup)."""
    import ray.data as rd

    from ethiomart_amharic_ner_ray.pipelines.common import auto_join, read_table

    left = read_table(SF_DIR, "events", columns=["event_id", "user_id", "event_type", "value"])
    lookup = (
        left.to_pandas()
        .groupby(["user_id", "event_type"], as_index=False)
        .agg(grp_n=("value", "size"))
    )
    # keep only a subset of keys so the inner join actually filters
    lookup = lookup[lookup["grp_n"] >= 3].reset_index(drop=True)
    right = rd.from_pandas(lookup)

    d1, d2 = {}, {}
    bc = auto_join(left, right, ["user_id", "event_type"], decision=d1).to_pandas()
    sh = auto_join(
        left, right, ["user_id", "event_type"], broadcast_max_bytes=0, decision=d2
    ).to_pandas()
    assert d1["strategy"] == "broadcast" and d2["strategy"] == "shuffle"

    want = left.to_pandas().merge(lookup, on=["user_id", "event_type"], how="inner")
    pd.testing.assert_frame_equal(_canon(bc), _canon(want), check_dtype=False)
    pd.testing.assert_frame_equal(_canon(sh), _canon(want), check_dtype=False)


def test_window_agg_mean_decomposition(ray_session):
    """'mean' in a tumbling window must equal the per-window pandas mean
    exactly despite running as distributed sum/size partials (the hidden
    helper columns must not leak into the output)."""
    import numpy as np

    from ethiomart_amharic_ner_ray.pipelines.common import read_table
    from ethiomart_amharic_ner_ray.pipelines.windows import window_agg

    ds = read_table(SF_DIR, "events", columns=["user_id", "ts", "value"])
    got = window_agg(
        ds,
        on="ts",
        by="user_id",
        aggs={"n": ("value", "size"), "avg_value": ("value", "mean")},
        kind="tumbling",
        width=pd.Timedelta(hours=6),
        n_buckets=8,
    ).to_pandas()
    assert list(got.columns) == ["user_id", "window_start", "n", "avg_value"]

    src = pd.read_parquet(SF_DIR + "/events.parquet", columns=["user_id", "ts", "value"])
    w = int(pd.Timedelta(hours=6).value)
    src["window_start"] = (
        (src["ts"].astype("datetime64[ns]").astype("int64") // w * w).astype("datetime64[ns]")
    ).astype("datetime64[us]")
    want = src.groupby(["user_id", "window_start"], as_index=False).agg(
        n=("value", "size"), avg_value=("value", "mean")
    )
    k = ["user_id", "window_start"]
    got = got.sort_values(k).reset_index(drop=True)
    want = want.sort_values(k).reset_index(drop=True)
    assert got["n"].tolist() == want["n"].tolist()
    assert np.allclose(got["avg_value"], want["avg_value"])


def test_window_agg_mean_skips_nulls(ray_session):
    """Decomposed mean must match pandas NaN-skipping mean when the value
    column has nulls (denominator is non-null count, not row count)."""
    import numpy as np
    import ray

    from ethiomart_amharic_ner_ray.pipelines.windows import window_agg

    df = pd.DataFrame(
        {
            "k": ["a"] * 6 + ["b"] * 6,
            "ts": pd.to_datetime(
                ["2024-01-01 00:10", "2024-01-01 00:20", "2024-01-01 01:10",
                 "2024-01-01 01:40", "2024-01-01 02:05", "2024-01-01 02:30"] * 2
            ),
            "v": [1.0, np.nan, 3.0, np.nan, np.nan, 6.0,
                  np.nan, 2.0, np.nan, 4.0, 5.0, np.nan],
        }
    )
    got = window_agg(
        ray.data.from_pandas(df).repartition(4),
        on="ts",
        by="k",
        aggs={"avg_v": ("v", "mean")},
        kind="tumbling",
        width=pd.Timedelta(hours=1),
        n_buckets=4,
    ).to_pandas().sort_values(["k", "window_start"]).reset_index(drop=True)

    src = df.copy()
    w = int(pd.Timedelta(hours=1).value)
    src["window_start"] = (
        (src["ts"].astype("int64") // w * w).astype("datetime64[ns]")
    ).astype("datetime64[us]")
    want = (
        src.groupby(["k", "window_start"], as_index=False)
        .agg(avg_v=("v", "mean"))
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    assert np.allclose(got["avg_v"], want["avg_v"], equal_nan=True)
