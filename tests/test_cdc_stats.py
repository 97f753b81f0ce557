"""Semantic pins for the round-3 CDC/statistics operator family (q108-q115)
beyond the oracle mirror in test_queries.py: each operator is checked against
an independent in-process reference computed a DIFFERENT way (sequential
recurrence, brute force over raw rows, hand-built fixtures), so an error that
happened to be mirrored into the SQL would still be caught."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(ray_session):
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


def test_upsert_latest_is_groupwise_tail(entrymod, events):
    got = (
        entrymod.queries()["q108_upsert_latest"](SF_DIR)
        .to_pandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        events.sort_values(["ts", "event_id"], kind="mergesort")
        .groupby(["user_id", "event_type"], as_index=False)
        .tail(1)[["user_id", "event_type", "event_id", "ts", "value"]]
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_scd2_intervals_tile_and_compress(entrymod, events):
    got = entrymod.queries()["q109_scd2_intervals"](SF_DIR).to_pandas()
    for uid, g in got.groupby("user_id"):
        g = g.sort_values("valid_from").reset_index(drop=True)
        # exactly one open interval per user, and it is the last one
        assert g["valid_to"].isna().sum() == 1 and pd.isna(g["valid_to"].iloc[-1])
        # intervals tile: each valid_to equals the next valid_from
        closed = g["valid_to"].iloc[:-1].to_numpy()
        nxt = g["valid_from"].iloc[1:].to_numpy()
        assert (closed == nxt).all()
        # SCD2 compression: consecutive intervals never repeat a state
        t = g["event_type"].to_numpy()
        assert (t[1:] != t[:-1]).all()
    # reconstruction: interval starts == the change points of the raw stream
    ev = events.sort_values(["ts", "event_id"], kind="mergesort")
    prev = ev.groupby("user_id", sort=False)["event_type"].shift(1)
    changes = ev[prev.isna() | (prev != ev["event_type"])]
    assert len(got) == len(changes)


def test_ewma_closed_form_matches_sequential_recurrence(entrymod, events):
    got = entrymod.queries()["q110_user_value_ewma"](SF_DIR).to_pandas()
    got = got.set_index("user_id")["ewma"].sort_index()
    alpha = 0.5
    ev = events.sort_values(["ts", "event_id"], kind="mergesort")
    ref = {}
    for uid, g in ev.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100) / 100.0
        s = x[0]
        for v in x[1:]:
            s = alpha * v + (1 - alpha) * s
        ref[uid] = s
    ref = pd.Series(ref).sort_index()
    assert np.allclose(got.to_numpy(), ref.to_numpy(), atol=1e-4)


def test_longest_streak_hand_fixture(ray_session):
    import ray.data

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg  # noqa: F401
    from ethiomart_amharic_ner_ray.pipelines import windows

    # user 1: days 1,2,3, 7,8 -> 3 ; user 2: one day -> 1 ; user 3: dup
    # rows on one day + a gap-straddling pair -> 2
    rows = [
        (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-03"),
        (1, "2024-01-07"), (1, "2024-01-08"),
        (2, "2024-03-05"),
        (3, "2024-02-10"), (3, "2024-02-10"), (3, "2024-02-11"), (3, "2024-02-13"),
    ]
    df = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]) + pd.Timedelta(hours=5),
        }
    )
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        import pyarrow as pa

        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), os.path.join(d, "events.parquet"))
        got = windows.q115_longest_streak(d).to_pandas().set_index("user_id")["longest_streak"]
    assert got.to_dict() == {1: 3, 2: 1, 3: 2}


def test_weighted_median_brute_force(entrymod, events):
    import pyarrow.parquet as pq

    got = entrymod.queries()["q112_weighted_median"](SF_DIR).to_pandas()
    got = got.set_index("l_returnflag")["wmedian"].sort_index()
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    ).to_pandas()
    ref = {}
    for flag, g in li.groupby("l_returnflag"):
        w = g.groupby("l_extendedprice")["l_quantity"].sum().sort_index()
        cw = w.cumsum()
        ref[flag] = float(w.index[(cw >= w.sum() / 2.0).argmax()])
    ref = pd.Series(ref).sort_index()
    assert np.allclose(got.to_numpy(), ref.to_numpy(), atol=1e-4)


def test_linear_interp_lies_on_line(entrymod):
    got = entrymod.queries()["q113_linear_interp"](SF_DIR)
    for et, g in got.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        obs = g[g["observed"]]
        assert len(obs) >= 2
        # no NULLs strictly between first/last observed day
        inner = g.iloc[obs.index[0] : obs.index[-1] + 1]
        assert inner["v_interp"].notna().all()
        # every gap value is between its straddling observations
        v = g["v_interp"].to_numpy()
        known = g["observed"].to_numpy()
        idx = np.arange(len(g))
        prev = np.where(known, idx, -1)
        np.maximum.accumulate(prev, out=prev)
        nxt = np.where(known, idx, len(g))
        nxt = np.minimum.accumulate(nxt[::-1])[::-1]
        fill = ~known & (prev >= 0) & (nxt < len(g))
        if fill.any():
            lo = np.minimum(v[prev[fill]], v[nxt[fill]]) - 1e-4
            hi = np.maximum(v[prev[fill]], v[nxt[fill]]) + 1e-4
            assert ((v[fill] >= lo) & (v[fill] <= hi)).all()


def test_chisq_matches_contingency_reference(entrymod, events):
    got = entrymod.queries()["q111_chisq_independence"](SF_DIR)
    ct = pd.crosstab(events["event_type"], events["ts"].dt.dayofweek)
    o = ct.to_numpy(dtype=float)
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / o.sum()
    mask = e > 0
    chi2 = float(((o - e)[mask] ** 2 / e[mask]).sum())
    dof = (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert abs(got["chi2"].iloc[0] - chi2) < 1e-3
    assert int(got["dof"].iloc[0]) == dof


def test_readability_hand_doc(ray_session):
    import os, tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines import textstats

    txt = "The cat sat. The dog ran! Really?"  # 7 words, 3 sentences, 27 chars
    t = pa.table({"doc_id": [1, 2], "text": [txt, "   "]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = textstats.q114_readability(d).to_pandas()
    assert len(got) == 1  # whitespace-only doc dropped
    r = got.iloc[0]
    assert (r["n_words"], r["n_sentences"]) == (7, 3)
    ari = 4.71 * (27 / 7) + (0.5 * (7 / 3) - 21.43)
    assert abs(r["ari"] - ari) < 1e-3


def test_session_conversion_order_matters(ray_session):
    """A purchase BEFORE the session's only click must not convert; one
    after it must — the ordered-pattern semantics that a bag-of-events
    aggregate would get wrong."""
    import os, tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.pipelines import windows

    t0 = pd.Timestamp("2024-05-01 10:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1, session 1: purchase then click -> NOT converted
        (1, 1, "purchase", t0), (2, 1, "click", t0 + m),
        # user 1, session 2 (gap > 30 min): click then purchase -> converted
        (3, 1, "click", t0 + 40 * m), (4, 1, "purchase", t0 + 41 * m),
        # user 2: click only -> not converted
        (5, 2, "click", t0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), os.path.join(d, "events.parquet"))
        got = windows.q116_session_conversion(d).to_pandas().set_index("user_id")
    assert got.loc[1, "n_sessions"] == 2 and got.loc[1, "n_converted"] == 1
    assert got.loc[2, "n_sessions"] == 1 and got.loc[2, "n_converted"] == 0


def test_autocorr_matches_numpy_on_dense_series(entrymod, events):
    got = entrymod.queries()["q117_autocorr_lag1"](SF_DIR).set_index("event_type")
    for et, g in events.groupby("event_type"):
        days = g["ts"].dt.normalize()
        counts = days.value_counts().sort_index()
        dense = counts.reindex(pd.date_range(days.min(), days.max(), freq="D"), fill_value=0)
        c = dense.to_numpy(dtype=float)
        if len(c) < 2 or c[:-1].std() == 0 or c[1:].std() == 0:
            assert et not in got.index
            continue
        ref = np.corrcoef(c[:-1], c[1:])[0, 1]
        assert abs(got.loc[et, "autocorr"] - ref) < 1e-3
        assert int(got.loc[et, "n_pairs"]) == len(c) - 1


def test_minmax_scale_bounds_and_endpoints(entrymod, events):
    got = entrymod.queries()["q118_minmax_scale"](SF_DIR).to_pandas()
    m = got.merge(events[["event_id", "event_type", "value"]], on="event_id")
    ok = m["scaled"].notna()
    assert (m.loc[ok, "scaled"] >= 0).all() and (m.loc[ok, "scaled"] <= 1).all()
    for et, g in m[ok].groupby("event_type"):
        vmin, vmax = g["value"].min(), g["value"].max()
        assert g.loc[g["value"] == vmin, "scaled"].eq(0).all()
        assert g.loc[g["value"] == vmax, "scaled"].eq(1).all()


def test_seasonality_r2_matches_groupmeans_reference(entrymod, events):
    got = entrymod.queries()["q119_seasonality_strength"](SF_DIR).set_index("event_type")
    d = (
        pd.DataFrame({"event_type": events["event_type"], "day": events["ts"].dt.normalize()})
        .groupby(["event_type", "day"], as_index=False)
        .size()
    )
    d["dow"] = d["day"].dt.dayofweek
    for et, g in d.groupby("event_type"):
        n = g["size"].to_numpy(dtype=float)
        if n.var() == 0:
            assert et not in got.index
            continue
        mean = n.mean()
        ss_total = ((n - mean) ** 2).sum()
        ss_between = sum(
            len(gg) * (gg["size"].mean() - mean) ** 2 for _, gg in g.groupby("dow")
        )
        assert abs(got.loc[et, "seasonality_r2"] - ss_between / ss_total) < 1e-3
        assert int(got.loc[et, "n_days"]) == len(g)


def test_distinct_rollup_all_row_not_sum(entrymod, events):
    got = entrymod.queries()["q120_distinct_user_rollup"](SF_DIR).set_index("event_type")
    per_type = events.groupby("event_type")["user_id"].nunique()
    for et, n in per_type.items():
        assert int(got.loc[et, "n_users"]) == n
    assert int(got.loc["(all)", "n_users"]) == events["user_id"].nunique()
    # the defining property: overall distinct < sum of per-type distincts
    assert got.loc["(all)", "n_users"] < per_type.sum()


@pytest.mark.parametrize(
    "name",
    ["q108_upsert_latest", "q110_user_value_ewma", "q115_longest_streak",
     "q116_session_conversion", "q120_distinct_user_rollup"],
)
def test_row_order_invariance(entrymod, events, tmp_path, name):
    """Shuffling the input row order must not change any of the ordered
    operators' results — every order the semantics need is re-derived from
    (ts, event_id), never from row position."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    shuf = events.iloc[rng.permutation(len(events))].reset_index(drop=True)
    pq.write_table(pa.Table.from_pandas(shuf, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    def run(sf_dir):
        res = entrymod.queries()[name](sf_dir)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(run(SF_DIR), run(str(tmp_path)), check_dtype=False)
