"""PageRank and count-min-sketch pins against in-process references.

PageRank is pinned to a dense numpy power iteration implementing the same
formula (teleport + damped contributions + uniform dangling redistribution)
— the distributed bucketed-join rounds must agree to float tolerance
regardless of partial-sum order. The CMS heavy hitters are pinned to exact
pandas counts: estimates are provable upper bounds, and at fixture scale the
top-k ranking must match the exact top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from ethiomart_amharic_ner_ray.pipelines.graph import pagerank
from ethiomart_amharic_ner_ray.pipelines.sketches import (
    CountMinSketch,
    cms_heavy_hitters,
)

SF_DIR = "/root/testdata/sf0.001"


def _reference_pagerank(edges: list[tuple[int, int]], n_iters: int, d: float = 0.85):
    nodes = sorted({u for e in edges for u in e})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    uniq = sorted(set(edges))
    outdeg = np.zeros(n)
    for s, _ in uniq:
        outdeg[ix[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        contrib = np.zeros(n)
        for s, t in uniq:
            contrib[ix[t]] += r[ix[s]] / outdeg[ix[s]]
        dangling = r[outdeg == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[ix[v]] for v in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        # chain + sink (dangling node 3)
        [(0, 1), (1, 2), (2, 3)],
        # two components, one with a cycle, duplicate edge must not double-count
        [(0, 1), (1, 0), (0, 1), (2, 3), (3, 4), (4, 2), (5, 6)],
        # hub-and-spoke skew: node 0 points everywhere
        [(0, i) for i in range(1, 8)] + [(i, 0) for i in range(1, 4)],
    ],
)
def test_pagerank_matches_dense_reference(ray_session, edges):
    ds = ray.data.from_pandas(
        pd.DataFrame({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    )
    got = pagerank(ds, n_buckets=4, n_iters=12)
    want = _reference_pagerank(edges, n_iters=12)
    assert set(got["node"]) == set(want)
    for _, row in got.iterrows():
        assert row["rank"] == pytest.approx(want[row["node"]], abs=1e-12)
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-9)


def test_pagerank_shard_invariance(ray_session):
    edges = [(i, (i * 7 + 3) % 23) for i in range(60)]
    df = pd.DataFrame({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    one = pagerank(ray.data.from_pandas(df), n_buckets=4, n_iters=8)
    many = pagerank(
        ray.data.from_pandas([df.iloc[:13], df.iloc[13:20], df.iloc[20:]]),
        n_buckets=4,
        n_iters=8,
    )
    m = one.merge(many, on="node", suffixes=("_1", "_k"))
    assert len(m) == len(one)
    np.testing.assert_allclose(m["rank_1"], m["rank_k"], atol=1e-12)


def test_cms_point_estimates_are_upper_bounds_and_tight():
    rng = np.random.default_rng(7)
    vals = pd.Series(rng.zipf(1.5, 20000).astype(str))
    cms = CountMinSketch(width=1 << 14, depth=4).add(vals)
    truth = vals.value_counts()
    est = cms.estimate(pd.Series(truth.index, dtype=object))
    assert (est >= truth.to_numpy()).all()
    # deterministic fixture: total slack across all 20k points is tiny at
    # this width; pin the CMS guarantee empirically
    assert (est - truth.to_numpy()).max() <= 2 * len(vals) / (1 << 14)


def test_cms_merge_invariance():
    rng = np.random.default_rng(11)
    vals = pd.Series(rng.integers(0, 500, 10000).astype(str))
    whole = CountMinSketch(width=1 << 12, depth=4).add(vals)
    a = CountMinSketch(width=1 << 12, depth=4).add(vals.iloc[:3000])
    b = CountMinSketch(width=1 << 12, depth=4).add(vals.iloc[3000:])
    merged = a.merge(b)
    np.testing.assert_array_equal(whole.counts, merged.counts)


def test_cms_heavy_hitters_match_exact_topk(ray_session):
    rng = np.random.default_rng(3)
    vals = pd.Series(rng.zipf(1.3, 30000).astype(str), name="v")
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals}))
    got = cms_heavy_hitters(ds, "v", k=10)
    truth = vals.value_counts()
    want = (
        truth.rename_axis("v")
        .reset_index(name="n")
        .sort_values(["n", "v"], ascending=[False, True])
        .head(10)
    )
    assert list(got["v"]) == list(want["v"])
    lookup = truth.to_dict()
    for _, row in got.iterrows():
        assert row["est_count"] >= lookup[row["v"]]


def test_approx_distinct_per_group_accuracy_and_shard_invariance(ray_session):
    import duckdb

    from ethiomart_amharic_ner_ray.pipelines.sketches import approx_distinct_per_group
    from ethiomart_amharic_ner_ray.pipelines.common import read_table

    ds = read_table(SF_DIR, "events", columns=["event_type", "user_id"])
    got = (
        approx_distinct_per_group(ds, ["event_type"], "user_id")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) AS n "
            f"FROM '{SF_DIR}/events.parquet' GROUP BY 1 ORDER BY 1"
        )
        .df()
        .reset_index(drop=True)
    )
    assert list(got["event_type"]) == list(want["event_type"])
    # p=10 → ~3.2% SE; allow 4 sigma
    for a, e in zip(got["approx_distinct"], want["n"]):
        assert abs(a - e) <= max(3, 0.13 * e)

    # registers are max-merge semilattices: resharding must not change output
    df = read_table(SF_DIR, "events", columns=["event_type", "user_id"]).to_pandas()
    import ray.data

    resharded = ray.data.from_pandas([df.iloc[:1000], df.iloc[1000:4000], df.iloc[4000:]])
    got2 = (
        approx_distinct_per_group(resharded, ["event_type"], "user_id")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)


class TestBipartiteLPA:
    def _edges_ds(self, df):
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))

    def test_planted_communities_recovered(self, ray_session):
        import pandas as pd

        from ethiomart_amharic_ner_ray.pipelines.graph import (
            bipartite_label_propagation,
        )

        e = []
        for s in (10, 11, 12):
            for d in (100, 101, 102):
                e.append((s, d))
        for s in (20, 21, 22):
            for d in (200, 201, 202):
                e.append((s, d))
        e.append((12, 200))  # one bridge edge must not merge the blocks
        df = pd.DataFrame(e, columns=["src", "dst"])
        out = bipartite_label_propagation(self._edges_ds(df), n_buckets=4).to_pandas()
        src = out[out["side"] == "src"].set_index("node")["community"].to_dict()
        assert {src[10], src[11], src[12]} == {10}
        assert {src[20], src[21], src[22]} == {20}
        dst = out[out["side"] == "dst"].set_index("node")["community"].to_dict()
        assert all(dst[d] == 10 for d in (100, 101, 102))
        assert all(dst[d] == 20 for d in (201, 202))

    def test_distributed_matches_reference(self, ray_session):
        import numpy as np
        import pandas as pd

        from ethiomart_amharic_ner_ray.pipelines.graph import (
            bipartite_label_propagation,
            reference_bipartite_lpa,
        )

        rng = np.random.default_rng(3)
        rows = []
        for s in range(40):
            block = s % 4
            for _ in range(4):
                rows.append((s, 1000 + block * 25 + int(rng.integers(25))))
            if s % 7 == 0:  # cross-block noise edges
                rows.append((s, 1000 + ((block + 1) % 4) * 25 + int(rng.integers(25))))
        df = pd.DataFrame(rows, columns=["src", "dst"])
        got = (
            bipartite_label_propagation(self._edges_ds(df), n_buckets=8)
            .to_pandas()
            .sort_values(["side", "node"], kind="mergesort")
            .reset_index(drop=True)
        )
        want = reference_bipartite_lpa(df)
        pd.testing.assert_frame_equal(
            got[["node", "community", "side"]].astype({"node": "int64", "community": "int64"}),
            want.astype({"node": "int64", "community": "int64"}),
        )

    def test_triples_projection_runs(self, ray_session, tiny_transcripts_dir):
        import ray.data

        from ethiomart_amharic_ner_ray.pipelines.graph import communities_from_triples
        from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples

        tx = ray.data.read_parquet(tiny_transcripts_dir)
        t = kg_triples(tx, n_buckets=8, concurrency=(1, 4), with_provenance_struct=False)
        out = communities_from_triples(t, pred="sells", n_buckets=8, max_rounds=6)
        assert set(out.columns) == {"node", "community", "side"}
        assert (out["side"] == "src").any() and (out["side"] == "dst").any()
        # every src community label is itself a src node id
        srcs = set(out[out["side"] == "src"]["node"])
        assert set(out[out["side"] == "src"]["community"]) <= srcs
