"""Invariant tests for the round-3 profile / gap-fill / covariance /
entity-resolution / inverted-index operators (their oracle-equality runs in
test_queries.py; these pin the properties SQL can't see)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


class TestBucketedJoin64BitKeys:
    def test_full_range_int64_keys_survive(self, ray_session):
        """Regression: harmonize() used to NULL-pad the other side's columns,
        and map_groups' pandas conversion turned the null-bearing int64 key
        into float64 — silently corrupting keys past 2^53 (siphash node
        ids). Zero-fill keeps the column int64 end-to-end."""
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.common import bucketed_join

        keys = np.array(
            [-8983693983205177006, 2**63 - 1, -(2**63) + 1, 2**53 + 1, 7], dtype=np.int64
        )
        left = rd.from_pandas(pd.DataFrame({"k": keys, "lv": np.arange(5)}))
        right = rd.from_pandas(pd.DataFrame({"k": keys[:3], "rv": np.arange(3) * 10}))
        out = bucketed_join(left, right, on="k", n_buckets=4).to_pandas()
        assert sorted(out["k"].tolist()) == sorted(keys[:3].tolist())
        assert out["k"].dtype == np.int64

    def test_connected_components_hash_scale_ids(self, ray_session):
        """CC's per-round bucketed_join must propagate full-width ids."""
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.graph import connected_components_minlabel

        a = np.array([2**62 + 1, 2**62 + 1, -(2**62)], dtype=np.int64)
        b = np.array([2**62 + 5, 2**62 + 9, -(2**62) + 3], dtype=np.int64)
        pairs = rd.from_pandas(pd.DataFrame({"a": a, "b": b}))
        out = connected_components_minlabel(pairs, n_buckets=4).to_pandas()
        rep = dict(zip(out["doc_id"], out["cluster_rep"]))
        assert rep[2**62 + 1] == rep[2**62 + 5] == rep[2**62 + 9] == 2**62 + 1
        assert rep[-(2**62)] == rep[-(2**62) + 3] == -(2**62)


class TestErCanonicalNames:
    def test_canonical_properties(self, ray_session):
        from ethiomart_amharic_ner_ray.pipelines.similarity import (
            er_canonical_names,
            q85_fuzzy_name_pairs,
        )

        out = er_canonical_names(SF_DIR)
        # total: one row per distinct name; canon is idempotent (a canonical
        # name's own canon is itself) and every pair's two sides agree
        assert out["name"].is_unique
        canon = dict(zip(out["name"], out["canon_name"]))
        assert all(canon[c] == c for c in set(out["canon_name"]))
        pairs = q85_fuzzy_name_pairs(SF_DIR)
        for na, nb in zip(pairs["name_a"], pairs["name_b"]):
            assert canon[na] == canon[nb]
        # canonical is the component's lexicographic minimum
        assert all(c <= n for n, c in canon.items())

    def test_no_hash_collisions_in_fixture_vocab(self, ray_session):
        """The CC node ids are 64-bit siphashes of names; verify injectivity
        over the fixture vocabulary so the documented 2^-64 collision bound
        is the only caveat in play."""
        import duckdb

        con = duckdb.connect()
        from ethiomart_amharic_ner_ray.pipelines.common import stable_hash64

        names = con.sql(f"SELECT DISTINCT p_name FROM '{SF_DIR}/part.parquet'").df()["p_name"]
        h = stable_hash64(names)
        assert len(set(h.tolist())) == len(names)


class TestCovariance:
    def test_matches_numpy(self, ray_session):
        import pyarrow.parquet as pq

        from ethiomart_amharic_ner_ray.pipelines.similarity import q90_embedding_covariance

        got = q90_embedding_covariance(SF_DIR).to_pandas()
        emb = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb.column("embedding").to_pylist()])
        want = np.cov(m, rowvar=False)
        dim = m.shape[1]
        assert len(got) == dim * (dim + 1) // 2
        for i, j, cov in zip(got["i"], got["j"], got["cov"]):
            assert abs(cov - want[i, j]) < 1e-6


class TestKeywordIndex:
    def test_index_equals_scan_and_prunes_reads(self, ray_session, tmp_path):
        from ethiomart_amharic_ner_ray.pipelines.textstats import (
            build_keyword_index,
            keyword_index_search,
            q86_keyword_search,
        )

        idx = str(tmp_path / "kwidx")
        manifest = build_keyword_index(SF_DIR, idx, n_buckets=32)
        assert sum(manifest["buckets"].values()) > 0
        terms = ("spark", "join", "fast")
        got = keyword_index_search(SF_DIR, terms, index_dir=idx)
        want = q86_keyword_search(SF_DIR, terms).to_pandas()
        assert sorted(got["doc_id"]) == sorted(want["doc_id"])
        # the search touches at most len(terms) bucket files
        from ethiomart_amharic_ner_ray.pipelines.common import stable_hash64

        h = stable_hash64(pd.Series(list(terms), dtype=object))
        assert len({int(b) for b in (h % np.uint64(manifest["n_buckets"]))}) <= len(terms)

    def test_empty_result_term(self, ray_session, tmp_path):
        from ethiomart_amharic_ner_ray.pipelines.textstats import (
            build_keyword_index,
            keyword_index_search,
        )

        idx = str(tmp_path / "kwidx2")
        build_keyword_index(SF_DIR, idx, n_buckets=8)
        out = keyword_index_search(SF_DIR, ("zzz_not_a_token_zzz",), index_dir=idx)
        assert len(out) == 0


class TestProfileAndGapfill:
    def test_profile_counts(self, ray_session):
        import duckdb

        from ethiomart_amharic_ner_ray.pipelines.relational import q88_table_profile

        got = q88_table_profile(SF_DIR).to_pandas().set_index("col_name")
        n = duckdb.sql(f"SELECT count(*) n FROM '{SF_DIR}/lineitem.parquet'").df()["n"][0]
        assert (got["n_rows"] == n).all()
        assert (got["n_nulls"] == 0).all()
        assert (got["min_val"] <= got["mean_val"]).all()
        assert (got["mean_val"] <= got["max_val"]).all()

    def test_gapfill_dense_calendar(self, ray_session):
        from ethiomart_amharic_ner_ray.pipelines.relational import q89_daily_gapfill

        out = q89_daily_gapfill(SF_DIR)
        days = pd.to_datetime(out["day"])
        assert (days.diff().dropna() == pd.Timedelta(days=1)).all()  # no gaps
        assert (out["n_events"] == 0).any()  # fixture has empty days at this threshold
        # zero threshold → every day nonzero, same calendar span
        allc = q89_daily_gapfill(SF_DIR, threshold=0.0)
        assert len(allc) == len(out)
        assert (allc["n_events"] > 0).all()
