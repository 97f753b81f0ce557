"""End-to-end KG pipeline conformance + invariants (SURVEY.md §5).

Gates: P/R ≥ 0.95 vs the sequential oracle, per-turn text equality, order
independence under resharding/shuffling, dedup idempotence.
"""

import glob

import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ethiomart_amharic_ner_ray.oracle import oracle_triples, precision_recall
from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions, kg_triples
from ethiomart_amharic_ner_ray.sources.transcripts import generate_transcripts


def _triple_set(df: pd.DataFrame) -> set:
    return set(zip(df["subj"], df["pred"], df["obj"]))


@pytest.fixture(scope="module")
def tiny_ds(ray_session, tiny_transcripts_dir):
    return rd.read_parquet(sorted(glob.glob(tiny_transcripts_dir + "/*.parquet")))


@pytest.fixture(scope="module")
def engine_triples(tiny_ds):
    return kg_triples(tiny_ds, n_buckets=8, concurrency=2).to_pandas()


@pytest.fixture(scope="module")
def oracle_df(tiny_transcripts_table):
    return oracle_triples(tiny_transcripts_table)


class TestConformance:
    def test_precision_recall_gate(self, engine_triples, oracle_df):
        p, r = precision_recall(engine_triples, oracle_df)
        assert p >= 0.95, f"precision {p} below gate"
        assert r >= 0.95, f"recall {r} below gate"

    def test_provenance_matches_oracle_exactly(self, engine_triples, oracle_df):
        # dedup keeps lexicographically-first (conv_id, turn_idx): with
        # identical semantics the provenance rows must agree, not just the set
        e = engine_triples.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
        o = oracle_df.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
        common = ["subj", "pred", "obj", "conv_id", "turn_idx"]
        pd.testing.assert_frame_equal(
            e[common].astype({"turn_idx": "int64"}),
            o[common].astype({"turn_idx": "int64"}),
        )

    def test_predicates_closed_set(self, engine_triples):
        assert set(engine_triples["pred"]) <= {
            "sells",
            "priced_at",
            "located_in",
            "reachable_at",
        }

    def test_provenance_struct(self, engine_triples):
        prov = engine_triples["provenance"].iloc[0]
        assert prov["extractor"] == "regex"
        assert prov["confidence"] == 1.0


class TestTextEquality:
    def test_per_turn_text_equality(self, tiny_ds, tiny_transcripts_table):
        """North rule: output `text` == input `text` under (conv_id, turn_idx)."""
        mentions = build_mentions(tiny_ds, concurrency=2).to_pandas()
        inp = tiny_transcripts_table.select(["conv_id", "turn_idx", "text"]).to_pandas()
        joined = inp.merge(
            mentions[["conv_id", "turn_idx", "text"]],
            on=["conv_id", "turn_idx"],
            suffixes=("_in", "_out"),
            validate="one_to_one",
        )
        assert len(joined) == len(inp)
        assert (joined["text_in"] == joined["text_out"]).all()


class TestOrderIndependence:
    def test_reshard_and_shuffle_invariant(self, tiny_ds, engine_triples):
        """Arbitrary resharding + random block order → identical triple set."""
        reshuffled = tiny_ds.random_shuffle(seed=7).repartition(13)
        out = kg_triples(reshuffled, n_buckets=5, concurrency=2).to_pandas()
        assert _triple_set(out) == _triple_set(engine_triples)
        # provenance rows identical too (deterministic dedup winner)
        a = out.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
        b = engine_triples.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
        cols = ["subj", "pred", "obj", "conv_id", "turn_idx"]
        pd.testing.assert_frame_equal(a[cols], b[cols])

    def test_corrupt_ts_does_not_change_triples(self, ray_session, tmp_path, engine_triples):
        """turn_idx is authoritative for ordering, not ts (FIXTURES §1)."""
        import pyarrow.parquet as pq

        tab = generate_transcripts(1000, seed=42, corrupt_ts=True)
        path = tmp_path / "corrupt.parquet"
        pq.write_table(tab, path)
        out = kg_triples(rd.read_parquet(str(path)), n_buckets=8, concurrency=2).to_pandas()
        assert _triple_set(out) == _triple_set(engine_triples)


class TestDedup:
    def test_no_duplicate_spo(self, engine_triples):
        assert not engine_triples.duplicated(["subj", "pred", "obj"]).any()

    def test_idempotent_over_duplicated_input(self, tiny_ds, engine_triples):
        """Running over input ∪ input yields the same triple set."""
        doubled = tiny_ds.union(tiny_ds)
        out = kg_triples(doubled, n_buckets=8, concurrency=2).to_pandas()
        assert _triple_set(out) == _triple_set(engine_triples)
        assert not out.duplicated(["subj", "pred", "obj"]).any()


class TestPerTypeReport:
    def test_all_types_perfect_on_synthetic_corpus(self, ray_session, tiny_ds, tiny_transcripts_table):
        """Engine extraction == oracle extraction → every per-type and
        averaged P/R/F1 must be exactly 1.0 (support > 0 for all 4 types)."""
        from ethiomart_amharic_ner_ray.oracle import oracle_mentions, per_type_report
        from ethiomart_amharic_ner_ray.pipelines.kg import build_flat

        flat = build_flat(tiny_ds, concurrency=2)
        eng = flat.select_columns(["conv_id", "turn_idx", "etype", "norm"]).to_pandas()
        gold = oracle_mentions(tiny_transcripts_table)
        rep = per_type_report(eng, gold)
        assert set(rep["entity_type"]) == {"PRODUCT", "PRICE", "LOC", "PHONE", "micro_avg", "macro_avg"}
        assert (rep["precision"] == 1.0).all() and (rep["recall"] == 1.0).all() and (rep["f1"] == 1.0).all()
        per_type = rep[~rep["entity_type"].str.endswith("_avg")]
        assert (per_type["support"] > 0).all()

    def test_report_detects_misses_and_spurious(self):
        """Synthetic degradation: dropping a gold mention lowers recall for
        its type only; adding a spurious one lowers precision only."""
        import pandas as pd

        from ethiomart_amharic_ner_ray.oracle import per_type_report

        gold = pd.DataFrame(
            {
                "conv_id": ["c1", "c1", "c2"],
                "turn_idx": [0, 1, 0],
                "etype": ["PRICE", "PHONE", "PRICE"],
                "norm": ["100 birr", "+251911111111", "200 birr"],
            }
        )
        eng = pd.concat(
            [
                gold.iloc[[0, 1]],  # miss the second PRICE
                pd.DataFrame(
                    {"conv_id": ["c3"], "turn_idx": [0], "etype": ["PHONE"], "norm": ["+251922222222"]}
                ),  # spurious PHONE
            ],
            ignore_index=True,
        )
        rep = per_type_report(eng, gold).set_index("entity_type")
        assert rep.loc["PRICE", "precision"] == 1.0 and rep.loc["PRICE", "recall"] == 0.5
        assert rep.loc["PHONE", "recall"] == 1.0 and rep.loc["PHONE", "precision"] == 0.5
        assert rep.loc["micro_avg", "support"] == 3


class TestTwoHop:
    def test_paths_match_pandas_merge(self, ray_session, engine_triples, tiny_ds):
        """two_hop over the flagship triples == a pandas merge of the two
        predicate-filtered edge sets."""
        import pandas as pd
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.graph import two_hop
        from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples

        triples = kg_triples(tiny_ds, n_buckets=8, concurrency=2, with_provenance_struct=False).materialize()
        got = (
            two_hop(triples, "sells", "priced_at")
            .to_pandas()
            .sort_values(["src", "mid", "dst"])
            .reset_index(drop=True)
        )
        df = triples.to_pandas()
        left = df[df["pred"] == "sells"][["subj", "obj"]].rename(columns={"subj": "src", "obj": "mid"})
        right = df[df["pred"] == "priced_at"][["subj", "obj"]].rename(columns={"subj": "mid", "obj": "dst"})
        want = left.merge(right, on="mid").sort_values(["src", "mid", "dst"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["src", "mid", "dst"]], want)
        assert len(got) > 0

    def test_hot_mid_fanout_capped(self, ray_session):
        """Planted super-connected entity: 100 sellers x 100 prices share one
        product. Uncapped, its join group emits 10,000 paths (quadratic in
        degree); with max_paths_per_mid=25 the group emits exactly
        k*k = 25 rows — the deterministic min-k selection (5 smallest srcs x
        5 smallest dsts) — while a low-degree mid is emitted in full."""
        import pandas as pd
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.graph import two_hop

        hot_sell = pd.DataFrame(
            {"subj": [f"seller{i:03d}" for i in range(100)], "pred": "sells", "obj": "hotproduct"}
        )
        hot_price = pd.DataFrame(
            {"subj": "hotproduct", "pred": "priced_at", "obj": [f"{100 + i} birr" for i in range(100)]}
        )
        cold_sell = pd.DataFrame({"subj": ["s1", "s2"], "pred": "sells", "obj": "coldproduct"})
        cold_price = pd.DataFrame(
            {"subj": "coldproduct", "pred": "priced_at", "obj": ["5 birr", "6 birr"]}
        )
        triples = rd.from_pandas(pd.concat([hot_sell, hot_price, cold_sell, cold_price], ignore_index=True))

        uncapped = two_hop(triples, "sells", "priced_at").to_pandas()
        assert (uncapped["mid"] == "hotproduct").sum() == 10_000
        assert (uncapped["mid"] == "coldproduct").sum() == 4

        capped = two_hop(triples, "sells", "priced_at", max_paths_per_mid=25).to_pandas()
        hot = capped[capped["mid"] == "hotproduct"].sort_values(["src", "dst"]).reset_index(drop=True)
        assert len(hot) == 25
        # deterministic min-k: the 5 lexicographically smallest endpoints per side
        assert sorted(hot["src"].unique()) == [f"seller{i:03d}" for i in range(5)]
        assert sorted(hot["dst"].unique()) == [f"{100 + i} birr" for i in range(5)]
        # low-degree mid untouched; capped output is a subset of uncapped
        assert (capped["mid"] == "coldproduct").sum() == 4
        upairs = set(map(tuple, uncapped[["src", "mid", "dst"]].itertuples(index=False)))
        assert set(map(tuple, capped[["src", "mid", "dst"]].itertuples(index=False))) <= upairs

        # rerun-stable: identical selection on a second run
        capped2 = two_hop(triples, "sells", "priced_at", max_paths_per_mid=25).to_pandas()
        key = ["mid", "src", "dst"]
        pd.testing.assert_frame_equal(
            capped.sort_values(key).reset_index(drop=True)[key],
            capped2.sort_values(key).reset_index(drop=True)[key],
        )

    def test_capped_query_entry_is_subset_of_uncapped(self, ray_session):
        """Driver-surface wiring: kg_product_price_paths_capped emits a
        nonempty subset of kg_product_price_paths on the sf0.001 fixture."""
        import __ray_entry__ as e

        sf = "/root/testdata/sf0.001"
        full = e.queries()["kg_product_price_paths"](sf).to_pandas()
        capped = e.queries()["kg_product_price_paths_capped"](sf).to_pandas()
        assert 0 < len(capped) <= len(full)
        cols = ["src", "mid", "dst"]
        fset = set(map(tuple, full[cols].itertuples(index=False)))
        assert set(map(tuple, capped[cols].itertuples(index=False))) <= fset


class TestConnectedComponentsConvergence:
    def test_warns_when_max_rounds_too_small(self, ray_session):
        """A chain component with diameter > max_rounds must WARN (labels are
        partial — one true cluster would silently split otherwise)."""
        import warnings

        import pandas as pd
        import pytest
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.graph import connected_components_minlabel

        chain = pd.DataFrame({"a": list(range(9)), "b": list(range(1, 10))})
        pairs = rd.from_pandas(chain)
        with pytest.warns(RuntimeWarning, match="did not\\s+converge|did not converge"):
            connected_components_minlabel(pairs, n_buckets=4, max_rounds=2)

        # with enough rounds: converges, no convergence warning, rep=0
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            out = connected_components_minlabel(rd.from_pandas(chain), n_buckets=4).to_pandas()
        assert not [w for w in caught if "converge" in str(w.message)]
        assert (out["cluster_rep"] == 0).all() and len(out) == 10


class TestConnectedComponentsCheckpoint:
    def _pairs(self):
        import pandas as pd

        # two components: a 6-chain (diameter needs a few rounds) + a pair
        return pd.DataFrame({"a": [0, 1, 2, 3, 4, 10], "b": [1, 2, 3, 4, 5, 11]})

    def test_checkpointed_equals_in_memory(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.graph import connected_components_minlabel

        want = (
            connected_components_minlabel(rd.from_pandas(self._pairs()), n_buckets=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got = (
            connected_components_minlabel(
                rd.from_pandas(self._pairs()),
                n_buckets=4,
                checkpoint_dir=str(tmp_path / "cc"),
                fingerprint="t1",
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_resume_after_midround_crash(self, ray_session, tmp_path, monkeypatch):
        """Kill the loop mid-round; the rerun must resume from the last
        COMMITTED round (edges + earlier rounds not recomputed) and land on
        the same clusters as an uninterrupted run."""
        import pandas as pd
        import pytest
        import ray.data as rd

        import ethiomart_amharic_ner_ray.pipelines.graph as G

        ckpt = str(tmp_path / "cc_crash")
        want = (
            G.connected_components_minlabel(rd.from_pandas(self._pairs()), n_buckets=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        real_step = G._cc_round_step
        calls = {"n": 0}

        def crashing_step(*a, **k):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("simulated mid-round crash")
            return real_step(*a, **k)

        monkeypatch.setattr(G, "_cc_round_step", crashing_step)
        with pytest.raises(RuntimeError, match="mid-round crash"):
            G.connected_components_minlabel(
                rd.from_pandas(self._pairs()), n_buckets=4, checkpoint_dir=ckpt, fingerprint="t2"
            )
        monkeypatch.undo()

        # round 1 committed before the crash; edges + round_1 must be reused
        import json
        from pathlib import Path

        assert json.loads((Path(ckpt) / "round_1.json").read_text())["fingerprint"] == "t2"
        edge_calls = {"n": 0}
        real_edges = G._edges_both_directions

        def counting_edges(*a, **k):
            edge_calls["n"] += 1
            return real_edges(*a, **k)

        monkeypatch.setattr(G, "_edges_both_directions", counting_edges)
        got = (
            G.connected_components_minlabel(
                rd.from_pandas(self._pairs()), n_buckets=4, checkpoint_dir=ckpt, fingerprint="t2"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        monkeypatch.undo()
        assert edge_calls["n"] == 0, "edges must come from the checkpoint"
        pd.testing.assert_frame_equal(got, want)

        # a completed checkpoint short-circuits: rerun does zero new rounds
        step_calls = {"n": 0}

        def counting_step(*a, **k):
            step_calls["n"] += 1
            return real_step(*a, **k)

        monkeypatch.setattr(G, "_cc_round_step", counting_step)
        again = (
            G.connected_components_minlabel(
                rd.from_pandas(self._pairs()), n_buckets=4, checkpoint_dir=ckpt, fingerprint="t2"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        monkeypatch.undo()
        assert step_calls["n"] == 0
        pd.testing.assert_frame_equal(again, want)

    def test_fingerprint_mismatch_rebuilds(self, ray_session, tmp_path):
        """A checkpoint from a DIFFERENT pair set must not be resumed."""
        import pandas as pd
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.graph import connected_components_minlabel

        ckpt = str(tmp_path / "cc_fp")
        connected_components_minlabel(
            rd.from_pandas(pd.DataFrame({"a": [0], "b": [1]})),
            n_buckets=4,
            checkpoint_dir=ckpt,
            fingerprint="old-input",
        )
        got = (
            connected_components_minlabel(
                rd.from_pandas(self._pairs()), n_buckets=4, checkpoint_dir=ckpt, fingerprint="new-input"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(got) == 8  # nodes 0..5 + 10,11 — not the stale 2-node set
