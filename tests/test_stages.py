"""Stage-level tests: normalizer stage, seller derivation, NerScorer rule
backend (actor class smoked directly, per the actor-init pitfall), linker."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from ethiomart_amharic_ner_ray.schemas import TRANSCRIPT_SCHEMA
from ethiomart_amharic_ner_ray.stages.extract import RegexExtractor, derive_seller
from ethiomart_amharic_ner_ray.stages.linker import (
    EntityLinker,
    _trigram_vector,
    build_product_index,
)
from ethiomart_amharic_ner_ray.stages.ner_scorer import NerScorer
from ethiomart_amharic_ner_ray.stages.normalize import make_normalizer


def _batch(texts):
    n = len(texts)
    return pa.table(
        {
            "conv_id": [f"c0001-{i:06d}" for i in range(n)],
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": ["seller"] * n,
            "text": texts,
            "tool": [""] * n,
            "ts": pa.array([0] * n, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


class TestNormalizeStage:
    def test_adds_clean_text_keeps_text(self):
        b = _batch(["ዋጋ 500 birr!", "[no text]"])
        out = make_normalizer(1)(b)
        assert out.column("text").to_pylist() == ["ዋጋ 500 birr!", "[no text]"]
        assert out.column("clean_text").to_pylist() == ["ዋጋ 500 ብር!", ""]

    def test_v2_variant(self):
        out = make_normalizer(2)(_batch(["ዋጋ 500"]))
        assert out.column("clean_text").to_pylist() == ["ዋጋ 500 ብር"]


class TestDeriveSeller:
    def test_prefix(self):
        out = derive_seller(_batch(["x"]))
        assert out.column("seller").to_pylist() == ["c0001"]


class TestRegexExtractorStage:
    def test_mentions_column(self):
        b = make_normalizer(1)(_batch(["ለሽያጭ ጫማ 500 ብር ቦሌ 0911234567"]))
        out = RegexExtractor()(b)
        ms = out.column("mentions").to_pylist()[0]
        etypes = {m["etype"] for m in ms}
        assert etypes == {"PRODUCT", "PRICE", "LOC", "PHONE"}
        assert all(m["entity_id"] == -1 for m in ms)


class TestNerScorerRules:
    def test_transformers_backend_is_stubbed(self):
        with pytest.raises(NotImplementedError):
            NerScorer(backend="transformers")

    def test_rule_backend_matches_regex_entities(self):
        b = make_normalizer(1)(_batch(["ለሽያጭ ጫማ ዋጋ 500 ብር ቦሌ ይገኛል"]))
        out = NerScorer()(b)
        ms = out.column("mentions").to_pylist()[0]
        by_type = {m["etype"]: m for m in ms}
        assert by_type["PRICE"]["norm"] == "500 ብር"
        assert by_type["LOC"]["norm"] == "ቦሌ"
        assert "ጫማ" in by_type["PRODUCT"]["norm"]

    def test_bio_path_emits_valid_tags(self):
        scorer = NerScorer()
        tokens, tags = scorer._tag_sentence("ለሽያጭ ጫማ 500 ብር")
        assert len(tokens) == len(tags)
        assert "B-PRICE" in tags and "I-PRICE" in tags

    def test_price_capture_matches_regex_path_quirk(self):
        """Swap-compat: for '2500 ብር' the regex path captures '500' (the
        reference's \\d{1,3} grouping quirk); the NER decode must agree,
        not fabricate a digit PREFIX like '250'."""
        b = make_normalizer(1)(_batch(["ዋጋ 2500 ብር ነው"]))
        out = NerScorer()(b)
        prices = [m["norm"] for m in out.column("mentions").to_pylist()[0] if m["etype"] == "PRICE"]
        assert prices == ["500 ብር"]


class TestLinker:
    def test_trigram_vector_deterministic(self):
        v1, v2 = _trigram_vector("ጫማ"), _trigram_vector("ጫማ")
        assert np.allclose(v1, v2)
        assert abs(np.linalg.norm(v1) - 1.0) < 1e-9

    def test_link_exact_and_fuzzy(self, ray_session):
        names = ["ሶፋ", "ጫማ", "የሴቶች ቀሚስ"]
        matrix = np.stack([_trigram_vector(n) for n in names])
        ref = ray.put((names, matrix))
        linker = EntityLinker(ref)
        assert linker._link_one("ጫማ") == 1  # exact
        assert linker._link_one("የሴቶች ቀሚስ ነው") == 2  # fuzzy → nearest
        assert linker._link_one("zzzz") == -1  # below threshold

    def test_build_index_from_dataset(self, ray_session, tiny_transcripts_dir):
        import glob

        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions

        ds = rd.read_parquet(sorted(glob.glob(tiny_transcripts_dir + "/*.parquet")))
        mentions = build_mentions(ds.limit(300), concurrency=2)
        names, matrix = build_product_index(mentions)
        assert len(names) == matrix.shape[0]
        assert names == sorted(names)
        assert len(names) > 0


class TestSellerScorecardsVectorized:
    def test_matches_reference_rowwise_computation(self, ray_session, tiny_transcripts_dir):
        """The vectorized flat-mentions scorecard must reproduce the naive
        per-row mentions-struct computation exactly."""
        import glob

        import pandas as pd
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.common import round_away
        from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions
        from ethiomart_amharic_ner_ray.pipelines.scorecard import seller_scorecards

        ds = rd.read_parquet(sorted(glob.glob(tiny_transcripts_dir + "/*.parquet")))
        mentions = build_mentions(ds, concurrency=2).materialize()
        new = seller_scorecards(mentions).to_pandas().sort_values("seller").reset_index(drop=True)

        df = mentions.to_pandas()
        rows = []
        for seller, g in df.groupby("seller"):
            n_products = n_prices = 0
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
                    "total_turns": len(g),
                    "total_products": n_products,
                    "product_variety": len(products),
                    "avg_price": round_away(price_sum / n_prices, 4) if n_prices else 0.0,
                    "first_ts": g["ts"].min(),
                    "last_ts": g["ts"].max(),
                }
            )
        ref = pd.DataFrame(rows).sort_values("seller").reset_index(drop=True)
        pd.testing.assert_frame_equal(new.astype(ref.dtypes.to_dict()), ref)


class TestScorecardSummary:
    def test_summary_shape_and_consistency(self, ray_session, tiny_transcripts_dir):
        import glob

        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions
        from ethiomart_amharic_ner_ray.pipelines.scorecard import (
            scorecard_summary,
            seller_scorecards,
        )

        ds = rd.read_parquet(sorted(glob.glob(tiny_transcripts_dir + "/*.parquet")))
        mentions = build_mentions(ds, concurrency=2).materialize()
        cards = seller_scorecards(mentions).materialize()
        rep = scorecard_summary(cards).set_index("metric")["value"]
        df = cards.to_pandas()
        assert int(rep["n_sellers"]) == len(df)
        assert int(rep["total_turns"]) == int(df["total_turns"].sum())
        assert int(rep["total_product_mentions"]) == int(df["total_products"].sum())
        assert rep.index.str.startswith("top1_seller").any()
        top1 = rep["top1_seller"].split(":")[0]
        assert top1 == df.sort_values(["total_products", "seller"], ascending=[False, True]).iloc[0]["seller"]


class TestBroadcastCache:
    def test_lru_bounded(self, ray_session):
        """The per-worker broadcast cache must not grow without bound in a
        long session: distinct refs beyond the slot count evict oldest."""
        import ray

        from ethiomart_amharic_ner_ray.pipelines import common

        common._BROADCAST_CACHE.clear()
        refs = [ray.put({"i": i}) for i in range(common._BROADCAST_CACHE_SLOTS + 4)]
        for r in refs:
            assert common.get_broadcast(r)["i"] is not None
        assert len(common._BROADCAST_CACHE) <= common._BROADCAST_CACHE_SLOTS
        # hot entry stays cached and identical across gets
        obj1 = common.get_broadcast(refs[-1])
        obj2 = common.get_broadcast(refs[-1])
        assert obj1 is obj2
        # evicted entry still retrievable (re-fetch, not an error)
        assert common.get_broadcast(refs[0]) == {"i": 0}
        common._BROADCAST_CACHE.clear()
