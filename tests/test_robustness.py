"""Edge-case robustness: empty datasets, single rows, mention-free corpora."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples
from ethiomart_amharic_ner_ray.schemas import TRANSCRIPT_SCHEMA


def _ds_from_rows(rows):
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["seller"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    return rd.from_arrow(t)


class TestEdgeInputs:
    def test_single_turn(self, ray_session):
        ds = _ds_from_rows([("c0001-000000", 0, "ለሽያጭ ጫማ 500 ብር")])
        out = kg_triples(ds, n_buckets=4, concurrency=1).to_pandas()
        assert set(out["pred"]) == {"sells", "priced_at"}
        assert (out["subj"] == "c0001").sum() >= 1

    def test_no_mentions_corpus(self, ray_session):
        ds = _ds_from_rows(
            [("c0001-000000", 0, "hello world"), ("c0001-000000", 1, "[no text]")]
        )
        out = kg_triples(ds, n_buckets=4, concurrency=1, link=False).to_pandas()
        assert len(out) == 0

    def test_no_mentions_with_link(self, ray_session):
        # empty product index: linking must not crash
        ds = _ds_from_rows([("c0001-000000", 0, "0911234567")])
        out = kg_triples(ds, n_buckets=4, concurrency=1, link=True).to_pandas()
        assert list(out["pred"]) == ["reachable_at"]

    def test_price_attaches_to_earlier_turn_product(self, ray_session):
        """Conversation reassembly is load-bearing: a price with no product
        in its own turn attaches to the most recent product earlier in the
        SAME conversation."""
        ds = _ds_from_rows(
            [
                ("c0002-000001", 0, "ለሽያጭ ሶፋ ቀርቧል"),
                ("c0002-000001", 1, "ዋጋው 700 ብር ነው"),
                ("c0003-000002", 0, "ዋጋው 900 ብር ነው"),  # no product in conv → seller subj
            ]
        )
        out = kg_triples(ds, n_buckets=4, concurrency=1).to_pandas()
        priced = out[out["pred"] == "priced_at"].set_index("obj")["subj"].to_dict()
        assert "ሶፋ" in priced["700 ብር"]
        assert priced["900 ብር"] == "c0003"


class TestEmptyAggregates:
    def test_bucketed_group_agg_empty(self, ray_session):
        from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg

        ds = rd.from_arrow(pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())}))

        def final(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("k", as_index=False).agg(n=("v", "size"))

        out = bucketed_group_agg(ds, ["k"], final, n_buckets=4).to_pandas()
        assert len(out) == 0

    def test_prepare_labeled_empty(self, ray_session):
        from ethiomart_amharic_ner_ray.pipelines.labeling import prepare_labeled

        ds = rd.from_arrow(
            pa.table(
                {
                    "tokens": pa.array([], pa.list_(pa.string())),
                    "tags": pa.array([], pa.list_(pa.string())),
                }
            )
        )
        assert prepare_labeled(ds).count() == 0


class TestNullAndEmptyText:
    def test_null_text_turns_are_skipped_not_fatal(self, ray_session):
        """NULL / empty text turns flow through normalize+extract+triples
        without error and contribute no mentions."""
        import datetime

        import pyarrow as pa
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples
        from ethiomart_amharic_ner_ray.schemas import TRANSCRIPT_SCHEMA

        ts = datetime.datetime(2024, 1, 1)
        t = pa.table(
            {
                "conv_id": pa.array(["s1-c1", "s1-c1", "s2-c2", "s2-c2"]),
                "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
                "role": pa.array(["user", "assistant", "user", "assistant"]),
                "text": pa.array(["phone 0911234567", None, "", "ዋጋ 500 ብር"]),
                "tool": pa.array([None, None, "t", None]),
                "ts": pa.array([ts] * 4, pa.timestamp("us")),
            },
            schema=TRANSCRIPT_SCHEMA,
        )
        out = kg_triples(rd.from_arrow(t), n_buckets=2, concurrency=2).to_pandas()
        assert set(zip(out["subj"], out["pred"])) == {("s1", "reachable_at"), ("s2", "priced_at")}


class TestUnicodeFuzzPipeline:
    def test_arbitrary_unicode_text_flows_end_to_end(self, ray_session):
        """Pipeline-level fuzz: arbitrary (non-surrogate) unicode turn text
        must flow through normalize → extract → triples without error, and
        per-turn text must survive byte-for-byte."""
        import datetime

        import pyarrow as pa
        import ray.data as rd
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions, kg_triples
        from ethiomart_amharic_ner_ray.schemas import TRANSCRIPT_SCHEMA

        texts_strategy = st.lists(
            st.text(
                alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFFF),
                max_size=60,
            ),
            min_size=4,
            max_size=12,
        )

        @given(texts=texts_strategy)
        @settings(max_examples=8, deadline=None)
        def run(texts):
            n = len(texts)
            ts = datetime.datetime(2024, 1, 1)
            t = pa.table(
                {
                    "conv_id": pa.array([f"s{i % 2}-c{i % 3}" for i in range(n)]),
                    "turn_idx": pa.array(list(range(n)), pa.int32()),
                    "role": pa.array(["user"] * n),
                    "text": pa.array(texts),
                    "tool": pa.array([None] * n, pa.string()),
                    "ts": pa.array([ts] * n, pa.timestamp("us")),
                },
                schema=TRANSCRIPT_SCHEMA,
            )
            ds = rd.from_arrow(t)
            triples = kg_triples(ds, n_buckets=2, concurrency=2).materialize()
            # schema survives even when zero triples come out (Ray's
            # to_pandas drops columns on ANY empty dataset, so assert at
            # the Dataset level)
            assert {"subj", "pred", "obj", "conv_id", "turn_idx"} <= set(triples.schema().names)
            if triples.count():
                out = triples.to_pandas()
                assert set(out["pred"]) <= {"sells", "priced_at", "located_in", "reachable_at"}
            m = build_mentions(ds, concurrency=2).to_pandas().sort_values("turn_idx")
            assert m["text"].tolist() == texts  # byte-for-byte equality

        run()


class TestSchemaValidation:
    def test_missing_and_mistyped_columns_named(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest

        from ethiomart_amharic_ner_ray.pipelines.kg import run_kg_pipeline
        from ethiomart_amharic_ner_ray.schemas import validate_transcripts_schema

        bad = pa.table({"conv_id": pa.array(["a"]), "turn_idx": pa.array(["oops"])})
        with pytest.raises(ValueError, match="missing column 'text'"):
            validate_transcripts_schema(bad.schema)
        with pytest.raises(ValueError, match="turn_idx"):
            validate_transcripts_schema(bad.schema)

        # and through the pipeline entrypoint
        p = tmp_path / "bad.parquet"
        pq.write_table(bad, p)
        with pytest.raises(ValueError, match="transcript schema"):
            run_kg_pipeline(str(p), str(tmp_path / "out"), n_buckets=2, concurrency=2)

    def test_good_schema_passes(self):
        from ethiomart_amharic_ner_ray.schemas import (
            TRANSCRIPT_SCHEMA,
            validate_transcripts_schema,
        )

        validate_transcripts_schema(TRANSCRIPT_SCHEMA)  # no raise
