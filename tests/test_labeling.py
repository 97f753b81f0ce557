"""Labeled-data-prep pipeline (reference §3.2 path) + entity explode (M4)."""

import glob

import pyarrow as pa
import pytest
import ray.data as rd

from ethiomart_amharic_ner_ray.functions.iob import validate_sentence
from ethiomart_amharic_ner_ray.pipelines.labeling import (
    prepare_labeled,
    quality_report,
    sentences_from_transcripts,
    tag_distribution,
)
from ethiomart_amharic_ner_ray.stages.extract import RegexExtractor, explode_entities
from ethiomart_amharic_ner_ray.stages.normalize import make_normalizer


@pytest.fixture(scope="module")
def prepared(ray_session, tiny_transcripts_dir):
    ds = rd.read_parquet(sorted(glob.glob(tiny_transcripts_dir + "/*.parquet")))
    return prepare_labeled(sentences_from_transcripts(ds)).materialize()


class TestPrepare:
    def test_all_sentences_valid(self, prepared):
        for b in prepared.iter_batches(batch_format="pyarrow"):
            for tokens, tags in zip(b.column("tokens").to_pylist(), b.column("tags").to_pylist()):
                assert validate_sentence(tokens, tags)

    def test_split_proportions(self, prepared):
        df = prepared.to_pandas()
        frac = (df["split"] == "train").mean()
        assert 0.7 < frac < 0.9  # hash split ≈ 80/20 in expectation

    def test_split_deterministic(self, ray_session, tiny_transcripts_dir):
        ds = rd.read_parquet(sorted(glob.glob(tiny_transcripts_dir + "/*.parquet")))
        a = prepare_labeled(sentences_from_transcripts(ds)).to_pandas()
        b = prepare_labeled(sentences_from_transcripts(ds.repartition(7))).to_pandas()
        key = lambda df: sorted(zip(df["n_tokens"], df["split"]))
        assert key(a) == key(b)

    def test_tag_distribution(self, prepared):
        dist = tag_distribution(prepared)
        tags = set(dist["tag"])
        assert "O" in tags
        assert any(t.startswith("B-") for t in tags)
        assert (dist["n"] > 0).all()

    def test_quality_report(self, prepared):
        rep = quality_report(prepared)
        assert set(rep["split"]) == {"train", "val"}
        assert (rep["n_sentences"] > 0).all()
        assert (rep["avg_len"] > 0).all()
        assert "b_price" in rep.columns  # rule-3 promotion creates B-PRICE


class TestExplode:
    def test_explode_flags(self):
        t = pa.table(
            {
                "conv_id": ["c0001-000000"],
                "turn_idx": pa.array([0], pa.int32()),
                "role": ["seller"],
                "text": ["ለሽያጭ ጫማ 500 ብር 0911234567 ቦሌ"],
                "tool": [""],
                "ts": pa.array([0], pa.timestamp("us")),
            }
        )
        t = make_normalizer(1)(t)
        from ethiomart_amharic_ner_ray.stages.extract import derive_seller

        t = derive_seller(t)
        t = RegexExtractor()(t)
        out = explode_entities(t)
        assert out.column("has_price").to_pylist() == [True]
        assert out.column("has_phone").to_pylist() == [True]
        assert out.column("has_product").to_pylist() == [True]
        assert out.column("prices").to_pylist() == [["500 ብር"]]
        assert out.column("phones").to_pylist() == [["0911234567"]]

    def test_explode_empty(self):
        t = pa.table(
            {
                "conv_id": ["c0001-000000"],
                "turn_idx": pa.array([0], pa.int32()),
                "role": ["seller"],
                "text": ["[no text]"],
                "tool": [""],
                "ts": pa.array([0], pa.timestamp("us")),
            }
        )
        t = make_normalizer(1)(t)
        from ethiomart_amharic_ner_ray.stages.extract import derive_seller

        t = derive_seller(t)
        t = RegexExtractor()(t)
        out = explode_entities(t)
        assert out.column("has_price").to_pylist() == [False]
        assert out.column("prices").to_pylist() == [[]]


class TestConllExport:
    def test_export_roundtrip(self, ray_session, tiny_transcripts_dir, tmp_path):
        """Distributed shard export → read back via the CoNLL reader →
        sentence multiset identical to the prepared dataset."""
        import glob

        import ray.data as rd

        from ethiomart_amharic_ner_ray.functions.conll import read_conll
        from ethiomart_amharic_ner_ray.pipelines.labeling import (
            export_conll,
            prepare_labeled,
            sentences_from_transcripts,
        )

        ds = rd.read_parquet(sorted(glob.glob(tiny_transcripts_dir + "/*.parquet")))
        prepared = prepare_labeled(sentences_from_transcripts(ds)).materialize()
        out = str(tmp_path / "conll")
        totals = export_conll(prepared, out)

        df = prepared.to_pandas()
        expect = {"train": int((df["split"] == "train").sum()), "val": int((df["split"] == "val").sum())}
        assert totals == expect

        got = []
        for split in ("train", "val"):
            for f in glob.glob(f"{out}/{split}/part-*.conll"):
                got.extend(read_conll(f))
        want = [list(zip(t, g)) for t, g in zip(df["tokens"], df["tags"])]
        key = lambda s: tuple(map(tuple, s))
        assert sorted(map(key, got)) == sorted(map(key, want))

    def test_duplicate_blocks_do_not_collide(self, ray_session, tmp_path):
        """Duplicate-heavy corpus: blocks with IDENTICAL sentences must all
        survive export — shard names carry a unique id, so two blocks can
        never map to one file and overwrite each other."""
        import glob

        import pandas as pd
        import ray.data as rd

        from ethiomart_amharic_ner_ray.functions.conll import read_conll
        from ethiomart_amharic_ner_ray.pipelines.labeling import export_conll

        one = {"tokens": ["hello", "world"], "tags": ["O", "O"], "split": "train"}
        df = pd.DataFrame([one] * 400)  # all sentences identical
        ds = rd.from_pandas(df).repartition(4)  # force multiple blocks
        out = str(tmp_path / "dups")
        totals = export_conll(ds, out)
        assert totals == {"train": 400, "val": 0}
        got = []
        for f in glob.glob(f"{out}/train/part-*.conll"):
            got.extend(read_conll(f))
        assert len(got) == 400

    def test_rerun_leaves_no_stale_shards(self, ray_session, tmp_path):
        """A rerun with different data must atomically replace the split
        dirs — readers must never glob in shards from a previous export."""
        import glob

        import pandas as pd
        import ray.data as rd

        from ethiomart_amharic_ner_ray.functions.conll import read_conll
        from ethiomart_amharic_ner_ray.pipelines.labeling import export_conll

        out = str(tmp_path / "rerun")
        mk = lambda tok, n: rd.from_pandas(
            pd.DataFrame([{"tokens": [tok], "tags": ["O"], "split": "train"}] * n)
        ).repartition(2)
        export_conll(mk("old", 10), out)
        export_conll(mk("new", 6), out)
        got = []
        for f in glob.glob(f"{out}/train/part-*.conll"):
            got.extend(read_conll(f))
        assert len(got) == 6
        assert all(s == [("new", "O")] for s in got)
        assert not glob.glob(f"{out}/.staging-*")
