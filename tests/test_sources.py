"""Generator determinism + schema + CoNLL fixture IO."""

import glob

import pyarrow.parquet as pq

from ethiomart_amharic_ner_ray.functions.conll import read_conll, write_conll
from ethiomart_amharic_ner_ray.schemas import TRANSCRIPT_SCHEMA
from ethiomart_amharic_ner_ray.sources.transcripts import (
    ensure_transcripts,
    generate_transcripts,
)


class TestGenerator:
    def test_schema_exact(self):
        tab = generate_transcripts(200, seed=1)
        assert tab.schema.equals(TRANSCRIPT_SCHEMA)

    def test_deterministic(self):
        a = generate_transcripts(500, seed=42)
        b = generate_transcripts(500, seed=42)
        assert a.equals(b)

    def test_seed_changes_output(self):
        a = generate_transcripts(500, seed=1)
        b = generate_transcripts(500, seed=2)
        assert not a.equals(b)

    def test_rows_shuffled_but_complete(self):
        tab = generate_transcripts(500, seed=42).to_pandas()
        # shuffled: turn_idx not globally sorted
        assert not tab["turn_idx"].is_monotonic_increasing
        # complete conversations: each conv has turn_idx 0..len-1
        for _, g in tab.groupby("conv_id"):
            idx = sorted(g["turn_idx"])
            assert idx == list(range(len(idx)))

    def test_ts_monotone_within_conv(self):
        tab = generate_transcripts(500, seed=42).to_pandas()
        for _, g in tab.groupby("conv_id"):
            g = g.sort_values("turn_idx")
            assert g["ts"].is_monotonic_increasing

    def test_seller_skew(self):
        tab = generate_transcripts(3000, seed=42).to_pandas()
        sellers = tab["conv_id"].str.split("-").str[0]
        counts = sellers.value_counts()
        # Zipf: hottest seller ≫ median seller
        assert counts.iloc[0] > 5 * counts.median()

    def test_ensure_idempotent(self, tmp_path):
        d1 = ensure_transcripts(tmp_path / "t", 300, seed=42)
        files1 = sorted(glob.glob(d1 + "/*.parquet"))
        mtimes = [pq.ParquetFile(f).metadata for f in files1]
        d2 = ensure_transcripts(tmp_path / "t", 300, seed=42)
        assert d1 == d2
        assert sorted(glob.glob(d2 + "/*.parquet")) == files1
        # changed params → regenerated
        d3 = ensure_transcripts(tmp_path / "t", 400, seed=42)
        tab = pq.read_table(sorted(glob.glob(d3 + "/*.parquet")))
        assert tab.num_rows >= 400


class TestConll:
    def test_roundtrip(self, tmp_path):
        sents = [[("ጫማ", "B-PRODUCT"), ("500", "B-PRICE")], [("x", "O")]]
        p = tmp_path / "f.conll"
        write_conll(sents, p)
        assert read_conll(p) == sents

    def test_space_delimiter_autodetect(self, tmp_path):
        p = tmp_path / "s.conll"
        p.write_text("ጫማ B-PRODUCT\n500 B-PRICE\n\nx O\n", encoding="utf-8")
        sents = read_conll(p)
        assert sents[0][0] == ("ጫማ", "B-PRODUCT")
        assert len(sents) == 2

    def test_malformed_lines_skipped(self, tmp_path):
        p = tmp_path / "m.conll"
        p.write_text("good\tO\nbadline\n\n", encoding="utf-8")
        assert read_conll(p) == [[("good", "O")]]


class TestSynthDatasource:
    def test_read_datasource_streams_chunks(self, ray_session):
        """S1 slot: the custom Datasource plans per-chunk ReadTasks whose
        output feeds the flagship directly — same schema, valid triples."""
        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples
        from ethiomart_amharic_ner_ray.schemas import TRANSCRIPT_SCHEMA
        from ethiomart_amharic_ner_ray.sources.transcripts import TranscriptSynthDatasource

        ds = rd.read_datasource(TranscriptSynthDatasource(2000, seed=5, n_chunks=4))
        n = ds.count()
        assert n >= 2000  # whole conversations may round up
        assert set(ds.schema().names) == set(TRANSCRIPT_SCHEMA.names)
        tr = kg_triples(ds, n_buckets=4, concurrency=2).to_pandas()
        assert len(tr) > 0
        assert set(tr["pred"]) <= {"sells", "priced_at", "located_in", "reachable_at"}

    def test_datasource_deterministic(self, ray_session):
        import ray.data as rd

        from ethiomart_amharic_ner_ray.sources.transcripts import TranscriptSynthDatasource

        a = rd.read_datasource(TranscriptSynthDatasource(1500, seed=9, n_chunks=3)).to_pandas()
        b = rd.read_datasource(TranscriptSynthDatasource(1500, seed=9, n_chunks=3)).to_pandas()
        key = ["conv_id", "turn_idx"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert a.equals(b)

    def test_chunks_have_disjoint_conversations(self, ray_session):
        import ray.data as rd

        from ethiomart_amharic_ner_ray.sources.transcripts import TranscriptSynthDatasource

        df = rd.read_datasource(TranscriptSynthDatasource(1200, seed=2, n_chunks=3)).to_pandas()
        # each (conv_id) appears with contiguous turn_idx 0..n-1 exactly once
        g = df.groupby("conv_id")["turn_idx"]
        assert (g.min() == 0).all()
        assert (g.max() + 1 == g.size()).all()
