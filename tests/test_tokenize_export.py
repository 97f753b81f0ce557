"""Concat-and-chunk packed training sequences: the distributed pipeline
must reproduce the in-process encode→concat→chunk stream exactly — every
sequence, every id, boundary spans included."""

import sys
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"


class TestTokenizedSequences:
    @pytest.fixture(scope="class")
    def both(self, ray_session):
        from ethiomart_amharic_ner_ray.pipelines.bpe import bpe_train
        from ethiomart_amharic_ner_ray.pipelines.tokenize_export import (
            build_vocab,
            reference_tokenized_sequences,
            tokenized_sequences,
        )

        merges = bpe_train(SF, n_merges=12)
        vocab = build_vocab(SF, merges)
        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
        want = reference_tokenized_sequences(docs, merges, vocab, seq_len=128)
        got = (
            tokenized_sequences(SF, n_merges=12, seq_len=128)
            .to_pandas()
            .sort_values("seq_id")
            .reset_index(drop=True)
        )
        return got, want

    def test_stream_identical(self, both):
        got, want = both
        assert len(got) == len(want)
        assert got["seq_id"].tolist() == list(range(len(want)))
        for seq_id, ids in zip(got["seq_id"], got["input_ids"]):
            assert list(ids) == want[seq_id], f"sequence {seq_id} differs"

    def test_fixed_length_and_int_ids(self, both):
        got, _ = both
        assert all(len(ids) == 128 for ids in got["input_ids"])
        assert all(int(i) >= 0 for ids in got["input_ids"][:5] for i in ids)

    def test_eod_separators_present(self, both, ray_session):
        from ethiomart_amharic_ner_ray.pipelines.bpe import bpe_train
        from ethiomart_amharic_ner_ray.pipelines.tokenize_export import EOD, build_vocab

        merges = bpe_train(SF, n_merges=12)
        eod_id = build_vocab(SF, merges)[EOD]
        got, _ = both
        flat = [i for ids in got["input_ids"] for i in ids]
        # 500 documents -> ~500 separators in the kept stream
        assert flat.count(eod_id) >= 400
