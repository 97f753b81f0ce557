"""Distributed-trained quality classifier (pipelines/classifier.py):
the distributed trainer must match the in-process reference, learn a
planted-separable corpus, and stay deterministic across runs."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """A corpus where lang IS decidable from text: 'en' docs draw from one
    vocabulary, others from a disjoint one, plus shared filler — so the
    classifier has real signal to find."""
    rng = np.random.default_rng(7)
    en_vocab = [f"alpha{i}" for i in range(30)]
    xx_vocab = [f"beta{i}" for i in range(30)]
    filler = [f"common{i}" for i in range(20)]
    rows = []
    for d in range(400):
        is_en = d % 2 == 0
        vocab = en_vocab if is_en else xx_vocab
        toks = [vocab[rng.integers(len(vocab))] for _ in range(12)] + [
            filler[rng.integers(len(filler))] for _ in range(8)
        ]
        rows.append(
            {
                "doc_id": d,
                "text": " ".join(toks),
                "lang": "en" if is_en else "fr",
                "source": f"src{d % 4}",
                "n_chars": 0,
            }
        )
    out = tmp_path_factory.mktemp("planted")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), str(out / "documents.parquet"))
    return str(out)


class TestClassifier:
    def test_distributed_matches_reference(self, ray_session):
        from ethiomart_amharic_ner_ray.pipelines.classifier import (
            reference_train,
            train_quality_classifier,
        )

        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
        ).to_pandas()
        w_ref, b_ref, _ = reference_train(docs)
        w, b = train_quality_classifier(SF)
        assert np.allclose(w, w_ref, atol=1e-8)
        assert abs(b - b_ref) < 1e-8

    def test_scores_match_reference_probs(self, ray_session):
        from ethiomart_amharic_ner_ray.pipelines.classifier import (
            quality_classifier_scores,
            reference_train,
        )

        docs = (
            pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        _, _, p_ref = reference_train(docs)
        got = (
            quality_classifier_scores(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert np.allclose(got["prob"].to_numpy(), np.round(p_ref, 6), atol=2e-6)
        assert set(got.columns) == {"doc_id", "prob", "keep"}
        assert len(got) == len(docs)

    def test_learns_planted_signal(self, ray_session, planted_dir):
        from ethiomart_amharic_ner_ray.pipelines.classifier import (
            quality_classifier_scores,
        )

        got = quality_classifier_scores(planted_dir, iters=40).to_pandas()
        truth = (got["doc_id"] % 2 == 0).astype(int)
        acc = float((got["keep"] == truth).mean())
        assert acc >= 0.95, f"classifier failed to learn planted signal: acc={acc}"

    def test_deterministic_across_runs(self, ray_session):
        from ethiomart_amharic_ner_ray.pipelines.classifier import (
            train_quality_classifier,
        )

        w1, b1 = train_quality_classifier(SF, iters=5)
        w2, b2 = train_quality_classifier(SF, iters=5)
        assert np.allclose(w1, w2, atol=1e-12) and abs(b1 - b2) < 1e-12

    def test_empty_doc_gets_bias_prob(self, ray_session, tmp_path):
        from ethiomart_amharic_ner_ray.pipelines.classifier import (
            quality_classifier_scores,
        )

        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(
                    {
                        "doc_id": [0, 1, 2],
                        "text": ["alpha alpha beta", "", "   "],
                        "lang": ["en", "fr", "en"],
                    }
                )
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = quality_classifier_scores(str(tmp_path), iters=3).to_pandas()
        assert len(got) == 3
        # the two token-free docs see only the bias term -> identical prob
        p = got.sort_values("doc_id")["prob"].to_numpy()
        assert p[1] == p[2]

    def test_checkpoint_resume_equals_straight_run(self, ray_session, tmp_path):
        from ethiomart_amharic_ner_ray.pipelines.classifier import (
            train_quality_classifier,
        )

        ck = str(tmp_path / "ck")
        # "crash" after 3 of 6 iterations...
        train_quality_classifier(SF, iters=3, checkpoint_dir=ck)
        # ...resume to 6; must equal an uncheckpointed 6-iteration run
        w_res, b_res = train_quality_classifier(SF, iters=6, checkpoint_dir=ck)
        w_ref, b_ref = train_quality_classifier(SF, iters=6)
        assert np.allclose(w_res, w_ref, atol=1e-9) and abs(b_res - b_ref) < 1e-9

    def test_checkpoint_fingerprint_mismatch_restarts(self, ray_session, tmp_path):
        from ethiomart_amharic_ner_ray.pipelines.classifier import (
            train_quality_classifier,
        )

        ck = str(tmp_path / "ck2")
        train_quality_classifier(SF, iters=2, lr=1.0, checkpoint_dir=ck)
        # different lr -> different fingerprint -> stale model ignored
        w, b = train_quality_classifier(SF, iters=2, lr=2.0, checkpoint_dir=ck)
        w_ref, b_ref = train_quality_classifier(SF, iters=2, lr=2.0)
        assert np.allclose(w, w_ref, atol=1e-12) and abs(b - b_ref) < 1e-12
