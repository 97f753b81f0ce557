"""Unit tests for dedup sketches + similarity kernels (no Ray needed for the
pure kernels; dataset-level behavior is covered by the query conformance)."""

import numpy as np
import pytest

from ethiomart_amharic_ner_ray.pipelines.dedup import (
    _minhash,
    _perm_params,
    _word_shingles,
)
from ethiomart_amharic_ner_ray.pipelines.common import round_away
from ethiomart_amharic_ner_ray.stages.linker import _trigram_vector


class TestMinhash:
    def test_identical_texts_identical_sigs(self):
        a, b = _perm_params()
        s1 = _minhash(_word_shingles("the quick brown fox jumps"), a, b)
        s2 = _minhash(_word_shingles("the quick brown fox jumps"), a, b)
        assert np.array_equal(s1, s2)

    def test_jaccard_estimate_tracks_truth(self):
        a, b = _perm_params()
        t1 = "w" + " w".join(str(i) for i in range(100))
        toks = t1.split()
        t2 = " ".join(toks[:80] + ["x%d" % i for i in range(20)])  # ~0.65 true
        sh1, sh2 = _word_shingles(t1), _word_shingles(t2)
        true_j = len(sh1 & sh2) / len(sh1 | sh2)
        s1, s2 = _minhash(sh1, a, b), _minhash(sh2, a, b)
        est = float(np.mean(s1 == s2))
        assert abs(est - true_j) < 0.25  # 64 perms → coarse but unbiased

    def test_disjoint_texts_low_estimate(self):
        a, b = _perm_params()
        s1 = _minhash(_word_shingles(" ".join("a%d" % i for i in range(50))), a, b)
        s2 = _minhash(_word_shingles(" ".join("b%d" % i for i in range(50))), a, b)
        assert float(np.mean(s1 == s2)) < 0.2

    def test_empty(self):
        a, b = _perm_params()
        assert _word_shingles("") == set()
        sig = _minhash(set(), a, b)
        assert (sig == np.iinfo(np.uint64).max).all()


class TestRoundAway:
    @pytest.mark.parametrize(
        "x,expect",
        [(0.19385, 0.1939), (0.12345, 0.1235), (-0.12345, -0.1235), (1.0, 1.0)],
    )
    def test_half_away_from_zero(self, x, expect):
        assert round_away(x, 4) == pytest.approx(expect, abs=1e-12)

    def test_array(self):
        out = round_away(np.array([0.00005, -0.00005]), 4)
        assert out.tolist() == [0.0001, -0.0001]


class TestTrigram:
    def test_similar_strings_high_cosine(self):
        v1, v2 = _trigram_vector("ladies dress"), _trigram_vector("ladies dresses")
        assert float(v1 @ v2) > 0.7

    def test_different_strings_low_cosine(self):
        v1, v2 = _trigram_vector("sofa"), _trigram_vector("telephone")
        assert float(v1 @ v2) < 0.5
