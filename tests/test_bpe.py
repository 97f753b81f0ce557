"""Distributed BPE trainer pinned against an in-process reference
implementation (pure Python over the same word-frequency table), the same
strategy the dedup/ANN family uses for its non-SQL oracles."""

from __future__ import annotations

import glob
from collections import Counter

import pyarrow.parquet as pq
import pytest

from ethiomart_amharic_ner_ray.pipelines.bpe import (
    _EOW,
    _merge_word,
    bpe_encode_word,
    bpe_token_counts,
    bpe_train,
)

SF_DIR = "/root/testdata/sf0.001"


def _ref_word_counts(sf_dir: str) -> Counter:
    t = pq.read_table(glob.glob(f"{sf_dir}/documents.parquet")[0], columns=["text"])
    c: Counter = Counter()
    for text in t.column("text").to_pylist():
        for w in text.strip().split():
            c[w] += 1
    return c


def _ref_bpe_train(wc: Counter, n_merges: int):
    """Reference BPE (Sennrich-style, word-frequency table): max weighted
    pair, lexicographic tie-break, stop below count 2."""
    vocab = {w: list(w) + [_EOW] for w in wc}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            f = wc[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        if n < 2:
            break
        merges.append((rank, left, right, n))
        for w in vocab:
            vocab[w] = _merge_word(vocab[w], left, right)
    return merges, vocab


@pytest.fixture(scope="module")
def ref():
    wc = _ref_word_counts(SF_DIR)
    merges, vocab = _ref_bpe_train(wc, 10)
    return wc, merges, vocab


def test_bpe_train_matches_reference(ray_session, ref):
    _, merges, _ = ref
    got = bpe_train(SF_DIR, n_merges=10)
    want = [(r, l, rt, n) for r, l, rt, n in merges]
    assert list(map(tuple, got[["rank", "left", "right", "pair_count"]].itertuples(index=False))) == want


def test_bpe_encode_reproduces_training_segmentation(ref):
    wc, merges, vocab = ref
    ranks = {(l, r): rank for rank, l, r, _ in merges}
    for w, syms in vocab.items():
        assert bpe_encode_word(w, ranks) == syms, w


def test_bpe_token_counts_match_reference(ray_session, ref):
    wc, merges, vocab = ref
    got = (
        bpe_token_counts(SF_DIR, n_merges=10)
        .to_pandas()
        .set_index("doc_id")["n_bpe_tokens"]
        .to_dict()
    )
    t = pq.read_table(glob.glob(f"{SF_DIR}/documents.parquet")[0], columns=["doc_id", "text"])
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        want = sum(len(vocab[w]) for w in text.strip().split())
        assert got[doc_id] == want, doc_id
