"""Subword label alignment + prediction→word decode (SURVEY.md §2.2 M9/M10).

Pure, tokenizer-agnostic re-implementations of the reference's two alignment
passes around the transformer forward pass:

* ``align_labels_with_subwords`` — the training-side tokenize-and-align
  (reference train_ner.py:252-303 ``tokenize_and_align_labels``): map each
  word-level BIO tag onto the word's subword pieces. Special tokens get
  ``-100`` (the loss-ignore index); the FIRST piece of a word carries the
  word's label; continuation pieces carry ``I-X`` when the word is ``B-X``,
  repeat ``I-X`` when it is ``I-X``, and ``-100`` otherwise (``O`` words
  contribute loss only on their first piece). A ``word_id`` pointing past
  the tag list (tokenization length mismatch) yields ``-100``, mirroring
  the reference's IndexError fallback.

* ``align_predictions_to_words`` — the inference-side first-subword argmax
  decode (reference interpret.py:1023-1038): walk the subword predictions,
  skip specials, and keep exactly one predicted label per word — the one on
  the word's first piece; continuation-piece predictions are discarded.

Both take an explicit ``word_ids`` sequence (``None`` for special tokens,
else the 0-based word index) — the surface HF fast tokenizers expose via
``BatchEncoding.word_ids()`` — so the functions run identically under a real
word-piece tokenizer or the deterministic :class:`MockWordPieceTokenizer`
shipped here for this torch-less container.

These are the only pieces of real-model NER scoring that are pure logic;
``stages/ner_scorer.py`` backend="mock_model" runs the full
subword-align → (stand-in forward pass) → argmax-decode path through them,
leaving ONLY the model forward as the environment-gated stub.
"""

from __future__ import annotations

from .iob import bio_decode  # noqa: F401  (re-exported convenience)
from ..schemas import BIO_LABELS

IGNORE_INDEX = -100

LABEL2ID: dict[str, int] = {lab: i for i, lab in enumerate(BIO_LABELS)}
ID2LABEL: dict[int, str] = {i: lab for i, lab in enumerate(BIO_LABELS)}


class MockWordPieceTokenizer:
    """Deterministic word-piece-style tokenizer for tests and the mock-model
    scorer: each word splits into fixed-width pieces (``piece_len`` chars,
    continuations prefixed ``##``), wrapped in [CLS]/[SEP] specials, with an
    optional ``max_length`` truncation — the same shape knobs that produce
    the reference's alignment edge cases (multi-piece words, specials,
    truncation-induced length mismatch)."""

    def __init__(self, piece_len: int = 4, max_length: int | None = None):
        self.piece_len = piece_len
        self.max_length = max_length

    def __call__(self, words: list[str]) -> dict:
        pieces: list[str] = ["[CLS]"]
        word_ids: list[int | None] = [None]
        for wi, w in enumerate(words):
            chunks = [w[i : i + self.piece_len] for i in range(0, len(w), self.piece_len)] or [w]
            for ci, c in enumerate(chunks):
                pieces.append(c if ci == 0 else "##" + c)
                word_ids.append(wi)
        pieces.append("[SEP]")
        word_ids.append(None)
        if self.max_length is not None and len(pieces) > self.max_length:
            # HF truncation keeps the trailing [SEP]
            pieces = pieces[: self.max_length - 1] + ["[SEP]"]
            word_ids = word_ids[: self.max_length - 1] + [None]
        return {"tokens": pieces, "word_ids": word_ids}


def align_labels_with_subwords(
    word_ids: list[int | None],
    tags: list[str],
    label2id: dict[str, int] = LABEL2ID,
) -> list[int]:
    """Word-level BIO tags → per-subword label ids (training alignment).

    Mirrors reference train_ner.py:252-303 rule-for-rule, including the
    B-→I- continuation rewrite and the -100 fallbacks."""
    label_ids: list[int] = []
    previous_word_idx: int | None = None
    for word_idx in word_ids:
        if word_idx is None:
            label_ids.append(IGNORE_INDEX)
        elif word_idx != previous_word_idx:
            if word_idx < len(tags):
                label_ids.append(label2id[tags[word_idx]])
            else:  # tokenization mismatch (reference's IndexError branch)
                label_ids.append(IGNORE_INDEX)
        else:
            previous_tag = tags[previous_word_idx] if previous_word_idx < len(tags) else None
            if previous_tag is None:
                label_ids.append(IGNORE_INDEX)
            elif previous_tag.startswith("B-"):
                label_ids.append(label2id.get("I-" + previous_tag[2:], IGNORE_INDEX))
            elif previous_tag.startswith("I-"):
                label_ids.append(label2id[previous_tag])
            else:
                label_ids.append(IGNORE_INDEX)
        previous_word_idx = word_idx
    return label_ids


def align_predictions_to_words(
    word_ids: list[int | None],
    pred_ids: list[int],
    id2label: dict[int, str] = ID2LABEL,
) -> list[str]:
    """Per-subword predicted label ids → one label per word (first-subword
    decode, reference interpret.py:1023-1038). ``pred_ids`` is the argmax
    over the label axis of the model logits."""
    aligned: list[str] = []
    current_word: int | None = None
    for k, word_id in enumerate(word_ids):
        if word_id is None:
            continue
        if word_id != current_word:
            aligned.append(id2label[pred_ids[k]])
            current_word = word_id
    return aligned


def strip_ignored(label_ids: list[int], id2label: dict[int, str] = ID2LABEL) -> list[str]:
    """Gold-side counterpart of the decode: drop -100 entries and map ids
    back to labels (reference train_ner.py compute_metrics' true_labels).
    NOTE: keeps every non-ignored subword label, so it pairs with
    per-subword predictions filtered the same way — not with
    ``align_predictions_to_words`` output, which is word-level."""
    return [id2label[i] for i in label_ids if i != IGNORE_INDEX]
