"""Subword label alignment / prediction decode (SURVEY.md §2.2 M9/M10).

Table-driven cases mirror the reference semantics (train_ner.py
tokenize_and_align_labels; interpret.py first-subword argmax decode), driven
by the deterministic mock word-piece tokenizer."""

import pyarrow as pa
import pytest

from ethiomart_amharic_ner_ray.functions.subword import (
    IGNORE_INDEX,
    ID2LABEL,
    LABEL2ID,
    MockWordPieceTokenizer,
    align_labels_with_subwords,
    align_predictions_to_words,
    strip_ignored,
)


def ids(*labels):
    return [LABEL2ID[l] if isinstance(l, str) else l for l in labels]


class TestMockTokenizer:
    def test_short_words_single_piece(self):
        enc = MockWordPieceTokenizer(piece_len=4)(["cat", "sat"])
        assert enc["tokens"] == ["[CLS]", "cat", "sat", "[SEP]"]
        assert enc["word_ids"] == [None, 0, 1, None]

    def test_long_word_splits_with_continuation_prefix(self):
        enc = MockWordPieceTokenizer(piece_len=4)(["telephone"])
        assert enc["tokens"] == ["[CLS]", "tele", "##phon", "##e", "[SEP]"]
        assert enc["word_ids"] == [None, 0, 0, 0, None]

    def test_truncation_keeps_sep(self):
        enc = MockWordPieceTokenizer(piece_len=4, max_length=4)(["telephone", "box"])
        assert enc["tokens"][-1] == "[SEP]"
        assert len(enc["tokens"]) == 4
        assert enc["word_ids"] == [None, 0, 0, None]


class TestAlignLabels:
    """Reference rules: specials → -100; first piece → word label;
    continuation of B-X → I-X; of I-X → I-X; of O → -100."""

    @pytest.mark.parametrize(
        "word_ids,tags,expect",
        [
            # one single-piece word
            ([None, 0, None], ["B-PRICE"], [IGNORE_INDEX] + ids("B-PRICE") + [IGNORE_INDEX]),
            # B- word split in 3 pieces → B, I, I
            (
                [None, 0, 0, 0, None],
                ["B-PRODUCT"],
                [IGNORE_INDEX] + ids("B-PRODUCT", "I-PRODUCT", "I-PRODUCT") + [IGNORE_INDEX],
            ),
            # I- word split → I repeats
            (
                [None, 0, 1, 1, None],
                ["B-LOC", "I-LOC"],
                [IGNORE_INDEX] + ids("B-LOC", "I-LOC", "I-LOC") + [IGNORE_INDEX],
            ),
            # O word split → first piece O, continuations ignored
            (
                [None, 0, 0, None],
                ["O"],
                [IGNORE_INDEX] + ids("O", IGNORE_INDEX) + [IGNORE_INDEX],
            ),
            # tokenization mismatch: word_id past the tag list → -100
            ([None, 0, 1, None], ["O"], [IGNORE_INDEX] + ids("O") + [IGNORE_INDEX, IGNORE_INDEX]),
        ],
    )
    def test_cases(self, word_ids, tags, expect):
        assert align_labels_with_subwords(word_ids, tags) == expect

    def test_continuation_of_b_without_i_in_vocab_is_ignored(self):
        vocab = {"O": 0, "B-MISC": 1}  # no I-MISC
        out = align_labels_with_subwords([None, 0, 0, None], ["B-MISC"], vocab)
        assert out == [IGNORE_INDEX, 1, IGNORE_INDEX, IGNORE_INDEX]

    def test_strip_ignored_recovers_labels(self):
        word_ids = [None, 0, 0, 1, None]
        lab = align_labels_with_subwords(word_ids, ["B-PRICE", "I-PRICE"])
        assert strip_ignored(lab) == ["B-PRICE", "I-PRICE", "I-PRICE"]


class TestAlignPredictions:
    def test_first_subword_wins(self):
        word_ids = [None, 0, 0, 1, None]
        # model flips the continuation piece; decode must ignore it
        preds = ids("B-PRICE", "I-PRICE") + ids("B-LOC")
        preds = [LABEL2ID["O"]] + preds + [LABEL2ID["O"]]
        assert align_predictions_to_words(word_ids, preds) == ["B-PRICE", "B-LOC"]

    def test_specials_skipped(self):
        assert align_predictions_to_words([None, None], ids("O", "O")) == []

    @pytest.mark.parametrize(
        "words,tags",
        [
            (["cat"], ["O"]),
            (["smartphone", "5000", "birr"], ["B-PRODUCT", "B-PRICE", "I-PRICE"]),
            (["addis", "abeba", "telephone"], ["B-LOC", "I-LOC", "B-PRODUCT"]),
        ],
    )
    def test_roundtrip_align_then_decode(self, words, tags):
        """training-side align → stand-in argmax → decode == original tags."""
        enc = MockWordPieceTokenizer(piece_len=4)(words)
        lab = align_labels_with_subwords(enc["word_ids"], tags)
        preds = [LABEL2ID["O"] if i == IGNORE_INDEX else i for i in lab]
        assert align_predictions_to_words(enc["word_ids"], preds) == tags


class TestMockModelBackend:
    """backend='mock_model' runs the whole model-scoring dataflow and must be
    mention-identical to backend='rules' (the forward stand-in is the rule
    tagger routed through both alignments)."""

    @pytest.fixture(scope="class")
    def scorers(self):
        from ethiomart_amharic_ner_ray.stages.ner_scorer import NerScorer

        return NerScorer(backend="rules"), NerScorer(backend="mock_model")

    @pytest.mark.parametrize(
        "text",
        [
            "ሽያጭ: smartphone በ 2500 ብር አዲስ አበባ 0911234567",
            "ladies dress ዋጋ 1,200 ብር bole",
            "no entities at all here",
            "",
        ],
    )
    def test_mention_parity_with_rules(self, scorers, text):
        rules, mock = scorers
        batch = pa.table({"clean_text": pa.array([text], pa.string())})
        assert mock(batch).column("mentions").to_pylist() == rules(
            batch
        ).column("mentions").to_pylist()

    def test_unknown_backend_rejected(self):
        from ethiomart_amharic_ner_ray.stages.ner_scorer import NerScorer

        with pytest.raises(ValueError):
            NerScorer(backend="nope")

    def test_transformers_backend_raises_not_implemented(self):
        from ethiomart_amharic_ner_ray.stages.ner_scorer import NerScorer

        with pytest.raises(NotImplementedError):
            NerScorer(backend="transformers")


class TestTinyTransformerBackend:
    """The numpy forward stand-in: the logits→argmax path runs with real
    floating-point logits, and the decoded mentions stay identical to the
    rule-derived path (kg_triples_ner_subword unchanged)."""

    TEXTS = [
        "ሽያጭ: smartphone በ 2500 ብር አዲስ አበባ 0911234567",
        "ladies dress ዋጋ 1,200 ብር bole",
        "ለሽያጭ ላፕቶፕ 35,000 birr መገናኛ 0922334455",
        "no entities at all here",
        "",
    ]

    def test_mentions_identical_to_mock_model(self):
        from ethiomart_amharic_ner_ray.stages.ner_scorer import NerScorer

        mock = NerScorer(backend="mock_model")
        tiny = NerScorer(backend="tiny_transformer")
        batch = pa.table({"clean_text": pa.array(self.TEXTS, pa.string())})
        assert tiny(batch).column("mentions").to_pylist() == mock(batch).column(
            "mentions"
        ).to_pylist()

    def test_logits_are_real_floats(self):
        import numpy as np

        from ethiomart_amharic_ner_ray.functions.subword import (
            IGNORE_INDEX,
            LABEL2ID,
            align_labels_with_subwords,
        )
        from ethiomart_amharic_ner_ray.functions.textnorm import tokenize
        from ethiomart_amharic_ner_ray.stages.ner_scorer import NerScorer

        tiny = NerScorer(backend="tiny_transformer")
        words = tokenize(self.TEXTS[0])
        enc = tiny._tokenizer(words)
        _, tags = tiny._tag_words(words)
        o_id = LABEL2ID["O"]
        teacher = [
            o_id if i == IGNORE_INDEX else i
            for i in align_labels_with_subwords(enc["word_ids"], tags)
        ]
        logits = tiny._net.logits(enc["tokens"], teacher)
        assert logits.dtype == np.float32
        assert logits.shape == (len(enc["tokens"]), len(LABEL2ID))
        assert np.isfinite(logits).all()
        # argmax reproduces the teacher ids (margin dominates)...
        assert logits.argmax(axis=1).tolist() == teacher
        # ...but the network term is non-degenerate: removing the teacher
        # bias leaves real non-zero float structure at every position
        residual = logits.copy()
        residual[np.arange(len(teacher)), teacher] -= tiny._net.margin
        assert (np.abs(residual) > 0).any(axis=1).all()
        assert np.abs(residual).max() <= tiny._net.margin / 2

    def test_forward_is_deterministic_across_instances(self):
        import numpy as np

        from ethiomart_amharic_ner_ray.stages.ner_scorer import TinyTransformerForward

        a = TinyTransformerForward(n_labels=9)
        b = TinyTransformerForward(n_labels=9)
        pieces = ["[CLS]", "hell", "##o", "wor", "##ld", "[SEP]"]
        teacher = [0, 1, 2, 0, 0, 0]
        np.testing.assert_array_equal(a.logits(pieces, teacher), b.logits(pieces, teacher))
