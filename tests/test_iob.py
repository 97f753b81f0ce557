"""Table-driven tests for the IOB2 repair/validate/clean/decode rules
(reference data_pipeline.py:101-188, train_ner.py:97-113)."""

import pytest

from ethiomart_amharic_ner_ray.functions.iob import (
    bio_decode,
    clean_tags,
    fix_entity_tags,
    validate_sentence,
)
from ethiomart_amharic_ner_ray.schemas import BIO_LABELS


class TestFixEntityTags:
    def test_rule1_absorbs_price_unit(self):
        tokens = ["ዋጋ", "500", "ብር"]
        tags = ["O", "B-PRICE", "O"]
        assert fix_entity_tags(tokens, tags) == ["O", "B-PRICE", "I-PRICE"]

    def test_rule1_birr_latin(self):
        assert fix_entity_tags(["100", "birr"], ["B-PRICE", "O"]) == [
            "B-PRICE",
            "I-PRICE",
        ]

    def test_rule1_stride_quirk(self):
        # reference's `i += 2` skips the token after any PRICE: the second
        # consecutive price number is never checked for its own unit
        tokens = ["500", "600", "ብር"]
        tags = ["B-PRICE", "B-PRICE", "O"]
        out = fix_entity_tags(tokens, tags)
        assert out == ["B-PRICE", "B-PRICE", "O"]  # ብር NOT absorbed — faithful

    def test_rule2_sku_demoted(self):
        tokens = ["ABC-123", "ጫማ"]
        tags = ["B-PRODUCT", "I-PRODUCT"]
        out = fix_entity_tags(tokens, tags)
        assert out[0] == "O"
        # the orphaned I-PRODUCT is then promoted by rule 3
        assert out[1] == "B-PRODUCT"

    def test_rule2_amharic_token_not_sku(self):
        assert fix_entity_tags(["ጫማ123ABC"], ["B-PRODUCT"]) == ["B-PRODUCT"]

    def test_rule3_orphan_promoted(self):
        # the raw reference corpus has zero B-PRICE tags; rule 3 creates them
        tags = fix_entity_tags(["a", "b"], ["O", "I-PRICE"])
        assert tags == ["O", "B-PRICE"]

    def test_rule3_type_switch(self):
        tags = fix_entity_tags(["a", "b"], ["B-PRODUCT", "I-PRICE"])
        assert tags == ["B-PRODUCT", "B-PRICE"]

    def test_rule3_valid_sequence_untouched(self):
        tags = ["B-LOC", "I-LOC", "O"]
        assert fix_entity_tags(["አዲስ", "አበባ", "ነው"], tags) == tags


class TestValidateSentence:
    def test_length_mismatch(self):
        assert not validate_sentence(["a"], ["O", "O"])

    def test_orphan_i(self):
        assert not validate_sentence(["a", "b"], ["O", "I-PRICE"])

    def test_b_after_i_rejected(self):
        # stricter-than-standard rule from the reference
        assert not validate_sentence(["a", "b"], ["I-LOC", "B-LOC"])

    def test_i_after_b_wrong_type(self):
        assert not validate_sentence(["a", "b"], ["B-LOC", "I-PRICE"])

    def test_valid(self):
        assert validate_sentence(["a", "b", "c"], ["B-LOC", "I-LOC", "O"])

    def test_empty_ok(self):
        assert validate_sentence([], [])


class TestCleanTags:
    def test_unknown_to_o(self):
        labels = frozenset(BIO_LABELS)
        assert clean_tags(["B-PRODUCT", "B-DATE", "XYZ"], labels) == [
            "B-PRODUCT",
            "O",
            "O",
        ]

    def test_8label_schema_drops_iloc(self):
        # reference train_ner.py:38 has no I-LOC → silently converted to O
        labels8 = frozenset(BIO_LABELS) - {"I-LOC"}
        assert clean_tags(["B-LOC", "I-LOC"], labels8) == ["B-LOC", "O"]


class TestBioDecode:
    def test_simple(self):
        spans = bio_decode(["ቦሌ", "x"], ["B-LOC", "O"])
        assert spans == [
            {"etype": "LOC", "tok_start": 0, "tok_end": 1, "surface": "ቦሌ"}
        ]

    def test_multi_token(self):
        spans = bio_decode(
            ["አዲስ", "አበባ", "500", "ብር"],
            ["B-LOC", "I-LOC", "B-PRICE", "I-PRICE"],
        )
        assert [s["etype"] for s in spans] == ["LOC", "PRICE"]
        assert spans[0]["surface"] == "አዲስ አበባ"
        assert spans[1]["surface"] == "500 ብር"

    def test_adjacent_b(self):
        spans = bio_decode(["a", "b"], ["B-PRODUCT", "B-PRODUCT"])
        assert len(spans) == 2

    def test_trailing_span(self):
        spans = bio_decode(["a", "b"], ["O", "B-PHONE"])
        assert spans[0]["tok_end"] == 2


@pytest.mark.parametrize(
    "tokens,tags",
    [
        (["ዋጋ", "500", "ብር", "ነው"], ["O", "I-PRICE", "O", "O"]),
        (["ABC123", "ጫማ", "እሸጣለሁ"], ["I-PRODUCT", "I-PRODUCT", "O"]),
    ],
)
def test_repair_then_validate(tokens, tags):
    """Repaired output always passes the reference validator."""
    assert validate_sentence(tokens, fix_entity_tags(tokens, tags))
