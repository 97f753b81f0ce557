"""Golden tests for the two normalizer variants (reference data_cleaner.py:52-68
vs data_pipeline.py:83-99), covering their observable ordering differences."""

from ethiomart_amharic_ner_ray.functions.textnorm import (
    clean_text_v1,
    normalize_text_v2,
    sha256_text,
    tokenize,
)


class TestCleanTextV1:
    def test_sentinel_and_none(self):
        assert clean_text_v1("[no text]") == ""
        assert clean_text_v1(None) == ""
        assert clean_text_v1(float("nan")) == ""

    def test_price_substitution_unit_required(self):
        assert clean_text_v1("ዋጋ 500 ብር ነው") == "ዋጋ 500 ብር ነው"
        assert clean_text_v1("ዋጋ 500 birr ነው") == "ዋጋ 500 ብር ነው"
        assert clean_text_v1("ዋጋ 1,500 ዶላር") == "ዋጋ 1,500 ብር"
        # no unit → untouched (v1 requires a unit)
        assert clean_text_v1("ዋጋ 500 ነው") == "ዋጋ 500 ነው"

    def test_price_attached_unit(self):
        assert clean_text_v1("300ብር") == "300 ብር"

    def test_partial_match_on_ungrouped_number(self):
        # reference quirk: \d{1,3} with required comma grouping means
        # '2500 ብር' matches only the trailing '500' — faithful, not a bug here
        assert clean_text_v1("2500 ብር") == "2500 ብር"  # sub keeps "2" + "500 ብር"

    def test_url_strip(self):
        assert clean_text_v1("ይግዙ https://t.me/shop ዛሬ") == "ይግዙ ዛሬ"
        assert clean_text_v1("www.example.com/x ገዛ") == "ገዛ"

    def test_special_chars_stripped_to_empty(self):
        # v1 deletes (no space left behind): ab#cd fuses
        assert clean_text_v1("ab#cd") == "abcd"

    def test_keeps_amharic_and_punct(self):
        assert clean_text_v1("ሰላም! እንዴት, ነህ?") == "ሰላም! እንዴት, ነህ?"

    def test_whitespace_collapse(self):
        assert clean_text_v1("a   b\n\nc\t d") == "a b c d"

    def test_ethiopic_punctuation_preserved(self):
        # ፦ (U+1366) is inside the preserved ሀ-፿ block
        assert clean_text_v1("ዋጋ፦ 700 ብር") == "ዋጋ፦ 700 ብር"

    def test_price_sub_before_special_strip(self):
        # v1 order: price sub runs BEFORE special strip, so a unit glued to a
        # special char is still recognized ("$" removed only afterwards)
        assert clean_text_v1("700 ብር$") == "700 ብር"


class TestNormalizeV2:
    def test_empty(self):
        assert normalize_text_v2("") == ""
        assert normalize_text_v2(None) == ""

    def test_special_chars_stripped_to_space(self):
        # v2 replaces with SPACE: ab#cd stays two tokens (difference vs v1)
        assert normalize_text_v2("ab#cd") == "ab cd"

    def test_emoji_replacement(self):
        # [EMOJI] brackets are then stripped to spaces → bare EMOJI token
        assert normalize_text_v2("ጥሩ 😍 ነው") == "ጥሩ EMOJI ነው"

    def test_nfkc(self):
        assert normalize_text_v2("ＶＩＰ") == "VIP"
        assert normalize_text_v2("①") == "1 ብር"  # NFKC → '1', then priced (≤3 digits)

    def test_optional_unit_prices_small_numbers(self):
        # unit optional: standalone ≤3-digit number gets ብር appended
        assert normalize_text_v2("ዋጋ 500 ነው") == "ዋጋ 500 ብር ነው"

    def test_ungrouped_4digit_not_priced(self):
        # \d{1,3} + \b: 4-digit ungrouped numbers do NOT match
        assert normalize_text_v2("ዋጋ 2500 ነው") == "ዋጋ 2500 ነው"

    def test_grouped_number_priced(self):
        assert normalize_text_v2("ዋጋ 2,500 ነው") == "ዋጋ 2,500 ብር ነው"

    def test_unit_normalized(self):
        assert normalize_text_v2("100 birr") == "100 ብር"


def test_sha256_stable():
    assert sha256_text("ሰላም") == sha256_text("ሰላም")
    assert sha256_text("a") != sha256_text("b")
    assert len(sha256_text("")) == 64


def test_tokenize():
    assert tokenize("a  b\tc") == ["a", "b", "c"]
    assert tokenize("") == []
