"""Ethiopic folding + price/phone canonicalization tests."""

from ethiomart_amharic_ner_ray.functions.canonical import (
    canon_phone,
    canon_price,
    canon_text,
    fold_ethiopic,
    parse_price,
)


class TestFold:
    def test_ha_series(self):
        assert fold_ethiopic("ሐ") == "ሀ"
        assert fold_ethiopic("ኀ") == "ሀ"
        assert fold_ethiopic("ሑ") == "ሁ"  # order preserved across the row

    def test_se_series(self):
        assert fold_ethiopic("ሠዓት") == fold_ethiopic("ሰዓት")

    def test_a_series(self):
        assert fold_ethiopic("ዐይን") == "አይን"

    def test_tse_series(self):
        assert fold_ethiopic("ፀሐይ") == "ጸሀይ"

    def test_untouched(self):
        assert fold_ethiopic("መገናኛ") == "መገናኛ"

    def test_homophone_products_merge(self):
        assert canon_text("ሀይላንድ") == canon_text("ኃይላንድ")
        assert canon_text("ጸጉር ማድረቂያ") == canon_text("ፀጉር  ማድረቂያ")


class TestCanonText:
    def test_casefold_and_ws(self):
        assert canon_text("  VIP   Shoes ") == "vip shoes"

    def test_nfkc(self):
        assert canon_text("ＶＩＰ") == "vip"


class TestPrice:
    def test_parse(self):
        assert parse_price("1,500") == 1500.0
        assert parse_price("99.5") == 99.5
        assert parse_price("abc") is None

    def test_canon_integral(self):
        assert canon_price("1,500") == "1500 ብር"
        assert canon_price("500.0") == "500 ብር"

    def test_canon_decimal(self):
        assert canon_price("99.5") == "99.5 ብር"

    def test_canon_invalid(self):
        assert canon_price("x") is None


class TestPhone:
    def test_national_form(self):
        assert canon_phone("911234567") == "0911234567"
        assert canon_phone("0911234567") == "0911234567"
