"""Mention/entity extraction tests (reference data_cleaner.py:70-79 semantics)."""

from ethiomart_amharic_ner_ray.functions.extract import (
    build_loc_pattern,
    extract_entities_v1,
    extract_mentions,
)


class TestExtractEntitiesV1:
    def test_empty(self):
        assert extract_entities_v1("") == {}

    def test_price(self):
        e = extract_entities_v1("ዋጋ 1,500 ብር ነው")
        assert e["prices"] == ["1,500"]

    def test_phone_both_forms(self):
        e = extract_entities_v1("ይደውሉ 0911234567 ወይም 911234568")
        assert "0911234567" in e["phones"]

    def test_product_trigger(self):
        e = extract_entities_v1("ለሽያጭ ጫማ ቀርቧል")
        assert e["products"] == ["ጫማ ቀርቧል"]  # captures to end of line — faithful

    def test_no_trigger_no_product(self):
        assert extract_entities_v1("ጥሩ ጫማ ነው")["products"] == []


class TestExtractMentions:
    def setup_method(self):
        self.loc = build_loc_pattern()

    def test_price_span(self):
        ms = extract_mentions("ዋጋ 500 ብር ነው", self.loc)
        price = [m for m in ms if m["etype"] == "PRICE"]
        assert len(price) == 1
        assert price[0]["norm"] == "500 ብር"
        assert price[0]["surface"] == "500 ብር"

    def test_phone_lookaround(self):
        # digits embedded in longer numbers don't match (v2 lookarounds)
        ms = extract_mentions("12340911234567890", self.loc)
        assert [m for m in ms if m["etype"] == "PHONE"] == []

    def test_phone_norm(self):
        ms = extract_mentions("911234567 ይደውሉ", self.loc)
        phones = [m for m in ms if m["etype"] == "PHONE"]
        assert phones[0]["norm"] == "0911234567"

    def test_product_cut_at_price(self):
        ms = extract_mentions("ለሽያጭ ጫማ 500 ብር", self.loc)
        prods = [m for m in ms if m["etype"] == "PRODUCT"]
        assert prods[0]["surface"] == "ጫማ"
        assert prods[0]["norm"] == "ጫማ"

    def test_loc_gazetteer_longest_wins(self):
        ms = extract_mentions("ቦሌ አዲስ አበባ እንገኛለን", self.loc)
        locs = [m for m in ms if m["etype"] == "LOC"]
        assert locs[0]["norm"] == "ቦሌ አዲስ አበባ"
        assert len(locs) == 1

    def test_loc_folded_variant_matches(self):
        # homophone spelling matches the gazetteer via folding
        ms = extract_mentions("መርካቶ ውስጥ", self.loc)
        assert any(m["etype"] == "LOC" for m in ms)

    def test_mentions_sorted_by_start(self):
        ms = extract_mentions("ለሽያጭ ጫማ 500 ብር 0911234567 መገናኛ", self.loc)
        starts = [m["start"] for m in ms]
        assert starts == sorted(starts)

    def test_empty_text(self):
        assert extract_mentions("", self.loc) == []
