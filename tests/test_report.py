"""HTML run report (reference visualization.py parity at engine scale):
pure driver-side formatting of aggregate frames — no Ray needed here."""

import pandas as pd

from ethiomart_amharic_ner_ray.pipelines.report import (
    render_html_report,
    write_html_report,
)


def _cards(n=12):
    return pd.DataFrame(
        {
            "seller": [f"c{i:04d}" for i in range(n)],
            "total_turns": [10 * (i + 1) for i in range(n)],
            "total_products": [n - i for i in range(n)],
            "product_variety": [min(5, n - i) for i in range(n)],
            "avg_price": [100.0 * i for i in range(n)],
        }
    )


def _summary():
    return pd.DataFrame(
        {"metric": ["n_sellers", "total_turns"], "value": ["12", "780"]}
    )


class TestRenderHtmlReport:
    def test_contains_sections_and_svg_charts(self):
        out = render_html_report(
            _cards(), _summary(), {"sells": 100, "priced_at": 50}, top_k=5
        )
        assert out.startswith("<!doctype html>")
        assert out.count("<svg") == 3  # predicates + products + prices
        assert "Triples per predicate" in out and "sells" in out
        assert "Run summary" in out and "n_sellers" in out
        # top-k slice is by total_products desc → c0000 first
        assert "c0000" in out and "Seller scorecards" in out
        assert "</html>" in out

    def test_escapes_html_in_values(self):
        cards = _cards(2)
        cards.loc[0, "seller"] = "<script>alert(1)</script>"
        out = render_html_report(cards, None, None)
        assert "<script>alert" not in out
        assert "&lt;script&gt;" in out

    def test_empty_inputs_render_without_charts(self):
        out = render_html_report(pd.DataFrame(), None, None)
        assert out.startswith("<!doctype html>") and "</html>" in out
        assert "<svg" not in out

    def test_row_cap_noted(self):
        out = render_html_report(_cards(60), None, None)
        assert "more rows omitted" in out

    def test_write_is_atomic(self, tmp_path):
        p = str(tmp_path / "sub" / "report.html")
        write_html_report(p, render_html_report(_cards(), _summary(), {"sells": 1}))
        text = open(p, encoding="utf-8").read()
        assert "</html>" in text
        assert not (tmp_path / "sub" / "report.html.tmp").exists()
