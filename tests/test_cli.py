"""CLI entrypoint (run.py) + JSON/CSV export parity (S4/S6) + NER-vs-regex
extractor agreement."""

import glob
import json

import pandas as pd
import pytest
import ray.data as rd


class TestCli:
    def test_run_with_json_export(self, ray_session, tiny_transcripts_dir, tmp_path):
        from ethiomart_amharic_ner_ray.run import main

        out = str(tmp_path / "cli_out")
        rc = main(
            [
                "--input", tiny_transcripts_dir,
                "--out", out,
                "--buckets", "4",
                "--export-format", "json",
            ]
        )
        assert rc == 0
        jfiles = glob.glob(out + "/triples_json/*.json")
        assert jfiles
        row = json.loads(open(jfiles[0]).readline())
        assert {"subj", "pred", "obj"} <= set(row)
        assert json.loads(open(out + "/run_metrics.json").read())["triples_rows"] > 0

    def test_full_run_with_labeling_and_scorecards(self, ray_session, tiny_transcripts_dir, tmp_path):
        """One command replaces the reference's whole script suite: triples
        + CoNLL labeling artifacts + vendor scorecards."""
        from ethiomart_amharic_ner_ray.run import main

        out = str(tmp_path / "full_out")
        rc = main(
            [
                "--input", tiny_transcripts_dir,
                "--out", out,
                "--buckets", "4",
                "--labeling-out", str(tmp_path / "labeling"),
                "--scorecards-out", str(tmp_path / "cards"),
                "--report-html", str(tmp_path / "report.html"),
            ]
        )
        assert rc == 0
        conll = glob.glob(str(tmp_path / "labeling" / "train" / "*.conll"))
        assert conll
        assert (tmp_path / "labeling" / "tag_distribution.json").exists()
        cards = glob.glob(str(tmp_path / "cards" / "scorecards" / "*.parquet"))
        assert cards
        summary = json.loads(open(tmp_path / "cards" / "summary.json").read())
        assert any(r["metric"] == "n_sellers" for r in summary)
        report = open(tmp_path / "report.html", encoding="utf-8").read()
        assert report.startswith("<!doctype html>") and "<svg" in report
        assert "Seller scorecards" in report and "priced_at" in report

    def test_run_with_csv_export(self, ray_session, tiny_transcripts_dir, tmp_path):
        from ethiomart_amharic_ner_ray.run import main

        out = str(tmp_path / "cli_csv")
        rc = main(
            ["--input", tiny_transcripts_dir, "--out", out, "--buckets", "4", "--export-format", "csv"]
        )
        assert rc == 0
        cfiles = glob.glob(out + "/triples_csv/*.csv")
        assert cfiles
        df = pd.read_csv(cfiles[0])
        assert {"subj", "pred", "obj", "extractor", "confidence"} <= set(df.columns)


class TestNerRegexAgreement:
    def test_phone_triples_identical_and_overall_overlap(self, ray_session, tiny_transcripts_dir):
        """PHONE semantics are identical across extractors → reachable_at
        sets must match EXACTLY. Products/prices legitimately diverge: the
        NER path applies the reference's IOB2 repair (SKU demotion splits
        spans, data_pipeline.py:118-122) which the regex path does not —
        so overall overlap is only sanity-checked."""
        from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples

        ds = rd.read_parquet(sorted(glob.glob(tiny_transcripts_dir + "/*.parquet")))
        rx = kg_triples(ds, extractor="regex", link=False, n_buckets=4, concurrency=2).to_pandas()
        nr = kg_triples(ds, extractor="ner", link=False, n_buckets=4, concurrency=2).to_pandas()

        def preds(df, p):
            d = df[df["pred"] == p]
            return set(zip(d["subj"], d["pred"], d["obj"]))

        assert preds(rx, "reachable_at") == preds(nr, "reachable_at")
        a = set(zip(rx["subj"], rx["pred"], rx["obj"]))
        b = set(zip(nr["subj"], nr["pred"], nr["obj"]))
        jaccard = len(a & b) / len(a | b)
        assert jaccard > 0.35, f"NER/regex overlap collapsed: {jaccard:.3f}"


class TestSubwordPipelineParity:
    def test_ner_subword_triples_equal_ner(self, ray_session, tiny_transcripts_dir):
        """extractor='ner_subword' routes every sentence through the full
        model-scoring dataflow (subword align → stand-in forward →
        first-subword decode); its triples must equal the plain rule-tagger
        NER path exactly — the alignment round-trip is lossless."""
        import glob as _glob

        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples

        ds = rd.read_parquet(sorted(_glob.glob(tiny_transcripts_dir + "/*.parquet")))
        nr = kg_triples(ds, extractor="ner", link=False, n_buckets=4, concurrency=2).to_pandas()
        sw = kg_triples(ds, extractor="ner_subword", link=False, n_buckets=4, concurrency=2).to_pandas()
        key = ["subj", "pred", "obj", "conv_id", "turn_idx"]
        a = nr[key].sort_values(key).reset_index(drop=True)
        b = sw[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestDisagreementReport:
    def test_phone_row_perfect_and_counts_consistent(self, ray_session, monkeypatch):
        import __ray_entry__ as e

        rep = e.queries()["kg_extractor_disagreement"]("/root/testdata/sf0.001").set_index("pred")
        assert rep.loc["reachable_at", "jaccard"] == 1.0  # identical semantics
        assert (rep["n_both"] + rep["n_regex_only"] + rep["n_ner_only"] > 0).all()
