"""End-to-end curation pipeline: stage-count consistency, determinism of
the exported shards, and the per-stage rules (dedup uniqueness, quality
thresholds, md5 split)."""

import glob
import hashlib
import json
import shutil
import sys
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"
TRAIN_HEX = "cccccccc" + "0" * 24


@pytest.fixture(scope="module")
def run(ray_session, tmp_path_factory):
    from ethiomart_amharic_ner_ray.pipelines.curate import run_curation_pipeline

    out = str(tmp_path_factory.mktemp("curation"))
    shutil.rmtree(out, ignore_errors=True)
    m = run_curation_pipeline(SF, out)
    return out, m


class TestCuration:
    def test_stage_counts_consistent(self, run):
        out, m = run
        assert m["n_input"] >= m["n_after_dedup"] >= m["n_after_quality"]
        assert m["n_after_quality"] == m["n_train"] + m["n_val"] > 0
        assert 0 < m["n_val"] < m["n_train"]  # ~80/20

    def test_survivor_texts_unique(self, run):
        out, _ = run
        t = pq.read_table(f"{out}/dedup_survivors", columns=["text"])
        texts = t.column("text").to_pylist()
        assert len(texts) == len(set(texts))

    def test_split_respects_md5_rule(self, run):
        out, _ = run
        for split, want_train in (("train", True), ("val", False)):
            for f in glob.glob(f"{out}/{split}/shard-*.parquet"):
                for d in pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist():
                    is_train = hashlib.md5(str(d).encode()).hexdigest() < TRAIN_HEX
                    assert is_train == want_train, (split, d)

    def test_quality_gate_matches_q131_thresholds(self, run):
        out, m = run
        # at sf0.001 the documents table has no exact dups, so the
        # survivor set == input and the thresholds must equal q131's
        from ethiomart_amharic_ner_ray.pipelines.textstats import q131_source_quality_gate

        if m["n_input"] != m["n_after_dedup"]:
            pytest.skip("fixture has exact dups; thresholds differ by design")
        gated = q131_source_quality_gate(SF)
        assert len(gated) == m["n_after_quality"]

    def test_deterministic_rerun(self, run, tmp_path):
        out, m = run
        from ethiomart_amharic_ner_ray.pipelines.curate import run_curation_pipeline

        out2 = str(tmp_path / "rerun")
        m2 = run_curation_pipeline(SF, out2)
        assert {k: m[k] for k in ("n_input", "n_train", "n_val")} == {
            k: m2[k] for k in ("n_input", "n_train", "n_val")
        }
        for split in ("train", "val"):
            a = sorted(glob.glob(f"{out}/{split}/shard-*.parquet"))
            b = sorted(glob.glob(f"{out2}/{split}/shard-*.parquet"))
            assert [Path(p).name for p in a] == [Path(p).name for p in b]
            for pa_, pb in zip(a, b):
                ta = pq.read_table(pa_).to_pandas()
                tb = pq.read_table(pb).to_pandas()
                pd.testing.assert_frame_equal(ta, tb)

    def test_manifest_written(self, run):
        out, m = run
        j = json.load(open(f"{out}/curation_manifest.json"))
        assert j["n_train"] == m["n_train"]
        for split in ("train", "val"):
            sj = json.load(open(f"{out}/{split}/manifest.json"))
            assert sum(s["n_rows"] for s in sj["shards"]) == m[f"n_{split}"]


@pytest.fixture(scope="module")
def run_neardup(ray_session, tmp_path_factory):
    from ethiomart_amharic_ner_ray.pipelines.curate import run_curation_pipeline

    out = str(tmp_path_factory.mktemp("curation_nd"))
    m = run_curation_pipeline(SF, out, near_dup_jaccard=0.5)
    return out, m


def _split_of(out: str) -> dict:
    split_of = {}
    for split in ("train", "val"):
        for f in glob.glob(f"{out}/{split}/shard-*.parquet"):
            for d in pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist():
                split_of[int(d)] = split
    return split_of


class TestNearDupSplit:
    def test_no_cluster_straddles_splits(self, run_neardup):
        out, m = run_neardup
        from ethiomart_amharic_ner_ray.pipelines.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(SF, jaccard_threshold=0.5)
        if pairs.empty:
            pytest.skip("fixture has no near-dup pairs at 0.5")
        split_of = _split_of(out)
        checked = 0
        for a, b in zip(pairs["a"], pairs["b"]):
            sa, sb = split_of.get(int(a)), split_of.get(int(b))
            if sa is not None and sb is not None:  # both survived the gate
                assert sa == sb, (a, b, sa, sb)
                checked += 1
        assert m["n_near_dup_clustered"] >= 2
        assert m["near_dup_jaccard"] == 0.5

    def test_non_clustered_docs_keep_md5_rule(self, run_neardup):
        # docs outside any near-dup cluster still hash their OWN id —
        # the near-dup option must not perturb the base split
        out, m = run_neardup
        from ethiomart_amharic_ner_ray.pipelines.dedup import minhash_lsh_pairs

        clustered = set()
        pairs = minhash_lsh_pairs(SF, jaccard_threshold=0.5)
        clustered.update(int(x) for x in pairs["a"])
        clustered.update(int(x) for x in pairs["b"])
        split_of = _split_of(out)
        for d, s in split_of.items():
            if d in clustered:
                continue
            want = "train" if hashlib.md5(str(d).encode()).hexdigest() < TRAIN_HEX else "val"
            assert s == want, (d, s, want)


@pytest.fixture(scope="module")
def run_span(ray_session, tmp_path_factory):
    from ethiomart_amharic_ner_ray.pipelines.curate import run_curation_pipeline

    out = str(tmp_path_factory.mktemp("curation_span"))
    m = run_curation_pipeline(SF, out, span_k=5)
    return out, m


class TestSpanRewriteStage:
    def test_rewrite_matches_q133(self, run_span):
        # the checkpointed rewrite must agree doc-for-doc with the
        # SQL-checked q133 stats query (same k, same owner rule) — at
        # sf0.001 survivors == input, so the two corpora coincide
        out, m = run_span
        if m["n_input"] != m["n_after_dedup"]:
            pytest.skip("fixture has exact dups; corpora differ by design")
        from ethiomart_amharic_ner_ray.pipelines.textstats import q133_span_removal

        want = q133_span_removal(SF, k=5).set_index("doc_id")
        got = pq.read_table(f"{out}/span_rewritten").to_pandas()
        affected = got.loc[got["n_removed"] > 0].set_index("doc_id")
        assert len(affected) == len(want) == m["n_docs_span_rewritten"]
        assert int(got["n_removed"].sum()) == m["n_span_tokens_removed"]
        for did, row in affected.iterrows():
            assert hashlib.md5(row["text"].encode("utf-8")).hexdigest() == want.loc[
                did, "clean_md5"
            ], did
            assert int(row["n_removed"]) == int(want.loc[did, "n_removed"])

    def test_untouched_docs_pass_through(self, run_span):
        out, m = run_span
        got = pq.read_table(f"{out}/span_rewritten").to_pandas().set_index("doc_id")
        src = pq.read_table(f"{out}/dedup_survivors").to_pandas().set_index("doc_id")
        clean = got.loc[got["n_removed"] == 0]
        assert len(clean) > 0
        for did, row in clean.iterrows():
            assert row["text"] == src.loc[did, "text"], did

    def test_resume_reuses_checkpoint(self, run_span):
        import os
        import time

        from ethiomart_amharic_ner_ray.pipelines.curate import _span_rewrite

        out, m = run_span
        files = sorted(glob.glob(f"{out}/span_rewritten/*.parquet"))
        mtimes = [os.path.getmtime(f) for f in files]
        time.sleep(0.05)
        ckpt, nd, nt = _span_rewrite(f"{out}/dedup_survivors", out, 5)
        assert (nd, nt) == (m["n_docs_span_rewritten"], m["n_span_tokens_removed"])
        assert [os.path.getmtime(f) for f in sorted(glob.glob(f"{ckpt}/*.parquet"))] == mtimes

    def test_stale_or_missing_stamp_recomputes(self, run_span):
        import os

        from ethiomart_amharic_ner_ray.pipelines.curate import _span_rewrite

        out, m = run_span
        os.remove(f"{out}/span_rewritten/_SPAN_DONE.json")
        ckpt, nd, nt = _span_rewrite(f"{out}/dedup_survivors", out, 5)
        assert (nd, nt) == (m["n_docs_span_rewritten"], m["n_span_tokens_removed"])
        assert os.path.exists(f"{out}/span_rewritten/_SPAN_DONE.json")
        # a different k must never reuse the k=5 checkpoint
        ckpt6, nd6, nt6 = _span_rewrite(f"{out}/dedup_survivors", out, 6)
        meta = json.load(open(f"{out}/span_rewritten/_SPAN_DONE.json"))
        assert meta["fingerprint"].startswith("span-v2|k=6|in=")

    def test_changed_input_recomputes(self, run_span, tmp_path):
        """r5 (ADVICE): the fingerprint folds a content signature of the
        survivor checkpoint — rerunning into the same out_dir with a
        DIFFERENT survivor corpus must recompute, never serve the stale
        span-rewritten text."""
        import os

        import pyarrow.parquet as _pq

        from ethiomart_amharic_ner_ray.pipelines.curate import _span_rewrite

        out, m = run_span
        # restore the k=5 stamp state (prior test may have left k=6)
        _span_rewrite(f"{out}/dedup_survivors", out, 5)
        stamp0 = json.load(open(f"{out}/span_rewritten/_SPAN_DONE.json"))

        # build an ALTERED survivor checkpoint: drop one doc
        alt = str(tmp_path / "surv_alt")
        os.makedirs(alt, exist_ok=True)
        src_files = sorted(glob.glob(f"{out}/dedup_survivors/*.parquet"))
        t = _pq.read_table(src_files[0])
        _pq.write_table(t.slice(1), os.path.join(alt, "part-0.parquet"))
        for i, f in enumerate(src_files[1:], 1):
            _pq.write_table(_pq.read_table(f), os.path.join(alt, f"part-{i}.parquet"))

        ckpt, nd, nt = _span_rewrite(alt, out, 5)
        stamp1 = json.load(open(f"{out}/span_rewritten/_SPAN_DONE.json"))
        assert stamp1["fingerprint"] != stamp0["fingerprint"]
        n_rows = sum(_pq.read_table(f).num_rows for f in glob.glob(f"{ckpt}/*.parquet"))
        n_alt = sum(
            _pq.read_table(f).num_rows for f in glob.glob(f"{alt}/*.parquet")
        )
        assert n_rows == n_alt  # rewritten corpus tracks the NEW input

    def test_byte_stable_rerun_with_span(self, run_span, tmp_path):
        from ethiomart_amharic_ner_ray.pipelines.curate import run_curation_pipeline

        out, m = run_span
        out2 = str(tmp_path / "rerun_span")
        m2 = run_curation_pipeline(SF, out2, span_k=5)
        for key in ("n_train", "n_val", "n_docs_span_rewritten", "n_span_tokens_removed"):
            assert m[key] == m2[key], key
        for split in ("train", "val"):
            a = sorted(glob.glob(f"{out}/{split}/shard-*.parquet"))
            b = sorted(glob.glob(f"{out2}/{split}/shard-*.parquet"))
            assert [Path(p).name for p in a] == [Path(p).name for p in b]
            for pa_, pb in zip(a, b):
                pd.testing.assert_frame_equal(
                    pq.read_table(pa_).to_pandas(), pq.read_table(pb).to_pandas()
                )
