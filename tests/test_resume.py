"""Checkpoint/resume: per-bucket manifests, partial-output cleanup,
resume-equals-clean-run (SURVEY.md §5.3)."""

import glob
import json
import shutil
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ethiomart_amharic_ner_ray.pipelines.kg import run_kg_pipeline
from ethiomart_amharic_ner_ray.state.manifest import (
    clean_unfinished_buckets,
    done_buckets,
    write_bucket_manifests,
)


def _read_triples(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(f"{out_dir}/triples/bucket=*/*.parquet"))
    return pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)


def _tset(df):
    return set(zip(df["subj"], df["pred"], df["obj"]))


class TestManifestUnit:
    def test_roundtrip(self, tmp_path):
        write_bucket_manifests(tmp_path, {0: {"rows": 5}, 3: {"rows": 0}}, "fp1")
        assert done_buckets(tmp_path, "fp1") == {0, 3}
        # wrong fingerprint → not done
        assert done_buckets(tmp_path, "fp2") == set()

    def test_clean_unfinished(self, tmp_path):
        (tmp_path / "bucket=1").mkdir()
        (tmp_path / "bucket=2").mkdir()
        removed = clean_unfinished_buckets(tmp_path, {2})
        assert removed == [1]
        assert not (tmp_path / "bucket=1").exists()
        assert (tmp_path / "bucket=2").exists()

    def test_corrupt_manifest_ignored(self, tmp_path):
        mdir = tmp_path / "manifest"
        mdir.mkdir()
        (mdir / "bucket=0007.json").write_text("{not json")
        assert done_buckets(tmp_path, "fp") == set()

    def test_emptied_bucket_dir_not_done(self, tmp_path):
        """A bucket dir emptied of its parquet files (selective delete,
        partial restore) must NOT validate while its manifest claims
        rows > 0 — same failure mode as a deleted dir, one level down."""
        from ethiomart_amharic_ner_ray.state.manifest import validated_done_buckets

        write_bucket_manifests(tmp_path, {1: {"rows": 5}, 2: {"rows": 5}, 3: {"rows": 0}}, "fp")
        (tmp_path / "bucket=1").mkdir()  # exists but EMPTY
        (tmp_path / "bucket=2").mkdir()
        (tmp_path / "bucket=2" / "part-0.parquet").write_bytes(b"x")
        # bucket 3 has rows=0: no data dir required
        assert validated_done_buckets(tmp_path, "fp") == {2, 3}
        # the stale manifest was dropped so bucket 1 rebuilds
        assert done_buckets(tmp_path, "fp") == {2, 3}


@pytest.fixture(scope="module")
def kg_run(ray_session, tiny_transcripts_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg") / "out")
    stats = run_kg_pipeline(tiny_transcripts_dir, out, n_buckets=6, concurrency=2)
    return out, stats, _read_triples(out)


class TestResume:
    def test_full_resume_skips_everything(self, kg_run, tiny_transcripts_dir):
        out, stats, triples = kg_run
        stats2 = run_kg_pipeline(tiny_transcripts_dir, out, n_buckets=6, concurrency=2)
        assert stats2["mentions_buckets_skipped"] == 6
        assert stats2["triples_buckets_skipped"] == 6
        assert _tset(_read_triples(out)) == _tset(triples)

    def test_partial_resume_equals_clean_run(
        self, kg_run, tiny_transcripts_dir, tmp_path_factory
    ):
        """Simulate a crash: drop one bucket's manifest + data in each stage;
        resume must rebuild exactly those buckets and match the clean run."""
        out, _, clean = kg_run
        crashed = str(tmp_path_factory.mktemp("kg") / "crashed")
        shutil.copytree(out, crashed)
        # kill mentions bucket 2 (manifest + data) and triples bucket 4
        Path(crashed, "mentions/manifest/bucket=0002.json").unlink()
        shutil.rmtree(Path(crashed, "mentions/bucket=2"), ignore_errors=True)
        Path(crashed, "triples/manifest/bucket=0004.json").unlink()
        stats = run_kg_pipeline(tiny_transcripts_dir, crashed, n_buckets=6, concurrency=2)
        assert stats["mentions_buckets_skipped"] == 5
        assert stats["triples_buckets_skipped"] == 5
        # partial triples data without manifest was cleaned before rebuild
        assert stats["triples_buckets_cleaned"] == 1
        resumed = _read_triples(crashed)
        assert _tset(resumed) == _tset(clean)
        assert len(resumed) == len(clean)

    def test_crashed_reset_run_cannot_leave_stale_manifests(
        self, kg_run, tiny_transcripts_dir, tmp_path_factory, monkeypatch
    ):
        """A resume=False run that crashes before writing manifests must not
        leave the previous run's manifests behind — otherwise the next
        default resume=True run trusts them over the deleted data and
        silently reports 0 triples (round-1 advisor finding)."""
        import ray.data as rd

        out, _, clean = kg_run
        crashed = str(tmp_path_factory.mktemp("kg") / "reset_crash")
        shutil.copytree(out, crashed)

        def boom(*a, **k):
            raise RuntimeError("simulated crash at the read")

        monkeypatch.setattr(rd, "read_parquet", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            run_kg_pipeline(tiny_transcripts_dir, crashed, n_buckets=6, concurrency=2, resume=False)
        monkeypatch.undo()

        stats = run_kg_pipeline(tiny_transcripts_dir, crashed, n_buckets=6, concurrency=2)
        assert stats["mentions_buckets_skipped"] == 0
        assert stats["triples_buckets_skipped"] == 0
        assert _tset(_read_triples(crashed)) == _tset(clean)

    def test_fingerprint_mismatch_rebuilds(self, kg_run, tiny_transcripts_dir):
        """Different params → old manifests are invalid, nothing skipped."""
        out, _, _ = kg_run
        done = done_buckets(Path(out) / "mentions", "some|other|fingerprint")
        assert done == set()

    def test_bucket_layout(self, kg_run):
        out, _, _ = kg_run
        data = sorted(glob.glob(f"{out}/triples/bucket=*"))
        manifests = sorted(glob.glob(f"{out}/triples/manifest/bucket=*.json"))
        assert len(manifests) == 6
        meta = json.loads(Path(manifests[0]).read_text())
        assert {"rows", "fingerprint", "bucket"} <= set(meta)
        assert len(data) >= 1


class TestSidecarPredCounts:
    def test_distributed_pred_counts_match_files(self, kg_run):
        """run_metrics.json pred_counts (distributed partial counts) must
        equal a direct count over the written triples files."""
        from collections import Counter

        out, stats, triples = kg_run
        expect = Counter(triples["pred"])
        assert stats["pred_counts"] == dict(sorted(expect.items()))
        sidecar = json.loads(Path(out, "run_metrics.json").read_text())
        assert sidecar["pred_counts"] == stats["pred_counts"]


class TestChaosResume:
    def test_repeated_random_crash_resume_cycles(self, kg_run, tiny_transcripts_dir, tmp_path_factory):
        """Chaos loop: repeatedly destroy random per-bucket state (manifest
        only, data only, or both — across both stages), resume, and require
        the exact clean-run triple set every time."""
        import random

        out, _, clean = kg_run
        work = str(tmp_path_factory.mktemp("kg") / "chaos")
        shutil.copytree(out, work)
        rng = random.Random(1234)

        for cycle in range(3):
            for stage in ("mentions", "triples"):
                for b in rng.sample(range(6), rng.randint(1, 3)):
                    mode = rng.choice(("manifest", "data", "both"))
                    mpath = Path(work, stage, "manifest", f"bucket={b:04d}.json")
                    dpath = Path(work, stage, f"bucket={b}")
                    if mode in ("manifest", "both") and mpath.exists():
                        mpath.unlink()
                    if mode in ("data", "both"):
                        shutil.rmtree(dpath, ignore_errors=True)
            stats = run_kg_pipeline(tiny_transcripts_dir, work, n_buckets=6, concurrency=2)
            resumed = _read_triples(work)
            assert _tset(resumed) == _tset(clean), f"cycle {cycle}"
            assert len(resumed) == len(clean), f"cycle {cycle}"
            assert stats["triples_rows"] == len(clean)


class TestInputMutation:
    def test_changed_input_invalidates_checkpoints(self, ray_session, tiny_transcripts_dir, tmp_path_factory):
        """Appending data to the input dir must invalidate the old
        checkpoints (content-aware fingerprint): a path-only fingerprint
        would skip 'done' buckets and silently drop the new turns."""
        import pyarrow.parquet as pq

        from ethiomart_amharic_ner_ray.sources.transcripts import generate_transcripts

        src = tmp_path_factory.mktemp("kg") / "growing_input"
        shutil.copytree(tiny_transcripts_dir, src)
        out = str(tmp_path_factory.mktemp("kg") / "out")
        stats1 = run_kg_pipeline(str(src), out, n_buckets=6, concurrency=2)
        n1 = stats1["triples_rows"]

        # input grows: a new shard with fresh conversations
        extra = generate_transcripts(500, seed=777, conv_base=10_000_000)
        pq.write_table(extra, src / "extra.parquet")

        stats2 = run_kg_pipeline(str(src), out, n_buckets=6, concurrency=2)
        assert stats2["mentions_buckets_skipped"] == 0  # fingerprint changed
        assert stats2["triples_rows"] > n1  # new conversations included

    def test_same_size_inplace_edit_invalidates(
        self, ray_session, tiny_transcripts_dir, tmp_path_factory
    ):
        """An in-place edit that keeps file size (mtime changes) must
        invalidate checkpoints — name+size alone would miss it."""
        import os

        src = tmp_path_factory.mktemp("kg") / "edited_input"
        shutil.copytree(tiny_transcripts_dir, src)
        out = str(tmp_path_factory.mktemp("kg") / "out")
        run_kg_pipeline(str(src), out, n_buckets=6, concurrency=2)
        f = sorted(src.glob("*.parquet"))[0]
        st = f.stat()
        os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
        stats2 = run_kg_pipeline(str(src), out, n_buckets=6, concurrency=2)
        assert stats2["mentions_buckets_skipped"] == 0

    def test_unsignable_uri_refuses(self, ray_session, tmp_path_factory):
        """A remote scheme pyarrow.fs can't stat must REFUSE resumable
        runs instead of silently degrading the fingerprint to path-only
        (which would drop appended turns on resume)."""
        out = str(tmp_path_factory.mktemp("kg") / "out")
        with pytest.raises(ValueError, match="content-sign"):
            run_kg_pipeline("fake-scheme://bucket/prefix", out, n_buckets=4, concurrency=2)
