"""Incremental KG update (pipelines/kg_update.py): update-equals-rebuild,
late-arrival subject rewrite, carried buckets untouched on disk, chained
deltas, mention-free deltas, idempotent re-apply (SURVEY.md §2.10)."""

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ethiomart_amharic_ner_ray.pipelines.kg import run_kg_pipeline
from ethiomart_amharic_ner_ray.pipelines.kg_update import run_kg_update
from ethiomart_amharic_ner_ray.schemas import TRANSCRIPT_SCHEMA
from ethiomart_amharic_ner_ray.sources.transcripts import generate_transcripts

CRAFTED_CONV = "c0042-900001"


def _tx_table(rows) -> pa.Table:
    """rows: [(conv_id, turn_idx, text)] → schema-conformant transcript table."""
    n = len(rows)
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["seller"] * n, pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) * 1_000_000 + 1_700_000_000_000_000,
                pa.timestamp("us"),
            ),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def _read_triples(out_dir: str):
    import pandas as pd

    files = sorted(glob.glob(f"{out_dir}/triples/bucket=*/*.parquet"))
    return pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)


def _tset(df):
    return set(zip(df["subj"], df["pred"], df["obj"], df["conv_id"], df["turn_idx"]))


def _file_states(out_dir: str) -> dict[str, tuple]:
    states = {}
    for f in glob.glob(f"{out_dir}/triples/bucket=*/*.parquet"):
        st = os.stat(f)
        states[f] = (st.st_mtime_ns, st.st_size)
    return states


@pytest.fixture(scope="module")
def incr_case(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("incr")
    base_dir = root / "base"
    base_dir.mkdir()
    pq.write_table(generate_transcripts(800, seed=42), base_dir / "gen.parquet")
    # a price turn with NO preceding product: subject falls back to the seller
    # (turn_idx gap 0→10 leaves room for a late-arriving turn in between)
    pq.write_table(
        _tx_table([(CRAFTED_CONV, 0, "selam selam"), (CRAFTED_CONV, 10, "ዋጋ፦ 54321 ብር")]),
        base_dir / "crafted.parquet",
    )

    # deltas, applied in order
    d_noop = root / "delta_noop"
    d_noop.mkdir()
    pq.write_table(
        _tx_table([("c0077-910000", 0, "selam endet nesh"), ("c0077-910000", 1, "dehna")]),
        d_noop / "turns.parquet",
    )
    d_late = root / "delta_late"
    d_late.mkdir()
    # late-arriving turn INSIDE the crafted conversation: a product mention at
    # turn 5 must re-subject the already-materialized turn-10 price triple
    pq.write_table(
        _tx_table([(CRAFTED_CONV, 5, "ሽያጭ ጫማ")]),
        d_late / "turns.parquet",
    )
    d_bulk = root / "delta_bulk"
    d_bulk.mkdir()
    pq.write_table(
        generate_transcripts(200, seed=7, conv_base=900100), d_bulk / "gen7.parquet"
    )

    out = str(root / "out")
    base_stats = run_kg_pipeline(str(base_dir), out, n_buckets=8, concurrency=2)
    base_triples = _read_triples(out)

    stats_noop = run_kg_update(str(base_dir), str(d_noop), out, concurrency=2)
    files_before_late = _file_states(out)
    stats_late = run_kg_update(str(base_dir), str(d_late), out, concurrency=2)
    files_after_late = _file_states(out)
    triples_after_late = _read_triples(out)
    stats_bulk = run_kg_update(str(base_dir), str(d_bulk), out, concurrency=2)
    final_triples = _read_triples(out)

    # from-scratch rebuild over base + all three deltas
    combined = root / "combined"
    combined.mkdir()
    for src in (base_dir, d_noop, d_late, d_bulk):
        for f in glob.glob(str(src / "*.parquet")):
            shutil.copy(f, combined / f"{src.name}-{os.path.basename(f)}")
    out_full = str(root / "out_full")
    run_kg_pipeline(str(combined), out_full, n_buckets=8, concurrency=2)
    full_triples = _read_triples(out_full)

    return dict(
        out=out,
        base_triples=base_triples,
        base_stats=base_stats,
        stats_noop=stats_noop,
        stats_late=stats_late,
        stats_bulk=stats_bulk,
        files_before_late=files_before_late,
        files_after_late=files_after_late,
        triples_after_late=triples_after_late,
        final_triples=final_triples,
        full_triples=full_triples,
        d_late=str(d_late),
        base_dir=str(base_dir),
    )


class TestIncrementalUpdate:
    def test_update_equals_rebuild(self, incr_case):
        """Chained updates == from-scratch rebuild over base+deltas, exactly."""
        assert _tset(incr_case["final_triples"]) == _tset(incr_case["full_triples"])
        assert len(incr_case["final_triples"]) == len(incr_case["full_triples"])

    def test_late_arrival_rewrites_existing_triples(self, incr_case):
        """The delta turn (turn_idx 5, PRODUCT) re-subjects the base run's
        turn-10 price triple — old triples are retracted, not just appended."""
        base = incr_case["base_triples"]
        after = incr_case["triples_after_late"]
        b = base[(base["conv_id"] == CRAFTED_CONV) & (base["pred"] == "priced_at")]
        a = after[(after["conv_id"] == CRAFTED_CONV) & (after["pred"] == "priced_at")]
        assert set(b["subj"]) == {"c0042"}  # no product yet → seller subject
        assert set(a["subj"]) == {"ጫማ"}  # carried from the late turn
        # the retracted triple is gone from the store entirely
        assert (
            "c0042",
            "priced_at",
            b["obj"].iloc[0],
            CRAFTED_CONV,
        ) not in set(zip(after["subj"], after["pred"], after["obj"], after["conv_id"]))

    def test_untouched_spo_buckets_not_rewritten(self, incr_case):
        """Buckets outside spo_buckets_touched keep their exact files (no
        rewrite, no mtime churn) — the O(delta) cost claim, verified on disk."""
        stats = incr_case["stats_late"]
        assert stats["spo_buckets_carried"] >= 1
        touched = set(stats["spo_buckets_touched"])
        before = incr_case["files_before_late"]
        after = incr_case["files_after_late"]
        for f, st in before.items():
            b = int(f.split("bucket=")[1].split("/")[0])
            if b not in touched:
                assert after.get(f) == st, f"untouched bucket {b} file changed: {f}"

    def test_mention_free_delta_carries_everything(self, incr_case):
        stats = incr_case["stats_noop"]
        assert stats["spo_buckets_touched"] == []
        assert stats["mentions_delta_rows"] == 0
        assert stats["triples_rows"] == len(incr_case["base_triples"])

    def test_candidates_backfill_is_one_time(self, incr_case):
        """The candidates store is built once (first update backfills a
        pre-update checkpoint) and then maintained incrementally — a repeat
        O(corpus) rebuild per update would break the O(delta) cost claim."""
        assert incr_case["stats_noop"]["candidates_rebuilt"] is True
        assert incr_case["stats_late"]["candidates_rebuilt"] is False
        assert incr_case["stats_bulk"]["candidates_rebuilt"] is False

    def test_lineage_stats(self, incr_case):
        stats = incr_case["stats_late"]
        # exactly one conversation touched → exactly one conv bucket
        assert len(stats["conv_buckets_touched"]) == 1
        assert stats["conv_buckets_carried"] == 8 - 1
        # concentrated delta → no broad-delta hint; the bulk delta (200 new
        # convs over 8 buckets) crosses the measured breakeven and gets one
        assert "rebuild_recommended" not in stats
        assert incr_case["stats_bulk"].get("rebuild_recommended") is True
        assert stats["mentions_delta_rows"] >= 1
        # sidecar pred counts stay consistent with the final store
        final = incr_case["final_triples"]
        assert incr_case["stats_bulk"]["pred_counts"] == dict(
            final["pred"].value_counts().sort_index()
        )

    def test_idempotent_reapply(self, incr_case):
        """Re-applying an already-folded delta is a no-op (would otherwise
        duplicate its mention rows in the checkpoint)."""
        stats = run_kg_update(
            incr_case["base_dir"], incr_case["d_late"], incr_case["out"], concurrency=2
        )
        assert stats.get("update_skipped_already_applied") is True
        assert _tset(_read_triples(incr_case["out"])) == _tset(incr_case["full_triples"])

    def test_update_requires_completed_base(self, ray_session, tmp_path):
        with pytest.raises(ValueError, match="no completed base run"):
            run_kg_update(str(tmp_path), str(tmp_path), str(tmp_path / "nope"))


class TestFingerprintParams:
    def test_parse_roundtrip(self):
        from ethiomart_amharic_ner_ray.pipelines.kg_update import _parse_fp_params

        fp = "v0.3.0|/data/tx|iabc123|b4096|n2|xner_subword|lFalse"
        assert _parse_fp_params(fp) == {
            "n_buckets": 4096,
            "normalizer": 2,
            "extractor": "ner_subword",
            "link": False,
        }

    def test_parse_update_chain(self):
        from ethiomart_amharic_ner_ray.pipelines.kg_update import _parse_fp_params

        fp = "v0.3.0|upd:deadbeef01+cafe02|b64|n1|xregex|lTrue"
        p = _parse_fp_params(fp)
        assert p["n_buckets"] == 64 and p["extractor"] == "regex" and p["link"] is True

    def test_remote_sig_refuses_unsignable(self):
        from ethiomart_amharic_ner_ray.pipelines.kg_update import _sig

        with pytest.raises(ValueError, match="content-sign"):
            _sig("notascheme://bucket/delta")


class TestUpdateNerExtractor:
    def test_ner_subword_update_equals_rebuild(self, ray_session, tmp_path):
        """The update's stage-1 dispatch honours the base run's extractor
        (read from the fingerprint): a ner_subword base folds a delta through
        the tiny-transformer scorer, and still equals the rebuild."""
        base = tmp_path / "base"
        base.mkdir()
        pq.write_table(generate_transcripts(300, seed=42), base / "gen.parquet")
        delta = tmp_path / "delta"
        delta.mkdir()
        pq.write_table(generate_transcripts(120, seed=7, conv_base=900100), delta / "d.parquet")
        out = str(tmp_path / "out")
        run_kg_pipeline(str(base), out, n_buckets=4, extractor="ner_subword", concurrency=2)
        stats = run_kg_update(str(base), str(delta), out, concurrency=2)
        assert stats["mentions_delta_rows"] >= 1

        combined = tmp_path / "combined"
        combined.mkdir()
        for src in (base, delta):
            for f in glob.glob(str(src / "*.parquet")):
                shutil.copy(f, combined / f"{src.name}-{os.path.basename(f)}")
        out_full = str(tmp_path / "out_full")
        run_kg_pipeline(str(combined), out_full, n_buckets=4, extractor="ner_subword", concurrency=2)
        assert _tset(_read_triples(out)) == _tset(_read_triples(out_full))
        # provenance extractor name flows through the update path too
        upd = _read_triples(out)
        assert set(p["extractor"] for p in upd["provenance"]) == {"ner_subword"}


class TestCompactionComposesWithUpdates:
    def test_compact_between_updates_preserves_equality_and_resume(self, ray_session, tmp_path):
        """compact_hive_dir over the update checkpoints (candidates with
        their sbucket sort, triples, mentions) must leave manifests valid:
        a further update after compaction still matches a from-scratch
        rebuild of base+d1+d2, and a no-op rerun still skips everything."""
        import glob

        import pandas as pd
        import pyarrow.parquet as pq

        from ethiomart_amharic_ner_ray.pipelines.export import compact_hive_dir
        from ethiomart_amharic_ner_ray.pipelines.kg import run_kg_pipeline
        from ethiomart_amharic_ner_ray.pipelines.kg_update import run_kg_update
        from ethiomart_amharic_ner_ray.sources.transcripts import (
            ensure_transcripts,
            generate_transcripts,
        )

        base = ensure_transcripts(str(tmp_path / "base"), 1200, seed=21)
        for i, seed in enumerate((22, 23)):
            d = tmp_path / f"delta{i}"
            d.mkdir()
            pq.write_table(
                generate_transcripts(300, seed=seed, conv_base=800000 + i * 10000),
                str(d / "d.parquet"),
            )

        out = str(tmp_path / "out")
        run_kg_pipeline(base, out, n_buckets=8)
        run_kg_update(base, str(tmp_path / "delta0"), out)

        # compact every checkpoint tree between updates
        rep_c = compact_hive_dir(out + "/candidates", target_rows=10_000, sort_by=["sbucket"])
        compact_hive_dir(out + "/triples", target_rows=10_000)
        compact_hive_dir(out + "/mentions", target_rows=10_000)
        assert len(rep_c) > 0

        stats2 = run_kg_update(base, str(tmp_path / "delta1"), out)
        assert stats2["triples_rows"] > 0

        # rebuild base+d1+d2 from scratch and compare triple sets exactly
        allin = tmp_path / "allin"
        allin.mkdir()
        for f in glob.glob(base + "/*.parquet") + glob.glob(str(tmp_path / "delta0/*.parquet")) + glob.glob(
            str(tmp_path / "delta1/*.parquet")
        ):
            import shutil

            shutil.copy(f, str(allin / f"{abs(hash(f))}.parquet"))
        out2 = str(tmp_path / "out2")
        run_kg_pipeline(str(allin), out2, n_buckets=8)

        key = ["subj", "pred", "obj", "conv_id", "turn_idx"]

        def read(o):
            df = pd.concat(
                [pq.read_table(f).to_pandas() for f in glob.glob(o + "/triples/bucket=*/*.parquet")]
            )
            return df[key].sort_values(key).reset_index(drop=True)

        pd.testing.assert_frame_equal(read(out), read(out2))


class TestAutoCompaction:
    """run_kg_update's built-in maintenance: small files accumulated by an
    update chain are compacted automatically once a partition crosses the
    file-count threshold, and a compaction crashed mid-swap converges on
    the next update (recovery-first)."""

    KEY = ["subj", "pred", "obj", "conv_id", "turn_idx"]

    def _read_triples(self, out):
        import pandas as pd

        df = pd.concat(
            [pq.read_table(f).to_pandas() for f in glob.glob(out + "/triples/bucket=*/*.parquet")]
        )
        return df[self.KEY].sort_values(self.KEY).reset_index(drop=True)

    def _rebuild_all(self, tmp_path, srcs, n_buckets=8):
        allin = tmp_path / "allin"
        allin.mkdir()
        for s in srcs:
            for f in glob.glob(str(s) + "/*.parquet"):
                shutil.copy(f, str(allin / f"{abs(hash(f))}.parquet"))
        out2 = str(tmp_path / "out_rebuild")
        run_kg_pipeline(str(allin), out2, n_buckets=n_buckets)
        return out2

    def test_soak_ten_updates_files_bounded_and_equal(self, ray_session, tmp_path):
        import pandas as pd

        from ethiomart_amharic_ner_ray.sources.transcripts import (
            ensure_transcripts,
            generate_transcripts,
        )

        base = ensure_transcripts(str(tmp_path / "base"), 800, seed=31)
        out = str(tmp_path / "out")
        run_kg_pipeline(base, out, n_buckets=8)

        def maxfiles(sub, prefix):
            worst = 0
            for d in glob.glob(f"{out}/{sub}/{prefix}=*"):
                if d.endswith((".compact", ".trash")):
                    continue
                worst = max(worst, len(glob.glob(d + "/*.parquet")))
            return worst

        fired = False
        deltas = []
        for i in range(10):
            d = tmp_path / f"d{i}"
            d.mkdir()
            pq.write_table(
                generate_transcripts(120, seed=40 + i, conv_base=900000 + i * 5000),
                str(d / "dl.parquet"),
            )
            deltas.append(d)
            st = run_kg_update(base, str(d), out, compact_files_threshold=6)
            fired = fired or bool(st.get("compaction"))
            # post-update state is always at-or-below threshold+1 per store:
            # growth per update is ~1 file/bucket and compaction fires the
            # moment the threshold is crossed — stage-2 read volume (file
            # count per bucket) stays FLAT across the chain instead of
            # growing linearly with update count
            assert maxfiles("mentions", "bucket") <= 7, i
            assert maxfiles("candidates", "cbucket") <= 7, i
        assert fired, "10-update soak never triggered a compaction"

        out2 = self._rebuild_all(tmp_path, [base] + deltas)
        pd.testing.assert_frame_equal(self._read_triples(out), self._read_triples(out2))

    def test_update_after_crashed_compaction_converges(self, ray_session, tmp_path):
        import json

        import pandas as pd

        from ethiomart_amharic_ner_ray.sources.transcripts import (
            ensure_transcripts,
            generate_transcripts,
        )

        base = ensure_transcripts(str(tmp_path / "base"), 600, seed=51)
        out = str(tmp_path / "out")
        run_kg_pipeline(base, out, n_buckets=8)
        d0 = tmp_path / "d0"
        d0.mkdir()
        pq.write_table(
            generate_transcripts(150, seed=52, conv_base=910000), str(d0 / "dl.parquet")
        )
        run_kg_update(base, str(d0), out)

        # hand-craft the mid-swap crash state on one candidates partition:
        # COMPLETE .compact dir present, original renamed to .trash
        cdirs = sorted(glob.glob(out + "/candidates/cbucket=*"))
        victim = cdirs[0]
        shutil.copytree(victim, victim + ".compact")
        with open(victim + ".compact/_COMPLETE", "w") as f:
            json.dump({"replaces": [], "rows": 0}, f)
        os.rename(victim, victim + ".trash")

        d1 = tmp_path / "d1"
        d1.mkdir()
        pq.write_table(
            generate_transcripts(150, seed=53, conv_base=920000), str(d1 / "dl.parquet")
        )
        st = run_kg_update(base, str(d1), out)  # must not crash on .trash dirs
        assert st["triples_rows"] > 0
        assert not glob.glob(out + "/candidates/*.compact")
        assert not glob.glob(out + "/candidates/*.trash")

        out2 = self._rebuild_all(tmp_path, [base, d0, d1])
        pd.testing.assert_frame_equal(self._read_triples(out), self._read_triples(out2))
