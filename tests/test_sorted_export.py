"""Invariants for the range-partitioned sorted export: disjoint ordered
ranges, per-file sortedness, global sortedness of the concatenation in
part order, and exact multiset preservation."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ethiomart_amharic_ner_ray.pipelines.common import read_table
from ethiomart_amharic_ner_ray.pipelines.export import sorted_export

SF_DIR = "/root/testdata/sf0.001"


def test_sorted_export_invariants(ray_session, tmp_path):
    out = str(tmp_path / "sorted")
    ds = read_table(SF_DIR, "orders", columns=["o_orderkey", "o_totalprice"])
    stats = sorted_export(ds, "o_totalprice", out, n_parts=4)

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert files, "no part files written"
    assert not glob.glob(os.path.join(out, "*.tmp"))

    frames = [pq.read_table(f).to_pandas() for f in files]
    # each file is internally sorted
    for df in frames:
        v = df["o_totalprice"].to_numpy()
        assert (np.diff(v) >= 0).all()
    # concatenation in file order is GLOBALLY sorted
    cat = pd.concat(frames, ignore_index=True)
    assert (np.diff(cat["o_totalprice"].to_numpy()) >= 0).all()

    # exact multiset preservation vs the input
    src = pq.read_table(
        os.path.join(SF_DIR, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    a = cat.sort_values(["o_orderkey", "o_totalprice"]).reset_index(drop=True)
    b = src.sort_values(["o_orderkey", "o_totalprice"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["o_orderkey", "o_totalprice"]], b)

    # manifest matches the files and its ranges are disjoint + ordered
    man = json.load(open(os.path.join(out, "manifest.json")))
    parts = man["parts"]
    assert sum(p["n_rows"] for p in parts) == len(src)
    his = [float(p["hi"]) for p in parts]
    los = [float(p["lo"]) for p in parts]
    for i in range(1, len(parts)):
        assert his[i - 1] <= los[i]
    # stats frame mirrors the manifest
    assert stats["n_rows"].sum() == len(src)


class TestCompaction:
    def _make(self, root, n_parts=3, files_per=6, rows_per=40):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.RandomState(7)
        want = {}
        for b in range(n_parts):
            d = root / f"bucket={b}"
            d.mkdir(parents=True)
            rows = []
            for f in range(files_per):
                t = pa.table(
                    {
                        "k": rng.randint(0, 1000, rows_per).astype("int64"),
                        "v": rng.rand(rows_per),
                    }
                )
                pq.write_table(t, d / f"part-{f:03d}.parquet")
                rows.append(t)
            want[b] = pa.concat_tables(rows)
        return want

    def _read_all(self, root):
        import glob

        import pandas as pd
        import pyarrow.parquet as pq

        out = {}
        for d in sorted(glob.glob(str(root / "bucket=*"))):
            if d.endswith((".compact", ".trash")):
                continue
            b = int(d.rsplit("=", 1)[1])
            dfs = [pq.read_table(f).to_pandas() for f in sorted(glob.glob(d + "/*.parquet"))]
            out[b] = pd.concat(dfs, ignore_index=True)
        return out

    @staticmethod
    def _canon(df):
        return df.sort_values(["k", "v"], kind="mergesort").reset_index(drop=True)

    def test_compacts_preserving_rows_and_idempotent(self, ray_session, tmp_path):
        import glob

        import pandas as pd

        from ethiomart_amharic_ner_ray.pipelines.export import compact_hive_dir

        root = tmp_path / "out"
        want = self._make(root)
        rep = compact_hive_dir(str(root), target_rows=1000, sort_by=["k"])
        assert (rep["files_after"] == 1).all() and (rep["files_before"] == 6).all()
        got = self._read_all(root)
        for b, w in want.items():
            pd.testing.assert_frame_equal(self._canon(got[b]), self._canon(w.to_pandas()))
            # sort_by honored inside the compacted file
            assert got[b]["k"].is_monotonic_increasing
        # idempotent: second run touches nothing
        rep2 = compact_hive_dir(str(root), target_rows=1000)
        assert (rep2["files_before"] == rep2["files_after"]).all()
        assert not glob.glob(str(root / "*.compact")) and not glob.glob(str(root / "*.trash"))

    def test_target_rows_splits_files(self, ray_session, tmp_path):
        from ethiomart_amharic_ner_ray.pipelines.export import compact_hive_dir

        root = tmp_path / "out"
        self._make(root, n_parts=1, files_per=6, rows_per=40)  # 240 rows
        rep = compact_hive_dir(str(root), target_rows=100)
        assert rep.loc[0, "files_after"] == 3  # ceil(240/100)

    def test_crash_recovery_all_states(self, ray_session, tmp_path):
        """Reconstruct every crash point of the swap protocol by hand and
        check a rerun converges to the compacted data with no loss and no
        duplication."""
        import os
        import shutil

        import pandas as pd

        from ethiomart_amharic_ner_ray.pipelines.export import (
            _compact_one_partition,
            compact_hive_dir,
        )

        root = tmp_path / "out"
        want = self._make(root)
        state = tmp_path / "state"
        shutil.copytree(root, state)

        # state A: complete .compact written, original still in place
        d = str(root / "bucket=0")
        _compact_one_partition(d, 1000, None)  # full swap for reference data
        shutil.copytree(d, d + ".compact")  # a complete compact dir (has _COMPLETE? no)
        with open(d + ".compact/_COMPLETE", "w") as f:
            f.write("{}")
        # crash state: original present + complete compact
        rep = compact_hive_dir(str(root), target_rows=1000)
        got = self._read_all(root)
        pd.testing.assert_frame_equal(
            self._canon(got[0]), self._canon(want[0].to_pandas())
        )

        # state B: original renamed to .trash, compact complete, no partition
        d1 = str(root / "bucket=1")
        os.rename(d1, d1 + ".compact")
        with open(d1 + ".compact/_COMPLETE", "w") as f:
            f.write("{}")
        compact_hive_dir(str(root), target_rows=1000)
        got = self._read_all(root)
        pd.testing.assert_frame_equal(
            self._canon(got[1]), self._canon(want[1].to_pandas())
        )

        # state C: swap done, stale .trash left behind
        d2 = str(root / "bucket=2")
        shutil.copytree(d2, d2 + ".trash")
        compact_hive_dir(str(root), target_rows=1000)
        got = self._read_all(root)
        pd.testing.assert_frame_equal(
            self._canon(got[2]), self._canon(want[2].to_pandas())
        )

        # state D: incomplete .compact (no marker) is discarded, data intact
        shutil.copytree(str(state / "bucket=0"), str(root / "bucket=9"))
        os.makedirs(str(root / "bucket=9.compact"))
        compact_hive_dir(str(root), target_rows=1000)
        got = self._read_all(root)
        pd.testing.assert_frame_equal(
            self._canon(got[9]), self._canon(want[0].to_pandas())
        )


class TestShuffledExport:
    def _run(self, tmp_path, name, seed=17, repartition=None):
        from ethiomart_amharic_ner_ray.pipelines.export import shuffled_export

        out = str(tmp_path / name)
        ds = read_table(SF_DIR, "documents", columns=["doc_id", "text"])
        if repartition:
            ds = ds.repartition(repartition)
        stats = shuffled_export(ds, "doc_id", out, n_shards=4, seed=seed)
        files = sorted(glob.glob(os.path.join(out, "shard-*.parquet")))
        frames = [pq.read_table(f).to_pandas() for f in files]
        return stats, pd.concat(frames, ignore_index=True)

    def test_deterministic_and_reshard_invariant(self, ray_session, tmp_path):
        """Same key + seed must yield the SAME permutation regardless of
        input block layout; the multiset must be preserved exactly."""
        _, a = self._run(tmp_path, "a", seed=17)
        _, b = self._run(tmp_path, "b", seed=17, repartition=7)
        pd.testing.assert_frame_equal(a, b)

        src = pq.read_table(
            os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
        ).to_pandas()
        got = a.sort_values("doc_id").reset_index(drop=True)
        want = src.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_new_seed_is_new_permutation_and_shuffled(self, ray_session, tmp_path):
        _, a = self._run(tmp_path, "a", seed=17)
        _, c = self._run(tmp_path, "c", seed=18)
        assert not a["doc_id"].equals(c["doc_id"])
        # actually shuffled: the stream order is far from sorted id order
        ids = a["doc_id"].to_numpy()
        frac_asc = float((np.diff(ids) > 0).mean())
        assert 0.3 < frac_asc < 0.7, frac_asc

    def test_shard_sizes_hash_uniform(self, ray_session, tmp_path):
        stats, a = self._run(tmp_path, "a", seed=17)
        n = stats["n_rows"].to_numpy()
        assert n.sum() == len(a)
        # 500 docs over 4 shards: binomial spread, no shard pathological
        assert n.min() > 0.5 * n.mean()
        assert n.max() < 1.5 * n.mean()


class TestZorderExport:
    def test_multiset_and_2d_pruning(self, ray_session, tmp_path):
        """Z-order layout must preserve the multiset exactly, and a 2-D box
        probe must (a) be exact — pruned files contain every in-box row —
        and (b) actually prune: a quadrant box reads well under half the
        files, which a 1-D sort can only do for its own sort column."""
        from ethiomart_amharic_ner_ray.pipelines.export import zorder_export, zorder_prune

        out = str(tmp_path / "z")
        ds = read_table(SF_DIR, "events", columns=["event_id", "user_id", "value"])
        stats = zorder_export(ds, "user_id", "value", out, n_parts=16)
        files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
        assert len(files) == len(stats)

        src = pq.read_table(
            os.path.join(SF_DIR, "events.parquet"), columns=["event_id", "user_id", "value"]
        ).to_pandas()
        cat = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        pd.testing.assert_frame_equal(
            cat.sort_values("event_id").reset_index(drop=True),
            src.sort_values("event_id").reset_index(drop=True),
            check_dtype=False,
        )

        # quadrant probe: low quarter of users x low quarter of values
        xr = (float(src["user_id"].min()), float(src["user_id"].quantile(0.25)))
        yr = (float(src["value"].min()), float(src["value"].quantile(0.25)))
        keep = zorder_prune(out, x_range=xr, y_range=yr)
        got = pd.concat([pq.read_table(f).to_pandas() for f in keep], ignore_index=True)
        want = src[
            src["user_id"].between(*xr) & src["value"].between(*yr)
        ]
        # exactness: every in-box row is in a kept file
        assert set(want["event_id"]) <= set(got["event_id"])
        # selectivity: the 1/16-area box must not touch most files
        assert len(keep) < len(files) / 2, (len(keep), len(files))
