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
