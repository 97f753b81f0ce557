"""Globally-sorted, range-partitioned Parquet export — the "write the
corpus ordered by X" sink (time-ordered event logs, score-ordered corpora
for curriculum sampling). Ray's ``Dataset.sort`` orders blocks but a sink
needs an ON-DISK contract: part files whose key ranges are disjoint and
ordered, so a reader streams part=0, part=1, … and sees a globally sorted
stream without ever re-sorting.

Shape (the classic sample-sort): ONE bounded sampling pass (a few hundred
values per block — driver sees samples, never rows) picks n_parts−1
boundary values; every row is stamped with its range id by one vectorized
searchsorted; ONE groupby shuffle co-locates each range; each range sorts
itself and writes its own file atomically (tmp + rename — the kg.py S5
discipline). Boundary choice only affects part SIZES, never correctness:
any boundary vector yields a globally sorted concatenation. Skewed keys
concentrate a part; the fix is more samples per block or recursive
splitting of oversized parts — both documented knobs, not new machinery.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from .common import strip_schema_meta


def sorted_export(
    ds: "ray.data.Dataset",
    col: str,
    out_dir: str,
    n_parts: int = 8,
    samples_per_block: int = 256,
) -> pd.DataFrame:
    """Write ``ds`` to ``out_dir`` as range-partitioned Parquet files sorted
    by ``col`` (part-00000.parquet … in key order; reading them in file
    order yields a globally sorted stream). Returns the per-part manifest
    (part, n_rows, lo, hi) and writes it as manifest.json alongside."""
    os.makedirs(out_dir, exist_ok=True)

    # ---- pass 1: bounded boundary sample (evenly spaced per block) -------
    def sample(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table({col: pa.array([], t.schema.field(col).type)})
        idx = np.linspace(0, len(v) - 1, min(samples_per_block, len(v))).astype(np.int64)
        return pa.table({col: pa.array(np.sort(v)[idx], t.schema.field(col).type)})

    samples = np.sort(
        ds.map_batches(sample, batch_format="pyarrow").to_pandas()[col].to_numpy()
    )
    if len(samples) == 0:
        pd.DataFrame(columns=["part", "n_rows", "lo", "hi"]).to_json(
            os.path.join(out_dir, "manifest.json")
        )
        return pd.DataFrame(columns=["part", "n_rows", "lo", "hi"])
    cut_idx = np.linspace(0, len(samples) - 1, n_parts + 1).astype(np.int64)[1:-1]
    boundaries = samples[cut_idx]

    # ---- pass 2: stamp range id, ONE shuffle, per-range sort + write -----
    def stamp(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        part = np.searchsorted(boundaries, v, side="right").astype(np.int32)
        return strip_schema_meta(t).append_column("_part", pa.array(part))

    def write_part(df: pd.DataFrame) -> pd.DataFrame:
        part = int(df["_part"].iloc[0])
        df = df.drop(columns=["_part"]).sort_values(col, kind="mergesort")
        path = os.path.join(out_dir, f"part-{part:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None), tmp
        )
        os.replace(tmp, path)  # atomic: readers never see a torn file
        return pd.DataFrame(
            {
                "part": [part],
                "n_rows": [len(df)],
                "lo": [df[col].iloc[0]],
                "hi": [df[col].iloc[-1]],
            }
        )

    stats = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(write_part, batch_format="pandas")
        .to_pandas()
        .sort_values("part")
        .reset_index(drop=True)
    )
    stats["part"] = stats["part"].astype("int64")
    stats["n_rows"] = stats["n_rows"].astype("int64")
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(
            {
                "col": col,
                "parts": [
                    {"part": int(r.part), "n_rows": int(r.n_rows), "lo": str(r.lo), "hi": str(r.hi)}
                    for r in stats.itertuples()
                ],
            },
            f,
        )
    return stats


def export_sorted_ranges(sf_dir: str, col: str = "o_totalprice", n_parts: int = 8) -> pd.DataFrame:
    """Driver-surface wrapper: range-sorted export of orders by total price
    into a scratch dir; returns the per-part manifest (rows-only check —
    the strong invariants live in tests/test_sorted_export.py)."""
    import shutil

    from .common import read_table

    out = "/tmp/graft_sorted_export"
    shutil.rmtree(out, ignore_errors=True)
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return sorted_export(ds, col, out, n_parts=n_parts)
