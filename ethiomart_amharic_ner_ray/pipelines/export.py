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


def _compact_one_partition(
    part_dir: str, target_rows: int, sort_by: list[str] | None
) -> dict:
    """Compact one hive partition directory in place, crash-safely.

    Protocol (observable-state machine; every step is idempotent):
      1. write compacted files into ``<part_dir>.compact/`` + a _COMPLETE
         marker naming the exact source files it replaces;
      2. rename ``<part_dir>`` -> ``<part_dir>.trash`` then
         ``<part_dir>.compact`` -> ``<part_dir>`` (two renames — the only
         non-atomic window);
      3. delete the trash dir.
    ``_recover_compactions`` finishes step 2/3 for any partition caught
    mid-window, so a crash can never lose a partition or double it."""
    import glob as _glob
    import shutil

    files = sorted(_glob.glob(os.path.join(part_dir, "*.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")
    if sort_by:
        t = t.sort_by([(c, "ascending") for c in sort_by])
    n_out = max(1, -(-t.num_rows // target_rows))
    compact_dir = part_dir + ".compact"
    shutil.rmtree(compact_dir, ignore_errors=True)
    os.makedirs(compact_dir)
    step = -(-t.num_rows // n_out)
    for i in range(n_out):
        pq.write_table(
            strip_schema_meta(t.slice(i * step, step)),
            os.path.join(compact_dir, f"compact-{i:05d}.parquet"),
            row_group_size=8192,
        )
    with open(os.path.join(compact_dir, "_COMPLETE"), "w") as f:
        json.dump({"replaces": [os.path.basename(p) for p in files], "rows": t.num_rows}, f)
    trash = part_dir + ".trash"
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(part_dir, trash)
    os.rename(compact_dir, part_dir)
    shutil.rmtree(trash)
    return {
        "partition": os.path.basename(part_dir),
        "files_before": len(files),
        "files_after": n_out,
        "rows": t.num_rows,
    }


def _recover_compactions(root: str) -> list[str]:
    """Finish any compaction interrupted mid-swap: a COMPLETE ``.compact``
    dir wins over the original/trash; an incomplete one is discarded."""
    import glob as _glob
    import shutil

    recovered = []
    for cdir in _glob.glob(os.path.join(root, "*.compact")):
        part_dir = cdir[: -len(".compact")]
        trash = part_dir + ".trash"
        if os.path.exists(os.path.join(cdir, "_COMPLETE")):
            if os.path.exists(part_dir):
                os.rename(part_dir, trash) if not os.path.exists(trash) else shutil.rmtree(part_dir)
            os.rename(cdir, part_dir)
            recovered.append(os.path.basename(part_dir))
        else:
            shutil.rmtree(cdir)
        shutil.rmtree(trash, ignore_errors=True)
    for tdir in _glob.glob(os.path.join(root, "*.trash")):
        # trash with its partition present = step 3 interrupted: drop it;
        # trash alone = crash between the two renames with no complete
        # compact dir (impossible by protocol order) — restore it.
        part_dir = tdir[: -len(".trash")]
        if os.path.exists(part_dir):
            shutil.rmtree(tdir)
        else:
            os.rename(tdir, part_dir)
            recovered.append(os.path.basename(part_dir))
    return recovered


def compact_hive_dir(
    root: str,
    target_rows: int = 1_000_000,
    sort_by: list[str] | None = None,
) -> pd.DataFrame:
    """Small-file compaction over a hive-partitioned output tree
    (``bucket=N/`` / ``sbucket=N/`` / ``list_id=N/`` …) — the maintenance
    job a long-lived 100 TB table needs once incremental updates
    (kg_update's per-delta candidate files) or many-task writes accumulate
    files far below the Parquet sweet spot. Each partition is compacted by
    an independent Ray task (raw ``@ray.remote`` — filesystem surgery, not
    a Dataset transform; partitions are embarrassingly parallel), rewriting
    its files into ceil(rows/target_rows) files, optionally re-sorted.

    Crash-safe and idempotent: the tmp-dir + marker + double-rename
    protocol in _compact_one_partition; _recover_compactions runs first so
    a rerun after ANY crash point converges to the compacted state. Bucket
    manifests stay valid (row counts and partition dirs are preserved).
    Skips partitions already at or below the target file count."""
    import glob as _glob

    import ray

    _recover_compactions(root)
    report_rows: list[dict] = []
    todo = []
    for d in sorted(_glob.glob(os.path.join(root, "*=*"))):
        if not os.path.isdir(d) or d.endswith((".compact", ".trash")):
            continue
        files = _glob.glob(os.path.join(d, "*.parquet"))
        rows = sum(pq.read_metadata(f).num_rows for f in files)
        n_target = max(1, -(-rows // target_rows))
        if len(files) > n_target:
            todo.append(d)
        else:
            report_rows.append(
                {
                    "partition": os.path.basename(d),
                    "files_before": len(files),
                    "files_after": len(files),
                    "rows": rows,
                }
            )

    worker = ray.remote(num_cpus=1)(_compact_one_partition)
    done = ray.get([worker.remote(d, target_rows, sort_by) for d in todo])
    report = pd.DataFrame(report_rows + list(done))
    return report.sort_values("partition").reset_index(drop=True) if len(report) else report
