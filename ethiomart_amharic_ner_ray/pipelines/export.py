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


def shuffled_export(
    ds: "ray.data.Dataset",
    key: str,
    out_dir: str,
    n_shards: int = 8,
    seed: int = 17,
) -> pd.DataFrame:
    """Deterministic GLOBAL shuffle into training shards — the last step
    before a corpus feeds a trainer: every row is stamped with a seeded
    split-invariant hash of its ``key``, hash-partitioned into ``n_shards``
    shard files, and ordered by the hash inside each shard. Reading
    shard-00000, shard-00001, … yields a pseudo-random permutation of the
    corpus that is REPRODUCIBLE (same key + seed → same permutation,
    regardless of input block layout, resharding, or rerun — no
    ``random_shuffle`` nondeterminism) and re-seedable (a new ``seed`` is a
    fresh independent permutation for the next epoch). ONE shuffle, same
    atomic tmp+rename file discipline as sorted_export; shard sizes are
    hash-uniform in the number of DISTINCT keys."""
    from .common import _mix64, stable_hash64, strip_schema_meta

    os.makedirs(out_dir, exist_ok=True)
    seed_mixed = _mix64(np.array([seed & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64))[0]

    def stamp(t: pa.Table) -> pa.Table:
        h = _mix64(stable_hash64(t.select([key])) ^ seed_mixed)
        t = strip_schema_meta(t)
        t = t.append_column("_h", pa.array(h.astype(np.uint64), pa.uint64()))
        return t.append_column(
            "_shard", pa.array((h % np.uint64(n_shards)).astype(np.int32), pa.int32())
        )

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        shard = int(df["_shard"].iloc[0])
        df = df.sort_values(["_h", key], kind="mergesort").drop(columns=["_shard", "_h"])
        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None), tmp
        )
        os.replace(tmp, path)
        return pd.DataFrame({"shard": [shard], "n_rows": [len(df)]})

    stats = (
        ds.map_batches(stamp, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    stats["shard"] = stats["shard"].astype("int64")
    stats["n_rows"] = stats["n_rows"].astype("int64")
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(
            {
                "key": key,
                "seed": int(seed),
                "n_shards": int(n_shards),
                "shards": [
                    {"shard": int(r.shard), "n_rows": int(r.n_rows)} for r in stats.itertuples()
                ],
            },
            f,
        )
    return stats


def export_shuffled_shards(sf_dir: str, n_shards: int = 8, seed: int = 17) -> pd.DataFrame:
    """Driver-surface wrapper: deterministic shuffle of documents into
    training shards; returns the per-shard manifest (rows-only check — the
    permutation invariants live in tests/test_sorted_export.py)."""
    import shutil

    from .common import read_table

    out = "/tmp/graft_shuffled_export"
    shutil.rmtree(out, ignore_errors=True)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return shuffled_export(ds, "doc_id", out, n_shards=n_shards, seed=seed)


def _zvalue(xbin: np.ndarray, ybin: np.ndarray, bits: int = 16) -> np.ndarray:
    """Interleave the low ``bits`` bits of two bin ids into a Morton
    (Z-order) value — vectorized bit spread, no per-row Python."""
    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64) & np.uint64((1 << bits) - 1)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    return spread(xbin) | (spread(ybin) << np.uint64(1))


def zorder_export(
    ds: "ray.data.Dataset",
    xcol: str,
    ycol: str,
    out_dir: str,
    n_parts: int = 16,
    n_bins: int = 1024,
    samples_per_block: int = 256,
) -> pd.DataFrame:
    """Z-ORDER (Morton-curve) clustered export — the 2-D locality layout
    that makes BOTH columns prunable from one file order, where a 1-D sort
    (sorted_export) can prune only its sort column: each row's (x, y) is
    quantile-binned (boundaries from one bounded sampling pass, so skew
    can't collapse bins), the bin ids bit-interleave into a Morton value,
    and the rows range-partition + sort by that value. Each part file's
    manifest records min/max of BOTH columns; a 2-D box probe
    (``zorder_prune``) selects files by manifest overlap — at production
    scale the same min/max live in the parquet footers, so pruning works
    row-group-level too. ONE shuffle, atomic writes, same discipline as
    sorted_export."""
    from .common import strip_schema_meta

    os.makedirs(out_dir, exist_ok=True)

    def sample(t: pa.Table) -> pa.Table:
        out = {}
        for c in (xcol, ycol):
            v = np.sort(t.column(c).to_numpy(zero_copy_only=False))
            idx = np.linspace(0, max(len(v) - 1, 0), min(samples_per_block, len(v))).astype(
                np.int64
            )
            out[c] = v[idx] if len(v) else np.array([], dtype=np.float64)
        n = min(len(out[xcol]), len(out[ycol]))
        return pa.table({c: pa.array(out[c][:n]) for c in (xcol, ycol)})

    smp = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    qs = np.linspace(0, 1, n_bins + 1)[1:-1]
    xb = np.unique(np.quantile(smp[xcol].to_numpy(), qs))
    yb = np.unique(np.quantile(smp[ycol].to_numpy(), qs))

    # z-value part boundaries from the sampled rows themselves
    zs = np.sort(
        _zvalue(
            np.searchsorted(xb, smp[xcol].to_numpy(), side="right"),
            np.searchsorted(yb, smp[ycol].to_numpy(), side="right"),
        )
    )
    cut = np.linspace(0, len(zs) - 1, n_parts + 1).astype(np.int64)[1:-1]
    zbounds = zs[cut]

    def stamp(t: pa.Table) -> pa.Table:
        z = _zvalue(
            np.searchsorted(xb, t.column(xcol).to_numpy(zero_copy_only=False), side="right"),
            np.searchsorted(yb, t.column(ycol).to_numpy(zero_copy_only=False), side="right"),
        )
        t = strip_schema_meta(t)
        t = t.append_column("_z", pa.array(z, pa.uint64()))
        part = np.searchsorted(zbounds, z, side="right").astype(np.int32)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def write_part(df: pd.DataFrame) -> pd.DataFrame:
        part = int(df["_part"].iloc[0])
        df = df.sort_values("_z", kind="mergesort").drop(columns=["_part", "_z"])
        path = os.path.join(out_dir, f"part-{part:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None), tmp
        )
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "part": [part],
                "n_rows": [len(df)],
                "x_lo": [float(df[xcol].min())],
                "x_hi": [float(df[xcol].max())],
                "y_lo": [float(df[ycol].min())],
                "y_hi": [float(df[ycol].max())],
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
                "xcol": xcol,
                "ycol": ycol,
                "parts": [
                    {
                        "part": int(r.part),
                        "n_rows": int(r.n_rows),
                        "x_lo": r.x_lo,
                        "x_hi": r.x_hi,
                        "y_lo": r.y_lo,
                        "y_hi": r.y_hi,
                    }
                    for r in stats.itertuples()
                ],
            },
            f,
        )
    return stats


def zorder_prune(out_dir: str, x_range=None, y_range=None) -> list[str]:
    """Manifest-driven file pruning for a 2-D box probe over a
    zorder_export directory: return only the part files whose recorded
    [x_lo, x_hi] × [y_lo, y_hi] envelope intersects the box. The reader
    then scans just those files (and parquet row-group stats prune further
    inside them)."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        man = json.load(f)
    keep = []
    for p in man["parts"]:
        if x_range and (p["x_hi"] < x_range[0] or p["x_lo"] > x_range[1]):
            continue
        if y_range and (p["y_hi"] < y_range[0] or p["y_lo"] > y_range[1]):
            continue
        keep.append(os.path.join(out_dir, f"part-{p['part']:05d}.parquet"))
    return keep


def export_zorder(sf_dir: str, n_parts: int = 16) -> pd.DataFrame:
    """Driver-surface wrapper: Z-order-clustered export of events by
    (user_id, value) into a scratch dir; returns the per-part manifest with
    both columns' envelopes (rows-only check — the pruning invariants live
    in tests/test_sorted_export.py)."""
    import shutil

    from .common import read_table

    out = "/tmp/graft_zorder_export"
    shutil.rmtree(out, ignore_errors=True)
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return zorder_export(ds, "user_id", "value", out, n_parts=n_parts)
