"""Shared helpers for the query pipelines.

Conventions used across every query (driver correctness contract):
  * column names in Ray output == column names in the DuckDB oracle SQL;
  * float aggregates are rounded to 4 decimals ON BOTH SIDES, so the
    order-insensitive value-hash is stable against float summation order;
  * small dimension tables are broadcast (driver-side pyarrow read +
    ``ray.put`` once), never shuffle-joined.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

ROUND_DIGITS = 4


def round_away(values, digits: int = ROUND_DIGITS):
    """Round half away from zero (DuckDB's round semantics — NOT numpy's or
    Python's banker's rounding). Works on scalars and numpy arrays."""
    import numpy as np

    s = np.multiply(values, 10.0**digits)
    r = np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5))
    out = r / 10.0**digits
    if np.isscalar(values) or getattr(values, "ndim", 1) == 0:
        return float(out)
    return out


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def read_small(sf_dir: str, name: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side read of a small dimension table (for broadcast)."""
    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def round_columns(batch: pa.Table, cols: list[str], digits: int = ROUND_DIGITS) -> pa.Table:
    # round_mode matches DuckDB (half away from zero), so bit-identical
    # inputs round identically on both sides of the oracle comparison
    for c in cols:
        i = batch.schema.get_field_index(c)
        batch = batch.set_column(
            i, c, pc.round(batch.column(c), ndigits=digits, round_mode="half_towards_infinity")
        )
    return batch


def make_rounder(cols: list[str], digits: int = ROUND_DIGITS):
    def _round(batch: pa.Table) -> pa.Table:
        return round_columns(batch, cols, digits)

    return _round


def bucketed_group_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    final_fn,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Grouped aggregation over B hash buckets instead of raw keys.

    Ray's ``GroupedData.aggregate`` reduces per ROW in Python — measured
    ~40x slower than a vectorized pandas groupby even at 150 keys over 95k
    rows, and unusable at high cardinality. This helper is the engine's
    standard wide-aggregation shape: hash the group key to B buckets
    (map_batches), shuffle on the bucket id only, then run ``final_fn``
    (which does a vectorized ``df.groupby(keys)`` itself) once per bucket.
    B scales with the cluster, never with key cardinality; callers
    pre-aggregate per batch first so the shuffle moves partial rows.
    """
    import zlib

    def add_bucket(t: pa.Table) -> pa.Table:
        cols = [t.column(k) for k in keys]
        n = t.num_rows
        if len(cols) == 1:
            key_strs = (str(v) for v in cols[0].to_pylist())
        else:
            key_strs = (
                "\x00".join(str(v) for v in row)
                for row in zip(*(c.to_pylist() for c in cols))
            )
        b = [zlib.crc32(s.encode("utf-8")) % n_buckets for s in key_strs]
        assert len(b) == n
        return t.append_column("_bkt", pa.array(b, pa.int32()))

    def per_bucket(df):
        out = final_fn(df.drop(columns=["_bkt"]))
        return out

    # coalesce before the sort shuffle: Ray's sort builds an
    # N_in × N_out task/object matrix, so hundreds of tiny partial blocks
    # cost far more than the row volume warrants
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(min(n_buckets, 32))
        .groupby("_bkt")
        .map_groups(per_bucket, batch_format="pandas")
    )
