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
