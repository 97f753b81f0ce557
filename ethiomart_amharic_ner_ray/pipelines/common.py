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


_H_P = 1099511628211  # FNV-64 prime — odd, so ×P is a bijection mod 2^64
_H_LEN_SALT = 0xA5A5A5A5A5A5A5A5
_H_NULL = 0x9E3779B97F4A7C15


def _mix64(x):
    """splitmix64 finalizer, vectorized — full-avalanche over uint64 so the
    low bits (used as ``h % n_buckets``) depend on every input bit."""
    import numpy as np

    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):  # wrap-around is the point
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _hash_string_chunk(arr: pa.Array):
    """uint64 hash per string/binary element, computed from the raw Arrow
    value buffer: polynomial hash over the utf-8 bytes (wrapping uint64,
    base _H_P) xor-folded with the length, then splitmix64-finalized.
    Fully vectorized — one cumsum over the concatenated byte buffer and two
    fancy-index probes per batch, no per-row Python."""
    import numpy as np

    n = len(arr)
    if pa.types.is_dictionary(arr.type):
        arr = arr.dictionary_decode()
    arr = pc.cast(arr, pa.large_binary())
    null_mask = np.asarray(pc.is_null(arr))
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    base = offsets[0]
    starts = offsets[:-1] - base
    ends = offsets[1:] - base
    lens = ends - starts
    total = int(offsets[-1] - base)
    if total:
        data = np.frombuffer(bufs[2], dtype=np.uint8)[base : offsets[-1]]
        maxlen = int(lens.max())
        powers = np.empty(maxlen, dtype=np.uint64)
        powers[0] = 1
        if maxlen > 1:
            np.multiply.accumulate(np.full(maxlen - 1, _H_P, dtype=np.uint64), out=powers[1:])
        if maxlen <= 64:
            # short-string fast path (keys, tokens, shingles): one padded
            # (n, maxlen) gather instead of two np.repeat passes over the
            # byte stream — measured 2-4× on key-sized strings
            j = np.arange(maxlen, dtype=np.int64)[None, :]
            idx = np.minimum(starts[:, None] + j, total - 1)
            valid = j < lens[:, None]
            b = data[idx].astype(np.uint64) * valid
            exps = np.maximum(lens[:, None] - 1 - j, 0)
            sums = (b * powers[exps]).sum(axis=1, dtype=np.uint64)
        else:
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            terms = data.astype(np.uint64) * powers[np.repeat(lens, lens) - 1 - pos]
            csum = np.zeros(total + 1, dtype=np.uint64)
            np.cumsum(terms, out=csum[1:])
            sums = csum[ends] - csum[starts]
    else:
        sums = np.zeros(n, dtype=np.uint64)
    h = _mix64(sums ^ _mix64(lens.astype(np.uint64) ^ np.uint64(_H_LEN_SALT)))
    if null_mask.any():
        h[null_mask] = _mix64(np.uint64(_H_NULL))
    return h


def _hash_numeric_chunk(arr: pa.Array):
    """uint64 hash per numeric/temporal/bool element: canonicalize to 8-byte
    bits (floats via float64 with -0.0→0.0 and one canonical NaN; the rest
    via int64), then splitmix64. Nulls map to a fixed sentinel."""
    import numpy as np

    if pa.types.is_dictionary(arr.type):
        arr = arr.dictionary_decode()
    null_mask = np.asarray(pc.is_null(arr))
    if pa.types.is_floating(arr.type):
        x = np.asarray(pc.cast(pc.fill_null(arr, 0.0), pa.float64()), dtype=np.float64)
        x = x + 0.0  # -0.0 → 0.0 (groupby treats them equal; their bits differ)
        x = np.where(np.isnan(x), np.float64("nan"), x)  # one canonical NaN bit pattern
        bits = x.view(np.uint64)
    else:
        x = np.asarray(pc.cast(pc.fill_null(arr, 0), pa.int64()), dtype=np.int64)
        bits = x.view(np.uint64)
    h = _mix64(bits ^ np.uint64(_H_LEN_SALT))
    if null_mask.any():
        h[null_mask] = _mix64(np.uint64(_H_NULL))
    return h


def _hash_column(col) -> "object":
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_dictionary(t):
        col = col.dictionary_decode()
        t = col.type
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        return _hash_string_chunk(col)
    if pa.types.is_null(t):
        return np.full(len(col), _mix64(np.uint64(_H_NULL)), dtype=np.uint64)
    try:
        return _hash_numeric_chunk(col)
    except pa.ArrowInvalid:  # exotic type → hash its string form
        return _hash_string_chunk(pc.cast(col, pa.string()))


def stable_hash64(obj):
    """Split-invariant uint64 row hash — the engine's ONLY key hash (bucket
    stamps, salts, shingle ids, sketch inputs, ER node ids).

    Replaces ``pd.util.hash_pandas_object``, whose object-dtype path hashes
    strings as null-terminated C strings with an array-wide fallback: a key
    containing ``'\\x00'`` hashes DIFFERENTLY depending on which other
    strings share its batch (observed: ``['', '\\x00']`` together vs each
    alone), silently breaking hash-bucket co-location — the property every
    grouped shuffle in this engine hangs on. This hasher reads the raw
    utf-8 bytes from the Arrow buffers (NUL-safe, length-aware), handles
    nulls/-0.0/NaN canonically, and is vectorized end-to-end.

    Accepts a pyarrow Table / Array / ChunkedArray, pandas DataFrame /
    Series, or a list of strings; multi-column inputs fold column hashes
    left-to-right through a mix."""
    import numpy as np
    import pandas as pd

    if isinstance(obj, pa.Table):
        cols = [obj.column(i) for i in range(obj.num_columns)]
    elif isinstance(obj, (pa.Array, pa.ChunkedArray)):
        cols = [obj]
    elif isinstance(obj, pd.DataFrame):
        cols = [pa.Array.from_pandas(obj[c]) for c in obj.columns]
    elif isinstance(obj, pd.Series):
        cols = [pa.Array.from_pandas(obj)]
    else:  # list/ndarray of values
        cols = [pa.array(obj)]
    if not cols:
        raise ValueError("stable_hash64: no columns")
    n = len(cols[0])
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    h = _hash_column(cols[0])
    for c in cols[1:]:
        h = _mix64(h * np.uint64(_H_P) ^ _hash_column(c))
    return h


def strip_schema_meta(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (parquet writers embed a pandas-provenance
    blob). pyarrow Schemas carrying ANY metadata are unhashable in this
    version, which defeats Ray's schema-dedup fast path on every batch
    build / shuffle reduce and logs a warning per task. Zero-copy."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    # pass an explicitly metadata-free schema: the driver-generated files
    # carry a pandas-provenance blob, and pyarrow Schemas with ANY metadata
    # are unhashable here, defeating Ray's schema-dedup fast path in every
    # downstream shuffle reduce (one warning per reduce task). A strip map
    # can't fix the READ operator's own output bundles (SplitBlocks blocks
    # fusion), so the schema must be clean at the source.
    path = os.path.join(sf_dir, f"{name}.parquet")
    sch = pq.read_schema(path)
    fields = [sch.field(c).remove_metadata() for c in (columns or sch.names)]
    return ray.data.read_parquet(path, columns=columns, schema=pa.schema(fields))


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


def assert_nul_free_keys(t: pa.Table, keys: list[str]) -> None:
    """Refuse string GROUP KEYS containing U+0000, loudly.

    pandas' groupby/factorize/merge hash string keys through a
    null-terminated C-string table, silently MERGING keys that agree up to
    the first NUL ('a' and 'a\\x00' become one group — verified on pandas
    2.2). Every in-bucket kernel in this engine is a pandas groupby, so a
    NUL-bearing key cannot be grouped correctly no matter how the exchange
    hashes it (stable_hash64 keeps co-location right, but the kernel then
    merges inside the bucket). The contract is therefore: string group
    keys are NUL-free. This guard turns a silent wrong answer into an
    error naming the column; sanitize_nul_strings is the explicit opt-in
    fix for data where NULs are real. Cost: one memchr-style Arrow scan
    per string key column per batch."""
    for name in keys:
        if name not in t.schema.names:
            continue
        col = t.column(name)
        typ = col.type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            if pc.any(pc.match_substring(col, "\x00")).as_py():
                raise ValueError(
                    f"group key column {name!r} contains U+0000 (NUL) bytes; "
                    "pandas' string hash table merges keys at the first NUL, "
                    "so grouped results would be silently wrong. Run "
                    "sanitize_nul_strings(ds, columns=[...]) first (replaces "
                    "NUL with U+FFFD), or derive NUL-free keys."
                )


def sanitize_nul_strings(
    ds: "ray.data.Dataset", columns: list[str], replacement: str = "�"
) -> "ray.data.Dataset":
    """Replace U+0000 in the given string columns with ``replacement``
    (default U+FFFD) — the explicit opt-in for corpora whose text
    legitimately contains NULs, applied BEFORE any grouped operation keyed
    on those columns (see assert_nul_free_keys). A vectorized Arrow kernel;
    non-string columns named here are left untouched."""

    def fix(t: pa.Table) -> pa.Table:
        for name in columns:
            if name not in t.schema.names:
                continue
            col = t.column(name)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                t = t.set_column(
                    t.schema.get_field_index(name),
                    name,
                    pc.replace_substring(col, pattern="\x00", replacement=replacement),
                )
        return t

    return ds.map_batches(fix, batch_format="pyarrow")


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
    def add_bucket(t: pa.Table) -> pa.Table:
        # vectorized row hash (stable_hash64 — deterministic across
        # processes/nodes AND across block splits, required for bucket
        # co-location; pd.util.hash_pandas_object is NOT split-invariant
        # for strings with embedded NULs); hot path, so no per-row Python
        import numpy as np

        assert_nul_free_keys(t, keys)
        h = stable_hash64(t.select(keys))
        b = (h % np.uint64(n_buckets)).astype(np.int32)
        # drop schema metadata (parquet/pandas provenance blobs): pyarrow
        # schemas carrying ANY metadata are unhashable, which defeats Ray's
        # schema-dedup fast path in every shuffle reduce (and spams a
        # warning per reduce task); the metadata carries no data
        t = t.replace_schema_metadata(None)
        return t.append_column("_bkt", pa.array(b, pa.int32()))

    def per_bucket(df):
        out = final_fn(df.drop(columns=["_bkt"]))
        return out

    # coalesce before the sort shuffle: Ray's sort builds an
    # N_in × N_out task/object matrix, so hundreds of tiny partial blocks
    # cost far more than the row volume warrants. Width is cluster-aware:
    # capped at 32 on this single node (measured sweet spot), but grows
    # with total cluster CPUs so the exchange never bottlenecks at 32
    # blocks on a real multi-node deployment.
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 32))
    except Exception:
        ncpu = 32
    width = min(n_buckets, max(32, ncpu))
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(width)
        .groupby("_bkt")
        .map_groups(per_bucket, batch_format="pandas")
    )


def rename_cols(ds: "ray.data.Dataset", mapping: dict[str, str]) -> "ray.data.Dataset":
    """Column rename that works on ANY block format (Dataset.rename_columns
    delegates to the block type and breaks on pandas blocks from
    map_groups): force the batch through Arrow and rename there."""

    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(n, n) for n in t.schema.names])

    return ds.map_batches(f, batch_format="pyarrow")


def _arrow_schema(ds: "ray.data.Dataset", overrides: dict | None = None) -> pa.Schema:
    """Resolve a Dataset's schema to pyarrow fields. Pandas-backed stages
    (map_groups output) report numpy dtypes — ``object`` columns (strings,
    lists) can't be inferred, so callers pass their types via ``overrides``."""
    import numpy as np

    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(sch.names, sch.types):
        if overrides and n in overrides:
            fields.append(pa.field(n, overrides[n]))
        elif isinstance(t, pa.DataType):
            fields.append(pa.field(n, t))
        else:
            dt = np.dtype(t)
            if dt == np.dtype("O"):
                # pandas object column defaults to string; anything else
                # (lists, structs) must be declared by the caller
                fields.append(pa.field(n, pa.string()))
            else:
                fields.append(pa.field(n, pa.from_numpy_dtype(dt)))
    return pa.schema(fields)


def bucketed_join(
    left_ds: "ray.data.Dataset",
    right_ds: "ray.data.Dataset",
    on: "str | list[str]",
    n_buckets: int = 64,
    schema_overrides: dict | None = None,
    merge_fn=None,
) -> "ray.data.Dataset":
    """Inner hash-join on ``on`` — one column name or a COMPOSITE key list,
    same names on both sides — as ONE bucketed shuffle: the engine's
    shuffle-join primitive for when neither side is small enough to
    broadcast (candidate-pair verification ships per-doc payloads this
    way; see pipelines/dedup.py).

    Shape: tag each side, harmonize to the union schema (missing columns →
    nulls), union, hash the key tuple to B buckets, pandas-merge inside
    each bucket. Non-key column names must be disjoint across sides. B
    scales with the cluster, never with key cardinality.

    ``merge_fn(left_df, right_df) -> df`` replaces the default inner merge
    inside each bucket — the hook for joins that must bound their output
    (e.g. per-key fan-out caps in graph traversals, semi/anti variants)
    without giving up the one-shuffle shape."""
    on_keys = [on] if isinstance(on, str) else list(on)
    lschema = _arrow_schema(left_ds, schema_overrides)
    rschema = _arrow_schema(right_ds, schema_overrides)
    overlap = (set(lschema.names) & set(rschema.names)) - set(on_keys)
    if overlap:
        raise ValueError(f"non-key column overlap: {sorted(overlap)}")
    fields: list[pa.Field] = []
    seen: set[str] = set()
    for sch in (lschema, rschema):
        for name in sch.names:
            if name not in seen:
                seen.add(name)
                fields.append(pa.field(name, sch.field(name).type))

    def harmonize(side: int):
        def f(t: pa.Table) -> pa.Table:
            import numpy as np

            cols = {}
            for field in fields:
                if field.name in t.schema.names:
                    col = t.column(field.name)
                    if pa.types.is_null(col.type):  # empty pandas round-trip
                        col = pa.nulls(t.num_rows, field.type)
                    elif col.type != field.type:  # pandas-roundtripped blocks
                        col = col.cast(field.type)
                    cols[field.name] = col
                elif pa.types.is_integer(field.type) or pa.types.is_floating(field.type):
                    # zero-fill the OTHER side's numeric columns instead of
                    # null-padding: map_groups' pandas conversion turns a
                    # null-bearing int64 column into float64 for the WHOLE
                    # bucket, silently corrupting 64-bit keys past 2^53
                    # (e.g. siphash node ids). The filler is never read —
                    # each side's merge projection drops the other side's
                    # columns before use.
                    cols[field.name] = pa.array(
                        np.zeros(t.num_rows, dtype=field.type.to_pandas_dtype()), field.type
                    )
                else:
                    cols[field.name] = pa.nulls(t.num_rows, field.type)
            out = pa.table(cols)
            return out.append_column("_side", pa.array([side] * t.num_rows, pa.int8()))

        return f

    u = left_ds.map_batches(harmonize(0), batch_format="pyarrow").union(
        right_ds.map_batches(harmonize(1), batch_format="pyarrow")
    )
    lnames = list(lschema.names)
    rextra = [n for n in rschema.names if n not in on_keys]

    def merge(df):
        import numpy as np

        left = df[df["_side"] == 0][lnames]
        right = df[df["_side"] == 1][on_keys + rextra]
        if merge_fn is not None:
            out = merge_fn(left, right)
        else:
            out = left.merge(right, on=on_keys, how="inner")
        # ndarray cells (pandas view of Arrow list columns) would re-enter
        # Ray as tensor-extension structs; normalize to Python lists so the
        # declared list<> types round-trip
        for c in out.columns:
            if out[c].dtype == object and len(out) and isinstance(out[c].iloc[0], np.ndarray):
                out[c] = [v.tolist() if isinstance(v, np.ndarray) else v for v in out[c]]
        return out

    return bucketed_group_agg(u, on_keys, merge, n_buckets=n_buckets)


def salted_group_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    partial_fn,
    combine_fn,
    n_salts: int = 16,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Skew-safe aggregation for HOT keys (north-rule salted-key
    mitigation): round 1 groups on (keys, salt) — a hot key's rows are
    split across ``n_salts`` groups, so no single task ever holds all of
    them — round 2 groups on the keys alone and merges the ≤n_salts
    partial rows per key.

    ``partial_fn(df) -> partial rows`` runs per (keys, salt) group;
    ``combine_fn(df) -> final rows`` merges partials per key group. The
    salt is a deterministic full-row hash, so reruns are stable. Prefer
    per-batch partials + ``bucketed_group_agg`` when the aggregate has a
    cheap combiner; use this when the per-key computation needs grouped
    RAW rows (exact medians, argmax-with-payload) under Zipf keys."""
    import numpy as np
    import pandas as pd

    def add_salt(t: pa.Table) -> pa.Table:
        assert_nul_free_keys(t, keys)
        h = stable_hash64(t)
        return t.append_column("_salt", pa.array((h % np.uint64(n_salts)).astype(np.int32)))

    def round1(df):
        out = partial_fn(df.drop(columns=["_salt"]))
        return out

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    partials = bucketed_group_agg(salted, keys + ["_salt"], round1, n_buckets=n_buckets)
    return bucketed_group_agg(partials, keys, combine_fn, n_buckets=n_buckets)


from collections import OrderedDict

_BROADCAST_CACHE: "OrderedDict" = OrderedDict()
_BROADCAST_CACHE_SLOTS = 8  # a stage uses 1-2 broadcasts; 8 covers overlap


def get_broadcast(ref):
    """Per-worker-process cache for ``ray.put`` broadcast objects: ONE
    ray.get per worker, shared by every stateless task that lands there.
    Lets cheap-state broadcast joins run as elastic tasks instead of actor
    pools — pool spin-up dominated those stages at fixture scale, and the
    zero-copy get is repeated per worker anyway.

    Bounded LRU: a long-lived worker in a session running many queries
    would otherwise pin every broadcast payload it ever deserialized
    (product indexes, centroid matrices, nation maps) for the process
    lifetime. Eviction only drops this process's deserialized copy; the
    object-store copy lives exactly as long as the caller's ref does."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key in _BROADCAST_CACHE:
        _BROADCAST_CACHE.move_to_end(key)
    else:
        _BROADCAST_CACHE[key] = ray.get(ref)
        while len(_BROADCAST_CACHE) > _BROADCAST_CACHE_SLOTS:
            _BROADCAST_CACHE.popitem(last=False)
    return _BROADCAST_CACHE[key]


def auto_join(
    left_ds: "ray.data.Dataset",
    right_ds: "ray.data.Dataset",
    on: "str | list[str]",
    n_buckets: int = 64,
    broadcast_max_bytes: int = 128 << 20,
    right_size_hint: int | None = None,
    merge_fn=None,
    schema_overrides: dict | None = None,
    decision: dict | None = None,
) -> "ray.data.Dataset":
    """Adaptive join strategy — the planner decision every distributed
    engine makes per join, exposed as a primitive: if the RIGHT side's
    estimated in-memory size fits ``broadcast_max_bytes`` (a per-worker
    heap budget, NOT a per-batch one), ship it ONCE via ray.put and
    pandas-merge map-side against every left batch (zero shuffle, the
    q03/q04 shape); otherwise fall back to the one-shuffle
    ``bucketed_join``. Join semantics (inner on a same-named single or
    composite key,
    disjoint non-key columns, optional ``merge_fn(left_df, right_df)``
    override) are identical on both paths, so callers can let data size
    pick the plan.

    Size estimate: ``right_size_hint`` when the caller knows (always pass
    it in metadata-driven pipelines); else ``Dataset.size_bytes()`` —
    metadata-only for pure parquet reads, but may EXECUTE a transformed
    right side, which is acceptable only because a broadcast would
    materialize it anyway and the shuffle fallback re-streams from the
    same plan. On an unknown (None) estimate the safe choice is the
    shuffle. ``decision``, when passed, records {'strategy',
    'estimated_bytes'} for tests/diagnostics."""
    est = right_size_hint
    if est is None:
        try:
            est = right_ds.size_bytes()
        except Exception:
            est = None
    strategy = "broadcast" if (est is not None and est <= broadcast_max_bytes) else "shuffle"
    if decision is not None:
        decision["strategy"] = strategy
        decision["estimated_bytes"] = est
    if strategy == "shuffle":
        return bucketed_join(
            left_ds, right_ds, on, n_buckets=n_buckets,
            schema_overrides=schema_overrides, merge_fn=merge_fn,
        )

    import pandas as pd

    on_keys = [on] if isinstance(on, str) else list(on)
    lschema = _arrow_schema(left_ds, schema_overrides)
    rschema = _arrow_schema(right_ds, schema_overrides)
    overlap = (set(lschema.names) & set(rschema.names)) - set(on_keys)
    if overlap:
        raise ValueError(f"non-key column overlap: {sorted(overlap)}")
    right_tbl = pa.concat_tables(
        [t.replace_schema_metadata(None) for t in ray.get(right_ds.to_arrow_refs())],
        promote_options="default",
    )
    rdf = right_tbl.to_pandas()
    ref = ray.put(rdf)

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        r = get_broadcast(ref)
        if merge_fn is not None:
            return merge_fn(df, r)
        return df.merge(r, on=on_keys, how="inner")

    # join_batch's closure holds ``ref``, which keeps the broadcast object
    # alive exactly as long as the lazy plan that needs it
    return left_ds.map_batches(join_batch, batch_format="pandas", batch_size=65536)
