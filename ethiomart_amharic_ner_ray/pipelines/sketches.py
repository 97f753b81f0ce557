"""Mergeable sketch aggregations — the sub-linear-state tools a 100 TB
aggregation layer needs when exact answers don't fit a reduce.

HyperLogLog distinct counting: every batch emits ONE fixed-size register
array (2^p bytes); merging is an element-wise max — associative and
commutative, so partials combine in any order with no shuffle at all (the
driver reduce is p-bounded, never data-bounded). Deterministic: values are
hashed with the engine-wide ``stable_hash64`` (same split-invariant hash
the bucketing uses), so reruns and resharding give identical registers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .common import read_table, stable_hash64

HLL_P = 12  # 4096 registers → ~1.6% standard error


def _hll_registers(values: pd.Series, p: int = HLL_P) -> np.ndarray:
    """One batch's HLL register array from raw values (vectorized)."""
    h = stable_hash64(values)
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)  # top p bits → register
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = position of first 1-bit in the remaining bits (1-based), capped
    nz = rest != 0
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    if nz.any():
        # leading zero count via float64 exponent trick is lossy; use a
        # 64-step-free vectorized method: bit_length of rest
        bl = np.zeros(len(h), dtype=np.int64)
        r = rest[nz]
        # np.log2 on uint64 loses precision at the top; compute bit length
        # by successive shifts (6 vectorized steps)
        b = np.zeros(r.shape, dtype=np.int64)
        v = r.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(shift))
            b[big] += shift
            v[big] >>= np.uint64(shift)
        bl[nz] = b + 1
        rank_nz = 64 - bl[nz] + 1  # zeros before the first 1-bit, +1
        rank[nz] = np.minimum(rank_nz, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = regs.shape[0]
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:  # small-range (linear counting) regime
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds: "ray.data.Dataset", column: str, p: int = HLL_P) -> int:
    """Approximate COUNT(DISTINCT column) via HLL: per-batch register
    partials (one 2^p-byte row each), element-wise-max merged on the
    driver. State is O(2^p) regardless of input size."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = _hll_registers(df[column], p)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pandas", batch_size=65536).iter_batches(
        batch_format="pandas"
    ):
        for blob in b["regs"]:
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    return round(_hll_estimate(merged))


def approx_distinct_report(sf_dir: str) -> pd.DataFrame:
    """Rows-only query: HLL distinct estimates next to the (test-scale)
    exact counts for two columns of very different cardinality."""
    rows = []
    for table, col in (("events", "user_id"), ("documents", "text")):
        ds = read_table(sf_dir, table, columns=[col])
        est = approx_distinct(ds, col)
        rows.append({"table": table, "column": col, "approx_distinct": est})
    return pd.DataFrame(rows)


def bottomk_sample(ds: "ray.data.Dataset", column: str, k: int = 4096) -> pd.DataFrame:
    """Bottom-k sketch: the k rows whose fixed-key hash of ``column`` is
    smallest — a MERGEABLE deterministic uniform sample (merge = take the
    k smallest of the union; same result regardless of sharding). Each
    batch emits ≤k candidate rows, the driver keeps the global k: state is
    O(k) end-to-end, no shuffle, no RNG. The same sketch yields a distinct
    estimate (k-1)/h_k, but HLL above is tighter per byte for that."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = stable_hash64(df[column])
        out = df.copy()
        out["_h"] = h
        return out.nsmallest(k, "_h")

    parts = []
    for b in ds.map_batches(partial, batch_format="pandas", batch_size=65536).iter_batches(
        batch_format="pandas"
    ):
        parts.append(b)
    merged = pd.concat(parts, ignore_index=True).nsmallest(k, "_h")
    return merged.drop(columns=["_h"]).reset_index(drop=True)


def approx_quantiles(
    ds: "ray.data.Dataset", column: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95), k: int = 4096
) -> pd.DataFrame:
    """Approximate quantiles of a numeric column from the bottom-k uniform
    sample — error ~O(1/√k) in rank; exact-median stays q09's per-key
    bucketed path, this is the corpus-level scale tool."""
    sample = bottomk_sample(ds.select_columns([column]), column, k)
    vals = sample[column].to_numpy(dtype=np.float64)
    return pd.DataFrame(
        {
            "q": list(qs),
            "value": [float(np.quantile(vals, q)) for q in qs] if len(vals) else [np.nan] * len(qs),
        }
    )


class BloomFilter:
    """Plain k-hash Bloom filter over uint64 element hashes — the broadcast
    SEMI-JOIN prune for when the small side outgrows an exact broadcast
    set: no false negatives ever, false-positive rate ≈ (1-e^{-kn/m})^k.
    Deterministic double hashing (h1 + i*h2) from the engine-wide
    stable_hash64, so every worker builds/probes identically."""

    def __init__(self, n_bits: int = 1 << 20, n_hashes: int = 5):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    @staticmethod
    def _h12(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        h = stable_hash64(values)
        return h & np.uint64(0xFFFFFFFF), (h >> np.uint64(32)) | np.uint64(1)

    def _positions(self, values: pd.Series) -> np.ndarray:
        h1, h2 = self._h12(values)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, values: pd.Series) -> "BloomFilter":
        pos = self._positions(values).reshape(-1)
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return self

    def contains(self, values: pd.Series) -> np.ndarray:
        pos = self._positions(values)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self.bits |= other.bits
        return self


class CountMinSketch:
    """Count-min sketch: depth × width counter matrix, positions from the
    same deterministic double-hash family as BloomFilter (the engine-wide
    stable_hash64), so every worker sketches identically and partials from any
    sharding merge to the same state. Merge = element-wise sum (the
    counters are linear), point query = min over rows — never an
    underestimate, overestimate ≤ 2N/width with prob 1−2^−depth."""

    def __init__(self, width: int = 1 << 14, depth: int = 4):
        self.width = width
        self.depth = depth
        self.counts = np.zeros((depth, width), dtype=np.int64)

    def _positions(self, values: pd.Series) -> np.ndarray:
        h1, h2 = BloomFilter._h12(values)
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.width)).astype(np.int64)

    def add(self, values: pd.Series) -> "CountMinSketch":
        pos = self._positions(values)
        for d in range(self.depth):
            np.add.at(self.counts[d], pos[d], 1)
        return self

    def estimate(self, values: pd.Series) -> np.ndarray:
        pos = self._positions(values)
        return np.min(
            np.stack([self.counts[d][pos[d]] for d in range(self.depth)]), axis=0
        )

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.counts += other.counts
        return self


def cms_heavy_hitters(
    ds: "ray.data.Dataset",
    column: str,
    k: int = 50,
    width: int = 1 << 14,
    depth: int = 4,
    candidates_per_batch: int = 512,
) -> pd.DataFrame:
    """Approximate top-k frequent values with O(depth·width + candidates)
    state — the q35-exact-top-k's sub-linear cousin for when the value
    domain (full corpus vocabulary) outgrows an exact two-phase groupby.
    Each batch emits its CMS partial plus its local top candidates; the
    driver sums the sketches, unions the candidate sets (any global heavy
    hitter is a local heavy hitter in at least one batch), scores every
    candidate against the MERGED sketch and keeps the top k. Estimates are
    upper bounds of true counts (ties broken by value for determinism)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cms = CountMinSketch(width, depth).add(df[column])
        vc = df[column].value_counts().head(candidates_per_batch)
        return pd.DataFrame(
            {
                "sketch": [cms.counts.tobytes()],
                "cands": [list(vc.index.astype(str))],
            }
        )

    merged = CountMinSketch(width, depth)
    cands: set[str] = set()
    for b in ds.map_batches(partial, batch_format="pandas", batch_size=65536).iter_batches(
        batch_format="pandas"
    ):
        for blob, cl in zip(b["sketch"], b["cands"]):
            merged.counts += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
            cands.update(cl)

    cand = pd.Series(sorted(cands), dtype=object)
    est = merged.estimate(cand) if len(cand) else np.array([], dtype=np.int64)
    out = pd.DataFrame({column: cand, "est_count": est.astype("int64")})
    return (
        out.sort_values(["est_count", column], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def cms_vocab_topk(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Rows-only query: approximate top-k corpus vocabulary via count-min —
    the sketch-state path next to q35_vocab_topk's exact two-phase path.
    Tokens are exploded per batch map-side, so the sketch sees the token
    stream without a shuffle."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.strip().str.split()
        return pd.DataFrame({"token": toks.explode().dropna()})

    ds = read_table(sf_dir, "documents", columns=["text"]).map_batches(
        explode, batch_format="pandas", batch_size=4096
    )
    return cms_heavy_hitters(ds, "token", k=k)


def approx_distinct_per_group(
    ds: "ray.data.Dataset",
    keys: list[str],
    column: str,
    p: int = 10,
) -> "ray.data.Dataset":
    """Approximate COUNT(DISTINCT column) PER GROUP — the sketch-through-
    shuffle shape: each batch emits one 2^p-byte HLL register blob per key
    it saw, the bucketed exchange moves those fixed-size blobs (never raw
    values), and the per-bucket final max-merges registers per key. Exchange
    volume is keys_per_block × blocks × 2^p bytes, independent of row count
    — the scale path when q42-style exact two-phase distinct (which ships
    every unique (key, value) pair) outgrows the wires. p=10 → ~3.2% SE."""
    from .common import bucketed_group_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys)[column].apply(lambda s: _hll_registers(s, p).tobytes())
        return g.rename("regs").reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        def merge_est(blobs: pd.Series) -> int:
            regs = np.frombuffer(blobs.iloc[0], dtype=np.uint8).copy()
            for b in blobs.iloc[1:]:
                np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
            return round(_hll_estimate(regs))

        g = df.groupby(keys)["regs"].apply(merge_est)
        return g.rename("approx_distinct").reset_index().astype({"approx_distinct": "int64"})

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, keys, final, n_buckets=16)


def approx_users_per_event_type(sf_dir: str) -> "ray.data.Dataset":
    """Rows-only query: HLL distinct users per event type, next to the
    exact per-group distinct family (q42's shape) for accuracy comparison
    at fixture scale."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    return approx_distinct_per_group(ds, ["event_type"], "user_id")


def approx_audience_overlap(sf_dir: str, p: int = HLL_P) -> pd.DataFrame:
    """HLL inclusion–exclusion overlap estimates for every event-type pair
    — the sketch-sized answer to q105's exact audience-overlap matrix when
    per-type audiences outgrow an exact distinct count:
    |A ∩ B| ≈ hll(A) + hll(B) − hll(A ∪ B), where hll(A ∪ B) is the
    element-wise max of the two register arrays (union is native to HLL —
    no data pass beyond the one that built the per-type registers). One
    scan builds |types| register blobs exactly like
    approx_users_per_event_type; the pair math is driver-side on
    |types|·2^p bytes. Intersection error compounds (three ±1.6%
    estimates), so small intersections of large sets are noisy — the
    standard HLL caveat, tested against exact q105 at fixture scale."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("event_type"):
            rows.append({"event_type": t, "regs": _hll_registers(g["user_id"], p).tobytes()})
        return pd.DataFrame(rows)

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    merged: dict[str, np.ndarray] = {}
    for b in ds.map_batches(partial, batch_format="pandas", batch_size=65536).iter_batches(
        batch_format="pandas"
    ):
        for t, blob in zip(b["event_type"], b["regs"]):
            r = np.frombuffer(blob, dtype=np.uint8)
            merged[t] = np.maximum(merged[t], r) if t in merged else r.copy()

    types = sorted(merged)
    rows = []
    for a in types:
        for bt in types:
            na = _hll_estimate(merged[a])
            nb = _hll_estimate(merged[bt])
            nu = _hll_estimate(np.maximum(merged[a], merged[bt]))
            rows.append(
                {
                    "type_a": a,
                    "type_b": bt,
                    "approx_overlap": int(round(max(0.0, na + nb - nu))),
                }
            )
    return pd.DataFrame(rows)


def cms_join_size(
    left_ds: "ray.data.Dataset",
    left_key: str,
    right_ds: "ray.data.Dataset",
    right_key: str,
    width: int = 1 << 14,
    depth: int = 4,
) -> dict:
    """Join-cardinality estimation by count-min inner product (Cormode &
    Muthukrishnan 2005, §4.2): |L ⋈ R| = Σ_k f_L(k)·f_R(k), estimated as
    min over the d rows of Σ_j CMS_L[r,j]·CMS_R[r,j]. The estimate is an
    UPPER BOUND always (hash collisions only add non-negative cross
    terms) and within ε·‖f_L‖₁·‖f_R‖₁ of truth with probability 1−δ at
    width e/ε, depth ln(1/δ) — the planner statistic auto_join-style
    decisions would use on a cluster where counting the join is the cost
    you're trying to avoid.

    Shape: one streaming CMS partial per side (O(width·depth) blobs,
    driver element-wise sum — the sketch is mergeable), zero shuffle,
    neither input materialized."""
    import numpy as np

    def build(ds, column):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            cms = CountMinSketch(width, depth).add(df[column].astype(str))
            return pd.DataFrame({"sketch": [cms.counts.tobytes()]})

        merged = CountMinSketch(width, depth)
        for b in ds.map_batches(partial, batch_format="pandas", batch_size=65536).iter_batches(
            batch_format="pandas"
        ):
            for blob in b["sketch"]:
                merged.counts += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
        return merged

    l, r = build(left_ds, left_key), build(right_ds, right_key)
    per_row = (l.counts.astype(np.float64) * r.counts.astype(np.float64)).sum(axis=1)
    return {
        "estimate": int(per_row.min()),
        "n_left": int(l.counts[0].sum()),
        "n_right": int(r.counts[0].sum()),
    }


def join_size_estimate(sf_dir: str) -> pd.DataFrame:
    """Rows-only query: estimated vs exact |events ⋈ orders on user/cust
    key| — both sides multi-row per key, so the inner product is
    non-degenerate. The exact side is the same two-phase count shape as
    q42 (per-key counts are catalog-sized), kept next to the estimate so
    the upper-bound and error-band properties are visible in the output
    (and pinned by tests/test_dedup_similarity.py)."""
    from .common import read_table

    ev = read_table(sf_dir, "events", columns=["user_id"])
    od = read_table(sf_dir, "orders", columns=["o_custkey"])
    est = cms_join_size(ev, "user_id", od, "o_custkey")

    def cnt(ds, col):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(col, as_index=False).size()
            g.columns = ["k", "n"]
            return g

        return (
            ds.map_batches(partial, batch_format="pandas", batch_size=65536)
            .to_pandas()
            .groupby("k", as_index=False)["n"]
            .sum()
        )

    lc, rc = cnt(ev, "user_id"), cnt(od, "o_custkey")
    exact = int(lc.merge(rc, on="k", suffixes=("_l", "_r")).eval("n_l * n_r").sum())
    return pd.DataFrame(
        {
            "estimate": [est["estimate"]],
            "exact": [exact],
            "n_left": [est["n_left"]],
            "n_right": [est["n_right"]],
        }
    )
