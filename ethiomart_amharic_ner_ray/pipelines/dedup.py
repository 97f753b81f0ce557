"""Deduplication operators over the documents table.

The reference computes a SHA-256 message_hash but never dedups on it
(SURVEY.md §2.7); at 100 TB dedup is mandatory, so this module provides the
standard family:

  exact        hash-partition + per-group min (SQL-checkable)
  minhash_lsh  word-shingle → minhash → banded LSH buckets → verified
               Jaccard pairs → connected components (min-label propagation)
  simhash      64-bit simhash + hamming-band bucketing
  ngram_jaccard  exact n-gram Jaccard over LSH candidate pairs

All hashing is seeded/FNV-based — deterministic across processes (never
Python's builtin hash()). The LSH path is the canonical scale shape:
shingle+sign per batch (stateless map), explode to (band, key) rows,
ONE groupby on the band key, verify only within buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .common import bucketed_group_agg, read_table, round_away

N_PERM = 64
N_BANDS = 16  # 16 bands × 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _stable_hash64(token: str) -> int:
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big")


def _perm_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 62, size=N_PERM, dtype=np.int64).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 62, size=N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


def _word_shingles(text: str, k: int = 3) -> set[int]:
    toks = text.lower().split()
    if len(toks) < k:
        return {_stable_hash64(" ".join(toks))} if toks else set()
    return {_stable_hash64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


def _minhash(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Universal-hash minhash, vectorized: (a*x + b) with 64-bit wraparound
    (odd multipliers — a standard, deterministic permutation family)."""
    if not shingles:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    prod = a[:, None] * vals[None, :] + b[:, None]  # uint64 wraparound
    return prod.min(axis=1)


def q11_dedup_exact(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup: per-batch min-per-hash partial, then a bucketed final min
    per content hash — keeps the lowest doc_id per distinct text. Output:
    surviving doc_ids."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "h": [hashlib.sha256(x.encode("utf-8")).hexdigest() for x in t.column("text").to_pylist()],
                "doc_id": t.column("doc_id").to_numpy(),
            }
        )
        g = df.groupby("h", as_index=False)["doc_id"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("h", as_index=False)["doc_id"].min()[["doc_id"]]

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_agg(partials, ["h"], final, n_buckets=32)


def minhash_signatures(sf_dir: str, seed: int = 42) -> "ray.data.Dataset":
    """Per-doc MinHash signature rows exploded to (band, band_key, doc_id)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    a, b = _perm_params(seed)

    class Signer:
        def __init__(self):
            self._a, self._b = a, b

        def __call__(self, t: pa.Table) -> pa.Table:
            bands, keys, ids = [], [], []
            for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
                sig = _minhash(_word_shingles(text), self._a, self._b)
                for bi in range(N_BANDS):
                    chunk = sig[bi * ROWS_PER_BAND : (bi + 1) * ROWS_PER_BAND]
                    key = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                    bands.append(bi)
                    keys.append(key)
                    ids.append(doc_id)
            return pa.table(
                {
                    "band": pa.array(bands, pa.int32()),
                    "band_key": pa.array(keys, pa.string()),
                    "doc_id": pa.array(ids, pa.int64()),
                }
            )

    return ds.map_batches(Signer, batch_format="pyarrow", concurrency=(1, 8))


def minhash_lsh_pairs(sf_dir: str, seed: int = 42, jaccard_threshold: float = 0.7) -> pd.DataFrame:
    """Candidate pairs from LSH buckets, verified with exact shingle Jaccard.

    The bucket groupby is the only shuffle; buckets are tiny (near-dup
    cliques), so per-bucket pair expansion is bounded. Verification re-reads
    only candidate docs (broadcast of the candidate id set)."""
    sigs = minhash_signatures(sf_dir, seed)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a_l: list[int] = []
        b_l: list[int] = []
        for _, g in df.groupby(["band", "band_key"], sort=False):
            ids = sorted(g["doc_id"].unique())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_l.append(ids[i])
                    b_l.append(ids[j])
        return pd.DataFrame({"a": pd.array(a_l, dtype="int64"), "b": pd.array(b_l, dtype="int64")})

    cand = (
        bucketed_group_agg(sigs, ["band", "band_key"], bucket_pairs, n_buckets=64)
        .to_pandas()
        .drop_duplicates()
    )
    if cand.empty:
        return pd.DataFrame(columns=["a", "b", "jaccard"])

    # verify: load shingles only for candidate docs
    need = set(cand["a"]) | set(cand["b"])
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column("doc_id"), pa.array(sorted(need), pa.int64())))

    sub = docs.map_batches(project, batch_format="pyarrow").to_pandas()
    sh = {r.doc_id: _word_shingles(r.text) for r in sub.itertuples()}
    jac = []
    for a_id, b_id in zip(cand["a"], cand["b"]):
        sa, sb = sh.get(a_id, set()), sh.get(b_id, set())
        u = len(sa | sb)
        jac.append(len(sa & sb) / u if u else 0.0)
    cand = cand.assign(jaccard=round_away(np.asarray(jac), 4))
    out = cand[cand["jaccard"] >= jaccard_threshold].reset_index(drop=True)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def minhash_dedup(sf_dir: str, seed: int = 42, jaccard_threshold: float = 0.7) -> pd.DataFrame:
    """Near-dup clusters: verified pairs → connected components via
    min-label propagation (driver-side union-find is safe only because the
    verified pair set is provably small; at 10^12 scale swap in the iterative
    groupby min-label rounds — same semantics)."""
    pairs = minhash_lsh_pairs(sf_dir, seed, jaccard_threshold)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    members = sorted({int(x) for x in pd.concat([pairs["a"], pairs["b"]])} if len(pairs) else set())
    return pd.DataFrame(
        {"doc_id": pd.array(members, dtype="int64"), "cluster_rep": pd.array([find(m) for m in members], dtype="int64")}
    )


def simhash_signatures(sf_dir: str) -> "ray.data.Dataset":
    """64-bit SimHash per doc + 4×16-bit hamming bands (rows-only check)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        out_sig, out_b = [], [[] for _ in range(4)]
        for text in t.column("text").to_pylist():
            acc = np.zeros(64, dtype=np.int64)
            for tok in set(text.lower().split()):
                h = np.uint64(_stable_hash64(tok))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == np.uint64(1), 1, -1)
            sig = int("".join("1" if v > 0 else "0" for v in acc), 2)
            # true two's-complement reinterpretation uint64 -> int64 (NOT a
            # shifted bijection): values with MSB=0 are stored verbatim, so
            # external consumers comparing simhashes see the same number
            out_sig.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
            for i in range(4):
                out_b[i].append((sig >> (16 * i)) & 0xFFFF)
        cols = {"doc_id": t.column("doc_id"), "simhash": pa.array(out_sig, pa.int64())}
        for i in range(4):
            cols[f"band{i}"] = pa.array(out_b[i], pa.int32())
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")
