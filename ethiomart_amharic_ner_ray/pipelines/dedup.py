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

from .common import bucketed_group_agg, read_table, round_away, stable_hash64

N_PERM = 64
N_BANDS = 16  # 16 bands × 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _stable_hash64(token: str) -> int:
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big")


def _hash_shingle_strings(strings: list[str]) -> np.ndarray:
    """Deterministic uint64 hash per shingle string — the engine-wide
    ``stable_hash64``, vectorized over a whole batch's shingles. Shared by
    the scalar shinglers and the batch signer so every consumer sees the
    SAME shingle ids (jaccard verification, reference-test parity)."""
    if not strings:
        return np.array([], dtype=np.uint64)
    return stable_hash64(pd.Series(strings, dtype=object))


def _shingle_strings(text: str, k: int = 3) -> list[str]:
    toks = text.lower().split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _perm_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 62, size=N_PERM, dtype=np.int64).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 62, size=N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


def _word_shingles(text: str, k: int = 3) -> set[int]:
    return set(_hash_shingle_strings(_shingle_strings(text, k)).tolist())


def _char_shingle_strings(text: str, k: int = 5) -> list[str]:
    s = " ".join(text.lower().split())
    if not s:
        return []
    if len(s) < k:
        return [s]
    return [s[i : i + k] for i in range(len(s) - k + 1)]


def _char_shingles(text: str, k: int = 5) -> set[int]:
    """Character n-gram shingles (whitespace-normalized) — finer-grained
    than word shingles; the n-gram-Jaccard dedup variant's unit."""
    return set(_hash_shingle_strings(_char_shingle_strings(text, k)).tolist())


SHINGLE_STRING_BUILDERS = {"word": _shingle_strings, "char": _char_shingle_strings}


SHINGLERS = {"word": _word_shingles, "char": _char_shingles}


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
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("h", as_index=False)["doc_id"].min()[["doc_id"]]

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_agg(partials, ["h"], final, n_buckets=32)


def minhash_signatures(
    sf_dir: str,
    seed: int = 42,
    with_shingles: bool = False,
    shingle: str = "word",
    docs_ds: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Per-doc MinHash signature rows exploded to (band, band_key, doc_id).

    ``with_shingles=True`` additionally ships each doc's sorted shingle-hash
    array (int64 view) on every band row, so exact-Jaccard verification can
    happen INSIDE the band bucket — one shuffle end-to-end instead of extra
    join hops, at the cost of ×N_BANDS shingle payload through the exchange
    (the same payload-vs-hops tradeoff as embedding_neardup_lsh).
    ``docs_ds`` overrides the documents read with any (doc_id, text)
    Dataset (e.g. the curation pipeline's dedup-survivor checkpoint)."""
    ds = docs_ds if docs_ds is not None else read_table(sf_dir, "documents", columns=["doc_id", "text"])
    a, b = _perm_params(seed)
    build_strings = SHINGLE_STRING_BUILDERS[shingle]

    def sign_batch(t: pa.Table) -> pa.Table:
        """Batch-vectorized: ONE siphash call for the whole batch's shingle
        strings, then minhash for every doc at once — (64, ΣN) universal-
        hash products reduced per doc with np.minimum.reduceat (chunked so
        the product matrix stays ≤64 MB). Stateless TASKS, not an actor
        pool: the only state (two 64-entry arrays) ships in the closure,
        and pool spin-up was the dominant cost at fixture scale."""
        doc_ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        per_doc = [build_strings(x) for x in texts]
        counts = np.array([len(p) for p in per_doc], dtype=np.int64)
        h = _hash_shingle_strings([s for p in per_doc for s in p])
        offs = np.concatenate([[0], np.cumsum(counts)])

        n_docs = len(texts)
        sigs = np.full((n_docs, N_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
        nz = np.nonzero(counts)[0]
        CH = 1 << 17  # ≤64 MB of (64, CH) uint64 product per chunk
        i = 0
        while i < len(nz):
            j = i + 1
            tot = counts[nz[i]]
            while j < len(nz) and tot + counts[nz[j]] <= CH:
                tot += counts[nz[j]]
                j += 1
            docs = nz[i:j]
            base = offs[docs[0]]
            seg = h[base : offs[docs[-1] + 1]]  # contiguous (0-len gaps ok)
            prod = a[:, None] * seg[None, :] + b[:, None]
            starts = (offs[docs] - base).astype(np.int64)
            sigs[docs] = np.minimum.reduceat(prod, starts, axis=1).T
            i = j

        bands, keys, ids = [], [], []
        shs: list[list[int]] = []
        for d in range(n_docs):
            sig = sigs[d]
            if with_shingles:
                sh = np.unique(h[offs[d] : offs[d + 1]].view(np.int64)).tolist()
            for bi in range(N_BANDS):
                chunk = sig[bi * ROWS_PER_BAND : (bi + 1) * ROWS_PER_BAND]
                bands.append(bi)
                keys.append(hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest())
                ids.append(doc_ids[d])
                if with_shingles:
                    shs.append(sh)
        cols = {
            "band": pa.array(bands, pa.int32()),
            "band_key": pa.array(keys, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
        }
        if with_shingles:
            cols["sh"] = pa.array(shs, pa.list_(pa.int64()))
        return pa.table(cols)

    return ds.map_batches(sign_batch, batch_format="pyarrow")


def doc_shingle_sets(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc sorted shingle-hash arrays: (doc_id, sh: list<uint64>) — the
    payload the verification shuffle ships instead of materializing any doc
    on the driver."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        # stored as int64 (two's-complement view of the uint64 hash) so the
        # list type survives pandas round-trips in the join stages
        shs = [
            np.sort(np.fromiter(s, dtype=np.uint64, count=len(s)).view(np.int64))
            if (s := _word_shingles(x))
            else np.array([], np.int64)
            for x in t.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "sh": pa.array([s.tolist() for s in shs], pa.list_(pa.int64())),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def minhash_lsh_pairs_ds(
    sf_dir: str,
    seed: int = 42,
    jaccard_threshold: float = 0.7,
    shingle: str = "word",
    docs_ds: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Verified near-dup pairs, end-to-end distributed (round-1 verdict
    finding #2: nothing driver-sized anywhere).

    Shape: each doc's shingle array rides its band rows through the ONE
    band-bucket groupby; exact Jaccard is verified for every candidate pair
    INSIDE its bucket (buckets are near-dup cliques → bounded expansion);
    a second, tiny (a, b) groupby dedups verified pairs across bands. A
    variant that keeps the banding shuffle slim and instead hash-joins
    shingles onto candidate pairs afterwards is available from the same
    primitives (doc_shingle_sets + common.bucketed_join) when shingle
    payloads outweigh the extra exchange hops."""
    sigs = minhash_signatures(sf_dir, seed, with_shingles=True, shingle=shingle, docs_ds=docs_ds)

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a_l: list[int] = []
        b_l: list[int] = []
        jac_l: list[float] = []
        for _, g in df.groupby(["band", "band_key"], sort=False):
            if len(g) < 2:
                continue
            g = g.drop_duplicates("doc_id")
            ids = g["doc_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            shs = [np.asarray(s, dtype=np.int64) for s in g["sh"].to_numpy()[order]]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    sa, sb = shs[i], shs[j]
                    inter = np.intersect1d(sa, sb, assume_unique=True).size
                    union = sa.size + sb.size - inter
                    jac = inter / union if union else 0.0
                    a_l.append(int(ids[i]))
                    b_l.append(int(ids[j]))
                    jac_l.append(jac)
        out = pd.DataFrame(
            {
                "a": pd.array(a_l, dtype="int64"),
                "b": pd.array(b_l, dtype="int64"),
                "jaccard": round_away(np.asarray(jac_l, dtype=np.float64), 4)
                if jac_l
                else pd.array([], dtype="float64"),
            }
        )
        return out[out["jaccard"] >= jaccard_threshold]

    cand = bucketed_group_agg(sigs, ["band", "band_key"], verify_bucket, n_buckets=64)
    return bucketed_group_agg(
        cand, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"]), n_buckets=32
    )


def minhash_lsh_pairs(
    sf_dir: str, seed: int = 42, jaccard_threshold: float = 0.7, shingle: str = "word"
) -> pd.DataFrame:
    """Driver-side collect of ``minhash_lsh_pairs_ds`` (the verified pair
    set is tiny; the heavy lifting already happened distributed)."""
    out = minhash_lsh_pairs_ds(sf_dir, seed, jaccard_threshold, shingle=shingle).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["a", "b", "jaccard"])
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def minhash_dedup(
    sf_dir: str,
    seed: int = 42,
    jaccard_threshold: float = 0.7,
    checkpoint_dir: str | None = None,
) -> pd.DataFrame:
    """Near-dup clusters: verified pairs → connected components via
    distributed min-label propagation (pipelines/graph.py) — cluster_rep is
    the component's minimum doc_id, exactly what the old driver-side
    union-find-with-min-root produced, now with no driver graph state.
    ``checkpoint_dir`` Parquet-checkpoints the label rounds (resumable; the
    cluster deployment path), keyed by the dedup parameters."""
    from .graph import connected_components_minlabel

    import os as _os

    from ..state.manifest import content_signature

    pairs = minhash_lsh_pairs_ds(sf_dir, seed, jaccard_threshold)
    # content-signed input (r5): a checkpoint_dir reused across runs can
    # never serve labels computed from a since-regenerated documents table
    in_sig = content_signature(_os.path.join(sf_dir, "documents.parquet"))
    out = connected_components_minlabel(
        pairs,
        n_buckets=32,
        checkpoint_dir=checkpoint_dir,
        fingerprint=f"minhash|{seed}|{jaccard_threshold}|in={in_sig}",
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.array([], dtype="int64"), "cluster_rep": pd.array([], dtype="int64")}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def simhash_signatures(sf_dir: str) -> "ray.data.Dataset":
    """64-bit SimHash per doc + 4×16-bit hamming bands (rows-only check).

    Batch-vectorized (same shape as the MinHash signer): every DISTINCT
    token in the batch is blake2b-hashed exactly once (tokens repeat
    heavily across docs), the ±1 bit matrix is built for the whole
    vocabulary in one shot, and per-doc accumulation is one
    ``np.add.reduceat`` over the doc→vocab index array — no per-doc or
    per-token Python loop, no 64-wide numpy op per token. Signature values
    are bit-identical to the scalar recipe (pinned by
    tests/test_dedup_similarity.py::TestSimhashEncoding): acc bit i comes
    from hash bit i and lands at signature bit 63-i, stored as the
    two's-complement int64 reinterpretation of the uint64 signature."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        per_doc = [set(x.lower().split()) for x in texts]
        vocab: dict[str, int] = {}
        for toks in per_doc:
            for tok in toks:
                if tok not in vocab:
                    vocab[tok] = len(vocab)
        n_docs = len(texts)
        sig_u = np.zeros(n_docs, dtype=np.uint64)
        if vocab:
            hvals = np.fromiter(
                (_stable_hash64(tok) for tok in vocab), dtype=np.uint64, count=len(vocab)
            )
            counts = np.array([len(s) for s in per_doc], dtype=np.int64)
            idx = np.fromiter(
                (vocab[tok] for toks in per_doc for tok in toks),
                dtype=np.int64,
                count=int(counts.sum()),
            )
            weights = np.uint64(1) << (np.uint64(63) - np.arange(64, dtype=np.uint64))
            # acc_i = (+1 per set bit) + (-1 per clear bit) = 2*bitsum_i - n,
            # so sig bit 63-i is set iff 2*bitsum_i > n. bitsum WITHOUT any
            # (n_tokens, 64) temp (reduceat/cumsum over that were 3-6 s per
            # M tokens on this box): per hash BYTE position, bincount a
            # (doc, byte_value) composite key, then fold the (n_docs, 256)
            # histogram through a 256x8 bit LUT with one small matmul —
            # 8 bincounts over n_tokens + 8 tiny matmuls total.
            doc_of_token = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            byte_cols = hvals.view(np.uint8).reshape(-1, 8)[idx]  # (n_tok, 8)
            lut = np.unpackbits(
                np.arange(256, dtype=np.uint8)[:, None], axis=1, bitorder="little"
            ).astype(np.int64)  # (256, 8): column j == (v >> j) & 1
            bitsum = np.empty((n_docs, 64), dtype=np.int64)
            base = doc_of_token * 256
            for bpos in range(8):  # little-endian: byte bpos holds bits 8b..8b+7
                hist = np.bincount(
                    base + byte_cols[:, bpos], minlength=n_docs * 256
                ).reshape(n_docs, 256)
                bitsum[:, 8 * bpos : 8 * bpos + 8] = hist @ lut
            pos = 2 * bitsum > counts[:, None]
            sig_u = (pos.astype(np.uint64) * weights[None, :]).sum(axis=1)
        cols = {
            "doc_id": t.column("doc_id"),
            "simhash": pa.array(sig_u.view(np.int64), pa.int64()),
        }
        for i in range(4):
            band = ((sig_u >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(np.int32)
            cols[f"band{i}"] = pa.array(band, pa.int32())
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup pairs via hamming-band bucketing + in-bucket verify.

    The 64-bit signature is cut into 4 disjoint 16-bit bands; by pigeonhole
    any pair at hamming distance ≤ 3 agrees on at least one band, so the
    band-bucket groupby is EXACT for max_hamming ≤ 3 (and a recall-traded
    approximation above). Same one-shuffle shape as the MinHash path:
    explode to (band_idx, band_val) rows, ONE groupby, verify popcount of
    XOR inside the bucket, dedup verified pairs across bands."""
    if max_hamming > 3:
        import warnings

        warnings.warn("4x16-bit banding only guarantees recall for hamming <= 3")
    sigs = simhash_signatures(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "bi": pa.array(np.repeat(np.arange(4, dtype=np.int32), n)),
                "bv": pa.array(np.concatenate([t.column(f"band{i}").to_numpy() for i in range(4)]).astype(np.int32)),
                "doc_id": pa.array(np.tile(t.column("doc_id").to_numpy(), 4), pa.int64()),
                "simhash": pa.array(np.tile(t.column("simhash").to_numpy(), 4), pa.int64()),
            }
        )

    ex = sigs.map_batches(explode, batch_format="pyarrow")

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a_l: list[int] = []
        b_l: list[int] = []
        h_l: list[int] = []
        for _, g in df.groupby(["bi", "bv"], sort=False):
            if len(g) < 2:
                continue
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            sig = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
            for i in range(len(ids)):
                x = np.bitwise_xor(sig[i], sig[i + 1 :])
                ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
                keep = np.nonzero(ham <= max_hamming)[0]
                for k in keep:
                    a_l.append(int(ids[i]))
                    b_l.append(int(ids[i + 1 + k]))
                    h_l.append(int(ham[k]))
        return pd.DataFrame(
            {
                "a": pd.array(a_l, dtype="int64"),
                "b": pd.array(b_l, dtype="int64"),
                "hamming": pd.array(h_l, dtype="int32"),
            }
        )

    cand = bucketed_group_agg(ex, ["bi", "bv"], verify_bucket, n_buckets=64)
    out = bucketed_group_agg(
        cand, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"]), n_buckets=32
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "a": pd.array([], dtype="int64"),
                "b": pd.array([], dtype="int64"),
                "hamming": pd.array([], dtype="int32"),
            }
        )
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def ngram_jaccard_pairs(
    sf_dir: str, seed: int = 42, jaccard_threshold: float = 0.8, k: int = 5
) -> pd.DataFrame:
    """Character-n-gram Jaccard near-dup pairs: the same banded-LSH +
    in-bucket exact-verify machinery as the word-shingle path, over char
    5-gram shingles — finer-grained, robust to word-boundary edits."""
    return minhash_lsh_pairs(sf_dir, seed, jaccard_threshold, shingle="char")


def jaccard_pairs_exact(
    sf_dir: str, k: int = 5, threshold: float = 0.5
) -> "ray.data.Dataset":
    """EXACT set-similarity join: every document pair whose k-token-shingle
    Jaccard is ≥ ``threshold`` — no banding, no recall caveat. This is the
    SQL-checkable anchor of the near-dup family (the minhash/simhash paths
    are probabilistic and stay rows-only); at the fixture it returns exactly
    the planted near-dups the LSH paths find.

    Shape: the textbook inverted-index similarity join. Per batch, DISTINCT
    (shingle, doc, doc_shingle_count) rows — exact because a doc never spans
    batches — ride ONE bucketed exchange on the shingle; each bucket's
    pandas self-merge emits (doc_a, doc_b) intersection partials (set sizes
    carried on the rows, so there is no sizes broadcast and no second
    corpus pass); a second, pair-keyed exchange sums intersections and
    scores jac = i / (sz_a + sz_b − i). The threshold compares the
    UNROUNDED ratio (an exact IEEE division of two ints — bit-identical in
    DuckDB), output rounds to 4dp.

    Skew: a shingle present in d docs emits d·(d−1)/2 pair rows. Rare-template
    corpora are fine (the fixture's max df per shingle is small); at corpus
    scale, ubiquitous boilerplate shingles must be df-capped upstream (drop
    shingles with df > cap — standard in ppjoin-style systems; the capped
    variant is a one-line filter on the first exchange's groups but is no
    longer exact, so it is not the default here)."""
    from .textstats import _shingle_frame

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sh": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "sz": pa.array([], pa.int64()),
            }
        )
        rows, sh = _shingle_frame(t, k)
        if not len(rows):
            return empty
        d = pd.DataFrame(
            {"sh": sh.to_numpy(), "doc_id": t.column("doc_id").to_numpy()[rows]}
        ).drop_duplicates()
        d["sz"] = d.groupby("doc_id")["sh"].transform("size").astype("int64")
        return pa.Table.from_pandas(d, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="sh")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if m.empty:
            return pd.DataFrame(
                {
                    "doc_a": pd.array([], dtype="int64"),
                    "doc_b": pd.array([], dtype="int64"),
                    "sz_a": pd.array([], dtype="int64"),
                    "sz_b": pd.array([], dtype="int64"),
                    "i": pd.array([], dtype="int64"),
                }
            )
        g = (
            m.groupby(["doc_id_x", "doc_id_y", "sz_x", "sz_y"], as_index=False)
            .size()
            .rename(
                columns={
                    "doc_id_x": "doc_a",
                    "doc_id_y": "doc_b",
                    "sz_x": "sz_a",
                    "sz_y": "sz_b",
                    "size": "i",
                }
            )
        )
        return g.astype({"doc_a": "int64", "doc_b": "int64", "sz_a": "int64", "sz_b": "int64", "i": "int64"})

    pair_parts = bucketed_group_agg(parts, ["sh"], pair_partial, n_buckets=32)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            i=("i", "sum"), sz_a=("sz_a", "first"), sz_b=("sz_b", "first")
        )
        union = (g["sz_a"] + g["sz_b"] - g["i"]).to_numpy(dtype=np.float64)
        jac = g["i"].to_numpy(dtype=np.float64) / union
        g["jaccard"] = round_away(jac, 4)
        g = g[jac >= threshold]
        return g[["doc_a", "doc_b", "jaccard"]]

    return bucketed_group_agg(pair_parts, ["doc_a", "doc_b"], final, n_buckets=16)


def q72_dedup_survivors(sf_dir: str, k: int = 5, threshold: float = 0.5) -> "ray.data.Dataset":
    """Near-dup REMOVAL end-to-end, SQL-checked: exact Jaccard pair edges
    (``jaccard_pairs_exact``) → distributed min-label connected components
    (pipelines/graph.py) → keep each component's minimum doc_id plus every
    unclustered document. The oracle recomputes the clusters with a
    recursive CTE (transitive closure over the same edge set), so the WHOLE
    removal path — shingle → pair → cluster → surviving corpus — is
    value-checked against SQL, not just pinned to an in-process reference.

    The drop set (clustered non-representatives) is bounded by the
    duplicate count, not the corpus: it broadcasts via one ``ray.put`` and
    the survivors emerge from one shuffle-free anti-join scan. A corpus
    whose duplicate set outgrew broadcast would use the bucketed anti-join
    (q22's shape) instead."""
    import ray

    from .common import get_broadcast, rename_cols
    from .graph import connected_components_minlabel

    import os as _os

    from ..state.manifest import content_signature

    pairs = rename_cols(jaccard_pairs_exact(sf_dir, k, threshold), {"doc_a": "a", "doc_b": "b"})
    in_sig = content_signature(_os.path.join(sf_dir, "documents.parquet"))
    labels = connected_components_minlabel(
        pairs, n_buckets=16, fingerprint=f"jacx|{k}|{threshold}|in={in_sig}"
    ).to_pandas()
    if labels.empty:
        drop = np.array([], dtype=np.int64)
    else:
        drop = labels.loc[labels["doc_id"] != labels["cluster_rep"], "doc_id"].to_numpy(
            dtype=np.int64
        )
    ref = ray.put(pd.Index(drop))

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        keep = ~pd.Series(t.column("doc_id").to_numpy()).isin(get_broadcast(ref)).to_numpy()
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def q130_leakage_free_split(sf_dir: str, train_fraction: float = 0.8) -> "ray.data.Dataset":
    """Dedup-aware train/val split: every member of an exact-duplicate
    cluster lands in the SAME split, so no document can appear in train
    while its copy sits in val — the train/test-contamination guard run
    before any LM split (labeling.prepare_labeled's per-sentence hash
    split has exactly this leakage under duplicated sentences; this is
    the corpus-level fix).

    Shape: q11's exact-dup grouping carried one step further — docs ride
    ONE text-bucket shuffle, each text group picks cluster_rep =
    min(doc_id), and the split decision hashes the REP (md5 hex compared
    against the train_fraction prefix constant: lowercase hex is
    ASCII-ordered by value, so `hex < 'cc…c'` ⟺ fraction < 0.8 exactly —
    the same decision DuckDB's md5() makes, which keeps the whole op
    SQL-checkable). Emits one row per document; nothing is driver-side."""
    frac_hex = format(int(train_fraction * 16**8), "08x") + "0" * 24

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tag(t: pa.Table) -> pa.Table:
        # group by content hash (not raw text) so the shuffle ships 64-hex
        # keys, not document bodies; sha256 collisions are out of model
        df = pd.DataFrame(
            {
                "h": [hashlib.sha256(x.encode("utf-8")).hexdigest() for x in t.column("text").to_pylist()],
                "doc_id": t.column("doc_id").to_numpy(),
            }
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rep = df.groupby("h")["doc_id"].transform("min")
        split = [
            "train" if hashlib.md5(str(int(r)).encode("ascii")).hexdigest() < frac_hex else "val"
            for r in rep
        ]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "cluster_rep": rep.to_numpy(),
                "split": split,
            }
        )

    return bucketed_group_agg(ds.map_batches(tag, batch_format="pyarrow"), ["h"], final, n_buckets=32)


def q192_crosssource_dup_matrix(
    sf_dir: str, k: int = 5, threshold: float = 0.5
) -> pd.DataFrame:
    """Cross-source duplication matrix: for every (source, source) pair,
    how many exact-Jaccard near-dup pairs (q71's join, same k/threshold)
    straddle them — the contamination readout that tells you WHICH feeds
    copy from each other before any is trusted as 'independent'. The
    (small) verified-pair stream meets the (doc_id, source) projection in
    TWO bucketed joins (the doc→source map is corpus-sized, so it is never
    broadcast); the unordered matrix collapses via per-batch
    (lo, hi, count, max-jaccard) partials — sources²-bounded. max is
    order-insensitive and rounding is monotone, so max(round(j,4)) on the
    engine side equals round(max(j),4) in the oracle."""
    import numpy as np

    from .common import bucketed_join, read_table

    pairs = jaccard_pairs_exact(sf_dir, k=k, threshold=threshold)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def ren(mapping):
        # Dataset.rename_columns assumes Arrow blocks; the pair stream's
        # final stage emits pandas blocks, so rename inside map_batches
        return lambda df: df.rename(columns=mapping)

    j1 = bucketed_join(
        pairs.map_batches(ren({"doc_a": "doc_id"}), batch_format="pandas"),
        docs,
        on="doc_id",
        n_buckets=16,
    ).map_batches(
        ren({"doc_id": "doc_a", "source": "source_a", "doc_b": "doc_id"}),
        batch_format="pandas",
    )
    j2 = bucketed_join(j1, docs, on="doc_id", n_buckets=16).map_batches(
        ren({"doc_id": "doc_b", "source": "source_b"}), batch_format="pandas"
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        a = df["source_a"].to_numpy(dtype=object)
        b = df["source_b"].to_numpy(dtype=object)
        lo = np.where(a <= b, a, b)
        hi = np.where(a <= b, b, a)
        d = pd.DataFrame({"source_a": lo, "source_b": hi, "jaccard": df["jaccard"]})
        return d.groupby(["source_a", "source_b"], as_index=False).agg(
            n_pairs=("jaccard", "size"), max_jaccard=("jaccard", "max")
        )

    merged = (
        j2.map_batches(partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["source_a", "source_b"], as_index=False)
        .agg(n_pairs=("n_pairs", "sum"), max_jaccard=("max_jaccard", "max"))
    )
    return merged.astype({"n_pairs": "int64"})


def q194_cluster_size_hist(
    sf_dir: str, k: int = 5, threshold: float = 0.5
) -> pd.DataFrame:
    """Near-dup cluster-size histogram off the EXACT pair set: the shape
    of the duplication problem (many doubletons = mirror noise; a few huge
    components = template families needing df-caps upstream). Exact pairs
    (q71) → distributed min-label connected components (no driver
    union-find) → per-rep sizes → (cluster_size, n_clusters) — every
    reduction is component-bounded, and the oracle reproduces the closure
    with q72's recursive CTE. Singleton docs (no edges) are not clusters
    and do not appear."""
    from .graph import connected_components_minlabel

    pairs = jaccard_pairs_exact(sf_dir, k=k, threshold=threshold)
    labels = connected_components_minlabel(
        pairs.map_batches(
            lambda df: df.rename(columns={"doc_a": "a", "doc_b": "b"})[["a", "b"]],
            batch_format="pandas",
        ),
        n_buckets=16,
    ).to_pandas()
    if labels.empty:
        return pd.DataFrame(
            {
                "cluster_size": pd.array([], dtype="int64"),
                "n_clusters": pd.array([], dtype="int64"),
            }
        )
    sizes = labels.groupby("cluster_rep", as_index=False).size()
    out = (
        sizes.groupby("size", as_index=False)
        .agg(n_clusters=("size", "size"))
        .rename(columns={"size": "cluster_size"})
    )
    return out.astype({"cluster_size": "int64", "n_clusters": "int64"})
