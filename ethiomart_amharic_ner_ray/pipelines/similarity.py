"""Similarity search over the embeddings table (list<float> column).

  q16  brute-force cosine top-k: broadcast query vector, numpy matmul per
       batch in float64, per-batch top-k then tiny final — the correctness
       baseline (SQL-checkable via DuckDB list_cosine_similarity).
  ann_lsh  random-hyperplane LSH bucketing: the scale path — queries only
       scan their own bucket(s). Deterministic seeded planes.

Both avoid a global sort: candidates are reduced per batch before any
driver-side materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .common import bucketed_group_agg, read_table, round_away, stable_hash64


def _embedding_matrix(t: pa.Table) -> np.ndarray:
    col = t.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _query_vector(sf_dir: str, query_id: int) -> np.ndarray:
    import pyarrow.parquet as pq
    import os

    # predicate pushdown: only row groups whose stats admit vec_id survive
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", query_id)],
    )
    return np.asarray(t.column("embedding").to_pylist()[0], dtype=np.float64)


def q16_knn_cosine(sf_dir: str, query_id: int = 0, k: int = 10) -> pd.DataFrame:
    """Brute-force cosine top-k vs the embedding of ``query_id``.

    float64 end-to-end with sequential per-vector accumulation order matching
    the oracle's CAST(... AS DOUBLE[]) list_cosine_similarity; rounded to 4.
    Tie-break on vec_id ascending."""
    q = _query_vector(sf_dir, query_id)
    qn = q / np.linalg.norm(q)
    ref = ray.put(qn)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    class TopK:
        def __init__(self):
            self._q = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _embedding_matrix(t)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            cos = (m @ self._q) / norms
            df = pd.DataFrame({"vec_id": t.column("vec_id").to_numpy(), "cos_sim": round_away(cos, 4)})
            df = df.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
            return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    cand = ds.map_batches(TopK, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)).to_pandas()
    return (
        cand.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
    )


def _chunk_pair_key(i: int, j: int, n_chunks: int) -> int:
    lo, hi = (i, j) if i <= j else (j, i)
    return lo * n_chunks + hi


def embedding_allpairs(
    ds: "ray.data.Dataset",
    threshold: float,
    n_chunks: int = 8,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact all-pairs cosine ≥ threshold as a bucketed chunk-pair self-join
    — the distributed exact path (no driver-side read, no full-matrix
    broadcast; round-1 verdict finding #1).

    Shape: assign each vector to chunk c = vec_id mod C; replicate each row
    to the C unordered chunk-pairs (c, o); ONE groupby on the pair key; each
    group holds exactly two chunks (≈2N/C rows) and emits its cross/triangle
    pairs with numpy. Shuffle volume is N×C rows; per-task memory and
    compute are (N/C)² — both chosen by C independently of N, so the job
    scales out by raising C with the cluster. Exact all-pairs is O(N²)
    compute by definition; for the near-linear high-threshold regime use
    embedding_neardup_lsh instead."""

    def expand(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        chunks = (ids % n_chunks).astype(np.int64)
        n = len(ids)
        # each row → its C unordered chunk-pair keys, fully vectorized
        idx = np.tile(np.arange(n), n_chunks)
        c_rep = chunks[idx]
        o_rep = np.repeat(np.arange(n_chunks, dtype=np.int64), n)
        lo = np.minimum(c_rep, o_rep)
        hi = np.maximum(c_rep, o_rep)
        return pa.table(
            {
                "pk": pa.array(lo * n_chunks + hi, pa.int64()),
                "vec_id": pa.array(ids[idx], pa.int64()),
                "chunk": pa.array(c_rep, pa.int64()),
                "embedding": emb.take(pa.array(idx)),
            }
        )

    EMPTY = pd.DataFrame(
        {
            "a": pd.array([], dtype="int64"),
            "b": pd.array([], dtype="int64"),
            "cos_sim": pd.array([], dtype="float64"),
        }
    )

    def norm_mat(part: pd.DataFrame) -> np.ndarray:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in part["embedding"]])
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    def one_pair(pk: int, df: pd.DataFrame) -> pd.DataFrame:
        ci, cj = pk // n_chunks, pk % n_chunks
        left = df[df["chunk"] == ci]
        right = df[df["chunk"] == cj]
        if left.empty or right.empty:
            return EMPTY
        lm, rm = norm_mat(left), norm_mat(right)
        cos = lm @ rm.T
        lids = left["vec_id"].to_numpy()
        rids = right["vec_id"].to_numpy()
        ii, jj = np.where(cos >= threshold)
        a = np.minimum(lids[ii], rids[jj])
        b = np.maximum(lids[ii], rids[jj])
        keep = a < b  # drops self-pairs
        if ci == cj:
            # triangle group: each unordered pair shows up as (i,j) and (j,i)
            keep &= lids[ii] < rids[jj]
        return pd.DataFrame(
            {
                "a": pd.array(a[keep], dtype="int64"),
                "b": pd.array(b[keep], dtype="int64"),
                "cos_sim": pd.array(cos[ii[keep], jj[keep]], dtype="float64"),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [one_pair(int(pk), g) for pk, g in df.groupby("pk", sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else EMPTY

    expanded = ds.map_batches(expand, batch_format="pyarrow", batch_size=4096)
    return bucketed_group_agg(expanded, ["pk"], per_bucket, n_buckets=n_buckets)


def q25_embedding_neardup(sf_dir: str, threshold: float = 0.3) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (the embedding analogue of
    MinHash dedup): all vector pairs with cosine ≥ threshold, computed by
    the distributed chunk-pair self-join above. SQL-checkable at test scale
    via DuckDB list_cosine_similarity; float64 end-to-end so both sides
    round identically."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = embedding_allpairs(ds, threshold).to_pandas()
    out["cos_sim"] = round_away(out["cos_sim"].to_numpy(), 4)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def embedding_neardup_lsh(
    sf_dir: str,
    threshold: float = 0.3,
    rows_per_band: int = 2,
    n_bands: int = 64,
    seed: int = 42,
) -> pd.DataFrame:
    """Near-dup pairs via banded random-hyperplane LSH + within-bucket
    cosine verification — the near-linear scale path for the embedding
    near-dup family (exact counterpart: ``embedding_allpairs``/q25).

    Shape (mirrors dedup.py's MinHash banding): per-batch signature bits →
    one (band, band_key) groupby; each bucket verifies its own all-pairs
    cosine, so embeddings ride the ONE banding shuffle and pairs are
    deduped across bands by a second, tiny (a, b) groupby. Nothing touches
    the driver until the final collect.

    Recall/pruning knob: a pair at cosine c collides per hyperplane with
    p = 1 - arccos(c)/π, per band p^r, overall 1-(1-p^r)^b. The defaults
    (r=2, b=64) are tuned for LOW thresholds (0.3 → miss ≈ 6e-13, i.e.
    exact in practice, verified against q25 in tests) at the cost of weak
    pruning — low-threshold all-pairs is intrinsically dense. For true
    near-dup thresholds (≥0.8) use r=8, b=16: strong pruning, recall
    1-(1-0.52)^16 ≈ 0.99997 at c=0.9."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n_planes = rows_per_band * n_bands

    class BandSigner:
        def __init__(self):
            self._planes = None  # lazily sized to the embedding dim

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _embedding_matrix(t)
            if self._planes is None:
                rng = np.random.RandomState(seed)
                self._planes = rng.randn(n_planes, m.shape[1])
            bits = (m @ self._planes.T) > 0  # (n, planes)
            # pack each band's r bits into an int key, vectorized
            weights = (1 << np.arange(rows_per_band, dtype=np.int64))[::-1]
            keys = bits.reshape(len(m), n_bands, rows_per_band) @ weights
            n = len(m)
            emb = t.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            idx = np.tile(np.arange(n), n_bands)
            return pa.table(
                {
                    "band": pa.array(np.repeat(np.arange(n_bands, dtype=np.int64), n)),
                    "band_key": pa.array(keys.T.reshape(-1).astype(np.int64)),
                    "vec_id": pa.array(t.column("vec_id").to_numpy()[idx], pa.int64()),
                    "embedding": emb.take(pa.array(idx)),
                }
            )

    EMPTY = pd.DataFrame(
        {
            "a": pd.array([], dtype="int64"),
            "b": pd.array([], dtype="int64"),
            "cos_sim": pd.array([], dtype="float64"),
        }
    )

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby(["band", "band_key"], sort=False):
            if len(g) < 2:
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mn = m / norms
            cos = mn @ mn.T
            ids = g["vec_id"].to_numpy()
            ii, jj = np.where(cos >= threshold)
            keep = ids[ii] < ids[jj]
            outs.append(
                pd.DataFrame(
                    {
                        "a": pd.array(np.minimum(ids[ii], ids[jj])[keep], dtype="int64"),
                        "b": pd.array(np.maximum(ids[ii], ids[jj])[keep], dtype="int64"),
                        "cos_sim": pd.array(cos[ii[keep], jj[keep]], dtype="float64"),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else EMPTY

    sigs = ds.map_batches(BandSigner, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8))
    cand = bucketed_group_agg(sigs, ["band", "band_key"], verify_bucket, n_buckets=64)
    deduped = bucketed_group_agg(
        cand, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"]), n_buckets=32
    )
    out = deduped.to_pandas()
    out["cos_sim"] = round_away(out["cos_sim"].to_numpy(), 4)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def ann_lsh_topk(sf_dir: str, query_id: int = 0, k: int = 10, n_planes: int = 8, seed: int = 42) -> pd.DataFrame:
    """LSH-bucketed approximate top-k: sign-of-projection bucketing on
    ``n_planes`` seeded random hyperplanes; only the query's bucket (and, if
    thin, hamming-1 neighbors) is scanned. At scale the buckets are the
    partitioning key, so a query touches 1/2^n_planes of the data."""
    rng = np.random.RandomState(seed)
    q = _query_vector(sf_dir, query_id)
    planes = rng.randn(n_planes, q.shape[0])
    qsig = int("".join("1" if v > 0 else "0" for v in planes @ q), 2)
    target = {qsig} | {qsig ^ (1 << i) for i in range(n_planes)}  # hamming ≤ 1
    qn = q / np.linalg.norm(q)
    ref = ray.put((qn, planes, frozenset(target)))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    class BucketScan:
        def __init__(self):
            self._q, self._planes, self._target = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _embedding_matrix(t)
            sigs = ((m @ self._planes.T) > 0).astype(np.uint8)
            sig_ints = np.packbits(sigs, axis=1, bitorder="big")
            # collapse to int (n_planes ≤ 8 → one byte)
            keys = sig_ints[:, 0] >> (8 - self._planes.shape[0])
            mask = np.isin(keys, list(self._target))
            if not mask.any():
                return pa.table({"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())})
            sub = m[mask]
            norms = np.linalg.norm(sub, axis=1)
            norms[norms == 0] = 1.0
            cos = (sub @ self._q) / norms
            df = pd.DataFrame({"vec_id": t.column("vec_id").to_numpy()[mask], "cos_sim": round_away(cos, 4)})
            df = df.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
            return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    cand = ds.map_batches(BucketScan, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)).to_pandas()
    return (
        cand.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
    )


def knn_self_join(sf_dir: str, k: int = 5, limit_queries: int = 50) -> pd.DataFrame:
    """Batched k-NN for the first ``limit_queries`` vectors: broadcast the
    query matrix once, matmul per batch, per-batch top-k per query, final
    reduce. The batched-model-inference shape of SURVEY.md T2 applied to
    retrieval (rows-only check)."""
    import os

    import pyarrow.parquet as pq

    # stream row groups and stop as soon as the query slice is filled —
    # never load the whole table for a handful of query rows
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    batches = []
    have = 0
    for rb in pf.iter_batches(columns=["vec_id", "embedding"]):
        batches.append(rb)
        have += rb.num_rows
        if have >= limit_queries:
            break
    qt = pa.Table.from_batches(batches).slice(0, limit_queries)
    qm = _embedding_matrix(qt)
    qnorm = np.linalg.norm(qm, axis=1, keepdims=True)
    qnorm[qnorm == 0] = 1.0
    qids = qt.column("vec_id").to_numpy()
    ref = ray.put((qids, qm / qnorm))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    class Scan:
        def __init__(self):
            self._qids, self._qm = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _embedding_matrix(t)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            cos = (m / norms[:, None]) @ self._qm.T  # (batch, nq)
            ids = t.column("vec_id").to_numpy()
            rows = []
            top = min(k + 1, cos.shape[0])
            for j, qid in enumerate(self._qids):
                order = np.argpartition(-cos[:, j], top - 1)[:top]
                for i in order:
                    if ids[i] != qid:
                        rows.append((qid, ids[i], round_away(float(cos[i, j]), 4)))
            return pa.table(
                {
                    "query_id": pa.array([r[0] for r in rows], pa.int64()),
                    "vec_id": pa.array([r[1] for r in rows], pa.int64()),
                    "cos_sim": pa.array([r[2] for r in rows], pa.float64()),
                }
            )

    cand = ds.map_batches(Scan, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)).to_pandas()
    out = (
        cand.sort_values(["query_id", "cos_sim", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def kmeans_embeddings(
    sf_dir: str, k: int = 16, iters: int = 10, seed: int = 42
) -> tuple[np.ndarray, "ray.data.Dataset"]:
    """Distributed spherical k-means over the embedding column (Lloyd's):
    per iteration, centroids are broadcast once (ray.put) and every batch
    emits k partial rows (count + vector sum) — the shuffle-free
    broadcast/partial-reduce shape; the driver only ever reduces k×dim
    floats. Deterministic: init = the k lowest-vec_id vectors (predicate
    pushdown read), ties in assignment break to the lowest cluster id.

    Returns (centroids, assignments Dataset (vec_id, list_id))."""
    import os

    import pyarrow.parquet as pq

    init = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    )
    c = _embedding_matrix(init.sort_by("vec_id"))
    c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    for _ in range(iters):
        ref = ray.put(c)
        dim = c.shape[1]

        def partial(t: pa.Table, ref=ref, k=k, dim=dim) -> pa.Table:
            cc = ray.get(ref)
            m = _embedding_matrix(t)
            n = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            a = np.argmax((m / n) @ cc.T, axis=1)  # argmax → lowest index wins ties
            sums = np.zeros((k, dim))
            np.add.at(sums, a, m / n)
            counts = np.bincount(a, minlength=k)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(counts.astype(np.int64)),
                    "vsum": pa.array(sums.tolist(), pa.list_(pa.float64(), dim)),
                }
            )

        agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
        counts = np.zeros(k)
        sums = np.zeros_like(c)
        for cl, n_, vs in zip(agg["cluster"], agg["n"], agg["vsum"]):
            counts[cl] += n_
            sums[cl] += np.asarray(vs)
        newc = c.copy()
        nz = counts > 0
        newc[nz] = sums[nz] / counts[nz, None]
        newc = newc / np.maximum(np.linalg.norm(newc, axis=1, keepdims=True), 1e-12)
        if np.allclose(newc, c, atol=1e-12):
            c = newc
            break
        c = newc

    ref = ray.put(c)

    def assign(t: pa.Table) -> pa.Table:
        cc = ray.get(ref)
        m = _embedding_matrix(t)
        n = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        a = np.argmax((m / n) @ cc.T, axis=1)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "list_id": pa.array(a.astype(np.int64)),
            }
        )

    return c, ds.map_batches(assign, batch_format="pyarrow")


def ann_ivf_topk(
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF approximate top-k: spherical-k-means coarse quantizer; a query
    scans only its ``nprobe`` nearest inverted lists. With
    nprobe == n_lists this degrades to exact brute force (the property the
    conformance test pins). At cluster scale the assignment pass writes
    list-partitioned Parquet once and queries read only their probed
    partitions — the same partition-pruning story as ann_lsh_topk."""
    centroids, _ = kmeans_embeddings(sf_dir, k=n_lists, iters=iters, seed=seed)
    q = _query_vector(sf_dir, query_id)
    qn = q / np.maximum(np.linalg.norm(q), 1e-12)
    probe = set(np.argsort(-(centroids @ qn))[:nprobe].tolist())
    ref = ray.put((qn, centroids, frozenset(probe)))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    class ListScan:
        def __init__(self):
            self._q, self._c, self._probe = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _embedding_matrix(t)
            n = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            mn = m / n
            lists = np.argmax(mn @ self._c.T, axis=1)
            mask = np.isin(lists, list(self._probe))
            if not mask.any():
                return pa.table({"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())})
            cos = mn[mask] @ self._q
            df = pd.DataFrame(
                {"vec_id": t.column("vec_id").to_numpy()[mask], "cos_sim": round_away(cos, 4)}
            )
            df = df.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
            return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    cand = ds.map_batches(ListScan, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)).to_pandas()
    return (
        cand.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
    )


def ivf_build_index(
    sf_dir: str,
    index_dir: str,
    n_lists: int = 16,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Materialize the IVF index as LIST-PARTITIONED Parquet — the cluster
    storage layout ann_ivf_topk's docstring promises: one hive partition
    per inverted list (``list_id=N/``), embeddings stored WITH their list
    assignment, centroids in a sidecar. Built once, queried many times;
    a query then touches only its nprobe partition directories — the
    pruning happens at the filesystem listing, before any byte is read.

    Write is streaming (assignment map_batches → write_parquet with
    partition_cols); nothing materializes on the driver but the k×dim
    centroid matrix."""
    import os

    import pyarrow.parquet as pq

    centroids, _ = kmeans_embeddings(sf_dir, k=n_lists, iters=iters, seed=seed)
    ref = ray.put(centroids)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def tag(t: pa.Table) -> pa.Table:
        from .common import get_broadcast

        cc = get_broadcast(ref)
        m = _embedding_matrix(t)
        n = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        a = np.argmax((m / n) @ cc.T, axis=1)
        return t.append_column("list_id", pa.array(a.astype(np.int64)))

    ds.map_batches(tag, batch_format="pyarrow", batch_size=4096).write_parquet(
        index_dir, partition_cols=["list_id"]
    )
    dim = centroids.shape[1]
    pq.write_table(
        pa.table(
            {
                "list_id": pa.array(np.arange(n_lists, dtype=np.int64)),
                "centroid": pa.array(centroids.tolist(), pa.list_(pa.float64(), dim)),
            }
        ),
        os.path.join(index_dir, "_centroids.parquet"),
    )
    return centroids


def ann_ivf_partitioned_topk(
    sf_dir: str,
    index_dir: str,
    query_id: int = 0,
    k: int = 10,
    nprobe: int = 4,
) -> pd.DataFrame:
    """IVF query against a prebuilt partition-pruned index
    (ivf_build_index): rank centroids from the sidecar, list ONLY the
    nprobe matching ``list_id=N/`` partition directories, and read just
    those files — the other partitions never leave storage. Inside the
    probed partitions it's the ordinary per-batch cosine top-k. With
    nprobe == n_lists this is exact brute force (pinned by test against
    q16)."""
    import glob
    import os

    import pyarrow.parquet as pq

    side = pq.read_table(os.path.join(index_dir, "_centroids.parquet"))
    centroids = np.asarray(side.column("centroid").to_pylist(), dtype=np.float64)
    q = _query_vector(sf_dir, query_id)
    qn = q / np.maximum(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ qn))[:nprobe].tolist()

    files: list[str] = []
    for lid in probe:
        files.extend(sorted(glob.glob(os.path.join(index_dir, f"list_id={lid}", "*.parquet"))))
    if not files:
        return pd.DataFrame({"vec_id": pd.array([], dtype="int64"), "cos_sim": []})

    ref = ray.put(qn)
    ds = ray.data.read_parquet(files, columns=["vec_id", "embedding"])

    def scan(t: pa.Table) -> pa.Table:
        from .common import get_broadcast

        qv = get_broadcast(ref)
        m = _embedding_matrix(t)
        n = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = (m / n) @ qv
        df = pd.DataFrame(
            {"vec_id": t.column("vec_id").to_numpy(), "cos_sim": round_away(cos, 4)}
        )
        df = df.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    cand = ds.map_batches(scan, batch_format="pyarrow", batch_size=4096).to_pandas()
    return (
        cand.sort_values(["cos_sim", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def _pairwise_levenshtein(A: list, B: list) -> "np.ndarray":
    """Exact edit-distance matrix for two small string chunks, vectorized
    across the PAIR axes: one (ma+1, mb+1, |A|, |B|) DP table whose inner
    cells are numpy mins over all pairs at once — O(ma·mb) vector ops total
    instead of a Python DP per pair. Memory is ma·mb·|A|·|B| int32 — the
    chunk size is the knob that bounds it (same discipline as the embedding
    chunk-pair join). Padding cells are computed but never read: the answer
    for pair (x, y) is D[len(A[x]), len(B[y]), x, y]."""
    nA, nB = len(A), len(B)
    la = np.array([len(s) for s in A], dtype=np.int32)
    lb = np.array([len(s) for s in B], dtype=np.int32)
    ma, mb = int(la.max(initial=0)), int(lb.max(initial=0))
    Ae = np.zeros((nA, ma), dtype=np.int32)
    for i, s in enumerate(A):
        Ae[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    Be = np.zeros((nB, mb), dtype=np.int32)
    for i, s in enumerate(B):
        Be[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    D = np.zeros((ma + 1, mb + 1, nA, nB), dtype=np.int32)
    D[:, 0] = np.arange(ma + 1, dtype=np.int32)[:, None, None]
    D[0, :] = np.arange(mb + 1, dtype=np.int32)[:, None, None]
    for i in range(1, ma + 1):
        for j in range(1, mb + 1):
            sub = D[i - 1, j - 1] + (Ae[:, i - 1][:, None] != Be[:, j - 1][None, :])
            D[i, j] = np.minimum(np.minimum(D[i - 1, j] + 1, D[i, j - 1] + 1), sub)
    return D[la[:, None], lb[None, :], np.arange(nA)[:, None], np.arange(nB)[None, :]]


def _distinct_names_ds(sf_dir: str) -> "ray.data.Dataset":
    """Two-phase distinct over part names: per-batch drop_duplicates →
    bucketed exact distinct (the vocabulary-shrink step shared by the
    fuzzy join and entity resolution)."""
    ds = read_table(sf_dir, "part", columns=["p_name"])

    def dpart(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return bucketed_group_agg(
        ds.map_batches(dpart, batch_format="pandas", batch_size=65536),
        ["p_name"],
        dpart,
        n_buckets=16,
    )


def _fuzzy_pairs_ds(
    names: "ray.data.Dataset", max_dist: int = 2, n_chunks: int = 4
) -> "ray.data.Dataset":
    """Distributed exact Levenshtein ≤ max_dist self-join over a distinct
    name Dataset → (name_a, name_b, dist) pair Dataset (name_a < name_b).
    See q85_fuzzy_name_pairs for the shape discussion."""

    def expand(t: pa.Table) -> pa.Table:
        vals = t.column("p_name").to_pandas()
        h = stable_hash64(vals)
        chunks = (h % np.uint64(n_chunks)).astype(np.int64)
        n = len(vals)
        idx = np.tile(np.arange(n), n_chunks)
        c_rep = chunks[idx]
        o_rep = np.repeat(np.arange(n_chunks, dtype=np.int64), n)
        lo = np.minimum(c_rep, o_rep)
        hi = np.maximum(c_rep, o_rep)
        return pa.table(
            {
                "pk": pa.array(lo * n_chunks + hi, pa.int64()),
                "p_name": pa.array(vals.to_numpy()[idx], pa.string()),
                "chunk": pa.array(c_rep, pa.int64()),
            }
        )

    EMPTY = pd.DataFrame(
        {
            "name_a": pd.Series([], dtype=object),
            "name_b": pd.Series([], dtype=object),
            "dist": pd.array([], dtype="int64"),
        }
    )

    def one_pair(pk: int, df: pd.DataFrame) -> pd.DataFrame:
        ci, cj = pk // n_chunks, pk % n_chunks
        A = df.loc[df["chunk"] == ci, "p_name"].tolist()
        B = df.loc[df["chunk"] == cj, "p_name"].tolist()
        if not A or not B:
            return EMPTY
        dist = _pairwise_levenshtein(A, B)
        ii, jj = np.where(dist <= max_dist)
        an = np.array(A, dtype=object)[ii]
        bn = np.array(B, dtype=object)[jj]
        swap = bn < an
        lo = np.where(swap, bn, an)
        hi = np.where(swap, an, bn)
        keep = lo < hi  # drops self-pairs
        if ci == cj:
            keep &= an < bn  # triangle group emits each unordered pair twice
        return pd.DataFrame(
            {
                "name_a": lo[keep],
                "name_b": hi[keep],
                "dist": dist[ii[keep], jj[keep]].astype("int64"),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [one_pair(int(pk), g) for pk, g in df.groupby("pk", sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else EMPTY

    expanded = names.map_batches(expand, batch_format="pyarrow")
    return bucketed_group_agg(expanded, ["pk"], per_bucket, n_buckets=16)


def q85_fuzzy_name_pairs(sf_dir: str, max_dist: int = 2, n_chunks: int = 4) -> pd.DataFrame:
    """Fuzzy string self-join (entity-resolution blocking's exact anchor):
    all DISTINCT part-name pairs within Levenshtein distance ``max_dist``.

    Shape: two-phase distinct shrinks the corpus to its name VOCABULARY
    (names repeat heavily — the same trick as BPE's word table), then the
    vocabulary rides the chunk-pair self-join of the embedding near-dup
    path (each name → its C unordered chunk pairs, ONE shuffle, per-task
    work (V/C)² pairs with a batch-vectorized DP). Exact by construction —
    no lossy blocking. At web-scale vocabularies the documented prunes are
    length bands inside the task (|len(a)−len(b)| ≤ d is necessary) and
    shared-q-gram blocking across tasks (count filtering — exact only when
    min_len − q + 1 > d·q)."""
    out = _fuzzy_pairs_ds(_distinct_names_ds(sf_dir), max_dist, n_chunks).to_pandas()
    return (
        out.sort_values(["name_a", "name_b"])
        .reset_index(drop=True)
        .astype({"dist": "int64"})
    )


def q87_group_centroids(sf_dir: str, n_groups: int = 4) -> "ray.data.Dataset":
    """Grouped vector centroid (the k-means M-step / class-prototype
    aggregate, standalone): per group, the element-wise mean of its
    embedding vectors, emitted LONG (group, dim, centroid) so the oracle
    compares scalars, not lists. Fully decomposable: each batch collapses
    to ≤ groups×dim partial-sum rows (one np.add.at scatter over the
    stacked matrix — no per-vector Python), the exchange never carries a
    raw vector, and the final divide runs on dimension-bounded rows. The
    same shape with k-means assignments as the group key is the
    `kmeans_assign` update step."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in emb.to_pylist()])
        g = (ids % n_groups).astype(np.int64)
        dim = m.shape[1]
        sums = np.zeros((n_groups, dim), dtype=np.float64)
        np.add.at(sums, g, m)
        counts = np.bincount(g, minlength=n_groups).astype(np.int64)
        present = np.flatnonzero(counts > 0)
        k = len(present)
        return pa.table(
            {
                "g": pa.array(np.repeat(present, dim)),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), k)),
                "p_sum": pa.array(sums[present].ravel()),
                "p_n": pa.array(np.repeat(counts[present], dim)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["g", "dim"], as_index=False).agg(s=("p_sum", "sum"), n=("p_n", "sum"))
        out["centroid"] = round_away(out["s"].to_numpy() / out["n"].to_numpy(), 4)
        out["n"] = out["n"].astype("int64")
        return out[["g", "dim", "centroid", "n"]]

    return bucketed_group_agg(parts, ["g", "dim"], final, n_buckets=16)


def er_canonical_names(sf_dir: str, max_dist: int = 2, n_chunks: int = 4) -> pd.DataFrame:
    """Entity resolution end-to-end (the dedup step for ENTITIES rather
    than documents): every distinct part name mapped to its cluster's
    canonical form, where clusters are connected components of the exact
    Levenshtein ≤ ``max_dist`` graph and the canonical form is the
    lexicographic minimum name of the component (singletons map to
    themselves). Composition of three scale-safe pieces, all distributed:
    the fuzzy chunk-pair self-join (q85), min-label connected components
    (graph.py — one bucketed join + one bucketed min-groupby per round),
    and two bucketed joins to translate ids back to names. Names ride the
    component machinery as deterministic stable_hash64 ids (the engine-wide
    key hash); a hash collision would merge two unrelated names — at
    ~2⁻⁶⁴·V² for a V-name vocabulary that is negligible even at 10⁹
    names, and the canonical-min is recomputed over NAMES so a collision
    can never corrupt unaffected clusters."""
    from .common import bucketed_join, rename_cols
    from .graph import connected_components_minlabel

    names = _distinct_names_ds(sf_dir)
    pairs = _fuzzy_pairs_ds(names, max_dist, n_chunks)

    def _h(vals: pd.Series) -> np.ndarray:
        return stable_hash64(vals).view(np.int64)

    def to_edges(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.table(
            {"a": pa.array(_h(df["name_a"]), pa.int64()), "b": pa.array(_h(df["name_b"]), pa.int64())}
        )

    labels = connected_components_minlabel(
        pairs.map_batches(to_edges, batch_format="pyarrow"), n_buckets=16
    )  # (doc_id=node hash, cluster_rep) — only nodes with ≥1 edge

    def to_nodes(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.table(
            {"p_name": pa.array(df["p_name"], pa.string()), "node": pa.array(_h(df["p_name"]), pa.int64())}
        )

    nodes = names.map_batches(to_nodes, batch_format="pyarrow")
    # LEFT-join semantics for singletons: union identity labels and take
    # the min label per node (identity loses exactly when CC assigned a
    # smaller rep; isolated names keep themselves)
    ident = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"), "label": t.column("node")}),
        batch_format="pyarrow",
    )
    cc = rename_cols(labels, {"doc_id": "node", "cluster_rep": "label"})

    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["label"].min()

    full = bucketed_group_agg(ident.union(cc), ["node"], min_label, n_buckets=16)
    named = bucketed_join(nodes, full, on="node", n_buckets=16)

    def min_name(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("label", as_index=False).agg(canon_name=("p_name", "min"))

    canon = bucketed_group_agg(
        named.select_columns(["label", "p_name"]), ["label"], min_name, n_buckets=16
    )
    out = bucketed_join(
        named.select_columns(["p_name", "label"]), canon, on="label", n_buckets=16
    ).to_pandas()
    return (
        out[["p_name", "canon_name"]]
        .rename(columns={"p_name": "name"})
        .sort_values("name")
        .reset_index(drop=True)
    )


def q90_embedding_covariance(sf_dir: str) -> "ray.data.Dataset":
    """Distributed covariance matrix of the embedding column (the PCA /
    whitening / Mahalanobis prerequisite), emitted LONG (i, j, cov) over
    the upper triangle. Decomposable sufficient statistics: each batch
    collapses to one dim×dim Gram partial (ONE float64 matmul — no
    per-vector Python) plus column sums and a count, shipped as ≤
    dim·(dim+1)/2 rows per block; the exchange never carries a raw
    vector and the final combine runs on dimension-bounded rows. At 100 TB
    the cost is one streaming read + an O(blocks · dim²) reduce — the
    same shape as q39/q84's moment aggregation lifted to matrices."""
    ds = read_table(sf_dir, "embeddings", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = _embedding_matrix(t)
        n, dim = m.shape
        gram = m.T @ m
        s = m.sum(axis=0)
        iu, ju = np.triu_indices(dim)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "p_xy": pa.array(gram[iu, ju]),
                "p_x": pa.array(s[iu]),
                "p_y": pa.array(s[ju]),
                "p_n": pa.array(np.full(len(iu), n, dtype=np.int64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["i", "j"], as_index=False).agg(
            sxy=("p_xy", "sum"), sx=("p_x", "sum"), sy=("p_y", "sum"), n=("p_n", "sum")
        )
        cov = (g["sxy"] - g["sx"] * g["sy"] / g["n"]) / (g["n"] - 1)
        return pd.DataFrame(
            {
                "i": g["i"].astype("int64"),
                "j": g["j"].astype("int64"),
                "cov": round_away(cov.to_numpy(), 6),
            }
        )

    return bucketed_group_agg(partials, ["i", "j"], final, n_buckets=16)


def _cov_stats(sf_dir: str):
    """(mean, covariance, n) of the embedding column from ONE
    sufficient-statistic pass (full-precision version of q90's reduce: each
    batch ships one dim×dim Gram + a column sum + a count — model-sized
    partials, the driver math is dimension-bounded, never data-bounded).
    Shared fit for pca_project and mahalanobis_outliers."""
    ds = read_table(sf_dir, "embeddings", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = _embedding_matrix(t)
        n, dim = m.shape
        gram = (m.T @ m).reshape(-1)
        return pa.table(
            {
                "p_gram": pa.array([gram.tobytes()], pa.large_binary()),
                "p_sum": pa.array([m.sum(axis=0).tobytes()], pa.large_binary()),
                "p_n": pa.array([n], pa.int64()),
                "p_dim": pa.array([dim], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    dim = int(parts["p_dim"].iloc[0])
    n = int(parts["p_n"].sum())
    gram = np.zeros((dim, dim), dtype=np.float64)
    s = np.zeros(dim, dtype=np.float64)
    for g_blob, s_blob in zip(parts["p_gram"], parts["p_sum"]):
        gram += np.frombuffer(g_blob, dtype=np.float64).reshape(dim, dim)
        s += np.frombuffer(s_blob, dtype=np.float64)
    mean = s / n
    cov = (gram - np.outer(s, s) / n) / (n - 1)
    return mean, cov, n


def _pca_model(sf_dir: str, n_components: int):
    """Mean + top-k eigenvectors from _cov_stats' one-pass fit.
    Deterministic sign convention: each component is flipped so its
    largest-|·| coordinate is positive (eigh's sign is arbitrary; ties
    broken by lowest index, so reruns and reshardings agree)."""
    mean, cov, _ = _cov_stats(sf_dir)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T  # (k, dim)
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return mean, comps, w[order]


def pca_project(sf_dir: str, n_components: int = 2) -> "ray.data.Dataset":
    """Distributed PCA projection (the reference's embedding-visualization
    step — interpret.py's PCA→t-SNE→cluster pipeline at `interpret.py:535-703`
    — made engine-scale): fit on sufficient statistics (one pass, see
    _pca_model), then ONE broadcast re-scan projects every vector onto the
    top components — the model rides a single ray.put, each task is one
    (batch × dim) @ (dim × k) matmul. Rows-only query (eigendecomposition
    has no SQL form); pinned against an in-process numpy reference in
    tests/test_dedup_similarity.py."""
    import ray

    from .common import get_broadcast

    mean, comps, _ = _pca_model(sf_dir, n_components)
    ref = ray.put((mean, comps))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def project(t: pa.Table) -> pa.Table:
        mean_b, comps_b = get_broadcast(ref)
        m = _embedding_matrix(t)
        proj = (m - mean_b) @ comps_b.T
        cols = {"vec_id": t.column("vec_id").cast(pa.int64())}
        for c in range(proj.shape[1]):
            cols[f"pc{c + 1}"] = pa.array(round_away(proj[:, c], 6))
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow", batch_size=4096)


def _pq_train(
    sf_dir: str,
    centroids: np.ndarray,
    m_sub: int,
    n_codes: int,
    iters: int,
    seed: int,
) -> np.ndarray:
    """Train product-quantization codebooks over coarse-list RESIDUALS
    (classic IVF-PQ): split the residual into m_sub subspaces and k-means
    each with n_codes codewords. Same distributed shape as
    kmeans_embeddings: codebooks broadcast, every batch emits per-(subspace,
    code) partial sums + counts (m_sub × n_codes × sub_dim floats — model-
    sized), driver updates. The data pass never ships raw vectors anywhere;
    seeding picks deterministic rows via the vec_id order of the first
    batches (rerun-stable)."""
    import ray

    from .common import get_broadcast

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    dim = centroids.shape[1]
    assert dim % m_sub == 0, "m_sub must divide the embedding dim"
    sd = dim // m_sub

    # deterministic init: residuals of the n_codes vectors with smallest ids
    seed_rows = (
        ds.map_batches(
            lambda t: pa.table(
                {
                    "vec_id": t.column("vec_id"),
                    "embedding": t.column("embedding"),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("vec_id")
        .limit(n_codes)
        .to_pandas()
    )
    m0 = np.array(seed_rows["embedding"].tolist(), dtype=np.float64)
    m0 /= np.maximum(np.linalg.norm(m0, axis=1, keepdims=True), 1e-12)
    r0 = m0 - centroids[np.argmax(m0 @ centroids.T, axis=1)]
    books = np.stack([r0[:, j * sd : (j + 1) * sd] for j in range(m_sub)])  # (m_sub, n_codes, sd)

    cref = ray.put(centroids)
    for _ in range(iters):
        bref = ray.put(books)

        def partial(t: pa.Table) -> pa.Table:
            c = get_broadcast(cref)
            b = get_broadcast(bref)
            m = _embedding_matrix(t)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            r = m - c[np.argmax(m @ c.T, axis=1)]
            sums = np.zeros_like(b)  # (m_sub, n_codes, sd)
            cnts = np.zeros((m_sub, n_codes), dtype=np.int64)
            for j in range(m_sub):
                rj = r[:, j * sd : (j + 1) * sd]
                d = ((rj[:, None, :] - b[j][None, :, :]) ** 2).sum(axis=2)
                a = np.argmin(d, axis=1)
                np.add.at(sums[j], a, rj)
                cnts[j] += np.bincount(a, minlength=n_codes)
            return pa.table(
                {
                    "p_sums": pa.array([sums.tobytes()], pa.large_binary()),
                    "p_cnts": pa.array([cnts.tobytes()], pa.large_binary()),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).to_pandas()
        sums = np.zeros_like(books)
        cnts = np.zeros((m_sub, n_codes), dtype=np.int64)
        for sb, cb in zip(parts["p_sums"], parts["p_cnts"]):
            sums += np.frombuffer(sb, dtype=np.float64).reshape(books.shape)
            cnts += np.frombuffer(cb, dtype=np.int64).reshape(m_sub, n_codes)
        nz = cnts > 0
        for j in range(m_sub):
            books[j][nz[j]] = sums[j][nz[j]] / cnts[j][nz[j], None]
    return books


def ann_ivf_pq_topk(
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    m_sub: int = 8,
    n_codes: int = 16,
    iters: int = 5,
    rerank: int = 50,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF-PQ approximate top-k — the memory-scale rung above ann_ivf_topk:
    vectors in probed lists are scored from their m_sub uint8 PQ codes via
    an ADC lookup table (m_sub × n_codes dot products per query, then one
    fancy-index sum per candidate — no full-dim math on the scan), and only
    the ``rerank`` best ADC candidates get exact cosine. At cluster scale
    the codes (m_sub bytes/vector vs 8·dim) live in the list-partitioned
    index (ivf_build_index layout) and the raw vectors are fetched only for
    the rerank shortlist — a 64× payload cut at dim=64/m_sub=8. Here codes
    are computed in the scan (the fixture has no prebuilt index) but scoring
    uses ONLY codes, so the recall behavior is the real thing. Deterministic
    end-to-end (k-means seeds from smallest vec_ids); recall vs exact q16
    is pinned in tests."""
    import ray

    from .common import get_broadcast

    centroids, _ = kmeans_embeddings(sf_dir, k=n_lists, iters=iters, seed=seed)
    books = _pq_train(sf_dir, centroids, m_sub, n_codes, iters, seed)
    q = _query_vector(sf_dir, query_id)
    qn = q / np.maximum(np.linalg.norm(q), 1e-12)
    probe = frozenset(np.argsort(-(centroids @ qn))[:nprobe].tolist())
    dim = centroids.shape[1]
    sd = dim // m_sub
    ref = ray.put((qn, centroids, books, probe))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def scan(t: pa.Table) -> pa.Table:
        qn_b, c, b, pr = get_broadcast(ref)
        m = _embedding_matrix(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        lists = np.argmax(mn @ c.T, axis=1)
        mask = np.isin(lists, list(pr))
        if not mask.any():
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "adc_sim": pa.array([], pa.float64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        mnk, lk = mn[mask], lists[mask]
        r = mnk - c[lk]
        # encode: per subspace, nearest codeword (this is the stored code)
        adc = (qn_b * c[lk]).sum(axis=1)  # q·c_list term
        for j in range(m_sub):
            rj = r[:, j * sd : (j + 1) * sd]
            d = ((rj[:, None, :] - b[j][None, :, :]) ** 2).sum(axis=2)
            codes = np.argmin(d, axis=1)
            lut = b[j] @ qn_b[j * sd : (j + 1) * sd]  # (n_codes,)
            adc += lut[codes]
        df = pd.DataFrame(
            {
                "vec_id": t.column("vec_id").to_numpy()[mask],
                "adc_sim": adc,
                "cos_sim": mnk @ qn_b,  # carried for the shortlist rerank
            }
        )
        return pa.Table.from_pandas(
            df.sort_values(["adc_sim", "vec_id"], ascending=[False, True]).head(rerank),
            preserve_index=False,
        ).replace_schema_metadata(None)

    cand = ds.map_batches(scan, batch_format="pyarrow", batch_size=4096, concurrency=4).to_pandas()
    short = cand.sort_values(["adc_sim", "vec_id"], ascending=[False, True]).head(rerank)
    out = short.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
    out = out.reset_index(drop=True)[["vec_id", "cos_sim"]]
    out["cos_sim"] = round_away(out["cos_sim"].to_numpy(), 4)
    return out


def mahalanobis_outliers(sf_dir: str, threshold: float = 3.0, ridge: float = 1e-9) -> "ray.data.Dataset":
    """Mahalanobis distance per embedding vector + outlier flag — the
    multivariate generalization of q70's z-score and q83's MAD rule, and
    the standard embedding-space anomaly screen before training. Fit rides
    the SAME sufficient-statistic pass as pca_project (_pca_model's mean +
    full covariance, dimension-bounded driver math: one Cholesky of
    cov + ridge·I); the scoring pass broadcasts (mean, L) once and each
    batch is one triangular solve — no per-vector Python, no second
    shuffle. d² = (x−μ)ᵀ Σ⁻¹ (x−μ) via solve(L, (x−μ)ᵀ) — numerically
    safer than an explicit inverse and deterministic (LAPACK on the
    driver's matrix only). Rows-only (no SQL form); pinned vs in-process
    numpy in tests."""
    import ray

    from .common import get_broadcast

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    mu, cov, _ = _cov_stats(sf_dir)
    dim = cov.shape[0]
    L = np.linalg.cholesky(cov + ridge * np.eye(dim))
    ref = ray.put((mu, L))

    def score(t: pa.Table) -> pa.Table:
        mu_b, L_b = get_broadcast(ref)
        m = _embedding_matrix(t)
        c = (m - mu_b).T  # (dim, n)
        z = np.linalg.solve(L_b, c)  # L y = c (L triangular) → d² = ||y||²
        d = np.sqrt((z * z).sum(axis=0))
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "maha": pa.array(round_away(d, 6)),
                "is_outlier": pa.array(d > threshold),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=4096)


def ivf_pq_build_index(
    sf_dir: str,
    index_dir: str,
    n_lists: int = 16,
    m_sub: int = 8,
    n_codes: int = 16,
    iters: int = 5,
    seed: int = 42,
) -> None:
    """Materialize the IVF-PQ index: the ``list_id=N/`` hive layout of
    ivf_build_index, but each partition stores ONLY (vec_id, m_sub uint8
    codes) — m_sub bytes per vector instead of 8·dim (a 64× cut at
    dim=64/m_sub=8). Codebooks + centroids ride a sidecar. This is the
    layout where the ADC scan of ann_ivf_pq_topk never touches a raw
    vector: probed partitions stream codes, the shortlist alone goes back
    to the source table for exact rerank (row-group-pruned point reads).
    Build is streaming — assignment + encoding per batch, write_parquet
    with partition_cols; only model-sized state on the driver."""
    import os

    import pyarrow.parquet as pq_

    from .common import get_broadcast

    centroids, _ = kmeans_embeddings(sf_dir, k=n_lists, iters=iters, seed=seed)
    books = _pq_train(sf_dir, centroids, m_sub, n_codes, iters, seed)
    dim = centroids.shape[1]
    sd = dim // m_sub
    ref = ray.put((centroids, books))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def encode(t: pa.Table) -> pa.Table:
        c, b = get_broadcast(ref)
        m = _embedding_matrix(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        lists = np.argmax(mn @ c.T, axis=1)
        r = mn - c[lists]
        codes = np.empty((len(mn), m_sub), dtype=np.uint8)
        for j in range(m_sub):
            rj = r[:, j * sd : (j + 1) * sd]
            d = ((rj[:, None, :] - b[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d, axis=1)
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "codes": pa.array(codes.tolist(), pa.list_(pa.uint8(), m_sub)),
                "list_id": pa.array(lists.astype(np.int64)),
            }
        )

    ds.map_batches(encode, batch_format="pyarrow", batch_size=4096).write_parquet(
        index_dir, partition_cols=["list_id"]
    )
    pq_.write_table(
        pa.table(
            {
                "list_id": pa.array(np.arange(n_lists, dtype=np.int64)),
                "centroid": pa.array(centroids.tolist(), pa.list_(pa.float64(), dim)),
            }
        ),
        os.path.join(index_dir, "_centroids.parquet"),
    )
    pq_.write_table(
        pa.table(
            {
                "subspace": pa.array(np.repeat(np.arange(m_sub), n_codes).astype(np.int64)),
                "code": pa.array(np.tile(np.arange(n_codes), m_sub).astype(np.int64)),
                "codeword": pa.array(
                    books.reshape(m_sub * n_codes, sd).tolist(), pa.list_(pa.float64(), sd)
                ),
            }
        ),
        os.path.join(index_dir, "_codebooks.parquet"),
    )


def ann_ivf_pq_index_topk(
    sf_dir: str,
    index_dir: str,
    query_id: int = 0,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 50,
) -> pd.DataFrame:
    """Query the materialized IVF-PQ index: list ONLY the nprobe
    ``list_id=N/`` partitions, stream their (vec_id, codes) rows — m_sub
    bytes each — and score by ADC lookup table; the ``rerank`` best ADC
    candidates are then re-read from the SOURCE table by vec_id
    (row-group-pruned reads) for exact cosine. Raw vectors move only for
    the shortlist."""
    import glob
    import os

    import pyarrow.parquet as pq_

    from .common import get_broadcast

    side = pq_.read_table(os.path.join(index_dir, "_centroids.parquet"))
    centroids = np.asarray(side.column("centroid").to_pylist(), dtype=np.float64)
    cb = pq_.read_table(os.path.join(index_dir, "_codebooks.parquet"))
    m_sub = int(pa.compute.max(cb.column("subspace")).as_py()) + 1
    n_codes = int(pa.compute.max(cb.column("code")).as_py()) + 1
    sd = len(cb.column("codeword")[0])
    books = np.asarray(cb.column("codeword").to_pylist(), dtype=np.float64).reshape(
        m_sub, n_codes, sd
    )

    q = _query_vector(sf_dir, query_id)
    qn = q / np.maximum(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ qn))[:nprobe].tolist()
    files: list[str] = []
    for lid in probe:
        files.extend(sorted(glob.glob(os.path.join(index_dir, f"list_id={lid}", "*.parquet"))))
    if not files:
        return pd.DataFrame({"vec_id": pd.array([], dtype="int64"), "cos_sim": []})

    # per-list ADC LUTs: q·c_list + Σ_j lut[j, code_j]
    luts = np.stack([books[j] @ qn[j * sd : (j + 1) * sd] for j in range(m_sub)])  # (m_sub, n_codes)
    qc = centroids @ qn  # (n_lists,)
    ref = ray.put((luts, qc))

    ds = ray.data.read_parquet(files, columns=["vec_id", "codes", "list_id"])

    def scan(t: pa.Table) -> pa.Table:
        luts_b, qc_b = get_broadcast(ref)
        codes_col = t.column("codes")
        if isinstance(codes_col, pa.ChunkedArray):
            codes_col = codes_col.combine_chunks()
        codes = np.asarray(codes_col.values.to_numpy(zero_copy_only=False), dtype=np.int64).reshape(
            len(codes_col), -1
        )
        lids = t.column("list_id").to_numpy().astype(np.int64)
        adc = qc_b[lids] + luts_b[np.arange(codes.shape[1]), codes].sum(axis=1)
        df = pd.DataFrame({"vec_id": t.column("vec_id").to_numpy(), "adc_sim": adc})
        return pa.Table.from_pandas(
            df.sort_values(["adc_sim", "vec_id"], ascending=[False, True]).head(rerank),
            preserve_index=False,
        ).replace_schema_metadata(None)

    cand = ds.map_batches(scan, batch_format="pyarrow", batch_size=8192, concurrency=4).to_pandas()
    short = cand.sort_values(["adc_sim", "vec_id"], ascending=[False, True]).head(rerank)

    # exact rerank: point reads of the shortlist from the source table
    import pyarrow.parquet as pq2

    ids = sorted(int(v) for v in short["vec_id"])
    t = pq2.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", ids)],
    )
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    cos = mn @ qn
    out = pd.DataFrame({"vec_id": np.asarray(t.column("vec_id")), "cos_sim": round_away(cos, 4)})
    out = out.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def ann_ivf_pq_served(sf_dir: str, query_id: int = 0, k: int = 10) -> pd.DataFrame:
    """Driver-path wrapper: build the IVF-PQ index into a scratch dir keyed
    by the input (idempotent — skipped when the sidecars already exist),
    then serve the query from it. A deployment builds once and queries
    many times; see ann_ivf_pq_index_topk for the served cost model."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    index_dir = os.path.join(tempfile.gettempdir(), f"ivfpq_index_{tag}")
    if not os.path.exists(os.path.join(index_dir, "_codebooks.parquet")):
        ivf_pq_build_index(sf_dir, index_dir)
    return ann_ivf_pq_index_topk(sf_dir, index_dir, query_id=query_id, k=k)


def q127_hybrid_retrieval(
    sf_dir: str,
    terms: tuple = ("spark", "join", "fast"),
    n_candidates: int = 200,
    k: int = 10,
    query_id: int = 0,
) -> pd.DataFrame:
    """Two-stage hybrid retrieval — the classic RAG serving shape: a cheap
    sparse lexical pass for recall (BM25 over the term set, q124's bounded
    two-pass machinery) followed by a dense rerank for precision (embedding
    cosine vs the query vector over the candidate set only).

    Stage 1's top-``n_candidates`` ids+scores are driver-sized; they ride to
    stage 2 as ONE broadcast object next to the normalized query vector, so
    the embeddings scan filters to candidates per batch (vec_id and doc_id
    share the id space; docs without an embedding drop out on both sides —
    the oracle's inner join) and reranks with a per-batch top-k. No shuffle
    anywhere: candidate filter + matmul + bounded driver collect. Final
    order: cosine desc, doc_id asc, rounded on both sides."""
    from .textstats import q124_bm25_topk

    cand = q124_bm25_topk(sf_dir, terms=terms, k=n_candidates)
    cand_ids = cand["doc_id"].to_numpy(dtype=np.int64)
    bm25_by_id = dict(zip(cand_ids.tolist(), cand["bm25"].tolist()))

    q = _query_vector(sf_dir, query_id)
    qn = q / np.linalg.norm(q)
    ref = ray.put((qn, cand_ids, bm25_by_id))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    class Rerank:
        def __init__(self):
            self._q, self._ids, self._bm = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("vec_id").to_numpy()
            mask = np.isin(ids, self._ids)
            if not mask.any():
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "bm25": pa.array([], pa.float64()),
                        "cos_sim": pa.array([], pa.float64()),
                    }
                )
            t2 = t.filter(pa.array(mask))
            m = _embedding_matrix(t2)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            cos = (m @ self._q) / norms
            kept = t2.column("vec_id").to_numpy()
            df = pd.DataFrame(
                {
                    "doc_id": kept.astype("int64"),
                    "bm25": [self._bm[int(i)] for i in kept],
                    "cos_sim": round_away(cos, 4),
                }
            )
            df = df.sort_values(["cos_sim", "doc_id"], ascending=[False, True]).head(k)
            return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    out = ds.map_batches(Rerank, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)).to_pandas()
    return (
        out.sort_values(["cos_sim", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "bm25": "float64", "cos_sim": "float64"})
    )


def _local_min_label_components(adj: np.ndarray) -> np.ndarray:
    """Connected-component labels of a small dense adjacency matrix by
    min-label propagation with pointer jumping. Used ONLY inside a
    co-located cluster group (cluster-sized, never corpus-sized) — the
    distributed counterpart for corpus-wide graphs is
    graph.connected_components_minlabel."""
    n = adj.shape[0]
    labels = np.arange(n)
    sentinel = n  # acts as +inf for the masked min
    while True:
        nbr = np.where(adj, labels[None, :], sentinel)
        new = np.minimum(labels, nbr.min(axis=1))
        new = np.minimum(new, new[new])  # pointer jump
        if np.array_equal(new, labels):
            return labels
        labels = new


def semdedup(
    sf_dir: str,
    k: int = 8,
    threshold: float = 0.35,
    iters: int = 10,
    seed: int = 42,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    deduplication as a k-means-bucketed near-dup prune, the published
    composition of two operators this engine already has
    (``kmeans_embeddings`` + in-group cosine verify):

      1. spherical k-means over the embedding column (broadcast centroids,
         shuffle-free partial-sum reduce — ``kmeans_embeddings``);
      2. ONE cluster-bucket shuffle; within each cluster, pairwise cosine
         ≥ ``threshold`` defines semantic-duplicate groups (connected
         components of the in-cluster dup graph);
      3. per dup group keep exactly one document — the paper's rule: the
         member with the LOWEST cosine to its cluster centroid (keeps the
         "edge" example, drops redundant near-centroid copies), vec_id
         ascending as the deterministic tie-break.

    Returns a per-vector decision view (vec_id, cluster, centroid_sim,
    kept) that streams — never collected on the driver.

    Partitioning assumption (the paper's too): the in-cluster all-pairs is
    quadratic in CLUSTER size, so k must scale with the corpus (paper uses
    k ≈ N/10k). Centroid similarity is stamped in the SAME pass that
    assigns clusters, so stage 2 needs no centroid broadcast at all. A
    pathological giant cluster degrades to q25's chunk-pair self-join
    within that cluster; at fixture scale the direct form is exact and
    the shapes are identical.

    Reference anchor: the reference has no embedding dedup; this is the
    §2.7-family LLM-pipeline extension (cf. dedup.py MinHash family).
    Pinned against an in-process numpy reference in
    tests/test_dedup_similarity.py."""
    centroids, _ = kmeans_embeddings(sf_dir, k=k, iters=iters, seed=seed)
    cref = ray.put(centroids)

    def stamp(t: pa.Table) -> pa.Table:
        from .common import get_broadcast

        cc = get_broadcast(cref)
        m = _embedding_matrix(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = mn @ cc.T
        a = np.argmax(sims, axis=1)
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": pa.array(a.astype(np.int64)),
                "centroid_sim": pa.array(sims[np.arange(len(m)), a]),
                "embedding": emb,
            }
        )

    def prune_cluster(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("cluster", sort=False):
            m = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mn = m / norms
            cos = mn @ mn.T
            np.fill_diagonal(cos, 0.0)
            # deterministic component ids need a deterministic row order
            order = np.argsort(g["vec_id"].to_numpy(), kind="mergesort")
            comp = np.empty(len(g), dtype=np.int64)
            comp[order] = _local_min_label_components(cos[np.ix_(order, order)] >= threshold)
            gg = pd.DataFrame(
                {
                    "vec_id": g["vec_id"].to_numpy(),
                    "cluster": g["cluster"].to_numpy(),
                    "centroid_sim": g["centroid_sim"].to_numpy(),
                    "_comp": comp,
                }
            )
            # keep = lowest centroid_sim in the component, vec_id tie-break
            rep = (
                gg.sort_values(["centroid_sim", "vec_id"], kind="mergesort")
                .groupby("_comp", sort=False)
                .head(1)["vec_id"]
            )
            gg["kept"] = gg["vec_id"].isin(set(rep.tolist()))
            gg["centroid_sim"] = round_away(gg["centroid_sim"].to_numpy(), 4)
            outs.append(gg.drop(columns=["_comp"]))
        return pd.concat(outs, ignore_index=True)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    stamped = ds.map_batches(stamp, batch_format="pyarrow", batch_size=4096)
    return bucketed_group_agg(stamped, ["cluster"], prune_cluster, n_buckets=min(k, 64))


def _hash_embed(texts: pa.Array, dim: int = 64) -> np.ndarray:
    """Deterministic hashing-trick bag-of-tokens embedding (Weinberger et
    al. 2009 feature hashing): each token lands in bucket hash%dim with
    sign ± from the next hash bit; rows are L2-normalized. No model, no
    vocabulary, split-invariant (stable_hash64) — the torch-free way to
    give every document a dense vector the ANN/near-dup family can index."""
    import pyarrow.compute as pc

    trimmed = pc.utf8_trim_whitespace(texts)
    toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    flat = pc.list_flatten(toks)
    par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    out = np.zeros((len(texts), dim), dtype=np.float64)
    if len(flat):
        h = stable_hash64(flat)
        idx = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
        np.add.at(out, (par, idx), sign)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def doc_hash_embeddings(sf_dir: str, dim: int = 64) -> "ray.data.Dataset":
    """Rows-only query: per-document hashing-trick embedding over the
    documents table — a pure streaming map (one batch in, one batch of
    (doc_id, embedding) out). Downstream, these vectors drop into the
    same kmeans / IVF / near-dup operators as the embeddings table."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        m = _hash_embed(t.column("text").combine_chunks() if isinstance(t.column("text"), pa.ChunkedArray) else t.column("text"), dim)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "embedding": pa.array(m.tolist(), pa.list_(pa.float64(), dim)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096)


def text_semantic_search(
    sf_dir: str, query_text: str = "spark join fast", k: int = 10, dim: int = 64
) -> pd.DataFrame:
    """End-to-end model-free semantic search over raw text: embed the
    query with the SAME hashing featurizer, broadcast the vector, and
    brute-force cosine top-k over per-batch hash embeddings (q16's shape
    with the embedding computed on the fly instead of read). Lexically
    related docs rank high because they share hashed token buckets —
    BM25's dense cousin; q127 composes the sparse and dense stages."""
    qv = _hash_embed(pa.array([query_text], pa.string()), dim)[0]
    ref = ray.put(qv)

    def score(t: pa.Table) -> pa.Table:
        from .common import get_broadcast

        q = get_broadcast(ref)
        m = _hash_embed(t.column("text").combine_chunks() if isinstance(t.column("text"), pa.ChunkedArray) else t.column("text"), dim)
        cos = m @ q
        top = np.argsort(-cos, kind="mergesort")[:k]
        return pa.table(
            {
                "doc_id": pa.array(t.column("doc_id").to_numpy()[top], pa.int64()),
                "cos_sim": pa.array(round_away(cos[top], 4)),
            }
        )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(score, batch_format="pyarrow", batch_size=4096).to_pandas()
    return (
        out.sort_values(["cos_sim", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "cos_sim": "float64"})
    )


def q197_embedding_norm_outliers(sf_dir: str) -> pd.DataFrame:
    """Embedding-norm outlier audit: vectors whose squared norm falls
    outside [mean/4, 4·mean] — the cheap degenerate-embedding detector
    (zero vectors, un-normalized strays, encoder fallbacks) run before
    any ANN index build. Exactness discipline: components quantize to
    int64 MILLI-units (float32→double is bit-exact, round-away == DuckDB
    round; v² ≤ dim·2.5e7 keeps per-vector norm² far inside int64 even at
    1e9 vectors), pass 1 reduces (n, Σnorm², max) partials with the Σ
    merged in arbitrary-precision Python int, and the driver turns the
    mean bounds into two INTEGER thresholds (floor-division identities:
    n2 ≤ (Σ−1)//(4n) ⇔ 4·n2·n < Σ; n2 > (4Σ)//n ⇔ n2·n > 4Σ) so pass 2
    and the oracle's HUGEINT arithmetic count identical rows — no float
    enters any comparison. Returns one row: (n_vecs, mean_norm2,
    n_outliers, max_ratio)."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def norms(t: pa.Table) -> np.ndarray:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.cast(pc.list_flatten(col), pa.float64()).to_numpy(zero_copy_only=False)
        v = round_away(flat * 1e3, 0).astype(np.int64)
        parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        return np.bincount(
            parents, weights=(v * v).astype(np.float64), minlength=t.num_rows
        ).astype(np.int64)

    def partial1(t: pa.Table) -> pa.Table:
        n2 = norms(t)
        return pa.table(
            {
                "p_n": pa.array([t.num_rows], pa.int64()),
                "p_s": pa.array([int(n2.sum())], pa.int64()),
                "p_max": pa.array([int(n2.max()) if len(n2) else 0], pa.int64()),
            }
        )

    agg = ds.map_batches(partial1, batch_format="pyarrow").to_pandas()
    # an empty input produces ZERO batches → a column-less partials frame
    n = int(agg["p_n"].sum()) if "p_n" in agg.columns else 0
    if n == 0:
        # degenerate guard (r5, ADVICE): empty embeddings table. Mirrors the
        # oracle exactly — DuckDB's empty-input aggregates give sum/max NULL,
        # its division by NULL/zero gives NULL, and the outlier count over an
        # empty relation is 0, so the SQL side emits (0, NULL, 0, NULL).
        return pd.DataFrame(
            {
                "n_vecs": pd.array([0], dtype="int64"),
                "mean_norm2": [float("nan")],
                "n_outliers": pd.array([0], dtype="int64"),
                "max_ratio": [float("nan")],
            }
        )
    s = sum(int(x) for x in agg["p_s"])  # arbitrary-precision merge
    mx = int(agg["p_max"].max())
    # n2 <= t_lo  <=>  4*n2*n < s (for s >= 1). DuckDB's // TRUNCATES toward
    # zero while Python floors, so the all-zero-corpus case (s == 0, where
    # the dividend s-1 goes negative) must take DuckDB's value: t_lo = 0,
    # which counts every zero-norm vector as an outlier — degenerate
    # embeddings are exactly what this audit exists to flag
    t_lo = 0 if s == 0 else (s - 1) // (4 * n)
    t_hi = (4 * s) // n        # n2 >  t_hi  <=>  n2*n > 4*s
    ref = ray.put((int(t_lo), int(t_hi)))

    def partial2(t: pa.Table) -> pa.Table:
        from .common import get_broadcast

        lo, hi = get_broadcast(ref)
        n2 = norms(t)
        out = int(((n2 <= lo) | (n2 > hi)).sum())
        return pa.table({"p_out": pa.array([out], pa.int64())})

    n_out = int(ds.map_batches(partial2, batch_format="pyarrow").to_pandas()["p_out"].sum())
    mean = s / n
    # all-zero corpus (s == 0): mean is 0 and the ratio is 0/0 — DuckDB's
    # double division by zero yields NULL, so emit NaN rather than raise
    max_ratio = float("nan") if s == 0 else float(round_away(np.array([mx / mean]), 6)[0])
    return pd.DataFrame(
        {
            "n_vecs": pd.array([n], dtype="int64"),
            "mean_norm2": [float(round_away(np.array([mean]), 4)[0])],
            "n_outliers": pd.array([n_out], dtype="int64"),
            "max_ratio": [max_ratio],
        }
    )


def q214_embedding_dim_audit(sf_dir: str) -> pd.DataFrame:
    """Embedding-ingest schema audit, the q197 norm screen's structural
    sibling run before any ANN/k-means build: per vector LENGTH (a mixed-
    dim table means two encoder versions were concatenated — every matmul
    kernel here assumes one dim), the count of vectors carrying a NaN
    component and of all-zero vectors (both poison IVF training silently).
    Per-batch partials over zero-copy list offsets/values — (dim, n,
    n_nan, n_allzero) rows bounded by the distinct-dim count, merged on
    the driver; comparisons are exact (isnan, == 0.0), so both oracle
    sides count identical rows."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "embeddings", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dims = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        n_rows = t.num_rows
        nan_per = np.bincount(parents, weights=np.isnan(flat), minlength=n_rows)
        nonzero_per = np.bincount(parents, weights=(flat != 0.0), minlength=n_rows)
        d = pd.DataFrame(
            {
                "dim": dims,
                "one": np.ones(n_rows, dtype=np.int64),
                "has_nan": (nan_per > 0).astype(np.int64),
                "allzero": ((nonzero_per == 0) & (dims > 0)).astype(np.int64),
            }
        )
        g = d.groupby("dim", as_index=False).agg(
            p_n=("one", "sum"), p_nan=("has_nan", "sum"), p_zero=("allzero", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "dim" not in parts.columns:  # empty input → zero batches, like the oracle's 0 rows
        return pd.DataFrame(
            {
                "dim": pd.array([], dtype="int64"),
                "n": pd.array([], dtype="int64"),
                "n_nan": pd.array([], dtype="int64"),
                "n_allzero": pd.array([], dtype="int64"),
            }
        )
    merged = parts.groupby("dim", as_index=False).agg(
        n=("p_n", "sum"), n_nan=("p_nan", "sum"), n_allzero=("p_zero", "sum")
    )
    return merged.astype({"dim": "int64", "n": "int64", "n_nan": "int64", "n_allzero": "int64"})
