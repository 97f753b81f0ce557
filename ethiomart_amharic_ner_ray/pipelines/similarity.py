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

from .common import read_table, round_away


def _embedding_matrix(t: pa.Table) -> np.ndarray:
    col = t.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _query_vector(sf_dir: str, query_id: int) -> np.ndarray:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import os

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    row = t.filter(pc.equal(t.column("vec_id"), query_id))
    return np.asarray(row.column("embedding").to_pylist()[0], dtype=np.float64)


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
            return pa.Table.from_pandas(df, preserve_index=False)

    cand = ds.map_batches(TopK, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)).to_pandas()
    return (
        cand.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
    )


def q25_embedding_neardup(sf_dir: str, threshold: float = 0.3) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (the embedding analogue of
    MinHash dedup): all vector pairs with cosine ≥ threshold. The full
    normalized matrix is broadcast once; each batch computes its block-row
    of the similarity matrix and keeps only (a < b) pairs over threshold —
    a blocked self-join, never materializing the full pairwise matrix.
    SQL-checkable at test scale via DuckDB list_cosine_similarity."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    m = _embedding_matrix(t)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    all_ids = t.column("vec_id").to_numpy()
    ref = ray.put((all_ids, m / norms))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    class BlockPairs:
        def __init__(self):
            self._ids, self._mn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bm = _embedding_matrix(batch)
            bn = np.linalg.norm(bm, axis=1, keepdims=True)
            bn[bn == 0] = 1.0
            cos = (bm / bn) @ self._mn.T  # (batch, all)
            bids = batch.column("vec_id").to_numpy()
            rows_a, rows_b, rows_c = [], [], []
            ii, jj = np.where(cos >= threshold)
            for i, j in zip(ii, jj):
                a, b = int(bids[i]), int(self._ids[j])
                if a < b:
                    rows_a.append(a)
                    rows_b.append(b)
                    rows_c.append(float(cos[i, j]))
            return pa.table(
                {
                    "a": pa.array(rows_a, pa.int64()),
                    "b": pa.array(rows_b, pa.int64()),
                    "cos_sim": pa.array(np.round(np.array(rows_c), 10), pa.float64()),
                }
            )

    out = ds.map_batches(BlockPairs, batch_format="pyarrow", batch_size=2048, concurrency=(1, 4)).to_pandas()
    from .common import round_away

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
            return pa.Table.from_pandas(df, preserve_index=False)

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

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    qt = t.slice(0, limit_queries)
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
