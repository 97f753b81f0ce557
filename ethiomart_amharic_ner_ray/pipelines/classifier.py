"""Model-based quality filtering: a logistic-regression document classifier
over hashed bag-of-words features, TRAINED DISTRIBUTED — the
FineWeb-Edu-style "train a small classifier on seed labels, score the whole
corpus, keep the confident slice" operator family (Penedo et al. 2024;
Joulin et al. 2017's fastText shape without the embedding table).

Reference parity: the reference stack trains its quality models offline
(train_ner.py) and scores in batch; the engine-scale analogue here is the
corpus-filter classifier every modern pretraining pipeline runs in front of
the tokenizer. Built from scratch on the broadcast-weights /
model-sized-gradient-partials shape (same family as
``similarity.kmeans_embeddings``):

  featurize   ONE pass over the corpus -> (doc_id, y, idx[], val[]) hashed
              sparse rows; cached for the iterations (at cluster scale this
              is a Parquet checkpoint, exactly like run_kg_pipeline's
              mentions checkpoint -- the fixture-scale code uses
              ``materialize()`` on the feature projection, never raw text)
  iterate     per round: ``ray.put`` the (D+1)-float model once; every batch
              emits ONE partial row (X^T r vector + bias residual + count);
              the driver reduces num_blocks x (D+1) floats and applies a
              plain full-batch gradient-descent step. Nothing doc-sized
              ever reaches the driver and nothing shuffles.
  score       broadcast the final model; one vectorized pass emits
              (doc_id, prob, keep).

Determinism: fixed iteration count (no float-compare early exit), float64
throughout, hashing via the engine-wide ``stable_hash64``. The one caveat is
inherent to distributed float reduction: summing gradient partials in a
different block order can move probabilities by ~1e-15, so ``keep`` is only
layout-stable when no document sits within float-noise of the threshold --
the same trade ``kmeans_embeddings`` documents, and why the conformance test
pins the distributed model against an in-process reference with allclose
rather than byte equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .common import get_broadcast, read_table, stable_hash64


def _hash_tokens(tokens: pd.Series, n_features: int) -> np.ndarray:
    """Token string -> feature index in [0, n_features) via the engine-wide
    stable 64-bit hash (so features are identical across workers, runs and
    the in-process reference)."""
    if len(tokens) == 0:
        return np.array([], dtype=np.int64)
    return (stable_hash64(tokens) % np.uint64(n_features)).astype(np.int64)


def featurize_batch(
    t: pa.Table, n_features: int, target_lang: str
) -> pa.Table:
    """One batch of documents -> hashed sparse bag-of-words rows.

    Feature value = tf / n_tokens (length-normalized term frequency, so a
    long document doesn't dominate the gradient); label y = 1.0 when
    ``lang == target_lang`` (the deterministic stand-in for FineWeb-Edu's
    LLM-graded seed labels -- swap the label expression for a joined
    seed-label table in production). Empty documents keep an empty feature
    list (the model still sees their bias term)."""
    t = t.combine_chunks()
    doc_id = t.column("doc_id").to_numpy(zero_copy_only=False)
    y = pc.equal(t.column("lang"), target_lang).to_numpy(zero_copy_only=False)
    trimmed = pc.utf8_trim_whitespace(t.column("text"))
    toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks).to_pandas()
    keep = (flat != "").to_numpy()
    parent = parent[keep]
    feat = _hash_tokens(flat[keep], n_features)

    n_docs = len(doc_id)
    idx_lists: list[np.ndarray] = [np.array([], dtype=np.int64)] * n_docs
    val_lists: list[np.ndarray] = [np.array([], dtype=np.float64)] * n_docs
    if len(parent):
        # per-(doc, feature) tf via one lexsort + reduceat
        order = np.lexsort((feat, parent))
        p, f = parent[order], feat[order]
        new = np.empty(len(p), dtype=bool)
        new[0] = True
        new[1:] = (p[1:] != p[:-1]) | (f[1:] != f[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(p))).astype(np.float64)
        gp, gf = p[starts], f[starts]
        ntok = np.bincount(parent, minlength=n_docs).astype(np.float64)
        vals = counts / ntok[gp]
        doc_starts = np.searchsorted(gp, np.arange(n_docs))
        doc_ends = np.searchsorted(gp, np.arange(n_docs), side="right")
        idx_lists = [gf[a:b] for a, b in zip(doc_starts, doc_ends)]
        val_lists = [vals[a:b] for a, b in zip(doc_starts, doc_ends)]

    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "y": pa.array(y.astype(np.float64)),
            "idx": pa.array([a.tolist() for a in idx_lists], pa.list_(pa.int32())),
            "val": pa.array([a.tolist() for a in val_lists], pa.list_(pa.float64())),
        }
    )


def _csr(t: pa.Table):
    """Feature batch -> (indptr, indices, values, y) CSR views (zero-copy
    off the arrow list offsets where possible)."""
    t = t.combine_chunks()
    idx = t.column("idx")
    ch = idx.chunk(0) if idx.num_chunks else pa.array([], pa.list_(pa.int32()))
    indptr = ch.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    indices = pc.list_flatten(idx).to_numpy(zero_copy_only=False).astype(np.int64)
    values = pc.list_flatten(t.column("val")).to_numpy(zero_copy_only=False)
    y = t.column("y").to_numpy(zero_copy_only=False)
    return indptr, indices, values, y


def _forward(indptr, indices, values, w, b):
    """Sparse X @ w + b via segment sums (np.add.reduceat over the flat
    value*weight products -- no scipy in this container)."""
    n = len(indptr) - 1
    z = np.full(n, b, dtype=np.float64)
    if len(indices):
        prod = values * w[indices]
        nz = np.diff(indptr) > 0
        seg = np.add.reduceat(prod, indptr[:-1][nz]) if nz.any() else np.array([])
        z[nz] += seg
    return z


def _ckpt_load(checkpoint_dir: str, fingerprint: str):
    """Latest committed (iter, w, b) under checkpoint_dir whose fingerprint
    matches, else None. JSON float lists round-trip float64 exactly."""
    import glob
    import json
    import os

    best = None
    for p in glob.glob(os.path.join(checkpoint_dir, "iter-*.json")):
        try:
            with open(p) as f:
                m = json.load(f)
        except (OSError, ValueError):
            continue
        if m.get("fingerprint") != fingerprint:
            continue
        if best is None or m["iter"] > best["iter"]:
            best = m
    return best


def _ckpt_write(checkpoint_dir: str, fingerprint: str, it: int, w: np.ndarray, b: float):
    import json
    import os

    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, f"iter-{it:04d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"fingerprint": fingerprint, "iter": it, "w": w.tolist(), "b": b}, f
        )
    os.replace(tmp, path)


@ray.remote(num_cpus=0)
class _GradShardActor:
    """One shard of the cached feature table, CSR-decoded ONCE and held
    across gradient iterations — the iterative-algorithm actor shape
    (pipelines/bpe.py's merge loop is the same pattern): per round the
    driver sends the (D+1)-float model and gets back one (D+1)-float
    partial, instead of paying a full Ray Dataset job (~100 ms of pure
    orchestration per iteration at fixture scale, 15× per training run).
    num_cpus=0: the per-round burst is short and reserving whole CPUs can
    deadlock against a concurrent Dataset job on a small pool."""

    def __init__(self, blocks: list, n_features: int) -> None:
        blocks = ray.get(list(blocks)) if blocks else []
        tabs = [
            b.replace_schema_metadata(None)
            for b in blocks
            if b.num_rows and "y" in b.schema.names
        ]
        self.D = n_features
        if tabs:
            t = pa.concat_tables(tabs, promote_options="default")
            self.indptr, self.indices, self.values, self.y = _csr(t)
        else:
            self.indptr = np.zeros(1, dtype=np.int64)
            self.indices = np.array([], dtype=np.int64)
            self.values = np.array([], dtype=np.float64)
            self.y = np.array([], dtype=np.float64)
        self.parent = np.repeat(np.arange(len(self.y)), np.diff(self.indptr))

    def grad(self, w: np.ndarray, b: float):
        z = _forward(self.indptr, self.indices, self.values, w, b)
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - self.y
        gw = np.zeros(self.D, dtype=np.float64)
        if len(self.indices):
            np.add.at(gw, self.indices, self.values * r[self.parent])
        return gw, float(r.sum()), len(self.y)


def train_quality_classifier(
    sf_dir: str,
    target_lang: str = "en",
    n_features: int = 4096,
    iters: int = 15,
    lr: float = 2.0,
    l2: float = 1e-4,
    checkpoint_dir: str | None = None,
) -> tuple[np.ndarray, float]:
    """Distributed full-batch logistic regression. Returns (w[D], b).

    Per iteration: one ``ray.put`` of the (D+1)-float model, one
    ``map_batches`` pass over the cached feature table, each batch emitting
    a single (D+1)-float gradient partial; the driver reduces
    num_blocks rows and steps. L2 is applied once, driver-side.

    With ``checkpoint_dir``, every completed iteration commits the
    (D+1)-float model atomically (run_kg_pipeline-style marker, fingerprint
    = the hyperparameter tuple + input path so a stale model from different
    params can never resume); a crashed training job restarts from its last
    committed iteration. The feature pass is recomputed on resume — model
    checkpoints are ~32 KB while the feature table is corpus-sized, so at
    cluster scale the features get their own Parquet checkpoint (the
    mentions-checkpoint pattern) and the model rides these markers."""
    feat = (
        read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
        .map_batches(
            lambda t: featurize_batch(t, n_features, target_lang),
            batch_format="pyarrow",
        )
        .materialize()  # iteration cache: sparse projection, not raw text;
        # the cluster path checkpoints this to Parquet instead
    )
    # shard the cached CSR features onto an actor pool: each iteration is
    # then ONE model broadcast + one (D+1)-float partial per shard, not a
    # full Dataset job (the bpe_train actor-loop pattern). Round-robin
    # block refs — never split(equal=True), which drops rows.
    refs = feat.to_arrow_refs()
    n_shards = max(1, min(16, int(ray.cluster_resources().get("CPU", 16)), len(refs)))
    shards: list[list] = [[] for _ in range(n_shards)]
    for i, r in enumerate(refs):
        shards[i % n_shards].append(r)
    actors = [_GradShardActor.remote(rs, n_features) for rs in shards]

    # content-signed input (r5): a resume checkpoint must never continue
    # gradient descent against weights trained on a since-changed corpus
    import os as _os

    from ..state.manifest import content_signature

    _in_sig = content_signature(_os.path.join(sf_dir, "documents.parquet"))
    fingerprint = f"qc-v2|{target_lang}|{n_features}|{lr}|{l2}|in={_in_sig}"
    w = np.zeros(n_features, dtype=np.float64)
    b = 0.0
    start = 0
    if checkpoint_dir is not None:
        ck = _ckpt_load(checkpoint_dir, fingerprint)
        if ck is not None:
            w = np.asarray(ck["w"], dtype=np.float64)
            b = float(ck["b"])
            start = int(ck["iter"]) + 1
    try:
        n_total = None
        for it in range(start, iters):
            parts = ray.get([a.grad.remote(w, b) for a in actors])
            if n_total is None:
                n_total = sum(p[2] for p in parts)
            gw = np.zeros(n_features, dtype=np.float64)
            gb = 0.0
            for pgw, pgb, _ in parts:  # fixed actor order: deterministic sum
                gw += pgw
                gb += pgb
            w -= lr * (gw / n_total + l2 * w)
            b -= lr * (gb / n_total)
            if checkpoint_dir is not None:
                _ckpt_write(checkpoint_dir, fingerprint, it, w, b)
    finally:
        for a in actors:
            ray.kill(a)
    return w, b


def quality_classifier_scores(
    sf_dir: str,
    target_lang: str = "en",
    n_features: int = 4096,
    iters: int = 15,
    lr: float = 2.0,
    l2: float = 1e-4,
    threshold: float = 0.5,
) -> "ray.data.Dataset":
    """Train the classifier distributed, then score the corpus in one
    broadcast pass: (doc_id, prob, keep). ``prob`` is rounded to 6 dp for
    report stability; ``keep`` thresholds the UNROUNDED probability."""
    w, b = train_quality_classifier(
        sf_dir, target_lang=target_lang, n_features=n_features,
        iters=iters, lr=lr, l2=l2,
    )
    ref = ray.put((w, b))
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def score(t: pa.Table) -> pa.Table:
        ww, bb = get_broadcast(ref)
        ft = featurize_batch(t, n_features, target_lang)
        indptr, indices, values, _ = _csr(ft)
        z = _forward(indptr, indices, values, ww, bb)
        p = 1.0 / (1.0 + np.exp(-z))
        return pa.table(
            {
                "doc_id": ft.column("doc_id"),
                "prob": pa.array(np.round(p, 6)),
                "keep": pa.array((p >= threshold).astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def reference_train(
    docs: pd.DataFrame,
    target_lang: str = "en",
    n_features: int = 4096,
    iters: int = 15,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> tuple[np.ndarray, float, np.ndarray]:
    """In-process single-machine reference (same math, no Ray) the
    conformance test pins the distributed trainer against. Returns
    (w, b, probs aligned to docs order)."""
    tbl = pa.Table.from_pandas(
        docs[["doc_id", "text", "lang"]], preserve_index=False
    )
    ft = featurize_batch(tbl, n_features, target_lang)
    indptr, indices, values, y = _csr(ft)
    n = len(y)
    w = np.zeros(n_features, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = _forward(indptr, indices, values, w, b)
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        gw = np.zeros(n_features, dtype=np.float64)
        if len(indices):
            parent = np.repeat(np.arange(n), np.diff(indptr))
            np.add.at(gw, indices, values * r[parent])
        w -= lr * (gw / n + l2 * w)
        b -= lr * (r.sum() / n)
    z = _forward(indptr, indices, values, w, b)
    return w, b, 1.0 / (1.0 + np.exp(-z))
