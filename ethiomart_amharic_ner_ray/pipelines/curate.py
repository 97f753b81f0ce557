"""End-to-end corpus curation: the pipeline a training run actually
consumes, composed from the engine's SQL-checked curation operators —

    read documents
      → exact dedup            (q11's one content-hash shuffle, payloads
                                ride; min-doc_id survivor per text)
      → checkpoint survivors   (Parquet — the quality gate needs two
                                passes, and the checkpoint is the resume
                                point)
      → per-source quality gate (q131's bounded histogram → exact
                                discrete-quantile thresholds → broadcast
                                filter re-scan)
      → leakage-free split     (q130's md5-prefix rule; after exact dedup
                                every cluster is a singleton, so the rep
                                is the doc itself — a near-dup-aware
                                variant feeds minhash cluster reps in)
      → deterministic shard export per split (export.shuffled_export:
                                seeded split-invariant permutation,
                                atomic shard files + manifest)

Every stage is a streaming Dataset transform; the only materialized
artifact is the survivor checkpoint (itself the resume point). Stats are
aggregate-sized. This is the 100 TB shape: one wide shuffle (dedup), one
bounded histogram reduce, one filtered re-scan, one shard shuffle.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .common import bucketed_group_agg, get_broadcast, read_table
from .export import shuffled_export

_TRAIN_HEX = "cccccccc" + "0" * 24  # 0.8 as an md5-hex prefix constant


def _dedup_survivors(ds: "ray.data.Dataset", n_buckets: int = 32) -> "ray.data.Dataset":
    """Exact dedup with payloads riding the one content-hash shuffle:
    each text group keeps its min-doc_id row intact."""
    import hashlib

    def tag(t: pa.Table) -> pa.Table:
        h = [hashlib.sha256(x.encode("utf-8")).hexdigest() for x in t.column("text").to_pylist()]
        t = t.replace_schema_metadata(None)
        return t.append_column("_ch", pa.array(h, pa.string()))

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        idx = df.groupby("_ch")["doc_id"].idxmin()
        return df.loc[idx].drop(columns=["_ch"])

    return bucketed_group_agg(
        ds.map_batches(tag, batch_format="pyarrow"), ["_ch"], keep_min, n_buckets=n_buckets
    )


def _alpha_ratio(t: pa.Table) -> pa.Array:
    text = t.column("text")
    n_chars = pc.utf8_length(text)
    alpha = pc.utf8_length(pc.replace_substring_regex(text, pattern=r"[^a-zA-Z]", replacement=""))
    denom = pc.max_element_wise(pc.cast(n_chars, pa.float64()), pa.scalar(1.0))
    return pc.round(
        pc.divide(pc.cast(alpha, pa.float64()), denom),
        ndigits=4,
        round_mode="half_towards_infinity",
    )


def _quality_thresholds(ds: "ray.data.Dataset", q: float) -> dict:
    """q131's exact bounded-histogram discrete quantile per source."""

    def hist(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"source": t.column("source").to_pandas(), "score": _alpha_ratio(t).to_pandas()}
        )
        g = df.groupby(["source", "score"], as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    h = (
        ds.map_batches(hist, batch_format="pyarrow")
        .to_pandas()
        .groupby(["source", "score"], as_index=False)["n"]
        .sum()
    )
    thr = {}
    for src, g in h.groupby("source"):
        g = g.sort_values("score")
        rank = math.ceil(q * int(g["n"].sum()))
        cum = g["n"].cumsum().to_numpy()
        thr[src] = float(g["score"].to_numpy()[(cum >= rank).argmax()])
    return thr


def _span_rewrite(surv_ckpt: str, out_dir: str, k: int) -> tuple[str, int, int]:
    """Stage 1c: span-level dedup as a corpus REWRITE (Lee et al.; q133's
    rule) over the dedup-survivor checkpoint — every k-token span seen in
    ≥2 documents survives only in its lowest-doc_id owner; non-owners drop
    the covered tokens. Returns ``(rewritten_ckpt_dir, n_docs_rewritten,
    n_tokens_removed)``.

    Shape: the removal set rides q133's one shingle-bucket shuffle
    (span_removal_starts); removals then meet the full survivor corpus in
    ONE bucketed_join on doc_id whose merge_fn passes untouched docs
    through vectorized and rebuilds only the affected ones. The rewritten
    corpus is its own Parquet checkpoint: written to a temp dir, atomically
    os.replace'd into place, then stamped with a fingerprint sidecar — a
    re-run with the same k AND the same survivor corpus reuses it without
    recomputing (crash anywhere before the stamp ⇒ full recompute). The
    fingerprint folds in a content signature of the survivor checkpoint
    (state/manifest.content_signature: per-file name + size + mtime +
    footer-tail hash): run_curation_pipeline rewrites dedup_survivors
    unconditionally each run, so without it a rerun into the same out_dir
    with CHANGED input would silently reuse the stale span-rewritten
    corpus, feeding stale text to the quality gate and shards."""
    import shutil

    from ..state.manifest import content_signature
    from .textstats import span_removal_starts

    ckpt = os.path.join(out_dir, "span_rewritten")
    fp = f"span-v2|k={k}|in={content_signature(surv_ckpt)}"
    fp_path = os.path.join(ckpt, "_SPAN_DONE.json")
    if os.path.exists(fp_path):
        try:
            meta = json.load(open(fp_path))
        except (json.JSONDecodeError, OSError):
            meta = {}
        if meta.get("fingerprint") == fp:
            return ckpt, int(meta["n_docs_rewritten"]), int(meta["n_tokens_removed"])

    docs = ray.data.read_parquet(surv_ckpt, columns=["doc_id", "source", "text"])
    removals = span_removal_starts(
        ray.data.read_parquet(surv_ckpt, columns=["doc_id", "text"]), k
    )

    def rewrite(docs_df: pd.DataFrame, rem_df: pd.DataFrame) -> pd.DataFrame:
        out = docs_df[["doc_id", "source", "text"]].copy()
        out["n_removed"] = 0
        if len(rem_df):
            by_doc = {int(d): g["pos"].to_numpy() for d, g in rem_df.groupby("doc_id")}
            hit = out["doc_id"].astype("int64").isin(by_doc.keys()).to_numpy()
            new_text, new_n = [], []
            for did, text in zip(out.loc[hit, "doc_id"], out.loc[hit, "text"]):
                toks = text.strip().split()
                cover = np.zeros(len(toks), dtype=bool)
                for s in by_doc[int(did)]:
                    cover[s : s + k] = True
                new_text.append(" ".join(np.asarray(toks, dtype=object)[~cover]))
                new_n.append(int(cover.sum()))
            out.loc[hit, "text"] = new_text
            out.loc[hit, "n_removed"] = new_n
        return out

    from .common import bucketed_join

    rewritten = bucketed_join(docs, removals, on="doc_id", n_buckets=16, merge_fn=rewrite)
    tmp = ckpt + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    rewritten.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    ).write_parquet(tmp)
    shutil.rmtree(ckpt, ignore_errors=True)
    os.replace(tmp, ckpt)

    agg = (
        ray.data.read_parquet(ckpt, columns=["n_removed"])
        .map_batches(
            lambda df: pd.DataFrame(
                {
                    "d": [int((df["n_removed"] > 0).sum())],
                    "t": [int(df["n_removed"].sum())],
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .sum()
    )
    meta = {
        "fingerprint": fp,
        "n_docs_rewritten": int(agg["d"]),
        "n_tokens_removed": int(agg["t"]),
    }
    with open(fp_path, "w") as f:
        json.dump(meta, f)
    return ckpt, meta["n_docs_rewritten"], meta["n_tokens_removed"]


def run_curation_pipeline(
    input_dir: str,
    out_dir: str,
    quality_q: float = 0.75,
    train_fraction: float = 0.8,
    n_shards: int = 8,
    seed: int = 17,
    near_dup_jaccard: float | None = None,
    span_k: int | None = None,
) -> dict:
    """Run the full curation flow over ``<input_dir>/documents.parquet``;
    returns aggregate stats and writes ``out_dir/{train,val}/shard-*.parquet``
    plus per-split manifests and a run-level ``curation_manifest.json``.
    Deterministic end to end: same input + params → byte-stable shard
    contents (pinned by tests/test_curation.py).

    ``near_dup_jaccard`` upgrades the split from exact-dup-aware to
    NEAR-dup-aware: MinHash-LSH pairs over the dedup-survivor checkpoint
    (one banding shuffle, in-bucket exact-Jaccard verify) → distributed
    min-label connected components (Parquet-checkpointed under out_dir,
    resumable) → the split decision hashes each doc's cluster_rep instead
    of its own id, so a paraphrased copy can never straddle train/val.
    The rep map is bounded by the NEAR-DUP count (not the corpus) and
    broadcasts via one ray.put — the same budget argument as
    q72_dedup_survivors' drop set; a corpus whose near-dup set outgrew
    broadcast would switch the rep lookup to a bucketed join on doc_id."""
    import hashlib

    assert train_fraction == 0.8, "md5-prefix constant is built for 0.8"
    os.makedirs(out_dir, exist_ok=True)
    docs = read_table(input_dir, "documents", columns=["doc_id", "source", "text"])
    n_input = docs.count()

    # stage 1: exact dedup → Parquet checkpoint (quality needs two passes)
    ckpt = os.path.join(out_dir, "dedup_survivors")
    surv = _dedup_survivors(docs)
    surv = surv.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    os.makedirs(ckpt, exist_ok=True)
    surv.write_parquet(ckpt)
    surv_ds = ray.data.read_parquet(ckpt, columns=["doc_id", "source", "text"])
    n_dedup = surv_ds.count()

    # stage 1b (optional): near-dup clusters over the survivors — exact
    # dups are already gone, so these edges are purely the paraphrase set
    n_near_dup = 0
    rep_ref = None
    if near_dup_jaccard is not None:
        from .dedup import minhash_lsh_pairs_ds
        from .graph import connected_components_minlabel

        pairs = minhash_lsh_pairs_ds(
            input_dir,
            jaccard_threshold=near_dup_jaccard,
            docs_ds=ray.data.read_parquet(ckpt, columns=["doc_id", "text"]),
        )
        # fingerprint folds a CONTENT signature of the survivor checkpoint
        # (r5 hardening, same reasoning as _span_rewrite): the survivor
        # count alone would let a changed corpus with an unchanged dedup
        # count silently reuse stale CC labels — and therefore stale
        # cluster reps in the train/val split decision
        from ..state.manifest import content_signature

        labels = connected_components_minlabel(
            pairs,
            n_buckets=16,
            checkpoint_dir=os.path.join(out_dir, "near_dup_cc"),
            fingerprint=f"curate-cc|{near_dup_jaccard}|in={content_signature(ckpt)}",
        ).to_pandas()
        rep_map = (
            {}
            if labels.empty
            else dict(
                zip(
                    labels["doc_id"].astype(int).tolist(),
                    labels["cluster_rep"].astype(int).tolist(),
                )
            )
        )
        n_near_dup = len(rep_map)
        rep_ref = ray.put(rep_map)

    # stage 1c (optional): span-level dedup REWRITE between near-dup
    # clustering (which reads the ORIGINAL survivor text — detection
    # before surgery) and the quality gate (which must judge the text a
    # training run would actually consume). Own checkpoint + resume.
    n_span_docs = 0
    n_span_tokens = 0
    if span_k is not None:
        span_ckpt, n_span_docs, n_span_tokens = _span_rewrite(ckpt, out_dir, span_k)
        surv_ds = ray.data.read_parquet(span_ckpt, columns=["doc_id", "source", "text"])

    # stage 2: per-source quality thresholds → broadcast filter
    thr = _quality_thresholds(surv_ds, quality_q)
    tref = ray.put(thr)

    def gate_and_split(t: pa.Table) -> pa.Table:
        th = get_broadcast(tref)
        reps = get_broadcast(rep_ref) if rep_ref is not None else {}
        src = t.column("source").to_pandas()
        keep = _alpha_ratio(t).to_numpy() >= src.map(th).to_numpy(dtype="float64")
        t = t.filter(pa.array(keep))
        split = [
            "train"
            if hashlib.md5(str(reps.get(int(d), int(d))).encode("ascii")).hexdigest()
            < _TRAIN_HEX
            else "val"
            for d in t.column("doc_id").to_pylist()
        ]
        return t.append_column("split", pa.array(split, pa.string()))

    gated = surv_ds.map_batches(gate_and_split, batch_format="pyarrow")

    # stage 3: deterministic shard export per split
    stats = {}
    for split in ("train", "val"):
        sds = gated.filter(expr=f"split == '{split}'").drop_columns(["split"])
        stats[split] = shuffled_export(
            sds, "doc_id", os.path.join(out_dir, split), n_shards=n_shards, seed=seed
        )

    n_train = int(stats["train"]["n_rows"].sum())
    n_val = int(stats["val"]["n_rows"].sum())
    manifest = {
        "n_input": int(n_input),
        "n_after_dedup": int(n_dedup),
        "n_after_quality": n_train + n_val,
        "n_train": n_train,
        "n_val": n_val,
        "quality_q": quality_q,
        "thresholds": thr,
        "n_shards": n_shards,
        "seed": seed,
        "near_dup_jaccard": near_dup_jaccard,
        "n_near_dup_clustered": n_near_dup,
        "span_k": span_k,
        "n_docs_span_rewritten": n_span_docs,
        "n_span_tokens_removed": n_span_tokens,
    }
    with open(os.path.join(out_dir, "curation_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def curation_summary(sf_dir: str) -> pd.DataFrame:
    """Rows-only query: run the curation pipeline into /tmp and return its
    stage-count summary (one row) — counts pinned by tests/test_curation.py."""
    import shutil

    out = "/tmp/graft_curation"
    shutil.rmtree(out, ignore_errors=True)
    m = run_curation_pipeline(sf_dir, out, span_k=5)
    return pd.DataFrame(
        {
            "n_input": [m["n_input"]],
            "n_after_dedup": [m["n_after_dedup"]],
            "n_after_quality": [m["n_after_quality"]],
            "n_train": [m["n_train"]],
            "n_val": [m["n_val"]],
            "n_docs_span_rewritten": [m["n_docs_span_rewritten"]],
            "n_span_tokens_removed": [m["n_span_tokens_removed"]],
        }
    )
