"""Labeled-data preparation pipeline — the reference's §3.2 path
(data_pipeline.prepare_labeled_data: read → repair → validate → split →
quality report) re-expressed on Ray Data.

Input: a Dataset of labeled sentences (``tokens: list<string>, tags:
list<string>``). At scale these come from Parquet; for the self-contained
fixtures they are derived deterministically from synthetic transcripts via
the rule tagger (stages/ner_scorer.py), which plays the role of the
reference's shipped CoNLL corpus.

Split: the reference uses ``train_test_split(random_state=42, shuffle)``
(data_pipeline.py:246-251) — fine for 3k sentences, not for 10^12: a global
shuffle just to partition is wasted movement. Here the split is a
deterministic HASH split (sha1 of the joined tokens mod 100 < 80), which is
stable under resharding/resume and needs no shuffle at all; the reference's
80/20 proportions are preserved in expectation. (For small offline corpora
Ray's ``Dataset.train_test_split`` reproduces the reference's shuffle-split
directly.)
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.iob import clean_tags, fix_entity_tags, validate_sentence
from ..schemas import BIO_LABELS


def sentences_from_transcripts(transcripts_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministic labeled sentences: normalize + rule-tag each turn
    (the fixture-generation path; a real corpus reads Parquet directly)."""
    from ..stages.ner_scorer import NerScorer
    from ..stages.normalize import make_normalizer

    ds = transcripts_ds.map_batches(make_normalizer(1), batch_format="pyarrow")

    class Tagger(NerScorer):
        def __call__(self, batch: pa.Table) -> pa.Table:  # tokens/tags, not mentions
            toks_col = []
            tags_col = []
            for text in batch.column("clean_text").to_pylist():
                tokens, tags = self._tag_sentence(text)
                toks_col.append(tokens)
                tags_col.append(tags)
            return pa.table(
                {
                    "tokens": pa.array(toks_col, pa.list_(pa.string())),
                    "tags": pa.array(tags_col, pa.list_(pa.string())),
                }
            )

    return ds.map_batches(Tagger, batch_format="pyarrow", batch_size=2048, concurrency=(1, 8))


def prepare_labeled(
    sentences_ds: "ray.data.Dataset",
    label_set: frozenset[str] = frozenset(BIO_LABELS),
    train_fraction: float = 0.8,
) -> "ray.data.Dataset":
    """repair (M6) → clean (M8) → validate (M7, drop) → hash split.

    Adds ``split: 'train'|'val'`` and ``n_tokens``; invalid sentences are
    dropped (the reference counts them — see quality_report)."""

    def prep(batch: pa.Table) -> pa.Table:
        toks_out, tags_out, split_out, ntok_out = [], [], [], []
        for tokens, tags in zip(
            batch.column("tokens").to_pylist(), batch.column("tags").to_pylist()
        ):
            tags = fix_entity_tags(tokens, tags)  # repair (M6) …
            tags = clean_tags(tags, label_set)  # … then clean (M8)
            if not tokens or not validate_sentence(tokens, tags):
                continue
            h = int.from_bytes(
                hashlib.sha1(" ".join(tokens).encode("utf-8")).digest()[:4], "big"
            )
            toks_out.append(tokens)
            tags_out.append(tags)
            split_out.append("train" if (h % 100) < train_fraction * 100 else "val")
            ntok_out.append(len(tokens))
        return pa.table(
            {
                "tokens": pa.array(toks_out, pa.list_(pa.string())),
                "tags": pa.array(tags_out, pa.list_(pa.string())),
                "split": pa.array(split_out, pa.string()),
                "n_tokens": pa.array(ntok_out, pa.int32()),
            }
        )

    return sentences_ds.map_batches(prep, batch_format="pyarrow")


def tag_distribution(prepared_ds: "ray.data.Dataset") -> pd.DataFrame:
    """A6: global tag counts (per-batch Counter partials → driver merge —
    the tag vocabulary is tiny, so no shuffle at all)."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for tags in batch.column("tags").to_pylist():
            c.update(tags)
        items = sorted(c.items())
        return pa.table(
            {
                "tag": pa.array([k for k, _ in items], pa.string()),
                "n": pa.array([v for _, v in items], pa.int64()),
            }
        )

    total: Counter = Counter()
    for b in prepared_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for tag, n in zip(b.column("tag").to_pylist(), b.column("n").to_pylist()):
            total[tag] += n
    rows = sorted(total.items())
    return pd.DataFrame({"tag": [t for t, _ in rows], "n": pd.array([n for _, n in rows], dtype="int64")})


def quality_report(prepared_ds: "ray.data.Dataset") -> pd.DataFrame:
    """A7/A8-style run metrics: per-split sentence counts + length stats +
    per-type entity openings (B- counts). One-row-per-split DataFrame, the
    Parquet-native analogue of the reference's data_quality_report.json."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for split, g in df.groupby("split"):
            b_counts = {}
            for tags in g["tags"]:
                for t in tags:
                    if t.startswith("B-"):
                        b_counts[t[2:]] = b_counts.get(t[2:], 0) + 1
            rows.append(
                {
                    "split": split,
                    "p_n": len(g),
                    "p_tok": int(g["n_tokens"].sum()),
                    "p_min": int(g["n_tokens"].min()),
                    "p_max": int(g["n_tokens"].max()),
                    **{f"p_b_{k.lower()}": v for k, v in sorted(b_counts.items())},
                }
            )
        return pd.DataFrame(rows)

    parts = prepared_ds.map_batches(partial, batch_format="pandas").to_pandas()
    # vectorized merge of the bounded partials (rows ≈ batches × splits)
    b_cols = sorted(c for c in parts.columns if c.startswith("p_b_"))
    agg = parts.groupby("split").agg(
        n_sentences=("p_n", "sum"),
        n_tokens=("p_tok", "sum"),
        min_len=("p_min", "min"),
        max_len=("p_max", "max"),
        **{f"b_{c[4:]}": (c, "sum") for c in b_cols},
    )
    # round_away == DuckDB round (house convention; pandas .round is
    # half-even) — avg_len is SQL-checked against the exported CoNLL shards
    from .common import round_away

    agg["avg_len"] = round_away(
        (agg["n_tokens"] / agg["n_sentences"].clip(lower=1)).to_numpy(dtype="float64"), 4
    )
    agg = agg.reset_index().sort_values("split").reset_index(drop=True)
    cols = ["split", "n_sentences", "n_tokens", "avg_len", "min_len", "max_len"] + sorted(
        c for c in agg.columns if c.startswith("b_")
    )
    out = agg[cols].copy()
    for c in out.columns:
        if c.startswith(("n_", "min_", "max_", "b_")):
            out[c] = out[c].astype("int64")
    return out


def export_conll(prepared_ds: "ray.data.Dataset", out_dir: str) -> dict:
    """Distributed CoNLL export (S8/S9 at scale): each task writes its
    block's sentences as one atomic shard file under
    ``<out_dir>/<split>/part-<hash>-<uid>.conll`` — no driver-side
    sentence materialization. Returns per-split sentence counts.

    Shard names carry a hash of ALL the block's sentences (debuggability)
    plus a per-task unique id: two blocks that share a sentence prefix —
    or are entirely identical, as in duplicate-heavy corpora — can never
    map to the same file and silently overwrite each other, and
    concurrent tasks can never race on the same ``.tmp`` path. Reruns are
    idempotent at the DIRECTORY level instead of the file level: shards
    land in a fresh staging dir and each split dir is atomically swapped
    into place only after the whole export succeeds, so a rerun with
    different block boundaries can't leave stale differently-named shards
    behind for readers to glob in."""
    import os
    import shutil
    import uuid

    from ..functions.conll import write_conll

    staging = os.path.join(out_dir, f".staging-{uuid.uuid4().hex[:8]}")
    os.makedirs(os.path.join(staging, "train"), exist_ok=True)
    os.makedirs(os.path.join(staging, "val"), exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        h = hashlib.blake2b(digest_size=6)
        for t in batch.column("tokens").to_pylist():
            h.update(" ".join(t).encode("utf-8"))
            h.update(b"\x00")
        shard = f"{h.hexdigest()}-{uuid.uuid4().hex[:8]}"
        counts = {"train": 0, "val": 0}
        by_split: dict[str, list] = {"train": [], "val": []}
        for tokens, tags, split in zip(
            batch.column("tokens").to_pylist(),
            batch.column("tags").to_pylist(),
            batch.column("split").to_pylist(),
        ):
            by_split[split].append(list(zip(tokens, tags)))
        for split, sents in by_split.items():
            if sents:
                write_conll(sents, os.path.join(staging, split, f"part-{shard}.conll"))
                counts[split] += len(sents)
        return pa.table(
            {
                "split": pa.array(["train", "val"], pa.string()),
                "n": pa.array([counts["train"], counts["val"]], pa.int64()),
            }
        )

    try:
        parts = prepared_ds.map_batches(write_shard, batch_format="pyarrow", batch_size=4096)
        totals = {"train": 0, "val": 0}
        for b in parts.iter_batches(batch_format="pyarrow"):
            for s, n in zip(b.column("split").to_pylist(), b.column("n").to_pylist()):
                totals[s] += n
        for split in ("train", "val"):
            final = os.path.join(out_dir, split)
            shutil.rmtree(final, ignore_errors=True)
            os.replace(os.path.join(staging, split), final)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return totals
