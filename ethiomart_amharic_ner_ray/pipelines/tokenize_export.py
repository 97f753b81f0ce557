"""The pretraining last mile: BPE-tokenize the corpus with a
distributed-trained tokenizer, concatenate every document's ids (with an
end-of-document separator) into ONE global token stream in doc_id order,
and slice that stream into fixed-length training sequences — the
concat-and-chunk packing every causal-LM data pipeline ships (GPT-2/3
style), as opposed to textstats.doc_pack_bins' per-document greedy binning.

Distributed shape (nothing token-stream-sized ever leaves the workers):

  1. ``bpe.bpe_train`` fits the merge table (already distributed); the
     vocabulary is derived deterministically — sorted base symbols, then
     merge products in rank order, then the <eod> sentinel — and broadcast
     once as a dict.
  2. ONE encode pass emits (doc_id, ids, n) rows; word→ids memoized per
     worker per distinct word.
  3. The global offset of each document needs a prefix sum in doc_id
     order: ONE counting pass reduces per-(doc_id range) token totals
     (R ints to the driver — q95's distributed-ECDF offset trick), then
     inside each range bucket a sort+cumsum finishes the prefix locally.
  4. Each document splits its id run into per-sequence SPANS
     (seq_id = global_pos // seq_len); spans ride ONE bucketed exchange
     keyed by seq_id, and each sequence reassembles by span order inside
     its bucket. The final partial sequence is dropped (standard).

Determinism: doc_id order defines the stream; ties impossible (doc_id is
unique). Output is invariant to input block layout — the conformance test
pins the distributed result against an in-process reference token stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .bpe import _EOW, bpe_encode_word, bpe_train
from .common import bucketed_group_agg, get_broadcast, read_table

EOD = "<eod>"


def build_vocab(
    sf_dir: str, merges: pd.DataFrame, alphabet: list[str] | None = None
) -> dict[str, int]:
    """Deterministic symbol→id table: sorted distinct base symbols (corpus
    characters + the end-of-word marker), then each merge's product symbol
    in rank order (skipping products already present), then <eod>.

    Pass ``alphabet`` (from ``bpe_train(..., return_alphabet=True)``, which
    reads it off the word-table shards) to skip the corpus scan — the word
    table holds every distinct token, so its character set IS the corpus
    alphabet."""
    if alphabet is not None:
        base = list(alphabet)
    else:
        ds = read_table(sf_dir, "documents", columns=["text"])

        def chars(t: pa.Table) -> pa.Table:
            txt = pc.utf8_trim_whitespace(t.column("text"))
            toks = pc.list_flatten(pc.split_pattern_regex(txt, pattern=r"\s+")).to_pylist()
            seen = set()
            for w in toks:
                seen.update(w)
            return pa.table({"sym": pa.array(sorted(seen), pa.string())})

        def distinct(df: pd.DataFrame) -> pd.DataFrame:
            return df.drop_duplicates()

        base = (
            bucketed_group_agg(
                ds.map_batches(chars, batch_format="pyarrow"), ["sym"], distinct, n_buckets=8
            )
            .to_pandas()["sym"]  # alphabet-sized, driver-safe by definition
            .tolist()
        )
    vocab: dict[str, int] = {}
    for s in sorted(base) + [_EOW]:
        if s not in vocab:
            vocab[s] = len(vocab)
    for left, right in zip(merges["left"], merges["right"]):
        prod = left + right
        if prod not in vocab:
            vocab[prod] = len(vocab)
    vocab[EOD] = len(vocab)
    return vocab


def tokenized_sequences(
    sf_dir: str,
    n_merges: int = 20,
    seq_len: int = 128,
    n_ranges: int = 32,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """(seq_id, input_ids list<int32>[seq_len]) — the packed training
    sequences of the whole corpus, exactly as an in-process
    encode→concat→chunk would produce them."""
    merges, alphabet = bpe_train(sf_dir, n_merges=n_merges, return_alphabet=True)
    ranks = {
        (l, r): int(k) for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    vocab = build_vocab(sf_dir, merges, alphabet=alphabet)
    eod_id = vocab[EOD]
    ref = ray.put((ranks, vocab))

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def encode(t: pa.Table) -> pa.Table:
        # factorize-then-encode: BPE's per-word merge loop is inherently
        # sequential Python, so run it ONCE PER UNIQUE WORD in the batch
        # (dictionary_encode gives uniques + codes zero-copy), then rebuild
        # every document's id list with numpy gathers over the unique-word
        # id pool — no Python loop over the token stream. Zipf makes the
        # unique set a small fraction of the token count, so the Python
        # cost drops from O(tokens) to O(uniques) per batch.
        rk, vc = get_broadcast(ref)
        txt = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(txt, pattern=r"\s+")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        n_docs = t.num_rows
        dictd = flat.combine_chunks().dictionary_encode() if isinstance(
            flat, pa.ChunkedArray
        ) else flat.dictionary_encode()
        codes = dictd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_words = dictd.dictionary.to_pylist()

        uid_chunks: list[list[int]] = []
        uniq_lens = np.empty(len(uniq_words), dtype=np.int64)
        for u, w in enumerate(uniq_words):
            ids = [vc[s] for s in bpe_encode_word(w, rk)] if w else []
            uid_chunks.append(ids)
            uniq_lens[u] = len(ids)
        uid_off = np.zeros(len(uniq_words) + 1, dtype=np.int64)
        np.cumsum(uniq_lens, out=uid_off[1:])
        uid_flat = np.fromiter(
            (i for ids in uid_chunks for i in ids), dtype=np.int32, count=int(uid_off[-1])
        )

        tok_len = uniq_lens[codes]
        starts = uid_off[codes]
        total = int(tok_len.sum())
        # flat gather indices: for each token, starts[tok] + 0..len-1
        cum = np.cumsum(tok_len)
        out_idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(cum - tok_len, tok_len)
            + np.repeat(starts, tok_len)
        )
        flat_ids = uid_flat[out_idx]
        doc_n = np.bincount(
            parent.astype(np.int64), weights=tok_len.astype(np.float64), minlength=n_docs
        ).astype(np.int64)
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(doc_n, out=offsets[1:])
        # per-batch id volume is block-size bounded, comfortably < 2^31
        ids_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat_ids, pa.int32())
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "ids": ids_arr,
                # +1 for the <eod> separator every document contributes
                "n": pa.array((doc_n + 1), pa.int64()),
            }
        )

    enc = ds.map_batches(encode, batch_format="pyarrow").materialize()
    # (at 100 TB this materialize is the Parquet ids-checkpoint — the
    # mentions-checkpoint pattern; iterations/boundary passes re-read it)

    # ---- global prefix offsets in doc_id order (q95's ECDF shape) -------
    mm = enc.map_batches(
        lambda df: pd.DataFrame({"mn": [df["doc_id"].min()], "mx": [df["doc_id"].max()]}),
        batch_format="pandas",
    ).to_pandas()
    lo, hi = int(mm["mn"].min()), int(mm["mx"].max())
    bounds = np.linspace(lo, hi, n_ranges + 1)[1:-1]

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        rb = np.searchsorted(bounds, df["doc_id"].to_numpy(), side="right")
        return pd.DataFrame({"_rb": rb, "n": df["n"]}).groupby("_rb", as_index=False)["n"].sum()

    counts = (
        enc.map_batches(cnt, batch_format="pandas")
        .to_pandas()
        .groupby("_rb", as_index=False)["n"]
        .sum()
        .sort_values("_rb", kind="mergesort")
    )
    counts["offset"] = counts["n"].cumsum() - counts["n"]
    range_offsets = dict(zip(counts["_rb"], counts["offset"]))
    total_tokens = int(counts["n"].sum())
    n_seqs = total_tokens // seq_len

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rb"] = np.searchsorted(bounds, df["doc_id"].to_numpy(), side="right").astype("int64")
        return df

    def spans(df: pd.DataFrame) -> pd.DataFrame:
        # a range bucket is CONTIGUOUS in the global token order, so its
        # docs' runs concatenate into one flat stream starting at the
        # range offset; sequence boundaries are then a fixed seq_len grid
        # over that stream. Chunk rows are emitted per grid segment
        # (#seqs-in-range + 1 rows), not per (doc, seq) — the round-3
        # per-doc while-loop is gone and assemble sees the identical
        # (seq_id, start)-ordered content.
        out_seq: list[int] = []
        out_start: list[int] = []
        out_chunk: list[list[int]] = []
        for rb, grp in df.groupby("_rb"):
            g = grp.sort_values("doc_id", kind="mergesort")
            lens = np.fromiter((len(x) for x in g["ids"]), dtype=np.int64, count=len(g))
            total = int(lens.sum()) + len(g)
            if total == 0:
                continue
            flat = np.empty(total, dtype=np.int64)
            eod_pos = np.cumsum(lens + 1) - 1
            mask = np.ones(total, dtype=bool)
            mask[eod_pos] = False
            flat[eod_pos] = eod_id
            if lens.sum():
                flat[mask] = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in g["ids"]]
                )
            off0 = int(range_offsets.get(rb, 0))
            s = (off0 + np.arange(total)) // seq_len
            cut = np.flatnonzero(np.diff(s)) + 1
            starts_i = np.concatenate(([0], cut))
            ends_i = np.concatenate((cut, [total]))
            for a, b in zip(starts_i, ends_i):
                seq = int(s[a])
                if seq < n_seqs:
                    out_seq.append(seq)
                    out_start.append(int((off0 + a) % seq_len))
                    out_chunk.append(flat[a:b].tolist())
        if not out_seq:
            return pd.DataFrame({"seq_id": pd.array([], dtype="int64"), "start": pd.array([], dtype="int64"), "chunk": pd.Series([], dtype=object)})
        return pd.DataFrame(
            {
                "seq_id": pd.array(out_seq, dtype="int64"),
                "start": pd.array(out_start, dtype="int64"),
                "chunk": out_chunk,
            }
        )

    spanned = bucketed_group_agg(
        enc.map_batches(stamp, batch_format="pandas"), ["_rb"], spans, n_buckets=n_ranges
    )

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for seq_id, grp in df.groupby("seq_id"):
            g = grp.sort_values("start", kind="mergesort")
            ids: list[int] = []
            for c in g["chunk"]:
                ids.extend(c)
            rows.append({"seq_id": int(seq_id), "input_ids": ids})
        out = pd.DataFrame(rows)
        return out

    return bucketed_group_agg(spanned, ["seq_id"], assemble, n_buckets=n_buckets)


def reference_tokenized_sequences(
    docs: pd.DataFrame, merges: pd.DataFrame, vocab: dict[str, int], seq_len: int = 128
) -> list[list[int]]:
    """In-process encode→concat→chunk reference (doc_id order), the
    conformance anchor."""
    ranks = {
        (l, r): int(k) for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    stream: list[int] = []
    memo: dict[str, list[int]] = {}
    for _, row in docs.sort_values("doc_id").iterrows():
        for w in str(row["text"]).split():
            ids = memo.get(w)
            if ids is None:
                ids = [vocab[s] for s in bpe_encode_word(w, ranks)]
                memo[w] = ids
            stream.extend(ids)
        stream.append(vocab[EOD])
    n_seqs = len(stream) // seq_len
    return [stream[i * seq_len : (i + 1) * seq_len] for i in range(n_seqs)]
