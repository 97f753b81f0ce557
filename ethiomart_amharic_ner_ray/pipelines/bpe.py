"""Distributed BPE tokenizer training and application — the tokenizer-
construction stage of a training-data pipeline (learn merges on the corpus,
then tokenize the corpus with them).

The classic scaling trick (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units" — public): BPE never iterates the corpus.
It iterates the WORD-FREQUENCY TABLE, which is vocabulary-sized. So:

  pass 0  distributed word count over the corpus (the q35 partial shape:
          per-batch token counts collapse before ONE bucketed shuffle) —
          the only corpus-wide pass;
  round r per-batch weighted adjacent-pair counts over the (distributed)
          word table → pair partials (bounded by the pair vocabulary, not
          words) → argmax pair (max count, then lexicographically smallest)
          → map_batches applies the merge to every word's symbol list.

The word table is materialized per round — it is vocabulary-sized (the
point of the trick), so this is a bounded checkpoint, not a corpus
materialization. At 100 TB the word table itself is sharded across the
cluster and each round is two map_batches passes over it; the driver only
ever sees per-batch PAIR partials (symbol-vocab-bounded) and the single
winning pair.

Application (`bpe_token_counts`) re-scans the corpus once with the learned
merge ranks broadcast; encoding is per-DISTINCT-word with a per-worker memo
(words repeat massively — the memo turns per-token work into per-type work).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .common import bucketed_group_agg, read_table

_EOW = "</w>"


def _word_counts(sf_dir: str) -> "ray.data.Dataset":
    """Distributed exact (word, tf) table over documents (pass 0)."""
    from .textstats import _token_partials

    partials = _token_partials(read_table(sf_dir, "documents", columns=["doc_id", "text"]))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False).agg(tf=("tf", "sum"))

    return bucketed_group_agg(partials, ["token"], final, n_buckets=16)


def _init_symbols(t: pa.Table) -> pa.Table:
    words = t.column("token").to_pylist()
    syms = [list(w) + [_EOW] for w in words]
    return pa.table(
        {
            "token": t.column("token"),
            "tf": pc.cast(t.column("tf"), pa.int64()),
            "symbols": pa.array(syms, pa.list_(pa.string())),
        }
    )


def _pair_partials(t: pa.Table) -> pa.Table:
    """Weighted adjacent-pair counts for one word-table batch, collapsed to
    per-batch partials (pair vocabulary-bounded — never one row per word)."""
    syms = t.column("symbols")
    tf = t.column("tf").to_numpy(zero_copy_only=False)
    counts: dict[tuple[str, str], int] = {}
    for i, s in enumerate(syms.to_pylist()):
        w = int(tf[i])
        for a, b in zip(s, s[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + w
    if not counts:
        return pa.table(
            {
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "p_n": pa.array([], pa.int64()),
            }
        )
    ls, rs = zip(*counts.keys())
    return pa.table(
        {
            "left": pa.array(list(ls), pa.string()),
            "right": pa.array(list(rs), pa.string()),
            "p_n": pa.array(list(counts.values()), pa.int64()),
        }
    )


def _merge_word(s: list[str], left: str, right: str) -> list[str]:
    """Apply one merge to one symbol sequence (left-to-right, the classic
    in-place scan: after a merge the NEW symbol participates in the next
    comparison, matching the reference algorithm's re-scan semantics)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        if i + 1 < n and s[i] == left and s[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def bpe_train(sf_dir: str, n_merges: int = 20) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges over the documents corpus. Returns the
    merge table (rank, left, right, pair_count) — deterministic: the winner
    is the max weighted pair count, ties broken by lexicographic (left,
    right). Stops early when no pair occurs twice."""
    words = _word_counts(sf_dir).map_batches(_init_symbols, batch_format="pyarrow")
    # vocabulary-sized checkpoint per round (see module docstring)
    words = words.materialize()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        parts = words.map_batches(_pair_partials, batch_format="pyarrow").to_pandas()
        if not len(parts):
            break
        g = parts.groupby(["left", "right"], as_index=False).agg(n=("p_n", "sum"))
        g = g.sort_values(["n", "left", "right"], ascending=[False, True, True], kind="mergesort")
        best = g.iloc[0]
        if int(best["n"]) < 2:
            break
        left, right = str(best["left"]), str(best["right"])
        merges.append((rank, left, right, int(best["n"])))

        def apply_merge(t: pa.Table, left=left, right=right) -> pa.Table:
            merged = [_merge_word(s, left, right) for s in t.column("symbols").to_pylist()]
            return pa.table(
                {
                    "token": t.column("token"),
                    "tf": t.column("tf"),
                    "symbols": pa.array(merged, pa.list_(pa.string())),
                }
            )

        words = words.map_batches(apply_merge, batch_format="pyarrow").materialize()

    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"}
    )


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with learned merges: repeatedly apply the
    LOWEST-RANK applicable merge (the standard BPE encode order, which
    reproduces training exactly on the training corpus)."""
    s = list(word) + [_EOW]
    while len(s) > 1:
        best_rank, best_i = None, -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # apply the winning merge EVERYWHERE in the word (one rank = one
        # training round, which merged all occurrences at once)
        s = _merge_word(s, s[best_i], s[best_i + 1])
    return s


def bpe_token_counts(sf_dir: str, n_merges: int = 20) -> "ray.data.Dataset":
    """Tokenize the corpus with freshly learned merges: per document, the
    BPE token count. The merge table is broadcast once (ray.put); each
    worker memoizes word→count, so cost is per distinct word per worker,
    not per token."""
    import numpy as np

    merges = bpe_train(sf_dir, n_merges=n_merges)
    ranks = {(l, r): int(k) for k, l, r in zip(merges["rank"], merges["left"], merges["right"])}
    ref = ray.put(ranks)

    def count_batch(t: pa.Table) -> pa.Table:
        from .common import get_broadcast

        rk = get_broadcast(ref)
        memo: dict[str, int] = {}
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n_rows = t.num_rows
        counts = np.zeros(n_rows, dtype=np.int64)
        for p, w in zip(parent, flat.to_pylist()):
            if w == "":
                continue
            c = memo.get(w)
            if c is None:
                c = len(bpe_encode_word(w, rk))
                memo[w] = c
            counts[p] += c
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bpe_tokens": pa.array(counts),
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        count_batch, batch_format="pyarrow"
    )
