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
    """Distributed exact (word, tf) table over documents (pass 0).

    BPE needs only term frequency (not document frequency), so the partial
    is a pure-Arrow ``value_counts`` over the flattened token stream — no
    ``to_pylist`` materialization, no pandas round-trip (the shared
    q35-family partial pays both for its per-doc df counts)."""

    def partial(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        flat = pc.list_flatten(pc.split_pattern_regex(trimmed, pattern=r"\s+"))
        vc = flat.value_counts()
        tok = vc.field("values")
        out = pa.table({"token": tok, "tf": pc.cast(vc.field("counts"), pa.int64())})
        return out.filter(pc.not_equal(tok, ""))

    ds = read_table(sf_dir, "documents", columns=["text"])
    partials = ds.map_batches(partial, batch_format="pyarrow")

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


@ray.remote(num_cpus=0)
class _BpeShardActor:
    """One shard of the word-frequency table, held in memory across merge
    rounds. BPE training is the textbook case for dropping from Dataset to
    actors: the state (a vocabulary shard) is bounded and mutated every
    round, and the per-round exchange is tiny (one (left, right) broadcast
    down, pair-vocab-bounded count partials up). The round-3 Dataset-only
    loop paid TWO full Ray jobs per round (pair-count pass + apply pass
    with a materialize) — ~150 ms/round of pure orchestration at sf0.1;
    the actor loop pays one sub-ms RPC. At 100 TB the word table is still
    vocabulary-sized (the Sennrich trick, module docstring): shards scale
    with the cluster, the driver only ever sees pair partials."""

    def __init__(self, blocks: list) -> None:
        # refs nested inside a list are NOT auto-dereferenced by Ray
        blocks = ray.get(list(blocks)) if blocks else []
        tabs = [
            t.select(["token", "tf"]).replace_schema_metadata(None)
            for t in (
                b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
                for b in blocks
            )
            # split(equal=True) pads with schema-less empty blocks
            if "token" in t.schema.names and t.num_rows
        ]
        t = pa.concat_tables(tabs, promote_options="default") if tabs else None
        if t is None or t.num_rows == 0:
            self.tf: list[int] = []
            self.syms: list[list[str]] = []
        else:
            self.tf = [int(x) for x in t.column("tf").to_pylist()]
            self.syms = [list(w) + [_EOW] for w in t.column("token").to_pylist()]
        # snapshot BEFORE any merge mutates self.syms into product symbols
        self._alphabet: set[str] = set()
        for s in self.syms:
            self._alphabet.update(s)
        self._alphabet.discard(_EOW)

    def _counts(self) -> dict[tuple[str, str], int]:
        counts: dict[tuple[str, str], int] = {}
        for w, s in zip(self.tf, self.syms):
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + w
        return counts

    @staticmethod
    def _to_table(counts: dict[tuple[str, str], int]) -> pa.Table:
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

    def pair_counts(self) -> pa.Table:
        return self._to_table(self._counts())

    def alphabet(self) -> list[str]:
        """Distinct base characters of this shard's tokens (snapshotted at
        init). The word table holds every distinct corpus token, so the
        union over shards equals the corpus alphabet — build_vocab's
        separate corpus scan is redundant when training just ran."""
        return sorted(self._alphabet)

    def apply_and_count(self, left: str, right: str) -> pa.Table:
        """Fused round step: apply the winning merge to every word in the
        shard, then return the NEW pair partials — one RPC per round."""
        self.syms = [
            _merge_word(s, left, right) if left in s else s for s in self.syms
        ]
        return self._to_table(self._counts())


def bpe_train(
    sf_dir: str, n_merges: int = 20, n_shards: int = 8, return_alphabet: bool = False
):
    """Learn ``n_merges`` BPE merges over the documents corpus. Returns the
    merge table (rank, left, right, pair_count) — deterministic: the winner
    is the max weighted pair count, ties broken by lexicographic (left,
    right). Stops early when no pair occurs twice.

    Pass 0 (the only corpus-wide pass) is a distributed word count; the
    merge rounds run on an actor pool holding word-table shards
    (``_BpeShardActor``) — integer partials summed on the driver are
    order-independent, so the result is bit-identical to the round-3
    Dataset-loop implementation (pinned by tests/test_bpe.py)."""
    words = _word_counts(sf_dir).materialize()
    # num_cpus=0 actors: round work is a short burst (vocab-shard scan),
    # and reserving whole CPUs can deadlock against a concurrently
    # running Dataset job on a small pool (the test fixture's 4-CPU
    # session). Cap shards by the pool so splits stay non-trivial.
    n_shards = max(1, min(n_shards, int(ray.cluster_resources().get("CPU", n_shards))))
    # round-robin the materialized block refs — NOT split(equal=True),
    # which silently DROPS rows to equalize shard sizes
    refs = words.to_arrow_refs()
    n_shards = max(1, min(n_shards, len(refs)))
    shards: list[list] = [[] for _ in range(n_shards)]
    for i, r in enumerate(refs):
        shards[i % n_shards].append(r)
    actors = [_BpeShardActor.remote(rs) for rs in shards]
    alphabet: list[str] = []
    try:
        parts_refs = [a.pair_counts.remote() for a in actors]
        if return_alphabet:
            alpha_refs = [a.alphabet.remote() for a in actors]
        merges: list[tuple[int, str, str, int]] = []
        for rank in range(n_merges):
            parts = pa.concat_tables(ray.get(parts_refs)).to_pandas()
            if not len(parts):
                break
            g = parts.groupby(["left", "right"], as_index=False).agg(n=("p_n", "sum"))
            g = g.sort_values(
                ["n", "left", "right"], ascending=[False, True, True], kind="mergesort"
            )
            best = g.iloc[0]
            if int(best["n"]) < 2:
                break
            left, right = str(best["left"]), str(best["right"])
            merges.append((rank, left, right, int(best["n"])))
            if rank + 1 < n_merges:
                parts_refs = [a.apply_and_count.remote(left, right) for a in actors]
        if return_alphabet:
            alphabet = sorted(set().union(*ray.get(alpha_refs))) if alpha_refs else []
    finally:
        for a in actors:
            ray.kill(a)

    out = pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"}
    )
    return (out, alphabet) if return_alphabet else out


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
