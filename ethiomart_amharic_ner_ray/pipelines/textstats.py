"""Text-analysis operators over the documents table — the training-data-
pipeline additions (language-ID, quality scoring, token counting, document
fingerprinting). All vectorized (pyarrow.compute kernels) or hashlib-per-row
in a batch loop; each SQL-checkable variant mirrors its DuckDB oracle
expression exactly (same rounding, same empty-string edge cases).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .common import read_table, round_away, stable_hash64


def q12_token_count(sf_dir: str) -> "ray.data.Dataset":
    """Whitespace token count per document (vectorized split + list length).
    Empty/whitespace-only text counts 0 (Python str.split semantics; the
    oracle CASEs the regexp_split [''] artifact away)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        n = pc.list_value_length(toks)
        n = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int32()), n)
        return pa.table({"doc_id": t.column("doc_id"), "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def q13_quality_score(sf_dir: str) -> "ray.data.Dataset":
    """Quality heuristics: length, alpha ratio, space ratio, mean token
    length — the length/punct/stopword-ratio family of corpus filters."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        text = t.column("text")
        n_chars = pc.utf8_length(text)
        alpha = pc.utf8_length(pc.replace_substring_regex(text, pattern=r"[^a-zA-Z]", replacement=""))
        spaces = pc.utf8_length(pc.replace_substring_regex(text, pattern=r"[^ ]", replacement=""))
        denom = pc.max_element_wise(pc.cast(n_chars, pa.float64()), pa.scalar(1.0))
        alpha_ratio = pc.round(pc.divide(pc.cast(alpha, pa.float64()), denom), ndigits=4, round_mode="half_towards_infinity")
        space_ratio = pc.round(pc.divide(pc.cast(spaces, pa.float64()), denom), ndigits=4, round_mode="half_towards_infinity")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars2": pc.cast(n_chars, pa.int64()),
                "alpha_ratio": alpha_ratio,
                "space_ratio": space_ratio,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q14_lang_id(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic heuristic language ID: Ethiopic script → 'am', common
    English function words → 'en', else 'other'. (A real n-gram model slots
    into the same stage; the heuristic keeps the oracle SQL-expressible.)"""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        text = t.column("text")
        has_am = pc.match_substring_regex(text, "[ሀ-፿]")
        has_en = pc.match_substring_regex(text, r"\b(the|and|of|a)\b")
        pred = pc.if_else(has_am, "am", pc.if_else(has_en, "en", "other"))
        return pa.table({"doc_id": t.column("doc_id"), "pred_lang": pred})

    return ds.map_batches(f, batch_format="pyarrow")


def q15_doc_fingerprint(sf_dir: str) -> "ray.data.Dataset":
    """Content fingerprint: sha256 over lower(trim(text)) — the reference's
    message_hash recipe (telegram_scraper.py:151-155) as a dedup key."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.sha256(x.strip().lower().encode("utf-8")).hexdigest()
            for x in t.column("text").to_pylist()
        ]
        return pa.table({"doc_id": t.column("doc_id"), "fp": pa.array(fps, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def rolling_fingerprints(sf_dir: str, window: int = 8, base: int = 257, mod: int = (1 << 61) - 1) -> "ray.data.Dataset":
    """Rolling-hash (Rabin-Karp) shingle fingerprints per document: the
    document-fingerprinting primitive for content-defined dedup. Emits the
    min/max/count of the rolling hashes per doc (rows-only check).

    Vectorized: H[i] = sum_k b[i+k] * base^(w-1-k) mod p (the value the
    scalar multiply-subtract recurrence maintains) is computed for the
    batch's CONCATENATED bytes with ``window`` table gathers total —
    per-position byte tables T_k[v] = v*base^(w-1-k) mod p keep every
    addend < p, and for the defaults (w=8, p=2^61-1) the un-reduced sum is
    <= w*(p-1) < 2^64, so uint64 accumulation is exact and one final
    ``% p`` lands on the scalar loop's values bit-for-bit. Windows that
    would straddle a document boundary are simply never sliced."""
    import numpy as np

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    if window * (mod - 1) >= (1 << 64):
        raise ValueError("window*(mod-1) must fit in uint64 for exact accumulation")

    def f(t: pa.Table) -> pa.Table:
        # tables built per batch call (window x 256 uint64 — trivially cheap)
        tables = np.array(
            [[(v * pow(base, window - 1 - k, mod)) % mod for v in range(256)] for k in range(window)],
            dtype=np.uint64,
        )
        blobs = [x.encode("utf-8") for x in t.column("text").to_pylist()]
        lens = np.array([len(b) for b in blobs], dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        total = int(offs[-1])
        H = None
        if total >= window:
            cat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            s = np.zeros(total - window + 1, dtype=np.uint64)
            for k in range(window):
                s += tables[k][cat[k : total - window + 1 + k]]
            H = s % np.uint64(mod)
        mins, maxs, counts = [], [], []
        for d in range(len(blobs)):
            if lens[d] < window:
                mins.append(0)
                maxs.append(0)
                counts.append(0)
                continue
            seg = H[offs[d] : offs[d + 1] - window + 1]
            mins.append(int(seg.min()))
            maxs.append(int(seg.max()))
            counts.append(seg.size)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "fp_min": pa.array(mins, pa.int64()),
                "fp_max": pa.array(maxs, pa.int64()),
                "n_shingles": pa.array(counts, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q26_bpe_token_estimate(sf_dir: str) -> "ray.data.Dataset":
    """BPE-ish token count per document: runs of letters, single digits, and
    single non-alnum-non-space chars (the GPT-2 pre-tokenizer's coarse
    shape, restricted to RE2-compatible syntax so the DuckDB oracle uses the
    IDENTICAL pattern). Vectorized: strip everything that is NOT a token
    start, then count the extracted pieces."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    pattern = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\r\n]"

    def f(t: pa.Table) -> pa.Table:
        # count_substring_regex counts non-overlapping matches — the same
        # semantics as DuckDB's len(regexp_extract_all(...))
        n = pc.count_substring_regex(t.column("text"), pattern)
        return pa.table({"doc_id": t.column("doc_id"), "n_bpe_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def q35_vocab_topk(sf_dir: str, k: int = 100) -> "pd.DataFrame":
    """Corpus vocabulary statistics (the wordcount shape every training-data
    pipeline needs): per token, document frequency (docs containing it) and
    total term frequency, top-k by (tf desc, token asc).

    Tokenization is Arrow-vectorized (trim → regex split → list_flatten with
    list_parent_indices carrying doc ids); per-batch (doc, token) counts
    collapse to per-token partials BEFORE the shuffle, so the exchange ships
    one row per distinct token per batch — never raw tokens. The per-bucket
    final pre-top-ks to k rows, bounding the driver collect to k × buckets.
    df partials sum exactly because a document never spans batches."""
    import pandas as pd

    from .common import bucketed_group_agg

    partials = _token_partials(read_table(sf_dir, "documents", columns=["doc_id", "text"]))

    def final(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("token", as_index=False).agg(df=("df", "sum"), tf=("tf", "sum"))
        return g.sort_values(["tf", "token"], ascending=[False, True]).head(k)

    cand = bucketed_group_agg(partials, ["token"], final, n_buckets=16).to_pandas()
    return (
        cand.sort_values(["tf", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)[["token", "df", "tf"]]
        .astype({"df": "int64", "tf": "int64"})
    )


def _token_partials(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Shared per-batch (token → df, tf) partials for the vocabulary family
    (q35 / q53): Arrow-vectorized tokenize, per-doc counts collapsed to
    per-token partials BEFORE the shuffle. df partials sum exactly because
    a document never spans batches."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        doc = pc.take(t.column("doc_id"), pc.list_parent_indices(toks))
        d = pd.DataFrame(
            {"doc_id": doc.to_numpy(zero_copy_only=False), "token": flat.to_pylist()}
        )
        d = d[d["token"] != ""]
        per_doc = d.groupby(["doc_id", "token"], as_index=False).size()
        g = per_doc.groupby("token", as_index=False).agg(df=("doc_id", "size"), tf=("size", "sum"))
        return pa.Table.from_pandas(g.astype({"df": "int64", "tf": "int64"}), preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(partial, batch_format="pyarrow")


def q75_char_entropy(sf_dir: str) -> "ray.data.Dataset":
    """Character-distribution entropy per document (the perplexity-proxy
    quality signal: boilerplate and mojibake sit at the tails): per doc,
    H = −Σ p·ln p over the codepoint frequency distribution. Shuffle-free —
    a doc never spans batches, so each batch's (parent, char) frame gives
    exact finals via one pandas groupby. Chars are unicode codepoints on
    both sides (Python str iteration == RE2 '(?s).' runes over well-formed
    UTF-8); the 4dp rounding absorbs the float summation-order difference
    between the pandas and DuckDB aggregates (≤ ~1e-13 over alphabet-sized
    sums). Empty docs emit nothing (mirrors the oracle's GROUP BY over the
    extracted chars)."""
    import numpy as np
    import pandas as pd

    from .common import round_away

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        lens = np.array([len(s or "") for s in texts], dtype=np.int64)
        par = np.repeat(np.arange(len(texts)), lens)
        chars = list("".join(s or "" for s in texts))
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "entropy": pa.array([], pa.float64()),
            }
        )
        if not len(chars):
            return empty
        cnt = (
            pd.DataFrame({"p": par, "c": chars})
            .groupby(["p", "c"], as_index=False)
            .size()
        )
        tot = cnt.groupby("p")["size"].transform("sum").to_numpy(dtype=np.float64)
        frac = cnt["size"].to_numpy(dtype=np.float64) / tot
        term = frac * np.log(frac)
        ent = -pd.Series(term).groupby(cnt["p"].to_numpy()).sum()
        doc_ids = t.column("doc_id").to_numpy()
        idx = ent.index.to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[idx], pa.int64()),
                "n_chars": pa.array(lens[idx], pa.int64()),
                "entropy": pa.array(round_away(ent.to_numpy(), 4), pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _bigram_partials(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-batch (bigram → count) partials, shared by q52 (top-k) and q74
    (PMI): bigrams form positionally via list_flatten + list_parent_indices
    (adjacent flat slots with the same parent), vectorized — no per-document
    loop; per-batch counts collapse before any shuffle."""
    import numpy as np
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        empty = pa.table({"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        same = par[:-1] == par[1:]
        w1, w2 = flat[:-1][same], flat[1:][same]
        keep = (w1 != "") & (w2 != "")
        if not keep.any():
            return empty
        big = pd.Series(w1[keep]) + " " + pd.Series(w2[keep])
        g = big.value_counts().rename_axis("bigram").reset_index(name="n")
        return pa.Table.from_pandas(g.astype({"n": "int64"}), preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(partial, batch_format="pyarrow")


def q74_bigram_pmi(sf_dir: str, k: int = 100, min_count: int = 5) -> "pd.DataFrame":
    """Pointwise mutual information of adjacent token pairs (collocation
    strength — the association statistic next to raw bigram counts q52):
    pmi = ln((c(ab)/N2) / ((c(a)/N1) · (c(b)/N1))), top-k by (rounded pmi
    desc, bigram asc) with a ``min_count`` support floor.

    Scale shape: unigram counts collapse through the shared q35 token
    partials to a VOCABULARY-sized driver frame (broadcast-joined at web
    scale); bigram partials are materialized once so N2 (total bigrams) is
    a free column sum and the per-bigram totals ride one bucketed exchange;
    the support floor bounds the driver collect to frequent bigrams. The
    ranking uses the ROUNDED pmi on both oracle sides (q53's rule) so a
    1-ulp ln() difference can never flip the top-k boundary; the pmi
    expression tree matches the SQL literally."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg, round_away

    uparts = _token_partials(read_table(sf_dir, "documents", columns=["doc_id", "text"]))

    def ufinal(d: "pd.DataFrame") -> "pd.DataFrame":
        return d.groupby("token", as_index=False).agg(tf=("tf", "sum"))

    uni = bucketed_group_agg(uparts, ["token"], ufinal, n_buckets=16).to_pandas()
    n1 = int(uni["tf"].sum())
    umap = dict(zip(uni["token"], uni["tf"].astype("int64")))

    bparts = _bigram_partials(
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ).materialize()
    n2 = int(bparts.sum(on="n") or 0)

    def bfinal(d: "pd.DataFrame") -> "pd.DataFrame":
        g = d.groupby("bigram", as_index=False).agg(n=("n", "sum"))
        return g[g["n"] >= min_count]

    bag = bucketed_group_agg(bparts, ["bigram"], bfinal, n_buckets=16).to_pandas()
    if bag.empty or n1 == 0 or n2 == 0:
        return pd.DataFrame(
            {
                "bigram": pd.array([], dtype="str"),
                "n": pd.array([], dtype="int64"),
                "pmi": pd.array([], dtype="float64"),
            }
        )
    halves = bag["bigram"].str.split(" ", n=1, expand=True)
    ca = halves[0].map(umap).to_numpy(dtype=np.float64)
    cb = halves[1].map(umap).to_numpy(dtype=np.float64)
    nb = bag["n"].to_numpy(dtype=np.float64)
    bag["pmi"] = round_away(np.log((nb / n2) / ((ca / n1) * (cb / n1))), 4)
    out = (
        bag.sort_values(["pmi", "bigram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)[["bigram", "n", "pmi"]]
    )
    out["n"] = out["n"].astype("int64")
    return out


def q52_bigram_topk(sf_dir: str, k: int = 100) -> "pd.DataFrame":
    """Top-k token bigrams over the corpus (the n-gram statistics pass of a
    training-data pipeline). Bigrams are formed positionally inside each
    document — vectorized over the whole batch via list_flatten +
    list_parent_indices (adjacent flat slots with the same parent are a
    bigram; no per-document Python loop) — then per-batch counts collapse
    to per-bigram partials before the shuffle, exactly the q35 vocabulary
    shape. The per-bucket final pre-top-ks, bounding the driver collect to
    k x buckets rows."""
    from .common import bucketed_group_agg

    partials = _bigram_partials(read_table(sf_dir, "documents", columns=["doc_id", "text"]))

    def final(d: "pd.DataFrame") -> "pd.DataFrame":
        g = d.groupby("bigram", as_index=False).agg(n=("n", "sum"))
        return g.sort_values(["n", "bigram"], ascending=[False, True]).head(k)

    cand = bucketed_group_agg(partials, ["bigram"], final, n_buckets=16).to_pandas()
    out = (
        cand.sort_values(["n", "bigram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)[["bigram", "n"]]
    )
    out["n"] = out["n"].astype("int64")
    return out


def q53_tfidf_topk(sf_dir: str, k: int = 100) -> "pd.DataFrame":
    """Corpus-level TF-IDF (weight = tf x ln(N/df)) top-k — the salience
    ranking every corpus-analysis pipeline wants next to raw counts (q35).
    N comes from Parquet metadata (Dataset.count() reads footers, not
    rows); the rest reuses the q35 partial shape. Ranking uses the ROUNDED
    weight (desc, then token asc) on BOTH sides of the oracle so a 1-ulp
    libm difference between numpy log and DuckDB ln can never flip the
    top-k boundary."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg, round_away

    n_docs = read_table(sf_dir, "documents", columns=["doc_id"]).count()
    partials = _token_partials(read_table(sf_dir, "documents", columns=["doc_id", "text"]))

    def final(d: "pd.DataFrame") -> "pd.DataFrame":
        g = d.groupby("token", as_index=False).agg(df=("df", "sum"), tf=("tf", "sum"))
        g["tfidf"] = round_away(
            g["tf"].to_numpy(dtype=np.float64) * np.log(n_docs / g["df"].to_numpy(dtype=np.float64)),
            4,
        )
        return g.sort_values(["tfidf", "token"], ascending=[False, True]).head(k)

    cand = bucketed_group_agg(partials, ["token"], final, n_buckets=16).to_pandas()
    out = (
        cand.sort_values(["tfidf", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)[["token", "df", "tf", "tfidf"]]
    )
    out["df"] = out["df"].astype("int64")
    out["tf"] = out["tf"].astype("int64")
    return out


PRICE_REDACT_RE = r"(?i)[0-9]{1,3}(?:,[0-9]{3})*(?:\.[0-9]+)?\s*(?:ብር|birr|br|ዶላር|dollar)"


def price_redact_batch(t: pa.Table) -> pa.Table:
    """PII-style redaction (the scrubbing pass of a training-data pipeline):
    replace every price mention in raw turn text with a '<PRICE>' sentinel.
    Both the replace and the match count are RE2 kernels (pyarrow's regex
    engine IS RE2, same as DuckDB's — the oracle uses the identical pattern,
    so parity is engine-level, not coincidental). Output carries the
    redaction count and an md5 of the redacted text per turn: the driver
    hash-checks the full redacted corpus without shipping it."""
    import hashlib

    txt = pc.fill_null(t.column("text"), "")
    red = pc.replace_substring_regex(txt, pattern=PRICE_REDACT_RE, replacement="<PRICE>")
    n = pc.count_substring_regex(txt, PRICE_REDACT_RE)
    md5 = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in red.to_pylist()]
    return pa.table(
        {
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "n_redacted": pc.cast(n, pa.int64()),
            "red_md5": pa.array(md5, pa.string()),
        }
    )


def _shingle_frame(t: pa.Table, k: int):
    """(row_index, shingle) pairs for every k-token shingle in the batch's
    ``text`` column — the bigram adjacency trick generalized to k: flat
    token slots i..i+k-1 form a shingle iff slot i and slot i+k-1 share the
    same parent row. Vectorized end to end (one regex split, k shifted
    slices, one pandas string concat); no per-document loop."""
    import numpy as np
    import pandas as pd

    trimmed = pc.utf8_trim_whitespace(t.column("text"))
    toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
    par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    if len(flat) < k:
        return np.array([], dtype=np.int64), pd.Series([], dtype=object)
    m = len(flat) - k + 1
    idx = np.nonzero(par[:m] == par[k - 1 :])[0]
    if not len(idx):
        return np.array([], dtype=np.int64), pd.Series([], dtype=object)
    s = pd.Series(flat[idx])
    for j in range(1, k):
        s = s + " " + pd.Series(flat[idx + j])
    return par[idx], s


def q54_decontaminate(sf_dir: str, blocklist_source: str = "src0", k: int = 5) -> "ray.data.Dataset":
    """Test-set decontamination (the overlap scan every training corpus
    needs before a benchmark is trusted): for each corpus document, the
    number of DISTINCT k-token shingles it shares with a held-out blocklist
    corpus (here: the documents of one ``source``). Only contaminated
    documents (n_shared > 0) are emitted.

    Scale shape: the blocklist is a TEST SET — small by definition — so its
    distinct shingle set is built driver-side and broadcast once
    (``ray.put`` + per-worker cache); the corpus side is ONE shuffle-free
    scan, with per-document shingle sets intersected against the broadcast
    vectorized (pandas isin). A document never spans batches, so per-batch
    per-doc distinct counts are exact finals — no aggregation exchange at
    all. If the blocklist ever outgrew broadcast, the fallback is the
    bucketed join on hashed shingles (common.bucketed_join), same shape as
    dedup's LSH band verify."""
    import pandas as pd
    import ray

    from .common import get_broadcast, read_small, read_table

    bl = read_small(sf_dir, "documents", columns=["text", "source"])
    bl = bl.filter(pc.equal(bl.column("source"), blocklist_source))
    _, bl_sh = _shingle_frame(bl, k)
    ref = ray.put(pd.Index(bl_sh.unique()))

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("source"), blocklist_source))
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_shared": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        rows, sh = _shingle_frame(t, k)
        if not len(rows):
            return empty
        d = pd.DataFrame(
            {"doc_id": t.column("doc_id").to_numpy()[rows], "s": sh.to_numpy()}
        ).drop_duplicates()
        d = d[d["s"].isin(get_broadcast(ref))]
        g = d.groupby("doc_id", as_index=False).size().rename(columns={"size": "n_shared"})
        return pa.Table.from_pandas(g.astype({"n_shared": "int64"}), preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(f, batch_format="pyarrow")


def q63_token_repetition(sf_dir: str) -> "ray.data.Dataset":
    """Within-document token repetition (the Gopher-style duplicate-content
    quality signal): per doc, token count, distinct-token count and
    repetition ratio 1 − distinct/total. Fully vectorized — one regex split
    per batch, flatten to (parent, token) pairs, one pandas groupby
    (size, nunique) per batch; docs are never crossed, so this is
    embarrassingly parallel with zero shuffle. Empty-string tokens (the
    split artifact on leading/trailing whitespace and empty docs) are
    filtered identically on both oracle sides, which also makes trim
    semantics irrelevant."""
    import numpy as np
    import pandas as pd

    from .common import round_away

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()  # parent indices must not reset per chunk
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        d = pd.DataFrame({"p": parents, "tok": flat})
        d = d[d["tok"] != ""]
        g = d.groupby("p").agg(n=("tok", "size"), nd=("tok", "nunique"))
        n = np.zeros(t.num_rows, dtype=np.int64)
        nd = np.zeros(t.num_rows, dtype=np.int64)
        n[g.index.to_numpy()] = g["n"].to_numpy()
        nd[g.index.to_numpy()] = g["nd"].to_numpy()
        ratio = np.zeros(t.num_rows, dtype=np.float64)
        nz = n > 0
        ratio[nz] = round_away(1.0 - nd[nz] / n[nz], 4)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tok": pa.array(n, pa.int64()),
                "n_distinct_tok": pa.array(nd, pa.int64()),
                "rep_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q66_quality_funnel(sf_dir: str) -> "pd.DataFrame":
    """Per-rule survival counts of a quality-filter chain (length ≥ 100 →
    token count ≥ 20 → lang = 'en'): the report every corpus-filtering run
    needs before committing to a rule set. One vectorized pass emits four
    partial sums per batch; the driver reduce is four integers — no shuffle,
    no second pass, corpus-size-independent output."""
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(t.column("text"))
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        n_tok = pc.list_value_length(toks)
        n_tok = pc.if_else(
            pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int32()), n_tok
        )
        c1 = pc.greater_equal(n_chars, 100)
        c2 = pc.and_(c1, pc.greater_equal(n_tok, 20))
        c3 = pc.and_(c2, pc.equal(t.column("lang"), "en"))

        def s(m) -> int:
            return pc.sum(pc.cast(m, pa.int64())).as_py() or 0

        return pa.table(
            {
                "p_total": pa.array([t.num_rows], pa.int64()),
                "p_len": pa.array([s(c1)], pa.int64()),
                "p_len_tok": pa.array([s(c2)], pa.int64()),
                "p_all": pa.array([s(c3)], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "n_total": [int(parts["p_total"].sum())],
            "n_pass_len": [int(parts["p_len"].sum())],
            "n_pass_len_tok": [int(parts["p_len_tok"].sum())],
            "n_pass_all": [int(parts["p_all"].sum())],
        }
    )


def doc_pack_bins(sf_dir: str, capacity_tokens: int = 256) -> "ray.data.Dataset":
    """Greedy sequence packing (the training-shard assembly step: fill each
    shard up to ``capacity_tokens`` whitespace tokens, in stable doc_id
    order, one doc never split). Packing is inherently sequential WITHIN a
    shard stream, so the distribution unit is the ``source`` group — the
    partitioning assumption is that one source's docs fit one task, which at
    100 TB means packing per (source, date-bucket) with bin ids offset by
    group; cross-group packing would serialize the corpus.

    In-group the greedy cut points are found with O(bins · log n)
    searchsorted over the token-count cumsum — no per-doc Python loop. An
    oversize doc (> capacity) gets a bin of its own. Bin ids are
    deterministic: dense per group, stable under resharding (order comes
    from doc_id, not block layout)."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def count_tokens(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        n = pc.list_value_length(toks)
        n = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int32()), n)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "n_tok": pc.cast(n, pa.int64()),
            }
        )

    counted = ds.map_batches(count_tokens, batch_format="pyarrow")

    def pack_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        c = df["n_tok"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        bins = np.empty(len(df), dtype=np.int64)
        start, b = 0, 0
        while start < len(df):
            base = cum[start - 1] if start else 0
            nxt = int(np.searchsorted(cum, base + capacity_tokens, side="right"))
            nxt = max(nxt, start + 1)  # oversize doc → its own bin
            bins[start:nxt] = b
            start, b = nxt, b + 1
        df["bin_idx"] = bins
        return df

    return counted.groupby("source").map_groups(pack_group, batch_format="pandas")


def q68_doc_chunks(sf_dir: str, chunk: int = 64, stride: int = 48) -> "ray.data.Dataset":
    """Fixed-size token chunking with overlap — the context-window assembly
    step of a training-data pipeline (split every document into windows of
    ``chunk`` whitespace tokens advancing by ``stride``; the last window is
    short, a doc shorter than one chunk is a single window, an empty doc
    emits nothing). Embarrassingly parallel: docs never span batches, so
    this is one shuffle-free scan. The tokenize is Arrow-vectorized; the
    inner loop is per CHUNK (md5 of the joined window — the hashlib-per-row
    idiom), not per token. The md5 lets the driver hash-check the full
    chunked corpus without shipping it."""
    import hashlib

    import numpy as np

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        m = flat != ""  # the regexp-split [''] artifact of empty docs
        flat, par = flat[m], par[m]
        counts = np.bincount(par, minlength=t.num_rows)
        offs = np.concatenate([[0], np.cumsum(counts)])
        doc_ids = t.column("doc_id").to_numpy()
        out_doc, out_idx, out_n, out_md5 = [], [], [], []
        for d in range(t.num_rows):
            nt = int(counts[d])
            if nt == 0:
                continue
            seg = flat[offs[d] : offs[d + 1]]
            n_chunks = 1 + max(0, -(-(nt - chunk) // stride))
            for i in range(n_chunks):
                s = i * stride
                ct = min(chunk, nt - s)
                out_doc.append(doc_ids[d])
                out_idx.append(i)
                out_n.append(ct)
                out_md5.append(
                    hashlib.md5(" ".join(seg[s : s + ct]).encode("utf-8")).hexdigest()
                )
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "n_tok": pa.array(out_n, pa.int64()),
                "chunk_md5": pa.array(out_md5, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q69_oov_rate(sf_dir: str, vocab_size: int = 16) -> "ray.data.Dataset":
    """Vocabulary-coverage / OOV-rate scan (the UNK-rate check run before
    committing to a tokenizer vocab): stage 1 derives the top-``vocab_size``
    tokens by corpus frequency (tf desc, token asc tie-break — deterministic
    on both oracle sides) from the shared q35 token partials; stage 2
    broadcasts the vocab (``ray.put`` + per-worker cache) and re-scans the
    corpus stamping per-doc token count, OOV count and OOV rate. The vocab
    is exact: tokens hash-partition wholly into one bucket, so per-bucket
    top-V candidates contain the global top-V. Docs with zero tokens emit
    nothing (mirrors the oracle's GROUP BY over the unnested tokens)."""
    import numpy as np
    import pandas as pd
    import ray

    from .common import bucketed_group_agg, get_broadcast, round_away

    partials = _token_partials(read_table(sf_dir, "documents", columns=["doc_id", "text"]))

    def vocab_final(d: "pd.DataFrame") -> "pd.DataFrame":
        g = d.groupby("token", as_index=False).agg(tf=("tf", "sum"))
        return g.sort_values(["tf", "token"], ascending=[False, True]).head(vocab_size)

    cand = bucketed_group_agg(partials, ["token"], vocab_final, n_buckets=16).to_pandas()
    vocab = (
        cand.sort_values(["tf", "token"], ascending=[False, True])
        .head(vocab_size)["token"]
        .to_numpy()
    )
    ref = ray.put(pd.Index(vocab))

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), pattern=r"\s+"
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        m = flat != ""
        flat, par = flat[m], par[m]
        n = np.bincount(par, minlength=t.num_rows).astype(np.int64)
        oov_mask = ~pd.Series(flat).isin(get_broadcast(ref)).to_numpy()
        n_oov = np.bincount(par[oov_mask], minlength=t.num_rows).astype(np.int64)
        keep = n > 0
        rate = round_away(n_oov[keep] / n[keep], 4)
        return pa.table(
            {
                "doc_id": t.column("doc_id").filter(pa.array(keep)),
                "n_tok": pa.array(n[keep], pa.int64()),
                "n_oov": pa.array(n_oov[keep], pa.int64()),
                "oov_rate": pa.array(rate, pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q67_shared_shingles(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Cross-document shingle duplication (the candidate list for
    paragraph/phrase-level dedup, C4-style): every k-token shingle that
    appears in ≥ 2 distinct documents, with its distinct-doc and total
    occurrence counts. Per-batch (shingle, doc) partial counts shrink the
    exchange to unique pairs per block; one bucketed groupby on the shingle
    gives exact distinct-doc counts. Reuses the vectorized ``_shingle_frame``
    adjacency kernel (no per-document loop)."""
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sh": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "p_n": pa.array([], pa.int64()),
            }
        )
        rows, sh = _shingle_frame(t, k)
        if not len(rows):
            return empty
        d = pd.DataFrame(
            {"sh": sh.to_numpy(), "doc_id": t.column("doc_id").to_numpy()[rows]}
        )
        g = d.groupby(["sh", "doc_id"], as_index=False).size().rename(columns={"size": "p_n"})
        g["p_n"] = g["p_n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("sh", as_index=False).agg(
            n_docs=("doc_id", "nunique"), n=("p_n", "sum")
        )
        g = g[g["n_docs"] >= 2]
        g["n_docs"] = g["n_docs"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return g

    from .common import bucketed_group_agg

    return bucketed_group_agg(parts, ["sh"], final, n_buckets=16)


def q80_unigram_logppl(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-LM quality score (the CCNet/KenLM-style perplexity filter of a
    training-data pipeline, at unigram order): per document, the mean
    negative log-likelihood of its tokens under the corpus-wide MLE unigram
    model, −avg(ln(tf(token)/N)). Low = stereotyped/boilerplate, high =
    rare-token noise; the mid-band is what a quality filter keeps.

    Two-pass shape: pass 1 trains the model — the q35 per-batch token
    partials ride ONE bucketed shuffle to exact (token, tf) rows; the vocab
    table is collected and broadcast ONCE (ray.put; at cluster scale the
    documented cap is top-V + an OOV tail bucket, the standard LM trick —
    vocab rows, never corpus rows, hit the driver). Pass 2 re-scans the
    corpus and scores each batch vectorized: one pandas get_indexer against
    the per-worker cached vocab index (hash lookups in C, built once per
    worker via get_broadcast — not pc.index_in, which rebuilds its hash
    table per call), then ln() and a bincount-style grouped mean per doc.
    Mirrors the oracle's expression tree: x = ln(tf/N) per token, then
    avg, then the 4dp round of −avg."""
    import numpy as np
    import pandas as pd
    import ray

    from .common import bucketed_group_agg, round_away

    # ---- pass 1: unigram model (token -> tf), exact ----------------------
    partials = _token_partials(read_table(sf_dir, "documents", columns=["doc_id", "text"]))

    def tf_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False).agg(tf=("tf", "sum"))

    vocab = bucketed_group_agg(partials, ["token"], tf_final, n_buckets=16).to_pandas()
    n_total = float(vocab["tf"].sum())
    # prebuilt index + float tf array: the broadcast payload IS the built
    # lookup structure, so workers deserialize it ready to probe
    ref = ray.put((pd.Index(vocab["token"]), vocab["tf"].to_numpy(dtype=np.float64), n_total))

    # ---- pass 2: score every document against the broadcast model --------
    def score(t: pa.Table) -> pa.Table:
        from .common import get_broadcast

        idx, tf, n = get_broadcast(ref)
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        tok = flat.to_pandas()
        keep = (tok != "").to_numpy()
        parent = parent[keep]
        pos = idx.get_indexer(pd.Index(tok[keep]))
        # every scanned token was counted in pass 1, so pos >= 0 by
        # construction; a top-V model would route pos < 0 to the OOV bucket
        x = np.log(tf[pos] / n)
        n_rows = t.num_rows
        sums = np.bincount(parent, weights=x, minlength=n_rows)
        cnts = np.bincount(parent, minlength=n_rows)
        has = cnts > 0
        out = pa.table(
            {
                "doc_id": t.column("doc_id").take(pa.array(np.flatnonzero(has))),
                "n_tokens": pa.array(cnts[has].astype(np.int64)),
                "logppl": pa.array(round_away(-(sums[has] / cnts[has]), 4)),
            }
        )
        return out

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def q86_keyword_search(sf_dir: str, terms: tuple = ("spark", "join", "fast")) -> "ray.data.Dataset":
    """Conjunctive keyword search (the AND-query a search/inverted-index
    layer answers): documents containing ALL query terms as whole tokens.
    The query side is a handful of terms, so this is the broadcast-probe
    degenerate case of an inverted index — a shuffle-free scan where each
    batch sets a per-doc k-bit presence mask and keeps rows with all bits
    set. The full inverted-index artifact (term-bucket-partitioned postings
    Parquet) only pays off when queries outnumber scans; its build is the
    q35 token-partial pass plus a bucket-sorted write (the kg.py S5 shape)."""
    import numpy as np

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms = tuple(terms)

    def f(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        mask = np.zeros((t.num_rows, len(terms)), dtype=bool)
        for i, term in enumerate(terms):
            eq = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            mask[parent[eq], i] = True
        keep = mask.all(axis=1)
        return pa.table({"doc_id": t.column("doc_id").filter(pa.array(keep))})

    return ds.map_batches(f, batch_format="pyarrow")


def build_keyword_index(sf_dir: str, out_dir: str, n_buckets: int = 32) -> dict:
    """Build the inverted-index ARTIFACT q86's docstring promises: distinct
    (token, doc_id) postings, hash(token)-partitioned into ``n_buckets``
    bucket files, each sorted by (token, doc_id) and written atomically
    (tmp + rename — the kg.py S5 discipline) with a manifest. A query for
    k terms then touches at most k bucket files — the read-side pruning
    that makes an index pay off once queries outnumber corpus scans.
    Postings are deduped per batch BEFORE the one bucket shuffle (the
    q35-style token-partial pass), so the exchange carries distinct
    per-block postings, not raw token occurrences; per-bucket dedup
    finishes the job inside the grouped task. Bucket count scales with
    the cluster, not the vocabulary."""
    import json
    import os

    import numpy as np
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def postings(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        doc = pc.take(t.column("doc_id"), parent)
        df = pa.table({"token": flat, "doc_id": doc}).to_pandas().drop_duplicates()
        df = df[df["token"] != ""]
        h = stable_hash64(df["token"])
        df["bkt"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        bkt = int(df["bkt"].iloc[0])
        out = (
            df.drop(columns=["bkt"])
            .drop_duplicates()
            .sort_values(["token", "doc_id"], kind="mergesort")
        )
        path = os.path.join(out_dir, f"bucket={bkt:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None),
            tmp,
            row_group_size=8192,  # footer-prunable row groups within a bucket
        )
        os.replace(tmp, path)
        return pd.DataFrame({"bkt": [bkt], "n_postings": [len(out)]})

    stats = (
        ds.map_batches(postings, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
    )
    manifest = {
        "n_buckets": n_buckets,
        "buckets": {int(r.bkt): int(r.n_postings) for r in stats.itertuples()},
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def keyword_index_search(
    sf_dir: str, terms: tuple = ("spark", "join", "fast"), index_dir: str | None = None
) -> "pd.DataFrame":
    """Conjunctive keyword search SERVED FROM the inverted-index artifact —
    same answer as the q86 scan (same oracle SQL), different cost model:
    only the ≤ k bucket files holding the query terms' postings are read
    (pyarrow predicate pushdown prunes row groups inside each), and the
    intersection runs on posting lists, never touching the corpus. Builds
    the index into a scratch dir when ``index_dir`` is None (the driver
    path); a served deployment builds once and queries many times."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    if index_dir is None:
        index_dir = "/tmp/graft_keyword_index"
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
        build_keyword_index(sf_dir, index_dir)
    import json

    with open(os.path.join(index_dir, "manifest.json")) as f:
        n_buckets = json.load(f)["n_buckets"]
    terms = tuple(terms)
    h = stable_hash64(pd.Series(list(terms), dtype=object))
    want = sorted({int(b) for b in (h % np.uint64(n_buckets))})
    # posting lists are term-bounded (tiny next to the corpus); the k-way
    # intersection is a pandas distinct-count — driver-side by design
    parts = []
    for b in want:
        path = os.path.join(index_dir, f"bucket={b:05d}.parquet")
        if not os.path.exists(path):
            continue
        parts.append(
            pq.read_table(path, filters=[("token", "in", list(terms))]).to_pandas()
        )
    if not parts:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64")})
    post = pd.concat(parts, ignore_index=True)
    n_hit = post.groupby("doc_id")["token"].nunique()
    out = n_hit[n_hit == len(terms)].index.to_numpy()
    return pd.DataFrame({"doc_id": pd.array(np.sort(out), dtype="int64")})


def q101_bigram_logppl(sf_dir: str) -> "ray.data.Dataset":
    """Bigram-LM fluency score (q80's corpus-LM filter at order 2 — the
    next rung of the CCNet/KenLM perplexity ladder): per document, the mean
    negative log-likelihood of its token TRANSITIONS under the corpus-wide
    MLE bigram model, −avg(ln(c(w1,w2) / c_ctx(w1))), where c_ctx counts
    w1's occurrences WITH a successor (so probabilities sum to 1 per
    context and every scanned transition has support — no smoothing needed
    for scoring the training corpus itself). Docs under 2 tokens have no
    transitions and are absent, matching the SQL inner joins.

    Scale shape — the model is NOT broadcast (a bigram vocabulary outgrows
    a driver/worker payload long before a unigram one does, so this is the
    join formulation q80's docstring points at for higher orders):
      1. transition partials: per-batch (doc_id, bigram, k) counts via the
         shared positional list_parent_indices adjacency — combiner first,
         so the exchange carries collapsed counts, never raw transitions;
      2. bigram counts c2: the q52 partials through ONE bigram-bucket
         shuffle (materialized once — vocabulary-sized, reused twice);
      3. context counts c1: c2 re-aggregated over w1 (bigram-vocab input,
         unigram-vocab output);
      4. model = c2 ⋈ c1 on w1 (bigram-vocab exchange);
      5. score = transitions ⋈ model on the bigram key (the one
         corpus-sized exchange), folded per doc in the same shuffle's
         final: n_trans = Σk, logppl = round(−Σ k·ln(c2/c1) / Σk, 4)."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg, bucketed_join, round_away

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def trans_partial(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "bigram": pa.array([], pa.string()),
                "k": pa.array([], pa.int64()),
            }
        )
        if len(flat) < 2:
            return empty
        same = par[:-1] == par[1:]
        w1, w2 = flat[:-1][same], flat[1:][same]
        parent = par[:-1][same]
        keep = (w1 != "") & (w2 != "")
        if not keep.any():
            return empty
        doc = t.column("doc_id").to_numpy()[parent[keep]]
        big = pd.Series(w1[keep]) + " " + pd.Series(w2[keep])
        g = (
            pd.DataFrame({"doc_id": doc, "bigram": big})
            .groupby(["doc_id", "bigram"], as_index=False)
            .size()
            .rename(columns={"size": "k"})
        )
        return pa.Table.from_pandas(
            g.astype({"doc_id": "int64", "k": "int64"}), preserve_index=False
        ).replace_schema_metadata(None)

    trans = docs.map_batches(trans_partial, batch_format="pyarrow")

    def c2_final(d: "pd.DataFrame") -> "pd.DataFrame":
        g = d.groupby("bigram", as_index=False).agg(c2=("n", "sum"))
        g["w1"] = g["bigram"].str.split(" ", n=1).str[0]
        return g

    bcnt = bucketed_group_agg(
        _bigram_partials(docs), ["bigram"], c2_final, n_buckets=16
    ).materialize()

    def c1_final(d: "pd.DataFrame") -> "pd.DataFrame":
        return d.groupby("w1", as_index=False).agg(c1=("c2", "sum"))

    ctx = bucketed_group_agg(
        bcnt.select_columns(["w1", "c2"]), ["w1"], c1_final, n_buckets=16
    )

    model = bucketed_join(bcnt, ctx, on="w1", n_buckets=16).select_columns(
        ["bigram", "c2", "c1"]
    )

    scored = bucketed_join(trans, model, on="bigram", n_buckets=32)

    def doc_final(d: "pd.DataFrame") -> "pd.DataFrame":
        x = np.log(d["c2"].to_numpy(dtype=np.float64) / d["c1"].to_numpy(dtype=np.float64))
        d = d.assign(_wx=d["k"].to_numpy(dtype=np.float64) * x)
        g = d.groupby("doc_id", as_index=False).agg(n_trans=("k", "sum"), s=("_wx", "sum"))
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "n_trans": g["n_trans"].astype("int64"),
                "logppl": round_away(-(g["s"] / g["n_trans"]).to_numpy(), 4),
            }
        )

    return bucketed_group_agg(scored, ["doc_id"], doc_final, n_buckets=32)

def q114_readability(sf_dir: str) -> "ray.data.Dataset":
    """Automated Readability Index per document — the grade-level screen a
    training-corpus quality gate runs next to q13's ratio heuristics:
    ARI = 4.71·(chars/words) + 0.5·(words/sentences) − 21.43, with chars =
    non-whitespace characters, words = maximal non-space runs, sentences =
    runs of [.!?] clamped to ≥ 1. Pure streaming map — three
    pyarrow.compute regex-count kernels per batch (RE2 on both oracle
    sides, so the token definitions agree by construction); documents with
    no words are dropped (undefined grade), matching the oracle's WHERE."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        words = pc.cast(pc.count_substring_regex(txt, pattern=r"\S+"), pa.int64())
        sents = pc.cast(pc.count_substring_regex(txt, pattern=r"[.!?]+"), pa.int64())
        sents = pc.max_element_wise(sents, pa.scalar(1, pa.int64()))
        n_ws = pc.count_substring_regex(txt, pattern=r"\s")
        chars = pc.cast(pc.subtract(pc.utf8_length(txt), n_ws), pa.int64())
        keep = pc.greater(words, 0)
        words_f = pc.cast(words, pa.float64())
        ari = pc.add(
            pc.multiply(pa.scalar(4.71), pc.divide(pc.cast(chars, pa.float64()), words_f)),
            pc.subtract(
                pc.multiply(pa.scalar(0.5), pc.divide(words_f, pc.cast(sents, pa.float64()))),
                pa.scalar(21.43),
            ),
        )
        # round via round_away (numpy floor(s+0.5)) — bit-identical to
        # DuckDB's round; pc.round lands 1 ulp off for some values
        # (28.2735 → …50000002), which fails the exact value-hash
        from .common import round_away

        ari = pa.array(round_away(ari.combine_chunks().to_numpy(zero_copy_only=False), 4))
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": words,
                "n_sentences": sents,
                "ari": ari,
            }
        )
        return out.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


def q121_dup_span_stats(sf_dir: str, k: int = 5) -> "ray.data.Dataset":
    """Per-document duplicated-SPAN rollup — the substring-level dedup
    decision view (Lee et al.'s "Deduplicating Training Data" measures
    exactly this): for every document with at least one k-token span, how
    many of its DISTINCT spans also occur in some OTHER document, and the
    shared fraction. q67 is the span-centric view (which spans are
    duplicated); this is the doc-centric rollup a filter thresholds on.

    Shape: per-batch distinct (span, doc) pairs (a document never spans
    batches, so per-batch distinct is globally distinct) ride ONE bucketed
    shuffle on the span; inside the span bucket the per-span distinct-doc
    count collapses straight to per-(doc, bucket) partial counts — the
    second exchange on doc_id moves <= n_buckets rows per document, never
    span-sized data. At 100 TB the span column would be a 128-bit hash
    instead of the string (documented trade: the oracle compares exact
    strings, hashes collide with ~2^-128 probability)."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"sh": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())}
        )
        rows, sh = _shingle_frame(t, k)
        if not len(rows):
            return empty
        d = pd.DataFrame(
            {"sh": sh.to_numpy(), "doc_id": t.column("doc_id").to_numpy()[rows]}
        ).drop_duplicates()
        return pa.Table.from_pandas(d, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(pairs, batch_format="pyarrow")

    def span_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # pairs are globally distinct, so each span's row count IS its
        # distinct-doc count
        nd = df.groupby("sh")["doc_id"].transform("size")
        g = (
            pd.DataFrame({"doc_id": df["doc_id"], "shared": (nd >= 2).astype("int64")})
            .groupby("doc_id", as_index=False)
            .agg(p_spans=("shared", "size"), p_shared=("shared", "sum"))
        )
        return g

    per_bucket = bucketed_group_agg(parts, ["sh"], span_bucket, n_buckets=16)

    def doc_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).agg(
            n_spans=("p_spans", "sum"), n_shared=("p_shared", "sum")
        )
        g["n_spans"] = g["n_spans"].astype("int64")
        g["n_shared"] = g["n_shared"].astype("int64")
        g["shared_ratio"] = g["n_shared"].to_numpy(dtype=np.float64) / g[
            "n_spans"
        ].to_numpy(dtype=np.float64)
        return g

    return bucketed_group_agg(per_bucket, ["doc_id"], doc_final, n_buckets=16)


def q124_bm25_topk(
    sf_dir: str,
    terms: tuple = ("spark", "join", "fast"),
    k: int = 100,
    k1: float = 1.2,
    b: float = 0.75,
) -> "pd.DataFrame":
    """BM25 ranked retrieval over the corpus for a fixed term set — the
    relevance-scored upgrade of q86's boolean keyword search (Robertson/
    Lucene form: idf = ln((N - df + 0.5)/(df + 0.5) + 1), tf saturation k1,
    length normalization b against the corpus mean doc length).

    Two bounded passes, no shuffle of raw tokens: pass 1 collects the
    corpus scalars (N from parquet footers; total token count and per-term
    document frequencies as tiny per-batch partials summed on the driver —
    len(terms)+1 rows per batch). Pass 2 re-tokenizes per batch, scores
    each doc against the broadcast scalars, and keeps a per-batch top-k, so
    the driver collect is k x n_blocks rows. Docs containing none of the
    terms score nothing and are excluded on both sides (oracle's inner join
    does the same). Ranking uses the ROUNDED score (desc, doc_id asc) on
    both sides so a 1-ulp libm difference can't flip the boundary."""
    import numpy as np
    import pandas as pd

    from .common import round_away

    term_list = list(terms)
    n_docs = read_table(sf_dir, "documents", columns=["doc_id"]).count()
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _tok_frame(t: pa.Table) -> "pd.DataFrame":
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        doc = pc.take(t.column("doc_id"), pc.list_parent_indices(toks))
        d = pd.DataFrame(
            {"doc_id": doc.to_numpy(zero_copy_only=False), "token": flat.to_pylist()}
        )
        return d[d["token"] != ""]

    def scalars_partial(t: pa.Table) -> pa.Table:
        d = _tok_frame(t)
        hit = d[d["token"].isin(term_list)]
        df_p = hit.groupby("token")["doc_id"].nunique()
        rows = {"term": ["\0len"], "df": [0], "total_len": [int(len(d))]}
        for term in term_list:
            rows["term"].append(term)
            rows["df"].append(int(df_p.get(term, 0)))
            rows["total_len"].append(0)
        return pa.table(
            {
                "term": pa.array(rows["term"], pa.string()),
                "df": pa.array(rows["df"], pa.int64()),
                "total_len": pa.array(rows["total_len"], pa.int64()),
            }
        )

    sc = ds.map_batches(scalars_partial, batch_format="pyarrow").to_pandas()
    total_len = int(sc.loc[sc["term"] == "\0len", "total_len"].sum())
    avgdl = total_len / n_docs
    df_map = sc[sc["term"] != "\0len"].groupby("term")["df"].sum().to_dict()
    idf = {
        t: float(np.log((n_docs - df_map.get(t, 0) + 0.5) / (df_map.get(t, 0) + 0.5) + 1.0))
        for t in term_list
    }

    def score_topk(t: pa.Table) -> pa.Table:
        d = _tok_frame(t)
        dl = d.groupby("doc_id").size()
        hit = d[d["token"].isin(term_list)]
        if not len(hit):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "bm25": pa.array([], pa.float64())}
            )
        tf = hit.groupby(["doc_id", "token"], as_index=False).size()
        tf["dl"] = dl.reindex(tf["doc_id"]).to_numpy()
        n = tf["size"].to_numpy(dtype=np.float64)
        denom = n + k1 * (1.0 - b + b * tf["dl"].to_numpy(dtype=np.float64) / avgdl)
        tf["part"] = tf["token"].map(idf).to_numpy(dtype=np.float64) * n * (k1 + 1.0) / denom
        g = tf.groupby("doc_id", as_index=False)["part"].sum()
        g["bm25"] = round_away(g["part"].to_numpy(dtype=np.float64), 4)
        g = g.sort_values(["bm25", "doc_id"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(
            g[["doc_id", "bm25"]], preserve_index=False
        ).replace_schema_metadata(None)

    cand = ds.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    return (
        cand.sort_values(["bm25", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)[["doc_id", "bm25"]]
        .astype({"doc_id": "int64", "bm25": "float64"})
    )


def q125_source_divergence(sf_dir: str) -> "pd.DataFrame":
    """Per-source token-distribution drift: KL(p_source || p_corpus) over
    the whitespace-token unigram distribution — the domain-shift diagnostic
    a training-mix curator runs before re-weighting sources (a source whose
    KL spikes is drifting away from the blend it was weighted for).

    Per-source token totals are tiny per-batch partials summed on the
    driver (sources are a handful; the grand total is their sum). The
    (source, token, n) counts collapse per batch BEFORE the one token-bucket
    shuffle; inside a bucket every source's count for a token is present, so
    the corpus probability p_g(t) is exact there and each row contributes
    p_s ln(p_s/p_g) to its source's partial sum. The driver reduces
    n_buckets x n_sources partial rows. KL >= 0 by construction; rounded to
    4dp on both sides."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg, round_away

    ds = read_table(sf_dir, "documents", columns=["source", "text"])

    def counts_partial(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        src = pc.take(t.column("source"), pc.list_parent_indices(toks))
        d = pd.DataFrame(
            {"source": src.to_pylist(), "token": flat.to_pylist()}
        )
        d = d[d["token"] != ""]
        g = d.groupby(["source", "token"], as_index=False).size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    counts = ds.map_batches(counts_partial, batch_format="pyarrow")

    # tiny scalar pass: per-source token totals (one row per source per batch)
    totals = (
        counts.map_batches(
            lambda df: df.groupby("source", as_index=False)["n"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("source")["n"]
        .sum()
        .to_dict()
    )
    grand = float(sum(totals.values()))

    def bucket_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "token"], as_index=False)["n"].sum()
        tok_tot = g.groupby("token")["n"].transform("sum").to_numpy(dtype=np.float64)
        n = g["n"].to_numpy(dtype=np.float64)
        p_s = n / g["source"].map(totals).to_numpy(dtype=np.float64)
        p_g = tok_tot / grand
        g["kl_part"] = p_s * np.log(p_s / p_g)
        return g.groupby("source", as_index=False)["kl_part"].sum()

    parts = bucketed_group_agg(counts, ["token"], bucket_final, n_buckets=16).to_pandas()
    out = parts.groupby("source", as_index=False)["kl_part"].sum()
    out["n_tokens"] = out["source"].map(totals).astype("int64")
    out["kl"] = round_away(out["kl_part"].to_numpy(dtype=np.float64), 4)
    return (
        out.sort_values("source").reset_index(drop=True)[["source", "n_tokens", "kl"]]
    )


def q126_mixture_budget(sf_dir: str, budget_chars: int = 20000) -> "ray.data.Dataset":
    """Driver-surface wrapper over :func:`mixture_budget` on the documents
    table (doc_id / source / n_chars)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return mixture_budget(ds, budget_chars=budget_chars)


def mixture_budget(
    ds: "ray.data.Dataset", budget_chars: int = 20000, batch_size: int = 65536
) -> "ray.data.Dataset":
    """Deterministic training-mix curation: per source, admit documents in
    content-addressed (md5(doc_id), doc_id) order until the next doc would
    push the source's cumulative n_chars past the budget — the reproducible
    "take B bytes from each source" step of assembling a weighted training
    blend (stable under resharding/resume like q34's sample; no RNG state).

    The global selection is a PREFIX of each source's hash order (the
    running sum is monotone), so any globally admitted doc is also inside
    its batch's local budget-prefix — the per-batch pruner keeps that local
    prefix PLUS the batch's first over-budget doc per source. The boundary
    doc matters for exactness, not just the superset: a truly-rejected doc
    whose mass the prune dropped would deflate later cumulative sums and
    over-admit docs past the cutoff, but every kept boundary doc carries a
    final cumsum > budget, and everything hash-after it is therefore
    rejected too (no boundary or dropped doc can precede a truly admitted
    doc — its true cumsum would have to be <= budget, contradicting the
    local bound that dropped it). The per-source final (one bucketed
    shuffle) re-ranks the survivors and applies the exact cumulative
    cutoff, shuffling ~budget chars + one boundary row per source per
    block. At 100 TB the same two phases hold; if blocks are many, a
    quantile pass over the hash column first narrows the candidate band
    the way sorted_export samples its range bounds."""
    import hashlib

    import pandas as pd

    from .common import bucketed_group_agg

    def prefix(df: pd.DataFrame, keep_boundary: bool) -> pd.DataFrame:
        h = [hashlib.md5(str(i).encode("ascii")).hexdigest() for i in df["doc_id"]]
        df = df.assign(_h=h).sort_values(["source", "_h", "doc_id"], kind="mergesort")
        cum = df.groupby("source")["n_chars"].cumsum()
        keep = cum <= budget_chars
        if keep_boundary:
            over_rank = (~keep).groupby(df["source"].to_numpy()).cumsum()
            keep = keep | (~keep & (over_rank == 1))
        return df[keep]

    partials = ds.map_batches(
        lambda df: prefix(df, keep_boundary=True)[["doc_id", "source", "n_chars"]],
        batch_format="pandas",
        batch_size=batch_size,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return prefix(df, keep_boundary=False)[["source", "doc_id", "n_chars"]]

    return bucketed_group_agg(partials, ["source"], final, n_buckets=8)


def q128_token_fertility(sf_dir: str) -> "pd.DataFrame":
    """Per-source tokenizer fertility (chars per BPE-ish token) — the
    tokenizer-fairness diagnostic run before fixing a training mix: a
    source whose text costs systematically more tokens per char is
    under-served by the tokenizer and over-billed by a token budget.

    Uses q26's RE2-compatible GPT-2-shaped pre-tokenizer so the DuckDB
    oracle runs the IDENTICAL pattern. Shape: each batch collapses to one
    (source, n_docs, chars, tokens) partial row per source present — a
    closed, schema-bounded key set, so the driver reduce is
    dimension-sized and there is NO shuffle at all."""
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["source", "text"])
    pattern = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\r\n]"

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.cast(pc.count_substring_regex(t.column("text"), pattern), pa.int64())
        chars = pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        df = pd.DataFrame(
            {
                "source": t.column("source").to_pandas(),
                "chars": chars.to_pandas(),
                "tokens": toks.to_pandas(),
            }
        )
        g = df.groupby("source", as_index=False).agg(
            n_docs=("chars", "size"), total_chars=("chars", "sum"), total_tokens=("tokens", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    out = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"),
        total_chars=("total_chars", "sum"),
        total_tokens=("total_tokens", "sum"),
    )
    # exact int sums until this one division
    out["chars_per_token"] = round_away(
        out["total_chars"].to_numpy() / out["total_tokens"].to_numpy(), 4
    )
    return (
        out.sort_values("source")
        .reset_index(drop=True)
        .astype({"n_docs": "int64", "total_chars": "int64", "total_tokens": "int64"})
    )


def q129_temperature_mix(sf_dir: str, alpha: float = 0.5) -> "pd.DataFrame":
    """Temperature-scaled source sampling weights (the multilingual-LM
    mixing rule, e.g. mBERT/XLM-R exponent smoothing): w_i = n_i^alpha /
    sum_j n_j^alpha. alpha < 1 up-weights small sources relative to their
    raw share — the standard fix for head-source domination in a training
    blend (q126 then realizes a chosen budget).

    One schema-bounded count partial per batch, driver math on the
    source-dimension frame; weights are summed in sorted-source order on
    both sides (the oracle's window SUM over 4 values agrees at 6 dp)."""
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["source"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": t.column("source").to_pandas()})
        g = df.groupby("source", as_index=False).agg(n_docs=("source", "size"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    out = (
        parts.groupby("source", as_index=False)
        .agg(n_docs=("n_docs", "sum"))
        .sort_values("source")
        .reset_index(drop=True)
    )
    n = out["n_docs"].to_numpy().astype("float64")
    scaled = n**alpha
    out["raw_share"] = round_away(n / n.sum(), 6)
    out["weight"] = round_away(scaled / scaled.sum(), 6)
    return out.astype({"n_docs": "int64"})


def q131_source_quality_gate(sf_dir: str, q: float = 0.75) -> "pd.DataFrame":
    """Per-source quality gate: keep each source's top quality quartile
    (docs with alpha_ratio >= that source's discrete p75) — the
    FineWeb-style per-domain percentile filter, which beats one global
    threshold because sources have different score distributions.

    The per-source quantile is HOLISTIC but alpha_ratio is a 4-dp-rounded
    ratio, so the exact score distribution per source is a bounded
    (source, score) histogram: each batch emits count partials over that
    grid (dimension-bounded, NO shuffle), the driver takes exact
    order-statistic thresholds from cumulative counts (DuckDB
    quantile_disc rank rule: 1-based ceil(q·n); q=0.75 is dyadic so the
    float product is exact), and one broadcast-threshold re-scan emits the
    surviving rows. Two streaming passes, nothing data-sized anywhere."""
    import math

    import pandas as pd

    from .common import get_broadcast

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def score(t: pa.Table) -> pa.Table:
        text = t.column("text")
        n_chars = pc.utf8_length(text)
        alpha = pc.utf8_length(pc.replace_substring_regex(text, pattern=r"[^a-zA-Z]", replacement=""))
        denom = pc.max_element_wise(pc.cast(n_chars, pa.float64()), pa.scalar(1.0))
        ratio = pc.round(
            pc.divide(pc.cast(alpha, pa.float64()), denom),
            ndigits=4,
            round_mode="half_towards_infinity",
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "alpha_ratio": ratio,
            }
        )

    def hist_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": t.column("source").to_pandas(),
                "alpha_ratio": t.column("alpha_ratio").to_pandas(),
            }
        )
        g = df.groupby(["source", "alpha_ratio"], as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
    hist = (
        scored.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["source", "alpha_ratio"], as_index=False)["n"]
        .sum()
    )

    thr = {}
    for src, g in hist.groupby("source"):
        g = g.sort_values("alpha_ratio")
        n = int(g["n"].sum())
        rank = math.ceil(q * n)  # 1-based; q dyadic ⇒ exact
        cum = g["n"].cumsum().to_numpy()
        thr[src] = float(g["alpha_ratio"].to_numpy()[(cum >= rank).argmax()])

    tref = ray.put(thr)

    def gate(t: pa.Table) -> pa.Table:
        th = get_broadcast(tref)
        src = t.column("source").to_pandas()
        cut = src.map(th).to_numpy(dtype="float64")
        keep = t.column("alpha_ratio").to_numpy() >= cut
        return t.filter(pa.array(keep))

    out = scored.map_batches(gate, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64"})


def q132_source_overlap(sf_dir: str, k: int = 5) -> "pd.DataFrame":
    """Cross-source contamination matrix: for every source pair, how many
    DISTINCT k-token shingles appear in BOTH — the audit that tells you
    which corpus components duplicate which (the pairwise generalization
    of q54's one-blocklist decontamination scan and q125's distributional
    drift: q125 says the mixes differ, this says who copies whom).

    Shape: per-batch distinct (shingle, source) pairs → ONE shingle-bucket
    shuffle; inside a bucket each shingle's distinct source set expands to
    source PAIRS and collapses immediately to per-(pair, bucket) partial
    counts, so both the second exchange and the driver reduce are bounded
    by |sources|² × buckets. At 100 TB the shingle column becomes a
    128-bit hash (same documented trade as q121)."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["source", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"sh": pa.array([], pa.string()), "source": pa.array([], pa.string())})
        rows, sh = _shingle_frame(t, k)
        if not len(rows):
            return empty
        d = pd.DataFrame(
            {"sh": sh.to_numpy(), "source": t.column("source").to_pandas().to_numpy()[rows]}
        ).drop_duplicates()
        return pa.Table.from_pandas(d, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(pairs, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["sh", "source"])
        outs = []
        for _, g in df.groupby("sh", sort=False):
            srcs = np.sort(g["source"].to_numpy())
            if len(srcs) < 2:
                continue
            ii, jj = np.triu_indices(len(srcs), 1)
            outs.append(pd.DataFrame({"source_a": srcs[ii], "source_b": srcs[jj]}))
        if not outs:
            return pd.DataFrame(
                {
                    "source_a": pd.array([], dtype="str"),
                    "source_b": pd.array([], dtype="str"),
                    "n_shared": pd.array([], dtype="int64"),
                }
            )
        return (
            pd.concat(outs, ignore_index=True)
            .groupby(["source_a", "source_b"], as_index=False)
            .size()
            .rename(columns={"size": "n_shared"})
        )

    out = bucketed_group_agg(parts, ["sh"], bucket_pairs, n_buckets=16).to_pandas()
    return (
        out.groupby(["source_a", "source_b"], as_index=False)["n_shared"]
        .sum()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
        .astype({"n_shared": "int64"})
    )


def span_removal_starts(
    ds: "ray.data.Dataset", k: int, n_buckets: int = 16
) -> "ray.data.Dataset":
    """(doc_id, pos) start positions of every duplicated k-token span a
    NON-OWNER document must cut (Lee et al. rule: the lowest-doc_id owner
    keeps all occurrences). One shingle-bucket shuffle; each bucket owns
    its shingles, so ownership and the distinct removal set are decided
    in-bucket. Shared by q133_span_removal (stats query) and the curation
    pipeline's span-rewrite stage."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg

    def occurrences(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sh": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            }
        )
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        if len(flat) < k:
            return empty
        m = len(flat) - k + 1
        idx = np.nonzero(par[:m] == par[k - 1 :])[0]
        if not len(idx):
            return empty
        s = pd.Series(flat[idx])
        for j in range(1, k):
            s = s + " " + pd.Series(flat[idx + j])
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        pos = idx - offsets[par[idx]]  # 0-based token index within the doc
        return pa.table(
            {
                "sh": pa.array(s.to_numpy(), pa.string()),
                "doc_id": pa.array(t.column("doc_id").to_numpy()[par[idx]], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    occ = ds.map_batches(occurrences, batch_format="pyarrow")

    def removal_starts(df: pd.DataFrame) -> pd.DataFrame:
        owner = df.groupby("sh")["doc_id"].transform("min")
        nd = df.groupby("sh")["doc_id"].transform("nunique")
        out = df.loc[(nd >= 2) & (df["doc_id"] != owner), ["doc_id", "pos"]]
        return out.drop_duplicates()

    return bucketed_group_agg(occ, ["sh"], removal_starts, n_buckets=n_buckets)


def q133_span_removal(sf_dir: str, k: int = 5) -> "pd.DataFrame":
    """Exact duplicated-substring REMOVAL (Lee et al., "Deduplicating
    Training Data Makes Language Models Better" — the transform q121 only
    measures): every k-token span that occurs in ≥2 documents keeps ALL
    its occurrences in the lowest-doc_id owner and is cut from every other
    document; a non-owner doc drops each token covered by any such span.
    Emits one row per AFFECTED document: token counts and the md5 of the
    rebuilt text (kept tokens joined in original order).

    Shape: (shingle, doc, pos) occurrences ride ONE shingle-bucket shuffle
    (positions must travel — this is a rewrite, not a count); each bucket
    owns its shingles outright, so ownership and the distinct
    (doc, start) removal set are decided in-bucket with no second pass
    over the corpus. Removals then meet their documents in ONE
    bucketed_join on doc_id (inner join == affected-docs filter for
    free), and the rebuild is a per-doc coverage mask inside the join
    bucket. At 100 TB the shingle string column becomes a 128-bit hash
    (q121's documented trade)."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_join

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    removals = span_removal_starts(ds, k)

    def rebuild(docs: pd.DataFrame, rem: pd.DataFrame) -> pd.DataFrame:
        merged = docs.merge(rem, on="doc_id", how="inner")
        rows = []
        for (did, text), g in merged.groupby(["doc_id", "text"], sort=False):
            toks = text.strip().split()
            cover = np.zeros(len(toks), dtype=bool)
            for s in g["pos"].to_numpy():
                cover[s : s + k] = True
            clean = " ".join(np.asarray(toks, dtype=object)[~cover])
            rows.append(
                (
                    did,
                    len(toks),
                    int(cover.sum()),
                    hashlib.md5(clean.encode("utf-8")).hexdigest(),
                )
            )
        return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_removed", "clean_md5"])

    out = bucketed_join(ds, removals, on="doc_id", n_buckets=16, merge_fn=rebuild).to_pandas()
    return (
        out.sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "n_tokens": "int64", "n_removed": "int64"})
    )


def q134_padding_waste(sf_dir: str, seq_len: int = 512) -> "pd.DataFrame":
    """Padding-waste audit for a fixed sequence length: if each document
    were padded to a multiple of ``seq_len`` whitespace tokens (the
    no-packing baseline), how many pad tokens does each source burn? The
    cost argument FOR sequence packing (doc_pack_bins) made measurable —
    sources with short docs dominate the waste. Per-batch partial sums
    (schema-bounded), zero shuffle; empty docs cost one full pad row,
    matching the ceil() convention both sides."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        n = pc.list_value_length(toks)
        n = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int32()), n)
        nt = n.to_numpy(zero_copy_only=False).astype("int64")
        padded = np.maximum(np.ceil(nt / seq_len).astype("int64"), 1) * seq_len
        df = pd.DataFrame(
            {"source": t.column("source").to_pandas(), "nt": nt, "padded": padded}
        )
        g = df.groupby("source", as_index=False).agg(
            n_docs=("nt", "size"), total_tokens=("nt", "sum"), padded_tokens=("padded", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    out = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"),
        total_tokens=("total_tokens", "sum"),
        padded_tokens=("padded_tokens", "sum"),
    )
    out["waste_ratio"] = round_away(
        1.0 - out["total_tokens"].to_numpy() / out["padded_tokens"].to_numpy(), 4
    )
    return (
        out.sort_values("source")
        .reset_index(drop=True)
        .astype({"n_docs": "int64", "total_tokens": "int64", "padded_tokens": "int64"})
    )


def q135_dsir_logratio(sf_dir: str, target_lang: str = "en") -> "ray.data.Dataset":
    """DSIR importance weights (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): per document, the log-likelihood
    ratio of the doc under a smoothed unigram model of the TARGET slice
    (docs with ``lang == target_lang``) vs the RAW corpus,

        logw(d) = sum_t [ln((c_tgt(t)+1)/(N_tgt+V)) − ln((c_raw(t)+1)/(N_raw+V))]

    with add-one smoothing over the raw vocabulary V (raw ⊇ target, so V
    covers every scanned token). High logw = looks like the target domain;
    the resampling step then keeps docs with probability ∝ exp(logw)
    (a top-k / Gumbel-top-k over this output).

    Same two-pass shape as q80_unigram_logppl: pass 1 fits the model — per
    batch (token, c_raw, c_tgt) partials ride ONE bucketed shuffle, so
    vocab rows (not corpus rows) are shuffled and collected; the fitted
    per-token weight vector is broadcast ONCE via ray.put as a prebuilt
    pd.Index + float64 array. Pass 2 re-scans and scores each batch
    vectorized (get_indexer + bincount). At web scale the documented DSIR
    trick bounds the model: hash tokens/n-grams into 2^k buckets (hashed
    n-gram features) so the broadcast is O(2^k) regardless of vocab growth
    — the scoring pass is unchanged, only the index becomes a modulo."""
    import numpy as np
    import pandas as pd
    import ray

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    # ---- pass 1: (token, c_raw, c_tgt), pre-combined per batch -----------
    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        is_tgt = pc.equal(t.column("lang"), target_lang).to_numpy(zero_copy_only=False)
        d = pd.DataFrame(
            {
                "token": pc.list_flatten(toks).to_pandas(),
                "tgt": is_tgt[parent].astype(np.int64),
            }
        )
        d = d[d["token"] != ""]
        g = d.groupby("token", as_index=False).agg(c_raw=("tgt", "size"), c_tgt=("tgt", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def cnt_final(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.groupby("token", as_index=False).agg(
            c_raw=("c_raw", "sum"), c_tgt=("c_tgt", "sum")
        )

    vocab = bucketed_group_agg(partials, ["token"], cnt_final, n_buckets=16).to_pandas()
    n_raw = float(vocab["c_raw"].sum())
    n_tgt = float(vocab["c_tgt"].sum())
    v = float(len(vocab))
    # per-token weight, evaluated in the oracle's left-to-right expression
    # order so each token's float64 value is bit-identical to DuckDB's
    w = (
        np.log(vocab["c_tgt"].to_numpy(np.float64) + 1.0)
        - np.log(vocab["c_raw"].to_numpy(np.float64) + 1.0)
        + np.log(n_raw + v)
        - np.log(n_tgt + v)
    )
    ref = ray.put((pd.Index(vocab["token"]), w))

    # ---- pass 2: score every document against the broadcast model --------
    def score(t: pa.Table) -> pa.Table:
        from .common import get_broadcast

        idx, wv = get_broadcast(ref)
        t = t.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        tok = pc.list_flatten(toks).to_pandas()
        keep = (tok != "").to_numpy()
        parent = parent[keep]
        pos = idx.get_indexer(pd.Index(tok[keep]))
        n_rows = t.num_rows
        sums = np.bincount(parent, weights=wv[pos], minlength=n_rows)
        cnts = np.bincount(parent, minlength=n_rows)
        has = cnts > 0
        return pa.table(
            {
                "doc_id": t.column("doc_id").take(pa.array(np.flatnonzero(has))),
                "n_tok": pa.array(cnts[has].astype(np.int64)),
                "logw": pa.array(round_away(sums[has], 4)),
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def q136_gopher_repetition(
    sf_dir: str, top3_max: float = 0.18, dup5_max: float = 0.15
) -> "ray.data.Dataset":
    """Gopher repetition-rule gate (Rae et al. 2021, table A1): the two
    duplicate-content signals a pretraining quality filter applies per doc —
    (a) top3_frac: fraction of token characters covered by the single most
    repeated 3-gram (occurrences × gram chars / total token chars), and
    (b) dup5_frac: fraction of token characters lying inside ANY duplicated
    5-gram (position-union, so overlapping duplicates are not double-
    counted). A doc passes (`keep` = 1) when both rounded fractions are
    under their thresholds (Gopher's 0.18 / 0.15 defaults).

    Purely within-document: embarrassingly parallel, zero shuffle. Each
    batch is one vectorized pass — arrow split + flatten, pandas grouped
    shifts to form the 3/5-gram frames, one groupby per signal; the
    position-union rides a drop_duplicates + merge, never a Python loop
    over rows."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    OUT_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tok", pa.int64()),
            ("total_chars", pa.int64()),
            ("top3_frac", pa.float64()),
            ("dup5_frac", pa.float64()),
            ("keep", pa.int64()),
        ]
    )

    def f(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        tok = flat.to_pandas().to_numpy()
        m = tok != ""
        d = pd.DataFrame(
            {"p": parent[m], "tk": tok[m], "ln": lens[m].astype(np.int64)}
        )
        if d.empty:
            return OUT_SCHEMA.empty_table()
        d["pos"] = d.groupby("p").cumcount()
        agg = d.groupby("p").agg(n_tok=("tk", "size"), total=("ln", "sum"))

        g = d.copy()
        for o in (1, 2, 3, 4):
            g[f"tk{o}"] = g.groupby("p")["tk"].shift(-o)
            g[f"l{o}"] = g.groupby("p")["ln"].shift(-o)

        # (a) most-repeated 3-gram coverage
        g3 = g.dropna(subset=["tk2"])
        if len(g3):
            t3 = pd.DataFrame(
                {
                    "p": g3["p"].to_numpy(),
                    "g": (g3["tk"] + " " + g3["tk1"] + " " + g3["tk2"]).to_numpy(),
                    "gc": (
                        g3["ln"].to_numpy()
                        + g3["l1"].to_numpy(np.int64)
                        + g3["l2"].to_numpy(np.int64)
                    ),
                }
            )
            per = t3.groupby(["p", "g"], as_index=False).agg(
                cnt=("gc", "size"), gc=("gc", "first")
            )
            top3 = (per["cnt"] * per["gc"]).groupby(per["p"]).max()
        else:
            top3 = pd.Series(dtype=np.int64)

        # (b) duplicated-5-gram character coverage (position union)
        g5 = g.dropna(subset=["tk4"])
        dupchars = pd.Series(dtype=np.int64)
        if len(g5):
            t5 = pd.DataFrame(
                {
                    "p": g5["p"].to_numpy(),
                    "pos": g5["pos"].to_numpy(),
                    "g": (
                        g5["tk"] + " " + g5["tk1"] + " " + g5["tk2"]
                        + " " + g5["tk3"] + " " + g5["tk4"]
                    ).to_numpy(),
                }
            )
            c = t5.groupby(["p", "g"])["g"].transform("size").to_numpy()
            dup = t5[c > 1]
            if len(dup):
                cover = pd.concat(
                    [
                        pd.DataFrame({"p": dup["p"].to_numpy(), "pos": dup["pos"].to_numpy() + o})
                        for o in range(5)
                    ]
                ).drop_duplicates()
                dupchars = (
                    cover.merge(d[["p", "pos", "ln"]], on=["p", "pos"], how="inner")
                    .groupby("p")["ln"]
                    .sum()
                )

        total = agg["total"].to_numpy(np.float64)
        top3v = top3.reindex(agg.index, fill_value=0).to_numpy(np.float64)
        dupv = dupchars.reindex(agg.index, fill_value=0).to_numpy(np.float64)
        top3_frac = round_away(top3v / total, 4)
        dup5_frac = round_away(dupv / total, 4)
        keep = ((top3_frac <= top3_max) & (dup5_frac <= dup5_max)).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id").take(pa.array(agg.index.to_numpy())),
                "n_tok": pa.array(agg["n_tok"].to_numpy(np.int64)),
                "total_chars": pa.array(agg["total"].to_numpy(np.int64)),
                "top3_frac": pa.array(top3_frac),
                "dup5_frac": pa.array(dup5_frac),
                "keep": pa.array(keep),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q137_zipf_alpha(sf_dir: str, top_k: int = 100) -> "pd.DataFrame":
    """Per-source Zipf fit — the corpus-health diagnostic of a pretraining
    mix (natural language sits near alpha ≈ −1 on log-freq vs log-rank;
    boilerplate/spam sources bend the head, OCR noise fattens the tail):
    OLS slope of ln(tf) on ln(rank) over each source's top-K tokens,
    computed as covar_pop/var_pop to mirror SQL regr_slope.

    One bucketed shuffle of pre-combined (source, token) partials → the
    exact count table (vocab × sources rows, bounded — the q35/q80 model
    bound; a top-V cap keeps it bounded when vocab grows with the data);
    the rank-and-fit step runs on that aggregate, never on corpus rows.
    Rank ties (equal tf) don't affect the fit: permuting equal-y points
    among ranks leaves the OLS sums unchanged, so the tf-desc/token
    tie-break only pins WHICH tokens cross the top-K cut, not the slope."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        src = t.column("source").to_pandas().to_numpy()
        d = pd.DataFrame({"source": src[parent], "token": pc.list_flatten(toks).to_pandas()})
        d = d[d["token"] != ""]
        g = d.groupby(["source", "token"], as_index=False).size().rename(columns={"size": "tf"})
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def tf_final(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.groupby(["source", "token"], as_index=False).agg(tf=("tf", "sum"))

    counts = bucketed_group_agg(partials, ["source", "token"], tf_final, n_buckets=16).to_pandas()

    rows = []
    for source, g in counts.groupby("source"):
        n_vocab = len(g)
        g = g.sort_values(["tf", "token"], ascending=[False, True], kind="mergesort").head(top_k)
        y = np.log(g["tf"].to_numpy(np.float64))
        x = np.log(np.arange(1, len(g) + 1, dtype=np.float64))
        xm, ym = x.mean(), y.mean()
        slope = ((x - xm) * (y - ym)).mean() / ((x - xm) ** 2).mean()
        rows.append((source, n_vocab, round_away(slope, 4)))
    return pd.DataFrame(rows, columns=["source", "n_vocab", "alpha"]).sort_values(
        "source"
    ).reset_index(drop=True)


def q138_ppl_buckets(sf_dir: str, n_ranges: int = 64) -> "ray.data.Dataset":
    """CCNet-style perplexity partition (Wenzek et al. 2020): score every
    doc with the corpus unigram LM (the q80 logppl), then split each
    language into head / middle / tail terciles by percent_rank of the
    score — the standard "keep head+middle, drop tail" pretraining gate.

    Three passes, all distributed: (1) the q80 model fit (vocab rows ride
    one bucketed shuffle, fitted model broadcast once); (2) a scoring scan
    producing (doc_id, lang, logppl), materialized once — doc-count rows,
    ~1e-3 of corpus bytes; the cluster path Parquet-checkpoints this
    barrier exactly like kg.py's triples checkpoint; (3) the q95
    distributed-ECDF percent_rank over HOT per-lang partitions:
    range-partition logppl, one tiny (lang, range) counting pass prefix-
    summed on the driver (G×R rows), one range shuffle with local
    min-rank counts lifted by broadcast offsets. Ranks are computed over
    the 4dp-ROUNDED score on both engine and oracle sides, so tie classes
    are identical; tercile edges compare k/(n−1) doubles against literal
    1/3 and 2/3 doubles — correctly-rounded division makes the engine and
    SQL comparisons bit-identical."""
    import numpy as np
    import pandas as pd
    import ray

    from .common import bucketed_group_agg

    # ---- pass 1: unigram model (the q80 fit) ------------------------------
    partials = _token_partials(read_table(sf_dir, "documents", columns=["doc_id", "text"]))

    def tf_final(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.groupby("token", as_index=False).agg(tf=("tf", "sum"))

    vocab = bucketed_group_agg(partials, ["token"], tf_final, n_buckets=16).to_pandas()
    n_total = float(vocab["tf"].sum())
    ref = ray.put((pd.Index(vocab["token"]), vocab["tf"].to_numpy(dtype=np.float64), n_total))

    # ---- pass 2: score (doc_id, lang, logppl), materialized once ----------
    def score(t: pa.Table) -> pa.Table:
        from .common import get_broadcast

        idx, tf, n = get_broadcast(ref)
        t = t.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        tok = pc.list_flatten(toks).to_pandas()
        keep = (tok != "").to_numpy()
        parent = parent[keep]
        pos = idx.get_indexer(pd.Index(tok[keep]))
        x = np.log(tf[pos] / n)
        sums = np.bincount(parent, weights=x, minlength=t.num_rows)
        cnts = np.bincount(parent, minlength=t.num_rows)
        has = cnts > 0
        sel = pa.array(np.flatnonzero(has))
        return pa.table(
            {
                "doc_id": t.column("doc_id").take(sel),
                "lang": t.column("lang").take(sel),
                "logppl": pa.array(round_away(-(sums[has] / cnts[has]), 4)),
            }
        )

    scored = (
        read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
        .map_batches(score, batch_format="pyarrow")
        .materialize()
    )

    # ---- pass 3: per-lang distributed ECDF tercile (the q95 shape) --------
    mm = scored.map_batches(
        lambda df: pd.DataFrame({"mn": [df["logppl"].min()], "mx": [df["logppl"].max()]}),
        batch_format="pandas",
        batch_size=65536,
    ).to_pandas()
    mn, mx = float(mm["mn"].min()), float(mm["mx"].max())
    bounds = np.linspace(mn, mx, n_ranges + 1)[1:-1]

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        rb = np.searchsorted(bounds, df["logppl"].to_numpy(), side="right")
        return (
            pd.DataFrame({"lang": df["lang"], "_rb": rb})
            .groupby(["lang", "_rb"], as_index=False)
            .size()
        )

    counts = (
        scored.map_batches(cnt_partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["lang", "_rb"], as_index=False)["size"]
        .sum()
        .sort_values(["lang", "_rb"], kind="mergesort")
    )
    counts["offset"] = counts.groupby("lang")["size"].cumsum() - counts["size"]
    n_per_lang = counts.groupby("lang")["size"].sum().to_dict()
    offsets = {(l, r): int(o) for l, r, o in zip(counts["lang"], counts["_rb"], counts["offset"])}

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rb"] = np.searchsorted(bounds, df["logppl"].to_numpy(), side="right").astype("int64")
        return df

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "_rb", "logppl"], kind="mergesort")
        pos = df.groupby(["lang", "_rb"], sort=False).cumcount().to_numpy()
        val = df["logppl"].to_numpy()
        lang = df["lang"].to_numpy()
        rb = df["_rb"].to_numpy()
        first = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            first[1:] = (lang[1:] != lang[:-1]) | (rb[1:] != rb[:-1]) | (val[1:] != val[:-1])
        local_lt = pd.Series(np.where(first, pos, -1)).replace(-1, np.nan).ffill().to_numpy()
        off = np.fromiter(
            (offsets.get((l, r), 0) for l, r in zip(lang, rb)), dtype=np.float64, count=len(df)
        )
        n = np.fromiter((n_per_lang[l] for l in lang), dtype=np.float64, count=len(df))
        pct = (off + local_lt) / np.maximum(n - 1.0, 1.0)
        bucket = np.where(pct < 1.0 / 3.0, "head", np.where(pct < 2.0 / 3.0, "middle", "tail"))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "lang": df["lang"],
                "logppl": val,
                "bucket": bucket,
            }
        )

    stamped = scored.map_batches(stamp, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(stamped, ["_rb"], final, n_buckets=32)


def q139_boilerplate_ngrams(sf_dir: str, n: int = 8, k: int = 50) -> "pd.DataFrame":
    """Boilerplate n-gram mining (the filter-list builder of a web-corpus
    pipeline): the K most frequent token 8-grams corpus-wide with total
    occurrences and distinct-doc counts — the repeated headers/footers/
    templates a cleaning pass then strips. Per batch, docs explode to
    (ngram, doc_id, occurrences-within-doc) rows — already deduped to one
    row per (ngram, doc) so the distinct-doc count is a plain row count
    after the shuffle; ONE bucketed shuffle on the ngram key, per-bucket
    exact top-K (each ngram's rows complete within its bucket), then a
    driver merge of B×K candidate rows. Ties break occurrences-desc then
    ngram-asc, so the top-K SET is deterministic."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        tok = pc.list_flatten(toks).to_pandas().to_numpy()
        m = tok != ""
        d = pd.DataFrame({"p": parent[m], "tk": tok[m]})
        if d.empty:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64()),
                 "occ": pa.array([], pa.int64())}
            )
        g = d.copy()
        for o in range(1, n):
            g[f"tk{o}"] = g.groupby("p")["tk"].shift(-o)
        g = g.dropna(subset=[f"tk{n-1}"])
        if g.empty:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64()),
                 "occ": pa.array([], pa.int64())}
            )
        gram = g["tk"].str.cat([g[f"tk{o}"] for o in range(1, n)], sep=" ")
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)[g["p"].to_numpy()]
        out = (
            pd.DataFrame({"ngram": gram.to_numpy(), "doc_id": doc})
            .groupby(["ngram", "doc_id"], as_index=False)
            .size()
            .rename(columns={"size": "occ"})
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def topk_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ngram", as_index=False).agg(
            occurrences=("occ", "sum"), n_docs=("doc_id", "nunique")
        )
        return g.sort_values(
            ["occurrences", "ngram"], ascending=[False, True], kind="mergesort"
        ).head(k)

    cand = bucketed_group_agg(partials, ["ngram"], topk_final, n_buckets=16).to_pandas()
    out = (
        cand.sort_values(["occurrences", "ngram"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
        .astype({"occurrences": "int64", "n_docs": "int64"})
    )
    return out


def q143_fuzzy_decontaminate(
    sf_dir: str, blocklist_source: str = "src0", k: int = 5, threshold: float = 0.1
) -> "ray.data.Dataset":
    """FUZZY test-set decontamination (the GPT-3/Llama-report variant of
    q54's exact-overlap scan): a corpus document is contaminated when its
    k-token-shingle Jaccard against ANY blocklist document reaches
    ``threshold`` — per hit, emit the best-matching blocklist doc (highest
    Jaccard, ties to the lowest block doc id). q54 counts shared shingles;
    this scores whole-document similarity, catching paraphrase-level leaks
    a few shared shingles understate.

    Shape: the blocklist (a test set — small by definition) ships ONCE as a
    broadcast (shingle → block doc, block size) frame; the corpus side is a
    single shuffle-free scan — per batch one pandas merge on the shingle,
    per-(doc, block-doc) intersection counts, exact Jaccard from the two
    set sizes riding the rows, per-doc argmax. A document never spans
    batches, so batch-local results are final. If the blocklist outgrew
    broadcast, the fallback is jaccard_pairs_exact's bucketed
    inverted-index join restricted to corpus×blocklist pairs."""
    import pandas as pd
    import ray

    from .common import get_broadcast, read_small, read_table, round_away

    bl = read_small(sf_dir, "documents", columns=["doc_id", "text", "source"])
    bl = bl.filter(pc.equal(bl.column("source"), blocklist_source))
    rows, sh = _shingle_frame(bl, k)
    bl_df = pd.DataFrame(
        {"bdoc": bl.column("doc_id").to_numpy()[rows], "s": sh.to_numpy()}
    ).drop_duplicates()
    bl_df["bsz"] = bl_df.groupby("bdoc")["s"].transform("size").astype("int64")
    ref = ray.put(bl_df)

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    EMPTY = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "block_doc": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def f(t: pa.Table) -> pa.Table:
        import numpy as np

        t = t.filter(pc.not_equal(t.column("source"), blocklist_source))
        if t.num_rows == 0:
            return EMPTY
        rows, sh = _shingle_frame(t, k)
        if not len(rows):
            return EMPTY
        d = pd.DataFrame(
            {"doc_id": t.column("doc_id").to_numpy()[rows], "s": sh.to_numpy()}
        ).drop_duplicates()
        d["sz"] = d.groupby("doc_id")["s"].transform("size").astype("int64")
        m = d.merge(get_broadcast(ref), on="s")
        if m.empty:
            return EMPTY
        g = m.groupby(["doc_id", "bdoc"], as_index=False).agg(
            i=("s", "size"), sz=("sz", "first"), bsz=("bsz", "first")
        )
        jac = g["i"].to_numpy(np.float64) / (
            g["sz"].to_numpy(np.float64) + g["bsz"].to_numpy(np.float64) - g["i"].to_numpy(np.float64)
        )
        g["jac"] = jac
        g = g[jac >= threshold]
        if g.empty:
            return EMPTY
        best = g.sort_values(
            ["doc_id", "jac", "bdoc"], ascending=[True, False, True], kind="mergesort"
        ).drop_duplicates("doc_id")
        return pa.table(
            {
                "doc_id": pa.array(best["doc_id"].to_numpy(), pa.int64()),
                "block_doc": pa.array(best["bdoc"].to_numpy(), pa.int64()),
                "jaccard": pa.array(round_away(best["jac"].to_numpy(), 4)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q155_source_ks(sf_dir: str) -> pd.DataFrame:
    """Per-source distribution-drift screen: the two-sample
    Kolmogorov-Smirnov statistic between each source's document-length
    (n_chars) distribution and the pooled corpus — the SHAPE-drift
    companion to q125's token-KL (KL sees what words shifted; KS sees
    whether a source's length profile diverged, the classic
    boilerplate/truncation symptom). Both ECDFs are step functions that
    jump only at observed values, so the exact sup-distance is the max
    over the bounded (source, n_chars) count table: one two-phase count
    exchange (distinct lengths x sources — schema-bounded), then the
    cumulative-difference scan is driver math on that aggregate."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source", "n_chars"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "n_chars"], as_index=False)["cnt"].sum()
        return g.astype({"cnt": "int64"})

    counts = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["source", "n_chars"],
        final,
        n_buckets=8,
    ).to_pandas()

    grid = np.sort(counts["n_chars"].unique())
    corpus = (
        counts.groupby("n_chars")["cnt"].sum().reindex(grid, fill_value=0).to_numpy(dtype=np.int64)
    )
    cn = float(corpus.sum())
    ccum = np.cumsum(corpus).astype(np.float64) / cn
    out = []
    for source, g in counts.groupby("source", sort=True):
        sc = g.set_index("n_chars")["cnt"].reindex(grid, fill_value=0).to_numpy(dtype=np.int64)
        n = float(sc.sum())
        scum = np.cumsum(sc).astype(np.float64) / n
        out.append(
            {
                "source": source,
                "n_docs": int(n),
                "ks": float(round_away(np.array([np.abs(scum - ccum).max()]), 6)[0]),
            }
        )
    res = pd.DataFrame(out)
    return res.astype({"n_docs": "int64"})


def q161_hapax_ratio(sf_dir: str) -> "ray.data.Dataset":
    """Per-source hapax-legomena ratio: the share of each source's
    vocabulary that occurs exactly ONCE in that source — the
    vocabulary-richness screen (high hapax = diverse or noisy text; low =
    templated/boilerplate, the q139 symptom seen from the other side).
    Arrow-vectorized tokenize (q35's kernel) collapses each batch to
    (source, token) count partials; ONE pair-bucket shuffle makes
    per-(source, token) totals exact, and each bucket emits per-source
    (vocab, hapax) counts — source-vocabulary-bounded partials — for a
    tiny source reduce."""
    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        src = pc.take(t.column("source"), pc.list_parent_indices(toks))
        d = pd.DataFrame(
            {"source": src.to_pylist(), "token": flat.to_pylist()}
        )
        d = d[d["token"] != ""]
        g = d.groupby(["source", "token"], as_index=False).size().rename(columns={"size": "tf"})
        return pa.Table.from_pandas(
            g.astype({"tf": "int64"}), preserve_index=False
        ).replace_schema_metadata(None)

    def pair_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "token"], as_index=False)["tf"].sum()
        out = g.groupby("source", as_index=False).agg(
            p_vocab=("tf", "size"), p_hapax=("tf", lambda s: int((s == 1).sum()))
        )
        return out.astype({"p_vocab": "int64", "p_hapax": "int64"})

    parts = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "token"],
        pair_final,
        n_buckets=16,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).agg(
            vocab=("p_vocab", "sum"), hapax=("p_hapax", "sum")
        )
        return pd.DataFrame(
            {
                "source": g["source"],
                "vocab": g["vocab"].astype("int64"),
                "hapax": g["hapax"].astype("int64"),
                "hapax_ratio": round_away(
                    g["hapax"].to_numpy(dtype="float64") / g["vocab"].to_numpy(dtype="float64"),
                    6,
                ),
            }
        )

    return bucketed_group_agg(parts, ["source"], final, n_buckets=4)


def q174_cramers_v(sf_dir: str) -> pd.DataFrame:
    """Cramér's V between document language and source — the EFFECT-SIZE
    companion to q111's chi-squared (χ² grows with n and always "fires" on
    big data; V = sqrt(χ²/(n·(min(r,c)−1))) is scale-free, the number you
    can threshold in a drift monitor). One bounded (lang, source) count
    exchange; χ² and V are driver math from exact int64 cell counts with
    the expected-count expression written identically in the SQL."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["lang", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "source"], as_index=False).size().rename(columns={"size": "n"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "source"], as_index=False)["n"].sum()
        return g.astype({"n": "int64"})

    cells = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["lang", "source"],
        final,
        n_buckets=4,
    ).to_pandas()
    piv = cells.pivot_table(index="lang", columns="source", values="n", fill_value=0).astype(
        "int64"
    )
    obs = piv.to_numpy(dtype=np.float64)
    n = float(obs.sum())
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    exp = row * col / n
    chi2 = float(((obs - exp) * (obs - exp) / exp).sum())
    k = min(piv.shape[0], piv.shape[1]) - 1
    v = float(np.sqrt(chi2 / (n * k)))
    return pd.DataFrame(
        {
            "n_docs": np.array([int(n)], dtype=np.int64),
            "chi2": [round_away(np.array([chi2]), 4)[0]],
            "cramers_v": [round_away(np.array([v]), 6)[0]],
        }
    )


def q175_prefix_families(sf_dir: str, k_chars: int = 32, min_docs: int = 2) -> "ray.data.Dataset":
    """Shared-prefix family mining: groups of documents opening with the
    same first ``k_chars`` characters — the cheap template/boilerplate
    detector that catches header-stamped corpora before the shingle-level
    miners (q139) spend their shuffle. Two-phase count on the prefix key;
    only families with >= ``min_docs`` members survive, so the output is
    family-sized."""
    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(t.column("text"), 0, k_chars)
        import pandas as _pd

        g = _pd.DataFrame({"prefix": pref.to_pylist()}).groupby(
            "prefix", as_index=False
        ).size().rename(columns={"size": "p_n"})
        return pa.Table.from_pandas(
            g.astype({"p_n": "int64"}), preserve_index=False
        ).replace_schema_metadata(None)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("prefix", as_index=False)["p_n"].sum()
        g = g.loc[g["p_n"] >= min_docs].rename(columns={"p_n": "n_docs"})
        return g.astype({"n_docs": "int64"})

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["prefix"],
        final,
        n_buckets=8,
    )


def q181_source_lang_purity(sf_dir: str) -> pd.DataFrame:
    """Language homogeneity per source: the share of a source's documents
    in its own DOMINANT language (q14's lang-id, majority with
    deterministic tie-break) — the mixed-crawl screen that decides whether
    a source needs per-language splitting before entering a training mix.
    One bounded (source, lang) count exchange; dominant + purity are
    driver math on the grid."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["source", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source", "lang"], as_index=False).size().rename(columns={"size": "n"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "lang"], as_index=False)["n"].sum()
        return g.astype({"n": "int64"})

    cells = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["source", "lang"],
        final,
        n_buckets=4,
    ).to_pandas()
    cells = cells.sort_values(["source", "n", "lang"], ascending=[True, False, True],
                              kind="mergesort")
    top = cells.groupby("source", as_index=False).first()
    tot = cells.groupby("source", as_index=False)["n"].sum().rename(columns={"n": "total"})
    out = top.merge(tot, on="source")
    return pd.DataFrame(
        {
            "source": out["source"],
            "dominant_lang": out["lang"],
            "n_docs": out["total"].astype("int64"),
            "purity": round_away(
                out["n"].to_numpy(dtype=np.float64) / out["total"].to_numpy(dtype=np.float64),
                6,
            ),
        }
    )


def q182_prefix_family_diversity(sf_dir: str, k_chars: int = 32, min_docs: int = 2) -> "ray.data.Dataset":
    """Template-vs-duplicate triage for q175's prefix families: per shared
    32-codepoint opening, member count AND distinct-body count (md5 of the
    full text) — families where n_distinct == 1 are exact duplicates
    (route to q11's dedup), families with many distinct bodies are
    templates (route to q133's span removal). One (prefix, md5) distinct
    exchange, family-sized output."""
    import hashlib

    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(t.column("text"), 0, k_chars).to_pylist()
        texts = t.column("text").to_pylist()
        import pandas as _pd

        d = _pd.DataFrame(
            {
                "prefix": pref,
                "h": [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts],
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(d, preserve_index=False).replace_schema_metadata(None)

    def count_partial(t: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(t.column("text"), 0, k_chars)
        import pandas as _pd

        g = _pd.DataFrame({"prefix": pref.to_pylist()}).groupby(
            "prefix", as_index=False
        ).size().rename(columns={"size": "p_n"})
        return pa.Table.from_pandas(
            g.astype({"p_n": "int64"}), preserve_index=False
        ).replace_schema_metadata(None)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().groupby("prefix", as_index=False)["h"].nunique()
        return g.rename(columns={"h": "n_distinct"}).astype({"n_distinct": "int64"})

    distinct = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["prefix"],
        final,
        n_buckets=8,
    )

    def cfinal(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("prefix", as_index=False)["p_n"].sum()
        g = g.loc[g["p_n"] >= min_docs].rename(columns={"p_n": "n_docs"})
        return g.astype({"n_docs": "int64"})

    counts = bucketed_group_agg(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["prefix"],
        cfinal,
        n_buckets=8,
    )

    def merge_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return left.merge(right, on="prefix")

    from .common import bucketed_join

    return bucketed_join(counts, distinct, on="prefix", n_buckets=8, merge_fn=merge_fn)


def _source_token_counts(sf_dir: str, n_buckets: int = 16) -> "ray.data.Dataset":
    """Per-(source, token) total counts through ONE token-bucket shuffle —
    per-batch partials collapse before the exchange (a token's rows per
    batch become one partial row), so the shuffle moves vocabulary-bounded
    partials, not the token stream. Shared by the lexical-diversity family
    (q190 TTR / q191 Simpson)."""
    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        src = pc.take(t.column("source"), pc.list_parent_indices(toks))
        d = pd.DataFrame({"source": src.to_pylist(), "token": flat.to_pylist()})
        d = d[d["token"] != ""]
        g = d.groupby(["source", "token"], as_index=False).size().rename(columns={"size": "c"})
        return pa.Table.from_pandas(
            g.astype({"c": "int64"}), preserve_index=False
        ).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def final(df):
        return df.groupby(["source", "token"], as_index=False)["c"].sum()

    return bucketed_group_agg(parts, ["token"], final, n_buckets=n_buckets)


def q190_source_ttr(sf_dir: str) -> "pd.DataFrame":
    """Type-token ratio per source — the coarse lexical-diversity gate
    (template-generated sources sit far below organic ones). The
    (source, token) counts ride _source_token_counts' one token-bucket
    shuffle; each bucket owns its tokens outright, so per-source
    (n_types, n_tokens) partials are exact per bucket and the driver merge
    is sources × buckets sized. TTR is a double ratio of exact int64
    counts — bitwise equal on both oracle sides."""
    import pandas as pd

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).agg(
            tp_types=("token", "size"), tp_tokens=("c", "sum")
        )
        return g.astype({"tp_types": "int64", "tp_tokens": "int64"})

    merged = (
        _source_token_counts(sf_dir)
        .map_batches(per_bucket, batch_format="pandas")
        .to_pandas()
        .groupby("source", as_index=False)
        .agg(n_types=("tp_types", "sum"), n_tokens=("tp_tokens", "sum"))
    )
    merged["ttr"] = round_away(
        merged["n_types"].to_numpy(dtype="float64")
        / merged["n_tokens"].to_numpy(dtype="float64"),
        6,
    )
    return merged.astype({"n_types": "int64", "n_tokens": "int64"})


def q191_simpson_diversity(sf_dir: str) -> "pd.DataFrame":
    """Simpson concentration λ = Σ(cᵢ/N)² of the token distribution per
    source (the collision probability of two random tokens — 1/λ is the
    effective vocabulary size, the q162-HHI idea applied to language).
    Same one-shuffle shape as q190; per bucket the partial is (Σcᵢ², Σcᵢ)
    — both exact int64 (bound: the top token's c² must stay < 2^63, i.e.
    c < 3e9 occurrences per source; past that the partial widens to
    float128 limbs before the oracle's HUGEINT does). λ is a ratio of
    exact integers, bitwise equal on both sides."""
    import pandas as pd

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(dtype="int64")
        d = pd.DataFrame({"source": df["source"], "c": c, "c2": c * c})
        return d.groupby("source", as_index=False).agg(
            tp_c=("c", "sum"), tp_c2=("c2", "sum")
        )

    merged = (
        _source_token_counts(sf_dir)
        .map_batches(per_bucket, batch_format="pandas")
        .to_pandas()
        .groupby("source", as_index=False)
        .agg(n_tokens=("tp_c", "sum"), s_c2=("tp_c2", "sum"))
    )
    n = merged["n_tokens"].to_numpy(dtype="float64")
    merged["simpson"] = round_away(merged["s_c2"].to_numpy(dtype="float64") / (n * n), 6)
    return merged.drop(columns=["s_c2"]).astype({"n_tokens": "int64"})


def q193_length_decile_bands(sf_dir: str) -> "pd.DataFrame":
    """Length-distribution drift per source: each document banded into the
    CORPUS-level n_chars deciles — a uniform source shows ~10% per band,
    a template farm piles into one (the visual companion to q155's KS
    statistic). Pass 1 reduces n_chars to a value-count histogram
    (char-length-bounded, schema-sized partials, no shuffle of rows);
    the driver takes the 9 discrete decile thresholds off it (DuckDB
    quantile_disc rank rule); pass 2 re-scans with the thresholds
    broadcast and emits (source, band) count partials. Banding is an
    integer comparison against exact int64 thresholds — tie and edge
    placement lands identically on both oracle sides."""
    import numpy as np
    import pandas as pd

    from .common import get_broadcast
    from .relational import _disc_quantiles_from_hist

    ds = read_table(sf_dir, "documents", columns=["source", "n_chars"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_chars", as_index=False).size().rename(columns={"size": "cnt"})
        return g.astype({"n_chars": "int64", "cnt": "int64"})

    hist = (
        ds.map_batches(hist_partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("n_chars", as_index=False)["cnt"]
        .sum()
        .sort_values("n_chars", kind="mergesort")
    )
    qs = [i / 10 for i in range(1, 10)]
    thr = _disc_quantiles_from_hist(
        hist["n_chars"].to_numpy(dtype=np.int64), hist["cnt"].to_numpy(dtype=np.int64), qs
    )
    ref = ray.put(np.asarray(thr, dtype=np.int64))

    def band_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = get_broadcast(ref)
        x = df["n_chars"].to_numpy(dtype=np.int64)
        band = 1 + (x[:, None] > t[None, :]).sum(axis=1).astype(np.int64)
        d = pd.DataFrame({"source": df["source"], "band": band})
        g = d.groupby(["source", "band"], as_index=False).size().rename(columns={"size": "n_docs"})
        return g.astype({"band": "int64", "n_docs": "int64"})

    merged = (
        ds.map_batches(band_partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["source", "band"], as_index=False)["n_docs"]
        .sum()
    )
    return merged.astype({"band": "int64", "n_docs": "int64"})


def q199_val_oov_rate(sf_dir: str, train_fraction: float = 0.8) -> "pd.DataFrame":
    """Validation OOV audit: after the md5 doc split (q130's hex-prefix
    rule on the doc's own id), what fraction of VALIDATION token
    occurrences — and how many distinct types — never appear in the train
    vocabulary. The held-out-shift readout every tokenizer/embedding
    decision should see before training. Per-batch (token, n_train,
    n_val) partials ride ONE token-bucket shuffle; each bucket owns its
    tokens, so the OOV decision (n_train == 0) is exact in-bucket and
    only (Σval, Σoov, Σoov_types) leave it. Integer counts end to end;
    the rate is one double ratio."""
    import hashlib

    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg

    frac_hex = format(int(train_fraction * 16**8), "08x") + "0" * 24
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = pc.list_flatten(toks)
        doc = pc.take(t.column("doc_id"), pc.list_parent_indices(toks))
        is_train = {
            int(d): hashlib.md5(str(int(d)).encode("ascii")).hexdigest() < frac_hex
            for d in pd.unique(t.column("doc_id").to_numpy(zero_copy_only=False))
        }
        d = pd.DataFrame(
            {"doc_id": doc.to_numpy(zero_copy_only=False), "token": flat.to_pylist()}
        )
        d = d[d["token"] != ""]
        d["tr"] = d["doc_id"].map(is_train)
        g = d.groupby("token", as_index=False).agg(
            n_train=("tr", "sum"), n_tok=("tr", "size")
        )
        g["n_val"] = g["n_tok"] - g["n_train"]
        return pa.Table.from_pandas(
            g[["token", "n_train", "n_val"]].astype({"n_train": "int64", "n_val": "int64"}),
            preserve_index=False,
        ).replace_schema_metadata(None)

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("token", as_index=False).agg(
            n_train=("n_train", "sum"), n_val=("n_val", "sum")
        )
        oov = g.loc[(g["n_train"] == 0) & (g["n_val"] > 0)]
        return pd.DataFrame(
            {
                "p_val": [int(g["n_val"].sum())],
                "p_oov": [int(oov["n_val"].sum())],
                "p_oov_types": [len(oov)],
            }
        )

    parts = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], per_bucket, n_buckets=16
    ).to_pandas()
    n_val = int(parts["p_val"].sum())
    n_oov = int(parts["p_oov"].sum())
    return pd.DataFrame(
        {
            "n_val_tokens": pd.array([n_val], dtype="int64"),
            "n_oov_tokens": pd.array([n_oov], dtype="int64"),
            "n_oov_types": pd.array([int(parts["p_oov_types"].sum())], dtype="int64"),
            "oov_rate": [
                float(round_away(np.array([n_oov / n_val if n_val else float("nan")]), 6)[0])
            ],
        }
    )


def q202_lang_confusion_matrix(sf_dir: str) -> "pd.DataFrame":
    """Declared-vs-predicted language confusion matrix: the metadata lang
    column against q14's deterministic heuristic — the quality audit that
    tells you whether to trust a crawl's self-reported language before
    routing by it. Langs × predictions bounded partial counts (the
    prediction is per-batch Arrow regex, no shuffle of rows), with each
    cell's share of its declared-lang row."""
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        text = t.column("text")
        has_am = pc.match_substring_regex(text, "[ሀ-፿]")
        has_en = pc.match_substring_regex(text, r"\b(the|and|of|a)\b")
        pred = pc.if_else(has_am, "am", pc.if_else(has_en, "en", "other"))
        d = pd.DataFrame({"lang": t.column("lang").to_pylist(), "pred_lang": pred.to_pylist()})
        g = d.groupby(["lang", "pred_lang"], as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            g.astype({"n": "int64"}), preserve_index=False
        ).replace_schema_metadata(None)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["lang", "pred_lang"], as_index=False)["n"]
        .sum()
    )
    row_tot = merged.groupby("lang")["n"].transform("sum")
    merged["row_share"] = round_away(
        merged["n"].to_numpy(dtype="float64") / row_tot.to_numpy(dtype="float64"), 6
    )
    return merged.rename(columns={"n": "n_docs"}).astype({"n_docs": "int64"})


def q204_shingle_df_histogram(sf_dir: str, k: int = 4) -> "pd.DataFrame":
    """Document-frequency histogram of k-token shingles — the direct
    design input for the exact-Jaccard join's skew story (a shingle in d
    docs emits d·(d−1)/2 pair rows; this table says where the df-cap must
    sit before that join is run at corpus scale — see
    dedup.jaccard_pairs_exact's docstring). Distinct (shingle, doc) rows
    ride ONE shingle-bucket two-phase to per-shingle df; dfs collapse to
    the (df, n_shingles) histogram in a second bounded exchange."""
    import pandas as pd

    from .common import bucketed_group_agg

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"sh": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())}
        )
        rows, sh = _shingle_frame(t, k)
        if not len(rows):
            return empty
        d = pd.DataFrame(
            {"sh": sh.to_numpy(), "doc_id": t.column("doc_id").to_numpy()[rows]}
        ).drop_duplicates()
        return pa.Table.from_pandas(d, preserve_index=False).replace_schema_metadata(None)

    def df_partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.drop_duplicates(["sh", "doc_id"]).groupby("sh", as_index=False).size()
        h = g.groupby("size", as_index=False).agg(n_shingles=("size", "size"))
        return h.rename(columns={"size": "df"}).astype({"df": "int64", "n_shingles": "int64"})

    merged = (
        bucketed_group_agg(
            ds.map_batches(partial, batch_format="pyarrow"), ["sh"], df_partial, n_buckets=16
        )
        .to_pandas()
        .groupby("df", as_index=False)["n_shingles"]
        .sum()
    )
    return merged.astype({"df": "int64", "n_shingles": "int64"})


def q205_conditional_entropy(sf_dir: str) -> "pd.DataFrame":
    """Information gain of weekday on the event-type mix: H(type),
    H(type|isodow) and their difference — 'does the calendar carry any
    information about what users do', the scale-free cousin of q111's
    chi-square. One 7×|types| bounded count exchange; every probability
    is a ratio of exact int64 counts and both oracle sides evaluate the
    SAME Σ p·ln(p) forms over the same handful of cells (order wobble far
    below the 6-decimal round)."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(df["ts"])
        d = pd.DataFrame(
            {
                "isodow": ts.dt.dayofweek.to_numpy(dtype="int64") + 1,
                "event_type": df["event_type"],
            }
        )
        return d.groupby(["isodow", "event_type"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    cells = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["isodow", "event_type"], as_index=False)["n"]
        .sum()
    )
    total = float(cells["n"].sum())
    pt = cells.groupby("event_type")["n"].sum().to_numpy(dtype="float64") / total
    h_type = float(-(pt * np.log(pt)).sum())
    h_cond = 0.0
    for _, g in cells.groupby("isodow"):
        nd = float(g["n"].sum())
        p = g["n"].to_numpy(dtype="float64") / nd
        h_cond += (nd / total) * float(-(p * np.log(p)).sum())
    return pd.DataFrame(
        {
            "h_type": [float(round_away(np.array([h_type]), 6)[0])],
            "h_type_given_dow": [float(round_away(np.array([h_cond]), 6)[0])],
            "info_gain": [float(round_away(np.array([h_type - h_cond]), 6)[0])],
        }
    )


def q206_ngram_coverage_curve(sf_dir: str, ks: tuple = (10, 100, 1000)) -> "pd.DataFrame":
    """Vocabulary-concentration curve: what share of the corpus's bigram
    occurrences the top-K bigrams cover, at K = 10/100/1000 — the
    'how template-y is this corpus' number that decides whether q139's
    boilerplate mining will pay off. Per-bigram counts ride q52's one
    bigram-bucket two-phase; each bucket pre-top-Ks under the total order
    (count desc, bigram asc), so the driver merges ≤ max(K)×buckets rows
    plus one exact total from schema-bounded partials. Shares are double
    ratios of exact int64 sums."""
    import numpy as np
    import pandas as pd

    from .common import bucketed_group_agg

    kmax = max(ks)
    partials = _bigram_partials(read_table(sf_dir, "documents", columns=["doc_id", "text"]))

    def final(d: "pd.DataFrame") -> "pd.DataFrame":
        g = d.groupby("bigram", as_index=False).agg(n=("n", "sum"))
        top = g.sort_values(["n", "bigram"], ascending=[False, True]).head(kmax)
        # one sentinel row per bucket carries the bucket's exact total
        # (the empty bigram cannot occur — empties are filtered upstream)
        return pd.concat(
            [top, pd.DataFrame({"bigram": [""], "n": [np.int64(g["n"].sum())]})],
            ignore_index=True,
        )

    cand = bucketed_group_agg(partials, ["bigram"], final, n_buckets=16).to_pandas()
    total = int(cand.loc[cand["bigram"] == "", "n"].sum())
    top = (
        cand.loc[cand["bigram"] != ""]
        .sort_values(["n", "bigram"], ascending=[False, True])
        .head(kmax)
    )
    cum = top["n"].cumsum().to_numpy(dtype="int64")
    rows = []
    for k in ks:
        covered = int(cum[min(k, len(top)) - 1]) if len(top) else 0
        rows.append(
            {
                "k": int(k),
                "covered": covered,
                "coverage": float(round_away(np.array([covered / total if total else 0.0]), 6)[0]),
            }
        )
    return pd.DataFrame(rows).astype({"k": "int64", "covered": "int64"})


def q208_heaps_exponent(sf_dir: str) -> "pd.DataFrame":
    """Heaps'-law exponent across sources: OLS slope of ln(types) on
    ln(tokens) over the per-source (n_tokens, n_types) points q190
    already reduces — β ≈ 0.4–0.6 is organic text, β → 0 is a closed
    template vocabulary. The regression runs on the sources-sized
    aggregate with the explicit (kΣxy − ΣxΣy)/(kΣx² − (Σx)²) form,
    identical on both oracle sides; ln arguments are exact int64
    counts."""
    import numpy as np
    import pandas as pd

    pts = q190_source_ttr(sf_dir)
    x = np.log(pts["n_tokens"].to_numpy(dtype="float64"))
    y = np.log(pts["n_types"].to_numpy(dtype="float64"))
    k = float(len(pts))
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    denom = k * sxx - sx * sx
    if k == 0.0 or denom == 0.0:
        # degenerate guard (r5, ADVICE): a single source (or all sources
        # with equal token counts) makes the OLS denominator exactly 0 —
        # DuckDB's double division by zero yields NULL, so emit NaN for
        # both coefficients rather than a numpy-warning inf/nan mix (an
        # empty corpus additionally has k == 0, where ln_k's /k is NULL)
        return pd.DataFrame(
            {
                "n_sources": pd.array([int(k)], dtype="int64"),
                "beta": [float("nan")],
                "ln_k": [float("nan")],
            }
        )
    slope = (k * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / k
    return pd.DataFrame(
        {
            "n_sources": pd.array([int(k)], dtype="int64"),
            "beta": [float(round_away(np.array([slope]), 6)[0])],
            "ln_k": [float(round_away(np.array([intercept]), 6)[0])],
        }
    )


def q213_token_length_hist(sf_dir: str) -> "pd.DataFrame":
    """Token-length histogram over the whole corpus — the tokenizer-health
    audit read alongside q203 fertility: a mass spike at length 1–2 means
    over-segmentation upstream, a heavy tail past ~30 chars means glued
    tokens/URLs that survived cleaning. Lengths are exact codepoint counts
    (pyarrow utf8_length == DuckDB length); per-batch bincount partials
    merge on the driver — the exchange is bounded by max token length, not
    the token stream, so no shuffle at all (tag_distribution's shape)."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.list_flatten(pc.split_pattern_regex(trimmed, pattern=r"\s+"))
        lens = pc.utf8_length(pc.drop_null(toks)).to_numpy(zero_copy_only=False)
        lens = lens[lens > 0]  # '' artifacts of leading/trailing whitespace
        counts = np.bincount(lens)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "length": pa.array(nz, pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("length", as_index=False)["n"]
        .sum()
    )
    return merged.astype({"length": "int64", "n": "int64"})


def q216_charclass_density(sf_dir: str) -> "pd.DataFrame":
    """Character-class composition per source — digit / sentence-punct /
    whitespace shares of all codepoints, the cheap boilerplate-and-OCR
    screen next to q13's per-doc quality score (a digit-heavy source is
    tables or SKU dumps, a punct-light one is unsegmented scrape). All
    counts are exact int64 per-batch class tallies (RE2 single-char
    classes == the oracle's length-minus-stripped arithmetic); the
    exchange is sources-sized, shares are double ratios of exact ints
    (NaN when a source has zero characters, matching SQL NULL-on-/0)."""
    import numpy as np
    import pandas as pd

    ds = read_table(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        txt = t.column("text")
        d = pd.DataFrame(
            {
                "source": t.column("source").to_pylist(),
                "p_chars": pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64),
                "p_digit": pc.count_substring_regex(txt, pattern="[0-9]")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "p_punct": pc.count_substring_regex(txt, pattern="[.,!?]")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "p_space": pc.count_substring_regex(txt, pattern=r"\s")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "p_one": np.ones(t.num_rows, dtype=np.int64),
            }
        )
        g = d.groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "source" not in parts.columns:
        return pd.DataFrame(
            {
                "source": pd.array([], dtype="object"),
                "n_docs": pd.array([], dtype="int64"),
                "n_chars": pd.array([], dtype="int64"),
                "digit_share": pd.array([], dtype="float64"),
                "punct_share": pd.array([], dtype="float64"),
                "space_share": pd.array([], dtype="float64"),
            }
        )
    g = parts.groupby("source", as_index=False).sum()
    chars = g["p_chars"].to_numpy(dtype="float64")
    with np.errstate(divide="ignore", invalid="ignore"):
        out = pd.DataFrame(
            {
                "source": g["source"],
                "n_docs": g["p_one"].astype("int64"),
                "n_chars": g["p_chars"].astype("int64"),
                "digit_share": round_away(
                    np.where(chars > 0, g["p_digit"].to_numpy(dtype="float64") / chars, np.nan), 6
                ),
                "punct_share": round_away(
                    np.where(chars > 0, g["p_punct"].to_numpy(dtype="float64") / chars, np.nan), 6
                ),
                "space_share": round_away(
                    np.where(chars > 0, g["p_space"].to_numpy(dtype="float64") / chars, np.nan), 6
                ),
            }
        )
    return out.sort_values("source").reset_index(drop=True)


def q218_stopword_ratio(sf_dir: str) -> "pd.DataFrame":
    """Stopword share per source — the Gopher-style function-word mass
    signal (organic prose keeps a stable stopword fraction; keyword-
    stuffed or template text does not). The stopword list is a CLOSED
    10-token vocabulary evaluated per batch with np.isin (exact string
    equality == the oracle's IN list); (source, n_tokens, n_stop) int64
    partials merge on the driver — sources-sized, no shuffle; the share
    is a double ratio of exact ints."""
    import numpy as np
    import pandas as pd

    STOP = np.array(
        ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"], dtype=object
    )
    ds = read_table(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        src = np.asarray(
            pc.take(t.column("source"), pc.list_parent_indices(toks)).to_pylist(), dtype=object
        )
        keep = flat != ""
        flat, src = flat[keep], src[keep]
        d = pd.DataFrame(
            {
                "source": src,
                "p_tok": np.ones(len(flat), dtype=np.int64),
                "p_stop": np.isin(flat, STOP).astype(np.int64),
            }
        )
        g = d.groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "source" not in parts.columns:
        return pd.DataFrame(
            {
                "source": pd.array([], dtype="object"),
                "n_tokens": pd.array([], dtype="int64"),
                "n_stop": pd.array([], dtype="int64"),
                "stop_share": pd.array([], dtype="float64"),
            }
        )
    g = parts.groupby("source", as_index=False).sum()
    return (
        pd.DataFrame(
            {
                "source": g["source"],
                "n_tokens": g["p_tok"].astype("int64"),
                "n_stop": g["p_stop"].astype("int64"),
                "stop_share": round_away(
                    g["p_stop"].to_numpy(dtype="float64") / g["p_tok"].to_numpy(dtype="float64"),
                    6,
                ),
            }
        )
        .sort_values("source")
        .reset_index(drop=True)
    )
