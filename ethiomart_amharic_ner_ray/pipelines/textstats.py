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

from .common import read_table


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
    min/max/count of the rolling hashes per doc (rows-only check)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        mins, maxs, counts = [], [], []
        for x in t.column("text").to_pylist():
            b = x.encode("utf-8")
            if len(b) < window:
                mins.append(0)
                maxs.append(0)
                counts.append(0)
                continue
            h = 0
            pw = pow(base, window - 1, mod)
            lo, hi, n = None, None, 0
            for i, ch in enumerate(b):
                h = (h * base + ch) % mod
                if i >= window:
                    h = (h - b[i - window] * pw * base) % mod
                if i >= window - 1:
                    n += 1
                    lo = h if lo is None or h < lo else lo
                    hi = h if hi is None or h > hi else hi
            mins.append(lo)
            maxs.append(hi)
            counts.append(n)
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
