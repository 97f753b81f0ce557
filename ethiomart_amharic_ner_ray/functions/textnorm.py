"""Text normalization, reproducing the reference's two normalizer variants.

Variant semantics (SURVEY.md §2.2 M1/M2 — the ordering difference between
them is load-bearing and covered by golden tests):

* ``clean_text_v1`` — reference ``data_cleaner.py:52-68``:
  empty/'[no text]' sentinel → ""; price regex (unit REQUIRED) substituted to
  "<amount> ብር" FIRST; then URL strip; then special chars stripped TO EMPTY;
  whitespace collapsed.

* ``normalize_text_v2`` — reference ``data_pipeline.py:83-99``:
  emoji → "[EMOJI]"; NFKC; special chars stripped TO SPACE; THEN price regex
  (unit OPTIONAL — any standalone 1-3,3,3-grouped number gets " ብር"
  appended) substituted; whitespace collapsed.

All regexes are module-level compiled once per process (and once per actor
via stage __init__), never per row.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

# --- compiled patterns (reference data_cleaner.py:30-33, data_pipeline.py:46-61)

AMHARIC_RE = re.compile(r"[ሀ-፿]+")

# v1 price: unit required (data_cleaner.py:31)
PRICE_RE_V1 = re.compile(
    r"(\d{1,3}(?:,\d{3})*(?:\.\d+)?)\s*(ብር|birr|br|ዶላር|dollar)", re.I
)
# v2 price: unit optional, anchored at start/space (data_pipeline.py:48-51)
PRICE_RE_V2 = re.compile(
    r"(?:^|\s)(\d{1,3}(?:,\d{3})*(?:\.\d+)?)\s*(ብር|br|birr|ዶላር|dollar)?\b", re.I
)
# v1 phone (data_cleaner.py:32); v2 adds digit lookarounds (data_pipeline.py:52-54)
PHONE_RE_V1 = re.compile(r"(09\d{8}|9\d{8})")
PHONE_RE_V2 = re.compile(r"(?<!\d)(09\d{8}|9\d{8})(?!\d)")
# product trigger words (data_cleaner.py:33)
PRODUCT_RE_V1 = re.compile(
    r"(ሽያጭ|ለመግዛት|ይግዙ|ይሸጥ|ለሽያጭ|ገዝተውልኝ)\s*([^\n]+)", re.I
)
# v2 trigger variant (data_pipeline.py:55-58): no digits in capture, lazy up to
# double-space or end
PRODUCT_RE_V2 = re.compile(
    r"(?:^|\s)(ሽያጭ|ለመግዛት|ይግዙ|ይሸጥ|ለሽያጭ|ገዝተውልኙ)\s*([^\n\d]+?)(?=\s{2}|$)", re.I
)
# SKU-looking token (data_pipeline.py:59-61)
SKU_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9/-]{2,}$")

URL_RE = re.compile(r"https?://\S+|www\.\S+")
# keep word chars, whitespace, Ethiopic block, basic punctuation
NONWORD_RE = re.compile(r"[^\w\sሀ-፿.,!?]")

# Deterministic stand-in for the `emoji` package (not in this container).
# Covers the emoji/symbol planes the reference corpus uses; the synthetic
# generator draws emoji from these same ranges so engine and oracle agree.
EMOJI_RE = re.compile(
    "["
    "\U0001f000-\U0001faff"  # emoji, symbols, supplemental
    "☀-➿"  # misc symbols, dingbats
    "⬀-⯿"  # arrows/symbols
    "️‍"  # variation selector, ZWJ
    "]+"
)

NO_TEXT_SENTINEL = "[no text]"


def clean_text_v1(text: str | None) -> str:
    """Reference clean_text (data_cleaner.py:52-68), exact order of operations."""
    if text is None or text != text or text == NO_TEXT_SENTINEL:  # NaN-safe
        return ""
    text = PRICE_RE_V1.sub(r"\1 ብር", text)
    text = URL_RE.sub("", text)
    text = NONWORD_RE.sub("", text)
    return " ".join(text.split()).strip()


def normalize_text_v2(text: str | None) -> str:
    """Reference _normalize_text (data_pipeline.py:83-99), exact order."""
    if not text or not isinstance(text, str):
        return ""
    text = EMOJI_RE.sub("[EMOJI]", text)
    text = unicodedata.normalize("NFKC", text)
    text = NONWORD_RE.sub(" ", text)
    text = PRICE_RE_V2.sub(r" \1 ብር ", text)
    return " ".join(text.split()).strip()


def sha256_text(text: str) -> str:
    """Content hash (reference telegram_scraper.py:151-155) — dedup/partition key."""
    return hashlib.sha256((text or "").encode("utf-8", errors="replace")).hexdigest()


def tokenize(text: str) -> list[str]:
    """Whitespace tokenizer (reference conll_annotator.py:42-44)."""
    return text.split()
