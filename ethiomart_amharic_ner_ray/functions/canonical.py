"""Canonicalization: Ethiopic character folding + price/phone normalization.

The reference has no fold table (SURVEY.md §2.8 note) — its only Ethiopic
handling is the ``[ሀ-፿]`` preservation class and NFKC. The north star
requires homophone folding for entity canonicalization, so the fold table is
designed fresh from the public Unicode Ethiopic block layout (U+1200-U+137F,
8 codepoints per consonant row): the classic Amharic homophone series are
folded row-wise onto one representative row:

    ሐ-row (U+1210), ኀ-row (U+1280), ኈ-row labialized → ሀ-row (U+1200)
    ሠ-row (U+1220)                                  → ሰ-row (U+1230)
    ዐ-row (U+12D0)                                  → አ-row (U+12A0)
    ፀ-row (U+1340)                                  → ጸ-row (U+1338)

Price canonicalization implements the reference's string→float rule
(metrics_calculator.py:67-71: strip commas, float(), swallow failures) and
re-emits the standardized "<amount> ብር" form of data_cleaner.py:58.
"""

from __future__ import annotations

import re
import unicodedata


def _row_fold(src_base: int, dst_base: int, n: int = 8) -> dict[int, int]:
    return {src_base + i: dst_base + i for i in range(n)}


_FOLD_MAP: dict[int, int] = {}
_FOLD_MAP.update(_row_fold(0x1210, 0x1200))  # ሐ → ሀ
_FOLD_MAP.update(_row_fold(0x1280, 0x1200))  # ኀ → ሀ
_FOLD_MAP.update(_row_fold(0x1220, 0x1230))  # ሠ → ሰ
_FOLD_MAP.update(_row_fold(0x12D0, 0x12A0))  # ዐ → አ
_FOLD_MAP.update(_row_fold(0x1340, 0x1338))  # ፀ → ጸ
# labialized ኈ-row (U+1288-128F) folds to the ሀ-row a-form
_FOLD_MAP.update(_row_fold(0x1288, 0x1200))
# within-row order folds: 4th order (-a) ≡ 1st order (-ä) for the laryngeal
# series (ሃ→ሀ, ኣ→አ) — standard Amharic normalization practice
_FOLD_MAP[0x1203] = 0x1200  # ሃ → ሀ
_FOLD_MAP[0x12A3] = 0x12A0  # ኣ → አ
# resolve chains (e.g. ኃ → ሃ → ሀ) so one translate() pass suffices
for _k in list(_FOLD_MAP):
    _v = _FOLD_MAP[_k]
    while _v in _FOLD_MAP:
        _v = _FOLD_MAP[_v]
    _FOLD_MAP[_k] = _v

_WS_RE = re.compile(r"\s+")
_COMMA = re.compile(r",")


# every codepoint the fold map touches, as one C-speed scan: translate()
# with a large table costs a dict probe per char, so skipping texts with no
# foldable char is a measured win on mixed-script corpora (identity there)
_FOLDABLE_RE = re.compile("[" + "".join(chr(c) for c in sorted(_FOLD_MAP)) + "]")


def fold_ethiopic(text: str) -> str:
    """Fold Amharic homophone consonant rows to one canonical row."""
    if _FOLDABLE_RE.search(text) is None:
        return text
    return text.translate(_FOLD_MAP)


def canon_text(text: str) -> str:
    """Canonical key for entity surface forms: NFKC → fold → casefold →
    whitespace collapse. Deterministic; used as groupby cluster-merge key."""
    t = unicodedata.normalize("NFKC", text)
    t = fold_ethiopic(t)
    t = t.casefold()
    return _WS_RE.sub(" ", t).strip()


def parse_price(amount: str) -> float | None:
    """Reference metrics_calculator.py:67-71: strip commas, float, None on fail."""
    try:
        return float(_COMMA.sub("", amount))
    except (ValueError, AttributeError, TypeError):
        return None


def canon_price(amount: str) -> str | None:
    """Canonical price object: '<number> ብር' with integral floats collapsed."""
    v = parse_price(amount)
    if v is None:
        return None
    if v == int(v):
        return f"{int(v)} ብር"
    # .10g, not .g: %g keeps only 6 significant digits and would mangle
    # prices like 12345.67 → "12345.7"
    return f"{v:.10g} ብር"


def canon_phone(phone: str) -> str:
    """Normalize 9XXXXXXXX to the 09XXXXXXXX national form."""
    digits = phone.strip()
    if len(digits) == 9 and digits.startswith("9"):
        return "0" + digits
    return digits
