"""Regex mention extraction with character spans.

Reproduces the reference extractor semantics (data_cleaner.py:70-79 — the
deterministic extractor that defines oracle triples, SURVEY.md §2.2 M3) but
emits mentions as (etype, surface, norm, start, end) structs so span offsets
survive into the mentions table (FIXTURES.md §2), instead of the reference's
parallel flat lists.

LOC extraction: the reference has no location regex (locations only exist in
its NER labels), so the deterministic path uses a gazetteer of location
surface forms matched longest-first on fold-canonicalized text. The gazetteer
is broadcast once per actor (stages/extract.py).
"""

from __future__ import annotations

import re

from .canonical import canon_phone, canon_price, canon_text, fold_ethiopic
from .textnorm import PHONE_RE_V1, PHONE_RE_V2, PRICE_RE_V1, PRODUCT_RE_V1

# Default location gazetteer: Addis Ababa commercial districts seen in the
# reference corpus templates (FIXTURES.md §1) plus common variants.
DEFAULT_LOCATIONS = (
    "መገናኛ",
    "ቦሌ",
    "ፒያሳ",
    "መርካቶ",
    "ሜክሲኮ",
    "ካዛንቺስ",
    "ጀሞ",
    "ሰሚት",
    "አዲስ አበባ",
    "ቦሌ አዲስ አበባ",
    "መከለር",
    "ለቡ",
    "ገርጂ",
    "ሳሪስ",
    "ኮልፌ",
)


def build_loc_pattern(locations: tuple[str, ...] = DEFAULT_LOCATIONS) -> re.Pattern:
    """Alternation over fold-transformed gazetteer entries, longest first so
    'ቦሌ አዲስ አበባ' wins over 'ቦሌ'. Compiled once per actor.

    Matching runs over ``fold_ethiopic(clean_text)`` — a strictly 1:1
    codepoint transform — so match offsets are valid char spans in
    clean_text itself (length-changing transforms like NFKC/casefold would
    shift every span after them)."""
    from .canonical import fold_ethiopic

    alts = sorted({fold_ethiopic(l) for l in locations}, key=len, reverse=True)
    return re.compile("|".join(re.escape(a) for a in alts))


def extract_entities_v1(clean_text: str) -> dict:
    """Exact reference extract_entities (data_cleaner.py:70-79): flat lists,
    empty dict for empty text. Used by golden tests and the oracle."""
    if not clean_text:
        return {}
    return {
        "prices": [m[0] for m in PRICE_RE_V1.findall(clean_text)],
        "phones": PHONE_RE_V1.findall(clean_text),
        "products": [m[1].strip() for m in PRODUCT_RE_V1.findall(clean_text)],
    }


def extract_mentions(
    clean_text: str,
    loc_pattern: re.Pattern | None = None,
    phone_lookaround: bool = True,
) -> list[dict]:
    """Span-preserving mention extraction over cleaned text.

    Returns mention dicts ordered by (start, etype); entity_id is -1 until
    the linking stage fills it. Phone uses the v2 lookaround pattern by
    default (data_pipeline.py:52-54) so digits embedded in longer numbers
    don't match.
    """
    if not clean_text:
        return []
    mentions: list[dict] = []

    for m in PRICE_RE_V1.finditer(clean_text):
        norm = canon_price(m.group(1))
        if norm is None:
            continue
        mentions.append(
            {
                "etype": "PRICE",
                "surface": m.group(0),
                "norm": norm,
                "start": m.start(1),
                "end": m.end(2),
                "entity_id": -1,
            }
        )

    phone_re = PHONE_RE_V2 if phone_lookaround else PHONE_RE_V1
    for m in phone_re.finditer(clean_text):
        mentions.append(
            {
                "etype": "PHONE",
                "surface": m.group(1),
                "norm": canon_phone(m.group(1)),
                "start": m.start(1),
                "end": m.end(1),
                "entity_id": -1,
            }
        )

    for m in PRODUCT_RE_V1.finditer(clean_text):
        raw = m.group(2)
        # products capture runs to end of line; cut at the first price/phone
        # mention so the product surface is just the noun phrase
        cut = len(raw)
        pm = PRICE_RE_V1.search(raw)
        if pm:
            cut = min(cut, pm.start())
        hm = PHONE_RE_V2.search(raw)
        if hm:
            cut = min(cut, hm.start())
        seg = raw[:cut]
        lead = len(seg) - len(seg.lstrip(" ,.!?"))  # keep spans aligned
        surface = seg.strip(" ,.!?")
        if not surface:
            continue
        start = m.start(2) + lead
        # canonical product key = head phrase (first 4 tokens): the product
        # regex captures to end-of-line, so unbounded norms would make the
        # entity "catalog" grow linearly with the corpus — a head-phrase key
        # keeps it catalog-shaped (and the oracle shares this function)
        mentions.append(
            {
                "etype": "PRODUCT",
                "surface": surface,
                "norm": canon_text(" ".join(surface.split()[:4])),
                "start": start,
                "end": start + len(surface),
                "entity_id": -1,
            }
        )

    if loc_pattern is not None:
        folded = fold_ethiopic(clean_text)  # 1:1 chars → spans index clean_text
        for m in loc_pattern.finditer(folded):
            surface = clean_text[m.start() : m.end()]
            mentions.append(
                {
                    "etype": "LOC",
                    "surface": surface,
                    "norm": canon_text(surface),
                    "start": m.start(),
                    "end": m.end(),
                    "entity_id": -1,
                }
            )

    mentions.sort(key=lambda d: (d["start"], d["etype"]))
    return mentions
