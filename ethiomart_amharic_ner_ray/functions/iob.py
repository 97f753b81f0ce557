"""IOB2 tag repair / validation / cleaning / decode.

Faithful re-implementations of the reference rules (SURVEY.md §2.2 M6-M8):

* ``fix_entity_tags`` — data_pipeline.py:101-136, including the quirky
  ``i += 2`` stride in Rule 1 (a PRICE token's unit-absorption check skips
  the following token entirely afterwards). Rule 3 (orphan I- promotion) is
  load-bearing: the reference corpus has zero B-PRICE tags before repair.
* ``validate_sentence`` — data_pipeline.py:169-188 (stricter than standard
  IOB2: also rejects B- immediately after I-).
* ``clean_tags`` — train_ner.py:97-113 (unknown tag → "O").
* ``bio_decode`` — groups contiguous B-/I- runs into typed token spans
  (the engine-side inverse of subword alignment, SURVEY.md §2.2 M10).
"""

from __future__ import annotations

from .textnorm import SKU_RE

PRICE_UNITS = ("ብር", "birr", "br")


def fix_entity_tags(tokens: list[str], tags: list[str]) -> list[str]:
    """Apply the reference's three repair rules, in order."""
    new_tags = list(tags)

    # Rule 1: absorb a following O-tagged price unit into the PRICE entity.
    i = 0
    while i < len(tokens):
        if new_tags[i].startswith(("B-PRICE", "I-PRICE")):
            if (
                i + 1 < len(tokens)
                and tokens[i + 1] in PRICE_UNITS
                and new_tags[i + 1] == "O"
            ):
                new_tags[i + 1] = "I-PRICE"
            i += 2  # reference stride quirk: skips the token after any PRICE
        else:
            i += 1

    # Rule 2: SKU-looking PRODUCT tokens are demoted to O.
    for i, token in enumerate(tokens):
        if new_tags[i].startswith(("B-PRODUCT", "I-PRODUCT")) and SKU_RE.match(token):
            new_tags[i] = "O"

    # Rule 3: strict IOB2 — orphan I-X becomes B-X.
    current_entity = None
    for i, tag in enumerate(new_tags):
        if tag.startswith("B-"):
            current_entity = tag[2:]
        elif tag.startswith("I-"):
            if current_entity != tag[2:]:
                new_tags[i] = f"B-{tag[2:]}"
                current_entity = tag[2:]
        else:
            current_entity = None

    return new_tags


def validate_sentence(tokens: list[str], tags: list[str]) -> bool:
    """Reference validator: length match, no orphan I-, no B- right after I-."""
    if len(tokens) != len(tags):
        return False
    prev_tag: str | None = None
    for tag in tags:
        if tag.startswith("I-"):
            if not prev_tag or len(prev_tag) < 2 or prev_tag[2:] != tag[2:]:
                return False
        elif tag.startswith("B-"):
            if prev_tag and prev_tag.startswith("I-"):
                return False
        prev_tag = tag
    return True


def clean_tags(tags: list[str], label_set: frozenset[str] | set[str]) -> list[str]:
    """Reference tag-vocabulary cleaner: anything outside label_set → 'O'."""
    return [t if t in label_set else "O" for t in tags]


def bio_decode(tokens: list[str], tags: list[str]) -> list[dict]:
    """Decode BIO tags into typed spans: [{etype, tok_start, tok_end, surface}].

    tok_end is exclusive. A B- opens a span; I- of the same type extends it;
    anything else closes it. Input is assumed repaired (fix_entity_tags).
    """
    spans: list[dict] = []
    cur_type: str | None = None
    cur_start = 0
    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            if cur_type is not None:
                spans.append(
                    {
                        "etype": cur_type,
                        "tok_start": cur_start,
                        "tok_end": i,
                        "surface": " ".join(tokens[cur_start:i]),
                    }
                )
            cur_type = tag[2:]
            cur_start = i
        elif tag.startswith("I-") and cur_type == tag[2:]:
            continue
        else:
            if cur_type is not None:
                spans.append(
                    {
                        "etype": cur_type,
                        "tok_start": cur_start,
                        "tok_end": i,
                        "surface": " ".join(tokens[cur_start:i]),
                    }
                )
            cur_type = None
    if cur_type is not None:
        spans.append(
            {
                "etype": cur_type,
                "tok_start": cur_start,
                "tok_end": len(tags),
                "surface": " ".join(tokens[cur_start:]),
            }
        )
    return spans
