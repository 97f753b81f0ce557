"""Canonical Arrow schemas for every table the engine produces or consumes.

The transcript schema is exactly BASELINE.json's ``input_hint``; the mention
and triple schemas follow FIXTURES.md §2-3. Declaring schemas explicitly (the
reference has none — everything is pandas-inferred, see SURVEY.md §1.3) lets
every map_batches stage build Arrow arrays directly and keeps blocks
zero-copy in the object store.
"""

from __future__ import annotations

import pyarrow as pa

# Input: one row per conversation turn (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# One mention: entity type (un-prefixed, per SURVEY.md §2.11 — the reference's
# metrics_calculator.py:67-72 bug of matching 'B-PRICE' against un-prefixed HF
# group names is NOT replicated), surface form, canonical form, char span in
# clean_text, and the linked entity id (-1 = unlinked).
MENTION_TYPE = pa.struct(
    [
        pa.field("etype", pa.string()),
        pa.field("surface", pa.string()),
        pa.field("norm", pa.string()),
        pa.field("start", pa.int32()),
        pa.field("end", pa.int32()),
        pa.field("entity_id", pa.int32()),
    ]
)

MENTIONS_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("seller", pa.string()),
        pa.field("text", pa.string()),  # original text, never mutated
        pa.field("clean_text", pa.string()),
        pa.field("mentions", pa.list_(MENTION_TYPE)),
    ]
)

PROVENANCE_TYPE = pa.struct(
    [
        pa.field("extractor", pa.string()),
        pa.field("confidence", pa.float32()),
    ]
)

TRIPLE_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("provenance", PROVENANCE_TYPE),
    ]
)

PREDICATES = ("sells", "priced_at", "located_in", "reachable_at")
ENTITY_TYPES = ("PRODUCT", "PRICE", "LOC", "PHONE")

# Canonical 9-tag BIO label set (SURVEY.md §2.11: the reference's train_ner.py
# drops I-LOC from its 8-label schema; we use the full consistent set).
BIO_LABELS = (
    "O",
    "B-PRODUCT",
    "I-PRODUCT",
    "B-PRICE",
    "I-PRICE",
    "B-LOC",
    "I-LOC",
    "B-PHONE",
    "I-PHONE",
)


def validate_transcripts_schema(schema) -> None:
    """Fail fast with a complete, named report when an input table doesn't
    match the transcript contract (BASELINE.json input_hint) — instead of a
    KeyError deep inside some stage. Accepts a pyarrow.Schema or a Ray
    Dataset schema wrapper; timestamp unit/tz variants are tolerated."""
    names = list(getattr(schema, "names", []) or [])
    types = {}
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        schema = base
    if isinstance(schema, pa.Schema):
        names = schema.names
        types = {f.name: f.type for f in schema}
    else:  # Ray Schema wrapper with parallel names/types
        types = dict(zip(names, getattr(schema, "types", [])))

    problems: list[str] = []
    for field in TRANSCRIPT_SCHEMA:
        if field.name not in names:
            problems.append(f"missing column '{field.name}' ({field.type})")
            continue
        actual = types.get(field.name)
        if not isinstance(actual, pa.DataType):
            continue  # pandas-inferred; let it through
        ok = (
            actual == field.type
            or (pa.types.is_timestamp(field.type) and pa.types.is_timestamp(actual))
            or (pa.types.is_integer(field.type) and pa.types.is_integer(actual))
            or (pa.types.is_string(field.type) and (pa.types.is_string(actual) or pa.types.is_large_string(actual)))
        )
        if not ok:
            problems.append(f"column '{field.name}' has type {actual}, expected {field.type}")
    if problems:
        raise ValueError(
            "input does not match the transcript schema "
            f"(conv_id:string, turn_idx:int32, role:string, text:string, "
            f"tool:string, ts:timestamp): " + "; ".join(problems)
        )
