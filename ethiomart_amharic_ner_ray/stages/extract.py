"""Mention-extraction stage (deterministic regex path — defines the oracle).

A callable class → actor pool: the location gazetteer pattern is compiled
once per actor in ``__init__`` (not per batch), per the stateful-stage rule.
Batches are Arrow in / Arrow out; the mentions column is built directly as a
``list<struct>`` array so spans survive (FIXTURES.md §2).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.extract import DEFAULT_LOCATIONS, build_loc_pattern, extract_mentions
from ..schemas import MENTION_TYPE


def derive_seller(batch: pa.Table) -> pa.Table:
    """seller = conv_id prefix before '-' (the channel analogue, FIXTURES §2).
    Vectorized Arrow regex replace; no Python loop."""
    seller = pc.replace_substring_regex(batch.column("conv_id"), "-.*$", "")
    return batch.append_column("seller", seller)


class RegexExtractor:
    """Adds ``mentions: list<struct>`` from ``clean_text``.

    Reference semantics: data_cleaner.py:70-79 price/phone/product regexes
    (phone via the v2 lookaround variant, data_pipeline.py:52-54) plus
    gazetteer LOC matching — the reference only finds locations via its NER
    model; the deterministic engine path uses a gazetteer (SURVEY.md §7.4a).
    """

    def __init__(
        self,
        locations: tuple[str, ...] = DEFAULT_LOCATIONS,
        phone_lookaround: bool = True,
    ):
        self._loc_pattern = build_loc_pattern(locations)
        self._phone_lookaround = phone_lookaround

    def __call__(self, batch: pa.Table) -> pa.Table:
        mentions = [
            extract_mentions(t, self._loc_pattern, self._phone_lookaround)
            for t in batch.column("clean_text").to_pylist()
        ]
        col = pa.array(mentions, pa.list_(MENTION_TYPE))
        return batch.append_column("mentions", col)
