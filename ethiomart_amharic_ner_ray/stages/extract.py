"""Mention-extraction stage (deterministic regex path — defines the oracle).

State (compiled regex + gazetteer) is built once per WORKER PROCESS via the
lru-cached stateless-task wrappers (regex_extract_batch /
flat_extract_batch) — compiled patterns are too cheap to justify actor-pool
spin-up; the callable classes remain for callers that want explicit pools.
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


class FlatRegexExtractor:
    """Fused extract+flatten for the triples path: emits one slim row per
    mention — (conv_id, turn_idx, seller, ord, etype, norm) — without ever
    materializing the list<struct> mentions column. Cuts ~30% CPU vs
    RegexExtractor + a separate flatten stage and removes an operator
    boundary; use RegexExtractor when the mentions table itself is the
    product (API/checkpoint artifact, FIXTURES.md §2)."""

    def __init__(
        self,
        locations: tuple[str, ...] = DEFAULT_LOCATIONS,
        phone_lookaround: bool = True,
    ):
        self._loc_pattern = build_loc_pattern(locations)
        self._phone_lookaround = phone_lookaround

    def __call__(self, batch: pa.Table) -> pa.Table:
        convs: list[str] = []
        tidxs: list[int] = []
        sellers: list[str] = []
        ords: list[int] = []
        etypes: list[str] = []
        norms: list[str] = []
        for conv_id, turn_idx, seller, clean in zip(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column("seller").to_pylist(),
            batch.column("clean_text").to_pylist(),
        ):
            mentions = extract_mentions(clean, self._loc_pattern, self._phone_lookaround)
            for i, m in enumerate(mentions):
                if not m["norm"]:
                    continue
                convs.append(conv_id)
                tidxs.append(turn_idx)
                sellers.append(seller)
                ords.append(i)
                etypes.append(m["etype"])
                norms.append(m["norm"])
        return pa.table(
            {
                "conv_id": pa.array(convs, pa.string()),
                "turn_idx": pa.array(tidxs, pa.int32()),
                "seller": pa.array(sellers, pa.string()),
                "ord": pa.array(ords, pa.int32()),
                "etype": pa.array(etypes, pa.string()),
                "norm": pa.array(norms, pa.string()),
            }
        )


def explode_entities(batch: pa.Table) -> pa.Table:
    """M4/J1 parity (reference data_cleaner.py:92-98): project the mentions
    struct into top-level ``prices/phones/products/locations`` list columns
    plus ``has_*`` flags — the reference's pd.json_normalize explode, done
    as a same-batch column projection (no shuffle).

    Arrow-vectorized: flatten once, then per type filter + regroup by
    parent row via bincount offsets (flatten order is parent-ordered, so a
    filtered value stream re-lists with ListArray.from_arrays) — no Python
    row loop."""
    import numpy as np
    import pyarrow.compute as pc

    col = batch.column("mentions")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = batch.num_rows
    if n and (len(col) == 0 or col.null_count == len(col)):
        flat = None
        parents = np.array([], dtype=np.int64)
        etypes = np.array([], dtype=object)
    else:
        flat = pc.list_flatten(col)
        parents = pc.list_parent_indices(col).to_numpy()
        etypes = np.asarray(flat.field("etype").to_pylist(), dtype=object)

    out = batch
    spec = (
        ("prices", "has_price", "PRICE"),
        ("phones", "has_phone", "PHONE"),
        ("products", "has_product", "PRODUCT"),
        ("locations", None, "LOC"),
    )
    for name, flag, et in spec:
        if flat is None or len(etypes) == 0:
            counts = np.zeros(n, dtype=np.int64)
            vals = pa.array([], pa.string())
        else:
            mask = etypes == et
            vals = flat.field("norm").filter(pa.array(mask))
            counts = np.bincount(parents[mask], minlength=n)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
        out = out.append_column(name, arr)
        if flag is not None:
            out = out.append_column(flag, pa.array(counts > 0))
    return out


from functools import lru_cache


@lru_cache(maxsize=4)
def _cached_flat_extractor(locations: tuple[str, ...], phone_lookaround: bool) -> "FlatRegexExtractor":
    return FlatRegexExtractor(locations, phone_lookaround)


@lru_cache(maxsize=4)
def _cached_struct_extractor(locations: tuple[str, ...]) -> "RegexExtractor":
    return RegexExtractor(locations)


def regex_extract_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task wrapper for the struct-mentions RegexExtractor with
    the same per-worker-process state cache as flat_extract_batch — the
    compiled patterns are far too cheap to justify actor-pool spin-up."""
    return _cached_struct_extractor(DEFAULT_LOCATIONS)(batch)


def flat_extract_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task wrapper around FlatRegexExtractor with process-level
    state caching: regex/gazetteer compile once per WORKER PROCESS (workers
    are reused across tasks), while scheduling stays elastic tasks — which
    out-scales a fixed/autoscaling actor pool for state this cheap. Actor
    pools remain the right shape for expensive state (NerScorer)."""
    return _cached_flat_extractor(DEFAULT_LOCATIONS, True)(batch)


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
