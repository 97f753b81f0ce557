"""NER model-scorer stage — the central stateful actor pool (SURVEY.md §2.3 T2).

The reference loads an HF ``pipeline("ner")`` once per process and calls it
row-at-a-time (scorecard_engine.py:20-30, 54-57). Here the scorer is a
callable class for ``map_batches(NerScorer, concurrency=(min,max),
batch_size=B, num_cpus/num_gpus=...)``: model/tagger setup happens ONCE per
actor in ``__init__``; ``__call__`` runs a whole Arrow batch.

This container has no torch/transformers, so the default backend is a
deterministic rule-based tagger that exercises the full BIO path (tokenize →
tag → IOB2 repair per data_pipeline.py:101-136 → BIO decode → mentions).
``backend="transformers"`` is the real-model slot and raises
NotImplementedError here; the Ray-side plumbing (actor signature, batch
shape, output schema) is identical and is what the pipeline tests cover.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.canonical import canon_phone, canon_price, canon_text
from ..functions.extract import DEFAULT_LOCATIONS, build_loc_pattern, extract_mentions
from ..functions.iob import bio_decode, fix_entity_tags
from ..functions.textnorm import tokenize
from ..schemas import MENTION_TYPE


class NerScorer:
    """BIO token-classification scorer emitting the mentions schema.

    Output is schema-compatible with RegexExtractor so pipelines can swap
    extractor="regex" ↔ extractor="ner" without downstream changes.
    """

    def __init__(
        self,
        backend: str = "rules",
        model_path: str | None = None,
        locations: tuple[str, ...] = DEFAULT_LOCATIONS,
    ):
        self.backend = backend
        if backend == "transformers":
            try:
                import transformers  # noqa: F401
            except ImportError as e:  # pragma: no cover - no torch in container
                raise NotImplementedError(
                    "transformers backend requires torch/transformers; "
                    "this environment ships neither. Use backend='rules'."
                ) from e
            raise NotImplementedError(
                "real-model scoring is an offline concern (SURVEY.md §2.3 T1); "
                "wire a fine-tuned head here when available"
            )
        self._loc_pattern = build_loc_pattern(locations)

    # -- rule backend -------------------------------------------------------

    def _tag_sentence(self, clean_text: str) -> tuple[list[str], list[str]]:
        """Whitespace-tokenize and BIO-tag via the deterministic extractor:
        tokens covered by a mention span get B-/I- of its type."""
        tokens = tokenize(clean_text)
        tags = ["O"] * len(tokens)
        if not tokens:
            return tokens, tags
        # token char offsets (clean_text is whitespace-collapsed upstream,
        # but recompute real offsets to be safe)
        offsets = []
        pos = 0
        for tok in tokens:
            start = clean_text.index(tok, pos)
            offsets.append((start, start + len(tok)))
            pos = start + len(tok)
        spans = extract_mentions(clean_text, None)  # LOC handled separately below
        for m in spans:
            first = True
            for i, (s, e) in enumerate(offsets):
                if s < m["end"] and e > m["start"]:
                    tags[i] = ("B-" if first else "I-") + m["etype"]
                    first = False
        # LOC from gazetteer on folded tokens
        folded = [canon_text(t) for t in tokens]
        i = 0
        while i < len(tokens):
            matched = 0
            for ln in (3, 2, 1):
                if i + ln <= len(tokens):
                    cand = " ".join(folded[i : i + ln])
                    if self._loc_pattern.fullmatch(cand) and all(
                        t == "O" for t in tags[i : i + ln]
                    ):
                        tags[i] = "B-LOC"
                        for j in range(i + 1, i + ln):
                            tags[j] = "I-LOC"
                        matched = ln
                        break
            i += matched or 1
        return tokens, tags

    def _decode(self, tokens: list[str], tags: list[str]) -> list[dict]:
        from ..functions.textnorm import PRICE_RE_V1

        mentions = []
        for span in bio_decode(tokens, tags):
            etype, surface = span["etype"], span["surface"]
            if etype == "PRICE":
                # same amount-capture as the regex path (incl. its partial-
                # match quirk on ungrouped numbers) so extractor="ner" is
                # swap-compatible; an unanchored \d{1,3} search would
                # fabricate digit prefixes like "250" from "2500 ብር"
                m = PRICE_RE_V1.search(surface + " ብር")
                norm = canon_price(m.group(1)) if m else None
                if norm is None:
                    continue
            elif etype == "PHONE":
                norm = canon_phone(surface)
            elif etype == "PRODUCT":
                # head-phrase product key, matching functions/extract.py
                norm = canon_text(" ".join(surface.split()[:4]))
            else:
                norm = canon_text(surface)
            mentions.append(
                {
                    "etype": etype,
                    "surface": surface,
                    "norm": norm,
                    "start": span["tok_start"],  # token-space spans for BIO path
                    "end": span["tok_end"],
                    "entity_id": -1,
                }
            )
        return mentions

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_mentions = []
        for text in batch.column("clean_text").to_pylist():
            tokens, tags = self._tag_sentence(text)
            tags = fix_entity_tags(tokens, tags)
            all_mentions.append(self._decode(tokens, tags))
        col = pa.array(all_mentions, pa.list_(MENTION_TYPE))
        return batch.append_column("mentions", col)
