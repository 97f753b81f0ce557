"""Normalization stage: adds ``clean_text`` without ever mutating ``text``.

Stateless ``map_batches`` function (regexes are module-level compiled, so a
plain function — cheap elastic tasks — beats an actor pool here). The
original ``text`` column passes through untouched: the north rule's per-turn
text-equality invariant is enforced structurally, not by convention.

Reference semantics: data_cleaner.py:52-68 (v1) / data_pipeline.py:83-99 (v2).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

from ..functions.textnorm import clean_text_v1, normalize_text_v2


def make_normalizer(version: int = 1) -> Callable[[pa.Table], pa.Table]:
    """Return a batch fn adding clean_text using normalizer v1 or v2.

    Both variants must exist (SURVEY.md §2.2 M1/M2): their substitution
    ordering differs observably and they feed different downstream stages.
    """
    fn = clean_text_v1 if version == 1 else normalize_text_v2

    def normalize_batch(batch: pa.Table) -> pa.Table:
        clean = pa.array(
            [fn(t) for t in batch.column("text").to_pylist()], pa.string()
        )
        return batch.append_column("clean_text", clean)

    return normalize_batch
