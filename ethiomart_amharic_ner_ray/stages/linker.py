"""Entity-linking stage: broadcast candidate index + cosine ranking.

Pattern (SURVEY.md §2.4 J-new / §7.5): the candidate index — distinct
canonical PRODUCT names from a first pass, assumed catalog-sized (small
relative to the corpus) — is built once, ``ray.put`` once on the driver, and
read in each linker actor's ``__init__``. No shuffle join: linking is a
broadcast-small-side lookup inside ``map_batches``.

Vectors are hashed char-trigram embeddings (deterministic, no model):
candidate generation = exact dict hit, else cosine argmax over the index
matrix with the lowest entity_id winning ties.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..schemas import MENTION_TYPE

EMBED_DIM = 256


def _trigram_vector(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic hashed char-trigram embedding, L2-normalized."""
    v = np.zeros(dim, dtype=np.float64)
    padded = f"^{text}$"
    for i in range(len(padded) - 2):
        tri = padded[i : i + 3]
        # FNV-1a, stable across processes (unlike builtin hash())
        h = 2166136261
        for ch in tri.encode("utf-8"):
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        v[h % dim] += 1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def build_product_index(mentions_ds) -> tuple[list[str], np.ndarray]:
    """First pass over the mentions Dataset: distinct canonical PRODUCT names.

    Per-batch set-dedup inside map_batches FIRST (the partial/combiner
    pattern), so the ``unique()`` shuffle only moves already-distinct names
    per block — not one row per mention.
    """

    def distinct_products(batch: pa.Table) -> pa.Table:
        names: set[str] = set()
        for ml in batch.column("mentions").to_pylist():
            for m in ml:
                if m["etype"] == "PRODUCT" and m["norm"]:
                    names.add(m["norm"])
        return pa.table({"norm": pa.array(sorted(names), pa.string())})

    projected = mentions_ds.select_columns(["mentions"])  # prune before the pass
    names = sorted(projected.map_batches(distinct_products, batch_format="pyarrow").unique("norm"))
    matrix = np.stack([_trigram_vector(n) for n in names]) if names else np.zeros((0, EMBED_DIM))
    return names, matrix


class EntityLinker:
    """Fills ``entity_id`` on PRODUCT mentions (and canonicalizes norm to the
    linked cluster representative); other types keep entity_id = -1.

    ``index_ref`` is a ``ray.ObjectRef`` to (names, matrix) — fetched once
    per actor, shared zero-copy via the object store across the pool.
    """

    def __init__(self, index_ref, min_cosine: float = 0.55):
        names, matrix = ray.get(index_ref)
        self._names: list[str] = names
        self._matrix: np.ndarray = matrix
        self._exact: dict[str, int] = {n: i for i, n in enumerate(names)}
        self._min_cosine = min_cosine

    def _link_one(self, norm: str) -> int:
        hit = self._exact.get(norm)
        if hit is not None:
            return hit
        if len(self._names) == 0:
            return -1
        v = _trigram_vector(norm)
        scores = self._matrix @ v
        best = int(np.argmax(scores))  # argmax returns lowest index on ties
        return best if scores[best] >= self._min_cosine else -1

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for ml in batch.column("mentions").to_pylist():
            linked = []
            for m in ml:
                if m["etype"] == "PRODUCT":
                    eid = self._link_one(m["norm"])
                    m = dict(m, entity_id=eid)
                    if eid >= 0:
                        m["norm"] = self._names[eid]
                linked.append(m)
            out.append(linked)
        col = pa.array(out, pa.list_(MENTION_TYPE))
        idx = batch.schema.get_field_index("mentions")
        return batch.set_column(idx, "mentions", col)
