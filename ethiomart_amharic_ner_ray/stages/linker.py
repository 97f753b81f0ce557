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
    # per-batch distinct shrinks each block to the catalog size; the final
    # union is a driver-side set over those tiny blocks (no shuffle at all —
    # Ray's unique()/aggregate() reduce per-row in Python and is far slower)
    distinct = projected.map_batches(distinct_products, batch_format="pyarrow")
    names_set: set[str] = set()
    for b in distinct.iter_batches(batch_size=65536, batch_format="pyarrow"):
        names_set.update(b.column("norm").to_pylist())
    names = sorted(names_set)
    matrix = np.stack([_trigram_vector(n) for n in names]) if names else np.zeros((0, EMBED_DIM))
    return names, matrix


def build_product_index_flat(flat_ds) -> list[str]:
    """Distinct canonical PRODUCT names from a FLAT mention-rows dataset
    (columns etype, norm) — fully vectorized per batch via pyarrow.compute,
    tiny driver-side set union (no shuffle). Returns names ONLY: the cosine
    matrix is built lazily inside linker actors, and only if an
    out-of-index norm ever needs fuzzy ranking (when the index is built
    from the corpus itself, every norm is an exact hit and the matrix is
    never materialized)."""
    import pyarrow.compute as pc

    def distinct(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("etype"), "PRODUCT")
        return pa.table({"norm": pc.unique(batch.filter(mask).column("norm"))})

    # per-batch distinct runs distributed and shrinks each block to its
    # catalog subset; the driver unions only those tiny result blocks
    names_set: set[str] = set()
    for b in (
        flat_ds.select_columns(["etype", "norm"])
        .map_batches(distinct, batch_format="pyarrow", batch_size=65536)
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    ):
        names_set.update(b.column("norm").to_pylist())
    return sorted(names_set)


# per-worker lookup cache: the dict is built ONCE per worker process from
# the zero-copy Arrow broadcast (pc.index_in would rebuild its hash table
# for EVERY batch — O(batches × index), quadratic as the corpus grows)
_LINK_LOOKUP_CACHE: dict[str, dict] = {}


def flat_link_batch(batch: pa.Table, index_ref=None, min_cosine: float = 0.55) -> pa.Table:
    """Vectorized linking over flat mention rows.

    ``index_ref`` is a ray.put ``pyarrow.StringArray`` of the sorted
    canonical product names — Arrow buffers come out of the object store
    ZERO-COPY (no per-worker unpickling of half a million Python strings,
    which measured ~12 s/task the naive way). Each worker builds its
    name→id dict once and reuses it across batches. Only out-of-index
    product norms (possible when a fixed catalog index is supplied) fall
    back to per-row cosine ranking via FlatEntityLinker."""
    import pyarrow.compute as pc

    key = index_ref.hex() if hasattr(index_ref, "hex") else str(id(index_ref))
    cached = _LINK_LOOKUP_CACHE.get(key)
    if cached is None:
        names_arr: pa.Array = ray.get(index_ref)
        lookup = {n: i for i, n in enumerate(names_arr.to_pylist())}
        _LINK_LOOKUP_CACHE.clear()
        _LINK_LOOKUP_CACHE[key] = (names_arr, lookup)
        cached = (names_arr, lookup)
    names, lookup = cached

    etypes = batch.column("etype").to_pylist()
    norms = batch.column("norm").to_pylist()
    get = lookup.get
    idx = pa.array(
        [get(nm) if et == "PRODUCT" else None for et, nm in zip(etypes, norms)],
        pa.int32(),
    )
    is_product = pc.equal(batch.column("etype"), "PRODUCT")
    eid = pc.if_else(
        is_product,
        pc.fill_null(pc.cast(idx, pa.int32()), -1),
        pa.scalar(-1, pa.int32()),
    )
    out = batch.append_column("entity_id", eid)

    # fuzzy fallback for unlinked products (rare; never fires when the
    # index is corpus-derived)
    miss_mask = pc.and_(is_product, pc.is_null(idx))
    n_miss = pc.sum(pc.cast(miss_mask, pa.int64())).as_py() or 0
    if n_miss:
        linker = FlatEntityLinker(None, min_cosine, _names=names.to_pylist())
        norms = out.column("norm").to_pylist()
        eids = out.column("entity_id").to_pylist()
        miss = miss_mask.to_pylist()
        for i, m in enumerate(miss):
            if m:
                hit = linker._link_fuzzy(norms[i])
                if hit >= 0:
                    eids[i] = hit
                    norms[i] = linker._names[hit]
        out = out.set_column(out.schema.get_field_index("norm"), "norm", pa.array(norms, pa.string()))
        out = out.set_column(out.schema.get_field_index("entity_id"), "entity_id", pa.array(eids, pa.int32()))
    return out


class FlatEntityLinker:
    """Linker over FLAT mention rows: adds ``entity_id`` (int32, -1 for
    non-product mentions) and rewrites ``norm`` to the linked cluster
    representative. Exact hits are one dict lookup per row; only
    out-of-index norms pay the cosine ranking. Same broadcast-index pattern
    as EntityLinker, an order of magnitude cheaper than rebuilding
    list<struct> columns."""

    def __init__(self, index_ref, min_cosine: float = 0.55, _names: list[str] | None = None):
        names = _names if _names is not None else ray.get(index_ref)
        if isinstance(names, pa.Array):
            names = names.to_pylist()
        self._names: list[str] = names
        self._matrix: np.ndarray | None = None  # built on first fuzzy lookup
        self._exact: dict[str, int] = {n: i for i, n in enumerate(names)}
        self._min_cosine = min_cosine

    def _link_fuzzy(self, norm: str) -> int:
        if len(self._names) == 0:
            return -1
        if self._matrix is None:
            self._matrix = np.stack([_trigram_vector(n) for n in self._names])
        v = _trigram_vector(norm)
        scores = self._matrix @ v
        best = int(np.argmax(scores))
        return best if scores[best] >= self._min_cosine else -1

    def __call__(self, batch: pa.Table) -> pa.Table:
        etypes = batch.column("etype").to_pylist()
        norms = batch.column("norm").to_pylist()
        exact = self._exact
        ids = np.full(len(norms), -1, dtype=np.int32)
        new_norms = norms
        changed = False
        for i, (et, nm) in enumerate(zip(etypes, norms)):
            if et != "PRODUCT":
                continue
            hit = exact.get(nm)
            if hit is None:
                hit = self._link_fuzzy(nm)
                if hit >= 0:
                    if not changed:
                        new_norms = list(norms)
                        changed = True
                    new_norms[i] = self._names[hit]
            if hit is not None and hit >= 0:
                ids[i] = hit
        out = batch.append_column("entity_id", pa.array(ids, pa.int32()))
        if changed:
            idx = out.schema.get_field_index("norm")
            out = out.set_column(idx, "norm", pa.array(new_norms, pa.string()))
        return out


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
