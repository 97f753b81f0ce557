"""Incremental KG update: fold a delta of new transcript turns into a
completed ``run_kg_pipeline`` checkpoint WITHOUT re-extracting the base
corpus (SURVEY.md §2.10 checkpoint/lineage; reference parity: the scraper's
append-only message flow in telegram_scrapper.py re-runs the whole pandas
pipeline per refresh — at 10^12-turn scale an append must cost O(delta), not
O(corpus)).

Why conv-bucket granularity: triple emission is a per-conversation
carry-last-product scan (kg.py `_emit_triples_bucket`), so a late-arriving
turn can change triples of OTHER turns in the same conversation — the
smallest safe recompute unit is the conv-hash bucket, which is exactly the
unit the mentions checkpoint is partitioned by. Entity linking only appends
`entity_id` (never rewrites `norm`) and `triples_from_flat` drops it, so the
corpus-derived link index does NOT leak cross-bucket state into triples.

The update maintains a third per-bucket checkpoint, ``candidates/`` — the
pre-dedup candidate triples of each conv bucket, partially deduped to the
min-provenance row per (subj, pred, obj) within the bucket (a valid combiner
for the global keep-first dedup). With it, an update costs:

  extract(delta turns)                         — the only expensive stage
  + re-emit candidates for TOUCHED conv buckets — numpy scan over those
                                                  buckets' mention rows only
  + re-dedup TOUCHED spo buckets                — a FILTERED read of the
                                                  candidate store on its
                                                  stored ``sbucket`` stamp
                                                  (files are sbucket-sorted,
                                                  so row-group stats prune
                                                  untouched buckets at the
                                                  parquet footer) + one
                                                  shuffle over the surviving
                                                  rows

Untouched conv buckets' candidates are byte-identical by construction. The
rewritten spo set is computed as a per-spo-bucket multiset DIFF between the
touched conv buckets' old and new candidates — a conv bucket holds many
unchanged conversations, and their identical candidate rows must not drag
every spo bucket they feed into the rewrite; only buckets whose candidate
multiset actually changed can have a different dedup output. (The diff
catches retractions too: an inserted PRODUCT mention re-subjects later PRICE
rows, removing old triples as well as adding new ones.)

Crash safety follows the manifest invariant (state/manifest.py): all three
stages' manifests are dropped BEFORE any data mutation and rewritten (under
the new fingerprint) only after their data is committed — a crash mid-update
leaves no manifest vouching for mixed state, and the next full run rebuilds.
Equality with a from-scratch rebuild over base+delta is pinned by
tests/test_incremental.py, including a late-arriving turn that rewrites an
existing conversation's triples.
"""

from __future__ import annotations

import glob as _glob
import hashlib as _hashlib
import json as _json
import os as _os
import shutil as _shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as _pq
import ray
import ray.data

from ..state.manifest import (
    drop_manifests,
    manifest_rows,
    validated_done_buckets,
    write_bucket_manifests,
)
from .kg import (
    _bucket_dedup,
    _emit_triples_bucket,
    _hash_bucket,
    _partial_dedup,
    add_conv_bucket,
    add_provenance,
)

TRIPLE_COLS = ["subj", "pred", "obj", "conv_id", "turn_idx", "extractor", "confidence"]

# row-group size of the candidates store: small enough that a touched-spo
# filtered read prunes most of a production-sized bucket file at the footer,
# large enough that the footer/stats overhead stays negligible
CAND_ROW_GROUP = 8192


def _sig(path: str) -> str:
    """Content signature of a parquet dir/file (name+size+mtime), mirroring
    run_kg_pipeline's `_input_signature`: remote URIs resolve through
    pyarrow.fs, and a scheme that can't be content-signed REFUSES rather
    than silently degrading the idempotency guard to path-only."""
    h = _hashlib.blake2b(digest_size=8)
    if "://" in path:
        try:
            from pyarrow import fs as _pafs

            fsys, rel = _pafs.FileSystem.from_uri(path)
            info = fsys.get_file_info(rel)
            if info.type == _pafs.FileType.Directory:
                infos = [
                    i
                    for i in fsys.get_file_info(_pafs.FileSelector(rel, recursive=True))
                    if i.path.endswith(".parquet")
                ]
                infos.sort(key=lambda i: i.path)
            elif info.type == _pafs.FileType.File:
                infos = [info]
            else:
                raise FileNotFoundError(f"{path}: {info.type}")
            for i in infos:
                h.update(i.base_name.encode())
                h.update(str(i.size).encode())
                if i.mtime_ns is not None:
                    h.update(str(i.mtime_ns).encode())
        except Exception as exc:
            raise ValueError(
                f"cannot content-sign delta {path!r} for the idempotent-"
                f"re-apply guard ({exc}); updates require a filesystem "
                f"pyarrow.fs can stat"
            ) from exc
        return h.hexdigest()
    p = Path(path)
    files = sorted(p.rglob("*.parquet")) if p.is_dir() else [p]
    for f in files:
        st = f.stat()
        h.update(f.name.encode())
        h.update(str(st.st_size).encode())
        h.update(str(st.st_mtime_ns).encode())
    return h.hexdigest()


def _parse_fp_params(fp: str) -> dict:
    """Parse the trailing |b..|n..|x..|l.. params off a run fingerprint."""
    out: dict = {}
    for part in fp.split("|"):
        if len(part) >= 2 and part[0] in "bnxl" and part not in ("link",):
            key, val = part[0], part[1:]
            if key == "b" and val.isdigit():
                out["n_buckets"] = int(val)
            elif key == "n" and val.isdigit():
                out["normalizer"] = int(val)
            elif key == "x":
                out["extractor"] = val
            elif key == "l":
                out["link"] = val == "True"
    return out


def _bucket_files(stage_dir: str, prefix: str, buckets=None) -> list[str]:
    files: list[str] = []
    for d in sorted(_glob.glob(_os.path.join(stage_dir, f"{prefix}=*"))):
        b = int(_os.path.basename(d).split("=")[1])
        if buckets is not None and b not in buckets:
            continue
        files.extend(sorted(_glob.glob(_os.path.join(d, "*.parquet"))))
    return files


def _count_rows(files: list[str]) -> int:
    return sum(_pq.ParquetFile(f).metadata.num_rows for f in files)


def _changed_spo_buckets(old_files: list[str], new_files: list[str]) -> set[int]:
    """spo buckets whose candidate multiset DIFFERS between the old and new
    candidate sets of the touched conv buckets. Only these buckets can have a
    different dedup output — a conv bucket holds many unchanged conversations,
    and their identical candidate rows must not drag every spo bucket they
    feed into the rewrite. One shuffle over the (combiner-shrunk, touched-
    buckets-only) candidates; per-group equality is a sort + frame compare.
    The spo bucket id is read straight off the stored ``sbucket`` column —
    never recomputed, so it cannot drift from the write-time stamping."""
    sides = []
    for side, files in ((0, old_files), (1, new_files)):
        if not files:
            continue
        ds = ray.data.read_parquet(files, columns=TRIPLE_COLS + ["sbucket"])
        ds = ds.map_batches(
            # metadata strip: stores written before the pandas-metadata fix
            # carry dict-bearing schema metadata that breaks Ray's reduce-side
            # schema hashing (see kg.py add_conv_bucket)
            lambda t, s=side: t.replace_schema_metadata(None).append_column(
                "side", pa.array(np.full(t.num_rows, s, np.int8))
            ),
            batch_format="pyarrow",
        )
        sides.append(ds)
    if not sides:
        return set()
    ds = sides[0] if len(sides) == 1 else sides[0].union(sides[1])
    ds = ds.rename_columns({"sbucket": "bucket"})

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        changed = pd.DataFrame({"bucket": pd.array([int(df["bucket"].iloc[0])], dtype="int32")})
        old = df[df["side"] == 0]
        new = df[df["side"] == 1]
        if len(old) != len(new):
            return changed
        o = old.sort_values(TRIPLE_COLS, kind="mergesort")[TRIPLE_COLS].reset_index(drop=True)
        n = new.sort_values(TRIPLE_COLS, kind="mergesort")[TRIPLE_COLS].reset_index(drop=True)
        if o.equals(n):
            return pd.DataFrame({"bucket": pd.array([], dtype="int32")})
        return changed

    out = ds.groupby("bucket").map_groups(diff, batch_format="pandas").to_pandas()
    return set(int(b) for b in out["bucket"])


def _emit_candidates_group(df: pd.DataFrame, extractor_name: str, n_buckets: int) -> pd.DataFrame:
    """One conv bucket of flat mention rows → its partially-deduped candidate
    triples, keeping `cbucket` for the partitioned write and stamping each
    row's spo bucket (``sbucket``, same siphash as the triples partitioning)
    so the re-dedup stage can FILTER the candidate read to the touched spo
    buckets instead of scanning the whole store."""
    bucket = int(df["cbucket"].iloc[0])
    out = _partial_dedup(_emit_triples_bucket(df, extractor_name=extractor_name))
    out = out.reset_index(drop=True)
    out["cbucket"] = np.full(len(out), bucket, dtype=np.int32)
    out["sbucket"] = (
        _hash_bucket(out[["subj", "pred", "obj"]], n_buckets)
        if len(out)
        else np.array([], dtype=np.int32)
    )
    return out


def _write_candidates(
    flat_files: list[str],
    candidates_dir: str,
    n_buckets: int,
    extractor_name: str,
) -> None:
    """Derive + write per-conv-bucket candidate triples for the given mention
    files. The conv bucket is recomputed from conv_id (same siphash as the
    checkpoint partitioning), so hive-inferred partition columns are ignored."""
    ds = ray.data.read_parquet(flat_files)
    if "bucket" in (ds.schema().names or []):
        ds = ds.drop_columns(["bucket"])
    ds = ds.map_batches(add_conv_bucket, fn_kwargs={"n_buckets": n_buckets}, batch_format="pyarrow")
    ds = ds.groupby("cbucket").map_groups(
        _emit_candidates_group,
        fn_kwargs={"extractor_name": extractor_name, "n_buckets": n_buckets},
        batch_format="pandas",
    )
    # pandas map_groups blocks carry pandas schema metadata; strip it so the
    # sort shuffle below can hash schemas AND the stored files stay clean for
    # every later read (kg.py strips the same way before its checkpoint write)
    ds = ds.map_batches(lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
    ds = ds.materialize()
    if ds.count() == 0:
        return
    # sbucket-sorted within each cbucket file, bounded row groups: parquet
    # row-group stats then carry tight [min,max] sbucket ranges, so the
    # re-dedup stage's filtered read prunes whole row groups of untouched
    # spo buckets at the footer. With production-sized buckets (≥100k
    # candidate rows each) a touched set of T spo buckets decodes
    # ~T/n_buckets of the store; fixture-sized buckets fit one row group,
    # where the filter still bounds what ships into the shuffle.
    ds.sort(["cbucket", "sbucket"]).write_parquet(
        candidates_dir, partition_cols=["cbucket"], row_group_size=CAND_ROW_GROUP
    )


def _pred_counts(files: list[str]) -> dict[str, int]:
    """Per-predicate counts over triple files (pruned column; closed 4-value
    predicate set → tiny partials). Small file sets (an update's touched
    buckets) are read on the driver — a Ray pipeline's fixed overhead
    dwarfs a few MB of one dictionary-encoded column; big sets (a full
    store) go distributed."""
    import collections

    counts: collections.Counter = collections.Counter()
    if not files:
        return {}
    if sum(_os.path.getsize(f) for f in files) < 64 * 1024 * 1024:
        import pyarrow.compute as pc

        for f in files:
            vc = pc.value_counts(_pq.read_table(f, columns=["pred"]).column("pred"))
            for p, n in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()):
                counts[p] += n
        return dict(counts)

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(t.column("pred"))
        return pa.table({"pred": vc.field("values"), "n": vc.field("counts")})

    ds = ray.data.read_parquet(files, columns=["pred"]).map_batches(_partial, batch_format="pyarrow")
    for b in ds.iter_batches(batch_format="pyarrow"):
        for p, n in zip(b.column("pred").to_pylist(), b.column("n").to_pylist()):
            counts[p] += n
    return dict(counts)


def ensure_candidates(out_dir: str, n_buckets: int, extractor: str, mentions_fp: str) -> bool:
    """Build the candidates checkpoint from the existing mentions store if it
    is missing or stale (manifest fingerprint ≠ current mentions state).
    Returns True if a (re)build happened. One full pass over the (cheap,
    flat, column-pruned) mentions store — the base run's stage-2 work minus
    the dedup shuffle; every later update touches only delta buckets."""
    mentions_dir = _os.path.join(out_dir, "mentions")
    candidates_dir = _os.path.join(out_dir, "candidates")
    # "cand2": layout v2 (sbucket column, sbucket-sorted files) — a v1 store's
    # manifests never match, so it is rebuilt once into the new layout
    cand_fp = f"cand2|{mentions_fp}"
    done = validated_done_buckets(candidates_dir, cand_fp, prefix="cbucket")
    if len(done) == n_buckets:
        return False
    drop_manifests(candidates_dir)
    for d in _glob.glob(_os.path.join(candidates_dir, "cbucket=*")):
        _shutil.rmtree(d)
    flat_files = _bucket_files(mentions_dir, "bucket")
    if flat_files:
        _write_candidates(flat_files, candidates_dir, n_buckets, extractor)
    manifests = {}
    for d in _glob.glob(_os.path.join(candidates_dir, "cbucket=*")):
        b = int(_os.path.basename(d).split("=")[1])
        manifests[b] = {"rows": _count_rows(sorted(_glob.glob(_os.path.join(d, "*.parquet")))), "stage": "candidates"}
    for b in range(n_buckets):
        manifests.setdefault(b, {"rows": 0, "stage": "candidates"})
    write_bucket_manifests(candidates_dir, manifests, cand_fp)
    return True


def _auto_compact(out_dir: str, threshold: int) -> dict:
    """Opportunistic small-file maintenance AFTER an update commits: every
    update appends delta-* files to touched mention buckets and rewrites
    touched candidate cbuckets, so a long update chain fragments exactly
    the hot partitions. When any partition's file count crosses
    ``threshold``, run ``compact_hive_dir`` over that store (candidates
    re-sorted on sbucket so stage-2's row-group pruning keeps working;
    row-group size is preserved — _compact_one_partition writes
    CAND_ROW_GROUP-sized groups). Crash-safe by construction: compaction's
    marker/double-rename protocol converges via _recover_compactions,
    which run_kg_update now invokes FIRST on every store — a compaction
    killed at any point can never duplicate or lose a bucket, and a
    half-renamed ``cbucket=N.trash`` dir can never be mis-parsed by
    _bucket_files."""
    from .export import compact_hive_dir

    report: dict = {}
    for sub, sort_by in (("mentions", None), ("candidates", ["sbucket"]), ("triples", None)):
        root = _os.path.join(out_dir, sub)
        worst = 0
        for d in _glob.glob(_os.path.join(root, "*=*")):
            if d.endswith((".compact", ".trash")) or not _os.path.isdir(d):
                continue
            worst = max(worst, len(_glob.glob(_os.path.join(d, "*.parquet"))))
        if worst > threshold:
            rep = compact_hive_dir(root, sort_by=sort_by)
            report[sub] = {
                "max_files_before": worst,
                "partitions_compacted": int(
                    (rep["files_after"] < rep["files_before"]).sum()
                )
                if len(rep)
                else 0,
            }
    return report


def run_kg_update(
    input_path: str,
    delta_path: str,
    out_dir: str,
    concurrency=(1, 8),
    compact_files_threshold: int = 8,
) -> dict:
    """Fold the new turns under ``delta_path`` into the completed
    ``run_kg_pipeline`` checkpoint at ``out_dir`` (built from
    ``input_path``). O(delta + touched buckets), not O(corpus). Parameters
    (n_buckets / normalizer / extractor) are read from the base run's
    fingerprint so an update can never silently mix semantics.

    Returns a stats dict with per-stage lineage: touched conv buckets,
    touched spo buckets, carried-forward bucket counts, delta mention rows.
    Chained updates are supported — each update's sidecar fingerprint is the
    hash-chain of its predecessor plus the delta signature.
    """
    from .. import __version__
    from ..schemas import validate_transcripts_schema
    from ..stages.extract import derive_seller, flat_extract_batch
    from ..stages.ner_scorer import NerScorer, TinyTransformerNerScorer
    from ..stages.normalize import make_normalizer

    mentions_dir = _os.path.join(out_dir, "mentions")
    triples_dir = _os.path.join(out_dir, "triples")
    candidates_dir = _os.path.join(out_dir, "candidates")
    sidecar = _os.path.join(out_dir, "run_metrics.json")

    # ---- validate the base checkpoint --------------------------------------
    try:
        prior = _json.loads(open(sidecar).read())
        old_fp = prior["fingerprint"]
    except (OSError, ValueError, KeyError) as exc:
        raise ValueError(
            f"{out_dir}: no completed base run (run_metrics.json with a "
            f"fingerprint is required before an incremental update)"
        ) from exc
    # finish any compaction a previous session crashed mid-swap BEFORE any
    # manifest validation or bucket glob touches the stores (a lingering
    # `bucket=N.trash` dir would otherwise corrupt bucket parsing)
    from .export import _recover_compactions

    for d in (mentions_dir, candidates_dir, triples_dir):
        if _os.path.isdir(d):
            _recover_compactions(d)

    params = _parse_fp_params(old_fp)
    n_buckets = params.get("n_buckets")
    normalizer = params.get("normalizer", 1)
    extractor = params.get("extractor", "regex")
    link = params.get("link", True)
    if not n_buckets:
        raise ValueError(f"cannot parse n_buckets from base fingerprint {old_fp!r}")
    all_b = set(range(n_buckets))
    if validated_done_buckets(mentions_dir, old_fp) != all_b or validated_done_buckets(triples_dir, old_fp) != all_b:
        raise ValueError(
            f"{out_dir}: base run incomplete under fingerprint {old_fp!r} — "
            f"finish (or rerun) run_kg_pipeline before updating"
        )

    stats: dict = {"n_buckets": n_buckets, "base_fingerprint": old_fp}
    delta_sig = _sig(delta_path)
    applied = list(prior.get("applied_deltas", []))
    if delta_sig in applied:
        # idempotent re-apply: this exact delta is already folded in — doing
        # it again would duplicate its mention rows in the checkpoint
        prior["update_skipped_already_applied"] = True
        return prior
    chain = _hashlib.blake2b(old_fp.encode(), digest_size=8).hexdigest()
    new_fp = (
        f"v{__version__}|upd:{chain}+{delta_sig}"
        f"|b{n_buckets}|n{normalizer}|x{extractor}|l{link}"
    )
    stats["fingerprint"] = new_fp
    stats["applied_deltas"] = applied + [delta_sig]

    # ---- candidates store (one-time backfill for pre-update checkpoints) ---
    stats["candidates_rebuilt"] = ensure_candidates(out_dir, n_buckets, extractor, old_fp)

    # ---- stage 1: extract the DELTA only -----------------------------------
    staging = _os.path.join(out_dir, "_delta_mentions")
    if _os.path.isdir(staging):
        _shutil.rmtree(staging)
    ds = ray.data.read_parquet(delta_path)
    validate_transcripts_schema(ds.schema())
    ds = ds.map_batches(make_normalizer(normalizer), batch_format="pyarrow")
    ds = ds.map_batches(derive_seller, batch_format="pyarrow")
    if extractor == "regex":
        ds = ds.map_batches(flat_extract_batch, batch_format="pyarrow", batch_size=2048)
    else:
        cls = {"ner": NerScorer, "ner_subword": TinyTransformerNerScorer}[extractor]
        from .kg import flatten_mentions

        ds = ds.map_batches(cls, batch_format="pyarrow", batch_size=2048, concurrency=concurrency)
        ds = ds.select_columns(["conv_id", "turn_idx", "seller", "mentions"]).map_batches(
            flatten_mentions, batch_format="pyarrow"
        )
    ds = ds.map_batches(add_conv_bucket, fn_kwargs={"n_buckets": n_buckets}, batch_format="pyarrow")
    ds = ds.rename_columns({"cbucket": "bucket"})
    ds = ds.materialize()
    if ds.count() > 0:
        ds.sort("bucket").write_parquet(staging, partition_cols=["bucket"])
    touched_conv = {
        int(_os.path.basename(d).split("=")[1])
        for d in _glob.glob(_os.path.join(staging, "bucket=*"))
    }
    stats["conv_buckets_touched"] = sorted(touched_conv)
    stats["mentions_delta_rows"] = _count_rows(_bucket_files(staging, "bucket"))
    if len(touched_conv) > n_buckets // 2:
        # measured breakeven (BASELINE.md): past ~50% touched conv buckets
        # the update's per-bucket re-emit + diff costs more than a rebuild
        stats["rebuild_recommended"] = True
        import warnings

        warnings.warn(
            f"delta touches {len(touched_conv)}/{n_buckets} conv buckets — "
            f"a broad delta; run_kg_pipeline over base+delta is likely cheaper"
        )

    old_mention_rows = manifest_rows(mentions_dir, old_fp)
    old_triple_rows = manifest_rows(triples_dir, old_fp)
    old_cand_rows = manifest_rows(candidates_dir, f"cand2|{old_fp}")

    if not touched_conv:
        # mention-free delta: nothing can change — carry every bucket forward
        # under the new fingerprint (turn counts grew, triples did not)
        for d, rows, tag in (
            (mentions_dir, old_mention_rows, "mentions"),
            (triples_dir, old_triple_rows, "triples"),
        ):
            drop_manifests(d)
            write_bucket_manifests(
                d, {b: {"rows": rows.get(b, 0), "stage": tag} for b in all_b}, new_fp
            )
        drop_manifests(candidates_dir)
        write_bucket_manifests(
            candidates_dir,
            {b: {"rows": old_cand_rows.get(b, 0), "stage": "candidates"} for b in all_b},
            f"cand2|{new_fp}",
        )
        stats.update(
            {
                "spo_buckets_touched": [],
                "mentions_rows": sum(old_mention_rows.values()),
                "triples_rows": sum(old_triple_rows.values()),
                "pred_counts": prior.get("pred_counts", {}),
                "triples_dir": triples_dir,
            }
        )
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump(stats, fh, sort_keys=True)
        _os.replace(tmp, sidecar)
        return stats

    # ---- mutation phase: manifests dropped first (crash ⇒ full rebuild) ----
    drop_manifests(mentions_dir)
    drop_manifests(candidates_dir)
    drop_manifests(triples_dir)

    # fold staged delta files into the mentions store (unique names: the
    # fingerprint chain prefixes every file, so chained updates never collide)
    delta_rows_per_bucket: dict[int, int] = {}
    for d in sorted(_glob.glob(_os.path.join(staging, "bucket=*"))):
        b = int(_os.path.basename(d).split("=")[1])
        dest = _os.path.join(mentions_dir, f"bucket={b}")
        _os.makedirs(dest, exist_ok=True)
        files = sorted(_glob.glob(_os.path.join(d, "*.parquet")))
        delta_rows_per_bucket[b] = _count_rows(files)
        for i, f in enumerate(files):
            _os.replace(f, _os.path.join(dest, f"delta-{chain}-{i:04d}-{_os.path.basename(f)}"))
    _shutil.rmtree(staging)

    # re-emit candidates for the touched conv buckets (old + delta mentions);
    # old candidates are parked, not deleted — the changed-bucket diff below
    # needs them
    parked = _os.path.join(out_dir, "_old_candidates")
    if _os.path.isdir(parked):
        _shutil.rmtree(parked)
    _os.makedirs(parked)
    for b in touched_conv:
        d = _os.path.join(candidates_dir, f"cbucket={b}")
        if _os.path.isdir(d):
            _os.replace(d, _os.path.join(parked, f"cbucket={b}"))
    touched_flat = _bucket_files(mentions_dir, "bucket", touched_conv)
    if touched_flat:
        _write_candidates(touched_flat, candidates_dir, n_buckets, extractor)
    touched_spo = _changed_spo_buckets(
        _bucket_files(parked, "cbucket"),
        _bucket_files(candidates_dir, "cbucket", touched_conv),
    )
    _shutil.rmtree(parked)
    stats["spo_buckets_touched"] = sorted(touched_spo)

    # pred counts of the spo buckets about to be replaced (incremental sidecar)
    old_touched_pred = _pred_counts(_bucket_files(triples_dir, "bucket", touched_spo))

    # ---- stage 2: re-dedup ONLY the touched spo buckets ---------------------
    # the read itself is FILTERED on the stored sbucket stamp: untouched spo
    # buckets' candidate rows never leave storage (files are sbucket-sorted,
    # so parquet row-group stats prune them at the footer) — this stage costs
    # O(touched spo fraction of candidates), not O(corpus)
    cand_files = _bucket_files(candidates_dir, "cbucket")
    new_touched_pred: dict[str, int] = {}
    for b in touched_spo:
        d = _os.path.join(triples_dir, f"bucket={b}")
        if _os.path.isdir(d):
            _shutil.rmtree(d)
    if cand_files and touched_spo:
        import pyarrow.compute as _pc

        tds = ray.data.read_parquet(
            cand_files,
            columns=TRIPLE_COLS + ["sbucket"],
            filter=_pc.field("sbucket").isin(sorted(touched_spo)),
        )
        tds = tds.rename_columns({"sbucket": "bucket"})
        tds = tds.map_batches(_partial_dedup, batch_format="pandas")
        # strip pandas block metadata before the groupby shuffle (schema hash)
        tds = tds.map_batches(lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
        tds = tds.materialize()
        # O(delta) evidence in the sidecar: rows entering the re-dedup
        # shuffle (touched spo buckets only) vs the whole candidate store
        stats["stage2_rows_shipped"] = tds.count()
        stats["candidate_rows_total"] = sum(old_cand_rows.values()) or None
        if tds.count() > 0:
            tds = tds.groupby("bucket").map_groups(_bucket_dedup, batch_format="pandas")
            tds = tds.map_batches(add_provenance, batch_format="pyarrow")
            tds.write_parquet(triples_dir, partition_cols=["bucket"])
        new_touched_pred = _pred_counts(_bucket_files(triples_dir, "bucket", touched_spo))

    # ---- commit manifests under the new fingerprint -------------------------
    m_manifests = {}
    for b in all_b:
        rows = old_mention_rows.get(b, 0) + delta_rows_per_bucket.get(b, 0)
        m_manifests[b] = {"rows": rows, "stage": "mentions"}
    write_bucket_manifests(mentions_dir, m_manifests, new_fp)

    c_manifests = {}
    for b in all_b:
        if b in touched_conv:
            files = _bucket_files(candidates_dir, "cbucket", {b})
            c_manifests[b] = {"rows": _count_rows(files), "stage": "candidates"}
        else:
            c_manifests[b] = {"rows": old_cand_rows.get(b, 0), "stage": "candidates"}
    write_bucket_manifests(candidates_dir, c_manifests, f"cand2|{new_fp}")

    t_manifests = {}
    for b in all_b:
        if b in touched_spo:
            files = _bucket_files(triples_dir, "bucket", {b})
            t_manifests[b] = {"rows": _count_rows(files), "stage": "triples"}
        else:
            t_manifests[b] = {"rows": old_triple_rows.get(b, 0), "stage": "triples"}
    write_bucket_manifests(triples_dir, t_manifests, new_fp)

    # ---- sidecar: incremental pred counts + lineage -------------------------
    pred_counts: dict[str, int] = dict(prior.get("pred_counts", {}))
    if pred_counts:
        for p, n in old_touched_pred.items():
            pred_counts[p] = pred_counts.get(p, 0) - n
        for p, n in new_touched_pred.items():
            pred_counts[p] = pred_counts.get(p, 0) + n
        pred_counts = {p: n for p, n in pred_counts.items() if n > 0}
    else:  # base sidecar predates pred counting: full (pruned-column) rescan
        pred_counts = _pred_counts(_bucket_files(triples_dir, "bucket"))
    stats["pred_counts"] = dict(sorted(pred_counts.items()))
    stats["mentions_rows"] = sum(m["rows"] for m in m_manifests.values())
    stats["triples_rows"] = sum(m["rows"] for m in t_manifests.values())
    stats["spo_buckets_carried"] = n_buckets - len(touched_spo)
    stats["conv_buckets_carried"] = n_buckets - len(touched_conv)
    stats["triples_dir"] = triples_dir

    tmp = sidecar + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump(stats, fh, sort_keys=True)
    _os.replace(tmp, sidecar)

    # maintenance AFTER the commit point: a crash inside compaction loses
    # nothing (the update is durable; recovery-first on the next call
    # converges the swap). Stats are advisory, not part of the sidecar.
    stats["compaction"] = _auto_compact(out_dir, compact_files_threshold)
    return stats
