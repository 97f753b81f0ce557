"""Per-partition manifest sidecars for resumable output.

Layout (FIXTURES.md §3):

    <out_dir>/bucket=NNNN/part-*.parquet      data, written by Ray Data
    <out_dir>/manifest/bucket=NNNN.json       commit marker per bucket

A bucket counts as DONE only when its manifest exists and carries the same
run fingerprint (input path + params). Writing is atomic (tmp + os.replace),
mirroring the reference's transactional file discipline
(data_pipeline.py:190-211, interpret.py:804-815). On resume, bucket dirs
WITHOUT a valid manifest are deleted before reprocessing, so partial output
from a crashed run can never leak into results — skip-if-done plus
delete-if-partial gives exactly-once per bucket.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from pathlib import Path


def content_signature(path: str | Path, tail_bytes: int = 65536) -> str:
    """Content fingerprint of a local Parquet file/dir for checkpoint
    invalidation: per file, name + size + mtime_ns + a blake2b digest of the
    LAST ``tail_bytes`` bytes. The tail covers the Parquet footer (schema,
    row-group offsets and column-chunk min/max statistics), so a regenerated
    input whose files happen to keep identical sizes — and even identical
    mtimes, e.g. restored from an archive — still changes the signature: any
    data change perturbs the footer statistics. Cost is one bounded read per
    file on the driver (64 KiB each), independent of corpus size, so at
    cluster scale this stays O(files), not O(bytes).

    Local-filesystem only by design: callers with remote (s3:// etc.) inputs
    go through the flagship's pyarrow.fs signature (pipelines/kg.py), which
    refuses rather than degrade. Missing paths hash to a distinct sentinel so
    an empty/renamed input still invalidates."""
    h = hashlib.blake2b(digest_size=16)
    p = Path(path)
    files = sorted(p.rglob("*.parquet")) if p.is_dir() else [p]
    if not files:
        h.update(b"<empty>")
    for f in files:
        try:
            st = f.stat()
            h.update(f.name.encode())
            h.update(str(st.st_size).encode())
            h.update(str(st.st_mtime_ns).encode())
            with open(f, "rb") as fh:
                if st.st_size > tail_bytes:
                    fh.seek(-tail_bytes, os.SEEK_END)
                h.update(fh.read(tail_bytes))
        except OSError:
            h.update(b"<unreadable>")
    return h.hexdigest()


def _manifest_dir(out_dir: str | Path) -> Path:
    return Path(out_dir) / "manifest"


def _manifest_path(out_dir: str | Path, bucket: int) -> Path:
    return _manifest_dir(out_dir) / f"bucket={bucket:04d}.json"


def done_buckets(out_dir: str | Path, fingerprint: str) -> set[int]:
    """Buckets with a valid manifest matching this run's fingerprint."""
    mdir = _manifest_dir(out_dir)
    if not mdir.is_dir():
        return set()
    done: set[int] = set()
    for p in mdir.glob("bucket=*.json"):
        try:
            meta = json.loads(p.read_text())
        except (ValueError, OSError):
            continue
        if meta.get("fingerprint") == fingerprint:
            done.add(int(p.stem.split("=")[1]))
    return done


def validated_done_buckets(
    out_dir: str | Path, fingerprint: str, prefix: str = "bucket"
) -> set[int]:
    """``done_buckets`` plus an existence check on the data it vouches for:
    a manifest claiming rows > 0 whose ``bucket=N`` dir is gone — or still
    exists but holds no parquet files (partial restore, selective delete) —
    is NOT done; its manifest is dropped so the bucket rebuilds. Found by
    the chaos-resume test: trusting such a manifest silently loses that
    bucket's output. ``prefix`` names the data-dir key (``cbucket`` for the
    update path's candidates store); manifests themselves are always
    ``manifest/bucket=N.json``."""
    out_dir = Path(out_dir)
    done: set[int] = set()
    for bucket, rows in manifest_rows(out_dir, fingerprint).items():
        d = out_dir / f"{prefix}={bucket}"
        if rows == 0 or (d.is_dir() and any(d.glob("*.parquet"))):
            done.add(bucket)
        else:
            _manifest_path(out_dir, bucket).unlink(missing_ok=True)
    return done


def clean_unfinished_buckets(out_dir: str | Path, done: set[int]) -> list[int]:
    """Delete bucket data dirs that lack a valid manifest (partial output)."""
    out_dir = Path(out_dir)
    removed = []
    for d in out_dir.glob("bucket=*"):
        if not d.is_dir():
            continue
        b = int(d.name.split("=")[1])
        if b not in done:
            shutil.rmtree(d)
            removed.append(b)
    return removed


def manifest_rows(out_dir: str | Path, fingerprint: str) -> dict[int, int]:
    """Per-bucket row counts recorded at commit time — lets resume report
    totals without re-reading any Parquet footer."""
    mdir = _manifest_dir(out_dir)
    rows: dict[int, int] = {}
    if not mdir.is_dir():
        return rows
    for p in mdir.glob("bucket=*.json"):
        try:
            meta = json.loads(p.read_text())
        except (ValueError, OSError):
            continue
        if meta.get("fingerprint") == fingerprint and "rows" in meta:
            rows[int(p.stem.split("=")[1])] = int(meta["rows"])
    return rows


def drop_manifests(out_dir: str | Path) -> None:
    """Remove ALL manifests for a stage (the resume=False reset path).

    Called BEFORE deleting bucket data dirs so the 'manifest exists => data
    exists' invariant holds even if the reset run crashes between the two
    deletions: no manifest can ever vouch for data a fresh run removed."""
    mdir = _manifest_dir(out_dir)
    if mdir.is_dir():
        shutil.rmtree(mdir)


def write_bucket_manifests(
    out_dir: str | Path,
    buckets: dict[int, dict],
    fingerprint: str,
) -> None:
    """Commit manifests for completed buckets (atomic per bucket)."""
    mdir = _manifest_dir(out_dir)
    mdir.mkdir(parents=True, exist_ok=True)
    for bucket, meta in buckets.items():
        payload = dict(meta, fingerprint=fingerprint, bucket=bucket)
        path = _manifest_path(out_dir, bucket)
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps(payload, sort_keys=True))
        os.replace(tmp, path)
