"""Checkpoint / resume state: per-partition manifests."""

from .manifest import (  # noqa: F401
    clean_unfinished_buckets,
    done_buckets,
    write_bucket_manifests,
)
