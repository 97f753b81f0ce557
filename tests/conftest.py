"""Session-scoped Ray + shared fixtures. Ray is initialised ONCE per pytest
session (num_cpus=4, local), per the repo test policy."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_transcripts_dir(tmp_path_factory):
    """~1k-turn deterministic transcripts (FIXTURES.md 'tiny')."""
    from ethiomart_amharic_ner_ray.sources.transcripts import ensure_transcripts

    out = tmp_path_factory.mktemp("transcripts") / "tiny"
    return ensure_transcripts(out, 1000, seed=42)


@pytest.fixture(scope="session")
def tiny_transcripts_table(tiny_transcripts_dir):
    files = sorted(glob.glob(tiny_transcripts_dir + "/*.parquet"))
    return pq.read_table(files)


SF_DIR = "/root/testdata/sf0.001"
