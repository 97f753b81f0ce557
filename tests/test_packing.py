"""doc_pack_bins (pipelines/textstats.py): greedy sequence packing pinned
against a naive in-process reference, plus capacity/order invariants."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from ethiomart_amharic_ner_ray.pipelines.textstats import doc_pack_bins

SF_DIR = "/root/testdata/sf0.001"
CAP = 64


def _naive_pack(df: pd.DataFrame, capacity: int) -> pd.DataFrame:
    """Sequential greedy reference: per source, docs in doc_id order; start a
    new bin when the doc would not fit (oversize doc → its own bin)."""
    out = []
    for source, g in df.groupby("source"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        b, used = 0, 0
        for _, row in g.iterrows():
            n = row["n_tok"]
            if used > 0 and used + n > capacity:
                b, used = b + 1, 0
            used += n
            out.append((row["doc_id"], source, n, b))
    return pd.DataFrame(out, columns=["doc_id", "source", "n_tok", "bin_idx"])


@pytest.fixture(scope="module")
def packed(ray_session):
    return doc_pack_bins(SF_DIR, capacity_tokens=CAP).to_pandas()


@pytest.fixture(scope="module")
def docs_tokens():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "source"])
    df = t.to_pandas()
    df["n_tok"] = [len(x.split()) for x in df["text"]]
    return df


class TestDocPackBins:
    def test_matches_naive_reference(self, packed, docs_tokens):
        ref = _naive_pack(docs_tokens, CAP)
        got = packed.sort_values(["source", "doc_id"]).reset_index(drop=True)
        ref = ref.sort_values(["source", "doc_id"]).reset_index(drop=True)
        assert got["doc_id"].tolist() == ref["doc_id"].tolist()
        assert got["n_tok"].tolist() == ref["n_tok"].tolist()
        assert got["bin_idx"].tolist() == ref["bin_idx"].tolist()

    def test_capacity_invariant(self, packed):
        """Every bin fits the capacity unless it holds a single oversize doc."""
        for (_, _), g in packed.groupby(["source", "bin_idx"]):
            total = g["n_tok"].sum()
            assert total <= CAP or len(g) == 1

    def test_bins_dense_and_ordered(self, packed):
        """Bin ids per source are 0..max dense, and doc_id order is preserved
        across increasing bin ids (greedy never reorders)."""
        for _, g in packed.groupby("source"):
            ids = np.sort(g["bin_idx"].unique())
            assert ids.tolist() == list(range(len(ids)))
            g = g.sort_values("doc_id")
            assert (np.diff(g["bin_idx"].to_numpy()) >= 0).all()

    def test_every_doc_packed_once(self, packed, docs_tokens):
        assert sorted(packed["doc_id"]) == sorted(docs_tokens["doc_id"])
