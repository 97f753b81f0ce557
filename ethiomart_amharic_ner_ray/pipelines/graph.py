"""Distributed connected components via iterative min-label propagation.

The dedup family's clustering step (near-dup pairs → clusters) must not
union-find on the driver (round-1 verdict finding #3): at 10^12-doc scale
the verified pair set is itself a dataset. Min-label propagation is the
standard shuffle-native equivalent: every node's label starts at its own id;
each round every edge forwards its source's label and every node keeps the
minimum seen; after ≤ diameter rounds each node holds the minimum id of its
component — exactly what union-find-with-min-root computes.

Each round is one bucketed hash join (labels onto edge sources) plus one
bucketed min-groupby — both B-bucket shuffles from pipelines/common.py, no
driver-side graph state. Near-dup graphs are unions of near-cliques, so the
diameter (and round count) is small in practice. Labels are materialized
per round (they are tiny relative to the corpus: only docs that appear in
some pair); a cluster deployment would checkpoint them to Parquet instead,
like run_kg_pipeline's staged barriers.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from .common import bucketed_group_agg, bucketed_join, rename_cols


def _edges_both_directions(pairs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    def f(t: pa.Table) -> pa.Table:
        import numpy as np

        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    return pairs_ds.map_batches(f, batch_format="pyarrow")


def connected_components_minlabel(
    pairs_ds: "ray.data.Dataset",
    n_buckets: int = 32,
    max_rounds: int = 50,
) -> "ray.data.Dataset":
    """(a, b) pair Dataset → (doc_id, cluster_rep) with cluster_rep = the
    minimum doc_id of the connected component. Fixpoint detected by the
    (strictly decreasing while unconverged) global label sum."""
    edges = _edges_both_directions(pairs_ds).materialize()

    # init: label(x) = x, one row per distinct node
    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates("src")[["src"]].rename(columns={"src": "node"})
        return out.assign(label=out["node"])

    labels = bucketed_group_agg(edges, ["src"], init_labels, n_buckets=n_buckets).materialize()
    prev_sum = labels.sum(on="label")

    for _ in range(max_rounds):
        # messages: every edge forwards label(src) to dst
        msgs = bucketed_join(
            edges, rename_cols(labels, {"node": "src"}), on="src", n_buckets=n_buckets
        ).select_columns(["dst", "label"])
        msgs = rename_cols(msgs, {"dst": "node"})

        def take_min(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("node", as_index=False)["label"].min()

        labels = bucketed_group_agg(
            labels.union(msgs), ["node"], take_min, n_buckets=n_buckets
        ).materialize()
        new_sum = labels.sum(on="label")
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    return rename_cols(labels, {"node": "doc_id", "label": "cluster_rep"})


def two_hop(
    triples_ds: "ray.data.Dataset",
    pred_ab: str,
    pred_bc: str,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Graph traversal as dataflow: (src)-[pred_ab]->(mid)-[pred_bc]->(dst)
    over a triples Dataset — e.g. seller -sells-> product -priced_at-> birr.

    Both edge sets are predicate-filtered AT THE SCAN (tiny row subsets of
    the triples table), then joined on the shared ``mid`` entity with ONE
    bucketed shuffle (common.bucketed_join). The output carries the full
    path (src, mid, dst). Skew note: a super-connected mid entity (a
    product sold by thousands of sellers) concentrates its join group;
    bound it upstream with salted pre-aggregation if paths per mid must be
    capped."""
    import pyarrow.compute as pc

    def edges(pred: str, src_name: str, dst_name: str):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("pred"), pred))
            return pa.table({src_name: t.column("subj"), dst_name: t.column("obj")})

        return triples_ds.map_batches(f, batch_format="pyarrow")

    left = edges(pred_ab, "src", "mid")
    right = edges(pred_bc, "mid", "dst")
    return bucketed_join(left, right, on="mid", n_buckets=n_buckets)
