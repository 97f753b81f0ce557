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

    converged = False
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
            converged = True
            break
        prev_sum = new_sum

    if not converged:
        # a component with diameter > max_rounds would silently carry
        # MULTIPLE cluster_rep values (one true cluster split in two) —
        # surface it instead of returning partial labels as if final
        import warnings

        warnings.warn(
            f"connected_components_minlabel: label propagation did not "
            f"converge within max_rounds={max_rounds}; labels are partial "
            f"(some components may be split). Raise max_rounds.",
            RuntimeWarning,
        )

    return rename_cols(labels, {"node": "doc_id", "label": "cluster_rep"})


def two_hop(
    triples_ds: "ray.data.Dataset",
    pred_ab: str,
    pred_bc: str,
    n_buckets: int = 32,
    max_paths_per_mid: int | None = None,
) -> "ray.data.Dataset":
    """Graph traversal as dataflow: (src)-[pred_ab]->(mid)-[pred_bc]->(dst)
    over a triples Dataset — e.g. seller -sells-> product -priced_at-> birr.

    Both edge sets are predicate-filtered AT THE SCAN (tiny row subsets of
    the triples table), then joined on the shared ``mid`` entity with ONE
    bucketed shuffle (common.bucketed_join). The output carries the full
    path (src, mid, dst).

    Skew bound: a super-connected mid entity (a product sold by thousands
    of sellers priced thousands of ways) makes its join group emit
    |sellers| x |prices| rows — quadratic in the hot entity's degree.
    ``max_paths_per_mid`` caps that deterministically: each side keeps only
    the k = isqrt(cap) LEXICOGRAPHICALLY SMALLEST endpoints per mid (min-k
    is a semilattice, so a per-batch partial cap runs before the shuffle —
    a hot mid's rows are pre-thinned in every scan task and the exchange
    never ships more than k x n_blocks rows for it), then the in-group
    cross product is trimmed to the cap. Output for a capped mid is a
    deterministic, rerun-stable subset of the uncapped paths; mids with
    degree <= k on both sides are emitted in full."""
    import pyarrow.compute as pc

    def edges(pred: str, src_name: str, dst_name: str):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("pred"), pred))
            return pa.table({src_name: t.column("subj"), dst_name: t.column("obj")})

        return triples_ds.map_batches(f, batch_format="pyarrow")

    left = edges(pred_ab, "src", "mid")
    right = edges(pred_bc, "mid", "dst")
    if max_paths_per_mid is None:
        return bucketed_join(left, right, on="mid", n_buckets=n_buckets)

    import math

    k = max(1, math.isqrt(max_paths_per_mid))

    def cap_side(other: str):
        def f(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df.sort_values(["mid", other], kind="mergesort").groupby("mid", sort=False).head(k)
            return pa.Table.from_pandas(df, preserve_index=False)

        return f

    left = left.map_batches(cap_side("src"), batch_format="pyarrow")
    right = right.map_batches(cap_side("dst"), batch_format="pyarrow")

    def capped_merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.sort_values(["mid", "src"], kind="mergesort").groupby("mid", sort=False).head(k)
        rdf = rdf.sort_values(["mid", "dst"], kind="mergesort").groupby("mid", sort=False).head(k)
        out = ldf.merge(rdf, on="mid", how="inner")
        # k*k <= cap by floor-isqrt; the head() is a hard guarantee that
        # also pins the output-order contract per mid
        return (
            out.sort_values(["mid", "src", "dst"], kind="mergesort")
            .groupby("mid", sort=False)
            .head(max_paths_per_mid)
        )

    return bucketed_join(left, right, on="mid", n_buckets=n_buckets, merge_fn=capped_merge)
