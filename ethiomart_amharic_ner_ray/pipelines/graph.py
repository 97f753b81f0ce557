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


def _warn_unconverged(max_rounds: int) -> None:
    # a component with diameter > max_rounds would silently carry MULTIPLE
    # cluster_rep values (one true cluster split in two) — surface it
    # instead of returning partial labels as if final
    import warnings

    warnings.warn(
        f"connected_components_minlabel: label propagation did not "
        f"converge within max_rounds={max_rounds}; labels are partial "
        f"(some components may be split). Raise max_rounds.",
        RuntimeWarning,
    )


def _cc_round_step(
    edges: "ray.data.Dataset", labels: "ray.data.Dataset", n_buckets: int
) -> "ray.data.Dataset":
    """One propagation round: forward label(src) along every edge, keep the
    per-node minimum of (old label, incoming labels)."""
    msgs = bucketed_join(
        edges, rename_cols(labels, {"node": "src"}), on="src", n_buckets=n_buckets
    ).select_columns(["dst", "label"])
    msgs = rename_cols(msgs, {"dst": "node"})

    def take_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["label"].min()

    return bucketed_group_agg(labels.union(msgs), ["node"], take_min, n_buckets=n_buckets)


def _cc_init_labels(edges: "ray.data.Dataset", n_buckets: int) -> "ray.data.Dataset":
    # init: label(x) = x, one row per distinct node
    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates("src")[["src"]].rename(columns={"src": "node"})
        return out.assign(label=out["node"])

    return bucketed_group_agg(edges, ["src"], init_labels, n_buckets=n_buckets)


def connected_components_minlabel(
    pairs_ds: "ray.data.Dataset",
    n_buckets: int = 32,
    max_rounds: int = 50,
    checkpoint_dir: str | None = None,
    fingerprint: str = "cc-v1",
) -> "ray.data.Dataset":
    """(a, b) pair Dataset → (doc_id, cluster_rep) with cluster_rep = the
    minimum doc_id of the connected component. Fixpoint detected by the
    (strictly decreasing while unconverged) global label sum.

    ``checkpoint_dir=None`` (default) materializes labels per round in the
    object store — fine at fixture scale. With a ``checkpoint_dir``, edges
    and every round's labels are Parquet-checkpointed with per-round
    commit markers (run_kg_pipeline-style barrier): a crashed clustering
    job resumes from its last COMMITTED round instead of restarting, and
    no label set is ever pinned in the object store across rounds. Pass a
    content-derived ``fingerprint`` (e.g. the pair set's input signature)
    so stale checkpoints from a different pair set can never be resumed."""
    if checkpoint_dir is None:
        edges = _edges_both_directions(pairs_ds).materialize()
        labels = _cc_init_labels(edges, n_buckets).materialize()
        prev_sum = labels.sum(on="label")
        converged = False
        for _ in range(max_rounds):
            labels = _cc_round_step(edges, labels, n_buckets).materialize()
            new_sum = labels.sum(on="label")
            if new_sum == prev_sum:
                converged = True
                break
            prev_sum = new_sum
        if not converged:
            _warn_unconverged(max_rounds)
        return rename_cols(labels, {"node": "doc_id", "label": "cluster_rep"})

    return _cc_checkpointed(pairs_ds, n_buckets, max_rounds, checkpoint_dir, fingerprint)


def _cc_marker(path, meta=None):
    """Read (meta=None) or atomically write a stage commit marker."""
    import json
    import os

    if meta is None:
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None
    tmp = str(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, path)
    return meta


def _cc_checkpointed(
    pairs_ds: "ray.data.Dataset",
    n_buckets: int,
    max_rounds: int,
    checkpoint_dir: str,
    fingerprint: str,
) -> "ray.data.Dataset":
    import os
    import shutil

    os.makedirs(checkpoint_dir, exist_ok=True)

    def stage_dir(name: str) -> str:
        return os.path.join(checkpoint_dir, name)

    def valid(name: str, extra: dict | None = None) -> dict | None:
        meta = _cc_marker(os.path.join(checkpoint_dir, f"{name}.json"))
        if not meta or meta.get("fingerprint") != fingerprint:
            return None
        if not any(f.endswith(".parquet") for f in _ls(stage_dir(name))):
            return None
        if extra and any(meta.get(k) != v for k, v in extra.items()):
            return None
        return meta

    def _ls(d: str) -> list[str]:
        try:
            return os.listdir(d)
        except OSError:
            return []

    def write_stage(name: str, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        # data first, marker second (with whatever meta the caller computed
        # AFTER the write): a marker can never vouch for absent/partial data
        d = stage_dir(name)
        shutil.rmtree(d, ignore_errors=True)
        ds.write_parquet(d)
        return ray.data.read_parquet(d)

    def mark(name: str, **meta) -> None:
        _cc_marker(
            os.path.join(checkpoint_dir, f"{name}.json"), dict(meta, fingerprint=fingerprint)
        )

    # ---- edges (written once per fingerprint) ----------------------------
    if valid("edges"):
        edges = ray.data.read_parquet(stage_dir("edges"))
    else:
        edges = write_stage("edges", _edges_both_directions(pairs_ds))
        mark("edges")

    # ---- find last committed round ---------------------------------------
    start_round, labels, prev_sum, converged = 0, None, None, False
    rounds = sorted(
        int(f[len("round_") : -len(".json")])
        for f in _ls(checkpoint_dir)
        if f.startswith("round_") and f.endswith(".json")
    )
    for r in reversed(rounds):
        meta = valid(f"round_{r}")
        if meta:
            start_round = r
            labels = ray.data.read_parquet(stage_dir(f"round_{r}"))
            prev_sum = meta["label_sum"]
            converged = bool(meta.get("converged"))
            break
    if labels is None:
        labels = write_stage("round_0", _cc_init_labels(edges, n_buckets))
        prev_sum = labels.sum(on="label")
        mark("round_0", label_sum=prev_sum, converged=False)

    for r in range(start_round + 1, max_rounds + 1):
        if converged:
            break
        labels = write_stage(f"round_{r}", _cc_round_step(edges, labels, n_buckets))
        new_sum = labels.sum(on="label")
        converged = new_sum == prev_sum
        mark(f"round_{r}", label_sum=new_sum, converged=converged)
        prev_sum = new_sum
        # bound storage: only the latest committed round is needed to resume
        shutil.rmtree(stage_dir(f"round_{r - 1}"), ignore_errors=True)
        try:
            os.unlink(os.path.join(checkpoint_dir, f"round_{r - 1}.json"))
        except OSError:
            pass

    if not converged:
        _warn_unconverged(max_rounds)
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
            return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

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


def pagerank(
    edges_ds: "ray.data.Dataset",
    n_buckets: int = 32,
    n_iters: int = 10,
    damping: float = 0.85,
) -> pd.DataFrame:
    """Distributed PageRank over a (src, dst) edge Dataset — the entity-
    importance signal a KG pipeline ranks sellers/products by once triples
    exist. Same shuffle diet as connected components: each iteration is ONE
    bucketed join (ranks onto edge sources) plus ONE bucketed sum-groupby,
    both B-bucket exchanges; no adjacency ever lives on the driver.

    Per iteration: contrib(dst) = Σ_src rank(src)/outdeg(src) over in-edges;
    rank'(v) = (1−d)/N + d·(contrib(v) + dangling/N), where the dangling
    mass (rank parked on out-degree-0 nodes) is the scalar
    1 − Σ contributions — one Dataset.sum() per round, never a node scan
    driver-side. Node/degree tables are built once with the bucketed
    two-phase distinct/count shapes and reused every round. Rounds
    materialize the rank vector (node-dimension-sized, like CC's labels);
    a cluster run swaps materialize for the CC-style Parquet round
    checkpoints (graph._cc_checkpointed is the template).

    Returns the full (node, rank) frame; Σ rank = 1 up to float error."""
    import numpy as np

    def dedup_edges(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    edges = bucketed_group_agg(
        edges_ds, ["src", "dst"], dedup_edges, n_buckets=n_buckets
    ).materialize()

    # node universe: src ∪ dst, two-phase distinct
    def to_nodes(t: pa.Table) -> pa.Table:
        import numpy as _np

        vals = _np.concatenate(
            [t.column("src").to_numpy(zero_copy_only=False), t.column("dst").to_numpy(zero_copy_only=False)]
        )
        return pa.table({"node": pa.array(pd.unique(vals))})

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    nodes = bucketed_group_agg(
        edges.map_batches(to_nodes, batch_format="pyarrow"), ["node"], distinct, n_buckets=n_buckets
    ).materialize()
    n = nodes.count()

    def count_out(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("src", as_index=False).agg(outdeg=("dst", "size"))

    outdeg = bucketed_group_agg(edges, ["src"], count_out, n_buckets=n_buckets)
    # attach outdeg to every edge once; each round's join then ships ranks only
    edges_w = bucketed_join(edges, outdeg, on="src", n_buckets=n_buckets).materialize()

    ranks = nodes.map_batches(
        lambda df: df.assign(rank=1.0 / n), batch_format="pandas"
    ).materialize()

    # bucketed_join's pandas phase NaN-pads side-exclusive columns, which
    # coerces an int64 dst to float64; cast the node key back to the edge
    # schema's dtype or int 1 and float 1.0 hash to different buckets and
    # split one node into two groups
    from .common import _arrow_schema

    node_type = _arrow_schema(edges).field("dst").type

    for _ in range(n_iters):
        msgs = bucketed_join(
            edges_w, rename_cols(ranks, {"node": "src"}), on="src", n_buckets=n_buckets
        )

        def contrib(t: pa.Table) -> pa.Table:
            r = t.column("rank").to_numpy()
            od = t.column("outdeg").to_numpy()
            node = t.column("dst")
            if node.type != node_type:
                node = node.cast(node_type)
            return pa.table({"node": node, "c": pa.array(r / od, pa.float64())})

        msgs = msgs.map_batches(contrib, batch_format="pyarrow").materialize()
        contrib_mass = msgs.sum(on="c") or 0.0
        dangling = max(0.0, 1.0 - contrib_mass)

        zero = nodes.map_batches(lambda df: df.assign(c=0.0), batch_format="pandas")
        base = (1.0 - damping) / n + damping * dangling / n

        def sum_contrib(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", as_index=False).agg(c=("c", "sum"))
            g["rank"] = base + damping * g["c"]
            return g[["node", "rank"]]

        ranks = bucketed_group_agg(
            zero.union(msgs), ["node"], sum_contrib, n_buckets=n_buckets
        ).materialize()

    out = ranks.to_pandas().sort_values("node").reset_index(drop=True)
    return out


def pagerank_from_triples(
    triples_ds: "ray.data.Dataset",
    pred: str = "sells",
    n_iters: int = 10,
    n_buckets: int = 32,
) -> pd.DataFrame:
    """PageRank over the undirected projection of one predicate's edge set
    (each triple contributes src→dst and dst→src, so the bipartite
    seller↔product walk mixes instead of parking all mass on sinks).
    Output ranks rounded to 10 decimals for display stability."""
    import pyarrow.compute as pc

    def edges(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("pred"), pred))
        s = t.column("subj").to_pylist()
        o = t.column("obj").to_pylist()
        return pa.table({"src": pa.array(s + o, pa.string()), "dst": pa.array(o + s, pa.string())})

    pr = pagerank(
        triples_ds.map_batches(edges, batch_format="pyarrow"),
        n_buckets=n_buckets,
        n_iters=n_iters,
    )
    pr["rank"] = pr["rank"].round(10)
    return pr


def khop_reachability(
    seeds_ds: "ray.data.Dataset",
    edges_ds: "ray.data.Dataset",
    k: int = 2,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distributed BFS: min-hop distance (<= k) from a seed set over a
    (src, dst) edge Dataset — the bounded graph-traversal primitive next to
    two_hop's fixed two-join shape and CC's run-to-convergence loop. Per
    round: ONE bucketed join (this round's frontier onto edge sources)
    producing depth-(r) neighbor candidates, then ONE bucketed min-groupby
    folding them into the visited labels; the next frontier is exactly the
    nodes whose min-hop equals r (first reached this round), so every edge
    incident to a visited node is expanded at most once per side and the
    exchange volume is frontier-sized, never graph-sized.

    Labels materialize per round (reached-node-sized, the CC convention);
    a cluster run swaps in _cc_checkpointed-style Parquet rounds. Returns
    (node, min_hops) for every node within k hops, seeds at 0."""

    def seed_labels(t: pa.Table) -> pa.Table:
        import numpy as np

        node = t.column("node").to_numpy().astype(np.int64)
        return pa.table(
            {"node": pa.array(node, pa.int64()), "hops": pa.array(np.zeros(len(node), np.int64))}
        )

    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["hops"].min()

    if k > 1:
        # the edge Dataset feeds every round's join; materialize once so the
        # (possibly expensive) edge-building pipeline doesn't re-execute per
        # round. Cluster path: write edges to Parquet once and read per round
        # (the _cc_checkpointed discipline) instead of pinning in the store.
        edges_ds = edges_ds.materialize()

    labels = bucketed_group_agg(
        seeds_ds.map_batches(seed_labels, batch_format="pyarrow"),
        ["node"],
        min_label,
        n_buckets=n_buckets,
    ).materialize()

    frontier = labels  # round 0: all seeds
    for r in range(1, k + 1):
        src_only = rename_cols(frontier.select_columns(["node"]), {"node": "src"})
        nbrs = bucketed_join(src_only, edges_ds, on="src", n_buckets=n_buckets)

        def to_candidates(t: pa.Table, hops: int = r) -> pa.Table:
            import numpy as np

            dst = t.column("dst").to_numpy().astype(np.int64)
            out = pa.table(
                {
                    "node": pa.array(dst, pa.int64()),
                    "hops": pa.array(np.full(len(dst), hops, np.int64)),
                }
            )
            return out

        cand = nbrs.map_batches(to_candidates, batch_format="pyarrow")
        labels = bucketed_group_agg(
            labels.union(cand), ["node"], min_label, n_buckets=n_buckets
        ).materialize()
        frontier = labels.filter(expr=f"hops == {r}")

    return labels


def q99_khop_parts(sf_dir: str, brand: str = "Brand#11", k: int = 2) -> "ray.data.Dataset":
    """BFS over the part co-order graph (edge = two parts share an order,
    the q81/q82 edge stream): min hops (<= 2) from every part of ``brand``.
    The oracle is a DuckDB recursive CTE over the same edge definition.
    Seeds that never co-order anything still appear at hops 0 (they come
    from the part table, not the edge list)."""
    from .common import read_table
    from .relational import _order_part_pairs

    def edge_final(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["part_a", "part_b"]].drop_duplicates()
        return d.rename(columns={"part_a": "a", "part_b": "b"})

    pairs = bucketed_group_agg(
        _order_part_pairs(sf_dir), ["part_a", "part_b"], edge_final, n_buckets=16
    )
    edges = _edges_both_directions(pairs)

    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    seeds = rename_cols(
        parts.filter(expr=f"p_brand == {brand!r}").select_columns(["p_partkey"]),
        {"p_partkey": "node"},
    )

    labels = khop_reachability(seeds, edges, k=k, n_buckets=16)

    def to_out(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "partkey": t.column("node").cast(pa.int64()),
                "min_hops": t.column("hops").cast(pa.int64()),
            }
        )

    return labels.map_batches(to_out, batch_format="pyarrow")


def bipartite_label_propagation(
    edges_ds: "ray.data.Dataset",
    n_buckets: int = 32,
    max_rounds: int = 10,
) -> "ray.data.Dataset":
    """Community detection over a BIPARTITE (src, dst) edge set by
    alternating majority-vote label propagation — the classic LPA
    (Raghavan et al. 2007) with the bipartite fix: synchronous LPA
    oscillates on bipartite graphs (both sides swap labels in lockstep),
    so each round updates one side at a time, Gauss-Seidel style:

      phase A: every dst node adopts the most common CURRENT label among
               its src neighbors (ties → lexicographically smallest label);
      phase B: every src node adopts the most common label among its dst
               neighbors under the phase-A labels.

    Labels start as the src node ids; rounds stop early when no src label
    changes (the change count rides the same exchange — no extra join).
    Each phase is ONE bucketed join (labels onto the edge key) + ONE
    bucketed majority-groupby, the exact shuffle diet of
    connected_components_minlabel; nothing graph-sized touches the driver.
    Deterministic: majority with min-label tie-break, no randomized visit
    order (the classic LPA shuffles node order; a distributed engine wants
    reproducible output, and the planted-community test pins this rule
    against an in-process reference).

    Returns (node, community, side) for both sides — ``community`` is a
    src-side node id. A component with no internal majority structure
    settles to its min src id, so LPA output refines connected components."""
    import numpy as np

    def dedup_edges(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    edges = bucketed_group_agg(
        edges_ds, ["src", "dst"], dedup_edges, n_buckets=n_buckets
    ).materialize()

    def init_src(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates("src")[["src"]]
        return out.assign(label=out["src"])

    src_labels = bucketed_group_agg(edges, ["src"], init_src, n_buckets=n_buckets).materialize()

    def majority(group_key: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            g = (
                df.groupby([group_key, "label"], as_index=False)
                .size()
                .sort_values(
                    [group_key, "size", "label"],
                    ascending=[True, False, True],
                    kind="mergesort",
                )
                .drop_duplicates(group_key)
            )
            return g[[group_key, "label"]]

        return f

    dst_labels = None
    for _ in range(max_rounds):
        # phase A: dst adopts majority of src labels
        msgs_a = bucketed_join(
            edges, src_labels, on="src", n_buckets=n_buckets
        ).select_columns(["dst", "label"])
        dst_labels = bucketed_group_agg(
            msgs_a, ["dst"], majority("dst"), n_buckets=n_buckets
        ).materialize()

        # phase B: src adopts majority of dst labels; old label rides the
        # same exchange (tagged) so the change count needs no second join
        msgs_b = bucketed_join(
            edges, dst_labels, on="dst", n_buckets=n_buckets
        ).select_columns(["src", "label"])

        def tag_new(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(is_old=0)

        def tag_old(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(is_old=1)

        def vote_and_diff(df: pd.DataFrame) -> pd.DataFrame:
            new = majority("src")(df[df["is_old"] == 0])
            old = df[df["is_old"] == 1][["src", "label"]].rename(columns={"label": "old"})
            m = new.merge(old, on="src", how="left")
            m["changed"] = (m["label"] != m["old"]).astype("int64")
            return m[["src", "label", "changed"]]

        merged = msgs_b.map_batches(tag_new, batch_format="pandas").union(
            src_labels.map_batches(tag_old, batch_format="pandas")
        )
        stepped = bucketed_group_agg(
            merged, ["src"], vote_and_diff, n_buckets=n_buckets
        ).materialize()
        n_changed = stepped.sum(on="changed") or 0
        src_labels = stepped.select_columns(["src", "label"]).materialize()
        if n_changed == 0:
            break
    else:
        import warnings

        warnings.warn(
            f"bipartite_label_propagation: labels still moving after "
            f"max_rounds={max_rounds}; communities are the last round's "
            f"(deterministic, but possibly unsettled). Raise max_rounds.",
            RuntimeWarning,
        )

    a = src_labels.map_batches(
        lambda df: df.rename(columns={"src": "node", "label": "community"}).assign(side="src"),
        batch_format="pandas",
    )
    b = dst_labels.map_batches(
        lambda df: df.rename(columns={"dst": "node", "label": "community"}).assign(side="dst"),
        batch_format="pandas",
    )
    return a.union(b)


def communities_from_triples(
    triples_ds: "ray.data.Dataset",
    pred: str = "sells",
    n_buckets: int = 32,
    max_rounds: int = 10,
) -> pd.DataFrame:
    """LPA communities over one predicate's bipartite projection
    (seller ↔ product for 'sells'): which sellers form a market segment by
    offering the same products. Returns (node, community, side) sorted."""
    import pyarrow.compute as pc

    def edges(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("pred"), pred))
        return pa.table(
            {
                "src": t.column("subj").cast(pa.string()),
                "dst": t.column("obj").cast(pa.string()),
            }
        )

    out = bipartite_label_propagation(
        triples_ds.map_batches(edges, batch_format="pyarrow"),
        n_buckets=n_buckets,
        max_rounds=max_rounds,
    ).to_pandas()
    return out.sort_values(["side", "node"], kind="mergesort").reset_index(drop=True)


def reference_bipartite_lpa(edges: "pd.DataFrame", max_rounds: int = 10) -> "pd.DataFrame":
    """In-process single-machine reference for bipartite_label_propagation
    (same alternating majority/min-tie rule, pandas only) — the conformance
    anchor for tests."""
    e = edges.drop_duplicates()
    src_labels = {s: s for s in e["src"].unique()}
    dst_labels: dict = {}
    for _ in range(max_rounds):
        d = e.assign(label=e["src"].map(src_labels))
        g = (
            d.groupby(["dst", "label"], as_index=False)
            .size()
            .sort_values(["dst", "size", "label"], ascending=[True, False, True], kind="mergesort")
            .drop_duplicates("dst")
        )
        dst_labels = dict(zip(g["dst"], g["label"]))
        d2 = e.assign(label=e["dst"].map(dst_labels))
        g2 = (
            d2.groupby(["src", "label"], as_index=False)
            .size()
            .sort_values(["src", "size", "label"], ascending=[True, False, True], kind="mergesort")
            .drop_duplicates("src")
        )
        new = dict(zip(g2["src"], g2["label"]))
        changed = sum(1 for k, v in new.items() if src_labels.get(k) != v)
        src_labels = new
        if changed == 0:
            break
    rows = [{"node": k, "community": v, "side": "src"} for k, v in src_labels.items()]
    rows += [{"node": k, "community": v, "side": "dst"} for k, v in dst_labels.items()]
    return (
        pd.DataFrame(rows)
        .sort_values(["side", "node"], kind="mergesort")
        .reset_index(drop=True)
    )
