"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

``queries()`` exposes one entry per implemented operator/pipeline from
SURVEY.md §2 (plus the training-data additions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one. Column names, rounding
(4 decimals on float aggregates) and tie-breaks match on both sides by
construction. KG-pipeline queries run over deterministic synthetic
transcripts (BASELINE.json input_hint schema) cached under /tmp, since the
transcript table is not one of the driver's pre-registered views — those are
rows-only checks.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from typing import Any

import ray.data


# --------------------------------------------------------------------------
# transcript fixture sizing: match lineitem's rows-per-sf (6M × sf)

def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.001


def transcripts_dir_for(sf_dir: str) -> str:
    from ethiomart_amharic_ner_ray.sources.transcripts import ensure_transcripts

    sf = _sf_of(sf_dir)
    n_turns = max(1000, int(6_000_000 * sf))
    out = f"/tmp/graft_transcripts/sf{sf:g}"
    return ensure_transcripts(out, n_turns, seed=42)


def _transcripts_ds(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(transcripts_dir_for(sf_dir))


# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale: synthetic transcripts (input_hint
    schema) → normalize → extract → link → reassembled conversations →
    deduplicated (subj, pred, obj) triples."""
    from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples

    ds = _transcripts_ds("/root/testdata/sf0.001")
    return kg_triples(ds, n_buckets=16, concurrency=(1, 4))


def _kg_triples(sf_dir: str):
    from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples

    return kg_triples(_transcripts_ds(sf_dir), n_buckets=32, concurrency=(1, 8), with_provenance_struct=False)


def _kg_seller_pagerank(sf_dir: str):
    """Entity importance over the seller↔product 'sells' projection of the
    triple graph — 5 power-iteration rounds of distributed PageRank
    (pipelines/graph.py), each round one bucketed join + one bucketed sum."""
    from ethiomart_amharic_ner_ray.pipelines.graph import pagerank_from_triples

    # 3 rounds keeps the driver sample cheap; the operator itself is
    # round-count-agnostic (tests run it to 12 rounds against the dense
    # reference)
    return pagerank_from_triples(_kg_triples(sf_dir), pred="sells", n_iters=3, n_buckets=8)


def _kg_seller_communities(sf_dir: str):
    """Market-segment communities over the seller↔product 'sells'
    projection — bipartite label propagation (pipelines/graph.py), each
    phase one bucketed join + one bucketed majority-groupby; rows-only
    (iterative algorithm, no SQL form), pinned vs an in-process reference
    in tests/test_graph_rank.py."""
    from ethiomart_amharic_ner_ray.pipelines.graph import communities_from_triples

    return communities_from_triples(_kg_triples(sf_dir), pred="sells", n_buckets=8, max_rounds=6)


def _kg_mentions(sf_dir: str):
    from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions

    ds = build_mentions(_transcripts_ds(sf_dir), concurrency=(1, 8))
    return ds.select_columns(["conv_id", "turn_idx", "seller", "text", "clean_text"])


def _kg_triples_ner(sf_dir: str):
    """Same flagship via the NerScorer actor path (rule backend)."""
    from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples

    ds = _transcripts_ds(sf_dir)
    # cap size: the BIO path is the model-stage stand-in, exercised smaller
    return kg_triples(ds.limit(20000), extractor="ner", link=False, n_buckets=16, concurrency=(1, 8), with_provenance_struct=False)


def _kg_triples_ner_subword(sf_dir: str):
    """Flagship via the full model-scoring dataflow (M9/M10): word-piece
    tokenize → subword label alignment → per-subword predictions →
    first-subword decode → IOB2 repair → mentions → triples. Only the model
    forward pass is a deterministic stand-in (no torch in this container)."""
    from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples

    ds = _transcripts_ds(sf_dir)
    return kg_triples(ds.limit(20000), extractor="ner_subword", link=False, n_buckets=16, concurrency=(1, 8), with_provenance_struct=False)


def _kg_scorecards(sf_dir: str):
    from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions
    from ethiomart_amharic_ner_ray.pipelines.scorecard import seller_scorecards

    # seller_scorecards consumes its input TWICE (turn-stat + mention-stat
    # branches), so hand it a materialized dataset — a lazy actor-pool chain
    # executed by both union branches can deadlock at low CPU counts. The
    # cluster path feeds Parquet-backed mentions instead (no object-store pin).
    mentions = build_mentions(_transcripts_ds(sf_dir), concurrency=(1, 8)).materialize()
    return seller_scorecards(mentions)


def _kg_mention_flags_full(sf_dir: str):
    """All three extractor existence flags from the REAL extraction stage
    (build_mentions → explode_entities), SQL-checked — including
    has_product, whose oracle reproduces the extractor's cut-at-first-
    price/phone + punctuation-strip non-emptiness rule in RE2 (the
    lookbehind-free phone form keeps the preceding non-digit via \\1, which
    matches raw[:match.start()] semantics exactly)."""
    return _kg_exploded_ds(
        sf_dir, ["conv_id", "turn_idx", "has_price", "has_phone", "has_product"]
    )


def _kg_mentions_exploded(sf_dir: str):
    """M4/J1 parity: mentions struct → top-level entity list columns + flags
    (served from the shared exploded-mention checkpoint)."""
    return _kg_exploded_ds(
        sf_dir,
        ["conv_id", "turn_idx", "prices", "phones", "products", "locations",
         "has_price", "has_phone", "has_product"],
    )



_KG_EXPLODED_COLS = [
    "conv_id",
    "turn_idx",
    "seller",
    "prices",
    "phones",
    "products",
    "locations",
    "has_price",
    "has_phone",
    "has_product",
]


def _kg_exploded_checkpoint(sf_dir: str) -> str:
    """Build ONCE per input signature the Parquet checkpoint of the
    exploded-mention pass (normalize → extract → explode), shared by the
    whole kg_* analytics family — the flagship's mentions-checkpoint
    pattern applied to the driver surface: a sweep over N kg_* queries
    pays the extraction corpus pass once, and every query after that is a
    column-pruned Parquet read. Input-signature stamped with the CONTENT
    fingerprint (per-file name + size + mtime + Parquet-footer tail hash,
    state/manifest.content_signature — the flagship's manifest
    discipline), atomically swapped into place from a unique temp dir, so
    a regenerated corpus — even one with byte-identical file sizes — can
    never serve stale mentions, and two concurrent drivers can never race
    on the same staging path. At cluster scale this directory is the
    run's mentions store on shared storage."""
    import json as _json
    import shutil as _sh
    import tempfile as _tf

    from ethiomart_amharic_ner_ray.state.manifest import content_signature

    tdir = transcripts_dir_for(sf_dir)
    sig = "expl-v2|" + content_signature(tdir)
    key = sig.split("|", 1)[1][:16]
    root = "/tmp/graft_kg_exploded"
    dest = os.path.join(root, key)
    marker = os.path.join(dest, "_DONE.json")
    if os.path.exists(marker):
        try:
            if _json.load(open(marker)).get("sig") == sig:
                return dest
        except (ValueError, OSError):
            pass

    from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions
    from ethiomart_amharic_ner_ray.stages.extract import explode_entities

    ds = build_mentions(_transcripts_ds(sf_dir), concurrency=(1, 8))
    ds = ds.map_batches(explode_entities, batch_format="pyarrow")
    ds = ds.select_columns(_KG_EXPLODED_COLS)
    os.makedirs(root, exist_ok=True)
    tmp = _tf.mkdtemp(dir=root, prefix=f".staging-{key}-")
    ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    ).write_parquet(tmp)
    with open(os.path.join(tmp, "_DONE.json"), "w") as f:
        _json.dump({"sig": sig}, f)
    _sh.rmtree(dest, ignore_errors=True)
    try:
        os.replace(tmp, dest)
    except OSError:
        # a concurrent driver completed the same key first — its checkpoint
        # is equivalent (same content signature); drop our staging copy
        _sh.rmtree(tmp, ignore_errors=True)
    return dest


def _kg_exploded_ds(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    """Column-pruned read of the shared exploded-mention checkpoint."""
    return ray.data.read_parquet(_kg_exploded_checkpoint(sf_dir), columns=columns)


def _kg_entity_values_exploded(sf_dir: str, col: str, out_name: str):
    """Exploded canonical mention VALUES as one row per mention — the
    hash-checkable complement of _kg_mention_flags (flags prove existence;
    this proves the extracted/canonicalized values themselves). Flatten is
    a zero-copy Arrow list_flatten + parent-index gather per batch, over
    the SHARED exploded-mention checkpoint (extraction runs once per
    driver sweep, not once per query)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _kg_exploded_ds(sf_dir, ["conv_id", "turn_idx", col])

    def flatten(t: pa.Table) -> pa.Table:
        lst = t.column(col)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        vals = pc.list_flatten(lst)
        parents = pc.list_parent_indices(lst)
        return pa.table(
            {
                "conv_id": pc.take(t.column("conv_id"), parents),
                "turn_idx": pc.take(t.column("turn_idx"), parents),
                out_name: vals,
            }
        )

    return ds.map_batches(flatten, batch_format="pyarrow")


def _kg_prices_exploded(sf_dir: str):
    """Canonical PRICE mention values ('<number> \u1265\u122d', integral floats
    collapsed), one row per extracted mention. Oracle: regexp_extract_all
    over the SQL clean_text + the same comma-strip/collapse/%.10g rules."""
    return _kg_entity_values_exploded(sf_dir, "prices", "price")


def _kg_phones_exploded(sf_dir: str):
    """Canonical PHONE mention values (09-prefixed national form), one row
    per extracted mention. The v2 lookaround pattern (no digit on either
    side) is EXACTLY 'a maximal digit run of the right shape', so the
    RE2-safe oracle extracts maximal [0-9]+ runs and full-matches them —
    equivalent by construction, no lookarounds needed."""
    return _kg_entity_values_exploded(sf_dir, "phones", "phone")



def _kg_price_trajectory(sf_dir: str):
    """Negotiation outcome per conversation: the numeric price in the FIRST
    price-bearing turn vs the LAST (min value within a turn when a turn
    mentions several — a turn_idx-only total order, immune to row order
    and ts corruption), and the delta. Built on the same exploded canonical
    prices the driver already hash-checks; conversations co-locate in one
    conv-bucket shuffle and the first/last selection is two grouped
    conditional lookups."""
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg, round_away

    prices = _kg_entity_values_exploded(sf_dir, "prices", "price")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["price"].str.split(" ").str[0].astype("float64")
        d = pd.DataFrame({"conv_id": df["conv_id"], "turn_idx": df["turn_idx"], "val": v})
        return d.groupby(["conv_id", "turn_idx"], as_index=False)["val"].min()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        t = df.groupby(["conv_id", "turn_idx"], as_index=False)["val"].min()
        b = t.groupby("conv_id", as_index=False).agg(
            first_turn=("turn_idx", "min"), last_turn=("turn_idx", "max")
        )
        b = b.loc[b["first_turn"] < b["last_turn"]]
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype="object"),
                    "first_turn": pd.Series([], dtype="int64"),
                    "last_turn": pd.Series([], dtype="int64"),
                    "first_price": pd.Series([], dtype="float64"),
                    "last_price": pd.Series([], dtype="float64"),
                    "price_delta": pd.Series([], dtype="float64"),
                }
            )
        f = b.merge(
            t.rename(columns={"turn_idx": "first_turn", "val": "fval"}),
            on=["conv_id", "first_turn"],
        ).merge(
            t.rename(columns={"turn_idx": "last_turn", "val": "lval"}),
            on=["conv_id", "last_turn"],
        )
        return pd.DataFrame(
            {
                "conv_id": f["conv_id"],
                "first_turn": f["first_turn"].astype("int64"),
                "last_turn": f["last_turn"].astype("int64"),
                "first_price": round_away(f["fval"].to_numpy(), 4),
                "last_price": round_away(f["lval"].to_numpy(), 4),
                "price_delta": round_away(
                    (f["lval"] - f["fval"]).to_numpy(), 4
                ),
            }
        )

    return bucketed_group_agg(
        prices.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["conv_id"],
        final,
        n_buckets=32,
    )


def _kg_locs_exploded(sf_dir: str):
    """Canonical LOC mention values (gazetteer matches on the folded text,
    canon_text-normalized), one row per mention. Oracle: DuckDB
    translate() reproduces fold_ethiopic's 1:1 codepoint map exactly, and
    the longest-first folded alternation matches the engine's compiled
    pattern alternative-for-alternative."""
    return _kg_entity_values_exploded(sf_dir, "locations", "loc")


def _kg_seller_response_p50(sf_dir: str):
    """Per-seller response-latency SLA rollup: median first-agent-response
    gap (in turns) across the seller's conversations — the scorecard row
    kg_response_latency's per-conv values feed. Latencies live on a small
    integer grid, so per-seller (turns, count) histogram partials ride the
    seller exchange and the exact interpolated median comes off the
    histogram (q145's _wq_interp rule == quantile_cont)."""
    import numpy as np
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg, round_away
    from ethiomart_amharic_ner_ray.pipelines.relational import _wq_interp

    lat = _kg_response_latency(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "seller": df["conv_id"].str.split("-").str[0],
                "turns": df["response_turns"].astype("int64"),
            }
        )
        return d.groupby(["seller", "turns"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["seller", "turns"], as_index=False)["cnt"].sum()
        out = []
        for s, gg in g.sort_values(["seller", "turns"], kind="mergesort").groupby(
            "seller", sort=False
        ):
            v = gg["turns"].to_numpy(dtype=np.float64)
            c = gg["cnt"].to_numpy(dtype=np.int64)
            out.append(
                {
                    "seller": s,
                    "n_convs": int(c.sum()),
                    "p50_turns": float(round_away(np.array([_wq_interp(v, c, 0.5)]), 4)[0]),
                }
            )
        return pd.DataFrame(out).astype({"n_convs": "int64"})

    return bucketed_group_agg(
        lat.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["seller"],
        final,
        n_buckets=8,
    )


def _kg_conv_funnel(sf_dir: str):
    """Conversation-outcome funnel: per seller, how many conversations
    mention a product, then quote a price AT OR AFTER the first product
    turn, then surface a phone number at or after that price — q58's
    ordered-funnel shape on the transcript knowledge graph, with all three
    stage signals coming from SQL-proven extractions (has_* flags /
    exploded mentions). ONE conv-bucket shuffle of the exploded flags;
    in-bucket three cascaded conditional mins per conversation; seller
    partials out."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg
    from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions
    from ethiomart_amharic_ner_ray.stages.extract import explode_entities

    ds = build_mentions(_transcripts_ds(sf_dir), concurrency=(1, 8))
    ds = ds.map_batches(explode_entities, batch_format="pyarrow")
    ds = ds.select_columns(["conv_id", "turn_idx", "has_product", "has_price", "has_phone"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        out = []
        prod = d.loc[d["has_product"]].groupby("conv_id")["turn_idx"].min()
        pr = d.loc[d["has_price"], ["conv_id", "turn_idx"]].merge(
            prod.rename("prod_t"), left_on="conv_id", right_index=True
        )
        pr = pr.loc[pr["turn_idx"] >= pr["prod_t"]].groupby("conv_id")["turn_idx"].min()
        ph = d.loc[d["has_phone"], ["conv_id", "turn_idx"]].merge(
            pr.rename("price_t"), left_on="conv_id", right_index=True
        )
        ph = ph.loc[ph["turn_idx"] >= ph["price_t"]].groupby("conv_id")["turn_idx"].min()
        convs = pd.DataFrame({"conv_id": d["conv_id"].unique()})
        convs["seller"] = convs["conv_id"].str.split("-").str[0]
        convs["s1"] = convs["conv_id"].isin(prod.index).astype("int64")
        convs["s2"] = convs["conv_id"].isin(pr.index).astype("int64")
        convs["s3"] = convs["conv_id"].isin(ph.index).astype("int64")
        g = convs.groupby("seller", as_index=False).agg(
            p_convs=("s1", "size"),
            p_product=("s1", "sum"),
            p_price=("s2", "sum"),
            p_phone=("s3", "sum"),
        )
        return g.astype(
            {"p_convs": "int64", "p_product": "int64", "p_price": "int64", "p_phone": "int64"}
        )

    parts = bucketed_group_agg(ds, ["conv_id"], final, n_buckets=32)

    def reduce_(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("seller", as_index=False).agg(
            n_convs=("p_convs", "sum"),
            n_product=("p_product", "sum"),
            n_price=("p_price", "sum"),
            n_phone=("p_phone", "sum"),
        )
        return g.astype(
            {"n_convs": "int64", "n_product": "int64", "n_price": "int64", "n_phone": "int64"}
        )

    return bucketed_group_agg(parts, ["seller"], reduce_, n_buckets=8)


def _kg_loc_corridors(sf_dir: str):
    """Location co-mention corridors: ordered pairs of DISTINCT gazetteer
    locations appearing in the SAME conversation (delivery-route /
    coverage-area discovery — the loc↔loc edge of the knowledge graph,
    next to kg_seller_loc_matrix's seller↔loc edge). Distinct (conv, loc)
    pairs co-locate per conversation in ONE conv-bucket shuffle; the
    in-bucket pair expansion is quadratic only in the gazetteer-bounded
    per-conv loc set, and pair counts collapse to a gazetteer²-bounded
    exchange."""
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg

    locs = _kg_entity_values_exploded(sf_dir, "locations", "loc")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["conv_id", "loc"]].drop_duplicates()

    def pair_final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["conv_id", "loc"])
        m = d.merge(d, on="conv_id", suffixes=("_a", "_b"))
        m = m.loc[m["loc_a"] < m["loc_b"]]
        g = m.groupby(["loc_a", "loc_b"], as_index=False).size().rename(columns={"size": "p_n"})
        return g.astype({"p_n": "int64"})

    parts = bucketed_group_agg(
        locs.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["conv_id"],
        pair_final,
        n_buckets=32,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["loc_a", "loc_b"], as_index=False)["p_n"].sum()
        return g.rename(columns={"p_n": "n_convs"}).astype({"n_convs": "int64"})

    return bucketed_group_agg(parts, ["loc_a", "loc_b"], final, n_buckets=4)


def _kg_shared_phones(sf_dir: str):
    """Account-linking audit: canonical phone numbers vs the sellers whose
    conversations they appear in — the duplicate-contact fraud screen (one
    operator behind several storefronts), reported as an always-nonempty
    summary: total distinct phones, phones shared across >1 seller, and
    the widest sharing fan-out. Distinct (phone, seller) pairs ride ONE
    phone-bucket shuffle; per-phone distinct-seller counts collapse to a
    3-scalar driver reduce."""
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg

    phones = _kg_entity_values_exploded(sf_dir, "phones", "phone")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"phone": df["phone"], "seller": df["conv_id"].str.split("-").str[0]}
        )
        return d.drop_duplicates()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        g = d.groupby("phone", as_index=False)["seller"].nunique()
        return g.rename(columns={"seller": "ns"}).astype({"ns": "int64"})

    per_phone = bucketed_group_agg(
        phones.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["phone"],
        final,
        n_buckets=16,
    ).to_pandas()
    return pd.DataFrame(
        {
            "n_phones": pd.array([len(per_phone)], dtype="int64"),
            "n_shared": pd.array([int((per_phone["ns"] > 1).sum())], dtype="int64"),
            "max_sellers": pd.array(
                [int(per_phone["ns"].max()) if len(per_phone) else 0], dtype="int64"
            ),
        }
    )


def _kg_conv_len_by_price(sf_dir: str):
    """Conversation length by price outcome: do price-quoting
    conversations run longer or shorter than browsing ones — the
    engagement-vs-conversion readout over the SQL-proven has_price flag.
    Served from the shared exploded-mention checkpoint; one conv-bucket
    two-phase (per-conv turn count + any-price max decided in-bucket),
    two-row output."""
    import numpy as np
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg, round_away

    ds = _kg_exploded_ds(sf_dir, ["conv_id", "turn_idx", "has_price"])

    def per_conv(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("conv_id", as_index=False).agg(
            n_turns=("turn_idx", "size"), quoted=("has_price", "max")
        )
        h = g.groupby("quoted", as_index=False).agg(
            p_convs=("n_turns", "size"), p_turns=("n_turns", "sum")
        )
        return h.astype({"quoted": "bool", "p_convs": "int64", "p_turns": "int64"})

    merged = (
        bucketed_group_agg(ds, ["conv_id"], per_conv, n_buckets=16)
        .to_pandas()
        .groupby("quoted", as_index=False)
        .agg(n_convs=("p_convs", "sum"), t=("p_turns", "sum"))
    )
    merged["avg_turns"] = round_away(
        merged["t"].to_numpy(dtype="float64") / merged["n_convs"].to_numpy(dtype="float64"),
        4,
    )
    return merged.drop(columns=["t"]).astype({"n_convs": "int64"})


def _kg_price_stats_by_product_flag(sf_dir: str):
    """Price statistics split by product co-mention (r5): are extracted
    prices attached to product-carrying turns, or floating free? — the
    extraction-quality health check behind the flagship's price→product
    attachment rule. Composes two SQL-PROVEN pieces (the exploded price
    values of kg_prices_exploded and the has_product flag of
    kg_mention_flags_full) over the shared exploded-mention checkpoint;
    cents are exact int64 (canonical price strings parse back exactly —
    they were printed from these values), partials are (flag, n, Σ, min,
    max), the exchange is 2 rows."""
    import numpy as np
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import round_away

    ds = _kg_exploded_ds(sf_dir, ["conv_id", "turn_idx", "prices", "has_product"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["has_product", "prices"]].explode("prices").dropna(subset=["prices"])
        if d.empty:
            return pd.DataFrame(
                {
                    "has_product": pd.array([], dtype="bool"),
                    "p_n": pd.array([], dtype="int64"),
                    "p_s": pd.array([], dtype="int64"),
                    "p_min": pd.array([], dtype="int64"),
                    "p_max": pd.array([], dtype="int64"),
                }
            )
        vals = d["prices"].str.removesuffix(" ብር").astype("float64").to_numpy()
        cents = round_away(vals * 100, 0).astype(np.int64)
        g = pd.DataFrame({"has_product": d["has_product"].to_numpy(), "c": cents}).groupby(
            "has_product", as_index=False
        )["c"].agg(p_n="size", p_s="sum", p_min="min", p_max="max")
        return g.astype({"p_n": "int64", "p_s": "int64", "p_min": "int64", "p_max": "int64"})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    g = parts.groupby("has_product", as_index=False).agg(
        n=("p_n", "sum"), s=("p_s", "sum"), mn=("p_min", "min"), mx=("p_max", "max")
    )
    return (
        pd.DataFrame(
            {
                "has_product": g["has_product"].astype("bool"),
                "n_prices": g["n"].astype("int64"),
                "mean_price": round_away(
                    (g["s"].to_numpy(dtype="float64") / g["n"].to_numpy(dtype="float64")) / 100.0,
                    4,
                ),
                "min_price": round_away(g["mn"].to_numpy(dtype="float64") / 100.0, 2),
                "max_price": round_away(g["mx"].to_numpy(dtype="float64") / 100.0, 2),
            }
        )
        .sort_values("has_product")
        .reset_index(drop=True)
    )


def _kg_tool_usage_share(sf_dir: str):
    """Tool-usage share per role (r5) — the agentic-transcript
    instrumentation read: what fraction of each role's turns invoked a
    tool (non-empty `tool` column; raw-column analytic like
    kg_turn_balance, so the oracle is a direct recount). Per-batch
    (role, n, n_tool) int64 partials, roles-sized driver merge, share a
    double ratio of exact ints."""
    import numpy as np
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import round_away

    ds = _transcripts_ds(sf_dir).select_columns(["role", "tool"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "role": df["role"],
                "p_n": np.ones(len(df), dtype=np.int64),
                "p_t": (df["tool"].fillna("") != "").to_numpy(dtype=np.int64),
            }
        )
        return d.groupby("role", as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    g = parts.groupby("role", as_index=False).sum()
    return (
        pd.DataFrame(
            {
                "role": g["role"],
                "n_turns": g["p_n"].astype("int64"),
                "n_tool": g["p_t"].astype("int64"),
                "tool_share": round_away(
                    g["p_t"].to_numpy(dtype="float64") / g["p_n"].to_numpy(dtype="float64"), 6
                ),
            }
        )
        .sort_values("role")
        .reset_index(drop=True)
    )


def _kg_turn_balance(sf_dir: str):
    """Seller-dominance histogram (r5): per conversation the seller share
    of turns in integer DECILES — floor(10·s/t), 0..10, where the ==10 bin
    is the seller monologue and 0..2 is the ignored-seller tail; the
    conversation-health shape q(kg_conv_funnel) reads per stage, read here
    per dialogue. Works on the RAW role column (no extraction), so the
    oracle is a direct SQL recount. ONE conv-bucket shuffle; per bucket an
    11-row decile partial; decile is a floor division of non-negative
    ints, where DuckDB's truncating // coincides with Python's floor."""
    import numpy as np
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg

    ds = _transcripts_ds(sf_dir).select_columns(["conv_id", "role"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.assign(is_s=(df["role"] == "seller").astype("int64"))
        g = d.groupby("conv_id", as_index=False).agg(t=("is_s", "size"), s=("is_s", "sum"))
        dec = (10 * g["s"].to_numpy(dtype=np.int64)) // g["t"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({"decile": dec}).groupby("decile", as_index=False).size()
        return out.rename(columns={"size": "p_n"}).astype({"decile": "int64", "p_n": "int64"})

    parts = bucketed_group_agg(ds, ["conv_id"], final, n_buckets=32).to_pandas()
    merged = parts.groupby("decile", as_index=False)["p_n"].sum()
    return pd.DataFrame(
        {"decile": merged["decile"].astype("int64"), "n_convs": merged["p_n"].astype("int64")}
    )


def _kg_role_transitions(sf_dir: str):
    """Dialogue-structure statistic: the (prev-role → next-role) transition
    matrix over turn_idx-ordered conversations, with per-source-role
    probabilities — q97's user-sequence Markov shape applied to the
    transcript stream (who talks after whom; a buyer→buyer spike means
    unanswered customers). ONE conv-bucket shuffle, in-bucket vectorized
    grouped shift, ≤ |roles|² partial rows per bucket."""
    import numpy as np
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg, round_away

    ds = _transcripts_ds(sf_dir).select_columns(["conv_id", "turn_idx", "role"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = d["conv_id"].to_numpy()
        role = d["role"].to_numpy()
        same = conv[1:] == conv[:-1]
        g = pd.DataFrame(
            {"from_role": role[:-1][same], "to_role": role[1:][same]}
        )
        out = g.groupby(["from_role", "to_role"], as_index=False).size().rename(
            columns={"size": "p_n"}
        )
        return out.astype({"p_n": "int64"})

    parts = bucketed_group_agg(ds, ["conv_id"], final, n_buckets=32)

    def reduce_(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["from_role", "to_role"], as_index=False)["p_n"].sum()
        tot = g.groupby("from_role")["p_n"].transform("sum")
        return pd.DataFrame(
            {
                "from_role": g["from_role"],
                "to_role": g["to_role"],
                "n": g["p_n"].astype("int64"),
                "p": round_away(
                    g["p_n"].to_numpy(dtype=np.float64) / tot.to_numpy(dtype=np.float64), 6
                ),
            }
        )

    return bucketed_group_agg(parts, ["from_role"], reduce_, n_buckets=2)


def _kg_seller_price_cv(sf_dir: str):
    """Pricing-volatility scorecard row: per-seller coefficient of
    variation of quoted prices (sample std / mean) — the consistency
    signal the lending score's price-stability factor abstracts. Exact
    int64 cents sufficient statistics (n, Σ, Σ²) ride a seller-sized
    exchange; std and CV evaluate from the exact integers with the same
    expression in the SQL oracle. Sellers with < 2 quotes are excluded
    (sample std undefined). Overflow bound: cents² sums stay inside int64
    while per-seller Σcents² < 9.2e18 (prices to ~1e8 cents across ~1e4
    quotes); beyond that, split the partial into (hi, lo) 64-bit limbs or
    move to the q184 exact-Python-int reduction — DuckDB's side promotes
    to HUGEINT automatically, so the engine must widen FIRST."""
    import numpy as np
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg, round_away

    prices = _kg_entity_values_exploded(sf_dir, "prices", "price")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["price"].str.split(" ").str[0].astype("float64")
        # round_away, not np.rint: free-text prices have arbitrary decimals
        # (not the 2dp TPC-H grid), and DuckDB round() is half-away-from-zero
        cents = round_away(v.to_numpy() * 100, 0).astype(np.int64)
        d = pd.DataFrame(
            {
                "seller": df["conv_id"].str.split("-").str[0],
                "c": cents,
                "c2": cents * cents,
            }
        )
        return d.groupby("seller", as_index=False).agg(
            p_n=("c", "size"), p_s=("c", "sum"), p_s2=("c2", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("seller", as_index=False).agg(
            n=("p_n", "sum"), s=("p_s", "sum"), s2=("p_s2", "sum")
        )
        g = g.loc[g["n"] >= 2]
        n = g["n"].to_numpy(dtype=np.float64)
        s = g["s"].to_numpy(dtype=np.float64)
        s2 = g["s2"].to_numpy(dtype=np.float64)
        var = (s2 - s * s / n) / (n - 1.0)
        mean = s / n
        cv = np.sqrt(var) / mean
        return pd.DataFrame(
            {
                "seller": g["seller"],
                "n_prices": g["n"].astype("int64"),
                "price_cv": round_away(cv, 6),
            }
        )

    return bucketed_group_agg(
        prices.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["seller"],
        final,
        n_buckets=8,
    )


def _kg_seller_loc_matrix(sf_dir: str):
    """Market-presence matrix: mention counts per (seller, location) — the
    aggregated located_in edge weight of the knowledge graph,
    independently hash-checked now that the LOC gazetteer extraction has a
    SQL oracle (kg_locs_exploded). One two-phase count over the exploded
    mentions; output bounded by sellers x gazetteer."""
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg

    locs = _kg_entity_values_exploded(sf_dir, "locations", "loc")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"seller": df["conv_id"].str.split("-").str[0], "loc": df["loc"]})
        return d.groupby(["seller", "loc"], as_index=False).size().rename(columns={"size": "p_n"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["seller", "loc"], as_index=False)["p_n"].sum()
        return g.rename(columns={"p_n": "n_mentions"}).astype({"n_mentions": "int64"})

    return bucketed_group_agg(
        locs.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["seller", "loc"],
        final,
        n_buckets=8,
    )


def _kg_price_by_location(sf_dir: str):
    """Price geography: for each gazetteer location, the count and mean of
    prices quoted in conversations that mention that location — the
    cross-entity-type JOIN analytic over the knowledge graph (both
    extractions independently SQL-proven; this checks their composition).
    Distinct (conv, loc) pairs and per-conv price-cents partials meet in
    ONE conv-bucketed join whose merge_fn emits gazetteer-bounded (loc,
    sum_cents, n) partials; exact int64 cents, one final division."""
    import numpy as np
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import (
        bucketed_group_agg,
        bucketed_join,
        round_away,
    )

    locs = _kg_entity_values_exploded(sf_dir, "locations", "loc")
    prices = _kg_entity_values_exploded(sf_dir, "prices", "price")

    def loc_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["conv_id", "loc"]].drop_duplicates()

    def price_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["price"].str.split(" ").str[0].astype("float64")
        d = pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                # round_away matches DuckDB round() on arbitrary-decimal
                # free-text prices (np.rint banker's-rounds .5 cents away)
                "cents": round_away(v.to_numpy() * 100, 0).astype(np.int64),
            }
        )
        return d.groupby("conv_id", as_index=False).agg(
            p_sum=("cents", "sum"), p_n=("cents", "size")
        )

    lp = locs.map_batches(loc_partial, batch_format="pandas", batch_size=65536)
    pp = prices.map_batches(price_partial, batch_format="pandas", batch_size=65536)

    def merge_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        l = left.drop_duplicates(["conv_id", "loc"])
        r = right.groupby("conv_id", as_index=False).agg(
            p_sum=("p_sum", "sum"), p_n=("p_n", "sum")
        )
        m = l.merge(r, on="conv_id")
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "loc": pd.Series([], dtype="object"),
                    "p_sum": pd.Series([], dtype="int64"),
                    "p_n": pd.Series([], dtype="int64"),
                }
            )
        return m.groupby("loc", as_index=False).agg(p_sum=("p_sum", "sum"), p_n=("p_n", "sum"))

    parts = bucketed_join(lp, pp, on="conv_id", n_buckets=32, merge_fn=merge_fn)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("loc", as_index=False).agg(s=("p_sum", "sum"), n=("p_n", "sum"))
        return pd.DataFrame(
            {
                "loc": g["loc"],
                "n_prices": g["n"].astype("int64"),
                "avg_price": round_away(
                    (g["s"].to_numpy(dtype=np.float64) / 100.0)
                    / g["n"].to_numpy(dtype=np.float64),
                    4,
                ),
            }
        )

    return bucketed_group_agg(parts, ["loc"], final, n_buckets=4)


def _kg_tool_assisted_pricing(sf_dir: str):
    """Tool-call attribution per seller: of the conversations that quote a
    price, how many consulted a tool (non-empty `tool` turn) BEFORE the
    first price turn — the does-the-agent-check-the-catalog audit over the
    transcript stream. Per-conv first-price-turn comes from the exploded
    canonical prices (driver-hash-checked extraction); per-conv first-tool
    -turn is a grouped conditional min over the raw stream; the two
    conv-keyed scalars meet in ONE conv-bucketed join whose merge_fn
    emits seller-bounded partials (LEFT semantics: price-convs without any
    tool call stay counted)."""
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import (
        bucketed_group_agg,
        bucketed_join,
        round_away,
    )

    prices = _kg_entity_values_exploded(sf_dir, "prices", "price")

    def price_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("conv_id", as_index=False)["turn_idx"]
            .min()
            .rename(columns={"turn_idx": "price_turn"})
        )

    pt = prices.map_batches(price_partial, batch_format="pandas", batch_size=65536)

    tx = _transcripts_ds(sf_dir).select_columns(["conv_id", "turn_idx", "tool"])

    def tool_partial(df: pd.DataFrame) -> pd.DataFrame:
        # notna() first: SQL `tool <> ''` excludes NULLs (three-valued
        # logic), while pandas `NaN != ""` is True
        d = df.loc[df["tool"].notna() & (df["tool"] != "")]
        return (
            d.groupby("conv_id", as_index=False)["turn_idx"]
            .min()
            .rename(columns={"turn_idx": "tool_turn"})
        )

    tt = tx.map_batches(tool_partial, batch_format="pandas", batch_size=65536)

    def merge_fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        lp = left.groupby("conv_id", as_index=False)["price_turn"].min()
        rp = right.groupby("conv_id", as_index=False)["tool_turn"].min()
        m = lp.merge(rp, on="conv_id", how="left")
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "seller": pd.Series([], dtype="object"),
                    "p_convs": pd.Series([], dtype="int64"),
                    "p_tool": pd.Series([], dtype="int64"),
                }
            )
        m["seller"] = m["conv_id"].str.split("-").str[0]
        m["before"] = (
            m["tool_turn"].notna() & (m["tool_turn"] < m["price_turn"])
        ).astype("int64")
        g = m.groupby("seller", as_index=False).agg(
            p_convs=("before", "size"), p_tool=("before", "sum")
        )
        return g.astype({"p_convs": "int64", "p_tool": "int64"})

    parts = bucketed_join(pt, tt, on="conv_id", n_buckets=32, merge_fn=merge_fn)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("seller", as_index=False).agg(
            n_price_convs=("p_convs", "sum"), n_tool_before=("p_tool", "sum")
        )
        return pd.DataFrame(
            {
                "seller": g["seller"],
                "n_price_convs": g["n_price_convs"].astype("int64"),
                "n_tool_before": g["n_tool_before"].astype("int64"),
                "share": round_away(
                    g["n_tool_before"].to_numpy(dtype="float64")
                    / g["n_price_convs"].to_numpy(dtype="float64"),
                    6,
                ),
            }
        )

    return bucketed_group_agg(parts, ["seller"], final, n_buckets=8)


def _ann_ivf_partitioned(sf_dir: str):
    """Partition-pruned IVF: build the list_id-partitioned index once per
    fixture under /tmp (idempotent rebuild), then query reading ONLY the
    probed partitions. Rows-only (ANN semantics; exactness at
    nprobe=n_lists is pinned by tests against q16)."""
    import os
    import shutil

    from ethiomart_amharic_ner_ray.pipelines import similarity

    idx = f"/tmp/graft_ivf_index/{os.path.basename(os.path.normpath(sf_dir))}"
    if not os.path.exists(os.path.join(idx, "_centroids.parquet")):
        shutil.rmtree(idx, ignore_errors=True)
        similarity.ivf_build_index(sf_dir, idx, n_lists=16, iters=5, seed=42)
    return similarity.ann_ivf_partitioned_topk(sf_dir, idx, query_id=0, k=10, nprobe=4)


def _kg_price_redact(sf_dir: str):
    """PII-style redaction over raw transcript turns, hash-checked: price
    mentions → '<PRICE>' sentinel, per-turn redaction count + md5 of the
    redacted text. Engine and oracle run the IDENTICAL RE2 pattern
    (pyarrow's regex engine and DuckDB's are both RE2), so the check pins
    engine-level parity of the scrubbing pass."""
    from ethiomart_amharic_ner_ray.pipelines.textstats import price_redact_batch

    return _transcripts_ds(sf_dir).map_batches(price_redact_batch, batch_format="pyarrow")


def _kg_clean_text(sf_dir: str):
    """M1 normalize, hash-checked corpus-wide: the engine's clean_text_v1
    output per turn vs a DuckDB regexp chain reproducing the exact order of
    operations (price sub → URL strip → non-word strip → ws collapse).
    RE2's \\w is ASCII-only, so the oracle uses [\\p{L}\\p{N}_] — verified
    equal to Python's unicode \\w over this corpus's alphabet."""
    from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions

    ds = build_mentions(_transcripts_ds(sf_dir), concurrency=(1, 8))
    return ds.select_columns(["conv_id", "turn_idx", "clean_text"])


def _kg_mention_flags(sf_dir: str):
    """M4 flag semantics, hash-checked: per-turn has_price / has_phone from
    the exploded mention lists vs DuckDB regexp existence over the SQL
    clean_text (the phone oracle rewrites the v2 lookarounds — RE2 has
    none — as the equivalent bounded-context alternation)."""
    return _kg_exploded_ds(sf_dir, ["conv_id", "turn_idx", "has_price", "has_phone"])


def _kg_seller_price_stats(sf_dir: str):
    """Extraction → canonicalization → two-phase aggregation, hash-checked:
    per-seller PRICE mention count + mean amount over the flat mention rows
    (per-batch partial sums, one bucketed reduce). The oracle re-extracts
    amounts with the same regex over the SQL clean_text and averages in
    DuckDB — a 4-decimal round on both sides absorbs summation order."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg, round_away
    from ethiomart_amharic_ner_ray.pipelines.kg import build_flat

    flat = build_flat(_transcripts_ds(sf_dir), concurrency=(1, 8))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("etype"), "PRICE"))
        if t.num_rows == 0:
            return pa.table(
                {
                    "seller": pa.array([], pa.string()),
                    "s": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # norm is the canonical "<amount> ብር"; the numeric value is the
        # prefix (canon_price is lossless for regex-matched amounts)
        vals = pc.cast(
            pc.replace_substring_regex(t.column("norm"), pattern=r" ብር$", replacement=""),
            pa.float64(),
        )
        df = pd.DataFrame({"seller": t.column("seller").to_pylist(), "v": vals.to_numpy()})
        g = df.groupby("seller", as_index=False).agg(s=("v", "sum"), n=("v", "size"))
        return pa.Table.from_pandas(g.astype({"n": "int64"}), preserve_index=False)

    partials = flat.map_batches(partial, batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("seller", as_index=False).agg(s=("s", "sum"), n=("n", "sum"))
        g["avg_price"] = round_away((g["s"] / g["n"]).to_numpy(), 4)
        return g.rename(columns={"n": "n_prices"})[["seller", "n_prices", "avg_price"]].astype(
            {"n_prices": "int64"}
        )

    return bucketed_group_agg(partials, ["seller"], final, n_buckets=32)


def _kg_text_equality(sf_dir: str):
    """North-rule invariant, driver-hash-checked: per-turn text survives the
    normalize + extract stages byte-for-byte (the oracle reads the raw
    transcript parquet directly)."""
    from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions

    ds = build_mentions(_transcripts_ds(sf_dir), concurrency=(1, 8))
    return ds.select_columns(["conv_id", "turn_idx", "text"])


def _kg_turn_context(sf_dir: str):
    """Per-turn context window (2 preceding turns + own text, per conv) —
    the model-input assembly stage, hash-checked against a DuckDB window
    string_agg over the same transcript parquet."""
    from ethiomart_amharic_ner_ray.pipelines.windows import conv_context

    return conv_context(_transcripts_ds(sf_dir), k=2)


def _kg_turns_per_conv(sf_dir: str):
    """Conversation grouping check: per-conv turn count + max turn_idx
    (SQL-checked over the same cached transcript parquet)."""
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg

    ds = _transcripts_ds(sf_dir).select_columns(["conv_id", "turn_idx"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("conv_id", as_index=False).agg(
            n_turns=("turn_idx", "size"), max_turn=("turn_idx", "max")
        )
        return g.astype({"n_turns": "int64", "max_turn": "int64"})

    return bucketed_group_agg(ds, ["conv_id"], final, n_buckets=32)


def _kg_response_latency(sf_dir: str):
    """First-agent-response latency per conversation, measured in TURNS
    (turn_idx is authoritative ordering; ts is corruptible — the flagship's
    own invariant): for each conversation with a buyer turn followed by an
    agent turn, the turn-index gap between the first buyer turn and the
    first agent turn after it. One conv-bucket shuffle, in-bucket grouped
    conditional mins — the support-SLA metric over the transcript table."""
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg

    ds = _transcripts_ds(sf_dir).select_columns(["conv_id", "turn_idx", "role"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        b = (
            df.loc[df["role"] == "buyer"]
            .groupby("conv_id")["turn_idx"]
            .min()
            .rename("b_idx")
        )
        a = df.loc[df["role"] == "agent", ["conv_id", "turn_idx"]].merge(
            b, left_on="conv_id", right_index=True, how="inner"
        )
        a = a.loc[a["turn_idx"] > a["b_idx"]]
        if len(a) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype="object"),
                    "response_turns": pd.Series([], dtype="int64"),
                }
            )
        g = a.groupby("conv_id", as_index=False).agg(
            a_idx=("turn_idx", "min"), b_idx=("b_idx", "first")
        )
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"],
                "response_turns": (g["a_idx"] - g["b_idx"]).astype("int64"),
            }
        )

    return bucketed_group_agg(ds, ["conv_id"], final, n_buckets=32)


def _kg_seller_turncounts(sf_dir: str):
    """Seller derivation check (conv_id prefix before '-'), SQL-checked via
    split_part."""
    import pandas as pd

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg
    from ethiomart_amharic_ner_ray.stages.extract import derive_seller

    ds = _transcripts_ds(sf_dir).select_columns(["conv_id"])
    ds = ds.map_batches(derive_seller, batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("seller", as_index=False).agg(n_turns=("seller", "size"))
        return g.astype({"n_turns": "int64"})

    return bucketed_group_agg(ds, ["seller"], final, n_buckets=32)


def _kg_product_price_paths(sf_dir: str):
    """KG consumption: two-hop traversal seller -sells-> product
    -priced_at-> price over the flagship triples (graph query as one
    bucketed join; rows-only)."""
    from ethiomart_amharic_ner_ray.pipelines.graph import two_hop
    from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples

    triples = kg_triples(
        _transcripts_ds(sf_dir), n_buckets=32, concurrency=(1, 8), with_provenance_struct=False
    ).materialize()
    return two_hop(triples, "sells", "priced_at")


def _kg_product_price_paths_capped(sf_dir: str):
    """Skew-bounded variant of the two-hop traversal: max_paths_per_mid
    caps a super-connected product's join group at 100 deterministic
    min-k paths (per-batch partial thinning before the shuffle, trim in
    the group). Output is a rerun-stable subset of the uncapped paths;
    this entry keeps the cap on the driver's sampled surface."""
    from ethiomart_amharic_ner_ray.pipelines.graph import two_hop
    from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples

    triples = kg_triples(
        _transcripts_ds(sf_dir), n_buckets=32, concurrency=(1, 8), with_provenance_struct=False
    ).materialize()
    return two_hop(triples, "sells", "priced_at", max_paths_per_mid=100)


def _kg_extractor_disagreement(sf_dir: str):
    """T3-adjacent diagnostics (reference interpret failure-case analysis):
    per-predicate agreement between the regex and NER extraction paths on
    the same input — n_both / n_regex_only / n_ner_only / jaccard. The NER
    path legitimately diverges where IOB2 repair (SKU demotion) splits
    spans; this report quantifies exactly where.

    Fully distributed (no driver set comparison, no input cap): each
    side's triple set is tagged with presence flags, both ride ONE
    bucketed shuffle on (pred, subj, obj), presence is merged per triple
    inside its bucket and pre-aggregated to per-(bucket, pred) counts —
    the driver only ever sees <= n_buckets x n_preds partial count rows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ethiomart_amharic_ner_ray.pipelines.common import bucketed_group_agg, round_away
    from ethiomart_amharic_ner_ray.pipelines.kg import kg_triples

    ds = _transcripts_ds(sf_dir)
    rx = kg_triples(ds, extractor="regex", link=False, n_buckets=16, concurrency=(1, 8), with_provenance_struct=False)
    nr = kg_triples(ds, extractor="ner", link=False, n_buckets=16, concurrency=(1, 8), with_provenance_struct=False)

    def tag(in_rx: int):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "pred": t.column("pred"),
                    "subj": t.column("subj"),
                    "obj": t.column("obj"),
                    "in_rx": pa.array(np.full(n, in_rx, np.int8)),
                    "in_ner": pa.array(np.full(n, 1 - in_rx, np.int8)),
                }
            )

        return f

    # materialize each tagged side before the union: one streaming job
    # double-driving two lazy actor-pool chains off the same scan can
    # deadlock at low CPU counts (and re-extracts the corpus twice). The
    # cluster path Parquet-checkpoints each side like run_kg_pipeline.
    u = (
        rx.map_batches(tag(1), batch_format="pyarrow")
        .materialize()
        .union(nr.map_batches(tag(0), batch_format="pyarrow").materialize())
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["pred", "subj", "obj"], as_index=False)[["in_rx", "in_ner"]].max()
        g["n_both"] = ((g["in_rx"] == 1) & (g["in_ner"] == 1)).astype("int64")
        g["n_regex_only"] = ((g["in_rx"] == 1) & (g["in_ner"] == 0)).astype("int64")
        g["n_ner_only"] = ((g["in_rx"] == 0) & (g["in_ner"] == 1)).astype("int64")
        return g.groupby("pred", as_index=False)[["n_both", "n_regex_only", "n_ner_only"]].sum()

    partials = bucketed_group_agg(u, ["pred", "subj", "obj"], per_bucket, n_buckets=32)
    out = partials.to_pandas()  # aggregate-sized: <= n_buckets x n_preds rows
    out = out.groupby("pred", as_index=False)[["n_both", "n_regex_only", "n_ner_only"]].sum()
    union = out["n_both"] + out["n_regex_only"] + out["n_ner_only"]
    out["jaccard"] = [
        round_away(b / u, 4) if u else 1.0 for b, u in zip(out["n_both"], union)
    ]
    return out.sort_values("pred").reset_index(drop=True)[
        ["pred", "n_both", "n_regex_only", "n_ner_only", "jaccard"]
    ]


def _kg_pr_report(sf_dir: str):
    """A9 full parity: per-entity-type P/R/F1/support report of the engine's
    distributed mention extraction vs the sequential reference oracle
    (the seqeval-classification-report analogue; rows-only check — the
    report itself IS the metric)."""
    import glob

    import pyarrow.parquet as pq

    from ethiomart_amharic_ner_ray.oracle import oracle_mentions, per_type_report
    from ethiomart_amharic_ner_ray.pipelines.kg import build_flat

    tx = transcripts_dir_for(sf_dir)
    flat = build_flat(ray.data.read_parquet(tx), concurrency=(1, 8))
    eng = flat.select_columns(["conv_id", "turn_idx", "etype", "norm"]).to_pandas()
    gold = oracle_mentions(pq.read_table(sorted(glob.glob(tx + "/*.parquet"))))
    return per_type_report(eng, gold)


def _labeling_prepared(sf_dir: str):
    from ethiomart_amharic_ner_ray.pipelines.labeling import (
        prepare_labeled,
        sentences_from_transcripts,
    )

    return prepare_labeled(sentences_from_transcripts(_transcripts_ds(sf_dir)))


def _labeling_checkpoint(sf_dir: str) -> str:
    """Shared labeling-family checkpoint (r5, VERDICT task 2): ONE
    normalize → rule-tag → repair/validate/split pass, persisted as BOTH a
    ``prepared/`` Parquet table (tokens/tags/split/n_tokens — what the
    distributed counters consume) and a ``conll/`` shard export (S9's
    atomic writer — what the SQL oracle reads back with string_split +
    unnest). Content-signature keyed like the exploded-mention checkpoint,
    atomically swapped from a mkdtemp staging dir. The A6/A7 oracle
    compare is therefore a genuine round-trip gate: the distributed
    Counter/groupby partials over the Parquet side must agree exactly with
    DuckDB's recount of the exported CoNLL text."""
    import json as _json
    import shutil as _sh
    import tempfile as _tf

    from ethiomart_amharic_ner_ray.pipelines.labeling import export_conll
    from ethiomart_amharic_ner_ray.state.manifest import content_signature

    tdir = transcripts_dir_for(sf_dir)
    sig = "conll-v1|" + content_signature(tdir)
    key = sig.split("|", 1)[1][:16]
    root = "/tmp/graft_conll"
    dest = os.path.join(root, key)
    marker = os.path.join(dest, "_DONE.json")
    if os.path.exists(marker):
        try:
            if _json.load(open(marker)).get("sig") == sig:
                return dest
        except (ValueError, OSError):
            pass

    os.makedirs(root, exist_ok=True)
    tmp = _tf.mkdtemp(dir=root, prefix=f".staging-{key}-")
    prepared = _labeling_prepared(sf_dir)
    prepared.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    ).write_parquet(os.path.join(tmp, "prepared"))
    export_conll(
        ray.data.read_parquet(os.path.join(tmp, "prepared")),
        os.path.join(tmp, "conll"),
    )
    with open(os.path.join(tmp, "_DONE.json"), "w") as f:
        _json.dump({"sig": sig}, f)
    _sh.rmtree(dest, ignore_errors=True)
    try:
        os.replace(tmp, dest)
    except OSError:
        _sh.rmtree(tmp, ignore_errors=True)  # concurrent driver won the key
    return dest


def _labeling_tag_distribution(sf_dir: str):
    from ethiomart_amharic_ner_ray.pipelines.labeling import tag_distribution

    return tag_distribution(
        ray.data.read_parquet(
            os.path.join(_labeling_checkpoint(sf_dir), "prepared"), columns=["tags"]
        )
    )


def _labeling_quality_report(sf_dir: str):
    from ethiomart_amharic_ner_ray.pipelines.labeling import quality_report

    return quality_report(
        ray.data.read_parquet(
            os.path.join(_labeling_checkpoint(sf_dir), "prepared"),
            columns=["tags", "split", "n_tokens"],
        )
    )


def _export_sorted_ranges(sf_dir: str):
    from ethiomart_amharic_ner_ray.pipelines.export import export_sorted_ranges

    return export_sorted_ranges(sf_dir)


def _export_shuffled_shards(sf_dir: str):
    from ethiomart_amharic_ner_ray.pipelines.export import export_shuffled_shards

    return export_shuffled_shards(sf_dir)


def _export_zorder(sf_dir: str):
    from ethiomart_amharic_ner_ray.pipelines.export import export_zorder

    return export_zorder(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from ethiomart_amharic_ner_ray.pipelines import (
        bpe,
        classifier,
        curate,
        dedup,
        graph,
        multimodal,
        relational,
        scorecard,
        similarity,
        sketches,
        textstats,
        tokenize_export,
        windows,
    )

    return {
        # relational / aggregation (SQL-checked)
        "q01_pricing_summary": relational.q01_pricing_summary,
        "q02_filter_orders": relational.q02_filter_orders,
        "q03_segment_revenue": relational.q03_segment_revenue,
        "q04_region_rollup": relational.q04_region_rollup,
        "q05_topk_parts": relational.q05_topk_parts,
        "q06_events_daily": relational.q06_events_daily,
        "q19_event_type_counts": relational.q19_event_type_counts,
        "q20_supplier_nation": relational.q20_supplier_nation,
        # scorecard metrics (reference A1-A5 semantics, SQL-checked)
        "q07_user_engagement": scorecard.q07_user_engagement,
        "q08_user_activity": scorecard.q08_user_activity,
        "q09_user_value_stats": scorecard.q09_user_value_stats,
        "q10_lending_score": scorecard.q10_lending_score,
        # text analysis (SQL-checked)
        "q12_token_count": textstats.q12_token_count,
        "q13_quality_score": textstats.q13_quality_score,
        "q14_lang_id": textstats.q14_lang_id,
        "q15_doc_fingerprint": textstats.q15_doc_fingerprint,
        "q26_bpe_token_estimate": textstats.q26_bpe_token_estimate,
        # dedup / similarity (SQL-checked baselines)
        "q11_dedup_exact": dedup.q11_dedup_exact,
        "q16_knn_cosine": similarity.q16_knn_cosine,
        # stream-shaped (SQL-checked)
        "q17_asof_last_signup": windows.q17_asof_last_signup,
        "q18_hourly_windows": windows.q18_hourly_windows,
        "q21_sessionize": windows.q21_sessionize,
        "q27_range_join_count": windows.q27_range_join_count,
        "q28_sliding_windows": windows.q28_sliding_windows,
        "q62_asof_join": windows.q62_asof_join,
        # joins / per-group top-k / temporal trend (SQL-checked)
        "q22_customers_without_orders": relational.q22_customers_without_orders,
        "q29_deterministic_sample": relational.q29_deterministic_sample,
        "q30_distinct_pairs": relational.q30_distinct_pairs,
        "q34_stratified_sample": relational.q34_stratified_sample,
        "q36_event_lag_stats": windows.q36_event_lag_stats,
        "q37_cumulative_spend": windows.q37_cumulative_spend,
        "q38_brand_price_rank": relational.q38_brand_price_rank,
        "q39_order_size_corr": relational.q39_order_size_corr,
        "q40_brand_median_price": relational.q40_brand_median_price,
        "q41_user_modal_event": relational.q41_user_modal_event,
        "q42_weekly_active_users": relational.q42_weekly_active_users,
        "q43_bloom_semi_join": relational.q43_bloom_semi_join,
        "q44_region_rollup_totals": relational.q44_region_rollup_totals,
        "q45_json_props_stats": relational.q45_json_props_stats,
        "q35_vocab_topk": textstats.q35_vocab_topk,
        "q46_brand_type_concat": relational.q46_brand_type_concat,
        "q47_users_both_events": relational.q47_users_both_events,
        "q48_brand_price_quantiles": relational.q48_brand_price_quantiles,
        "q49_above_avg_orders": relational.q49_above_avg_orders,
        "q50_region_priority_grid": relational.q50_region_priority_grid,
        "q51_first_last_event": relational.q51_first_last_event,
        "q52_bigram_topk": textstats.q52_bigram_topk,
        "q53_tfidf_topk": textstats.q53_tfidf_topk,
        "q54_decontaminate": textstats.q54_decontaminate,
        "q55_value_histogram": relational.q55_value_histogram,
        "q56_customer_bigorder_stats": relational.q56_customer_bigorder_stats,
        "q57_segment_lineitem_revenue": relational.q57_segment_lineitem_revenue,
        "q58_funnel_stages": relational.q58_funnel_stages,
        "q59_cohort_retention": relational.q59_cohort_retention,
        "q60_spend_deciles": relational.q60_spend_deciles,
        "q61_weighted_sample": relational.q61_weighted_sample,
        "q63_token_repetition": textstats.q63_token_repetition,
        "q64_order_count_histogram": relational.q64_order_count_histogram,
        "q65_weekly_change": relational.q65_weekly_change,
        "q66_quality_funnel": textstats.q66_quality_funnel,
        "q67_shared_shingles": textstats.q67_shared_shingles,
        "q68_doc_chunks": textstats.q68_doc_chunks,
        "q69_oov_rate": textstats.q69_oov_rate,
        "q70_event_zscore": relational.q70_event_zscore,
        "q71_jaccard_pairs_exact": dedup.jaccard_pairs_exact,
        "q72_dedup_survivors": dedup.q72_dedup_survivors,
        "q73_event_debounce": windows.q73_event_debounce,
        "q74_bigram_pmi": textstats.q74_bigram_pmi,
        "q75_char_entropy": textstats.q75_char_entropy,
        "q76_order_cube": relational.q76_order_cube,
        "q77_moving_avg": windows.q77_moving_avg,
        "q78_lineitem_melt": relational.q78_lineitem_melt,
        "q79_event_type_share": relational.q79_event_type_share,
        "q80_unigram_logppl": textstats.q80_unigram_logppl,
        "q81_copurchase_pairs": relational.q81_copurchase_pairs,
        "q82_triangle_count": relational.q82_triangle_count,
        "q83_brand_mad_outliers": relational.q83_brand_mad_outliers,
        "q84_brand_price_regression": relational.q84_brand_price_regression,
        "q85_fuzzy_name_pairs": similarity.q85_fuzzy_name_pairs,
        "q86_keyword_search": textstats.q86_keyword_search,
        "q87_group_centroids": similarity.q87_group_centroids,
        "q88_table_profile": relational.q88_table_profile,
        "q89_daily_gapfill": relational.q89_daily_gapfill,
        "q90_embedding_covariance": similarity.q90_embedding_covariance,
        "q91_interval_merge": windows.q91_interval_merge,
        "q98_prev_rows_stats": windows.q98_prev_rows_stats,
        "q99_khop_parts": graph.q99_khop_parts,
        "q100_equidepth_bins": relational.q100_equidepth_bins,
        "q101_bigram_logppl": textstats.q101_bigram_logppl,
        "q102_benford_audit": relational.q102_benford_audit,
        "q103_time_weighted_avg": windows.q103_time_weighted_avg,
        "q104_rolling_distinct_users": windows.q104_rolling_distinct_users,
        "q105_audience_overlap": relational.q105_audience_overlap,
        "q106_purchase_attribution": windows.q106_purchase_attribution,
        "q107_daily_orders_vs_events": relational.q107_daily_orders_vs_events,
        "q108_upsert_latest": windows.q108_upsert_latest,
        "q109_scd2_intervals": windows.q109_scd2_intervals,
        "q110_user_value_ewma": windows.q110_user_value_ewma,
        "q111_chisq_independence": relational.q111_chisq_independence,
        "q112_weighted_median": relational.q112_weighted_median,
        "q113_linear_interp": relational.q113_linear_interp,
        "q114_readability": textstats.q114_readability,
        "q115_longest_streak": windows.q115_longest_streak,
        "q116_session_conversion": windows.q116_session_conversion,
        "q117_autocorr_lag1": relational.q117_autocorr_lag1,
        "q118_minmax_scale": relational.q118_minmax_scale,
        "q119_seasonality_strength": relational.q119_seasonality_strength,
        "q120_distinct_user_rollup": relational.q120_distinct_user_rollup,
        "q121_dup_span_stats": textstats.q121_dup_span_stats,
        "q122_order_ntile": relational.q122_order_ntile,
        "q123_event_grouping_sets": relational.q123_event_grouping_sets,
        "q140_validation_report": relational.q140_validation_report,
        "q144_gini_spend": relational.q144_gini_spend,
        "q145_iqr_outliers": relational.q145_iqr_outliers,
        "q146_dau_jaccard": windows.q146_dau_jaccard,
        "q147_time_to_convert": windows.q147_time_to_convert,
        "q148_revenue_share": relational.q148_revenue_share,
        "q149_copurchase_degree_hist": relational.q149_copurchase_degree_hist,
        "q150_winsorized_mean": relational.q150_winsorized_mean,
        "q151_ship_leadtime": relational.q151_ship_leadtime,
        "q152_daily_bounce_rate": windows.q152_daily_bounce_rate,
        "q153_new_vs_returning": windows.q153_new_vs_returning,
        "q154_rfm_segments": relational.q154_rfm_segments,
        "q155_source_ks": textstats.q155_source_ks,
        "q156_frequent_triples": relational.q156_frequent_triples,
        "q157_brand_discount_qty_corr": relational.q157_brand_discount_qty_corr,
        "q158_pair_lift": relational.q158_pair_lift,
        "q159_double_charge": windows.q159_double_charge,
        "q160_abc_classes": relational.q160_abc_classes,
        "q161_hapax_ratio": textstats.q161_hapax_ratio,
        "q174_cramers_v": textstats.q174_cramers_v,
        "q175_prefix_families": textstats.q175_prefix_families,
        "q176_return_rate_wilson": relational.q176_return_rate_wilson,
        "q162_supplier_hhi": relational.q162_supplier_hhi,
        "q163_conversion_ztest": relational.q163_conversion_ztest,
        "q164_cusum_changepoint": windows.q164_cusum_changepoint,
        "q165_open_order_backlog": windows.q165_open_order_backlog,
        "q166_session_duration_quantiles": windows.q166_session_duration_quantiles,
        "q167_customer_order_gap_median": relational.q167_customer_order_gap_median,
        "q168_retention_curve": windows.q168_retention_curve,
        "q169_brand_price_bands": relational.q169_brand_price_bands,
        "q170_design_effect": relational.q170_design_effect,
        "q171_nation_flow_matrix": relational.q171_nation_flow_matrix,
        "q172_new_vs_repeat_revenue": relational.q172_new_vs_repeat_revenue,
        "q173_net_revenue_monthly": relational.q173_net_revenue_monthly,
        "q141_global_median_exact": relational.q141_global_median_exact,
        "q142_k_anonymity": relational.q142_k_anonymity,
        "q124_bm25_topk": textstats.q124_bm25_topk,
        "q127_hybrid_retrieval": similarity.q127_hybrid_retrieval,
        "q128_token_fertility": textstats.q128_token_fertility,
        "q129_temperature_mix": textstats.q129_temperature_mix,
        "q130_leakage_free_split": dedup.q130_leakage_free_split,
        "q131_source_quality_gate": textstats.q131_source_quality_gate,
        "q132_source_overlap": textstats.q132_source_overlap,
        "q133_span_removal": textstats.q133_span_removal,
        "q134_padding_waste": textstats.q134_padding_waste,
        "q135_dsir_logratio": textstats.q135_dsir_logratio,
        "q136_gopher_repetition": textstats.q136_gopher_repetition,
        "q137_zipf_alpha": textstats.q137_zipf_alpha,
        "q143_fuzzy_decontaminate": textstats.q143_fuzzy_decontaminate,
        "q138_ppl_buckets": textstats.q138_ppl_buckets,
        "q139_boilerplate_ngrams": textstats.q139_boilerplate_ngrams,
        "q125_source_divergence": textstats.q125_source_divergence,
        "q126_mixture_budget": textstats.q126_mixture_budget,
        "q92_snapshot_diff": relational.q92_snapshot_diff,
        "q93_referential_integrity": relational.q93_referential_integrity,
        "q94_skyline": relational.q94_skyline,
        "q95_percent_rank": relational.q95_percent_rank,
        "q96_event_entropy": relational.q96_event_entropy,
        "q97_user_transitions": windows.q97_user_transitions,
        "er_canonical_names": similarity.er_canonical_names,
        "keyword_index_search": textstats.keyword_index_search,
        "q31_region_nation_rollup": relational.q31_region_nation_rollup,
        "q32_event_type_pivot": relational.q32_event_type_pivot,
        "q33_top3_events_per_user": relational.q33_top3_events_per_user,
        "q23_top_event_per_user_type": scorecard.q23_top_event_per_user_type,
        "q24_best_worst_day": scorecard.q24_best_worst_day,
        "q25_embedding_neardup": similarity.q25_embedding_neardup,
        # KG flagship over synthetic transcripts (rows-only)
        "kg_triples": _kg_triples,
        "kg_triples_ner": _kg_triples_ner,
        "kg_triples_ner_subword": _kg_triples_ner_subword,
        "kg_mentions": _kg_mentions,
        # transcript-derived, SQL-checked via read_parquet on the cached
        # deterministic fixture (oracle_sql ensures generation)
        "kg_clean_text": _kg_clean_text,
        "kg_price_redact": _kg_price_redact,
        "kg_prices_exploded": _kg_prices_exploded,
        "kg_phones_exploded": _kg_phones_exploded,
        "kg_mention_flags": _kg_mention_flags,
        "kg_seller_price_stats": _kg_seller_price_stats,
        "kg_text_equality": _kg_text_equality,
        "kg_turns_per_conv": _kg_turns_per_conv,
        "kg_turn_context": _kg_turn_context,
        "kg_seller_turncounts": _kg_seller_turncounts,
        "kg_response_latency": _kg_response_latency,
        "kg_conv_len_by_price": _kg_conv_len_by_price,
        "kg_price_trajectory": _kg_price_trajectory,
        "kg_tool_assisted_pricing": _kg_tool_assisted_pricing,
        "kg_locs_exploded": _kg_locs_exploded,
        "kg_seller_loc_matrix": _kg_seller_loc_matrix,
        "kg_price_by_location": _kg_price_by_location,
        "kg_seller_response_p50": _kg_seller_response_p50,
        "q178_share_swing": windows.q178_share_swing,
        "q183_hourly_load_p95": windows.q183_hourly_load_p95,
        "q184_weekly_control_chart": windows.q184_weekly_control_chart,
        "q185_quantity_discount_curve": relational.q185_quantity_discount_curve,
        "q186_leadtime_p90_matrix": relational.q186_leadtime_p90_matrix,
        "q187_theil_index": relational.q187_theil_index,
        "q188_assoc_rules": relational.q188_assoc_rules,
        "q189_user_burstiness": windows.q189_user_burstiness,
        "q190_source_ttr": textstats.q190_source_ttr,
        "q191_simpson_diversity": textstats.q191_simpson_diversity,
        "q192_crosssource_dup_matrix": dedup.q192_crosssource_dup_matrix,
        "q193_length_decile_bands": textstats.q193_length_decile_bands,
        "q194_cluster_size_hist": dedup.q194_cluster_size_hist,
        "q195_anova_f": relational.q195_anova_f,
        "q196_poisson_dispersion": relational.q196_poisson_dispersion,
        "q197_embedding_norm_outliers": similarity.q197_embedding_norm_outliers,
        "q198_weekday_chi2": relational.q198_weekday_chi2,
        "q199_val_oov_rate": textstats.q199_val_oov_rate,
        "q200_part_affinity_jaccard": relational.q200_part_affinity_jaccard,
        "q201_event_hour_heatmap": relational.q201_event_hour_heatmap,
        "q202_lang_confusion_matrix": textstats.q202_lang_confusion_matrix,
        "q203_l_diversity": relational.q203_l_diversity,
        "q204_shingle_df_histogram": textstats.q204_shingle_df_histogram,
        "q205_conditional_entropy": textstats.q205_conditional_entropy,
        "q206_ngram_coverage_curve": textstats.q206_ngram_coverage_curve,
        "q207_hill_tail_index": relational.q207_hill_tail_index,
        "q208_heaps_exponent": textstats.q208_heaps_exponent,
        "q209_price_ending_bias": relational.q209_price_ending_bias,
        "q210_monthly_supplier_hhi": relational.q210_monthly_supplier_hhi,
        "q211_discount_return_rate": relational.q211_discount_return_rate,
        "q212_price_digit_benford": relational.q212_price_digit_benford,
        "q213_token_length_hist": textstats.q213_token_length_hist,
        "q214_embedding_dim_audit": similarity.q214_embedding_dim_audit,
        "q215_segment_value_cv": relational.q215_segment_value_cv,
        "q216_charclass_density": textstats.q216_charclass_density,
        "q217_event_type_cooccurrence": windows.q217_event_type_cooccurrence,
        "q218_stopword_ratio": textstats.q218_stopword_ratio,
        "q219_brand_price_spread": relational.q219_brand_price_spread,
        "q220_monthly_return_share": relational.q220_monthly_return_share,
        "q221_orders_per_customer_hist": relational.q221_orders_per_customer_hist,
        "q222_brand_discount_depth": relational.q222_brand_discount_depth,
        "q223_weekday_hour_heatmap": windows.q223_weekday_hour_heatmap,
        "q224_value_share_by_type": windows.q224_value_share_by_type,
        "q225_priority_mix_by_month": relational.q225_priority_mix_by_month,
        "q226_user_lifespan_hist": windows.q226_user_lifespan_hist,
        "q227_nation_negative_acctbal": relational.q227_nation_negative_acctbal,
        "q228_status_mix_by_year": relational.q228_status_mix_by_year,
        "q229_type_catalog_profile": relational.q229_type_catalog_profile,
        "q230_weighted_median": relational.q230_weighted_median,
        "kg_tool_usage_share": _kg_tool_usage_share,
        "kg_turn_balance": _kg_turn_balance,
        "kg_price_stats_by_product_flag": _kg_price_stats_by_product_flag,
        "kg_seller_price_cv": _kg_seller_price_cv,
        "kg_role_transitions": _kg_role_transitions,
        "kg_conv_funnel": _kg_conv_funnel,
        "kg_loc_corridors": _kg_loc_corridors,
        "kg_shared_phones": _kg_shared_phones,
        "q179_segment_priority_residuals": relational.q179_segment_priority_residuals,
        "q180_clv_quartile_migration": relational.q180_clv_quartile_migration,
        "q181_source_lang_purity": textstats.q181_source_lang_purity,
        "q182_prefix_family_diversity": textstats.q182_prefix_family_diversity,
        "kg_seller_scorecards": _kg_scorecards,
        "kg_pr_report": _kg_pr_report,
        "kg_extractor_disagreement": _kg_extractor_disagreement,
        "kg_product_price_paths": _kg_product_price_paths,
        "kg_product_price_paths_capped": _kg_product_price_paths_capped,
        "kg_scorecard_summary": lambda sf_dir: __import__(
            "ethiomart_amharic_ner_ray.pipelines.scorecard", fromlist=["scorecard_summary"]
        ).scorecard_summary(_kg_scorecards(sf_dir)),
        # entity importance over the triple graph (rows-only: iterative)
        "kg_seller_pagerank": _kg_seller_pagerank,
        "kg_seller_communities": _kg_seller_communities,
        # near-dup / sketch family (rows-only)
        "cms_vocab_topk": sketches.cms_vocab_topk,
        "approx_users_per_event_type": sketches.approx_users_per_event_type,
        "approx_audience_overlap": sketches.approx_audience_overlap,
        "dedup_minhash_pairs": dedup.minhash_lsh_pairs,
        "dedup_minhash_clusters": dedup.minhash_dedup,
        "dedup_simhash": dedup.simhash_signatures,
        "dedup_simhash_pairs": dedup.simhash_pairs,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "embedding_neardup_lsh": similarity.embedding_neardup_lsh,
        "doc_rolling_fingerprints": textstats.rolling_fingerprints,
        "doc_pack_bins": textstats.doc_pack_bins,
        "bpe_merges": lambda sf_dir: bpe.bpe_train(sf_dir, n_merges=10),
        "bpe_token_counts": lambda sf_dir: bpe.bpe_token_counts(sf_dir, n_merges=10),
        "export_sorted_ranges": _export_sorted_ranges,
        "export_shuffled_shards": _export_shuffled_shards,
        "export_zorder": _export_zorder,
        "approx_distinct_report": sketches.approx_distinct_report,
        "approx_value_quantiles": lambda sf_dir: sketches.approx_quantiles(
            __import__(
                "ethiomart_amharic_ner_ray.pipelines.common", fromlist=["read_table"]
            ).read_table(sf_dir, "events", columns=["value"]),
            "value",
        ),
        # ANN / batched retrieval (knn_self_join + the exact-probe IVF
        # variant are SQL-checked; the pruned variants stay rows-only)
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        "pca_project": similarity.pca_project,
        "ann_ivf_pq_topk": similarity.ann_ivf_pq_topk,
        "ann_ivf_pq_index_topk": similarity.ann_ivf_pq_served,
        "mahalanobis_outliers": similarity.mahalanobis_outliers,
        "ann_ivf_partitioned_topk": _ann_ivf_partitioned,
        "ann_ivf_exact_topk": lambda sf_dir: similarity.ann_ivf_topk(sf_dir, nprobe=16),
        "kmeans_assign": lambda sf_dir: similarity.kmeans_embeddings(sf_dir)[1],
        "semdedup": similarity.semdedup,
        "join_size_estimate": sketches.join_size_estimate,
        "doc_hash_embeddings": similarity.doc_hash_embeddings,
        "text_semantic_search": similarity.text_semantic_search,
        "curation_summary": curate.curation_summary,
        # distributed-trained quality classifier (rows-only: trained model
        # scores have no SQL form; pinned vs an in-process reference in
        # tests/test_classifier.py)
        "quality_classifier_scores": classifier.quality_classifier_scores,
        # concat-and-chunk packed training sequences (rows-only: BPE-encode →
        # global-prefix offsets → span exchange; pinned vs an in-process
        # encode→concat→chunk reference in tests/test_tokenize_export.py)
        "tokenized_sequences": lambda sf_dir: tokenize_export.tokenized_sequences(
            sf_dir, n_merges=12, seq_len=128
        ),
        "knn_self_join": similarity.knn_self_join,
        # multimodal plumbing (rows-only; decode stubbed per environment).
        # Sized from sf like the transcript fixture so the rows-only check
        # exercises batch sizing under payload growth, not a constant.
        "media_features": lambda sf_dir: multimodal.media_features(
            max(200, int(20_000 * _sf_of(sf_dir))), seed=42
        ),
        "media_phash_pairs": lambda sf_dir: multimodal.media_phash_pairs(n=200),
        "media_frames": lambda sf_dir: multimodal.media_frames(
            max(200, int(20_000 * _sf_of(sf_dir))), seed=42
        ),
        # entity explode + labeled-data prep (rows-only; transcripts-based)
        "kg_mentions_exploded": _kg_mentions_exploded,
        "kg_mention_flags_full": _kg_mention_flags_full,
        "labeling_prepare": _labeling_prepared,
        "labeling_tag_distribution": _labeling_tag_distribution,
        "labeling_quality_report": _labeling_quality_report,
    }


def oracle_sql() -> dict[str, str]:
    # The driver runs correctness at sf0.01; the transcript-derived oracle
    # entries read the SAME cached deterministic fixture DuckDB-side.
    # ensure_transcripts is pure pyarrow (no Ray) and idempotent, so
    # generating here is safe whichever side the driver runs first.
    tx = transcripts_dir_for("/root/testdata/sf0.01")
    tx_glob = f"{tx}/*.parquet"
    # A6/A7 round-trip gate: DuckDB recounts the EXPORTED CoNLL shards
    # (string_split + unnest) against the engine's distributed partials
    # over the prepared Parquet side of the same checkpoint
    conll_glob = os.path.join(
        _labeling_checkpoint("/root/testdata/sf0.01"), "conll", "*", "part-*.conll"
    )
    # clean_text_v1 as a DuckDB expression (exact order of operations;
    # [\p{L}\p{N}_] stands in for Python's unicode \w — RE2's \w is
    # ASCII-only; verified equal over the corpus alphabet)
    clean_expr = r"""trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        CASE WHEN text IS NULL OR text = '[no text]' THEN '' ELSE text END,
        '(\d{1,3}(?:,\d{3})*(?:\.\d+)?)\s*(?:ብር|birr|br|ዶላር|dollar)', '\1 ብር', 'gi'),
        'https?://\S+|www\.\S+', '', 'g'),
        '[^\p{L}\p{N}_\sሀ-፿.,!?]', '', 'g'),
        '\s+', ' ', 'g'))"""
    # fold_ethiopic as a DuckDB translate(): the engine's _FOLD_MAP is a
    # strict 1:1 codepoint map, so the SQL side folds identically; the LOC
    # alternation lists folded gazetteer forms longest-first (RE2 and
    # Python re both take the first alternative at each position)
    import re as _re

    from ethiomart_amharic_ner_ray.functions.canonical import _FOLD_MAP
    from ethiomart_amharic_ner_ray.functions.extract import DEFAULT_LOCATIONS
    from ethiomart_amharic_ner_ray.functions.canonical import fold_ethiopic as _fold

    fold_src = "".join(chr(c) for c in sorted(_FOLD_MAP))
    fold_dst = "".join(
        _FOLD_MAP[c] if isinstance(_FOLD_MAP[c], str) else chr(_FOLD_MAP[c])
        for c in sorted(_FOLD_MAP)
    )
    loc_alts = sorted({_fold(l) for l in DEFAULT_LOCATIONS}, key=len, reverse=True)
    loc_pattern = "|".join(_re.escape(a) for a in loc_alts)
    return {
        "kg_price_stats_by_product_flag": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            p AS (
                SELECT conv_id, turn_idx,
                       trim(regexp_replace(regexp_replace(
                            regexp_extract(clean,
                                '(?i)(ሽያጭ|ለመግዛት|ይግዙ|ይሸጥ|ለሽያጭ|ገዝተውልኝ)\\s*([^\\n]+)',
                                2),
                            '(?i)\\d{{1,3}}(?:,\\d{{3}})*(?:\\.\\d+)?\\s*(?:ብር|birr|br|ዶላር|dollar).*$',
                            ''),
                            '((?:^|[^0-9]))(?:09[0-9]{{8}}|9[0-9]{{8}})(?:[^0-9]|$).*$',
                            '\\1'),
                        ' ,.!?') <> '' AS has_product
                FROM c),
            r AS (
                SELECT conv_id, turn_idx,
                       unnest(regexp_extract_all(clean,
                           '(?i)([0-9]{{1,3}}(?:,[0-9]{{3}})*(?:\\.[0-9]+)?)\\s*(?:ብር|birr|br|ዶላር|dollar)',
                           1)) AS raw
                FROM c),
            v AS (
                SELECT conv_id, turn_idx,
                       CAST(round(CAST(replace(raw, ',', '') AS DOUBLE) * 100)
                            AS BIGINT) AS cents
                FROM r),
            a AS (
                SELECT p.has_product, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(v.cents) AS BIGINT) AS s,
                       CAST(min(v.cents) AS BIGINT) AS mn,
                       CAST(max(v.cents) AS BIGINT) AS mx
                FROM v JOIN p USING (conv_id, turn_idx)
                GROUP BY 1)
            SELECT has_product, n AS n_prices,
                   round((CAST(s AS DOUBLE) / n) / 100, 4) AS mean_price,
                   round(CAST(mn AS DOUBLE) / 100, 2) AS min_price,
                   round(CAST(mx AS DOUBLE) / 100, 2) AS max_price
            FROM a
        """,
        "kg_tool_usage_share": f"""
            SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(sum(CASE WHEN coalesce(tool, '') <> '' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_tool,
                   round(CAST(sum(CASE WHEN coalesce(tool, '') <> '' THEN 1
                                       ELSE 0 END) AS DOUBLE)
                         / count(*), 6) AS tool_share
            FROM read_parquet('{tx_glob}') GROUP BY role
        """,
        "kg_turn_balance": f"""
            WITH c AS (
                SELECT conv_id, CAST(count(*) AS BIGINT) AS t,
                       CAST(sum(CASE WHEN role = 'seller' THEN 1 ELSE 0 END)
                            AS BIGINT) AS s
                FROM read_parquet('{tx_glob}') GROUP BY conv_id)
            SELECT (10 * s) // t AS decile, CAST(count(*) AS BIGINT) AS n_convs
            FROM c GROUP BY 1
        """,
        "labeling_tag_distribution": f"""
            WITH l AS (
                SELECT unnest(string_split(content, chr(10))) AS line
                FROM read_text('{conll_glob}'))
            SELECT string_split(line, chr(9))[2] AS tag,
                   CAST(count(*) AS BIGINT) AS n
            FROM l WHERE line <> '' GROUP BY 1
        """,
        "labeling_quality_report": f"""
            WITH f AS (
                SELECT CASE WHEN filename LIKE '%/train/%' THEN 'train'
                            ELSE 'val' END AS split,
                       content
                FROM read_text('{conll_glob}')),
            s AS (
                SELECT split,
                       list_filter(string_split(block, chr(10) || chr(10)),
                                   x -> x <> '') AS blks
                FROM (SELECT split, content AS block FROM f)),
            per AS (
                SELECT split,
                       len(list_filter(string_split(b, chr(10)), x -> x <> ''))
                           AS n_tok
                FROM (SELECT split, unnest(blks) AS b FROM s)),
            tags AS (
                SELECT split, string_split(line, chr(9))[2] AS tag
                FROM (
                    SELECT split, unnest(string_split(content, chr(10))) AS line
                    FROM f)
                WHERE line <> ''),
            p AS (
                SELECT split, CAST(count(*) AS BIGINT) AS n_sentences,
                       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                       round(CAST(sum(n_tok) AS DOUBLE) / count(*), 4)
                           AS avg_len,
                       CAST(min(n_tok) AS BIGINT) AS min_len,
                       CAST(max(n_tok) AS BIGINT) AS max_len
                FROM per GROUP BY split),
            t AS (
                SELECT split,
                       CAST(sum(CASE WHEN tag = 'B-LOC' THEN 1 ELSE 0 END)
                            AS BIGINT) AS b_loc,
                       CAST(sum(CASE WHEN tag = 'B-PHONE' THEN 1 ELSE 0 END)
                            AS BIGINT) AS b_phone,
                       CAST(sum(CASE WHEN tag = 'B-PRICE' THEN 1 ELSE 0 END)
                            AS BIGINT) AS b_price,
                       CAST(sum(CASE WHEN tag = 'B-PRODUCT' THEN 1 ELSE 0 END)
                            AS BIGINT) AS b_product
                FROM tags GROUP BY split)
            SELECT p.split, p.n_sentences, p.n_tokens, p.avg_len, p.min_len,
                   p.max_len, t.b_loc, t.b_phone, t.b_price, t.b_product
            FROM p JOIN t USING (split)
        """,
        "kg_clean_text": f"""
            SELECT conv_id, turn_idx, {clean_expr} AS clean_text
            FROM read_parquet('{tx_glob}')
        """,
        "kg_price_redact": f"""
            SELECT conv_id, turn_idx,
                   CAST(len(regexp_extract_all(coalesce(text, ''),
                       '(?i)[0-9]{{1,3}}(?:,[0-9]{{3}})*(?:\\.[0-9]+)?\\s*(?:ብር|birr|br|ዶላር|dollar)'))
                       AS BIGINT) AS n_redacted,
                   md5(regexp_replace(coalesce(text, ''),
                       '(?i)[0-9]{{1,3}}(?:,[0-9]{{3}})*(?:\\.[0-9]+)?\\s*(?:ብር|birr|br|ዶላር|dollar)',
                       '<PRICE>', 'g')) AS red_md5
            FROM read_parquet('{tx_glob}')
        """,
        "kg_mention_flags": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}'))
            SELECT conv_id, turn_idx,
                   regexp_matches(clean,
                       '(?i)\\d{{1,3}}(?:,\\d{{3}})*(?:\\.\\d+)?\\s*(?:ብር|birr|br|ዶላር|dollar)')
                       AS has_price,
                   regexp_matches(clean,
                       '(?:^|[^0-9])(?:09[0-9]{{8}}|9[0-9]{{8}})(?:[^0-9]|$)') AS has_phone
            FROM c
        """,
        "kg_mention_flags_full": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            p AS (
                SELECT conv_id, turn_idx, clean,
                       regexp_extract(clean,
                           '(?i)(ሽያጭ|ለመግዛት|ይግዙ|ይሸጥ|ለሽያጭ|ገዝተውልኝ)\\s*([^\\n]+)',
                           2) AS raw
                FROM c)
            SELECT conv_id, turn_idx,
                   regexp_matches(clean,
                       '(?i)\\d{{1,3}}(?:,\\d{{3}})*(?:\\.\\d+)?\\s*(?:ብር|birr|br|ዶላር|dollar)')
                       AS has_price,
                   regexp_matches(clean,
                       '(?:^|[^0-9])(?:09[0-9]{{8}}|9[0-9]{{8}})(?:[^0-9]|$)') AS has_phone,
                   trim(regexp_replace(regexp_replace(raw,
                            '(?i)\\d{{1,3}}(?:,\\d{{3}})*(?:\\.\\d+)?\\s*(?:ብር|birr|br|ዶላር|dollar).*$',
                            ''),
                            '((?:^|[^0-9]))(?:09[0-9]{{8}}|9[0-9]{{8}})(?:[^0-9]|$).*$',
                            '\\1'),
                        ' ,.!?') <> '' AS has_product
            FROM p
        """,
        "kg_prices_exploded": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            r AS (
                SELECT conv_id, turn_idx,
                       unnest(regexp_extract_all(clean,
                           '(?i)([0-9]{{1,3}}(?:,[0-9]{{3}})*(?:\\.[0-9]+)?)\\s*(?:ብር|birr|br|ዶላር|dollar)',
                           1)) AS raw
                FROM c),
            v AS (SELECT conv_id, turn_idx,
                         CAST(replace(raw, ',', '') AS DOUBLE) AS val FROM r)
            SELECT conv_id, turn_idx,
                   CASE WHEN val = floor(val)
                        THEN CAST(CAST(val AS BIGINT) AS VARCHAR)
                        ELSE printf('%.10g', val) END || ' ብር' AS price
            FROM v
        """,
        "kg_price_by_location": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            l AS (
                SELECT DISTINCT conv_id,
                       unnest(regexp_extract_all(
                           translate(clean, '{fold_src}', '{fold_dst}'),
                           '{loc_pattern}')) AS loc
                FROM c),
            r AS (
                SELECT conv_id,
                       unnest(regexp_extract_all(clean,
                           '(?i)([0-9]{{1,3}}(?:,[0-9]{{3}})*(?:\\.[0-9]+)?)\\s*(?:ብር|birr|br|ዶላር|dollar)',
                           1)) AS raw
                FROM c),
            v0 AS (SELECT conv_id,
                          CAST(replace(raw, ',', '') AS DOUBLE) AS v FROM r),
            p AS (SELECT conv_id,
                         CAST(round(CASE WHEN v = floor(v) THEN v
                                         ELSE CAST(printf('%.10g', v) AS DOUBLE)
                                    END * 100) AS BIGINT) AS cents
                  FROM v0),
            j AS (SELECT l.loc, p.cents FROM l JOIN p USING (conv_id))
            SELECT loc, CAST(count(*) AS BIGINT) AS n_prices,
                   round((CAST(sum(cents) AS DOUBLE) / 100.0) / count(*), 4)
                       AS avg_price
            FROM j GROUP BY 1
        """,
        "kg_shared_phones": f"""
            WITH c AS (
                SELECT conv_id, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            r AS (
                SELECT conv_id,
                       unnest(regexp_extract_all(clean, '[0-9]+')) AS run
                FROM c),
            p AS (
                SELECT DISTINCT
                       CASE WHEN length(run) = 9 THEN '0' || run
                            ELSE run END AS phone,
                       split_part(conv_id, '-', 1) AS seller
                FROM r
                WHERE regexp_full_match(run, '09[0-9]{{8}}|9[0-9]{{8}}'))
            SELECT CAST(count(*) AS BIGINT) AS n_phones,
                   CAST(COALESCE(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_shared,
                   CAST(COALESCE(max(ns), 0) AS BIGINT) AS max_sellers
            FROM (SELECT phone, count(DISTINCT seller) AS ns
                  FROM p GROUP BY 1)
        """,
        "kg_loc_corridors": f"""
            WITH c AS (
                SELECT conv_id, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            l AS (
                SELECT DISTINCT conv_id,
                       unnest(regexp_extract_all(
                           translate(clean, '{fold_src}', '{fold_dst}'),
                           '{loc_pattern}')) AS loc
                FROM c)
            SELECT a.loc AS loc_a, b.loc AS loc_b,
                   CAST(count(*) AS BIGINT) AS n_convs
            FROM l a JOIN l b
              ON a.conv_id = b.conv_id AND a.loc < b.loc
            GROUP BY 1, 2
        """,
        "kg_conv_funnel": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            pr AS (
                SELECT conv_id, turn_idx, clean,
                       regexp_extract(clean,
                           '(?i)(ሽያጭ|ለመግዛት|ይግዙ|ይሸጥ|ለሽያጭ|ገዝተውልኝ)\\s*([^\\n]+)',
                           2) AS raw
                FROM c),
            fl AS (
                SELECT conv_id, turn_idx,
                       regexp_matches(clean,
                           '(?i)\\d{{1,3}}(?:,\\d{{3}})*(?:\\.\\d+)?\\s*(?:ብር|birr|br|ዶላር|dollar)')
                           AS has_price,
                       regexp_matches(clean,
                           '(?:^|[^0-9])(?:09[0-9]{{8}}|9[0-9]{{8}})(?:[^0-9]|$)')
                           AS has_phone,
                       trim(regexp_replace(regexp_replace(raw,
                                '(?i)\\d{{1,3}}(?:,\\d{{3}})*(?:\\.\\d+)?\\s*(?:ብር|birr|br|ዶላር|dollar).*$',
                                ''),
                                '((?:^|[^0-9]))(?:09[0-9]{{8}}|9[0-9]{{8}})(?:[^0-9]|$).*$',
                                '\\1'),
                            ' ,.!?') <> '' AS has_product
                FROM pr),
            prod AS (SELECT conv_id, min(turn_idx) AS t1
                     FROM fl WHERE has_product GROUP BY 1),
            pri AS (SELECT fl.conv_id, min(fl.turn_idx) AS t2
                    FROM fl JOIN prod USING (conv_id)
                    WHERE fl.has_price AND fl.turn_idx >= prod.t1 GROUP BY 1),
            pho AS (SELECT fl.conv_id, min(fl.turn_idx) AS t3
                    FROM fl JOIN pri USING (conv_id)
                    WHERE fl.has_phone AND fl.turn_idx >= pri.t2 GROUP BY 1),
            conv AS (SELECT DISTINCT conv_id FROM fl)
            SELECT split_part(conv.conv_id, '-', 1) AS seller,
                   CAST(count(*) AS BIGINT) AS n_convs,
                   CAST(sum(CASE WHEN prod.conv_id IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_product,
                   CAST(sum(CASE WHEN pri.conv_id IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_price,
                   CAST(sum(CASE WHEN pho.conv_id IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_phone
            FROM conv
            LEFT JOIN prod USING (conv_id)
            LEFT JOIN pri USING (conv_id)
            LEFT JOIN pho USING (conv_id)
            GROUP BY 1
        """,
        "kg_role_transitions": f"""
            WITH s AS (
                SELECT conv_id, role,
                       lead(role) OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx) AS nxt
                FROM read_parquet('{tx_glob}')),
            c AS (
                SELECT role AS from_role, nxt AS to_role,
                       CAST(count(*) AS BIGINT) AS n
                FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
            SELECT from_role, to_role, n,
                   round(CAST(n AS DOUBLE)
                         / sum(n) OVER (PARTITION BY from_role), 6) AS p
            FROM c
        """,
        "kg_seller_price_cv": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            r AS (
                SELECT conv_id,
                       unnest(regexp_extract_all(clean,
                           '(?i)([0-9]{{1,3}}(?:,[0-9]{{3}})*(?:\\.[0-9]+)?)\\s*(?:ብር|birr|br|ዶላር|dollar)',
                           1)) AS raw
                FROM c),
            v0 AS (SELECT conv_id,
                          CAST(replace(raw, ',', '') AS DOUBLE) AS v FROM r),
            p AS (SELECT split_part(conv_id, '-', 1) AS seller,
                         CAST(round(CASE WHEN v = floor(v) THEN v
                                         ELSE CAST(printf('%.10g', v) AS DOUBLE)
                                    END * 100) AS BIGINT) AS cents
                  FROM v0),
            s AS (
                SELECT seller, CAST(count(*) AS BIGINT) AS n,
                       sum(cents) AS sc, sum(cents * cents) AS sc2
                FROM p GROUP BY 1
                HAVING count(*) >= 2)
            SELECT seller, n AS n_prices,
                   round(sqrt((CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * sc / n)
                              / (n - 1.0))
                         / (CAST(sc AS DOUBLE) / n), 6) AS price_cv
            FROM s
        """,
        "kg_seller_loc_matrix": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            l AS (
                SELECT conv_id,
                       unnest(regexp_extract_all(
                           translate(clean, '{fold_src}', '{fold_dst}'),
                           '{loc_pattern}')) AS loc
                FROM c)
            SELECT split_part(conv_id, '-', 1) AS seller, loc,
                   CAST(count(*) AS BIGINT) AS n_mentions
            FROM l GROUP BY 1, 2
        """,
        "kg_locs_exploded": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}'))
            SELECT conv_id, turn_idx,
                   unnest(regexp_extract_all(
                       translate(clean, '{fold_src}', '{fold_dst}'),
                       '{loc_pattern}')) AS loc
            FROM c
        """,
        "kg_tool_assisted_pricing": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            r AS (
                SELECT conv_id, turn_idx,
                       unnest(regexp_extract_all(clean,
                           '(?i)([0-9]{{1,3}}(?:,[0-9]{{3}})*(?:\\.[0-9]+)?)\\s*(?:ብር|birr|br|ዶላር|dollar)',
                           1)) AS raw
                FROM c),
            p AS (SELECT conv_id, min(turn_idx) AS price_turn FROM r GROUP BY 1),
            t AS (SELECT conv_id, min(turn_idx) AS tool_turn
                  FROM read_parquet('{tx_glob}')
                  WHERE tool <> '' GROUP BY 1),
            j AS (
                SELECT split_part(p.conv_id, '-', 1) AS seller,
                       CASE WHEN t.tool_turn IS NOT NULL
                                 AND t.tool_turn < p.price_turn
                            THEN 1 ELSE 0 END AS before
                FROM p LEFT JOIN t USING (conv_id))
            SELECT seller,
                   CAST(count(*) AS BIGINT) AS n_price_convs,
                   CAST(sum(before) AS BIGINT) AS n_tool_before,
                   round(sum(before)::DOUBLE / count(*), 6) AS share
            FROM j GROUP BY 1
        """,
        "kg_price_trajectory": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            r AS (
                SELECT conv_id, turn_idx,
                       unnest(regexp_extract_all(clean,
                           '(?i)([0-9]{{1,3}}(?:,[0-9]{{3}})*(?:\\.[0-9]+)?)\\s*(?:ብር|birr|br|ዶላር|dollar)',
                           1)) AS raw
                FROM c),
            v0 AS (SELECT conv_id, turn_idx,
                          CAST(replace(raw, ',', '') AS DOUBLE) AS v FROM r),
            v AS (SELECT conv_id, turn_idx,
                         CASE WHEN v = floor(v) THEN v
                              ELSE CAST(printf('%.10g', v) AS DOUBLE)
                         END AS val
                  FROM v0),
            t AS (SELECT conv_id, turn_idx, min(val) AS tval
                  FROM v GROUP BY 1, 2),
            b AS (SELECT conv_id, min(turn_idx) AS ft, max(turn_idx) AS lt
                  FROM t GROUP BY 1
                  HAVING min(turn_idx) < max(turn_idx))
            SELECT b.conv_id,
                   CAST(b.ft AS BIGINT) AS first_turn,
                   CAST(b.lt AS BIGINT) AS last_turn,
                   round(f.tval, 4) AS first_price,
                   round(l.tval, 4) AS last_price,
                   round(l.tval - f.tval, 4) AS price_delta
            FROM b
            JOIN t f ON f.conv_id = b.conv_id AND f.turn_idx = b.ft
            JOIN t l ON l.conv_id = b.conv_id AND l.turn_idx = b.lt
        """,
        "kg_phones_exploded": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            r AS (
                SELECT conv_id, turn_idx,
                       unnest(regexp_extract_all(clean, '[0-9]+')) AS run
                FROM c)
            SELECT conv_id, turn_idx,
                   CASE WHEN length(run) = 9 THEN '0' || run ELSE run END AS phone
            FROM r
            WHERE regexp_full_match(run, '09[0-9]{{8}}|9[0-9]{{8}}')
        """,
        "knn_self_join": """
            WITH qs AS (SELECT vec_id AS query_id, embedding
                        FROM embeddings ORDER BY vec_id LIMIT 50),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(q.embedding AS DOUBLE[])), 4) AS cos_sim
                FROM embeddings e, qs q
                WHERE e.vec_id <> q.query_id),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY query_id
                                             ORDER BY cos_sim DESC, vec_id) AS rn
                FROM scored)
            SELECT query_id, vec_id, cos_sim FROM ranked WHERE rn <= 5
        """,
        "ann_ivf_exact_topk": """
            WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                CAST(q.embedding AS DOUBLE[])), 4) AS cos_sim
            FROM embeddings e, q
            ORDER BY cos_sim DESC, e.vec_id
            LIMIT 10
        """,
        "kg_seller_price_stats": f"""
            WITH c AS (
                SELECT conv_id, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            p AS (
                SELECT split_part(conv_id, '-', 1) AS seller,
                       CAST(replace(m, ',', '') AS DOUBLE) AS price
                FROM (
                    SELECT conv_id,
                           unnest(regexp_extract_all(clean,
                               '(?i)(\\d{{1,3}}(?:,\\d{{3}})*(?:\\.\\d+)?)\\s*(?:ብር|birr|br|ዶላር|dollar)',
                               1)) AS m
                    FROM c))
            SELECT seller, count(*) AS n_prices, round(avg(price), 4) AS avg_price
            FROM p GROUP BY seller
        """,
        "kg_text_equality": f"""
            SELECT conv_id, turn_idx, text
            FROM read_parquet('{tx_glob}')
        """,
        "kg_turns_per_conv": f"""
            SELECT conv_id, count(*) AS n_turns,
                   CAST(max(turn_idx) AS BIGINT) AS max_turn
            FROM read_parquet('{tx_glob}')
            GROUP BY conv_id
        """,
        "kg_turn_context": f"""
            SELECT conv_id, turn_idx,
                   string_agg(text, ' ') OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ctx
            FROM read_parquet('{tx_glob}')
        """,
        "kg_seller_response_p50": f"""
            WITH b AS (
                SELECT conv_id, min(turn_idx) AS b_idx
                FROM read_parquet('{tx_glob}')
                WHERE role = 'buyer' GROUP BY 1),
            a AS (
                SELECT t.conv_id, min(t.turn_idx) AS a_idx, min(b.b_idx) AS b_idx
                FROM read_parquet('{tx_glob}') t
                JOIN b ON t.conv_id = b.conv_id
                WHERE t.role = 'agent' AND t.turn_idx > b.b_idx
                GROUP BY 1)
            SELECT split_part(conv_id, '-', 1) AS seller,
                   CAST(count(*) AS BIGINT) AS n_convs,
                   round(quantile_cont(CAST(a_idx - b_idx AS DOUBLE), 0.5), 4)
                       AS p50_turns
            FROM a GROUP BY 1
        """,
        "kg_conv_len_by_price": f"""
            WITH c AS (
                SELECT conv_id, turn_idx, {clean_expr} AS clean
                FROM read_parquet('{tx_glob}')),
            f AS (
                SELECT conv_id,
                       CAST(count(*) AS BIGINT) AS n_turns,
                       max(CASE WHEN regexp_matches(clean,
                           '(?i)\\d{{1,3}}(?:,\\d{{3}})*(?:\\.\\d+)?\\s*(?:ብር|birr|br|ዶላር|dollar)')
                           THEN 1 ELSE 0 END) = 1 AS quoted
                FROM c GROUP BY 1)
            SELECT quoted, CAST(count(*) AS BIGINT) AS n_convs,
                   round(CAST(sum(n_turns) AS DOUBLE) / count(*), 4) AS avg_turns
            FROM f GROUP BY 1
        """,
        "kg_response_latency": f"""
            WITH b AS (
                SELECT conv_id, min(turn_idx) AS b_idx
                FROM read_parquet('{tx_glob}')
                WHERE role = 'buyer' GROUP BY 1),
            a AS (
                SELECT t.conv_id, min(t.turn_idx) AS a_idx, min(b.b_idx) AS b_idx
                FROM read_parquet('{tx_glob}') t
                JOIN b ON t.conv_id = b.conv_id
                WHERE t.role = 'agent' AND t.turn_idx > b.b_idx
                GROUP BY 1)
            SELECT conv_id,
                   CAST(a_idx - b_idx AS BIGINT) AS response_turns
            FROM a
        """,
        "kg_seller_turncounts": f"""
            SELECT split_part(conv_id, '-', 1) AS seller, count(*) AS n_turns
            FROM read_parquet('{tx_glob}')
            GROUP BY 1
        """,
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   count(*) AS count_order,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_filter_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
        """,
        "q03_segment_revenue": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "q04_region_rollup": """
            SELECT r_name, count(*) AS n_customers,
                   round(sum(c_acctbal), 4) AS total_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "q05_topk_parts": """
            SELECT p_partkey, p_name, p_retailprice
            FROM part
            ORDER BY p_retailprice DESC, p_partkey
            LIMIT 10
        """,
        "q06_events_daily": """
            SELECT year(ts) AS y, month(ts) AS m, day(ts) AS d,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value,
                   round(avg(value), 4) AS avg_value
            FROM events
            GROUP BY 1, 2, 3
        """,
        "q19_event_type_counts": """
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        """,
        "q20_supplier_nation": """
            SELECT n_name, count(*) AS n_suppliers,
                   round(sum(s_acctbal), 4) AS total_acctbal
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q07_user_engagement": """
            SELECT user_id,
                   count(*) AS n_events,
                   round(avg(nz), 4) AS avg_views,
                   max(nz) AS max_views,
                   min(nz) AS min_views,
                   round(coalesce(stddev_samp(nz), 0), 4) AS view_consistency
            FROM (SELECT user_id,
                         CASE WHEN value = 0 THEN NULL ELSE value END AS nz
                  FROM events)
            GROUP BY user_id
        """,
        "q08_user_activity": """
            WITH weekly AS (
                SELECT user_id, isoyear(ts) AS y, week(ts) AS w, count(*) AS c
                FROM events GROUP BY 1, 2, 3)
            SELECT user_id,
                   CAST(sum(c) AS BIGINT) AS total_posts,
                   count(*) AS active_weeks,
                   round(avg(c), 4) AS posting_frequency,
                   round(coalesce(stddev_samp(c), 0), 4) AS posting_consistency
            FROM weekly GROUP BY user_id
        """,
        "q09_user_value_stats": """
            WITH m AS (
                SELECT user_id, max(value) AS mx,
                       round(median(value), 4) AS median_value
                FROM events GROUP BY user_id)
            SELECT m.user_id, m.median_value,
                   min(e.event_id) AS top_event_id
            FROM m JOIN events e ON e.user_id = m.user_id AND e.value = m.mx
            GROUP BY m.user_id, m.median_value
        """,
        "q10_lending_score": """
            WITH weekly AS (
                SELECT user_id, isoyear(ts) AS y, week(ts) AS w, count(*) AS c
                FROM events GROUP BY 1, 2, 3),
            freq AS (SELECT user_id, avg(c) AS f FROM weekly GROUP BY user_id),
            stats AS (
                SELECT user_id,
                       avg(CASE WHEN value = 0 THEN NULL ELSE value END) AS avg_views,
                       avg(CASE WHEN event_type = 'purchase' THEN value END) AS avg_price,
                       count(DISTINCT event_type) AS variety
                FROM events GROUP BY user_id)
            SELECT s.user_id,
                   round(least(100.0, 100.0 * (
                       0.4 * least(1.0, greatest(0.0, coalesce(s.avg_views, 0) / 5000.0)) +
                       0.3 * least(1.0, greatest(0.0, f.f / 5.0)) +
                       0.2 * least(1.0, greatest(0.0, coalesce(s.avg_price, 0) / 10000.0)) +
                       0.1 * least(1.0, greatest(0.0, s.variety / 50.0)))), 4) AS lending_score
            FROM stats s JOIN freq f USING (user_id)
        """,
        "q11_dedup_exact": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "q12_token_count": """
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
            FROM documents
        """,
        "q63_token_repetition": """
            SELECT d.doc_id,
                   coalesce(s.n_tok, 0) AS n_tok,
                   coalesce(s.n_distinct_tok, 0) AS n_distinct_tok,
                   coalesce(s.rep_ratio, 0.0) AS rep_ratio
            FROM documents d
            LEFT JOIN (
                SELECT doc_id,
                       count(*) AS n_tok,
                       count(DISTINCT tok) AS n_distinct_tok,
                       round(1.0 - count(DISTINCT tok) * 1.0 / count(*), 4) AS rep_ratio
                FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
                      FROM documents)
                WHERE tok <> ''
                GROUP BY doc_id
            ) s USING (doc_id)
        """,
        "q67_shared_shingles": r"""
            WITH arr AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                FROM documents),
            sh AS (
                SELECT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS sh
                FROM arr, unnest(generate_series(1, len(a) - 2)) AS t(i))
            SELECT sh,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n
            FROM sh GROUP BY sh HAVING count(DISTINCT doc_id) >= 2
        """,
        "q68_doc_chunks": r"""
            WITH tk AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
                FROM documents),
            nn AS (SELECT doc_id, toks, len(toks) AS nt FROM tk WHERE len(toks) > 0)
            SELECT doc_id, i AS chunk_idx,
                   least(64, nt - i*48) AS n_tok,
                   md5(array_to_string(toks[i*48 + 1 : i*48 + least(64, nt - i*48)], ' ')) AS chunk_md5
            FROM nn, UNNEST(generate_series(0,
                 CAST(greatest(0, ceil((nt - 64) / 48.0)) AS BIGINT))) AS u(i)
        """,
        "q69_oov_rate": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
                FROM documents),
            vocab AS (
                SELECT token FROM (
                    SELECT token, count(*) AS tf FROM tok
                    GROUP BY token ORDER BY tf DESC, token ASC LIMIT 16))
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tok,
                   CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
                   round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS oov_rate
            FROM tok LEFT JOIN vocab v ON tok.token = v.token
            GROUP BY doc_id
        """,
        "q70_event_zscore": """
            SELECT event_id,
                   round((value - avg(value) OVER (PARTITION BY event_type))
                         / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS zscore
            FROM events
        """,
        "q72_dedup_survivors": r"""
            WITH RECURSIVE tk AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id, array_to_string(toks[i : i + 4], ' ') AS s
                FROM tk, UNNEST(generate_series(1, len(toks) - 4)) AS u(i)
                WHERE len(toks) >= 5),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            edges AS (
                SELECT da, db FROM inter
                JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
                WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5),
            und AS (SELECT da AS a, db AS b FROM edges UNION SELECT db, da FROM edges),
            reach AS (
                SELECT a AS node, b AS reached FROM und
                UNION
                SELECT r.node, u.b FROM reach r JOIN und u ON r.reached = u.a
                WHERE u.b <> r.node),
            lbl AS (SELECT node, least(node, min(reached)) AS rep FROM reach GROUP BY node)
            SELECT d.doc_id FROM documents d
            LEFT JOIN lbl ON d.doc_id = lbl.node
            WHERE lbl.node IS NULL OR lbl.rep = d.doc_id
        """,
        "q73_event_debounce": """
            SELECT event_id FROM (
                SELECT event_id,
                       ts - LAG(ts) OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS gap
                FROM events)
            WHERE gap IS NULL OR gap > INTERVAL 86400 SECOND
        """,
        "q74_bigram_pmi": r"""
            WITH arr AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS a
                FROM documents),
            uni AS (SELECT unnest(a) AS tok FROM arr),
            ucnt AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
            n1 AS (SELECT count(*) AS n1c FROM uni),
            big AS (
                SELECT a[i] AS w1, a[i+1] AS w2
                FROM arr, UNNEST(generate_series(1, len(a) - 1)) AS u(i)
                WHERE len(a) >= 2),
            bcnt AS (
                SELECT w1 || ' ' || w2 AS bigram, w1, w2, count(*) AS nb
                FROM big GROUP BY 1, 2, 3 HAVING count(*) >= 5),
            n2 AS (SELECT count(*) AS n2c FROM big)
            SELECT bigram, CAST(nb AS BIGINT) AS n,
                   round(ln((nb::DOUBLE / n2c) / ((ca.c::DOUBLE / n1c) * (cb.c::DOUBLE / n1c))), 4) AS pmi
            FROM bcnt, n1, n2
            JOIN ucnt ca ON bcnt.w1 = ca.tok
            JOIN ucnt cb ON bcnt.w2 = cb.tok
            ORDER BY pmi DESC, bigram ASC LIMIT 100
        """,
        "q78_lineitem_melt": """
            SELECT l_orderkey, l_linenumber, measure, CAST(value AS DOUBLE) AS value
            FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
                  FROM lineitem)
            UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount))
        """,
        "q85_fuzzy_name_pairs": """
            WITH names AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
            FROM names a JOIN names b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 2
            ORDER BY name_a, name_b
        """,
        "q87_group_centroids": """
            SELECT g, CAST(idx AS BIGINT) AS dim,
                   round(avg(v), 4) AS centroid,
                   CAST(count(*) AS BIGINT) AS n
            FROM (SELECT vec_id % 4 AS g,
                         unnest(embedding) AS v,
                         unnest(generate_series(0, len(embedding) - 1)) AS idx
                  FROM embeddings)
            GROUP BY g, idx
        """,
        "q86_keyword_search": r"""
            SELECT doc_id FROM (
                SELECT DISTINCT doc_id, t AS token FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t IN ('spark', 'join', 'fast'))
            GROUP BY doc_id
            HAVING count(DISTINCT token) = 3
        """,
        "keyword_index_search": r"""
            SELECT doc_id FROM (
                SELECT DISTINCT doc_id, t AS token FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t IN ('spark', 'join', 'fast'))
            GROUP BY doc_id
            HAVING count(DISTINCT token) = 3
        """,
        "q88_table_profile": """
            SELECT * FROM (
                SELECT 'l_quantity' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
                       CAST(count(*) - count(l_quantity) AS BIGINT) AS n_nulls,
                       round(min(l_quantity), 4) AS min_val,
                       round(max(l_quantity), 4) AS max_val,
                       round(avg(l_quantity), 4) AS mean_val
                FROM lineitem
                UNION ALL
                SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
                       CAST(count(*) - count(l_extendedprice) AS BIGINT),
                       round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
                       round(avg(l_extendedprice), 4)
                FROM lineitem
                UNION ALL
                SELECT 'l_discount', CAST(count(*) AS BIGINT),
                       CAST(count(*) - count(l_discount) AS BIGINT),
                       round(min(l_discount), 4), round(max(l_discount), 4),
                       round(avg(l_discount), 4)
                FROM lineitem
                UNION ALL
                SELECT 'l_tax', CAST(count(*) AS BIGINT),
                       CAST(count(*) - count(l_tax) AS BIGINT),
                       round(min(l_tax), 4), round(max(l_tax), 4),
                       round(avg(l_tax), 4)
                FROM lineitem
            ) ORDER BY col_name
        """,
        "q89_daily_gapfill": """
            WITH bounds AS (SELECT CAST(min(ts) AS DATE) AS lo,
                                   CAST(max(ts) AS DATE) AS hi FROM events),
            days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
                     FROM bounds),
            cnt AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
                    FROM events WHERE value >= 300.0 GROUP BY 1)
            SELECT strftime(days.d, '%Y-%m-%d') AS day,
                   CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_events
            FROM days LEFT JOIN cnt ON days.d = cnt.d
            ORDER BY day
        """,
        "q90_embedding_covariance": """
            WITH e AS (SELECT vec_id, unnest(embedding) AS v,
                              unnest(generate_series(0, len(embedding) - 1)) AS i
                       FROM embeddings)
            SELECT a.i AS i, b.i AS j, round(covar_samp(a.v, b.v), 6) AS cov
            FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i
            ORDER BY i, j
        """,
        "q91_interval_merge": """
            WITH iv AS (
                SELECT user_id, event_id, ts AS s,
                       ts + to_seconds(CAST(floor(value * 100) AS BIGINT)) AS e
                FROM events
            ),
            m AS (
                SELECT *, MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
                FROM iv
            ),
            g AS (
                SELECT *, SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id ORDER BY s, event_id) AS gid
                FROM m
            )
            SELECT user_id, CAST(gid AS BIGINT) AS interval_id,
                   MIN(s) AS start_ts, MAX(e) AS end_ts,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM g GROUP BY user_id, gid ORDER BY user_id, interval_id
        """,
        "q92_snapshot_diff": """
            WITH a AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 97 <> 0),
            b AS (SELECT o_orderkey,
                         CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice * 1.1, 4)
                              ELSE o_totalprice END AS o_totalprice
                  FROM orders WHERE o_orderkey % 89 <> 0)
            SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                   CASE WHEN a.o_orderkey IS NULL THEN 'added'
                        WHEN b.o_orderkey IS NULL THEN 'removed'
                        ELSE 'changed' END AS change_type,
                   coalesce(round(a.o_totalprice, 4), -1.0) AS old_price,
                   coalesce(round(b.o_totalprice, 4), -1.0) AS new_price
            FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
            WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
               OR a.o_totalprice <> b.o_totalprice
            ORDER BY o_orderkey
        """,
        "q93_referential_integrity": """
            SELECT * FROM (
                SELECT 'lineitem.l_partkey->part' AS relation,
                       CAST(count(*) AS BIGINT) AS fact_rows,
                       CAST(coalesce(sum(CASE WHEN d.p_partkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS orphan_rows,
                       CAST(count(DISTINCT CASE WHEN d.p_partkey IS NULL THEN l.l_partkey END) AS BIGINT) AS orphan_keys
                FROM lineitem l
                LEFT JOIN (SELECT p_partkey FROM part WHERE p_partkey % 13 <> 0) d
                  ON l.l_partkey = d.p_partkey
                UNION ALL
                SELECT 'lineitem.l_suppkey->supplier',
                       CAST(count(*) AS BIGINT),
                       CAST(coalesce(sum(CASE WHEN d.s_suppkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
                       CAST(count(DISTINCT CASE WHEN d.s_suppkey IS NULL THEN l.l_suppkey END) AS BIGINT)
                FROM lineitem l
                LEFT JOIN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 11 <> 0) d
                  ON l.l_suppkey = d.s_suppkey
                UNION ALL
                SELECT 'orders.o_custkey->customer',
                       CAST(count(*) AS BIGINT),
                       CAST(coalesce(sum(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
                       CAST(count(DISTINCT CASE WHEN d.c_custkey IS NULL THEN o.o_custkey END) AS BIGINT)
                FROM orders o
                LEFT JOIN (SELECT c_custkey FROM customer WHERE c_custkey % 17 <> 0) d
                  ON o.o_custkey = d.c_custkey
            ) ORDER BY relation
        """,
        "q94_skyline": """
            SELECT a.p_partkey,
                   round(a.p_retailprice, 4) AS p_retailprice,
                   CAST(a.p_size AS BIGINT) AS p_size
            FROM part a
            WHERE NOT EXISTS (
                SELECT 1 FROM part b
                WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
                  AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
            )
            ORDER BY a.p_partkey
        """,
        "q95_percent_rank": """
            SELECT o_orderkey, o_orderpriority,
                   round(percent_rank() OVER (
                       PARTITION BY o_orderpriority ORDER BY o_totalprice), 8) AS pct_rank
            FROM orders
        """,
        "q96_event_entropy": """
            WITH c AS (
                SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS n
                FROM events GROUP BY 1, 2
            )
            SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
                   round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 4) AS entropy
            FROM c GROUP BY user_id
        """,
        "q97_user_transitions": """
            WITH s AS (
                SELECT user_id, event_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
                FROM events
            )
            SELECT event_type AS prev_type, nxt AS next_type,
                   count(*) AS n_trans,
                   round(count(*) * 1.0 /
                         sum(count(*)) OVER (PARTITION BY event_type), 4) AS p_next
            FROM s WHERE nxt IS NOT NULL
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "er_canonical_names": """
            WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
            pairs AS (
                SELECT a.p_name AS x, b.p_name AS y
                FROM names a JOIN names b ON a.p_name <> b.p_name
                WHERE levenshtein(a.p_name, b.p_name) <= 2
            ),
            reach(node, lbl) AS (
                SELECT p_name, p_name FROM names
                UNION
                SELECT p.x, r.lbl FROM pairs p JOIN reach r ON r.node = p.y
            )
            SELECT node AS name, min(lbl) AS canon_name
            FROM reach GROUP BY node ORDER BY name
        """,
        "q80_unigram_logppl": r"""
            WITH toks AS (
                SELECT doc_id, t AS token FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t <> ''
            ),
            tf AS (SELECT token, count(*)::DOUBLE AS tf FROM toks GROUP BY token),
            tot AS (SELECT count(*)::DOUBLE AS n FROM toks)
            SELECT toks.doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(-avg(ln(tf.tf / tot.n)), 4) AS logppl
            FROM toks JOIN tf USING (token), tot
            GROUP BY toks.doc_id
        """,
        "q81_copurchase_pairs": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM lp a JOIN lp b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            ORDER BY n_orders DESC, part_a, part_b
            LIMIT 100
        """,
        "q82_triangle_count": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
                  FROM lp a JOIN lp b
                    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM e e1
            JOIN e e2 ON e2.x = e1.y
            JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
        """,
        "q83_brand_mad_outliers": """
            WITH med AS (
                SELECT p_brand, count(*) AS n_parts,
                       median(p_retailprice) AS med
                FROM part GROUP BY p_brand
            ),
            dev AS (
                SELECT p.p_brand, abs(p.p_retailprice - m.med) AS ad
                FROM part p JOIN med m USING (p_brand)
            ),
            mad AS (SELECT p_brand, median(ad) AS mad FROM dev GROUP BY p_brand)
            SELECT m.p_brand,
                   CAST(m.n_parts AS BIGINT) AS n_parts,
                   round(m.med, 4) AS median_price,
                   round(d.mad, 4) AS mad,
                   CAST(count(*) FILTER (WHERE dev.ad > (3.0 * 1.4826) * d.mad) AS BIGINT)
                       AS n_outliers
            FROM dev JOIN med m USING (p_brand) JOIN mad d USING (p_brand)
            GROUP BY m.p_brand, m.n_parts, m.med, d.mad
        """,
        "q84_brand_price_regression": """
            WITH s AS (
                SELECT p_brand,
                       count(*)::DOUBLE AS n,
                       sum(p_size::DOUBLE) AS sx,
                       sum(p_retailprice) AS sy,
                       sum(p_size::DOUBLE * p_size::DOUBLE) AS sxx,
                       sum(p_size::DOUBLE * p_retailprice) AS sxy
                FROM part GROUP BY p_brand
            )
            SELECT p_brand,
                   CAST(n AS BIGINT) AS n_parts,
                   round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
                   round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
                       AS intercept
            FROM s
        """,
        "q79_event_type_share": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   round(count(*)::DOUBLE / (SELECT count(*) FROM events), 4) AS share
            FROM events GROUP BY event_type
        """,
        "q76_order_cube": """
            SELECT coalesce(o_orderpriority, '(all)') AS priority,
                   coalesce(o_orderstatus, '(all)') AS status,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
        """,
        "q107_daily_orders_vs_events": """
            WITH o AS (
                SELECT date_trunc('day', o_orderdate) AS day,
                       CAST(count(*) AS BIGINT) AS n_orders
                FROM orders GROUP BY 1),
            e AS (
                SELECT date_trunc('day', ts) AS day,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM events GROUP BY 1)
            SELECT CAST(coalesce(o.day, e.day) AS TIMESTAMP) AS day,
                   CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
                   CAST(coalesce(n_events, 0) AS BIGINT) AS n_events
            FROM o FULL OUTER JOIN e ON o.day = e.day
        """,
        "q108_upsert_latest": """
            SELECT user_id, event_type, event_id, ts, value FROM (
                SELECT user_id, event_type, event_id, ts, value,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn = 1
        """,
        "q109_scd2_intervals": """
            WITH o AS (
                SELECT user_id, event_type, ts, event_id,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS prev_type
                FROM events),
            c AS (
                SELECT user_id, event_type, ts, event_id FROM o
                WHERE prev_type IS NULL OR event_type <> prev_type)
            SELECT user_id, event_type, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
            FROM c
        """,
        "q110_user_value_ewma": """
            WITH o AS (
                SELECT user_id,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM events)
            SELECT user_id,
                   round(sum((cents / 100.0) *
                             (CASE WHEN rn = 1 THEN power(0.5, n - 1)
                                   ELSE 0.5 * power(0.5, n - rn) END)), 4) AS ewma
            FROM o GROUP BY user_id
        """,
        "q111_chisq_independence": """
            WITH c AS (
                SELECT event_type, isodow(ts) AS dow,
                       CAST(count(*) AS DOUBLE) AS o
                FROM events GROUP BY 1, 2),
            t AS (
                SELECT o,
                       sum(o) OVER (PARTITION BY event_type) AS r,
                       sum(o) OVER (PARTITION BY dow) AS k,
                       sum(o) OVER () AS n
                FROM c)
            SELECT round(sum((o - r*k/n)*(o - r*k/n)/(r*k/n)), 4) AS chi2,
                   (SELECT CAST((count(DISTINCT event_type) - 1)
                                * (count(DISTINCT isodow(ts)) - 1) AS BIGINT)
                    FROM events) AS dof
            FROM t
        """,
        "q112_weighted_median": """
            WITH w AS (
                SELECT l_returnflag, l_extendedprice AS price,
                       sum(l_quantity) AS wt
                FROM lineitem GROUP BY 1, 2),
            c AS (
                SELECT l_returnflag, price,
                       sum(wt) OVER (PARTITION BY l_returnflag ORDER BY price
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
                       sum(wt) OVER (PARTITION BY l_returnflag) AS tot
                FROM w)
            SELECT l_returnflag, round(min(price), 4) AS wmedian
            FROM c WHERE cw >= tot / 2.0 GROUP BY l_returnflag
        """,
        "q113_linear_interp": """
            WITH d AS (
                SELECT event_type, date_trunc('day', ts) AS day,
                       round((CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                              / 100.0) / count(*), 4) AS v
                FROM events GROUP BY 1, 2),
            b AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM d GROUP BY 1),
            nums AS (
                SELECT unnest(generate_series(
                    0, (SELECT CAST(max(date_diff('day', lo, hi)) AS BIGINT) FROM b))) AS i),
            spine AS (
                SELECT b.event_type, b.lo + to_days(CAST(n.i AS INTEGER)) AS day
                FROM b JOIN nums n ON n.i <= date_diff('day', b.lo, b.hi)),
            j AS (
                SELECT s.event_type, s.day, d.v FROM spine s
                LEFT JOIN d ON d.event_type = s.event_type AND d.day = s.day),
            w AS (
                SELECT event_type, day, v,
                       last_value(v IGNORE NULLS) OVER
                           (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                       last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
                           (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                       first_value(v IGNORE NULLS) OVER
                           (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                       first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
                           (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
                FROM j)
            SELECT event_type, CAST(day AS TIMESTAMP) AS day,
                   round(CASE WHEN v IS NOT NULL THEN v
                              WHEN pv IS NULL OR nv IS NULL THEN NULL
                              ELSE pv + (nv - pv) *
                                   (date_diff('day', pd, day) / date_diff('day', pd, nd))
                         END, 4) AS v_interp,
                   (v IS NOT NULL) AS observed
            FROM w
        """,
        "q114_readability": """
            WITH m AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\\S+')) AS n_words,
                       greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
                       length(regexp_replace(text, '\\s', '', 'g')) AS n_chars
                FROM documents)
            SELECT doc_id,
                   CAST(n_words AS BIGINT) AS n_words,
                   CAST(n_sentences AS BIGINT) AS n_sentences,
                   round(4.71 * (CAST(n_chars AS DOUBLE) / n_words)
                         + (0.5 * (CAST(n_words AS DOUBLE) / n_sentences) - 21.43), 4) AS ari
            FROM m WHERE n_words > 0
        """,
        "q115_longest_streak": """
            WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
            r AS (SELECT user_id, day,
                         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
                  FROM d),
            g AS (SELECT user_id,
                         date_diff('day', TIMESTAMP '1970-01-01', day) - rn AS grp
                  FROM r),
            s AS (SELECT user_id, grp, count(*) AS n FROM g GROUP BY 1, 2)
            SELECT user_id, CAST(max(n) AS BIGINT) AS longest_streak FROM s GROUP BY user_id
        """,
        "q116_session_conversion": """
            WITH o AS (
                SELECT user_id, event_id, ts, event_type,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
                SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM o),
            c AS (
                SELECT user_id, sid, event_type,
                       max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS seen_click
                FROM s),
            f AS (
                SELECT user_id, sid,
                       max(CASE WHEN event_type = 'purchase' AND seen_click = 1
                                THEN 1 ELSE 0 END) AS hit
                FROM c GROUP BY 1, 2)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(sum(hit) AS BIGINT) AS n_converted
            FROM f GROUP BY user_id
        """,
        "q117_autocorr_lag1": """
            WITH d AS (
                SELECT event_type, date_trunc('day', ts) AS day,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM events GROUP BY 1, 2),
            b AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM d GROUP BY 1),
            nums AS (
                SELECT unnest(generate_series(
                    0, (SELECT CAST(max(date_diff('day', lo, hi)) AS BIGINT) FROM b))) AS i),
            spine AS (
                SELECT b.event_type, b.lo + to_days(CAST(n.i AS INTEGER)) AS day
                FROM b JOIN nums n ON n.i <= date_diff('day', b.lo, b.hi)),
            j AS (
                SELECT s.event_type, s.day, coalesce(d.cnt, 0) AS cnt
                FROM spine s LEFT JOIN d ON d.event_type = s.event_type AND d.day = s.day),
            p AS (
                SELECT event_type, cnt AS x,
                       lead(cnt) OVER (PARTITION BY event_type ORDER BY day) AS y
                FROM j),
            q AS (SELECT event_type, x, y FROM p WHERE y IS NOT NULL),
            sums AS (
                SELECT event_type, count(*) AS n,
                       sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
                       sum(x*x) AS sxx, sum(y*y) AS syy
                FROM q GROUP BY 1)
            SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
                   round((n * sxy - sx * sy) /
                         (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                          sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 4) AS autocorr
            FROM sums
            WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        """,
        "q118_minmax_scale": """
            WITH b AS (
                SELECT event_type, min(value) AS lo, max(value) AS hi
                FROM events GROUP BY 1)
            SELECT e.event_id,
                   CASE WHEN b.hi > b.lo
                        THEN round((e.value - b.lo) / (b.hi - b.lo), 4) END AS scaled
            FROM events e JOIN b USING (event_type)
        """,
        "q119_seasonality_strength": """
            WITH d AS (
                SELECT event_type, date_trunc('day', ts) AS day,
                       CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2),
            dw AS (
                SELECT event_type, isodow(day) AS dow,
                       sum(n) AS s, count(*) AS c
                FROM d GROUP BY 1, 2),
            tot AS (
                SELECT event_type, sum(n) AS sn, sum(n*n) AS snn,
                       count(*) AS nd
                FROM d GROUP BY 1),
            bt AS (
                SELECT event_type, sum(CAST(s*s AS DOUBLE) / c) AS sb
                FROM dw GROUP BY 1)
            SELECT t.event_type, CAST(t.nd AS BIGINT) AS n_days,
                   round((bt.sb - CAST(t.sn*t.sn AS DOUBLE) / t.nd)
                         / (t.snn - CAST(t.sn*t.sn AS DOUBLE) / t.nd), 4)
                       AS seasonality_r2
            FROM tot t JOIN bt USING (event_type)
            WHERE (t.snn - CAST(t.sn*t.sn AS DOUBLE) / t.nd) > 0
        """,
        "q120_distinct_user_rollup": """
            SELECT coalesce(event_type, '(all)') AS event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY ROLLUP(event_type)
        """,
        "q121_dup_span_stats": """
            WITH arr AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS a
                FROM documents),
            sp AS (
                SELECT DISTINCT doc_id,
                       a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' ' || a[i+3]
                            || ' ' || a[i+4] AS sh
                FROM arr, unnest(generate_series(1, len(a) - 4)) AS t(i)),
            dc AS (
                SELECT sh, count(DISTINCT doc_id) AS nd FROM sp GROUP BY sh)
            SELECT sp.doc_id,
                   CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(CASE WHEN dc.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_shared,
                   CAST(sum(CASE WHEN dc.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*) AS shared_ratio
            FROM sp JOIN dc USING (sh)
            GROUP BY sp.doc_id
        """,
        "q128_token_fertility": r"""
            SELECT source,
                   count(*) AS n_docs,
                   sum(length(text)) AS total_chars,
                   sum(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\r\n]'))) AS total_tokens,
                   round(sum(length(text)) * 1.0
                         / sum(len(regexp_extract_all(text,
                               '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\r\n]'))), 4)
                       AS chars_per_token
            FROM documents
            GROUP BY source
            ORDER BY source
        """,
        "q129_temperature_mix": r"""
            WITH s AS (
                SELECT source, count(*) AS n_docs
                FROM documents GROUP BY source)
            SELECT source, n_docs,
                   round(n_docs * 1.0 / sum(n_docs) OVER (), 6) AS raw_share,
                   round(pow(n_docs, 0.5) / sum(pow(n_docs, 0.5)) OVER (), 6)
                       AS weight
            FROM s
            ORDER BY source
        """,
        "q130_leakage_free_split": r"""
            WITH rep AS (
                SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY text) AS cluster_rep
                FROM documents)
            SELECT doc_id, cluster_rep,
                   CASE WHEN md5(CAST(cluster_rep AS VARCHAR))
                             < 'cccccccc000000000000000000000000'
                        THEN 'train' ELSE 'val' END AS split
            FROM rep
            ORDER BY doc_id
        """,
        "q131_source_quality_gate": r"""
            WITH s AS (
                SELECT doc_id, source,
                       round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                             / greatest(length(text), 1), 4) AS alpha_ratio
                FROM documents),
            t AS (
                SELECT source, quantile_disc(alpha_ratio, 0.75) AS thr
                FROM s GROUP BY source)
            SELECT s.doc_id, s.source, s.alpha_ratio
            FROM s JOIN t USING (source)
            WHERE s.alpha_ratio >= t.thr
            ORDER BY s.doc_id
        """,
        "q132_source_overlap": r"""
            WITH arr AS (
                SELECT source, regexp_split_to_array(trim(text), '\s+') AS a
                FROM documents),
            sp AS (
                SELECT DISTINCT source,
                       a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' ' || a[i+3]
                            || ' ' || a[i+4] AS sh
                FROM arr, unnest(generate_series(1, len(a) - 4)) AS t(i))
            SELECT x.source AS source_a, y.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM sp x JOIN sp y ON x.sh = y.sh AND x.source < y.source
            GROUP BY x.source, y.source
            ORDER BY source_a, source_b
        """,
        "q133_span_removal": r"""
            WITH arr AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                FROM documents),
            sp AS (
                SELECT doc_id, i,
                       a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' ' || a[i+3]
                            || ' ' || a[i+4] AS sh
                FROM arr, unnest(generate_series(1, len(a) - 4)) AS t(i)),
            own AS (
                SELECT sh, min(doc_id) AS owner, count(DISTINCT doc_id) AS nd
                FROM sp GROUP BY sh),
            rem AS (
                SELECT DISTINCT sp.doc_id, sp.i
                FROM sp JOIN own USING (sh)
                WHERE own.nd >= 2 AND sp.doc_id <> own.owner),
            cover AS (
                SELECT DISTINCT doc_id, i + o AS p
                FROM rem, unnest(generate_series(0, 4)) AS u(o)),
            tok AS (
                SELECT arr.doc_id, t.i AS p, arr.a[t.i] AS tk, len(arr.a) AS nt
                FROM arr, unnest(generate_series(1, len(arr.a))) AS t(i)
                WHERE arr.doc_id IN (SELECT doc_id FROM rem))
            SELECT tok.doc_id,
                   CAST(max(tok.nt) AS BIGINT) AS n_tokens,
                   CAST(count(cover.p) AS BIGINT) AS n_removed,
                   md5(coalesce(string_agg(
                       CASE WHEN cover.p IS NULL THEN tok.tk END,
                       ' ' ORDER BY tok.p), '')) AS clean_md5
            FROM tok LEFT JOIN cover
                 ON cover.doc_id = tok.doc_id AND cover.p = tok.p
            GROUP BY tok.doc_id
            ORDER BY tok.doc_id
        """,
        "q134_padding_waste": r"""
            WITH s AS (
                SELECT source,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+'))
                       END AS nt
                FROM documents),
            p AS (
                SELECT source, nt,
                       greatest(CAST(ceil(nt / 512.0) AS BIGINT), 1) * 512
                           AS padded
                FROM s)
            SELECT source,
                   count(*) AS n_docs,
                   sum(nt) AS total_tokens,
                   sum(padded) AS padded_tokens,
                   round(1.0 - sum(nt) * 1.0 / sum(padded), 4) AS waste_ratio
            FROM p
            GROUP BY source
            ORDER BY source
        """,
        "q135_dsir_logratio": r"""
            WITH toks AS (
                SELECT doc_id, lang, t AS token FROM (
                    SELECT doc_id, lang,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t <> ''),
            cnt AS (
                SELECT token, count(*)::DOUBLE AS c_raw,
                       sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE
                           AS c_tgt
                FROM toks GROUP BY token),
            tot AS (
                SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt,
                       count(*)::DOUBLE AS v
                FROM cnt)
            SELECT toks.doc_id,
                   CAST(count(*) AS BIGINT) AS n_tok,
                   round(sum(ln(cnt.c_tgt + 1) - ln(cnt.c_raw + 1)
                             + ln(tot.n_raw + tot.v)
                             - ln(tot.n_tgt + tot.v)), 4) AS logw
            FROM toks JOIN cnt USING (token), tot
            GROUP BY toks.doc_id
            ORDER BY toks.doc_id
        """,
        "q136_gopher_repetition": r"""
            WITH arr AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                FROM documents WHERE trim(text) <> ''),
            tok AS (
                SELECT doc_id, t.i AS p, a[t.i] AS tk, length(a[t.i]) AS ln
                FROM arr, unnest(generate_series(1, len(a))) AS t(i)),
            base AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
                       CAST(sum(ln) AS BIGINT) AS total_chars
                FROM tok GROUP BY doc_id),
            g3 AS (
                SELECT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS g,
                       length(a[i]) + length(a[i+1]) + length(a[i+2]) AS gc
                FROM arr, unnest(generate_series(1, len(a) - 2)) AS t(i)),
            top3 AS (
                SELECT doc_id, max(cnt * gc) AS cov FROM (
                    SELECT doc_id, g, count(*) AS cnt, max(gc) AS gc
                    FROM g3 GROUP BY doc_id, g)
                GROUP BY doc_id),
            g5 AS (
                SELECT doc_id, i,
                       a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' '
                            || a[i+3] || ' ' || a[i+4] AS g
                FROM arr, unnest(generate_series(1, len(a) - 4)) AS t(i)),
            dup AS (
                SELECT doc_id, i FROM (
                    SELECT doc_id, i,
                           count(*) OVER (PARTITION BY doc_id, g) AS c
                    FROM g5)
                WHERE c > 1),
            cover AS (
                SELECT DISTINCT doc_id, i + o AS p
                FROM dup, unnest(generate_series(0, 4)) AS u(o)),
            dupc AS (
                SELECT tok.doc_id, sum(tok.ln) AS dchars
                FROM tok JOIN cover
                     ON cover.doc_id = tok.doc_id AND cover.p = tok.p
                GROUP BY tok.doc_id)
            SELECT doc_id, n_tok, total_chars, top3_frac, dup5_frac,
                   CAST(CASE WHEN top3_frac <= 0.18 AND dup5_frac <= 0.15
                             THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM (
                SELECT base.doc_id, base.n_tok, base.total_chars,
                       round(coalesce(top3.cov, 0) / base.total_chars, 4)
                           AS top3_frac,
                       round(coalesce(dupc.dchars, 0) / base.total_chars, 4)
                           AS dup5_frac
                FROM base
                LEFT JOIN top3 USING (doc_id)
                LEFT JOIN dupc USING (doc_id))
            ORDER BY doc_id
        """,
        "q137_zipf_alpha": r"""
            WITH toks AS (
                SELECT source, t AS token FROM (
                    SELECT source,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t <> ''),
            tf AS (
                SELECT source, token, count(*)::DOUBLE AS tf
                FROM toks GROUP BY source, token),
            ranked AS (
                SELECT source, tf,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY tf DESC, token) AS r
                FROM tf),
            v AS (SELECT source, CAST(count(*) AS BIGINT) AS n_vocab
                  FROM tf GROUP BY source)
            SELECT ranked.source, v.n_vocab,
                   round(regr_slope(ln(tf), ln(r)), 4) AS alpha
            FROM ranked JOIN v USING (source)
            WHERE r <= 100
            GROUP BY ranked.source, v.n_vocab
            ORDER BY source
        """,
        "q138_ppl_buckets": r"""
            WITH toks AS (
                SELECT doc_id, t AS token FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t <> ''),
            tf AS (SELECT token, count(*)::DOUBLE AS tf FROM toks GROUP BY token),
            tot AS (SELECT count(*)::DOUBLE AS n FROM toks),
            scored AS (
                SELECT toks.doc_id,
                       round(-avg(ln(tf.tf / tot.n)), 4) AS logppl
                FROM toks JOIN tf USING (token), tot
                GROUP BY toks.doc_id),
            pr AS (
                SELECT s.doc_id, d.lang, s.logppl,
                       percent_rank() OVER (PARTITION BY d.lang
                                            ORDER BY s.logppl) AS pct
                FROM scored s JOIN documents d USING (doc_id))
            SELECT doc_id, lang, logppl,
                   CASE WHEN pct < 1.0 / 3 THEN 'head'
                        WHEN pct < 2.0 / 3 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM pr
            ORDER BY doc_id
        """,
        "q139_boilerplate_ngrams": r"""
            WITH arr AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                FROM documents WHERE trim(text) <> ''),
            sp AS (
                SELECT doc_id,
                       a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' '
                            || a[i+3] || ' ' || a[i+4] || ' ' || a[i+5]
                            || ' ' || a[i+6] || ' ' || a[i+7] AS ngram
                FROM arr, unnest(generate_series(1, len(a) - 7)) AS t(i))
            SELECT ngram,
                   CAST(count(*) AS BIGINT) AS occurrences,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM sp
            GROUP BY ngram
            ORDER BY occurrences DESC, ngram
            LIMIT 50
        """,
        "q124_bm25_topk": r"""
            WITH tok AS (
                SELECT doc_id, t AS token FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t <> ''),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
            st AS (SELECT (SELECT count(*) FROM tok) * 1.0
                          / (SELECT count(*) FROM documents) AS avgdl),
            nd AS (SELECT count(*) AS n FROM documents),
            dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
                    WHERE token IN ('spark', 'join', 'fast') GROUP BY token),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
                   WHERE token IN ('spark', 'join', 'fast')
                   GROUP BY doc_id, token)
            SELECT doc_id, ROUND(s, 4) AS bm25 FROM (
                SELECT tf.doc_id,
                       sum(ln((nd.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1)
                           * tf.tf * 2.2
                           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)))
                           AS s
                FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id), nd, st
                GROUP BY tf.doc_id)
            ORDER BY ROUND(s, 4) DESC, doc_id
            LIMIT 100
        """,
        "q127_hybrid_retrieval": r"""
            WITH tok AS (
                SELECT doc_id, t AS token FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t <> ''),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
            st AS (SELECT (SELECT count(*) FROM tok) * 1.0
                          / (SELECT count(*) FROM documents) AS avgdl),
            nd AS (SELECT count(*) AS n FROM documents),
            dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
                    WHERE token IN ('spark', 'join', 'fast') GROUP BY token),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
                   WHERE token IN ('spark', 'join', 'fast')
                   GROUP BY doc_id, token),
            bm AS (
                SELECT doc_id, ROUND(s, 4) AS bm25 FROM (
                    SELECT tf.doc_id,
                           sum(ln((nd.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1)
                               * tf.tf * 2.2
                               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)))
                               AS s
                    FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id), nd, st
                    GROUP BY tf.doc_id)
                ORDER BY ROUND(s, 4) DESC, doc_id
                LIMIT 200),
            q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
            SELECT bm.doc_id, bm.bm25,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                CAST(q.embedding AS DOUBLE[])), 4)
                       AS cos_sim
            FROM bm JOIN embeddings e ON e.vec_id = bm.doc_id, q
            ORDER BY cos_sim DESC, bm.doc_id
            LIMIT 10
        """,
        "q125_source_divergence": r"""
            WITH tok AS (
                SELECT source, t AS token FROM (
                    SELECT source,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t <> ''),
            cnt AS (SELECT source, token, count(*) AS n FROM tok
                    GROUP BY source, token),
            stot AS (SELECT source, sum(n) AS st FROM cnt GROUP BY source),
            g AS (SELECT sum(n) AS gt FROM cnt),
            ttot AS (SELECT token, sum(n) AS tt FROM cnt GROUP BY token),
            kl AS (
                SELECT cnt.source,
                       sum((cnt.n * 1.0 / stot.st)
                           * ln((cnt.n * 1.0 / stot.st)
                                / (ttot.tt * 1.0 / g.gt))) AS kl_raw
                FROM cnt JOIN stot USING (source) JOIN ttot USING (token), g
                GROUP BY cnt.source)
            SELECT source, CAST(st AS BIGINT) AS n_tokens,
                   ROUND(kl_raw, 4) AS kl
            FROM kl JOIN stot USING (source)
            ORDER BY source
        """,
        "q126_mixture_budget": """
            SELECT source, doc_id, n_chars FROM (
                SELECT source, doc_id, n_chars,
                       sum(n_chars) OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                           ROWS UNBOUNDED PRECEDING) AS c
                FROM documents)
            WHERE c <= 20000
        """,
        "q122_order_ntile": """
            SELECT o_orderkey,
                   CAST(ntile(8) OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_totalprice, o_orderkey)
                        AS BIGINT) AS tile
            FROM orders
        """,
        "q123_event_grouping_sets": """
            SELECT coalesce(event_type, '(all)') AS event_type,
                   CAST(coalesce(isodow(ts), -1) AS BIGINT) AS dow,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY GROUPING SETS ((event_type, isodow(ts)), (event_type),
                                    (isodow(ts)))
        """,
        "q140_validation_report": """
            WITH base AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
            dups AS (
                SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS d FROM (
                    SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)
                WHERE c > 1)
            SELECT rule, (SELECT n FROM base) AS n_checked,
                   CAST(n_violations AS BIGINT) AS n_violations,
                   CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS ok
            FROM (
                SELECT 'o_orderkey_not_null' AS rule,
                       (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS n_violations
                UNION ALL
                SELECT 'o_orderkey_unique', (SELECT d FROM dups)
                UNION ALL
                SELECT 'o_orderpriority_format',
                       (SELECT count(*) FROM orders
                        WHERE NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$'))
                UNION ALL
                SELECT 'o_orderstatus_in_set',
                       (SELECT count(*) FROM orders
                        WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
                UNION ALL
                SELECT 'o_totalprice_range',
                       (SELECT count(*) FROM orders
                        WHERE o_totalprice < 1000.0 OR o_totalprice > 300000.0
                           OR o_totalprice IS NULL))
            ORDER BY rule
        """,
        "q141_global_median_exact": """
            SELECT CAST(count(l_extendedprice) AS BIGINT) AS n,
                   round(median(l_extendedprice), 4) AS median
            FROM lineitem
        """,
        "q143_fuzzy_decontaminate": r"""
            WITH tk AS (
                SELECT doc_id, source,
                       list_filter(regexp_split_to_array(trim(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            csh AS (
                SELECT DISTINCT doc_id, array_to_string(toks[i : i + 4], ' ') AS s
                FROM tk, UNNEST(generate_series(1, len(toks) - 4)) AS u(i)
                WHERE len(toks) >= 5 AND source <> 'src0'),
            bsh AS (
                SELECT DISTINCT doc_id AS bdoc, array_to_string(toks[i : i + 4], ' ') AS s
                FROM tk, UNNEST(generate_series(1, len(toks) - 4)) AS u(i)
                WHERE len(toks) >= 5 AND source = 'src0'),
            csz AS (SELECT doc_id, count(*) AS sz FROM csh GROUP BY doc_id),
            bsz AS (SELECT bdoc, count(*) AS bsz FROM bsh GROUP BY bdoc),
            inter AS (
                SELECT c.doc_id, b.bdoc, count(*) AS i
                FROM csh c JOIN bsh b ON c.s = b.s
                GROUP BY 1, 2),
            scored AS (
                SELECT doc_id, bdoc,
                       i::DOUBLE / (csz.sz + bsz.bsz - i) AS jac
                FROM inter
                JOIN csz USING (doc_id)
                JOIN bsz USING (bdoc))
            SELECT doc_id, block_doc, round(jac, 4) AS jaccard
            FROM (
                SELECT doc_id, bdoc AS block_doc, jac,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY jac DESC, bdoc) AS rn
                FROM scored WHERE jac >= 0.1)
            WHERE rn = 1
        """,
        "q142_k_anonymity": """
            SELECT c_nationkey, c_mktsegment,
                   CAST(count(*) AS BIGINT) AS class_n,
                   CAST(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS BIGINT)
                       AS anonymous
            FROM customer GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q144_gini_spend": """
            WITH spend AS (
                SELECT o_custkey, sum(o_totalprice) AS s
                FROM orders GROUP BY 1),
            r AS (
                SELECT s,
                       row_number() OVER (ORDER BY s) AS i,
                       count(*) OVER () AS n,
                       sum(s) OVER () AS tot
                FROM spend)
            SELECT CAST(max(n) AS BIGINT) AS n,
                   round(2.0 * sum(i * s) / (max(n) * max(tot))
                         - (max(n) + 1.0) / max(n), 6) AS gini
            FROM r
        """,
        "q145_iqr_outliers": """
            WITH f AS (
                SELECT o_orderpriority,
                       quantile_cont(o_totalprice, 0.25) AS q1,
                       quantile_cont(o_totalprice, 0.75) AS q3
                FROM orders GROUP BY 1)
            SELECT o.o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1) + 1e-6
                                   OR o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1) - 1e-6
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM orders o JOIN f USING (o_orderpriority)
            GROUP BY 1
        """,
        "q146_dau_jaccard": """
            WITH d AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
            cnt AS (
                SELECT day, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
            b AS (
                SELECT a.day AS day, CAST(count(*) AS BIGINT) AS n_both
                FROM d a JOIN d y ON a.user_id = y.user_id
                                 AND y.day = a.day - to_days(1)
                GROUP BY 1)
            SELECT CAST(c.day AS TIMESTAMP) AS day,
                   c.n AS n_cur, p.n AS n_prev,
                   COALESCE(b.n_both, 0) AS n_both,
                   round(COALESCE(b.n_both, 0)::DOUBLE
                         / (c.n + p.n - COALESCE(b.n_both, 0)), 4) AS jaccard
            FROM cnt c
            JOIN cnt p ON p.day = c.day - to_days(1)
            LEFT JOIN b ON b.day = c.day
        """,
        "q147_time_to_convert": """
            WITH s AS (
                SELECT user_id, min(ts) AS sts FROM events
                WHERE event_type = 'signup' GROUP BY 1),
            p AS (
                SELECT e.user_id, min(e.ts) AS pts
                FROM events e JOIN s ON e.user_id = s.user_id
                WHERE e.event_type = 'purchase' AND e.ts >= s.sts
                GROUP BY 1),
            d AS (
                SELECT date_trunc('week', s.sts) AS cohort_week,
                       CAST(epoch_us(p.pts) - epoch_us(s.sts) AS BIGINT) AS diff_us
                FROM s JOIN p USING (user_id))
            SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
                   CAST(count(*) AS BIGINT) AS n_converted,
                   median(CAST(diff_us AS DOUBLE)) AS median_us
            FROM d GROUP BY 1
        """,
        "q173_net_revenue_monthly": """
            SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
                   CAST(count(*) AS BIGINT) AS n_items,
                   round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
                                  * (100 + CAST(round(l_tax * 100) AS BIGINT)))
                              AS DOUBLE) / 1e6, 2) AS net_revenue
            FROM lineitem
            GROUP BY 1
        """,
        "q171_nation_flow_matrix": """
            WITH c AS (
                SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                           AS cents
                FROM lineitem l
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation ns ON s.s_nationkey = ns.n_nationkey
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer cu ON o.o_custkey = cu.c_custkey
                JOIN nation nc ON cu.c_nationkey = nc.n_nationkey
                GROUP BY 1, 2)
            SELECT supp_nation, cust_nation,
                   round(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue
            FROM c
        """,
        "q172_new_vs_repeat_revenue": """
            WITH o AS (
                SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                FROM orders),
            f AS (SELECT o_custkey, min(month) AS first_month FROM o GROUP BY 1),
            s AS (
                SELECT o.month,
                       sum(CASE WHEN o.month = f.first_month
                                THEN o.cents ELSE 0 END) AS new_c,
                       sum(o.cents) AS all_c
                FROM o JOIN f USING (o_custkey)
                GROUP BY 1)
            SELECT CAST(month AS TIMESTAMP) AS month,
                   round(CAST(new_c AS DOUBLE) / 100.0, 2) AS new_revenue,
                   round(CAST(all_c - new_c AS DOUBLE) / 100.0, 2)
                       AS repeat_revenue
            FROM s
        """,
        "q169_brand_price_bands": """
            WITH t AS (
                SELECT quantile_disc(p_retailprice, 1.0 / 3) AS t1,
                       quantile_disc(p_retailprice, 2.0 / 3) AS t2
                FROM part),
            b AS (
                SELECT p_brand,
                       CASE WHEN p_retailprice > t.t2 THEN 'high'
                            WHEN p_retailprice > t.t1 THEN 'mid'
                            ELSE 'low' END AS band
                FROM part CROSS JOIN t),
            c AS (SELECT p_brand, band, CAST(count(*) AS BIGINT) AS n_parts
                  FROM b GROUP BY 1, 2)
            SELECT p_brand, band, n_parts,
                   round(CAST(n_parts AS DOUBLE)
                         / sum(n_parts) OVER (PARTITION BY p_brand), 6) AS share
            FROM c
        """,
        "q170_design_effect": """
            WITH s AS (
                SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                       sum(CAST(l_quantity AS BIGINT)) AS sw,
                       sum(CAST(l_quantity AS BIGINT)
                           * CAST(l_quantity AS BIGINT)) AS sw2
                FROM lineitem GROUP BY 1)
            SELECT l_returnflag, n AS n_rows,
                   round((CAST(sw AS DOUBLE) * sw) / sw2, 4) AS ess
            FROM s
        """,
        "q168_retention_curve": """
            WITH u AS (
                SELECT user_id,
                       CAST(date_diff('day', min(CAST(ts AS DATE)),
                                      max(CAST(ts AS DATE))) AS BIGINT)
                           AS span_days
                FROM events GROUP BY 1),
            h AS (SELECT span_days, CAST(count(*) AS BIGINT) AS n_users
                  FROM u GROUP BY 1)
            SELECT span_days, n_users,
                   CAST(sum(n_users) OVER (ORDER BY span_days DESC) AS BIGINT)
                       AS surviving,
                   round(CAST(sum(n_users) OVER (ORDER BY span_days DESC)
                              AS DOUBLE)
                         / (SELECT CAST(sum(n_users) AS DOUBLE) FROM h), 6)
                       AS retention
            FROM h
        """,
        "q167_customer_order_gap_median": """
            WITH g AS (
                SELECT o_custkey,
                       date_diff('day',
                                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey),
                                 o_orderdate) AS gap
                FROM orders)
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
                   round(median(CAST(gap AS DOUBLE)), 4) AS median_gap_days
            FROM g WHERE gap IS NOT NULL
            GROUP BY 1
        """,
        "q166_session_duration_quantiles": """
            WITH s AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS ns
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            g AS (
                SELECT user_id, ts,
                       sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
                FROM s),
            ses AS (
                SELECT user_id, sid,
                       (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                           AS duration_s
                FROM g GROUP BY 1, 2
                HAVING count(*) >= 2)
            SELECT CAST(count(*) AS BIGINT) AS n_sessions,
                   round(quantile_cont(CAST(duration_s AS DOUBLE), 0.5), 4) AS p50_s,
                   round(quantile_cont(CAST(duration_s AS DOUBLE), 0.9), 4) AS p90_s
            FROM ses
        """,
        "q165_open_order_backlog": """
            WITH iv AS (
                SELECT o.o_orderdate AS sd, max(l.l_shipdate) AS ed
                FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
                GROUP BY o.o_orderkey, o.o_orderdate),
            deltas AS (
                SELECT sd AS day, CAST(1 AS BIGINT) AS delta FROM iv
                UNION ALL
                SELECT ed AS day, CAST(-1 AS BIGINT) AS delta FROM iv),
            g AS (SELECT day, sum(delta) AS d FROM deltas GROUP BY 1)
            SELECT CAST(day AS TIMESTAMP) AS day,
                   CAST(sum(d) OVER (ORDER BY day) AS BIGINT) AS open_orders
            FROM g
        """,
        "q164_cusum_changepoint": """
            WITH d AS (
                SELECT event_type, date_trunc('day', ts) AS day,
                       CAST(round(round((CAST(sum(CAST(round(value * 100) AS BIGINT))
                                              AS DOUBLE) / 100.0)
                                        / count(*), 4) * 10000) AS BIGINT) AS x4
                FROM events GROUP BY 1, 2),
            c AS (
                SELECT event_type, day, x4,
                       sum(x4) OVER (PARTITION BY event_type ORDER BY day) AS cum,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY day) AS i,
                       sum(x4) OVER (PARTITION BY event_type) AS tot,
                       count(*) OVER (PARTITION BY event_type) AS nd
                FROM d),
            k AS (
                SELECT event_type, day, nd,
                       abs(nd * cum - i * tot) AS adev,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY abs(nd * cum - i * tot) DESC,
                                                   day) AS rn
                FROM c)
            SELECT event_type, CAST(day AS TIMESTAMP) AS change_day,
                   CAST(nd AS BIGINT) AS n_days, CAST(adev AS BIGINT) AS peak_dev
            FROM k WHERE rn = 1
        """,
        "q163_conversion_ztest": """
            WITH c AS (
                SELECT CAST(isodow(ts) AS BIGINT) AS dow,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS x
                FROM events WHERE event_type IN ('click', 'purchase')
                GROUP BY 1),
            t AS (SELECT sum(n) AS N, sum(x) AS X FROM c)
            SELECT c.dow, c.n AS n_events, c.x AS n_purchases,
                   round((CAST(c.x AS DOUBLE) / c.n
                          - (CAST(t.X AS DOUBLE) - c.x)
                            / (CAST(t.N AS DOUBLE) - c.n))
                         / sqrt((CAST(t.X AS DOUBLE) / t.N)
                                * (1.0 - CAST(t.X AS DOUBLE) / t.N)
                                * (1.0 / c.n
                                   + 1.0 / (CAST(t.N AS DOUBLE) - c.n))), 6) AS z
            FROM c CROSS JOIN t
        """,
        "q162_supplier_hhi": """
            WITH s AS (
                SELECT p.p_type, l.l_suppkey,
                       sum(CAST(l_quantity AS BIGINT)) AS qty
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                GROUP BY 1, 2)
            SELECT p_type, CAST(count(*) AS BIGINT) AS n_suppliers,
                   round(CAST(sum(qty * qty) AS DOUBLE)
                         / (CAST(sum(qty) AS DOUBLE) * sum(qty)), 6) AS hhi
            FROM s GROUP BY 1
        """,
        "q181_source_lang_purity": """
            WITH c AS (
                SELECT source, lang, CAST(count(*) AS BIGINT) AS n
                FROM documents GROUP BY 1, 2),
            r AS (
                SELECT source, lang, n,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY n DESC, lang) AS rn,
                       sum(n) OVER (PARTITION BY source) AS total
                FROM c)
            SELECT source, lang AS dominant_lang,
                   CAST(total AS BIGINT) AS n_docs,
                   round(CAST(n AS DOUBLE) / total, 6) AS purity
            FROM r WHERE rn = 1
        """,
        "q182_prefix_family_diversity": """
            WITH d AS (
                SELECT substr(text, 1, 32) AS prefix, md5(text) AS h
                FROM documents)
            SELECT prefix,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT h) AS BIGINT) AS n_distinct
            FROM d GROUP BY 1
            HAVING count(*) >= 2
        """,
        "q180_clv_quartile_migration": """
            WITH o AS (
                SELECT o_custkey,
                       CAST(date_diff('day', DATE '1970-01-01',
                                      CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                FROM orders),
            f AS (SELECT o_custkey, min(day) AS fd FROM o GROUP BY 1),
            a AS (
                SELECT o.o_custkey,
                       sum(CASE WHEN o.day - f.fd < 365
                                THEN o.cents ELSE 0 END) AS y1,
                       sum(CASE WHEN o.day - f.fd >= 365 AND o.day - f.fd < 730
                                THEN o.cents ELSE 0 END) AS y2
                FROM o JOIN f USING (o_custkey) GROUP BY 1),
            t1 AS (SELECT quantile_disc(y1, 0.25) AS a1,
                          quantile_disc(y1, 0.50) AS a2,
                          quantile_disc(y1, 0.75) AS a3 FROM a),
            t2 AS (SELECT quantile_disc(y2, 0.25) AS b1,
                          quantile_disc(y2, 0.50) AS b2,
                          quantile_disc(y2, 0.75) AS b3 FROM a WHERE y2 > 0),
            q AS (
                SELECT (1 + (a.y1 > t1.a1)::INT + (a.y1 > t1.a2)::INT
                          + (a.y1 > t1.a3)::INT) AS q_year1,
                       CASE WHEN a.y2 <= 0 THEN 0
                            ELSE 1 + (a.y2 > t2.b1)::INT + (a.y2 > t2.b2)::INT
                                   + (a.y2 > t2.b3)::INT END AS q_year2
                FROM a CROSS JOIN t1 CROSS JOIN t2)
            SELECT CAST(q_year1 AS BIGINT) AS q_year1,
                   CAST(q_year2 AS BIGINT) AS q_year2,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM q GROUP BY 1, 2
        """,
        "q179_segment_priority_residuals": """
            WITH c AS (
                SELECT cu.c_mktsegment AS segment,
                       o.o_orderpriority AS priority,
                       CAST(count(*) AS BIGINT) AS o
                FROM orders o JOIN customer cu ON o.o_custkey = cu.c_custkey
                GROUP BY 1, 2),
            r AS (SELECT segment, sum(o) AS rn FROM c GROUP BY 1),
            s AS (SELECT priority, sum(o) AS cn FROM c GROUP BY 1),
            t AS (SELECT sum(o) AS n FROM c),
            grid AS (SELECT r.segment, s.priority, r.rn, s.cn
                     FROM r CROSS JOIN s)
            SELECT g.segment, g.priority,
                   COALESCE(c.o, 0) AS observed,
                   round(CAST(g.rn AS DOUBLE) * g.cn / t.n, 4) AS expected,
                   round((COALESCE(c.o, 0) - CAST(g.rn AS DOUBLE) * g.cn / t.n)
                         / sqrt(CAST(g.rn AS DOUBLE) * g.cn / t.n), 4)
                       AS residual
            FROM grid g
            LEFT JOIN c ON c.segment = g.segment AND c.priority = g.priority
            CROSS JOIN t
        """,
        "q185_quantity_discount_curve": """
            SELECT CAST(l_quantity AS BIGINT) AS qty,
                   CAST(count(*) AS BIGINT) AS n_items,
                   round((CAST(sum(CAST(round(l_discount * 100) AS BIGINT))
                               AS DOUBLE) / 100.0) / count(*), 6) AS avg_discount
            FROM lineitem GROUP BY 1
        """,
        "q210_monthly_supplier_hhi": """
            WITH q AS (
                SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
                       l_suppkey,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
                FROM lineitem GROUP BY 1, 2)
            SELECT month, CAST(count(*) AS BIGINT) AS n_suppliers,
                   round(CAST(sum(q * q) AS DOUBLE)
                         / (CAST(sum(q) AS DOUBLE) * sum(q)), 6) AS hhi
            FROM q GROUP BY 1
        """,
        "q211_discount_return_rate": """
            WITH c AS (
                SELECT CAST(round(l_discount * 100) AS BIGINT) AS d100,
                       CAST(count(*) AS BIGINT) AS n_items,
                       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_returned
                FROM lineitem GROUP BY 1)
            SELECT d100, n_items, n_returned,
                   round(CAST(n_returned AS DOUBLE) / n_items, 6) AS return_rate
            FROM c
        """,
        "q207_hill_tail_index": """
            WITH v AS (
                SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                FROM orders),
            t AS (SELECT quantile_disc(cents, 0.95) AS xmin FROM v),
            tail AS (
                SELECT CAST(count(*) AS BIGINT) AS n,
                       sum(ln(CAST(cents AS DOUBLE) / t.xmin)) AS ls
                FROM v CROSS JOIN t WHERE cents > t.xmin)
            SELECT CAST(t.xmin AS BIGINT) AS xmin_cents,
                   tail.n AS n_tail,
                   round(tail.n / tail.ls, 6) AS alpha
            FROM t CROSS JOIN tail
        """,
        "q208_heaps_exponent": r"""
            WITH c AS (
                SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM (
                    SELECT source,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                    FROM documents)
                WHERE tok <> ''
                GROUP BY 1, 2),
            p AS (
                SELECT source,
                       ln(CAST(count(*) AS DOUBLE)) AS y,
                       ln(CAST(sum(c) AS DOUBLE)) AS x
                FROM c GROUP BY 1),
            s AS (
                SELECT CAST(count(*) AS DOUBLE) AS k, sum(x) AS sx,
                       sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
                FROM p)
            SELECT CAST(k AS BIGINT) AS n_sources,
                   round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS beta,
                   round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx)
                         / k, 6) AS ln_k
            FROM s
        """,
        "q221_orders_per_customer_hist": """
            WITH c AS (
                SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
                FROM orders GROUP BY 1)
            SELECT k AS n_orders, CAST(count(*) AS BIGINT) AS n_customers
            FROM c GROUP BY 1
        """,
        "q222_brand_discount_depth": """
            WITH v AS (
                SELECT p.p_brand,
                       CAST(round(l.l_discount * 100) AS BIGINT) AS dc
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
            SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
                   round(CAST(sum(dc) AS DOUBLE) / (100 * count(*)), 6)
                       AS mean_discount,
                   round(CAST(sum(CASE WHEN dc > 0 THEN 1 ELSE 0 END)
                              AS DOUBLE) / count(*), 6) AS discounted_share
            FROM v GROUP BY 1
        """,
        "q230_weighted_median": """
            WITH w AS (
                SELECT l_extendedprice AS v,
                       CAST(round(l_quantity) AS BIGINT) AS q
                FROM lineitem),
            t AS (SELECT CAST(sum(q) AS BIGINT) AS W FROM w),
            c AS (SELECT v, CAST(sum(q) OVER (ORDER BY v) AS BIGINT) AS cw
                  FROM w)
            SELECT t.W AS total_weight, min(c.v) AS weighted_median
            FROM c, t WHERE 2 * c.cw >= t.W GROUP BY t.W
        """,
        "q229_type_catalog_profile": """
            WITH v AS (
                SELECT p_type, CAST(p_size AS BIGINT) AS sz,
                       CAST(round(p_retailprice * 100) AS BIGINT) AS c
                FROM part)
            SELECT p_type, CAST(count(*) AS BIGINT) AS n_parts,
                   round(CAST(sum(sz) AS DOUBLE) / count(*), 4) AS mean_size,
                   round((CAST(sum(c) AS DOUBLE) / count(*)) / 100, 4)
                       AS mean_price
            FROM v GROUP BY 1
        """,
        "q227_nation_negative_acctbal": """
            SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
                   CAST(sum(CASE WHEN CAST(round(s.s_acctbal * 100) AS BIGINT)
                                      < 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_negative,
                   round(CAST(sum(CASE WHEN CAST(round(s.s_acctbal * 100)
                                            AS BIGINT) < 0
                                       THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*), 6) AS negative_share
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY 1
        """,
        "q228_status_mix_by_year": """
            WITH v AS (
                SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)
                           AS year,
                       o_orderstatus
                FROM orders),
            g AS (
                SELECT year, o_orderstatus,
                       CAST(count(*) AS BIGINT) AS n_orders
                FROM v GROUP BY 1, 2),
            t AS (SELECT year, CAST(sum(n_orders) AS BIGINT) AS nt
                  FROM g GROUP BY 1)
            SELECT g.year, g.o_orderstatus, g.n_orders,
                   round(CAST(g.n_orders AS DOUBLE) / t.nt, 6) AS share
            FROM g JOIN t USING (year)
        """,
        "q225_priority_mix_by_month": """
            WITH v AS (
                SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE))
                            AS TIMESTAMP) AS month,
                       CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                            ELSE 0 END AS u,
                       CASE WHEN o_orderpriority = '2-HIGH' THEN 1
                            ELSE 0 END AS h
                FROM orders)
            SELECT month, CAST(count(*) AS BIGINT) AS n_orders,
                   round(CAST(sum(u) AS DOUBLE) / count(*), 6) AS urgent_share,
                   round(CAST(sum(h) AS DOUBLE) / count(*), 6) AS high_share
            FROM v GROUP BY 1
        """,
        "q226_user_lifespan_hist": """
            WITH s AS (
                SELECT user_id,
                       date_diff('day',
                                 CAST(date_trunc('day', min(ts)) AS DATE),
                                 CAST(date_trunc('day', max(ts)) AS DATE))
                           AS lifespan_days
                FROM events GROUP BY user_id)
            SELECT CAST(lifespan_days AS BIGINT) AS lifespan_days,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM s GROUP BY 1
        """,
        "q224_value_share_by_type": """
            WITH v AS (
                SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS c
                FROM events),
            t AS (SELECT CAST(sum(c) AS BIGINT) AS tc FROM v)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                   round(CAST(sum(c) AS DOUBLE) / 100, 2) AS total_value,
                   round(CAST(sum(c) AS DOUBLE) / t.tc, 6) AS value_share
            FROM v CROSS JOIN t GROUP BY event_type, t.tc
        """,
        "q223_weekday_hour_heatmap": """
            WITH v AS (
                SELECT CAST(isodow(ts) AS BIGINT) AS isodow,
                       CAST(hour(ts) AS BIGINT) AS hour
                FROM events),
            t AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM v)
            SELECT isodow, hour, CAST(count(*) AS BIGINT) AS n_events,
                   round(CAST(count(*) AS DOUBLE) / t.nt, 6) AS share
            FROM v CROSS JOIN t GROUP BY isodow, hour, t.nt
        """,
        "q219_brand_price_spread": """
            WITH v AS (
                SELECT p_brand,
                       CAST(round(p_retailprice * 100) AS BIGINT) AS c
                FROM part),
            a AS (
                SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(c) AS BIGINT) AS s,
                       CAST(min(c) AS BIGINT) AS mn,
                       CAST(max(c) AS BIGINT) AS mx
                FROM v GROUP BY 1)
            SELECT p_brand, n AS n_parts,
                   round(CAST(mn AS DOUBLE) / 100, 2) AS min_price,
                   round(CAST(mx AS DOUBLE) / 100, 2) AS max_price,
                   round((CAST(s AS DOUBLE) / n) / 100, 4) AS mean_price,
                   round(CAST(mx AS DOUBLE) / mn, 6) AS spread_ratio
            FROM a
        """,
        "q220_monthly_return_share": """
            WITH v AS (
                SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE))
                            AS TIMESTAMP) AS month,
                       CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
                FROM lineitem)
            SELECT month, CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(r) AS BIGINT) AS n_returned,
                   round(CAST(sum(r) AS DOUBLE) / count(*), 6) AS return_share
            FROM v GROUP BY 1
        """,
        "q217_event_type_cooccurrence": """
            WITH d AS (
                SELECT DISTINCT user_id,
                       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                       event_type
                FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_user_days
            FROM d a JOIN d b
              ON a.user_id = b.user_id AND a.day = b.day
             AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "q218_stopword_ratio": r"""
            WITH tok AS (
                SELECT source,
                       unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                FROM documents)
            SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN tok IN ('the','a','of','and','to','in',
                                              'is','on','for','with')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
                   round(CAST(sum(CASE WHEN tok IN ('the','a','of','and','to',
                                                    'in','is','on','for','with')
                                      THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*), 6) AS stop_share
            FROM tok WHERE tok <> '' GROUP BY 1
        """,
        "q215_segment_value_cv": """
            WITH j AS (
                SELECT c.c_mktsegment,
                       CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
            a AS (
                SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(cents) AS BIGINT) AS s,
                       sum(CAST(cents AS HUGEINT) * cents) AS q
                FROM j GROUP BY 1)
            SELECT c_mktsegment, n AS n_orders,
                   round((CAST(s AS DOUBLE) / n) / 100, 4) AS mean_value,
                   round(sqrt(greatest(CAST(q AS DOUBLE) / n
                                       - (CAST(s AS DOUBLE) / n)
                                         * (CAST(s AS DOUBLE) / n), 0))
                         / (CAST(s AS DOUBLE) / n), 6) AS cv
            FROM a
        """,
        "q216_charclass_density": r"""
            WITH d AS (
                SELECT source,
                       CAST(length(text) AS BIGINT) AS chars,
                       CAST(length(text)
                            - length(regexp_replace(text, '[0-9]', '', 'g'))
                            AS BIGINT) AS digits,
                       CAST(length(text)
                            - length(regexp_replace(text, '[.,!?]', '', 'g'))
                            AS BIGINT) AS puncts,
                       CAST(length(text)
                            - length(regexp_replace(text, '\s', '', 'g'))
                            AS BIGINT) AS spaces
                FROM documents)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(chars) AS BIGINT) AS n_chars,
                   round(CAST(sum(digits) AS DOUBLE) / sum(chars), 6)
                       AS digit_share,
                   round(CAST(sum(puncts) AS DOUBLE) / sum(chars), 6)
                       AS punct_share,
                   round(CAST(sum(spaces) AS DOUBLE) / sum(chars), 6)
                       AS space_share
            FROM d GROUP BY 1
        """,
        "q212_price_digit_benford": """
            WITH v AS (
                SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                                              AS BIGINT) AS VARCHAR),
                                   1, 1) AS BIGINT) AS digit
                FROM orders),
            t AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM v)
            SELECT digit, CAST(count(*) AS BIGINT) AS n,
                   round(CAST(count(*) AS DOUBLE) / t.nt, 6) AS share
            FROM v CROSS JOIN t GROUP BY digit, t.nt
        """,
        "q213_token_length_hist": r"""
            WITH tok AS (
                SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                FROM documents)
            SELECT CAST(length(tok) AS BIGINT) AS length,
                   CAST(count(*) AS BIGINT) AS n
            FROM tok WHERE tok <> '' GROUP BY 1
        """,
        "q214_embedding_dim_audit": """
            SELECT CAST(len(embedding) AS BIGINT) AS dim,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN len(list_filter(embedding,
                                     x -> isnan(CAST(x AS DOUBLE)))) > 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
                   CAST(sum(CASE WHEN len(embedding) > 0
                                  AND len(list_filter(embedding,
                                      x -> x <> 0)) = 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_allzero
            FROM embeddings GROUP BY 1
        """,
        "q209_price_ending_bias": """
            WITH v AS (
                SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS e
                FROM orders),
            t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v)
            SELECT t.n AS n_orders,
                   CAST(sum(CASE WHEN e = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_00,
                   round(CAST(sum(CASE WHEN e = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                         / t.n, 6) AS share_00,
                   CAST(sum(CASE WHEN e = 95 THEN 1 ELSE 0 END) AS BIGINT) AS n_95,
                   round(CAST(sum(CASE WHEN e = 95 THEN 1 ELSE 0 END) AS DOUBLE)
                         / t.n, 6) AS share_95,
                   CAST(sum(CASE WHEN e = 99 THEN 1 ELSE 0 END) AS BIGINT) AS n_99,
                   round(CAST(sum(CASE WHEN e = 99 THEN 1 ELSE 0 END) AS DOUBLE)
                         / t.n, 6) AS share_99
            FROM v CROSS JOIN t GROUP BY t.n
        """,
        "q205_conditional_entropy": """
            WITH c AS (
                SELECT CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS isodow,
                       event_type, CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2),
            tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM c),
            m AS (SELECT event_type, CAST(sum(n) AS DOUBLE) AS s FROM c GROUP BY 1),
            ht AS (SELECT -sum((m.s / tot.t) * ln(m.s / tot.t)) AS h
                   FROM m CROSS JOIN tot),
            d AS (SELECT isodow, CAST(sum(n) AS DOUBLE) AS nd FROM c GROUP BY 1),
            hd AS (SELECT c.isodow, max(d.nd) AS nd,
                          -sum((CAST(c.n AS DOUBLE) / d.nd)
                               * ln(CAST(c.n AS DOUBLE) / d.nd)) AS h
                   FROM c JOIN d USING (isodow) GROUP BY c.isodow),
            hc AS (SELECT sum((hd.nd / tot.t) * hd.h) AS h
                   FROM hd CROSS JOIN tot)
            SELECT round(ht.h, 6) AS h_type,
                   round(hc.h, 6) AS h_type_given_dow,
                   round(ht.h - hc.h, 6) AS info_gain
            FROM ht CROSS JOIN hc
        """,
        "q206_ngram_coverage_curve": r"""
            WITH b AS (
                SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM (
                    SELECT arr[i] || ' ' || arr[i+1] AS bigram,
                           arr[i] AS w1, arr[i+1] AS w2
                    FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS arr
                          FROM documents),
                         unnest(generate_series(1, len(arr) - 1)) AS t(i))
                WHERE w1 <> '' AND w2 <> ''
                GROUP BY bigram),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM b),
            r AS (SELECT n, row_number() OVER (ORDER BY n DESC, bigram) AS rk
                  FROM b),
            ks AS (SELECT unnest([10, 100, 1000]) AS k)
            SELECT CAST(ks.k AS BIGINT) AS k,
                   CAST(COALESCE(sum(CASE WHEN r.rk <= ks.k THEN r.n END), 0)
                        AS BIGINT) AS covered,
                   round(CAST(COALESCE(sum(CASE WHEN r.rk <= ks.k THEN r.n END),
                                       0) AS DOUBLE) / tot.t, 6) AS coverage
            FROM ks CROSS JOIN tot CROSS JOIN r
            GROUP BY ks.k, tot.t
        """,
        "q202_lang_confusion_matrix": """
            WITH p AS (
                SELECT lang,
                       CASE WHEN regexp_matches(text, '[ሀ-፿]') THEN 'am'
                            WHEN regexp_matches(text, '\\b(the|and|of|a)\\b')
                                THEN 'en'
                            ELSE 'other' END AS pred_lang
                FROM documents),
            c AS (
                SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
                FROM p GROUP BY 1, 2),
            r AS (SELECT lang, sum(n_docs) AS rt FROM c GROUP BY 1)
            SELECT c.lang, c.pred_lang, c.n_docs,
                   round(CAST(c.n_docs AS DOUBLE) / r.rt, 6) AS row_share
            FROM c JOIN r USING (lang)
        """,
        "q203_l_diversity": """
            SELECT c_mktsegment AS segment,
                   CAST(c_nationkey AS BIGINT) AS nationkey,
                   CAST(count(*) AS BIGINT) AS k_size,
                   CAST(count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS l_distinct
            FROM customer GROUP BY 1, 2
        """,
        "q204_shingle_df_histogram": r"""
            WITH tk AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id, array_to_string(toks[i : i + 3], ' ') AS s
                FROM tk, UNNEST(generate_series(1, len(toks) - 3)) AS u(i)
                WHERE len(toks) >= 4),
            d AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
            SELECT df, CAST(count(*) AS BIGINT) AS n_shingles
            FROM d GROUP BY 1
        """,
        "q199_val_oov_rate": r"""
            WITH d AS (
                SELECT doc_id, text,
                       md5(CAST(doc_id AS VARCHAR))
                           < 'cccccccc000000000000000000000000' AS is_train
                FROM documents),
            t AS (
                SELECT is_train, tok FROM (
                    SELECT is_train,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                    FROM d)
                WHERE tok <> ''),
            c AS (
                SELECT tok,
                       CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_tr,
                       CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
                           AS n_val
                FROM t GROUP BY 1)
            SELECT CAST(sum(n_val) AS BIGINT) AS n_val_tokens,
                   CAST(sum(CASE WHEN n_tr = 0 THEN n_val ELSE 0 END) AS BIGINT)
                       AS n_oov_tokens,
                   CAST(sum(CASE WHEN n_tr = 0 AND n_val > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_oov_types,
                   round(CAST(sum(CASE WHEN n_tr = 0 THEN n_val ELSE 0 END)
                              AS DOUBLE) / sum(n_val), 6) AS oov_rate
            FROM c
        """,
        "q200_part_affinity_jaccard": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            marg AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_a
                     FROM lp GROUP BY 1),
            pairs AS (
                SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                       CAST(count(*) AS BIGINT) AS n_ab
                FROM lp a JOIN lp b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2
                HAVING count(*) >= 2)
            SELECT p.part_a, p.part_b, p.n_ab,
                   round(CAST(p.n_ab AS DOUBLE)
                         / (ma.n_a + mb.n_a - p.n_ab), 6) AS jaccard
            FROM pairs p
            JOIN marg ma ON ma.l_partkey = p.part_a
            JOIN marg mb ON mb.l_partkey = p.part_b
            ORDER BY jaccard DESC, p.part_a, p.part_b
            LIMIT 50
        """,
        "q201_event_hour_heatmap": """
            WITH c AS (
                SELECT CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS isodow,
                       CAST(hour(ts) AS BIGINT) AS hour,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM events GROUP BY 1, 2),
            t AS (SELECT CAST(sum(n_events) AS BIGINT) AS nt FROM c)
            SELECT c.isodow, c.hour, c.n_events,
                   round(CAST(c.n_events AS DOUBLE) / t.nt, 6) AS share
            FROM c CROSS JOIN t
        """,
        "q195_anova_f": """
            WITH v AS (
                SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS v
                FROM events),
            g AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(v) AS BIGINT) AS s,
                       CAST(sum(v * v) AS BIGINT) AS q
                FROM v GROUP BY 1),
            t AS (
                SELECT CAST(count(*) AS BIGINT) AS k,
                       CAST(COALESCE(sum(n), 0) AS BIGINT) AS nt,
                       CAST(sum(s) AS DOUBLE) AS ss,
                       CAST(sum(q) AS DOUBLE) AS qq,
                       sum(CAST(s AS DOUBLE) * s / n) AS w
                FROM g)
            SELECT k AS k_groups, nt AS n_total,
                   round(((w - ss * ss / nt) / (k - 1))
                         / ((qq - w) / (nt - k)), 6) AS f_stat
            FROM t
        """,
        "q196_poisson_dispersion": """
            WITH d AS (
                SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY 1, 2),
            a AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(c) AS BIGINT) AS s,
                       CAST(sum(c * c) AS BIGINT) AS q
                FROM d GROUP BY 1)
            SELECT event_type, n AS n_days,
                   round(CAST(s AS DOUBLE) / n, 4) AS mean_daily,
                   round((CAST(q AS DOUBLE) / n
                          - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                         / (CAST(s AS DOUBLE) / n), 6) AS dispersion
            FROM a
        """,
        "q197_embedding_norm_outliers": """
            WITH v AS (
                SELECT vec_id,
                       list_sum(list_transform(embedding,
                           x -> CAST(round(CAST(x AS DOUBLE) * 1e3) AS BIGINT)
                              * CAST(round(CAST(x AS DOUBLE) * 1e3) AS BIGINT)))
                           AS n2
                FROM embeddings),
            t AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(n2) AS s,
                         max(n2) AS mx FROM v),
            th AS (SELECT n, s, mx,
                          (s - 1) // (4 * n) AS tlo,
                          (4 * s) // n AS thi FROM t)
            SELECT th.n AS n_vecs,
                   round(CAST(th.s AS DOUBLE) / th.n, 4) AS mean_norm2,
                   CAST((SELECT count(*) FROM v, th
                         WHERE v.n2 <= th.tlo OR v.n2 > th.thi) AS BIGINT)
                       AS n_outliers,
                   round(CAST(th.mx AS DOUBLE)
                         / (CAST(th.s AS DOUBLE) / th.n), 6) AS max_ratio
            FROM th
        """,
        "q198_weekday_chi2": """
            WITH c AS (
                SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT)
                           AS isodow,
                       CAST(count(*) AS BIGINT) AS n
                FROM orders GROUP BY 1),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c)
            SELECT c.isodow, c.n AS n_orders,
                   round(CAST(t.nt AS DOUBLE) / 7, 4) AS expected,
                   round((c.n - CAST(t.nt AS DOUBLE) / 7)
                         * (c.n - CAST(t.nt AS DOUBLE) / 7)
                         / (CAST(t.nt AS DOUBLE) / 7), 6) AS chi2_term
            FROM c CROSS JOIN t
        """,
        "q192_crosssource_dup_matrix": r"""
            WITH tk AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id, array_to_string(toks[i : i + 4], ' ') AS s
                FROM tk, UNNEST(generate_series(1, len(toks) - 4)) AS u(i)
                WHERE len(toks) >= 5),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            p AS (
                SELECT doc_a, doc_b,
                       i::DOUBLE / (sa.sz + sb.sz - i) AS jac
                FROM inter
                JOIN sz sa ON doc_a = sa.doc_id
                JOIN sz sb ON doc_b = sb.doc_id
                WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5),
            m AS (
                SELECT least(da.source, db.source) AS source_a,
                       greatest(da.source, db.source) AS source_b, p.jac
                FROM p
                JOIN documents da ON p.doc_a = da.doc_id
                JOIN documents db ON p.doc_b = db.doc_id)
            SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
                   round(max(jac), 4) AS max_jaccard
            FROM m GROUP BY 1, 2
        """,
        "q193_length_decile_bands": """
            WITH t AS (
                SELECT quantile_disc(n_chars, 0.1) AS t1,
                       quantile_disc(n_chars, 0.2) AS t2,
                       quantile_disc(n_chars, 0.3) AS t3,
                       quantile_disc(n_chars, 0.4) AS t4,
                       quantile_disc(n_chars, 0.5) AS t5,
                       quantile_disc(n_chars, 0.6) AS t6,
                       quantile_disc(n_chars, 0.7) AS t7,
                       quantile_disc(n_chars, 0.8) AS t8,
                       quantile_disc(n_chars, 0.9) AS t9
                FROM documents)
            SELECT source,
                   CAST(1 + (n_chars > t.t1)::INT + (n_chars > t.t2)::INT
                          + (n_chars > t.t3)::INT + (n_chars > t.t4)::INT
                          + (n_chars > t.t5)::INT + (n_chars > t.t6)::INT
                          + (n_chars > t.t7)::INT + (n_chars > t.t8)::INT
                          + (n_chars > t.t9)::INT AS BIGINT) AS band,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM documents CROSS JOIN t
            GROUP BY 1, 2
        """,
        "q194_cluster_size_hist": r"""
            WITH RECURSIVE tk AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id, array_to_string(toks[i : i + 4], ' ') AS s
                FROM tk, UNNEST(generate_series(1, len(toks) - 4)) AS u(i)
                WHERE len(toks) >= 5),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            edges AS (
                SELECT da, db FROM inter
                JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
                WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5),
            und AS (SELECT da AS a, db AS b FROM edges UNION SELECT db, da FROM edges),
            reach AS (
                SELECT a AS node, b AS reached FROM und
                UNION
                SELECT r.node, u.b FROM reach r JOIN und u ON r.reached = u.a
                WHERE u.b <> r.node),
            lbl AS (SELECT node, least(node, min(reached)) AS rep FROM reach GROUP BY node),
            csz AS (SELECT rep, count(*) AS sz FROM lbl GROUP BY rep)
            SELECT CAST(sz AS BIGINT) AS cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters
            FROM csz GROUP BY 1
        """,
        "q187_theil_index": """
            WITH s AS (
                SELECT o_custkey,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
                FROM orders GROUP BY 1),
            j AS (
                SELECT c.c_mktsegment AS segment, s.cents
                FROM s JOIN customer c ON s.o_custkey = c.c_custkey),
            m AS (
                SELECT segment, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(cents) AS DOUBLE) / count(*) AS mu
                FROM j GROUP BY 1)
            SELECT j.segment, m.n AS n_customers,
                   round(sum((j.cents / m.mu) * ln(j.cents / m.mu)) / m.n, 6)
                       AS theil
            FROM j JOIN m USING (segment)
            GROUP BY j.segment, m.n
        """,
        "q188_assoc_rules": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM lp),
            marg AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_a
                     FROM lp GROUP BY 1),
            pairs AS (
                SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                       CAST(count(*) AS BIGINT) AS n_ab
                FROM lp a JOIN lp b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2
                HAVING count(*) >= 2),
            rules AS (
                SELECT part_a AS antecedent, part_b AS consequent, n_ab
                FROM pairs
                UNION ALL
                SELECT part_b AS antecedent, part_a AS consequent, n_ab
                FROM pairs)
            SELECT r.antecedent, r.consequent, r.n_ab,
                   round(CAST(r.n_ab AS DOUBLE) / ma.n_a, 6) AS confidence,
                   round(CAST(r.n_ab AS DOUBLE) * t.n
                         / (CAST(ma.n_a AS DOUBLE) * mc.n_a), 6) AS lift
            FROM rules r
            JOIN marg ma ON ma.l_partkey = r.antecedent
            JOIN marg mc ON mc.l_partkey = r.consequent
            CROSS JOIN tot t
            ORDER BY confidence DESC, r.antecedent, r.consequent
            LIMIT 50
        """,
        "q189_user_burstiness": """
            -- explicit (n, Σg, Σg²) sums over exact µs gaps (HUGEINT for
            -- Σg²), same double expression as the engine — never the
            -- stddev_pop built-in (q196 convention); greatest() clamps the
            -- float-cancellation −ε variance DuckDB's sqrt would raise on
            WITH g AS (
                SELECT user_id,
                       date_diff('microsecond',
                                 lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id),
                                 ts) AS gap
                FROM events),
            a AS (
                SELECT user_id, CAST(count(gap) AS BIGINT) AS n,
                       CAST(sum(gap) AS BIGINT) AS s,
                       sum(CAST(gap AS HUGEINT) * gap) AS q
                FROM g WHERE gap IS NOT NULL
                GROUP BY user_id
                HAVING count(gap) >= 2 AND sum(gap) > 0)
            SELECT user_id, n AS n_gaps,
                   round((sqrt(greatest(CAST(q AS DOUBLE) / n
                                        - (CAST(s AS DOUBLE) / n)
                                          * (CAST(s AS DOUBLE) / n), 0))
                          - CAST(s AS DOUBLE) / n)
                         / (sqrt(greatest(CAST(q AS DOUBLE) / n
                                          - (CAST(s AS DOUBLE) / n)
                                            * (CAST(s AS DOUBLE) / n), 0))
                            + CAST(s AS DOUBLE) / n), 6) AS burstiness
            FROM a
        """,
        "q190_source_ttr": r"""
            WITH c AS (
                SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM (
                    SELECT source,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                    FROM documents)
                WHERE tok <> ''
                GROUP BY 1, 2)
            SELECT source, CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr
            FROM c GROUP BY 1
        """,
        "q191_simpson_diversity": r"""
            WITH c AS (
                SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM (
                    SELECT source,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                    FROM documents)
                WHERE tok <> ''
                GROUP BY 1, 2)
            SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                   round(sum(CAST(c AS DOUBLE) * c)
                         / (CAST(sum(c) AS DOUBLE) * sum(c)), 6) AS simpson
            FROM c GROUP BY 1
        """,
        "q186_leadtime_p90_matrix": """
            WITH j AS (
                SELECT o.o_orderpriority AS priority,
                       CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP)
                           AS month,
                       date_diff('day', o.o_orderdate, l.l_shipdate) AS days
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
            SELECT priority, month, CAST(count(*) AS BIGINT) AS n_items,
                   round(quantile_cont(CAST(days AS DOUBLE), 0.9), 4) AS p90_days
            FROM j GROUP BY 1, 2
        """,
        "q184_weekly_control_chart": """
            WITH w AS (
                SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
                FROM orders GROUP BY 1),
            s AS (SELECT count(*) AS n, sum(cents) AS sc,
                         sum(cents * cents) AS sc2
                  FROM w)
            SELECT w.week,
                   round(CAST(w.cents AS DOUBLE) / 100.0, 2) AS revenue,
                   CAST(CASE WHEN CAST(w.cents AS DOUBLE) / 100.0
                                  < (CAST(s.sc AS DOUBLE) / s.n
                                     - 2.0 * sqrt((CAST(s.sc2 AS DOUBLE)
                                         - CAST(s.sc AS DOUBLE) * s.sc / s.n)
                                         / (s.n - 1.0))) / 100.0
                               OR CAST(w.cents AS DOUBLE) / 100.0
                                  > (CAST(s.sc AS DOUBLE) / s.n
                                     + 2.0 * sqrt((CAST(s.sc2 AS DOUBLE)
                                         - CAST(s.sc AS DOUBLE) * s.sc / s.n)
                                         / (s.n - 1.0))) / 100.0
                        THEN 1 ELSE 0 END AS BIGINT) AS out_of_band
            FROM w CROSS JOIN s
        """,
        "q183_hourly_load_p95": """
            WITH c AS (
                SELECT CAST(hour(ts) AS BIGINT) AS hod,
                       date_trunc('day', ts) AS day,
                       CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2)
            SELECT hod, CAST(count(*) AS BIGINT) AS n_days,
                   round(quantile_cont(CAST(n AS DOUBLE), 0.95), 4) AS p95_events
            FROM c GROUP BY 1
        """,
        "q178_share_swing": """
            WITH c AS (
                SELECT event_type, date_trunc('day', ts) AS day,
                       CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2),
            t AS (SELECT day, sum(n) AS tot FROM c GROUP BY 1),
            s AS (SELECT c.event_type, c.day,
                         CAST(c.n AS DOUBLE) / t.tot AS share
                  FROM c JOIN t USING (day)),
            l AS (SELECT event_type, day, share,
                         lag(share) OVER w AS pshare,
                         lag(day) OVER w AS pday
                  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day))
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                   round(COALESCE(max(CASE WHEN pday = day - to_days(1)
                                      THEN abs(share - pshare) END), 0.0), 6)
                       AS max_swing
            FROM l GROUP BY 1
        """,
        "q175_prefix_families": """
            SELECT substr(text, 1, 32) AS prefix,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM documents
            GROUP BY 1
            HAVING count(*) >= 2
        """,
        "q176_return_rate_wilson": """
            WITH m AS (
                SELECT date_trunc('month', l_shipdate) AS month,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN l_returnflag = 'R'
                                THEN 1 ELSE 0 END) AS BIGINT) AS r
                FROM lineitem GROUP BY 1)
            SELECT CAST(month AS TIMESTAMP) AS month,
                   n AS n_items, r AS n_returned,
                   round(CAST(r AS DOUBLE) / n, 6) AS rate,
                   round(((CAST(r AS DOUBLE) / n)
                          + 1.96 * 1.96 / (2.0 * n)) / (1.0 + 1.96 * 1.96 / n)
                         - 1.96 * sqrt((CAST(r AS DOUBLE) / n)
                                       * (1.0 - CAST(r AS DOUBLE) / n) / n
                                       + 1.96 * 1.96 / (4.0 * n * n))
                           / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_lo,
                   round(((CAST(r AS DOUBLE) / n)
                          + 1.96 * 1.96 / (2.0 * n)) / (1.0 + 1.96 * 1.96 / n)
                         + 1.96 * sqrt((CAST(r AS DOUBLE) / n)
                                       * (1.0 - CAST(r AS DOUBLE) / n) / n
                                       + 1.96 * 1.96 / (4.0 * n * n))
                           / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_hi
            FROM m
        """,
        "q174_cramers_v": """
            WITH c AS (
                SELECT lang, source, CAST(count(*) AS BIGINT) AS o
                FROM documents GROUP BY 1, 2),
            r AS (SELECT lang, sum(o) AS rn FROM c GROUP BY 1),
            s AS (SELECT source, sum(o) AS cn FROM c GROUP BY 1),
            t AS (SELECT sum(o) AS n FROM c),
            k AS (SELECT least((SELECT count(*) FROM r),
                               (SELECT count(*) FROM s)) - 1 AS df),
            grid AS (SELECT r.lang, s.source, r.rn, s.cn
                     FROM r CROSS JOIN s),
            x AS (
                SELECT COALESCE(c.o, 0) AS o,
                       CAST(g.rn AS DOUBLE) * g.cn / t.n AS e
                FROM grid g
                LEFT JOIN c ON c.lang = g.lang AND c.source = g.source
                CROSS JOIN t),
            chi AS (SELECT sum((o - e) * (o - e) / e) AS chi2 FROM x)
            SELECT CAST(t.n AS BIGINT) AS n_docs,
                   round(chi.chi2, 4) AS chi2,
                   round(sqrt(chi.chi2 / (t.n * k.df)), 6) AS cramers_v
            FROM chi CROSS JOIN t CROSS JOIN k
        """,
        "q161_hapax_ratio": r"""
            WITH tk AS (
                SELECT source, t AS token, count(*) AS tf FROM (
                    SELECT source,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t <> ''
                GROUP BY source, t)
            SELECT source, CAST(count(*) AS BIGINT) AS vocab,
                   CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
                   round(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)::DOUBLE
                         / count(*), 6) AS hapax_ratio
            FROM tk GROUP BY source
        """,
        "q160_abc_classes": """
            WITH pr AS (
                SELECT l_partkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev
                FROM lineitem GROUP BY 1),
            v AS (SELECT rev, CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY 1),
            c AS (
                SELECT rev, n, rev * n AS rt,
                       COALESCE(sum(rev * n) OVER (ORDER BY rev DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS cum_prev,
                       sum(rev * n) OVER () AS tot
                FROM v)
            SELECT CASE WHEN cum_prev * 100 < tot * 80 THEN 'A'
                        WHEN cum_prev * 100 < tot * 95 THEN 'B'
                        ELSE 'C' END AS abc_class,
                   CAST(sum(n) AS BIGINT) AS n_parts,
                   round(CAST(sum(rt) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 6)
                       AS rev_share
            FROM c GROUP BY 1
        """,
        "q159_double_charge": """
            WITH f AS (
                SELECT a.event_id, date_trunc('day', a.ts) AS day,
                       CASE WHEN EXISTS (
                           SELECT 1 FROM events b
                           WHERE b.user_id = a.user_id AND b.value = a.value
                             AND b.event_id <> a.event_id
                             AND abs(epoch_us(b.ts) - epoch_us(a.ts))
                                 <= 60 * 1000000)
                       THEN 1 ELSE 0 END AS fl
                FROM events a)
            SELECT CAST(day AS TIMESTAMP) AS day,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(fl) AS BIGINT) AS n_flagged
            FROM f GROUP BY 1
        """,
        "q158_pair_lift": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM lp),
            marg AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_a
                     FROM lp GROUP BY 1),
            pairs AS (
                SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                       CAST(count(*) AS BIGINT) AS n_ab
                FROM lp a JOIN lp b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2
                HAVING count(*) >= 2)
            SELECT p.part_a, p.part_b, p.n_ab,
                   round((CAST(p.n_ab AS DOUBLE) * t.n)
                         / (CAST(ma.n_a AS DOUBLE) * mb.n_a), 6) AS lift
            FROM pairs p
            JOIN marg ma ON ma.l_partkey = p.part_a
            JOIN marg mb ON mb.l_partkey = p.part_b
            CROSS JOIN tot t
            ORDER BY lift DESC, p.part_a, p.part_b
            LIMIT 50
        """,
        "q157_brand_discount_qty_corr": """
            WITH j AS (
                SELECT p.p_brand,
                       CAST(round(l.l_discount * 100) AS BIGINT) AS x,
                       CAST(l.l_quantity AS BIGINT) AS y
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
            s AS (
                SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                       sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                       sum(x * x) AS sxx, sum(y * y) AS syy
                FROM j GROUP BY 1)
            SELECT p_brand, n,
                   round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                         / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                            * sqrt(CAST(n AS DOUBLE) * syy
                                   - CAST(sy AS DOUBLE) * sy)), 6) AS corr_disc_qty
            FROM s
        """,
        "q156_frequent_triples": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   c.l_partkey AS part_c,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM lp a
            JOIN lp b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
            JOIN lp c ON b.l_orderkey = c.l_orderkey
                     AND b.l_partkey < c.l_partkey
            GROUP BY 1, 2, 3
            ORDER BY n_orders DESC, part_a, part_b, part_c
            LIMIT 50
        """,
        "q155_source_ks": """
            WITH c AS (
                SELECT source, n_chars, CAST(count(*) AS BIGINT) AS cnt
                FROM documents GROUP BY 1, 2),
            tot AS (SELECT source, sum(cnt) AS n FROM c GROUP BY 1),
            corpus AS (SELECT n_chars, sum(cnt) AS ccnt FROM c GROUP BY 1),
            ctot AS (SELECT sum(cnt) AS cn FROM c),
            grid AS (
                SELECT s.source, g.n_chars
                FROM (SELECT DISTINCT source FROM c) s,
                     (SELECT DISTINCT n_chars FROM c) g),
            f AS (
                SELECT g.source, g.n_chars,
                       sum(COALESCE(c.cnt, 0)) OVER (PARTITION BY g.source
                                                     ORDER BY g.n_chars) AS scum,
                       sum(co.ccnt) OVER (PARTITION BY g.source
                                          ORDER BY g.n_chars) AS ccum
                FROM grid g
                LEFT JOIN c ON c.source = g.source AND c.n_chars = g.n_chars
                JOIN corpus co ON co.n_chars = g.n_chars)
            SELECT f.source, CAST(t.n AS BIGINT) AS n_docs,
                   round(max(abs(CAST(f.scum AS DOUBLE) / t.n
                                 - CAST(f.ccum AS DOUBLE) / ct.cn)), 6) AS ks
            FROM f JOIN tot t USING (source) CROSS JOIN ctot ct
            GROUP BY f.source, t.n
        """,
        "q154_rfm_segments": """
            WITH a AS (
                SELECT o_custkey,
                       CAST(date_diff('day', DATE '1970-01-01',
                                      CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS recency_day,
                       CAST(count(*) AS BIGINT) AS frequency,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_cents
                FROM orders GROUP BY 1),
            t AS (
                SELECT quantile_disc(recency_day, 0.25) AS r1,
                       quantile_disc(recency_day, 0.50) AS r2,
                       quantile_disc(recency_day, 0.75) AS r3,
                       quantile_disc(frequency, 0.25) AS f1,
                       quantile_disc(frequency, 0.50) AS f2,
                       quantile_disc(frequency, 0.75) AS f3,
                       quantile_disc(monetary_cents, 0.25) AS m1,
                       quantile_disc(monetary_cents, 0.50) AS m2,
                       quantile_disc(monetary_cents, 0.75) AS m3
                FROM a)
            SELECT CAST(1 + (a.recency_day > t.r1)::INT + (a.recency_day > t.r2)::INT
                          + (a.recency_day > t.r3)::INT AS BIGINT) AS r_code,
                   CAST(1 + (a.frequency > t.f1)::INT + (a.frequency > t.f2)::INT
                          + (a.frequency > t.f3)::INT AS BIGINT) AS f_code,
                   CAST(1 + (a.monetary_cents > t.m1)::INT + (a.monetary_cents > t.m2)::INT
                          + (a.monetary_cents > t.m3)::INT AS BIGINT) AS m_code,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM a, t
            GROUP BY 1, 2, 3
        """,
        "q152_daily_bounce_rate": """
            WITH s AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS ns
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            g AS (
                SELECT user_id, ts,
                       sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
                FROM s),
            ses AS (
                SELECT user_id, sid, min(ts) AS start, count(*) AS n
                FROM g GROUP BY 1, 2)
            SELECT CAST(date_trunc('day', start) AS TIMESTAMP) AS day,
                   CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
                   round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE
                         / count(*), 4) AS bounce_rate
            FROM ses GROUP BY 1
        """,
        "q153_new_vs_returning": """
            WITH d AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
            f AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY 1)
            SELECT CAST(d.day AS TIMESTAMP) AS day,
                   CAST(sum(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_new,
                   CAST(sum(CASE WHEN d.day = f.first_day THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_returning
            FROM d JOIN f USING (user_id)
            GROUP BY 1
        """,
        "q151_ship_leadtime": """
            SELECT o.o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_items,
                   round(CAST(sum(date_diff('day', o.o_orderdate, l.l_shipdate))
                              AS DOUBLE) / count(*), 4) AS avg_lead_days,
                   CAST(max(date_diff('day', o.o_orderdate, l.l_shipdate))
                        AS BIGINT) AS max_lead_days
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "q150_winsorized_mean": """
            WITH f AS (
                SELECT o_orderpriority,
                       quantile_cont(o_totalprice, 0.01) AS lo,
                       quantile_cont(o_totalprice, 0.99) AS hi
                FROM orders GROUP BY 1)
            SELECT o.o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   round((CAST(sum(CAST(round(
                            least(greatest(o.o_totalprice, f.lo), f.hi) * 400
                          ) AS BIGINT)) AS DOUBLE) / 400.0) / count(*), 4) AS wins_mean
            FROM orders o JOIN f USING (o_orderpriority)
            GROUP BY 1
        """,
        "q149_copurchase_degree_hist": """
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
                  FROM lp a JOIN lp b
                    ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey <> b.l_partkey),
            deg AS (SELECT x, CAST(count(*) AS BIGINT) AS degree FROM e GROUP BY 1)
            SELECT degree, CAST(count(*) AS BIGINT) AS n_parts
            FROM deg GROUP BY 1
        """,
        "q148_revenue_share": """
            WITH c AS (
                SELECT o_orderpriority,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
                FROM orders GROUP BY 1)
            SELECT o_orderpriority,
                   round(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue,
                   round(CAST(cents AS DOUBLE)
                         / (SELECT CAST(sum(cents) AS DOUBLE) FROM c), 6) AS share
            FROM c
        """,
        "q106_purchase_attribution": """
            WITH cp AS (
                SELECT event_id, user_id, event_type, ts FROM events
                WHERE event_type IN ('click', 'purchase')),
            w AS (
                SELECT event_id, user_id, ts, event_type,
                       max(CASE WHEN event_type = 'click' THEN ts END) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS last_click
                FROM cp)
            SELECT event_id, user_id, ts,
                   CASE WHEN last_click IS NOT NULL
                             AND ts - last_click <= INTERVAL 7 DAY
                        THEN last_click END AS attributed_click_ts
            FROM w WHERE event_type = 'purchase'
        """,
        "q104_rolling_distinct_users": """
            WITH ud AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
            w AS (
                SELECT DISTINCT user_id, day + to_days(CAST(g.i AS INTEGER)) AS wday
                FROM ud, generate_series(0, 6) AS g(i))
            SELECT CAST(wday AS TIMESTAMP) AS wday,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM w GROUP BY wday
        """,
        "q105_audience_overlap": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM ut a JOIN ut b ON a.user_id = b.user_id
            GROUP BY 1, 2
        """,
        "q102_benford_audit": """
            WITH d AS (
                SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                            AS BIGINT) AS digit
                FROM orders WHERE o_totalprice >= 1.0)
            SELECT digit, CAST(count(*) AS BIGINT) AS n,
                   round(count(*)::DOUBLE / (SELECT count(*) FROM d), 4) AS observed,
                   round(log10(1.0 + 1.0 / digit), 4) AS expected
            FROM d GROUP BY digit
        """,
        "q103_time_weighted_avg": """
            WITH e AS (
                SELECT user_id, value, ts,
                       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts
                FROM events)
            SELECT user_id,
                   round(sum(value * CAST(epoch_us(nts) - epoch_us(ts) AS DOUBLE))
                         / sum(CAST(epoch_us(nts) - epoch_us(ts) AS DOUBLE)), 4) AS twap
            FROM e
            WHERE nts IS NOT NULL
            GROUP BY user_id
            HAVING sum(epoch_us(nts) - epoch_us(ts)) > 0
        """,
        "q101_bigram_logppl": r"""
            WITH arr AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS a
                FROM documents),
            big AS (
                SELECT doc_id, a[i] AS w1, a[i+1] AS w2
                FROM arr, UNNEST(generate_series(1, len(a) - 1)) AS u(i)
                WHERE len(a) >= 2),
            bcnt AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
            ctx AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1)
            SELECT b.doc_id,
                   CAST(count(*) AS BIGINT) AS n_trans,
                   round(-avg(ln(bc.c2::DOUBLE / cx.c1)), 4) AS logppl
            FROM big b
            JOIN bcnt bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
            JOIN ctx cx ON b.w1 = cx.w1
            GROUP BY b.doc_id
        """,
        "q100_equidepth_bins": """
            WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem),
            ranked AS (
                SELECT l_extendedprice AS v,
                       row_number() OVER (ORDER BY l_extendedprice) AS rn
                FROM lineitem),
            bounds AS (
                SELECT r.v AS b
                FROM generate_series(1, 7) AS g(i)
                CROSS JOIN nn
                JOIN ranked r ON r.rn = (g.i * nn.c + 7) // 8)
            SELECT CAST(bin_id AS BIGINT) AS bin_id,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM (
                SELECT (SELECT count(*) FROM bounds
                        WHERE l.l_extendedprice > bounds.b) AS bin_id
                FROM lineitem l)
            GROUP BY bin_id
        """,
        "q99_khop_parts": """
            WITH RECURSIVE pairs AS (
                SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
                FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                WHERE a.l_partkey < b.l_partkey
            ), edges AS (
                SELECT x, y FROM pairs UNION ALL SELECT y, x FROM pairs
            ), reach AS (
                SELECT p_partkey AS node, 0 AS hops FROM part WHERE p_brand = 'Brand#11'
                UNION
                SELECT e.y, r.hops + 1 FROM reach r JOIN edges e ON e.x = r.node
                WHERE r.hops < 2
            )
            SELECT node AS partkey, CAST(min(hops) AS BIGINT) AS min_hops
            FROM reach GROUP BY node
        """,
        "q98_prev_rows_stats": """
            SELECT event_id,
                   CAST(count(*) OVER w AS BIGINT) AS n_frame,
                   round(CASE WHEN count(*) OVER w = 0 THEN NULL
                         ELSE (sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0)
                              / count(*) OVER w END, 4) AS prev_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
        """,
        "q77_moving_avg": """
            SELECT event_id,
                   round(sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0
                         / count(*) OVER w, 4) AS mavg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
        """,
        "q75_char_entropy": r"""
            WITH ch AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
                FROM documents),
            cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
            tot AS (SELECT doc_id, sum(n) AS t FROM cnt GROUP BY doc_id)
            SELECT cnt.doc_id,
                   CAST(any_value(t) AS BIGINT) AS n_chars,
                   round(-sum((n::DOUBLE / t) * ln(n::DOUBLE / t)), 4) AS entropy
            FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
            GROUP BY cnt.doc_id
        """,
        "q71_jaccard_pairs_exact": r"""
            WITH tk AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
                FROM documents),
            sh AS (
                SELECT DISTINCT doc_id, array_to_string(toks[i : i + 4], ' ') AS s
                FROM tk, UNNEST(generate_series(1, len(toks) - 4)) AS u(i)
                WHERE len(toks) >= 5),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS jaccard
            FROM inter
            JOIN sz sa ON doc_a = sa.doc_id
            JOIN sz sb ON doc_b = sb.doc_id
            WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5
        """,
        "q66_quality_funnel": """
            SELECT CAST(count(*) AS BIGINT) AS n_total,
                   CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_len,
                   CAST(sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_len_tok,
                   CAST(sum(CASE WHEN c1 AND c2 AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
            FROM (
                SELECT lang,
                       length(text) >= 100 AS c1,
                       (CASE WHEN trim(text) = '' THEN 0
                             ELSE len(string_split_regex(trim(text), '\\s+')) END) >= 20 AS c2
                FROM documents
            )
        """,
        "q13_quality_score": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars2,
                   round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / greatest(length(text), 1), 4) AS alpha_ratio,
                   round(length(regexp_replace(text, '[^ ]', '', 'g')) / greatest(length(text), 1), 4) AS space_ratio
            FROM documents
        """,
        "q14_lang_id": """
            SELECT doc_id,
                   CASE WHEN regexp_matches(text, '[ሀ-፿]') THEN 'am'
                        WHEN regexp_matches(text, '\\b(the|and|of|a)\\b') THEN 'en'
                        ELSE 'other' END AS pred_lang
            FROM documents
        """,
        "q15_doc_fingerprint": """
            SELECT doc_id, sha256(lower(trim(text))) AS fp FROM documents
        """,
        "q26_bpe_token_estimate": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\r\n]')) AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "q16_knn_cosine": """
            WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                CAST(q.embedding AS DOUBLE[])), 4) AS cos_sim
            FROM embeddings e, q
            ORDER BY cos_sim DESC, e.vec_id
            LIMIT 10
        """,
        "q21_sessionize": """
            WITH o AS (
                SELECT user_id, event_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
                SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM o)
            SELECT user_id, CAST(sid AS BIGINT) AS session_id,
                   min(ts) AS session_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "q27_range_join_count": """
            SELECT a.event_id, count(b.event_id) AS n_prior
            FROM events a LEFT JOIN events b
              ON b.ts >= a.ts - INTERVAL 5 MINUTE AND b.ts < a.ts
            GROUP BY a.event_id
        """,
        "q28_sliding_windows": """
            SELECT user_id,
                   (CAST(floor(epoch(ts) / 900) AS BIGINT) - k.k) * 900 AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
            GROUP BY 1, 2
        """,
        "q22_customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        """,
        "q29_deterministic_sample": """
            SELECT event_id, event_type FROM events
            WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '29'
        """,
        "q30_distinct_pairs": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "q43_bloom_semi_join": """
            SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
                   round(sum(l_extendedprice), 4) AS revenue
            FROM lineitem
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_orderkey = l_orderkey
                            AND o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag
        """,
        "q44_region_rollup_totals": """
            SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_customers,
                   round(sum(c_acctbal), 4) AS sum_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
        """,
        "q45_json_props_stats": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                   round(avg(k), 4) AS avg_k, max(k) AS max_k
            FROM (SELECT event_type,
                         CAST(json_extract(props, '$.k') AS BIGINT) AS k
                  FROM events)
            WHERE k IS NOT NULL
            GROUP BY event_type
        """,
        "q36_event_lag_stats": """
            SELECT user_id, count(gap) AS n_gaps,
                   round(avg(gap), 4) AS avg_gap_s,
                   round(max(gap), 4) AS max_gap_s
            FROM (
                SELECT user_id,
                       date_diff('microsecond',
                                 lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id),
                                 ts) / 1e6 AS gap
                FROM events)
            GROUP BY user_id
        """,
        "q37_cumulative_spend": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING), 4) AS cum_spend
            FROM orders
        """,
        "q38_brand_price_rank": """
            SELECT p_brand, p_partkey, p_retailprice, price_rank FROM (
                SELECT p_brand, p_partkey, p_retailprice,
                       CAST(dense_rank() OVER (
                           PARTITION BY p_brand
                           ORDER BY p_retailprice DESC) AS BIGINT) AS price_rank
                FROM part)
            WHERE price_rank <= 3
        """,
        "q39_order_size_corr": """
            SELECT round(corr(o_totalprice, n), 6) AS corr_price_nitems
            FROM orders JOIN (
                SELECT l_orderkey, CAST(count(*) AS DOUBLE) AS n
                FROM lineitem GROUP BY l_orderkey) li
            ON o_orderkey = l_orderkey
        """,
        "q40_brand_median_price": """
            SELECT p_brand, round(median(p_retailprice), 4) AS median_price,
                   CAST(count(*) AS BIGINT) AS n_parts
            FROM part GROUP BY p_brand
        """,
        "q41_user_modal_event": """
            SELECT user_id, event_type AS modal_event, n_events FROM (
                SELECT user_id, event_type, n_events,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY n_events DESC, event_type) AS rn
                FROM (SELECT user_id, event_type,
                             CAST(count(*) AS BIGINT) AS n_events
                      FROM events GROUP BY user_id, event_type))
            WHERE rn = 1
        """,
        "q42_weekly_active_users": """
            SELECT CAST(isoyear(ts) AS BIGINT) AS iso_year,
                   CAST(week(ts) AS BIGINT) AS iso_week,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
            FROM events GROUP BY 1, 2
        """,
        "q34_stratified_sample": """
            SELECT event_id, event_type FROM (
                SELECT event_id, event_type,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                       ) AS rn
                FROM events)
            WHERE rn <= 50
        """,
        "q35_vocab_topk": r"""
            SELECT token, CAST(count(*) AS BIGINT) AS df,
                   CAST(sum(n) AS BIGINT) AS tf FROM (
                SELECT doc_id, t AS token, count(*) AS n FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t <> ''
                GROUP BY doc_id, t)
            GROUP BY token
            ORDER BY tf DESC, token
            LIMIT 100
        """,
        "q46_brand_type_concat": """
            SELECT p_brand,
                   string_agg(DISTINCT p_type, ',' ORDER BY p_type) AS types,
                   CAST(count(DISTINCT p_type) AS BIGINT) AS n_types
            FROM part GROUP BY p_brand
        """,
        "q47_users_both_events": """
            SELECT user_id FROM events GROUP BY user_id
            HAVING bool_or(event_type = 'click') AND bool_or(event_type = 'purchase')
        """,
        "q48_brand_price_quantiles": """
            SELECT p_brand,
                   ROUND(quantile_cont(p_retailprice, 0.25), 4) AS p25,
                   ROUND(quantile_cont(p_retailprice, 0.50), 4) AS p50,
                   ROUND(quantile_cont(p_retailprice, 0.75), 4) AS p75,
                   ROUND(quantile_cont(p_retailprice, 0.90), 4) AS p90
            FROM part GROUP BY p_brand
        """,
        "q49_above_avg_orders": """
            SELECT o_custkey,
                   CAST(count(*) FILTER (WHERE o_totalprice > avg_p + 1e-6) AS BIGINT) AS n_above,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM (SELECT o_custkey, o_totalprice,
                         avg(o_totalprice) OVER (PARTITION BY o_custkey) AS avg_p
                  FROM orders)
            GROUP BY o_custkey
        """,
        "q50_region_priority_grid": """
            SELECT r_name, o_orderpriority, CAST(COALESCE(n, 0) AS BIGINT) AS n_orders
            FROM (SELECT r_name FROM region)
            CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
            LEFT JOIN (
                SELECT r.r_name AS rn, o.o_orderpriority AS op, count(*) AS n
                FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation na ON c.c_nationkey = na.n_nationkey
                JOIN region r ON na.n_regionkey = r.r_regionkey
                GROUP BY 1, 2
            ) ON rn = r_name AND op = o_orderpriority
        """,
        "q51_first_last_event": """
            WITH ranked AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_f,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_l
                FROM events)
            SELECT user_id,
                   max(CASE WHEN rn_f = 1 THEN event_type END) AS first_type,
                   max(CASE WHEN rn_l = 1 THEN event_type END) AS last_type
            FROM ranked GROUP BY user_id
        """,
        "q52_bigram_topk": r"""
            SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM (
                SELECT arr[i] || ' ' || arr[i+1] AS bigram, arr[i] AS w1, arr[i+1] AS w2
                FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS arr FROM documents),
                     unnest(generate_series(1, len(arr) - 1)) AS t(i))
            WHERE w1 <> '' AND w2 <> ''
            GROUP BY bigram
            ORDER BY n DESC, bigram
            LIMIT 100
        """,
        "q56_customer_bigorder_stats": """
            SELECT c_custkey,
                   CAST(COALESCE(n, 0) AS BIGINT) AS n_big_orders,
                   ROUND(COALESCE(s, 0.0), 4) AS big_spend
            FROM customer LEFT JOIN (
                SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS s
                FROM orders WHERE o_totalprice > 300000
                GROUP BY 1
            ) ON c_custkey = o_custkey
        """,
        "q62_asof_join": """
            SELECT p.event_id, p.user_id, v.ts AS last_view_ts
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT user_id, ts FROM events
                            WHERE event_type = 'view') v
              ON p.user_id = v.user_id AND v.ts <= p.ts
        """,
        "q58_funnel_stages": """
            WITH s AS (SELECT user_id, min(ts) AS signup_ts
                       FROM events WHERE event_type = 'signup' GROUP BY user_id),
            c AS (SELECT e.user_id, min(e.ts) AS click_ts
                  FROM events e JOIN s USING (user_id)
                  WHERE e.event_type = 'click' AND e.ts > s.signup_ts
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
                  FROM events e JOIN c USING (user_id)
                  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
                  GROUP BY e.user_id)
            SELECT s.user_id, s.signup_ts, c.click_ts, p.purchase_ts
            FROM s LEFT JOIN c ON s.user_id = c.user_id
                   LEFT JOIN p ON s.user_id = p.user_id
        """,
        "q59_cohort_retention": """
            WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
                       FROM events GROUP BY user_id),
            a AS (SELECT DISTINCT e.user_id, f.cohort_week,
                         CAST(date_diff('week', f.cohort_week,
                                        date_trunc('week', e.ts)) AS BIGINT) AS week_offset
                  FROM events e JOIN f USING (user_id))
            SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
            FROM a GROUP BY 1, 2
        """,
        "q60_spend_deciles": """
            WITH t AS (SELECT user_id, round(sum(value), 4) AS total_spend
                       FROM events WHERE event_type = 'purchase' GROUP BY user_id)
            SELECT user_id, total_spend,
                   CAST(least(9, floor(10 * percent_rank() OVER (ORDER BY total_spend)))
                        AS BIGINT) AS decile
            FROM t
        """,
        "q61_weighted_sample": """
            WITH pr AS (
                SELECT o_orderkey, o_totalprice,
                       round(o_totalprice / (1.0 + CAST(
                           (CAST(o_orderkey AS HUGEINT) * 2654435761) % 4294967296
                           AS DOUBLE)), 8) AS priority
                FROM orders)
            SELECT o_orderkey, o_totalprice, priority
            FROM pr ORDER BY priority DESC, o_orderkey LIMIT 100
        """,
        "q57_segment_lineitem_revenue": """
            SELECT c_mktsegment,
                   ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "q64_order_count_histogram": """
            SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
            FROM (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
                  FROM orders GROUP BY o_custkey)
            GROUP BY n_orders
        """,
        "q65_weekly_change": """
            SELECT wk, n_events,
                   round((n_events - lag(n_events) OVER (ORDER BY wk)) * 1.0
                         / lag(n_events) OVER (ORDER BY wk), 4) AS wow_change
            FROM (SELECT date_trunc('week', ts) AS wk,
                         CAST(count(*) AS BIGINT) AS n_events
                  FROM events GROUP BY 1)
            ORDER BY wk
        """,
        "q55_value_histogram": """
            WITH b AS (SELECT min(value) AS lo, max(value) AS hi
                       FROM events WHERE value IS NOT NULL)
            SELECT CAST(least(floor((value - lo) * 10 / (hi - lo)), 9) + 1 AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS n,
                   ROUND(min(value), 4) AS lo_val,
                   ROUND(max(value), 4) AS hi_val
            FROM events, b WHERE value IS NOT NULL
            GROUP BY 1
        """,
        "q54_decontaminate": r"""
            WITH arr AS (
                SELECT doc_id, source,
                       regexp_split_to_array(trim(text), '\s+') AS a
                FROM documents),
            sh AS (
                SELECT doc_id, source,
                       a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' ' ||
                       a[i+3] || ' ' || a[i+4] AS s
                FROM arr, unnest(generate_series(1, len(a) - 4)) AS t(i)),
            bl AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
            corpus AS (SELECT DISTINCT doc_id, s FROM sh WHERE source <> 'src0')
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
            FROM corpus JOIN bl USING (s)
            GROUP BY doc_id
        """,
        "q53_tfidf_topk": r"""
            WITH tok AS (
                SELECT doc_id, t AS token, count(*) AS n FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
                    FROM documents)
                WHERE t <> '' GROUP BY doc_id, t),
            agg AS (SELECT token, count(*) AS df, sum(n) AS tf FROM tok GROUP BY token),
            nd AS (SELECT count(*) AS n FROM documents)
            SELECT token, CAST(df AS BIGINT) AS df, CAST(tf AS BIGINT) AS tf,
                   ROUND(tf * ln(nd.n / df), 4) AS tfidf
            FROM agg, nd
            ORDER BY ROUND(tf * ln(nd.n / df), 4) DESC, token
            LIMIT 100
        """,
        "q31_region_nation_rollup": """
            SELECT coalesce(r_name, '') AS r_name,
                   coalesce(n_name, '') AS n_name,
                   count(*) AS n_customers,
                   round(sum(c_acctbal), 4) AS total_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP(r_name, n_name)
        """,
        "q32_event_type_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click') AS n_click,
                   count(*) FILTER (event_type = 'error') AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup') AS n_signup,
                   count(*) FILTER (event_type = 'view') AS n_view
            FROM events GROUP BY user_id
        """,
        "q33_top3_events_per_user": """
            SELECT user_id, event_id, round(value, 4) AS top_value
            FROM (
                SELECT user_id, event_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY value DESC, event_id) AS rn
                FROM events)
            WHERE rn <= 3
        """,
        "q23_top_event_per_user_type": """
            WITH m AS (
                SELECT user_id, event_type, round(max(value), 4) AS max_value,
                       max(value) AS mx
                FROM events GROUP BY user_id, event_type)
            SELECT m.user_id, m.event_type, m.max_value,
                   min(e.event_id) AS top_event_id
            FROM m JOIN events e
              ON e.user_id = m.user_id AND e.event_type = m.event_type AND e.value = m.mx
            GROUP BY m.user_id, m.event_type, m.max_value
        """,
        "q24_best_worst_day": """
            WITH d AS (
                SELECT user_id, CAST(day(ts) AS BIGINT) AS d, avg(value) AS av
                FROM events GROUP BY 1, 2),
            r AS (
                SELECT user_id, d, av,
                       row_number() OVER (PARTITION BY user_id ORDER BY av DESC, d) AS rb,
                       row_number() OVER (PARTITION BY user_id ORDER BY av ASC, d) AS rw
                FROM d)
            SELECT user_id,
                   max(CASE WHEN rb = 1 THEN d END) AS best_day,
                   max(CASE WHEN rw = 1 THEN d END) AS worst_day,
                   round(max(CASE WHEN rb = 1 THEN av END), 4) AS best_avg,
                   round(max(CASE WHEN rw = 1 THEN av END), 4) AS worst_avg
            FROM r GROUP BY user_id
        """,
        "q25_embedding_neardup": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(a.emb, b.emb), 4) AS cos_sim
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3
        """,
        "q17_asof_last_signup": """
            SELECT event_id, user_id,
                   max(CASE WHEN event_type = 'signup' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
            FROM events
        """,
        "q18_hourly_windows": """
            SELECT user_id, date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
    }
