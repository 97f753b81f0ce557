"""Reference-faithful single-process oracle (SURVEY.md §5.2, FIXTURES.md §5).

A straight-line pandas/regex implementation of the reference semantics
(normalize → extract → conversation-ordered triple emission → dedup) with NO
Ray, no partitioning, no buckets. The engine's distributed output is scored
against this at exact-match P/R ≥ 0.95; because the oracle is sequential and
the engine is sharded/shuffled, the comparison validates the distributed
orchestration (reassembly ordering, bucketing, dedup determinism) against
plain sequential semantics.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .functions.extract import build_loc_pattern, extract_mentions
from .functions.textnorm import clean_text_v1, normalize_text_v2


def oracle_triples(table: pa.Table, normalizer: int = 1) -> pd.DataFrame:
    """Sequential triple emission over a transcripts Arrow table."""
    norm_fn = clean_text_v1 if normalizer == 1 else normalize_text_v2
    loc_pattern = build_loc_pattern()

    df = table.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    rows: list[tuple] = []
    last_conv = None
    last_product = None
    for conv_id, turn_idx, text in zip(df["conv_id"], df["turn_idx"], df["text"]):
        if conv_id != last_conv:
            last_conv = conv_id
            last_product = None
        seller = conv_id.split("-")[0]
        clean = norm_fn(text)
        for m in extract_mentions(clean, loc_pattern):
            et, norm = m["etype"], m["norm"]
            if not norm:
                continue
            if et == "PRODUCT":
                last_product = norm
                rows.append((seller, "sells", norm, conv_id, turn_idx))
            elif et == "PRICE":
                rows.append((last_product or seller, "priced_at", norm, conv_id, turn_idx))
            elif et == "LOC":
                rows.append((last_product or seller, "located_in", norm, conv_id, turn_idx))
            elif et == "PHONE":
                rows.append((seller, "reachable_at", norm, conv_id, turn_idx))

    out = pd.DataFrame(rows, columns=["subj", "pred", "obj", "conv_id", "turn_idx"])
    out = out.sort_values(["subj", "pred", "obj", "conv_id", "turn_idx"], kind="mergesort")
    return out.drop_duplicates(["subj", "pred", "obj"], keep="first").reset_index(drop=True)


def precision_recall(
    engine: pd.DataFrame, oracle: pd.DataFrame
) -> tuple[float, float]:
    """Exact-match P/R on the (subj, pred, obj) sets."""
    e = set(zip(engine["subj"], engine["pred"], engine["obj"]))
    o = set(zip(oracle["subj"], oracle["pred"], oracle["obj"]))
    if not e and not o:
        return (1.0, 1.0)  # both empty = perfect agreement
    if not e or not o:
        return (0.0, 0.0)
    tp = len(e & o)
    return tp / len(e), tp / len(o)


def oracle_mentions(table: pa.Table, normalizer: int = 1) -> pd.DataFrame:
    """Sequential mention extraction (one row per mention) — the gold side
    of the per-type report, mirroring the reference's labeled spans."""
    norm_fn = clean_text_v1 if normalizer == 1 else normalize_text_v2
    loc_pattern = build_loc_pattern()
    df = table.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    rows: list[tuple] = []
    for conv_id, turn_idx, text in zip(df["conv_id"], df["turn_idx"], df["text"]):
        clean = norm_fn(text)
        for m in extract_mentions(clean, loc_pattern):
            if m["norm"]:
                rows.append((conv_id, int(turn_idx), m["etype"], m["norm"]))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "etype", "norm"])


def per_type_report(engine: pd.DataFrame, oracle: pd.DataFrame) -> pd.DataFrame:
    """Per-entity-type precision/recall/F1/support over exact-match mention
    identities (conv_id, turn_idx, etype, norm), plus micro/macro rows —
    the engine-side analogue of the reference's seqeval classification
    report (interpret.py:995-1065, train_ner.py:305-343).

    Empty-vs-empty scores 1.0 per the engine's empty-set convention
    (precision_recall above)."""
    key = ["conv_id", "turn_idx", "etype", "norm"]
    e = set(map(tuple, engine[key].itertuples(index=False)))
    o = set(map(tuple, oracle[key].itertuples(index=False)))
    etypes = sorted({t[2] for t in e} | {t[2] for t in o})

    def prf(es: set, os_: set) -> tuple[float, float, float, int]:
        if not es and not os_:
            return 1.0, 1.0, 1.0, 0
        tp = len(es & os_)
        p = tp / len(es) if es else 0.0
        r = tp / len(os_) if os_ else 0.0
        f1 = 2 * p * r / (p + r) if (p + r) else 0.0
        return p, r, f1, len(os_)

    rows = []
    for et in etypes:
        es = {t for t in e if t[2] == et}
        os_ = {t for t in o if t[2] == et}
        p, r, f1, sup = prf(es, os_)
        rows.append((et, round(p, 4), round(r, 4), round(f1, 4), sup))
    p, r, f1, sup = prf(e, o)
    rows.append(("micro_avg", round(p, 4), round(r, 4), round(f1, 4), sup))
    if etypes:
        per = [rows[i] for i in range(len(etypes))]
        rows.append(
            (
                "macro_avg",
                round(sum(x[1] for x in per) / len(per), 4),
                round(sum(x[2] for x in per) / len(per), 4),
                round(sum(x[3] for x in per) / len(per), 4),
                sup,
            )
        )
    return pd.DataFrame(
        rows, columns=["entity_type", "precision", "recall", "f1", "support"]
    ).astype({"support": "int64"})
