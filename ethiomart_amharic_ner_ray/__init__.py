"""ethiomart_amharic_ner_ray — a Ray-Data-native knowledge-graph construction
engine with the query/data-processing capabilities of the EthioMart Amharic
NER stack (reference studied at /root/reference, behavior only).

Everything here is built on public APIs only: ray.data (Dataset, map_batches,
groupby/map_groups, sort, write_parquet) and Apache Arrow (pyarrow /
pyarrow.compute).

Layout:
    functions/  pure, reference-faithful scalar/batch functions
                (text normalization, regex entity extraction, IOB2 repair,
                Ethiopic character folding, price canonicalization)
    sources/    deterministic synthetic transcript generator + readers
    stages/     Ray Data stages (stateless map_batches fns + stateful
                actor-pool classes)
    pipelines/  end-to-end pipelines (KG triples, scorecards, dedup,
                similarity search, text analysis, relational ops)
    state/      per-partition manifest / checkpoint-resume helpers

The flagship pipeline (pipelines/kg.py) turns Parquet transcript tables
(conv_id, turn_idx, role, text, tool, ts) into deduplicated
(subj, pred, obj) triples, preserving per-turn text equality end-to-end.
"""

__version__ = "0.3.0"  # vectorized bucket hash changes bucket assignment (invalidates 0.2 checkpoints)
