"""CLI entrypoint — the ``ray job submit`` body for cluster runs.

    python -m ethiomart_amharic_ner_ray.run \
        --input /data/transcripts --out /data/kg_out \
        --buckets 4096 --normalizer 1 --extractor regex

On a real cluster this is submitted via ``ray job submit --working-dir .``
with ``address`` pointing at the cluster; in this sandbox it starts a local
session. Resume is the default: finished buckets (per-bucket manifests)
are skipped, partial buckets are cleaned and rebuilt.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Run the KG construction pipeline")
    p.add_argument("--input", required=True, help="transcripts Parquet path/dir")
    p.add_argument("--out", required=True, help="output dir (mentions/, triples/)")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--normalizer", type=int, default=1, choices=(1, 2))
    p.add_argument("--extractor", default="regex", choices=("regex", "ner", "ner_subword"))
    p.add_argument("--no-link", action="store_true")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument(
        "--update-delta",
        default=None,
        help="incremental mode: fold this Parquet dir of NEW turns into the "
        "completed checkpoint at --out (O(delta), not O(corpus); pipeline "
        "params are read from the base run's fingerprint — --buckets/"
        "--normalizer/--extractor are ignored)",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument(
        "--export-format",
        choices=("json", "csv"),
        default=None,
        help="additionally export triples as JSON/CSV (S4/S6 writer parity; Parquet stays canonical)",
    )
    p.add_argument(
        "--labeling-out",
        default=None,
        help="also run the labeling branch (rule-tag → repair → validate → "
        "hash split) and export CoNLL shards + tag stats here "
        "(reference labeling_prep/conll_annotator parity)",
    )
    p.add_argument(
        "--scorecards-out",
        default=None,
        help="also compute per-seller scorecards + run summary here "
        "(reference generate_scorecards parity)",
    )
    p.add_argument(
        "--report-html",
        default=None,
        help="write a self-contained HTML run report (charts as inline SVG "
        "from the aggregate frames; reference visualization.py parity at "
        "engine scale). Requires --scorecards-out for the seller sections.",
    )
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.update_delta:
        from .pipelines.kg_update import run_kg_update

        stats = run_kg_update(args.input, args.update_delta, args.out)
    else:
        from .pipelines.kg import run_kg_pipeline

        stats = run_kg_pipeline(
            args.input,
            args.out,
            n_buckets=args.buckets,
            normalizer=args.normalizer,
            extractor=args.extractor,
            link=not args.no_link,
            resume=not args.no_resume,
        )
    if args.export_format and stats.get("triples_rows"):
        import glob
        import os

        import ray.data

        files = sorted(glob.glob(os.path.join(stats["triples_dir"], "bucket=*", "*.parquet")))
        ds = ray.data.read_parquet(files)
        if args.export_format == "csv":
            # CSV cannot carry the nested provenance struct; flatten it
            import pyarrow as pa

            def flatten(t: pa.Table) -> pa.Table:
                prov = t.column("provenance").combine_chunks()
                t = t.drop_columns(["provenance"])
                t = t.append_column("extractor", prov.field("extractor"))
                return t.append_column("confidence", prov.field("confidence"))

            ds = ds.map_batches(flatten, batch_format="pyarrow")
            ds.write_csv(os.path.join(args.out, "triples_csv"))
        else:
            ds.write_json(os.path.join(args.out, "triples_json"))
        stats["export"] = args.export_format

    if args.labeling_out:
        import ray.data

        from .pipelines.labeling import (
            export_conll,
            prepare_labeled,
            sentences_from_transcripts,
            tag_distribution,
        )

        tx = ray.data.read_parquet(args.input)
        prepared = prepare_labeled(sentences_from_transcripts(tx)).materialize()
        stats["labeling"] = export_conll(prepared, args.labeling_out)
        tag_distribution(prepared).to_json(
            args.labeling_out + "/tag_distribution.json", orient="records"
        )

    if args.scorecards_out:
        import os

        import ray.data

        from .pipelines.kg import build_mentions
        from .pipelines.scorecard import scorecard_summary, seller_scorecards

        tx = ray.data.read_parquet(args.input)
        mentions = build_mentions(tx).materialize()
        cards = seller_scorecards(mentions).materialize()
        os.makedirs(args.scorecards_out, exist_ok=True)
        cards.write_parquet(os.path.join(args.scorecards_out, "scorecards"))
        summary = scorecard_summary(cards)
        summary.to_json(
            os.path.join(args.scorecards_out, "summary.json"), orient="records"
        )
        stats["scorecards"] = cards.count()
        if args.report_html:
            from .pipelines.report import render_html_report, write_html_report

            write_html_report(
                args.report_html,
                render_html_report(
                    cards.to_pandas(), summary, stats.get("pred_counts")
                ),
            )
            stats["report_html"] = args.report_html
    elif args.report_html:
        from .pipelines.report import render_html_report, write_html_report

        import pandas as pd

        write_html_report(
            args.report_html,
            render_html_report(pd.DataFrame(), None, stats.get("pred_counts")),
        )
        stats["report_html"] = args.report_html

    print(json.dumps(stats))
    if owns_session:  # never tear down a caller's (or test fixture's) session
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
