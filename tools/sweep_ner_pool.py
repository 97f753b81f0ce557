"""Actor-pool sizing sweep for the tiny-transformer NER scoring stage
(extractor="ner_subword") — pre-measures the GPU-deployment knobs
(batch_size × pool size) for the stage a real HF backend would fill
(stages/ner_scorer.py; the numpy forward exercises the identical
dataflow: word-piece tokenize → subword align → per-subword logits →
argmax decode → repair → mentions).

Usage:
    python tools/sweep_ner_pool.py [n_turns] [--record]

Runs build_mentions(extractor="ner_subword") over the deterministic
synthetic transcripts at ``n_turns`` (default 60_000) for each
(batch_size, concurrency) combination, one fresh timing per config in
ONE Ray session (configs share the warm cluster; the stage itself spins
a fresh actor pool per config, which is what the measurement wants —
spin-up cost is part of the knob). Prints a markdown table of turns/s;
``--record`` appends it to BASELINE.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import ray  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    record = "--record" in sys.argv
    n_turns = int(args[0]) if args else 60_000

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ethiomart_amharic_ner_ray.pipelines.kg import build_mentions
    from ethiomart_amharic_ner_ray.sources.transcripts import ensure_transcripts

    path = ensure_transcripts(f"/tmp/graft_transcripts/sweep_{n_turns}", n_turns, seed=42)

    def one(batch_size: int, pool: int) -> float:
        ds = ray.data.read_parquet(path)
        t0 = time.time()
        n = build_mentions(
            ds, extractor="ner_subword", concurrency=(1, pool), batch_size=batch_size
        ).count()
        dt = time.time() - t0
        assert n > 0
        return n_turns / dt

    # warm the cluster + input cache once (untimed)
    one(2048, 8)

    batch_sizes = [256, 1024, 2048, 4096]
    pools = [4, 8, 16, 32]
    rows = []
    for bs in batch_sizes:
        row = {"batch_size": bs}
        for p in pools:
            row[f"pool={p}"] = round(one(bs, p))
        rows.append(row)
        print(row, flush=True)

    header = "| batch_size | " + " | ".join(f"pool={p}" for p in pools) + " |"
    sep = "|---" * (len(pools) + 1) + "|"
    lines = [header, sep]
    for r in rows:
        lines.append(
            f"| {r['batch_size']} | "
            + " | ".join(str(r[f"pool={p}"]) for p in pools)
            + " |"
        )
    best = max(
        ((r["batch_size"], p, r[f"pool={p}"]) for r in rows for p in pools),
        key=lambda x: x[2],
    )
    table = "\n".join(lines)
    print(table)
    print(f"best: batch_size={best[0]} pool={best[1]} -> {best[2]} turns/s")

    if record:
        stamp = time.strftime("%Y-%m-%d %H:%M")
        with open(Path(__file__).resolve().parent.parent / "BASELINE.md", "a") as f:
            f.write(
                f"\n### ner_subword actor-pool sizing sweep ({stamp}, "
                f"{n_turns} turns, 32 CPUs, turns/s incl. pool spin-up)\n\n"
                + table
                + f"\n\nBest: batch_size={best[0]}, pool={best[1]} "
                f"({best[2]} turns/s). The numpy TinyTransformerForward is "
                f"compute-bound per batch like a real model; on GPU workers "
                f"replace pool with #GPUs and re-run this sweep.\n"
            )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
