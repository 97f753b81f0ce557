"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Produces the Parquet table of multi-turn conversation transcripts the engine
runs on: columns exactly (conv_id, turn_idx, role, text, tool, ts) per
BASELINE.json's input_hint. Seeded, self-contained, no external data.

Generation mirrors the distributions of the reference corpus
(dataset_statistics.json: ~55 whitespace tokens avg) and its regex surface
(data_cleaner.py:30-33 price/phone/product-trigger patterns): Amharic
e-commerce phrases, price forms ("1,500 ብር", "300ብር", "2500 birr", bare
numbers only v2 catches), phones (09XXXXXXXX / 9XXXXXXXX), gazetteer
locations, trigger words, plus noise (URLs, emoji, English fragments,
"[no text]" sentinel rows, NFKC-unnormalized fullwidth chars).

Skew: sellers are drawn Zipf(a=1.3) so a few sellers are hot — the skew
fixture for salted/two-phase aggregation. Rows are written in globally
shuffled order so conversation reassembly (groupby(conv_id) + stable sort by
turn_idx) is actually exercised; ts is monotone within a conversation unless
``corrupt_ts`` is set (used by tests to prove turn_idx is authoritative).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.extract import DEFAULT_LOCATIONS
from ..schemas import TRANSCRIPT_SCHEMA

PRODUCTS = (
    "ጫማ", "ቦርሳ", "ስልክ", "ላፕቶፕ", "ቲሸርት", "ሶፋ", "ወንበር", "ጠረጴዛ",
    "ምንጣፍ", "ብርድ ልብስ", "የሴቶች ቀሚስ", "የወንዶች ሱሪ", "ሰዓት", "ሠዓት",
    "መነፅር", "ሽቶ", "ክሬም", "ማቀዝቀዣ", "ምድጃ", "ቴሌቪዥን", "ስፒከር",
    "ጆሮ ማዳመጫ", "ካሜራ", "ፍሪጅ", "ማጠቢያ ማሽን", "ኬክ መጋገሪያ", "ሀይላንድ",
    "ኃይላንድ", "ጸጉር ማድረቂያ", "ፀጉር ማድረቂያ",
)

TRIGGERS = ("ሽያጭ", "ለመግዛት", "ይግዙ", "ይሸጥ", "ለሽያጭ", "ገዝተውልኝ")

FILLERS = (
    "እንኳን", "ደህና", "መጡ", "ውድ", "ደንበኞቻችን", "አዲስ", "እቃ", "ገብቷል",
    "በጣም", "ጥራት", "ያለው", "ምርት", "ነው", "ዛሬ", "ብቻ", "ቅናሽ", "አለ",
    "ይደውሉ", "አድራሻ", "ሱቅ", "ቁጥር", "ይጎብኙ", "ነፃ", "ማድረስ", "አገልግሎት",
    "እናመሰግናለን", "ትእዛዝ", "ለማዘዝ", "ዋጋ", "የተለየ", "ስጦታ", "ለበዓል",
    "አዲስ", "ገበያ", "እቃዎች", "ሙሉ", "ዋስትና", "ያላቸው", "ኦሪጅናል", "ጥሩ",
)

NOISE = (
    "https://t.me/ethiomart",
    "www.example.com/shop",
    "😍🔥",
    "👍👍👍",
    "best quality",
    "free delivery",
    "ＶＩＰ",
    "№①",
)

PRICE_FORMS = ("unit_spc", "unit_nospc", "birr_en", "dollar", "bare", "decimal")


def generate_transcripts(
    n_turns: int,
    seed: int = 42,
    n_sellers: int = 200,
    corrupt_ts: bool = False,
    conv_base: int = 0,
) -> pa.Table:
    """Generate ~n_turns transcript rows (whole conversations; row count may
    exceed n_turns by at most one conversation). Deterministic in all args."""
    rng = np.random.RandomState(seed)
    # separate stream for ts corruption so corrupt_ts=True yields IDENTICAL
    # text/conv structure with only the ts order broken (tests rely on this)
    ts_rng = np.random.RandomState(seed + 1000003)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    base_us = 1_700_000_000 * 1_000_000  # fixed epoch, timestamp[us]
    roles_cycle = ("seller", "buyer", "agent")

    conv_no = conv_base  # chunked parallel generation offsets conv ids
    total = 0
    while total < n_turns:
        seller = int((rng.zipf(1.3) - 1) % n_sellers)
        length = int(min(64, rng.geometric(1.0 / 8.0)))
        conv_id = f"c{seller:04d}-{conv_no:06d}"
        conv_start = base_us + conv_no * 37_000_000
        # per-conversation random draws, batched
        kinds = rng.randint(0, 100, size=length)
        for t in range(length):
            kind = kinds[t]
            if kind < 3:
                text = "[no text]"
            else:
                parts: list[str] = []
                n_fill = int(rng.randint(20, 75))
                fill_idx = rng.randint(0, len(FILLERS), size=n_fill)
                parts.extend(FILLERS[i] for i in fill_idx[: n_fill // 2])
                if kind < 60:  # sale segment: trigger + product (+ price)
                    trig = TRIGGERS[rng.randint(len(TRIGGERS))]
                    prod = PRODUCTS[rng.randint(len(PRODUCTS))]
                    seg = f"{trig} {prod}"
                    if kind < 45:
                        seg += " " + _price_expr(rng)
                    parts.append(seg)
                elif kind < 70:  # bare price talk
                    parts.append("ዋጋ፦ " + _price_expr(rng))
                if kind % 7 == 0:
                    phone = f"{rng.randint(10_000_000, 100_000_000):08d}"
                    parts.append(("09" if kind % 2 else "9") + phone)
                if kind % 5 == 0:
                    parts.append(DEFAULT_LOCATIONS[rng.randint(len(DEFAULT_LOCATIONS))])
                if kind % 11 == 0:
                    parts.append(NOISE[rng.randint(len(NOISE))])
                parts.extend(FILLERS[i] for i in fill_idx[n_fill // 2 :])
                text = " ".join(parts)
            conv_ids.append(conv_id)
            turn_idxs.append(t)
            roles.append(roles_cycle[t % 3])
            texts.append(text)
            tools.append("" if kinds[t] % 10 else ("search" if kinds[t] % 20 else "catalog"))
            if corrupt_ts:
                tss.append(conv_start + int(ts_rng.randint(0, 1_000_000_000)))
            else:
                tss.append(conv_start + t * 61_000_000)
        conv_no += 1
        total += length

    # global shuffle so turn reassembly is exercised
    perm = rng.permutation(total)
    table = pa.table(
        {
            "conv_id": pa.array(np.asarray(conv_ids, dtype=object)[perm], pa.string()),
            "turn_idx": pa.array(np.asarray(turn_idxs, dtype=np.int32)[perm]),
            "role": pa.array(np.asarray(roles, dtype=object)[perm], pa.string()),
            "text": pa.array(np.asarray(texts, dtype=object)[perm], pa.string()),
            "tool": pa.array(np.asarray(tools, dtype=object)[perm], pa.string()),
            "ts": pa.array(np.asarray(tss, dtype=np.int64)[perm], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    return table


def _price_expr(rng: np.random.RandomState) -> str:
    form = PRICE_FORMS[rng.randint(len(PRICE_FORMS))]
    amount = int(rng.randint(50, 99_999))
    grouped = f"{amount:,}" if amount >= 1000 and rng.randint(2) else str(amount)
    if form == "unit_spc":
        return f"{grouped} ብር"
    if form == "unit_nospc":
        return f"{grouped}ብር"
    if form == "birr_en":
        return f"{grouped} birr"
    if form == "dollar":
        return f"{grouped} ዶላር"
    if form == "decimal":
        return f"{grouped}.{rng.randint(10, 99)} ብር"
    return grouped  # bare number: only the v2 normalizer prices it


def ensure_transcripts(
    out_dir: str | Path,
    n_turns: int,
    seed: int = 42,
    n_sellers: int = 200,
    n_files: int | None = None,
    corrupt_ts: bool = False,
) -> str:
    """Generate-and-cache transcripts as a multi-file Parquet directory so
    ray.data.read_parquet parallelizes the read. Idempotent: if the directory
    already holds a complete generation for the same parameters (marker
    file), it is reused."""
    out_dir = Path(out_dir)
    marker = out_dir / "_GENERATED.json"
    if n_files is None:
        n_files = max(1, min(64, n_turns // 50_000))
    params = (
        f"n_turns={n_turns} seed={seed} n_sellers={n_sellers} "
        f"corrupt_ts={corrupt_ts} n_files={n_files}"
    )
    if marker.exists() and marker.read_text() == params:
        return str(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for old in out_dir.glob("*.parquet"):
        old.unlink()
    table = generate_transcripts(n_turns, seed=seed, n_sellers=n_sellers, corrupt_ts=corrupt_ts)
    rows_per = -(-table.num_rows // n_files)
    for i in range(n_files):
        chunk = table.slice(i * rows_per, rows_per)
        if chunk.num_rows == 0:
            break
        pq.write_table(chunk, out_dir / f"part-{i:05d}.parquet")
    tmp = marker.with_suffix(".tmp")
    tmp.write_text(params)
    os.replace(tmp, marker)
    return str(out_dir)


def ensure_transcripts_parallel(
    out_dir: str | Path,
    n_turns: int,
    seed: int = 42,
    n_sellers: int = 200,
    n_chunks: int = 32,
) -> str:
    """Large-corpus generation as Ray tasks: each chunk is an independent
    deterministic generator run (seed derived per chunk, conv ids offset per
    chunk so they never collide). Output differs from the sequential
    generator for the same n_turns — it is its own deterministic fixture,
    keyed by (n_turns, seed, n_chunks). Requires an initialized Ray session."""
    import ray

    out_dir = Path(out_dir)
    marker = out_dir / "_GENERATED.json"
    params = f"parallel n_turns={n_turns} seed={seed} n_sellers={n_sellers} chunks={n_chunks}"
    if marker.exists() and marker.read_text() == params:
        return str(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for old in out_dir.glob("*.parquet"):
        old.unlink()

    per_chunk = -(-n_turns // n_chunks)
    # conversations average ~8 turns; 4x headroom on the id range per chunk
    conv_span = max(1000, per_chunk // 2)

    @ray.remote
    def gen_chunk(c: int) -> str:
        table = generate_transcripts(
            per_chunk,
            seed=seed * 1_000_003 + c,
            n_sellers=n_sellers,
            conv_base=c * conv_span,
        )
        path = out_dir / f"part-{c:05d}.parquet"
        pq.write_table(table, path)
        return str(path)

    ray.get([gen_chunk.remote(c) for c in range(n_chunks)])
    tmp = marker.with_suffix(".tmp")
    tmp.write_text(params)
    os.replace(tmp, marker)
    return str(out_dir)


from ray.data.datasource import Datasource as _RayDatasource


class TranscriptSynthDatasource(_RayDatasource):
    """Custom ``ray.data.Datasource`` for transcript ingestion — the S1
    (live channel reader) extension slot done idiomatically: the driver
    plans N ReadTasks with row-count metadata; each task generates its
    deterministic conversation chunk INSIDE the read (seed + conv-id offset
    per chunk, like ensure_transcripts_parallel), so ingestion streams
    straight into the pipeline with no staging files. A real live source
    swaps the generator body for an API pager per task while keeping the
    planning/metadata shape.

    Use: ``ray.data.read_datasource(TranscriptSynthDatasource(n_turns))``.
    """

    def __init__(self, n_turns: int, seed: int = 42, n_sellers: int = 200, n_chunks: int = 32):
        self.n_turns = n_turns
        self.seed = seed
        self.n_sellers = n_sellers
        self.n_chunks = max(1, min(n_chunks, max(1, n_turns // 100)))

    # --- ray.data.Datasource protocol ---------------------------------------

    def get_name(self) -> str:
        return "TranscriptSynth"

    def estimate_inmemory_data_size(self):
        return int(self.n_turns * 220)  # ≈ bytes/turn of the synth schema

    def get_read_tasks(self, parallelism: int):
        from ray.data import ReadTask
        from ray.data.block import BlockMetadata

        n_chunks = self.n_chunks
        per = self.n_turns // n_chunks
        tasks = []
        for ci in range(n_chunks):
            n = per if ci < n_chunks - 1 else self.n_turns - per * (n_chunks - 1)
            if n <= 0:
                continue
            seed_i = self.seed + 7919 * ci
            base = ci * (per * 4 + 1024)  # disjoint conv-id ranges per chunk

            def gen(n=n, seed_i=seed_i, base=base, ns=self.n_sellers):
                yield generate_transcripts(n, seed=seed_i, n_sellers=ns, conv_base=base)

            meta = BlockMetadata(
                num_rows=None,  # generator may round up to whole conversations
                size_bytes=int(n * 220),
                exec_stats=None,
                input_files=None,
            )
            tasks.append(ReadTask(gen, meta))
        return tasks

    def supports_distributed_reads(self) -> bool:
        return True
