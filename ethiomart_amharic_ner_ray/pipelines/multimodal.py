"""Multimodal (binary-payload) plumbing — real Ray-side mechanics, stubbed
decoders.

The reference downloads Telegram photos to loose .jpg files and OCRs them
(SURVEY.md §2.1 S2/S12). At engine scale, media is an opaque ``binary``
column with typed metadata, processed by CPU-bound actor-pool map_batches
with SMALL batch sizes (large payload × concurrency must fit worker heap).

This container ships no image/audio libs, so ``decode="real"`` raises
NotImplementedError (clearly marked stub); ``decode="fake"`` derives
deterministic pseudo-features from the bytes so the schema, batch sizing,
actor signature and output layout are real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("conv_id", pa.string()),
        pa.field("media_type", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("blob", pa.binary()),
    ]
)

FEATURE_DIM = 8


def synth_media_table(n: int, seed: int = 42, blob_bytes: int = 4096) -> pa.Table:
    """Deterministic synthetic media rows (opaque binary payloads)."""
    rng = np.random.RandomState(seed)
    blobs = [rng.bytes(blob_bytes) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "conv_id": pa.array([f"c{rng.randint(0, 50):04d}-{i:06d}" for i in range(n)], pa.string()),
            "media_type": pa.array([("image/jpeg", "audio/ogg", "video/mp4")[i % 3] for i in range(n)], pa.string()),
            "width": pa.array(rng.randint(64, 2048, size=n).astype(np.int32)),
            "height": pa.array(rng.randint(64, 2048, size=n).astype(np.int32)),
            "blob": pa.array(blobs, pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaFeaturizer:
    """Actor-pool decode/feature-extract stage.

    __init__ is where a real decoder would load its model/codec ONCE per
    actor. batch_size for this stage must be small (payloads are big):
    ``map_batches(MediaFeaturizer, batch_size=32, concurrency=(1,N))``.
    """

    def __init__(self, decode: str = "fake"):
        if decode == "real":
            raise NotImplementedError(
                "real decode requires PIL/ffmpeg — not in this container. "
                "Wire the decoder here; everything downstream is payload-agnostic."
            )
        self._decode = decode

    def _features(self, blob: bytes) -> list[float]:
        # deterministic pseudo-embedding: digest → 8 floats in [0, 1)
        d = hashlib.blake2b(blob, digest_size=FEATURE_DIM * 4).digest()
        ints = np.frombuffer(d, dtype=np.uint32)
        return list(np.round(ints / 2**32, 6))

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        blobs = t.column("blob").to_pylist()  # single copy out of Arrow
        feats = [self._features(b) for b in blobs]
        sizes = pc.cast(pc.binary_length(t.column("blob")), pa.int64())
        out = t.drop_columns(["blob"])  # features replace payload downstream
        out = out.append_column("blob_bytes", sizes)
        out = out.append_column("features", pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)))
        return out


def _synth_media_batch(t: pa.Table, seed: int, blob_bytes: int) -> pa.Table:
    """Per-block synthetic media rows, seeded by media_id — the distributed
    generator: blobs are born inside tasks, never on the driver."""
    ids = t.column("id").to_numpy()
    blobs = []
    convs = []
    widths = np.empty(len(ids), np.int32)
    heights = np.empty(len(ids), np.int32)
    for j, i in enumerate(ids):
        rng = np.random.RandomState(seed + int(i))
        blobs.append(rng.bytes(blob_bytes))
        convs.append(f"c{rng.randint(0, 50):04d}-{int(i):06d}")
        widths[j] = rng.randint(64, 2048)
        heights[j] = rng.randint(64, 2048)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "conv_id": pa.array(convs, pa.string()),
            "media_type": pa.array([("image/jpeg", "audio/ogg", "video/mp4")[int(i) % 3] for i in ids], pa.string()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "blob": pa.array(blobs, pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def media_features(n: int = 200, seed: int = 42, blob_bytes: int = 4096) -> "ray.data.Dataset":
    """Synthetic media → featurized dataset (rows-only check)."""
    ds = ray.data.range(n)
    ds = ds.map_batches(
        _synth_media_batch,
        fn_kwargs={"seed": seed, "blob_bytes": blob_bytes},
        batch_format="pyarrow",
        batch_size=256,
    )
    return ds.map_batches(
        MediaFeaturizer, batch_format="pyarrow", batch_size=32, concurrency=(1, 4)
    )


class MediaResizer:
    """Actor-pool resize stage: payload in, payload out, dims rewritten.

    ``decode="real"`` is the PIL/ffmpeg slot (NotImplementedError here);
    ``decode="fake"`` derives a deterministic pseudo-resized payload whose
    size scales with the target pixel area, so batch sizing under payload
    SHRINK/GROWTH is exercised for real. Keep ``batch_size`` small — the
    working set is (input + output payload) × batch × concurrency."""

    def __init__(self, target_w: int = 256, target_h: int = 256, decode: str = "fake"):
        if decode == "real":
            raise NotImplementedError(
                "real resize requires PIL/ffmpeg — not in this container."
            )
        self.tw, self.th = target_w, target_h

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        widths = t.column("width").to_numpy()
        heights = t.column("height").to_numpy()
        out_blobs = []
        for blob, w, h in zip(t.column("blob").to_pylist(), widths, heights):
            # deterministic stand-in: stretch/shrink the byte stream to the
            # target-area-proportional size via a seeded digest expansion
            scale = (self.tw * self.th) / max(int(w) * int(h), 1)
            target_len = max(16, int(len(blob) * scale))
            seed = hashlib.blake2b(blob, digest_size=16).digest()
            reps = (target_len // 16) + 1
            out_blobs.append((seed * reps)[:target_len])
        out = t.drop_columns(["blob", "width", "height"])
        out = out.append_column("width", pa.array(np.full(t.num_rows, self.tw, np.int32)))
        out = out.append_column("height", pa.array(np.full(t.num_rows, self.th, np.int32)))
        return out.append_column("blob", pa.array(out_blobs, pa.binary()))


class FrameSampler:
    """Row-expanding frame-sample stage for video payloads: each row becomes
    ``n_frames`` rows (media_id, frame_idx, ts_frac, frame blob) — the
    uniform-stride frame sampling shape. The expansion happens inside
    map_batches (one output table per input batch), so block sizes stay
    bounded: output bytes ≈ input bytes, rows × n_frames."""

    def __init__(self, n_frames: int = 4, decode: str = "fake"):
        if decode == "real":
            raise NotImplementedError(
                "real frame extraction requires ffmpeg — not in this container."
            )
        self.n_frames = n_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, idxs, fracs, blobs = [], [], [], []
        for mid, blob in zip(t.column("media_id").to_pylist(), t.column("blob").to_pylist()):
            n = self.n_frames
            step = max(1, len(blob) // n)
            for fi in range(n):
                ids.append(mid)
                idxs.append(fi)
                fracs.append(round(fi / n, 6))
                blobs.append(blob[fi * step : (fi + 1) * step] or b"\x00")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "ts_frac": pa.array(fracs, pa.float32()),
                "blob": pa.array(blobs, pa.binary()),
            }
        )


def media_frames(n: int = 200, seed: int = 42, n_frames: int = 4) -> "ray.data.Dataset":
    """Video rows → sampled frames → per-frame features (rows-only check):
    filter to video, frame-sample (row expansion), featurize each frame —
    all small-batch actor-pool stages over binary columns."""
    ds = ray.data.range(n)
    ds = ds.map_batches(
        _synth_media_batch,
        fn_kwargs={"seed": seed, "blob_bytes": 4096},
        batch_format="pyarrow",
        batch_size=256,
    )

    def only_video(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t.column("media_type"), "video/mp4"))

    ds = ds.map_batches(only_video, batch_format="pyarrow")
    ds = ds.map_batches(FrameSampler, batch_format="pyarrow", batch_size=32, concurrency=(1, 4))
    return ds.map_batches(
        MediaFeaturizer, batch_format="pyarrow", batch_size=32, concurrency=(1, 4)
    )


def archive_media_zips(media_ds: "ray.data.Dataset", out_dir: str, group_col: str = "conv_id") -> int:
    """S3 parity (reference per-channel ZIP archiver) at engine scale: one
    ZIP per ``group_col`` group, written INSIDE the grouped task (atomic
    tmp+rename) — the driver never sees a blob. Entry names are
    ``<media_id>.bin``; groups are hash-bucketed like every other wide op.
    Returns the number of archives written."""
    import os
    import zipfile

    import pandas as pd

    from .common import bucketed_group_agg

    os.makedirs(out_dir, exist_ok=True)

    def write_zips(df: pd.DataFrame) -> pd.DataFrame:
        names = []
        for key, g in df.groupby(group_col, sort=False):
            path = os.path.join(out_dir, f"{key}.zip")
            tmp = path + ".tmp"
            with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_STORED) as zf:
                for r in g.itertuples():
                    zf.writestr(f"{r.media_id}.bin", bytes(r.blob))
            os.replace(tmp, path)
            names.append(str(key))
        return pd.DataFrame({"archive": names})

    out = bucketed_group_agg(
        media_ds.select_columns([group_col, "media_id", "blob"]), [group_col], write_zips, n_buckets=32
    )
    return out.count()


class MediaPHasher:
    """Actor-pool perceptual-hash stage: blob → 64-bit signature whose bits
    survive small payload edits (the image-dedup analogue of SimHash). A
    real implementation decodes and DCTs the image (classic pHash) in
    ``__init__``-loaded codec state; the ``fake`` path derives the same
    SHAPE of signature — a coarse 64-bin byte histogram thresholded at its
    median — so near-identical payloads land at hamming ≈ 0-2 while
    unrelated ones sit near 32. Signature + banding layout are what a
    torch/PIL-ful container would keep unchanged."""

    def __init__(self, decode: str = "fake"):
        if decode == "real":
            raise NotImplementedError("no image libs in this container; decode='fake'")
        self.decode = decode

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = np.empty(t.num_rows, np.uint64)
        for j, blob in enumerate(t.column("blob").to_pylist()):
            hist = np.bincount(
                np.frombuffer(blob, dtype=np.uint8) >> 2, minlength=64
            ).astype(np.int64)
            bits = (hist > np.median(hist)).astype(np.uint64)
            sigs[j] = np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64))
        out = t.select(["media_id"])
        return out.append_column("phash", pa.array(sigs.view(np.int64), pa.int64()))


def media_phash_pairs(
    n: int = 200, seed: int = 42, blob_bytes: int = 4096, max_hamming: int = 3
) -> "pd.DataFrame":
    """Media near-duplicate pairs by perceptual hash: synth payloads (every
    10th blob is a lightly-corrupted copy of its predecessor — the planted
    near-dups), actor-pool pHash signatures, then the SimHash banding shape:
    4×16-bit bands → ONE groupby on the band value → in-bucket hamming
    verify (exact for hamming ≤ 3 by pigeonhole). Rows-only (binary-payload
    semantics); the planted pairs are pinned by tests/test_multimodal.py."""
    import pandas as pd

    from .common import bucketed_group_agg

    ds = ray.data.range(n)

    def synth_with_dups(t: pa.Table) -> pa.Table:
        base = _synth_media_batch(t, seed, blob_bytes)
        ids = base.column("media_id").to_numpy()
        blobs = base.column("blob").to_pylist()
        for j, i in enumerate(ids):
            if int(i) % 10 == 9:
                rng = np.random.RandomState(seed + int(i) - 1)
                src = bytearray(rng.bytes(blob_bytes))
                edit = np.random.RandomState(seed ^ int(i))
                for pos in edit.randint(0, blob_bytes, size=8):
                    src[pos] ^= 0x5A
                blobs[j] = bytes(src)
        return base.set_column(base.schema.get_field_index("blob"), "blob", pa.array(blobs, pa.binary()))

    sigs = ds.map_batches(synth_with_dups, batch_format="pyarrow", batch_size=256)
    sigs = sigs.map_batches(MediaPHasher, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))

    def explode(t: pa.Table) -> pa.Table:
        m = t.num_rows
        sig = t.column("phash").to_numpy().astype(np.int64).view(np.uint64)
        bands = [((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64) for b in range(4)]
        return pa.table(
            {
                "bi": pa.array(np.repeat(np.arange(4, dtype=np.int32), m)),
                "bv": pa.array(np.concatenate(bands).astype(np.int32)),
                "media_id": pa.array(np.tile(t.column("media_id").to_numpy(), 4), pa.int64()),
                "phash": pa.array(np.tile(sig.view(np.int64), 4), pa.int64()),
            }
        )

    ex = sigs.map_batches(explode, batch_format="pyarrow")

    def verify(df: "pd.DataFrame") -> "pd.DataFrame":
        a_l, b_l, h_l = [], [], []
        for _, g in df.groupby(["bi", "bv"], sort=False):
            if len(g) < 2:
                continue
            g = g.drop_duplicates("media_id").sort_values("media_id")
            ids = g["media_id"].to_numpy()
            sig = g["phash"].to_numpy().astype(np.int64).view(np.uint64)
            for i in range(len(ids)):
                x = np.bitwise_xor(sig[i], sig[i + 1 :])
                ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
                for k in np.nonzero(ham <= max_hamming)[0]:
                    a_l.append(int(ids[i]))
                    b_l.append(int(ids[i + 1 + k]))
                    h_l.append(int(ham[k]))
        return pd.DataFrame(
            {
                "a": pd.array(a_l, dtype="int64"),
                "b": pd.array(b_l, dtype="int64"),
                "hamming": pd.array(h_l, dtype="int32"),
            }
        )

    cand = bucketed_group_agg(ex, ["bi", "bv"], verify, n_buckets=16)
    out = bucketed_group_agg(
        cand, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"]), n_buckets=8
    ).to_pandas()
    if out.empty:
        import pandas as pd

        return pd.DataFrame(
            {
                "a": pd.array([], dtype="int64"),
                "b": pd.array([], dtype="int64"),
                "hamming": pd.array([], dtype="int32"),
            }
        )
    return out.sort_values(["a", "b"]).reset_index(drop=True)
