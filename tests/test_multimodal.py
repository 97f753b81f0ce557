"""Multimodal binary-column plumbing: featurize, resize, frame-sample.

Decoders are environment-stubbed; everything Ray-side (schemas, batch
shapes, actor signatures, row expansion, payload scaling) is real."""

import numpy as np
import pytest

from ethiomart_amharic_ner_ray.pipelines.multimodal import (
    FEATURE_DIM,
    FrameSampler,
    MediaFeaturizer,
    MediaResizer,
    media_features,
    media_frames,
    synth_media_table,
)


class TestStages:
    def test_featurizer_deterministic(self):
        t = synth_media_table(16, seed=7)
        f = MediaFeaturizer()
        o1, o2 = f(t), f(t)
        assert o1.equals(o2)
        assert o1.column("features").type.list_size == FEATURE_DIM
        assert "blob" not in o1.schema.names  # payload replaced by features
        assert o1.column("blob_bytes").to_pylist() == [4096] * 16

    def test_resizer_scales_payload_with_target_area(self):
        t = synth_media_table(8, seed=7)
        small = MediaResizer(64, 64)(t)
        big = MediaResizer(1024, 1024)(t)
        assert small.column("width").to_pylist() == [64] * 8
        s_bytes = [len(b) for b in small.column("blob").to_pylist()]
        b_bytes = [len(b) for b in big.column("blob").to_pylist()]
        assert sum(b_bytes) > sum(s_bytes)
        # deterministic
        again = MediaResizer(64, 64)(t)
        assert again.equals(small)

    def test_frame_sampler_expands_rows(self):
        t = synth_media_table(6, seed=7)
        out = FrameSampler(n_frames=4)(t)
        assert out.num_rows == 24
        assert sorted(set(out.column("frame_idx").to_pylist())) == [0, 1, 2, 3]
        # frames partition the payload prefix; all non-empty
        assert all(len(b) > 0 for b in out.column("blob").to_pylist())

    @pytest.mark.parametrize("cls", [MediaFeaturizer, MediaResizer, FrameSampler])
    def test_real_decode_is_clearly_stubbed(self, cls):
        with pytest.raises(NotImplementedError):
            cls(decode="real")


class TestPipelines:
    def test_media_features_scales_with_n(self, ray_session):
        assert media_features(64, seed=42).count() == 64
        assert media_features(128, seed=42).count() == 128

    def test_media_frames_end_to_end(self, ray_session):
        ds = media_frames(60, seed=42, n_frames=4)
        df = ds.to_pandas()
        # every third synthetic row is video/mp4 → 20 videos × 4 frames
        assert len(df) == 80
        assert {"media_id", "frame_idx", "ts_frac", "blob_bytes", "features"} <= set(df.columns)
        assert df.groupby("media_id").size().eq(4).all()


class TestZipArchiver:
    def test_one_zip_per_group_with_all_blobs(self, ray_session, tmp_path):
        import glob
        import zipfile

        import ray.data as rd

        from ethiomart_amharic_ner_ray.pipelines.multimodal import (
            archive_media_zips,
            synth_media_table,
        )

        t = synth_media_table(60, seed=4)
        n = archive_media_zips(rd.from_arrow(t), str(tmp_path / "zips"))
        groups = set(t.column("conv_id").to_pylist())
        assert n == len(groups)
        files = glob.glob(str(tmp_path / "zips" / "*.zip"))
        assert len(files) == len(groups)
        # spot-check one group's archive restores the exact payloads
        conv = sorted(groups)[0]
        want = {
            f"{m}.bin": b
            for m, c, b in zip(
                t.column("media_id").to_pylist(),
                t.column("conv_id").to_pylist(),
                t.column("blob").to_pylist(),
            )
            if c == conv
        }
        with zipfile.ZipFile(tmp_path / "zips" / f"{conv}.zip") as zf:
            got = {n: zf.read(n) for n in zf.namelist()}
        assert got == want
        assert not glob.glob(str(tmp_path / "zips" / "*.tmp"))  # atomic


class TestMediaPHash:
    def test_planted_near_dups_found(self, ray_session):
        """Every 10th payload is a lightly-corrupted copy of its
        predecessor: pHash banding must pair each (i-1, i) plant at small
        hamming, and must NOT pair unrelated random payloads."""
        from ethiomart_amharic_ner_ray.pipelines.multimodal import media_phash_pairs

        out = media_phash_pairs(n=100, seed=42)
        pairs = set(zip(out["a"], out["b"]))
        planted = {(i - 1, i) for i in range(9, 100, 10)}
        assert planted <= pairs, planted - pairs
        extras = pairs - planted
        # random 4KB payloads sit near hamming 32 — banding may surface a
        # rare coincidence, but it must stay rare
        assert len(extras) <= 2, extras
        assert (out["hamming"] <= 3).all()

    def test_real_decode_is_marked_stub(self, ray_session):
        import pytest as _pytest

        from ethiomart_amharic_ner_ray.pipelines.multimodal import MediaPHasher

        with _pytest.raises(NotImplementedError):
            MediaPHasher(decode="real")
