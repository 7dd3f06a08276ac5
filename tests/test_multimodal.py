"""Multimodal codec + pipeline tests: the PNG/WAV decode paths are REAL
stdlib decoders (zlib + PNG row filters shared with the PDF parser;
the ``wave`` module), so features are computed from decoded
pixels/samples.  Value-hash goldens pin the full pipeline outputs
(deterministic: seeded corpus, stdlib codecs, integer features)."""

import hashlib

import numpy as np
import pytest

from pdf_parser_ray.pipelines.multimodal import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


class TestPngCodec:
    def test_rgb_roundtrip(self):
        rng = np.random.default_rng(7)
        pixels = rng.integers(0, 256, size=(23, 37, 3), dtype=np.uint8)
        assert (decode_png(encode_png(pixels)) == pixels).all()

    def test_gray_roundtrip(self):
        rng = np.random.default_rng(8)
        pixels = rng.integers(0, 256, size=(11, 5), dtype=np.uint8)
        assert (decode_png(encode_png(pixels)) == pixels).all()

    def test_filtered_rows_decode(self):
        """The decoder reverses real PNG row filters (Sub/Up/Average/
        Paeth), not just the filter-0 rows our encoder emits — rebuild
        a PNG with every filter type and check pixel identity."""
        import struct
        import zlib

        rng = np.random.default_rng(9)
        pixels = rng.integers(0, 256, size=(5, 8, 3), dtype=np.uint8)
        bpp = 3
        rows = []
        prev = np.zeros(8 * bpp, np.int32)
        for r, ft in enumerate([0, 1, 2, 3, 4]):
            cur = pixels[r].reshape(-1).astype(np.int32)
            out = np.empty_like(cur)
            for i in range(len(cur)):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                        b if pb_ <= pc_ else c
                    )
                out[i] = (cur[i] - pred) & 0xFF
            rows.append(bytes([ft]) + out.astype(np.uint8).tobytes())
            prev = cur

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload))
                + tag
                + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 5, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b"")
        )
        assert (decode_png(png) == pixels).all()

    def test_rejects_non_png(self):
        with pytest.raises(ValueError):
            decode_png(b"not a png at all")


class TestWavCodec:
    def test_roundtrip(self):
        rng = np.random.default_rng(11)
        samples = rng.integers(-30000, 30000, size=4096).astype(np.int16)
        got, rate = decode_wav(encode_wav(samples, rate=8000))
        assert rate == 8000
        assert (got == samples).all()


class TestSynthesizedPayloadsAreReal:
    def test_image_rows_decode_to_metadata_dims(self):
        from pdf_parser_ray.pipelines.jpeg import (
            decode_mjpeg_frame,
            mjpeg_frame_count,
        )
        from pdf_parser_ray.pipelines.multimodal import (
            VIDEO_FPS,
            synthesize_media,
        )

        tbl = synthesize_media(30)
        for row in tbl.to_pylist():
            if row["kind"] == "image":
                px = decode_png(row["payload"])
                assert px.shape == (row["height"], row["width"], 3)
            elif row["kind"] == "audio":
                samples, rate = decode_wav(row["payload"])
                assert len(samples) == rate * row["duration_ms"] // 1000
            else:  # video rows are REAL MJPEG matching their metadata
                n_frames = mjpeg_frame_count(row["payload"])
                assert n_frames == max(
                    1, int(row["duration_ms"] * VIDEO_FPS / 1000)
                )
                px = decode_mjpeg_frame(row["payload"], n_frames - 1)
                assert px.shape == (row["height"], row["width"], 3)


@pytest.mark.parametrize(
    "name,keys,n_rows,md5",
    [
        ("media_features", ["media_id"], 300,
         "0e8720cf962d130cbf558a338d877c4b"),
        ("frame_sample", ["media_id", "frame_idx"], 399,
         "6aa210913f16e4f2d32feb33a5fe9ba5"),
        ("audio_features", ["media_id"], 100,
         "0da123bc7a2c1e2f29b6e9f52c238348"),
    ],
)
def test_pipeline_value_hash_golden(
    ray_session, quiet_data_context, name, keys, n_rows, md5
):
    import __ray_entry__ as entrymod

    df = entrymod.queries()[name]("/root/testdata/sf0.001").to_pandas()
    df = df[sorted(df.columns)].sort_values(by=keys).reset_index(drop=True)
    assert len(df) == n_rows, name
    got = hashlib.md5(df.to_csv(index=False).encode()).hexdigest()
    assert got == md5, name


class TestImageDedup:
    def test_planted_clones_recovered_no_false_positives(
        self, ray_session, quiet_data_context
    ):
        """The +-2-noise clones of every 4th image (hamming <= 2 after
        aHash) must all surface; independent noise images (~32 bits
        apart) must not."""
        from pdf_parser_ray.pipelines.multimodal import (
            IMAGE_CLONE_OFFSET,
            image_dedup_pipeline,
        )

        df = image_dedup_pipeline(300).to_pandas()
        real = df[df["media_id_a"] >= 0]
        got = set(
            zip(real["media_id_a"].astype(int), real["media_id_b"].astype(int))
        )
        planted = {(m, m + IMAGE_CLONE_OFFSET) for m in range(0, 300, 12)}
        assert got == planted  # full recall, zero false positives
        assert len(real) == len(planted)  # band duplicates removed
        assert (real["hamming"] <= 2).all()

    def test_ahash_properties(self):
        import numpy as np

        from pdf_parser_ray.pipelines.multimodal import ahash64

        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(40, 60, 3), dtype=np.uint8)
        h = ahash64(px)
        assert ahash64(px) == h  # deterministic
        assert -(1 << 63) <= h < (1 << 63)  # signed int64 carrier
        noisy = np.clip(
            px.astype(np.int16) + rng.integers(-2, 3, px.shape), 0, 255
        ).astype(np.uint8)
        other = rng.integers(0, 256, size=(40, 60, 3), dtype=np.uint8)
        ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
        assert ham(h, ahash64(noisy)) <= 6
        assert ham(h, ahash64(other)) > 12


class TestAudioDedup:
    def test_planted_clones_recovered_no_false_positives(
        self, ray_session, quiet_data_context
    ):
        from pdf_parser_ray.pipelines.multimodal import (
            IMAGE_CLONE_OFFSET,
            audio_dedup_pipeline,
        )

        df = audio_dedup_pipeline(300).to_pandas()
        real = df[df["media_id_a"] >= 0]
        got = set(
            zip(real["media_id_a"].astype(int), real["media_id_b"].astype(int))
        )
        planted = {(m, m + IMAGE_CLONE_OFFSET) for m in range(1, 300, 12)}
        assert got == planted
        assert len(real) == len(planted)

    def test_ehash_properties(self):
        import numpy as np

        from pdf_parser_ray.pipelines.multimodal import ehash64

        rng = np.random.default_rng(5)
        x = rng.integers(-20_000, 20_000, size=8_000).astype(np.int16)
        h = ehash64(x)
        assert ehash64(x) == h
        assert -(1 << 63) <= h < (1 << 63)
        ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
        noisy = np.clip(
            x.astype(np.int32) + rng.integers(-50, 51, x.shape), -32768, 32767
        ).astype(np.int16)
        assert ham(h, ehash64(noisy)) <= 6
        # gain invariance: half-volume signal hashes identically
        assert ehash64((x // 2).astype(np.int16)) == h or ham(
            h, ehash64((x // 2).astype(np.int16))
        ) <= 6
        other = rng.integers(-20_000, 20_000, size=8_000).astype(np.int16)
        assert ham(h, ehash64(other)) > 12


class TestImageResize:
    def test_nearest_matches_naive_loop(self):
        import numpy as np

        from pdf_parser_ray.pipelines.multimodal import resize_nearest

        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (37, 23, 3), dtype=np.uint8)
        got = resize_nearest(px, 16, 16)
        want = np.empty((16, 16, 3), np.uint8)
        for i in range(16):
            for j in range(16):
                si = min(int((i + 0.5) * 37 / 16), 36)
                sj = min(int((j + 0.5) * 23 / 16), 22)
                want[i, j] = px[si, sj]
        assert (got == want).all()

    def test_identity_at_target_size(self):
        import numpy as np

        from pdf_parser_ray.pipelines.multimodal import resize_nearest

        rng = np.random.default_rng(12)
        px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        assert (resize_nearest(px, 16, 16) == px).all()

    def test_pipeline_roundtrip_and_stats(self, ray_session, quiet_data_context):
        """Every image row yields a decodable 16x16 PNG thumbnail whose
        pixels equal the direct resize of the source; stats agree."""
        import numpy as np

        from pdf_parser_ray.pipelines.multimodal import (
            THUMB_SIZE, _luma, ahash64, decode_png, image_resize_pipeline,
            resize_nearest, synthesize_media,
        )

        out = image_resize_pipeline(60).to_pandas().set_index("media_id")
        src = synthesize_media(60)
        n_images = sum(1 for k in src.column("kind").to_pylist() if k == "image")
        assert len(out) == n_images > 0
        for mid, kind, payload in zip(
            src.column("media_id").to_pylist(),
            src.column("kind").to_pylist(),
            src.column("payload").to_pylist(),
        ):
            if kind != "image":
                continue
            th = resize_nearest(decode_png(payload), THUMB_SIZE, THUMB_SIZE)
            row = out.loc[mid]
            back = decode_png(row["thumb_png"])
            assert back.shape == (THUMB_SIZE, THUMB_SIZE, 3)
            assert (back == th).all()  # lossless codec roundtrip
            assert row["thumb_ahash"] == ahash64(th)
            assert row["mean_luma_milli"] == int(
                round(float(_luma(th).mean()) * 1000)
            )
        # thumbnails differ across images (no constant-output bug)
        assert out["thumb_ahash"].nunique() > n_images // 2
