"""Pure-numpy BMP/WAV codecs (functions/media_codecs.py) + the real
decode operators over mapInPandas (operators/multimodal.py).

The decode path's strongest check is the driver oracle (mm_image_decode
/ mm_audio_decode hash against closed-form DuckDB sums); here:
byte-level roundtrips incl. layout edge cases (row padding, bottom-up
vs top-down, odd sample counts, chunk alignment), loud rejection of
unsupported variants, resize geometry, and the Spark kernels end-to-end
on a small frame.
"""

import struct

import numpy as np
import pytest

from dint_spark.functions import media_codecs as mc


class TestBmp:
    def test_roundtrip_shapes(self):
        rng = np.random.default_rng(21)
        for h, w in ((1, 1), (5, 3), (11, 13), (7, 6), (4, 17), (31, 2)):
            px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            assert np.array_equal(mc.bmp_decode(mc.bmp_encode(px)), px)

    def test_row_padding(self):
        # w=3 -> 9 payload bytes padded to 12 per row; decoded size must
        # use the padded stride, not payload*h
        px = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
        buf = mc.bmp_encode(px)
        img_size = struct.unpack_from("<I", buf, 34)[0]
        assert img_size == 12 * 3
        assert np.array_equal(mc.bmp_decode(buf), px)

    def test_top_down_layout(self):
        px = np.random.default_rng(22).integers(0, 256, (4, 5, 3)).astype(np.uint8)
        buf = bytearray(mc.bmp_encode(px))
        h, w = px.shape[:2]
        row_bytes = (w * 3 + 3) & ~3
        rows = np.zeros((h, row_bytes), np.uint8)
        rows[:, : w * 3] = px[:, :, ::-1].reshape(h, w * 3)
        struct.pack_into("<i", buf, 22, -h)  # negative height = top-down
        td = bytes(buf[:54]) + rows.tobytes()
        assert np.array_equal(mc.bmp_decode(td), px)

    def test_rejects_loudly(self):
        with pytest.raises(ValueError, match="not a BMP"):
            mc.bmp_decode(b"PNG....")
        px = np.zeros((2, 2, 3), np.uint8)
        buf = bytearray(mc.bmp_encode(px))
        struct.pack_into("<H", buf, 28, 8)  # bpp=8
        with pytest.raises(ValueError, match="only 24-bit"):
            mc.bmp_decode(bytes(buf))
        with pytest.raises(ValueError, match="truncated"):
            mc.bmp_decode(mc.bmp_encode(px)[:-4])

    def test_resize_nearest(self):
        px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        up = mc.resize_nearest(px, 8, 12)
        assert up.shape == (8, 12, 3)
        assert np.array_equal(up[::2, ::2], px)  # exact 2x: originals kept
        down = mc.resize_nearest(px, 2, 3)
        assert down.shape == (2, 3, 3)


class TestWav:
    def test_roundtrip(self):
        rng = np.random.default_rng(23)
        for n in (1, 2, 777, 4096):
            s = rng.integers(-32768, 32768, n).astype(np.int16)
            got, rate = mc.wav_decode(mc.wav_encode(s, 12000))
            assert rate == 12000 and np.array_equal(got, s)

    def test_chunk_walk_skips_extra_chunks(self):
        # LIST chunk before fmt/data (common in real files); odd-size
        # chunk exercises word alignment
        s = np.array([1, -2, 3], dtype=np.int16)
        buf = mc.wav_encode(s, 8000)
        extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
        patched = buf[:12] + extra + buf[12:]
        patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
        got, rate = mc.wav_decode(patched)
        assert rate == 8000 and np.array_equal(got, s)

    def test_rejects_loudly(self):
        with pytest.raises(ValueError, match="not a WAV"):
            mc.wav_decode(b"OggS....")
        buf = bytearray(mc.wav_encode(np.array([0], np.int16)))
        struct.pack_into("<H", buf, 20, 7)  # mu-law format tag
        with pytest.raises(ValueError, match="only PCM"):
            mc.wav_decode(bytes(buf))


class TestSparkDecodeOps:
    def test_image_decode_roundtrip(self, spark, tiny_docs):
        from dint_spark.operators.multimodal import (
            decode_image, image_stats, synth_media_bmp,
        )

        media = synth_media_bmp(tiny_docs)
        dec = {r["doc_id"]: r for r in decode_image(media).collect()}
        for r in image_stats(media).collect():
            d = r["doc_id"]
            assert r["width"] == d % 13 + 4 and r["height"] == d % 11 + 4
            px = np.frombuffer(dec[d]["pixels"], np.uint8).reshape(
                dec[d]["height"], dec[d]["width"], 3
            ).astype(np.int64)
            s = px.sum(axis=(0, 1))
            assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(int(x) for x in s)
            # and the closed form itself
            rr = np.arange(r["height"])[:, None, None]
            cc = np.arange(r["width"])[None, :, None]
            ch = np.arange(3)[None, None, :]
            want = ((d * 31 + rr * 7 + cc * 3 + ch * 11) % 256).astype(np.uint8)
            assert np.array_equal(px.astype(np.uint8), want)

    def test_audio_decode(self, spark, tiny_docs):
        from dint_spark.operators.multimodal import audio_stats, synth_media_wav

        for r in audio_stats(synth_media_wav(tiny_docs)).collect():
            d = r["doc_id"]
            n = d % 500 + 100
            i = np.arange(n, dtype=np.int64)
            s = (d * 17 + i * 5) % 4096 - 2048
            assert r["n_samples"] == n
            assert r["sample_rate"] == 8000 + (d % 3) * 4000
            assert r["sum_samples"] == int(s.sum())
            assert r["sum_abs"] == int(np.abs(s).sum())

    def test_image_resize_stats(self, spark, tiny_docs):
        from dint_spark.operators.multimodal import (
            resize_image_stats, synth_media_bmp,
        )

        for r in resize_image_stats(synth_media_bmp(tiny_docs)).collect():
            d = r["doc_id"]
            w, h = d % 13 + 4, d % 11 + 4
            rr = np.arange(h)[:, None, None]
            cc = np.arange(w)[None, :, None]
            ch = np.arange(3)[None, None, :]
            px = ((d * 31 + rr * 7 + cc * 3 + ch * 11) % 256).astype(np.uint8)
            s = mc.resize_nearest(px, 8, 8).astype(np.int64).sum(axis=(0, 1))
            assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(int(x) for x in s)

    def test_non_bmp_raises_not_implemented(self, spark, tiny_docs):
        from dint_spark.operators.multimodal import decode_image, synth_media

        with pytest.raises(Exception, match="codec library"):
            decode_image(synth_media(tiny_docs)).collect()

class TestWavTruncation:
    def test_truncated_data_chunk_raises(self):
        """r5 ADVICE (low): a data chunk whose declared size exceeds the
        available bytes yielded a silently short sample array."""
        buf = mc.wav_encode(np.arange(64, dtype=np.int16))
        with pytest.raises(ValueError, match="truncated WAV"):
            mc.wav_decode(buf[:-10])

    def test_intact_roundtrip_still_ok(self):
        s = np.arange(-5, 5, dtype=np.int16)
        out, rate = mc.wav_decode(mc.wav_encode(s, rate=8000))
        assert rate == 8000 and out.tolist() == s.tolist()
