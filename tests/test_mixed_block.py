"""F12 mixed_block + B13 dec_time_prediction.

Covers: roundtrips across distributions, the partial-block
interpolative rule (no type byte), candidate validity filtering
(Simple16's 28-bit ceiling, interpolative's u32 block-sum domain), the
(space, time) selection order, predictor line-format serialization
(mixed_block.hpp:224-249 load_predictors), values_statistics vs a
scalar re-implementation (dec_time_prediction.hpp:107-140), the lstsq
trainer recovering planted weights, and the transformation path through
build.blocks.transcode_block_index (mixed indexes are created by
transformation, mixed_block.hpp:34).
"""

import numpy as np
import pytest

from dint_spark.codecs import dec_time, mixed_block as mb
from dint_spark.codecs.dec_time import FEATURES, Predictor


def rt(v):
    v = np.asarray(v, dtype=np.uint32)
    out = mb.decode_block(mb.encode_block(v), v.size)
    assert np.array_equal(out.astype(np.uint64), v.astype(np.uint64))
    return out


class TestRoundtrip:
    def test_distributions(self):
        rng = np.random.default_rng(11)
        for b in (1, 4, 8, 13, 20, 27, 28, 31):
            rt(rng.integers(0, 1 << b, mb.BLOCK_SIZE))
        rt(np.zeros(mb.BLOCK_SIZE, dtype=np.uint32))
        rt(np.full(mb.BLOCK_SIZE, 7, dtype=np.uint32))
        rt(np.full(mb.BLOCK_SIZE, (1 << 32) - 1, dtype=np.uint32))

    def test_partial_blocks(self):
        rng = np.random.default_rng(12)
        for n in (1, 2, 37, 255):
            rt(rng.integers(0, 1000, n))
        rt(np.array([], dtype=np.uint32))

    def test_partial_has_no_type_byte(self):
        # partial blocks ARE the interpolative encoding, byte for byte
        # (mixed_block.hpp:43-49: no type byte, always interpolative)
        from dint_spark.codecs import interpolative

        v = np.arange(100, dtype=np.uint32)
        assert mb.encode_block(v) == interpolative.encode(v)

    def test_full_block_type_byte_dispatch(self):
        rng = np.random.default_rng(13)
        v = rng.integers(0, 1 << 20, mb.BLOCK_SIZE).astype(np.uint32)
        buf = mb.encode_block(v)
        assert buf[0] in mb.BLOCK_TYPES
        with pytest.raises(ValueError):
            mb.decode_block(bytes([99]) + buf[1:], mb.BLOCK_SIZE)

    def test_oversized_block_rejected(self):
        with pytest.raises(ValueError):
            mb.encode_block(np.zeros(mb.BLOCK_SIZE + 1, dtype=np.uint32))


class TestSelection:
    def test_packed_invalid_over_28_bits(self):
        rng = np.random.default_rng(14)
        v = rng.integers(1 << 29, 1 << 31, mb.BLOCK_SIZE).astype(np.uint32)
        types = [p[2] for p in mb.compute_space_time(v)]
        assert mb.TYPE_PACKED not in types  # Simple16 ceiling
        # interpolative's u32 block-sum domain also rules it out here
        assert types == [mb.TYPE_VARINT]

    def test_no_candidate_raises(self, monkeypatch):
        v = np.zeros(mb.BLOCK_SIZE, dtype=np.uint32)
        monkeypatch.setattr(
            mb, "compute_space_time", lambda *a, **k: []
        )
        with pytest.raises(ValueError, match="no codec candidate"):
            mb.encode_block(v)

    def test_space_then_time_order(self):
        # default pick = min encoded size (space_time_point::operator<)
        rng = np.random.default_rng(15)
        v = rng.integers(0, 4, mb.BLOCK_SIZE).astype(np.uint32)
        pts = mb.compute_space_time(v)
        spaces = [p[1] for p in pts]
        assert spaces == sorted(spaces)
        assert len(mb.encode_block(v)) - 1 == spaces[0]

    def test_time_weight_tilts_to_faster(self):
        # huge lambda -> predicted-time argmin wins regardless of space;
        # varint is the fastest model (the ref's decode fast path)
        rng = np.random.default_rng(16)
        v = rng.integers(0, 1 << 10, mb.BLOCK_SIZE).astype(np.uint32)
        buf = mb.encode_block(v, time_weight=1e12)
        pts = mb.compute_space_time(v)
        fastest = min(pts, key=lambda p: p[0])[2]
        assert buf[0] == fastest

    def test_partial_never_predicts_time(self):
        pts = mb.compute_space_time(np.arange(10, dtype=np.uint32))
        assert [p[2] for p in pts] == [mb.TYPE_INTERP]
        assert pts[0][0] == 0.0  # mixed_block.hpp:141-143


class TestValuesStatistics:
    def scalar_ref(self, vals):
        import math

        f = dict.fromkeys(FEATURES, 0.0)
        f["n"] = len(vals)
        if not len(vals):
            return f
        groups = {}
        for x in vals.tolist():
            groups[x] = groups.get(x, 0) + 1
        n = float(len(vals))
        for val, g in groups.items():
            f["entropy"] += g * math.log2(n / g)
            f["sum_of_logs"] += g * math.log2(val + 1)
            if val != 0:
                f["nonzeros"] += g
        f["max_b"] = int(max(groups)).bit_length()
        return f

    def test_matches_scalar(self):
        rng = np.random.default_rng(17)
        for v in (
            rng.integers(0, 50, 256).astype(np.uint32),
            np.zeros(64, dtype=np.uint32),
            np.array([], dtype=np.uint32),
            np.array([0, 0, 1, (1 << 31)], dtype=np.uint32),
        ):
            got = dec_time.values_statistics(v)
            want = self.scalar_ref(v)
            for i, name in enumerate(FEATURES):
                assert got[i] == pytest.approx(want[name]), name


class TestPredictor:
    def test_line_roundtrip(self, tmp_path):
        p = Predictor({"size": 1.5, "max_b": -0.25}, bias=3.75)
        t, q = Predictor.from_line(p.to_line(2))
        assert t == 2 and q.bias == 3.75
        assert np.array_equal(p.w, q.w)
        path = str(tmp_path / "preds.tsv")
        dec_time.save_predictors(path, {0: p, 1: Predictor(bias=1.0)})
        back = dec_time.load_predictors(path)
        assert set(back) == {0, 1}
        assert np.array_equal(back[0].w, p.w)

    def test_fit_recovers_planted_weights(self):
        rng = np.random.default_rng(18)
        fvs = rng.random((200, len(FEATURES))) * 100
        true = Predictor({"size": 2.0, "nonzeros": 0.5}, bias=10.0)
        times = true.predict_many(fvs)
        p = dec_time.fit(fvs, times)
        assert p.bias == pytest.approx(10.0, abs=1e-3)
        assert p.w[FEATURES.index("size")] == pytest.approx(2.0, abs=1e-4)
        assert p.w[FEATURES.index("nonzeros")] == pytest.approx(0.5, abs=1e-4)
        # dropped columns stay zero (dec_time_regression.py to_drop)
        assert p.w[FEATURES.index("n")] == 0.0
        assert p.w[FEATURES.index("entropy")] == 0.0

    def test_default_predictors_order(self):
        # whatever the source (trained TSV or fallback): varint must be
        # the fastest full-block model — the premise of the ref's decode
        # fast path (mixed_block.hpp:205 DS2I_LIKELY(varint))
        preds = mb.default_predictors()
        fv = dec_time.values_statistics(
            np.random.default_rng(0).integers(0, 256, 256).astype(np.uint32)
        )
        fv[dec_time._FIDX["size"]] = 300.0
        assert preds[mb.TYPE_VARINT](fv) < preds[mb.TYPE_INTERP](fv)


class TestTranscode:
    def test_transcode_to_mixed(self, random_postings):
        # the reference creates mixed indexes only by transformation
        # (mixed_block.hpp:34, block_transformer:152-195): vbyte -> mixed
        from dint_spark.build.blocks import (
            build_block_index,
            decode_block_index,
            transcode_block_index,
        )
        from dint_spark.codecs.registry import get_codec

        src = get_codec("block_vbyte")
        dst = get_codec("mixed_block")
        bidx = build_block_index(random_postings, src)
        mixed = transcode_block_index(bidx, src, dst)
        a = decode_block_index(bidx, src)
        b = decode_block_index(mixed, dst)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
