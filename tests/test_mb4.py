"""MB4 (ISO-BMFF-subset) container: the box-tree walk, the four-table
sample access (stsc→stco→stsz→mdat), the stss-anchored sparse decode's
GOP-bounded call count (mirroring the AVI-BDV cost-bound unit), and
loud failure on cross-table inconsistencies."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intellect_bi_spark.operators import multimodal as m

from .test_bdv import _expected_anchored_calls


def test_full_decode_matches_generator():
    for d in (0, 3, 7, 22, 101):
        w, h, frames = m.decode_mb4_bdv(m._encode_mb4_bytes(d))
        gw, gh, nf = m._mb4_geom(d)
        assert (w, h, len(frames)) == (gw, gh, nf)
        for f, px in frames:
            assert np.array_equal(px, m._bdv_frame(d, f, w, h))


def test_sampled_decode_equals_filtered_full_decode():
    for d in (1, 6, 12):
        payload = m._encode_mb4_bytes(d)
        _, _, full = m.decode_mb4_bdv(payload)
        w, h, sampled = m.decode_mb4_bdv_sampled(payload, m.SAMPLE_EVERY)
        keep = {f: px for f, px in full if f % m.SAMPLE_EVERY == 0}
        assert [f for f, _ in sampled] == sorted(keep)
        for f, px in sampled:
            assert np.array_equal(px, keep[f])


def test_sampled_decode_cost_is_gop_bounded():
    """The whole point of the sample tables: per sampled frame, the
    decoder touches at most one GOP of samples — same reference walk
    as the AVI keyframe-anchored unit (test_bdv)."""
    for d in (0, 5, 13, 27):
        payload = m._encode_mb4_bytes(d)
        _, _, nf = m._mb4_geom(d)
        calls = []

        def counting(fb, w, h, prev, _calls=calls):
            _calls.append(len(_calls))
            return m.decode_bdv_frame(fb, w, h, prev)

        m.decode_mb4_bdv_sampled(payload, m.SAMPLE_EVERY, counting)
        expected = _expected_anchored_calls(nf, m.SAMPLE_EVERY)
        assert len(calls) == len(expected), (d, len(calls), len(expected))
        n_sampled = len(range(0, nf, m.SAMPLE_EVERY))
        assert len(calls) <= n_sampled * m.BDV_GOP


def _find_box(b: bytes, btype: bytes, pos: int = 0, end: int | None = None):
    end = len(b) if end is None else end
    while pos < end:
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        t = b[pos + 4 : pos + 8]
        if t == btype:
            return pos, size
        if t in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            found = _find_box(b, btype, pos + 8, pos + size)
            if found:
                return found
        pos += size
    return None


def test_corrupt_stco_offset_fails_loudly():
    b = bytearray(m._encode_mb4_bytes(4))
    pos, _size = _find_box(bytes(b), b"stco")
    # first chunk offset lives 8 (header) + 4 (v/f) + 4 (count) in
    off_at = pos + 16
    (old,) = struct.unpack(">I", b[off_at : off_at + 4])
    b[off_at : off_at + 4] = struct.pack(">I", len(b) + 100)
    with pytest.raises(ValueError, match="outside mdat"):
        m.decode_mb4_bdv(bytes(b))
    # a subtler corruption: point the chunk INSIDE mdat but at the
    # wrong sample — the BDV frame parser's structural checks fire
    b[off_at : off_at + 4] = struct.pack(">I", old + 1)
    with pytest.raises(ValueError):
        m.decode_mb4_bdv(bytes(b))


def test_sample_count_mismatch_fails_loudly():
    b = bytearray(m._encode_mb4_bytes(4))
    pos, _size = _find_box(bytes(b), b"stsz")
    cnt_at = pos + 16  # 8 header + 4 v/f + 4 fixed-size field
    (n,) = struct.unpack(">I", b[cnt_at : cnt_at + 4])
    b[cnt_at : cnt_at + 4] = struct.pack(">I", n + 1)
    with pytest.raises(ValueError):
        m.decode_mb4_bdv(bytes(b))


def test_tkhd_stsd_dim_disagreement_fails_loudly():
    b = bytearray(m._encode_mb4_bytes(4))
    pos, size = _find_box(bytes(b), b"tkhd")
    # width is the second-to-last 4-byte field of the tkhd payload
    w_at = pos + size - 8
    (w16,) = struct.unpack(">I", b[w_at : w_at + 4])
    b[w_at : w_at + 4] = struct.pack(">I", w16 + (1 << 16))
    with pytest.raises(ValueError, match="tkhd dims"):
        m.decode_mb4_bdv(bytes(b))


def test_missing_sync_anchor_fails_loudly():
    b = bytearray(m._encode_mb4_bytes(4))
    pos, _size = _find_box(bytes(b), b"stss")
    first_at = pos + 12  # 8 header + 4 v/f (count) → +4 = first entry
    (first,) = struct.unpack(">I", b[first_at + 4 : first_at + 8])
    assert first == 1
    b[first_at + 4 : first_at + 8] = struct.pack(">I", 2)
    with pytest.raises(ValueError, match="sync sample"):
        m.decode_mb4_bdv_sampled(bytes(b), m.SAMPLE_EVERY)


def test_wrong_brand_fails_loudly():
    b = bytearray(m._encode_mb4_bytes(4))
    assert bytes(b).find(m._MB4_BRAND) > 0
    i = bytes(b).find(m._MB4_BRAND)
    b[i : i + 4] = b"xxxx"
    with pytest.raises(ValueError, match="brand"):
        m.decode_mb4_bdv(bytes(b))
