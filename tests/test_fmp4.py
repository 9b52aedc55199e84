"""FV4 (fragmented ISO-BMFF subset) container: the incremental
fragment walk (moof/mfhd/traf/tfhd/tfdt/trun), the per-fragment sample
map accumulation, the fragment-anchored sparse decode's GOP-bounded
call count (shared roll with the monolithic MB4 path), and loud
failure on every cross-fragment consistency rule."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intellect_bi_spark.operators import multimodal as m

from .test_bdv import _expected_anchored_calls


def test_full_decode_matches_generator():
    for d in (0, 3, 7, 22, 101):
        w, h, frames = m.decode_fmp4_bdv(m._encode_fmp4_bytes(d))
        gw, gh, nf = m._fmp4_geom(d)
        assert (w, h, len(frames)) == (gw, gh, nf)
        for f, px in frames:
            assert np.array_equal(px, m._bdv_frame(d, f, w, h))


def test_fragment_structure_is_one_moof_per_gop():
    for d in (0, 4, 9, 17):
        b = m._encode_fmp4_bytes(d)
        _w, _h, nf = m._fmp4_geom(d)
        n_moof = sum(
            1 for t, _, _ in m._mb4_boxes(b, 0, len(b)) if t == b"moof"
        )
        n_mdat = sum(
            1 for t, _, _ in m._mb4_boxes(b, 0, len(b)) if t == b"mdat"
        )
        want = (nf + m.BDV_GOP - 1) // m.BDV_GOP
        assert n_moof == n_mdat == want
        # the accumulated sync set = the fragment openers = GOP starts
        _w2, _h2, offs, sizes, syncs = m._fmp4_scan(b)
        assert len(offs) == len(sizes) == nf
        assert syncs == [f for f in range(nf) if f % m.BDV_GOP == 0]


def test_sampled_decode_equals_filtered_full_decode():
    for d in (1, 6, 12):
        payload = m._encode_fmp4_bytes(d)
        _, _, full = m.decode_fmp4_bdv(payload)
        w, h, sampled = m.decode_fmp4_bdv_sampled(payload, m.SAMPLE_EVERY)
        keep = {f: px for f, px in full if f % m.SAMPLE_EVERY == 0}
        assert [f for f, _ in sampled] == sorted(keep)
        for f, px in sampled:
            assert np.array_equal(px, keep[f])


def test_sampled_decode_cost_is_gop_bounded():
    """The fragment map must buy the same sparse-access property the
    monolithic sample tables do: per sampled frame, the decoder touches
    at most one GOP of samples."""
    for d in (0, 5, 13, 27):
        payload = m._encode_fmp4_bytes(d)
        _, _, nf = m._fmp4_geom(d)
        calls = []

        def counting(fb, w, h, prev, _calls=calls):
            _calls.append(len(_calls))
            return m.decode_bdv_frame(fb, w, h, prev)

        m.decode_fmp4_bdv_sampled(payload, m.SAMPLE_EVERY, counting)
        expected = _expected_anchored_calls(nf, m.SAMPLE_EVERY)
        assert len(calls) == len(expected), (d, len(calls), len(expected))
        n_sampled = len(range(0, nf, m.SAMPLE_EVERY))
        assert len(calls) <= n_sampled * m.BDV_GOP


def _box_at(b: bytes, btype: bytes, pos: int = 0, end: int | None = None):
    """(header_pos, size) of the first ``btype`` box, descending into
    the containers on the moov AND fragment paths."""
    end = len(b) if end is None else end
    while pos < end:
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        t = b[pos + 4 : pos + 8]
        if t == btype:
            return pos, size
        if t in (b"moov", b"trak", b"mdia", b"minf", b"stbl",
                 b"mvex", b"moof", b"traf"):
            found = _box_at(b, btype, pos + 8, pos + size)
            if found:
                return found
        pos += size
    return None


def test_noncontiguous_mfhd_sequence_fails_loudly():
    b = bytearray(m._encode_fmp4_bytes(4))
    pos, _size = _box_at(bytes(b), b"mfhd")
    seq_at = pos + 12  # 8 header + 4 version/flags
    b[seq_at : seq_at + 4] = struct.pack(">I", 9)
    with pytest.raises(ValueError, match="sequence"):
        m.decode_fmp4_bdv(bytes(b))


def test_tfdt_discontinuity_fails_loudly():
    b = bytes(m._encode_fmp4_bytes(4))
    # corrupt the SECOND fragment's tfdt (the first is trivially 0)
    first, size = _box_at(b, b"moof")
    pos2, _ = _box_at(b, b"tfdt", first + size)
    bb = bytearray(b)
    t_at = pos2 + 12  # 8 header + 4 version/flags → 64-bit time
    bb[t_at : t_at + 8] = struct.pack(">Q", 99)
    with pytest.raises(ValueError, match="continuity"):
        m.decode_fmp4_bdv(bytes(bb))


def test_trun_offset_missing_mdat_fails_loudly():
    b = bytearray(m._encode_fmp4_bytes(4))
    pos, _size = _box_at(bytes(b), b"trun")
    off_at = pos + 16  # 8 header + 4 v/f + 4 sample_count
    (old,) = struct.unpack(">i", b[off_at : off_at + 4])
    b[off_at : off_at + 4] = struct.pack(">i", old + 3)
    with pytest.raises(ValueError, match="data offset"):
        m.decode_fmp4_bdv(bytes(b))


def test_moov_resident_samples_fail_loudly():
    """A fragmented file whose movie box ALSO declares samples is
    structurally ambiguous — the scan must refuse it."""
    b = bytearray(m._encode_fmp4_bytes(4))
    pos, _size = _box_at(bytes(b), b"stsz")
    n_at = pos + 16  # 8 header + 4 v/f + 4 fixed-size field
    b[n_at : n_at + 4] = struct.pack(">I", 2)
    with pytest.raises(ValueError, match="moov-resident"):
        m.decode_fmp4_bdv(bytes(b))


def test_nonsync_fragment_opener_fails_loudly():
    b = bytearray(m._encode_fmp4_bytes(4))
    pos, _size = _box_at(bytes(b), b"trun")
    flags_at = pos + 20  # 8 header + 4 v/f + 4 count + 4 data_offset
    b[flags_at : flags_at + 4] = struct.pack(">I", m._FMP4_NONSYNC)
    with pytest.raises(ValueError, match="sync sample"):
        m.decode_fmp4_bdv(bytes(b))


def test_wrong_brand_fails_loudly():
    b = bytearray(m._encode_fmp4_bytes(4))
    i = bytes(b).find(m._FMP4_BRAND)
    assert i > 0
    b[i : i + 4] = b"xxxx"
    with pytest.raises(ValueError, match="brand"):
        m.decode_fmp4_bdv(bytes(b))


def test_mb4_sampled_decode_unchanged_by_roll_extraction():
    """The _anchored_sampled_roll extraction must leave the certified
    MB4 sampled decode bit-identical (same frames, same call count)."""
    for d in (2, 8):
        payload = m._encode_mb4_bytes(d)
        calls = []

        def counting(fb, w, h, prev, _calls=calls):
            _calls.append(0)
            return m.decode_bdv_frame(fb, w, h, prev)

        w, h, frames = m.decode_mb4_bdv_sampled(
            payload, m.SAMPLE_EVERY, counting
        )
        _, _, nf = m._mb4_geom(d)
        assert len(calls) == len(_expected_anchored_calls(nf, m.SAMPLE_EVERY))
        for f, px in frames:
            assert np.array_equal(px, m._bdv_frame(d, f, w, h))
