"""BDV inter-frame codec: I/P reconstruction, the keyframe-anchored
sparse decode and its GOP-bounded call count (the seek bound the idx1
AVIIF_KEYFRAME flags exist for), the index-less fallback's honest
decode-everything cost, and loud failure on corrupt keyframe maps."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intellect_bi_spark.operators import multimodal as m

from .test_mjpeg import _to_absolute_idx1


def _expected_anchored_calls(nf: int, sample_every: int) -> list[int]:
    """Reference walk: for each sampled ordinal, the decoder starts at
    the nearest preceding keyframe unless the running reconstruction is
    already closer; never decodes a frame twice."""
    calls, pos = [], -1
    for f in range(0, nf, sample_every):
        anchor = (f // m.BDV_GOP) * m.BDV_GOP
        start = anchor if (pos < 0 or anchor > pos) else pos + 1
        calls.extend(range(start, f + 1))
        pos = f
    return calls


def test_full_decode_matches_generator():
    for d in range(12):
        w, h, nf = m._bdv_geom(d)
        ww, hh, frames = m.decode_avi_bdv(m._encode_avi_bdv_bytes(d))
        assert (ww, hh, len(frames)) == (w, h, nf)
        for f, px in frames:
            assert np.array_equal(px, m._bdv_frame(d, f, w, h)), (d, f)


def test_sampled_decode_equals_filtered_full_decode():
    for d in range(12):
        payload = m._encode_avi_bdv_bytes(d)
        w, h, full = m.decode_avi_bdv(payload)
        sw, sh, sampled = m.decode_avi_bdv_sampled(payload, m.SAMPLE_EVERY)
        assert (sw, sh) == (w, h)
        want = [(f, px) for f, px in full if f % m.SAMPLE_EVERY == 0]
        assert [f for f, _ in sampled] == [f for f, _ in want]
        for (_, a), (_, b) in zip(sampled, want):
            assert np.array_equal(a, b)


def test_sampled_decode_is_keyframe_anchored_not_full():
    """The seek bound: per sampled P-frame the decoder rolls forward
    from its GOP's I-frame — never from the start of the stream, never
    the whole stream.  doc 4 has nf=9: sampled {0,4,8} anchor at
    {0,3,6}, so exactly [0,3,4,6,7,8] decode (6 of 9 frames)."""
    for d in (4, 8, 3):
        w, h, nf = m._bdv_geom(d)
        payload = m._encode_avi_bdv_bytes(d)
        seen: list[int] = []

        def counting(fb, fw, fh, prev):
            seen.append(len(seen))
            return m.decode_bdv_frame(fb, fw, fh, prev)

        _, _, frames = m.decode_avi_bdv_sampled(
            payload, m.SAMPLE_EVERY, frame_decode=counting
        )
        expected = _expected_anchored_calls(nf, m.SAMPLE_EVERY)
        assert len(seen) == len(expected), (d, len(seen), expected)
        # and the bound itself: cost per sampled frame ≤ GOP length
        n_sampled = len(range(0, nf, m.SAMPLE_EVERY))
        assert len(seen) <= n_sampled * m.BDV_GOP
        # outputs still exact
        for f, px in frames:
            assert np.array_equal(px, m._bdv_frame(d, f, w, h))


def test_copy_and_delta_block_paths_both_exercised():
    """Phase-1 P-frames are pure pan → every block COPY (payload is
    exactly tag+mv+one flag byte per block); phase-2 carry a constant
    nonzero residual → every block DELTA (flag + 48 residual bytes)."""
    d = 1  # residual r(d=1, g=0) = 5*1 + 7 = 12 ≠ 0
    w, h, nf = m._bdv_geom(d)
    n_blk = (w // m._BDV_BLK) * (h // m._BDV_BLK)
    fr = [m._bdv_frame(d, f, w, h) for f in range(nf)]
    p1 = m._encode_bdv_frame_bytes(fr[1], fr[0], w, h, *m._bdv_motion(d, 0))
    assert len(p1) == 3 + n_blk  # all COPY
    p2 = m._encode_bdv_frame_bytes(fr[2], fr[1], w, h, 0, 0)
    assert len(p2) == 3 + n_blk * (1 + m._BDV_BLK * m._BDV_BLK * 3)


def test_p_frame_without_reference_fails_loudly():
    d = 2
    w, h, _ = m._bdv_geom(d)
    fr0 = m._bdv_frame(d, 0, w, h)
    fr1 = m._bdv_frame(d, 1, w, h)
    pbytes = m._encode_bdv_frame_bytes(fr1, fr0, w, h, *m._bdv_motion(d, 0))
    with pytest.raises(ValueError, match="without a reference"):
        m.decode_bdv_frame(pbytes, w, h, None)


def test_false_keyframe_flag_fails_loudly():
    """Marking a P-frame as a keyframe would make the sampled decode
    start reconstruction at it — that must fail (P without reference),
    never silently decode garbage."""
    payload = bytearray(m._encode_avi_bdv_bytes(4))  # nf=9, samples f=4
    at = payload.rindex(b"idx1")
    # entry 4's flags live 4 bytes into its 16-byte record
    struct.pack_into("<I", payload, at + 8 + 16 * 4 + 4, 0x10)
    with pytest.raises(ValueError, match="without a reference"):
        m.decode_avi_bdv_sampled(bytes(payload), m.SAMPLE_EVERY)


def test_missing_keyframe_flag_still_exact():
    """Clearing a REAL keyframe's flag degrades cost (anchor moves one
    GOP earlier), never correctness."""
    d = 4
    w, h, nf = m._bdv_geom(d)
    payload = bytearray(m._encode_avi_bdv_bytes(d))
    at = payload.rindex(b"idx1")
    struct.pack_into("<I", payload, at + 8 + 16 * 3 + 4, 0x00)  # frame 3
    _, _, frames = m.decode_avi_bdv_sampled(bytes(payload), m.SAMPLE_EVERY)
    for f, px in frames:
        assert np.array_equal(px, m._bdv_frame(d, f, w, h))


def test_fallback_without_idx1_decodes_prefix_only():
    """Index-less inter-coded video has no cheap seek: the fallback
    must decode every frame up to the LAST sampled ordinal (and none
    after), still bit-exact."""
    d = 6  # nf = 5 + 1 = 6 -> last sample 4: decodes 0..4, skips 5
    w, h, nf = m._bdv_geom(d)
    payload = m._encode_avi_bdv_bytes(d)
    at = payload.rindex(b"idx1")
    stripped = payload[:at]
    stripped = (
        stripped[:4]
        + struct.pack("<I", len(stripped) - 8)
        + stripped[8:]
    )
    calls = []

    def counting(fb, fw, fh, prev):
        calls.append(1)
        return m.decode_bdv_frame(fb, fw, fh, prev)

    _, _, frames = m.decode_avi_bdv_sampled(
        stripped, m.SAMPLE_EVERY, frame_decode=counting
    )
    last = ((nf - 1) // m.SAMPLE_EVERY) * m.SAMPLE_EVERY
    assert len(calls) == last + 1
    want = [f for f in range(0, nf, m.SAMPLE_EVERY)]
    assert [f for f, _ in frames] == want
    for f, px in frames:
        assert np.array_equal(px, m._bdv_frame(d, f, w, h))


def test_absolute_idx1_offsets_accepted():
    """The shared _idx1_base probe covers BDV exactly as it covers
    MJPEG (ADVICE r10): absolute-offset indices decode identically."""
    for d in (2, 7):
        rel = m._encode_avi_bdv_bytes(d)
        alt = _to_absolute_idx1(rel)
        assert alt != rel
        _, _, a = m.decode_avi_bdv_sampled(alt, m.SAMPLE_EVERY)
        _, _, b = m.decode_avi_bdv_sampled(rel, m.SAMPLE_EVERY)
        assert [f for f, _ in a] == [f for f, _ in b]
        for (_, x), (_, y) in zip(a, b):
            assert np.array_equal(x, y)
