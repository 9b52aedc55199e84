"""STS (MPEG-TS-style packetized) container: the demux stack (sync,
PID demultiplexing, continuity counters, adaptation stripping,
CRC-checked PAT→PMT→ES signalling, PES reassembly), the
keyframe-anchored sampled decode's GOP-bounded call count, and loud
failure on every transport-integrity rule."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from intellect_bi_spark.operators import multimodal as m

from .test_bdv import _expected_anchored_calls


def test_full_decode_matches_generator():
    for d in (0, 3, 7, 22, 101):
        w, h, frames = m.decode_sts_bdv(m._encode_sts_bytes(d))
        gw, gh, nf = m._sts_geom(d)
        assert (w, h, len(frames)) == (gw, gh, nf)
        for f, px in frames:
            assert np.array_equal(px, m._bdv_frame(d, f, w, h))


def test_sampled_decode_equals_filtered_full_decode():
    for d in (1, 6, 12):
        payload = m._encode_sts_bytes(d)
        _, _, full = m.decode_sts_bdv(payload)
        w, h, sampled = m.decode_sts_bdv_sampled(payload, m.SAMPLE_EVERY)
        keep = {f: px for f, px in full if f % m.SAMPLE_EVERY == 0}
        assert [f for f, _ in sampled] == sorted(keep)
        for f, px in sampled:
            assert np.array_equal(px, keep[f])


def test_sampled_decode_cost_is_gop_bounded():
    """The packet scan is linear in container bytes (no random-access
    index in a transport stream), but frame_decode — the expensive
    step — must run GOP-bounded per sampled frame, anchored on the PES
    keyframe flags."""
    for d in (0, 5, 13, 27):
        payload = m._encode_sts_bytes(d)
        _, _, nf = m._sts_geom(d)
        calls = []

        def counting(fb, w, h, prev, _calls=calls):
            _calls.append(0)
            return m.decode_bdv_frame(fb, w, h, prev)

        m.decode_sts_bdv_sampled(payload, m.SAMPLE_EVERY, counting)
        expected = _expected_anchored_calls(nf, m.SAMPLE_EVERY)
        assert len(calls) == len(expected), (d, len(calls), len(expected))
        n_sampled = len(range(0, nf, m.SAMPLE_EVERY))
        assert len(calls) <= n_sampled * m.BDV_GOP


def _video_pkt_index(b: bytes, doc_id: int, n: int = 0) -> int:
    """Byte offset of the n-th packet on the video PID."""
    _pmt, vid = m._sts_pids(doc_id)
    seen = 0
    for i in range(0, len(b), m._TS_PKT):
        pid = ((b[i + 1] & 0x1F) << 8) | b[i + 2]
        if pid == vid:
            if seen == n:
                return i
            seen += 1
    raise AssertionError("video packet not found")


def test_lost_sync_fails_loudly():
    b = bytearray(m._encode_sts_bytes(4))
    b[m._TS_PKT] = 0x48  # second packet's sync byte
    with pytest.raises(ValueError, match="lost sync"):
        m.decode_sts_bdv(bytes(b))


def test_continuity_break_fails_loudly():
    """Dropping a mid-stream video packet must be DETECTED by the
    continuity counters, never silently reassembled around."""
    b = m._encode_sts_bytes(4)
    i = _video_pkt_index(b, 4, n=1)
    with pytest.raises(ValueError, match="continuity"):
        m.decode_sts_bdv(b[:i] + b[i + m._TS_PKT :])


def test_psi_crc_corruption_fails_loudly():
    b = bytearray(m._encode_sts_bytes(4))
    # the PAT is the first packet; its short payload rides behind an
    # adaptation field: body = 4 (TS header) + 1 (af_len) + af_len,
    # then pointer(1) + table(1) + len(2) + section body
    af_len = b[4]
    body = 4 + 1 + af_len
    b[body + 4] ^= 0x01  # flip a section-body byte → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        m.decode_sts_bdv(bytes(b))


def test_pes_length_mismatch_fails_loudly():
    b = bytearray(m._encode_sts_bytes(4))
    i = _video_pkt_index(b, 4, n=0)
    # PES header begins at the packet body; len field at +4 (after
    # start code + stream id)
    hdr = 4  # afc=0x1 full-body first packet (frames exceed 184 bytes?)
    # locate the length field robustly: body begins after the 4-byte
    # TS header (adaptation only appears on final short packets)
    ln_at = i + hdr + 4
    (ln,) = struct.unpack(">H", bytes(b[ln_at : ln_at + 2]))
    b[ln_at : ln_at + 2] = struct.pack(">H", ln + 1)
    with pytest.raises(ValueError, match="length mismatch"):
        m.decode_sts_bdv(bytes(b))


def test_pat_pmt_referential_integrity():
    """A PMT PID nobody transmits must fail the PAT→PMT join, not
    produce an empty decode."""
    b = m._encode_sts_bytes(4)
    # rebuild a PAT naming a different PMT PID, CRC valid
    bad_pat = m._sts_section(0x00, struct.pack(">HH", 1, 0x1FF))
    pkts, _ = m._ts_packets(m._TS_PID_PAT, 0, bad_pat)
    assert len(pkts) == 1
    with pytest.raises(ValueError, match="no packets"):
        m.decode_sts_bdv(pkts[0] + b[m._TS_PKT :])


def test_adaptation_stuffing_and_packet_alignment():
    """Every fixture stream is whole packets; every PES unit's final
    packet carries adaptation stuffing exactly when the tail is short;
    truncating the stream mid-packet fails loudly."""
    for d in (2, 9):
        b = m._encode_sts_bytes(d)
        assert len(b) % m._TS_PKT == 0
        with pytest.raises(ValueError, match="whole number"):
            m.decode_sts_bdv(b[:-7])
