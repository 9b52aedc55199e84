"""ILT lapped-transform audio codec: exact integer invertibility of the
lifting network (the IntMDCT-class property), the cross-boundary lap
(TDAC) that distinguishes it from every block/sample codec tier, and
container validation."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from intellect_bi_spark.operators import multimodal as m


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=m._ILT_M * 2,
        max_size=m._ILT_M * 48,
    ).filter(lambda v: len(v) % m._ILT_M == 0)
)
def test_lifting_network_exactly_invertible(samples):
    s = np.asarray(samples, dtype=np.int64)
    assert np.array_equal(m.ilt_inverse(m.ilt_forward(s)), s)


def test_transform_actually_transforms_and_mixes():
    s = m._ilt_samples(5)
    c = m.ilt_forward(s)
    assert not np.array_equal(c, s)
    # at least half the positions move — it's a transform, not a copy
    assert int((c != s).sum()) > s.size // 2


def test_lap_property_one_coefficient_touches_two_blocks():
    """The defining MDCT-class property: coefficients mix samples ACROSS
    block boundaries, so perturbing one coefficient must perturb decoded
    samples in MORE than one 8-sample block (a blockwise codec like the
    in-block butterfly alone would confine it to one)."""
    s = m._ilt_samples(3)
    c = m.ilt_forward(s)
    # perturb well above the lifting shears' rounding granularity (the
    # TDAC angles are small, so a ±1 usually vanishes in floor(p·b+½))
    for pos in (m._ILT_M, m._ILT_M + 3, 5 * m._ILT_M + 7):
        c2 = c.copy()
        c2[pos] += 4096
        blocks = {
            int(i) // m._ILT_M
            for i in np.nonzero(m.ilt_inverse(c2) != s)[0]
        }
        assert len(blocks) >= 2, (pos, blocks)


def test_wav_container_roundtrip_all_docs():
    for d in range(16):
        rate, dec = m.decode_wav_ilt(m._encode_wav_ilt_bytes(d))
        assert rate == m._ilt_rate(d)
        assert np.array_equal(dec, m._ilt_samples(d))


def test_decoder_rejects_wrong_tag_and_bad_counts():
    payload = bytearray(m._encode_wav_ilt_bytes(2))
    at = payload.index(b"fmt ") + 8
    struct.pack_into("<H", payload, at, 0x0001)  # claim plain PCM
    with pytest.raises(ValueError, match="ILT"):
        m.decode_wav_ilt(bytes(payload))
    payload = bytearray(m._encode_wav_ilt_bytes(2))
    # shrink wSamplesPerBlock so the header disagrees with the data
    struct.pack_into("<H", payload, payload.index(b"fmt ") + 8 + 18, 64)
    with pytest.raises(ValueError, match="disagrees"):
        m.decode_wav_ilt(bytes(payload))
    with pytest.raises(ValueError, match="RIFF"):
        m.decode_wav_ilt(b"garbage")


def test_non_block_multiple_rejected():
    with pytest.raises(ValueError, match="whole number of blocks"):
        m.ilt_forward(np.arange(13, dtype=np.int64))
