"""Per-row parity for the internal full-row relations whose REGISTRY faces
were converted to aggregate checksums in round 2 (driver-budget fix).

The registry queries verify every row via exact integer/modular checksums;
these tests keep the stronger row-level assertion locally so a value-level
regression in any producer is still caught at sf0.001.
"""

from __future__ import annotations

import pytest

from intellect_bi_spark.operators import dedup, multimodal

from .parity import assert_parity


@pytest.mark.parametrize(
    "producer, oracle_key",
    [
        (dedup._minhash_bands, "minhash_bands"),
        (dedup._simhash_sigs, "simhash_sigs"),
        (dedup._simhash_cands, "simhash_cands"),
    ],
)
def test_dedup_fullrow(spark, duck, sf_dir, producer, oracle_key):
    assert_parity(
        producer(spark, sf_dir),
        duck,
        dedup.FULLROW_ORACLES[oracle_key],
        name=oracle_key,
    )


@pytest.mark.parametrize(
    "producer, oracle_key",
    [
        (multimodal._catalog_rows, "catalog_rows"),
        (multimodal._image_feature_rows, "image_feature_rows"),
        (multimodal._frame_sample_rows, "frame_sample_rows"),
        (multimodal._wav_feature_rows, "wav_feature_rows"),
        (multimodal._ppm_feature_rows, "ppm_feature_rows"),
        (multimodal._y4m_feature_rows, "y4m_feature_rows"),
        (multimodal._gif_feature_rows, "gif_feature_rows"),
        (multimodal._frame_fp_rows, "frame_fp_rows"),
        (multimodal._bdv_feature_rows, "bdv_feature_rows"),
        (multimodal._mb4_feature_rows, "mb4_feature_rows"),
        (multimodal._fmp4_feature_rows, "fmp4_feature_rows"),
        (multimodal._sts_feature_rows, "sts_feature_rows"),
    ],
)
def test_multimodal_fullrow(spark, duck, sf_dir, producer, oracle_key):
    assert_parity(
        producer(spark, sf_dir),
        duck,
        multimodal.FULLROW_ORACLES[oracle_key],
        name=oracle_key,
    )
