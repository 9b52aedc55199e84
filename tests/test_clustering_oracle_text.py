"""Lock the kmeans oracle's GENERATED SQL text across the _KM_CTES
refactor (clustering.py): the SemDeDup oracle shares the Lloyd CTE chain,
and sharing must not silently alter the already-driver-certified kmeans
oracle.  The hash is the md5 of the exact pre-refactor string."""

from __future__ import annotations

import hashlib

from intellect_bi_spark.operators import clustering

_KM_ORACLE_MD5 = "74e645738477977b12ee515ad52edb72"


def test_kmeans_oracle_text_unchanged():
    got = hashlib.md5(
        clustering.ORACLES["kmeans_embedding_clusters"].encode()
    ).hexdigest()
    assert got == _KM_ORACLE_MD5, (
        "kmeans_embedding_clusters oracle text changed — if intentional,"
        " update _KM_ORACLE_MD5 AND queue the query for driver re-cert"
    )


def test_semdedup_oracle_embeds_km_ctes():
    assert clustering._KM_CTES in clustering.ORACLES["semantic_dedup_stats"]
    assert clustering._KM_CTES in clustering.ORACLES[
        "kmeans_embedding_clusters"
    ]
