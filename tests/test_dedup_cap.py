"""Hot-shingle regression: the DF_CAP document-frequency filter must drop
shingles shared by more than DF_CAP docs BEFORE any candidate join — the
k² candidate blowup guard for stopword-ish shingles (VERDICT r1 item 4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import hashlib

from intellect_bi_spark.functions.text import P
from intellect_bi_spark.operators import dedup


def _hash_of(spark, s: str) -> int:
    """Python mirror of the md5-based shingle hash."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P


def test_hot_shingle_dropped(spark):
    n = dedup.DF_CAP + 10
    docs = spark.createDataFrame(
        [(i, f"common words here unique{i} tail{i} end{i}") for i in range(n)],
        "doc_id long, text string",
    )
    sh = dedup._shingle_rows_of(docs)
    rows = sh.collect()
    hashes = {r.sh_hash for r in rows}
    # the shingle present in every doc (df = n > DF_CAP) is gone ...
    assert _hash_of(spark, "common words here") not in hashes
    # ... while each doc keeps its three unique shingles
    per_doc = {r.doc_id for r in rows}
    assert len(per_doc) == n
    assert len(rows) == 3 * n
    assert _hash_of(spark, "words here unique0") in hashes


def test_rare_shingles_survive_at_cap(spark):
    # exactly DF_CAP sharers is kept (boundary is inclusive)
    n = dedup.DF_CAP
    docs = spark.createDataFrame(
        [(i, f"shared stem words only{i} here{i} now{i}") for i in range(n)],
        "doc_id long, text string",
    )
    sh = dedup._shingle_rows_of(docs)
    assert (
        sh.filter(
            F.col("sh_hash") == _hash_of(spark, "shared stem words")
        ).count()
        == n
    )


def test_min_label_cc_long_chain_converges_in_diameter_rounds(spark):
    """Convergence regression for the CC loop on a longer-diameter
    component than any real near-dup cluster: a 11-node path graph
    (diameter 10). Min-label propagation moves the minimum one hop per
    round, so labels settle after `diameter` rounds plus one final
    fixpoint-detection round — and every node must land on the component
    minimum (VERDICT r4 item 5)."""
    diameter = 10
    chain = [(i, i + 1) for i in range(diameter)]
    # a second, disjoint 2-node component keeps the fixpoint honest
    pairs = spark.createDataFrame(chain + [(100, 101)], "i long, j long")
    labels = {
        r["node"]: r["label"]
        for r in dedup._min_label_components(pairs).collect()
    }
    assert labels == {
        **{i: 0 for i in range(diameter + 1)},
        100: 100,
        101: 100,
    }
    assert dedup._LAST_CC_ROUNDS == diameter + 1


def test_min_label_cc_star_converges_fast(spark):
    """A star (the realistic near-dup cluster shape) must converge in 2
    propagation rounds + 1 detection round regardless of size."""
    pairs = spark.createDataFrame(
        [(0, j) for j in range(1, 30)], "i long, j long"
    )
    labels = dedup._min_label_components(pairs).collect()
    assert {r["label"] for r in labels} == {0}
    assert len(labels) == 30
    assert dedup._LAST_CC_ROUNDS <= 3
