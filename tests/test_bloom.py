"""Bloom membership decontam (operators/sketches.py): the one-sided
error guarantee and the filter's structural bounds — properties the
aggregate parity row implies but is worth locking directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from intellect_bi_spark.operators import sketches as sk


def test_bloom_no_false_negatives_and_bounds(spark, sf_dir):
    grams = sk._doc_grams(spark, sf_dir)
    is_test = F.col("doc_id") % sk.BLOOM_TEST_MOD == sk.BLOOM_TEST_REM
    test_g = {r["g"] for r in grams.filter(is_test).select("g").distinct().collect()}
    corpus_g = {
        r["g"] for r in grams.filter(~is_test).select("g").distinct().collect()
    }
    row = sk.bloom_decontam_stats(spark, sf_dir).collect()[0]
    members = corpus_g & test_g
    assert row["n_test_grams"] == len(test_g)
    assert row["n_corpus_grams"] == len(corpus_g)
    assert row["n_members"] == len(members)
    # one-sided: every true member flagged — no false negatives, ever
    assert row["n_flagged"] >= row["n_members"]
    assert row["n_false_pos"] == row["n_flagged"] - row["n_members"]
    assert 0 <= row["n_false_pos"] <= row["n_corpus_grams"] - row["n_members"]
    assert 0 <= row["docs_flagged"]


def test_bloom_word_array_is_broadcast_sized(spark, sf_dir):
    """The scale claim: the filter condenses to ≤ BLOOM_M/64 BIGINT
    words (1 KB) no matter how large the benchmark split is."""
    grams = sk._doc_gram_keys(spark, sf_dir)
    test_g = grams.filter(
        F.col("doc_id") % sk.BLOOM_TEST_MOD == sk.BLOOM_TEST_REM
    ).select("gh").distinct()
    ks = F.explode(F.expr(f"sequence(0, {sk.BLOOM_K - 1})")).alias("k")
    bloom = (
        test_g.select("gh", ks)
        .select(
            F.expr(sk._bloom_pos_sql("CAST(gh AS STRING)", "k")).alias("pos")
        )
        .select(
            F.expr("CAST(pos DIV 63 AS INT)").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))"
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("word"))
        .collect()
    )
    assert 0 < len(bloom) <= -(-sk.BLOOM_M // 63)
    assert all(0 <= r["w"] < -(-sk.BLOOM_M // 63) for r in bloom)
