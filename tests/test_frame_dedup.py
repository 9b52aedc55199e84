"""Cross-video duplicate-frame detection: the fixture classes must
produce REAL duplicate groups spanning videos, the fingerprint stage
must accept an injected decoder (seam contract), and the condensation
invariant — only fingerprints, never pixels, reach the shuffle — is
visible in the plan."""

from __future__ import annotations

import numpy as np

from intellect_bi_spark.operators import multimodal


def test_frame_dedup_finds_cross_video_groups(spark, sf_dir):
    row = multimodal.video_frame_dedup_y4m(spark, sf_dir).collect()[0]
    # 500 docs × 4 content classes × ≤3 frame classes ⇒ massive reuse
    assert row["n_frames"] > row["n_distinct_frames"]
    assert row["n_dup_frames"] > 0
    assert row["n_cross_video_groups"] > 0
    # every class pair (doc%4, f%3) occurs at sf0.001: exactly 12 groups
    assert row["n_distinct_frames"] == 12


def test_frame_fp_rows_match_generator(spark, sf_dir):
    """Fingerprints of the first few videos recomputed in plain numpy
    from the closed-form generator."""
    rows = (
        multimodal._frame_fp_rows(spark, sf_dir)
        .filter("doc_id < 3")
        .orderBy("doc_id", "frame_idx")
        .collect()
    )
    from intellect_bi_spark.functions.text import P

    expect = []
    for d in range(3):
        w, h, n = multimodal._y4md_geom(d)
        for f in range(n):
            v = multimodal._y4md_frame(d, f, w, h).astype(np.int64)
            idx = np.arange(v.size, dtype=np.int64)
            expect.append(
                (d, f, v.size, int(v.sum()), int(((idx % P) * v % P).sum()))
            )
    got = [
        (
            r["doc_id"], r["frame_idx"], r["n_bytes"],
            r["frame_sum"], r["idx_weighted"],
        )
        for r in rows
    ]
    assert got == expect


def test_frame_fp_seam_injects_decoder(spark, sf_dir):
    """An injected decoder (ffmpeg binding in production) flows through
    the identical mapInPandas body: every video then reports the fake
    frames' fingerprints."""

    def fake_decode(payload):
        return 2, 1, [(0, np.array([3, 3, 3, 3, 3, 3], dtype=np.uint8))]

    rows = (
        multimodal._frame_fp_rows(spark, sf_dir, decode=fake_decode)
        .limit(5)
        .collect()
    )
    assert len(rows) == 5
    for r in rows:
        assert (r["frame_idx"], r["n_bytes"], r["frame_sum"]) == (0, 6, 18)


def test_frame_dedup_shuffles_fingerprints_not_pixels(spark, sf_dir):
    """The exchange below the fingerprint groupBy must carry only the
    fingerprint triple + doc/frame ids — no binary payload column."""
    plan = multimodal.video_frame_dedup_y4m(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert exchanges, "expected a fingerprint groupBy exchange"
    assert all("payload" not in ln for ln in exchanges)
    # and the fingerprint extractor's OUTPUT list (the bracketed columns
    # after the UDF expression) carries no binary column
    fp_nodes = [
        ln
        for ln in plan.splitlines()
        if "MapInPandas" in ln and "frame_sum" in ln
    ]
    assert fp_nodes
    for ln in fp_nodes:
        out_cols = ln.split(", [", 1)[1].split("]", 1)[0]
        assert "payload" not in out_cols


def test_weighted_binding_separates_same_sum_frames():
    """Adversarial collision unit (VERDICT r10): frames that are byte
    rearrangements of each other share (n_bytes, frame_sum) — the plain
    sum is blind to position — but the position-weighted modular term
    must separate them.  This pins the easy collision class the binding
    exists for; the docstring documents the crypto-hash production swap
    for the classes a linear fingerprint cannot defeat."""
    from intellect_bi_spark.functions.text import P

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=6 * 4 * 3, dtype=np.uint8)

    def fp(v):
        v64 = v.astype(np.int64)
        idx = np.arange(v64.size, dtype=np.int64)
        return (
            int(v64.size),
            int(v64.sum()),
            int(((idx % P) * v64 % P).sum()),
        )

    # swap two unequal bytes: same length, same sum, different layout
    swapped = base.copy()
    i, j = 0, base.size - 1
    assert base[i] != base[j]
    swapped[i], swapped[j] = base[j], base[i]
    a, b = fp(base), fp(swapped)
    assert a[:2] == b[:2]
    assert a[2] != b[2]

    # full reversal: the classic same-multiset adversary
    rev = base[::-1].copy()
    c = fp(rev)
    assert a[:2] == c[:2]
    assert a[2] != c[2]

    # identical content still collides on all three (dedup still works)
    assert fp(base.copy()) == a
