"""Training-data pipeline operators: deterministic splits, stratified
sampling, and train/test decontamination over the ``documents`` table.

Charter extension (no reference counterpart — the reference's document
dataflow stops at chunk→embed, api/ingest_docs.py:47-61): the corpus-prep
operations every large-scale training pipeline runs before a token ever
reaches a model:

- **train/val/test split** — hash-bucket assignment off the stable doc key
  (never ``rand()``: re-runs, late-arriving shards, and retries must land
  every document in the same split on every executor).
- **stratified sampling** — a per-stratum deterministic hash sample, the
  seed-free distributed form of "sample 20% of each language".
- **decontamination** — exact n-gram overlap between the held-out split and
  the training split (the standard eval-contamination check: build the
  training n-gram dictionary once, probe each held-out document against it).
- **token histogram** — corpus-level top-k token frequencies.

Scale design (100 TB): split and sample are map-only classifications that
fold into the scan (the hash is one md5 per row; the aggregates are
map-side-combined with single-digit output rows). Decontamination's
training dictionary is ``DISTINCT sh_hash`` — one 8-byte row per distinct
n-gram, aggregated map-side — and the probe is an equi-join of hashed longs
where the dictionary side has no duplicate keys, so there is no hot-key k²
blowup by construction (contrast dedup.py's DF_CAP, which exists because
BOTH join sides there carry per-doc rows). The token histogram is a
hash-aggregate with partial combine + TakeOrderedAndProject top-k: no
global sort, k rows to the driver.

- **repetition-based quality filtering** (round 6) — the Gopher-style
  top-bigram / duplicated-trigram rules, one Arrow-batched ``mapInPandas``
  pass (a per-doc ``Counter`` is O(tokens); the in-plan HOF equivalent is
  quadratic per document).
- **sequence packing** (round 6) — deterministic hash-ordered concat-and-
  chop into fixed token budgets, with the global token offset computed as
  a distributed bucketed prefix sum (no unpartitioned window).

Everything except the repetition Counter is built-in Spark SQL (codegen,
no Python UDFs); the DuckDB oracles compute identical expressions
(functions/text.py hash portability notes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.text import (
    md5_mod_hash_duck,
    md5_mod_hash_sql,
    shingles_duck_cte,
)

SPLIT_MOD = 100
TRAIN_END = 80  # bucket in [0, 80)  -> train  (80%)
VAL_END = 90    # bucket in [80, 90) -> val    (10%); [90, 100) -> test
SAMPLE_MOD = 10
SAMPLE_TAKE = 2  # deterministic 20% per stratum
DECON_K = 8      # decontamination n-gram width (word 8-grams)
HISTOGRAM_K = 20

# Hash-bucket expressions, portable across engines: md5 of the salted doc
# key, first 15 hex chars (60 bits — exact BIGINT parse in both engines),
# mod the bucket count. The salt decorrelates the split assignment from the
# sample assignment (same key, independent buckets).


def _bucket_sql(salt: str, mod: int) -> str:
    return (
        f"(CAST(conv(substr(md5(CONCAT('{salt}', CAST(doc_id AS STRING))),"
        f" 1, 15), 16, 10) AS BIGINT) % {mod})"
    )


def _bucket_duck(salt: str, mod: int) -> str:
    return (
        f"(CAST('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)),"
        f" 1, 15) AS BIGINT) % {mod})"
    )


def _split_col() -> Column:
    b = F.expr(_bucket_sql("split:", SPLIT_MOD))
    return (
        F.when(b < TRAIN_END, "train")
        .when(b < VAL_END, "val")
        .otherwise("test")
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["documents"]


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents repartitioned to full parallelism before CPU-heavy
    explode+hash stages — the fixture corpus is one parquet file → one
    scan partition → one core otherwise (same rationale as
    dedup._docs_spread; on a many-file table this is a near-no-op
    exchange that still evens out file-size skew)."""
    return _docs(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


def train_test_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split: per-split document counts and size stats.

    The assignment is a pure function of doc_id — reproducible across
    re-runs and engines, no ``rand()`` seed to desync executors. Map-only
    classification; the aggregate is 3 output rows with map-side combine.
    """
    return (
        _docs(spark, sf_dir)
        .withColumn("split", _split_col())
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20%-per-language sample: per-stratum totals, sampled
    counts, and realized rate — the seed-free distributed stratified
    sampler (membership is a pure hash predicate, so the sample is stable
    under re-runs and can be re-derived by any downstream job)."""
    sampled = F.expr(_bucket_sql("smp:", SAMPLE_MOD)) < SAMPLE_TAKE
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(sampled.cast("long")).alias("n_sampled"),
            (
                F.sum(sampled.cast("long")) / F.count(F.lit(1))
            ).alias("sample_rate"),
        )
        .orderBy("lang")
    )


def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per held-out (test-split) document: how many of its word 8-gram
    shingles also occur anywhere in the train split — the exact
    eval-decontamination check.

    Shape: hashed distinct (doc_id, shingle) rows once for the corpus;
    the train side collapses to a DISTINCT sh_hash dictionary (8 bytes per
    distinct n-gram, map-side combined); each test shingle probes it with
    a left join on the hashed long. The dictionary has unique keys, so the
    join emits at most one row per test shingle — linear, no hot-key
    amplification. At 100 TB the dictionary is the thing you materialize
    once (or sketch with a bloom filter); this plan inherits that shape.
    """
    # vectorized zero-shuffle shingle build shared with the dedup family
    # (dedup._distinct_shingles_of: per-doc distinct inside the Arrow
    # batch, no global DISTINCT exchange of the exploded relation); the
    # split label is re-derived from doc_id afterwards — it is a pure
    # function of the key, so it need not ride through the UDF
    from .dedup import _distinct_shingles_of

    hashed = _distinct_shingles_of(
        _docs_spread(spark, sf_dir), DECON_K
    ).withColumn("split", _split_col())
    train_dict = (
        hashed.filter(F.col("split") == "train").select("sh_hash").distinct()
    )
    test_sh = hashed.filter(F.col("split") == "test").select(
        "doc_id", "sh_hash"
    )
    return (
        test_sh.join(
            train_dict.withColumn("hit", F.lit(1)), "sh_hash", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_contaminated"),
            (F.count("hit") / F.count(F.lit(1))).alias("contamination_rate"),
        )
        .orderBy("doc_id")
    )


def token_familiarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per held-out document: how familiar its tokens are to the train
    split — the unigram-LM-scoring shape (quality filtering by corpus
    typicality) with INTEGER-exact arithmetic: instead of log-probs
    (whose libm rounding can differ across engines), the score is the
    exact sum of train-split occurrence counts per token, divided by the
    token count at the end.

    Shape: train token counts are a map-side-combined dictionary keyed by
    the 60-bit md5 token hash (8-byte shuffle keys; collisions merge
    counts at p ≈ 1e-9 and the oracle hashes identically, so parity is by
    construction). Test tokens probe it with a left join — unique
    dictionary keys, no amplification. OOV tokens are those absent from
    the dictionary."""
    docs = _docs_spread(spark, sf_dir).withColumn("split", _split_col())
    norm = F.trim(F.regexp_replace("text", r"\s+", " "))
    toks = (
        docs.select(
            "doc_id",
            "split",
            F.explode(F.split(norm, " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .select(
            "doc_id",
            "split",
            F.expr(md5_mod_hash_sql("token")).alias("h"),
        )
    )
    train_counts = (
        toks.filter(F.col("split") == "train")
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    test_toks = toks.filter(F.col("split") == "test").select("doc_id", "h")
    return (
        test_toks.join(train_counts, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("cnt").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
            (
                F.sum(F.when(F.col("cnt").isNull(), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("oov_rate"),
            (
                F.sum(F.coalesce(F.col("cnt"), F.lit(0)))
                / F.count(F.lit(1))
            ).alias("familiarity"),
        )
        .orderBy("doc_id")
    )


WSAMPLE_MOD = 1_000_000
WSAMPLE_BASE = 0.5  # acceptance probability at quality == 1.0


def weighted_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling — keep each document with probability
    proportional to its quality score (the standard up-weighting of clean
    text in a training mix), fully deterministic: the per-doc uniform is
    the salted md5 bucket (never ``rand()``), so membership is a pure
    function of doc_id, reproducible across re-runs/engines and
    re-derivable by any downstream job. Acceptance:
    ``u(doc) < WSAMPLE_BASE · quality(doc)``.

    The quality expression is textops.quality_scores' (oracle-verified
    bit-identical across engines), so the float comparison decides
    identically in both. Map-only classification over the corpus; output
    is per-language counts + realized rates (exact-integer division only).
    """
    from .textops import quality_scores

    q = quality_scores(spark, sf_dir).select("doc_id", "quality")
    u = (
        F.expr(_bucket_sql("wsmp:", WSAMPLE_MOD)).cast("double")
        / F.lit(float(WSAMPLE_MOD))
    )
    sampled = (u < F.lit(WSAMPLE_BASE) * F.col("quality")).cast("long")
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang")
        .join(q, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(sampled).alias("n_sampled"),
            (F.sum(sampled) / F.count(F.lit(1))).alias("sample_rate"),
        )
        .orderBy("lang")
    )


AES_K = 25  # fixed-size weighted sample
AES_QUANT = 1 << 20
_AES_FRAC_SQL = (
    "((CAST(conv(substr(md5(CONCAT('aes:', CAST(doc_id AS STRING))),"
    " 1, 13), 16, 10) AS BIGINT) + 1)"
    f" / CAST({1 << 52} AS DOUBLE))"
)
_AES_FRAC_DUCK = (
    "((CAST('0x' || substr(md5('aes:' || CAST(doc_id AS VARCHAR)),"
    " 1, 13) AS BIGINT) + 1)"
    f" / CAST({1 << 52} AS DOUBLE))"
)


def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis A-ES, 2006 — public): every document draws the key
    ``ln(u) / w`` (u = deterministic salted md5 fraction in (0, 1],
    w = n_chars) and the k largest keys are the sample.  The complement
    of `weighted_quality_sample`'s Bernoulli design: that one fixes the
    RATE, this one fixes the SIZE — the shape a curriculum batch builder
    needs.

    Distributed shape: the key is a map-side scalar, the top-k is
    TakeOrderedAndProject (per-partition heads, never a global sort), so
    the whole operator is one scan at any corpus size.  Parity: u's
    numerator ≤ 2^52 converts to double exactly; the only engine-varying
    op is ``ln`` (ulp-level), the key is quantized to 2^-20, and the
    boundary-straddle risk is the accepted BM25/sketch class."""
    docs = _docs(spark, sf_dir).filter(F.col("n_chars") > 0)
    key_q = (
        f"CAST(FLOOR(ln({_AES_FRAC_SQL}) / CAST(n_chars AS DOUBLE)"
        f" * {AES_QUANT}.0 + 0.5) AS BIGINT)"
    )
    return (
        docs.select(
            "doc_id", "lang", "n_chars", F.expr(key_q).alias("key_q")
        )
        .orderBy(F.desc("key_q"), "doc_id")
        .limit(AES_K)
    )


def corpus_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most frequent whitespace tokens over the normalized corpus.

    Hash-aggregate with map-side partial counts, then
    ``orderBy(...).limit(k)`` → TakeOrderedAndProject (per-partition heap,
    k rows to the driver) — no global sort. Ties at the cut broken by
    token text so the top-k set is deterministic in both engines."""
    norm = F.trim(F.regexp_replace("text", r"\s+", " "))
    return (
        _docs_spread(spark, sf_dir)
        .select(F.explode(F.split(norm, " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(HISTOGRAM_K)
    )


PACK_BUDGET = 2048  # tokens per packed training sequence


def _temp_frac_sql(id_expr: str) -> str:
    """The 52-bit md5 acceptance fraction (salt 'temp:') — shared by the
    standalone temperature stage and the funnel's composed run, so the
    same document draws the same fate in both."""
    return (
        f"CAST(conv(substr(md5(CONCAT('temp:', CAST({id_expr} AS STRING))),"
        " 1, 13), 16, 10) AS BIGINT)"
        f" / CAST({1 << 52} AS DOUBLE)"
    )


def _temp_frac_duck(id_expr: str) -> str:
    return (
        f"(CAST('0x' || substr(md5('temp:' || CAST({id_expr} AS VARCHAR)),"
        f" 1, 13) AS BIGINT) / CAST({1 << 52} AS DOUBLE))"
    )


def temperature_resample_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-based language rebalancing (the mC4/ROOTS-style mix
    flattening): resample so the language mix follows p^α instead of p,
    boosting low-resource languages. With α = 1/2 the per-language keep
    rate has the closed form ``sqrt(n_min / n_l)`` (rarest language kept
    in full) — chosen deliberately because IEEE ``sqrt`` is correctly
    rounded in both engines, where a general ``pow(x, α)`` may differ by
    1 ulp between libms and flip a document at the acceptance boundary.

    Membership is a pure hash predicate (salt 'temp:'): a doc is kept
    when its 52-bit md5 fraction < keep_rate. 52 bits (13 hex chars), not
    the 60-bit bucket hash the splits use: ≤ 2^52 converts to double
    EXACTLY, so the comparison is deterministic across engines. Per-lang
    counts broadcast as a 1-row-per-lang frame; the acceptance itself is
    a map-side predicate — no shuffle beyond the summary aggregate."""
    frac = _temp_frac_sql("doc_id")
    counts = _docs(spark, sf_dir).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_docs",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_docs")).alias(
            "keep_rate"
        ),
    )
    kept = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", F.expr(frac).alias("_f"))
        .join(F.broadcast(rates.select("lang", "keep_rate")), "lang")
        .groupBy("lang")
        .agg(
            F.sum(
                (F.col("_f") < F.col("keep_rate")).cast("long")
            ).alias("n_kept")
        )
    )
    return (
        rates.join(kept, "lang")
        .select(
            "lang",
            "n_docs",
            "keep_rate",
            "n_kept",
            (F.col("n_kept").cast("double") / F.col("n_docs")).alias(
                "realized_rate"
            ),
        )
        .orderBy("lang")
    )


def _repetition_rows(docs: DataFrame) -> DataFrame:
    """Per-doc repetition signals (the Gopher/RefinedWeb-style repetition
    rules): most-frequent-bigram count and duplicated-trigram occurrence
    count, via ONE Arrow-batched ``mapInPandas`` pass — a ``Counter`` per
    document is O(tokens), where the equivalent in-plan higher-order-
    function form is O(tokens·distinct) per document. Map-only, no
    shuffle; the same rationale as dedup._distinct_shingles_of."""

    def gen(batches):
        from collections import Counter

        import pandas as pd

        for batch in batches:
            rows = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                toks = (text or "").split(" ")
                n = len(toks)
                max_bi = max(
                    Counter(zip(toks, toks[1:])).values(), default=0
                )
                tri = Counter(zip(toks, toks[1:], toks[2:]))
                n_tri = max(n - 2, 0)
                dup_occ = sum(c for c in tri.values() if c >= 2)
                # integer-exact thresholds: top-bigram fraction
                # 2·max_bi/n > 0.2 ⇔ 10·max_bi > n; duplicated-trigram
                # fraction dup_occ/n_tri > 0.3 ⇔ 10·dup_occ > 3·n_tri
                keep = int(
                    not (10 * max_bi > n or 10 * dup_occ > 3 * n_tri)
                )
                rows.append((int(doc_id), n, max_bi, n_tri, dup_occ, keep))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_tokens", "max_bigram_count", "n_trigrams",
                    "dup_trigram_occurrences", "keep",
                ],
            )

    return docs.select("doc_id", "text").mapInPandas(
        gen,
        "doc_id long, n_tokens int, max_bigram_count int, n_trigrams int,"
        " dup_trigram_occurrences int, keep int",
    )


def quality_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (the pretraining-corpus rule family
    popularized by Gopher's quality heuristics): drop documents whose
    top bigram exceeds 20% of tokens or whose duplicated trigrams exceed
    30% of trigram positions. One-row exact checksum over every per-doc
    signal (integer sums + an id-weighted modular binding, so a single
    wrong count on any document flips the output)."""
    from ..functions.text import P

    r = _repetition_rows(_docs_spread(spark, sf_dir))
    return r.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").alias("n_kept"),
        F.sum("max_bigram_count").alias("sum_max_bigram"),
        F.sum("dup_trigram_occurrences").alias("sum_dup_trigram_occ"),
        F.sum(
            F.expr(
                f"((doc_id % {P}) * ((CAST(max_bigram_count AS BIGINT)"
                f" * 1000003 + dup_trigram_occurrences) % {P})) % {P}"
            )
        ).alias("id_weighted_binding"),
    )


def pack_sequences_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate the corpus in a deterministic
    pseudo-random order (md5 of the doc key — the seed-free distributed
    shuffle) and chop it into PACK_BUDGET-token training sequences; each
    document is assigned to the sequence where it STARTS. Returns the
    one-row manifest checksum (sequence count, token totals, max fill,
    id-weighted binding).

    The global running token offset is a distributed PREFIX SUM, built the
    same way the stitched windows are (functions/windows.py): cumulative
    sums within 256 hash-prefix buckets (the 2-hex-char prefix is monotone
    in the md5 sort key), plus per-bucket offsets from a triangular
    broadcast join on the 256-row bucket-total relation. No unpartitioned
    window, no driver loop — the same plan packs 100 TB.  One-shot pin
    lifecycle (VERDICT r10 #5): the narrow token-count pin is consumed
    exactly once per invocation, so the final action runs here and the
    pin is released immediately."""
    from ..functions.windows import release_after_action

    out, pins = _pack_sequences_composed(spark, sf_dir)
    return release_after_action(out, *pins)


def _pack_sequences_composed(spark, sf_dir):
    """The lazy composed plan + its one-shot pin (plan tests target
    this seam)."""
    from ..functions.text import P

    from ..functions.windows import register_cache

    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias(
            "n_tok"
        ),
    )
    # Persisted: the window branch AND the per-bucket totals branch both
    # read t; without materialization each re-scans the corpus text to
    # recompute the token counts. The persisted frame is the NARROW
    # (doc_id, hash, n_tok) projection — ~40 bytes/doc, spillable, far
    # cheaper than a second pass over the raw text at any corpus size.
    t = register_cache(t.withColumn("bkt", F.substring("h", 1, 2)))
    w_in = Window.partitionBy("bkt").orderBy("h")
    cum_in = t.withColumn("cum_in", F.sum("n_tok").over(w_in))
    per_bkt = t.groupBy("bkt").agg(F.sum("n_tok").alias("tot"))
    rhs = per_bkt.select(F.col("bkt").alias("rbkt"), "tot")
    offs = (
        per_bkt.select("bkt")
        .join(F.broadcast(rhs), F.col("rbkt") < F.col("bkt"))
        .groupBy("bkt")
        .agg(F.sum("tot").alias("off"))
    )
    seqs = (
        cum_in.join(F.broadcast(offs), "bkt", "left")
        .withColumn(
            "cum", F.col("cum_in") + F.coalesce(F.col("off"), F.lit(0))
        )
        .withColumn("seq_id", F.expr(f"(cum - n_tok) div {PACK_BUDGET}"))
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("seq_tokens"),
        )
    )
    return seqs.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("seq_tokens").alias("total_tokens"),
        F.max("seq_tokens").alias("max_seq_tokens"),
        F.sum(
            F.expr(f"((seq_id % {P}) * (seq_tokens % {P})) % {P}")
        ).alias("id_weighted_tokens"),
    ), (t,)


def corpus_prep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stages COMPOSED: language filter → repetition-quality filter →
    exact-dedup keep-first → MinHash-LSH near-dedup keep-cluster-min →
    train split, in one job — the capstone "recipe" a real corpus build
    runs, where each stage is the operator certified individually
    elsewhere (this module + dedup.py). Returns the one-row funnel
    manifest (survivor count after every stage, plus an id+length-
    weighted binding over the final train set, so a single document
    surviving or dying wrongly at ANY stage flips the row).

    One pass over the filtered corpus: the per-doc quality flags join
    back once, the keep-first winner per content digest comes from a
    digest-keyed aggregate (the same hash-groupBy shape as
    exact_dedup_keep_first), and every funnel count is a conditional sum
    in ONE final aggregate — stages don't rescan the corpus.

    The near-dup stage (r8, VERDICT r7 item 3) reuses dedup.py's
    machinery verbatim: per-doc MinHash band signatures depend only on
    each document's OWN (corpus-wide DF-capped) shingles, so filtering
    to exact-dedup survivors cannot change any signature — the funnel
    simply restricts the already-verified LSH pair relation
    (_lsh_scored_pairs, memoized+persisted, so co-running dedup queries
    share the physical work) to pairs whose BOTH endpoints survived, and
    runs min-label connected components over that edge list; each
    cluster keeps its minimum doc_id. The oracle restates the whole
    thing — MinHash bands, candidate join, exact-Jaccard verify, WITH
    RECURSIVE transitive closure — in one SQL chain. At 100 TB every
    added piece is the already-audited candidate-generation shape:
    equi-joins on band hashes, never all-pairs.

    One-shot pin lifecycle (VERDICT r10 #5): the funnel's OWN pins
    (base, flagged, tr) are consumed exactly once per invocation and
    released after the final action runs here; the memoized
    _lsh_scored_pairs relation is deliberately NOT released — it is the
    cross-query shared relation dedup's queries reuse."""
    from ..functions.windows import release_after_action

    out, pins = _funnel_composed(spark, sf_dir)
    return release_after_action(out, *pins)


def _funnel_composed(spark, sf_dir):
    """The lazy composed plan + its one-shot pins (plan tests target
    this seam)."""
    from ..functions.text import P

    from ..functions.windows import register_cache
    from .dedup import (
        JACCARD_THRESHOLD,
        _lsh_scored_pairs,
        _min_label_components,
    )

    docs = _docs_spread(spark, sf_dir)
    en = docs.filter(F.col("lang") == "en")
    rep = _repetition_rows(en).select("doc_id", "keep")
    # Persisted NARROW frame (text projected away after deriving
    # digest/length): the firsts aggregate and the outer join both read
    # base, and without materialization each branch re-runs the corpus
    # scan AND the O(tokens)-per-doc Arrow repetition pass — the same
    # two-branches-one-expensive-frame shape pack_sequences_manifest
    # caches. ~60 bytes/doc, spillable.
    base = register_cache(
        en.select("doc_id", "text", "source")
        .join(rep, "doc_id")
        .withColumn(
            "dg", F.md5(F.coalesce(F.col("text"), F.lit("")))
        )
        .withColumn("bkt", F.expr(_bucket_sql("split:", SPLIT_MOD)))
        .withColumn("n_chars", F.length(F.coalesce("text", F.lit(""))))
        .withColumn(
            "n_tok",
            F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")),
        )
        .drop("text")
    )
    firsts = (
        base.filter(F.col("keep") == 1)
        .groupBy("dg")
        .agg(F.min("doc_id").alias("first_id"))
    )
    # Persisted like base: the survivor semi-join below and the final
    # aggregate both read flagged; is_first is two joins deep.
    flagged = register_cache(
        base.join(firsts, "dg", "left").withColumn(
            "is_first",
            (F.col("keep") == 1) & (F.col("doc_id") == F.col("first_id")),
        )
    )
    # near-dup stage: verified LSH pairs restricted to survivors, then
    # connected components; a survivor dies iff it sits in a cluster
    # above that cluster's min doc_id
    surv = flagged.filter("is_first").select("doc_id")
    scored = _lsh_scored_pairs(spark, sf_dir)
    pairs = (
        scored.withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("n_i") + F.col("n_j") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .join(surv.select(F.col("doc_id").alias("i")), "i", "left_semi")
        .join(surv.select(F.col("doc_id").alias("j")), "j", "left_semi")
        .select("i", "j")
    )
    losers = (
        _min_label_components(pairs)
        .filter(F.col("node") != F.col("label"))
        .select(F.col("node").alias("doc_id"), F.lit(1).alias("_loser"))
    )
    final = flagged.join(losers, "doc_id", "left").withColumn(
        "is_near_unique", F.col("is_first") & F.col("_loser").isNull()
    )
    # post-dedup mix stages (r9, VERDICT r8 item 7): the two certified
    # recipe steps a production mix runs AFTER dedup, composed over the
    # train survivors — domain-TEMPERATURE resampling (the
    # temperature_resample_stats p^1/2 rule keyed on source, since the
    # funnel is English-only after stage 1) and the per-source
    # token-budget hash-order admission (domain_mix_selection's greedy
    # prefix).  Same salts as the standalone stages, so a document draws
    # the same fate composed as certified individually.  tr is cached:
    # three aggregates (counts, budgets, summary) read it, and its
    # derivation hangs off the near-dup component join.
    tr = register_cache(
        final.filter(
            F.col("is_near_unique") & (F.col("bkt") < TRAIN_END)
        ).select(
            "doc_id",
            "source",
            "n_tok",
            F.expr(_temp_frac_sql("doc_id")).alias("_tf"),
            F.expr(
                md5_mod_hash_sql("CONCAT('mix:', CAST(doc_id AS STRING))")
            ).alias("_h"),
        )
    )
    src_counts = tr.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    n_min = src_counts.agg(F.min("n_src").alias("n_min"))
    t_rates = src_counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_src")).alias(
            "keep_rate"
        ),
    )
    res = tr.join(F.broadcast(t_rates), "source").filter(
        F.col("_tf") < F.col("keep_rate")
    )
    num = F.when(
        F.expr("CAST(SUBSTRING(source, 4) AS INT)") % 2 == 0,
        F.lit(MIX_NUM_EVEN),
    ).otherwise(F.lit(MIX_NUM_ODD))
    budgets = (
        res.groupBy("source")
        .agg(F.sum("n_tok").alias("tokens_total"))
        .withColumn("num", num)
        .withColumn(
            "tokens_target",
            F.expr(
                "CAST(FLOOR(CAST(tokens_total * num AS DOUBLE)"
                f" / {MIX_DEN}.0) AS BIGINT)"
            ),
        )
    )
    adm_w = (
        Window.partitionBy("source")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    adm = (
        res.withColumn("cum", F.sum("n_tok").over(adm_w))
        .join(
            F.broadcast(budgets.select("source", "tokens_target")),
            "source",
        )
        .withColumn("sel", F.col("cum") <= F.col("tokens_target"))
    )
    mix = adm.agg(
        F.count(F.lit(1)).alias("n_resampled"),
        F.sum(F.col("sel").cast("long")).alias("n_mix_selected"),
        F.sum(F.when(F.col("sel"), F.col("n_tok")).otherwise(0)).alias(
            "tokens_mix_selected"
        ),
        F.sum(
            F.when(F.col("sel"), F.col("doc_id") % P).otherwise(0)
        ).alias("mix_binding"),
    )
    funnel = final.agg(
        F.count(F.lit(1)).alias("n_lang_en"),
        F.sum("keep").alias("n_quality_kept"),
        F.sum(F.col("is_first").cast("long")).alias("n_unique"),
        F.sum(F.col("is_near_unique").cast("long")).alias("n_near_unique"),
        F.sum(
            (F.col("is_near_unique") & (F.col("bkt") < TRAIN_END)).cast(
                "long"
            )
        ).alias("n_train"),
        F.sum(
            F.expr(
                f"CASE WHEN is_near_unique AND bkt < {TRAIN_END} THEN"
                f" ((doc_id % {P}) * (n_chars % {P})) % {P} END"
            )
        ).alias("train_binding"),
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        total.crossJoin(F.broadcast(funnel))
        .crossJoin(F.broadcast(mix))
        .select(
            "n_total",
            "n_lang_en",
            "n_quality_kept",
            "n_unique",
            "n_near_unique",
            "n_train",
            "train_binding",
            "n_resampled",
            "n_mix_selected",
            "tokens_mix_selected",
            "mix_binding",
        )
    ), (base, flagged, tr)


MIX_DEN = 4  # over-represented (even-indexed) sources keep 3/4 of their
MIX_NUM_EVEN = 3  # tokens; odd-indexed sources are downsampled to 1/4
MIX_NUM_ODD = 1


def token_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the train and test splits: exact
    total-variation distance over the unigram token distributions — the
    audit a corpus build runs to prove its held-out split is not
    distribution-shifted (and, run train-vs-incoming-batch, the drift
    monitor for continuous ingestion).

    TVD = ½ Σ_t |c_tr(t)/N_tr − c_te(t)/N_te| is computed EXACTLY by
    clearing denominators: Σ_t |c_tr(t)·N_te − c_te(t)·N_tr| is pure
    BIGINT arithmetic (token counts ~2 M × corpus totals ~2 M stay far
    under 2^63 at the tested SFs; a trillion-token corpus would first
    rescale counts to a fixed per-2^30 grid to keep the product exact),
    and the single final division is one IEEE step — bit-identical in
    both engines, the maintenance.py discipline.

    Scale: one explode+hash-groupBy pass over the corpus folds 100 TB of
    text to a vocab-sized count table (map-side combine does the heavy
    fold); everything after — totals, max-drift scan, the one-row
    summary — runs on O(vocab) rows. The count table is persisted
    because three aggregates reference it (counts → totals → max →
    summary), pinning the corpus scan count at 1.  One-shot pin
    lifecycle (VERDICT r10 #5): the final action runs here and the pin
    is released immediately instead of waiting for cap eviction.
    """
    from ..functions.windows import release_after_action

    out, pins = _token_drift_composed(spark, sf_dir)
    return release_after_action(out, *pins)


def _token_drift_composed(spark, sf_dir):
    """The lazy composed plan + its one-shot pin (the public query
    wraps it in release_after_action)."""
    from ..functions.windows import register_cache


    toks = (
        _docs_spread(spark, sf_dir)
        .withColumn("split", _split_col())
        .filter(F.col("split").isin("train", "test"))
        .select(
            "split", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    counts = (
        toks.groupBy("token")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
                "c_tr"
            ),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias(
                "c_te"
            ),
        )
    )
    counts = register_cache(counts)
    tot = counts.agg(
        F.sum("c_tr").alias("n_tr"), F.sum("c_te").alias("n_te")
    )
    d = counts.crossJoin(F.broadcast(tot)).withColumn(
        "diff", F.abs(F.col("c_tr") * F.col("n_te") - F.col("c_te") * F.col("n_tr"))
    )
    m = d.agg(F.max("diff").alias("max_diff"))
    binding = md5_mod_hash_sql("token")
    return d.crossJoin(F.broadcast(m)).agg(
        F.max("n_tr").alias("n_tokens_train"),
        F.max("n_te").alias("n_tokens_test"),
        F.sum((F.col("c_tr") > 0).cast("long")).alias("n_vocab_train"),
        F.sum((F.col("c_te") > 0).cast("long")).alias("n_vocab_test"),
        F.sum(((F.col("c_tr") > 0) & (F.col("c_te") > 0)).cast("long")).alias(
            "n_vocab_shared"
        ),
        F.sum("diff").alias("tvd_numer"),
        F.expr(
            "CAST(SUM(diff) AS DOUBLE)"
            " / CAST(2 * MAX(n_tr) * MAX(n_te) AS DOUBLE)"
        ).alias("tvd"),
        F.max("max_diff").alias("max_drift"),
        F.sum(
            F.when(F.col("diff") == F.col("max_diff"), F.expr(binding))
            .otherwise(0)
        ).alias("drift_token_binding"),
    ), (counts,)


def domain_mix_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing to a per-source token budget — the recipe step that
    turns a raw crawl into a mixture (downweight over-represented
    domains, keep the rest), deterministic end to end.

    Per source: budget = FLOOR(total_tokens · num/4) with num keyed off
    the source index parity (a stand-in for the recipe table); documents
    are then admitted in salted-hash order until the NEXT doc would
    exceed the budget (strict running-sum prefix — the same greedy
    shape pack_sequences_manifest uses).  Hash-order admission makes
    the selection a uniform subsample of the domain, independent of
    ingest order.

    Scale: one tokenize pass, a per-source aggregate for budgets
    (broadcast back — O(domains) rows), and ONE window sorted per
    source — the unavoidable cost of greedy prefix selection; at 100 TB
    the window partitions by domain, so each sort is a per-domain
    shuffle, not a global one.  All arithmetic is exact integers (the
    ·num/4 scaling is a power-of-two double op, exact below 2^53)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias(
            "n_tok"
        ),
        F.expr(
            md5_mod_hash_sql("CONCAT('mix:', CAST(doc_id AS STRING))")
        ).alias("h"),
    )
    budgets = d.groupBy("source").agg(
        F.sum("n_tok").alias("tokens_total"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    num = F.when(
        F.expr("CAST(SUBSTRING(source, 4) AS INT)") % 2 == 0,
        F.lit(MIX_NUM_EVEN),
    ).otherwise(F.lit(MIX_NUM_ODD))
    budgets = (
        budgets.withColumn("num", num)
        .withColumn(
            "tokens_target",
            F.expr(
                "CAST(FLOOR(CAST(tokens_total * num AS DOUBLE)"
                f" / {MIX_DEN}.0) AS BIGINT)"
            ),
        )
        .drop("num")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = (
        d.withColumn("cum", F.sum("n_tok").over(w))
        .join(F.broadcast(budgets.select("source", "tokens_target")), "source")
        .withColumn("selected", (F.col("cum") <= F.col("tokens_target")))
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("selected").cast("long")).alias("n_selected"),
            F.sum("n_tok").alias("tokens_total"),
            F.max("tokens_target").alias("tokens_target"),
            F.sum(
                F.when(F.col("selected"), F.col("n_tok")).otherwise(0)
            ).alias("tokens_selected"),
            F.sum(
                F.when(
                    F.col("selected"), F.col("doc_id") % 1_000_000_007
                ).otherwise(0)
            ).alias("sel_binding"),
        )
        .orderBy("source")
    )


QUERIES = {
    "corpus_prep_funnel": corpus_prep_funnel,
    "train_test_split_stats": train_test_split_stats,
    "stratified_sample_by_lang": stratified_sample_by_lang,
    "decontam_ngram_overlap": decontam_ngram_overlap,
    "token_familiarity_scores": token_familiarity_scores,
    "corpus_token_histogram": corpus_token_histogram,
    "weighted_quality_sample": weighted_quality_sample,
    "quality_repetition_stats": quality_repetition_stats,
    "pack_sequences_manifest": pack_sequences_manifest,
    "temperature_resample_stats": temperature_resample_stats,
    "domain_mix_selection": domain_mix_selection,
    "token_drift_tvd": token_drift_tvd,
    "weighted_reservoir_sample": weighted_reservoir_sample,
}

_SPLIT_CASE = (
    f"CASE WHEN {_bucket_duck('split:', SPLIT_MOD)} < {TRAIN_END}"
    f" THEN 'train' WHEN {_bucket_duck('split:', SPLIT_MOD)} < {VAL_END}"
    f" THEN 'val' ELSE 'test' END"
)

from ..functions.text import P as _P  # noqa: E402

ORACLES = {
    # the composed funnel stated as one WITH chain: the repetition CTEs
    # are the quality_repetition_stats oracle's, the keep-first winner is
    # MIN(doc_id) per content digest, the near-dup stage is dedup.py's
    # MinHash-band candidate join + exact-Jaccard verify + WITH RECURSIVE
    # transitive closure (spliced in below the dict — see the late-bound
    # assignment), the split is the shared bucket CASE
    "corpus_prep_funnel": (
        "WITH RECURSIVE en AS (SELECT doc_id, text FROM documents"
        " WHERE lang = 'en'),"
        " t AS (SELECT doc_id,"
        " string_split(COALESCE(text, ''), ' ') AS toks FROM en),"
        " nn AS (SELECT doc_id, len(toks) AS n FROM t),"
        " bi AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g"
        " FROM t, unnest(range(1, len(toks))) AS u(i)),"
        " bic AS (SELECT doc_id, g, COUNT(*) AS c FROM bi"
        " GROUP BY doc_id, g),"
        " bmax AS (SELECT doc_id, MAX(c) AS max_bi FROM bic"
        " GROUP BY doc_id),"
        " tri AS (SELECT doc_id,"
        " toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g"
        " FROM t, unnest(range(1, len(toks) - 1)) AS u(i)),"
        " tric AS (SELECT doc_id, g, COUNT(*) AS c FROM tri"
        " GROUP BY doc_id, g),"
        " tstat AS (SELECT doc_id,"
        " SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_occ,"
        " SUM(c) AS n_tri FROM tric GROUP BY doc_id),"
        " flags AS (SELECT en.doc_id, en.text,"
        " CASE WHEN NOT (10 * COALESCE(b.max_bi, 0) > nn.n"
        " OR 10 * COALESCE(ts.dup_occ, 0) > 3 * COALESCE(ts.n_tri, 0))"
        " THEN 1 ELSE 0 END AS keep,"
        " md5(COALESCE(en.text, '')) AS dg,"
        " length(COALESCE(en.text, '')) AS n_chars"
        " FROM en JOIN nn ON en.doc_id = nn.doc_id"
        " LEFT JOIN bmax b ON en.doc_id = b.doc_id"
        " LEFT JOIN tstat ts ON en.doc_id = ts.doc_id),"
        " firsts AS (SELECT dg, MIN(doc_id) AS first_id FROM flags"
        " WHERE keep = 1 GROUP BY dg),"
        # bkt computed here, where doc_id is unambiguous (firsts carries
        # only dg/first_id)
        " fl AS (SELECT flags.*,"
        f" {_bucket_duck('split:', SPLIT_MOD)} AS bkt,"
        " (keep = 1 AND doc_id = first_id) AS is_first"
        " FROM flags LEFT JOIN firsts USING (dg)),"
        " {neardup_ctes}"
        " SELECT (SELECT COUNT(*) FROM documents) AS n_total,"
        " COUNT(*) AS n_lang_en,"
        " CAST(SUM(keep) AS BIGINT) AS n_quality_kept,"
        " CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_unique,"
        " CAST(SUM(CASE WHEN is_near THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_near_unique,"
        f" CAST(SUM(CASE WHEN is_near AND bkt < {TRAIN_END}"
        " THEN 1 ELSE 0 END) AS BIGINT) AS n_train,"
        f" CAST(SUM(CASE WHEN is_near AND bkt < {TRAIN_END} THEN"
        f" ((doc_id % {_P}) * (n_chars % {_P})) % {_P} END) AS BIGINT)"
        " AS train_binding,"
        " MAX(n_resampled) AS n_resampled,"
        " MAX(n_mix_selected) AS n_mix_selected,"
        " MAX(tokens_mix_selected) AS tokens_mix_selected,"
        " MAX(mix_binding) AS mix_binding"
        " FROM final CROSS JOIN mix"
    ),
    "temperature_resample_stats": (
        "WITH counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents"
        " GROUP BY lang),"
        " m AS (SELECT MIN(n_docs) AS n_min FROM counts),"
        " rates AS (SELECT lang, n_docs,"
        " sqrt(CAST(n_min AS DOUBLE) / n_docs) AS keep_rate"
        " FROM counts, m),"
        " kept AS (SELECT d.lang,"
        " CAST(SUM(CASE WHEN"
        " (CAST('0x' || substr(md5('temp:' || CAST(doc_id AS VARCHAR)),"
        f" 1, 13) AS BIGINT) / CAST({1 << 52} AS DOUBLE)) < r.keep_rate"
        " THEN 1 ELSE 0 END) AS BIGINT) AS n_kept"
        " FROM documents d JOIN rates r ON d.lang = r.lang"
        " GROUP BY d.lang)"
        " SELECT rates.lang, n_docs, keep_rate, n_kept,"
        " CAST(n_kept AS DOUBLE) / n_docs AS realized_rate"
        " FROM rates JOIN kept ON rates.lang = kept.lang"
        " ORDER BY rates.lang"
    ),
    # linear relational form (unnest → GROUP BY) of the per-doc Counter —
    # the quadratic list-lambda form is too slow at sf0.1 parity scale
    "quality_repetition_stats": (
        "WITH t AS (SELECT doc_id,"
        " string_split(COALESCE(text, ''), ' ') AS toks FROM documents),"
        " nn AS (SELECT doc_id, len(toks) AS n FROM t),"
        " bi AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g"
        " FROM t, unnest(range(1, len(toks))) AS u(i)),"
        " bic AS (SELECT doc_id, g, COUNT(*) AS c FROM bi"
        " GROUP BY doc_id, g),"
        " bmax AS (SELECT doc_id, MAX(c) AS max_bi FROM bic"
        " GROUP BY doc_id),"
        " tri AS (SELECT doc_id,"
        " toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g"
        " FROM t, unnest(range(1, len(toks) - 1)) AS u(i)),"
        " tric AS (SELECT doc_id, g, COUNT(*) AS c FROM tri"
        " GROUP BY doc_id, g),"
        " tstat AS (SELECT doc_id,"
        " SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_occ,"
        " SUM(c) AS n_tri FROM tric GROUP BY doc_id),"
        " m AS (SELECT nn.doc_id, nn.n,"
        " COALESCE(b.max_bi, 0) AS max_bi,"
        " COALESCE(ts.n_tri, 0) AS n_tri,"
        " COALESCE(ts.dup_occ, 0) AS dup_occ"
        " FROM nn LEFT JOIN bmax b USING (doc_id)"
        " LEFT JOIN tstat ts USING (doc_id))"
        " SELECT COUNT(*) AS n_docs,"
        " CAST(SUM(CASE WHEN NOT (10 * max_bi > n"
        " OR 10 * dup_occ > 3 * n_tri) THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_kept,"
        " CAST(SUM(max_bi) AS BIGINT) AS sum_max_bigram,"
        " CAST(SUM(dup_occ) AS BIGINT) AS sum_dup_trigram_occ,"
        f" CAST(SUM(((doc_id % {_P}) * ((CAST(max_bi AS BIGINT) * 1000003"
        f" + dup_occ) % {_P})) % {_P}) AS BIGINT) AS id_weighted_binding"
        " FROM m"
    ),
    "pack_sequences_manifest": (
        "WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,"
        " len(string_split(COALESCE(text, ''), ' ')) AS n_tok"
        " FROM documents),"
        " c AS (SELECT doc_id, n_tok, SUM(n_tok) OVER (ORDER BY h"
        " ROWS UNBOUNDED PRECEDING) AS cum FROM t),"
        f" s AS (SELECT (cum - n_tok) // {PACK_BUDGET} AS seq_id, n_tok"
        " FROM c),"
        " g AS (SELECT seq_id, COUNT(*) AS n_docs,"
        " SUM(n_tok) AS seq_tokens FROM s GROUP BY seq_id)"
        " SELECT COUNT(*) AS n_seqs,"
        " CAST(SUM(n_docs) AS BIGINT) AS n_docs,"
        " CAST(SUM(seq_tokens) AS BIGINT) AS total_tokens,"
        " CAST(MAX(seq_tokens) AS BIGINT) AS max_seq_tokens,"
        f" CAST(SUM(((seq_id % {_P}) * (CAST(seq_tokens AS BIGINT)"
        f" % {_P})) % {_P}) AS BIGINT) AS id_weighted_tokens"
        " FROM g"
    ),
    "train_test_split_stats": (
        f"SELECT {_SPLIT_CASE} AS split,"
        f" COUNT(*) AS n_docs,"
        f" CAST(SUM(n_chars) AS BIGINT) AS sum_chars,"
        f" MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id"
        f" FROM documents GROUP BY 1 ORDER BY split"
    ),
    "stratified_sample_by_lang": (
        f"SELECT lang, COUNT(*) AS n_docs,"
        f" CAST(SUM(CASE WHEN {_bucket_duck('smp:', SAMPLE_MOD)}"
        f" < {SAMPLE_TAKE} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,"
        f" CAST(SUM(CASE WHEN {_bucket_duck('smp:', SAMPLE_MOD)}"
        f" < {SAMPLE_TAKE} THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)"
        f" AS sample_rate"
        f" FROM documents GROUP BY lang ORDER BY lang"
    ),
    "decontam_ngram_overlap": (
        f"WITH {shingles_duck_cte(DECON_K)},"
        f" b AS (SELECT doc_id, {_SPLIT_CASE} AS split FROM documents),"
        f" hashed AS (SELECT DISTINCT s.doc_id, b.split,"
        f" {md5_mod_hash_duck('s.shingle')} AS sh_hash"
        f" FROM shingle_rows s JOIN b ON s.doc_id = b.doc_id),"
        f" train_dict AS (SELECT DISTINCT sh_hash FROM hashed"
        f" WHERE split = 'train'),"
        f" test_sh AS (SELECT doc_id, sh_hash FROM hashed"
        f" WHERE split = 'test')"
        f" SELECT t.doc_id, COUNT(*) AS n_shingles,"
        f" COUNT(d.sh_hash) AS n_contaminated,"
        f" CAST(COUNT(d.sh_hash) AS DOUBLE) / COUNT(*)"
        f" AS contamination_rate"
        f" FROM test_sh t LEFT JOIN train_dict d ON t.sh_hash = d.sh_hash"
        f" GROUP BY t.doc_id ORDER BY t.doc_id"
    ),
    "token_familiarity_scores": (
        f"WITH norm AS (SELECT doc_id,"
        f" trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text"
        f" FROM documents),"
        f" b AS (SELECT doc_id, {_SPLIT_CASE} AS split FROM documents),"
        f" tok_raw AS (SELECT doc_id,"
        f" unnest(string_split(text, ' ')) AS token FROM norm),"
        f" tok AS (SELECT t.doc_id, b.split,"
        f" {md5_mod_hash_duck('t.token')} AS h"
        f" FROM tok_raw t JOIN b ON t.doc_id = b.doc_id"
        f" WHERE t.token != ''),"
        f" tr AS (SELECT h, COUNT(*) AS cnt FROM tok"
        f" WHERE split = 'train' GROUP BY h),"
        f" te AS (SELECT doc_id, h FROM tok WHERE split = 'test')"
        f" SELECT te.doc_id, COUNT(*) AS n_tokens,"
        f" CAST(SUM(CASE WHEN tr.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_oov,"
        f" CAST(SUM(CASE WHEN tr.h IS NULL THEN 1 ELSE 0 END) AS DOUBLE)"
        f" / COUNT(*) AS oov_rate,"
        f" CAST(SUM(COALESCE(tr.cnt, 0)) AS DOUBLE) / COUNT(*)"
        f" AS familiarity"
        f" FROM te LEFT JOIN tr ON te.h = tr.h"
        f" GROUP BY te.doc_id ORDER BY te.doc_id"
    ),
    # quality CTE = textops' oracle verbatim (nested WITH in a subquery),
    # so the acceptance predicate compares the same doubles both engines
    "weighted_quality_sample": (
        "WITH q AS ({quality_oracle}),"
        " u AS (SELECT doc_id,"
        " CAST({u_bucket} AS DOUBLE) / {mod}.0 AS u FROM documents)"
        " SELECT d.lang, COUNT(*) AS n_docs,"
        " CAST(SUM(CASE WHEN u.u < {base} * q.quality THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_sampled,"
        " CAST(SUM(CASE WHEN u.u < {base} * q.quality THEN 1 ELSE 0 END)"
        " AS DOUBLE) / COUNT(*) AS sample_rate"
        " FROM documents d JOIN q ON q.doc_id = d.doc_id"
        " JOIN u ON u.doc_id = d.doc_id"
        " GROUP BY d.lang ORDER BY d.lang"
    ),
    "corpus_token_histogram": (
        "WITH norm AS (SELECT trim(regexp_replace(text, '\\s+', ' ', 'g'))"
        " AS text FROM documents),"
        " tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM norm)"
        " SELECT token, COUNT(*) AS n_occurrences FROM tok"
        " WHERE token != ''"
        f" GROUP BY token ORDER BY n_occurrences DESC, token"
        f" LIMIT {HISTOGRAM_K}"
    ),
}

# late-bound: textops' quality oracle is spliced in as the q CTE (kept out
# of the dict literal so the placeholder text above stays readable)
from .textops import ORACLES as _TEXTOPS_ORACLES  # noqa: E402

ORACLES["weighted_quality_sample"] = ORACLES["weighted_quality_sample"].format(
    quality_oracle=_TEXTOPS_ORACLES["text_quality_scores"],
    u_bucket=_bucket_duck("wsmp:", WSAMPLE_MOD),
    mod=WSAMPLE_MOD,
    base=WSAMPLE_BASE,
)

# late-bound: the funnel's near-dup stage restates dedup.py's MinHash-band
# candidate join + exact-Jaccard verify + recursive transitive closure,
# restricted to the exact-dedup survivors (surv). Spliced here so the two
# modules share ONE definition of the minhash/shingle SQL (_minhash_duck)
# and the Jaccard threshold — the same single-source rule as the
# ATTRIBUTION_WINDOW interpolation (ADVICE r7).
from .dedup import (  # noqa: E402
    JACCARD_THRESHOLD as _JT,
    _SIZES as _DEDUP_SIZES,
    _minhash_duck as _MINHASH_DUCK,
)

_MIX_HASH_DUCK = md5_mod_hash_duck(
    chr(39) + "mix:" + chr(39) + " || CAST(doc_id AS VARCHAR)"
)

ORACLES["corpus_prep_funnel"] = ORACLES["corpus_prep_funnel"].format(
    neardup_ctes=(
        f"{_MINHASH_DUCK()}, {_DEDUP_SIZES},"
        " surv AS (SELECT doc_id FROM fl WHERE is_first),"
        " cands AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j"
        " FROM sig a JOIN sig b ON a.band_id = b.band_id"
        " AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id"
        " WHERE a.doc_id IN (SELECT doc_id FROM surv)"
        " AND b.doc_id IN (SELECT doc_id FROM surv)),"
        " shr AS (SELECT c.i, c.j, COUNT(*) AS shared FROM cands c"
        " JOIN ds sa ON sa.doc_id = c.i"
        " JOIN ds sb ON sb.doc_id = c.j AND sb.sh_hash = sa.sh_hash"
        " GROUP BY 1, 2),"
        " prs AS (SELECT i, j FROM shr"
        " JOIN sizes si ON si.doc_id = i JOIN sizes sj ON sj.doc_id = j"
        " WHERE CAST(shared AS DOUBLE) / (si.n_sh + sj.n_sh - shared)"
        f" >= {_JT}),"
        " edges AS (SELECT i AS a, j AS b FROM prs"
        " UNION SELECT j, i FROM prs),"
        " walk(node, origin) AS ("
        " SELECT a, a FROM (SELECT DISTINCT a FROM edges)"
        " UNION"
        " SELECT e.b, w.origin FROM walk w JOIN edges e ON w.node = e.a),"
        " lbl AS (SELECT node, MIN(origin) AS cmin FROM walk"
        " GROUP BY node),"
        " losers AS (SELECT node FROM lbl WHERE node != cmin),"
        " final AS (SELECT fl.*, (is_first AND doc_id NOT IN"
        " (SELECT node FROM losers)) AS is_near FROM fl),"
        # post-dedup mix stages (r9): domain-temperature resample over
        # the train survivors, then the per-source token-budget greedy
        # admission — the temperature_resample_stats and
        # domain_mix_selection oracle forms restated over `final`
        " tr0 AS (SELECT f.doc_id AS doc_id, d.source AS source,"
        " len(string_split(COALESCE(d.text, ''), ' ')) AS n_tok"
        " FROM final f JOIN documents d USING (doc_id)"
        f" WHERE is_near AND bkt < {TRAIN_END}),"
        " tr AS (SELECT doc_id, source, n_tok,"
        f" {_temp_frac_duck('doc_id')} AS tf,"
        f" {_MIX_HASH_DUCK} AS h FROM tr0),"
        " tcnt AS (SELECT source, COUNT(*) AS n_src FROM tr"
        " GROUP BY source),"
        " tmin AS (SELECT MIN(n_src) AS n_min FROM tcnt),"
        " trate AS (SELECT source,"
        " sqrt(CAST(n_min AS DOUBLE) / n_src) AS keep_rate"
        " FROM tcnt, tmin),"
        " res AS (SELECT tr.* FROM tr JOIN trate USING (source)"
        " WHERE tf < keep_rate),"
        " bud AS (SELECT source,"
        " CAST(FLOOR(CAST(SUM(n_tok) * (CASE WHEN"
        " CAST(substr(source, 4) AS INT) % 2 = 0 THEN"
        f" {MIX_NUM_EVEN} ELSE {MIX_NUM_ODD} END) AS DOUBLE)"
        f" / {MIX_DEN}.0) AS BIGINT) AS tokens_target"
        " FROM res GROUP BY source),"
        " adm AS (SELECT res.doc_id, res.n_tok, bud.tokens_target,"
        " SUM(res.n_tok) OVER (PARTITION BY res.source"
        " ORDER BY res.h, res.doc_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum"
        " FROM res JOIN bud USING (source)),"
        " mix AS (SELECT COUNT(*) AS n_resampled,"
        " CAST(SUM(CASE WHEN cum <= tokens_target THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_mix_selected,"
        " CAST(SUM(CASE WHEN cum <= tokens_target THEN n_tok ELSE 0 END)"
        " AS BIGINT) AS tokens_mix_selected,"
        f" CAST(SUM(CASE WHEN cum <= tokens_target THEN doc_id % {_P}"
        " ELSE 0 END) AS BIGINT) AS mix_binding FROM adm)"
    )
)

# domain mixing restated: identical tokenize, per-source budget (the same
# exact power-of-two scaling), identical salted-hash admission window
ORACLES["domain_mix_selection"] = (
    "WITH d AS (SELECT doc_id, source,"
    " len(string_split(COALESCE(text, ''), ' ')) AS n_tok,"
    f" {md5_mod_hash_duck(chr(39)+'mix:'+chr(39)+' || CAST(doc_id AS VARCHAR)')} AS h"
    " FROM documents),"
    " b AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tokens_total,"
    " CAST(FLOOR(CAST(SUM(n_tok) * (CASE WHEN"
    " CAST(substr(source, 4) AS INT) % 2 = 0 THEN"
    f" {MIX_NUM_EVEN} ELSE {MIX_NUM_ODD} END) AS DOUBLE) / {MIX_DEN}.0)"
    " AS BIGINT) AS tokens_target"
    " FROM d GROUP BY source),"
    " c AS (SELECT d.doc_id, d.source, d.n_tok, b.tokens_target,"
    " SUM(d.n_tok) OVER (PARTITION BY d.source ORDER BY d.h, d.doc_id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum"
    " FROM d JOIN b ON b.source = d.source)"
    " SELECT source, COUNT(*) AS n_docs,"
    " CAST(SUM(CASE WHEN cum <= tokens_target THEN 1 ELSE 0 END)"
    " AS BIGINT) AS n_selected,"
    " CAST(SUM(n_tok) AS BIGINT) AS tokens_total,"
    " MAX(tokens_target) AS tokens_target,"
    " CAST(SUM(CASE WHEN cum <= tokens_target THEN n_tok ELSE 0 END)"
    " AS BIGINT) AS tokens_selected,"
    " CAST(SUM(CASE WHEN cum <= tokens_target THEN doc_id % 1000000007"
    " ELSE 0 END) AS BIGINT) AS sel_binding"
    " FROM c GROUP BY source ORDER BY source"
)

# drift: the identical denominator-cleared TVD restated independently —
# counts and the |c_tr·N_te − c_te·N_tr| products are exact BIGINTs in
# both engines; the lone double division is textually identical
ORACLES["token_drift_tvd"] = (
    "WITH t AS (SELECT"
    f" {_SPLIT_CASE} AS split,"
    " unnest(string_split(text, ' ')) AS token FROM documents),"
    " c AS (SELECT token,"
    " CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS c_tr,"
    " CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS c_te"
    " FROM t WHERE split IN ('train', 'test') AND token != ''"
    " GROUP BY token),"
    " tot AS (SELECT CAST(SUM(c_tr) AS BIGINT) AS n_tr,"
    " CAST(SUM(c_te) AS BIGINT) AS n_te FROM c),"
    " x AS (SELECT token, c_tr, c_te, n_tr, n_te,"
    " abs(c_tr * n_te - c_te * n_tr) AS diff FROM c CROSS JOIN tot),"
    " m AS (SELECT MAX(diff) AS max_diff FROM x)"
    " SELECT MAX(n_tr) AS n_tokens_train, MAX(n_te) AS n_tokens_test,"
    " CAST(SUM(CASE WHEN c_tr > 0 THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_vocab_train,"
    " CAST(SUM(CASE WHEN c_te > 0 THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_vocab_test,"
    " CAST(SUM(CASE WHEN c_tr > 0 AND c_te > 0 THEN 1 ELSE 0 END)"
    " AS BIGINT) AS n_vocab_shared,"
    " CAST(SUM(diff) AS BIGINT) AS tvd_numer,"
    " CAST(SUM(diff) AS DOUBLE)"
    " / CAST(2 * MAX(n_tr) * MAX(n_te) AS DOUBLE) AS tvd,"
    " MAX(max_diff) AS max_drift,"
    " CAST(SUM(CASE WHEN diff = max_diff THEN"
    f" {md5_mod_hash_duck('token')} ELSE 0 END) AS BIGINT)"
    " AS drift_token_binding"
    " FROM x CROSS JOIN m"
)

ORACLES["weighted_reservoir_sample"] = (
    "SELECT doc_id, lang, n_chars,"
    f" CAST(FLOOR(ln({_AES_FRAC_DUCK}) / CAST(n_chars AS DOUBLE)"
    f" * {AES_QUANT}.0 + 0.5) AS BIGINT) AS key_q"
    " FROM documents WHERE n_chars > 0"
    f" ORDER BY key_q DESC, doc_id LIMIT {AES_K}"
)
