"""Statistical language-model scoring over ``documents`` — 100 TB extensions.

Two corpus-curation operators every pretraining-data platform runs after
the dedup/quality tier (dedup.py / pipeline.py):

- **Add-k-smoothed bigram LM scoring** — train a bigram model on the
  hash-split train fold, score the held-out fold by average negative
  log-likelihood per bigram (the classic KenLM-shaped perplexity filter:
  keep documents a corpus-fit n-gram model finds unsurprising).  The
  model IS two count relations (bigram and context counts) produced by
  one map-side-combinable aggregation over the train fold; scoring is an
  equi-join of held-out bigrams against those counts.  Nothing is ever
  quadratic: the bigram relation is vocabulary²-bounded (not corpus-
  bounded), the context relation vocabulary-bounded, and the scoring
  join is a plain hash equi-join on (w1, w2) that AQE sizes.  At 100 TB
  the count relations shrink relative to the corpus (vocabulary
  saturates), so the join's build side gets *cheaper* with scale.
- **DSIR hashed-ngram importance weights** (Xie et al. 2023, "Data
  Selection for Language Models via Importance Resampling" — public
  method): estimate target (``lang = 'en'``) and raw unigram
  distributions over ``B = 512`` hash buckets, weight each document by
  the sum of per-token log-likelihood ratios, and select the top
  documents.  The bucket statistics table is B rows regardless of
  corpus size — it broadcasts — and the per-document weight is one
  map-side fold after that broadcast join, so the whole selection is
  two corpus scans and zero large shuffles.

No reference counterpart (the reference's text path is embedding
retrieval only, reference api/main.py:1416-1417); charter extensions in
the training-data-pipeline family.

Parity discipline (the proven retrieval.py BM25 contract): tokenization
is the identical regex split + empty filter in both engines; every
count, total, and vocabulary size is an exact integer; the smoothed
log-probability / log-ratio is the IDENTICAL literal arithmetic text in
both dialects, so each per-term double differs only by the engines'
``ln`` libm (≤ a few ulps, rel ~1e-16).  Per-document sums fold in
strict token-position order (sorted-struct fold vs ``list(x ORDER BY
pos)`` reduce), are quantized to 2^-10 BIGINTs per document, and every
cross-document aggregate is integer arithmetic on those BIGINTs — the
same accepted boundary-straddle risk class (~1e-13 vs a 1e-3 quantum)
as the BM25 and sketch-bound queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.text import P, md5_mod_hash_duck, md5_mod_hash_sql

TOKEN_SPLIT = "[^a-z0-9]+"  # retrieval.py's tokenizer, restated
K_LIT = "0.5"  # add-k smoothing constant — identical literal both engines
NLL_QUANT = 1 << 10
LM_SPLIT_TAG = "lm|"  # train/held split salt (8/10 train)
DSIR_TAG = "dsir|"  # bucket-hash salt
DSIR_BUCKETS = 512
DSIR_TOP_K = 25


def _toks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition to full parallelism before the tokenize/hash stages:
    # the fixture documents table is one parquet file → 1-2 scan
    # partitions, leaving the per-token md5 work near-serial otherwise
    # (pipeline._docs_spread rationale; measured 2-task stages at sf1)
    docs = (
        load_tables(spark, sf_dir)["documents"]
        .select("doc_id", "lang", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    return docs.select(
        "doc_id",
        "lang",
        F.expr(
            f"filter(split(lower(text), '{TOKEN_SPLIT}'), t -> t <> '')"
        ).alias("toks"),
    )


_TOKS_DUCK = (
    "SELECT doc_id, lang,"
    f" list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT}'),"
    " t -> t <> '') AS toks FROM documents"
)

# train membership: md5(doc_id salted) mod 10 < 8 — the same deterministic
# hash-split discipline as dedup.py's group-aware split.
_SPLIT_KEY_SQL = f"concat('{LM_SPLIT_TAG}', CAST(doc_id AS STRING))"
_SPLIT_KEY_DUCK = f"'{LM_SPLIT_TAG}' || CAST(doc_id AS VARCHAR)"
_SPLIT_SQL = f"({md5_mod_hash_sql(_SPLIT_KEY_SQL, 10)} < 8)"
_SPLIT_DUCK = f"({md5_mod_hash_duck(_SPLIT_KEY_DUCK, 10)} < 8)"


def _logp_sql(c12: str, c1: str, v: str) -> str:
    """One bigram's smoothed log-probability — IDENTICAL SQL text in
    Spark and DuckDB: ln((c12 + k) / (c1 + k·V)).  The only
    engine-varying op is ``ln`` (module docstring); everything else is
    deterministic IEEE on identical integer-cast operands."""
    return (
        f"ln((CAST({c12} AS DOUBLE) + {K_LIT})"
        f" / (CAST({c1} AS DOUBLE) + {K_LIT} * CAST({v} AS DOUBLE)))"
    )


def bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language held-out bigram-LM fit: train add-0.5-smoothed bigram
    counts on the 8/10 hash-split train fold, score each held-out
    document's average NLL per bigram (2^-10-quantized), aggregate per
    language.  Columns: lang, n_docs, sum_nll_q, min_nll_q, max_nll_q.
    One-shot pin lifecycle (VERDICT r10 #5): the bigram-relation pin is
    consumed exactly once per invocation, so the final action runs here
    and the pin is released immediately."""
    from ..functions.windows import release_after_action

    out, pins = _bigram_lm_composed(spark, sf_dir)
    return release_after_action(out, *pins)


def _bigram_lm_composed(spark, sf_dir):
    """The lazy composed plan + its one-shot pin (plan tests target
    this seam)."""
    toks = _toks_df(spark, sf_dir).withColumn(
        "is_train", F.expr(_SPLIT_SQL)
    )
    # adjacent-pair explosion; filter(sequence(1, max(n,1)), i -> i < n)
    # is the single-typed empty-safe position list (Spark's bare array()
    # literal is array<string>, and sequence(1, 0) counts DOWN — both
    # foot-guns this form avoids).
    pairs = toks.select(
        "doc_id",
        "lang",
        "is_train",
        "toks",
        F.explode(
            F.expr(
                "filter(sequence(1, greatest(size(toks), 1)),"
                " i -> i < size(toks))"
            )
        ).alias("pos"),
    ).select(
        "doc_id",
        "lang",
        "is_train",
        "pos",
        F.expr("element_at(toks, pos)").alias("w1"),
        F.expr("element_at(toks, pos + 1)").alias("w2"),
    )
    # pin the bigram relation: the train-side counts and the held-out
    # scoring join both read it — one tokenize+explode pass instead of
    # two (r9 review, same class as the DSIR tok_rows pin below).
    # Registered (ADVICE r9): repeated calls must not leak cache entries.
    from ..functions.windows import register_cache

    pairs = register_cache(pairs)
    train = pairs.filter(F.col("is_train"))
    c12 = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # context counts derive from the bigram relation (c1 = Σ_w2 c12), so
    # model consistency holds by construction; V = distinct continuations
    # + 1 OOV slot.
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vstats = c12.agg(
        (F.countDistinct("w2") + F.lit(1)).alias("v")
    )
    held = pairs.filter(~F.col("is_train"))
    scored = (
        held.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vstats))
        .select(
            "doc_id",
            "lang",
            "pos",
            F.expr(
                _logp_sql(
                    "coalesce(c12, CAST(0 AS BIGINT))",
                    "coalesce(c1, CAST(0 AS BIGINT))",
                    "v",
                )
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.array_sort(F.collect_list(F.struct("pos", "logp"))).alias("ps"),
    )
    doc_nll = per_doc.select(
        "doc_id",
        "lang",
        F.expr(
            "CAST(FLOOR(-aggregate(ps, CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x.logp) / CAST(n_pairs AS DOUBLE)"
            f" * {NLL_QUANT}.0 + 0.5) AS BIGINT)"
        ).alias("nll_q"),
    )
    out = (
        doc_nll.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nll_q").alias("sum_nll_q"),
            F.min("nll_q").alias("min_nll_q"),
            F.max("nll_q").alias("max_nll_q"),
        )
        .orderBy("lang")
    )
    return out, (pairs,)


def _bucket_sql(tok_expr: str) -> str:
    return md5_mod_hash_sql(
        f"concat('{DSIR_TAG}', {tok_expr})", DSIR_BUCKETS
    )


def _bucket_duck(tok_expr: str) -> str:
    return md5_mod_hash_duck(
        f"'{DSIR_TAG}' || {tok_expr}", DSIR_BUCKETS
    )


def _lr_sql(ct: str, tt: str, cr: str, tr: str) -> str:
    """One bucket's log-likelihood ratio — IDENTICAL SQL text both
    engines: ln((ct+1)/(Tt+B)) − ln((cr+1)/(Tr+B))."""
    b = f"{DSIR_BUCKETS}.0"
    return (
        f"(ln((CAST({ct} AS DOUBLE) + 1.0)"
        f" / (CAST({tt} AS DOUBLE) + {b}))"
        f" - ln((CAST({cr} AS DOUBLE) + 1.0)"
        f" / (CAST({tr} AS DOUBLE) + {b})))"
    )


def importance_weights_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: hashed-unigram importance weights against the
    ``lang = 'en'`` target distribution; top-25 documents by quantized
    weight.  Columns: doc_id, lang, n_toks, weight_q.  One-shot pin
    lifecycle (VERDICT r10 #5): the hashed-token pin is consumed exactly
    once per invocation, so the final action runs here and the pin is
    released immediately."""
    from ..functions.windows import release_after_action

    out, pins = _dsir_composed(spark, sf_dir)
    return release_after_action(out, *pins)


def _dsir_composed(spark, sf_dir):
    """The lazy composed plan + its one-shot pin (plan tests target
    this seam)."""
    from ..functions.windows import register_cache

    toks = _toks_df(spark, sf_dir)
    # pin the hashed token relation: the bucket-stats aggregate AND the
    # per-document weight join both read it, and without the pin the
    # tokenize + per-token md5 pipeline (the operator's dominant cost —
    # measured ~2× at sf1) executes once per consumer (r9 review; the
    # pagerank-adjacency-pin class)
    tok_rows = toks.select(
        "doc_id",
        "lang",
        F.posexplode("toks").alias("pos", "tok"),
    ).select(
        "doc_id",
        "lang",
        "pos",
        F.expr(_bucket_sql("tok")).alias("bucket"),
    )
    # registered (ADVICE r9): repeated calls must not leak cache entries
    tok_rows = register_cache(tok_rows)
    # one aggregation yields BOTH distributions' bucket counts; the
    # result is ≤ B rows — broadcast material by construction.
    buckets = tok_rows.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct"),
    )
    totals = buckets.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    lr = buckets.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.expr(_lr_sql("ct", "tt", "cr", "tr")).alias("lr"),
    )
    per_doc = (
        tok_rows.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.array_sort(F.collect_list(F.struct("pos", "lr"))).alias(
                "ps"
            ),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            "lang",
            "n_toks",
            F.expr(
                "CAST(FLOOR(aggregate(ps, CAST(0.0 AS DOUBLE),"
                f" (acc, x) -> acc + x.lr) * {NLL_QUANT}.0 + 0.5)"
                " AS BIGINT)"
            ).alias("weight_q"),
        )
        .orderBy(F.desc("weight_q"), "doc_id")
        .limit(DSIR_TOP_K)
    ), (tok_rows,)


BPE_ROUNDS = 2  # learned merges before the candidate report
BPE_TOP = 20


def _char_lists_sql() -> str:
    """Spark: token → array of single-char symbols (explicit substr walk —
    ``split(w, '')`` emits a trailing empty string)."""
    return "transform(sequence(1, length(tok)), i -> substr(tok, i, 1))"


def _merge_fold_sql(syms: str, left: str, right: str) -> str:
    """Spark: greedy left-to-right BPE merge of (left, right) over a
    symbol array — fold with an array accumulator; a merged symbol never
    re-merges with the element that produced it (standard BPE
    non-overlapping semantics, e.g. 'aaaa' + (a,a) → [aa, aa])."""
    merged = f"concat({left}, {right})"
    return (
        f"aggregate(transform({syms}, s -> array(s)),"
        " CAST(array() AS array<string>),"
        " (acc, x) -> IF(size(acc) > 0"
        f" AND element_at(acc, -1) = {left}"
        f" AND element_at(x, 1) = {right},"
        f" concat(slice(acc, 1, size(acc) - 1), array({merged})),"
        " concat(acc, x)))"
    )


def _merge_fold_duck(syms: str, left: str, right: str) -> str:
    """DuckDB: the same greedy merge — list_reduce over singleton-list
    elements (first element is the fold init, matching Spark's
    empty-array zero + else-branch on the first step)."""
    merged = f"({left} || {right})"
    return (
        f"list_reduce(list_transform({syms}, s -> [s]),"
        " (acc, x) -> CASE WHEN len(acc) > 0"
        f" AND acc[-1] = {left} AND x[1] = {right}"
        f" THEN list_concat(acc[1:len(acc)-1], [{merged}])"
        " ELSE list_concat(acc, x) END)"
    )


def _pair_counts(dict_df: DataFrame) -> DataFrame:
    """(l, r, w_count): adjacent-symbol pair counts over the dictionary,
    weighted by token frequency."""
    return (
        dict_df.select(
            "freq",
            "syms",
            F.explode(
                F.expr(
                    "filter(sequence(1, greatest(size(syms), 1)),"
                    " i -> i < size(syms))"
                )
            ).alias("pos"),
        )
        .select(
            "freq",
            F.expr("element_at(syms, pos)").alias("l"),
            F.expr("element_at(syms, pos + 1)").alias("r"),
        )
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("w_count"))
    )


def _top_pair(counts: DataFrame) -> tuple[str, str]:
    """The argmax merge (count DESC, then lexicographic (l, r)) — a
    1-row model collect, the kmeans-model-boundary class."""
    row = counts.orderBy(
        F.desc("w_count"), "l", "r"
    ).limit(1).collect()[0]
    return str(row["l"]), str(row["r"])


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary learning (Sennrich et al. 2016, "Neural
    Machine Translation of Rare Words with Subword Units" — public
    method): two merge rounds learned at corpus scale, then the top-20
    candidate pairs for round three.  Columns: l, r, w_count.

    The 100 TB shape is the dictionary condensation (the fuzzy-match /
    retrieval.py discipline): pair statistics aggregate over the
    DISTINCT-token dictionary with corpus frequencies as weights, so
    every fold and every re-segmentation is vocabulary-bounded — corpus
    size only enters through the ``freq`` integers.  Each learned merge
    is a 1-row argmax collected to the driver (the kmeans model
    boundary); ties break lexicographically in both engines.  All
    counts are exact BIGINTs — parity is strict with no float
    discipline."""
    docs = (
        load_tables(spark, sf_dir)["documents"]
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("text")
    )
    dict_df = (
        docs.select(
            F.explode(
                F.expr(
                    f"filter(split(lower(text), '{TOKEN_SPLIT}'),"
                    " t -> t <> '')"
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.expr(_char_lists_sql()))
    )
    for _ in range(BPE_ROUNDS):
        l, r = _top_pair(_pair_counts(dict_df))
        la, ra = f"'{l}'", f"'{r}'"
        dict_df = dict_df.withColumn(
            "syms", F.expr(_merge_fold_sql("syms", la, ra))
        )
    return (
        _pair_counts(dict_df)
        .orderBy(F.desc("w_count"), "l", "r")
        .limit(BPE_TOP)
    )




def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE APPLY — the serving path of the learned tokenizer
    (bpe_merge_candidates certifies the LEARN path; a corpus build then
    ENCODES every document with the learned merges, and this certifies
    that half): learn the same two merges, apply them to the token
    dictionary, and report per-language encoding statistics — token /
    char / subword counts (the compression the merges bought) plus a
    segmentation binding (count-weighted md5 of each token's subword
    sequence), so ONE token segmented wrongly anywhere flips the row.
    Columns: lang, n_tokens, n_chars, n_subwords, seg_binding.

    The 100 TB shape is the same dictionary condensation as LEARN: the
    merges fold over the DISTINCT-token dictionary, segmentation cost
    is vocabulary-bounded, and the corpus enters only through the
    (lang, tok) count integers that weight the final aggregate — no
    per-occurrence re-segmentation ever happens.  The two argmax
    collects are the model boundary (kmeans-seed class).  One-shot pin
    lifecycle (VERDICT r10 #5): the (lang, tok) count relation feeds
    the dictionary build, both learn argmaxes, and the final join, so
    it is pinned for the invocation and released after the final
    action runs here."""
    from ..functions.windows import register_cache, release_after_action

    docs = (
        load_tables(spark, sf_dir)["documents"]
        .select("lang", "text")
        .repartition(spark.sparkContext.defaultParallelism, "text")
    )
    per = register_cache(
        docs.select(
            "lang",
            F.explode(
                F.expr(
                    f"filter(split(lower(text), '{TOKEN_SPLIT}'),"
                    " t -> t <> '')"
                )
            ).alias("tok"),
        )
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dict_df = (
        per.groupBy("tok")
        .agg(F.sum("cnt").alias("freq"))
        .withColumn("syms", F.expr(_char_lists_sql()))
    )
    for _ in range(BPE_ROUNDS):
        l, r = _top_pair(_pair_counts(dict_df))
        la, ra = f"'{l}'", f"'{r}'"
        dict_df = dict_df.withColumn(
            "syms", F.expr(_merge_fold_sql("syms", la, ra))
        )
    seg = dict_df.select(
        "tok",
        F.size("syms").alias("n_sub"),
        F.length("tok").alias("tok_chars"),
        F.expr(
            md5_mod_hash_sql("concat_ws(' ', syms)")
        ).alias("seg_h"),
    )
    out = (
        per.join(seg, "tok")
        .groupBy("lang")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("tok_chars")).alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_sub")).alias("n_subwords"),
            F.sum(
                F.expr(f"((cnt % {P}) * (seg_h % {P})) % {P}")
            ).alias("seg_binding"),
        )
        .orderBy("lang")
    )
    return release_after_action(out, per)


QUERIES = {
    "bigram_lm_perplexity": bigram_lm_perplexity,
    "importance_weights_dsir": importance_weights_dsir,
    "bpe_merge_candidates": bpe_merge_candidates,
    "bpe_encode_stats": bpe_encode_stats,
}

_PAIRS_DUCK = (
    f"tok AS ({_TOKS_DUCK}),"
    " pairs AS (SELECT doc_id, lang,"
    f" {_SPLIT_DUCK} AS is_train,"
    " u.i AS pos, toks[u.i] AS w1, toks[u.i + 1] AS w2"
    " FROM tok, unnest(range(1, len(toks))) AS u(i))"
)

_DICT_DUCK = (
    "dict AS (SELECT tok, COUNT(*) AS freq,"
    " list_transform(range(1, length(tok) + 1), i -> (tok)[i]) AS syms"
    " FROM (SELECT unnest(list_filter(string_split_regex(lower(text),"
    f" '{TOKEN_SPLIT}'), t -> t <> '')) AS tok FROM documents)"
    " GROUP BY tok)"
)


def _pairs_duck(src: str, name: str) -> str:
    return (
        f"{name} AS (SELECT syms[u.i] AS l, syms[u.i + 1] AS r,"
        f" CAST(SUM(freq) AS BIGINT) AS w_count FROM {src},"
        " unnest(range(1, len(syms))) AS u(i) GROUP BY l, r)"
    )


def _bpe_oracle() -> str:
    m1_fold = _merge_fold_duck("syms", "m1.l1", "m1.r1")
    m2_fold = _merge_fold_duck("syms", "m2.l2", "m2.r2")
    return (
        f"WITH {_DICT_DUCK},"
        f" {_pairs_duck('dict', 'p1')},"
        " m1 AS (SELECT l AS l1, r AS r1 FROM p1"
        " ORDER BY w_count DESC, l, r LIMIT 1),"
        f" d2 AS (SELECT freq, {m1_fold} AS syms"
        " FROM dict CROSS JOIN m1),"
        f" {_pairs_duck('d2', 'p2')},"
        " m2 AS (SELECT l AS l2, r AS r2 FROM p2"
        " ORDER BY w_count DESC, l, r LIMIT 1),"
        f" d3 AS (SELECT freq, {m2_fold} AS syms"
        " FROM d2 CROSS JOIN m2),"
        f" {_pairs_duck('d3', 'p3')}"
        " SELECT l, r, w_count FROM p3"
        f" ORDER BY w_count DESC, l, r LIMIT {BPE_TOP}"
    )


ORACLES = {
    "bigram_lm_perplexity": (
        f"WITH {_PAIRS_DUCK},"
        " c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs"
        " WHERE is_train GROUP BY w1, w2),"
        " c1 AS (SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY w1),"
        " vs AS (SELECT COUNT(DISTINCT w2) + 1 AS v FROM c12),"
        " scored AS (SELECT p.doc_id, p.lang, p.pos,"
        f" {_logp_sql('coalesce(c12.c12, 0)', 'coalesce(c1.c1, 0)', 'vs.v')}"
        " AS logp FROM pairs p LEFT JOIN c12 ON p.w1 = c12.w1"
        " AND p.w2 = c12.w2 LEFT JOIN c1 ON p.w1 = c1.w1"
        " CROSS JOIN vs WHERE NOT p.is_train),"
        " per_doc AS (SELECT doc_id, lang,"
        " CAST(FLOOR(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list(logp ORDER BY pos)), (acc, v) -> acc + v)"
        " / CAST(COUNT(*) AS DOUBLE)"
        f" * {NLL_QUANT}.0 + 0.5) AS BIGINT) AS nll_q"
        " FROM scored GROUP BY doc_id, lang)"
        " SELECT lang, COUNT(*) AS n_docs,"
        " CAST(SUM(nll_q) AS BIGINT) AS sum_nll_q,"
        " MIN(nll_q) AS min_nll_q, MAX(nll_q) AS max_nll_q"
        " FROM per_doc GROUP BY lang ORDER BY lang"
    ),
    "importance_weights_dsir": (
        f"WITH tok AS ({_TOKS_DUCK}),"
        " tr_ AS (SELECT doc_id, lang, u.i AS pos,"
        f" {_bucket_duck('toks[u.i]')} AS bucket"
        " FROM tok, unnest(range(1, len(toks) + 1)) AS u(i)),"
        " buckets AS (SELECT bucket, COUNT(*) AS cr,"
        " SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct"
        " FROM tr_ GROUP BY bucket),"
        " totals AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM buckets),"
        " lr AS (SELECT bucket,"
        f" {_lr_sql('ct', 'tt', 'cr', 'tr')} AS lr"
        " FROM buckets CROSS JOIN totals),"
        " per_doc AS (SELECT t.doc_id, t.lang,"
        " COUNT(*) AS n_toks,"
        " CAST(FLOOR(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list(lr.lr ORDER BY t.pos)), (acc, v) -> acc + v)"
        f" * {NLL_QUANT}.0 + 0.5) AS BIGINT) AS weight_q"
        " FROM tr_ t JOIN lr ON t.bucket = lr.bucket"
        " GROUP BY t.doc_id, t.lang)"
        " SELECT doc_id, lang, n_toks, weight_q FROM per_doc"
        f" ORDER BY weight_q DESC, doc_id LIMIT {DSIR_TOP_K}"
    ),
}

ORACLES["bpe_merge_candidates"] = _bpe_oracle()

def _bpe_encode_oracle() -> str:
    """APPLY restated end to end: the same dictionary + the same two
    argmax merges as the learn oracle (shared CTE builders), with tok
    retained through the folds so segmentations join back to the
    per-(lang, token) corpus counts."""
    m1_fold = _merge_fold_duck("syms", "m1.l1", "m1.r1")
    m2_fold = _merge_fold_duck("syms", "m2.l2", "m2.r2")
    seg_h = md5_mod_hash_duck("array_to_string(syms, ' ')")
    return (
        "WITH tl AS (SELECT lang,"
        " unnest(list_filter(string_split_regex(lower(text),"
        f" '{TOKEN_SPLIT}'), t -> t <> '')) AS tok FROM documents),"
        " per AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt"
        " FROM tl GROUP BY lang, tok),"
        " dict AS (SELECT tok, CAST(SUM(cnt) AS BIGINT) AS freq,"
        " list_transform(range(1, length(tok) + 1), i -> (tok)[i])"
        " AS syms FROM per GROUP BY tok),"
        f" {_pairs_duck('dict', 'p1')},"
        " m1 AS (SELECT l AS l1, r AS r1 FROM p1"
        " ORDER BY w_count DESC, l, r LIMIT 1),"
        f" d2 AS (SELECT tok, freq, {m1_fold} AS syms"
        " FROM dict CROSS JOIN m1),"
        f" {_pairs_duck('d2', 'p2')},"
        " m2 AS (SELECT l AS l2, r AS r2 FROM p2"
        " ORDER BY w_count DESC, l, r LIMIT 1),"
        f" d3 AS (SELECT tok, freq, {m2_fold} AS syms"
        " FROM d2 CROSS JOIN m2),"
        " seg AS (SELECT tok, len(syms) AS n_sub,"
        f" length(tok) AS tok_chars, {seg_h} AS seg_h FROM d3)"
        " SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_tokens,"
        " CAST(SUM(cnt * tok_chars) AS BIGINT) AS n_chars,"
        " CAST(SUM(cnt * n_sub) AS BIGINT) AS n_subwords,"
        f" CAST(SUM(((cnt % {P}) * (seg_h % {P})) % {P}) AS BIGINT)"
        " AS seg_binding"
        " FROM per JOIN seg USING (tok)"
        " GROUP BY lang ORDER BY lang"
    )


ORACLES["bpe_encode_stats"] = _bpe_encode_oracle()

