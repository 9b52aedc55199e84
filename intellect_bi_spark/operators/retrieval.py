"""Keyword retrieval + fuzzy entity matching — 100 TB extensions.

Two search-engine-shaped operators a training-data platform runs beside
the vector path (similarity.py):

- **BM25 top-k keyword search** over ``documents`` — the lexical
  retrieval baseline every hybrid-search stack pairs with ANN.  The
  whole computation is the inverted-index algebra stated relationally:
  tokenize once, aggregate (doc, term) postings with map-side combine,
  broadcast the |Q|-row term-statistics table and the 1-row corpus
  statistics, score map-side.  No shuffle ever carries more than the
  postings for the query terms; nothing is quadratic in the corpus.
- **Blocked fuzzy name matching** over ``part`` — entity resolution on
  the DISTINCT-name dictionary (the 100 TB move: dedupe to the
  dictionary first — frequencies travel as weights — then run edit
  distance only inside candidate blocks + an exact-recall length band,
  never all-pairs over rows).  Candidate volume is quadratic in the
  PER-BLOCK dictionary, not the corpus: row counts only enter through
  the ``freq`` weights, and the fixture dictionary is vocabulary-
  bounded (64 names at every SF).  On an open-vocabulary dictionary the
  block key must carry more selectivity (q-gram prefix filtering — the
  same join shape, more keys); the ``pair_binding`` accumulator (< P
  per matched pair) would overflow BIGINT only past ~9·10^9 matched
  pairs, far beyond any dictionary this blocking admits.

No reference counterpart (the reference's text path is Chroma vector
retrieval only, reference api/main.py:1416-1417); charter extensions.

Parity discipline: tokenization is the identical regex split + empty
filter in both engines; tf/df/dl/N are exact integers; avgdl and every
scoring step is the IDENTICAL literal arithmetic text in both dialects,
so each per-term score differs only by the engines' ``ln`` libm (≤ a few
ulps, rel ~1e-16).  Per-document scores fold in strict term order
(sorted-struct fold vs ``list(s ORDER BY term)`` reduce), and the final
score is quantized to 2^-10 — a boundary straddle needs the ~1e-16
relative ulp gap to cross a 1e-3 quantum edge (~1e-13 per value), which
is the same accepted-risk class as the sketch bounds.  Levenshtein is
exact integer edit distance in both engines; the match summary is all
integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.text import P, md5_mod_hash_duck, md5_mod_hash_sql

TOKEN_SPLIT = "[^a-z0-9]+"
QUERY_TERMS = ("dup", "vector", "window")  # df spread: rare → common
K1_LIT = "1.2"  # identical literal text in both engines — never computed
B_LIT = "0.75"
K1P1_LIT = "2.2"  # k1 + 1 pre-stated as a literal
ONE_MINUS_B_LIT = "0.25"
TOP_K = 15
SCORE_QUANT = 1 << 10
LEV_MAX = 3


def _terms_in() -> str:
    return ", ".join(f"'{t}'" for t in QUERY_TERMS)


def _bm25_term_score(tf: str, df: str, dl: str, n_docs: str) -> str:
    """One query-term's BM25 contribution — IDENTICAL SQL text in Spark
    and DuckDB (Lucene's non-negative idf: ln((N - df + .5)/(df + .5)
    + 1)).  The only engine-varying op is ``ln`` (see module docstring);
    everything else is deterministic IEEE on identical operands."""
    idf = (
        f"ln(((CAST({n_docs} AS DOUBLE) - CAST({df} AS DOUBLE) + 0.5)"
        f" / (CAST({df} AS DOUBLE) + 0.5)) + 1.0)"
    )
    return (
        f"({idf} * ((CAST({tf} AS DOUBLE) * {K1P1_LIT})"
        f" / (CAST({tf} AS DOUBLE) + {K1_LIT} * ({ONE_MINUS_B_LIT}"
        f" + {B_LIT} * (CAST({dl} AS DOUBLE) / avgdl)))))"
    )


def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 documents for the fixed query by BM25 (k1=1.2, b=0.75),
    ranked on the 2^-10-quantized score with doc_id tie-break."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.expr(
            f"filter(split(lower(text), '{TOKEN_SPLIT}'), t -> t <> '')"
        ).alias("toks"),
    )
    stats = toks.agg(
        (
            F.sum(F.size("toks")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    base = toks.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode(
            F.expr(f"filter(toks, t -> t IN ({_terms_in()}))")
        ).alias("term"),
    )
    tf = base.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            F.expr(_bm25_term_score("tf", "df", "dl", "n_docs")).alias("s"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hit_terms"),
        F.array_sort(F.collect_list(F.struct("term", "s"))).alias("ts"),
    )
    return (
        per_doc.select(
            "doc_id",
            "n_hit_terms",
            F.expr(
                "CAST(FLOOR(aggregate(ts, CAST(0.0 AS DOUBLE),"
                f" (acc, x) -> acc + x.s) * {SCORE_QUANT}.0 + 0.5)"
                " AS BIGINT)"
            ).alias("score_q"),
        )
        .orderBy(F.desc("score_q"), "doc_id")
        .limit(TOP_K)
    )


def fuzzy_name_match_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-level fuzzy match: DISTINCT part names blocked on the
    last token, Levenshtein ≤ 3 inside blocks, frequency-weighted merge
    impact.  One summary row: candidate pairs, matches, distance mass,
    impact (Σ freq_a·freq_b over matches), and an md5 binding over the
    matched name pairs so a single wrong pair flips the hash."""
    names = (
        load_tables(spark, sf_dir)["part"]
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "block", F.element_at(F.split("p_name", " "), -1)
        )
    )
    a, b = names.alias("a"), names.alias("b")
    # the length band is a NECESSARY condition for lev ≤ LEV_MAX (each
    # edit changes length by at most 1), so it prunes candidates with
    # EXACT recall — the standard cheap pre-filter before edit distance
    cands = a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.p_name") < F.col("b.p_name"))
        & (
            F.abs(F.length("a.p_name") - F.length("b.p_name"))
            <= F.lit(LEV_MAX)
        ),
    ).select(
        F.col("a.p_name").alias("na"),
        F.col("b.p_name").alias("nb"),
        F.col("a.freq").alias("fa"),
        F.col("b.freq").alias("fb"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("lev"),
    )
    is_match = (F.col("lev") <= LEV_MAX).cast("long")
    pair_bind = F.expr(md5_mod_hash_sql("CONCAT(na, '|', nb)"))
    return cands.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(is_match).alias("n_matches"),
        F.sum(F.col("lev") * is_match).alias("sum_lev"),
        F.sum(F.col("fa") * F.col("fb") * is_match).alias("impact"),
        F.sum(pair_bind * is_match).alias("pair_binding"),
    )


QUERIES = {
    "bm25_topk_docs": bm25_topk_docs,
    "fuzzy_name_match_summary": fuzzy_name_match_summary,
}

_PAIR_BIND_DUCK = md5_mod_hash_duck("na || '|' || nb")

_TOKS_DUCK = (
    "SELECT doc_id,"
    f" list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT}'),"
    " t -> t <> '') AS toks FROM documents"
)

ORACLES = {
    "bm25_topk_docs": (
        f"WITH tok AS ({_TOKS_DUCK}),"
        " st AS (SELECT CAST(SUM(len(toks)) AS DOUBLE)"
        " / CAST(COUNT(*) AS DOUBLE) AS avgdl,"
        " COUNT(*) AS n_docs FROM tok),"
        " base AS (SELECT doc_id, len(toks) AS dl,"
        f" unnest(list_filter(toks, t -> t IN ({_terms_in()}))) AS term"
        " FROM tok),"
        " tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM base"
        " GROUP BY doc_id, dl, term),"
        " dfs AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),"
        " scored AS (SELECT doc_id, term,"
        f" {_bm25_term_score('tf', 'df', 'dl', 'n_docs')} AS s"
        " FROM tf JOIN dfs USING (term) CROSS JOIN st),"
        " per AS (SELECT doc_id, COUNT(*) AS n_hit_terms,"
        " list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list(s ORDER BY term)), (acc, v) -> acc + v) AS score"
        " FROM scored GROUP BY doc_id)"
        " SELECT doc_id, n_hit_terms,"
        f" CAST(FLOOR(score * {SCORE_QUANT}.0 + 0.5) AS BIGINT) AS score_q"
        " FROM per ORDER BY score_q DESC, doc_id LIMIT"
        f" {TOP_K}"
    ),
    "fuzzy_name_match_summary": (
        "WITH names AS (SELECT p_name, COUNT(*) AS freq,"
        " split_part(p_name, ' ', -1) AS block FROM part GROUP BY p_name),"
        " cand AS (SELECT a.p_name AS na, b.p_name AS nb,"
        " a.freq AS fa, b.freq AS fb, levenshtein(a.p_name, b.p_name)"
        " AS lev FROM names a JOIN names b"
        " ON a.block = b.block AND a.p_name < b.p_name"
        f" AND abs(length(a.p_name) - length(b.p_name)) <= {LEV_MAX})"
        " SELECT COUNT(*) AS n_candidates,"
        f" CAST(SUM(CASE WHEN lev <= {LEV_MAX} THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_matches,"
        f" CAST(SUM(CASE WHEN lev <= {LEV_MAX} THEN lev ELSE 0 END)"
        " AS BIGINT) AS sum_lev,"
        f" CAST(SUM(CASE WHEN lev <= {LEV_MAX} THEN fa * fb ELSE 0 END)"
        " AS BIGINT) AS impact,"
        f" CAST(SUM(CASE WHEN lev <= {LEV_MAX} THEN"
        f" {_PAIR_BIND_DUCK}"
        " ELSE 0 END) AS BIGINT) AS pair_binding"
        " FROM cand"
    ),
}
