"""Text analysis + chunking operators over the ``documents`` table.

The reference's deterministic document dataflow (SURVEY §2.11): whitespace
normalization (R2, reference api/ingest_docs.py:47), fixed-size chunking
with overlap (R3, api/ingest_docs.py:50-61 / etl/index_docs.py:34-46), plus
the LLM-data-pipeline text analysis the charter adds: token counting,
quality scoring, language-ID heuristic, and document fingerprinting.

Every REGISTRY query here is built-in Spark SQL functions (codegen'd, no
Python UDFs), each with a DuckDB oracle computing the identical
expressions; the one Python surface is :func:`chunker_udtf`, the
deliberately-exposed lateral table-function extension seam (§2.12), which
is not a registry hot path and is proven row-identical to the SQL chunker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.text import (
    P,
    char_hash_duck,
    char_hash_duck_mult,
    char_hash_expr,
    char_hash_expr_mult,
    md5_mod_hash_duck,
    md5_mod_hash_sql,
)
from ..sources.docs import CHUNK_ETL, CHUNK_INGEST

CHUNK_SIZE = 120
CHUNK_STEP = 100  # size 120, overlap 20 → slide 100 (etl variant: trailing
# short chunk allowed; reference etl/index_docs.py:34-46)

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # tiny per-language marker lists for the n-gram/stopword langid heuristic
    "de": ("der", "die", "und", "nicht", "das"),
    "en": ("the", "and", "of", "is", "with"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
}


def normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: whitespace normalization (reference api/ingest_docs.py:47
    ``" ".join(text.split())``)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id",
        F.trim(F.regexp_replace("text", r"\s+", " ")).alias("text"),
        "lang",
        "source",
    )


def _chunks_at(
    spark: SparkSession, sf_dir: str, size: int, step: int
) -> DataFrame:
    """Normalized documents → (doc_id, chunk_start, chunk_text) rows at a
    given (size, slide) — the sequence→explode chunker shared by every
    parameterization (same semantics as sources/docs.py chunk_text)."""
    docs = normalize_text(spark, sf_dir)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - 1, F.lit(0)),
        F.lit(step),
    )
    return docs.select(
        "doc_id",
        F.explode(starts).alias("chunk_start"),
        F.col("text"),
    ).select(
        "doc_id",
        "chunk_start",
        F.expr(f"substr(text, chunk_start + 1, {size})").alias("chunk_text"),
    )


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: fixed-size chunking with overlap as sequence→explode (the
    UDTF-style chunker; reference etl/index_docs.py:34-46 semantics —
    slide = size − overlap, trailing short chunk kept)."""
    return _chunks_at(spark, sf_dir, CHUNK_SIZE, CHUNK_STEP).withColumn(
        "chunk_len", F.length("chunk_text")
    )


def _chunk_summary(
    spark: SparkSession, sf_dir: str, size: int, overlap: int
) -> DataFrame:
    """Per-doc exact checksum of the full chunk relation at a reference
    parameterization: chunk count, total chunk length, last slide offset,
    and an order-independent md5-mod-P content sum — any missing / extra /
    mis-sliced chunk flips its doc's row, at one output row per document."""
    ch = _chunks_at(spark, sf_dir, size, size - overlap)
    return ch.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.length("chunk_text")).alias("sum_chunk_len"),
        F.max("chunk_start").alias("last_start"),
        F.sum(F.expr(md5_mod_hash_sql("chunk_text"))).alias("chunk_hash_sum"),
    )


def chunk_docs_ingest_800_120(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 at the reference's INGEST parameters — size 800, overlap 120
    (api/ingest_docs.py:12-13)."""
    return _chunk_summary(spark, sf_dir, *CHUNK_INGEST)


def chunk_docs_etl_1500_200(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 at the reference's ETL parameters — size 1500, overlap 200
    (etl/index_docs.py:34)."""
    return _chunk_summary(spark, sf_dir, *CHUNK_ETL)


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) + char stats per document."""
    docs = normalize_text(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks)
        ).alias("distinct_ratio"),
    )


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword-ratio / repetition signals
    combined into a deterministic [0,1]-ish score."""
    docs = normalize_text(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    )
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    stop_ratio = n_stop.cast("double") / n_tok
    length_score = F.least(
        F.length("text").cast("double") / F.lit(200.0), F.lit(1.0)
    )
    score = (
        F.lit(0.5) * distinct_ratio
        + F.lit(0.3) * length_score
        + F.lit(0.2) * (F.lit(1.0) - stop_ratio)
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        score.alias("quality"),
    )


def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID: marker-token hit counts per language, argmax with
    alphabetical tie-break; emits predicted language + per-lang scores."""
    docs = normalize_text(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    def _marker_counter(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {
        lang: _marker_counter(markers)
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    df = docs.select("doc_id", F.col("lang").alias("labeled_lang"), *[
        c.alias(f"score_{lang}") for lang, c in scores.items()
    ])
    # argmax with alphabetical tie-break via greatest over encoded pairs:
    # encode as score * 8 + lang_rank (ranks descending alphabetically so
    # ties pick the alphabetically-first language)
    langs = sorted(LANG_MARKERS)
    encoded = [
        (F.col(f"score_{lang}") * 8 + F.lit(len(langs) - 1 - i)).alias(
            f"enc_{lang}"
        )
        for i, lang in enumerate(langs)
    ]
    df = df.select("*", *encoded)
    best = F.greatest(*[F.col(f"enc_{lang}") for lang in langs])
    pred = None
    for i, lang in enumerate(langs):
        cond = F.col(f"enc_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return df.select(
        "doc_id",
        "labeled_lang",
        *[f"score_{lang}" for lang in langs],
        pred.alias("predicted_lang"),
    )


def chunker_udtf():
    """R3 chunking as a PYTHON UDTF — the user-extensible table-function
    seam (SURVEY §2.12: "chunker as UDTF-style explode"). The registry's
    hot path stays the pure-SQL sequence→explode form (chunk_documents —
    codegen'd, no Python); this is the extension point where an arbitrary
    Python chunker (sentence-, token-, or semantics-aware) slots in as a
    lateral table function without touching the surrounding plan. Row
    semantics are IDENTICAL to _chunks_at (proved by
    tests/test_sources.py::test_udtf_chunker_matches_sql_chunker)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_start int, chunk_text string")
    class Chunker:
        def eval(self, text: str, size: int, step: int):
            t = text or ""
            # empty docs still emit one (empty) chunk, like sequence(0,
            # greatest(len-1, 0), step) does
            n = max(len(t), 1)
            for start in range(0, n, step):
                yield start, t[start : start + size]

    return Chunker


def chunk_documents_udtf(
    spark: SparkSession,
    sf_dir: str,
    size: int = CHUNK_SIZE,
    step: int = CHUNK_STEP,
) -> DataFrame:
    """LATERAL application of :func:`chunker_udtf` over the normalized
    corpus — one table-function invocation per document row."""
    normalize_text(spark, sf_dir).createOrReplaceTempView("_norm_docs")
    spark.udtf.register("chunker_py", chunker_udtf())
    return spark.sql(
        f"SELECT d.doc_id, c.chunk_start, c.chunk_text"
        f" FROM _norm_docs d,"
        f" LATERAL chunker_py(d.text, {size}, {step}) c"
    )


# PII patterns: engine-portable regex — no backslash escapes (DuckDB string
# literals don't process them, Spark SQL ones do — `[.]` sidesteps the
# difference), no \b (word-boundary semantics differ at string edges).
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]+"
PII_PHONE_RE = "555-[0-9]{4}"


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every training-data pipeline
    runs before text reaches a model: emails and phone-shaped tokens are
    replaced with typed placeholders, entirely in-plan (regexp_replace is
    codegen'd JVM regex; no Python, no collect).

    The fixture corpus carries no real PII, so each document gets a
    deterministic synthetic contact line appended (doc_id-derived email +
    555 phone) — the redaction then provably fires at least twice per doc
    and the oracle can synthesize the identical input. Output is a one-row
    checksum: doc/match counts plus an id-weighted modular hash of every
    REDACTED text (same binding trick as the multimodal checksums — one
    wrong replacement anywhere changes the row)."""
    docs = normalize_text(spark, sf_dir)
    pii_text = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )
    base = docs.select("doc_id", pii_text.alias("_pii"))
    per = base.select(
        "doc_id",
        F.size(
            F.regexp_extract_all("_pii", F.lit(PII_EMAIL_RE), F.lit(0))
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all("_pii", F.lit(PII_PHONE_RE), F.lit(0))
        ).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("_pii", F.lit(PII_EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(PII_PHONE_RE),
            F.lit("<PHONE>"),
        ).alias("redacted"),
        F.col("_pii").alias("pii_text"),
    ).withColumn("_check", F.expr(
        f"((doc_id % {P}) * {md5_mod_hash_sql('redacted')}) % {P}"
    ))
    return per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").alias("n_emails_found"),
        F.sum("n_phones").alias("n_phones_found"),
        F.sum("_check").alias("redacted_checksum"),
        F.sum(
            (F.length("pii_text") - F.length("redacted")).cast("long")
        ).alias("chars_removed"),
    )


# --- HTML → text extraction (web-ingest stage 0, round 9) --------------------
#
# Every web-crawl corpus pipeline starts by stripping markup; the
# reference's text-ingest analogue is its PDF/docx/txt extraction (R1,
# reference etl/ingest.py — format-specific text extraction before
# chunking).  The construction is the multimodal-codec pattern applied
# to markup: each document is WRAPPED in a deterministic HTML page
# (head/title, a style block, a script block whose string literal
# contains fake tags, an HTML comment with a ghost tag, a nav with a
# doc-varying number of anchors, an entity-bearing paragraph, and the
# ESCAPED document text), and the extractor strips it back down —
# comments, then script/style blocks with their contents, then all
# remaining tags, then entity decoding (strip-then-decode, the order
# that keeps decoded '<' from being eaten as markup), then whitespace
# collapse.  Both directions are pure codegen'd JVM ``regexp_replace``
# chains — no Python anywhere.  The DuckDB oracle NEVER sees the HTML:
# extraction must reproduce the closed-form visible text (title + nav
# anchors + entity span + original text), so a wrong strip order, a
# greedy-match bug, or a missed entity breaks the exact binding.

_HTML_ENTITY_P = "&lt;tag&gt; &amp; entities"  # decodes to '<tag> & entities'


def _escape_html(col):
    """Standard HTML escaping (amp FIRST so later entities aren't
    double-escaped) — the inverse of the extractor's decode step."""
    e = F.regexp_replace(col, F.lit("&"), F.lit("&amp;"))
    e = F.regexp_replace(e, F.lit("<"), F.lit("&lt;"))
    return F.regexp_replace(e, F.lit(">"), F.lit("&gt;"))


def _wrap_html(docs: DataFrame) -> DataFrame:
    """(doc_id, html): the synthesized page around each document."""
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>doc "), sid, F.lit("</title>"),
        F.lit('<style type="text/css">p { color: #aabbcc; }</style>'),
        F.lit('<script>var s = "<p>never text</p>";'
              " if (1 < 2 && 2 > 1) { f(); }</script>"),
        F.lit("</head><body><!-- build "), sid,
        F.lit(" <p>ghost</p> -->"),
        F.lit("<nav>"),
        F.expr("repeat('<a href=\"/l\">go</a> ', CAST(doc_id % 3 AS INT))"),
        F.lit("</nav>"),
        F.lit(f'<p id="main">{_HTML_ENTITY_P}</p>'),
        F.lit("<p>"),
        _escape_html(F.coalesce(F.col("text"), F.lit(""))),
        F.lit("</p></body></html>"),
    )
    return docs.select("doc_id", html.alias("html"))


def extract_html_text(col):
    """The extraction chain: comments → script blocks → style blocks →
    remaining tags → entity decode → whitespace collapse.  ``(?s)``
    makes block strips newline-safe; non-greedy bodies stop at the
    first closer, so a '</p>' INSIDE a script string never terminates
    the script strip early."""
    t = F.regexp_replace(col, F.lit("(?s)<!--.*?-->"), F.lit(" "))
    t = F.regexp_replace(
        t, F.lit("(?s)<script[^>]*>.*?</script>"), F.lit(" ")
    )
    t = F.regexp_replace(
        t, F.lit("(?s)<style[^>]*>.*?</style>"), F.lit(" ")
    )
    t = F.regexp_replace(t, F.lit("<[^>]*>"), F.lit(" "))
    t = F.regexp_replace(t, F.lit("&lt;"), F.lit("<"))
    t = F.regexp_replace(t, F.lit("&gt;"), F.lit(">"))
    t = F.regexp_replace(t, F.lit("&amp;"), F.lit("&"))
    return F.trim(F.regexp_replace(t, F.lit("\\s+"), F.lit(" ")))


def html_text_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row exact checksum over the extracted text of every wrapped
    document: doc count, total extracted chars, and the id-weighted
    md5 binding of each document's full extracted string — one missed
    tag, surviving script fragment, or undecoded entity anywhere flips
    the row."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    ext = _wrap_html(docs).select(
        "doc_id", extract_html_text(F.col("html")).alias("x")
    )
    return ext.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("x")).alias("total_chars"),
        F.sum(
            F.expr(f"((doc_id % {P}) * {md5_mod_hash_sql('x')}) % {P}")
        ).alias("text_binding"),
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: polynomial rolling hash of the normalized
    text (engine-portable; see functions/text.py)."""
    docs = normalize_text(spark, sf_dir)
    return docs.select(
        "doc_id", char_hash_expr("text").alias("fingerprint")
    )


# --- end-to-end RAG retrieval (R2+R3 → R4 → R6 in one plan) ------------------

RAG_DIM = 8
RAG_K = 3  # reference RAG_K default, clamp [1,10] (api/main.py:979,1416)
RAG_QUERY_TEXT = "spark table join query"


def _rag_query_vec() -> list[float]:
    """Query embedding via the SAME dim-seeded hash family the
    deterministic embedder uses (sources/embedder.py.local_embed_texts) —
    computed once, inlined as literals in both engines."""
    acc = [0] * RAG_DIM
    for d in range(RAG_DIM):
        h = 0
        for b in RAG_QUERY_TEXT.encode():
            h = (h * (31 + d) + b) % P
        acc[d] = h / P - 0.5
    return acc


def rag_search_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's retrieval path (R6, api/main.py:1416-1417) end to
    end ON Spark: normalize → chunk-with-overlap → embed every chunk →
    top-k cosine against the query vector, k=3.

    Chunk embeddings are the dim-seeded polynomial hash family evaluated
    as codegen'd SQL expressions (identical math to the mapInPandas
    embedder on ASCII text), so the whole pipeline — including the vector
    math — is DuckDB-oracle-checked. Scale shape: embed is per-row
    (no shuffle); top-k is TakeOrderedAndProject (per-partition heaps,
    no global sort)."""
    chunks = chunk_documents(spark, sf_dir)
    q = _rag_query_vec()
    emb_cols = [
        (
            char_hash_expr_mult("chunk_text", 31 + d).cast("double")
            / F.lit(float(P))
            - F.lit(0.5)
        ).alias(f"e{d}")
        for d in range(RAG_DIM)
    ]
    scored = chunks.select("doc_id", "chunk_start", *emb_cols)
    # left-associative chains mirror the oracle text exactly
    dot = None
    nrm = None
    for d in range(RAG_DIM):
        t = F.col(f"e{d}") * F.lit(q[d])
        s = F.col(f"e{d}") * F.col(f"e{d}")
        dot = t if dot is None else dot + t
        nrm = s if nrm is None else nrm + s
    qn = sum(x * x for x in q) ** 0.5
    return (
        scored.select(
            "doc_id",
            "chunk_start",
            (dot / (F.sqrt(nrm) * F.lit(qn))).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "doc_id", "chunk_start")
        .limit(RAG_K)
    )


QUERIES = {
    "chunk_documents": chunk_documents,
    "chunk_docs_ingest_800_120": chunk_docs_ingest_800_120,
    "chunk_docs_etl_1500_200": chunk_docs_etl_1500_200,
    "rag_search_chunks": rag_search_chunks,
    "text_token_stats": token_stats,
    "text_quality_scores": quality_scores,
    "text_langid": langid_heuristic,
    "doc_fingerprints": doc_fingerprints,
    "redact_pii": redact_pii,
    "html_text_extract_stats": html_text_extract_stats,
}

_NORM = (
    "norm AS (SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g'))"
    " AS text, lang, source FROM documents)"
)


def _langid_oracle() -> str:
    langs = sorted(LANG_MARKERS)
    score_cols = ", ".join(
        "CAST(len(list_filter(ws, t -> t IN ({}))) AS INT) AS score_{}".format(
            ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]), lang
        )
        for lang in langs
    )
    enc_cols = ", ".join(
        f"score_{lang} * 8 + {len(langs) - 1 - i} AS enc_{lang}"
        for i, lang in enumerate(langs)
    )
    best = "greatest({})".format(
        ", ".join(f"enc_{lang}" for lang in langs)
    )
    pred = "CASE " + " ".join(
        f"WHEN enc_{lang} = best THEN '{lang}'" for lang in langs
    ) + " END"
    scores = ", ".join(f"score_{lang}" for lang in langs)
    return (
        f"WITH {_NORM},"
        f" t AS (SELECT doc_id, lang AS labeled_lang,"
        f" string_split(text, ' ') AS ws FROM norm),"
        f" s AS (SELECT doc_id, labeled_lang, {score_cols} FROM t),"
        f" e AS (SELECT *, {enc_cols} FROM s),"
        f" b AS (SELECT *, {best} AS best FROM e)"
        f" SELECT doc_id, labeled_lang, {scores}, {pred} AS predicted_lang"
        f" FROM b"
    )


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)


def _rag_oracle() -> str:
    q = _rag_query_vec()
    qn = sum(x * x for x in q) ** 0.5
    emb_cols = ", ".join(
        f"CAST({char_hash_duck_mult('chunk_text', 31 + d)} AS DOUBLE)"
        f" / {float(P)!r} - 0.5 AS e{d}"
        for d in range(RAG_DIM)
    )
    dot = " + ".join(f"e{d} * {q[d]!r}" for d in range(RAG_DIM))
    nrm = " + ".join(f"e{d} * e{d}" for d in range(RAG_DIM))
    return (
        f"WITH {_NORM},"
        f" starts AS (SELECT doc_id, text,"
        f" unnest(range(0, greatest(length(text), 1), {CHUNK_STEP}))"
        f" AS chunk_start FROM norm),"
        f" chunks AS (SELECT doc_id, CAST(chunk_start AS INT)"
        f" AS chunk_start,"
        f" substr(text, CAST(chunk_start AS INT) + 1, {CHUNK_SIZE})"
        f" AS chunk_text FROM starts),"
        f" emb AS (SELECT doc_id, chunk_start, {emb_cols} FROM chunks)"
        f" SELECT doc_id, chunk_start,"
        f" ({dot}) / (sqrt({nrm}) * {qn!r}) AS cosine"
        f" FROM emb ORDER BY cosine DESC, doc_id, chunk_start"
        f" LIMIT {RAG_K}"
    )

def _chunk_summary_oracle(size: int, overlap: int) -> str:
    step = size - overlap
    return (
        f"WITH {_NORM},"
        f" starts AS (SELECT doc_id, text,"
        f" unnest(range(0, greatest(length(text), 1), {step}))"
        f" AS chunk_start FROM norm),"
        f" chunks AS (SELECT doc_id,"
        f" CAST(chunk_start AS INT) AS chunk_start,"
        f" substr(text, CAST(chunk_start AS INT) + 1, {size})"
        f" AS chunk_text FROM starts)"
        f" SELECT doc_id, COUNT(*) AS n_chunks,"
        f" CAST(SUM(length(chunk_text)) AS BIGINT) AS sum_chunk_len,"
        f" MAX(chunk_start) AS last_start,"
        f" CAST(SUM({md5_mod_hash_duck('chunk_text')}) AS BIGINT)"
        f" AS chunk_hash_sum"
        f" FROM chunks GROUP BY doc_id"
    )


ORACLES = {
    "chunk_docs_ingest_800_120": _chunk_summary_oracle(*CHUNK_INGEST),
    "chunk_docs_etl_1500_200": _chunk_summary_oracle(*CHUNK_ETL),
    "chunk_documents": (
        f"WITH {_NORM},"
        f" starts AS (SELECT doc_id, text,"
        f" unnest(range(0, greatest(length(text), 1), {CHUNK_STEP}))"
        f" AS chunk_start FROM norm)"
        f" SELECT doc_id, CAST(chunk_start AS INT) AS chunk_start,"
        f" substr(text, CAST(chunk_start AS INT) + 1, {CHUNK_SIZE})"
        f" AS chunk_text,"
        f" length(substr(text, CAST(chunk_start AS INT) + 1, {CHUNK_SIZE}))"
        f" AS chunk_len"
        f" FROM starts"
    ),
    "text_token_stats": (
        f"WITH {_NORM}"
        f" SELECT doc_id, lang, length(text) AS n_chars,"
        f" CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,"
        f" CAST(len(list_distinct(string_split(text, ' '))) AS INT)"
        f" AS n_distinct_tokens,"
        f" CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
        f" / len(string_split(text, ' ')) AS distinct_ratio"
        f" FROM norm"
    ),
    "text_quality_scores": (
        f"WITH {_NORM},"
        f" t AS (SELECT doc_id, text, string_split(text, ' ') AS ws"
        f" FROM norm),"
        f" m AS (SELECT doc_id,"
        f" CAST(len(ws) AS INT) AS n_tokens,"
        f" CAST(len(list_filter(ws, t -> t IN ({_STOP_IN}))) AS DOUBLE)"
        f" / len(ws) AS stop_ratio,"
        f" CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)"
        f" AS distinct_ratio,"
        f" least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) AS length_score"
        f" FROM t)"
        f" SELECT doc_id, n_tokens, stop_ratio, distinct_ratio,"
        f" 0.5 * distinct_ratio + 0.3 * length_score"
        f" + 0.2 * (1.0 - stop_ratio) AS quality"
        f" FROM m"
    ),
    "redact_pii": (
        f"WITH {_NORM},"
        f" p AS (SELECT doc_id, text || ' Contact user'"
        f" || CAST(doc_id AS VARCHAR) || '@example.com or call 555-'"
        f" || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'"
        f" AS pii FROM norm),"
        f" r AS (SELECT doc_id, pii,"
        f" len(regexp_extract_all(pii, '{PII_EMAIL_RE}')) AS n_emails,"
        f" len(regexp_extract_all(pii, '{PII_PHONE_RE}')) AS n_phones,"
        f" regexp_replace(regexp_replace(pii, '{PII_EMAIL_RE}',"
        f" '<EMAIL>', 'g'), '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted"
        f" FROM p)"
        f" SELECT COUNT(*) AS n_docs,"
        f" CAST(SUM(n_emails) AS BIGINT) AS n_emails_found,"
        f" CAST(SUM(n_phones) AS BIGINT) AS n_phones_found,"
        f" CAST(SUM(((doc_id % {P}) * {md5_mod_hash_duck('redacted')})"
        f" % {P}) AS BIGINT) AS redacted_checksum,"
        f" CAST(SUM(length(pii) - length(redacted)) AS BIGINT)"
        f" AS chars_removed FROM r"
    ),
    "rag_search_chunks": _rag_oracle(),
    "text_langid": _langid_oracle(),
    "doc_fingerprints": (
        f"WITH {_NORM}"
        f" SELECT doc_id, {char_hash_duck('text')} AS fingerprint FROM norm"
    ),
    # the closed-form VISIBLE text of the wrapped page (title + nav
    # anchor texts + decoded entity span + the original document text),
    # whitespace-collapsed — the oracle never sees the HTML or any
    # extraction regex, so it certifies the Spark-side strip/decode
    # chain end to end
    "html_text_extract_stats": (
        "WITH e AS (SELECT doc_id,"
        " trim(regexp_replace('doc ' || CAST(doc_id AS VARCHAR) || ' ' ||"
        " repeat('go ', CAST(doc_id % 3 AS INT)) ||"
        " ' <tag> & entities ' || COALESCE(text, ''),"
        " '\\s+', ' ', 'g')) AS x FROM documents)"
        " SELECT COUNT(*) AS n_docs,"
        " CAST(SUM(length(x)) AS BIGINT) AS total_chars,"
        f" CAST(SUM(((doc_id % {P}) * {md5_mod_hash_duck('x')}) % {P})"
        " AS BIGINT) AS text_binding FROM e"
    ),
}
