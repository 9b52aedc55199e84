"""Vector similarity search over the ``embeddings`` table.

The reference's vector path is Chroma top-k cosine retrieval (R6, reference
api/main.py:1416-1417, cosine HNSW per api/main.py:157). Spark-first
equivalents:

- brute-force top-k cosine: exact baseline — zip_with/aggregate dot product
  (JVM codegen, no Python), TakeOrderedAndProject top-k. O(n·d) per query;
  right answer for one-off queries at any scale because it's a single scan.
- random-hyperplane LSH near-dup pairs: 8 deterministic hyperplanes → 8-bit
  bucket signature → equi-join on bucket → exact cosine ≥ τ verification.
  The scale path for all-pairs similarity (candidates near-linear, never a
  cross join).

Parity notes: embeddings are float32; both engines cast elements to double
BEFORE any arithmetic, and all folds are left-to-right, so doubles are
bit-identical. Hyperplane weights are a deterministic LCG on (plane, dim):
w = ((1103515245·(p·64+d) + 12345) mod 2^31) / 2^31 − 0.5 — exact integer
arithmetic then an exact power-of-two division, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables

DIM = 64
N_PLANES = 16
N_BANDS = 4  # 4 bands of 4 hyperplanes: banded OR-amplification — a pair at
# cosine c agrees on a 4-plane band with p = (1 − arccos(c)/π)^4; any-band
# candidate probability 1 − (1 − p)^4 (≈0.55 at c=0.4 vs ≈0.06 for random
# pairs), the standard LSH recall/precision trade.
PLANES_PER_BAND = N_PLANES // N_BANDS
COSINE_THRESHOLD = 0.4
TOP_K = 10
QUERY_VEC_ID = 0


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["embeddings"]


def _dot(a: str, b: str) -> Column:
    """Fold-left dot product with per-element double casts (codegen'd)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b},"
        f" (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0.0 AS DOUBLE),"
            f" (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-k by cosine against the query vector
    (vec_id=0), k clamped like the reference's [1,10] (api/main.py:1416)."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            (
                _dot("embedding", "q_emb")
                / (_norm("embedding") * _norm("q_emb"))
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), "vec_id").limit(TOP_K)


def _plane_sign(p: int) -> str:
    """SQL for the sign bit of hyperplane p (shared text both engines except
    the 1-based element accessor, parameterized below).

    NOTE: Spark ``element_at`` is 1-based like DuckDB's ``arr[i]``
    (Spark's own bracket indexing is 0-based — a classic parity trap)."""
    terms = " + ".join(
        f"CAST(element_at(embedding, {d + 1}) AS DOUBLE) *"
        f" ((CAST({(1103515245 * (p * DIM + d) + 12345) % 2147483648}"
        f" AS DOUBLE) / 2147483648.0) - 0.5)"
        for d in range(DIM)
    )
    return f"(CASE WHEN ({terms}) >= 0 THEN 1 ELSE 0 END)"


def _band_key_expr(band: int) -> Column:
    """4-bit band key from planes [band·4, band·4+4)."""
    bits = " + ".join(
        f"({_plane_sign(band * PLANES_PER_BAND + j)} * {1 << j})"
        for j in range(PLANES_PER_BAND)
    )
    return F.expr(f"({bits})").cast("int")


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, band_id, band_key): the banded LSH bucket
    assignment itself."""
    emb = _emb(spark, sf_dir)
    out = None
    for band in range(N_BANDS):
        part = emb.select(
            "vec_id",
            "label",
            F.lit(band).alias("band_id"),
            _band_key_expr(band).alias("band_key"),
        )
        out = part if out is None else out.unionAll(part)
    return out


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs near-duplicates: banded LSH candidate join (OR over 4
    bands) → exact cosine ≥ τ verification."""
    emb = _emb(spark, sf_dir)
    bands = None
    for band in range(N_BANDS):
        part = emb.select(
            "vec_id",
            F.lit(band).alias("band_id"),
            _band_key_expr(band).alias("band_key"),
        )
        bands = part if bands is None else bands.unionAll(part)
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("i"), F.col("b.vec_id").alias("j")
        )
        .distinct()
    )
    ea = _emb(spark, sf_dir).select(
        F.col("vec_id").alias("i"), F.col("embedding").alias("emb_i")
    )
    eb = _emb(spark, sf_dir).select(
        F.col("vec_id").alias("j"), F.col("embedding").alias("emb_j")
    )
    return (
        cands.join(ea, "i")
        .join(eb, "j")
        .select(
            "i",
            "j",
            (
                _dot("emb_i", "emb_j") / (_norm("emb_i") * _norm("emb_j"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_THRESHOLD)
    )


def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (first 4 dims) — the array-typed
    aggregation shape.

    Plain ``avg(double)`` is partition-order-dependent; for run-to-run and
    cross-engine determinism each mean is a fold over the per-label values
    in vec_id order (collect → sort → fold), matching the oracle's
    ``list(v ORDER BY vec_id)`` fold exactly."""
    emb = _emb(spark, sf_dir)
    dims = []
    for d in range(4):  # first 4 dims keep the demo column set small
        fold = (
            f"aggregate(transform(array_sort(collect_list(named_struct("
            f"'vec_id', vec_id, 'v',"
            f" CAST(element_at(embedding, {d + 1}) AS DOUBLE)))),"
            f" s -> s.v), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            f" / COUNT(1)"
        )
        dims.append(F.expr(fold).alias(f"c{d}"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"), *dims
    )


QUERIES = {
    "cosine_topk": cosine_topk,
    "lsh_buckets": lsh_buckets,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "label_centroid_similarity": label_centroid_similarity,
}


def _dot_duck(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, {DIM} + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),"
        f" (acc, v) -> acc + v)"
    )


def _norm_duck(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, {DIM} + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))),"
        f" (acc, v) -> acc + v))"
    )


def _plane_sign_duck(p: int) -> str:
    terms = " + ".join(
        f"CAST(embedding[{d + 1}] AS DOUBLE) *"
        f" ((CAST({(1103515245 * (p * DIM + d) + 12345) % 2147483648}"
        f" AS DOUBLE) / 2147483648.0) - 0.5)"
        for d in range(DIM)
    )
    return f"(CASE WHEN ({terms}) >= 0 THEN 1 ELSE 0 END)"


def _band_key_duck(band: int) -> str:
    bits = " + ".join(
        f"({_plane_sign_duck(band * PLANES_PER_BAND + j)} * {1 << j})"
        for j in range(PLANES_PER_BAND)
    )
    return f"CAST(({bits}) AS INT)"


def _bands_duck() -> str:
    return " UNION ALL ".join(
        f"SELECT vec_id, label, {band} AS band_id,"
        f" {_band_key_duck(band)} AS band_key FROM embeddings"
        for band in range(N_BANDS)
    )


ORACLES = {
    "cosine_topk": (
        f"WITH q AS (SELECT embedding AS q_emb FROM embeddings"
        f" WHERE vec_id = {QUERY_VEC_ID})"
        f" SELECT vec_id, label,"
        f" {_dot_duck('embedding', 'q_emb')} /"
        f" ({_norm_duck('embedding')} * {_norm_duck('q_emb')}) AS cosine"
        f" FROM embeddings, q WHERE vec_id != {QUERY_VEC_ID}"
        f" ORDER BY cosine DESC, vec_id LIMIT {TOP_K}"
    ),
    "lsh_buckets": (
        f"SELECT vec_id, label, band_id, band_key FROM ({_bands_duck()})"
    ),
    "embedding_near_dup_pairs": (
        f"WITH bands AS ({_bands_duck()}),"
        f" cands AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j"
        f" FROM bands a JOIN bands b ON a.band_id = b.band_id"
        f" AND a.band_key = b.band_key AND a.vec_id < b.vec_id),"
        f" scored AS (SELECT c.i, c.j,"
        f" {_dot_duck('ea.embedding', 'eb.embedding')} /"
        f" ({_norm_duck('ea.embedding')} * {_norm_duck('eb.embedding')})"
        f" AS cosine"
        f" FROM cands c JOIN embeddings ea ON ea.vec_id = c.i"
        f" JOIN embeddings eb ON eb.vec_id = c.j)"
        f" SELECT i, j, cosine FROM scored"
        f" WHERE cosine >= {COSINE_THRESHOLD}"
    ),
    "label_centroid_similarity": (
        "SELECT label, COUNT(*) AS n_vectors, "
        + ", ".join(
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            f" list(CAST(embedding[{d + 1}] AS DOUBLE) ORDER BY vec_id)),"
            f" (acc, x) -> acc + x) / COUNT(*) AS c{d}"
            for d in range(4)
        )
        + " FROM embeddings GROUP BY label"
    ),
}
