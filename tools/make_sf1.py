"""Synthesize an sf1.0 fixture directory for the scaling-curve bench
(VERDICT r5 item 5) by replicating the sf0.1 tables 10× with key offsets.

The goal is a PERFORMANCE corpus whose per-query work is ~10× sf0.1 —
correctness stays gated at the driver SFs. Replication rules keep the
workload shape linear:

- ``lineitem``/``orders``: order keys offset per replica (join integrity
  kept; part/supplier/customer dims unchanged — facts grow, dims don't,
  exactly the TPC-H scaling direction that matters for broadcast plans);
- ``events``: event AND user keys offset — 10× the users, not 10× hotter
  users, so sessionization state scales by keys;
- ``documents``: doc ids offset and every token of replicas 1..9 suffixed
  with the replica tag, so cross-replica shingle overlap is ~zero and the
  near-dup/dedup workload scales linearly (verbatim copies would add a
  quadratic cross-replica pair blow-up that says nothing about the
  engine);
- ``embeddings``: vec ids offset, vectors perturbed per replica (keeps
  ANN bucket occupancy growing linearly instead of 10-deep exact ties);
- dimension tables copied as-is.

Output: ``/tmp/sgraft_data/sf1.0/*.parquet`` (~10× sf0.1; regenerate any
time with ``python tools/make_sf1.py``).
"""

import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sgraft_data/sf1.0")
REPS = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

    def copy(sql: str, table: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{DST}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    reps = f"(SELECT unnest(range({REPS})) AS rep)"

    ok_step = con.execute(
        f"SELECT MAX(o_orderkey) + 1 FROM '{SRC}/orders.parquet'"
    ).fetchone()[0]
    copy(
        f"SELECT o_orderkey + rep * {ok_step} AS o_orderkey, o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        f" FROM '{SRC}/orders.parquet', {reps}",
        "orders",
    )
    copy(
        f"SELECT l_orderkey + rep * {ok_step} AS l_orderkey, l_partkey,"
        " l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,"
        " l_tax, l_returnflag, l_linestatus, l_shipdate"
        f" FROM '{SRC}/lineitem.parquet', {reps}",
        "lineitem",
    )

    ev_step, us_step = con.execute(
        f"SELECT MAX(event_id) + 1, MAX(user_id) + 1"
        f" FROM '{SRC}/events.parquet'"
    ).fetchone()
    copy(
        f"SELECT event_id + rep * {ev_step} AS event_id, ts,"
        f" user_id + rep * {us_step} AS user_id, event_type, value, props"
        f" FROM '{SRC}/events.parquet', {reps}",
        "events",
    )

    doc_step = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    copy(
        f"SELECT doc_id + rep * {doc_step} AS doc_id,"
        " CASE WHEN rep = 0 THEN text ELSE array_to_string("
        " list_transform(string_split(text, ' '),"
        " x -> x || '~' || rep), ' ') END AS text,"
        " lang, source,"
        " CASE WHEN rep = 0 THEN n_chars"
        " ELSE length(array_to_string(list_transform("
        " string_split(text, ' '), x -> x || '~' || rep), ' ')) END"
        " AS n_chars"
        f" FROM '{SRC}/documents.parquet', {reps}",
        "documents",
    )

    vec_step = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    copy(
        f"SELECT vec_id + rep * {vec_step} AS vec_id,"
        " list_transform(embedding,"
        " x -> CAST(x + rep * 0.003 * (CAST(vec_id % 13 AS FLOAT) - 6)"
        " AS FLOAT)) AS embedding, label"
        f" FROM '{SRC}/embeddings.parquet', {reps}",
        "embeddings",
    )
    print(f"done -> {DST}")


if __name__ == "__main__":
    main()
