"""Sources & sinks layer tests (SURVEY §2.1 S1-S9, §2.11 R1-R5)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from intellect_bi_spark.sources import csv_sales, docs, embedder, sinks

CANONICAL_COLS = ["date", "product", "region", "sales", "age", "gender", "satisfaction"]


@pytest.fixture(scope="module")
def sales_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "sales_data.csv"
    p.write_text(
        "Date,Product,Region,Sales,Customer_Age,Customer_Gender,Customer_Satisfaction\n"
        "2024-01-02,Widget A,West,120,34,Male,4.5\n"
        "2024-01-01,Widget B,East,80,61,Female,3.0\n"
        "2024-01-03,Widget A,West,notanumber,29,Female,\n"
    )
    return str(p)


def test_load_sales_csv_header_path(spark, sales_csv):
    df = csv_sales.load_sales_csv(spark, sales_csv)
    assert df.columns == CANONICAL_COLS
    types = dict(df.dtypes)
    assert types == {
        "date": "date",
        "product": "string",
        "region": "string",
        "sales": "double",
        "age": "int",
        "gender": "string",
        "satisfaction": "double",
    }
    rows = {r["product"]: r for r in df.collect()}
    assert rows["Widget B"]["date"] == dt.date(2024, 1, 1)
    assert rows["Widget B"]["sales"] == 80.0
    # malformed numerics cast to NULL (reference CAST semantics)
    bad = [r for r in rows.values() if r["date"] == dt.date(2024, 1, 3)][0]
    assert bad["sales"] is None and bad["satisfaction"] is None


def test_load_sales_csv_mixed_case_headers(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text(
        "DATE,product,REGION,sales,customer_age,Customer_Gender,customer_satisfaction\n"
        "2024-02-01,W,North,10,20,Other,5.0\n"
    )
    df = csv_sales.load_sales_csv(spark, str(p))
    assert df.columns == CANONICAL_COLS
    assert df.collect()[0]["region"] == "North"


def test_load_sales_csv_headerless_fallback(spark, tmp_path):
    p = tmp_path / "headerless.csv"
    p.write_text("2024-03-01,W,South,42,55,Male,2.5\n2024-03-02,X,North,7,18,Female,4.0\n")
    df = csv_sales.load_sales_csv(spark, str(p))
    assert df.columns == CANONICAL_COLS
    got = sorted(df.collect(), key=lambda r: r["date"])
    assert got[0]["sales"] == 42.0 and got[1]["region"] == "North"


def test_synonym_resolver():
    cols = ["Week_Ending", "Weekly_Sales", "Market", "SKU", "CSAT", "Age_Years"]
    assert csv_sales.resolve_column(cols, "date").lower() == "week_ending"
    assert csv_sales.resolve_column(cols, "sales").lower() == "weekly_sales"
    assert csv_sales.resolve_column(cols, "region").lower() == "market"
    assert csv_sales.resolve_column(cols, "product").lower() == "sku"
    assert csv_sales.resolve_column(cols, "satisfaction").lower() == "csat"
    assert csv_sales.resolve_column(cols, "age").lower() == "age_years"
    assert csv_sales.resolve_column(cols, "gender") == ""
    # exact match wins over synonyms
    assert csv_sales.resolve_column(["revenue", "sales"], "sales") == "sales"


def test_normalize_any_sales(spark, tmp_path):
    p = tmp_path / "syn.csv"
    p.write_text("week_ending,weekly_sales,market\n2024-01-05,99,EMEA\n")
    raw = spark.read.option("header", True).csv(str(p))
    df = csv_sales.normalize_any_sales(raw)
    assert df.columns == CANONICAL_COLS
    row = df.collect()[0]
    assert row["date"] == dt.date(2024, 1, 5)
    assert row["sales"] == 99.0 and row["region"] == "EMEA"
    assert row["product"] is None  # unresolvable -> NULL column


def test_etl_load_csv(spark, tmp_path):
    p = tmp_path / "etl.csv"
    p.write_text(
        "Order Date , Amount\n2024-01-02,5\nbaddate,6\n2024-01-01,7\n"
    )
    df = csv_sales.etl_load_csv(spark, str(p))
    assert df.columns == ["Order_Date", "Amount"]
    vals = [r["Order_Date"] for r in df.collect()]
    # coerced NULL sorts first (asc nulls first), then ascending dates
    assert vals == [None, dt.date(2024, 1, 1), dt.date(2024, 1, 2)]


def test_parquet_sink_partitioned(spark, sales_csv, tmp_path):
    df = csv_sales.load_sales_csv(spark, sales_csv)
    out = str(tmp_path / "sales_parquet")
    sinks.write_parquet(df, out, partition_by_date="date")
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    assert {"year", "month"} <= set(back.columns)
    # partition pruning: a year filter must not scan other years
    pruned = back.filter(F.col("year") == 2024)
    assert pruned.count() == 3


def test_save_as_table(spark, sales_csv, tmp_path):
    df = csv_sales.load_sales_csv(spark, sales_csv)
    sinks.save_as_table(df, "sales_tbl_test", path=str(tmp_path / "tbl"))
    try:
        assert spark.table("sales_tbl_test").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS sales_tbl_test")


def _mini_pdf(page_texts, compress=True):
    """Build a minimal valid PDF: catalog → pages tree → one FlateDecode
    content stream per page showing the given text via Tj."""
    import zlib

    objs = {}
    page_ids = [3 + 2 * i for i in range(len(page_texts))]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_texts)} >>".encode()
    )
    for i, txt in enumerate(page_texts):
        esc = txt.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        stream = f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode("latin-1")
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b" /Filter /FlateDecode"
        objs[4 + 2 * i] = (
            b"<< /Length %d%s >>\nstream\n%s\nendstream"
            % (len(stream), filt, stream)
        )
        objs[page_ids[i]] = (
            f"<< /Type /Page /Parent 2 0 R /Contents {4 + 2 * i} 0 R >>".encode()
        )
    body = b"%PDF-1.4\n" + b"".join(
        b"%d 0 obj\n%s\nendobj\n" % (n, objs[n]) for n in sorted(objs)
    )
    return body + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"


def _mini_docx(paragraphs):
    """Build a minimal OOXML docx (zip with word/document.xml)."""
    import io
    import zipfile

    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    paras = "".join(
        f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs
    )
    doc = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{w}"><w:body>{paras}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats'
            '.org/package/2006/content-types"/>',
        )
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


def test_doc_ingest_pipeline(spark, tmp_path):
    d = tmp_path / "docsrc"
    d.mkdir()
    (d / "a.txt").write_text("alpha  beta\n\ngamma " + "x" * 900)
    (d / "b.md").write_text("# title\nshort doc")
    (d / "c.docx").write_bytes(b"\x00\x01")  # corrupt file -> marker row
    chunks = docs.ingest_documents(spark, str(d), size=800, overlap=120)
    rows = chunks.collect()
    by_path = {}
    for r in rows:
        by_path.setdefault(r["path"].rsplit("/", 1)[-1], []).append(r)
    # a.txt: normalized length 917 -> starts 0, 680 (slide 680) => 2 chunks
    a = sorted(by_path["a.txt"], key=lambda r: r["chunk_start"])
    assert [r["chunk_start"] for r in a] == [0, 680]
    assert len(a[0]["chunk"]) == 800
    # overlap: last 120 chars of chunk0 == first 120 of chunk1
    assert a[0]["chunk"][-120:] == a[1]["chunk"][:120]
    # 1-based pages, like the reference's enumerate(..., start=1)
    assert a[0]["chunk_id"].endswith("::p1::c0")
    assert a[1]["chunk_id"].endswith("::p1::c1")
    # short doc: single chunk, whole text
    b = by_path["b.md"]
    assert len(b) == 1 and b[0]["chunk"] == "# title short doc".replace("\n", " ")
    # unparseable file surfaces a marker, not a crash/drop
    assert by_path["c.docx"][0]["chunk"].startswith("<unextracted:")


def test_pdf_docx_real_extraction_end_to_end(spark, tmp_path):
    """R1 on real binary formats: generated PDF (2 pages, FlateDecode) and
    docx fixtures flow extract→normalize→chunk with real text — no
    markers. Reference parity: per-page PDF rows 1-based
    (etl/index_docs.py:19-22), docx as one page (etl/index_docs.py:24-27)."""
    d = tmp_path / "docbin"
    d.mkdir()
    (d / "r.pdf").write_bytes(
        _mini_pdf(["Revenue grew 12% in Q3.", "Outlook (2026): stable."])
    )
    (d / "n.docx").write_bytes(
        _mini_docx(["Meeting notes.", "Action items follow."])
    )
    pages = docs.extract_text(docs.read_binary_docs(spark, str(d))).collect()
    got = {
        (r["path"].rsplit("/", 1)[-1], r["page"]): r["text"] for r in pages
    }
    assert "Revenue grew 12% in Q3." in got[("r.pdf", 1)]
    assert "Outlook (2026): stable." in got[("r.pdf", 2)]
    assert "Meeting notes." in got[("n.docx", 1)]
    assert "Action items follow." in got[("n.docx", 1)]
    assert not any("<unextracted" in t for t in got.values())
    # and through the chunker: real text, reference chunk-id shape
    chunks = docs.ingest_documents(spark, str(d), size=30, overlap=6).collect()
    pdf_chunks = [r for r in chunks if r["path"].endswith("r.pdf")]
    assert {r["page"] for r in pdf_chunks} == {1, 2}
    assert any("Revenue grew" in r["chunk"] for r in pdf_chunks)


def test_pdftext_operators_and_escapes():
    """Direct spec-level checks on the vendored extractor: TJ arrays, hex
    strings, literal-string escapes, uncompressed streams, page order."""
    from intellect_bi_spark.sources import pdftext

    pdf = _mini_pdf(["page one"], compress=False)
    assert pdftext.extract_pdf_pages(pdf) == [(1, "page one\n")] or (
        "page one" in pdftext.extract_pdf_pages(pdf)[0][1]
    )
    # handcrafted content stream: TJ array + hex string + octal escape
    content = b"BT [(Hel) -20 (lo)] TJ <20776f726c64> Tj (\\100ok\\)) Tj ET"
    text = pdftext._content_text(content)
    assert "Hello" in text
    assert " world" in text
    assert "@ok)" in text
    # multi-page order follows /Kids order
    pages = pdftext.extract_pdf_pages(_mini_pdf(["first", "second", "third"]))
    assert [p for p, _ in pages] == [1, 2, 3]
    texts = [t for _, t in pages]
    assert "first" in texts[0] and "third" in texts[2]
    # docx: paragraph join + ValueError on junk
    docx = _mini_docx(["alpha", "beta"])
    assert pdftext.extract_docx_text(docx) == "alpha\n\nbeta"
    try:
        pdftext.extract_docx_text(b"junk")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_chunk_matches_reference_python(spark, tmp_path):
    """Oracle: the reference's chunker (etl/index_docs.py:34-46 semantics)
    re-implemented in pure Python, compared to the Spark explode chunker."""

    def ref_chunks(text: str, size: int, overlap: int) -> list[str]:
        step = size - overlap
        out = []
        i = 0
        while i < max(len(text), 1):
            out.append(text[i : i + size])
            i += step
        return out

    text = "word " * 500  # 2500 chars with trailing space normalized off
    d = tmp_path / "one"
    d.mkdir()
    (d / "t.txt").write_text(text)
    norm = " ".join(text.split())
    for size, overlap in (docs.CHUNK_INGEST, docs.CHUNK_ETL):
        got = (
            docs.ingest_documents(spark, str(d), size=size, overlap=overlap)
            .orderBy("chunk_start")
            .collect()
        )
        assert [r["chunk"] for r in got] == ref_chunks(norm, size, overlap)


def test_embedder_deterministic(spark):
    import pandas as pd

    pdf = pd.DataFrame({"chunk_id": ["a", "b", "a2"], "chunk": ["hello", "world", "hello"]})
    df = spark.createDataFrame(pdf)
    out = embedder.embed_chunks(df).collect()
    vecs = {r["chunk_id"]: r["embedding"] for r in out}
    assert len(vecs["a"]) == embedder.EMBED_DIM
    assert vecs["a"] == vecs["a2"]  # deterministic
    assert vecs["a"] != vecs["b"]
    assert all(-0.5 <= v < 0.5 for v in vecs["a"])
    # remote path is stubbed without endpoint
    with pytest.raises(NotImplementedError):
        embedder.remote_embed_texts(["x"], endpoint=None)


def test_embeddings_sink_roundtrip(spark, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame({"chunk_id": ["a", "b"], "chunk": ["hello", "world"]})
    vecs = embedder.embed_chunks(spark.createDataFrame(pdf))
    out = str(tmp_path / "emb")
    sinks.write_embeddings(vecs, out, append=False)
    sinks.write_embeddings(vecs, out, append=True)  # S9 batch-append shape
    back = sinks.read_embeddings(spark, out)
    assert back.count() == 4
    assert dict(back.dtypes)["embedding"] == "array<float>"


def test_embeddings_upsert_replaces_not_duplicates(spark, tmp_path):
    """Reference upsert semantics (etl/index_docs.py:101-108): re-ingesting
    a modified document must REPLACE its vectors by chunk id; new ids
    insert; untouched ids survive unchanged."""
    import pandas as pd

    out = str(tmp_path / "emb_upsert")

    def vecs(rows):
        pdf = pd.DataFrame(rows, columns=["chunk_id", "chunk"])
        return embedder.embed_chunks(spark.createDataFrame(pdf))

    sinks.upsert_embeddings(
        spark, vecs([("a", "hello"), ("b", "world")]), out,
        id_col="chunk_id",
    )
    first = {
        r["chunk_id"]: r["embedding"]
        for r in sinks.read_embeddings(spark, out).collect()
    }
    assert set(first) == {"a", "b"}

    # re-ingest: doc a changed, doc c is new, b untouched
    sinks.upsert_embeddings(
        spark, vecs([("a", "hello again"), ("c", "new doc")]), out,
        id_col="chunk_id",
    )
    back = sinks.read_embeddings(spark, out)
    assert back.count() == 3  # replaced, not duplicated
    second = {r["chunk_id"]: r["embedding"] for r in back.collect()}
    assert set(second) == {"a", "b", "c"}
    assert second["a"] != first["a"]  # a's vector was replaced
    assert second["b"] == first["b"]  # untouched id survives byte-identical

    # idempotent re-upsert of the same payload
    sinks.upsert_embeddings(
        spark, vecs([("a", "hello again")]), out, id_col="chunk_id"
    )
    assert sinks.read_embeddings(spark, out).count() == 3


def test_sql_chunker_matches_ingest_chunker(spark, sf_dir):
    """The registry's sequence→explode chunker and the ingest path's
    chunk_text must slice identically at both reference parameterizations
    (api/ingest_docs.py:12-13 and etl/index_docs.py:34)."""
    from pyspark.sql import functions as F

    from intellect_bi_spark.operators.textops import _chunks_at, normalize_text

    for size, overlap in (docs.CHUNK_INGEST, docs.CHUNK_ETL):
        via_ops = {
            (r["doc_id"], r["chunk_start"]): r["chunk_text"]
            for r in _chunks_at(
                spark, sf_dir, size, size - overlap
            ).collect()
        }
        via_ingest = {
            (r["doc_id"], r["chunk_start"]): r["chunk"]
            for r in docs.chunk_text(
                normalize_text(spark, sf_dir), size, overlap
            )
            .select("doc_id", "chunk_start", "chunk")
            .collect()
        }
        assert via_ops == via_ingest


def test_udtf_chunker_matches_sql_chunker(spark, sf_dir):
    """The Python-UDTF chunker (the §2.12 extension seam) must produce
    row-identical chunks to the codegen'd sequence→explode hot path."""
    from intellect_bi_spark.operators.textops import (
        CHUNK_SIZE,
        CHUNK_STEP,
        _chunks_at,
        chunk_documents_udtf,
    )

    via_sql = {
        (r["doc_id"], r["chunk_start"]): r["chunk_text"]
        for r in _chunks_at(spark, sf_dir, CHUNK_SIZE, CHUNK_STEP).collect()
    }
    via_udtf = {
        (r["doc_id"], r["chunk_start"]): r["chunk_text"]
        for r in chunk_documents_udtf(spark, sf_dir).collect()
    }
    assert via_udtf == via_sql and via_sql


def test_jsonl_schemaless_quarantines_corrupt_lines(spark, tmp_path):
    """The schema-LESS path must still quarantine malformed lines: the
    inferred schema is extended with _corrupt_record before the full read
    (ADVICE r4 — without that, corrupt lines outside the inference sample
    were silently dropped, not counted)."""
    from intellect_bi_spark.sources.jsonl import CORRUPT_COL, read_jsonl

    p = tmp_path / "docs.jsonl"
    lines = [f'{{"id": {i}, "text": "doc {i}"}}' for i in range(50)]
    lines[37] = '{"id": 37, "text": BROKEN'  # malformed mid-file
    p.write_text("\n".join(lines) + "\n")

    df = read_jsonl(spark, str(p))  # no schema → inference path
    assert CORRUPT_COL in df.columns
    rows = df.collect()
    assert len(rows) == 50  # nothing silently dropped
    corrupt = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(corrupt) == 1
    assert "BROKEN" in corrupt[0][CORRUPT_COL]
    assert sum(1 for r in rows if r["id"] is not None) == 49


def test_jsonl_events_roundtrip(spark, sf_dir, tmp_path):
    """Events → JSONL → events_from_jsonl must reproduce the parquet rows
    exactly; a malformed line lands in quarantine, not in a crash."""
    import json as _json

    from intellect_bi_spark.sources.jsonl import (
        corrupt_line_stats,
        events_from_jsonl,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = ev.orderBy("event_id").limit(50).collect()
    path = tmp_path / "events.jsonl"
    with open(path, "w") as fh:
        for r in rows:
            fh.write(
                _json.dumps(
                    {
                        "event_id": r["event_id"],
                        "ts": r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
                        "user_id": r["user_id"],
                        "event_type": r["event_type"],
                        "value": r["value"],
                        "props": r["props"],
                    }
                )
                + "\n"
            )
        fh.write("{not valid json\n")
        fh.write('{"event_id": "oops", "value": "NaN-ish"}\n')

    got = events_from_jsonl(spark, str(path))
    stats = corrupt_line_stats(got).collect()[0]
    assert stats["n_lines"] == 52
    assert stats["n_corrupt"] == 1  # the unparseable line only

    good = {
        r["event_id"]: r
        for r in got.filter(~F.col("is_corrupt") & F.col("event_id").isNotNull()).collect()
    }
    for r in rows:
        g = good[r["event_id"]]
        assert g["ts"] == r["ts"]
        assert g["user_id"] == r["user_id"]
        assert g["event_type"] == r["event_type"]
        assert g["value"] == r["value"]
    # the schema-valid but type-garbage line survives with nulled casts
    nulled = got.filter(F.col("event_id").isNull() & ~F.col("is_corrupt"))
    assert nulled.count() == 1


def test_orc_sink_roundtrip(spark, sf_dir, tmp_path):
    from intellect_bi_spark.sources.sinks import read_orc, write_orc

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(100)
    write_orc(ev, str(tmp_path / "orc"), partition_by=["event_type"])
    back = read_orc(spark, str(tmp_path / "orc"))
    assert back.count() == 100
    assert {r["event_id"] for r in back.collect()} == {
        r["event_id"] for r in ev.collect()
    }


def test_xml_roundtrip_documents(spark, sf_dir, tmp_path):
    """Native Spark-4 XML source/sink: documents round-trip through
    <doc> row elements with values intact."""
    from intellect_bi_spark.sources.xmldocs import docs_from_xml, write_xml

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
        .limit(50)
    )
    write_xml(docs, str(tmp_path / "xml"))
    # (a filter referencing only the corrupt-derived column is disallowed
    # — QUERY_ONLY_CORRUPT_RECORD_COLUMN — so collect once and assert)
    back_rows = docs_from_xml(spark, str(tmp_path / "xml")).collect()
    assert not any(r["is_corrupt"] for r in back_rows)
    a = {r["doc_id"]: (r["text"], r["lang"]) for r in docs.collect()}
    b = {r["doc_id"]: (r["text"], r["lang"]) for r in back_rows}
    assert a == b


def test_xml_quarantines_malformed_rows(spark, tmp_path):
    """A row element with unparseable nested structure lands in the
    corrupt-record column; well-formed siblings still parse (the
    count-don't-die ingest contract, same as JSONL)."""
    from intellect_bi_spark.sources.xmldocs import read_xml

    p = tmp_path / "feed.xml"
    p.write_text(
        "<docs>"
        "<doc><doc_id>1</doc_id><text>alpha</text></doc>"
        "<doc><doc_id><bad><nested/></bad></doc_id><text>beta</text></doc>"
        "<doc><doc_id>3</doc_id><text>gamma</text></doc>"
        "</docs>"
    )
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = read_xml(spark, str(p), schema=schema)
    rows = df.collect()
    assert len(rows) == 3
    good = {r["doc_id"]: r["text"] for r in rows if r["_corrupt_record"] is None}
    assert good == {1: "alpha", 3: "gamma"}
    assert sum(1 for r in rows if r["_corrupt_record"] is not None) == 1
