"""R7-R9 formatting operators: exact reference semantics
(reference api/main.py:987-1002, 1429-1440)."""

from __future__ import annotations

from intellect_bi_spark.functions import textformat as tf


def test_truncate_short_passthrough():
    assert tf.truncate_chars("abc", 10) == "abc"


def test_truncate_cuts_at_paragraph():
    s = "a" * 500 + "\n\n" + "b" * 500
    out = tf.truncate_chars(s, 600)
    assert out == "a" * 500  # last \n\n before 600 is at 500 (> 400)


def test_truncate_hard_cut_when_para_too_early():
    s = "a" * 100 + "\n\n" + "b" * 900
    out = tf.truncate_chars(s, 600)
    assert len(out) == 600  # paragraph break at 100 <= 400 → hard cut


def test_rows_to_markdown_caps_and_nulls():
    rows = [(1, None)] + [(i, "x") for i in range(2, 12)]
    md = tf.rows_to_markdown(rows, ["a", "b"])
    lines = md.strip().split("\n")
    assert lines[0] == "| a | b |"
    assert lines[1] == "| --- | --- |"
    assert lines[2] == "| 1 |  |"  # None renders empty
    assert len(lines) == 2 + 8  # max 8 body rows


def test_rows_to_markdown_empty():
    assert tf.rows_to_markdown([], ["a"]) == ""


def test_assemble_context():
    docs = ["  hello   world  ", "x " * 600]
    metas = [
        {"source": "a.pdf", "page": 1, "chunk": 0},
        {"source": "b.pdf", "page": 2, "chunk": 3},
    ]
    ctx, cits = tf.assemble_context(docs, metas)
    lines = ctx.split("\n")
    assert lines[0] == "[1] hello world"
    assert lines[1].startswith("[2] x x x")
    assert lines[1].endswith(" …") and len(lines[1]) <= 704
    assert cits[0] == {"index": 1, "source": "a.pdf", "page": 1, "chunk": 0}
    assert cits[1]["index"] == 2


def test_df_to_result_dict(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], ["k", "v"])
    out = tf.df_to_result_dict(df)
    assert out["headers"] == ["k", "v"]
    assert sorted(out["rows"]) == [[1, "a"], [2, None]]
