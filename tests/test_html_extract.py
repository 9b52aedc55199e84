"""HTML → text extraction (textops.extract_html_text): behavior on
adversarial markup BEYOND the synthesized fixture pages — the extractor
is a generic strip/decode chain, not a fixture-tuned one."""

from __future__ import annotations

from intellect_bi_spark.operators import textops


def _extract_one(spark, html: str) -> str:
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(html,)], "html string")
    return df.select(
        textops.extract_html_text(F.col("html")).alias("x")
    ).collect()[0]["x"]


def test_extract_strips_blocks_and_decodes(spark):
    html = (
        "<html><head><title>T</title>"
        "<style media='all'>body{x:1}</style>"
        '<script type="module">let a = "<b>no</b>"; if (a < "z") {}</script>'
        "</head><body><!-- c1 --><!-- <i>c2</i> -->"
        "<p>keep &lt;this&gt; &amp; that</p></body></html>"
    )
    assert _extract_one(spark, html) == "T keep <this> & that"


def test_extract_multiline_and_unclosed_tags(spark):
    html = (
        "<div\n class='a'\n data-x='1'>line one\n"
        "<br>line&#32;two <span>tail"  # numeric entity left as-is (only
        # the three named entities are decoded); unclosed span must not
        # eat the tail text
    )
    got = _extract_one(spark, html)
    assert got == "line one line&#32;two tail"


def test_extract_script_containing_closer_lookalikes(spark):
    html = "<script>var s='</scrip'+'t>';</script>after"
    # the strip ends at the FIRST literal '</script>' closer; text after
    # the real closer survives — but nothing inside the block does.
    # (The '</scrip'+'t>' split is the classic trick for embedding the
    # closer in JS; a real parser keeps it, a regex stripper drops the
    # block at its first literal closer — either way no script text may
    # leak into the corpus, which is the property that matters here.)
    got = _extract_one(spark, html)
    assert "var" not in got and got.endswith("after")


def test_extract_whitespace_collapse_and_trim(spark):
    html = "  <p>a</p>\n\n<p>b   c</p>\t"
    assert _extract_one(spark, html) == "a b c"
