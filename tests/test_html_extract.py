"""HTML -> text extraction (functions/html.py + the warc-html scan):
wrap twins pinned byte-identical (Python builder vs DuckDB SQL
builder), Spark extraction pinned against the DuckDB rule replay on
adversarial pages, and the CC-pipeline chain warc -> extract ->
gopher_rules exercised end-to-end."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
from hypothesis import given, settings, strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lswms_forage_etl_spark.functions import html as H  # noqa: E402

TRICKY = [
    "",
    "plain words only",
    "amp & lt < gt > quote \" apos ' done",
    "already &amp; encoded &lt;tag&gt; stays double",
    "<b>looks like markup</b> in the body text",
    "<script>alert('x')</script> inside text",
    "multi   space\tand\nnewline\r\nruns",
    "trailing entity &",
    "a < b > c & d",
]


# ---------------------------------------------------------- wrap twins


def test_wrap_twin_byte_identical_on_tricky():
    con = duckdb.connect()
    for i, text in enumerate(TRICKY):
        py = H.html_wrap_py(i * 7, text)
        sq = con.execute(
            f"SELECT {H.html_wrap_sql('$1::BIGINT', '$2::VARCHAR')}",
            [i * 7, text]).fetchone()[0]
        assert py == sq, f"wrap twin diverged on {text!r}"


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 1 << 40),
       st.text(alphabet=st.characters(codec="utf-8",
                                      exclude_categories=("Cs",)),
               max_size=80))
def test_wrap_twin_property(doc_id, text):
    con = duckdb.connect()
    py = H.html_wrap_py(doc_id, text)
    sq = con.execute(
        f"SELECT {H.html_wrap_sql('$1::BIGINT', '$2::VARCHAR')}",
        [doc_id, text]).fetchone()[0]
    assert py == sq


# ------------------------------------------------- extraction identity


def _extract_sql_one(con, page: str) -> str:
    return con.execute(
        f"SELECT {H.html_extract_sql('?::VARCHAR')}", [page]
    ).fetchone()[0]


def test_extract_rules_on_handmade_pages():
    con = duckdb.connect()
    cases = [
        ("<p>hello <b>world</b></p>", "hello world"),
        ("<script>var x = '<p>not text</p>';</script>after", "after"),
        ("<style>p { color: red; }</style>kept", "kept"),
        ("<!-- a <fake> tag --> body", "body"),
        ("a&amp;b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f",
         "a&b <c> \"d\" 'e' f"),
        ("&amp;lt; decodes to literal &lt; not a bracket",
         "&lt; decodes to literal < not a bracket"),
        ("  leading <br/> trailing  ", "leading trailing"),
        ("<SCRIPT TYPE=\"x\">UPPER()</SCRIPT>cased", "cased"),
        ("<div\nclass='multi\nline'>split attr</div>", "split attr"),
    ]
    for page, want in cases:
        assert _extract_sql_one(con, page) == want, page


def test_spark_matches_duckdb_on_adversarial_pages(spark):
    con = duckdb.connect()
    pages = [H.html_wrap_py(i, t) for i, t in enumerate(TRICKY)] + [
        "<html><body><script>while(1){if(a<b){}}</script>x</body></html>",
        "no markup at all",
        "<p>unterminated <broken",
    ]
    sdf = spark.createDataFrame([(p,) for p in pages], "html string")
    got = [r[0] for r in
           sdf.select(H.html_extract("html")).collect()]
    want = [_extract_sql_one(con, p) for p in pages]
    assert got == want


# ------------------------------------------------------ pipeline chain


def test_warc_to_extract_to_gopher(spark):
    """The CC shape: crawl captures -> page scan -> extraction ->
    Gopher quality gate, with the extracted text (not the raw page)
    driving the gate."""

    from lswms_forage_etl_spark.functions.text import gopher_rules
    from lswms_forage_etl_spark.sources.archive import (
        scan_warc_html, synth_warc_html)

    body = ("the quick brown fox jumps over the lazy dog and then "
            "keeps going with more plain words to clear the gate " * 3)
    docs = spark.createDataFrame(
        [(i, body, "en", "src0", len(body)) for i in range(16)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    pages = scan_warc_html(synth_warc_html(docs))
    assert pages.count() == 16

    out = (pages
           .select("doc_id", H.html_extract("html").alias("txt"))
           .select("doc_id", gopher_rules(
               "txt", min_words=10, min_stop_hits=2).alias("g")))
    rows = out.select("doc_id", "g.keep", "g.n_words").collect()
    assert len(rows) == 16
    # extraction strips the chrome, so the gate sees the body words
    assert all(r["keep"] == 1 for r in rows)

    # the RAW page would fail the symbol-ratio rule — proves the
    # extraction stage is doing the work, not the gate's tolerance
    raw = (pages.select(gopher_rules(
        "html", min_words=10, min_stop_hits=2).alias("g"))
        .select("g.keep").collect())
    assert all(r["keep"] == 0 for r in raw)


def test_extract_plan_is_whole_stage_codegen(spark):
    """The extraction chain must stay JVM-side: no BatchEvalPython /
    row-at-a-time UDF nodes in the plan past the Arrow WARC scan."""
    sdf = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = sdf.select(H.html_extract("html"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
