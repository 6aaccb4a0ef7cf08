"""HTML -> text extraction (VERDICT r14 next #1): the boilerplate-strip
stage every Common Crawl-style pipeline (CCNet, C4, RefinedWeb) runs
before the quality gates this repo already grades (`text_gopher`,
`text_c4_gates`, perplexity filters), which all assume clean text.

Design: the extraction is a DETERMINISTIC, declaratively-expressed rule
chain — drop <script>/<style> subtrees, drop comments, strip tags to
spaces, decode a fixed named-entity subset, collapse whitespace — so it
runs entirely JVM-side as `regexp_replace`/`replace` codegen (no Python
in the hot path; the 100 TB shape is a shuffle-free scan) AND replays
exactly in DuckDB SQL from the same pattern tables below.  Real-world
extractors (trafilatura, jusText) add statistical boilerplate scoring;
this is the rule-based core (what C4 did) with both engines pinned to
one rule table.

The graded query wraps each corpus document into a deterministic HTML
page (title/style/script chrome, entity-encoded body, comment, footer
links) via the SAME template on both sides: `html_wrap_py` builds the
bytes that ride inside the WARC capture Spark actually scans, and
`html_wrap_sql` builds the identical string in the oracle — so the
value-hash gate catches a divergence in either the WARC plumbing or
any extraction rule.

No reference counterpart (the reference ETL has no text pipeline);
this is the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------- rules

# Encode order matters: '&' first (else already-encoded entities get
# double-encoded). Decode order is the reverse convention: '&amp;'
# LAST, so '&amp;lt;' round-trips to '&lt;' not '<'.
ENTITY_ENCODE: list[tuple[str, str]] = [
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&#39;"),
]
ENTITY_DECODE: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# Strip order matters: script/style subtrees (content AND tags) and
# comments go first, THEN the generic tag strip — a generic-first order
# would leave script bodies behind as "text".  Patterns are written in
# the common Java-regex/RE2 subset: inline (?is) flags, lazy
# quantifiers, \b, explicit whitespace classes (Java's \s and RE2's \s
# disagree on \x0B, so WS_PATTERN never uses \s).
STRIP_PATTERNS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
]
WS_PATTERN = r"[ \t\r\n\f]+"

# ------------------------------------------------------- page template

# {id} splices the doc_id; {body} the entity-encoded text. The chrome
# deliberately exercises every rule: multi-line layout (whitespace
# collapse), a style block with braces, a script with '<' and quotes
# (subtree strip), a comment containing a fake tag, attribute-rich
# tags, and every entity in the decode table.
_PAGE_PREFIX = (
    "<!DOCTYPE html>\n<html>\n<head>\n"
    "<title>Doc {id}</title>\n"
    '<style type="text/css">body {{ font: 14px/1.4 serif; }}</style>\n'
    '<script type="text/javascript">var doc_id = {id}; '
    'if (doc_id < 0) {{ alert("x & y"); }}</script>\n'
    "</head>\n<body>\n"
    "<!-- capture {id} : fake <tag> inside a comment -->\n"
    '<h1 class="t">Doc &#39;{id}&#39;</h1>\n<p>'
)
_PAGE_SUFFIX = (
    '</p>\n<p class="quote">&quot;fin&quot;&nbsp;&lt;eof&gt; &amp;\n'
    '<a href="http://corpus/doc/{id}">next &gt; prev</a></p>\n'
    "</body>\n</html>\n"
)


def entity_encode_py(text: str) -> str:
    for ch, ent in ENTITY_ENCODE:
        text = text.replace(ch, ent)
    return text


def html_wrap_py(doc_id: int, text: str) -> str:
    """The deterministic page the WARC synthesis stores (Python twin of
    `html_wrap_sql`; a property test pins the two byte-identical)."""
    i = str(int(doc_id))
    return (_PAGE_PREFIX.replace("{{", "\0").replace("}}", "\1")
            .replace("{id}", i).replace("\0", "{").replace("\1", "}")
            + entity_encode_py(text)
            + _PAGE_SUFFIX.replace("{id}", i))


# ------------------------------------------------------------ SQL twin


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_template(tpl: str, id_expr: str) -> str:
    """A format-template piece as a SQL concat with `id_expr` spliced
    at every {id}."""
    tpl = tpl.replace("{{", "{").replace("}}", "}")
    parts = tpl.split("{id}")
    out = _sql_lit(parts[0])
    for p in parts[1:]:
        out += f" || {id_expr} || " + _sql_lit(p)
    return "(" + out + ")"


def entity_encode_sql(expr: str) -> str:
    for ch, ent in ENTITY_ENCODE:
        expr = f"replace({expr}, {_sql_lit(ch)}, {_sql_lit(ent)})"
    return expr


def html_wrap_sql(id_expr: str, text_expr: str) -> str:
    return (_sql_template(_PAGE_PREFIX, id_expr)
            + " || " + entity_encode_sql(text_expr)
            + " || " + _sql_template(_PAGE_SUFFIX, id_expr))


def html_extract_sql(expr: str) -> str:
    """The extraction chain in DuckDB SQL — generated from the SAME
    rule tables as the Spark column chain ('g' flag: DuckDB
    regexp_replace is first-match-only by default, Spark's is
    global)."""
    for pat, rep in STRIP_PATTERNS:
        expr = f"regexp_replace({expr}, {_sql_lit(pat)}, " \
               f"{_sql_lit(rep)}, 'g')"
    for ent, ch in ENTITY_DECODE:
        expr = f"replace({expr}, {_sql_lit(ent)}, {_sql_lit(ch)})"
    return (f"trim(regexp_replace({expr}, {_sql_lit(WS_PATTERN)}, "
            f"' ', 'g'))")


# ---------------------------------------------------------- Spark side


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def html_extract(col: Column | str) -> Column:
    """HTML -> text as a pure built-in column chain (whole-stage
    codegen; Spark regexp_replace replaces all matches)."""
    c = _c(col)
    for pat, rep in STRIP_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    for ent, ch in ENTITY_DECODE:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, WS_PATTERN, " "))
